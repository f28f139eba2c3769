"""Numpy codec kernels: integer page codecs + string metadata codecs."""

from .kernels import (  # noqa: F401
    CODEC_NAMES,
    blob_codec_name,
    decode_blob,
    encode_best,
    encode_simple,
)
from .strings import decode_strings, encode_strings  # noqa: F401
