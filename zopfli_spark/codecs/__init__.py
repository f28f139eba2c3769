"""Numpy codec kernels: integer page codecs + string metadata codecs."""

from .kernels import (  # noqa: F401
    CODEC_NAMES,
    GroupDict,
    blob_codec_name,
    decode_blob,
    decode_group_huffman,
    encode_best,
    encode_group_dict,
    encode_group_huffman,
    encode_simple,
    group_tokens,
)
from .strings import decode_strings, encode_strings  # noqa: F401
