from .pagecodec import decode_page, encode_page  # noqa: F401
