from . import similarity, text  # noqa: F401
