from .core import EncoderConfig, IntraEncoder  # noqa: F401
