from .core import Decoder  # noqa: F401
