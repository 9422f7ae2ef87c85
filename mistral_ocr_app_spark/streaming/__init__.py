from .metrics import extract_stream, turn_rate_stream  # noqa: F401
