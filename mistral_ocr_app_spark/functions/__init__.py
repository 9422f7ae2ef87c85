from . import markdown, html_strip, spans  # noqa: F401
