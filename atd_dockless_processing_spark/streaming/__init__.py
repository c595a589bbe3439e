from . import stream_queries  # noqa: F401
