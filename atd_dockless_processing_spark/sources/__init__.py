from . import scans, sinks  # noqa: F401
