from . import checkpoint, fields, metrics  # noqa: F401
