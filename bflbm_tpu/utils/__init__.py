from . import debug, timing  # noqa: F401
