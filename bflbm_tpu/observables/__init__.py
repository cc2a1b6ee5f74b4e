from . import structfact, stats  # noqa: F401
