from . import mesh, auto  # noqa: F401
