from . import stencil, moments, noise, hydro, collide, stream  # noqa: F401
