from . import fused_step  # noqa: F401
