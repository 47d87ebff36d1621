from .postprocess import fused_stage2  # noqa: F401
