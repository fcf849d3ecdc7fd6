from .waterfall import fused_waterfall_pyramid  # noqa: F401
