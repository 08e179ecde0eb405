from .warp import warp
from .resize import (
    avg_pool_2x2,
    bilinear_down2,
    bilinear_up2,
    max_pool,
    pixel_shuffle,
    pixel_unshuffle,
    resize_bilinear,
)
from .msssim import ms_ssim, ssim

__all__ = [
    "warp",
    "avg_pool_2x2",
    "bilinear_down2",
    "bilinear_up2",
    "max_pool",
    "pixel_shuffle",
    "pixel_unshuffle",
    "resize_bilinear",
    "ms_ssim",
    "ssim",
]
