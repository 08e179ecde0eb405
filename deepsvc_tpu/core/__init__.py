from .image import pad_to_multiple, crop_to_size, psnr, rgb_to_255, Normalizer
from .config import Config

__all__ = [
    "pad_to_multiple",
    "crop_to_size",
    "psnr",
    "rgb_to_255",
    "Normalizer",
    "Config",
]
