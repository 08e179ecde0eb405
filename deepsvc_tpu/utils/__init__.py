from .meters import AverageMeter
from .logging import setup_logger

__all__ = ["AverageMeter", "setup_logger"]
