from .meters import AverageMeter
from .config import load_config, save_config

__all__ = ["AverageMeter", "load_config", "save_config"]
