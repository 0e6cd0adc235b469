from .meters import AverageMeter, ProgressMeter
from .logging import setup_logger, MetricsLogger

__all__ = ["AverageMeter", "ProgressMeter", "setup_logger", "MetricsLogger"]
