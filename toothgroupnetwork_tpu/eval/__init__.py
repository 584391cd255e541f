from .metrics import cal_metric

__all__ = ["cal_metric"]
