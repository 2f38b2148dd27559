from .bjontegaard import BjontegaardModel, bd_psnr, bd_rate
from .metrics import PointCloudMetric
from .evaluate import CSV_COLUMNS, TestsetRunner, default_q_grid, metrics_to_row

__all__ = [
    "BjontegaardModel",
    "CSV_COLUMNS",
    "PointCloudMetric",
    "TestsetRunner",
    "bd_psnr",
    "bd_rate",
    "default_q_grid",
    "metrics_to_row",
]
