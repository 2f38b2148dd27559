from .qmap import QMap
from .synthetic import batch_from_clouds, surface_cloud

__all__ = ["QMap", "batch_from_clouds", "surface_cloud"]
