from .qmap import QMap
from .synthetic import batch_from_clouds, body_cloud, surface_cloud, textured_colors

__all__ = ["QMap", "batch_from_clouds", "body_cloud", "surface_cloud",
           "textured_colors"]
