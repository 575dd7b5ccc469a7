from .bbox import corners_from_boxes, transform_points, project_to_image
from .collate import collate_fn, CollateConfig
from .loader import DataLoader
