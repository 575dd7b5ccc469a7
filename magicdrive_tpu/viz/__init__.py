from .map_viz import visualize_map, MAP_COLORS  # noqa: F401
from .box_viz import trans_boxes_to_view, trans_boxes_to_views, draw_box_on_img  # noqa: F401
from .img_utils import concat_6_views, img_grid  # noqa: F401
