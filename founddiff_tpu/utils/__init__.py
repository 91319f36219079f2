from founddiff_tpu.utils.images import hu_preview_window, make_grid, save_image
from founddiff_tpu.utils.logger import get_logger

__all__ = ["get_logger", "hu_preview_window", "make_grid", "save_image"]
