from ivid_tpu.utils.images import (
    colorize_depth,
    parse_int_list,
    save_image,
    save_image_grid,
    to8b,
)

__all__ = [
    "colorize_depth",
    "parse_int_list",
    "save_image",
    "save_image_grid",
    "to8b",
]
