from sod_tpu.utils.misc import (  # noqa: F401
    filter_masks,
    get_image_paths,
    mask_to_bbox,
    set_seeds,
    to_one_hot,
)
