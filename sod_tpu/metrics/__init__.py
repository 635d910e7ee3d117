from sod_tpu.metrics.average_meter import AverageMeter  # noqa: F401
from sod_tpu.metrics.simple import (  # noqa: F401
    compute_iou,
    compute_mae,
    compute_pixel_accuracy,
)
from sod_tpu.metrics.f_measure import f_measure_all  # noqa: F401
from sod_tpu.metrics.s_measure import s_measure  # noqa: F401
