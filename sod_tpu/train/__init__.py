from sod_tpu.train.lr_schedule import poly_schedule  # noqa: F401
from sod_tpu.train.optim import build_optimizer  # noqa: F401
from sod_tpu.train.step import make_eval_step, make_train_step  # noqa: F401
