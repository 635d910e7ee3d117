from sod_tpu.train.checkpoints import restore_checkpoint, save_checkpoint  # noqa: F401
from sod_tpu.train.evaluator import Evaluator  # noqa: F401
from sod_tpu.train.logging import MetricLogger  # noqa: F401
from sod_tpu.train.lr_schedule import poly_schedule  # noqa: F401
from sod_tpu.train.optim import build_optimizer  # noqa: F401
from sod_tpu.train.step import make_eval_step, make_train_step  # noqa: F401
from sod_tpu.train.trainer import Trainer  # noqa: F401
