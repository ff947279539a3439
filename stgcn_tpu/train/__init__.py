"""Training subsystem: loss/metrics, optimizers, LR schedules, early
stopping, checkpoint/resume, and the jitted train/eval loops."""

from stgcn_tpu.train.earlystop import EarlyStopping  # noqa: F401
from stgcn_tpu.train.metrics import evaluate_metrics, evaluate_mse, masked_mse  # noqa: F401
from stgcn_tpu.train.optim import make_optimizer, make_step_lr  # noqa: F401
from stgcn_tpu.train.loop import Trainer, TrainConfig  # noqa: F401
