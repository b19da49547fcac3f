"""Training stack: losses, metrics, optimizers, jitted train/eval steps,
checkpointing, and the two-file logging contract."""

from svnet_tpu.train.losses import cal_loss, feature_transform_regularizer, cal_pointnet_loss
from svnet_tpu.train.metrics import accuracy, balanced_accuracy, shape_iou
from svnet_tpu.train.optim import make_optimizer
