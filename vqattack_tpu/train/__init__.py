from vqattack_tpu.train.optim import create_optimizer, create_schedule  # noqa: F401
from vqattack_tpu.train.trainer import TrainState, make_train_step  # noqa: F401
