from lseg_tpu.train.optim import make_optimizer, poly_schedule  # noqa: F401
from lseg_tpu.train.state import TrainState, create_train_state  # noqa: F401
from lseg_tpu.train.step import make_train_step, make_eval_step  # noqa: F401
