from avr_tpu.train.state import TrainState, make_optimizer, make_train_step  # noqa: F401
from avr_tpu.train.runner import AVRRunner  # noqa: F401
