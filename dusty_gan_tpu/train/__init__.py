from dusty_gan_tpu.train.state import TrainState, create_train_state
from dusty_gan_tpu.train.step import make_train_step, fetch_reals
