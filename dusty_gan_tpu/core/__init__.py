from dusty_gan_tpu.core.dtypes import Policy, DEFAULT_POLICY
from dusty_gan_tpu.core.rng import key_iter, fold_step
