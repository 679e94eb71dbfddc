from dusty_gan_tpu.core.dtypes import Policy, DEFAULT_POLICY
