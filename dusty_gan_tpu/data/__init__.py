from dusty_gan_tpu.data.datasets import KITTIOdometry, SparseMPO, define_dataset
from dusty_gan_tpu.data.loader import Loader
