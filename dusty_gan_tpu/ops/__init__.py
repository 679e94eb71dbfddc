from dusty_gan_tpu.ops.padding import pad_ring
from dusty_gan_tpu.ops.activation import fused_leaky_relu
from dusty_gan_tpu.ops.blur import blur_v, blur_h, blur_vh
from dusty_gan_tpu.ops.linear import (
    EqualLRConv,
    EqualLRConvTranspose,
    EqualLRProj,
    FusedLeakyReLU,
)
from dusty_gan_tpu.ops.gumbel import gumbel_sigmoid, logistic_noise
