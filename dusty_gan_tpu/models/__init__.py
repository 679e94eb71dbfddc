from dusty_gan_tpu.models.dcgan_eqlr import Generator, Discriminator
from dusty_gan_tpu.models.dusty import DUSty1, DUSty2, GumbelSigmoid
from dusty_gan_tpu.models.factory import define_G, define_D
from dusty_gan_tpu.models import losses
