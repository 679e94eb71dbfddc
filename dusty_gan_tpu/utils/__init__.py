from dusty_gan_tpu.geometry.lidar import sigmoid_to_tanh, tanh_to_sigmoid
from dusty_gan_tpu.utils.postprocess import colorize, postprocess
