from dusty_gan_tpu.geometry.lidar import Lidar
from dusty_gan_tpu.geometry.normals import estimate_surface_normal
from dusty_gan_tpu.geometry.render import bilinear_rasterizer, render_point_clouds
