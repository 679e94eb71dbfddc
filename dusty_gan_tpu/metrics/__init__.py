from dusty_gan_tpu.metrics.chamfer import chamfer_distance, compute_cd
from dusty_gan_tpu.metrics.emd import earth_mover_distance, compute_emd
from dusty_gan_tpu.metrics.fps import furthest_point_sampling, downsample_point_clouds
from dusty_gan_tpu.metrics.swd import compute_swd
from dusty_gan_tpu.metrics.jsd import compute_jsd
from dusty_gan_tpu.metrics.cov_mmd_1nna import compute_cov_mmd_1nna
from dusty_gan_tpu.metrics.depth import compute_depth_accuracy, compute_depth_error
