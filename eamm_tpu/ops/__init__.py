from eamm_tpu.ops.grid import make_coordinate_grid, kp2gaussian, gaussian2kp, heatmap_softmax
from eamm_tpu.ops.warp import grid_sample, resize_bilinear, upsample_nearest_2x, avg_pool_2x
from eamm_tpu.ops.antialias import gaussian_kernel_1d, antialias_downsample
from eamm_tpu.ops.mfcc import mfcc, mfcc_windows, audio_to_mfcc_windows
from eamm_tpu.ops.filters import one_euro_filter, one_euro_filter_np
from eamm_tpu.ops.motion import sparse_motions, normalize_kp, relative_kp
from eamm_tpu.ops.colorspace import rgb_to_yuv420, yuv420_to_rgb
from eamm_tpu.ops.augment import color_jitter, decode_and_augment
