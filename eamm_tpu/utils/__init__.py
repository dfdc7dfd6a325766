from eamm_tpu.utils.profiling import (StepTimer, trace, device_memory_stats,
                                      enable_persistent_compilation_cache)
from eamm_tpu.utils.metrics import (psnr, ssim, average_keypoint_distance,
                                    clip_metrics)
