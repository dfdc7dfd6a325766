from eamm_tpu.utils.profiling import (StepTimer, trace, device_memory_stats,
                                      enable_persistent_compilation_cache)
