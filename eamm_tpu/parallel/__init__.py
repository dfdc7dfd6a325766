from eamm_tpu.parallel.mesh import (make_mesh, make_mesh_for_batch,
                                    batch_sharding, replicated,
                                    shard_batch, shard_stacked_batch,
                                    host_cpu_mesh, replicate_tree)
