from lwsnet_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                      maybe_initialize_distributed,
                                      replicate_state, replicated,
                                      shard_batch)
