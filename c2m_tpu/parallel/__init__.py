from c2m_tpu.parallel.mesh import (data_sharding, make_mesh, replicate_sharding,
                                   shard_batch, shard_state)
