from rag_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from rag_tpu.parallel.sharded import make_sharded_train_step, make_sharded_eval_step
