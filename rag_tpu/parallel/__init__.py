from rag_tpu.parallel.mesh import make_mesh, replicate, shard_batch

# NOTE: rag_tpu.parallel.sharded imports the trainer (which imports
# rag_tpu.parallel.axis) — import it as a submodule, not from here, to
# keep the package root cycle-free.
