"""Worker for the 2-process x 4-device multi-host CPU test. Each process:
jax.distributed init -> global (data=4, model=2) mesh over ALL 8 devices ->
host-local synthetic batch -> global sharded array -> ONE real train step
of the flagship stereo model. Writes its loss to argv[4].

Run only via tests/test_multihost.py (env must be set before jax import)."""

import os
import sys

proc_id, n_procs, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                    sys.argv[3], sys.argv[4])
mode = sys.argv[5] if len(sys.argv) > 5 else "gspmd"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from rag_tpu.parallel.multihost import (  # noqa: E402
    MultihostBatcher,
    initialize_multihost,
    process_info,
)

initialize_multihost(coordinator_address=f"localhost:{port}",
                     num_processes=n_procs, process_id=proc_id)
pi, pc = process_info()
assert pi == proc_id and pc == n_procs

import jax  # noqa: E402

assert len(jax.devices()) == 4 * n_procs, jax.devices()

from rag_tpu.data.synthetic import SyntheticStereoDataset  # noqa: E402
from rag_tpu.models.stereo import (  # noqa: E402
    build_head_specs,
    build_site_specs,
    init_sites,
)
from rag_tpu.parallel.mesh import make_mesh, replicate  # noqa: E402
from rag_tpu.parallel.sharded import make_sharded_train_step  # noqa: E402
from rag_tpu.search.genotype import default_genotype  # noqa: E402
from rag_tpu.train.trainer import make_optimizer  # noqa: E402

g = default_genotype()
specs = {**build_site_specs(g), **build_head_specs()}
params, stats = init_sites(jax.random.PRNGKey(0), specs)
opt = make_optimizer(3e-4, 5.0)

data = SyntheticStereoDataset(8, 24, 48, seed=7, max_disp=12.0)

if mode == "driver_dp":
    # the DRIVER's own pure-dp shard_map path across process boundaries:
    # ContinualDriver._ft_steps + _dist_data (MultihostBatcher feeding)
    from rag_tpu.continual.driver import (
        ContinualDriver,
        ExperimentConfig,
        TrainConfig,
    )

    cfg = ExperimentConfig(train=TrainConfig(batch=8), mesh_data=8,
                           maxdisp=48)
    driver = ContinualDriver(cfg, log=None)
    mesh = driver.mesh
    step, _ = driver._ft_steps(specs, frozenset(specs), opt)
    batch = next(driver._dist_data(data).batches(8, shuffle=False, seed=0))
else:
    # dp x sp across process boundaries: data=4, model=2 over 8 devices
    mesh = make_mesh(data=4, model=2)
    step = make_sharded_train_step(mesh, specs, frozenset(specs), opt)
    batcher = MultihostBatcher(data, mesh)
    batch = next(batcher.batches(8, shuffle=False, seed=0))

p = replicate(params, mesh)
s = replicate(stats, mesh)
o = replicate(opt.init(params), mesh)
p, s, o, sc = step(p, s, o, 1e-3, batch["left"], batch["right"],
                   batch["disparity"])
loss = float(sc["loss"])
with open(out_path, "w") as f:
    f.write(f"{loss}\n")
print(f"proc {pi}: loss={loss}", flush=True)
