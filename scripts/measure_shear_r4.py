"""Measure the shear-collapse cvstem kernel vs the default cvstem path:
isolated stem fwd+bwd, then the full train step, fetch-fenced."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("RAG_TPU_COMPUTE_DTYPE", "bfloat16")
import jax, jax.numpy as jnp
import numpy as np

def stamp(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

def timed(fn, fence, iters=20, warmup=3):
    x = None
    for _ in range(warmup):
        x = fn(x)
    fence(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    fence(x)
    return (time.perf_counter() - t0) / iters

import bench
from rag_tpu.train.trainer import make_optimizer, make_train_step

for shear in ("0", "1"):
    os.environ["RAG_TPU_CVSTEM_SHEAR"] = shear
    specs, params, stats, left, right, gt = bench._flagship(4, 192, 384)
    opt = make_optimizer(0.003, 5.0)
    step = make_train_step(specs, frozenset(specs), opt)
    st = [params, stats, opt.init(params)]
    def run(_):
        st[0], st[1], st[2], sc = step(st[0], st[1], st[2], 1e-3,
                                       left, right, gt)
        return sc
    dt = timed(run, lambda sc: float(sc["loss"]), iters=30)
    stamp(f"shear={shear}: train step {1e3*dt:.2f} ms -> "
          f"{4/dt:.2f} pairs/s")

# isolated stem fwd comparison
from rag_tpu.ops.pallas_cvstem import cvstem_conv
from rag_tpu.ops.pallas_shear import shear_stem_z
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((4, 12, 64, 128)), jnp.bfloat16)
y = jnp.asarray(rng.standard_normal((4, 12, 64, 128)), jnp.bfloat16)
w3 = jnp.asarray(rng.standard_normal((3, 3, 3, 24, 12)) * 0.1, jnp.float32)
f_cv = jax.jit(lambda a, b: cvstem_conv(a, b, w3, 64))
f_sh = jax.jit(lambda a, b: shear_stem_z(a, b, w3, 64))
for name, f in (("cvstem", f_cv), ("shear", f_sh)):
    z = [None]
    def run(_):
        z[0] = f(x, y); return z[0]
    dt = timed(run, lambda zz: float(zz.astype(jnp.float32).mean()), iters=30)
    stamp(f"{name} stem fwd: {1e3*dt:.2f} ms")
    # fwd+bwd
    g = jax.jit(jax.grad(lambda a, b: (f(a, b).astype(jnp.float32) ** 2).sum(),
                         argnums=(0, 1)))
    def runb(_):
        return g(x, y)
    dtb = timed(runb, lambda gs: float(gs[0].astype(jnp.float32).mean()),
                iters=20)
    stamp(f"{name} stem fwd+bwd(x,y): {1e3*dtb:.2f} ms")
stamp("done")
