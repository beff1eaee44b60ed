"""Checkpoint / resume for the growable network.

The reference only SAVES (torch.save per task, src/run.py:194-196) and ships
no load path at all (README.md:83 solicits one). Here checkpointing is a
first-class round trip. Because the model's *shape* grows per task, a
checkpoint is (a) a JSON manifest — genotypes, per-site candidate counts and
birth tasks, per-task arch maps, optional search state — and (b) an .npz of
every parameter/stat leaf under deterministic keys. Restore rebuilds the
registry from the manifest, re-creates specs from the stored genotypes, and
loads arrays bit-exactly.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax
import numpy as np

from rag_tpu.models.growable import GrowableStereoNet, Unit
from rag_tpu.models.stereo import HEAD_NAMES, SITE_NAMES
from rag_tpu.ops.cell import canonicalize_gene
from rag_tpu.search.genotype import Genotype


def _flatten(tree, prefix: str, out: Dict[str, np.ndarray]):
    if isinstance(tree, dict):
        for k in sorted(tree):
            _flatten(tree[k], f"{prefix}/{k}", out)
    else:
        out[prefix] = np.asarray(tree)


def _unflatten(keys_vals: Dict[str, np.ndarray], prefix: str):
    """Rebuild the nested dict for everything under ``prefix/``."""
    tree: Dict = {}
    plen = len(prefix) + 1
    for key, val in keys_vals.items():
        if not key.startswith(prefix + "/"):
            continue
        parts = key[plen:].split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def _geno_json(g: Genotype):
    return {"normal": [list(p) for p in g.normal],
            "reduce": [list(p) for p in g.reduce]}


def _geno_from(d) -> Genotype:
    return Genotype(normal=canonicalize_gene(d["normal"]),
                    reduce=canonicalize_gene(d["reduce"]))


def save_router(directory: str, router, name: str = "router.npz") -> None:
    """Persist the Scene Router (params + optimizer state) next to the task
    checkpoints. The router is task-count-global, so one file (overwritten
    per task) rather than per-task copies. ``name`` lets offline re-trains
    land beside (not over) a committed canonical router artifact.

    The file records ``trained_task`` — the last task the router was
    trained after — so a resume can detect a router.npz that predates the
    latest task_done checkpoint (a kill during the final task's router
    stage must re-train, not silently report routed numbers from a stale
    router)."""
    os.makedirs(directory, exist_ok=True)
    np.savez(os.path.join(directory, name),
             num_tasks=router.num_tasks, input_key=router.input_key,
             trained_task=getattr(router, "trained_task", -1),
             **router.state_arrays())


def load_router(directory: str, name: str = "router.npz"):
    """Rebuild the saved SceneRouter; None if never saved."""
    path = os.path.join(directory, name)
    if not os.path.exists(path):
        return None
    from rag_tpu.models.router import SceneRouter

    data = dict(np.load(path))
    router = SceneRouter(int(data["num_tasks"]),
                         input_key=str(data.get("input_key", "left")))
    router.load_arrays(data)
    router.trained_task = int(data.get("trained_task", -1))
    return router


def save_checkpoint(directory: str, net: GrowableStereoNet, task: int,
                    extra: Optional[Dict] = None,
                    manifest_only: bool = False):
    """``manifest_only`` rewrites just the JSON manifest (stage / matrix /
    eval-row progress) when the arrays on disk are already current — used
    by the per-eval progress saves in the driver's forgetting-row loop,
    where re-serializing an unchanged arrays_task{t}.npz per eval would
    dominate the save cost."""
    from rag_tpu.models.growable import GrowableDepthNet

    os.makedirs(directory, exist_ok=True)
    variant = "depth" if isinstance(net, GrowableDepthNet) else "stereo"
    manifest = {
        "task": task,
        "variant": variant,
        "genotypes": [_geno_json(g) for g in net.genotypes],
        "archis": net.archis,
        "lengths": {s: len(net.units[s]) for s in SITE_NAMES},
        "num_heads": {h: len(net.heads[h]) for h in HEAD_NAMES},
        "born": {s: [u.born_task for u in net.units[s]] for s in SITE_NAMES},
        "p": [p.tolist() for p in net.p] if net.p is not None else None,
        "model_to_train": net.model_to_train,
        "extra": extra or {},
    }
    if manifest_only:
        path = os.path.join(directory, f"manifest_task{task}.json")
        assert os.path.exists(
            os.path.join(directory, f"arrays_task{task}.npz")), \
            "manifest_only save requires the arrays file to already exist"
        with open(path + ".tmp", "w") as f:
            json.dump(manifest, f)
        os.replace(path + ".tmp", path)
        return
    arrays: Dict[str, np.ndarray] = {}
    for s in SITE_NAMES:
        for i, u in enumerate(net.units[s]):
            _flatten(u.params, f"units/{s}/{i}/params", arrays)
            _flatten(u.stats, f"units/{s}/{i}/stats", arrays)
    for h in HEAD_NAMES:
        for i, u in enumerate(net.heads[h]):
            _flatten(u.params, f"heads/{h}/{i}/params", arrays)
            _flatten(u.stats, f"heads/{h}/{i}/stats", arrays)
    if variant == "depth":
        # the task-shared DispHead unit (rag_depth/src/models/
        # rag_model.py:297-298 — created once, never expanded)
        _flatten(net.depth_head.params, "depth_head/params", arrays)
        _flatten(net.depth_head.stats, "depth_head/stats", arrays)

    with open(os.path.join(directory, f"manifest_task{task}.json"), "w") as f:
        json.dump(manifest, f)
    np.savez(os.path.join(directory, f"arrays_task{task}.npz"), **arrays)


def latest_task(directory: str) -> Optional[int]:
    tasks = []
    for name in os.listdir(directory) if os.path.isdir(directory) else []:
        if name.startswith("manifest_task") and name.endswith(".json"):
            tasks.append(int(name[len("manifest_task"):-len(".json")]))
    return max(tasks) if tasks else None


def load_checkpoint(directory: str, task: Optional[int] = None):
    """Rebuild the growable net (stereo or depth — the manifest records the
    variant, so specs are rebuilt with the right builders). Returns
    (net, manifest)."""
    from rag_tpu.models.growable import GrowableDepthNet

    if task is None:
        task = latest_task(directory)
        assert task is not None, f"no checkpoints in {directory}"
    with open(os.path.join(directory, f"manifest_task{task}.json")) as f:
        manifest = json.load(f)
    data = dict(np.load(os.path.join(directory, f"arrays_task{task}.npz")))

    genotypes = [_geno_from(g) for g in manifest["genotypes"]]
    variant = manifest.get("variant", "stereo")
    cls = GrowableDepthNet if variant == "depth" else GrowableStereoNet
    net = cls.__new__(cls)
    net.genotypes = genotypes
    net.archis = [
        {k: int(v) for k, v in arch.items()} for arch in manifest["archis"]
    ]
    net.p = ([np.asarray(p, np.float64) for p in manifest["p"]]
             if manifest["p"] is not None else None)
    net.new_models = None
    mtt = manifest.get("model_to_train")
    net.model_to_train = (
        {k: [int(i) for i in v] for k, v in mtt.items()}
        if mtt is not None else None)

    # spec/head builders are instance methods on the right class
    # (stereo: 3D 24->12 matching stems; depth: 2D 12->12 — the r2 loader
    # always used the stereo builders, breaking depth restores)
    spec_cache = {}

    def site_spec(born, s):
        if born not in spec_cache:
            spec_cache[born] = net.spec_builder(genotypes[born])
        return spec_cache[born][s]

    net.units = {}
    for s in SITE_NAMES:
        net.units[s] = []
        for i in range(manifest["lengths"][s]):
            born = manifest["born"][s][i]
            params = _unflatten(data, f"units/{s}/{i}/params")
            stats = _unflatten(data, f"units/{s}/{i}/stats")
            net.units[s].append(Unit(site_spec(born, s), _to_jax(params),
                                     _to_jax(stats), born))
    net.heads = {}
    head_specs = net.head_builder()
    for h in HEAD_NAMES:
        net.heads[h] = []
        for i in range(manifest["num_heads"][h]):
            params = _unflatten(data, f"heads/{h}/{i}/params")
            stats = _unflatten(data, f"heads/{h}/{i}/stats")
            net.heads[h].append(Unit(head_specs[h], _to_jax(params),
                                     _to_jax(stats), i))
    if variant == "depth":
        from rag_tpu.models.depth import DEPTH_HEAD_SPEC

        net.depth_head = Unit(
            DEPTH_HEAD_SPEC,
            _to_jax(_unflatten(data, "depth_head/params")),
            _to_jax(_unflatten(data, "depth_head/stats")), 0)
    return net, manifest


def _to_jax(tree):
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.asarray, tree)
