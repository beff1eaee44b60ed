"""Growable multi-path network: the continual-growth registry.

The reference mutates a live nn.Module tree (Network.expand/select,
src/models/rag_model.py:391-845). Here growth is data-plane surgery on a
host-side registry of per-site candidate Units; the device only ever sees
immutable per-path pytrees assembled from it:

  * ``expand(t, genotype)``  appends one fresh candidate per searchable
    site (built from task t's genotype) + 3 fresh output heads, and
    initializes the per-site reuse-vs-new categorical ``p`` with the
    K_multiplier=2 reuse prior [2L/(2L+1)..., 1/(2L+1)]
    (rag_model.py:403-407 pattern x18).
  * ``select(t)``  argmaxes each ``p``; a losing new unit is deleted; the
    winning per-site indices become ``archis[t]`` and the fresh units the
    task may train become ``model_to_train`` (rag_model.py:709-845).
  * ``path(arch)``  assembles (specs, params, stats) for one task's path —
    the pure-function forward (rag_tpu.models.stereo.stereo_forward) and
    jit see only this.
  * ``write_back(arch, params, stats)``  commits trained tensors to the
    registry (candidates shared across tasks share storage, so training a
    reused unit would affect other tasks — which is why the driver freezes
    everything but model_to_train, exactly like the reference).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from rag_tpu.models.stereo import (
    HEAD_NAMES,
    SITE_NAMES,
    build_head_specs,
    build_site_specs,
    init_sites,
)

K_MULTIPLIER = 2


@dataclasses.dataclass
class Unit:
    spec: Any
    params: Any
    stats: Any
    born_task: int


class GrowableStereoNet:
    """Host-side candidate registry + per-task architecture maps."""

    # variant hooks: the depth variant (rag_tpu.models.depth) overrides
    # these per-INSTANCE methods (round 1 mutated class attributes from
    # __init__ — an action-at-a-distance trap once two variants coexist)
    def spec_builder(self, genotype):
        return build_site_specs(genotype)

    def head_builder(self):
        return build_head_specs()

    def __init__(self, key, genotype):
        self.genotypes = [genotype]
        site_specs = self.spec_builder(genotype)
        head_specs = self.head_builder()
        k1, k2 = jax.random.split(key)
        sp, ss = init_sites(k1, site_specs)
        hp, hs = init_sites(k2, head_specs)
        self.units: Dict[str, List[Unit]] = {
            s: [Unit(site_specs[s], sp[s], ss[s], 0)] for s in SITE_NAMES
        }
        self.heads: Dict[str, List[Unit]] = {
            h: [Unit(head_specs[h], hp[h], hs[h], 0)] for h in HEAD_NAMES
        }
        # arch_init: every site/head at index 0 (rag_model.py:197-198)
        self.archis: List[Dict[str, int]] = [
            {**{s: 0 for s in SITE_NAMES}, **{h: 0 for h in HEAD_NAMES}}
        ]
        self.p: Optional[List[np.ndarray]] = None
        self.new_models: Optional[Dict[str, List[int]]] = None
        self.model_to_train: Optional[Dict[str, List[int]]] = None

    # -- growth ------------------------------------------------------------

    def length(self, site: str) -> int:
        return len(self.units[site])

    def expand(self, key, t: int, genotype):
        """Append one candidate per searchable site + fresh heads; build p."""
        assert t == len(self.genotypes), "tasks must expand in order"
        self.genotypes.append(genotype)
        site_specs = self.spec_builder(genotype)
        head_specs = self.head_builder()
        k1, k2 = jax.random.split(key)
        sp, ss = init_sites(k1, site_specs)
        hp, hs = init_sites(k2, head_specs)

        self.p = []
        for s in SITE_NAMES:
            n = self.length(s)
            self.units[s].append(Unit(site_specs[s], sp[s], ss[s], t))
            prob = np.full(n + 1, 1.0 / (K_MULTIPLIER * n + 1), np.float64)
            prob[:n] *= K_MULTIPLIER
            self.p.append(prob)
        for h in HEAD_NAMES:
            self.heads[h].append(Unit(head_specs[h], hp[h], hs[h], t))
            assert len(self.heads[h]) == t + 1

        self.new_models = {
            **{s: [self.length(s) - 1] for s in SITE_NAMES},
            **{h: [t] for h in HEAD_NAMES},
        }

    def select(self, t: int) -> Dict[str, int]:
        """Argmax the reuse-vs-new probabilities, prune losing new units,
        record archis[t] / model_to_train."""
        assert self.p is not None
        best: Dict[str, int] = {}
        to_train: Dict[str, List[int]] = {}
        for i, s in enumerate(SITE_NAMES):
            idx = int(np.argmax(self.p[i]))
            c = self.length(s) - 1  # index of the freshly added candidate
            if idx == c:
                best[s] = c
                to_train[s] = [c]
            else:
                best[s] = idx
                to_train[s] = []
                del self.units[s][c]
        for h in HEAD_NAMES:
            best[h] = t
            to_train[h] = [t]
        self.model_to_train = to_train
        self.archis.append(best)
        self.p = None
        self.new_models = None
        return best

    # -- path assembly -----------------------------------------------------

    def _unit(self, name: str, idx: int) -> Unit:
        return (self.heads[name] if name in self.heads else self.units[name])[idx]

    def path(self, arch: Dict[str, int]):
        """(specs, params, stats) pytrees for one task's path."""
        specs, params, stats = {}, {}, {}
        for name, idx in arch.items():
            u = self._unit(name, idx)
            specs[name] = u.spec
            params[name] = u.params
            stats[name] = u.stats
        return specs, params, stats

    def search_arch(self, selected: List[int], t: int) -> Dict[str, int]:
        """Arch map for an op-search sample: selected[i] indexes site i's
        candidates (0..L-1 = reuse, L = the new unit); heads pinned to t
        (rag_model.py:663-685 search_matching uses last_*_3d[t])."""
        arch = {s: int(selected[i]) for i, s in enumerate(SITE_NAMES)}
        for h in HEAD_NAMES:
            arch[h] = t
        return arch

    def write_back(self, arch: Dict[str, int], params=None, stats=None):
        for name, idx in arch.items():
            u = self._unit(name, idx)
            if params is not None:
                u.params = params[name]
            if stats is not None:
                u.stats = stats[name]

    # -- bookkeeping -------------------------------------------------------

    def trainable_sites(self, t: int) -> frozenset:
        """Sites of archis[t] whose unit the task may train: everything for
        t=0, else model_to_train (rag.py:89-102)."""
        if t == 0:
            return frozenset(self.archis[0].keys())
        assert self.model_to_train is not None
        arch = self.archis[t]
        return frozenset(
            name for name, idx in arch.items()
            if idx in self.model_to_train.get(name, [])
        )

    def num_params(self) -> int:
        total = 0
        for store in (self.units, self.heads):
            for units in store.values():
                for u in units:
                    total += sum(int(np.prod(l.shape))
                                 for l in jax.tree_util.tree_leaves(u.params))
        return total

    def size_m(self) -> float:
        """Model size in M params (reference utils.get_model_size mode='M')."""
        return self.num_params() / 1e6


class GrowableDepthNet(GrowableStereoNet):
    """Depth variant: same 18-site growth grid, 2D matching half, plus the
    task-shared DispHead unit (rag_depth/src/models/rag_model.py:297-298 —
    created once, never expanded)."""

    def spec_builder(self, genotype):
        from rag_tpu.models.depth import build_depth_site_specs

        return build_depth_site_specs(genotype)

    def head_builder(self):
        from rag_tpu.models.depth import build_depth_head_specs

        return build_depth_head_specs()

    def __init__(self, key, genotype):
        from rag_tpu.models.depth import DEPTH_HEAD_SPEC, init_depth_head

        k1, k2 = jax.random.split(key)
        super().__init__(k1, genotype)
        p, s = init_depth_head(k2)
        self.depth_head = Unit(DEPTH_HEAD_SPEC, p, s, 0)

    def path(self, arch):
        specs, params, stats = super().path(arch)
        specs["depth_head"] = self.depth_head.spec
        params["depth_head"] = self.depth_head.params
        stats["depth_head"] = self.depth_head.stats
        return specs, params, stats

    def write_back(self, arch, params=None, stats=None):
        super().write_back(
            {k: v for k, v in arch.items() if k != "depth_head"},
            {k: v for k, v in (params or {}).items() if k != "depth_head"}
            if params is not None else None,
            {k: v for k, v in (stats or {}).items() if k != "depth_head"}
            if stats is not None else None,
        )
        if params is not None and "depth_head" in params:
            self.depth_head.params = params["depth_head"]
        if stats is not None and "depth_head" in stats:
            self.depth_head.stats = stats["depth_head"]

    def trainable_sites(self, t: int) -> frozenset:
        # the shared DispHead trains ONLY in task 0: the reference's
        # freeze_model + modify_param(model_to_train) cycle never
        # re-enables it (rag_depth/src/approaches/rag.py:126-127;
        # get_new_model/model_to_train lists exclude depth_head,
        # rag_model.py:554-571, 747). Training it every task silently
        # drifts past-task outputs through the shared head — the round-3
        # canonical depth run surfaced exactly that as non-constant
        # forgetting-matrix columns.
        base = super().trainable_sites(t)
        return base | {"depth_head"} if t == 0 else base
