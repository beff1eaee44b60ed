"""Op-level growth search: reuse-vs-new selection over the expanded network.

Reference: src/approaches/rag.py:238-406 (search_t / search_epoch /
search_eval). After ``expand`` every searchable site holds L reuse
candidates + 1 new unit; per epoch a full path is sampled from the per-site
categoricals, trained for an epoch (only the new units' params receive
gradients; ALL BatchNorms stay frozen — rag.py:344-368), scored on the
held-out half, and the per-site probabilities updated with the MdeNAS
pairwise rule using the reusability reward

    h_a = sqrt(1 - valid_d1) * log(model_size + 1) / e,
    model_size = 9 / max(#sites that picked the new unit, 1)      (:278-307)

with the reuse head-start  h_e[site][0:-1] = o_size  (:262-266).

Reference-semantics notes (restored in round 2):
  * ONE optimizer persists over the new-unit params for the whole search
    (rag.py:247): the SGD momentum buffers of the new units and task heads
    carry across epochs here (a buffer is untouched in epochs where its
    site sampled a reuse candidate — exactly torch's skip-if-no-grad).
  * The best-by-valid-loss model is snapshotted per epoch and RESTORED
    into the registry after the search (rag.py:336-338); since reused
    units and all BN stats are frozen, snapshotting the new units + task
    heads is equivalent to the reference's full-model deepcopy.

Every sampled path is its own static architecture; paths re-use the jit
cache keyed by the path's spec signature, so across an o_epochs=100 run only
the distinct genotype-combinations present actually compile (sites share
specs between candidates of the same genotype).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, Optional

import jax
import numpy as np

from rag_tpu.metrics.meters import AverageMeterDict
from rag_tpu.models.growable import GrowableStereoNet, SITE_NAMES
from rag_tpu.models.stereo import HEAD_NAMES
from rag_tpu.search.mdenas import mdenas_update
from rag_tpu.train.trainer import (
    cosine_lr,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from rag_tpu.data.stereo_dataset import split_half


@dataclasses.dataclass
class OpSearchConfig:
    epochs: int = 100
    batch: int = 6
    lr: float = 0.001
    lr_a: float = 0.01
    weight_decay: float = 3e-4
    lr_min: float = 0.001
    grad_clip: float = 5.0
    o_size: int = 10
    seed: int = 0
    maxdisp: int = 192
    # truncate architecture scoring to this many batches (the src_self
    # variant's active `if step > 10: break` proxy validation,
    # src_self/approaches/rag.py:529-530); None = full split
    eval_max_batches: Optional[int] = None
    # weight-train fraction of the search split: 0.5 on the supervised
    # path (rag.py:250-266), 0.8 on the self-supervised proxy search
    # (src_self/approaches/rag.py:317)
    split_frac: float = 0.5


def _stereo_steps(specs, trainable, optimizer, maxdisp, mesh=None):
    return (make_train_step(specs, frozenset(), optimizer,
                            trainable_sites=trainable, maxdisp=maxdisp,
                            mesh=mesh),
            make_eval_step(specs, maxdisp=maxdisp, mesh=mesh))


def _stereo_args(batch):
    return (batch["left"], batch["right"], batch["disparity"])


def _depth_steps(specs, trainable, optimizer, maxdisp, mesh=None):
    from rag_tpu.train.trainer import make_depth_eval_step, make_depth_train_step

    return (make_depth_train_step(specs, frozenset(), optimizer,
                                  trainable_sites=trainable, mesh=mesh),
            make_depth_eval_step(specs, mesh=mesh))


def _depth_args(batch):
    return (batch["image"], batch["depth"])


VARIANTS = {
    "stereo": (_stereo_steps, _stereo_args),
    "depth": (_depth_steps, _depth_args),
}


def _find_trace(opt_state):
    """Index of the TraceState inside the chained optax state."""
    for i, s in enumerate(opt_state):
        if hasattr(s, "trace"):
            return i
    raise ValueError("optimizer chain has no momentum (trace) state")


def _inject_momentum(opt_state, store: Dict, names):
    """Replace the zero-initialized momentum of every site in ``names`` that
    has a stored buffer (same tensors across epochs — same treedef)."""
    i = _find_trace(opt_state)
    trace = dict(opt_state[i].trace)
    for name in names:
        if name in store:
            trace[name] = store[name]
    states = list(opt_state)
    states[i] = states[i]._replace(trace=trace)
    return tuple(states)


def _extract_momentum(opt_state, names) -> Dict:
    i = _find_trace(opt_state)
    return {name: opt_state[i].trace[name] for name in names}


def _tree_np(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


class OpSearch:
    """Runs the reuse-vs-new search for task t on an expanded net."""

    def __init__(self, net: GrowableStereoNet, config: OpSearchConfig,
                 log: Optional[Callable] = print, variant: str = "stereo",
                 mesh=None):
        self.net = net
        self.cfg = config
        self.log = log or (lambda *_: None)
        self.mesh = mesh  # dp mesh: sampled paths stay host-side/replicated
        self._step_cache = {}
        self._make_steps, self._batch_args = VARIANTS[variant]

    def _steps_for(self, arch, trainable):
        specs, _, _ = self.net.path(arch)
        key = (tuple(sorted((k, s) for k, s in specs.items())),
               tuple(sorted(trainable)))
        if key not in self._step_cache:
            optimizer = make_optimizer(self.cfg.weight_decay, self.cfg.grad_clip)
            # bn_sites=∅: ALL BatchNorms frozen during op search
            train_step, eval_step = self._make_steps(specs, trainable,
                                                     optimizer,
                                                     self.cfg.maxdisp,
                                                     mesh=self.mesh)
            self._step_cache[key] = (train_step, eval_step, optimizer)
        return self._step_cache[key]

    # -- searchable-state capture (new units + task heads are the only
    #    mutable tensors during op search) ---------------------------------

    def _new_unit_refs(self, t: int):
        refs = [(s, self.net.units[s][self.net.length(s) - 1])
                for s in SITE_NAMES]
        refs += [(h, self.net.heads[h][t]) for h in HEAD_NAMES]
        return refs

    def _snapshot(self, t: int) -> Dict:
        return {name: (u.params, u.stats) for name, u in self._new_unit_refs(t)}

    def _restore(self, t: int, snap: Dict):
        for name, u in self._new_unit_refs(t):
            u.params, u.stats = snap[name]

    # -- mid-search checkpointing (SURVEY.md §5; cell search already has
    #    this — op search is a 100-epoch stage that must survive a kill) ---

    def save_state(self, path: str, t: int, epoch: int, h_e, h_a,
                   momentum: Dict, best: Optional[Dict], best_loss: float,
                   rng=None):
        import json as _json

        from rag_tpu.continual.state import _flatten

        d = os.path.dirname(path)
        if d:
            # defensive: a vanished/missing parent dir must not kill a
            # 100-epoch stage (the round-2 canonical_r2b crash)
            os.makedirs(d, exist_ok=True)
        arrays: Dict[str, np.ndarray] = {}
        if rng is not None:
            arrays["rng_state"] = np.asarray(
                _json.dumps(rng.bit_generator.state))
        for name, u in self._new_unit_refs(t):
            _flatten(_tree_np(u.params), f"live/{name}/params", arrays)
            _flatten(_tree_np(u.stats), f"live/{name}/stats", arrays)
        for name, m in momentum.items():
            _flatten(_tree_np(m), f"mom/{name}", arrays)
        if best is not None:
            for name, (p, s) in best.items():
                _flatten(_tree_np(p), f"best/{name}/params", arrays)
                _flatten(_tree_np(s), f"best/{name}/stats", arrays)
        for i, p in enumerate(self.net.p):
            arrays[f"prob/{i}"] = np.asarray(p)
            arrays[f"he/{i}"] = np.asarray(h_e[i])
            arrays[f"ha/{i}"] = np.asarray(h_a[i])
        tmp = path + ".tmp.npz"
        np.savez(tmp, epoch=epoch, best_loss=best_loss,
                 has_best=int(best is not None), **arrays)
        os.replace(tmp, path)

    def load_state(self, path: str, t: int, rng=None):
        """Restores registry tensors, p, momentum, and the rng bit state;
        returns (start_epoch, h_e, h_a, momentum, best, best_loss)."""
        import json as _json

        from rag_tpu.continual.state import _unflatten

        import jax.numpy as jnp

        data = dict(np.load(path))
        if rng is not None and "rng_state" in data:
            rng.bit_generator.state = _json.loads(str(data["rng_state"]))
            del data["rng_state"]
        to_jax = lambda tree: jax.tree_util.tree_map(jnp.asarray, tree)
        for name, u in self._new_unit_refs(t):
            u.params = to_jax(_unflatten(data, f"live/{name}/params"))
            u.stats = to_jax(_unflatten(data, f"live/{name}/stats"))
        momentum = {}
        for name, _ in self._new_unit_refs(t):
            m = _unflatten(data, f"mom/{name}")
            if m:
                momentum[name] = to_jax(m)
        best = None
        if int(data["has_best"]):
            best = {}
            for name, _ in self._new_unit_refs(t):
                best[name] = (to_jax(_unflatten(data, f"best/{name}/params")),
                              to_jax(_unflatten(data, f"best/{name}/stats")))
        n = len(self.net.p)
        for i in range(n):
            self.net.p[i] = data[f"prob/{i}"]
        h_e = [data[f"he/{i}"] for i in range(n)]
        h_a = [data[f"ha/{i}"] for i in range(n)]
        return (int(data["epoch"]) + 1, h_e, h_a, momentum, best,
                float(data["best_loss"]))

    def search(self, t: int, train_data, writer=None,
               checkpoint_path: Optional[str] = None,
               checkpoint_every: int = 10, resume: bool = False,
               stop_after: Optional[int] = None):
        """Mutates net.p in place; caller then runs net.select(t)."""
        net, cfg = self.net, self.cfg
        assert net.p is not None and net.new_models is not None
        rng = np.random.default_rng(cfg.seed + 9999 * t)
        train_idx, valid_idx = split_half(len(train_data),
                                          seed=cfg.seed + 9999 * t,
                                          frac=cfg.split_frac)

        # h_e with the o_size reuse head-start; h_a zero.
        h_e = [np.zeros(len(p), np.int64) for p in net.p]
        h_a = [np.zeros(len(p), np.float64) for p in net.p]
        for he in h_e:
            he[:-1] = cfg.o_size

        momentum: Dict = {}      # persistent SGD momentum (rag.py:247)
        best: Optional[Dict] = None
        best_loss = np.inf
        start_epoch = 0
        if resume and checkpoint_path and os.path.exists(checkpoint_path):
            (start_epoch, h_e, h_a, momentum, best, best_loss) = \
                self.load_state(checkpoint_path, t, rng=rng)
            self.log(f"[op-search t{t}] resumed at epoch {start_epoch}")

        for epoch in range(start_epoch, cfg.epochs):
            lr = cosine_lr(cfg.lr, cfg.epochs, epoch, cfg.lr_min)
            selected = [int(rng.choice(len(p), p=p)) for p in net.p]
            arch = net.search_arch(selected, t)

            n_new = sum(1 for i, s in enumerate(SITE_NAMES)
                        if selected[i] == net.length(s) - 1)
            model_size = 9.0 / max(n_new, 1)

            # only new units (and heads of task t) train; all BN frozen
            trainable = frozenset(
                [s for i, s in enumerate(SITE_NAMES)
                 if selected[i] == net.length(s) - 1] + list(HEAD_NAMES)
            )
            train_step, eval_step, optimizer = self._steps_for(arch, trainable)
            specs, params, stats = self.net.path(arch)
            opt_state = optimizer.init(params)
            opt_state = _inject_momentum(opt_state, momentum, trainable)

            # deferred bulk fetches (see AverageMeterDict.update_batched)
            outs = []
            for b in train_data.batches(cfg.batch, True, seed=epoch,
                                        indices=train_idx):
                params, stats, opt_state, scalars = train_step(
                    params, stats, opt_state, lr, *self._batch_args(b))
                outs.append(scalars)
            train_m = AverageMeterDict().update_batched(outs)
            momentum.update(_extract_momentum(opt_state, trainable))

            outs = []
            for step_i, b in enumerate(train_data.batches(
                    cfg.batch, False, seed=0, indices=valid_idx)):
                if (cfg.eval_max_batches is not None
                        and step_i >= cfg.eval_max_batches):
                    break
                outs.append(eval_step(params, stats, *self._batch_args(b)))
            valid_m = AverageMeterDict().update_batched(outs)

            net.write_back(arch, params, stats)

            vm = valid_m.mean()
            # quality in [0,1], higher = better: stereo uses 1 - D1
            # (rag.py:307); depth uses the delta<1.25 accuracy
            # (rag_depth/src/approaches/rag.py:334)
            if "D1" in vm:
                quality = 1.0 - min(max(vm.get("D1", 1.0), 0.0), 1.0)
                qlabel = "D1"
            else:
                quality = min(max(vm.get("d1", 0.0), 0.0), 1.0)
                qlabel = "1-delta1"  # depth: quality = delta<1.25 accuracy
            valid_d1 = 1.0 - quality
            valid_loss = vm.get("loss", np.inf)
            reward = np.sqrt(quality) * np.log(model_size + 1.0) / np.e
            self.log(f"[op-search t{t}] epoch {epoch} sel={selected} "
                     f"n_new={n_new} valid loss {valid_loss:.3f} "
                     f"{qlabel} {100*valid_d1:.1f}% reward {reward:.4f}")
            if writer is not None:
                writer.scalars(f"search_op/task{t}",
                               {"valid_loss": valid_loss, "valid_d1": valid_d1,
                                "n_new": n_new}, step=epoch)

            for i, idx in enumerate(selected):
                h_e[i][idx] += 1
                h_a[i][idx] = reward
            for i in range(len(net.p)):
                net.p[i] = mdenas_update(net.p[i], h_e[i], h_a[i], cfg.lr_a)

            # best-by-valid snapshot of the mutable tensors (rag.py:336-338)
            if valid_loss < best_loss:
                best_loss = valid_loss
                best = self._snapshot(t)

            if checkpoint_path and (epoch + 1) % checkpoint_every == 0:
                self.save_state(checkpoint_path, t, epoch, h_e, h_a,
                                momentum, best, best_loss, rng=rng)
            if stop_after is not None and epoch + 1 >= stop_after:
                # fault injection for resume tests: simulate a kill AFTER
                # the checkpoint write (no best-restore happens)
                return

        # restore the best-by-valid model into the registry (the reference
        # re-loads the deepcopied best state after the search loop)
        if best is not None:
            self._restore(t, best)
