"""Import the reference's published rag_depth checkpoints into the
TPU-native registry.

The reference ships exactly one set of weights:
``rag_depth/logs/checkpoint_task{0..3}.ckpt`` (saved at
rag_depth/src/run.py:204-206 as ``{'task', 'model': state_dict,
'optimizer'}`` in the LEGACY — non-zip — torch serialization format). The
reference itself has **no load path at all** (README.md:83 solicits one);
this module is both the missing load path and the hardest possible
architecture-parity check: every tensor of the published state_dict must
land, with the right shape, on a site of our rebuilt architecture.

Reading is torch-free and treats the artifact as untrusted: EVERY pickle
in the stream is read restricted — the object-graph pickle through a
whitelist of exactly the symbols a legacy state_dict needs, the four
primitive header pickles (magic, protocol, sys_info, storage keys)
through a no-symbols/no-persistent-id unpickler — and each tensor's
offset/size/stride is bounds-checked against its storage before the
strided view is built. No arbitrary-code pickle risk, no out-of-bounds
reads, no torch dependency on the runtime path.

Structural facts of the artifact (documented findings, pinned in
tests/test_torch_import.py):

* The state_dict stores TENSORS ONLY. The per-task genotypes and the
  per-task site->candidate maps (``archis``) live in Python memory and are
  NOT saved — so the reference's own checkpoint cannot rebuild the
  reference's network. What IS recoverable per cell candidate: which of
  its 6 genotype rows were convs vs skips (``_ops.{i}`` entries carry
  params only for convs). The edge CONNECTIVITY of each gene is lost; we
  import with a canonical connectivity (each step reads s0, s1) and the
  recovered per-row op types, which reproduces every tensor shape
  exactly. Task 0 is fully determined (arch_init = candidate 0
  everywhere, rag_model.py:217-218); later tasks' archis must be supplied
  externally.
* ConvBR_2d ALWAYS allocates a BatchNorm (operations_2d.py:36-39) even
  when constructed with bn=False (last_3_2d, last_3_3d) — those dormant
  bn tensors are skipped (never touched by the reference forward either).
* ``bn.num_batches_tracked`` is vestigial (momentum is constant) and
  skipped.
* DispHead.conv1 carries a bias (rag_model.py:55) -> our ``bias1`` leaf.
"""

from __future__ import annotations

import io
import pickle
import struct
from typing import Any, Dict, List, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Legacy torch deserialization (torch-free, restricted)
# ---------------------------------------------------------------------------

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("<?"),
}


class _LazyTensor:
    def __init__(self, key, dtype, offset, size, stride):
        self.key, self.dtype = key, dtype
        self.offset, self.size, self.stride = offset, tuple(size), tuple(stride)

    def materialize(self, storages: Dict[str, bytes]) -> np.ndarray:
        flat = np.frombuffer(storages[self.key], dtype=self.dtype)
        n = flat.shape[0]
        # as_strided trusts its arguments completely, so every offset /
        # size / stride from the (untrusted) pickle is bounds-checked
        # against the storage before building the view — a corrupted
        # artifact must fail loudly, not read out-of-bounds memory
        if not (0 <= int(self.offset) < max(n, 1)):
            raise ValueError(f"storage {self.key}: offset {self.offset} "
                             f"outside {n}-element storage")
        if not self.size:
            return flat[self.offset].copy()
        if len(self.stride) != len(self.size) or \
                any(int(s) < 0 for s in self.size) or \
                any(int(s) < 0 for s in self.stride):
            raise ValueError(f"storage {self.key}: bad view geometry "
                             f"size={self.size} stride={self.stride}")
        if all(self.size):
            last = int(self.offset) + sum(
                (int(sz) - 1) * int(st)
                for sz, st in zip(self.size, self.stride))
            if last >= n:
                raise ValueError(
                    f"storage {self.key}: view reaches element {last} of a "
                    f"{n}-element storage (offset={self.offset} "
                    f"size={self.size} stride={self.stride})")
        itemsize = self.dtype.itemsize
        strides = tuple(s * itemsize for s in self.stride)
        view = np.lib.stride_tricks.as_strided(
            flat[self.offset:], shape=self.size, strides=strides)
        return np.ascontiguousarray(view)


def _rebuild_tensor_v2(storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None, *extra):
    key, dtype = storage
    return _LazyTensor(key, dtype, storage_offset, size, stride)


class _RestrictedUnpickler(pickle.Unpickler):
    """Whitelisted symbols only — safe on untrusted legacy streams."""

    _ALLOWED = {
        ("collections", "OrderedDict"),
        ("torch._utils", "_rebuild_tensor_v2"),
        ("torch._utils", "_rebuild_parameter"),
    }

    def find_class(self, module, name):
        if module == "torch" and name in _STORAGE_DTYPES:
            return ("storage_type", name)
        if (module, name) == ("collections", "OrderedDict"):
            from collections import OrderedDict

            return OrderedDict
        if (module, name) == ("torch._utils", "_rebuild_tensor_v2"):
            return _rebuild_tensor_v2
        if (module, name) == ("torch._utils", "_rebuild_parameter"):
            return lambda data, requires_grad=True, hooks=None: data
        raise pickle.UnpicklingError(
            f"legacy reader: disallowed symbol {module}.{name}")

    def persistent_load(self, pid):
        # ('storage', storage_type_marker, root_key, location, numel[, view])
        assert isinstance(pid, tuple) and pid[0] == "storage", pid
        _, stype, key, _location, _numel = pid[:5]
        assert stype[0] == "storage_type", stype
        return (str(key), _STORAGE_DTYPES[stype[1]])


class _HeaderUnpickler(pickle.Unpickler):
    """For the stream's primitive-only pickles (magic number, protocol,
    sys_info, storage keys): these carry ints / strings / dicts / lists
    and nothing else, so NO symbols and NO persistent ids are allowed —
    plain pickle.load here would hand an untrusted artifact arbitrary
    code execution via GLOBAL/REDUCE before the restricted unpickler
    ever ran."""

    def find_class(self, module, name):
        raise pickle.UnpicklingError(
            f"legacy header pickle: disallowed symbol {module}.{name}")

    def persistent_load(self, pid):
        raise pickle.UnpicklingError(
            "legacy header pickle: unexpected persistent id")


def load_legacy_torch(path: str) -> Any:
    """Parse a legacy torch.save file; tensors come back as numpy arrays.

    Stream layout (torch/serialization.py _legacy_load): three pickles
    (magic, protocol, sys_info), the object graph pickle (tensors appear
    as persistent-id storage refs), a pickle of storage keys, then per key
    ``int64 numel`` followed by ``numel * itemsize`` raw little-endian
    bytes. Storage dtypes come from the pids in the object graph.
    """
    dtypes: Dict[str, np.dtype] = {}

    def scan(o):
        if isinstance(o, _LazyTensor):
            dtypes[o.key] = o.dtype
        elif isinstance(o, dict):
            for v in o.values():
                scan(v)
        elif isinstance(o, (list, tuple)):
            for v in o:
                scan(v)

    with open(path, "rb") as f:
        magic = _HeaderUnpickler(f).load()
        assert magic == 0x1950A86A20F9469CFC6C, hex(magic)
        _protocol = _HeaderUnpickler(f).load()
        _sys_info = _HeaderUnpickler(f).load()
        obj = _RestrictedUnpickler(f).load()
        scan(obj)
        keys: List[str] = _HeaderUnpickler(f).load()
        raw: Dict[str, bytes] = {}
        for key in keys:
            (numel,) = struct.unpack("<q", f.read(8))
            if numel < 0:
                raise ValueError(f"storage {key}: negative numel {numel}")
            itemsize = dtypes[str(key)].itemsize
            buf = f.read(numel * itemsize)
            if len(buf) != numel * itemsize:
                raise ValueError(f"storage {key}: truncated "
                                 f"({len(buf)} of {numel * itemsize} bytes)")
            raw[str(key)] = buf

    def materialize(o):
        if isinstance(o, _LazyTensor):
            return o.materialize(raw)
        if isinstance(o, dict):
            return type(o)((k, materialize(v)) for k, v in o.items())
        if isinstance(o, (list, tuple)):
            return type(o)(materialize(v) for v in o)
        return o

    return materialize(obj)


# ---------------------------------------------------------------------------
# state_dict -> registry mapping (rag_depth)
# ---------------------------------------------------------------------------

_STEM_MAP = {
    "stem2d0": "stem_2d0", "stem2d1": "stem_2d1", "stem2d2": "stem_2d2",
    "last_3_2d": "last_3_2d", "stem3d0": "stem_3d0", "stem3d1": "stem_3d1",
}
_HEAD_KEYS = ("last_3_3d", "last_6_3d", "last_12_3d")

# canonical connectivity for recovered genes: each step reads (s0, s1) —
# edge ids (0,1), (2,3), (5,6) in the reference's global edge numbering
_CANONICAL_EDGES = (0, 1, 2, 3, 5, 6)


def gene_from_ops(present_rows) -> Tuple[Tuple[int, int], ...]:
    """Gene with canonical connectivity and the artifact's per-row op
    types: row i is a conv iff ``_ops.{i}`` carried parameters."""
    from rag_tpu.ops.cell import OP_CONV, OP_SKIP, canonicalize_gene

    present = set(int(i) for i in present_rows)
    return canonicalize_gene(tuple(
        (e, OP_CONV if i in present else OP_SKIP)
        for i, e in enumerate(_CANONICAL_EDGES)))


def _w_nhwc(w: np.ndarray) -> np.ndarray:
    """torch conv weight (O, I, kh, kw) -> our HWIO (kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 1, 0)).copy()


def _convbr_from(sd: Dict[str, np.ndarray], prefix: str, spec, used,
                 strict_shape=True):
    """Build (params, stats) for a ConvBR site from '{prefix}.conv.*' /
    '{prefix}.bn.*'; dormant bn tensors of bn=False blocks are skipped."""
    import jax.numpy as jnp

    w = _w_nhwc(sd[f"{prefix}.conv.weight"])
    used.add(f"{prefix}.conv.weight")
    expect = (spec.kernel,) * spec.ndim + (spec.cin, spec.cout)
    if strict_shape:
        assert w.shape == expect, (prefix, w.shape, expect)
    params = {"w": jnp.asarray(w, jnp.float32)}
    stats = {}
    if spec.bn:
        params["scale"] = jnp.asarray(sd[f"{prefix}.bn.weight"], jnp.float32)
        params["bias"] = jnp.asarray(sd[f"{prefix}.bn.bias"], jnp.float32)
        stats = {"mean": jnp.asarray(sd[f"{prefix}.bn.running_mean"],
                                     jnp.float32),
                 "var": jnp.asarray(sd[f"{prefix}.bn.running_var"],
                                    jnp.float32)}
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            used.add(f"{prefix}.bn.{leaf}")
        assert params["scale"].shape == (spec.cout,), prefix
    return params, stats


def _cell_from(sd, prefix: str, plan, used):
    """Build (CellSpec, params, stats) for one cell candidate."""
    import jax.numpy as jnp

    from rag_tpu.ops.cell import CellSpec
    from rag_tpu.ops.convbr import ConvBRSpec

    cpp, cp, cout, downup = plan
    rows = sorted({int(k[len(prefix) + 6:].split(".")[0])
                   for k in sd if k.startswith(f"{prefix}._ops.")})
    gene = gene_from_ops(rows)
    spec = CellSpec(2, cpp, cp, cout, downup, gene)

    params: Dict[str, Any] = {"ops": {}}
    stats: Dict[str, Any] = {"ops": {}}
    pre_spec = ConvBRSpec(2, cpp, cout, 1)
    prep_spec = ConvBRSpec(2, cp, cout, 1)
    params["pre"], stats["pre"] = _convbr_from(
        sd, f"{prefix}.pre_preprocess", pre_spec, used)
    params["prep"], stats["prep"] = _convbr_from(
        sd, f"{prefix}.preprocess", prep_spec, used)
    conv_spec = ConvBRSpec(2, cout, cout, 3)
    # conv rows in ascending row order map to ascending conv edges of the
    # canonical gene (both follow genotype-row order)
    conv_edges = [edge for edge, op in gene if op == 1]
    for row, edge in zip(rows, conv_edges):
        p, s = _convbr_from(sd, f"{prefix}._ops.{row}", conv_spec, used)
        params["ops"][str(edge)] = p
        stats["ops"][str(edge)] = s
    return spec, params, stats


def import_depth_checkpoint(path: str):
    """Parse a reference rag_depth checkpoint into a GrowableDepthNet.

    Returns (net, info). net.archis holds task 0 only (arch_init); the
    artifact does not record later tasks' site->candidate maps (see module
    docstring). info: {'task', 'imported', 'skipped_dormant', 'candidates',
    'unused'}.
    """
    import jax

    from rag_tpu.models.depth import (
        DEPTH_HEAD_SPEC,
        build_depth_head_specs,
        build_depth_site_specs,
    )
    from rag_tpu.models.growable import GrowableDepthNet, Unit
    from rag_tpu.models.stereo import _CELL2D_PLAN, _CELL3D_PLAN
    from rag_tpu.search.genotype import Genotype, default_genotype

    ckpt = load_legacy_torch(path)
    sd: Dict[str, np.ndarray] = dict(ckpt["model"])
    task = int(ckpt.get("task", 0))
    used: set = set()

    import jax.numpy as jnp

    fixed_specs = build_depth_site_specs(default_genotype())
    head_specs = build_depth_head_specs()

    def candidates(group: str) -> int:
        pos = group.count(".") + 1  # candidate index follows the group path
        idxs = {int(k.split(".")[pos]) for k in sd
                if k.startswith(group + ".")}
        return max(idxs) + 1 if idxs else 0

    net = GrowableDepthNet(jax.random.PRNGKey(0), default_genotype())
    counts: Dict[str, int] = {}

    # stems + last_3_2d (plain ConvBR candidate lists)
    for tkey, site in _STEM_MAP.items():
        n = candidates(tkey)
        assert n >= 1, f"missing site group {tkey}"
        counts[site] = n
        spec = fixed_specs[site]
        net.units[site] = [
            Unit(spec, *_convbr_from(sd, f"{tkey}.{i}", spec, used), 0)
            for i in range(n)]

    # cells (genes recovered per candidate)
    for c, plan in enumerate(_CELL2D_PLAN):
        group, site = f"cells_2d.{c}", f"cell_2d{c}"
        n = candidates(group)
        counts[site] = n
        units = []
        for i in range(n):
            spec, p, s = _cell_from(sd, f"{group}.{i}", plan, used)
            units.append(Unit(spec, p, s, 0))
        net.units[site] = units
    for c, plan in enumerate(_CELL3D_PLAN):
        group, site = f"cells_3d.{c}", f"cell_3d{c}"
        n = candidates(group)
        counts[site] = n
        units = []
        for i in range(n):
            spec, p, s = _cell_from(sd, f"{group}.{i}", plan, used)
            units.append(Unit(spec, p, s, 0))
        net.units[site] = units

    # per-task output heads
    for h in _HEAD_KEYS:
        n = candidates(h)
        assert n == task + 1, (h, n, task)
        spec = head_specs[h]
        net.heads[h] = [
            Unit(spec, *_convbr_from(sd, f"{h}.{i}", spec, used), 0)
            for i in range(n)]

    # shared DispHead (conv with bias)
    w = _w_nhwc(sd["depth_head.conv1.weight"])
    net.depth_head = Unit(
        DEPTH_HEAD_SPEC,
        {"w": jnp.asarray(w, jnp.float32),
         "bias1": jnp.asarray(sd["depth_head.conv1.bias"], jnp.float32)},
        {}, 0)
    used.update(("depth_head.conv1.weight", "depth_head.conv1.bias"))

    # task 0 is arch_init (candidate 0 everywhere); later tasks' maps are
    # not in the artifact
    net.archis = [net.archis[0]]
    net.genotypes = [Genotype(
        normal=net.units["cell_2d0"][0].spec.gene,
        reduce=net.units["cell_3d0"][0].spec.gene)]

    dormant = sorted(k for k in sd if k not in used and (
        ".bn." in k and (k.startswith("last_3_2d")
                         or k.startswith("last_3_3d"))))
    tracked = sorted(k for k in sd if k.endswith("num_batches_tracked")
                     and k not in dormant)
    unused = sorted(k for k in sd
                    if k not in used and k not in dormant
                    and k not in tracked)
    info = {"task": task, "imported": len(used),
            "skipped_dormant": len(dormant) + len(tracked),
            "candidates": counts, "unused": unused}
    assert not unused, f"unmapped reference tensors: {unused[:8]}"
    return net, info


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="Import a reference rag_depth checkpoint and run a "
                    "task-0 forward/eval parity check")
    ap.add_argument("ckpt")
    ap.add_argument("--eval", action="store_true",
                    help="evaluate task 0 on a synthetic depth scene")
    args = ap.parse_args(argv)
    net, info = import_depth_checkpoint(args.ckpt)
    print(f"imported task-{info['task']} checkpoint: "
          f"{info['imported']} tensors -> registry, "
          f"{info['skipped_dormant']} dormant skipped, "
          f"{net.size_m():.4f} M params")
    print("candidates per site:", info["candidates"])
    if args.eval:
        from rag_tpu.continual.depth_driver import SyntheticDepthDataset
        from rag_tpu.continual.driver import ContinualDriver  # noqa: F401
        from rag_tpu.metrics.meters import AverageMeterDict
        from rag_tpu.train.trainer import make_depth_eval_step

        specs, params, stats = net.path(net.archis[0])
        step = make_depth_eval_step(specs)
        ds = SyntheticDepthDataset(8, 96, 192, seed=1)
        m = AverageMeterDict()
        for b in ds.batches(2, False, seed=0, drop_last=False):
            m.update({k: float(v) for k, v in
                      step(params, stats, b["image"], b["depth"]).items()})
        v = m.mean()
        print("task-0 eval on synthetic scene: "
              + " ".join(f"{k}={v[k]:.4f}" for k in sorted(v)))


if __name__ == "__main__":
    main()
