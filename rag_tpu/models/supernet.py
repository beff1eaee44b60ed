"""MdeNAS search supernet: every edge carries BOTH candidate ops, with the
sampled op chosen at runtime by a traced index.

TPU-native counterpart of the reference's BasicNetwork / AutoFeature /
AutoMatching (src/automl/mdenas_basicmodel.py, build_model_2d.py,
build_model_3d.py). The reference re-instantiates python modules and pays a
fresh CUDA graph per sampled path; here the op choice per edge is a
``lax.cond`` on a traced int vector, so the whole 100-epoch search runs in
ONE compiled executable — the untaken branch is never executed, preserving
the reference's single-path semantics (only the sampled op's weights/BN see
the batch).

Macro-architectures (fixed):
  feature  4 cells [down, up, down, up]          (build_model_2d.py:173-217)
  matching 8 cells [same,same,same,down,down,up,down,same]
                                                 (build_model_3d.py:170-255)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rag_tpu.ops.convbr import ConvBRSpec, apply_convbr, init_convbr
from rag_tpu.ops.cost_volume import cost_volume
from rag_tpu.ops.disparity import soft_argmin_disparity
from rag_tpu.ops.resize import resize_linear, scale_dimension

NUM_EDGES = 9  # sum(2 + i for i in range(3))
STEPS = 3
BLOCK = 3
FM = 4
INITIAL_FM = FM * BLOCK  # 12
HALF_FM = INITIAL_FM // 2
MAXDISP = 192

# edges whose input is state0 (dead when the cell has no s0 input)
_S0_EDGES = (0, 2, 5)


@dataclasses.dataclass(frozen=True)
class SuperCellSpec:
    ndim: int
    c_pp: Optional[int]  # None when the cell has no prev_prev input
    c_p: int
    c_out: int
    mode: str  # 'down' | 'same' | 'up'

    @property
    def has_s0(self) -> bool:
        return self.c_pp is not None

    @property
    def live_edges(self):
        return tuple(
            e for e in range(NUM_EDGES) if self.has_s0 or e not in _S0_EDGES
        )


def init_supercell(key, spec: SuperCellSpec):
    keys = jax.random.split(key, 2 + NUM_EDGES)
    params: Dict[str, Any] = {"edges": {}}
    stats: Dict[str, Any] = {"edges": {}}
    if spec.has_s0 and spec.c_pp != spec.c_out:
        pre = ConvBRSpec(spec.ndim, spec.c_pp, spec.c_out, 1)
        params["pre"], stats["pre"] = init_convbr(keys[0], pre)
    prep = ConvBRSpec(spec.ndim, spec.c_p, spec.c_out, 1)
    params["prep"], stats["prep"] = init_convbr(keys[1], prep)
    conv = ConvBRSpec(spec.ndim, spec.c_out, spec.c_out, 3)
    for e in spec.live_edges:
        p, s = init_convbr(keys[2 + e], conv)
        params["edges"][str(e)] = p
        stats["edges"][str(e)] = s
    return params, stats


def _mixed_op(conv_spec, p, st, x, op_idx, train, cf=False, halves=1):
    """lax.cond between identity (op 0) and ConvBR 3x3 (op 1)."""

    def conv_branch(args):
        p_, st_, x_ = args
        if cf:
            from rag_tpu.ops.convbr_cf import apply_convbr_cf

            return apply_convbr_cf(conv_spec, p_, st_, x_, train)
        return apply_convbr(conv_spec, p_, st_, x_, train, halves=halves)

    def skip_branch(args):
        _, st_, x_ = args
        return x_, st_

    return jax.lax.cond(op_idx == 1, conv_branch, skip_branch, (p, st, x))


def apply_supercell(spec: SuperCellSpec, params, stats, s0, s1, ops, train,
                    cf=False, halves=1):
    """ops: (9,) int array of sampled op indices. Returns (out, new_stats).

    cf=True runs a 3D cell in the channel-first (B, D, C, H, W) layout
    (the Pallas conv3d path — see rag_tpu.ops.convbr_cf)."""
    ndim = spec.ndim
    if cf:
        assert ndim == 3
        axes = (1, 3, 4)
        cat_axis = 2
        from rag_tpu.ops.convbr_cf import apply_convbr_cf as _apply
    else:
        axes = tuple(range(1, 1 + ndim))
        cat_axis = -1
        _apply = apply_convbr
    new_stats: Dict[str, Any] = {"edges": {}}

    if spec.mode != "same":
        scale = 0.5 if spec.mode == "down" else 2.0
        tgt = tuple(scale_dimension(s1.shape[a], scale) for a in axes)
        s1 = resize_linear(s1, tgt, axes, align_corners=True)
    prep = ConvBRSpec(ndim, spec.c_p, spec.c_out, 1)
    s1p, new_stats["prep"] = _apply(prep, params["prep"], stats["prep"], s1,
                                    train, **({} if cf else {"halves": halves}))

    if spec.has_s0:
        s1_spatial = tuple(s1p.shape[a] for a in axes)
        if tuple(s0.shape[a] for a in axes) != s1_spatial:
            s0 = resize_linear(s0, s1_spatial, axes, align_corners=True)
        if spec.c_pp != spec.c_out:
            pre = ConvBRSpec(ndim, spec.c_pp, spec.c_out, 1)
            s0, new_stats["pre"] = _apply(pre, params["pre"], stats["pre"],
                                          s0, train,
                                          **({} if cf else {"halves": halves}))
    else:
        s0 = None

    conv = ConvBRSpec(ndim, spec.c_out, spec.c_out, 3)
    states = [s0, s1p]
    offset = 0
    for _ in range(STEPS):
        acc = None
        for j, h in enumerate(states):
            e = offset + j
            if h is None or e not in spec.live_edges:
                continue
            k = str(e)
            out, new_stats["edges"][k] = _mixed_op(
                conv, params["edges"][k], stats["edges"][k], h, ops[e],
                train, cf=cf, halves=halves
            )
            acc = out if acc is None else acc + out
        offset += len(states)
        states.append(acc)
    return jnp.concatenate(states[-BLOCK:], axis=cat_axis), new_stats


# ---------------------------------------------------------------------------
# Feature supernet (AutoFeature, build_model_2d.py:155-235)
# ---------------------------------------------------------------------------

_FEA_STEMS = {
    "stem0": ConvBRSpec(2, 3, HALF_FM, 3, 1),
    "stem1": ConvBRSpec(2, HALF_FM, HALF_FM, 3, 3),
    "stem2": ConvBRSpec(2, HALF_FM, INITIAL_FM, 3, 1),
}
_FEA_CELLS = (
    SuperCellSpec(2, None, 12, 8, "down"),
    SuperCellSpec(2, 12, 24, 4, "up"),
    SuperCellSpec(2, 24, 12, 8, "down"),
    SuperCellSpec(2, 12, 24, 4, "up"),
)
_FEA_LAST = {"last_3": ConvBRSpec(2, INITIAL_FM, INITIAL_FM, 1, 1, bn=False, relu=False)}

# Matching supernet (AutoMatching, build_model_3d.py:155-275)
_MAT_STEMS = {"stem0": ConvBRSpec(3, INITIAL_FM * 2, INITIAL_FM, 3, 1)}
_MAT_CELLS = (
    SuperCellSpec(3, None, 12, 4, "same"),
    SuperCellSpec(3, 12, 12, 4, "same"),
    SuperCellSpec(3, 12, 12, 4, "same"),
    SuperCellSpec(3, 12, 12, 8, "down"),
    SuperCellSpec(3, 12, 24, 16, "down"),
    SuperCellSpec(3, 24, 48, 8, "up"),
    SuperCellSpec(3, 48, 24, 16, "down"),
    SuperCellSpec(3, 24, 48, 16, "same"),
)
_MAT_LAST = {
    "last_3": ConvBRSpec(3, INITIAL_FM, 1, 3, 1, bn=False, relu=False),
    "last_6": ConvBRSpec(3, INITIAL_FM * 2, INITIAL_FM, 1, 1),
    "last_12": ConvBRSpec(3, INITIAL_FM * 4, INITIAL_FM * 2, 1, 1),
}


def init_supernet(key):
    """Initialize the full search supernet. Returns (params, stats)."""
    params: Dict[str, Any] = {"fea": {}, "mat": {}}
    stats: Dict[str, Any] = {"fea": {}, "mat": {}}
    k = iter(jax.random.split(key, 32))
    for name, spec in {**_FEA_STEMS, **_FEA_LAST}.items():
        params["fea"][name], stats["fea"][name] = init_convbr(next(k), spec)
    for i, spec in enumerate(_FEA_CELLS):
        params["fea"][f"cell{i}"], stats["fea"][f"cell{i}"] = init_supercell(next(k), spec)
    for name, spec in {**_MAT_STEMS, **_MAT_LAST}.items():
        params["mat"][name], stats["mat"][name] = init_convbr(next(k), spec)
    for i, spec in enumerate(_MAT_CELLS):
        params["mat"][f"cell{i}"], stats["mat"][f"cell{i}"] = init_supercell(next(k), spec)
    return params, stats


def _fea_forward(params, stats, x, ops, train, new_stats, halves=1):
    ns = new_stats["fea"]

    def conv(name, h):
        out, ns[name] = apply_convbr(_FEA_STEMS.get(name) or _FEA_LAST[name],
                                     params["fea"][name], stats["fea"][name],
                                     h, train, halves=halves)
        return out

    def cell(i, s0, s1):
        out, ns[f"cell{i}"] = apply_supercell(
            _FEA_CELLS[i], params["fea"][f"cell{i}"], stats["fea"][f"cell{i}"],
            s0, s1, ops, train, halves=halves)
        return out

    stem0 = conv("stem0", x)
    stem1 = conv("stem1", stem0)
    stem2 = conv("stem2", stem1)
    # macro wiring of AutoFeature.forward (build_model_2d.py:199-219)
    l6 = cell(0, None, stem2)        # 1/6
    l3_1 = cell(1, stem2, l6)        # 1/3
    l6_1 = cell(2, l6, l3_1)         # 1/6
    l3_2 = cell(3, l3_1, l6_1)       # 1/3
    return conv("last_3", l3_2)


def _mat_forward(params, stats, cost, ops, train, new_stats, cf=False):
    ns = new_stats["mat"]
    if cf:
        from rag_tpu.ops.convbr_cf import apply_convbr_cf as _apply

        axes = (1, 3, 4)
        d, h, w = cost.shape[1], cost.shape[3], cost.shape[4]
    else:
        _apply = apply_convbr
        axes = (1, 2, 3)
        d, h, w = cost.shape[1], cost.shape[2], cost.shape[3]

    def conv(name, h_):
        out, ns[name] = _apply(_MAT_STEMS.get(name) or _MAT_LAST[name],
                               params["mat"][name], stats["mat"][name],
                               h_, train)
        return out

    def cell(i, s0, s1):
        out, ns[f"cell{i}"] = apply_supercell(
            _MAT_CELLS[i], params["mat"][f"cell{i}"], stats["mat"][f"cell{i}"],
            s0, s1, ops, train, cf=cf)
        return out

    stem = conv("stem0", cost)
    # macro wiring of AutoMatching.forward (build_model_3d.py:231-255)
    l3 = cell(0, None, stem)
    l3_1 = cell(1, stem, l3)
    l3_2 = cell(2, l3, l3_1)
    l6 = cell(3, l3_1, l3_2)         # 1/2
    l12 = cell(4, l3_2, l6)          # 1/4
    l6b = cell(5, l6, l12)           # 1/2
    l12_1 = cell(6, l12, l6b)        # 1/4
    l12_2 = cell(7, l6b, l12_1)      # 1/4

    x = conv("last_12", l12_2)
    x = resize_linear(x, (d // 2, h // 2, w // 2), axes, align_corners=True)
    x = conv("last_6", x)
    x = resize_linear(x, (d, h, w), axes, align_corners=True)
    return conv("last_3", x)


def _default_cf_supernet() -> bool:
    import os

    if os.environ.get("RAG_TPU_CF_MATCHING", "") == "0":
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def supernet_forward(params, stats, left, right, fea_ops, mat_ops,
                     train: bool, cf_matching=None, maxdisp: int = MAXDISP):
    """Full search-supernet pipeline. fea_ops/mat_ops: (9,) int arrays.

    Returns (disp (B,H,W), new_stats). On TPU the matching half runs in
    the channel-first layout through the Pallas conv3d kernels."""
    from rag_tpu.ops.precision import cast_feature_in, cast_in

    new_stats: Dict[str, Any] = {"fea": {}, "mat": {}}
    # left+right feature extraction as ONE stacked batch: train-mode BN
    # uses per-half statistics + two sequential EMA updates (batch_norm
    # halves=2) — exactly the reference's sequential two passes
    # (mdenas_basicmodel.py:79-80) at half the dispatch
    both = cast_feature_in(jnp.concatenate([left, right], axis=0))
    f = _fea_forward(params, stats, both, fea_ops, train, new_stats,
                     halves=2)
    bsz = left.shape[0]
    x, y = f[:bsz], f[bsz:]
    # mixed-precision boundary: the matching half rides bf16-at-rest when
    # enabled (same policy as the deployed model, rag_tpu.ops.precision)
    x, y = cast_in(x), cast_in(y)
    if cf_matching is None:
        cf_matching = _default_cf_supernet() and x.shape[1] % 8 == 0
    if cf_matching:
        from rag_tpu.ops.cost_volume import cost_volume_cf

        cost = cost_volume_cf(x, y, maxdisp // 3)     # (B, D, 2C, h, w)
        mat = _mat_forward(params, stats, cost, mat_ops, train, new_stats,
                           cf=True)                   # (B, D, 1, h, w)
        mat = jnp.moveaxis(mat, 2, -1)                # (B, D, h, w, 1)
    else:
        cost = cost_volume(x, y, maxdisp // 3)
        mat = _mat_forward(params, stats, cost, mat_ops, train, new_stats)
    mat = mat.astype(jnp.float32)  # head always runs f32
    return soft_argmin_disparity(mat, maxdisp, 3), new_stats


# ---------------------------------------------------------------------------
# Depth-variant supernet (rag_depth/src/automl/: matching half rewired to
# 2D, cost = left features only, DispHead sigmoid x max_depth)
# ---------------------------------------------------------------------------

_DMAT_STEMS = {"stem0": ConvBRSpec(2, INITIAL_FM, INITIAL_FM, 3, 1)}
_DMAT_CELLS = tuple(
    SuperCellSpec(2, s.c_pp, s.c_p, s.c_out, s.mode) for s in _MAT_CELLS
)
_DMAT_LAST = {
    "last_3": ConvBRSpec(2, INITIAL_FM, 1, 3, 1, bn=False, relu=False),
    "last_6": ConvBRSpec(2, INITIAL_FM * 2, INITIAL_FM, 1, 1),
    "last_12": ConvBRSpec(2, INITIAL_FM * 4, INITIAL_FM * 2, 1, 1),
}
MAX_DEPTH = 80.0


def init_depth_supernet(key):
    params: Dict[str, Any] = {"fea": {}, "mat": {}}
    stats: Dict[str, Any] = {"fea": {}, "mat": {}}
    k = iter(jax.random.split(key, 32))
    for name, spec in {**_FEA_STEMS, **_FEA_LAST}.items():
        params["fea"][name], stats["fea"][name] = init_convbr(next(k), spec)
    for i, spec in enumerate(_FEA_CELLS):
        params["fea"][f"cell{i}"], stats["fea"][f"cell{i}"] = init_supercell(next(k), spec)
    for name, spec in {**_DMAT_STEMS, **_DMAT_LAST}.items():
        params["mat"][name], stats["mat"][name] = init_convbr(next(k), spec)
    for i, spec in enumerate(_DMAT_CELLS):
        params["mat"][f"cell{i}"], stats["mat"][f"cell{i}"] = init_supercell(next(k), spec)
    # task-shared DispHead (conv 1->1 + bias, sigmoid, x3 upsample, x80 m)
    kk = next(k)
    head = {"w": jax.random.normal(kk, (3, 3, 1, 1)) * np.sqrt(2.0 / 9),
            "b": jnp.zeros((1,))}
    params["depth_head"] = head
    return params, stats


def _dmat_forward(params, stats, fea, ops, train, new_stats):
    ns = new_stats["mat"]

    def conv(name, h):
        out, ns[name] = apply_convbr(_DMAT_STEMS.get(name) or _DMAT_LAST[name],
                                     params["mat"][name], stats["mat"][name], h, train)
        return out

    def cell(i, s0, s1):
        out, ns[f"cell{i}"] = apply_supercell(
            _DMAT_CELLS[i], params["mat"][f"cell{i}"], stats["mat"][f"cell{i}"],
            s0, s1, ops, train)
        return out

    stem = conv("stem0", fea)
    l3 = cell(0, None, stem)
    l3_1 = cell(1, stem, l3)
    l3_2 = cell(2, l3, l3_1)
    l6 = cell(3, l3_1, l3_2)
    l12 = cell(4, l3_2, l6)
    l6b = cell(5, l6, l12)
    l12_1 = cell(6, l12, l6b)
    l12_2 = cell(7, l6b, l12_1)

    h, w = fea.shape[1], fea.shape[2]
    x = conv("last_12", l12_2)
    x = resize_linear(x, (h // 2, w // 2), (1, 2), align_corners=True)
    x = conv("last_6", x)
    x = resize_linear(x, (h, w), (1, 2), align_corners=True)
    return conv("last_3", x)  # (B, h, w, 1)


def depth_supernet_forward(params, stats, image, fea_ops, mat_ops, train: bool):
    """Depth search-supernet: image -> depth (B,H,W) in [0, MAX_DEPTH]."""
    import jax.numpy as jnp

    new_stats: Dict[str, Any] = {"fea": {}, "mat": {}}
    fea = _fea_forward(params, stats, image, fea_ops, train, new_stats)
    mat = _dmat_forward(params, stats, fea, mat_ops, train, new_stats)
    hp = params["depth_head"]
    y = jax.lax.conv_general_dilated(
        mat, hp["w"], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + hp["b"]
    y = jax.nn.sigmoid(y)
    h, w = fea.shape[1], fea.shape[2]
    y = resize_linear(y, (h * 3, w * 3), (1, 2), align_corners=False)
    return y[..., 0] * MAX_DEPTH, new_stats
