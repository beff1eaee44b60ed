"""Genotype-driven cell evaluator (2D feature cells and 3D matching cells).

Reproduces the deployed-cell semantics of the reference
(src/models/rag_model.py:47-177): a 3-step DAG over states [s0, s1] where
each step sums the outputs of its (exactly two) genotype-selected in-edges
and the cell output concatenates the last block_multiplier=3 states.

The genotype here is *data*: a tuple of (edge, op) pairs, canonically sorted
by edge index (the reference assigns ops to edges in unsorted genotype row
order, a latent op/edge mismatch we deliberately fix — see SURVEY.md quirks).
Because the genotype is static python, the DAG unrolls at trace time into a
plain XLA graph; there is no dynamic control flow inside jit.

Ops vocabulary (src/automl/genotypes_2d.py:6-8, genotypes_3d.py:6-9):
  op 0 = skip_connect (identity), op 1 = conv_3x3 (ConvBR, stride 1).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax

from rag_tpu.ops.convbr import ConvBRSpec, apply_convbr, init_convbr
from rag_tpu.ops.resize import resize_linear, scale_dimension

STEPS = 3
BLOCK_MULTIPLIER = 3

OP_SKIP = 0
OP_CONV = 1

Gene = Tuple[Tuple[int, int], ...]  # ((edge, op) x 6), sorted by edge


def canonicalize_gene(pairs) -> Gene:
    """Sort (edge, op) pairs by edge within each step and validate."""
    pairs = sorted((int(e), int(o)) for e, o in pairs)
    assert len(pairs) == 2 * STEPS, pairs
    offset, nstates = 0, 2
    it = iter(pairs)
    flat = list(it)
    idx = 0
    for _ in range(STEPS):
        for _ in range(2):
            e, o = flat[idx]
            assert offset <= e < offset + nstates, (flat, offset, nstates)
            idx += 1
        offset += nstates
        nstates += 1
    return tuple(flat)


@dataclasses.dataclass(frozen=True)
class CellSpec:
    """Static cell description (hashable; part of jit cache keys)."""

    ndim: int          # 2 (feature) or 3 (matching)
    c_pp: int          # prev_prev input channels
    c_p: int           # prev input channels
    c_out: int         # per-state channels (filter_multiplier)
    downup: int        # -1 halve, 0 keep, +1 double spatial dims
    gene: Gene

    @property
    def out_channels(self) -> int:
        return BLOCK_MULTIPLIER * self.c_out


def cell_out_channels(c_out: int) -> int:
    return BLOCK_MULTIPLIER * c_out


def init_cell(key, spec: CellSpec):
    """Initialize cell params/stats trees keyed like the static gene."""
    keys = jax.random.split(key, 2 + len(spec.gene))
    pre_spec = ConvBRSpec(spec.ndim, spec.c_pp, spec.c_out, 1)
    prep_spec = ConvBRSpec(spec.ndim, spec.c_p, spec.c_out, 1)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    if spec.c_pp != spec.c_out:
        params["pre"], stats["pre"] = init_convbr(keys[0], pre_spec)
    params["prep"], stats["prep"] = init_convbr(keys[1], prep_spec)
    params["ops"], stats["ops"] = {}, {}
    conv_spec = ConvBRSpec(spec.ndim, spec.c_out, spec.c_out, 3)
    for i, (edge, op) in enumerate(spec.gene):
        if op == OP_CONV:
            p, s = init_convbr(keys[2 + i], conv_spec)
            params["ops"][str(edge)] = p
            stats["ops"][str(edge)] = s
    return params, stats


def _spatial_axes(ndim):
    return tuple(range(1, 1 + ndim))


def _edge_groups(gene: Gene):
    """Group conv edges by (global state index of their input): state 0 =
    s0, 1 = s1, 2+k = intermediate node k. States 0 and 1 are available at
    every step, so their conv edges across different steps share the SAME
    input tensor and merge into one wide conv (3x the MXU lane utilization
    at these tiny channel counts). Intermediate states merge within their
    own availability window."""
    groups: Dict[int, list] = {}
    offset, nstates = 0, 2
    step_of_edge = {}
    for step in range(STEPS):
        for j in range(nstates):
            step_of_edge[offset + j] = (step, j)
        offset += nstates
        nstates += 1
    for edge, op in gene:
        if op == OP_CONV:
            _, state_idx = step_of_edge[edge]
            groups.setdefault(state_idx, []).append(edge)
    return groups


def _merged_convbr(spec_one: ConvBRSpec, params, stats, edges, x, train,
                   halves: int = 1):
    """Run several same-input ConvBR blocks as ONE conv with concatenated
    output channels (exactly equivalent: conv/BN/ReLU are all per-output-
    channel). Returns ({edge: out}, {edge: new_stats})."""
    c = spec_one.cout
    if len(edges) == 1:
        k = str(edges[0])
        out, ns = apply_convbr(spec_one, params[k], stats[k], x, train,
                               halves=halves)
        return {edges[0]: out}, {k: ns}
    merged_spec = ConvBRSpec(spec_one.ndim, spec_one.cin, c * len(edges),
                             spec_one.kernel, spec_one.stride,
                             spec_one.bn, spec_one.relu)
    keys = [str(e) for e in edges]
    mp = {
        "w": jax.numpy.concatenate([params[k]["w"] for k in keys], axis=-1),
        "scale": jax.numpy.concatenate([params[k]["scale"] for k in keys]),
        "bias": jax.numpy.concatenate([params[k]["bias"] for k in keys]),
    }
    ms = {
        "mean": jax.numpy.concatenate([stats[k]["mean"] for k in keys]),
        "var": jax.numpy.concatenate([stats[k]["var"] for k in keys]),
    }
    out, ns = apply_convbr(merged_spec, mp, ms, x, train, halves=halves)
    outs, new_stats = {}, {}
    for i, (e, k) in enumerate(zip(edges, keys)):
        outs[e] = out[..., i * c:(i + 1) * c]
        new_stats[k] = {"mean": ns["mean"][i * c:(i + 1) * c],
                        "var": ns["var"][i * c:(i + 1) * c]}
    return outs, new_stats


def apply_cell(spec: CellSpec, params, stats, s0, s1, train: bool,
               halves: int = 1):
    """Run the cell DAG. Returns (concat_out, new_stats).

    Conv edges sharing an input state are merged into single wide convs
    (see _edge_groups) — a TPU-specific exact rewrite: at c_out=4..16 the
    MXU's 128-lane output dim is otherwise >90% idle.
    """
    ndim = spec.ndim
    axes = _spatial_axes(ndim)
    new_stats: Dict[str, Any] = {"ops": {}}

    if spec.downup != 0:
        scale = 0.5 if spec.downup == -1 else 2.0
        target = tuple(scale_dimension(s1.shape[a], scale) for a in axes)
        s1 = resize_linear(s1, target, axes, align_corners=True)
    s1_spatial = tuple(s1.shape[a] for a in axes)
    s0_spatial = tuple(s0.shape[a] for a in axes)
    if s0_spatial != s1_spatial:
        s0 = resize_linear(s0, s1_spatial, axes, align_corners=True)

    if spec.c_pp != spec.c_out:
        pre_spec = ConvBRSpec(ndim, spec.c_pp, spec.c_out, 1)
        s0, new_stats["pre"] = apply_convbr(pre_spec, params["pre"], stats["pre"], s0, train, halves=halves)
    prep_spec = ConvBRSpec(ndim, spec.c_p, spec.c_out, 1)
    s1, new_stats["prep"] = apply_convbr(prep_spec, params["prep"], stats["prep"], s1, train, halves=halves)

    conv_spec = ConvBRSpec(ndim, spec.c_out, spec.c_out, 3)
    groups = _edge_groups(spec.gene)
    conv_out: Dict[int, Any] = {}

    def run_group(state_idx, x):
        if state_idx not in groups:
            return
        outs, ns = _merged_convbr(conv_spec, params["ops"], stats["ops"],
                                  groups[state_idx], x, train, halves=halves)
        conv_out.update(outs)
        new_stats["ops"].update(ns)

    run_group(0, s0)
    run_group(1, s1)

    states = [s0, s1]
    offset = 0
    for _ in range(STEPS):
        acc = None
        for edge, op in spec.gene:
            if not (offset <= edge < offset + len(states)):
                continue
            j = edge - offset  # == global state index at this step
            if op == OP_CONV:
                if edge not in conv_out:  # safety net; groups pre-run below
                    run_group(j, states[j])
                h = conv_out[edge]
            else:
                h = states[j]
            acc = h if acc is None else acc + h
        offset += len(states)
        states.append(acc)
        # newly created state (index 2 + step) may feed later conv edges
        run_group(len(states) - 1, states[-1])

    out = jax.numpy.concatenate(states[-BLOCK_MULTIPLIER:], axis=-1)
    return out, new_stats


# ---------------------------------------------------------------------------
# Channel-first 3D cell (B, D, C, H, W) — the TPU-native matching layout
# (see rag_tpu.ops.convbr_cf). Identical math, channel axis 2, spatial
# axes (1, 3, 4).
# ---------------------------------------------------------------------------


def _merged_convbr_cf(spec_one, params, stats, edges, x, train):
    from rag_tpu.ops.convbr import ConvBRSpec
    from rag_tpu.ops.convbr_cf import apply_convbr_cf

    c = spec_one.cout
    if len(edges) == 1:
        k = str(edges[0])
        out, ns = apply_convbr_cf(spec_one, params[k], stats[k], x, train)
        return {edges[0]: out}, {k: ns}
    merged_spec = ConvBRSpec(3, spec_one.cin, c * len(edges),
                             spec_one.kernel, spec_one.stride,
                             spec_one.bn, spec_one.relu)
    keys = [str(e) for e in edges]
    mp = {
        "w": jax.numpy.concatenate([params[k]["w"] for k in keys], axis=-1),
        "scale": jax.numpy.concatenate([params[k]["scale"] for k in keys]),
        "bias": jax.numpy.concatenate([params[k]["bias"] for k in keys]),
    }
    ms = {
        "mean": jax.numpy.concatenate([stats[k]["mean"] for k in keys]),
        "var": jax.numpy.concatenate([stats[k]["var"] for k in keys]),
    }
    out, ns = apply_convbr_cf(merged_spec, mp, ms, x, train)
    outs, new_stats = {}, {}
    for i, (e, k) in enumerate(zip(edges, keys)):
        outs[e] = out[:, :, i * c:(i + 1) * c]
        new_stats[k] = {"mean": ns["mean"][i * c:(i + 1) * c],
                        "var": ns["var"][i * c:(i + 1) * c]}
    return outs, new_stats


def apply_cell_cf(spec: CellSpec, params, stats, s0, s1, train: bool):
    """Channel-first 3D cell: inputs (B, D, C, H, W)."""
    from rag_tpu.ops.convbr import ConvBRSpec
    from rag_tpu.ops.convbr_cf import apply_convbr_cf

    from rag_tpu.ops.pallas_resize import resize_cf

    assert spec.ndim == 3
    axes = (1, 3, 4)
    new_stats: Dict[str, Any] = {"ops": {}}

    if spec.downup != 0:
        scale = 0.5 if spec.downup == -1 else 2.0
        target = tuple(scale_dimension(s1.shape[a], scale) for a in axes)
        s1 = resize_cf(s1, *target, True)
    s1_spatial = tuple(s1.shape[a] for a in axes)
    s0_spatial = tuple(s0.shape[a] for a in axes)
    if s0_spatial != s1_spatial:
        s0 = resize_cf(s0, *s1_spatial, True)

    if spec.c_pp != spec.c_out:
        pre_spec = ConvBRSpec(3, spec.c_pp, spec.c_out, 1)
        s0, new_stats["pre"] = apply_convbr_cf(pre_spec, params["pre"],
                                               stats["pre"], s0, train)
    prep_spec = ConvBRSpec(3, spec.c_p, spec.c_out, 1)
    s1, new_stats["prep"] = apply_convbr_cf(prep_spec, params["prep"],
                                            stats["prep"], s1, train)

    conv_spec = ConvBRSpec(3, spec.c_out, spec.c_out, 3)
    groups = _edge_groups(spec.gene)
    conv_out: Dict[int, Any] = {}

    def run_group(state_idx, x):
        if state_idx not in groups:
            return
        outs, ns = _merged_convbr_cf(conv_spec, params["ops"], stats["ops"],
                                     groups[state_idx], x, train)
        conv_out.update(outs)
        new_stats["ops"].update(ns)

    run_group(0, s0)
    run_group(1, s1)

    states = [s0, s1]
    offset = 0
    for _ in range(STEPS):
        acc = None
        for edge, op in spec.gene:
            if not (offset <= edge < offset + len(states)):
                continue
            j = edge - offset
            if op == OP_CONV:
                if edge not in conv_out:
                    run_group(j, states[j])
                h = conv_out[edge]
            else:
                h = states[j]
            acc = h if acc is None else acc + h
        offset += len(states)
        states.append(acc)
        run_group(len(states) - 1, states[-1])

    out = jax.numpy.concatenate(states[-BLOCK_MULTIPLIER:], axis=2)
    return out, new_stats
