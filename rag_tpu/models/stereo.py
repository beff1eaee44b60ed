"""The deployed stereo pipeline: Feature Net -> cost volume -> Matching Net
-> soft-argmin disparity regression.

This is the TPU-native counterpart of the reference's deployed Network
(src/models/rag_model.py:181-387), restructured so the architecture is data:

  * a *path* is a dict  site -> (static spec, params, stats)  covering the 18
    searchable sites plus the 3 per-task output heads;
  * ``stereo_forward`` is a pure function of (specs, params, stats, inputs)
    — the continual-growth machinery (rag_tpu.models.growable) merely
    assembles different paths from its per-site candidate registries.

Macro-architecture (fixed across tasks, reference rag_model.py:206-266):
  feature net   4 cells, scales [down, up, down, up]  (1/3 <-> 1/6)
  matching net  8 cells, scales [0,0,0,down,down,up,down,0] (1 -> 1/4)

Channel plan with filter_multiplier=4, block_multiplier=3 (initial_fm=12):
see _SITE_BUILDERS below; it matches rag_model.py:206-271 line for line.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple, Union

import jax
import jax.numpy as jnp

from rag_tpu.ops.cell import CellSpec, apply_cell, init_cell
from rag_tpu.ops.convbr import ConvBRSpec, apply_convbr, init_convbr
from rag_tpu.ops.cost_volume import cost_volume, cost_volume_cf
from rag_tpu.ops.disparity import soft_argmin_disparity
from rag_tpu.ops.pallas_kernels import soft_argmin_disparity_fused
from rag_tpu.ops.resize import resize_linear

MAXDISP = 192
FILTER_MULTIPLIER = 4
BLOCK_MULTIPLIER = 3
INITIAL_FM = FILTER_MULTIPLIER * BLOCK_MULTIPLIER  # 12
HALF_FM = INITIAL_FM // 2                          # 6

# p-index order of the 18 searchable sites (reference rag_model.py expand():
# stems2d 0-2, cells2d 3-6, last_3_2d 7, stems3d 8-9, cells3d 10-17).
SITE_NAMES = (
    "stem_2d0", "stem_2d1", "stem_2d2",
    "cell_2d0", "cell_2d1", "cell_2d2", "cell_2d3",
    "last_3_2d",
    "stem_3d0", "stem_3d1",
    "cell_3d0", "cell_3d1", "cell_3d2", "cell_3d3",
    "cell_3d4", "cell_3d5", "cell_3d6", "cell_3d7",
)

# per-task output heads: a fresh copy is always created for each task
# (reference rag_model.py:540-542, 832-839).
HEAD_NAMES = ("last_3_3d", "last_6_3d", "last_12_3d")

# (c_pp, c_p, c_out, downup) for each cell site — absolute channel counts
# derived from rag_model.py:206-266 (bm * fm products pre-multiplied).
_CELL2D_PLAN = (
    (12, 12, 8, -1),
    (12, 24, 4, +1),
    (24, 12, 8, -1),
    (12, 24, 4, +1),
)
_CELL3D_PLAN = (
    (12, 12, 4, 0),
    (12, 12, 4, 0),
    (12, 12, 4, 0),
    (12, 12, 8, -1),
    (12, 24, 16, -1),
    (24, 48, 8, +1),
    (48, 24, 16, -1),
    (24, 48, 16, 0),
)

Spec = Union[ConvBRSpec, CellSpec]


def build_site_specs(genotype) -> Dict[str, Spec]:
    """Specs for one candidate unit per searchable site, from a task's
    freshly searched genotype (the reference builds exactly these modules in
    Network.__init__ / Network.expand)."""
    specs: Dict[str, Spec] = {
        "stem_2d0": ConvBRSpec(2, 3, HALF_FM, 3, 1),
        "stem_2d1": ConvBRSpec(2, HALF_FM, INITIAL_FM, 3, 3),
        "stem_2d2": ConvBRSpec(2, INITIAL_FM, INITIAL_FM, 3, 1),
        "last_3_2d": ConvBRSpec(2, INITIAL_FM, INITIAL_FM, 1, 1, bn=False, relu=False),
        "stem_3d0": ConvBRSpec(3, INITIAL_FM * 2, INITIAL_FM, 3, 1),
        "stem_3d1": ConvBRSpec(3, INITIAL_FM, INITIAL_FM, 3, 1),
    }
    for i, (cpp, cp, cout, downup) in enumerate(_CELL2D_PLAN):
        specs[f"cell_2d{i}"] = CellSpec(2, cpp, cp, cout, downup, genotype.normal)
    for i, (cpp, cp, cout, downup) in enumerate(_CELL3D_PLAN):
        specs[f"cell_3d{i}"] = CellSpec(3, cpp, cp, cout, downup, genotype.reduce)
    return specs


def build_head_specs() -> Dict[str, ConvBRSpec]:
    """Per-task matching-output heads (rag_model.py:269-271)."""
    return {
        "last_3_3d": ConvBRSpec(3, INITIAL_FM, 1, 3, 1, bn=False, relu=False),
        "last_6_3d": ConvBRSpec(3, INITIAL_FM * 2, INITIAL_FM, 1, 1),
        "last_12_3d": ConvBRSpec(3, INITIAL_FM * 4, INITIAL_FM * 2, 1, 1),
    }


def _default_cf() -> bool:
    """Channel-first matching by default on TPU (the Pallas conv3d kernel
    needs W on lanes); channels-last elsewhere."""
    import os

    if os.environ.get("RAG_TPU_CF_MATCHING", "") == "0":
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _init_one(key, spec: Spec):
    if isinstance(spec, CellSpec):
        return init_cell(key, spec)
    return init_convbr(key, spec)


def init_sites(key, specs: Mapping[str, Spec]) -> Tuple[Dict, Dict]:
    """Initialize params/stats for every site in ``specs``."""
    names = sorted(specs)
    keys = jax.random.split(key, len(names))
    params, stats = {}, {}
    for k, name in zip(keys, names):
        params[name], stats[name] = _init_one(k, specs[name])
    return params, stats


def _apply(specs, params, stats, name, x, train_sites, new_stats, *extra,
           halves: int = 1):
    spec = specs[name]
    train = name in train_sites
    if isinstance(spec, CellSpec):
        out, st = apply_cell(spec, params[name], stats[name], extra[0], x,
                             train, halves=halves)
    else:
        out, st = apply_convbr(spec, params[name], stats[name], x, train,
                               halves=halves)
    new_stats[name] = st
    return out


def extract_feature(specs, params, stats, image, train_sites, new_stats,
                    halves: int = 1):
    """2D feature net: image (B,H,W,3) -> features (B,H/3,W/3,12).

    Mirrors Network.feature (rag_model.py:285-323): stems, 4 cells chained as
    (prev_prev, prev) pairs, then the bn/relu-free last_3_2d projection.

    halves=2: image is left+right stacked along batch — train-mode BN uses
    per-half statistics + two sequential EMA updates (see
    rag_tpu.ops.convbr.batch_norm), exactly the reference's two passes.
    """
    from rag_tpu.ops.precision import cast_feature_in

    # feature-net precision boundary: bf16-at-rest extends to the 2D net
    # when enabled (stem0/stem1 buffers run at full resolution and
    # dominate the net's HBM traffic); BN stats still accumulate f32
    image = cast_feature_in(image)
    s = _apply(specs, params, stats, "stem_2d0", image, train_sites,
               new_stats, halves=halves)
    stem1 = _apply(specs, params, stats, "stem_2d1", s, train_sites,
                   new_stats, halves=halves)
    stem2 = _apply(specs, params, stats, "stem_2d2", stem1, train_sites,
                   new_stats, halves=halves)
    s_pp, s_p = stem1, stem2
    for i in range(4):
        out = _apply(specs, params, stats, f"cell_2d{i}", s_p, train_sites,
                     new_stats, s_pp, halves=halves)
        s_pp, s_p = s_p, out
    return _apply(specs, params, stats, "last_3_2d", s_p, train_sites,
                  new_stats, halves=halves)


def _fused_stem_ok(spec) -> bool:
    # Default OFF: the shear-collapsed jnp fused stem is exact (tests/
    # test_fused_stem.py) and skips materializing the volume, but its five
    # volume-sized gathers measured SLOWER than the materialized volume +
    # Pallas conv at the train geometry (25.1 vs 22.4 ms fwd) and neutral
    # at eval (47.6 vs 48.4 ms) on v5e — see BASELINE.md. Kept as the
    # exactness foundation for a Pallas shear kernel (in-VMEM lane rolls
    # replace the gathers).
    import os

    return (os.environ.get("RAG_TPU_FUSED_STEM", "0") == "1"
            and not isinstance(spec, CellSpec) and spec.kernel == 3
            and spec.stride == 1 and spec.bn and spec.relu)


def _cvstem_wiring_ok(x_nhwc, spec) -> bool:
    # Take the fused cost-volume+stem branch only when its kernel would
    # actually engage at this shape; otherwise fall through to the
    # materialized volume + the Pallas conv3d path (which has its own
    # large-shape variants) — cvstem's internal fallback is a pure-XLA
    # composition that would bypass those kernels (measured slower at the
    # 480x960 eval geometry). Off-TPU the XLA composition IS the conv
    # path, so shape alone decides and CPU tests exercise this wiring.
    import os

    if os.environ.get("RAG_TPU_CVSTEM", "1") != "1":
        return False
    from rag_tpu.ops.pallas_cvstem import cvstem_v3_ok, cvstem_vmem_ok

    b, h, w, c = x_nhwc.shape
    return (cvstem_vmem_ok(b, c, h, w, spec.cout)
            or cvstem_v3_ok(b, c, h, w, spec.cout))


def run_matching_cf(specs, params, stats, cost, train_sites, new_stats,
                    fused_stem_inputs=None):
    """Channel-first matching path: cost (B, D, 2C, h, w) -> (B, D, h, w).

    Same math as run_matching in the TPU-native (B,D,C,H,W) layout: the
    Pallas conv3d kernel runs without per-call transposes, and the
    1-channel output drops straight into the disparity head.

    fused_stem_inputs: optional (x, y, num_disp) NHWC feature maps; when
    given, cost may be None — either the shear-collapsed fused stem
    (rag_tpu.ops.fused_stem, RAG_TPU_FUSED_STEM=1) computes stem0's
    output without materializing the volume, or the volume is built here
    in the cf layout.
    """
    from rag_tpu.ops.cell import apply_cell_cf
    from rag_tpu.ops.convbr_cf import apply_convbr_cf, batch_norm_cf

    def appl(name, x, *extra):
        spec = specs[name]
        train = name in train_sites
        if isinstance(spec, CellSpec):
            out, st = apply_cell_cf(spec, params[name], stats[name],
                                    extra[0], x, train)
        else:
            out, st = apply_convbr_cf(spec, params[name], stats[name], x, train)
        new_stats[name] = st
        return out

    spec0 = specs["stem_3d0"]
    std_stem = (not isinstance(spec0, CellSpec) and spec0.kernel == 3
                and spec0.stride == 1 and spec0.bn and spec0.relu)
    use_shear_branch = False
    if fused_stem_inputs is not None and std_stem:
        from rag_tpu.ops.pallas_shear import use_shear

        x_probe = jnp.transpose(fused_stem_inputs[0], (0, 3, 1, 2))
        use_shear_branch = use_shear(x_probe, spec0.cout)
    if use_shear_branch:
        # Pallas shear-collapse (RAG_TPU_CVSTEM_SHEAR=1): the stem conv
        # runs as 18 tiny (3,1) feature convs + in-VMEM masked lane rolls
        # — ~30x fewer FLOPs than convolving the volume, which never
        # exists in any form (rag_tpu.ops.pallas_shear)
        from rag_tpu.ops.pallas_shear import shear_stem_z

        x, y, nd = fused_stem_inputs
        x_cf = jnp.transpose(x, (0, 3, 1, 2))
        y_cf = jnp.transpose(y, (0, 3, 1, 2))
        z = shear_stem_z(x_cf, y_cf, params["stem_3d0"]["w"], nd)
        stem0, st = batch_norm_cf(z, params["stem_3d0"], stats["stem_3d0"],
                                  "stem_3d0" in train_sites)
        stem0 = jax.nn.relu(stem0)
        new_stats["stem_3d0"] = st
    elif fused_stem_inputs is not None and _fused_stem_ok(spec0):
        from rag_tpu.ops.fused_stem import cost_stem_z

        x, y, nd = fused_stem_inputs
        x_cf = jnp.transpose(x, (0, 3, 1, 2))
        y_cf = jnp.transpose(y, (0, 3, 1, 2))
        z = cost_stem_z(x_cf, y_cf, params["stem_3d0"]["w"], nd)
        stem0, st = batch_norm_cf(z, params["stem_3d0"], stats["stem_3d0"],
                                  "stem_3d0" in train_sites)
        stem0 = jax.nn.relu(stem0)
        new_stats["stem_3d0"] = st
    elif (fused_stem_inputs is not None and std_stem
          and _cvstem_wiring_ok(fused_stem_inputs[0], spec0)):
        # Pallas fused cost-volume+stem (SURVEY hard-part #1): the volume
        # is built tile-by-tile in VMEM from the two feature maps (X
        # stays, Y dynamic-lane-rolls by d) and never touches HBM; the
        # backward kernels keep its adjoint off HBM too
        from rag_tpu.ops.convbr import BN_EPS
        from rag_tpu.ops.pallas_cvstem import cvstem_brc, cvstem_conv

        x, y, nd = fused_stem_inputs
        x_cf = jnp.transpose(x, (0, 3, 1, 2))
        y_cf = jnp.transpose(y, (0, 3, 1, 2))
        p0, st0 = params["stem_3d0"], stats["stem_3d0"]
        if "stem_3d0" not in train_sites:
            # frozen stats fold into the kernel's affine (one fused pass)
            inv = jax.lax.rsqrt(st0["var"] + BN_EPS)
            a = p0["scale"] * inv
            b = p0["bias"] - st0["mean"] * a
            stem0 = cvstem_brc(x_cf, y_cf, p0["w"], a, b, nd, relu=True)
            new_stats["stem_3d0"] = st0
        else:
            z = cvstem_conv(x_cf, y_cf, p0["w"], nd)
            stem0, st = batch_norm_cf(z, p0, st0, True)
            stem0 = jax.nn.relu(stem0)
            new_stats["stem_3d0"] = st
    else:
        if cost is None:
            from rag_tpu.ops.cost_volume import cost_volume_cf

            x, y, nd = fused_stem_inputs
            cost = cost_volume_cf(x, y, nd)
        stem0 = appl("stem_3d0", cost)
    stem1 = appl("stem_3d1", stem0)
    s_pp, s_p = stem0, stem1
    for i in range(8):
        out = appl(f"cell_3d{i}", s_p, s_pp)
        s_pp, s_p = s_p, out

    from rag_tpu.ops.pallas_resize import resize_cf

    d, h, w = stem0.shape[1], stem0.shape[3], stem0.shape[4]
    x = appl("last_12_3d", s_p)
    x = resize_cf(x, d // 2, h // 2, w // 2, True)
    x = appl("last_6_3d", x)
    x = resize_cf(x, d, h, w, True)
    mat = appl("last_3_3d", x)          # (B, D, 1, h, w)
    return mat[:, :, 0]


def run_matching(specs, params, stats, cost, train_sites, new_stats):
    """3D matching net: cost (B,D,h,w,2C) -> matching score (B,D,h,w,1).

    Mirrors Network.matching (rag_model.py:325-366). The final cell is
    statically at 1/4 scale, so the head cascade last_12 -> up x2 -> last_6
    -> up to full -> last_3 is unconditional (the reference's shape-switch
    collapses at trace time).
    """
    stem0 = _apply(specs, params, stats, "stem_3d0", cost, train_sites, new_stats)
    stem1 = _apply(specs, params, stats, "stem_3d1", stem0, train_sites, new_stats)
    s_pp, s_p = stem0, stem1
    for i in range(8):
        out = _apply(specs, params, stats, f"cell_3d{i}", s_p, train_sites, new_stats, s_pp)
        s_pp, s_p = s_p, out

    d, h, w = cost.shape[1], cost.shape[2], cost.shape[3]
    x = _apply(specs, params, stats, "last_12_3d", s_p, train_sites, new_stats)
    x = resize_linear(x, (d // 2, h // 2, w // 2), (1, 2, 3), align_corners=True)
    x = _apply(specs, params, stats, "last_6_3d", x, train_sites, new_stats)
    x = resize_linear(x, (d, h, w), (1, 2, 3), align_corners=True)
    return _apply(specs, params, stats, "last_3_3d", x, train_sites, new_stats)


def stereo_forward(
    specs: Mapping[str, Spec],
    params,
    stats,
    left,
    right,
    train_sites=frozenset(),
    cost_constraint=None,
    fused_head=None,
    cf_matching=None,
    maxdisp: int = MAXDISP,
):
    """Full pipeline. left/right: (B,H,W,3) NHWC. Returns (disp, new_stats)
    with disp (B,H,W) in pixels.

    train_sites: the set of site names whose BatchNorms run in train mode
    (batch stats + running update); everything else normalizes with frozen
    running stats — the reference's reused-unit BN freeze
    (src/approaches/rag.py:159-201).

    cost_constraint: optional fn applied to the (B,D,H,W,2C) cost volume —
    the hook for mesh sharding constraints (spatial/disparity parallelism of
    the memory-dominant volume; see rag_tpu.parallel).

    fused_head: use the Pallas fused disparity head (eval/serving paths
    pass True). The fused op's backward currently recomputes the upsample
    chain, which is slower end-to-end than XLA's stored-residual autodiff,
    so differentiated paths keep the plain formulation until the fused
    backward kernel lands.
    """
    from rag_tpu.ops.precision import cast_in

    new_stats: Dict[str, Any] = {}
    # The left/right feature extractions run as ONE stacked batch: convs,
    # frozen-BN, resizes are batch-elementwise, and train-mode BN uses
    # per-half statistics + the two sequential EMA updates (batch_norm
    # halves=2) — exactly the reference's sequential two-pass semantics
    # (rag_model.py:372-373) at half the per-op dispatch and double the
    # lane utilization of these tiny-channel 2D convs.
    both = jnp.concatenate([left, right], axis=0)
    f = extract_feature(specs, params, stats, both, train_sites, new_stats,
                        halves=2)
    bsz = left.shape[0]
    x, y = f[:bsz], f[bsz:]
    # mixed-precision boundary (rag_tpu.ops.precision): the matching half's
    # volume-sized activations ride bf16-at-rest when enabled; the feature
    # net (small tensors) and the disparity head (softmin) stay f32.
    x, y = cast_in(x), cast_in(y)
    if cf_matching is None:
        # cf pays off whenever the Pallas conv3d kernel can run (it lane-
        # pads W internally; H must tile by 8)
        cf_matching = (_default_cf() and x.shape[1] % 8 == 0
                       and cost_constraint is None)
    if fused_head is None:
        fused_head = False  # safe default: callers that never differentiate
        # (eval/serving steps) pass fused_head=True explicitly
    if cf_matching:
        # the matching half consumes the features directly: the volume is
        # built in the cf layout (or skipped entirely by the fused
        # shear-collapsed stem when RAG_TPU_FUSED_STEM=1)
        mat_sq = run_matching_cf(specs, params, {**stats, **new_stats},
                                 None, train_sites, new_stats,
                                 fused_stem_inputs=(x, y, maxdisp // 3))
        mat = mat_sq[..., None]
    else:
        cost = cost_volume(x, y, maxdisp // 3)
        if cost_constraint is not None:
            cost = cost_constraint(cost)
        mat = run_matching(specs, params, {**stats, **new_stats}, cost,
                           train_sites, new_stats)
    mat = mat.astype(jnp.float32)  # head always runs f32
    if fused_head:
        disp = soft_argmin_disparity_fused(mat, maxdisp, 3)
    else:
        disp = soft_argmin_disparity(mat, maxdisp, 3)
    # carry through stats for sites absent from this path (none today, but
    # keeps the contract total).
    for name in stats:
        new_stats.setdefault(name, stats[name])
    return disp, new_stats
