"""Monocular continual depth variant (rag_depth).

Reference: rag_depth/src/models/rag_model.py — the stereo pipeline with the
right image and cost volume removed (forward :391-415: ``cost = x``), the
matching net rewired to 2D convs at the same channel plan (:254-291), and a
DispHead (3x3 conv -> sigmoid -> 3x bilinear upsample -> x max_depth=80,
:51-65, 297-298). Loss is silog (rag_tpu.train.losses.silog_loss); metrics
are the depth suite (rag_tpu.metrics.depth).

The searchable-site grid is IDENTICAL to the stereo variant (18 sites + 3
per-task heads), so the growth/search machinery is shared; only the spec
builders and the forward differ. The depth head is a single unit shared by
every task (the reference never expands it).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp

from rag_tpu.models.stereo import (
    HEAD_NAMES,
    SITE_NAMES,
    _CELL2D_PLAN,
    _CELL3D_PLAN,
    INITIAL_FM,
    HALF_FM,
    _apply,
    extract_feature,
)
from rag_tpu.ops.cell import CellSpec
from rag_tpu.ops.convbr import ConvBRSpec, init_convbr
from rag_tpu.ops.resize import resize_linear

MAX_DEPTH = 80.0


def build_depth_site_specs(genotype) -> Dict[str, Any]:
    """Per-site specs; the 'matching' half is 2D (same channel plan)."""
    specs: Dict[str, Any] = {
        "stem_2d0": ConvBRSpec(2, 3, HALF_FM, 3, 1),
        "stem_2d1": ConvBRSpec(2, HALF_FM, INITIAL_FM, 3, 3),
        "stem_2d2": ConvBRSpec(2, INITIAL_FM, INITIAL_FM, 3, 1),
        "last_3_2d": ConvBRSpec(2, INITIAL_FM, INITIAL_FM, 1, 1, bn=False, relu=False),
        # rag_depth stems: 12 -> 12 2D convs (rag_model.py:254-255)
        "stem_3d0": ConvBRSpec(2, INITIAL_FM, INITIAL_FM, 3, 1),
        "stem_3d1": ConvBRSpec(2, INITIAL_FM, INITIAL_FM, 3, 1),
    }
    for i, (cpp, cp, cout, downup) in enumerate(_CELL2D_PLAN):
        specs[f"cell_2d{i}"] = CellSpec(2, cpp, cp, cout, downup, genotype.normal)
    for i, (cpp, cp, cout, downup) in enumerate(_CELL3D_PLAN):
        # same macro/channels, 2D cells driven by the 'reduce' gene
        specs[f"cell_3d{i}"] = CellSpec(2, cpp, cp, cout, downup, genotype.reduce)
    return specs


def build_depth_head_specs() -> Dict[str, ConvBRSpec]:
    return {
        "last_3_3d": ConvBRSpec(2, INITIAL_FM, 1, 3, 1, bn=False, relu=False),
        "last_6_3d": ConvBRSpec(2, INITIAL_FM * 2, INITIAL_FM, 1, 1),
        "last_12_3d": ConvBRSpec(2, INITIAL_FM * 4, INITIAL_FM * 2, 1, 1),
    }


DEPTH_HEAD_SPEC = ConvBRSpec(2, 1, 1, 3, 1, bn=False, relu=False)


def init_depth_head(key):
    """DispHead conv (with bias folded: ConvBR bn=False has no bias in our
    blocks, so add an explicit bias leaf)."""
    params, stats = init_convbr(key, DEPTH_HEAD_SPEC)
    params["bias1"] = jnp.zeros((1,), jnp.float32)
    return params, stats


def depth_forward(specs: Mapping, params, stats, image, train_sites=frozenset()):
    """image (B,H,W,3) -> depth (B,H,W) in [0, MAX_DEPTH]."""
    new_stats: Dict[str, Any] = {}
    fea = extract_feature(specs, params, stats, image, train_sites, new_stats)
    mid = {**stats, **new_stats}

    stem0 = _apply(specs, params, mid, "stem_3d0", fea, train_sites, new_stats)
    stem1 = _apply(specs, params, mid, "stem_3d1", stem0, train_sites, new_stats)
    s_pp, s_p = stem0, stem1
    for i in range(8):
        s = {**stats, **new_stats}
        out = _apply(specs, params, s, f"cell_3d{i}", s_p, train_sites, new_stats, s_pp)
        s_pp, s_p = s_p, out

    h, w = fea.shape[1], fea.shape[2]
    s = {**stats, **new_stats}
    x = _apply(specs, params, s, "last_12_3d", s_p, train_sites, new_stats)
    x = resize_linear(x, (h // 2, w // 2), (1, 2), align_corners=True)
    x = _apply(specs, params, s, "last_6_3d", x, train_sites, new_stats)
    x = resize_linear(x, (h, w), (1, 2), align_corners=True)
    mat = _apply(specs, params, s, "last_3_3d", x, train_sites, new_stats)  # (B,h,w,1)

    # DispHead: conv3x3 -> sigmoid -> 3x bilinear (align_corners=False) -> x80
    # Head always runs f32 (same policy as the stereo disparity head): under
    # the bf16-at-rest policy `mat` arrives bf16 while hp['w'] stays f32 —
    # lax.conv requires matching dtypes, and sigmoid+scale amplify noise.
    hp = params["depth_head"]
    mat = mat.astype(jnp.float32)
    y = jax.lax.conv_general_dilated(
        mat, hp["w"], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + hp["bias1"]
    y = jax.nn.sigmoid(y)
    y = resize_linear(y, (h * 3, w * 3), (1, 2), align_corners=False)
    depth = y[..., 0] * MAX_DEPTH

    new_stats.setdefault("depth_head", stats.get("depth_head", {}))
    for name in stats:
        new_stats.setdefault(name, stats[name])
    return depth, new_stats
