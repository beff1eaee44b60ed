"""Synthetic random-dot stereograms with exact ground-truth disparity.

The reference ships only filename lists pointing at the authors' machines —
no pixels. For tests, benchmarks, and integration runs we synthesize stereo
pairs whose right view is the left view warped by a known piecewise-constant
disparity field. A network trained on these must drive EPE down, which is
the integration-test oracle (SURVEY.md §7.6).
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np


# Per-scene appearance styles — the synthetic analogue of the reference's
# 4 weather domains (cloudy/foggy/rainy/sunny differ in APPEARANCE, not
# scene geometry; src/run.py:155-158). fog blends toward a gray veil,
# noise is per-view sensor speckle (breaks exact photometric match like
# rain does), brightness/contrast are shared affine shifts.
WEATHER_STYLES = (
    {},                                                  # cloudy (clean)
    {"fog": 0.45, "contrast": 0.75},                     # foggy
    {"noise": 0.25, "contrast": 0.9, "brightness": -0.1},  # rainy
    {"brightness": 0.35, "contrast": 1.3},               # sunny
)


def _apply_style(rng, left, right, style):
    c = float(style.get("contrast", 1.0))
    b = float(style.get("brightness", 0.0))
    fog = float(style.get("fog", 0.0))
    noise = float(style.get("noise", 0.0))
    out = []
    for img in (left, right):
        img = img * c + b
        if fog:
            img = img * (1.0 - fog) + fog * 0.5
        if noise:
            img = img + noise * rng.standard_normal(img.shape).astype(
                np.float32)
        out.append(img.astype(np.float32))
    return out


def synthetic_stereo_batch(rng: np.random.Generator, batch: int, h: int, w: int,
                           max_disp: float = 48.0,
                           style: Dict = None) -> Dict[str, np.ndarray]:
    """Returns NHWC left/right and (B,H,W) disparity, float32.

    Left = random smooth-ish dot texture; disparity = blocky field in
    [4, max_disp]; right[x] = left[x - (-d)]... i.e. right view shifts
    content LEFT by d so that left[j] == right[j - d].

    style: optional appearance transform (see WEATHER_STYLES) applied to
    both views AFTER warping — domain shift without geometry change.
    """
    # random texture with some low-frequency structure (vectorized "same"
    # box filter via cumsum — apply_along_axis/convolve was minutes-slow at
    # the 480x960 eval geometry)
    tex = rng.standard_normal((batch, h, w, 3)).astype(np.float32)
    k = 7
    for ax in (1, 2):
        lo, hi = k // 2, k - k // 2
        pad = [(0, 0)] * 4
        pad[ax] = (lo + 1, hi)
        n = tex.shape[ax]
        c = np.cumsum(np.pad(tex, pad), axis=ax, dtype=np.float32)
        top = c.take(range(k, k + n), axis=ax)
        bot = c.take(range(0, n), axis=ax)
        tex = (top - bot) / k
    tex /= tex.std() + 1e-6

    # blocky disparity field (piecewise constant tiles)
    th, tw = max(h // 4, 1), max(w // 4, 1)
    tiles = rng.uniform(4.0, max_disp, (batch, (h + th - 1) // th, (w + tw - 1) // tw))
    disp = np.repeat(np.repeat(tiles, th, 1), tw, 2)[:, :h, :w].astype(np.float32)

    # right[j] = left[j + d] sampled with linear interp (so left[j] = right[j-d])
    j = np.arange(w, dtype=np.float32)[None, None, :]
    src = j + disp  # (B,H,W)
    j0 = np.clip(np.floor(src).astype(np.int64), 0, w - 1)
    j1 = np.clip(j0 + 1, 0, w - 1)
    frac = (src - np.floor(src)).astype(np.float32)[..., None]
    bi = np.arange(batch)[:, None, None]
    hi = np.arange(h)[None, :, None]
    right = tex[bi, hi, j0] * (1 - frac) + tex[bi, hi, j1] * frac
    valid = (src <= w - 1)
    disp = np.where(valid, disp, 0.0).astype(np.float32)  # gt=0 -> masked out
    right = right.astype(np.float32)
    if style:
        tex, right = _apply_style(rng, tex, right, style)
    return {"left": tex, "right": right, "disparity": disp}


class SyntheticStereoDataset:
    """Fixed, seeded set of ``num_samples`` synthetic pairs with the
    StereoDataset.batches interface.

    The samples are generated ONCE (lazily, from ``seed``) and epochs
    re-visit them in shuffled order — the reference protocol trains
    repeatedly on a FIXED per-scene image set (400 pairs,
    src/filenames/drivingstereo), not on a fresh stream per epoch."""

    def __init__(self, num_samples: int, h: int, w: int, seed: int = 0,
                 max_disp: float = 48.0, style: Dict = None):
        self.num_samples = num_samples
        self.h, self.w = h, w
        self.seed = seed
        self.max_disp = max_disp
        self.style = style
        self._cache = None

    def __len__(self):
        return self.num_samples

    def _samples(self) -> Dict[str, np.ndarray]:
        if self._cache is None:
            rng = np.random.default_rng(self.seed)
            # generate in chunks to bound the working set of the warp
            chunks = []
            left, n = 0, self.num_samples
            while left < n:
                m = min(16, n - left)
                chunks.append(synthetic_stereo_batch(
                    rng, m, self.h, self.w, self.max_disp, style=self.style))
                left += m
            self._cache = {k: np.concatenate([c[k] for c in chunks])
                           for k in chunks[0]}
        return self._cache

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0,
                indices=None, drop_last: bool = True) -> Iterator[Dict]:
        data = _maybe_device_cache(self)
        idx = np.asarray(indices if indices is not None
                         else np.arange(self.num_samples))
        if shuffle:
            idx = np.random.default_rng(self.seed + seed).permutation(idx)
        n = len(idx)
        stop = n - (n % batch_size) if drop_last else n
        for i in range(0, stop, batch_size):
            sel = idx[i:i + batch_size]
            yield {k: v[sel] for k, v in data.items()}


def _use_device_cache() -> bool:
    """Device-resident sample caching for the fixed synthetic sets.

    Through the axon relay, every fresh host->device batch transfer is
    RETAINED until process exit (measured ~8 MB/step — a 400-epoch run
    leaked ~60 GB of host RSS and crawled to a halt; probes in round 4's
    BASELINE.md row). The samples are a fixed set revisited every epoch,
    so they live on the device once and batches are on-device gathers —
    compute results, which do not leak. CPU backends (tests) keep the
    plain numpy path; RAG_TPU_DEVICE_DATA=0 disables.
    """
    import os

    if os.environ.get("RAG_TPU_DEVICE_DATA", "1") != "1":
        return False
    try:
        import jax

        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover
        return False


# process-wide budget for device-resident sample sets: a multi-task run
# caches train+valid+test for every task concurrently (~2 GB per 256-pair
# canonical stereo scene) — by task 3 that collides with model/search
# activations in HBM (RESOURCE_EXHAUSTED measured mid-canonical-run,
# round 5). The cache is LRU: when a new dataset would exceed the
# budget, the least-recently-USED datasets (completed tasks' sets that
# only the router/report stages revisit) are evicted — re-uploaded on
# next touch — instead of refusing to cache or OOMing the chip.
_dev_cache_bytes = 0
_dev_cache_lru: "list" = []  # datasets with a live cache, LRU-first


def _device_data_budget() -> int:
    import os

    return int(float(os.environ.get("RAG_TPU_DEVICE_DATA_BUDGET_MB",
                                    "6144")) * 2**20)


def _evict(ds) -> None:
    global _dev_cache_bytes
    _dev_cache_bytes -= ds._dev_cache_bytes
    ds._dev_cache = None
    ds._dev_cache_bytes = 0


def _maybe_device_cache(ds):
    """ds must expose _samples() and may grow a _dev_cache attribute."""
    global _dev_cache_bytes
    if not _use_device_cache():
        return ds._samples()
    if getattr(ds, "_dev_cache", None) is None:
        samples = ds._samples()
        nbytes = sum(np.asarray(v).nbytes for v in samples.values())
        budget = _device_data_budget()
        while (_dev_cache_bytes + nbytes > budget
               and _dev_cache_lru and _dev_cache_lru[0] is not ds):
            victim = _dev_cache_lru.pop(0)
            print(f"[data] device cache budget: evicting a "
                  f"{victim._dev_cache_bytes / 2**20:.0f} MB sample set "
                  f"(LRU) to fit {nbytes / 2**20:.0f} MB")
            _evict(victim)
        if nbytes > budget:
            # one dataset alone over budget: host numpy batches
            print(f"[data] dataset ({nbytes / 2**20:.0f} MB) exceeds the "
                  f"device cache budget ({budget / 2**20:.0f} MB); host "
                  f"numpy batches (raise RAG_TPU_DEVICE_DATA_BUDGET_MB)")
            return samples
        import jax.numpy as jnp

        ds._dev_cache = {k: jnp.asarray(v) for k, v in samples.items()}
        ds._dev_cache_bytes = nbytes
        _dev_cache_bytes += nbytes
        _dev_cache_lru.append(ds)
    else:
        # refresh recency
        try:
            _dev_cache_lru.remove(ds)
        except ValueError:
            pass
        _dev_cache_lru.append(ds)
    return ds._dev_cache
