"""Color-statistics transfer for proxy search data.

Reference: src_self/dataloaders/sceneflow_driving_dataset.py:53-71 —
synthetic (SceneFlow-Driving) pairs are color-matched to real left images of
the current scene before being used as op-search proxy data: per-channel
mean/std of the synthetic image are mapped onto the real image's statistics.
Vectorized numpy version operating on [0,1] float HWC images.
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np


def transfer_color(target: np.ndarray, source: np.ndarray) -> np.ndarray:
    """Match per-channel mean/std of ``target`` to ``source``.

    Both [0,1] float HWC (or NHWC — statistics per image over H,W).
    Follows the reference ordering exactly: subtract target mean, divide by
    target_std/source_std, add source mean, clip to [0,1].
    """
    axes = tuple(range(target.ndim - 1))[-2:]  # (H, W) axes
    t_mean = target.mean(axis=axes, keepdims=True)
    t_std = target.std(axis=axes, keepdims=True) + 1e-8
    s_mean = source.mean(axis=axes, keepdims=True)
    s_std = source.std(axis=axes, keepdims=True)
    out = (target - t_mean) / (t_std / np.maximum(s_std, 1e-8)) + s_mean
    return np.clip(out, 0.0, 1.0)


class ColorTransferDataset:
    """Wraps a synthetic/proxy dataset so every batch is color-matched to a
    pool of real scene images (the current task's left frames)."""

    def __init__(self, proxy_dataset, real_images: np.ndarray):
        """real_images: (N,H,W,3) in [0,1]."""
        self.proxy = proxy_dataset
        self.real = real_images

    def __len__(self):
        return len(self.proxy)

    def batches(self, batch_size: int, shuffle: bool, seed: int = 0,
                indices=None, drop_last: bool = True) -> Iterator[Dict]:
        rng = np.random.default_rng(seed)
        for b in self.proxy.batches(batch_size, shuffle, seed, indices,
                                    drop_last):
            n = b["left"].shape[0]
            pick = rng.integers(0, len(self.real), size=n)
            ref = self.real[pick]
            out = dict(b)
            out["left"] = np.stack([
                transfer_color(b["left"][i], ref[i]) for i in range(n)
            ]).astype(np.float32)
            out["right"] = np.stack([
                transfer_color(b["right"][i], ref[i]) for i in range(n)
            ]).astype(np.float32)
            yield out
