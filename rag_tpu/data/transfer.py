"""Color-statistics transfer for proxy search data.

Reference: src_self/dataloaders/sceneflow_driving_dataset.py:53-71 —
synthetic (SceneFlow-Driving) pairs are color-matched to real left images of
the current scene before being used as op-search proxy data: per-channel
mean/std of the synthetic image are mapped onto the real image's statistics.

The reference transfers colors on RAW [0,1] images BEFORE ImageNet
normalization (:86-93 — transfer happens on the PIL arrays; get_transform
normalizes afterwards). Our datasets yield already-normalized tensors, so
``ColorTransferDataset`` de-normalizes, transfers + clips in [0,1], and
re-normalizes — clipping normalized data would destroy the signal.
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np

from rag_tpu.data.readers import denormalize_imagenet, normalize_imagenet


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
    pool of real scene images (the current task's left frames).

    normalized=True (the default — our datasets yield ImageNet-normalized
    tensors): both proxy batch and real pool are mapped back to [0,1] for
    the transfer and the result re-normalized, matching the reference's
    raw-image-space transfer. Real frames are cycled deterministically
    (``index % len(real)``, sceneflow_driving_dataset.py:88).
    """

    def __init__(self, proxy_dataset, real_images: np.ndarray,
                 normalized: bool = True):
        """real_images: (N,H,W,3); normalized says whether proxy batches AND
        the pool carry ImageNet-normalized values (else raw [0,1])."""
        self.proxy = proxy_dataset
        self.normalized = normalized
        self.real = (denormalize_imagenet(real_images) if normalized
                     else real_images)

    def __len__(self):
        return len(self.proxy)

    def batches(self, batch_size: int, shuffle: bool, seed: int = 0,
                indices=None, drop_last: bool = True) -> Iterator[Dict]:
        cursor = 0
        for b in self.proxy.batches(batch_size, shuffle, seed, indices,
                                    drop_last):
            n = b["left"].shape[0]
            pick = (cursor + np.arange(n)) % len(self.real)
            cursor += n
            ref = self.real[pick]
            out = dict(b)
            for k in ("left", "right"):
                img = denormalize_imagenet(b[k]) if self.normalized else b[k]
                moved = np.stack([
                    transfer_color(img[i], ref[i]) for i in range(n)
                ])
                out[k] = (normalize_imagenet(moved) if self.normalized
                          else moved).astype(np.float32)
            yield out
