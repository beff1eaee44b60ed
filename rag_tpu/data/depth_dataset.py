"""Filename-list monocular-depth dataset (the rag_depth variant's data
plane).

Reference: rag_depth/src/dataloaders/stereo_dataset.py — the depth variant
reuses the stereo list layout ("left right depth", 3 columns pointing at
depth-map-half-size PNGs /256) but the model consumes only the left image
and the depth map. Training = 768x384 random crop (:59); eval = top/right
zero-pad to 480x960, batch 1 (:95-106 mirror). 2-column "image depth"
lists are accepted too.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from rag_tpu.data.readers import (
    normalize_imagenet,
    read_image,
    read_pfm,
    read_png_disparity,
)
from rag_tpu.data.stereo_dataset import EVAL_PAD, load_file_list

DEPTH_TRAIN_CROP = (768, 384)  # (w, h), rag_depth stereo_dataset.py:59


class DepthDataset:
    """One scene split of (image, depth) pairs. training=True -> random
    crops; else padded full frames (batch 1, reference protocol)."""

    def __init__(self, list_file: str, training: bool,
                 crop=DEPTH_TRAIN_CROP, pad=EVAL_PAD, root: str = ""):
        self.entries = load_file_list(list_file)
        assert all(len(e) >= 2 for e in self.entries), \
            f"depth lists need 'image [right] depth' columns: {list_file}"
        self.training = training
        self.crop = crop
        self.pad = pad
        self.root = root

    def __len__(self):
        return len(self.entries)

    def _load_depth(self, path: str) -> np.ndarray:
        if path.endswith(".pfm"):
            return read_pfm(path)[0]
        return read_png_disparity(path)  # PNG/256 — same encoding as depth

    def get(self, index: int, rng: Optional[np.random.Generator] = None) -> Dict:
        entry = self.entries[index]
        jp = lambda p: os.path.join(self.root, p) if self.root else p
        image = normalize_imagenet(read_image(jp(entry[0])))
        depth = self._load_depth(jp(entry[-1]))
        h, w = depth.shape

        if self.training:
            cw, ch = self.crop
            rng = rng or np.random.default_rng()
            x1 = int(rng.integers(0, max(w - cw, 0) + 1))
            y1 = int(rng.integers(0, max(h - ch, 0) + 1))
            return {
                "image": image[y1:y1 + ch, x1:x1 + cw],
                "depth": depth[y1:y1 + ch, x1:x1 + cw],
            }

        pw, ph = self.pad
        top, rightp = ph - h, pw - w
        assert top >= 0 and rightp >= 0, (h, w, self.pad)
        padhw = ((top, 0), (0, rightp))
        return {
            "image": np.pad(image, padhw + ((0, 0),)),
            "depth": np.pad(depth, padhw),
            "top_pad": top,
            "right_pad": rightp,
        }

    def batches(self, batch_size: int, shuffle: bool, seed: int = 0,
                indices: Optional[Sequence[int]] = None,
                drop_last: bool = True) -> Iterator[Dict[str, np.ndarray]]:
        idx = np.asarray(indices if indices is not None else range(len(self)))
        rng = np.random.default_rng(seed)
        if shuffle:
            idx = rng.permutation(idx)
        stop = len(idx) - (len(idx) % batch_size if drop_last else 0)
        for start in range(0, stop, batch_size):
            chunk = [self.get(int(i), rng) for i in idx[start:start + batch_size]]
            if not chunk:
                return
            yield {
                k: np.stack([c[k] for c in chunk]).astype(np.float32)
                for k in ("image", "depth")
            }
