"""Filename-list stereo dataset with the reference's crop/pad protocol.

Reference: src/dataloaders/stereo_dataset.py — txt lists of
"left right disp [disp_R]" paths; training = 384x192 random crop; eval =
top/right zero-pad to 480x960, batch 1; PNG disparity /256; ImageNet
normalization. Batching is plain numpy; arrays are NHWC float32 ready for
device put (the host pipeline stays numpy so jit never sees the file IO).
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from rag_tpu.data.readers import (
    normalize_imagenet,
    read_all_lines,
    read_image,
    read_pfm,
    read_png_disparity,
)

TRAIN_CROP = (384, 192)  # (w, h)
EVAL_PAD = (960, 480)    # (w, h)


def load_file_list(path: str) -> List[List[str]]:
    return [ln.split() for ln in read_all_lines(path)]


class StereoDataset:
    """One weather-scene split. training=True -> random crops; else padded
    full images (batch size 1 recommended, matching the reference)."""

    def __init__(self, list_file: str, training: bool,
                 crop=TRAIN_CROP, pad=EVAL_PAD, root: str = ""):
        self.entries = load_file_list(list_file)
        self.training = training
        self.crop = crop
        self.pad = pad
        self.root = root

    def __len__(self):
        return len(self.entries)

    def _load_disp(self, path: str) -> np.ndarray:
        if path.endswith(".pfm"):
            return read_pfm(path)[0]
        return read_png_disparity(path)

    def get(self, index: int, rng: Optional[np.random.Generator] = None) -> Dict:
        entry = self.entries[index]
        jp = lambda p: os.path.join(self.root, p) if self.root else p
        left = normalize_imagenet(read_image(jp(entry[0])))
        right = normalize_imagenet(read_image(jp(entry[1])))
        disp = self._load_disp(jp(entry[2]))
        h, w = disp.shape

        if self.training:
            cw, ch = self.crop
            rng = rng or np.random.default_rng()
            x1 = int(rng.integers(0, max(w - cw, 0) + 1))
            y1 = int(rng.integers(0, max(h - ch, 0) + 1))
            return {
                "left": left[y1:y1 + ch, x1:x1 + cw],
                "right": right[y1:y1 + ch, x1:x1 + cw],
                "disparity": disp[y1:y1 + ch, x1:x1 + cw],
            }

        pw, ph = self.pad
        top, rightp = ph - h, pw - w
        assert top >= 0 and rightp >= 0, (h, w, self.pad)
        padhw = ((top, 0), (0, rightp))
        return {
            "left": np.pad(left, padhw + ((0, 0),)),
            "right": np.pad(right, padhw + ((0, 0),)),
            "disparity": np.pad(disp, padhw),
            "top_pad": top,
            "right_pad": rightp,
        }

    def batches(self, batch_size: int, shuffle: bool, seed: int = 0,
                indices: Optional[Sequence[int]] = None,
                drop_last: bool = True) -> Iterator[Dict[str, np.ndarray]]:
        """Yield stacked NHWC batches."""
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
                for k in ("left", "right", "disparity")
            }


def split_half(n: int):
    """The reference's 50/50 search split (mdenas_search.py:60-72): first
    half trains weights, second half scores architectures."""
    split = int(np.floor(0.5 * n))
    return list(range(split)), list(range(split, n))
