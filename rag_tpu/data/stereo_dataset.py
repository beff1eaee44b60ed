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
    resize_bilinear,
)

TRAIN_CROP = (384, 192)  # (w, h)
EVAL_PAD = (960, 480)    # (w, h)
# src_self cross-domain eval pad (fits KITTI + resized Cityscapes),
# src_self/dataloaders/stereo_dataset.py:111-113
SELFSUP_EVAL_PAD = (1248, 576)
# SceneFlow-geometry eval pad of the proxy dataset,
# src_self/dataloaders/sceneflow_driving_dataset.py:133-134
SCENEFLOW_EVAL_PAD = (960, 540)

# Cityscapes rule (src_self/dataloaders/stereo_dataset.py:56-71): frames
# wider than 1800 px are resized to 1024x512 and their disparity halved.
WIDE_THRESHOLD = 1800
WIDE_RESIZE = (1024, 512)  # (w, h)


def load_file_list(path: str) -> List[List[str]]:
    return [ln.split() for ln in read_all_lines(path)]


class StereoDataset:
    """One weather-scene split. training=True -> random crops; else padded
    full images (batch size 1 recommended, matching the reference)."""

    def __init__(self, list_file: str, training: bool,
                 crop=TRAIN_CROP, pad=EVAL_PAD, root: str = "",
                 resize_wide: bool = False):
        """resize_wide enables the src_self Cityscapes rule: frames wider
        than 1800 px resize to 1024x512 with disparity halved."""
        self.entries = load_file_list(list_file)
        self.training = training
        self.crop = crop
        self.pad = pad
        self.root = root
        self.resize_wide = resize_wide
        self._native = None       # lazy NativeStereoLoader (False = declined)
        self.used_native = False  # observability: did batches() go native?

    def __len__(self):
        return len(self.entries)

    def _load_disp(self, path: str) -> np.ndarray:
        if path.endswith(".pfm"):
            return read_pfm(path)[0]
        return read_png_disparity(path)

    def get(self, index: int, rng: Optional[np.random.Generator] = None) -> Dict:
        entry = self.entries[index]
        jp = lambda p: os.path.join(self.root, p) if self.root else p
        left = read_image(jp(entry[0]))
        right = read_image(jp(entry[1]))
        disp = self._load_disp(jp(entry[2]))
        if self.resize_wide and left.shape[1] > WIDE_THRESHOLD:
            rw, rh = WIDE_RESIZE
            left = resize_bilinear(left, rh, rw)
            right = resize_bilinear(right, rh, rw)
            # disparity is resized like an image THEN halved — the pixel
            # shift scale follows the width ratio (src_self rule)
            disp = resize_bilinear(disp, rh, rw) / 2.0
        left = normalize_imagenet(left)
        right = normalize_imagenet(right)
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

    # -- native (C++) fast path -------------------------------------------

    def _native_eligible(self) -> bool:
        """Training batches stream through the threaded C++ decode/crop
        plane (rag_runtime.cpp) when every file is PNG; eval keeps the
        python path (deterministic ordering), as do index-subset reads.
        RAG_TPU_NATIVE_IO=0 disables."""
        if not self.training or self.resize_wide:
            return False
        if os.environ.get("RAG_TPU_NATIVE_IO", "1") == "0":
            return False
        if not self.entries or any(len(e) < 3 for e in self.entries):
            return False
        if not all(e[0].endswith(".png") and e[1].endswith(".png")
                   and (e[2].endswith(".png") or e[2].endswith(".pfm"))
                   for e in self.entries):
            return False
        from rag_tpu.runtime.native import native_available

        return native_available()

    def _native_loader(self, seed: int):
        if self._native is None:
            if self._native_eligible():
                from rag_tpu.runtime.native import NativeStereoLoader

                jp = (lambda p: os.path.join(self.root, p)) if self.root \
                    else (lambda p: p)
                entries = [[jp(e[0]), jp(e[1]), jp(e[2])]
                           for e in self.entries]
                self._native = NativeStereoLoader(
                    entries, True, crop=self.crop, pad=self.pad, seed=seed)
            else:
                self._native = False
        return self._native or None

    def batches(self, batch_size: int, shuffle: bool, seed: int = 0,
                indices: Optional[Sequence[int]] = None,
                drop_last: bool = True) -> Iterator[Dict[str, np.ndarray]]:
        """Yield stacked NHWC batches."""
        if indices is None:
            loader = self._native_loader(seed)
            if loader is not None:
                self.used_native = True
                stop = len(self) - (len(self) % batch_size if drop_last else 0)
                for start in range(0, stop, batch_size):
                    yield loader.next_batch(min(batch_size, stop - start))
                return
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


def split_half(n: int, seed: Optional[int] = None, frac: float = 0.5):
    """The reference's search split (mdenas_search.py:60-72): a RANDOM
    permutation split via SubsetRandomSampler — first ``frac`` trains
    weights, the rest scores architectures. 0.5 on the supervised path;
    the self-supervised op search uses 0.8 (src_self/approaches/rag.py:317).
    seed=None keeps the deterministic prefix split (fine for pre-shuffled
    synthetic data)."""
    split = int(np.floor(frac * n))
    if seed is None:
        return list(range(split)), list(range(split, n))
    perm = np.random.default_rng(seed).permutation(n)
    return perm[:split].tolist(), perm[split:].tolist()
