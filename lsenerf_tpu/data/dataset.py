"""In-memory datasets for RGB frames and event frames.

Capability parity with reference lse_dataset.py: ColorDataset (images +
appearance ids + optional mask, optional grayscale) and EventFrameDataset
(event frames scaled by e_thresh at access :86-88, last-8 drop for >1000
frames :66-67). Data lives in host numpy; the datamanager turns it into
fixed-shape device batches.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from lsenerf_tpu.cameras.cameras import Cameras


@dataclass
class ColorDataset:
    images: np.ndarray  # (n, h, w, 3) float32 in [0, 1]
    cameras: Cameras
    appearance_ids: np.ndarray  # (n,) int32
    msk: Optional[np.ndarray] = None  # (n, h, w) or (h, w) float
    use_gray: bool = False

    def __post_init__(self):
        if self.use_gray and self.images.shape[-1] == 3:
            g = self.images @ np.array([0.2989, 0.5870, 0.1140], np.float32)
            self.images = np.repeat(g[..., None], 3, axis=-1)

    def __len__(self):
        return len(self.images)


class LazyFrameArray:
    """Frame-subset view over an on-disk .npy (np.memmap) that never
    materializes the full stack.

    The reference CacheDataloader keeps only sampled image subsets in RAM
    (lse_datamanager.py:258-283); the TPU data path goes further: event
    frames stay on disk and every batch gather `eimgs[(c, y, x)]` translates
    the frame index through `sel` then reads just the touched pages of the
    memmap. A trailing channel axis is added at access time so callers see
    the same (n, h, w, 1) contract as an eager array.
    """

    def __init__(self, src: np.ndarray, sel: np.ndarray):
        self.src = src
        self.sel = np.asarray(sel, np.int64)
        self.shape = (len(self.sel), *src.shape[1:3], 1)
        self.dtype = src.dtype

    def __len__(self) -> int:
        return self.shape[0]

    def __getitem__(self, idx):
        if isinstance(idx, tuple):
            c, *rest = idx
            return self.src[(self.sel[c], *rest)][..., None]
        if isinstance(idx, slice):
            return LazyFrameArray(self.src, self.sel[idx])
        return self.src[self.sel[idx]][..., None]

    def __array__(self, dtype=None):
        out = np.asarray(self.src[self.sel])[..., None]
        return out if dtype is None else out.astype(dtype)


@dataclass
class EventFrameDataset:
    """Event frames: per-pixel brightness-change counts between two poses."""

    eimgs: np.ndarray  # (n, h, w, 1) raw counts
    cameras: Cameras  # frame-start cameras (consecutive pairing) ...
    e_thresh: float
    appearance_ids: np.ndarray
    prev_cameras: Optional[Cameras] = None  # ... or explicit prev/next pairs
    next_cameras: Optional[Cameras] = None
    msk: Optional[np.ndarray] = None

    def __post_init__(self):
        # drop the trailing frames of very long recordings
        # (reference lse_dataset.py:66-67)
        if len(self.eimgs) > 1000:
            self.eimgs = self.eimgs[:-8]
        if self.e_thresh == 1 and self.msk is not None:
            # EVIMO-style normalized frames: a full-array transform, so this
            # branch materializes a lazy view (np.asarray -> __array__)
            self.eimgs = np.clip(np.asarray(self.eimgs) / 255.0, 0, 1)

    def __len__(self):
        return len(self.eimgs)

    def get_scaled(self, idx: np.ndarray) -> np.ndarray:
        """Event values pre-multiplied by e_thresh -> delta-log-intensity units
        (reference lse_dataset.py:86-88)."""
        return self.eimgs[idx].astype(np.float32) * self.e_thresh
