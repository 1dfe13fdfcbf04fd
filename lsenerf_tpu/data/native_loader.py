"""ctypes wrapper for the native C++ batch-assembly backend (native/fastloader.cpp).

Replaces the reference's CacheDataloader worker processes + torch pixel
samplers (lse_datamanager.py:258-283) with an in-process C++ double-buffered
prefetcher: batch k+1 is assembled by native threads while the accelerator
runs step k. Falls back cleanly to the numpy path when the shared library
hasn't been built (`native/build.sh`).
"""

from __future__ import annotations

import ctypes
import os.path as osp
import subprocess

import numpy as np

_LIB = None
_LIB_PATH = osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))),
                     "native", "libfastloader.so")


def build_library(force: bool = False) -> bool:
    src = osp.join(osp.dirname(_LIB_PATH), "fastloader.cpp")
    if (
        osp.exists(_LIB_PATH)
        and not force
        and osp.getmtime(_LIB_PATH) >= osp.getmtime(src)
    ):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             src, "-o", _LIB_PATH],
            check=True, capture_output=True,
        )
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def get_library():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not build_library():  # no-op when the .so is newer than the source
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    i64 = ctypes.c_int64
    u64 = ctypes.c_uint64
    lib.lse_sample_rgb.argtypes = [
        u8p, i64, i64, i64, i64, u64, i64, i32p, f32p, ctypes.c_int,
    ]
    lib.lse_sample_events.argtypes = [
        f32p, i64, i64, i64, i64, u64, i64, i64, ctypes.c_float, i32p, f32p,
        ctypes.c_int,
    ]
    lib.lse_prefetcher_create.restype = ctypes.c_void_p
    lib.lse_prefetcher_create.argtypes = [
        u8p, i64, i64, i64, i64, i64,
        f32p, i64, i64, i64, i64, i64,
        i64, ctypes.c_float, u64,
    ]
    lib.lse_prefetcher_create_i16.restype = ctypes.c_void_p
    lib.lse_prefetcher_create_i16.argtypes = [
        u8p, i64, i64, i64, i64, i64,
        ctypes.c_void_p, ctypes.c_void_p, i64, i64, i64, i64, i64,
        i64, ctypes.c_float, u64,
    ]
    lib.lse_prefetcher_next.argtypes = [
        ctypes.c_void_p, u64, i32p, f32p, i32p, f32p,
    ]
    lib.lse_prefetcher_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def native_available() -> bool:
    return get_library() is not None


def sample_rgb(images_u8: np.ndarray, seed: int, n_rays: int, n_threads: int = 2):
    """(n,h,w,3) uint8 -> (idx (n_rays,3) int32, rgb (n_rays,3) f32/255)."""
    lib = get_library()
    n, h, w, c = images_u8.shape
    out_idx = np.empty((n_rays, 3), np.int32)
    out_val = np.empty((n_rays, c), np.float32)
    lib.lse_sample_rgb(images_u8, n, h, w, c, seed, n_rays, out_idx, out_val,
                       n_threads)
    return out_idx, out_val


def sample_events(frames_f32: np.ndarray, seed: int, n_rays: int,
                  img_limit: int, e_thresh: float, n_threads: int = 2):
    lib = get_library()
    n, h, w, c = frames_f32.shape
    out_idx = np.empty((n_rays, 3), np.int32)
    out_val = np.empty((n_rays, c), np.float32)
    lib.lse_sample_events(frames_f32, n, h, w, c, seed, n_rays, img_limit,
                          e_thresh, out_idx, out_val, n_threads)
    return out_idx, out_val


class NativePrefetcher:
    """Double-buffered native batch producer."""

    def __init__(self, col_u8: np.ndarray | None, n_col: int,
                 evs: np.ndarray | None, n_evs: int,
                 evs_img_limit: int, e_thresh: float, seed: int = 0,
                 evs_sel: np.ndarray | None = None):
        """evs: eager (n,h,w,c) float32 frames, OR — with evs_sel — an int16
        (N,h,w) backing buffer (typically a np.memmap over the on-disk .npy)
        whose logical frame i lives at physical row evs_sel[i]. The memmap
        form never materializes the stack: the C++ thread reads only the
        sampled pixels' pages."""
        lib = get_library()
        assert lib is not None, "native library unavailable"
        self._lib = lib
        self.n_col, self.n_evs = n_col, n_evs
        self._col = col_u8 if col_u8 is not None else np.zeros((1, 1, 1, 3), np.uint8)
        cn, ch, cw, cc = self._col.shape
        self.cc = cc
        self._step = 0
        if evs_sel is not None and evs is not None:
            assert evs.dtype == np.int16 and evs.ndim == 3
            assert evs.flags["C_CONTIGUOUS"]
            self._evs = evs  # keep the memmap alive
            self._sel = np.ascontiguousarray(evs_sel, np.int64)
            en = len(self._sel)
            eh, ew, ec = evs.shape[1], evs.shape[2], 1
            self.ec = ec
            self._handle = lib.lse_prefetcher_create_i16(
                self._col, cn, ch, cw, cc, n_col,
                evs.ctypes.data_as(ctypes.c_void_p),
                self._sel.ctypes.data_as(ctypes.c_void_p),
                en, eh, ew, ec, n_evs,
                evs_img_limit, e_thresh, seed,
            )
            return
        self._evs = (
            evs if evs is not None else np.zeros((1, 1, 1, 1), np.float32)
        )
        en, eh, ew, ec = self._evs.shape
        self.ec = ec
        self._handle = lib.lse_prefetcher_create(
            self._col, cn, ch, cw, cc, n_col,
            self._evs, en, eh, ew, ec, n_evs,
            evs_img_limit, e_thresh, seed,
        )

    def next(self):
        col_idx = np.empty((max(self.n_col, 1), 3), np.int32)
        col_val = np.empty((max(self.n_col, 1), self.cc), np.float32)
        evs_idx = np.empty((max(self.n_evs, 1), 3), np.int32)
        evs_val = np.empty((max(self.n_evs, 1), self.ec), np.float32)
        self._lib.lse_prefetcher_next(
            self._handle, self._step, col_idx, col_val, evs_idx, evs_val
        )
        self._step += 1
        out = {}
        if self.n_col > 0:
            out["col_indices"] = col_idx
            out["col_rgb"] = col_val
        if self.n_evs > 0:
            out["evs_indices"] = evs_idx
            out["evs_values"] = evs_val
        return out

    def close(self):
        if self._handle:
            self._lib.lse_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
