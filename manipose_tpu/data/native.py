"""ctypes bindings for the native windowing core (native/windowing.cpp).

Builds the shared library on demand with g++; every entry point has a
pure-numpy fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "windowing.cpp"
_LIB_PATH = _REPO_ROOT / "native" / "libwindowing.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             str(_SRC), "-o", str(_LIB_PATH)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and _SRC.exists():
        _build()
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        assert lib.windowing_abi_version() == 1
        lib.gather_windows.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            ctypes.c_int64,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float32, flags="C,WRITEABLE"),
            ctypes.c_int,
        ]
        lib.apply_masks.argtypes = [
            np.ctypeslib.ndpointer(np.float32, flags="C,WRITEABLE"),
            np.ctypeslib.ndpointer(np.float32, flags="C"),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def gather_windows(
    videos: Sequence[np.ndarray],  # each (n_frames, J, C) float32 C-order
    video_idx: np.ndarray,  # (n_windows,) int64
    start_frame: np.ndarray,  # (n_windows,) int64
    seq_len: int,
    n_threads: int = 0,
) -> np.ndarray:
    """-> (n_windows, seq_len, J, C), replicate-padded past video ends."""
    assert all(v.shape[0] > 0 for v in videos), "empty video passed"
    j, c = videos[0].shape[1:]
    # every video must share (J, C): the C core receives one row stride
    # for all videos and would read out of bounds on a smaller one
    assert all(v.shape[1:] == (j, c) for v in videos), (
        f"heterogeneous video shapes: {[v.shape for v in videos]}"
    )
    row = j * c
    n_windows = len(video_idx)
    video_idx = np.ascontiguousarray(video_idx, np.int64)
    start_frame = np.ascontiguousarray(start_frame, np.int64)
    out = np.empty((n_windows, seq_len, j, c), np.float32)

    lib = load_library()
    if lib is None:
        for w in range(n_windows):
            v = videos[video_idx[w]]
            s = int(start_frame[w])
            clip = v[s : s + seq_len]
            if clip.shape[0] < seq_len:
                pad = np.repeat(v[-1:], seq_len - clip.shape[0], axis=0)
                clip = np.concatenate([clip, pad], axis=0)
            out[w] = clip
        return out

    videos = [np.ascontiguousarray(v, np.float32) for v in videos]
    ptrs = (ctypes.c_void_p * len(videos))(
        *[v.ctypes.data_as(ctypes.c_void_p).value for v in videos]
    )
    lengths = np.asarray([v.shape[0] for v in videos], np.int64)
    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)
    lib.gather_windows(
        ptrs, lengths, row, video_idx, start_frame,
        n_windows, seq_len, out, n_threads,
    )
    return out


def apply_masks(batch: np.ndarray, masks: np.ndarray) -> np.ndarray:
    """In-place batch * mask[..., None]. batch (N, L, J, C), masks (N, L, J)."""
    lib = load_library()
    if lib is None:
        batch *= masks[..., None]
        return batch
    n, l, j, c = batch.shape
    assert batch.flags["C_CONTIGUOUS"] and batch.dtype == np.float32
    masks = np.ascontiguousarray(masks, np.float32)
    lib.apply_masks(batch, masks, n, l, j, c)
    return batch
