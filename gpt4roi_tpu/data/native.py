"""ctypes bindings for the native C++ data-path core (native/datapath.cpp).

Auto-builds with ``make -C native`` on first use if the shared object is
missing and a toolchain is present; every entry point has a numpy fallback
so the framework works without the native library (e.g. in constrained CI).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

from gpt4roi_tpu.data.constants import CLIP_MEAN, CLIP_STD

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_native_dir(), "libdatapath.so")
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["make", "-C", _native_dir()],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(so):
        return None
    lib = ctypes.CDLL(so)
    lib.resize_normalize_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    lib.collate_pad_i32.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int, ctypes.c_int, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
    ]
    lib.datapath_version.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available() -> bool:
    return load_library() is not None


def resize_normalize(
    img_u8: np.ndarray,  # (H, W, 3) uint8
    size: Tuple[int, int],
    mean: Sequence[float] = tuple(m * 255.0 for m in CLIP_MEAN),
    std: Sequence[float] = tuple(s * 255.0 for s in CLIP_STD),
    nthreads: int = 4,
) -> np.ndarray:
    """Fused bilinear resize (align_corners=False) + normalise -> float32."""
    lib = load_library()
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    oh, ow = size
    if lib is None:
        from gpt4roi_tpu.data.transforms import resize_image

        out = resize_image(img_u8.astype(np.float32), size)
        return (out - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    h, w = img_u8.shape[:2]
    dst = np.empty((oh, ow, 3), np.float32)
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    lib.resize_normalize_u8(
        img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), oh, ow,
        mean_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nthreads,
    )
    return dst


def collate_pad(
    rows: Sequence[np.ndarray], seq_len: int, pad_value: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad int rows -> ((B, S) int32, (B, S) float32 mask)."""
    lib = load_library()
    b = len(rows)
    if lib is None:
        out = np.full((b, seq_len), pad_value, np.int32)
        mask = np.zeros((b, seq_len), np.float32)
        for i, r in enumerate(rows):
            n = min(len(r), seq_len)
            out[i, :n] = r[:n]
            mask[i, :n] = 1.0
        return out, mask
    flat = np.ascontiguousarray(np.concatenate([np.asarray(r, np.int32) for r in rows]))
    lengths = np.asarray([len(r) for r in rows], np.int64)
    out = np.empty((b, seq_len), np.int32)
    mask = np.empty((b, seq_len), np.float32)
    lib.collate_pad_i32(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        b, seq_len, pad_value,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out, mask
