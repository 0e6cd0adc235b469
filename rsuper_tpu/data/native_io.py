"""ctypes bindings for the native host-side volume kernels.

`native/rsuper_native.cpp` provides multithreaded trilinear/nearest
resampling and fused clip+z-score — the C++ replacement for SimpleITK's role
in the reference's preprocessing. Falls back to the scipy/numpy paths when
the shared library hasn't been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(
        os.path.dirname(__file__), "..", "..", "native", "librsuper_native.so"
    )
    try:
        lib = ctypes.CDLL(os.path.abspath(path))
    except OSError:
        # the fallback is correct but ~8x slower per item; a silent fallback
        # once went unnoticed through a whole benchmark batch
        import logging

        logging.getLogger("rsuper_tpu").warning(
            "native/librsuper_native.so not found — using the slow Python "
            "loader fallback (build it with `make -C native`)"
        )
        return None
    i64 = ctypes.c_int64
    fp = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.rsuper_resample_trilinear.argtypes = [fp, i64, i64, i64, fp, i64, i64,
                                             i64, ctypes.c_int]
    lib.rsuper_resample_trilinear.restype = ctypes.c_int
    lib.rsuper_resample_nearest_u8.argtypes = [u8p, i64, i64, i64, u8p, i64,
                                               i64, i64, ctypes.c_int]
    lib.rsuper_resample_nearest_u8.restype = ctypes.c_int
    lib.rsuper_clip_zscore.argtypes = [fp, i64, ctypes.c_float, ctypes.c_float,
                                       ctypes.c_int]
    lib.rsuper_clip_zscore.restype = ctypes.c_int
    lib.rsuper_nifti_scale_cast_f32.argtypes = [
        u8p, ctypes.c_int, i64, ctypes.c_float, ctypes.c_float, fp,
        ctypes.c_int,
    ]
    lib.rsuper_nifti_scale_cast_f32.restype = ctypes.c_int
    lib.rsuper_pack_masks_cl.argtypes = [u8p, u8p, u8p, i64, i64, u8p,
                                         ctypes.c_int]
    lib.rsuper_pack_masks_cl.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def resample(
    data: np.ndarray,
    out_shape: Sequence[int],
    order: int = 1,
    nthreads: int = 0,
) -> Optional[np.ndarray]:
    """Native resample to `out_shape`; returns None if the library is absent
    (caller falls back to scipy)."""
    lib = _load()
    if lib is None:
        return None
    out_shape = tuple(int(s) for s in out_shape)
    if order == 0:
        src = np.ascontiguousarray(data, np.uint8)
        dst = np.empty(out_shape, np.uint8)
        rc = lib.rsuper_resample_nearest_u8(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), *src.shape,
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), *out_shape,
            nthreads,
        )
    else:
        src = np.ascontiguousarray(data, np.float32)
        dst = np.empty(out_shape, np.float32)
        rc = lib.rsuper_resample_trilinear(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), *src.shape,
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), *out_shape,
            nthreads,
        )
    if rc != 0:
        return None
    return dst


def clip_zscore(
    data: np.ndarray, lo: float, hi: float, nthreads: int = 0
) -> Optional[np.ndarray]:
    """Native fused clip + z-score (in a fresh array); None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(data, np.float32).copy()
    rc = lib.rsuper_clip_zscore(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), arr.size,
        lo, hi, nthreads,
    )
    return arr if rc == 0 else None


def pack_masks_cl(label: np.ndarray, unk: Optional[np.ndarray],
                  seg: Optional[np.ndarray],
                  nthreads: int = 0) -> Optional[np.ndarray]:
    """Fused channel-first → packed channels-last mask encode: (C, D, H, W)
    uint8 stacks (unk/seg ``None`` = all-zero) → (D, H, W, ceil(3C/8)) bytes
    in ``np.packbits(..., bitorder='little')`` layout. One pass, no
    moveaxis/concat temporaries — the loader-host hot path. None if the
    native library is absent (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    label = np.ascontiguousarray(label, np.uint8)
    C = label.shape[0]
    spatial = label.shape[1:]
    N = int(np.prod(spatial))
    u8p = ctypes.POINTER(ctypes.c_uint8)

    def ptr(a):
        if a is None:
            return None
        a = np.ascontiguousarray(a, np.uint8)
        assert a.shape == label.shape
        return a, a.ctypes.data_as(u8p)

    unk_h = ptr(unk)  # hold refs so the buffers outlive the call
    seg_h = ptr(seg)
    out = np.empty(spatial + ((3 * C + 7) // 8,), np.uint8)
    rc = lib.rsuper_pack_masks_cl(
        label.ctypes.data_as(u8p),
        unk_h[1] if unk_h else None,
        seg_h[1] if seg_h else None,
        C, N, out.ctypes.data_as(u8p), nthreads,
    )
    return out if rc == 0 else None


_NIFTI_ITEMSIZE = {2: 1, 4: 2, 8: 4, 16: 4, 64: 8, 512: 2}


def nifti_scale_cast_f32(
    raw: bytes, offset: int, dtype_code: int, count: int, slope: float,
    inter: float, nthreads: int = 0,
) -> Optional[np.ndarray]:
    """Native fused NIfTI payload decode: little-endian voxels of the given
    NIfTI datatype code → float32 with scl_slope/scl_inter applied in one
    threaded pass (flat array; caller reshapes in Fortran order). None if
    the library is absent or the datatype unsupported."""
    lib = _load()
    if lib is None or dtype_code not in _NIFTI_ITEMSIZE:
        return None
    nbytes = count * _NIFTI_ITEMSIZE[dtype_code]
    if offset + nbytes > len(raw):
        return None
    dst = np.empty(count, np.float32)
    src = np.frombuffer(raw, np.uint8, count=nbytes, offset=offset)  # no copy
    rc = lib.rsuper_nifti_scale_cast_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(dtype_code), int(count), float(slope), float(inter),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nthreads,
    )
    return dst if rc == 0 else None
