"""ctypes bindings for the native host-augmentation library
(native/fundus_aug.cpp), with transparent scipy fallback.

The library is built lazily with the repo Makefile on first use
(``make -C native``); if the toolchain or .so is unavailable every entry
point falls back to the scipy implementations in
uda_clr_tpu.data.transforms, so the package never hard-depends on the
native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")


def _candidate_paths():
    """Shared-object search order: explicit env override, the repo-root
    Makefile build (source checkout), then the setuptools-built extension
    installed next to this module (pip install — see setup.py)."""
    env = os.environ.get("UDA_CLR_NATIVE_LIB")
    if env:
        yield env
    yield os.path.join(_NATIVE_DIR, "libfundus_aug.so")
    import glob

    yield from sorted(glob.glob(
        os.path.join(os.path.dirname(__file__), "_fundus_aug*.so")))


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        env = os.environ.get("UDA_CLR_NATIVE_LIB")
        if env and not os.path.exists(env):
            # an explicit override that can't be honored must fail loudly,
            # not silently fall back to some other library (checked before
            # _tried is set so the error repeats on every call)
            raise FileNotFoundError(f"UDA_CLR_NATIVE_LIB={env!r} does not exist")
        _tried = True
        so = next((p for p in _candidate_paths() if os.path.exists(p)), None)
        if so is None and os.path.isdir(_NATIVE_DIR):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR], check=True,
                    capture_output=True, timeout=120,
                )
            except Exception:
                return None
            so = os.path.join(_NATIVE_DIR, "libfundus_aug.so")
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f8 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.fundus_gaussian2d.argtypes = [f8, ctypes.c_int, ctypes.c_int,
                                          ctypes.c_double, ctypes.c_int]
        lib.fundus_elastic.argtypes = [u8, u8, f8, f8, ctypes.c_int, ctypes.c_int,
                                       ctypes.c_double, ctypes.c_double, u8, u8]
        lib.fundus_boundary_ring.argtypes = [u8, ctypes.c_int, ctypes.c_int,
                                             ctypes.c_int, u8]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def set_enabled(enabled: bool) -> None:
    """Force the native library on/off (A/B benchmarking —
    tools/bench_pipeline.py). Off = scipy fallbacks everywhere."""
    global _lib, _tried
    with _lock:
        if not enabled:
            _lib, _tried = None, True
        else:
            _tried = False
    if enabled:
        _load()


def gaussian2d(field: np.ndarray, sigma: float, mode: str = "constant") -> np.ndarray:
    """In-place-sh separable gaussian of a [h,w] float64 field."""
    lib = _load()
    out = np.ascontiguousarray(field, dtype=np.float64).copy()
    if lib is None:
        import scipy.ndimage as ndi

        return ndi.gaussian_filter(out, sigma, mode=mode, cval=0)
    lib.fundus_gaussian2d(out, out.shape[0], out.shape[1], float(sigma),
                          0 if mode == "constant" else 1)
    return out


def elastic(image: np.ndarray, label: np.ndarray, rand_x: np.ndarray,
            rand_y: np.ndarray, alpha: float, sigma: float):
    """Native elastic deformation; returns (image', label') uint8.
    ``rand_x/rand_y`` are the raw U(-1,1) fields (pre-smoothing)."""
    lib = _load()
    h, w = label.shape
    if lib is None:
        import scipy.ndimage as ndi

        dx = ndi.gaussian_filter(rand_x, sigma, mode="constant", cval=0) * alpha
        dy = ndi.gaussian_filter(rand_y, sigma, mode="constant", cval=0) * alpha
        x, y = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        idx = (np.reshape(x + dx, (-1, 1)), np.reshape(y + dy, (-1, 1)))
        out_img = np.zeros((h, w, 3))
        for c in range(3):
            out_img[:, :, c] = ndi.map_coordinates(image[:, :, c], idx, order=1).reshape(h, w)
        out_lbl = ndi.map_coordinates(label, idx, order=1, mode="nearest").reshape(h, w)
        return out_img.astype(np.uint8), out_lbl.astype(np.uint8)
    img = np.ascontiguousarray(image, np.uint8)
    lbl = np.ascontiguousarray(label, np.uint8)
    rx = np.ascontiguousarray(rand_x, np.float64).copy()
    ry = np.ascontiguousarray(rand_y, np.float64).copy()
    out_img = np.empty_like(img)
    out_lbl = np.empty_like(lbl)
    lib.fundus_elastic(img, lbl, rx, ry, h, w, float(alpha), float(sigma),
                       out_img, out_lbl)
    return out_img, out_lbl


def boundary_ring(mask2: np.ndarray, iters: int = 5) -> np.ndarray:
    """Cup+disc boundary ring (union of dilation-XOR-erosion rings)."""
    lib = _load()
    m = np.ascontiguousarray((mask2 > 0).astype(np.uint8))
    h, w = m.shape[:2]
    if lib is None:
        import scipy.ndimage as ndi

        out = np.zeros((h, w), np.uint8)
        for ch in range(2):
            a = m[..., ch]
            dil = ndi.binary_dilation(a, iterations=iters)
            ero = ndi.binary_erosion(a, iterations=iters)
            out |= (dil.astype(np.uint8) + ero.astype(np.uint8) == 1).astype(np.uint8)
        return out
    out = np.zeros((h, w), np.uint8)
    lib.fundus_boundary_ring(m, h, w, iters, out)
    return out
