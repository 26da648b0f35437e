"""Loader for the native host-side kernels (native/*.c via ctypes).

Builds libzktls_native.so on first use with the system C compiler (cached
next to the sources); every consumer falls back to the pure-Python path
when the toolchain or the build is unavailable, so the framework never
hard-depends on native code — it just gets ~100× faster host hashing
(verifier Merkle paths, challenger) when present.

Instances: 0 = width-16 (node compression, challenger), 1 = width-24
(rate-16 Merkle leaf sponge).
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

__all__ = ["get_native", "native_available"]

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "libzktls_native.so"
_SRC = _NATIVE_DIR / "poseidon2.c"
_SRC_MIMC = _NATIVE_DIR / "mimc_bn254.c"
_SRC_MSM = _NATIVE_DIR / "bn254_msm.c"

_lib = None
_load_failed = False

_WIDTH_TO_INST = {16: 0, 24: 1}


def _build() -> bool:
    if os.environ.get("ZKTLS_NO_NATIVE"):
        return False
    srcs = [_SRC, _SRC_MIMC, _SRC_MSM]
    if _SO_PATH.exists() and all(
            _SO_PATH.stat().st_mtime >= s.stat().st_mtime for s in srcs):
        return True
    for extra in (["-fopenmp"], []):
        for cc in ("cc", "gcc", "clang"):
            try:
                subprocess.run(
                    [cc, "-O3", "-shared", "-fPIC"] + extra
                    + [str(s) for s in srcs] + ["-o", str(_SO_PATH)],
                    check=True, capture_output=True, timeout=120,
                )
                return True
            except (OSError, subprocess.SubprocessError):
                continue
    return False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not _build():
            _load_failed = True
            return None
        lib = ctypes.CDLL(str(_SO_PATH))
        u32 = ctypes.c_uint32
        u32p = ctypes.POINTER(u32)
        sz = ctypes.c_size_t
        lib.p2_set_params.argtypes = [u32] * 4 + [u32p] * 3
        lib.p2_set_params.restype = ctypes.c_int
        lib.p2_permute_batch.argtypes = [u32, u32p, sz]
        lib.p2_hash_rows.argtypes = [u32, u32p, sz, sz, u32p]
        lib.p2_compress_pairs.argtypes = [u32, u32p, sz, u32p]
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.mimc_set_rc.argtypes = [u64p]
        lib.mimc_set_rc.restype = ctypes.c_int
        lib.mimc_hash_rows.argtypes = [u64p, sz, sz, u64p]
        lib.mimc_compress_pairs.argtypes = [u64p, sz, u64p]
        lib.bn254_msm_g1.argtypes = [u64p, u64p, sz, u64p]
        lib.bn254_g1_mul_batch.argtypes = [u64p, u64p, sz, u64p]
        lib.bn254_msm_g2.argtypes = [u64p, u64p, sz, u64p]
        lib.bn254_g2_mul_batch.argtypes = [u64p, u64p, sz, u64p]
        from ..snark.wrap import MIMC_ROUND_CONSTANTS

        rc_arr = np.zeros((len(MIMC_ROUND_CONSTANTS), 4), dtype=np.uint64)
        for i, c in enumerate(MIMC_ROUND_CONSTANTS):
            for j in range(4):
                rc_arr[i, j] = (c >> (64 * j)) & 0xFFFFFFFFFFFFFFFF
        lib.mimc_set_rc(np.ascontiguousarray(rc_arr).ctypes.data_as(u64p))

        from ..ops.poseidon2 import get_params

        for width, inst in _WIDTH_TO_INST.items():
            p = get_params(width)
            ext = np.ascontiguousarray(
                np.array(p.external_rc, dtype=np.uint32))
            irc = np.ascontiguousarray(
                np.array(p.internal_rc, dtype=np.uint32))
            diag = np.ascontiguousarray(np.array(p.diag, dtype=np.uint32))
            rc = lib.p2_set_params(
                inst, width, p.rf, p.rp,
                ext.ctypes.data_as(u32p), irc.ctypes.data_as(u32p),
                diag.ctypes.data_as(u32p),
            )
            if rc != 0:
                _load_failed = True
                return None
        _lib = lib
    except Exception:
        _load_failed = True
        return None
    return _lib


def native_available() -> bool:
    return _load() is not None


class _Native:
    """numpy-typed wrappers over the C entry points."""

    def permute_batch(self, states: np.ndarray, width: int = 16) -> np.ndarray:
        lib = _load()
        out = np.ascontiguousarray(states, dtype=np.uint32).copy()
        lib.p2_permute_batch(
            _WIDTH_TO_INST[width],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), out.shape[0])
        return out

    def hash_rows(self, rows: np.ndarray, width: int = 24) -> np.ndarray:
        """Sponge-hash rows with the given permutation width (rate w−8)."""
        lib = _load()
        rows = np.ascontiguousarray(rows, dtype=np.uint32)
        n, w = rows.shape
        out = np.zeros((n, 8), dtype=np.uint32)
        lib.p2_hash_rows(
            _WIDTH_TO_INST[width],
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), n, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
        return out

    def compress_pairs(self, pairs: np.ndarray) -> np.ndarray:
        lib = _load()
        pairs = np.ascontiguousarray(pairs, dtype=np.uint32)
        n = pairs.shape[0]
        out = np.zeros((n, 8), dtype=np.uint32)
        lib.p2_compress_pairs(
            0, pairs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
        return out

    # -- BN254 MiMC (the shrink/wrap commitment hash) -------------------

    def mimc_hash_rows(self, elems: np.ndarray) -> np.ndarray:
        """(n, k, 4) plain u64 limb rows → (n, 4) digests (MP-MiMC chain
        per row, identical to snark.wrap.mimc_hash)."""
        lib = _load()
        elems = np.ascontiguousarray(elems, dtype=np.uint64)
        n, k, _ = elems.shape
        out = np.zeros((n, 4), dtype=np.uint64)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.mimc_hash_rows(elems.ctypes.data_as(u64p), n, k,
                           out.ctypes.data_as(u64p))
        return out

    def mimc_compress_pairs(self, pairs: np.ndarray) -> np.ndarray:
        """(n, 2, 4) plain u64 limb pairs → (n, 4) parent digests."""
        lib = _load()
        pairs = np.ascontiguousarray(pairs, dtype=np.uint64)
        n = pairs.shape[0]
        out = np.zeros((n, 4), dtype=np.uint64)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.mimc_compress_pairs(pairs.ctypes.data_as(u64p), n,
                                out.ctypes.data_as(u64p))
        return out

    # -- BN254 G1 MSM (Groth16 proving hot loop) ------------------------

    def bn254_msm_g1(self, points: np.ndarray,
                     scalars: np.ndarray) -> np.ndarray:
        """points (n, 8), scalars (n, 4) plain u64 limbs → (3, 4)
        Jacobian (X, Y, Z) plain limbs; Z = 0 means infinity."""
        lib = _load()
        points = np.ascontiguousarray(points, dtype=np.uint64)
        scalars = np.ascontiguousarray(scalars, dtype=np.uint64)
        out = np.zeros((3, 4), dtype=np.uint64)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.bn254_msm_g1(points.ctypes.data_as(u64p),
                         scalars.ctypes.data_as(u64p), points.shape[0],
                         out.ctypes.data_as(u64p))
        return out

    def bn254_g1_mul_batch(self, base: np.ndarray,
                           scalars: np.ndarray) -> np.ndarray:
        """base (8,), scalars (n, 4) → (n, 3, 4) Jacobian points."""
        lib = _load()
        base = np.ascontiguousarray(base, dtype=np.uint64)
        scalars = np.ascontiguousarray(scalars, dtype=np.uint64)
        n = scalars.shape[0]
        out = np.zeros((n, 3, 4), dtype=np.uint64)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.bn254_g1_mul_batch(base.ctypes.data_as(u64p),
                               scalars.ctypes.data_as(u64p), n,
                               out.ctypes.data_as(u64p))
        return out

    def bn254_msm_g2(self, points: np.ndarray,
                     scalars: np.ndarray) -> np.ndarray:
        """points (n, 16) (x.re‖x.im‖y.re‖y.im limbs), scalars (n, 4) →
        (6, 4) Jacobian over Fp2 (X.re X.im Y.re Y.im Z.re Z.im)."""
        lib = _load()
        points = np.ascontiguousarray(points, dtype=np.uint64)
        scalars = np.ascontiguousarray(scalars, dtype=np.uint64)
        out = np.zeros((6, 4), dtype=np.uint64)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.bn254_msm_g2(points.ctypes.data_as(u64p),
                         scalars.ctypes.data_as(u64p), points.shape[0],
                         out.ctypes.data_as(u64p))
        return out

    def bn254_g2_mul_batch(self, base: np.ndarray,
                           scalars: np.ndarray) -> np.ndarray:
        """base (16,), scalars (n, 4) → (n, 6, 4) Jacobian-Fp2 points."""
        lib = _load()
        base = np.ascontiguousarray(base, dtype=np.uint64)
        scalars = np.ascontiguousarray(scalars, dtype=np.uint64)
        n = scalars.shape[0]
        out = np.zeros((n, 6, 4), dtype=np.uint64)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.bn254_g2_mul_batch(base.ctypes.data_as(u64p),
                               scalars.ctypes.data_as(u64p), n,
                               out.ctypes.data_as(u64p))
        return out


def get_native() -> _Native | None:
    return _Native() if native_available() else None
