"""ctypes bindings for the native host runtime (libsspslam_host.so).

Build with ``make -C sspslam_tpu/native`` (or ``python -m
sspslam_tpu.native.build``).  Every function has a NumPy fallback so the
framework works without the compiled library; ``AVAILABLE`` reports which
path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libsspslam_host.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i64 = ctypes.c_int64
    f64 = ctypes.c_double
    f32 = ctypes.c_float
    pd = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    pf = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    pi = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.rd_sampling.argtypes = [i64, i64, f64, pd]
    lib.stretch_trajectory.argtypes = [pd, i64, i64, f64, f64, pd, i64]
    lib.nearest_landmark.argtypes = [pd, i64, i64, i64, f64, pi, pd]
    lib.argmax_decode.argtypes = [pf, i64, i64, pf, i64, pi]
    lib.lowpass_filter.argtypes = [pf, i64, i64, f32, pf]
    lib.lif_rates.argtypes = [pf, i64, f32, f32, f32, pf]
    _lib = lib
    return lib


def build(verbose: bool = False) -> bool:
    """Compile the library in place; returns True on success."""
    try:
        subprocess.run(["make", "-C", _HERE],
                       check=True, capture_output=not verbose)
    except (OSError, subprocess.CalledProcessError):
        return False
    global _lib
    _lib = None
    return _load() is not None


AVAILABLE = _load() is not None


def rd_sampling(n: int, d: int, seed: float = 0.5) -> np.ndarray:
    lib = _load()
    if lib is None:
        from ..utils.sampling import Rd_sampling
        return Rd_sampling(n, d, seed)
    out = np.empty((n, d), np.float64)
    lib.rd_sampling(n, d, seed, out)
    return out


def stretch_trajectory(traj: np.ndarray, original_dt: float,
                       new_dt: float) -> np.ndarray:
    traj = np.ascontiguousarray(traj, np.float64)
    n0, dim = traj.shape
    n1 = int(n0 * original_dt / new_dt)
    lib = _load()
    if lib is None:
        t_orig = np.linspace(0, n0 * original_dt, n0)
        t_new = np.linspace(0, n0 * original_dt, n1)
        return np.stack([np.interp(t_new, t_orig, traj[:, j])
                         for j in range(dim)], axis=1)
    out = np.empty((n1, dim), np.float64)
    lib.stretch_trajectory(traj, n0, dim, original_dt, new_dt, out, n1)
    return out


def nearest_landmark(vecs: np.ndarray, view_rad: float):
    """vecs (T, L, D) -> (ids (T,), dists (T,)): nearest in-view landmark
    per step (-1 when none)."""
    vecs = np.ascontiguousarray(vecs, np.float64)
    T, L, D = vecs.shape
    lib = _load()
    if lib is None:
        dists = np.linalg.norm(vecs, axis=2)
        nearest = np.argmin(dists, axis=1)
        nd = dists[np.arange(T), nearest]
        return np.where(nd <= view_rad, nearest, -1), nd
    ids = np.empty(T, np.int64)
    dists = np.empty(T, np.float64)
    lib.nearest_landmark(vecs, T, L, D, view_rad, ids, dists)
    return ids, dists


def argmax_decode(data: np.ndarray, bank: np.ndarray) -> np.ndarray:
    """Row-wise argmax of data @ bank.T without materialising the (T, M)
    similarity matrix."""
    data = np.ascontiguousarray(data, np.float32)
    bank = np.ascontiguousarray(bank, np.float32)
    T, d = data.shape
    M, d2 = bank.shape
    assert d == d2
    lib = _load()
    if lib is None:
        return np.argmax(data @ bank.T, axis=1).astype(np.int64)
    out = np.empty(T, np.int64)
    lib.argmax_decode(data, T, d, bank, M, out)
    return out


def lowpass_filter(x: np.ndarray, tau: float, dt: float) -> np.ndarray:
    x = np.ascontiguousarray(x, np.float32)
    a = np.float32(np.exp(-dt / tau)) if tau > 0 else np.float32(0)
    lib = _load()
    if lib is None:
        y = np.empty_like(x)
        acc = np.zeros(x.shape[1], np.float32)
        b = 1 - a
        for t in range(x.shape[0]):
            acc = a * acc + b * x[t]
            y[t] = acc
        return y
    y = np.empty_like(x)
    lib.lowpass_filter(x, x.shape[0], x.shape[1], a, y)
    return y


def lif_rates(J: np.ndarray, tau_rc=0.02, tau_ref=0.002,
              amplitude=1.0) -> np.ndarray:
    J = np.ascontiguousarray(J, np.float32)
    lib = _load()
    if lib is None:
        Jm1 = np.maximum(J - 1.0, 1e-12)
        r = amplitude / (tau_ref + tau_rc * np.log1p(1.0 / Jm1))
        return np.where(J > 1.0 + 1e-9, r, 0.0).astype(np.float32)
    out = np.empty_like(J)
    lib.lif_rates(J.reshape(-1), J.size, tau_rc, tau_ref, amplitude,
                  out.reshape(-1))
    return out
