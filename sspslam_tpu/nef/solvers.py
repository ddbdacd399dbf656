"""Decoder solving: regularised least squares over sampled evaluation points.

Replaces nengo's ``LstsqL2`` build step (used for every decoded connection in
the reference, e.g. pathintegration.py:180-185).  Solves are a build-time
activity; they run in float64 on the host for numerical robustness — the VCO
limit-cycle feedback function is sensitive to decoder error.  A batched
variant solves all elements of an EnsembleArray in one call.
"""

from __future__ import annotations

import numpy as np

__all__ = ["lstsq_l2", "lstsq_l2_batched"]


def lstsq_l2(activities: np.ndarray, targets: np.ndarray, reg: float = 0.1):
    """Solve decoders D minimising ||A D - Y||^2 + m sigma^2 ||D||^2,
    sigma = reg * max(A).

    activities : (m, n); targets : (m, d)  ->  D : (n, d)
    """
    A = np.asarray(activities, dtype=np.float32)
    Y = np.asarray(targets, dtype=np.float32)
    m, n = A.shape
    sigma = reg * A.max() if A.size else reg
    G = A.T @ A + (m * sigma**2 * np.eye(n)).astype(np.float32)
    B = A.T @ Y
    return np.linalg.solve(G, B)


def lstsq_l2_batched(activities: np.ndarray, targets: np.ndarray,
                     reg: float = 0.1):
    """Batched solve: activities (k, m, n), targets (k, m, d) or (m, d)
    shared  ->  (k, n, d)."""
    A = np.asarray(activities, dtype=np.float32)
    Y = np.asarray(targets, dtype=np.float32)
    k, m, n = A.shape
    if Y.ndim == 2:
        Y = np.broadcast_to(Y, (k,) + Y.shape)
    sigma = reg * A.max(axis=(1, 2), keepdims=True)
    At = np.ascontiguousarray(A.transpose(0, 2, 1))
    G = At @ A + (m * sigma**2 * np.eye(n)[None, :, :]).astype(np.float32)
    B = At @ Y
    return np.linalg.solve(G, B)
