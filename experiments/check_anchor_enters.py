"""Veridicality check for absolute-anchor phase-A enters (part 9b).

The view-family anchor runs record in-model recovery enters BEFORE the
kidnap (seed 0 at 92.0 s, seed 1 at 67.8 s), which the probe's
bookkeeping counts as "false triggers".  The anchor statistic is
cos(pi (x) anchor_vec, anchor_pos) = K(true pose error), so an enter is
veridical iff the adaptive model's TRUE decoded pose error at the enter
instant exceeded the detection bound (~view radius).  This script reads
the --dump npz (adaptive PI trace + true path) and reports the decoded
error around each queried enter time — no re-simulation.

Usage: python experiments/check_anchor_enters.py data/dump.npz \
           --seed 0 --length-scale 0.2 --enters 92.0 [...]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(1, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.common import decode_output  # noqa: E402
from sspslam_tpu import HexagonalSSPSpace  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("npz")
    ap.add_argument("--seed", type=int, required=True,
                    help="the run's --seed (the space is seed-dependent)")
    ap.add_argument("--length-scale", type=float, default=0.2)
    ap.add_argument("--enters", type=float, nargs="+", required=True)
    ap.add_argument("--cpu", action="store_true",
                    help="pin the decode to the host CPU backend")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    z = np.load(args.npz)
    pi, path, sk, dt = z["pi"], z["path"], int(z["skip"]), float(z["dt"])
    dim = path.shape[1]
    enters = args.enters
    seed, ls = args.seed, args.length_scale
    bounds = 1.1 * np.tile(np.array([-1, 1.0]), (dim, 1))
    space = HexagonalSSPSpace(dim, ssp_dim=pi.shape[1], seed=seed,
                              length_scale=ls, domain_bounds=bounds)
    t = dt * sk * np.arange(len(pi))
    for te in enters:
        lo, hi = np.searchsorted(t, [te - 2.0, te + 2.0])
        est = decode_output(space, pi[lo:hi], dim, grid=100)
        err = np.linalg.norm(path[lo:hi] - est, axis=1)
        at = int(np.searchsorted(t[lo:hi], te))
        at = min(at, len(err) - 1)
        print(f"enter t={te:.1f}s: err(at)={err[at]:.3f} "
              f"max(+/-2s)={err.max():.3f} median(+/-2s)={np.median(err):.3f}")


if __name__ == "__main__":
    main()
