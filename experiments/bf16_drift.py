"""bf16 matmul-input drift study.

``Simulator(matmul_dtype=jnp.bfloat16)`` casts the *inputs* of the large
per-step matmuls (encoders/decoders/transform params and the activity
vectors they contract with) to bfloat16 while keeping f32 accumulation and
f32 state/filters (nef/executor.py:66-90).  That halves the dominant HBM
read traffic, but the path integrator is a bank of VCO limit cycles whose
phase is integrated for 1e4-1e5 steps — precision errors could accumulate
as phase drift rather than wash out as noise.

This experiment settles it empirically: the same built PI model (reference
run_pathint.py defaults — /root/reference/experiments/run_pathint.py:21-24)
is run in f32 and bf16 over a long horizon, and we compare (a) the decoded
path error of each against ground truth and (b) the direct divergence
between the two trajectories.  Also times both to report the bf16 speedup.

Usage:  python experiments/bf16_drift.py --T 60
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(1, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.common import DT, decode_output

from sspslam_tpu import HexagonalSSPSpace
from sspslam_tpu.models import PathIntegration
from sspslam_tpu.nef import (Connection, Network, Node, Probe, Simulator,
                             TimeTable, WhiteSignal)


def run_once(model, probe, T, seed, matmul_dtype, segment_steps):
    import jax
    sim = Simulator(model, seed=seed, matmul_dtype=matmul_dtype,
                    progress=False)
    sim.run_steps(segment_steps, segment_steps=segment_steps)  # compile
    t0 = time.time()
    n = int(T / DT)
    sim2 = Simulator(model, seed=seed, matmul_dtype=matmul_dtype,
                     progress=False)
    sim2.run_steps(n, segment_steps=segment_steps)
    jax.block_until_ready(sim2.state)
    elapsed = time.time() - t0
    return np.asarray(sim2.data[probe]), elapsed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=float, default=60.0)
    ap.add_argument("--ssp-dim", type=int, default=97)
    ap.add_argument("--pi-n-neurons", type=int, default=800)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--limit", type=float, default=0.1)
    ap.add_argument("--segment-steps", type=int, default=2000)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke tests)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    dt = DT
    radius = 1.0
    n_steps = int(args.T / dt)
    sig = WhiteSignal(args.T + 1, high=args.limit, rms=0.3, seed=args.seed)
    vels = sig.run(args.T + 1, dt=dt, size_out=2)[: n_steps]
    path = np.cumsum(vels * dt, axis=0)
    path = 0.9 * radius * path / max(1.0, np.max(np.abs(path)))
    vels = (1 / dt) * np.diff(path, axis=0, prepend=path[:1])

    bounds = 1.1 * radius * np.tile(np.array([-1, 1.0]), (2, 1))
    space = HexagonalSSPSpace(2, ssp_dim=args.ssp_dim, seed=args.seed,
                              length_scale=0.2, domain_bounds=bounds)
    d = space.ssp_dim
    scale_fac = 1 / np.max(np.abs(space.phase_matrix @ vels.T))
    init = space.encode(path[:1]).flatten()

    with Network(seed=args.seed) as model:
        vel = Node(TimeTable(vels * scale_fac, dt))
        init_node = Node(lambda t: init if t < 0.05 else np.zeros(d))
        pi = PathIntegration(space, args.pi_n_neurons, 0.05,
                             scaling_factor=scale_fac, stable=True)
        Connection(vel, pi.velocity_input, synapse=None)
        Connection(init_node, pi.input, synapse=None)
        p = Probe(pi.output, synapse=0.05)

    out32, t32 = run_once(model, p, args.T, args.seed, None,
                          args.segment_steps)
    out16, t16 = run_once(model, p, args.T, args.seed, jnp.bfloat16,
                          args.segment_steps)

    skip = max(1, n_steps // 4000)
    path_s = path[: out32.shape[0]][::skip]
    est32 = decode_output(space, out32[::skip], 2, grid=100)
    est16 = decode_output(space, out16[::skip], 2, grid=100)
    err32 = np.sqrt(np.sum((path_s - est32) ** 2, axis=1))
    err16 = np.sqrt(np.sum((path_s - est16) ** 2, axis=1))
    # direct SSP-trajectory divergence (cosine between the two runs)
    n1 = np.maximum(np.linalg.norm(out32[::skip], axis=1), 1e-6)
    n2 = np.maximum(np.linalg.norm(out16[::skip], axis=1), 1e-6)
    cos = np.sum(out32[::skip] * out16[::skip], axis=1) / (n1 * n2)

    q = n_steps // skip // 4
    print(f"config: ssp_dim={d}, {args.pi_n_neurons} LIF/VCO, T={args.T}s "
          f"({n_steps} steps)")
    print(f"f32  : median err {np.median(err32):.3f}  "
          f"last-quarter {np.median(err32[-q:]):.3f}  final {err32[-1]:.3f}"
          f"  ({n_steps / t32:.0f} steps/s)")
    print(f"bf16 : median err {np.median(err16):.3f}  "
          f"last-quarter {np.median(err16[-q:]):.3f}  final {err16[-1]:.3f}"
          f"  ({n_steps / t16:.0f} steps/s)")
    print(f"bf16 speedup: {t32 / t16:.2f}x")
    print(f"f32-vs-bf16 trajectory cosine: median {np.median(cos):.4f}  "
          f"min {np.min(cos):.4f}  final {cos[-1]:.4f}")


if __name__ == "__main__":
    main()
