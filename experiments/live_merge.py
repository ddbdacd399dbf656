"""Online multi-agent mapping: two agents step CONCURRENTLY as vmapped
episodes with periodic in-simulation map exchange.

Extends experiments/map_merge.py (offline carry-arithmetic fusion after
both runs end) to the live setting: both agents advance inside one
vmapped ``lax.scan`` and, every ``--exchange-s`` seconds of simulated
time, their learned maps (PES decoders + Voja encoders — pytree leaves of
the carry) are fused ON DEVICE and written back to both episodes:

    M_k = A + B - M_{k-1}

(deltas since the previous exchange add; PES starts at the zero function
and Voja drifts are ~disjoint for disjoint landmarks, the same additivity
map_merge.py validates offline).  No reference counterpart — an
imperative simulator has no first-class map to exchange.

Protocol: agent A explores the LEFT half for the first phase, then its
path crosses into the RIGHT half (and B mirror-image).  During the
crossover each agent enters territory only the OTHER agent has mapped:
with exchange on, the recalled landmarks are familiar and the correction
loop localizes; with exchange off (control), the same crossing runs on
pure path integration + its own half-map.

Usage: python experiments/live_merge.py [--T 120] [--exchange-s 5]
Prints one JSON line with per-agent crossover-phase tracking error for
exchange on/off.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(1, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sspslam_tpu
from sspslam_tpu import HexagonalSSPSpace
from sspslam_tpu.models import SLAMNetwork, get_slam_input_functions2
from sspslam_tpu.nef import Connection, Network, Node, Probe, Simulator
from sspslam_tpu.nef.processes import TimeTable, clamp_table
from sspslam_tpu.utils.sampling import Rd_sampling

from experiments.common import DT, decode_output


def make_crossover_path(T, dt, limit, seed, start_side):
    """Phase 1 (2/3 of T): fill one half; phase 2: fill the other."""
    from sspslam_tpu.nef import WhiteSignal
    n = int(T / dt)
    n1 = (2 * n) // 3
    segs = []
    for i, (steps, side) in enumerate(((n1, start_side),
                                       (n - n1, -start_side))):
        Tseg = steps * dt
        p = np.hstack([
            WhiteSignal(Tseg, high=limit, seed=seed + 31 * i + j).run(
                Tseg, dt=dt) for j in range(2)])[:steps]
        x_lo, x_hi = ((-0.9, -0.05) if side < 0 else (0.05, 0.9))
        for j, (lo_t, hi_t) in enumerate(((x_lo, x_hi), (-0.9, 0.9))):
            lo, hi = p[:, j].min(), p[:, j].max()
            p[:, j] = (p[:, j] - lo) / max(hi - lo, 1e-12) \
                * (hi_t - lo_t) + lo_t
        segs.append(p)
    # join continuously: phase 2 necessarily starts across the midline, so
    # bridge with a linear ramp.  The bridge SPEED must stay inside the
    # trajectory's own velocity range: the model bakes a shared velocity
    # scale 1/max|Av| over the whole path, and a fast fixed-duration
    # bridge (the original 1 s ramp hit |Av| 3.4-5.2 vs a p99 of ~1.5)
    # compresses every agent's explore-phase drive ~3x into the path
    # integrator's low-SNR regime — measured root cause of the seed-1
    # phase-A failures (VALIDATION "Live merge", world-fragility
    # follow-up): failures tracked the baked scale across path swaps, not
    # the world or the trajectory.  Size the ramp so its speed matches the
    # explore phase's p90 speed instead.
    a, b = segs
    va = np.linalg.norm(np.diff(a, axis=0), axis=1) / dt
    v_ref = max(float(np.percentile(va, 90)), 1e-3)
    dist = float(np.linalg.norm(b[0] - a[-1]))
    bridge_steps = max(int(1.0 / dt), int(dist / v_ref / dt))
    ramp = np.linspace(0, 1, bridge_steps)[:, None]
    bridge = a[-1] * (1 - ramp) + b[0] * ramp
    path = np.concatenate([a, bridge, b])[:n]
    return path


def main():
    ap = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    ap.add_argument("--T", type=float, default=120.0)
    ap.add_argument("--exchange-s", type=float, default=5.0,
                    help="map-exchange period (simulated seconds); also "
                         "the scan segment length")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--a-path-seed", type=int, default=None,
                    help="override agent A's trajectory seed while keeping "
                         "the world (landmarks/space/SP draws) at --seed — "
                         "isolates path-vs-world attribution when a seed "
                         "fails phase A (diagnostic)")
    ap.add_argument("--ssp-dim", type=int, default=97)
    ap.add_argument("--n-landmarks", type=int, default=50)
    ap.add_argument("--view-rad", type=float, default=0.2)
    ap.add_argument("--pi-n-neurons", type=int, default=800)
    ap.add_argument("--mem-n-neurons", type=int, default=970)
    ap.add_argument("--circonv-n-neurons", type=int, default=100)
    ap.add_argument("--limit", type=float, default=0.1)
    ap.add_argument("--length-scale", type=float, default=0.2)
    ap.add_argument("--update-thres", type=float, default=0.4)
    ap.add_argument("--shift-rate", type=float, default=0.1)
    ap.add_argument("--voja-lr", type=float, default=1e-4)
    ap.add_argument("--pes-lr", type=float, default=2e-2)
    ap.add_argument("--intercept", type=float, default=0.3)
    ap.add_argument("--probe-every", type=float, default=0.05)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke tests)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    dt = DT
    n_steps = int(args.T / dt)
    n_cross = n_steps - (2 * n_steps) // 3   # crossover phase length
    radius = 1.0

    a_seed = args.seed if args.a_path_seed is None else args.a_path_seed
    paths = [make_crossover_path(args.T, dt, args.limit, a_seed, -1),
             make_crossover_path(args.T, dt, args.limit, args.seed + 500,
                                 +1)]
    B = len(paths)

    bounds = 1.1 * radius * np.tile(np.array([-1, 1.0]), (2, 1))
    space = HexagonalSSPSpace(2, ssp_dim=args.ssp_dim, seed=args.seed,
                              length_scale=args.length_scale,
                              domain_bounds=bounds)
    d = space.ssp_dim
    obj_locs = 0.9 * radius * 2 * (
        Rd_sampling(args.n_landmarks, 2, seed=args.seed) - 0.5)
    lm_space = sspslam_tpu.SPSpace(args.n_landmarks, d, seed=args.seed)

    # shared velocity scale (baked into the model; see scaled_slam.py)
    vels = [(1 / dt) * np.diff(p, axis=0, prepend=p[:1]) for p in paths]
    A_mat = space.phase_matrix
    shared_scale = 1.0 / max(float(np.abs(A_mat @ v.T).max()) for v in vels)

    def agent_tables(path, v):
        vec_to_lm = obj_locs[None, :, :] - path[:, None, :]
        (_, _, in_view_f, _, sp_f, _, vecssp_f) = \
            get_slam_input_functions2(space, lm_space, v, vec_to_lm,
                                      args.view_rad)
        return {
            "vel": (v * shared_scale).astype(np.float32),
            "init": clamp_table(space.encode(path[:1]).flatten(), 0.05,
                                dt).rows(0, n_steps),
            "lm_sp": sp_f.rows(0, n_steps),
            "lm_vecssp": vecssp_f.rows(0, n_steps),
            "in_view": in_view_f.rows(0, n_steps),
        }

    t0 = time.time()
    tabs = [agent_tables(p, v) for p, v in zip(paths, vels)]
    print(f"worlds: built in {time.time() - t0:.1f}s", flush=True)

    node_key = {}
    with Network(seed=args.seed) as net:
        t0w = tabs[0]
        vel = Node(TimeTable(t0w["vel"], dt)); node_key[vel] = "vel"
        init = Node(TimeTable(t0w["init"], dt)); node_key[init] = "init"
        lm_id = Node(TimeTable(t0w["lm_sp"], dt)); node_key[lm_id] = "lm_sp"
        lm_ssp = Node(TimeTable(t0w["lm_vecssp"], dt))
        node_key[lm_ssp] = "lm_vecssp"
        in_view = Node(TimeTable(t0w["in_view"], dt))
        node_key[in_view] = "in_view"
        slam = SLAMNetwork(
            space, lm_space, args.view_rad, args.n_landmarks,
            args.pi_n_neurons, args.mem_n_neurons, args.circonv_n_neurons,
            update_thres=args.update_thres, shift_rate=args.shift_rate,
            voja_learning_rate=args.voja_lr, pes_learning_rate=args.pes_lr,
            intercept=args.intercept, vel_scaling_factor=shared_scale,
            seed=args.seed, gate_mode="auto_recovery")
        Connection(vel, slam.velocity_input, synapse=None)
        Connection(init, slam.pathintegrator.input, synapse=None)
        Connection(lm_id, slam.landmark_id_input, synapse=None)
        Connection(lm_ssp, slam.landmark_vec_ssp, synapse=None)
        Connection(in_view, slam.no_landmark_in_view, synapse=None)
        p_out = Probe(slam.pathintegrator.output, synapse=0.05)

    sim = Simulator(net, seed=args.seed)
    print(f"model built: "
          f"{sum((b.k * b.n if b.batched else b.n) for b in sim.model.ensembles):,}"
          " LIF neurons", flush=True)

    step = sim._step_fn
    vstep = jax.vmap(step, in_axes=(0, 0, None))
    seg = max(1, int(args.exchange_s / dt))

    def seg_fn(state, xs, params):
        def body(c, x):
            return vstep(c, x, params)
        return jax.lax.scan(body, state, xs, unroll=4)

    run_seg = jax.jit(seg_fn)

    @jax.jit
    def exchange(state, base):
        """Fuse both episodes' learned maps on device: M = A + B - M_prev,
        write M back to both, return (state, M as the new base)."""
        new_learned, new_base = {}, {}
        for k, leaf in state["learned"].items():
            m = leaf[0] + leaf[1] - base[k]
            new_learned[k] = jnp.stack([m, m])
            new_base[k] = m
        state = dict(state, learned=new_learned)
        return state, new_base

    params_dev = jax.device_put(sim.params)
    input_keys = [node_key[n] for n in sim.model.input_nodes]
    per = max(1, int(round(args.probe_every / dt)))
    p_idx = next(bp.index for bp in sim.model.probes if bp.obj is p_out)

    def run(do_exchange):
        state = jax.tree_util.tree_map(
            lambda x: np.broadcast_to(np.asarray(x),
                                      (B,) + np.shape(x)).copy(), sim.state)
        state = jax.device_put(state)
        base = {k: jnp.asarray(v) for k, v in sim.model.learned_init.items()}
        kept = []
        done = 0
        t0 = time.time()
        while done < n_steps:
            hi = min(done + seg, n_steps)
            xs = [jnp.asarray(np.stack([t[k][done:hi] for t in tabs],
                                       axis=1)) for k in input_keys]
            state, emits = run_seg(state, xs, params_dev)
            if do_exchange and hi < n_steps:
                state, base = exchange(state, base)
            e = np.asarray(emits[p_idx])
            phase = (per - 1 - done % per) % per
            kept.append(e[phase::per])
            done = hi
        jax.block_until_ready(state["step"])
        wall = time.time() - t0
        out = np.swapaxes(np.concatenate(kept), 0, 1)   # (B, samples, d)
        return out, wall

    results = {}
    for label, do_x in (("exchange", True), ("no_exchange", False)):
        out, wall = run(do_x)
        k = out.shape[1]
        row = {"wall_s": round(wall, 1),
               "agg_steps_per_s": round(B * n_steps / wall, 1)}
        for b in range(B):
            path_s = paths[b][per - 1::per][:k]
            est = decode_output(space, out[b], 2, grid=100)
            err = np.sqrt(np.sum((path_s - est) ** 2, axis=1))
            n_cross_s = max(1, n_cross // per)
            cross = err[-n_cross_s:]
            row[f"agent_{'AB'[b]}"] = {
                "explore_median": round(float(
                    np.median(err[:-n_cross_s])), 4),
                "cross_median": round(float(np.median(cross)), 4),
                "cross_p90": round(float(np.quantile(cross, 0.9)), 4),
            }
        results[label] = row
        print(json.dumps({label: row}), flush=True)

    out_line = {
        "metric": "live two-agent mapping: crossover-phase median error "
                  "(each agent localizing in territory only the other "
                  "mapped), exchange vs none",
        "exchange_s": args.exchange_s, "T": args.T, "ssp_dim": d,
        "seed": args.seed,
        "value": round(float(np.mean(
            [results["exchange"][f"agent_{a}"]["cross_median"]
             for a in "AB"])), 4),
        "unit": "arena units",
        "results": results,
    }
    print(json.dumps(out_line))


if __name__ == "__main__":
    main()
