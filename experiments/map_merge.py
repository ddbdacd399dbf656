"""Multi-agent map merging: fuse two agents' learned maps by carry
arithmetic, then localize against the merged map.

No reference counterpart — this demonstrates what the functional-state
engine makes trivial that an imperative simulator cannot: the entire
learned map (PES decoders + Voja encoders) is a pytree leaf in the scan
carry, so maps are first-class DATA.  Two agents with identically-seeded
networks explore disjoint halves of the arena; their maps merge by

    decoders:  d_merged   = d_A + d_B              (PES starts at the
                                                    zero function, so
                                                    learned deltas add)
    encoders:  enc_merged = enc_0 + (enc_A - enc_0) + (enc_B - enc_0)
                                                   (Voja drifts add; the
                                                    drifted neuron sets
                                                    are ~disjoint for
                                                    disjoint landmarks)

and the merged map is injected into a third, learning-frozen
"localization mode" agent that runs a full-arena trajectory.  Controls:
each single map localizes only in its own half; the empty map drifts
like pure path integration.

Identical network draws across the three programs come from identical
construction (same ctor args + Network(seed)); the only model parameter
derived from DATA is the velocity normalization, so the last velocity
row of every agent is pinned to the common maximum (see below).

Usage: python experiments/map_merge.py [--T-explore 100] [--T-test 60]
Prints one JSON line: per-condition median tracking error, full arena
and per-half.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("SSPSLAM_HOIST_GATE", "1")

sys.path.insert(1, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sspslam_tpu
from sspslam_tpu import HexagonalSSPSpace
from sspslam_tpu.models import SLAMNetwork, get_slam_input_functions2
from sspslam_tpu.nef import (Connection, Network, Node, Probe, Simulator,
                             WhiteSignal)
from sspslam_tpu.utils.sampling import Rd_sampling

from experiments.common import decode_output


def make_path(T, dt, limit, seed, x_range, y_range):
    n = int(T / dt)
    path = np.hstack([
        WhiteSignal(T, high=limit, seed=seed + i).run(T, dt=dt)
        for i in range(2)])[:n]
    for i, (lo_t, hi_t) in enumerate((x_range, y_range)):
        lo, hi = path[:, i].min(), path[:, i].max()
        path[:, i] = ((path[:, i] - lo) / max(hi - lo, 1e-12)
                      * (hi_t - lo_t) + lo_t)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T-explore", type=float, default=100.0)
    ap.add_argument("--T-test", type=float, default=60.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ssp-dim", type=int, default=97)
    ap.add_argument("--n-landmarks", type=int, default=50)
    ap.add_argument("--view-rad", type=float, default=0.2)
    ap.add_argument("--pi-n-neurons", type=int, default=800)
    ap.add_argument("--mem-n-neurons", type=int, default=970)
    ap.add_argument("--circonv-n-neurons", type=int, default=100)
    ap.add_argument("--limit", type=float, default=0.1)
    ap.add_argument("--test-limit", type=float, default=None,
                    help="frequency content of the TEST path (default: "
                         "--limit). Slower test paths make excursions "
                         "into unmapped territory longer, which is what "
                         "separates a half map from the merged one")
    ap.add_argument("--update-thres", type=float, default=0.4)
    ap.add_argument("--shift-rate", type=float, default=0.1)
    ap.add_argument("--voja-lr", type=float, default=1e-4)
    ap.add_argument("--pes-lr", type=float, default=2e-2)
    ap.add_argument("--intercept", type=float, default=0.3)
    ap.add_argument("--recovery-shift-rate", type=float, default=0.3,
                    help="recovery-mode shift rate for --eval-gate "
                         "auto_recovery")
    ap.add_argument("--eval-gate", choices=("reference", "auto_recovery"),
                    default="reference",
                    help="gate mode of the localization-mode agent. "
                         "'auto_recovery' starts ARMED (arm_at_start: the "
                         "map is injected and trusted), so a map whose "
                         "coverage the agent first reaches only after "
                         "drifting re-engages via recovery instead of "
                         "locking out")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke tests)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    dt = 0.001
    radius = 1.0
    n_explore = int(args.T_explore / dt)
    n_test = int(args.T_test / dt)

    # disjoint exploration halves; full-arena test trajectory
    path_A = make_path(args.T_explore, dt, args.limit, args.seed,
                       (-0.9, -0.05), (-0.9, 0.9))[:n_explore]
    path_B = make_path(args.T_explore, dt, args.limit, args.seed + 500,
                       (0.05, 0.9), (-0.9, 0.9))[:n_explore]
    test_limit = args.limit if args.test_limit is None else args.test_limit
    path_T = make_path(args.T_test, dt, test_limit, args.seed + 900,
                       (-0.9, 0.9), (-0.9, 0.9))[:n_test]

    bounds = 1.1 * radius * np.tile(np.array([-1, 1.0]), (2, 1))
    space = HexagonalSSPSpace(2, ssp_dim=args.ssp_dim, seed=args.seed,
                              length_scale=0.2, domain_bounds=bounds)
    d = space.ssp_dim
    obj_locs = 0.9 * radius * 2 * (
        Rd_sampling(args.n_landmarks, 2, seed=args.seed) - 0.5)
    lm_space = sspslam_tpu.SPSpace(args.n_landmarks, d, seed=args.seed)

    # velocity normalization is the ONE model parameter derived from the
    # input data; pin the final velocity row of every agent to the
    # common maximum so all three adapters compute the SAME scale and the
    # three programs build bit-identical models
    def vels_of(path):
        return (1 / dt) * np.diff(path, axis=0, prepend=path[:1])

    all_vels = [vels_of(p) for p in (path_A, path_B, path_T)]
    A = space.phase_matrix
    freqs = [np.abs(A @ v.T).max() for v in all_vels]
    vmax_owner = all_vels[int(np.argmax(freqs))]
    vmax_row = vmax_owner[np.argmax(np.abs(A @ vmax_owner.T).max(axis=0))]
    for v in all_vels:
        v[-1] = vmax_row

    def build_program(path, vels, gate_mode="reference"):
        vec_to_lm = obj_locs[None, :, :] - path[:, None, :]
        (vel_f, scale, in_view_f, _, sp_f, _, vecssp_f) = \
            get_slam_input_functions2(space, lm_space, vels, vec_to_lm,
                                      args.view_rad)
        init = space.encode(path[:1]).flatten()
        with Network(seed=args.seed) as net:
            vel = Node(vel_f)
            init_node = Node(lambda t: init if t < 0.05 else np.zeros(d))
            lm_id = Node(sp_f)
            lm_ssp = Node(vecssp_f)
            in_view = Node(in_view_f)
            slam = SLAMNetwork(
                space, lm_space, args.view_rad, args.n_landmarks,
                args.pi_n_neurons, args.mem_n_neurons,
                args.circonv_n_neurons, update_thres=args.update_thres,
                shift_rate=args.shift_rate,
                voja_learning_rate=args.voja_lr,
                pes_learning_rate=args.pes_lr, intercept=args.intercept,
                vel_scaling_factor=scale, seed=args.seed,
                gate_mode=gate_mode,
                gate_kwargs=({"arm_at_start": True,
                              "recovery_shift_rate":
                                  args.recovery_shift_rate}
                             if gate_mode == "auto_recovery" else None))
            Connection(vel, slam.velocity_input, synapse=None)
            Connection(init_node, slam.pathintegrator.input, synapse=None)
            Connection(lm_id, slam.landmark_id_input, synapse=None)
            Connection(lm_ssp, slam.landmark_vec_ssp, synapse=None)
            Connection(in_view, slam.no_landmark_in_view, synapse=None)
            p = Probe(slam.pathintegrator.output, synapse=0.05)
        return Simulator(net, seed=args.seed), p, scale

    def explore(path, vels, tag):
        t0 = time.time()
        sim, _, scale = build_program(path, vels)
        sim.preload_inputs(len(path))
        sim.run_steps(len(path))
        sim.sync()
        learned = {k: np.asarray(v)
                   for k, v in sim.state["learned"].items()}
        print(f"agent {tag}: explored {len(path)} steps in "
              f"{time.time() - t0:.1f}s (scale {scale:.4f})", flush=True)
        return learned, sim.model.learned_init

    learned_A, init_ref = explore(path_A, all_vels[0], "A")
    learned_B, _ = explore(path_B, all_vels[1], "B")
    assert set(learned_A) == set(learned_B) == set(init_ref)

    def merge(la, lb):
        out = {}
        for k in la:
            base = np.asarray(init_ref[k], np.float32)
            out[k] = base + (la[k] - base) + (lb[k] - base)
        return out

    maps = {
        "merged": merge(learned_A, learned_B),
        "agent_A_only": learned_A,
        "agent_B_only": learned_B,
        "empty": {k: np.asarray(v, np.float32)
                  for k, v in init_ref.items()},
    }

    # localization mode: learning frozen, map injected into the carry
    eval_sim, eval_probe, _ = build_program(path_T, all_vels[2],
                                            gate_mode=args.eval_gate)
    for k in eval_sim.params["hyper"]["lr"]:
        eval_sim.params["hyper"]["lr"][k] = np.float32(0.0)
    # learned slots are keyed by built-connection index, which shifts when
    # the eval gate adds connections; each model has exactly one Voja and
    # one PES slot, so remap by rule prefix
    def by_prefix(keys):
        return {k.split("_")[0]: k for k in keys}
    src_of = by_prefix(init_ref)
    dst_of = by_prefix(eval_sim.model.learned_init)
    assert set(src_of) == set(dst_of) == {"voja", "pes"}

    def remap(learned):
        return {dst_of[p]: learned[src_of[p]] for p in src_of}

    left = path_T[:, 0] < 0
    result = {"T_explore": args.T_explore, "T_test": args.T_test,
              "ssp_dim": d, "n_landmarks": args.n_landmarks,
              "seed": args.seed}
    print(f"\n{'map':14s} {'median':>8s} {'last-q':>8s} "
          f"{'left-half':>10s} {'right-half':>11s}")
    for label, learned in maps.items():
        eval_sim.reset()
        st = eval_sim.model.initial_state()
        st["learned"] = {k: np.asarray(v, np.float32)
                         for k, v in remap(learned).items()}
        eval_sim.state = st
        eval_sim.preload_inputs(n_test)
        eval_sim.run_steps(n_test)
        eval_sim.sync()
        out = np.asarray(eval_sim.data[eval_probe])
        skip = max(1, n_test // 1500)
        est = decode_output(space, out[::skip], 2, grid=100)
        err = np.sqrt(np.sum((path_T[::skip] - est) ** 2, axis=1))
        lmask = left[::skip][:len(err)]
        q = max(1, len(err) // 4)
        row = {
            "median": round(float(np.median(err)), 4),
            "lastq": round(float(np.median(err[-q:])), 4),
            "p90": round(float(np.quantile(err, 0.9)), 4),
            "left_median": round(float(np.median(err[lmask])), 4)
            if lmask.any() else None,
            "right_median": round(float(np.median(err[~lmask])), 4)
            if (~lmask).any() else None,
            # excursion metric: p90 per half — medians hide the drift
            # spikes accumulated while away from the mapped half
            "left_p90": round(float(np.quantile(err[lmask], 0.9)), 4)
            if lmask.any() else None,
            "right_p90": round(float(np.quantile(err[~lmask], 0.9)), 4)
            if (~lmask).any() else None,
        }
        result[label] = row
        print(f"{label:14s} {row['median']:8.3f} {row['lastq']:8.3f} "
              f"{row['left_median']:10.3f} {row['right_median']:11.3f} "
              f"(p90 {row['left_p90']:.3f}/{row['right_p90']:.3f})",
              flush=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
