"""SLAM run + animated GIF of the posterior similarity heatmap and the
learned landmark map over time, reconstructed from periodically-probed PES
decoders and Voja encoders — capability parity with reference
experiments/run_slam_map_gif.py."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(1, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.common import (DT, add_common_args, force_cpu_backend,
                                make_path, make_space, normalize_backend)

import sspslam_tpu
from sspslam_tpu.models import SLAMNetwork, get_slam_input_functions
from sspslam_tpu.nef import Connection, Network, Node, Probe, Simulator
from sspslam_tpu.utils import Rd_sampling


def main():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    add_common_args(parser, default_T=60.0)
    parser.add_argument("--n-landmarks", default=6, type=int)
    parser.add_argument("--view-rad", default=0.4, type=float)
    parser.add_argument("--pi-n-neurons", default=500, type=int)
    parser.add_argument("--mem-n-neurons", default=600, type=int)
    parser.add_argument("--circonv-n-neurons", default=70, type=int)
    parser.add_argument("--n-frames", default=40, type=int)
    parser.add_argument("--n-grid", default=40, type=int)
    parser.add_argument("--out", default="figures/slam_map.gif")
    args = parser.parse_args()
    backend = normalize_backend(args.backend)
    if backend == "cpu":
        force_cpu_backend()

    dt = DT
    radius = 1.0
    path, vels, T, domain_dim = make_path(args, radius=radius,
                                          max_steps=99999)
    pathlen = path.shape[0]
    obj_locs = 0.9 * radius * 2 * (
        Rd_sampling(args.n_landmarks, domain_dim, seed=args.seed) - 0.5)
    vec_to_landmarks = obj_locs[None, :, :] - path[:, None, :]
    ssp_space = make_space(args, domain_dim, radius=radius)
    d = ssp_space.ssp_dim
    real_ssp = ssp_space.encode(path)
    lm_space = sspslam_tpu.SPSpace(args.n_landmarks, d, seed=args.seed)

    (velocity_func, vel_scaling_factor, is_landmark_in_view, _,
     landmark_sp_func, _, landmark_vecssp_func) = get_slam_input_functions(
        ssp_space, lm_space, vels, vec_to_landmarks, args.view_rad)

    frame_every = T / args.n_frames
    with Network(seed=args.seed) as model:
        vel_input = Node(velocity_func)
        init_state = Node(lambda t: real_ssp[0] if t < 0.05 else np.zeros(d))
        landmark_vec = Node(landmark_vecssp_func)
        landmark_id = Node(landmark_sp_func)
        is_landmark = Node(is_landmark_in_view)
        slam = SLAMNetwork(ssp_space, lm_space, args.view_rad,
                           args.n_landmarks, args.pi_n_neurons,
                           args.mem_n_neurons, args.circonv_n_neurons,
                           vel_scaling_factor=vel_scaling_factor,
                           voja_learning_rate=1e-4, pes_learning_rate=5e-3,
                           intercept=0.1, seed=args.seed)
        Connection(vel_input, slam.velocity_input, synapse=None)
        Connection(init_state, slam.pathintegrator.input, synapse=None)
        Connection(landmark_vec, slam.landmark_vec_ssp, synapse=None)
        Connection(landmark_id, slam.landmark_id_input, synapse=None)
        Connection(is_landmark, slam.no_landmark_in_view, synapse=None)
        out_p = Probe(slam.pathintegrator.output, synapse=0.05,
                      sample_every=frame_every)
        weights_p = Probe(slam.assomemory.conn_out, attr="weights",
                          sample_every=frame_every)
        enc_p = Probe(slam.assomemory.conn_in.learning_rule,
                      attr="scaled_encoders", sample_every=frame_every)

    sim = Simulator(model, seed=args.seed, progress=True)
    sim.run(T)
    out = sim.data[out_p]
    weights = sim.data[weights_p]       # (F, d, n)
    encs = sim.data[enc_p]              # (F, n, d)
    n_frames = min(out.shape[0], weights.shape[0], encs.shape[0])

    be = next(b for b in sim.model.ensembles
              if b.obj is slam.assomemory.memory)
    xs = np.linspace(-radius, radius, args.n_grid)
    X, Y = np.meshgrid(xs, xs)
    grid_ssps = ssp_space.encode(np.stack([X.reshape(-1),
                                           Y.reshape(-1)], axis=1))

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation, PillowWriter

    fig, axes = plt.subplots(1, 2, figsize=(8, 3.6))
    im0 = axes[0].imshow(np.zeros((args.n_grid, args.n_grid)),
                         origin="lower",
                         extent=[-radius, radius, -radius, radius],
                         cmap="viridis", vmin=-0.2, vmax=1.0)
    (true_pt,) = axes[0].plot([], [], "r+", ms=10)
    axes[0].set_title("position posterior")
    im1 = axes[1].imshow(np.zeros((args.n_grid, args.n_grid)),
                         origin="lower",
                         extent=[-radius, radius, -radius, radius],
                         cmap="magma", vmin=-0.2, vmax=1.0)
    axes[1].scatter(obj_locs[:, 0], obj_locs[:, 1], c="cyan", marker="x")
    axes[1].set_title("learned landmark map (max over landmarks)")

    steps_per_frame = max(1, int(round(frame_every / dt)))

    def update(f):
        sims = (grid_ssps @ out[f]).reshape(args.n_grid, args.n_grid)
        im0.set_data(sims)
        k = min((f + 1) * steps_per_frame, pathlen) - 1
        true_pt.set_data([path[k, 0]], [path[k, 1]])
        # decode the learned map at this frame: activities on landmark SPs
        J = lm_space.vectors @ encs[f].T + be.bias
        acts = be.neuron_type.rates_np(J)
        lm_ssps = acts @ weights[f].T            # (L, d)
        lm_maps = grid_ssps @ lm_ssps.T          # (G, L)
        norm = np.maximum(np.linalg.norm(lm_ssps, axis=1), 1e-6)
        im1.set_data((lm_maps / norm).max(axis=1).reshape(args.n_grid,
                                                          args.n_grid))
        return [im0, im1, true_pt]

    anim = FuncAnimation(fig, update, frames=n_frames, blit=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    anim.save(args.out, writer=PillowWriter(fps=6))
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
