"""Path-integration run + animated GIF: similarity heatmap over the domain,
VCO phase portraits, and spike rasters — capability parity with reference
experiments/run_pathint_gif.py."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(1, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.common import (DT, add_common_args, force_cpu_backend,
                                make_path, make_space, normalize_backend)

from sspslam_tpu.models import PathIntegration
from sspslam_tpu.nef import (Connection, LIF, Network, Node, Probe, Simulator)
from sspslam_tpu.utils.spikes import cluster, sample_by_variance


def main():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    add_common_args(parser, default_T=10.0)
    parser.add_argument("--pi-n-neurons", default=500, type=int)
    parser.add_argument("--n-frames", default=60, type=int)
    parser.add_argument("--n-grid", default=50, type=int,
                        help="similarity heatmap resolution")
    parser.add_argument("--out", default="figures/pathint.gif")
    args = parser.parse_args()
    backend = normalize_backend(args.backend)
    if backend == "cpu":
        force_cpu_backend()

    dt = DT
    radius = 1.0
    path, vels, T, domain_dim = make_path(args, radius=radius,
                                          max_steps=49999)
    assert domain_dim == 2, "the GIF renders a 2-D domain"
    ssp_space = make_space(args, domain_dim, radius=radius)
    d = ssp_space.ssp_dim
    real_ssp = ssp_space.encode(path)
    scale_fac = 1 / np.max(np.abs(ssp_space.phase_matrix @ vels.T))
    vels_scaled = vels * scale_fac
    pathlen = path.shape[0]

    sample_every = T / args.n_frames
    with Network(seed=args.seed) as model:
        vel_input = Node(lambda t: vels_scaled[min(int((t - dt) / dt),
                                                   pathlen - 1)])
        init_state = Node(lambda t: real_ssp[0] if t < 0.05 else np.zeros(d))
        pi = PathIntegration(ssp_space, args.pi_n_neurons, 0.05,
                             scaling_factor=scale_fac, stable=True,
                             neuron_type=LIF())
        Connection(vel_input, pi.velocity_input, synapse=None)
        Connection(init_state, pi.input, synapse=None)
        out_p = Probe(pi.output, synapse=0.05, sample_every=sample_every)
        osc_p = Probe(pi.oscillators.output, synapse=0.05,
                      sample_every=sample_every)
        spike_p = Probe(pi.oscillators.neurons, sample_every=dt * 5)

    sim = Simulator(model, seed=args.seed, progress=True)
    sim.run(T)

    out = sim.data[out_p]
    osc = sim.data[osc_p]
    spikes = sim.data[spike_p].reshape(sim.data[spike_p].shape[0], -1)
    frame_ts = sample_every * np.arange(1, out.shape[0] + 1)

    # similarity heatmap grid
    xs = np.linspace(-radius, radius, args.n_grid)
    X, Y = np.meshgrid(xs, xs)
    grid_ssps = ssp_space.encode(np.stack([X.reshape(-1),
                                           Y.reshape(-1)], axis=1))

    # raster preprocessing: most variable 200 neurons, clustered
    sp_t = dt * 5 * np.arange(1, spikes.shape[0] + 1)
    _, sp = sample_by_variance(sp_t, spikes, 200, filter_width=0.02)
    _, sp = cluster(sp_t, sp, filter_width=0.02)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation, PillowWriter

    fig, axes = plt.subplots(1, 3, figsize=(10, 3.2))
    sims0 = (grid_ssps @ out[0]).reshape(args.n_grid, args.n_grid)
    im = axes[0].imshow(sims0, origin="lower",
                        extent=[-radius, radius, -radius, radius],
                        cmap="viridis", vmin=-0.2, vmax=1.0)
    (true_pt,) = axes[0].plot([], [], "r+", ms=10)
    axes[0].set_title("similarity map")

    n_show = min(3, len(pi.oscillators.ea_ensembles) - 1)
    phase_lines = []
    for j in range(n_show):
        (ln,) = axes[1].plot([], [], lw=1)
        phase_lines.append(ln)
    axes[1].set_xlim(-1.2, 1.2); axes[1].set_ylim(-1.2, 1.2)
    axes[1].set_title("VCO phase portraits")
    axes[1].set_aspect("equal")

    raster = axes[2]
    raster.set_title("spikes")
    raster_img = raster.imshow(np.zeros((sp.shape[1], 10)), aspect="auto",
                               origin="lower", cmap="Greys",
                               extent=[0, 1, 0, sp.shape[1]])

    steps_per_frame = max(1, int(round(sample_every / dt)))

    def update(f):
        sims = (grid_ssps @ out[f]).reshape(args.n_grid, args.n_grid)
        im.set_data(sims)
        k = min((f + 1) * steps_per_frame, pathlen) - 1
        true_pt.set_data([path[k, 0]], [path[k, 1]])
        for j, ln in enumerate(phase_lines):
            ln.set_data(osc[: f + 1, 3 * (j + 1)], osc[: f + 1, 3 * (j + 1) + 1])
        sp_k = int((f + 1) / out.shape[0] * sp.shape[0])
        window = sp[max(0, sp_k - 200): sp_k].T
        if window.size:
            raster_img.set_data(window > 0)
            raster_img.set_extent([0, window.shape[1], 0, window.shape[0]])
        return [im, true_pt, *phase_lines, raster_img]

    anim = FuncAnimation(fig, update, frames=out.shape[0], blit=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    anim.save(args.out, writer=PillowWriter(fps=8))
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
