"""Serving-bundle throughput: the deployment artifact vs the live engine.

The reference stack has no deployment story (every process re-runs network
construction + the nengo build, reference experiments/run_slam.py:171-210);
``nef.export`` ships a compiled StableHLO step + solved params + carry.
This probe measures what a serving worker actually gets: steps/s of
``ServingModel.run`` on the flagship SLAM model — including the per-segment
host->device input upload that a live feed implies — next to the live
Simulator's device-resident-table number from the same process.

Usage:  python experiments/serving_probe.py [--timed-steps 50000]
Prints one JSON line.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(1, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ssp-dim", type=int, default=97)
    ap.add_argument("--pi-n-neurons", type=int, default=800)
    ap.add_argument("--mem-n-neurons", type=int, default=970)
    ap.add_argument("--circonv-n-neurons", type=int, default=100)
    ap.add_argument("--n-landmarks", type=int, default=10)
    ap.add_argument("--cleanup-samples", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--world-T", type=float, default=14.0)
    ap.add_argument("--segment-steps", type=int, default=5000)
    ap.add_argument("--timed-steps", type=int, default=50000)
    ap.add_argument("--scan-unroll", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--keep-bundle", default=None,
                    help="directory to keep the bundle in (default: temp)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from bench import build
    from sspslam_tpu.nef import ServingModel, save_bundle

    import jax
    log(f"devices: {jax.devices()}")
    sim, probe, space, path = build(args)
    seg = args.segment_steps
    n_timed = max(seg, args.timed_steps // seg * seg)

    # live engine numbers (device-resident table, the bench.py protocol)
    sim.preload_inputs(seg + n_timed)
    t0 = time.time()
    sim.run_steps(seg, segment_steps=seg)
    sim.sync()
    log(f"live compile+warmup: {time.time() - t0:.1f}s")
    live_rates = []
    for _ in range(args.reps):
        t0 = time.time()
        sim.run_steps(n_timed, segment_steps=seg)
        sim.sync()
        live_rates.append(n_timed / (time.time() - t0))
        sim._preload_start = sim.n_steps - seg
    live_sps = float(np.median(live_rates))
    log(f"live engine: {live_sps:.0f} steps/s "
        f"(range {min(live_rates):.0f}-{max(live_rates):.0f})")

    # export AFTER the warm run: the bundle ships the learned carry
    out_dir = args.keep_bundle or tempfile.mkdtemp(prefix="sspslam_bundle_")
    t0 = time.time()
    save_bundle(sim, out_dir, segment_steps=seg)
    export_s = time.time() - t0
    bundle_mb = sum(
        os.path.getsize(os.path.join(out_dir, f))
        for f in os.listdir(out_dir)) / 1e6
    log(f"export: {export_s:.1f}s, bundle {bundle_mb:.1f} MB -> {out_dir}")

    m = ServingModel(out_dir)
    # a serving worker feeds host-resident input rows each call — tabulate
    # one timed block's worth (replayed per rep)
    xs = np.asarray(sim._pack_cols(sim._tabulate_inputs(n_timed)),
                    np.float32)[:n_timed]
    t0 = time.time()
    m.run(xs[:seg])
    log(f"serving load+first-call: {time.time() - t0:.1f}s")
    serve_rates = []
    for _ in range(args.reps):
        t0 = time.time()
        out = m.run(xs)
        # m.run's final concatenate is the device->host pull (real barrier)
        serve_rates.append(n_timed / (time.time() - t0))
    serve_sps = float(np.median(serve_rates))
    log(f"serving bundle: {serve_sps:.0f} steps/s "
        f"(range {min(serve_rates):.0f}-{max(serve_rates):.0f})")
    probe_label = next(iter(out))
    assert out[probe_label].shape[0] == n_timed

    if args.keep_bundle is None:
        shutil.rmtree(out_dir, ignore_errors=True)

    print(json.dumps({
        "metric": "AOT serving bundle throughput, flagship SLAM "
                  f"(ssp_dim={args.ssp_dim}, segment={seg}; includes "
                  "per-segment host input upload + probe pull)",
        "value": round(serve_sps, 1), "unit": "steps/s",
        "vs_baseline": None,
        "live_engine_steps_per_s": round(live_sps, 1),
        "serving_over_live": round(serve_sps / live_sps, 3),
        "bundle_mb": round(bundle_mb, 1),
        "export_s": round(export_s, 1),
    }))


if __name__ == "__main__":
    main()
