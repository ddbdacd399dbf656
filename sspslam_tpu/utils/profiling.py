"""Tracing / resource profiling.

The analog of the aux instrumentation the reference exposes (SURVEY.md §5):
wall/thread timing is recorded by the experiment scripts; the Loihi
utilization summary (compartments / axons / synapses per chip,
run_slam.py:212-227) maps here to a model resource summary — neurons,
weight-matrix memory, estimated FLOPs per step, and VMEM-fit analysis —
plus a ``jax.profiler`` trace wrapper for timeline inspection.
"""

from __future__ import annotations

import contextlib
from typing import List

__all__ = ["model_utilization_summary", "print_utilization_summary",
           "trace_run"]

VMEM_BYTES = 16 * 2**20  # ~16 MB/core on current TPUs


def model_utilization_summary(model) -> List[dict]:
    """Per-ensemble-group resource rows for a built Model."""
    rows = []
    conn_by_pre = {}
    for bc in model.connections:
        if bc.decoders is not None:
            conn_by_pre.setdefault(id(bc.pre), []).append(bc)

    for be in model.ensembles:
        n_neurons = be.k * be.n if be.batched else be.n
        enc_bytes = be.scaled_encoders.size * 4
        dec_elems = sum(bc.decoders.size for bc in conn_by_pre.get(id(be), []))
        dec_bytes = dec_elems * 4
        # J matvec + decode matvecs, 2 flops per MAC
        flops = 2 * (be.scaled_encoders.size + dec_elems)
        state_bytes = sum(
            v.size * 4 for v in be.neuron_type.init_state(
                (be.k, be.n) if be.batched else (be.n,)).values())
        rows.append({
            "label": getattr(be.obj, "label", None) or f"ens{be.index}",
            "batched": be.batched,
            "neurons": int(n_neurons),
            "encoder_bytes": int(enc_bytes),
            "decoder_bytes": int(dec_bytes),
            "state_bytes": int(state_bytes),
            "flops_per_step": int(flops),
        })
    return rows


def print_utilization_summary(model, file=None):
    rows = model_utilization_summary(model)
    total_neurons = sum(r["neurons"] for r in rows)
    total_bytes = sum(r["encoder_bytes"] + r["decoder_bytes"]
                      + r["state_bytes"] for r in rows)
    total_flops = sum(r["flops_per_step"] for r in rows)
    print(f"model resources: {len(rows)} ensemble groups, "
          f"{total_neurons} neurons, "
          f"{total_bytes / 2**20:.1f} MiB weights+state "
          f"({100 * total_bytes / VMEM_BYTES:.0f}% of one core's VMEM), "
          f"~{total_flops / 1e6:.2f} MFLOP/step", file=file)
    for r in sorted(rows, key=lambda r: -r["flops_per_step"])[:8]:
        print(f"  {r['label']:<24} {r['neurons']:>7} neurons  "
              f"{(r['encoder_bytes'] + r['decoder_bytes']) / 2**10:>8.0f} KiB  "
              f"{r['flops_per_step'] / 1e3:>8.0f} kFLOP/step", file=file)
    return rows


@contextlib.contextmanager
def trace_run(logdir: str):
    """jax.profiler trace context: ``with trace_run('/tmp/trace'): sim.run(..)``
    then inspect with TensorBoard/XProf."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
