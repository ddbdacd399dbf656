"""Multi-chip execution: mesh construction and carry/param shardings.

The reference's only multi-device story is Loihi's 15-chip place-and-route
(run_slam.py:205-210).  The TPU-native counterpart (SURVEY.md §5) shards the
*model state itself* over an ICI mesh with GSPMD:

* the (d+1)//2 independent VCOs of the path integrator — a tensor-parallel
  axis needing communication only at the d-wide Fourier reassembly matvec
  (an all-reduce XLA inserts automatically);
* neuron axes of large single ensembles (memory / OVC / error populations)
  — decoded outputs are psum-reductions over neuron shards;
* learned PES/Voja weight matrices along their neuron axis (the outer-product
  updates are local to each shard);
* an optional data axis vmapping independent trials (multi-seed episodes,
  the reference's statistical harness) across chips.

Everything goes through ``jax.sharding`` + jit: we annotate the carry, XLA
inserts the collectives and partitions the einsums.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nef.builder import Model

__all__ = ["make_mesh", "state_shardings", "shard_state", "replicated"]


def make_mesh(n_devices: Optional[int] = None, axis_names=("model",),
              shape=None) -> Mesh:
    """Build a device mesh. Default: 1-D 'model' axis over all devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = np.asarray(devs[:n_devices])
    if shape is None:
        shape = (n_devices,)
    return Mesh(devs.reshape(shape), axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _shard_leading(mesh: Mesh, axis: str, ndim: int, size0: int,
                   min_size: int = 2, size1: int = 0) -> NamedSharding:
    """Shard the leading axis over ``axis`` when it is worth it, falling
    back to axis 1 (e.g. the NEURON axis of a small-k fused-singles group
    like the k=3 memory/error/recall trio, whose n is mesh-padded).

    device_put requires divisibility; axes divisible by neither stay
    replicated at rest (GSPMD still partitions the einsums inside jit)."""
    n = mesh.shape[axis]
    if size0 >= max(n, min_size) and size0 % n == 0:
        spec = [axis] + [None] * (ndim - 1)
        return NamedSharding(mesh, P(*spec))
    if ndim >= 2 and size1 >= max(n, min_size) and size1 % n == 0:
        spec = [None, axis] + [None] * (ndim - 2)
        return NamedSharding(mesh, P(*spec))
    return replicated(mesh)


def state_shardings(model: Model, mesh: Mesh, axis: str = "model"):
    """Sharding pytree matching ``model.initial_state()``.

    Batched ensemble groups (EnsembleArrays — the VCO bank, the circular-
    convolution product arrays) shard over their element axis; large single
    ensembles shard over neurons; learned weights shard over their neuron
    axis; small filters replicate."""
    neurons = []
    for be in model.ensembles:
        spec = {}
        proto = be.neuron_type.init_state((be.k, be.n) if be.batched else (be.n,))
        for key, val in proto.items():
            spec[key] = _shard_leading(
                mesh, axis, val.ndim,
                val.shape[0] if val.ndim else 1,
                size1=val.shape[1] if val.ndim >= 2 else 0)
        neurons.append(spec)

    filters = []
    for shape, _a, _b in model.filter_specs:
        if len(shape) >= 2:
            filters.append(_shard_leading(mesh, axis, len(shape), shape[0],
                                          size1=shape[1]))
        elif len(shape) == 1 and shape[0] >= 4 * mesh.shape[axis]:
            filters.append(_shard_leading(mesh, axis, 1, shape[0]))
        else:
            filters.append(replicated(mesh))

    learned = {}
    for key, val in model.learned_init.items():
        learned[key] = _shard_leading(mesh, axis, np.ndim(val),
                                      np.shape(val)[0])

    return {
        "step": replicated(mesh),
        "neurons": neurons,
        "filters": filters,
        "learned": learned,
        # stateful-node scratch (latches/timers): tiny, replicate
        "nodes": {k: replicated(mesh)
                  for k in model.node_state_init},
    }


def shard_state(model: Model, state, mesh: Mesh, axis: str = "model"):
    """device_put the carry according to :func:`state_shardings`."""
    shardings = state_shardings(model, mesh, axis)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)


def params_shardings(params, mesh: Mesh, axis: str = "model"):
    """Shardings for the traced parameter pytree: replicated, EXCEPT large
    hoisted 2-D banks (the clean-up sample bank under
    SSPSLAM_HOIST_CLEANUP=1) which shard over rows — the similarity matvec
    then partitions instead of replicating ~2 MFLOP/step on every device.
    """
    rep = replicated(mesh)
    sh = jax.tree_util.tree_map(lambda _: rep, params)
    n = mesh.shape[axis]
    for key, d in params.get("hoisted", {}).items():
        for k2, v in d.items():
            if (np.ndim(v) == 2 and np.shape(v)[0] >= n
                    and np.shape(v)[0] % n == 0):
                sh["hoisted"][key][k2] = NamedSharding(mesh, P(axis, None))
    return sh
