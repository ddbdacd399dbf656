"""Explicit shard_map tensor parallelism for the VCO path integrator.

The automatic path (``Simulator(mesh=...)``) lets GSPMD partition the
generic step.  This module is the hand-laid-out counterpart from SURVEY.md
§5: the (d+1)//2 oscillators are split across the mesh's ``model`` axis —
each device owns its VCOs' neurons, encoders and decoders, and the ONLY
per-step communication is a single ``psum`` of the (1, d) SSP contribution
at the Fourier-reassembly matvec (which rides ICI).  The correction input
and velocity are replicated; the filtered output is identical on every
device after the psum, so no further synchronisation is needed.

Built on the same ``VCOParams`` layout as the Pallas fast path, so the
parameters come from the engine's solver pipeline and results are
cross-checked against the unsharded reference step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.pallas_kernels import VCOParams, VCOState, _lif_step

__all__ = ["pad_vco_params", "make_sharded_vco_scan"]


def _pad_axis(arr, axis, to):
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, to - arr.shape[axis])
    return jnp.asarray(np.pad(np.asarray(arr), pad))


def pad_vco_params(params: VCOParams, n_shards: int) -> VCOParams:
    """Pad the oscillator axis k to a multiple of the mesh size (padded
    oscillators have zero encoders/decoders/bias, so they stay silent)."""
    k = params.bias.shape[1]
    k_pad = ((k + n_shards - 1) // n_shards) * n_shards
    if k_pad == k:
        return params
    rep = {}
    for name in ("enc0", "enc1", "enc2", "bias", "drec0", "drec1", "drec2",
                 "dout0", "dout1", "velT_T", "tf0T", "tf1T", "dc_mask"):
        rep[name] = _pad_axis(getattr(params, name), 1, k_pad)
    for name in ("ts0T", "ts1T"):
        rep[name] = _pad_axis(getattr(params, name), 0, k_pad)
    return params._replace(**rep)


def make_sharded_vco_scan(params: VCOParams, mesh: Mesh, n_steps: int,
                          axis: str = "model"):
    """Build ``fn(state, vel_chunk, corr_chunk) -> (state, ssp_chunk)`` with
    the oscillator axis sharded over ``mesh[axis]`` via shard_map.

    state must be created with :func:`initial_sharded_state` or have its
    k axis padded to the mesh size.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    n_shards = mesh.shape[axis]
    params = pad_vco_params(params, n_shards)
    consts = (params.a_rec, params.b_rec, params.a_out, params.b_out,
              params.tau_rc, params.tau_ref, params.dt)

    # shard specs: oscillator (k) axis split; d/N axes replicated
    kshard2 = P(None, axis)      # (n, k) and (1, k) and (m, k) arrays
    kshard0 = P(axis, None)      # (k, d) reassembly matrices
    rep = P(None, None)

    ARRAY_FIELDS = ("enc0", "enc1", "enc2", "bias", "drec0", "drec1",
                    "drec2", "dout0", "dout1", "velT_T", "tf0T", "tf1T",
                    "ts0T", "ts1T", "dc_mask")
    array_specs = tuple(kshard0 if f in ("ts0T", "ts1T") else kshard2
                        for f in ARRAY_FIELDS)
    state_specs = VCOState(voltage=kshard2, refractory=kshard2,
                           f0=kshard2, f1=kshard2, f2=kshard2, fout=rep)

    a_rec, b_rec, a_out, b_out, tau_rc, tau_ref, dt = consts

    class _P:
        """Local-shard view with attribute access."""

        def __init__(self, arrays):
            for name, arr in zip(ARRAY_FIELDS, arrays):
                setattr(self, name, arr)

    def local_chunk(p_arrays, state: VCOState, vel_chunk, corr_chunk):
        """Runs on each device with its local oscillator shard."""
        p = _P(p_arrays)

        def step(carry, xs):
            volt, refr, f0, f1, f2, fout = carry
            vel_row, corr_row = xs
            x0 = f0 + corr_row @ p.tf0T + p.dc_mask
            x1 = f1 + corr_row @ p.tf1T
            x2 = f2 + vel_row @ p.velT_T
            J = p.enc0 * x0 + p.enc1 * x1 + p.enc2 * x2 + p.bias
            volt, refr, act = _lif_step(volt, refr, J, dt, tau_rc, tau_ref)
            f0 = a_rec * f0 + b_rec * jnp.sum(act * p.drec0, axis=0,
                                              keepdims=True)
            f1 = a_rec * f1 + b_rec * jnp.sum(act * p.drec1, axis=0,
                                              keepdims=True)
            f2 = a_rec * f2 + b_rec * jnp.sum(act * p.drec2, axis=0,
                                              keepdims=True)
            o0 = jnp.sum(act * p.dout0, axis=0, keepdims=True)
            o1 = jnp.sum(act * p.dout1, axis=0, keepdims=True)
            # local partial SSP; THE collective: one psum over the mesh
            ssp_local = o0 @ p.ts0T + o1 @ p.ts1T
            ssp = jax.lax.psum(ssp_local, axis)
            fout = a_out * fout + b_out * ssp
            return (volt, refr, f0, f1, f2, fout), fout

        carry = (state.voltage, state.refractory, state.f0, state.f1,
                 state.f2, state.fout)
        carry, outs = jax.lax.scan(step, carry,
                                   (vel_chunk, corr_chunk),
                                   length=n_steps, unroll=4)
        volt, refr, f0, f1, f2, fout = carry
        return VCOState(volt, refr, f0, f1, f2, fout), outs[:, 0, :]

    try:  # jax.shard_map (new API) dropped check_rep
        sharded = shard_map(
            local_chunk, mesh=mesh,
            in_specs=(array_specs, state_specs, rep, rep),
            out_specs=(state_specs, P(None, None)))
    except TypeError:  # pragma: no cover - legacy API
        sharded = shard_map(
            local_chunk, mesh=mesh,
            in_specs=(array_specs, state_specs, rep, rep),
            out_specs=(state_specs, P(None, None)), check_rep=False)

    dev_params = tuple(
        jax.device_put(jnp.asarray(getattr(params, f), jnp.float32),
                       NamedSharding(mesh, spec))
        for f, spec in zip(ARRAY_FIELDS, array_specs))

    @jax.jit
    def run(state: VCOState, vel_chunk, corr_chunk):
        return sharded(dev_params, state,
                       jnp.asarray(vel_chunk, jnp.float32),
                       jnp.asarray(corr_chunk, jnp.float32))

    def initial_state() -> VCOState:
        n, k = params.bias.shape
        d = params.ts0T.shape[1]
        f32 = jnp.float32
        sh2 = NamedSharding(mesh, kshard2)
        shr = NamedSharding(mesh, rep)
        return VCOState(
            voltage=jax.device_put(jnp.zeros((n, k), f32), sh2),
            refractory=jax.device_put(jnp.zeros((n, k), f32), sh2),
            f0=jax.device_put(jnp.zeros((1, k), f32), sh2),
            f1=jax.device_put(jnp.zeros((1, k), f32), sh2),
            f2=jax.device_put(jnp.zeros((1, k), f32), sh2),
            fout=jax.device_put(jnp.zeros((1, d), f32), shr),
        )

    run.initial_state = initial_state
    run.padded_params = params
    return run
