"""Pallas TPU kernels: the fused multi-step path-integrator hot loop.

The generic executor runs one XLA loop iteration per dt; for the
path-integration workload (the reference's headline benchmark,
run_pathint.py) the entire model state — VCO voltages/refractory, encoder/
decoder slabs, synapse filters — fits comfortably in VMEM (~5 MB at the
reference scale k=49 oscillators x n=800 neurons).  This kernel keeps it all
resident and integrates a CHUNK of timesteps per launch; only the velocity/
correction tables and the per-step SSP output touch memory outside the core.

Layout notes (Mosaic constraints): every array is 2-D; neuron slabs are
(n, k) — neurons on sublanes, oscillators on lanes — so per-oscillator
signals are (1, k) row vectors, currents broadcast along sublanes,
population decodes are sublane reductions, and all projections are
(1, m) @ (m, l) row-vector matmuls.  No transposes or interleaving reshapes
appear inside the loop (Mosaic cannot lower those), and expm1/log1p use
their exp/log forms.

Numerics match the generic executor's PathIntegration step exactly (same
parameter arrays, same update order); cross-checked in tests/test_pallas.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["VCOParams", "VCOState", "make_vco_scan",
           "pad_vco_params_to_lanes", "vco_reference_step"]

F32 = jnp.float32


class VCOParams(NamedTuple):
    """Static per-model parameters (all float32, all 2-D).

    enc0/1/2 : (n, k) scaled encoders per state component
    bias : (n, k)
    drec0/1/2 : (n, k) recurrent decoders (DC oscillator column zeroed)
    dout0/1 : (n, k) output (identity) decoders, Re/Im components
    velT_T : (N, k) velocity -> per-VCO frequency projection
    tf0T/tf1T : (d, k) SSP-correction -> per-VCO Re/Im projection
    ts0T/ts1T : (k, d) per-VCO Re/Im -> SSP reconstruction
    dc_mask : (1, k) one-hot on the DC oscillator (its [1,0,0] pin)
    """
    enc0: jax.Array
    enc1: jax.Array
    enc2: jax.Array
    bias: jax.Array
    drec0: jax.Array
    drec1: jax.Array
    drec2: jax.Array
    dout0: jax.Array
    dout1: jax.Array
    velT_T: jax.Array
    tf0T: jax.Array
    tf1T: jax.Array
    ts0T: jax.Array
    ts1T: jax.Array
    dc_mask: jax.Array
    a_rec: float
    b_rec: float
    a_out: float
    b_out: float
    tau_rc: float
    tau_ref: float
    dt: float


class VCOState(NamedTuple):
    voltage: jax.Array      # (n, k)
    refractory: jax.Array   # (n, k)
    f0: jax.Array           # (1, k) filtered recurrent Re
    f1: jax.Array           # (1, k) filtered recurrent Im
    f2: jax.Array           # (1, k) filtered recurrent freq
    fout: jax.Array         # (1, d) filtered output SSP


_N_PARAM_INPUTS = 15


def _lif_step(voltage, refractory, J, dt, tau_rc, tau_ref):
    refractory = refractory - dt
    delta_t = jnp.clip(dt - refractory, 0.0, dt)
    voltage = voltage + (J - voltage) * (1.0 - jnp.exp(-delta_t / tau_rc))
    spiked = voltage > 1.0
    denom = jnp.where(spiked, jnp.maximum(J - 1.0, 1e-12), 1.0)
    overshoot = jnp.clip((voltage - 1.0) / denom, 0.0, 1.0 - 1e-6)
    t_spike = dt + tau_rc * jnp.log(1.0 - overshoot)
    out = jnp.where(spiked, 1.0 / dt, 0.0)
    voltage = jnp.where(spiked, 0.0, jnp.maximum(voltage, 0.0))
    refractory = jnp.where(spiked, tau_ref + t_spike, refractory)
    return voltage, refractory, out


def _vco_step(p_arrays, consts, frec, volt, refr, fout, vel_row, corr_row,
              packed=None):
    """One dt of the VCO bank in (n, k)/(1, k) layout; shared between the
    Pallas kernel and the jnp reference.

    ``packed``: optional (ones_row (1, n), D5 (n, 5*kp), kp) for the MXU
    decode path — the five population decodes become ONE elementwise
    multiply + ONE (1, n) @ (n, 5*kp) matmul on the systolic array instead
    of five VPU-serial sublane reductions (the round-1 bottleneck)."""
    (enc0, enc1, enc2, bias, drec0, drec1, drec2, dout0, dout1,
     velT_T, tf0T, tf1T, ts0T, ts1T, dc_mask) = p_arrays
    a_rec, b_rec, a_out, b_out, tau_rc, tau_ref, dt = consts
    f0, f1, f2 = frec

    x0 = f0 + jnp.dot(corr_row, tf0T, preferred_element_type=F32) + dc_mask
    x1 = f1 + jnp.dot(corr_row, tf1T, preferred_element_type=F32)
    x2 = f2 + jnp.dot(vel_row, velT_T, preferred_element_type=F32)

    J = enc0 * x0 + enc1 * x1 + enc2 * x2 + bias   # (n,k) * (1,k) broadcast
    volt, refr, act = _lif_step(volt, refr, J, dt, tau_rc, tau_ref)

    if packed is not None:
        ones_row, D5, kp = packed
        k = drec0.shape[1]
        act5 = jnp.concatenate([act] * 5, axis=1)          # (n, 5*kp)
        red = jnp.dot(ones_row, act5 * D5,
                      preferred_element_type=F32)          # (1, 5*kp)
        r0 = red[:, 0 * kp:0 * kp + k]
        r1 = red[:, 1 * kp:1 * kp + k]
        r2 = red[:, 2 * kp:2 * kp + k]
        o0 = red[:, 3 * kp:3 * kp + k]
        o1 = red[:, 4 * kp:4 * kp + k]
        f0 = a_rec * f0 + b_rec * r0
        f1 = a_rec * f1 + b_rec * r1
        f2 = a_rec * f2 + b_rec * r2
    else:
        f0 = a_rec * f0 + b_rec * jnp.sum(act * drec0, axis=0, keepdims=True)
        f1 = a_rec * f1 + b_rec * jnp.sum(act * drec1, axis=0, keepdims=True)
        f2 = a_rec * f2 + b_rec * jnp.sum(act * drec2, axis=0, keepdims=True)
        o0 = jnp.sum(act * dout0, axis=0, keepdims=True)   # (1, k)
        o1 = jnp.sum(act * dout1, axis=0, keepdims=True)
    ssp = (jnp.dot(o0, ts0T, preferred_element_type=F32)
           + jnp.dot(o1, ts1T, preferred_element_type=F32))  # (1, d)
    fout = a_out * fout + b_out * ssp
    return (f0, f1, f2), volt, refr, fout


def _chunk_body(consts, n_steps: int, mxu_decode: bool, *refs):
    if mxu_decode:
        (enc0_r, enc1_r, enc2_r, bias_r, drec0_r, drec1_r, drec2_r,
         dout0_r, dout1_r, velTT_r, tf0T_r, tf1T_r, ts0T_r, ts1T_r, dcm_r,
         ones_r, d5_r,
         vel_ref, inp_ref, volt_ref, refr_ref, f0_ref, f1_ref, f2_ref,
         fout_ref, out_ref, volt_o, refr_o, f0_o, f1_o, f2_o, fout_o) = refs
        packed = (ones_r[:], d5_r[:], dcm_r.shape[1])
    else:
        (enc0_r, enc1_r, enc2_r, bias_r, drec0_r, drec1_r, drec2_r,
         dout0_r, dout1_r, velTT_r, tf0T_r, tf1T_r, ts0T_r, ts1T_r, dcm_r,
         vel_ref, inp_ref, volt_ref, refr_ref, f0_ref, f1_ref, f2_ref,
         fout_ref, out_ref, volt_o, refr_o, f0_o, f1_o, f2_o, fout_o) = refs
        packed = None
    p_arrays = (enc0_r[:], enc1_r[:], enc2_r[:], bias_r[:], drec0_r[:],
                drec1_r[:], drec2_r[:], dout0_r[:], dout1_r[:], velTT_r[:],
                tf0T_r[:], tf1T_r[:], ts0T_r[:], ts1T_r[:], dcm_r[:])

    def step(i, carry):
        frec, volt, refr, fout = carry
        vel_row = vel_ref[pl.ds(i, 1), :]     # (1, N)
        corr_row = inp_ref[pl.ds(i, 1), :]    # (1, d)
        frec, volt, refr, fout = _vco_step(p_arrays, consts, frec, volt,
                                           refr, fout, vel_row, corr_row,
                                           packed=packed)
        out_ref[pl.ds(i, 1), :] = fout
        return frec, volt, refr, fout

    carry = ((f0_ref[:], f1_ref[:], f2_ref[:]), volt_ref[:], refr_ref[:],
             fout_ref[:])
    # Pallas TPU fori_loop only lowers unroll=1 (or full unrolling, which
    # explodes compile time at n_steps=1000); keep the rolled loop.
    (f0, f1, f2), volt, refr, fout = jax.lax.fori_loop(0, n_steps, step,
                                                       carry)
    volt_o[:] = volt
    refr_o[:] = refr
    f0_o[:] = f0
    f1_o[:] = f1
    f2_o[:] = f2
    fout_o[:] = fout


def make_vco_scan(params: VCOParams, n_steps: int, interpret: bool = False,
                  mxu_decode: bool = False):
    """Build ``fn(state, vel_chunk, input_chunk) -> (state, ssp_out_chunk)``
    running ``n_steps`` dt-steps per kernel launch.

    ``mxu_decode``: pack the five recurrent/output decoders into one
    (n, 5*k) slab and do all population decodes as a single MXU matmul per
    step; requires the oscillator axis k to be a multiple of the 128-lane
    tile (pad with :func:`pad_vco_params_to_lanes`)."""
    n, k = params.bias.shape
    d = params.ts0T.shape[1]
    if mxu_decode:
        assert k % 128 == 0, "mxu_decode requires lane-aligned k (pad to 128)"
        ones_row = jnp.ones((1, n), F32)
        D5 = jnp.concatenate([params.drec0, params.drec1, params.drec2,
                              params.dout0, params.dout1], axis=1)  # (n, 5k)
        extra = (ones_row, D5)
    else:
        extra = ()

    consts = (params.a_rec, params.b_rec, params.a_out, params.b_out,
              params.tau_rc, params.tau_ref, params.dt)
    kernel = functools.partial(_chunk_body, consts, n_steps, mxu_decode)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    n_inputs = _N_PARAM_INPUTS + len(extra) + 2 + 6  # params + tables + state

    @jax.jit
    def run(state: VCOState, vel_chunk, input_chunk):
        out_shapes = (
            jax.ShapeDtypeStruct((n_steps, d), F32),   # ssp trace
            jax.ShapeDtypeStruct((n, k), F32),         # voltage
            jax.ShapeDtypeStruct((n, k), F32),         # refractory
            jax.ShapeDtypeStruct((1, k), F32),         # f0
            jax.ShapeDtypeStruct((1, k), F32),         # f1
            jax.ShapeDtypeStruct((1, k), F32),         # f2
            jax.ShapeDtypeStruct((1, d), F32),         # fout
        )
        out, volt, refr, f0, f1, f2, fout = pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=[vmem()] * n_inputs,
            out_specs=tuple([vmem()] * 7),
            interpret=interpret,
        )(params.enc0, params.enc1, params.enc2, params.bias,
          params.drec0, params.drec1, params.drec2,
          params.dout0, params.dout1,
          params.velT_T, params.tf0T, params.tf1T, params.ts0T, params.ts1T,
          params.dc_mask, *extra,
          vel_chunk.astype(F32), input_chunk.astype(F32),
          state.voltage, state.refractory, state.f0, state.f1, state.f2,
          state.fout)
        return VCOState(volt, refr, f0, f1, f2, fout), out

    return run


def _chunk_body_v2(consts, n_steps: int, kp: int, *refs):
    """Hoisted-projection kernel: the per-step loop contains ONE matmul (the
    packed population decode); input projections are batched (T, d) matmuls
    BEFORE the loop and the SSP output projection happens after the kernel
    (linear filter and linear projection commute).  This removes the chain
    of latency-bound (1, d) row matmuls that dominated the v1 kernel."""
    (enc0_r, enc1_r, enc2_r, bias_r, dcm_r, tf01T_r, velTT_r,
     ones_r, d5_r,
     vel_ref, inp_ref, volt_ref, refr_ref, f0_ref, f1_ref, f2_ref,
     fo2_ref,
     out_ref, volt_o, refr_o, f0_o, f1_o, f2_o, fo2_o,
     xc_ref, xv_ref) = refs
    a_rec, b_rec, a_out, b_out, tau_rc, tau_ref, dt = consts
    enc0, enc1, enc2, bias = enc0_r[:], enc1_r[:], enc2_r[:], bias_r[:]
    dc_mask = dcm_r[:]
    ones_row, D5 = ones_r[:], d5_r[:]

    # whole-chunk input projections: two matmuls total, not 3 per step
    # (into VMEM scratch — Mosaic only dynamic-slices refs, not values)
    xc_ref[:] = jnp.dot(inp_ref[:], tf01T_r[:],
                        preferred_element_type=F32)   # (T, 2kp)
    xv_ref[:] = jnp.dot(vel_ref[:], velTT_r[:],
                        preferred_element_type=F32)   # (T, kp)

    def step(i, carry):
        f0, f1, f2, volt, refr, fo2 = carry
        xc = xc_ref[pl.ds(i, 1), :]
        x0 = f0 + xc[:, :kp] + dc_mask
        x1 = f1 + xc[:, kp:]
        x2 = f2 + xv_ref[pl.ds(i, 1), :]
        J = enc0 * x0 + enc1 * x1 + enc2 * x2 + bias
        volt, refr, act = _lif_step(volt, refr, J, dt, tau_rc, tau_ref)
        act5 = jnp.concatenate([act] * 5, axis=1)           # (n, 5kp)
        red = jnp.dot(ones_row, act5 * D5,
                      preferred_element_type=F32)           # (1, 5kp)
        f0 = a_rec * f0 + b_rec * red[:, 0 * kp:1 * kp]
        f1 = a_rec * f1 + b_rec * red[:, 1 * kp:2 * kp]
        f2 = a_rec * f2 + b_rec * red[:, 2 * kp:3 * kp]
        fo2 = a_out * fo2 + b_out * red[:, 3 * kp:5 * kp]   # filtered o rows
        out_ref[pl.ds(i, 1), :] = fo2
        return f0, f1, f2, volt, refr, fo2

    carry = (f0_ref[:], f1_ref[:], f2_ref[:], volt_ref[:], refr_ref[:],
             fo2_ref[:])
    f0, f1, f2, volt, refr, fo2 = jax.lax.fori_loop(0, n_steps, step, carry)
    volt_o[:] = volt
    refr_o[:] = refr
    f0_o[:] = f0
    f1_o[:] = f1
    f2_o[:] = f2
    fo2_o[:] = fo2


def make_vco_scan_v2(params: VCOParams, n_steps: int,
                     interpret: bool = False):
    """Hoisted-projection variant of :func:`make_vco_scan` (one in-loop
    matmul).  ``params`` must be lane-padded (pad_vco_params_to_lanes).
    State: ``fout`` holds the FILTERED (1, 2*kp) decode rows; the SSP
    projection happens outside the kernel."""
    n, kp = params.bias.shape
    assert kp % 128 == 0, "v2 kernel requires lane-aligned k"
    d = params.ts0T.shape[1]
    consts = (params.a_rec, params.b_rec, params.a_out, params.b_out,
              params.tau_rc, params.tau_ref, params.dt)
    ones_row = jnp.ones((1, n), F32)
    D5 = jnp.concatenate([params.drec0, params.drec1, params.drec2,
                          params.dout0, params.dout1], axis=1)  # (n, 5kp)
    tf01T = jnp.concatenate([params.tf0T, params.tf1T], axis=1)  # (d, 2kp)
    TS = jnp.concatenate([params.ts0T, params.ts1T], axis=0)     # (2kp, d)

    kernel = functools.partial(_chunk_body_v2, consts, n_steps, kp)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    n_inputs = 9 + 2 + 6   # params + tables + state

    @jax.jit
    def run(state: VCOState, vel_chunk, input_chunk):
        out_shapes = (
            jax.ShapeDtypeStruct((n_steps, 2 * kp), F32),  # filtered o rows
            jax.ShapeDtypeStruct((n, kp), F32),            # voltage
            jax.ShapeDtypeStruct((n, kp), F32),            # refractory
            jax.ShapeDtypeStruct((1, kp), F32),            # f0
            jax.ShapeDtypeStruct((1, kp), F32),            # f1
            jax.ShapeDtypeStruct((1, kp), F32),            # f2
            jax.ShapeDtypeStruct((1, 2 * kp), F32),        # fo2
        )
        orows, volt, refr, f0, f1, f2, fo2 = pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=[vmem()] * n_inputs,
            out_specs=tuple([vmem()] * 7),
            scratch_shapes=[pltpu.VMEM((n_steps, 2 * kp), F32),
                            pltpu.VMEM((n_steps, kp), F32)],
            interpret=interpret,
        )(params.enc0, params.enc1, params.enc2, params.bias,
          params.dc_mask, tf01T, params.velT_T, ones_row, D5,
          vel_chunk.astype(F32), input_chunk.astype(F32),
          state.voltage, state.refractory, state.f0, state.f1, state.f2,
          state.fout)
        ssp = orows @ TS    # (T, d): filter-then-project == project-then-filter
        return VCOState(volt, refr, f0, f1, f2, fo2), ssp

    return run


def pad_vco_params_to_lanes(params: VCOParams, lanes: int = 128) -> VCOParams:
    """Zero-pad the oscillator axis k up to a multiple of the 128-lane TPU
    tile (padded oscillators have zero encoders/bias/decoders: silent)."""
    import numpy as np
    k = params.bias.shape[1]
    kp = ((k + lanes - 1) // lanes) * lanes
    if kp == k:
        return params
    rep = {}
    for name in ("enc0", "enc1", "enc2", "bias", "drec0", "drec1", "drec2",
                 "dout0", "dout1", "velT_T", "tf0T", "tf1T", "dc_mask"):
        arr = np.asarray(getattr(params, name))
        rep[name] = jnp.asarray(np.pad(arr, ((0, 0), (0, kp - k))))
    for name in ("ts0T", "ts1T"):
        arr = np.asarray(getattr(params, name))
        rep[name] = jnp.asarray(np.pad(arr, ((0, kp - k), (0, 0))))
    return params._replace(**rep)


# ---------------------------------------------------------------------------
# Pure-jnp reference of the same step (for cross-checking the kernel)
# ---------------------------------------------------------------------------

def vco_reference_step(params: VCOParams, state: VCOState, vel, corr):
    p_arrays = (params.enc0, params.enc1, params.enc2, params.bias,
                params.drec0, params.drec1, params.drec2,
                params.dout0, params.dout1, params.velT_T,
                params.tf0T, params.tf1T, params.ts0T, params.ts1T,
                params.dc_mask)
    consts = (params.a_rec, params.b_rec, params.a_out, params.b_out,
              params.tau_rc, params.tau_ref, params.dt)
    frec, volt, refr, fout = _vco_step(
        p_arrays, consts, (state.f0, state.f1, state.f2),
        state.voltage, state.refractory, state.fout,
        jnp.asarray(vel, F32).reshape(1, -1),
        jnp.asarray(corr, F32).reshape(1, -1))
    new_state = VCOState(volt, refr, frec[0], frec[1], frec[2], fout)
    return new_state, fout[0]
