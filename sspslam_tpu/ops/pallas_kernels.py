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

__all__ = ["VCOParams", "VCOState", "make_vco_scan", "vco_reference_step"]

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


def _vco_step(p_arrays, consts, frec, volt, refr, fout, vel_row, corr_row):
    """One dt of the VCO bank in (n, k)/(1, k) layout; shared between the
    Pallas kernel and the jnp reference."""
    (enc0, enc1, enc2, bias, drec0, drec1, drec2, dout0, dout1,
     velT_T, tf0T, tf1T, ts0T, ts1T, dc_mask) = p_arrays
    a_rec, b_rec, a_out, b_out, tau_rc, tau_ref, dt = consts
    f0, f1, f2 = frec

    x0 = f0 + jnp.dot(corr_row, tf0T, preferred_element_type=F32) + dc_mask
    x1 = f1 + jnp.dot(corr_row, tf1T, preferred_element_type=F32)
    x2 = f2 + jnp.dot(vel_row, velT_T, preferred_element_type=F32)

    J = enc0 * x0 + enc1 * x1 + enc2 * x2 + bias   # (n,k) * (1,k) broadcast
    volt, refr, act = _lif_step(volt, refr, J, dt, tau_rc, tau_ref)

    f0 = a_rec * f0 + b_rec * jnp.sum(act * drec0, axis=0, keepdims=True)
    f1 = a_rec * f1 + b_rec * jnp.sum(act * drec1, axis=0, keepdims=True)
    f2 = a_rec * f2 + b_rec * jnp.sum(act * drec2, axis=0, keepdims=True)

    o0 = jnp.sum(act * dout0, axis=0, keepdims=True)   # (1, k)
    o1 = jnp.sum(act * dout1, axis=0, keepdims=True)
    ssp = (jnp.dot(o0, ts0T, preferred_element_type=F32)
           + jnp.dot(o1, ts1T, preferred_element_type=F32))  # (1, d)
    fout = a_out * fout + b_out * ssp
    return (f0, f1, f2), volt, refr, fout


def _chunk_body(consts, n_steps: int, *refs):
    (enc0_r, enc1_r, enc2_r, bias_r, drec0_r, drec1_r, drec2_r,
     dout0_r, dout1_r, velTT_r, tf0T_r, tf1T_r, ts0T_r, ts1T_r, dcm_r,
     vel_ref, inp_ref, volt_ref, refr_ref, f0_ref, f1_ref, f2_ref, fout_ref,
     out_ref, volt_o, refr_o, f0_o, f1_o, f2_o, fout_o) = refs
    p_arrays = (enc0_r[:], enc1_r[:], enc2_r[:], bias_r[:], drec0_r[:],
                drec1_r[:], drec2_r[:], dout0_r[:], dout1_r[:], velTT_r[:],
                tf0T_r[:], tf1T_r[:], ts0T_r[:], ts1T_r[:], dcm_r[:])

    def step(i, carry):
        frec, volt, refr, fout = carry
        vel_row = vel_ref[pl.ds(i, 1), :]     # (1, N)
        corr_row = inp_ref[pl.ds(i, 1), :]    # (1, d)
        frec, volt, refr, fout = _vco_step(p_arrays, consts, frec, volt,
                                           refr, fout, vel_row, corr_row)
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


def make_vco_scan(params: VCOParams, n_steps: int, interpret: bool = False):
    """Build ``fn(state, vel_chunk, input_chunk) -> (state, ssp_out_chunk)``
    running ``n_steps`` dt-steps per kernel launch."""
    n, k = params.bias.shape
    d = params.ts0T.shape[1]

    consts = (params.a_rec, params.b_rec, params.a_out, params.b_out,
              params.tau_rc, params.tau_ref, params.dt)
    kernel = functools.partial(_chunk_body, consts, n_steps)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    n_inputs = _N_PARAM_INPUTS + 2 + 6   # params + tables + state

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
          params.dc_mask,
          vel_chunk.astype(F32), input_chunk.astype(F32),
          state.voltage, state.refractory, state.f0, state.f1, state.f2,
          state.fout)
        return VCOState(volt, refr, f0, f1, f2, fout), out

    return run


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
