"""Pallas TPU kernels: the fused multi-step path-integrator hot loop.

The generic executor runs one XLA loop iteration per dt; for the
path-integration workload (the reference's headline benchmark,
run_pathint.py) the entire model state — VCO voltages/refractory (k, n),
encoder/decoder slabs (k, n, 3), synapse filter (k, 3), probe filter (d,) —
fits comfortably in VMEM (~5 MB at the reference scale k=49, n=800). This
kernel keeps it all resident and integrates a CHUNK of timesteps per kernel
launch: per-step work is three broadcast multiply-accumulate slabs over
(k, n) plus the LIF elementwise update, with only the velocity table and the
per-step SSP output touching outside memory.

Numerics match the generic executor's PathIntegration step exactly (same
parameter arrays, same update order), so the fast path is cross-checked
against the engine in tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["VCOParams", "VCOState", "make_vco_scan", "vco_reference_step"]


class VCOParams(NamedTuple):
    """Static per-model parameters (all float32).

    enc : (3, k, n)  scaled encoders, component-major
    bias : (k, n)
    dec_rec : (3, k, n) recurrent decoders (element 0 zeroed)
    dec_out : (3, k, n) output (identity) decoders
    vel_T : (k, N) velocity->frequency transform (phase matrix rows)
    tf0, tf1 : (k, d) SSP -> per-VCO Re/Im components (the component-major
        split of the to-Fourier map; its frequency rows are zero)
    ts0, ts1 : (d, k) per-VCO Re/Im components -> SSP (component-major split
        of the from-Fourier map; frequency columns are zero).  Component-
        major layout avoids interleaving reshapes Mosaic cannot lower.
    dc_mask : (k,) one-hot on the DC oscillator (Pallas TPU has no
        scatter-add; the pin is a masked add)
    a_rec, b_rec : recurrent lowpass coefficients
    a_out, b_out : probe lowpass coefficients
    tau_rc, tau_ref, dt : neuron/time constants
    """
    enc: jax.Array
    bias: jax.Array
    dec_rec: jax.Array
    dec_out: jax.Array
    vel_T: jax.Array
    tf0: jax.Array
    tf1: jax.Array
    ts0: jax.Array
    ts1: jax.Array
    dc_mask: jax.Array
    a_rec: float
    b_rec: float
    a_out: float
    b_out: float
    tau_rc: float
    tau_ref: float
    dt: float


class VCOState(NamedTuple):
    voltage: jax.Array      # (k, n)
    refractory: jax.Array   # (k, n)
    filt_rec: jax.Array     # (3, k) filtered recurrent value
    filt_out: jax.Array     # (d,) filtered output SSP


def _lif_step(voltage, refractory, J, dt, tau_rc, tau_ref):
    # expm1/log1p are unimplemented in the Pallas TPU lowering; the plain
    # exp/log forms are accurate enough at dt/tau_rc ~ 0.05 in float32.
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


def _chunk_body(consts, k: int, n: int, d: int, n_steps: int,
                # inputs
                enc_ref, bias_ref, drec_ref, dout_ref, velT_ref,
                tf0_ref, tf1_ref, ts0_ref, ts1_ref, dcm_ref,
                vel_ref, inp_ref,
                volt_ref, refr_ref, frec_ref, fout_ref,
                # outputs
                out_ref, volt_o, refr_o, frec_o, fout_o):
    """Kernel body: integrate n_steps with all state/params in VMEM."""
    a_rec, b_rec, a_out, b_out, tau_rc, tau_ref, dt = consts
    enc = enc_ref[:]
    bias = bias_ref[:]
    dec_rec = drec_ref[:]
    dec_out = dout_ref[:]
    vel_T = velT_ref[:]
    tf0 = tf0_ref[:]
    tf1 = tf1_ref[:]
    ts0 = ts0_ref[:]
    ts1 = ts1_ref[:]
    dc_mask = dcm_ref[:]

    def step(i, carry):
        volt, refr, frec, fout = carry
        vel = vel_ref[i, :]                       # (N,)
        # per-VCO input triple: filtered recurrent + velocity freq + DC pin
        # + external SSP correction through the Fourier map
        corr = inp_ref[i, :]                      # (d,)
        x0 = frec[0] + jnp.dot(tf0, corr, preferred_element_type=jnp.float32)
        x1 = frec[1] + jnp.dot(tf1, corr, preferred_element_type=jnp.float32)
        x2 = frec[2] + jnp.dot(vel_T, vel, preferred_element_type=jnp.float32)
        # DC oscillator pinned to [1, 0, 0] (masked add)
        x0 = x0 + dc_mask

        J = (enc[0] * x0[:, None] + enc[1] * x1[:, None]
             + enc[2] * x2[:, None] + bias)
        volt, refr, act = _lif_step(volt, refr, J, dt, tau_rc, tau_ref)

        cv0 = jnp.sum(act * dec_rec[0], axis=1)
        cv1 = jnp.sum(act * dec_rec[1], axis=1)
        cv2 = jnp.sum(act * dec_rec[2], axis=1)
        frec = a_rec * frec + b_rec * jnp.stack([cv0, cv1, cv2])

        o0 = jnp.sum(act * dec_out[0], axis=1)
        o1 = jnp.sum(act * dec_out[1], axis=1)
        ssp = (jnp.dot(ts0, o0, preferred_element_type=jnp.float32)
               + jnp.dot(ts1, o1, preferred_element_type=jnp.float32))
        fout = a_out * fout + b_out * ssp
        out_ref[i, :] = fout
        return volt, refr, frec, fout

    carry = (volt_ref[:], refr_ref[:], frec_ref[:], fout_ref[:])
    volt, refr, frec, fout = jax.lax.fori_loop(0, n_steps, step, carry)
    volt_o[:] = volt
    refr_o[:] = refr
    frec_o[:] = frec
    fout_o[:] = fout


def make_vco_scan(params: VCOParams, n_steps: int, interpret: bool = False):
    """Build ``fn(state, vel_chunk, input_chunk) -> (state, ssp_out_chunk)``
    running ``n_steps`` dt-steps per kernel launch.

    vel_chunk : (n_steps, N); input_chunk : (n_steps, d) external SSP
    corrections (zeros when unused)."""
    k, n = params.bias.shape
    d = params.ts0.shape[0]

    consts = (params.a_rec, params.b_rec, params.a_out, params.b_out,
              params.tau_rc, params.tau_ref, params.dt)
    kernel = functools.partial(_chunk_body, consts, k, n, d, n_steps)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)

    @jax.jit
    def run(state: VCOState, vel_chunk, input_chunk):
        out_shapes = (
            jax.ShapeDtypeStruct((n_steps, d), jnp.float32),  # ssp out
            jax.ShapeDtypeStruct((k, n), jnp.float32),
            jax.ShapeDtypeStruct((k, n), jnp.float32),
            jax.ShapeDtypeStruct((3, k), jnp.float32),
            jax.ShapeDtypeStruct((d,), jnp.float32),
        )
        out, volt, refr, frec, fout = pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=[vmem()] * 16,
            out_specs=tuple([vmem()] * 5),
            interpret=interpret,
        )(params.enc, params.bias, params.dec_rec, params.dec_out,
          params.vel_T, params.tf0, params.tf1, params.ts0, params.ts1,
          params.dc_mask,
          vel_chunk.astype(jnp.float32), input_chunk.astype(jnp.float32),
          state.voltage, state.refractory, state.filt_rec, state.filt_out)
        return VCOState(volt, refr, frec, fout), out

    return run


# ---------------------------------------------------------------------------
# Pure-jnp reference of the same chunk (for cross-checking the kernel)
# ---------------------------------------------------------------------------

def vco_reference_step(params: VCOParams, state: VCOState, vel, corr):
    p = params
    k, n = p.bias.shape
    x0 = state.filt_rec[0] + p.tf0 @ corr
    x1 = state.filt_rec[1] + p.tf1 @ corr
    x2 = state.filt_rec[2] + p.vel_T @ vel
    x0 = x0 + p.dc_mask
    J = (p.enc[0] * x0[:, None] + p.enc[1] * x1[:, None]
         + p.enc[2] * x2[:, None] + p.bias)
    volt, refr, act = _lif_step(state.voltage, state.refractory, J,
                                p.dt, p.tau_rc, p.tau_ref)
    cv = jnp.stack([jnp.sum(act * p.dec_rec[i], axis=1) for i in range(3)])
    frec = p.a_rec * state.filt_rec + p.b_rec * cv
    o0 = jnp.sum(act * p.dec_out[0], axis=1)
    o1 = jnp.sum(act * p.dec_out[1], axis=1)
    ssp = p.ts0 @ o0 + p.ts1 @ o1
    fout = p.a_out * state.filt_out + p.b_out * ssp
    return VCOState(volt, refr, frec, fout), fout
