"""FastPathIntegrator: the Pallas fused-hot-loop fast path for path
integration.

Builds a regular :class:`PathIntegration` model through the engine (so
encoders/decoders/gains come from the exact same solver pipeline), then runs
the whole VCO-bank dynamics in a single multi-step Pallas kernel with all
state resident in VMEM (:mod:`sspslam_tpu.ops.pallas_kernels`).  Numerics
match the generic executor (cross-checked in tests/test_pallas.py); the win
is wall-clock: one kernel launch per chunk instead of one XLA while-loop
iteration per dt.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..nef import Network, Node, Simulator
from ..ops import vsa
from ..ops.neurons import LIF
from ..ops.pallas_kernels import VCOParams, VCOState, make_vco_scan
from .pathintegration import PathIntegration

__all__ = ["FastPathIntegrator"]


class FastPathIntegrator:
    def __init__(self, ssp_space, n_neurons, recurrent_tau=0.05,
                 scaling_factor=1.0, stable=True, max_radius=1.0,
                 tau_probe=0.05, seed: Optional[int] = 0,
                 chunk_steps: int = 1000, dt: float = 0.001,
                 interpret: Optional[bool] = None, mxu_decode: bool = True):
        self.ssp_space = ssp_space
        self.dt = dt
        self.chunk_steps = chunk_steps
        d = ssp_space.ssp_dim
        N = ssp_space.domain_dim
        self.d, self.N = d, N
        k = (d + 1) // 2
        self.k, self.n = k, n_neurons

        # build through the engine so parameters are identical to the
        # generic path
        with Network(seed=seed) as net:
            vel = Node(size_in=N, output=None, label="vel_stub")
            pi = PathIntegration(ssp_space, n_neurons, recurrent_tau,
                                 scaling_factor=scaling_factor,
                                 stable=stable, max_radius=max_radius,
                                 neuron_type=LIF())
        sim = Simulator(net, dt=dt, seed=seed)
        model = sim.model
        be = next(b for b in model.ensembles if b.batched)
        rec_bc = next(c for c in model.connections
                      if c.pre_kind == "ea_batch" and c.post_kind == "ea_batch")
        out_bc = next(c for c in model.connections
                      if c.pre_kind == "ea_batch" and c.post_kind == "node")
        a_rec, b_rec = np.exp(-dt / recurrent_tau), 1 - np.exp(-dt / recurrent_tau)
        a_out, b_out = np.exp(-dt / tau_probe), 1 - np.exp(-dt / tau_probe)
        nt = be.neuron_type

        f32 = jnp.float32
        enc = be.scaled_encoders          # (k, n, 3)
        drec = rec_bc.decoders            # (k, n, 3)
        dout = out_bc.decoders            # (k, n, 3)
        tof = vsa.to_fourier_matrix(d)    # (3k, d)
        fromf = vsa.from_fourier_matrix(d)  # (d, 3k)
        self.params = VCOParams(
            enc0=jnp.asarray(enc[:, :, 0].T, f32),
            enc1=jnp.asarray(enc[:, :, 1].T, f32),
            enc2=jnp.asarray(enc[:, :, 2].T, f32),
            bias=jnp.asarray(be.bias.T, f32),
            drec0=jnp.asarray(drec[:, :, 0].T, f32),
            drec1=jnp.asarray(drec[:, :, 1].T, f32),
            drec2=jnp.asarray(drec[:, :, 2].T, f32),
            dout0=jnp.asarray(dout[:, :, 0].T, f32),
            dout1=jnp.asarray(dout[:, :, 1].T, f32),
            velT_T=jnp.asarray(ssp_space.phase_matrix[:k].T, f32),
            tf0T=jnp.asarray(tof[0::3, :].T, f32),
            tf1T=jnp.asarray(tof[1::3, :].T, f32),
            ts0T=jnp.asarray(fromf[:, 0::3].T, f32),
            ts1T=jnp.asarray(fromf[:, 1::3].T, f32),
            dc_mask=jnp.zeros((1, k), f32).at[0, 0].set(1.0),
            a_rec=float(a_rec), b_rec=float(b_rec),
            a_out=float(a_out), b_out=float(b_out),
            tau_rc=float(nt.tau_rc), tau_ref=float(nt.tau_ref), dt=float(dt),
        )
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        self._interpret = interpret
        self._mxu_decode = mxu_decode
        if mxu_decode:
            # lane-align the oscillator axis so the packed-decoder MXU path
            # can slice the (1, 5*k) reduction row at tile boundaries
            from ..ops.pallas_kernels import pad_vco_params_to_lanes
            self.params = pad_vco_params_to_lanes(self.params)
            self.k = self.params.bias.shape[1]
        self._scan_cache = {}
        self.state = self.initial_state()

    def initial_state(self) -> VCOState:
        f32 = jnp.float32
        # the mxu path's fout state holds the filtered (1, 2k) decode rows
        # (projection to SSP space happens outside the kernel)
        fout_shape = (1, 2 * self.k) if self._mxu_decode else (1, self.d)
        return VCOState(
            voltage=jnp.zeros((self.n, self.k), f32),
            refractory=jnp.zeros((self.n, self.k), f32),
            f0=jnp.zeros((1, self.k), f32),
            f1=jnp.zeros((1, self.k), f32),
            f2=jnp.zeros((1, self.k), f32),
            fout=jnp.zeros(fout_shape, f32),
        )

    def _scan_for(self, n_steps):
        if n_steps not in self._scan_cache:
            if self._mxu_decode:
                from ..ops.pallas_kernels import make_vco_scan_v2
                self._scan_cache[n_steps] = make_vco_scan_v2(
                    self.params, n_steps, interpret=self._interpret)
            else:
                self._scan_cache[n_steps] = make_vco_scan(
                    self.params, n_steps, interpret=self._interpret)
        return self._scan_cache[n_steps]

    def run(self, velocities: np.ndarray,
            corrections: Optional[np.ndarray] = None,
            transfer: bool = True):
        """Integrate a (T, N) velocity table (optionally with (T, d) SSP
        corrections, e.g. the initial-state clamp); returns the (T, d)
        filtered SSP estimate trace (``transfer=False``: the list of
        device-resident chunk traces instead — used for state-only timing
        symmetrical with the Simulator's lazy probes)."""
        velocities = np.asarray(velocities, np.float32)
        T = velocities.shape[0]
        if corrections is None:
            corrections = np.zeros((T, self.d), np.float32)
        outs = []
        done = 0
        while done < T:
            c = min(self.chunk_steps, T - done)
            scan = self._scan_for(c)
            self.state, out = scan(self.state,
                                   jnp.asarray(velocities[done:done + c]),
                                   jnp.asarray(corrections[done:done + c]))
            # keep chunk traces on device so kernel launches pipeline; the
            # device->host transfer happens once, below (synchronous per-chunk
            # np.asarray serialised each launch behind a full trace transfer
            # and dominated wall time on the remote TPU)
            outs.append(out)
            done += c
        if not transfer:
            jax.block_until_ready(self.state)
            return outs
        return np.concatenate([np.asarray(o) for o in outs], axis=0)
