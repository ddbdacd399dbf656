"""Pallas fast-path tests (interpret mode on CPU): the fused multi-step VCO
kernel must match the pure-jnp reference step and the generic engine."""

import numpy as np
import jax.numpy as jnp
import pytest

from sspslam_tpu import HexagonalSSPSpace
from sspslam_tpu.models import PathIntegration
from sspslam_tpu.models.fast_pathint import FastPathIntegrator
from sspslam_tpu.nef import Connection, LIF, Network, Node, Probe, Simulator
from sspslam_tpu.ops.pallas_kernels import vco_reference_step


@pytest.fixture(scope="module")
def space():
    bounds = 1.1 * np.tile(np.array([-1, 1.0]), (2, 1))
    return HexagonalSSPSpace(2, ssp_dim=31, seed=0, length_scale=0.3,
                             domain_bounds=bounds)


class TestFastPathIntegrator:
    def test_kernel_matches_jnp_reference(self, space):
        # mxu_decode kernel (lane-padded, packed decode, hoisted projections)
        fpi = FastPathIntegrator(space, 48, seed=0, chunk_steps=20,
                                 interpret=True, mxu_decode=True)
        # unpadded twin supplies the plain jnp reference step's params
        ref_fpi = FastPathIntegrator(space, 48, seed=0, chunk_steps=20,
                                     interpret=True, mxu_decode=False)
        T = 40
        rng = np.random.default_rng(0)
        vels = 0.02 * rng.normal(size=(T, 2)).astype(np.float32)
        corr = np.zeros((T, space.ssp_dim), np.float32)
        corr[0] = space.encode(np.array([[0.1, 0.1]])).flatten()
        out = fpi.run(vels, corr)
        out_v1 = ref_fpi.run(vels, corr)

        # jnp reference, step by step
        state = ref_fpi.initial_state()
        ref = []
        for t in range(T):
            state, y = vco_reference_step(ref_fpi.params, state, vels[t],
                                          corr[t])
            ref.append(np.asarray(y))
        ref = np.stack(ref)
        assert np.allclose(out_v1, ref, atol=2e-4), np.abs(out_v1 - ref).max()
        assert np.allclose(out, ref, atol=2e-4), np.abs(out - ref).max()

    def test_matches_generic_engine(self, space):
        """Same parameters, same inputs: the Pallas fast path must track the
        generic executor's PathIntegration output closely."""
        d = space.ssp_dim
        n_neurons = 48
        seed = 0
        T_steps = 300
        rng = np.random.default_rng(1)
        vels = (0.05 * rng.normal(size=(T_steps, 2))).astype(np.float32)
        ssp0 = space.encode(np.array([[0.15, -0.1]])).flatten()
        corr = np.zeros((T_steps, d), np.float32)
        corr[:49] = ssp0  # the initial clamp (t < 0.05, i.e. steps 1..49)

        # generic engine
        with Network(seed=seed) as net:
            vel_n = Node(lambda t: vels[min(int(round((t - 0.001) / 0.001)),
                                            T_steps - 1)])
            init_n = Node(lambda t: ssp0 if t < 0.05 else np.zeros(d))
            pi = PathIntegration(space, n_neurons, 0.05, neuron_type=LIF())
            Connection(vel_n, pi.velocity_input, synapse=None)
            Connection(init_n, pi.input, synapse=None)
            p = Probe(pi.output, synapse=0.05)
        sim = Simulator(net, seed=seed)
        sim.run_steps(T_steps)
        generic = sim.data[p]

        fpi = FastPathIntegrator(space, n_neurons, seed=seed,
                                 chunk_steps=100, interpret=True)
        fast = fpi.run(vels, corr)

        # identical parameter pipeline + identical update order -> outputs
        # agree to float accumulation tolerance
        err = np.max(np.abs(fast - generic))
        assert err < 5e-3, err

    def test_integration_accuracy(self, space):
        """The fast path integrates a constant velocity correctly."""
        d = space.ssp_dim
        v = np.array([0.2, -0.1])
        scale = 1 / np.max(np.abs(space.phase_matrix @ v.reshape(2, 1)))
        T_steps = 800
        vels = np.tile(v * scale, (T_steps, 1)).astype(np.float32)
        ssp0 = space.encode(np.zeros((1, 2))).flatten()
        corr = np.zeros((T_steps, d), np.float32)
        corr[:50] = ssp0
        fpi = FastPathIntegrator(space, 300, seed=3, scaling_factor=scale,
                                 chunk_steps=200, interpret=True)
        out = fpi.run(vels, corr)
        dec = space.decode(out[-1][None, :], num_samples=50)
        target = v * T_steps * 0.001
        assert np.linalg.norm(dec - target) < 0.25
