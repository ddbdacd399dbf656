"""L1/L2 model tests.

Oracles per SURVEY.md §4: the numpy ``circconv`` for binding nets; rate-mode
deterministic integration bounds for the path integrator; convergence of the
associative memory's recall toward trained values."""

import numpy as np
import jax.numpy as jnp
import pytest

from sspslam_tpu import HexagonalSSPSpace, SPSpace
from sspslam_tpu.models import (AssociativeMemory, CircularConvolution,
                                PathIntegration, PathIntegrationReencode,
                                Product, circconv)
from sspslam_tpu.nef import (Connection, Network, Node, Probe, Simulator,
                             LIFRate, Uniform)


def run_net(net, probes, T=0.3, seed=0):
    sim = Simulator(net, seed=seed)
    sim.run(T)
    return sim, [sim.data[p] for p in probes]


class TestProduct:
    def test_elementwise_product(self):
        a = np.array([0.5, -0.6, 0.3])
        b = np.array([0.4, 0.5, -0.8])
        with Network(seed=0) as net:
            na = Node(lambda t: a)
            nb = Node(lambda t: b)
            prod = Product(200, 3, neuron_type=LIFRate())
            Connection(na, prod.input_a, synapse=None)
            Connection(nb, prod.input_b, synapse=None)
            p = Probe(prod.output, synapse=0.02)
        sim, (y,) = run_net(net, [p])
        assert np.allclose(y[-1], a * b, atol=0.08)

    def test_dot_product_mode(self):
        a = np.array([0.5, -0.6, 0.3])
        b = np.array([0.4, 0.5, -0.8])
        with Network(seed=1) as net:
            na = Node(lambda t: a)
            nb = Node(lambda t: b)
            prod = Product(200, 3, dot_product=True, neuron_type=LIFRate())
            Connection(na, prod.input_a, synapse=None)
            Connection(nb, prod.input_b, synapse=None)
            p = Probe(prod.output, synapse=0.02)
        sim, (y,) = run_net(net, [p])
        assert np.isclose(y[-1, 0], a @ b, atol=0.1)


class TestCircularConvolution:
    @pytest.mark.parametrize("invert_a,invert_b",
                             [(False, False), (True, False)])
    def test_matches_numpy_oracle(self, invert_a, invert_b):
        d = 16
        rng = np.random.default_rng(0)
        a = rng.normal(size=d)
        a /= np.linalg.norm(a) * 1.2
        b = rng.normal(size=d)
        b /= np.linalg.norm(b) * 1.2
        with Network(seed=2) as net:
            na = Node(lambda t: a)
            nb = Node(lambda t: b)
            cc = CircularConvolution(150, d, invert_a=invert_a,
                                     invert_b=invert_b,
                                     neuron_type=LIFRate())
            Connection(na, cc.input_a, synapse=None)
            Connection(nb, cc.input_b, synapse=None)
            p = Probe(cc.output, synapse=0.02)
        sim, (y,) = run_net(net, [p])
        want = circconv(a, b, invert_a=invert_a, invert_b=invert_b)
        err = np.linalg.norm(y[-1] - want) / np.linalg.norm(want)
        assert err < 0.35

    def test_unbinding_recovers_similarity(self):
        """bind then unbind: the recovered vector is most similar to the
        original among a small codebook."""
        d = 32
        space = SPSpace(4, d, seed=0)
        a, b = space.vectors[0], space.vectors[1]
        bound = circconv(a, b)
        with Network(seed=3) as net:
            na = Node(lambda t: a)
            nb = Node(lambda t: bound)
            cc = CircularConvolution(120, d, invert_a=True,
                                     neuron_type=LIFRate())
            Connection(na, cc.input_a, synapse=None)
            Connection(nb, cc.input_b, synapse=None)
            p = Probe(cc.output, synapse=0.02)
        sim, (y,) = run_net(net, [p])
        sims = space.vectors @ y[-1]
        assert np.argmax(sims) == 1


class TestPathIntegration:
    def make_space(self, seed=0):
        return HexagonalSSPSpace(
            2, ssp_dim=55, seed=seed, length_scale=0.3,
            domain_bounds=1.1 * np.tile(np.array([-1, 1.0]), (2, 1)))

    def test_holds_position_with_zero_velocity(self):
        space = self.make_space()
        d = space.ssp_dim
        x0 = np.array([[0.2, -0.3]])
        ssp0 = space.encode(x0).flatten()
        with Network(seed=4) as net:
            vel = Node(lambda t: np.zeros(2))
            init = Node(lambda t: ssp0 if t < 0.05 else np.zeros(d))
            pi = PathIntegration(space, 250, 0.05, neuron_type=LIFRate())
            Connection(vel, pi.velocity_input, synapse=None)
            Connection(init, pi.input, synapse=None)
            p = Probe(pi.output, synapse=0.05)
        sim = Simulator(net, seed=4)
        sim.run(1.0)
        out = sim.data[p][-1]
        sim_to_true = (out / np.linalg.norm(out)) @ ssp0
        assert sim_to_true > 0.8
        dec = space.decode(out[None, :], num_samples=50)
        assert np.linalg.norm(dec - x0) < 0.15

    def test_integrates_constant_velocity(self):
        space = self.make_space(seed=1)
        d = space.ssp_dim
        T = 1.0
        v = np.array([0.25, -0.15])  # ends at (0.25,-0.15) from origin
        scale_fac = 1 / np.max(np.abs(space.phase_matrix @ v.reshape(2, 1)))
        ssp0 = space.encode(np.zeros((1, 2))).flatten()
        with Network(seed=5) as net:
            vel = Node(lambda t: v * scale_fac)
            init = Node(lambda t: ssp0 if t < 0.05 else np.zeros(d))
            pi = PathIntegration(space, 400, 0.05, scaling_factor=scale_fac,
                                 neuron_type=LIFRate())
            Connection(vel, pi.velocity_input, synapse=None)
            Connection(init, pi.input, synapse=None)
            p = Probe(pi.output, synapse=0.05)
        sim = Simulator(net, seed=5)
        sim.run(T)
        dec = space.decode(sim.data[p][-1][None, :], num_samples=60)
        target = v * T
        assert np.linalg.norm(dec - target) < 0.2

    def test_reencode_variant_builds_and_holds(self):
        space = self.make_space(seed=2)
        d = space.ssp_dim
        ssp0 = space.encode(np.array([[0.1, 0.1]])).flatten()
        with Network(seed=6) as net:
            vel = Node(lambda t: np.zeros(2))
            init = Node(lambda t: ssp0 if t < 0.05 else np.zeros(d))
            pi = PathIntegrationReencode(space, 150, 0.05, cleanup_dt=0.25,
                                         cleanup_samples_per_dim=30,
                                         neuron_type=LIFRate())
            Connection(vel, pi.velocity_input, synapse=None)
            Connection(init, pi.input, synapse=None)
            p = Probe(pi.output, synapse=0.05)
        sim = Simulator(net, seed=6)
        sim.run(0.8)
        out = sim.data[p][-1]
        assert (out / np.linalg.norm(out)) @ ssp0 > 0.7


class TestAssociativeMemory:
    def test_learns_key_value_pairs(self):
        """Present two key->value pairs alternately with learning on, then
        freeze learning and check the recall *direction* for each key.
        (Recall magnitude rings at high PES rates — the reference operates in
        the same regime and normalises recall via make_unitary downstream,
        slam.py:302-303 — so the assertion is on cosine similarity.)"""
        d_key = d_val = 32
        sp = SPSpace(2, d_key, seed=3)
        keys = sp.vectors
        rngv = np.random.default_rng(0)
        vals = rngv.normal(size=(2, d_val))
        vals /= np.linalg.norm(vals, axis=1, keepdims=True)
        T_train, T_test = 2.0, 0.3
        period = 0.25

        def key_f(t):
            if t > T_train:
                return keys[0]
            return keys[int(t / period) % 2]

        def val_f(t):
            if t > T_train:
                return np.zeros(d_val)
            return vals[int(t / period) % 2]

        def learn_f(t):
            return 0.0 if t <= T_train else 10.0

        intercept = float(min((keys @ keys.T - np.eye(2)).max(), 0.5))
        with Network(seed=7) as net:
            kn = Node(key_f)
            vn = Node(val_f)
            ln = Node(learn_f)
            am = AssociativeMemory(400, d_key, d_val, intercept,
                                   voja_learning_rate=5e-2,
                                   pes_learning_rate=1e-3)
            Connection(kn, am.key_input, synapse=None)
            Connection(vn, am.value_input, synapse=None)
            Connection(ln, am.learning, synapse=None)
            p = Probe(am.recall, synapse=0.05)
        sim = Simulator(net, seed=7, default_neuron_type=LIFRate())
        sim.run(T_train + T_test)
        recall = sim.data[p][-50:].mean(axis=0)
        recall = recall / np.linalg.norm(recall)
        sims = vals @ recall
        assert np.argmax(sims) == 0
        assert sims[0] > 0.4

    def test_weights_probe(self):
        d = 16
        with Network(seed=8) as net:
            kn = Node(lambda t: np.ones(d) / np.sqrt(d))
            vn = Node(lambda t: np.ones(d) / np.sqrt(d))
            ln = Node(lambda t: 0.0)
            am = AssociativeMemory(100, d, d, 0.1, voja=False)
            Connection(kn, am.key_input, synapse=None)
            Connection(vn, am.value_input, synapse=None)
            Connection(ln, am.learning, synapse=None)
            wp = Probe(am.conn_out, attr="weights", sample_every=0.1)
        sim = Simulator(net, seed=8, default_neuron_type=LIFRate())
        sim.run(0.2)
        W = sim.data[wp]
        assert W.shape == (2, d, 100)
        # learning happened: final decoders differ from (zero) start
        assert np.abs(W[-1]).max() > 0
