"""Scaled / variant-config tests: 3-D domains (the BASELINE.json scaled
sweep), grid-cell clean-up populations, and grid-cell PI outputs."""

import numpy as np
import pytest

from sspslam_tpu import HexagonalSSPSpace, SPSpace
from sspslam_tpu.models import PathIntegration, SLAMNetwork, \
    get_slam_input_functions
from sspslam_tpu.nef import (Connection, LIFRate, Network, Node, Probe,
                             Simulator)


class Test3DDomain:
    def test_space_and_decode_3d(self):
        bounds = np.tile(np.array([-1, 1.0]), (3, 1))
        space = HexagonalSSPSpace(3, ssp_dim=201, seed=0, length_scale=0.3,
                                  domain_bounds=bounds)
        assert space.domain_dim == 3
        rng = np.random.default_rng(0)
        x = rng.uniform(-0.7, 0.7, size=(5, 3))
        phi = space.encode(x)
        xhat = space.decode(phi, num_samples=21)
        assert np.max(np.abs(xhat - x)) < 0.12

    def test_pathint_3d_holds(self):
        bounds = 1.1 * np.tile(np.array([-1, 1.0]), (3, 1))
        space = HexagonalSSPSpace(3, ssp_dim=89, seed=0, length_scale=0.35,
                                  domain_bounds=bounds)
        d = space.ssp_dim
        ssp0 = space.encode(np.array([[0.2, -0.1, 0.3]])).flatten()
        with Network(seed=0) as net:
            vel = Node(lambda t: np.zeros(3))
            init = Node(lambda t: ssp0 if t < 0.05 else np.zeros(d))
            pi = PathIntegration(space, 150, 0.05, neuron_type=LIFRate())
            Connection(vel, pi.velocity_input, synapse=None)
            Connection(init, pi.input, synapse=None)
            p = Probe(pi.output, synapse=0.05)
        sim = Simulator(net, seed=0)
        sim.run(0.5)
        out = sim.data[p][-1]
        assert (out / np.linalg.norm(out)) @ ssp0 > 0.75


class TestGridCellVariants:
    @pytest.fixture(scope="class")
    def space(self):
        bounds = 1.1 * np.tile(np.array([-1, 1.0]), (2, 1))
        return HexagonalSSPSpace(2, ssp_dim=55, seed=0, length_scale=0.3,
                                 domain_bounds=bounds)

    def test_pathint_with_gcs_output_ensemble(self, space):
        d = space.ssp_dim
        ssp0 = space.encode(np.array([[0.1, 0.1]])).flatten()
        with Network(seed=1) as net:
            vel = Node(lambda t: np.zeros(2))
            init = Node(lambda t: ssp0 if t < 0.05 else np.zeros(d))
            pi = PathIntegration(space, 120, 0.05, with_gcs=True, n_gcs=300,
                                 neuron_type=LIFRate())
            Connection(vel, pi.velocity_input, synapse=None)
            Connection(init, pi.input, synapse=None)
            p = Probe(pi.output, synapse=0.05)  # decoded from the GC ensemble
        sim = Simulator(net, seed=1)
        sim.run(0.4)
        out = sim.data[p][-1]
        assert (out / max(np.linalg.norm(out), 1e-9)) @ ssp0 > 0.5

    def test_slam_with_gc_cleanup_population(self, space):
        d = space.ssp_dim
        lm_space = SPSpace(3, d, seed=2)
        T = 0.5
        n_steps = int(T / 0.001)
        rng = np.random.default_rng(2)
        path = 0.4 * np.cumsum(rng.normal(size=(n_steps, 2)), axis=0)
        path /= max(np.abs(path).max(), 1.0)
        vels = 1000.0 * np.diff(path, axis=0, prepend=path[:1])
        landmarks = rng.uniform(-0.5, 0.5, (3, 2))
        vec = landmarks[None] - path[:, None, :]
        (vf, scale, ivf, _, spf, _, vsspf) = get_slam_input_functions(
            space, lm_space, vels, vec, 0.9)
        real0 = space.encode(path[:1]).flatten()
        with Network(seed=2) as net:
            vel = Node(vf)
            init = Node(lambda t: real0 if t < 0.05 else np.zeros(d))
            lm_id = Node(spf)
            lm_ssp = Node(vsspf)
            in_view = Node(ivf)
            slam = SLAMNetwork(space, lm_space, 0.9, 3, 100, 120, 24,
                               vel_scaling_factor=scale, gc_n_neurons=200,
                               cleanup_samples_per_dim=20, seed=2)
            Connection(vel, slam.velocity_input, synapse=None)
            Connection(init, slam.pathintegrator.input, synapse=None)
            Connection(lm_id, slam.landmark_id_input, synapse=None)
            Connection(lm_ssp, slam.landmark_vec_ssp, synapse=None)
            Connection(in_view, slam.no_landmark_in_view, synapse=None)
            p = Probe(slam.pathintegrator.output, synapse=0.05)
        sim = Simulator(net, seed=2, default_neuron_type=LIFRate())
        sim.run(T)
        out = sim.data[p]
        assert np.all(np.isfinite(out))
        assert np.linalg.norm(out[-1]) > 0.2


class Test1DDomain:
    def test_1d_spaces_roundtrip(self):
        from sspslam_tpu import RectangularSSPSpace
        b = np.array([[-1, 1.0]])
        for cls in (HexagonalSSPSpace, RectangularSSPSpace):
            s = cls(1, ssp_dim=41, seed=0, domain_bounds=b, length_scale=0.2)
            x = np.linspace(-0.8, 0.8, 9)[:, None]
            dec = s.decode(s.encode(x), num_samples=200)
            assert np.abs(dec - x).max() < 0.02

    def test_1d_pathint(self):
        b = 1.1 * np.array([[-1, 1.0]])
        space = HexagonalSSPSpace(1, ssp_dim=41, seed=0, domain_bounds=b,
                                  length_scale=0.3)
        d = space.ssp_dim
        ssp0 = space.encode(np.array([[0.2]])).flatten()
        with Network(seed=4) as net:
            vel = Node(lambda t: np.zeros(1))
            init = Node(lambda t: ssp0 if t < 0.05 else np.zeros(d))
            pi = PathIntegration(space, 120, 0.05, neuron_type=LIFRate())
            Connection(vel, pi.velocity_input, synapse=None)
            Connection(init, pi.input, synapse=None)
            p = Probe(pi.output, synapse=0.05)
        sim = Simulator(net, seed=4)
        sim.run(0.4)
        out = sim.data[p][-1]
        assert (out / np.linalg.norm(out)) @ ssp0 > 0.7
