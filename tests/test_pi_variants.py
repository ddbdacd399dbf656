"""PathIntegration variant tests: grid-cell-module (GC, with and without
Kuramoto coupling) and boundary/grid-cell corrected (BCsGCs) integrators."""

import numpy as np
import pytest

from sspslam_tpu import HexagonalSSPSpace
from sspslam_tpu.models import PathIntegrationBCsGCs, PathIntegrationGC
from sspslam_tpu.nef import Connection, LIFRate, Network, Node, Probe, Simulator


@pytest.fixture(scope="module")
def space():
    bounds = 1.1 * np.tile(np.array([-1, 1.0]), (2, 1))
    # hexagonal 2-D: (d-1)/2 oscillators divisible by 3
    return HexagonalSSPSpace(2, ssp_dim=55, seed=0, length_scale=0.3,
                             domain_bounds=bounds)


def run_holding_test(pi_cls, space, seed, **kwargs):
    d = space.ssp_dim
    ssp0 = space.encode(np.array([[0.15, -0.2]])).flatten()
    with Network(seed=seed) as net:
        vel = Node(lambda t: np.zeros(2))
        init = Node(lambda t: ssp0 if t < 0.05 else np.zeros(d))
        pi = pi_cls(space, neuron_type=LIFRate(), **kwargs)
        Connection(vel, pi.velocity_input, synapse=None)
        Connection(init, pi.input, synapse=None)
        p = Probe(pi.output, synapse=0.05)
    sim = Simulator(net, seed=seed)
    sim.run(0.5)
    out = sim.data[p][-1]
    return float((out / max(np.linalg.norm(out), 1e-9)) @ ssp0)


class TestPathIntegrationGC:
    def test_uncoupled_holds_position(self, space):
        sim_val = run_holding_test(
            lambda s, **kw: PathIntegrationGC(s, 200, 0.05, coupling=False,
                                              **kw), space, seed=0)
        assert sim_val > 0.6

    def test_coupled_holds_position(self, space):
        sim_val = run_holding_test(
            lambda s, **kw: PathIntegrationGC(s, 200, 0.05, coupling=True,
                                              coupling_factor=0.1, **kw),
            space, seed=1)
        assert sim_val > 0.6


class TestPathIntegrationBCsGCs:
    def test_holds_position(self, space):
        sim_val = run_holding_test(
            lambda s, **kw: PathIntegrationBCsGCs(s, 150, 100, 0.05, **kw),
            space, seed=2)
        assert sim_val > 0.5
