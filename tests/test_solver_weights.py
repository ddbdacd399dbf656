"""solver_weights=True (full neuron->neuron weight matrices).

The reference optionally solves full connection weights instead of factored
encoder/decoder pairs (nengo ``LstsqL2(weights=True)``; reference
pathintegration.py:180-185, passed through slam_loihi.py:192-198).  The
lowering folds post encoders into the solved decoders, so a factored and a
full-weight build of the same seeded model compute identical currents up to
float reassociation — these tests assert that equivalence end-to-end.
"""

import numpy as np

from sspslam_tpu import HexagonalSSPSpace
from sspslam_tpu.models import PathIntegration
from sspslam_tpu.nef import (Connection, Ensemble, Network, Node, Probe,
                             Simulator, LIFRate)


def _pi_run(space, solver_weights, seed=3):
    d = space.ssp_dim
    ssp0 = space.encode(np.array([[0.1, -0.25]])).flatten()
    with Network(seed=seed) as net:
        vel = Node(lambda t: np.array([0.3, -0.2]) * (t > 0.06))
        init = Node(lambda t: ssp0 if t < 0.05 else np.zeros(d))
        pi = PathIntegration(space, 120, 0.05, neuron_type=LIFRate(),
                             solver_weights=solver_weights)
        Connection(vel, pi.velocity_input, synapse=None)
        Connection(init, pi.input, synapse=None)
        p = Probe(pi.output, synapse=0.05)
    sim = Simulator(net, seed=seed)
    sim.run(0.4)
    return sim.data[p]


class TestFullWeightEquivalence:
    def test_pathintegration_matches_factored(self):
        bounds = 1.1 * np.tile(np.array([-1, 1.0]), (2, 1))
        space = HexagonalSSPSpace(2, ssp_dim=31, seed=0, length_scale=0.3,
                                  domain_bounds=bounds)
        y_fact = _pi_run(space, solver_weights=False)
        y_full = _pi_run(space, solver_weights=True)
        # identical seeded build => identical math up to reassociation
        denom = max(float(np.abs(y_fact).max()), 1e-9)
        assert np.max(np.abs(y_full - y_fact)) / denom < 1e-3

    def test_single_ensemble_connection(self):
        """ens->ens channel built with full weights matches the factored
        build (same seed, rate neurons)."""
        def run(solver_weights):
            with Network(seed=7) as net:
                inp = Node(lambda t: np.array([0.8 * np.sin(4 * t), 0.3]))
                a = Ensemble(90, 2, neuron_type=LIFRate())
                b = Ensemble(90, 2, neuron_type=LIFRate())
                Connection(inp, a, synapse=None)
                Connection(a, b, synapse=0.01,
                           solver_weights=solver_weights)
                p = Probe(b, synapse=0.02)
            sim = Simulator(net, seed=7)
            sim.run(0.3)
            return sim.data[p]

        y_fact = run(False)
        y_full = run(True)
        assert np.max(np.abs(y_full - y_fact)) < 1e-3
        # and it actually transmits the signal
        assert np.max(np.abs(y_fact[-50:])) > 0.1
