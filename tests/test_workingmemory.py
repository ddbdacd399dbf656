"""Working-memory and remaining-component tests."""

import numpy as np

from sspslam_tpu.models import AdditiveInputGatedMemory
from sspslam_tpu.nef import (Connection, Ensemble, LIFRate, Network, Node,
                             Probe, QuantizedLIF, Simulator, SSPSobol)
from sspslam_tpu import HexagonalSSPSpace


class TestAdditiveInputGatedMemory:
    def test_gate_holds_value(self):
        """Load a value, close the gate, change the input: stored value
        persists (reference workingmemory.py behavior)."""
        val = 0.6
        with Network(seed=0) as net:
            stim = Node(lambda t: np.array([val if t < 0.3 else -0.8]))
            inp_ens = Ensemble(150, 1, neuron_type=LIFRate(), seed=0)
            Connection(stim, inp_ens, synapse=None)
            wm = AdditiveInputGatedMemory(inp_ens, inp_ens, 150, 1,
                                          gain=0.3, recurrent_synapse=0.1,
                                          neuron_type=LIFRate())
            gate = Node(lambda t: np.array([0.0 if t < 0.3 else 3.0]))
            Connection(gate, wm.gate, synapse=None)
            reset = Node(lambda t: np.array([0.0]))
            Connection(reset, wm.reset, synapse=None)
            p = Probe(wm.output, synapse=0.05)
        sim = Simulator(net, seed=0, default_neuron_type=LIFRate())
        sim.run(1.0)
        y = sim.data[p][:, 0]
        # value accumulated while gate open, persists after input flips
        level_at_gate_close = y[300]
        assert level_at_gate_close > 0.2
        assert abs(y[-1] - level_at_gate_close) < 0.25
        # stored value did NOT follow the flipped input
        assert y[-1] > -0.1

    def test_reset_clears(self):
        with Network(seed=1) as net:
            stim = Node(lambda t: np.array([0.7]))
            inp_ens = Ensemble(120, 1, neuron_type=LIFRate(), seed=1)
            Connection(stim, inp_ens, synapse=None)
            wm = AdditiveInputGatedMemory(inp_ens, inp_ens, 120, 1,
                                          gain=0.3, recurrent_synapse=0.1,
                                          neuron_type=LIFRate())
            gate = Node(lambda t: np.array([0.0 if t < 0.3 else 3.0]))
            Connection(gate, wm.gate, synapse=None)
            reset = Node(lambda t: np.array([0.0 if t < 0.5 else 3.0]))
            Connection(reset, wm.reset, synapse=None)
            p = Probe(wm.output, synapse=0.05)
        sim = Simulator(net, seed=1, default_neuron_type=LIFRate())
        sim.run(0.9)
        y = sim.data[p][:, 0]
        assert y[450] > 0.15          # held before reset
        assert abs(y[-1]) < 0.1       # cleared after reset


class TestQuantizedLIF:
    def test_channel_with_quantized_neurons(self):
        val = np.array([0.4])
        with Network(seed=2) as net:
            inp = Node(lambda t: val)
            ens = Ensemble(300, 1, neuron_type=QuantizedLIF(levels=128),
                           seed=2)
            out = Node(size_in=1)
            Connection(inp, ens, synapse=None)
            Connection(ens, out, synapse=0.05)
            p = Probe(out)
        sim = Simulator(net, seed=2)
        sim.run(0.4)
        assert np.isclose(sim.data[p][-80:].mean(), 0.4, atol=0.07)


class TestSSPEvalPoints:
    def test_ensemble_with_ssp_eval_points(self):
        """Ensembles can draw eval points from the SSP manifold
        (SSPSobol), improving decode accuracy for SSP-valued signals."""
        bounds = np.tile(np.array([-1, 1.0]), (2, 1))
        space = HexagonalSSPSpace(2, ssp_dim=31, seed=0, length_scale=0.3,
                                  domain_bounds=bounds)
        d = space.ssp_dim
        phi = space.encode(np.array([[0.3, -0.2]])).flatten()
        with Network(seed=3) as net:
            inp = Node(lambda t: phi)
            ens = Ensemble(300, d, neuron_type=LIFRate(),
                           eval_points=SSPSobol(space), seed=3)
            out = Node(size_in=d)
            Connection(inp, ens, synapse=None)
            Connection(ens, out, synapse=0.02)
            p = Probe(out)
        sim = Simulator(net, seed=3)
        sim.run(0.3)
        got = sim.data[p][-50:].mean(axis=0)
        assert (got / np.linalg.norm(got)) @ phi > 0.85
