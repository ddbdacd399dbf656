"""Compiled-vs-interpreted backend cross-check — the analogue of the
reference's cpu-vs-ocl validation (SURVEY.md §4): the jitted lax.scan
executor and the NumPy per-step interpreter must agree on the same built
model to float32 tolerance."""

import numpy as np

from sspslam_tpu import HexagonalSSPSpace
from sspslam_tpu.models import PathIntegration
from sspslam_tpu.nef import (Connection, Ensemble, LIF, LIFRate, Network,
                             Node, PES, Probe, Simulator)
from sspslam_tpu.nef.reference_backend import NumpyStepper


def cross_check(net, T=0.2, seed=0, atol=1e-3):
    sim = Simulator(net, seed=seed)
    n_steps = int(T / sim.dt)
    inputs = sim._tabulate_inputs(n_steps)
    np_tables = [np.asarray(c) for c in inputs]

    ref = NumpyStepper(sim.model)
    ref_out = ref.run_steps(n_steps, np_tables)

    sim.run_steps(n_steps)
    for bp in sim.model.probes:
        if bp.sparse:
            continue
        jit_v = np.concatenate([np.asarray(c) for c in sim._probe_data[bp.index]], axis=0)
        ref_v = ref_out[bp.index]
        err = np.max(np.abs(jit_v - ref_v))
        scale = max(np.max(np.abs(ref_v)), 1.0)
        assert err / scale < atol, f"probe {bp.index}: err {err}, scale {scale}"


class TestBackendCrossCheck:
    def test_channel_with_learning(self):
        val = np.array([0.5, -0.2])
        with Network(seed=0) as net:
            inp = Node(lambda t: val)
            ens = Ensemble(120, 2, neuron_type=LIFRate(), seed=0)
            out = Node(size_in=2)
            Connection(inp, ens, synapse=None)
            c = Connection(ens, out, function=lambda x: np.zeros(2),
                           learning_rule_type=PES(1e-3), synapse=0.02)
            err = Node(size_in=2)
            Connection(out, err, synapse=0.02)
            Connection(inp, err, transform=-1.0, synapse=0.02)
            Connection(err, c.learning_rule, synapse=0.02)
            p = Probe(out, synapse=0.02)
        cross_check(net, T=0.3, seed=0)

    def test_spiking_pathintegration(self):
        bounds = 1.1 * np.tile(np.array([-1, 1.0]), (2, 1))
        space = HexagonalSSPSpace(2, ssp_dim=31, seed=0, length_scale=0.3,
                                  domain_bounds=bounds)
        d = space.ssp_dim
        ssp0 = space.encode(np.array([[0.1, -0.1]])).flatten()
        with Network(seed=1) as net:
            vel = Node(lambda t: np.array([0.1, 0.05]))
            init = Node(lambda t: ssp0 if t < 0.05 else np.zeros(d))
            pi = PathIntegration(space, 60, 0.05, neuron_type=LIF())
            Connection(vel, pi.velocity_input, synapse=None)
            Connection(init, pi.input, synapse=None)
            p = Probe(pi.output, synapse=0.05)
        cross_check(net, T=0.15, seed=1, atol=5e-3)
