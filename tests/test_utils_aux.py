"""Aux subsystem tests: utilization summary, network diagrams, spike-raster
helpers, stats."""

import os

import numpy as np

from sspslam_tpu import HexagonalSSPSpace
from sspslam_tpu.models import PathIntegration
from sspslam_tpu.nef import Connection, LIFRate, Network, Node, Probe, Simulator
from sspslam_tpu.utils import get_mean_and_ci, network_diagram, \
    process_and_save_diagram, sparsity_to_x_intercept
from sspslam_tpu.utils.profiling import (model_utilization_summary,
                                         print_utilization_summary)
from sspslam_tpu.utils.spikes import cluster, merge, sample_by_variance


def small_model():
    bounds = 1.1 * np.tile(np.array([-1, 1.0]), (2, 1))
    space = HexagonalSSPSpace(2, ssp_dim=19, seed=0, domain_bounds=bounds)
    d = space.ssp_dim
    small_model.k = (d + 1) // 2
    with Network(seed=0) as net:
        vel = Node(lambda t: np.zeros(2))
        pi = PathIntegration(space, 40, 0.05, neuron_type=LIFRate())
        Connection(vel, pi.velocity_input, synapse=None)
        p = Probe(pi.output, synapse=0.05)
    return net, p


class TestUtilization:
    def test_summary(self, capsys):
        net, _ = small_model()
        sim = Simulator(net, seed=0)
        rows = print_utilization_summary(sim.model)
        out = capsys.readouterr().out
        assert "neurons" in out
        assert sum(r["neurons"] for r in rows) == 40 * small_model.k
        assert all(r["flops_per_step"] > 0 for r in rows)


class TestNetworkDiagram:
    def test_dot_output(self, tmp_path):
        net, _ = small_model()
        sim = Simulator(net, seed=0)
        dot = network_diagram(sim.model)
        assert dot.startswith("digraph")
        assert "doubleoctagon" in dot  # the batched VCO bank
        path = process_and_save_diagram(sim.model, str(tmp_path / "m.png"))
        assert os.path.exists(path)


class TestSpikes:
    def test_helpers(self):
        rng = np.random.default_rng(0)
        t = 0.001 * np.arange(200)
        spikes = (rng.random((200, 30)) < 0.05) * 1000.0
        _, c = cluster(t, spikes)
        assert c.shape == spikes.shape
        _, m = merge(t, spikes, 10)
        assert m.shape == (200, 10)
        _, s = sample_by_variance(t, spikes, 12)
        assert s.shape == (200, 12)


class TestStats:
    def test_mean_ci(self):
        rng = np.random.default_rng(0)
        data = rng.normal(1.0, 0.1, size=(8, 20))
        out = get_mean_and_ci(data, n=500, rng=rng)
        assert len(out["mean"]) == 20
        assert np.all(np.asarray(out["lower_bound"])
                      <= np.asarray(out["upper_bound"]))

    def test_sparsity_intercept(self):
        # ~10% of uniform unit vectors in 32-D exceed the intercept
        x = sparsity_to_x_intercept(32, 0.1)
        rng = np.random.default_rng(0)
        v = rng.normal(size=(20000, 32))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        frac = np.mean(v[:, 0] > x)
        assert abs(frac - 0.1) < 0.02
