"""ClosedLoopSession: tick-granular host-in-the-loop stepping.

The reference stack gets closed-loop behavior for free (nengo Nodes run
arbitrary host Python every dt); here the compiled scan cannot call the
host, so the session exchanges inputs/outputs at tick boundaries.  These
tests pin (1) bitwise equivalence with an uninterrupted open-loop run when
fed the same input rows, (2) genuine feedback through a host controller,
and (3) the bookkeeping/validation surface."""

import numpy as np
import pytest

from sspslam_tpu.nef import (ClosedLoopSession, Connection, Ensemble,
                             LIFRate, Network, Node, Probe, Simulator,
                             TimeTable)


def _net(n_steps, dt=0.001, seed=0, with_tabulated=False):
    """One live input driving an ensemble; optionally a second, tabulated
    input node summed in (to exercise mixed live/tabulated ticks)."""
    tab = np.sin(np.linspace(0, 6, n_steps, dtype=np.float32))[:, None]
    with Network(seed=seed) as net:
        live = Node(lambda t: np.zeros(1))   # placeholder; driven live
        ens = Ensemble(50, 1, neuron_type=LIFRate())
        Connection(live, ens, synapse=None)
        extra = None
        if with_tabulated:
            extra = Node(TimeTable(0.3 * tab, dt))
            Connection(extra, ens, synapse=None)
        p = Probe(ens, synapse=0.01)
    return net, live, extra, p


class TestEquivalence:
    def test_ticks_match_uninterrupted_run(self):
        """Closed-loop ticks fed the tabulated rows == one open-loop run."""
        n, seg, dt = 200, 20, 0.001
        rows = np.cos(np.linspace(0, 4, n, dtype=np.float32))[:, None]

        # open loop: the same rows as a TimeTable node
        with Network(seed=0) as net_a:
            inp = Node(TimeTable(rows, dt))
            ens = Ensemble(50, 1, neuron_type=LIFRate())
            Connection(inp, ens, synapse=None)
            pa = Probe(ens, synapse=0.01)
        sim_a = Simulator(net_a, seed=0, dt=dt)
        sim_a.run_steps(n, segment_steps=seg)

        # closed loop: same builder seed, rows supplied per tick
        net_b, live, _, pb = _net(n, dt=dt, seed=0)
        sim_b = Simulator(net_b, seed=0, dt=dt)
        sess = ClosedLoopSession(sim_b, live_inputs=[live], outputs=[pb],
                                 tick_steps=seg)
        got = [sess.tick({live: rows[i:i + seg]})[pb]
               for i in range(0, n, seg)]
        np.testing.assert_array_equal(sim_a.data[pa], np.concatenate(got))

    def test_zero_order_hold_matches_repeated_rows(self):
        net, live, _, p = _net(100)
        sim = Simulator(net, seed=0)
        sess = ClosedLoopSession(sim, live_inputs=[live], tick_steps=10)
        a = sess.tick({live: np.array([0.5])})[p]
        net2, live2, _, p2 = _net(100)
        sim2 = Simulator(net2, seed=0)
        sess2 = ClosedLoopSession(sim2, live_inputs=[live2], tick_steps=10)
        b = sess2.tick({live2: np.full((10, 1), 0.5, np.float32)})[p2]
        np.testing.assert_array_equal(a, b)

    def test_mixed_live_and_tabulated(self):
        """Non-live nodes keep their TimeTable rows, aligned to the global
        step counter across ticks."""
        n, seg, dt = 120, 30, 0.001
        net, live, extra, p = _net(n, dt=dt, with_tabulated=True)
        sim = Simulator(net, seed=0, dt=dt)
        sess = ClosedLoopSession(sim, live_inputs=[live], outputs=[p],
                                 tick_steps=seg)
        out = np.concatenate(
            [sess.tick({live: np.zeros(1, np.float32)})[p]
             for _ in range(n // seg)])

        # reference: open-loop with the live node pinned to zero
        with Network(seed=0) as net_r:
            live_r = Node(lambda t: np.zeros(1))
            ens = Ensemble(50, 1, neuron_type=LIFRate())
            Connection(live_r, ens, synapse=None)
            tab = np.sin(np.linspace(0, 6, n, dtype=np.float32))[:, None]
            Connection(Node(TimeTable(0.3 * tab, dt)), ens, synapse=None)
            p_r = Probe(ens, synapse=0.01)
        sim_r = Simulator(net_r, seed=0, dt=dt)
        sim_r.run_steps(n, segment_steps=seg)
        np.testing.assert_allclose(out, sim_r.data[p_r], rtol=1e-6, atol=1e-7)

    def test_open_loop_warmup_then_closed_loop(self):
        """run_steps then ticks: the step counter and tabulated nodes stay
        aligned (tick drops any stale preloaded table)."""
        n, dt = 90, 0.001
        net, live, extra, p = _net(n, dt=dt, with_tabulated=True)
        sim = Simulator(net, seed=0, dt=dt)
        sim.preload_inputs(30, device=False)
        sim.run_steps(30)
        sess = ClosedLoopSession(sim, live_inputs=[live], outputs=[p],
                                 tick_steps=30)
        out = sess.tick({live: np.zeros(1, np.float32)})[p]
        assert out.shape == (30, 1)
        assert sim.n_steps == 60
        np.testing.assert_allclose(sess.t, 0.060)


class TestFeedback:
    def test_host_controller_reaches_target(self):
        """A proportional host controller driving the decoded value toward a
        setpoint through the neural plant — the loop must actually close."""
        net, live, _, p = _net(1000)
        sim = Simulator(net, seed=0)
        sess = ClosedLoopSession(sim, live_inputs=[live], outputs=[p],
                                 tick_steps=25)
        target, u = 0.6, np.zeros(1, np.float32)
        est = 0.0
        for _ in range(40):
            out = sess.tick({live: u})
            est = float(out[p][-1, 0])
            u = np.array([u[0] + 0.5 * (target - est)], np.float32)
        assert abs(est - target) < 0.05


class TestValidation:
    def test_record_populates_sim_data(self):
        net, live, _, p = _net(100)
        sim = Simulator(net, seed=0)
        sess = ClosedLoopSession(sim, live_inputs=[live], outputs=[p],
                                 tick_steps=10, record=True)
        outs = [sess.tick({live: np.array([0.2])})[p] for _ in range(3)]
        np.testing.assert_array_equal(sim.data[p], np.concatenate(outs))
        assert sim.trange().shape[0] == 30

    def test_bad_inputs_raise(self):
        net, live, _, p = _net(50)
        sim = Simulator(net, seed=0)
        sess = ClosedLoopSession(sim, live_inputs=[live], tick_steps=10)
        with pytest.raises(ValueError, match="missing"):
            sess.tick({})
        with pytest.raises(ValueError, match="expected shape"):
            sess.tick({live: np.zeros((7, 1), np.float32)})
        with Network(seed=1) as other:
            stray = Node(lambda t: np.zeros(1))
            e2 = Ensemble(10, 1, neuron_type=LIFRate())
            Connection(stray, e2, synapse=None)
            p2 = Probe(e2)
        with pytest.raises(ValueError, match="not an input node"):
            ClosedLoopSession(sim, live_inputs=[stray])
        with pytest.raises(ValueError, match="not a probe"):
            ClosedLoopSession(sim, outputs=[p2])

    def test_weights_probe_rejected_as_output(self):
        from sspslam_tpu.nef import PES
        with Network(seed=0) as net:
            inp = Node(lambda t: np.zeros(1))
            a = Ensemble(30, 1, neuron_type=LIFRate())
            b = Ensemble(30, 1, neuron_type=LIFRate())
            Connection(inp, a, synapse=None)
            c = Connection(a, b, function=lambda x: x * 0,
                           learning_rule_type=PES(1e-3))
            Connection(inp, c.learning_rule, transform=-1, synapse=0.005)
            pw = Probe(c, attr="weights", sample_every=1.0)
        sim = Simulator(net, seed=0)
        with pytest.raises(ValueError, match="sparse"):
            ClosedLoopSession(sim, outputs=[pw])

    def test_sparse_probe_snapshots_when_tick_crosses_period(self):
        """Tick windows that don't divide a weights-probe period must not
        silently drop the snapshots: the session snapshots at the first
        tick boundary past each period boundary, recording the true step."""
        from sspslam_tpu.nef import PES
        with Network(seed=0) as net:
            inp = Node(lambda t: np.array([0.3]))
            live = Node(lambda t: np.zeros(1))
            a = Ensemble(30, 1, neuron_type=LIFRate())
            b = Ensemble(30, 1, neuron_type=LIFRate())
            Connection(inp, a, synapse=None)
            Connection(live, a, synapse=None)
            c = Connection(a, b, function=lambda x: x * 0,
                           learning_rule_type=PES(1e-3))
            Connection(inp, c.learning_rule, transform=-1, synapse=0.005)
            pw = Probe(c, attr="weights", sample_every=0.05)   # 50 steps
            pd = Probe(b, synapse=0.01)
        sim = Simulator(net, seed=0)
        sess = ClosedLoopSession(sim, live_inputs=[live], outputs=[pd],
                                 tick_steps=30)
        for _ in range(4):     # 120 steps; period boundaries at 50, 100
            sess.tick({live: np.zeros(1, np.float32)})
        w = sim.data[pw]
        assert w.shape[0] == 2
        bp = next(p for p in sim.model.probes if p.obj is pw)
        # snapshots taken at the tick boundaries that crossed 50 and 100
        assert sim._sparse_steps[bp.index] == [60, 120]

    def test_compile_warms_the_tick_executable(self):
        """compile() must warm the host-xs program tick() runs — even when
        a device-preloaded table exists (Simulator.compile would warm the
        device-table program, a different executable)."""
        net, live, _, p = _net(100)
        sim = Simulator(net, seed=0)
        sim.preload_inputs(100)
        sess = ClosedLoopSession(sim, live_inputs=[live], outputs=[p],
                                 tick_steps=13)
        sess.compile()
        assert 13 in sim._scan_cache          # the host-xs tick program
        assert sim.n_steps == 0               # warm-up did not advance time
        out = sess.tick({live: np.array([0.1])})[p]
        assert out.shape == (13, 1)


class TestSparseWarning:
    def test_warns_when_sparse_period_shorter_than_tick(self):
        from sspslam_tpu.nef import PES
        with Network(seed=0) as net:
            inp = Node(lambda t: np.array([0.5]))
            a = Ensemble(30, 1, neuron_type=LIFRate())
            b = Node(size_in=1)
            Connection(inp, a, synapse=None)
            c = Connection(a, b, function=lambda x: x * 0,
                           learning_rule_type=PES(1e-3))
            err = Node(lambda t, x: x, size_in=1)
            Connection(b, err, synapse=0.005)
            Connection(err, c.learning_rule, synapse=None)
            Probe(c, "weights", sample_every=0.01)   # period 10 < tick 50
        sim = Simulator(net, seed=0)
        with pytest.warns(UserWarning, match="sparse probe"):
            ClosedLoopSession(sim, live_inputs=[], tick_steps=50)
        # no warning when the tick divides into the period
        sim2 = Simulator(net, seed=0)
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            ClosedLoopSession(sim2, live_inputs=[], tick_steps=10)
