"""Simulator bookkeeping semantics: probe subsampling alignment, sparse
snapshots under awkward segmentation, trange/probe row agreement, checkpoint
rewind, and TimeTable dt conversion.  These pin behaviors a backend-vs-
backend cross-check cannot see (both executors share the bookkeeping)."""

import numpy as np
import pytest

from sspslam_tpu.nef import (PES, Connection, Ensemble, LIFRate, Network,
                             Node, Probe, Simulator, TimeTable)


def _ramp_net(n_steps, seed=0, sample_every=None, dt=0.001):
    tab = np.linspace(0, 1, n_steps, dtype=np.float32)[:, None]
    with Network(seed=seed) as net:
        inp = Node(TimeTable(tab, dt))
        ens = Ensemble(40, 1, neuron_type=LIFRate())
        Connection(inp, ens, synapse=None)
        p = Probe(ens, synapse=0.01, sample_every=sample_every)
    return Simulator(net, seed=seed, dt=dt), p


class TestDenseSubsample:
    def test_rows_match_trange_everywhere(self):
        """1170 steps at sample_every=0.01: 117 rows and 117 time points
        (float-division trange returned 116)."""
        sim, p = _ramp_net(1200, sample_every=0.01)
        sim.run_steps(1170)
        assert sim.data[p].shape[0] == 117
        assert sim.trange(0.01).shape[0] == 117
        np.testing.assert_allclose(sim.trange(0.01)[-1], 1.17)

    def test_chained_runs_keep_global_phase(self):
        """Subsampled rows must land on GLOBAL step multiples regardless of
        how the run is split into run_steps calls."""
        sim1, p1 = _ramp_net(400, sample_every=0.005)
        sim1.run_steps(400)
        sim2, p2 = _ramp_net(400, sample_every=0.005)
        sim2.run_steps(130)
        sim2.run_steps(170)
        sim2.run_steps(100)
        np.testing.assert_allclose(sim1.data[p1], sim2.data[p2],
                                   rtol=1e-6, atol=1e-7)


class TestSparseProbes:
    def _pes_net(self, sample_every, dt=0.001, n_steps=4000):
        tab = np.sin(np.linspace(0, 8, n_steps, dtype=np.float32))[:, None]
        with Network(seed=0) as net:
            inp = Node(TimeTable(tab, dt))
            a = Ensemble(30, 1, neuron_type=LIFRate())
            b = Ensemble(30, 1, neuron_type=LIFRate())
            Connection(inp, a, synapse=None)
            c = Connection(a, b, function=lambda x: x * 0,
                           learning_rule_type=PES(1e-3))
            Connection(inp, c.learning_rule, transform=-1, synapse=0.005)
            p = Probe(c, attr="weights", sample_every=sample_every)
        return Simulator(net, seed=0, dt=dt), p

    def test_chained_unaligned_runs_record_all_samples(self):
        """run_steps(2500)+run_steps(1500) with period 1000 must record the
        snapshots at steps 1000..4000 (boundary misalignment silently
        dropped the 3000/4000 samples before)."""
        sim, p = self._pes_net(1.0)
        sim.run_steps(2500)
        sim.run_steps(1500)
        assert sim.data[p].shape[0] == 4
        assert sim._sparse_steps[
            next(bp for bp in sim.model.probes if bp.obj is p).index] == \
            [1000, 2000, 3000, 4000]

    def test_non_dividing_segment_steps(self):
        """Explicit segment_steps=700 with period 1000 recorded ZERO
        samples before; now every period multiple is a boundary."""
        sim, p = self._pes_net(1.0)
        sim.run_steps(4000, segment_steps=700)
        assert sim.data[p].shape[0] == 4

    def test_matches_aligned_reference(self):
        """The snapshots themselves are identical however the run is
        segmented (same compiled step, same carry at the sample step)."""
        s1, p1 = self._pes_net(1.0)
        s1.run_steps(3000)
        s2, p2 = self._pes_net(1.0)
        s2.run_steps(1300)
        s2.run_steps(1700)
        np.testing.assert_allclose(s1.data[p1], s2.data[p2],
                                   rtol=1e-6, atol=1e-8)


class TestChainedSegments:
    def test_chained_matches_unchained(self):
        """run_steps(chain=True) fuses whole segments into one
        scan-of-scans dispatch; state and probe rows must match the
        per-segment path."""
        n, seg = 900, 200
        sim1, p1 = _ramp_net(n, sample_every=0.007)
        sim1.preload_inputs(n)
        sim1.run_steps(n, segment_steps=seg)
        want = sim1.data[p1]

        sim2, p2 = _ramp_net(n, sample_every=0.007)
        sim2.preload_inputs(n)
        sim2.run_steps(n, segment_steps=seg, chain=True)
        got = sim2.data[p2]
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(
            np.asarray(sim2.state["step"]), np.asarray(sim1.state["step"]))

    def test_chain_without_table_falls_back(self):
        sim, p = _ramp_net(300)
        sim.run_steps(300, segment_steps=100, chain=True)  # no preload
        assert sim.data[p].shape[0] == 300


class TestCheckpointSemantics:
    def test_rewind_truncates_probe_buffers(self, tmp_path):
        sim, p = _ramp_net(600)
        sim.run_steps(200)
        ck = str(tmp_path / "ck.npz")
        sim.save_checkpoint(ck)
        sim.run_steps(200)
        branch_a = sim.data[p]
        sim.load_checkpoint(ck)
        assert sim.data[p].shape[0] == 200
        sim.run_steps(200)
        np.testing.assert_allclose(sim.data[p], branch_a,
                                   rtol=1e-6, atol=1e-8)
        assert sim.data[p].shape[0] == sim.trange().shape[0]

    def test_extensionless_path_roundtrip(self, tmp_path):
        """np.savez appends .npz; load must accept the same string save
        accepted."""
        sim, p = _ramp_net(100)
        sim.run_steps(50)
        ck = str(tmp_path / "ck")   # no extension
        sim.save_checkpoint(ck)
        sim.run_steps(10)
        sim.load_checkpoint(ck)
        assert sim.n_steps == 50

    def test_rewind_in_checkpoint_born_session(self, tmp_path):
        """A simulator whose probe buffers BEGAN at a loaded checkpoint
        (fresh load at step N) must count buffered rows relative to that
        start on a second load — not keep stale divergent-timeline rows."""
        sim, p = _ramp_net(600)
        sim.run_steps(100)
        ck = str(tmp_path / "ck.npz")
        sim.save_checkpoint(ck)

        sim2, p2 = _ramp_net(600)
        sim2.load_checkpoint(ck)            # fresh session starts at 100
        assert sim2.data[p2].shape[0] == 0
        sim2.run_steps(50)
        branch_a = sim2.data[p2]
        assert branch_a.shape[0] == 50
        sim2.load_checkpoint(ck)            # rewind to the same point
        assert sim2.data[p2].shape[0] == 0  # nothing from the dropped branch
        sim2.run_steps(50)
        np.testing.assert_allclose(sim2.data[p2], branch_a,
                                   rtol=1e-6, atol=1e-8)
        assert sim2.data[p2].shape[0] == 50

    def test_rewind_before_buffer_start_clears(self, tmp_path):
        sim, p = _ramp_net(600)
        sim.run_steps(100)
        early = str(tmp_path / "early.npz")
        sim.save_checkpoint(early)
        sim.run_steps(100)
        late = str(tmp_path / "late.npz")
        sim.save_checkpoint(late)

        sim2, p2 = _ramp_net(600)
        sim2.load_checkpoint(late)           # buffers begin at 200
        sim2.run_steps(50)
        assert sim2.data[p2].shape[0] == 50
        sim2.load_checkpoint(early)          # step 100 < buffer start 200
        assert sim2.data[p2].shape[0] == 0   # those samples were never seen
        sim2.run_steps(10)
        assert sim2.data[p2].shape[0] == 10

    def test_sparse_rewind(self, tmp_path):
        t = TestSparseProbes()
        sim, p = t._pes_net(1.0)
        sim.run_steps(2000)
        ck = str(tmp_path / "ck.npz")
        sim.save_checkpoint(ck)
        sim.run_steps(2000)
        assert sim.data[p].shape[0] == 4
        sim.load_checkpoint(ck)
        assert sim.data[p].shape[0] == 2


class TestTimeTableDt:
    def test_table_dt_respected_in_fast_path(self):
        """A 10 ms-sampled table driven by a 1 ms simulator must hold each
        row ~10 sim steps (exactly what the __call__ closure semantics
        give), not play the signal 10x fast."""
        n_rows = 20
        tab = np.arange(n_rows, dtype=np.float32)[:, None]
        tt = TimeTable(tab, dt=0.01)
        with Network(seed=0) as net:
            inp = Node(tt)
            p = Probe(inp, synapse=None)
        sim = Simulator(net, seed=0, dt=0.001)
        sim.run_steps(250)   # past the 20-row x 10 ms horizon
        out = sim.data[p][:, 0]
        # the closure semantics, evaluated per step
        expect = np.array([tt((i + 1) * 0.001) for i in range(250)],
                          dtype=np.float32)[:, 0]
        np.testing.assert_array_equal(out, expect)
        assert out[-1] == n_rows - 1  # clamped past the horizon


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
