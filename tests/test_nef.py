"""NEF engine tests: neuron response curves, gain/bias inversion, decoder
accuracy, synapse filtering, communication channels, recurrent integrators,
and PES/Voja learning — the validation style SURVEY.md §4 prescribes."""

import numpy as np
import jax.numpy as jnp
import pytest

from sspslam_tpu import nef
from sspslam_tpu.nef import (Connection, Ensemble, EnsembleArray, Network,
                             Node, Probe, Simulator, PES, Voja)
from sspslam_tpu.ops.neurons import LIF, LIFRate, RectifiedLinear


class TestNeurons:
    def test_lif_gain_bias_inverts_rates(self):
        nt = LIFRate()
        max_rates = np.array([200.0, 300.0, 400.0])
        intercepts = np.array([-0.5, 0.0, 0.5])
        gain, bias = nt.gain_bias(max_rates, intercepts)
        # at x = 1 the rate should equal max_rate
        r1 = np.asarray(nt.rates(jnp.asarray(gain * 1.0 + bias)))
        assert np.allclose(r1, max_rates, rtol=1e-3)
        # at the intercept the rate should be ~0
        r0 = np.asarray(nt.rates(jnp.asarray(gain * intercepts + bias)))
        assert np.all(r0 < 1.0)

    def test_relu_gain_bias(self):
        nt = RectifiedLinear()
        gain, bias = nt.gain_bias(np.array([100.0]), np.array([0.2]))
        assert np.isclose(gain * 1.0 + bias, 100.0)
        assert np.isclose(gain * 0.2 + bias, 0.0)

    def test_lif_spike_rate_matches_rate_curve(self):
        nt = LIF()
        dt = 0.001
        J = jnp.asarray(np.linspace(0.5, 10.0, 32))
        state = nt.init_state(J.shape)
        total = np.zeros(J.shape)
        T = 2000
        for _ in range(T):
            state, out = nt.step(state, J, dt)
            total += np.asarray(out) * dt
        empirical = total / (T * dt)
        analytic = np.asarray(nt.rates(J))
        assert np.allclose(empirical, analytic, atol=2.5)


class TestLoihiLIF:
    """The Loihi-discretised neuron's spiking dynamics must agree BIT-EXACTLY
    with its own closed-form rate curve: inter-spike intervals are integer
    step counts ``round(tau_ref/dt) + ceil((tau_rc/dt)·log1p(1/(J-1)))``."""

    def test_isi_bit_exact(self):
        from sspslam_tpu.ops.neurons import LoihiLIF
        dt = 0.001
        nt = LoihiLIF(dt=dt)
        J = jnp.asarray(np.linspace(1.05, 12.0, 40))
        state = nt.init_state(J.shape)
        spike_steps = [[] for _ in range(J.shape[0])]
        for i in range(3000):
            state, out = nt.step(state, J, dt)
            for idx in np.nonzero(np.asarray(out) > 0)[0]:
                spike_steps[idx].append(i)
        want_isi = nt._isi_steps_np(np.asarray(J))
        for idx in range(J.shape[0]):
            isis = np.diff(spike_steps[idx])
            assert len(isis) > 3
            # every steady-state ISI is exactly the closed-form step count
            assert np.all(isis == int(want_isi[idx])), (
                f"J={float(J[idx])}: isis {np.unique(isis)} "
                f"!= {want_isi[idx]}")

    def test_rates_match_empirical_exactly(self):
        from sspslam_tpu.ops.neurons import LoihiLIF
        dt = 0.001
        nt = LoihiLIF(dt=dt)
        J = jnp.asarray(np.array([1.2, 2.0, 5.0, 9.0]))
        analytic = nt.rates_np(np.asarray(J))
        # steady-state empirical rate = 1/(dt*ISI) = analytic, exactly
        state = nt.init_state(J.shape)
        spikes = np.zeros(J.shape)
        warm = 500
        T = 4000
        for i in range(T):
            state, out = nt.step(state, J, dt)
            if i >= warm:
                spikes += np.asarray(out) * dt
        emp = spikes / ((T - warm) * dt)
        # windowed counting quantises at 1/(window) = 0.29 Hz
        assert np.allclose(emp, analytic, atol=0.5)

    def test_rates_below_continuous_lif(self):
        from sspslam_tpu.ops.neurons import LoihiLIF
        nt = LoihiLIF()
        smooth = LIFRate()
        J = np.linspace(1.01, 30.0, 200)
        rq = nt.rates_np(J)
        rs = smooth.rates_np(J)
        # ceil-quantised periods => rate never exceeds the continuous curve
        assert np.all(rq <= rs + 1e-9)
        assert np.all(np.diff(rq) >= -1e-9)  # monotone

    def test_pathintegration_with_loihilif_holds(self):
        from sspslam_tpu import HexagonalSSPSpace
        from sspslam_tpu.models import PathIntegration
        from sspslam_tpu.nef import LoihiLIF
        bounds = 1.1 * np.tile(np.array([-1, 1.0]), (2, 1))
        space = HexagonalSSPSpace(2, ssp_dim=31, seed=0, length_scale=0.3,
                                  domain_bounds=bounds)
        d = space.ssp_dim
        ssp0 = space.encode(np.array([[0.15, -0.2]])).flatten()
        with Network(seed=0) as net:
            vel = Node(lambda t: np.zeros(2))
            init = Node(lambda t: ssp0 if t < 0.05 else np.zeros(d))
            pi = PathIntegration(space, 250, 0.05, neuron_type=LoihiLIF())
            Connection(vel, pi.velocity_input, synapse=None)
            Connection(init, pi.input, synapse=None)
            p = Probe(pi.output, synapse=0.05)
        sim = Simulator(net, seed=0)
        sim.run(0.5)
        out = sim.data[p][-1]
        sim_val = float((out / max(np.linalg.norm(out), 1e-9)) @ ssp0)
        assert sim_val > 0.7


class TestSynapse:
    def test_lowpass_step_response(self):
        with Network() as net:
            inp = Node(lambda t: np.array([1.0]))
            out = Node(size_in=1)
            Connection(inp, out, synapse=0.05)
            p = Probe(out)
        sim = Simulator(net, seed=0)
        sim.run(0.3)
        y = sim.data[p][:, 0]
        t = sim.trange()
        want = 1 - np.exp(-t / 0.05)
        assert np.allclose(y, want, atol=0.05)

    def test_alpha_step_response(self):
        from sspslam_tpu.nef import Alpha
        tau = 0.02
        with Network() as net:
            inp = Node(lambda t: np.array([1.0]))
            out = Node(size_in=1)
            Connection(inp, out, synapse=Alpha(tau))
            p = Probe(out)
        sim = Simulator(net, seed=0)
        sim.run(0.2)
        y = sim.data[p][:, 0]
        t = sim.trange()
        want = 1 - np.exp(-t / tau) * (1 + t / tau)  # alpha step response
        assert np.allclose(y, want, atol=0.03)
        assert abs(y[-1] - 1.0) < 1e-3  # unit DC gain

    def test_alpha_impulse_peaks_at_tau(self):
        from sspslam_tpu.nef import Alpha
        tau, dt = 0.015, 0.001
        with Network() as net:
            inp = Node(lambda t: np.array([1.0 / dt]) if t <= 1.5 * dt
                       else np.zeros(1))
            out = Node(size_in=1)
            Connection(inp, out, synapse=Alpha(tau))
            p = Probe(out)
        sim = Simulator(net, seed=0)
        sim.run(0.1)
        y = sim.data[p][:, 0]
        t_peak = sim.trange()[int(np.argmax(y))]
        assert abs(t_peak - tau) < 3 * dt  # h(t) = t/tau^2 e^{-t/tau} peaks at tau

    def test_alpha_probe_synapse(self):
        from sspslam_tpu.nef import Alpha
        with Network() as net:
            inp = Node(lambda t: np.array([1.0]))
            p = Probe(inp, synapse=Alpha(0.01))
        sim = Simulator(net, seed=0)
        sim.run(0.15)
        assert abs(sim.data[p][-1, 0] - 1.0) < 1e-3

    def test_none_synapse_is_instant(self):
        with Network() as net:
            inp = Node(lambda t: np.array([2.0, -1.0]))
            out = Node(size_in=2)
            Connection(inp, out, synapse=None)
            p = Probe(out)
        sim = Simulator(net, seed=0)
        sim.run(0.01)
        assert np.allclose(sim.data[p], [[2.0, -1.0]] * 10)

    def test_transform_matrix(self):
        W = np.array([[1.0, 2.0], [0.0, -1.0], [3.0, 0.5]])
        with Network() as net:
            inp = Node(lambda t: np.array([1.0, 1.0]))
            out = Node(size_in=3)
            Connection(inp, out, transform=W, synapse=None)
            p = Probe(out)
        sim = Simulator(net, seed=0)
        sim.run(0.005)
        assert np.allclose(sim.data[p][-1], W @ np.array([1.0, 1.0]))


class TestCommunication:
    @pytest.mark.parametrize("nt", [LIFRate(), None])
    def test_channel(self, nt):
        val = np.array([0.4, -0.3])
        with Network(seed=1) as net:
            inp = Node(lambda t: val)
            ens = Ensemble(200, 2, neuron_type=nt, seed=1)
            out = Node(size_in=2)
            Connection(inp, ens, synapse=None)
            Connection(ens, out, synapse=0.02)
            p = Probe(out)
        sim = Simulator(net, seed=1)
        sim.run(0.3)
        got = sim.data[p][-50:].mean(axis=0)
        assert np.allclose(got, val, atol=0.05)

    def test_decoded_function(self):
        with Network(seed=2) as net:
            inp = Node(lambda t: np.array([0.5]))
            ens = Ensemble(300, 1, neuron_type=LIFRate(), seed=2)
            out = Node(size_in=1)
            Connection(inp, ens, synapse=None)
            Connection(ens, out, function=lambda x: x**2, synapse=0.02)
            p = Probe(out)
        sim = Simulator(net, seed=2)
        sim.run(0.3)
        assert np.isclose(sim.data[p][-1, 0], 0.25, atol=0.05)

    def test_slicing_post(self):
        with Network(seed=3) as net:
            a = Node(lambda t: np.array([1.0]))
            b = Node(lambda t: np.array([-1.0]))
            out = Node(size_in=3)
            Connection(a, out[0], synapse=None)
            Connection(b, out[2], synapse=None)
            p = Probe(out)
        sim = Simulator(net, seed=3)
        sim.run(0.005)
        assert np.allclose(sim.data[p][-1], [1.0, 0.0, -1.0])

    def test_jnp_func_node(self):
        with Network(seed=4) as net:
            inp = Node(lambda t: np.array([0.3, 0.4]))
            gate = Node(lambda t, x: jnp.where(jnp.sum(x) > 0.5, x, 0.0),
                        size_in=2)
            Connection(inp, gate, synapse=None)
            p = Probe(gate)
        sim = Simulator(net, seed=4)
        sim.run(0.005)
        assert np.allclose(sim.data[p][-1], [0.3, 0.4])


class TestIntegrator:
    def test_neural_integrator_holds_value(self):
        """Recurrent ensemble with identity feedback holds its state."""
        tau = 0.1
        with Network(seed=5) as net:
            inp = Node(lambda t: np.array([0.8 if t < 0.2 else 0.0]))
            ens = Ensemble(400, 1, neuron_type=LIFRate(), seed=5)
            Connection(inp, ens, transform=tau / 0.2, synapse=tau)
            Connection(ens, ens, synapse=tau)
            p = Probe(ens, synapse=0.02)
        sim = Simulator(net, seed=5)
        sim.run(1.0)
        y = sim.data[p][:, 0]
        # after input ends (~0.2 s), the integrator should hold ~0.8-ish
        level = y[400]
        drift = abs(y[-1] - level)
        assert level > 0.5
        assert drift < 0.15

    def test_oscillator(self):
        """Decoded harmonic oscillator: 2-D recurrent rotation."""
        tau = 0.1
        w = 2 * np.pi * 2.0  # 2 Hz

        def feedback(x):
            return [x[0] - tau * w * x[1], x[1] + tau * w * x[0]]

        with Network(seed=6) as net:
            kick = Node(lambda t: np.array([1.0, 0.0]) if t < 0.05
                        else np.zeros(2))
            ens = Ensemble(600, 2, neuron_type=LIFRate(), seed=6)
            Connection(kick, ens, synapse=None)
            Connection(ens, ens, function=feedback, synapse=tau)
            p = Probe(ens, synapse=0.02)
        sim = Simulator(net, seed=6)
        sim.run(1.0)
        y = sim.data[p]
        # amplitude persists
        assert np.max(np.abs(y[-200:, 0])) > 0.4
        # frequency roughly 2 Hz: count zero crossings in second half
        s = np.sign(y[500:, 0])
        crossings = np.sum(np.abs(np.diff(s)) > 1)
        assert 1 <= crossings <= 4  # 2 Hz over 0.5 s = 1 period = 2 crossings


class TestEnsembleArray:
    def test_ea_passthrough(self):
        k, d = 4, 2
        val = np.linspace(-0.6, 0.6, k * d)
        with Network(seed=7) as net:
            inp = Node(lambda t: val)
            ea = EnsembleArray(150, k, ens_dimensions=d, neuron_type=LIFRate(),
                               seed=7)
            Connection(inp, ea.input, synapse=None)
            p = Probe(ea.output, synapse=0.02)
        sim = Simulator(net, seed=7)
        sim.run(0.3)
        assert np.allclose(sim.data[p][-1], val, atol=0.07)

    def test_ea_add_output_square(self):
        k = 3
        val = np.array([0.5, -0.4, 0.8])
        with Network(seed=8) as net:
            inp = Node(lambda t: val)
            ea = EnsembleArray(200, k, ens_dimensions=1, neuron_type=LIFRate(),
                               radius=1.0, seed=8)
            sq = ea.add_output("square", np.square)
            Connection(inp, ea.input, synapse=None)
            p = Probe(sq, synapse=0.02)
        sim = Simulator(net, seed=8)
        sim.run(0.3)
        assert np.allclose(sim.data[p][-1], val**2, atol=0.07)

    def test_batched_recurrent_ea(self):
        """Each element holds its own value through identity feedback."""
        from sspslam_tpu.nef import BatchedConnection
        k = 5
        tau = 0.1
        vals = np.linspace(-0.5, 0.5, k)
        with Network(seed=9) as net:
            inp = Node(lambda t: vals if t < 0.2 else np.zeros(k))
            ea = EnsembleArray(200, k, ens_dimensions=1, neuron_type=LIFRate(),
                               seed=9)
            Connection(inp, ea.input, transform=tau / 0.2 * np.eye(k),
                       synapse=tau)
            BatchedConnection(ea, ea, function=lambda x: x, synapse=tau)
            p = Probe(ea.output, synapse=0.02)
        sim = Simulator(net, seed=9)
        sim.run(0.6)
        end = sim.data[p][-1]
        assert np.allclose(end, vals, atol=0.12)


class TestLearning:
    def test_pes_learns_identity(self):
        """PES moves a zero-initialised decode toward the target signal."""
        val = np.array([0.6, -0.2])
        with Network(seed=10) as net:
            inp = Node(lambda t: val)
            ens = Ensemble(200, 2, neuron_type=LIFRate(), seed=10)
            out = Node(size_in=2)
            Connection(inp, ens, synapse=None)
            c = Connection(ens, out, function=lambda x: np.zeros(2),
                           learning_rule_type=PES(1e-3), synapse=0.02)
            err = Node(size_in=2)
            Connection(out, err, synapse=0.02)
            Connection(inp, err, transform=-1.0, synapse=0.02)
            Connection(err, c.learning_rule, synapse=0.02)
            p = Probe(out, synapse=0.02)
        sim = Simulator(net, seed=10)
        sim.run(2.0)
        got = sim.data[p][-100:].mean(axis=0)
        assert np.allclose(got, val, atol=0.1)

    def test_voja_moves_encoders(self):
        """Voja drifts active encoders toward the presented key."""
        key = np.array([1.0, 0.0])
        with Network(seed=11) as net:
            inp = Node(lambda t: key)
            ens = Ensemble(50, 2, neuron_type=LIFRate(),
                           intercepts=nef.Uniform(0.1, 0.3), seed=11)
            c = Connection(inp, ens, synapse=None,
                           learning_rule_type=Voja(5e-2, post_synapse=None))
            p = Probe(c.learning_rule, attr="scaled_encoders",
                      sample_every=None)
        sim = Simulator(net, seed=11)
        e0 = np.asarray(sim.state["learned"]["voja_" + str(
            next(bc.index for bc in sim.model.connections
                 if bc.voja_rule is not None))])
        sim.run(1.0)
        eT = sim.data[p][-1]
        # normalize and measure alignment with the key
        def align(E):
            En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-9)
            return En @ key
        # active neurons (aligned enough to fire) should align more over time
        active = align(e0) > 0.3
        assert active.sum() > 0
        assert np.mean(align(eT)[active]) > np.mean(align(e0)[active]) + 0.1

    def test_learning_gate_inhibition(self):
        """Driving neurons with strong negative current silences an ensemble."""
        with Network(seed=12) as net:
            inp = Node(lambda t: np.array([0.5]))
            gate = Node(lambda t: np.array([10.0]))
            ens = Ensemble(100, 1, neuron_type=LIFRate(), seed=12)
            out = Node(size_in=1)
            Connection(inp, ens, synapse=None)
            Connection(gate, ens.neurons,
                       transform=-2.5 * np.ones((100, 1)), synapse=None)
            Connection(ens, out, synapse=0.02)
            p = Probe(out)
        sim = Simulator(net, seed=12)
        sim.run(0.2)
        assert np.abs(sim.data[p][-1, 0]) < 0.02


class TestProbesAndDeterminism:
    def test_sample_every(self):
        with Network(seed=13) as net:
            inp = Node(lambda t: np.array([t]))
            p = Probe(inp, sample_every=0.01)
        sim = Simulator(net, seed=13)
        sim.run(0.1)
        assert sim.data[p].shape[0] == 10
        assert np.allclose(sim.data[p][:, 0], 0.01 * np.arange(1, 11), atol=1e-5)

    def test_determinism(self):
        def make():
            with Network(seed=14) as net:
                inp = Node(lambda t: np.array([np.sin(t)]))
                ens = Ensemble(100, 1, seed=14)
                Connection(inp, ens, synapse=None)
                p = Probe(ens, synapse=0.01)
            sim = Simulator(net, seed=14)
            sim.run(0.1)
            return sim.data[p]

        a, b = make(), make()
        assert np.array_equal(a, b)

    def test_spiking_lif_end_to_end(self):
        val = np.array([0.5])
        with Network(seed=15) as net:
            inp = Node(lambda t: val)
            ens = Ensemble(300, 1, neuron_type=LIF(), seed=15)
            out = Node(size_in=1)
            Connection(inp, ens, synapse=None)
            Connection(ens, out, synapse=0.05)
            p = Probe(out)
            spikes = Probe(ens.neurons)
        sim = Simulator(net, seed=15)
        sim.run(0.5)
        assert np.isclose(sim.data[p][-100:].mean(), 0.5, atol=0.05)
        sp = sim.data[spikes]
        assert sp.shape == (500, 300)
        assert np.all((sp == 0) | (sp == 1000.0))


class TestDeviceSolve:
    def test_device_solve_matches_host(self):
        """Large-ensemble decoder solve on device agrees with the host
        normal-equation solve."""
        import numpy as np
        from sspslam_tpu.nef.builder import build
        from sspslam_tpu.nef.solvers import (lstsq_l2,
                                             solve_decoders_on_device)
        from sspslam_tpu.ops.neurons import LIFRate

        rng = np.random.default_rng(0)
        n, d, m = 400, 4, 900
        nt = LIFRate()
        enc = rng.normal(size=(n, d)); enc /= np.linalg.norm(enc, axis=1,
                                                             keepdims=True)
        gain, bias = nt.gain_bias(rng.uniform(200, 400, n),
                                  rng.uniform(-0.9, 0.8, n))
        scaled = enc * gain[:, None]
        ep = rng.uniform(-1, 1, size=(m, d))
        targets = ep.copy()
        acts = nt.rates_np(ep @ scaled.T + bias[None, :])
        host = lstsq_l2(acts, targets)
        dev = solve_decoders_on_device(nt, scaled, bias, ep, targets)
        # identical math modulo f32 factorisation
        assert np.allclose(host, dev, atol=2e-4), np.abs(host - dev).max()
        # both decode the identity acceptably
        err = np.linalg.norm(acts @ dev - targets) / np.linalg.norm(targets)
        assert err < 0.1

    def test_large_ensemble_builds_via_device_path(self):
        from sspslam_tpu.nef import (Connection, Ensemble, LIFRate, Network,
                                     Node, Probe, Simulator)
        import numpy as np
        with Network(seed=0) as net:
            inp = Node(lambda t: np.array([0.4, -0.2]))
            ens = Ensemble(2200, 2, neuron_type=LIFRate(), seed=0)
            out = Node(size_in=2)
            Connection(inp, ens, synapse=None)
            Connection(ens, out, synapse=0.02)
            p = Probe(out)
        sim = Simulator(net, seed=0)
        sim.run(0.2)
        assert np.allclose(sim.data[p][-30:].mean(axis=0), [0.4, -0.2],
                           atol=0.05)


class TestPreloadAndCompile:
    """Simulator.preload_inputs / Simulator.compile (packed-xs pipeline)."""

    def _pi_net(self, seed=0):
        import numpy as np
        from sspslam_tpu import HexagonalSSPSpace
        from sspslam_tpu.models import PathIntegration
        from sspslam_tpu.nef import (Connection, LIFRate, Network, Node,
                                     Probe, TimeTable)
        dt = 0.001
        n = 300
        ts = dt * np.arange(n)
        path = 0.4 * np.stack([np.sin(2 * np.pi * ts / 0.3),
                               np.cos(2 * np.pi * ts / 0.3)], 1)
        vels = (1 / dt) * np.diff(path, axis=0, prepend=path[:1])
        bounds = 1.2 * np.tile(np.array([-1, 1.0]), (2, 1))
        space = HexagonalSSPSpace(2, ssp_dim=31, seed=seed,
                                  length_scale=0.3, domain_bounds=bounds)
        scale = 1 / np.max(np.abs(space.phase_matrix @ vels.T))
        init = space.encode(path[:1]).flatten()
        with Network(seed=seed) as net:
            vel = Node(TimeTable(vels * scale, dt))
            ini = Node(lambda t: init if t < 0.05
                       else np.zeros(space.ssp_dim))
            pi = PathIntegration(space, 100, 0.05, scaling_factor=scale,
                                 stable=True, neuron_type=LIFRate())
            Connection(vel, pi.velocity_input, synapse=None)
            Connection(ini, pi.input, synapse=None)
            p = Probe(pi.output, synapse=0.05)
        return net, p, n

    def test_preloaded_matches_streaming_bitwise(self):
        import numpy as np
        from sspslam_tpu.nef import Simulator
        net, p, n = self._pi_net()
        sA = Simulator(net, seed=0)
        sA.run_steps(n, segment_steps=100)
        netB, pB, _ = self._pi_net()
        sB = Simulator(netB, seed=0)
        sB.preload_inputs(n)
        sB.run_steps(n, segment_steps=100)
        assert np.array_equal(np.asarray(sA.data[p]),
                              np.asarray(sB.data[pB]))
        # past the preloaded horizon: clamped last-row repeats, no crash
        sB.run_steps(120, segment_steps=60)

    def test_compile_does_not_advance_state(self):
        import numpy as np
        from sspslam_tpu.nef import Simulator
        net, p, n = self._pi_net()
        sA = Simulator(net, seed=0)
        sA.compile(n, segment_steps=128)   # includes a 300 % 128 tail seg
        assert sA.n_steps == 0
        sA.run_steps(n, segment_steps=128)
        netB, pB, _ = self._pi_net()
        sB = Simulator(netB, seed=0)
        sB.run_steps(n, segment_steps=128)
        assert np.array_equal(np.asarray(sA.data[p]),
                              np.asarray(sB.data[pB]))

    def test_learning_rate_is_traced_not_baked(self):
        """Learning rates live in the params pytree (zero-recompile
        hyperparameter sweeps); lr=0 must freeze the decoders."""
        val = np.array([0.5, -0.4])

        def mk(lr):
            with Network(seed=12) as net:
                inp = Node(lambda t: val)
                ens = Ensemble(120, 2, neuron_type=LIFRate(), seed=12)
                out = Node(size_in=2)
                Connection(inp, ens, synapse=None)
                c = Connection(ens, out, function=lambda x: np.zeros(2),
                               learning_rule_type=PES(lr), synapse=0.02)
                err = Node(size_in=2)
                Connection(out, err, synapse=0.02)
                Connection(inp, err, transform=-1.0, synapse=0.02)
                Connection(err, c.learning_rule, synapse=0.02)
                p = Probe(out, synapse=0.02)
            return net, p
        net0, p0 = mk(0.0)
        s0 = Simulator(net0, seed=12)
        s0.run(0.5)
        assert np.allclose(s0.data[p0][-50:], 0.0, atol=1e-6)
        net1, p1 = mk(1e-3)
        s1 = Simulator(net1, seed=12)
        # swap the traced learning rate only — same compiled program
        slot = next(bc.learned_slot for bc in s1.model.connections
                    if bc.pes_rule is not None)
        assert float(s1.params["hyper"]["lr"][slot]) == np.float32(1e-3)
        s1.run(0.5)
        assert np.abs(s1.data[p1][-50:]).max() > 0.05


class TestSimulatorEdgeCases:
    """Round-3 regression tests: past-horizon clamp with long segments,
    checkpoint/preload interaction, solver cache-key robustness."""

    def test_preload_clamp_long_segment(self):
        """segment_steps > the preload pad (DEFAULT_SEGMENT_STEPS): rows
        past the tabulated horizon must repeat the LAST row (TimeTable
        clamp), never replay earlier rows or shape-mismatch."""
        import numpy as np
        from sspslam_tpu.nef import Network, Node, Probe, Simulator
        from sspslam_tpu.nef.processes import TimeTable
        rows = np.arange(50, dtype=np.float32)[:, None]
        with Network() as net:
            nd = Node(TimeTable(rows, 0.001))
            p = Probe(nd)
        sim = Simulator(net)
        sim.preload_inputs(50)
        sim.run_steps(2400, segment_steps=1200)
        out = np.asarray(sim.data[p]).ravel()
        assert np.array_equal(out[:50], rows.ravel())
        assert np.all(out[50:] == rows[-1, 0])

    def test_streaming_clamp_long_segment(self):
        """Same clamp semantics without preload (tabulated via TimeTable
        past its own horizon)."""
        import numpy as np
        from sspslam_tpu.nef import Network, Node, Probe, Simulator
        from sspslam_tpu.nef.processes import TimeTable
        rows = np.arange(30, dtype=np.float32)[:, None]
        with Network() as net:
            nd = Node(TimeTable(rows, 0.001))
            p = Probe(nd)
        sim = Simulator(net)
        sim.run_steps(100, segment_steps=100)
        out = np.asarray(sim.data[p]).ravel()
        assert np.array_equal(out[:30], rows.ravel())
        assert np.all(out[30:] == rows[-1, 0])

    def test_load_checkpoint_drops_preload(self, tmp_path):
        import numpy as np
        from sspslam_tpu.nef import Network, Node, Probe, Simulator
        from sspslam_tpu.nef.processes import TimeTable
        rows = np.arange(200, dtype=np.float32)[:, None]
        with Network() as net:
            nd = Node(TimeTable(rows, 0.001))
            p = Probe(nd)
        sim = Simulator(net)
        sim.run_steps(50, segment_steps=50)
        ck = str(tmp_path / "ck.npz")
        sim.save_checkpoint(ck)

        sim2_rows = Simulator(net)
        sim2_rows.preload_inputs(200)      # tabulated from step 0
        sim2_rows.run_steps(50, segment_steps=50)
        sim2_rows.load_checkpoint(ck)
        assert sim2_rows._preloaded is None
        sim2_rows.run_steps(50, segment_steps=50)
        out = np.asarray(sim2_rows.data[p]).ravel()
        # rows after resume must continue from step 50, not misalign
        assert np.array_equal(out[-50:], rows[50:100].ravel())

    def test_solver_cache_key_unhashable_attr(self):
        import numpy as np
        from sspslam_tpu.nef.solvers import _neuron_key

        class ArrayParamNeuron:
            def __init__(self):
                self.tau_rc = 0.02
                self.per_neuron_param = np.arange(4)  # unhashable

        key = _neuron_key(ArrayParamNeuron())
        hash(key)   # must not raise


class TestVoltageProbe:
    """Probe(ens.neurons, attr='voltage') — nengo neuron-state probing
    parity (reference backends expose voltage via nengo probes)."""

    def _net(self):
        import numpy as np
        from sspslam_tpu.nef import (Connection, Ensemble, Network, Node,
                                     Probe)
        with Network(seed=0) as net:
            inp = Node(lambda t: np.array([0.7]))
            ens = Ensemble(20, 1)
            Connection(inp, ens, synapse=None)
            pv = Probe(ens.neurons, attr="voltage")
            pa = Probe(ens.neurons)
        return net, pv, pa

    def test_voltage_trace(self):
        import numpy as np
        from sspslam_tpu.nef import Simulator
        net, pv, pa = self._net()
        sim = Simulator(net, seed=0)
        sim.run_steps(100, segment_steps=50)
        v = np.asarray(sim.data[pv])
        assert v.shape == (100, 20)
        assert np.all(np.isfinite(v))
        assert v.max() <= 1.5 and v.min() >= -0.1
        # membrane potentials actually evolve
        assert np.std(v[-1] - v[0]) > 0

    def test_voltage_matches_interpreter(self):
        import numpy as np
        from sspslam_tpu.nef import Simulator
        from sspslam_tpu.nef.reference_backend import NumpyStepper
        net, pv, pa = self._net()
        sim = Simulator(net, seed=0)
        sim.run_steps(40, segment_steps=40)
        ref = NumpyStepper(sim.model)
        tables = [np.asarray(c) for c in sim._tabulate_inputs(40)]
        # simulator already consumed steps; interpreter runs its own 40
        bp = next(p for p in sim.model.probes if p.obj is pv)
        out = ref.run_steps(40, tables)
        assert np.allclose(out[bp.index], np.asarray(sim.data[pv]),
                           atol=1e-5)

    def test_voltage_on_rate_neuron_rejected(self):
        import numpy as np
        import pytest
        from sspslam_tpu.nef import (Connection, Ensemble, LIFRate, Network,
                                     Node, Probe, Simulator)
        with Network(seed=0) as net:
            inp = Node(lambda t: np.array([0.5]))
            ens = Ensemble(10, 1, neuron_type=LIFRate())
            Connection(inp, ens, synapse=None)
            Probe(ens.neurons, attr="voltage")
        with pytest.raises(ValueError, match="voltage"):
            Simulator(net, seed=0)


class TestDevicePreload:
    """preload_inputs(device=True): the compiled dynamic-slice segment path
    must match the per-call packed-argument path bitwise."""

    def test_device_table_matches_host_path(self):
        import numpy as np
        from sspslam_tpu.nef import Network, Node, Probe, Simulator
        from sspslam_tpu.nef.processes import TimeTable
        rng = np.random.default_rng(0)
        rows = rng.normal(size=(300, 3)).astype(np.float32)
        def build():
            with Network() as net:
                nd = Node(TimeTable(rows, 0.001))
                out = Node(size_in=3)
                from sspslam_tpu.nef import Connection
                Connection(nd, out, synapse=0.01)
                p = Probe(out)
            return net, p
        netA, pA = build()
        sA = Simulator(netA)
        sA.preload_inputs(300, device=False)
        sA.run_steps(300, segment_steps=100)
        netB, pB = build()
        sB = Simulator(netB)
        sB.preload_inputs(300, device=True)
        assert sB._preloaded_dev is not None
        sB.run_steps(300, segment_steps=100)
        assert np.array_equal(np.asarray(sA.data[pA]),
                              np.asarray(sB.data[pB]))
        # runs past the device horizon fall back to the host path
        sB.run_steps(sB._preloaded_dev.shape[0], segment_steps=5000)
