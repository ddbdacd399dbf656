"""Golden-fixture build-semantics tests INDEPENDENT of the builder.

The cpu-vs-jit backend cross-check (test_backends.py) compares two
executors of the SAME built Model, so a systematic error in build
semantics (LstsqL2 sigma-scaling, gain/bias inversion, filter placement)
would pass it.  These tests recompute the expected values from the
PUBLISHED NEF formulas, inline with plain NumPy — never calling
nef.solvers / ops.neurons — so builder drift fails here even while the
interpreter still agrees.  This substitutes for the reference's external
ground truth (nengo's builder, invoked at
/root/reference/experiments/run_slam.py:198-210, not installable here).

Published formulas (nengo neurons.py / solvers.py documentation):
  LIF rate       r(J) = amp / (tau_ref + tau_rc * ln(1 + 1/(J-1)))  (J>1)
  LIF gain/bias  x = 1/(1 - exp((tau_ref - 1/max_rate)/tau_rc))
                 gain = (1 - x)/(intercept - 1);  bias = 1 - gain*intercept
  LstsqL2        sigma = reg * max(A);  D = (A^T A + m sigma^2 I)^-1 A^T Y
  Lowpass (ZOH)  y[k] = a y[k-1] + (1-a) u[k],  a = exp(-dt/tau)
"""

import math

import numpy as np

from sspslam_tpu.nef import (Connection, Ensemble, Network, Node, Probe,
                             Simulator)
from sspslam_tpu.ops.neurons import LIF, LIFRate

TAU_RC = 0.02
TAU_REF = 0.002


def lif_rate_formula(J):
    """Published LIF rate curve, written out (no repo code)."""
    J = np.asarray(J, np.float64)
    out = np.zeros_like(J)
    above = J > 1.0
    out[above] = 1.0 / (TAU_REF + TAU_RC * np.log1p(1.0 / (J[above] - 1.0)))
    return out


def lif_gain_bias_formula(max_rate, intercept):
    x = 1.0 / (1.0 - math.exp((TAU_REF - 1.0 / max_rate) / TAU_RC))
    gain = (1.0 - x) / (intercept - 1.0)
    bias = 1.0 - gain * intercept
    return gain, bias


class TestGainBiasGolden:
    def test_lif_gain_bias_literals(self):
        """gain/bias for (max_rate=200, intercept=0.5): hand-derived
        literals from the published inversion."""
        gain, bias = lif_gain_bias_formula(200.0, 0.5)
        # independent closed-form spot values
        #   1/r = 0.005; (0.002 - 0.005)/0.02 = -0.15
        #   x = 1/(1-e^{-0.15}) = 7.179165...; gain = (1-x)/(0.5-1)
        assert abs(gain - (-(1.0 - 1.0 / (1.0 - math.exp(-0.15))) / 0.5)) < 1e-12
        nt = LIFRate()
        g, b = nt.gain_bias(np.array([200.0]), np.array([0.5]))
        assert abs(float(g[0]) - gain) < 1e-9 * abs(gain)
        assert abs(float(b[0]) - bias) < 1e-9 * max(1.0, abs(bias))
        # round-trip: rate at J = gain*1 + bias equals max_rate exactly
        assert abs(lif_rate_formula(gain + bias) - 200.0) < 1e-6

    def test_builder_applies_gain_bias(self):
        """The built ensemble's gain/bias match the published inversion for
        explicitly specified max_rates/intercepts."""
        max_rates = np.array([150.0, 250.0, 380.0])
        intercepts = np.array([-0.4, 0.1, 0.6])
        with Network(seed=0) as net:
            ens = Ensemble(3, 1, encoders=np.array([[1.0], [-1.0], [1.0]]),
                           max_rates=max_rates, intercepts=intercepts)
        sim = Simulator(net, seed=0)
        be = sim.model.ensembles[0]
        for i in range(3):
            g, b = lif_gain_bias_formula(max_rates[i], intercepts[i])
            assert abs(float(np.asarray(be.gain).ravel()[i]) - g) < 1e-6 * abs(g)
            assert abs(float(np.asarray(be.bias).ravel()[i]) - b) < 1e-6 * max(1, abs(b))


class TestLstsqL2Golden:
    def test_decoders_match_published_formula(self):
        """Exact LstsqL2 decoders for a 3-neuron ensemble with fixed
        encoders/max_rates/intercepts and explicit eval points, recomputed
        inline from sigma = reg*max(A), D = (A^T A + m sigma^2 I)^-1 A^T Y."""
        encoders = np.array([[1.0], [-1.0], [1.0]])
        max_rates = np.array([200.0, 300.0, 250.0])
        intercepts = np.array([-0.3, -0.1, 0.2])
        # eval points chosen OFF the intercepts: at J == 1 exactly, the
        # steep LIF onset makes the rate (and hence the solve) sensitive
        # to f32-vs-f64 rounding of J, which is precision, not semantics
        eval_points = np.linspace(-0.97, 0.97, 20)[:, None]
        reg = 0.1
        with Network(seed=0) as net:
            ens = Ensemble(3, 1, encoders=encoders, max_rates=max_rates,
                           intercepts=intercepts)
            out = Node(size_in=1)
            Connection(ens, out, synapse=None, eval_points=eval_points,
                       solver_reg=reg)
        sim = Simulator(net, seed=0)
        bc = next(c for c in sim.model.connections if c.decoders is not None)
        got = np.asarray(bc.decoders, np.float64)

        # ---- expected, from the published formulas only ----
        gains = np.empty(3)
        biases = np.empty(3)
        for i in range(3):
            gains[i], biases[i] = lif_gain_bias_formula(max_rates[i],
                                                        intercepts[i])
        # at the build's documented float32 precision (BuiltEnsemble.
        # activities_at_eval docstring): rates and the normal-equation
        # solve in f32
        J = (eval_points.astype(np.float32)
             @ (gains[:, None] * encoders).T.astype(np.float32)
             + biases[None, :].astype(np.float32))
        A = lif_rate_formula(J).astype(np.float32)   # (m, n)
        m = A.shape[0]
        sigma = np.float32(reg) * A.max()
        G = A.T @ A + (m * sigma ** 2 * np.eye(3)).astype(np.float32)
        want = np.linalg.solve(G, A.T @ eval_points.astype(np.float32))

        assert got.shape == want.shape == (3, 1)
        assert np.allclose(got, want, rtol=1e-4, atol=1e-8), (got, want)

    def test_decoded_function_targets(self):
        """Same, with a decoded function f(x) = x^2 as targets."""
        encoders = np.array([[1.0], [-1.0]])
        max_rates = np.array([220.0, 330.0])
        intercepts = np.array([-0.2, 0.0])
        eval_points = np.linspace(-1, 1, 17)[:, None]
        with Network(seed=0) as net:
            ens = Ensemble(2, 1, encoders=encoders, max_rates=max_rates,
                           intercepts=intercepts)
            out = Node(size_in=1)
            Connection(ens, out, synapse=None, function=lambda x: x ** 2,
                       eval_points=eval_points, solver_reg=0.1)
        sim = Simulator(net, seed=0)
        bc = next(c for c in sim.model.connections if c.decoders is not None)
        got = np.asarray(bc.decoders, np.float64)

        gains = np.empty(2)
        biases = np.empty(2)
        for i in range(2):
            gains[i], biases[i] = lif_gain_bias_formula(max_rates[i],
                                                        intercepts[i])
        J = (eval_points @ (gains[:, None] * encoders).T
             + biases[None, :]).astype(np.float32)
        A = lif_rate_formula(J).astype(np.float32)
        m = A.shape[0]
        sigma = np.float32(0.1) * A.max()
        G = A.T @ A + (m * sigma ** 2 * np.eye(2)).astype(np.float32)
        want = np.linalg.solve(G, A.T @ (eval_points ** 2).astype(np.float32))
        assert np.allclose(got, want, rtol=1e-4, atol=1e-8)

    def test_radius_scales_explicit_eval_points(self):
        """nengo's gen_eval_points (scale_eval_points=True) multiplies
        explicit eval-point arrays by radius.  For an identity decode the
        currents are radius-invariant (scaled_encoders divide by radius)
        while the targets scale, so decoders must be exactly radius x the
        radius=1 solution."""
        radius = 2.0
        encoders = np.array([[1.0], [-1.0], [1.0]])
        max_rates = np.array([200.0, 300.0, 250.0])
        intercepts = np.array([-0.3, -0.1, 0.2])
        eval_points = np.linspace(-0.97, 0.97, 20)[:, None]
        reg = 0.1
        decs = {}
        for r in (1.0, radius):
            with Network(seed=0) as net:
                ens = Ensemble(3, 1, radius=r, encoders=encoders,
                               max_rates=max_rates, intercepts=intercepts)
                out = Node(size_in=1)
                Connection(ens, out, synapse=None, eval_points=eval_points,
                           solver_reg=reg)
            sim = Simulator(net, seed=0)
            bc = next(c for c in sim.model.connections
                      if c.decoders is not None)
            decs[r] = np.asarray(bc.decoders, np.float64)
        assert np.allclose(decs[radius], radius * decs[1.0], rtol=1e-5)
        # ensemble-level explicit eval points scale the same way
        with Network(seed=0) as net:
            ens = Ensemble(3, 1, radius=radius, eval_points=eval_points)
        sim = Simulator(net, seed=0)
        be = sim.model.ensembles[0]
        assert np.allclose(np.asarray(be.eval_points),
                           eval_points * radius)


class TestLearningGolden:
    """Hand-rolled float traces of the PES / Voja update semantics.

    The jit executor and the NumPy interpreter share ops/learning.py, so
    a systematic error in the update math or its filter placements passes
    the backend cross-check.  These recurrences are written inline from
    the published rules (nengo pes.py/voja.py):
      PES   dD = -(kappa dt / n) a_filt e^T,  a_filt through the rule's
            pre_synapse Lowpass(0.005), error through the rule-input
            connection (unfiltered here), D applied to THIS step's output
            BEFORE the update;
      Voja  dE = kappa dt s (scale a x^T - a E), a through post_synapse,
            E read at the TOP of the step.
    """

    def test_pes_one_dt_trace(self):
        from sspslam_tpu.nef import PES
        dt = 0.001
        kappa = 2e-2
        pre_tau = 0.005
        x_in = 0.4
        encoders = np.array([[1.0], [-1.0]])
        max_rates = np.array([220.0, 310.0])
        intercepts = np.array([-0.3, -0.1])
        n_steps = 12
        with Network(seed=0) as net:
            u = Node(lambda t: np.array([x_in]))
            tgt = Node(lambda t: np.array([x_in]))
            a = Ensemble(2, 1, neuron_type=LIFRate(), encoders=encoders,
                         max_rates=max_rates, intercepts=intercepts)
            mid = Node(size_in=1)
            err = Node(size_in=1)
            Connection(u, a, synapse=None)
            c = Connection(a, mid, function=lambda x: x * 0,
                           learning_rule_type=PES(kappa,
                                                  pre_synapse=pre_tau),
                           synapse=None)
            Connection(mid, err, synapse=None)
            Connection(tgt, err, transform=-1, synapse=None)
            Connection(err, c.learning_rule, synapse=None)
            p = Probe(mid)
        sim = Simulator(net, seed=0)
        sim.run_steps(n_steps, segment_steps=n_steps)
        got = np.asarray(sim.data[p]).ravel()

        # ---- hand recurrence (published formulas only) ----
        gains = np.empty(2)
        biases = np.empty(2)
        for i in range(2):
            gains[i], biases[i] = lif_gain_bias_formula(max_rates[i],
                                                        intercepts[i])
        J = gains * encoders[:, 0] * x_in + biases
        rates = lif_rate_formula(J).astype(np.float32)      # constant
        af = math.exp(-dt / pre_tau)
        D = np.zeros((2, 1), np.float32)
        f_a = np.zeros(2, np.float32)
        want = []
        for _ in range(n_steps):
            mid_v = (rates @ D).item()          # pre-update decoders
            e = mid_v - x_in
            want.append(mid_v)
            f_a = af * f_a + (1 - af) * rates   # rule's filtered activities
            D = D - (kappa * dt / 2) * np.outer(f_a, [e]).astype(np.float32)
        assert np.allclose(got, want, rtol=1e-5, atol=1e-7), (got, want)
        # and learning actually moved the estimate toward the target
        assert abs(got[-1] - x_in) < abs(got[0] - x_in)

    def test_voja_one_dt_trace(self):
        from sspslam_tpu.nef import Voja
        dt = 0.001
        kappa = 5e-2
        post_tau = 0.005
        key = np.array([0.8, -0.6], np.float32)   # unit key vector
        encoders = np.array([[1.0, 0.0], [0.0, 1.0]])
        max_rates = np.array([250.0, 300.0])
        intercepts = np.array([-0.5, -0.5])
        n_steps = 10
        with Network(seed=0) as net:
            u = Node(lambda t: key)
            a = Ensemble(2, 2, neuron_type=LIFRate(), encoders=encoders,
                         max_rates=max_rates, intercepts=intercepts)
            c = Connection(u, a, synapse=None,
                           learning_rule_type=Voja(kappa,
                                                   post_synapse=post_tau))
            p = Probe(c.learning_rule, attr="scaled_encoders",
                      sample_every=dt)
        sim = Simulator(net, seed=0)
        sim.run_steps(n_steps, segment_steps=n_steps)
        got = np.asarray(sim.data[p])             # (n_steps, 2, 2)

        gains = np.empty(2)
        biases = np.empty(2)
        for i in range(2):
            gains[i], biases[i] = lif_gain_bias_formula(max_rates[i],
                                                        intercepts[i])
        # radius 1: scaled_encoders = gain * encoders
        E = (gains[:, None] * encoders).astype(np.float32)
        scale = gains.astype(np.float32)
        af = math.exp(-dt / post_tau)
        f_a = np.zeros(2, np.float32)
        want = []
        for _ in range(n_steps):
            J = E @ key + biases                  # E read at top of step
            rates = lif_rate_formula(J).astype(np.float32)
            f_a = af * f_a + (1 - af) * rates     # post_synapse filter
            E = E + (kappa * dt) * (
                scale[:, None] * np.outer(f_a, key)
                - f_a[:, None] * E).astype(np.float32)
            want.append(E.copy())                 # probe reads post-update
        want = np.stack(want)
        assert got.shape == want.shape
        assert np.allclose(got, want, rtol=1e-5, atol=1e-7), (
            got[-1], want[-1])
        # encoder rows drift toward the key direction
        cos0 = encoders[0] @ key
        cosN = (E[0] / np.linalg.norm(E[0])) @ key
        assert cosN > cos0


class TestFilterPlacementGolden:
    def test_two_stage_filter_trace(self):
        """Hand-rolled discrete trace of a two-connection lowpass chain.

        Engine semantics (one dt): connection outputs read the PREVIOUS
        step's filter state (filters update after the same-step topo
        phase); probe filters update within the probe phase from the
        current probed value.  Expected trace computed with plain-float
        recurrences, no repo code.
        """
        dt = 0.001
        tau1, tau2, tau3 = 0.01, 0.02, 0.005
        n = 12
        with Network() as net:
            src = Node(lambda t: np.array([1.0]))
            mid = Node(size_in=1)
            out = Node(size_in=1)
            Connection(src, mid, synapse=tau1)
            Connection(mid, out, synapse=tau2)
            p_raw = Probe(out)
            p_filt = Probe(out, synapse=tau3)
        sim = Simulator(net, dt=dt, seed=0)
        sim.run_steps(n, segment_steps=n)
        got_raw = np.asarray(sim.data[p_raw]).ravel()
        got_filt = np.asarray(sim.data[p_filt]).ravel()

        a1 = math.exp(-dt / tau1)
        a2 = math.exp(-dt / tau2)
        a3 = math.exp(-dt / tau3)
        f1 = f2 = f3 = 0.0
        want_raw, want_filt = [], []
        for k in range(n):
            mid_v = f1            # conn1 output: previous-step filter state
            out_v = f2            # conn2 output: previous-step filter state
            want_raw.append(out_v)
            # connection filters update from this step's inputs
            f1 = a1 * f1 + (1 - a1) * 1.0
            f2 = a2 * f2 + (1 - a2) * mid_v
            # probe filter updates from this step's probed value
            f3 = a3 * f3 + (1 - a3) * out_v
            want_filt.append(f3)
        assert np.allclose(got_raw, want_raw, atol=1e-7), (got_raw, want_raw)
        assert np.allclose(got_filt, want_filt, atol=1e-7)
