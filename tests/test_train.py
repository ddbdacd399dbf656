"""Differentiable-simulation tests (sspslam_tpu.train + SurrogateLIF).

The reference stack has no backprop-through-simulation path (nengo_dl fills
that role in the nengo ecosystem); here it falls out of the functional
step design.  These tests pin: surrogate forward == LIF forward exactly,
gradients flow through whole spiking episodes, rematerialised episodes
backprop to the same gradients as plain scans, and an optax loop actually
learns a readout.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sspslam_tpu.nef import (Connection, Ensemble, LIF, LIFRate, Network,
                             Node, Probe, Simulator, SurrogateLIF, TimeTable)
from sspslam_tpu import train


def _sine_table(n_steps, dt=0.001, freq=2.0):
    ts = dt * np.arange(1, n_steps + 1)
    return np.sin(2 * np.pi * freq * ts).astype(np.float32)[:, None]


def _build(neuron_type, n_steps, n_neurons=60, seed=3):
    with Network(seed=seed) as net:
        inp = Node(TimeTable(_sine_table(n_steps)))
        ens = Ensemble(n_neurons, 1, neuron_type=neuron_type)
        Connection(inp, ens, synapse=None)
        p = Probe(ens, synapse=0.02)
    sim = Simulator(net, seed=seed)
    return sim, p


class TestSurrogateLIF:
    def test_forward_equals_lif(self):
        """SurrogateLIF's primal dynamics are the LIF update: the same
        build (identical rates_np -> identical decoders) and the same spike
        trains; traces agree to f32 roundoff (the multiplicative reset
        fuses differently than LIF's select, so the last bit can differ)."""
        n = 300
        sim_a, p_a = _build(LIF(), n)
        sim_b, p_b = _build(SurrogateLIF(beta=5.0), n)
        sim_a.run_steps(n)
        sim_b.run_steps(n)
        np.testing.assert_allclose(sim_a.data[p_a], sim_b.data[p_b],
                                   rtol=1e-5, atol=1e-7)

    def test_surrogate_gradient_shape(self):
        """The spike surrogate's tangent is the fast sigmoid derivative:
        peaked at the threshold, decaying as 1/(beta|x|+1)^2."""
        from sspslam_tpu.ops.neurons import _spike_surrogate
        g = jax.grad(lambda x: _spike_surrogate(x, 10.0))(0.0)
        assert np.isclose(float(g), 10.0)
        g_far = jax.grad(lambda x: _spike_surrogate(x, 10.0))(1.0)
        assert 0 < float(g_far) < 0.1
        # primal stays the hard threshold
        assert float(_spike_surrogate(jnp.float32(-0.1), 10.0)) == 0.0
        assert float(_spike_surrogate(jnp.float32(0.1), 10.0)) == 1.0


class TestEpisodeGrad:
    def test_grad_flows_through_spiking_episode(self):
        """d(loss)/d(probe decoders) through 200 spiking steps is finite
        and nonzero (the surrogate carries signal through every spike)."""
        n = 200
        sim, p = _build(SurrogateLIF(), n)
        episode = train.make_episode_fn(sim, n, segment_steps=50)
        xs = train.episode_inputs(sim, n)
        pi = train.probe_index(sim, p)
        target = _sine_table(n)

        def loss_of(params):
            _, emits = episode(params, xs, sim.model.initial_state())
            return jnp.mean((emits[pi] - target) ** 2)

        grads = jax.grad(loss_of)(sim.params)
        g = np.asarray(grads["probe"][str(pi)]["D"])
        assert np.all(np.isfinite(g))
        assert np.linalg.norm(g) > 0

    def test_remat_matches_plain_scan_grads(self):
        """jax.checkpoint segmenting changes memory, not math: gradients
        agree with the un-rematerialised episode."""
        n = 120
        sim, p = _build(LIFRate(), n, n_neurons=40)
        xs = train.episode_inputs(sim, n)
        pi = train.probe_index(sim, p)
        target = 0.5 * _sine_table(n)

        def loss_with(episode):
            def loss_of(params):
                _, emits = episode(params, xs, sim.model.initial_state())
                return jnp.mean((emits[pi] - target) ** 2)
            return loss_of

        ep_remat = train.make_episode_fn(sim, n, segment_steps=30,
                                         remat=True)
        ep_plain = train.make_episode_fn(sim, n, segment_steps=120,
                                         remat=False)
        g1 = jax.grad(loss_with(ep_remat))(sim.params)
        g2 = jax.grad(loss_with(ep_plain))(sim.params)
        a = np.asarray(g1["probe"][str(pi)]["D"])
        b = np.asarray(g2["probe"][str(pi)]["D"])
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-7)

    def test_segment_divisibility_checked(self):
        sim, _ = _build(LIFRate(), 100, n_neurons=20)
        with pytest.raises(ValueError):
            train.make_episode_fn(sim, 100, segment_steps=33)


class TestPartition:
    def test_partition_and_merge_roundtrip(self):
        sim, p = _build(LIFRate(), 100, n_neurons=20)
        pi = train.probe_index(sim, p)
        pred = lambda path: path == f"probe/{pi}/D"
        tr, fz = train.partition_params(sim.params, pred)
        # exactly one trainable leaf
        t_leaves = jax.tree_util.tree_leaves(tr)
        assert len(t_leaves) == 1
        merged = train.merge_params(tr, fz)
        ref, got = jax.tree_util.tree_leaves(sim.params), \
            jax.tree_util.tree_leaves(merged)
        assert len(ref) == len(got)
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


class TestBatchedEpisode:
    def test_batched_matches_per_episode(self):
        """vmap(step) inside the remat scan is episode-independent: each
        batch member's trace equals the single-episode run on its inputs."""
        n = 100
        sim, p = _build(LIFRate(), n, n_neurons=30)
        pi = train.probe_index(sim, p)
        xs1 = train.episode_inputs(sim, n)           # (T, w)
        # three episodes: scaled copies of the input stream
        xs_b = np.stack([0.5 * xs1, xs1, -xs1])      # (B, T, w)
        bep = train.make_batched_episode_fn(sim, n, segment_steps=50)
        _, emits_b = jax.jit(bep)(sim.params, xs_b,
                                  train.batched_initial_state(sim, 3))
        ep = train.make_episode_fn(sim, n, segment_steps=50)
        ep_j = jax.jit(ep)
        for b in range(3):
            _, emits_1 = ep_j(sim.params, xs_b[b],
                              sim.model.initial_state())
            np.testing.assert_allclose(np.asarray(emits_b[pi])[b],
                                       np.asarray(emits_1[pi]),
                                       rtol=1e-5, atol=1e-6)

    def test_dp_fit_matches_unsharded(self):
        """fit(mesh=...) shards episodes over the 'data' axis and must
        reproduce the unsharded batched fit: same loss sequence, same
        trained decoders (one GSPMD gradient all-reduce is the only
        collective difference)."""
        from sspslam_tpu.parallel import make_mesh
        n, B = 100, 8
        sim, p = _build(LIFRate(), n, n_neurons=30)
        pi = train.probe_index(sim, p)
        xs1 = train.episode_inputs(sim, n)
        rngs = np.random.default_rng(0)
        scales = rngs.uniform(0.3, 1.0, size=B).astype(np.float32)
        xs_b = np.stack([s * xs1 for s in scales])
        targ = np.stack([-1.5 * s * _sine_table(n) for s in scales])
        mask = (np.arange(n) >= 50).astype(np.float32)[None, :, None]

        def loss_fn(emits, final_state):
            return jnp.sum(mask * (emits[pi] - targ) ** 2) / jnp.sum(mask)

        bep = train.make_batched_episode_fn(sim, n, segment_steps=50)
        import optax
        kw = dict(loss_fn=loss_fn,
                  trainable=lambda path: path == f"probe/{pi}/D",
                  optimizer=optax.adam(5e-3), steps=60)
        state0 = train.batched_initial_state(sim, B)
        p_plain, l_plain = train.fit(bep, sim.params, xs_b, state0, **kw)
        mesh = make_mesh(8, axis_names=("data",))
        p_mesh, l_mesh = train.fit(bep, sim.params, xs_b, state0,
                                   mesh=mesh, **kw)
        np.testing.assert_allclose(l_mesh, l_plain, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(p_mesh["probe"][str(pi)]["D"]),
            np.asarray(p_plain["probe"][str(pi)]["D"]),
            rtol=1e-4, atol=1e-6)
        assert l_plain[-1] < l_plain[0] / 3


class TestMetaLearning:
    def test_learning_rate_gradient_through_pes(self):
        """Learning rates are traced scalars inside the in-scan PES update,
        so backprop through the episode yields d(recall error)/d(lr) —
        gradient-based hyperparameter optimisation through online learning.
        From a too-low lr, a few meta-steps must raise it and cut the
        end-of-episode recall error."""
        import optax
        from sspslam_tpu.models import AssociativeMemory
        from sspslam_tpu.utils import sparsity_to_x_intercept

        n, d = 400, 4
        rng = np.random.default_rng(0)
        keys = rng.normal(size=(2, d)).astype(np.float32)
        keys /= np.linalg.norm(keys, axis=1, keepdims=True)
        vals = rng.normal(size=(2, d)).astype(np.float32)
        vals /= 2 * np.linalg.norm(vals, axis=1, keepdims=True)
        # alternate the two pairs every 50 steps
        idx = (np.arange(n) // 50) % 2
        with Network(seed=0) as net:
            k_in = Node(TimeTable(keys[idx], 0.001))
            v_in = Node(TimeTable(vals[idx], 0.001))
            gate = Node(TimeTable(np.zeros((n, 1), np.float32), 0.001))
            am = AssociativeMemory(
                120, d, d, sparsity_to_x_intercept(d, 0.25),
                voja=False, pes_learning_rate=2e-3, seed=0)
            Connection(k_in, am.key_input, synapse=None)
            Connection(v_in, am.value_input, synapse=None)
            Connection(gate, am.learning, synapse=None)
            p = Probe(am.recall, synapse=0.02)
        # rate neurons end-to-end: hard LIF spike thresholds would zero the
        # lr gradient at the recall population (use SurrogateLIF to keep
        # spiking forward dynamics instead)
        sim = Simulator(net, seed=0, default_neuron_type=LIFRate())
        lr_path = train.learning_rate_path(sim, am.conn_out)
        assert lr_path.startswith("hyper/lr/pes_")
        episode = train.make_episode_fn(sim, n, segment_steps=50)
        xs = train.episode_inputs(sim, n)
        pi = train.probe_index(sim, p)
        target = vals[idx]
        mask = np.zeros((n, 1), np.float32)
        mask[n // 2:] = 1.0  # judge recall in the second half only

        def loss_fn(emits, final_state):
            return jnp.sum(mask * (emits[pi] - target) ** 2) / jnp.sum(mask)

        def loss_of(params):
            _, emits = episode(params, xs, sim.model.initial_state())
            return loss_fn(emits, sim.model.initial_state())

        g = jax.grad(loss_of)(sim.params)
        slot = lr_path.split("/")[-1]
        g_lr = float(np.asarray(g["hyper"]["lr"][slot]))
        assert np.isfinite(g_lr) and g_lr != 0.0

        # the episode-gradient must match a central finite difference of
        # the meta-loss (the whole lr -> PES -> recall chain, through
        # 400 scan steps)
        loss_j = jax.jit(loss_of)

        def loss_at(lr):
            p = jax.tree_util.tree_map(lambda x: x, sim.params)
            p["hyper"]["lr"] = dict(p["hyper"]["lr"])
            p["hyper"]["lr"][slot] = jnp.float32(lr)
            return float(loss_j(p))

        lr0 = float(sim.params["hyper"]["lr"][slot])
        h = 1e-5
        fd = (loss_at(lr0 + h) - loss_at(lr0 - h)) / (2 * h)
        assert np.isclose(g_lr, fd, rtol=5e-2), (g_lr, fd)

        # meta-descent moves lr against the gradient and lowers the loss
        params2, losses = train.fit(
            episode, sim.params, xs, sim.model.initial_state(), loss_fn,
            trainable=lambda s: s == lr_path,
            optimizer=optax.sgd(1e-5), steps=8)
        lr1 = float(np.asarray(params2["hyper"]["lr"][slot]))
        assert (lr1 - lr0) * g_lr < 0, (lr0, lr1, g_lr)
        assert losses[-1] < losses[0], losses


class TestFit:
    def test_fit_learns_readout(self):
        """Train ONLY the probe decoders so the readout of x(t) becomes
        -2*x(t): loss must fall by >10x from the lstsq-identity start."""
        n = 200
        sim, p = _build(LIFRate(), n, n_neurons=50)
        episode = train.make_episode_fn(sim, n, segment_steps=50)
        xs = train.episode_inputs(sim, n)
        pi = train.probe_index(sim, p)
        target = -2.0 * _sine_table(n)
        # compare only after the synapse settles
        mask = (np.arange(n) >= 50).astype(np.float32)[:, None]

        def loss_fn(emits, final_state):
            return jnp.sum(mask * (emits[pi] - target) ** 2) / jnp.sum(mask)

        import optax
        params2, losses = train.fit(
            episode, sim.params, xs, sim.model.initial_state(), loss_fn,
            trainable=lambda path: path == f"probe/{pi}/D",
            optimizer=optax.adam(3e-3), steps=120)
        assert losses[-1] < losses[0] / 10, (losses[0], losses[-1])
        # the trained episode really produces the new readout
        _, emits = episode(params2, xs, sim.model.initial_state())
        out = np.asarray(emits[pi])[50:]
        err = np.sqrt(np.mean((out - target[50:]) ** 2))
        assert err < 0.35, err

    def test_keep_best_returns_best_iterate(self):
        """With a deliberately diverging optimizer, keep_best=True returns
        the lowest-loss iterate seen, not the (worse) final one."""
        import optax
        n = 120
        sim, p = _build(LIFRate(), n, n_neurons=30)
        episode = train.make_episode_fn(sim, n, segment_steps=60)
        xs = train.episode_inputs(sim, n)
        pi = train.probe_index(sim, p)
        target = -1.0 * _sine_table(n)

        def loss_fn(emits, final_state):
            return jnp.mean((emits[pi] - target) ** 2)

        kw = dict(loss_fn=loss_fn,
                  trainable=lambda s: s == f"probe/{pi}/D",
                  optimizer=optax.sgd(5.0), steps=12)  # diverges
        p_best, losses = train.fit(episode, sim.params, xs,
                                   sim.model.initial_state(),
                                   keep_best=True, **kw)
        # it really diverged (possibly all the way to NaN)
        assert not (losses[-1] <= min(losses))
        _, emits = jax.jit(episode)(p_best, xs, sim.model.initial_state())
        best_loss = float(jnp.mean((emits[pi] - target) ** 2))
        assert best_loss <= min(losses) + 1e-6, (best_loss, min(losses))


class TestParamPaths:
    def test_learned_connection_rejected(self):
        """A PES-learned connection's decoders live in the scan carry — no
        conn/<i>/D params leaf exists, so connection_param_path must raise
        (previously it returned the nonexistent path and fit() silently
        trained an empty subset)."""
        from sspslam_tpu.nef import PES
        with Network(seed=0) as net:
            inp = Node(TimeTable(_sine_table(50)))
            a = Ensemble(30, 1, neuron_type=LIFRate())
            b = Ensemble(30, 1, neuron_type=LIFRate())
            Connection(inp, a, synapse=None)
            c = Connection(a, b, function=lambda x: x * 0,
                           learning_rule_type=PES(1e-3))
            Connection(inp, c.learning_rule, transform=-1, synapse=0.005)
        sim = Simulator(net, seed=0)
        with pytest.raises(ValueError, match="learning_rate_path"):
            train.connection_param_path(sim, c)
        # the learning-rate path for the same connection IS addressable
        path = train.learning_rate_path(sim, c)
        tr, _ = train.partition_params(sim.params, lambda s: s == path)
        assert sum(x is not None for x in jax.tree_util.tree_leaves(tr)) >= 1
