"""End-to-end SLAM model tests (small scale, rate neurons, seeded) —
the compiled-model analogue of the reference's empirical validation scripts
(run_slam.py / run_slamview.py metrics)."""

import numpy as np
import pytest

from sspslam_tpu import HexagonalSSPSpace, SPSpace
from sspslam_tpu.models import (SLAMNetwork, SLAMGatedNetwork,
                                SLAMViewNetwork, get_slam_input_functions,
                                get_slamview_input_functions)
from sspslam_tpu.nef import (Connection, LIFRate, Network, Node, Probe,
                             Simulator, WhiteSignal)


def make_world(T=2.0, dt=0.001, seed=0, n_landmarks=3, radius=1.0, high=None):
    rng = np.random.default_rng(seed)
    n_steps = int(T / dt)
    if high is None:
        high = max(0.5, 3.0 / T)  # keep at least one band under the cutoff
    path = np.hstack([
        WhiteSignal(T, high=high, seed=seed + i).run(T, dt=dt)
        for i in range(2)])
    for i in range(2):
        lo, hi = path[:, i].min(), path[:, i].max()
        path[:, i] = (path[:, i] - lo) / max(hi - lo, 1e-9) * 1.6 - 0.8
    vels = (1 / dt) * np.diff(path, axis=0, prepend=path[:1])
    landmarks = rng.uniform(-0.7, 0.7, size=(n_landmarks, 2))
    vec_to_landmarks = landmarks[None, :, :] - path[:, None, :]
    return path, vels, vec_to_landmarks


@pytest.fixture(scope="module")
def space():
    bounds = 1.1 * np.tile(np.array([-1, 1.0]), (2, 1))
    return HexagonalSSPSpace(2, ssp_dim=55, seed=0, length_scale=0.3,
                             domain_bounds=bounds)


class TestSLAMNetwork:
    def test_end_to_end(self, space):
        T = 2.0
        path, vels, vec_to_lm = make_world(T=T, seed=0, high=0.5)
        d = space.ssp_dim
        lm_space = SPSpace(3, d, seed=0)
        view_rad = 0.6

        (velocity_func, vel_scaling_factor, is_landmark_in_view, _,
         landmark_sp_func, _, landmark_vecssp_func) = get_slam_input_functions(
            space, lm_space, vels, vec_to_lm, view_rad)

        real_ssp = space.encode(path)
        with Network(seed=0) as net:
            vel = Node(velocity_func)
            init = Node(lambda t: real_ssp[0] if t < 0.05 else np.zeros(d))
            lm_id = Node(landmark_sp_func)
            lm_ssp = Node(landmark_vecssp_func)
            in_view = Node(is_landmark_in_view)
            slam = SLAMNetwork(space, lm_space, view_rad, 3,
                               pi_n_neurons=250, mem_n_neurons=300,
                               circonv_n_neurons=60,
                               vel_scaling_factor=vel_scaling_factor,
                               cleanup_samples_per_dim=30, seed=0)
            Connection(vel, slam.velocity_input, synapse=None)
            Connection(init, slam.pathintegrator.input, synapse=None)
            Connection(lm_id, slam.landmark_id_input, synapse=None)
            Connection(lm_ssp, slam.landmark_vec_ssp, synapse=None)
            Connection(in_view, slam.no_landmark_in_view, synapse=None)
            p = Probe(slam.pathintegrator.output, synapse=0.05)
        sim = Simulator(net, seed=0, default_neuron_type=LIFRate())
        sim.run(T)
        out = sim.data[p]
        assert out.shape == (2000, d)
        # cosine similarity with ground truth stays positive after warmup
        sims = np.sum(out * real_ssp, axis=1) / np.maximum(
            np.linalg.norm(out, axis=1), 1e-9)
        assert np.mean(sims[500:]) > 0.5
        # decoded path error bounded
        dec = space.decode(out[::100], num_samples=50)
        err = np.linalg.norm(dec - path[::100], axis=1)
        assert np.median(err[5:]) < 0.45

    def test_recovery_suppresses_voja_and_pes(self, space):
        """During auto-recovery the suppress channel must FREEZE map
        learning: Voja's 1+gate signal cancels to 0 (not 11 — routing the
        +10 suppress through `assomemory.learning` would accelerate
        encoder drift 11x while a landmark is in view) and the PES error
        population is inhibited.  Compares the same world with the gate
        forced into permanent recovery vs the reference gate."""
        T, dt = 0.5, 0.001
        path, vels, vec_to_lm = make_world(T=T, seed=3, high=2.0)
        d = space.ssp_dim
        lm_space = SPSpace(3, d, seed=3)
        view_rad = 5.0  # always in view -> memory active every step

        (velocity_func, scale, in_view_f, _, sp_f, _, vecssp_f) = \
            get_slam_input_functions(space, lm_space, vels, vec_to_lm,
                                     view_rad)

        def run(gate_mode, gate_kwargs=None):
            with Network(seed=3) as net:
                vel = Node(velocity_func)
                lm_id = Node(sp_f)
                lm_ssp = Node(vecssp_f)
                in_view = Node(in_view_f)
                slam = SLAMNetwork(space, lm_space, view_rad, 3,
                                   pi_n_neurons=80, mem_n_neurons=90,
                                   circonv_n_neurons=30,
                                   vel_scaling_factor=scale,
                                   cleanup_samples_per_dim=10, seed=3,
                                   gate_mode=gate_mode,
                                   gate_kwargs=gate_kwargs)
                Connection(vel, slam.velocity_input, synapse=None)
                Connection(lm_id, slam.landmark_id_input, synapse=None)
                Connection(lm_ssp, slam.landmark_vec_ssp, synapse=None)
                Connection(in_view, slam.no_landmark_in_view, synapse=None)
                enc_p = Probe(slam.assomemory.conn_in.learning_rule,
                              attr="scaled_encoders", sample_every=T)
                w_p = Probe(slam.assomemory.conn_out, attr="weights",
                            sample_every=T)
            sim = Simulator(net, seed=3, default_neuron_type=LIFRate())
            sim.run(T)
            return np.asarray(sim.data[enc_p][-1]), np.asarray(
                sim.data[w_p][-1])

        # permanent recovery: armed at start, trigger above any agreement
        enc_rec, w_rec = run("auto_recovery",
                             {"arm_at_start": True, "trigger": 2.0,
                              "familiar": 0.0, "recovery_T": 2 * T})
        enc_ref, w_ref = run("reference")

        # the reference gate learns: encoders and decoders both move
        with Network(seed=3) as probe_net:
            slam0 = SLAMNetwork(space, lm_space, view_rad, 3,
                                pi_n_neurons=80, mem_n_neurons=90,
                                circonv_n_neurons=30,
                                vel_scaling_factor=scale,
                                cleanup_samples_per_dim=10, seed=3)
            enc_p0 = Probe(slam0.assomemory.conn_in.learning_rule,
                           attr="scaled_encoders", sample_every=dt)
        sim0 = Simulator(probe_net, seed=3, default_neuron_type=LIFRate())
        sim0.run_steps(1)
        enc_init = np.asarray(sim0.data[enc_p0][0])

        drift_ref = np.abs(enc_ref - enc_init).max()
        drift_rec = np.abs(enc_rec - enc_init).max()
        assert drift_ref > 1e-5, "control run should learn encoders"
        # Voja signal cancels exactly to zero during recovery
        assert drift_rec <= 1e-6, (
            f"recovery must freeze Voja (drift {drift_rec} vs active "
            f"{drift_ref})")
        # PES decoders frozen up to the brief error-filter transient
        assert np.abs(w_rec).max() < 0.05 * max(np.abs(w_ref).max(), 1e-9)

    def test_multi_landmark_adapter(self, space):
        from sspslam_tpu.models import get_slam_input_functions2
        path, vels, vec_to_lm = make_world(T=0.5, seed=1)
        lm_space = SPSpace(3, space.ssp_dim, seed=1)
        out = get_slam_input_functions2(space, lm_space, vels, vec_to_lm, 0.8)
        velocity_func, scale, in_view_f, id_f, sp_f, vec_f, vecssp_f = out
        assert np.isfinite(scale)
        v = vecssp_f(0.1)
        assert v.shape == (space.ssp_dim,)


class TestSLAMViewNetwork:
    def test_end_to_end(self, space):
        T = 1.0
        path, vels, vec_to_lm = make_world(T=T, seed=2, high=1.0)
        d = space.ssp_dim
        lm_space = SPSpace(3, d, seed=2)
        view_rad = 0.8

        velocity_func, scale, in_view_f, landmark_func = \
            get_slamview_input_functions(space, lm_space, vels, vec_to_lm,
                                         view_rad)
        real_ssp = space.encode(path)
        with Network(seed=2) as net:
            vel = Node(velocity_func)
            init = Node(lambda t: real_ssp[0] if t < 0.05 else np.zeros(d))
            view = Node(landmark_func)
            in_view = Node(in_view_f)
            slam = SLAMViewNetwork(space, lm_space, view_rad, 3,
                                   pi_n_neurons=200, mem_n_neurons=250,
                                   circonv_n_neurons=50,
                                   vel_scaling_factor=scale,
                                   cleanup_samples_per_dim=30, seed=2)
            Connection(vel, slam.velocity_input, synapse=None)
            Connection(init, slam.pathintegrator.input, synapse=None)
            Connection(view, slam.view_input, synapse=None)
            Connection(in_view, slam.no_landmark_in_view, synapse=None)
            p = Probe(slam.pathintegrator.output, synapse=0.05)
        sim = Simulator(net, seed=2, default_neuron_type=LIFRate())
        sim.run(T)
        out = sim.data[p]
        sims = np.sum(out * real_ssp[:out.shape[0]], axis=1) / np.maximum(
            np.linalg.norm(out, axis=1), 1e-9)
        assert np.mean(sims[300:]) > 0.3

    def _run_view(self, space, gate_mode, gate_kwargs=None, T=0.5):
        path, vels, vec_to_lm = make_world(T=T, seed=3, high=2.0)
        d = space.ssp_dim
        lm_space = SPSpace(3, d, seed=3)
        view_rad = 5.0  # always in view -> memory active every step
        velocity_func, scale, in_view_f, landmark_func = \
            get_slamview_input_functions(space, lm_space, vels, vec_to_lm,
                                         view_rad)
        with Network(seed=3) as net:
            vel = Node(velocity_func)
            view = Node(landmark_func)
            in_view = Node(in_view_f)
            slam = SLAMViewNetwork(space, lm_space, view_rad, 3,
                                   pi_n_neurons=80, mem_n_neurons=90,
                                   circonv_n_neurons=30,
                                   vel_scaling_factor=scale,
                                   cleanup_samples_per_dim=10, seed=3,
                                   gate_mode=gate_mode,
                                   gate_kwargs=gate_kwargs)
            Connection(vel, slam.velocity_input, synapse=None)
            Connection(view, slam.view_input, synapse=None)
            Connection(in_view, slam.no_landmark_in_view, synapse=None)
            out_p = Probe(slam.pathintegrator.output, synapse=0.05)
            enc_p = Probe(slam.assomemory.conn_in.learning_rule,
                          attr="scaled_encoders", sample_every=T)
            w_p = Probe(slam.assomemory.conn_out, attr="weights",
                        sample_every=T)
        sim = Simulator(net, seed=3, default_neuron_type=LIFRate())
        sim.run(T)
        return (np.asarray(sim.data[out_p]),
                np.asarray(sim.data[enc_p][-1]),
                np.asarray(sim.data[w_p][-1]))

    def test_auto_recovery_gate_builds_and_runs(self, space):
        # the in-model tracking-loss controller ported to the view family:
        # same stateful gate node, evidence channels wired off the view
        # memory (recall + PES error)
        out, _, _ = self._run_view(space, "auto_recovery")
        assert np.all(np.isfinite(out))

    def test_recovery_freezes_view_map_learning(self, space):
        # mirror of TestSLAMNetwork.test_recovery_suppresses_voja_and_pes
        # for the view family: permanent recovery must freeze Voja exactly
        # (1+gate cancels to 0) and inhibit the PES error population
        _, enc_rec, w_rec = self._run_view(
            space, "auto_recovery",
            {"arm_at_start": True, "trigger": 2.0, "familiar": 0.0,
             "recovery_T": 2 * 0.5})
        _, enc_ref, w_ref = self._run_view(space, "reference")
        # initial encoders: re-build and read the first step's snapshot
        path, vels, vec_to_lm = make_world(T=0.5, seed=3, high=2.0)
        lm_space = SPSpace(3, space.ssp_dim, seed=3)
        velocity_func, scale, in_view_f, landmark_func = \
            get_slamview_input_functions(space, lm_space, vels, vec_to_lm,
                                         5.0)
        with Network(seed=3) as net0:
            slam0 = SLAMViewNetwork(space, lm_space, 5.0, 3,
                                    pi_n_neurons=80, mem_n_neurons=90,
                                    circonv_n_neurons=30,
                                    vel_scaling_factor=scale,
                                    cleanup_samples_per_dim=10, seed=3)
            enc_p0 = Probe(slam0.assomemory.conn_in.learning_rule,
                           attr="scaled_encoders", sample_every=0.001)
        sim0 = Simulator(net0, seed=3, default_neuron_type=LIFRate())
        sim0.run_steps(1)
        enc_init = np.asarray(sim0.data[enc_p0][0])
        drift_ref = np.abs(enc_ref - enc_init).max()
        drift_rec = np.abs(enc_rec - enc_init).max()
        assert drift_ref > 1e-5, "control run should learn encoders"
        assert drift_rec <= 1e-6, (
            f"recovery must freeze Voja (drift {drift_rec} vs active "
            f"{drift_ref})")
        assert np.abs(w_rec).max() < 0.05 * max(np.abs(w_ref).max(), 1e-9)


class TestSLAMGatedNetwork:
    def test_end_to_end(self, space):
        T = 1.0
        path, vels, vec_to_lm = make_world(T=T, seed=3, high=1.0)
        d = space.ssp_dim
        lm_space = SPSpace(3, d, seed=3)
        view_rad = 0.8

        (velocity_func, scale, in_view_f, _, sp_f, _, vecssp_f) = \
            get_slam_input_functions(space, lm_space, vels, vec_to_lm, view_rad)
        real_ssp = space.encode(path)
        with Network(seed=3) as net:
            vel = Node(velocity_func)
            init = Node(lambda t: real_ssp[0] if t < 0.05 else np.zeros(d))
            lm_sp = Node(sp_f)
            lm_ssp = Node(vecssp_f)
            in_view = Node(in_view_f)
            slam = SLAMGatedNetwork(space, lm_space, view_rad, 3,
                                    pi_n_neurons=200, mem_n_neurons=250,
                                    circonv_n_neurons=50,
                                    dotprod_n_neurons=50,
                                    velocity_input=vel,
                                    landmark_vecssp_input=lm_ssp,
                                    landmark_sp_input=lm_sp,
                                    no_landmark_in_view=in_view,
                                    vel_scaling_factor=scale, seed=3)
            Connection(init, slam.pathintegrator.input, synapse=None)
            p = Probe(slam.pathintegrator.output, synapse=0.05)
        sim = Simulator(net, seed=3, default_neuron_type=LIFRate())
        sim.run(T)
        out = sim.data[p]
        sims = np.sum(out * real_ssp[:out.shape[0]], axis=1) / np.maximum(
            np.linalg.norm(out, axis=1), 1e-9)
        assert np.mean(sims[300:]) > 0.3


class TestAdapterRigidity:
    """get_slam_input_functions2's FPE factorisation is exact only for
    rigid (static-landmark) data; non-rigid inputs must take the exact
    per-point encoding path (round-3 ADVICE fix)."""

    def _brute_sum_vecssp(self, space, vec_to_lm, view_rad):
        T, L, n = vec_to_lm.shape
        dists = np.linalg.norm(vec_to_lm, axis=2)
        mask = dists <= view_rad
        enc = np.asarray(space.encode(vec_to_lm.reshape(-1, n)))
        enc = enc.reshape(T, L, space.ssp_dim)
        return np.einsum("tl,tld->td", mask, enc)

    def test_rigid_matches_brute_force(self, space):
        path, vels, vec_to_lm = make_world(T=0.2, seed=3)
        lm_space = SPSpace(3, space.ssp_dim, seed=3)
        from sspslam_tpu.models import get_slam_input_functions2
        out = get_slam_input_functions2(space, lm_space, vels, vec_to_lm, 0.8)
        vecssp_f = out[6]
        want = self._brute_sum_vecssp(space, vec_to_lm, 0.8)
        got = vecssp_f.table if hasattr(vecssp_f, "table") else np.stack(
            [vecssp_f((i + 1) * 0.001) for i in range(len(want))])
        assert np.allclose(np.asarray(got)[:len(want)], want, atol=1e-6)

    def test_nonrigid_falls_back_to_exact(self, space):
        path, vels, vec_to_lm = make_world(T=0.2, seed=4)
        # landmark 1 moves over time: breaks the rigidity precondition
        vec_to_lm = vec_to_lm.copy()
        T = vec_to_lm.shape[0]
        vec_to_lm[:, 1, 0] += 0.3 * np.sin(np.linspace(0, 3, T))
        lm_space = SPSpace(3, space.ssp_dim, seed=4)
        from sspslam_tpu.models import get_slam_input_functions2
        out = get_slam_input_functions2(space, lm_space, vels, vec_to_lm, 0.8)
        vecssp_f = out[6]
        want = self._brute_sum_vecssp(space, vec_to_lm, 0.8)
        got = np.stack([vecssp_f((i + 1) * 0.001) for i in range(T)])
        assert np.allclose(got, want, atol=1e-6)


class TestCleanupMethods:
    """clean_up_method pass-through parity (reference slam.py:212-222,
    slam_view.py:65,209): every reference-legal method value builds an
    on-device clean-up, including 'direct-optim' (grid init + traced
    Newton polish inside the step)."""

    def test_direct_optim_beats_coarse_grid(self, space):
        import jax.numpy as jnp
        from sspslam_tpu.models.slam import make_cleanup_fun
        rng = np.random.default_rng(0)
        grid_f, _, _ = make_cleanup_fun(space, method="grid",
                                        samples_per_dim=12)
        opt_f, _, _ = make_cleanup_fun(space, method="direct-optim",
                                       samples_per_dim=12, newton_iters=10)
        x_true = np.array([0.313, -0.547])
        phi = np.asarray(space.encode(x_true[None]))[0]
        noisy = phi + 0.05 * rng.normal(size=phi.shape)
        phi_j = jnp.asarray(noisy, jnp.float32)
        sim_grid = float(np.asarray(grid_f(phi_j)) @ phi)
        sim_opt = float(np.asarray(opt_f(phi_j)) @ phi)
        # the Newton polish must land closer to the true SSP than the
        # coarse 12/dim grid snap
        assert sim_opt > sim_grid
        assert sim_opt > 0.98

    def test_slam_builds_with_direct_optim(self, space):
        T = 0.3
        path, vels, vec_to_lm = make_world(T=T, seed=5, high=1.0)
        d = space.ssp_dim
        lm_space = SPSpace(3, d, seed=5)
        (velocity_func, scale, in_view_f, _, sp_f, _, vecssp_f) = \
            get_slam_input_functions(space, lm_space, vels, vec_to_lm, 0.6)
        with Network(seed=0) as net:
            vel = Node(velocity_func)
            lm_id = Node(sp_f)
            lm_ssp = Node(vecssp_f)
            in_view = Node(in_view_f)
            slam = SLAMNetwork(space, lm_space, 0.6, 3,
                               pi_n_neurons=120, mem_n_neurons=150,
                               circonv_n_neurons=40,
                               vel_scaling_factor=scale,
                               clean_up_method="direct-optim",
                               cleanup_samples_per_dim=15, seed=0)
            Connection(vel, slam.velocity_input, synapse=None)
            Connection(lm_id, slam.landmark_id_input, synapse=None)
            Connection(lm_ssp, slam.landmark_vec_ssp, synapse=None)
            Connection(in_view, slam.no_landmark_in_view, synapse=None)
            p = Probe(slam.pathintegrator.output, synapse=0.05)
        sim = Simulator(net, seed=0, default_neuron_type=LIFRate())
        sim.run(T)
        out = sim.data[p]
        assert out.shape[0] == int(T / 0.001)
        assert np.all(np.isfinite(out))

    def test_slamview_accepts_all_methods(self, space):
        """SLAMViewNetwork no longer raises on reference-legal values."""
        lm_space = SPSpace(3, space.ssp_dim, seed=0)
        for method in ("grid", "direct-optim", None):
            net = SLAMViewNetwork(space, lm_space, 0.6, 3,
                                  pi_n_neurons=80, mem_n_neurons=100,
                                  circonv_n_neurons=40,
                                  clean_up_method=method,
                                  cleanup_samples_per_dim=10, seed=0)
            assert (net.clean_up_fun is None) == (method is None)


class TestAdapterDegenerateWorld:
    def test_stationary_path_yields_finite_inputs(self, space):
        """All-zero velocity (stationary agent): the reference's bare
        1/max|A v| divide gives inf scale and NaN velocities that LIF
        silently squashes; the adapter must fail soft to scale 1 and
        finite signals (models/slam.py _vel_scale)."""
        from sspslam_tpu.models import get_slam_input_functions
        from sspslam_tpu.models.slam import get_slam_input_functions2
        lm_space = SPSpace(2, space.ssp_dim, seed=0)
        vels = np.zeros((50, 2))
        path = np.zeros((50, 2))
        landmarks = np.array([[0.2, 0.1], [-0.3, 0.2]])
        vec = landmarks[None, :, :] - path[:, None, :]
        for adapter in (get_slam_input_functions,
                        get_slam_input_functions2):
            out = adapter(space, lm_space, vels, vec, 0.8)
            scale = out[1]
            assert np.isfinite(scale) and scale == 1.0
            vf = out[0]
            assert np.all(np.isfinite(np.asarray(vf(0.01))))

    def test_stationary_view_adapter(self, space):
        from sspslam_tpu.models import get_slamview_input_functions
        lm_space = SPSpace(2, space.ssp_dim, seed=0)
        vels = np.zeros((50, 2))
        vec = np.tile(np.array([[0.2, 0.1], [-0.3, 0.2]])[None], (50, 1, 1))
        vf, scale, _, _ = get_slamview_input_functions(
            space, lm_space, vels, vec, 0.8)
        assert np.isfinite(scale) and scale == 1.0
        assert np.all(np.isfinite(np.asarray(vf(0.01))))


class TestAutoRecoveryGateUnit:
    """Direct unit tests of make_auto_recovery_gate_func (models/slam.py) —
    the pure stateful-node function behind gate_mode='auto_recovery'.
    Covers the two round-4 behaviors the network-level tests don't pin:
    the map-consistency trigger (the channel that survives fast learning,
    VALIDATION.md kidnap tables) and the decaying recovery shift schedule
    (the fix for the armed-gate precision gap, VALIDATION.md map-merge)."""

    d = 6

    def _gate(self, **kw):
        from sspslam_tpu.models.slam import make_auto_recovery_gate_func
        g = make_auto_recovery_gate_func(
            update_thres=0.4, shift_rate=0.1, d=self.d, dt=0.001,
            recovery_shift_rate=0.3, recovery_T=0.2, **kw)
        return g, {k: np.float32(v) for k, v in g.hoisted_consts.items()}

    def _x(self, pos, pi, recall, value, in_view=True):
        err = recall - value
        return np.concatenate(
            [pos, pi, recall, err,
             np.array([0.0 if in_view else 1.0])]).astype(np.float32)

    def _basis(self, i):
        e = np.zeros(self.d, np.float32)
        e[i] = 1.0
        return e

    def test_consistency_trigger_fires_on_orthogonal_value(self):
        """A familiar landmark whose incoming bound value is orthogonal to
        the stored recall (the kidnap signature) must trigger recovery even
        while agreement stays perfect; a collinear value (initial learning /
        steady tracking) must never trigger."""
        import jax.numpy as jnp
        gate, consts = self._gate(arm_at_start=True)
        pos = self._basis(0)
        recall = self._basis(1)
        # tracking healthy: pos_est == pi_est -> agreement 1
        x_orth = jnp.asarray(self._x(pos, pos, recall, self._basis(2)))
        x_coll = jnp.asarray(self._x(pos, pos, recall, 0.5 * recall))
        for x, should_fire in ((x_coll, False), (x_orth, True)):
            s = jnp.asarray([1.0, 1.0, 0.0, 1.0], jnp.float32)
            fired = False
            for _ in range(2000):
                out, s = gate(0.0, x, s, consts)
                if float(out[self.d]) > 0:
                    fired = True
                    break
            assert fired == should_fire, (should_fire, np.asarray(s))

    def test_recovery_shift_decays_linearly_to_steady_state(self):
        """With recovery_decay (default) the correction rate ramps from
        recovery_shift_rate down to shift_rate over the window; without it
        the window holds the full rate throughout."""
        import jax.numpy as jnp

        def run(decay):
            gate, consts = self._gate(arm_at_start=True,
                                      recovery_decay=decay)
            pos, pi = self._basis(0), self._basis(1)   # dot=0 < thr
            recall = self._basis(1)
            x_trig = jnp.asarray(self._x(pos, pi, recall, self._basis(2)))
            x_hold = jnp.asarray(self._x(pos, pi, recall, 0.7 * recall))
            s = jnp.asarray([1.0, 1.0, 0.0, 1.0], jnp.float32)
            norms = []
            for _ in range(2000):
                out, s = gate(0.0, x_trig if float(s[2]) == 0 else x_hold,
                              s, consts)
                if float(s[2]) > 0:
                    norms.append(float(jnp.linalg.norm(out[:self.d])))
                    if float(s[2]) <= 1:
                        break
            return np.array(norms)

        base = float(np.linalg.norm(self._basis(0) - self._basis(1)))
        dec = run(True)
        # first recovery step runs at the full recovery rate ...
        assert dec[0] == pytest.approx(0.3 * base, rel=1e-3)
        # ... and the ramp is linear down to the steady-state rate
        assert dec[-1] == pytest.approx(0.1 * base, rel=2e-2)
        mid = dec[len(dec) // 2]
        assert mid == pytest.approx(0.2 * base, rel=5e-2)
        assert np.all(np.diff(dec) <= 1e-7)
        flat = run(False)
        assert flat[0] == pytest.approx(0.3 * base, rel=1e-3)
        assert flat[-1] == pytest.approx(0.3 * base, rel=1e-3)

    def test_consistency_evidence_holds_across_inconclusive_steps(self):
        """Out-of-view / unfamiliar steps must neither build nor erase the
        consistency evidence: the EMA is only defined on familiar
        encounters, and relaxing between them would erase a dip before the
        next encounter confirms it (measured design rule, VALIDATION.md)."""
        import jax.numpy as jnp
        gate, consts = self._gate(arm_at_start=True)
        pos = self._basis(0)
        recall = self._basis(1)
        x_orth = jnp.asarray(self._x(pos, pos, recall, self._basis(2)))
        x_blind = jnp.asarray(self._x(pos, pos, recall, self._basis(2),
                                      in_view=False))
        x_unfam = jnp.asarray(self._x(pos, pos, 0.01 * recall,
                                      self._basis(2)))
        s = jnp.asarray([1.0, 1.0, 0.0, 1.0], jnp.float32)
        for _ in range(100):            # accumulate a partial dip
            out, s = gate(0.0, x_orth, s, consts)
        assert float(out[self.d]) == 0.0    # not yet triggered
        dip = float(s[3])
        assert dip < 1.0
        for x in (x_blind, x_unfam):    # inconclusive: evidence held
            for _ in range(500):
                out, s = gate(0.0, x, s, consts)
            assert float(s[3]) == pytest.approx(dip, abs=1e-6)
            assert float(out[self.d]) == 0.0

    def test_np_mirror_matches_jit_path(self):
        """The NumPy interpreter mirror must step the gate identically to
        the traced function across a mixed random input sequence."""
        import jax.numpy as jnp
        gate, consts = self._gate(arm_at_start=False)
        rng = np.random.default_rng(7)
        s_j = jnp.asarray(gate.state_init)
        s_n = np.asarray(gate.state_init).copy()
        for i in range(400):
            pos = rng.normal(size=self.d).astype(np.float32)
            pi = (pos + 0.3 * rng.normal(size=self.d)).astype(np.float32)
            recall = rng.normal(size=self.d).astype(np.float32)
            value = rng.normal(size=self.d).astype(np.float32)
            x = self._x(pos, pi, recall, value, in_view=(i % 3 != 0))
            out_j, s_j = gate(0.0, jnp.asarray(x), s_j, consts)
            out_n, s_n = gate.np_function(0.0, x, s_n, consts)
            np.testing.assert_allclose(np.asarray(out_j), out_n,
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(s_j), s_n,
                                       rtol=1e-5, atol=1e-6)


class TestAnchorGateUnit:
    """Unit tests for the absolute-anchor extension of the auto-recovery
    gate (models/slam.py, round 5): surveyed beacon landmarks give the
    controller a statistic measured against the WORLD instead of the
    learned map — the remedy for both measured observability limits
    (co-drifting map at d=393; the scaled 2x-vr kidnap masked by the
    familiarity floor, VALIDATION 'Part 8b').  The beacon observation
    arrives as dedicated inputs (anchor_pos / anchor_vec /
    anchor_no_view) rather than the model's bundled landmark inputs —
    the multi-landmark adapter superimposes in-view SPs, which dilutes
    any in-gate identity match (measured: a 10-anchor in-gate matcher
    never fired at the 3-D scaled config)."""

    @pytest.fixture(scope="class")
    def setup(self):
        bounds = 1.1 * np.tile(np.array([-1, 1.0]), (2, 1))
        space = HexagonalSSPSpace(2, ssp_dim=25, seed=0, length_scale=0.2,
                                  domain_bounds=bounds)
        L0 = np.array([0.3, -0.2])
        from sspslam_tpu.models.slam import make_auto_recovery_gate_func
        gate = make_auto_recovery_gate_func(
            update_thres=0.2, shift_rate=0.1, d=space.ssp_dim,
            anchor=True, anchor_trigger=0.3)
        return space, L0, gate

    def _inputs(self, space, L0, x_true, x_pi, anchor_seen=True):
        # co-drift stream: map, cleanup and PI all agree on x_pi (so the
        # agreement and consistency channels read healthy) while the
        # beacon observation reports the TRUE egocentric vector and L0's
        # surveyed position
        d = space.ssp_dim
        pos = space.encode(x_pi).reshape(d)
        anc_pos = space.encode(L0).reshape(d)
        anc_vec = space.encode(L0 - x_true).reshape(d)
        return np.concatenate(
            [pos, pos, pos, np.zeros(d), anc_pos, anc_vec,
             [0.0 if anchor_seen else 10.0], [0.0]]).astype(np.float32)

    def test_anchor_fires_on_codrift_base_channels_blind(self, setup):
        space, L0, gate = setup
        consts = dict(gate.hoisted_consts)
        npf = gate.np_function
        s = gate.state_init.copy()
        x_true = np.array([0.1, 0.1])
        x = self._inputs(space, L0, x_true, x_true)
        for _ in range(3000):
            out, s = npf(0.0, x, s, consts)
        assert s[0] == 1.0 and s[2] == 0.0, "healthy phase must arm, not fire"
        # co-drift: everything internal says x_pi, the beacon says x_true.
        # agreement = cos(pos, pi) = 1 and cons = cos(recall, recall) = 1,
        # so ONLY the anchor channel can see this loss.
        x = self._inputs(space, L0, x_true, x_true + [0.8, 0.0])
        fired_at = None
        for i in range(3000):
            out, s = npf(0.0, x, s, consts)
            if fired_at is None and s[2] > 0:
                fired_at = i
        assert fired_at is not None and fired_at < 1000, np.asarray(s)

    def test_anchor_evidence_requires_beacon_in_view(self, setup):
        space, L0, gate = setup
        consts = dict(gate.hoisted_consts)
        npf = gate.np_function
        s = gate.state_init.copy()
        x_true = np.array([0.1, 0.1])
        x = self._inputs(space, L0, x_true, x_true)
        for _ in range(3000):
            out, s = npf(0.0, x, s, consts)
        # the same co-drift with the beacon OUT of view must never fire
        # (the held a_ema stays at its healthy level)
        x = self._inputs(space, L0, x_true, x_true + [0.8, 0.0],
                         anchor_seen=False)
        for _ in range(3000):
            out, s = npf(0.0, x, s, consts)
        assert s[2] == 0.0, np.asarray(s)

    def test_anchor_recovery_pulls_toward_absolute_pose(self, setup):
        import jax.numpy as jnp
        from sspslam_tpu.ops import vsa
        space, L0, gate = setup
        d = space.ssp_dim
        consts = dict(gate.hoisted_consts)
        npf = gate.np_function
        s = gate.state_init.copy()
        x_true = np.array([0.1, 0.1])
        x_pi = x_true + np.array([0.8, 0.0])
        x = self._inputs(space, L0, x_true, x_true)
        for _ in range(3000):
            out, s = npf(0.0, x, s, consts)
        x = self._inputs(space, L0, x_true, x_pi)
        for _ in range(400):
            out, s = npf(0.0, x, s, consts)
        assert s[2] > 0, "must be in recovery"
        corr = out[:d]
        pose_abs = np.asarray(vsa.unbind(
            jnp.asarray(space.encode(L0 - x_true).reshape(d), jnp.float32),
            jnp.asarray(space.encode(L0).reshape(d), jnp.float32)))
        expect = pose_abs - space.encode(x_pi).reshape(d)
        cos = corr @ expect / (np.linalg.norm(corr) * np.linalg.norm(expect))
        assert cos > 0.99, cos
        # ...and the absolute target itself decodes to the true pose
        true_ssp = space.encode(x_true).reshape(d)
        cos_t = (pose_abs @ true_ssp
                 / (np.linalg.norm(pose_abs) * np.linalg.norm(true_ssp)))
        assert cos_t > 0.95, cos_t

    def test_anchor_np_mirror_matches_jit_path(self, setup):
        import jax.numpy as jnp
        space, L0, gate = setup
        consts = dict(gate.hoisted_consts)
        cj = {k: jnp.asarray(v) for k, v in consts.items()}
        s_j = jnp.asarray(gate.state_init)
        s_n = gate.state_init.copy()
        rng = np.random.default_rng(0)
        for i in range(100):
            xt = rng.uniform(-0.5, 0.5, 2)
            xp = xt + rng.uniform(-0.6, 0.6, 2)
            x = self._inputs(space, L0, xt, xp, anchor_seen=(i % 3 != 0))
            out_j, s_j = gate(0.0, jnp.asarray(x), s_j, cj)
            out_n, s_n = gate.np_function(0.0, x, s_n, consts)
            np.testing.assert_allclose(np.asarray(out_j), out_n,
                                       rtol=1e-4, atol=5e-4)
            np.testing.assert_allclose(np.asarray(s_j), s_n,
                                       rtol=1e-4, atol=5e-4)

    def test_anchor_input_adapter_picks_nearest_surveyed(self, space):
        """get_anchor_input_functions: per step the NEAREST surveyed
        landmark within the view radius drives all three tables; steps
        with no surveyed landmark in range read flag=10 and zero rows."""
        from sspslam_tpu.models import get_anchor_input_functions
        d = space.ssp_dim
        path = np.array([[0.0, 0.0], [0.5, 0.5], [-0.6, 0.0]])
        landmarks = np.array([[0.1, 0.0], [0.6, 0.5], [0.9, -0.9]])
        vec_to_lm = landmarks[None, :, :] - path[:, None, :]
        anchor_lms = np.array([0, 1])
        pos_f, vec_f, iv_f = get_anchor_input_functions(
            space, vec_to_lm, anchor_lms, landmarks[anchor_lms],
            view_rad=0.3, dt=1.0)
        pos_rows, vec_rows = pos_f.rows(0, 3), vec_f.rows(0, 3)
        iv_rows = iv_f.rows(0, 3)
        # step 0: landmark 0 at distance 0.1 (seen); step 1: landmark 1 at
        # 0.1 (seen); step 2: nothing within 0.3
        assert iv_rows[0, 0] == 0.0 and iv_rows[1, 0] == 0.0
        assert iv_rows[2, 0] == 10.0
        np.testing.assert_allclose(
            pos_rows[0], space.encode(landmarks[0]).reshape(d), atol=1e-5)
        np.testing.assert_allclose(
            pos_rows[1], space.encode(landmarks[1]).reshape(d), atol=1e-5)
        np.testing.assert_allclose(
            vec_rows[1],
            space.encode(landmarks[1] - path[1]).reshape(d), atol=1e-5)
        assert np.all(pos_rows[2] == 0.0) and np.all(vec_rows[2] == 0.0)

    def test_network_builds_with_anchor(self, space):
        path, vels, vec_to_lm = make_world(T=0.3, seed=0, high=2.0)
        landmarks = vec_to_lm[0] + path[0]
        lm_space = SPSpace(3, space.ssp_dim, seed=0)
        from sspslam_tpu.models import get_anchor_input_functions
        (velocity_func, vel_scale, in_view_f, _, lm_sp_f, _,
         lm_vecssp_f) = \
            get_slam_input_functions(space, lm_space, vels, vec_to_lm, 5.0)
        anc_pos_f, anc_vec_f, anc_iv_f = get_anchor_input_functions(
            space, vec_to_lm, np.array([0]), landmarks[:1], 5.0)
        with Network(seed=0) as net:
            slam = SLAMNetwork(space, lm_space, 5.0, 3,
                               pi_n_neurons=80, mem_n_neurons=90,
                               circonv_n_neurons=30,
                               vel_scaling_factor=vel_scale,
                               cleanup_samples_per_dim=10, seed=0,
                               gate_mode="auto_recovery", anchor=True)
            for node, fn in ((slam.velocity_input, velocity_func),
                             (slam.landmark_id_input, lm_sp_f),
                             (slam.landmark_vec_ssp, lm_vecssp_f),
                             (slam.no_landmark_in_view, in_view_f),
                             (slam.anchor_pos_input, anc_pos_f),
                             (slam.anchor_vec_ssp, anc_vec_f),
                             (slam.no_anchor_in_view, anc_iv_f)):
                src = Node(fn)
                Connection(src, node, synapse=None)
            out_p = Probe(slam.output, sample_every=0.01)
            gate_p = Probe(slam.update_state, sample_every=0.01)
        sim = Simulator(net, seed=0, default_neuron_type=LIFRate())
        sim.run(0.3)
        assert np.all(np.isfinite(np.asarray(sim.data[out_p])))
        assert np.all(np.isfinite(np.asarray(sim.data[gate_p])))
        # reference gate must refuse an anchor
        with pytest.raises(ValueError):
            SLAMNetwork(space, lm_space, 5.0, 3, pi_n_neurons=8,
                        mem_n_neurons=9, circonv_n_neurons=3,
                        cleanup_samples_per_dim=4, anchor=True)

    def test_view_network_builds_with_anchor(self, space):
        # part 9 (VALIDATION): the view family's internal statistics carry
        # no kidnap signature, so the beacon channels are its ONLY
        # detection path — same wiring as SLAMNetwork, nothing from the
        # view memory feeds the anchor statistic
        path, vels, vec_to_lm = make_world(T=0.3, seed=0, high=2.0)
        landmarks = vec_to_lm[0] + path[0]
        lm_space = SPSpace(3, space.ssp_dim, seed=0)
        from sspslam_tpu.models import get_anchor_input_functions
        velocity_func, vel_scale, in_view_f, view_f = \
            get_slamview_input_functions(space, lm_space, vels, vec_to_lm,
                                         5.0)
        anc_pos_f, anc_vec_f, anc_iv_f = get_anchor_input_functions(
            space, vec_to_lm, np.array([0]), landmarks[:1], 5.0)
        with Network(seed=0) as net:
            slam = SLAMViewNetwork(space, lm_space, 5.0, 3,
                                   pi_n_neurons=80, mem_n_neurons=90,
                                   circonv_n_neurons=30,
                                   vel_scaling_factor=vel_scale,
                                   cleanup_samples_per_dim=10, seed=0,
                                   gate_mode="auto_recovery", anchor=True)
            for node, fn in ((slam.velocity_input, velocity_func),
                             (slam.view_input, view_f),
                             (slam.no_landmark_in_view, in_view_f),
                             (slam.anchor_pos_input, anc_pos_f),
                             (slam.anchor_vec_ssp, anc_vec_f),
                             (slam.no_anchor_in_view, anc_iv_f)):
                src = Node(fn)
                Connection(src, node, synapse=None)
            out_p = Probe(slam.output, sample_every=0.01)
            gate_p = Probe(slam.update_state, sample_every=0.01)
        sim = Simulator(net, seed=0, default_neuron_type=LIFRate())
        sim.run(0.3)
        assert np.all(np.isfinite(np.asarray(sim.data[out_p])))
        assert np.all(np.isfinite(np.asarray(sim.data[gate_p])))
        with pytest.raises(ValueError):
            SLAMViewNetwork(space, lm_space, 5.0, 3, pi_n_neurons=8,
                            mem_n_neurons=9, circonv_n_neurons=3,
                            cleanup_samples_per_dim=4, anchor=True)
