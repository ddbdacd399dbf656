"""int8/fp8 parameter-storage tests (ops/quantize.py + executor plumbing).

The quantised-weight path is the Loihi-8-bit-synapse analog (reference
run_slam.py:205-210 targets 15-chip Loihi); these tests pin (a) the
per-slice scale factorisation algebra, (b) end-to-end SLAM accuracy at
int8 vs f32, and (c) the AOT-export round trip of quantised params.
"""

import numpy as np
import pytest

from sspslam_tpu import HexagonalSSPSpace, SPSpace
from sspslam_tpu.models import SLAMNetwork, get_slam_input_functions
from sspslam_tpu.nef import (Connection, LIFRate, Network, Node, Probe,
                             Simulator)
from sspslam_tpu.ops.quantize import QTensor, quant_error, quantize

from test_slam import make_world


class TestQTensor:
    def test_int8_factorisation_exact(self, rng):
        # act @ dequant(D) == (act @ q) * s up to f32 rounding: the scale
        # is constant along the contracted axis, so it commutes out
        D = rng.standard_normal((200, 64)).astype(np.float32)
        act = (rng.standard_normal(200) * 50).astype(np.float32)
        qt = quantize(D, caxis=0, kind="int8")
        exact = act @ np.asarray(qt.dequant())
        fact = (act @ np.asarray(qt.q, np.float32)) * np.asarray(qt.s)
        assert np.abs(exact - fact).max() <= 1e-5 * np.abs(exact).max()

    def test_int8_error_bound(self, rng):
        # round-to-nearest on [-127, 127]: error <= 0.5/127 of slice amax
        x = rng.standard_normal((50, 80)).astype(np.float32)
        assert quant_error(x, caxis=1, kind="int8") <= 0.5 / 127 + 1e-6

    def test_fp8_error_bound(self, rng):
        # e4m3 has a 3-bit mantissa: relative step 2^-4 near amax
        x = rng.standard_normal((50, 80)).astype(np.float32)
        assert quant_error(x, caxis=1, kind="fp8") <= 2.0 ** -4 + 1e-6

    def test_zero_slices_stay_zero(self):
        # phantom mesh-padding rows are exact zeros; scale guard must not
        # divide by zero
        x = np.zeros((4, 16), np.float32)
        x[0] = 1.0
        qt = quantize(x, caxis=1, kind="int8")
        assert np.all(np.isfinite(np.asarray(qt.s)))
        assert np.array_equal(np.asarray(qt.dequant())[1:], x[1:])

    def test_pytree_roundtrip(self, rng):
        import jax
        x = rng.standard_normal((8, 16)).astype(np.float32)
        qt = quantize(x, caxis=1)
        leaves, treedef = jax.tree_util.tree_flatten(qt)
        assert len(leaves) == 2
        qt2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert qt2.caxis == qt.caxis
        assert np.array_equal(np.asarray(qt2.q), np.asarray(qt.q))


def _run_slam(matmul_dtype, T=2.0):
    bounds = 1.1 * np.tile(np.array([-1, 1.0]), (2, 1))
    space = HexagonalSSPSpace(2, ssp_dim=55, seed=0, length_scale=0.3,
                              domain_bounds=bounds)
    path, vels, vec_to_lm = make_world(T=T, seed=0, high=0.5)
    d = space.ssp_dim
    lm_space = SPSpace(3, d, seed=0)
    (velocity_func, vel_scaling_factor, is_landmark_in_view, _,
     landmark_sp_func, _, landmark_vecssp_func) = get_slam_input_functions(
        space, lm_space, vels, vec_to_lm, 0.6)
    real_ssp = space.encode(path)
    with Network(seed=0) as net:
        vel = Node(velocity_func)
        init = Node(lambda t: real_ssp[0] if t < 0.05 else np.zeros(d))
        lm_id = Node(landmark_sp_func)
        lm_ssp = Node(landmark_vecssp_func)
        in_view = Node(is_landmark_in_view)
        slam = SLAMNetwork(space, lm_space, 0.6, 3,
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
    sim = Simulator(net, seed=0, default_neuron_type=LIFRate(),
                    matmul_dtype=matmul_dtype)
    sim.run(T)
    out = sim.data[p]
    dec = space.decode(out[::100], num_samples=50)
    err = np.linalg.norm(dec - path[::100], axis=1)
    return float(np.median(err[5:])), sim


class TestQuantizedSLAM:
    def test_int8_slam_tracks(self):
        # full SLAM (learned memory, gates, circular convolution, clean-up)
        # with every static matmul param stored int8: tracking must stay
        # inside the same band the f32 end-to-end test pins (test_slam.py)
        err_q, sim = _run_slam("int8")
        assert err_q < 0.45
        # the big static banks really are stored 1 byte/weight
        qs = [v["D"] for v in sim.params["conn"].values()
              if isinstance(v.get("D"), QTensor)]
        assert qs and all(np.asarray(q.q).dtype == np.int8 for q in qs)

    def test_int8_matches_f32_closely(self):
        # same seed, same build: the only difference is parameter storage.
        # int8 per-slice error is <=0.4% of amax — decoded paths must agree
        # far tighter than the absolute accuracy band
        err_f32, _ = _run_slam(None)
        err_q, _ = _run_slam("int8")
        assert abs(err_q - err_f32) < 0.1, (err_f32, err_q)


class TestQuantizedExport:
    def test_int8_bundle_roundtrip(self, tmp_path):
        from sspslam_tpu.nef import ServingModel, save_bundle
        _, sim = _run_slam("int8", T=1.0)
        seg = 250
        save_bundle(sim, str(tmp_path / "b"), segment_steps=seg)
        m = ServingModel(str(tmp_path / "b"))
        qs = [v["D"] for v in m.params["conn"].values()
              if isinstance(v.get("D"), QTensor)]
        assert qs, "quantised decoders did not survive the bundle"
        xs = np.zeros((seg, m.meta["input_width"]), np.float32)
        out = m.run(xs)
        assert all(np.all(np.isfinite(v)) for v in out.values())
