"""Native host library vs NumPy fallbacks (skipped when the .so is absent
and cannot be built)."""

import numpy as np
import pytest

from sspslam_tpu import native
from sspslam_tpu.utils.sampling import Rd_sampling


@pytest.fixture(scope="module", autouse=True)
def ensure_built():
    if not native.AVAILABLE:
        if not native.build():
            pytest.skip("native library unavailable and toolchain missing")


class TestNativeOps:
    def test_rd_sampling_matches_numpy(self):
        got = native.rd_sampling(100, 3, seed=0.5)
        want = Rd_sampling(100, 3, seed=0.5)
        assert np.allclose(got, want, atol=1e-12)

    def test_stretch_trajectory(self):
        rng = np.random.default_rng(0)
        traj = rng.normal(size=(50, 2))
        out = native.stretch_trajectory(traj, 0.02, 0.001)
        assert out.shape == (1000, 2)
        # endpoints preserved
        assert np.allclose(out[0], traj[0])
        assert np.allclose(out[-1], traj[-1], atol=1e-9)
        # monotone interpolation stays within range
        assert out[:, 0].max() <= traj[:, 0].max() + 1e-9
        assert out[:, 0].min() >= traj[:, 0].min() - 1e-9

    def test_nearest_landmark(self):
        rng = np.random.default_rng(1)
        vecs = rng.normal(size=(200, 5, 2))
        ids, dists = native.nearest_landmark(vecs, view_rad=1.0)
        want_d = np.linalg.norm(vecs, axis=2)
        want_near = np.argmin(want_d, axis=1)
        nd = want_d[np.arange(200), want_near]
        want_ids = np.where(nd <= 1.0, want_near, -1)
        assert np.array_equal(ids, want_ids)
        assert np.allclose(dists, nd, atol=1e-9)

    def test_argmax_decode(self):
        rng = np.random.default_rng(2)
        data = rng.normal(size=(300, 31)).astype(np.float32)
        bank = rng.normal(size=(500, 31)).astype(np.float32)
        got = native.argmax_decode(data, bank)
        want = np.argmax(data @ bank.T, axis=1)
        assert np.array_equal(got, want)

    def test_lowpass_filter(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(400, 4)).astype(np.float32)
        y = native.lowpass_filter(x, tau=0.05, dt=0.001)
        a = np.exp(-0.001 / 0.05)
        acc = np.zeros(4)
        for t in range(5):
            acc = a * acc + (1 - a) * x[t]
        assert np.allclose(y[4], acc, atol=1e-5)

    def test_lif_rates(self):
        from sspslam_tpu.ops.neurons import LIFRate
        J = np.linspace(-1, 10, 64).astype(np.float32)
        got = native.lif_rates(J)
        want = LIFRate().rates_np(J)
        assert np.allclose(got, want, rtol=2e-4, atol=1e-3)
