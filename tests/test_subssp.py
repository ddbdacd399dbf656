"""Sub-SSP extraction/projection matrices and SSP eval-point distributions."""

import numpy as np

from sspslam_tpu import HexagonalSSPSpace
from sspslam_tpu.nef import Rd, Sobol, SSPMixedEval, SSPSobol
from sspslam_tpu.ops import vsa


class TestSubSSP:
    def setup_method(self):
        self.N = 4      # modules
        self.sublen = 3
        self.tot = 2 * self.sublen * self.N + 1
        rng = np.random.default_rng(0)
        v = rng.normal(size=self.tot)
        # make conj-symmetric-compatible (any real vector works)
        self.S = v

    def test_fourier_extract_picks_module_freqs(self):
        F = np.fft.fftshift(np.fft.fft(self.S))
        for n in range(self.N):
            FA = vsa.sub_fourier_extract(n, self.N, self.sublen)
            # the sub-spectrum: matrix applied to shifted spectrum contains
            # exactly 2*sublen module frequencies + the DC term
            sub = FA @ F
            assert sub.shape == (2 * self.sublen + 1,)
            assert np.isclose(sub[self.sublen],
                              F[self.tot // 2] if False else F[self.sublen * self.N])

    def test_extract_project_roundtrip(self):
        """sum_n B_n @ (A_n @ S) == S — the defining property
        (reference sspspace.py:871-921)."""
        acc = np.zeros_like(self.S)
        for n in range(self.N):
            A_n = vsa.sub_ssp_extract(n, self.N, self.sublen)
            B_n = vsa.sub_ssp_project(n, self.N, self.sublen)
            acc = acc + B_n @ (A_n @ self.S)
        # the DC term is shared: A_n each capture it fully, B_n scales by 1/N
        assert np.allclose(acc, self.S, atol=1e-10)

    def test_sub_ssp_matches_fourier_path(self):
        n = 1
        A_n = vsa.sub_ssp_extract(n, self.N, self.sublen)
        FA = vsa.sub_fourier_extract(n, self.N, self.sublen)
        got = A_n @ self.S
        want = np.fft.ifft(np.fft.ifftshift(
            FA @ np.fft.fftshift(np.fft.fft(self.S)))).real
        # time-domain matrix equals the DFT-conjugated frequency selection
        assert np.allclose(got, want, atol=1e-9)


class TestSSPDistributions:
    def test_sspsobol(self):
        bounds = np.tile(np.array([-1, 1.0]), (2, 1))
        space = HexagonalSSPSpace(2, ssp_dim=31, seed=0, domain_bounds=bounds)
        pts = SSPSobol(space).sample(16)
        assert pts.shape == (16, space.ssp_dim)
        # SSP-encoded points are unit vectors
        assert np.allclose(np.linalg.norm(pts, axis=1), 1.0, atol=1e-5)

    def test_mixed_eval(self):
        bounds = np.tile(np.array([-1, 1.0]), (2, 1))
        space = HexagonalSSPSpace(2, ssp_dim=31, seed=0, domain_bounds=bounds)
        rng = np.random.default_rng(0)
        pts = SSPMixedEval(space).sample(20, rng=rng)
        assert pts.shape == (20, space.ssp_dim)
        assert np.all(np.isfinite(pts))

    def test_sobol_rd_ranges(self):
        rng = np.random.default_rng(0)
        s = Sobol().sample(32, 3, rng=rng)
        r = Rd().sample(32, 3)
        for arr in (s, r):
            assert arr.shape == (32, 3)
            assert arr.min() >= 0 and arr.max() <= 1


class TestCleanupFromSet:
    def test_default_is_exact_f32(self):
        """The generic op compares in float32 by default: bank rows whose
        similarities differ by less than bf16 resolution are still
        distinguished (model call sites opt into bf16 explicitly)."""
        import jax.numpy as jnp
        from sspslam_tpu.ops.vsa import cleanup_from_set
        rng = np.random.default_rng(0)
        v1 = rng.normal(size=8)
        v1 /= np.linalg.norm(v1)
        w = rng.normal(size=8)
        v2 = v1 + 0.02 * (w - (w @ v1) * v1)
        v2 /= np.linalg.norm(v2)
        bank = jnp.asarray(np.stack([v1, v2]), jnp.float32)
        q = jnp.asarray(v2, jnp.float32)
        got = np.asarray(cleanup_from_set(bank, q))
        assert np.allclose(got, v2, atol=1e-6)
        # sanity: the two similarities really are inside bf16 epsilon
        sims = np.stack([v1, v2]) @ v2
        assert 0 < sims[1] - sims[0] < 0.0078

    def test_default_cleanup_dtype_env(self, monkeypatch):
        import jax.numpy as jnp
        from sspslam_tpu.ops.vsa import default_cleanup_dtype
        monkeypatch.delenv("SSPSLAM_CLEANUP_F32", raising=False)
        assert default_cleanup_dtype() is jnp.bfloat16
        monkeypatch.setenv("SSPSLAM_CLEANUP_F32", "1")
        assert default_cleanup_dtype() is jnp.float32
