"""L0 algebra tests: closed-form identities for the SSP/SP spaces.

Oracles: direct NumPy FFT formulas (the same identities the reference's
``circconv`` NumPy reference implements, binding.py:12-20) and analytic
properties of fractional-power encodings.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sspslam_tpu import (
    SPSpace,
    SSPSpace,
    RandomSSPSpace,
    HexagonalSSPSpace,
    RectangularSSPSpace,
)
from sspslam_tpu.ops import vsa


def np_circconv(a, b):
    return np.fft.ifft(np.fft.fft(a, axis=-1) * np.fft.fft(b, axis=-1), axis=-1).real


class TestVsaOps:
    def test_encode_matches_direct_formula(self):
        rng = np.random.default_rng(0)
        space = RandomSSPSpace(2, 33, seed=0, length_scale=0.5)
        x = rng.normal(size=(7, 2))
        got = space.encode(x)
        want = np.fft.ifft(
            np.exp(1j * space.phase_matrix @ (x / 0.5).T), axis=0).real.T
        assert np.allclose(got, want, atol=1e-5)

    def test_encode_is_unitary_and_sums_to_similarity_one(self):
        space = HexagonalSSPSpace(2, ssp_dim=55, seed=1)
        phi = space.encode(np.array([[0.3, -0.7]]))
        # unit norm (all Fourier coefficients on the unit circle)
        assert np.allclose(np.linalg.norm(phi), 1.0, atol=1e-5)
        # identity at x=0
        phi0 = space.encode(np.zeros((1, 2)))
        assert np.allclose(phi0, space.identity(), atol=1e-5)

    def test_bind_matches_circconv(self):
        rng = np.random.default_rng(1)
        a = rng.normal(size=(4, 33))
        b = rng.normal(size=(4, 33))
        got = np.asarray(vsa.bind(jnp.asarray(a), jnp.asarray(b)))
        assert np.allclose(got, np_circconv(a, b), atol=1e-4)

    def test_fpe_additivity(self):
        # phi(x) * phi(y) == phi(x + y) for fractional power encodings
        space = HexagonalSSPSpace(2, ssp_dim=55, seed=2)
        x = np.array([[0.2, 0.3]])
        y = np.array([[-0.5, 0.1]])
        lhs = space.bind(space.encode(x), space.encode(y))
        rhs = space.encode(x + y)
        assert np.allclose(lhs, rhs, atol=1e-4)

    def test_invert_unbinds(self):
        space = HexagonalSSPSpace(2, ssp_dim=55, seed=3)
        a = space.encode(np.array([[0.4, -0.2]]))
        b = space.encode(np.array([[-0.1, 0.6]]))
        bound = space.bind(a, b)
        recovered = space.bind(bound, space.invert(a))
        assert np.allclose(recovered, b, atol=1e-4)

    def test_unbind_op_equals_invert_bind(self):
        rng = np.random.default_rng(2)
        space = RandomSSPSpace(2, 33, seed=4)
        a = space.encode(rng.normal(size=(3, 2)))
        b = space.encode(rng.normal(size=(3, 2)))
        got = np.asarray(vsa.unbind(jnp.asarray(a), jnp.asarray(b)))
        want = space.bind(space.invert(a), b)
        assert np.allclose(got, want, atol=1e-4)

    def test_make_unitary(self):
        rng = np.random.default_rng(3)
        v = rng.normal(size=(2, 31))
        u = np.asarray(vsa.make_unitary(jnp.asarray(v)))
        fu = np.fft.fft(u, axis=-1)
        assert np.allclose(np.abs(fu), 1.0, atol=1e-4)

    def test_encode_and_deriv_matches_finite_difference(self):
        space = RandomSSPSpace(2, 27, seed=5, length_scale=0.7)
        x = np.array([[0.3, -0.4]])
        phi, dphi = space.encode_and_deriv(x)
        eps = 1e-4
        for j in range(2):
            dx = np.zeros((1, 2))
            dx[0, j] = eps
            fd = (space.encode(x + dx) - space.encode(x - dx)) / (2 * eps)
            assert np.allclose(dphi[0, :, j], fd[0], atol=1e-2)

    def test_cleanup_from_set(self):
        space = HexagonalSSPSpace(2, ssp_dim=55, seed=6, length_scale=0.2,
                                  domain_bounds=np.array([[-1, 1], [-1, 1.0]]))
        ssps, pts = space.get_sample_pts_and_ssps(25)
        noisy = ssps[37] + 0.05 * np.random.default_rng(0).normal(size=ssps.shape[1])
        cleaned = np.asarray(vsa.cleanup_from_set(jnp.asarray(ssps), jnp.asarray(noisy)))
        assert np.allclose(cleaned, ssps[37], atol=1e-6)


class TestPhaseMatrices:
    def test_conjsym_structure(self):
        K = np.random.default_rng(0).normal(size=(5, 2))
        F = vsa.conjsym(K)
        assert F.shape == (11, 2)
        assert np.allclose(F[0], 0)
        assert np.allclose(F[1:6], K)
        assert np.allclose(F[6:], -np.flip(K, axis=0))

    def test_hexagonal_dim_solver(self):
        # requesting ssp_dim=97 in 2-D: 2*n^2*3+1 -> n=4 -> 97
        space = HexagonalSSPSpace(2, ssp_dim=97, seed=0)
        assert space.ssp_dim == 97
        assert space.phase_matrix.shape == (97, 2)
        # conjugate symmetry of the phase matrix
        A = space.phase_matrix
        assert np.allclose(A[0], 0)
        assert np.allclose(A[1:49], -np.flip(A[49:], axis=0))

    def test_rectangular_dim_solver(self):
        space = RectangularSSPSpace(2, ssp_dim=81, seed=0)
        # 2 * n^2 * 2 + 1 with n=4 -> 65; solver picks n=int(sqrt(80/4))=4
        assert space.ssp_dim == 2 * space.n_rotates * space.n_scales * 2 + 1

    def test_random_space_dim(self):
        space = RandomSSPSpace(3, 101, seed=0)
        assert space.ssp_dim == 101
        assert space.phase_matrix.shape == (101, 3)


class TestDecoding:
    def test_from_set_roundtrip(self):
        bounds = np.array([[-1, 1], [-1, 1.0]])
        space = HexagonalSSPSpace(2, ssp_dim=97, seed=0, domain_bounds=bounds,
                                  length_scale=0.2)
        rng = np.random.default_rng(0)
        x = rng.uniform(-0.8, 0.8, size=(20, 2))
        phi = space.encode(x)
        xhat = space.decode(phi, method="from-set", num_samples=100)
        # grid resolution is 2/99 ~ 0.02
        assert np.max(np.abs(xhat - x)) < 0.03

    def test_direct_optim_refines(self):
        bounds = np.array([[-1, 1], [-1, 1.0]])
        space = HexagonalSSPSpace(2, ssp_dim=97, seed=0, domain_bounds=bounds,
                                  length_scale=0.2)
        rng = np.random.default_rng(1)
        x = rng.uniform(-0.8, 0.8, size=(10, 2))
        phi = space.encode(x)
        xhat = space.decode(phi, method="direct-optim", num_samples=30)
        assert np.max(np.abs(xhat - x)) < 5e-3

    def test_decoder_net(self, tmp_path):
        bounds = np.array([[-1, 1], [-1, 1.0]])
        space = HexagonalSSPSpace(2, ssp_dim=55, seed=0, domain_bounds=bounds,
                                  length_scale=0.3)
        space.train_decoder_net(n_training_pts=3000, n_epochs=30,
                                folder=str(tmp_path), load_file=False)
        rng = np.random.default_rng(2)
        x = rng.uniform(-0.5, 0.5, size=(10, 2))
        xhat = space.decode(space.encode(x), method="network")
        assert np.mean(np.abs(xhat - x)) < 0.25
        # reload path
        space2 = HexagonalSSPSpace(2, ssp_dim=55, seed=0, domain_bounds=bounds,
                                   length_scale=0.3)
        space2.train_decoder_net(folder=str(tmp_path), load_file=True)
        xhat2 = space2.decode(space.encode(x), method="network")
        assert np.allclose(xhat, xhat2, atol=1e-5)

    def test_load_keras_decoder_net(self, tmp_path):
        """Reference-trained Keras .h5 decoder nets load directly
        (migration interop): write the reference's HDF5 layout (reference
        sspspace.py:603-636 saves Dense(ssp_dim,relu)->Dense(h,relu)->
        Dense(n)) and check the loaded params drive decode('network')."""
        import h5py

        bounds = np.array([[-1, 1], [-1, 1.0]])
        space = HexagonalSSPSpace(2, ssp_dim=55, seed=0,
                                  domain_bounds=bounds, length_scale=0.3)
        d, h, n = space.ssp_dim, 8, 2
        rng = np.random.default_rng(3)
        layers = {
            "layer1": (rng.normal(size=(d, d)).astype(np.float32),
                       rng.normal(size=(d,)).astype(np.float32)),
            "layer2": (rng.normal(size=(d, h)).astype(np.float32),
                       rng.normal(size=(h,)).astype(np.float32)),
            "output": (rng.normal(size=(h, n)).astype(np.float32),
                       rng.normal(size=(n,)).astype(np.float32)),
        }
        path = str(tmp_path / "ref_decoder.h5")
        with h5py.File(path, "w") as f:
            mw = f.create_group("model_weights")
            mw.attrs["layer_names"] = np.array(
                [k.encode() for k in layers])
            for name, (k, b) in layers.items():
                g = mw.create_group(name).create_group(name)
                g.create_dataset("kernel:0", data=k)
                g.create_dataset("bias:0", data=b)
        space.load_keras_decoder_net(path)
        phi = space.encode(np.array([[0.2, -0.4]])).astype(np.float32)
        got = space.decode(phi, method="network")
        # hand-computed reference forward pass
        z = phi
        for name in ("layer1", "layer2"):
            k, b = layers[name]
            z = np.maximum(z @ k + b, 0.0)
        want = z @ layers["output"][0] + layers["output"][1]
        assert np.allclose(got, want, atol=1e-4)
        # wrong-shape net is rejected
        import pytest
        other = HexagonalSSPSpace(2, ssp_dim=31, seed=0,
                                  domain_bounds=bounds, length_scale=0.3)
        with pytest.raises(ValueError):
            other.load_keras_decoder_net(path)


class TestSPSpace:
    def test_orthogonality_and_cleanup(self):
        sp = SPSpace(8, 64, seed=0)
        v = sp.vectors
        sims = v @ v.T
        off = sims - np.diag(np.diag(sims))
        assert np.max(np.abs(off)) < 0.3
        idx = np.array([3])
        noisy = sp.encode(idx)[0] + 0.1 * np.random.default_rng(0).normal(size=64)
        assert sp.decode(noisy)[0] == 3

    def test_bind_invert_roundtrip(self):
        sp = SPSpace(4, 32, seed=1)
        a, b = sp.vectors[0], sp.vectors[1]
        bound = sp.bind(a, b)
        rec = sp.bind(bound, sp.inverse_vectors[0])
        # unitary vectors: unbinding recovers exactly
        assert np.allclose(rec, b[None, :], atol=1e-2)

    def test_binding_matrix(self):
        sp = SPSpace(4, 16, seed=2)
        a, b = sp.vectors[0], sp.vectors[1]
        C = sp.get_binding_matrix(a)
        assert np.allclose(C @ b, sp.bind(a, b)[0], atol=1e-6)

    def test_identity(self):
        sp = SPSpace(4, 16, seed=3)
        a = sp.vectors[2]
        assert np.allclose(sp.bind(a, sp.identity()), a[None], atol=1e-10)


class TestGridEncoders:
    def test_sample_grid_encoders_shapes_and_norm(self):
        space = HexagonalSSPSpace(2, ssp_dim=97, seed=0,
                                  domain_bounds=np.array([[-1, 1], [-1, 1.0]]))
        enc = space.sample_grid_encoders(50)
        assert enc.shape == (50, 97)
        assert np.allclose(np.linalg.norm(enc, axis=1), 1.0, atol=1e-6)

    def test_rectangular_grid_encoders(self):
        space = RectangularSSPSpace(2, ssp_dim=65, seed=0,
                                    domain_bounds=np.array([[-1, 1], [-1, 1.0]]))
        enc = space.sample_grid_encoders(20)
        assert enc.shape[0] == 20
        assert np.all(np.isfinite(enc))

    def test_wave_encoders(self):
        space = HexagonalSSPSpace(2, ssp_dim=55, seed=0,
                                  domain_bounds=np.array([[-1, 1], [-1, 1.0]]))
        enc = space.sample_wave_encoders(30)
        assert enc.shape == (30, 55)
        assert np.all(np.isfinite(enc))


class TestFourierLayout:
    @pytest.mark.parametrize("d", [7, 55, 97])
    def test_to_from_fourier_roundtrip_odd(self, d):
        rng = np.random.default_rng(0)
        v = np.asarray(vsa.make_unitary(jnp.asarray(rng.normal(size=d))))
        to_F = vsa.to_fourier_matrix(d)
        from_F = vsa.from_fourier_matrix(d)
        k = (d + 1) // 2
        stacked = to_F @ v
        # fill the DC triple that the input matrix leaves for the constant node
        F = np.fft.fft(v)
        stacked[0] = F[0].real
        stacked[1] = F[0].imag
        assert np.allclose(from_F @ stacked, v, atol=1e-5)

    def test_to_fourier_rows_match_fft(self):
        d = 33
        rng = np.random.default_rng(1)
        v = rng.normal(size=d)
        M = vsa.to_fourier_matrix(d)
        F = np.fft.fft(v)
        k = (d + 1) // 2
        got = M @ v
        for j in range(1, k):
            assert np.isclose(got[3 * j], F[j].real, atol=1e-8)
            assert np.isclose(got[3 * j + 1], F[j].imag, atol=1e-8)


class TestBindingTransforms:
    @pytest.mark.parametrize("d", [8, 33, 97])
    @pytest.mark.parametrize("invert_a,invert_b",
                             [(False, False), (True, False), (False, True)])
    def test_neural_binding_matrices_compute_circconv(self, d, invert_a, invert_b):
        rng = np.random.default_rng(d)
        a = rng.normal(size=d)
        b = rng.normal(size=d)
        tr_a, tr_b = vsa.binding_input_transforms(d, invert_a, invert_b)
        tr_out = vsa.binding_output_transform(d)
        prod = (tr_a @ a) * (tr_b @ b)
        got = tr_out @ prod
        A = np.fft.fft(a)
        B = np.fft.fft(b)
        if invert_a:
            A = A.conj()
        if invert_b:
            B = B.conj()
        want = np.fft.ifft(A * B).real
        assert np.allclose(got, want, atol=1e-6)
