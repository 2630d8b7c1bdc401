"""Unit tests of the functional boundary-MPS engine (the reference ships no
MPS unit tests; SURVEY.md section 4 calls for adding them)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tnax import bmps


def dense_state(A):
    """Contract a padded stacked MPS (L, D, d, D) to the dense vector over
    the valid boundary channels (index 0 at both ends)."""
    L, D, d, _ = A.shape
    v = np.zeros((1, D))
    v[0, 0] = 1.0
    out = v  # (prefix_dims..., D)
    for n in range(L):
        out = np.einsum("...a,adb->...db", out, np.asarray(A[n]))
    return out[..., 0].ravel()


def random_mps(rng, L, D, d, Dpad):
    A = np.zeros((L, Dpad, d, Dpad))
    dims = [1] + [D] * (L - 1) + [1]
    for n in range(L):
        A[n, :dims[n], :, :dims[n + 1]] = rng.normal(
            size=(dims[n], d, dims[n + 1]))
    return jnp.asarray(A)


def test_canonize_preserves_state():
    rng = np.random.default_rng(0)
    A = random_mps(rng, L=5, D=3, d=2, Dpad=6)
    mps = bmps.MPS(A=A, lognorm=jnp.zeros(()))
    ref = dense_state(A)
    for canon in (bmps.canonize_left, bmps.canonize_right):
        out, disc = canon(mps)
        got = dense_state(out.A) * 2.0 ** float(out.lognorm)
        assert np.allclose(got, ref, rtol=1e-10), canon.__name__
        assert float(disc) == 0.0


def test_canonize_left_orthogonality():
    rng = np.random.default_rng(1)
    A = random_mps(rng, L=4, D=4, d=2, Dpad=4)
    out, _ = bmps.canonize_left(bmps.MPS(A=A, lognorm=jnp.zeros(())))
    for n in range(3):  # all but last site: sum_a A[a]^T A[a] = P (projector)
        An = np.asarray(out.A[n])
        G = np.einsum("adb,adc->bc", An, An)
        # gram must be an identity on its support
        s = np.linalg.svd(G, compute_uv=False)
        assert np.all((np.abs(s - 1) < 1e-10) | (np.abs(s) < 1e-10))


def test_truncation_exact_when_rank_small():
    """A rank-2 state truncated to D=2 must be exact."""
    rng = np.random.default_rng(2)
    A = random_mps(rng, L=5, D=2, d=2, Dpad=8)
    ref = dense_state(A)
    mps = bmps.MPS(A=A, lognorm=jnp.zeros(()))
    out, overlap, disc = bmps.compress(mps, 2, tolS=1e-15, tolV=1e-12,
                                       max_sweeps=10, graduate=True)
    got = dense_state(out.A) * 2.0 ** float(out.lognorm)
    assert np.allclose(got, ref, rtol=1e-8)
    assert float(disc) < 1e-7


def test_compress_quality_vs_exact_truncation():
    """Compression to D must reach the optimal truncation error scale."""
    rng = np.random.default_rng(3)
    L, d = 6, 2
    A = random_mps(rng, L, D=8, d=d, Dpad=8)
    ref = dense_state(A)
    mps = bmps.MPS(A=A, lognorm=jnp.zeros(()))
    D = 4
    out, overlap, disc = bmps.compress(mps, D, tolS=1e-16, tolV=1e-12,
                                       max_sweeps=30, graduate=True)
    got = dense_state(out.A) * 2.0 ** float(out.lognorm)
    # optimal error from dense SVD across the middle cut
    mat = ref.reshape(d ** 3, d ** 3)
    s = np.linalg.svd(mat, compute_uv=False)
    opt_err = np.sqrt((s[D:] ** 2).sum())
    err = np.linalg.norm(got - ref)
    assert err <= max(5 * opt_err, 1e-10)


def test_apply_mpo_matches_dense():
    rng = np.random.default_rng(4)
    L, D, d, lh = 3, 2, 2, 2
    A = random_mps(rng, L, D, d, D)
    W = rng.normal(size=(L, lh, d, lh, d))  # (n, l, dphys_out, r, u_in)
    # boundary MPO legs must close: set l of site0 / r of last to dim 1
    W[0, 1:] = 0
    W[-1, :, :, 1:] = 0
    Wj = jnp.asarray(W)
    fat = bmps.apply_mpo(bmps.MPS(A=A, lognorm=jnp.zeros(())), Wj, conj=True)
    got = dense_state(fat.A)
    # dense check: out[u...] = sum_{d...} (prod_n W[n][l_n, d_n, l_{n+1}, u_n])
    #              * psi[d...], with the horizontal chain closed at index 0.
    import itertools
    psi = dense_state(A).reshape([d] * L)
    out = np.zeros([d] * L)
    for us in itertools.product(range(d), repeat=L):
        acc = 0.0
        for ds in itertools.product(range(d), repeat=L):
            mat = np.eye(lh)[:1, :]  # start on l=0
            for n in range(L):
                mat = mat @ W[n][:, ds[n], :, us[n]]
            acc += mat[0, 0] * psi[ds]
        out[us] = acc
    assert np.allclose(got.reshape([d] * L), out, atol=1e-10)


def test_rsvd_wide_sketch_exact_on_lowrank():
    """_rsvd with the 'wide' oversampling recovers an exactly low-rank
    matrix: U S Vh reconstructs Gm and the spectrum matches the dense SVD
    (the sketch subspace contains the whole range when rank <= k)."""
    import jax
    rng = np.random.default_rng(7)
    m, n, r = 200, 300, 10
    Gm = jnp.asarray(rng.normal(size=(m, r)) @ rng.normal(size=(r, n)))
    k = 2 * 16 + 32  # the 'wide' oversampling at Dmax=16
    U, S, Vh = bmps._rsvd(Gm, k, jax.random.PRNGKey(0))
    rec = np.asarray(U * S[None, :]) @ np.asarray(Vh)
    assert np.allclose(rec, np.asarray(Gm), atol=1e-8)
    s_ref = np.linalg.svd(np.asarray(Gm), compute_uv=False)
    assert np.allclose(np.asarray(S)[:r], s_ref[:r], rtol=1e-8)
    assert np.all(np.abs(np.asarray(S)[r:]) < 1e-7 * s_ref[0])


@pytest.mark.parametrize("rsvd", ["wide", "bf16", True, False])
def test_zipup_rsvd_variants_trace_and_agree(rsvd):
    """Every rsvd mode of zipup_apply produces the same physical state at
    small shapes (where the sketch gate falls back to the exact SVD —
    this pins the plumbing: unknown strings must not crash or change
    semantics at sub-sketch sizes)."""
    rng = np.random.default_rng(9)
    L, D, d, lh = 4, 3, 2, 2
    A = random_mps(rng, L, D, d, D)
    mps, _ = bmps.canonize_right(bmps.MPS(A=A, lognorm=jnp.zeros(())))
    W = rng.normal(size=(L, lh, d, lh, d))
    W[0, 1:] = 0
    W[-1, :, :, 1:] = 0
    out, disc = bmps.zipup_apply(mps, jnp.asarray(W), Dmax=D * lh,
                                 conj=True, tol=1e-16, rsvd=rsvd)
    ref, _ = bmps.zipup_apply(mps, jnp.asarray(W), Dmax=D * lh,
                              conj=True, tol=1e-16, rsvd=False)
    got = dense_state(out.A) * np.exp2(float(out.lognorm))
    want = dense_state(ref.A) * np.exp2(float(ref.lognorm))
    assert np.allclose(got, want, atol=1e-8)
