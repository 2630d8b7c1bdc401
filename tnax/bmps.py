"""Functional boundary-MPS engine (JAX, static shapes).

TPU-first redesign of the reference MPS module (reference
`tnac4o/mps.py:96-811`). Instead of an object with mutable, *ragged* per-site
tensors, an MPS is a single stacked array ``A`` of shape ``(L, D, d, D)`` —
every bond and physical dimension padded to a static maximum — plus a scalar
``lognorm`` (accumulated log2 scale, replacing the reference's ``normC``,
`tnac4o/mps.py:122,536-547`). Ragged bond dimensions (reference `_Dset`,
`mps.py:644-653`) appear here as exactly-zero channels: QR/SVD of matrices
with zero rows/columns propagate exact zeros, so no masks are needed in the
hot path and every sweep compiles once and runs as `lax.scan` over sites.

The three building blocks mirror the reference semantics:

- :func:`canonize_left` / :func:`canonize_right` — QR sweeps with optional
  on-the-fly SVD truncation of the centre matrix (reference
  `canonise_left/right` + `truncateC`, `mps.py:202-236,562-585`).
- :func:`variational_compress` — alternating one-site sweeps against a fixed
  (possibly fat) target MPS (reference `variational_compress`,
  `mps.py:238-279`).
- :func:`compress` — the graduate-truncation driver (reference `compress_mps`,
  `mps.py:175-200`).

MPO application (reference `apply_mpo`/`_mps_HA`, `mps.py:353-359,753-763`)
is a single einsum producing the "fat" MPS with bond ``D*l``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class MPS(NamedTuple):
    """Stacked boundary MPS: ``A[(n, Dl, d, Dr)]`` + log2 norm factor."""
    A: jax.Array
    lognorm: jax.Array


def init_mps(L: int, D: int, d: int, dtype, initial: str = "X",
             canonize: str = "left", seed: int = 0,
             valid_D: int = None) -> MPS:
    """Initialize a padded MPS (reference `MPS.__init__`/`reset_mps`,
    `tnac4o/mps.py:108-157`).

    initial: 'X' (maximally mixed product), 'Z' (basis state 0),
    'randR' (uniform real in [-1, 1]), 'randC' (complex — promotes dtype).
    ``valid_D`` bounds the populated bond channels (default: D).
    """
    import numpy as np_
    vD = min(valid_D or D, D)
    # reference caps ragged bond dims by distance to the edges (_Dset)
    dims = [min(d ** n, d ** (L - n), vD) for n in range(L + 1)]
    rng = np_.random.default_rng(seed)
    A = np_.zeros((L, D, d, D),
                  dtype=np_.complex128 if initial == "randC" else np_.float64)
    for n in range(L):
        dl, dr = dims[n], dims[n + 1]
        if initial == "X":
            A[n, 0, :, 0] = 1.0 / np_.sqrt(d)
        elif initial == "Z":
            A[n, 0, 0, 0] = 1.0
        elif initial == "randR":
            A[n, :dl, :, :dr] = 2 * rng.random((dl, d, dr)) - 1
        elif initial == "randC":
            A[n, :dl, :, :dr] = (2 * rng.random((dl, d, dr)) - 1) \
                + 1j * (2 * rng.random((dl, d, dr)) - 1)
        else:
            raise ValueError(f"unknown initial {initial!r}")
    out = MPS(A=jnp.asarray(A, dtype if initial != "randC" else None),
              lognorm=jnp.zeros((), jnp.float64 if initial == "randC"
                                else dtype))
    if canonize == "left":
        out, _ = canonize_left(out)
    elif canonize == "right":
        out, _ = canonize_right(out)
    return out


def identity_mpo(L: int, lh: int, d: int, dtype) -> jax.Array:
    """Stacked identity MPO (l, d, r, u legs; reference `_mpo_identity`,
    `tnac4o/mps.py:873-877`)."""
    W = jnp.zeros((L, lh, d, lh, d), dtype=dtype)
    eye = jnp.eye(d, dtype=dtype)
    return W.at[:, 0, :, 0, :].set(eye)


def mpo_from_block(M: jax.Array, dout: int, din: int) -> jax.Array:
    """Reshape a block matrix into one MPO tensor (l, out, r, in)
    (reference `_block_matrix_to_mpo`, `tnac4o/mps.py:867-871`)."""
    sout, sin = M.shape
    return M.reshape(sout // dout, dout, sin // din, din)


def expectation_mpo(bra_A: jax.Array, W: jax.Array,
                    ket_A: jax.Array) -> jax.Array:
    """<bra| W |ket> for a stacked MPO W (l, d_ket, r, d_bra... legs
    (l, out, r, in): out contracts the bra, in the ket; reference
    `setup_FL`/`_mps_FL`, `tnac4o/mps.py:488-494,671-676`)."""
    Db = bra_A.shape[1]
    Dk = ket_A.shape[1]
    lh = W.shape[1]
    F = jnp.zeros((Db, lh, Dk), dtype=ket_A.dtype).at[0, 0, 0].set(1.0)

    def step(F, xs):
        b, Wn, k = xs
        T = jnp.einsum("blk,kdm->bldm", F, k)
        T = jnp.einsum("bldm,lerd->berm", T, Wn)
        F = jnp.einsum("berm,bec->crm", T, b)
        return F, None

    F, _ = lax.scan(step, F, (bra_A, W, ket_A))
    return F[0, 0, 0]


def mpo_envs_at(bra_A: jax.Array, W: jax.Array, ket_A: jax.Array, n: int):
    """Left/right MPO-sandwich environments around site ``n``.

    Functional analogue of the reference's cached ``F[n]``/``F[n+1]``
    3-leg environments (`setup_FL`/`setup_FR`, `tnac4o/mps.py:488-530`):
    FL contracts sites 0..n-1 of <bra| W |ket>, FR sites n+1..L-1. Legs
    (bra, mpo, ket). ``n`` must be a static int (the scans have static
    lengths)."""
    L = bra_A.shape[0]
    Db, Dk, lh = bra_A.shape[1], ket_A.shape[1], W.shape[1]
    FL = jnp.zeros((Db, lh, Dk), dtype=ket_A.dtype).at[0, 0, 0].set(1.0)
    FR = jnp.zeros((Db, lh, Dk), dtype=ket_A.dtype).at[0, 0, 0].set(1.0)

    def left(F, xs):
        b, Wn, k = xs
        T = jnp.einsum("blk,kdm->bldm", F, k)
        T = jnp.einsum("bldm,lerd->berm", T, Wn)
        return jnp.einsum("berm,bec->crm", T, b), None

    def right(F, xs):
        b, Wn, k = xs
        T = jnp.einsum("kdm,crm->kdcr", k, F)
        T = jnp.einsum("kdcr,lerd->kecl", T, Wn)
        return jnp.einsum("kecl,bec->blk", T, b), None

    if n > 0:
        FL, _ = lax.scan(left, FL, (bra_A[:n], W[:n], ket_A[:n]))
    if n < L - 1:
        FR, _ = lax.scan(right, FR, (bra_A[n + 1:], W[n + 1:],
                                     ket_A[n + 1:]), reverse=True)
    return FL, FR


def expectation_1mpo_mix(bra_A: jax.Array, W: jax.Array, ket_A: jax.Array,
                         n: int, Wn: jax.Array) -> jax.Array:
    """<bra| W |ket> with the MPO tensor at site ``n`` replaced by ``Wn``
    (reference `expectation_1mpo_mix`, `tnac4o/mps.py:593-598`, kernel
    `_mps_expectation_mpo` `:700-706`). ``Wn`` legs (l, out, r, in)."""
    FL, FR = mpo_envs_at(bra_A, W, ket_A, n)
    T = jnp.einsum("blk,kdm->bldm", FL, ket_A[n])
    T = jnp.einsum("bldm,lerd->berm", T, Wn)
    T = jnp.einsum("berm,bec->crm", T, bra_A[n])
    return jnp.einsum("crm,crm->", T, FR)


def expectation_list_1mpo_mix(bra_A: jax.Array, W: jax.Array,
                              ket_A: jax.Array, n: int,
                              Wns: jax.Array) -> jax.Array:
    """Batched :func:`expectation_1mpo_mix` over a stack of site tensors
    ``Wns`` (N, l, out, r, in) — the environments are built once and every
    replacement operator contracts against them in one vmapped einsum
    (reference `expectation_list_1mpo_mix` + `_mps_expectation_list_mpo`,
    `tnac4o/mps.py:600-603,708-714`)."""
    FL, FR = mpo_envs_at(bra_A, W, ket_A, n)
    T = jnp.einsum("blk,kdm->bldm", FL, ket_A[n])
    T = jnp.einsum("bldm,nlerd->nberm", T, Wns)
    T = jnp.einsum("nberm,bec->ncrm", T, bra_A[n])
    return jnp.einsum("ncrm,crm->n", T, FR)


def trivial_mps(L: int, D: int, d: int, dtype) -> MPS:
    """Product state of ones on the valid (index-0) channels.

    Plays the role of the reference's initial `MPS(d=1, L=Nx, Dmax=1,
    initial='X')` boundary (reference `tnac4o/tnac4o.py:1682`).
    """
    A = jnp.zeros((L, D, d, D), dtype=dtype).at[:, 0, 0, 0].set(1.0)
    return MPS(A=A, lognorm=jnp.zeros((), dtype=dtype))


# ---------------------------------------------------------------------------
# dense kernels
# ---------------------------------------------------------------------------

def nfactor(x: jax.Array) -> jax.Array:
    """Largest |entry| floored to a power of two; 1 for the zero matrix.

    Power-of-two rescaling is exact in floating point (reference `nfactor`,
    `tnac4o/mps.py:76-85`, implemented there by bit-twiddling the f64
    exponent; `exp2(floor(log2(.)))` is the portable equivalent).
    """
    m = jnp.max(jnp.abs(x))
    m = jnp.where(m > 0, m, 1.0)
    return jnp.exp2(jnp.floor(jnp.log2(m)))


def qr_fixed(M: jax.Array):
    """Economic QR with the sign of diag(R) fixed to be non-negative
    (reference `qr`, `tnac4o/mps.py:43-59`)."""
    Q, R = jnp.linalg.qr(M, mode="reduced")
    s = jnp.sign(jnp.diagonal(R))
    s = jnp.where(s == 0, 1.0, s).astype(M.dtype)
    return Q * s[None, :], R * s[:, None]


def svd_fixed(M: jax.Array):
    """SVD with deterministic column-sign convention
    (reference `svd`, `tnac4o/mps.py:24-40`)."""
    U, S, Vh = jnp.linalg.svd(M, full_matrices=False)
    flip = (jnp.abs(U.min(0)) > U.max(0)) & (jnp.abs(Vh.min(1)) > Vh.max(1))
    s = jnp.where(flip, -1.0, 1.0).astype(M.dtype)
    return U * s[None, :], S, Vh * s[:, None]


def truncate_center(C: jax.Array, cap: int, tol: float):
    """SVD-truncate the centre matrix to rank <= cap, dropping singular
    values below ``tol * S[0]`` (reference `_mps_truncateC`,
    `tnac4o/mps.py:802-811`). Keeps static shapes: discarded channels are
    zeroed, not removed.

    Returns (U, S, Vh, discarded) with masked U columns / Vh rows.
    """
    eps = float(jnp.finfo(C.dtype).eps)
    tol = max(eps, tol)
    U, S, Vh = svd_fixed(C)
    k = jnp.arange(S.shape[0])
    keep = (S > S[0] * tol) & (k < cap)
    s0 = jnp.where(S[0] > 0, S[0], 1.0)
    discarded = jnp.sqrt(jnp.sum(jnp.where(keep, 0.0, S) ** 2)) / s0
    S = jnp.where(keep, S, 0.0)
    U = U * keep[None, :].astype(C.dtype)
    Vh = Vh * keep[:, None].astype(C.dtype)
    return U, S, Vh, discarded


# ---------------------------------------------------------------------------
# canonization sweeps
# ---------------------------------------------------------------------------

def _absorb_final_scalar(A, C, lognorm):
    """Drop the final (1x1-valid) centre matrix into lognorm + a sign on the
    last-touched site tensor ``A[idx]``. Reference absorbs the sign in
    `_mps_decompose_AC` (`tnac4o/mps.py:778-781`)."""
    c = C[0, 0]
    mag = jnp.abs(c)
    lognorm = lognorm + jnp.where(mag > 0, jnp.log2(jnp.where(mag > 0, mag, 1.0)), 0.0)
    if jnp.iscomplexobj(A):
        sign = jnp.where(mag > 0, c / jnp.where(mag > 0, mag, 1.0), 1.0)
    else:
        sign = jnp.where(c < 0, -1.0, 1.0).astype(A.dtype)
    return A, sign, lognorm


def canonize_left(mps: MPS, *, compress: bool = False, cap: int = None,
                  tol: float = 0.0):
    """Left-canonize; optionally SVD-truncate every bond to <= cap.

    Returns (MPS, max_discarded). Reference `canonise_left`
    (`tnac4o/mps.py:202-218`).
    """
    L, Dl, d, Dr = mps.A.shape
    dtype = mps.A.dtype
    C0 = jnp.zeros((Dl, Dl), dtype=dtype).at[0, 0].set(1.0)

    def step(carry, An):
        C, lognorm, disc = carry
        Ai = jnp.einsum("ab,bdc->adc", C, An)
        Q, R = qr_fixed(Ai.reshape(Dl * d, Dr))
        nf = nfactor(R)
        R = R / nf
        lognorm = lognorm + jnp.log2(nf)
        Qr = Q.reshape(Dl, d, Dr)
        if compress:
            U, S, Vh, dsc = truncate_center(R, cap, tol)
            Anew = jnp.einsum("adb,bk->adk", Qr, U)
            C = S[:, None] * Vh
            disc = jnp.maximum(disc, dsc)
        else:
            Anew, C = Qr, R
        return (C, lognorm, disc), Anew

    init = (C0, mps.lognorm, jnp.zeros((), dtype=dtype))
    (C, lognorm, disc), Anew = lax.scan(step, init, mps.A)
    Anew, sign, lognorm = _absorb_final_scalar(Anew, C, lognorm)
    Anew = Anew.at[L - 1].multiply(sign)
    return MPS(A=Anew, lognorm=lognorm), disc


def canonize_right(mps: MPS, *, compress: bool = False, cap: int = None,
                   tol: float = 0.0):
    """Right-canonize; optionally SVD-truncate every bond to <= cap.

    Returns (MPS, max_discarded). Reference `canonise_right`
    (`tnac4o/mps.py:220-236`).
    """
    L, Dl, d, Dr = mps.A.shape
    dtype = mps.A.dtype
    C0 = jnp.zeros((Dr, Dr), dtype=dtype).at[0, 0].set(1.0)

    def step(carry, An):
        C, lognorm, disc = carry
        Ai = jnp.einsum("adb,bc->adc", An, C)
        Q, R = qr_fixed(Ai.reshape(Dl, d * Dr).T)
        nf = nfactor(R)
        R = R / nf
        lognorm = lognorm + jnp.log2(nf)
        Qr = Q.T.reshape(Dl, d, Dr)
        Craw = R.T  # sits on the left of site n
        if compress:
            U, S, Vh, dsc = truncate_center(Craw, cap, tol)
            Anew = jnp.einsum("kb,bdc->kdc", Vh, Qr)
            C = U * S[None, :]
            disc = jnp.maximum(disc, dsc)
        else:
            Anew, C = Qr, Craw
        return (C, lognorm, disc), Anew

    init = (C0, mps.lognorm, jnp.zeros((), dtype=dtype))
    (C, lognorm, disc), Anew = lax.scan(step, init, mps.A, reverse=True)
    Anew, sign, lognorm = _absorb_final_scalar(Anew, C, lognorm)
    Anew = Anew.at[0].multiply(sign)
    return MPS(A=Anew, lognorm=lognorm), disc


def slice_bond(mps: MPS, D: int) -> MPS:
    """Shrink the padded bond dimension to D.

    Exact whenever every bond has been truncated to rank <= D (truncation
    zeroes trailing channels, so slicing drops only zeros).
    """
    return MPS(A=mps.A[:, :D, :, :D], lognorm=mps.lognorm)


def pad_bond(mps: MPS, D: int) -> MPS:
    L, Dl, d, Dr = mps.A.shape
    if Dl == D:
        return mps
    A = jnp.zeros((L, D, d, D), dtype=mps.A.dtype)
    A = A.at[:, :Dl, :, :Dr].set(mps.A)
    return MPS(A=A, lognorm=mps.lognorm)


# ---------------------------------------------------------------------------
# MPO application
# ---------------------------------------------------------------------------

def apply_mpo(mps: MPS, W: jax.Array, *, conj: bool) -> MPS:
    """Apply one row of traced PEPS tensors ``W[(n, l, d, r, u)]`` to the MPS.

    conj=True (top boundary, reference `apply_mpo(..., Hconj=True)`,
    `tnac4o/mps.py:753-763`): the MPS physical leg contracts the MPO's
    down-leg, leaving the up-leg; fat bonds are (mps-bond, mpo-bond) with
    mps-major ordering. conj=False is the mirror (bottom boundary).
    """
    L, D, d, _ = mps.A.shape
    lh = W.shape[1]
    if conj:
        fat = jnp.einsum("nadb,nldru->nalubr", mps.A, W)
    else:
        fat = jnp.einsum("nldru,naub->nladrb", W, mps.A)
    fat = fat.reshape(L, D * lh, -1, D * lh)
    return MPS(A=fat, lognorm=mps.lognorm)


# ---------------------------------------------------------------------------
# variational compression
# ---------------------------------------------------------------------------

def _mix_left(RL, p, a):
    """RL'[c', f'] = sum RL[c, f] phi[f, d, f'] A[c, d, c']
    (reference `_mps_RL`, `tnac4o/mps.py:655-658`)."""
    T = jnp.einsum("cf,fdg->cdg", RL, p)
    return jnp.einsum("cdg,cdk->kg", T, a)


def _mix_right(RR, p, a):
    """RR'[f', c'] = sum phi[f', d, f] RR[f, c] A[c', d, c]
    (reference `_mps_RR`, `tnac4o/mps.py:660-663`)."""
    T = jnp.einsum("fdg,gc->fdc", p, RR)
    return jnp.einsum("fdc,kdc->fk", T, a)


def _project(RL, p, RR):
    """B[c, d, c'] = RL[c, f] phi[f, d, f'] RR[f', c']
    (reference `_mps_RAR`, `tnac4o/mps.py:748-751`)."""
    T = jnp.einsum("cf,fdg->cdg", RL, p)
    return jnp.einsum("cdg,gk->cdk", T, RR)


def variational_compress(mps: MPS, phi: jax.Array, *, tol: float,
                         max_sweeps: int):
    """Alternating one-site compression of ``mps`` against target ``phi``.

    ``mps.A`` must enter (approximately) left-canonical, as produced by
    :func:`canonize_left`. Convergence is measured by the largest change of
    Schmidt vectors along the left sweep (reference `variational_compress`,
    `tnac4o/mps.py:238-279`).

    Returns (MPS, overlap) where overlap = <phi|mps> including no lognorm
    factors (diagnostic, as in the reference).
    """
    A0 = mps.A
    L, D, d, _ = A0.shape
    F = phi.shape[1]
    dtype = A0.dtype

    rl0 = jnp.zeros((D, F), dtype=dtype).at[0, 0].set(1.0)
    rr_triv = jnp.zeros((F, D), dtype=dtype).at[0, 0].set(1.0)

    def _rescale(F, ln):
        # keep env chains in range: the target can be unnormalized and f32
        # on TPU flushes subnormals to zero (see variational_implicit)
        nf = nfactor(F)
        return F / nf, ln + jnp.log2(nf)

    def setup(carry, xs):
        rl, ln = carry
        p, a = xs
        rl, ln = _rescale(_mix_left(rl, p, a), ln)
        return (rl, ln), rl

    (rl_last, ln0), RLs_tail = lax.scan(setup, (rl0, jnp.zeros((), dtype)),
                                        (phi, A0))
    RLs = jnp.concatenate([rl0[None], RLs_tail], axis=0)  # (L+1, D, F)
    overlap0 = RLs[L][0, 0] * jnp.exp2(ln0)

    S0 = jnp.zeros((L + 1, D), dtype=dtype).at[:, 0].set(1.0)

    def right_sweep(A, S, RLs):
        """Optimize sites L-1..1; returns new A, S, stacked right envs."""
        def step(carry, xs):
            RR, S = carry
            n, p, rl = xs
            B = _project(rl, p, RR)
            Q, R = qr_fixed(B.reshape(D, d * D).T)
            An = Q.T.reshape(D, d, D)
            C = R.T
            sv = jnp.linalg.svd(C, compute_uv=False)
            sv = sv / jnp.maximum(sv[0], jnp.finfo(dtype).tiny)
            S = S.at[n].set(sv)
            RRn, _ = _rescale(_mix_right(RR, p, An), jnp.zeros((), dtype))
            return (RRn, S), (An, RRn)

        ns = jnp.arange(1, L)
        (RR_last, S), (A_tail, RR_tail) = lax.scan(
            step, (rr_triv, S), (ns, phi[1:], RLs[1:L]), reverse=True)
        Anew = jnp.concatenate([A[:1], A_tail], axis=0)
        # RRs[n] = env of sites n..L-1; RR_tail[k] is env from site k+1
        RRs = jnp.concatenate([RR_tail, rr_triv[None]], axis=0)  # (L, F, D): RRs[k] = env right of site k
        return Anew, S, RRs

    def left_sweep(A, S, RRs):
        """Optimize sites 0..L-1; returns A, S, RLs, diff, overlap, lnstate."""
        def step(carry, xs):
            RL, ln, S, diff, lnstate = carry
            n, p, rr = xs
            B = _project(RL, p, rr)
            Q, R = qr_fixed(B.reshape(D * d, D))
            An = Q.reshape(D, d, D)
            sv = jnp.linalg.svd(R, compute_uv=False)
            sv = sv / jnp.maximum(sv[0], jnp.finfo(dtype).tiny)
            dS = jnp.sqrt(jnp.sum((S[n + 1] - sv) ** 2))
            S = S.at[n + 1].set(sv)
            diff = jnp.maximum(diff, dS)
            lnstate = ln + jnp.log2(
                jnp.maximum(jnp.abs(R[0, 0]), jnp.finfo(dtype).tiny))
            RLn, ln = _rescale(_mix_left(RL, p, An), ln)
            return (RLn, ln, S, diff, lnstate), (An, RLn)

        ns = jnp.arange(L)
        (rl_last, ln, S, diff, lnstate), (Anew, RL_tail) = lax.scan(
            step, (rl0, jnp.zeros((), dtype), S, jnp.zeros((), dtype),
                   jnp.zeros((), dtype)), (ns, phi, RRs))
        RLs = jnp.concatenate([rl0[None], RL_tail], axis=0)
        overlap = rl_last[0, 0] * jnp.exp2(ln)
        return Anew, S, RLs, diff, overlap, lnstate

    # In f32 the Schmidt-vector change plateaus at the dtype's noise floor
    # well above any f64-style tolV, so the tol test alone would always run
    # max_sweeps; also require >=10% improvement per sweep there.
    plateau = float(jnp.finfo(dtype).eps) > 1e-10

    def cond(st):
        going = (st[3] > tol) & (st[5] < max_sweeps)
        if plateau:
            # st[7] holds the previous sweep's diff only from the second
            # sweep on (the first body consumes the init sentinel), so the
            # plateau test must not fire before two measured diffs exist
            going = going & ((st[5] < 2) | (st[3] < st[7] * 0.9))
        return going

    def body(st):
        A, S, RLs, prev, _, sweeps, _, _ = st
        A, S, RRs = right_sweep(A, S, RLs)
        A, S, RLs, diff, overlap, lnstate = left_sweep(A, S, RRs)
        return (A, S, RLs, diff, overlap, sweeps + 1, lnstate, prev)

    st = (A0, S0, RLs, jnp.ones((), dtype), overlap0,
          jnp.zeros((), jnp.int32), jnp.zeros((), dtype),
          jnp.asarray(jnp.inf, dtype))
    A, S, RLs, diff, overlap, sweeps, lnstate, _ = \
        lax.while_loop(cond, body, st)
    return MPS(A=A, lognorm=mps.lognorm + lnstate), overlap


# ---------------------------------------------------------------------------
# graduate-truncation compression driver
# ---------------------------------------------------------------------------

def compress(mps: MPS, Dmax: int, *, tolS: float, tolV: float,
             max_sweeps: int, graduate: bool = True):
    """Compress an MPS to bond dimension Dmax.

    Reproduces the reference `compress_mps` schedule
    (`tnac4o/mps.py:175-200`): right-canonize, snapshot the target, then —
    with graduate truncation — SVD to 4*Dmax (tolS/10), one variational
    sweep, SVD to 2*Dmax (tolS/2), and finally SVD to Dmax (tolS) followed by
    up to ``max_sweeps`` variational sweeps. Static shapes shrink at each
    stage via exact zero-channel slicing.

    Returns (MPS(bond=Dmax), overlap, max_discarded).
    """
    Dfat = mps.A.shape[1]
    mps, _ = canonize_right(mps)
    phi = mps.A  # compression target (right-canonical fat MPS)
    phi_lognorm = mps.lognorm
    disc_total = jnp.zeros((), mps.A.dtype)

    if graduate:
        cap1 = min(4 * Dmax, Dfat)
        mps, disc = canonize_left(mps, compress=True, cap=cap1, tol=tolS / 10)
        disc_total = jnp.maximum(disc_total, disc)
        mps = slice_bond(mps, cap1)
        mps, _ = variational_compress(mps, phi, tol=tolV, max_sweeps=1)
        cap2 = min(2 * Dmax, cap1)
        mps, disc = canonize_right(mps, compress=True, cap=cap2, tol=tolS / 2)
        disc_total = jnp.maximum(disc_total, disc)
        mps = slice_bond(mps, cap2)

    cap = min(Dmax, mps.A.shape[1])
    mps, disc = canonize_left(mps, compress=True, cap=cap, tol=tolS)
    disc_total = jnp.maximum(disc_total, disc)
    mps = slice_bond(mps, cap)
    mps = mps._replace(lognorm=phi_lognorm)  # variational rebuilds the norm
    mps, overlap = variational_compress(mps, phi, tol=tolV,
                                        max_sweeps=max_sweeps)
    mps = pad_bond(mps, Dmax)
    return mps, overlap, disc_total


# ---------------------------------------------------------------------------
# zip-up MPO application: compress A∘W without materializing the fat MPS
# ---------------------------------------------------------------------------
#
# The reference compresses H|psi> by materializing the fat MPS (bond D*l)
# and QR-canonizing it (`apply_mpo` + `compress_mps`,
# `tnac4o/mps.py:175-200,353-359`) — O(L * (D*l)^3 * d) in QR alone. The
# zip-up sweep absorbs one MPO tensor at a time, truncating on the fly, and
# the variational polish uses implicit three-leg environments against the
# UNAPPLIED pair (A, W): per-site cost drops to O(D^2 * l * d * (D + l*d)),
# all MXU-friendly einsums, with no fat canonization at all. Both paths
# converge to the same variational optimum; golden tests gate the switch.

def _orient_mpo(W, conj):
    """Return W with legs (l, contract_phys, r, out_phys).

    conj=True contracts the MPS leg with W's down leg leaving up (top
    boundary); conj=False the mirror (bottom boundary). W stacked
    (L, l, d, r, u)."""
    return W if conj else jnp.transpose(W, (0, 1, 4, 3, 2))


def _rsvd(Gm: jax.Array, k: int, key, iters: int = 2, bf16: bool = False):
    """Randomized top-``k`` SVD (Halko-Martinsson-Tropp with power
    iterations): returns (U (m, k), S (k,), Vh (k, n)).

    Deterministic for a fixed ``key``. The boundary-MPS transfer spectra
    decay exponentially, so a small oversampled sketch captures the kept
    subspace to working precision; the exact Frobenius mass of everything
    outside the sketch is still accounted by the caller via
    ||G||_F^2 - sum(S^2). All operations are matmuls + thin QR — MXU
    work instead of a full iterative SVD of the (m, n) core, which
    dominated the boundary-build wall-clock on TPU.

    ``bf16`` runs the range-finder GEMMs with bfloat16 inputs and float32
    accumulation (native MXU issue rate); the projection ``B = Q^T Gm``
    and the small SVD stay in full working precision, so only the kept
    SUBSPACE is sketched more loosely — never the kept values. A quality
    lever to be oracle-gated per workload (see tools/boundary_ab.py).
    """
    n = Gm.shape[1]
    Om = jax.random.normal(key, (n, k), Gm.dtype)

    def mm(a, b):
        if not bf16:
            return a @ b
        return jnp.matmul(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                          preferred_element_type=Gm.dtype)

    Q, _ = jnp.linalg.qr(mm(Gm, Om))
    for _ in range(iters):
        Z, _ = jnp.linalg.qr(mm(Gm.T, Q))
        Q, _ = jnp.linalg.qr(mm(Gm, Z))
    B = Q.T @ Gm
    Ub, S, Vh = svd_fixed(B)
    return Q @ Ub, S, Vh


def zipup_apply(mps: MPS, W: jax.Array, Dmax: int, *, conj: bool,
                tol: float, rsvd=None):
    """Left-to-right zip-up of W onto mps, truncated to bond Dmax.

    ``mps`` should enter right-canonical. Returns (MPS(bond=Dmax),
    max_discarded); the result is left-canonical.

    The per-site truncation uses a randomized sketch (:func:`_rsvd`,
    seeded deterministically per site) whenever the exact SVD core would
    be much larger than the kept rank. ``rsvd`` pins the choice
    explicitly (True/False, "bf16" for the sketch with a bfloat16
    range-finder, or "wide" for a 2*Dmax+32 oversampled sketch — a
    fidelity mid-point between the default sketch and the exact SVD,
    ~1.5x the range-finder GEMM cost — see :func:`_rsvd`); ``None``
    reads the ambient default ``TNAX_ZIPUP_RSVD`` at trace time —
    callers that need bit-stable output across processes should pass an
    explicit value.
    """
    import os as _os
    Wc = _orient_mpo(W, conj)
    L, D, d, _ = mps.A.shape
    lh, du = Wc.shape[1], Wc.shape[4]
    dtype = mps.A.dtype
    eps = float(jnp.finfo(dtype).eps)
    tol = max(eps, tol)
    rows, cols = Dmax * du, D * lh
    if rsvd is None:
        rsvd = _os.environ.get("TNAX_ZIPUP_RSVD", "1") != "0"
    oversample = 2 * Dmax + 32 if rsvd == "wide" else Dmax + 32
    k_sketch = min(min(rows, cols), oversample)
    sketch_bf16 = rsvd == "bf16"
    use_rsvd = bool(rsvd) and min(rows, cols) >= 2 * k_sketch
    keys = jax.random.split(jax.random.PRNGKey(0), L)

    T0 = jnp.zeros((Dmax, D, lh), dtype=dtype).at[0, 0, 0].set(1.0)

    def step(carry, xs):
        T, lognorm, disc = carry
        A, Wn, key = xs
        t1 = jnp.einsum("mal,adb->mldb", T, A)
        G = jnp.einsum("mldb,ldru->mubr", t1, Wn)
        Gm = G.reshape(Dmax * du, D * lh)
        if use_rsvd:
            U, S, Vh = _rsvd(Gm, k_sketch, key, bf16=sketch_bf16)
            S = jnp.maximum(S, 0.0)
            # exact total discarded mass: everything outside the kept
            # columns, including what the sketch never captured
            frob2 = jnp.sum(Gm * Gm)
        else:
            U, S, Vh = svd_fixed(Gm)
            frob2 = jnp.sum(S * S)
        K = S.shape[0]
        keep = (S > S[0] * tol) & (jnp.arange(K) < Dmax)
        s0 = jnp.where(S[0] > 0, S[0], 1.0)
        kept2 = jnp.sum(jnp.where(keep, S * S, 0.0))
        disc = jnp.maximum(
            disc, jnp.sqrt(jnp.maximum(frob2 - kept2, 0.0)) / s0)
        S = jnp.where(keep, S, 0.0)
        U = (U * keep[None, :].astype(dtype))[:, :Dmax]
        SV = (S[:, None] * Vh)[:Dmax]
        if K < Dmax:
            # thin rows (e.g. rotated lattices with a 1-dim horizontal
            # leg): the SVD rank D*lh can be below the target bond —
            # pad with exact zero channels, the framework's standard
            # ragged-to-static convention
            U = jnp.pad(U, ((0, 0), (0, Dmax - K)))
            SV = jnp.pad(SV, ((0, Dmax - K), (0, 0)))
        Anew = U.reshape(Dmax, du, Dmax)
        Tn = SV.reshape(Dmax, D, lh)
        nf = nfactor(Tn)
        Tn = Tn / nf
        lognorm = lognorm + jnp.log2(nf)
        return (Tn, lognorm, disc), Anew

    init = (T0, mps.lognorm, jnp.zeros((), dtype))
    (T, lognorm, disc), Anew = lax.scan(step, init, (mps.A, Wc, keys))
    c = T[0, 0, 0]
    mag = jnp.abs(c)
    lognorm = lognorm + jnp.where(mag > 0,
                                  jnp.log2(jnp.where(mag > 0, mag, 1.0)), 0.0)
    sign = jnp.where(c < 0, -1.0, 1.0).astype(dtype)
    Anew = Anew.at[L - 1].multiply(sign)
    return MPS(A=Anew, lognorm=lognorm), disc


def variational_implicit(mps: MPS, phi_A: jax.Array, W: jax.Array, *,
                         conj: bool, tol: float, max_sweeps: int):
    """Variational compression against the implicit target phi∘W.

    Same alternating one-site sweeps as :func:`variational_compress`
    (reference `tnac4o/mps.py:238-279`) but with three-leg mixed
    environments (new bond, old bond, MPO bond) so the fat MPS never exists.
    ``mps.A`` enters left-canonical (zip-up output). Returns (MPS, overlap).
    """
    Wc = _orient_mpo(W, conj)
    A0 = mps.A
    L, Dn, du, _ = A0.shape
    Do, lh = phi_A.shape[1], Wc.shape[1]
    dtype = A0.dtype

    fl0 = jnp.zeros((Dn, Do, lh), dtype=dtype).at[0, 0, 0].set(1.0)
    fr0 = jnp.zeros((Do, lh, Dn), dtype=dtype).at[0, 0, 0].set(1.0)

    def half_project(F, p, Wn):
        t1 = jnp.einsum("mal,adb->mldb", F, p)
        return jnp.einsum("mldb,ldru->mbur", t1, Wn)   # (m, b, u, r)

    def upd_left(F, p, Wn, a):
        t2 = half_project(F, p, Wn)
        return jnp.einsum("mbur,muk->kbr", t2, a)

    def upd_right(G, p, Wn, a):
        t1 = jnp.einsum("adb,brk->adrk", p, G)
        t2 = jnp.einsum("adrk,ldru->aluk", t1, Wn)
        return jnp.einsum("aluk,muk->alm", t2, a)

    def project(F, p, Wn, G):
        t2 = half_project(F, p, Wn)
        return jnp.einsum("mbur,brk->muk", t2, G)      # (m, u, k)

    def _rescale(F, ln):
        # per-site power-of-2 rescaling of the environment chain. The
        # target phi∘W is unnormalized (norm can be 2^+-100); without this
        # the env products cross the f32 subnormal range, which TPUs flush
        # to zero, collapsing the ALS projections. log2 factors accumulate
        # in `ln` so the overlap diagnostic keeps its absolute value.
        nf = nfactor(F)
        return F / nf, ln + jnp.log2(nf)

    def setup(carry, xs):
        F, ln = carry
        p, Wn, a = xs
        F, ln = _rescale(upd_left(F, p, Wn, a), ln)
        return (F, ln), F

    (F_last, ln0), FL_tail = lax.scan(setup, (fl0, jnp.zeros((), dtype)),
                                      (phi_A, Wc, A0))
    FLs = jnp.concatenate([fl0[None], FL_tail], axis=0)
    overlap0 = FLs[L][0, 0, 0] * jnp.exp2(ln0)
    S0 = jnp.zeros((L + 1, Dn), dtype=dtype).at[:, 0].set(1.0)

    def right_sweep(A, S, FLs):
        def step(carry, xs):
            FR, S = carry
            n, p, Wn, fl = xs
            B = project(fl, p, Wn, FR)
            Q, R = qr_fixed(B.reshape(Dn, du * Dn).T)
            An = Q.T.reshape(Dn, du, Dn)
            sv = jnp.linalg.svd(R.T, compute_uv=False)
            sv = sv / jnp.maximum(sv[0], jnp.finfo(dtype).tiny)
            S = S.at[n].set(sv)
            FRn, _ = _rescale(upd_right(FR, p, Wn, An),
                              jnp.zeros((), dtype))
            return (FRn, S), (An, FRn)

        ns = jnp.arange(1, L)
        (_, S), (A_tail, FR_tail) = lax.scan(
            step, (fr0, S), (ns, phi_A[1:], Wc[1:], FLs[1:L]), reverse=True)
        Anew = jnp.concatenate([A[:1], A_tail], axis=0)
        FRs = jnp.concatenate([FR_tail, fr0[None]], axis=0)
        return Anew, S, FRs

    def left_sweep(A, S, FRs):
        def step(carry, xs):
            FL, ln, S, diff, lnstate = carry
            n, p, Wn, fr = xs
            B = project(FL, p, Wn, fr)
            Q, R = qr_fixed(B.reshape(Dn * du, Dn))
            An = Q.reshape(Dn, du, Dn)
            sv = jnp.linalg.svd(R, compute_uv=False)
            sv = sv / jnp.maximum(sv[0], jnp.finfo(dtype).tiny)
            dS = jnp.sqrt(jnp.sum((S[n + 1] - sv) ** 2))
            S = S.at[n + 1].set(sv)
            diff = jnp.maximum(diff, dS)
            # At the LAST site the right env is trivial (scale-free), so
            # |R[0,0]| * 2^ln is the norm of the projected state (all
            # other sites end up orthonormal). ln is the left-chain scale
            # at projection time.
            lnstate = ln + jnp.log2(
                jnp.maximum(jnp.abs(R[0, 0]), jnp.finfo(dtype).tiny))
            FLn, ln = _rescale(upd_left(FL, p, Wn, An), ln)
            return (FLn, ln, S, diff, lnstate), (An, FLn)

        ns = jnp.arange(L)
        (fl_last, ln, S, diff, lnstate), (Anew, FL_tail) = lax.scan(
            step, (fl0, jnp.zeros((), dtype), S, jnp.zeros((), dtype),
                   jnp.zeros((), dtype)), (ns, phi_A, Wc, FRs))
        FLs = jnp.concatenate([fl0[None], FL_tail], axis=0)
        return Anew, S, FLs, diff, fl_last[0, 0, 0] * jnp.exp2(ln), lnstate

    # f32 plateau stop — see variational_compress
    plateau = float(jnp.finfo(dtype).eps) > 1e-10

    def cond(st):
        going = (st[3] > tol) & (st[5] < max_sweeps)
        if plateau:
            # st[7] holds the previous sweep's diff only from the second
            # sweep on (the first body consumes the init sentinel), so the
            # plateau test must not fire before two measured diffs exist
            going = going & ((st[5] < 2) | (st[3] < st[7] * 0.9))
        return going

    def body(st):
        A, S, FLs, prev, _, sweeps, _, _ = st
        A, S, FRs = right_sweep(A, S, FLs)
        A, S, FLs, diff, overlap, ln_state = left_sweep(A, S, FRs)
        return (A, S, FLs, diff, overlap, sweeps + 1, ln_state, prev)

    st = (A0, S0, FLs, jnp.ones((), dtype), overlap0,
          jnp.zeros((), jnp.int32), jnp.zeros((), dtype),
          jnp.asarray(jnp.inf, dtype))
    A, S, FLs, diff, overlap, sweeps, ln_state, _ = lax.while_loop(
        cond, body, st)
    return MPS(A=A, lognorm=mps.lognorm + ln_state), overlap


def compress_apply(mps: MPS, W: jax.Array, Dmax: int, *, conj: bool,
                   tolS: float, tolV: float, max_sweeps: int, rsvd=None):
    """Apply one MPO row to an MPS and compress to Dmax, fat-MPS-free.

    Right-canonize (cheap, small bonds), zip-up truncate to Dmax, then
    variational sweeps against the implicit target until the Schmidt-vector
    change drops below a dtype-aware tolerance. Functional replacement for
    the reference's `apply_mpo` + `compress_mps` pair in the boundary-MPS
    build (`tnac4o/tnac4o.py:1688-1693`). ``rsvd`` pins the zip-up's
    randomized-sketch choice (None = ambient TNAX_ZIPUP_RSVD default).
    """
    eps = float(jnp.finfo(mps.A.dtype).eps)
    tolS = max(tolS, eps)
    tolV = max(tolV, 32 * eps)
    mps, _ = canonize_right(mps)
    # zip-up at a 2x enlarged bond, then one optimal truncation sweep down
    # to Dmax — the cheap analogue of the reference's graduate truncation
    # (`tnac4o/mps.py:194-198`); the variational sweeps polish from there.
    Dz = 2 * Dmax
    out, disc = zipup_apply(mps, W, Dz, conj=conj, tol=tolS / 10, rsvd=rsvd)
    out, disc2 = canonize_right(out, compress=True, cap=Dmax, tol=tolS)
    disc = jnp.maximum(disc, disc2)
    out = slice_bond(out, Dmax)
    # the variational polish replaces every tensor with projections of the
    # implicit target (mps.A, W) and reconstructs the state norm from
    # scratch, so it starts from the target's lognorm, not the zip-up's
    out = out._replace(lognorm=mps.lognorm)
    out, overlap = variational_implicit(out, mps.A, W, conj=conj, tol=tolV,
                                        max_sweeps=max_sweeps)
    return out, overlap, disc


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------

def measure_O1(A: jax.Array, O: jax.Array) -> jax.Array:
    """<psi|O_n|psi> for a 1-site operator at every site, normalized
    (reference `measure_O1`, `tnac4o/mps.py:301-314`).

    A: stacked MPS (L, D, d, D); O: (d, d) or (L, d, d)."""
    L, D, d, _ = A.shape
    if O.ndim == 2:
        O = jnp.broadcast_to(O, (L, d, d))
    rl0 = jnp.zeros((D, D), dtype=A.dtype).at[0, 0].set(1.0)

    def right(rr, a):
        return jnp.einsum("adb,bc,edc->ae", a, rr, a), rr

    rr_last, RRs = lax.scan(right, rl0, A, reverse=True)
    norm = rr_last[0, 0]

    def left(rl, xs):
        a, On, rr = xs
        val = jnp.einsum("xa,adb,ed,xec,bc->", rl, a, On, a, rr)
        rl = jnp.einsum("xa,adb,xdc->cb", rl, a, a)
        return rl, val

    # RRs[n] is the env right of site n (emitted before absorbing site n)
    _, vals = lax.scan(left, rl0, (A, O, RRs))
    return vals / norm


def measure_O2(A: jax.Array, O: jax.Array) -> jax.Array:
    """<psi|O_{n,n+1}|psi> for a two-site operator at every bond,
    normalized (reference `measure_O2`, `tnac4o/mps.py:316-329`).

    A: stacked MPS (L, D, d, D); O: (d, d, d, d) or (L-1, d, d, d, d) with
    legs (out1, out2, in1, in2)."""
    import numpy as np_
    A = np_.asarray(A)
    L, D, d, _ = A.shape
    O = np_.asarray(O)
    if O.ndim == 4:
        O = np_.broadcast_to(O, (L - 1,) + O.shape)
    RRs = [None] * (L + 1)
    RRs[L] = np_.zeros((D, D))
    RRs[L][0, 0] = 1.0
    for n in range(L - 1, -1, -1):
        RRs[n] = np_.einsum("adb,bc,edc->ae", A[n], RRs[n + 1], A[n])
    norm = RRs[0][0, 0]
    rl = np_.zeros((D, D))
    rl[0, 0] = 1.0
    out = np_.zeros(L - 1)
    for n in range(L - 1):
        AA = np_.einsum("adb,bec->adec", A[n], A[n + 1])  # (a, d1, d2, c)
        T = np_.einsum("xa,adec->xdec", rl, AA)
        # bra phys = O out legs (p, q), ket phys = O in legs (d, e)
        out[n] = np_.einsum("xdec,pqde,xpqg,cg->", T, O[n], AA,
                            RRs[n + 2]) / norm
        rl = np_.einsum("xa,adb,xdc->cb", rl, A[n], A[n])
    return out


def describe(mps: MPS) -> str:
    """Human-readable MPS summary (reference `show_properties`,
    `tnac4o/mps.py:125-135`)."""
    import numpy as np_
    L, Dl, d, Dr = mps.A.shape
    ranks = []
    A = mps.A
    for n in range(L):
        sv = np_.linalg.svd(np_.asarray(A[n]).reshape(-1, Dr),
                            compute_uv=False)
        tol = sv[0] * 1e-12 if sv.size and sv[0] > 0 else 0
        ranks.append(int((sv > tol).sum()))
    return (f"L={L} pad(D={Dl}, d={d}) bond ranks={ranks} "
            f"lognorm={float(mps.lognorm):.3f}")


def measure_correlations(A: jax.Array, O: jax.Array) -> jax.Array:
    """All two-point correlators <psi|O_n O_m|psi>, normalized
    (reference `measure_correlations`, `tnac4o/mps.py:331-351`).
    Host-side convenience (O(L^2) small contractions)."""
    import numpy as np_
    A = np_.asarray(A)
    L, D, d, _ = A.shape
    O = np_.asarray(O)
    if O.ndim == 2:
        O = np_.broadcast_to(O, (L, d, d))
    RRs = [None] * (L + 1)
    RRs[L] = np_.zeros((D, D))
    RRs[L][0, 0] = 1.0
    for n in range(L - 1, -1, -1):
        RRs[n] = np_.einsum("adb,bc,edc->ae", A[n], RRs[n + 1], A[n])
    norm = RRs[0][0, 0]
    rl = np_.zeros((D, D))
    rl[0, 0] = 1.0
    out = np_.zeros((L, L))
    RLO = [None] * L
    for n in range(L):
        out[n, n] = np_.einsum("xa,adb,ed,xec,bc->", rl, A[n], O[n], A[n],
                               RRs[n + 1]) / norm
        for m in range(n):
            out[m, n] = np_.einsum("xa,adb,ed,xec,bc->", RLO[m], A[n], O[n],
                                   A[n], RRs[n + 1]) / norm
            out[n, m] = out[m, n]
            RLO[m] = np_.einsum("xa,adb,xdc->cb", RLO[m], A[n], A[n])
        RLO[n] = np_.einsum("xa,adb,ed,xec->cb", rl, A[n], O[n], A[n])
        rl = np_.einsum("xa,adb,xdc->cb", rl, A[n], A[n])
    return out


def mps_dot(phi_A: jax.Array, psi_A: jax.Array) -> jax.Array:
    """<phi|psi> of two stacked MPS (no lognorm factors).

    Reference `dot` (`tnac4o/mps.py:88-93`).
    """
    Dp = phi_A.shape[1]
    Ds = psi_A.shape[1]
    rl = jnp.zeros((Ds, Dp), dtype=psi_A.dtype).at[0, 0].set(1.0)

    def step(rl, xs):
        p, a = xs
        return _mix_left(rl, p, a), None

    rl, _ = lax.scan(step, rl, (phi_A, psi_A))
    return rl[0, 0]
