"""Balancing preconditioner for the PEPS gauges.

Reproduces the reference's 'balancing' heuristic (reference `precondition`,
`tnac4o/tnac4o.py:342-379`, and `_update_conditioning(direction='ud')`,
`:1824-1918`): at a ladder of smaller betas, build cheap (D=8) boundary MPS
from both the top and the bottom, and for every row interface equilibrate
the mixed bond environments with LAPACK-style matrix balancing, absorbing
the diagonal scales into the PEPS gauges Xd/Xu. The gauges then condition
the Boltzmann tensors at the target beta (`tnax.engine.peps_rows`).

Two implementations share the same semantics:

- :func:`balance_ud` — the reference-shaped host path: boundary stacks on
  device, interface sweeps in NumPy with `scipy.linalg.matrix_balance`.
- :func:`balance_ud_device` — everything on device: all row interfaces are
  balanced in one jitted, interface-vmapped program (`lax.scan` sweeps +
  a jnp reimplementation of LAPACK ``gebal``'s powers-of-2 equilibration,
  :func:`gebal_scale`), with a single host pull of the resulting scales.
  On accelerators behind a tunneled IO link the host path costs ~3.5 s per
  search in D=8 stack pulls + NumPy sweeps (~50% of the round-1 warm
  L2048 wall-clock); the device path removes that.
"""

from __future__ import annotations

import logging
from functools import partial

import numpy as np
import scipy.linalg
import jax
import jax.numpy as jnp
from jax import lax

from . import bmps, engine
from .search import ContractionContext

logger = logging.getLogger("tnax")


# -- tiny host-side MPS helpers (padded arrays, same conventions as bmps) ---

def _qr_fixed(M):
    Q, R = np.linalg.qr(M, mode="reduced")
    s = np.sign(np.diagonal(R))
    s[s == 0] = 1
    return Q * s[None, :], R * s[:, None]


def _orth_right_absorb(A, n):
    """Right-orthogonalize site n, absorbing the centre into site n-1
    (reference `orth_right` + `attach_AC`, `tnac4o/mps.py:368-380,541-548`)."""
    Dl, d, Dr = A[n].shape
    Q, R = _qr_fixed(A[n].reshape(Dl, d * Dr).T)
    A[n] = Q.T.reshape(Dl, d, Dr)
    C = R.T
    nf = np.max(np.abs(C))
    if nf > 0:
        C = C / nf
    A[n - 1] = np.einsum("adb,bc->adc", A[n - 1], C)


def _orth_left_absorb(A, n):
    """Left-orthogonalize site n, absorbing the centre into site n+1."""
    Dl, d, Dr = A[n].shape
    Q, R = _qr_fixed(A[n].reshape(Dl * d, Dr))
    A[n] = Q.reshape(Dl, d, Dr)
    nf = np.max(np.abs(R))
    if nf > 0:
        R = R / nf
    A[n + 1] = np.einsum("ab,bdc->adc", R, A[n + 1])


def _mix_left(RL, p, a):
    T = np.einsum("cf,fdg->cdg", RL, p)
    return np.einsum("cdg,cdk->kg", T, a)


def _mix_right(RR, p, a):
    T = np.einsum("fdg,gc->fdc", p, RR)
    return np.einsum("fdc,kdc->fk", T, a)


def _bond_env(RL, p, a, RR):
    """Mixed environment of the physical legs at one site -> (d_phi, d_self)
    (reference `_mps_bond_env`, `tnac4o/mps.py:765-769`)."""
    T1 = np.einsum("cf,fdg->cdg", RL, p)    # (self_l, d_phi, phi_r)
    T2 = np.einsum("cdg,gk->cdk", T1, RR)   # (self_l, d_phi, self_r)
    return np.einsum("cdk,cek->de", T2, a)


def _expectation(RL, RR, p, a):
    T1 = np.einsum("cf,fdg->cdg", RL, p)
    T2 = np.einsum("cdg,gk->cdk", T1, RR)
    return np.einsum("cdk,cdk->", T2, a)


def _balance_scale(env, max_scale):
    """Diagonal balancing scale, clipped (reference
    `tnac4o/tnac4o.py:1845-1846`)."""
    _, (scale, _) = scipy.linalg.matrix_balance(env, permute=False,
                                                separate=True)
    return np.minimum(np.maximum(scale, 1.0 / max_scale), max_scale)


def _norm(A):
    return np.linalg.norm(A)


def balance_lr(problem, beta, gauges, Dmax=8, graduate_truncation=False,
               tolS=1e-16, tolV=1e-10, max_sweeps=20, max_scale=1024):
    """One left-right balancing sweep (reference
    `_update_conditioning(direction='lr')`, `tnac4o/tnac4o.py:1920-2006`).

    Unlike 'ud', the reference applies the scale *conditionally*: it is kept
    only when the normalized mixed overlap improves; replicated here.
    Returns the updated gauges dict (Xr[nx-1]*Xl[nx] == 1 kept).
    """
    max_scale = 2.0 ** np.floor(np.log2(np.sqrt(max_scale)))
    ctx = ContractionContext(problem, beta, gauges=gauges)
    rhoL, _, _ = engine.build_rhoL(ctx.Wt, Dmax=Dmax, tolS=tolS, tolV=tolV,
                                   max_sweeps=max_sweeps,
                                   graduate=graduate_truncation)
    rhoR, _, _ = engine.build_rhoR(ctx.Wt, Dmax=Dmax, tolS=tolS, tolV=tolV,
                                   max_sweeps=max_sweeps,
                                   graduate=graduate_truncation)
    rhoL = np.asarray(rhoL, dtype=np.float64)
    rhoR = np.asarray(rhoR, dtype=np.float64)

    X = {k: v.copy() for k, v in gauges.items()}
    Ny, Nx, lh = ctx.Ny, ctx.Nx, ctx.lh
    hdims = problem.lr  # (Ny, Nx) valid horizontal leg dims

    for nx in range(1, Nx):
        # self = rhoL[nx] (columns left), phi = rhoR[nx] (columns right);
        # both have physical legs on the left-legs of column nx. Chain
        # index is the row ny.
        Lc = [rhoL[nx, ny].copy() for ny in range(Ny)]
        Rc = [rhoR[nx, ny].copy() for ny in range(Ny)]
        D = Lc[0].shape[0]
        R = [None] * (Ny + 1)
        R[0] = np.zeros((D, D))
        R[0][0, 0] = 1.0
        for ny in range(Ny):
            R[ny + 1] = _mix_left(R[ny], Rc[ny], Lc[ny])

        def _try_rebalance(ny, RL, RR):
            nd = hdims[ny, nx - 1]
            env = _bond_env(RL, Rc[ny], Lc[ny], RR)[:nd, :nd]
            scale = _balance_scale(env, max_scale)
            full = np.ones(lh)
            full[:nd] = scale
            o1 = _expectation(RL, RR, Rc[ny], Lc[ny]) \
                / max(_norm(Lc[ny]) * _norm(Rc[ny]), 1e-300)
            Lc[ny] *= full[None, :, None]
            Rc[ny] *= (1.0 / full)[None, :, None]
            o2 = _expectation(RL, RR, Rc[ny], Lc[ny]) \
                / max(_norm(Lc[ny]) * _norm(Rc[ny]), 1e-300)
            if o2 > o1:
                X["Xr"][ny, nx - 1, :nd] *= scale
                X["Xl"][ny, nx, :nd] *= 1.0 / scale
            else:  # revert (reference tnac4o/tnac4o.py:1957-1959)
                Lc[ny] *= (1.0 / full)[None, :, None]
                Rc[ny] *= full[None, :, None]

        RRe = np.zeros((D, D))
        RRe[0, 0] = 1.0
        R[Ny] = RRe
        for ny in range(Ny - 1, -1, -1):
            _try_rebalance(ny, R[ny], R[ny + 1])
            if ny > 0:
                _orth_right_absorb(Lc, ny)
                _orth_right_absorb(Rc, ny)
                R[ny] = _mix_right(R[ny + 1], Rc[ny], Lc[ny])

        for ny in range(Ny):
            _try_rebalance(ny, R[ny], R[ny + 1])
            if ny < Ny - 1:
                _orth_left_absorb(Lc, ny)
                _orth_left_absorb(Rc, ny)
                R[ny + 1] = _mix_left(R[ny], Rc[ny], Lc[ny])

    return X


def balance_ud(problem, beta, gauges, Dmax=8, graduate_truncation=False,
               tolS=1e-16, tolV=1e-10, max_sweeps=20, max_scale=1024,
               overlaps_out=None):
    """One up-down balancing sweep at inverse temperature ``beta``.

    Returns the updated gauges dict (Xd[ny-1]*Xu[ny] == 1 invariant kept).
    If ``overlaps_out`` is a list, appends a (2, Ny-1) array of the
    worst-case normalized mixed overlaps before/after rescaling per
    interface (reference `overlaps_ud`, `tnac4o/tnac4o.py:1861-1863,1917`).
    """
    max_scale = 2.0 ** np.floor(np.log2(np.sqrt(max_scale)))
    ctx = ContractionContext(problem, beta, gauges=gauges)
    rhoT = ctx.build_boundary(Dmax, tolS, tolV, max_sweeps,
                              graduate_truncation)
    rhoB, _, _ = engine.build_rhoB(ctx.Wt, Dmax=Dmax, tolS=tolS, tolV=tolV,
                                   max_sweeps=max_sweeps,
                                   graduate=graduate_truncation)
    rhoT = np.asarray(rhoT, dtype=np.float64)
    rhoB = np.asarray(rhoB, dtype=np.float64)

    X = {k: v.copy() for k, v in gauges.items()}
    Ny, Nx, lv = ctx.Ny, ctx.Nx, ctx.lv
    ldims = problem.ld  # (Ny, Nx) valid vertical leg dims
    overlaps = np.ones((2, max(Ny - 1, 0)))

    for ny in range(1, Ny):
        # self = rhoB[ny] (rows above), phi = rhoT[ny] (rows below);
        # both have physical legs on the up-legs of row ny.
        B = [rhoB[ny, nx].copy() for nx in range(Nx)]
        T = [rhoT[ny, nx].copy() for nx in range(Nx)]
        D = B[0].shape[0]
        R = [None] * (Nx + 1)
        R[0] = np.zeros((D, D))
        R[0][0, 0] = 1.0

        for nx in range(Nx):
            R[nx + 1] = _mix_left(R[nx], T[nx], B[nx])
            nrm = np.linalg.norm(R[nx + 1])
            if nrm > 0:
                R[nx + 1] = R[nx + 1] / nrm

        def _rebalance(nx, RL, RR):
            nd = ldims[ny - 1, nx]
            env = _bond_env(RL, T[nx], B[nx], RR)[:nd, :nd]
            scale = _balance_scale(env, max_scale)
            full = np.ones(lv)
            full[:nd] = scale
            o1 = _expectation(RL, RR, T[nx], B[nx]) \
                / max(np.linalg.norm(B[nx]) * np.linalg.norm(T[nx]), 1e-300)
            B[nx] *= full[None, :, None]
            T[nx] *= (1.0 / full)[None, :, None]
            o2 = _expectation(RL, RR, T[nx], B[nx]) \
                / max(np.linalg.norm(B[nx]) * np.linalg.norm(T[nx]), 1e-300)
            if o1 < overlaps[0, ny - 1]:
                overlaps[0, ny - 1] = o1
                overlaps[1, ny - 1] = max(o1, o2)
            X["Xd"][ny - 1, nx, :nd] *= scale
            X["Xu"][ny, nx, :nd] *= 1.0 / scale

        # right-to-left sweep (reference tnac4o/tnac4o.py:1843-1878)
        RRe = np.zeros((D, D))
        RRe[0, 0] = 1.0
        R[Nx] = RRe
        for nx in range(Nx - 1, -1, -1):
            _rebalance(nx, R[nx], R[nx + 1])
            if nx > 0:
                _orth_right_absorb(B, nx)
                _orth_right_absorb(T, nx)
                R[nx] = _mix_right(R[nx + 1], T[nx], B[nx])
                nrm = np.linalg.norm(R[nx])
                if nrm > 0:
                    R[nx] = R[nx] / nrm

        # left-to-right sweep (reference tnac4o/tnac4o.py:1880-1915)
        for nx in range(Nx):
            _rebalance(nx, R[nx], R[nx + 1])
            if nx < Nx - 1:
                _orth_left_absorb(B, nx)
                _orth_left_absorb(T, nx)
                R[nx + 1] = _mix_left(R[nx], T[nx], B[nx])
                nrm = np.linalg.norm(R[nx + 1])
                if nrm > 0:
                    R[nx + 1] = R[nx + 1] / nrm

    if overlaps_out is not None:
        overlaps_out.append(overlaps)
    return X


# ---------------------------------------------------------------------------
# on-device balancing (round-2 perf lever: the host sweeps + their D=8
# boundary-stack pulls were ~50% of the round-1 warm L2048 wall-clock)
# ---------------------------------------------------------------------------

def gebal_scale(A, nd, max_scale):
    """LAPACK ``dgebal``-style diagonal balancing scales, in jnp.

    Reimplements the no-permutation scaling pass of LAPACK ``gebal`` (what
    `scipy.linalg.matrix_balance(permute=False, separate=True)` calls and
    the reference uses, `tnac4o/tnac4o.py:1845`), following the >=3.10
    algorithm: iterative powers-of-2 equilibration of the row/column
    2-norms (diagonal included). Scales are exact powers of two, so the
    arithmetic is exact in any float dtype. Only ``A[:nd, :nd]`` is
    balanced; padded rows/columns keep scale 1.

    Returns scale (n,) clipped to ``[1/max_scale, max_scale]`` (the
    reference's clip, `_balance_scale`).
    """
    n = A.shape[0]
    mask = jnp.arange(n) < nd
    A = jnp.where(mask[:, None] & mask[None, :], A, 0.0)

    def one_pass(state):
        A, scale, _, it = state

        def body_i(i, st):
            A, scale, noconv = st
            c = jnp.linalg.norm(A[:, i])
            r = jnp.linalg.norm(A[i, :])
            ok = (c > 0) & (r > 0) & mask[i]
            s = c + r
            c1 = jnp.where(ok, c, 1.0)
            r1 = jnp.where(ok, r, 1.0)
            # grow f while c < r/2 (LAPACK's first scaling loop)
            c2, r2, f = lax.while_loop(
                lambda cf: cf[0] < cf[1] * 0.5,
                lambda cf: (cf[0] * 2.0, cf[1] * 0.5, cf[2] * 2.0),
                (c1, r1, jnp.asarray(1.0, A.dtype)))
            # shrink f while c/2 >= r (LAPACK's second scaling loop)
            c3, r3, f = lax.while_loop(
                lambda cf: cf[0] * 0.5 >= cf[1],
                lambda cf: (cf[0] * 0.5, cf[1] * 2.0, cf[2] * 0.5),
                (c2, r2, f))
            apply = ok & ((c3 + r3) < 0.95 * s) & (f != 1.0)
            f = jnp.where(apply, f, jnp.asarray(1.0, A.dtype))
            A = A.at[:, i].multiply(f)
            A = A.at[i, :].divide(f)
            scale = scale.at[i].multiply(f)
            return A, scale, noconv | apply

        A, scale, noconv = lax.fori_loop(0, n, body_i,
                                         (A, scale, jnp.asarray(False)))
        return A, scale, noconv, it + 1

    state = (A, jnp.ones((n,), A.dtype), jnp.asarray(True),
             jnp.asarray(0, jnp.int32))
    _, scale, _, _ = lax.while_loop(lambda st: st[2] & (st[3] < 64),
                                    one_pass, state)
    return jnp.clip(scale, 1.0 / max_scale, max_scale)


def _mix_left_j(RL, p, a):
    T = jnp.einsum("cf,fdg->cdg", RL, p)
    return jnp.einsum("cdg,cdk->kg", T, a)


def _mix_right_j(RR, p, a):
    T = jnp.einsum("fdg,gc->fdc", p, RR)
    return jnp.einsum("fdc,kdc->fk", T, a)


def _bond_env_j(RL, p, a, RR):
    T1 = jnp.einsum("cf,fdg->cdg", RL, p)
    T2 = jnp.einsum("cdg,gk->cdk", T1, RR)
    return jnp.einsum("cdk,cek->de", T2, a)


def _expectation_j(RL, RR, p, a):
    T1 = jnp.einsum("cf,fdg->cdg", RL, p)
    T2 = jnp.einsum("cdg,gk->cdk", T1, RR)
    return jnp.einsum("cdk,cdk->", T2, a)


def _nrm(x):
    n = jnp.linalg.norm(x)
    return jnp.where(n > 0, n, 1.0)


def _overlap_j(RL, RR, p, a):
    tiny = jnp.asarray(np.finfo(np.float32).tiny, p.dtype)
    return _expectation_j(RL, RR, p, a) \
        / jnp.maximum(jnp.linalg.norm(a) * jnp.linalg.norm(p), tiny)


def _orth_right_j(A):
    """Right-orthogonalize one site; returns (Q-form, centre) with the
    centre normalized by its max |entry| (host `_orth_right_absorb`)."""
    D, d, Dr = A.shape
    Q, R = bmps.qr_fixed(A.reshape(D, d * Dr).T)
    C = R.T
    m = jnp.max(jnp.abs(C))
    C = C / jnp.where(m > 0, m, 1.0)
    return Q.T.reshape(-1, d, Dr)[:D], C


def _orth_left_j(A):
    D, d, Dr = A.shape
    Q, R = bmps.qr_fixed(A.reshape(D * d, Dr))
    m = jnp.max(jnp.abs(R))
    C = R / jnp.where(m > 0, m, 1.0)
    return Q.reshape(D, d, -1)[:, :, :Dr], C


def _balance_one_interface(B, T, nd, max_scale):
    """Both balancing sweeps of one row interface, fully on device.

    B (Nx, D, lv, D): rhoB row (self);  T: rhoT row (phi);  nd (Nx,) valid
    vertical leg dims. Mirrors the host `balance_ud` inner loop (reference
    `tnac4o/tnac4o.py:1843-1915`): stale/fresh environment choices, QR
    re-orthogonalizations and norm rescalings are replicated step for step.

    Returns (scale2, scale3, o1_2, o2_2, o1_3, o2_3) with scale* (Nx, lv)
    and o* (Nx,) in site order.
    """
    Nx, D, lv, _ = B.shape
    dtype = B.dtype
    eye0 = jnp.zeros((D, D), dtype).at[0, 0].set(1.0)
    eyec = jnp.eye(D, dtype=dtype)

    # pass 1: left environments with the raw tensors
    def lstep(RL, xs):
        Bn, Tn = xs
        new = _mix_left_j(RL, Tn, Bn)
        new = new / _nrm(new)
        return new, new

    _, Lt = lax.scan(lstep, eye0, (B, T))
    Lenvs = jnp.concatenate([eye0[None], Lt[:-1]], axis=0)   # Lenvs[nx]=R[nx]

    # sweep 2: right-to-left — stale left envs, fresh right envs
    def rstep(carry, xs):
        RR, Cb, Ct = carry
        Bn, Tn, RL, nd_x, nx = xs
        Bn = jnp.einsum("adb,bc->adc", Bn, Cb)
        Tn = jnp.einsum("adb,bc->adc", Tn, Ct)
        env = _bond_env_j(RL, Tn, Bn, RR)
        scale = gebal_scale(env, nd_x, max_scale)
        o1 = _overlap_j(RL, RR, Tn, Bn)
        Bn = Bn * scale[None, :, None]
        Tn = Tn / scale[None, :, None]
        o2 = _overlap_j(RL, RR, Tn, Bn)
        Bq, Cb2 = _orth_right_j(Bn)
        Tq, Ct2 = _orth_right_j(Tn)
        RRn = _mix_right_j(RR, Tq, Bq)
        RRn = RRn / _nrm(RRn)
        first = nx == 0
        B_out = jnp.where(first, Bn, Bq)       # host skips QR at nx=0
        T_out = jnp.where(first, Tn, Tq)
        Cb2 = jnp.where(first, eyec, Cb2)
        Ct2 = jnp.where(first, eyec, Ct2)
        return (RRn, Cb2, Ct2), (scale, o1, o2, B_out, T_out, RRn)

    xs2 = (B, T, Lenvs, nd, jnp.arange(Nx, dtype=jnp.int32))
    _, (scale2, o1_2, o2_2, B2, T2, RRt) = lax.scan(
        rstep, (eye0, eyec, eyec), xs2, reverse=True)
    # stale right envs for sweep 3: R[k] for k=1..Nx-1 from sweep 2,
    # R[Nx] = identity boundary
    Rstale = jnp.concatenate([RRt[1:], eye0[None]], axis=0)  # Rstale[nx]=R[nx+1]

    # sweep 3: left-to-right — fresh left envs, stale right envs
    def lstep3(carry, xs):
        RL, Cb, Ct = carry
        Bn, Tn, RR, nd_x, nx = xs
        Bn = jnp.einsum("ab,bdc->adc", Cb, Bn)
        Tn = jnp.einsum("ab,bdc->adc", Ct, Tn)
        env = _bond_env_j(RL, Tn, Bn, RR)
        scale = gebal_scale(env, nd_x, max_scale)
        o1 = _overlap_j(RL, RR, Tn, Bn)
        Bn = Bn * scale[None, :, None]
        Tn = Tn / scale[None, :, None]
        o2 = _overlap_j(RL, RR, Tn, Bn)
        Bq, Cb2 = _orth_left_j(Bn)
        Tq, Ct2 = _orth_left_j(Tn)
        RLn = _mix_left_j(RL, Tq, Bq)
        RLn = RLn / _nrm(RLn)
        return (RLn, Cb2, Ct2), (scale, o1, o2)

    xs3 = (B2, T2, Rstale, nd, jnp.arange(Nx, dtype=jnp.int32))
    _, (scale3, o1_3, o2_3) = lax.scan(lstep3, (eye0, eyec, eyec), xs3)
    return scale2, scale3, o1_2, o2_2, o1_3, o2_3


@jax.jit
def _balance_interfaces(Ball, Tall, ndall, max_scale):
    """All row interfaces vmapped; one packed output array.

    Ball/Tall (Ni, Nx, D, lv, D), ndall (Ni, Nx). Returns one flat array
    [scale2 | scale3 | o1_2 | o2_2 | o1_3 | o2_3] (a single device->host
    pull; each pull costs ~50 ms over a tunneled accelerator link)."""
    outs = jax.vmap(partial(_balance_one_interface,
                            max_scale=max_scale))(Ball, Tall, ndall)
    return jnp.concatenate([o.reshape(-1) for o in outs])


@partial(jax.jit, static_argnames=("Dmax", "tolS", "tolV", "max_sweeps",
                                   "graduate", "lh", "lv"))
def _ladder_program(Es, Esl, Esu, dmap, rmap, X0, betas, ndall, max_scale,
                    *, Dmax, tolS, tolV, max_sweeps, graduate, lh, lv):
    """The ENTIRE balancing beta ladder as one jitted program.

    lax.scan over the ladder rungs; each rung regenerates the gauged
    Boltzmann tensors at its beta, builds both D=8 boundary stacks, runs
    the vmapped interface sweeps (:func:`_balance_one_interface`) and
    folds the scales into the gauges — no host round trip between rungs
    (each dispatch+pull over a tunneled accelerator link costs ~50 ms,
    and the per-rung host NumPy work serialized the ladder).

    Returns (X, overlaps (R, 4, Ny-1, Nx)).
    """
    Ny = X0["Xd"].shape[0]

    def rung(X, beta):
        lB, Wt = engine.peps_rows(Es, Esl, Esu, dmap, rmap, X["Xl"],
                                  X["Xr"], X["Xu"], X["Xd"], beta,
                                  lh=lh, lv=lv)
        # both boundary stacks in one batched row scan (bit-identical to
        # the separate builds; halves the sequential recurrence depth)
        rhoT, rhoB = engine.build_rho_both(Wt, Dmax=Dmax, tolS=tolS,
                                           tolV=tolV, max_sweeps=max_sweeps,
                                           graduate=graduate)
        s2, s3, o1_2, o2_2, o1_3, o2_3 = jax.vmap(
            partial(_balance_one_interface, max_scale=max_scale))(
                rhoB[1:Ny], rhoT[1:Ny], ndall)
        s = s2 * s3                                     # (Ny-1, Nx, lv)
        X = dict(X, Xd=X["Xd"].at[:-1].multiply(s),
                 Xu=X["Xu"].at[1:].divide(s))
        return X, jnp.stack([o1_2, o2_2, o1_3, o2_3])

    X, overs = lax.scan(rung, X0, betas)
    return X, overs


def precondition_ladder_device(problem, betas, gauges, Dmax=8,
                               graduate_truncation=False, tolS=1e-16,
                               tolV=1e-10, max_sweeps=20, max_scale=1024,
                               overlaps_out=None, dtype=None):
    """Run the whole 'ud' balancing beta ladder on device in one dispatch
    (semantics of per-rung :func:`balance_ud_device` calls)."""
    from .config import compute_dtype
    if dtype is None:
        dtype = compute_dtype()
    max_scale = 2.0 ** np.floor(np.log2(np.sqrt(max_scale)))
    g = engine.pad_grid(problem)
    Ny, Nx, lv = g.Ny, g.Nx, g.lv
    X = {k: v.copy() for k, v in gauges.items()}
    if Ny < 2:
        if overlaps_out is not None:
            for _ in betas:
                overlaps_out.append(np.ones((2, max(Ny - 1, 0))))
        return X
    X0 = {k: jnp.asarray(v, dtype) for k, v in X.items()}
    ndall = jnp.asarray(problem.ld[: Ny - 1], jnp.int32)
    Xout, overs = _ladder_program(
        jnp.asarray(g.Es, dtype), jnp.asarray(g.Esl, dtype),
        jnp.asarray(g.Esu, dtype), jnp.asarray(g.dmap),
        jnp.asarray(g.rmap), X0, jnp.asarray(np.asarray(betas), dtype),
        ndall, jnp.asarray(max_scale, dtype), Dmax=Dmax, tolS=tolS,
        tolV=tolV, max_sweeps=max_sweeps, graduate=graduate_truncation,
        lh=g.lh, lv=g.lv)
    out = {k: np.asarray(v, dtype=np.float64) for k, v in Xout.items()}
    overs = np.asarray(overs, dtype=np.float64)   # (R, 4, Ny-1, Nx)
    if overlaps_out is not None:
        for r in range(overs.shape[0]):
            o1_2, o2_2, o1_3, o2_3 = overs[r]
            overlaps = np.ones((2, Ny - 1))
            for ny in range(1, Ny):
                seq = [(o1_2[ny - 1, nx], o2_2[ny - 1, nx])
                       for nx in range(Nx - 1, -1, -1)]
                seq += [(o1_3[ny - 1, nx], o2_3[ny - 1, nx])
                        for nx in range(Nx)]
                for o1, o2 in seq:
                    if o1 < overlaps[0, ny - 1]:
                        overlaps[0, ny - 1] = o1
                        overlaps[1, ny - 1] = max(o1, o2)
            overlaps_out.append(overlaps)
    return out


def precondition_fleet(problems, betas, gauges_list=None, Dmax=8,
                       graduate_truncation=False, tolS=1e-16, tolV=1e-10,
                       max_sweeps=20, max_scale=1024, dtype=None):
    """Balancing beta ladder for a FLEET of same-shape problems in one
    vmapped device program.

    The fleet conformance/throughput mode batches searches through
    `parallel.multi_search_gs`, which left the per-instance sequential
    preconditioner as the dominant cost (measured: ~1.25 s x B of a 250 s
    100-instance sweep). vmapping :func:`_ladder_program` over the
    instance axis runs every ladder in one dispatch. Per-instance results
    are bit-identical to :func:`precondition_ladder_device` (the batched
    `lax.while_loop` masks converged lanes).

    Returns a list of gauge dicts (float64 host arrays).
    """
    from .config import compute_dtype
    if dtype is None:
        dtype = compute_dtype()
    max_scale = 2.0 ** np.floor(np.log2(np.sqrt(max_scale)))
    grids = [engine.pad_grid(p) for p in problems]
    g0 = grids[0]
    for g in grids:
        assert (g.Ny, g.Nx, g.Np, g.lh, g.lv) == \
            (g0.Ny, g0.Nx, g0.Np, g0.lh, g0.lv), \
            "fleet preconditioning needs same-shape problems"
    if gauges_list is None:
        gauges_list = [engine.identity_gauges(g) for g in grids]
    if g0.Ny < 2:
        return [{k: v.copy() for k, v in X.items()} for X in gauges_list]
    Es = jnp.stack([jnp.asarray(g.Es, dtype) for g in grids])
    Esl = jnp.stack([jnp.asarray(g.Esl, dtype) for g in grids])
    Esu = jnp.stack([jnp.asarray(g.Esu, dtype) for g in grids])
    dmap = jnp.stack([jnp.asarray(g.dmap) for g in grids])
    rmap = jnp.stack([jnp.asarray(g.rmap) for g in grids])
    X0 = {k: jnp.stack([jnp.asarray(X[k], dtype) for X in gauges_list])
          for k in gauges_list[0]}
    ndall = jnp.stack([jnp.asarray(p.ld[: g0.Ny - 1], jnp.int32)
                       for p in problems])
    prog = partial(_ladder_program, Dmax=Dmax, tolS=tolS, tolV=tolV,
                   max_sweeps=max_sweeps, graduate=graduate_truncation,
                   lh=g0.lh, lv=g0.lv)
    Xout, _ = jax.vmap(prog, in_axes=(0, 0, 0, 0, 0, 0, None, 0, None))(
        Es, Esl, Esu, dmap, rmap, X0,
        jnp.asarray(np.asarray(betas), dtype), ndall,
        jnp.asarray(max_scale, dtype))
    host = {k: np.asarray(v, dtype=np.float64) for k, v in Xout.items()}
    return [{k: host[k][b] for k in host} for b in range(len(problems))]


def balance_ud_device(problem, beta, gauges, Dmax=8,
                      graduate_truncation=False, tolS=1e-16, tolV=1e-10,
                      max_sweeps=20, max_scale=1024, overlaps_out=None):
    """On-device equivalent of :func:`balance_ud` (same semantics, one
    jitted program over all interfaces + a single host pull)."""
    max_scale = 2.0 ** np.floor(np.log2(np.sqrt(max_scale)))
    ctx = ContractionContext(problem, beta, gauges=gauges)
    X = {k: v.copy() for k, v in gauges.items()}
    Ny, Nx, lv = ctx.Ny, ctx.Nx, ctx.lv
    overlaps = np.ones((2, max(Ny - 1, 0)))
    if Ny < 2:
        if overlaps_out is not None:
            overlaps_out.append(overlaps)
        return X
    rhoT = ctx.build_boundary(Dmax, tolS, tolV, max_sweeps,
                              graduate_truncation)
    rhoB, _, _ = engine.build_rhoB(ctx.Wt, Dmax=Dmax, tolS=tolS, tolV=tolV,
                                   max_sweeps=max_sweeps,
                                   graduate=graduate_truncation)
    Ni = Ny - 1
    ndall = jnp.asarray(problem.ld[: Ni], jnp.int32)     # ld[ny-1, nx]
    flat = np.asarray(_balance_interfaces(
        rhoB[1:Ny], rhoT[1:Ny], ndall,
        jnp.asarray(max_scale, ctx.dtype)), dtype=np.float64)
    k = Ni * Nx * lv
    scale2 = flat[:k].reshape(Ni, Nx, lv)
    scale3 = flat[k:2 * k].reshape(Ni, Nx, lv)
    o = flat[2 * k:].reshape(4, Ni, Nx)
    o1_2, o2_2, o1_3, o2_3 = o

    ld = problem.ld
    for ny in range(1, Ny):
        for nx in range(Nx):
            nd = ld[ny - 1, nx]
            s = scale2[ny - 1, nx, :nd] * scale3[ny - 1, nx, :nd]
            X["Xd"][ny - 1, nx, :nd] *= s
            X["Xu"][ny, nx, :nd] *= 1.0 / s
        # worst-case overlap bookkeeping in the host sweep's visit order
        # (right-to-left then left-to-right; reference tnac4o.py:1861-1863)
        seq = [(o1_2[ny - 1, nx], o2_2[ny - 1, nx])
               for nx in range(Nx - 1, -1, -1)]
        seq += [(o1_3[ny - 1, nx], o2_3[ny - 1, nx]) for nx in range(Nx)]
        for o1, o2 in seq:
            if o1 < overlaps[0, ny - 1]:
                overlaps[0, ny - 1] = o1
                overlaps[1, ny - 1] = max(o1, o2)
    if overlaps_out is not None:
        overlaps_out.append(overlaps)
    return X
