"""Balancing preconditioner for the PEPS gauges.

Reproduces the reference's 'balancing' heuristic (reference `precondition`,
`tnac4o/tnac4o.py:342-379`, and `_update_conditioning(direction='ud')`,
`:1824-1918`): at a ladder of smaller betas, build cheap (D=8) boundary MPS
from both the top and the bottom, and for every row interface equilibrate
the mixed bond environments with LAPACK-style matrix balancing, absorbing
the diagonal scales into the PEPS gauges Xd/Xu. The gauges then condition
the Boltzmann tensors at the target beta (`tnax.engine.peps_rows`).

The boundary-MPS stacks are built on device (`engine.build_rhoT/rhoB`); the
interface sweeps operate on tiny (D=8) tensors and run in host NumPy — this
is setup code executed once per instance, not the hot path. The balancing
itself uses `scipy.linalg.matrix_balance` exactly like the reference.
"""

from __future__ import annotations

import logging

import numpy as np
import scipy.linalg

from . import engine
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
