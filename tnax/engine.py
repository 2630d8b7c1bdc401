"""Device-side contraction engine: PEPS row factory, boundary-MPS stack,
row environments and batched conditional marginals.

TPU-first redesign of the reference PEPS layer (reference
`tnac4o/tnac4o.py:1562-1807`). The reference regenerates one ragged 5-leg
PEPS tensor per site per visit and loops over beam branches in Python; here
every site of the lattice is padded to a static shape once, whole rows are
built in one jitted call, and all M beam branches are evaluated with batched
einsums (vmap semantics fused into single matmuls).

A site's 5-leg PEPS tensor  W[s, l, d, r, u]  (physical block state s; legs
left/down/right/up) is never materialized. It factorizes exactly as

    W[s, l, d, r, u] = B[s, l, u] * delta(d == dmap[s]) * delta(r == rmap[s])

with ``B`` the gauged Boltzmann factor of the block + its left/up couplings
(reference `_peps_tensor`, `tnac4o/tnac4o.py:1562-1672`). All contractions
used by the search need only ``B`` (marginals) and the physically-traced MPO
tensor ``Wt[l, d, r, u] = sum_s W[s, l, d, r, u]`` (boundary MPS; reference
`tnac4o/tnac4o.py:1685-1687`), both computed on device from energy tables.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import bmps
from .problems import Problem


# ---------------------------------------------------------------------------
# padded grid of energy tables (host -> device once per problem/rotation)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PaddedGrid:
    """Statically padded per-site tables for the whole lattice.

    Shifted energies are ``E - min(E)`` per table (the reference's local
    conditioning offsets, `tnac4o/tnac4o.py:1572-1583`); padded entries hold
    ``+inf`` so that ``exp(-beta * E)`` vanishes there.
    """
    Ny: int
    Nx: int
    Np: int   # padded number of block states
    lh: int   # padded horizontal leg dim
    lv: int   # padded vertical leg dim
    Es: np.ndarray       # (Ny, Nx, Np)        shifted, +inf padded
    Esl: np.ndarray      # (Ny, Nx, Np, lh)    shifted, +inf padded
    Esu: np.ndarray      # (Ny, Nx, Np, lv)    shifted, +inf padded
    dmap: np.ndarray     # (Ny, Nx, Np) int32
    rmap: np.ndarray     # (Ny, Nx, Np) int32
    nstates: np.ndarray  # (Ny, Nx) int


def pad_grid(problem: Problem) -> PaddedGrid:
    cached = getattr(problem, "_grid_cache", None)
    if cached is not None:
        return cached
    Ny, Nx = problem.Ny, problem.Nx
    sites = [[problem.site(ny, nx) for nx in range(Nx)] for ny in range(Ny)]
    Np = max(t.n for row in sites for t in row)
    lh = max(max(t.nl, t.nr) for row in sites for t in row)
    lv = max(max(t.nu, t.nd) for row in sites for t in row)
    Es = np.full((Ny, Nx, Np), np.inf)
    Esl = np.full((Ny, Nx, Np, lh), np.inf)
    Esu = np.full((Ny, Nx, Np, lv), np.inf)
    dmap = np.zeros((Ny, Nx, Np), dtype=np.int32)
    rmap = np.zeros((Ny, Nx, Np), dtype=np.int32)
    nstates = np.zeros((Ny, Nx), dtype=int)
    for ny in range(Ny):
        for nx in range(Nx):
            t = sites[ny][nx]
            Es[ny, nx, :t.n] = t.Es - t.Es.min()
            Esl[ny, nx, :t.n, :t.nl] = t.Esl - t.Esl.min()
            Esu[ny, nx, :t.n, :t.nu] = t.Esu - t.Esu.min()
            dmap[ny, nx, :t.n] = t.dmap
            rmap[ny, nx, :t.n] = t.rmap
            nstates[ny, nx] = t.n
    out = PaddedGrid(Ny=Ny, Nx=Nx, Np=Np, lh=lh, lv=lv, Es=Es, Esl=Esl,
                     Esu=Esu, dmap=dmap, rmap=rmap, nstates=nstates)
    # problems are immutable once built (rotation/noise construct new
    # objects, like the per-site table cache) — reuse the padded grid
    problem._grid_cache = out
    return out


def identity_gauges(grid: PaddedGrid, dtype=np.float64):
    """Balancing gauges, all-ones (reference `_reset_X`,
    `tnac4o/tnac4o.py:1811-1822`). Xd[ny]*Xu[ny+1] == 1 is the invariant."""
    Ny, Nx = grid.Ny, grid.Nx
    return dict(
        Xl=np.ones((Ny, Nx, grid.lh), dtype=dtype),
        Xr=np.ones((Ny, Nx, grid.lh), dtype=dtype),
        Xu=np.ones((Ny, Nx, grid.lv), dtype=dtype),
        Xd=np.ones((Ny, Nx, grid.lv), dtype=dtype),
    )


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("lh", "lv"))
def peps_rows(Es, Esl, Esu, dmap, rmap, Xl, Xr, Xu, Xd, beta, *, lh, lv):
    """Gauged Boltzmann factors B and traced MPO tensors Wt for all rows.

    Args (leading dims ``(Ny, Nx)`` or ``(Nx,)`` both supported — any batch
    prefix works):
      Es (..., Np), Esl (..., Np, lh), Esu (..., Np, lv): shifted energies.
      dmap/rmap (..., Np): copy-leg index maps.
      Xl/Xr (..., lh), Xu/Xd (..., lv): balancing gauges.

    Returns:
      lB (..., Np, lh, lv)  log of the gauged Boltzmann factor (l, u legs
                            explicit; d, r gauges folded in via dmap/rmap
                            gathers); -inf on padding,
      Wt (..., lh, lv, lh, lv)  physically traced tensor, legs (l, d, r, u).
    """
    expo = Es[..., None, None] + Esl[..., :, None] + Esu[..., None, :]
    Xd_s = jnp.take_along_axis(Xd, dmap, axis=-1)   # (..., Np)
    Xr_s = jnp.take_along_axis(Xr, rmap, axis=-1)
    # log-domain Boltzmann factor: exact relative weights even when
    # exp(-beta*E) underflows the compute dtype (f32 at beta=3 underflows
    # at E ~ 30; the f64 reference never hits this, tnac4o.py:1589)
    lB = -beta * expo + jnp.log(Xl)[..., None, :, None] \
        + jnp.log(Xu)[..., None, None, :] \
        + jnp.log(Xd_s * Xr_s)[..., :, None, None]
    B = jnp.exp(lB)
    dr = dmap * lh + rmap                            # (..., Np), d-major
    P = jax.nn.one_hot(dr, lv * lh, dtype=B.dtype)   # (..., Np, lv*lh)
    Wt = jnp.einsum("...slu,...sk->...lku", B, P)
    Wt = Wt.reshape(Wt.shape[:-3] + (lh, lv, lh, lv))
    return lB, Wt


def _absorb_row(mps, Wrow, conj, Dmax, tolS, tolV, max_sweeps, graduate,
                method, rsvd=None):
    if method == "zipup":
        return bmps.compress_apply(mps, Wrow, Dmax, conj=conj, tolS=tolS,
                                   tolV=tolV, max_sweeps=max_sweeps,
                                   rsvd=rsvd)
    fat = bmps.apply_mpo(mps, Wrow, conj=conj)
    return bmps.compress(fat, Dmax, tolS=tolS, tolV=tolV,
                         max_sweeps=max_sweeps, graduate=graduate)


def _lane_pack(W):
    """Merge the two minor legs of a traced-tensor stack so the stored
    array tiles the TPU (8, 128) vector layout without padding: a minor
    dim of lh=16 lane-pads 8x (measured: the fleet ladder's 1.0G
    `build_rho_both` scan input ballooned to 8.0G of HBM), while
    lh*lv=256 tiles exactly. Consumers unpack per scan step — an O(step)
    copy of a few MB instead of an 8x-padded resident buffer."""
    return W.reshape(W.shape[:-2] + (W.shape[-2] * W.shape[-1],))


def _lane_unpack(W, lh, lv):
    return W.reshape(W.shape[:-1] + (lh, lv))


@partial(jax.jit, static_argnames=("Dmax", "tolS", "tolV", "max_sweeps",
                                   "graduate", "method", "rsvd"))
def build_rhoT(Wt, *, Dmax, tolS, tolV, max_sweeps, graduate,
               method="zipup", rsvd=None):
    """Boundary-MPS stack from the bottom edge upward.

    Wt: (Ny, Nx, lh, lv, lh, lv) traced row tensors.
    Returns (rhoT, lognorms, overlaps, discarded) where
    rhoT[ny] (ny=0..Ny) approximates the contraction of rows ny..Ny-1 as an
    MPS over columns with physical legs = up-legs of row ny; rhoT[Ny] is the
    trivial boundary. Reference `_setup_rhoT` (`tnac4o/tnac4o.py:1674-1695`).

    method="zipup" (default) absorbs each row fat-MPS-free
    (`bmps.compress_apply`); method="fat" materializes the D*l-bond MPS and
    runs the reference's graduate-truncation schedule.
    """
    Ny, Nx, lh, lv = Wt.shape[:4]
    dtype = Wt.dtype
    mps0 = bmps.trivial_mps(Nx, Dmax, lv, dtype)

    def step(mps, Wrow):
        Wrow = _lane_unpack(Wrow, lh, lv)
        new, overlap, disc = _absorb_row(mps, Wrow, True, Dmax, tolS, tolV,
                                         max_sweeps, graduate, method, rsvd)
        return new, (new.A, new.lognorm, overlap, disc)

    _, (As, lns, ovs, dss) = lax.scan(step, mps0, _lane_pack(Wt),
                                      reverse=True)
    rhoT = jnp.concatenate([As, mps0.A[None]], axis=0)
    lognorms = jnp.concatenate([lns, jnp.zeros((1,), dtype)])
    return rhoT, lognorms, ovs, dss


@partial(jax.jit, static_argnames=("Dmax", "tolS", "tolV", "max_sweeps",
                                   "graduate", "method", "rsvd"))
def build_rhoB(Wt, *, Dmax, tolS, tolV, max_sweeps, graduate,
               method="zipup", rsvd=None):
    """Boundary-MPS stack from the top edge downward (mirror of
    :func:`build_rhoT`; reference `_setup_rhoB`,
    `tnac4o/tnac4o.py:1697-1718`). rhoB[ny] contracts rows 0..ny-1; its
    physical legs live on the up-legs of row ny; rhoB[0] is trivial."""
    Ny, Nx, lh, lv = Wt.shape[:4]
    dtype = Wt.dtype
    mps0 = bmps.trivial_mps(Nx, Dmax, lv, dtype)

    def step(mps, Wrow):
        Wrow = _lane_unpack(Wrow, lh, lv)
        new, overlap, disc = _absorb_row(mps, Wrow, False, Dmax, tolS, tolV,
                                         max_sweeps, graduate, method, rsvd)
        return new, (new.A, overlap, disc)

    _, (As, ovs, dss) = lax.scan(step, mps0, _lane_pack(Wt))
    rhoB = jnp.concatenate([mps0.A[None], As], axis=0)
    return rhoB, ovs, dss


@partial(jax.jit, static_argnames=("Dmax", "tolS", "tolV", "max_sweeps",
                                   "graduate", "method", "rsvd"))
def build_rho_both(Wt, *, Dmax, tolS, tolV, max_sweeps, graduate,
                   method="zipup", rsvd=None):
    """Both boundary stacks (rhoT and rhoB) in ONE batched row scan.

    A conj=False (bottom) row absorption is identically a conj=True (top)
    absorption of the up/down-swapped tensor (`bmps._orient_mpo`), and a
    forward scan is a reverse scan over the row-flipped stack — so the
    bottom build is an exact mirror of the top build. Stacking the two
    direction lanes and vmapping the absorption halves the sequential
    row-recurrence depth; at the preconditioner's D=8 the per-step tensors
    are tiny and latency-bound, so the two lanes ride one program nearly
    for free. (The batched `lax.while_loop` masks converged lanes, so each
    lane's result is bit-identical to the unbatched build.)

    Returns (rhoT, rhoB) with the same conventions as :func:`build_rhoT` /
    :func:`build_rhoB`.
    """
    Ny, Nx, lh, lv = Wt.shape[:4]
    dtype = Wt.dtype
    WtB = jnp.flip(jnp.transpose(Wt, (0, 1, 2, 5, 4, 3)), axis=0)
    # lane-packed stack: (Ny, 2, Nx, lh, lv, lh*lv) tiles without the 8x
    # minor-dim padding (this temp OOMed the C16 fleet ladder at 8.0G)
    Wpair = _lane_pack(jnp.stack([Wt, WtB], axis=1))
    mps0 = bmps.trivial_mps(Nx, Dmax, lv, dtype)
    mps0x2 = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), mps0)

    absorb = jax.vmap(lambda m, w: _absorb_row(
        m, w, True, Dmax, tolS, tolV, max_sweeps, graduate, method, rsvd))

    def step(mps2, Wrows):
        new, _, _ = absorb(mps2, _lane_unpack(Wrows, lh, lv))
        return new, new.A

    _, As = lax.scan(step, mps0x2, Wpair, reverse=True)
    rhoT = jnp.concatenate([As[:, 0], mps0.A[None]], axis=0)
    rhoB = jnp.concatenate([mps0.A[None], jnp.flip(As[:, 1], axis=0)],
                           axis=0)
    return rhoT, rhoB


def columns_view(Wt):
    """Reorient the traced row tensors for column-wise (left/right)
    boundary MPS: chain legs become the vertical (u, d) legs and the
    contracted/output physical legs the horizontal (l, r) ones
    (reference transposes W to (u, l, d, r), `tnac4o/tnac4o.py:1733`)."""
    return jnp.transpose(Wt, (1, 0, 5, 2, 3, 4))


@partial(jax.jit, static_argnames=("Dmax", "tolS", "tolV", "max_sweeps",
                                   "graduate", "method", "rsvd"))
def build_rhoL(Wt, *, Dmax, tolS, tolV, max_sweeps, graduate,
               method="zipup", rsvd=None):
    """Boundary-MPS stack from the left edge rightward (reference
    `_setup_rhoL`, `tnac4o/tnac4o.py:1720-1742`). rhoL[nx] contracts
    columns 0..nx-1; physical legs on the left-legs of column nx."""
    Wc = columns_view(Wt)
    Nx, Ny, lv, lh = Wc.shape[:4]
    mps0 = bmps.trivial_mps(Ny, Dmax, lh, Wt.dtype)

    def step(mps, Wcol):
        Wcol = _lane_unpack(Wcol, lh, lv)
        new, overlap, disc = _absorb_row(mps, Wcol, True, Dmax, tolS, tolV,
                                         max_sweeps, graduate, method, rsvd)
        return new, (new.A, overlap, disc)

    _, (As, ovs, dss) = lax.scan(step, mps0, _lane_pack(Wc))
    rhoL = jnp.concatenate([mps0.A[None], As], axis=0)
    return rhoL, ovs, dss


@partial(jax.jit, static_argnames=("Dmax", "tolS", "tolV", "max_sweeps",
                                   "graduate", "method", "rsvd"))
def build_rhoR(Wt, *, Dmax, tolS, tolV, max_sweeps, graduate,
               method="zipup", rsvd=None):
    """Boundary-MPS stack from the right edge leftward (reference
    `_setup_rhoR`, `tnac4o/tnac4o.py:1744-1766`). rhoR[nx] contracts
    columns nx..Nx-1; physical legs on the left-legs of column nx."""
    Wc = columns_view(Wt)
    Nx, Ny, lv, lh = Wc.shape[:4]
    mps0 = bmps.trivial_mps(Ny, Dmax, lh, Wt.dtype)

    def step(mps, Wcol):
        Wcol = _lane_unpack(Wcol, lh, lv)
        new, overlap, disc = _absorb_row(mps, Wcol, False, Dmax, tolS, tolV,
                                         max_sweeps, graduate, method, rsvd)
        return new, (new.A, overlap, disc)

    _, (As, ovs, dss) = lax.scan(step, mps0, _lane_pack(Wc), reverse=True)
    rhoR = jnp.concatenate([As, mps0.A[None]], axis=0)
    return rhoR, ovs, dss


@jax.jit
def row_right_envs(AT_row, Wt_row, uidx):
    """Right environments of the active row for every branch.

    AT_row: (Nx, D, lv, D) boundary MPS below the active row.
    Wt_row: (Nx, lh, lv, lh, lv) traced tensors of the active row.
    uidx:   (M, Nx) up-leg indices per branch per site (row-start vind[:, 1:]).

    Returns RRs (Nx, M, D, lh): RRs[nx, m] is the environment of sites
    nx+1..Nx-1 (trivial at nx = Nx-1), each rescaled to O(1).
    Reference `_setup_RR` (`tnac4o/tnac4o.py:1768-1784`) — the dict
    memoization over repeated suffixes is replaced by batching over branches.
    """
    Nx, D, lv, _ = AT_row.shape
    lh = Wt_row.shape[1]
    M = uidx.shape[0]
    rr0 = jnp.zeros((M, D, lh), dtype=AT_row.dtype).at[:, 0, 0].set(1.0)

    def step(rr, xs):
        AT, Wt, u = xs           # (D,lv,D), (lh,lv,lh,lv), (M,)
        new = _rr_absorb(AT, Wt, u, rr)
        scale = jnp.max(jnp.abs(new), axis=(1, 2), keepdims=True)
        new = new / jnp.where(scale > 0, scale, 1.0)
        return new, new

    # scan sites Nx-1..1; emitting the post-absorption env at site s gives
    # exactly RRs[s-1] (stacked at xs index s-1); RRs[Nx-1] is trivial.
    _, RRs = lax.scan(step, rr0, (AT_row[1:], Wt_row[1:], uidx[:, 1:].T),
                      reverse=True)
    RRs = jnp.concatenate([RRs, rr0[None]], axis=0)     # (Nx, M, D, lh)
    return RRs


def _rr_absorb_gather(AT, Wt, u, rr):
    """One right-env absorption, gather form: select each branch's traced
    tensor slice then contract per branch (batched small matmuls)."""
    Wu = Wt[:, :, :, u]          # (lh, lv, lh, M) gather over u
    Wu = jnp.moveaxis(Wu, -1, 0)                    # (M, lh, lv, lh)
    T = jnp.einsum("adb,mbr->madr", AT, rr)         # (M, D, lv, lh)
    return jnp.einsum("madr,mldr->mal", T, Wu)      # (M, D, lh)


def _rr_absorb_twogemm(AT, Wt, u, rr):
    """One right-env absorption, all-up-legs GEMM form.

    The gather form's per-branch traced-tensor slice + batched
    (D x lv*lh)@(lv*lh x lh) tiny matmuls tile terribly onto the MXU
    (measured 1.14 ms/site at the flagship shape). Instead contract
    rr with AT over the bond as ONE GEMM, contract the result with the
    FULL traced tensor over (d, r) for every up-leg value q as a second
    GEMM, then select q = u_m per branch — lv/Nx-fold FLOP inflation on
    the second GEMM, but large MXU-friendly shapes: 0.85 ms/site
    measured, numerically tighter than the gather form's two-step
    accumulation (results/r4_rowenv_probe.jsonl)."""
    T = jnp.einsum("mbr,adb->mrad", rr, AT)          # (M, lh, D, lv)
    new_all = jnp.einsum("mrad,ldrq->malq", T, Wt)   # (M, D, lh, q)
    return jnp.take_along_axis(
        new_all, u[:, None, None, None], axis=3)[..., 0]


_rr_absorb = _rr_absorb_twogemm


@jax.jit
def marginal_step(lB, drindex, AT, RL, RRsel, lidx, uidx, nvalid):
    """Normalized conditional marginals of one site for all branches.

    lB:      (Np, lh, lv) log of the gauged Boltzmann factor of the site.
    drindex: (Np,) int, dmap*lh + rmap.
    AT:      (D, lv, D) boundary-MPS tensor below the site.
    RL:      (M, D) left environments.
    RRsel:   (M, D, lh) right environments (gathered per branch).
    lidx/uidx: (M,) left/up leg indices per branch.
    nvalid:  number of valid block states (scalar, may be traced).

    The Boltzmann column of each branch is exponentiated only after
    subtracting its own maximum, so deep-tail branches keep exact relative
    weights even when exp(-beta*E) underflows the compute dtype.

    Returns (Pn, mPn): probabilities (M, Np) normalized over the valid
    states, and the per-branch "negativeness" red flag. Reference
    `_calculate_Pn` (`tnac4o/tnac4o.py:1786-1807`).
    """
    Np, lh, lv = lB.shape
    M, D = RL.shape
    T1 = (RL @ AT.reshape(D, lv * D)).reshape(M, lv, D)
    T2 = jnp.einsum("mvb,mbl->mvl", T1, RRsel)          # (M, lv, lh)
    g = jnp.take_along_axis(T2.reshape(M, lv * lh), drindex[None, :],
                            axis=1)                     # (M, Np)
    lBlu = lB.reshape(Np, lh * lv)[:, lidx * lv + uidx].T   # (M, Np)
    shift = jnp.max(lBlu, axis=1, keepdims=True)
    shift = jnp.where(jnp.isfinite(shift), shift, 0.0)
    Pn = g * jnp.exp(lBlu - shift)
    smask = jnp.arange(Np) < nvalid
    Pn = jnp.where(smask[None, :], Pn, 0.0)

    big = jnp.asarray(jnp.finfo(Pn.dtype).max, Pn.dtype)
    mPn = jnp.min(jnp.where(smask[None, :], Pn, big), axis=1)  # (M,)
    neg = mPn < 0
    clip = neg[:, None] & smask[None, :] & (Pn < jnp.abs(mPn)[:, None])
    Pn = jnp.where(clip, jnp.abs(mPn)[:, None], Pn)
    mPn = jnp.where(neg, mPn * jnp.sum(clip, axis=1), mPn)
    no = jnp.sum(Pn, axis=1)
    good = no > 0
    uniform = smask.astype(Pn.dtype) / nvalid
    Pn = jnp.where(good[:, None], Pn / jnp.where(good, no, 1.0)[:, None],
                   uniform[None, :])
    mPn = jnp.where(good, mPn / jnp.where(good, no, 1.0), -1.0)
    return Pn, mPn


@jax.jit
def marginal_site(lB, drindex, AT, RL, RRs_nx, idx3, nvalid):
    """marginal_step with per-branch indices packed into one (3, M) array
    (aidx into RRs_nx, lidx, uidx) — a single host->device transfer per
    site; each transfer over a tunneled accelerator link costs ~50 ms
    regardless of size."""
    RRsel = RRs_nx[idx3[0]]
    return marginal_step(lB, drindex, AT, RL, RRsel, idx3[1], idx3[2],
                         nvalid)


@jax.jit
def rl_update_sel(RL, AT, idx2):
    """rl_update with (parent-selection, down-index) packed as (2, M)."""
    return rl_update(RL[idx2[0]], AT, idx2[1])


@partial(jax.jit, static_argnames=("cap",))
def expand_topk(Pn, mPn, prob, valid, log2_cutoff, *, cap):
    """Device-side candidate expansion for the host-orchestrated search.

    Computes probf = prob[:, None] + log2(Pn) flattened, the number of
    candidates above the relative cutoff, and the top-``cap`` candidates.
    The host pulls only (cap,) values/indices instead of the full (M, Np)
    marginal table — a 16-30x smaller transfer — and falls back to pulling
    Pn when count > cap (exactness preserved; reference semantics
    `tnac4o/tnac4o.py:456-465`).

    Returns one packed float32 array [vals(cap), idx-bits(cap), count,
    minP, minP_core] where idx indexes the flattened (M*Np) expansion.
    minP_core restricts the negativeness statistic to branches within the
    relative-probability cutoff window of the best branch — branches whose
    conditionals are meaningful at the compute dtype. Sub-window tail
    branches in f32 sit below the compressed boundary's representational
    noise floor and saturate the raw flag at -1 without carrying
    information (diagnosed round 2, tools/negp_probe.py: f64 end-to-end at
    the same D shows minP_core-level negativeness only).
    """
    M, Np = Pn.shape
    neg = jnp.asarray(-1e30, Pn.dtype)
    logP = jnp.where(Pn > 0, jnp.log2(jnp.where(Pn > 0, Pn, 1.0)), neg)
    probf = jnp.where(valid[:, None], prob[:, None] + logP, neg)
    probf = probf.reshape(M * Np)
    pmax = jnp.max(probf)
    count = jnp.sum(probf > pmax + log2_cutoff)
    vals, idx = lax.top_k(probf, min(cap, M * Np))
    minP = jnp.min(jnp.where(valid, mPn, 0.0))
    bmax = jnp.max(jnp.where(valid, prob, neg))
    core = valid & (prob > bmax + log2_cutoff)
    minP_core = jnp.min(jnp.where(core, mPn, 0.0))
    # pack everything into ONE array: each host pull costs a full round
    # trip over the accelerator IO link (~50 ms fixed on tunneled setups)
    packed = jnp.concatenate([
        vals.astype(jnp.float32),
        lax.bitcast_convert_type(idx.astype(jnp.int32), jnp.float32),
        jnp.stack([count.astype(jnp.float32),
                   minP.astype(jnp.float32),
                   minP_core.astype(jnp.float32)]),
    ])
    return packed


@jax.jit
def rl_update(RL, AT, didx):
    """Absorb the active site into each branch's left environment.

    RL (M, D), AT (D, lv, D), didx (M,) chosen down-leg indices.
    Reference: RL' = RL @ A[:, d, :] with power-of-two rescale
    (`tnac4o/tnac4o.py:528-535`).
    """
    ATd = jnp.moveaxis(AT, 1, 0)[didx]      # (M, D, D)
    new = jnp.einsum("md,mdc->mc", RL, ATd)
    scale = jnp.max(jnp.abs(new), axis=1, keepdims=True)
    return new / jnp.where(scale > 0, scale, 1.0)
