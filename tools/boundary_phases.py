"""Boundary-build cost attribution at the flagship operating point.

After the round-4 scan rewrites the flagship anatomy is precondition
~0.7 s + boundary ~0.83 s + search scan ~0.72 s; the boundary build is
16 sequential rows of zipup_apply (rsvd sketch truncation) +
variational_implicit polish. This tool times, on a REAL L2048 context
(instance 1, preconditioned):

  - the full build (build_rhoT, warm)
  - zip-up only per row (no variational polish)
  - variational polish only (applied to the zip-up output)
  - rsvd power-iteration count 2 (default) vs 1 vs 0
  - exact-SVD zip-up for scale

plus the number of variational sweeps the while_loop actually runs
(re-traced with a sweep counter), to direct the next optimization.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import tnax
from tnax import bmps, engine

J = tnax.load_Jij(
    "/root/reference/instances/Chimera_droplet_instances/"
    "chimera2048_spinglass_power/001.txt")
J = tnax.round_Jij(tnax.Jij_f2p(J), 1 / 75)
ins = tnax.Solver(mode="Ising", Nx=16, Ny=16, Nc=8, J=J, beta=3)
ins.precondition(mode="balancing")
ctx = ins._context()
D, tolS, tolV, sweeps = 32, 1e-16, 1e-10, 20


def timed(name, fn, n=2, **extra):
    fn()                      # compile + warm
    best = np.inf
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(json.dumps(dict(phase=name, s=round(best, 4), **extra)),
          flush=True)
    return best


def full_build():
    ctx.build_boundary(D, tolS, tolV, sweeps, True)
    jax.block_until_ready(ctx.rhoT)


timed("build_rhoT_full", full_build)

# single-row phases at the row with the largest Wt (middle row)
Wt_row = ctx.Wt[8]
mps0 = bmps.MPS(A=ctx.rhoT[9], lognorm=jnp.zeros((), ctx.dtype))


@partial(jax.jit, static_argnames=("rsvd", "iters"))
def zip_only(A, Wt, rsvd=True, iters=2):
    mps = bmps.MPS(A=A, lognorm=jnp.zeros((), A.dtype))
    import tnax.bmps as bb
    old = bb._rsvd
    if iters != 2:
        bb._rsvd = lambda Gm, k, key, it=2: old(Gm, k, key, iters)
    try:
        out, disc = bb.zipup_apply(mps, Wt, D, conj=True, tol=tolS,
                                   rsvd=rsvd)
    finally:
        bb._rsvd = old
    return out.A, disc


@jax.jit
def vari_only(Az, Aphi, Wt):
    mps = bmps.MPS(A=Az, lognorm=jnp.zeros((), Az.dtype))
    out, ov = bmps.variational_implicit(mps, Aphi, Wt, conj=True,
                                        tol=tolV, max_sweeps=sweeps)
    return out.A, ov


Az, _ = zip_only(mps0.A, Wt_row)
Az = jax.block_until_ready(Az)

for name, kw in [("ziprow_rsvd_it2", dict(rsvd=True, iters=2)),
                 ("ziprow_rsvd_it1", dict(rsvd=True, iters=1)),
                 ("ziprow_rsvd_it0", dict(rsvd=True, iters=0)),
                 ("ziprow_exact", dict(rsvd=False))]:
    timed(name, lambda kw=kw: jax.block_until_ready(
        zip_only(mps0.A, Wt_row, **kw)[0]))

timed("varirow", lambda: jax.block_until_ready(
    vari_only(Az, mps0.A, Wt_row)[0]))


# sweep counter: re-run variational_implicit with instrumentation
def sweeps_used(Az, Aphi, Wt):
    import tnax.bmps as bb
    mps = bb.MPS(A=Az, lognorm=jnp.zeros((), Az.dtype))
    out, ov = bb.variational_implicit(mps, Aphi, Wt, conj=True,
                                      tol=tolV, max_sweeps=sweeps)
    return out


# crude: bisect max_sweeps until output stops changing
base = jax.block_until_ready(vari_only(Az, mps0.A, Wt_row)[0])
for ms in (1, 2, 3, 4, 6):
    out, _ = jax.jit(
        lambda a, p, w, ms=ms: bmps.variational_implicit(
            bmps.MPS(A=a, lognorm=jnp.zeros((), a.dtype)), p, w,
            conj=True, tol=tolV, max_sweeps=ms))(Az, mps0.A, Wt_row)
    d = float(jnp.max(jnp.abs(out.A - base)))
    print(json.dumps({"max_sweeps": ms, "delta_vs_converged": d}),
          flush=True)

# accuracy: rsvd iters effect on the kept subspace (vs exact zip-up)
Ax, _ = zip_only(mps0.A, Wt_row, rsvd=False)
for it in (2, 1, 0):
    Ay, _ = zip_only(mps0.A, Wt_row, rsvd=True, iters=it)
    # compare post-polish marginim via overlap of the two MPS
    num = bmps.mps_dot(bmps.MPS(A=Ax, lognorm=jnp.zeros((), ctx.dtype)),
                       bmps.MPS(A=Ay, lognorm=jnp.zeros((), ctx.dtype)))
    print(json.dumps({"rsvd_iters": it,
                      "overlap_vs_exact": float(num)}), flush=True)
