"""Gibbs sampling from the PEPS-represented Boltzmann distribution.

Same contraction core as the ground-state search; instead of
cutoff/merge/truncation each of the M branches samples its block state from
the conditional distribution (reference `gibbs_sampling`,
`tnac4o/tnac4o.py:553-650`). The reference memoizes repeated boundary-index
vectors in a dict; batching all M branches on device makes that unnecessary.
"""

from __future__ import annotations

import dataclasses
import logging
import time

import numpy as np
import jax.numpy as jnp

from . import engine
from .search import ContractionContext

logger = logging.getLogger("tnax")


@dataclasses.dataclass
class SampleResult:
    energy: np.ndarray
    states: np.ndarray
    negative_probability: float


def gibbs_sampling(ctx: ContractionContext, M=2 ** 10, Dmax=32, tolS=1e-15,
                   tolV=1e-10, max_sweeps=20, graduate_truncation=True,
                   rng=None) -> SampleResult:
    t_total = time.time()
    logger.info("Preprocessing boundary MPS (D=%d) ...", Dmax)
    ctx.build_boundary(Dmax, tolS, tolV, max_sweeps, graduate_truncation)
    logger.info("Elapsed: %.2f s", time.time() - t_total)

    rng = np.random.default_rng() if rng is None else rng
    Ny, Nx = ctx.Ny, ctx.Nx
    D, dtype = ctx.Dmax, ctx.dtype

    vind = np.zeros((M, Nx + 1), dtype=np.int32)
    states = np.zeros((M, Nx * Ny), dtype=np.int32)
    Eng = np.zeros(M)
    globalmin = 1.0

    for ny in range(Ny):
        t_row = time.time()
        AT_row = ctx.rhoT[ny + 1]
        RRs = engine.row_right_envs(AT_row, ctx.Wt[ny],
                                    jnp.asarray(vind[:, 1:]))
        RL = jnp.zeros((M, D), dtype=dtype).at[:, 0].set(1.0)

        for nx in range(Nx):
            n = int(ctx.nstates[ny, nx])
            Pn_d, mPn_d = engine.marginal_step(
                ctx.lB[ny, nx], ctx.drindex[ny, nx], AT_row[nx],
                RL, RRs[nx], jnp.asarray(vind[:, nx]),
                jnp.asarray(vind[:, nx + 1]), nvalid=n)
            Pn = np.asarray(Pn_d[:, :n], dtype=np.float64)
            globalmin = min(globalmin, float(np.min(np.asarray(mPn_d))))

            cums = np.cumsum(Pn, axis=1)
            rr = rng.random(M)
            indc = np.minimum((cums < rr[:, None]).sum(axis=1),
                              n - 1).astype(np.int32)

            states[:, ny * Nx + nx] = indc
            Es, Esl, Esu = ctx.energy_tables(ny, nx)
            Eng += Es[indc] + Esl[indc, vind[:, nx]] \
                + Esu[indc, vind[:, nx + 1]]
            vind[:, nx] = ctx.dmap[ny, nx][indc]
            vind[:, nx + 1] = ctx.rmap[ny, nx][indc]

            RL = engine.rl_update(RL, AT_row[nx],
                                  jnp.asarray(vind[:, nx]))

        logger.info("Row %d/%d sampled, %.2f s", ny + 1, Ny,
                    time.time() - t_row)
        vind[:, 1:] = vind[:, :-1]
        vind[:, 0] = 0

    logger.info("Sampling total: %.2f s", time.time() - t_total)
    return SampleResult(energy=Eng, states=states,
                        negative_probability=min(globalmin, 0.0))
