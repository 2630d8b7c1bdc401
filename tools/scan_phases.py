"""In-scan per-phase cost breakdown of the search row/site step.

The flagship's ~0.9 s search scan (L2048: 256 sequential sites) is the
last unattributed chunk of the 2.4 s floor. Round-4's ab_select.py
measured selection at ~0.09 s (0.35 ms/site); this tool times the other
site-step phases the same way — each phase alone inside a 256-step
`lax.scan` at the exact flagship shapes (M=1024, Np=256, D=32, lh=lv=16,
vind width 17, bits=4, C=8192, L=2048 state columns), one dispatch,
host-sync timed. fori_loop/eager timings are artifacts (round-3 lesson);
only in-scan numbers count.

Phases:
  merge     merge_candidates: lexsort + segment reductions + top-M
  marginal  engine.marginal_step (the per-site einsums)
  rlup      engine.rl_update (env absorb + rescale)
  gather    candidate construction: E_cand/vind_c gathers+scatters at C,
            states/deg beam gathers at M (the HBM-traffic phase)
  topk      lax.top_k over M*Np at k=C+1 (selection, for the total)

Sum should land near the measured ~3.5 ms/site; the gap is scan/dispatch
overhead + the small diagnostics.
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
from jax import lax

from tnax import engine, parallel

M, Np, D, LH, LV = 1024, 256, 32, 16, 16
NX = 16
W = NX + 1           # vind width
BITS = 4
C = 8192             # cand_factor 8 * M
L = 2048             # state columns
STEPS = 256


def _rng_inputs(seed=0):
    r = np.random.default_rng(seed)
    return r


@jax.jit
def scan_merge(vind, Eng, prob, valid, deg):
    def step(carry, _):
        p = prob + carry
        slot, rep, prob_out, Eng_out, out_valid, disc, deg_out = \
            parallel.merge_candidates(vind, Eng, p, valid, 1e-12, BITS,
                                      M, deg=deg)
        return prob_out[0] * 1e-9, None
    carry, _ = lax.scan(step, jnp.float32(0.0), None, length=STEPS)
    return carry


@jax.jit
def scan_marginal(lB, drindex, AT, RL0, RRs, lidx, uidx):
    def step(RL, _):
        Pn, mPn = engine.marginal_step(lB, drindex, AT, RL, RRs, lidx,
                                       uidx, Np)
        # fold Pn back into RL so the scan cannot hoist the work
        return RL + Pn[:, :D] * 1e-9, None
    RL, _ = lax.scan(step, RL0, None, length=STEPS)
    return RL


@jax.jit
def scan_rlup(RL0, AT, didx):
    def step(RL, _):
        return engine.rl_update(RL, AT, didx), None
    RL, _ = lax.scan(step, RL0, None, length=STEPS)
    return RL


@jax.jit
def scan_gather(Eng, vind, states, deg, src, indc, Es_t, Esl_t, Esu_t,
                dmap, rmap, bsrc, indc_m):
    rowsC = jnp.arange(C)
    rows_ = jnp.arange(M)

    def step(carry, nx_col):
        nx, col = nx_col
        E = Eng + carry
        E_cand = E[src] + Es_t[indc] + Esl_t[indc, vind[src, nx]] \
            + Esu_t[indc, vind[src, nx + 1]]
        vind_c = vind[src]
        vind_c = vind_c.at[rowsC, nx].set(dmap[indc])
        vind_c = vind_c.at[rowsC, nx + 1].set(rmap[indc])
        states_m = states[bsrc].at[rows_, col].set(indc_m)
        deg_c = deg[src]
        out = E_cand[0] * 1e-9 + vind_c[0, 0] * 0.0 \
            + states_m[0, 0] * 0.0 + deg_c[0, 0] * 0.0
        return out.astype(jnp.float32), None
    nxs = jnp.tile(jnp.arange(NX, dtype=jnp.int32), STEPS // NX)
    cols = (jnp.arange(STEPS, dtype=jnp.int32) * 7) % L
    carry, _ = lax.scan(step, jnp.float32(0.0), (nxs, cols))
    return carry


@jax.jit
def scan_gather_vindonly(vind, src, indc, dmap, rmap):
    """Just the (C, W) vind gather + two dynamic-column scatters."""
    rowsC = jnp.arange(C)

    def step(carry, nx):
        vind_c = vind[src] + carry
        vind_c = vind_c.at[rowsC, nx].set(dmap[indc])
        vind_c = vind_c.at[rowsC, nx + 1].set(rmap[indc])
        return vind_c[0, 0] * 0, None
    nxs = jnp.tile(jnp.arange(NX, dtype=jnp.int32), STEPS // NX)
    carry, _ = lax.scan(step, jnp.int32(0), nxs)
    return carry


@jax.jit
def scan_gather_Eonly(Eng, vind, src, indc, Es_t, Esl_t, Esu_t):
    """Just the E_cand table gathers (2D-indexed energy tables)."""
    def step(carry, nx):
        E = Eng + carry
        E_cand = E[src] + Es_t[indc] + Esl_t[indc, vind[src, nx]] \
            + Esu_t[indc, vind[src, nx + 1]]
        return E_cand[0] * 1e-9, None
    nxs = jnp.tile(jnp.arange(NX, dtype=jnp.int32), STEPS // NX)
    carry, _ = lax.scan(step, jnp.float32(0.0), nxs)
    return carry


@jax.jit
def scan_gather_nostates(Eng, vind, deg, src, indc, Es_t, Esl_t, Esu_t,
                         dmap, rmap):
    """scan_gather minus the (M, L) states gather+scatter — the diff
    prices the states carry, i.e. the parent-pointer/backtrack payoff."""
    rowsC = jnp.arange(C)

    def step(carry, nx):
        E = Eng + carry
        E_cand = E[src] + Es_t[indc] + Esl_t[indc, vind[src, nx]] \
            + Esu_t[indc, vind[src, nx + 1]]
        vind_c = vind[src]
        vind_c = vind_c.at[rowsC, nx].set(dmap[indc])
        vind_c = vind_c.at[rowsC, nx + 1].set(rmap[indc])
        deg_c = deg[src]
        out = E_cand[0] * 1e-9 + vind_c[0, 0] * 0.0 + deg_c[0, 0] * 0.0
        return out.astype(jnp.float32), None
    nxs = jnp.tile(jnp.arange(NX, dtype=jnp.int32), STEPS // NX)
    carry, _ = lax.scan(step, jnp.float32(0.0), nxs)
    return carry


def _mk_scan_rowenv(absorb):
    @jax.jit
    def scan_rowenv(AT_row, Wt_row, uidx):
        """One row_right_envs absorption per scan iteration — the
        per-row reverse env build costs Nx of these per Nx site steps."""
        def step(rr, _):
            new = absorb(AT_row, Wt_row, uidx, rr)
            scale = jnp.max(jnp.abs(new), axis=(1, 2), keepdims=True)
            return new / jnp.where(scale > 0, scale, 1.0), None
        rr0 = jnp.zeros((M, D, LH), AT_row.dtype).at[:, 0, 0].set(1.0)
        rr, _ = lax.scan(step, rr0, None, length=STEPS)
        return rr
    return scan_rowenv


@jax.jit
def scan_rrsel(RRs, aidx):
    """The per-site RRs[nx][aidx] branch gather ((M, D, lh) from
    (Nx, M, D, lh))."""
    def step(carry, nx):
        sel = RRs[nx][aidx]
        return carry + sel[0, 0, 0] * 1e-9, None
    nxs = jnp.tile(jnp.arange(NX, dtype=jnp.int32), STEPS // NX)
    carry, _ = lax.scan(step, jnp.float32(0.0), nxs)
    return carry


@jax.jit
def scan_logp(Pn, prob, valid):
    """The post-marginal expansion: log2 + masking + reshape over M*Np."""
    def step(carry, _):
        P = Pn + carry
        logP = jnp.where(P > 0, jnp.log2(jnp.where(P > 0, P, 1.0)),
                         -1e30)
        probf = jnp.where(valid[:, None], prob[:, None] + logP,
                          -1e30).reshape(M * Np)
        return probf[0] * 1e-9, None
    carry, _ = lax.scan(step, jnp.float32(0.0), None, length=STEPS)
    return carry


@jax.jit
def scan_topk(probf):
    def step(carry, _):
        vals, idx = lax.top_k(probf + carry, C + 1)
        return vals[0] * 1e-9, None
    carry, _ = lax.scan(step, jnp.float32(0.0), None, length=STEPS)
    return carry


def timed(name, fn, *args):
    np.asarray(fn(*args))            # compile + first run
    best = np.inf
    for _ in range(2):
        t0 = time.time()
        np.asarray(fn(*args))
        best = min(best, time.time() - t0)
    print(json.dumps({"phase": name,
                      "per_site_ms": round(best / STEPS * 1e3, 4),
                      "scan_s": round(best, 4)}), flush=True)
    return best


def main():
    print(json.dumps({"backend": jax.default_backend(),
                      "shape": dict(M=M, Np=Np, D=D, C=C, W=W,
                                    bits=BITS, steps=STEPS)}), flush=True)
    r = _rng_inputs()
    f32 = np.float32

    vind = jnp.asarray(r.integers(0, LH, size=(C, W)), jnp.int32)
    Eng = jnp.asarray(r.normal(size=C).astype(f32))
    prob = jnp.asarray((r.normal(size=C) - 30).astype(f32))
    valid = jnp.asarray(r.random(C) < 0.97)
    deg = jnp.ones((C, parallel.DEG_LIMBS), jnp.int32)
    t_merge = timed("merge", scan_merge, vind, Eng, prob, valid, deg)

    lB = jnp.asarray(r.normal(size=(Np, LH, LV)).astype(f32))
    drindex = jnp.asarray(r.integers(0, LH * LV, size=Np), jnp.int32)
    AT = jnp.asarray(r.normal(size=(D, LV, D)).astype(f32) / D)
    RL0 = jnp.asarray(r.normal(size=(M, D)).astype(f32))
    RRs = jnp.asarray(r.normal(size=(M, D, LH)).astype(f32) / D)
    lidx = jnp.asarray(r.integers(0, LH, size=M), jnp.int32)
    uidx = jnp.asarray(r.integers(0, LV, size=M), jnp.int32)
    t_marg = timed("marginal", scan_marginal, lB, drindex, AT, RL0, RRs,
                   lidx, uidx)

    didx = jnp.asarray(r.integers(0, LV, size=M), jnp.int32)
    t_rl = timed("rlup", scan_rlup, RL0, AT, didx)

    vindM = jnp.asarray(r.integers(0, LH, size=(M, W)), jnp.int32)
    states = jnp.asarray(r.integers(0, Np, size=(M, L)), jnp.int32)
    degM = jnp.ones((M, parallel.DEG_LIMBS), jnp.int32)
    src = jnp.asarray(r.integers(0, M, size=C), jnp.int32)
    indc = jnp.asarray(r.integers(0, Np, size=C), jnp.int32)
    EngM = jnp.asarray(r.normal(size=M).astype(f32))
    Es_t = jnp.asarray(r.normal(size=Np).astype(f32))
    Esl_t = jnp.asarray(r.normal(size=(Np, LH)).astype(f32))
    Esu_t = jnp.asarray(r.normal(size=(Np, LV)).astype(f32))
    dmap = jnp.asarray(r.integers(0, LH, size=Np), jnp.int32)
    rmap = jnp.asarray(r.integers(0, LV, size=Np), jnp.int32)
    bsrc = jnp.asarray(r.integers(0, M, size=M), jnp.int32)
    indc_m = jnp.asarray(r.integers(0, Np, size=M), jnp.int32)
    t_gather = timed("gather", scan_gather, EngM, vindM, states, degM,
                     src, indc, Es_t, Esl_t, Esu_t, dmap, rmap, bsrc,
                     indc_m)

    probf = jnp.asarray((r.normal(size=M * Np) - 30).astype(f32))
    t_topk = timed("topk", scan_topk, probf)

    timed("gather_nostates", scan_gather_nostates, EngM, vindM, degM,
          src, indc, Es_t, Esl_t, Esu_t, dmap, rmap)
    timed("gather_vindonly", scan_gather_vindonly, vindM, src, indc,
          dmap, rmap)
    timed("gather_Eonly", scan_gather_Eonly, EngM, vindM, src, indc,
          Es_t, Esl_t, Esu_t)

    from tnax import engine
    AT_row = jnp.asarray(r.normal(size=(D, LV, D)).astype(f32) / D)
    Wt_row = jnp.asarray(r.normal(size=(LH, LV, LH, LV)).astype(f32))
    uidxM = jnp.asarray(r.integers(0, LV, size=M), jnp.int32)
    t_rowenv = timed("rowenv", _mk_scan_rowenv(engine._rr_absorb_gather),
                     AT_row, Wt_row, uidxM)
    t_rowenv2 = timed("rowenv_twogemm",
                      _mk_scan_rowenv(engine._rr_absorb_twogemm),
                      AT_row, Wt_row, uidxM)
    t_rowenv = min(t_rowenv, t_rowenv2)

    RRsF = jnp.asarray(r.normal(size=(NX, M, D, LH)).astype(f32))
    aidx = jnp.asarray(r.integers(0, M, size=M), jnp.int32)
    t_rrsel = timed("rrsel", scan_rrsel, RRsF, aidx)

    PnM = jnp.asarray(r.random(size=(M, Np)).astype(f32))
    probM = jnp.asarray((r.normal(size=M) - 30).astype(f32))
    validM = jnp.asarray(r.random(M) < 0.97)
    t_logp = timed("logp", scan_logp, PnM, probM, validM)

    total = t_merge + t_marg + t_rl + t_gather + t_topk \
        + t_rowenv + t_rrsel + t_logp
    print(json.dumps({"phase": "SUM",
                      "per_site_ms": round(total / STEPS * 1e3, 4),
                      "scan_s": round(total, 4),
                      "note": "flagship search scan measures ~0.9 s "
                              "(~3.5 ms/site); gap = dispatch + "
                              "diagnostics"}), flush=True)


if __name__ == "__main__":
    main()
