"""Device-resident search step and multi-chip sharding.

The reference is single-threaded NumPy; parallel scale-out is *new design*
(SURVEY.md section 2.9). Two mesh axes are exposed:

- ``data``: independent problem instances / rotations (pure data
  parallelism — the production fleet mode, e.g. 100 chimera instances x 4
  rotations, one search per device group).
- ``beam``: the M beam branches of one search. Marginal evaluation — the
  dominant per-site cost — shards cleanly over branches; the global
  relative-probability cutoff uses `lax.pmax`, and the top-M + merge run
  replicated after an `all_gather` of the small per-branch payloads, so
  collectives ride ICI once per site.

`row_step` is the fully device-resident analogue of one row of the
branch-and-bound search (marginals, cutoff, top-M via `lax.top_k`,
merge-by-boundary-index via lexicographic sort + segment reductions,
energy/degeneracy bookkeeping) as one jitted `lax.scan` — the
throughput-mode alternative to the host-orchestrated
`tnax.search.search_ground_state`. Two documented deviations from the
host/reference path: energies accumulate in the compute dtype (f32 on
TPU), and the beam is truncated to M *before* merging instead of after
(the reference merges the full post-cutoff candidate set,
`tnac4o/tnac4o.py:481-526`).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax import shard_map

from . import engine

NEG = -1e30  # effectively -inf log2 probability


# ---------------------------------------------------------------------------
# device-side merge by boundary-index vector
# ---------------------------------------------------------------------------

def pack_keys(vind, bits):
    """Pack (M, C) small-int rows into int32 lexicographic keys."""
    M, C = vind.shape
    per = max(1, 30 // bits)
    keys = []
    for lo in range(0, C, per):
        cols = vind[:, lo:lo + per].astype(jnp.int32)
        k = jnp.zeros((M,), dtype=jnp.int32)
        for c in range(cols.shape[1]):
            k = (k << bits) | cols[:, c]
        keys.append(k)
    return keys


def merge_beam(vind, Eng, prob, deg, valid, min_dEng, bits):
    """Merge branches with identical ``vind`` rows, on device.

    Device analogue of `tnax.search.merge_by_vind` (reference
    `tnac4o/tnac4o.py:481-515`): lexicographic sort + segment reductions;
    the minimum-energy member represents each group, degeneracies of
    members within ``min_dEng`` of the minimum are summed, their
    log2-probabilities averaged. Invalid branches sort into a trailing
    group and stay invalid.

    Returns (prob', Eng', deg', parent, valid') where ``parent`` indexes the
    input arrays (the group representative); callers gather vind/states/RL
    through it. Output arrays keep padded size M (empty groups invalid).
    """
    M = Eng.shape[0]
    keys = pack_keys(vind, bits) + [jnp.where(valid, 0, 1).astype(jnp.int32)]
    perm = jnp.lexsort(tuple(reversed(keys)))
    vs = vind[perm]
    Es = Eng[perm]
    ps = prob[perm]
    ds = deg[perm]
    vls = valid[perm]

    neq = jnp.any(vs[1:] != vs[:-1], axis=1) | (vls[1:] != vls[:-1])
    seg = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                           jnp.cumsum(neq).astype(jnp.int32)])
    big = jnp.asarray(jnp.finfo(Es.dtype).max, Es.dtype)
    Emin = jax.ops.segment_min(jnp.where(vls, Es, big), seg, num_segments=M)
    is_min = (Es == Emin[seg]) & vls
    pos = jnp.arange(M, dtype=jnp.int32)
    first_min = jax.ops.segment_min(jnp.where(is_min, pos, M), seg,
                                    num_segments=M)
    group_valid = first_min < M
    rep_sorted = jnp.clip(first_min, 0, M - 1)

    near = ((Es - Emin[seg]) <= min_dEng) & vls
    deg_sum = jax.ops.segment_sum(jnp.where(near, ds, 0), seg,
                                  num_segments=M)
    n_near = jax.ops.segment_sum(near.astype(Es.dtype), seg, num_segments=M)
    prob_mean = jax.ops.segment_sum(jnp.where(near, ps, 0.0), seg,
                                    num_segments=M) \
        / jnp.maximum(n_near, 1)

    parent = perm[rep_sorted]
    Eng_out = jnp.where(group_valid, Emin, 0.0)
    prob_out = jnp.where(group_valid, prob_mean, NEG)
    deg_out = jnp.where(group_valid, deg_sum, 0)
    return prob_out, Eng_out, deg_out, parent, group_valid


def merge_candidates(vind, Eng, prob, valid, min_dEng, bits, M):
    """Merge C expanded candidates by ``vind`` and keep the top-M groups.

    Unlike :func:`merge_beam` (which merges an already-truncated beam), this
    operates on the full post-cutoff candidate set like the reference
    (`tnac4o/tnac4o.py:481-526`: cutoff -> merge -> top-M), so losing merge
    members beyond the beam width still produce droplet records.

    Returns (slot, rep, prob_out, Eng_out, out_valid, disc):
      slot (C,) i32   output slot [0, M) each candidate merged into, -1 if
                      its group was dropped or the candidate is invalid,
      rep (M,) i32    candidate index of each slot's representative,
      prob_out/Eng_out/out_valid (M,)  the new beam payload,
      disc            largest group log2-prob discarded by the top-M cut.
    """
    C = Eng.shape[0]
    keys = pack_keys(vind, bits) + [jnp.where(valid, 0, 1).astype(jnp.int32)]
    perm = jnp.lexsort(tuple(reversed(keys)))
    vs, Es, ps, vls = vind[perm], Eng[perm], prob[perm], valid[perm]
    neq = jnp.any(vs[1:] != vs[:-1], axis=1) | (vls[1:] != vls[:-1])
    seg = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                           jnp.cumsum(neq).astype(jnp.int32)])
    big = jnp.asarray(jnp.finfo(Es.dtype).max, Es.dtype)
    Emin = jax.ops.segment_min(jnp.where(vls, Es, big), seg, num_segments=C)
    is_min = (Es == Emin[seg]) & vls
    pos = jnp.arange(C, dtype=jnp.int32)
    first_min = jax.ops.segment_min(jnp.where(is_min, pos, C), seg,
                                    num_segments=C)
    group_valid = first_min < C
    rep_sorted = jnp.clip(first_min, 0, C - 1)
    near = ((Es - Emin[seg]) <= min_dEng) & vls
    n_near = jax.ops.segment_sum(near.astype(Es.dtype), seg, num_segments=C)
    prob_mean = jax.ops.segment_sum(jnp.where(near, ps, 0.0), seg,
                                    num_segments=C) / jnp.maximum(n_near, 1)
    gprob = jnp.where(group_valid, prob_mean, NEG)

    k = min(M + 1, C)
    gvals, gidx = lax.top_k(gprob, k)
    disc = jnp.where(k > M, gvals[min(M, k - 1)], NEG)
    gvals, gidx = gvals[:M], gidx[:M]
    out_valid = gvals > NEG / 2
    rep = perm[rep_sorted[gidx]]
    slot_of_seg = jnp.full((C,), -1, jnp.int32).at[gidx].set(
        jnp.arange(M, dtype=jnp.int32))
    slot_sorted = jnp.where(vls, slot_of_seg[seg], -1)
    slot = jnp.full((C,), -1, jnp.int32).at[perm].set(slot_sorted)
    Eng_out = jnp.where(out_valid, Emin[gidx], 0.0)
    prob_out = jnp.where(out_valid, gvals, NEG)
    return slot, rep, prob_out, Eng_out, out_valid, disc


# ---------------------------------------------------------------------------
# device-resident row step
# ---------------------------------------------------------------------------

def row_step(beam, row, *, M, Nx, bits, min_dEng, log2_cutoff, axis=None,
             beam_shards=1):
    """Process one full lattice row of the beam search on device.

    beam: dict with
      RL (M, D), vind (M, Nx+1) i32, states (M, L) i32, Eng (M,),
      prob (M,), deg (M,) i32, valid (M,) bool, aidx (M,) i32.
    row: dict with per-row stacked site arrays
      lB (Nx, Np, lh, lv) log-Boltzmann, drindex (Nx, Np) i32, AT (Nx, D, lv, D),
      RRs (Nx, M, D, lh)   (row-start right envs, replicated),
      Es (Nx, Np), Esl (Nx, Np, lh), Esu (Nx, Np, lv)  (raw energies),
      dmap/rmap (Nx, Np) i32, nvalid (Nx,) i32, cols (Nx,) i32 state column.

    With ``axis`` set (inside shard_map over the beam axis), each shard
    holds M_local = M/n branches; global cutoff and beam re-formation use
    pmax/all_gather.
    """
    Np = row["lB"].shape[1]

    def site(carry, xs):
        RL, vind, states, Eng, prob, deg, valid, aidx = carry
        (nx, lB, drindex, AT, Es_t, Esl_t, Esu_t, dmap, rmap, nvalid,
         col) = xs
        Ml = RL.shape[0]

        RRsel = row["RRs"][nx][aidx]   # RRs replicated over the beam axis
        lidx = vind[:, nx]
        uidx = vind[:, nx + 1]
        Pn, mPn = engine.marginal_step(lB, drindex, AT, RL, RRsel, lidx,
                                       uidx, nvalid)
        logP = jnp.where(Pn > 0, jnp.log2(jnp.where(Pn > 0, Pn, 1.0)), NEG)
        probf = jnp.where(valid[:, None], prob[:, None] + logP, NEG)
        probf = probf.reshape(Ml * Np)

        pmax = jnp.max(probf)
        if axis is not None:
            pmax = lax.pmax(pmax, axis)
        cutoff = pmax + log2_cutoff

        # local top-M candidates
        k = min(M, probf.shape[0])
        vals, idx = lax.top_k(probf, k)
        src, indc = idx // Np, (idx % Np).astype(jnp.int32)
        cand = dict(
            prob=vals, vind=vind[src], deg=deg[src], states=states[src],
            Eng=Eng[src], aidx=aidx[src], RL=RL[src], indc=indc,
            valid=valid[src] & (vals > cutoff) & (vals > NEG / 2),
        )
        if axis is not None:
            # replicate all candidates, keep the global top-M
            cand = {kk: lax.all_gather(vv, axis, tiled=True)
                    for kk, vv in cand.items()}
            _, gidx = lax.top_k(cand["prob"], M)
            cand = {kk: vv[gidx] for kk, vv in cand.items()}
        # the best branch always survives, even below cutoff
        # (reference keep = max(count, 1), tnac4o/tnac4o.py:460)
        cand["valid"] = cand["valid"].at[0].set(cand["prob"][0] > NEG / 2)

        # bookkeeping on the (replicated) M candidates
        vind_n, states_n, ic = cand["vind"], cand["states"], cand["indc"]
        rows_ = jnp.arange(M)
        Eng_n = cand["Eng"] + Es_t[ic] + Esl_t[ic, vind_n[:, nx]] \
            + Esu_t[ic, vind_n[:, nx + 1]]
        states_n = states_n.at[rows_, col].set(ic)
        vind_n = vind_n.at[rows_, nx].set(dmap[ic])
        vind_n = vind_n.at[rows_, nx + 1].set(rmap[ic])

        probm, Engm, degm, parent, validm = merge_beam(
            vind_n, Eng_n, cand["prob"], cand["deg"], cand["valid"],
            min_dEng, bits)
        vind_m = vind_n[parent]
        states_m = states_n[parent]
        aidx_m = cand["aidx"][parent]
        RL_m = cand["RL"][parent]
        didx = vind_m[:, nx]

        if axis is not None:
            # keep this shard's slice of the merged beam
            Ml_out = M // beam_shards
            sl = lax.axis_index(axis) * Ml_out

            def slice_local(x):
                return lax.dynamic_slice_in_dim(x, sl, Ml_out, axis=0)

            RL_m, vind_m, states_m, Engm, probm, degm, validm, aidx_m, \
                didx = map(slice_local, (RL_m, vind_m, states_m, Engm,
                                         probm, degm, validm, aidx_m, didx))

        RL_new = engine.rl_update(RL_m, AT, didx)
        # negativeness flag only from live branches — padded slots carry
        # junk environments whose marginals would pollute the diagnostic
        mq = jnp.min(jnp.where(valid, mPn, 0.0))
        return (RL_new, vind_m, states_m, Engm, probm, degm, validm,
                aidx_m), mq

    xs = (jnp.arange(Nx, dtype=jnp.int32), row["lB"], row["drindex"],
          row["AT"], row["Es"], row["Esl"], row["Esu"], row["dmap"],
          row["rmap"], row["nvalid"], row["cols"])
    carry = (beam["RL"], beam["vind"], beam["states"], beam["Eng"],
             beam["prob"], beam["deg"], beam["valid"], beam["aidx"])
    carry, mPns = lax.scan(site, carry, xs)
    RL, vind, states, Eng, prob, deg, valid, aidx = carry
    # shift vind for the next row (reference tnac4o/tnac4o.py:540-542)
    vind = jnp.concatenate([jnp.zeros_like(vind[:, :1]), vind[:, :-1]],
                           axis=1)
    out = dict(RL=RL, vind=vind, states=states, Eng=Eng, prob=prob, deg=deg,
               valid=valid, aidx=aidx)
    return out, jnp.min(mPns)


@partial(jax.jit, static_argnames=("M", "Nx", "bits", "min_dEng",
                                   "log2_cutoff"))
def full_search_scan(beam0, grid_in, rhoT, Wt, *, M, Nx, bits, min_dEng,
                     log2_cutoff):
    """The ENTIRE ground-state search as one jitted program: lax.scan over
    lattice rows, each row computing its right environments and running
    :func:`row_step`'s site scan. One device dispatch per search.

    grid_in: dict of (Ny, ...) stacked per-row arrays (lB, drindex, Es,
    Esl, Esu, dmap, rmap, nvalid, cols). rhoT (Ny+1, Nx, D, lv, D),
    Wt (Ny, Nx, lh, lv, lh, lv).
    """
    D = rhoT.shape[2]
    dtype = rhoT.dtype

    def one_row(beam, xs):
        AT_row, Wt_row, row_tabs = xs
        beam = dict(beam)
        beam["aidx"] = jnp.arange(M, dtype=jnp.int32)
        beam["RL"] = jnp.zeros((M, D), dtype).at[:, 0].set(1.0)
        RRs = engine.row_right_envs(AT_row, Wt_row,
                                    beam["vind"][:, 1:])
        row = dict(row_tabs, AT=AT_row, RRs=RRs)
        beam, mq = row_step(beam, row, M=M, Nx=Nx, bits=bits,
                            min_dEng=min_dEng, log2_cutoff=log2_cutoff)
        return beam, mq

    beam, mqs = lax.scan(one_row, beam0, (rhoT[1:], Wt, grid_in))
    return beam, jnp.min(mqs)


def _f32bits(x):
    return lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)


@partial(jax.jit, static_argnames=("M", "C", "Nx", "bits", "min_dEng",
                                   "log2_cutoff"))
def row_records_prog(beam, row_tabs, AT_row, Wt_row, *, M, C, Nx, bits,
                     min_dEng, log2_cutoff):
    """One lattice row of the search, emitting per-site decision records.

    The device makes every beam decision (cutoff, candidate cap C, merge by
    boundary-index vector, top-M) and returns, per site, a packed int32
    record of WHAT it decided: each candidate's parent beam slot, chosen
    block state, log2-probability and merge slot, plus each output slot's
    representative, probability and validity. The host replays exact float64
    energies, states, degeneracies and droplet trees from the records — one
    device->host pull per row instead of three crossings per site (each
    crossing costs ~50 ms over a tunneled accelerator link). This is the
    spectrum-mode analogue of :func:`full_search_scan`.

    Record layout per site (int32, width 4C + 3M + 4):
      [src(C) | indc(C) | slot(C) | rep(M) | prob-bits(C) |
       out_prob-bits(M) | out_valid(M) | count, disc_cut, disc_m, minP bits]
    float entries are f32 bit patterns.

    Returns (beam', records (Nx, 4C+3M+4) i32).
    """
    RRs = engine.row_right_envs(AT_row, Wt_row, beam["vind"][:, 1:])
    Np = row_tabs["lB"].shape[1]
    D = AT_row.shape[1]
    dtype = AT_row.dtype

    def site(carry, xs):
        RL, vind, Eng, prob, valid, aidx = carry
        (nx, lB, drindex, AT, Es_t, Esl_t, Esu_t, dmap, rmap, nvalid) = xs

        RRsel = RRs[nx][aidx]
        Pn, mPn = engine.marginal_step(lB, drindex, AT, RL, RRsel,
                                       vind[:, nx], vind[:, nx + 1], nvalid)
        logP = jnp.where(Pn > 0, jnp.log2(jnp.where(Pn > 0, Pn, 1.0)), NEG)
        probf = jnp.where(valid[:, None], prob[:, None] + logP, NEG)
        probf = probf.reshape(M * Np)
        pmax = jnp.max(probf)
        cutoff = pmax + log2_cutoff
        count = jnp.sum(probf > cutoff)

        k = min(C + 1, M * Np)
        vals, idx = lax.top_k(probf, k)
        # largest candidate discarded by the cutoff (or by the cap C) —
        # reference pd_max bookkeeping (tnac4o/tnac4o.py:456-465)
        kk = jnp.minimum(count, C)
        disc_cut = jnp.where(kk < M * Np,
                             vals[jnp.clip(kk, 0, k - 1)],
                             jnp.asarray(NEG, vals.dtype))
        vals_c, idx_c = vals[:C], idx[:C]
        src = (idx_c // Np).astype(jnp.int32)
        indc = (idx_c % Np).astype(jnp.int32)
        cvalid = valid[src] & (vals_c > cutoff) & (vals_c > NEG / 2)
        # the best branch always survives, even below cutoff
        # (reference keep = max(count, 1), tnac4o/tnac4o.py:460)
        cvalid = cvalid.at[0].set(vals_c[0] > NEG / 2)

        E_cand = Eng[src] + Es_t[indc] + Esl_t[indc, vind[src, nx]] \
            + Esu_t[indc, vind[src, nx + 1]]
        vind_cand = vind[src]
        rows_ = jnp.arange(C)
        vind_cand = vind_cand.at[rows_, nx].set(dmap[indc])
        vind_cand = vind_cand.at[rows_, nx + 1].set(rmap[indc])

        slot, rep, prob_out, Eng_out, out_valid, disc_m = merge_candidates(
            vind_cand, E_cand, vals_c, cvalid, min_dEng, bits, M)

        vind_new = vind_cand[rep]
        RL_new = engine.rl_update(RL[src[rep]], AT, vind_new[:, nx])
        aidx_new = aidx[src[rep]]
        minP = jnp.min(jnp.where(valid, mPn, 0.0))

        rec = jnp.concatenate([
            src, indc, slot, rep.astype(jnp.int32),
            _f32bits(vals_c), _f32bits(prob_out),
            out_valid.astype(jnp.int32),
            jnp.stack([count.astype(jnp.int32), _f32bits(disc_cut),
                       _f32bits(disc_m), _f32bits(minP)]),
        ])
        return (RL_new, vind_new, Eng_out, prob_out, out_valid,
                aidx_new), rec

    xs = (jnp.arange(Nx, dtype=jnp.int32), row_tabs["lB"],
          row_tabs["drindex"], AT_row, row_tabs["Es"], row_tabs["Esl"],
          row_tabs["Esu"], row_tabs["dmap"], row_tabs["rmap"],
          row_tabs["nvalid"])
    carry = (jnp.zeros((M, D), dtype).at[:, 0].set(1.0), beam["vind"],
             beam["Eng"], beam["prob"], beam["valid"],
             jnp.arange(M, dtype=jnp.int32))
    carry, recs = lax.scan(site, carry, xs)
    RL, vind, Eng, prob, valid, aidx = carry
    vind = jnp.concatenate([jnp.zeros_like(vind[:, :1]), vind[:, :-1]],
                           axis=1)
    out = dict(vind=vind, Eng=Eng, prob=prob, valid=valid)
    return out, recs


def _padded_energy_rows(ctx):
    """Raw (unshifted) energy tables padded to grid shapes, as device arrays."""
    import jax.numpy as jnp_
    g = ctx.grid
    Ny, Nx, Np, lh, lv = g.Ny, g.Nx, g.Np, g.lh, g.lv
    Es = np.zeros((Ny, Nx, Np))
    Esl = np.zeros((Ny, Nx, Np, lh))
    Esu = np.zeros((Ny, Nx, Np, lv))
    for ny in range(Ny):
        for nx in range(Nx):
            e, el, eu = ctx.energy_tables(ny, nx)
            n = len(e)
            Es[ny, nx, :n] = e
            Esl[ny, nx, :n, :el.shape[1]] = el
            Esu[ny, nx, :n, :eu.shape[1]] = eu
    d = ctx.dtype
    return (jnp_.asarray(Es, d), jnp_.asarray(Esl, d), jnp_.asarray(Esu, d))


@jax.jit
def _pack_result(beam, mq):
    """Final beam payload as ONE int32 array (f32 values bit-cast) — a
    single device->host pull instead of six (each pull costs ~50 ms over a
    tunneled accelerator link). Layout: [states(M*L) | Eng-bits(M) |
    prob-bits(M) | deg(M) | valid(M) | mq-bits(1)]."""
    return jnp.concatenate([
        beam["states"].reshape(-1),
        _f32bits(beam["Eng"]),
        _f32bits(beam["prob"]),
        beam["deg"].astype(jnp.int32),
        beam["valid"].astype(jnp.int32),
        _f32bits(jnp.reshape(mq, (1,))),
    ])


def _unpack_result(packed, M, L):
    packed = np.asarray(packed)
    states = packed[:M * L].reshape(M, L)
    Eng = packed[M * L:M * L + M].view(np.float32).astype(np.float64)
    prob = packed[M * L + M:M * L + 2 * M].view(np.float32) \
        .astype(np.float64)
    deg = packed[M * L + 2 * M:M * L + 3 * M]
    valid = packed[M * L + 3 * M:M * L + 4 * M].astype(bool)
    mq = float(packed[-1:].view(np.float32)[0])
    return states, Eng, prob, deg, valid, mq


def device_search_gs(ctx, M=2 ** 10, relative_P_cutoff=1e-6, min_dEng=1e-12,
                     Dmax=32, tolS=1e-16, tolV=1e-10, max_sweeps=20,
                     graduate_truncation=True, fused=True):
    """Fully device-resident ground-state search (throughput mode).

    Single-chip driver around :func:`row_step`: the beam never leaves the
    device; the host only steps the row loop. Energies accumulate in the
    compute dtype — use `tnax.search.search_ground_state` when 1e-12 energy
    ties must be resolved exactly.

    Returns dict(energy, states, prob, degeneracy, negative_probability).
    """
    if ctx.rhoT is None or ctx.Dmax != Dmax:
        ctx.build_boundary(Dmax, tolS, tolV, max_sweeps, graduate_truncation)
    Ny, Nx, Np, lh, lv = ctx.Ny, ctx.Nx, ctx.Np, ctx.lh, ctx.lv
    dtype = ctx.dtype
    D = ctx.Dmax
    bits = max(1, int(np.ceil(np.log2(max(lh, lv)))))
    log2_cutoff = float(np.log2(relative_P_cutoff)) \
        if relative_P_cutoff > 0 else NEG
    EsP, EslP, EsuP = _padded_energy_rows(ctx)
    nvalid = jnp.asarray(ctx.nstates, jnp.int32)
    cols = (jnp.arange(Ny, dtype=jnp.int32)[:, None] * Nx
            + jnp.arange(Nx, dtype=jnp.int32)[None, :])

    step = jax.jit(partial(row_step, M=M, Nx=Nx, bits=bits,
                           min_dEng=min_dEng, log2_cutoff=log2_cutoff))

    beam = dict(
        RL=jnp.zeros((M, D), dtype).at[:, 0].set(1.0),
        vind=jnp.zeros((M, Nx + 1), jnp.int32),
        states=jnp.zeros((M, Nx * Ny), jnp.int32),
        Eng=jnp.zeros((M,), dtype),
        prob=jnp.full((M,), NEG, dtype).at[0].set(0.0),
        deg=jnp.ones((M,), jnp.int32),
        valid=jnp.zeros((M,), bool).at[0].set(True),
        aidx=jnp.arange(M, dtype=jnp.int32),
    )
    if fused:
        grid_in = dict(lB=ctx.lB, drindex=ctx.drindex, Es=EsP, Esl=EslP,
                       Esu=EsuP, dmap=jnp.asarray(ctx.dmap),
                       rmap=jnp.asarray(ctx.rmap), nvalid=nvalid, cols=cols)
        beam, mq_dev = full_search_scan(beam, grid_in, ctx.rhoT, ctx.Wt,
                                        M=M, Nx=Nx, bits=bits,
                                        min_dEng=min_dEng,
                                        log2_cutoff=log2_cutoff)
    else:
        mqs = []
        for ny in range(Ny):
            beam["aidx"] = jnp.arange(M, dtype=jnp.int32)
            beam["RL"] = jnp.zeros((M, D), dtype).at[:, 0].set(1.0)
            RRs = engine.row_right_envs(ctx.rhoT[ny + 1], ctx.Wt[ny],
                                        beam["vind"][:, 1:])
            row = dict(lB=ctx.lB[ny], drindex=ctx.drindex[ny],
                       AT=ctx.rhoT[ny + 1], RRs=RRs, Es=EsP[ny],
                       Esl=EslP[ny], Esu=EsuP[ny],
                       dmap=jnp.asarray(ctx.dmap[ny]),
                       rmap=jnp.asarray(ctx.rmap[ny]), nvalid=nvalid[ny],
                       cols=cols[ny])
            beam, mq = step(beam, row)
            mqs.append(mq)  # no host sync inside the row loop
        mq_dev = jnp.min(jnp.stack(mqs))

    if ctx.dtype == jnp.float32:
        # one packed pull (Eng/prob are f32 on device anyway)
        states, Eng, prob, deg, valid, mq = _unpack_result(
            _pack_result(beam, mq_dev), M, Nx * Ny)
        globalmin = min(0.0, mq)
    else:
        valid = np.asarray(beam["valid"])
        Eng = np.asarray(beam["Eng"], dtype=np.float64)
        prob = np.asarray(beam["prob"], dtype=np.float64)
        deg = np.asarray(beam["deg"])
        states = np.asarray(beam["states"])
        globalmin = min(0.0, float(mq_dev))
    Eng = Eng[valid]
    prob = prob[valid]
    deg = deg[valid]
    states = states[valid]
    best = int(np.argmin(Eng))
    return dict(energy=Eng[best], states=states[best], prob=prob[best],
                degeneracy=int(deg[best]),
                negative_probability=min(globalmin, 0.0))


def exact_energies(ctx, states):
    """Exact float64 energies of block-state configurations, replayed on the
    host from the raw energy tables (states in the current rotation's snake
    order, shape (M, Ny*Nx))."""
    states = np.asarray(states)
    Ny, Nx = ctx.Ny, ctx.Nx
    Eng = np.zeros(states.shape[0])
    for ny in range(Ny):
        for nx in range(Nx):
            s = states[:, ny * Nx + nx]
            Es, Esl, Esu = ctx.energy_tables(ny, nx)
            lidx = ctx.rmap[ny, nx - 1][states[:, ny * Nx + nx - 1]] \
                if nx > 0 else np.zeros(len(s), np.int32)
            uidx = ctx.dmap[ny - 1, nx][states[:, (ny - 1) * Nx + nx]] \
                if ny > 0 else np.zeros(len(s), np.int32)
            Eng += Es[s] + Esl[s, lidx] + Esu[s, uidx]
    return Eng


def sample_rows(beam, row, key, *, M, Nx):
    """One lattice row of device-resident Gibbs sampling (reference
    `gibbs_sampling`, `tnac4o/tnac4o.py:553-650`): per-site conditional
    marginals for all M walkers, categorical draws via `jax.random`, as one
    jitted `lax.scan`. Walkers never reorder, so row-start right
    environments apply directly."""
    def site(carry, xs):
        RL, vind, states, key = carry
        (nx, lB, drindex, AT, dmap, rmap, nvalid, col) = xs
        RRsel = row["RRs"][nx]
        Pn, mPn = engine.marginal_step(lB, drindex, AT, RL, RRsel,
                                       vind[:, nx], vind[:, nx + 1], nvalid)
        cums = jnp.cumsum(Pn, axis=1)
        key, sub = jax.random.split(key)
        r = jax.random.uniform(sub, (M,), dtype=Pn.dtype)
        indc = jnp.clip(jnp.sum(cums < r[:, None], axis=1), 0,
                        nvalid - 1).astype(jnp.int32)
        rows_ = jnp.arange(M)
        states = states.at[rows_, col].set(indc)
        vind = vind.at[rows_, nx].set(dmap[indc])
        vind = vind.at[rows_, nx + 1].set(rmap[indc])
        RL = engine.rl_update(RL, AT, vind[:, nx])
        return (RL, vind, states, key), jnp.min(mPn)

    xs = (jnp.arange(Nx, dtype=jnp.int32), row["lB"], row["drindex"],
          row["AT"], row["dmap"], row["rmap"], row["nvalid"], row["cols"])
    carry = (beam["RL"], beam["vind"], beam["states"], key)
    (RL, vind, states, key), mPns = lax.scan(site, carry, xs)
    vind = jnp.concatenate([jnp.zeros_like(vind[:, :1]), vind[:, :-1]],
                           axis=1)
    return dict(RL=RL, vind=vind, states=states), key, jnp.min(mPns)


def device_sample(ctx, M=2 ** 10, Dmax=32, tolS=1e-15, tolV=1e-10,
                  max_sweeps=20, graduate_truncation=True, seed=0):
    """Fully device-resident Gibbs sampling (throughput mode).

    Returns dict(states, energy (exact f64, host-replayed),
    negative_probability)."""
    if ctx.rhoT is None or ctx.Dmax != Dmax:
        ctx.build_boundary(Dmax, tolS, tolV, max_sweeps, graduate_truncation)
    Ny, Nx = ctx.Ny, ctx.Nx
    dtype, D = ctx.dtype, ctx.Dmax
    step = jax.jit(partial(sample_rows, M=M, Nx=Nx))
    key = jax.random.PRNGKey(seed)
    beam = dict(RL=jnp.zeros((M, D), dtype).at[:, 0].set(1.0),
                vind=jnp.zeros((M, Nx + 1), jnp.int32),
                states=jnp.zeros((M, Nx * Ny), jnp.int32))
    cols = (jnp.arange(Ny, dtype=jnp.int32)[:, None] * Nx
            + jnp.arange(Nx, dtype=jnp.int32)[None, :])
    nvalid = jnp.asarray(ctx.nstates, jnp.int32)
    mqs = []
    for ny in range(Ny):
        beam["RL"] = jnp.zeros((M, D), dtype).at[:, 0].set(1.0)
        RRs = engine.row_right_envs(ctx.rhoT[ny + 1], ctx.Wt[ny],
                                    beam["vind"][:, 1:])
        row = dict(lB=ctx.lB[ny], drindex=ctx.drindex[ny],
                   AT=ctx.rhoT[ny + 1], RRs=RRs,
                   dmap=jnp.asarray(ctx.dmap[ny]),
                   rmap=jnp.asarray(ctx.rmap[ny]), nvalid=nvalid[ny],
                   cols=cols[ny])
        beam, key, mq = step(beam, row, key)
        mqs.append(mq)  # no host sync inside the row loop
    states = np.asarray(beam["states"])
    return dict(states=states, energy=exact_energies(ctx, states),
                negative_probability=min(0.0, float(jnp.min(jnp.stack(mqs)))))


def multi_search_gs(ctxs, M=2 ** 10, relative_P_cutoff=1e-6, min_dEng=1e-12,
                    Dmax=32, tolS=1e-16, tolV=1e-10, max_sweeps=20,
                    graduate_truncation=True, mesh=None):
    """Batched device-resident GS search over same-shape instances.

    The production fleet mode (BASELINE.md: 100 droplet instances x 4
    rotations): every stage — boundary-MPS stacks, row environments, the
    full beam row step — is vmapped over the instance axis so all QR/SVD and
    marginal matmuls batch onto the MXU. With ``mesh`` (axis 'data'),
    instances are sharded across devices (pure data parallelism; no
    collectives needed, SURVEY.md section 5.8).

    Returns a list of result dicts (same schema as device_search_gs).
    """
    assert ctxs, "need at least one context"
    c0 = ctxs[0]
    for c in ctxs:
        assert (c.Ny, c.Nx, c.Np, c.lh, c.lv) == \
            (c0.Ny, c0.Nx, c0.Np, c0.lh, c0.lv), "instances must share shapes"
    B = len(ctxs)
    Ny, Nx, Np, lh, lv = c0.Ny, c0.Nx, c0.Np, c0.lh, c0.lv
    dtype = c0.dtype
    D = Dmax
    bits = max(1, int(np.ceil(np.log2(max(lh, lv)))))
    log2_cutoff = float(np.log2(relative_P_cutoff)) \
        if relative_P_cutoff > 0 else NEG

    Wt = jnp.stack([c.Wt for c in ctxs])          # (B, Ny, Nx, ...)
    lB = jnp.stack([c.lB for c in ctxs])
    drindex = jnp.stack([c.drindex for c in ctxs])
    eng_rows = [_padded_energy_rows(c) for c in ctxs]
    EsP = jnp.stack([e[0] for e in eng_rows])
    EslP = jnp.stack([e[1] for e in eng_rows])
    EsuP = jnp.stack([e[2] for e in eng_rows])
    nvalid = jnp.stack([jnp.asarray(c.nstates, jnp.int32) for c in ctxs])
    cols = jnp.broadcast_to(
        (jnp.arange(Ny, dtype=jnp.int32)[:, None] * Nx
         + jnp.arange(Nx, dtype=jnp.int32)[None, :])[None], (B, Ny, Nx))

    shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding
        shard = NamedSharding(mesh, P("data"))
        Wt, lB, drindex, EsP, EslP, EsuP, nvalid, cols = (
            jax.device_put(x, shard)
            for x in (Wt, lB, drindex, EsP, EslP, EsuP, nvalid, cols))

    build = jax.vmap(lambda w: engine.build_rhoT(
        w, Dmax=Dmax, tolS=tolS, tolV=tolV, max_sweeps=max_sweeps,
        graduate=graduate_truncation))
    rhoT, _, _, _ = jax.jit(build)(Wt)            # (B, Ny+1, Nx, D, lv, D)

    step1 = partial(row_step, M=M, Nx=Nx, bits=bits, min_dEng=min_dEng,
                    log2_cutoff=log2_cutoff)
    stepB = jax.jit(jax.vmap(step1))
    envsB = jax.jit(jax.vmap(engine.row_right_envs))

    beam = dict(
        RL=jnp.zeros((B, M, D), dtype).at[:, :, 0].set(1.0),
        vind=jnp.zeros((B, M, Nx + 1), jnp.int32),
        states=jnp.zeros((B, M, Nx * Ny), jnp.int32),
        Eng=jnp.zeros((B, M), dtype),
        prob=jnp.full((B, M), NEG, dtype).at[:, 0].set(0.0),
        deg=jnp.ones((B, M), jnp.int32),
        valid=jnp.zeros((B, M), bool).at[:, 0].set(True),
        aidx=jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None], (B, M)),
    )
    if shard is not None:
        beam = {k: jax.device_put(v, shard) for k, v in beam.items()}
    mqs = []
    for ny in range(Ny):
        beam["aidx"] = jnp.broadcast_to(
            jnp.arange(M, dtype=jnp.int32)[None], (B, M))
        beam["RL"] = jnp.zeros((B, M, D), dtype).at[:, :, 0].set(1.0)
        RRs = envsB(rhoT[:, ny + 1], Wt[:, ny], beam["vind"][:, :, 1:])
        row = dict(lB=lB[:, ny], drindex=drindex[:, ny],
                   AT=rhoT[:, ny + 1], RRs=RRs, Es=EsP[:, ny],
                   Esl=EslP[:, ny], Esu=EsuP[:, ny],
                   dmap=jnp.stack([jnp.asarray(c.dmap[ny]) for c in ctxs]),
                   rmap=jnp.stack([jnp.asarray(c.rmap[ny]) for c in ctxs]),
                   nvalid=nvalid[:, ny], cols=cols[:, ny])
        beam, mq = stepB(beam, row)
        mqs.append(mq)  # no host sync inside the row loop

    globalmin = np.minimum(np.asarray(jnp.min(jnp.stack(mqs), axis=0),
                                      dtype=np.float64), 0.0)
    out = []
    valid = np.asarray(beam["valid"])
    Eng = np.asarray(beam["Eng"], dtype=np.float64)
    prob = np.asarray(beam["prob"], dtype=np.float64)
    deg = np.asarray(beam["deg"])
    states = np.asarray(beam["states"])
    for b in range(B):
        v = valid[b]
        best = int(np.argmin(np.where(v, Eng[b], np.inf)))
        out.append(dict(energy=Eng[b, best], states=states[b, best],
                        prob=prob[b, best], degeneracy=int(deg[b, best]),
                        negative_probability=float(globalmin[b])))
    return out


# ---------------------------------------------------------------------------
# multi-chip wrappers
# ---------------------------------------------------------------------------

def make_mesh(n_data, n_beam, devices=None):
    devices = np.array(devices if devices is not None else jax.devices())
    if devices.size < n_data * n_beam:
        raise ValueError(
            f"make_mesh needs {n_data}x{n_beam}={n_data * n_beam} devices "
            f"but jax.devices() has only {devices.size} "
            f"({[str(d) for d in devices.ravel()]}); for a virtual CPU mesh "
            f"set JAX_PLATFORMS=cpu and XLA_FLAGS="
            f"--xla_force_host_platform_device_count={n_data * n_beam} "
            f"before JAX initializes")
    return Mesh(devices[: n_data * n_beam].reshape(n_data, n_beam),
                axis_names=("data", "beam"))


def sharded_row_step(mesh, *, M, Nx, bits, min_dEng, log2_cutoff):
    """jit-compiled row step over a ('data','beam') mesh.

    Beam state arrays carry a leading instance axis sharded over 'data' and
    an M axis sharded over 'beam'; row tensors are sharded over 'data' and
    replicated over 'beam'.
    """
    n_beam = mesh.shape["beam"]
    beam_specs = dict(RL=P("data", "beam"), vind=P("data", "beam"),
                      states=P("data", "beam"), Eng=P("data", "beam"),
                      prob=P("data", "beam"), deg=P("data", "beam"),
                      valid=P("data", "beam"), aidx=P("data", "beam"))
    row_specs = dict(lB=P("data"), drindex=P("data"), AT=P("data"),
                     RRs=P("data"), Es=P("data"), Esl=P("data"),
                     Esu=P("data"), dmap=P("data"), rmap=P("data"),
                     nvalid=P("data"), cols=P("data"))

    def one_instance(beam, row):
        return row_step(beam, row, M=M, Nx=Nx, bits=bits,
                        min_dEng=min_dEng, log2_cutoff=log2_cutoff,
                        axis="beam", beam_shards=n_beam)

    @partial(shard_map, mesh=mesh, in_specs=(beam_specs, row_specs),
             out_specs=(beam_specs, P("data")), check_vma=False)
    def step(beam, row):
        # strip the per-shard instance axis (size B/n_data) via vmap
        out, mq = jax.vmap(one_instance)(beam, row)
        return out, mq

    return jax.jit(step)
