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
branch-and-bound search (marginals, cutoff, merge-by-boundary-index via
lexicographic sort + segment reductions over the expanded candidate set,
then top-M — the reference's order, `tnac4o/tnac4o.py:481-526`) as one
jitted `lax.scan` — the throughput-mode alternative to the
host-orchestrated `tnax.search.search_ground_state`. One documented
deviation from the host/reference path: energies accumulate in the
compute dtype (f32 on TPU). The candidate set entering the merge is
capped at a static size (default ``8*M``, configurable up to the full
``M*Np`` expansion); searches where more candidates survive the relative
cutoff raise an ``overflow`` flag in the returned diagnostics so callers
can retry with a larger cap.

Degeneracy counting on device uses base-2^12 multi-limb int32 arrays
(:func:`deg_ones` / :func:`deg_decode`): measured chimera degeneracies
already exceed 2^30 (J124 C16: 1,371,340,800) and ensembles overflow
int32, while jax's int64 is unavailable with x64 disabled (the TPU
compute mode). Five limbs give exact counts to 2^60 (measured ensembles
reach 2^43); the host paths use plain int64 (`tnax/search.py`).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax.sharding import PartitionSpec as P_
from jax import shard_map

from . import engine

NEG = -1e30  # effectively -inf log2 probability

# --- multi-limb degeneracy counters (exact beyond int32 without x64) -------
DEG_LIMBS = 5   # 5 x 12 bits = exact to 2^60 (measured ensembles reach 2^43)
DEG_BITS = 12
DEG_MASK = (1 << DEG_BITS) - 1


def deg_ones(shape):
    """All-ones degeneracy counters of batch ``shape`` as int32 limbs."""
    return jnp.zeros(tuple(shape) + (DEG_LIMBS,), jnp.int32) \
        .at[..., 0].set(1)


def deg_decode(limbs):
    """Host decode of (..., DEG_LIMBS) int32 limbs to int64 counts."""
    limbs = np.asarray(limbs).astype(np.int64)
    shifts = (np.int64(1) << (DEG_BITS * np.arange(DEG_LIMBS,
                                                   dtype=np.int64)))
    return (limbs * shifts).sum(axis=-1)


def deg_encode(vals):
    """Host encode of int64 counts into (..., DEG_LIMBS) int32 limbs."""
    vals = np.asarray(vals, dtype=np.int64)
    limbs = np.zeros(vals.shape + (DEG_LIMBS,), np.int32)
    v = vals.copy()
    for i in range(DEG_LIMBS):
        limbs[..., i] = v & DEG_MASK
        v >>= DEG_BITS
    return limbs


def _deg_seg_sum(deg, near, seg, C):
    """Segment-sum of degeneracy limbs over merge groups, exact for any
    static candidate count C: limbs are < 2^12 each, so a single int32
    segment-sum is exact only while C <= 2^19; beyond that each limb is
    split into 6-bit halves summed separately (partial sums < C * 2^6 —
    exact to C = 2^25, far past the largest expansion M=16384 x Np=256 =
    2^22) and carry-propagated in base 2^6 during recombination, so no
    intermediate exceeds int32 while the true total fits int64."""
    masked = jnp.where(near[:, None], deg, 0)
    if C <= (1 << (31 - DEG_BITS)):
        return jax.ops.segment_sum(masked, seg, num_segments=C)
    lo = jax.ops.segment_sum(masked & 0x3F, seg, num_segments=C)
    hi = jax.ops.segment_sum(masked >> 6, seg, num_segments=C)
    outs = []
    carry = jnp.zeros(lo.shape[:-1], lo.dtype)
    for i in range(DEG_LIMBS):
        s0 = lo[..., i] + carry
        d0 = s0 & 0x3F
        carry = s0 >> 6
        s1 = hi[..., i] + carry
        if i < DEG_LIMBS - 1:
            d1 = s1 & 0x3F
            carry = s1 >> 6
        else:
            d1 = s1      # top limb keeps the remainder (int64 decode)
        outs.append(d0 | (d1 << 6))
    return jnp.stack(outs, axis=-1)


def _deg_carry(limbs):
    """Propagate carries after a limb-wise sum (each limb < 2^31; exact
    because :func:`_deg_seg_sum` bounds the incoming limb sums)."""
    outs = []
    carry = jnp.zeros(limbs.shape[:-1], limbs.dtype)
    for i in range(DEG_LIMBS - 1):
        s = limbs[..., i] + carry
        outs.append(s & DEG_MASK)
        carry = s >> DEG_BITS
    outs.append(limbs[..., -1] + carry)
    return jnp.stack(outs, axis=-1)


# ---------------------------------------------------------------------------
# device-side merge by boundary-index vector
# ---------------------------------------------------------------------------

def pack_keys(vind, bits):
    """Pack (M, C) small-int rows into int32 grouping keys.

    Only row EQUALITY matters downstream (equal rows must sort adjacent
    for the segment reductions), so the packing uses the full 32 bits per
    key — a wrapped sign bit permutes the sort order but keeps the
    packing injective, which is all grouping needs. Fewer keys = fewer
    stable sort passes inside `jnp.lexsort`."""
    M, C = vind.shape
    per = max(1, 32 // bits)
    keys = []
    for lo in range(0, C, per):
        cols = vind[:, lo:lo + per].astype(jnp.int32)
        k = jnp.zeros((M,), dtype=jnp.int32)
        for c in range(cols.shape[1]):
            k = (k << bits) | cols[:, c]
        keys.append(k)
    return keys


def merge_candidates(vind, Eng, prob, valid, min_dEng, bits, M, deg=None,
                     key1=None):
    """Merge C expanded candidates by ``vind`` and keep the top-M groups.

    Device analogue of `tnax.search.merge_by_vind` in the reference's order
    (`tnac4o/tnac4o.py:481-526`: cutoff -> merge over the full candidate set
    -> top-M): lexicographic sort + segment reductions; the minimum-energy
    member represents each group, degeneracies of members within
    ``min_dEng`` of the minimum are summed, their log2-probabilities
    averaged. Invalid candidates sort into a trailing group and never join
    a slot.

    ``key1`` (C,) i32, if given, is an injective single-key encoding of
    (vind row, validity) — candidates are equal-groupable iff their keys
    are equal (see :func:`row_step`'s parent-group construction). One
    stable sort pass then replaces the multi-key lexsort, and the
    group-boundary test is one int compare instead of a row compare.

    Returns (slot, rep, prob_out, Eng_out, out_valid, disc, deg_out):
      slot (C,) i32   output slot [0, M) each candidate merged into, -1 if
                      its group was dropped or the candidate is invalid,
      rep (M,) i32    candidate index of each slot's representative,
      prob_out/Eng_out/out_valid (M,)  the new beam payload,
      disc            largest group log2-prob discarded by the top-M cut,
      deg_out (M, DEG_LIMBS) summed degeneracy limbs (None if ``deg`` is).
    """
    C = Eng.shape[0]
    if key1 is not None:
        perm = jnp.argsort(key1, stable=True)
        Es, ps, vls = Eng[perm], prob[perm], valid[perm]
        ks = key1[perm]
        neq = ks[1:] != ks[:-1]
    else:
        vcol = jnp.where(valid, 0, 1).astype(vind.dtype)[:, None]
        keys = pack_keys(jnp.concatenate([vind, vcol], axis=1), bits)
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
    deg_out = None
    if deg is not None:
        deg_seg = _deg_carry(_deg_seg_sum(deg[perm], near, seg, C))
        deg_out = jnp.where(out_valid[:, None], deg_seg[gidx], 0)
    return slot, rep, prob_out, Eng_out, out_valid, disc, deg_out


# ---------------------------------------------------------------------------
# device-resident row step
# ---------------------------------------------------------------------------

def row_step(beam, row, *, M, Nx, bits, min_dEng, log2_cutoff, cand=None,
             axis=None, beam_shards=1, select="topk"):
    """Process one full lattice row of the beam search on device.

    beam: dict with
      RL (M, D), vind (M, Nx+1) i32, states (M, L) i32, Eng (M,),
      prob (M,), deg (M, DEG_LIMBS) i32, valid (M,) bool, aidx (M,) i32.
    row: dict with per-row stacked site arrays
      lB (Nx, Np, lh, lv) log-Boltzmann, drindex (Nx, Np) i32, AT (Nx, D, lv, D),
      RRs (Nx, M, D, lh)   (row-start right envs, replicated),
      Es (Nx, Np), Esl (Nx, Np, lh), Esu (Nx, Np, lv)  (raw energies),
      dmap/rmap (Nx, Np) i32, nvalid (Nx,) i32, cols (Nx,) i32 state column.

    Per site: relative cutoff -> merge by ``vind`` over the top-``cand``
    candidate set -> top-M groups, matching the reference's order
    (`tnac4o/tnac4o.py:481-526`). ``cand=None`` means the full ``M*Np``
    expansion (uncapped exact merge — the drivers' cand_factor=None);
    when more candidates survive the cutoff than fit a finite cap, the
    returned ``ovf`` diagnostic counts the affected sites.

    With ``axis`` set (inside shard_map over the beam axis), each shard
    holds M_local = M/n branches; global cutoff and beam re-formation use
    pmax/all_gather.

    Returns (beam', aux) with aux = dict(mq=min negativeness, pd=largest
    discarded log2-prob, ovf=#sites whose post-cutoff candidate count
    exceeded ``cand``, cmax=max per-site post-cutoff candidate count —
    the smallest exact cap for this instance/beam, so a caller can size
    ``cand`` for a retry or safely shrink it for speed).
    """
    Np = row["lB"].shape[1]
    # cand=None = the full M*Np expansion (uncapped exact merge) — the
    # drivers' documented cand_factor=None semantics; the GS drivers pass
    # an explicit cand_factor*M otherwise (default 8*M)
    C_total = min(cand if cand is not None else M * Np, M * Np)
    if axis is not None:
        C_local = min(max(1, C_total // beam_shards), (M // beam_shards) * Np)
        C_total = C_local * beam_shards
    else:
        C_local = C_total

    def site(carry, xs):
        RL, vind, states, Eng, prob, deg, valid, aidx = carry
        (nx, lB, drindex, AT, Es_t, Esl_t, Esu_t, dmap, rmap, nvalid,
         col) = xs
        Ml = RL.shape[0]

        RRsel = row["RRs"][nx][aidx]   # RRs replicated over the beam axis
        lidx = vind[:, nx]
        uidx = vind[:, nx + 1]
        # dense per-branch energy-increment table: Einc[m, p] = Eng[m] +
        # Es[p] + Esl[p, lidx_m] + Esu[p, uidx_m]. The leg-energy picks
        # run as one-hot GEMMs (exact: one unit weight per row) so the
        # post-selection E_cand is ONE flat gather instead of four
        # computed-index scalar gathers — 0.55 -> 0.15 ms/site measured
        # (results/r4_rowenv_probe.jsonl). Addition order matches the
        # former per-candidate form bit-for-bit.
        onehot_l = jax.nn.one_hot(lidx, Esl_t.shape[1], dtype=Es_t.dtype)
        onehot_u = jax.nn.one_hot(uidx, Esu_t.shape[1], dtype=Es_t.dtype)
        Einc = ((Eng[:, None] + Es_t[None, :])
                + jnp.matmul(onehot_l, Esl_t.T)) \
            + jnp.matmul(onehot_u, Esu_t.T)
        Pn, mPn = engine.marginal_step(lB, drindex, AT, RL, RRsel, lidx,
                                       uidx, nvalid)
        logP = jnp.where(Pn > 0, jnp.log2(jnp.where(Pn > 0, Pn, 1.0)), NEG)
        probf2d = jnp.where(valid[:, None], prob[:, None] + logP, NEG)
        probf = probf2d.reshape(Ml * Np)

        pmax = jnp.max(probf)
        if axis is not None:
            pmax = lax.pmax(pmax, axis)
        cutoff = pmax + log2_cutoff
        # truncation happens per shard at C_local, so the cap diagnostics
        # (overflow flag + first-casualty probability) must gate on the
        # LOCAL survivor count — the global count can sit below C_total
        # while one shard still drops real candidates

        if select == "compact":
            # two-stage selection of the post-cutoff survivor set: a
            # cheap batched per-branch sort over the Np-wide rows, then a
            # sort-free global assembly (cumsum + binary search) —
            # replacing the O(N log N) top-k over the full M*Np
            # expansion (the round-2 profile's dominant search-scan
            # cost; the merge re-sorts by boundary-index key, so global
            # survivor order is irrelevant). When more than C_local
            # survive, the kept subset is branch-major (prob-ordered
            # within a branch) rather than globally most-probable —
            # reachable only with the ovf flag raised, i.e. under the
            # existing exactness-retry contract.
            svals, sidx = lax.top_k(probf2d, Np)    # per-branch, desc
            live2 = svals > NEG / 2
            flag2 = (svals > cutoff) & live2
            # degenerate cutoffs (relative_P_cutoff >= 1): the best
            # branch always survives (reference keep = max(count, 1),
            # tnac4o/tnac4o.py:460)
            flag2 = flag2 | ((svals == pmax) & live2)
            count_local = jnp.sum(flag2)
            c_b = jnp.sum(flag2, axis=1)            # survivors per branch
            offs = jnp.cumsum(c_b)                  # inclusive
            offs_excl = offs - c_b
            j = jnp.arange(C_local)
            b = jnp.clip(jnp.searchsorted(offs, j, side="right"),
                         0, Ml - 1).astype(jnp.int32)
            r = jnp.clip(j - offs_excl[b], 0, Np - 1).astype(jnp.int32)
            cvalid = j < jnp.minimum(count_local, C_local)
            vals_c = jnp.where(cvalid, svals[b, r], NEG)
            idx_c = jnp.where(cvalid, b * Np + sidx[b, r], 0)
            # largest candidate dropped by the cap (flagged survivors
            # past global position C_local) ...
            gpos = offs_excl[:, None] + jnp.cumsum(
                flag2.astype(jnp.int32), axis=1) - 1
            disc_cap = jnp.max(jnp.where(flag2 & (gpos >= C_local),
                                         svals, NEG))
            # ... and by the relative cutoff itself — the host path's
            # pd_max bookkeeping (expand_candidates; reference
            # tnac4o/tnac4o.py:456-465)
            disc_cut = jnp.max(jnp.where(live2 & ~flag2, svals, NEG))
            disc_cap = jnp.maximum(disc_cap, disc_cut)
        else:
            live = probf > NEG / 2
            flag = (probf > cutoff) & live
            count_local = jnp.sum(flag)
            # prob-ordered top-cand candidates (+1 to observe the first
            # casualty of the cap for the pd diagnostic)
            k = min(C_local + 1, Ml * Np)
            if select == "radix":
                # bit-identical to top_k (tests/test_selectk.py);
                # radix-threshold select instead of a partial sort —
                # round-4 perf candidate (tnax/selectk.py)
                from . import selectk
                vals, idx = selectk.top_k_radix(probf, k)
            else:
                vals, idx = lax.top_k(probf, k)
            disc_cap = jnp.asarray(NEG, vals.dtype)
            if C_local < Ml * Np:
                disc_cap = jnp.where(count_local > C_local,
                                     vals[min(C_local, k - 1)], disc_cap)
            disc_cut = jnp.where(
                count_local < Ml * Np,
                vals[jnp.clip(count_local, 0, k - 1)],
                jnp.asarray(NEG, vals.dtype))
            disc_cap = jnp.maximum(disc_cap, disc_cut)
            vals_c, idx_c = vals[:C_local], idx[:C_local]
            cvalid = valid[(idx_c // Np).astype(jnp.int32)] \
                & (vals_c > cutoff) & (vals_c > NEG / 2)
            # the best branch always survives, even below cutoff
            # (reference keep = max(count, 1), tnac4o/tnac4o.py:460)
            cvalid = cvalid | ((vals_c == pmax) & (vals_c > NEG / 2))
        src = (idx_c // Np).astype(jnp.int32)
        indc = (idx_c % Np).astype(jnp.int32)

        rowsC = jnp.arange(C_local)
        E_cand = Einc.reshape(Ml * Np)[idx_c]
        vind_c = vind[src]
        vind_c = vind_c.at[rowsC, nx].set(dmap[indc])
        vind_c = vind_c.at[rowsC, nx + 1].set(rmap[indc])

        rows_ = jnp.arange(M)
        if axis is None:
            # single-key merge grouping: candidates share a vind row iff
            # (parent group outside the two replaced columns, dmap, rmap)
            # coincide — parents are already vind-unique, so their group
            # ids over the masked columns cost one lexsort of M rows
            # (8x smaller than the candidate set), and the candidate
            # sort collapses to ONE stable int32 pass
            key1 = None
            kb = (Ml - 1).bit_length() + 2 * bits + 1
            if kb <= 31:
                vind_p = vind.at[:, nx].set(0).at[:, nx + 1].set(0)
                keys_p = pack_keys(vind_p, bits)
                perm_p = jnp.lexsort(tuple(reversed(keys_p)))
                vp = vind_p[perm_p]
                neq_p = jnp.any(vp[1:] != vp[:-1], axis=1)
                seg_p = jnp.concatenate(
                    [jnp.zeros((1,), jnp.int32),
                     jnp.cumsum(neq_p).astype(jnp.int32)])
                gid = jnp.zeros((Ml,), jnp.int32).at[perm_p].set(seg_p)
                key1 = ((gid[src] << (2 * bits + 1))
                        | (dmap[indc].astype(jnp.int32) << (bits + 1))
                        | (rmap[indc].astype(jnp.int32) << 1)
                        | (1 - cvalid.astype(jnp.int32)))
            slot, rep, prob_out, Eng_out, out_valid, disc_m, deg_out = \
                merge_candidates(vind_c, E_cand, vals_c, cvalid, min_dEng,
                                 bits, M, deg=deg[src], key1=key1)
            bsrc = src[rep]
            vind_m = vind_c[rep]
            states_m = states[bsrc].at[rows_, col].set(indc[rep])
            aidx_m = aidx[bsrc]
            RL_m = RL[bsrc]
        else:
            payload = dict(
                prob=vals_c, E=E_cand, vind=vind_c, deg=deg[src],
                valid=cvalid, aidx=aidx[src], RL=RL[src],
                states=states[src].at[rowsC, col].set(indc))
            payload = {kk: lax.all_gather(vv, axis, tiled=True)
                       for kk, vv in payload.items()}
            slot, rep, prob_out, Eng_out, out_valid, disc_m, deg_out = \
                merge_candidates(payload["vind"], payload["E"],
                                 payload["prob"], payload["valid"],
                                 min_dEng, bits, M, deg=payload["deg"])
            vind_m = payload["vind"][rep]
            states_m = payload["states"][rep]
            aidx_m = payload["aidx"][rep]
            RL_m = payload["RL"][rep]
        Engm, probm, degm, validm = Eng_out, prob_out, deg_out, out_valid
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
        # ... and restricted to branches within the cutoff window for the
        # informative statistic (tail branches below the f32 boundary noise
        # floor saturate mq at -1; see engine.expand_topk)
        bmax = jnp.max(jnp.where(valid, prob, NEG))
        if axis is not None:
            bmax = lax.pmax(bmax, axis)
        core = valid & (prob > bmax + log2_cutoff)
        mqc = jnp.min(jnp.where(core, mPn, 0.0))
        pd = jnp.maximum(disc_cap, disc_m)
        # a site overflows if ANY shard truncated post-cutoff candidates
        ovf = count_local > C_local
        cnt = count_local.astype(jnp.int32)
        if axis is not None:
            ovf = lax.pmax(ovf.astype(jnp.int32), axis) > 0
            cnt = lax.psum(cnt, axis)
        return (RL_new, vind_m, states_m, Engm, probm, degm, validm,
                aidx_m), (mq, mqc, pd, ovf, cnt)

    xs = (jnp.arange(Nx, dtype=jnp.int32), row["lB"], row["drindex"],
          row["AT"], row["Es"], row["Esl"], row["Esu"], row["dmap"],
          row["rmap"], row["nvalid"], row["cols"])
    carry = (beam["RL"], beam["vind"], beam["states"], beam["Eng"],
             beam["prob"], beam["deg"], beam["valid"], beam["aidx"])
    carry, (mPns, mqcs, pds, ovfs, cnts) = lax.scan(site, carry, xs)
    RL, vind, states, Eng, prob, deg, valid, aidx = carry
    # shift vind for the next row (reference tnac4o/tnac4o.py:540-542)
    vind = jnp.concatenate([jnp.zeros_like(vind[:, :1]), vind[:, :-1]],
                           axis=1)
    out = dict(RL=RL, vind=vind, states=states, Eng=Eng, prob=prob, deg=deg,
               valid=valid, aidx=aidx)
    mq, mqc, pd = jnp.min(mPns), jnp.min(mqcs), jnp.max(pds)
    if axis is not None:
        # marginals/cap diagnostics are per-shard; reduce across the beam
        mq = lax.pmin(mq, axis)
        mqc = lax.pmin(mqc, axis)
        pd = lax.pmax(pd, axis)
    aux = dict(mq=mq, mqc=mqc, pd=pd, ovf=jnp.sum(ovfs.astype(jnp.int32)),
               cmax=jnp.max(cnts))
    return out, aux


@partial(jax.jit, static_argnames=("M", "Nx", "bits", "min_dEng",
                                   "log2_cutoff", "cand", "select"))
def full_search_scan(beam0, grid_in, rhoT, Wt, *, M, Nx, bits, min_dEng,
                     log2_cutoff, cand=None, select="topk"):
    """The ENTIRE ground-state search as one jitted program: lax.scan over
    lattice rows, each row computing its right environments and running
    :func:`row_step`'s site scan. One device dispatch per search.

    grid_in: dict of (Ny, ...) stacked per-row arrays (lB, drindex, Es,
    Esl, Esu, dmap, rmap, nvalid, cols). rhoT (Ny+1, Nx, D, lv, D),
    Wt (Ny, Nx, lh, lv, lh, lv).

    Returns (beam, aux) with aux = dict(mq, mqc, pd, ovf, cmax) reduced
    over rows.
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
        beam, aux = row_step(beam, row, M=M, Nx=Nx, bits=bits,
                             min_dEng=min_dEng, log2_cutoff=log2_cutoff,
                             cand=cand, select=select)
        return beam, aux

    beam, auxs = lax.scan(one_row, beam0, (rhoT[1:], Wt, grid_in))
    aux = dict(mq=jnp.min(auxs["mq"]), mqc=jnp.min(auxs["mqc"]),
               pd=jnp.max(auxs["pd"]), ovf=jnp.sum(auxs["ovf"]),
               cmax=jnp.max(auxs["cmax"]))
    return beam, aux


def _f32bits(x):
    return lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)


@partial(jax.jit, static_argnames=("M", "C", "Nx", "bits", "min_dEng",
                                   "log2_cutoff", "P", "select"))
def row_records_prog(beam, row_tabs, AT_row, Wt_row, *, M, C, Nx, bits,
                     min_dEng, log2_cutoff, P=None, select="topk"):
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

    ``P`` (pull cap, default C) compacts the record: candidates are
    stably sorted so the merged ones (slot >= 0) form a slot-ordered
    prefix, and only the first P entries ship to the host. The record
    transfer dominates the complete-tree mode's wall-clock over a
    tunneled link (~26 MB/s measured), and typically only a few x M of
    the C candidates merge into kept slots, so P << C loses nothing;
    n_valid is in the record so the host can detect P-overflow exactly
    (same retry contract as the merge cap).

    Record layout per site (int32, width 4P + 3M + 6):
      [src(P) | indc(P) | slot(P) | rep(M) | prob-bits(P) |
       out_prob-bits(M) | out_valid(M) | n_valid, count, disc_cut,
       disc_m, minP, minP_core bits]
    float entries are f32 bit patterns; the prefix is sorted by slot with
    the within-slot order preserving the global probability order (what
    the host's former stable argsort produced).

    Returns (beam', records (Nx, 4P+3M+6) i32).
    """
    RRs = engine.row_right_envs(AT_row, Wt_row, beam["vind"][:, 1:])
    return _records_row_core(beam, row_tabs, RRs, AT_row, M=M, C=C, Nx=Nx,
                             bits=bits, min_dEng=min_dEng,
                             log2_cutoff=log2_cutoff, P=P, select=select)


def _records_row_core(beam, row_tabs, RRs, AT_row, *, M, C, Nx, bits,
                      min_dEng, log2_cutoff, P=None, axis=None,
                      beam_shards=1, select="topk"):
    """Site scan of :func:`row_records_prog`, optionally sharded over the
    beam mesh axis (``axis`` set, inside shard_map): each shard holds
    M/n branches, takes its local top-C/n candidates, and the merge +
    record construction run replicated after an `all_gather` — the
    collective pattern of :func:`row_step`. ``RRs`` must be replicated
    over the beam axis (it is indexed by global row-start branch ids)."""
    Np = row_tabs["lB"].shape[1]
    D = AT_row.shape[1]
    dtype = AT_row.dtype
    Pc = C if P is None else min(P, C)
    if axis is not None:
        Ml = M // beam_shards
        Cl = max(1, C // beam_shards)
        base = lax.axis_index(axis) * Ml
    else:
        Ml, Cl = M, C
        base = 0

    def site(carry, xs):
        RL, vind, Eng, prob, valid, aidx = carry
        (nx, lB, drindex, AT, Es_t, Esl_t, Esu_t, dmap, rmap, nvalid) = xs

        RRsel = RRs[nx][aidx]
        lidx = vind[:, nx]
        uidx = vind[:, nx + 1]
        # dense per-branch energy-increment table (one-hot GEMMs + ONE
        # flat gather post-selection) — same rewrite as row_step, where it
        # measured 0.55 -> 0.15 ms/site (results/r4_rowenv_probe.jsonl);
        # at the complete-tree caps (C = 64*M) the four computed-index
        # scalar gathers it replaces are 8x wider than the GS path's
        Einc = ((Eng[:, None] + Es_t[None, :])
                + jnp.matmul(jax.nn.one_hot(lidx, Esl_t.shape[1],
                                            dtype=Es_t.dtype), Esl_t.T)) \
            + jnp.matmul(jax.nn.one_hot(uidx, Esu_t.shape[1],
                                        dtype=Es_t.dtype), Esu_t.T)
        Pn, mPn = engine.marginal_step(lB, drindex, AT, RL, RRsel,
                                       lidx, uidx, nvalid)
        logP = jnp.where(Pn > 0, jnp.log2(jnp.where(Pn > 0, Pn, 1.0)), NEG)
        probf2d = jnp.where(valid[:, None], prob[:, None] + logP, NEG)
        probf = probf2d.reshape(Ml * Np)
        pmax = jnp.max(probf)
        if axis is not None:
            pmax = lax.pmax(pmax, axis)
        cutoff = pmax + log2_cutoff

        if select == "compact" and axis is None:
            # per-branch row top-k + cumsum/searchsorted assembly of the
            # survivor set (see row_step) — at the large caps of the
            # complete-tree retries (C >> 16*M) the global prob-ordered
            # top_k is a full sort with a huge k and dominates the
            # device phase (measured 42.9 s vs 2.7 s at L2048)
            svals, sidx = lax.top_k(probf2d, Np)
            live2 = svals > NEG / 2
            flag2 = ((svals > cutoff) | (svals == pmax)) & live2
            count_local = jnp.sum(flag2)
            count = count_local
            c_b = jnp.sum(flag2, axis=1)
            offs = jnp.cumsum(c_b)
            offs_excl = offs - c_b
            j = jnp.arange(Cl)
            b = jnp.clip(jnp.searchsorted(offs, j, side="right"),
                         0, Ml - 1).astype(jnp.int32)
            r = jnp.clip(j - offs_excl[b], 0, Np - 1).astype(jnp.int32)
            cvalid = j < jnp.minimum(count_local, Cl)
            vals_c = jnp.where(cvalid, svals[b, r], NEG)
            idx_c = jnp.where(cvalid, b * Np + sidx[b, r], 0)
            gpos = offs_excl[:, None] + jnp.cumsum(
                flag2.astype(jnp.int32), axis=1) - 1
            disc_cut = jnp.maximum(
                jnp.max(jnp.where(flag2 & (gpos >= Cl), svals, NEG)),
                jnp.max(jnp.where(live2 & ~flag2, svals, NEG)))
        else:
            count_local = jnp.sum(probf > cutoff)
            count = count_local
            if axis is not None:
                count = lax.psum(count_local, axis)
                # a shard that truncated post-cutoff candidates at its
                # local cap must flag the site even when the global count
                # fits C
                any_trunc = lax.pmax((count_local > Cl).astype(jnp.int32),
                                     axis) > 0
                count = jnp.where(any_trunc, jnp.maximum(count, C + 1),
                                  count)

            if select == "sort":
                # full descending stable sort instead of top_k: identical
                # selection + tie-break (lax.sort is stable, so equal
                # probs come out in index order, matching top_k); at
                # large caps (e.g. C16's k=32769) TPU top_k degenerates
                # toward a full sort anyway — this skips its partial-
                # selection overhead
                k = Ml * Np
                neg, idx = lax.sort_key_val(
                    -probf, jnp.arange(k, dtype=jnp.int32))
                vals = -neg
            elif select == "radix":
                from . import selectk
                k = min(Cl + 1, Ml * Np)
                vals, idx = selectk.top_k_radix(probf, k)
            else:
                k = min(Cl + 1, Ml * Np)
                vals, idx = lax.top_k(probf, k)
            # largest candidate discarded by the cutoff (or by the cap) —
            # reference pd_max bookkeeping (tnac4o/tnac4o.py:456-465)
            kk = jnp.minimum(count_local, Cl)
            disc_cut = jnp.where(kk < Ml * Np,
                                 vals[jnp.clip(kk, 0, k - 1)],
                                 jnp.asarray(NEG, vals.dtype))
            if axis is not None:
                disc_cut = lax.pmax(disc_cut, axis)
            vals_c, idx_c = vals[:Cl], idx[:Cl]
        src_l = (idx_c // Np).astype(jnp.int32)
        indc = (idx_c % Np).astype(jnp.int32)
        if not (select == "compact" and axis is None):
            cvalid = valid[src_l] & (vals_c > cutoff) & (vals_c > NEG / 2)
            # the best branch always survives, even below cutoff
            # (reference keep = max(count, 1), tnac4o/tnac4o.py:460)
            cvalid = cvalid | ((vals_c == pmax) & (vals_c > NEG / 2))

        E_cand = Einc.reshape(Ml * Np)[idx_c]
        vind_cand = vind[src_l]
        rows_ = jnp.arange(Cl)
        vind_cand = vind_cand.at[rows_, nx].set(dmap[indc])
        vind_cand = vind_cand.at[rows_, nx + 1].set(rmap[indc])
        src = base + src_l                  # global branch ids (record)
        RL_c = RL[src_l]
        aidx_c = aidx[src_l]
        if axis is not None:
            gather = lambda x: lax.all_gather(x, axis, tiled=True)
            vals_c, indc, src, E_cand, vind_cand, cvalid, RL_c, aidx_c = \
                map(gather, (vals_c, indc, src, E_cand, vind_cand, cvalid,
                             RL_c, aidx_c))

        key1 = None
        if axis is None:
            # single-key merge grouping via parent group ids — identical
            # construction (and identical grouping/representative choice;
            # both sorts are stable over equal keys) to row_step's, but at
            # the records path's complete-tree caps the candidate set is
            # up to 8x wider, so collapsing the 3-pass row lexsort to ONE
            # int32 sort pass matters more here
            kb = (Ml - 1).bit_length() + 2 * bits + 1
            if kb <= 31:
                vind_p = vind.at[:, nx].set(0).at[:, nx + 1].set(0)
                keys_p = pack_keys(vind_p, bits)
                perm_p = jnp.lexsort(tuple(reversed(keys_p)))
                vp = vind_p[perm_p]
                neq_p = jnp.any(vp[1:] != vp[:-1], axis=1)
                seg_p = jnp.concatenate(
                    [jnp.zeros((1,), jnp.int32),
                     jnp.cumsum(neq_p).astype(jnp.int32)])
                gid = jnp.zeros((Ml,), jnp.int32).at[perm_p].set(seg_p)
                key1 = ((gid[src_l] << (2 * bits + 1))
                        | (dmap[indc].astype(jnp.int32) << (bits + 1))
                        | (rmap[indc].astype(jnp.int32) << 1)
                        | (1 - cvalid.astype(jnp.int32)))
        slot, rep, prob_out, Eng_out, out_valid, disc_m, _ = \
            merge_candidates(vind_cand, E_cand, vals_c, cvalid, min_dEng,
                             bits, M, key1=key1)

        vind_new = vind_cand[rep]
        RL_new = engine.rl_update(RL_c[rep], AT, vind_new[:, nx])
        aidx_new = aidx_c[rep]
        minP = jnp.min(jnp.where(valid, mPn, 0.0))
        bmax = jnp.max(jnp.where(valid, prob, NEG))
        if axis is not None:
            bmax = lax.pmax(bmax, axis)
        core = valid & (prob > bmax + log2_cutoff)
        minP_core = jnp.min(jnp.where(core, mPn, 0.0))
        if axis is not None:
            minP = lax.pmin(minP, axis)
            minP_core = lax.pmin(minP_core, axis)

        # compact: merged candidates (slot >= 0) first, ordered by slot;
        # jnp.argsort is stable, so within a slot the original candidate
        # order is preserved. rep is remapped into compacted coordinates
        # so the host indexes the P-arrays directly.
        n_valid = jnp.sum(slot >= 0)
        take_full = jnp.argsort(jnp.where(slot >= 0, slot, C))
        take = take_full[:Pc]
        invtake = jnp.zeros((C,), jnp.int32).at[take_full].set(
            jnp.arange(C, dtype=jnp.int32))
        # clamp inside the pulled prefix: a rep beyond it can only occur
        # when n_valid > P, which flags the record for the exactness retry
        rep_c = jnp.clip(jnp.where(out_valid, invtake[rep], 0),
                         0, Pc - 1).astype(jnp.int32)
        rec = jnp.concatenate([
            src[take], indc[take], slot[take], rep_c,
            _f32bits(vals_c[take]), _f32bits(prob_out),
            out_valid.astype(jnp.int32),
            jnp.stack([n_valid.astype(jnp.int32),
                       count.astype(jnp.int32), _f32bits(disc_cut),
                       _f32bits(disc_m), _f32bits(minP),
                       _f32bits(minP_core)]),
        ])
        if axis is not None:
            # keep this shard's slice of the merged beam
            def slice_local(x):
                return lax.dynamic_slice_in_dim(x, base, Ml, axis=0)
            RL_new, vind_new, Eng_out, prob_out, out_valid, aidx_new = map(
                slice_local, (RL_new, vind_new, Eng_out, prob_out,
                              out_valid, aidx_new))
        return (RL_new, vind_new, Eng_out, prob_out, out_valid,
                aidx_new), rec

    xs = (jnp.arange(Nx, dtype=jnp.int32), row_tabs["lB"],
          row_tabs["drindex"], AT_row, row_tabs["Es"], row_tabs["Esl"],
          row_tabs["Esu"], row_tabs["dmap"], row_tabs["rmap"],
          row_tabs["nvalid"])
    carry = (jnp.zeros((Ml, D), dtype).at[:, 0].set(1.0), beam["vind"],
             beam["Eng"], beam["prob"], beam["valid"],
             base + jnp.arange(Ml, dtype=jnp.int32))
    carry, recs = lax.scan(site, carry, xs)
    RL, vind, Eng, prob, valid, aidx = carry
    vind = jnp.concatenate([jnp.zeros_like(vind[:, :1]), vind[:, :-1]],
                           axis=1)
    out = dict(vind=vind, Eng=Eng, prob=prob, valid=valid)
    return out, recs


def sharded_row_records(mesh, *, M, C, Nx, bits, min_dEng, log2_cutoff,
                        P=None):
    """jit-compiled :func:`row_records_prog` over a mesh 'beam' axis: beam
    state shards over branches, merge + record construction replicate
    after per-site all_gathers, and the emitted records are identical on
    every shard (the host replay is unchanged). New design — VERDICT r2
    next-round task 9."""
    n_beam = mesh.shape["beam"]
    beam_specs = dict(vind=P_("beam"), Eng=P_("beam"), prob=P_("beam"),
                      valid=P_("beam"))

    @partial(shard_map, mesh=mesh,
             in_specs=(beam_specs, P_(), P_(), P_()),
             out_specs=(beam_specs, P_()), check_vma=False)
    def step(beam, row_tabs, RRs, AT_row):
        return _records_row_core(beam, row_tabs, RRs, AT_row, M=M, C=C,
                                 Nx=Nx, bits=bits, min_dEng=min_dEng,
                                 log2_cutoff=log2_cutoff, P=P,
                                 axis="beam", beam_shards=n_beam)

    return jax.jit(step)


def _padded_energy_rows(ctx):
    """Raw (unshifted) energy tables padded to grid shapes, as device
    arrays. Cached on the context: the tables depend only on the problem
    (not beta/gauges), and both the padding loop and the upload are
    worth skipping on repeat searches over the same context."""
    cached = getattr(ctx, "_energy_rows_cache", None)
    if cached is not None:
        return cached
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
    out = (jnp_.asarray(Es, d), jnp_.asarray(Esl, d), jnp_.asarray(Esu, d))
    ctx._energy_rows_cache = out
    return out


@jax.jit
def _pack_result(beam, aux):
    """Final beam payload as ONE int32 array (f32 values bit-cast) — a
    single device->host pull instead of six (each pull costs ~50 ms over a
    tunneled accelerator link). Layout: [states(M*L) | Eng-bits(M) |
    prob-bits(M) | deg-limbs(M*DEG_LIMBS) | valid(M) |
    mq-bits, mqc-bits, pd-bits, ovf, cmax (5)]."""
    return jnp.concatenate([
        beam["states"].reshape(-1),
        _f32bits(beam["Eng"]),
        _f32bits(beam["prob"]),
        beam["deg"].astype(jnp.int32).reshape(-1),
        beam["valid"].astype(jnp.int32),
        _f32bits(jnp.reshape(aux["mq"], (1,))),
        _f32bits(jnp.reshape(aux["mqc"], (1,))),
        _f32bits(jnp.reshape(aux["pd"], (1,))),
        jnp.reshape(aux["ovf"], (1,)).astype(jnp.int32),
        jnp.reshape(aux["cmax"], (1,)).astype(jnp.int32),
    ])


def _unpack_result(packed, M, L):
    packed = np.asarray(packed)
    states = packed[:M * L].reshape(M, L)
    o = M * L
    Eng = packed[o:o + M].view(np.float32).astype(np.float64)
    prob = packed[o + M:o + 2 * M].view(np.float32).astype(np.float64)
    deg = deg_decode(
        packed[o + 2 * M:o + (2 + DEG_LIMBS) * M].reshape(M, DEG_LIMBS))
    valid = packed[o + (2 + DEG_LIMBS) * M:
                   o + (3 + DEG_LIMBS) * M].astype(bool)
    mq = float(packed[-5:-4].view(np.float32)[0])
    mqc = float(packed[-4:-3].view(np.float32)[0])
    pd = float(packed[-3:-2].view(np.float32)[0])
    ovf = int(packed[-2])
    cmax = int(packed[-1])
    return states, Eng, prob, deg, valid, mq, mqc, pd, ovf, cmax


def device_search_gs(ctx, M=2 ** 10, relative_P_cutoff=1e-6, min_dEng=1e-12,
                     Dmax=32, tolS=1e-16, tolV=1e-10, max_sweeps=20,
                     graduate_truncation=True, fused=True, cand_factor=8,
                     select="topk", zipup_rsvd=None):
    """Fully device-resident ground-state search (throughput mode).

    Single-chip driver around :func:`row_step`: the beam never leaves the
    device; the host only steps the row loop. Energies accumulate in the
    compute dtype — use `tnax.search.search_ground_state` when 1e-12 energy
    ties must be resolved exactly.

    ``cand_factor`` sizes the per-site merge candidate set at
    ``cand_factor*M`` (None = the full ``M*Np`` expansion, exact reference
    semantics at higher sort cost). The result's ``merge_overflow`` counts
    sites where the post-cutoff candidate count exceeded the cap (0 means
    the merge was exact).

    Returns dict(energy, states, prob, degeneracy, negative_probability,
    discarded_probability, merge_overflow, count_max) — ``count_max`` is
    the max per-site post-cutoff candidate count, i.e. the smallest cap
    that keeps this search exact (see :func:`row_step`).
    """
    if ctx.rhoT is None or ctx.Dmax != Dmax:
        ctx.build_boundary(Dmax, tolS, tolV, max_sweeps,
                           graduate_truncation, rsvd=zipup_rsvd)
    Ny, Nx, Np, lh, lv = ctx.Ny, ctx.Nx, ctx.Np, ctx.lh, ctx.lv
    dtype = ctx.dtype
    D = ctx.Dmax
    bits = max(1, int(np.ceil(np.log2(max(lh, lv)))))
    log2_cutoff = float(np.log2(relative_P_cutoff)) \
        if relative_P_cutoff > 0 else NEG
    cand = None if cand_factor is None else int(cand_factor) * M
    EsP, EslP, EsuP = _padded_energy_rows(ctx)
    nvalid = jnp.asarray(ctx.nstates, jnp.int32)
    cols = (jnp.arange(Ny, dtype=jnp.int32)[:, None] * Nx
            + jnp.arange(Nx, dtype=jnp.int32)[None, :])

    step = jax.jit(partial(row_step, M=M, Nx=Nx, bits=bits,
                           min_dEng=min_dEng, log2_cutoff=log2_cutoff,
                           cand=cand, select=select))

    beam = dict(
        RL=jnp.zeros((M, D), dtype).at[:, 0].set(1.0),
        vind=jnp.zeros((M, Nx + 1), jnp.int32),
        states=jnp.zeros((M, Nx * Ny), jnp.int32),
        Eng=jnp.zeros((M,), dtype),
        prob=jnp.full((M,), NEG, dtype).at[0].set(0.0),
        deg=deg_ones((M,)),
        valid=jnp.zeros((M,), bool).at[0].set(True),
        aidx=jnp.arange(M, dtype=jnp.int32),
    )
    if fused:
        grid_in = dict(lB=ctx.lB, drindex=ctx.drindex, Es=EsP, Esl=EslP,
                       Esu=EsuP, dmap=jnp.asarray(ctx.dmap),
                       rmap=jnp.asarray(ctx.rmap), nvalid=nvalid, cols=cols)
        beam, aux_dev = full_search_scan(beam, grid_in, ctx.rhoT, ctx.Wt,
                                         M=M, Nx=Nx, bits=bits,
                                         min_dEng=min_dEng,
                                         log2_cutoff=log2_cutoff, cand=cand,
                                         select=select)
    else:
        auxs = []
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
            beam, aux = step(beam, row)
            auxs.append(aux)  # no host sync inside the row loop
        aux_dev = dict(mq=jnp.min(jnp.stack([a["mq"] for a in auxs])),
                       mqc=jnp.min(jnp.stack([a["mqc"] for a in auxs])),
                       pd=jnp.max(jnp.stack([a["pd"] for a in auxs])),
                       ovf=jnp.sum(jnp.stack([a["ovf"] for a in auxs])),
                       cmax=jnp.max(jnp.stack([a["cmax"] for a in auxs])))

    if ctx.dtype == jnp.float32:
        # one packed pull (Eng/prob are f32 on device anyway)
        states, Eng, prob, deg, valid, mq, mqc, pd, ovf, cmax = \
            _unpack_result(_pack_result(beam, aux_dev), M, Nx * Ny)
        globalmin = min(0.0, mq)
    else:
        valid = np.asarray(beam["valid"])
        Eng = np.asarray(beam["Eng"], dtype=np.float64)
        prob = np.asarray(beam["prob"], dtype=np.float64)
        deg = deg_decode(beam["deg"])
        states = np.asarray(beam["states"])
        globalmin = min(0.0, float(aux_dev["mq"]))
        mqc = float(aux_dev["mqc"])
        pd = float(aux_dev["pd"])
        ovf = int(aux_dev["ovf"])
        cmax = int(aux_dev["cmax"])
    Eng = Eng[valid]
    prob = prob[valid]
    deg = deg[valid]
    states = states[valid]
    best = int(np.argmin(Eng))
    return dict(energy=Eng[best], states=states[best], prob=prob[best],
                degeneracy=int(deg[best]),
                negative_probability=min(globalmin, 0.0),
                negative_probability_core=min(mqc, 0.0),
                discarded_probability=pd, merge_overflow=ovf,
                count_max=cmax)


def _flagship_body(Es, Esl, Esu, dmap, rmap, X0, betas, ndall, max_scale,
                   EsR, EslR, EsuR, nvalid, cols, beta, *, M, Nx, bits,
                   min_dEng, log2_cutoff, cand, select, Dmax, tolS, tolV,
                   max_sweeps, graduate, lh, lv, pre_Dmax, pre_sweeps,
                   pre_graduate, rsvd=None):
    """The ENTIRE single-instance flagship pipeline as one traceable
    function: balancing beta ladder (gauges), gauged Boltzmann/PEPS row
    tensors at the target beta, boundary-MPS stack, and the full beam
    search — one dispatch, one packed result pull. Removes every host
    round trip between the phases (each dispatch/pull over a tunneled
    accelerator link costs ~50 ms, and the separate-phase flagship paid
    several plus a gauge download/upload). Jitted single-instance as
    :func:`_flagship_prog`; vmapped over an instance batch in
    :func:`_fleet_flagship_prog`."""
    from . import precondition as pre
    dtype = Es.dtype
    X, _ = pre._ladder_program(Es, Esl, Esu, dmap, rmap, X0, betas, ndall,
                               max_scale, Dmax=pre_Dmax, tolS=tolS,
                               tolV=tolV, max_sweeps=pre_sweeps,
                               graduate=pre_graduate, lh=lh, lv=lv)
    lB, Wt = engine.peps_rows(Es, Esl, Esu, dmap, rmap, X["Xl"], X["Xr"],
                              X["Xu"], X["Xd"], beta, lh=lh, lv=lv)
    Ny = Wt.shape[0]
    drindex = (dmap * lh + rmap).astype(jnp.int32)
    grid_in = dict(lB=lB, drindex=drindex, Es=EsR, Esl=EslR, Esu=EsuR,
                   dmap=dmap, rmap=rmap, nvalid=nvalid, cols=cols)
    beam0 = dict(
        RL=jnp.zeros((M, Dmax), dtype).at[:, 0].set(1.0),
        vind=jnp.zeros((M, Nx + 1), jnp.int32),
        states=jnp.zeros((M, Nx * Ny), jnp.int32),
        Eng=jnp.zeros((M,), dtype),
        prob=jnp.full((M,), NEG, dtype).at[0].set(0.0),
        deg=deg_ones((M,)),
        valid=jnp.zeros((M,), bool).at[0].set(True),
        aidx=jnp.arange(M, dtype=jnp.int32),
    )
    rhoT, _, _, _ = engine.build_rhoT(Wt, Dmax=Dmax, tolS=tolS, tolV=tolV,
                                      max_sweeps=max_sweeps,
                                      graduate=graduate, rsvd=rsvd)
    beam, aux = full_search_scan(beam0, grid_in, rhoT, Wt, M=M, Nx=Nx,
                                 bits=bits, min_dEng=min_dEng,
                                 log2_cutoff=log2_cutoff, cand=cand,
                                 select=select)
    return _pack_result(beam, aux)


_FLAGSHIP_STATICS = ("M", "Nx", "bits", "min_dEng", "log2_cutoff", "cand",
                     "select", "Dmax", "tolS", "tolV", "max_sweeps",
                     "graduate", "lh", "lv", "pre_Dmax", "pre_sweeps",
                     "pre_graduate", "rsvd")

_flagship_prog = partial(jax.jit, static_argnames=_FLAGSHIP_STATICS)(
    _flagship_body)


@partial(jax.jit, static_argnames=_FLAGSHIP_STATICS)
def _fleet_flagship_prog(Es, Esl, Esu, dmap, rmap, X0, betas, ndall,
                         max_scale, EsR, EslR, EsuR, nvalid, cols, beta,
                         *, M, Nx, bits, min_dEng, log2_cutoff, cand,
                         select, Dmax, tolS, tolV, max_sweeps, graduate,
                         lh, lv, pre_Dmax, pre_sweeps, pre_graduate,
                         rsvd=None):
    """The flagship pipeline vmapped over an instance batch: ONE compile
    and ONE dispatch covers preconditioning ladder + PEPS rows + boundary
    stack + full beam search for B same-shape instances. This is the
    production fleet path — the previous fleet mode compiled TWO large
    programs (`precondition_fleet`'s vmapped ladder and
    `_fleet_search_prog`) and crossed the host between them; fusing
    halves the remote-compile cost and drops the gauge download/upload.
    `betas`/`max_scale`/`beta` are shared across the batch (in_axes
    None); everything else carries a leading instance axis."""
    body = partial(_flagship_body, M=M, Nx=Nx, bits=bits,
                   min_dEng=min_dEng, log2_cutoff=log2_cutoff, cand=cand,
                   select=select, Dmax=Dmax, tolS=tolS, tolV=tolV,
                   max_sweeps=max_sweeps, graduate=graduate, lh=lh, lv=lv,
                   pre_Dmax=pre_Dmax, pre_sweeps=pre_sweeps,
                   pre_graduate=pre_graduate, rsvd=rsvd)
    return jax.vmap(
        lambda Es_, Esl_, Esu_, dm_, rm_, X0_, nd_, EsR_, EslR_, EsuR_,
        nv_, co_: body(Es_, Esl_, Esu_, dm_, rm_, X0_, betas, nd_,
                       max_scale, EsR_, EslR_, EsuR_, nv_, co_, beta)
    )(Es, Esl, Esu, dmap, rmap, X0, ndall, EsR, EslR, EsuR, nvalid, cols)


def multi_flagship_search_gs(solvers, M=2 ** 10, relative_P_cutoff=1e-6,
                             min_dEng=1e-12, Dmax=32, tolS=1e-16,
                             tolV=1e-10, max_sweeps=2,
                             graduate_truncation=True, cand_factor=8,
                             select="topk", pre_steps=1, pre_Dmax=8,
                             pre_sweeps=20, max_scale=1024,
                             zipup_rsvd=None):
    """One-dispatch fleet GS search: the fused flagship pipeline
    (balancing ladder + boundary build + beam search,
    :func:`_flagship_body`) vmapped over a batch of same-shape Solver
    instances. Per-instance results match :func:`flagship_search_gs`
    bit-for-bit (vmap of the identical program). f32 compute dtype
    assumed (packed result pull).

    Returns a list of :func:`device_search_gs`-style result dicts.
    """
    from . import engine as eng
    from .config import compute_dtype
    assert solvers, "need at least one solver"
    dtype = compute_dtype()
    grids = [eng.pad_grid(ins.problem) for ins in solvers]
    g0 = grids[0]
    for g in grids:
        assert (g.Ny, g.Nx, g.Np, g.lh, g.lv) == \
            (g0.Ny, g0.Nx, g0.Np, g0.lh, g0.lv), \
            "fleet flagship needs same-shape instances"
    beta0 = solvers[0].beta
    for ins in solvers:
        assert ins.beta == beta0, "fleet flagship shares one beta"
    Ny, Nx, Np, lh, lv = g0.Ny, g0.Nx, g0.Np, g0.lh, g0.lv
    bits = max(1, int(np.ceil(np.log2(max(lh, lv)))))
    log2_cutoff = float(np.log2(relative_P_cutoff)) \
        if relative_P_cutoff > 0 else NEG
    cand = None if cand_factor is None else int(cand_factor) * M
    betas = jnp.asarray([beta0 * 2.0 ** (nn - pre_steps)
                         for nn in range(pre_steps)], dtype)
    ms = 2.0 ** np.floor(np.log2(np.sqrt(max_scale)))
    Es = jnp.stack([jnp.asarray(g.Es, dtype) for g in grids])
    Esl = jnp.stack([jnp.asarray(g.Esl, dtype) for g in grids])
    Esu = jnp.stack([jnp.asarray(g.Esu, dtype) for g in grids])
    dmap = jnp.stack([jnp.asarray(g.dmap) for g in grids])
    rmap = jnp.stack([jnp.asarray(g.rmap) for g in grids])
    X0 = {}
    for k, v in eng.identity_gauges(g0).items():
        X0[k] = jnp.broadcast_to(jnp.asarray(v, dtype)[None],
                                 (len(grids),) + v.shape)
    ndall = jnp.stack([jnp.asarray(ins.problem.ld[: Ny - 1], jnp.int32)
                       for ins in solvers])
    rows = [_padded_energy_rows_problem(ins.problem, dtype)
            for ins in solvers]
    EsR = jnp.stack([r[0] for r in rows])
    EslR = jnp.stack([r[1] for r in rows])
    EsuR = jnp.stack([r[2] for r in rows])
    nvalid = jnp.stack([jnp.asarray(g.nstates, jnp.int32) for g in grids])
    cols = jnp.broadcast_to(
        (jnp.arange(Ny, dtype=jnp.int32)[:, None] * Nx
         + jnp.arange(Nx, dtype=jnp.int32)[None, :])[None],
        (len(grids), Ny, Nx))
    packed = _fleet_flagship_prog(
        Es, Esl, Esu, dmap, rmap, X0, betas, ndall,
        jnp.asarray(ms, dtype), EsR, EslR, EsuR, nvalid, cols,
        jnp.asarray(beta0, dtype),
        M=M, Nx=Nx, bits=bits, min_dEng=min_dEng,
        log2_cutoff=log2_cutoff, cand=cand, select=select, Dmax=Dmax,
        tolS=tolS, tolV=tolV, max_sweeps=max_sweeps,
        graduate=graduate_truncation, lh=lh, lv=lv, pre_Dmax=pre_Dmax,
        pre_sweeps=pre_sweeps, pre_graduate=False, rsvd=zipup_rsvd)
    packed = np.asarray(packed)                             # ONE pull
    results = []
    for b in range(len(solvers)):
        states, Eng, prob, deg, valid, mq, mqc, pd, ovf, cmax = \
            _unpack_result(packed[b], M, Nx * Ny)
        best = int(np.argmin(np.where(valid, Eng, np.inf)))
        results.append(dict(energy=Eng[best], states=states[best],
                            prob=prob[best], degeneracy=int(deg[best]),
                            negative_probability=min(0.0, mq),
                            negative_probability_core=min(0.0, mqc),
                            discarded_probability=pd,
                            merge_overflow=int(ovf), count_max=cmax))
    return results


def flagship_search_gs(ins, M=2 ** 10, relative_P_cutoff=1e-6,
                       min_dEng=1e-12, Dmax=32, tolS=1e-16, tolV=1e-10,
                       max_sweeps=2, graduate_truncation=True,
                       cand_factor=8, select="topk", pre_steps=1,
                       pre_Dmax=8, pre_sweeps=20, max_scale=1024,
                       zipup_rsvd=None):
    """One-dispatch flagship GS search: balancing preconditioner ladder +
    boundary build + device beam search fused into a single program
    (:func:`_flagship_prog`). Same semantics as
    ``ins.precondition(mode='balancing'); device_search_gs(...)`` with the
    ladder's device path; f32 compute dtype assumed (packed result).

    ``pre_steps=1`` (a single balancing rung at beta/2) is the measured
    default for this throughput path: over 20 chimera-2048 instances it
    is oracle-neutral vs the reference's 2-rung ladder (15/20 vs 14/20
    rot=0 first-pass, same hair-trigger set) and ~0.5 s faster
    (results/r4_pre_ladder.jsonl). ``max_sweeps=2`` (boundary-build
    polish sweeps) is likewise measured: over the same 20 instances the
    rot=0 miss set is IDENTICAL to max_sweeps=20 at 1.93 vs 2.03 s
    median warm (results/r4_polish_study.jsonl; max_sweeps=1 drops to
    13/20 and pre_sweeps=1 shifts the miss set, so both stay).
    `Solver.precondition` keeps the reference default (steps=2,
    `tnac4o/tnac4o.py:342-379`) and the host/Solver boundary builds keep
    max_sweeps=20.

    Returns the :func:`device_search_gs` result dict.
    """
    from . import engine as eng
    from .config import compute_dtype
    dtype = compute_dtype()
    g = eng.pad_grid(ins.problem)
    Ny, Nx, Np, lh, lv = g.Ny, g.Nx, g.Np, g.lh, g.lv
    bits = max(1, int(np.ceil(np.log2(max(lh, lv)))))
    log2_cutoff = float(np.log2(relative_P_cutoff))         if relative_P_cutoff > 0 else NEG
    cand = None if cand_factor is None else int(cand_factor) * M
    betas = jnp.asarray([ins.beta * 2.0 ** (nn - pre_steps)
                         for nn in range(pre_steps)], dtype)
    ms = 2.0 ** np.floor(np.log2(np.sqrt(max_scale)))
    X0 = {k: jnp.asarray(v, dtype)
          for k, v in eng.identity_gauges(g).items()}
    ndall = jnp.asarray(ins.problem.ld[: Ny - 1], jnp.int32)
    EsR, EslR, EsuR = _padded_energy_rows_problem(ins.problem, dtype)
    nvalid = jnp.asarray(g.nstates, jnp.int32)
    cols = (jnp.arange(Ny, dtype=jnp.int32)[:, None] * Nx
            + jnp.arange(Nx, dtype=jnp.int32)[None, :])
    packed = _flagship_prog(
        jnp.asarray(g.Es, dtype), jnp.asarray(g.Esl, dtype),
        jnp.asarray(g.Esu, dtype), jnp.asarray(g.dmap),
        jnp.asarray(g.rmap), X0, betas, ndall, jnp.asarray(ms, dtype),
        EsR, EslR, EsuR, nvalid, cols, jnp.asarray(ins.beta, dtype),
        M=M, Nx=Nx, bits=bits, min_dEng=min_dEng,
        log2_cutoff=log2_cutoff, cand=cand, select=select, Dmax=Dmax,
        tolS=tolS, tolV=tolV, max_sweeps=max_sweeps,
        graduate=graduate_truncation, lh=lh, lv=lv, pre_Dmax=pre_Dmax,
        pre_sweeps=pre_sweeps, pre_graduate=False, rsvd=zipup_rsvd)
    states, Eng, prob, deg, valid, mq, mqc, pd, ovf, cmax = _unpack_result(
        np.asarray(packed), M, Nx * Ny)
    Eng, prob, deg, states = (Eng[valid], prob[valid], deg[valid],
                              states[valid])
    best = int(np.argmin(Eng))
    return dict(energy=Eng[best], states=states[best], prob=prob[best],
                degeneracy=int(deg[best]),
                negative_probability=min(0.0, mq),
                negative_probability_core=min(0.0, mqc),
                discarded_probability=pd, merge_overflow=int(ovf),
                count_max=cmax)


def _padded_energy_rows_problem(problem, dtype):
    """Raw (unshifted) energy tables padded to grid shapes, keyed on the
    problem (the context-level cache in :func:`_padded_energy_rows`
    rebuilds per context; the tables depend only on the problem)."""
    key = str(dtype)
    cached = getattr(problem, "_energy_rows_cache_p", None)
    if cached is not None and cached[0] == key:
        return cached[1]
    from . import engine as eng
    g = eng.pad_grid(problem)
    Ny, Nx, Np, lh, lv = g.Ny, g.Nx, g.Np, g.lh, g.lv
    Es = np.zeros((Ny, Nx, Np))
    Esl = np.zeros((Ny, Nx, Np, lh))
    Esu = np.zeros((Ny, Nx, Np, lv))
    for ny in range(Ny):
        for nx in range(Nx):
            t = problem.site(ny, nx)
            n = len(t.Es)
            Es[ny, nx, :n] = t.Es
            Esl[ny, nx, :n, :t.Esl.shape[1]] = t.Esl
            Esu[ny, nx, :n, :t.Esu.shape[1]] = t.Esu
    out = (jnp.asarray(Es, dtype), jnp.asarray(Esl, dtype),
           jnp.asarray(Esu, dtype))
    problem._energy_rows_cache_p = (key, out)
    return out


def exact_energies(ctx, states):
    """Exact float64 energies of block-state configurations, replayed on the
    host from the raw energy tables (states in the current rotation's snake
    order, shape (M, Ny*Nx))."""
    return exact_energies_problem(ctx.problem, states)


def exact_energies_problem(problem, states):
    """:func:`exact_energies` from the problem alone (host tables only —
    no ContractionContext, so no device tensor build)."""
    from . import engine as eng
    g = eng.pad_grid(problem)
    states = np.asarray(states)
    Ny, Nx = g.Ny, g.Nx
    Eng = np.zeros(states.shape[0])
    for ny in range(Ny):
        for nx in range(Nx):
            s = states[:, ny * Nx + nx]
            t = problem.site(ny, nx)
            lidx = g.rmap[ny, nx - 1][states[:, ny * Nx + nx - 1]] \
                if nx > 0 else np.zeros(len(s), np.int32)
            uidx = g.dmap[ny - 1, nx][states[:, (ny - 1) * Nx + nx]] \
                if ny > 0 else np.zeros(len(s), np.int32)
            Eng += t.Es[s] + t.Esl[s, lidx] + t.Esu[s, uidx]
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


@partial(jax.jit, static_argnames=("M", "Nx"))
def full_sample_scan(beam0, grid_in, rhoT, Wt, key, *, M, Nx):
    """The ENTIRE Gibbs sampling pass as one jitted program: lax.scan over
    lattice rows around :func:`sample_rows` (sampling analogue of
    :func:`full_search_scan`)."""
    D = rhoT.shape[2]
    dtype = rhoT.dtype

    def one_row(carry, xs):
        beam, key = carry
        AT_row, Wt_row, row_tabs = xs
        beam = dict(beam)
        beam["RL"] = jnp.zeros((M, D), dtype).at[:, 0].set(1.0)
        RRs = engine.row_right_envs(AT_row, Wt_row, beam["vind"][:, 1:])
        row = dict(row_tabs, AT=AT_row, RRs=RRs)
        beam, key, mq = sample_rows(beam, row, key, M=M, Nx=Nx)
        return (beam, key), mq

    (beam, key), mqs = lax.scan(one_row, (beam0, key),
                                (rhoT[1:], Wt, grid_in))
    return beam, jnp.min(mqs)


@partial(jax.jit, static_argnames=("M", "Nx", "Dmax", "tolS", "tolV",
                                   "max_sweeps", "graduate"))
def _fleet_sample_prog(beam0, grid_in, Wt, keys, *, M, Nx, Dmax, tolS,
                       tolV, max_sweeps, graduate):
    """Boundary build + full sampling scan for a whole instance batch as
    ONE jitted, vmapped program (sampling analogue of
    :func:`_fleet_search_prog`)."""
    def one(beam0_i, grid_i, Wt_i, key_i):
        rhoT, _, _, _ = engine.build_rhoT(
            Wt_i, Dmax=Dmax, tolS=tolS, tolV=tolV, max_sweeps=max_sweeps,
            graduate=graduate)
        return full_sample_scan(beam0_i, grid_i, rhoT, Wt_i, key_i,
                                M=M, Nx=Nx)
    return jax.vmap(one)(beam0, grid_in, Wt, keys)


def multi_sample(ctxs, M=2 ** 10, Dmax=32, tolS=1e-15, tolV=1e-10,
                 max_sweeps=20, graduate_truncation=True, seed=0):
    """Batched device-resident Gibbs sampling over same-shape instances
    (fleet sampling — the reference's production pattern of
    `examples/e02_sample_droplet_instances.py:23-27`, new batched design;
    closes the GS-only fleet scope of round 2).

    Each instance samples M independent walkers under its own PRNG
    stream (fold_in of ``seed`` by instance index). Returns a list of
    dicts (same schema as :func:`device_sample`).
    """
    assert ctxs, "need at least one context"
    c0 = ctxs[0]
    for c in ctxs:
        assert (c.Ny, c.Nx, c.Np, c.lh, c.lv) == \
            (c0.Ny, c0.Nx, c0.Np, c0.lh, c0.lv), "instances must share shapes"
    B = len(ctxs)
    Ny, Nx = c0.Ny, c0.Nx
    dtype, D = c0.dtype, Dmax

    Wt = jnp.stack([c.Wt for c in ctxs])
    lB = jnp.stack([c.lB for c in ctxs])
    drindex = jnp.stack([c.drindex for c in ctxs])
    nvalid = jnp.stack([jnp.asarray(c.nstates, jnp.int32) for c in ctxs])
    cols = jnp.broadcast_to(
        (jnp.arange(Ny, dtype=jnp.int32)[:, None] * Nx
         + jnp.arange(Nx, dtype=jnp.int32)[None, :])[None], (B, Ny, Nx))
    dmap = jnp.stack([jnp.asarray(c.dmap) for c in ctxs])
    rmap = jnp.stack([jnp.asarray(c.rmap) for c in ctxs])
    grid_in = dict(lB=lB, drindex=drindex, dmap=dmap, rmap=rmap,
                   nvalid=nvalid, cols=cols)
    beam0 = dict(RL=jnp.zeros((B, M, D), dtype).at[:, :, 0].set(1.0),
                 vind=jnp.zeros((B, M, Nx + 1), jnp.int32),
                 states=jnp.zeros((B, M, Nx * Ny), jnp.int32))
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(seed),
                                                 i))(jnp.arange(B))
    beam, mqs = _fleet_sample_prog(beam0, grid_in, Wt, keys, M=M, Nx=Nx,
                                   Dmax=Dmax, tolS=tolS, tolV=tolV,
                                   max_sweeps=max_sweeps,
                                   graduate=graduate_truncation)
    states = np.asarray(beam["states"])                 # one pull
    mqs = np.asarray(mqs, dtype=np.float64)
    return [dict(states=states[b],
                 energy=exact_energies(ctxs[b], states[b]),
                 negative_probability=min(0.0, float(mqs[b])))
            for b in range(B)]


def _flagship_sample_body(Es, Esl, Esu, dmap, rmap, X0, betas, ndall,
                          max_scale, nvalid, cols, beta, key, *, M, Nx,
                          Dmax, tolS, tolV, max_sweeps, graduate, lh, lv,
                          pre_Dmax, pre_sweeps, pre_graduate, rsvd=None):
    """The ENTIRE Gibbs-sampling pipeline as one traceable function
    (sampling analogue of :func:`_flagship_body`): balancing beta ladder,
    gauged PEPS row tensors, boundary-MPS stack, and the full M-walker
    sampling scan — one dispatch, one states pull. Matches the reference's
    ``precondition(); gibbs_sampling()`` sequence
    (`tnac4o/tnac4o.py:342-379,553-650`) with all phases fused."""
    from . import precondition as pre
    dtype = Es.dtype
    X, _ = pre._ladder_program(Es, Esl, Esu, dmap, rmap, X0, betas, ndall,
                               max_scale, Dmax=pre_Dmax, tolS=tolS,
                               tolV=tolV, max_sweeps=pre_sweeps,
                               graduate=pre_graduate, lh=lh, lv=lv)
    lB, Wt = engine.peps_rows(Es, Esl, Esu, dmap, rmap, X["Xl"], X["Xr"],
                              X["Xu"], X["Xd"], beta, lh=lh, lv=lv)
    Ny = Wt.shape[0]
    drindex = (dmap * lh + rmap).astype(jnp.int32)
    grid_in = dict(lB=lB, drindex=drindex, dmap=dmap, rmap=rmap,
                   nvalid=nvalid, cols=cols)
    rhoT, _, _, _ = engine.build_rhoT(Wt, Dmax=Dmax, tolS=tolS, tolV=tolV,
                                      max_sweeps=max_sweeps,
                                      graduate=graduate, rsvd=rsvd)
    beam0 = dict(RL=jnp.zeros((M, Dmax), dtype).at[:, 0].set(1.0),
                 vind=jnp.zeros((M, Nx + 1), jnp.int32),
                 states=jnp.zeros((M, Nx * Ny), jnp.int32))
    beam, mq = full_sample_scan(beam0, grid_in, rhoT, Wt, key, M=M, Nx=Nx)
    return beam["states"], mq


_SAMPLE_STATICS = ("M", "Nx", "Dmax", "tolS", "tolV", "max_sweeps",
                   "graduate", "lh", "lv", "pre_Dmax", "pre_sweeps",
                   "pre_graduate", "rsvd")

_flagship_sample_prog = partial(jax.jit, static_argnames=_SAMPLE_STATICS)(
    _flagship_sample_body)


@partial(jax.jit, static_argnames=_SAMPLE_STATICS)
def _fleet_flagship_sample_prog(Es, Esl, Esu, dmap, rmap, X0, betas, ndall,
                                max_scale, nvalid, cols, beta, keys, *, M,
                                Nx, Dmax, tolS, tolV, max_sweeps, graduate,
                                lh, lv, pre_Dmax, pre_sweeps, pre_graduate,
                                rsvd=None):
    """The fused sampling pipeline vmapped over an instance batch: ONE
    compile and ONE dispatch covers ladder + boundary + sampling scan for
    B same-shape instances (fleet analogue of
    :func:`_fleet_flagship_prog`)."""
    body = partial(_flagship_sample_body, M=M, Nx=Nx, Dmax=Dmax, tolS=tolS,
                   tolV=tolV, max_sweeps=max_sweeps, graduate=graduate,
                   lh=lh, lv=lv, pre_Dmax=pre_Dmax, pre_sweeps=pre_sweeps,
                   pre_graduate=pre_graduate, rsvd=rsvd)
    return jax.vmap(
        lambda Es_, Esl_, Esu_, dm_, rm_, X0_, nd_, nv_, co_, k_:
        body(Es_, Esl_, Esu_, dm_, rm_, X0_, betas, nd_, max_scale,
             nv_, co_, beta, k_)
    )(Es, Esl, Esu, dmap, rmap, X0, ndall, nvalid, cols, keys)


def _flagship_sample_inputs(ins, dtype, pre_steps, max_scale):
    """Shared host-side input prep for the fused sampling drivers (same
    layout as :func:`flagship_search_gs`)."""
    from . import engine as eng
    g = eng.pad_grid(ins.problem)
    betas = jnp.asarray([ins.beta * 2.0 ** (nn - pre_steps)
                         for nn in range(pre_steps)], dtype)
    ms = 2.0 ** np.floor(np.log2(np.sqrt(max_scale)))
    X0 = {k: jnp.asarray(v, dtype)
          for k, v in eng.identity_gauges(g).items()}
    ndall = jnp.asarray(ins.problem.ld[: g.Ny - 1], jnp.int32)
    nvalid = jnp.asarray(g.nstates, jnp.int32)
    cols = (jnp.arange(g.Ny, dtype=jnp.int32)[:, None] * g.Nx
            + jnp.arange(g.Nx, dtype=jnp.int32)[None, :])
    return g, betas, ms, X0, ndall, nvalid, cols


def flagship_sample(ins, M=2 ** 10, Dmax=32, tolS=1e-15, tolV=1e-10,
                    max_sweeps=20, graduate_truncation=True, seed=0,
                    pre_steps=1, pre_Dmax=8, pre_sweeps=20,
                    max_scale=1024, zipup_rsvd=None):
    """One-dispatch Gibbs sampling: balancing preconditioner ladder +
    boundary build + M-walker sampling scan fused into a single program
    (:func:`_flagship_sample_prog`). Same semantics as
    ``ins.precondition(mode='balancing'); device_sample(...)`` with the
    ladder's device path; the energies are exact f64 host replays of the
    sampled states, so the e02 consistency contract (reference
    `examples/test_examples.py:54-56`) holds by construction.

    Returns the :func:`device_sample` result dict.
    """
    from .config import compute_dtype
    dtype = compute_dtype()
    g, betas, ms, X0, ndall, nvalid, cols = _flagship_sample_inputs(
        ins, dtype, pre_steps, max_scale)
    states, mq = _flagship_sample_prog(
        jnp.asarray(g.Es, dtype), jnp.asarray(g.Esl, dtype),
        jnp.asarray(g.Esu, dtype), jnp.asarray(g.dmap),
        jnp.asarray(g.rmap), X0, betas, ndall, jnp.asarray(ms, dtype),
        nvalid, cols, jnp.asarray(ins.beta, dtype),
        jax.random.PRNGKey(seed),
        M=M, Nx=g.Nx, Dmax=Dmax, tolS=tolS, tolV=tolV,
        max_sweeps=max_sweeps, graduate=graduate_truncation, lh=g.lh,
        lv=g.lv, pre_Dmax=pre_Dmax, pre_sweeps=pre_sweeps,
        pre_graduate=False, rsvd=zipup_rsvd)
    states = np.asarray(states)                             # ONE pull
    return dict(states=states,
                energy=exact_energies_problem(ins.problem, states),
                negative_probability=min(0.0, float(mq)))


def multi_flagship_sample(solvers, M=2 ** 10, Dmax=32, tolS=1e-15,
                          tolV=1e-10, max_sweeps=20,
                          graduate_truncation=True, seed=0, pre_steps=1,
                          pre_Dmax=8, pre_sweeps=20, max_scale=1024,
                          zipup_rsvd=None, mesh=None):
    """One-dispatch fleet Gibbs sampling: the fused sampling pipeline
    vmapped over a batch of same-shape Solver instances (fleet analogue
    of :func:`multi_flagship_search_gs`; the reference's production
    pattern `examples/e02_sample_droplet_instances.py:23-27`). Each
    instance samples under its own PRNG stream (fold_in of ``seed`` by
    instance index, matching :func:`multi_sample`). With ``mesh`` (axis
    'data'), instances shard across devices — pure data parallelism, no
    collectives (SURVEY.md section 5.8); len(solvers) must tile the data
    axis.

    Returns a list of :func:`device_sample`-style result dicts.
    """
    from . import engine as eng
    from .config import compute_dtype
    assert solvers, "need at least one solver"
    dtype = compute_dtype()
    grids = [eng.pad_grid(ins.problem) for ins in solvers]
    g0 = grids[0]
    for g in grids:
        assert (g.Ny, g.Nx, g.Np, g.lh, g.lv) == \
            (g0.Ny, g0.Nx, g0.Np, g0.lh, g0.lv), \
            "fleet sampling needs same-shape instances"
    beta0 = solvers[0].beta
    for ins in solvers:
        assert ins.beta == beta0, "fleet sampling shares one beta"
    B = len(solvers)
    _, betas, ms, _, _, _, cols0 = _flagship_sample_inputs(
        solvers[0], dtype, pre_steps, max_scale)
    Es = jnp.stack([jnp.asarray(g.Es, dtype) for g in grids])
    Esl = jnp.stack([jnp.asarray(g.Esl, dtype) for g in grids])
    Esu = jnp.stack([jnp.asarray(g.Esu, dtype) for g in grids])
    dmap = jnp.stack([jnp.asarray(g.dmap) for g in grids])
    rmap = jnp.stack([jnp.asarray(g.rmap) for g in grids])
    X0 = {}
    for k, v in eng.identity_gauges(g0).items():
        X0[k] = jnp.broadcast_to(jnp.asarray(v, dtype)[None],
                                 (B,) + v.shape)
    ndall = jnp.stack([jnp.asarray(ins.problem.ld[: g0.Ny - 1], jnp.int32)
                       for ins in solvers])
    nvalid = jnp.stack([jnp.asarray(g.nstates, jnp.int32) for g in grids])
    cols = jnp.broadcast_to(cols0[None], (B,) + cols0.shape)
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(seed),
                                                 i))(jnp.arange(B))
    if mesh is not None:
        if B % mesh.shape["data"]:
            raise ValueError(f"{B} instances do not tile the data axis "
                             f"({mesh.shape['data']} shards)")
        shard = NamedSharding(mesh, P("data"))
        Es, Esl, Esu, dmap, rmap, ndall, nvalid, cols, keys = (
            jax.device_put(x, shard)
            for x in (Es, Esl, Esu, dmap, rmap, ndall, nvalid, cols, keys))
        X0 = {k: jax.device_put(v, shard) for k, v in X0.items()}
    states, mqs = _fleet_flagship_sample_prog(
        Es, Esl, Esu, dmap, rmap, X0, betas, ndall, jnp.asarray(ms, dtype),
        nvalid, cols, jnp.asarray(beta0, dtype), keys,
        M=M, Nx=g0.Nx, Dmax=Dmax, tolS=tolS, tolV=tolV,
        max_sweeps=max_sweeps, graduate=graduate_truncation, lh=g0.lh,
        lv=g0.lv, pre_Dmax=pre_Dmax, pre_sweeps=pre_sweeps,
        pre_graduate=False, rsvd=zipup_rsvd)
    states = np.asarray(states)                             # one pull
    mqs = np.asarray(mqs, dtype=np.float64)
    return [dict(states=states[b],
                 energy=exact_energies_problem(solvers[b].problem,
                                               states[b]),
                 negative_probability=min(0.0, float(mqs[b])))
            for b in range(B)]


def _assemble_batched_results(beam, auxs, B):
    """Reduce per-row aux diagnostics and pick each instance's best branch
    — shared result assembly of multi_search_gs / sharded_search_gs."""
    globalmin = np.minimum(np.asarray(
        jnp.min(jnp.stack([a["mq"] for a in auxs]), axis=0),
        dtype=np.float64), 0.0)
    gmc = np.minimum(np.asarray(
        jnp.min(jnp.stack([a["mqc"] for a in auxs]), axis=0),
        dtype=np.float64), 0.0)
    pd = np.asarray(jnp.max(jnp.stack([a["pd"] for a in auxs]), axis=0),
                    dtype=np.float64)
    ovf = np.asarray(jnp.sum(jnp.stack([a["ovf"] for a in auxs]), axis=0))
    cmax = np.asarray(jnp.max(jnp.stack([a["cmax"] for a in auxs]), axis=0))
    out = []
    valid = np.asarray(beam["valid"])
    Eng = np.asarray(beam["Eng"], dtype=np.float64)
    prob = np.asarray(beam["prob"], dtype=np.float64)
    deg = deg_decode(beam["deg"])
    states = np.asarray(beam["states"])
    for b in range(B):
        v = valid[b]
        best = int(np.argmin(np.where(v, Eng[b], np.inf)))
        out.append(dict(energy=Eng[b, best], states=states[b, best],
                        prob=prob[b, best], degeneracy=int(deg[b, best]),
                        negative_probability=float(globalmin[b]),
                        negative_probability_core=float(gmc[b]),
                        discarded_probability=float(pd[b]),
                        merge_overflow=int(ovf[b]),
                        count_max=int(cmax[b])))
    return out


def multi_search_gs(ctxs, M=2 ** 10, relative_P_cutoff=1e-6, min_dEng=1e-12,
                    Dmax=32, tolS=1e-16, tolV=1e-10, max_sweeps=20,
                    graduate_truncation=True, mesh=None, cand_factor=8,
                    select="topk"):
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
    cand = None if cand_factor is None else int(cand_factor) * M

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
    # one upload for the whole lattice (a per-row stack inside the row
    # loop costs 2*Ny separate transfers over a tunneled link)
    dmap = jnp.stack([jnp.asarray(c.dmap) for c in ctxs])
    rmap = jnp.stack([jnp.asarray(c.rmap) for c in ctxs])
    grid_in = dict(lB=lB, drindex=drindex, Es=EsP, Esl=EslP, Esu=EsuP,
                   dmap=dmap, rmap=rmap, nvalid=nvalid, cols=cols)

    shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding
        shard = NamedSharding(mesh, P("data"))
        Wt = jax.device_put(Wt, shard)
        grid_in = {k: jax.device_put(v, shard) for k, v in grid_in.items()}

    out = _fleet_search_prog(
        grid_in, Wt, M=M, Nx=Nx, bits=bits, min_dEng=min_dEng,
        log2_cutoff=log2_cutoff, cand=cand, select=select, Dmax=Dmax,
        tolS=tolS, tolV=tolV, max_sweeps=max_sweeps,
        graduate=graduate_truncation)

    if dtype == jnp.float32:
        packed = np.asarray(out)                            # ONE pull
        results = []
        for b in range(B):
            states, Eng, prob, deg, valid, mq, mqc, pd, ovf, cmax = \
                _unpack_result(packed[b], M, Nx * Ny)
            best = int(np.argmin(np.where(valid, Eng, np.inf)))
            results.append(dict(energy=Eng[best], states=states[best],
                                prob=prob[best], degeneracy=int(deg[best]),
                                negative_probability=min(0.0, mq),
                                negative_probability_core=min(0.0, mqc),
                                discarded_probability=pd,
                                merge_overflow=int(ovf), count_max=cmax))
        return results
    beam, aux = out
    return _assemble_batched_results(beam, [aux], B)


@partial(jax.jit, static_argnames=("M", "Nx", "bits", "min_dEng",
                                   "log2_cutoff", "cand", "select", "Dmax",
                                   "tolS", "tolV", "max_sweeps", "graduate"))
def _fleet_search_prog(grid_in, Wt, *, M, Nx, bits, min_dEng,
                       log2_cutoff, cand, select, Dmax, tolS, tolV,
                       max_sweeps, graduate):
    """Boundary-MPS build + the full search scan for a whole instance
    batch as ONE jitted, vmapped program: one device dispatch per batch
    (the previous per-row host loop cost Ny dispatches plus per-call
    retracing of freshly created closures). The initial beam is built
    inside the program — every op outside jit is its own tiny compiled
    program, and each program costs a remote-compile round trip on a
    tunneled accelerator. For f32 the packed result (see
    :func:`_pack_result`) is returned so the whole batch pulls as one
    (B, W) int32 array."""
    B, Ny = Wt.shape[0], Wt.shape[1]
    D = Dmax
    dtype = Wt.dtype

    def one(grid_i, Wt_i):
        beam0 = dict(
            RL=jnp.zeros((M, D), dtype).at[:, 0].set(1.0),
            vind=jnp.zeros((M, Nx + 1), jnp.int32),
            states=jnp.zeros((M, Nx * Ny), jnp.int32),
            Eng=jnp.zeros((M,), dtype),
            prob=jnp.full((M,), NEG, dtype).at[0].set(0.0),
            deg=deg_ones((M,)),
            valid=jnp.zeros((M,), bool).at[0].set(True),
            aidx=jnp.arange(M, dtype=jnp.int32),
        )
        rhoT, _, _, _ = engine.build_rhoT(
            Wt_i, Dmax=Dmax, tolS=tolS, tolV=tolV, max_sweeps=max_sweeps,
            graduate=graduate)
        beam, aux = full_search_scan(beam0, grid_i, rhoT, Wt_i, M=M, Nx=Nx,
                                     bits=bits, min_dEng=min_dEng,
                                     log2_cutoff=log2_cutoff, cand=cand,
                                     select=select)
        if dtype == jnp.float32:
            return _pack_result(beam, aux)
        return beam, aux
    return jax.vmap(one)(grid_in, Wt)


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


def sharded_search_gs(ctxs, mesh, M=2 ** 10, relative_P_cutoff=1e-6,
                      min_dEng=1e-12, Dmax=32, tolS=1e-16, tolV=1e-10,
                      max_sweeps=20, graduate_truncation=True,
                      cand_factor=8, select="topk"):
    """End-to-end multi-chip ground-state search over a ('data','beam')
    mesh: boundary-MPS stacks and row environments shard over instances
    ('data'); within each instance the beam's marginal evaluation shards
    over branches ('beam') with pmax/all_gather collectives per site
    (:func:`sharded_row_step`). New design — the reference has no
    parallelism (SURVEY.md section 2.9).

    len(ctxs) must be a multiple of mesh.shape['data']; M a multiple of
    mesh.shape['beam']. Returns a list of result dicts (same schema as
    :func:`device_search_gs`).
    """
    assert ctxs, "need at least one context"
    n_data, n_beam = mesh.shape["data"], mesh.shape["beam"]
    B = len(ctxs)
    if B % n_data:
        raise ValueError(f"{B} instances do not tile the data axis "
                         f"({n_data} shards)")
    if M % n_beam:
        raise ValueError(f"M={M} does not tile the beam axis ({n_beam})")
    c0 = ctxs[0]
    for c in ctxs:
        assert (c.Ny, c.Nx, c.Np, c.lh, c.lv) == \
            (c0.Ny, c0.Nx, c0.Np, c0.lh, c0.lv), "instances must share shapes"
    Ny, Nx, Np, lh, lv = c0.Ny, c0.Nx, c0.Np, c0.lh, c0.lv
    dtype = c0.dtype
    D = Dmax
    bits = max(1, int(np.ceil(np.log2(max(lh, lv)))))
    log2_cutoff = float(np.log2(relative_P_cutoff)) \
        if relative_P_cutoff > 0 else NEG
    cand = None if cand_factor is None else int(cand_factor) * M

    data_sh = NamedSharding(mesh, P("data"))
    beam_sh = NamedSharding(mesh, P("data", "beam"))

    Wt = jax.device_put(jnp.stack([c.Wt for c in ctxs]), data_sh)
    lB = jax.device_put(jnp.stack([c.lB for c in ctxs]), data_sh)
    drindex = jax.device_put(jnp.stack([c.drindex for c in ctxs]), data_sh)
    eng_rows = [_padded_energy_rows(c) for c in ctxs]
    EsP = jax.device_put(jnp.stack([e[0] for e in eng_rows]), data_sh)
    EslP = jax.device_put(jnp.stack([e[1] for e in eng_rows]), data_sh)
    EsuP = jax.device_put(jnp.stack([e[2] for e in eng_rows]), data_sh)
    dmap = jax.device_put(
        jnp.stack([jnp.asarray(c.dmap) for c in ctxs]), data_sh)
    rmap = jax.device_put(
        jnp.stack([jnp.asarray(c.rmap) for c in ctxs]), data_sh)
    nvalid = jax.device_put(
        jnp.stack([jnp.asarray(c.nstates, jnp.int32) for c in ctxs]),
        data_sh)
    cols = jax.device_put(jnp.broadcast_to(
        (jnp.arange(Ny, dtype=jnp.int32)[:, None] * Nx
         + jnp.arange(Nx, dtype=jnp.int32)[None, :])[None], (B, Ny, Nx)),
        data_sh)

    build = jax.vmap(lambda w: engine.build_rhoT(
        w, Dmax=Dmax, tolS=tolS, tolV=tolV, max_sweeps=max_sweeps,
        graduate=graduate_truncation))
    rhoT, _, _, _ = jax.jit(build, out_shardings=data_sh)(Wt)

    envsB = jax.jit(jax.vmap(engine.row_right_envs),
                    out_shardings=data_sh)
    step = sharded_row_step(mesh, M=M, Nx=Nx, bits=bits, min_dEng=min_dEng,
                            log2_cutoff=log2_cutoff, cand=cand,
                            select=select)

    beam = dict(
        RL=jnp.zeros((B, M, D), dtype).at[:, :, 0].set(1.0),
        vind=jnp.zeros((B, M, Nx + 1), jnp.int32),
        states=jnp.zeros((B, M, Nx * Ny), jnp.int32),
        Eng=jnp.zeros((B, M), dtype),
        prob=jnp.full((B, M), NEG, dtype).at[:, 0].set(0.0),
        deg=deg_ones((B, M)),
        valid=jnp.zeros((B, M), bool).at[:, 0].set(True),
        aidx=jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None], (B, M)),
    )
    beam = {k: jax.device_put(v, beam_sh) for k, v in beam.items()}
    auxs = []
    for ny in range(Ny):
        beam["aidx"] = jax.device_put(jnp.broadcast_to(
            jnp.arange(M, dtype=jnp.int32)[None], (B, M)), beam_sh)
        beam["RL"] = jax.device_put(
            jnp.zeros((B, M, D), dtype).at[:, :, 0].set(1.0), beam_sh)
        RRs = envsB(rhoT[:, ny + 1], Wt[:, ny], beam["vind"][:, :, 1:])
        row = dict(lB=lB[:, ny], drindex=drindex[:, ny], AT=rhoT[:, ny + 1],
                   RRs=RRs, Es=EsP[:, ny], Esl=EslP[:, ny], Esu=EsuP[:, ny],
                   dmap=dmap[:, ny], rmap=rmap[:, ny], nvalid=nvalid[:, ny],
                   cols=cols[:, ny])
        beam, aux = step(beam, row)
        auxs.append(aux)  # no host sync inside the row loop

    return _assemble_batched_results(beam, auxs, B)


def sharded_row_step(mesh, *, M, Nx, bits, min_dEng, log2_cutoff, cand=None,
                     select="topk"):
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
    aux_specs = dict(mq=P("data"), mqc=P("data"), pd=P("data"),
                     ovf=P("data"), cmax=P("data"))

    def one_instance(beam, row):
        return row_step(beam, row, M=M, Nx=Nx, bits=bits,
                        min_dEng=min_dEng, log2_cutoff=log2_cutoff,
                        cand=cand, axis="beam", beam_shards=n_beam,
                        select=select)

    @partial(shard_map, mesh=mesh, in_specs=(beam_specs, row_specs),
             out_specs=(beam_specs, aux_specs), check_vma=False)
    def step(beam, row):
        # strip the per-shard instance axis (size B/n_data) via vmap
        out, aux = jax.vmap(one_instance)(beam, row)
        return out, aux

    return jax.jit(step)
