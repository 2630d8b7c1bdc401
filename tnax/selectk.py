"""Exact top-k selection via radix threshold refinement.

Implements the search scan's top-k selection (M*Np=262144 candidates,
k=8193 at the flagship operating point) as a radix threshold:

1. pack each candidate into a unique sortable uint32-pair key
   (monotonic float bits, index tie-break matching top_k's
   smallest-index-first order among equal values),
2. find the k-th largest key by MSB-first digit histogram refinement
   (8-bit digits; each pass is one vectorized compare+reduce over the
   array — VPU work, no sort),
3. compact the >=threshold survivors (cumsum + scatter) and sort just
   those k elements.

The output is defined to be BIT-IDENTICAL to ``lax.top_k(vals, k)``
(same values in the same order, same index tie-breaks), so it drops
into `parallel.row_step` as ``select="radix"`` with zero semantic risk.

MEASURED ON CHIP (round 4, tools/ab_select.py,
results/r4_ab_select.jsonl): radix LOSES — 1.74 ms/site vs top_k's
0.35 ms/site in a 256-step scan at the flagship shape, and 2.81 s vs
2.44 s on the full fused L2048 flagship. The same measurement corrects
the round-3 floor analysis: in-scan ``lax.top_k`` costs ~0.09 s of the
~0.9 s search scan (the earlier 2.39 ms/site figure was a fori_loop
timing artifact), so selection is ~10% of the scan, not ~70%, and a
Pallas selection kernel has no headroom worth its complexity. ``topk``
stays the default; this module remains as the validated alternative
(``select='radix'``) and as the reference for the key-packing scheme
the merge lexsort shares.

Design notes. float32 keys are made order-monotonic as uint32 by the
standard sign-fold (negative floats map below positives, NaNs unused
here — the search scan's probabilities are finite or the NEG sentinel).
The index occupies a second uint32 as ``~index`` so that among equal
values a SMALLER index wins, exactly like top_k. Keys are therefore
unique, so exactly k keys are >= the k-th largest key — no partial-tie
bookkeeping is needed at the threshold.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _monotone_bits(v):
    """float32 -> uint32 with the same total order."""
    u = lax.bitcast_convert_type(v.astype(jnp.float32), jnp.uint32)
    neg = (u >> 31) == 1
    return jnp.where(neg, ~u, u | jnp.uint32(0x80000000))


@partial(jax.jit, static_argnames=("k",))
def top_k_radix(vals, k):
    """Exactly ``lax.top_k(vals, k)`` via radix threshold selection.

    vals: (N,) float32 (or castable). Returns (values (k,), indices (k,)
    int32), bit-identical to lax.top_k including tie-break order.
    """
    n = vals.shape[0]
    if k >= n:
        return lax.top_k(vals, k)
    hi = _monotone_bits(vals)                      # primary key
    idx = jnp.arange(n, dtype=jnp.uint32)
    lo = ~idx                                      # tie-break: smaller
    #                                                index = larger key
    kk = jnp.uint32(k)

    # MSB-first 1-bit refinement of the k-th largest (hi, lo) key: the
    # match mask (candidates agreeing with every refined bit so far) is
    # maintained incrementally, so each step is one bit extraction, one
    # masked popcount, and a scalar branch — O(bits * N) elementwise work
    # with no histograms. Only log2(n) low bits of the index word vary,
    # so index refinement skips the constant high bits.
    idx_bits = max(1, int(np.ceil(np.log2(n))))
    shifts = list(range(31, -1, -1)) \
        + list(range(idx_bits - 1, -1, -1))
    use_his = [True] * 32 + [False] * idx_bits

    def refine(state, spec):
        pmatch, remaining, phi, plo = state
        use_hi, shift = spec
        word = jnp.where(use_hi, hi, lo)
        bit = ((word >> shift) & jnp.uint32(1)) == 1
        c1 = jnp.sum(pmatch & bit).astype(jnp.uint32)
        take1 = remaining <= c1
        pmatch = pmatch & (bit == take1)
        remaining = jnp.where(take1, remaining, remaining - c1)
        add = jnp.where(take1, jnp.uint32(1) << shift, jnp.uint32(0))
        phi = jnp.where(use_hi, phi | add, phi)
        plo = jnp.where(use_hi, plo, plo | add)
        return (pmatch, remaining, phi, plo), None

    zero = jnp.uint32(0)
    (_, _, phi, plo), _ = lax.scan(
        refine,
        (jnp.ones((n,), bool), kk, zero, zero),
        (jnp.asarray(use_his), jnp.asarray(shifts, jnp.uint32)))
    # unrefined high index bits of plo are 0 while the true key has ~idx
    # high bits set — restore them so the >= comparison is exact
    if idx_bits < 32:
        plo = plo | (jnp.uint32(0xFFFFFFFF) << idx_bits)
    # threshold key = the k-th largest (phi, plo); exactly k keys are >=
    # it because keys are unique
    ge = (hi > phi) | ((hi == phi) & (lo >= plo))
    # compact survivor positions in index order, then sort the k
    # survivors by descending key — bitwise the same output as top_k
    pos = jnp.cumsum(ge.astype(jnp.int32)) - 1
    scatter_to = jnp.where(ge, pos, k)              # k = dropped slot
    sel_idx = jnp.zeros((k + 1,), jnp.int32).at[scatter_to].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")[:k]
    sel_hi = hi[sel_idx]
    order = jnp.argsort(~sel_hi)                    # stable: desc value,
    #                                     ties already in index order
    out_idx = sel_idx[order]
    return vals[out_idx], out_idx
