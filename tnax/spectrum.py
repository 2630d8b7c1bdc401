"""Low-energy spectrum search and droplet (excitation) machinery.

During the branch-and-bound search, whenever two branches with identical
boundary-index vectors merge, the losing branch differs from the winner by a
localized cluster of flipped variables — a "droplet". Recording droplets
hierarchically reconstructs the full low-energy spectrum from a single
search. Three encodings of droplet independence are supported, mirroring the
reference exactly (reference `tnac4o/tnac4o.py:652-725`):

  1. snake order     (`_search_low_energy_spectrum_v1`, `:727-915`)
  2. adjacency graph (`_search_low_energy_spectrum_v2`, `:943-1131`)
  3. adjacency graph, flattened to one hierarchy layer (`_v3`, `:1133-1358`)

The droplet store lives on the solver instance for save/load parity with the
reference: ``d`` (shape dictionary), ``invd`` (semi-hash inverse), ``el``
(per-branch excitation trees), ``free_d`` (next free key), ``adj``
(adjacency), ``xor2ind`` (cluster-XOR -> flipped spin ids). Tree nodes are
``((dEng, key[, first, last, dP]), (children...))`` tuples, identical to the
reference format so that `.npy` files round-trip between implementations.

All tensor work (marginals, environments) runs on device exactly as in the
ground-state search; the droplet bookkeeping is host-side pointer-chasing by
nature and stays in Python/NumPy.
"""

from __future__ import annotations

import logging
import time

import numpy as np
import scipy.sparse
import jax.numpy as jnp

from . import engine
from . import native as _native
from .problems import block_bits
from .search import (ContractionContext, _pad1, expand_candidates,
                     top_m, merge_by_vind, SearchResult)

logger = logging.getLogger("tnax")


# ---------------------------------------------------------------------------
# droplet store primitives (reference tnac4o/tnac4o.py:2012-2423)
# ---------------------------------------------------------------------------

def exc_init(ins):
    """Reference `_exc_initialise` (`tnac4o/tnac4o.py:2012-2019`)."""
    ins.d = {}
    ins.invd = {}
    ins.el = [[]]
    ins.free_d = 0
    ins._shape_masks = {}
    ins._keyl = {}


def _semihash(dpos, dstate):
    """Cheap shape fingerprint (reference `_exc_get_sh`,
    `tnac4o/tnac4o.py:2270-2275`)."""
    return (dpos[0], dstate[0], dpos[-1], dstate[-1])


def exc_register(ins, dpos, dstate):
    """Deduplicating insert into the shape dictionary; returns the key
    (reference `_exc_add_to_d`, `tnac4o/tnac4o.py:2051-2069`).

    Dedup goes through an exact byte-key dict (``_keyl``); the reference's
    semi-hash index ``invd`` is still maintained in its format for save/load
    parity."""
    kb = (dpos.tobytes(), dstate.tobytes())
    hit = ins._keyl.get(kb)
    if hit is not None:
        return hit
    sh = _semihash(dpos, dstate)
    key = ins.free_d
    ins.invd.setdefault(sh, []).append(key)
    ins.d[key] = (dpos, dstate)
    ins._keyl[kb] = key
    ins.free_d += 1
    return key


def exc_prune_energy(exc, max_dE):
    """Drop sub-excitations that exceed the remaining energy budget,
    recursively (reference `_exc_cut_energy`, `tnac4o/tnac4o.py:2071-2079`)."""
    kept = tuple(exc_prune_energy(se, max_dE - se[0][0])
                 for se in exc[1] if se[0][0] <= max_dE)
    return (exc[0], kept)


def exc_gc(ins):
    """Garbage-collect unused shapes (reference `_exc_clear_d`,
    `tnac4o/tnac4o.py:2249-2268`, same per-site cadence).

    Branches share subtree objects (copy-on-append), so the walk memoizes
    visited nodes by identity — each shared subtree is visited once instead
    of once per branch."""
    live = set()
    seen = set()

    def walk(tree):
        for exc in tree:
            if id(exc) in seen:
                continue
            seen.add(id(exc))
            live.add(exc[0][1])
            walk(exc[1])

    for bel in ins.el:
        if id(bel) not in seen:
            seen.add(id(bel))
            walk(bel)
    nd, ninvd, nkeyl = {}, {}, {}
    for k in live:
        dpos, dstate = ins.d[k]
        nd[k] = (dpos, dstate)
        ninvd.setdefault(_semihash(dpos, dstate), []).append(k)
        nkeyl[(dpos.tobytes(), dstate.tobytes())] = k
    ins.d, ins.invd, ins._keyl = nd, ninvd, nkeyl


def reset_adjacency(ins, J, Nx, Ny, ind):
    """Adjacency matrix + cluster-XOR decode tables (reference `_reset_adj`,
    `tnac4o/tnac4o.py:2021-2041`).

    Also builds uint64 bitset views of the adjacency (`adj_bits`) and unit
    rows (`unit_bits`) so that the droplet-overlap test — the hottest host
    operation during spectrum replay — reduces to a few word-ANDs instead
    of a dense submatrix gather."""
    ins._shape_masks = {}
    if ins.mode == "Ising":
        adj = (scipy.sparse.triu(J, 1) != 0)
        ins.adj = (adj + adj.T).toarray()
        L = ins.adj.shape[0]
        W = (L + 63) // 64
        padded = np.zeros((L, W * 64), dtype=bool)
        padded[:, :L] = ins.adj
        # little-endian bit order: spin c <-> bit (c & 63) of word (c >> 6),
        # shared with the native kernels (tnax/native/droplets.c)
        ins.adj_bits = np.packbits(padded, axis=-1, bitorder="little") \
            .view(np.uint64).reshape(L, W)
        eye = np.zeros((L, W * 64), dtype=bool)
        eye[np.arange(L), np.arange(L)] = True
        ins.unit_bits = np.packbits(eye, axis=-1, bitorder="little") \
            .view(np.uint64).reshape(L, W)
        # the same rows as arbitrary-precision ints: the overlap test is a
        # single Python int AND — by far the cheapest form at ~1e6+ calls
        ins.adj_ints = [int.from_bytes(ins.adj_bits[i].tobytes(), "little")
                        for i in range(L)]
        ins.xor2ind = []
        for ny in range(Ny):
            for nx in range(Nx):
                act = np.asarray(ind[ny][nx])
                bits = block_bits(len(act)).astype(bool)
                ins.xor2ind.append([act[bits[i]] for i in range(2 ** len(act))])
        # CSR view of the same tables for the native expansion kernel:
        # slot = site_base[p] + s -> values[starts[slot]:starts[slot+1]]
        site_base = np.zeros(len(ins.xor2ind) + 1, np.int64)
        for p, tab in enumerate(ins.xor2ind):
            site_base[p + 1] = site_base[p] + len(tab)
        lens = [len(v) for tab in ins.xor2ind for v in tab]
        starts = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=starts[1:])
        values = np.concatenate(
            [np.asarray(v, np.int64) for tab in ins.xor2ind for v in tab]
            or [np.zeros(0, np.int64)])
        ins._xor_csr = (np.ascontiguousarray(starts),
                        np.ascontiguousarray(values),
                        np.ascontiguousarray(site_base[:-1]),
                        int(max(lens) if lens else 0))
    else:
        ins.adj_Nx, ins.adj_Ny = Nx, Ny


def reset_adjacency_from_saved(ins, adj):
    """Rebuild adjacency helpers after `load` (reference `load`,
    `tnac4o/tnac4o.py:60-72`)."""
    if ins.mode == "Ising":
        reset_adjacency(ins, adj, ins.Nx_model, ins.Ny_model, ins.ind0)
    else:
        ins.adj_Nx, ins.adj_Ny = ins.Nx_model, ins.Ny_model


def _flipped_spins(ins, dpos, dstate):
    """Global ids of flipped spins (reference `_exc_xor2ind`,
    `tnac4o/tnac4o.py:2081-2085`). Native CSR expansion when available —
    the hottest pure-Python helper of the spectrum replay."""
    L = _native.lib()
    csr = getattr(ins, "_xor_csr", None)
    if L is not None and csr is not None:
        starts, values, site_base, maxlen = csr
        if dpos.dtype != np.int64:
            dpos = dpos.astype(np.int64)
        if dstate.dtype != np.int64:
            dstate = dstate.astype(np.int64)
        n = len(dpos)
        out = np.empty(n * maxlen, np.int64)
        k = L.tnax_spins(starts.ctypes.data, values.ctypes.data,
                         site_base.ctypes.data, dpos.ctypes.data,
                         dstate.ctypes.data, n, out.ctypes.data)
        return out[:k]
    return np.hstack([ins.xor2ind[p][s] for p, s in zip(dpos, dstate)]) \
        .astype(np.int64, copy=False)


def _elem_batch(ins, dpos_flat, dstate_flat, bounds):
    """Elementary-connectivity flags for a whole site's losers in ONE
    native call (semantics of per-loser :func:`exc_elementary`; Ising
    only). Returns a bool array of len(bounds)-1, or None when the native
    kernels or the CSR tables are unavailable."""
    L = _native.lib()
    csr = getattr(ins, "_xor_csr", None)
    if L is None or csr is None:
        return None
    starts, values, site_base, maxlen = csr
    n = len(bounds) - 1
    if n == 0:
        return np.zeros(0, bool)
    dpos_flat = np.ascontiguousarray(dpos_flat, np.int64)
    dstate_flat = np.ascontiguousarray(dstate_flat, np.int64)
    bounds = np.ascontiguousarray(bounds, np.int64)
    max_spins = int(np.max(bounds[1:] - bounds[:-1])) * max(maxlen, 1)
    out = np.empty(n, np.int64)
    r = L.tnax_elem_batch(starts.ctypes.data, values.ctypes.data,
                          site_base.ctypes.data, ins.adj_bits.ctypes.data,
                          ins.adj_bits.shape[1], dpos_flat.ctypes.data,
                          dstate_flat.ctypes.data, bounds.ctypes.data,
                          n, max_spins, out.ctypes.data)
    if r < 0:
        return None
    return out.astype(bool)


def exc_elementary(ins, dpos, dstate):
    """Is the droplet single-connected? (reference `_exc_elementary`,
    `tnac4o/tnac4o.py:2087-2114`). Ising runs the same BFS on uint64
    bitsets (word-ANDs instead of dense submatrix gathers per wave)."""
    if ins.mode == "Ising":
        spins = _flipped_spins(ins, dpos, dstate)
        if spins.size <= 1:
            return True
        L = _native.lib()
        if L is not None:
            r = L.tnax_elementary(ins.adj_bits, ins.adj_bits.shape[1],
                                  spins, len(spins))
            if r >= 0:
                return bool(r)
        rest = np.bitwise_or.reduce(ins.unit_bits[spins[1:]], axis=0)
        frontier = spins[:1]
        while frontier.size and rest.any():
            nb = np.bitwise_or.reduce(ins.adj_bits[frontier], axis=0)
            new = nb & rest
            rest &= ~new
            frontier = np.flatnonzero(
                np.unpackbits(new.view(np.uint8), bitorder="little"))
        return not rest.any()
    grp, rest = dpos[:1], dpos[1:]
    while grp.size and rest.size:
        gx, gy = grp % ins.adj_Nx, grp // ins.adj_Nx
        rx, ry = rest % ins.adj_Nx, rest // ins.adj_Nx
        dist = np.abs(gx[:, None] - rx[None, :]) + \
            np.abs(gy[:, None] - ry[None, :])
        hit = np.any(dist == 1, axis=0)
        grp, rest = rest[hit], rest[~hit]
    return rest.size == 0


def _shape_of(ins, e):
    return ins.d[e] if isinstance(e, (int, np.integer)) else e


def _shape_masks(ins, e):
    """(spin bitset, adjacency-neighborhood bitset) of a droplet as Python
    ints, cached by dictionary key. Keys are never reused (`free_d` is
    monotone), and the cache is cleared whenever the adjacency tables are
    rebuilt."""
    key = e if isinstance(e, (int, np.integer)) else None
    if key is not None:
        hit = ins._shape_masks.get(key)
        if hit is not None:
            return hit
    spins = _flipped_spins(ins, *(ins.d[key] if key is not None else e))
    sm = nm = 0
    adj_ints = ins.adj_ints
    for s in spins.tolist():
        sm |= 1 << s
        nm |= adj_ints[s]
    masks = (sm, nm)
    if key is not None:
        ins._shape_masks[key] = masks
    return masks


def exc_overlap(ins, e1, e2):
    """Do two droplets interact? (reference `_exc_overlap`,
    `tnac4o/tnac4o.py:2116-2141`).

    Ising fast path: `neighborhood(e1) & spins(e2)` on cached Python-int
    bitsets — equivalent to the reference's `any(adj[i1][:, i2])` because
    the adjacency is symmetric."""
    if ins.mode == "Ising":
        return (_shape_masks(ins, e1)[1] & _shape_masks(ins, e2)[0]) != 0
    s1, s2 = _shape_of(ins, e1), _shape_of(ins, e2)
    p1, p2 = s1[0], s2[0]
    x1, y1 = p1 % ins.adj_Nx, p1 // ins.adj_Nx
    x2, y2 = p2 % ins.adj_Nx, p2 // ins.adj_Nx
    dist = np.abs(x1[:, None] - x2[None, :]) + np.abs(y1[:, None] - y2[None, :])
    return bool(np.any(dist <= 1))


def exc_hd(ins, dstate):
    """Droplet size metric used by lim_hd (reference `_exc_hd`,
    `tnac4o/tnac4o.py:2143-2150`)."""
    if ins.mode == "Ising":
        return len(dstate)
    return int(sum(bin(int(s)).count("1") for s in dstate))


def exc_hd_pair(ins, e1, e2):
    """Hamming distance between two droplets (reference `_exc_hd_comp`,
    `tnac4o/tnac4o.py:2152-2196`)."""
    (p1, s1), (p2, s2) = _shape_of(ins, e1), _shape_of(ins, e2)
    L = _native.lib()
    if L is not None:
        f = L.tnax_hd_pair_ising if ins.mode == "Ising" \
            else L.tnax_hd_pair_rmf
        return int(f(np.ascontiguousarray(p1, np.int64),
                     np.ascontiguousarray(s1, np.int64), len(p1),
                     np.ascontiguousarray(p2, np.int64),
                     np.ascontiguousarray(s2, np.int64), len(p2)))
    l1, l2 = len(p1), len(p2)
    n1 = n2 = hd = 0
    if ins.mode == "Ising":
        while n1 < l1 and n2 < l2:
            if p1[n1] == p2[n2]:
                hd += bin(int(s1[n1]) ^ int(s2[n2])).count("1")
                n1 += 1
                n2 += 1
            elif p1[n1] < p2[n2]:
                hd += bin(int(s1[n1])).count("1")
                n1 += 1
            else:
                hd += bin(int(s2[n2])).count("1")
                n2 += 1
        hd += sum(bin(int(s)).count("1") for s in s1[n1:])
        hd += sum(bin(int(s)).count("1") for s in s2[n2:])
    else:
        while n1 < l1 and n2 < l2:
            if p1[n1] == p2[n2]:
                if s1[n1] != s2[n2]:
                    hd += 1
                n1 += 1
                n2 += 1
            elif p1[n1] < p2[n2]:
                n1 += 1
                hd += 1
            else:
                n2 += 1
                hd += 1
        if n1 < l1:
            hd += l1 - n1
        elif n2 < l2:
            hd += l2 - n2
    return hd


def exc_merge_shapes(ins, e1, e2):
    """XOR-combine two droplets into one sorted shape (reference
    `_exc_merge`, `tnac4o/tnac4o.py:2198-2247`)."""
    (p1, s1), (p2, s2) = _shape_of(ins, e1), _shape_of(ins, e2)
    L = _native.lib()
    if L is not None:
        n1, n2 = len(p1), len(p2)
        pos = np.empty(n1 + n2, np.int64)
        st = np.empty(n1 + n2, np.int64)
        k = L.tnax_merge_shapes(
            np.ascontiguousarray(p1, np.int64),
            np.ascontiguousarray(s1, np.int64), n1,
            np.ascontiguousarray(p2, np.int64),
            np.ascontiguousarray(s2, np.int64), n2, pos, st)
        return pos[:k], st[:k]
    pos, st = [], []
    n1 = n2 = 0
    while n1 < len(p1) and n2 < len(p2):
        if p1[n1] == p2[n2]:
            x = int(s1[n1]) ^ int(s2[n2])
            if x:
                pos.append(p1[n1])
                st.append(x)
            n1 += 1
            n2 += 1
        elif p1[n1] < p2[n2]:
            pos.append(p1[n1])
            st.append(s1[n1])
            n1 += 1
        else:
            pos.append(p2[n2])
            st.append(s2[n2])
            n2 += 1
    pos.extend(p1[n1:])
    st.extend(s1[n1:])
    pos.extend(p2[n2:])
    st.extend(s2[n2:])
    return np.asarray(pos, dtype=np.int64), np.asarray(st, dtype=np.int64)


# ---------------------------------------------------------------------------
# unpacking the tree into explicit excitation energies / flip lists
# ---------------------------------------------------------------------------

def unpack_v1(ins, el, max_dEng=0.0, max_states=np.inf):
    """Snake-order unpack (reference `_exc_unpack_v1`,
    `tnac4o/tnac4o.py:2295-2335`)."""
    Eng = [0.0]
    flip = [[]]
    root = ((0.0, 0, -1, ins.Nx_model * ins.Ny_model - 1, 1), tuple(el))
    stacks = [[root]]
    for site in range(ins.Nx_model * ins.Ny_model - 1, -1, -1):
        kk = 0
        while kk < len(Eng):
            for child in stacks[kk][-1][1]:
                last = child[0][3]
                if last == site and Eng[kk] + child[0][0] <= max_dEng:
                    Eng.append(Eng[kk] + child[0][0])
                    flip.append(flip[kk] + [child[0][1]])
                    stacks.append(stacks[kk] + [child])
                elif last > site:
                    break
            kk += 1
        if len(Eng) > max_states:
            keep = np.array(Eng).argpartition(max_states)[:max_states]
            Eng = [Eng[i] for i in keep]
            flip = [flip[i] for i in keep]
            stacks = [stacks[i] for i in keep]
        for kk in range(len(Eng)):
            while stacks[kk][-1][0][2] >= site:
                stacks[kk].pop()
    return np.array(Eng), flip


def unpack_v2(ins, excs, max_dEng=0.0, max_states=np.inf, one_layer=False):
    """Graph-independence unpack (reference `_exc_unpack_v2`,
    `tnac4o/tnac4o.py:2337-2377`)."""
    if ins.mode == "Ising":
        out = _unpack_v2_native(ins, excs, max_dEng, max_states, one_layer)
        if out is not None:
            return out
        return _unpack_v2_ising(ins, excs, max_dEng, max_states, one_layer)
    Eng = [0.0]
    pending = [list(excs)]
    flip = [[]]
    progressed = True
    while progressed:
        progressed = False
        kk = 0
        while kk < len(Eng):
            if pending[kk]:
                exc = pending[kk].pop()
                if Eng[kk] + exc[0][0] <= max_dEng:
                    Eng.append(Eng[kk] + exc[0][0])
                    flip.append(flip[kk] + [exc[0][1]])
                    rest = [x for x in pending[kk]
                            if not exc_overlap(ins, x[0][1], exc[0][1])]
                    pending.append(rest)
                    if not one_layer:
                        rest.extend(list(exc[1]))
                    progressed = True
            kk += 1
        if len(Eng) > max_states:
            keep = np.array(Eng).argpartition(max_states)[:max_states]
            Eng = [Eng[i] for i in keep]
            flip = [flip[i] for i in keep]
            pending = [pending[i] for i in keep]
    return np.array(Eng), flip


def _unpack_v2_native(ins, excs, max_dEng, max_states, one_layer):
    """Native-kernel unpack_v2 (tnax_unpack_v2 in tnax/native/droplets.c):
    the identical traversal on a flattened tree — flip lists as shared
    chains, pending lists as int32 arrays, the overlap filter as word-ANDs.
    The enumerated state set matches the Python paths exactly for distinct
    energies (intermediate prunes keep the max_states smallest, which is
    order-independent); pure-Python enumeration costs 12-28 s per
    chimera-2048 instance (results/r4_spectrum_L2048.jsonl decode_s).
    Returns None when the kernel is unavailable (NumPy fallback applies)."""
    L = _native.lib()
    if L is None or not hasattr(L, "tnax_unpack_v2"):
        return None
    # flatten breadth-first so each node's children are contiguous
    items = list(excs)
    n_root = len(items)
    dE, keys, cs, cc = [], [], [], []
    i = 0
    while i < len(items):
        exc = items[i]
        dE.append(exc[0][0])
        keys.append(exc[0][1])
        ch = () if one_layer else exc[1]
        cs.append(len(items))
        cc.append(len(ch))
        items.extend(ch)
        i += 1
    n = len(items)
    W = ins.adj_bits.shape[1]
    if n == 0:
        return np.zeros(1), [[]]
    dE = np.asarray(dE, np.float64)
    keys_a = np.asarray(keys, np.int64)
    cs = np.asarray(cs, np.int64)
    cc = np.asarray(cc, np.int64)
    sm = np.empty((n, W), np.uint64)
    nm = np.empty((n, W), np.uint64)
    nbytes = W * 8
    word_cache = {}
    for t, k in enumerate(keys):
        hit = word_cache.get(k)
        if hit is None:
            s_int, n_int = _shape_masks(ins, k)
            hit = (np.frombuffer(s_int.to_bytes(nbytes, "little"),
                                 np.uint64),
                   np.frombuffer(n_int.to_bytes(nbytes, "little"),
                                 np.uint64))
            word_cache[k] = hit
        sm[t], nm[t] = hit
    ms = (2 ** 62) if max_states is None or np.isinf(max_states) \
        else int(max_states)
    n_out = L.tnax_unpack_v2(
        dE.ctypes.data, keys_a.ctypes.data, cs.ctypes.data, cc.ctypes.data,
        np.ascontiguousarray(sm).ctypes.data,
        np.ascontiguousarray(nm).ctypes.data,
        W, n, n_root, float(max_dEng), ms, int(bool(one_layer)))
    if n_out < 0:  # allocation failure — fall back
        return None
    total = L.tnax_unpack_flip_total()
    Eng = np.empty(n_out, np.float64)
    off = np.empty(n_out + 1, np.int64)
    fk = np.empty(max(total, 1), np.int64)
    L.tnax_unpack_fetch(Eng.ctypes.data, off.ctypes.data, fk.ctypes.data)
    flip = [fk[off[i]:off[i + 1]].tolist() for i in range(n_out)]
    return Eng, flip


def _unpack_v2_ising(ins, excs, max_dEng, max_states, one_layer):
    """Ising fast path of :func:`unpack_v2` — same traversal, with the
    overlap filter inlined on cached bitset masks (the same hoist as the
    replay's parent-tree walk): pending entries carry their spin mask, so
    each accept filters with one int-AND per entry. Branch-for-branch
    identical output (verified against the generic path on a saved L2048
    droplet tree; decode 12-28 s -> well under 4 s there)."""
    def wrap(nodes):
        out = []
        for x in nodes:
            m = masks.get(x[0][1])
            if m is None:
                m = _shape_masks(ins, x[0][1])
            out.append((m[0], x))
        return out

    masks = ins._shape_masks
    Eng = [0.0]
    pending = [wrap(excs)]
    flip = [[]]
    progressed = True
    while progressed:
        progressed = False
        kk = 0
        while kk < len(Eng):
            if pending[kk]:
                _, exc = pending[kk].pop()
                if Eng[kk] + exc[0][0] <= max_dEng:
                    Eng.append(Eng[kk] + exc[0][0])
                    flip.append(flip[kk] + [exc[0][1]])
                    nm = _shape_masks(ins, exc[0][1])[1]
                    rest = [x for x in pending[kk] if not (nm & x[0])]
                    pending.append(rest)
                    if not one_layer:
                        rest.extend(wrap(exc[1]))
                    progressed = True
            kk += 1
        if len(Eng) > max_states:
            keep = np.array(Eng).argpartition(max_states)[:max_states]
            Eng = [Eng[i] for i in keep]
            flip = [flip[i] for i in keep]
            pending = [pending[i] for i in keep]
    return np.array(Eng), flip


def unpack(ins, max_dEng=0.0, max_states=np.inf):
    if ins.excitations_encoding == 1:
        return unpack_v1(ins, ins.el, max_dEng, max_states)
    if ins.excitations_encoding == 2:
        return unpack_v2(ins, ins.el, max_dEng, max_states)
    return unpack_v2(ins, ins.el, max_dEng, max_states, one_layer=True)


def decode_low_energy_states(ins, max_dEng=0.0, max_states=1024):
    """Expand the droplet tree into explicit states (reference
    `decode_low_energy_states`, `tnac4o/tnac4o.py:1360-1389`)."""
    Eng, flip = unpack(ins, max_dEng=max_dEng, max_states=max_states)
    gs = ins.states[0]
    order = Eng.argsort()
    Eng = Eng[order]
    nst = min(max_states, len(Eng))
    states = np.zeros((nst, len(gs)), dtype=ins.states.dtype)
    for ii in range(nst):
        st = gs.copy()
        for key in flip[order[ii]]:
            dpos, dstate = ins.d[key]
            st[dpos] = np.bitwise_xor(st[dpos], dstate)
        states[ii] = st
    ins.energy = Eng + ins.energy[0]
    ins.states = states
    return Eng[0]


def excitations_to_list(el):
    """Excitation tree -> nested lists (reference
    `_exc_excitations_to_list`, `tnac4o/tnac4o.py:2379-2388`)."""
    return [[exc[0], excitations_to_list(exc[1])] for exc in el]


def exc_export_shapes(ins, el=None, ind=-1, d=None):
    """RMF droplet shapes as {index: [dEng, [[x, y], ...]]} (reference
    `_exc_export_shapes`, `tnac4o/tnac4o.py:2390-2404`)."""
    if ins.mode != "RMF":
        raise ValueError("exc_export_shapes is defined for RMF mode")
    el = ins.el if el is None else el
    d = {} if d is None else d
    for exc in el:
        ind += 1
        dpos = ins.d[exc[0][1]][0]
        nx = np.mod(dpos, ins.adj_Nx)
        ny = dpos // ins.adj_Nx
        d[ind] = [exc[0][0], [[int(x), int(y)] for x, y in zip(nx, ny)]]
        if exc[1]:
            d = exc_export_shapes(ins, exc[1], ind, d)
    return d


def exc_show_properties(ins):
    """Reference `_exc_show_properties` (`tnac4o/tnac4o.py:2043-2049`)."""
    print("Excitation encoding  :", ins.excitations_encoding)
    print("Size of dictionary   :", len(ins.d))
    print("Exc in first layer   :", len(ins.el))


def exc_print(ins, el=None, layer=1):
    """Display the excitation tree (reference `exc_print`,
    `tnac4o/tnac4o.py:2406-2423`)."""
    el = ins.el if el is None else el
    for exc in el:
        dpos, dstate = ins.d[exc[0][1]]
        print((3 * layer - 3) * " " + "|- %0.4f " % exc[0][0] + " : "
              + " ".join(map(str, dpos)) + " | " + " ".join(map(str, dstate)))
        exc_print(ins, exc[1], layer + 1)


# ---------------------------------------------------------------------------
# droplet recording at a merge (shared by the host and device-record paths)
# ---------------------------------------------------------------------------

def record_losers(ins, ee, bel, losers, ny, nx, Nx, max_dEng, lim_hd):
    """Append droplet records for the losing members of one merge group.

    ``bel`` is (a copy of) the group representative's excitation tree and is
    mutated in place. ``losers`` yields one tuple per non-representative
    member: (cdE, dpos, dstate, dP, pel) — energy gap to the representative,
    positions and values of the XOR of block states vs the representative,
    log2-prob gap to the merged branch, and the loser's own excitation tree.
    Implements the per-encoding recording bodies of the reference
    (`tnac4o/tnac4o.py:855-874`, `:1079-1087`, `:1271-1282`).
    """
    if ee == 3:
        fresh = []
    for rec in losers:
        cdE, dpos, dstate, dP, pel = rec[:5]
        elem = rec[5] if len(rec) > 5 else None
        if cdE > max_dEng:
            continue
        if ee == 1:
            if lim_hd > 1 and exc_hd(ins, dstate) < lim_hd:
                continue
            dfirst = int(dpos[0])
            dlast = Nx * ny + nx
            di = exc_register(ins, dpos, dstate)
            sel = [exc_prune_energy(sne, max_dEng - (sne[0][0] + cdE))
                   for sne in pel
                   if sne[0][3] >= dfirst and sne[0][0] + cdE <= max_dEng]
            bel.append(((cdE, di, dfirst, dlast, dP), tuple(sel)))
        elif ee == 2:
            if (lim_hd > 1 and exc_hd(ins, dstate) < lim_hd) or \
                    not (exc_elementary(ins, dpos, dstate)
                         if elem is None else elem):
                continue
            di = exc_register(ins, dpos, dstate)
            lim = max_dEng - cdE
            if ins.mode == "Ising":
                # inlined exc_overlap with the new droplet's neighborhood
                # mask hoisted out of the parent-tree walk: the overlap
                # filter is the replay's hottest loop (measured 2.6M
                # exc_overlap calls / 8 s of a 21 s L2048 spectrum)
                nm = _shape_masks(ins, di)[1]
                masks = ins._shape_masks
                sel = []
                for sne in pel:
                    h0 = sne[0]
                    if h0[0] > lim:
                        continue
                    m2 = masks.get(h0[1])
                    if m2 is None:
                        m2 = _shape_masks(ins, h0[1])
                    if nm & m2[0]:
                        sel.append(exc_prune_energy(sne, lim - h0[0]))
            else:
                sel = [exc_prune_energy(sne, lim - sne[0][0])
                       for sne in pel
                       if sne[0][0] <= lim
                       and exc_overlap(ins, di, sne[0][1])]
            bel.append(((cdE, di), tuple(sel)))
        else:  # ee == 3: flatten hierarchy to one layer
            nsel = [sne for sne in pel
                    if sne[0][0] + cdE <= max_dEng
                    and exc_overlap(ins, (dpos, dstate), sne[0][1])]
            sEng, sflip = unpack_v2(ins, nsel, max_dEng - cdE,
                                    one_layer=True)
            for nn in range(len(sEng)):
                sub = (dpos, dstate)
                for sdi in sflip[nn]:
                    sub = exc_merge_shapes(ins, sub, sdi)
                if (lim_hd <= 1 or exc_hd(ins, sub[1]) >= lim_hd) \
                        and exc_elementary(ins, *sub):
                    sdi = exc_register(ins, *sub)
                    fresh.append(((sEng[nn] + cdE, sdi), ()))
    if ee == 3:
        bel.extend(sorted(fresh, key=lambda x: x[0][0]))


def _finalize_spectrum(ins, ee, lim_hd):
    """Post-search droplet cleanup shared by both paths: ee=3 greedy
    Hamming dedup (reference `tnac4o/tnac4o.py:1323-1338`), remap of shape
    positions to the unrotated cluster order (`:907-914`), adjacency reset."""
    if ee == 3:
        bel = sorted(ins.el[0], key=lambda x: x[0][0])
        if lim_hd > 1:
            distinct = []
            for x in bel:
                if all(exc_hd_pair(ins, x[0][1], y[0][1]) >= lim_hd
                       for y in distinct):
                    distinct.append(x)
            ins.el[0] = distinct
        else:
            ins.el[0] = bel
        exc_gc(ins)
    ins.el = ins.el[0]
    for key, (dpos, dstate) in ins.d.items():
        dpos = ins.order_i[dpos]
        srt = dpos.argsort()
        ins.d[key] = (dpos[srt], dstate[srt])
    if ee > 1:
        reset_adjacency(ins, ins.J0 if ins.mode == "Ising" else None,
                        ins.Nx_model, ins.Ny_model,
                        ins.ind0 if ins.mode == "Ising" else None)


# ---------------------------------------------------------------------------
# spectrum search
# ---------------------------------------------------------------------------

def search_spectrum(ins, ctx: ContractionContext, excitations_encoding,
                    M=2 ** 10, relative_P_cutoff=1e-6, max_dEng=0.0,
                    lim_hd=0, min_dEng=1e-12, Dmax=32, tolS=1e-16,
                    tolV=1e-10, max_sweeps=20,
                    graduate_truncation=True,
                    zipup_rsvd=None) -> SearchResult:
    """Beam search with droplet recording at merges.

    One loop implements all three encodings; only the recording step differs
    (reference `_search_low_energy_spectrum_v{1,2,3}`,
    `tnac4o/tnac4o.py:727-1358`).
    """
    ee = excitations_encoding
    t_total = time.time()
    logger.info("Preprocessing boundary MPS (D=%d) ...", Dmax)
    ctx.build_boundary(Dmax, tolS, tolV, max_sweeps, graduate_truncation,
                       rsvd=zipup_rsvd)
    logger.info("Elapsed: %.2f s", time.time() - t_total)

    Ny, Nx = ctx.Ny, ctx.Nx
    vind = np.zeros((1, Nx + 1), dtype=np.int32)
    states = np.zeros((1, Nx * Ny), dtype=np.int32)
    Eng = np.zeros(1)
    prob = np.zeros(1)
    deg = np.ones(1, dtype=np.int64)
    pd_max, globalmin, globalmin_core = -np.inf, 1.0, 0.0
    exc_init(ins)
    if ee > 1:
        reset_adjacency(ins, ins.problem.J if ins.mode == "Ising" else None,
                        Nx, Ny,
                        ins.problem.ind if ins.mode == "Ising" else None)

    D, dtype = Dmax, ctx.dtype

    for ny in range(Ny):
        t_row = time.time()
        K = len(prob)
        AT_row = ctx.rhoT[ny + 1]
        RRs = engine.row_right_envs(AT_row, ctx.Wt[ny],
                                    jnp.asarray(_pad1(vind[:, 1:], M)))
        aidx = np.arange(K, dtype=np.int32)
        RL = jnp.zeros((M, D), dtype=dtype).at[:, 0].set(1.0)

        for nx in range(Nx):
            n = int(ctx.nstates[ny, nx])
            idx3 = jnp.asarray(np.stack([_pad1(aidx, M),
                                         _pad1(vind[:, nx], M),
                                         _pad1(vind[:, nx + 1], M)]))
            Pn_d, mPn_d = engine.marginal_site(
                ctx.lB[ny, nx], ctx.drindex[ny, nx], AT_row[nx],
                RL, RRs[nx], idx3, n)
            inds, indc, probf, pd_max, minP, minP_core = expand_candidates(
                Pn_d, mPn_d, prob, K, n, ctx.Np, M, relative_P_cutoff,
                pd_max)
            globalmin = min(globalmin, minP)
            globalmin_core = min(globalmin_core, minP_core)
            states = states[inds]
            states[:, ny * Nx + nx] = indc
            vind = vind[inds]
            deg = deg[inds]
            aidx = aidx[inds]
            Eng = Eng[inds]
            Es, Esl, Esu = ctx.energy_tables(ny, nx)
            Eng = Eng + Es[indc] + Esl[indc, vind[:, nx]] \
                + Esu[indc, vind[:, nx + 1]]
            vind[:, nx] = ctx.dmap[ny, nx][indc]
            vind[:, nx + 1] = ctx.rmap[ny, nx][indc]

            vindn, rep, degn, probn, gorder, starts, g = merge_by_vind(
                vind, Eng, probf, deg, min_dEng)
            ends = np.r_[starts[1:], len(g)]
            keep, pd_max = top_m(probn, M, pd_max)

            # droplet recording: losers of each kept merge group
            new_el = []
            for kk in keep:
                members = gorder[starts[kk]:ends[kk]]
                rep_kk = rep[kk]
                E_kk = Eng[rep_kk]
                bel = ins.el[inds[rep_kk]][:]
                def _loser(ii):
                    dfull = np.bitwise_xor(states[rep_kk], states[ii])
                    dpos = np.flatnonzero(dfull).astype(np.int64)
                    return (Eng[ii] - E_kk, dpos,
                            dfull[dpos].astype(np.int64),
                            probf[ii] - probn[kk], ins.el[inds[ii]])
                losers = (_loser(ii) for ii in members if ii != rep_kk)
                record_losers(ins, ee, bel, losers, ny, nx, Nx, max_dEng,
                              lim_hd)
                new_el.append(bel)

            vind = vindn[keep]
            prob = probn[keep]
            deg = degn[keep]
            rk = rep[keep]
            states = states[rk]
            Eng = Eng[rk]
            parent = inds[rk].astype(np.int32)
            aidx = aidx[rk]
            ins.el = new_el
            K = len(prob)

            RL = engine.rl_update_sel(
                RL, AT_row[nx],
                jnp.asarray(np.stack([_pad1(parent, M),
                                      _pad1(vind[:, nx], M)])))
            if ee < 3:
                exc_gc(ins)
        if ee == 3:
            exc_gc(ins)
        logger.info("Row %d/%d: %d branches, %d shapes, %.2f s", ny + 1, Ny,
                    K, len(ins.d), time.time() - t_row)
        vind[:, 1:] = vind[:, :-1]
        vind[:, 0] = 0

    logger.info("Spectrum search total: %.2f s", time.time() - t_total)
    _finalize_spectrum(ins, ee, lim_hd)

    return SearchResult(
        energy=Eng, probability=prob, degeneracy=int(deg[0]), states=states,
        discarded_probability=float(pd_max),
        negative_probability=min(globalmin, 0.0),
        negative_probability_core=min(globalmin_core, 0.0))


def _records_select(C, M):
    """Candidate-selection mode for the decision recorder: the global
    prob-ordered top_k wins at production caps, but at the large caps of
    complete-tree retries it degenerates into a full sort with a huge k
    that dominates the device phase (measured 42.9 s vs 2.7 s per L2048
    pass) — switch to the per-branch rowsort assembly there."""
    return "compact" if C >= 16 * M else "topk"


def device_search_spectrum(ins, ctx: ContractionContext,
                           excitations_encoding, M=2 ** 10,
                           relative_P_cutoff=1e-6, max_dEng=0.0, lim_hd=0,
                           min_dEng=1e-12, Dmax=32, tolS=1e-16, tolV=1e-10,
                           max_sweeps=20, graduate_truncation=True,
                           cand_factor=8, zipup_rsvd=None) -> SearchResult:
    """Device-record spectrum search (throughput mode).

    The device runs each lattice row as one jitted program
    (`tnax.parallel.row_records_prog`) making every beam decision itself and
    emitting a packed per-site decision record; rows are dispatched
    back-to-back so the accelerator runs ahead while the host replays exact
    float64 energies, states, degeneracies and droplet trees from the
    records. One device->host pull per row replaces the host-orchestrated
    path's three tunnel crossings per site.

    Semantics match :func:`search_spectrum` (and the reference,
    `tnac4o/tnac4o.py:727-1358`) except: branch selection (cutoff, merge
    representative, top-M) resolves at the compute dtype's precision (f32 on
    TPU), and the expanded candidate set is capped at ``cand_factor * M``
    per site (a warning is logged if the cutoff would have kept more — the
    reference merges the full post-cutoff set). Recorded droplet energies
    are always exact float64.
    """
    from . import parallel as par
    ee = excitations_encoding
    t_total = time.time()
    logger.info("Preprocessing boundary MPS (D=%d) ...", Dmax)
    ctx.build_boundary(Dmax, tolS, tolV, max_sweeps, graduate_truncation,
                       rsvd=zipup_rsvd)
    logger.info("Elapsed: %.2f s", time.time() - t_total)

    Ny, Nx, Np = ctx.Ny, ctx.Nx, ctx.Np
    dtype = ctx.dtype
    # cand_factor=None = the full M*Np expansion (uncapped, exact
    # reference merge semantics) — same contract as device_search_gs
    C = int(M * Np) if cand_factor is None \
        else int(min(cand_factor * M, M * Np))
    # pull cap: the device compacts each site's record to the merged
    # candidates (slot-sorted prefix); over a tunneled link the record
    # transfer dominates the complete-tree mode (~26 MB/s measured), and
    # typically only a few x M of the C candidates merge into kept slots.
    # n_valid > P flags the record exactly like a merge-cap overflow. At
    # the full M*Np expansion (auto_grow's terminal attempt) compaction is
    # disabled so the final retry is unconditionally complete.
    P = C if C >= M * Np else int(min(C, max(16 * M, -(-C // 8))))
    bits = max(1, int(np.ceil(np.log2(max(ctx.lh, ctx.lv)))))
    log2_cutoff = float(np.log2(relative_P_cutoff)) \
        if relative_P_cutoff > 0 else par.NEG
    EsP, EslP, EsuP = par._padded_energy_rows(ctx)
    nvalid = jnp.asarray(ctx.nstates, jnp.int32)

    # dispatch all rows; jax async dispatch lets the device run ahead of the
    # host replay below
    beam = dict(vind=jnp.zeros((M, Nx + 1), jnp.int32),
                Eng=jnp.zeros((M,), dtype),
                prob=jnp.full((M,), par.NEG, dtype).at[0].set(0.0),
                valid=jnp.zeros((M,), bool).at[0].set(True))
    rec_handles = []
    for ny in range(Ny):
        row_tabs = dict(lB=ctx.lB[ny], drindex=ctx.drindex[ny], Es=EsP[ny],
                        Esl=EslP[ny], Esu=EsuP[ny],
                        dmap=jnp.asarray(ctx.dmap[ny]),
                        rmap=jnp.asarray(ctx.rmap[ny]), nvalid=nvalid[ny])
        beam, recs = par.row_records_prog(
            beam, row_tabs, ctx.rhoT[ny + 1], ctx.Wt[ny], M=M, C=C, Nx=Nx,
            bits=bits, min_dEng=float(min_dEng), log2_cutoff=log2_cutoff,
            P=P, select=_records_select(C, M))
        rec_handles.append(recs)

    import os as _os
    if _os.environ.get("TNAX_SPECTRUM_TIMING"):
        # split device wall from host replay (disables their overlap)
        rec_handles[-1].block_until_ready()
        logger.info("device phase done: %.2f s", time.time() - t_total)

    return _replay_records(ins, ctx, rec_handles, ee, M=M, C=C, P=P,
                           max_dEng=max_dEng, lim_hd=lim_hd,
                           min_dEng=min_dEng, t_total=t_total)


def _replay_records(ins, ctx, rec_handles, ee, *, M, C, P, max_dEng,
                    lim_hd, min_dEng, t_total):
    """Host replay of per-row device decision records: exact float64
    energies, states, degeneracies and droplet trees (the second half of
    :func:`device_search_spectrum`, factored out so the batched fleet
    driver :func:`multi_search_spectrum` can replay each instance of one
    vmapped dispatch)."""
    import os as _os
    from . import parallel as par
    Ny, Nx = ctx.Ny, ctx.Nx
    t_replay = time.time()

    # host replay: exact f64 bookkeeping + droplet trees from the records
    exc_init(ins)
    ins.el = [[] for _ in range(M)]
    if ee > 1:
        reset_adjacency(ins, ins.problem.J if ins.mode == "Ising" else None,
                        Nx, Ny,
                        ins.problem.ind if ins.mode == "Ising" else None)
    L = Nx * Ny
    Eng_h = np.zeros(M)
    states_h = np.zeros((M, L), dtype=np.int32)
    vind_h = np.zeros((M, Nx + 1), dtype=np.int32)
    deg_h = np.ones(M, dtype=np.int64)
    out_valid = np.zeros(M, bool)
    out_valid[0] = True
    out_prob = np.full(M, par.NEG)
    out_prob[0] = 0.0
    pd_max, globalmin, globalmin_core = -np.inf, 1.0, 0.0
    overflow, count_max = 0, 0
    negp_site = (0, 0)
    gc_watermark = 1024

    for ny in range(Ny):
        t_row = time.time()
        if ny + 1 < Ny and hasattr(rec_handles[ny + 1],
                                   "copy_to_host_async"):
            # overlap the next row's device->host record transfer (a few
            # MB over the tunneled link) with this row's host replay
            rec_handles[ny + 1].copy_to_host_async()
        R = np.asarray(rec_handles[ny])     # one pull per row
        for nx in range(Nx):
            r = R[nx]
            src = r[:P]
            indc = r[P:2 * P]
            slot = r[2 * P:3 * P]
            rep = r[3 * P:3 * P + M]
            cprob = r[3 * P + M:4 * P + M].view(np.float32).astype(np.float64)
            out_prob = r[4 * P + M:4 * P + 2 * M].view(np.float32) \
                .astype(np.float64)
            out_valid = r[4 * P + 2 * M:4 * P + 3 * M].astype(bool)
            n_valid = int(r[-6])
            count = int(r[-5])
            disc_cut, disc_m, minP, minP_core = (
                float(x) for x in r[-4:].view(np.float32))
            if count > C or n_valid > P:
                overflow += 1
            count_max = max(count_max, count)
            if n_valid > P:
                # size the auto-grow retry so the grown pull cap
                # (max(16M, C'/8)) covers this site's merged-candidate set
                count_max = max(count_max, 4 * n_valid)
            for disc in (disc_cut, disc_m):
                if disc > par.NEG / 2:
                    pd_max = max(pd_max, disc)
            if minP < globalmin:
                globalmin, negp_site = minP, (ny, nx)
            globalmin_core = min(globalmin_core, minP_core)

            Es, Esl, Esu = ctx.energy_tables(ny, nx)
            n = len(Es)
            ic = np.minimum(indc, n - 1)    # clamp padded junk candidates
            E_cand = Eng_h[src] + Es[ic] + Esl[ic, vind_h[src, nx]] \
                + Esu[ic, vind_h[src, nx + 1]]
            col = ny * Nx + nx

            # the record's prefix is already the merged candidates sorted
            # by slot (device-side compaction), so grouping is a prefix
            # slice — no host sort
            gidx = np.arange(min(n_valid, P))
            gsl = slot[gidx]
            starts = np.flatnonzero(np.r_[True, gsl[1:] != gsl[:-1]])
            ends = np.r_[starts[1:], len(gsl)]

            # vectorized exact degeneracy (reference tnac4o/tnac4o.py:492-509)
            degn = np.zeros(M, dtype=np.int64)
            if len(gidx):
                Eo = E_cand[gidx]
                Emin_g = np.minimum.reduceat(Eo, starts)
                gpos = np.repeat(np.arange(len(starts)), ends - starts)
                near = (Eo - Emin_g[gpos]) <= min_dEng
                dego = np.where(near, deg_h[src[gidx]], 0)
                degn[gsl[starts]] = np.add.reduceat(dego, starts)

            # droplet recording, batched: excitation trees are shared with
            # the parent branch (copy-on-append), the cdE filter and state
            # XORs run vectorized over all losers of the site at once
            psrc = src[rep]
            new_el = [ins.el[int(p)] if v else []
                      for p, v in zip(psrc, out_valid)]
            if len(gidx):
                rep_of_group = rep[gsl[starts]]     # candidate idx per group
                gpos = np.repeat(np.arange(len(starts)), ends - starts)
                cdE_all = E_cand[gidx] - E_cand[rep_of_group[gpos]]
                sel = (gidx != rep_of_group[gpos]) & (cdE_all <= max_dEng)
                l_idx, l_grp, l_cdE = gidx[sel], gpos[sel], cdE_all[sel]
                if l_idx.size:
                    lr = rep_of_group[l_grp]
                    st_l = states_h[src[l_idx]]     # fancy index -> copies
                    st_l[:, col] = indc[l_idx]
                    st_r = states_h[src[lr]]
                    st_r[:, col] = indc[lr]
                    dx = np.bitwise_xor(st_r, st_l)
                    rows_nz, cols_nz = np.nonzero(dx)
                    bounds = np.searchsorted(rows_nz,
                                             np.arange(len(l_idx) + 1))
                    elem = None
                    if ee == 2 and ins.mode == "Ising":
                        # whole site's connectivity checks in one native
                        # call (identical semantics to the per-loser
                        # exc_elementary inside record_losers)
                        elem = _elem_batch(ins, cols_nz,
                                           dx[rows_nz, cols_nz], bounds)
                    gs2 = np.flatnonzero(np.r_[True, l_grp[1:] != l_grp[:-1]])
                    ge2 = np.r_[gs2[1:], len(l_grp)]
                    slot_of_group = gsl[starts]
                    for a, b in zip(gs2, ge2):
                        kk = int(slot_of_group[l_grp[a]])
                        bel = new_el[kk][:]
                        losers = []
                        for t in range(a, b):
                            ii = int(l_idx[t])
                            dpos = cols_nz[bounds[t]:bounds[t + 1]] \
                                .astype(np.int64)
                            if dpos.size == 0:
                                # a loser identical to its representative
                                # carries no droplet; only reachable when
                                # a pull-cap overflow clamped the rep (the
                                # record is flagged for retry anyway)
                                continue
                            losers.append((l_cdE[t], dpos,
                                           dx[t, dpos].astype(np.int64),
                                           cprob[ii] - out_prob[kk],
                                           ins.el[src[ii]],
                                           None if elem is None
                                           else bool(elem[t])))
                        record_losers(ins, ee, bel, losers, ny, nx, Nx,
                                      max_dEng, lim_hd)
                        new_el[kk] = bel

            # replayed beam update
            Eng_h = np.where(out_valid, E_cand[rep], 0.0)
            states_h = states_h[psrc]
            states_h[:, col] = indc[rep]
            vind_h = vind_h[psrc]
            vind_h[:, nx] = ctx.dmap[ny, nx][indc[rep]]
            vind_h[:, nx + 1] = ctx.rmap[ny, nx][indc[rep]]
            deg_h = degn
            ins.el = new_el
            if ee < 3 and len(ins.d) > gc_watermark:
                # the reference gc's every site (tnac4o/tnac4o.py:876);
                # gc only reclaims memory, so the replay amortizes it —
                # walk the trees when the shape dict has doubled, not at
                # every site (the final gc below restores the reference's
                # live-shapes-only dictionary for save/load parity)
                exc_gc(ins)
                gc_watermark = max(1024, 2 * len(ins.d))
        if ee == 3:
            exc_gc(ins)
        vind_h[:, 1:] = vind_h[:, :-1]
        vind_h[:, 0] = 0
        logger.info("Row %d/%d replayed: %d branches, %d shapes, %.2f s",
                    ny + 1, Ny, int(out_valid.sum()), len(ins.d),
                    time.time() - t_row)

    if overflow:
        logger.warning(
            "candidate cap C=%d exceeded at %d sites (max post-cutoff "
            "count %d) — some merge losers were not recorded; "
            "cand_factor >= %d makes the spectrum complete "
            "(result.merge_overflow carries this exactness flag)",
            C, overflow, count_max, -(-count_max // M))
    if globalmin < -0.5:
        logger.warning(
            "negative_probability %.3g saturated at site (ny=%d, nx=%d) — "
            "a tail branch below the f32 boundary noise floor fully "
            "clamped (harmless for the recorded spectrum; within-cutoff "
            "negativeness negative_probability_core=%.3g)",
            globalmin, *negp_site, globalmin_core)
    if _os.environ.get("TNAX_SPECTRUM_TIMING"):
        logger.info("host replay phase: %.2f s", time.time() - t_replay)
    logger.info("Spectrum search total: %.2f s", time.time() - t_total)

    keep = np.flatnonzero(out_valid)
    ins.el = [ins.el[kk] for kk in keep]
    if ee < 3:
        exc_gc(ins)      # reference parity: d holds live shapes only
    _finalize_spectrum(ins, ee, lim_hd)
    return SearchResult(
        energy=Eng_h[keep], probability=out_prob[keep],
        degeneracy=int(deg_h[keep[0]]), states=states_h[keep],
        discarded_probability=float(pd_max),
        negative_probability=min(globalmin, 0.0),
        negative_probability_core=min(globalmin_core, 0.0),
        merge_overflow=overflow, count_max=count_max)


def multi_search_spectrum(inss, ctxs, excitations_encoding, M=2 ** 10,
                          relative_P_cutoff=1e-6, max_dEng=0.0, lim_hd=0,
                          min_dEng=1e-12, Dmax=32, tolS=1e-16, tolV=1e-10,
                          max_sweeps=20, graduate_truncation=True,
                          cand_factor=8, n_live=None):
    """Batched device-record spectrum search over same-shape instances
    (fleet spectrum — the production pattern of reference
    `examples/e03_search_spectrum_droplet_instances.py:22-28`: 100
    instances x rotations, each recording its droplet tree).

    Every device stage — boundary-MPS stacks and the per-row decision
    recorder :func:`tnax.parallel.row_records_prog` — is vmapped over the
    instance axis exactly as `tnax.parallel.multi_search_gs` vmaps
    `row_step`, so all B instances' beam decisions ride one device
    dispatch per row; the host then replays each instance's exact f64
    droplet bookkeeping from its slice of the records (the replay of
    instance b overlaps the device work of rows already dispatched).

    ``inss``/``ctxs`` are parallel lists of solver instances and their
    contraction contexts. No auto-grow here: callers inspect each
    result's ``merge_overflow`` and retry stragglers individually (the
    fleet contract mirrors `multi_search_gs`). Returns a list of
    SearchResult.
    """
    from functools import partial
    import jax
    from . import parallel as par
    ee = excitations_encoding
    assert inss and len(inss) == len(ctxs), "need parallel inss/ctxs lists"
    c0 = ctxs[0]
    for c in ctxs:
        assert (c.Ny, c.Nx, c.Np, c.lh, c.lv) == \
            (c0.Ny, c0.Nx, c0.Np, c0.lh, c0.lv), "instances must share shapes"
    B = len(ctxs)
    t_total = time.time()
    Ny, Nx, Np = c0.Ny, c0.Nx, c0.Np
    dtype = c0.dtype
    C = int(M * Np) if cand_factor is None \
        else int(min(cand_factor * M, M * Np))
    P = C if C >= M * Np else int(min(C, max(16 * M, -(-C // 8))))
    bits = max(1, int(np.ceil(np.log2(max(c0.lh, c0.lv)))))
    log2_cutoff = float(np.log2(relative_P_cutoff)) \
        if relative_P_cutoff > 0 else par.NEG

    Wt = jnp.stack([c.Wt for c in ctxs])
    lB = jnp.stack([c.lB for c in ctxs])
    drindex = jnp.stack([c.drindex for c in ctxs])
    eng_rows = [par._padded_energy_rows(c) for c in ctxs]
    EsP = jnp.stack([e[0] for e in eng_rows])
    EslP = jnp.stack([e[1] for e in eng_rows])
    EsuP = jnp.stack([e[2] for e in eng_rows])
    nvalid = jnp.stack([jnp.asarray(c.nstates, jnp.int32) for c in ctxs])
    dmap = jnp.stack([jnp.asarray(c.dmap) for c in ctxs])
    rmap = jnp.stack([jnp.asarray(c.rmap) for c in ctxs])

    import jax.numpy as jnp_
    build = jax.vmap(lambda w: engine.build_rhoT(
        w, Dmax=Dmax, tolS=tolS, tolV=tolV, max_sweeps=max_sweeps,
        graduate=graduate_truncation))
    rhoT, _, _, _ = jax.jit(build)(Wt)           # (B, Ny+1, Nx, D, lv, D)

    prog = partial(par.row_records_prog, M=M, C=C, Nx=Nx, bits=bits,
                   min_dEng=float(min_dEng), log2_cutoff=log2_cutoff, P=P,
                   select=_records_select(C, M))
    progB = jax.jit(jax.vmap(prog))

    beam = dict(vind=jnp_.zeros((B, M, Nx + 1), jnp_.int32),
                Eng=jnp_.zeros((B, M), dtype),
                prob=jnp_.full((B, M), par.NEG, dtype).at[:, 0].set(0.0),
                valid=jnp_.zeros((B, M), bool).at[:, 0].set(True))
    rec_rows = []
    for ny in range(Ny):
        row_tabs = dict(lB=lB[:, ny], drindex=drindex[:, ny], Es=EsP[:, ny],
                        Esl=EslP[:, ny], Esu=EsuP[:, ny], dmap=dmap[:, ny],
                        rmap=rmap[:, ny], nvalid=nvalid[:, ny])
        beam, recs = progB(beam, row_tabs, rhoT[:, ny + 1], Wt[:, ny])
        rec_rows.append(recs)        # (B, Nx, 4P+3M+6) device handles

    results = []
    # ``n_live``: callers that padded the batch to a fixed program shape
    # (jit-cache reuse) replay only the first n_live slots — the host
    # replay is the expensive half at large L, and padded duplicates
    # would replay it again for nothing
    for b, (ins, ctx) in enumerate(zip(inss, ctxs)):
        if n_live is not None and b >= n_live:
            break
        ins.excitations_encoding = ee
        handles = [rec_rows[ny][b] for ny in range(Ny)]
        results.append(_replay_records(
            ins, ctx, handles, ee, M=M, C=C, P=P, max_dEng=max_dEng,
            lim_hd=lim_hd, min_dEng=min_dEng, t_total=t_total))
    return results


def sharded_search_spectrum(ins, ctx: ContractionContext,
                            excitations_encoding, mesh, M=2 ** 10,
                            relative_P_cutoff=1e-6, max_dEng=0.0, lim_hd=0,
                            min_dEng=1e-12, Dmax=32, tolS=1e-16, tolV=1e-10,
                            max_sweeps=20, graduate_truncation=True,
                            cand_factor=8) -> SearchResult:
    """Beam-sharded device-record spectrum search over a mesh 'beam' axis
    (VERDICT r2 next-round task 9 — new design, no reference analogue).

    The M beam branches shard across devices; each site's candidate
    expansion and local top-C/n run per shard, the merge + decision-record
    construction replicate after an `all_gather` (the collective pattern
    of `tnax.parallel.row_step`), and the emitted records are identical on
    every shard — so the host replay (:func:`_replay_records`) is exactly
    the single-chip one. Validated sharded == unsharded on a virtual CPU
    mesh (`tests/test_sharded_equiv.py`).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec
    from . import parallel as par
    ee = excitations_encoding
    t_total = time.time()
    n_beam = mesh.shape["beam"]
    if M % n_beam:
        raise ValueError(f"M={M} does not tile the beam axis ({n_beam})")
    ctx.build_boundary(Dmax, tolS, tolV, max_sweeps, graduate_truncation)
    Ny, Nx, Np = ctx.Ny, ctx.Nx, ctx.Np
    dtype = ctx.dtype
    C = int(M * Np) if cand_factor is None \
        else int(min(cand_factor * M, M * Np))
    C -= C % n_beam
    P = C if C >= M * Np else int(min(C, max(16 * M, -(-C // 8))))
    bits = max(1, int(np.ceil(np.log2(max(ctx.lh, ctx.lv)))))
    log2_cutoff = float(np.log2(relative_P_cutoff)) \
        if relative_P_cutoff > 0 else par.NEG
    EsP, EslP, EsuP = par._padded_energy_rows(ctx)
    nvalid = jnp.asarray(ctx.nstates, jnp.int32)

    beam_sh = NamedSharding(mesh, PartitionSpec("beam"))
    repl = NamedSharding(mesh, PartitionSpec())
    step = par.sharded_row_records(mesh, M=M, C=C, Nx=Nx, bits=bits,
                                   min_dEng=float(min_dEng),
                                   log2_cutoff=log2_cutoff, P=P)
    envs = jax.jit(engine.row_right_envs, out_shardings=repl)

    beam = dict(vind=jnp.zeros((M, Nx + 1), jnp.int32),
                Eng=jnp.zeros((M,), dtype),
                prob=jnp.full((M,), par.NEG, dtype).at[0].set(0.0),
                valid=jnp.zeros((M,), bool).at[0].set(True))
    beam = {k: jax.device_put(v, beam_sh) for k, v in beam.items()}
    rec_handles = []
    for ny in range(Ny):
        row_tabs = dict(lB=ctx.lB[ny], drindex=ctx.drindex[ny], Es=EsP[ny],
                        Esl=EslP[ny], Esu=EsuP[ny],
                        dmap=jnp.asarray(ctx.dmap[ny]),
                        rmap=jnp.asarray(ctx.rmap[ny]), nvalid=nvalid[ny])
        row_tabs = {k: jax.device_put(v, repl) for k, v in row_tabs.items()}
        AT_row = jax.device_put(ctx.rhoT[ny + 1], repl)
        # RRs indexes by global row-start branch ids inside each shard,
        # so it must be replicated over the beam axis
        RRs = envs(AT_row, jax.device_put(ctx.Wt[ny], repl),
                   jax.device_put(beam["vind"][:, 1:], repl))
        beam, recs = step(beam, row_tabs, RRs, AT_row)
        rec_handles.append(recs)

    return _replay_records(ins, ctx, rec_handles, ee, M=M, C=C, P=P,
                           max_dEng=max_dEng, lim_hd=lim_hd,
                           min_dEng=min_dEng, t_total=t_total)
