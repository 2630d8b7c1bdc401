"""Native droplet kernels (tnax/native/droplets.c) vs independent NumPy
re-implementations on random shapes/graphs."""

import numpy as np
import pytest

from tnax import native
from tnax import spectrum


@pytest.fixture(scope="module")
def lib():
    L = native.lib()
    if L is None:
        pytest.skip("no C toolchain for native kernels")
    return L


def _rand_shape(rng, L=64):
    n = rng.integers(1, 8)
    pos = np.sort(rng.choice(L, size=n, replace=False)).astype(np.int64)
    st = rng.integers(1, 256, size=n).astype(np.int64)
    return pos, st


def test_hd_pair(lib):
    rng = np.random.default_rng(0)
    for _ in range(50):
        p1, s1 = _rand_shape(rng)
        p2, s2 = _rand_shape(rng)
        want = 0
        d = {}
        for p, s in zip(p1, s1):
            d[p] = d.get(p, 0) ^ int(s)
        for p, s in zip(p2, s2):
            d[p] = d.get(p, 0) ^ int(s)
        want = sum(bin(v).count("1") for v in d.values())
        got = lib.tnax_hd_pair_ising(p1, s1, len(p1), p2, s2, len(p2))
        assert got == want


def test_hd_pair_rmf(lib):
    rng = np.random.default_rng(3)
    for _ in range(50):
        p1, s1 = _rand_shape(rng)
        p2, s2 = _rand_shape(rng)
        m1, m2 = dict(zip(p1, s1)), dict(zip(p2, s2))
        want = sum(1 for p in set(m1) | set(m2)
                   if m1.get(p) != m2.get(p))
        got = lib.tnax_hd_pair_rmf(p1, s1, len(p1), p2, s2, len(p2))
        assert got == want


def test_merge_shapes(lib):
    rng = np.random.default_rng(1)
    for _ in range(50):
        p1, s1 = _rand_shape(rng)
        p2, s2 = _rand_shape(rng)
        d = {}
        for p, s in zip(p1, s1):
            d[p] = d.get(p, 0) ^ int(s)
        for p, s in zip(p2, s2):
            d[p] = d.get(p, 0) ^ int(s)
        want = sorted((p, v) for p, v in d.items() if v)
        pos = np.empty(len(p1) + len(p2), np.int64)
        st = np.empty(len(p1) + len(p2), np.int64)
        k = lib.tnax_merge_shapes(p1, s1, len(p1), p2, s2, len(p2), pos, st)
        got = list(zip(pos[:k], st[:k]))
        assert got == want


def test_overlap_or_rows(lib):
    rng = np.random.default_rng(2)
    L = 130
    W = (L + 63) // 64
    rows = rng.integers(0, 2 ** 63, size=(L, W), dtype=np.int64) \
        .astype(np.uint64)
    for _ in range(20):
        idx = np.sort(rng.choice(L, size=rng.integers(1, 6),
                                 replace=False)).astype(np.int64)
        out = np.empty(W, np.uint64)
        lib.tnax_or_rows(rows, W, idx, len(idx), out)
        assert (out == np.bitwise_or.reduce(rows[idx], axis=0)).all()
        a, b = out, rows[int(idx[0])].copy()
        assert lib.tnax_overlap(a, b, W) == int(bool((a & b).any()))


def test_elementary_vs_python(lib):
    rng = np.random.default_rng(4)
    L = 100
    W = (L + 63) // 64
    adj = np.zeros((L, L), bool)
    for _ in range(160):
        i, j = rng.integers(0, L, 2)
        if i != j:
            adj[i, j] = adj[j, i] = True
    padded = np.zeros((L, W * 64), bool)
    padded[:, :L] = adj
    adj_bits = np.packbits(padded, axis=-1, bitorder="little") \
        .view(np.uint64).reshape(L, W)
    for _ in range(100):
        spins = np.sort(rng.choice(L, size=rng.integers(1, 10),
                                   replace=False)).astype(np.int64)
        # reference-style BFS on the dense matrix
        grp, rest = spins[:1], spins[1:]
        while grp.size and rest.size:
            hit = np.any(adj[grp][:, rest], axis=0)
            grp, rest = rest[hit], rest[~hit]
        want = rest.size == 0
        got = lib.tnax_elementary(adj_bits, W, spins, len(spins))
        assert got == int(want)


def test_spectrum_module_uses_native(lib):
    assert native.lib() is not None
    assert spectrum._native.lib() is not None


def test_native_spins_matches_python():
    """CSR spin expansion (tnax_spins) == the pure-Python xor2ind walk."""
    import tnax
    from tnax import spectrum, native
    if native.lib() is None:
        import pytest
        pytest.skip("no C toolchain")
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_search_small import make_chimera_like
    J = make_chimera_like(np.random.default_rng(0), 2, 2, 4)
    ins = tnax.Solver(mode="Ising", Nx=2, Ny=2, Nc=4, beta=1, J=J)
    spectrum.reset_adjacency(ins, ins.problem.J, 2, 2, ins.problem.ind)
    rng = np.random.default_rng(1)
    for _ in range(50):
        n = rng.integers(1, 4)
        dpos = np.sort(rng.choice(4, size=n, replace=False)).astype(np.int64)
        dstate = np.array([rng.integers(1, len(ins.xor2ind[p]))
                           for p in dpos], dtype=np.int64)
        want = np.hstack([ins.xor2ind[p][s]
                          for p, s in zip(dpos, dstate)]).astype(np.int64)
        got = spectrum._flipped_spins(ins, dpos, dstate)
        assert np.array_equal(got, want)


def test_elem_batch_matches_per_loser():
    """Batched site-level connectivity flags (tnax_elem_batch) == the
    per-loser exc_elementary calls they replace."""
    import tnax
    from tnax import spectrum, native
    if native.lib() is None:
        import pytest
        pytest.skip("no C toolchain")
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_search_small import make_chimera_like
    rng = np.random.default_rng(5)
    J = make_chimera_like(rng, 3, 3, 4)
    ins = tnax.Solver(mode="Ising", Nx=3, Ny=3, Nc=4, beta=1, J=J)
    spectrum.reset_adjacency(ins, ins.problem.J, 3, 3, ins.problem.ind)
    nsites = len(ins.xor2ind)
    dpos_all, dstate_all, bounds = [], [], [0]
    for _ in range(200):
        n = int(rng.integers(1, 5))
        dpos = np.sort(rng.choice(nsites, size=n,
                                  replace=False)).astype(np.int64)
        dstate = np.array([rng.integers(1, len(ins.xor2ind[p]))
                           for p in dpos], np.int64)
        dpos_all.append(dpos)
        dstate_all.append(dstate)
        bounds.append(bounds[-1] + n)
    flags = spectrum._elem_batch(ins, np.concatenate(dpos_all),
                                 np.concatenate(dstate_all),
                                 np.asarray(bounds, np.int64))
    assert flags is not None
    for t, (dpos, dstate) in enumerate(zip(dpos_all, dstate_all)):
        assert bool(flags[t]) == bool(
            spectrum.exc_elementary(ins, dpos, dstate))


def test_unpack_v2_native_parity(lib):
    """The native unpack_v2 kernel enumerates the identical state set as
    the Python traversal — energies AND decoded states — on a real
    spectrum with pruning binding (max_states below the enumerable
    count), across ee=2 and ee=3."""
    import tnax
    from tnax import spectrum
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_search_small import make_chimera_like
    rng = np.random.default_rng(11)
    J = make_chimera_like(rng, 3, 3, 4)
    for ee in (2, 3):
        np.random.seed(3)
        ins = tnax.Solver(mode="Ising", Nx=3, Ny=3, Nc=4, beta=2, J=J)
        ins.add_noise(amplitude=1e-7)
        ins.search_low_energy_spectrum(excitations_encoding=ee, Dmax=8,
                                       M=256, max_dEng=2.0,
                                       relative_P_cutoff=1e-10)
        for ms in (8, 64, np.inf):
            args = (ins, ins.el, 2.0, ms, ee == 3)
            nat = spectrum._unpack_v2_native(*args)
            assert nat is not None
            ref = spectrum._unpack_v2_ising(*args)
            E_n, f_n = nat
            E_r, f_r = ref
            assert len(E_n) == len(E_r)
            # same state set: compare (energy, flip multiset) pairs
            key_n = sorted((round(e, 12), tuple(sorted(f)))
                           for e, f in zip(E_n.tolist(), f_n))
            key_r = sorted((round(e, 12), tuple(sorted(f)))
                           for e, f in zip(E_r.tolist(), f_r))
            assert key_n == key_r, (ee, ms)
