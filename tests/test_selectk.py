"""top_k_radix must be bit-identical to lax.top_k (values, indices,
tie-break order) — the contract that lets it drop into the search scan
as a selection backend with zero semantic risk."""

import numpy as np
import jax.numpy as jnp
from jax import lax

from tnax.selectk import top_k_radix

NEG = -1e30


def check(vals, k):
    v1, i1 = lax.top_k(jnp.asarray(vals, jnp.float32), k)
    v2, i2 = top_k_radix(jnp.asarray(vals, jnp.float32), k)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_random():
    rng = np.random.default_rng(0)
    for n, k in ((1024, 16), (4096, 129), (4096, 4095)):
        check(rng.normal(size=n).astype(np.float32), k)


def test_heavy_ties():
    rng = np.random.default_rng(1)
    # few distinct values -> many exact ties; tie-break order must match
    vals = rng.choice(np.float32([-2.5, -1.0, 0.0, 0.5, 3.25]), size=4096)
    for k in (1, 7, 256, 1000):
        check(vals, k)


def test_neg_sentinel_and_negatives():
    rng = np.random.default_rng(2)
    vals = rng.normal(size=2048).astype(np.float32) - 5.0
    vals[rng.integers(0, 2048, size=1500)] = NEG   # masked candidates
    check(vals, 512)


def test_all_equal():
    check(np.full(512, 1.5, np.float32), 100)


def test_search_scan_shape():
    """The flagship shape: 262144 candidates, k=8193."""
    rng = np.random.default_rng(3)
    probf = (rng.normal(size=262144).astype(np.float32) - 30.0)
    probf[rng.integers(0, 262144, size=200000)] = NEG
    check(probf, 8193)


def test_device_search_radix_bit_identical():
    """select='radix' through the whole device GS search reproduces
    select='topk' exactly (energy, degeneracy, diagnostics)."""
    import tnax
    from tnax import parallel
    from tnax.search import ContractionContext
    from test_search_small import make_chimera_like

    rng = np.random.default_rng(23)
    J = make_chimera_like(rng, 2, 2, 3)
    ins = tnax.Solver(mode="Ising", Nx=2, Ny=2, Nc=3, beta=1.5, J=J)
    ctx = ContractionContext(ins.problem, beta=1.5)
    a = parallel.device_search_gs(ctx, M=64, relative_P_cutoff=1e-10,
                                  Dmax=8, select="topk")
    b = parallel.device_search_gs(ctx, M=64, relative_P_cutoff=1e-10,
                                  Dmax=8, select="radix")
    assert a["energy"] == b["energy"]
    assert a["degeneracy"] == b["degeneracy"]
    assert a["count_max"] == b["count_max"]
    np.testing.assert_array_equal(a["states"], b["states"])
    assert a["prob"] == b["prob"]
