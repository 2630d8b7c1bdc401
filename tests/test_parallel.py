"""Device-resident search + multi-chip sharding tests (8 virtual devices)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tnax
from tnax import parallel
from tnax.search import ContractionContext, merge_by_vind
from test_search_small import make_chimera_like, brute_force_min


def test_device_merge_matches_host():
    rng = np.random.default_rng(0)
    M, C = 64, 5
    vind = rng.integers(0, 3, size=(M, C)).astype(np.int32)
    Eng = np.round(rng.normal(size=M), 1)  # induce ties
    prob = rng.normal(size=M)
    deg = rng.integers(1, 4, size=M).astype(np.int64)
    valid = np.ones(M, bool)

    vindn, rep, degn, probn, *_ = merge_by_vind(vind, Eng, prob, deg, 1e-12)
    slot, drep, dp, dE, dvalid, disc, dd = parallel.merge_candidates(
        jnp.asarray(vind), jnp.asarray(Eng), jnp.asarray(prob),
        jnp.asarray(valid), 1e-12, bits=2, M=M,
        deg=jnp.asarray(parallel.deg_encode(deg)))
    dvalid = np.asarray(dvalid)
    dd = parallel.deg_decode(dd)
    got = sorted(zip(np.asarray(dE)[dvalid], dd[dvalid],
                     np.round(np.asarray(dp)[dvalid], 10)))
    want = sorted(zip(Eng[rep], degn, np.round(probn, 10)))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == pytest.approx(w[0])
        assert g[1] == w[1]
        assert g[2] == pytest.approx(w[2])


def test_device_degeneracy_beyond_int32():
    """Multi-limb degeneracy counters sum exactly past 2^31 (measured C16
    degeneracies reach 1.37e9 and ensembles overflow int32; VERDICT.md
    weakness 3)."""
    base = int(1.9e9)                  # near int32 max, per member
    deg = np.array([base, base, base, 7], dtype=np.int64)
    vind = np.zeros((4, 2), np.int32)  # all merge into one group
    Eng = np.zeros(4)
    prob = np.full(4, -1.0)
    valid = np.ones(4, bool)
    slot, rep, dp, dE, dvalid, disc, dd = parallel.merge_candidates(
        jnp.asarray(vind), jnp.asarray(Eng), jnp.asarray(prob),
        jnp.asarray(valid), 1e-12, bits=1, M=4,
        deg=jnp.asarray(parallel.deg_encode(deg)))
    total = parallel.deg_decode(dd)[np.asarray(dvalid)]
    assert total.tolist() == [3 * base + 7]  # 5.7e9 > 2^31


def test_merge_before_truncate_semantics():
    """Members of a surviving group beyond the beam width still contribute
    degeneracy: the merge runs over the full candidate set BEFORE top-M,
    matching the reference (tnac4o/tnac4o.py:481-526). A merge-after-top-M
    implementation (the round-1 device GS path) would report deg=1."""
    M = 2
    C = 10
    # group A: 9 identical-vind members, individually low-prob, all at Emin
    # group B: 1 high-prob singleton
    vind = np.r_[np.zeros((C - 1, 2)), np.ones((1, 2))].astype(np.int32)
    Eng = np.r_[np.zeros(C - 1), [1.0]]
    prob = np.r_[np.full(C - 1, -10.0), [0.0]]
    valid = np.ones(C, bool)
    slot, rep, dp, dE, dvalid, disc, dd = parallel.merge_candidates(
        jnp.asarray(vind), jnp.asarray(Eng), jnp.asarray(prob),
        jnp.asarray(valid), 1e-12, bits=1, M=M,
        deg=jnp.asarray(parallel.deg_encode(np.ones(C, np.int64))))
    dd = parallel.deg_decode(dd)
    dvalid = np.asarray(dvalid)
    got = sorted(zip(np.asarray(dE)[dvalid], dd[dvalid]))
    assert got == [(0.0, C - 1), (1.0, 1)]


def test_device_search_matches_brute_force():
    rng = np.random.default_rng(3)
    Nx, Ny, Nc = 2, 2, 2
    J = make_chimera_like(rng, Nx, Ny, Nc)
    ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, beta=2, J=J)
    ctx = ContractionContext(ins.problem, beta=2)
    res = parallel.device_search_gs(ctx, M=64, relative_P_cutoff=1e-12,
                                    Dmax=8)
    Emin, _ = brute_force_min(J, Nx * Ny * Nc)
    assert res["energy"] == pytest.approx(Emin, abs=1e-9)


def test_device_search_degeneracy():
    rng = np.random.default_rng(5)
    Nx, Ny, Nc = 2, 2, 2
    J = make_chimera_like(rng, Nx, Ny, Nc, field=False)
    J = [j for j in tnax.round_Jij(J, 1.0) if j[2] != 0]
    ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, beta=1.5, J=J)
    ins.search_ground_state(M=256, relative_P_cutoff=1e-14, Dmax=16)
    ctx = ContractionContext(ins.problem, beta=1.5)
    res = parallel.device_search_gs(ctx, M=256, relative_P_cutoff=1e-14,
                                    Dmax=16)
    assert res["energy"] == pytest.approx(ins.energy[0], abs=1e-9)
    assert res["degeneracy"] == ins.degeneracy


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_multichip_dryrun():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    Pn, mPn = fn(*args)
    Pn = np.asarray(Pn)
    assert Pn.shape == (1024, 256)
    assert np.allclose(Pn.sum(axis=1), 1.0, atol=1e-5)


def test_device_sample_distribution():
    rng = np.random.default_rng(12)
    J = make_chimera_like(rng, 2, 1, 2)
    ins = tnax.Solver(mode="Ising", Nx=2, Ny=1, Nc=2, beta=1, J=J)
    ctx = ContractionContext(ins.problem, 1.0)
    res = parallel.device_sample(ctx, M=4000, Dmax=8, seed=3)
    # exact energies recomputed on host must match energy_Jij through decode
    ins.states = res["states"][:, ins.order]
    E2 = tnax.energy_Jij(J, ins.binary_states())
    assert np.allclose(res["energy"], E2, atol=1e-9)
    _, Eall = brute_force_min(J, 4)
    p = np.exp(-(Eall - Eall.min()))
    p /= p.sum()
    vals, counts = np.unique(np.round(res["energy"], 9), return_counts=True)
    emp = dict(zip(vals, counts / 4000))
    theo = {}
    for e, pi in zip(np.round(Eall, 9), p):
        theo[e] = theo.get(e, 0.0) + pi
    for v, f in emp.items():
        assert abs(f - theo[v]) < 0.05


def test_solver_device_paths():
    rng = np.random.default_rng(21)
    J = make_chimera_like(rng, 2, 2, 2)
    ins = tnax.Solver(mode="Ising", Nx=2, Ny=2, Nc=2, beta=2, J=J)
    E_host = ins.search_ground_state(M=64, relative_P_cutoff=1e-12, Dmax=8)[0]
    E_dev = ins.search_ground_state(M=64, relative_P_cutoff=1e-12, Dmax=8,
                                    path="device")[0]
    assert E_dev == pytest.approx(E_host, abs=1e-9)
    assert np.allclose(tnax.energy_Jij(J, ins.binary_states())[0], E_dev)
    E = ins.gibbs_sampling(M=16, Dmax=8, path="device", seed=5)
    assert len(E) == 16
    assert np.allclose(E, tnax.energy_Jij(J, ins.binary_states()), atol=1e-9)


def test_merge_candidates_matches_host():
    """merge_candidates (full candidate-set merge + top-M, feeding the
    device-record spectrum) reproduces merge_by_vind's groups, including
    slot membership and representative choice, on random data with ties."""
    rng = np.random.default_rng(1)
    Cn, cols, M = 96, 5, 16
    vind = rng.integers(0, 3, size=(Cn, cols)).astype(np.int32)
    Eng = np.round(rng.normal(size=Cn), 1)
    prob = rng.normal(size=Cn)
    valid = rng.random(Cn) > 0.1
    slot, rep, prob_out, Eng_out, out_valid, disc, _ = \
        parallel.merge_candidates(
            jnp.asarray(vind), jnp.asarray(Eng), jnp.asarray(prob),
            jnp.asarray(valid), 1e-12, bits=2, M=M)
    slot, rep = np.asarray(slot), np.asarray(rep)
    prob_out, Eng_out = np.asarray(prob_out), np.asarray(Eng_out)
    out_valid = np.asarray(out_valid)

    vh, Eh, ph = vind[valid], Eng[valid], prob[valid]
    dh = np.ones(valid.sum(), np.int64)
    vindn, hrep, degn, probn, *_ = merge_by_vind(vh, Eh, ph, dh, 1e-12)
    order = np.argsort(-probn)[:M]          # host top-M groups by prob

    # kept groups agree on (energy, prob); device slots sorted by prob
    got = sorted(zip(Eng_out[out_valid], np.round(prob_out[out_valid], 10)))
    want = sorted(zip(Eh[hrep][order], np.round(probn[order], 10)))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == pytest.approx(w[0])
        assert g[1] == pytest.approx(w[1])
    # membership: every valid candidate's slot groups identical vind rows,
    # rep is a min-energy member of its slot
    for kk in np.flatnonzero(out_valid):
        members = np.flatnonzero(slot == kk)
        assert members.size > 0
        assert (vind[members] == vind[int(rep[kk])]).all()
        assert Eng[int(rep[kk])] == pytest.approx(Eng[members].min())
    # invalid candidates never map to a slot
    assert (slot[~valid] == -1).all()


def test_device_search_packed_f32_pull():
    """The single packed result pull (f32 accelerator path) returns the
    same solution as the direct f64 pulls."""
    rng = np.random.default_rng(3)
    Nx, Ny, Nc = 2, 2, 2
    J = make_chimera_like(rng, Nx, Ny, Nc)
    ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, beta=2, J=J)
    r64 = parallel.device_search_gs(ContractionContext(ins.problem, beta=2),
                                    M=64, relative_P_cutoff=1e-12, Dmax=8)
    ctx32 = ContractionContext(ins.problem, beta=2, dtype=jnp.float32)
    r32 = parallel.device_search_gs(ctx32, M=64, relative_P_cutoff=1e-12,
                                    Dmax=8)
    assert r32["energy"] == pytest.approx(r64["energy"], abs=1e-4)
    assert (r32["states"] == r64["states"]).all()
    assert r32["degeneracy"] == r64["degeneracy"]


def test_deg_limbs_roundtrip():
    rng = np.random.default_rng(9)
    vals = np.concatenate([
        rng.integers(0, 2 ** 62, 58),      # random across the range
        [0, 1, 2 ** 31 - 1, 2 ** 31, 2 ** 47, 1371340800 * 64],
    ]).astype(np.int64)
    vals = np.abs(vals) % (1 << (parallel.DEG_BITS * parallel.DEG_LIMBS))
    enc = parallel.deg_encode(vals)
    assert (parallel.deg_decode(enc) == vals).all()
    # device carry propagation after a summation
    pairs = jnp.asarray(enc[:32]) + jnp.asarray(enc[32:64])
    got = parallel.deg_decode(parallel._deg_carry(pairs))
    assert (got == vals[:32] + vals[32:64]).all()


def test_device_degeneracy_beyond_2_48():
    """Counts sum exactly past 2^48 through a device merge (VERDICT r2
    weakness 5: 4 limbs capped at 2^48 with ensembles measured at 2^43;
    now 5 limbs = 2^60)."""
    base = (1 << 47) + 12345
    deg = np.array([base, base, base, base, 3], dtype=np.int64)
    vind = np.zeros((5, 2), np.int32)
    Eng = np.zeros(5)
    prob = np.full(5, -1.0)
    valid = np.ones(5, bool)
    *_, dvalid, disc, dd = parallel.merge_candidates(
        jnp.asarray(vind), jnp.asarray(Eng), jnp.asarray(prob),
        jnp.asarray(valid), 1e-12, bits=1, M=5,
        deg=jnp.asarray(parallel.deg_encode(deg)))
    total = parallel.deg_decode(dd)[np.asarray(dvalid)]
    assert total.tolist() == [4 * base + 3]  # > 2^49


def test_deg_seg_sum_huge_candidate_set():
    """Limb-wise segment sums stay exact when a merge group has more than
    2^19 members (ADVICE r2: a single int32 segment-sum of 12-bit limbs
    overflows there; reachable at the documented M=16384 full-expansion
    retries where M*Np = 2^22). The split-halves path is exact to 2^25."""
    C = (1 << 20) + 17
    rng = np.random.default_rng(13)
    vals = rng.integers(1 << 11, 1 << 12, C).astype(np.int64)
    vals[0] = (1 << 12) - 1
    seg = jnp.zeros((C,), jnp.int32)          # one giant group
    near = jnp.ones((C,), bool)
    enc = jnp.asarray(parallel.deg_encode(vals))
    out = parallel._deg_carry(
        parallel._deg_seg_sum(enc, near, seg, C))
    got = parallel.deg_decode(np.asarray(out[0]))
    want = int(vals.sum())
    # the raw limb-0 sum really does exceed int32 — the single-pass
    # segment_sum would have wrapped here
    assert int((vals & ((1 << parallel.DEG_BITS) - 1)).sum()) > 2 ** 31
    assert int(got) == want


def test_gs_degeneracy_capped_vs_uncapped():
    """The J124-C16 ensemble failure mode in miniature: with a candidate
    cap small enough to drop degenerate candidates before the merge,
    device GS degeneracy undercounts and merge_overflow flags it; the
    uncapped full-candidate-set merge (cand_factor=None, reference
    semantics tnac4o/tnac4o.py:481-526) recovers the exact count."""
    rng = np.random.default_rng(11)
    Nx, Ny, Nc = 2, 2, 2
    J = make_chimera_like(rng, Nx, Ny, Nc, field=False)
    J = [j for j in tnax.round_Jij(J, 1.0) if j[2] != 0]
    ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, beta=1.5, J=J)
    ins.search_ground_state(M=256, relative_P_cutoff=1e-14, Dmax=16)

    ctx = ContractionContext(ins.problem, beta=1.5)
    full = parallel.device_search_gs(ctx, M=256, relative_P_cutoff=1e-14,
                                     Dmax=16, cand_factor=None)
    assert full["merge_overflow"] == 0
    assert full["degeneracy"] == ins.degeneracy

    capped = parallel.device_search_gs(ctx, M=8, relative_P_cutoff=1e-14,
                                       Dmax=16, cand_factor=1)
    assert capped["merge_overflow"] > 0
    assert capped["degeneracy"] <= ins.degeneracy


def test_gs_count_max_sizes_exact_cap():
    """``count_max`` (new r3 diagnostic) reports the max per-site
    post-cutoff candidate count: re-running with ``cand`` = count_max is
    still exact (overflow 0, identical energy/degeneracy), so it is the
    smallest safe cap — the knob for both exactness retries (auto_grow)
    and shrinking the selection/merge widths for speed."""
    rng = np.random.default_rng(13)
    Nx, Ny, Nc = 2, 2, 2
    J = make_chimera_like(rng, Nx, Ny, Nc, field=False)
    J = [j for j in tnax.round_Jij(J, 1.0) if j[2] != 0]
    ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, beta=1.5, J=J)
    ctx = ContractionContext(ins.problem, beta=1.5)
    full = parallel.device_search_gs(ctx, M=256, relative_P_cutoff=1e-14,
                                     Dmax=16, cand_factor=None)
    assert full["merge_overflow"] == 0
    cmax = full["count_max"]
    assert 0 < cmax <= 256 * ctx.Np

    tight = parallel.device_search_gs(ctx, M=256, relative_P_cutoff=1e-14,
                                      Dmax=16,
                                      cand_factor=-(-cmax // 256))
    assert tight["merge_overflow"] == 0
    assert tight["energy"] == pytest.approx(full["energy"], abs=1e-9)
    assert tight["degeneracy"] == full["degeneracy"]
    assert tight["count_max"] == cmax


def test_cand_none_is_full_expansion():
    """Regression for the r3 bug where cand_factor=None silently fell
    back to the 8*M default cap inside row_step: with no relative
    cutoff every live candidate survives, so per-site counts reach the
    full M*Np expansion — None must fit them all (overflow 0) while the
    8*M cap (< M*Np here) must flag overflow."""
    rng = np.random.default_rng(17)
    Nx, Ny, Nc = 2, 2, 4                       # Np = 16 > 8
    J = make_chimera_like(rng, Nx, Ny, Nc)
    ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, beta=1, J=J)
    ctx = ContractionContext(ins.problem, beta=1)
    M = 16                                     # M*Np = 256 > 8*M = 128
    full = parallel.device_search_gs(ctx, M=M, relative_P_cutoff=0,
                                     Dmax=8, cand_factor=None)
    assert full["merge_overflow"] == 0
    assert full["count_max"] == M * ctx.Np
    capped = parallel.device_search_gs(ctx, M=M, relative_P_cutoff=0,
                                       Dmax=8, cand_factor=8)
    assert capped["merge_overflow"] > 0
    Emin, _ = brute_force_min(J, Nx * Ny * Nc)
    assert full["energy"] == pytest.approx(Emin, abs=1e-9)


def test_flagship_fused_matches_separate_phases():
    """The one-dispatch flagship program (ladder + PEPS + boundary +
    search fused) finds the same ground state as the separate-phase
    pipeline (device ladder semantics verified against scipy in
    test_precondition_device)."""
    rng = np.random.default_rng(3)
    Nx, Ny, Nc = 3, 3, 4
    J = make_chimera_like(rng, Nx, Ny, Nc)
    ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, beta=2, J=J)
    ins.precondition(mode="balancing")
    r1 = parallel.device_search_gs(ins._context(), M=64,
                                   relative_P_cutoff=1e-10, Dmax=8)
    ins2 = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, beta=2, J=J)
    r2 = parallel.flagship_search_gs(ins2, M=64, relative_P_cutoff=1e-10,
                                     Dmax=8, pre_steps=2)
    assert abs(r1["energy"] - r2["energy"]) < 1e-3   # packed f32 rounding
    assert (r1["states"] == r2["states"]).all()
    assert r1["degeneracy"] == r2["degeneracy"]


def test_fleet_flagship_matches_single():
    """multi_flagship_search_gs (the vmapped one-dispatch fleet program)
    is bit-identical to flagship_search_gs run per instance."""
    rng = np.random.default_rng(7)
    Nx, Ny, Nc = 3, 3, 4
    Js = [make_chimera_like(rng, Nx, Ny, Nc) for _ in range(3)]
    solvers = [tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, beta=2, J=J)
               for J in Js]
    rs = parallel.multi_flagship_search_gs(solvers, M=64,
                                           relative_P_cutoff=1e-10,
                                           Dmax=8)
    for J, r in zip(Js, rs):
        ins2 = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, beta=2, J=J)
        r1 = parallel.flagship_search_gs(ins2, M=64,
                                         relative_P_cutoff=1e-10, Dmax=8)
        assert (np.asarray(r["states"]) == np.asarray(r1["states"])).all()
        assert abs(r["energy"] - r1["energy"]) < 1e-4
        assert r["degeneracy"] == r1["degeneracy"]


def test_fleet_flagship_mixed_rotations():
    """A fleet batch mixing all 4 rotations of one instance (the J124
    grouped-batch production shape) gives the same energy from every
    rotation, equal to the host-path ground state."""
    rng = np.random.default_rng(13)
    Nx = Ny = 3
    Nc = 4
    J = make_chimera_like(rng, Nx, Ny, Nc)
    solvers = []
    for rot in range(4):
        ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, beta=2, J=J)
        if rot:
            ins.rotate_graph(rot=rot)
        solvers.append(ins)
    rs = parallel.multi_flagship_search_gs(solvers, M=128,
                                           relative_P_cutoff=1e-10,
                                           Dmax=8)
    energies = []
    for ins, r in zip(solvers, rs):
        ins.states = np.asarray(r["states"])[None, :][:, ins.order]
        energies.append(float(tnax.energy_Jij(J, ins.binary_states())[0]))
    ref = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, beta=2, J=J)
    ref.precondition(mode="balancing")
    ref.search_ground_state(M=128, relative_P_cutoff=1e-10, Dmax=8)
    for E in energies:
        assert abs(E - ref.energy[0]) < 1e-6


def test_select_sort_matches_topk():
    """select='sort' (full stable descending sort) is bit-identical to
    the default top_k selection — same candidate set, tie-breaks, and
    discarded-probability bookkeeping."""
    rng = np.random.default_rng(17)
    J = make_chimera_like(rng, 3, 3, 4)
    outs = {}
    for sel in ("topk", "sort"):
        ins = tnax.Solver(mode="Ising", Nx=3, Ny=3, Nc=4, beta=2, J=J)
        ins.precondition(mode="balancing")
        outs[sel] = parallel.device_search_gs(
            ins._context(), M=64, relative_P_cutoff=1e-10, Dmax=8,
            select=sel)
    a, b = outs["topk"], outs["sort"]
    assert a["energy"] == b["energy"]
    assert (np.asarray(a["states"]) == np.asarray(b["states"])).all()
    assert a["degeneracy"] == b["degeneracy"]
    assert a["discarded_probability"] == b["discarded_probability"]
