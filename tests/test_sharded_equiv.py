"""Beam-sharded row step must reproduce the unsharded one (same surviving
candidate set) — the correctness contract of the multi-chip path beyond
'it runs'."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tnax
from tnax import parallel, engine
from tnax.search import ContractionContext
from test_search_small import make_chimera_like


def _row_inputs(ctx, ny, M, Np, lh, lv, dtype):
    Nx, Ny = ctx.Nx, ctx.Ny
    EsP, EslP, EsuP = parallel._padded_energy_rows(ctx)
    uidx0 = jnp.zeros((M, Nx), jnp.int32)
    row = dict(
        lB=ctx.lB[ny], drindex=ctx.drindex[ny], AT=ctx.rhoT[ny + 1],
        RRs=engine.row_right_envs(ctx.rhoT[ny + 1], ctx.Wt[ny], uidx0),
        Es=EsP[ny], Esl=EslP[ny], Esu=EsuP[ny],
        dmap=jnp.asarray(ctx.dmap[ny]), rmap=jnp.asarray(ctx.rmap[ny]),
        nvalid=jnp.asarray(ctx.nstates[ny], jnp.int32),
        cols=jnp.arange(Nx, dtype=jnp.int32) + ny * Nx)
    D = ctx.Dmax
    beam = dict(
        RL=jnp.zeros((M, D), dtype).at[:, 0].set(1.0),
        vind=jnp.zeros((M, Nx + 1), jnp.int32),
        states=jnp.zeros((M, Nx * Ny), jnp.int32),
        Eng=jnp.zeros((M,), dtype),
        prob=jnp.full((M,), parallel.NEG, dtype).at[0].set(0.0),
        deg=parallel.deg_ones((M,)),
        valid=jnp.zeros((M,), bool).at[0].set(True),
        aidx=jnp.zeros((M,), jnp.int32))
    return beam, row


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_row_step_matches_unsharded():
    n_data, n_beam = 2, 4
    mesh = parallel.make_mesh(n_data, n_beam)
    Nx, Ny, Nc = 4, 4, 2
    M = 16 * n_beam
    Dmax = 8
    ctxs = [ContractionContext(
        tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, beta=1.5,
                    J=make_chimera_like(np.random.default_rng(s), Nx, Ny,
                                        Nc)).problem, 1.5)
        for s in range(n_data)]
    for c in ctxs:
        c.build_boundary(Dmax, 1e-16, 1e-12, 8, True)
    c0 = ctxs[0]
    lh, lv = c0.lh, c0.lv
    bits = max(1, int(np.ceil(np.log2(max(lh, lv)))))
    dtype = c0.dtype

    singles = []
    beams, rows = [], []
    for c in ctxs:
        beam, row = _row_inputs(c, 0, M, c.Np, lh, lv, dtype)
        beams.append(beam)
        rows.append(row)
        out, _ = parallel.row_step(beam, row, M=M, Nx=Nx, bits=bits,
                                   min_dEng=1e-12, log2_cutoff=-40.0)
        singles.append(out)

    step = parallel.sharded_row_step(mesh, M=M, Nx=Nx, bits=bits,
                                     min_dEng=1e-12, log2_cutoff=-40.0)
    beamB = {k: jnp.stack([b[k] for b in beams]) for k in beams[0]}
    rowB = {k: jnp.stack([r[k] for r in rows]) for k in rows[0]}
    outB, _ = step(beamB, rowB)

    for b in range(n_data):
        vs = np.asarray(outB["valid"][b])
        vu = np.asarray(singles[b]["valid"])
        assert vs.sum() == vu.sum()
        # same surviving candidate multiset (energies, probs, degeneracies)
        def canon(out, v):
            E = np.asarray(out["Eng"])[v]
            p = np.asarray(out["prob"])[v]
            d = parallel.deg_decode(out["deg"])[v]
            o = np.lexsort((d, np.round(p, 4), np.round(E, 6)))
            return E[o], p[o], d[o]
        Es, ps, ds = canon({k: outB[k][b] for k in outB}, vs)
        Eu, pu, du = canon(singles[b], vu)
        assert np.allclose(Es, Eu, atol=1e-6)
        assert np.allclose(ps, pu, atol=1e-4)
        assert np.array_equal(ds, du)


def test_sharded_spectrum_matches_unsharded():
    """Beam-sharded decision records reproduce the single-chip device
    spectrum: same decoded energies and states (VERDICT r2 task 9)."""
    import tnax
    from tnax import spectrum
    from test_search_small import make_chimera_like

    def build():
        J = make_chimera_like(np.random.default_rng(4), 3, 3, 2,
                              field=False)
        J = [j for j in tnax.round_Jij(J, 1.0) if j[2] != 0]
        return tnax.Solver(mode="Ising", Nx=3, Ny=3, Nc=2, beta=1.5, J=J)

    ins1 = build()
    ins1.search_low_energy_spectrum(excitations_encoding=1, M=64,
                                    relative_P_cutoff=1e-12, Dmax=8,
                                    max_dEng=1.5, path="device",
                                    auto_grow=False)
    ins1.decode_low_energy_states(max_dEng=1.5, max_states=256)

    mesh = parallel.make_mesh(1, 4)
    ins2 = build()
    ctx = ins2._context()
    r = spectrum.sharded_search_spectrum(ins2, ctx, 1, mesh, M=64,
                                         relative_P_cutoff=1e-12, Dmax=8,
                                         max_dEng=1.5)
    ins2.excitations_encoding = 1
    ins2.energy = r.energy
    ins2.probability = r.probability
    ins2.degeneracy = r.degeneracy
    ins2.states = r.states[:, ins2.order]
    ins2.decode_low_energy_states(max_dEng=1.5, max_states=256)

    assert len(ins2.energy) == len(ins1.energy)
    assert np.max(np.abs(np.sort(ins2.energy) - np.sort(ins1.energy))) \
        < 1e-9
    srt1 = ins1.binary_states()[np.lexsort(ins1.binary_states().T)]
    srt2 = ins2.binary_states()[np.lexsort(ins2.binary_states().T)]
    assert np.array_equal(srt1, srt2)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_fleet_sample_matches_unsharded():
    """multi_flagship_sample over a 'data' mesh (pure DP over instances)
    draws bit-identical states to the unsharded fleet program."""
    Nx, Ny, Nc = 2, 2, 4
    solvers = []
    for s in range(8):
        J = make_chimera_like(np.random.default_rng(40 + s), Nx, Ny, Nc)
        solvers.append(tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc,
                                   beta=2, J=J))
    mesh = parallel.make_mesh(4, 2)
    rs1 = parallel.multi_flagship_sample(solvers, M=16, Dmax=8, seed=5)
    rs2 = parallel.multi_flagship_sample(solvers, M=16, Dmax=8, seed=5,
                                         mesh=mesh)
    for r1, r2 in zip(rs1, rs2):
        assert (np.asarray(r1["states"]) == np.asarray(r2["states"])).all()
        assert np.max(np.abs(r1["energy"] - r2["energy"])) < 1e-12
