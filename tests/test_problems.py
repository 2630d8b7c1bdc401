"""Frontend unit tests: loaders, bit conventions, energy verifiers."""

import numpy as np
import pytest

import tnax
from tnax.problems import (IsingProblem, RMFProblem, block_spins, block_bits,
                           compress_bits, energy_Jij, energy_RMF)


def small_random_J(L, rng, p_diag=1.0):
    J = []
    for i in range(L):
        J.append([i, i, float(rng.normal())])
        for j in range(i + 1, L):
            J.append([i, j, float(rng.normal())])
    return J


def test_loaders_roundtrip(tmp_path):
    J = [[1, 2, 0.5], [2, 3, -1.5], [1, 1, 2.0]]
    f = tmp_path / "j.txt"
    f.write_text("\n".join(f"{i} {j} {v}" for i, j, v in J))
    J2 = tnax.load_Jij(str(f))
    assert J2 == J
    assert tnax.minus_Jij(J)[0][2] == -0.5
    assert tnax.Jij_f2p(J)[0][:2] == [0, 1]
    assert tnax.round_Jij([[0, 1, 0.333]], 1 / 3)[0][2] == pytest.approx(1 / 3)


def test_block_spin_conventions():
    # spin i is +1 when bit i of the state index is 0
    st = block_spins(3)
    assert st[0].tolist() == [1, 1, 1]
    assert st[1].tolist() == [-1, 1, 1]  # first spin changes fastest
    assert st[6].tolist() == [1, -1, -1]
    bits = block_bits(3)
    assert (bits == (1 - st) // 2).all()
    # leg index = compressed bits at positions
    cm = compress_bits(np.array([0, 2]), 3)
    assert cm[0b101] == 0b11 and cm[0b001] == 0b01 and cm[0b100] == 0b10


def test_energy_Jij_vs_direct():
    rng = np.random.default_rng(7)
    L = 6
    J = small_random_J(L, rng)
    states = rng.integers(0, 2, size=(20, L))
    E = energy_Jij(J, states)
    # direct evaluation
    for st, e in zip(states, E):
        s = 2 * st - 1
        acc = 0.0
        for i, j, v in J:
            acc += v * s[i] * s[j] if i != j else v * s[i]
        assert abs(acc - e) < 1e-10


def test_ising_problem_tables_match_energy():
    """Per-site energy tables must reconstruct the exact total energy."""
    rng = np.random.default_rng(3)
    Nx, Ny, Nc = 2, 2, 2
    L = Nx * Ny * Nc
    J = []
    for i in range(L):
        J.append([i, i, float(rng.normal())])
    for ny in range(Ny):
        for nx in range(Nx):
            b = Nc * (Nx * ny + nx)
            for a in range(Nc):
                for c in range(a + 1, Nc):
                    J.append([b + a, b + c, float(rng.normal())])
                if nx + 1 < Nx:
                    J.append([b + a, Nc * (Nx * ny + nx + 1) + a,
                              float(rng.normal())])
                if ny + 1 < Ny:
                    J.append([b + a, Nc * (Nx * (ny + 1) + nx) + a,
                              float(rng.normal())])
    prob = IsingProblem(Nx=Nx, Ny=Ny, Nc=Nc, J=J)
    rng2 = np.random.default_rng(0)
    for _ in range(5):
        blocks = rng2.integers(0, 4, size=Ny * Nx)
        # accumulate from tables site by site (snake order)
        tot = 0.0
        for ny in range(Ny):
            for nx in range(Nx):
                t = prob.site(ny, nx)
                s = blocks[ny * Nx + nx]
                lidx = prob.site(ny, nx - 1).rmap[blocks[ny * Nx + nx - 1]] \
                    if nx > 0 else 0
                uidx = prob.site(ny - 1, nx).dmap[blocks[(ny - 1) * Nx + nx]] \
                    if ny > 0 else 0
                tot += t.Es[s] + t.Esl[s, lidx] + t.Esu[s, uidx]
        # independent check through bit decode
        bits = np.full(L, 2, dtype=np.int8)
        kk = 0
        for ny in range(Ny):
            for nx in range(Nx):
                act = prob.ind[ny][nx]
                conf = 1 - block_bits(len(act))
                bits[act] = conf[blocks[kk]]
                kk += 1
        assert abs(tot - energy_Jij(J, bits[None, :])[0]) < 1e-10


def test_rmf_problem_tables():
    N = np.array([[2, 3], [3, 2]])
    fun = {0: np.array([0.5, -0.5]), 1: np.arange(9.0).reshape(3, 3),
           2: np.array([1.0, 0.0, -1.0])}
    fac = {(0, 0): 0, (0, 1): 2, (0, 0, 0, 1): 1, (0, 1, 1, 1): 1}
    J = {"fun": fun, "fac": fac, "N": N, "Nx": 2, "Ny": 2}
    p = RMFProblem(Nx=2, Ny=2, J=J)
    t01 = p.site(0, 1)
    assert t01.nl == 2 and t01.n == 3
    # (0,0,0,1) stored as E(s_left, s_here) -> table transposed
    assert t01.Esl[2, 1] == fun[1][1, 2]
    st = np.array([[1, 2, 0, 1]])
    e = energy_RMF(J, st)
    expected = fun[0][1] + fun[2][2] + fun[1][1, 2] + fun[1][2, 1]
    assert abs(e[0] - expected) < 1e-12


def test_rotation_identity():
    rng = np.random.default_rng(11)
    J = small_random_J(8, rng)
    p = IsingProblem(Nx=2, Ny=2, Nc=2, J=J)
    J_before = p.J.toarray().copy()
    for _ in range(4):
        p.rotate()
    assert np.allclose(p.J.toarray(), J_before)
