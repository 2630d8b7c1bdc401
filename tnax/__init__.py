"""tnax — TPU-native tensor-network solver for quasi-2D optimization.

A from-scratch JAX/XLA reimplementation of the capabilities of
marekrams/tnac4o: PEPS representation of the Gibbs distribution of Ising /
RMF problems on quasi-2D lattices, boundary-MPS contraction, branch-and-bound
most-probable-state search with exact degeneracy counting, Gibbs sampling,
and low-energy droplet (excitation) structure.

Public API mirrors the reference package (`tnac4o/__init__.py:1-2`).
"""

from .config import ensure_precision, compute_dtype

ensure_precision()  # apply TNAX_PLATFORM / x64 before any backend use

from .solver import Solver, tnac4o, load  # noqa: E402
from .problems import (load_Jij, round_Jij, minus_Jij, Jij_f2p,
                       energy_Jij, energy_RMF)

__all__ = [
    "Solver", "tnac4o", "load",
    "load_Jij", "round_Jij", "minus_Jij", "Jij_f2p",
    "energy_Jij", "energy_RMF",
    "ensure_precision", "compute_dtype",
]

__version__ = "0.1.0"
