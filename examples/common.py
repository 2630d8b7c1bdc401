"""Shared helpers for the example scripts (instance paths, loading)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import tnax

INSTANCE_ROOT = os.environ.get(
    "TNAX_INSTANCES", "/root/reference/instances")

CHIMERA_SHAPES = {128: (4, 4, 8), 512: (8, 8, 8),
                  1152: (12, 12, 8), 2048: (16, 16, 8)}


def droplet_instance_path(L, instance):
    return os.path.join(
        INSTANCE_ROOT, "Chimera_droplet_instances",
        f"chimera{L}_spinglass_power", "%03d.txt" % instance)


def load_droplet_instance(L, instance):
    """Couplings of a chimera droplet instance, rounded to multiples of 1/75
    (reference `examples/e01...py:56-65`)."""
    J = tnax.load_Jij(droplet_instance_path(L, instance))
    return tnax.round_Jij(tnax.Jij_f2p(J), 1 / 75)


def load_j124_instance(C, instance):
    path = os.path.join(INSTANCE_ROOT, "Chimera_J124", f"C={C}_J124",
                        "%03d.txt" % instance)
    return tnax.Jij_f2p(tnax.load_Jij(path))
