"""Load a saved spectrum, decode states, verify energies independently
(tnax port of reference `examples/e04_load_spectrum_droplet_instances.py`)."""

import argparse
import logging

import numpy as np

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import tnax
from common import load_droplet_instance


def load_and_verify(file_name, L=128, instance=1, dE=1.0, max_states=1000):
    ins = tnax.load(file_name)
    ins.decode_low_energy_states(max_dEng=dE, max_states=max_states)
    J = load_droplet_instance(L, instance)
    E_check = tnax.energy_Jij(J, ins.binary_states())
    err = np.max(np.abs(ins.energy - E_check))
    print("# states:", len(ins.energy))
    print("max |E_solver - E_independent| =", err)
    assert err < 1e-4
    return ins


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("file")
    p.add_argument("-L", type=int, default=128)
    p.add_argument("-ins", type=int, default=1)
    p.add_argument("-dE", type=float, default=1.0)
    p.add_argument("-max_st", type=int, default=1000)
    args = p.parse_args()
    logging.basicConfig(level="INFO")
    ins = load_and_verify(args.file, L=args.L, instance=args.ins, dE=args.dE,
                          max_states=args.max_st)
    ins.show_solution()
