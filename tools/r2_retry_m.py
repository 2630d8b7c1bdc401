"""Beam-width escalation for the J124 degeneracy-undercount instances.

Measured so far (results/j124_retry.jsonl, j124_retry_host.jsonl): at
M=4096 the device (f32) and host (f64) paths agree on the undercounted
degeneracy, and raising the merge candidate cap changes nothing — the
count is limited by the BEAM, not by precision or the cap: the ground-
state manifold spans more distinct boundary-vector prefixes than M, so
top-M tie-breaking among equal-probability branches drops degenerate
members. The cure is a wider beam. This driver re-runs each miss at
M=8192 then M=16384 on the device path (exact integer energies in f32)
until the oracle count is reached.

Usage: python tools/r2_retry_m.py > results/j124_retry_m.jsonl
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from conformance import run_j124  # noqa: E402

C16_MISSES = [2, 64, 66, 69, 76, 93, 113, 156]
C12_MISSES = [27]


def escalate(C, misses):
    residual = list(misses)
    for M in (8192, 16384):
        if not residual:
            return
        nxt = []
        for k in residual:
            r = run_j124(C, k, 48, M, True, path="device", start=k)[0]
            if not r["ok"]:
                nxt.append(k)
        residual = nxt


if __name__ == "__main__":
    escalate(16, C16_MISSES)
    escalate(12, C12_MISSES)
