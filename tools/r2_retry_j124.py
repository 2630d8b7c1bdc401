"""Retry J124 instances whose first-pass degeneracy undercounted.

Every first-pass miss has the EXACT oracle energy but a slightly low
degeneracy. Measured escalation (results/j124_retry.jsonl): raising the
merge candidate cap 8x (cand_factor=64) removed ~99% of cap overflows but
left the counts byte-identical — the cap is NOT the cause. The undercount
is an f32 beam-decision effect: degenerate branches with distinct boundary
vectors get ordered by f32-noisy log2-probabilities at the cutoff/top-M
boundary, and a few fall off the beam. The HOST path accumulates branch
probabilities and energies in float64 (tnax/search.py, reference
semantics) and recovered these counts exactly in round 1 (C16 #2 at D=48:
620,232,704). So: retry misses through the host path — the same
f32-device -> f64-host escalation ladder documented for the two hard
L2048 droplet instances.

Usage: python tools/r2_retry_j124.py > results/j124_retry_host.jsonl
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from conformance import run_j124  # noqa: E402

C16_MISSES = [2, 64, 66, 69, 76, 93, 113, 156]
C12_MISSES = [27]


if __name__ == "__main__":
    for k in C16_MISSES:
        run_j124(16, k, 48, 4096, True, path="host", start=k)
    for k in C12_MISSES:
        run_j124(12, k, 48, 4096, True, path="host", start=k)
