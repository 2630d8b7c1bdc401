"""Retry J124 instances whose first-pass degeneracy undercounted.

Every first-pass miss has the EXACT oracle energy but a slightly low
degeneracy, with hundreds of merge-cap overflows (cand = 8*M): degenerate
candidates beyond the cap were dropped before the merge's segment-sum.
Retry with a larger cap (cand_factor=64), escalating to the uncapped
full-candidate-set merge (exact reference semantics,
tnac4o/tnac4o.py:481-526) for any residual miss. One process per shape
family amortizes the tunnel compiles.

Usage: python tools/r2_retry_j124.py > results/j124_retry.jsonl
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from conformance import run_j124  # noqa: E402

C16_MISSES = [2, 64, 66, 69, 76, 93, 113, 156]
C12_MISSES = [27]


def retry(C, misses):
    residual = []
    for k in misses:
        r = run_j124(C, k, 48, 4096, True, path="device", start=k,
                     cand_factor=64)[0]
        if not r["ok"]:
            residual.append(k)
    for k in residual:
        print(json.dumps({"escalating_uncapped": k}), flush=True)
        run_j124(C, k, 48, 4096, True, path="device", start=k,
                 cand_factor=None)


if __name__ == "__main__":
    retry(16, C16_MISSES)
    retry(12, C12_MISSES)
