#!/bin/bash
# Full ensemble conformance protocol (round-2 record: 900/900, PARITY.md).
# ONE python process per shape family (the axon tunnel pays ~minutes of
# compile per process; in-process jit caching amortizes). Expect ~2.5 h on
# a TPU v5e-1. Results land as per-instance JSONL in results/; render with
#   python tools/summarize_results.py
#
# First pass (f32 device path, rotation-retry protocol):
cd "$(dirname "$0")/.."
set -x
python tools/conformance.py --family droplet --L 512  --n 100 --path device > results/droplet_L512.jsonl
python tools/conformance.py --family droplet --L 1152 --n 100 --path device > results/droplet_L1152.jsonl
python tools/conformance.py --family droplet --L 2048 --n 100 --path device > results/droplet_L2048.jsonl
python tools/conformance.py --family j124 --C 8  --n 200 --path device > results/j124_C8.jsonl
python tools/conformance.py --family j124 --C 12 --n 200 --path device > results/j124_C12.jsonl
python tools/conformance.py --family j124 --C 16 --n 200 --path device > results/j124_C16.jsonl
set +x

# Escalation ladders for any first-pass miss (apply per missed instance):
#
# droplet GS energy (measured round 2: 3 misses/300, all recovered):
#   1. --only N --escalate            (D=48, 2x beam, 4 rotations)
#   2. TNAX_PLATFORM=cpu TNAX_X64=1 \
#      python tools/conformance.py --family droplet --L <L> --only N --path host
#      (f64 host path; recovered both L2048 stragglers at rot=0)
#
# J124 degeneracy (measured round 2: 9 misses/600, all recovered; the
# undercount is beam-width-limited — raising the merge cap or switching
# to the f64 host path does NOT change the count):
#   1. --family j124 --C <C> --only N --M 8192     (fixed 5/9)
#   2. --family j124 --C <C> --only N --M 16384    (fixed 3 more)
#   3. beta=0.5 at M=16384 (flatter Gibbs distribution spreads the beam
#      across the GS manifold; tools/r2_c16_2.py — fixed the last one)
