#!/bin/bash
# Round-3 full-ensemble re-validation through the FUSED production paths
# (multi_flagship_search_gs fleet batches; J124 grouped 4-rotation
# batches). One family at a time — one TPU process at a time.
# Artifacts land in results/ as *_r3.jsonl.
set -u
cd "$(dirname "$0")/.."
mkdir -p results

run() {
    echo "== $* ==" >&2
    date >&2
    timeout 7200 python tools/conformance.py "$@"
}

run --family droplet --L 512  --n 100 > results/droplet_L512_r3.jsonl  2> results/droplet_L512_r3.err
run --family droplet --L 1152 --n 100 > results/droplet_L1152_r3.jsonl 2> results/droplet_L1152_r3.err
run --family droplet --L 2048 --n 100 > results/droplet_L2048_r3.jsonl 2> results/droplet_L2048_r3.err
run --family j124 --C 8  --n 200 > results/j124_C8_r3.jsonl  2> results/j124_C8_r3.err
run --family j124 --C 12 --n 200 > results/j124_C12_r3.jsonl 2> results/j124_C12_r3.err
run --family j124 --C 16 --n 200 > results/j124_C16_r3.jsonl 2> results/j124_C16_r3.err
echo "== all done ==" >&2
date >&2
