#!/bin/bash
# Round-3 full-ensemble re-validation through the FUSED production paths
# (multi_flagship_search_gs fleet batches; J124 wave-mode rotation
# retry). One family at a time via the hang-detecting launcher.
# Artifacts land in results/ as *_r3.jsonl.
set -u
cd "$(dirname "$0")/.."
mkdir -p results
R=tools/tpu_run.sh

$R results/droplet_L512_r3.jsonl  results/droplet_L512_r3.err  7200 -- python tools/conformance.py --family droplet --L 512  --n 100
$R results/droplet_L1152_r3.jsonl results/droplet_L1152_r3.err 7200 -- python tools/conformance.py --family droplet --L 1152 --n 100
$R results/droplet_L2048_r3.jsonl results/droplet_L2048_r3.err 7200 -- python tools/conformance.py --family droplet --L 2048 --n 100
$R results/j124_C8_r3.jsonl  results/j124_C8_r3.err  7200 -- python tools/conformance.py --family j124 --C 8  --n 200
$R results/j124_C12_r3.jsonl results/j124_C12_r3.err 7200 -- python tools/conformance.py --family j124 --C 12 --n 200
$R results/j124_C16_r3.jsonl results/j124_C16_r3.err 7200 -- python tools/conformance.py --family j124 --C 16 --n 200
echo "== all done =="
date
for f in results/*_r3.jsonl; do echo "$f: $(grep -E 'fleet_summary|# conformance' $f | tail -1)"; done
