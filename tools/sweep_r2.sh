#!/bin/bash
# Round-2 ensemble conformance sweeps (VERDICT.md next-round item 2).
# One python process per family/size so in-process jit caching amortizes
# the tunnel compile cost. Results as JSONL in results/.
cd /root/repo
set -x
python tools/conformance.py --family droplet --L 512  --n 100 --path device > results/droplet_L512.jsonl  2> results/droplet_L512.err
python tools/conformance.py --family droplet --L 1152 --n 100 --path device > results/droplet_L1152.jsonl 2> results/droplet_L1152.err
python tools/conformance.py --family droplet --L 2048 --n 100 --path device > results/droplet_L2048.jsonl 2> results/droplet_L2048.err
python tools/conformance.py --family j124 --C 8  --n 200 --path device > results/j124_C8.jsonl  2> results/j124_C8.err
python tools/conformance.py --family j124 --C 12 --n 200 --path device > results/j124_C12.jsonl 2> results/j124_C12.err
python tools/conformance.py --family j124 --C 16 --n 200 --path device > results/j124_C16.jsonl 2> results/j124_C16.err
echo SWEEPS DONE
