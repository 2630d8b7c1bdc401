#!/bin/bash
# Final session-2 TPU sequence:
#   1. one C16 wave batch through the production conformance path
#      (smokes the select='sort' wave + count_max emission on TPU)
#   2. bench.py with the now-default full side-metric set (what the
#      driver will run for BENCH_r3)
set -u
cd "$(dirname "$0")/.."
R=tools/tpu_run.sh
$R results/j124_C16_sort_smoke.jsonl results/j124_C16_sort_smoke.err 5400 -- \
    python tools/conformance.py --family j124 --C 16 --n 8
$R results/bench_r3_final.json results/bench_r3_final.err 5400 -- \
    python bench.py
echo "== r3 final done =="
date
