#!/bin/bash
# Watch a running spectrum sweep and walk every full-ladder miss through
# the f64-host terminal rung (CPU only — runs concurrently with the TPU
# sweep). One search at a time; exits when the sweep process is gone and
# no repairs remain.
#   usage: r5_f64_watch.sh <sweep.jsonl> <sweep_pidfile> [--ee N]
set -u
cd /root/repo
SWEEP=$1; PIDF=$2; shift 2
while true; do
  python3 tools/spectrum_f64_rung.py "$SWEEP" "$@" 2>> /tmp/f64watch.err
  if ! kill -0 "$(cat "$PIDF" 2>/dev/null)" 2>/dev/null; then
    # sweep done: one final pass already ran above
    break
  fi
  sleep 60
done
echo "f64 watch done: $SWEEP" >&2
