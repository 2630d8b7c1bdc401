#!/bin/bash
# Launch a TPU python job with init-hang detection. A wedged axon client
# (known failure mode, ~30% of back-to-back process starts) futex-waits
# forever holding NO TCP connection to the relay ports (8082-8117),
# while live tunnel init / remote compile keeps one open. If the job has
# produced no output AND holds no relay connection for HANG_CHECKS
# consecutive probes, kill by PID and relaunch.
# Usage: tpu_run.sh OUTFILE ERRFILE TIMEOUT_S -- python args...
set -u
OUT=$1; ERR=$2; TMO=$3; shift 3
[ "$1" = "--" ] && shift
RETRIES=${RETRIES:-4}
HANG_CHECKS=${HANG_CHECKS:-8}   # x 30 s = 4 min of no-output+no-conn
for attempt in $(seq 1 "$RETRIES"); do
    : > "$OUT"; : > "$ERR"
    timeout "$TMO" "$@" > "$OUT" 2> "$ERR" &
    PID=$!
    sleep 30
    dead=0
    wedged=0
    while kill -0 $PID 2>/dev/null && [ ! -s "$OUT" ]; do
        if ss -tn 2>/dev/null | grep -qE "127\.0\.0\.1:8(08|09|10|11)[0-9]"; then
            dead=0
        else
            dead=$((dead+1))
        fi
        if [ "$dead" -ge "$HANG_CHECKS" ]; then
            echo "[tpu_run] attempt $attempt: no output + no relay conn for $((dead*30))s — killing $PID" >&2
            kill $PID 2>/dev/null; sleep 5; kill -9 $PID 2>/dev/null
            wedged=1
            break
        fi
        sleep 30
    done
    if [ "$wedged" = "1" ]; then
        sleep 60
        continue
    fi
    wait $PID
    rc=$?
    echo "EXIT $rc" >> "$OUT"
    exit $rc
done
echo "EXIT retries-exhausted" >> "$OUT"
exit 9
