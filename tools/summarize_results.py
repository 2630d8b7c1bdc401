"""Summarize conformance sweep JSONL files into a markdown table.

Reads results/*.jsonl (written by tools/conformance.py via
tools/run_conformance_all.sh) and prints per-family match rates plus every miss,
ready to paste into PARITY.md.
"""

import glob
import json
import os
import sys

RESULTS = os.path.join(os.path.dirname(__file__), "..", "results")


def main():
    rows = []
    misses = []
    for path in sorted(glob.glob(os.path.join(RESULTS, "*.jsonl"))):
        name = os.path.basename(path).replace(".jsonl", "")
        recs = []
        for line in open(path):
            line = line.strip()
            if line.startswith("{"):
                recs.append(json.loads(line))
        summ = [r for r in recs if "fleet_summary" in r]
        # full per-instance records only (escalation progress markers and
        # batch timings carry no "ok"); repairs append corrected records,
        # so the LAST record per instance wins (r5_host_recheck convention)
        last = {}
        for r in recs:
            if "instance" in r and "ok" in r:
                last[r["instance"]] = r
        recs = [last[k] for k in sorted(last)]
        if not recs:
            continue
        ok = sum(r["ok"] for r in recs)
        secs = [r["seconds"] for r in recs if "seconds" in r]
        rate = f"{ok}/{len(recs)}"
        med = sorted(secs)[len(secs) // 2] if secs else None
        tot = summ[-1]["total_s"] if summ else \
            (round(sum(secs), 1) if secs else "")
        rows.append((name, rate, tot, med))
        misses += [(name, r) for r in recs if not r["ok"]]
    print("| sweep | matched | total s | median s/instance |")
    print("|---|---|---|---|")
    for name, rate, tot, med in rows:
        print(f"| {name} | {rate} | {tot} | {med} |")
    if misses:
        print("\nMisses:")
        for name, r in misses:
            print(f"- {name} #{r['instance']}: {json.dumps(r)}")
    return 1 if misses else 0


if __name__ == "__main__":
    sys.exit(main())
