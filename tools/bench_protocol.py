#!/usr/bin/env python3
"""Stabilized bench-recording protocol (BASELINE.md "Recorded engine
bench"): run graft.Bench N times (fresh JVM each), parse the final
machine-readable JSON line of each run, and print the median/min
markdown table with totals that are exact column sums.

Host-CPU-steal on this box swings identical runs up to ~8x, so never
run this concurrently with other sbt/Spark work, and treat the median
column as the comparison number.

Usage: python3 tools/bench_protocol.py [sfDir] [runs] [cpus]

cpus defaults to 32 — the config the round driver's BENCH_r{N}.json
actually runs — so the recorded medians are same-config comparable
with driver rows. Pass 8 to reproduce the pre-round-10 column.
"""
import json
import statistics
import subprocess
import sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
cpus = sys.argv[3] if len(sys.argv) > 3 else "32"

totals = []
per_query = {}
per_build = {}
for i in range(runs):
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        env={**__import__("os").environ,
             "SPARK_GRAFT_SF_DIR": sf, "SPARK_GRAFT_CPUS": cpus},
        capture_output=True, text=True, cwd="/root/repo").stdout
    line = [l for l in out.splitlines() if '"metric":"total"' in l][-1]
    rec = json.loads(line[line.index("{"):])
    totals.append(rec["value"])
    # full query names come from the per-query lines (the summary map
    # keys are shortened to qNN prefixes to fit the driver's tail)
    for l in out.splitlines():
        if '"query":' in l and '"sec":' in l:
            # a log line that happens to embed both tokens must not
            # abort the whole run — skip anything that doesn't parse
            # as the expected {"query": ..., "sec": ...} record
            try:
                r = json.loads(l[l.index("{"):])
            except (ValueError, KeyError):
                continue
            if isinstance(r, dict) and "query" in r and "sec" in r:
                per_query.setdefault(r["query"], []).append(r["sec"])
        # named one-time setup steps (pair kernel, ANN indexes, BPE
        # trainer) report as {"build": ..., "sec": ...} lines
        if '"build":' in l and '"sec":' in l:
            try:
                r = json.loads(l[l.index("{"):])
            except (ValueError, KeyError):
                continue
            if isinstance(r, dict) and "build" in r and "sec" in r:
                per_build.setdefault(r["build"], []).append(r["sec"])
    print(f"run {i + 1}/{runs}: total {rec['value']:.1f} s", file=sys.stderr)

print("| query | median sec | min sec |")
print("|---|---|---|")
med_sum = min_sum = 0.0
for b in sorted(per_build):
    med, mn = statistics.median(per_build[b]), min(per_build[b])
    med_sum += med
    min_sum += mn
    print(f"| build:{b} | {med:.2f} | {mn:.2f} |")
for q in sorted(per_query):
    med, mn = statistics.median(per_query[q]), min(per_query[q])
    med_sum += med
    min_sum += mn
    print(f"| {q} | {med:.2f} | {mn:.2f} |")
print(f"| **total (sum of column)** | **{med_sum:.1f}** | **{min_sum:.1f}** |")
print(f"run totals: {' / '.join(f'{t:.1f}' for t in totals)} s", file=sys.stderr)
