#!/usr/bin/env python3
"""Regenerate BenchBaseline.scala's medians map from the markdown table
tools/bench_protocol.py prints (BASELINE.md "Recorded engine bench").

Usage: python3 tools/baseline_to_scala.py < table.md
Prints the Scala `val medians: Map[String, Double] = Map(...)` body to
stdout; paste into src/main/scala/graft/BenchBaseline.scala (or pipe
through the caller's editor). Keys and 2-decimal values come straight
from the table so the two surfaces cannot drift (BaselineSyncSpec pins
keys against the registry).
"""
import re
import sys

rows = []
for line in sys.stdin:
    m = re.match(r"\|\s*(build:\S+|q\S+)\s*\|\s*([0-9.]+)\s*\|", line)
    if m:
        rows.append((m.group(1), float(m.group(2))))

print("  val medians: Map[String, Double] = Map(")
for i, (k, v) in enumerate(sorted(rows)):
    sep = "," if i < len(rows) - 1 else ""
    print(f'    "{k}" -> {v:.2f}{sep}')
print("  )")
