#!/usr/bin/env python3
"""Rewrite BASELINE.md's per-query pin table from ONE clean full-suite
bench run (VERDICT r11 item 1: uniform full-suite provenance; isolated
pins are forbidden).

Usage: python3 scripts/repin_baseline.py <bench_results.json>
Replaces the table between the '## Per-query baseline' header and the
next '## ' header, preserving everything else.
"""
import json, sys, re

bench = json.load(open(sys.argv[1]))
qs = bench["queries"]
assert not bench.get("failures"), f"refusing to pin a run with failures: {bench['failures']}"

def qnum(name):
    return int(re.match(r"q(\d+)", name).group(1))

rows = "\n".join(f"| {name} | {round(sec, 3)} |"
                 for name, sec in sorted(qs.items(), key=lambda kv: qnum(kv[0])))
table = (f"## Per-query baseline (sf0.1, seconds, full-suite median-of-3)\n\n"
         f"| query | sec |\n|---|---|\n{rows}\n\n")

src = open("BASELINE.md").read()
start = src.index("## Per-query baseline")
# the pin table may be the LAST section: find() -1 means end-of-file
end = src.find("\n## ", start + 10)
tail = "" if end == -1 else src[end + 1:]
open("BASELINE.md", "w").write(src[:start] + table + tail)
print(f"pinned {len(qs)} rows, total {bench['value']:.1f}s")
