#!/usr/bin/env python3
"""Compare a local bench_metric.json against a driver BENCH_r*.json.

Usage: benchcmp.py NEW.json OLD.json
NEW is a bare bench line ({"metric":...}); OLD is either a bare line or
the driver wrapper whose "tail" embeds the line.
"""
import json, re, sys


def load(path):
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = None
    if d and "queries" in d:
        return d
    # driver wrapper: find the metric line inside "tail"
    m = re.search(r'\{"metric":.*\}', raw.replace("\\\"", '"'))
    if not m:
        sys.exit(f"no metric line found in {path}")
    return json.loads(m.group(0))


new, old = load(sys.argv[1]), load(sys.argv[2])
nq, oq = new["queries"], old["queries"]
comp = new.get("compile", {})
shared = sorted(set(nq) & set(oq), key=lambda k: -(nq[k]))
print(f"{'query':30s} {'new':>7s} {'cmpl':>6s} {'old':>7s} {'delta':>7s}")
for k in shared:
    d = nq[k] - oq[k]
    flag = " <<<" if d > 0.3 else ""
    print(f"{k:30s} {nq[k]:7.2f} {comp.get(k, float('nan')):6.2f} "
          f"{oq[k]:7.2f} {d:+7.2f}{flag}")
only_new = set(nq) - set(oq)
for k in sorted(only_new):
    print(f"{k:30s} {nq[k]:7.2f} {comp.get(k, float('nan')):6.2f}    NEW")
print(f"\nshared total: new {sum(nq[k] for k in shared):.2f} "
      f"vs old {sum(oq[k] for k in shared):.2f}")
print(f"full totals:  new {new['value']:.2f} vs old {old['value']:.2f}")
print(f"compile total (new): {sum(comp.values()):.2f}")
