#!/usr/bin/env python3
"""Diff two bench_full.json artifacts: per-family and top per-query deltas."""
import json, sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
print(f"total: {a['total_sec']:.1f} -> {b['total_sec']:.1f}")
fa, fb = a["families"], b["families"]
for k in sorted(set(fa) | set(fb)):
    sa = fa.get(k, {}).get("sec", 0.0)
    sb = fb.get(k, {}).get("sec", 0.0)
    print(f"  {k:10s} {sa:7.1f} -> {sb:7.1f}  ({sb - sa:+6.1f})")
ma, mb = a["medians"], b["medians"]
rows = []
for q in set(ma) | set(mb):
    va, vb = ma.get(q, float("nan")), mb.get(q, float("nan"))
    rows.append((vb - va, va, vb, q))
rows.sort()
print("\nbiggest improvements:")
for d, va, vb, q in rows[:25]:
    print(f"  {va:7.2f} -> {vb:7.2f} ({d:+6.2f})  {q}")
print("\nbiggest regressions:")
for d, va, vb, q in rows[-12:][::-1]:
    print(f"  {va:7.2f} -> {vb:7.2f} ({d:+6.2f})  {q}")
