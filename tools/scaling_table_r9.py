#!/usr/bin/env python3
"""Render the round-9 continuation scaling table (BASELINE.md) from
bench/bench_r9_cont_sf{01,1}_isolated.json."""
import json
import math

sf01 = json.load(open("bench/bench_r9_cont_sf01_isolated.json"))["queries"]
sf1 = json.load(open("bench/bench_r9_cont_sf1_isolated.json"))["queries"]
rows = []
for q in sorted(set(sf01) & set(sf1), key=lambda q: -sf1[q]):
    r = sf1[q] / sf01[q]
    rows.append((q, sf01[q], sf1[q], r, math.log10(r)))
print("| query | sf0.1 s | sf1 s | ratio | exp |")
print("|---|---|---|---|---|")
for q, a, b, r, e in rows:
    print(f"| {q} | {a:.2f} | {b:.2f} | {r:.2f} | {e:.2f} |")
missing = set(sf01) ^ set(sf1)
if missing:
    print("\nmissing from one side:", sorted(missing))
