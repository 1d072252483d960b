#!/usr/bin/env python3
"""Build BENCH_sf1_r11-style scale-validation artifacts.

Compares two Bench runs of the SAME query set on generator-twin fixtures
(tools: graft.tools.GenData at scale 1 and scale 10) and reports the
per-query wall-clock growth ratio against the 10x data growth. A query
is 'sublinear' if time grew less than data, 'linear-ish' up to 1.25x the
data growth (amortized constants + shuffle width effects), 'superlinear'
above that — superlinear queries need a PLANS.md root cause.

Usage: scale_compare.py <small_full.json> <big_full.json> <growth> <out>
"""
import json, sys

small = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))
growth = float(sys.argv[3])
out = sys.argv[4]

rows = []
for q in sorted(big, key=lambda k: -big[k]):
    if q not in small or small[q] <= 0 or big[q] <= 0:
        continue
    ratio = big[q] / small[q]
    cls = ('sublinear' if ratio <= growth
           else 'linearish' if ratio <= growth * 1.25
           else 'superlinear')
    rows.append({'query': q, 'small_s': round(small[q], 3),
                 'big_s': round(big[q], 3), 'ratio': round(ratio, 2),
                 'class': cls})

doc = {
    'metric': 'scale_growth',
    'data_growth': growth,
    'n_queries': len(rows),
    'superlinear': [r['query'] for r in rows if r['class'] == 'superlinear'],
    'linearish': [r['query'] for r in rows if r['class'] == 'linearish'],
    'total_small_s': round(sum(r['small_s'] for r in rows), 3),
    'total_big_s': round(sum(r['big_s'] for r in rows), 3),
    'queries': rows,
}
json.dump(doc, open(out, 'w'), indent=1)
print(f"{out}: {len(rows)} queries, "
      f"{len(doc['superlinear'])} superlinear {doc['superlinear']}, "
      f"{len(doc['linearish'])} linearish {doc['linearish']}")
for r in rows:
    print(f"{r['query']:28s} {r['small_s']:8.3f} -> {r['big_s']:8.3f}  "
          f"x{r['ratio']:<6} {r['class']}")
