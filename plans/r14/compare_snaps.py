#!/usr/bin/env python
"""Compare two snap_outputs.py JSONs; exit 1 on any mismatch."""
import json
import sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
keys = sorted(set(a) & set(b)) if len(sys.argv) < 4 else sys.argv[3].split(",")
bad = 0
for k in keys:
    if a.get(k) != b.get(k):
        print("MISMATCH", k, a.get(k), "->", b.get(k))
        bad += 1
print(f"{len(keys)} compared, {bad} mismatches")
sys.exit(1 if bad else 0)
