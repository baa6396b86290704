#!/usr/bin/env python
"""Snapshot every registered query's output as a canonical hash, for
old-vs-new bit-identity verification during the r14 restructures.

Usage: python plans/r14/snap_outputs.py OUT.json SF_DIR [key1,key2,...]
Canonical form: rows collected, each field rendered with repr() (exact
round-trip for floats), rows sorted, md5 over the joined text. Schema
(names+types) included so a type change also shows up.
"""
import hashlib
import json
import sys

sys.path.insert(0, "/root/repo")

out_path, sf_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

from jobsity_data_pipeline_spark.session import get_spark

spark = get_spark(app_name="snap", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry

res = {}
for name, fn in entry.queries().items():
    if only and name not in only:
        continue
    try:
        df = fn(spark, sf_dir)
        schema = str(df.schema)
        rows = sorted(
            "|".join(repr(v) for v in row) for row in df.collect()
        )
        h = hashlib.md5(
            (schema + "\n" + "\n".join(rows)).encode()
        ).hexdigest()
        res[name] = {"n": len(rows), "hash": h}
    except Exception as exc:
        res[name] = {"err": str(exc)[:300]}
    print(name, res[name], flush=True)

with open(out_path, "w") as fh:
    json.dump(res, fh, indent=1, sort_keys=True)
