#!/usr/bin/env python
"""Capture .explain('formatted') for named queries into
plans/r13/<query>_<tag>.txt — compile-only (no execution beyond what a
query's own driver-side construction does).

Usage: python plans/r13/capture_plans.py <tag> <query1> [query2 ...]
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from jobsity_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    try:
        qs.update(entrymod.staged_queries())
    except AttributeError:
        pass
    outdir = os.path.dirname(os.path.abspath(__file__))
    for name in names:
        fn = qs[name]
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} chars)")


if __name__ == "__main__":
    main()
