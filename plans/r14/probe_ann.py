#!/usr/bin/env python
"""Probe: decompose emb_ann_recall into its component searches and the
support passes each one triggers (PQ trainings, IVF plumbing, LSH
bucket passes). Mirrors bench.py's protocol: noop sink, best of 2,
job-group metrics, memos warm in composite order."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from jobsity_data_pipeline_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark(
    app_name="probe-ann", master=f"local[{cpus}]",
    shuffle_partitions=int(cpus),
    extra_conf={"spark.ui.enabled": "true",
                "spark.ui.retainedJobs": "8000",
                "spark.ui.retainedStages": "8000"},
)
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

from pyspark.sql import functions as F  # noqa: E402

from jobsity_data_pipeline_spark.operators import similarity as S  # noqa: E402
from jobsity_data_pipeline_spark.operators import relational8 as R8  # noqa: E402


def timed(name, mk):
    best = None
    for i in range(2):
        group = f"probe:{name}:{i}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        df = mk()
        df.write.format("noop").mode("overwrite").save()
        el = round(time.perf_counter() - t0, 3)
        sc.setJobGroup("", "")
        best = el if best is None else min(best, el)
        if i == 1:
            tracker = sc.statusTracker()
            jids = tracker.getJobIdsForGroup(group)
            stage_ids = set()
            for j in jids:
                ji = tracker.getJobInfo(j)
                if ji:
                    stage_ids.update(ji.stageIds)
            print(json.dumps({"name": name, "best": best, "run2": el,
                              "jobs": len(jids),
                              "stages": len(stage_ids)}))
            sys.stdout.flush()
    return best


n_q, k = 8, 5

# component order mirrors emb_ann_recall's construction order so the
# per-(app,corpus) memos warm exactly as they do inside the composite
timed("exact_cosine_topk", lambda: S.emb_cosine_topk(spark, sf_dir, n_q, k))
timed("lsh", lambda: S.emb_lsh_ann(spark, sf_dir, n_q, k))
timed("ivf", lambda: S.emb_ivf_ann(spark, sf_dir, n_q, k))
timed("pq_ann_k200", lambda: R8.emb_pq_ann(spark, sf_dir, n_q, k=200))
timed("pq_rerank", lambda: R8.emb_pq_rerank(spark, sf_dir, n_q, k))
timed("pq_trained", lambda: R8.emb_pq_trained_ann(spark, sf_dir, n_q, k))
timed("ivfpq_16", lambda: S.emb_ivfpq_ann(spark, sf_dir, n_q, k))
timed("ivfpq_residual_16",
      lambda: S.emb_ivfpq_residual_ann(spark, sf_dir, n_q, k))
timed("ivfpq_256",
      lambda: S.emb_ivfpq_ann(spark, sf_dir, n_q, k, n_codes=256))
timed("ivfpq_residual_256",
      lambda: S.emb_ivfpq_residual_ann(spark, sf_dir, n_q, k, n_codes=256))
# the composite itself, memo-warm (as in bench steady state)
timed("emb_ann_recall", lambda: S.emb_ann_recall(spark, sf_dir, n_q, k))

n = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).count()
print(json.dumps({"n_embeddings": n}))
