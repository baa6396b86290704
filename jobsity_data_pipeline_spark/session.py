"""SparkSession factory tuned for both local testing and cluster scale.

The reference runs a 2-worker standalone cluster (docker-compose.yml);
we instead encode the runtime knobs that matter at 100 TB: AQE (runtime
re-planning, skew-join splitting, partition coalescing), Arrow for any
pandas exchange, and shuffle partitions sized from the environment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "jobsity-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    On a real cluster ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus) if cpus.isdigit() else 32, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # 100 TB scans: bound per-task input so partitions fit memory.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Driver testdata parquet uses TIMESTAMP(NANOS) which the Spark
        # vectorized reader rejects; read as long and convert centrally
        # (read_table) — truncation to micros matches DuckDB's reader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", os.environ.get("SPARK_UI_ENABLED", "false"))
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Timestamp columns in the driver parquet. Depending on the generator
# run they arrive as TIMESTAMP(NANOS) (read as nano-longs via
# legacy.parquet.nanosAsLong) or as micros TIMESTAMP_NTZ; both are
# normalized here to session-UTC TIMESTAMP so downstream instant
# functions (unix_micros, window, session_window) resolve uniformly.
_NANO_TS_COLS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def read_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one driver parquet table, normalizing nano-timestamps.

    Plain ``spark.read.parquet`` so column pruning and predicate
    pushdown flow into the scan; the nanos->micros cast is a cheap
    projection on top (`div 1000` keeps integer math, matching the
    truncation DuckDB's nanos reader performs).
    """
    from pyspark.sql import functions as F

    # Runtime-set so sessions not built by get_spark (e.g. the driver's)
    # can still scan the nanos-timestamp parquet; UTC pins hour/date
    # derivations to the oracle's naive-timestamp semantics regardless
    # of the host/session zone.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _NANO_TS_COLS.get(name, ()):
        dtype = dict(df.dtypes).get(c)
        if dtype == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dtype == "timestamp_ntz":
            # NTZ -> instant under the session's UTC zone: wall-clock
            # micros are preserved bit-for-bit, matching the oracle's
            # naive-timestamp semantics.
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES):
    """Read the driver-generated parquet tables as a dict of DataFrames."""
    return {name: read_table(spark, sf_dir, name) for name in names}


def corpus_fingerprint(sf_dir: str, name: str) -> tuple:
    """Cheap data fingerprint of one corpus table — (table, max
    mtime_ns, total bytes) over its parquet file or directory — for
    per-(app, corpus) memo KEYS (the _centered_shared /
    _qc_trained_weights pins): if the parquet under ``sf_dir`` is
    regenerated within one long-lived Spark application, the
    fingerprint changes and the memo re-derives instead of silently
    serving stale pinned data. Driver-side os.stat only — no Spark
    job, negligible next to any query it guards."""
    p = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isdir(p):
            mx, tot = 0, 0
            for root, _dirs, files in os.walk(p):
                for fn in files:
                    st = os.stat(os.path.join(root, fn))
                    mx = max(mx, st.st_mtime_ns)
                    tot += st.st_size
            return (name, mx, tot)
        st = os.stat(p)
        return (name, st.st_mtime_ns, st.st_size)
    except OSError:
        return (name, -1, -1)


def pin(df):
    """Pin a METADATA-SIZED frame with a lazy localCheckpoint so every
    downstream reference reads one shared computation instead of
    cloning the whole upstream Catalyst subtree.

    The statistics/audit kernels are diamond-shaped: a corpus-wide
    reduction to a small sufficient statistic (distinct value-cents,
    calendar grids, quasi-identifier classes, k-row per-group frames)
    is then consumed 3-6 times (per-group stats, 1-row globals, the
    broadcast-back). Catalyst clones the reduction per reference, so
    the compiled plan re-expands the corpus scan each time — measured
    at sf0.1 as 60-160 KB physical plans and 40-110 stages for
    metadata-sized math. ReusedExchange recovers some of it at
    runtime, but the planning cost and the job/stage fan-out remain.

    ``localCheckpoint(eager=False)`` truncates the lineage to one
    LogicalRDD: the statistic is computed ONCE by the first consuming
    job (no extra materialization job) and every other reference reads
    the checkpointed partitions. At 100 TB this is strictly better —
    the corpus is scanned once instead of per-reference — and the
    pinned frame is bounded by METADATA cardinality by each caller's
    design, so the executor-local copy is KBs. Only pin frames with
    that bound: corpus-sized frames keep the recompute posture
    (emb_top_pc's documented trade).

    Numerics are unchanged: the pinned frame is the same plan computed
    once; downstream arithmetic is identical.
    """
    return df.localCheckpoint(eager=False)


def ensure_parallelism(spark: SparkSession, df):
    """Repartition a too-few-partitions RAW SCAN up to the session's
    core count.

    Small local test files arrive as a single scan partition, which
    serializes expression-heavy operators (minhash, lang-id, cosine) on
    one core. At 100 TB the scan is already split by
    spark.sql.files.maxPartitionBytes so this is a no-op there — the
    shuffle only triggers when the input underuses the cluster.

    PRECONDITION (enforced): ``df`` must be a shuffle-free plan — a
    raw ``read_table`` scan plus narrow projections/filters. The
    partition-count probe goes through ``df.rdd``, which under AQE
    MATERIALIZES any shuffle stages in the plan just to expose a
    count (the measured grouped_topk double-run gotcha,
    ranking.py) — safe only when there is nothing to materialize.
    Derived frames should pick an explicit partition count instead.
    The check walks the logical tree's nodeName()s (a plan-STRING
    substring match would false-positive on column names like
    'JoinDate') and raises ValueError rather than assert (asserts
    vanish under python -O, which is exactly when a silent
    double-materialization would slip through).
    """
    # 'Distinct' is deliberately absent: PySpark .distinct() lowers to
    # a Deduplicate node, so 'Distinct' never appears as a logical
    # nodeName. GlobalLimit (plans a single-partition exchange) and
    # Expand (backs rollup/cube/grouping-sets) materialize under the
    # rdd probe just like the classic shuffles, so they're banned too.
    banned = {
        "Aggregate", "Join", "Window", "Repartition",
        "RepartitionByExpression", "Deduplicate", "Sort",
        "GlobalLimit", "Expand",
    }

    def _walk(node):
        yield node.nodeName()
        ch = node.children()
        for i in range(ch.size()):
            yield from _walk(ch.apply(i))

    hits = banned.intersection(
        _walk(df._jdf.queryExecution().logical()))
    if hits:
        raise ValueError(
            f"ensure_parallelism is scan-only (found {sorted(hits)}): "
            "the df.rdd partition probe materializes shuffle stages "
            "under AQE; pass a raw read_table scan or repartition "
            "explicitly"
        )
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
