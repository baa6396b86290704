"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video are carried as ``binary`` columns beside structured
metadata, processed with Arrow-batched ``mapInPandas`` — the schema,
partitioning, UDF signatures, and batch shapes are real and tested; the
actual codec work is stubbed (no image/audio libraries in this
container) behind deterministic fakes / NotImplementedError so the
Spark-side contract is exercised end-to-end.

Scale notes: payloads never pass through a shuffle — decode/feature
stages are per-partition maps; only the (small) extracted features are
aggregated or joined downstream. Batch size is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch to keep worker memory flat
regardless of payload size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha string, feat array<float>"
)

FRAME_SCHEMA = "media_id long, frame_idx int, ts_ms long, n_bytes long"


def real_decode(payload: bytes, mime: str):
    """The codec boundary. Container has no imaging/audio libs — wire in
    PIL/libav here on a real cluster."""
    raise NotImplementedError(
        "codec libraries unavailable in this environment; "
        "use fake_feature/frame_sample for the tested contract"
    )


def extract_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Per-payload feature extraction over Arrow batches.

    The stub derives a deterministic float vector from payload bytes —
    the real implementation swaps only the inner numpy computation
    (decode -> embed); everything Spark-side (signature, schema, batch
    iteration) is the production path.
    """

    def gen(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            sha = payloads.map(
                lambda b: hashlib.sha256(b or b"").hexdigest()
            )
            # deterministic fake embedding: first feat_dim bytes of the
            # sha digest scaled to [0, 1)
            feat = [
                np.frombuffer(
                    hashlib.sha256(b or b"").digest()[:feat_dim], dtype="uint8"
                ).astype("float32")
                / 256.0
                for b in payloads
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes.astype("int64"),
                    "sha": sha,
                    "feat": feat,
                }
            )

    # r13 (guide §4.1): Spark cannot see which columns an opaque
    # Python function touches and would otherwise ship (and compute)
    # every MEDIA_SCHEMA column through the Arrow boundary — select
    # exactly what gen reads so mime/width/height/duration_ms are
    # pruned out of both the exchange and the upstream projection
    return media.select("media_id", "kind", "payload").mapInPandas(
        gen, FEATURE_SCHEMA
    )


def resize_images(media: DataFrame, max_px: int = 256) -> DataFrame:
    """Image resize plumbing: passes payloads through the Arrow batch
    path and recomputes metadata; the pixel work is the stubbed codec.
    Output schema matches the input so stages compose."""

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf.copy()
            # stub: clamp the metadata the way a real resize would
            out["width"] = out["width"].clip(upper=max_px)
            out["height"] = out["height"].clip(upper=max_px)
            yield out

    return media.mapInPandas(gen, MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one row per sampled frame timestamp.

    Emits the deterministic sampling grid from duration metadata; the
    real implementation would also attach the decoded frame bytes.
    """

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                # pd.isna, not `is None`: a NULL in an int64 column
                # coerces the pandas batch to float64 and arrives as
                # NaN, which `is None` misses (int(NaN // ...) would
                # then raise instead of skipping the row)
                if r["kind"] != "video" or pd.isna(r["duration_ms"]):
                    continue
                n_frames = int(r["duration_ms"] // every_ms)
                for i in range(n_frames):
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_idx": i,
                            "ts_ms": i * every_ms,
                            "n_bytes": len(r["payload"] or b""),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_ms", "n_bytes"]
            )

    # r13 (guide §4.1): ship only the columns gen reads through the
    # Python boundary (see extract_features)
    return media.select(
        "media_id", "kind", "duration_ms", "payload"
    ).mapInPandas(gen, FRAME_SCHEMA)


def media_features(spark, sf_dir: str) -> DataFrame:
    """Driver-verifiable slice of the multimodal pipeline: documents ->
    media payloads -> Arrow feature extraction, reporting byte counts,
    content sha, and the first fake-embedding component. Everything up
    to the codec boundary is the production path (binary column through
    mapInPandas); the oracle recomputes the same bytes/sha/feature in
    SQL, proving the Spark-side plumbing bit-exact."""
    from ..session import ensure_parallelism, read_table

    docs = ensure_parallelism(spark, read_table(spark, sf_dir, "documents"))
    feats = extract_features(media_from_documents(docs))
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        "sha",
        F.round(F.element_at(F.col("feat"), 1).cast("double"), 6).alias("f0"),
    )


def media_dedup(spark, sf_dir: str) -> DataFrame:
    """Exact binary-payload dedup report per media kind: unique
    payloads by content sha, duplicate copies, and the byte savings
    deduplication buys — the first pass every multimodal corpus runs
    (identical images recrawled under different ids dominate raw
    crawls). The sha groupBy shuffles 32-byte digests, never payloads;
    payload bytes stay partition-local (the multimodal scale rule).

    All-integer accounting (counts, byte sums), so the report is
    engine-exact; the oracle recomputes the same shas from the text
    fixture bytes.
    """
    from ..session import ensure_parallelism, read_table

    docs = ensure_parallelism(spark, read_table(spark, sf_dir, "documents"))
    m = media_from_documents(docs).select(
        "media_id", "kind",
        F.sha2("payload", 256).alias("sha"),
        F.length("payload").cast("long").alias("n_bytes"),
    )
    per_sha = m.groupBy("kind", "sha").agg(
        F.count("*").alias("copies"),
        F.min("media_id").alias("keep_media_id"),
        F.max("n_bytes").alias("payload_bytes"),
    )
    return (
        per_sha.groupBy("kind")
        .agg(
            F.sum("copies").alias("n_media"),
            F.count("*").alias("n_unique"),
            (F.sum("copies") - F.count("*")).alias("n_dup_copies"),
            F.sum(F.col("copies") * F.col("payload_bytes")).alias(
                "bytes_total"
            ),
            F.sum(
                (F.col("copies") - 1) * F.col("payload_bytes")
            ).alias("bytes_saved"),
        )
        .orderBy("kind")
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from documents (test fixture:
    payload := utf-8 text bytes) with the production MEDIA_SCHEMA."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    kind = F.element_at(kinds, (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("application/x-"), kind).alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
        (F.col("n_chars") % 1024).cast("int").alias("width"),
        (F.col("n_chars") % 768).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
    )


def media_frame_manifest(spark, sf_dir: str) -> DataFrame:
    """Driver-verifiable frame-sampling leg: documents -> media table
    -> frame_sample's deterministic grid, one row per sampled frame of
    every video payload. Everything but the pixel decode is the
    production path (duration metadata through the Arrow batch
    boundary); all-integer output (frame_idx, ts_ms, n_bytes), so the
    oracle replays the grid exactly with a range unnest — promoting
    the frame-sampling plumbing from unit-tested API to
    oracle-checked query alongside media_features/media_dedup."""
    from ..session import ensure_parallelism, read_table

    docs = ensure_parallelism(spark, read_table(spark, sf_dir, "documents"))
    return frame_sample(media_from_documents(docs))
