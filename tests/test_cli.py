"""Tests for the ``python -m jobsity_data_pipeline_spark`` CLI — the
operational surface mirroring how the reference repo is driven
(a script over CSV + warehouse). list/oracle are Spark-free;
run/ingest reuse the session fixture's JVM via get_spark's
getOrCreate."""

from __future__ import annotations

import pytest

from jobsity_data_pipeline_spark.__main__ import main
from tests.conftest import SF_SMOKE


@pytest.fixture(autouse=True)
def _preserve_session_conf(request):
    """The CLI builds its own session via get_spark — in production a
    fresh process, but under the shared test session getOrCreate
    APPLIES the builder's options (e.g. shuffle.partitions=32) to the
    live session, which breaks later bucketing tests that pin buckets
    to the fixture's partition count. Snapshot and restore the knobs
    get_spark sets."""
    spark = request.getfixturevalue("spark") if (
        "spark" in request.fixturenames
    ) else None
    if spark is None:
        yield
        return
    keys = ("spark.sql.shuffle.partitions",
            "spark.sql.files.maxPartitionBytes")
    saved = {k: spark.conf.get(k) for k in keys}
    yield
    for k, v in saved.items():
        spark.conf.set(k, v)


def test_list_filters(capsys):
    assert main(["list", "q1_"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out == ["q1_pricing_summary"]
    assert main(["list"]) == 0
    assert len(capsys.readouterr().out.splitlines()) >= 198


def test_oracle_prints_sql(capsys):
    assert main(["oracle", "q1_pricing_summary"]) == 0
    assert "l_returnflag" in capsys.readouterr().out
    assert main(["oracle", "nope"]) == 1


def test_run_query(spark, capsys):
    assert main(["run", "dq_report", "--sf-dir", SF_SMOKE,
                 "--limit", "3"]) == 0
    out = capsys.readouterr().out
    assert "check" in out and "n_bad" in out
    assert main(["run", "nope"]) == 1


def test_run_explain(spark, capsys):
    assert main(["run", "q1_pricing_summary", "--sf-dir", SF_SMOKE,
                 "--explain"]) == 0
    assert "Physical Plan" in capsys.readouterr().out


def test_ingest_trips(spark, tmp_path, capsys):
    rows = [
        ("Prague", "POINT (14.4973 50.0013)", "POINT (14.4310 50.0405)",
         "2018-05-28 09:03:40", "funny_car"),
        ("Turin", "POINT (7.6728 44.9957)", "POINT (7.7203 45.0678)",
         "2018-05-21 02:54:04", "baba_car"),
        # duplicate of row 0: the reference's ON CONFLICT DO NOTHING
        ("Prague", "POINT (14.4973 50.0013)", "POINT (14.4310 50.0405)",
         "2018-05-28 09:03:40", "funny_car"),
    ]
    p = tmp_path / "trips.csv"
    p.write_text("\n".join(
        ["region,origin_coord,destination_coord,datetime,datasource"]
        + [",".join(f'"{c}"' for c in r) for r in rows]
    ))
    table = str(tmp_path / "trips_tbl")
    assert main(["ingest", str(p), table]) == 0
    assert "2 rows" in capsys.readouterr().out
    # replaying the same batch id is the idempotent no-op
    assert main(["ingest", str(p), table, "--batch-id", "0"]) == 0
    assert "skipped_duplicate" in capsys.readouterr().out


def test_history_and_maintain(spark, tmp_path, capsys):
    from jobsity_data_pipeline_spark.sources.snapshot import upsert_batch

    table = str(tmp_path / "t")
    for b in range(4):
        upsert_batch(
            spark.createDataFrame(
                [(b * 10 + i, float(i)) for i in range(5)],
                "id long, price double",
            ),
            b, table, key="id",
        )
    assert main(["history", table]) == 0
    lines = capsys.readouterr().out.splitlines()
    assert len(lines) == 4 and lines[0].startswith("v     1")

    assert main(["maintain", table, "--analyze-keys", "price"]) == 0
    out = capsys.readouterr().out
    assert '"compact"' in out and '"analyze"' in out
    assert main(["history", table]) == 0
    # compaction (and analyze) published new versions
    assert len(capsys.readouterr().out.splitlines()) >= 5


def test_list_staged(capsys):
    """Round-13: the whole round-12 staged wave registered at once —
    `list --staged` enumerates whatever is currently staged (may be
    empty between waves), and the promoted keys now appear in the
    REGISTERED listing only."""
    assert main(["list", "--staged"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert "docs_theils_u" not in out  # promoted r13
    assert "orders_forecast_theta" not in out  # promoted r13
    assert main(["list", "theils"]) == 0
    assert "docs_theils_u" in capsys.readouterr().out.splitlines()
    assert main(["list", "theta"]) == 0
    assert "orders_forecast_theta" in \
        capsys.readouterr().out.splitlines()


def test_run_and_oracle_reach_promoted_keys_without_banner(
        spark, capsys):
    """`run`/`oracle` execute a round-12-promoted key end-to-end via
    the REGISTERED path — no 'staged' banner anymore."""
    assert main(["oracle", "docs_ad_source_drift"]) == 0
    cap = capsys.readouterr()
    assert "ad_a2" in cap.out
    assert "[staged]" not in cap.err
    assert main(["run", "orders_forecast_holt_damped",
                 "--sf-dir", SF_SMOKE, "--limit", "3"]) == 0
    cap = capsys.readouterr()
    assert "forecast_c" in cap.out
    assert "[staged]" not in cap.err
