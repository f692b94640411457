"""Catalog round-trip (Iceberg swap point), iter_rows, and CLI over PBF."""

import json
import os

import pytest

from tests.fixture_util import REFERENCE_PBF


def test_catalog_save_load_partitioned(spark, tmp_path):
    from osmptparser_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "warehouse"))
    df = spark.createDataFrame(
        [(i, i % 4) for i in range(100)], "id BIGINT, bucket INT"
    )
    cat.save(df, "t1", partition_by=["bucket"])
    back = cat.load("t1")
    assert back.count() == 100
    assert sorted(r.bucket for r in back.select("bucket").distinct().collect()) == [
        0, 1, 2, 3,
    ]
    # partitioned layout on disk (Iceberg-like path partitioning)
    assert any(p.startswith("bucket=") for p in os.listdir(cat.path("t1")))
    td = cat.testdata("/root/testdata/sf0.001", "nation")
    assert td.count() == 25


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    from osmptparser_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "bwh"))
    a = spark.createDataFrame([(i, i * 2) for i in range(1000)], "id BIGINT, x BIGINT")
    b = spark.createDataFrame([(i, i * 3) for i in range(1000)], "id BIGINT, y BIGINT")
    cat.save_bucketed(a, "bucketed_a", ["id"], n_buckets=8, sort_cols=["id"])
    cat.save_bucketed(b, "bucketed_b", ["id"], n_buckets=8, sort_cols=["id"])
    # force a sort-merge join (tiny tables would broadcast) to show the
    # bucketing effect: no ShuffleExchange on either side
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cat.table("bucketed_a").join(cat.table("bucketed_b"), "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
        assert "Bucketed: true" in plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bucketed_a")
        spark.sql("DROP TABLE IF EXISTS bucketed_b")


def test_iter_rows_deterministic_order(spark):
    from osmptparser_spark.engine import iter_rows

    df = spark.createDataFrame([(3,), (1,), (2,)], "id BIGINT")
    assert [r.id for r in iter_rows(df)] == [1, 2, 3]


@pytest.mark.skipif(not os.path.exists(REFERENCE_PBF), reason="reference absent")
def test_cli_pbf_input(spark, tmp_path):
    from osmptparser_spark import cli

    outp = str(tmp_path / "out_pbf")
    rc = cli.main(
        [
            "--filter-ptv2",
            "--input", REFERENCE_PBF,
            "--input-format", "pbf",
            "--gap", "1500",
            "--output", outp,
        ]
    )
    assert rc == 0
    ids = []
    for f in os.listdir(outp):
        if f.startswith("part-"):
            with open(os.path.join(outp, f)) as fh:
                ids += [json.loads(l)["properties"]["id"] for l in fh if l.strip()]
    assert sorted(ids) == [85965, 2030162]
