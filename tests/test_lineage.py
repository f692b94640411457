"""W9: per-stage lineage manifests, metrics, and resume-from-checkpoint."""

import shutil

import pytest

from pyspark.sql import functions as F

from osmptparser_spark.plans.lineage import LineageTracker


@pytest.fixture()
def base(tmp_path):
    return str(tmp_path / "pipeline")


def test_stage_writes_manifest_and_resumes(spark, base):
    lt = LineageTracker(spark, base)
    calls = {"n": 0}

    def stage1():
        calls["n"] += 1
        return spark.range(0, 1000).withColumn("v", F.col("id") * 2)

    out1 = lt.run_stage("s1", stage1)
    assert out1.count() == 1000
    assert calls["n"] == 1
    assert lt.is_complete("s1")

    # resume: df_fn must NOT be called again
    out1b = lt.run_stage("s1", stage1)
    assert calls["n"] == 1
    assert out1b.count() == 1000

    # downstream stage consumes the checkpoint
    out2 = lt.run_stage(
        "s2", lambda: out1b.groupBy((F.col("id") % 10).alias("k")).count()
    )
    assert out2.count() == 10

    m = lt.metrics().collect()
    stages = {r.stage: r for r in m}
    assert stages["s1"].n_rows == 1000
    assert stages["s2"].n_rows == 10
    assert all(r.wall_sec >= 0 for r in m)


def test_partial_output_forces_recompute(spark, base):
    lt = LineageTracker(spark, base)
    lt.run_stage("s1", lambda: spark.range(100))
    # simulate a crash that lost the manifest -> must recompute
    shutil.rmtree(f"{base}/_lineage/s1")
    calls = {"n": 0}

    def again():
        calls["n"] += 1
        return spark.range(100)

    lt.run_stage("s1", again)
    assert calls["n"] == 1
    assert lt.is_complete("s1")


def test_manifest_partition_rows_sum_to_total(spark, base):
    lt = LineageTracker(spark, base)
    lt.run_stage("s1", lambda: spark.range(0, 5000).repartition(8))
    m = lt.manifest("s1")
    parts = m.filter(F.col("partition_id") >= 0).agg(
        F.sum("n_rows"), F.sum("value_hash")
    ).collect()[0]
    tot = m.filter(F.col("partition_id") == -1).collect()[0]
    assert parts[0] == tot.n_rows == 5000
    assert parts[1] == tot.value_hash
