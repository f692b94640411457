"""SparkSession factory with scale-oriented defaults.

AQE (runtime re-plan, partition coalescing, skew-join splitting),
runtime Bloom-filter semi-join pushdown, and Arrow transfer are on by
default — these replace the reference's hand-built optimizations
(3-pass semi-join pushdown, bounded-channel backpressure, shared id
sets; SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.optimizer.runtimeFilter.bloomFilter.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # grouped-UDF groups are tiny (one route relation); large batches
    # keep the Arrow transfer efficient for mapInPandas extraction
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.session.timeZone": "UTC",
}


def get_spark(
    app_name: str = "osmptparser-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    confs: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS or *]`` outside a
    cluster; on a real cluster leave it unset and let spark-submit
    decide (north rule: same code runs via spark-submit --py-files).
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master:
        builder = builder.master(master)
    merged = dict(DEFAULT_CONFS)
    if shuffle_partitions is not None:
        merged["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if confs:
        merged.update(confs)
    for k, v in merged.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
