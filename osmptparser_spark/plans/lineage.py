"""Checkpoint / lineage / metrics (W9): resumable multi-stage pipelines.

Every stage materializes to parquet together with a partition-level
manifest (`_lineage/stage=<name>`): one row per output partition with
row count and an order-insensitive value hash, plus a completion row
(partition_id = -1) holding totals and wall time. Re-running a
pipeline skips stages whose completion row matches the on-disk output
(resume = read back instead of recompute); a missing/partial manifest
forces a clean recompute of exactly that stage.

This is the Spark-native version of "every stage checkpoints
per-partition lineage and metrics to allow resume" (north rule): the
manifest is itself a DataFrame write (no driver-side bookkeeping), so
it scales with partition count, not row count.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _hash_all_columns(df: DataFrame):
    # xxhash64 over every column; summed as decimal(38,0) so the
    # order-insensitive combine cannot overflow under ANSI mode
    return F.xxhash64(*[F.col(c) for c in df.columns]).cast("decimal(38,0)")


class LineageTracker:
    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir.rstrip("/")

    def _manifest_path(self, stage: str) -> str:
        return f"{self.base_dir}/_lineage/{stage}"

    def _output_path(self, stage: str) -> str:
        return f"{self.base_dir}/{stage}"

    def manifest(self, stage: str) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self._manifest_path(stage))
        except Exception:
            return None

    def is_complete(self, stage: str, verify_hash: bool = False) -> bool:
        """True iff the stage's manifest exists, is internally
        consistent, AND matches the on-disk output. The internal check
        alone would be tautological (both sides derive from the same
        write-time DataFrame), so the output parquet is re-counted —
        a footer-metadata read, cheap at any scale. ``verify_hash=True``
        additionally re-hashes the output content (full scan: use for
        audits, not every resume)."""
        m = self.manifest(stage)
        if m is None:
            return False
        total = m.filter(F.col("partition_id") == -1).collect()
        if not total:
            return False
        parts = m.filter(F.col("partition_id") >= 0).agg(
            F.sum("n_rows").alias("n"), F.sum("value_hash").alias("h")
        ).collect()[0]
        if parts["n"] != total[0]["n_rows"] or parts["h"] != total[0]["value_hash"]:
            return False
        try:
            out = self.spark.read.parquet(self._output_path(stage))
        except Exception:
            return False  # manifest without output: stage must re-run
        if out.count() != total[0]["n_rows"]:
            return False
        if verify_hash:
            got = out.agg(F.sum(_hash_all_columns(out)).alias("h")).collect()[0]["h"]
            if got != total[0]["value_hash"]:
                return False
        return True

    def run_stage(self, stage: str, df_fn, force: bool = False) -> DataFrame:
        """Materialize ``df_fn()`` as stage output, or read it back if the
        stage already completed (resume). ``df_fn`` is lazy so skipped
        stages never even build their plan."""
        out_path = self._output_path(stage)
        if not force and self.is_complete(stage):
            return self.spark.read.parquet(out_path)
        t0 = time.time()
        df = df_fn()
        df.write.mode("overwrite").parquet(out_path)
        written = self.spark.read.parquet(out_path)
        per_part = (
            written.withColumn("partition_id", F.spark_partition_id())
            .withColumn("_h", _hash_all_columns(written))
            .groupBy("partition_id")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("_h").alias("value_hash"),
            )
        )
        elapsed = time.time() - t0
        totals = per_part.agg(
            F.sum("n_rows").alias("n_rows"), F.sum("value_hash").alias("value_hash")
        ).withColumn("partition_id", F.lit(-1))
        manifest = (
            per_part.unionByName(totals.select("partition_id", "n_rows", "value_hash"))
            .withColumn("stage", F.lit(stage))
            .withColumn("wall_sec", F.lit(float(elapsed)))
        )
        manifest.write.mode("overwrite").parquet(self._manifest_path(stage))
        return written

    def metrics(self) -> DataFrame:
        """All stage manifests (totals rows) as one metrics DataFrame."""
        return self.spark.read.parquet(f"{self.base_dir}/_lineage/*").filter(
            F.col("partition_id") == -1
        )
