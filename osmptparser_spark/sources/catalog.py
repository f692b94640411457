"""Thin table catalog: the Iceberg swap point.

The sandbox has no Iceberg runtime jars and no network, so tables live
as plain parquet in an Iceberg-like layout (one directory per table,
partition columns in the path). Every reader/writer in the engine goes
through this module, so moving to real Iceberg is a config change
(`format="iceberg"` + catalog conf on the SparkSession), not a code
change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_FORMAT = "parquet"


class Catalog:
    def __init__(self, spark: SparkSession, base: str, fmt: str = DEFAULT_FORMAT):
        self.spark = spark
        self.base = base.rstrip("/")
        self.fmt = fmt

    def path(self, name: str) -> str:
        return f"{self.base}/{name}"

    def load(self, name: str) -> DataFrame:
        if self.fmt == "iceberg":
            return self.spark.read.format("iceberg").load(self.path(name))
        return self.spark.read.parquet(self.path(name))

    def save(
        self,
        df: DataFrame,
        name: str,
        partition_by: list[str] | None = None,
        mode: str = "overwrite",
    ) -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        if self.fmt == "iceberg":
            w.format("iceberg").save(self.path(name))
        else:
            w.parquet(self.path(name))

    def testdata(self, sf_dir: str, name: str) -> DataFrame:
        """Driver-provided flat-file tables (TESTDATA.md layout)."""
        return self.spark.read.parquet(f"{sf_dir}/{name}.parquet")

    def save_bucketed(
        self,
        df: DataFrame,
        table: str,
        bucket_cols: list[str],
        n_buckets: int = 32,
        sort_cols: list[str] | None = None,
        mode: str = "overwrite",
    ) -> None:
        """Bucketed managed table: joins/aggregations on the bucket key
        between co-bucketed tables run WITHOUT a shuffle (Exchange-free
        sort-merge join). This is the co-located-join strategy for the
        repeatedly-joined big tables (nodes by id, tiles by cell)."""
        w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
        if sort_cols:
            w = w.sortBy(*sort_cols)
        w.option("path", self.path(table)).saveAsTable(table)

    def table(self, table: str) -> DataFrame:
        return self.spark.table(table)
