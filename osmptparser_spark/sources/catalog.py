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
