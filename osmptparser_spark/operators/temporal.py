"""Temporal join operators: as-of join (backward-looking point lookup).

The reference has none of these (SURVEY.md §2.2); they belong to the
engine's training-data-pipeline surface — "state of X at the time of
event Y" feature joins (latest model score before an interaction,
latest purchase before a click, latest config before a log line).

Scale shape: ONE shuffle. The naive formulations — per-left-row
correlated subquery, or a range theta-join — are a driver loop or a
BroadcastNestedLoopJoin at scale. Instead both sides are union-tagged
and hash-partitioned by key, and a single running `last(ignorenulls)`
window over (key, time) carries the most recent right payload forward
into each left row: cost = one exchange + one sort, identical to the
groupBy the key would need anyway, no matter how skewed the
left:right ratio per key is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str = "t",
    start: str = "t_start",
    end: str = "t_end",
    bucket_width: int | None = None,
    max_explode_buckets: int = 256,
) -> DataFrame:
    """Range join: every (point, interval) pair with ``start <= t <
    end`` — the 1-D twin of the spatial cell join. Catalyst would plan
    the raw range predicate as a BroadcastNestedLoopJoin; instead both
    sides land on a bucket grid (width ~ typical interval length) and
    the join is a plain shuffle EQUI-join on bucket with the range kept
    as a residual filter: work scales with true overlap, either side
    can be arbitrarily large, AQE handles bucket skew.

    ``bucket_width`` defaults to a driver-side sample of the median
    interval length (one tiny job); pass it explicitly in production
    pipelines.

    Outliers: an interval spanning more than ``max_explode_buckets``
    grid cells (a year-long interval among second-scale ones) does NOT
    explode into length/width rows — such rows split to a small
    broadcast theta path instead, so the explode side is bounded at
    ``max_explode_buckets`` rows per interval no matter the length
    distribution. Empty or reversed intervals (``end <= start``) can
    match no point and are dropped up front — without the guard a
    single reversed row would generate a huge DESCENDING bucket
    sequence (F.sequence auto-steps -1) that the residual filter then
    throws away.
    """
    if bucket_width is None:
        med = (
            intervals.select(
                F.percentile_approx(F.col(end) - F.col(start), 0.5).alias("m")
            ).first()["m"]
        )
        bucket_width = max(int(med or 1), 1)
    iv_all = intervals.filter(F.col(end) > F.col(start))
    first_b = F.floor(F.col(start) / F.lit(bucket_width)).cast("long")
    last_b = F.floor((F.col(end) - 1) / F.lit(bucket_width)).cast("long")
    is_outlier = (last_b - first_b) >= F.lit(max_explode_buckets)
    residual = (F.col(start) <= F.col(on)) & (F.col(on) < F.col(end))

    p = points.withColumn(
        "_bucket", F.floor(F.col(on) / F.lit(bucket_width)).cast("long")
    )
    iv = iv_all.filter(~is_outlier).withColumn(
        "_bucket", F.explode(F.sequence(first_b, last_b))
    )
    grid = p.join(iv, "_bucket").filter(residual).drop("_bucket")
    outliers = iv_all.filter(is_outlier)
    theta = points.join(F.broadcast(outliers), residual)
    return grid.unionByName(theta)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "key",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: for every left row, attach the payload of
    the LATEST right row with the same ``by`` key and ``right.on <=
    left.on`` (inclusive, matching DuckDB/pandas `ASOF` semantics).
    Left rows with no prior right row keep NULL payloads.

    ``right_cols``: right payload columns to carry (default: all
    except ``on``/``by``); each lands as ``<name><suffix>`` plus the
    match time as ``<on><suffix>``.

    Ties: right rows at exactly the same ``on`` instant as the left
    row ARE visible (inclusive); among several right rows with the
    identical (by, on), the one latest in the deterministic
    (on, side, row-payload) sort wins — callers needing a specific
    tiebreak should pre-aggregate the right side per (by, on).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (by, on)]
    payload = F.struct(
        F.col(on).alias(f"{on}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )
    r = right.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_on"),
        F.lit(0).alias("_side"),
        payload.alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in left.columns],
    )
    l = left.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_on"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    # right rows sort BEFORE left rows at an equal instant -> inclusive
    w = (
        Window.partitionBy("_by")
        .orderBy(F.col("_on"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        r.unionByName(l)
        .withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    out_cols = [F.col(f"_l_{c}").alias(c) for c in left.columns]
    out_cols.append(F.col(f"_match.{on}{suffix}").alias(f"{on}{suffix}"))
    out_cols += [
        F.col(f"_match.{c}{suffix}").alias(f"{c}{suffix}") for c in right_cols
    ]
    return carried.select(*out_cols)
