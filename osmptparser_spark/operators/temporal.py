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
    max_broadcast_outliers: int = 100_000,
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

    Long intervals (round-5 rework — the single coarse tier used to
    broadcast UNGUARDED, an OOM with a heavy-tailed length
    distribution): the grid is two-level. An interval spanning more
    than ``max_explode_buckets`` fine cells explodes on a COARSE grid
    (``bucket_width * max_explode_buckets`` wide) instead — still at
    most ``max_explode_buckets`` rows per interval, still a shuffle
    equi-join, so a corpus where MOST intervals are "outliers" stays
    a bounded explode, never a broadcast. Only intervals spanning more
    than ``max_explode_buckets**2`` fine cells (for 1-s buckets at the
    default 256: >18 h among second-scale intervals) fall through to
    the broadcast theta path, and that side is now counted and raises
    past ``max_broadcast_outliers`` rather than silently building an
    unbounded broadcast + O(points x outliers) BNLJ. Such rows each
    overlap >= max_explode_buckets**2 grid cells of time, so the
    join OUTPUT is enormous long before the guard fires — the raise
    tells the caller to rethink the query, not merely the plan.

    Empty or reversed intervals (``end <= start``) can match no point
    and are dropped up front — without the guard a single reversed row
    would generate a huge DESCENDING bucket sequence (F.sequence
    auto-steps -1) that the residual filter then throws away.
    """
    iv_all = intervals.filter(F.col(end) > F.col(start))
    residual = (F.col(start) <= F.col(on)) & (F.col(on) < F.col(end))

    def _grid_leg(width: int, lo_span, hi_span) -> DataFrame:
        """Equi-join leg on a grid of ``width``: intervals whose fine-
        cell span is in [lo_span, hi_span) explode here."""
        first_b = F.floor(F.col(start) / F.lit(width)).cast("long")
        last_b = F.floor((F.col(end) - 1) / F.lit(width)).cast("long")
        span = _span_fine(start, end, bucket_width)
        sel = span >= F.lit(lo_span)
        if hi_span is not None:
            sel = sel & (span < F.lit(hi_span))
        p = points.withColumn(
            "_bucket", F.floor(F.col(on) / F.lit(width)).cast("long")
        )
        iv = iv_all.filter(sel).withColumn(
            "_bucket", F.explode(F.sequence(first_b, last_b))
        )
        return p.join(iv, "_bucket").filter(residual).drop("_bucket")

    # Driver-side sizing, minimal jobs: ONE tier-count aggregate over
    # the intervals scan (plus the pre-existing median job only when
    # ``bucket_width`` is defaulted) keeps the COMMON case — every
    # interval fits the fine grid — on the single-join plan, and makes
    # the huge-interval broadcast provably bounded before it is built.
    # Production callers passing an explicit bucket_width pay exactly
    # one tiny job, the same count a defaulted width always cost.
    huge_span = max_explode_buckets * max_explode_buckets
    if bucket_width is None:
        med_expr = F.percentile_approx(F.col(end) - F.col(start), 0.5)
        med = iv_all.agg(med_expr).first()[0]
        bucket_width = max(int(med or 1), 1)
    span = _span_fine(start, end, bucket_width)
    n_coarse, n_huge = iv_all.agg(
        F.sum(
            F.when(
                (span >= max_explode_buckets) & (span < huge_span), 1
            ).otherwise(0)
        ),
        F.sum(F.when(span >= huge_span, 1).otherwise(0)),
    ).first()
    legs = [_grid_leg(bucket_width, 0, max_explode_buckets)]
    if n_coarse:
        legs.append(
            _grid_leg(
                bucket_width * max_explode_buckets,
                max_explode_buckets,
                huge_span,
            )
        )
    if n_huge:
        if n_huge > max_broadcast_outliers:
            raise ValueError(
                f"interval_join: {n_huge} intervals span >= {huge_span} "
                f"grid cells (bucket_width={bucket_width}), more than "
                f"max_broadcast_outliers={max_broadcast_outliers} — the "
                "broadcast outlier path would be unbounded. Raise "
                "bucket_width (or max_explode_buckets) so the length "
                "distribution fits the grid, or pre-split the giant "
                "intervals."
            )
        huge = iv_all.filter(span >= F.lit(huge_span))
        legs.append(points.join(F.broadcast(huge), residual))
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def _span_fine(start: str, end: str, bucket_width: int):
    """Interval span measured in FINE grid cells (selector used by all
    three interval_join tiers — must be identical across them so every
    interval lands in exactly one leg)."""
    first_b = F.floor(F.col(start) / F.lit(bucket_width)).cast("long")
    last_b = F.floor((F.col(end) - 1) / F.lit(bucket_width)).cast("long")
    return last_b - first_b


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
