"""High-level engine API: the reference's three entry points, Spark-first.

``get_public_transports`` == Parser::get_public_transports (mod.rs:511-527),
``get_areas`` == Parser::get_areas (mod.rs:580-654), over entity
DataFrames from any source (PBF, pages extraction, parquet). Output is
deterministic relative to the reference's thread-nondeterministic
ordering: callers sort explicitly (the reference's own test sorts too,
tests/integration_test.rs:7-8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.tagfilter import compile_tag_filter
from .operators.hydrate import (
    hydrate_single_ways,
    hydrate_stops,
    hydrate_way_nodes,
    hydrated_node_rows,
    semi_join_ways,
    single_way_node_rows,
)
from .operators.stitch import stitch, stitch_node_rows_partitioned as stitch_node_rows

_EMPTY_GEOM = "CAST(array() AS ARRAY<ARRAY<STRUCT<lon: DOUBLE, lat: DOUBLE>>>)"
_EMPTY_SEQ = "CAST(array() AS ARRAY<ARRAY<BIGINT>>)"
_EMPTY_STOPS = (
    "CAST(array() AS ARRAY<STRUCT<id: BIGINT, lat: DOUBLE, lon: DOUBLE, "
    "tags: MAP<STRING,STRING>>>)"
)


def filter_relations(relations: DataFrame, conditions: str) -> DataFrame:
    """F1 + F3: tag-predicate filter plus drop relations with no way
    members (mod.rs:253-257)."""
    return relations.filter(compile_tag_filter(conditions)).filter(
        F.size("way_refs") > 0
    )


def filter_ways(ways: DataFrame, conditions: str) -> DataFrame:
    """F2 + F4: tag-predicate filter plus drop ways with no node refs
    (mod.rs:380-387)."""
    return ways.filter(compile_tag_filter(conditions)).filter(F.size("refs") > 0)


def _finalize(relations: DataFrame, stitched: DataFrame, stops: DataFrame | None):
    """Join stitch results (and stops) back onto relation metadata.

    LEFT joins: a relation whose member ways all dangled produces no
    stitch group; the reference's flatten_ways on an empty list yields
    501 Broken + empty geometry (relation.rs:233-235) — coalesce
    reproduces that.
    """
    out = relations.select("id", "tags", "info").join(
        stitched.withColumnRenamed("rel_id", "id"), "id", "left"
    )
    if stops is not None:
        out = out.join(stops.withColumnRenamed("rel_id", "id"), "id", "left")
        out = out.withColumn("stops", F.coalesce("stops", F.expr(_EMPTY_STOPS)))
    return (
        out.withColumn("geometry", F.coalesce("geometry", F.expr(_EMPTY_GEOM)))
        .withColumn("node_seq", F.coalesce("node_seq", F.expr(_EMPTY_SEQ)))
        .withColumn("status_code", F.coalesce("status_code", F.lit(501)))
        .withColumn("status_detail", F.coalesce("status_detail", F.lit("Broken")))
    )


def _barrier(df: DataFrame, kind: str) -> DataFrame:
    """Materialization barrier for the prefiltered relation table.

    MEMORY CONTRACT: what is materialized is the PREFILTERED relation
    table — O(filter-matched relations), never O(pages) — so the
    executor-memory cost is the filtered dimension table, typically
    10^3-10^6 rows even at web scale (tests assert the measured cache
    size; see test_spark_pipeline.py::test_cache_barrier_contract).

    * ``"cache"`` (default): storage-level MEMORY; fastest, and the
      size is observable via the storage registry.
    * ``"localCheckpoint"``: executor-local checkpoint (memory+disk,
      lineage truncated) — the constrained-memory deploy choice; lazy,
      so plan-building stays side-effect free. INCOMPATIBLE with the
      ``cluster`` profile's ``spark.dynamicAllocation.enabled``: local
      checkpoint blocks live only on the executors that wrote them, so
      a decommissioned executor silently destroys them mid-job (Spark's
      own docs warn against the combination). Under dynamic allocation
      use ``"cache"`` (recomputable lineage survives executor loss) or
      a reliable ``df.checkpoint()`` with a checkpoint dir, or raise
      ``spark.dynamicAllocation.cachedExecutorIdleTimeout`` so holders
      are never reclaimed.
    * ``"none"``: no barrier — ONLY for plans where the caller
      guarantees the exact map filter is cheap, because without the
      barrier Catalyst merges the exact from_json filter into the
      line-scan predicate and evaluates it for EVERY line before the
      cheap string conjuncts can reject it (measured: 240 s -> ~20 s
      on 80k pages at local[16]).
    """
    if kind == "cache":
        return df.cache()
    if kind == "localCheckpoint":
        return df.localCheckpoint(eager=False)
    if kind == "none":
        return df
    raise ValueError(f"unknown barrier {kind!r}")


def routes_from_pages(
    pages: DataFrame,
    gap_m: float = 150.0,
    conditions: str | None = None,
    barrier: str = "cache",
) -> DataFrame:
    """pages -> extract -> filter -> stitch, with the tag filter pushed
    down as a string prefilter on raw relation lines (sound: may only
    over-select; the exact map filter runs after parsing). Avoids the
    from_json-in-predicate storm over every line. ``barrier`` picks the
    materialization barrier for the prefiltered relations (see
    :func:`_barrier` for the memory contract)."""
    from .functions.tagfilter import line_prefilter
    from .sources.pages import (
        extract_nodes_sql,
        extract_relations_sql,
        extract_ways_sql,
    )

    pre = line_prefilter(conditions) if conditions else None
    # barrier = reuse (three consumers) + pushdown barrier (_barrier)
    relations = _barrier(extract_relations_sql(pages, line_filter=pre), barrier)
    ways = extract_ways_sql(pages)
    nodes = extract_nodes_sql(pages)
    return get_public_transports(nodes, ways, relations, gap_m, conditions)


def areas_from_pages(
    pages: DataFrame,
    gap_m: float = 150.0,
    conditions: str | None = None,
    barrier: str = "cache",
) -> DataFrame:
    from .functions.tagfilter import line_prefilter
    from .sources.pages import (
        extract_nodes_sql,
        extract_relations_sql,
        extract_ways_sql,
    )

    pre = line_prefilter(conditions) if conditions else None
    # barrier = reuse + pushdown barrier (see routes_from_pages)
    relations = _barrier(extract_relations_sql(pages, line_filter=pre), barrier)
    # way branch needs the tag filter too -> same prefilter on way lines;
    # the relation-member semi-join re-reads ways unfiltered
    ways_all = extract_ways_sql(pages)
    nodes = extract_nodes_sql(pages)
    rel = filter_relations(relations, conditions) if conditions else relations
    rel = rel.filter(F.size("way_refs") > 0)

    rel_ways = semi_join_ways(ways_all, rel)
    node_rows = hydrated_node_rows(rel, rel_ways, nodes)
    rel_areas = _finalize(rel, stitch_node_rows(node_rows, gap_m, closed=True), None)
    rel_areas = rel_areas.withColumn("id_type", F.lit("r"))
    ways_f = extract_ways_sql(pages, line_filter=pre)
    std_ways = filter_ways(ways_f, conditions) if conditions else ways_f
    std_ways = std_ways.filter(F.size("refs") > 0)
    # same partition-level stitch shape as the route path (a single way
    # is a 1-way group keyed by its own id) — per-group applyInPandas
    # was the measured 250s->15s bottleneck shape
    single = single_way_node_rows(std_ways, nodes)
    way_areas = _finalize(
        std_ways.select("id", "tags", "info"),
        stitch_node_rows(single, gap_m, closed=True),
        None,
    ).withColumn("id_type", F.lit("w"))
    cols = [
        "id", "id_type", "tags", "info", "geometry", "node_seq",
        "status_code", "status_detail",
    ]
    return rel_areas.select(*cols).unionByName(way_areas.select(*cols))


def par_map(df: DataFrame, fn, schema: str) -> DataFrame:
    """Parity convenience for the reference's ``par_map(custom_fn)``
    (mod.rs:532-576: apply an arbitrary user function to every parsed
    entity on a worker pool). Spark-first translation: any DataFrame
    transformation IS the equivalent; this wrapper covers the
    imperative case — a per-row Python function — by running it inside
    ``mapInPandas`` (Arrow batches, executor-parallel, no driver
    collect). ``fn``: dict -> dict; ``schema``: output DDL.

    Prefer built-in column expressions whenever the function is
    expressible — this wrapper is the slow path by design.
    """
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame([fn(row) for row in pdf.to_dict("records")])

    return df.mapInPandas(gen, schema)


def iter_rows(df: DataFrame, order_by: str = "id"):
    """X4 parity (mod.rs:737-742): sequential driver-side iteration,
    deterministic order (the reference's iterator order is insertion
    order; ours is explicit)."""
    return df.orderBy(order_by).toLocalIterator()


def get_public_transports(
    nodes: DataFrame,
    ways: DataFrame,
    relations: DataFrame,
    gap_m: float = 150.0,
    conditions: str | None = None,
) -> DataFrame:
    """Route mode (closed=False): one row per relation with stops,
    multi-linestring geometry (lon,lat), and parse status.

    ``conditions`` optionally applies the F1 tag filter here; pass
    pre-filtered relations otherwise.
    """
    rel = filter_relations(relations, conditions) if conditions else relations
    rel = rel.filter(F.size("way_refs") > 0)
    rel_ways = semi_join_ways(ways, rel)
    node_rows = hydrated_node_rows(rel, rel_ways, nodes)
    stitched = stitch_node_rows(node_rows, gap_m, closed=False)
    stops = hydrate_stops(rel, nodes)
    return _finalize(rel, stitched, stops)


def get_areas(
    nodes: DataFrame,
    ways: DataFrame,
    relations: DataFrame,
    gap_m: float = 150.0,
    conditions: str | None = None,
) -> DataFrame:
    """Area mode: relation areas (id_type 'r') union standalone
    filter-matched way areas (id_type 'w'), rings closed within
    tolerance (mod.rs:580-654)."""
    rel = filter_relations(relations, conditions) if conditions else relations
    rel = rel.filter(F.size("way_refs") > 0)
    rel_ways = semi_join_ways(ways, rel)
    node_rows = hydrated_node_rows(rel, rel_ways, nodes)
    rel_areas = _finalize(rel, stitch_node_rows(node_rows, gap_m, closed=True), None)
    rel_areas = rel_areas.withColumn("id_type", F.lit("r"))

    std_ways = filter_ways(ways, conditions) if conditions else ways
    std_ways = std_ways.filter(F.size("refs") > 0)
    single = single_way_node_rows(std_ways, nodes)
    way_areas = _finalize(
        std_ways.select("id", "tags", "info"),
        stitch_node_rows(single, gap_m, closed=True),
        None,
    ).withColumn("id_type", F.lit("w"))

    cols = ["id", "id_type", "tags", "info", "geometry", "node_seq", "status_code", "status_detail"]
    return rel_areas.select(*cols).unionByName(way_areas.select(*cols))
