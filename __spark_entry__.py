"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` pair each implemented operator family
from SURVEY.md §2 with a DuckDB-checkable twin over the driver's
testdata tables. Types are chosen for exact cross-engine matching:
integers, strings, and DECIMAL-cast aggregates (double sums are
order-dependent; decimal sums are exact).

Geo operators whose semantics DuckDB cannot express (stitch cascade,
H3/S2 tiling, PBF decode) are covered by pytest goldens in tests/ and
appear here as rows-only entries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: revenue-by-nation with broadcast dims, semi-join
    pruning and a top-k window — the relational core the geo pipeline
    rides on (scan -> filter -> semi/broadcast joins -> agg -> window).
    """
    sf_dir = "/root/testdata/sf0.001"
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    lineitem = _t(spark, sf_dir, "lineitem")

    revenue = (
        lineitem.withColumn(
            "rev",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            ),
        )
        .groupBy("l_orderkey")
        .agg(F.sum("rev").alias("order_rev"))
    )
    df = (
        orders.join(revenue, orders.o_orderkey == revenue.l_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("order_rev").alias("revenue"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("revenue").desc(), F.col("n_name"))
            ).cast("long"),
        )
        .select("rank", "n_name", "n_orders", F.col("revenue").cast("string").alias("revenue"))
    )
    return df


# --------------------------------------------------------------------------
# queries + oracles
# --------------------------------------------------------------------------


def _q_f1_tag_filter(spark, sf_dir):
    # F1/F2 (mod.rs:88-144): tag-bag predicate `k=69,89` over the
    # dynamic JSON props map; missing key rejects the row.
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.filter(k.isNotNull() & k.isin("69", "89")).select(
        "event_id", "event_type", k.alias("k_val")
    )


def _q_f6_point_lookup(spark, sf_dir):
    # F6 (mod.rs:657-661): point lookup by id -> partition/file pruning.
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey").isin(42, 4242, 9999))
        .select("o_orderkey", "o_custkey", "o_orderstatus")
    )


def _q_j1_semi_join(spark, sf_dir):
    # J1 (mod.rs:288-296): left-semi join, ways-in-relation-set analogue.
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def _q_j2_anti_join(spark, sf_dir):
    # complement of J2's probe: rows NOT referenced (engine completeness).
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_nationkey"
    )


def _q_j3_order_preserving_regroup(spark, sf_dir):
    # J3 (mod.rs:664-702): posexplode+join+array_sort hydration pattern —
    # here: per-order part sequence ordered by line number.
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("l_linenumber", "l_partkey"))
                    ),
                    lambda x: x["l_partkey"].cast("string"),
                ),
                ",",
            ).alias("part_seq"),
            F.count("*").alias("n_items"),
        )
        .select("l_orderkey", "part_seq", "n_items")
    )


def _q_a2_distinct_union(spark, sf_dir):
    # A2 (mod.rs:286-297): per-worker partial union + DISTINCT id sets.
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("long").alias("nationkey")
    )
    return c.unionByName(s).distinct()


def _q_a3_group_agg(spark, sf_dir):
    # A3 (mod.rs:745-770): count/sum aggregation (Q1-style); decimal
    # sums for cross-engine exactness.
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("string")
            .alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("string")
            .alias("sum_price"),
        )
        .select("l_returnflag", "l_linestatus", "cnt", "sum_qty", "sum_price")
    )


def _q_x1_topk_window(spark, sf_dir):
    # W7's top-k-per-key pattern on relational data: row_number window.
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 10)
        .select("o_orderpriority", "o_orderkey", "rn")
    )


def _q_w5_cell_join(spark, sf_dir):
    # W5: spatial equi-join reduction — points and hubs bucketed to the
    # same integer cell id, joined on cell, aggregated per cell.
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 997).alias("cell")
    )
    hubs = _t(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") % 997).alias("cell")
    )
    return (
        ev.join(F.broadcast(hubs), "cell")
        .groupBy("cell")
        .agg(F.count("*").alias("n_pairs"))
    )


def _q_w7_knn_topk(spark, sf_dir):
    # W7: kNN top-k per query on a deterministic integer grid
    # (candidate-generation + exact-distance refine + window top-k).
    q = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("qid"),
        ((F.col("n_nationkey") * 37) % 200).cast("long").alias("qx"),
        ((F.col("n_nationkey") * 11) % 200).cast("long").alias("qy"),
    )
    c = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("sid"),
        ((F.col("s_suppkey") * 13) % 200).cast("long").alias("sx"),
        ((F.col("s_suppkey") * 7) % 200).cast("long").alias("sy"),
    )
    d2 = (F.col("qx") - F.col("sx")) ** 2 + (F.col("qy") - F.col("sy")) ** 2
    w = Window.partitionBy("qid").orderBy(F.col("d2"), F.col("sid"))
    return (
        q.crossJoin(F.broadcast(c))
        .withColumn("d2", d2.cast("long"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("qid", "sid", "d2", "rank")
    )


def _q_dedup_exact(spark, sf_dir):
    # Exact dedup: hash-groupBy on content, keep min id (training-data op).
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .select("text_hash", "keep_id", "n_copies")
    )


def _q_text_token_count(spark, sf_dir):
    # Token counting (whitespace tokens) via pure length arithmetic so
    # the SQL twin is exact.
    d = _t(spark, sf_dir, "documents")
    n_chars = F.length("text").cast("long")
    n_tokens = (
        F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    ).cast("long")
    return d.select("doc_id", n_chars.alias("n_chars_calc"), n_tokens.alias("n_tokens"))


def _q_lang_id(spark, sf_dir):
    # Language-ID heuristic: stopword-marker counts ('the' vs 'de'/'la')
    # via replace-length arithmetic; integer div keeps both engines exact.
    d = _t(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    n_the = F.expr(
        "CAST(div(length(concat(' ', text, ' ')) - length(replace(concat(' ', text, ' '), ' the ', '')), 5) AS BIGINT)"
    )
    n_de = F.expr(
        "CAST(div(length(concat(' ', text, ' ')) - length(replace(concat(' ', text, ' '), ' de ', '')), 4) AS BIGINT)"
    )
    return d.select(
        "doc_id",
        n_the.alias("n_the"),
        n_de.alias("n_de"),
        F.when(n_the > n_de, F.lit("en"))
        .when(n_de > n_the, F.lit("es"))
        .otherwise(F.lit("und"))
        .alias("lang_guess"),
    )


def _q_events_hourly(spark, sf_dir):
    # Windowed aggregation over the event-time table (streaming-shaped
    # query run in batch; the streaming module reuses the same logic).
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
        )
        .agg(
            F.count("*").alias("cnt"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select("event_type", "hour", "cnt", "n_users")
    )


def _q_emb_cosine_topk(spark, sf_dir):
    # Similarity search baseline: brute-force cosine top-3 per query
    # vector (query set = vec_id < 25), JVM-side aggregate/zip_with.
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 25).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda col: F.sqrt(
        F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    cos = (dot / (norm(F.col("qv")) * norm(F.col("cv"))))
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid"))
    return (
        q.crossJoin(c)
        .filter(F.col("qid") != F.col("cid"))
        .withColumn("cos_sim", cos)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("qid", "cid", "rank")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "f1_tag_filter": _q_f1_tag_filter,
        "f6_point_lookup": _q_f6_point_lookup,
        "j1_semi_join": _q_j1_semi_join,
        "j2_anti_join": _q_j2_anti_join,
        "j3_order_preserving_regroup": _q_j3_order_preserving_regroup,
        "a2_distinct_union": _q_a2_distinct_union,
        "a3_group_agg": _q_a3_group_agg,
        "x1_topk_window": _q_x1_topk_window,
        "w5_cell_join": _q_w5_cell_join,
        "w7_knn_topk": _q_w7_knn_topk,
        "dedup_exact": _q_dedup_exact,
        "text_token_count": _q_text_token_count,
        "lang_id": _q_lang_id,
        "events_hourly": _q_events_hourly,
        "emb_cosine_topk": _q_emb_cosine_topk,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "f1_tag_filter": """
            SELECT event_id, event_type,
                   json_extract_string(props, '$.k') AS k_val
            FROM events
            WHERE json_extract_string(props, '$.k') IN ('69', '89')
        """,
        "f6_point_lookup": """
            SELECT o_orderkey, o_custkey, o_orderstatus
            FROM orders WHERE o_orderkey IN (42, 4242, 9999)
        """,
        "j1_semi_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "j2_anti_join": """
            SELECT c_custkey, c_nationkey FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "j3_order_preserving_regroup": """
            SELECT l_orderkey,
                   string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_linenumber, l_partkey) AS part_seq,
                   count(*) AS n_items
            FROM lineitem GROUP BY l_orderkey
        """,
        "a2_distinct_union": """
            SELECT DISTINCT nationkey FROM (
                SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
                UNION ALL
                SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
            )
        """,
        "a3_group_agg": """
            SELECT l_returnflag, l_linestatus, count(*) AS cnt,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS sum_price
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "x1_topk_window": """
            SELECT o_orderpriority, o_orderkey, rn FROM (
                SELECT o_orderpriority, o_orderkey,
                       row_number() OVER (PARTITION BY o_orderpriority
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders
            ) WHERE rn <= 10
        """,
        "w5_cell_join": """
            SELECT cell, count(*) AS n_pairs FROM
                (SELECT user_id % 997 AS cell FROM events) p
                JOIN (SELECT s_suppkey % 997 AS cell FROM supplier) h USING (cell)
            GROUP BY cell
        """,
        "w7_knn_topk": """
            SELECT qid, sid, d2, rank FROM (
                SELECT q.qid, c.sid,
                       (q.qx - c.sx) * (q.qx - c.sx) + (q.qy - c.sy) * (q.qy - c.sy) AS d2,
                       row_number() OVER (
                           PARTITION BY q.qid
                           ORDER BY (q.qx - c.sx) * (q.qx - c.sx) + (q.qy - c.sy) * (q.qy - c.sy),
                                    c.sid) AS rank
                FROM (SELECT CAST(n_nationkey AS BIGINT) AS qid,
                             (n_nationkey * 37) % 200 AS qx,
                             (n_nationkey * 11) % 200 AS qy FROM nation) q
                CROSS JOIN (SELECT s_suppkey AS sid,
                             (s_suppkey * 13) % 200 AS sx,
                             (s_suppkey * 7) % 200 AS sy FROM supplier) c
            ) WHERE rank <= 3
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
                   count(*) AS n_copies
            FROM documents GROUP BY md5(text)
        """,
        "text_token_count": """
            SELECT doc_id, length(text) AS n_chars_calc,
                   length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
            FROM documents
        """,
        "lang_id": """
            SELECT doc_id,
                   (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) // 5 AS n_the,
                   (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' de ', ''))) // 4 AS n_de,
                   CASE
                     WHEN (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) // 5
                        > (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' de ', ''))) // 4 THEN 'en'
                     WHEN (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' de ', ''))) // 4
                        > (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) // 5 THEN 'es'
                     ELSE 'und'
                   END AS lang_guess
            FROM documents
        """,
        "events_hourly": """
            SELECT event_type,
                   strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   count(*) AS cnt, count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1, 2
        """,
        "emb_cosine_topk": """
            SELECT qid, cid, rank FROM (
                SELECT q.vec_id AS qid, c.vec_id AS cid,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                                    c.vec_id) AS rank
                FROM embeddings q CROSS JOIN embeddings c
                WHERE q.vec_id < 25 AND q.vec_id != c.vec_id
            ) WHERE rank <= 3
        """,
    }
