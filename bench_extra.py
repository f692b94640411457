#!/usr/bin/env python
"""Round-6 optimization harness (bench.py is FROZEN for measurement).

Per-leg isolation per the optimization guide §1: times every declared
bench query with the same count-agg methodology bench.py uses, captures
``explain("formatted")`` into plans/r06/<name>_<tag>.txt, and times the
geo-pipeline sub-stages separately. Results go to stdout as JSON and to
bench_extra_out.json.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
      [--tag before] [--legs emb_cosine_topk,minhash_full] [--reps 3] \
      [--geo] [--plans-only]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
N_ROUTES = int(os.environ.get("SPARK_GRAFT_ROUTES", max(200, int(40_000 * SF))))
PAGES_CACHE = f"/tmp/osmptparser_bench_pages_{N_ROUTES}"
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")


def _plan(df, name: str, tag: str) -> None:
    os.makedirs(PLANS_DIR, exist_ok=True)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
        f.write(buf.getvalue())


def _time_runs(fn, reps: int):
    walls = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        walls.append(round(time.time() - t0, 3))
    return walls


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--legs", default="")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--geo", action="store_true")
    ap.add_argument("--plans-only", action="store_true")
    args = ap.parse_args()

    from osmptparser_spark.session import get_spark

    spark = get_spark(
        "osmptparser-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(
            os.environ.get(
                "SPARK_GRAFT_SHUFFLE", str(2 * int(CPUS)) if CPUS.isdigit() else "64"
            )
        ),
        confs={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
            "spark.sql.parquet.columnarReaderBatchSize": "1024",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    out: dict = {"sf": SF, "tag": args.tag}
    queries = entry_mod.queries()
    legs = [x for x in args.legs.split(",") if x]
    if not legs and not args.geo:
        legs = [
            "a3_group_agg", "x1_topk_window", "j1_semi_join",
            "j3_order_preserving_regroup", "w5_cell_join", "w7_knn_topk",
            "w6_pip", "dedup_exact", "lang_id", "events_hourly",
            "emb_cosine_topk", "asof_join", "interval_join",
            "dedup_clusters", "seq_packing", "corpus_sample",
            "text_repetition", "pii_redaction", "vocab_topk",
            "minhash_full", "simhash_full",
        ]

    docs = None
    if "minhash_full" in legs or "simhash_full" in legs:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text"
        )

    for name in legs:
        if name == "minhash_full":
            from osmptparser_spark.operators.dedup import minhash_lsh_pairs

            def build(spark=spark):
                return minhash_lsh_pairs(docs, threshold=0.5)
        elif name == "simhash_full":
            from osmptparser_spark.operators.dedup import simhash_near_dup_pairs

            def build(spark=spark):
                return simhash_near_dup_pairs(docs, max_hamming=3)
        else:
            q = queries[name]

            def build(q=q):
                return q(spark, SF_DIR)

        spark.sparkContext.setJobDescription(f"r06:{name}")
        _plan(build(), name, args.tag)
        if args.plans_only:
            continue
        walls = _time_runs(
            lambda: build().agg(F.count(F.lit(1))).collect(), args.reps
        )
        out[name] = {"walls": walls, "min": min(walls)}
        print(json.dumps({name: out[name]}), flush=True)

    if args.geo:
        from osmptparser_spark.engine import get_public_transports
        from osmptparser_spark.functions.tagfilter import PTV2_FILTER, line_prefilter
        from osmptparser_spark.functions.tiling import with_cells
        from osmptparser_spark.operators.spatial import knn_join
        from osmptparser_spark.sources.pages import (
            extract_nodes_sql,
            extract_relations_sql,
            extract_ways_sql,
        )
        from osmptparser_spark.sources.synth import synth_pages_spark

        if not os.path.exists(os.path.join(PAGES_CACHE, "_SUCCESS")):
            synth_pages_spark(spark, n_routes=N_ROUTES).repartition(64).write.mode(
                "overwrite"
            ).parquet(PAGES_CACHE)
        pages = spark.read.parquet(PAGES_CACHE).cache()
        n_pages = pages.count()
        out["geo_pages"] = n_pages

        pre = line_prefilter(PTV2_FILTER)

        def geo_stages():
            stages = {}
            t0 = time.time()
            relations = extract_relations_sql(pages, line_filter=pre).cache()
            relations.count()
            stages["extract_relations"] = round(time.time() - t0, 3)
            ways = extract_ways_sql(pages)
            nodes = extract_nodes_sql(pages).cache()
            t0 = time.time()
            nodes.count()
            stages["extract_nodes"] = round(time.time() - t0, 3)
            t0 = time.time()
            pts = get_public_transports(nodes, ways, relations, 150.0, PTV2_FILTER)
            stitched = pts.select(
                "id", "status_code", F.size(F.flatten("node_seq")).alias("n_pts")
            )
            stitched.agg(F.count("*"), F.sum("n_pts"), F.sum("status_code")).collect()
            stages["stitch"] = round(time.time() - t0, 3)
            t0 = time.time()
            tiled = with_cells(nodes, h3_res=9, s2_level=16)
            tiled.agg(
                F.countDistinct("h3_cell"), F.countDistinct("s2_cell")
            ).collect()
            stages["tiling"] = round(time.time() - t0, 3)
            t0 = time.time()
            sample = nodes.filter(
                (F.col("id") % F.lit(max(1, N_ROUTES * 181 // 10_000))) == 0
            )
            stops = nodes.sample(0.01, seed=1)
            knn = knn_join(sample, stops, k=1, res=8, ring=1, exact_fallback=False)
            knn.agg(F.count("*")).collect()
            stages["knn"] = round(time.time() - t0, 3)
            nodes.unpersist()
            relations.unpersist()
            return stages

        spark.sparkContext.setJobDescription("r06:geo_stages")
        runs = [geo_stages() for _ in range(max(2, args.reps))]
        out["geo_stages"] = runs
        print(json.dumps({"geo_stages": runs}), flush=True)

    with open(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            f"bench_extra_out_{args.tag}.json",
        ),
        "w",
    ) as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
