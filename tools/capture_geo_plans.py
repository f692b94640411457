#!/usr/bin/env python
"""Capture explain("formatted") for the geo-pipeline sub-plans into
plans/r06/geo_<stage>_<tag>.txt (round-6 evidence; run from any
checkout via PYTHONPATH/cwd, writes into --out dir)."""

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.getcwd())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="after")
    ap.add_argument("--out", default="plans/r06")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from osmptparser_spark.engine import get_public_transports
    from osmptparser_spark.functions.tagfilter import PTV2_FILTER, line_prefilter
    from osmptparser_spark.functions.tiling import with_cells
    from osmptparser_spark.operators.spatial import knn_join
    from osmptparser_spark.session import get_spark
    from osmptparser_spark.sources.pages import (
        extract_nodes_sql,
        extract_relations_sql,
        extract_ways_sql,
    )

    spark = get_spark("geo-plans", master="local[4]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet("/tmp/osmptparser_bench_pages_40000")
    pre = line_prefilter(PTV2_FILTER)
    relations = extract_relations_sql(pages, line_filter=pre)
    ways = extract_ways_sql(pages)
    nodes = extract_nodes_sql(pages)
    pts = get_public_transports(nodes, ways, relations, 150.0, PTV2_FILTER)
    stitched = pts.select(
        "id", "status_code", F.size(F.flatten("node_seq")).alias("n_pts")
    )
    tiled = with_cells(nodes, h3_res=9, s2_level=16)
    sample = nodes.filter((F.col("id") % F.lit(724)) == 0)
    stops = nodes.sample(0.01, seed=1)
    knn = knn_join(sample, stops, k=1, res=8, ring=1, exact_fallback=False)

    os.makedirs(args.out, exist_ok=True)
    for name, df in [
        ("geo_extract_nodes", nodes),
        ("geo_stitch", stitched),
        ("geo_tiling", tiled),
        ("geo_knn", knn),
    ]:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(args.out, f"{name}_{args.tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("wrote", name, args.tag)
    return 0


if __name__ == "__main__":
    sys.exit(main())
