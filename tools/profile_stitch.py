#!/usr/bin/env python
"""Round-6 stitch-stage breakdown at the bench's geo input: times +
CPU-seconds for ways extraction, hydration, python stitch, finalize.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROUTES = int(os.environ.get("SPARK_GRAFT_ROUTES", "40000"))
PAGES_CACHE = f"/tmp/osmptparser_bench_pages_{N_ROUTES}"


def cpu_now():
    tick = os.sysconf("SC_CLK_TCK")
    me = os.getpid()
    procs = {}
    for pid_s in os.listdir("/proc"):
        if not pid_s.isdigit():
            continue
        try:
            with open(f"/proc/{pid_s}/stat") as f:
                st = f.read()
        except OSError:
            continue
        rest = st.rsplit(")", 1)[1].split()
        ppid = int(rest[1])
        cpu = (int(rest[11]) + int(rest[12])) / tick
        cpu += (int(rest[13]) + int(rest[14])) / tick
        procs[int(pid_s)] = (ppid, cpu)
    total, frontier = 0.0, {me}
    while frontier:
        nxt = set()
        for pid, (ppid, cpu) in procs.items():
            if ppid in frontier:
                nxt.add(pid)
        for pid in frontier:
            if pid in procs:
                total += procs[pid][1]
        procs = {p: v for p, v in procs.items() if p not in frontier}
        frontier = nxt
    return total


def main():
    from pyspark.sql import functions as F

    from osmptparser_spark.session import get_spark

    spark = get_spark(
        "stitch-profile",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=64,
        confs={
            "spark.driver.memory": "48g",
            "spark.sql.parquet.columnarReaderBatchSize": "1024",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    from osmptparser_spark.engine import _finalize, filter_relations
    from osmptparser_spark.functions.tagfilter import PTV2_FILTER, line_prefilter
    from osmptparser_spark.operators.hydrate import (
        hydrate_stops,
        hydrated_node_rows,
        semi_join_ways,
    )
    from osmptparser_spark.operators.stitch import stitch_node_rows_partitioned
    from osmptparser_spark.sources.pages import (
        extract_nodes_sql,
        extract_relations_sql,
        extract_ways_sql,
    )

    pages = spark.read.parquet(PAGES_CACHE).cache()
    n_pages = pages.count()
    print(f"pages={n_pages}", flush=True)
    pre = line_prefilter(PTV2_FILTER)

    def leg(name, fn, reps=3):
        for i in range(reps):
            c0, t0 = cpu_now(), time.time()
            fn()
            print(
                f"{name}[{i}]: wall={time.time()-t0:.2f} cpu={cpu_now()-c0:.1f}",
                flush=True,
            )

    relations = extract_relations_sql(pages, line_filter=pre).cache()
    nodes = extract_nodes_sql(pages).cache()
    leg("extract_relations(cache)", lambda: relations.count(), 1)
    leg("extract_nodes(cache)", lambda: nodes.count(), 1)

    noop = lambda df: df.write.format("noop").mode("overwrite").save()  # noqa: E731

    ways = extract_ways_sql(pages)
    leg("extract_ways", lambda: noop(ways))

    rel = filter_relations(relations, PTV2_FILTER).filter(F.size("way_refs") > 0)
    rel_ways = semi_join_ways(ways, rel)
    leg("semi_join_ways", lambda: noop(rel_ways))

    node_rows = hydrated_node_rows(rel, rel_ways, nodes)
    leg("hydrated_node_rows", lambda: noop(node_rows))

    stitched = stitch_node_rows_partitioned(node_rows, 150.0, False)
    leg("stitch_python", lambda: noop(stitched))

    stops = hydrate_stops(rel, nodes)
    leg("hydrate_stops", lambda: noop(stops))

    out = _finalize(rel, stitched, stops)
    agg = out.select(
        "id", "status_code", F.size(F.flatten("node_seq")).alias("n_pts")
    )
    leg(
        "full_stitch_agg",
        lambda: agg.agg(F.count("*"), F.sum("n_pts"), F.sum("status_code")).collect(),
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
