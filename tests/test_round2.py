"""Round-2 verification: face-boundary exactness, PIP skew salting,
hot-bucket caps, vectorized signatures, partitioned way-area stitch,
lineage output validation, PBF compression guard."""

import numpy as np
import pytest

from pyspark.sql import Observation
from pyspark.sql import functions as F

from osmptparser_spark.functions import h3x
from osmptparser_spark.functions.geo import haversine_np


# --- face boundaries --------------------------------------------------------


def _edge_lat(lon: float) -> float:
    """Latitude near ``lon`` where a face Voronoi boundary runs."""
    la = np.linspace(-40.0, 40.0, 4001)
    d = h3x.face_edge_distance_m(la, np.full_like(la, lon))
    return float(la[int(np.argmin(d))])


def test_face_edge_distance_properties():
    lat = np.linspace(-80, 80, 500)
    lon = np.linspace(-170, 170, 500)
    d = h3x.face_edge_distance_m(lat, lon)
    assert (d >= 0).all() and np.isfinite(d).all()
    # near-edge points report small distances
    el = _edge_lat(18.0)
    assert h3x.face_edge_distance_m([el], [18.0])[0] < 5_000


def test_multiface_covers_cross_face_neighbors():
    el = _edge_lat(18.0)
    # a point just on one side of the edge must ALSO encode onto the
    # face across it when the pad spans the boundary
    idx, cells = h3x.latlng_to_cells_multiface([el + 0.01], [18.0], 7, 5000.0)
    bases = set((np.asarray(cells, dtype=np.int64) >> 45) & 0x3FF)
    faces = {int(b) // 49 for b in bases}
    assert len(faces) >= 2, f"expected multi-face encodes, got faces {faces}"
    # far from any edge: exactly one encode
    idx1, cells1 = h3x.latlng_to_cells_multiface([10.0], [5.0], 7, 5000.0)
    assert len(cells1) == 1


class TestCrossFaceJoins:
    @pytest.fixture(scope="class")
    def straddle(self, spark):
        """Queries and candidates straddling a face boundary."""
        el = _edge_lat(18.0)
        rng = np.random.default_rng(7)
        q_lat = el + rng.uniform(-0.05, 0.05, 40)
        q_lon = 18.0 + rng.uniform(-0.05, 0.05, 40)
        c_lat = el + rng.uniform(-0.08, 0.08, 200)
        c_lon = 18.0 + rng.uniform(-0.08, 0.08, 200)
        q = spark.createDataFrame(
            [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(q_lat, q_lon))],
            "id BIGINT, lat DOUBLE, lon DOUBLE",
        )
        c = spark.createDataFrame(
            [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(c_lat, c_lon))],
            "id BIGINT, lat DOUBLE, lon DOUBLE",
        )
        return (q_lat, q_lon, c_lat, c_lon, q, c)

    def test_knn_exact_across_face_edge(self, spark, straddle):
        from osmptparser_spark.operators.spatial import knn_join

        q_lat, q_lon, c_lat, c_lon, q, c = straddle
        got = {}
        for r in knn_join(q, c, k=3, res=8, ring=1).collect():
            got.setdefault(r.query_id, []).append((r.rank, r.cand_id))
        D = haversine_np(
            q_lat[:, None], q_lon[:, None], c_lat[None, :], c_lon[None, :]
        )
        for qi in range(len(q_lat)):
            order = np.lexsort((np.arange(len(c_lat)), D[qi]))
            want = [int(j) for j in order[:3]]
            have = [cid for _, cid in sorted(got[qi])]
            assert have == want, f"query {qi}: {have} != {want}"

    def test_within_distance_exact_across_face_edge(self, spark, straddle):
        from osmptparser_spark.operators.spatial import within_distance_join

        q_lat, q_lon, c_lat, c_lon, q, c = straddle
        radius = 3000.0
        got = {
            (r.point_id, r.stop_id)
            for r in within_distance_join(q, c, radius_m=radius, res=8).collect()
        }
        D = haversine_np(
            q_lat[:, None], q_lon[:, None], c_lat[None, :], c_lon[None, :]
        )
        want = {(int(i), int(j)) for i, j in zip(*np.nonzero(D <= radius))}
        assert got == want


# --- PIP salting ------------------------------------------------------------


class TestPipSkew:
    def test_hot_polygon_splits_and_stays_correct(self, spark):
        from osmptparser_spark.operators.spatial import point_in_polygon_join

        n = 20_000
        # half-step offset: no point ever lies exactly on a ring edge
        pts = spark.range(n).select(
            F.col("id"),
            ((F.pmod(F.col("id") * 37, F.lit(1000)) * 2 + 1) / 1000.0 - 1.0).alias("lat"),
            ((F.pmod(F.col("id") * 13, F.lit(1000)) * 2 + 1) / 1000.0 - 1.0).alias("lon"),
        )
        ring = [(-0.75, -0.75), (-0.75, 0.75), (0.75, 0.75), (0.75, -0.75), (-0.75, -0.75)]
        polys = spark.createDataFrame(
            [(1, [{"lon": lo, "lat": la} for la, lo in ring])],
            "poly_id BIGINT, ring ARRAY<STRUCT<lon: DOUBLE, lat: DOUBLE>>",
        )
        out = point_in_polygon_join(pts, polys, salt=8)
        rows = out.collect()
        # oracle: interior of the square
        pdf = pts.toPandas()
        inside = (
            (pdf["lat"] > -0.75) & (pdf["lat"] < 0.75)
            & (pdf["lon"] > -0.75) & (pdf["lon"] < 0.75)
        )
        assert {r.point_id for r in rows} == set(pdf.loc[inside, "id"])
        # the hot polygon's candidates really split into several groups
        n_salts = (
            pts.select(F.pmod(F.xxhash64("id"), F.lit(8)).alias("s"))
            .distinct()
            .count()
        )
        assert n_salts > 1


# --- dedup caps + vectorized signatures --------------------------------------


class TestDedupRound2:
    def test_hot_bucket_cap_bounds_degenerate_corpus(self, spark):
        from osmptparser_spark.operators.dedup import minhash_lsh_pairs

        boiler = [(i, "the same boilerplate page body " * 10) for i in range(300)]
        distinct = [
            (1000 + i, f"unique document {i} " + " ".join(f"w{i}{j}" for j in range(60)))
            for i in range(10)
        ]
        planted = [(2000 + i, t + " tail") for i, (_, t) in enumerate(distinct)]
        df = spark.createDataFrame(
            boiler + distinct + planted, "doc_id BIGINT, text STRING"
        )
        obs = Observation("minhash_cap")
        pairs = minhash_lsh_pairs(
            df, threshold=0.5, max_bucket_size=64, observation=obs
        ).collect()
        found = {(p.id_a, p.id_b) for p in pairs}
        for i in range(10):
            assert (1000 + i, 2000 + i) in found
        # boilerplate flood was capped, visibly (not silently)
        assert obs.get["minhash_rows_dropped"] > 0
        # and no quadratic boilerplate pair survived into the output
        assert not any(a < 300 and b < 300 for a, b in found)

    def test_simhash_vectorized_matches_planted(self, spark):
        from osmptparser_spark.operators.dedup import simhash_df, simhash_near_dup_pairs

        docs = [
            (i, f"alpha beta gamma delta {i} " + " ".join(f"t{j}" for j in range(30)))
            for i in range(20)
        ]
        copies = [(100 + i, t) for i, (_, t) in enumerate(docs[:5])]
        df = spark.createDataFrame(docs + copies, "doc_id BIGINT, text STRING")
        pairs = simhash_near_dup_pairs(df, max_hamming=3).collect()
        found = {(p.id_a, p.id_b) for p in pairs}
        for i in range(5):
            assert (i, 100 + i) in found
        hashes = {r.doc_id: r.simhash for r in simhash_df(df).collect()}
        for p in pairs:
            assert p.hamming == bin(
                (hashes[p.id_a] ^ hashes[p.id_b]) & ((1 << 64) - 1)
            ).count("1")

    def test_ngram_observation_reports_cap(self, spark):
        from osmptparser_spark.operators.dedup import ngram_jaccard_pairs

        # 50 docs sharing hot grams (capped away) + one identical pair of
        # unique docs: the output must stay non-empty, else AQE's
        # empty-relation propagation prunes the observed subtree and the
        # metrics never materialize
        rows = [(i, "x y z common tail " + f"doc{i}") for i in range(50)]
        rows += [(200, "uniq pair alpha beta gamma"), (201, "uniq pair alpha beta gamma")]
        df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
        obs = Observation("ngram_cap")
        pairs = ngram_jaccard_pairs(
            df, n=3, threshold=0.9, max_ngram_freq=10, observation=obs
        ).collect()
        assert {(p.id_a, p.id_b) for p in pairs} == {(200, 201)}
        assert obs.get["ngram_rows_dropped"] > 0


# --- partitioned way-area stitch ---------------------------------------------


def test_single_way_partitioned_stitch_parity(spark):
    from osmptparser_spark.operators.hydrate import (
        hydrate_single_ways,
        single_way_node_rows,
    )
    from osmptparser_spark.operators.stitch import (
        stitch,
        stitch_node_rows_partitioned,
    )

    s = 2e-4
    nodes = [
        (1, 0.0, 0.0), (2, 0.0, s), (3, s, s), (4, s, 0.0),
        (11, 1.0, 0.0), (12, 1.0, s), (13, 1.0 + s, s),
        (21, 2.0, 0.0), (22, 2.0, 0.02),
    ]
    ways = [
        (101, [1, 2, 3, 4, 1]),   # id-closed -> 0
        (102, [11, 12, 13]),      # open, ~30 m -> 102 Joined
        (103, [21, 22]),          # open, ~2.2 km -> 501 Broken
    ]
    nodes_df = spark.createDataFrame(
        [(i, la, lo, {}) for i, la, lo in nodes],
        "id BIGINT, lat DOUBLE, lon DOUBLE, tags MAP<STRING,STRING>",
    )
    ways_df = spark.createDataFrame(
        [(w, {}, {}, refs) for w, refs in ways],
        "id BIGINT, tags MAP<STRING,STRING>, info MAP<STRING,STRING>, refs ARRAY<BIGINT>",
    )
    old = stitch(hydrate_single_ways(ways_df, nodes_df), 150.0, closed=True)
    new = stitch_node_rows_partitioned(
        single_way_node_rows(ways_df, nodes_df), 150.0, closed=True
    )
    o = {r.rel_id: (r.status_code, r.status_detail, r.node_seq) for r in old.collect()}
    n = {r.rel_id: (r.status_code, r.status_detail, r.node_seq) for r in new.collect()}
    assert o == n
    assert n[101][0] == 0 and n[102][0] == 102 and n[103][0] == 501


# --- lineage output validation -------------------------------------------------


def test_lineage_detects_tampered_output(spark, tmp_path):
    import glob
    import os

    from osmptparser_spark.plans.lineage import LineageTracker

    base = str(tmp_path / "pipe")
    lt = LineageTracker(spark, base)
    lt.run_stage("s1", lambda: spark.range(0, 500).withColumn("v", F.col("id") * 3))
    assert lt.is_complete("s1")
    # delete one output part file: manifest still internally consistent,
    # but the stage must now read as incomplete (round-1 tautology bug)
    parts = sorted(glob.glob(f"{base}/s1/part-*.parquet"))
    assert parts
    os.remove(parts[0])
    assert not lt.is_complete("s1")
    # and run_stage recomputes to a complete state again
    out = lt.run_stage("s1", lambda: spark.range(0, 500).withColumn("v", F.col("id") * 3))
    assert out.count() == 500 and lt.is_complete("s1")


def test_lineage_verify_hash_catches_content_drift(spark, tmp_path):
    from osmptparser_spark.plans.lineage import LineageTracker

    base = str(tmp_path / "pipe2")
    lt = LineageTracker(spark, base)
    lt.run_stage("s1", lambda: spark.range(0, 100).withColumn("v", F.col("id")))
    # overwrite output with same row count, different content
    spark.range(0, 100).withColumn("v", F.col("id") + 1).write.mode(
        "overwrite"
    ).parquet(f"{base}/s1")
    assert lt.is_complete("s1")  # count-only check passes
    assert not lt.is_complete("s1", verify_hash=True)


# --- PBF compression guard -----------------------------------------------------


def test_pbf_unsupported_compression_raises(tmp_path):
    from osmptparser_spark.sources.pbf import BlobRef, read_blob

    # Blob message with only lzma_data (field 4, wiretype 2)
    payload = b"\x22\x03abc"
    p = tmp_path / "blob.bin"
    p.write_bytes(payload)
    with pytest.raises(ValueError, match="unsupported Blob compression"):
        read_blob(str(p), BlobRef("OSMData", 0, len(payload)))
    # and an empty blob (no recognized field) also raises
    p2 = tmp_path / "blob2.bin"
    p2.write_bytes(b"")
    with pytest.raises(ValueError, match="no raw/zlib_data"):
        read_blob(str(p2), BlobRef("OSMData", 0, 0))
