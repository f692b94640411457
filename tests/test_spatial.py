"""Spatial operators (W5-W8): kNN vs brute-force golden, within-distance
join vs numpy oracle, salted join equivalence on a skewed fixture,
point-in-polygon vs numpy ray-cast oracle, raster/vector round trip."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from osmptparser_spark.functions.geo import haversine_np
from osmptparser_spark.operators import spatial as sp

RNG = np.random.default_rng(99)
# Ecuador-ish bbox (fixture region, within one icosahedron face)
Q_LAT = RNG.uniform(-2.2, -0.2, 300)
Q_LON = RNG.uniform(-79.9, -78.6, 300)
S_LAT = RNG.uniform(-2.2, -0.2, 200)
S_LON = RNG.uniform(-79.9, -78.6, 200)


@pytest.fixture(scope="module")
def queries_df(spark):
    return spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(Q_LAT, Q_LON))],
        "id BIGINT, lat DOUBLE, lon DOUBLE",
    )


@pytest.fixture(scope="module")
def stops_df(spark):
    return spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(S_LAT, S_LON))],
        "id BIGINT, lat DOUBLE, lon DOUBLE",
    )


def brute_knn(k=3):
    d = haversine_np(Q_LAT[:, None], Q_LON[:, None], S_LAT[None, :], S_LON[None, :])
    golden = {}
    for qi in range(len(Q_LAT)):
        order = np.lexsort((np.arange(len(S_LAT)), d[qi]))
        golden[qi] = [int(s) for s in order[:k]]
    return golden


class TestKnn:
    def test_knn_matches_brute_force(self, queries_df, stops_df):
        golden = brute_knn(3)
        got = {}
        res = sp.knn_join(queries_df, stops_df, k=3, res=8, ring=2).collect()
        for r in res:
            got.setdefault(r.query_id, []).append((r.rank, r.cand_id))
        got = {q: [c for _, c in sorted(v)] for q, v in got.items()}
        assert set(got) == set(golden)
        mismatches = sum(1 for q in golden if got[q] != golden[q])
        # exact thanks to the fallback rescue whenever rings are sparse;
        # ring-2 at res 8 covers ~15km, far beyond typical NN distances here
        assert mismatches == 0, f"{mismatches} queries differ"

    def test_knn_no_fallback_still_mostly_exact(self, queries_df, stops_df):
        golden = brute_knn(3)
        # ring must cover typical 3rd-NN distances (~10 km here):
        # res 5 pitch ~17 km, ring 2 ~34 km
        res = sp.knn_join(
            queries_df, stops_df, k=3, res=5, ring=2, exact_fallback=False
        ).collect()
        got = {}
        for r in res:
            got.setdefault(r.query_id, []).append((r.rank, r.cand_id))
        got = {q: [c for _, c in sorted(v)] for q, v in got.items()}
        ok = sum(1 for q in golden if got.get(q) == golden[q])
        assert ok / len(golden) > 0.9


class TestKnnRescue:
    def test_sparse_candidates_exact_and_no_candidate_broadcast(self, spark):
        # 40 queries scattered over ~2000 km, only 6 candidates: every
        # escalation level (incl. the face-safe covering sweep) runs,
        # most queries hit the brute pass — results must equal numpy
        # brute force, and NO BroadcastExchange may carry the candidate
        # table (the round-2 rescue broadcast all candidates).
        rng = np.random.default_rng(3)
        qlat = rng.uniform(-10, 10, 40)
        qlon = rng.uniform(-70, -50, 40)
        clat = rng.uniform(-10, 10, 6)
        clon = rng.uniform(-70, -50, 6)
        q_df = spark.createDataFrame(
            [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(qlat, qlon))],
            "id BIGINT, lat DOUBLE, lon DOUBLE",
        )
        c_df = spark.createDataFrame(
            [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(clat, clon))],
            "id BIGINT, lat DOUBLE, lon DOUBLE",
        )
        out = sp.knn_join(q_df, c_df, k=3, res=8, ring=2)
        plan = spark._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        import re

        for m in re.finditer(r"\(\d+\) BroadcastExchange\nInput \[\d+\]: (\[[^\]]*\])", plan):
            assert "c_lat" not in m.group(1), m.group(1)
        golden = {}
        d = haversine_np(qlat[:, None], qlon[:, None], clat[None, :], clon[None, :])
        for qi in range(len(qlat)):
            order = np.lexsort((np.arange(len(clat)), d[qi]))
            golden[qi] = [int(s) for s in order[:3]]
        got = {}
        for r in out.collect():
            got.setdefault(r.query_id, []).append((r.rank, r.cand_id))
        got = {q: [c for _, c in sorted(v)] for q, v in got.items()}
        assert got == golden

    def test_rescue_max_queries_guard(self, spark):
        rng = np.random.default_rng(4)
        q_df = spark.createDataFrame(
            [(i, float(a), float(b)) for i, (a, b) in enumerate(
                zip(rng.uniform(-40, 40, 30), rng.uniform(-170, 170, 30)))],
            "id BIGINT, lat DOUBLE, lon DOUBLE",
        )
        c_df = spark.createDataFrame(
            [(0, 0.0, 0.0), (1, 0.1, 0.1)], "id BIGINT, lat DOUBLE, lon DOUBLE"
        )
        with pytest.raises(ValueError, match="rescue_max_queries"):
            sp.knn_join(q_df, c_df, k=2, res=8, ring=1, rescue_max_queries=1)


class TestWithinDistance:
    def test_matches_numpy_oracle(self, queries_df, stops_df):
        radius = 2000.0
        d = haversine_np(
            Q_LAT[:, None], Q_LON[:, None], S_LAT[None, :], S_LON[None, :]
        )
        want = {(int(q), int(s)) for q, s in zip(*np.where(d <= radius))}
        # default ring = guaranteed coverage for the radius
        got8 = {
            (r.point_id, r.stop_id)
            for r in sp.within_distance_join(
                queries_df, stops_df, radius, res=8
            ).collect()
        }
        assert got8 == want
        # deliberately undersized ring: still no false positives
        got_narrow = {
            (r.point_id, r.stop_id)
            for r in sp.within_distance_join(
                queries_df, stops_df, radius, res=9, ring=1
            ).collect()
        }
        assert got_narrow.issubset(want)


class TestSaltedJoin:
    def test_salted_equals_plain_on_skewed_data(self, spark):
        # megacity: one hot location with 100x density
        hot_lat, hot_lon = -2.19, -79.89
        lats = np.concatenate([np.full(2000, hot_lat) + RNG.normal(0, 1e-4, 2000), Q_LAT])
        lons = np.concatenate([np.full(2000, hot_lon) + RNG.normal(0, 1e-4, 2000), Q_LON])
        left = spark.createDataFrame(
            [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(lats, lons))],
            "id BIGINT, lat DOUBLE, lon DOUBLE",
        )
        right = spark.createDataFrame(
            [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(S_LAT, S_LON))]
            + [(10_000, hot_lat, hot_lon)],
            "id BIGINT, lat DOUBLE, lon DOUBLE",
        )
        plain = sp.cell_join(
            left.select("id", "lat", "lon"),
            right.select(F.col("id").alias("rid"), "lat", "lon"),
            res=7,
            broadcast_right=False,
        )
        salted = sp.salted_cell_join(
            left.select("id", "lat", "lon"),
            right.select(F.col("id").alias("rid"), "lat", "lon"),
            res=7,
            salt=8,
        )
        p = {(r.id, r.rid) for r in plain.select("id", "rid").collect()}
        s = {(r.id, r.rid) for r in salted.select("id", "rid").collect()}
        assert p == s and len(p) > 2000  # hot cell pairs present, no dupes/losses


class TestPointInPolygon:
    def test_cells_strategy_no_broadcast_nested_loop(self, spark, queries_df):
        # the scale contract: candidate generation is an equi-join on
        # cell, never a BroadcastNestedLoopJoin over the point table —
        # with a LARGE polygon table the broadcast plan is a
        # scale-killer; the cells plan must not contain one.
        polys = []
        for pid in range(60):
            cx, cy = -79.5 + 0.01 * pid, -1.5 + 0.005 * pid
            ring = [
                {"lon": cx, "lat": cy},
                {"lon": cx + 0.1, "lat": cy},
                {"lon": cx + 0.1, "lat": cy + 0.1},
                {"lon": cx, "lat": cy + 0.1},
                {"lon": cx, "lat": cy},
            ]
            polys.append((pid, ring))
        polys_df = spark.createDataFrame(
            polys, "poly_id BIGINT, ring ARRAY<STRUCT<lon: DOUBLE, lat: DOUBLE>>"
        )
        out = sp.point_in_polygon_join(queries_df, polys_df, strategy="cells")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        # and the broadcast strategy (dim-table optimizer choice) does use one
        out_b = sp.point_in_polygon_join(queries_df, polys_df, strategy="broadcast")
        plan_b = out_b._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan_b

    def test_cells_strategy_covers_face_boundary_polygon(self, spark):
        # polygon straddling an icosahedron face edge ((8.37, -156.79)
        # is ~330 m from a boundary): the cover must include home cells
        # on BOTH faces, so points across the edge still candidate-join
        cx, cy = -156.78861418, 8.36629774
        n = 24
        angles = np.linspace(0, 2 * np.pi, n, endpoint=False)
        ring = [
            {"lon": float(cx + 0.3 * np.cos(a)), "lat": float(cy + 0.3 * np.sin(a))}
            for a in angles
        ]
        ring.append(ring[0])
        polys_df = spark.createDataFrame(
            [(1, ring)], "poly_id BIGINT, ring ARRAY<STRUCT<lon: DOUBLE, lat: DOUBLE>>"
        )
        rng = np.random.default_rng(5)
        plat = rng.uniform(cy - 0.5, cy + 0.5, 400)
        plon = rng.uniform(cx - 0.5, cx + 0.5, 400)
        pts_df = spark.createDataFrame(
            [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(plat, plon))],
            "id BIGINT, lat DOUBLE, lon DOUBLE",
        )
        rx = np.array([p["lon"] for p in ring])
        ry = np.array([p["lat"] for p in ring])
        want = {(int(i), 1) for i in np.where(sp._ray_cast(plon, plat, rx, ry))[0]}
        for strat in ("cells", "broadcast"):
            got = {
                (r.point_id, r.poly_id)
                for r in sp.point_in_polygon_join(
                    pts_df, polys_df, res=7, strategy=strat
                ).collect()
            }
            assert got == want, strat
        assert len(want) > 50

    def test_cover_cells_res_guard(self):
        from osmptparser_spark.functions.tiling import polygon_cover_cells

        # continent-sized bbox at res 9 must refuse, not explode
        with pytest.raises(ValueError, match="coarser res"):
            polygon_cover_cells(
                np.array([0.0, 40.0]), np.array([0.0, 40.0]), 9,
                max_cover_cells=10_000,
            )

    def test_matches_ray_cast_oracle(self, spark, queries_df):
        # seeded polygons over the bbox (convex-ish stars around centers)
        polys = []
        for pid in range(10):
            cx = RNG.uniform(-79.8, -78.7)
            cy = RNG.uniform(-2.1, -0.3)
            n = int(RNG.integers(8, 20))
            angles = np.sort(RNG.uniform(0, 2 * np.pi, n))
            radii = RNG.uniform(0.05, 0.25, n)
            ring = [
                {"lon": float(cx + r * np.cos(a)), "lat": float(cy + r * np.sin(a))}
                for a, r in zip(angles, radii)
            ]
            ring.append(ring[0])
            polys.append((pid, ring))
        polys_df = spark.createDataFrame(
            polys, "poly_id BIGINT, ring ARRAY<STRUCT<lon: DOUBLE, lat: DOUBLE>>"
        )
        want = set()
        for pid, ring in polys:
            rx = np.array([p["lon"] for p in ring])
            ry = np.array([p["lat"] for p in ring])
            inside = sp._ray_cast(Q_LON, Q_LAT, rx, ry)
            want |= {(int(i), pid) for i in np.where(inside)[0]}
        for strat in ("cells", "broadcast"):
            got = {
                (r.point_id, r.poly_id)
                for r in sp.point_in_polygon_join(
                    queries_df, polys_df, strategy=strat
                ).collect()
            }
            assert got == want, strat
        assert len(want) > 0


class TestRasterVector:
    def test_rasterize_counts(self, spark, queries_df):
        grid = sp.rasterize(queries_df, res=7)
        rows = grid.collect()
        assert sum(r.n_points for r in rows) == 300
        assert all(r.n_points > 0 for r in rows)

    def test_vectorize_boundary_contains_centroid(self, spark, queries_df):
        grid = sp.rasterize(queries_df, res=7)
        hexes = sp.vectorize(grid).collect()
        for r in hexes[:20]:
            rx = np.array([p["lon"] for p in r.boundary])
            ry = np.array([p["lat"] for p in r.boundary])
            assert len(r.boundary) == 7
            inside = sp._ray_cast(
                np.array([r.centroid_lon]), np.array([r.centroid_lat]), rx, ry
            )
            assert inside[0]
