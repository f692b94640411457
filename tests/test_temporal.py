"""As-of join: brute-force oracle equality, inclusive-tie semantics,
null for no-prior-match, single-shuffle plan shape."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from osmptparser_spark.operators.temporal import asof_join


@pytest.fixture(scope="module")
def sides(spark):
    rng = np.random.default_rng(11)
    left = [
        (int(i), int(rng.integers(0, 20)), int(rng.integers(0, 1000)))
        for i in range(300)
    ]
    right = [
        (int(1000 + i), int(rng.integers(0, 20)), int(rng.integers(0, 1000)), float(i))
        for i in range(200)
    ]
    ldf = spark.createDataFrame(left, "id BIGINT, key BIGINT, t BIGINT")
    rdf = spark.createDataFrame(right, "rid BIGINT, key BIGINT, t BIGINT, score DOUBLE")
    return left, right, ldf, rdf


class TestAsofJoin:
    def test_matches_brute_force(self, sides):
        left, right, ldf, rdf = sides
        out = asof_join(ldf, rdf, on="t", by="key", right_cols=["score"])
        got = {r.id: r.t_asof for r in out.collect()}
        assert len(got) == len(left)
        for lid, lkey, lt in left:
            prior = [rt for _, rkey, rt, _ in right if rkey == lkey and rt <= lt]
            want = max(prior) if prior else None
            assert got[lid] == want, (lid, lkey, lt)

    def test_inclusive_at_equal_instant(self, spark):
        ldf = spark.createDataFrame([(1, 5, 100)], "id BIGINT, key BIGINT, t BIGINT")
        rdf = spark.createDataFrame(
            [(9, 5, 100, 7.0)], "rid BIGINT, key BIGINT, t BIGINT, score DOUBLE"
        )
        row = asof_join(ldf, rdf, on="t", by="key", right_cols=["score"]).collect()[0]
        assert row.t_asof == 100 and row.score_asof == 7.0

    def test_no_prior_is_null(self, spark):
        ldf = spark.createDataFrame([(1, 5, 100)], "id BIGINT, key BIGINT, t BIGINT")
        rdf = spark.createDataFrame(
            [(9, 5, 200, 7.0)], "rid BIGINT, key BIGINT, t BIGINT, score DOUBLE"
        )
        row = asof_join(ldf, rdf, on="t", by="key", right_cols=["score"]).collect()[0]
        assert row.t_asof is None and row.score_asof is None

    def test_single_exchange_plan(self, spark, sides):
        # the scale contract: one hash exchange on the key (plus AQE
        # bookkeeping) — no joins, no BroadcastNestedLoopJoin at all
        _, _, ldf, rdf = sides
        out = asof_join(ldf, rdf, on="t", by="key", right_cols=["score"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
        assert plan.count("Exchange") <= 2  # union -> one hashpartitioning


class TestIntervalJoin:
    def test_matches_brute_force_and_plan(self, spark):
        from osmptparser_spark.operators.temporal import interval_join

        rng = np.random.default_rng(12)
        pts = [(int(i), int(rng.integers(0, 5000))) for i in range(400)]
        ivs = []
        for i in range(150):
            s = int(rng.integers(0, 5000))
            ivs.append((int(2000 + i), s, s + int(rng.integers(1, 300))))
        pdf = spark.createDataFrame(pts, "pid BIGINT, t BIGINT")
        idf = spark.createDataFrame(ivs, "iid BIGINT, t_start BIGINT, t_end BIGINT")
        out = interval_join(pdf, idf, on="t", start="t_start", end="t_end")
        got = {(r.pid, r.iid) for r in out.select("pid", "iid").collect()}
        want = {
            (p, i)
            for p, t in pts
            for i, s, e in ivs
            if s <= t < e
        }
        assert got == want and len(want) > 100
        # the mass path is a bucket EQUI-join; the only BNLJ allowed is
        # the bounded broadcast residual for >max_explode_buckets
        # outliers (empty here, but planned)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastNestedLoopJoin") <= 1
        assert any(
            j in plan
            for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
        )

    def test_outlier_interval_bounded_explode(self, spark):
        from osmptparser_spark.operators.temporal import interval_join

        # a year-long interval among second-scale ones: at width 1 the
        # explode path would need ~3.2e7 bucket rows (F.sequence errors
        # past 1e6 elements) — the outlier split must route it to the
        # broadcast theta path instead and still return exact results
        pts = [(1, 5), (2, 1_000_000), (3, 20_000_000), (4, 40_000_000)]
        ivs = [(7, 0, 10), (8, 3, 8), (9, 1, 31_536_000)]
        pdf = spark.createDataFrame(pts, "pid BIGINT, t BIGINT")
        idf = spark.createDataFrame(ivs, "iid BIGINT, t_start BIGINT, t_end BIGINT")
        out = interval_join(pdf, idf, bucket_width=1)
        got = {(r.pid, r.iid) for r in out.select("pid", "iid").collect()}
        want = {(p, i) for p, t in pts for i, s, e in ivs if s <= t < e}
        assert got == want == {(1, 7), (1, 8), (1, 9), (2, 9), (3, 9)}

    def test_reversed_interval_is_noop(self, spark):
        from osmptparser_spark.operators.temporal import interval_join

        # end < start once exploded into a DESCENDING F.sequence (auto
        # step -1): millions of spurious bucket rows. Now dropped up
        # front — reversed/empty intervals can never match.
        pdf = spark.createDataFrame([(1, 50)], "pid BIGINT, t BIGINT")
        idf = spark.createDataFrame(
            [(7, 5_000_000, 0), (8, 40, 60), (9, 10, 10)],
            "iid BIGINT, t_start BIGINT, t_end BIGINT",
        )
        got = {
            (r.pid, r.iid)
            for r in interval_join(pdf, idf, bucket_width=10)
            .select("pid", "iid")
            .collect()
        }
        assert got == {(1, 8)}

    def test_sampled_bucket_width(self, spark):
        from osmptparser_spark.operators.temporal import interval_join

        pdf = spark.createDataFrame([(1, 50), (2, 500)], "pid BIGINT, t BIGINT")
        idf = spark.createDataFrame(
            [(7, 0, 100), (8, 400, 410)], "iid BIGINT, t_start BIGINT, t_end BIGINT"
        )
        got = {
            (r.pid, r.iid)
            for r in interval_join(pdf, idf).select("pid", "iid").collect()
        }
        assert got == {(1, 7)}

    def test_negative_times_and_empty_intervals(self, spark):
        from osmptparser_spark.operators.temporal import interval_join

        # negative t: floor-division bucketing must stay consistent
        pdf = spark.createDataFrame(
            [(1, -150), (2, -50), (3, 10)], "pid BIGINT, t BIGINT"
        )
        idf = spark.createDataFrame(
            [(7, -200, -100), (8, -60, 20)], "iid BIGINT, t_start BIGINT, t_end BIGINT"
        )
        got = {
            (r.pid, r.iid)
            for r in interval_join(pdf, idf, bucket_width=100)
            .select("pid", "iid")
            .collect()
        }
        assert got == {(1, 7), (2, 8), (3, 8)}
        # empty interval side -> empty result, no crash in width sampling
        empty = spark.createDataFrame([], "iid BIGINT, t_start BIGINT, t_end BIGINT")
        assert interval_join(pdf, empty).count() == 0
