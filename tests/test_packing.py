"""pack_sequences vs a pure-python greedy reference."""

import random

import pytest
from pyspark.sql import functions as F

from osmptparser_spark.operators.packing import pack_sequences


def _reference(rows, budget, n_shards):
    """rows: [(doc_id, n_tokens)] -> {doc_id: (shard, pack_id, pack_pos)}."""
    out = {}
    by_shard = {}
    for doc_id, t in rows:
        by_shard.setdefault(doc_id % n_shards, []).append((doc_id, max(1, t)))
    for shard, docs in by_shard.items():
        pack, acc, pos = 0, 0, 0
        for doc_id, t in sorted(docs):
            if acc > 0 and acc + t > budget:
                pack, acc, pos = pack + 1, 0, 0
            acc += t
            out[doc_id] = (shard, shard * (1 << 32) + pack, pos)
            pos += 1
    return out


def _texts_df(spark, rows):
    # doc i gets exactly t whitespace tokens ("w w w ...")
    data = [(i, " ".join(["w"] * t) if t else "") for i, t in rows]
    return spark.createDataFrame(
        spark.sparkContext.parallelize(data, 4), "doc_id BIGINT, text STRING"
    )


def test_matches_reference_random(spark):
    rng = random.Random(11)
    rows = [(i, rng.randrange(0, 40)) for i in range(300)]
    df = _texts_df(spark, rows)
    got = {
        r["doc_id"]: (r["shard"], r["pack_id"], r["pack_pos"])
        for r in pack_sequences(df, budget=64, shard=8).collect()
    }
    assert got == _reference(rows, 64, 8)


def test_oversized_doc_packs_alone(spark):
    # doc 1 has 100 tokens > budget 10: it must sit alone; neighbors
    # must not join it.
    rows = [(0, 4), (1, 100), (2, 4), (3, 4)]
    df = _texts_df(spark, rows)
    got = {
        r["doc_id"]: r["pack_id"]
        for r in pack_sequences(df, budget=10, shard=1).collect()
    }
    assert got[0] != got[1] and got[1] != got[2]
    assert got[2] == got[3]  # 4+4 <= 10 repacks together after the spill


def test_budget_one_all_singletons(spark):
    rows = [(i, 1) for i in range(10)]
    df = _texts_df(spark, rows)
    out = pack_sequences(df, budget=1, shard=1).collect()
    assert len({r["pack_id"] for r in out}) == 10
    assert all(r["pack_pos"] == 0 for r in out)


def test_pack_invariants(spark):
    rng = random.Random(3)
    rows = [(i, rng.randrange(1, 30)) for i in range(200)]
    df = _texts_df(spark, rows)
    out = pack_sequences(df, budget=50, shard=4).collect()
    packs = {}
    for r in out:
        packs.setdefault(r["pack_id"], []).append(r)
    for members in packs.values():
        total = sum(r["n_tokens"] for r in members)
        assert total <= 50 or len(members) == 1
        assert sorted(r["pack_pos"] for r in members) == list(range(len(members)))
        # pack_pos follows doc_id order
        by_pos = sorted(members, key=lambda r: r["pack_pos"])
        assert [r["doc_id"] for r in by_pos] == sorted(r["doc_id"] for r in members)


def test_precomputed_tokens_and_shard_column(spark):
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(1, 5), (2, 5), (3, 5), (12, 5)], 2
        ),
        "doc_id BIGINT, tok BIGINT",
    )
    out = pack_sequences(
        df, budget=10, tokens_col="tok", shard=F.col("doc_id") / F.lit(10)
    ).collect()
    got = {r["doc_id"]: (r["shard"], r["pack_id"]) for r in out}
    assert got[1][0] == 0 and got[12][0] == 1
    assert got[1][1] == got[2][1]  # 5+5 fits budget 10
    assert got[3][1] != got[1][1]


def test_bad_args_raise(spark):
    df = _texts_df(spark, [(1, 1)])
    with pytest.raises(ValueError):
        pack_sequences(df, budget=0)
    with pytest.raises(ValueError):
        pack_sequences(df, budget=10, shard=0)
