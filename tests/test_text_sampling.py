"""repetition_stats / vocab_topk / sampling vs pure-python references."""

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from osmptparser_spark.functions.text import repetition_stats, vocab_topk
from osmptparser_spark.operators.sampling import (
    cap_per_group,
    corpus_sample,
    hash_sample,
)


def _df(spark, rows, ddl):
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), ddl)


def _rep_reference(text):
    toks = text.split(" ")  # literal single-space split, like the impl
    n, d = len(toks), len(set(toks))
    dup = (n - d) * 10000 // n
    if n >= 2:
        bgs = Counter(zip(toks, toks[1:]))
        top = max(bgs.values()) * 10000 // (n - 1)
    else:
        top = 0
    return n, d, dup, top


def test_repetition_stats_matches_reference(spark):
    rng = random.Random(5)
    vocab = ["a", "b", "cc", "dd", "e"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 30))))
        for i in range(80)
    ]
    rows += [(100, "x"), (101, ""), (102, "w w w w"), (103, "u v u v u v")]
    out = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_distinct"],
            r["dup_token_frac_x1e4"],
            r["top_bigram_frac_x1e4"],
        )
        for r in repetition_stats(_df(spark, rows, "doc_id BIGINT, text STRING")).collect()
    }
    for i, t in rows:
        assert out[i] == _rep_reference(t), (i, t)
    # sanity: pure repetition maxes out, alternation has a 50%-ish bigram mode
    assert out[102][2] == 7500 and out[102][3] == 10000
    assert out[103][3] == 6000  # 'u v' appears 3x among 5 bigrams


def test_vocab_topk_counts_and_ties(spark):
    rows = [(1, "b a a"), (2, "c b a"), (3, "c b")]
    out = vocab_topk(_df(spark, rows, "doc_id BIGINT, text STRING"), k=2).collect()
    assert [(r["token"], r["n"]) for r in out] == [("a", 3), ("b", 3)]


def test_hash_sample_deterministic_and_partition_independent(spark):
    rows = [(i,) for i in range(2000)]
    a = {r["doc_id"] for r in hash_sample(_df(spark, rows, "doc_id BIGINT"), 0.3).collect()}
    b = {
        r["doc_id"]
        for r in hash_sample(
            _df(spark, rows, "doc_id BIGINT").repartition(13), 0.3
        ).collect()
    }
    assert a == b
    assert abs(len(a) / 2000 - 0.3) < 0.05  # scrambled, near-nominal rate
    # keep mask matches the documented arithmetic
    assert a == {
        i
        for i in range(2000)
        if (i % 1000003) * 2654435761 % 2147483647 % 10000 < 3000
    }


def test_hash_sample_bounds(spark):
    df = _df(spark, [(1,)], "doc_id BIGINT")
    assert hash_sample(df, 0.0).count() == 0
    assert hash_sample(df, 1.0).count() == 1
    with pytest.raises(ValueError):
        hash_sample(df, 1.5)


def test_cap_per_group(spark):
    rows = [(i, f"s{i % 3}") for i in range(30)]
    out = cap_per_group(
        _df(spark, rows, "doc_id BIGINT, source STRING"), "source", "doc_id", 4
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append((r["rank_in_group"], r["doc_id"]))
    for src, members in by_src.items():
        assert len(members) == 4
        # rank follows ascending doc_id and keeps the 4 smallest
        ids = [d for _, d in sorted(members)]
        assert ids == sorted(d for d, s in rows if s == src)[:4]
    with pytest.raises(ValueError):
        cap_per_group(_df(spark, rows, "doc_id BIGINT, source STRING"), "source", "doc_id", 0)


def test_corpus_sample_composition(spark):
    rows = [(i, f"s{i % 2}", "word " * (i % 5)) for i in range(40)]
    df = _df(spark, rows, "doc_id BIGINT, source STRING, text STRING")
    out = corpus_sample(df, source_cap=3, fraction=1.0, min_chars=10).collect()
    kept = {r["doc_id"]: (r["source"], r["rank_in_group"]) for r in out}
    # floor: texts with < 10 chars are "word " * 0 or * 1 ("word " -> 5)
    survivors = [(i, s) for i, s, t in rows if len(t) >= 10]
    expect = {}
    per_src = {}
    for i, s in sorted(survivors):
        per_src.setdefault(s, 0)
        if per_src[s] < 3:
            per_src[s] += 1
            expect[i] = (s, per_src[s])
    assert kept == expect


def test_redact_pii(spark):
    from osmptparser_spark.functions.text import redact_pii

    cases = {
        1: ("contact john.doe+x@mail.example.org now", "contact <EMAIL> now"),
        2: ("call 555-123-4567 or 555.987.6543", "call <PHONE> or <PHONE>"),
        3: ("host 192.168.0.1 port 80", "host <IP> port 80"),
        # email domain must NOT leak into the IP rule; dotted phone is
        # not octets
        4: ("a@b.co 1.2.3.4 111.222.3333", "<EMAIL> <IP> <PHONE>"),
        5: ("no pii here at all", "no pii here at all"),
    }
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(k, orig) for k, (orig, _) in cases.items()], 2
        ),
        "doc_id BIGINT, text STRING",
    ).select("doc_id", redact_pii(F.col("text")).alias("red"))
    got = {r["doc_id"]: r["red"] for r in df.collect()}
    assert got == {k: v[1] for k, v in cases.items()}
