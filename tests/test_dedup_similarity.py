"""Dedup / similarity / text-stats operators on the documents +
embeddings testdata, with numpy/python oracles computed in-test."""

import numpy as np
import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


class TestDedup:
    def test_exact_dedup_oracle(self, spark, docs):
        from osmptparser_spark.operators.dedup import dedup_exact

        rows = docs.select("doc_id", "text").collect()
        byt = {}
        for r in rows:
            byt.setdefault(r.text, []).append(r.doc_id)
        got = {r.text_hash: (r.keep_id, r.n_copies) for r in dedup_exact(docs).collect()}
        assert sum(n for _, n in got.values()) == len(rows)
        want_groups = sorted((min(v), len(v)) for v in byt.values())
        assert sorted(got.values()) == want_groups

    def test_minhash_lsh_finds_planted_near_dups(self, spark, docs):
        from osmptparser_spark.operators.dedup import minhash_lsh_pairs

        # plant near-duplicates: copy 5 docs with a tiny suffix edit
        base = docs.limit(5).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat("text", F.lit(" xyzzy")).alias("text"),
        )
        d = docs.select("doc_id", "text").unionByName(base)
        pairs = minhash_lsh_pairs(d, threshold=0.6).collect()
        found = {(p.id_a, p.id_b) for p in pairs}
        for r in docs.limit(5).collect():
            assert (r.doc_id, r.doc_id + 1_000_000) in found
        for p in pairs:
            assert p.jaccard >= 0.6

    def test_minhash_jaccard_is_exact_shingle_jaccard(self, spark, docs):
        from osmptparser_spark.operators.dedup import _shingle_hashes, minhash_lsh_pairs

        base = docs.limit(3).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat("text", F.lit(" x")).alias("text"),
        )
        d = docs.limit(3).select("doc_id", "text").unionByName(base)
        texts = {r.doc_id: r.text for r in d.collect()}
        for p in minhash_lsh_pairs(d, threshold=0.2).collect():
            sa = set(_shingle_hashes(texts[p.id_a], 9).tolist())
            sb = set(_shingle_hashes(texts[p.id_b], 9).tolist())
            want = len(sa & sb) / len(sa | sb)
            assert abs(p.jaccard - want) < 1e-9

    def test_simhash_near_dups(self, spark, docs):
        from osmptparser_spark.operators.dedup import simhash_near_dup_pairs

        # exact copies (hamming 0) MUST all be found (pigeonhole banding
        # guarantee); a one-token edit is found only if it moves <= 3 bits
        copies = docs.limit(5).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
        edited = docs.limit(5).select(
            (F.col("doc_id") + 2_000_000).alias("doc_id"),
            F.concat("text", F.lit(" q")).alias("text"),
        )
        d = docs.select("doc_id", "text").unionByName(copies).unionByName(edited)
        pairs = simhash_near_dup_pairs(d, max_hamming=3).collect()
        found = {(p.id_a, p.id_b) for p in pairs}
        for r in docs.limit(5).collect():
            assert (r.doc_id, r.doc_id + 1_000_000) in found
        assert all(p.hamming <= 3 for p in pairs)
        # verify reported hamming against a python oracle
        from osmptparser_spark.operators.dedup import simhash_df

        hashes = {r.doc_id: r.simhash for r in simhash_df(d).collect()}
        for p in pairs:
            assert p.hamming == bin(
                (hashes[p.id_a] ^ hashes[p.id_b]) & ((1 << 64) - 1)
            ).count("1")

    def test_ngram_jaccard_pairs_exact(self, spark, docs):
        from osmptparser_spark.operators.dedup import ngram_jaccard_pairs

        d = docs.limit(40).select("doc_id", "text")
        got = {
            (p.id_a, p.id_b): p.jaccard
            for p in ngram_jaccard_pairs(d, n=3, threshold=0.05).collect()
        }
        rows = {r.doc_id: r.text for r in d.collect()}

        def grams(t):
            w = t.split(" ")
            return {" ".join(w[i : i + 3]) for i in range(max(len(w) - 3 + 1, 1))}

        ids = sorted(rows)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                ga, gb = grams(rows[a]), grams(rows[b])
                j = len(ga & gb) / len(ga | gb)
                if j >= 0.05:
                    assert (a, b) in got and abs(got[(a, b)] - j) < 1e-9
                else:
                    assert (a, b) not in got


class TestSimilarity:
    def test_lsh_recall_vs_bruteforce(self, spark, embs):
        from osmptparser_spark.operators.similarity import (
            ann_lsh_topk,
            cosine_topk_bruteforce,
        )

        q = embs.filter(F.col("vec_id") < 30)
        # testdata embeddings are unstructured (top-5 cosine ~0.32), so
        # recall needs few planes / many tables; real clustered
        # embeddings would use more planes for smaller buckets
        brute = cosine_topk_bruteforce(q, embs, k=5)
        approx = ann_lsh_topk(q, embs, k=5, planes=4, tables=16)
        b = {(r.qid, r.cid) for r in brute.collect()}
        a = {(r.qid, r.cid) for r in approx.collect()}
        recall = len(a & b) / len(b)
        assert recall > 0.7, f"LSH recall {recall}"

    def test_bruteforce_matches_numpy(self, spark, embs):
        from osmptparser_spark.operators.similarity import cosine_topk_bruteforce

        rows = embs.collect()
        ids = np.array([r.vec_id for r in rows])
        M = np.stack([np.array(r.embedding, dtype=np.float64) for r in rows])
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        sims = Mn @ Mn.T
        got = {}
        for r in cosine_topk_bruteforce(
            embs.filter(F.col("vec_id") < 10), embs, k=3
        ).collect():
            got.setdefault(r.qid, []).append((r.rank, r.cid))
        for qid, lst in got.items():
            qi = np.where(ids == qid)[0][0]
            s = sims[qi].copy()
            s[qi] = -np.inf
            order = np.lexsort((ids, -s))
            want = [int(ids[j]) for j in order[:3]]
            assert [c for _, c in sorted(lst)] == want

    def test_embedding_near_dup_planted(self, spark, embs):
        from osmptparser_spark.operators.similarity import embedding_near_dup_pairs

        # plant near-dup vectors: tiny perturbation of 5 vectors
        rows = embs.limit(5).collect()
        planted = [
            (
                r.vec_id + 1_000_000,
                [float(x) + 0.001 for x in r.embedding],
                r.label,
            )
            for r in rows
        ]
        d = embs.unionByName(
            spark.createDataFrame(
                planted, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
            )
        )
        pairs = embedding_near_dup_pairs(d, threshold=0.999)
        found = {(p.id_a, p.id_b) for p in pairs.collect()}
        for r in rows:
            assert (r.vec_id, r.vec_id + 1_000_000) in found


class TestTextStats:
    def test_stats_and_oracle(self, spark, docs):
        from osmptparser_spark.functions.text import with_text_stats

        df = with_text_stats(docs.limit(50))
        for r in df.collect():
            toks = r.text.split()
            assert r.n_tokens_ws == len(toks)
            assert r.n_chars_calc == len(r.text)
            assert 0.0 <= r.quality <= 1.0
            assert r.lang_guess in ("en", "es", "und")

    def test_fingerprints_detect_overlap(self, spark, docs):
        from osmptparser_spark.functions.text import fingerprint_df

        d = docs.limit(10).select("doc_id", "text")
        fps = {r.doc_id: set(r.fingerprints) for r in fingerprint_df(d).collect()}
        # identical docs share all fingerprints; distinct docs share few
        for did, f in fps.items():
            assert len(f) > 0
