"""Deduplication operators for web-scale text tables.

All candidate generation reduces to equi-joins on deterministic
buckets (band hashes / simhash chunks), the same shuffle-shape as the
spatial cell joins; verification is exact and JVM-side wherever the
expression language allows (array_intersect jaccard), numpy inside
Arrow batches otherwise. Everything is seeded/deterministic.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERSENNE = (1 << 61) - 1


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: hash-groupBy on content; keep the smallest id."""
    return (
        df.groupBy(F.md5(text_col).alias("text_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Deterministic 32-bit hashes of character k-shingles (crc32)."""
    if len(text) < k:
        return np.array([zlib.crc32(text.encode("utf-8"))], dtype=np.uint64)
    data = text.encode("utf-8", "ignore")
    # byte-level shingles: fast and deterministic
    out = np.empty(max(1, len(data) - k + 1), dtype=np.uint64)
    for i in range(len(out)):
        out[i] = zlib.crc32(data[i : i + k])
    return np.unique(out)


def shingle_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 9
) -> DataFrame:
    """id -> array of distinct shingle hashes (mapInPandas, Arrow batches)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "shingles": [
                        _shingle_hashes(t, k).astype("int64").tolist()
                        for t in pdf[text_col]
                    ],
                }
            )

    return df.mapInPandas(gen, "doc_id BIGINT, shingles ARRAY<BIGINT>")


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = 64, seed: int = 42
) -> DataFrame:
    """MinHash signatures over shingle arrays: h_i(x) = (a_i x + b_i)
    mod p, vectorized numpy per Arrow batch."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, num_hashes, dtype=np.int64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = []
            for sh in pdf["shingles"]:
                x = np.asarray(sh, dtype=np.int64)[:, None].astype(object)
                # object dtype avoids overflow: exact (a*x+b) % p
                vals = (x * a.astype(object) + b.astype(object)) % _MERSENNE
                sigs.append(np.min(vals, axis=0).astype(np.int64).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "signature": sigs})

    return shingles.mapInPandas(gen, "doc_id BIGINT, signature ARRAY<BIGINT>")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 9,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """MinHash+LSH near-dup pairs with EXACT jaccard verification.

    shingle -> minhash -> band -> bucket equi-join for candidates, then
    exact jaccard via array_intersect on the shingle arrays (JVM-side).
    Output: (id_a < id_b, jaccard) with jaccard >= threshold.
    """
    rows_per_band = num_hashes // bands
    sh = shingle_df(df, text_col, id_col, k).cache()
    sig = minhash_signatures(sh, num_hashes, seed)
    banded = sig.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.slice(
                    "signature", i * rows_per_band + 1, rows_per_band
                ),
            )
        ).alias("band", "band_sig"),
    ).select("doc_id", "band", F.xxhash64(F.col("band").cast("string"), F.col("band_sig").cast("string")).alias("bucket"))
    cands = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    verified = (
        cands.join(sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a")), "id_a")
        .join(sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b")), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / (
                F.size("sh_a")
                + F.size("sh_b")
                - F.size(F.array_intersect("sh_a", "sh_b"))
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def simhash_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """64-bit SimHash over whitespace tokens (deterministic crc-based
    token hashes, numpy bit-vote accumulation)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for t in pdf[text_col]:
                tokens = t.split()
                if not tokens:
                    out.append(0)
                    continue
                hs = np.array(
                    [
                        zlib.crc32(w.encode("utf-8"))
                        | (zlib.crc32(w[::-1].encode("utf-8")) << 32)
                        for w in tokens
                    ],
                    dtype=np.uint64,
                )
                votes = np.zeros(bits, dtype=np.int64)
                for bit in range(bits):
                    votes[bit] = (2 * ((hs >> np.uint64(bit)) & np.uint64(1)).astype(np.int64) - 1).sum()
                h = 0
                for bit in range(bits):
                    if votes[bit] > 0:
                        h |= 1 << bit
                out.append(h - (1 << 63) if h >= (1 << 63) else h)
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"), "simhash": out})

    return df.mapInPandas(gen, "doc_id BIGINT, simhash BIGINT")


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming via 4-chunk
    banding (pigeonhole: <=3 differing bits -> at least one identical
    16-bit chunk) + exact popcount verification (JVM bit ops)."""
    sh = simhash_df(df, text_col, id_col).cache()
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("simhash", i * 16).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    cands = (
        chunks.alias("a")
        .join(
            chunks.alias("b"),
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.simhash").alias("h_a"),
            F.col("b.simhash").alias("h_b"),
        )
        .distinct()
    )
    return (
        cands.withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.3,
    max_ngram_freq: int = 1000,
) -> DataFrame:
    """Exact word-n-gram jaccard similarity join via inverted index:
    explode distinct n-grams, pair docs sharing one (stop-ngram
    frequency cap bounds the quadratic blowup), count common, exact
    jaccard. All JVM-side expressions."""
    grams = df.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(0), F.greatest(F.size(F.split(text_col, " ")) - n, F.lit(0))
                ),
                lambda i: F.array_join(F.slice(F.split(text_col, " "), i + 1, n), " "),
            )
        ).alias("grams"),
    ).withColumn("n_grams", F.size("grams"))
    inv = grams.select("doc_id", "n_grams", F.explode("grams").alias("gram"))
    freq = inv.groupBy("gram").agg(F.count("*").alias("df_"))
    inv = inv.join(
        F.broadcast(freq.filter(F.col("df_") <= max_ngram_freq).select("gram")),
        "gram",
    )
    pairs = (
        inv.alias("a")
        .join(
            inv.alias("b"),
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.n_grams").alias("na"),
            F.col("b.n_grams").alias("nb"),
        )
        .agg(F.count("*").alias("common"))
        .withColumn(
            "jaccard", F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return pairs
