"""Deduplication operators for web-scale text tables.

All candidate generation reduces to equi-joins on deterministic
buckets (band hashes / simhash chunks), the same shuffle-shape as the
spatial cell joins; verification is exact and JVM-side wherever the
expression language allows (array_intersect jaccard), numpy inside
Arrow batches otherwise. Everything is seeded/deterministic.

Round-2 scale fixes (VERDICT items 1/8): signature generation is fully
numpy-vectorized (no per-byte/per-token/per-bit Python loops — a
sliding-window polynomial rolling hash in uint64 wraparound arithmetic
for shingles, an invertible-base prefix hash for token segments, and
np.unpackbits for simhash votes), and both LSH self-joins take a
hot-bucket frequency cap (the `ngram_jaccard_pairs` pattern) so a
degenerate bucket — thousands of boilerplate-identical pages — cannot
go quadratic; capped work is surfaced through an optional
`pyspark.sql.Observation` (no silent truncation, no extra job).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

_MERSENNE = (1 << 61) - 1

# polynomial rolling-hash base: odd (invertible mod 2^64), large
_B = np.uint64(0x100000001B3)  # FNV-1a prime


def _u64_inverse(x: np.uint64) -> np.uint64:
    """Modular inverse of an odd x mod 2^64 (Newton iteration).

    All uint64 arithmetic in this module wraps mod 2^64 BY DESIGN
    (polynomial hashing); np.errstate silences the overflow warnings.
    """
    with np.errstate(over="ignore"):
        x = np.uint64(x)
        inv = x  # correct mod 2^3
        for _ in range(5):
            inv = inv * (np.uint64(2) - x * inv)
        return inv


_B_INV = _u64_inverse(_B)


def _splitmix64(h: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: decorrelates polynomial hashes."""
    with np.errstate(over="ignore"):
        h = h + np.uint64(0x9E3779B97F4A7C15)
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return h ^ (h >> np.uint64(31))


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: hash-groupBy on content; keep the smallest id."""
    return (
        df.groupBy(F.md5(text_col).alias("text_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Deterministic 64-bit hashes of the distinct byte k-shingles of
    ``text``: sliding-window polynomial hash (uint64 wraparound) +
    splitmix64 finalizer. Fully vectorized — no per-byte Python loop.

    Because the finalized hash is effectively injective at corpus scale
    (64-bit, ~1e-13 collision odds for 10^5-shingle unions), jaccard
    over these hash sets equals jaccard over the shingle sets — which
    is what the DuckDB oracle recomputes from substrings.
    """
    return np.unique(_positional_shingle_hashes(text, k))


def _positional_shingle_hashes(text: str, k: int) -> np.ndarray:
    """Like :func:`_shingle_hashes` but positional: hash of the
    k-shingle starting at every byte offset, in order, duplicates
    kept (winnowing needs the positional stream)."""
    data = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
    if len(data) == 0:
        data = np.zeros(1, dtype=np.uint8)
    k = min(k, len(data))
    with np.errstate(over="ignore"):
        win = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
        powers = np.empty(k, dtype=np.uint64)
        powers[-1] = np.uint64(1)
        for j in range(k - 2, -1, -1):
            powers[j] = powers[j + 1] * _B
        h = (win * powers).sum(axis=1, dtype=np.uint64)
        return _splitmix64(h)


def _segment_hashes(buf: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """64-bit polynomial hashes of byte segments [starts[i], ends[i]) of
    ``buf``, vectorized via the invertible-base prefix-hash identity:
    H(l,r) = (S[r] - S[l]) * B^(r-1) with S[j] = sum b[i] * Binv^i."""
    n = len(buf)
    with np.errstate(over="ignore"):
        inv_pow = np.empty(n, dtype=np.uint64)
        b_pow = np.empty(n + 1, dtype=np.uint64)
        inv_pow[0] = np.uint64(1)
        b_pow[0] = np.uint64(1)
        if n > 1:
            np.cumprod(np.full(n - 1, _B_INV, dtype=np.uint64), out=inv_pow[1:])
        np.cumprod(np.full(n, _B, dtype=np.uint64), out=b_pow[1:])
        S = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(buf.astype(np.uint64) * inv_pow, out=S[1:])
        h = (S[ends] - S[starts]) * b_pow[ends - 1]
        return _splitmix64(h)


def _spread(df: DataFrame) -> DataFrame:
    """Repartition up to the session's default parallelism when the
    input arrives in fewer partitions (a small parquet file reads as
    ONE split, which would run every downstream python stage on one
    core). At real scale the input has >= cores splits and this is a
    no-op — no shuffle is added.

    Only call this on scan-rooted inputs: ``.rdd`` under AQE forces
    ``getFinalPhysicalPlan``, which EXECUTES every shuffle stage of a
    composite plan just to read a partition count (callers with joins
    upstream pass ``spread=False`` instead)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def shingle_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 9,
    spread: bool = True,
) -> DataFrame:
    """id -> array of distinct shingle hashes (mapInPandas, Arrow batches).

    ``spread=False`` skips the small-input repartition probe — required
    when ``df`` is not scan-rooted (see ``_spread``: the probe's
    ``.rdd`` would eagerly execute the upstream joins under AQE)."""
    if spread:
        df = _spread(df)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    # numpy int64 views, NOT .tolist(): Arrow consumes
                    # the buffers directly, .tolist() boxes every
                    # shingle into a Python int (measured: the boxing
                    # alone cost seconds per million shingles)
                    "shingles": [
                        _shingle_hashes(t, k).view(np.int64)
                        for t in pdf[text_col]
                    ],
                }
            )

    return df.mapInPandas(gen, "doc_id BIGINT, shingles ARRAY<BIGINT>")


def _minhash_params(num_hashes: int, seed: int):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 31, num_hashes).astype(np.uint64)
    b = rng.integers(0, 1 << 31, num_hashes).astype(np.uint64)
    return a, b


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = 64, seed: int = 42
) -> DataFrame:
    """MinHash signatures over shingle arrays: h_i(x) = (a_i x32 + b_i)
    mod p, pure uint64 numpy (a_i, b_i < 2^31 and x folded to 32 bits,
    so a*x+b < 2^63 never overflows; p = 2^61 - 1)."""
    a, b = _minhash_params(num_hashes, seed)
    p = np.uint64(_MERSENNE)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"doc_id": pdf["doc_id"], "signature": []})
                continue
            arrs = [np.asarray(s, dtype=np.int64) for s in pdf["shingles"]]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "signature": list(_min_sig(arrs, a, b, num_hashes))}
            )

    return shingles.mapInPandas(gen, "doc_id BIGINT, signature ARRAY<BIGINT>")


def _min_sig(arrs, a: np.ndarray, b: np.ndarray, num_hashes: int) -> np.ndarray:
    """(len(arrs), num_hashes) int64 MinHash matrix over shingle-hash
    arrays. Chunked matrices instead of a per-doc loop: concat docs'
    shingles until ~4k rows, hash the (chunk_S, m) lanes in one shot,
    per-doc column minima via minimum.reduceat over doc boundary
    offsets. The chunk bound keeps the work matrix ~2 MB so it lives
    in per-core cache — many executor threads each streaming
    multi-10s-of-MB matrices saturate shared memory bandwidth/LLC on a
    dense host (measured: 30x vCPU-time inflation at 32-way
    parallelism with 64 MB chunks)."""
    p = np.uint64(_MERSENNE)
    lens = np.fromiter((len(s) for s in arrs), dtype=np.int64, count=len(arrs))
    sig_out = np.empty((len(arrs), num_hashes), dtype=np.int64)
    # Empty shingle sets get the reduction identity (min over nothing =
    # p, the Mersenne modulus: strictly above every real hash value).
    # Without this, a zero-length segment makes minimum.reduceat
    # silently return the NEXT doc's first hash row as this doc's
    # signature (numpy reduceat semantics), or raise at chunk end —
    # unreachable via _shingle_hashes (always >= 1 hash) but
    # minhash_signatures is public API over arbitrary shingle arrays.
    empty = lens == 0
    if empty.any():
        sig_out[empty] = np.int64(_MERSENNE)
        keep = np.flatnonzero(~empty)
        if len(keep) == 0:
            return sig_out
        sub = _min_sig([arrs[i] for i in keep], a, b, num_hashes)
        sig_out[keep] = sub
        return sig_out
    CHUNK_S = 4096
    shift = np.uint64(61)
    lo = 0
    while lo < len(arrs):
        hi, tot = lo, 0
        while hi < len(arrs) and (tot == 0 or tot + lens[hi] <= CHUNK_S):
            tot += lens[hi]
            hi += 1
        x = np.concatenate(arrs[lo:hi]).astype(np.uint64)
        x32 = (x >> np.uint64(32)) ^ (x & np.uint64(0xFFFFFFFF))
        # (chunk_S, m) in uint64: max (2^31)(2^32)+2^31 < 2^63;
        # in-place ops — one live matrix, no temporaries
        y = x32[:, None] * a[None, :]
        y += b[None, :]
        # branchless Mersenne-61 reduction: for y < 2^63,
        # (y & p) + (y >> 61) < p + 4, one conditional subtract
        # finishes — identical to y % p without the hardware
        # division (the measured hot op of this stage)
        hi_bits = y >> shift
        y &= p
        y += hi_bits
        np.subtract(y, p, out=y, where=y >= p)
        starts = np.concatenate([[0], np.cumsum(lens[lo:hi])[:-1]])
        sig_out[lo:hi] = np.minimum.reduceat(y, starts, axis=0)
        lo = hi
    return sig_out


def minhash_signatures_from_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 9,
    num_hashes: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Fused text -> MinHash signature in ONE Arrow pass: shingle
    hashes stay numpy-local inside the worker instead of round-tripping
    a corpus-sized ARRAY<BIGINT> column through the serializer and the
    block cache (the measured dominant cost of the two-stage
    shingle_df -> minhash_signatures path: the shingle column is
    ~8 bytes x corpus characters, 10-30x the signature column)."""
    a, b = _minhash_params(num_hashes, seed)
    df = _spread(df)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"doc_id": pdf[id_col], "signature": []})
                continue
            arrs = [_shingle_hashes(t, k) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "signature": list(_min_sig(arrs, a, b, num_hashes)),
                }
            )

    return df.mapInPandas(gen, "doc_id BIGINT, signature ARRAY<BIGINT>")


def _cap_buckets(
    banded: DataFrame,
    keys: list[str],
    max_bucket_size: int,
    observation: Observation | None,
    metric_prefix: str,
) -> DataFrame:
    """Drop bucket groups larger than ``max_bucket_size`` rows before the
    self-join (a degenerate bucket makes it quadratic). The cap is made
    visible — not silent — through ``observation`` metrics
    (<prefix>_rows_kept / <prefix>_rows_dropped) at zero extra cost.

    Counted with a window over the bucket keys, NOT a broadcast of a
    per-bucket frequency table: bucket cardinality scales with the
    corpus (docs x bands), so broadcasting it would be a driver OOM at
    web scale, while the window's hash partitioning is the same one the
    downstream self-join needs."""
    from pyspark.sql.window import Window

    capped = banded.withColumn(
        "_bucket_n", F.count("*").over(Window.partitionBy(*[F.col(k) for k in keys]))
    ).withColumn("_keep", F.col("_bucket_n") <= max_bucket_size)
    if observation is not None:
        capped = capped.observe(
            observation,
            F.sum(F.when(F.col("_keep"), 1).otherwise(0)).alias(
                f"{metric_prefix}_rows_kept"
            ),
            F.sum(F.when(F.col("_keep"), 0).otherwise(1)).alias(
                f"{metric_prefix}_rows_dropped"
            ),
        )
    return capped.filter(F.col("_keep")).drop("_bucket_n", "_keep")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 9,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
    max_bucket_size: int = 256,
    observation: Observation | None = None,
    materialize: bool = True,
    verify_broadcast_max_docs: int = 1_000_000,
) -> DataFrame:
    """MinHash+LSH near-dup pairs with EXACT jaccard verification.

    shingle -> minhash -> band -> bucket equi-join for candidates, then
    exact jaccard via array_intersect on the shingle arrays (JVM-side).
    Output: (id_a < id_b, n_common, n_union, jaccard >= threshold).

    Buckets larger than ``max_bucket_size`` are dropped before the
    self-join (hot-bucket cap; pass an ``Observation`` to read how many
    rows it removed). Pathological exact-duplicate floods belong to
    ``dedup_exact``, which runs in one shuffle.

    Cost shape (round-4 rework): signatures are computed FUSED from
    text (one Arrow pass, no corpus-wide shingle-array column through
    the serializer or the block cache), and the verify arrays are
    rehydrated ONLY for documents that appear in a candidate pair —
    at web scale the candidate set is orders of magnitude smaller
    than the corpus, so the expensive ARRAY<BIGINT> materialization
    is proportional to candidates, not documents. A document in many
    candidate pairs still shingles once (the rehydrate is keyed by
    distinct doc id and cached).

    ``materialize`` caches + materializes the (id, text) projection,
    which both the signature pass and the verify rehydrate read;
    parallel query stages racing an unmaterialized cache would each
    recompute the upstream plan (measured ~2x end-to-end at sf0.1).
    """
    rows_per_band = num_hashes // bands
    docs = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_mh_text"))
    docs = docs.cache()
    if materialize:
        docs.count()
    sig = minhash_signatures_from_text(
        docs, "_mh_text", "doc_id", k, num_hashes, seed
    )
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
    banded = _cap_buckets(
        banded, ["band", "bucket"], max_bucket_size, observation, "minhash"
    )
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
    # cands feeds BOTH the id-rehydrate semi-join and the final verify
    # join — cache (and materialize) it or the whole signature +
    # banding + self-join pipeline executes twice
    cands = cands.cache()
    if materialize:
        cands.count()
    # rehydrate shingle arrays for candidate docs ONLY (semi-join on
    # the distinct ids in any pair), then verify JVM-side
    cand_ids = (
        cands.select(F.col("id_a").alias("doc_id"))
        .union(cands.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    # spread=False: the input is join-rooted, and the partition-count
    # probe would execute the semi-join once just to read a number
    sh = shingle_df(
        docs.join(cand_ids, "doc_id", "left_semi"), "_mh_text", "doc_id", k,
        spread=False,
    ).cache()
    # Verify-join strategy (round 6, guide §3.1): the candidate set can
    # be orders of magnitude larger than the candidate-DOC set (every
    # near-identical template pair collides in most bands), and the
    # shuffle join ships BOTH shingle arrays per PAIR — measured 3.4 GB
    # of array bytes through two SMJs for 2.1M pairs / 37k docs at
    # sf1.0 (18.6 s, the leg's dominant cost). When the per-doc array
    # table fits comfortably in memory, broadcast it instead: pairs
    # stream map-side through two broadcast hash joins and the arrays
    # cross the cluster once per executor, not once per pair. Memory
    # contract: ~n_cand_docs x avg-shingle-array bytes (~1 KB/doc at
    # web text sizes -> ~1 GB at the 10^6 default, inside the 8 GB
    # broadcast cap); above the threshold the plan falls back to the
    # shuffle join unchanged. The count doubles as the cache
    # materialization the two consumers need anyway.
    a_side = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b_side = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    na_side = sh.select(F.col("doc_id").alias("id_a"), F.size("shingles").alias("_n_a"))
    nb_side = sh.select(F.col("doc_id").alias("id_b"), F.size("shingles").alias("_n_b"))
    if materialize and sh.count() <= verify_broadcast_max_docs:
        a_side, b_side = F.broadcast(a_side), F.broadcast(b_side)
        na_side, nb_side = F.broadcast(na_side), F.broadcast(nb_side)
    # Sound size-ratio prune before the arrays ever attach:
    # jaccard(A,B) = |A∩B|/|A∪B| <= min(|A|,|B|)/max(|A|,|B|), so a
    # pair whose size ratio is already below the threshold provably
    # cannot reach it — dropping such pairs cannot change the output
    # (measured: 30% of candidate pairs pruned on the sf1.0 corpus
    # before the per-pair intersect).
    cands = (
        cands.join(na_side, "id_a")
        .join(nb_side, "id_b")
        .filter(
            F.least("_n_a", "_n_b")
            >= F.lit(float(threshold)) * F.greatest("_n_a", "_n_b")
        )
        .drop("_n_a", "_n_b")
    )
    n_common = F.size(F.array_intersect("sh_a", "sh_b"))
    n_union = F.size("sh_a") + F.size("sh_b") - n_common
    verified = (
        cands.join(a_side, "id_a")
        .join(b_side, "id_b")
        .withColumn("n_common", n_common.cast("long"))
        .withColumn("n_union", n_union.cast("long"))
        .withColumn("jaccard", F.col("n_common") / F.col("n_union"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "n_union", "jaccard")
    )
    return verified


def _simhash_batch(texts) -> np.ndarray:
    """int64 SimHash per text, vectorized across the WHOLE batch: all
    docs' tokens concatenate into one buffer, one ``_segment_hashes``
    call, one unpackbits, per-doc bit votes via ``np.add.reduceat``
    over doc boundaries. Bit-identical to the per-doc formulation (the
    segment prefix-hash depends only on relative offsets) at a fraction
    of the per-doc numpy-dispatch overhead (round-6 rework; the old
    path paid ~20 numpy calls per document)."""
    tok_lists = [t.split() for t in texts]
    n_tokens = np.fromiter(
        (len(tl) for tl in tok_lists), dtype=np.int64, count=len(tok_lists)
    )
    out = np.zeros(len(tok_lists), dtype=np.int64)
    nz = np.flatnonzero(n_tokens > 0)
    if len(nz) == 0:
        return out
    raw = [tok.encode("utf-8") for i in nz for tok in tok_lists[i]]
    lens = np.fromiter((len(r) for r in raw), dtype=np.int64, count=len(raw))
    buf = np.frombuffer(b"".join(raw), dtype=np.uint8)
    ends = np.cumsum(lens)
    starts = ends - lens
    # zero-length tokens cannot occur (str.split drops empties)
    hs = _segment_hashes(buf, starts, ends)
    bits_m = np.unpackbits(
        hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    )  # (total_tokens, 64), bit b of token i at column b
    doc_tok = n_tokens[nz]
    bounds = np.concatenate([[0], np.cumsum(doc_tok)[:-1]])
    # per-bit 1-D reduceat over a contiguous column: measured 7.5x
    # faster than the 2-D axis-0 reduceat (whose strided int64
    # accumulation loop dominated the whole batch)
    bits_t = bits_m.T
    ones = np.empty((len(doc_tok), 64), dtype=np.int64)
    for b in range(64):
        ones[:, b] = np.add.reduceat(
            np.ascontiguousarray(bits_t[b]), bounds, dtype=np.int64
        )
    votes = 2 * ones - doc_tok[:, None]
    weights = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))
    h = ((votes > 0).astype(np.uint64) * weights[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    out[nz] = h.view(np.int64)  # two's-complement reinterpret, as before
    return out


def simhash_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    spread: bool = True,
) -> DataFrame:
    """64-bit SimHash over whitespace tokens. Batch-vectorized: token
    hashes via the segment prefix-hash over one concatenated buffer per
    Arrow batch, bit votes via unpackbits + reduceat — no per-doc,
    per-token, or per-bit Python loops (see ``_simhash_batch``).

    ``spread`` repartitions a small scan-rooted input up to the default
    parallelism (see ``_spread``) — a single-split parquet corpus would
    otherwise run the whole signature pass in ONE python task (measured
    at sf1.0: the full corpus pass was serialized on one core). Pass
    ``spread=False`` for join-rooted inputs."""
    if spread:
        df = _spread(df)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "simhash": _simhash_batch(list(pdf[text_col])),
                }
            )

    return df.mapInPandas(gen, "doc_id BIGINT, simhash BIGINT")


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket_size: int = 256,
    observation: Observation | None = None,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming via 4-chunk
    banding (pigeonhole: <=3 differing bits -> at least one identical
    16-bit chunk) + exact popcount verification (JVM bit ops). Hot
    chunks are capped like minhash buckets (see ``_cap_buckets``)."""
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
    chunks = _cap_buckets(
        chunks, ["chunk_idx", "chunk"], max_bucket_size, observation, "simhash"
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
    observation: Observation | None = None,
) -> DataFrame:
    """Exact word-n-gram jaccard similarity join via inverted index:
    explode distinct n-grams, pair docs sharing one (stop-ngram
    frequency cap bounds the quadratic blowup; pass an ``Observation``
    to read kept/dropped postings), count common, exact jaccard. All
    JVM-side expressions."""
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
    from pyspark.sql.window import Window

    inv = grams.select("doc_id", "n_grams", F.explode("grams").alias("gram"))
    # document frequency via a window over the gram key (same hash
    # partitioning the self-join uses; a broadcast freq table would not
    # survive web-scale gram cardinality)
    inv = inv.withColumn(
        "df_", F.count("*").over(Window.partitionBy("gram"))
    ).withColumn("_keep", F.col("df_") <= max_ngram_freq)
    if observation is not None:
        inv = inv.observe(
            observation,
            F.sum(F.when(F.col("_keep"), 1).otherwise(0)).alias("ngram_rows_kept"),
            F.sum(F.when(F.col("_keep"), 0).otherwise(1)).alias("ngram_rows_dropped"),
        )
    inv = inv.filter(F.col("_keep")).drop("df_", "_keep")
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
        .agg(F.count("*").alias("n_common"))
        .withColumn("n_union", F.col("na") + F.col("nb") - F.col("n_common"))
        .withColumn("jaccard", F.col("n_common") / F.col("n_union"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "n_union", "jaccard")
    )
    return pairs
