"""Text-analysis functions for training-data pipelines: language-ID,
quality scoring, token counting, document fingerprinting.

All of these are pure Catalyst column expressions (whole-stage codegen,
no Python) except the winnowing fingerprint, which is vectorized numpy
inside an Arrow batch.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny stopword marker sets for the n-gram-free heuristic; counts of
# bounded markers are cheap length arithmetic, no regex in the hot path
_EN_MARKERS = ("the", "and", "of", "is", "to")
_ES_MARKERS = ("de", "la", "el", "que", "los")


def _marker_count(text: Column, word: str) -> Column:
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    token = f" {word} "
    return (
        (F.length(padded) - F.length(F.regexp_replace(padded, F.lit(token), F.lit(""))))
        / len(token)
    ).cast("long")


def lang_score(text: Column, markers) -> Column:
    s = F.lit(0).cast("long")
    for w in markers:
        s = s + _marker_count(text, w)
    return s


def lang_id(text: Column) -> Column:
    """'en' / 'es' / 'und' by stopword-marker voting."""
    en = lang_score(text, _EN_MARKERS)
    es = lang_score(text, _ES_MARKERS)
    return (
        F.when(en > es, F.lit("en")).when(es > en, F.lit("es")).otherwise(F.lit("und"))
    )


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish proxy: word pieces + digits + punctuation as separate
    tokens (regex splits on transitions)."""
    return F.size(
        F.filter(
            F.split(text, r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
            lambda x: (F.length(F.trim(x)) > 0),
        )
    ).cast("long")


def punct_ratio(text: Column) -> Column:
    punct = F.length(text) - F.length(F.regexp_replace(text, r"[\.,;:!\?]", ""))
    return punct / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column) -> Column:
    stops = lang_score(text, _EN_MARKERS + _ES_MARKERS)
    return stops / F.greatest(token_count_ws(text), F.lit(1))


def mean_word_len(text: Column) -> Column:
    t = F.trim(text)
    return F.length(F.regexp_replace(t, r"\s+", "")) / F.greatest(
        token_count_ws(t), F.lit(1)
    )


def quality_score(text: Column) -> Column:
    """[0,1] quality heuristic: length band + stopword presence + sane
    mean word length + punctuation sanity. Deterministic, expression-only."""
    n = F.length(text)
    len_ok = F.when((n >= 50) & (n <= 100_000), 1.0).otherwise(0.0)
    stop_ok = F.when(stopword_ratio(text) >= 0.01, 1.0).otherwise(0.0)
    mwl = mean_word_len(text)
    word_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text) <= 0.2, 1.0).otherwise(0.0)
    return (len_ok + stop_ok + word_ok + punct_ok) / 4.0


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return (
        df.withColumn("n_chars_calc", F.length(t).cast("long"))
        .withColumn("n_tokens_ws", token_count_ws(t))
        .withColumn("n_tokens_bpe", token_count_bpe_ish(t))
        .withColumn("punct_ratio", punct_ratio(t))
        .withColumn("stopword_ratio", stopword_ratio(t))
        .withColumn("lang_guess", lang_id(t))
        .withColumn("quality", quality_score(t))
    )


def fingerprint_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 16,
    k: int = 8,
) -> DataFrame:
    """Winnowing document fingerprint: rolling polynomial hash over
    byte k-shingles (the same sliding-window uint64 hash + splitmix64
    finalizer the dedup family uses — fully vectorized, no per-position
    Python loop; round-2 used crc32 in a Python comprehension), then
    per-window minima (robust local sketch). Output: id -> sorted
    distinct fingerprint array (int64, sign-folded from uint64).

    The hash is DuckDB-recomputable (HUGEINT mulmod machinery shared
    with the simhash oracle), so the ``text_fingerprint`` driver query
    verifies these exact values against independent SQL."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..operators.dedup import _positional_shingle_hashes

        for pdf in batches:
            fps = []
            for t in pdf[text_col]:
                hs = _positional_shingle_hashes(t, k).astype(np.int64)
                if len(hs) <= window:
                    fps.append([int(hs.min())])
                    continue
                sw = np.lib.stride_tricks.sliding_window_view(hs, window)
                fps.append(sorted(set(int(x) for x in sw.min(axis=1))))
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"), "fingerprints": fps})

    return df.mapInPandas(gen, "doc_id BIGINT, fingerprints ARRAY<BIGINT>")
