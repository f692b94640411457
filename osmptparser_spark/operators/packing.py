"""Sequence packing: greedy token-budget grouping of documents.

The last step of a training-data pipeline turns a cleaned corpus into
fixed-token-budget training sequences: walk the documents in a
deterministic order and start a new pack whenever the next document
would overflow the budget. Greedy next-fit is the industry default
(packing quality within a few percent of bin-packing optima on natural
corpora, and — unlike first-fit-decreasing — it preserves a stable
document order inside each pack).

Scale design: packing is SHARD-LOCAL by construction. A global
sequential scan over 10^12 documents cannot be parallelized (each
pack boundary depends on the running total), and no training pipeline
needs it to be — shards are independent training files. So the
operator takes a shard expression (any deterministic grouping), packs
each shard independently inside ``applyInPandas`` (one shuffle on the
shard key, sequential numpy loop within — the only part of the
semantics that is genuinely order-dependent), and makes pack ids
globally unique as ``shard * 2^32 + local_pack``. Skew is bounded by
the sharding choice, not the operator; a modulo or hash shard keeps
groups uniform.

Greedy rule (exactly mirrored by the driver's DuckDB recursive-CTE
oracle): documents are ordered by ``id_col`` within a shard; a new
pack starts when ``acc + tokens > budget`` and the current pack is
non-empty. Every document costs ``max(1, token_count)`` so empty
documents still occupy a slot and the accumulator is strictly
positive after the first row (which makes the rule total: an
oversized document always sits alone in its own pack rather than
looping or raising).

Reference parity: the reference has no packing operator; this extends
the mandated training-data family (dedup -> clusters -> packing).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


PACK_SCHEMA = (
    "doc_id BIGINT, shard BIGINT, pack_id BIGINT, pack_pos BIGINT, n_tokens BIGINT"
)


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    shard: Column | int = 16,
) -> DataFrame:
    """(doc_id, shard, pack_id, pack_pos, n_tokens) greedy packing.

    ``budget``: max tokens per pack (documents above it pack alone).
    ``tokens_col``: precomputed token counts; defaults to whitespace
    token count of ``text_col`` (the engine's ``token_count_ws``
    semantics), floored at 1 per document.
    ``shard``: either a Column expression or an int N meaning
    ``id %% N``. Packing never crosses a shard boundary. Shard values
    must lie in ``[0, 2^31)``: pack_id composes ``shard * 2^32 +
    local_pack`` in int64, so a wider shard (e.g. a raw xxhash64)
    would wrap and collide — pmod hash-based shards into a bounded
    domain first. Enforced per group (loud ValueError, no extra job).
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if isinstance(shard, int):
        if shard < 1:
            raise ValueError(f"shard count must be >= 1, got {shard}")
        shard = F.pmod(F.col(id_col), F.lit(shard))
    n_tok = (
        F.col(tokens_col)
        if tokens_col
        else F.size(F.split(F.trim(text_col), r"\s+"))
    )
    # empty text: split('') -> [''] -> size 1, which the greatest()
    # would cover anyway; the floor is the documented >= 1 contract.
    base = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        shard.cast("long").alias("shard"),
        F.greatest(F.lit(1), n_tok).cast("long").alias("n_tokens"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        s = int(pdf["shard"].iloc[0])  # one group = one shard value
        if not (0 <= s < 1 << 31):
            raise ValueError(
                f"pack_sequences: shard value {s} outside [0, 2^31) — "
                "pack_id = shard * 2^32 + local_pack would wrap int64 "
                "and collide; pmod the shard expression into a bounded "
                "domain"
            )
        pdf = pdf.sort_values("doc_id", kind="mergesort", ignore_index=True)
        toks = pdf["n_tokens"].to_numpy()
        packs = [0] * len(toks)
        pos = [0] * len(toks)
        pack, acc, p = 0, 0, 0
        for i, t in enumerate(toks):
            if acc > 0 and acc + t > budget:
                pack, acc, p = pack + 1, 0, 0
            acc += t
            packs[i], pos[i] = pack, p
            p += 1
        out = pdf[["doc_id", "shard", "n_tokens"]].copy()
        out["pack_id"] = pdf["shard"].to_numpy() * (1 << 32) + packs
        out["pack_pos"] = pos
        return out[["doc_id", "shard", "pack_id", "pack_pos", "n_tokens"]]

    return base.groupBy("shard").applyInPandas(_pack, PACK_SCHEMA)
