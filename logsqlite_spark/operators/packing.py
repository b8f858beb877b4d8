"""Sequence packing — batch documents into token-budgeted training
examples.

The last step before an LLM tokenizer sees the corpus: concatenate
documents into fixed-budget "packs" so each training sequence wastes
as little context as possible. True greedy packing (close a pack when
the next document would overflow) is inherently sequential, so it
cannot be a window function; the distributed shape is:

1. **Bucket** the corpus by portable hash (same primitive as
   sampling.py) — packs never span buckets, so buckets pack
   independently and in parallel. Bucket count scales with the
   cluster; each bucket's work is O(docs-in-bucket).
2. **applyInPandas per bucket**: sort by doc_id (deterministic), run
   the greedy fill in vectorized pandas. State is one running counter
   per bucket — nothing accumulates.

Output is (doc_id → pack_id, offset) so the actual concatenation can
stay lazy / zero-copy downstream. Deterministic: same corpus, same
budget, same packs, on any partitioning — pinned by pytest. Driver
check is rows-only (greedy reset logic is not expressible in ANSI SQL
without recursion).

Oversized documents (token_count > budget) get a pack of their own
and ``truncated = true`` — the caller decides whether to split or
drop; silently dropping them would bias the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_PACK_BUCKETS = 64
PACK_SALT = "pack-v1"

_PACKED_SCHEMA = (
    "doc_id long, bucket int, pack_id long, offset int, "
    "token_count int, truncated boolean"
)


def pack_sequences(docs: DataFrame, budget: int = 2048,
                   id_col: str = "doc_id", text_col: str = "text",
                   n_buckets: int = N_PACK_BUCKETS) -> DataFrame:
    """Assign each document to a token-budgeted pack.

    Token counts are whitespace tokens (swap in a real tokenizer's
    counts by passing a pre-computed column — see ``token_counts`` in
    textstats.py). ``pack_id`` is globally unique:
    ``bucket * 2^40 + local pack index``.
    """
    import pandas as pd

    bucket = F.expr(
        "cast(conv(substr(md5(concat('{salt}:', cast({id} as string))), "
        "1, 15), 16, 10) as bigint) % {n}".format(
            salt=PACK_SALT, id=id_col, n=n_buckets)
    ).cast("int")
    toks = F.expr(
        f"size(filter(split({text_col}, ' '), t -> t != ''))").cast("int")
    prepped = docs.select(
        F.col(id_col).alias("doc_id"),
        bucket.alias("bucket"),
        toks.alias("token_count"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        b = int(pdf["bucket"].iloc[0])
        pack_ids, offsets, truncs = [], [], []
        cur_pack, cur_fill = 0, 0
        for tc in pdf["token_count"]:
            tc = int(tc)
            if tc > budget:
                # oversized: own pack, flagged
                if cur_fill > 0:
                    cur_pack += 1
                pack_ids.append(cur_pack)
                offsets.append(0)
                truncs.append(True)
                cur_pack += 1
                cur_fill = 0
                continue
            if cur_fill + tc > budget:
                cur_pack += 1
                cur_fill = 0
            pack_ids.append(cur_pack)
            offsets.append(cur_fill)
            truncs.append(False)
            cur_fill += tc
        pdf["pack_id"] = [(b << 40) | p for p in pack_ids]
        pdf["offset"] = offsets
        pdf["truncated"] = truncs
        return pdf[["doc_id", "bucket", "pack_id", "offset",
                    "token_count", "truncated"]]

    return prepped.groupBy("bucket").applyInPandas(pack, _PACKED_SCHEMA)


def pack_stats(packed: DataFrame, budget: int = 2048) -> DataFrame:
    """Packing efficiency report: fill rate per bucket — the number a
    pipeline owner watches to size the budget."""
    per_pack = (
        packed.groupBy("bucket", "pack_id")
        .agg(F.sum("token_count").alias("fill"))
    )
    return (
        per_pack.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_packs"),
            F.sum("fill").cast("long").alias("sum_tokens"),
            F.round(F.avg(F.col("fill").cast("double") / budget), 6)
            .alias("avg_fill_rate"),
        )
    )

# ---------------------------------------------------------------------------
# registry wiring (rows-only: greedy reset logic isn't ANSI-SQL
# expressible; invariants + determinism are pytest-pinned instead)

def _q_pack(spark, sf_dir: str) -> DataFrame:
    from logsqlite_spark.tables import table

    return pack_sequences(table(spark, sf_dir, "documents"), budget=256)

def _q_pack_stats(spark, sf_dir: str) -> DataFrame:
    from logsqlite_spark.tables import table

    return pack_stats(
        pack_sequences(table(spark, sf_dir, "documents"), budget=256),
        budget=256)

QUERIES = {
    "pack_sequences": _q_pack,   # rows-only (sequential greedy state)
    "pack_stats": _q_pack_stats,  # rows-only (derived from packing)
}

ORACLES: dict[str, str] = {}
