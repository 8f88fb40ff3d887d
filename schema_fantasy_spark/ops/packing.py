"""Sequence packing — mapping a cleaned corpus onto fixed-length
training sequences (the GPT/T5 "concat-and-chunk" convention): documents
concatenate in a deterministic order into a token stream, and the
stream splits at ``seq_len`` boundaries. The planner's job is to tell
every document WHERE it lands — stream offset, first sequence index,
offset within it — so the actual tensor writer is an embarrassingly
parallel pass.

Packing is inherently sequential (each offset depends on every
predecessor), which is why production pipelines pack PER SHARD: the
corpus hashes into ``shards`` independent streams, each packed alone.
That turns the global prefix sum into a shard-partitioned window — one
shuffle, no global sort, no single-partition window (the scale killer a
naive ``Window.orderBy(id)`` with no partitioning would create; this
module refuses to build one).

All integer arithmetic over a supplied token-count column (compose with
``ops.text.token_count`` / ``bpeish_token_count``), so the plan is
exact cross-engine and replayable as ``SUM() OVER (PARTITION BY shard
ORDER BY id ROWS UNBOUNDED PRECEDING)``."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(
    df: DataFrame,
    tokens_col: str,
    seq_len: int,
    shards: int = 256,
    id_col: str = "doc_id",
    shard_col: str | None = None,
) -> DataFrame:
    """Append the packing plan: ``shard`` (``pmod(xxhash64(id),
    shards)``, or the caller's ``shard_col`` when placement must be
    controlled/reproduced externally), ``stream_offset`` (tokens before
    this doc in its shard's stream — an EXCLUSIVE prefix sum over id
    order), ``seq_idx`` (= stream_offset // seq_len, the first training
    sequence this doc touches), ``seq_offset`` (= stream_offset %
    seq_len, where in it the doc starts). Documents may straddle
    sequence boundaries — the concat-and-chunk convention; a doc spans
    ``(stream_offset + tokens - 1) // seq_len - seq_idx + 1``
    sequences. One shard-keyed shuffle."""
    if shards < 1:
        raise ValueError("shards must be >= 1")
    if shard_col is not None:
        out = df.withColumn("shard", F.col(shard_col).cast("int"))
    else:
        out = df.withColumn(
            "shard",
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards)).cast("int"),
        )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    inclusive = F.sum(tokens_col).over(w)
    out = out.withColumn(
        "stream_offset", (inclusive - F.col(tokens_col)).cast("bigint")
    )
    # integer `div`, not float division: double-rounded quotients drift
    # on large stream offsets
    return out.withColumn(
        "seq_idx", F.expr(f"stream_offset div {int(seq_len)}")
    ).withColumn(
        "seq_offset",
        F.pmod(F.col("stream_offset"), F.lit(seq_len)).cast("int"),
    )
