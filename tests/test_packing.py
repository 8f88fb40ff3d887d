"""ops/packing.py — per-shard concat-and-chunk sequence packing."""

import pytest
from pyspark.sql import functions as F

from schema_fantasy_spark.ops.packing import pack_sequences


def test_pack_sequences_prefix_sums(spark):
    df = spark.createDataFrame(
        [(i, 3 + (i % 4)) for i in range(40)], "doc_id long, n_tok int"
    )
    out = pack_sequences(df, "n_tok", seq_len=8, shards=4).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) <= set(range(4)) and len(by_shard) > 1
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.doc_id)
        run = 0
        for r in rows:
            # exclusive prefix sum in id order, exact chunk arithmetic
            assert r.stream_offset == run
            assert r.seq_idx == run // 8
            assert r.seq_offset == run % 8
            run += r.n_tok


def test_pack_sequences_deterministic_and_guarded(spark):
    df = spark.createDataFrame(
        [(i, 5) for i in range(10)], "doc_id long, n_tok int"
    )
    a = sorted(map(tuple, pack_sequences(df, "n_tok", 16, shards=8).collect()))
    b = sorted(map(tuple, pack_sequences(df, "n_tok", 16, shards=8).collect()))
    assert a == b
    with pytest.raises(ValueError):
        pack_sequences(df, "n_tok", 16, shards=0)
    # single-Exchange plan, Python-free
    plan = pack_sequences(df, "n_tok", 16, shards=8)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Python" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
