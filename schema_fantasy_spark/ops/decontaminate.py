"""Train/test decontamination: flag training documents sharing any
word n-gram with a benchmark/eval set (the standard pre-training
hygiene step — e.g. GPT-3 used 13-gram overlap, Gopher/MassiveText
similar; n=8 default here).

Scale shape: the benchmark side is SMALL (eval suites are thousands of
documents), so its distinct gram-hash set BROADCASTS — the 10^12-row
training side explodes to (doc_id, gram_hash) pairs that hash-join
against the broadcast set with NO shuffle of the corpus, then one
(doc_id) count aggregation of the surviving hits. Grams are hashed
(xxhash64 at scale; md5 for the DuckDB-oracle path) so the exploded
pairs are fixed-width — document text never moves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def ngram_hashes(text: Column, n: int = 8, method: str = "xxhash64") -> Column:
    """DISTINCT hashed word n-grams of a text column (array). Grams are
    space-joined token windows; ``md5`` keeps the oracle replayable,
    ``xxhash64`` is the scale default (8-byte hashes).

    Convenience form — inlines the tokenization. The hot path
    (:func:`contamination_hits`) materializes the token array behind a
    Generate barrier first and calls :func:`ngram_hashes_from_tokens`:
    a captured expression inside a transform lambda re-evaluates PER
    ELEMENT in interpreted HOF execution, making the gram window pass
    O(tokens x grams) per document (CLAUDE.md trap #9)."""
    return ngram_hashes_from_tokens(_tokens(text), n, method)


def ngram_hashes_from_tokens(
    toks: Column, n: int = 8, method: str = "xxhash64"
) -> Column:
    """:func:`ngram_hashes` over an already-materialized token array
    (pass a barriered ATTRIBUTE, not an expression, in hot paths)."""
    # sequence(1, 0) would DESCEND ([1, 0]); short texts get no grams
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.expr("array()").cast("array<int>"))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    hashed = F.transform(
        grams,
        (lambda g: F.md5(g)) if method == "md5" else (lambda g: F.xxhash64(g).cast("string")),
    )
    return F.array_distinct(hashed)


def contamination_hits(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
    method: str = "xxhash64",
) -> DataFrame:
    """(id, contam_hits) for every training doc with at least one
    n-gram shared with the benchmark set: distinct-gram explode ->
    broadcast hash join -> per-doc count. Docs with zero hits are
    absent (left-join + coalesce at the call site if a full flag
    column is wanted)."""
    from schema_fantasy_spark.ops.dedup import _barrier, _ensure_parallelism

    bench_t = _barrier(
        _ensure_parallelism(benchmark.select(bench_text_col)),
        _tokens(F.col(bench_text_col)), "_tk",
    )
    bench = (
        bench_t.select(
            F.explode(ngram_hashes_from_tokens(F.col("_tk"), n, method)).alias("g")
        )
        .distinct()
    )
    docs_t = _barrier(
        _ensure_parallelism(docs.select(id_col, text_col), keys=(id_col,)),
        _tokens(F.col(text_col)), "_tk",
    )
    pairs = docs_t.select(
        F.col(id_col),
        F.explode(ngram_hashes_from_tokens(F.col("_tk"), n, method)).alias("g"),
    )
    return (
        pairs.join(F.broadcast(bench), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("contam_hits"))
    )


def with_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    method: str = "xxhash64",
) -> DataFrame:
    """Append (contam_hits, contaminated) to the corpus — the decision
    column a cleaning funnel filters on.

    The hits side is a full-corpus aggregate, so its size is unbounded
    (a dirty corpus against a large benchmark set can flag billions of
    docs) — unlike the benchmark-gram set it must NOT be force-
    broadcast. Plain left equi join: AQE broadcasts it at runtime only
    when its measured size allows."""
    hits = contamination_hits(
        docs, benchmark, id_col=id_col, text_col=text_col, n=n, method=method
    )
    out = docs.join(hits, id_col, "left")
    return out.withColumn(
        "contam_hits", F.coalesce(F.col("contam_hits"), F.lit(0))
    ).withColumn("contaminated", F.col("contam_hits") > 0)
