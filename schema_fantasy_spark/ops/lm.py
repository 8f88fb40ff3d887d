"""Statistical fluency scoring — the CCNet-style quality signal (CCNet
ranks Common-Crawl documents by language-model perplexity; this is its
cross-engine-exact cousin): a character-bigram transition model trained
on a reference slice, each document scored by its MEAN TRANSITION
LIKELIHOOD under the model. Gibberish, boilerplate and wrong-language
text score low; fluent in-domain text scores high.

Exactness discipline (CLAUDE.md float rules): probabilities are
quantized to integers — term = ((c(pair)+1) * 10^6) div (c(prev)+V),
an add-one-smoothed transition probability in millionths, computed
with exact integer arithmetic on BOTH engines (the div is (a - a mod
b)/b on Spark longs, `//` on DuckDB BIGINTs; all magnitudes stay below
2^53 so the one double division at the end is exact) — so the per-doc
sum is order-independent and the DuckDB oracle replays the score
bit-for-bit. No logs/exponentials: IEEE `ln` is not guaranteed
correctly rounded across engines, division is.

Vocabulary cap (the CCNet convention): the model keeps only the
``max_vocab`` most frequent training characters (count desc, char asc
— a total order, so the cut is deterministic); every other character
maps to a single ``<UNK>`` symbol BEFORE bigram counting and scoring.
Without the cap the distinct-bigram count is unbounded on multilingual
web text (CJK alone is 10^4 distinct chars -> 10^6+ bigrams, a
multi-MB literal expression shipped in every task closure); with it
the model is hard-bounded at (max_vocab+1)^2 entries regardless of
corpus, asserted at train time. The smoothing denominator uses
v_smooth = |vocab| + (1 if any char was cut else 0) — the distinct
count of MAPPED symbols, replayed identically by the oracle.

Scale shape: the model trains on a bounded deterministic slice (like
the IVF training sample), collapses to a capped literal map, and
scoring is a shuffle-free whole-scan fold — no explode, no join,
document text never moves. For vocabularies beyond the literal-map
sweet spot (max_vocab >> 512), score via a broadcast join against a
model DataFrame instead.
"""

from __future__ import annotations

from typing import Dict, FrozenSet, Tuple

from pyspark.sql import Column, DataFrame, functions as F

SCALE = 1_000_000  # probability quantum = 1e-6

#: single-character sentinel for out-of-vocabulary chars. Single-char by
#: design: mapped bigrams stay 2-char strings, so prev = substr(pair,1,1)
#: holds on both engines. (chr(0) is avoided — DuckDB rejects NUL.)
UNK = "\x01"

Model = Tuple[Dict[str, int], Dict[str, int], int, FrozenSet[str]]


def _char_arrays(text: Column):
    chars = F.split(text, "(?!^)(?!$)")
    n = F.size(chars)
    prevs = F.slice(chars, 1, F.greatest(n - 1, F.lit(0)))
    curs = F.slice(chars, 2, F.greatest(n - 1, F.lit(0)))
    return prevs, curs


def train_char_bigram(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_mod: int = 7,
    max_vocab: int = 128,
) -> Model:
    """(pair_counts, prev_counts, v_smooth, vocab) from the
    deterministic training slice ``id % sample_mod == 0`` (bounded at
    scale the same way IVF bounds its k-means sample: the slice is the
    dial). Characters outside the top-``max_vocab`` by count map to
    ``UNK`` before counting — the model size is <= (max_vocab+1)^2
    entries no matter the corpus, asserted below."""
    tr = df.filter(
        F.col(text_col).isNotNull()
        & (F.pmod(F.col(id_col), F.lit(sample_mod)) == 0)
    )
    chars = tr.select(
        F.explode(F.split(F.col(text_col), "(?!^)(?!$)")).alias("ch")
    ).groupBy("ch").count()
    n_distinct = chars.count()
    top = chars.orderBy(F.col("count").desc(), F.col("ch").asc()) \
               .limit(max_vocab).collect()
    vocab = frozenset(r["ch"] for r in top)
    n_vocab = len(vocab)
    assert n_vocab <= max_vocab, (n_vocab, max_vocab)
    # distinct MAPPED symbols: every vocab char appears in training by
    # construction; UNK exists iff something was cut
    v_smooth = n_vocab + (1 if n_distinct > n_vocab else 0)

    vmap = (
        F.map_from_arrays(
            F.array(*[F.lit(c) for c in sorted(vocab)]),
            F.array(*[F.lit(1) for _ in vocab]),
        )
        if vocab else F.expr("map()").cast("map<string,int>")
    )

    def norm(c: Column) -> Column:
        return F.when(
            F.try_element_at(vmap, c).isNotNull(), c
        ).otherwise(F.lit(UNK))

    prevs, curs = _char_arrays(F.col(text_col))
    pairs = F.zip_with(prevs, curs, lambda a, b: F.concat(norm(a), norm(b)))
    rows = tr.select(F.explode(pairs).alias("pr")).groupBy("pr").count().collect()
    pair_counts = {r["pr"]: int(r["count"]) for r in rows}
    assert len(pair_counts) <= (max_vocab + 1) ** 2, len(pair_counts)
    prev_counts: Dict[str, int] = {}
    for pr, c in pair_counts.items():
        prev_counts[pr[0]] = prev_counts.get(pr[0], 0) + c
    return pair_counts, prev_counts, max(v_smooth, 1), vocab


def bigram_fluency_col(
    text: Column,
    model: Model,
    round_to: int = 6,
) -> Column:
    """Mean quantized transition likelihood of ``text`` under the
    model: NULL for NULL text, 0.0 for texts shorter than 2 chars.
    Out-of-vocabulary characters score through the UNK bucket."""
    pair_counts, prev_counts, v_smooth, vocab = model
    m2 = F.map_from_arrays(
        F.array(*[F.lit(k) for k in pair_counts]),
        F.array(*[F.lit(v) for v in pair_counts.values()]),
    ) if pair_counts else F.expr("map()").cast("map<string,int>")
    m1 = F.map_from_arrays(
        F.array(*[F.lit(k) for k in prev_counts]),
        F.array(*[F.lit(v) for v in prev_counts.values()]),
    ) if prev_counts else F.expr("map()").cast("map<string,int>")
    vmap = (
        F.map_from_arrays(
            F.array(*[F.lit(c) for c in sorted(vocab)]),
            F.array(*[F.lit(1) for _ in vocab]),
        )
        if vocab else F.expr("map()").cast("map<string,int>")
    )
    prevs, curs = _char_arrays(text)

    def norm(c: Column) -> Column:
        return F.when(
            F.try_element_at(vmap, c).isNotNull(), c
        ).otherwise(F.lit(UNK))

    def term(a: Column, b: Column) -> Column:
        na = norm(a)
        c2 = F.coalesce(
            F.try_element_at(m2, F.concat(na, norm(b))), F.lit(0)
        ).cast("long")
        c1 = F.coalesce(F.try_element_at(m1, na), F.lit(0)).cast("long")
        num = (c2 + 1) * F.lit(SCALE).cast("long")
        den = c1 + F.lit(v_smooth).cast("long")
        # exact integer floor division: (num - num mod den) is a long
        # well under 2^53, so the double division is exact
        return ((num - F.pmod(num, den)) / den).cast("long")

    terms = F.zip_with(prevs, curs, term)
    total = F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: acc + x)
    n = F.size(terms)
    return (
        F.when(text.isNull(), F.lit(None).cast("double"))
        .when(n <= 0, F.lit(0.0))
        .otherwise(F.round(total / (n.cast("double") * SCALE), round_to))
    )


def with_bigram_fluency(
    df: DataFrame,
    model,
    text_col: str = "text",
    out_col: str = "lm_bigram_score",
) -> DataFrame:
    return df.withColumn(out_col, bigram_fluency_col(F.col(text_col), model))
