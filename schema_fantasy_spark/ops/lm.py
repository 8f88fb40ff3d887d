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
    from schema_fantasy_spark.ops.dedup import _barrier, _ensure_parallelism

    tr = _ensure_parallelism(df.filter(
        F.col(text_col).isNotNull()
        & (F.pmod(F.col(id_col), F.lit(sample_mod)) == 0)
    ).select(text_col))
    chars = tr.select(
        F.explode(F.split(F.col(text_col), "(?!^)(?!$)")).alias("ch")
    ).groupBy("ch").count()
    # fetch max_vocab+1 rows in ONE job: an extra row existing IS the
    # "some character was cut" signal (UNK bucket live), replacing a
    # separate full-scan distinct count
    top = chars.orderBy(F.col("count").desc(), F.col("ch").asc()) \
               .limit(max_vocab + 1).collect()
    cut = len(top) > max_vocab
    top = top[:max_vocab]
    vocab = frozenset(r["ch"] for r in top)
    n_vocab = len(vocab)
    # distinct MAPPED symbols: every vocab char appears in training by
    # construction; UNK exists iff something was cut
    v_smooth = n_vocab + (1 if cut else 0)

    # count bigrams by INDEX CODE (prev_idx * (V+1) + cur_idx): the
    # normalization map is probed once per character to build the index
    # array (materialized behind a Generate barrier so the transform
    # evaluates once), and pair formation is integer arithmetic —
    # string pair keys are rebuilt driver-side from the tiny result
    chars_sorted = sorted(vocab)
    vn = len(chars_sorted)
    sym = [UNK] + chars_sorted
    idxed = _barrier(tr, char_indices_col(F.col(text_col), vocab), "_ix")
    ix = F.col("_ix")
    nlen = F.greatest(F.size(ix) - 1, F.lit(0))
    codes = F.zip_with(
        F.slice(ix, 1, nlen), F.slice(ix, 2, nlen),
        lambda a, b: a * (vn + 1) + b,
    )
    rows = idxed.select(F.explode(codes).alias("code")) \
                .groupBy("code").count().collect()
    pair_counts = {
        sym[r["code"] // (vn + 1)] + sym[r["code"] % (vn + 1)]: int(r["count"])
        for r in rows
    }
    assert len(pair_counts) <= (max_vocab + 1) ** 2, len(pair_counts)
    prev_counts: Dict[str, int] = {}
    for pr, c in pair_counts.items():
        prev_counts[pr[0]] = prev_counts.get(pr[0], 0) + c
    return pair_counts, prev_counts, max(v_smooth, 1), vocab


def char_indices_col(text: Column, vocab) -> Column:
    """``text`` as an array of 1-based vocabulary indices (0 = UNK/out
    of vocabulary) — ONE O(V) map probe per character. Materialize the
    result behind a Generate barrier before scoring: every reference
    to the raw expression re-evaluates the whole normalization pass
    (no CSE in interpreted HOF evaluation, CLAUDE.md traps #1/#9)."""
    chars = sorted(vocab)
    cmap = (
        F.map_from_arrays(
            F.array(*[F.lit(c) for c in chars]),
            F.array(*[F.lit(i + 1) for i in range(len(chars))]),
        )
        if chars else F.expr("map()").cast("map<string,int>")
    )
    return F.transform(
        F.split(text, "(?!^)(?!$)"),
        lambda c: F.coalesce(F.try_element_at(cmap, c), F.lit(0)),
    )


def _term_array(model) -> tuple:
    """(array column of all (V+1)^2 quantized transition terms, V).
    Encoded as ONE string literal split+cast so constant folding
    materializes the array once — a 16k-child CreateArray would not
    fold and a literal-map probe is a linear scan per lookup."""
    pair_counts, prev_counts, v_smooth, vocab = model
    chars = sorted(vocab)
    vn = len(chars)
    sym = [UNK] + chars

    def term_py(ia: int, ib: int) -> int:
        pr = sym[ia] + sym[ib]
        num = (pair_counts.get(pr, 0) + 1) * SCALE
        den = prev_counts.get(sym[ia], 0) + v_smooth
        return num // den

    flat = ",".join(
        str(term_py(ia, ib)) for ia in range(vn + 1) for ib in range(vn + 1)
    )
    return F.split(F.lit(flat), ",").cast("array<long>"), vn


def fluency_from_indices(idxs: Column, text: Column, model,
                         round_to: int = 6) -> Column:
    """Score from a MATERIALIZED index array (see char_indices_col):
    one O(1) ``element_at`` per transition via a single fold — NULL
    for NULL text, 0.0 below 2 chars."""
    tarr, vn = _term_array(model)
    acc0 = F.struct(
        F.lit(0).cast("long").alias("s"), F.lit(-1).alias("p")
    )
    agg = F.aggregate(
        idxs, acc0,
        lambda acc, x: F.struct(
            (acc["s"] + F.when(
                acc["p"] >= 0,
                F.element_at(tarr, acc["p"] * (vn + 1) + x + 1),
            ).otherwise(F.lit(0))).alias("s"),
            x.alias("p"),
        ),
    )
    nt = F.greatest(F.size(idxs) - 1, F.lit(0))
    return (
        F.when(text.isNull(), F.lit(None).cast("double"))
        .when(nt <= 0, F.lit(0.0))
        .otherwise(F.round(agg["s"] / (nt.cast("double") * SCALE), round_to))
    )


def bigram_fluency_col(
    text: Column,
    model: Model,
    round_to: int = 6,
) -> Column:
    """Mean quantized transition likelihood of ``text`` under the
    model: NULL for NULL text, 0.0 for texts shorter than 2 chars.
    Out-of-vocabulary characters score through the UNK bucket.

    Convenience composition (the index array is inlined, not
    materialized) — for hot paths use ``with_bigram_fluency`` or the
    char_indices_col barrier + fluency_from_indices pair."""
    pair_counts, prev_counts, v_smooth, vocab = model
    return fluency_from_indices(
        char_indices_col(text, vocab), text, model, round_to
    )


def with_bigram_fluency(
    df: DataFrame,
    model,
    text_col: str = "text",
    out_col: str = "lm_bigram_score",
) -> DataFrame:
    """Append the fluency score, materializing the normalized index
    array behind a Generate barrier so the O(V)-per-char normalization
    runs exactly once per document."""
    from schema_fantasy_spark.ops.dedup import _barrier

    vocab = model[3]
    b = _barrier(df, char_indices_col(F.col(text_col), vocab), "_lm_ix")
    out = b.withColumn(
        out_col,
        fluency_from_indices(F.col("_lm_ix"), F.col(text_col), model),
    )
    return out.drop("_lm_ix")
