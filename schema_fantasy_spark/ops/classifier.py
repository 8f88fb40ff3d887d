"""Supervised token classifier — the model-based corpus filter of modern
LLM data pipelines (fastText-style classifiers gate training corpora in
the DCLM / FineWeb-Edu / LLaMA recipes): train a linear classifier over
word tokens on a labeled slice, score every document, filter on the
score. The op is label-agnostic (quality, language, domain, toxicity —
whatever the labeled slice encodes).

Exactness discipline (the ops/lm.py rules applied to a two-class
model): NO logs — IEEE ``ln`` is not guaranteed correctly rounded
across engines, integer division is. Per-token weights are quantized
likelihood DIFFERENCES in millionths,

    w(t) = ((cnt_pos(t)+1) * 10^6) div (tot_pos + V)
         - ((cnt_neg(t)+1) * 10^6) div (tot_neg + V)

(add-one smoothing; V = |vocab| + 1 for the UNK bucket), the document
score is ``prior + sum_t w(t)`` over its tokens — an order-independent
BIGINT sum the DuckDB oracle replays bit-for-bit, training included.
This is Naive Bayes' decision structure with the log-likelihood ratio
replaced by a quantized likelihood difference: same sign behavior for
the filter threshold, exactly reproducible everywhere.

Tokenization is deliberately engine-neutral: ``[A-Za-z]+`` runs,
lowercased AFTER extraction (ASCII lower is identical everywhere;
full-Unicode lowercasing is not guaranteed to agree between JVM and
non-JVM engines — the op documents that scope rather than silently
diverging on ``İ``).

Scale shape: training aggregates the labeled slice (the deterministic
``id % sample_mod == 0`` dial, like IVF's k-means sample), collapses to
a <= (max_vocab+2)-row driver model (bounded collect), and scoring is a
shuffle-free whole-scan fold against a literal map — document text
never moves. Vocabulary cap: top-``max_vocab`` tokens by (count desc,
token asc — a total order); every other token trains into and scores
through the single UNK weight.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

from pyspark.sql import Column, DataFrame, functions as F

SCALE = 1_000_000


def tokens_of(text: Column) -> Column:
    """ASCII word tokens: [A-Za-z]+ runs, lowercased, empties dropped."""
    return F.filter(
        F.transform(F.split(text, "[^A-Za-z]+", -1), F.lower),
        lambda t: t != "",
    )


@dataclass(frozen=True)
class TokenModel:
    weights: Dict[str, int]  # vocab token -> integer weight (millionths)
    w_unk: int               # weight for any token outside the vocab
    prior: int               # class-prior term added to every score


def train_token_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_mod: int = 3,
    max_vocab: int = 64,
) -> TokenModel:
    """Train on the deterministic slice ``id % sample_mod == 0`` with a
    boolean ``label_col``; see the module docstring for the exact
    integer recurrence. Three bounded driver reads: the capped vocab
    (<= max_vocab rows), the token totals (1 row), the doc totals
    (1 row)."""
    tr = df.filter(
        F.col(text_col).isNotNull()
        & (F.pmod(F.col(id_col), F.lit(sample_mod)) == 0)
    ).select(F.col(label_col).cast("boolean").alias("pos"), F.col(text_col))
    tok = tr.select("pos", F.explode(tokens_of(F.col(text_col))).alias("tok"))
    pos1 = F.when(F.col("pos"), F.lit(1)).otherwise(F.lit(0))
    neg1 = F.when(F.col("pos"), F.lit(0)).otherwise(F.lit(1))
    counts = tok.groupBy("tok").agg(
        F.sum(pos1).alias("cp"), F.sum(neg1).alias("cn")
    )
    vocab_rows = (
        counts.orderBy(
            (F.col("cp") + F.col("cn")).desc(), F.col("tok").asc()
        )
        .limit(max_vocab)
        .collect()
    )
    totals = tok.agg(
        F.coalesce(F.sum(pos1), F.lit(0)).alias("tp"),
        F.coalesce(F.sum(neg1), F.lit(0)).alias("tn"),
    ).collect()[0]
    dtot = tr.agg(
        F.coalesce(F.sum(pos1), F.lit(0)).alias("np"),
        F.count(F.lit(1)).alias("nd"),
    ).collect()[0]
    tp, tn = int(totals["tp"]), int(totals["tn"])
    n_pos, n_docs = int(dtot["np"]), int(dtot["nd"])
    v = len(vocab_rows) + 1  # + the UNK bucket
    den_p, den_n = tp + v, tn + v

    def w(cp: int, cn: int) -> int:
        return ((cp + 1) * SCALE) // den_p - ((cn + 1) * SCALE) // den_n

    weights = {r["tok"]: w(int(r["cp"]), int(r["cn"])) for r in vocab_rows}
    cut_p = tp - sum(int(r["cp"]) for r in vocab_rows)
    cut_n = tn - sum(int(r["cn"]) for r in vocab_rows)
    prior = ((n_pos + 1) * SCALE) // (n_docs + 2) - (
        (n_docs - n_pos + 1) * SCALE
    ) // (n_docs + 2)
    return TokenModel(weights=weights, w_unk=w(cut_p, cut_n), prior=prior)


def score_col(model: TokenModel, text: Column) -> Column:
    """Integer score of a document under the model: shuffle-free fold,
    OOV tokens hit the UNK weight via the try_element_at miss (ANSI:
    element_at would throw)."""
    if model.weights:
        wmap = F.create_map(
            *[F.lit(x) for kv in model.weights.items() for x in kv]
        )
        term = lambda t: F.coalesce(  # noqa: E731
            F.try_element_at(wmap, t), F.lit(model.w_unk)
        ).cast("long")
    else:
        term = lambda t: F.lit(model.w_unk).cast("long")  # noqa: E731
    return F.aggregate(
        tokens_of(text),
        F.lit(model.prior).cast("long"),
        lambda acc, t: acc + term(t),
    )


def with_classifier_score(
    df: DataFrame,
    model: TokenModel,
    text_col: str = "text",
    out_col: str = "quality_score",
) -> DataFrame:
    """Append the integer score (NULL text -> NULL score, never a
    fabricated prior-only verdict)."""
    return df.withColumn(
        out_col,
        F.when(
            F.col(text_col).isNotNull(), score_col(model, F.col(text_col))
        ),
    )
