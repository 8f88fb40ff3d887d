"""ops/classifier.py — integer-exact supervised token classifier."""

import re

from pyspark.sql import functions as F

from schema_fantasy_spark.ops.classifier import (
    SCALE,
    TokenModel,
    score_col,
    tokens_of,
    train_token_classifier,
    with_classifier_score,
)


def _py_tokens(text):
    return [t.lower() for t in re.split(r"[^A-Za-z]+", text) if t != ""]


def _py_train(rows, sample_mod=3, max_vocab=64):
    """Pure-Python replay of the exact integer training recurrence."""
    tr = [(pos, text) for i, pos, text in rows
          if text is not None and i % sample_mod == 0]
    cp, cn = {}, {}
    for pos, text in tr:
        for t in _py_tokens(text):
            (cp if pos else cn)[t] = (cp if pos else cn).get(t, 0) + 1
    toks = sorted(
        set(cp) | set(cn),
        key=lambda t: (-(cp.get(t, 0) + cn.get(t, 0)), t),
    )[:max_vocab]
    tp, tn = sum(cp.values()), sum(cn.values())
    v = len(toks) + 1
    w = lambda a, b: ((a + 1) * SCALE) // (tp + v) - ((b + 1) * SCALE) // (tn + v)
    weights = {t: w(cp.get(t, 0), cn.get(t, 0)) for t in toks}
    cut_p = tp - sum(cp.get(t, 0) for t in toks)
    cut_n = tn - sum(cn.get(t, 0) for t in toks)
    n_pos = sum(1 for pos, _ in tr if pos)
    n_docs = len(tr)
    prior = ((n_pos + 1) * SCALE) // (n_docs + 2) \
        - ((n_docs - n_pos + 1) * SCALE) // (n_docs + 2)
    return weights, w(cut_p, cut_n), prior


def _py_score(model_w, w_unk, prior, text):
    return prior + sum(model_w.get(t, w_unk) for t in _py_tokens(text))


ROWS = [
    (0, True, "the quick brown fox jumps over the lazy dog"),
    (1, True, "never used, off the training slice"),
    (3, True, "the fox and the dog are friends, quick friends"),
    (6, False, "le renard brun rapide saute par dessus le chien"),
    (9, False, "der schnelle braune fuchs springt. Le chien!"),
    (12, True, "a dog! A DOG? the dog..."),
    (13, False, "also off-slice"),
    (15, False, "el zorro marron rapido salta sobre el perro"),
]


def _spark_df(spark):
    return spark.createDataFrame(
        [(i, pos, t) for i, pos, t in ROWS], "doc_id: long, pos: boolean, text: string"
    )


def test_tokens_of(spark):
    df = spark.createDataFrame([("The Fox, 42 jumps-over É the dog!",)], "t: string")
    got = df.select(tokens_of(F.col("t")).alias("v")).collect()[0]["v"]
    assert got == ["the", "fox", "jumps", "over", "the", "dog"]


def test_train_matches_python_replay(spark):
    model = train_token_classifier(_spark_df(spark), "pos", max_vocab=6)
    weights, w_unk, prior = _py_train(ROWS, max_vocab=6)
    assert model.weights == weights
    assert model.w_unk == w_unk and model.prior == prior
    # a capped vocab really cut something
    assert len(model.weights) == 6


def test_scores_match_and_separate(spark):
    df = _spark_df(spark)
    model = train_token_classifier(df, "pos", max_vocab=64)
    weights, w_unk, prior = _py_train(ROWS, max_vocab=64)
    got = {
        r["doc_id"]: r["quality_score"]
        for r in with_classifier_score(df, model).collect()
    }
    for i, pos, text in ROWS:
        assert got[i] == _py_score(weights, w_unk, prior, text), (i, text)
    # in-slice english scores above in-slice french/spanish/german
    assert min(got[0], got[3], got[12]) > max(got[6], got[9], got[15])


def test_null_text_scores_null_and_empty_model(spark):
    df = spark.createDataFrame([(1, None), (2, "x y")], "doc_id: long, text: string")
    model = TokenModel(weights={}, w_unk=-7, prior=100)
    got = {r["doc_id"]: r["quality_score"]
           for r in with_classifier_score(df, model).collect()}
    assert got[1] is None
    assert got[2] == 100 - 14
