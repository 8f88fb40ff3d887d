"""ops/pii.py — staged PII detection + redaction, Luhn checksum."""

import contextlib
import io

from pyspark.sql import functions as F

from schema_fantasy_spark.ops.pii import luhn_valid, pii_scrub, with_pii_scrubbed


def test_pii_scrub_hand_cases(spark):
    cases = [
        ("mail me at bob.smith+x@mail.example.com today",
         "mail me at <EMAIL> today", (1, 0, 0, 0, 0)),
        ("server 192.168.3.77 and 8.8.8.8 up", "server <IP> and <IP> up",
         (0, 2, 0, 0, 0)),
        ("card 4242 4242 4242 4242 on file", "card <CARD> on file",
         (0, 0, 1, 1, 0)),
        ("card 4242424242424241 bad", "card <CARD> bad", (0, 0, 1, 0, 0)),
        ("call +1 (555) 010-1234 now", "call <PHONE> now", (0, 0, 0, 0, 1)),
        ("bare words only", "bare words only", (0, 0, 0, 0, 0)),
        # staged classes: every span is counted once, most-specific wins
        ("a@b.co and 10.0.0.1 and 4111 1111 1111 1111 and +44 20 7946 0958",
         "<EMAIL> and <IP> and <CARD> and <PHONE>", (1, 1, 1, 1, 1)),
        # out-of-range octets are NOT an IP (and dots make it non-phone
        # only when digits exceed the phone span) — stays untouched
        ("v 999.999.999.999 w", "v <PHONE> w", (0, 0, 0, 0, 1)),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(cases)], "i: long, t: string"
    )
    got = {
        r["i"]: r
        for r in df.select("i", pii_scrub(F.col("t")).alias("p"))
        .select("i", "p.*")
        .collect()
    }
    for i, (t, want, counts) in enumerate(cases):
        r = got[i]
        assert r["scrubbed"] == want, (t, r["scrubbed"])
        assert (
            r["n_emails"], r["n_ips"], r["n_cards"], r["n_cards_luhn"],
            r["n_phones"],
        ) == counts, t


def test_luhn_checksum(spark):
    cases = [
        ("4242424242424242", True),   # canonical valid test PAN
        ("4111111111111111", True),
        ("4242424242424241", False),
        ("79927398713", True),        # the ISO/IEC 7812 worked example
        ("79927398714", False),
    ]
    df = spark.createDataFrame(cases, "d: string, want: boolean")
    for r in df.select("want", luhn_valid(F.col("d")).alias("ok")).collect():
        assert r["ok"] == r["want"]


def test_with_pii_scrubbed_plan_python_free(spark):
    df = spark.createDataFrame(
        [(1, "reach a@b.co or 10.1.2.3")], "doc_id: long, text: string"
    )
    out = with_pii_scrubbed(df)
    row = out.collect()[0]
    assert row["pii_scrubbed"] == "reach <EMAIL> or <IP>"
    assert (row["pii_n_emails"], row["pii_n_ips"]) == (1, 1)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert "EvalPython" not in buf.getvalue()


# ---------------------------------------------------- decontamination


def test_contamination_hits_hand_case(spark):
    from schema_fantasy_spark.ops.decontaminate import (
        contamination_hits,
        with_contamination,
    )

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id: long, text: string",
    )
    docs = spark.createDataFrame(
        [
            # shares the 8-gram "quick brown fox jumps over the lazy dog"
            (1, "he said quick brown fox jumps over the lazy dog again"),
            (2, "completely different words with no overlap at all here now"),
            (3, "short text"),                       # < 8 tokens: no grams
            (4, "The QUICK brown fox jumps over the LAZY dog"),  # case-folded
        ],
        "doc_id: long, text: string",
    )
    for method in ("md5", "xxhash64"):
        hits = {
            r["doc_id"]: r["contam_hits"]
            for r in contamination_hits(docs, bench, n=8, method=method).collect()
        }
        assert hits == {1: 1, 4: 2}, (method, hits)
    flagged = {r["doc_id"]: (r["contam_hits"], r["contaminated"])
               for r in with_contamination(docs, bench).collect()}
    assert flagged == {1: (1, True), 2: (0, False), 3: (0, False), 4: (2, True)}


def test_ngram_hashes_short_and_dedup(spark):
    from schema_fantasy_spark.ops.decontaminate import ngram_hashes

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "w w w w w w w w w w")], "i: long, t: string"
    )
    out = {r["i"]: r["g"] for r in df.select(
        "i", ngram_hashes(F.col("t"), 8).alias("g")).collect()}
    assert out[1] == []          # shorter than n: no grams, no sequence(1,0)
    assert len(out[2]) == 1      # 3 windows of the same gram -> distinct = 1


# --------------------------------------------------- bigram fluency (lm)


def test_bigram_fluency_hand_case(spark):
    """CCNet-style fluency: model-fitting text scores far above
    gibberish; integer-exact quantized arithmetic replicates in plain
    python; null/short texts handled."""
    from schema_fantasy_spark.ops import lm

    df = spark.createDataFrame([
        (0, "the cat sat on the mat and the dog sat too"),
        (7, "the cat and the dog sat on the mat again ok"),
        (14, "the mat and the cat sat with the dog there"),
        (1, "the cat sat on the mat"),
        (2, "zqxj vw kqz jxq wvz qqq"),
        (3, None),
        (4, "a"),
    ], "doc_id: long, text: string")
    model = lm.train_char_bigram(df, sample_mod=7)
    out = {r["doc_id"]: r["lm_bigram_score"]
           for r in lm.with_bigram_fluency(df, model).collect()}
    assert out[3] is None and out[4] == 0.0
    assert out[1] > 3 * out[2]  # fluent >> gibberish

    pc, pv, v_smooth, vocab = model
    def ref(t):
        m = [c if c in vocab else lm.UNK for c in t]
        terms = [((pc.get(m[i] + m[i + 1], 0) + 1) * lm.SCALE)
                 // (pv.get(m[i], 0) + v_smooth) for i in range(len(m) - 1)]
        return round(sum(terms) / (len(terms) * lm.SCALE), 6)
    for k, t in [(1, "the cat sat on the mat"), (2, "zqxj vw kqz jxq wvz qqq"),
                 (0, "the cat sat on the mat and the dog sat too")]:
        assert abs(out[k] - ref(t)) < 1e-12, (k, out[k], ref(t))


def test_bigram_fluency_vocab_cap(spark):
    """The CCNet vocabulary cut: a corpus with ~10^4 distinct chars
    (synthetic CJK-ish) trains to <= max_vocab chars + UNK, model size
    hard-bounded; in-vocab scoring is unchanged by the cap; OOV chars
    score through the UNK bucket identically cross-checked in python."""
    from schema_fantasy_spark.ops import lm

    # 10,000 distinct BMP chars, one doc per 100-char run (training
    # slice = all docs), plus a latin doc that stays fully in-vocab
    big = [(i * 7, "".join(chr(0x4E00 + i * 100 + j) for j in range(100)))
           for i in range(100)]
    # dominate the counts with repeated latin text so the top-V cut
    # keeps the latin alphabet deterministically
    latin = [(7000 + 7 * k, "the cat sat on the mat " * 40) for k in range(30)]
    df = spark.createDataFrame(big + latin, "doc_id: long, text: string")
    model = lm.train_char_bigram(df, sample_mod=7, max_vocab=32)
    pc, pv, v_smooth, vocab = model
    assert len(vocab) <= 32
    assert v_smooth == len(vocab) + 1          # something was cut -> UNK live
    assert len(pc) <= (32 + 1) ** 2
    # every latin char survived the cut (they dominate by count)
    assert set("the cats onm ") <= vocab
    # scoring replays bit-for-bit through the UNK bucket
    probe = spark.createDataFrame(
        [(0, "the cat sat"), (1, "一丁 the 香")],
        "doc_id: long, text: string")
    out = {r["doc_id"]: r["lm_bigram_score"]
           for r in lm.with_bigram_fluency(probe, model).collect()}
    def ref(t):
        m = [c if c in vocab else lm.UNK for c in t]
        terms = [((pc.get(m[i] + m[i + 1], 0) + 1) * lm.SCALE)
                 // (pv.get(m[i], 0) + v_smooth) for i in range(len(m) - 1)]
        return round(sum(terms) / (len(terms) * lm.SCALE), 6)
    assert abs(out[0] - ref("the cat sat")) < 1e-12
    assert abs(out[1] - ref("一丁 the 香")) < 1e-12
