"""ops/text.py blocklist filter — the C4 term-list page filter."""

from pyspark.sql import functions as F

from schema_fantasy_spark.ops.text import (
    blocklist_filter,
    blocklist_hits,
    blocklist_pattern,
)

WORDS = ["badword", "redact me", "x.y"]


def test_blocklist_hits_semantics(spark):
    rows = [
        (0, "perfectly clean text"),
        (1, "one badword here"),
        (2, "badword again badword and redact me too"),
        (3, "embadworded is not a hit; neither is badwordy"),
        (4, "case Badword and REDACT  ME with doubled space"),
        (5, "literal x.y dot, not xAy"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.blocklist_hits, r.blocklisted)
        for r in blocklist_filter(df, WORDS).collect()
    }
    assert got[0] == (0, False)
    assert got[1] == (1, True)
    assert got[2] == (3, True)
    assert got[3] == (0, False)       # word boundaries hold
    assert got[4] == (2, True)        # case-insensitive; \s+ in phrases
    assert got[5] == (1, True)        # escaped metacharacters
    assert got[6] == (0, False)       # NULL text never blocks

    # phrase beats its own prefix word: "red carpet" vs "red"
    pat = blocklist_pattern(["red", "red carpet"])
    one = spark.createDataFrame([("a red carpet here",)], ["t"])
    assert one.select(
        F.regexp_count("t", F.lit(pat)).alias("n")
    ).collect()[0].n == 1

    # pure Column work: no Python in the plan
    plan = blocklist_filter(df, WORDS)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Python" not in plan


def test_hamming_near_duplicates_generic(spark):
    """Signature-agnostic Hamming banding (the phash near-dup path)."""
    from schema_fantasy_spark.ops.dedup import hamming_near_duplicates

    rows = [
        (1, 0b1010_1010),            # base
        (2, 0b1010_1011),            # hamming 1 from base
        (3, 0b1010_1010 ^ (1 << 40) ^ (1 << 50)),  # hamming 2
        (4, (1 << 62) - 1),          # far from everything
    ]
    df = spark.createDataFrame(rows, "doc_id long, phash long")
    pairs = {(r.id_a, r.id_b): r.hamming for r in
             hamming_near_duplicates(df, "phash", max_hamming=3).collect()}
    assert pairs == {(1, 2): 1, (1, 3): 2, (2, 3): 3}
