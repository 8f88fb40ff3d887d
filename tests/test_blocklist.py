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


def test_dedup_job_blocklist_substring_domaincap(spark, tmp_path, monkeypatch):
    """The three new dedup_job stages end to end: funnel blocklist rule,
    cross-doc substring trim, registered-domain cap."""
    import io
    import json
    import sys
    from contextlib import redirect_stdout

    sys.path.insert(0, "jobs")
    import dedup_job

    shared = "one two three four five six seven eight nine ten"
    rows = []
    for i in range(6):  # big.com: 6 docs sharing a passage
        rows.append((i, f"https://www.big.com/p/{i}",
                     f"u{i}a u{i}b u{i}c {shared} t{i}x t{i}y"))
    rows.append((10, "https://small.org/1",
                 "a perfectly clean unrelated document with many words"))
    rows.append((11, "https://small.org/2",
                 "this page mentions badword99 so the funnel drops it"))
    inp, outp = str(tmp_path / "in"), str(tmp_path / "out")
    spark.createDataFrame(
        rows, "doc_id long, url string, text string"
    ).write.parquet(inp)
    bl = tmp_path / "terms.txt"
    bl.write_text("# comment\nbadword99\n")
    monkeypatch.setattr(sys, "argv", [
        "dedup_job.py", "--input", inp, "--output", outp,
        "--url-col", "url", "--blocklist-file", str(bl),
        "--substring-dedup", "--substring-gram", "8",
        "--domain-cap", "4", "--min-words", "5",
    ])
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = dedup_job.main()
    assert rc == 0
    stats = json.loads(buf.getvalue().strip().splitlines()[-1])
    fun = {f["rule"]: f["n_dropped"] for f in stats["funnel"]}
    assert fun["blocklist"] == 1
    # 5 non-canonical copies x 10 shared words trimmed
    assert stats["removed_substring_words"] == 50
    assert stats["removed_domain_cap"] == 2  # big.com 6 -> 4
    out = {r.doc_id: r.text for r in spark.read.parquet(outp).collect()}
    assert 11 not in out and 10 in out
    assert sum(1 for i in out if i < 6) == 4
    assert out[0].count("one two three") == 1          # canonical keeps it
    assert all(shared not in out[i] for i in out if 0 < i < 6)


def test_compression_ratio(spark):
    import zlib

    from schema_fantasy_spark.ops.text import with_compression_ratio

    rows = [
        (0, "a" * 1000),                                   # ultra-compressible
        (1, "the quick brown fox jumps over the lazy dog " * 5),
        (2, None),
        (3, ""),
        (4, "café " * 50),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.zlib_ratio6 for r in with_compression_ratio(df).collect()}

    def expect(t):
        b = t.encode()
        return len(zlib.compress(b, 6)) * 1_000_000 // len(b)

    assert got[0] == expect("a" * 1000) and got[0] < 20_000
    assert got[1] == expect(rows[1][1])
    assert got[2] is None and got[3] is None
    assert got[4] == expect("café " * 50)


def test_soft404_flag(spark):
    from schema_fantasy_spark.ops.text import soft404_flag

    rows = [
        (0, "Welcome", "ordinary content", False),
        (1, "404 Not Found", "x", True),
        (2, None, "Error 404 - this page does not exist", True),
        (3, None, "long " * 150 + "page not found", False),   # long body
        (4, "The file doesn't exist", "y", True),
        (5, "Page has been moved", "z", True),
        (6, None, None, False),
        # a DISCUSSION of 404s is not a soft 404 — no marker phrase
        (7, "Discussion of HTTP 404 semantics", "w", False),
    ]
    df = spark.createDataFrame(
        [(i, t, x) for i, t, x, _ in rows],
        "doc_id long, title string, text string",
    )
    got = [r.f for r in df.select(
        soft404_flag(F.col("title"), F.col("text")).alias("f")
    ).orderBy("doc_id").collect()]
    assert got == [want for *_, want in rows]
