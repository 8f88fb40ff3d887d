"""Tier 3 — end-to-end on the synthetic web-pages table (FIXTURES.md §1):
exact injected-violation sets, per-partition verdicts, the
byte-identical-text-per-url invariant, and snapshot-pair referential /
drift checks."""

import pyspark.sql.functions as F

from schema_fantasy_spark import table_checks as tc
from schema_fantasy_spark.engine import ValidationEngine
from schema_fantasy_spark.sources.pages import (
    PAGES_SCHEMA,
    expected_violation_ids,
    pages,
    snapshot_pair,
)

N = 4000


def test_exact_violation_sets(spark):
    df = pages(spark, N)
    exp = expected_violation_ids(N)
    validated = ValidationEngine(PAGES_SCHEMA).apply(df)
    viol = ValidationEngine.violations(validated, ["id"])
    got = {}
    for r in viol.collect():
        got.setdefault((r["keyword"], "/".join(r["path"])), set()).add(r["id"])
    assert got[("pattern", "url")] == set(exp["bad_url"])
    assert got[("minLength", "text")] == set(exp["empty_text"])
    assert got[("required", "")] == set(exp["null_text"])
    assert got[("maximum", "warc_ts")] == set(exp["future_ts"])
    assert got[("enum", "lang")] == set(exp["bad_lang"])
    # nothing else flagged
    assert set(got) == {("pattern", "url"), ("minLength", "text"), ("required", ""),
                        ("maximum", "warc_ts"), ("enum", "lang")}


def test_byte_identical_text_per_url(spark):
    """text is a pure function of url -> every url maps to exactly one
    text hash, even for injected duplicate urls (BASELINE.json per-row
    invariant)."""
    df = pages(spark, N).filter(F.col("text").isNotNull())
    multi = (
        df.groupBy("url")
        .agg(F.count_distinct(F.xxhash64("text")).alias("n_texts"))
        .filter(F.col("n_texts") > 1)
    )
    assert multi.count() == 0


def test_determinism_across_parallelism(spark):
    """Same rows regardless of partition count (scaling runs read
    literally identical data)."""
    agg = F.expr("bit_xor(xxhash64(url, text, lang))").alias("h")
    h1 = pages(spark, 2000, partitions=2).agg(agg).collect()[0]["h"]
    h2 = pages(spark, 2000, partitions=16).agg(agg).collect()[0]["h"]
    assert h1 == h2


def test_uniqueness_on_url(spark):
    df = pages(spark, N)
    exp = expected_violation_ids(N)
    dups = tc.duplicate_keys(df, ["url"])
    rows = dups.collect()
    assert len(rows) == len(exp["dup_url"])
    assert all(r["n_copies"] == 2 and r["n_duplicates"] == 1 for r in rows)
    # violation rows: both members of each duplicate pair
    v = tc.uniqueness_violations(df, ["url"], select_cols=["id"])
    got_ids = {r["id"] for r in v.collect()}
    want = set(exp["dup_url"]) | {i - 1 for i in exp["dup_url"]}
    assert got_ids == want
    # summary contract
    s = tc.uniqueness_summary(df, ["url"]).collect()[0]
    assert s["n_duplicates"] == len(exp["dup_url"]) and not s["pass"]


def test_null_rate_lang(spark):
    df = pages(spark, N)
    exp = expected_violation_ids(N)
    nr = {r["col_name"]: r for r in tc.null_rates(df, ["lang", "text"]).collect()}
    assert nr["lang"]["n_null"] == len(exp["null_lang"])
    assert nr["text"]["n_null"] == len(exp["null_text"])
    assert abs(nr["lang"]["null_rate"] - len(exp["null_lang"]) / N) < 1e-9


def test_snapshot_referential_orphans(spark):
    base, nxt = snapshot_pair(spark, 3000, drop_mod=211)
    # urls in base missing from next = dropped ids (except id 0 keeps its
    # url alive iff another row duplicates it — dup ids are never ≡0 mod 211
    # and 211 is prime > 1000-marks interactions handled by exact compute)
    orphans = tc.referential_orphans(
        base.select("id", "url"), nxt.select("url"), "url"
    )
    got = {r["id"] for r in orphans.collect()}
    # the dropped ids (multiples of 211 < 3000) are exactly the orphans:
    # none is ≡ 6 or 7 (mod 1000), so duplicate-url rescue never applies
    want = set(range(0, 3000, 211))
    assert got == want


def test_lang_drift_positive(spark):
    base, nxt = snapshot_pair(spark, 3000)
    cur_h = tc.group_histogram(nxt, "lang")
    base_h = tc.group_histogram(base, "lang")
    stat = tc.chi_square_stat(cur_h, base_h).collect()[0]
    assert stat["chi_square"] > 10  # distribution was shifted by design
    assert stat["dof"] >= 5
    # self-drift is ~zero
    self_stat = tc.chi_square_stat(base_h, base_h).collect()[0]
    assert self_stat["chi_square"] == 0.0


def test_ks_drift_on_text_length(spark):
    base, nxt = snapshot_pair(spark, 2000)
    b = base.withColumn("tl", F.length("text"))
    n = nxt.withColumn("tl", F.length("text"))
    hb = tc.numeric_histogram(b, "tl", 0, 5000, 25)
    hn = tc.numeric_histogram(n, "tl", 0, 5000, 25)
    assert tc.ks_stat(hb, hb).collect()[0]["ks_stat"] == 0.0  # self-drift zero
    d = tc.ks_stat(hn, hb).collect()[0]["ks_stat"]
    assert 0.0 <= d < 0.2  # text-length law unchanged between snapshots


def test_text_consistency_vs_reference_corpus(spark):
    """BASELINE.json per-row invariant: byte-identical text per url vs a
    reference corpus. The regenerated table IS the reference (text is a
    pure function of url), so self-check is empty; a corrupted copy is
    caught exactly."""
    df = pages(spark, 1500).filter(F.col("text").isNotNull())
    ref = pages(spark, 1500).filter(F.col("text").isNotNull())
    assert tc.text_consistency(df, ref).count() == 0
    corrupted = ref.withColumn(
        "text",
        F.when(F.col("id") % 500 == 3, F.concat(F.col("text"), F.lit("X")))
        .otherwise(F.col("text")),
    )
    bad = tc.text_consistency(df, corrupted)
    assert bad.count() == len([i for i in range(1500) if i % 500 == 3])
