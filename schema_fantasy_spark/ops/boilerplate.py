"""Boilerplate removal — block-level link-density classification in
pure Column expressions (the jusText / trafilatura core heuristic,
simplified to a deterministic, integer-exact rule).

Web pages wrap their content in navigation, footers, cookie banners and
sidebars; a training corpus that keeps them learns "Home About Contact"
as English. The standard remedy classifies BLOCKS (the segments between
block-level tags) and keeps the text-dense ones:

* a block is CONTENT iff its cleaned text has at least ``min_len``
  characters AND its anchor text (text inside ``<a>`` elements) is at
  most half of it (``anchor_len * 2 <= text_len`` — integer, no
  floats, so the rule is exact cross-engine);
* everything else — link lists, short fragments, nav/footer chrome —
  is boilerplate and dropped.

Scope, documented: block segmentation is tag-regex splitting (same
quoted-attribute guard as ops/html.py), not a DOM tree; the classifier
is the two-feature jusText core, not its full stoplist/context model.
Cleaning (tag strip, full-Unicode entity decode, whitespace collapse)
is shared with ops/html.extract_text.

Scale shape: pure Column work — no Python, no shuffle; at 10^12 pages
this runs at scan bandwidth alongside extraction. The per-block
transform evaluates interpreted (Spark 4 HOF lambdas get no codegen,
CLAUDE.md trap 9), so `remove_boilerplate` builds ONE expression tree
used once; wrap the stats array in a Generate barrier
(ops/dedup._barrier) before fanning multiple aggregates off it."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from schema_fantasy_spark.ops.html import _TAG, decode_entities

#: block-level elements whose tags segment the page (open or close,
#: quoted-attribute guarded); <a>/<span>/<b>... are inline and stay
#: inside their block
_BLOCK_TAG = (
    r"(?i)</?(?:html|body|p|div|li|ul|ol|h[1-6]|t[dhr]|table|thead|tbody"
    r"|section|article|header|footer|nav|aside|blockquote|pre|br|hr|form"
    r"|fieldset|figure|figcaption|main)"
    r"(?:[^>\"']|\"[^\"]*\"|'[^']*')*>"
)

#: anchor element with its inner HTML (non-greedy, dotall)
_ANCHOR = r"(?is)<a\b(?:[^>\"']|\"[^\"]*\"|'[^']*')*>(.*?)</a\s*>"


def _clean(s: Column) -> Column:
    """Inline-tag strip + entity decode + whitespace collapse (the
    ops/html.extract_text tail) for one block's inner HTML."""
    s = F.regexp_replace(s, _TAG, " ")
    s = decode_entities(s)
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def block_stats(html: Column, min_len: int = 20) -> Column:
    """``array<struct<text, text_len, anchor_len, content>>`` — one
    entry per non-empty block of the page, in document order. ``text``
    is the cleaned block text; ``content`` applies the module rule."""
    s = F.regexp_replace(html, r"(?is)<script\b.*?</script\s*>", " ")
    s = F.regexp_replace(s, r"(?is)<style\b.*?</style\s*>", " ")
    s = F.regexp_replace(s, r"(?is)<head\b.*?</head\s*>", " ")
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", " ")
    blocks = F.split(s, _BLOCK_TAG)

    def _stat(b: Column) -> Column:
        text = _clean(b)
        anchors = F.regexp_extract_all(b, F.lit(_ANCHOR), 1)
        atext = _clean(F.array_join(anchors, " "))
        tl = F.length(text).cast("int")
        al = F.length(atext).cast("int")
        return F.struct(
            text.alias("text"),
            tl.alias("text_len"),
            al.alias("anchor_len"),
            ((tl >= F.lit(min_len)) & (al * 2 <= tl)).alias("content"),
        )

    return F.filter(F.transform(blocks, _stat), lambda b: b["text_len"] > 0)


def remove_boilerplate(html: Column, min_len: int = 20) -> Column:
    """The page's content text: content blocks' cleaned text joined
    with single spaces (boilerplate dropped; '' when nothing
    qualifies)."""
    return F.array_join(
        F.transform(
            F.filter(block_stats(html, min_len), lambda b: b["content"]),
            lambda b: b["text"],
        ),
        " ",
    )


def with_block_stats(
    df: DataFrame, html_col: str = "html", out_col: str = "stats",
    min_len: int = 20,
) -> DataFrame:
    """DataFrame-level :func:`block_stats` — the fast path: raw
    per-block tag stripping stays in cheap lambdas, entity decoding
    runs as TWO array-level SQL-decoder calls at the top level (the
    Column form's per-block decode_entities builds the slow Column
    twin — ops/html.py's py4j-tax note), and Generate barriers pin
    each array to one evaluation (CollapseProject re-inlines
    otherwise). Output column and semantics identical to
    ``block_stats`` (equivalence-tested)."""
    from schema_fantasy_spark.ops.dedup import _assert_staging_free, _barrier
    from schema_fantasy_spark.ops.html import decode_entities_array

    _assert_staging_free(
        df, "__blocks", "__bt_raw", "__at_raw", "__bt", "__at", out_col
    )
    s = F.col(html_col).cast("string")
    s = F.regexp_replace(s, r"(?is)<script\b.*?</script\s*>", " ")
    s = F.regexp_replace(s, r"(?is)<style\b.*?</style\s*>", " ")
    s = F.regexp_replace(s, r"(?is)<head\b.*?</head\s*>", " ")
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", " ")
    base = _barrier(df, F.split(s, _BLOCK_TAG), "__blocks")
    stripped = F.transform(
        F.col("__blocks"), lambda b: F.regexp_replace(b, _TAG, " ")
    )
    astripped = F.transform(
        F.col("__blocks"),
        lambda b: F.regexp_replace(
            F.array_join(F.regexp_extract_all(b, F.lit(_ANCHOR), 1), " "),
            _TAG, " ",
        ),
    )
    collapse = lambda v: F.trim(F.regexp_replace(v, r"\s+", " "))  # noqa: E731
    # The raw (tag-stripped) arrays must reach decode_entities_array as
    # BARE column references or the SQL array decoder silently falls back
    # to the interpreted Column twin (a transform(...) argument carries
    # bound lambda vars the free-variable guard can't clear). Each raw
    # column is consumed exactly once, so CollapseProject inlining it into
    # its decode barrier evaluates the strip regexes once per row.
    base = base.select(
        "*", stripped.alias("__bt_raw"), astripped.alias("__at_raw")
    )
    # Decode in a plain Project (a SQL UDF inside Generate is
    # UNSUPPORTED_SQL_UDF_USAGE), then pin the collapsed arrays behind
    # Generate barriers so the per-index lambda below can't re-inline them.
    base = base.select(
        "*",
        decode_entities_array(F.col("__bt_raw")).alias("__bt_dec"),
        decode_entities_array(F.col("__at_raw")).alias("__at_dec"),
    )
    base = _barrier(
        base, F.transform(F.col("__bt_dec"), collapse), "__bt"
    )
    base = _barrier(
        base, F.transform(F.col("__at_dec"), collapse), "__at"
    )
    stats = F.filter(
        F.transform(
            F.col("__bt"),
            lambda v, i: F.struct(
                v.alias("text"),
                F.length(v).cast("int").alias("text_len"),
                F.length(F.get(F.col("__at"), i)).cast("int")
                .alias("anchor_len"),
                (
                    (F.length(v) >= F.lit(min_len))
                    & (F.length(F.get(F.col("__at"), i)) * 2 <= F.length(v))
                ).alias("content"),
            ),
        ),
        lambda b: b["text_len"] > 0,
    )
    return base.select(
        *[c for c in df.columns], stats.alias(out_col)
    )


def with_boilerplate_removed(
    df: DataFrame, html_col: str = "html", out_col: str = "content_text",
    min_len: int = 20,
) -> DataFrame:
    """Append the boilerplate-free content-text column (through the
    fast df-level stats path)."""
    tmp = "__sfs_bstats"
    from schema_fantasy_spark.ops.dedup import _assert_staging_free

    _assert_staging_free(df, tmp)
    staged = with_block_stats(df, html_col=html_col, out_col=tmp,
                              min_len=min_len)
    return staged.withColumn(
        out_col,
        F.array_join(
            F.transform(
                F.filter(F.col(tmp), lambda b: b["content"]),
                lambda b: b["text"],
            ),
            " ",
        ),
    ).drop(tmp)
