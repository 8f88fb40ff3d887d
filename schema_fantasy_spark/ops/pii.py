"""PII detection + redaction for web-text pipelines — pure Column
expressions (regexp scans + one fold for the Luhn checksum): runs in
whole-stage codegen at scan bandwidth, no Python, no shuffle. The
standard pre-training cleaning stage between extraction and dedup.

Detection is STAGED because the pattern classes overlap (an IPv4
address is also a phone-shaped digit run; a card number contains
phone-length digit runs): emails scrub first, then IPv4, then card-like
digit runs (13-19 digits, spaces/dashes allowed), then phone-like runs
(8-17 chars of digits/()-/space/dot between two digits) — each stage
counts on the PREVIOUS stage's output, so one span is counted exactly
once, under its most specific class.

``luhn_valid`` implements the Luhn checksum over a digit string as a
single zip_with/aggregate fold — card-LIKE runs and Luhn-VALID runs are
reported separately (the standard precision dial: random 16-digit runs
are 10% Luhn-valid, real PANs 100%).

Placeholders (``<EMAIL>`` etc.) contain no digits, so later stages can
never re-match inside an earlier redaction."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RX = (
    r"\b(?:(?:25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\.){3}"
    r"(?:25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\b"
)
CARD_RX = r"(?<![0-9])(?:[0-9][ -]?){12,18}[0-9](?![0-9])"
PHONE_RX = r"(?<![0-9])\+?[0-9][0-9()\-\s.]{6,15}[0-9](?![0-9])"


def luhn_valid(digits: Column) -> Column:
    """True iff the digit string passes the Luhn checksum (ISO/IEC
    7812): from the rightmost digit, double every second one, subtract
    9 from doubles > 9, total divisible by 10."""
    # split at internal boundaries only: a bare (?!^) also matches the
    # end-of-string position, yielding a trailing '' that ANSI-mode
    # cast-to-int rejects
    chars = F.split(F.reverse(digits), "(?!^)(?!$)")
    total = F.aggregate(
        F.zip_with(
            chars,
            F.sequence(F.lit(0), F.length(digits) - 1),
            lambda c, i: F.when(
                i % 2 == 1,
                F.when(c.cast("int") * 2 > 9, c.cast("int") * 2 - 9)
                .otherwise(c.cast("int") * 2),
            ).otherwise(c.cast("int")),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (F.length(digits) > 0) & (total % 10 == 0)


def pii_scrub(text: Column) -> Column:
    """struct(scrubbed, n_emails, n_ips, n_cards, n_cards_luhn,
    n_phones) — staged counts + redacted text (see module doc)."""
    n_emails = F.size(F.regexp_extract_all(text, F.lit(EMAIL_RX), 0))
    s1 = F.regexp_replace(text, EMAIL_RX, "<EMAIL>")
    n_ips = F.size(F.regexp_extract_all(s1, F.lit(IPV4_RX), 0))
    s2 = F.regexp_replace(s1, IPV4_RX, "<IP>")
    card_spans = F.regexp_extract_all(s2, F.lit(CARD_RX), 0)
    n_cards = F.size(card_spans)
    n_cards_luhn = F.size(
        F.filter(
            F.transform(card_spans, lambda m: F.regexp_replace(m, "[^0-9]", "")),
            luhn_valid,
        )
    )
    s3 = F.regexp_replace(s2, CARD_RX, "<CARD>")
    n_phones = F.size(F.regexp_extract_all(s3, F.lit(PHONE_RX), 0))
    s4 = F.regexp_replace(s3, PHONE_RX, "<PHONE>")
    return F.struct(
        s4.alias("scrubbed"),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_cards.alias("n_cards"),
        n_cards_luhn.alias("n_cards_luhn"),
        n_phones.alias("n_phones"),
    )


def with_pii_scrubbed(
    df: DataFrame, text_col: str = "text", prefix: str = "pii_"
) -> DataFrame:
    """Append scrubbed text + per-class counts as flat columns."""
    s = pii_scrub(F.col(text_col))
    return df.select(
        "*",
        s["scrubbed"].alias(f"{prefix}scrubbed"),
        s["n_emails"].alias(f"{prefix}n_emails"),
        s["n_ips"].alias(f"{prefix}n_ips"),
        s["n_cards"].alias(f"{prefix}n_cards"),
        s["n_cards_luhn"].alias(f"{prefix}n_cards_luhn"),
        s["n_phones"].alias(f"{prefix}n_phones"),
    )
