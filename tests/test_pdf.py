"""PDF text extraction (ops/pdf.py): writer/parser round trips plus
the syntax and damage cases crawl PDFs actually carry — string escape
forms, nested parens, hex strings, comments, indirect /Length, content
arrays, TJ kerning, broken xref tables, truncation salvage, and
unsupported filters quarantining."""

import zlib

import pytest

from schema_fantasy_spark.ops import mm_corpus as mc
from schema_fantasy_spark.ops import pdf


def _flat(pages):
    return "\n".join(line for pg in pages for line in pg)


@pytest.mark.parametrize("compress", [False, True])
@pytest.mark.parametrize("hexs", [False, True])
def test_round_trip(compress, hexs):
    pages = [["alpha one", "beta (two)", "gamma \\ three"],
             ["delta", "epsilon \xe9\xfc"]]
    b = pdf.encode_pdf(pages, compress=compress, hex_strings=hexs)
    assert pdf.parse_pdf(b) == (2, _flat(pages))


def test_extract_pdf_text_helper():
    b = pdf.encode_pdf([["only line"]])
    assert pdf.extract_pdf_text(b) == "only line"
    assert pdf.extract_pdf_text(b"junk") is None


def _mini(content, extra_objs=b""):
    """Single-page PDF around a raw content stream, no xref needed
    (the parser is object-scan based)."""
    return (b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n"
            b"endobj\n"
            b"4 0 obj\n<< /Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
            + extra_objs + b"%%EOF\n")


def test_string_escapes_and_octal():
    content = (b"BT (tab:\\t nl:\\n paren:\\( oct:\\101\\12\\0) Tj ET")
    got = pdf.parse_pdf(_mini(content))
    assert got == (1, "tab:\t nl:\n paren:( oct:A\n\x00")


def test_nested_parens_and_line_continuation():
    content = b"BT (a (nested (deep)) b\\\nc) Tj ET"
    assert pdf.parse_pdf(_mini(content)) == (1, "a (nested (deep)) bc")


def test_tj_kerning_space_heuristic():
    content = b"BT [(Hel) -20 (lo) -250 (world)] TJ ET"
    # -20 is glyph kerning (no space); -250 is a word gap
    assert pdf.parse_pdf(_mini(content)) == (1, "Hello world")


def test_quote_operator_advances_line():
    content = b"BT (first) Tj (second) ' (third) ' ET"
    assert pdf.parse_pdf(_mini(content)) == (1, "first\nsecond\nthird")


def test_td_with_zero_dy_does_not_break_line():
    content = b"BT (a) Tj 10 0 Td (b) Tj 0 -14 Td (c) Tj ET"
    assert pdf.parse_pdf(_mini(content)) == (1, "ab\nc")


def test_comments_and_name_escapes_ignored():
    content = b"% a comment\nBT /F#31 12 Tf (x) Tj ET % trailing"
    assert pdf.parse_pdf(_mini(content)) == (1, "x")


def test_indirect_length():
    content = b"BT (ind) Tj ET"
    raw = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n"
           b"4 0 obj\n<< /Length 5 0 R >>\nstream\n" + content
           + b"\nendstream\nendobj\n"
           b"5 0 obj\n" + str(len(content)).encode() + b"\nendobj\n")
    assert pdf.parse_pdf(raw) == (1, "ind")


def test_contents_array_concatenates():
    raw = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /Contents [4 0 R 5 0 R] >>\nendobj\n"
           b"4 0 obj\n<< /Length 11 >>\nstream\nBT (ab) Tj\nendstream\nendobj\n"
           b"5 0 obj\n<< /Length 12 >>\nstream\n(cd) ' ET ok\nendstream\nendobj\n")
    assert pdf.parse_pdf(raw) == (1, "ab\ncd")


def test_broken_xref_still_parses():
    b = bytearray(pdf.encode_pdf([["resilient"]]))
    i = bytes(b).find(b"xref")
    for j in range(i, min(i + 40, len(b))):
        b[j] = 0x20  # stomp the xref table
    assert pdf.parse_pdf(bytes(b)) == (1, "resilient")


def test_nested_pages_tree():
    raw = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [6 0 R 3 0 R] /Count 2 >>\nendobj\n"
           b"6 0 obj\n<< /Type /Pages /Kids [7 0 R] /Count 1 >>\nendobj\n"
           b"7 0 obj\n<< /Type /Page /Contents 8 0 R >>\nendobj\n"
           b"8 0 obj\n<< /Length 14 >>\nstream\nBT (one) Tj ET\nendstream\nendobj\n"
           b"3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n"
           b"4 0 obj\n<< /Length 14 >>\nstream\nBT (two) Tj ET\nendstream\nendobj\n")
    # tree order (6 before 3) wins over object-number order
    assert pdf.parse_pdf(raw) == (2, "one\ntwo")


def test_unsupported_filter_quarantines():
    raw = _mini(b"") .replace(
        b"<< /Length 0 >>", b"<< /Length 0 /Filter /DCTDecode >>")
    assert pdf.parse_pdf(raw) is None


def test_flate_garbage_quarantines():
    raw = (_mini(b"xxxxnotzlib")
           .replace(b"<< /Length 11 >>",
                    b"<< /Length 11 /Filter /FlateDecode >>"))
    assert pdf.parse_pdf(raw) is None


def test_truncation_salvages_leading_pages():
    pages = [["page one text"], ["page two text"], ["page three"]]
    b = pdf.encode_pdf(pages)
    # cut inside page 3's content object: pages 1-2 survive
    cut = b.find(b"(page three")
    got = pdf.parse_pdf(b[:cut])
    assert got is not None and got[0] == 2
    assert got[1] == "page one text\npage two text"
    # header-only stumps are fully quarantined
    assert pdf.parse_pdf(b[:15]) is None
    assert pdf.parse_pdf(b[:4]) is None


def test_reference_vs_keyword_disambiguation():
    # "1 0 RG" (an operator) must NOT lex as reference "1 0 R" + "G"
    content = b"BT 1 0 RG (color kept) Tj ET"
    assert pdf.parse_pdf(_mini(content)) == (1, "color kept")


def test_corpus_round_trip_and_quarantine():
    seen = {(False, False): 0, (False, True): 0,
            (True, False): 0, (True, True): 0}
    for d in range(200):
        n_pages, lines, pad, comp, hexs, corrupt = mc.pdf_params(d)
        payload = mc._pdf_payload(d)
        if corrupt:
            assert pdf.parse_pdf(payload) is None, d
            continue
        got = pdf.parse_pdf(payload)
        exp = "\n".join(f"doc {d} pg {p} ln {l} " + "w" * pad
                        for p in range(n_pages) for l in range(lines[p]))
        assert got == (n_pages, exp), d
        seen[(comp, hexs)] += 1
    assert all(v > 10 for v in seen.values()), seen  # all 4 variants occur


def test_pdf_text_operator(spark):
    rows = [(1, bytearray(pdf.encode_pdf([["a"], ["b", "c"]]))),
            (2, bytearray(b"%PDF-1.4\nnothing here")),
            (3, bytearray(pdf.encode_pdf([["z"]], compress=True)))]
    df = spark.createDataFrame(rows, "doc_id: long, payload: binary")
    got = {r["doc_id"]: r for r in
           pdf.pdf_text(df, binary_col="payload", id_col="doc_id").collect()}
    assert set(got) == {1, 3}
    assert (got[1]["n_pages"], got[1]["text"]) == (2, "a\nb\nc")
    assert (got[3]["n_pages"], got[3]["text"]) == (1, "z")
