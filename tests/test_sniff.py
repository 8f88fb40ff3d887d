"""WHATWG MIME sniffing (ops/sniff.py): signature table, RIFF/BMFF
discrimination, the html tag sniff, BOM text rules — plus cross-checks
against every synthetic multimodal corpus family."""

from pyspark.sql import functions as F

from schema_fantasy_spark.ops import mm_corpus as mc
from schema_fantasy_spark.ops.sniff import sniff_mime, with_sniffed_mime


def _sniff(spark, cases):
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(cases)],
        "id: long, html: binary",
    )
    return [r["mime"] for r in with_sniffed_mime(df).orderBy("id").collect()]


def test_signature_table(spark):
    cases = [
        b"\x89PNG\r\n\x1a\n" + b"x" * 8,
        b"\xff\xd8\xff\xe0JFIF",
        b"BMxxxx",
        b"GIF89a\x01\x00",
        b"RIFF\x10\x00\x00\x00WEBPVP8 ",
        b"RIFF\x10\x00\x00\x00WAVEfmt ",
        b"RIFF\x10\x00\x00\x00AVI LIST",
        b"RIFF\x10\x00\x00\x00JUNKdata",   # RIFF, unknown format
        b"\x1a\x45\xdf\xa3webm",
        b"ID3\x04\x00\x00\x00\x00\x00\x00",
        b"\xff\xfbframe",
        b"\x00\x00\x00\x18ftypisom\x00\x00\x02\x00",
        b"\x00\x00\x00\x14ftypqt  ",
        b"\x00\x00\x00\x18ftypM4A \x00",
        b"OggS\x00vorbis",
        b"\x1f\x8b\x08\x00compressed",
        b"PK\x03\x04zipfile",
        b"%PDF-1.7 blah",
        b"wOFFfontdata",
        b"wOF2fontdata",
        b"\x00\x01\x00\x00truetype",
        b"random opaque \x01\x02 bytes",
        b"",
    ]
    want = [
        "image/png", "image/jpeg", "image/bmp", "image/gif",
        "image/webp", "audio/wave", "video/avi",
        "application/octet-stream",
        "video/webm", "audio/mpeg", "audio/mpeg",
        "video/mp4", "video/quicktime", "audio/mp4",
        "application/ogg", "application/x-gzip", "application/zip",
        "application/pdf", "font/woff", "font/woff2", "font/ttf",
        "application/octet-stream", "application/octet-stream",
    ]
    assert _sniff(spark, cases) == want


def test_html_tag_sniff_and_text_rules(spark):
    cases = [
        b"  \t\n<!DOCTYPE html><html>",     # WHATWG whitespace incl \t\n
        b"<HTML><body>x</body>",            # case-insensitive
        b'<div class="x">y</div>',
        b"<a href=x>link</a>",
        b"<br>",
        b"<brick>",                          # no tag-terminating byte match
        b"<division>",                       # <div must terminate
        b'<?xml version="1.0"?><r/>',
        b"\xef\xbb\xbfutf8 text",            # BOM rules outrank tag sniff
        b"\xff\xfet\x00e\x00x\x00t\x00",
        b"just plain prose here",
    ]
    want = [
        "text/html", "text/html", "text/html", "text/html", "text/html",
        "application/octet-stream", "application/octet-stream",
        "text/xml", "text/plain;charset=utf-8",
        "text/plain;charset=utf-16", "application/octet-stream",
    ]
    assert _sniff(spark, cases) == want


def test_corpus_cross_check(spark):
    """Every synthetic multimodal family sniffs to its real type: the
    image corpus by nibble family (ppm is NOT a web format — the spec
    table routes it to octet-stream, gating the negative path), audio
    by codec family (all WAV laws share RIFF/WAVE; MP3 is ID3-tagged),
    video containers by format."""
    img_want = {0: "image/bmp", 1: "application/octet-stream",
                2: "image/png", 3: "image/webp"}
    rows = []
    for d in range(48):
        rows.append(("img", d, bytearray(mc._image_payload(d))))
        sr, nf, amp, corrupt, law = mc.audio_params(d)
        if not corrupt:
            rows.append(("aud", d, bytearray(mc._audio_payload(d))))
        rows.append(("vid", d, bytearray(mc._container_payload(d))))
    df = spark.createDataFrame(rows, "kind: string, doc_id: long, html: binary")
    got = {(r["kind"], r["doc_id"]): r["mime"]
           for r in with_sniffed_mime(df).collect()}
    for d in range(48):
        nib = mc._nibbles(d)
        want_img = img_want[nib[0] % 4]
        if nib[0] % 4 == 1 and nib[13] % 2 == 1:
            want_img = "image/gif"  # the ppm family's GIF sub-split
        assert got[("img", d)] == want_img, d
        sr, nf, amp, corrupt, law = mc.audio_params(d)
        if not corrupt:
            # FLAC is absent from the WHATWG table (negative path);
            # Ogg hits the OggS signature
            want = {3: "audio/mpeg", 4: "application/octet-stream",
                    5: "application/ogg"}.get(law, "audio/wave")
            assert got[("aud", d)] == want, (d, law)
        fmt = mc.container_params(d, nib)[0]
        vid_want = {"mp4": "video/mp4", "avi": "video/avi",
                    "mkv": "video/webm", "webm": "video/webm"}
        assert got[("vid", d)] == vid_want[fmt], (d, fmt)


def test_pure_column_plan(spark):
    """The sniffer is scan-bandwidth work: no Python eval nodes."""
    df = spark.createDataFrame([(1, bytearray(b"x"))], "id: long, html: binary")
    plan = with_sniffed_mime(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
