"""Extract the normative VP8 probability tables from the system
libwebp shared library and write them as a generated Python module.

Why extract instead of transcribing: RFC 6386's tables total thousands
of byte constants, and round-1..5 transcribed them from memory of the
public listings — self-consistent (the encoder uses the same tables)
but unverifiable in this container, and the round-6 audit against
libwebp's .rodata found 25 drifted bytes in DEFAULT_COEFF_PROBS and 9
in COEFF_UPDATE_PROBS. libwebp (BSD, Google's reference WebP codec,
installed system-wide as /usr/lib/x86_64-linux-gnu/libwebp.so.7) must
carry the bit-exact normative values or it could not decode real VP8
streams — so its binary IS a ground-truth copy of the spec data. The
tables are located by content anchors (the spec-mandated leading rows,
stable across builds), not file offsets.

Layout note: libwebp stores the coefficient-probability data with the
RFC's all-128 row [block type 0][band 7] elided (1023 bytes instead of
4*8*3*11 = 1056); the reconstruction re-inserts it and is validated by
the all-128 rows landing exactly at the RFC's [0][7] and [2][7]
positions. tests/test_vp8.py additionally cross-checks the tables
END-TO-END: frames encoded with these tables decode bit-identically
through libwebp itself (via ctypes).

Usage: python tools/gen_vp8_tables.py  # rewrites ops/vp8_tables.py
"""

from __future__ import annotations

import os

LIB = "/usr/lib/x86_64-linux-gnu/libwebp.so.7"

# content anchors: normative first rows of each table (RFC 6386 13.4/
# 13.5 and the key-frame sub-mode table of 11.4 / libvpx entropymode.c)
BMODE_ANCHOR = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])
COEFF_ANCHOR = bytes([253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128])
# row [0][1][0] of the update table — its first row is all 255s (an
# anchor ending in a 255-run would slide left over any preceding 255s)
UPDATE_ANCHOR = bytes([176, 246, 255, 255, 255, 255, 255, 255, 255, 255, 255,
                       223, 241, 252])


def _find(data: bytes, anchor: bytes, what: str, span: int) -> int:
    """Offset of the unique ``anchor``; the library may carry the same
    table twice (decoder + encoder sides) — identical copies are fine,
    diverging ones are not."""
    i = data.find(anchor)
    if i < 0:
        raise SystemExit(f"anchor for {what} not found in {LIB}")
    j = data.find(anchor, i + 1)
    while j >= 0:
        if data[j:j + span] != data[i:i + span]:
            raise SystemExit(f"anchor for {what} is ambiguous in {LIB}")
        j = data.find(anchor, j + 1)
    return i


def extract(path: str = LIB):
    data = open(path, "rb").read()

    # --- key-frame B_PRED sub-mode probs: [above 10][left 10][9].
    # libwebp's internal enum orders the diagonal modes RD,VR,LD at
    # indices 4,5,6 where the RFC orders LD,RD,VR — permute rows and
    # columns to RFC numbering (found empirically: without it, all-LD/
    # RD/VR frames desynchronize libwebp while the other 7 mode
    # families cross-decode exactly; with it, 10/10 are bit-exact).
    b = _find(data, BMODE_ANCHOR, "kf_bmode_probs", 900)
    flat = data[b:b + 900]
    assert all(1 <= v <= 255 for v in flat), "invalid prob in bmode table"
    lw = {0: 0, 1: 1, 2: 2, 3: 3, 4: 6, 5: 4, 6: 5, 7: 7, 8: 8, 9: 9}
    raw = [
        [list(flat[(a * 10 + l) * 9:(a * 10 + l) * 9 + 9]) for l in range(10)]
        for a in range(10)
    ]
    bmode = [[raw[lw[a]][lw[l]] for l in range(10)] for a in range(10)]

    # --- default coefficient probs: RFC [4][8][3][11]; libwebp elides
    # the all-128 [0][7] row, so re-insert it (validated below)
    c = _find(data, COEFF_ANCHOR, "default_coeff_probs", 1023)
    rows = [data[c + i * 33:c + (i + 1) * 33] for i in range(31)]
    rows = rows[:7] + [bytes([128] * 33)] + rows[7:]
    coeff = [
        [
            [list(rows[t * 8 + bd][cx * 11:(cx + 1) * 11]) for cx in range(3)]
            for bd in range(8)
        ]
        for t in range(4)
    ]
    assert all(v == 128 for cx in coeff[0][7] for v in cx), "[0][7] not 128s"
    assert all(v == 128 for cx in coeff[2][7] for v in cx), "[2][7] not 128s"

    # --- coefficient-prob update flags: contiguous [4][8][3][11]
    # anchor row is [0][1][0] = flat offset 33 into the table
    u = _find(data, UPDATE_ANCHOR, "coeff_update_probs", 1023) - 33
    uf = data[u:u + 1056]
    update = [
        [
            [
                list(uf[(t * 8 + bd) * 33 + cx * 11:(t * 8 + bd) * 33 + cx * 11 + 11])
                for cx in range(3)
            ]
            for bd in range(8)
        ]
        for t in range(4)
    ]
    assert all(v == 255 for cx in update[0][0] for v in cx)
    return bmode, coeff, update


def _fmt(name: str, tbl, depth: int) -> str:
    out = [f"{name} = ["]
    if depth == 3:  # [10][10][9]
        for blk in tbl:
            out.append("  [")
            for row in blk:
                out.append("    " + repr(row) + ",")
            out.append("  ],")
    else:  # [4][8][3][11]
        for t in tbl:
            out.append("  [")
            for band in t:
                out.append("    [" + ",".join(repr(cx) for cx in band) + "],")
            out.append("  ],")
    out.append("]")
    return "\n".join(out)


def main() -> None:
    bmode, coeff, update = extract()
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "schema_fantasy_spark", "ops", "vp8_tables.py",
    )
    with open(dest, "w") as fh:
        fh.write(
            '"""GENERATED by tools/gen_vp8_tables.py — do not edit.\n\n'
            "Normative VP8 probability tables (RFC 6386 11.4/13.4/13.5),\n"
            "extracted byte-exact from the system libwebp reference codec\n"
            f"({LIB}) by content anchor; see the generator docstring for\n"
            'the layout/validation notes."""\n\n'
        )
        fh.write("# key-frame intra sub-mode probs [above][left][9]\n")
        fh.write(_fmt("KF_BMODE_PROBS", bmode, 3) + "\n\n")
        fh.write("# default coefficient probs [block type][band][ctx][11]\n")
        fh.write(_fmt("DEFAULT_COEFF_PROBS", coeff, 4) + "\n\n")
        fh.write("# coefficient-prob update flags [block type][band][ctx][11]\n")
        fh.write(_fmt("COEFF_UPDATE_PROBS", update, 4) + "\n")
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
