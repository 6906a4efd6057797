#!/usr/bin/env python
"""Recover the T.81 QM-coder state-transition table (Table D.3) from
the system libjpeg shared object and emit it as
``playwrightcrawler_ray/imaging/jpeg_aritab.py``.

The 113-entry probability-estimation state machine (Qe value,
Next_Index_LPS, Next_Index_MPS, Switch_MPS per state, plus the fixed
non-adaptive bin at index 113) is PUBLIC SPECIFICATION DATA — ITU-T
T.81 Table D.3 / ISO 10918-1 — not creative content. libjpeg stores
it packed one long per state: ``Qe << 16 | NMPS << 8 | SWITCH << 7 |
NLPS``. We locate the table by its first packed entry, validate every
row against hard spec anchors and structural invariants, and write a
plain-tuple module.

Same provenance pattern as scripts/extract_vp8_tables.py (RFC 6386
tables from libwebp .rodata).
"""
from __future__ import annotations

import ctypes.util
import struct
import sys

# T.81 Table D.3 anchors: (state, Qe, NLPS, NMPS, SWITCH)
ANCHORS = [
    (0, 0x5A1D, 1, 1, 1),
    (1, 0x2586, 14, 2, 0),
    (2, 0x1114, 16, 3, 0),
    (3, 0x080B, 18, 4, 0),
    (4, 0x03D8, 20, 5, 0),
    (5, 0x01DA, 23, 6, 0),
    (113, 0x5A1D, 113, 113, 0),  # fixed (non-adaptive) bin
]


def find_table(blob: bytes) -> list[tuple[int, int, int, int]]:
    first = ANCHORS[0]
    packed0 = (first[1] << 16) | (first[3] << 8) | (first[4] << 7) | first[2]
    for width, fmt in ((8, "<114q"), (4, "<114i")):
        needle = struct.pack(fmt[:1] + fmt[-1], packed0)
        start = 0
        while True:
            off = blob.find(needle, start)
            if off < 0:
                break
            start = off + 1
            try:
                vals = struct.unpack_from(fmt, blob, off)
            except struct.error:
                continue
            rows = [((v >> 16) & 0xFFFF, v & 0x7F, (v >> 8) & 0x7F,
                     (v >> 7) & 1) for v in vals]
            if validate(rows):
                return rows
    raise SystemExit("jpeg_aritab not found in the shared object")


def validate(rows) -> bool:
    if len(rows) != 114:
        return False
    for st, qe, nl, nm, sw in ANCHORS:
        if rows[st] != (qe, nl, nm, sw):
            return False
    for qe, nl, nm, sw in rows:
        if not (0 < qe < 0x8000 and nl <= 113 and nm <= 113):
            return False
    # the adaptive chain must be connected: every state reachable from 0
    seen, todo = set(), [0]
    while todo:
        s = todo.pop()
        if s in seen:
            continue
        seen.add(s)
        todo += [rows[s][1], rows[s][2]]
    return len(seen) >= 113


def main() -> None:
    libpath = None
    for cand in ("/lib/x86_64-linux-gnu/libjpeg.so.62.3.0",
                 ctypes.util.find_library("jpeg")):
        if cand:
            libpath = cand
            break
    blob = open(libpath, "rb").read()
    rows = find_table(blob)
    out = sys.argv[1] if len(sys.argv) > 1 else (
        "playwrightcrawler_ray/imaging/jpeg_aritab.py")
    with open(out, "w") as f:
        f.write('"""T.81 Table D.3 — QM-coder probability estimation '
                'state machine.\n\nPublic specification constants '
                '(ITU-T T.81 / ISO 10918-1), recovered from the\n'
                'system libjpeg by scripts/extract_jpeg_aritab.py and '
                'validated against\nspec anchors. Each row: '
                '(Qe, Next_Index_LPS, Next_Index_MPS, Switch_MPS).\n'
                'Index 113 is the fixed equiprobable bin (sign bits '
                'etc.).\n"""\n\nQM_STATES = (\n')
        for r in rows:
            f.write(f"    (0x{r[0]:04X}, {r[1]}, {r[2]}, {r[3]}),\n")
        f.write(")\n")
    print(f"wrote {out}: {len(rows)} states, anchors OK")


if __name__ == "__main__":
    main()
