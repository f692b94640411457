#!/usr/bin/env python
"""Extract the H3 constant tables from a public h3 checkout into the
JSON sidecar `osmptparser_spark.functions.h3compat` consumes.

Usage:
    python tools/extract_h3_tables.py /path/to/h3/src/h3lib/lib \
        > h3_tables.json
    H3_TABLES_JSON=h3_tables.json python ...   # arms h3compat encode

Reads `faceijk.c` (faceCenterGeo, faceAxesAzRadsCII) and `baseCells.c`
(baseCellData, faceIjkBaseCells) with regex parsers tolerant of
comments and whitespace. This environment has no network and no h3
wheel, so the extraction cannot run here — it exists so that on any
machine WITH the public repo the adapter becomes true Uber-H3 with one
command. The parser is unit-tested against synthetic snippets in the
same C layout (tests/test_round5.py::TestH3TableExtraction).
"""

from __future__ import annotations

import json
import os
import re
import sys


def _strip_comments(text: str) -> str:
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    return re.sub(r"//[^\n]*", " ", text)


def _braced_block(text: str, name: str) -> str:
    """The {...} initializer of `... name[...] = { ... };`."""
    m = re.search(re.escape(name) + r"\s*\[[^]]*\]\s*(\[[^]]*\]\s*)*=\s*\{",
                  text)
    if not m:
        raise ValueError(f"table {name} not found")
    start = text.index("{", m.start())
    depth, i = 0, start
    while i < len(text):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                return text[start + 1:i]
        i += 1
    raise ValueError(f"unterminated initializer for {name}")


def _numbers(block: str) -> list[float]:
    return [float(x) for x in re.findall(r"-?\d+\.?\d*(?:[eE][+-]?\d+)?", block)]


def parse_face_center_geo(text: str) -> list[list[float]]:
    nums = _numbers(_braced_block(_strip_comments(text), "faceCenterGeo"))
    if len(nums) != 40:
        raise ValueError(f"faceCenterGeo: expected 40 numbers, got {len(nums)}")
    return [[nums[2 * i], nums[2 * i + 1]] for i in range(20)]


def parse_face_axes_az(text: str) -> list[float]:
    nums = _numbers(_braced_block(_strip_comments(text), "faceAxesAzRadsCII"))
    if len(nums) != 60:
        raise ValueError(f"faceAxesAzRadsCII: expected 60 numbers, got {len(nums)}")
    return [nums[3 * i] for i in range(20)]  # class II i-axis azimuth


def parse_base_cell_data(text: str) -> list[dict]:
    nums = _numbers(_braced_block(_strip_comments(text), "baseCellData"))
    # each entry: {{face, {i, j, k}}, isPentagon, {off1, off2}} = 7 numbers
    if len(nums) != 122 * 7:
        raise ValueError(f"baseCellData: expected 854 numbers, got {len(nums)}")
    out = []
    for c in range(122):
        f, i, j, k, pent, o1, o2 = (int(v) for v in nums[7 * c:7 * c + 7])
        out.append({
            "face": f, "ijk": [i, j, k], "pent": pent,
            "cw_offset": [o for o in (o1, o2) if o >= 0],
        })
    return out


def parse_face_ijk_base_cells(text: str) -> dict[str, list[int]]:
    nums = _numbers(_braced_block(_strip_comments(text), "faceIjkBaseCells"))
    # 20 faces x 3 x 3 x 3 x {baseCell, ccwRot60} = 1080 numbers
    if len(nums) != 1080:
        raise ValueError(
            f"faceIjkBaseCells: expected 1080 numbers, got {len(nums)}"
        )
    out = {}
    idx = 0
    for face in range(20):
        for i in range(3):
            for j in range(3):
                for k in range(3):
                    bc, rot = int(nums[idx]), int(nums[idx + 1])
                    idx += 2
                    out[f"{face},{i},{j},{k}"] = [bc, rot]
    return out


def extract(lib_dir: str) -> dict:
    with open(os.path.join(lib_dir, "faceijk.c")) as f:
        faceijk = f.read()
    with open(os.path.join(lib_dir, "baseCells.c")) as f:
        basecells = f.read()
    return {
        "face_center_geo": parse_face_center_geo(faceijk),
        "face_axes_az_i": parse_face_axes_az(faceijk),
        "base_cells": parse_base_cell_data(basecells),
        "face_ijk_base_cells": parse_face_ijk_base_cells(basecells),
    }


if __name__ == "__main__":
    if len(sys.argv) != 2:
        sys.exit(__doc__)
    json.dump(extract(sys.argv[1]), sys.stdout, indent=1)
    print()
