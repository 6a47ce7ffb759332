#!/usr/bin/env python3
"""Extract normative H.266 constant tables from the reference sources.

The values extracted here are *normative constants* defined by ITU-T H.266
(CABAC context initialisation values: spec tables 51..124; transform
matrices: spec 8.7.4.x; etc.).  They cannot differ between conforming
implementations.  We extract them mechanically from the reference tree
(`/root/reference/libavcodec/vvc/vvc_cabac.c:111`,
`/root/reference/libavcodec/vvc/vvc_data.c`) rather than hand-retyping
thousands of digits, and emit generated Python modules under
`ffmpeg_tpu/models/vvc/`.

Run:  python tools/extract_ref_tables.py
"""
from __future__ import annotations

import re
import sys
from pathlib import Path

REF = Path("/root/reference/libavcodec/vvc")
OUT = Path(__file__).resolve().parent.parent / "ffmpeg_tpu" / "models" / "vvc"

HEADER = '''"""GENERATED FILE — do not edit by hand.

Normative H.266 constants, extracted by tools/extract_ref_tables.py from the
reference implementation (cross-check: {src}).  These are spec-defined tables
(ITU-T H.266); every conforming codec uses identical values.
"""
import numpy as np

'''


def strip_comments(text: str) -> str:
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    text = re.sub(r"//[^\n]*", " ", text)
    return text


def parse_enum(src: str, enum_name: str) -> dict[str, int]:
    m = re.search(rf"enum {enum_name}\s*\{{(.*?)\}};", src, flags=re.S)
    assert m, enum_name
    body = strip_comments(m.group(1))
    values: dict[str, int] = {}
    prev = -1
    for entry in body.split(","):
        entry = entry.strip()
        if not entry:
            continue
        if "=" in entry:
            name, expr = (p.strip() for p in entry.split("=", 1))
            val = eval(expr, {}, dict(values))  # noqa: S307 - trusted local parse
        else:
            name, val = entry, prev + 1
        values[name] = val
        prev = val
    return values


def parse_int_array_body(body: str, subs: dict[str, int]) -> list:
    """Parse a C brace initialiser body into a nested python list."""
    body = strip_comments(body)
    for k, v in subs.items():
        body = re.sub(rf"\b{k}\b", str(v), body)
    # tokenize braces / ints
    pos = 0

    def parse_group(s: str, i: int):
        out = []
        num = ""
        while i < len(s):
            c = s[i]
            if c == "{":
                sub, i = parse_group(s, i + 1)
                out.append(sub)
            elif c == "}":
                if num.strip():
                    out.append(int(num, 0))
                return out, i + 1
            elif c == ",":
                if num.strip():
                    out.append(int(num, 0))
                num = ""
                i += 1
                continue
            elif c.isspace():
                pass
            else:
                num += c
            i += 1
        if num.strip():
            out.append(int(num, 0))
        return out, i

    group, _ = parse_group(body, 0)
    return group


def extract_c_array(src: str, decl_regex: str, subs: dict[str, int] | None = None):
    m = re.search(decl_regex + r"\s*=\s*\{(.*?)\};", src, flags=re.S)
    assert m, decl_regex
    return parse_int_array_body(m.group(1), subs or {})


def emit_cabac_tables() -> None:
    src = (REF / "vvc_cabac.c").read_text()
    enum = parse_enum(src, "SyntaxElement")
    n_ctx = enum.pop("SYNTAX_ELEMENT_LAST")
    table = extract_c_array(
        src, r"static const uint8_t init_values\[4\]\[SYNTAX_ELEMENT_LAST\]",
        subs={"CNU": "35"} and {"CNU": 35},
    )
    assert len(table) == 4 and all(len(row) == n_ctx for row in table), (
        len(table), [len(r) for r in table], n_ctx)

    out = [HEADER.format(src="libavcodec/vvc/vvc_cabac.c:32-810")]
    out.append(f"NUM_CONTEXTS = {n_ctx}\n\n")
    out.append("# Base context index for each syntax element (spec ctxTable layout).\n")
    out.append("CTX = {\n")
    for name, val in sorted(enum.items(), key=lambda kv: kv[1]):
        out.append(f"    {name!r}: {val},\n")
    out.append("}\n\n")
    out.append(
        "# INIT_VALUES[init_type][ctx] for init_type 0..2; row 3 holds the\n"
        "# rate shift indices (spec 9.3.2.2 shiftIdx).\n"
    )
    out.append("INIT_VALUES = np.array([\n")
    for row in table:
        out.append("    [" + ",".join(str(v) for v in row) + "],\n")
    out.append("], dtype=np.uint8)\n")
    (OUT / "cabac_tables.py").write_text("".join(out))
    print(f"wrote {OUT/'cabac_tables.py'}: {n_ctx} contexts, {len(enum)} elements")


def emit_cabac_tables_cc() -> None:
    """Emit the same tables as a C++ include for the native parser."""
    src = (REF / "vvc_cabac.c").read_text()
    enum = parse_enum(src, "SyntaxElement")
    n_ctx = enum.pop("SYNTAX_ELEMENT_LAST")
    table = extract_c_array(
        src, r"static const uint8_t init_values\[4\]\[SYNTAX_ELEMENT_LAST\]",
        subs={"CNU": 35})
    native = Path(__file__).resolve().parent.parent / "ffmpeg_tpu" / "native"
    native.mkdir(parents=True, exist_ok=True)
    out = ["// GENERATED by tools/extract_ref_tables.py — normative H.266\n"
           "// CABAC context-init constants (cross-check: vvc_cabac.c:32-810).\n",
           "#pragma once\n#include <cstdint>\n\n",
           "namespace vvc {\n",
           f"constexpr int kNumContexts = {n_ctx};\n\n",
           "enum CtxId {\n"]
    for name, val in sorted(enum.items(), key=lambda kv: kv[1]):
        out.append(f"  {name} = {val},\n")
    out.append("};\n\n")
    out.append("constexpr uint8_t kInitValues[4][kNumContexts] = {\n")
    for row in table:
        out.append("  {" + ",".join(str(v) for v in row) + "},\n")
    out.append("};\n}  // namespace vvc\n")
    (native / "cabac_tables.h").write_text("".join(out))
    print(f"wrote {native/'cabac_tables.h'}")


if __name__ == "__main__":
    OUT.mkdir(parents=True, exist_ok=True)
    emit_cabac_tables()
    emit_cabac_tables_cc()
    sys.exit(0)
