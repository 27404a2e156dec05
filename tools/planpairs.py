#!/usr/bin/env python3
"""Classify before/after plan-dump pairs (r19 verdict item 8).

Usage: python3 tools/planpairs.py <dir> <suffixA> <suffixB> [--list <class>]

For every <name>_<suffixA>.txt with a matching <name>_<suffixB>.txt in
<dir>, normalizes volatile identifiers (expression IDs #123, plan_id=N,
codegen ids, file-listing memory addresses) and classifies the pair:

  identical   — byte-identical after normalization
  cast-swap   — differs ONLY on lines mentioning the double→decimal
                quantization (fast_double_to_decimal vs cast(... as
                decimal...)); the r19 FastDoubleToDecimal evidence class
  structural  — anything else (real plan-shape difference)

Prints a per-class count and per-name classification, so the registry
number ("N plans swap the cast node") is derived mechanically from the
committed dumps instead of asserted.
"""
import re
import sys
import glob
import os


def normalize(text: str):
    t = re.sub(r"#\d+[L]?", "#x", text)
    t = re.sub(r"plan_id=\d+", "plan_id=N", t)
    t = re.sub(r"\[codegen id : \d+\]", "[codegen id : N]", t)
    t = re.sub(r"@[0-9a-f]{6,}", "@addr", t)
    t = re.sub(r"Lambda\$\d+/0x[0-9a-f]+", "Lambda$N/0xN", t)
    t = re.sub(r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}",
               "UUID", t)
    t = re.sub(r"MapPartitionsRDD\[\d+\]", "MapPartitionsRDD[N]", t)
    t = re.sub(r"localCheckpoint at \S+:\d+", "localCheckpoint at SITE", t)
    return t.splitlines()


# fast_double_to_decimal on one side, cast(<expr> as decimal(p,s)) on the
# other; <expr> may itself contain parens, so match on the "as decimal"
# suffix rather than trying to balance them
CAST_RE = re.compile(
    r"fast_double_to_decimal|as decimal\(\d+,\d+\)", re.I)


def classify(a_lines, b_lines):
    if a_lines == b_lines:
        return "identical"
    if len(a_lines) != len(b_lines):
        return "structural"
    for la, lb in zip(a_lines, b_lines):
        if la == lb:
            continue
        if not (CAST_RE.search(la) and CAST_RE.search(lb)):
            return "structural"
    return "cast-swap"


def main():
    d, sa, sb = sys.argv[1], sys.argv[2], sys.argv[3]
    want = sys.argv[5] if len(sys.argv) > 5 and sys.argv[4] == "--list" else None
    counts = {"identical": 0, "cast-swap": 0, "structural": 0, "missing": 0}
    rows = []
    for fa in sorted(glob.glob(os.path.join(d, f"*_{sa}.txt"))):
        name = os.path.basename(fa)[: -len(f"_{sa}.txt")]
        fb = os.path.join(d, f"{name}_{sb}.txt")
        if not os.path.exists(fb):
            counts["missing"] += 1
            rows.append((name, "missing"))
            continue
        cls = classify(normalize(open(fa).read()), normalize(open(fb).read()))
        counts[cls] += 1
        rows.append((name, cls))
    for name, cls in rows:
        if want is None or cls == want:
            print(f"{cls:10s} {name}")
    print(f"\ntotal={len(rows)} " +
          " ".join(f"{k}={v}" for k, v in counts.items()))


if __name__ == "__main__":
    main()
