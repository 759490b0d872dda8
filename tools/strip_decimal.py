#!/usr/bin/env python3
"""One-shot codemod: remove DECIMAL quantization from oracle'd query outputs.

Why: the driver's hash compare canonicalizes our parquet DECIMAL columns and
DuckDB's DECIMAL results differently (trailing-zero string forms / object
dtype), so numerically-equal results still hash-mismatch. Keeping outputs as
DOUBLE on both sides (round(x, k) without the decimal cast) makes both sides
bit-identical doubles, which any value-hash agrees on.

Transforms, across src/main/scala/**/*.scala:
 1. SQL strings:  CAST(<expr> AS DECIMAL(p,s))  ->  <expr>     (balanced-paren)
 2. Scala API:    .cast(DecimalType(p, s))      ->  (removed)
 3. Scala API:    .cast("decimal(p,s)")         ->  (removed)
"""
import re, glob, sys

CAST_OPEN = re.compile(r"CAST\(", re.IGNORECASE)
AS_DEC_TAIL = re.compile(r"\s+AS\s+DECIMAL\(\d+\s*,\s*\d+\)$", re.IGNORECASE)


def strip_sql_casts(text):
    out, changed = text, True
    while changed:
        changed = False
        for m in CAST_OPEN.finditer(out):
            start = m.start()
            i, depth = m.end(), 1
            while i < len(out) and depth:
                if out[i] == '(':
                    depth += 1
                elif out[i] == ')':
                    depth -= 1
                i += 1
            if depth:
                continue
            inner = out[m.end():i - 1]
            m2 = AS_DEC_TAIL.search(inner)
            if not m2:
                continue
            expr = inner[:m2.start()]
            out = out[:start] + expr + out[i:]
            changed = True
            break
    return out


def main():
    files = glob.glob("src/main/scala/**/*.scala", recursive=True)
    for f in files:
        with open(f) as fh:
            t = fh.read()
        t2 = strip_sql_casts(t)
        t2 = re.sub(r"\.cast\(DecimalType\(\d+,\s*\d+\)\)", "", t2)
        t2 = re.sub(r"\.cast\(\"decimal\(\d+,\s*\d+\)\"\)", "", t2)
        if t2 != t:
            with open(f, "w") as fh:
                fh.write(t2)
            print("rewrote", f)


if __name__ == "__main__":
    sys.exit(main())
