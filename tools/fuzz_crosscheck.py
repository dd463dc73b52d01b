#!/usr/bin/env python3
"""Cross-validate our WRITERS against pandas' independent parsers.

`graft.tools.FuzzFixtures` writes fuzz .dta/.sas7bdat files with our
writers plus our scan's parquet dump of each. This script reads the
binaries with pandas (pure-python readers, no libreadstat) and compares
cell-by-cell against our dump using corpus_crosscheck's value-driven
comparator. A symmetric writer+reader bug round-trips green in
FuzzRoundTripSpec but cannot fool an independent parser.

Usage:
    sbt "runMain graft.tools.FuzzFixtures"           # writes /tmp/graft_fuzzfix
    python3 tools/fuzz_crosscheck.py [/tmp/graft_fuzzfix]
"""
import glob
import os
import sys

import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from corpus_crosscheck import same  # noqa: E402


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_fuzzfix"
    files = sorted(glob.glob(os.path.join(root, "files", "*")))
    assert files, f"no fuzz files under {root} — run graft.tools.FuzzFixtures first"
    total_cells = 0
    bad = 0
    for f in files:
        name = os.path.splitext(os.path.basename(f))[0]
        ours = pq.read_table(os.path.join(root, "parquet", f"{name}.parquet")).to_pandas()
        if f.endswith(".dta"):
            theirs = pd.read_stata(f, convert_categoricals=False)
        else:
            theirs = pd.read_sas(f)
        assert len(ours) == len(theirs), f"{name}: {len(ours)} vs {len(theirs)} rows"
        assert list(ours.columns) == list(theirs.columns), \
            f"{name}: columns {list(ours.columns)} vs {list(theirs.columns)}"
        for col in ours.columns:
            a_vals, b_vals = ours[col].tolist(), theirs[col].tolist()
            for i, (a, b) in enumerate(zip(a_vals, b_vals)):
                total_cells += 1
                if not same(a, b):
                    bad += 1
                    if bad <= 20:
                        print(f"MISMATCH {name} row {i} col {col}: ours={a!r} pandas={b!r}")
    print(f"{len(files)} files, {total_cells} cells, {bad} mismatches")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
