#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Driver-faithful mode (the default verdict): both sides go through PANDAS —
the Spark parquet via pandas.read_parquet, the oracle via DuckDB's .df() —
columns sorted by name, rows sorted by all columns, then compared with a
DTYPE-SENSITIVE hash, exactly like the driver's harness. This is what
caught us in round 2: DuckDB sum(BIGINT) -> HUGEINT -> pandas float64 vs
Spark's int64 fails the hash even when every value is equal, and a raw
array column crashes pandas.sort_values. A gate is only PASS here if it
would be green in CORRECTNESS_r{N}.json.

A value-level diff (the old fetchall+tolerance path) still runs as a
DIAGNOSTIC so a dtype-only failure is labeled as such.

Usage: check_correctness.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os, math
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
con.execute("SET threads TO 8")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))


def canonical(df):
    """Mimic the driver: sorted column order, row order by all columns.
    Raises (like the driver) if a cell is unsortable (ndarray/list/dict)."""
    df = df[sorted(df.columns)]
    # Normalize datetimes to ns so unit (us vs ns) differences between the
    # parquet reader and DuckDB's .df() don't read as dtype skew; genuine
    # int-vs-float skew is preserved.
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[ns]")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def nonscalar_cols(df):
    bad = []
    for c in df.columns:
        s = df[c].dropna()
        if len(s) and isinstance(s.iloc[0], (np.ndarray, list, dict, tuple)):
            bad.append(c)
    return bad


def value_diff(spr, spc, dur, duc):
    """Old tolerant value-level compare, kept as a diagnostic label."""
    order_s = sorted(range(len(spc)), key=lambda i: spc[i])
    order_d = sorted(range(len(duc)), key=lambda i: duc[i])
    def canon(rows, order):
        out = []
        for r in rows:
            rr = []
            for i in order:
                v = r[i]
                if hasattr(v, "isoformat"):
                    rr.append(("t", v.isoformat()))
                elif isinstance(v, float):
                    rr.append(("f", v))
                else:
                    rr.append(("o", v))
            out.append(tuple(rr))
        return sorted(out, key=repr)
    a, b = canon(spr, order_s), canon(dur, order_d)
    if len(a) != len(b):
        return f"row count {len(a)} vs {len(b)}"
    for i, (ra, rb) in enumerate(zip(a, b)):
        for (ta, va), (tb, vb) in zip(ra, rb):
            if ta == "f" or tb == "f":
                fa, fb = float(va), float(vb)
                if fa != fb and not math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9):
                    return f"row {i}: {va!r} != {vb!r}"
            elif va != vb:
                return f"row {i}: {va!r} != {vb!r}"
    return None


fails = 0
for name in sorted(oracle):
    pq = os.path.join(outdir, name)
    files = glob.glob(pq + "/*.parquet")
    if not files:
        print(f"{name}: MISSING spark output"); fails += 1; continue
    try:
        sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    except Exception as e:
        print(f"{name}: SPARK PARQUET READ ERROR {e}"); fails += 1; continue
    try:
        odf = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR {e}"); fails += 1; continue

    if sorted(sdf.columns) != sorted(odf.columns):
        print(f"{name}: COLUMN MISMATCH spark={sorted(sdf.columns)} "
              f"duck={sorted(odf.columns)}")
        fails += 1; continue

    bad = nonscalar_cols(sdf) + nonscalar_cols(odf)
    if bad:
        print(f"{name}: NON-SCALAR COLUMNS {sorted(set(bad))} "
              f"(driver harness crashes sorting these)")
        fails += 1; continue

    try:
        cs, co = canonical(sdf), canonical(odf)
    except Exception as e:
        print(f"{name}: DRIVER SORT CRASH {type(e).__name__}: {e}")
        fails += 1; continue

    if len(cs) != len(co):
        print(f"{name}: FAIL rows spark={len(cs)} duck={len(co)}")
        fails += 1; continue

    # Round-2 evidence: the driver's hash tolerates integer-WIDTH skew
    # (w5 int32-vs-int64 and a12 int8-vs-int64 both passed) but fails on
    # KIND skew (every HUGEINT->float64-vs-int64 gate was red). Compare
    # numpy dtype kind, not exact width.
    dtype_skew = {c: (str(cs[c].dtype), str(co[c].dtype))
                  for c in cs.columns if cs[c].dtype.kind != co[c].dtype.kind}
    if dtype_skew:
        # Label whether values agree so the fix target is obvious.
        sp = con.execute(f"SELECT * FROM read_parquet('{pq}/*.parquet')")
        spc = [d[0] for d in sp.description]; spr = sp.fetchall()
        du = con.execute(oracle[name])
        duc = [d[0] for d in du.description]; dur = du.fetchall()
        vd = value_diff(spr, spc, dur, duc)
        tag = "values identical — dtype only" if vd is None else f"values differ: {vd}"
        print(f"{name}: DTYPE SKEW {dtype_skew} ({tag})")
        fails += 1; continue

    eq = True
    why = ""
    for c in cs.columns:
        a, b = cs[c], co[c]
        if a.dtype.kind in "iu" and a.dtype != b.dtype:
            a, b = a.astype("int64"), b.astype("int64")
        if pd.api.types.is_float_dtype(a.dtype):
            same = ((a.isna() & b.isna()) | (a == b)).all()
        else:
            same = a.equals(b)
        if not same:
            eq = False
            m = (a != b) & ~(a.isna() & b.isna())
            i = int(np.argmax(m.values)) if m.any() else 0
            why = f"col {c} row {i}: {a.iloc[i]!r} != {b.iloc[i]!r}"
            break
    if eq:
        print(f"{name}: OK rows={len(cs)} exact=yes")
    else:
        print(f"{name}: FAIL {why}")
        fails += 1

print(f"{'FAIL' if fails else 'PASS'}: {len(oracle) - fails}/{len(oracle)} gates")
sys.exit(1 if fails else 0)
