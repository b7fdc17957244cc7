#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify's parquet
outputs, run oracle_sql.json through DuckDB on the same sf dir, compare
rows (columns sorted by name) exactly and with float tolerance.

Usage: check_correctness.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
con.execute("SET threads TO 8")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                rr.append(("f", v))
            elif hasattr(v, "isoformat"):
                rr.append(("t", v.isoformat()))
            else:
                rr.append(("o", v))
        out.append(tuple(rr))
    return out

def eq(a, b):
    if len(a) != len(b):
        return False, "row count"
    for i, (ra, rb) in enumerate(zip(a, b)):
        if len(ra) != len(rb):
            return False, f"row {i} width"
        for (ta, va), (tb, vb) in zip(ra, rb):
            if ta == "f" or tb == "f":
                fa, fb = float(va), float(vb)
                if fa != fb and not math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9):
                    return False, f"row {i}: {va!r} != {vb!r}"
            elif va != vb:
                return False, f"row {i}: {va!r} != {vb!r}"
    return True, ""

fails = 0
for name in sorted(oracle):
    pq = os.path.join(outdir, name)
    if not glob.glob(pq + "/*.parquet"):
        print(f"{name}: MISSING spark output"); fails += 1; continue
    sp = con.execute(f"SELECT * FROM read_parquet('{pq}/*.parquet')")
    spc = [d[0] for d in sp.description]; spr = sp.fetchall()
    try:
        du = con.execute(oracle[name])
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR {e}"); fails += 1; continue
    duc = [d[0] for d in du.description]; dur = du.fetchall()
    if sorted(spc) != sorted(duc):
        print(f"{name}: COLUMN MISMATCH spark={sorted(spc)} duck={sorted(duc)}")
        fails += 1; continue
    exact_same = canon(spr, spc) == canon(dur, duc)
    ok, why = eq(canon(spr, spc), canon(dur, duc))
    if ok:
        print(f"{name}: OK rows={len(spr)} exact={'yes' if exact_same else 'NO (tol only)'}")
    else:
        print(f"{name}: FAIL {why} (spark {len(spr)} rows, duck {len(dur)} rows)")
        fails += 1
sys.exit(1 if fails else 0)
