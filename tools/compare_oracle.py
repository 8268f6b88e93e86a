#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, load our Verify parquet output, sort
columns by name, canonicalize, and diff. Usage:
    python3 tools/compare_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(f)[:-len(".parquet")]
    # fixture tables are single files; Spark-written tables (e.g. the
    # ScaleUp sf1 replica) are DIRECTORIES of part files
    pat = os.path.join(f, "*.parquet") if os.path.isdir(f) else f
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{pat}'")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def canon(df, other):
    """Sort columns; coerce object->numeric ONLY when BOTH sides are object.
    A one-sided coercion (e.g. Spark DECIMAL objects vs DuckDB float64)
    hides exactly the representation diffs the driver's stricter hash
    catches — Decimal('4033742.8100') stringifies differently from float
    4033742.81. Those must surface as dtype failures here."""
    df = df[sorted(df.columns)].copy()
    other = other[sorted(other.columns)]
    for c in df.columns:
        if df[c].dtype == object and c in other.columns and other[c].dtype == object:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
    return df.reset_index(drop=True)


def dtype_mismatch(w, g):
    """Columns whose dtype CLASS differs: object-vs-numeric (e.g. Decimal),
    and float-vs-integer. The driver's hash is representation-sensitive —
    an oracle DOUBLE 1.0 against a Spark BIGINT 1 passes value equality
    here but flips the driver hash ('1.0' vs '1'), the same class the
    bit-faithful float compare exists to close."""
    bad = []
    def kind(s):
        if s.dtype == object:
            return "obj"
        if s.dtype.kind == "f":
            return "float"
        if s.dtype.kind in "iu":
            return "int"
        return s.dtype.kind
    for c in w.columns:
        if kind(w[c]) != kind(g[c]):
            bad.append(f"{c}: oracle {w[c].dtype} vs spark {g[c].dtype}")
    return bad

fails = []
for name in sorted(oracle):
    sql = oracle[name]
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    pdir = os.path.join(outdir, name)
    files = glob.glob(os.path.join(pdir, "*.parquet"))
    if not files:
        fails.append((name, "no spark output"))
        continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
    w, g = canon(want, got), canon(got, want)
    if list(w.columns) != list(g.columns):
        fails.append((name, f"schema: oracle {list(w.columns)} vs spark {list(g.columns)}"))
        continue
    mism = dtype_mismatch(w, g)
    if mism:
        fails.append((name, "dtype mismatch (driver hash would differ): " + "; ".join(mism)))
        continue
    if len(w) != len(g):
        fails.append((name, f"rows: oracle {len(w)} vs spark {len(g)}"))
        continue
    # BIT-FAITHFUL compare (VERDICT r12 #2): the driver's hash is
    # bit/string-sensitive, so pandas value equality is NOT enough —
    # -0.0 == 0.0 and NaN-is-NaN both pass assert_frame_equal while the
    # driver hash flips (r12 failed 5 PQ queries on exactly the signed
    # zero of a rounded self-match distance). Float columns compare as
    # raw uint bit patterns; everything else compares exactly.
    neq_cols = {}
    import numpy as np
    for c in w.columns:
        wv, gv = w[c], g[c]
        if wv.dtype.kind == "f" and gv.dtype.kind == "f":
            wb = wv.astype("float64").to_numpy().view("uint64")
            gb = gv.astype("float64").to_numpy().view("uint64")
            bad = wb != gb
        else:
            try:
                bad = ((wv != gv) & ~(wv.isna() & gv.isna())).to_numpy()
            except (ValueError, TypeError):
                # list/array-valued cells: elementwise != is ambiguous —
                # compare canonical string forms instead
                bad = (wv.map(lambda x: str(list(x)) if hasattr(x, "__len__")
                              and not isinstance(x, str) else str(x)).to_numpy()
                       != gv.map(lambda x: str(list(x)) if hasattr(x, "__len__")
                                 and not isinstance(x, str) else str(x)).to_numpy())
        if bad.any():
            neq_cols[c] = bad
    if not neq_cols:
        print(f"OK    {name} ({len(w)} rows)")
    else:
        fails.append((name, "bit-level mismatch in columns: " +
                      ", ".join(sorted(neq_cols))))
        bad = np.zeros(len(w), dtype=bool)
        for m in neq_cols.values():
            bad |= m
        print(f"--- {name} first diffs (bit-faithful):")
        print(pd.concat([w[bad].head(3).add_suffix("_oracle"),
                         g[bad].head(3).add_suffix("_spark")], axis=1))
for name, why in fails:
    print(f"FAIL  {name}: {why}")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle queries match")
sys.exit(1 if fails else 0)
