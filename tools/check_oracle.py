#!/usr/bin/env python3
"""Dev-side oracle pre-validation (mimics the driver's t2 gate).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query...]

Loads each <verifyOutDir>/<name> parquet (Spark output), runs the
matching oracle SQL from oracle_sql.json in DuckDB over views of the
sfDir parquet tables, sorts columns by name and rows by all values,
and compares cell-by-cell (exact, plus a float-tolerance report so
ulp-level drift is visible before it becomes a hash mismatch).
"""
import sys, json, math, glob, os
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def load_spark(outdir, name):
    files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet")))
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f) for f in files])

def norm_rows(table):
    cols = sorted(table.column_names)
    rows = []
    data = {c: table.column(c).to_pylist() for c in cols}
    for i in range(table.num_rows):
        rows.append(tuple(data[c][i] for c in cols))
    return cols, sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))

def cmp_cell(a, b):
    if a is None and b is None: return True, 0.0
    if a is None or b is None: return False, float("inf")
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b), float("inf")
        if fa == fb: return True, 0.0
        d = abs(fa - fb) / max(abs(fa), abs(fb), 1e-300)
        return False, d
    return str(a) == str(b), (0.0 if str(a) == str(b) else float("inf"))

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only: continue
        spark_t = load_spark(outdir, name)
        if spark_t is None:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            duck_t = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_bad += 1; continue
        sc, sr = norm_rows(spark_t)
        dc, dr = norm_rows(duck_t)
        if sc != [c for c in sorted(dc)]:
            print(f"FAIL {name}: columns differ spark={sc} duck={sorted(dc)}"); n_bad += 1; continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}"); n_bad += 1; continue
        bad = []
        max_rel = 0.0
        for i, (r1, r2) in enumerate(zip(sr, dr)):
            for c, (v1, v2) in zip(sc, zip(r1, r2)):
                ok, rel = cmp_cell(v1, v2)
                if not ok:
                    max_rel = max(max_rel, rel)
                    if rel > 1e-9 and len(bad) < 3:
                        bad.append(f"row{i} col {c}: spark={v1!r} duck={v2!r} rel={rel:.2e}")
        # schema report
        stypes = {f.name: str(f.type) for f in spark_t.schema}
        dtypes = {f.name: str(f.type) for f in duck_t.schema}
        tdiff = {c: (stypes[c], dtypes[c]) for c in sc if stypes[c] != dtypes[c]}
        if bad:
            print(f"FAIL {name}: {len(bad)}+ cell diffs, max_rel={max_rel:.2e}")
            for b in bad: print("   ", b)
            n_bad += 1
        else:
            flag = f" [ulp-drift max_rel={max_rel:.2e}]" if max_rel > 0 else ""
            tflag = f" [type-diff {tdiff}]" if tdiff else ""
            print(f"OK   {name} ({len(sr)} rows){flag}{tflag}")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
