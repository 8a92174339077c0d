#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs DuckDB on each oracle SQL from Verify's oracle_sql.json against the
same parquet tables, loads the Spark result parquet, and compares:
row count, column set, and values (columns sorted by name, rows sorted).
Floats compared bit-exactly first, then with 1e-9 tolerance fallback so
we can see HOW far off a mismatch is.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import glob, os

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    import pyarrow as pa
    tabs = [pq.read_table(f) for f in sorted(files)]
    return pa.concat_tables(tabs) if len(tabs) > 1 else tabs[0]

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return v
    return v

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_tab = load_spark(outdir, name)
        if spark_tab is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            duck = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        s_cols = sorted(spark_tab.column_names)
        d_cols = sorted(duck.column_names)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}"); n_fail += 1; continue
        if spark_tab.num_rows != duck.num_rows:
            print(f"FAIL {name}: rows spark={spark_tab.num_rows} duck={duck.num_rows}"); n_fail += 1; continue
        s_rows = sorted(map(tuple, (
            [norm(spark_tab.column(c)[i].as_py()) for c in s_cols]
            for i in range(spark_tab.num_rows))), key=lambda r: tuple(str(x) for x in r))
        d_rows = sorted(map(tuple, (
            [norm(duck.column(c)[i].as_py()) for c in d_cols]
            for i in range(duck.num_rows))), key=lambda r: tuple(str(x) for x in r))
        exact = s_rows == d_rows
        if exact:
            print(f"PASS {name} ({spark_tab.num_rows} rows, exact)"); n_pass += 1; continue
        # tolerance pass to show magnitude of drift
        bad = 0; worst = 0.0; example = None
        for sr, dr in zip(s_rows, d_rows):
            for a, b in zip(sr, dr):
                if isinstance(a, float) and isinstance(b, float):
                    if a != b and not (math.isnan(a) and math.isnan(b)):
                        err = abs(a - b) / max(1.0, abs(b))
                        if err > worst:
                            worst = err; example = (a, b)
                        if err > 1e-9:
                            bad += 1
                elif a != b:
                    bad += 1
                    if example is None:
                        example = (a, b)
        if bad == 0:
            print(f"NEAR {name} ({spark_tab.num_rows} rows, float drift {worst:.2e}, ex {example})")
            n_fail += 1
        else:
            print(f"FAIL {name}: {bad} cell mismatches, ex {example}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
