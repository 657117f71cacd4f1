#!/usr/bin/env python3
"""Local pre-validation mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/validate.py <sfDir> <outDir> [query ...]

Reads outDir/<name>/ parquet (written by graft.Verify) and runs
outDir/oracle_sql.json[name] in DuckDB with views over sfDir's parquet
tables; compares sorted rows column-name-sorted, exact on ints/strings,
bit-exact on floats (reports max abs diff when not).
"""
import sys, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_rows = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
            spark_cols = [d[0] for d in con.description]
            duck = con.execute(sql)
            duck_cols = [d[0] for d in duck.description]
            duck_rows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            n_fail += 1
            continue
        # reorder both to sorted column order, then sort rows
        def key(row):
            return tuple((v is None, v) if v is not None else (True, 0) for v in row)
        sp = sorted((tuple(r[spark_cols.index(c)] for c in sorted(spark_cols)) for r in spark_rows), key=key)
        du = sorted((tuple(r[duck_cols.index(c)] for c in sorted(duck_cols)) for r in duck_rows), key=key)
        if len(sp) != len(du):
            print(f"FAIL {name}: rows spark={len(sp)} duck={len(du)}")
            n_fail += 1
            continue
        maxdiff, bad = 0.0, None
        for a, b in zip(sp, du):
            for x, y in zip(a, b):
                if isinstance(x, float) and isinstance(y, float):
                    if x != y and not (math.isnan(x) and math.isnan(y)):
                        maxdiff = max(maxdiff, abs(x - y))
                        if bad is None:
                            bad = (a, b)
                elif x != y:
                    if bad is None:
                        bad = (a, b)
                    maxdiff = float("inf")
        if bad is None:
            print(f"PASS {name} ({len(sp)} rows, bit-exact)")
            n_pass += 1
        else:
            print(f"FAIL {name}: maxdiff={maxdiff} first mismatch:\n  spark={bad[0]}\n  duck ={bad[1]}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
