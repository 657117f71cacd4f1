#!/usr/bin/env python3
"""Local oracle compare for CheckQueries output (mirrors the driver's check):
register each sfDir parquet table in DuckDB, run the dumped oracle SQL, and
compare rows/schema/values against the Spark parquet, sorting columns by name
and rows by all columns before hashing.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import sys, os, json, glob
import duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    fails = 0
    for name, sql in sorted(oracle.items()):
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{spark_glob}')").fetchdf()
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            fails += 1
            continue
        sdf = sdf.reindex(sorted(sdf.columns), axis=1)
        odf = odf.reindex(sorted(odf.columns), axis=1)
        ok_rows = len(sdf) == len(odf)
        ok_schema = list(sdf.columns) == list(odf.columns)
        ok_hash = False
        if ok_rows and ok_schema:
            s = sdf.sort_values(by=list(sdf.columns)).reset_index(drop=True)
            o = odf.sort_values(by=list(odf.columns)).reset_index(drop=True)
            ok_hash = s.astype(str).equals(o.astype(str))
        status = "ok" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            fails += 1
        print(f"{status} {name}: rows {len(sdf)}/{len(odf)} "
              f"schema={ok_schema} hash={ok_hash}")
        if status == "FAIL" and ok_schema and not ok_hash and ok_rows:
            s = sdf.sort_values(by=list(sdf.columns)).reset_index(drop=True)
            o = odf.sort_values(by=list(odf.columns)).reset_index(drop=True)
            diff = s.astype(str) != o.astype(str)
            idx = diff.any(axis=1)
            print("  first spark diffs:\n", s[idx].head(3))
            print("  first oracle diffs:\n", o[idx].head(3))
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
