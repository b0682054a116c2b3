#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]
Compares each dumped parquet result against the oracle SQL run in DuckDB
over the same fixture tables: row count, sorted-column schema, and a
value hash over rows sorted by all columns (the driver's discipline).
"""
import json, sys, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c]
            if isinstance(v, float):
                vals.append(f"{v:.10g}")
            else:
                vals.append(repr(v))
        out.append("|".join(vals))
    out.sort()
    h = hashlib.md5("\n".join(out).encode()).hexdigest()
    return h


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetch_arrow_table()
            ora = con.execute(sql).fetch_arrow_table()
            s_cols = sorted(spark.column_names)
            o_cols = sorted(ora.column_names)
            rows_ok = spark.num_rows == ora.num_rows
            schema_ok = s_cols == o_cols
            s_rows = spark.to_pylist()
            o_rows = ora.to_pylist()
            hash_ok = schema_ok and canon(s_rows, s_cols) == canon(o_rows, o_cols)
            status = "OK" if (rows_ok and schema_ok and hash_ok) else "MISMATCH"
            if status != "OK":
                n_bad += 1
                print(f"{name}: {status} rows={spark.num_rows}/{ora.num_rows} "
                      f"schema={s_cols}/{o_cols} hash={hash_ok}")
            else:
                print(f"{name}: OK ({spark.num_rows} rows)")
        except Exception as e:
            n_bad += 1
            print(f"{name}: ERROR {e}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
