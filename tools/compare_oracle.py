#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB correctness compare.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the parquet
tables in <sfDir>, sorts columns by name, and compares row count, schema and
a row-order-insensitive value hash — the same checks CORRECTNESS_r{N}.json
records. Dev tool only; the engine never depends on it.
"""
import sys, json, glob, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode()); h.update(b"\n")
    return h.hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            sp = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchall()
            sp_cols = [d[0] for d in con.description]
            oc = con.execute(sql).fetchall()
            oc_cols = [d[0] for d in con.description]
            rows_ok = len(sp) == len(oc)
            schema_ok = sorted(sp_cols) == sorted(oc_cols)
            hash_ok = schema_ok and table_hash(sp_cols, sp) == table_hash(oc_cols, oc)
            ok = rows_ok and schema_ok and hash_ok
            n_pass += ok; n_fail += (not ok)
            print(f"{name}: rows={rows_ok}({len(sp)}/{len(oc)}) "
                  f"schema={schema_ok} hash={hash_ok} -> {'PASS' if ok else 'FAIL'}")
            if not schema_ok:
                print(f"  spark={sorted(sp_cols)} oracle={sorted(oc_cols)}")
        except Exception as e:
            n_fail += 1
            print(f"{name}: ERROR {e}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
