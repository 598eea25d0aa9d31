#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers each parquet table in sfDir as a DuckDB view, runs every oracle
SQL from <verifyOutDir>/oracle_sql.json, and compares (rows, schema-names,
value-hash) against the Spark dump at <verifyOutDir>/<name>/.
"""
import sys, os, json, glob, hashlib
import duckdb

def norm(v):
    if isinstance(v, float):
        return round(v, 6)
    return v

def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    h = hashlib.sha256()
    for row in rows:
        for i in order:
            h.update(repr(norm(row[i])).encode())
        h.update(b"\x00")
    return h.hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        spark_rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        s_cols, s_rows = spark_rel.columns, spark_rel.fetchall()
        if name not in oracles:
            print(f"{name}: NO-ORACLE rows={len(s_rows)}")
            continue
        try:
            o_rel = con.sql(oracles[name])
            o_cols, o_rows = o_rel.columns, o_rel.fetchall()
        except Exception as e:
            print(f"{name}: ORACLE-SQL-ERROR {e}")
            n_bad += 1
            continue
        ok_schema = sorted(s_cols) == sorted(o_cols)
        ok_rows = len(s_rows) == len(o_rows)
        ok_hash = (table_hash(s_rows, s_cols) == table_hash(o_rows, o_cols)
                   if ok_schema else False)
        status = "OK" if (ok_schema and ok_rows and ok_hash) else "MISMATCH"
        if status == "OK":
            n_ok += 1
        else:
            n_bad += 1
            print(f"{name}: {status} schema={ok_schema} rows={ok_rows}"
                  f" ({len(s_rows)} vs {len(o_rows)}) hash={ok_hash}")
            if ok_schema and s_rows and o_rows:
                order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                ocol = [o_cols.index(s_cols[i]) for i in order]
                for i, (a, b) in enumerate(zip(s_rows, o_rows)):
                    av = [norm(a[j]) for j in order]
                    bv = [norm(b[j]) for j in ocol]
                    if av != bv:
                        print(f"  first diff row {i}:")
                        print(f"    spark : {av}")
                        print(f"    duckdb: {bv}")
                        break
    print(f"\n{n_ok} OK, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
