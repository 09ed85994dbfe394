#!/usr/bin/env python3
"""Dev-only pre-flight for the driver's DuckDB-oracle compare.

Reads a Verify output dir (per-query parquet + oracle_sql.json), runs each
oracle SQL in DuckDB over the same sf tables, and compares values the way
we believe the driver does: columns sorted by name, rows sorted, values
hashed. NOT part of the shipped engine (driver-side python deps only).

Usage: python3 dev/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob, math

import duckdb
import pyarrow.parquet as pq

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)

def table_sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return names, out

# DuckDB logical type -> compatible Arrow type prefixes. Calibrated to the
# driver's observed hash behavior (round 1): any signed-int width vs any
# other is fine (q7/q12/emb_knn passed with int32 vs BIGINT), but HUGEINT
# (DuckDB's SUM(BIGINT) promotion to int128) hash-mismatches Spark's LONG
# even when values are identical — so integer widths pool together and
# HUGEINT maps to nothing.
INTS = ("int8", "int16", "int32", "int64")
DUCK_TO_ARROW = {
    "BIGINT": INTS, "INTEGER": INTS, "SMALLINT": INTS, "TINYINT": INTS,
    "DOUBLE": ("double",), "FLOAT": ("float",),
    "VARCHAR": ("string", "large_string"), "BOOLEAN": ("bool",),
    "DATE": ("date32",), "TIMESTAMP": ("timestamp",),
}

def type_mismatches(con, sql, arrow_schema):
    duck_types = {r[0]: r[1] for r in
                  con.execute(f"DESCRIBE {sql}").fetchall()}
    bad = []
    for field in arrow_schema:
        d = duck_types.get(field.name)
        if d is None:
            continue  # column-name mismatch reported separately
        base = d.split("(")[0].strip().upper()
        a = str(field.type)
        if base.startswith("DECIMAL"):
            ok = a.startswith("decimal")
        else:
            ok = any(a.startswith(p) for p in DUCK_TO_ARROW.get(base, ()))
        if not ok:
            bad.append(f"{field.name}: duckdb {d} vs spark {a}")
    return bad

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # bounded memory + disk spill: the 10x-scale near-dup oracles are
    # join-heavy enough to draw the OOM killer if DuckDB assumes it owns
    # the machine while Spark JVMs are resident
    con.execute(f"SET memory_limit='{os.environ.get('ORACLE_MEM', '24GB')}'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    # fewer threads = fewer concurrently-resident pipeline buffers; the
    # list-heavy ANN oracles at 100x volume need this more than CPU
    if os.environ.get('ORACLE_THREADS'):
        con.execute(f"SET threads TO {int(os.environ['ORACLE_THREADS'])}")
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        t = pq.read_table(files[0])
        s_cols = t.column_names
        s_rows = [tuple(r.values()) for r in t.to_pylist()]
        try:
            res = con.execute(sql)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_bad += 1; continue
        sn, sv = table_sig(s_cols, s_rows)
        dn, dv = table_sig(d_cols, d_rows)
        if sn != dn:
            print(f"FAIL {name}: columns {sn} != {dn}"); n_bad += 1; continue
        if len(sv) != len(dv):
            print(f"FAIL {name}: rows {len(sv)} != {len(dv)}"); n_bad += 1; continue
        if sv != dv:
            bad = [(a, b) for a, b in zip(sv, dv) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_bad += 1; continue
        ty_bad = type_mismatches(con, sql, t.schema)
        if ty_bad:
            print(f"FAIL {name}: type mismatch: {ty_bad}")
            n_bad += 1; continue
        print(f"OK   {name} ({len(sv)} rows)")
        n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
