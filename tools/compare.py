#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (t2).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dir in <verifyOutDir>, read the Spark parquet result,
run the matching oracle SQL from oracle_sql.json in DuckDB (with each
testdata table registered as a view), sort columns by name, canonical-
ize values, and diff. Exit nonzero on any mismatch.

The per-query core lives in compare_one() so the timed/skip-list
variant (compare_timed.py) shares ONE comparison semantics — a fix
here is a fix there.
"""
import sys, os, json, glob, math
from decimal import Decimal

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        # NO normalize(): the driver hashes the exact-scale rendering, so
        # DECIMAL(38,6) "1.500000" != DECIMAL(18,2) "1.50". Normalizing here
        # hid 6 real driver failures in round 1.
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, bytes):
        return ("b", v.hex())
    if isinstance(v, (list, tuple, dict)):
        # FAIL-CLOSED: the driver's pandas harness crashes on array/
        # struct cells (unhashable ndarray in sort_values), so a query
        # emitting them can never be driver-verified. Tuple-izing here
        # (the round-1..3 behavior) made the local gate laxer than the
        # driver's and hid exactly that — reject instead, so local
        # green predicts driver green.
        raise NonScalarCell(type(v).__name__)
    return v


class NonScalarCell(Exception):
    pass


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def compare_one(con, name, spark_tbl, sql):
    """Compare one query's Spark parquet table against its oracle SQL.
    Returns (ok, message) — message is the failure detail, or the
    pass line's row count as a string."""
    if spark_tbl is None:
        return False, "no Spark output parquet (Verify died mid-query?)"
    try:
        duck = con.execute(sql)
        dcols = [d[0] for d in duck.description]
        drows = duck.fetchall()
    except Exception as e:
        return False, f"oracle SQL error: {e}"
    scols = spark_tbl.column_names
    if sorted(scols) != sorted(dcols):
        return False, f"columns spark={sorted(scols)} duck={sorted(dcols)}"
    # sort columns by name (driver semantics), keep row order
    sidx = sorted(range(len(scols)), key=lambda i: scols[i])
    didx = sorted(range(len(dcols)), key=lambda i: dcols[i])
    spy = spark_tbl.to_pylist()
    try:
        srows = [tuple(canon(r[scols[i]]) for i in sidx) for r in spy]
        drows2 = [tuple(canon(r[i]) for i in didx) for r in drows]
    except NonScalarCell as e:
        return False, (f"non-scalar output column ({e}) — the driver's "
                       f"harness cannot verify array/struct cells; "
                       f"serialize them (array_join/to_json) in the final "
                       f"projection of BOTH the query and its oracle")
    if len(srows) != len(drows2):
        return False, f"rowcount spark={len(srows)} duck={len(drows2)}"
    bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, drows2)) if a != b]
    if bad:
        i, a, b = bad[0]
        return False, (f"{len(bad)} mismatched rows; first at {i}:\n"
                       f"   spark: {a}\n   duck : {b}")
    return True, str(len(srows))


def read_spark(qdir):
    files = glob.glob(os.path.join(qdir, "*.parquet"))
    return pq.read_table(files[0]) if files else None


def main(sf_dir, out_dir):
    con = connect(sf_dir)
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        spark_tbl = read_spark(qdir)
        if name not in oracles:
            n_noracle += 1
            print(f"  [rows-only] {name}: {spark_tbl.num_rows if spark_tbl else 0} rows")
            continue
        ok, msg = compare_one(con, name, spark_tbl, oracles[name])
        if ok:
            print(f"  PASS {name} ({msg} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
