#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (t2).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dir in <verifyOutDir>, read the Spark parquet result,
run the matching oracle SQL from oracle_sql.json in DuckDB (with each
testdata table registered as a view), sort columns by name, canonical-
ize values, and diff. Exit nonzero on any mismatch.
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


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        spark_tbl = pq.read_table(files[0]) if files else None
        if name not in oracles:
            n_noracle += 1
            print(f"  [rows-only] {name}: {spark_tbl.num_rows if spark_tbl else 0} rows")
            continue
        try:
            duck = con.execute(oracles[name])
            dcols = [d[0] for d in duck.description]
            drows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        scols = spark_tbl.column_names
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            n_fail += 1
            continue
        # sort columns by name (driver semantics), keep row order
        sidx = sorted(range(len(scols)), key=lambda i: scols[i])
        didx = sorted(range(len(dcols)), key=lambda i: dcols[i])
        spy = spark_tbl.to_pylist()
        try:
            srows = [tuple(canon(r[scols[i]]) for i in sidx) for r in spy]
            drows2 = [tuple(canon(r[i]) for i in didx) for r in drows]
        except NonScalarCell as e:
            print(f"FAIL {name}: non-scalar output column ({e}) — the "
                  f"driver's harness cannot verify array/struct cells; "
                  f"serialize them (array_join/to_json) in the final "
                  f"projection of BOTH the query and its oracle")
            n_fail += 1
            continue
        if len(srows) != len(drows2):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows2)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, drows2)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)} mismatched rows; first at {i}:")
            print(f"   spark: {a}")
            print(f"   duck : {b}")
            n_fail += 1
        else:
            print(f"  PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
