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
        # FAIL-CLOSED (round 9): the driver's pandas bridge renders
        # decimals as float64 (DECIMAL(38,0) "287764517185566771601"
        # becomes 2.877646e+20), so a decimal-typed output column can
        # hash-differently on the driver even when this script's exact
        # Decimal comparison passes — exactly how the r8 checksum
        # queries shipped red. Local green must predict driver green:
        # reject decimals outright; queries must cast them to a
        # driver-stable rendering (VARCHAR for exactness, DOUBLE when
        # the magnitude fits) on BOTH the Spark and oracle sides.
        raise DecimalCell(str(v))
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


class DecimalCell(Exception):
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
    except DecimalCell as e:
        return False, (f"decimal-typed output cell ({e}) — the driver's "
                       f"pandas bridge renders decimals as lossy float64, "
                       f"so the hash cannot match; cast to VARCHAR (exact) "
                       f"or DOUBLE (below 2^53) in the final projection of "
                       f"BOTH the query and its oracle")
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


def selftest():
    """Prove the gate fails loudly on decimal outputs (the r8 escape):
    a decimal-typed Spark column must FAIL compare_one even when the
    values agree exactly, and the VARCHAR rendering of the same values
    must PASS."""
    import pyarrow as pa
    con = duckdb.connect()
    big = "287764517185566771601"  # > 2^53: float64 cannot hold it
    dec_tbl = pa.table({"v": pa.array([Decimal(big)],
                                      type=pa.decimal128(38, 0))})
    ok, msg = compare_one(con, "dec", dec_tbl,
                          f"SELECT CAST('{big}' AS DECIMAL(38,0)) AS v")
    assert not ok and "decimal" in msg, (ok, msg)
    str_tbl = pa.table({"v": pa.array([big], type=pa.string())})
    ok, msg = compare_one(con, "str", str_tbl,
                          f"SELECT CAST(CAST('{big}' AS DECIMAL(38,0)) "
                          f"AS VARCHAR) AS v")
    assert ok, (ok, msg)
    # duck-side-only decimal must fail too (fail-closed on either side)
    dbl_tbl = pa.table({"v": pa.array([1.5], type=pa.float64())})
    ok, msg = compare_one(con, "mix", dbl_tbl,
                          "SELECT CAST(1.5 AS DECIMAL(18,2)) AS v")
    assert not ok and "decimal" in msg, (ok, msg)
    print("selftest ok: decimal outputs fail closed, VARCHAR passes")


if __name__ == "__main__":
    if sys.argv[1:] == ["--selftest"]:
        selftest()
        sys.exit(0)
    sys.exit(main(sys.argv[1], sys.argv[2]))
