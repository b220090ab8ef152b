#!/usr/bin/env python3
"""compare.py with per-query wall-clock and an optional skip list —
for scale-factor runs where a few DuckDB oracle formulations are
deliberately quadratic (they exist to cross-check the engine's
sub-quadratic plans at small sf, e.g. the brute-force levenshtein
oracle behind the FastSS fuzzy join) and stop being feasible.

Usage: python3 tools/compare_timed.py <sfDir> <verifyOutDir> [skip1,skip2,...]
"""
import sys, os, time, json, glob

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import importlib.util

spec = importlib.util.spec_from_file_location(
    "cmp", os.path.join(os.path.dirname(os.path.abspath(__file__)), "compare.py"))
cmp_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(cmp_mod)

import duckdb
import pyarrow.parquet as pq


def main(sf_dir, out_dir, skip):
    con = duckdb.connect()
    for t in cmp_mod.TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = n_noracle = n_skip = 0
    times = {}
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        if name in skip:
            n_skip += 1
            print(f"  [skipped] {name} (oracle infeasible at this sf)")
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        spark_tbl = pq.read_table(files[0]) if files else None
        if name not in oracles:
            n_noracle += 1
            print(f"  [rows-only] {name}: "
                  f"{spark_tbl.num_rows if spark_tbl else 0} rows")
            continue
        t0 = time.time()
        try:
            duck = con.execute(oracles[name])
            dcols = [d[0] for d in duck.description]
            drows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        scols = spark_tbl.column_names
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        else:
            sidx = sorted(range(len(scols)), key=lambda i: scols[i])
            didx = sorted(range(len(dcols)), key=lambda i: dcols[i])
            spy = spark_tbl.to_pylist()
            try:
                srows = [tuple(cmp_mod.canon(r[scols[i]]) for i in sidx)
                         for r in spy]
                drows2 = [tuple(cmp_mod.canon(r[i]) for i in didx)
                          for r in drows]
            except cmp_mod.NonScalarCell as e:
                print(f"FAIL {name}: non-scalar output column ({e})")
                ok = False
                srows = drows2 = None
            if ok and len(srows) != len(drows2):
                print(f"FAIL {name}: rowcount spark={len(srows)} "
                      f"duck={len(drows2)}")
                ok = False
            elif ok:
                bad = [(i, a, b) for i, (a, b)
                       in enumerate(zip(srows, drows2)) if a != b]
                if bad:
                    i, a, b = bad[0]
                    print(f"FAIL {name}: {len(bad)} mismatched rows; "
                          f"first at {i}:\n   spark: {a}\n   duck : {b}")
                    ok = False
        dt = time.time() - t0
        times[name] = dt
        if ok:
            print(f"  PASS {name} ({spark_tbl.num_rows} rows, {dt:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
    slow = sorted(times.items(), key=lambda kv: -kv[1])[:10]
    print("slowest oracles:",
          ", ".join(f"{k}={v:.1f}s" for k, v in slow))
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only, "
          f"{n_skip} skipped")
    return 1 if n_fail else 0


if __name__ == "__main__":
    skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
    sys.exit(main(sys.argv[1], sys.argv[2], skip))
