#!/usr/bin/env python3
"""compare.py with per-query wall-clock and an optional skip list —
for scale-factor runs where a few DuckDB oracle formulations are
deliberately quadratic (they exist to cross-check the engine's
sub-quadratic plans at small sf, e.g. the brute-force levenshtein
oracle behind the FastSS fuzzy join) and stop being feasible.

The comparison itself is compare.py's compare_one() — one semantics,
two front-ends.

Usage: python3 tools/compare_timed.py <sfDir> <verifyOutDir> [skip1,skip2,...]
"""
import sys, os, time, json, glob
import importlib.util

_spec = importlib.util.spec_from_file_location(
    "cmp", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "compare.py"))
cmp_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(cmp_mod)


def main(sf_dir, out_dir, skip):
    con = cmp_mod.connect(sf_dir)
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
        spark_tbl = cmp_mod.read_spark(qdir)
        if name not in oracles:
            n_noracle += 1
            print(f"  [rows-only] {name}: "
                  f"{spark_tbl.num_rows if spark_tbl else 0} rows")
            continue
        t0 = time.time()
        ok, msg = cmp_mod.compare_one(con, name, spark_tbl, oracles[name])
        dt = time.time() - t0
        times[name] = dt
        if ok:
            print(f"  PASS {name} ({msg} rows, {dt:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
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
