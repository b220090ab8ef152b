#!/usr/bin/env python3
"""Self-test for compare.py's fail-closed canonicalization.

The local gate must be at least as strict as the driver's pandas
harness: a Spark output column the driver would mangle (decimal →
lossy float64, array/struct → unhashable crash) must FAIL here even
when an exact comparison would pass. Round 8 shipped three driver-red
queries precisely because the local gate compared Decimals exactly;
this pins the round-9 fix so it cannot regress.

Run: python3 tools/compare_selftest.py   (exit 0 = all behaviors pinned)
"""
import sys
from decimal import Decimal

import duckdb
import pyarrow as pa

sys.path.insert(0, __import__("os").path.dirname(__file__))
from compare import compare_one  # noqa: E402


def check(name, ok_expected, msg_expected, tbl, sql):
    con = duckdb.connect()
    ok, msg = compare_one(con, name, tbl, sql)
    assert ok == ok_expected, f"{name}: ok={ok}, expected {ok_expected} ({msg})"
    if msg_expected:
        assert msg_expected in msg, f"{name}: message {msg!r} lacks {msg_expected!r}"
    print(f"  PASS selftest {name}")


# 1. decimal output column fails loudly even though values are exact
check("decimal_fails_closed", False, "decimal-typed output cell",
      pa.table({"k": [1], "v": [Decimal("287764517185566771601")]}),
      "SELECT 1 AS k, CAST('287764517185566771601' AS DECIMAL(38,0)) AS v")

# 2. list output column fails loudly (driver harness crashes on these)
check("list_fails_closed", False, "non-scalar output column",
      pa.table({"k": [1], "v": [[1, 2]]}),
      "SELECT 1 AS k, [1, 2] AS v")

# 3. the sanctioned renderings pass: VARCHAR for exact big ints,
#    DOUBLE below 2^53
check("varchar_passes", True, None,
      pa.table({"k": [1], "v": ["287764517185566771601"]}),
      "SELECT 1 AS k, CAST(CAST('287764517185566771601' AS DECIMAL(38,0)) AS VARCHAR) AS v")
check("double_passes", True, None,
      pa.table({"k": [1], "v": [2259.28]}),
      "SELECT 1 AS k, CAST(CAST(2259.28 AS DECIMAL(18,2)) AS DOUBLE) AS v")

# 4. a genuine value mismatch still fails (strictness didn't replace
#    comparison)
check("mismatch_fails", False, "mismatched rows",
      pa.table({"k": [1], "v": [1.0]}),
      "SELECT 1 AS k, CAST(2.0 AS DOUBLE) AS v")

print("== compare.py self-test: all fail-closed behaviors pinned")
