#!/usr/bin/env python3
"""Bench regression pin — fail loudly when a model-family query's
median moves >1.5x above its committed pin (r12 verdict directive:
the DSIR family regressed ~2x and nothing tripped; this is the trip
wire).

Usage:
    python3 tools/bench_pin.py [BENCH_full_latest.json] [BENCH_PIN.json]

Reads the full per-query dump that graft.Bench always writes (plus
its sibling .spread.json) and compares every pinned query against
BENCH_PIN.json:

  * model_* queries: >1.5x the pin is a FAILURE (exit 1) unless the
    run's own 3-sample spread for that query exceeds 0.6 — a
    one-shot contention outlier moves the spread, a plan regression
    moves the median with a normal spread (the Bench noise-marker
    logic, same thresholds).
  * every other pinned query: >1.5x prints a WARNING only — the
    hard gate is scoped to the model family the directive names;
    widen by editing HARD_PREFIXES once other families earn a pin.

Refresh the pin after an ACCEPTED move (new operator cost, verified
environment shift) with:
    python3 tools/bench_pin.py --refresh BENCH_full_latest.json
which rewrites BENCH_PIN.json from the dump, keeping the pin a
deliberate, committed act rather than a silent drift.
"""
import json
import sys

HARD_PREFIXES = ("model_",)
RATIO = 1.5
NOISE_SPREAD = 0.6


def load(path):
    with open(path) as f:
        return json.load(f)


def main(argv):
    if argv and argv[0] == "--refresh":
        dump = argv[1] if len(argv) > 1 else "BENCH_full_latest.json"
        pin_path = argv[2] if len(argv) > 2 else "BENCH_PIN.json"
        data = load(dump)
        with open(pin_path, "w") as f:
            json.dump(dict(sorted(data.items())), f,
                      separators=(",\n ", ": "))
        print(f"pinned {len(data)} queries from {dump} -> {pin_path}")
        return 0

    dump = argv[0] if argv else "BENCH_full_latest.json"
    pin_path = argv[1] if len(argv) > 1 else "BENCH_PIN.json"
    cur = load(dump)
    pin = load(pin_path)
    try:
        spread = load(dump.removesuffix(".json") + ".spread.json")
    except OSError:
        spread = {}

    failures, warnings, noisy = [], [], []
    for name, ref in sorted(pin.items()):
        now = cur.get(name)
        if now is None:
            # a pinned query vanished from the dump — that is itself
            # a loud failure (renames must refresh the pin)
            failures.append(f"{name}: pinned but absent from {dump}")
            continue
        if ref <= 0 or now <= RATIO * ref:
            continue
        line = (f"{name}: {now:.3f}s vs pin {ref:.3f}s "
                f"({now / ref:.2f}x, spread {spread.get(name, -1):.2f})")
        if name.startswith(HARD_PREFIXES):
            if spread.get(name, 0.0) > NOISE_SPREAD:
                noisy.append(line)
            else:
                failures.append(line)
        else:
            warnings.append(line)

    for w in warnings:
        print(f"WARN  {w}")
    for n in noisy:
        print(f"NOISY {n} — over pin but spread marks contention; "
              "re-measure (TimeQ) before accepting")
    for f_ in failures:
        print(f"FAIL  {f_}")
    ok = not failures
    print(f"== bench pin: {len(pin)} pinned, {len(failures)} fail, "
          f"{len(noisy)} noisy, {len(warnings)} warn")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
