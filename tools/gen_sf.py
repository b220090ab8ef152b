#!/usr/bin/env python3
"""Deterministic scale-factor generator for the graft test schema.

The driver ships read-only sf{0.001,0.01,0.1} parquet (TESTDATA.md);
nothing above sf0.1 exists in the sandbox, so the 100x-scale claims
were plan-audits only. This generates a larger sf with the SAME
schema, key ranges scaled linearly, and distributions matched to the
observed sf0.1 data (31-word vocab documents with ~0.2% exact dups,
unit-norm 64-dim embeddings with uniform labels 0..9, 30-day event
stream), so per-query sf0.1 -> sf1 scaling is meaningful.

Usage: python3 tools/gen_sf.py 1.0 /tmp/testdata/sf1
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import os

SF = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
OUT = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/testdata/sf{SF:g}"
os.makedirs(OUT, exist_ok=True)
rng = np.random.default_rng(42)

def write(name, table):
    pq.write_table(table, f"{OUT}/{name}.parquet")
    print(name, table.num_rows, flush=True)

# --- fixed dimensions ---------------------------------------------------
write("region", pa.table({
    "r_regionkey": pa.array(range(5), pa.int32()),
    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]}))
write("nation", pa.table({
    "n_nationkey": pa.array(range(25), pa.int32()),
    "n_name": [f"NATION_{i}" for i in range(25)],
    "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

# --- scaled star schema -------------------------------------------------
nCust = int(150000 * SF)
nSupp = int(10000 * SF)
nPart = int(200000 * SF)
nOrd  = int(1500000 * SF)
nLine = int(6000000 * SF)

segments = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
write("customer", pa.table({
    "c_custkey": pa.array(range(nCust), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(nCust)],
    "c_nationkey": pa.array(rng.integers(0, 25, nCust), pa.int32()),
    "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, nCust), 2),
    "c_mktsegment": pa.array(np.array(segments)[rng.integers(0, 5, nCust)])}))

write("supplier", pa.table({
    "s_suppkey": pa.array(range(nSupp), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(nSupp)],
    "s_nationkey": pa.array(rng.integers(0, 25, nSupp), pa.int32()),
    "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, nSupp), 2)}))

adjs = ["large", "hot", "blue", "small", "green", "red", "dim", "bright"]
nouns = ["ring", "bolt", "case", "drum", "plate", "tube", "cap", "gear"]
types = ["LARGE", "ECONOMY", "SMALL", "MEDIUM", "STANDARD", "PROMO"]
write("part", pa.table({
    "p_partkey": pa.array(range(nPart), pa.int64()),
    "p_name": [f"{adjs[i % 8]} {nouns[(i // 8) % 8]}" for i in range(nPart)],
    "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, nPart)],
    "p_type": pa.array(np.array(types)[rng.integers(0, 6, nPart)]),
    "p_size": pa.array(rng.integers(1, 51, nPart), pa.int32()),
    "p_retailprice": np.round(900.0 + (np.arange(nPart) % 1000) / 10.0, 2)}))

day_us = 86400_000_000
t0 = np.datetime64("1996-01-01", "us").astype(np.int64)
span_days = 2557  # ~7 years, matches the observed 1996..2002 order dates
write("orders", pa.table({
    "o_orderkey": pa.array(range(nOrd), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, nCust, nOrd), pa.int64()),
    "o_orderstatus": pa.array(np.array(["O", "F", "P"])[
        rng.choice(3, nOrd, p=[0.49, 0.49, 0.02])]),
    "o_totalprice": np.round(rng.uniform(850.0, 450000.0, nOrd), 2),
    "o_orderdate": pa.array(
        t0 + rng.integers(0, span_days, nOrd) * day_us,
        pa.timestamp("us")),
    "o_orderpriority": pa.array(np.array(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])[
        rng.integers(0, 5, nOrd)])}))

write("lineitem", pa.table({
    "l_orderkey": pa.array(rng.integers(0, nOrd, nLine), pa.int64()),
    "l_partkey": pa.array(rng.integers(0, nPart, nLine), pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, nSupp, nLine), pa.int64()),
    "l_linenumber": pa.array(rng.integers(1, 8, nLine), pa.int32()),
    "l_quantity": rng.integers(1, 51, nLine).astype(np.float64),
    "l_extendedprice": np.round(rng.uniform(900.0, 105000.0, nLine), 2),
    "l_discount": np.round(rng.integers(0, 11, nLine) / 100.0, 2),
    "l_tax": np.round(rng.integers(0, 9, nLine) / 100.0, 2),
    "l_returnflag": pa.array(np.array(["R", "A", "N"])[
        rng.choice(3, nLine, p=[0.25, 0.25, 0.5])]),
    "l_linestatus": pa.array(np.array(["O", "F"])[
        rng.integers(0, 2, nLine)]),
    "l_shipdate": pa.array(
        t0 + rng.integers(0, span_days + 120, nLine) * day_us,
        pa.timestamp("us"))}))

# --- events stream ------------------------------------------------------
nEv = int(1000000 * SF)
nUsers = max(1, int(15000 * SF))
ev0 = np.datetime64("2024-01-01", "us").astype(np.int64)
ts = np.sort(rng.integers(0, 30 * day_us, nEv)) + ev0
write("events", pa.table({
    "event_id": pa.array(range(nEv), pa.int64()),
    "ts": pa.array(ts, pa.timestamp("us")),
    "user_id": pa.array(rng.integers(0, nUsers, nEv), pa.int64()),
    "event_type": pa.array(np.array(
        ["view", "click", "purchase", "signup", "error"])[
        rng.integers(0, 5, nEv)]),
    "value": np.round(rng.exponential(50.0, nEv).clip(0, 600.0), 2),
    "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, nEv)]}))

# --- documents (31-word vocab, ~0.2% exact dups) ------------------------
nDoc = int(50000 * SF)
vocab = np.array(("spark window merge table column vector stream value data "
                  "small join filter big group hash customer sort order slow "
                  "line part fast the row agg key query a scan batch "
                  "shuffle").split())
langs = np.array(["en", "zh", "es", "fr", "de"])
lang_p = [0.41, 0.15, 0.15, 0.15, 0.14]
texts = []
nw = rng.integers(8, 106, nDoc)
for i in range(nDoc):
    texts.append(" ".join(vocab[rng.integers(0, 31, nw[i])]))
# exact dups: ~0.2% of docs repeat an earlier text
for j in rng.integers(1, nDoc, max(1, nDoc // 500)):
    texts[j] = texts[j // 2]

# Optional REALISTIC-vocabulary variant (3rd CLI arg "zipf50k"): the
# default 31-word vocabulary makes every 3-shingle corpus-hot — the
# adversarially DENSE regime for the inverted-index dedup family
# (SCALE.md caveat). This mode swaps ONLY the texts for a Zipf-
# weighted 50K-word vocabulary (the sparse regime real web corpora
# live in); an INDEPENDENT rng keeps every other table byte-identical
# to the default run, so dense-vs-sparse measurements differ in text
# statistics alone. Words are pronounceable-ish base-20 encodings of
# their rank so lengths (2..8 chars) and characters vary.
if len(sys.argv) > 3 and sys.argv[3] == "zipf50k":
    V = 50000
    rng2 = np.random.default_rng(777)
    cons = "bcdfghjklmnpqrstvwxz"
    vow = "aeiou"
    def mkword(r):
        # CV syllables from the rank digits: distinct per rank
        w, n = [], r
        while True:
            w.append(cons[n % 20]); n //= 20
            w.append(vow[n % 5]); n //= 5
            if n == 0:
                break
        return "".join(w) + ("x" if r % 7 == 0 else "")
    vocab50 = np.array([mkword(r) for r in range(V)])
    p = 1.0 / np.power(np.arange(1, V + 1), 1.07)
    p /= p.sum()
    texts = []
    for i in range(nDoc):
        texts.append(" ".join(vocab50[rng2.choice(V, nw[i], p=p)]))
    for j in rng2.integers(1, nDoc, max(1, nDoc // 500)):
        texts[j] = texts[j // 2]
n_chars = np.array([len(t) for t in texts], np.int64)
write("documents", pa.table({
    "doc_id": pa.array(range(nDoc), pa.int64()),
    "text": texts,
    "lang": pa.array(langs[rng.choice(5, nDoc, p=lang_p)]),
    "source": [f"src{s}" for s in rng.integers(0, 20, nDoc)],
    "n_chars": n_chars}))

# --- embeddings (unit-norm 64-dim, labels independent) ------------------
nEmb = int(20000 * SF)
v = rng.standard_normal((nEmb, 64)).astype(np.float32)
v /= np.linalg.norm(v, axis=1, keepdims=True)
write("embeddings", pa.table({
    "vec_id": pa.array(range(nEmb), pa.int64()),
    "embedding": pa.array(list(v), pa.list_(pa.float32())),
    "label": pa.array(rng.integers(0, 10, nEmb), pa.int32())}))

print("done", OUT, flush=True)
