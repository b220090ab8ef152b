#!/usr/bin/env python3
"""Second-implementation reference BPE (train + encode) — the
independent pin for the text_bpe_vocab / text_bpe_encode oracles.

Three implementations of the same contract now exist:
  1. the Scala engine (graft.ops.BpeTrain / functions.BpeEncode),
  2. the DuckDB recursive-CTE oracle (TextQueries.sqlBpeTrainCte) the
     driver hash-checks the engine against, and
  3. this ~100-line Python reference.
This script cross-checks 2 against 3 on a given sf directory (the
driver's gate already checks 1 against 2), so a bug would have to be
implemented three times, in three languages, to slip through.

Contract (BpeTrain.scala doc):
  - words = split(trim(text), ' +'), empty tokens dropped; weights are
    corpus occurrence counts.
  - each round: count adjacent symbol pairs weighted by word count,
    pick (freq DESC, left ASC, right ASC) — string order is code-point
    order — and rewrite words with ONE left-to-right non-overlapping
    merge pass. Stop when the best count < 2 or maxMerges reached.
  - encode = replay the rule table in rank order, one merge pass per
    rule (the applyMerges / bpe_encode sequential contract).

Usage:
  python3 tools/reference_bpe.py --selftest
  python3 tools/reference_bpe.py <sfDir>       # diff DuckDB oracle vs this
"""
import sys
from collections import Counter


def word_counts(texts):
    wc = Counter()
    for t in texts:
        for w in t.strip(" ").split(" "):
            if w:
                wc[w] += 1
    return wc


def train(wc, max_merges):
    # list of [symbols, count]; Python str comparison is by code point,
    # matching Spark UTF8String / DuckDB VARCHAR binary order
    words = [[list(w), c] for w, c in sorted(wc.items())]
    rules = []
    for rank in range(1, max_merges + 1):
        pc = Counter()
        for s, c in words:
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (l, r), f = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if f < 2:
            break
        rules.append((rank, l, r, l + r, f))
        for wrec in words:
            wrec[0] = merge_once(wrec[0], l, r)
    return rules


def merge_once(s, l, r):
    out, i = [], 0
    while i < len(s):
        if i < len(s) - 1 and s[i] == l and s[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def encode(word, rules):
    s = list(word)
    for _, l, r, _, _ in rules:
        if len(s) < 2:
            break
        s = merge_once(s, l, r)
    return s


def selftest():
    # textbook case: "aaab"x3 — (a,a) wins (2 positions x 3 = 6),
    # left-to-right non-overlap gives ["aa","a","b"]; then (a,b) and
    # (aa,a) tie at 3 and (a,b) wins on left ASC; then (aa,ab)
    wc = Counter({"aaab": 3})
    rules = train(wc, 10)
    assert [(x[1], x[2]) for x in rules] == \
        [("a", "a"), ("a", "b"), ("aa", "ab")], rules
    assert rules[0][4] == 6, rules
    # tie-break: "ab" and "ba" both freq 2 -> (a,b) wins lexicographically
    rules2 = train(Counter({"ab": 2, "ba": 2}), 1)
    assert (rules2[0][1], rules2[0][2]) == ("a", "b"), rules2
    # one merge PASS per rule: encode("aaaa") with only rule (a,a) -> ["aa","aa"]
    assert encode("aaaa", [(1, "a", "a", "aa", 9)]) == ["aa", "aa"]
    # merged token cannot chain-merge in the same pass: "aaa" -> ["aa","a"]
    assert encode("aaa", [(1, "a", "a", "aa", 9)]) == ["aa", "a"]
    print("reference_bpe selftest ok")


def main(sf_dir):
    import duckdb
    import pyarrow.parquet as pq
    sys.path.insert(0, __file__.rsplit("/", 1)[0] + "/..")
    texts = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"])
    ids = texts.column("doc_id").to_pylist()
    txt = texts.column("text").to_pylist()
    wc = word_counts(txt)

    # pull the engine's oracle SQL out of a Verify dump if present,
    # else rebuild it here from the committed template via scala? No —
    # the SQL is duplicated in the gate; this script re-derives the
    # EXPECTED tables and compares against the DuckDB oracle rendering.
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")

    import json, subprocess, os
    # locate oracle_sql.json next to a verify dump if given, else ask
    # the user to pass one; fall back to comparing trainer semantics
    # against a minimal inline rendering is NOT done — the committed
    # SQL is the thing under test.
    dump = None
    for cand in (sys.argv[2:] or []):
        if os.path.exists(os.path.join(cand, "oracle_sql.json")):
            dump = os.path.join(cand, "oracle_sql.json")
    if dump is None:
        for cand in ("/tmp/verify_out", "/tmp/verify_bpe"):
            if os.path.exists(os.path.join(cand, "oracle_sql.json")):
                dump = os.path.join(cand, "oracle_sql.json")
    assert dump, ("pass a Verify out-dir containing oracle_sql.json "
                  "(runMain graft.Verify <sfDir> <outDir>)")
    oracles = json.load(open(dump))

    # text_bpe_vocab: DuckDB oracle vs python train(1200)
    duck = con.execute(oracles["text_bpe_vocab"]).fetchall()
    pyr = train(wc, 1200)
    assert duck == pyr, (duck[:5], pyr[:5])
    print(f"text_bpe_vocab: duckdb == python ({len(pyr)} rules)")

    # text_bpe_encode: DuckDB oracle vs python train(40) + encode
    duck2 = con.execute(oracles["text_bpe_encode"]).fetchall()
    rules40 = train(wc, 40)
    cache = {}
    exp = []
    for did, t in zip(ids, txt):
        ws = [w for w in t.strip(" ").split(" ") if w]
        if not ws:
            continue
        ntok = 0
        for w in ws:
            if w not in cache:
                cache[w] = len(encode(w, rules40))
            ntok += cache[w]
        exp.append((did, len(ws), ntok))
    exp.sort()
    assert duck2 == exp, (duck2[:3], exp[:3])
    print(f"text_bpe_encode: duckdb == python ({len(exp)} docs)")


if __name__ == "__main__":
    if sys.argv[1:2] == ["--selftest"]:
        selftest()
    else:
        main(sys.argv[1])
