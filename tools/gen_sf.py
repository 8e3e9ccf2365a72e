#!/usr/bin/env python3
"""Dev-only synthetic-data generator for SCALING measurements above the
driver-provided sf0.1 (the driver owns /root/testdata and regenerates it
between rounds; this script NEVER writes there). It mirrors the driver
generator's schemas and distribution shapes (measured from sf0.1: same
columns/types, same categorical domains, same value ranges, documents as
word-permutation text over the sf0.1 vocabulary, 64-dim float32
embeddings) so plans and cardinality ratios behave comparably — it does
NOT reproduce the driver's RNG bit-for-bit, which scaling curves don't
need (correctness runs use the driver's own data).

Usage: python3 tools/gen_sf.py <sf> <outDir> [--chain-depth D]
  e.g. 0.5 target/testdata/sf0.5
       0.1 target/testdata/sf0.1-d4096 --chain-depth 4096

--chain-depth D plants one run of D CONSECUTIVE doc_ids whose texts are
distinct permutations of the same word set: distinct md5 → each is its
own keeper, identical word set → adjacent-keeper jaccard 1.0 ≥ 0.9, so
keeperPointers links them into ONE pointer chain of depth D. This makes
dedup_canonical_resolve's fixpoint round count (= ceil(log2 D)+1)
a controlled experiment variable instead of an accident of the driver's
duplicate sampling — the reproducibility knob for the round-7 bench
record question.
"""
import json
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main():
    sf = float(sys.argv[1])
    out = sys.argv[2]
    chain_depth = 0
    if "--chain-depth" in sys.argv:
        chain_depth = int(sys.argv[sys.argv.index("--chain-depth") + 1])
    import os
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)

    def write(name, table):
        pq.write_table(table, f"{out}/{name}.parquet")
        print(f"{name}: {table.num_rows} rows")

    # row counts: linear in sf, anchored at the driver's sf0.1 counts
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]}))
    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    write("customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(segs)[rng.integers(0, 5, n_cust)])}))

    write("supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2)}))

    adjs = ["large", "hot", "blue", "red", "small", "green", "dim", "shiny"]
    nouns = ["ring", "bolt", "case", "disk", "wheel", "cap", "tube", "cell"]
    types = ["ECONOMY", "MEDIUM", "SMALL", "PROMO", "LARGE", "STANDARD"]
    write("part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [f"{adjs[i % 8]} {nouns[(i // 8) % 8]}" for i in range(n_part)],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": pa.array(np.array(types)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2)}))

    day_us = 86_400_000_000
    o_base = np.datetime64("1995-01-01", "us").astype(np.int64)
    o_days = rng.integers(0, 2405, n_ord)  # ~1995-01-01 .. 2001-08-01
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    write("orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "F", "P"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array(o_base + o_days * day_us, pa.timestamp("us")),
        "o_orderpriority": pa.array(np.array(prios)[rng.integers(0, 5, n_ord)])}))

    s_days = rng.integers(0, 2405 + 90, n_li)
    write("lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(o_base + s_days * day_us, pa.timestamp("us"))}))

    ev_base = np.datetime64("2024-01-01", "us").astype(np.int64)
    gaps = rng.exponential(30 * day_us / max(n_ev, 1), n_ev).astype(np.int64)
    ts = ev_base + np.cumsum(gaps)
    etypes = ["view", "click", "purchase", "signup", "error"]
    n_users = max(1, int(15_000 * sf))
    write("events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(np.array(etypes)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)]}))

    # documents: word permutations over the DRIVER's sf0.1 vocabulary
    # (read-only), 10-100 words, ~2% exact duplicates like the original
    import duckdb
    vocab = sorted(r[0] for r in duckdb.sql(
        "SELECT DISTINCT unnest(string_split(lower(text), ' ')) "
        "FROM '/root/testdata/sf0.1/documents.parquet'").fetchall())
    langs = ["en", "fr", "es", "de", "zh"]
    texts = []
    for i in range(n_doc):
        if i > 0 and rng.random() < 0.02:
            texts.append(texts[rng.integers(0, i)])
        else:
            nw = int(rng.integers(10, 101))
            texts.append(" ".join(np.array(vocab)[rng.integers(0, len(vocab), nw)]))
    if chain_depth > 1:
        assert chain_depth <= n_doc, "chain deeper than the corpus"
        # one shared word set (≤20 words — the driver vocab is tiny),
        # D distinct permutations, consecutive ids
        nw_chain = min(20, len(vocab))
        words = np.array(vocab)[rng.choice(len(vocab), nw_chain, replace=False)]
        start = max(0, min(n_doc // 4, n_doc - chain_depth))
        seen = set()
        for j in range(chain_depth):
            while True:
                perm = " ".join(words[rng.permutation(nw_chain)])
                if perm not in seen:
                    seen.add(perm)
                    break
            texts[start + j] = perm
        print(f"planted chain: depth {chain_depth} at doc_id {start}")
    write("documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(langs)[rng.integers(0, 5, n_doc)]),
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

    emb = rng.normal(0.0, 0.125, (n_emb, 64)).astype(np.float32)
    write("embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32())}))


if __name__ == "__main__":
    main()
