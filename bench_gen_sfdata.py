#!/usr/bin/env python3
"""Generate an sf1.0-SHAPED dataset for local scale measurement.

The driver's round-end bench may run at sf1.0 (BENCH_r05.json: sf=1.0,
files=500000) but /root/testdata only ships sf0.001/0.01/0.1 and is
read-only. This script fabricates /root/sfdata/sf1.0 with the same
schemas and 10x the row counts of sf0.1, matching sf0.1's EMPIRICAL
per-row distributions (token vocabulary and doc-length histogram for
``documents``, normal(0, .125) 64-dim ``embeddings``, the 30-day event
window with 10x users for ``events``, replica-key-offset TPC-H tables).

Measurement tooling only — NOT part of the frozen bench harness and
not a substitute for the driver's generator: absolute numbers may
differ slightly from the driver's sf1.0, but plan shapes and scaling
behaviour (what OPTIMIZATION_r06.md cites it for) carry over.

Usage: python bench_gen_sfdata.py [sf_multiple] [out_root]
       (defaults: 10 /root/sfdata  ->  /root/sfdata/sf1.0)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    root = sys.argv[2] if len(sys.argv) > 2 else "/root/sfdata"
    sf = 0.1 * mult
    out = os.path.join(root, f"sf{sf:.1f}" if sf == int(sf) else f"sf{sf:g}")
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)

    # --- documents: resample sf0.1's vocabulary / length histogram ---
    src_docs = pq.read_table(f"{SRC}/documents.parquet")
    vocab = sorted({t for x in src_docs["text"].to_pylist() for t in x.split()})
    n_chars_emp = np.asarray(src_docs["n_chars"].to_pylist())
    lang_vals, lang_counts = np.unique(
        np.asarray(src_docs["lang"].to_pylist()), return_counts=True
    )
    n_docs = len(src_docs) * mult
    tgt_chars = rng.choice(n_chars_emp, size=n_docs)
    mean_tok = np.mean([len(w) for w in vocab]) + 1.0
    texts = []
    varr = np.array(vocab)
    for tc in tgt_chars:
        n_tok = max(4, int(round(tc / mean_tok)))
        texts.append(" ".join(rng.choice(varr, size=n_tok)))
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                rng.choice(lang_vals, size=n_docs, p=lang_counts / lang_counts.sum())
            ),
            "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, f"{out}/documents.parquet")
    print("documents", n_docs)

    # --- embeddings: 64-dim normal(0, .125), labels 0-9 ---
    n_vec = 2000 * mult
    emb = rng.normal(0.0, 0.125, size=(n_vec, 64)).astype(np.float64)
    embeddings = pa.table(
        {
            "vec_id": pa.array(np.arange(n_vec), pa.int64()),
            "embedding": pa.array(list(emb), pa.list_(pa.float64())),
            "label": pa.array(rng.integers(0, 10, size=n_vec), pa.int64()),
        }
    )
    pq.write_table(embeddings, f"{out}/embeddings.parquet")
    print("embeddings", n_vec)

    # --- events: same 30-day window, 10x rows and users ---
    n_ev = 100_000 * mult
    t0 = np.datetime64("2024-01-01T00:00:00")
    span_us = 30 * 86_400 * 1_000_000
    ts = t0 + np.sort(rng.integers(0, span_us, size=n_ev)).astype("timedelta64[us]")
    events = pa.table(
        {
            "event_id": pa.array(np.arange(n_ev), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, 1500 * mult, size=n_ev), pa.int64()),
            "event_type": pa.array(
                rng.choice(
                    ["view", "click", "purchase", "signup", "error"], size=n_ev
                )
            ),
            "value": pa.array(np.round(rng.exponential(50.0, size=n_ev), 2)),
            "props": pa.array(
                [f'{{"k": {k}}}' for k in rng.integers(0, 100, size=n_ev)]
            ),
        }
    )
    pq.write_table(events, f"{out}/events.parquet")
    print("events", n_ev)

    # --- TPC-H tables: replica copies with key offsets ---
    offsets = {
        "l_orderkey": 150_000, "o_orderkey": 150_000,
        "o_custkey": 15_000, "c_custkey": 15_000,
        "l_partkey": 20_000, "p_partkey": 20_000,
        "l_suppkey": 1_000, "s_suppkey": 1_000,
    }
    for name in ("customer", "supplier", "part", "orders", "lineitem"):
        t = pq.read_table(f"{SRC}/{name}.parquet")
        reps = []
        for i in range(mult):
            cols = {}
            for field in t.schema:
                col = t[field.name]
                if field.name in offsets and i:
                    cols[field.name] = pa.array(
                        np.asarray(col.to_pylist()) + offsets[field.name] * i,
                        field.type,
                    )
                else:
                    cols[field.name] = col
            reps.append(pa.table(cols))
        pq.write_table(pa.concat_tables(reps), f"{out}/{name}.parquet")
        print(name, len(t) * mult)
    for name in ("nation", "region"):
        pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"), f"{out}/{name}.parquet")
    print("done:", out)


if __name__ == "__main__":
    main()
