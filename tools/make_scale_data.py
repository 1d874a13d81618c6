"""Synthetic sf1/sf2 generator for scale-evidence runs (VERDICT r5
item 1 / r6 item 2): every 100x-design claim in this repo is a
plan-shape argument validated at sf0.1, so this tool manufactures a
10x/20x dataset with the SAME schema and distribution family as the
driver's testdata and lets tools/scale_bench.py measure whether
rows/s holds when the data grows 10-20x.

Distribution-matched, not copied: marginals (word frequencies, doc
lengths, lang/source mix, event-type mix, key ranges, near-duplicate
density) are ESTIMATED from the read-only sf0.1 tables, then sampled
fresh from a seeded RNG at the target multiple. Only the five tables
the ten heaviest operators read are generated (documents, embeddings,
events, orders, lineitem).

Usage: python tools/make_scale_data.py [multiplier] [out_dir]
  default: multiplier 10 (-> "sf1"), out_dir scaledata/sf1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# sf0.1 near-dup structure (measured): ~8/5000 exact dups, ~228
# shared-60-char-prefix groups -> mutate-copy ~5%, exact-copy ~0.2%
P_MUTATE_COPY = 0.05
P_EXACT_COPY = 0.002


def _documents(k: int, rng: np.random.Generator) -> pa.Table:
    base = pq.read_table(f"{SRC}/documents.parquet")
    texts = base.column("text").to_pylist()
    langs = base.column("lang").to_pylist()
    sources = base.column("source").to_pylist()
    words, counts = np.unique(
        np.concatenate([np.array(t.split()) for t in texts]), return_counts=True
    )
    p = counts / counts.sum()
    lang_vals, lang_counts = np.unique(langs, return_counts=True)
    src_vals, src_counts = np.unique(sources, return_counts=True)
    n = len(texts) * k

    out_text: list[str] = []
    for i in range(n):
        r = rng.random()
        if i > 10 and r < P_EXACT_COPY:
            out_text.append(out_text[rng.integers(0, i)])
            continue
        if i > 10 and r < P_MUTATE_COPY + P_EXACT_COPY:
            donor = out_text[rng.integers(0, i)].split()
            n_mut = max(1, len(donor) // 12)
            for _ in range(n_mut):
                donor[rng.integers(0, len(donor))] = words[
                    rng.choice(len(words), p=p)
                ]
            out_text.append(" ".join(donor))
            continue
        nw = rng.integers(10, 101)
        out_text.append(" ".join(words[rng.choice(len(words), size=nw, p=p)]))
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(out_text, pa.string()),
            "lang": pa.array(
                rng.choice(lang_vals, size=n, p=lang_counts / lang_counts.sum()),
                pa.string(),
            ),
            "source": pa.array(
                rng.choice(src_vals, size=n, p=src_counts / src_counts.sum()),
                pa.string(),
            ),
            "n_chars": pa.array([len(t) for t in out_text], pa.int64()),
        }
    )


def _embeddings(k: int, rng: np.random.Generator) -> pa.Table:
    base = pq.read_table(f"{SRC}/embeddings.parquet")
    labels = np.asarray(base.column("label").to_pylist())
    vecs = np.asarray(base.column("embedding").to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]
    lab_vals, lab_counts = np.unique(labels, return_counts=True)
    centers = {v: vecs[labels == v].mean(axis=0) for v in lab_vals}
    resid = {v: vecs[labels == v].std(axis=0).mean() for v in lab_vals}
    n = len(labels) * k
    new_labels = rng.choice(lab_vals, size=n, p=lab_counts / lab_counts.sum())
    new_vecs = np.stack(
        [
            centers[v] + rng.standard_normal(dim).astype(np.float32) * resid[v]
            for v in new_labels
        ]
    ).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                [row for row in new_vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(new_labels.astype(np.int32), pa.int32()),
        }
    )


def _events(k: int, rng: np.random.Generator) -> pa.Table:
    n = 100_000 * k
    n_users = 1_500 * k
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = t0 + np.sort(rng.integers(0, span_us, size=n)).astype("timedelta64[us]")
    types = rng.choice(
        np.array(["click", "view", "purchase", "signup", "error"]), size=n
    )
    props = np.char.add(
        np.char.add('{"k": ', rng.integers(0, 100, size=n).astype(str)), "}"
    )
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, n_users, size=n), pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(
                np.round(rng.random(size=n) * 560.0, 2), pa.float64()
            ),
            "props": pa.array(props, pa.string()),
        }
    )


def _orders(k: int, rng: np.random.Generator) -> pa.Table:
    n = 150_000 * k
    n_cust = 15_000 * k
    d0 = np.datetime64("1995-01-01", "us")
    span_us = int(6.6 * 365 * 24 * 3600 * 1_000_000)
    return pa.table(
        {
            "o_orderkey": pa.array(np.arange(n), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, n_cust, size=n), pa.int64()),
            "o_orderstatus": pa.array(
                rng.choice(np.array(["O", "P", "F"]), size=n), pa.string()
            ),
            "o_totalprice": pa.array(
                np.round(1000 + rng.random(size=n) * 499_000, 2), pa.float64()
            ),
            "o_orderdate": pa.array(
                d0 + rng.integers(0, span_us, size=n).astype("timedelta64[us]"),
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(
                rng.choice(
                    np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-LOW"]), size=n
                ),
                pa.string(),
            ),
        }
    )


def _lineitem(k: int, rng: np.random.Generator) -> pa.Table:
    n = 600_000 * k
    n_orders = 150_000 * k
    n_supp = 1_000 * k
    n_part = 20_000 * k
    d0 = np.datetime64("1995-01-01", "us")
    span_us = int(7 * 365 * 24 * 3600 * 1_000_000)
    return pa.table(
        {
            "l_orderkey": pa.array(rng.integers(0, n_orders, size=n), pa.int64()),
            "l_partkey": pa.array(rng.integers(0, n_part, size=n), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, n_supp, size=n), pa.int64()),
            "l_linenumber": pa.array(
                rng.integers(1, 8, size=n).astype(np.int32), pa.int32()
            ),
            "l_quantity": pa.array(
                rng.integers(1, 51, size=n).astype(np.float64), pa.float64()
            ),
            "l_extendedprice": pa.array(
                np.round(900 + rng.random(size=n) * 104_000, 2), pa.float64()
            ),
            "l_discount": pa.array(
                np.round(rng.integers(0, 11, size=n) / 100.0, 2), pa.float64()
            ),
            "l_tax": pa.array(
                np.round(rng.integers(0, 9, size=n) / 100.0, 2), pa.float64()
            ),
            "l_returnflag": pa.array(
                rng.choice(np.array(["A", "N", "R"]), size=n), pa.string()
            ),
            "l_linestatus": pa.array(
                rng.choice(np.array(["O", "F"]), size=n), pa.string()
            ),
            "l_shipdate": pa.array(
                d0 + rng.integers(0, span_us, size=n).astype("timedelta64[us]"),
                pa.timestamp("us"),
            ),
        }
    )


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(__file__)),
                          "scaledata", f"sf{k/10:g}")
    )
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42 + k)
    for name, fn in (
        ("documents", _documents),
        ("embeddings", _embeddings),
        ("events", _events),
        ("orders", _orders),
        ("lineitem", _lineitem),
    ):
        path = os.path.join(out, f"{name}.parquet")
        tbl = fn(k, rng)
        pq.write_table(tbl, path)
        print(f"{path}: {tbl.num_rows} rows")


if __name__ == "__main__":
    main()
