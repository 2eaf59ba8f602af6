#!/usr/bin/env python
"""Deterministic scale-corpus generator (r4 verdict item 2).

Synthesizes documents / embeddings / events parquet with the SAME
shapes as the driver's sf0.1 fixtures (vocab word-salad text with
appended-" dup" near-duplicates, 64-d clustered embeddings, 30-day
user event log) at a chosen size multiplier, so the bounded operator
families can be MEASURED at two corpus scales and the candidate-count
bounds checked empirically instead of analytically.

Two distribution knobs follow real-corpus scaling laws rather than
naively copying the fixture:

- **Vocabulary grows linearly with the multiplier** (Heaps-law-ish):
  a fixed 31-word vocab at 10× the documents would make every 3-gram
  shingle posting 10× denser and the collision-bounded candidate count
  grow quadratically — an artifact of the synthetic corpus, not of the
  operators. Real web corpora add vocabulary as they grow; scaling the
  vocab keeps postings density comparable so the measurement isolates
  the OPERATOR's growth, not the fixture's collapsing diversity.
- **Event users grow linearly** so the entity-level relations (the
  ts-similarity totals, per-user spines) scale the way a real fact
  table's entity dimension does.

Seed-pinned end to end; regenerating with the same (mult, seed) is
byte-stable modulo parquet metadata.
"""

from __future__ import annotations

import argparse
import json
import os

import math
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

#: parts per table (r10 verdict item 4): single-file corpora made every
#: map-only kernel serialize onto ONE task between scale points, so
#: wall-time exponents confounded operator growth with task granularity
#: — 32 parts keeps all 32 local cores busy at every multiplier. The
#: table path becomes a DIRECTORY of part files (Spark reads it
#: identically); --files 1 restores the old single-file layout.
DEFAULT_FILES = 32


def _write(tbl: pa.Table, out_dir: str, name: str, n_files: int) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    if os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.isfile(path):
        os.remove(path)
    if n_files <= 1:
        pq.write_table(tbl, path)
        return
    os.makedirs(path)
    step = max(1, math.ceil(tbl.num_rows / n_files))
    for i in range(n_files):
        part = tbl.slice(i * step, step)
        if part.num_rows == 0:
            break
        pq.write_table(part, os.path.join(path, f"part-{i:05d}.parquet"))

BASE_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "fr", "es", "de"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
N_SOURCES = 20
BASE_DOCS = 5_000
BASE_EMB = 2_000
BASE_EVENTS = 100_000
BASE_USERS = 1_500
EMB_DIM = 64
N_CLUSTERS = 10
DUP_EVERY = 20  #: every DUP_EVERY-th doc is a near-dup (text + " dup")
EPOCH_2024 = 1_704_067_200_000_000  # 2024-01-01T00:00:00 in epoch micros

#: --zipf mode (round 6): real 100 TB corpora are not uniform — they
#: carry boilerplate text shared across a third of all documents, a
#: Zipfian source mix, power-law users, and one dominant embedding
#: cluster. The uniform corpora in SCALING.json can never expose a
#: hot-key cliff; this mode plants each classic skew axis
#: deterministically so tools/measure_skew.py can measure which
#: operator defenses hold and which collapse.
BOILERPLATE = "the data table scan filter join"  # 4 shared 3-gram shingles
#: carrier residues mod 10 — still 30% incidence, but DE-ALIASED from
#: the doc_id % 5 history/incoming split every incremental operator
#: uses (round-7 finding: the original rule, doc_id % 10 < 3, maps to
#: residues {0,1,2} mod 5 — the incoming slice doc_id % 5 == 4 could
#: structurally NEVER carry boilerplate, so the ingest-gate skew
#: measurement was blind to the exact cliff it exists to expose).
#: {0, 4, 7} puts carriers in both slices (incoming: doc_id%10==4 →
#: half the incoming slice; history: {0,7} → a quarter of history)
#: while keeping the planted near-dup pairs (residues 8,9 mod 10)
#: boilerplate-free, as the recall measurements assume.
BOILERPLATE_RESIDUES = (0, 4, 7)


def _zipf_probs(n: int, s: float) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return p / p.sum()


def gen_documents(
    out_dir: str, mult: float, rng: np.random.Generator, zipf: bool = False,
    n_files: int = DEFAULT_FILES,
) -> int:
    n = int(BASE_DOCS * mult)
    vocab = [
        w if i == 0 else f"{w}{i}"
        for i in range(max(int(round(mult)), 1))
        for w in BASE_VOCAB
    ]
    vocab = np.array(vocab)
    lengths = rng.integers(10, 101, size=n)
    langs = rng.choice(LANGS, size=n, p=LANG_W)
    texts: list[str] = []
    for i in range(n):
        if i % DUP_EVERY == DUP_EVERY - 1 and i > 0:
            texts.append(texts[i - 1] + " dup")
            continue
        words = vocab[rng.integers(0, len(vocab), size=int(lengths[i]))]
        body = " ".join(words)
        if zipf and i % 10 in BOILERPLATE_RESIDUES:
            # shared boilerplate tail: 30% of docs carry 4 identical
            # 3-gram shingles, each with document frequency 0.3·n —
            # the inverted-index stressor (legal footers, cookie
            # banners, license headers in real crawls)
            body = f"{body} {BOILERPLATE}"
        texts.append(body)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs.tolist(), pa.string()),
            "source": pa.array(
                [
                    f"src{j}"
                    for j in rng.choice(
                        N_SOURCES, size=n, p=_zipf_probs(N_SOURCES, 1.2)
                    )
                ]
                if zipf
                else [f"src{i % N_SOURCES}" for i in range(n)]
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    _write(tbl, out_dir, "documents", n_files)
    return n


def gen_embeddings(
    out_dir: str, mult: float, rng: np.random.Generator, zipf: bool = False,
    n_files: int = DEFAULT_FILES,
) -> int:
    n = int(BASE_EMB * mult)
    centers = rng.normal(0.0, 1.0, size=(N_CLUSTERS, EMB_DIM))
    if zipf:
        # one dominant semantic cluster (~45% of vectors): the
        # in-bucket quadratic stressor for semantic dedup partitioners
        labels = rng.choice(
            N_CLUSTERS, size=n, p=_zipf_probs(N_CLUSTERS, 1.5)
        ).astype(np.int64)
    else:
        labels = rng.integers(0, N_CLUSTERS, size=n)
    vecs = centers[labels] * 2.0 + rng.normal(0.0, 1.0, size=(n, EMB_DIM))
    # every 25th vector is a semantic near-dup of its predecessor
    for i in range(25, n, 25):
        vecs[i] = vecs[i - 1] + rng.normal(0.0, 0.01, size=EMB_DIM)
        labels[i] = labels[i - 1]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.tolist(), pa.int32()),
        }
    )
    _write(tbl, out_dir, "embeddings", n_files)
    return n


def gen_events(
    out_dir: str, mult: float, rng: np.random.Generator, zipf: bool = False,
    n_files: int = DEFAULT_FILES,
) -> int:
    n = int(BASE_EVENTS * mult)
    n_users = int(BASE_USERS * mult)
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = np.sort(rng.integers(0, span_us, size=n)) + EPOCH_2024
    if zipf:
        # power-law activity: the top user owns ~1/H(n_users) ≈ 9-10%
        # of ALL events — the per-entity window/session stressor (a
        # bot, a load tester, a scraper in any real event log)
        user_ids = rng.choice(
            n_users, size=n, p=_zipf_probs(n_users, 1.0)
        ).astype(np.int64)
    else:
        user_ids = rng.integers(0, n_users, size=n)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts.tolist(), pa.timestamp("us")),
            "user_id": pa.array(user_ids.tolist(), pa.int64()),
            "event_type": pa.array(
                rng.choice(EVENT_TYPES, size=n).tolist(), pa.string()
            ),
            "value": pa.array(
                np.round(rng.gamma(1.0, 50.0, size=n), 2).tolist(),
                pa.float64(),
            ),
            "props": pa.array(
                [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, size=n)]
            ),
        }
    )
    _write(tbl, out_dir, "events", n_files)
    return n


BASE_CUSTOMERS = 15_000


def gen_customer(
    out_dir: str, mult: float, rng: np.random.Generator,
    n_files: int = DEFAULT_FILES,
) -> int:
    """Minimal customer dimension (the columns the streaming-throughput
    changelog synthesizer reads) so the streaming path can also be
    measured at a second scale."""
    n = int(BASE_CUSTOMERS * mult)
    segs = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]
    tbl = pa.table(
        {
            "c_custkey": pa.array(range(n), pa.int64()),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)]),
            "c_mktsegment": pa.array(rng.choice(segs, size=n).tolist()),
            "c_acctbal": pa.array(
                np.round(rng.uniform(-999.99, 9999.99, size=n), 2).tolist(),
                pa.float64(),
            ),
        }
    )
    _write(tbl, out_dir, "customer", n_files)
    return n


def generate_corpus(
    out_dir: str, mult: float, seed: int = 7, zipf: bool = False,
    n_files: int = DEFAULT_FILES,
) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    counts = {
        "documents": gen_documents(out_dir, mult, rng, zipf, n_files),
        "embeddings": gen_embeddings(out_dir, mult, rng, zipf, n_files),
        "events": gen_events(out_dir, mult, rng, zipf, n_files),
        "customer": gen_customer(out_dir, mult, rng, n_files),
    }
    with open(os.path.join(out_dir, "GEN.json"), "w") as f:
        json.dump(
            {"mult": mult, "seed": seed, "zipf": zipf, "files": n_files,
             **counts},
            f,
        )
    return counts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--mult", type=float, default=10.0)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--files", type=int, default=DEFAULT_FILES)
    ap.add_argument(
        "--zipf",
        action="store_true",
        help="plant the four classic skew axes (boilerplate shingles, "
        "Zipfian sources, power-law users, dominant embedding cluster)",
    )
    args = ap.parse_args()
    print(
        json.dumps(
            generate_corpus(
                args.out, args.mult, args.seed, args.zipf, args.files
            )
        )
    )


if __name__ == "__main__":
    main()
