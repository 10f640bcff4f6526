"""Benchmark harness — headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-stage sec...}, "sf": ..., "num_cpus": N,
   "throughput": {...docs/sec etc...}}

``--scaling`` runs the headline build+query job twice in fresh
subprocesses (num_cpus=8 and num_cpus=32 — the sandbox proxy for N vs
4N nodes) and reports both throughputs plus scaling efficiency
(BASELINE.json criterion: ≥ 0.8).

Modeled on the reference's replay harness
(``cmd/dcs/replay.go:472-546``: per-phase wall-clock JSON measurements).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BM25_QUERIES = [
    "spark merge join",
    "customer window batch",
    "the fast key order",
    "vector column agg",
    "stream group query",
    "slow filter line",
    "hash part big",
    "data row table scan",
    "small value order",
    "dup batch merge window",
] * 2  # 20 queries


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    os.environ.setdefault("RAY_DEDUP_LOGS", "1")
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import numpy as np
    import pyarrow.parquet as pq

    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.index.build import parquet_col_max
    from dcs_ray.functions.dedup import exact_dedup_keep_min, minhash_candidate_pairs
    from dcs_ray.functions.simsearch import knn_cosine_bruteforce
    from dcs_ray.search import search_bm25

    out_root = f"/tmp/dcs_ray_bench_{num_cpus}"
    shutil.rmtree(out_root, ignore_errors=True)
    queries: dict[str, float] = {}
    thr: dict[str, float] = {}

    # warm the worker pool before timing (a 100 TB cluster is long-lived;
    # cold worker spawn is not part of steady-state throughput)
    ray.data.range(num_cpus * 4).map_batches(lambda b: b).count()

    # --- index build (the headline ETL) ---
    t0 = time.monotonic()
    # prune at the read: the build needs only (doc_id, text)
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    idx = os.path.join(out_root, "words")
    manifest = build_index(
        docs,
        idx,
        IndexConfig(
            num_partitions=max(num_cpus, 8), num_shards=4, mode="words",
            id_col="doc_id", dedup_latest=False,
            id_max=parquet_col_max(f"{sf_dir}/documents.parquet", "doc_id"),
        ),
    )
    build_s = time.monotonic() - t0
    queries["index_build"] = round(build_s, 3)
    n_docs = manifest["stats"]["n_docs"]
    n_postings = sum(p["n_postings"] for p in manifest["partitions"])
    thr["build_docs_per_s"] = round(n_docs / build_s, 1)
    thr["build_postings_per_s"] = round(n_postings / build_s, 1)

    # --- BM25 query batch (QPS) ---
    t0 = time.monotonic()
    res = search_bm25(idx, BM25_QUERIES, k=10)
    q_s = time.monotonic() - t0
    assert len(res) > 0
    queries["bm25_search"] = round(q_s, 3)
    thr["query_qps"] = round(len(BM25_QUERIES) / q_s, 2)

    # --- exact dedup ---
    t0 = time.monotonic()
    exact_dedup_keep_min(ray.data.read_parquet(f"{sf_dir}/documents.parquet")).count()
    queries["dedup_exact"] = round(time.monotonic() - t0, 3)

    # --- minhash candidate pairs ---
    t0 = time.monotonic()
    minhash_candidate_pairs(ray.data.read_parquet(f"{sf_dir}/documents.parquet")).count()
    queries["minhash_pairs"] = round(time.monotonic() - t0, 3)

    # --- knn brute force ---
    t0 = time.monotonic()
    q0 = pq.read_table(f"{sf_dir}/embeddings.parquet").slice(0, 1)["embedding"].to_pylist()[0]
    knn_cosine_bruteforce(
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet"), np.array([q0]), k=10
    )
    queries["knn_cosine"] = round(time.monotonic() - t0, 3)

    ray.shutdown()
    shutil.rmtree(out_root, ignore_errors=True)
    return {
        "metric": "dcs_ray headline: index build + BM25 search + dedup + knn",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_docs": n_docs,
        "n_postings": n_postings,
        "throughput": thr,
    }


def run_scaling(sf_dir: str, low: int = 8, high: int = 32) -> dict:
    """Same job at two parallelism levels in fresh processes."""
    results = {}
    for cpus in (low, high):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpus", str(cpus), "--sf", sf_dir],
            capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    lo, hi = results[low], results[high]
    ratio = high / low
    eff = {}
    for key in ("build_docs_per_s", "build_postings_per_s", "query_qps"):
        speedup = hi["throughput"][key] / max(lo["throughput"][key], 1e-9)
        eff[key] = round(speedup / ratio, 3)
    return {
        "metric": f"scaling efficiency {low}->{high} cpus",
        "value": round(sum(eff.values()) / len(eff), 3),
        "unit": "efficiency",
        "sf": sf_dir,
        "low": lo,
        "high": hi,
        "efficiency": eff,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--scaling", action="store_true")
    args = ap.parse_args()
    if args.scaling:
        out = run_scaling(args.sf)
    else:
        out = run_bench(args.sf, args.cpus)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
