"""End-to-end corpus curation — the composition a 100 TB training-data
run actually executes, built entirely from the individually-gated
operators:

    repetition/length filter  →  exact dedup (keep min id)
      →  benchmark decontamination  →  training-mixture rebalance

Every stage is deterministic, so the whole pipeline has a single SQL
oracle (see ``__ray_entry__._q_curate_corpus``).

Scale shape: stages 1 and 3 are per-batch map_batches (no exchange;
the benchmark n-gram set is a broadcast ``ray.put``), stage 4 is a
counts pass + broadcast threshold probe. Stage 2 (exact dedup) is the
only shuffle, and the DEFAULT route is the one that survives 100×: a
hash-partitioned ``groupby(content-hash bucket)`` with a vectorized
keep-min kernel per bucket (``dedup.exact_dedup_rows_keep_min``) — the
driver never holds an array proportional to the corpus. The broadcast
route (kept-id set ``ray.put`` back as a semi-join filter) remains an
explicit opt-in fast path for small corpora where one extra exchange
costs more than shipping the id set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def curate_web_corpus(
    docs: ray.data.Dataset,
    min_docs: int = 3,
    min_tokens: int = 10,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Web-text curation composition (the CCNet/C4 front half):

        source-scoped boilerplate removal (lines in ≥ ``min_docs``
        docs of one source)  →  global paragraph dedup keep-first
        →  short-doc filter on the CLEANED text  →  exact dedup
        keep-min on the cleaned text

    Returns the kept rows as ``(doc_id, n_tokens)``. Every stage is
    deterministic, so the whole chain has ONE SQL oracle
    (``__ray_entry__._q_curate_web_corpus``).

    Scale shape: both line stages exchange pure-int rows / bounded
    broadcasts (see :mod:`dcs_ray.functions.lines`); the token filter
    is per-batch; the final dedup is the hash-partitioned keep-min
    route — nothing corpus-sized ever sits on the driver.
    """
    from dcs_ray.functions.dedup import exact_dedup_rows_keep_min
    from dcs_ray.functions.lines import (
        paragraph_dedup_keep_first,
        remove_boilerplate,
    )
    from dcs_ray.functions.textstats import word_tokens_flat

    # paragraph_dedup consumes its input TWICE (occurrence pass + the
    # join-back side); a lazy `cleaned` would re-run boilerplate removal
    # (and its profile pass) per consumer — checkpoint it once into the
    # (spillable) object store instead
    cleaned = remove_boilerplate(docs, min_docs=min_docs, id_col=id_col).materialize()
    para = paragraph_dedup_keep_first(cleaned, id_col=id_col)

    def token_filter(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b.append_column("n_tokens", pa.array([], pa.int64()))
        _flat, parents = word_tokens_flat(b["text"])
        n = np.bincount(parents, minlength=len(b)).astype(np.int64)
        t = b.append_column("n_tokens", pa.array(n, pa.int64()))
        return t.filter(pa.array(n >= min_tokens))

    filtered = para.map_batches(token_filter, batch_format="pyarrow")
    kept = exact_dedup_rows_keep_min(filtered, id_col=id_col)
    return kept.select_columns([id_col, "n_tokens"])


def curate_corpus(
    docs: ray.data.Dataset,
    bench_hashes_ref,
    weights: dict[str, int],
    total_target: int,
    min_tokens: int = 15,
    max_dup_frac: float = 0.6,
    ngram_n: int = 3,
    seed: int = 11,
    id_col: str = "doc_id",
    dedup_route: str = "partitioned",
) -> ray.data.Dataset:
    """Returns the curated corpus as ``(doc_id, lang, n_tokens)``.

    ``bench_hashes_ref``: ``ray.put`` handle from
    ``filtering.benchmark_ngram_set`` (the held-out eval suite).
    ``weights`` / ``total_target``: the training-mixture target
    (``sampling.rebalance_to_weights`` semantics, integer-exact).
    ``dedup_route``: ``"partitioned"`` (default — scale-safe, no
    driver-side id set) or ``"broadcast"`` (small-N fast path).
    """
    from dcs_ray.functions.dedup import exact_dedup_keep_min, exact_dedup_rows_keep_min
    from dcs_ray.functions.filtering import ngram_hashes, repetition_stats_batch
    from dcs_ray.functions.sampling import rebalance_to_weights

    def stage_filter(b: pa.Table) -> pa.Table:
        stats = repetition_stats_batch(b, id_col)
        n_tok = stats["n_tokens"].to_numpy()
        dup = stats["dup_token_frac"].to_numpy()
        keep = (n_tok >= min_tokens) & (dup <= max_dup_frac)
        return b.append_column(
            "n_tokens", stats["n_tokens"]
        ).filter(pa.array(keep))

    def stage_decontam(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b
        bench = ray.get(bench_hashes_ref)
        parents, h = ngram_hashes(b["text"], ngram_n)
        contaminated = np.zeros(len(b), bool)
        if len(h) and len(bench):
            idx = np.searchsorted(bench, h)
            hit = (idx < len(bench)) & (bench[np.minimum(idx, len(bench) - 1)] == h)
            contaminated[parents[hit]] = True
        return b.filter(pa.array(~contaminated))

    if dedup_route == "partitioned":
        # single-consumer stages stream straight into the dedup exchange;
        # nothing is materialized until `clean` (two consumers: the
        # rebalance counts pass + the final threshold filter)
        filtered = docs.map_batches(stage_filter, batch_format="pyarrow")
        deduped = exact_dedup_rows_keep_min(filtered, id_col=id_col)
        clean = deduped.map_batches(
            stage_decontam, batch_format="pyarrow"
        ).materialize()
    else:
        # checkpoint: the filtered set has THREE consumers here (dedup
        # agg, the decontam pass, and through it the rebalance counts +
        # final pass) — materialize once into the (spillable) object
        # store instead of re-reading and re-tokenizing per consumer
        filtered = docs.map_batches(stage_filter, batch_format="pyarrow").materialize()
        kept_ids = np.sort(
            np.concatenate(
                [np.empty(0, np.int64)]
                + [
                    pa.table(b)[f"min({id_col})"].to_numpy().astype(np.int64)
                    for b in exact_dedup_keep_min(filtered, id_col=id_col).iter_batches(
                        batch_format="pyarrow"
                    )
                ]
            )
        )
        ids_ref = ray.put(kept_ids)

        def stage_dedup(b: pa.Table) -> pa.Table:
            ids = ray.get(ids_ref)
            rows = b[id_col].to_numpy()
            pos = np.searchsorted(ids, rows)
            in_kept = (pos < len(ids)) & (ids[np.minimum(pos, len(ids) - 1)] == rows)
            return b.filter(pa.array(in_kept))

        clean = filtered.map_batches(
            lambda b: stage_decontam(stage_dedup(b)), batch_format="pyarrow"
        ).materialize()

    balanced = rebalance_to_weights(
        clean, "lang", weights, total_target, id_col=id_col, seed=seed
    )
    return balanced.select_columns([id_col, "lang", "n_tokens"])
