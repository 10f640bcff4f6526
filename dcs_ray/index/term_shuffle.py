"""Alternate build path: the literal wide ``groupby(term)`` shuffle with
explicit salting of hot terms (SURVEY §2.5 A1, §4 skew row).

The default build (``build.py``) never ships individual postings through
an all-to-all exchange: terms are grouped *inside* each document
partition (the combiner) and segments are merged by byte concatenation,
which is the dcs architecture itself (per-package index → ConcatN,
``internal/index/merge.go:152-250``) and the cheaper plan at any scale.
This module implements the textbook alternative for inputs where
per-partition grouping is impossible (e.g. postings arriving pre-flattened
from an external tokenizer) and as the explicit demonstration of
skew-handled term shuffling the north rule names:

    tokenize → (term, doc_id, tf) rows
      → df pre-pass (per-batch partial counts, vocab-scale driver merge)
      → hot terms (df ≥ threshold) get a RANGE salt: doc_id·S // N —
        range (not hash) salting keeps each sub-list a disjoint ascending
        doc-id run, so the S sub-blobs of a hot term concatenate back
        into one valid posting blob with no re-encode (same invariant as
        the shard merge)
      → groupby(term, salt).map_groups(pack block-max varint blob)
      → per-term salt-ordered byte concat → (term, df, max_tf, blob)

dcs's own skew mitigation is dropping the hottest trigram outright
(``internal/index/write.go:346,403``); salting keeps hot terms queryable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dcs_ray.codec import pack_postings
from dcs_ray.index.config import IndexConfig
from dcs_ray.tokenize import tokenize_batch_words_grouped


def flat_postings(docs: ray.data.Dataset, conf: IndexConfig) -> ray.data.Dataset:
    """Tokenize to flat posting rows ``(term, doc_id, tf)``."""

    def tok(batch: pa.Table) -> pa.Table:
        ids = batch[conf.id_col].to_numpy().astype(np.uint64)
        order = np.argsort(ids, kind="stable")  # grouped tokenizer needs ascending ids
        batch = batch.take(pa.array(order))
        ids = ids[order]
        uniq, offs, p_doc, p_tf, _dl = tokenize_batch_words_grouped(
            batch[conf.text_col], ids
        )
        reps = np.diff(offs)
        term_idx = np.repeat(np.arange(len(reps)), reps)
        return pa.table(
            {
                "term": uniq.take(pa.array(term_idx)),
                "doc_id": pa.array(p_doc, pa.uint64()),
                "tf": pa.array(p_tf.astype(np.uint32), pa.uint32()),
            }
        )

    return docs.map_batches(tok, batch_format="pyarrow")


def global_df(postings: ray.data.Dataset) -> pa.Table:
    """Document frequency per term via the combiner pattern: per-batch
    partial counts (vocab-scale rows) merged with one driver-side Arrow
    group_by — no corpus-scale shuffle."""

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by("term").aggregate([("doc_id", "count")])
        return pa.table({"term": g["term"], "n": g["doc_id_count"]})

    parts = [
        pa.table(b)
        for b in postings.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    cat = pa.concat_tables(parts)
    g = cat.group_by("term").aggregate([("n", "sum")])
    return pa.table({"term": g["term"], "df": g["n_sum"].cast(pa.uint64())})


def build_postings_term_shuffle(
    docs: ray.data.Dataset,
    conf: IndexConfig,
    hot_df_threshold: int = 1024,
    salt_factor: int = 8,
    stats_out: dict | None = None,
) -> pa.Table:
    """Full salted term-shuffle build → term dictionary table
    ``(term, df, max_tf, blob)`` with dcs-layout posting blobs.
    ``salt_factor`` CAPS the per-term slice count; the actual fan-out is
    adaptive, ceil(df / hot_df_threshold), giving constant slice SIZE.

    The returned table is vocab-scale (collected to the driver here for
    test/demo purposes; the scale path writes per-term-range shards from
    inside ``map_groups``).

    ``stats_out``: pass a dict to collect straggler evidence from the
    pack stage — per-(Ray task, group) pack walls, aggregated per task
    (``task_wall_ms``), plus the stage wall. This is how the skew
    record (``bench.py --skew``) shows salting bounding the
    max-task/median-task ratio where the unsalted shuffle cannot."""
    conf.validate()
    assert conf.id_col is not None
    if conf.id_max is None:
        conf.id_max = int(docs.max(conf.id_col))
    n_space = conf.id_max + 1

    postings = flat_postings(docs, conf)
    postings = postings.materialize()  # two consumers: df pre-pass + shuffle
    df_tbl = global_df(postings)
    hot_tbl = df_tbl.filter(pc.greater_equal(df_tbl["df"], hot_df_threshold))
    hot_terms_arr = hot_tbl["term"].combine_chunks()
    # constant SLICE SIZE, not constant fan-out: each hot term splits
    # into ceil(df / threshold) range slices (capped at ``salt_factor``),
    # so after salting NO group exceeds the row count the heaviest
    # unsalted term already has — a fixed fan-out either under-splits
    # the df-100% term or leaves the just-below-threshold term as the
    # new straggler (both measured in the --skew record's history).
    s_per = np.minimum(
        np.ceil(hot_tbl["df"].to_numpy().astype(np.float64) / hot_df_threshold),
        float(max(salt_factor, 1)),
    ).astype(np.uint64)
    hot_list = hot_terms_arr.to_pylist()  # vocab-scale; closure broadcast

    def add_salt(b: pa.Table) -> pa.Table:
        from dcs_ray.functions.sketches import _hash64_column

        if len(s_per) == 0:  # no hot terms anywhere: every salt is 0
            s = np.ones(len(b), np.uint64)
        else:
            idx = pc.index_in(
                b["term"], value_set=pa.array(hot_list, pa.string())
            )
            idxn = pc.fill_null(idx, -1).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            s = np.where(idxn >= 0, s_per[np.maximum(idxn, 0)], 1).astype(np.uint64)
        ids = b["doc_id"].to_numpy()
        # RANGE salt: disjoint ascending doc-id runs per salt value, so
        # sub-blobs concatenate back losslessly (merge invariant)
        salt = ((ids.astype(np.uint64) * s) // n_space).astype(np.int32)
        # SCATTER key: Ray Data's groupby shuffle is sort-range
        # partitioned, so keying by (term, salt) alone places all S
        # sub-lists of a hot term ADJACENTLY — few range partitions
        # inherit every slice and the straggler the salt exists to
        # break comes right back (measured: S=64 read WORSE than S=32
        # before this). Hashing (term, salt) into the leading sort key
        # spreads the slices uniformly; group identity stays the exact
        # (term, salt) pair carried behind it.
        h = _hash64_column(b["term"])
        skey = (h + salt.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        return b.append_column("salt", pa.array(salt, pa.int32())).append_column(
            "skey", pa.array(skey, pa.uint64())
        )

    salted = postings.map_batches(add_salt, batch_format="pyarrow")

    measure = stats_out is not None

    def pack_group(group: pa.Table) -> pa.Table:
        import time as _time

        t0 = _time.monotonic() if measure else 0.0
        group = group.sort_by([("doc_id", "ascending")])
        docs_np = group["doc_id"].to_numpy().astype(np.uint64)
        tfs_np = group["tf"].to_numpy().astype(np.uint64)
        offs = np.array([0, len(docs_np)], dtype=np.int64)
        blob, _o, _l = pack_postings(offs, docs_np, tfs_np)
        out = pa.table(
            {
                "term": group["term"].slice(0, 1),
                "salt": group["salt"].slice(0, 1),
                "df": pa.array([len(docs_np)], pa.uint64()),
                "max_tf": pa.array([int(tfs_np.max())], pa.uint32()),
                "blob": pa.array([blob], pa.large_binary()),
            }
        )
        if measure:
            # a map_groups task packs MANY groups sequentially — tag each
            # group's wall with its Ray task id so the driver can
            # aggregate true per-task pack walls (the straggler unit)
            import ray as _ray

            tid = _ray.get_runtime_context().get_task_id() or "driver"
            out = out.append_column(
                "pack_task", pa.array([tid], pa.string())
            ).append_column(
                "pack_ms",
                pa.array([(_time.monotonic() - t0) * 1e3], pa.float64()),
            )
        return out

    import time as _t

    t_pack0 = _t.monotonic()
    packed = salted.groupby(["skey", "term", "salt"]).map_groups(
        pack_group, batch_format="pyarrow"
    )
    sub = pa.concat_tables(
        pa.table(b) for b in packed.iter_batches(batch_format="pyarrow")
    ).sort_by([("term", "ascending"), ("salt", "ascending")])
    if measure:
        stats_out["pack_stage_wall_s"] = _t.monotonic() - t_pack0
        agg = sub.group_by("pack_task").aggregate([("pack_ms", "sum")])
        stats_out["task_wall_ms"] = dict(
            zip(agg["pack_task"].to_pylist(), agg["pack_ms_sum"].to_pylist())
        )
        stats_out["group_wall_ms_max"] = float(
            pc.max(sub["pack_ms"]).as_py() or 0.0
        )
        sub = sub.drop_columns(["pack_task", "pack_ms"])

    # second-level merge: salt-ordered byte concat per term (pure concat —
    # the docid-rebase of merge.go:252-341 is precomputed into the ids)
    terms = sub["term"].to_pylist()
    out_t, out_df, out_mtf, out_blob = [], [], [], []
    i = 0
    while i < len(terms):
        j = i
        df_sum, mtf, blobs = 0, 0, []
        while j < len(terms) and terms[j] == terms[i]:
            df_sum += sub["df"][j].as_py()
            mtf = max(mtf, sub["max_tf"][j].as_py())
            blobs.append(sub["blob"][j].as_py())
            j += 1
        out_t.append(terms[i])
        out_df.append(df_sum)
        out_mtf.append(mtf)
        out_blob.append(b"".join(blobs))
        i = j
    return pa.table(
        {
            "term": pa.array(out_t, pa.string()),
            "df": pa.array(out_df, pa.uint64()),
            "max_tf": pa.array(out_mtf, pa.uint32()),
            "blob": pa.array(out_blob, pa.large_binary()),
        }
    )
