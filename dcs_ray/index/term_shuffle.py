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
) -> pa.Table:
    """Full salted term-shuffle build → term dictionary table
    ``(term, df, max_tf, blob)`` with dcs-layout posting blobs.

    The returned table is vocab-scale (collected to the driver here for
    test/demo purposes; the scale path writes per-term-range shards from
    inside ``map_groups``)."""
    conf.validate()
    assert conf.id_col is not None
    if conf.id_max is None:
        conf.id_max = int(docs.max(conf.id_col))
    n_space = conf.id_max + 1

    postings = flat_postings(docs, conf)
    postings = postings.materialize()  # two consumers: df pre-pass + shuffle
    df_tbl = global_df(postings)
    hot_terms = df_tbl.filter(pc.greater_equal(df_tbl["df"], hot_df_threshold))["term"]
    hot_list = hot_terms.to_pylist()  # vocab-scale; broadcast by closure capture

    def add_salt(b: pa.Table) -> pa.Table:
        is_hot = pc.is_in(b["term"], value_set=pa.array(hot_list, pa.string()))
        ids = b["doc_id"].to_numpy()
        # RANGE salt: disjoint ascending doc-id runs per salt value, so
        # sub-blobs concatenate back losslessly (merge invariant)
        salt = ((ids.astype(np.uint64) * salt_factor) // n_space).astype(np.int32)
        salt = np.where(is_hot.to_numpy(zero_copy_only=False), salt, 0)
        return b.append_column("salt", pa.array(salt, pa.int32()))

    salted = postings.map_batches(add_salt, batch_format="pyarrow")

    def pack_group(group: pa.Table) -> pa.Table:
        group = group.sort_by([("doc_id", "ascending")])
        docs_np = group["doc_id"].to_numpy().astype(np.uint64)
        tfs_np = group["tf"].to_numpy().astype(np.uint64)
        offs = np.array([0, len(docs_np)], dtype=np.int64)
        blob, _o, _l = pack_postings(offs, docs_np, tfs_np)
        return pa.table(
            {
                "term": group["term"].slice(0, 1),
                "salt": group["salt"].slice(0, 1),
                "df": pa.array([len(docs_np)], pa.uint64()),
                "max_tf": pa.array([int(tfs_np.max())], pa.uint32()),
                "blob": pa.array([blob], pa.large_binary()),
            }
        )

    packed = salted.groupby(["term", "salt"]).map_groups(
        pack_group, batch_format="pyarrow"
    )
    sub = pa.concat_tables(
        pa.table(b) for b in packed.iter_batches(batch_format="pyarrow")
    ).sort_by([("term", "ascending"), ("salt", "ascending")])

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
