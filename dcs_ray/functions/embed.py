"""Deterministic text embeddings via the hashing trick (feature
hashing, Weinberger et al. 2009 — public algorithm): each word token
hashes to a dimension bucket and a ±1 sign; the signed bucket counts,
L2-normalized, are the document vector.

This is the embedding-generation stage of a training-data pipeline
with the model swapped for a deterministic featurizer: no weights to
ship, identical output on every run/cluster size, and the output
feeds the existing similarity stack (`knn_cosine_bruteforce`,
`LshAnnIndex`, `IvfAnnIndex`) unchanged. A real neural encoder drops
into the same slot as an actor-pool ``map_batches`` class (see
``QualityClassifier`` / `multimodal.py` for that shape).

Scale shape: one tokenizer pass + one ``np.add.at`` scatter per batch
— O(tokens) with no exchange; the output column is ``dim`` float32 per
doc regardless of text length.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from dcs_ray.tokenize import word_tokens_flat

from .sketches import _hash64_column


def hash_embed_batch(
    batch: pa.Table, dim: int = 64, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """(id, embedding list<float32>[dim]): signed hashed bag-of-words,
    L2-normalized (empty docs stay zero vectors)."""
    flat, parents = word_tokens_flat(batch[text_col])
    n = len(batch)
    vecs = np.zeros((n, dim), np.float64)
    if len(flat):
        h = _hash64_column(flat)
        bucket = (h % np.uint64(dim)).astype(np.int64)
        sign = np.where((h >> np.uint64(63)).astype(bool), -1.0, 1.0)
        np.add.at(vecs, (parents, bucket), sign)
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs / np.where(norms == 0, 1.0, norms)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(vecs.astype(np.float32).ravel(), pa.float32()), dim
    ).cast(pa.list_(pa.float32()))
    return pa.table({id_col: batch[id_col], "embedding": emb})


def hash_embed(
    ds: ray.data.Dataset,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: hash_embed_batch(b, dim, id_col, text_col),
        batch_format="pyarrow",
    )
