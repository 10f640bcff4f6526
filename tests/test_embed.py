"""Hashing-trick text embeddings and their composition with knn."""

import numpy as np
import pyarrow as pa
import ray.data

from dcs_ray.functions.embed import hash_embed, hash_embed_batch
from dcs_ray.functions.simsearch import knn_cosine_bruteforce

SF = "/root/testdata/sf0.001"


def _vecs(t: pa.Table) -> np.ndarray:
    return np.stack([np.asarray(v, np.float64) for v in t["embedding"].to_pylist()])


def test_hash_embed_batch_properties():
    b = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the quick brown fox",
                "the quick brown fox",
                "entirely different words here altogether",
                "",
            ],
        }
    )
    v = _vecs(hash_embed_batch(b, dim=32))
    # identical text -> identical vector; unit norm; empty -> zero
    assert np.array_equal(v[0], v[1])
    assert abs(np.linalg.norm(v[0]) - 1.0) < 1e-9
    assert np.linalg.norm(v[3]) == 0.0
    assert v[0] @ v[2] < 0.9  # different text, low similarity
    # batch-layout independence: same rows in two separate batches
    v_a = _vecs(hash_embed_batch(b.slice(0, 2), dim=32))
    v_b = _vecs(hash_embed_batch(b.slice(2, 2), dim=32))
    assert np.array_equal(np.vstack([v_a, v_b]), v)


def test_hash_embed_knn_composition(ray_session):
    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    emb = hash_embed(docs.select_columns(["doc_id", "text"]))
    import pyarrow.parquet as pq

    qt = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"],
        filters=[("doc_id", "in", [0, 1])],
    )
    qv = _vecs(hash_embed_batch(qt))
    out = knn_cosine_bruteforce(emb, qv, k=3, id_col="doc_id")
    # rank-1 hit for each query is the query doc itself with cos ~ 1
    for j, qid in enumerate(qt["doc_id"].to_pylist()):
        top = out.filter(
            pa.compute.and_(
                pa.compute.equal(out["query_id"], j),
                pa.compute.equal(out["rank"], 1),
            )
        )
        assert top["cos_sim"][0].as_py() >= 0.999999
    # deterministic across runs
    out2 = knn_cosine_bruteforce(
        hash_embed(docs.select_columns(["doc_id", "text"])), qv, k=3, id_col="doc_id"
    )
    assert out.equals(out2)
