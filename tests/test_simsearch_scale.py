"""Scale-path similarity search: distributed block-pair exact near-dup,
OR-amplified SRP LSH near-dup, and the persistent bucket-partitioned ANN
index (probed rows ≪ corpus)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from dcs_ray.functions.simsearch import (
    LshAnnIndex,
    knn_cosine_bruteforce,
    near_dup_pairs_exact,
    near_dup_pairs_lsh,
)

SF = "/root/testdata/sf0.001"


def _emb_ds():
    return ray.data.read_parquet(f"{SF}/embeddings.parquet")


def test_block_pair_exact_equals_single_block(ray_session):
    """The distributed block-pair cross product must emit exactly the
    same pair set regardless of block count."""
    one = near_dup_pairs_exact(_emb_ds(), threshold=0.42, num_blocks=1).to_pandas()
    many = near_dup_pairs_exact(_emb_ds(), threshold=0.42, num_blocks=5).to_pandas()
    assert one.reset_index(drop=True).equals(many.reset_index(drop=True))
    assert len(one) > 0


def test_near_dup_lsh_recall(ray_session):
    exact = near_dup_pairs_exact(_emb_ds(), threshold=0.42).to_pandas()
    out = near_dup_pairs_lsh(_emb_ds(), threshold=0.42)
    meta = {k.decode(): v.decode() for k, v in (out.schema.metadata or {}).items()}
    approx = out.to_pandas()
    e = set(zip(exact.id_a, exact.id_b))
    a = set(zip(approx.id_a, approx.id_b))
    assert a <= e  # LSH candidates are verified exactly — no false pairs
    assert len(a) >= 0.7 * len(e), (len(a), len(e))  # measured recall
    # size-aware banding keeps every bucket under the cap at this scale
    assert meta["capped_buckets"] == "0" and meta["dropped_ids"] == "0", meta


def test_near_dup_lsh_recall_holds_at_10x(ray_session):
    """Grow the corpus 10× by replication: the derived banding must get
    FINER (more bits), keep every bucket under the cap, and hold recall
    — the failure mode VERDICT r2 flagged was fixed banding slamming
    every bucket into the cap as N grows."""
    import pyarrow.parquet as pq

    base = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    n = base.num_rows
    reps = []
    for r in range(10):
        ids = pa.array((base["vec_id"].to_numpy() + r * n).astype("int64"))
        reps.append(pa.table({"vec_id": ids, "embedding": base["embedding"]}))
    big = pa.concat_tables(reps)
    ds = ray.data.from_arrow(big).repartition(16)

    out = near_dup_pairs_lsh(ds, threshold=0.42, max_bucket=1024)
    meta = {k.decode(): v.decode() for k, v in (out.schema.metadata or {}).items()}
    approx = out.to_pandas()
    # banding derived finer than the small-corpus default of 2 bits
    assert int(meta["bits_per_table"]) > 2, meta
    assert meta["capped_buckets"] == "0", meta
    # recall vs the replicated exact pair set, restricted to replica 0
    # internal pairs (identical to the base corpus's exact pairs)
    exact = near_dup_pairs_exact(_emb_ds(), threshold=0.42).to_pandas()
    e = set(zip(exact.id_a, exact.id_b))
    a = set(zip(approx.id_a, approx.id_b)) & {
        (i, j) for (i, j) in zip(approx.id_a, approx.id_b) if i < n and j < n
    }
    assert a <= e
    assert len(a) >= 0.7 * len(e), (len(a), len(e))


def test_lsh_ann_index_probes_subset(ray_session, tmp_path):
    idx_dir = str(tmp_path / "lshann")
    idx = LshAnnIndex.build(_emb_ds(), idx_dir, num_planes=6)
    import pyarrow.parquet as pq

    q0 = np.array(
        pq.read_table(f"{SF}/embeddings.parquet").slice(0, 1)["embedding"].to_pylist()
    )
    res = idx.query(q0, k=10, probe_hamming=1).to_pandas()
    # the query IS vector 0 → must be found at cos 1.0, rank 1
    assert res.iloc[0].vec_id == 0
    assert res.iloc[0].cos_sim == 1.0
    # a real index probes a strict subset of the corpus
    assert 0 < idx.last_probed_rows < idx.total_rows, (
        idx.last_probed_rows, idx.total_rows,
    )
    # probe radius 1 over 6 planes opens ≤ 7/64 of the bucket space;
    # with ~uniform buckets that is ≪ half the corpus
    assert idx.last_probed_rows < 0.5 * idx.total_rows
    # recall vs brute force on the probed top-10
    exact = knn_cosine_bruteforce(_emb_ds(), q0, k=10).to_pandas()
    inter = set(exact.vec_id) & set(res.vec_id)
    assert len(inter) >= 3


def test_lsh_ann_index_reopen(ray_session, tmp_path):
    idx_dir = str(tmp_path / "lshann2")
    vecs = pa.table(
        {
            "vec_id": pa.array(range(50), pa.int64()),
            "embedding": pa.array(
                [np.eye(8)[i % 8].tolist() for i in range(50)],
                pa.list_(pa.float32()),
            ),
        }
    )
    LshAnnIndex.build(ray.data.from_arrow(vecs), idx_dir, num_planes=4)
    idx = LshAnnIndex(idx_dir)  # re-open from disk
    res = idx.query(np.eye(8)[3][None, :], k=5, probe_hamming=0).to_pandas()
    assert len(res) > 0
    assert (res.cos_sim <= 1.0).all()
    found = set(res.vec_id)
    assert any(v % 8 == 3 for v in found)  # the matching direction found


def test_ivf_ann_index_probes_subset(ray_session, tmp_path):
    from dcs_ray.functions.simsearch import IvfAnnIndex

    idx_dir = str(tmp_path / "ivfann")
    idx = IvfAnnIndex.build(_emb_ds(), idx_dir, num_lists=16)
    import pyarrow.parquet as pq

    q0 = np.array(
        pq.read_table(f"{SF}/embeddings.parquet").slice(0, 1)["embedding"].to_pylist()
    )
    res = idx.query(q0, k=10, nprobe=3).to_pandas()
    # the query IS vector 0 → its own list is the nearest → found at 1.0
    assert res.iloc[0].vec_id == 0
    assert res.iloc[0].cos_sim == 1.0
    # probing 3/16 lists reads a strict subset of the corpus
    assert 0 < idx.last_probed_rows < 0.6 * idx.total_rows, (
        idx.last_probed_rows, idx.total_rows,
    )
    # measured recall vs brute force (the synthetic embeddings are
    # near-random in high dim — weakly clustered — so recall at a ~50%
    # probe fraction is moderate by construction; same bar as the LSH
    # index test)
    exact = knn_cosine_bruteforce(_emb_ds(), q0, k=10).to_pandas()
    inter = set(exact.vec_id) & set(res.vec_id)
    assert len(inter) >= 3, inter


def test_ivf_ann_index_reopen_deterministic(ray_session, tmp_path):
    from dcs_ray.functions.simsearch import IvfAnnIndex, knn_cosine_ivf

    idx_dir = str(tmp_path / "ivfann2")
    IvfAnnIndex.build(_emb_ds(), idx_dir, num_lists=8)
    idx = IvfAnnIndex(idx_dir)  # re-open from disk
    import pyarrow.parquet as pq

    q = np.array(
        pq.read_table(f"{SF}/embeddings.parquet").slice(5, 2)["embedding"].to_pylist()
    )
    r1 = idx.query(q, k=5, nprobe=2).to_pandas()
    r2 = knn_cosine_ivf(_emb_ds(), q, k=5, num_lists=8, nprobe=2, index_dir=idx_dir).to_pandas()
    assert r1.equals(r2)  # reuse path == reopen path, deterministic
    assert set(r1.query_id) == {0, 1}


def test_lsh_ann_multitable_recall_and_dedup(ray_session, tmp_path):
    """4 independent SRP tables with query-directed multiprobe: better
    recall than a single table at a fraction of the probed rows, and no
    duplicate ids in the result despite each vec being stored 4 times."""
    import pyarrow.parquet as pq

    idx_dir = str(tmp_path / "lshann_l4")
    idx = LshAnnIndex.build(_emb_ds(), idx_dir, num_planes=6, num_tables=4)
    q0 = np.array(
        pq.read_table(f"{SF}/embeddings.parquet").slice(0, 1)["embedding"].to_pylist()
    )
    res = idx.query(q0, k=10, probe_t=8).to_pandas()
    assert res.vec_id.is_unique
    assert res.iloc[0].vec_id == 0 and res.iloc[0].cos_sim == 1.0
    # probes 8 of 64 buckets in each of 4 tables — ≪ the 4N stored rows
    assert idx.last_probed_rows < 0.3 * idx.total_rows
    exact = knn_cosine_bruteforce(_emb_ds(), q0, k=10).to_pandas()
    assert len(set(exact.vec_id) & set(res.vec_id)) >= 5
    # monotone: a larger probe budget never loses recall
    res_small = idx.query(q0, k=10, probe_t=4).to_pandas()
    assert len(set(exact.vec_id) & set(res.vec_id)) >= len(
        set(exact.vec_id) & set(res_small.vec_id)
    )
    # reopen from disk preserves the multi-table layout
    idx2 = LshAnnIndex(idx_dir)
    assert idx2.num_tables == 4 and idx2.tables.shape[0] == 4


def test_group_centroids_layout_independent(ray_session):
    """Partial-sum combiner gives identical centroids at any block
    layout; centroid of a single-vector label is the vector itself."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.simsearch import group_centroids

    rng = np.random.default_rng(3)
    n, d = 200, 8
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    labels = np.concatenate([rng.integers(0, 5, n - 1), [99]]).astype(np.int64)
    t = pa.table(
        {
            "label": pa.array(labels, pa.int32()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        }
    )
    outs = []
    for parts in (1, 7):
        out = (
            group_centroids(ray.data.from_arrow(t).repartition(parts))
            .to_pandas()
            .sort_values(["label", "dim"])
            .reset_index(drop=True)
        )
        outs.append(out)
    np.testing.assert_allclose(
        outs[0].centroid.values, outs[1].centroid.values, atol=1e-12
    )
    solo = outs[0][outs[0].label == 99]
    np.testing.assert_allclose(
        solo.centroid.values, vecs[-1].astype(np.float64), atol=1e-7
    )


def test_knn_classify_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.simsearch import knn_classify

    rng = np.random.default_rng(5)
    n, d = 120, 16
    vecs = rng.normal(size=(n, d))
    labels = rng.integers(0, 3, n)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32).tolist() for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )
    qids = np.array([3, 7], np.int64)
    out = knn_classify(
        ray.data.from_arrow(t).repartition(4),
        vecs[qids].astype(np.float32), qids, k=7,
    )
    # local reference: float32-quantized rows vs float64 queries,
    # matching the engine's storage/compute precision split
    stored = vecs.astype(np.float32).astype(np.float64)
    stored /= np.linalg.norm(stored, axis=1, keepdims=True)
    for row, qi in enumerate(qids):
        qv = vecs[qi].astype(np.float32).astype(np.float64)
        qv /= np.linalg.norm(qv)
        sims = stored @ qv
        order = np.lexsort((np.arange(n), -sims))
        nbrs = [i for i in order if i != qi][:7]
        u, c = np.unique(labels[nbrs], return_counts=True)
        w = np.lexsort((u, -c))[0]
        assert out["pred_label"].to_pylist()[row] == u[w]
        assert out["votes"].to_pylist()[row] == c[w]
        assert out["query_vec_id"].to_pylist()[row] == qi


def test_centroid_classify_separable_clusters(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dcs_ray.functions.simsearch import centroid_classify

    rng = np.random.default_rng(9)
    # three well-separated clusters around orthogonal axes
    centers = np.eye(3, 12) * 10
    vecs, labels = [], []
    for lbl in range(3):
        vecs.append(centers[lbl] + rng.normal(scale=0.1, size=(40, 12)))
        labels += [lbl] * 40
    vecs = np.concatenate(vecs)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32).tolist() for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(np.asarray(labels, np.int32), pa.int32()),
        }
    )
    qids = np.array([0, 45, 85], np.int64)
    out = centroid_classify(
        ray.data.from_arrow(t).repartition(5),
        vecs[qids].astype(np.float32), qids,
    )
    assert out["pred_label"].to_pylist() == [0, 1, 2]
    assert min(out["cos_sim"].to_pylist()) > 0.9


def test_ivf_hash_min_lloyd_no_aliasing(ray_session, tmp_path):
    """init='hash_min' with n_iter > 0 must run Lloyd on a training
    matrix that does NOT alias the centroid array (review r5 #1: the
    old `x = cent = ...` let `cent[c] = x[m].mean(...)` overwrite
    training rows mid-iteration, corrupting every later centroid).
    Expected centroids are recomputed in pure numpy from the same
    hash-min rows."""
    import numpy as np
    import ray.data

    from dcs_ray.functions.simsearch import (
        IvfAnnIndex,
        _emb_matrix,
        _hash_min_rows,
        _normalize,
    )

    emb = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = str(tmp_path / "ivf_hm_lloyd")
    idx = IvfAnnIndex.build(emb, out, num_lists=8, n_iter=2, init="hash_min")

    picked = _hash_min_rows(
        ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet"),
        8, "vec_id", "embedding",
    )
    x = _normalize(_emb_matrix(picked["embedding"]))
    cent = x.copy()
    for _ in range(2):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = x[m].mean(axis=0)
        cent = _normalize(cent)
    np.testing.assert_allclose(idx.centroids, cent, atol=1e-12)
