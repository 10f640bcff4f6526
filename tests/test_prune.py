"""Static index pruning: per-term caps hold, selection is the exact
global top-m, lossless when m >= max df, and the pruned generation
serves unchanged search paths."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from dcs_ray.index import IndexConfig, build_index
from dcs_ray.index.prune import prune_index
from dcs_ray.search import search_bm25


def _corpus():
    # tf gradient: doc i repeats 'hot' i%7+1 times; 'rare' in 3 docs
    texts = []
    for i in range(40):
        t = ("hot " * (i % 7 + 1)) + f"filler{i}"
        if i % 13 == 0:
            t += " rare"
        texts.append(t)
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(40), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )


def _build(tmp_path, name):
    idx = str(tmp_path / name)
    build_index(
        _corpus(), idx,
        IndexConfig(num_partitions=4, num_shards=2, mode="words",
                    id_col="doc_id", dedup_latest=False),
    )
    return idx


def test_prune_caps_and_exact_selection(tmp_path):
    idx = _build(tmp_path, "full")
    out = str(tmp_path / "pruned")
    summary = prune_index(idx, out, m=5)
    assert summary["n_shards"] == 2
    # per-term global cap holds across ALL shards combined
    import glob

    per_term = {}
    for td in glob.glob(f"{out}/shards/shard_*/term_dict.parquet"):
        t = pq.read_table(td)
        for term, df in zip(t["term"].to_pylist(), t["df"].to_pylist()):
            per_term[term] = per_term.get(term, 0) + df
    assert all(v <= 5 for v in per_term.values())
    # 'hot' kept docs = exact top-5 by (tf desc, doc_id asc):
    # tf = i%7+1, so tf=7 at i=6,13,20,27,34 -> lowest five ids win
    from dcs_ray.codec import decode_postings
    from dcs_ray.index.segment import Segment

    kept = []
    for sd in sorted(glob.glob(f"{out}/shards/shard_*")):
        seg = Segment(sd)
        i = seg.term_index("hot")
        if i >= 0:
            ids, tfs = decode_postings(seg.term_blob(i))
            kept += list(zip(ids.tolist(), tfs.tolist()))
    assert sorted(kept) == [(6, 7), (13, 7), (20, 7), (27, 7), (34, 7)]
    # rare term (df=4 <= m) survives whole
    assert per_term["rare"] == 4


def test_prune_lossless_when_m_large(tmp_path):
    idx = _build(tmp_path, "full2")
    out = str(tmp_path / "pruned_all")
    prune_index(idx, out, m=1000)
    a = search_bm25(idx, ["hot rare"], k=10)
    b = search_bm25(out, ["hot rare"], k=10)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    np.testing.assert_allclose(
        a["score"].to_numpy(), b["score"].to_numpy(), rtol=0, atol=0
    )


def test_tiered_service_exactness_and_routing(tmp_path):
    """Tail queries (all terms df <= m) route to the pruned tier and are
    bit-identical to the full index; head queries fall back. Results
    from the tiered service always equal the full service's."""
    from dcs_ray.service import TieredSearchService, search_service

    idx = _build(tmp_path, "full3")
    out = str(tmp_path / "pruned3")
    prune_index(idx, out, m=5)  # 'hot' df=40 > 5; 'rare'/'fillerN' df <= 5

    qs = ["rare filler0", "hot rare", "filler7"]
    with TieredSearchService(idx, out) as tiered, search_service(idx) as full:
        got = tiered.search(qs, k=10)
        want = full.search(qs, k=10)
        assert got.sort_by([("query_id", "ascending"), ("rank", "ascending")]).equals(
            want.sort_by([("query_id", "ascending"), ("rank", "ascending")])
        )
        info = tiered.routing_info()
        # queries 0 and 2 are all-rare -> pruned tier; query 1 has 'hot'
        assert tiered.route("rare filler0") == "pruned"
        assert tiered.route("hot rare") == "full"
        assert info == {"m": 5, "pruned_served": 2, "full_served": 1}


def test_prune_preserves_meta_columns_and_is_idempotent(tmp_path):
    """doc_meta (filters, priors) survives pruning — filtered and
    prior-weighted search work on the pruned tier — and a second
    prune_index call over the same target is a no-op resume."""
    import pyarrow as pa
    import ray.data

    texts = [("hot " * (i % 7 + 1)) + f"w{i}" for i in range(40)]
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(40), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ).map_batches(
        lambda b: b.append_column(
            "grp", pa.array((b["doc_id"].to_numpy() % 2).astype("U1"))
        ).append_column(
            "prior", pa.array(1.0 + (b["doc_id"].to_numpy() % 5) / 10.0)
        ),
        batch_format="pyarrow",
    )
    idx = str(tmp_path / "meta_full")
    build_index(
        docs, idx,
        IndexConfig(num_partitions=4, num_shards=2, mode="words",
                    id_col="doc_id", dedup_latest=False,
                    meta_cols=("grp", "prior")),
    )
    out = str(tmp_path / "meta_pruned")
    s1 = prune_index(idx, out, m=5)
    # filters and priors work on the pruned generation
    f = search_bm25(out, ["hot"], k=10, filters={"include": {"grp": ["1"]}})
    ids = f["doc_id"].to_pylist()
    assert ids and all(i % 2 == 1 for i in ids)
    p = search_bm25(out, ["hot"], k=10, prior_col="prior")
    assert p.num_rows > 0
    # idempotent resume: same summary, shards untouched
    import glob
    import os

    mtimes = {d: os.stat(d).st_mtime_ns for d in glob.glob(f"{out}/shards/shard_*")}
    s2 = prune_index(idx, out, m=5)
    assert s2["n_postings"] == s1["n_postings"]
    assert {d: os.stat(d).st_mtime_ns for d in glob.glob(f"{out}/shards/shard_*")} == mtimes
