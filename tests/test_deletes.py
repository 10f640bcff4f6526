"""Tombstone deletes + compaction (``dcs_ray/index/deletes.py``).

dcs deletes by re-importing a package without the removed files (a full
partition rebuild, ``cmd/dcs-package-importer/importer.go:319-390``);
this engine adds the Lucene live-docs model on top: O(1)-cost tombstone
deletes folded into ranking at query time, then a physical compaction
that must be **bit-identical to a fresh build of the surviving corpus**
(the strongest equivalence available — every byte of every segment).
"""

import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data

from dcs_ray.index import IndexConfig, build_index
from dcs_ray.index.build import load_manifest
from dcs_ray.index.deletes import compact_deletes, delete_docs, load_tombstones
from dcs_ray.search import search_bm25

SF = "/root/testdata/sf0.001"
QUERY = "spark merge join"


def _build(
    out: str, id_max: int | None = None, mode: str = "words",
    positional: bool = False, drop_ids: np.ndarray | None = None,
) -> dict:
    docs = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    if drop_ids is not None:
        dead_i64 = drop_ids.astype(np.int64)

        def drop(b):
            import pyarrow as pa

            return b.filter(pa.array(~np.isin(b["doc_id"].to_numpy(), dead_i64)))

        docs = docs.map_batches(drop, batch_format="pyarrow")
    conf = IndexConfig(
        num_partitions=4, num_shards=2, mode=mode, id_col="doc_id",
        id_max=id_max, dedup_latest=False, positional=positional,
    )
    return build_index(docs, out, conf)


@pytest.fixture(scope="module")
def tombstoned(tmp_path_factory):
    """Built index + pre-delete baseline + a tombstoned delete set:
    the query's #1 doc (so exclusion provably changes the ranking)
    plus every 13th doc id (spread across all partitions)."""
    out = str(tmp_path_factory.mktemp("del") / "idx")
    _build(out)
    baseline = search_bm25(out, [QUERY], k=30)
    all_ids = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id"]
    )["doc_id"].to_numpy()
    dead = np.union1d(
        all_ids[all_ids % 13 == 0].astype(np.uint64),
        np.array([baseline["doc_id"][0].as_py()], dtype=np.uint64),
    )
    info = delete_docs(out, dead)
    return out, baseline, dead, info


def test_delete_is_idempotent_union(tombstoned):
    out, _, dead, info = tombstoned
    assert info["n_tombstones"] == len(dead)
    again = delete_docs(out, dead[: len(dead) // 2])
    assert again["n_new"] == 0
    assert again["n_tombstones"] == len(dead)
    assert np.array_equal(load_tombstones(out), np.sort(dead))


def test_tombstone_search_excludes_with_predelete_stats(tombstoned):
    """Deleted docs never surface, and survivors keep their PRE-delete
    scores (df/N/avgdl still count the dead — Lucene's semantics until
    segments merge): the post-delete top-10 must equal the pre-delete
    top-30 minus the dead set, truncated."""
    out, baseline, dead, _ = tombstoned
    got = search_bm25(out, [QUERY], k=10)
    got_ids = got["doc_id"].to_numpy()
    assert not np.isin(got_ids, dead.astype(got_ids.dtype)).any()
    assert got["doc_id"][0].as_py() != baseline["doc_id"][0].as_py()
    keep = ~np.isin(baseline["doc_id"].to_numpy(), dead)
    expect = baseline.filter(keep).slice(0, 10)
    assert got_ids.tolist() == expect["doc_id"].to_numpy().tolist()
    np.testing.assert_allclose(
        got["score"].to_numpy(), expect["score"].to_numpy(), rtol=0, atol=0
    )


def test_tombstones_compose_with_filters(tombstoned):
    """An explicit candidate restriction (doc_ids) still cannot resurrect
    a tombstoned doc."""
    out, baseline, dead, _ = tombstoned
    live = [d for d in baseline["doc_id"].to_pylist() if d not in dead][:3]
    got = search_bm25(
        out, [QUERY], k=10,
        filters={"doc_ids": [int(dead[0])] + live},
    )
    ids = set(got["doc_id"].to_pylist())
    assert int(dead[0]) not in ids
    assert ids == set(live)


def _seg_dirs(root: str) -> dict[str, str]:
    segs = os.path.join(root, "segments")
    return {n: os.path.join(segs, n) for n in sorted(os.listdir(segs))
            if n.startswith("seg_") and not n.endswith(".tmp")}


def _file_bytes(path: str) -> bytes:
    with open(path, "rb") as f:
        return f.read()


def test_compact_equals_rebuild(tombstoned, tmp_path):
    """The headline equivalence: after physical compaction every segment
    file (postings.bin, positions.bin, term_dict, pos_dict, doc_meta),
    the shards, the corpus stats and the BM25 ranking are identical to a
    from-scratch build of the surviving corpus."""
    out, _, dead, _ = tombstoned
    comp = str(tmp_path / "compacted")
    shutil.copytree(out, comp)
    id_max = load_manifest(out)["config"]["id_max"]
    metrics = compact_deletes(comp)
    assert metrics["n_tombstones"] == len(dead)
    assert not os.path.exists(os.path.join(comp, "tombstones.parquet"))

    fresh = str(tmp_path / "fresh")
    _build(fresh, id_max=id_max, drop_ids=dead)
    _assert_index_identical(comp, fresh)
    a = search_bm25(comp, [QUERY], k=10)
    b = search_bm25(fresh, [QUERY], k=10)
    assert a.equals(b)


def _assert_index_identical(comp: str, fresh: str, shards: bool = True) -> None:
    """Every segment file byte/content-identical (lineage timing fields
    excepted) and the manifest stats equal; with ``shards=True`` the
    shard files too — valid only when both indexes carry the same
    segment→shard plan (compaction PRESERVES the original plan while a
    fresh build re-plans on survivor posting weights, so callers whose
    delete sets shift the greedy split pass ``shards=False`` and rely on
    fsck provenance + search equality for the shard layer)."""
    cs, fs = _seg_dirs(comp), _seg_dirs(fresh)
    assert cs.keys() == fs.keys()
    binf = ("postings.bin", "positions.bin")
    pqf = ("term_dict.parquet", "pos_dict.parquet", "doc_meta.parquet")
    for name in cs:
        c_files = sorted(os.listdir(cs[name]))
        f_files = sorted(os.listdir(fs[name]))
        assert c_files == f_files, f"{name}: {c_files} vs {f_files}"
        for fn in c_files:
            if fn in binf:
                assert _file_bytes(os.path.join(cs[name], fn)) == _file_bytes(
                    os.path.join(fs[name], fn)
                ), f"{name}/{fn} differs"
            elif fn in pqf:
                assert pq.read_table(os.path.join(cs[name], fn)).equals(
                    pq.read_table(os.path.join(fs[name], fn))
                ), f"{name}/{fn} differs"
    # shards identical too (merge is deterministic concatenation)
    for sname in sorted(os.listdir(os.path.join(comp, "shards"))) if shards else ():
        sc = os.path.join(comp, "shards", sname)
        sf_ = os.path.join(fresh, "shards", sname)
        for fn in sorted(os.listdir(sc)):
            if fn in binf:
                assert _file_bytes(os.path.join(sc, fn)) == _file_bytes(
                    os.path.join(sf_, fn)
                ), f"shards/{sname}/{fn}"
            elif fn in pqf:
                assert pq.read_table(os.path.join(sc, fn)).equals(
                    pq.read_table(os.path.join(sf_, fn))
                ), f"shards/{sname}/{fn}"
    assert load_manifest(comp)["stats"] == load_manifest(fresh)["stats"]


def test_compact_equals_rebuild_trigram_positional(tmp_path):
    """Same bit-identity through the positional re-pack path: a trigram
    index with positions compacts to exactly what a fresh positional
    build of the survivors produces."""
    out = str(tmp_path / "idx")
    man = _build(out, mode="trigram", positional=True)
    id_max = man["config"]["id_max"]
    all_ids = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id"]
    )["doc_id"].to_numpy()
    dead = all_ids[all_ids % 11 == 4].astype(np.uint64)
    delete_docs(out, dead)
    compact_deletes(out)
    fresh = str(tmp_path / "fresh")
    _build(fresh, id_max=id_max, mode="trigram", positional=True, drop_ids=dead)
    _assert_index_identical(out, fresh)


def test_compact_touches_only_affected_partitions(tmp_path):
    """Tombstones confined to partition 0's id range leave the other
    partitions' segment bytes untouched (checked by mtime AND bytes) and
    re-merge only the shard containing seg_0."""
    out = str(tmp_path / "idx")
    man = _build(out)
    span = (man["config"]["id_max"] + 4) // 4
    all_ids = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id"]
    )["doc_id"].to_numpy()
    dead = all_ids[(all_ids < span) & (all_ids % 5 == 2)]
    assert len(dead) > 0
    delete_docs(out, dead)
    segs = _seg_dirs(out)
    before = {
        n: (os.path.getmtime(os.path.join(d, "postings.bin")),
            _file_bytes(os.path.join(d, "postings.bin")))
        for n, d in segs.items()
    }
    metrics = compact_deletes(out)
    assert metrics["n_compacted_partitions"] == 1
    assert metrics["n_remerged_shards"] == 1
    for n, d in segs.items():
        if n == "seg_000000":
            continue
        after = (os.path.getmtime(os.path.join(d, "postings.bin")),
                 _file_bytes(os.path.join(d, "postings.bin")))
        assert after == before[n], f"{n} was rewritten"


def test_compact_noop_without_tombstones(tmp_path):
    out = str(tmp_path / "idx")
    _build(out)
    assert compact_deletes(out) == {"n_compacted": 0, "n_tombstones": 0}


@pytest.fixture(scope="module")
def pristine(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pristine") / "idx")
    man = _build(out)
    return out, man["config"]["id_max"]


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_compact_equals_rebuild_randomized(pristine, tmp_path, seed):
    """Property form of the headline equivalence: for RANDOM tombstone
    sets (different density per seed, including multi-partition spreads)
    compaction remains bit-identical to the survivor rebuild."""
    out, id_max = pristine
    all_ids = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id"]
    )["doc_id"].to_numpy()
    rng = np.random.default_rng(seed)
    frac = rng.uniform(0.02, 0.4)
    dead = np.sort(
        rng.choice(all_ids, size=max(1, int(len(all_ids) * frac)), replace=False)
    ).astype(np.uint64)
    comp = str(tmp_path / "comp")
    shutil.copytree(out, comp)
    delete_docs(comp, dead)
    compact_deletes(comp)
    fresh = str(tmp_path / "fresh")
    _build(fresh, id_max=id_max, drop_ids=dead)
    _assert_index_identical(comp, fresh)
    a = search_bm25(comp, [QUERY], k=10)
    b = search_bm25(fresh, [QUERY], k=10)
    assert a.equals(b)
