"""Incremental index update: replace one partition, re-merge only its
shard, refresh stats — the dcs package re-import flow
(``cmd/dcs-package-importer/importer.go:319-390``)."""

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
import ray.data

from dcs_ray.index import IndexConfig, build_index
from dcs_ray.index.build import load_manifest, update_partition
from dcs_ray.search import search_bm25

SF = "/root/testdata/sf0.001"


def _dir_digest(path: str) -> dict:
    out = {}
    for root, _d, files in os.walk(path):
        for f in sorted(files):
            p = os.path.join(root, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, path)] = hashlib.sha256(fh.read()).hexdigest()
    return out


@pytest.fixture()
def small_index(tmp_path, ray_session):
    out = str(tmp_path / "upd_index")
    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    conf = IndexConfig(
        num_partitions=4, num_shards=2, mode="words", id_col="doc_id",
        url_col="url", dedup_latest=False,
    )
    build_index(docs, out, conf)
    return out


def test_update_partition_reflects_new_docs(small_index):
    out = small_index
    man = load_manifest(out)
    # partition 0 covers ids [0, 125); swap doc 7's text
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    part0 = tbl.filter(pc.less(tbl["doc_id"], 125))
    texts = part0["text"].to_pylist()
    ids = part0["doc_id"].to_pylist()
    texts[ids.index(7)] = "zzzuniquetoken appears exactly here once"
    new_docs = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})

    # shard 1 must not be touched at all
    other_before = _dir_digest(os.path.join(out, "shards", "shard_0001"))

    res_before = search_bm25(out, ["zzzuniquetoken"], k=5)
    assert len(res_before) == 0

    man2 = update_partition(out, 0, new_docs)
    assert man2["metrics"]["last_update"]["part_id"] == 0

    res = search_bm25(out, ["zzzuniquetoken"], k=5).to_pandas()
    assert res.doc_id.tolist() == [7]

    other_after = _dir_digest(os.path.join(out, "shards", "shard_0001"))
    assert other_before == other_after  # byte-identical untouched shard

    # stats refreshed: the new term is in the global df table
    df = pq.read_table(os.path.join(out, "stats", "df.parquet")).to_pandas()
    assert "zzzuniquetoken" in set(df.term)
    # doc count unchanged (replacement, not append)
    assert man2["stats"]["n_docs"] == man["stats"]["n_docs"]


def test_update_partition_rejects_out_of_span_ids(small_index):
    bad = pa.table(
        {"doc_id": pa.array([400], pa.int64()), "text": pa.array(["nope"])}
    )
    with pytest.raises(ValueError, match="span"):
        update_partition(small_index, 0, bad)


def test_update_unknown_partition_raises(small_index):
    docs = pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    with pytest.raises(ValueError, match="not in index"):
        update_partition(small_index, 99, docs)
