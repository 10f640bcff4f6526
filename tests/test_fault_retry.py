"""Transient-task-failure absorption: a build whose tasks hiccup once
(application-level exceptions) completes on Ray task retries and
produces a byte-identical index — the determinism-under-retry property
that makes ``IndexConfig.task_max_retries`` safe at cluster scale
(write_segment/merge are tmp+rename idempotent, segment.py:269)."""

import os

import pyarrow as pa
import ray.data

from dcs_ray.index import IndexConfig, build_index
from dcs_ray.search import search_bm25
from test_deletes import _assert_index_identical

SF = "/root/testdata/sf0.001"
Q = "spark merge join"


def _flaky(marker_dir: str):
    """Raise exactly once per distinct batch (cross-process markers on
    the shared filesystem), succeed on the retry."""

    def fn(b: pa.Table) -> pa.Table:
        key = int(b["doc_id"][0].as_py())
        m = os.path.join(marker_dir, f"b{key}")
        if not os.path.exists(m):
            open(m, "w").close()
            raise RuntimeError("injected transient failure")
        return b

    return fn


def test_build_absorbs_transient_task_failures(tmp_path, ray_session):
    markers = tmp_path / "markers"
    markers.mkdir()
    conf = IndexConfig(
        num_partitions=4, num_shards=2, mode="words", id_col="doc_id",
        dedup_latest=False, task_max_retries=3,
    )
    clean = str(tmp_path / "clean")
    flaky_out = str(tmp_path / "flaky")
    build_index(ray.data.read_parquet(f"{SF}/documents.parquet"), clean, conf)
    flaky_docs = ray.data.read_parquet(f"{SF}/documents.parquet").map_batches(
        _flaky(str(markers)),
        batch_format="pyarrow",
        retry_exceptions=True,
        max_retries=3,
    )
    build_index(flaky_docs, flaky_out, conf)
    assert len(os.listdir(markers)) > 0  # the failures actually fired
    _assert_index_identical(clean, flaky_out)
    r_clean = search_bm25(clean, [Q], k=10)
    r_flaky = search_bm25(flaky_out, [Q], k=10)
    assert r_clean.equals(r_flaky)


def test_retry_disabled_is_default(ray_session):
    assert IndexConfig().task_max_retries == 0
