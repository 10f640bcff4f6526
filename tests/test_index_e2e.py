"""End-to-end: build index over sf0.001 documents → BM25 search matches a
DuckDB oracle rank-identically; merge equivalence; resume.

Mirrors the reference's conformance anchors (``SURVEY.md §5``):
exact-tuple query results (``internal/index/concatn_test.go:107-266``)
and merge equivalence index(A∪B) ≡ merge(index(A), index(B))."""

import json
import os
import shutil

import duckdb
import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data

from dcs_ray.index import IndexConfig, build_index
from dcs_ray.index.build import load_manifest
from dcs_ray.search import load_stats, search_bm25, search_literal

SF = "/root/testdata/sf0.001"

BM25_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(
    regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len)::double / (SELECT count(*) FROM documents) FROM dl) AS avgdl
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
q AS (SELECT unnest({terms}) AS term),
scores AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * tf.tf * (1.2 + 1.0)
              / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.doc_len / stats.avgdl))
         ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
  WHERE tf.term IN (SELECT term FROM q)
  GROUP BY tf.doc_id
)
SELECT doc_id, score FROM scores ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


@pytest.fixture(scope="module")
def built_index(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx") / "docs_index")
    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    conf = IndexConfig(
        num_partitions=6, num_shards=2, mode="words", id_col="doc_id",
        url_col="url", dedup_latest=False,
    )
    manifest = build_index(docs, out, conf)
    return out, manifest


def test_manifest_and_lineage(built_index):
    out, manifest = built_index
    assert manifest["stats"]["n_docs"] == 500
    assert len(manifest["partitions"]) == 6
    assert len(manifest["shards"]) == 2
    assert sum(p["n_docs"] for p in manifest["partitions"]) == 500
    # lineage records carry counts + checksums per partition (north rule)
    for p in manifest["partitions"]:
        assert {"n_postings", "checksum", "wall_s"} <= set(p)


def test_bm25_rank_identical_to_duckdb(built_index):
    out, _ = built_index
    queries = [
        "spark merge join",
        "customer window batch",
        "the fast key",
        "vector",
        "nonexistentterm spark",
    ]
    res = search_bm25(out, queries, k=10).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    from dcs_ray.tokenize import tokenize_query_words

    for qid, q in enumerate(queries):
        terms = sorted(tokenize_query_words(q))
        term_list = "[" + ",".join(f"'{t}'" for t in terms) + "]"
        want = con.execute(BM25_SQL.format(terms=term_list, k=10)).df()
        got = res[res.query_id == qid]
        assert got.doc_id.astype(int).tolist() == want.doc_id.astype(int).tolist(), q
        np.testing.assert_allclose(got.score.to_numpy(), want.score.to_numpy(), rtol=1e-12)


def test_maxscore_bit_identical_to_exhaustive(built_index):
    """Block-max WAND/MaxScore pruning must not change a single bit of the
    result (exact top-k; deterministic re-sum in term order, SURVEY §7.5)."""
    out, _ = built_index
    queries = [
        "spark merge join",
        "the a of to",       # all high-df terms — pruning engages
        "vector",             # single term
        "the spark nonexistentterm",
        "customer window batch the of",
    ]
    for k in (3, 10, 100):
        ex = search_bm25(out, queries, k=k, method="exhaustive").to_pandas()
        ms = search_bm25(out, queries, k=k, method="maxscore").to_pandas()
        assert ex.doc_id.tolist() == ms.doc_id.tolist()
        np.testing.assert_array_equal(ex.score.to_numpy(), ms.score.to_numpy())


def test_merge_equivalence(built_index, tmp_path):
    """index(all docs, 1 partition) ≡ merged shards (concatn_test.go:107-170)."""
    out, _ = built_index
    solo = str(tmp_path / "solo")
    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    build_index(
        docs, solo,
        IndexConfig(num_partitions=1, num_shards=1, mode="words", id_col="doc_id",
                    url_col="url", dedup_latest=False),
    )
    res_a = search_bm25(out, ["spark merge join", "vector window"], k=20).to_pandas()
    res_b = search_bm25(solo, ["spark merge join", "vector window"], k=20).to_pandas()
    assert res_a.doc_id.tolist() == res_b.doc_id.tolist()
    np.testing.assert_array_equal(res_a.score.to_numpy(), res_b.score.to_numpy())
    # df stats identical too
    a = pq.read_table(os.path.join(out, "stats/df.parquet")).to_pandas()
    b = pq.read_table(os.path.join(solo, "stats/df.parquet")).to_pandas()
    assert a.equals(b)


def test_resume_skips_completed_partitions(built_index, tmp_path):
    """Kill-after-partial-build resume: byte-identical final segments
    (north rule checkpoint criterion; dcs importer.go:399-466)."""
    out, _ = built_index
    resumed = str(tmp_path / "resumed")
    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    conf = IndexConfig(num_partitions=6, num_shards=2, mode="words", id_col="doc_id",
                      url_col="url", dedup_latest=False)
    # simulate a killed build: copy only 2 finished segments, no manifest
    os.makedirs(os.path.join(resumed, "segments"))
    for seg in sorted(os.listdir(os.path.join(out, "segments")))[:2]:
        shutil.copytree(os.path.join(out, "segments", seg), os.path.join(resumed, "segments", seg))
    before = {}
    for seg in os.listdir(os.path.join(resumed, "segments")):
        with open(os.path.join(resumed, "segments", seg, "lineage.json")) as f:
            before[seg] = json.load(f)["checksum"]
    manifest = build_index(docs, resumed, conf)
    assert manifest["stats"]["n_docs"] == 500
    # the pre-existing segments were not rebuilt (same checksum object)
    for seg, cks in before.items():
        with open(os.path.join(resumed, "segments", seg, "lineage.json")) as f:
            assert json.load(f)["checksum"] == cks
    # and the resumed index answers identically
    r1 = search_bm25(out, ["spark merge join"], k=10).to_pandas()
    r2 = search_bm25(resumed, ["spark merge join"], k=10).to_pandas()
    assert r1.doc_id.tolist() == r2.doc_id.tolist()


@pytest.fixture(scope="module")
def trigram_index(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx") / "tri_index")
    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    conf = IndexConfig(num_partitions=4, num_shards=2, mode="trigram", id_col="doc_id",
                      url_col="url", dedup_latest=False, positional=True)
    build_index(docs, out, conf)
    return out


def test_trigram_candidates_match_like(trigram_index):
    """Exact trigram AND-candidates == docs containing every trigram
    (verified against substring containment per trigram in DuckDB)."""
    out = trigram_index
    lits = ["spark merge", "customer"]
    res = search_literal(out, lits, positional=False).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    from dcs_ray.tokenize import string_trigrams

    for qid, lit in enumerate(lits):
        tris = sorted(set(string_trigrams(lit)))
        conds = " AND ".join(
            "contains(text, '" + bytes([t >> 16, (t >> 8) & 255, t & 255]).decode().replace("'", "''") + "')"
            for t in tris
        )
        want = con.execute(
            f"SELECT doc_id FROM documents WHERE {conds} ORDER BY doc_id"
        ).df()
        got = sorted(set(res[res.query_id == qid].doc_id.astype(int).tolist()))
        assert got == want.doc_id.astype(int).tolist(), lit


def test_positional_matches_exact(trigram_index):
    """Positional join returns exact byte offsets of every occurrence
    (QueryPositional semantics, read.go:530-676)."""
    out = trigram_index
    lit = "spark merge"
    res = search_literal(out, [lit], positional=True).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    want = []
    for _, row in docs.iterrows():
        start = 0
        while True:
            i = row.text.find(lit, start)
            if i < 0:
                break
            want.append((int(row.doc_id), i))
            start = i + 1
    got = [(int(r.doc_id), int(r.position)) for r in res.itertuples()]
    assert sorted(got) == sorted(want)


def test_empty_corpus_builds_wellformed_index(ray_session, tmp_path):
    """An empty input must yield a searchable zero-term index, not a
    crash — at web scale a crawl slice can legitimately be empty."""
    import pyarrow as pa

    out = str(tmp_path / "empty_idx")
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "url": pa.array([], pa.string()),
            "text": pa.array([], pa.string()),
        }
    )
    m = build_index(
        ray.data.from_arrow(empty), out,
        IndexConfig(num_partitions=2, num_shards=1, mode="words",
                    id_col="doc_id", id_max=0, dedup_latest=False),
    )
    assert m["stats"]["n_docs"] == 0
    assert len(search_bm25(out, ["spark"], k=5)) == 0


def test_cleanup_stale_removes_only_tmp(tmp_path):
    """cleanup_stale removes *.tmp files/dirs, leaves committed state."""
    import os

    from dcs_ray.index.build import cleanup_stale

    root = tmp_path / "idx"
    (root / "segments" / "seg_000000").mkdir(parents=True)
    (root / "segments" / "seg_000001.tmp").mkdir()
    (root / "segments" / "seg_000001.tmp" / "junk.bin").write_bytes(b"x")
    (root / "shards.tmp").mkdir()
    (root / "MANIFEST.json.tmp").write_text("{}")
    (root / "MANIFEST.json").write_text("{}")
    (root / "segments" / "seg_000000" / "lineage.json").write_text("{}")
    removed = cleanup_stale(str(root))
    assert len(removed) == 3
    assert not (root / "segments" / "seg_000001.tmp").exists()
    assert not (root / "shards.tmp").exists()
    assert not (root / "MANIFEST.json.tmp").exists()
    assert (root / "MANIFEST.json").exists()
    assert (root / "segments" / "seg_000000" / "lineage.json").exists()


def test_crash_mid_merge_resume_byte_identical(ray_session, tmp_path):
    """Kill the build 'after segments, mid-merge' (shards half-written,
    stale tmp left behind) — a re-run resumes from the committed
    segments and converges to a byte-identical index."""
    import filecmp
    import os
    import shutil

    import ray.data

    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.index.build import cleanup_stale

    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    conf = IndexConfig(num_partitions=4, num_shards=2, mode="words",
                       id_col="doc_id", dedup_latest=False)
    clean = str(tmp_path / "clean")
    build_index(docs, clean, conf)

    crashed = str(tmp_path / "crashed")
    build_index(docs, crashed, conf)
    # simulate the crash: shards half-gone + stale tmp + no manifest
    shutil.rmtree(os.path.join(crashed, "shards"))
    os.makedirs(os.path.join(crashed, "shards.tmp", "shard_000000"))
    with open(os.path.join(crashed, "shards.tmp", "shard_000000", "junk"), "w") as f:
        f.write("partial")
    os.remove(os.path.join(crashed, "MANIFEST.json"))
    cleanup_stale(crashed)
    build_index(docs, crashed, conf)  # resume

    # shard payloads byte-identical to the clean build; lineage carries
    # wall-times, so compare its deterministic fields instead
    import json as _json

    for shard in sorted(os.listdir(os.path.join(clean, "shards"))):
        for f in sorted(os.listdir(os.path.join(clean, "shards", shard))):
            a = os.path.join(clean, "shards", shard, f)
            b = os.path.join(crashed, "shards", shard, f)
            if f == "lineage.json":
                la, lb = _json.load(open(a)), _json.load(open(b))
                for k in la:
                    if not k.endswith("_s") and "per_s" not in k and "wall" not in k:
                        assert la[k] == lb[k], (shard, k, la[k], lb[k])
            else:
                assert filecmp.cmp(a, b, shallow=False), (shard, f)


def test_search_service_identical_to_dataset_path(built_index):
    """The resident actor-pool service (dcs-web long-lived backend
    shape, sourcebackend.go:293-641) returns the IDENTICAL table to
    search_bm25 — same planner, scorers, tie-breaks — across plain,
    filtered and multi-query batches, and keeps serving without
    re-setup."""
    from dcs_ray.service import search_service

    out, _ = built_index
    queries = ["spark merge join", "customer window batch", "vector"]
    with search_service(out) as svc:
        got = svc.search(queries, k=10).to_pandas()
        want = search_bm25(out, queries, k=10).to_pandas()
        assert got.equals(want)
        # repeated single-query calls (the serving pattern) stay correct
        for q in queries:
            g1 = svc.search([q], k=5).to_pandas()
            w1 = search_bm25(out, [q], k=5).to_pandas()
            assert g1.equals(w1), q
        # exhaustive + BMW scorer routes through the service too —
        # every method the Dataset path offers, rank-identical
        for m in ("exhaustive", "bmw"):
            g2 = svc.search(["spark merge join"], k=10, method=m).to_pandas()
            assert g2.equals(search_bm25(out, ["spark merge join"], k=10,
                                         method=m).to_pandas()), m


def test_search_service_result_cache(built_index):
    """Finished-query cache (dcs querymanager.go:277-320 shape):
    repeats are served driver-side with identical tables, k/method/
    filters key separately, TTL expires, and the entry cap evicts."""
    import time as _time

    from dcs_ray.service import search_service

    out, _ = built_index
    queries = ["spark merge join", "customer window batch"]
    with search_service(out) as svc:
        first = svc.search(queries, k=10).to_pandas()
        info0 = svc.cache_info()
        assert info0 == {"hits": 0, "misses": 2, "entries": 2}
        again = svc.search(queries, k=10).to_pandas()
        assert again.equals(first)
        assert svc.cache_info()["hits"] == 2  # both served from cache
        # a mixed batch: one hit + one miss, result identical to uncached
        mixed = svc.search(["spark merge join", "vector"], k=10).to_pandas()
        uncached = svc.search(["spark merge join", "vector"], k=10,
                              use_cache=False).to_pandas()
        assert mixed.equals(uncached)
        # different k / method / filters are distinct cache keys
        svc.search(queries[:1], k=5)
        svc.search(queries[:1], k=10, method="exhaustive")
        assert svc.cache_info()["misses"] >= 5

    # TTL expiry: a zero-TTL service never serves from cache
    with search_service(out, cache_ttl_s=0.0) as svc:
        svc.search(queries[:1], k=10)
        _time.sleep(0.01)
        svc.search(queries[:1], k=10)
        assert svc.cache_info()["hits"] == 0 and svc.cache_info()["misses"] == 2

    # LRU cap: entries never exceed cache_max_entries
    with search_service(out, cache_max_entries=2) as svc:
        for kk in (3, 4, 5, 6):
            svc.search(queries[:1], k=kk)
        assert svc.cache_info()["entries"] == 2
        # evicted key re-fetches and still matches the live path
        r = svc.search(queries[:1], k=3).to_pandas()
        assert r.equals(search_bm25(out, queries[:1], k=3).to_pandas())


def test_search_service_per_shard_metrics(built_index):
    """Per-shard serving metrics (the read-path lineage analogue):
    query counts attribute to EVERY shard per batch (fan-out), cached
    repeats never touch the actors, and queries/sec derives from the
    measured busy wall."""
    from dcs_ray.service import search_service

    out, _ = built_index
    with search_service(out) as svc:
        m0 = svc.metrics().to_pandas()
        assert (m0["n_queries"] == 0).all() and len(m0) == len(svc.shards)
        svc.search(["spark merge join", "vector"], k=10)
        m1 = svc.metrics().to_pandas()
        assert (m1["n_queries"] == 2).all()
        assert (m1["n_batches"] == 1).all()
        assert (m1["busy_s"] > 0).all()
        assert (m1["queries_per_s"] > 0).all()
        # cache hit: no actor work recorded
        svc.search(["spark merge join"], k=10)
        m2 = svc.metrics().to_pandas()
        assert (m2["n_queries"] == 2).all()


def test_proximity_search_matches_brute_force(trigram_index):
    """Proximity join (J4 windowed): per-doc pair counts of 'spark'
    within 40 bytes of 'join' equal a regex brute-force over the raw
    text, and window=0 degenerates to same-offset only (empty here)."""
    import re

    import pyarrow.parquet as pq

    from dcs_ray.search import search_proximity

    got_t = search_proximity(trigram_index, [("spark", "join")], window=40).to_pandas()
    got = dict(zip(got_t.doc_id.astype(int), got_t.n_pairs.astype(int)))
    tab = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    want = {}
    for d, s in zip(tab["doc_id"].to_pylist(), tab["text"].to_pylist()):
        pa_ = [m.start() for m in re.finditer("spark", s)]
        pb_ = [m.start() for m in re.finditer("join", s)]
        n = sum(1 for x in pa_ for y in pb_ if abs(x - y) <= 40)
        if n:
            want[d] = n
    assert got == want
    zero = search_proximity(trigram_index, [("spark", "join")], window=0).to_pandas()
    assert len(zero) == 0  # distinct literals can't share a start offset
