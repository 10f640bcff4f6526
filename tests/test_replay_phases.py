"""``replay --phases``: per-query phase attribution (posting scan /
doc read / verify) mirroring the reference benchmark's index-only /
+I/O / +matching decomposition (``cmd/dcs/replay.go:37-45``,
``static/research/2019-08-03-dcs-new-index/bench.zsh:1-40``)."""

import argparse
import json

import ray.data

from dcs_ray.index import IndexConfig, build_index

SF = "/root/testdata/sf0.001"


def test_replay_phases_sum_to_total(ray_session, tmp_path, capsys):
    out = str(tmp_path / "idx")
    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    build_index(
        docs,
        out,
        IndexConfig(
            num_partitions=2, num_shards=2, mode="trigram",
            id_col="doc_id", dedup_latest=False,
        ),
    )
    log = tmp_path / "queries.log"
    log.write_text("(?i)spark\nmerge join\nzzznosuchtrigramzzz\n")

    from dcs_ray.__main__ import cmd_replay

    args = argparse.Namespace(
        index=out, log=str(log), k=10, service=False, progress=False,
        phases=True, docs=f"{SF}/documents.parquet",
    )
    cmd_replay(args)
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    summary = lines[-1]
    rows = lines[:-1]
    assert summary["mode"] == "phases" and summary["queries"] == 3
    assert len(rows) == 3
    for r in rows:
        # the three phases sum to total by construction
        assert (
            r["posting_nano"] + r["doc_read_nano"] + r["verify_nano"]
            == r["total_nano"]
        )
        assert r["posting_nano"] > 0
    by_q = {r["query"]: r for r in rows}
    # a real pattern finds matches; candidates bound the verify set
    assert by_q["(?i)spark"]["nresults"] > 0
    assert by_q["(?i)spark"]["ncandidates"] > 0
    # a phrase whose trigrams don't co-occur in any doc short-circuits:
    # empty candidates → no doc read of substance → zero results
    assert by_q["zzznosuchtrigramzzz"]["nresults"] == 0
    assert by_q["zzznosuchtrigramzzz"]["ncandidates"] == 0
    # summary totals are the per-query sums
    for p in ("posting_nano", "doc_read_nano", "verify_nano", "total_nano"):
        assert summary[p] == sum(r[p] for r in rows)


def test_replay_phases_results_match_fused_path(ray_session, tmp_path, capsys):
    """Phase attribution must not change WHAT is found: nresults equals
    the production fused path's match count."""
    out = str(tmp_path / "idx")
    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    build_index(
        docs,
        out,
        IndexConfig(
            num_partitions=2, num_shards=2, mode="trigram",
            id_col="doc_id", dedup_latest=False,
        ),
    )
    log = tmp_path / "queries.log"
    log.write_text("spark merge\n")

    from dcs_ray.__main__ import cmd_replay
    from dcs_ray.grep import search_regex

    args = argparse.Namespace(
        index=out, log=str(log), k=10, service=False, progress=False,
        phases=True, docs=f"{SF}/documents.parquet",
    )
    cmd_replay(args)
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()][:-1]
    want = search_regex(
        out, ray.data.read_parquet(f"{SF}/documents.parquet"), "spark merge"
    ).count()
    assert rows[0]["nresults"] == want
