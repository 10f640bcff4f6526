"""REAL kill-resume: SIGKILL a build subprocess mid-flight, rerun the
same build against the same output dir, and prove (a) finished
partitions were not recomputed (lineage checksums preserved), (b) the
tmp+rename segment protocol left no corruption a resume could trip on,
(c) the resumed index answers rank-identically to an uninterrupted
build — the north rule's "a killed build resumes without recomputing
finished shards", with an actual kill rather than the simulated
copy-partial variant in test_index_e2e."""

import json
import os
import signal
import subprocess
import sys
import time

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.1"

BUILD_SCRIPT = """
import ray, sys
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from dcs_ray.index import IndexConfig, build_index
build_index([{files!r}], {out!r}, IndexConfig(
    num_partitions=12, num_shards=4, mode="words", id_col="doc_id",
    dedup_latest=False))
ray.shutdown()
"""


def _spawn(out: str, env: dict) -> subprocess.Popen:
    script = BUILD_SCRIPT.format(files=f"{SF}/documents.parquet", out=out)
    return subprocess.Popen(
        [sys.executable, "-c", script], env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,  # so the kill reaps the whole ray session
    )


def _committed_segments(seg_root: str) -> list[str]:
    """Only ATOMICALLY COMMITTED segment dirs: write_segment stages
    everything (lineage.json included) in ``seg_NNN.tmp`` and renames
    last, so a kill can leave .tmp debris with a complete-looking
    lineage file — counting those would record checksums the resume
    legitimately discards (review r5b #1)."""
    if not os.path.isdir(seg_root):
        return []
    return [d for d in os.listdir(seg_root) if not d.endswith(".tmp")]


def test_sigkill_mid_build_then_resume(tmp_path):
    out = str(tmp_path / "killed_idx")
    seg_root = os.path.join(out, "segments")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env.pop("RAY_ADDRESS", None)

    p = _spawn(out, env)
    # kill as soon as SOME partitions have committed lineage (finished)
    # but, if the build is too fast to catch mid-flight, fall through —
    # the resume assertions below still hold (resume is then a no-op)
    deadline = time.monotonic() + 240
    n_done = 0
    while time.monotonic() < deadline and p.poll() is None:
        n_done = sum(
            os.path.exists(os.path.join(seg_root, d, "lineage.json"))
            for d in _committed_segments(seg_root)
        )
        if n_done >= 2:
            break
        time.sleep(0.02)
    if p.poll() is None:
        os.killpg(os.getpgid(p.pid), signal.SIGKILL)
        p.wait(timeout=30)
    interrupted = not os.path.exists(os.path.join(out, "MANIFEST.json"))

    done_before = {}
    for d in _committed_segments(seg_root):
        lin = os.path.join(seg_root, d, "lineage.json")
        if os.path.exists(lin):
            with open(lin) as f:
                done_before[d] = json.load(f)["checksum"]

    # resume in a fresh process; must complete cleanly over the debris
    p2 = _spawn(out, env)
    assert p2.wait(timeout=420) == 0
    assert os.path.exists(os.path.join(out, "MANIFEST.json"))
    with open(os.path.join(out, "MANIFEST.json")) as f:
        manifest = json.load(f)
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert manifest["stats"]["n_docs"] == n_docs

    # finished partitions were NOT recomputed: same checksum objects
    for d, cks in done_before.items():
        with open(os.path.join(seg_root, d, "lineage.json")) as f:
            assert json.load(f)["checksum"] == cks, d

    # the resumed index answers rank-identically to an uninterrupted
    # build (conftest's Ray session; pure read path)
    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.search import search_bm25

    fresh = str(tmp_path / "fresh_idx")
    build_index([f"{SF}/documents.parquet"], fresh, IndexConfig(
        num_partitions=12, num_shards=4, mode="words", id_col="doc_id",
        dedup_latest=False))
    q = ["spark merge join", "customer window batch"]
    a = search_bm25(out, q, k=10).to_pandas()
    b = search_bm25(fresh, q, k=10).to_pandas()
    assert a.equals(b)
    # record whether we truly caught it mid-flight (informational: the
    # window is host-dependent; the identity assertions hold either way)
    sys.stderr.write(
        f"[kill-resume] interrupted={interrupted} finished_before_kill={len(done_before)}\n"
    )
