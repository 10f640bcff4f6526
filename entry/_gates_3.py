"""Auto-split from the round-3 __ray_entry__.py monolith (verbatim
segments; see entry/__init__.py).  Do not import directly — go
through __ray_entry__.
"""

from __future__ import annotations
import os
import sys
from collections.abc import Callable
from typing import Any
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data
from dcs_ray.sources.io import read_parquet_sized

from entry._helpers import (  # noqa: F401
    BM25_QUERY,
    _CACHE_ROOT,
    _PQ_ITER,
    _PQ_K,
    _PQ_M,
    _PQ_SUBDIM,
    _PROFILE_COLS,
    _QualityWithLabel,
    _SQ_DIMS,
    _US_PER_DAY,
    _daily_event_counts,
    _docs,
    _index_dir,
    _link_edges_ds,
    _link_pair_edges,
    _rank_table,
    _upd_index,
    _words_index_fresh,
)

def _q_robots_filtered_pages(sf_dir: str) -> pa.Table:
    """robots.txt exclusion at ingest (RFC 9309 longest-match subset):
    a deterministic per-host robots body — odd-ranked hosts fully
    Disallowed, even-ranked hosts blocking ids < 100 with an Allow
    carve-out for 40–49 (longest-rule precedence exercised) — is
    PARSED from real robots text, broadcast once via ray.put, and
    applied as a vectorized no-shuffle filter over the pages source.
    The oracle replays the rule semantics as plain predicates over the
    replayed pages synthesis."""
    import ray as _ray

    from dcs_ray.functions.crawl import parse_robots, robots_filter
    from dcs_ray.sources.pages import read_pages

    sources = sorted(
        set(
            pa.concat_tables(
                [
                    pa.table(b)
                    for b in _docs(sf_dir)
                    .select_columns(["source"])
                    .iter_batches(batch_format="pyarrow")
                ]
            )["source"]
            .to_pylist()
        )
    )
    robots_by_host = {}
    for rank, s in enumerate(sources):
        host = f"{s}.example.org"
        if rank % 2 == 1:
            body = "User-agent: *\nDisallow: /\n"
        else:
            body = (
                "# synthetic politeness rules\n"
                "User-agent: evilbot\nDisallow: /\n\n"
                "User-agent: *\n"
                "Disallow: /doc/000000\n"
                "Allow: /doc/0000004\n"
            )
        robots_by_host[host] = parse_robots(body)
    kept = robots_filter(read_pages(sf_dir), _ray.put(robots_by_host))
    t = pa.concat_tables(
        [
            pa.table(b)
            for b in kept.iter_batches(batch_format="pyarrow")
        ]
    )
    return pa.table(
        {
            "url": t["url"],
            "ts_us": t["warc_ts"].cast(pa.int64()),
        }
    ).sort_by([("url", "ascending"), ("ts_us", "ascending")])


def _q_warc_tolerant_parse(sf_dir: str) -> pa.Table:
    """Ingest fault isolation, fully ORACLED: every page row becomes its
    own gzip member (Common Crawl layout), members at page-row index
    j % 13 == 5 get one byte flipped mid-member, and the tolerant
    parser must (a) count exactly those members bad and (b) recover
    every other record intact by scanning to the next member magic —
    the property that keeps one mangled record from killing a ~1 GiB
    segment at 100 TB. Survivors replayed in SQL by page-row order."""
    import gzip

    from dcs_ray.sources.pages import read_pages
    from dcs_ray.sources.warc import parse_warc_tolerant, warc_member_bytes

    pages = pa.concat_tables(
        [pa.table(b) for b in read_pages(sf_dir).iter_batches(batch_format="pyarrow")]
    )
    members = warc_member_bytes(pages)
    out = []
    n_corrupt = 0
    for j, m in enumerate(members):
        c = bytearray(gzip.compress(m, mtime=0))
        if j >= 1 and (j - 1) % 13 == 5:  # member 0 is warcinfo
            c[len(c) // 2] ^= 0xFF
            n_corrupt += 1
        out.append(bytes(c))
    t, n_bad = parse_warc_tolerant(b"".join(out))
    assert n_bad == n_corrupt, (n_bad, n_corrupt)
    return pa.table(
        {
            "url": t["url"],
            "ts_us": t["warc_ts"].cast(pa.int64()),
        }
    ).sort_by([("url", "ascending"), ("ts_us", "ascending")])


def _q_sitemap_frontier(sf_dir: str) -> pa.Table:
    """Crawl-frontier discovery, fully ORACLED: per-host sitemap.xml
    fixtures advertise every crawled url (doc_id % 3 != 2 of the host)
    PLUS phantom ids shifted by 10^7 for doc_id % 7 == 0; the XML is
    parsed by the distributed one-file-per-block source and diffed
    against the crawled pages urls through the bucketed hash
    anti-join. The frontier is exactly the phantoms — url recipe and
    lastmod date arithmetic replayed in SQL."""
    import datetime
    import os
    import shutil

    from dcs_ray.sources.pages import page_url, read_pages
    from dcs_ray.sources.sitemap import (
        read_sitemaps,
        uncrawled_frontier,
        write_sitemap,
    )

    docs = pa.concat_tables(
        [
            pa.table(b)
            for b in _docs(sf_dir)
            .select_columns(["doc_id", "source"])
            .iter_batches(batch_format="pyarrow")
        ]
    )
    base = datetime.date(2023, 11, 14)
    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = f"/tmp/dcs_ray_sitemap_gate_{name}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    by_host: dict[str, tuple[list[str], list[str]]] = {}
    ids = docs["doc_id"].to_numpy()
    srcs = docs["source"].to_pylist()
    for d, s in zip(ids, srcs):
        d = int(d)
        urls, lms = by_host.setdefault(s, ([], []))
        if d % 3 != 2:
            urls.append(page_url(s, d))
            lms.append((base + datetime.timedelta(days=d % 400)).isoformat())
        if d % 7 == 0:
            p = d + 10_000_000
            urls.append(page_url(s, p))
            lms.append((base + datetime.timedelta(days=p % 400)).isoformat())
    paths = []
    for s, (urls, lms) in sorted(by_host.items()):
        p = f"{out}/{s}.xml"
        write_sitemap(p, urls, lms)
        paths.append(p)
    frontier = uncrawled_frontier(
        read_sitemaps(paths),
        read_pages(sf_dir).select_columns(["url"]),
    )
    t = pa.concat_tables(
        [pa.table(b) for b in frontier.iter_batches(batch_format="pyarrow")]
    )
    # ISO-string lastmod: hash-stable across the driver's date
    # representations (date32 → datetime.date vs DuckDB datetime64)
    t = t.set_column(
        t.schema.get_field_index("lastmod"), "lastmod",
        t["lastmod"].cast(pa.string()),
    )
    return t.sort_by("url")


def _q_charset_sniff_decode(sf_dir: str) -> pa.Table:
    """Charset sniff + transcode at ingest: every 5th doc's page body is
    encoded LATIN-1 with an injected accented marker (invalid as
    utf-8), the rest utf-8 with an astral-free unicode marker; the
    batch stage's whole-batch utf-8 fast path must fall back per row
    and still produce exact utf-8 text. The oracle replays the
    injected strings and charset rule directly."""
    from dcs_ray.sources.pages import transcode_batch

    def to_raw(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        texts = b["text"].to_pylist()
        raws = []
        for d, t in zip(ids, texts):
            if int(d) % 5 == 0:
                raws.append(f"café ¿señor? {t}".encode("latin-1"))
            else:
                raws.append(f"☃ búttèrfly {t}".encode("utf-8"))
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
                "raw": pa.array(raws, pa.binary()),
            }
        )

    ds = _docs(sf_dir).map_batches(to_raw, batch_format="pyarrow").map_batches(
        transcode_batch, batch_format="pyarrow"
    )
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    return t.sort_by("doc_id")


def _q_multi_format_source(sf_dir: str) -> pa.Table:
    """Source-format parity gate: the events fact table round-trips
    through JSONL (``ray.data.read_json``) AND CSV
    (``ray.data.read_csv``) — the two text ingest formats a crawl
    pipeline meets besides parquet — and both paths must produce the
    identical per-type (n, cents) aggregate. Values are converted to
    exact integer cents BEFORE serialization so the text round-trip is
    lossless by construction; the sidecar files are written once per
    sf_dir under /tmp and reused."""
    import os

    from dcs_ray.functions.relational import combiner_groupby

    tag = sf_dir.strip("/").replace("/", "_")
    root = f"/tmp/dcs_ray_srcfmt_{tag}"
    jdir, cdir = f"{root}/jsonl", f"{root}/csv"
    done = f"{root}/.done"
    if not os.path.exists(done):
        ev = read_parquet_sized(
            f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
        )

        def to_cents(b: pa.Table) -> pa.Table:
            cents = np.floor(b["value"].to_numpy() * 100 + 0.5).astype(np.int64)
            return pa.table(
                {
                    "event_id": b["event_id"].cast(pa.int64()),
                    "event_type": b["event_type"],
                    "cents": pa.array(cents, pa.int64()),
                }
            )

        staged = ev.map_batches(to_cents, batch_format="pyarrow").materialize()
        staged.write_json(jdir)
        staged.write_csv(cdir)
        with open(done, "w") as f:
            f.write("ok")

    def agg(ds: ray.data.Dataset) -> pa.Table:
        def prep(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "event_type": b["event_type"].cast(pa.string()),
                    "cents": b["cents"].cast(pa.int64()),
                }
            )

        return pa.concat_tables(
            pa.table(x)
            for x in combiner_groupby(
                ds.map_batches(prep, batch_format="pyarrow"),
                ["event_type"], ["cents"], count_col="n",
            ).iter_batches(batch_format="pyarrow")
        ).sort_by("event_type").select(["event_type", "n", "cents"])

    tj = agg(ray.data.read_json(jdir))
    tc = agg(ray.data.read_csv(cdir))
    if not tj.equals(tc):
        raise AssertionError("JSONL and CSV round-trips disagree")
    return tj


def _q_pq_codes(sf_dir: str) -> pa.Table:
    """Product-quantization code assignment (Jégou '11): the 64-dim
    embedding splits into 4 × 16-dim subspaces, each trained with the
    SAME deterministic Lloyd's contract as the k-means gates (seeds =
    k smallest ids' sub-vectors, argmin ties to the smallest cid,
    empty clusters keep their centroid), then every vector gets one
    code per subspace against the final subspace codebooks — the
    compressed-vector representation an IVF-PQ ANN index stores (here
    4×2 bits per vector instead of 64 floats). Training passes stream
    with k·d-sized exchanges; the coding pass broadcasts all four
    codebooks once."""
    from dcs_ray.functions.kmeans import _emb_f64, _train_centroids

    emb = read_parquet_sized(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()

    codebooks = []
    for m in range(_PQ_M):
        start = m * _PQ_SUBDIM

        def slice_m(b: pa.Table, _s=start) -> pa.Table:
            return pa.table(
                {
                    "vec_id": b["vec_id"],
                    "embedding": pc.list_slice(
                        b["embedding"], _s, _s + _PQ_SUBDIM
                    ),
                }
            )

        C, _, _ = _train_centroids(
            emb.map_batches(slice_m, batch_format="pyarrow"),
            _PQ_K, _PQ_ITER, "embedding", "vec_id",
        )
        codebooks.append(C)
    cref = ray.put([c.copy() for c in codebooks])

    def assign(b: pa.Table) -> pa.Table:
        cbs = ray.get(cref)
        E = _emb_f64(b["embedding"])
        cols = {"vec_id": b["vec_id"].cast(pa.int64())}
        for m, cc in enumerate(cbs):
            sub = E[:, m * _PQ_SUBDIM : (m + 1) * _PQ_SUBDIM]
            dist = ((sub[:, None, :] - cc[None, :, :]) ** 2).sum(axis=2)
            cols[f"code_{m}"] = pa.array(
                np.argmin(dist, axis=1).astype(np.int64), pa.int64()
            )
        return pa.table(cols)

    t = pa.concat_tables(
        pa.table(b)
        for b in emb.map_batches(assign, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    return t.sort_by("vec_id")


def _q_psi_event_drift(sf_dir: str) -> pa.Table:
    """Population Stability Index of the event-type mix between the
    first and second half of the timeline (the standard drift monitor
    for a production feature): PSI = Σ (p−q)·ln(p/q) over types
    present in both halves. One 1-row min/max fold for the cut, one
    |types|² combiner fold for the two distributions — exact integers
    until the shares."""
    from dcs_ray.functions.relational import combiner_groupby
    from ray.data.aggregate import Max, Min

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    ).materialize()

    def to_us(b: pa.Table) -> pa.Table:
        return pa.table({"us": b["ts"].cast(pa.int64())})

    mm = ev.map_batches(to_us, batch_format="pyarrow").aggregate(
        Min("us"), Max("us")
    )
    mid = (int(mm["min(us)"]) + int(mm["max(us)"])) // 2

    def flags(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "event_type": b["event_type"],
                "f": pa.array((us < mid).astype(np.int64), pa.int64()),
                "s": pa.array((us >= mid).astype(np.int64), pa.int64()),
            }
        )

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ev.map_batches(flags, batch_format="pyarrow"),
            ["event_type"], ["f", "s"],
        ).iter_batches(batch_format="pyarrow")
    )
    f = g["f"].to_numpy().astype(np.int64)
    s = g["s"].to_numpy().astype(np.int64)
    nf, ns = int(f.sum()), int(s.sum())
    both = (f > 0) & (s > 0)
    p = f[both].astype(np.float64) / nf
    q = s[both].astype(np.float64) / ns
    psi = float(((p - q) * np.log(p / q)).sum())
    return pa.table(
        {
            "n_first": pa.array([nf], pa.int64()),
            "n_second": pa.array([ns], pa.int64()),
            "n_types_both": pa.array([int(both.sum())], pa.int64()),
            "psi": pa.array([round(psi, 6) + 0.0], pa.float64()),
        }
    )


def _q_knn_pq_adc(sf_dir: str) -> pa.Table:
    """Approximate kNN by PQ asymmetric distance (ADC, Jégou '11):
    the query (the smallest vec_id's embedding) builds a 4×4 lookup
    table of subspace distances to the trained codebooks; every
    vector's distance is the 4-term LUT sum over its PQ codes — the
    scan an IVF-PQ index runs inside a probed list, at 4 adds per
    vector instead of a 64-dim float op. Top-5 by (adc_dist, vec_id);
    codebooks/codes/LUT all replay through the PQ CTE chains."""
    from dcs_ray.functions.kmeans import _emb_f64, _train_centroids

    emb = read_parquet_sized(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()

    codebooks = []
    for m in range(_PQ_M):
        start = m * _PQ_SUBDIM

        def slice_m(b: pa.Table, _s=start) -> pa.Table:
            return pa.table(
                {
                    "vec_id": b["vec_id"],
                    "embedding": pc.list_slice(
                        b["embedding"], _s, _s + _PQ_SUBDIM
                    ),
                }
            )

        C, _, _ = _train_centroids(
            emb.map_batches(slice_m, batch_format="pyarrow"),
            _PQ_K, _PQ_ITER, "embedding", "vec_id",
        )
        codebooks.append(C)

    # query = the smallest vec_id's embedding (deterministic, replayable)
    def local_min(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy().astype(np.int64)
        i = int(np.argmin(ids))
        return pa.table(
            {"vec_id": pa.array([ids[i]], pa.int64()),
             "embedding": b["embedding"].take(pa.array([i]))}
        )

    cand = pa.concat_tables(
        pa.table(b)
        for b in emb.map_batches(local_min, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ).sort_by("vec_id").slice(0, 1)
    qv = _emb_f64(cand["embedding"])[0]

    lut = np.zeros((_PQ_M, _PQ_K), np.float64)
    for m, cc in enumerate(codebooks):
        qs = qv[m * _PQ_SUBDIM : (m + 1) * _PQ_SUBDIM]
        lut[m] = ((cc - qs[None, :]) ** 2).sum(axis=1)
    ref = ray.put(([c.copy() for c in codebooks], lut.copy()))

    def score(b: pa.Table) -> pa.Table:
        cbs, lt = ray.get(ref)
        E = _emb_f64(b["embedding"])
        dist = np.zeros(len(E), np.float64)
        for m, cc in enumerate(cbs):
            sub = E[:, m * _PQ_SUBDIM : (m + 1) * _PQ_SUBDIM]
            d = ((sub[:, None, :] - cc[None, :, :]) ** 2).sum(axis=2)
            dist += lt[m][np.argmin(d, axis=1)]
        t = pa.table(
            {
                "vec_id": b["vec_id"].cast(pa.int64()),
                "adc_dist": pa.array(dist, pa.float64()),
            }
        )
        return t.sort_by(
            [("adc_dist", "ascending"), ("vec_id", "ascending")]
        ).slice(0, 5)

    parts = [
        pa.table(b)
        for b in emb.map_batches(score, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    merged = pa.concat_tables(parts).sort_by(
        [("adc_dist", "ascending"), ("vec_id", "ascending")]
    ).slice(0, 5)
    return pa.table(
        {
            "vec_id": merged["vec_id"],
            "adc_dist": pc.add(pc.round(merged["adc_dist"], 6), 0.0),
        }
    )


def _q_gains_curve_quality(sf_dir: str) -> pa.Table:
    """Cumulative gains / lift table of the quality classifier at the
    ten score-decile thresholds: for each decile d, the threshold is
    the micro-unit score at rank ⌈n·d/10⌉ (descending) and the
    selected set takes WHOLE tie groups (p6 ≥ threshold) — the
    targeting report that says 'the top 10% of scores captures X% of
    positives'. Value-count fold on (p6, y) — the same |distinct
    score|² exchange as the AUC gate — then ten driver rows."""
    from dcs_ray.functions.relational import combiner_groupby

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def to_p6(b: pa.Table) -> pa.Table:
        p6 = np.floor(b["quality_prob"].to_numpy() * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {
                "p6": pa.array(p6, pa.int64()),
                "y": b["y"].cast(pa.int64()),
                "one": pa.array(np.ones(len(b), np.int64), pa.int64()),
            }
        )

    scored = docs.map_batches(
        _QualityWithLabel, concurrency=2, batch_format="pyarrow"
    )
    vc = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            scored.map_batches(to_p6, batch_format="pyarrow"),
            ["p6"], ["y", "one"],
        ).iter_batches(batch_format="pyarrow")
    ).sort_by([("p6", "descending")])
    p6 = vc["p6"].to_numpy().astype(np.int64)
    pos = vc["y"].to_numpy().astype(np.int64)
    cnt = vc["one"].to_numpy().astype(np.int64)
    cum = np.cumsum(cnt)
    cumpos = np.cumsum(pos)
    n = int(cum[-1])
    npos = int(cumpos[-1])
    rows = []
    for d in range(1, 11):
        r = (n * d + 9) // 10  # ceil(n·d/10)
        i = int(np.searchsorted(cum, r, side="left"))
        thr = int(p6[i])
        n_sel, pos_sel = int(cum[i]), int(cumpos[i])
        rows.append(
            (
                d,
                thr,
                n_sel,
                pos_sel,
                round(pos_sel / npos, 6) + 0.0,
                round(pos_sel / n_sel, 6) + 0.0,
                round((pos_sel / n_sel) / (npos / n), 6) + 0.0,
            )
        )
    cols = list(zip(*rows))
    return pa.table(
        {
            "decile": pa.array(cols[0], pa.int64()),
            "p6_threshold": pa.array(cols[1], pa.int64()),
            "n_selected": pa.array(cols[2], pa.int64()),
            "n_pos_selected": pa.array(cols[3], pa.int64()),
            "recall": pa.array(cols[4], pa.float64()),
            "precision": pa.array(cols[5], pa.float64()),
            "lift": pa.array(cols[6], pa.float64()),
        }
    )


def _q_hill_tail_events(sf_dir: str) -> pa.Table:
    """Hill tail-index estimate of the purchase-value distribution
    (the heavy-tail exponent that decides whether revenue concentration
    is even summable): α̂ = k / (Σ_{top-k} ln x − k·ln x_(k+1)) with
    k = ⌈n/20⌉ (the 5% tail). Folds through the |distinct cents|
    value-count combiner; the boundary tie group enters PARTIALLY by
    count, which is value-replayable because the summand depends only
    on the value."""
    from dcs_ray.functions.relational import combiner_groupby

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def prep(b: pa.Table) -> pa.Table:
        sel = pc.equal(b["event_type"], "purchase")
        f = b.filter(sel)
        cents = np.floor(f["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        cents = cents[cents > 0]
        return pa.table({"cents": pa.array(cents, pa.int64())})

    vc = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ev.map_batches(prep, batch_format="pyarrow"), ["cents"], [],
            count_col="c",
        ).iter_batches(batch_format="pyarrow")
    ).sort_by([("cents", "descending")])
    vals = vc["cents"].to_numpy().astype(np.int64)
    cnt = vc["c"].to_numpy().astype(np.int64)
    cum = np.cumsum(cnt)
    n = int(cum[-1])
    k = (n + 19) // 20
    before = cum - cnt
    taken = np.clip(k - before, 0, cnt)
    sum_ln = float((taken * np.log(vals.astype(np.float64))).sum())
    i_k1 = int(np.searchsorted(cum, k + 1, side="left"))
    xk1 = int(vals[i_k1])
    denom = sum_ln - k * float(np.log(float(xk1)))
    alpha = k / denom if denom > 0 else 0.0
    return pa.table(
        {
            "n_purchases": pa.array([n], pa.int64()),
            "k_tail": pa.array([k], pa.int64()),
            "xk1_cents": pa.array([xk1], pa.int64()),
            "hill_alpha": pa.array([round(alpha, 6) + 0.0], pa.float64()),
        }
    )


def _q_term_burstiness(sf_dir: str) -> pa.Table:
    """Term burstiness (Church & Gale): collection frequency over
    document frequency — terms that, WHEN they appear, appear in
    bursts (content words) vs evenly spread function words. Top-20 by
    cf/df among terms with df ≥ 5; exchange = |distinct (doc, term)|
    like the term_df gate, then |vocab| per-term fold."""
    from dcs_ray.functions.relational import combiner_groupby
    from dcs_ray.tokenize import word_tokens_flat

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def prep(b: pa.Table) -> pa.Table:
        flat, parents = word_tokens_flat(b["text"])
        ids = b["doc_id"].to_numpy().astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(ids[parents], pa.int64()), "term": flat}
        )

    dt = combiner_groupby(
        docs.map_batches(prep, batch_format="pyarrow"), ["doc_id", "term"], [],
        count_col="c",
    )

    def fold(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "term": b["term"],
                "cf": b["c"].cast(pa.int64()),
                "df": pa.array(np.ones(len(b), np.int64), pa.int64()),
            }
        )

    t = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            dt.map_batches(fold, batch_format="pyarrow"), ["term"], ["cf", "df"],
        ).iter_batches(batch_format="pyarrow")
    )
    cf = t["cf"].to_numpy().astype(np.int64)
    df = t["df"].to_numpy().astype(np.int64)
    keep = df >= 5
    term = t["term"].to_numpy(zero_copy_only=False)[keep]
    cf, df = cf[keep], df[keep]
    ratio = cf.astype(np.float64) / df.astype(np.float64)
    order = np.lexsort((term, -ratio))[:20]
    return pa.table(
        {
            "term": pa.array([str(x) for x in term[order]], pa.string()),
            "cf": pa.array(cf[order], pa.int64()),
            "df": pa.array(df[order], pa.int64()),
            "burstiness": pa.array(
                np.round(ratio[order], 6) + 0.0, pa.float64()
            ),
        }
    )


def _q_markov_next_event_accuracy(sf_dir: str) -> pa.Table:
    """Evaluation of the first-order Markov next-event predictor:
    predict argmax-count transition (ties → smallest type) and score
    it on the SAME sequence — computable entirely from the transition
    counts, so the whole evaluation costs one |type-pairs| exchange
    (the matrix gate's own shape) and zero extra passes."""
    from dcs_ray.functions.windows import event_transitions

    ds = event_transitions(
        read_parquet_sized(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
        )
    )
    t = pa.concat_tables(
        pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")
    )
    prev = t["prev_type"].to_numpy(zero_copy_only=False)
    nxt = t["next_type"].to_numpy(zero_copy_only=False)
    n = t["n"].to_numpy().astype(np.int64)
    order = np.lexsort((nxt, -n, prev))  # per prev: n desc, next asc
    p_s = prev[order]
    first = np.ones(len(p_s), bool)
    first[1:] = p_s[1:] != p_s[:-1]
    pred = {p_s[i]: nxt[order][i] for i in np.flatnonzero(first)}
    correct = int(
        n[[pred[p] == x for p, x in zip(prev, nxt)]].sum()
    )
    tot = int(n.sum())
    return pa.table(
        {
            "n_transitions": pa.array([tot], pa.int64()),
            "n_prev_types": pa.array([len(pred)], pa.int64()),
            "n_correct": pa.array([correct], pa.int64()),
            "accuracy": pa.array(
                [round(correct / tot, 6) + 0.0 if tot else 0.0], pa.float64()
            ),
        }
    )


def _q_quantile_sketch_error(sf_dir: str) -> pa.Table:
    """Sketch-accuracy audit: the 64-bin mergeable histogram's
    p50/p90/p99 of document length vs the EXACT order statistic
    (rank ⌈q·n⌉), with absolute and relative error — the measurement
    that justifies (or vetoes) replacing the exact quantile exchange
    with the constant-size sketch at 100×. Both estimates fold
    distributed (|bins| resp. |distinct lengths| exchanges)."""
    from dcs_ray.functions.quantiles import approx_quantiles_histogram
    from dcs_ray.functions.relational import combiner_groupby

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["n_chars"]
    ).materialize()
    approx = approx_quantiles_histogram(docs, "n_chars", [0.5, 0.9, 0.99], bins=64)
    av = {
        round(float(q), 6): float(v)
        for q, v in zip(
            approx["q"].to_numpy(zero_copy_only=False),
            approx["value"].to_numpy(zero_copy_only=False),
        )
    }
    vc = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(docs, ["n_chars"], [], count_col="c")
        .iter_batches(batch_format="pyarrow")
    )
    vals = vc["n_chars"].to_numpy().astype(np.int64)
    cnt = vc["c"].to_numpy().astype(np.int64)
    order = np.argsort(vals)
    vals, cnt = vals[order], cnt[order]
    cum = np.cumsum(cnt)
    n = int(cum[-1])
    rows = []
    for q in (0.5, 0.9, 0.99):
        r = max(1, int(np.ceil(q * n)))
        exact = float(vals[np.searchsorted(cum, r, side="left")])
        ap = av[round(q, 6)]
        rows.append(
            (
                q,
                exact,
                round(ap, 6) + 0.0,
                round(ap - exact, 6) + 0.0,
                round((ap - exact) / exact, 6) + 0.0,
            )
        )
    cols = list(zip(*rows))
    return pa.table(
        {
            "q": pa.array(cols[0], pa.float64()),
            "exact": pa.array(cols[1], pa.float64()),
            "approx": pa.array(cols[2], pa.float64()),
            "abs_err": pa.array(cols[3], pa.float64()),
            "rel_err": pa.array(cols[4], pa.float64()),
        }
    )


def _q_rich_club(sf_dir: str) -> pa.Table:
    """Rich-club coefficient of the web graph at k=3: edge density
    among nodes with degree > k (do the hubs link to EACH OTHER?) —
    the link-ring / elite-core audit. Degrees fold through the
    combiner; the club membership broadcasts as a sorted array and
    one filtered pass counts in-club edges."""
    from dcs_ray.functions.relational import combiner_groupby

    K = 3
    edges = _link_edges_ds(sf_dir)

    def to_pairs(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy().astype(np.int64)
        d = b["dst"].to_numpy().astype(np.int64)
        m = s != d
        s, d = s[m], d[m]
        return pa.table(
            {
                "a": pa.array(np.minimum(s, d), pa.int64()),
                "b": pa.array(np.maximum(s, d), pa.int64()),
            }
        )

    pairs = combiner_groupby(
        edges.map_batches(to_pairs, batch_format="pyarrow"), ["a", "b"], []
    ).map_batches(
        lambda t: t.select(["a", "b"]), batch_format="pyarrow"
    ).materialize()

    def endpoints(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.array(
                    np.concatenate(
                        [
                            b["a"].to_numpy().astype(np.int64),
                            b["b"].to_numpy().astype(np.int64),
                        ]
                    ),
                    pa.int64(),
                )
            }
        )

    deg = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            pairs.map_batches(endpoints, batch_format="pyarrow"), ["node"], [],
            count_col="d",
        ).iter_batches(batch_format="pyarrow")
    )
    nodes = deg["node"].to_numpy().astype(np.int64)
    dd = deg["d"].to_numpy().astype(np.int64)
    club = np.sort(nodes[dd > K])
    cref = ray.put(club)

    def in_club(b: pa.Table) -> pa.Table:
        cl = ray.get(cref)
        a = b["a"].to_numpy().astype(np.int64)
        bb = b["b"].to_numpy().astype(np.int64)
        if len(cl) == 0:
            k = 0
        else:
            ia = np.minimum(np.searchsorted(cl, a), len(cl) - 1)
            ib = np.minimum(np.searchsorted(cl, bb), len(cl) - 1)
            k = int(((cl[ia] == a) & (cl[ib] == bb)).sum())
        return pa.table({"k": pa.array([k], pa.int64())})

    e_in = sum(
        int(b["k"][0].as_py())
        for b in pairs.map_batches(in_club, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    m = len(club)
    phi = 2.0 * e_in / (m * (m - 1)) if m > 1 else 0.0
    return pa.table(
        {
            "k": pa.array([K], pa.int64()),
            "n_club": pa.array([m], pa.int64()),
            "n_club_edges": pa.array([e_in], pa.int64()),
            "rich_club_phi": pa.array([round(phi, 6) + 0.0], pa.float64()),
        }
    )


def _q_rbo_bm25_qld(sf_dir: str) -> pa.Table:
    """Rank-Biased Overlap (Webber '10, truncated prefix form, p=0.9,
    depth 20) between the BM25 and Dirichlet-QL rankings of the same
    query — the ranker-agreement metric an engine migration is judged
    by. Both rankings run the normal query×shard fan-out; the RBO fold
    is 20 driver rows."""
    from dcs_ray.search import search_bm25, search_lm

    idx = _index_dir(sf_dir, "words")
    a = search_bm25(idx, [BM25_QUERY], k=20)
    b = search_lm(idx, [BM25_QUERY], k=20, model="qld", mu=300.0)
    ra = {int(d): int(r) for d, r in zip(a["doc_id"].to_pylist(), a["rank"].to_pylist())}
    rb = {int(d): int(r) for d, r in zip(b["doc_id"].to_pylist(), b["rank"].to_pylist())}
    common = set(ra) & set(rb)
    p = 0.9
    depth = 20
    rbo = 0.0
    for i in range(1, depth + 1):
        o = sum(1 for d in common if ra[d] <= i and rb[d] <= i)
        # 0.1 literal, not (1 − 0.9): the SQL replay writes 0.1 and the
        # two differ in the last ulp
        rbo += 0.1 * p ** (i - 1) * o / i
    return pa.table(
        {
            "depth": pa.array([depth], pa.int64()),
            "p": pa.array([p], pa.float64()),
            "n_common": pa.array([len(common)], pa.int64()),
            "rbo": pa.array([round(rbo, 6) + 0.0], pa.float64()),
        }
    )


def _q_markov_entropy_rate(sf_dir: str) -> pa.Table:
    """Entropy rate of the event-type Markov chain: H = −Σᵢ πᵢ Σⱼ
    Pᵢⱼ ln Pᵢⱼ with π the 5-step stationary gate's (round-6) vector
    and P the exact row-normalized transition ratios — how predictable
    the event stream is, in nats, plus the matching perplexity. Same
    |type-pairs| exchange as the transition gate."""
    from dcs_ray.functions.relational import combiner_groupby
    from dcs_ray.functions.stats import markov_stationary
    from dcs_ray.functions.windows import event_transitions

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    ).materialize()
    trans = pa.concat_tables(
        pa.table(b)
        for b in event_transitions(ev).iter_batches(batch_format="pyarrow")
    )
    types = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ev.map_batches(
                lambda b: pa.table({"event_type": b["event_type"]}),
                batch_format="pyarrow",
            ),
            ["event_type"], [],
        ).iter_batches(batch_format="pyarrow")
    )["event_type"].to_pylist()
    pi_t = markov_stationary(trans, types, iters=5)
    pi = {
        t: float(v)
        for t, v in zip(pi_t["event_type"].to_pylist(), pi_t["pr"].to_pylist())
    }
    prev = trans["prev_type"].to_pylist()
    n = trans["n"].to_numpy().astype(np.int64)
    tot = {}
    for pv, c in zip(prev, n):
        tot[pv] = tot.get(pv, 0) + int(c)
    h = 0.0
    for pv, c in zip(prev, n):
        pij = int(c) / tot[pv]
        h -= pi[pv] * pij * np.log(pij)
    return pa.table(
        {
            "n_types": pa.array([len(types)], pa.int64()),
            "entropy_rate": pa.array([round(float(h), 6) + 0.0], pa.float64()),
            "perplexity": pa.array(
                [round(float(np.exp(h)), 6) + 0.0], pa.float64()
            ),
        }
    )


def _q_heaps_law_fit(sf_dir: str) -> pa.Table:
    """Heaps'-law vocabulary-growth fit V(n) = k·n^β over ten doc-id
    prefix cuts (cut values from the 1-row min/max fold — NO global
    order statistic, so the shape survives 10^12 ids): per-term first
    doc id folds through a |vocab| min-exchange, prefix doc/vocab
    counts are vectorized searchsorted probes, and the 10-point
    log-log OLS runs on the driver. The exponent that sizes a
    tokenizer's vocab budget at 100×."""
    from dcs_ray.functions.relational import combiner_groupby
    from dcs_ray.tokenize import word_tokens_flat
    from ray.data.aggregate import Max, Min

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).materialize()

    def ids_only(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["doc_id"].cast(pa.int64())})

    mm = docs.map_batches(ids_only, batch_format="pyarrow").aggregate(
        Min("doc_id"), Max("doc_id")
    )
    lo, hi = int(mm["min(doc_id)"]), int(mm["max(doc_id)"])
    cuts = np.array(
        [lo + ((hi - lo) * d) // 10 for d in range(1, 11)], np.int64
    )
    cref = ray.put(cuts)

    def doc_counts(b: pa.Table) -> pa.Table:
        ct = ray.get(cref)
        ids = np.sort(b["doc_id"].to_numpy().astype(np.int64))
        n = np.searchsorted(ids, ct, side="right").astype(np.int64)
        return pa.table(
            {
                "d": pa.array(np.arange(1, 11, dtype=np.int64), pa.int64()),
                "n": pa.array(n, pa.int64()),
            }
        )

    nd = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            docs.map_batches(doc_counts, batch_format="pyarrow"), ["d"], ["n"],
        ).iter_batches(batch_format="pyarrow")
    ).sort_by("d")

    def term_first(b: pa.Table) -> pa.Table:
        flat, parents = word_tokens_flat(b["text"])
        ids = b["doc_id"].to_numpy().astype(np.int64)
        t = pa.table(
            {"term": flat, "fid": pa.array(ids[parents], pa.int64())}
        )
        agg = t.group_by(["term"]).aggregate([("fid", "min")])
        return pa.table({"term": agg["term"], "fid": agg["fid_min"]})

    firsts = (
        docs.map_batches(term_first, batch_format="pyarrow")
        .groupby("term")
        .min("fid")
    )

    def vocab_counts(b: pa.Table) -> pa.Table:
        ct = ray.get(cref)
        f = np.sort(b["min(fid)"].to_numpy().astype(np.int64))
        v = np.searchsorted(f, ct, side="right").astype(np.int64)
        return pa.table(
            {
                "d": pa.array(np.arange(1, 11, dtype=np.int64), pa.int64()),
                "v": pa.array(v, pa.int64()),
            }
        )

    vd = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            firsts.map_batches(vocab_counts, batch_format="pyarrow"), ["d"], ["v"],
        ).iter_batches(batch_format="pyarrow")
    ).sort_by("d")
    n = nd["n"].to_numpy().astype(np.int64)
    v = vd["v"].to_numpy().astype(np.int64)
    x = np.log(n.astype(np.float64))
    y = np.log(v.astype(np.float64))
    mx, my = float(np.mean(x)), float(np.mean(y))
    beta = float(((x - mx) * (y - my)).sum() / ((x - mx) ** 2).sum())
    k = float(np.exp(my - beta * mx))
    return pa.table(
        {
            "d": pa.array(np.arange(1, 11, dtype=np.int64), pa.int64()),
            "n_docs": pa.array(n, pa.int64()),
            "vocab": pa.array(v, pa.int64()),
            "heaps_beta": pa.array(
                np.full(10, round(beta, 6) + 0.0), pa.float64()
            ),
            "heaps_k": pa.array(np.full(10, round(k, 6) + 0.0), pa.float64()),
        }
    )


def _q_revenue_lorenz(sf_dir: str) -> pa.Table:
    """Lorenz curve of purchase revenue at user deciles (cumulative
    revenue share of the poorest ⌈n·d/10⌉ purchasers, ordered cents
    asc / user asc) — the full inequality curve behind the gini and
    top-share gates. Per-user revenue folds in exact cents; the
    ranked scan is |purchasers|-sized driver work."""
    from dcs_ray.functions.relational import combiner_groupby

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"]
    )

    def prep(b: pa.Table) -> pa.Table:
        sel = pc.equal(b["event_type"], "purchase")
        f = b.filter(sel)
        cents = np.floor(f["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        return pa.table(
            {
                "user_id": f["user_id"].cast(pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ev.map_batches(prep, batch_format="pyarrow"), ["user_id"], ["cents"],
        ).iter_batches(batch_format="pyarrow")
    )
    user = g["user_id"].to_numpy().astype(np.int64)
    cents = g["cents"].to_numpy().astype(np.int64)
    order = np.lexsort((user, cents))
    c_sorted = cents[order]
    cum = np.cumsum(c_sorted)
    n = len(c_sorted)
    tot = int(cum[-1])
    rows = []
    for d in range(1, 11):
        r = (n * d + 9) // 10
        rows.append((d, r, int(cum[r - 1]), round(int(cum[r - 1]) / tot, 6) + 0.0))
    cols = list(zip(*rows))
    return pa.table(
        {
            "decile": pa.array(cols[0], pa.int64()),
            "n_users_cut": pa.array(cols[1], pa.int64()),
            "cum_cents": pa.array(cols[2], pa.int64()),
            "cum_share": pa.array(cols[3], pa.float64()),
        }
    )


def _q_partitioned_write_roundtrip(sf_dir: str) -> pa.Table:
    """Resumable-output gate: documents write as hive-partitioned
    parquet (``partition_cols=['lang']`` — one directory per language,
    the layout a failed 100-TB run resumes from), then ONLY the
    ``lang=es`` partition is read back (partition-pruned read: other
    directories never open) and aggregated. Written once per sf_dir
    under /tmp."""
    import os

    tag = sf_dir.strip("/").replace("/", "_")
    root = f"/tmp/dcs_ray_partwrite_{tag}"
    done = f"{root}/.done"
    if not os.path.exists(done):
        docs = read_parquet_sized(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
        )
        docs.write_parquet(f"{root}/docs", partition_cols=["lang"])
        with open(done, "w") as f:
            f.write("ok")

    es = ray.data.read_parquet(f"{root}/docs/lang=es")

    def agg(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n": pa.array([len(b)], pa.int64()),
                "sum_chars": pa.array(
                    [int(b["n_chars"].to_numpy().astype(np.int64).sum())],
                    pa.int64(),
                ),
            }
        )

    parts = pa.concat_tables(
        pa.table(b)
        for b in es.map_batches(agg, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    return pa.table(
        {
            "lang": pa.array(["es"], pa.string()),
            "n_docs": pa.array(
                [int(parts["n"].to_numpy().sum())], pa.int64()
            ),
            "sum_chars": pa.array(
                [int(parts["sum_chars"].to_numpy().sum())], pa.int64()
            ),
        }
    )


def _q_minhash_estimate_error(sf_dir: str) -> pa.Table:
    """Sketch-accuracy audit of MinHash itself: for every LSH candidate
    pair, the 64-permutation signature-agreement ESTIMATE of Jaccard
    next to the exact shingle-set value and the absolute error — the
    measurement behind choosing 64 permutations. Signatures are
    computed only for pair PARTICIPANTS (semi-filtered per batch, like
    the verify join); every output value is a single exact division,
    so the gate is hash-stable."""
    from dcs_ray.functions.dedup import (
        jaccard_verify_pairs,
        minhash_candidate_pairs,
        minhash_signatures,
    )

    docs = _docs(sf_dir).materialize()
    pairs_ds = minhash_candidate_pairs(docs)
    pair_t = pa.concat_tables(
        pa.table(b) for b in pairs_ds.iter_batches(batch_format="pyarrow")
    )
    if len(pair_t) == 0:
        return pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "est_jaccard": pa.array([], pa.float64()),
                "exact_jaccard": pa.array([], pa.float64()),
                "abs_err": pa.array([], pa.float64()),
            }
        )
    ia = pair_t["id_a"].to_numpy().astype(np.int64)
    ib = pair_t["id_b"].to_numpy().astype(np.int64)
    lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
    uniq = np.unique(np.stack((lo, hi), axis=1), axis=0)
    ia, ib = uniq[:, 0], uniq[:, 1]
    participants = np.unique(np.concatenate((ia, ib)))
    part_ref = ray.put(participants)

    def sigs_batch(b: pa.Table) -> pa.Table:
        part = ray.get(part_ref)
        ids = b["doc_id"].to_numpy().astype(np.int64)
        pos = np.minimum(np.searchsorted(part, ids), len(part) - 1)
        keep = part[pos] == ids
        texts = b["text"].filter(pa.array(keep))
        sig = minhash_signatures(texts)
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "sig": pa.array(
                    [row.astype(np.int64).tolist() for row in sig],
                    pa.list_(pa.int64()),
                ),
            }
        )

    st = pa.concat_tables(
        pa.table(b)
        for b in docs.map_batches(sigs_batch, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    sid = st["doc_id"].to_numpy().astype(np.int64)
    S = (
        st["sig"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        .astype(np.int64).reshape(len(st), -1)
    )
    order = np.argsort(sid)
    sid, S = sid[order], S[order]
    a_idx = np.searchsorted(sid, ia)
    b_idx = np.searchsorted(sid, ib)
    est = (S[a_idx] == S[b_idx]).sum(axis=1).astype(np.float64) / S.shape[1]

    exact_ds = jaccard_verify_pairs(docs, pairs_ds, threshold=0.0)
    ex_t = pa.concat_tables(
        pa.table(b) for b in exact_ds.iter_batches(batch_format="pyarrow")
    )
    exid_a = ex_t["id_a"].to_numpy().astype(np.int64)
    exid_b = ex_t["id_b"].to_numpy().astype(np.int64)
    exj = ex_t["jaccard"].to_numpy(zero_copy_only=False)
    key = {(int(x), int(y)): float(j) for x, y, j in zip(exid_a, exid_b, exj)}
    exact = np.array([key[(int(x), int(y))] for x, y in zip(ia, ib)], np.float64)
    return pa.table(
        {
            "id_a": pa.array(ia, pa.int64()),
            "id_b": pa.array(ib, pa.int64()),
            "est_jaccard": pa.array(np.round(est, 6) + 0.0, pa.float64()),
            "exact_jaccard": pa.array(np.round(exact, 6) + 0.0, pa.float64()),
            "abs_err": pa.array(
                np.round(np.abs(est - exact), 6) + 0.0, pa.float64()
            ),
        }
    )


def _q_assoc_rules_sessions(sf_dir: str) -> pa.Table:
    """Association rules over 30-min sessions (market-basket metrics
    on top of the co-occurrence gate): per unordered type pair,
    support = P(A,B), both directed confidences, and lift = P(A,B)
    / (P(A)·P(B)) — joint counts from ``session_type_pairs``,
    marginals + total from the new ``session_type_singles`` kernel,
    all exact integers until the three divisions."""
    from dcs_ray.functions.windows import session_type_pairs, session_type_singles

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    ).materialize()
    pairs = pa.concat_tables(
        pa.table(b)
        for b in session_type_pairs(ev).iter_batches(batch_format="pyarrow")
    )
    singles = pa.concat_tables(
        pa.table(b)
        for b in session_type_singles(ev).iter_batches(batch_format="pyarrow")
    )
    sm = {
        t: int(n)
        for t, n in zip(
            singles["event_type"].to_pylist(), singles["n"].to_pylist()
        )
    }
    S = sm.pop("__sessions__")
    ta = pairs["type_a"].to_pylist()
    tb = pairs["type_b"].to_pylist()
    nb = pairs["n"].to_numpy().astype(np.int64)
    rows = []
    for a, b, n in zip(ta, tb, nb):
        na, nbb = sm[a], sm[b]
        rows.append(
            (
                a, b, int(n), na, nbb, S,
                round(int(n) / S, 6) + 0.0,
                round(int(n) / na, 6) + 0.0,
                round(int(n) / nbb, 6) + 0.0,
                round(int(n) * S / (na * nbb), 6) + 0.0,
            )
        )
    rows.sort(key=lambda r: (r[0], r[1]))
    cols = list(zip(*rows))
    return pa.table(
        {
            "type_a": pa.array(cols[0], pa.string()),
            "type_b": pa.array(cols[1], pa.string()),
            "n_both": pa.array(cols[2], pa.int64()),
            "n_a": pa.array(cols[3], pa.int64()),
            "n_b": pa.array(cols[4], pa.int64()),
            "n_sessions": pa.array(cols[5], pa.int64()),
            "support": pa.array(cols[6], pa.float64()),
            "conf_a_to_b": pa.array(cols[7], pa.float64()),
            "conf_b_to_a": pa.array(cols[8], pa.float64()),
            "lift": pa.array(cols[9], pa.float64()),
        }
    )


def _q_profile_orders(sf_dir: str) -> pa.Table:
    """Automated data profiling of the orders table: per column, row
    count, exact distinct count (non-null), and null count — the
    schema-audit report a pipeline runs before trusting a new feed.
    One combiner distinct-fold per column (exchange = |distinct|),
    null counts ride the same pass."""
    from dcs_ray.functions.relational import combiner_groupby

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=_PROFILE_COLS
    ).materialize()
    rows = []
    for col in _PROFILE_COLS:

        def prep(b: pa.Table, _c=col) -> pa.Table:
            vv = b[_c].drop_null()
            if pa.types.is_timestamp(vv.type):
                vv = vv.cast(pa.int64())
            return pa.table(
                {
                    "v": vv,
                    "one": pa.array(np.ones(len(vv), np.int64), pa.int64()),
                }
            )

        def nullcount(b: pa.Table, _c=col) -> pa.Table:
            return pa.table(
                {
                    "z": pa.array([0], pa.int64()),
                    "nn": pa.array([int(b[_c].null_count)], pa.int64()),
                }
            )

        g = pa.concat_tables(
            pa.table(b)
            for b in combiner_groupby(
                orders.map_batches(prep, batch_format="pyarrow"), ["v"], ["one"],
            ).iter_batches(batch_format="pyarrow")
        )
        nn = pa.concat_tables(
            pa.table(b)
            for b in combiner_groupby(
                orders.map_batches(nullcount, batch_format="pyarrow"),
                ["z"], ["nn"],
            ).iter_batches(batch_format="pyarrow")
        )
        n_null = int(nn["nn"].to_numpy().sum())
        rows.append(
            (col, int(g["one"].to_numpy().sum()) + n_null, len(g), n_null)
        )
    cols = list(zip(*rows))
    return pa.table(
        {
            "column_name": pa.array(cols[0], pa.string()),
            "n_rows": pa.array(cols[1], pa.int64()),
            "n_distinct": pa.array(cols[2], pa.int64()),
            "n_null": pa.array(cols[3], pa.int64()),
        }
    ).sort_by("column_name")


def _q_label_centroid_drift(sf_dir: str) -> pa.Table:
    """Embedding-space drift audit: per label, the cosine between the
    mean vector of EVEN vec_ids and of ODD vec_ids (two deterministic
    'snapshots' of the same population — cosine ≈ 1 means the halves
    agree; a drop flags drift/contamination). One streaming pass emits
    ≤ 2·|labels| (label, parity, Σvec, n) partials; cosines are 2·d
    driver floats."""
    emb = read_parquet_sized(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )

    def partial(b: pa.Table) -> pa.Table:
        from dcs_ray.functions.kmeans import _emb_f64

        E = _emb_f64(b["embedding"])
        lab = b["label"].to_numpy().astype(np.int64)
        par = b["vec_id"].to_numpy().astype(np.int64) % 2
        key = lab * 2 + par
        uk, inv = np.unique(key, return_inverse=True)
        sums = np.zeros((len(uk), E.shape[1]), np.float64)
        np.add.at(sums, inv, E)
        n = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(uk, pa.int64()),
                "s": pa.array(list(sums), pa.list_(pa.float64())),
                "n": pa.array(n, pa.int64()),
            }
        )

    rows = pa.concat_tables(
        pa.table(b)
        for b in emb.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    from dcs_ray.functions.kmeans import _emb_f64

    keys = rows["key"].to_numpy().astype(np.int64)
    S = _emb_f64(rows["s"])
    ns = rows["n"].to_numpy().astype(np.int64)
    d = S.shape[1]
    out = {}
    for k in np.unique(keys):
        m = keys == k
        sub = S[m]
        order = np.lexsort(tuple(sub[:, j] for j in range(d - 1, -1, -1)))
        out[int(k)] = (sub[order].sum(axis=0), int(ns[m].sum()))
    labels = sorted({k // 2 for k in out})
    rws = []
    for lb in labels:
        se, ne = out.get(lb * 2, (np.zeros(d), 0))
        so, no = out.get(lb * 2 + 1, (np.zeros(d), 0))
        if ne == 0 or no == 0:
            continue
        me, mo = se / ne, so / no
        cos = float(
            (me * mo).sum()
            / (np.sqrt((me * me).sum()) * np.sqrt((mo * mo).sum()))
        )
        rws.append((lb, ne, no, round(cos, 6) + 0.0))
    cols = list(zip(*rws))
    return pa.table(
        {
            "label": pa.array(cols[0], pa.int64()),
            "n_even": pa.array(cols[1], pa.int64()),
            "n_odd": pa.array(cols[2], pa.int64()),
            "cosine": pa.array(cols[3], pa.float64()),
        }
    )


def _q_dup_rate_by_source(sf_dir: str) -> pa.Table:
    """Exact-duplicate rate per source feed (the dedup REPORT next to
    the dedup operator): docs, distinct contents, and 1 − unique/total
    per source. Content hashes via the word-wise 64-bit kernel; the
    exchange is |source × distinct hash| combiner rows, text never
    shuffles."""
    from dcs_ray.functions.relational import combiner_groupby
    from dcs_ray.functions.textstats import content_hash_rows

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def prep(b: pa.Table) -> pa.Table:
        h = content_hash_rows(b["text"]).astype(np.int64)
        return pa.table({"source": b["source"], "h": pa.array(h, pa.int64())})

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            docs.map_batches(prep, batch_format="pyarrow"), ["source", "h"], [],
            count_col="c",
        ).iter_batches(batch_format="pyarrow")
    )
    src = g["source"].to_numpy(zero_copy_only=False)
    c = g["c"].to_numpy().astype(np.int64)
    us, inv = np.unique(src, return_inverse=True)
    n = np.zeros(len(us), np.int64)
    np.add.at(n, inv, c)
    uq = np.zeros(len(us), np.int64)
    np.add.at(uq, inv, 1)
    return pa.table(
        {
            "source": pa.array([str(x) for x in us], pa.string()),
            "n_docs": pa.array(n, pa.int64()),
            "n_unique": pa.array(uq, pa.int64()),
            "dup_rate": pa.array(
                np.round(1.0 - uq.astype(np.float64) / n.astype(np.float64), 6)
                + 0.0,
                pa.float64(),
            ),
        }
    )


def _q_ngram_dup_rate(sf_dir: str) -> pa.Table:
    """Corpus 8-gram duplication rate (Lee et al. '22's train-set
    memorization metric): the share of 8-token windows whose gram
    occurs more than once corpus-wide. Windows hash through the
    existing polynomial shingle kernel (n=8); the exchange is
    |distinct gram| combiner rows — window text never moves."""
    from dcs_ray.functions.dedup import _shingle_hashes
    from dcs_ray.functions.relational import combiner_groupby

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["text"])

    def prep(b: pa.Table) -> pa.Table:
        sh, _off = _shingle_hashes(b["text"], n=8)
        return pa.table({"h": pa.array(sh.astype(np.int64), pa.int64())})

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            docs.map_batches(prep, batch_format="pyarrow"), ["h"], [],
            count_col="c",
        ).iter_batches(batch_format="pyarrow")
    )
    c = g["c"].to_numpy().astype(np.int64)
    n_windows = int(c.sum())
    n_distinct = len(c)
    n_dup = int(c[c > 1].sum())
    return pa.table(
        {
            "n_windows": pa.array([n_windows], pa.int64()),
            "n_distinct": pa.array([n_distinct], pa.int64()),
            "n_dup_windows": pa.array([n_dup], pa.int64()),
            "dup_rate": pa.array(
                [round(n_dup / n_windows, 6) + 0.0 if n_windows else 0.0],
                pa.float64(),
            ),
        }
    )


def _q_orders_seasonality(sf_dir: str) -> pa.Table:
    """Month-of-year order seasonality: count and exact-cents volume
    per calendar month — the calendar companion to the day-of-week
    event profile, over the orders fact table. One 12-row combiner
    fold; month extraction is vectorized datetime64 arithmetic."""
    from dcs_ray.functions.relational import combiner_groupby

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    def prep(b: pa.Table) -> pa.Table:
        us = b["o_orderdate"].cast(pa.int64()).to_numpy()
        months = (
            us.astype("datetime64[us]").astype("datetime64[M]").astype(np.int64)
        )
        month = (months % 12) + 1
        cents = np.round(b["o_totalprice"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "month": pa.array(month, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            orders.map_batches(prep, batch_format="pyarrow"),
            ["month"], ["cents"], count_col="n_orders",
        ).iter_batches(batch_format="pyarrow")
    )
    return g.select(["month", "n_orders", "cents"]).sort_by("month")


def _q_shard_balance(sf_dir: str) -> pa.Table:
    """Shard-routing audit (J8/S6 made inspectable): per merged shard,
    the doc count and id range straight from the index's own
    doc_meta — and the ORACLE recomputes the full routing chain from
    raw documents (range partition span, per-partition posting
    weights, the greedy posting-balanced prefix split of
    ``merge.plan_shards``), so the deterministic placement contract is
    hash-gated end to end."""
    from dcs_ray.search import _open, shard_paths

    idx = _index_dir(sf_dir, "words")
    rows = []
    for sid, path in enumerate(shard_paths(idx)):
        seg = _open(path)
        ids = np.asarray(seg.doc_ids, dtype=np.int64)
        rows.append((sid, len(ids), int(ids.min()), int(ids.max())))
    cols = list(zip(*rows))
    return pa.table(
        {
            "shard_id": pa.array(cols[0], pa.int64()),
            "n_docs": pa.array(cols[1], pa.int64()),
            "min_doc": pa.array(cols[2], pa.int64()),
            "max_doc": pa.array(cols[3], pa.int64()),
        }
    )


def _q_dedup_method_agreement(sf_dir: str) -> pa.Table:
    """Cross-method dedup audit: how much the SimHash (hamming ≤ 3)
    and MinHash-LSH candidate-pair sets agree — the measurement that
    decides which near-dup detector (or both) a curation pipeline
    runs. Both pair generators run their normal distributed paths;
    the set comparison is |pairs| driver rows."""
    from dcs_ray.functions.dedup import (
        minhash_candidate_pairs,
        simhash_near_dup_pairs,
    )

    docs = _docs(sf_dir).materialize()

    def pair_set(ds: ray.data.Dataset) -> set:
        t = pa.concat_tables(
            pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")
        )
        if len(t) == 0:
            return set()
        a = t["id_a"].to_numpy().astype(np.int64)
        b = t["id_b"].to_numpy().astype(np.int64)
        return set(zip(np.minimum(a, b).tolist(), np.maximum(a, b).tolist()))

    sim = pair_set(simhash_near_dup_pairs(docs, max_hamming=3))
    mh = pair_set(minhash_candidate_pairs(docs))
    both = sim & mh
    union = sim | mh
    return pa.table(
        {
            "n_simhash_pairs": pa.array([len(sim)], pa.int64()),
            "n_minhash_pairs": pa.array([len(mh)], pa.int64()),
            "n_both": pa.array([len(both)], pa.int64()),
            "agreement_jaccard": pa.array(
                [round(len(both) / len(union), 6) + 0.0 if union else 1.0],
                pa.float64(),
            ),
        }
    )


def _q_capture_recapture_users(sf_dir: str) -> pa.Table:
    """Chapman capture–recapture estimate of the user population from
    the two timeline halves treated as independent samples: N̂ =
    (n₁+1)(n₂+1)/(m+1) − 1 with m the users seen in BOTH — the
    coverage estimator for 'how many users does the telemetry miss'.
    Reuses the churn gate's presence-flag fold (exchange = |users|)."""
    from dcs_ray.functions.relational import combiner_groupby
    from ray.data.aggregate import Max, Min

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    ).materialize()

    def to_us(b: pa.Table) -> pa.Table:
        return pa.table({"us": b["ts"].cast(pa.int64())})

    mm = ev.map_batches(to_us, batch_format="pyarrow").aggregate(
        Min("us"), Max("us")
    )
    mid = (int(mm["min(us)"]) + int(mm["max(us)"])) // 2

    def flags(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "user_id": b["user_id"].cast(pa.int64()),
                "f": pa.array((us < mid).astype(np.int64), pa.int64()),
                "s": pa.array((us >= mid).astype(np.int64), pa.int64()),
            }
        )

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ev.map_batches(flags, batch_format="pyarrow"), ["user_id"], ["f", "s"],
        ).iter_batches(batch_format="pyarrow")
    )
    f = g["f"].to_numpy().astype(np.int64) > 0
    s = g["s"].to_numpy().astype(np.int64) > 0
    n1, n2, m = int(f.sum()), int(s.sum()), int((f & s).sum())
    nhat = (n1 + 1) * (n2 + 1) / (m + 1) - 1.0
    return pa.table(
        {
            "n_first": pa.array([n1], pa.int64()),
            "n_second": pa.array([n2], pa.int64()),
            "n_both": pa.array([m], pa.int64()),
            "n_observed": pa.array([len(g)], pa.int64()),
            "chapman_estimate": pa.array(
                [round(nhat, 6) + 0.0], pa.float64()
            ),
        }
    )


def _q_negbin_overdispersion(sf_dir: str) -> pa.Table:
    """Method-of-moments negative-binomial fit of events-per-user
    (the overdispersed count model behind per-user activity): sample
    mean/variance from exact integer sums, r = m²/(v−m), p = m/v —
    with the VMR as the dispersion verdict. Exchange = |users|."""
    from dcs_ray.functions.relational import combiner_groupby

    ev = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["user_id"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"].cast(pa.int64())})

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ev.map_batches(prep, batch_format="pyarrow"), ["user_id"], [],
            count_col="n",
        ).iter_batches(batch_format="pyarrow")
    )
    n = g["n"].to_numpy().astype(np.int64)
    k = len(n)
    s1 = int(n.sum())
    s2 = int((n * n).sum())
    mean = s1 / k
    var = s2 / k - mean * mean  # population variance, exact-int moments
    vmr = var / mean
    over = var > mean
    r = mean * mean / (var - mean) if over else 0.0
    p = mean / var if over else 0.0
    return pa.table(
        {
            "n_users": pa.array([k], pa.int64()),
            "mean_events": pa.array([round(mean, 6) + 0.0], pa.float64()),
            "var_events": pa.array([round(var, 6) + 0.0], pa.float64()),
            "vmr": pa.array([round(vmr, 6) + 0.0], pa.float64()),
            "nb_r": pa.array([round(r, 6) + 0.0], pa.float64()),
            "nb_p": pa.array([round(p, 6) + 0.0], pa.float64()),
        }
    )


def _q_bm25_tiered(sf_dir: str) -> pa.Table:
    """Two-tier serving gate (the dcs serving-economics shape): a head
    query (any term's df > m) must fall back to the FULL tier and
    return the bit-identical BM25 top-10, while a tail query (all dfs
    ≤ m — here an out-of-vocab term, df 0) is served by the pruned
    tier; the routing counters ride along as gated columns, so a
    routing regression fails the hash."""
    from dcs_ray.index.prune import prune_index
    from dcs_ray.service import TieredSearchService

    idx = _index_dir(sf_dir, "words")
    out = idx + "_pruned32"
    if not os.path.exists(os.path.join(out, "MANIFEST.json")):
        prune_index(idx, out, m=32)
    with TieredSearchService(idx, out) as svc:
        t = svc.search([BM25_QUERY, "zzzznotaterm"], k=10)
        info = svc.routing_info()
    qid = t["query_id"].to_numpy(zero_copy_only=False)
    head = t.filter(pa.array(qid == 0))
    n = len(head)
    return pa.table(
        {
            "rank": head["rank"].cast(pa.int64()),
            "doc_id": head["doc_id"].cast(pa.int64()),
            "score": pa.array(
                np.round(head["score"].to_numpy(), 6) + 0.0, pa.float64()
            ),
            "route": pa.array(["full"] * n, pa.string()),
            "full_served": pa.array([info["full_served"]] * n, pa.int64()),
            "pruned_served": pa.array([info["pruned_served"]] * n, pa.int64()),
        }
    )


def _q_index_update_search(sf_dir: str) -> pa.Table:
    """Incremental-update gate (M3 through the driver, not just
    pytest): build a fresh words index, REPLACE partition 0 with
    modified content, re-merging only the affected shard — then BM25
    must rank against the MODIFIED corpus, which the oracle replays by
    applying the same text edit before the scoring chain."""
    from dcs_ray.search import search_bm25

    return _rank_table(search_bm25(_upd_index(sf_dir), [BM25_QUERY], k=10))


def _q_reshard_search(sf_dir: str) -> pa.Table:
    """Reshard gate (the dcs-reshard flow): the updated index re-merges
    its segments into FOUR shards (posting-balanced plan, atomic
    shards/ swap, no corpus-scale rebuild) and BM25 over the resharded
    index must stay rank-identical — same oracle corpus as the update
    gate, plus the new shard count as a gated column."""
    from dcs_ray.index.build import load_manifest, reshard
    from dcs_ray.search import search_bm25

    out = _upd_index(sf_dir)
    if load_manifest(out)["num_shards"] != 4:
        reshard(out, 4)
    t = _rank_table(search_bm25(out, [BM25_QUERY], k=10))
    return t.append_column("n_shards", pa.array([4] * len(t), pa.int64()))


def _q_incremental_crawl_search(sf_dir: str) -> pa.Table:
    """Continuous-crawl composition gate — the full lifecycle in one
    flow. Day-1 index holds the STALE crawl of every ``doc_id % 50 == 0``
    url (the pages synthesis' first-snapshot halves) and the current
    crawl of everything else; day 2's recrawl arrives as tombstone
    deletes of the stale docs, a physical compaction, and an NRT delta
    add of the fresh texts under NEW ids (``mx + 1 + old_id // 50`` —
    pure arithmetic so the oracle replays the remap). BM25 must then be
    rank-identical to a batch build of the final corpus state."""
    import json as _json

    import pyarrow.parquet as pq

    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.index.deletes import compact_deletes, delete_docs
    from dcs_ray.index.nrt import add_docs
    from dcs_ray.search import search_bm25

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(_CACHE_ROOT, f"{name}_words_incr")
    marker = os.path.join(out, ".recrawled")
    if not os.path.exists(marker):
        tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        ids = tbl["doc_id"].to_numpy()
        mx = int(ids.max())
        changed = ids % 50 == 0
        texts = tbl["text"].to_pylist()
        day1 = pa.table(
            {
                "doc_id": tbl["doc_id"],
                "text": pa.array(
                    [
                        t[: max(1, len(t) // 2)] if c else t
                        for t, c in zip(texts, changed)
                    ],
                    pa.string(),
                ),
            }
        )
        build_index(
            ray.data.from_arrow(day1), out,
            IndexConfig(
                num_partitions=8, num_shards=2, mode="words",
                id_col="doc_id", dedup_latest=False, id_max=mx,
            ),
        )
        old_ids = ids[changed]
        delete_docs(out, old_ids.astype(np.uint64))
        compact_deletes(out)
        fresh = pa.table(
            {
                "doc_id": pa.array(mx + 1 + old_ids // 50, pa.int64()),
                "text": tbl.filter(pa.array(changed))["text"],
            }
        )
        add_docs(out, fresh)
        with open(marker, "w") as f:
            _json.dump({"n_changed": int(changed.sum())}, f)
    with open(marker) as f:
        n_changed = _json.load(f)["n_changed"]
    t = _rank_table(search_bm25(out, [BM25_QUERY], k=10))
    return t.append_column(
        "n_changed", pa.array([n_changed] * len(t), pa.int64())
    )


def _q_fetch_schedule(sf_dir: str) -> pa.Table:
    """Crawl-scheduler gate: the frontier (newest crawl per url) gets a
    politeness-partitioned fetch plan — slot = rank within host, fetch
    order (slot, host, url), so wave 0 touches every host once. First
    60 fetches gated; the oracle replays the url synthesis and the
    per-host row_number."""
    from dcs_ray.functions.urls import fetch_schedule
    from dcs_ray.sources.pages import dedup_latest_crawl, read_pages

    sched = fetch_schedule(dedup_latest_crawl(read_pages(sf_dir)))
    t = pa.concat_tables(
        pa.table(b) for b in sched.iter_batches(batch_format="pyarrow")
    )
    return t.sort_by(
        [("slot", "ascending"), ("host", "ascending"), ("url", "ascending")]
    ).slice(0, 60)


def _q_cori_collection_ranking(sf_dir: str) -> pa.Table:
    """Federated-search gate: CORI collection selection (Callan '95)
    over three source-sharded sub-indexes — belief per collection from
    vocab-thin df/cw metadata only, no document reads; the oracle
    recomputes df/cw per source group and replays the T·I arithmetic."""
    import pyarrow.parquet as pq

    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.search import cori_collection_scores

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    dirs = []
    for g in range(3):
        out = os.path.join(_CACHE_ROOT, f"{name}_words_cori{g}")
        dirs.append(out)
        if os.path.exists(os.path.join(out, "MANIFEST.json")):
            continue
        tbl = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
        )
        grp = np.array(
            [int(s[3:]) % 3 for s in tbl["source"].to_pylist()], np.int64
        )
        sub = tbl.filter(pa.array(grp == g)).drop_columns(["source"])
        build_index(
            ray.data.from_arrow(sub), out,
            IndexConfig(
                num_partitions=4, num_shards=2, mode="words",
                id_col="doc_id", dedup_latest=False,
            ),
        )
    return cori_collection_scores(dirs, BM25_QUERY)


def _q_redirect_terminals(sf_dir: str) -> pa.Table:
    """Redirect-chain resolution gate (pointer doubling, Wyllie '79
    shortcutting): a synthetic HTTP-redirect map ``d → d//2`` for every
    ``d % 3 == 0, d > 0`` creates chains up to ~log₂(N) hops; the
    doubled map resolves every doc to its terminal in one broadcast
    probe pass, and the top-20 redirect sinks are gated. Oracle: six
    MATERIALIZED doubling self-joins (1 → 64-hop reach)."""
    import pyarrow.parquet as pq

    from dcs_ray.functions.graph import resolve_redirects

    ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_numpy()
    src = np.sort(ids[(ids % 3 == 0) & (ids > 0)].astype(np.int64))
    res = resolve_redirects(
        read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id"]),
        "doc_id", src, src // 2, n_rounds=6,
    )

    def partial(b: pa.Table) -> pa.Table:
        t, c = np.unique(b["terminal_id"].to_numpy(), return_counts=True)
        return pa.table(
            {"terminal_id": pa.array(t, pa.int64()), "n": pa.array(c, pa.int64())}
        )

    parts = pa.concat_tables(
        pa.table(b)
        for b in res.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    g = (
        parts.group_by("terminal_id")
        .aggregate([("n", "sum")])
        .sort_by([("n_sum", "descending"), ("terminal_id", "ascending")])
        .slice(0, 20)
    )
    return pa.table(
        {
            "terminal_id": g["terminal_id"],
            "n_docs": g["n_sum"].cast(pa.int64()),
        }
    )


def _q_team_draft_interleave(sf_dir: str) -> pa.Table:
    """Online ranker-comparison gate: team-draft interleaving of the
    BM25 and Dirichlet-QL top-10s (Radlinski '08) — every pick decision
    (balance, exhaustion, splitmix coin on ties) replayed as unrolled
    SQL rounds over both ranking chains."""
    from dcs_ray.functions.evaluate import team_draft_interleave
    from dcs_ray.search import search_bm25, search_lm

    idx = _index_dir(sf_dir, "words")
    a = search_bm25(idx, [BM25_QUERY], k=10)["doc_id"].to_pylist()
    b = search_lm(idx, [BM25_QUERY], k=10, model="qld", mu=300.0)[
        "doc_id"
    ].to_pylist()
    return team_draft_interleave(a, b, k=10, seed=7)


def _q_query_clarity(sf_dir: str) -> pa.Table:
    """Query-performance-prediction gate: clarity score of the BM25
    top-10 (uniform result-mixture LM vs collection LM, cf from the
    index's own postings) — the whole KL chain replayed in SQL."""
    from dcs_ray.search import query_clarity

    r = query_clarity(
        _index_dir(sf_dir, "words"), BM25_QUERY,
        f"{sf_dir}/documents.parquet", k=10,
    )
    return pa.table(
        {
            "clarity": pa.array([r["clarity"]], pa.float64()),
            "n_vocab": pa.array([r["n_vocab"]], pa.int64()),
            "n_docs": pa.array([r["n_docs"]], pa.int64()),
        }
    )


def _q_passage_best_window(sf_dir: str) -> pa.Table:
    """Passage retrieval gate (Callan '94 fixed-width): for each BM25
    top-10 doc, the 30-token window with the most query-term hits
    (earliest on ties) — all-integer output, replayed in SQL from
    zipped unnest positions with a RANGE-frame window count."""
    import pyarrow.parquet as pq

    from dcs_ray.grep import best_passage_windows
    from dcs_ray.search import search_bm25

    words = _index_dir(sf_dir, "words")
    t = search_bm25(words, [BM25_QUERY], k=10)
    ids = t["doc_id"].to_pylist()
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        filters=[("doc_id", "in", ids)],
    ).sort_by("doc_id")
    win = best_passage_windows(docs["text"], ["join", "merge", "spark"], window=30)
    by_id = {
        int(d): (s, h)
        for d, s, h in zip(
            docs["doc_id"].to_pylist(),
            win["pass_start"].to_pylist(),
            win["pass_hits"].to_pylist(),
        )
    }
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "doc_id": t["doc_id"].cast(pa.int64()),
            "pass_start": pa.array([by_id[int(i)][0] for i in ids], pa.int64()),
            "pass_hits": pa.array([by_id[int(i)][1] for i in ids], pa.int64()),
        }
    )


def _q_query_string_extended(sf_dir: str) -> pa.Table:
    """Extended-grammar gate: ``+required`` posting membership and a
    negated exact phrase (``-"spark merge"``) compose with plain BM25
    terms — required/negated membership evaluates per shard, the
    negated phrase via the positional pre-pass. Oracle: tokenized
    EXISTS for the + operator, instr() = 0 for the negated phrase."""
    from dcs_ray.search import search_query

    raw = 'join batch value +window -"spark merge"'
    return _rank_table(
        search_query(
            _index_dir(sf_dir, "words"), raw, k=10,
            phrase_index_dir=_index_dir(sf_dir, "trigram"),
        )
    )


def _q_bm25_clustered_prune(sf_dir: str) -> pa.Table:
    """Zone-map shard pruning gate: doc ids REASSIGNED in (source,
    doc_id) order so id-range partitions align with sources, then a
    ``source:src0`` filtered BM25 — the driver plans the fan-out from
    shard-lineage zone maps and scans ONLY the shards whose value sets
    can match (``search.prune_shards``). The oracle replays the id
    remap, the posting-balanced 2-shard split, and counts the shards
    that actually hold src0 docs (= what exact zone maps scan)."""
    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.search import prune_shards, search_bm25, shard_paths

    import pyarrow.parquet as pq

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(_CACHE_ROOT, f"{name}_words_srccluster")
    if not os.path.exists(os.path.join(out, "MANIFEST.json")):
        tbl = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
        ).sort_by([("source", "ascending"), ("doc_id", "ascending")])
        remapped = pa.table(
            {
                "doc_id": pa.array(np.arange(len(tbl), dtype=np.int64)),
                "text": tbl["text"],
                "source": tbl["source"],
            }
        )
        build_index(
            ray.data.from_arrow(remapped), out,
            IndexConfig(
                num_partitions=8, num_shards=2, mode="words",
                id_col="doc_id", dedup_latest=False, meta_cols=("source",),
            ),
        )
    filters = {"include": {"source": ["src0"]}}
    scanned = len(prune_shards(shard_paths(out), filters))
    t = _rank_table(search_bm25(out, [BM25_QUERY], k=10, filters=filters))
    return t.append_column(
        "n_shards_scanned", pa.array([scanned] * len(t), pa.int64())
    )


def _q_query_string_search(sf_dir: str) -> pa.Table:
    """Unified query-string gate (the dcs-web front door): ONE raw query
    exercising the whole grammar — BM25 terms, an exact-phrase
    constraint resolved by a positional pre-pass on the trigram index,
    a per-shard posting-membership negation (``-window``, no driver id
    list), and a keyword exclusion (``-source:src5``). The oracle
    replays each operator: instr() for the phrase, a tokenized NOT-IN
    for the negation, the meta inequality, full-corpus BM25 stats."""
    from dcs_ray.search import search_query

    raw = 'join batch value "spark merge" -window -source:src5'
    return _rank_table(
        search_query(
            _index_dir(sf_dir, "words"), raw, k=10,
            phrase_index_dir=_index_dir(sf_dir, "trigram"),
        )
    )


def _q_nrt_add_search(sf_dir: str) -> pa.Table:
    """NRT-add gate (``index/nrt.py``, Lucene flush model): the index is
    built over the oldest 60% of doc ids, then the remaining 40% arrive
    as TWO delta-segment adds — BM25 over main + deltas must be
    rank-identical (scores included) to the full-corpus oracle chain,
    because df/N/avgdl recompute exactly on every add."""
    import json as _json

    import pyarrow.parquet as pq

    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.index.nrt import add_docs
    from dcs_ray.search import search_bm25

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(_CACHE_ROOT, f"{name}_words_nrt")
    marker = os.path.join(out, ".nrt_added")
    if not os.path.exists(marker):
        tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        ids = np.sort(tbl["doc_id"].to_numpy())
        cut1 = int(ids[int(len(ids) * 0.6)])
        cut2 = int(ids[int(len(ids) * 0.8)])
        col = tbl["doc_id"].to_numpy()
        build_index(
            ray.data.from_arrow(tbl.filter(pa.array(col < cut1))), out,
            IndexConfig(
                num_partitions=8, num_shards=2, mode="words",
                id_col="doc_id", dedup_latest=False,
            ),
        )
        add_docs(out, tbl.filter(pa.array((col >= cut1) & (col < cut2))))
        info = add_docs(out, tbl.filter(pa.array(col >= cut2)))
        with open(marker, "w") as f:
            _json.dump(info, f)
    with open(marker) as f:
        info = _json.load(f)
    t = _rank_table(search_bm25(out, [BM25_QUERY], k=10))
    return t.append_column(
        "n_delta_segments",
        pa.array([int(info["n_delta_segments"])] * len(t), pa.int64()),
    )


def _q_delete_search(sf_dir: str) -> pa.Table:
    """Tombstone-delete gate (Lucene live-docs model,
    ``index/deletes.py``): the query's pre-delete #1 doc plus a
    partition-0 id band are tombstoned — NO segment byte changes — and
    BM25 must exclude them while survivors keep their PRE-delete scores
    (df/N/avgdl still count the dead until compaction), which the oracle
    replays by scoring over the full corpus and filtering the dead set
    AFTER scoring."""
    from dcs_ray.index.deletes import delete_docs, load_tombstones
    from dcs_ray.search import search_bm25

    out = _words_index_fresh(sf_dir, "del")
    marker = os.path.join(out, ".deleted")
    if not os.path.exists(marker):
        import pyarrow.parquet as pq

        top1 = search_bm25(out, [BM25_QUERY], k=1)["doc_id"][0].as_py()
        ids = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id"]
        )["doc_id"].to_numpy()
        span = (int(ids.max()) + 8) // 8
        band = ids[(ids < span) & (ids % 5 == 2)]
        delete_docs(out, np.append(band.astype(np.uint64), np.uint64(top1)))
        with open(marker, "w") as f:
            f.write("ok")
    t = _rank_table(search_bm25(out, [BM25_QUERY], k=10))
    n = int(len(load_tombstones(out)))
    return t.append_column("n_tombstones", pa.array([n] * len(t), pa.int64()))


def _q_delete_compact_search(sf_dir: str) -> pa.Table:
    """Compaction gate: a partition-0 id band is tombstoned then
    PHYSICALLY compacted (only the one affected partition's segments
    rewrite, only its shard re-merges, corpus stats recompute) — ranking
    must now equal a fresh build of the surviving corpus, so the oracle
    recomputes the whole BM25 chain (df, N, avgdl included) over the
    survivors. ``n_compacted_parts`` gates the partition isolation."""
    import json as _json

    from dcs_ray.index.deletes import compact_deletes, delete_docs
    from dcs_ray.search import search_bm25

    out = _words_index_fresh(sf_dir, "delc")
    marker = os.path.join(out, ".compacted")
    if not os.path.exists(marker):
        import pyarrow.parquet as pq

        ids = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id"]
        )["doc_id"].to_numpy()
        span = (int(ids.max()) + 8) // 8
        band = ids[(ids < span) & (ids % 5 == 2)]
        delete_docs(out, band.astype(np.uint64))
        info = compact_deletes(out)
        with open(marker, "w") as f:
            _json.dump(info, f)
    with open(marker) as f:
        info = _json.load(f)
    t = _rank_table(search_bm25(out, [BM25_QUERY], k=10))
    return t.append_column(
        "n_compacted_parts",
        pa.array([int(info["n_compacted_partitions"])] * len(t), pa.int64()),
    )


def _q_bm25_codec_variant(sf_dir: str, codec: str) -> pa.Table:
    """Cross-codec rank-identity gate: the same corpus built with a
    DIFFERENT posting-body codec must return the bit-identical BM25
    top-10 (dcs's varint→TurboPFor migration contract, C1/C2: codecs
    change bytes, never ranks)."""
    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.search import search_bm25

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(_CACHE_ROOT, f"{name}_words_{codec}")
    if not os.path.exists(os.path.join(out, "MANIFEST.json")):
        docs = read_parquet_sized(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        build_index(
            docs, out,
            IndexConfig(
                num_partitions=8, num_shards=2, mode="words",
                id_col="doc_id", dedup_latest=False, codec=codec,
            ),
        )
    return _rank_table(search_bm25(out, [BM25_QUERY], k=10))


def _q_df_histogram(sf_dir: str) -> pa.Table:
    """Posting-list-size distribution straight from the index's own
    vocab artifact (S9's ``stats/df.parquet``): terms and postings per
    ⌊log2 df⌋ bucket — the shape that sizes posting-block and cache
    budgets. The oracle recomputes df from raw text, so the artifact
    itself is hash-gated."""
    idx = _index_dir(sf_dir, "words")
    dft = ray.data.read_parquet(os.path.join(idx, "stats", "df.parquet"))

    def bucketize(b: pa.Table) -> pa.Table:
        df = b["df"].to_numpy().astype(np.int64)
        pow2 = 1 << np.arange(1, 63, dtype=np.int64)
        bucket = np.searchsorted(pow2, df, side="right").astype(np.int64)
        ub, inv = np.unique(bucket, return_inverse=True)
        terms = np.zeros(len(ub), np.int64)
        np.add.at(terms, inv, 1)
        posts = np.zeros(len(ub), np.int64)
        np.add.at(posts, inv, df)
        return pa.table(
            {
                "bucket": pa.array(ub, pa.int64()),
                "n_terms": pa.array(terms, pa.int64()),
                "n_postings": pa.array(posts, pa.int64()),
            }
        )

    from dcs_ray.functions.relational import combiner_groupby

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            dft.map_batches(bucketize, batch_format="pyarrow"),
            ["bucket"], ["n_terms", "n_postings"],
        ).iter_batches(batch_format="pyarrow")
    )
    return g.select(["bucket", "n_terms", "n_postings"]).sort_by("bucket")


def _q_prune_report(sf_dir: str) -> pa.Table:
    """Prune-job accounting: postings in the full index vs its m=32
    pruned generation, measured from BOTH generations' own term_dict
    artifacts — and the oracle recomputes Σdf and Σmin(df, 32) from
    raw text, so the global top-m cut's arithmetic is gated end to
    end."""
    import pyarrow.parquet as pq

    from dcs_ray.index.prune import prune_index
    from dcs_ray.search import shard_paths

    idx = _index_dir(sf_dir, "words")
    pruned = idx + "_pruned32"
    if not os.path.exists(os.path.join(pruned, "MANIFEST.json")):
        prune_index(idx, pruned, m=32)

    def totals(index_dir: str) -> tuple[int, int]:
        n_terms, n_post = {}, 0
        for p in shard_paths(index_dir):
            td = pq.read_table(
                os.path.join(p, "term_dict.parquet"), columns=["term", "df"]
            )
            for term, df in zip(
                td["term"].to_pylist(), td["df"].to_numpy().astype(np.int64)
            ):
                n_terms[term] = n_terms.get(term, 0) + int(df)
        return len(n_terms), sum(n_terms.values())

    vocab_full, post_full = totals(idx)
    vocab_pruned, post_pruned = totals(pruned)
    return pa.table(
        {
            "n_terms_full": pa.array([vocab_full], pa.int64()),
            "n_terms_pruned": pa.array([vocab_pruned], pa.int64()),
            "postings_full": pa.array([post_full], pa.int64()),
            "postings_pruned": pa.array([post_pruned], pa.int64()),
            "kept_ratio": pa.array(
                [round(post_pruned / post_full, 6) + 0.0], pa.float64()
            ),
        }
    )


def _q_hll_error_audit(sf_dir: str) -> pa.Table:
    """Sketch-accuracy audit for HLL (the trilogy next to the quantile
    and MinHash error gates): the p=12 estimate next to the exact
    distinct-user count with absolute and relative error — what says
    whether 4 KB of registers may replace the exact |users| exchange
    at 100×. Both sides fold distributed."""
    from dcs_ray.functions.relational import combiner_groupby
    from dcs_ray.functions.sketches import approx_distinct_hll

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id"]
    ).materialize()
    est, _ = approx_distinct_hll(ev, "user_id", p=12)
    est_r = round(est, 6)
    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ev.map_batches(
                lambda b: pa.table({"user_id": b["user_id"].cast(pa.int64())}),
                batch_format="pyarrow",
            ),
            ["user_id"], [],
        ).iter_batches(batch_format="pyarrow")
    )
    n = len(g)
    return pa.table(
        {
            "n_exact": pa.array([n], pa.int64()),
            "estimate": pa.array([est_r + 0.0], pa.float64()),
            "abs_err": pa.array([round(abs(est_r - n), 6) + 0.0], pa.float64()),
            "rel_err": pa.array(
                [round(abs(est_r - n) / n, 6) + 0.0], pa.float64()
            ),
        }
    )


def _q_cms_error_audit(sf_dir: str) -> pa.Table:
    """Count-min overcount audit: the sketch's top-3 event-type
    estimates next to the exact counts — CMS never undercounts, so
    the gated ``overcount`` column is also a structural invariant
    (negative would mean a broken fold). Sketch and exact folds are
    both constant-size exchanges."""
    from dcs_ray.functions.relational import combiner_groupby
    from dcs_ray.functions.sketches import cms_heavy_hitters

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_type"]
    ).materialize()
    cms = cms_heavy_hitters(ev, "event_type", k=3)
    ex = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(ev, ["event_type"], [], count_col="n")
        .iter_batches(batch_format="pyarrow")
    )
    exact = {
        t: int(n)
        for t, n in zip(ex["event_type"].to_pylist(), ex["n"].to_pylist())
    }
    types = cms["event_type"].to_pylist()
    ests = cms["n_est"].to_numpy().astype(np.int64)
    rows = sorted(
        (t, int(e), exact[t], int(e) - exact[t]) for t, e in zip(types, ests)
    )
    cols = list(zip(*rows))
    return pa.table(
        {
            "event_type": pa.array(cols[0], pa.string()),
            "cms_count": pa.array(cols[1], pa.int64()),
            "exact_count": pa.array(cols[2], pa.int64()),
            "overcount": pa.array(cols[3], pa.int64()),
        }
    )


def _q_bm25_exhaustive(sf_dir: str) -> pa.Table:
    """Scorer-equivalence gate through the driver: the EXHAUSTIVE
    per-term accumulator (``score_shard_all``) must return the same
    top-10 as the block-max MaxScore path the other BM25 gates run —
    the safety net that keeps the pruned scorer honest forever."""
    from dcs_ray.search import search_bm25

    idx = _index_dir(sf_dir, "words")
    return _rank_table(
        search_bm25(idx, [BM25_QUERY], k=10, method="exhaustive")
    )


def _q_user_rolling_value_7d(sf_dir: str) -> pa.Table:
    """RANGE-frame window: per event, the user's total purchase-plus-
    other value (exact cents) over the trailing 7 DAYS including ts
    peers — the sliding-window feature a fraud/abuse model reads. One
    bucketed per-user lexsort with an integer prefix-sum + vectorized
    searchsorted lower bound; no per-row loop, exchange = |events|
    4-tuples."""
    from dcs_ray.functions.joins import _key_bucket

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    WIN = 7 * 86_400_000_000

    def tag(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.int64)
        cents = np.floor(b["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(_key_bucket(uid, 64), pa.int32()),
                "user_id": pa.array(uid, pa.int64()),
                "us": b["ts"].cast(pa.int64()),
                "event_id": b["event_id"].cast(pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy().astype(np.int64)
        us = g["us"].to_numpy().astype(np.int64)
        eid = g["event_id"].to_numpy().astype(np.int64)
        cents = g["cents"].to_numpy().astype(np.int64)
        order = np.lexsort((eid, us, u))
        u, us, eid, cents = u[order], us[order], eid[order], cents[order]
        n = len(u)
        new_run = np.ones(n, bool)
        new_run[1:] = u[1:] != u[:-1]
        run_id = np.cumsum(new_run) - 1
        cum = np.cumsum(cents)
        prefix = np.concatenate(([0], cum))
        # RANGE frame bounds for ALL users in ONE searchsorted pass:
        # per-run time bands (run_id · HUGE keeps users disjoint, and
        # key − WIN cannot cross a band). Upper bound includes ts peers
        # of the current row (SQL CURRENT ROW in RANGE mode).
        huge = (int(us.max()) - int(us.min()) if n else 0) + WIN + 1
        key = us + run_id * huge
        lo = np.searchsorted(key, key - WIN, side="left")
        hi = np.searchsorted(key, key, side="right")
        out = prefix[hi] - prefix[lo]
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "cents_7d": pa.array(out, pa.int64()),
            }
        )

    t = pa.concat_tables(
        pa.table(b)
        for b in ev.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    return t.sort_by("event_id")


def _q_bm25_filtered_exclude(sf_dir: str) -> pa.Table:
    """Negated keyword filter (dcs ``-package:`` syntax): BM25 ranking
    with two sources EXCLUDED via the same in-shard filter path the
    include gate exercises — candidate generation, scoring and the
    per-shard top-k never see the excluded docs."""
    from dcs_ray.queryplan import rewrite_query
    from dcs_ray.search import filters_from_keywords, search_bm25

    q, includes, negates = rewrite_query(
        f"{BM25_QUERY} -source:src0 -source:src1"
    )
    idx = _index_dir(sf_dir, "words")
    t = search_bm25(
        idx, [q], k=10, filters=filters_from_keywords(includes, negates)
    )
    return _rank_table(t)


def _q_service_cache_hit(sf_dir: str) -> pa.Table:
    """Finished-query result cache gate (dcs querymanager's ~30-min
    cache): the SAME query served twice from a resident service — the
    second call must come from the driver-side cache (zero actor round
    trips) with bit-identical results; the hit/miss counters ride as
    gated columns so a cache regression fails the hash."""
    from dcs_ray.service import SearchService

    idx = _index_dir(sf_dir, "words")
    with SearchService(idx) as svc:
        t1 = svc.search([BM25_QUERY], k=10)
        t2 = svc.search([BM25_QUERY], k=10)
        hits, misses = svc.cache_hits, svc.cache_misses
    if not t1.equals(t2):
        raise AssertionError("cached result differs from live result")
    out = _rank_table(t2)
    n = len(out)
    return pa.table(
        {
            "rank": out["rank"],
            "doc_id": out["doc_id"],
            "score": out["score"],
            "cache_hits": pa.array([hits] * n, pa.int64()),
            "cache_misses": pa.array([misses] * n, pa.int64()),
        }
    )


def _q_sq8_codes(sf_dir: str) -> pa.Table:
    """Scalar (int8-range) quantization of the embedding column — the
    OTHER vector-compression path next to PQ: per-dim [min, max] from
    one streaming min/max fold, code = ⌊(v − lo)/(hi − lo)·255⌋
    clamped to [0, 255]. Codes for four sampled dims (one per PQ
    subspace) are gated per vector — all-integer output, so the gate
    is hash-exact; the per-dim bounds fold is a 2·d exchange."""
    from dcs_ray.functions.kmeans import _emb_f64

    emb = read_parquet_sized(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()

    def minmax(b: pa.Table) -> pa.Table:
        E = _emb_f64(b["embedding"])
        return pa.table(
            {
                "lo": pa.array([E.min(axis=0).tolist()], pa.list_(pa.float64())),
                "hi": pa.array([E.max(axis=0).tolist()], pa.list_(pa.float64())),
            }
        )

    mm = pa.concat_tables(
        pa.table(b)
        for b in emb.map_batches(minmax, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    LO = _emb_f64(mm["lo"]).min(axis=0)
    HI = _emb_f64(mm["hi"]).max(axis=0)
    ref = ray.put((LO.copy(), HI.copy()))

    def codes(b: pa.Table) -> pa.Table:
        lo, hi = ray.get(ref)
        E = _emb_f64(b["embedding"])
        w = hi - lo
        w = np.where(w > 0, w, 1.0)
        c = np.clip(
            np.floor((E - lo[None, :]) / w[None, :] * 255).astype(np.int64),
            0, 255,
        )
        cols = {"vec_id": b["vec_id"].cast(pa.int64())}
        for d in _SQ_DIMS:
            cols[f"code_d{d}"] = pa.array(c[:, d - 1], pa.int64())
        return pa.table(cols)

    t = pa.concat_tables(
        pa.table(b)
        for b in emb.map_batches(codes, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    return t.sort_by("vec_id")


def _q_image_features_lossless(sf_dir: str) -> pa.Table:
    """REAL image decode, fully ORACLED: PPM + PNG + GIF share one
    modular-arithmetic pixel recipe (GIF palette-quantized //43·43),
    and all three codecs are LOSSLESS — so the per-channel mean/std +
    2×2 luma-grid features replay in SQL straight from the recipe,
    gating the zlib/Paeth PNG and LZW GIF decoders bit-for-bit against
    arithmetic. (The mixed gate with lossy JPEG stays rows-only — a
    lossy decode has no closed-form pixels.) Exploded (media_id, dim,
    val) output, float32-cast then round-6 like the extractor."""
    from dcs_ray.functions.multimodal import (
        PpmImageFeatureExtractor,
        synthesize_gif_media,
        synthesize_png_media,
        synthesize_ppm_media,
    )

    ppm = synthesize_ppm_media(32)
    png = synthesize_png_media(32)
    png = png.set_column(
        png.schema.get_field_index("media_id"), "media_id",
        pa.array(np.arange(32, 64), pa.int64()),
    )
    gif = synthesize_gif_media(32)
    gif = gif.set_column(
        gif.schema.get_field_index("media_id"), "media_id",
        pa.array(np.arange(64, 96), pa.int64()),
    )
    media = ray.data.from_arrow(pa.concat_tables([ppm, png, gif]))
    ds = media.map_batches(
        PpmImageFeatureExtractor, concurrency=2, batch_size=32,
        batch_format="pyarrow", num_cpus=1,
    )
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    ).sort_by("media_id")
    feat = t["feature"].combine_chunks()
    parents = pc.list_parent_indices(feat).to_numpy(zero_copy_only=False)
    flat = feat.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    ids = t["media_id"].to_numpy().astype(np.int64)
    dim = np.concatenate([np.arange(len(feat[i])) for i in range(len(t))])
    return pa.table(
        {
            "media_id": pa.array(ids[parents], pa.int64()),
            "dim": pa.array(dim.astype(np.int64), pa.int64()),
            "val": pa.array(np.round(flat, 6) + 0.0, pa.float64()),
        }
    )


def _q_video_frames_lossless(sf_dir: str) -> pa.Table:
    """REAL video demux, fully ORACLED: concatenated-PPM streams and
    animated GIFs (both lossless) sampled 4-evenly (frames 0/3/6/9 of
    12), each sampled frame decoded and reduced to EXACT integer
    channel sums — replayed in SQL from the per-frame pixel recipe, so
    the stream indexer, the GIF LZW frame decoder, the sampling rule
    and the timestamp arithmetic are all hash-gated. (The MJPEG AVI
    path stays in the rows-only mixed gate — lossy frames have no
    closed-form pixels.)"""
    from dcs_ray.functions.multimodal import (
        PpmStreamFrameSampler,
        decode_ppm,
        synthesize_gif_video,
        synthesize_ppm_video,
    )

    ppm_v = synthesize_ppm_video(32)
    gif_v = synthesize_gif_video(16)
    gif_v = gif_v.set_column(
        gif_v.schema.get_field_index("media_id"), "media_id",
        pa.array(np.arange(32, 48), pa.int64()),
    )
    media = ray.data.from_arrow(pa.concat_tables([ppm_v, gif_v]))

    class SampleAndSum(PpmStreamFrameSampler):
        def __call__(self, batch: pa.Table) -> pa.Table:
            t = super().__call__(batch)
            sums = np.zeros((len(t), 3), np.int64)
            for i, p in enumerate(t["frame"].combine_chunks()):
                img = decode_ppm(p.as_py())
                sums[i] = img.astype(np.int64).sum(axis=(0, 1))
            return pa.table(
                {
                    "media_id": t["media_id"],
                    "frame_idx": t["frame_idx"].cast(pa.int64()),
                    "ts_ms": t["ts_ms"].cast(pa.int64()),
                    "sum_r": pa.array(sums[:, 0], pa.int64()),
                    "sum_g": pa.array(sums[:, 1], pa.int64()),
                    "sum_b": pa.array(sums[:, 2], pa.int64()),
                }
            )

    ds = media.map_batches(
        SampleAndSum, fn_constructor_kwargs={"k": 4}, concurrency=2,
        batch_size=16, batch_format="pyarrow", num_cpus=1,
    )
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    return t.sort_by(
        [("media_id", "ascending"), ("frame_idx", "ascending")]
    )


def _q_video_frames_mjpeg(sf_dir: str) -> pa.Table:
    """REAL compressed-container video demux, fully ORACLED: MJPEG
    AVIs (RIFF chunk index → per-frame baseline-JPEG decode of ONLY
    the 4 evenly-sampled frames) whose frames are flat closed-form
    color tiles — exact integer channel sums replayed in SQL from the
    DC-only decode chain. Extends the lossless video gate
    (PPM/GIF) to the container shape a real crawl actually serves."""
    from dcs_ray.functions.avi import synthesize_avi_flat_video
    from dcs_ray.functions.multimodal import PpmStreamFrameSampler, decode_ppm

    media = ray.data.from_arrow(synthesize_avi_flat_video(16, frames=12, tiles=2))

    class SampleAndSum(PpmStreamFrameSampler):
        def __call__(self, batch: pa.Table) -> pa.Table:
            t = super().__call__(batch)
            sums = np.zeros((len(t), 3), np.int64)
            for i, p in enumerate(t["frame"].combine_chunks()):
                img = decode_ppm(p.as_py())
                sums[i] = img.astype(np.int64).sum(axis=(0, 1))
            return pa.table(
                {
                    "media_id": t["media_id"],
                    "frame_idx": t["frame_idx"].cast(pa.int64()),
                    "ts_ms": t["ts_ms"].cast(pa.int64()),
                    "sum_r": pa.array(sums[:, 0], pa.int64()),
                    "sum_g": pa.array(sums[:, 1], pa.int64()),
                    "sum_b": pa.array(sums[:, 2], pa.int64()),
                }
            )

    ds = media.map_batches(
        SampleAndSum, fn_constructor_kwargs={"k": 4}, concurrency=2,
        batch_size=16, batch_format="pyarrow", num_cpus=1,
    )
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    return t.sort_by([("media_id", "ascending"), ("frame_idx", "ascending")])


def _q_image_features_jpeg(sf_dir: str) -> pa.Table:
    """REAL baseline-JPEG decode, fully ORACLED: fixtures are flat
    8×8-tile JPEGs (half greyscale exact-round-trip at quality 50, half
    color 4:4:4 with rejection-screened tile colors) whose decoded
    pixels are a CLOSED FORM of the tile params — so the huffman
    parse, DC prediction, dequant, batched IDCT and YCbCr→RGB all
    hash-gate against pure SQL arithmetic. Closes the gap the lossless
    gate documents ('a lossy decode has no closed-form pixels'): a
    DC-only lossy decode does."""
    from dcs_ray.functions.multimodal import (
        PpmImageFeatureExtractor,
        synthesize_jpeg_flat_media,
    )

    media = ray.data.from_arrow(synthesize_jpeg_flat_media(32, tiles=4))
    ds = media.map_batches(
        PpmImageFeatureExtractor, concurrency=2, batch_size=16,
        batch_format="pyarrow", num_cpus=1,
    )
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    ).sort_by("media_id")
    feat = t["feature"].combine_chunks()
    parents = pc.list_parent_indices(feat).to_numpy(zero_copy_only=False)
    flat = feat.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    ids = t["media_id"].to_numpy().astype(np.int64)
    dim = np.concatenate([np.arange(len(feat[i])) for i in range(len(t))])
    return pa.table(
        {
            "media_id": pa.array(ids[parents], pa.int64()),
            "dim": pa.array(dim.astype(np.int64), pa.int64()),
            "val": pa.array(np.round(flat, 6) + 0.0, pa.float64()),
        }
    )


def _q_pagerank_convergence(sf_dir: str) -> pa.Table:
    """Convergence monitor for the iterative web-rank job: the L1
    distance between successive (round-6) PageRank vectors for
    iterations 1..5 — the number an operator watches to decide when a
    100-TB rank job may stop early. Each prefix run reuses the normal
    streaming-edges engine; the oracle diffs the r{i} relations of the
    single replay chain."""
    from dcs_ray.functions.links import link_pagerank

    edges = _link_edges_ds(sf_dir).materialize()
    prev = None
    rows = []
    for i in range(1, 6):
        t = link_pagerank(edges, n_iter=i, damping=0.85).sort_by("node")
        r = t["rank"].to_numpy(zero_copy_only=False)
        if prev is None:
            n = len(r)
            prev = np.full(n, round(1.0 / n, 6))
        delta = float(np.abs(r - prev).sum())
        rows.append((i, round(delta, 6) + 0.0))
        prev = r
    cols = list(zip(*rows))
    return pa.table(
        {
            "iteration": pa.array(cols[0], pa.int64()),
            "l1_delta": pa.array(cols[1], pa.float64()),
        }
    )


def _q_funnel_within_1h(sf_dir: str) -> pa.Table:
    """WINDOWED conversion funnel: view → click → purchase where every
    next step must land within ONE HOUR of the previous step's time
    (strictly later, earliest eligible) — the 'convert within the
    session hour' product metric the unconstrained funnel gate can't
    answer. Same bucketed lexsort/reduceat kernel, one extra vectorized
    gap mask."""
    from dcs_ray.functions.windows import funnel_steps

    ds = funnel_steps(
        read_parquet_sized(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
        ),
        steps=["view", "click", "purchase"],
        max_gap_us=3_600_000_000,
    )
    t = pa.concat_tables(
        pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")
    )
    return t.sort_by("user_id")


def _q_top2_versions_per_source(sf_dir: str) -> pa.Table:
    """Snapshot retention policy (J7 generalized): keep the TWO newest
    Debian-version snapshots per source ('current + previous', the
    rollback rule a crawl archive runs), comparator-ordered with max-id
    tie-break and a gated 1-based version_rank."""
    from dcs_ray.versions import top_n_versions_per_key

    def with_version(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        ver = [
            f"{i % 4}.{i % 10}" + ("~rc1" if i % 3 == 0 else "") for i in ids
        ]
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "source": b["source"],
                "version": pa.array(ver),
            }
        )

    ds = top_n_versions_per_key(
        _docs(sf_dir).map_batches(with_version, batch_format="pyarrow"),
        "source", "version", n=2,
    )
    t = pa.concat_tables(
        pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")
    )
    return t.select(["source", "version_rank", "doc_id", "version"]).sort_by(
        [("source", "ascending"), ("version_rank", "ascending")]
    )


def _q_kaplan_meier_churn(sf_dir: str) -> pa.Table:
    """Kaplan–Meier survival curve of TIME-TO-FIRST-PURCHASE (whole
    days from a user's first event; users who never purchase are
    right-CENSORED at their last-seen duration): at each conversion
    time t, n at risk = users with duration ≥ t, dᵢ conversions,
    S(t) = Π(1 − dᵢ/nᵢ) — the survival analysis behind every
    time-to-convert forecast. Per-user (first, first-purchase, last)
    fold through one arrow-group_by partial + groupby min/max; the
    curve is |distinct durations| driver rows. S via exp(Σ ln(1−d/n)),
    the exact expression the SQL window replays."""
    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "event_type"]
    )

    def partial(b: pa.Table) -> pa.Table:
        big = np.iinfo(np.int64).max
        us = b["ts"].cast(pa.int64()).to_numpy()
        isp = pc.equal(b["event_type"], "purchase").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "user_id": b["user_id"].cast(pa.int64()),
                "us": pa.array(us, pa.int64()),
                "pus": pa.array(np.where(isp, us, big), pa.int64()),
            }
        )
        agg = t.group_by(["user_id"]).aggregate(
            [("us", "min"), ("us", "max"), ("pus", "min")]
        )
        return pa.table(
            {
                "user_id": agg["user_id"],
                "f": agg["us_min"],
                "l": agg["us_max"],
                "fp": agg["pus_min"],
            }
        )

    from ray.data.aggregate import Max, Min

    ag = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("f"), Max("l"), Min("fp"))
    )
    t = pa.concat_tables(
        pa.table(b) for b in ag.iter_batches(batch_format="pyarrow")
    )
    f = t["min(f)"].to_numpy().astype(np.int64)
    l = t["max(l)"].to_numpy().astype(np.int64)
    fp = t["min(fp)"].to_numpy().astype(np.int64)
    big = np.iinfo(np.int64).max
    converted = fp != big
    dur = np.where(converted, (fp - f) // _US_PER_DAY, (l - f) // _US_PER_DAY)
    event = converted.astype(np.int64)
    death_t = np.unique(dur[event == 1])
    rows = []
    logs = 0.0
    for td in death_t:
        n_risk = int((dur >= td).sum())
        d = int(((dur == td) & (event == 1)).sum())
        logs += float(np.log(1.0 - d / n_risk)) if d < n_risk else -np.inf
        s = float(np.exp(logs))
        rows.append((int(td), n_risk, d, round(s, 6) + 0.0))
    if not rows:
        return pa.table(
            {
                "t_days": pa.array([], pa.int64()),
                "n_at_risk": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "survival": pa.array([], pa.float64()),
            }
        )
    cols = list(zip(*rows))
    return pa.table(
        {
            "t_days": pa.array(cols[0], pa.int64()),
            "n_at_risk": pa.array(cols[1], pa.int64()),
            "n_events": pa.array(cols[2], pa.int64()),
            "survival": pa.array(cols[3], pa.float64()),
        }
    )


def _q_ab_test_conversion(sf_dir: str) -> pa.Table:
    """Two-proportion z-test of purchase conversion between the
    user-parity 'experiment arms' (the A/B significance read-out):
    pooled-SE z = (p_A − p_B)/√(p̂(1−p̂)(1/n_A+1/n_B)) — exact integer
    counts until the final floats. One |users| combiner fold."""
    from dcs_ray.functions.relational import combiner_groupby

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def prep(b: pa.Table) -> pa.Table:
        isp = pc.equal(b["event_type"], "purchase").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": b["user_id"].cast(pa.int64()),
                "p": pa.array(isp.astype(np.int64), pa.int64()),
            }
        )

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ev.map_batches(prep, batch_format="pyarrow"), ["user_id"], ["p"],
        ).iter_batches(batch_format="pyarrow")
    )
    uid = g["user_id"].to_numpy().astype(np.int64)
    conv = (g["p"].to_numpy().astype(np.int64) > 0).astype(np.int64)
    arm = uid % 2
    nA, nB = int((arm == 0).sum()), int((arm == 1).sum())
    cA = int(conv[arm == 0].sum())
    cB = int(conv[arm == 1].sum())
    pA, pB = cA / nA, cB / nB
    pp = (cA + cB) / (nA + nB)
    se = float(np.sqrt(pp * (1.0 - pp) * (1.0 / nA + 1.0 / nB)))
    z = (pA - pB) / se if se > 0 else 0.0
    return pa.table(
        {
            "n_a": pa.array([nA], pa.int64()),
            "n_b": pa.array([nB], pa.int64()),
            "conv_a": pa.array([cA], pa.int64()),
            "conv_b": pa.array([cB], pa.int64()),
            "p_a": pa.array([round(pA, 6) + 0.0], pa.float64()),
            "p_b": pa.array([round(pB, 6) + 0.0], pa.float64()),
            "z_stat": pa.array([round(z, 6) + 0.0], pa.float64()),
        }
    )


def _q_holt_forecast_daily(sf_dir: str) -> pa.Table:
    """Holt double-exponential forecast of daily event volume (α=1/2,
    β=1/4 — DYADIC smoothing constants, so every level/trend value is
    an exact binary fraction and the recursion replays bit-for-bit in
    a recursive SQL CTE): l₁=x₁, b₁=x₂−x₁, then the standard
    level/trend updates over observed days and a 3-step-ahead linear
    forecast. The distributed part is the |days| fold."""
    c = _daily_event_counts(sf_dir)
    days = c["day"].to_numpy().astype(np.int64)
    ns = c["n"].to_numpy().astype(np.int64)
    order = np.argsort(days)
    x = ns[order].astype(np.float64)
    level = x[0]
    trend = x[1] - x[0]
    for t in range(1, len(x)):
        new_l = 0.5 * x[t] + 0.5 * (level + trend)
        trend = 0.25 * (new_l - level) + 0.75 * trend
        level = new_l
    rows = [
        (
            h,
            round(level + h * trend, 6) + 0.0,
            round(level, 6) + 0.0,
            round(trend, 6) + 0.0,
        )
        for h in (1, 2, 3)
    ]
    cols = list(zip(*rows))
    return pa.table(
        {
            "horizon": pa.array(cols[0], pa.int64()),
            "forecast": pa.array(cols[1], pa.float64()),
            "level": pa.array(cols[2], pa.float64()),
            "trend": pa.array(cols[3], pa.float64()),
        }
    )


def _q_lpa_modularity(sf_dir: str) -> pa.Table:
    """Newman modularity of the LPA communities (the quality score of
    the community gate's own output): Q = Σ_c [m_c/m − (D_c/2m)²] over
    the undirected distinct pair set. Labels broadcast once as a
    sorted array; intra-community edges count in one vectorized pair
    pass; degrees fold through the combiner — driver holds
    |communities| floats."""
    from dcs_ray.functions.graph import label_propagation
    from dcs_ray.functions.relational import combiner_groupby

    labels_t = pa.concat_tables(
        pa.table(b)
        for b in label_propagation(_link_pair_edges(sf_dir), n_iter=5)
        .iter_batches(batch_format="pyarrow")
    )
    nodes = labels_t["node"].to_numpy().astype(np.int64)
    lbls = labels_t["community"].to_numpy().astype(np.int64)
    order = np.argsort(nodes)
    nodes, lbls = nodes[order], lbls[order]
    lref = ray.put((nodes, lbls))

    edges = _link_edges_ds(sf_dir)

    def to_pairs(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy().astype(np.int64)
        d = b["dst"].to_numpy().astype(np.int64)
        m = s != d
        s, d = s[m], d[m]
        return pa.table(
            {
                "a": pa.array(np.minimum(s, d), pa.int64()),
                "b": pa.array(np.maximum(s, d), pa.int64()),
            }
        )

    pairs = combiner_groupby(
        edges.map_batches(to_pairs, batch_format="pyarrow"), ["a", "b"], []
    ).map_batches(
        lambda t: t.select(["a", "b"]), batch_format="pyarrow"
    ).materialize()

    def intra(b: pa.Table) -> pa.Table:
        nd, lb = ray.get(lref)
        a = b["a"].to_numpy().astype(np.int64)
        bb = b["b"].to_numpy().astype(np.int64)
        la = lb[np.searchsorted(nd, a)]
        lbb = lb[np.searchsorted(nd, bb)]
        same = la == lbb
        ul, cnt = np.unique(la[same], return_counts=True)
        out = pa.table(
            {
                "lbl": pa.array(ul, pa.int64()),
                "mc": pa.array(cnt.astype(np.int64), pa.int64()),
                "m_edges": pa.array(
                    np.where(np.arange(len(ul)) == 0, len(a), 0), pa.int64()
                ),
            }
        )
        if len(ul) == 0:
            out = pa.table(
                {
                    "lbl": pa.array([-1], pa.int64()),
                    "mc": pa.array([0], pa.int64()),
                    "m_edges": pa.array([len(a)], pa.int64()),
                }
            )
        return out

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            pairs.map_batches(intra, batch_format="pyarrow"),
            ["lbl"], ["mc", "m_edges"],
        ).iter_batches(batch_format="pyarrow")
    )
    m = int(g["m_edges"].to_numpy().sum())
    mc_l = g["lbl"].to_numpy().astype(np.int64)
    mc_v = g["mc"].to_numpy().astype(np.int64)
    mc = {int(x): int(v) for x, v in zip(mc_l, mc_v) if x >= 0}

    def endpoints(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.array(
                    np.concatenate(
                        [
                            b["a"].to_numpy().astype(np.int64),
                            b["b"].to_numpy().astype(np.int64),
                        ]
                    ),
                    pa.int64(),
                )
            }
        )

    deg = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            pairs.map_batches(endpoints, batch_format="pyarrow"), ["node"], [],
            count_col="d",
        ).iter_batches(batch_format="pyarrow")
    )
    dn = deg["node"].to_numpy().astype(np.int64)
    dv = deg["d"].to_numpy().astype(np.int64)
    dl = lbls[np.searchsorted(nodes, dn)]
    ul = np.unique(lbls)
    dsum = np.zeros(len(ul), np.int64)
    np.add.at(dsum, np.searchsorted(ul, dl), dv)
    q = 0.0
    for i, c in enumerate(ul):
        q += mc.get(int(c), 0) / m - (dsum[i] / (2.0 * m)) ** 2
    return pa.table(
        {
            "n_communities": pa.array([len(ul)], pa.int64()),
            "n_edges": pa.array([m], pa.int64()),
            "modularity": pa.array([round(q, 6) + 0.0], pa.float64()),
        }
    )


def _q_feature_mi_quality(sf_dir: str) -> pa.Table:
    """Mutual-information feature ranking for the quality features
    (the feature-selection step before training any filter model):
    each feature splits at its MEDIAN (rank ⌈n/2⌉, whole tie groups ≤
    threshold) into a 2×2 table against the lang=='en' label, and
    MI = Σ (c/N)·ln(cN/(r·s)) — exact integer counts until the logs.
    One long-form (feature, micro-value, label) combiner fold."""
    from dcs_ray.functions.relational import combiner_groupby
    from dcs_ray.functions.textstats import quality_score_batch

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def prep(b: pa.Table) -> pa.Table:
        q = quality_score_batch(b)
        y = pc.equal(b["lang"], "en").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ntok = q["n_tokens"].to_numpy().astype(np.int64)
        stop = np.floor(
            q["stopword_ratio"].to_numpy() * 1e6 + 0.5
        ).astype(np.int64)
        mlen = np.floor(
            q["mean_token_len"].to_numpy() * 1e6 + 0.5
        ).astype(np.int64)
        n = len(b)
        return pa.table(
            {
                "feature": pa.array(
                    ["n_tokens"] * n + ["stopword_ratio"] * n
                    + ["mean_token_len"] * n,
                    pa.string(),
                ),
                "v": pa.array(np.concatenate([ntok, stop, mlen]), pa.int64()),
                "y": pa.array(np.tile(y, 3), pa.int64()),
            }
        )

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            docs.map_batches(prep, batch_format="pyarrow"),
            ["feature", "v", "y"], [], count_col="c",
        ).iter_batches(batch_format="pyarrow")
    )
    feat = g["feature"].to_numpy(zero_copy_only=False)
    v = g["v"].to_numpy().astype(np.int64)
    y = g["y"].to_numpy().astype(np.int64)
    c = g["c"].to_numpy().astype(np.int64)
    rows = []
    for fname in ("mean_token_len", "n_tokens", "stopword_ratio"):
        m = feat == fname
        fv, fy, fc = v[m], y[m], c[m]
        uv = np.unique(fv)
        per_v = np.zeros(len(uv), np.int64)
        np.add.at(per_v, np.searchsorted(uv, fv), fc)
        cum = np.cumsum(per_v)
        n = int(cum[-1])
        thr = int(uv[np.searchsorted(cum, (n + 1) // 2, side="left")])
        x = (fv > thr).astype(np.int64)
        cells = np.zeros((2, 2), np.int64)
        np.add.at(cells, (x, fy), fc)
        rsum = cells.sum(axis=1)
        csum = cells.sum(axis=0)
        mi = 0.0
        for xi in (0, 1):
            for yi in (0, 1):
                cc = int(cells[xi, yi])
                if cc > 0:
                    mi += (cc / n) * float(
                        np.log(cc * n / (int(rsum[xi]) * int(csum[yi])))
                    )
        rows.append(
            (
                fname, thr,
                int(cells[0, 0]), int(cells[0, 1]),
                int(cells[1, 0]), int(cells[1, 1]),
                round(mi, 6) + 0.0,
            )
        )
    cols = list(zip(*rows))
    return pa.table(
        {
            "feature": pa.array(cols[0], pa.string()),
            "thr_micro": pa.array(cols[1], pa.int64()),
            "n00": pa.array(cols[2], pa.int64()),
            "n01": pa.array(cols[3], pa.int64()),
            "n10": pa.array(cols[4], pa.int64()),
            "n11": pa.array(cols[5], pa.int64()),
            "mi": pa.array(cols[6], pa.float64()),
        }
    )


def _q_max_tf_audit(sf_dir: str) -> pa.Table:
    """Block-max metadata audit: the index's own per-term ``max_tf``
    (the upper bound MaxScore prunes with — a too-small value would
    silently DROP correct results) for the top-20 df terms, checked
    against the raw-text maximum tf recomputed by the oracle. Reads
    only the vocab-scale term_dict artifacts."""
    import pyarrow.parquet as pq

    from dcs_ray.search import shard_paths

    idx = _index_dir(sf_dir, "words")
    agg: dict[str, list[int]] = {}
    for p in shard_paths(idx):
        td = pq.read_table(
            os.path.join(p, "term_dict.parquet"), columns=["term", "df", "max_tf"]
        )
        for term, df, mtf in zip(
            td["term"].to_pylist(),
            td["df"].to_numpy().astype(np.int64),
            td["max_tf"].to_numpy().astype(np.int64),
        ):
            cur = agg.setdefault(term, [0, 0])
            cur[0] += int(df)
            cur[1] = max(cur[1], int(mtf))
    rows = sorted(
        ((t, v[0], v[1]) for t, v in agg.items()),
        key=lambda r: (-r[1], r[0]),
    )[:20]
    cols = list(zip(*rows))
    return pa.table(
        {
            "term": pa.array(cols[0], pa.string()),
            "df": pa.array(cols[1], pa.int64()),
            "max_tf": pa.array(cols[2], pa.int64()),
        }
    )


def _q_serp_diversity_ild(sf_dir: str) -> pa.Table:
    """Intra-list diversity of the BM25 top-10 (the SERP-quality
    measurement MMR optimizes): hash-embedding cosine for every result
    pair — 45 gated rows, each a single replayable expression over the
    float32 embedding chain. Embeddings computed ONLY for the result
    ids (broadcast filter), never the corpus."""
    from dcs_ray.functions.embed import hash_embed_batch
    from dcs_ray.search import search_bm25

    idx = _index_dir(sf_dir, "words")
    top = search_bm25(idx, [BM25_QUERY], k=10)
    ids = np.sort(top["doc_id"].to_numpy().astype(np.int64))
    ref = ray.put(ids)

    def emb(b: pa.Table) -> pa.Table:
        want = ray.get(ref)
        did = b["doc_id"].to_numpy().astype(np.int64)
        pos = np.minimum(np.searchsorted(want, did), len(want) - 1)
        keep = want[pos] == did
        return hash_embed_batch(b.filter(pa.array(keep)))

    t = pa.concat_tables(
        pa.table(b)
        for b in read_parquet_sized(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).map_batches(emb, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ).sort_by("doc_id")
    did = t["doc_id"].to_numpy().astype(np.int64)
    E = (
        t["embedding"].combine_chunks().flatten()
        .to_numpy(zero_copy_only=False).astype(np.float64)
        .reshape(len(t), -1)
    )
    nrm = np.sqrt((E * E).sum(axis=1))
    rows = []
    for i in range(len(did)):
        for j in range(i + 1, len(did)):
            dot = float((E[i] * E[j]).sum())
            c = dot / (nrm[i] * nrm[j]) if nrm[i] > 0 and nrm[j] > 0 else 0.0
            rows.append((int(did[i]), int(did[j]), round(c, 6) + 0.0))
    cols = list(zip(*rows))
    return pa.table(
        {
            "doc_a": pa.array(cols[0], pa.int64()),
            "doc_b": pa.array(cols[1], pa.int64()),
            "cos_sim": pa.array(cols[2], pa.float64()),
        }
    )


def _q_churn_auc_baseline(sf_dir: str) -> pa.Table:
    """AUC of the simplest churn model there is — 'less first-half
    activity ⇒ more likely to churn' — via the tie-corrected
    Mann–Whitney midrank sum on EXACT integer activity counts, over
    users active in the first half (churn = silent second half). The
    baseline number every real churn model must beat. Exchange =
    |users|."""
    from dcs_ray.functions.relational import combiner_groupby
    from ray.data.aggregate import Max, Min

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    ).materialize()

    def to_us(b: pa.Table) -> pa.Table:
        return pa.table({"us": b["ts"].cast(pa.int64())})

    mm = ev.map_batches(to_us, batch_format="pyarrow").aggregate(
        Min("us"), Max("us")
    )
    mid = (int(mm["min(us)"]) + int(mm["max(us)"])) // 2

    def flags(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "user_id": b["user_id"].cast(pa.int64()),
                "f": pa.array((us < mid).astype(np.int64), pa.int64()),
                "s": pa.array((us >= mid).astype(np.int64), pa.int64()),
            }
        )

    g = pa.concat_tables(
        pa.table(b)
        for b in combiner_groupby(
            ev.map_batches(flags, batch_format="pyarrow"), ["user_id"], ["f", "s"],
        ).iter_batches(batch_format="pyarrow")
    )
    f = g["f"].to_numpy().astype(np.int64)
    s = g["s"].to_numpy().astype(np.int64)
    keep = f > 0
    a = f[keep]  # score = first-half activity
    y = (s[keep] == 0).astype(np.int64)  # churned
    # tie-corrected midrank sum over (score asc): r2 = 2·min_rank + ties − 1
    uv = np.unique(a)
    tot = np.zeros(len(uv), np.int64)
    pos = np.zeros(len(uv), np.int64)
    at = np.searchsorted(uv, a)
    np.add.at(tot, at, 1)
    np.add.at(pos, at, y)
    below = np.concatenate(([0], np.cumsum(tot)[:-1]))
    r2 = 2 * (below + 1) + tot - 1
    s2 = int((pos * r2).sum())
    n1 = int(y.sum())
    n0 = int(len(y) - n1)
    auc = (
        (s2 - n1 * (n1 + 1)) / (2 * n1 * n0) if n1 > 0 and n0 > 0 else 0.0
    )
    return pa.table(
        {
            "n_users": pa.array([len(y)], pa.int64()),
            "n_churned": pa.array([n1], pa.int64()),
            "auc": pa.array([round(auc, 6) + 0.0], pa.float64()),
        }
    )

