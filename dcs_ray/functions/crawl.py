"""Cross-crawl snapshot diff — the CDX-style delta a recrawl pipeline
computes between two snapshots of the same url space: which urls were
ADDED, REMOVED, CHANGED, UNCHANGED.

Scale shape: content never crosses an exchange — each side hashes its
content column per batch (``textstats.content_hash_rows``, word-wise
O(bytes/8)), so the shuffle carries (url, 8-byte content hash, side
flag) rows only. Classification is the bucketed vectorized pattern:
one group per url-hash bucket (bounded group count), inside which a
single lexsort + run-length pass classifies every url at once. The
driver folds ≤ 4 × n_buckets partial count rows.

Precondition: each snapshot has at most one row per url (crawl
snapshots are latest-per-url by construction — ``dedup_latest_crawl``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dcs_ray.functions.sketches import _hash64_column
from dcs_ray.functions.textstats import content_hash_rows

STATUS_NAMES = ("added", "changed", "removed", "unchanged")
_ADDED, _CHANGED, _REMOVED, _UNCHANGED = range(4)


def crawl_delta(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    url_col: str = "url",
    content_col: str = "text",
    n_buckets: int = 64,
) -> pa.Table:
    """Per-status url counts between two snapshots → (status, n_urls),
    sorted by status name."""

    def prep(side: int):
        def f(b: pa.Table) -> pa.Table:
            ch = content_hash_rows(b[content_col]).view(np.int64)
            uh = _hash64_column(b[url_col])
            return pa.table(
                {
                    "url": b[url_col],
                    "chash": pa.array(ch, pa.int64()),
                    "side": pa.array(np.full(len(b), side, np.int8), pa.int8()),
                    "bucket": pa.array(
                        (uh % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                    ),
                }
            )

        return f

    both = old.map_batches(prep(0), batch_format="pyarrow").union(
        new.map_batches(prep(1), batch_format="pyarrow")
    )

    def classify(g: pa.Table) -> pa.Table:
        codes = (
            pc.dictionary_encode(g["url"].combine_chunks())
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        side = g["side"].combine_chunks().to_numpy(zero_copy_only=False)
        ch = g["chash"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((side, codes))
        c, s, h = codes[order], side[order], ch[order]
        runs = np.concatenate(([0], np.flatnonzero(c[1:] != c[:-1]) + 1))
        lens = np.diff(np.concatenate((runs, [len(c)])))
        if (lens > 2).any():
            raise ValueError(
                "crawl_delta precondition violated: a url appears more than "
                "twice across the two snapshots (snapshots must be "
                "latest-per-url — run dedup_latest_crawl first)"
            )
        status = np.empty(len(runs), np.int64)
        one = lens == 1
        status[one] = np.where(s[runs[one]] == 0, _REMOVED, _ADDED)
        two = lens == 2
        # side is the lexsort tiebreak within a url run, so for len-2
        # runs s[start] <= s[start+1]; same-side pairs (a duplicate url
        # within ONE snapshot) also violate the precondition
        if (s[runs[two]] == s[runs[two] + 1]).any():
            raise ValueError(
                "crawl_delta precondition violated: duplicate url within "
                "one snapshot (run dedup_latest_crawl first)"
            )
        status[two] = np.where(
            h[runs[two]] == h[runs[two] + 1], _UNCHANGED, _CHANGED
        )
        uniq, counts = np.unique(status, return_counts=True)
        return pa.table(
            {
                "status_code": pa.array(uniq, pa.int64()),
                "n_urls": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    parts = [
        pa.table(b)
        for b in both.groupby("bucket")
        .map_groups(classify, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ]
    totals = np.zeros(4, np.int64)
    for t in parts:
        # one output batch concatenates many buckets' partials → status
        # codes repeat within a batch; np.add.at accumulates duplicates
        np.add.at(totals, t["status_code"].to_numpy(), t["n_urls"].to_numpy())
    present = totals > 0
    return pa.table(
        {
            "status": pa.array(
                [STATUS_NAMES[i] for i in range(4) if present[i]], pa.string()
            ),
            "n_urls": pa.array(totals[present], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# robots.txt exclusion (REP — RFC 9309 longest-match subset)
# ---------------------------------------------------------------------------


def parse_robots(txt: str) -> list[tuple[bool, str]]:
    """Parse a robots.txt body → ``[(allow, path_prefix), ...]`` for the
    ``User-agent: *`` group (RFC 9309 grammar subset: group headers,
    Allow/Disallow path prefixes, ``#`` comments; no wildcards). An
    empty Disallow value means allow-all and adds no rule."""
    rules: list[tuple[bool, str]] = []
    in_star = False
    saw_rule = False
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            # a new group header after rules ends the previous group
            if saw_rule:
                in_star = False
                saw_rule = False
            in_star = in_star or val == "*"
        elif key in ("allow", "disallow") and in_star:
            saw_rule = True
            if val:
                rules.append((key == "allow", val))
    return rules


def robots_decisions(
    urls: "pa.Array | pa.ChunkedArray", robots_by_host: dict[str, list[tuple[bool, str]]]
) -> np.ndarray:
    """Vectorized RFC 9309 decision per url: LONGEST matching rule wins,
    allow on ties and when no rule matches (the published Google/REP
    precedence). O(total rules × batch) numpy prefix tests — the rule
    table is tiny and broadcast; urls never leave the worker."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    s = urls.to_numpy(zero_copy_only=False).astype(str)
    # split scheme://host/path
    no_scheme = np.char.partition(s, "://")[:, 2]
    parts = np.char.partition(no_scheme, "/")
    hosts = parts[:, 0]
    paths = np.char.add("/", parts[:, 2])
    best_len = np.zeros(len(s), np.int64)
    allowed = np.ones(len(s), bool)  # no match → allowed
    for host, rules in robots_by_host.items():
        hmask = hosts == host
        if not hmask.any():
            continue
        for allow, prefix in rules:
            m = hmask & np.char.startswith(paths, prefix)
            plen = len(prefix)
            win = m & (plen > best_len)
            allowed[win] = allow
            best_len[win] = plen
            # equal length: allow wins (RFC 9309 §2.2.2 least-restrictive)
            tie = m & (plen == best_len) & ~allowed
            if allow:
                allowed[tie] = True
    return allowed


def robots_filter(
    pages: ray.data.Dataset, robots_by_host_ref, url_col: str = "url"
) -> ray.data.Dataset:
    """Drop rows whose url a broadcast robots rule-set disallows — the
    ingest-side politeness gate every crawl pipeline runs. The parsed
    per-host rule table ships once via ``ray.put``; each batch does the
    vectorized longest-match locally (no shuffle)."""
    import ray as _ray

    def f(b: pa.Table) -> pa.Table:
        rules = _ray.get(robots_by_host_ref) if not isinstance(
            robots_by_host_ref, dict
        ) else robots_by_host_ref
        keep = robots_decisions(b[url_col], rules)
        return b.filter(pa.array(keep))

    return pages.map_batches(f, batch_format="pyarrow")


def change_rate_estimates(
    docs: ray.data.Dataset,
    id_col: str = "doc_id",
    n_visits: int = 8,
    seed: int = 11,
) -> ray.data.Dataset:
    """Adaptive recrawl scheduling: per-url Poisson change-rate
    estimation from repeated-visit change observations (Cho &
    Garcia-Molina, "Estimating Frequency of Change", ACM TOIT '03).

    A crawler that revisits url u every interval I and sees X of n
    visits changed cannot use X/n directly (multiple changes between
    visits collapse into one observation); the bias-corrected MLE for
    the Poisson change rate is

        lambda_hat = -ln((n - X + 0.5) / (n + 0.5))   [changes / visit
                                                       interval]

    and the recrawl PRIORITY is lambda_hat descending — hot pages get
    short revisit periods (T ∝ 1/λ), dead pages decay to the bottom of
    the frontier. The visit history here is synthesized deterministically
    (splitmix64 thresholds: visit i of url u observed changed iff
    ``splitmix64((u·16+i) ^ seed) % 100 < 5 + splitmix64(u ^ (seed+1)) % 90``)
    so an SQL oracle replays X and the closed-form estimate exactly.

    Per-batch vectorized (one hash call per (url, visit) pair, summed
    with a reshape); no shuffle — the frontier ranking downstream is an
    ordinary top-k."""
    from dcs_ray.functions.sampling import splitmix64

    def f(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        n = len(ids)
        keys = (ids[:, None] * 16 + np.arange(1, n_visits + 1)[None, :]).astype(
            np.uint64
        )
        hv = splitmix64(keys.ravel() ^ np.uint64(seed)).reshape(n, n_visits)
        p_u = 5 + (splitmix64(ids.astype(np.uint64) ^ np.uint64(seed + 1))
                   % np.uint64(90)).astype(np.int64)
        changed = (hv % np.uint64(100)).astype(np.int64) < p_u[:, None]
        x = changed.sum(axis=1)
        lam = -np.log((n_visits - x + 0.5) / (n_visits + 0.5))
        return pa.table(
            {
                id_col: b[id_col],
                "n_changes": pa.array(x, pa.int64()),
                "lambda_hat": pa.array(np.round(lam, 6) + 0.0, pa.float64()),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def template_ngrams(
    docs: ray.data.Dataset,
    n: int = 5,
    min_frac: float = 0.6,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Site-template (boilerplate) phrase detection: per source/host,
    the word n-grams present in at least ``min_frac`` of that host's
    documents — the nav-bar/footer phrases a curation pipeline strips
    before training (the template-removal step of CCNet/RefinedWeb-style
    pipelines; threshold semantics per Gibson/Punera/Tomkins '05 "the
    volume and evolution of web page templates").

    Shape: one vectorized pass builds n-gram strings per batch (numpy
    object-array window concat over the flat token stream), dedups them
    per document, and emits per-batch PARTIAL (source, gram,
    doc-count) rows; a ``groupby(source, gram)`` sums partials and a
    broadcast per-source doc total turns counts into fractions. The
    fraction gate compares integers (``10^6·count ≥ 10^6·min_frac·total``
    avoided — it uses exact ``count·DEN ≥ NUM·total`` with min_frac as
    a fraction) so the cut replays exactly in SQL. At corpus scale the
    gram string would be a 64-bit Horner hash with a representative
    join at the end; the string form keeps the oracle direct and the
    shuffle still carries only distinct (doc, gram) pairs."""
    from fractions import Fraction

    from dcs_ray.tokenize import word_tokens_flat

    frac = Fraction(min_frac).limit_denominator(10**6)
    num, den = frac.numerator, frac.denominator

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        flat, parents = word_tokens_flat(b[text_col])
        toks = np.asarray(flat.to_pylist(), dtype=object)
        if len(toks) < n:
            return pa.table(
                {
                    source_col: pa.array([], pa.string()),
                    "gram": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        gram = toks[: len(toks) - n + 1]
        for j in range(1, n):
            gram = gram + " "
            gram = gram + toks[j : len(toks) - n + 1 + j]
        same_doc = parents[: len(parents) - n + 1] == parents[n - 1 :]
        gram = gram[same_doc]
        gdoc = parents[: len(parents) - n + 1][same_doc]
        srcs = np.asarray(b[source_col].to_pylist(), dtype=object)[gdoc]
        ids = b[id_col].to_numpy()[gdoc]
        df = pd.DataFrame({"s": srcs, "g": gram, "d": ids}).drop_duplicates()
        agg = df.groupby(["s", "g"], sort=False).size().reset_index(name="cnt")
        return pa.table(
            {
                source_col: pa.array(agg["s"], pa.string()),
                "gram": pa.array(agg["g"], pa.string()),
                "cnt": pa.array(agg["cnt"].to_numpy(np.int64), pa.int64()),
            }
        )

    parts = docs.select_columns([id_col, source_col, text_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    counts = parts.groupby([source_col, "gram"]).sum("cnt")

    # per-source doc totals: tiny (one row per host) — broadcast
    totals: dict[str, int] = {}
    for b in (
        docs.select_columns([source_col])
        .map_batches(
            lambda t: pa.table(
                {
                    source_col: pc.unique(t[source_col]),
                    "n": pa.array(
                        pc.value_counts(t[source_col]).field("counts").to_numpy(
                            zero_copy_only=False
                        ),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .iter_batches(batch_format="pyarrow")
    ):
        for s, c in zip(b[source_col].to_pylist(), b["n"].to_pylist()):
            totals[s] = totals.get(s, 0) + int(c)
    import ray as _ray

    tot_ref = _ray.put(totals)

    def cut(b: pa.Table) -> pa.Table:
        tot = _ray.get(tot_ref)
        cnt = b["sum(cnt)"].to_numpy().astype(np.int64)
        srcs = b[source_col].to_pylist()
        t = np.array([tot.get(s, 0) for s in srcs], np.int64)
        keep = (cnt * den >= num * t) & (t > 0)
        frac_v = np.round(cnt[keep] / t[keep], 6) + 0.0
        return pa.table(
            {
                source_col: pa.array(np.asarray(srcs, object)[keep].tolist(), pa.string()),
                "gram": pc.array_filter(b["gram"], pa.array(keep)),
                "n_docs": pa.array(cnt[keep], pa.int64()),
                "frac": pa.array(frac_v, pa.float64()),
            }
        )

    return counts.map_batches(cut, batch_format="pyarrow")


def crawl_budget_allocation(
    docs: ray.data.Dataset,
    budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    n_visits: int = 8,
    seed: int = 11,
) -> "pa.Table":
    """Per-host crawl-budget apportionment: split a fixed recrawl
    budget across hosts proportionally to their observed CHANGE MASS
    (the Σ of per-url change counts from ``change_rate_estimates``'s
    visit history), using the largest-remainder (Hamilton) method so
    the allocation is integer-exact and SQL-replayable:

        base_h = floor(B · mass_h / total)
        leftover B − Σ base goes to the largest remainders
        (B·mass_h) mod total, ties to the lexicographically smaller
        host.

    The change-mass fold is a ``groupby(source)`` integer sum (one
    shuffle of per-batch partials); apportionment itself is
    O(#hosts) driver arithmetic. The proportional-fairness scheduling
    layer above the per-host politeness rank (``urls.fetch_schedule``)."""
    from dcs_ray.functions.sampling import splitmix64

    def f(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        n = len(ids)
        keys = (ids[:, None] * 16 + np.arange(1, n_visits + 1)[None, :]).astype(
            np.uint64
        )
        hv = splitmix64(keys.ravel() ^ np.uint64(seed)).reshape(n, n_visits)
        p_u = 5 + (splitmix64(ids.astype(np.uint64) ^ np.uint64(seed + 1))
                   % np.uint64(90)).astype(np.int64)
        x = ((hv % np.uint64(100)).astype(np.int64) < p_u[:, None]).sum(axis=1)
        return pa.table({source_col: b[source_col], "x": pa.array(x, pa.int64())})

    per = docs.select_columns([id_col, source_col]).map_batches(
        f, batch_format="pyarrow"
    ).groupby(source_col).sum("x")
    t = pa.concat_tables(
        [pa.table(b) for b in per.iter_batches(batch_format="pyarrow")]
    ).sort_by(source_col)
    hosts = t[source_col].to_pylist()
    mass = t["sum(x)"].to_numpy().astype(np.int64)
    total = int(mass.sum())
    if total == 0:
        alloc = np.zeros(len(hosts), np.int64)
    else:
        prod = budget * mass
        base = prod // total
        rem = prod % total
        left = budget - int(base.sum())
        # largest remainder, ties to smaller host name (sorted order)
        order = np.lexsort((np.arange(len(hosts)), -rem))
        alloc = base.copy()
        alloc[order[:left]] += 1
    return pa.table(
        {
            source_col: t[source_col],
            "change_mass": pa.array(mass, pa.int64()),
            "alloc": pa.array(alloc, pa.int64()),
        }
    )
