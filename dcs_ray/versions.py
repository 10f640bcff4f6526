"""Debian-style version comparison + version-aware newest-wins dedup.

The reference keeps results only from the newest version of each package
(J7, ``cmd/dcs-web/querymanager.go:688-747``) using a real Debian
version comparator (``dpkgversion/dpkgversion.go``). This module
reimplements the *published* Debian Policy §5.6.12 comparison algorithm
from its specification (epoch ``:`` upstream ``-`` revision; within each
part, alternating non-digit/digit runs; ``~`` sorts before everything
including the empty string; letters before non-letters) — no reference
code is consulted.

``latest_version_per_key`` is the pluggable dedup: newest version per
group with a deterministic tie-break, replacing the timestamp-max-only
rule when inputs carry version strings.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import ray.data


def _order(c: str) -> int:
    """Character weight for the non-digit comparison: ``~`` < end-of-string
    < letters < everything else (Policy: 'earliest' tilde, then letters,
    then non-letters ordered by byte value)."""
    if c == "~":
        return -1
    if c.isalpha():
        return ord(c)
    return ord(c) + 256


def _cmp_nondigit(a: str, b: str) -> int:
    i = 0
    while i < len(a) or i < len(b):
        ca = _order(a[i]) if i < len(a) else 0
        cb = _order(b[i]) if i < len(b) else 0
        if ca != cb:
            return -1 if ca < cb else 1
        i += 1
    return 0


def _cmp_part(a: str, b: str) -> int:
    """Compare one version part (upstream or revision): alternate
    non-digit runs (lexicographic with ~/letter weighting) and digit runs
    (numeric)."""
    ia = ib = 0
    while ia < len(a) or ib < len(b):
        # non-digit run
        ja, jb = ia, ib
        while ja < len(a) and not a[ja].isdigit():
            ja += 1
        while jb < len(b) and not b[jb].isdigit():
            jb += 1
        c = _cmp_nondigit(a[ia:ja], b[ib:jb])
        if c:
            return c
        ia, ib = ja, jb
        # digit run (empty == 0)
        ja, jb = ia, ib
        while ja < len(a) and a[ja].isdigit():
            ja += 1
        while jb < len(b) and b[jb].isdigit():
            jb += 1
        na = int(a[ia:ja] or "0")
        nb = int(b[ib:jb] or "0")
        if na != nb:
            return -1 if na < nb else 1
        ia, ib = ja, jb
    return 0


def _split(v: str) -> tuple[int, str, str]:
    """(epoch, upstream, revision). Epoch defaults to 0; revision to ''
    (split on the LAST hyphen; epoch on the FIRST colon)."""
    epoch = 0
    if ":" in v:
        e, v = v.split(":", 1)
        epoch = int(e) if e.isdigit() else 0
    if "-" in v:
        upstream, revision = v.rsplit("-", 1)
    else:
        upstream, revision = v, ""
    return epoch, upstream, revision


def dpkg_version_compare(a: str, b: str) -> int:
    """-1 / 0 / 1 like strcmp, per Debian Policy §5.6.12."""
    ea, ua, ra = _split(a)
    eb, ub, rb = _split(b)
    if ea != eb:
        return -1 if ea < eb else 1
    c = _cmp_part(ua, ub)
    if c:
        return c
    return _cmp_part(ra, rb)


def latest_version_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    version_col: str,
    id_col: str = "doc_id",
    compare=dpkg_version_compare,
) -> ray.data.Dataset:
    """Newest version per key (pluggable comparator; ties broken by max
    id) — ``groupby(key).map_groups``, the J7 anti-join shape. The
    comparator runs once per row inside the sort key, not per pair
    (``functools.cmp_to_key`` over the group's rows); groups are
    per-key version lists, small by construction."""

    def newest(group: pa.Table) -> pa.Table:
        versions = group[version_col].to_pylist()
        ids = [int(i) for i in group[id_col].to_pylist()]
        key = functools.cmp_to_key(
            lambda x, y: compare(x[0], y[0]) or (x[1] > y[1]) - (x[1] < y[1])
        )
        best = max(range(len(versions)), key=lambda i: key((versions[i], ids[i])))
        return group.slice(int(best), 1)

    return ds.groupby(key_col).map_groups(newest, batch_format="pyarrow")


def top_n_versions_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    version_col: str,
    id_col: str = "doc_id",
    n: int = 2,
    compare=dpkg_version_compare,
) -> ray.data.Dataset:
    """Retention policy: keep the ``n`` NEWEST versions per key (the
    'current + previous snapshot' storage rule a crawl archive runs) —
    same comparator-ordered grouped shape as
    :func:`latest_version_per_key`, emitting a 1-based ``version_rank``
    (1 = newest, ties by max id)."""

    import pyarrow as _pa

    def topn(group: pa.Table) -> pa.Table:
        versions = group[version_col].to_pylist()
        ids = [int(i) for i in group[id_col].to_pylist()]
        key = functools.cmp_to_key(
            lambda x, y: compare(x[0], y[0]) or (x[1] > y[1]) - (x[1] < y[1])
        )
        order = sorted(
            range(len(versions)),
            key=lambda i: key((versions[i], ids[i])),
            reverse=True,
        )[:n]
        out = group.take(_pa.array(order))
        return out.append_column(
            "version_rank",
            _pa.array(range(1, len(order) + 1), _pa.int64()),
        )

    return ds.groupby(key_col).map_groups(topn, batch_format="pyarrow")
