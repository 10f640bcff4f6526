"""Debian Policy §5.6.12 version comparison — table-driven orderings
(the reference guards its comparator with a 330-line table,
``dpkgversion/dpkgversion_test.go``; these cases are written from the
published policy text)."""

import pyarrow as pa
import pytest
import ray.data

from dcs_ray.versions import dpkg_version_compare, latest_version_per_key

ORDERED = [
    # strictly ascending chains
    ["1.0~~", "1.0~", "1.0", "1.0-1", "1.0-2"],
    ["1.0~rc1", "1.0~rc2", "1.0"],
    ["1.9", "1.10", "1.11"],
    ["1.0", "1.0a", "1.0+"],          # letters sort before non-letters
    ["2.0", "1:0.1", "2:0.0"],        # epochs dominate
    ["1.2-1", "1.2-1ubuntu1", "1.2-2"],
    ["0.9", "1.0~beta", "1.0"],
    ["1.0.0", "1.0.1", "1.1.0", "2.0.0"],
]

EQUAL = [("1.0", "0:1.0"), ("1.2-1", "1.2-1"), ("007", "7")]


def test_ordering_chains():
    for chain in ORDERED:
        for i in range(len(chain)):
            for j in range(len(chain)):
                want = (i > j) - (i < j)
                got = dpkg_version_compare(chain[i], chain[j])
                assert got == want, (chain[i], chain[j], got, want)


def test_equalities():
    for a, b in EQUAL:
        assert dpkg_version_compare(a, b) == 0, (a, b)


def test_latest_version_per_key(ray_session):
    rows = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "pkg": pa.array(["a", "a", "a", "b", "b", "c"]),
            "version": pa.array(
                ["1.0", "1.0~rc1", "0.9-10", "2:0.1", "3.0", "1.0"]
            ),
        }
    )
    out = latest_version_per_key(
        ray.data.from_arrow(rows), "pkg", "version", id_col="doc_id"
    )
    got = {
        r["pkg"]: (r["doc_id"], r["version"])
        for r in out.take_all()
    }
    assert got == {"a": (1, "1.0"), "b": (4, "2:0.1"), "c": (6, "1.0")}


def test_latest_version_tie_breaks_by_id(ray_session):
    rows = pa.table(
        {
            "doc_id": pa.array([10, 11], pa.int64()),
            "pkg": pa.array(["x", "x"]),
            "version": pa.array(["1.0", "0:1.0"]),  # equal versions
        }
    )
    out = latest_version_per_key(
        ray.data.from_arrow(rows), "pkg", "version", id_col="doc_id"
    ).take_all()
    assert out[0]["doc_id"] == 11
