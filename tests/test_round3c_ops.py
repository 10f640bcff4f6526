"""Round-3 batch-3 kernels: session-incidence marginals, windowed
funnel gap semantics, and comparator-ordered top-n version retention."""

import numpy as np
import pyarrow as pa
import ray.data

from dcs_ray.functions.windows import funnel_steps, session_type_singles
from dcs_ray.versions import top_n_versions_per_key


def _events(rows):
    """rows: (user, ts_us, type)."""
    u, t, ty = zip(*rows)
    return ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "ts": pa.array(list(t), pa.timestamp("us")),
                "event_type": pa.array(ty, pa.string()),
            }
        )
    )


MIN = 60_000_000  # one minute in µs


def test_session_singles_marginals_and_total(ray_session):
    # user 1: two sessions (gap 31 min); user 2: one session
    ev = _events(
        [
            (1, 0, "view"),
            (1, 5 * MIN, "click"),
            (1, 40 * MIN, "view"),
            (2, 0, "view"),
        ]
    )
    t = pa.concat_tables(
        pa.table(b)
        for b in session_type_singles(ev, gap_s=1800).iter_batches(
            batch_format="pyarrow"
        )
    )
    got = dict(zip(t["event_type"].to_pylist(), t["n"].to_pylist()))
    assert got["__sessions__"] == 3
    assert got["view"] == 3  # in all three sessions
    assert got["click"] == 1


def test_funnel_gap_constraint(ray_session):
    # user 1 converts within the gap; user 2's click is too late
    ev = _events(
        [
            (1, 0, "view"),
            (1, 30 * MIN, "click"),
            (2, 0, "view"),
            (2, 90 * MIN, "click"),
        ]
    )
    unbounded = pa.concat_tables(
        pa.table(b)
        for b in funnel_steps(ev, ["view", "click"]).iter_batches(
            batch_format="pyarrow"
        )
    ).sort_by("user_id")
    gapped = pa.concat_tables(
        pa.table(b)
        for b in funnel_steps(
            ev, ["view", "click"], max_gap_us=3600 * 1_000_000
        ).iter_batches(batch_format="pyarrow")
    ).sort_by("user_id")
    assert unbounded["steps_completed"].to_pylist() == [2, 2]
    assert gapped["steps_completed"].to_pylist() == [2, 1]


def test_funnel_gap_takes_earliest_eligible(ray_session):
    # step-2 candidates at +90min (too late from t=0) and +100min; the
    # user's step-1 time is 0, so NEITHER click is within 1h -> 1 step.
    # With a 2h gap the EARLIEST eligible (90min) is taken, and step 3
    # within 1h of it completes the funnel.
    ev = _events(
        [
            (7, 0, "view"),
            (7, 90 * MIN, "click"),
            (7, 100 * MIN, "click"),
            (7, 120 * MIN, "purchase"),
        ]
    )

    def run(gap):
        return pa.concat_tables(
            pa.table(b)
            for b in funnel_steps(
                ev, ["view", "click", "purchase"], max_gap_us=gap
            ).iter_batches(batch_format="pyarrow")
        )["steps_completed"].to_pylist()

    assert run(3600 * 1_000_000) == [1]
    assert run(7200 * 1_000_000) == [3]


def test_top_n_versions_ranked(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "source": pa.array(["s", "s", "s", "t"], pa.string()),
                "version": pa.array(
                    ["1.0", "1.0~rc1", "2.0", "0.5"], pa.string()
                ),
            }
        )
    )
    t = pa.concat_tables(
        pa.table(b)
        for b in top_n_versions_per_key(ds, "source", "version", n=2)
        .iter_batches(batch_format="pyarrow")
    ).sort_by([("source", "ascending"), ("version_rank", "ascending")])
    rows = list(
        zip(
            t["source"].to_pylist(),
            t["version_rank"].to_pylist(),
            t["version"].to_pylist(),
        )
    )
    # dpkg ordering: 2.0 > 1.0 > 1.0~rc1 (tilde sorts BEFORE release)
    assert rows == [("s", 1, "2.0"), ("s", 2, "1.0"), ("t", 1, "0.5")]
