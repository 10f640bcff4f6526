"""Windowed aggregation over the events stream table.

The reference has no windowed operators (its only streaming concern is
progress events, ``SURVEY.md §2.10``), but a training-data engine needs
them; semantics here are standard tumbling windows: assign
``window_start = floor(ts / width)`` per row (vectorized), then a single
``groupby`` on the composite key — partial aggregation inside
``map_batches`` happens for free via Ray Data's groupby combiner."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum


def assign_tumbling_window(
    batch: pa.Table, width_s: int = 3600, ts_col: str = "ts"
) -> pa.Table:
    """``window_start`` is epoch microseconds (int64) — integer keys
    survive groupby/pandas round-trips without unit mangling."""
    ts = batch[ts_col].cast(pa.int64())  # microseconds
    width_us = width_s * 1_000_000
    start = pc.multiply(pc.divide(ts, width_us), width_us)  # int division (ts >= 0)
    return batch.append_column("window_start", start)


def tumbling_window_agg(
    events: ray.data.Dataset,
    width_s: int = 3600,
    key_col: str = "user_id",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Per (key, window): event count + value sum."""
    with_window = events.map_batches(
        lambda b: assign_tumbling_window(b, width_s), batch_format="pyarrow"
    )
    return with_window.groupby([key_col, "window_start"]).aggregate(
        Count(alias_name="n_events"), Sum(value_col, alias_name="sum_value")
    )


def latest_event_per_user(events: ray.data.Dataset) -> ray.data.Dataset:
    """Newest event per user (dcs newest-version-wins dedup shape, J7/D4:
    ``querymanager.go:688-747``); ties broken by max event_id."""

    def newest(group: pa.Table) -> pa.Table:
        ts = group["ts"].cast(pa.int64()).to_numpy()
        eid = group["event_id"].to_numpy()
        best = np.lexsort((-eid, -ts))[0]
        return group.slice(int(best), 1)

    return events.groupby("user_id").map_groups(newest, batch_format="pyarrow")
