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


def hopping_window_agg(
    events: ray.data.Dataset,
    width_s: int = 3600,
    hop_s: int = 1800,
    key_col: str = "user_id",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Hopping (sliding) windows: each event lands in ``width/hop``
    overlapping windows. The expansion is a vectorized ``np.repeat``
    inside ``map_batches`` (never a per-row flat_map), then one groupby."""
    width_us = width_s * 1_000_000
    hop_us = hop_s * 1_000_000
    # max windows containing an event: ceil(width / hop) — with width not a
    # multiple of hop the oldest window starts above ts - width, so the
    # per-event expansion over-generates by at most one and the explicit
    # s > ts - width mask below trims it
    per_event = -(-width_us // hop_us)

    def expand(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()
        n = len(ts)
        # window starts s: s ≡ 0 (mod hop), ts - width < s <= ts, s >= 0
        last = np.floor_divide(ts, hop_us) * hop_us  # handles ts < 0 too
        reps = np.full(n, per_event, dtype=np.int64)
        idx = np.repeat(np.arange(n), reps)
        cum = np.cumsum(reps)
        total = int(cum[-1]) if n else 0
        offsets = np.arange(total) - np.repeat(cum - reps, reps)
        starts = np.repeat(last, reps) - offsets * hop_us
        keep = (starts > np.repeat(ts, reps) - width_us) & (starts >= 0)
        idx, starts = idx[keep], starts[keep]
        out = batch.select([key_col, value_col]).take(pa.array(idx))
        return out.append_column("window_start", pa.array(starts, pa.int64()))

    expanded = events.map_batches(expand, batch_format="pyarrow")
    return expanded.groupby([key_col, "window_start"]).aggregate(
        Count(alias_name="n_events"), Sum(value_col, alias_name="sum_value")
    )


def session_window_agg(
    events: ray.data.Dataset,
    gap_s: int = 1800,
    key_col: str = "user_id",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Session windows: per key, events sorted by time split into
    sessions wherever the gap to the previous event exceeds ``gap_s``.
    ``groupby(key).map_groups`` — one group per key, vectorized numpy
    session assignment inside (the partitioning assumption: one key's
    events fit in a worker, the standard sessionization contract)."""
    gap_us = gap_s * 1_000_000

    def sessions(group: pa.Table) -> pa.Table:
        ts = group["ts"].cast(pa.int64()).to_numpy()
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        vals = group[value_col].to_numpy(zero_copy_only=False)[order]
        new_sess = np.ones(len(ts), dtype=bool)
        new_sess[1:] = (ts[1:] - ts[:-1]) > gap_us
        sess_id = np.cumsum(new_sess) - 1
        starts = np.flatnonzero(new_sess)
        ends = np.concatenate((starts[1:], [len(ts)]))
        key_val = group[key_col][0].as_py()
        return pa.table(
            {
                key_col: pa.array([key_val] * len(starts), group[key_col].type),
                "session_start": pa.array(ts[starts], pa.int64()),
                "session_end": pa.array(ts[ends - 1], pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64()),
                "sum_value": pa.array(
                    np.add.reduceat(vals, starts) if len(ts) else [], pa.float64()
                ),
            }
        )

    return events.groupby(key_col).map_groups(sessions, batch_format="pyarrow")


def latest_event_per_user(events: ray.data.Dataset) -> ray.data.Dataset:
    """Newest event per user (dcs newest-version-wins dedup shape, J7/D4:
    ``querymanager.go:688-747``); ties broken by max event_id."""

    def newest(group: pa.Table) -> pa.Table:
        ts = group["ts"].cast(pa.int64()).to_numpy()
        eid = group["event_id"].to_numpy()
        best = np.lexsort((-eid, -ts))[0]
        return group.slice(int(best), 1)

    return events.groupby("user_id").map_groups(newest, batch_format="pyarrow")


def running_agg(
    events: ray.data.Dataset,
    key: str,
    order_col: str,
    value_col: str,
    tie_col: str,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-key window functions in one pass: ``row_number`` (1-based),
    ``running_sum`` of ``value_col``, ``lag_value`` (previous row's
    value, null for the first), ``percent_rank``
    ((rn-1)/(count-1), 0 for singleton keys) and ``ntile4`` (quartile
    bucket, SQL NTILE semantics) — ordered by ``(order_col, tie_col)``
    within each key.

    Shape: one hash exchange on a salted key bucket (keys never
    straddle buckets), then ONE lexsort per bucket computes every key's
    window functions simultaneously — run starts via key-change flags,
    per-key cumulative sums as global-cumsum minus the run-start prefix
    (the standard segmented-scan trick). No per-key loop.
    Partitioning assumption: a bucket fits one worker; raise
    ``num_buckets`` for skewed key spaces."""
    from dcs_ray.functions.joins import _key_bucket

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column(
            "bucket",
            pa.array(_key_bucket(b[key].to_numpy(), num_buckets), pa.int32()),
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        k = g[key].to_numpy().astype(np.int64)
        o = g[order_col].to_numpy().astype(np.int64)
        t = g[tie_col].to_numpy().astype(np.int64)
        v = g[value_col].to_numpy().astype(np.float64)
        order = np.lexsort((t, o, k))
        ks, vs = k[order], v[order]
        n = len(ks)
        new_run = np.ones(n, bool)
        new_run[1:] = ks[1:] != ks[:-1]
        run_id = np.cumsum(new_run) - 1
        run_start = np.flatnonzero(new_run)
        # row_number: global index minus own run's start
        idx = np.arange(n)
        rn = idx - run_start[run_id] + 1
        # segmented cumsum: global cumsum minus prefix before run start
        cs = np.cumsum(vs)
        prefix = np.concatenate(([0.0], cs))[run_start]
        running = cs - prefix[run_id]
        lag = np.empty(n, np.float64)
        lag[1:] = vs[:-1]
        lag_valid = ~new_run
        # per-key row counts via run-length (next start - own start)
        run_end = np.concatenate((run_start[1:], [n]))
        cnt = (run_end - run_start)[run_id]
        with np.errstate(divide="ignore", invalid="ignore"):
            pr = np.where(cnt > 1, (rn - 1) / np.maximum(cnt - 1, 1), 0.0)
        # SQL NTILE(4): first (cnt % 4) buckets get ceil(cnt/4) rows
        q, r = cnt // 4, cnt % 4
        big = (q + 1) * r  # rows covered by the larger buckets
        idx0 = rn - 1
        in_big = idx0 < big
        with np.errstate(divide="ignore", invalid="ignore"):
            nt = np.where(
                in_big,
                idx0 // np.maximum(q + 1, 1),
                r + np.where(q > 0, (idx0 - big) // np.maximum(q, 1), 0),
            ) + 1
        out = {
            key: g[key].take(pa.array(order)),
            order_col: g[order_col].take(pa.array(order)),
            tie_col: g[tie_col].take(pa.array(order)),
            value_col: g[value_col].take(pa.array(order)),
            "row_number": pa.array(rn, pa.int64()),
            "percent_rank": pa.array(np.round(pr, 6), pa.float64()),
            "ntile4": pa.array(nt.astype(np.int64), pa.int64()),
            "running_sum": pa.array(np.round(running, 6), pa.float64()),
            "lag_value": pa.array(
                np.where(lag_valid, lag, np.nan), pa.float64(), from_pandas=True
            ),
        }
        tbl = pa.table(out)
        mask = pa.array(lag_valid)
        return tbl.set_column(
            tbl.schema.get_field_index("lag_value"), "lag_value",
            pa.compute.if_else(mask, tbl["lag_value"], pa.nulls(n, pa.float64())),
        )

    return (
        events.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def funnel_steps(
    events: ray.data.Dataset,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    n_buckets: int = 64,
    max_gap_us: int | None = None,
) -> ray.data.Dataset:
    """Ordered-funnel analysis: how far each user progressed through
    the ``steps`` event sequence (step i+1 counts only with a STRICTLY
    later timestamp than the user's step-i time, each step taken at
    its earliest eligible occurrence) → Dataset[(user, steps_completed)]
    over the full user universe — the classic conversion-funnel query.
    ``max_gap_us`` adds the WINDOWED-funnel constraint: step i+1 must
    also land within the gap after the user's step-i time (the
    'convert within the hour' product question).

    Scale shape: one groupby on a hash bucket of the user (bounded
    group count; a user's events co-locate); inside a bucket every
    step is resolved for ALL users at once with one lexsort per step
    and a ``minimum.reduceat`` first-eligible-row scan — no per-user
    Python. The exchange carries (user, ts, type) triples only."""
    _MIX = np.uint64(0xBF58476D1CE4E5B9)

    def with_bucket(b: pa.Table) -> pa.Table:
        u = b[user_col].to_numpy().astype(np.int64)
        with np.errstate(over="ignore"):
            x = u.astype(np.uint64) * _MIX
            x ^= x >> np.uint64(31)
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "t": b[ts_col].cast(pa.int64()),
                "ty": b[type_col],
                "_bucket": pa.array((x % np.uint64(n_buckets)).astype(np.int32)),
            }
        )

    def funnel_in_bucket(g: pa.Table) -> pa.Table:
        u = g["u"].combine_chunks().to_numpy(zero_copy_only=False)
        t = g["t"].combine_chunks().to_numpy(zero_copy_only=False)
        ty = g["ty"].combine_chunks()
        users = np.unique(u)
        t_prev = np.full(len(users), np.iinfo(np.int64).min, np.int64)
        alive = np.ones(len(users), bool)
        completed = np.zeros(len(users), np.int64)
        for si, step in enumerate(steps):
            sel = pc.equal(ty, step).to_numpy(zero_copy_only=False)
            su, st = u[sel], t[sel]
            if len(su) == 0:
                break
            order = np.lexsort((st, su))
            su, st = su[order], st[order]
            runs = np.concatenate(([0], np.flatnonzero(su[1:] != su[:-1]) + 1))
            run_users = np.searchsorted(users, su[runs])
            uidx = np.repeat(
                run_users, np.diff(np.concatenate((runs, [len(su)])))
            )
            eligible = alive[uidx] & (st > t_prev[uidx])
            if max_gap_us is not None and si > 0:
                eligible &= st <= t_prev[uidx] + max_gap_us
            pos = np.where(eligible, np.arange(len(su)), len(su))
            first = np.minimum.reduceat(pos, runs)
            hit = first < np.concatenate((runs[1:], [len(su)]))
            hit_users = run_users[hit]
            new_alive = np.zeros(len(users), bool)
            new_alive[hit_users] = True
            t_prev[hit_users] = st[first[hit]]
            completed[hit_users] += 1
            alive = new_alive
            if not alive.any():
                break
        return pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "steps_completed": pa.array(completed, pa.int64()),
            }
        )

    return (
        events.map_batches(with_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(funnel_in_bucket, batch_format="pyarrow")
    )


def retention_cohorts(
    events: ray.data.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    week_us: int = 7 * 86400 * 1_000_000,
) -> ray.data.Dataset:
    """Cohort retention matrix: users bucketed by their FIRST-seen week
    (the cohort), counted once per later week they return →
    Dataset[(cohort_week, week_offset, n_users)] — the standard
    engagement-retention analysis.

    Scale shape: the per-user cohort (min week) folds from per-batch
    partials on the driver (user-sized — the vertex-state-fits regime)
    and broadcasts once; distinct (user, week) activity dedups through
    ONE combiner groupby, after which each row is a unique active
    (user, week) so the final (cohort, offset) count is exact without a
    distinct aggregate."""
    from dcs_ray.functions.relational import combiner_groupby

    def week_partial(b: pa.Table) -> pa.Table:
        u = b[user_col].to_numpy().astype(np.int64)
        w = b[ts_col].cast(pa.int64()).to_numpy() // week_us
        uu, inv = np.unique(u, return_inverse=True)
        mn = np.full(len(uu), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, inv, w)
        return pa.table(
            {"user": pa.array(uu, pa.int64()), "w": pa.array(mn, pa.int64())}
        )

    us, ws = [], []
    for b in events.map_batches(week_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        us.append(b["user"].to_numpy(zero_copy_only=False))
        ws.append(b["w"].to_numpy(zero_copy_only=False))
    if not us:
        return ray.data.from_arrow(
            pa.table(
                {
                    "cohort_week": pa.array([], pa.int64()),
                    "week_offset": pa.array([], pa.int64()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        )
    allu = np.concatenate(us)
    users, inv = np.unique(allu, return_inverse=True)
    cohort = np.full(len(users), np.iinfo(np.int64).max, np.int64)
    np.minimum.at(cohort, inv, np.concatenate(ws))
    ref = ray.put((users, cohort))

    def user_week(b: pa.Table) -> pa.Table:
        u = b[user_col].to_numpy().astype(np.int64)
        w = b[ts_col].cast(pa.int64()).to_numpy() // week_us
        return pa.table(
            {"user": pa.array(u, pa.int64()), "w": pa.array(w, pa.int64())}
        )

    active = combiner_groupby(
        events.map_batches(user_week, batch_format="pyarrow"),
        ["user", "w"],
        [],
        count_col="_n",
    )

    def to_cohort(b: pa.Table, _r=ref) -> pa.Table:
        uu, coh = ray.get(_r)
        u = b["user"].to_numpy(zero_copy_only=False)
        w = b["w"].to_numpy(zero_copy_only=False)
        c = coh[np.searchsorted(uu, u)]
        return pa.table(
            {
                "cohort_week": pa.array(c, pa.int64()),
                "week_offset": pa.array(w - c, pa.int64()),
            }
        )

    out = combiner_groupby(
        active.map_batches(to_cohort, batch_format="pyarrow"),
        ["cohort_week", "week_offset"],
        [],
        count_col="n_users",
    )
    return out.map_batches(
        lambda b: b.select(["cohort_week", "week_offset", "n_users"]),
        batch_format="pyarrow",
    )


def event_transitions(
    events: ray.data.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """First-order behavior model: counts of consecutive event-type
    transitions within each user's timeline → Dataset[(prev_type,
    next_type, n)] — the Markov transition matrix behind "users who X
    then Y" analytics. Consecutive = adjacent in the user's
    (ts, event_id-free) order; ties on ts order by event type so the
    result is deterministic under any parallelism.

    Scale shape: one groupby on a hash bucket of the user; inside a
    bucket a single lexsort + shifted-pair comparison emits per-bucket
    partial (prev, next) counts, folded by a combiner groupby — the
    exchange is |type-pairs| per bucket, never the event stream."""
    from dcs_ray.functions.relational import combiner_groupby

    _MIX = np.uint64(0xBF58476D1CE4E5B9)

    def with_bucket(b: pa.Table) -> pa.Table:
        u = b[user_col].to_numpy().astype(np.int64)
        with np.errstate(over="ignore"):
            x = u.astype(np.uint64) * _MIX
            x ^= x >> np.uint64(31)
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "t": b[ts_col].cast(pa.int64()),
                "ty": b[type_col],
                "_bucket": pa.array((x % np.uint64(n_buckets)).astype(np.int32)),
            }
        )

    def pairs_in_bucket(g: pa.Table) -> pa.Table:
        u = g["u"].combine_chunks().to_numpy(zero_copy_only=False)
        t = g["t"].combine_chunks().to_numpy(zero_copy_only=False)
        ty = g["ty"].combine_chunks()
        codes = pc.dictionary_encode(ty)
        ci = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        rank = pc.sort_indices(codes.dictionary).to_numpy(zero_copy_only=False)
        crank = np.empty(len(rank), np.int64)
        crank[rank] = np.arange(len(rank))
        order = np.lexsort((crank[ci], t, u))
        u, ci = u[order], ci[order]
        same = u[1:] == u[:-1]
        prev_c, next_c = ci[:-1][same], ci[1:][same]
        key = prev_c * len(rank) + next_c if len(rank) else prev_c
        uk, cnt = np.unique(key, return_counts=True)
        dic = codes.dictionary
        return pa.table(
            {
                "prev_type": dic.take(pa.array(uk // max(len(rank), 1))),
                "next_type": dic.take(pa.array(uk % max(len(rank), 1))),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    agg = combiner_groupby(
        events.map_batches(with_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(pairs_in_bucket, batch_format="pyarrow"),
        ["prev_type", "next_type"],
        ["n"],
    )
    return agg.map_batches(
        lambda b: b.select(["prev_type", "next_type", "n"]), batch_format="pyarrow"
    )


def event_ngrams(
    events: ray.data.Dataset,
    n: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Behavioral n-gram counts: ``n`` CONSECUTIVE event types within
    each user's (ts, event_id) timeline → Dataset[(e1..en, cnt)] — the
    sequential-pattern signal behind funnel mining and next-action
    models (the order-n generalization of :func:`event_transitions`).

    Scale shape: one groupby on a hash bucket of the user (a user's
    events land in one bucket); inside a bucket a single lexsort +
    shifted same-user masks emit per-bucket partial n-gram counts on
    dictionary codes, folded by a combiner groupby — the exchange is
    |type n-grams| per bucket, never the event stream."""
    from dcs_ray.functions.relational import combiner_groupby

    _MIX = np.uint64(0xBF58476D1CE4E5B9)
    gram_cols = [f"e{j + 1}" for j in range(n)]

    def with_bucket(b: pa.Table) -> pa.Table:
        u = b[user_col].to_numpy().astype(np.int64)
        with np.errstate(over="ignore"):
            x = u.astype(np.uint64) * _MIX
            x ^= x >> np.uint64(31)
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "t": b[ts_col].cast(pa.int64()),
                "eid": b[id_col].cast(pa.int64()),
                "ty": b[type_col],
                "_bucket": pa.array((x % np.uint64(n_buckets)).astype(np.int32)),
            }
        )

    def grams_in_bucket(g: pa.Table) -> pa.Table:
        u = g["u"].combine_chunks().to_numpy(zero_copy_only=False)
        t = g["t"].combine_chunks().to_numpy(zero_copy_only=False)
        eid = g["eid"].combine_chunks().to_numpy(zero_copy_only=False)
        codes = pc.dictionary_encode(g["ty"].combine_chunks())
        ci = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dic = codes.dictionary
        empty = pa.table(
            {
                **{c: pa.array([], pa.string()) for c in gram_cols},
                "cnt": pa.array([], pa.int64()),
            }
        )
        m = len(u)
        if m < n:
            return empty
        order = np.lexsort((eid, t, u))
        u, ci = u[order], ci[order]
        w = m - n + 1
        same = np.ones(w, bool)
        for j in range(1, n):
            same &= u[j : w + j] == u[:w]
        if not same.any():
            return empty
        v = max(len(dic), 1)
        key = np.zeros(w, np.int64)
        for j in range(n):
            key = key * v + ci[j : w + j]
        uk, cnt = np.unique(key[same], return_counts=True)
        cols = {}
        for j in range(n - 1, -1, -1):
            cols[gram_cols[j]] = dic.take(pa.array(uk % v))
            uk = uk // v
        return pa.table(
            {
                **{c: cols[c] for c in gram_cols},
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    agg = combiner_groupby(
        events.map_batches(with_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(grams_in_bucket, batch_format="pyarrow"),
        gram_cols,
        ["cnt"],
    )
    return agg.map_batches(
        lambda b: b.select(gram_cols + ["cnt"]), batch_format="pyarrow"
    )


def session_type_singles(
    events: ray.data.Dataset,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-type session incidence (the marginals the association-rule
    metrics need next to :func:`session_type_pairs`'s joint counts):
    Dataset[(event_type, n)] = number of sessions containing the type,
    plus ONE reserved row ``("__sessions__", total session count)`` —
    same gap splitting, same bucketed lexsort kernel, exchange =
    |types| + 1 per bucket."""
    from dcs_ray.functions.relational import combiner_groupby

    _MIX = np.uint64(0xBF58476D1CE4E5B9)
    gap_us = gap_s * 1_000_000

    def with_bucket(b: pa.Table) -> pa.Table:
        u = b[user_col].to_numpy().astype(np.int64)
        with np.errstate(over="ignore"):
            x = u.astype(np.uint64) * _MIX
            x ^= x >> np.uint64(31)
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "t": b[ts_col].cast(pa.int64()),
                "ty": b[type_col],
                "_bucket": pa.array((x % np.uint64(n_buckets)).astype(np.int32)),
            }
        )

    def singles_in_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"event_type": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
        m = len(g)
        if m == 0:
            return empty
        u = g["u"].combine_chunks().to_numpy(zero_copy_only=False)
        t = g["t"].combine_chunks().to_numpy(zero_copy_only=False)
        codes = pc.dictionary_encode(g["ty"].combine_chunks())
        ci = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = max(len(codes.dictionary), 1)
        order = np.lexsort((t, u))
        u, t, ci = u[order], t[order], ci[order]
        new_sess = np.ones(m, bool)
        new_sess[1:] = (u[1:] != u[:-1]) | ((t[1:] - t[:-1]) > gap_us)
        sid = np.cumsum(new_sess) - 1
        inc = np.unique(sid * v + ci)
        cnt = np.bincount((inc % v).astype(np.int64), minlength=v).astype(np.int64)
        types = codes.dictionary.to_pylist()
        n_sessions = int(new_sess.sum())
        return pa.table(
            {
                "event_type": pa.array(types + ["__sessions__"], pa.string()),
                "n": pa.array(np.concatenate([cnt, [n_sessions]]), pa.int64()),
            }
        )

    agg = combiner_groupby(
        events.map_batches(with_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(singles_in_bucket, batch_format="pyarrow"),
        ["event_type"],
        ["n"],
    )
    return agg.map_batches(
        lambda b: b.select(["event_type", "n"]), batch_format="pyarrow"
    )


def session_type_pairs(
    events: ray.data.Dataset,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Market-basket co-occurrence over sessions: for every unordered
    pair of DISTINCT event types, the number of sessions (same
    ``gap_s`` splitting as :func:`session_window_agg`) containing both
    → Dataset[(type_a, type_b, n)] with ``type_a < type_b``.

    Scale shape: one groupby on a hash bucket of the user; inside a
    bucket a single lexsort assigns session ids, ``np.unique``
    collapses to (session, type) incidence, and pair generation is the
    vectorized segment-combination expansion (each element pairs with
    its ≤|types| predecessors in the session — bounded by the type
    alphabet, never the event count). The exchange is |type pairs| per
    bucket."""
    from dcs_ray.functions.relational import combiner_groupby

    _MIX = np.uint64(0xBF58476D1CE4E5B9)
    gap_us = gap_s * 1_000_000

    def with_bucket(b: pa.Table) -> pa.Table:
        u = b[user_col].to_numpy().astype(np.int64)
        with np.errstate(over="ignore"):
            x = u.astype(np.uint64) * _MIX
            x ^= x >> np.uint64(31)
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "t": b[ts_col].cast(pa.int64()),
                "ty": b[type_col],
                "_bucket": pa.array((x % np.uint64(n_buckets)).astype(np.int32)),
            }
        )

    def pairs_in_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "type_a": pa.array([], pa.string()),
                "type_b": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        m = len(g)
        if m == 0:
            return empty
        u = g["u"].combine_chunks().to_numpy(zero_copy_only=False)
        t = g["t"].combine_chunks().to_numpy(zero_copy_only=False)
        codes = pc.dictionary_encode(g["ty"].combine_chunks())
        ci = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # map dictionary codes to alphabetical rank so type_a < type_b
        rank = pc.sort_indices(codes.dictionary).to_numpy(zero_copy_only=False)
        crank = np.empty(len(rank), np.int64)
        crank[rank] = np.arange(len(rank))
        sorted_dic = codes.dictionary.take(pa.array(rank))
        v = max(len(rank), 1)
        order = np.lexsort((t, u))
        u, t, ci = u[order], t[order], crank[ci[order]]
        new_sess = np.ones(m, bool)
        new_sess[1:] = (u[1:] != u[:-1]) | ((t[1:] - t[:-1]) > gap_us)
        sid = np.cumsum(new_sess) - 1
        # distinct (session, type), sorted by (session, type-rank)
        inc = np.unique(sid * v + ci)
        s_of, c_of = inc // v, inc % v
        new_run = np.ones(len(inc), bool)
        new_run[1:] = s_of[1:] != s_of[:-1]
        starts = np.flatnonzero(new_run)
        within = np.arange(len(inc)) - np.repeat(
            starts, np.diff(np.append(starts, len(inc)))
        )
        # element at local index j is 'b' in j pairs (its predecessors)
        b_idx = np.repeat(np.arange(len(inc)), within)
        seg_starts = np.cumsum(within) - within
        a_off = np.arange(int(within.sum())) - np.repeat(seg_starts, within)
        a_idx = b_idx - np.repeat(within, within) + a_off
        if len(b_idx) == 0:
            return empty
        key = c_of[a_idx] * v + c_of[b_idx]
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "type_a": sorted_dic.take(pa.array(uk // v)),
                "type_b": sorted_dic.take(pa.array(uk % v)),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    agg = combiner_groupby(
        events.map_batches(with_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(pairs_in_bucket, batch_format="pyarrow"),
        ["type_a", "type_b"],
        ["n"],
    )
    return agg.map_batches(
        lambda b: b.select(["type_a", "type_b", "n"]), batch_format="pyarrow"
    )
