"""Position-based click model (PBM) estimated by EM over a click log.

The measurement layer a web search engine runs continuously: given
impression logs (session, position, doc, click), separate *where* a
result was shown from *how attractive* it is. PBM (Craswell '08; EM
formulation as in Chuklin/Markov/de Rijke, "Click Models for Web
Search", 2015 — public) posits

    P(click | shown at p) = alpha_p · a_d

with examination probability ``alpha_p`` per position and
attractiveness ``a_d`` per document. The EM posteriors for an
unclicked impression are

    E[exam]    = alpha_p (1 - a_d) / (1 - alpha_p a_d)
    E[attract] = a_d (1 - alpha_p) / (1 - alpha_p a_d)

and a clicked impression pins both to 1; the M-step averages the
posteriors per position / per doc.

Distribution shape: the click log streams once through a vectorized
per-block fold into per-(variant, position) sufficient statistics
(impressions n, clicks k) — at most ``2 × n_positions`` groups, the
classic sketch pre-merge — and the EM iterations then run on that tiny
aggregate on the driver. Interleaving TWO rankings (even sessions see
the base ranking, odd sessions the reverse) gives the model the
position/doc decoupling it needs: every doc is observed at two
positions, every position shows two docs.

Determinism: the synthetic log is pure splitmix64 integer arithmetic
(click ⇔ hash thresholds), and every EM group sums exactly TWO floats —
float addition is commutative (bitwise), so the SQL oracle replaying
the same chain (unrolled MATERIALIZED iteration CTEs) reproduces the
values bit-for-bit before the 6-dp rounding.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from dcs_ray.functions.sampling import splitmix64


def synth_click_log(
    ranked_ids: np.ndarray | list[int],
    n_sessions: int = 200,
    seed: int = 7,
) -> ray.data.Dataset:
    """Deterministic synthetic impression log over a fixed top-k ranking.

    Session ``s`` shows the base ranking (variant 0) when even, the
    reversed ranking (variant 1) when odd. With impression key
    ``key = s·16 + pos``:

    - examined  ⇔ ``splitmix64(key ^ (seed+1)) % 12 <  11 - pos``
      (true exam prob decays (11-p)/12 … 1/12)
    - attracted ⇔ ``splitmix64(key ^ (seed+2)) % 16 <  3 + splitmix64(doc ^ (seed+3)) % 10``
      (true per-doc attractiveness in [3/16, 12/16])
    - click = examined AND attracted

    Returns a Dataset of (session, variant, pos, doc_id, click)."""
    ranked = np.asarray(list(ranked_ids), np.int64)
    k = len(ranked)

    def expand(b: pa.Table) -> pa.Table:
        s = b["id"].to_numpy().astype(np.int64)
        ns = len(s)
        sess = np.repeat(s, k)
        pos = np.tile(np.arange(1, k + 1, dtype=np.int64), ns)
        variant = sess % 2
        # variant 0: doc at pos p is ranked[p-1]; variant 1: reversed
        di = np.where(variant == 0, pos - 1, k - pos)
        doc = ranked[di]
        key = (sess * 16 + pos).astype(np.uint64)
        he = splitmix64(key ^ np.uint64(seed + 1))
        ha = splitmix64(key ^ np.uint64(seed + 2))
        td = 3 + (splitmix64(doc.astype(np.uint64) ^ np.uint64(seed + 3))
                  % np.uint64(10)).astype(np.int64)
        examined = (he % np.uint64(12)).astype(np.int64) < (11 - pos)
        attracted = (ha % np.uint64(16)).astype(np.int64) < td
        click = examined & attracted
        return pa.table(
            {
                "session": pa.array(sess, pa.int64()),
                "variant": pa.array(variant, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "doc_id": pa.array(doc, pa.int64()),
                "click": pa.array(click.astype(np.int64), pa.int64()),
            }
        )

    return ray.data.range(n_sessions).map_batches(expand, batch_format="pyarrow")


def pbm_em(
    log: ray.data.Dataset,
    n_positions: int,
    iters: int = 5,
) -> pa.Table:
    """Fit PBM by EM → table of ('exam', pos, value) and
    ('attr', doc_id, value) rows, values rounded to 6 dp.

    One streaming pass folds the log into (variant, pos, doc_id) →
    (n, k) sufficient statistics (≤ 2·n_positions groups; per-block
    vectorized bincount partials, integer-exact driver fold), then
    ``iters`` EM rounds run on the aggregate. Initial parameters 0.5."""
    P = n_positions

    def partial(b: pa.Table) -> pa.Table:
        v = b["variant"].to_numpy()
        p = b["pos"].to_numpy()
        d = b["doc_id"].to_numpy()
        c = b["click"].to_numpy()
        slot = v * P + (p - 1)
        n = np.bincount(slot, minlength=2 * P)
        kk = np.bincount(slot, weights=c.astype(np.float64), minlength=2 * P)
        docs = np.full(2 * P, -1, np.int64)
        docs[slot] = d
        return pa.table(
            {
                "n": pa.array([n.astype(np.int64).tolist()], pa.list_(pa.int64())),
                "k": pa.array([kk.astype(np.int64).tolist()], pa.list_(pa.int64())),
                "docs": pa.array([docs.tolist()], pa.list_(pa.int64())),
            }
        )

    n = np.zeros(2 * P, np.int64)
    k = np.zeros(2 * P, np.int64)
    docs = np.full(2 * P, -1, np.int64)
    for b in log.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for row_n, row_k, row_d in zip(
            b["n"].to_pylist(), b["k"].to_pylist(), b["docs"].to_pylist()
        ):
            n += np.asarray(row_n, np.int64)
            k += np.asarray(row_k, np.int64)
            rd = np.asarray(row_d, np.int64)
            docs = np.where(rd >= 0, rd, docs)

    pos_of_slot = np.tile(np.arange(P), 2)  # 0-based position per slot
    uniq_docs = np.unique(docs[docs >= 0])
    doc_idx = np.searchsorted(uniq_docs, docs)

    alpha = np.full(P, 0.5, np.float64)
    attr = np.full(len(uniq_docs), 0.5, np.float64)
    nf = n.astype(np.float64)
    kf = k.astype(np.float64)
    for _ in range(iters):
        al = alpha[pos_of_slot]
        at = attr[doc_idx]
        denom = 1.0 - al * at
        sum_e = kf + (nf - kf) * (al * (1.0 - at) / denom)
        sum_a = kf + (nf - kf) * (at * (1.0 - al) / denom)
        # every position and every doc owns exactly two slots — the
        # 2-term sums below are order-independent (float + commutes)
        alpha = np.bincount(pos_of_slot, weights=sum_e, minlength=P) / np.bincount(
            pos_of_slot, weights=nf, minlength=P
        )
        attr = np.bincount(doc_idx, weights=sum_a, minlength=len(uniq_docs)) / (
            np.bincount(doc_idx, weights=nf, minlength=len(uniq_docs))
        )

    kinds = ["attr"] * len(uniq_docs) + ["exam"] * P
    keys = np.concatenate((uniq_docs, np.arange(1, P + 1, dtype=np.int64)))
    vals = np.concatenate((np.round(attr, 6) + 0.0, np.round(alpha, 6) + 0.0))
    return pa.table(
        {
            "kind": pa.array(kinds, pa.string()),
            "key": pa.array(keys, pa.int64()),
            "value": pa.array(vals, pa.float64()),
        }
    )


def synth_cascade_log(
    ranked_ids: np.ndarray | list[int],
    n_sessions: int = 400,
    seed: int = 9,
) -> ray.data.Dataset:
    """Deterministic cascade-consistent click log (Craswell '08): each
    session scans positions top-down, clicks position p with the doc's
    attractiveness probability, and STOPS at the first click — below
    it nothing is examined. Attraction at (s, p) uses the same
    splitmix64 threshold family as ``synth_click_log``:

        attracted ⇔ splitmix64((s·16+p) ^ (seed+1)) % 16
                     <  3 + splitmix64(doc ^ (seed+2)) % 10

    Emits (session, pos, doc_id, examined, click): examined = 1 for
    every position at or above the first click (all of them in
    click-less sessions), click = 1 only at the first attracted
    position."""
    from dcs_ray.functions.sampling import splitmix64

    ranked = np.asarray(list(ranked_ids), np.int64)
    k = len(ranked)

    def expand(b: pa.Table) -> pa.Table:
        s = b["id"].to_numpy().astype(np.int64)
        ns = len(s)
        sess = np.repeat(s, k)
        pos = np.tile(np.arange(1, k + 1, dtype=np.int64), ns)
        doc = ranked[pos - 1]
        key = (sess * 16 + pos).astype(np.uint64)
        ha = splitmix64(key ^ np.uint64(seed + 1))
        td = 3 + (splitmix64(doc.astype(np.uint64) ^ np.uint64(seed + 2))
                  % np.uint64(10)).astype(np.int64)
        attracted = ((ha % np.uint64(16)).astype(np.int64) < td).reshape(ns, k)
        # first attracted position per session (k if none)
        any_hit = attracted.any(axis=1)
        first = np.where(any_hit, np.argmax(attracted, axis=1), k - 1)
        first_pos = np.where(any_hit, first + 1, k + 1)  # 1-based; k+1 = no stop
        pos2 = pos.reshape(ns, k)
        examined = pos2 <= np.minimum(first_pos, k)[:, None]
        click = attracted & (pos2 == first_pos[:, None])
        return pa.table(
            {
                "session": pa.array(sess, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "doc_id": pa.array(doc, pa.int64()),
                "examined": pa.array(examined.ravel().astype(np.int64), pa.int64()),
                "click": pa.array(click.ravel().astype(np.int64), pa.int64()),
            }
        )

    return ray.data.range(n_sessions).map_batches(expand, batch_format="pyarrow")


def cascade_mle(log: ray.data.Dataset) -> pa.Table:
    """Cascade-model attractiveness MLE: a_d = clicks_d / examined_d
    (Craswell '08 closed form — no EM needed because the stopping rule
    makes examination observable). One vectorized per-block fold to
    (doc → clicks, examined) partials, integer-exact driver merge.
    Returns (doc_id, n_clicks, n_examined, a_hat) sorted by doc_id."""

    def partial(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy()
        ex = b["examined"].to_numpy()
        ck = b["click"].to_numpy()
        uniq, inv = np.unique(d, return_inverse=True)
        return pa.table(
            {
                "doc_id": pa.array(uniq, pa.int64()),
                "ex": pa.array(np.bincount(inv, weights=ex).astype(np.int64), pa.int64()),
                "ck": pa.array(np.bincount(inv, weights=ck).astype(np.int64), pa.int64()),
            }
        )

    acc: dict[int, list[int]] = {}
    for b in log.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for d, e, c in zip(
            b["doc_id"].to_pylist(), b["ex"].to_pylist(), b["ck"].to_pylist()
        ):
            cur = acc.setdefault(int(d), [0, 0])
            cur[0] += int(e)
            cur[1] += int(c)
    docs = np.array(sorted(acc), np.int64)
    ex = np.array([acc[d][0] for d in docs], np.int64)
    ck = np.array([acc[d][1] for d in docs], np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        a = np.where(ex > 0, ck / np.maximum(ex, 1), 0.0)
    return pa.table(
        {
            "doc_id": pa.array(docs, pa.int64()),
            "n_clicks": pa.array(ck, pa.int64()),
            "n_examined": pa.array(ex, pa.int64()),
            "a_hat": pa.array(np.round(a, 6) + 0.0, pa.float64()),
        }
    )


def ctr_by_position(log: ray.data.Dataset) -> pa.Table:
    """SERP measurement primitive: click-through rate per (variant,
    position) from an impression log — the dashboard curve every
    ranking team watches (and the raw input PBM de-biases). One
    vectorized per-block fold to (variant, pos) → (impressions,
    clicks) integer partials. Returns
    (variant, pos, impressions, clicks, ctr) sorted."""

    def partial(b: pa.Table) -> pa.Table:
        v = b["variant"].to_numpy()
        p = b["pos"].to_numpy()
        c = b["click"].to_numpy()
        key = v * 64 + p
        uniq, inv = np.unique(key, return_inverse=True)
        return pa.table(
            {
                "key": pa.array(uniq, pa.int64()),
                "n": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "k": pa.array(
                    np.bincount(inv, weights=c).astype(np.int64), pa.int64()
                ),
            }
        )

    acc: dict[int, list[int]] = {}
    for b in log.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for key, n, k in zip(
            b["key"].to_pylist(), b["n"].to_pylist(), b["k"].to_pylist()
        ):
            cur = acc.setdefault(int(key), [0, 0])
            cur[0] += int(n)
            cur[1] += int(k)
    keys = np.array(sorted(acc), np.int64)
    n = np.array([acc[x][0] for x in keys], np.int64)
    k = np.array([acc[x][1] for x in keys], np.int64)
    return pa.table(
        {
            "variant": pa.array(keys // 64, pa.int64()),
            "pos": pa.array(keys % 64, pa.int64()),
            "impressions": pa.array(n, pa.int64()),
            "clicks": pa.array(k, pa.int64()),
            "ctr": pa.array(
                np.round(k / np.maximum(n, 1), 6) + 0.0, pa.float64()
            ),
        }
    )
