"""Cardinality and frequency operators: exact distinct via map-side
combine, HyperLogLog approximate distinct, exact heavy hitters.

Scale shapes (100 TB story):
- ``exact_distinct``: each batch collapses to its UNIQUE values first
  (one vectorized ``pc.unique`` per batch), so the shuffle carries at
  most |distinct-per-batch| rows — never the corpus. The global dedup
  is one ``groupby(col).count()`` whose output is |distinct| rows.
  Right when |distinct| fits the cluster; for unbounded key spaces use
  ``approx_distinct_hll``.
- ``approx_distinct_hll``: classic HyperLogLog (Flajolet et al. 2007,
  public algorithm). Each batch folds into a fixed 2^p-byte register
  array; partial registers merge with elementwise max — associative and
  commutative, so the reduction tree shape doesn't matter and the
  result is deterministic for a given hash. The exchange carries ONE
  2^p-byte array per batch regardless of corpus size.
- ``heavy_hitters``: exact top-k by count — per-batch value_counts
  partials, one small groupby-sum over partials (|values present| rows
  per batch, not |rows|), then a driver-side top-k over the
  |distinct|-sized aggregate. For unbounded key spaces cap with a
  count-min / space-saving sketch upstream; at the scales where an
  exact answer is wanted (vocab, hosts, licenses) |distinct| is small.

The 64-bit mix is splitmix64 (Steele et al., public domain reference
constants) applied to a polynomial byte hash for strings.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .relational import combiner_groupby

_SPLIT_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLIT_C2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized u64 → u64 mix."""
    x = (x + _GOLDEN).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= _SPLIT_C1
    x ^= x >> np.uint64(27)
    x *= _SPLIT_C2
    x ^= x >> np.uint64(31)
    return x


def _hash64_column(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic u64 hash of an Arrow column (int or string)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_integer(arr.type):
        v = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return _splitmix64(v.view(np.uint64))
    # strings: FNV-ish polynomial over 8-byte words of the flat buffer,
    # vectorized across rows via offset arithmetic (no per-byte loop)
    sarr = arr.cast(pa.large_utf8())
    buf = np.frombuffer(sarr.buffers()[2] or b"", np.uint8)
    offs = np.frombuffer(sarr.buffers()[1], np.int64)[: len(sarr) + 1]
    n = len(sarr)
    out = np.full(n, np.uint64(0xCBF29CE484222325), np.uint64)
    lens = offs[1:] - offs[:-1]
    max_words = int(-(-lens.max() // 8)) if n and lens.max() > 0 else 0
    P = np.uint64(0x100000001B3)
    for w in range(max_words):
        starts = offs[:-1] + 8 * w
        take = np.minimum(np.maximum(lens - 8 * w, 0), 8)
        active = take > 0
        if not active.any():
            break
        word = np.zeros(n, np.uint64)
        # gather up to 8 bytes per active row as one u64 (little-endian)
        idx = starts[active, None] + np.arange(8)[None, :]
        valid = np.arange(8)[None, :] < take[active, None]
        bytes8 = np.where(valid, buf[np.minimum(idx, len(buf) - 1)], 0).astype(np.uint64)
        word_active = (bytes8 << (np.arange(8, dtype=np.uint64) * np.uint64(8))).sum(
            axis=1, dtype=np.uint64
        )
        word[active] = word_active
        out = np.where(active, (out ^ word) * P, out)
    out = out + lens.astype(np.uint64)  # length-salt so "" != absent
    return _splitmix64(out)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def hll_fold_batch(hashes: np.ndarray, p: int) -> np.ndarray:
    """Fold u64 hashes into a fresh 2^p register array (uint8)."""
    m = 1 << p
    reg_idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes << np.uint64(p)
    # rank = leading zeros of the remaining 64-p bits, +1; cap at 64-p+1
    with np.errstate(divide="ignore"):
        # position of highest set bit via float log2 is unsafe near 2^63;
        # use a bit-length loop over 6 halving steps instead (vectorized)
        lz = np.full(len(hashes), 64, np.int64)
        x = rest.copy()
        shift = np.uint64(32)
        acc = np.zeros(len(hashes), np.int64)
        for s in (32, 16, 8, 4, 2, 1):
            hi = x >> np.uint64(64 - s)
            has = hi != 0
            acc = np.where(has, acc, acc + s)
            x = np.where(has, x, x << np.uint64(s))
        lz = np.where(rest == 0, 64, acc)
    rank = np.minimum(lz + 1, 64 - p + 1).astype(np.uint8)
    regs = np.zeros(m, np.uint8)
    np.maximum.at(regs, reg_idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimate with small-range correction."""
    m = float(len(regs))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct_hll(
    ds: ray.data.Dataset, col: str, p: int = 12
) -> tuple[float, np.ndarray]:
    """Approximate COUNT(DISTINCT col): per-batch register folds merged
    with elementwise max. Returns (estimate, merged_registers); relative
    error ≈ 1.04/sqrt(2^p) (~1.6% at p=12). Deterministic."""

    def fold(b: pa.Table) -> pa.Table:
        # drop nulls BEFORE hashing: int columns with nulls round-trip
        # through float64 in to_numpy, which would make the same value
        # hash differently in null-bearing vs null-free batches
        col_arr = b[col].combine_chunks().drop_null()
        h = _hash64_column(col_arr)
        regs = hll_fold_batch(h, p)
        return pa.table({"regs": pa.array([regs], pa.list_(pa.uint8()))})

    m = 1 << p

    def _rows_to_matrix(t: pa.Table) -> np.ndarray:
        return (
            t["regs"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
            .astype(np.uint8)
            .reshape(-1, m)
        )

    def premerge(t: pa.Table) -> pa.Table:
        regs = _rows_to_matrix(t).max(axis=0)
        return pa.table({"regs": pa.array([regs], pa.list_(pa.uint8()))})

    # two-level merge: workers coalesce 64 per-block sketches into one
    # before anything reaches the driver — at 10^6 blocks the driver
    # sees ~10^4 rows, each a fixed 2^p bytes
    folded = ds.map_batches(fold, batch_format="pyarrow").map_batches(
        premerge, batch_size=64, batch_format="pyarrow"
    )
    merged = np.zeros(m, np.uint8)
    for b in folded.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        if len(t):
            np.maximum(merged, _rows_to_matrix(t).max(axis=0), out=merged)
    return hll_estimate(merged), merged


def kmv_distinct(
    ds: ray.data.Dataset, col: str, k: int = 8
) -> tuple[float, np.ndarray]:
    """KMV (k-minimum-values / bottom-k) distinct sketch (Bar-Yossef
    et al. '02): keep the ``k`` smallest distinct u64 hashes; estimate
    ``(k-1) · 2^64 / h_(k)``. Each batch collapses to ≤ k hashes and a
    64-way pre-merge layer coalesces them inside workers, so the
    driver folds ~fanin rows of ≤ k values each no matter the corpus
    size. Deterministic given the splitmix64 hash — the SQL oracle
    replays it bit-exactly. Returns (estimate, sorted kept hashes);
    when fewer than ``k`` distinct values exist the estimate is the
    exact count (the standard small-cardinality branch)."""

    def fold(b: pa.Table) -> pa.Table:
        col_arr = b[col].combine_chunks().drop_null()
        h = np.unique(_hash64_column(col_arr))[:k]
        return pa.table({"h": pa.array(h, pa.uint64())})

    def premerge(t: pa.Table) -> pa.Table:
        h = np.unique(t["h"].to_numpy(zero_copy_only=False).astype(np.uint64))[:k]
        return pa.table({"h": pa.array(h, pa.uint64())})

    folded = ds.map_batches(fold, batch_format="pyarrow").map_batches(
        premerge, batch_size=64 * k, batch_format="pyarrow"
    )
    kept = np.empty(0, np.uint64)
    for b in folded.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        if len(t):
            kept = np.unique(
                np.concatenate(
                    [kept, t["h"].to_numpy(zero_copy_only=False).astype(np.uint64)]
                )
            )[:k]
    if len(kept) < k:
        return float(len(kept)), kept
    est = (k - 1) * 18446744073709551616.0 / float(kept[-1])
    return est, kept


# ---------------------------------------------------------------------------
# exact distinct / heavy hitters
# ---------------------------------------------------------------------------


def exact_distinct(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
    """Exact COUNT(DISTINCT col) as a 1-row Dataset (column n_distinct).

    Per-batch ``pc.unique`` collapse first, so the groupby exchange
    carries batch-distinct values only; the final count is one tiny
    aggregate over |distinct| rows.
    """

    def uniq(b: pa.Table) -> pa.Table:
        u = pc.unique(b[col].combine_chunks().drop_null())
        return pa.table({col: u})

    dedup = ds.map_batches(uniq, batch_format="pyarrow").groupby(col).count()

    def count_rows(b: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([len(b)], pa.int64())})

    partial = dedup.map_batches(count_rows, batch_format="pyarrow")
    total = partial.sum("n") or 0  # empty input sums to None
    return ray.data.from_arrow(
        pa.table({"n_distinct": pa.array([int(total)], pa.int64())})
    )


def cms_fold_batch(hashes: np.ndarray, depth: int, width: int) -> np.ndarray:
    """Fold u64 hashes into a fresh (depth, width) count-min matrix.
    Row r uses an independent hash via splitmix64(h ^ row_salt).
    Partials merge with elementwise SUM — associative/commutative, so
    the merged sketch equals the single-pass sketch exactly."""
    cms = np.zeros((depth, width), np.int64)
    salts = _splitmix64(np.arange(1, depth + 1, dtype=np.uint64))
    for r in range(depth):
        idx = (_splitmix64(hashes ^ salts[r]) % np.uint64(width)).astype(np.int64)
        np.add.at(cms[r], idx, 1)
    return cms


def cms_query(cms: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Point-estimate counts (min over rows) — never underestimates."""
    depth, width = cms.shape
    est = np.full(len(hashes), np.iinfo(np.int64).max, np.int64)
    salts = _splitmix64(np.arange(1, depth + 1, dtype=np.uint64))
    for r in range(depth):
        idx = (_splitmix64(hashes ^ salts[r]) % np.uint64(width)).astype(np.int64)
        np.minimum(est, cms[r][idx], out=est)
    return est


def cms_heavy_hitters(
    ds: ray.data.Dataset,
    col: str,
    k: int = 25,
    depth: int = 4,
    width: int = 4096,
    candidates_per_batch: int = 256,
) -> pa.Table:
    """Approximate top-k for UNBOUNDED key spaces: per-batch count-min
    fold (a fixed depth×width matrix regardless of batch size) plus the
    batch's own top-``candidates_per_batch`` values as candidates.
    Sketches merge by sum, candidates by union; final counts are CMS
    point estimates (≥ true count, error ≤ ~2N/width w.h.p.).

    Exchange per batch: depth·width int64 + ≤candidates_per_batch
    strings — constant in corpus size, unlike exact ``heavy_hitters``
    whose aggregate is |distinct|-sized. Any value in the true top-k
    is in some batch's local top-c for c ≥ k (counts are additive), so
    candidates_per_batch ≥ k keeps true heavy hitters recallable
    unless a hitter is uniformly diluted below every batch's local
    top-c — raise c or batch size for adversarial splits."""

    def fold(b: pa.Table) -> pa.Table:
        arr = b[col].combine_chunks().drop_null()
        h = _hash64_column(arr)
        cms = cms_fold_batch(h, depth, width)
        vc = pa.table({col: arr}).group_by([col]).aggregate([(col, "count")])
        order = pc.sort_indices(
            vc, sort_keys=[(f"{col}_count", "descending"), (col, "ascending")]
        )[: min(candidates_per_batch, len(vc))]
        cand = vc.take(order)[col]
        return pa.table(
            {
                "cms": pa.array([cms.ravel()], pa.list_(pa.int64())),
                "cand": pa.array([cand.to_pylist()], pa.list_(pa.string())),
            }
        )

    def _cms_rows(t: pa.Table) -> np.ndarray:
        return (
            t["cms"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
            .astype(np.int64)
            .reshape(-1, depth * width)
        )

    def premerge(t: pa.Table) -> pa.Table:
        cms = _cms_rows(t).sum(axis=0)
        cand = pc.unique(t["cand"].combine_chunks().flatten())
        return pa.table(
            {
                "cms": pa.array([cms], pa.list_(pa.int64())),
                "cand": pa.array([cand.to_pylist()], pa.list_(pa.string())),
            }
        )

    # two-level merge (see approx_distinct_hll): workers coalesce 64
    # per-block sketches before the driver sees anything
    folded = ds.map_batches(fold, batch_format="pyarrow").map_batches(
        premerge, batch_size=64, batch_format="pyarrow"
    )
    merged = np.zeros((depth, width), np.int64)
    cand: set[str] = set()
    for b in folded.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        if len(t):
            merged += _cms_rows(t).sum(axis=0).reshape(depth, width)
            cand.update(t["cand"].combine_chunks().flatten().to_pylist())
    values = sorted(cand)
    if not values:
        return pa.table(
            {col: pa.array([], pa.string()), "n_est": pa.array([], pa.int64())}
        )
    est = cms_query(merged, _hash64_column(pa.array(values, pa.string())))
    order = np.lexsort((np.array(values, object), -est))[: min(k, len(values))]
    return pa.table(
        {
            col: pa.array([values[i] for i in order], pa.string()),
            "n_est": pa.array(est[order], pa.int64()),
        }
    )


def heavy_hitters(
    ds: ray.data.Dataset, col: str, k: int = 25
) -> pa.Table:
    """Exact top-k values of ``col`` by row count, ties broken by value
    ascending. Map-side value_counts partials → small groupby-sum →
    driver top-k over the |distinct|-sized aggregate."""

    def partial(b: pa.Table) -> pa.Table:
        vc = b.select([col]).group_by([col]).aggregate([(col, "count")])
        return pa.table(
            {col: vc[col], "cnt": vc[f"{col}_count"].cast(pa.int64())}
        )

    agg = combiner_groupby(
        ds.map_batches(partial, batch_format="pyarrow"), [col], ["cnt"]
    )

    # blocks after the final groupby are key-disjoint, so cutting each
    # to its local top-k before the driver merge is exact — the driver
    # sees |blocks|·k rows, never |distinct|
    def block_topk(b: pa.Table) -> pa.Table:
        b = b.select([col, "cnt"])
        order = pc.sort_indices(
            b, sort_keys=[("cnt", "descending"), (col, "ascending")]
        )[: min(k, len(b))]
        return b.take(order)

    tables = [
        pa.table(b)
        for b in agg.map_batches(block_topk, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    t = (
        pa.concat_tables(tables)
        if tables
        else pa.table({col: pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
    )
    order = pc.sort_indices(
        t, sort_keys=[("cnt", "descending"), (col, "ascending")]
    )[: min(k, len(t))]
    top = t.take(order)
    return pa.table({col: top[col], "n_rows": top["cnt"]})


# --- Bloom filter: cross-snapshot membership (dedup a new crawl
# against an already-kept corpus without shuffling either side) -------


def _bloom_positions(hashes: np.ndarray, m_log2: int, k: int) -> np.ndarray:
    """(len(hashes), k) bit positions via double hashing h1 + i*h2."""
    h1 = hashes.astype(np.uint64)
    h2 = _splitmix64(h1) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    mask = np.uint64((1 << m_log2) - 1)
    return (h1[:, None] + i * h2[:, None]) & mask


def bloom_from_hashes(hashes: np.ndarray, m_log2: int = 22, k: int = 7) -> np.ndarray:
    """Packed bitset (uint64 words, len = 2**m_log2 / 64) with every
    hash's k probe bits set."""
    words = np.zeros(1 << max(m_log2 - 6, 0), np.uint64)
    if len(hashes):
        pos = _bloom_positions(np.asarray(hashes, np.uint64), m_log2, k).ravel()
        np.bitwise_or.at(words, pos >> np.uint64(6), np.uint64(1) << (pos & np.uint64(63)))
    return words


def bloom_might_contain(
    words: np.ndarray, hashes: np.ndarray, m_log2: int, k: int = 7
) -> np.ndarray:
    """Vectorized membership probe; False is definite, True is probable."""
    if len(hashes) == 0:
        return np.zeros(0, bool)
    pos = _bloom_positions(np.asarray(hashes, np.uint64), m_log2, k)
    bits = (words[pos >> np.uint64(6)] >> (pos & np.uint64(63))) & np.uint64(1)
    return bits.all(axis=1)


def _bloom_or_rows(t: pa.Table, n_words: int) -> np.ndarray:
    """Vectorized OR of a table of binary bitset rows → one word array."""
    arr = t["bits"].combine_chunks().cast(pa.large_binary())
    offs = np.frombuffer(arr.buffers()[1], np.int64)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2] or b"", np.uint8)
    # rows are fixed-length and contiguous; slice by offsets so zero-copy
    # slice views (nonzero arr.offset) read the right bytes
    mat = data[offs[0] : offs[-1]].view(np.uint64).reshape(len(arr), n_words)
    return np.bitwise_or.reduce(mat, axis=0)


def bloom_build(
    ds: ray.data.Dataset, col: str, m_log2: int = 22, k: int = 7,
    fanin: int = 64, levels: int = 3,
) -> np.ndarray:
    """OR-combine per-block bitsets into one filter via a TREE reduce.

    Each block emits one 2**m_log2-bit bitset (0.5 MiB at the default);
    ``levels`` layers of ``fanin``-way ``map_batches`` OR-merges (same
    shape as the HLL/CMS sketch pre-merge above) coalesce them inside
    workers, so the driver folds at most ~``fanin`` rows no matter how
    many input blocks there are — 3 levels × 64-way covers 64^4 ≈ 16M
    blocks (~500 TB at 32 MB blocks). OR is commutative/associative, so
    the tree shape cannot change the result. Keys are hashed with the
    same `_hash64_column` used by exact dedup, so a filter built on one
    snapshot probes another byte-compatibly.
    """
    n_words = 1 << max(m_log2 - 6, 0)

    def per_block(batch: pa.Table) -> pa.Table:
        h = _hash64_column(batch[col])
        return pa.table(
            {"bits": pa.array([bloom_from_hashes(h, m_log2, k).tobytes()], pa.binary())}
        )

    def or_merge(t: pa.Table) -> pa.Table:
        return pa.table(
            {"bits": pa.array([_bloom_or_rows(t, n_words).tobytes()], pa.binary())}
        )

    folded = ds.map_batches(per_block, batch_format="pyarrow")
    for _ in range(levels):
        folded = folded.map_batches(or_merge, batch_size=fanin, batch_format="pyarrow")
    words = np.zeros(n_words, np.uint64)
    for b in folded.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        if len(t):
            words |= _bloom_or_rows(t, n_words)
    return words


def bloom_anti_join(
    ds: ray.data.Dataset,
    bloom_ref,
    col: str,
    m_log2: int = 22,
    k: int = 7,
) -> ray.data.Dataset:
    """Keep rows whose `col` is definitely NOT in the broadcast filter
    (`bloom_ref` = ray.put of bloom_build's words). No false negatives:
    every genuinely-new row survives; a ~(1-e^{-kn/m})^k fraction of new
    rows is dropped as collateral, the standard bloom-dedup trade."""
    import ray as _ray

    def per_batch(batch: pa.Table) -> pa.Table:
        words = _ray.get(bloom_ref)
        h = _hash64_column(batch[col])
        keep = ~bloom_might_contain(words, h, m_log2, k)
        return batch.filter(pa.array(keep))

    return ds.map_batches(per_batch, batch_format="pyarrow")


def grouped_approx_distinct_hll(
    ds: ray.data.Dataset, key: str, col: str, p: int = 8
) -> pa.Table:
    """APPROX COUNT(DISTINCT col) GROUP BY key — one HLL register array
    per key. Per-batch fold produces one (key, registers) row per key
    per block; a groupby on key max-merges the fixed-size registers, so
    the exchange is |keys| x 2^p bytes per block regardless of row
    count. Returns (key, approx_distinct) sorted by key. Default p=8
    (~6.5% rel. error) keeps the per-key payload at 256 bytes; raise p
    for fewer, bigger groups."""
    m = 1 << p

    def fold(b: pa.Table) -> pa.Table:
        t = pa.table({"k": b[key], "v": b[col]}).drop_null()
        if len(t) == 0:
            return pa.table(
                {key: pa.array([], b[key].type),
                 "regs": pa.array([], pa.list_(pa.uint8()))}
            )
        enc = pc.dictionary_encode(t["k"].combine_chunks())
        codes = np.asarray(enc.indices)
        nk = len(enc.dictionary)
        h = _hash64_column(t["v"].combine_chunks())
        reg_idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = h << np.uint64(p)
        # exact leading-zero ladder (same as hll_fold_batch)
        x = rest.copy()
        acc = np.zeros(len(h), np.int64)
        for s in (32, 16, 8, 4, 2, 1):
            hi = x >> np.uint64(64 - s)
            has = hi != 0
            acc = np.where(has, acc, acc + s)
            x = np.where(has, x, x << np.uint64(s))
        lz = np.where(rest == 0, 64, acc)
        rank = np.minimum(lz + 1, 64 - p + 1).astype(np.uint8)
        regs = np.zeros((nk, m), np.uint8)
        np.maximum.at(regs, (codes, reg_idx), rank)
        return pa.table(
            {
                key: enc.dictionary,
                "regs": pa.array(list(regs), pa.list_(pa.uint8())),
            }
        )

    folded = ds.select_columns([key, col]).map_batches(fold, batch_format="pyarrow")

    def merge_group(g: pa.Table) -> pa.Table:
        mat = (
            g["regs"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
            .astype(np.uint8).reshape(-1, m)
        )
        return pa.table(
            {
                key: g[key].slice(0, 1),
                "regs": pa.array([mat.max(axis=0)], pa.list_(pa.uint8())),
            }
        )

    merged = folded.groupby(key).map_groups(merge_group, batch_format="pyarrow")
    keys_out, ests = [], []
    for b in merged.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        for i in range(len(t)):
            regs = np.asarray(t["regs"][i].as_py(), np.uint8)
            keys_out.append(t[key][i].as_py())
            ests.append(round(hll_estimate(regs), 6))
    order = np.argsort(np.array(keys_out, object), kind="stable")
    return pa.table(
        {
            key: pa.array([keys_out[i] for i in order]),
            "approx_distinct": pa.array([ests[i] for i in order], pa.float64()),
        }
    )


def hll_set_algebra(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    key_a: str,
    key_b: str,
    p: int = 8,
) -> pa.Table:
    """HLL register algebra: approximate |A|, |B|, |A∪B| and the
    inclusion–exclusion intersection |A∩B| ≈ |A| + |B| − |A∪B| for the
    value sets of two key slices (e.g. users who viewed vs clicked) —
    the sketch-union property (register-wise max) that exact distinct
    counts don't compose into.

    Each slice is one streaming register fold (:func:`approx_distinct_hll`,
    worker-side 64-way pre-merge); the union costs NOTHING extra — its
    registers are the elementwise max of the two 2^p-byte vectors on
    the driver. Intersection error grows with |A∪B|/|A∩B| (the standard
    inclusion–exclusion caveat); negative estimates clamp to 0."""
    import pyarrow.compute as pc

    def only(key):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b[key_col], key))

        return f

    ds = ds.materialize()
    est_a, regs_a = approx_distinct_hll(
        ds.map_batches(only(key_a), batch_format="pyarrow"), val_col, p=p
    )
    est_b, regs_b = approx_distinct_hll(
        ds.map_batches(only(key_b), batch_format="pyarrow"), val_col, p=p
    )
    est_u = hll_estimate(np.maximum(regs_a, regs_b))
    inter = max(0.0, est_a + est_b - est_u)
    return pa.table(
        {
            "key_a": pa.array([key_a], pa.string()),
            "key_b": pa.array([key_b], pa.string()),
            "approx_a": pa.array([round(est_a, 6)], pa.float64()),
            "approx_b": pa.array([round(est_b, 6)], pa.float64()),
            "approx_union": pa.array([round(est_u, 6)], pa.float64()),
            "approx_intersection": pa.array([round(inter, 6)], pa.float64()),
        }
    )
