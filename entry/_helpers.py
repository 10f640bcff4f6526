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

BM25_QUERY = "spark merge join"


LITERAL = "spark merge"


_CACHE_ROOT = "/tmp/dcs_ray_idxcache_v2"  # v2: doc_meta carries source+prior


def _index_dir(sf_dir: str, mode: str) -> str:
    from dcs_ray.index import IndexConfig, build_index

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(_CACHE_ROOT, f"{name}_{mode}")
    if not os.path.exists(os.path.join(out, "MANIFEST.json")):
        docs = read_parquet_sized(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
        )

        def with_prior(b: pa.Table) -> pa.Table:
            # deterministic static rank prior (dcs pre-ranking's per-package
            # Inst/Rdep prior analogue); same formula as the SQL oracle
            ids = b["doc_id"].to_numpy()
            prior = 1.0 + (ids % 5) / 10.0
            return b.append_column("prior", pa.array(prior, pa.float64()))

        docs = docs.map_batches(with_prior, batch_format="pyarrow")
        conf = IndexConfig(
            num_partitions=8,
            num_shards=2,
            mode=mode,
            id_col="doc_id",
            dedup_latest=False,
            positional=(mode == "trigram"),
            meta_cols=("source", "prior"),
        )
        build_index(docs, out, conf)
    return out


def _docs(sf_dir: str) -> ray.data.Dataset:
    return read_parquet_sized(f"{sf_dir}/documents.parquet")


def _anchor_index_dir(sf_dir: str) -> str:
    """Anchor-text field index: one pseudo-doc per link TARGET whose
    text is every anchor pointing at it (the anchor field of a web
    index — built like any other index, searched as the second field
    of ``search_bm25_fielded``, which range-refines work units so the
    two indexes need NOT shard identically). id_max pinned to the body
    corpus max (a metadata-only read) to skip the Dataset max() pass;
    link targets past the corpus edge clamp into the last partition."""
    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.index.build import parquet_col_max

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(_CACHE_ROOT, f"{name}_anchor")
    if not os.path.exists(os.path.join(out, "MANIFEST.json")):
        from dcs_ray.functions.links import anchor_pseudo_docs

        docs = anchor_pseudo_docs(_link_edges_ds(sf_dir))
        conf = IndexConfig(
            num_partitions=8,
            num_shards=2,
            mode="words",
            id_col="doc_id",
            dedup_latest=False,
            id_max=parquet_col_max(f"{sf_dir}/documents.parquet", "doc_id"),
        )
        build_index(docs, out, conf)
    return out


def entry() -> Any:
    """Pages flagship at sf0.001: synthesize Common-Crawl-style pages,
    extract text (byte-identical invariant), dedup to latest crawl,
    build the sharded inverted index, run BM25 top-k."""
    import shutil

    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.search import search_bm25
    from dcs_ray.sources.pages import extract_text_batch, read_pages

    out = os.path.join(_CACHE_ROOT, "entry_pages")
    shutil.rmtree(out, ignore_errors=True)
    pages = read_pages("/root/testdata/sf0.001")
    extracted = pages.map_batches(extract_text_batch, batch_format="pyarrow")
    build_index(
        extracted,
        out,
        IndexConfig(num_partitions=4, num_shards=2, mode="words", dedup_latest=True),
    )
    res = search_bm25(out, [BM25_QUERY, "customer window batch"], k=10)
    return res.to_pandas()


REGEX = "(spark|batch) (merge|join)"


def _lsh_assignment_sql() -> str:
    """SQL replay of ``LshAnnIndex``'s SRP bucket assignment (seed 13,
    6 planes, dim 64): the plane values are inlined as double literals
    from the SAME rng stream the builder draws (``repr`` round-trips
    float64 exactly), bucket bit t = [dot(embedding, plane_t) > 0] —
    normalization cannot change a dot's sign, so the raw embedding
    replays the normalized builder bit-exactly."""
    num_planes, d = 6, 64
    tables = np.random.default_rng(13).standard_normal((1, num_planes, d))
    rows = ", ".join(
        "(%d, [%s])" % (t, ", ".join(repr(float(v)) for v in tables[0][t]))
        for t in range(num_planes)
    )
    return f"""
WITH p(t, pl) AS (VALUES {rows}),
e AS (SELECT vec_id, list_transform(embedding, x -> x::double) AS ev FROM embeddings),
d AS (SELECT e.vec_id, p.t, list_dot_product(e.ev, p.pl) AS dot FROM e CROSS JOIN p)
SELECT vec_id, sum(CASE WHEN dot > 0 THEN (1::bigint << t) ELSE 0 END)::bigint AS bucket
FROM d GROUP BY vec_id ORDER BY vec_id
"""


def _ivf_assignment_sql(num_lists: int = 8) -> str:
    """SQL replay of ``IvfAnnIndex``'s hash-min-init assignment pass:
    centroids = the ``num_lists`` rows with smallest
    (splitmix64(vec_id), vec_id) — the same integer hash chain as
    ``sketches._hash64_column`` — then every vector goes to its
    cosine-argmax centroid (ties to the lowest centroid id, matching
    ``np.argmax``)."""
    M64 = "18446744073709551616"
    GOLDEN = str(0x9E3779B97F4A7C15)
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)
    return f"""
WITH h0 AS (SELECT vec_id, ((vec_id::hugeint + {GOLDEN}) % {M64}) AS x0 FROM embeddings),
h1 AS (SELECT vec_id, ({_mulmod64("xor(x0::ubigint, x0::ubigint >> 30)::hugeint", MIX1 + "::hugeint")}) AS x1 FROM h0),
h2 AS (SELECT vec_id, ({_mulmod64("xor(x1::ubigint, x1::ubigint >> 27)::hugeint", MIX2 + "::hugeint")}) AS x2 FROM h1),
hf AS (SELECT vec_id, xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM h2),
cent AS (
  SELECT list_transform(e.embedding, x -> x::double) AS ce,
         row_number() OVER (ORDER BY hf.h, e.vec_id) - 1 AS cid
  FROM embeddings e JOIN hf USING (vec_id)
  QUALIFY row_number() OVER (ORDER BY hf.h, e.vec_id) <= {num_lists}
),
v AS (SELECT vec_id, list_transform(embedding, x -> x::double) AS ev FROM embeddings),
cos AS (SELECT v.vec_id, c.cid, list_cosine_similarity(v.ev, c.ce) AS cs
        FROM v CROSS JOIN cent c),
best AS (SELECT vec_id, cid,
                row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC) AS rn
         FROM cos)
SELECT vec_id, cid AS list FROM best WHERE rn = 1 ORDER BY vec_id
"""


def _srp_planes_values(tables: np.ndarray) -> str:
    """(t, b, pl) VALUES rows for an SRP plane tensor — ``repr`` round-
    trips float64 exactly, so the SQL sees bit-identical plane values."""
    t_n, b_n, _d = tables.shape
    return ", ".join(
        "(%d, %d, [%s])" % (t, b, ", ".join(repr(float(v)) for v in tables[t, b]))
        for t in range(t_n)
        for b in range(b_n)
    )


def _lsh_knn_sql(
    num_tables: int = 4, num_planes: int = 6, probe_t: int = 8, k: int = 10
) -> str:
    """Full SQL replay of ``knn_cosine_lsh`` (seed-13 multi-table index,
    query-directed multiprobe per Lv et al. VLDB'07): per table, the
    query's SRP signature plus the ``probe_t`` cheapest XOR-masks by
    summed |projection| of the flipped planes (ties to the smaller mask,
    matching the stable argsort over ascending masks); candidates are
    vectors whose per-table signature lands in a probed bucket, deduped
    across tables; exact cosine top-k over candidates. Signs and probe
    costs use RAW dots — normalization can change neither a dot's sign
    nor the cost ordering (a positive per-query scale)."""
    tables = np.random.default_rng(13).standard_normal((num_tables, num_planes, 64))
    return f"""
WITH p(t, b, pl) AS (VALUES {_srp_planes_values(tables)}),
q AS (SELECT list_transform(embedding, x -> x::double) AS qe FROM embeddings WHERE vec_id = 0),
qp AS (SELECT p.t, p.b, list_dot_product(q.qe, p.pl) AS pr FROM p CROSS JOIN q),
qsig AS (SELECT t, sum(CASE WHEN pr > 0 THEN (1::bigint << b) ELSE 0 END)::bigint AS sig
         FROM qp GROUP BY t),
mc AS (SELECT qp.t, r.m::bigint AS mask,
              sum(CASE WHEN (r.m >> qp.b) & 1 = 1 THEN abs(qp.pr) ELSE 0 END) AS cost
       FROM range({1 << num_planes}) r(m) CROSS JOIN qp GROUP BY qp.t, r.m),
probes AS (SELECT mc.t, xor(mc.mask::ubigint, qsig.sig::ubigint)::bigint AS bucket
           FROM mc JOIN qsig USING (t)
           QUALIFY row_number() OVER (PARTITION BY mc.t ORDER BY mc.cost ASC, mc.mask ASC)
                   <= {probe_t}),
vd AS (SELECT e.vec_id, p.t, p.b,
              list_dot_product(list_transform(e.embedding, x -> x::double), p.pl) AS dot
       FROM embeddings e CROSS JOIN p),
vsig AS (SELECT vec_id, t, sum(CASE WHEN dot > 0 THEN (1::bigint << b) ELSE 0 END)::bigint AS sig
         FROM vd GROUP BY vec_id, t),
cand AS (SELECT DISTINCT v.vec_id FROM vsig v JOIN probes pr ON v.t = pr.t AND v.sig = pr.bucket),
sims AS (SELECT c.vec_id,
                list_cosine_similarity(list_transform(e.embedding, x -> x::double), q.qe) AS cs
         FROM cand c JOIN embeddings e USING (vec_id) CROSS JOIN q)
SELECT row_number() OVER (ORDER BY cs DESC, vec_id ASC) AS rank,
       vec_id::bigint AS vec_id, round(cs, 6) AS cos_sim
FROM sims ORDER BY cs DESC, vec_id ASC LIMIT {k}
"""


def _near_dup_lsh_sql(threshold: float = 0.42) -> str:
    """Full SQL replay of ``near_dup_pairs_lsh`` at the gate's corpus
    size: the SIZE-AWARE banding resolves to bits_per_table=2 /
    num_tables=6 for n=500 (the same closed-form the engine derives from
    its metadata row count), planes from the same seed-13 stream;
    candidate pairs share a (table, 2-bit sig) bucket, verified at
    cosine >= threshold. Buckets stay far below the 4096 cap at this n,
    so the capped-bucket path contributes nothing."""
    n_rows, max_bucket, target_recall = 500, 4096, 0.95
    bits = int(np.clip(np.ceil(np.log2(max(4.0 * n_rows / max_bucket, 4.0))), 2, 24))
    p_col = 1.0 - np.arccos(np.clip(threshold, -1.0, 1.0)) / np.pi
    pb = max(p_col**bits, 1e-12)
    num_tables = int(
        np.clip(np.ceil(np.log(max(1.0 - target_recall, 1e-9)) / np.log(1.0 - pb)), 2, 64)
    )
    planes = np.random.default_rng(13).standard_normal((num_tables * bits, 64))
    rows = ", ".join(
        "(%d, [%s])" % (j, ", ".join(repr(float(v)) for v in planes[j]))
        for j in range(num_tables * bits)
    )
    return f"""
WITH p(j, pl) AS (VALUES {rows}),
e AS (SELECT vec_id, list_transform(embedding, x -> x::double) AS ev FROM embeddings),
vd AS (SELECT e.vec_id, p.j, CASE WHEN list_dot_product(e.ev, p.pl) > 0 THEN 1 ELSE 0 END AS bit
       FROM e CROSS JOIN p),
sigs AS (SELECT vec_id, j // {bits} AS t,
                sum(bit * (1::bigint << (j % {bits})))::bigint AS sig
         FROM vd GROUP BY vec_id, j // {bits}),
cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         FROM sigs a JOIN sigs b ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id),
sims AS (SELECT c.id_a, c.id_b, list_cosine_similarity(ea.ev, eb.ev) AS cs
         FROM cand c JOIN e ea ON ea.vec_id = c.id_a JOIN e eb ON eb.vec_id = c.id_b)
SELECT id_a::bigint AS id_a, id_b::bigint AS id_b, round(cs, 6) AS cos_sim
FROM sims WHERE cs >= {threshold!r} ORDER BY id_a, id_b
"""


def _ivf_knn_hashmin_sql(num_lists: int = 8, nprobe: int = 3, k: int = 10) -> str:
    """SQL replay of the IVF QUERY path over the hash-min index: the
    centroid pick and cosine-argmax assignment of
    ``_ivf_assignment_sql``, plus the query's nprobe nearest-centroid
    probe (ties to the lower cid) and the exact top-k over vectors in
    probed lists — the same (cos desc, id asc) merge as the engine."""
    GOLDEN = str(0x9E3779B97F4A7C15)
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)
    return f"""
WITH h0 AS (SELECT vec_id, ((vec_id::hugeint + {GOLDEN}) % {_M64}) AS x0 FROM embeddings),
h1 AS (SELECT vec_id, ({_mulmod64("xor(x0::ubigint, x0::ubigint >> 30)::hugeint", MIX1 + "::hugeint")}) AS x1 FROM h0),
h2 AS (SELECT vec_id, ({_mulmod64("xor(x1::ubigint, x1::ubigint >> 27)::hugeint", MIX2 + "::hugeint")}) AS x2 FROM h1),
hf AS (SELECT vec_id, xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM h2),
cent AS (
  SELECT list_transform(e.embedding, x -> x::double) AS ce,
         row_number() OVER (ORDER BY hf.h, e.vec_id) - 1 AS cid
  FROM embeddings e JOIN hf USING (vec_id)
  QUALIFY row_number() OVER (ORDER BY hf.h, e.vec_id) <= {num_lists}
),
q AS (SELECT list_transform(embedding, x -> x::double) AS qe FROM embeddings WHERE vec_id = 0),
probe AS (SELECT cid FROM (SELECT c.cid, list_cosine_similarity(q.qe, c.ce) AS cs
                           FROM cent c CROSS JOIN q)
          ORDER BY cs DESC, cid ASC LIMIT {nprobe}),
v AS (SELECT vec_id, list_transform(embedding, x -> x::double) AS ev FROM embeddings),
assign AS (SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_cosine_similarity(v.ev, c.ce) DESC, c.cid ASC) AS rn
    FROM v CROSS JOIN cent c) WHERE rn = 1),
cand AS (SELECT vec_id FROM assign WHERE cid IN (SELECT cid FROM probe)),
sims AS (SELECT c.vec_id, list_cosine_similarity(v.ev, q.qe) AS cs
         FROM cand c JOIN v USING (vec_id) CROSS JOIN q)
SELECT row_number() OVER (ORDER BY cs DESC, vec_id ASC) AS rank,
       vec_id::bigint AS vec_id, round(cs, 6) AS cos_sim
FROM sims ORDER BY cs DESC, vec_id ASC LIMIT {k}
"""


def _splitmix_docs_ctes(seed: int) -> str:
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)
    return f"""
h0 AS (SELECT *, xor(doc_id::ubigint, {seed}::ubigint)::hugeint AS x0 FROM documents),
h1 AS (SELECT *, ({_mulmod64("xor(x0::ubigint, x0::ubigint >> 30)::hugeint", MIX1 + "::hugeint")}) AS x1 FROM h0),
h2 AS (SELECT *, ({_mulmod64("xor(x1::ubigint, x1::ubigint >> 27)::hugeint", MIX2 + "::hugeint")}) AS x2 FROM h1),
hf AS (SELECT *, xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM h2)"""


def _interleave_sql(k: int, seed: int) -> str:
    """Unrolled team-draft rounds (the ``team_draft_interleave``
    oracle): expects CTEs ``ra`` / ``rb`` with (doc_id, rank). Coin per
    pick index via the GOLDEN-add splitmix64 chain; at each round the
    team with fewer picks selects its best unpicked doc, coin breaking
    balance ties (heads=0 → team A)."""
    M64 = "18446744073709551616"
    GOLDEN = 0x9E3779B97F4A7C15
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)
    parts = [
        f"""c0 AS (SELECT s, ((s::hugeint + {seed} + {GOLDEN}) % {M64}) AS x0
      FROM (SELECT unnest(range({k})) AS s)),
c1 AS (SELECT s, ({_mulmod64("xor(x0::ubigint, x0::ubigint >> 30)::hugeint", MIX1 + "::hugeint")}) AS x1 FROM c0),
c2 AS (SELECT s, ({_mulmod64("xor(x1::ubigint, x1::ubigint >> 27)::hugeint", MIX2 + "::hugeint")}) AS x2 FROM c1),
coins AS MATERIALIZED (SELECT s, (xor(x2::ubigint, x2::ubigint >> 31)::hugeint % 2)::bigint AS coin FROM c2),
sel0 AS MATERIALIZED (SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS team WHERE FALSE)"""
    ]
    for i in range(k):
        parts.append(f"""nA{i} AS MATERIALIZED (SELECT doc_id FROM ra
       WHERE doc_id NOT IN (SELECT doc_id FROM sel{i})
       ORDER BY rank LIMIT 1),
nB{i} AS MATERIALIZED (SELECT doc_id FROM rb
       WHERE doc_id NOT IN (SELECT doc_id FROM sel{i})
       ORDER BY rank LIMIT 1),
use{i} AS MATERIALIZED (SELECT EXISTS (SELECT 1 FROM nA{i}) AND (
             NOT EXISTS (SELECT 1 FROM nB{i})
             OR (SELECT count(*) FILTER (WHERE team = 0) FROM sel{i})
                < (SELECT count(*) FILTER (WHERE team = 1) FROM sel{i})
             OR ((SELECT count(*) FILTER (WHERE team = 0) FROM sel{i})
                 = (SELECT count(*) FILTER (WHERE team = 1) FROM sel{i})
                 AND (SELECT coin FROM coins WHERE s = {i}) = 0)
           ) AS a),
pick{i} AS MATERIALIZED (
  SELECT {i + 1}::bigint AS pos, doc_id, 0::bigint AS team FROM nA{i}
  WHERE (SELECT a FROM use{i})
  UNION ALL
  SELECT {i + 1}::bigint, doc_id, 1::bigint FROM nB{i}
  WHERE NOT (SELECT a FROM use{i})),
sel{i + 1} AS MATERIALIZED (SELECT doc_id, team FROM sel{i}
            UNION ALL SELECT doc_id, team FROM pick{i})""")
    rounds = ",\n".join(parts)
    final = "\nUNION ALL ".join(
        f"SELECT pos, doc_id, team FROM pick{i}" for i in range(k)
    )
    return f"{rounds}\n{final}\nORDER BY pos"


def _hll_registers_sql() -> str:
    """Integer-SQL replay of the HLL fold over events.user_id (p=12):
    splitmix64 via 32-bit-limb mulmod, then a halving bit-length ladder
    for the leading-zero rank — no floats anywhere."""
    M64 = "18446744073709551616"
    GOLDEN = str(0x9E3779B97F4A7C15)
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)
    ladder = "\n".join(
        f"r{i+1} AS (SELECT reg, CASE WHEN v >= {1 << s} THEN v // {1 << s} ELSE v END AS v,"
        f" bl + CASE WHEN v >= {1 << s} THEN {s} ELSE 0 END AS bl FROM r{i}),"
        for i, s in enumerate((32, 16, 8, 4, 2, 1))
    )
    return f"""
WITH h0 AS (SELECT ((user_id::hugeint + {GOLDEN}) % {M64}) AS x0 FROM events WHERE user_id IS NOT NULL),
h1 AS (SELECT ({_mulmod64("xor(x0::ubigint, x0::ubigint >> 30)::hugeint", MIX1 + "::hugeint")}) AS x1 FROM h0),
h2 AS (SELECT ({_mulmod64("xor(x1::ubigint, x1::ubigint >> 27)::hugeint", MIX2 + "::hugeint")}) AS x2 FROM h1),
hf AS (SELECT xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM h2),
r0 AS (SELECT (h // {1 << 52})::bigint AS reg, (h * 4096) % {M64} AS v, 0 AS bl FROM hf),
{ladder}
rf AS (SELECT reg, bl + CASE WHEN v >= 1 THEN 1 ELSE 0 END AS bitlen FROM r6)
SELECT reg, max(least(64 - bitlen + 1, 53))::bigint AS rank FROM rf GROUP BY reg ORDER BY reg
"""


def _kmv_sql(k: int = 8) -> str:
    """Integer-SQL replay of the KMV bottom-k distinct sketch over
    events.user_id: the same splitmix64 chain as ``_hll_registers_sql``,
    DISTINCT, ORDER BY, LIMIT k — then the (k−1)·2⁶⁴/h₍ₖ₎ estimator
    with the exact small-cardinality branch."""
    M64 = "18446744073709551616"
    GOLDEN = str(0x9E3779B97F4A7C15)
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)
    return f"""
WITH h0 AS (SELECT ((user_id::hugeint + {GOLDEN}) % {M64}) AS x0 FROM events WHERE user_id IS NOT NULL),
h1 AS (SELECT ({_mulmod64("xor(x0::ubigint, x0::ubigint >> 30)::hugeint", MIX1 + "::hugeint")}) AS x1 FROM h0),
h2 AS (SELECT ({_mulmod64("xor(x1::ubigint, x1::ubigint >> 27)::hugeint", MIX2 + "::hugeint")}) AS x2 FROM h1),
hf AS (SELECT xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM h2),
bk AS (SELECT DISTINCT h FROM hf ORDER BY h LIMIT {k}),
s AS (SELECT count(*)::bigint AS n_kept, max(h) AS kth FROM bk)
SELECT n_kept,
       (kth // 4294967296)::bigint AS kth_hi,
       (kth % 4294967296)::bigint AS kth_lo,
       round(CASE WHEN n_kept < {k} THEN n_kept::double
                  ELSE {k - 1} * {M64}.0 / kth::double END, 6) AS est_distinct
FROM s
"""


def _price_model_sql() -> str:
    """SQL replay of the OLS fit: integer moments, then Cramer with the
    SAME fixed-order float det expansion as the engine."""
    from dcs_ray.functions.linreg import det_sql

    p = 4

    def mn(i: int, j: int) -> str:
        return f"m_{min(i, j)}_{max(i, j)}"

    base = [[mn(i, j) for j in range(p)] for i in range(p)]
    det_base = det_sql(base)
    feats = ["intercept", "qty", "disc_pct", "tax_pct"]
    selects = []
    for i, name in enumerate(feats):
        names_i = [
            [f"v_{r}" if j == i else base[r][j] for j in range(p)]
            for r in range(p)
        ]
        selects.append(
            f"SELECT {i} AS ord, '{name}' AS feature,\n"
            f"  round(({det_sql(names_i)}) / ({det_base}), 6) AS coef FROM m"
        )
    xs = ["1", "x1", "x2", "x3"]
    moments = ",\n    ".join(
        f"sum({xs[i]} * {xs[j]})::bigint AS m_{i}_{j}"
        for i in range(p)
        for j in range(i, p)
    )
    vs = ",\n    ".join(f"sum({xs[i]} * y)::bigint AS v_{i}" for i in range(p))
    return f"""
WITH f AS (
  SELECT round(l_quantity)::bigint AS x1,
         round(l_discount * 100)::bigint AS x2,
         round(l_tax * 100)::bigint AS x3,
         round(l_extendedprice * 100)::bigint AS y
  FROM lineitem),
m AS (SELECT
    {moments},
    {vs}
  FROM f)
SELECT feature, coef FROM (
{chr(10).join("UNION ALL " + s if n else s for n, s in enumerate(selects))}
) ORDER BY ord
"""


def _logreg_sql(n_iter: int = 5, lr: float = 1e-3) -> str:
    """Every GD iteration replayed in chained CTEs: z and the update use
    the engine's left-associated expression tree; coefficients compared
    after the final round(·, 6)."""
    parts = [
        f"""tok AS ({_TOK}),
agg AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN term IN ('the','a','of','to','and','in','is','it') THEN 1 ELSE 0 END) AS n_stop
  FROM tok GROUP BY doc_id),
f AS (
  SELECT coalesce(a.n_tokens, 0)::double AS x1,
         coalesce(a.n_stop, 0)::double AS x2,
         CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END AS y
  FROM documents d LEFT JOIN agg a USING (doc_id)),
nn AS (SELECT count(*)::double AS n FROM f),
b0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2)"""
    ]
    for t in range(n_iter):
        parts.append(
            f"""g{t} AS (
  SELECT sum(1.0 * r) AS g0, sum(x1 * r) AS g1, sum(x2 * r) AS g2 FROM (
    SELECT x1, x2,
           (1.0 / (1.0 + exp(-(((b.b0 * 1.0) + (b.b1 * x1)) + (b.b2 * x2)))) - y) AS r
    FROM f, b{t} b)),
b{t + 1} AS (
  SELECT (b.b0 - {lr!r} * (g.g0 / (SELECT n FROM nn))) AS b0,
         (b.b1 - {lr!r} * (g.g1 / (SELECT n FROM nn))) AS b1,
         (b.b2 - {lr!r} * (g.g2 / (SELECT n FROM nn))) AS b2
  FROM b{t} b, g{t} g)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT feature, coef FROM (
  SELECT 0 AS ord, 'intercept' AS feature, round(b0, 6) AS coef FROM b{n_iter}
  UNION ALL SELECT 1, 'n_tokens', round(b1, 6) FROM b{n_iter}
  UNION ALL SELECT 2, 'n_stop', round(b2, 6) FROM b{n_iter}
) ORDER BY ord"""
    )


def _corr_sql() -> str:
    """SQL replay of the correlation fold: integer moments, then the
    engine's exact float expression per pair."""
    cols = ["qty", "disc_pct", "tax_pct", "price_usd"]
    p = len(cols)
    moments = ",\n    ".join(
        [f"sum(x{i})::bigint AS s_{i}" for i in range(p)]
        + [
            f"sum(x{i} * x{j})::bigint AS q_{i}_{j}"
            for i in range(p)
            for j in range(i, p)
        ]
    )
    selects = []
    for i in range(p):
        for j in range(i + 1, p):
            num = f"((n::double * q_{i}_{j}::double) - (s_{i}::double * s_{j}::double))"
            da = f"sqrt((n::double * q_{i}_{i}::double) - (s_{i}::double * s_{i}::double))"
            db = f"sqrt((n::double * q_{j}_{j}::double) - (s_{j}::double * s_{j}::double))"
            selects.append(
                f"SELECT '{cols[i]}' AS col_a, '{cols[j]}' AS col_b,\n"
                f"  round({num} / ({da} * {db}), 6) AS corr FROM m"
            )
    body = "\nUNION ALL ".join(selects)
    return f"""
WITH f AS (
  SELECT round(l_quantity)::bigint AS x0,
         round(l_discount * 100)::bigint AS x1,
         round(l_tax * 100)::bigint AS x2,
         round(l_extendedprice)::bigint AS x3
  FROM lineitem),
m AS (SELECT count(*)::bigint AS n,
    {moments}
  FROM f)
SELECT * FROM (
{body}
) ORDER BY col_a, col_b
"""


def _kmeans_parts(k: int = 4, n_iter: int = 3, dim: int = 64) -> list[str]:
    """Shared CTE chain for the k-means replays: seeding + per-iteration
    distance / argmin / mean steps, ending at centroids ``c{n_iter}``."""
    parts = [
        f"""e AS MATERIALIZED (
  SELECT vec_id, i.i AS dim, embedding[i.i]::double AS v
  FROM embeddings, (SELECT unnest(range(1, {dim + 1})) AS i) i),
seeds AS (
  SELECT vec_id, (row_number() OVER (ORDER BY vec_id) - 1)::bigint AS cid
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})),
c0 AS MATERIALIZED (SELECT s.cid, e.dim, e.v FROM e JOIN seeds s USING (vec_id))"""
    ]
    for t in range(n_iter):
        parts.append(
            f"""d{t} AS MATERIALIZED (
  SELECT e.vec_id, c.cid, sum((e.v - c.v) * (e.v - c.v)) AS dist
  FROM e JOIN c{t} c USING (dim) GROUP BY e.vec_id, c.cid),
a{t} AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
    FROM d{t}) WHERE rn = 1),
c{t + 1} AS MATERIALIZED (
  SELECT a.cid, e.dim, sum(e.v) / count(*) AS v
  FROM e JOIN a{t} a USING (vec_id) GROUP BY a.cid, e.dim
  UNION ALL
  SELECT c.cid, c.dim, c.v FROM c{t} c
  WHERE c.cid NOT IN (SELECT DISTINCT cid FROM a{t}))"""
        )
    return parts


def _kmeans_sql(k: int = 4, n_iter: int = 3, dim: int = 64) -> str:
    """k-means replay: long-form embeddings, per-iteration distance /
    argmin / mean CTEs; sizes from the final assignment."""
    parts = _kmeans_parts(k, n_iter, dim)
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
sz AS (SELECT cid, count(*)::bigint AS n FROM a{n_iter - 1} GROUP BY cid)
SELECT c.cid, coalesce(z.n, 0)::bigint AS n_members, c.dim,
       round(c.v, 6) AS centroid
FROM c{n_iter} c LEFT JOIN sz z USING (cid)
ORDER BY c.cid, c.dim"""
    )


def _kmeans_db_sql(k: int = 4, n_iter: int = 3, dim: int = 64) -> str:
    """Davies–Bouldin replay: one more assignment pass against the
    FINAL centroids c{n_iter}, per-cluster mean member distance,
    centroid-pair separations, the worst (S_i+S_j)/M_ij term per
    cluster, and their mean (mirrors ``functions/kmeans.davies_bouldin``)."""
    n = n_iter
    parts = _kmeans_parts(k, n_iter, dim)
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
df AS MATERIALIZED (
  SELECT e.vec_id, c.cid, sum((e.v - c.v) * (e.v - c.v)) AS dist
  FROM e JOIN c{n} c USING (dim) GROUP BY e.vec_id, c.cid),
af AS MATERIALIZED (
  SELECT vec_id, cid, dist FROM (
    SELECT vec_id, cid, dist,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
    FROM df) WHERE rn = 1),
sc AS (SELECT cid, count(*)::bigint AS n_members,
              sum(sqrt(dist)) / count(*) AS s FROM af GROUP BY cid),
mm AS (SELECT a.cid AS ci, b.cid AS cj,
              sqrt(sum((a.v - b.v) * (a.v - b.v))) AS m
       FROM c{n} a JOIN c{n} b USING (dim)
       WHERE a.cid <> b.cid GROUP BY a.cid, b.cid),
dbt AS (SELECT sa.cid, sa.n_members, sa.s,
               max((sa.s + sb.s) / mm.m) AS term
        FROM sc sa JOIN mm ON mm.ci = sa.cid JOIN sc sb ON sb.cid = mm.cj
        GROUP BY sa.cid, sa.n_members, sa.s)
SELECT cid, n_members, round(s, 6) AS scatter, round(term, 6) AS db_term,
       round((SELECT sum(term) / count(*) FROM dbt), 6) AS db_index
FROM dbt ORDER BY cid"""
    )


def _kmeans_ch_sql(k: int = 4, n_iter: int = 3, dim: int = 64) -> str:
    """Calinski–Harabasz replay: final-centroid assignment pass (df/af
    as in the DB oracle), W = Σ assigned squared distance, grand mean
    per dim, B = Σ n_i‖c_i − x̄‖², CH = (B/(k−1))/(W/(N−k)) over
    NON-EMPTY clusters (mirrors ``functions/kmeans.calinski_harabasz``)."""
    n = n_iter
    parts = _kmeans_parts(k, n_iter, dim)
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
df AS MATERIALIZED (
  SELECT e.vec_id, c.cid, sum((e.v - c.v) * (e.v - c.v)) AS dist
  FROM e JOIN c{n} c USING (dim) GROUP BY e.vec_id, c.cid),
af AS MATERIALIZED (
  SELECT vec_id, cid, dist FROM (
    SELECT vec_id, cid, dist,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
    FROM df) WHERE rn = 1),
wss AS (SELECT sum(dist) AS w, count(*)::bigint AS n FROM af),
gm AS (SELECT dim, sum(v) / count(*) AS v FROM e GROUP BY dim),
sz AS (SELECT cid, count(*)::bigint AS n FROM af GROUP BY cid),
cd AS (SELECT c.cid, sum((c.v - g.v) * (c.v - g.v)) AS d2
       FROM c{n} c JOIN gm g USING (dim) GROUP BY c.cid),
bss AS (SELECT sum(z.n * cd.d2) AS b, count(*)::bigint AS k FROM sz z JOIN cd USING (cid))
SELECT wss.n AS n_points, bss.k AS k_clusters,
       round(wss.w, 6) + 0.0 AS within_ss,
       round(bss.b, 6) + 0.0 AS between_ss,
       round((bss.b / (bss.k - 1)) / (wss.w / (wss.n - bss.k)), 6) + 0.0 AS ch_index
FROM wss, bss"""
    )


def _kmeans_sil_sql(k: int = 4, n_iter: int = 3, dim: int = 64) -> str:
    """Simplified-silhouette replay: the rn=1 (assigned) and rn=2
    (runner-up) rows of the final-centroid distance CTE give a and b
    per point; s = (b−a)/max(a,b) with the 0/0 → 0 guard, averaged per
    cluster and overall."""
    n = n_iter
    parts = _kmeans_parts(k, n_iter, dim)
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
df AS MATERIALIZED (
  SELECT e.vec_id, c.cid, sum((e.v - c.v) * (e.v - c.v)) AS dist
  FROM e JOIN c{n} c USING (dim) GROUP BY e.vec_id, c.cid),
r AS MATERIALIZED (
  SELECT vec_id, cid, dist,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
  FROM df),
s AS (SELECT r1.vec_id, r1.cid, sqrt(r1.dist) AS a, sqrt(r2.dist) AS b
      FROM r r1 JOIN r r2 ON r1.vec_id = r2.vec_id AND r1.rn = 1 AND r2.rn = 2),
v AS (SELECT cid,
             CASE WHEN greatest(a, b) > 0 THEN (b - a) / greatest(a, b)
                  ELSE 0.0 END AS s
      FROM s),
percl AS (SELECT cid, count(*)::bigint AS n_members, sum(s) / count(*) AS ms
          FROM v GROUP BY cid),
ov AS (SELECT sum(s) / count(*) AS o FROM v)
SELECT cid, n_members, round(ms, 6) + 0.0 AS mean_silhouette,
       round((SELECT o FROM ov), 6) + 0.0 AS overall_silhouette
FROM percl ORDER BY cid"""
    )


def _pca_sql(n_iter: int = 10, dim: int = 64) -> str:
    """PCA replay: long-form embeddings, covariance via a self-join,
    chained matvec/normalize CTEs with the engine's expression tree."""
    parts = [
        f"""el AS MATERIALIZED (
  SELECT vec_id, i.i AS dim, embedding[i.i]::double AS v
  FROM embeddings, (SELECT unnest(range(1, {dim + 1})) AS i) i),
nn AS (SELECT count(*)::double AS n FROM embeddings),
mu AS MATERIALIZED (
  SELECT dim, sum(v) / (SELECT n FROM nn) AS m FROM el GROUP BY dim),
q AS MATERIALIZED (
  SELECT a.dim AS i, b.dim AS j, sum(a.v * b.v) AS q
  FROM el a JOIN el b USING (vec_id) GROUP BY a.dim, b.dim),
cov AS MATERIALIZED (
  SELECT q.i, q.j, (q.q / (SELECT n FROM nn)) - (ma.m * mb.m) AS v
  FROM q JOIN mu ma ON ma.dim = q.i JOIN mu mb ON mb.dim = q.j),
w0 AS (SELECT dim, (1.0 / sqrt({dim}.0)) AS v FROM mu)"""
    ]
    for t in range(n_iter):
        parts.append(
            f"""u{t} AS MATERIALIZED (
  SELECT c.i AS dim, sum(c.v * w.v) AS u
  FROM cov c JOIN w{t} w ON c.j = w.dim GROUP BY c.i),
nrm{t} AS (SELECT sqrt(sum(u * u)) AS s FROM u{t}),
w{t + 1} AS MATERIALIZED (
  SELECT dim, u / (SELECT s FROM nrm{t}) AS v FROM u{t})"""
        )
    T = n_iter
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
lead AS (SELECT v FROM w{T} ORDER BY abs(v) DESC, dim ASC LIMIT 1),
sgn AS (SELECT CASE WHEN (SELECT v FROM lead) < 0.0 THEN -1.0 ELSE 1.0 END AS s),
vf AS MATERIALIZED (SELECT dim, v * (SELECT s FROM sgn) AS v FROM w{T}),
cv AS (SELECT c.i AS dim, sum(c.v * f.v) AS u
       FROM cov c JOIN vf f ON c.j = f.dim GROUP BY c.i),
eig AS (SELECT sum(f.v * c.u) AS e FROM vf f JOIN cv c USING (dim))
SELECT dim, round(v, 6) AS loading,
       round((SELECT e FROM eig), 6) AS eigenvalue
FROM vf ORDER BY dim"""
    )


def _term_hash64_sql() -> str:
    """Integer-SQL replay of ``sketches._hash64_column`` for ASCII
    string terms up to 16 bytes (2 hash words — corpus tokens are <=8):
    FNV-ish (h ^ word) * P per little-endian 8-byte word, length salt,
    splitmix64 finalizer. Produces CTEs ``th(term, h)`` given a CTE
    ``terms(term)``."""
    H0 = str(0xCBF29CE484222325)
    P = str(0x100000001B3)
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)
    M64 = "18446744073709551616"

    def word(w: int) -> str:
        return " + ".join(
            f"CASE WHEN ln > {8 * w + i} THEN ascii(substr(term, {8 * w + i + 1}, 1))::hugeint * {256 ** i} ELSE 0 END"
            for i in range(8)
        )

    return f"""
tw AS (SELECT term, length(term) AS ln, ({word(0)}) AS w0, ({word(1)}) AS w1 FROM terms),
f0 AS (SELECT term, ln, w1, CASE WHEN ln > 0 THEN ({_mulmod64(f"xor({H0}::ubigint, w0::ubigint)::hugeint", P + "::hugeint")}) ELSE {H0}::hugeint END AS h FROM tw),
f1 AS (SELECT term, ln, CASE WHEN ln > 8 THEN ({_mulmod64("xor(h::ubigint, w1::ubigint)::hugeint", P + "::hugeint")}) ELSE h END AS h FROM f0),
fl AS (SELECT term, (h + ln + 11400714819323198485) % {M64} AS x0 FROM f1),
m1 AS (SELECT term, ({_mulmod64("xor(x0::ubigint, x0::ubigint >> 30)::hugeint", MIX1 + "::hugeint")}) AS x1 FROM fl),
m2 AS (SELECT term, ({_mulmod64("xor(x1::ubigint, x1::ubigint >> 27)::hugeint", MIX2 + "::hugeint")}) AS x2 FROM m1),
th AS (SELECT term, xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM m2)"""


def _strhash64_sql(nwords: int) -> str:
    """Generalized ``_term_hash64_sql``: integer-SQL replay of
    ``sketches._hash64_column`` for ASCII strings up to ``nwords * 8``
    bytes — FNV-ish (h ^ word) * P per little-endian 8-byte word,
    length salt, splitmix64 finalizer. Produces CTEs ending in
    ``th(term, h)`` given a CTE ``terms(term)``."""
    H0 = str(0xCBF29CE484222325)
    P = str(0x100000001B3)
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)
    M64 = "18446744073709551616"

    def word(w: int) -> str:
        return " + ".join(
            f"CASE WHEN ln > {8 * w + i} THEN ascii(substr(term, {8 * w + i + 1}, 1))::hugeint * {256 ** i} ELSE 0 END"
            for i in range(8)
        )

    wcols = ", ".join(f"({word(w)}) AS w{w}" for w in range(nwords))
    ctes = [f"tw AS (SELECT term, length(term) AS ln, {wcols} FROM terms)"]
    prev = "tw"
    for w in range(nwords):
        rest = ", ".join(f"w{j}" for j in range(w + 1, nwords))
        rest = (", " + rest) if rest else ""
        if w == 0:
            expr = (
                f"CASE WHEN ln > 0 THEN "
                f"({_mulmod64(f'xor({H0}::ubigint, w0::ubigint)::hugeint', P + '::hugeint')})"
                f" ELSE {H0}::hugeint END"
            )
        else:
            expr = (
                f"CASE WHEN ln > {8 * w} THEN "
                f"({_mulmod64(f'xor(h::ubigint, w{w}::ubigint)::hugeint', P + '::hugeint')})"
                f" ELSE h END"
            )
        ctes.append(f"f{w} AS (SELECT term, ln{rest}, {expr} AS h FROM {prev})")
        prev = f"f{w}"
    ctes.append(
        f"fl AS (SELECT term, (h + ln + 11400714819323198485) % {M64} AS x0 FROM {prev})"
    )
    ctes.append(
        f"m1 AS (SELECT term, ({_mulmod64('xor(x0::ubigint, x0::ubigint >> 30)::hugeint', MIX1 + '::hugeint')}) AS x1 FROM fl)"
    )
    ctes.append(
        f"m2 AS (SELECT term, ({_mulmod64('xor(x1::ubigint, x1::ubigint >> 27)::hugeint', MIX2 + '::hugeint')}) AS x2 FROM m1)"
    )
    ctes.append(
        "th AS (SELECT term, xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM m2)"
    )
    return ",\n".join(ctes)


def _cms_heavy_hitters_sql(k: int = 3, depth: int = 4, width: int = 4096) -> str:
    """Bit-exact integer-SQL replay of ``cms_heavy_hitters`` over
    events.event_type: candidates are all distinct values (gate scale),
    the merged sketch equals a single-pass fold (sum-merge is exact)."""
    import numpy as np

    from dcs_ray.functions.sketches import _splitmix64

    GOLDEN = str(0x9E3779B97F4A7C15)
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)
    M64 = "18446744073709551616"
    salts = ", ".join(
        f"({r}, {int(s)}::hugeint)"
        for r, s in enumerate(_splitmix64(np.arange(1, depth + 1, dtype=np.uint64)))
    )
    return f"""
WITH tok AS (SELECT event_type AS term FROM events WHERE event_type IS NOT NULL),
terms AS (SELECT DISTINCT term FROM tok),
{_term_hash64_sql()},
cnt AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
salts(r, s) AS (VALUES {salts}),
g0 AS (SELECT term, r, (xor(h::ubigint, s::ubigint)::hugeint + {GOLDEN}) % {M64} AS x0 FROM th, salts),
g1 AS (SELECT term, r, ({_mulmod64("xor(x0::ubigint, x0::ubigint >> 30)::hugeint", MIX1 + "::hugeint")}) AS x1 FROM g0),
g2 AS (SELECT term, r, ({_mulmod64("xor(x1::ubigint, x1::ubigint >> 27)::hugeint", MIX2 + "::hugeint")}) AS x2 FROM g1),
gi AS (SELECT term, r, (xor(x2::ubigint, x2::ubigint >> 31)::hugeint % {width})::bigint AS col FROM g2),
counters AS (SELECT r, col, sum(c)::bigint AS total FROM gi JOIN cnt USING (term) GROUP BY r, col),
est AS (SELECT gi.term, min(counters.total)::bigint AS n_est
        FROM gi JOIN counters USING (r, col) GROUP BY gi.term)
SELECT term AS event_type, n_est FROM est
ORDER BY n_est DESC, event_type ASC LIMIT {k}
"""


_CURATE_WEIGHTS = {"en": 3, "de": 2, "es": 2, "fr": 1, "zh": 1}


_CURATE_TOTAL = 250


def _grouped_hll_sql(p: int = 8) -> str:
    """Per-group HLL register fold + estimator over events
    (event_type, user_id) in integer SQL — the grouped analogue of
    ``_hll_registers_sql``."""
    M64 = "18446744073709551616"
    GOLDEN = str(0x9E3779B97F4A7C15)
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)
    m = 1 << p
    cap = 64 - p + 1
    ladder = "\n".join(
        f"r{i+1} AS (SELECT event_type, reg, CASE WHEN v >= {1 << s} THEN v // {1 << s} ELSE v END AS v,"
        f" bl + CASE WHEN v >= {1 << s} THEN {s} ELSE 0 END AS bl FROM r{i}),"
        for i, s in enumerate((32, 16, 8, 4, 2, 1))
    )
    return f"""
WITH h0 AS (SELECT event_type, ((user_id::hugeint + {GOLDEN}) % {M64}) AS x0
            FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
h1 AS (SELECT event_type, ({_mulmod64("xor(x0::ubigint, x0::ubigint >> 30)::hugeint", MIX1 + "::hugeint")}) AS x1 FROM h0),
h2 AS (SELECT event_type, ({_mulmod64("xor(x1::ubigint, x1::ubigint >> 27)::hugeint", MIX2 + "::hugeint")}) AS x2 FROM h1),
hf AS (SELECT event_type, xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM h2),
r0 AS (SELECT event_type, (h // {1 << (64 - p)})::bigint AS reg, (h * {m}) % {M64} AS v, 0 AS bl FROM hf),
{ladder}
rf AS (SELECT event_type, reg, bl + CASE WHEN v >= 1 THEN 1 ELSE 0 END AS bitlen FROM r6),
regs AS (SELECT event_type, reg, max(least(64 - bitlen + 1, {cap}))::bigint AS rank
         FROM rf GROUP BY 1, 2),
s AS (SELECT event_type, count(*) AS nz, coalesce(sum(power(2.0, -rank)), 0.0) AS snz
      FROM regs GROUP BY 1),
c AS (SELECT event_type, ({m} - nz) AS zeros, ({m} - nz) * 1.0 + snz AS ssum FROM s),
e AS (SELECT event_type, zeros,
             (0.7213 / (1 + 1.079 / {m}.0)) * {m}.0 * {m}.0 / ssum AS est FROM c)
SELECT event_type,
       round(CASE WHEN est <= 2.5 * {m} AND zeros > 0
             THEN {m}.0 * ln({m}.0 / zeros) ELSE est END, 6) AS approx_distinct
FROM e ORDER BY event_type
"""


def _hll_sets_sql(p: int, key_a: str, key_b: str) -> str:
    """HLL set algebra (|A|, |B|, |A∪B|, inclusion–exclusion |A∩B|)
    over events user_id slices, replayed in integer SQL: the grouped
    register chain filtered to the two keys, union registers =
    per-register max, the standard estimator applied three times."""
    M64 = "18446744073709551616"
    GOLDEN = str(0x9E3779B97F4A7C15)
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)
    m = 1 << p
    cap = 64 - p + 1
    ladder = "\n".join(
        f"r{i+1} AS (SELECT event_type, reg, CASE WHEN v >= {1 << s} THEN v // {1 << s} ELSE v END AS v,"
        f" bl + CASE WHEN v >= {1 << s} THEN {s} ELSE 0 END AS bl FROM r{i}),"
        for i, s in enumerate((32, 16, 8, 4, 2, 1))
    )

    def est(rel: str) -> str:
        return f"""(SELECT CASE WHEN est <= 2.5 * {m} AND zeros > 0
                 THEN {m}.0 * ln({m}.0 / zeros) ELSE est END FROM
      (SELECT ({m} - count(*)) AS zeros,
              (0.7213 / (1 + 1.079 / {m}.0)) * {m}.0 * {m}.0 /
                (({m} - count(*)) * 1.0 + coalesce(sum(power(2.0, -rank)), 0.0)) AS est
       FROM {rel}))"""

    return f"""
WITH h0 AS (SELECT event_type, ((user_id::hugeint + {GOLDEN}) % {M64}) AS x0
            FROM events WHERE user_id IS NOT NULL
              AND event_type IN ('{key_a}', '{key_b}')),
h1 AS (SELECT event_type, ({_mulmod64("xor(x0::ubigint, x0::ubigint >> 30)::hugeint", MIX1 + "::hugeint")}) AS x1 FROM h0),
h2 AS (SELECT event_type, ({_mulmod64("xor(x1::ubigint, x1::ubigint >> 27)::hugeint", MIX2 + "::hugeint")}) AS x2 FROM h1),
hf AS (SELECT event_type, xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM h2),
r0 AS (SELECT event_type, (h // {1 << (64 - p)})::bigint AS reg, (h * {m}) % {M64} AS v, 0 AS bl FROM hf),
{ladder}
rf AS (SELECT event_type, reg, bl + CASE WHEN v >= 1 THEN 1 ELSE 0 END AS bitlen FROM r6),
regs AS MATERIALIZED (
  SELECT event_type, reg, max(least(64 - bitlen + 1, {cap}))::bigint AS rank
  FROM rf GROUP BY 1, 2),
ra AS (SELECT reg, rank FROM regs WHERE event_type = '{key_a}'),
rb AS (SELECT reg, rank FROM regs WHERE event_type = '{key_b}'),
ru AS (SELECT reg, max(rank) AS rank
       FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY reg),
e AS (SELECT {est("ra")} AS ea, {est("rb")} AS eb, {est("ru")} AS eu)
SELECT '{key_a}' AS key_a, '{key_b}' AS key_b,
       round(ea, 6) AS approx_a, round(eb, 6) AS approx_b,
       round(eu, 6) AS approx_union,
       round(greatest(0.0, ea + eb - eu), 6) AS approx_intersection
FROM e
"""


_TUNE_GRID = [(0.5, 0.75), (0.9, 0.4), (1.2, 0.0), (1.2, 0.75), (1.5, 0.75), (2.0, 1.0)]


_BPE_N_MERGES = 50


def _bpe_merge_chain_ctes(n_merges: int) -> tuple[str, str]:
    """(CTE fragment, merge-table union) replaying BPE training
    (Sennrich '16) as ``n_merges`` generated rounds — the k-core /
    PageRank generated-CTE house pattern. Each word's tokenization is
    a string of ``chr(1)||token||chr(2)`` cells, so the round's merge
    is one fully-delimited ``replace()`` (left-to-right non-overlap =
    the engine's greedy within-word walk; both sentinels prevent
    token-prefix/suffix false matches). Each round recounts pairs
    fresh — exact, like the engine's incrementally-maintained stats —
    and picks argmax with ties to the lexicographically smallest
    (left, right), DuckDB's binary varchar order = Python's tuple
    order on these ASCII tokens."""
    parts = [
        "wc AS MATERIALIZED (SELECT term AS word, count(*)::bigint AS n "
        "FROM tok GROUP BY term)",
        "w0 AS MATERIALIZED (SELECT word, n, "
        "array_to_string(list_transform(generate_series(1, length(word) - 1), "
        "i -> chr(1) || word[i] || chr(2)), '') "
        "|| chr(1) || word[length(word)] || '</w>' || chr(2) AS toks FROM wc)",
    ]
    for r in range(n_merges):
        parts.append(f"""p{r} AS (
  SELECT pr[1] AS lt, pr[2] AS rt, sum(n)::bigint AS cnt
  FROM (SELECT n, unnest(list_transform(generate_series(1, len(ts) - 2),
                                        i -> [ts[i][2:], ts[i+1][2:]])) AS pr
        FROM (SELECT n, string_split(toks, chr(2)) AS ts FROM w{r}))
  GROUP BY lt, rt)""")
        parts.append(
            f"b{r} AS MATERIALIZED (SELECT lt, rt, cnt FROM p{r} "
            "ORDER BY cnt DESC, lt, rt LIMIT 1)"
        )
        parts.append(f"""w{r + 1} AS MATERIALIZED (
  SELECT word, n, replace(toks,
      chr(1) || (SELECT lt FROM b{r}) || chr(2) || chr(1)
              || (SELECT rt FROM b{r}) || chr(2),
      chr(1) || (SELECT lt FROM b{r}) || (SELECT rt FROM b{r}) || chr(2)
    ) AS toks FROM w{r})""")
    union = "\nUNION ALL ".join(
        f"SELECT {r} AS rank, lt, rt, cnt FROM b{r}" for r in range(n_merges)
    )
    return ",\n".join(parts), union


def _bpe_merges_sql() -> str:
    ctes, union = _bpe_merge_chain_ctes(_BPE_N_MERGES)
    return f"""
WITH tok AS ({_TOK}),
{ctes}
SELECT rank::bigint AS rank, lt AS "left", rt AS "right",
       cnt AS pair_count
FROM ({union}) ORDER BY rank
"""


def _bpe_subtoken_count_sql() -> str:
    """Merge chain + a recursive-CTE replay of ``encode_word``'s
    min-rank walk: each step merges the LEFTMOST adjacent pair of
    MINIMUM merge rank (ORDER BY rank, i LIMIT 1) until no adjacent
    pair is in the table; per-doc count = sum of final lengths over
    the doc's word occurrences. Fully self-contained — the merge
    table itself is derived by the training replay, so this gate
    covers train AND encode end-to-end."""
    ctes, union = _bpe_merge_chain_ctes(_BPE_N_MERGES)
    return f"""
WITH RECURSIVE tok AS ({_TOK}),
{ctes},
m AS MATERIALIZED (SELECT rank, lt, rt FROM ({union})),
words AS (SELECT DISTINCT word FROM wc),
ml AS MATERIALIZED (SELECT list(lt || chr(1) || rt ORDER BY rank) AS pl FROM m),
enc(word, ts) AS (
  SELECT word,
         list_append(list_transform(generate_series(1, length(word) - 1),
                                    i -> word[i]),
                     word[length(word)] || '</w>')
  FROM words
  UNION ALL
  -- one step of encode_word: merge the LEFTMOST adjacent pair with
  -- the MINIMUM rank ([rank, i] lexicographic list_sort; pl is in
  -- rank order so list_position IS the 1-based rank; 0 = not found
  -- in this DuckDB). A JOIN against the derived m here silently
  -- matches nothing inside the recursion (DuckDB 1.0 quirk) — the
  -- cross-joined single-row pair-list is the shape that works.
  SELECT word, list_concat(list_concat(ts[1:bj-1], [ts[bj] || ts[bj+1]]),
                           ts[bj+2:]) AS ts
  FROM (
    SELECT e.word, e.ts,
           list_sort(list_filter(
             list_transform(generate_series(1, len(e.ts) - 1),
               i -> [list_position(ml.pl, e.ts[i] || chr(1) || e.ts[i+1]), i]),
             x -> x[1] IS NOT NULL AND x[1] > 0))[1][2] AS bj
    FROM enc e, ml)
  WHERE bj IS NOT NULL
),
fin AS (
  SELECT word, len(ts)::bigint AS n_sub
  FROM enc, ml
  WHERE len(list_filter(generate_series(1, len(ts) - 1),
                        i -> list_contains(ml.pl, ts[i] || chr(1) || ts[i+1]))) = 0),
per_doc AS (
  SELECT t.doc_id, sum(f.n_sub)::bigint AS n
  FROM tok t JOIN fin f ON t.term = f.word GROUP BY t.doc_id)
SELECT d.doc_id, coalesce(p.n, 0)::bigint AS n_subtokens
FROM documents d LEFT JOIN per_doc p USING (doc_id) ORDER BY doc_id
"""


def _docs_en(sf_dir: str) -> ray.data.Dataset:
    import pyarrow.compute as pc

    return _docs(sf_dir).map_batches(
        lambda b: b.filter(pc.equal(b["lang"], "en")), batch_format="pyarrow"
    )


def _link_edges_ds(sf_dir: str):
    """Shared head of the web-graph queries: pages → fused newest-crawl
    edge extraction (per-batch extraction BEFORE the newest-wins
    shuffle, so the exchange carries edge rows, never html)."""
    from dcs_ray.functions.links import extract_link_edges_latest
    from dcs_ray.sources.pages import read_pages

    return extract_link_edges_latest(read_pages(sf_dir))


def _pairs_top100(counts) -> pa.Table:
    """Global top-100 of a (id_a, id_b, n_shared) pair-count Dataset by
    (n_shared desc, id_a, id_b): per-block local top-100 before the
    driver merge — the driver never sees more than 100 rows per block."""
    order = [
        ("n_shared", "descending"),
        ("id_a", "ascending"),
        ("id_b", "ascending"),
    ]

    def local_top(b: pa.Table) -> pa.Table:
        return b.sort_by(order).slice(0, 100)

    parts = [
        pa.table(b)
        for b in counts.map_batches(local_top, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    merged = (
        pa.concat_tables(parts)
        if parts
        else pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "n_shared": pa.array([], pa.int64()),
            }
        )
    )
    return merged.sort_by(order).slice(0, 100)


def _link_pair_edges(sf_dir: str):
    """Link edges renamed to the (id_a, id_b) pair schema the
    undirected graph kernels consume."""
    return _link_edges_ds(sf_dir).map_batches(
        lambda b: pa.table({"id_a": b["src"], "id_b": b["dst"]}),
        batch_format="pyarrow",
    )


def _pagerank_index_dir(sf_dir: str) -> str:
    """Body index whose doc_meta ``prior`` is the COMPUTED link-graph
    PageRank (``1 + N·rank``, 1.0 for docs outside the graph) — the
    full web chain for dcs's F7 static pre-rank: crawl → links →
    pagerank → prior baked into doc_meta at build → multiplied into
    BM25 inside each shard task. Rank vector is node-sized: broadcast
    once via ``ray.put`` and probed with searchsorted per build batch."""
    from dcs_ray.functions.links import link_pagerank
    from dcs_ray.index import IndexConfig, build_index

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(_CACHE_ROOT, f"{name}_wordspr")
    if not os.path.exists(os.path.join(out, "MANIFEST.json")):
        ranks = link_pagerank(_link_edges_ds(sf_dir), n_iter=5, damping=0.85)
        nodes = ranks["node"].to_numpy()
        pri = 1.0 + len(nodes) * ranks["rank"].to_numpy()
        nref, pref = ray.put(nodes), ray.put(pri)

        def with_prior(b: pa.Table, _n=nref, _p=pref) -> pa.Table:
            nd, pv = ray.get(_n), ray.get(_p)
            ids = b["doc_id"].to_numpy()
            pos = np.clip(np.searchsorted(nd, ids), 0, max(len(nd) - 1, 0))
            found = nd[pos] == ids if len(nd) else np.zeros(len(ids), bool)
            prior = np.where(found, pv[pos] if len(nd) else 1.0, 1.0)
            return b.append_column("prior", pa.array(prior, pa.float64()))

        docs = read_parquet_sized(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
        ).map_batches(with_prior, batch_format="pyarrow")
        conf = IndexConfig(
            num_partitions=8,
            num_shards=2,
            mode="words",
            id_col="doc_id",
            dedup_latest=False,
            meta_cols=("source", "prior"),
        )
        build_index(docs, out, conf)
    return out


def _crawl_snapshot(sf_dir: str, side: str) -> ray.data.Dataset:
    """Deterministic two-snapshot synthesis from documents (pure
    per-row functions, fully vectorized — replayed by the oracle):
    old = urls with doc_id % 11 != 3 (the %11==3 rows are 'added'
    later), content suffixed ' legacy' for doc_id % 7 == 0 (→ those
    urls read 'changed'); new = urls with doc_id % 13 != 5 (the
    %13==5 rows were 'removed'), current content."""

    def mk(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = b["doc_id"].to_numpy()
        keep = (ids % 11 != 3) if side == "old" else (ids % 13 != 5)
        t = b.filter(pa.array(keep))
        ids2 = t["doc_id"].to_numpy()
        urls = pa.array(
            np.char.add(
                "url://doc/", np.char.zfill(ids2.astype("U20"), 8)
            ).tolist(),
            pa.string(),
        )
        text = t["text"].combine_chunks().cast(pa.string())
        if side == "old":
            suffix = pa.array(
                np.where(ids2 % 7 == 0, " legacy", "").tolist(), pa.string()
            )
            text = pc.binary_join_element_wise(text, suffix, "")
        return pa.table({"url": urls, "text": text})

    return _docs(sf_dir).map_batches(mk, batch_format="pyarrow")


_MIX_WEIGHTS = {"en": 4, "de": 3, "es": 2, "zh": 1}  # fr dropped


_MIX_TOTAL = 200


def _li_rev1e4(b: pa.Table, extra: dict | None = None) -> pa.Table:
    """Shared lineitem money kernel: revenue in exact integer 1e-4
    units (price cents × (100 - discount pct)), the same fixed-point
    convention every TPC-H-style gate in this file uses."""
    p = np.round(b["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    d = np.round(b["l_discount"].to_numpy() * 100).astype(np.int64)
    cols = dict(extra or {})
    cols["rev1e4"] = pa.array(p * (100 - d), pa.int64())
    return pa.table(cols)


def _nation_keys(sf_dir: str) -> dict[str, int]:
    """name → nationkey for the (25-row) nation dim, read once on the
    driver — the standard tiny-dim shortcut every TPC-H gate uses."""
    t = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    return dict(
        zip(t["n_name"].to_pylist(), (int(x) for x in t["n_nationkey"].to_pylist()))
    )


def _kcore_sql(k: int = 2, rounds: int = 4) -> str:
    """Generated peel-round CTE chain replaying ``_q_kcore`` exactly:
    u0 = distinct undirected pairs; per round a degree CTE, an alive
    CTE (deg ≥ k), and the alive-filtered next edge set."""
    ctes = [
        "u0 AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b "
        "FROM edges WHERE src <> dst)"
    ]
    for i in range(rounds + 1):
        ctes.append(
            f"d{i} AS (SELECT node, count(*)::bigint AS deg FROM "
            f"(SELECT a AS node FROM u{i} UNION ALL SELECT b AS node FROM u{i}) "
            f"GROUP BY node)"
        )
        if i < rounds:
            ctes.append(f"a{i} AS (SELECT node FROM d{i} WHERE deg >= {k})")
            ctes.append(
                f"u{i+1} AS (SELECT a, b FROM u{i} "
                f"WHERE a IN (SELECT node FROM a{i}) "
                f"AND b IN (SELECT node FROM a{i}))"
            )
    chain = ",\n".join(ctes)
    return f"""
WITH {_LINK_EDGES_CTE},
{chain}
SELECT node, deg FROM d{rounds} WHERE deg >= {k} ORDER BY node
"""


def _mmr_sql(n_cand: int = 20, k_sel: int = 5) -> str:
    """Generated greedy-round replay of ``_q_mmr_diversified``: BM25
    candidate CTE, the hash-embedding chain restricted to candidates,
    pairwise rounded cosines, then one (pool, pick, selected) CTE
    triple per round — ties to the smallest doc_id via ORDER BY."""
    rounds = []
    for i in range(1, k_sel + 1):
        rounds.append(f"""p{i} AS (
  SELECT c.doc_id,
         round(0.7 * c.rel - 0.3 * coalesce(
           (SELECT max(s.sim) FROM sims s
            JOIN sel{i - 1} sp ON s.da = c.doc_id AND s.db = sp.doc_id), 0.0), 6)
           AS m
  FROM cand c WHERE c.doc_id NOT IN (SELECT doc_id FROM sel{i - 1})),
pick{i} AS (SELECT doc_id, m FROM p{i} ORDER BY m DESC, doc_id ASC LIMIT 1),
sel{i} AS (SELECT * FROM sel{i - 1}
           UNION ALL SELECT doc_id, {i}::bigint, m FROM pick{i})""")
    chain = ",\n".join(rounds)
    return f"""
WITH {_BM25_SCORES},
cand AS MATERIALIZED (
  SELECT doc_id, round(score, 6) AS rel FROM scores
  ORDER BY score DESC, doc_id ASC LIMIT {n_cand}),
tok2 AS (SELECT doc_id, term FROM tok
         WHERE doc_id IN (SELECT doc_id FROM cand)),
terms AS (SELECT DISTINCT term FROM tok2),
{_term_hash64_sql()},
occ AS (SELECT doc_id, h FROM tok2 JOIN th USING (term)),
vec AS (SELECT doc_id, (h % 64)::bigint AS dim,
               sum(CASE WHEN h >= 9223372036854775808::hugeint
                        THEN -1.0 ELSE 1.0 END) AS v
        FROM occ GROUP BY 1, 2),
nrm AS (SELECT doc_id, sqrt(sum(v * v)) AS nn FROM vec GROUP BY 1),
emb AS (SELECT vec.doc_id, dim,
               CAST(v / CASE WHEN nn = 0 THEN 1 ELSE nn END AS FLOAT)::double
                 AS val
        FROM vec JOIN nrm USING (doc_id)),
dn AS (SELECT doc_id, sqrt(sum(val * val)) AS nrm2 FROM emb GROUP BY 1),
sims AS MATERIALIZED (
  SELECT a.doc_id AS da, b.doc_id AS db,
         round(sum(a.val * b.val) / (na.nrm2 * nb.nrm2), 6) AS sim
  FROM emb a JOIN emb b ON a.dim = b.dim AND a.doc_id <> b.doc_id
  JOIN dn na ON na.doc_id = a.doc_id JOIN dn nb ON nb.doc_id = b.doc_id
  WHERE na.nrm2 > 0 AND nb.nrm2 > 0
  GROUP BY 1, 2, na.nrm2, nb.nrm2),
sel0 AS (SELECT NULL::bigint AS doc_id, 0::bigint AS rank, 0.0 AS m WHERE 1 = 0),
{chain}
SELECT rank, doc_id, m AS mmr FROM sel{k_sel} ORDER BY rank
"""


class _QualityWithLabel:
    """Actor-pool eval stage: quality-classifier probability plus the
    binary relevance label (lang == 'en') in one pass — weights load
    once per actor (`textstats.QualityClassifier`)."""

    def __init__(self) -> None:
        from dcs_ray.functions.textstats import QualityClassifier

        self.qc = QualityClassifier()

    def __call__(self, b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = self.qc(b)
        y = pc.cast(pc.equal(b["lang"], "en"), pa.int64())
        return pa.table(
            {
                "doc_id": out["doc_id"].cast(pa.int64()),
                "quality_prob": out["quality_prob"],
                "y": y,
            }
        )


def _daily_event_counts(sf_dir: str) -> pa.Table:
    """Shared (day, n) fold for the trend suite — exchange = |days|."""
    from dcs_ray.functions.stats import daily_counts

    return daily_counts(
        read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts"]), "ts"
    )


_US_PER_DAY = 86_400_000_000


def _textrank_sql(k: int = 3, n_iter: int = 5) -> str:
    """TextRank replay: positional tokens via zipped unnest, adjacent
    pairs (u≠v) symmetrized into weighted edges, degree sums, then one
    CTE per damped iteration (RESID=0.15, DAMP=0.85 exact literals —
    mirrors ``functions/textrank``)."""
    steps = []
    for i in range(1, n_iter + 1):
        steps.append(
            f"""s{i} AS MATERIALIZED (
  SELECT n.doc_id, n.term,
         0.15 / nv.nv + 0.85 * coalesce(sum(e.w / dg.deg * p.s), 0.0) AS s
  FROM nodes n JOIN nv USING (doc_id)
  LEFT JOIN e ON e.doc_id = n.doc_id AND e.v = n.term
  LEFT JOIN dg ON dg.doc_id = e.doc_id AND dg.u = e.u
  LEFT JOIN s{i - 1} p ON p.doc_id = e.doc_id AND p.term = e.u
  GROUP BY n.doc_id, n.term, nv.nv)"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH lstd AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
         '[^a-z0-9]+'), x -> x <> '') AS lst FROM documents),
posd AS MATERIALIZED (
  SELECT doc_id, unnest(lst) AS term,
         unnest(range(1, len(lst) + 1)) AS pos
  FROM lstd WHERE len(lst) > 0),
adj AS (SELECT a.doc_id, a.term AS u, b.term AS v
        FROM posd a JOIN posd b
          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        WHERE a.term <> b.term),
e AS MATERIALIZED (
  SELECT doc_id, u, v, count(*)::double AS w FROM (
    SELECT doc_id, u, v FROM adj
    UNION ALL SELECT doc_id, v AS u, u AS v FROM adj)
  GROUP BY 1, 2, 3),
dg AS MATERIALIZED (SELECT doc_id, u, sum(w) AS deg FROM e GROUP BY 1, 2),
nodes AS MATERIALIZED (SELECT DISTINCT doc_id, term FROM posd),
nv AS (SELECT doc_id, count(*)::double AS nv FROM nodes GROUP BY 1),
s0 AS (SELECT n.doc_id, n.term, 1.0 / nv.nv AS s
       FROM nodes n JOIN nv USING (doc_id)),
{chain},
ranked AS (
  SELECT doc_id, term, round(s, 6) AS score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY round(s, 6) DESC, term ASC) AS rank
  FROM s{n_iter})
SELECT doc_id, rank::bigint AS rank, term, score
FROM ranked WHERE rank <= {k} ORDER BY doc_id, rank"""


_BOOT_B = 100  # resamples


_BOOT_M = 500  # draws per resample (m-out-of-n bootstrap)


_BOOT_SEED = 20260819


_PQ_M = 4       # subspaces


_PQ_K = 4       # centroids per subspace


_PQ_ITER = 2    # Lloyd's iterations per subspace


_PQ_SUBDIM = 16  # dims per subspace (4 × 16 = 64)


def _pq_parts(m: int, k: int, n_iter: int, subdim: int) -> list[str]:
    """Per-subspace k-means CTE chain (``_kmeans_parts`` with a dim
    OFFSET and a ``_s{m}`` suffix) ending at final centroids
    ``c{n_iter}_s{m}`` — the SQL replay of one PQ codebook."""
    s = f"_s{m}"
    off = m * subdim
    parts = [
        f"""e{s} AS MATERIALIZED (
  SELECT vec_id, i.i AS dim, embedding[i.i + {off}]::double AS v
  FROM embeddings, (SELECT unnest(range(1, {subdim + 1})) AS i) i),
seeds{s} AS (
  SELECT vec_id, (row_number() OVER (ORDER BY vec_id) - 1)::bigint AS cid
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})),
c0{s} AS MATERIALIZED (
  SELECT x.cid, e.dim, e.v FROM e{s} e JOIN seeds{s} x USING (vec_id))"""
    ]
    for t in range(n_iter):
        parts.append(
            f"""d{t}{s} AS MATERIALIZED (
  SELECT e.vec_id, c.cid, sum((e.v - c.v) * (e.v - c.v)) AS dist
  FROM e{s} e JOIN c{t}{s} c USING (dim) GROUP BY e.vec_id, c.cid),
a{t}{s} AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
    FROM d{t}{s}) WHERE rn = 1),
c{t + 1}{s} AS MATERIALIZED (
  SELECT a.cid, e.dim, sum(e.v) / count(*) AS v
  FROM e{s} e JOIN a{t}{s} a USING (vec_id) GROUP BY a.cid, e.dim
  UNION ALL
  SELECT c.cid, c.dim, c.v FROM c{t}{s} c
  WHERE c.cid NOT IN (SELECT DISTINCT cid FROM a{t}{s}))"""
        )
    return parts


def _pq_codes_sql(
    M: int = 4, k: int = 4, n_iter: int = 2, subdim: int = 16
) -> str:
    """Full PQ replay: M independent subspace k-means chains, one
    final-codebook assignment each, joined on vec_id."""
    parts: list[str] = []
    for m in range(M):
        parts.extend(_pq_parts(m, k, n_iter, subdim))
        s = f"_s{m}"
        parts.append(
            f"""df{s} AS MATERIALIZED (
  SELECT e.vec_id, c.cid, sum((e.v - c.v) * (e.v - c.v)) AS dist
  FROM e{s} e JOIN c{n_iter}{s} c USING (dim) GROUP BY e.vec_id, c.cid),
af{s} AS MATERIALIZED (
  SELECT vec_id, cid AS code_{m} FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
    FROM df{s}) WHERE rn = 1)"""
        )
    joins = " ".join(f"JOIN af_s{m} USING (vec_id)" for m in range(1, M))
    cols = ", ".join(f"code_{m}::bigint AS code_{m}" for m in range(M))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT vec_id, {cols}
FROM af_s0 {joins}
ORDER BY vec_id"""
    )


def _knn_pq_adc_sql(
    M: int = 4, k: int = 4, n_iter: int = 2, subdim: int = 16, topk: int = 5
) -> str:
    """ADC replay: the PQ chains, a per-subspace LUT against the
    smallest-id query vector, and the 4-way LUT-sum scan."""
    parts: list[str] = [
        "q AS MATERIALIZED (SELECT embedding AS qe FROM embeddings "
        "ORDER BY vec_id LIMIT 1)"
    ]
    for m in range(M):
        parts.extend(_pq_parts(m, k, n_iter, subdim))
        s = f"_s{m}"
        off = m * subdim
        parts.append(
            f"""df{s} AS MATERIALIZED (
  SELECT e.vec_id, c.cid, sum((e.v - c.v) * (e.v - c.v)) AS dist
  FROM e{s} e JOIN c{n_iter}{s} c USING (dim) GROUP BY e.vec_id, c.cid),
af{s} AS MATERIALIZED (
  SELECT vec_id, cid AS code_{m} FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
    FROM df{s}) WHERE rn = 1),
lut{s} AS MATERIALIZED (
  SELECT c.cid, sum((c.v - q.qe[c.dim + {off}]::double)
                    * (c.v - q.qe[c.dim + {off}]::double)) AS d
  FROM c{n_iter}{s} c, q GROUP BY c.cid)"""
        )
    joins = " ".join(
        f"JOIN af_s{m} USING (vec_id) " for m in range(1, M)
    )
    lut_joins = " ".join(
        f"JOIN lut_s{m} l{m} ON l{m}.cid = af_s{m}.code_{m}" for m in range(M)
    )
    dist_sum = " + ".join(f"l{m}.d" for m in range(M))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT vec_id, round({dist_sum}, 6) + 0.0 AS adc_dist
FROM af_s0 {joins} {lut_joins}
ORDER BY ({dist_sum}) ASC, vec_id ASC LIMIT {topk}"""
    )


def _markov_entropy_sql(k: int = 5) -> str:
    """Entropy-rate replay: the stationary-distribution chain (round-6
    π, mirroring the gate's output contract) dotted with the exact
    row-normalized P ln P sums."""
    steps = []
    for i in range(1, k + 1):
        steps.append(
            f"""r{i} AS (
  SELECT ty.event_type, coalesce(sum(v{i - 1}.pr * p.p), 0.0) AS pr
  FROM ty LEFT JOIN p ON p.nxt = ty.event_type
          LEFT JOIN v{i - 1} ON v{i - 1}.event_type = p.prev
  GROUP BY ty.event_type),
v{i} AS (SELECT event_type, pr / (SELECT sum(pr) FROM r{i}) AS pr FROM r{i})"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH tr AS (
  SELECT prev, event_type AS nxt, count(*)::double AS n FROM (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_type) AS prev
    FROM events) s
  WHERE prev IS NOT NULL GROUP BY 1, 2),
rs AS (SELECT prev, sum(n) AS tot FROM tr GROUP BY prev),
p AS (SELECT tr.prev, tr.nxt, tr.n / rs.tot AS p FROM tr JOIN rs USING (prev)),
ty AS (SELECT DISTINCT event_type FROM events),
v0 AS (SELECT event_type, 1.0 / (SELECT count(*) FROM ty) AS pr FROM ty),
{chain},
pi AS (SELECT event_type, round(pr, 6) + 0.0 AS pr FROM v{k}),
h AS (SELECT -sum(pi.pr * p.p * ln(p.p)) AS h
      FROM p JOIN pi ON pi.event_type = p.prev)
SELECT (SELECT count(*) FROM ty)::bigint AS n_types,
       round(h.h, 6) + 0.0 AS entropy_rate,
       round(exp(h.h), 6) + 0.0 AS perplexity
FROM h"""


_PROFILE_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority",
]


def _upd_index(sf_dir: str) -> str:
    """Build-once words index whose partition 0 was incrementally
    REPLACED (every doc_id % 97 == 0 in the span gains ' spark') —
    shared setup of the update/reshard gates."""
    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.index.build import parquet_col_max, update_partition

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(_CACHE_ROOT, f"{name}_words_upd")
    marker = os.path.join(out, ".updated")
    id_max = parquet_col_max(f"{sf_dir}/documents.parquet", "doc_id")
    n_parts = 8
    span = (id_max + n_parts) // n_parts
    if not os.path.exists(os.path.join(out, "MANIFEST.json")):
        docs = read_parquet_sized(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        build_index(
            docs, out,
            IndexConfig(
                num_partitions=n_parts, num_shards=2, mode="words",
                id_col="doc_id", dedup_latest=False, id_max=id_max,
            ),
        )
    if not os.path.exists(marker):
        import pyarrow.parquet as pq

        t = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        ids = t["doc_id"].to_numpy().astype(np.int64)
        keep = ids < span  # partition 0's id range
        p0 = t.filter(pa.array(keep))
        pids = p0["doc_id"].to_numpy().astype(np.int64)
        suffix = pa.array(
            np.where(pids % 97 == 0, " spark", "").tolist(), pa.string()
        )
        new_text = pc.binary_join_element_wise(
            p0["text"].combine_chunks().cast(pa.string()), suffix, ""
        )
        update_partition(
            out, 0, pa.table({"doc_id": p0["doc_id"], "text": new_text})
        )
        with open(marker, "w") as f:
            f.write("ok")
    return out


def _rank_table(t: pa.Table) -> pa.Table:
    return pa.table(
        {
            "rank": t["rank"].cast(pa.int64()),
            "doc_id": t["doc_id"].cast(pa.int64()),
            "score": pa.array(
                np.round(t["score"].to_numpy(), 6) + 0.0, pa.float64()
            ),
        }
    )


def _words_index_fresh(sf_dir: str, suffix: str) -> str:
    """Build-once 8-partition words index under its own cache dir —
    shared setup of the tombstone-delete gates (they mutate index state,
    so each gate owns a private copy)."""
    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.index.build import parquet_col_max

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(_CACHE_ROOT, f"{name}_words_{suffix}")
    if not os.path.exists(os.path.join(out, "MANIFEST.json")):
        id_max = parquet_col_max(f"{sf_dir}/documents.parquet", "doc_id")
        docs = read_parquet_sized(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        build_index(
            docs, out,
            IndexConfig(
                num_partitions=8, num_shards=2, mode="words",
                id_col="doc_id", dedup_latest=False, id_max=id_max,
            ),
        )
    return out


_SQ_DIMS = (1, 17, 33, 49)  # 1-based sampled dims, one per PQ subspace


def _media_expected_sql() -> str:
    """Expected media-metadata table derived from the SYNTHESIS
    PARAMETERS and header semantics alone (never by running the
    parser) — PNG/GIF 24×16; WAV 2048 samples @16 kHz; FLAC 2048
    @32 kHz; AVI 12 frames @25 fps 16×12; MP4 skeleton duration
    1000+i ms, 320×240, 30+i samples, 1 track; MP3 CBR 128 kbps
    @44.1 kHz with 40+i frames (frame = ⌊144·128000/44100⌋ bytes,
    duration = bytes·8/kbps ms, 1152 samples/frame). Turns the
    metadata extractor's gate from rows-only into a full round-trip
    oracle."""
    rows = []
    mid = 0
    for _ in range(12):
        rows.append((mid, "png", 0, 24, 16, 0, 0, 0)); mid += 1
    for _ in range(12):
        rows.append((mid, "gif", 0, 24, 16, 0, 0, 0)); mid += 1
    for _ in range(12):
        rows.append((mid, "wav", 2048 * 1000 // 16000, 0, 0, 16000, 2048, 0))
        mid += 1
    for _ in range(12):
        rows.append((mid, "flac", 2048 * 1000 // 32000, 0, 0, 32000, 2048, 0))
        mid += 1
    for _ in range(6):
        rows.append((mid, "avi", 40000 * 12 // 1000, 16, 12, 0, 12, 0))
        mid += 1
    for i in range(6):
        rows.append((mid, "mp4", 1000 + i, 320, 240, 0, 30 + i, 1)); mid += 1
    fb = 144 * 128000 // 44100
    for i in range(6):
        nf = 40 + i
        rows.append((mid, "mp3", fb * nf * 8 // 128, 0, 0, 44100, nf * 1152, 0))
        mid += 1
    vals = ", ".join(
        f"({m}, '{f}', {d}, {w}, {h}, {sr}, {ns}, {nt})"
        for m, f, d, w, h, sr, ns, nt in rows
    )
    return f"""
SELECT media_id::bigint AS media_id, format,
       duration_ms::bigint AS duration_ms, width::bigint AS width,
       height::bigint AS height, samplerate_hz::bigint AS samplerate_hz,
       n_samples::bigint AS n_samples, n_tracks::bigint AS n_tracks
FROM (VALUES {vals})
     t(media_id, format, duration_ms, width, height, samplerate_hz,
       n_samples, n_tracks)
ORDER BY media_id"""


def _video_frames_mjpeg_sql() -> str:
    """Per-tile decode-chain replay (same arithmetic as
    ``_image_features_jpeg_sql``) over the SAMPLED frames' tile params,
    folded to exact integer channel sums (64 px per flat tile); ts =
    duration·f/nf with 12 frames at 25 fps."""
    from dcs_ray.functions.avi import avi_flat_tile_params

    take = {j * 12 // 4 for j in range(4)}
    vals = ", ".join(
        f"({m}, {f}, {r}, {g}, {b})"
        for m, f, tix, r, g, b in avi_flat_tile_params(16, frames=12, tiles=2)
        if f in take
    )
    return f"""
WITH src(media_id, f, r0, g0, b0) AS (VALUES {vals}),
enc AS (SELECT media_id, f,
               round(0.299*r0 + 0.587*g0 + 0.114*b0) AS y,
               round(128.0 - 0.168736*r0 - 0.331264*g0 + 0.5*b0) AS cb,
               round(128.0 + 0.5*r0 - 0.418688*g0 - 0.081312*b0) AS cr
        FROM src),
rec AS (SELECT media_id, f, y,
               least(greatest(round(round(8.0*(cb-128.0)/17.0)*17.0/8.0
                                    + 128.0), 0.0), 255.0) AS cbh,
               least(greatest(round(round(8.0*(cr-128.0)/17.0)*17.0/8.0
                                    + 128.0), 0.0), 255.0) AS crh
        FROM enc),
px AS (SELECT media_id, f,
              least(greatest(round(y + 1.402*(crh-128.0)), 0.0), 255.0) AS r,
              least(greatest(round(y - 0.344136*(cbh-128.0)
                                     - 0.714136*(crh-128.0)), 0.0), 255.0) AS g,
              least(greatest(round(y + 1.772*(cbh-128.0)), 0.0), 255.0) AS b
       FROM rec)
SELECT media_id::bigint AS media_id, f::bigint AS frame_idx,
       (480 * f // 12)::bigint AS ts_ms,
       (64 * sum(r))::bigint AS sum_r, (64 * sum(g))::bigint AS sum_g,
       (64 * sum(b))::bigint AS sum_b
FROM px GROUP BY media_id, f ORDER BY media_id, frame_idx
"""


def _image_features_jpeg_sql() -> str:
    """SQL replay of the DC-only baseline-JPEG decode chain over the
    fixture tile params (inlined as literals from the same screened
    splitmix stream the synthesizer draws — the `_lsh_assignment_sql`
    precedent), then the mean/std/luma-grid feature arithmetic of the
    lossless gate. Every round() the chain takes is ≥1e-6 from a .5
    boundary by the synthesizer's rejection rule, so DuckDB's
    half-away round and numpy's half-even round agree."""
    from dcs_ray.functions.multimodal import jpeg_media_tile_params

    vals = ", ".join(
        f"({m}, {t}, {'TRUE' if grey else 'FALSE'}, {r}, {g}, {b})"
        for m, t, grey, r, g, b in jpeg_media_tile_params(32, tiles=4)
    )
    return f"""
WITH src(media_id, tix, grey, r0, g0, b0) AS (VALUES {vals}),
enc AS (SELECT media_id, tix, grey, r0,
               round(0.299*r0 + 0.587*g0 + 0.114*b0) AS y,
               round(128.0 - 0.168736*r0 - 0.331264*g0 + 0.5*b0) AS cb,
               round(128.0 + 0.5*r0 - 0.418688*g0 - 0.081312*b0) AS cr
        FROM src),
rec AS (SELECT media_id, tix, grey, r0, y,
               least(greatest(round(round(8.0*(cb-128.0)/17.0)*17.0/8.0
                                    + 128.0), 0.0), 255.0) AS cbh,
               least(greatest(round(round(8.0*(cr-128.0)/17.0)*17.0/8.0
                                    + 128.0), 0.0), 255.0) AS crh
        FROM enc),
px AS (SELECT media_id, tix,
              CASE WHEN grey THEN r0::double ELSE
                least(greatest(round(y + 1.402*(crh-128.0)), 0.0), 255.0)
              END AS r,
              CASE WHEN grey THEN r0::double ELSE
                least(greatest(round(y - 0.344136*(cbh-128.0)
                                       - 0.714136*(crh-128.0)), 0.0), 255.0)
              END AS g,
              CASE WHEN grey THEN r0::double ELSE
                least(greatest(round(y + 1.772*(cbh-128.0)), 0.0), 255.0)
              END AS b
       FROM rec),
mn AS (SELECT media_id, sum(r)/16.0 AS mr, sum(g)/16.0 AS mg,
              sum(b)/16.0 AS mb FROM px GROUP BY media_id),
sd AS (SELECT px.media_id,
              sqrt(sum((px.r - mn.mr)*(px.r - mn.mr))/16.0) AS sr,
              sqrt(sum((px.g - mn.mg)*(px.g - mn.mg))/16.0) AS sg,
              sqrt(sum((px.b - mn.mb)*(px.b - mn.mb))/16.0) AS sb
       FROM px JOIN mn USING (media_id) GROUP BY px.media_id),
lu AS (SELECT media_id, (tix//4)//2 AS gy, (tix%4)//2 AS gx,
              sum(r*0.299 + g*0.587 + b*0.114)/count(*) AS gm
       FROM px GROUP BY 1, 2, 3),
f AS (
  SELECT media_id, 0::bigint AS dim, mr AS v FROM mn
  UNION ALL SELECT media_id, 1, mg FROM mn
  UNION ALL SELECT media_id, 2, mb FROM mn
  UNION ALL SELECT media_id, 3, sr FROM sd
  UNION ALL SELECT media_id, 4, sg FROM sd
  UNION ALL SELECT media_id, 5, sb FROM sd
  UNION ALL SELECT media_id, (6 + gy * 2 + gx)::bigint, gm FROM lu)
SELECT media_id::bigint AS media_id, dim,
       round(CAST(v AS FLOAT)::double, 6) + 0.0 AS val
FROM f ORDER BY media_id, dim
"""


def _pagerank_convergence_sql(k: int = 5, d: float = 0.85) -> str:
    parts = []
    for i in range(1, k + 1):
        parts.append(
            f"""SELECT {i}::bigint AS iteration,
       round(sum(abs(round(a.r, 6) - round(b.r, 6))), 6) + 0.0 AS l1_delta
FROM r{i} a JOIN r{i - 1} b USING (node)"""
        )
    body = "\nUNION ALL\n".join(parts)
    return (
        "WITH "
        + _pagerank_ctes(k, d, _LINK_EDGES_CTE)
        + f"\nSELECT * FROM ({body}) ORDER BY iteration"
    )


def _pbm_sql(n_sessions: int = 200, seed: int = 7, iters: int = 5) -> str:
    """Full PBM replay: splitmix64 click synthesis over the BM25
    top-10 (both ranking variants), the (variant, pos, doc) sufficient-
    statistic fold, and ``iters`` unrolled MATERIALIZED EM rounds (each
    group sums exactly two floats, so the arithmetic is bit-identical
    to the numpy fold before rounding)."""
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)

    def chain(col, nxt, i):
        if i == 0:
            return f"{_mulmod64(f'xor({col}::ubigint, {col}::ubigint >> 30)::hugeint', MIX1 + '::hugeint')} AS {nxt}"
        if i == 1:
            return f"{_mulmod64(f'xor({col}::ubigint, {col}::ubigint >> 27)::hugeint', MIX2 + '::hugeint')} AS {nxt}"
        return f"xor({col}::ubigint, {col}::ubigint >> 31)::hugeint AS {nxt}"

    iter_ctes = []
    for i in range(1, iters + 1):
        iter_ctes.append(f"""e{i} AS MATERIALIZED (
  SELECT a.variant, a.pos, a.doc_id, a.n, a.k,
         a.k + (a.n - a.k) * (al.v * (1 - at.v) / (1 - al.v * at.v)) AS sum_e,
         a.k + (a.n - a.k) * (at.v * (1 - al.v) / (1 - al.v * at.v)) AS sum_a
  FROM agg a JOIN alpha{i - 1} al USING (pos) JOIN attr{i - 1} at USING (doc_id)),
alpha{i} AS MATERIALIZED (SELECT pos, sum(sum_e) / sum(n) AS v FROM e{i} GROUP BY pos),
attr{i} AS MATERIALIZED (SELECT doc_id, sum(sum_a) / sum(n) AS v FROM e{i} GROUP BY doc_id)""")
    its = ",\n".join(iter_ctes)
    return f"""
WITH {_BM25_SCORES},
ranked AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id
  FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10),
imp AS (
  SELECT s, pos, (s % 2) AS variant,
         (SELECT doc_id FROM ranked r
          WHERE r.rank = CASE WHEN s % 2 = 0 THEN pos ELSE 11 - pos END) AS doc_id
  FROM (SELECT unnest(range({n_sessions})) AS s),
       (SELECT unnest(range(1, 11)) AS pos)),
i0 AS (SELECT *, xor((s*16+pos)::ubigint, {seed + 1}::ubigint)::hugeint AS e0,
               xor((s*16+pos)::ubigint, {seed + 2}::ubigint)::hugeint AS a0,
               xor(doc_id::ubigint, {seed + 3}::ubigint)::hugeint AS d0 FROM imp),
i1 AS (SELECT *, {chain('e0', 'e1', 0)}, {chain('a0', 'a1', 0)}, {chain('d0', 'd1', 0)} FROM i0),
i2 AS (SELECT *, {chain('e1', 'e2', 1)}, {chain('a1', 'a2', 1)}, {chain('d1', 'd2', 1)} FROM i1),
i3 AS (SELECT *, {chain('e2', 'he', 2)}, {chain('a2', 'ha', 2)}, {chain('d2', 'hd', 2)} FROM i2),
clog AS MATERIALIZED (
  SELECT variant, pos, doc_id,
         CASE WHEN (he % 12) < (11 - pos) AND (ha % 16) < (3 + (hd % 10))
              THEN 1 ELSE 0 END AS click
  FROM i3),
agg AS MATERIALIZED (
  SELECT variant, pos, doc_id, count(*)::bigint AS n, sum(click)::bigint AS k
  FROM clog GROUP BY variant, pos, doc_id),
alpha0 AS (SELECT unnest(range(1, 11)) AS pos, 0.5 AS v),
attr0 AS (SELECT DISTINCT doc_id, 0.5 AS v FROM agg),
{its}
SELECT 'attr' AS kind, doc_id AS key, round(v, 6) + 0.0 AS value FROM attr{iters}
UNION ALL
SELECT 'exam' AS kind, pos AS key, round(v, 6) + 0.0 AS value FROM alpha{iters}
ORDER BY kind, key
"""


def _ltr_sql(n_iter: int = 8, lr: float = 0.1) -> str:
    """Pairwise-LTR replay: BM25 top-20 features (score, ln(1+doc_len),
    synthetic prior), lexical relevance labels, relevant×non-relevant
    feature-difference pairs, and ``n_iter`` unrolled MATERIALIZED
    gradient-ascent rounds with the engine's exact expression tree
    (z left-associated, coef = 1/(1+exp(z)), w += lr·(Σ d·coef / n))."""
    its = []
    for i in range(1, n_iter + 1):
        upd = []
        for j in (1, 2, 3):
            upd.append(
                f"w.w{j} + {lr} * (coalesce((SELECT sum(p.d{j} * "
                f"(1.0 / (1.0 + exp(p.d1 * w.w1 + p.d2 * w.w2 + p.d3 * w.w3)))) "
                f"FROM pairs p), 0.0)"
                f" / greatest((SELECT count(*) FROM pairs), 1)) AS w{j}"
            )
        its.append(
            f"w{i} AS MATERIALIZED (SELECT "
            + ", ".join(upd)
            + f" FROM w{i - 1} w)"
        )
    iters_sql = ",\n".join(its)
    return f"""
WITH {_BM25_SCORES},
ranked AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM scores ORDER BY score DESC, doc_id ASC LIMIT 40),
cdl AS (SELECT doc_id, count(*) AS doc_len FROM tok
        WHERE doc_id IN (SELECT doc_id FROM ranked) GROUP BY doc_id),
rel AS (SELECT doc_id FROM (
          SELECT doc_id, term, count(*) AS tf FROM tok
          WHERE term IN ('join','merge','spark') GROUP BY doc_id, term)
        WHERE tf >= 2 GROUP BY doc_id HAVING count(DISTINCT term) = 3),
feats AS MATERIALIZED (
  SELECT r.doc_id, r.score AS f1,
         ln(1.0 + coalesce(c.doc_len, 0)) AS f2,
         1.0 + (r.doc_id % 5) / 10.0 AS f3,
         CASE WHEN r.doc_id IN (SELECT doc_id FROM rel) THEN 1 ELSE 0 END AS y
  FROM ranked r LEFT JOIN cdl c USING (doc_id)),
pairs AS MATERIALIZED (
  SELECT a.f1 - b.f1 AS d1, a.f2 - b.f2 AS d2, a.f3 - b.f3 AS d3
  FROM feats a, feats b WHERE a.y = 1 AND b.y = 0),
w0 AS (SELECT 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
{iters_sql},
wr AS (SELECT round(w1, 6) + 0.0 AS w1, round(w2, 6) + 0.0 AS w2,
              round(w3, 6) + 0.0 AS w3 FROM w{n_iter}),
acc AS (SELECT count(*)::bigint AS n_pairs,
               coalesce(sum(CASE WHEN p.d1 * w.w1 + p.d2 * w.w2 + p.d3 * w.w3 > 0
                            THEN 1 ELSE 0 END), 0)::bigint AS n_correct
        FROM pairs p, wr w)
SELECT name, value FROM (
  SELECT 'n_correct' AS name, (SELECT n_correct FROM acc)::double AS value
  UNION ALL SELECT 'n_pairs', (SELECT n_pairs FROM acc)::double
  UNION ALL SELECT 'w_bm25', (SELECT w1 FROM wr)
  UNION ALL SELECT 'w_len', (SELECT w2 FROM wr)
  UNION ALL SELECT 'w_prior', (SELECT w3 FROM wr)
) ORDER BY name
"""


_SELECTIVITY_COMBOS = [
    ["join", "merge"], ["spark", "the"], ["join", "merge", "spark"],
    ["customer", "value"], ["data", "fast", "query"], ["sort", "window"],
]


def _selectivity_sql() -> str:
    parts = []
    for qid, combo in enumerate(_SELECTIVITY_COMBOS):
        cs = sorted(combo)
        est = "(SELECT n FROM st)"
        for t in cs:
            est = (
                f"({est} * (coalesce((SELECT df FROM df WHERE term = '{t}'), 0)"
                f" / (SELECT n FROM st)))"
            )
        in_list = ", ".join(f"'{t}'" for t in cs)
        parts.append(f"""SELECT {qid}::bigint AS query_id, '{" ".join(cs)}' AS terms,
       round({est}, 6) + 0.0 AS est_docs,
       (SELECT count(*) FROM (
          SELECT doc_id FROM tok WHERE term IN ({in_list})
          GROUP BY doc_id HAVING count(DISTINCT term) = {len(cs)}))::bigint AS actual_docs""")
    body = "\nUNION ALL\n".join(parts)
    return f"""
WITH tok AS ({_TOK}),
st AS (SELECT (SELECT count(*) FROM documents)::double AS n),
df AS (SELECT term, count(DISTINCT doc_id)::double AS df FROM tok GROUP BY term)
{body}
ORDER BY query_id
"""


def _serp_ctr_sql(n_sessions: int = 200, seed: int = 7) -> str:
    """CTR-curve replay: the PBM gate's click synthesis (same hash
    chains) aggregated to per-(variant, position) impressions / clicks
    / 6dp CTR."""
    full = _pbm_sql(n_sessions=n_sessions, seed=seed, iters=1)
    # reuse everything up to (and including) the agg CTE, then select
    head = full.split("alpha0 AS")[0].rstrip().rstrip(",")
    return head + """
SELECT variant, pos, sum(n)::bigint AS impressions, sum(k)::bigint AS clicks,
       round(sum(k)::double / greatest(sum(n), 1), 6) + 0.0 AS ctr
FROM agg GROUP BY variant, pos ORDER BY variant, pos
"""


def _nqc_sql(k: int = 50) -> str:
    """NQC replay: shared tok/df/stats CTEs, one scores+top-k+moments
    chain per query, population std over the top-k and the sigma/mu
    normalization — same expression tree as ``evaluate.nqc_difficulty``."""
    from dcs_ray.functions.evaluate import NQC_QUERIES

    parts, sels = [], []
    for i, q in enumerate(NQC_QUERIES):
        terms = sorted(set(q.split()))
        inl = ", ".join(f"'{t}'" for t in terms)
        parts.append(f"""sc{i} AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl)) ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
  WHERE tf.term IN ({inl}) GROUP BY tf.doc_id),
top{i} AS (SELECT score FROM sc{i} ORDER BY score DESC, doc_id ASC LIMIT {k}),
m{i} AS (SELECT count(*)::bigint AS k, avg(score) AS mu FROM top{i}),
s{i} AS (SELECT m.k, m.mu,
                sqrt(sum((t.score - m.mu) * (t.score - m.mu)) / m.k) AS sigma
         FROM top{i} t, m{i} m GROUP BY m.k, m.mu)""")
        sels.append(
            f"SELECT {i}::bigint AS query_id, k AS k_used, round(mu, 6) + 0.0 AS mu,"
            f" round(sigma, 6) + 0.0 AS sigma,"
            f" round(CASE WHEN mu <> 0 THEN sigma / mu ELSE 0.0 END, 6) + 0.0 AS nqc"
            f" FROM s{i}"
        )
    body = "\nUNION ALL\n".join(sels)
    chains = ",\n".join(parts)
    return f"""
WITH tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl)::double / (SELECT count(*) FROM documents) AS avgdl),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
{chains}
{body}
ORDER BY query_id
"""


def _hyperanf_sql(rounds: int = 3) -> str:
    """HyperANF replay: node-seeded single-register HLL counters
    (splitmix64 chain, j = top-4 bits, rank = lz+1 capped 61), per
    round one (node, j) group-max over counters arriving along
    reversed edges, then the integer-exact estimate chain (dyadic
    power sum as hugeint) for the 20 smallest nodes."""
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)
    rcte = []
    for t in range(1, rounds + 1):
        rcte.append(f"""r{t} AS MATERIALIZED (
  SELECT node, j, max(r) AS r FROM (
    SELECT e.src AS node, p.j, p.r FROM edges e JOIN r{t - 1} p ON p.node = e.dst
    UNION ALL SELECT node, j, r FROM r{t - 1}
  ) GROUP BY node, j)""")
        rcte.append(f"""e{t} AS (
  SELECT s.node, {t}::bigint AS round,
         coalesce(sum(p.r), 0)::bigint AS reg_sum,
         coalesce(count(p.r), 0)::bigint AS cnt,
         coalesce(sum(1::hugeint << (61 - p.r)), 0)::hugeint AS snz
  FROM sample s LEFT JOIN r{t} p ON p.node = s.node
  GROUP BY s.node)""")
    sels = []
    for t in range(1, rounds + 1):
        sels.append(f"""SELECT round, node, reg_sum,
       round(CASE WHEN (0.7213 / (1 + 1.079 / 16.0)) * 16.0 * 16.0
                       * (1::hugeint << 61)::double
                       / ((16 - cnt) * (1::hugeint << 61) + snz)::double <= 2.5 * 16
                       AND (16 - cnt) > 0
                  THEN 16 * ln(16.0 / (16 - cnt))
                  ELSE (0.7213 / (1 + 1.079 / 16.0)) * 16.0 * 16.0
                       * (1::hugeint << 61)::double
                       / ((16 - cnt) * (1::hugeint << 61) + snz)::double
             END, 6) + 0.0 AS est
FROM e{t}""")
    body = "\nUNION ALL\n".join(sels)
    chain = ",\n".join(rcte)
    return f"""
WITH {_LINK_EDGES_CTE},
nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
sample AS (SELECT node FROM nodes ORDER BY node LIMIT 20),
h0 AS (SELECT node, node::ubigint::hugeint AS x0 FROM nodes),
h1 AS (SELECT node, ({_mulmod64("xor(x0::ubigint, x0::ubigint >> 30)::hugeint", MIX1 + "::hugeint")}) AS x1 FROM h0),
h2 AS (SELECT node, ({_mulmod64("xor(x1::ubigint, x1::ubigint >> 27)::hugeint", MIX2 + "::hugeint")}) AS x2 FROM h1),
hf AS (SELECT node, xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM h2),
r0 AS (SELECT node, (h >> 60)::bigint AS j,
              CASE WHEN (h % (1::hugeint << 60)) = 0 THEN 61
                   ELSE least(65 - length(bin(((h % (1::hugeint << 60)) * 16)::ubigint::hugeint)), 61)
              END::bigint AS r
       FROM hf),
{chain}
{body}
ORDER BY round, node
"""


def _trustrank_sql() -> str:
    """TrustRank / spam-mass replay: the uniform PageRank chain and a
    seed-teleport (trusted nodes ≡ node % 10 = 0) chain composed in one
    statement — the personalized chain's CTE names are mechanically
    prefixed so both 5-iteration chains coexist; spam mass is computed
    from the ROUNDED ranks on both sides."""
    import re as _re

    uni = _pagerank_ctes(5, 0.85, _LINK_EDGES_CTE)
    pers_full = _pagerank_sql(
        5, 0.85,
        edges_cte="edges AS (SELECT src, dst FROM EDGEBASE)",
        seeds_cte="seeds AS (SELECT node FROM nodes WHERE node % 10 = 0)",
    )
    pers = pers_full[len("WITH "): pers_full.rindex("\nSELECT node, round")]
    pers = _re.sub(
        r"\b(edges|nodes|nn|outdeg|tp|ns|seeds|dang\d+|c\d+|r\d+)\b",
        r"T\1", pers,
    )
    pers = pers.replace("EDGEBASE", "edges")
    return f"""
WITH {uni},
{pers},
comb AS (
  SELECT u.node, round(u.r, 6) + 0.0 AS pagerank, round(t.r, 6) + 0.0 AS trust
  FROM r5 u JOIN Tr5 t USING (node)),
sm AS (
  SELECT node, pagerank, trust,
         round(CASE WHEN pagerank > 0 THEN (pagerank - trust) / pagerank
                    ELSE 0.0 END, 6) + 0.0 AS spam_mass
  FROM comb)
SELECT node, pagerank, trust, spam_mass
FROM sm ORDER BY spam_mass DESC, node ASC LIMIT 20
"""


def _ring_sql() -> str:
    """Consistent-hash replay: ring positions for 8 nodes × 64 virtual
    nodes and the full corpus assignment counts under scenario 'full'
    plus scenario 'minus3' (node 3 removed) — one correlated first-
    position-clockwise lookup per key, wrap via the global ring min."""
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)

    def chain(expr):
        x0 = f"xor(({expr})::ubigint, 0::ubigint)::hugeint"
        x1 = _mulmod64(f"xor(({x0})::ubigint, ({x0})::ubigint >> 30)::hugeint", MIX1 + "::hugeint")
        x2 = _mulmod64(f"xor(({x1})::ubigint, ({x1})::ubigint >> 27)::hugeint", MIX2 + "::hugeint")
        return f"xor(({x2})::ubigint, ({x2})::ubigint >> 31)::hugeint"

    return f"""
WITH ring AS MATERIALIZED (
  SELECT node, v, {chain("node * 1024 + v")} AS pos
  FROM (SELECT unnest(range(8)) AS node), (SELECT unnest(range(64)) AS v)),
keys AS MATERIALIZED (
  SELECT doc_id, {chain("doc_id")} AS h FROM documents),
scen AS (SELECT unnest(['full', 'minus3']) AS scenario),
live AS (SELECT s.scenario, r.node, r.pos FROM scen s JOIN ring r
         ON s.scenario = 'full' OR r.node <> 3),
ass AS (
  SELECT s.scenario, k.doc_id,
         coalesce(
           (SELECT l.node FROM live l WHERE l.scenario = s.scenario
              AND l.pos >= k.h ORDER BY l.pos, l.node LIMIT 1),
           (SELECT l.node FROM live l WHERE l.scenario = s.scenario
            ORDER BY l.pos, l.node LIMIT 1)) AS node
  FROM keys k, scen s)
SELECT scenario, node, count(*)::bigint AS n_keys
FROM ass GROUP BY scenario, node ORDER BY scenario, node
"""


_ALERT_QUERIES = [
    ["join", "merge"], ["spark", "window"], ["customer", "value"],
    ["data", "stream", "fast"], ["sort", "key", "table"],
    ["slow", "filter"], ["group", "query", "row"], ["batch", "line"],
]


def _alerts_sql() -> str:
    parts = []
    for qi, q in enumerate(_ALERT_QUERIES):
        uq = sorted(set(q))
        inl = ", ".join(f"'{t}'" for t in uq)
        parts.append(f"""SELECT {qi}::bigint AS query_id,
       count(*)::bigint AS n_alerts,
       coalesce(string_agg(doc_id, ',' ORDER BY doc_id)
                FILTER (WHERE rn <= 5), '') AS head_docs
FROM (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn
  FROM (SELECT doc_id FROM tok WHERE term IN ({inl})
        GROUP BY doc_id HAVING count(DISTINCT term) = {len(uq)}))""")
    body = "\nUNION ALL\n".join(parts)
    return f"""
WITH tok AS ({_TOK})
{body}
ORDER BY query_id
"""


def _feed_alerts_sql() -> str:
    """_alerts_sql over the feeder gate's delta slice: docs 0..39
    re-idd at +1_000_000 (the same deterministic replay the engine
    gate performs on its scratch ingest)."""
    tokd = ("SELECT doc_id + 1000000 AS doc_id, "
            "unnest(list_filter(regexp_split_to_array(lower(text), "
            "'[^a-z0-9]+'), x -> x <> '')) AS term "
            "FROM documents WHERE doc_id < 40")
    parts = []
    for qi, q in enumerate(_ALERT_QUERIES):
        uq = sorted(set(q))
        inl = ", ".join(f"'{t}'" for t in uq)
        parts.append(f"""SELECT {qi}::bigint AS query_id,
       count(*)::bigint AS n_alerts,
       coalesce(string_agg(doc_id, ',' ORDER BY doc_id)
                FILTER (WHERE rn <= 5), '') AS head_docs
FROM (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn
  FROM (SELECT doc_id FROM tokd WHERE term IN ({inl})
        GROUP BY doc_id HAVING count(DISTINCT term) = {len(uq)}))""")
    body = "\nUNION ALL\n".join(parts)
    return f"""
WITH tokd AS ({tokd})
{body}
ORDER BY query_id
"""


_BLOOM_PROBE_TERMS = ["join", "nosuchterm12345", "pmark0", "pmark3", "pmark7", "spark"]


def _focused_hits_sql() -> str:
    """Kleinberg base-set HITS replay: the link-edge synthesis renamed
    to ``rawe``, the BM25 root chain, the 1-hop base expansion, the
    induced ``edges`` CTE, then the shared 5-iteration HITS chain."""
    ec = _LINK_EDGES_CTE.replace("edges AS (", "rawe AS (", 1)
    composite = f"""{ec},
{_BM25_SCORES},
root AS MATERIALIZED (SELECT doc_id AS node FROM scores
                      ORDER BY score DESC, doc_id ASC LIMIT 10),
base AS MATERIALIZED (SELECT DISTINCT node FROM (
  SELECT node FROM root
  UNION ALL SELECT r.dst FROM rawe r JOIN root ON r.src = root.node
  UNION ALL SELECT r.src FROM rawe r JOIN root ON r.dst = root.node)),
edges AS (SELECT r.src, r.dst FROM rawe r
          JOIN base b1 ON r.src = b1.node JOIN base b2 ON r.dst = b2.node)"""
    return _hits_sql(k=5, edges_cte=composite)


def _ab_ztest_sql() -> str:
    """Two-proportion z-test replay on top of the CTR gate's click
    synthesis: fold to per-variant integer totals, then the pooled-
    variance z with the engine's expression tree."""
    full = _pbm_sql(n_sessions=200, seed=7, iters=1)
    head = full.split("alpha0 AS")[0].rstrip().rstrip(",")
    return head + """,
tot AS (SELECT variant, sum(n)::bigint AS n, sum(k)::bigint AS k
        FROM agg GROUP BY variant),
t0 AS (SELECT n, k FROM tot WHERE variant = 0),
t1 AS (SELECT n, k FROM tot WHERE variant = 1)
SELECT (SELECT n FROM t0) AS n0, (SELECT k FROM t0) AS clicks0,
       (SELECT n FROM t1) AS n1, (SELECT k FROM t1) AS clicks1,
       round((SELECT k FROM t0)::double / (SELECT n FROM t0), 6) + 0.0 AS ctr0,
       round((SELECT k FROM t1)::double / (SELECT n FROM t1), 6) + 0.0 AS ctr1,
       round(((SELECT k FROM t0)::double / (SELECT n FROM t0)
              - (SELECT k FROM t1)::double / (SELECT n FROM t1))
             / sqrt((((SELECT k FROM t0) + (SELECT k FROM t1))::double
                     / ((SELECT n FROM t0) + (SELECT n FROM t1)))
                    * (1.0 - ((SELECT k FROM t0) + (SELECT k FROM t1))::double
                             / ((SELECT n FROM t0) + (SELECT n FROM t1)))
                    * (1.0 / (SELECT n FROM t0) + 1.0 / (SELECT n FROM t1))), 6)
       + 0.0 AS z
"""


_TOK = (
    "SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), "
    "'[^a-z0-9]+'), x -> x <> '')) AS term FROM documents"
)


_DAILY_SQL = (
    "SELECT (epoch_us(ts) // 86400000000)::bigint AS day, "
    "count(*)::bigint AS n FROM events GROUP BY 1"
)


_BM25_SCORES = f"""
tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl)::double / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
q AS (SELECT unnest(['join','merge','spark']) AS term),
scores AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl)) ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
  WHERE tf.term IN (SELECT term FROM q)
  GROUP BY tf.doc_id
)
"""


def _xlx(e: str) -> str:
    """x·ln(x) with 0·ln(0)=0 in SQL — the G² entropy-form helper
    (mirrors ``functions/collocations._xlogx``)."""
    return f"(CASE WHEN {e} > 0 THEN ({e}) * ln({e}) ELSE 0.0 END)"


_M64 = "18446744073709551616"


_FNV_TOK = (
    "list_reduce(list_prepend(14695981039346656037::hugeint, "
    "list_transform(range(1, length({t})+1), i -> ascii(substr({t}, i, 1))::hugeint)), "
    "(h, b) -> (xor(h::ubigint, b::ubigint)::hugeint * 1099511628211) % " + _M64 + ")"
)


_TOKS_LIST = (
    "SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), "
    "x -> x <> '') AS toks FROM documents"
)


_LINK_EDGES_CTE = f"""ltoks AS ({_TOKS_LIST}),
lbase AS (SELECT doc_id, toks, len(toks) AS n FROM ltoks WHERE len(toks) > 0),
edges AS (
  SELECT doc_id::bigint AS src,
         (CASE j WHEN 0 THEN doc_id // 2 WHEN 1 THEN doc_id // 3
                 ELSE doc_id + 41 END)::bigint AS dst,
         toks[((doc_id + 5 * j) % n) + 1] || ' '
           || toks[((doc_id + 5 * j + 1) % n) + 1] AS anchor
  FROM lbase CROSS JOIN range(3) r(j))"""


def _tune_bm25_sql(grid: list[tuple[float, float]], k: int = 10) -> str:
    """The BM25 (k1, b) parameter sweep replayed in one statement: per
    combo a scores/ranked/hits CTE chain (score expression mirrors the
    ENGINE's association exactly — ``idf * (tf * (k1+1)) / (tf + k1 *
    ((1-b) + b*dl/avgdl))`` with the (k1+1)/(1-b) constants computed in
    Python so both sides use identical doubles), shared relevance
    labels, UNION ALL of one metrics row per combo."""
    parts = [
        f"""tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl)::double / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
q AS (SELECT unnest(['join','merge','spark']) AS term),
rel AS (
  SELECT doc_id FROM tok WHERE term IN ('join','merge','spark')
  GROUP BY doc_id HAVING count(DISTINCT term) = 3),
nrel AS (SELECT count(*)::bigint AS r FROM rel),
idcg AS (
  SELECT coalesce(sum(1.0 / log2(i + 1.0)), 0.0) AS v
  FROM (SELECT unnest(range(1, 1 + least((SELECT r FROM nrel), {k}))) AS i))"""
    ]
    selects = []
    for i, (k1, b) in enumerate(grid):
        k1p, omb = repr(float(k1) + 1.0), repr(1.0 - float(b))
        k1r, br = repr(float(k1)), repr(float(b))
        parts.append(
            f"""s{i} AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * (tf.tf * {k1p})
              / (tf.tf + {k1r} * ({omb} + {br} * dl.doc_len / stats.avgdl)) ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
  WHERE tf.term IN (SELECT term FROM q)
  GROUP BY tf.doc_id),
r{i} AS (
  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id
  FROM s{i} ORDER BY score DESC, doc_id ASC LIMIT {k}),
h{i} AS (SELECT rank FROM r{i} JOIN rel USING (doc_id))"""
        )
        selects.append(
            f"""SELECT {k1r} AS k1, {br} AS b,
       round(CASE WHEN (SELECT v FROM idcg) > 0
                  THEN (SELECT coalesce(sum(1.0 / log2(rank + 1.0)), 0.0) FROM h{i})
                       / (SELECT v FROM idcg)
                  ELSE 0.0 END, 6) AS ndcg_at_{k},
       round(CASE WHEN (SELECT count(*) FROM h{i}) = 0 THEN 0.0
                  ELSE 1.0 / (SELECT min(rank)::double FROM h{i}) END, 6) AS mrr"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + "\nSELECT * FROM (\n"
        + "\nUNION ALL\n".join(selects)
        + "\n) ORDER BY k1, b"
    )


def _pagerank_sql(
    k: int = 5,
    d: float = 0.85,
    edges_cte: str | None = None,
    seeds_cte: str | None = None,
) -> str:
    """All ``k`` PageRank power iterations replayed as chained SQL CTEs.
    ``edges_cte`` overrides the edge-set definition (must define a CTE
    named ``edges`` with at least ``src``/``dst`` bigint columns);
    default is the deterministic events functional graph. ``seeds_cte``
    (a CTE named ``seeds`` with a ``node`` bigint column) switches to
    personalized PageRank: teleport and dangling mass go to the seed
    set instead of uniform 1/N — operation order mirrors the engine's
    ``(1-d)*p + d*(contrib + dang*p)`` exactly so rounded ranks
    hash-match."""
    parts = [
        edges_cte
        or """edges AS (
  SELECT src, dst FROM (
    SELECT event_id::bigint AS src,
           ((event_id // 20) * 20 + (event_id * 13 + 5) % 20)::bigint AS dst
    FROM events
    UNION ALL
    SELECT event_id::bigint,
           ((event_id // 20) * 20 + (event_id * 7 + 3) % 20)::bigint
    FROM events WHERE event_id % 3 = 0))""",
        """nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION SELECT dst FROM edges)),
nn AS (SELECT count(*)::double AS n FROM nodes),
outdeg AS (SELECT src AS node, count(*)::double AS deg FROM edges GROUP BY src)""",
    ]
    if seeds_cte is None:
        parts.append(
            """tp AS (SELECT node, 1.0 / (SELECT n FROM nn) AS p FROM nodes),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes)"""
        )
    else:
        parts.append(seeds_cte)
        parts.append(
            """ns AS (SELECT count(*)::double AS c FROM seeds),
tp AS MATERIALIZED (
  SELECT n.node,
         CASE WHEN s.node IS NOT NULL THEN 1.0 / (SELECT c FROM ns)
              ELSE 0.0 END AS p
  FROM nodes n LEFT JOIN seeds s USING (node)),
r0 AS (SELECT node, p AS r FROM tp)"""
        )
    for i in range(1, k + 1):
        p = i - 1
        if seeds_cte is None:
            update = f"""(1.0 - {d}) / (SELECT n FROM nn)
         + {d} * (coalesce(c.contrib, 0.0) + (SELECT m FROM dang{p}) / (SELECT n FROM nn))"""
            tp_join = ""
        else:
            update = f"""(1.0 - {d}) * t.p
         + {d} * (coalesce(c.contrib, 0.0) + (SELECT m FROM dang{p}) * t.p)"""
            tp_join = " JOIN tp t USING (node)"
        parts.append(
            f"""dang{p} AS (
  SELECT coalesce(sum(r.r), 0.0) AS m FROM r{p} r LEFT JOIN outdeg o USING (node)
  WHERE o.node IS NULL),
c{i} AS (
  SELECT e.dst AS node, sum(r.r / o.deg) AS contrib
  FROM edges e JOIN r{p} r ON e.src = r.node JOIN outdeg o ON e.src = o.node
  GROUP BY e.dst),
r{i} AS (
  SELECT n.node,
         {update} AS r
  FROM nodes n LEFT JOIN c{i} c USING (node){tp_join})"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node, round(r, 6) AS rank FROM r{k} ORDER BY node"
    )


def _hits_sql(k: int = 5, edges_cte: str | None = None) -> str:
    """All ``k`` HITS mutual-reinforcement iterations replayed as
    chained SQL CTEs (authority then hub per iteration, L1-normalized
    after each half-step — exactly the engine's update order, so the
    rounded vectors hash-match). ``edges_cte`` must define a CTE named
    ``edges`` with ``src``/``dst`` bigint columns."""
    parts = [
        edges_cte,
        # MATERIALIZED: the chain references the edge set twice per
        # iteration; inlining would re-expand (and re-open) the source
        # parquet per reference and exhaust file descriptors
        """em AS MATERIALIZED (SELECT src, dst FROM edges),
nodes AS MATERIALIZED (SELECT DISTINCT node FROM (SELECT src AS node FROM em UNION SELECT dst FROM em)),
nn AS (SELECT count(*)::double AS n FROM nodes),
a0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS a FROM nodes),
h0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS h FROM nodes)""",
    ]
    for i in range(1, k + 1):
        p = i - 1
        parts.append(
            f"""ar{i} AS MATERIALIZED (
  SELECT e.dst AS node, sum(h.h) AS s
  FROM em e JOIN h{p} h ON e.src = h.node GROUP BY e.dst),
at{i} AS MATERIALIZED (SELECT coalesce(sum(s), 0.0) AS t FROM ar{i}),
a{i} AS MATERIALIZED (
  SELECT n.node,
         CASE WHEN (SELECT t FROM at{i}) > 0
              THEN coalesce(ar.s, 0.0) / (SELECT t FROM at{i})
              ELSE coalesce(ar.s, 0.0) END AS a
  FROM nodes n LEFT JOIN ar{i} ar USING (node)),
hr{i} AS MATERIALIZED (
  SELECT e.src AS node, sum(a.a) AS s
  FROM em e JOIN a{i} a ON e.dst = a.node GROUP BY e.src),
ht{i} AS MATERIALIZED (SELECT coalesce(sum(s), 0.0) AS t FROM hr{i}),
h{i} AS MATERIALIZED (
  SELECT n.node,
         CASE WHEN (SELECT t FROM ht{i}) > 0
              THEN coalesce(hr.s, 0.0) / (SELECT t FROM ht{i})
              ELSE coalesce(hr.s, 0.0) END AS h
  FROM nodes n LEFT JOIN hr{i} hr USING (node))"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT node, round(a, 6) AS authority, round(h, 6) AS hub
FROM a{k} JOIN h{k} USING (node) ORDER BY node"""
    )


def _salsa_sql(k: int = 5, edges_cte: str | None = None) -> str:
    """All ``k`` SALSA iterations replayed as chained SQL CTEs — the
    ``_hits_sql`` chain with explicit outdeg/indeg joins on the push
    (a(v) = Σ h(u)/outdeg(u), h(u) = Σ a(v)/indeg(v)), L1-normalized
    after each half-step exactly like the engine. Degrees count edge
    ROWS so duplicate edges contribute multiply on both sides."""
    parts = [
        edges_cte,
        """em AS MATERIALIZED (SELECT src, dst FROM edges),
nodes AS MATERIALIZED (SELECT DISTINCT node FROM (SELECT src AS node FROM em UNION SELECT dst FROM em)),
od AS MATERIALIZED (SELECT src AS node, count(*)::double AS d FROM em GROUP BY 1),
idg AS MATERIALIZED (SELECT dst AS node, count(*)::double AS d FROM em GROUP BY 1),
nn AS (SELECT count(*)::double AS n FROM nodes),
a0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS a FROM nodes),
h0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS h FROM nodes)""",
    ]
    for i in range(1, k + 1):
        p = i - 1
        parts.append(
            f"""ar{i} AS MATERIALIZED (
  SELECT e.dst AS node, sum(h.h / od.d) AS s
  FROM em e JOIN h{p} h ON e.src = h.node JOIN od ON od.node = e.src
  GROUP BY e.dst),
at{i} AS MATERIALIZED (SELECT coalesce(sum(s), 0.0) AS t FROM ar{i}),
a{i} AS MATERIALIZED (
  SELECT n.node,
         CASE WHEN (SELECT t FROM at{i}) > 0
              THEN coalesce(ar.s, 0.0) / (SELECT t FROM at{i})
              ELSE coalesce(ar.s, 0.0) END AS a
  FROM nodes n LEFT JOIN ar{i} ar USING (node)),
hr{i} AS MATERIALIZED (
  SELECT e.src AS node, sum(a.a / idg.d) AS s
  FROM em e JOIN a{i} a ON e.dst = a.node JOIN idg ON idg.node = e.dst
  GROUP BY e.src),
ht{i} AS MATERIALIZED (SELECT coalesce(sum(s), 0.0) AS t FROM hr{i}),
h{i} AS MATERIALIZED (
  SELECT n.node,
         CASE WHEN (SELECT t FROM ht{i}) > 0
              THEN coalesce(hr.s, 0.0) / (SELECT t FROM ht{i})
              ELSE coalesce(hr.s, 0.0) END AS h
  FROM nodes n LEFT JOIN hr{i} hr USING (node))"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT node, round(a, 6) AS authority, round(h, 6) AS hub
FROM a{k} JOIN h{k} USING (node) ORDER BY node"""
    )


_NB_PRED_CTES = f"""tok AS ({_TOK}),
cls AS (SELECT lang, count(*)::bigint AS nd FROM documents GROUP BY lang),
ntot AS (SELECT count(*)::double AS n FROM documents),
tc AS MATERIALIZED (
  SELECT d.lang, t.term, count(*)::bigint AS c
  FROM tok t JOIN documents d USING (doc_id) GROUP BY d.lang, t.term),
ctot AS (SELECT lang, sum(c)::bigint AS tot FROM tc GROUP BY lang),
v AS (SELECT count(DISTINCT term)::double AS v FROM tok),
dtf AS MATERIALIZED (
  SELECT doc_id, term, count(*)::bigint AS tf FROM tok GROUP BY doc_id, term),
ts AS (
  SELECT dtf.doc_id, c.lang,
         sum(dtf.tf * ln((coalesce(tc.c, 0) + 1.0)
                         / (ct.tot + (SELECT v FROM v)))) AS s
  FROM dtf CROSS JOIN cls c
  LEFT JOIN tc ON tc.lang = c.lang AND tc.term = dtf.term
  JOIN ctot ct ON ct.lang = c.lang
  GROUP BY dtf.doc_id, c.lang),
scores AS (
  SELECT d.doc_id, c.lang,
         ln(c.nd / (SELECT n FROM ntot)) + coalesce(ts.s, 0.0) AS score
  FROM documents d CROSS JOIN cls c
  LEFT JOIN ts ON ts.doc_id = d.doc_id AND ts.lang = c.lang),
pred AS (
  SELECT doc_id, lang, score,
         row_number() OVER (
           PARTITION BY doc_id
           ORDER BY round(score, 6) DESC, lang ASC) AS rn
  FROM scores)"""


def _lpa_sql(k: int = 5, edges_cte: str | None = None) -> str:
    """All ``k`` synchronous label-propagation rounds replayed as
    chained (count, argmax) CTE pairs — labels start as node ids,
    each round takes the most frequent neighbor label with ties to
    the SMALLEST label (graph.py::label_propagation's deterministic
    update rule). MATERIALIZED: inlined CTEs re-expand exponentially."""
    return (
        "WITH "
        + _lpa_ctes(k, edges_cte)
        + f"\nSELECT node, lbl AS community FROM l{k} ORDER BY node"
    )


def _lpa_ctes(k: int = 5, edges_cte: str | None = None) -> str:
    """The label-propagation CTE chain (through ``l{k}``) without the
    final SELECT, so compositions can keep building on the labels."""
    parts = [
        edges_cte or _LINK_EDGES_CTE,
        """ce AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM edges WHERE src <> dst),
und AS MATERIALIZED (
  SELECT u AS node, v AS nbr FROM ce UNION ALL SELECT v AS node, u AS nbr FROM ce),
l0 AS MATERIALIZED (SELECT DISTINCT node, node AS lbl FROM und)""",
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""c{i} AS MATERIALIZED (
  SELECT und.node, l{i - 1}.lbl, count(*) AS c
  FROM und JOIN l{i - 1} ON l{i - 1}.node = und.nbr
  GROUP BY und.node, l{i - 1}.lbl),
l{i} AS MATERIALIZED (
  SELECT node, lbl FROM (
    SELECT node, lbl,
           row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl ASC) AS rn
    FROM c{i}) WHERE rn = 1)"""
        )
    return ",\n".join(parts)


def _pagerank_ctes(k: int, d: float, edges_cte: str) -> str:
    """The pagerank replay as a bare CTE chain (terminal rank relation
    ``r{k}(node, r)``) for composition into larger oracles."""
    full = _pagerank_sql(k, d, edges_cte)
    return full[len("WITH ") : full.rindex("\nSELECT node, round")]


_DSIR_W_CTES = f"""toks AS ({_TOKS_LIST}),
pairs AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
  FROM toks WHERE len(toks) >= 2),
tgt AS (SELECT bg, count(*) AS ct FROM pairs JOIN documents USING (doc_id)
        WHERE lang = 'en' GROUP BY bg),
rawc AS (SELECT bg, count(*) AS cr FROM pairs GROUP BY bg),
vv AS (SELECT count(*) AS v FROM rawc),
nt AS (SELECT count(*) AS n FROM pairs p JOIN documents d USING (doc_id) WHERE d.lang = 'en'),
nr AS (SELECT count(*) AS n FROM pairs),
scored AS (
  SELECT p.doc_id,
         ln((coalesce(t.ct, 0) + 1.0) / ((SELECT n FROM nt) + 1.0 * (SELECT v FROM vv)))
       - ln((r.cr + 1.0) / ((SELECT n FROM nr) + 1.0 * (SELECT v FROM vv))) AS lw
  FROM pairs p LEFT JOIN tgt t USING (bg) JOIN rawc r USING (bg)),
agg AS (SELECT doc_id, count(*) AS n_bigrams, sum(lw) AS s FROM scored GROUP BY doc_id)"""


def _langid_values() -> str:
    from dcs_ray.functions.textstats import LANG_MARKERS

    rows = [
        f"('{lang}', '{w}')"
        for lang in sorted(LANG_MARKERS)
        for w in sorted(LANG_MARKERS[lang])
    ]
    return ", ".join(rows)


def _mulmod64(a: str, b: str) -> str:
    """SQL for ``(a*b) mod 2^64`` via 32-bit limbs — hugeint is a signed
    128-bit type, so a direct 64×64 product overflows."""
    B32 = "4294967296"
    return (
        f"((({a}) % {B32}) * (({b}) % {B32})"
        f" + (((({a}) % {B32}) * (({b}) // {B32})"
        f"   + (({a}) // {B32}) * (({b}) % {B32})) % {B32}) * {B32}) % {_M64}"
    )


def _minhash_chain_ctes() -> str:
    """The ENTIRE MinHash+LSH chain of ``dcs_ray.functions.dedup`` —
    word-wise content hash (``textstats.content_hash_rows``: 8-byte-LE
    word polynomial + splitmix64 finalizer), 3-gram shingle Horner
    combine, 64 mod-(2^61−1) permutations (constants from the same
    seeded rng, inlined), 16×4 FNV band hashes — replayed bit-exactly
    in DuckDB hugeint arithmetic, as a CTE list ending at
    ``bh(doc_id, band, bhash)`` (plus ``tok(doc_id, t, pos)``) so the
    pair/verify/cluster oracles can compose on top."""
    OFF = "14695981039346656037"
    P = str(0x9E3779B97F4A7C15)
    MIX1 = str(0xBF58476D1CE4E5B9)
    MIX2 = str(0x94D049BB133111EB)
    P256 = "list_value(" + ",".join(str(1 << (8 * i)) for i in range(8)) + ")"
    PRIME = "1099511628211"
    MERS = str((1 << 61) - 1)
    rng = np.random.default_rng(7)  # same seed as minhash_signatures
    a = rng.integers(1, (1 << 61) - 1, 64, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, 64, dtype=np.uint64)
    perms = ", ".join(
        f"({p}, {int(a[p])}::hugeint, {int(b[p])}::hugeint)" for p in range(64)
    )
    tokhash = f"""
list_reduce(
  list_prepend({OFF}::hugeint,
    list_transform(range(0, greatest((length(t)+7)//8, 1)), j ->
      list_sum(list_transform(range(0, 8), i ->
        CASE WHEN j*8+i < length(t)
             THEN ascii(substr(t, (j*8+i+1)::int, 1))::hugeint * ({P256})[i+1]
             ELSE 0::hugeint END)))),
  (h, w) -> ({_mulmod64('h', P + '::hugeint')} + w) % {_M64})
"""
    return f"""
tokl AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM documents
),
tok AS (SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS pos FROM tokl),
dtok AS (SELECT DISTINCT t FROM tok),
th0 AS (SELECT t, ({tokhash}) AS hp FROM dtok),
th1 AS (SELECT t, xor(hp::ubigint, length(t)::ubigint)::hugeint AS h1 FROM th0),
th2 AS (SELECT t, ({_mulmod64("xor(h1::ubigint, h1::ubigint >> 30)::hugeint", MIX1 + "::hugeint")}) AS h2 FROM th1),
th3 AS (SELECT t, ({_mulmod64("xor(h2::ubigint, h2::ubigint >> 27)::hugeint", MIX2 + "::hugeint")}) AS h3 FROM th2),
th  AS (SELECT t, xor(h3::ubigint, h3::ubigint >> 31)::hugeint AS h FROM th3),
seq AS (
  SELECT tok.doc_id, tok.pos, th.h,
         lead(th.h, 1) OVER w AS h1n, lead(th.h, 2) OVER w AS h2n
  FROM tok JOIN th USING (t) WINDOW w AS (PARTITION BY tok.doc_id ORDER BY tok.pos)
),
sh AS (
  SELECT doc_id, ((({_mulmod64('h', PRIME + '::hugeint')}) + h1n) % {_M64}) AS acc1, h2n
  FROM seq WHERE h2n IS NOT NULL
),
sh2 AS (SELECT doc_id, ((({_mulmod64('acc1', PRIME + '::hugeint')}) + h2n) % {_M64}) AS s FROM sh),
bases AS (SELECT doc_id, s % {MERS} AS base FROM sh2),
perms(p, pa, pb) AS (VALUES {perms}),
hv AS (SELECT doc_id, p, ((pa * base + pb) % {_M64}) % {MERS} AS v FROM bases CROSS JOIN perms),
smin AS (SELECT doc_id, p, min(v) AS mv FROM hv GROUP BY doc_id, p),
sigs AS (
  SELECT d.doc_id, pr.p, coalesce(sm.mv, 18446744073709551615::hugeint) AS sv
  FROM documents d CROSS JOIN perms pr
  LEFT JOIN smin sm ON sm.doc_id = d.doc_id AND sm.p = pr.p
),
bandl AS (
  SELECT doc_id, p // 4 AS band, list(sv ORDER BY p) AS svs
  FROM sigs GROUP BY doc_id, p // 4
),
bh AS (
  SELECT doc_id, band,
    ((xor(list_reduce(list_prepend(1469598103934665603::hugeint, svs),
          (h, s) -> (xor(h::ubigint, s::ubigint)::hugeint * {PRIME}) % {_M64})::ubigint,
         band::ubigint))::hugeint * {PRIME}) % {_M64} AS bhash
  FROM bandl
)"""


def _minhash_pairs_sql() -> str:
    return f"""
WITH {_minhash_chain_ctes()}
SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
FROM bh x JOIN bh y ON x.bhash = y.bhash AND x.doc_id < y.doc_id
ORDER BY id_a, id_b
"""


def _verify_chain_ctes() -> str:
    """Candidate pairs from the band hashes + exact shingle-set Jaccard
    verify (``dedup.jaccard_verify_pairs`` semantics: union of distinct
    3-gram shingles; empty-vs-empty union ⇒ jaccard 1.0), ending at
    ``verified(id_a, id_b, jaccard)`` with jaccard >= 0.5."""
    return f"""{_minhash_chain_ctes()},
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM bh x JOIN bh y ON x.bhash = y.bhash AND x.doc_id < y.doc_id
),
shw AS (
  SELECT doc_id, t || ' ' || lead(t, 1) OVER w2 || ' ' || lead(t, 2) OVER w2 AS shingle
  FROM tok WINDOW w2 AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(t, 2) OVER w2 IS NOT NULL
),
dsh AS (SELECT DISTINCT doc_id, shingle FROM shw),
ssz AS (SELECT doc_id, count(*) AS sz FROM dsh GROUP BY doc_id),
pint AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN dsh a ON a.doc_id = c.id_a
  JOIN dsh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY c.id_a, c.id_b
),
verified AS (
  SELECT id_a, id_b, jaccard FROM (
    SELECT c.id_a, c.id_b,
           CASE WHEN coalesce(za.sz,0) + coalesce(zb.sz,0) - coalesce(p.i,0) = 0
                THEN 1.0
                ELSE coalesce(p.i,0)::double
                     / (coalesce(za.sz,0) + coalesce(zb.sz,0) - coalesce(p.i,0))
           END AS jaccard
    FROM cand c
    LEFT JOIN pint p ON p.id_a = c.id_a AND p.id_b = c.id_b
    LEFT JOIN ssz za ON za.doc_id = c.id_a
    LEFT JOIN ssz zb ON zb.doc_id = c.id_b
  ) WHERE jaccard >= 0.5
)"""


def _jaccard_verified_sql() -> str:
    return f"""
WITH {_verify_chain_ctes()}
SELECT id_a, id_b, jaccard FROM verified ORDER BY id_a, id_b
"""


def _fuzzy_dedup_sql() -> str:
    """minhash→verify→connected components (recursive min-label
    propagation) → keep min id per cluster — the full
    ``dedup.fuzzy_dedup_keep`` pipeline in one statement."""
    return f"""
WITH RECURSIVE {_verify_chain_ctes()},
sym AS (
  SELECT id_a AS u, id_b AS v FROM verified
  UNION ALL SELECT id_b, id_a FROM verified
),
reach(node, label) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM sym)
  UNION
  SELECT s.v, r.label FROM reach r JOIN sym s ON s.u = r.node
),
lab AS (SELECT node, min(label) AS comp FROM reach GROUP BY node)
SELECT d.doc_id FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM lab l WHERE l.node = d.doc_id AND l.comp < d.doc_id)
ORDER BY doc_id
"""


def _connected_components_sql(tail: str | None = None) -> str:
    """Recursive-CTE min-label propagation over the deterministic
    event-derived edge set (same construction as
    ``_q_connected_components``). ``tail`` overrides the final SELECT
    (it sees CTE ``labels(node, component)``)."""
    return """
WITH RECURSIVE edges AS (
  SELECT event_id::bigint AS u,
         ((event_id // 20) * 20 + (event_id * 13 + 5) % 20)::bigint AS v
  FROM events
),
canon AS (SELECT DISTINCT greatest(u, v) AS u, least(u, v) AS v FROM edges WHERE u <> v),
sym AS (SELECT u, v FROM canon UNION ALL SELECT v, u FROM canon),
reach(node, label) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM sym)
  UNION
  SELECT s.v, r.label FROM reach r JOIN sym s ON s.u = r.node
),
labels AS (
  SELECT node::bigint AS node, min(label)::bigint AS component
  FROM reach GROUP BY node
)
""" + (
        tail
        or "SELECT node, component FROM labels ORDER BY node"
    )


def _pow2_values() -> str:
    return ", ".join(f"({b}, {1 << b}::hugeint)" for b in range(64))


_QC_CTES = f"""tok AS ({_TOK}),
agg AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN term IN ('the','a','of','to','and','in','is','it') THEN 1 ELSE 0 END) AS n_stop,
         sum(length(term)) AS sum_len
  FROM tok GROUP BY doc_id),
feats AS (
  SELECT d.doc_id,
         coalesce(a.n_tokens,0)::bigint AS n_tokens,
         coalesce(round(a.n_stop::double / a.n_tokens, 6), 0.0) AS stop_ratio,
         coalesce(round(a.sum_len::double / a.n_tokens, 6), 0.0) AS mean_len
  FROM documents d LEFT JOIN agg a USING (doc_id)),
z AS (
  SELECT doc_id,
         -2.0 + 0.45 * ln(1.0 + n_tokens) + 4.0 * stop_ratio + (-0.15) * mean_len AS zv
  FROM feats),
qprob AS (SELECT doc_id, round(1.0 / (1.0 + exp(-zv)), 6) AS p FROM z)"""


def _markov_sql(k: int) -> str:
    """Generated power-iteration CTE chain for the stationary
    event-type distribution: row-normalized transition probabilities,
    v₀ uniform, each step vᵢ₊₁ ∝ vᵢ·P renormalized (mirrors
    ``functions/stats.markov_stationary``)."""
    steps = []
    for i in range(1, k + 1):
        steps.append(
            f"""r{i} AS (
  SELECT ty.event_type, coalesce(sum(v{i - 1}.pr * p.p), 0.0) AS pr
  FROM ty LEFT JOIN p ON p.nxt = ty.event_type
          LEFT JOIN v{i - 1} ON v{i - 1}.event_type = p.prev
  GROUP BY ty.event_type),
v{i} AS (SELECT event_type, pr / (SELECT sum(pr) FROM r{i}) AS pr FROM r{i})"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH tr AS (
  SELECT prev, event_type AS nxt, count(*)::double AS n FROM (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_type) AS prev
    FROM events) s
  WHERE prev IS NOT NULL GROUP BY 1, 2),
rs AS (SELECT prev, sum(n) AS tot FROM tr GROUP BY prev),
p AS (SELECT tr.prev, tr.nxt, tr.n / rs.tot AS p FROM tr JOIN rs USING (prev)),
ty AS (SELECT DISTINCT event_type FROM events),
v0 AS (SELECT event_type, 1.0 / (SELECT count(*) FROM ty) AS pr FROM ty),
{chain}
SELECT event_type, round(pr, 6) AS pr FROM v{k} ORDER BY event_type
"""

