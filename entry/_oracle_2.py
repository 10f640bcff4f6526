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
    _feed_alerts_sql,
    _ivf_knn_hashmin_sql,
    _lsh_knn_sql,
    _verify_chain_ctes,
    REGEX,
    LITERAL,
    _BM25_SCORES,
    _BOOT_B,
    _BOOT_M,
    _BOOT_SEED,
    _DAILY_SQL,
    _FNV_TOK,
    _LINK_EDGES_CTE,
    _M64,
    _MIX_TOTAL,
    _MIX_WEIGHTS,
    _PQ_ITER,
    _PQ_K,
    _PQ_M,
    _PQ_SUBDIM,
    _QC_CTES,
    _TOK,
    _TOKS_LIST,
    _cms_heavy_hitters_sql,
    _hll_registers_sql,
    _image_features_jpeg_sql,
    _interleave_sql,
    _kmeans_ch_sql,
    _kmeans_db_sql,
    _kmeans_sil_sql,
    _knn_pq_adc_sql,
    _langid_values,
    _lpa_ctes,
    _markov_entropy_sql,
    _markov_sql,
    _media_expected_sql,
    _minhash_chain_ctes,
    _mulmod64,
    _pagerank_convergence_sql,
    _pow2_values,
    _pq_codes_sql,
    _salsa_sql,
    _splitmix_docs_ctes,
    _strhash64_sql,
    _term_hash64_sql,
    _textrank_sql,
    _video_frames_mjpeg_sql,
)


def _unigram_dp_sql(max_len: int = 8, max_piece: int = 4) -> str:
    """Unrolled Viterbi DP for the ``unigram_lm_cost`` oracle: given
    CTEs ``words(term)`` and ``pieces(g, cost)`` (singles guaranteed
    present, so every prefix position is reachable), produces
    ``sp`` (piece spans), ``d1..d{max_len}`` (min cost to each prefix
    length) and ``wc(term, d)`` (min cost of the full word). The
    {max_len}-position unroll is sized to the SYNTHESIZED corpus
    vocabulary (max term length 8 at both SFs) — the tokenizer itself
    imposes NO length cap, so ``_q_unigram_lm_cost`` asserts the bound
    engine-side before relying on it (a longer token would otherwise
    fail the gate loudly, not silently)."""
    parts = [
        f"""sp AS MATERIALIZED (
  SELECT w.term, p.p::bigint AS p, l.L::bigint AS L, pc.cost
  FROM words w, range(1, {max_len + 1}) p(p), range(1, {max_piece + 1}) l(L), pieces pc
  WHERE l.L <= p.p AND p.p <= length(w.term)
    AND pc.g = substr(w.term, (p.p - l.L + 1)::int, l.L::int)
)"""
    ]
    for p in range(1, max_len + 1):
        whens = []
        joins = []
        for L in range(1, min(max_piece, p) + 1):
            base = "0" if p - L == 0 else f"d{p - L}.d"
            whens.append(f"WHEN {L} THEN {base}")
            if p - L >= 1:
                joins.append(f"LEFT JOIN d{p - L} ON d{p - L}.term = sp.term")
        parts.append(
            f"""d{p} AS MATERIALIZED (
  SELECT sp.term,
         min(sp.cost + CASE sp.L {' '.join(whens)} END)::bigint AS d
  FROM sp
  {chr(10).join(joins)}
  WHERE sp.p = {p}
  GROUP BY sp.term
)"""
        )
    union = " UNION ALL ".join(
        f"SELECT w.term, d{p}.d FROM words w JOIN d{p} ON d{p}.term = w.term "
        f"WHERE length(w.term) = {p}"
        for p in range(1, max_len + 1)
    )
    parts.append(f"wc AS MATERIALIZED ({union})")
    return ",\n".join(parts)


def part_2() -> dict[str, str]:
    tris = sorted({LITERAL[i : i + 3] for i in range(len(LITERAL) - 2)})
    tri_conds = " AND ".join(f"contains(text, '{t}')" for t in tris)
    return {
        "train_val_test_split": f"""
WITH {_splitmix_docs_ctes(17)}
SELECT doc_id,
       CASE WHEN h < 14757395258967642112 THEN 'train'
            WHEN h < 16602069666338596864 THEN 'val'
            ELSE 'test' END AS split
FROM hf ORDER BY doc_id
""",
        "bm25_page2": f"""
WITH {_BM25_SCORES}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10 OFFSET 10
""",
        "bm25_multi": f"""
WITH tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl)::double / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
q(query_id, term) AS (SELECT * FROM (VALUES
  (0, 'spark'), (0, 'merge'), (0, 'join'),
  (1, 'customer'), (1, 'window'), (1, 'batch'),
  (2, 'vector'), (2, 'column'), (2, 'agg'))),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl)) ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) JOIN q ON tf.term = q.term, stats
  GROUP BY q.query_id, tf.doc_id
),
rk AS (SELECT query_id, doc_id, score,
              row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rn
       FROM scores)
SELECT query_id::bigint AS query_id, rn::bigint AS rank, doc_id,
       round(score, 6) AS score
FROM rk WHERE rn <= 5 ORDER BY query_id, rank
""",
        "doc_lm_score": f"""
WITH toks AS ({_TOKS_LIST}),
pairs AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS w1,
         unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
  FROM toks WHERE len(toks) >= 2),
uni AS (SELECT term, count(*) AS c1 FROM ({_TOK}) GROUP BY term),
vv AS (SELECT count(*) AS v FROM uni),
bgc AS (SELECT bg, count(*) AS c12 FROM pairs GROUP BY bg),
scored AS (
  SELECT p.doc_id, ln((bgc.c12 + 1.0) / (uni.c1 + 1.0 * vv.v)) AS lp
  FROM pairs p JOIN bgc USING (bg) JOIN uni ON p.w1 = uni.term, vv),
agg AS (SELECT doc_id, count(*) AS n_bigrams, sum(lp) AS s FROM scored GROUP BY doc_id)
SELECT d.doc_id, coalesce(a.n_bigrams, 0)::bigint AS n_bigrams,
       coalesce(round(a.s / a.n_bigrams, 6), 0.0) AS avg_logprob
FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id
""",
        "ccnet_perplexity_buckets": f"""
WITH toks AS ({_TOKS_LIST}),
pairs AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS w1,
         unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
  FROM toks WHERE len(toks) >= 2),
uni AS (SELECT term, count(*) AS c1 FROM ({_TOK}) GROUP BY term),
vv AS (SELECT count(*) AS v FROM uni),
bgc AS (SELECT bg, count(*) AS c12 FROM pairs GROUP BY bg),
scored AS (
  SELECT p.doc_id, ln((bgc.c12 + 1.0) / (uni.c1 + 1.0 * vv.v)) AS lp
  FROM pairs p JOIN bgc USING (bg) JOIN uni ON p.w1 = uni.term, vv),
agg AS (SELECT doc_id, count(*) AS n_bigrams, sum(lp) AS s FROM scored GROUP BY doc_id),
sc AS (SELECT d.doc_id, d.lang,
              coalesce(round(a.s / a.n_bigrams, 6), 0.0) AS s
       FROM documents d LEFT JOIN agg a USING (doc_id)),
rk AS (SELECT doc_id, lang,
              row_number() OVER (PARTITION BY lang
                                 ORDER BY s DESC, doc_id) - 1 AS r,
              count(*) OVER (PARTITION BY lang) AS n
       FROM sc)
SELECT doc_id, lang,
       CASE WHEN 3 * r < n THEN 'head'
            WHEN 3 * r < 2 * n THEN 'middle' ELSE 'tail' END AS bucket
FROM rk ORDER BY doc_id
""",
        "rebalance_mixture": f"""
WITH {_splitmix_docs_ctes(5)},
cnt AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang),
w(lang, wnum) AS (SELECT * FROM (VALUES {", ".join(f"('{g}', {n})" for g, n in sorted(_MIX_WEIGHTS.items()))})),
thr AS (SELECT cnt.lang,
               least(18446744073709551616::hugeint * {_MIX_TOTAL} * w.wnum
                       // ({sum(_MIX_WEIGHTS.values())} * cnt.c),
                     18446744073709551615::hugeint) AS t
        FROM cnt JOIN w USING (lang))
SELECT hf.doc_id, hf.lang FROM hf JOIN thr USING (lang)
WHERE hf.h < thr.t ORDER BY hf.doc_id
""",
        "cross_snapshot_dedup": """
SELECT doc_id FROM documents
WHERE text NOT IN (SELECT text FROM documents WHERE doc_id % 2 = 0)
ORDER BY doc_id
""",
        "quality_filter": """
WITH cut AS (SELECT lang, quantile_disc(n_chars, 0.1) AS c FROM documents GROUP BY lang)
SELECT doc_id, d.lang, n_chars FROM documents d JOIN cut USING (lang)
WHERE n_chars >= c ORDER BY doc_id
""",
        "lang_quantiles": """
SELECT lang, 0.5 AS q, quantile_disc(n_chars, 0.5) AS value FROM documents GROUP BY lang
UNION ALL
SELECT lang, 0.9 AS q, quantile_disc(n_chars, 0.9) AS value FROM documents GROUP BY lang
UNION ALL
SELECT lang, 0.99 AS q, quantile_disc(n_chars, 0.99) AS value FROM documents GROUP BY lang
ORDER BY lang, q
""",
        "canonical_url_dedup": r"""
WITH u AS (
  SELECT doc_id,
    CASE WHEN doc_id % 2 = 0 THEN
      'https://WWW.example' || ((doc_id // 2) % 97) || '.ORG/p/' || (doc_id // 2)
        || '/?utm_source=x'
        || CASE WHEN (doc_id // 2) % 3 = 0 THEN '&b=2&a=1' ELSE '' END
    ELSE
      'https://example' || ((doc_id // 2) % 97) || '.org:443/p/' || (doc_id // 2)
        || '?gclid=g'
        || CASE WHEN (doc_id // 2) % 3 = 0 THEN '&a=1&b=2' ELSE '' END
    END AS url
  FROM documents),
p AS (
  SELECT doc_id,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS host0,
    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS path0,
    regexp_extract(url, '\?([^#]*)', 1) AS q0
  FROM u),
c AS (
  SELECT doc_id,
    scheme || '://' ||
    CASE WHEN scheme = 'http'
         THEN regexp_replace(regexp_replace(host0, '^www\.', ''), ':80$', '')
         WHEN scheme = 'https'
         THEN regexp_replace(regexp_replace(host0, '^www\.', ''), ':443$', '')
         ELSE regexp_replace(host0, '^www\.', '') END ||
    CASE WHEN path0 = '' THEN '/' ELSE regexp_replace(path0, '^(.+?)/+$', '\1') END ||
    CASE WHEN len(qp) = 0 THEN '' ELSE '?' || array_to_string(qp, '&') END
      AS canonical_url
  FROM (SELECT *, list_sort(list_filter(str_split(q0, '&'),
          x -> x <> '' AND NOT regexp_matches(x,
               '^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid|ref)(=|$)'))) AS qp
        FROM p))
SELECT doc_id::bigint AS doc_id, canonical_url,
       (CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY canonical_url)
             THEN 1 ELSE 0 END)::int AS keep
FROM c ORDER BY doc_id
""",
        "host_stats": """
WITH pages AS (
  SELECT source || '.example.org' AS host, length(text)::bigint AS tc FROM documents
  UNION ALL
  SELECT source || '.example.org' AS host,
         length(substr(text, 1, greatest(1, length(text) // 2)))::bigint AS tc
  FROM documents WHERE doc_id % 50 = 0
)
SELECT host, count(*)::bigint AS n_pages, sum(tc)::bigint AS total_text_chars
FROM pages GROUP BY host ORDER BY host
""",
        "normalize_text": """
SELECT doc_id, trim(regexp_replace(lower(nfc_normalize(text)), '\\s+', ' ', 'g')) AS norm_text
FROM documents ORDER BY doc_id
""",
        "bigram_topk": """
WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text),'[^a-z0-9]+'), x -> x <> '') AS toks FROM documents),
u AS (SELECT doc_id, unnest(generate_series(1, len(toks)-1)) AS i, toks FROM d WHERE len(toks) >= 2)
SELECT toks[i] || ' ' || toks[i+1] AS bigram, count(*)::bigint AS n
FROM u GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50
""",
        "pack_chunked": """
WITH tc AS (
  SELECT doc_id, (doc_id % 16)::bigint AS bucket,
         len(list_filter(regexp_split_to_array(lower(text),'[^a-z0-9]+'), x -> x <> ''))::bigint AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, bucket, n_tokens,
         (sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id) - n_tokens)::bigint AS prior
  FROM tc)
SELECT doc_id, bucket, n_tokens,
       (prior // 256)::bigint AS seq_id, (prior % 256)::bigint AS seq_offset
FROM c ORDER BY doc_id
""",
        "heavy_hitters_event_type": """
SELECT event_type, count(*)::bigint AS n_rows FROM events
GROUP BY event_type ORDER BY n_rows DESC, event_type ASC LIMIT 3
""",
        "asof_join_purchase_view": """
WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us FROM events),
l AS (SELECT * FROM e WHERE event_type = 'purchase'),
r AS (SELECT * FROM e WHERE event_type = 'view')
SELECT l.event_id::bigint AS event_id, l.user_id::bigint AS user_id,
       l.ts_us::bigint AS ts_us,
       r.event_id::bigint AS event_id_right, r.value AS value_right
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
ORDER BY l.event_id
""",
        "sample_fraction": f"""
WITH {_splitmix_docs_ctes(42)}
SELECT doc_id, text, lang, source, n_chars FROM hf
WHERE h < {int(0.2 * 2 ** 64)} ORDER BY doc_id
""",
        "weighted_sample": f"""
WITH {_splitmix_docs_ctes(13)},
keys AS (
  SELECT doc_id, n_chars::bigint AS weight,
         ln((h::double + 0.5) / 18446744073709551616.0) / n_chars AS k
  FROM hf WHERE n_chars > 0)
SELECT doc_id, weight, round(k, 6) AS sel_key
FROM keys ORDER BY k DESC, doc_id ASC LIMIT 100
""",
        "weighted_sample_by_lang": f"""
WITH {_splitmix_docs_ctes(13)},
keys AS (
  SELECT lang, doc_id, n_chars::bigint AS weight,
         ln((h::double + 0.5) / 18446744073709551616.0) / n_chars AS k
  FROM hf WHERE n_chars > 0)
SELECT lang, doc_id, weight, round(k, 6) AS sel_key
FROM (
  SELECT lang, doc_id, weight, k,
         row_number() OVER (
           PARTITION BY lang ORDER BY k DESC, doc_id ASC) AS rn
  FROM keys) WHERE rn <= 20
ORDER BY lang, sel_key DESC, doc_id
""",
        "sample_stratified": f"""
WITH {_splitmix_docs_ctes(1)},
rk AS (
  SELECT doc_id, text, lang, source, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
  FROM hf)
SELECT doc_id, text, lang, source, n_chars FROM rk WHERE rn <= 5 ORDER BY doc_id
""",
        "ngram_jaccard_pairs": """
WITH tokl AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks FROM documents
),
tok AS (
  SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS pos FROM tokl
),
sh AS (
  SELECT doc_id, t || ' ' || lead(t, 1) OVER w || ' ' || lead(t, 2) OVER w AS shingle
  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(t, 2) OVER w IS NOT NULL
),
ds AS (SELECT DISTINCT doc_id, shingle FROM sh),
sizes AS (SELECT doc_id, count(*) AS sz FROM ds GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM ds a JOIN ds b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT id_a, id_b, c::double / (sa.sz + sb.sz - c) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE c::double / (sa.sz + sb.sz - c) >= 0.5
ORDER BY id_a, id_b
""",
        "duplicate_tile_spans": f"""
WITH tl AS (
  SELECT doc_id, unnest(range(0, length(text) // 32)) AS i, text FROM documents
),
grams AS (SELECT doc_id, substr(text, (i * 32) + 1, 32) AS term FROM tl),
terms AS (SELECT DISTINCT term FROM grams),
{_strhash64_sql(4)},
occ AS (SELECT doc_id, h FROM grams JOIN th USING (term)),
perdoc AS (SELECT h, doc_id, count(*) AS cnt FROM occ GROUP BY 1, 2),
tot AS (SELECT h, sum(cnt) AS total FROM perdoc GROUP BY 1),
dup AS (SELECT doc_id, sum(cnt) AS d FROM perdoc JOIN tot USING (h)
        WHERE total >= 2 GROUP BY 1)
SELECT doc.doc_id,
       coalesce(dup.d, 0)::bigint AS dup_tiles,
       (length(doc.text) // 32)::bigint AS total_tiles
FROM documents doc LEFT JOIN dup ON doc.doc_id = dup.doc_id
ORDER BY doc.doc_id
""",
        "simhash_signatures": f"""
WITH tok AS ({_TOK}),
tokh AS (
  SELECT term, ({_FNV_TOK.format(t='term')})::ubigint AS h
  FROM (SELECT DISTINCT term FROM tok)),
bits AS (
  SELECT t.doc_id, p.bit, p.pw,
         sum(CASE WHEN (th.h >> p.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM tok t JOIN tokh th USING (term)
  CROSS JOIN (VALUES {_pow2_values()}) p(bit, pw)
  GROUP BY t.doc_id, p.bit, p.pw),
sig AS (
  SELECT doc_id, sum(CASE WHEN s > 0 THEN pw ELSE 0::hugeint END) AS v
  FROM bits GROUP BY doc_id)
SELECT d.doc_id,
       (CASE WHEN coalesce(v, 0) >= 9223372036854775808
             THEN coalesce(v, 0) - {_M64}
             ELSE coalesce(v, 0) END)::bigint AS simhash
FROM documents d LEFT JOIN sig USING (doc_id) ORDER BY doc_id
""",
        "simhash_pairs": f"""
WITH tok AS ({_TOK}),
tokh AS (
  SELECT term, ({_FNV_TOK.format(t='term')})::ubigint AS h
  FROM (SELECT DISTINCT term FROM tok)),
bits AS (
  SELECT t.doc_id, p.bit, p.pw,
         sum(CASE WHEN (th.h >> p.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM tok t JOIN tokh th USING (term)
  CROSS JOIN (VALUES {_pow2_values()}) p(bit, pw)
  GROUP BY t.doc_id, p.bit, p.pw),
sig AS (
  SELECT doc_id, sum(CASE WHEN s > 0 THEN pw ELSE 0::hugeint END) AS v
  FROM bits GROUP BY doc_id),
u AS (
  SELECT d.doc_id, coalesce(s.v, 0)::ubigint AS uv
  FROM documents d LEFT JOIN sig s USING (doc_id))
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.uv, b.uv))::bigint AS hamming
FROM u a JOIN u b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.uv, b.uv)) <= 3
ORDER BY id_a, id_b
""",
        "label_centroids": """
WITH e AS (SELECT label, unnest(embedding) AS v, unnest(range(len(embedding))) AS dim
           FROM embeddings)
SELECT label::bigint AS label, dim::bigint AS dim,
       avg(v::double) AS centroid, count(*)::bigint AS n_vecs
FROM e GROUP BY label, dim ORDER BY label, dim
""",
        "centroid_classify": """
WITH e AS (SELECT label, unnest(embedding)::double AS v,
                  unnest(range(len(embedding))) AS dim
           FROM embeddings),
c AS (SELECT label, dim, avg(v) AS centroid FROM e GROUP BY label, dim),
q AS (SELECT vec_id AS qid, unnest(embedding)::double AS qv,
             unnest(range(len(embedding))) AS dim
      FROM embeddings WHERE vec_id < 5),
s AS (
  SELECT q.qid, c.label,
         sum(q.qv * c.centroid)
           / (sqrt(sum(q.qv * q.qv)) * sqrt(sum(c.centroid * c.centroid))) AS cs
  FROM q JOIN c USING (dim) GROUP BY q.qid, c.label)
SELECT qid::bigint AS query_vec_id, label::bigint AS pred_label,
       round(cs, 6) AS cos_sim
FROM (
  SELECT qid, label, cs,
         row_number() OVER (PARTITION BY qid ORDER BY cs DESC, label ASC) AS rn
  FROM s) WHERE rn = 1
ORDER BY qid
""",
        "embedding_outliers": """
WITH e AS (SELECT label, unnest(embedding)::double AS v,
                  unnest(range(len(embedding))) AS dim
           FROM embeddings),
c AS (SELECT label, dim, avg(v) AS centroid FROM e GROUP BY label, dim),
p AS (SELECT vec_id, label, unnest(embedding)::double AS x,
             unnest(range(len(embedding))) AS dim
      FROM embeddings),
s AS (
  SELECT p.vec_id, p.label,
         sum(p.x * c.centroid)
           / (sqrt(sum(p.x * p.x)) * sqrt(sum(c.centroid * c.centroid))) AS cs
  FROM p JOIN c ON c.label = p.label AND c.dim = p.dim
  GROUP BY p.vec_id, p.label)
SELECT vec_id::bigint AS vec_id, label::bigint AS label,
       round(cs, 6) AS cos_to_centroid
FROM s ORDER BY cs ASC, vec_id ASC LIMIT 50
""",
        "knn_label_classify": """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
pairs AS (
  SELECT q.qid, e.vec_id, e.label,
         unnest(e.embedding)::double AS x, unnest(q.qe)::double AS y
  FROM embeddings e, q WHERE e.vec_id <> q.qid),
sims AS (
  SELECT qid, vec_id, label,
         sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS cs
  FROM pairs GROUP BY qid, vec_id, label),
nn AS (
  SELECT qid, label FROM (
    SELECT qid, label,
           row_number() OVER (PARTITION BY qid ORDER BY cs DESC, vec_id ASC) AS rn
    FROM sims) WHERE rn <= 10),
votes AS (SELECT qid, label, count(*)::bigint AS c FROM nn GROUP BY qid, label)
SELECT qid::bigint AS query_vec_id, label::bigint AS pred_label, c AS votes
FROM (
  SELECT qid, label, c,
         row_number() OVER (PARTITION BY qid ORDER BY c DESC, label ASC) AS rn
  FROM votes) WHERE rn = 1
ORDER BY qid
""",
        "knn_cosine": """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
pairs AS (
  SELECT e.vec_id, unnest(e.embedding)::double AS x, unnest(qe)::double AS y
  FROM embeddings e, q
),
sims AS (
  SELECT vec_id, sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS cos_sim
  FROM pairs GROUP BY vec_id
)
SELECT row_number() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS rank,
       vec_id::bigint AS vec_id, round(cos_sim, 6) AS cos_sim
FROM sims ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
""",
        "benford_first_digit": """
WITH c AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v FROM orders),
d AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM c),
g AS (SELECT digit, count(*)::bigint AS n FROM d GROUP BY digit),
t AS (SELECT sum(n)::bigint AS tot FROM g)
SELECT digit, n, round(n::double / t.tot::double, 6) AS share,
       round(log10(1.0 + 1.0 / digit::double), 6) AS benford_p
FROM g, t ORDER BY digit
""",
        "cusum_daily_events": """
WITH d AS (SELECT (epoch_us(ts) // 86400000000)::bigint AS day,
                  count(*)::bigint AS n
           FROM events GROUP BY 1),
m AS (SELECT sum(n)::double / count(*)::double AS mu FROM d)
SELECT day, n,
       round(sum(n::double - m.mu) OVER (ORDER BY day
             ROWS UNBOUNDED PRECEDING), 6) AS cusum
FROM d, m ORDER BY day
""",
        "spearman_chars_tokens": f"""
WITH tc AS (
  SELECT d.doc_id, d.n_chars::bigint AS x, coalesce(c.n, 0)::bigint AS y
  FROM documents d LEFT JOIN (
    SELECT doc_id, count(*) AS n FROM ({_TOK}) GROUP BY doc_id) c USING (doc_id)),
r AS (SELECT
   (2 * rank() OVER (ORDER BY x) + count(*) OVER (PARTITION BY x) - 1)::bigint AS rx,
   (2 * rank() OVER (ORDER BY y) + count(*) OVER (PARTITION BY y) - 1)::bigint AS ry
  FROM tc),
s AS (SELECT count(*)::hugeint AS n, sum(rx)::hugeint AS sx, sum(ry)::hugeint AS sy,
             sum(rx*rx)::hugeint AS sxx, sum(ry*ry)::hugeint AS syy,
             sum(rx*ry)::hugeint AS sxy
      FROM r)
SELECT n::bigint AS n_docs,
       round((n*sxy - sx*sy)::double
             / (sqrt((n*sxx - sx*sx)::double) * sqrt((n*syy - sy*sy)::double)),
             6) AS spearman_rho
FROM s
""",
        "ks_length_by_lang": """
WITH lc AS (SELECT lang, count(*)::bigint AS n FROM documents GROUP BY lang),
top2 AS (SELECT lang, n,
                row_number() OVER (ORDER BY n DESC, lang ASC) AS rn FROM lc),
la AS (SELECT lang, n FROM top2 WHERE rn = 1),
lb AS (SELECT lang, n FROM top2 WHERE rn = 2),
g AS (SELECT n_chars AS v,
        count(*) FILTER (WHERE lang = (SELECT lang FROM la))::bigint AS ca,
        count(*) FILTER (WHERE lang = (SELECT lang FROM lb))::bigint AS cb
      FROM documents
      WHERE lang IN ((SELECT lang FROM la), (SELECT lang FROM lb))
      GROUP BY v),
c AS (SELECT sum(ca) OVER (ORDER BY v) AS cuma,
             sum(cb) OVER (ORDER BY v) AS cumb FROM g)
SELECT (SELECT lang FROM la) AS lang_a, (SELECT lang FROM lb) AS lang_b,
       (SELECT n FROM la)::bigint AS n_a, (SELECT n FROM lb)::bigint AS n_b,
       round(max(abs(cuma::double / (SELECT n FROM la)::double
                     - cumb::double / (SELECT n FROM lb)::double)), 6) AS ks_stat
FROM c
""",
        "markov_stationary": _markov_sql(5),
        "session_type_pairs": """
WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type FROM events),
flag AS (
  SELECT user_id, t, event_type,
         CASE WHEN lag(t) OVER w IS NULL
              OR t - lag(t) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_type)),
sess AS (
  SELECT user_id, event_type,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY t, event_type
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flag),
st AS (SELECT DISTINCT user_id, sid, event_type FROM sess),
p AS (SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM st a JOIN st b USING (user_id, sid)
      WHERE a.event_type < b.event_type)
SELECT type_a, type_b, count(*)::bigint AS n
FROM p GROUP BY 1, 2 ORDER BY 1, 2
""",
        "hapax_ratio_by_lang": f"""
WITH tok AS ({_TOK}),
lt AS (SELECT d.lang, t.term, count(*)::bigint AS n
       FROM tok t JOIN documents d USING (doc_id) GROUP BY 1, 2)
SELECT lang, count(*)::bigint AS vocab,
       sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::bigint AS hapax,
       round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::double
               / count(*)::double, 6) AS hapax_ratio
FROM lt GROUP BY lang ORDER BY lang
""",
        "roc_auc_quality": f"""
WITH {_QC_CTES},
lab AS (SELECT q.doc_id, q.p,
               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
        FROM qprob q JOIN documents d USING (doc_id)),
r AS (SELECT y,
             (2 * rank() OVER (ORDER BY p)
              + count(*) OVER (PARTITION BY p) - 1)::bigint AS r2
      FROM lab),
s AS (SELECT sum(CASE WHEN y = 1 THEN r2 ELSE 0 END)::hugeint AS s2,
             sum(y)::hugeint AS n1, count(*)::hugeint AS n FROM r)
SELECT n1::bigint AS n_pos, (n - n1)::bigint AS n_neg,
       round((s2 - n1 * (n1 + 1))::double
               / (2 * n1 * (n - n1))::double, 6) AS auc
FROM s
""",
        "log_loss_quality": f"""
WITH {_QC_CTES},
lab AS (SELECT q.doc_id,
               least(greatest(q.p, 0.000001), 0.999999) AS p,
               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
        FROM qprob q JOIN documents d USING (doc_id))
SELECT doc_id, y::bigint AS label,
       round(-(y * ln(p) + (1 - y) * ln(1 - p)), 6) AS loss
FROM lab ORDER BY doc_id
""",
        "host_split": f"""
WITH terms AS (SELECT DISTINCT source AS term FROM documents),
{_strhash64_sql(1)}
SELECT d.doc_id, d.source,
       CASE WHEN th.h < {(1 << 64) * 8 // 10} THEN 'train'
            WHEN th.h < {(1 << 64) * 9 // 10} THEN 'val'
            ELSE 'test' END AS split
FROM documents d JOIN th ON th.term = d.source ORDER BY d.doc_id
""",
        "theil_sen_daily_trend": f"""
WITH d AS ({_DAILY_SQL}),
p AS (SELECT (b.n - a.n)::double / (b.day - a.day)::double AS slope
      FROM d a JOIN d b ON b.day > a.day),
r AS (SELECT slope, row_number() OVER (ORDER BY slope) AS rn,
             count(*) OVER () AS cnt FROM p)
SELECT (SELECT count(*) FROM d)::bigint AS n_days,
       (SELECT count(*) FROM p)::bigint AS n_pairs,
       round(avg(slope), 6) AS slope
FROM r WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2)
""",
        "mann_kendall_daily_trend": f"""
WITH d AS ({_DAILY_SQL}),
p AS (SELECT sign(b.n - a.n)::bigint AS s
      FROM d a JOIN d b ON b.day > a.day),
t AS (SELECT sum(s)::bigint AS s_stat, count(*)::bigint AS n_pairs FROM p)
SELECT (SELECT count(*) FROM d)::bigint AS n_days, s_stat, n_pairs,
       round(s_stat::double / n_pairs::double, 6) AS tau
FROM t
""",
        "acf_daily_events": f"""
WITH d AS ({_DAILY_SQL}),
r AS (SELECT n::hugeint AS x, row_number() OVER (ORDER BY day) AS rn FROM d),
s AS (SELECT count(*)::hugeint AS nn, sum(x)::hugeint AS sx,
             sum(x * x)::hugeint AS sxx FROM r),
m AS (SELECT l.lag,
             sum(a.x * b.x)::hugeint AS pk,
             sum(a.x)::hugeint AS ak, sum(b.x)::hugeint AS bk,
             count(*)::hugeint AS mk
      FROM range(1, 8) l(lag)
      JOIN r a ON TRUE JOIN r b ON b.rn = a.rn - l.lag
      GROUP BY l.lag)
SELECT m.lag::bigint AS lag,
       round((s.nn * s.nn * m.pk - s.nn * s.sx * (m.ak + m.bk)
              + m.mk * s.sx * s.sx)::double
             / (s.nn * (s.nn * s.sxx - s.sx * s.sx))::double, 6) AS acf
FROM m, s ORDER BY lag
""",
        "dow_profile_events": """
WITH d AS (SELECT ((epoch_us(ts) // 86400000000) + 3) % 7 AS dow FROM events),
g AS (SELECT dow::bigint AS dow, count(*)::bigint AS n FROM d GROUP BY 1),
t AS (SELECT sum(n)::bigint AS tot FROM g)
SELECT dow, n, round(n::double / t.tot::double, 6) AS share
FROM g, t ORDER BY dow
""",
        "mad_daily_events": f"""
WITH d AS ({_DAILY_SQL}),
r1 AS (SELECT n::double AS v, row_number() OVER (ORDER BY n) AS rn,
              count(*) OVER () AS cnt FROM d),
med AS (SELECT avg(v) AS m FROM r1 WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2)),
dev AS (SELECT abs(d.n::double - med.m) AS v FROM d, med),
r2 AS (SELECT v, row_number() OVER (ORDER BY v) AS rn,
              count(*) OVER () AS cnt FROM dev)
SELECT (SELECT count(*) FROM d)::bigint AS n_days,
       round((SELECT m FROM med), 6) AS median_n,
       round(avg(v), 6) AS mad
FROM r2 WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2)
""",
        "shipping_delay_by_priority": """
WITH j AS (SELECT o_orderpriority,
                  (epoch_us(l_shipdate) - epoch_us(o_orderdate))
                    // 86400000000 AS d
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
SELECT o_orderpriority, count(*)::bigint AS n_lines,
       sum(CASE WHEN d > 60 THEN 1 ELSE 0 END)::bigint AS n_late,
       round(sum(CASE WHEN d > 60 THEN 1 ELSE 0 END)::double
             / count(*)::double, 6) AS late_share
FROM j GROUP BY 1 ORDER BY 1
""",
        "suppliers_kept_waiting": """
WITH l AS (SELECT l_orderkey, l_suppkey,
                  CASE WHEN (epoch_us(l_shipdate) - epoch_us(o_orderdate))
                            // 86400000000 > 90 THEN 1 ELSE 0 END AS late
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
ps AS (SELECT l_orderkey, l_suppkey, max(late) AS late FROM l GROUP BY 1, 2),
os AS (SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late
       FROM ps GROUP BY 1),
w AS (SELECT ps.l_suppkey FROM ps JOIN os USING (l_orderkey)
      WHERE ps.late = 1 AND os.n_supp > 1 AND os.n_late = 1),
c AS (SELECT l_suppkey, count(*)::bigint AS numwait FROM w GROUP BY 1)
SELECT s.s_suppkey::bigint AS s_suppkey, s.s_name, c.numwait
FROM c JOIN supplier s ON s.s_suppkey = c.l_suppkey
ORDER BY numwait DESC, s_name ASC LIMIT 20
""",
        "calibration_quality": f"""
WITH {_QC_CTES},
lab AS (SELECT CAST(floor(q.p * 1000000 + 0.5) AS BIGINT) AS p6,
               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
        FROM qprob q JOIN documents d USING (doc_id)),
b AS (SELECT least(p6 // 100000, 9)::bigint AS bin, p6, y FROM lab),
g AS (SELECT bin, count(*)::bigint AS n, sum(y)::bigint AS n_pos,
             sum(p6)::bigint AS sp6 FROM b GROUP BY bin)
SELECT bin, n, n_pos,
       round(sp6::double / (n * 1000000)::double, 6) AS mean_p,
       round(n_pos::double / n::double, 6) AS frac_pos
FROM g ORDER BY bin
""",
        "pr_threshold_quality": f"""
WITH {_QC_CTES},
lab AS (SELECT CAST(floor(q.p * 1000000 + 0.5) AS BIGINT) AS p6,
               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
        FROM qprob q JOIN documents d USING (doc_id)),
th AS (SELECT (t.t * 100000)::bigint AS t6 FROM range(1, 10) t(t)),
m AS (SELECT th.t6,
             sum(CASE WHEN p6 >= th.t6 THEN y ELSE 0 END)::bigint AS tp,
             sum(CASE WHEN p6 >= th.t6 THEN 1 - y ELSE 0 END)::bigint AS fp,
             sum(CASE WHEN p6 < th.t6 THEN y ELSE 0 END)::bigint AS fn
      FROM lab, th GROUP BY th.t6)
SELECT round(t6::double / 1000000.0, 6) AS threshold, tp, fp, fn,
       CASE WHEN tp + fp = 0 THEN 0.0
            ELSE round(tp::double / (tp + fp)::double, 6) END AS precision,
       CASE WHEN tp + fn = 0 THEN 0.0
            ELSE round(tp::double / (tp + fn)::double, 6) END AS recall,
       CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0
            ELSE round(2 * tp::double / (2 * tp + fp + fn)::double, 6) END AS f1
FROM m ORDER BY t6
""",
        "rfm_segments": """
WITH m AS (SELECT o_custkey AS c_custkey, count(*)::bigint AS freq,
                  sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))::bigint
                    AS monetary_cents,
                  max(epoch_us(o_orderdate)) AS mx
           FROM orders GROUP BY 1),
gm AS (SELECT max(mx) AS gmx FROM m),
r AS (SELECT c_custkey, freq, monetary_cents,
             ((gm.gmx - mx) // 86400000000)::bigint AS r_days FROM m, gm),
medr AS (SELECT avg(v) AS v FROM (
  SELECT r_days::double AS v, row_number() OVER (ORDER BY r_days) AS rn,
         count(*) OVER () AS cnt FROM r) WHERE rn IN ((cnt+1)//2, (cnt+2)//2)),
medf AS (SELECT avg(v) AS v FROM (
  SELECT freq::double AS v, row_number() OVER (ORDER BY freq) AS rn,
         count(*) OVER () AS cnt FROM r) WHERE rn IN ((cnt+1)//2, (cnt+2)//2)),
medm AS (SELECT avg(v) AS v FROM (
  SELECT monetary_cents::double AS v,
         row_number() OVER (ORDER BY monetary_cents) AS rn,
         count(*) OVER () AS cnt FROM r) WHERE rn IN ((cnt+1)//2, (cnt+2)//2))
SELECT c_custkey, r_days, freq, monetary_cents,
       concat(CASE WHEN r_days::double <= medr.v THEN 'R1' ELSE 'R0' END,
              CASE WHEN freq::double >= medf.v THEN 'F1' ELSE 'F0' END,
              CASE WHEN monetary_cents::double >= medm.v THEN 'M1' ELSE 'M0' END)
         AS segment
FROM r, medr, medf, medm ORDER BY c_custkey
""",
        "kmeans_davies_bouldin": _kmeans_db_sql(k=4, n_iter=3, dim=64),
        "textrank_keywords": _textrank_sql(k=3, n_iter=5),
        "event_value_stats": """
WITH c AS (SELECT event_type,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
g AS (SELECT event_type, count(*)::bigint AS n, sum(cents)::bigint AS sum_cents
      FROM c GROUP BY 1),
t AS (SELECT sum(sum_cents)::bigint AS tot FROM g)
SELECT event_type, n, sum_cents,
       round(sum_cents::double / (n * 100)::double, 6) AS mean_value,
       round(sum_cents::double / t.tot::double, 6) AS value_share
FROM g, t ORDER BY event_type
""",
        "revenue_concentration": """
WITH u AS (SELECT user_id,
                  sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::bigint AS c
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
r AS (SELECT c, row_number() OVER (ORDER BY c DESC, user_id ASC) AS rn,
             count(*) OVER () AS n, sum(c) OVER () AS tot FROM u)
SELECT max(n)::bigint AS n_users, max(tot)::bigint AS total_cents,
       ((max(n) + 99) // 100)::bigint AS top1pct_users,
       round(sum(CASE WHEN rn <= (n + 99) // 100 THEN c ELSE 0 END)::double
             / max(tot)::double, 6) AS top1pct_share,
       ((max(n) + 9) // 10)::bigint AS top10pct_users,
       round(sum(CASE WHEN rn <= (n + 9) // 10 THEN c ELSE 0 END)::double
             / max(tot)::double, 6) AS top10pct_share
FROM r
""",
        "arpu_percentiles": """
WITH u AS (SELECT user_id,
                  sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::bigint AS c
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
r AS (SELECT c::double AS v, row_number() OVER (ORDER BY c) AS rn,
             count(*) OVER () AS n FROM u),
q AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
pos AS (SELECT q.q, (max(r.n) - 1) * q.q AS p, max(r.n)::bigint AS n
        FROM q, r GROUP BY q.q),
pick AS (SELECT p.q, p.n, p.p - floor(p.p) AS frac,
                lo.v AS vlo, hi.v AS vhi
         FROM pos p
         JOIN r lo ON lo.rn = CAST(floor(p.p) AS BIGINT) + 1
         JOIN r hi ON hi.rn = least(CAST(floor(p.p) AS BIGINT) + 2, p.n))
SELECT q, n AS n_users,
       round((vlo + (vhi - vlo) * frac) / 100.0, 6) AS revenue
FROM pick ORDER BY q
""",
        "props_field_stats": """
WITH k AS (SELECT event_type,
                  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
           FROM events),
f AS (SELECT event_type, k FROM k WHERE k IS NOT NULL)
SELECT event_type, count(*)::bigint AS n_with_k, sum(k)::bigint AS sum_k,
       round(sum(k)::double / count(*)::double, 6) AS mean_k,
       min(k)::bigint AS min_k, max(k)::bigint AS max_k
FROM f GROUP BY event_type ORDER BY event_type
""",
        "salsa_scores": _salsa_sql(k=5, edges_cte=_LINK_EDGES_CTE),
        "churned_users": """
WITH b AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events),
u AS (SELECT user_id,
             max(CASE WHEN epoch_us(ts) < (SELECT mid FROM b) THEN 1 ELSE 0 END) AS f,
             max(CASE WHEN epoch_us(ts) >= (SELECT mid FROM b) THEN 1 ELSE 0 END) AS s
      FROM events GROUP BY user_id)
SELECT (SELECT mid FROM b)::bigint AS mid_us,
       count(*)::bigint AS n_users,
       sum(f)::bigint AS n_first_half,
       sum(s)::bigint AS n_second_half,
       sum(CASE WHEN f = 1 AND s = 0 THEN 1 ELSE 0 END)::bigint AS n_churned,
       sum(CASE WHEN s = 1 AND f = 0 THEN 1 ELSE 0 END)::bigint AS n_new,
       CASE WHEN sum(f) > 0
            THEN round(sum(CASE WHEN f = 1 AND s = 0 THEN 1 ELSE 0 END)::double
                       / sum(f)::double, 6)
            ELSE 0.0 END AS churn_rate
FROM u
""",
        "daily_new_users": """
SELECT day, count(*)::bigint AS new_users FROM (
  SELECT user_id, (min(epoch_us(ts)) // 86400000000)::bigint AS day
  FROM events GROUP BY user_id
) GROUP BY day ORDER BY day
""",
        "user_activity_histogram": """
WITH u AS (SELECT user_id, count(*)::bigint AS n FROM events GROUP BY user_id),
b AS (SELECT (length(bin(n)) - 1)::bigint AS bucket, n FROM u)
SELECT bucket, (1::bigint << bucket)::bigint AS lo,
       count(*)::bigint AS n_users, sum(n)::bigint AS n_events
FROM b GROUP BY bucket ORDER BY bucket
""",
        "chi2_lang_source": """
WITH o AS (SELECT lang, source, count(*)::bigint AS n FROM documents GROUP BY 1, 2),
rt AS (SELECT lang, sum(n)::bigint AS r FROM o GROUP BY 1),
ct AS (SELECT source, sum(n)::bigint AS c FROM o GROUP BY 1),
t AS (SELECT sum(n)::bigint AS tot FROM o),
dims AS (SELECT (SELECT count(*) FROM rt)::bigint AS r,
                (SELECT count(*) FROM ct)::bigint AS c),
s AS (SELECT sum(o.n::double * o.n::double / (rt.r::double * ct.c::double)) AS ss
      FROM o JOIN rt USING (lang) JOIN ct USING (source))
SELECT t.tot AS n_docs, dims.r AS n_langs, dims.c AS n_sources,
       ((dims.r - 1) * (dims.c - 1))::bigint AS dof,
       round(t.tot::double * (s.ss - 1.0), 6) + 0.0 AS chi2,
       round(sqrt(greatest(t.tot::double * (s.ss - 1.0), 0.0)
                  / (t.tot::double * least(dims.r - 1, dims.c - 1)::double)), 6)
         + 0.0 AS cramers_v
FROM t, dims, s
""",
        "word_length_hist": """
WITH tok AS (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                       x -> x <> '')) AS term FROM documents),
lt AS (SELECT length(term)::bigint AS len, term, count(*)::bigint AS n
       FROM tok GROUP BY 1, 2)
SELECT len, sum(n)::bigint AS n_tokens, count(*)::bigint AS n_terms
FROM lt GROUP BY len ORDER BY len
""",
        "boolean_not_search": f"""
WITH tok AS ({_TOK}),
t AS (SELECT DISTINCT doc_id, term FROM tok),
inc AS (SELECT doc_id FROM t WHERE term IN ('spark', 'join')
        GROUP BY doc_id HAVING count(*) = 2)
SELECT doc_id::bigint AS doc_id FROM inc
WHERE doc_id NOT IN (SELECT doc_id FROM t WHERE term = 'merge')
ORDER BY doc_id
""",
        "calinski_harabasz": _kmeans_ch_sql(k=4, n_iter=3, dim=64),
        "silhouette_simplified": _kmeans_sil_sql(k=4, n_iter=3, dim=64),
        "cosine_pair_hist": """
WITH ev AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0),
od AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1),
p AS (SELECT a.vec_id AS pid, a.embedding AS ea, b.embedding AS eb
      FROM ev a JOIN od b ON b.vec_id = a.vec_id + 1),
l AS (SELECT pid, i.i AS dim, ea[i.i]::double AS av, eb[i.i]::double AS bv
      FROM p, (SELECT unnest(range(1, 65)) AS i) i),
d AS (SELECT pid, sum(av * bv) AS dot, sqrt(sum(av * av)) AS na,
             sqrt(sum(bv * bv)) AS nb
      FROM l GROUP BY pid),
c AS (SELECT round(CASE WHEN na * nb > 0 THEN dot / (na * nb) ELSE 0.0 END, 6) AS c
      FROM d),
b AS (SELECT least(greatest(CAST(floor((c + 1.0) * 5) AS BIGINT), 0), 9) AS bin
      FROM c)
SELECT bin, round(bin * 0.2 - 1.0, 6) AS lo, count(*)::bigint AS n_pairs
FROM b GROUP BY bin ORDER BY bin
""",
        "link_reciprocity": f"""
WITH {_LINK_EDGES_CTE},
d AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
p AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b,
             max(CASE WHEN src < dst THEN 1 ELSE 0 END) AS f,
             max(CASE WHEN src > dst THEN 1 ELSE 0 END) AS r
      FROM d GROUP BY 1, 2)
SELECT (SELECT count(*) FROM d)::bigint AS n_edges,
       count(*)::bigint AS n_pairs,
       sum(CASE WHEN f = 1 AND r = 1 THEN 1 ELSE 0 END)::bigint AS n_reciprocal_pairs,
       round(sum(CASE WHEN f = 1 AND r = 1 THEN 2 ELSE 0 END)::double
             / (SELECT count(*) FROM d)::double, 6) + 0.0 AS reciprocity
FROM p
""",
        "rolling_median_daily": f"""
WITH dc AS ({_DAILY_SQL}),
w AS (SELECT d.day AS day, e.n AS n
      FROM dc d JOIN dc e ON e.day BETWEEN d.day - 6 AND d.day),
r AS (SELECT day, n, row_number() OVER (PARTITION BY day ORDER BY n) AS rn,
             count(*) OVER (PARTITION BY day) AS w FROM w)
SELECT day, max(w)::bigint AS window_n,
       round((max(CASE WHEN rn = (w + 1) // 2 THEN n END)
              + max(CASE WHEN rn = w // 2 + 1 THEN n END)) / 2.0, 6) AS med
FROM r GROUP BY day ORDER BY day
""",
        "lineitem_rollup": """
WITH f AS (SELECT l_returnflag, l_linestatus,
                  round(l_extendedprice * 100)::bigint AS p,
                  round(l_discount * 100)::bigint AS d
           FROM lineitem)
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       count(*)::bigint AS n,
       sum(p * (100 - d))::bigint AS rev1e4
FROM f GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY 1, 2
""",
        "customer_order_lag": """
WITH o AS (SELECT o_custkey, o_orderkey,
                  round(o_totalprice * 100)::bigint AS cents,
                  epoch_us(o_orderdate) AS us
           FROM orders)
SELECT o_custkey, o_orderkey, cents,
       lag(cents) OVER (PARTITION BY o_custkey ORDER BY us, o_orderkey) AS lag_cents,
       cents - lag(cents) OVER (PARTITION BY o_custkey ORDER BY us, o_orderkey)
         AS delta_cents
FROM o ORDER BY o_custkey, o_orderkey
""",
        "supplier_balance_ntile": """
WITH s AS (SELECT s_suppkey, round(s_acctbal * 100)::bigint AS cents FROM supplier),
t AS (SELECT cents, ntile(4) OVER (ORDER BY cents DESC, s_suppkey) AS tile FROM s)
SELECT tile::bigint AS tile, count(*)::bigint AS n_suppliers,
       min(cents)::bigint AS min_cents, max(cents)::bigint AS max_cents,
       sum(cents)::bigint AS sum_cents
FROM t GROUP BY tile ORDER BY tile
""",
        "char_trigram_topk": """
WITH d AS (SELECT text, length(text) AS L FROM documents WHERE length(text) >= 3),
u AS (SELECT text, unnest(generate_series(1, L - 2)) AS i FROM d)
SELECT substr(text, i, 3) AS trigram, count(*)::bigint AS n
FROM u GROUP BY trigram ORDER BY n DESC, trigram LIMIT 50
""",
        "langid_kappa": f"""
WITH tok AS ({_TOK}),
hits AS (
  SELECT t.doc_id, l.lang, count(*) AS score
  FROM tok t JOIN (VALUES {_langid_values()}) l(lang, word) ON t.term = l.word
  GROUP BY t.doc_id, l.lang),
best AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
  FROM hits),
pred AS (
  SELECT d.lang AS true_lang,
         coalesce(CASE WHEN b.score > 0 THEN b.lang END, 'unknown') AS pred_lang
  FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)),
cm AS (SELECT true_lang, pred_lang, count(*)::bigint AS n FROM pred GROUP BY 1, 2),
tot AS (SELECT sum(n)::bigint AS n FROM cm),
cl AS (SELECT DISTINCT c FROM (SELECT true_lang AS c FROM cm
                               UNION SELECT pred_lang FROM cm)),
rowm AS (SELECT cl.c, coalesce(sum(cm.n), 0)::bigint AS r
         FROM cl LEFT JOIN cm ON cm.true_lang = cl.c GROUP BY cl.c),
colm AS (SELECT cl.c, coalesce(sum(cm.n), 0)::bigint AS cc
         FROM cl LEFT JOIN cm ON cm.pred_lang = cl.c GROUP BY cl.c),
ag AS (SELECT coalesce(sum(CASE WHEN true_lang = pred_lang THEN n END), 0)::bigint
         AS agree FROM cm),
pe AS (SELECT sum(rowm.r * colm.cc)::bigint AS x
       FROM rowm JOIN colm USING (c))
SELECT tot.n AS n_docs, ag.agree AS n_agree,
       round(ag.agree::double / tot.n::double, 6) + 0.0 AS po,
       round(pe.x::double / (tot.n::double * tot.n::double), 6) + 0.0 AS pe,
       round((ag.agree::double / tot.n::double
              - pe.x::double / (tot.n::double * tot.n::double))
             / (1.0 - pe.x::double / (tot.n::double * tot.n::double)), 6)
         + 0.0 AS kappa
FROM tot, ag, pe
""",
        "length_skew_kurtosis": """
WITH m AS (SELECT lang, count(*)::bigint AS n, sum(n_chars)::bigint AS sx
           FROM documents GROUP BY lang),
mu AS (SELECT lang, n, sx::double / n::double AS mean FROM m),
c AS (SELECT d.lang, (d.n_chars::double - mu.mean) AS dd, mu.n, mu.mean
      FROM documents d JOIN mu USING (lang)),
p AS (SELECT lang, max(n) AS n, max(mean) AS mean,
             sum(dd * dd) / max(n) AS m2,
             sum(dd * dd * dd) / max(n) AS m3,
             sum(dd * dd * dd * dd) / max(n) AS m4
      FROM c GROUP BY lang)
SELECT lang, n::bigint AS n,
       round(mean, 6) + 0.0 AS mean_len,
       round(sqrt(m2), 6) + 0.0 AS sd_len,
       round(CASE WHEN m2 > 0 THEN m3 / (m2 ^ 1.5) ELSE 0.0 END, 6) + 0.0
         AS skewness,
       round(CASE WHEN m2 > 0 THEN m4 / (m2 * m2) - 3.0 ELSE 0.0 END, 6) + 0.0
         AS kurtosis_excess
FROM p ORDER BY lang
""",
        "purchase_attribution": """
WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
           FROM events),
ft AS (SELECT user_id, event_type AS first_touch_type FROM (
         SELECT user_id, event_type,
                row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
         FROM e) WHERE rn = 1),
rev AS (SELECT user_id,
               sum(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END)::bigint AS c,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS isp
        FROM e GROUP BY user_id)
SELECT ft.first_touch_type, count(*)::bigint AS n_users,
       sum(rev.isp)::bigint AS n_purchasers,
       sum(rev.c)::bigint AS purchase_cents,
       round(sum(rev.c)::double / (SELECT sum(c) FROM rev)::double, 6) + 0.0
         AS revenue_share
FROM ft JOIN rev USING (user_id)
GROUP BY 1 ORDER BY 1
""",
        "link_transitivity": f"""
WITH {_LINK_EDGES_CTE},
ce AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst),
deg AS (
  SELECT node, count(*)::bigint AS d
  FROM (SELECT a AS node FROM ce UNION ALL SELECT b FROM ce) GROUP BY node),
tri AS (
  SELECT count(*)::bigint AS t
  FROM ce e1
  JOIN ce e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN ce e3 ON e3.a = e1.b AND e3.b = e2.b),
w AS (SELECT count(*)::bigint AS n_nodes,
             sum(d * (d - 1) // 2)::bigint AS wedges FROM deg)
SELECT w.n_nodes, tri.t AS n_triangles, w.wedges AS n_wedges,
       round(3.0 * tri.t / w.wedges, 6) + 0.0 AS transitivity
FROM w, tri
""",
        "bootstrap_mean_ci": f"""
WITH vc AS (SELECT n_chars::bigint AS v, count(*)::bigint AS c
            FROM documents GROUP BY 1),
s AS (SELECT v, c, sum(c) OVER (ORDER BY v) AS cum FROM vc),
bnd AS (SELECT (cum - c)::bigint AS lo, cum::bigint AS hi, v FROM s),
nn AS (SELECT count(*)::bigint AS n FROM documents),
ts AS (SELECT unnest(range(0, {_BOOT_B * _BOOT_M}))::bigint AS t),
h0 AS (SELECT t, xor(t::ubigint, {_BOOT_SEED}::ubigint)::hugeint AS x0 FROM ts),
h1 AS (SELECT t, ({_mulmod64("xor(x0::ubigint, x0::ubigint >> 30)::hugeint", str(0xBF58476D1CE4E5B9) + "::hugeint")}) AS x1 FROM h0),
h2 AS (SELECT t, ({_mulmod64("xor(x1::ubigint, x1::ubigint >> 27)::hugeint", str(0x94D049BB133111EB) + "::hugeint")}) AS x2 FROM h1),
hf AS (SELECT t, xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM h2),
u AS (SELECT t, (h % (SELECT n FROM nn))::bigint AS u FROM hf),
d AS (SELECT u.t // {_BOOT_M} AS b, bnd.v
      FROM u JOIN bnd ON u.u >= bnd.lo AND u.u < bnd.hi),
mm AS (SELECT b, sum(v)::bigint AS sv FROM d GROUP BY b),
r AS (SELECT sv::double / {_BOOT_M}.0 AS mean,
             row_number() OVER (ORDER BY sv) AS rn,
             count(*) OVER () AS nb FROM mm),
q AS (SELECT unnest([0.025, 0.5, 0.975]) AS q),
pos AS (SELECT q.q, (max(r.nb) - 1) * q.q AS p, max(r.nb)::bigint AS nb
        FROM q, r GROUP BY q.q),
pick AS (SELECT p.q, p.p - floor(p.p) AS frac, lo.mean AS vlo, hi.mean AS vhi
         FROM pos p
         JOIN r lo ON lo.rn = CAST(floor(p.p) AS BIGINT) + 1
         JOIN r hi ON hi.rn = least(CAST(floor(p.p) AS BIGINT) + 2, p.nb))
SELECT q, {_BOOT_B}::bigint AS n_resamples, {_BOOT_M}::bigint AS m_draws,
       round(vlo + (vhi - vlo) * frac, 6) + 0.0 AS boot_mean
FROM pick ORDER BY q
""",
        "robust_outliers_by_lang": """
WITH r AS (SELECT lang, n_chars::bigint AS v,
                  row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
                  count(*) OVER (PARTITION BY lang) AS n
           FROM documents),
med AS (SELECT lang, max(n)::bigint AS n,
               (max(CASE WHEN rn = (n + 1) // 2 THEN v END)
                + max(CASE WHEN rn = n // 2 + 1 THEN v END))::bigint AS med2
        FROM r GROUP BY lang),
d AS (SELECT r.lang, abs(2 * r.v - m.med2)::bigint AS dev2, m.med2, m.n
      FROM r JOIN med m USING (lang)),
dr AS (SELECT lang, dev2, med2, n,
              row_number() OVER (PARTITION BY lang ORDER BY dev2) AS rn
       FROM d),
mad AS (SELECT lang, max(med2)::bigint AS med2, max(n)::bigint AS n,
               (max(CASE WHEN rn = (n + 1) // 2 THEN dev2 END)
                + max(CASE WHEN rn = n // 2 + 1 THEN dev2 END))::bigint AS mad2x2
        FROM dr GROUP BY lang),
o AS (SELECT d.lang,
             sum(CASE WHEN 2 * d.dev2 > 3 * m.mad2x2 THEN 1 ELSE 0 END)::bigint
               AS n_outliers
      FROM d JOIN mad m USING (lang) GROUP BY d.lang)
SELECT m.lang, m.n, round(m.med2 / 2.0, 6) AS median_len,
       round(m.mad2x2 / 4.0, 6) AS mad_len, o.n_outliers
FROM mad m JOIN o USING (lang) ORDER BY m.lang
""",
        "warc_source_roundtrip": """
WITH base AS (
  SELECT 'https://' || source || '.example.org/doc/'
           || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
         (1700000000000000 + doc_id * 1000000)::bigint AS ts_us,
         text
  FROM documents),
stale AS (
  SELECT 'https://' || source || '.example.org/doc/'
           || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
         (1700000000000000 + doc_id * 1000000 - 3600000000)::bigint AS ts_us,
         substr(text, 1, greatest(1, length(text) // 2)) AS text
  FROM documents WHERE doc_id % 50 = 0)
SELECT url, ts_us, text
FROM (SELECT * FROM base UNION ALL SELECT * FROM stale)
ORDER BY url, ts_us
""",
        "robots_filtered_pages": """
WITH hr AS (
  SELECT source, (dense_rank() OVER (ORDER BY source) - 1) % 2 AS p
  FROM (SELECT DISTINCT source FROM documents)),
pages AS (
  SELECT source, doc_id,
         'https://' || source || '.example.org/doc/'
           || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
         (1700000000000000 + doc_id * 1000000)::bigint AS ts_us
  FROM documents
  UNION ALL
  SELECT source, doc_id,
         'https://' || source || '.example.org/doc/'
           || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
         (1700000000000000 + doc_id * 1000000 - 3600000000)::bigint AS ts_us
  FROM documents WHERE doc_id % 50 = 0)
SELECT url, ts_us
FROM pages JOIN hr USING (source)
WHERE p = 0 AND (doc_id >= 100 OR (doc_id >= 40 AND doc_id < 50))
ORDER BY url, ts_us
""",
        "warc_tolerant_parse": """
WITH pages AS (
  SELECT doc_id, 0 AS ord,
         'https://' || source || '.example.org/doc/'
           || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
         (1700000000000000 + doc_id * 1000000)::bigint AS ts_us
  FROM documents
  UNION ALL
  SELECT doc_id, 1 AS ord,
         'https://' || source || '.example.org/doc/'
           || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
         (1700000000000000 + doc_id * 1000000 - 3600000000)::bigint AS ts_us
  FROM documents WHERE doc_id % 50 = 0),
seq AS (SELECT url, ts_us,
               row_number() OVER (ORDER BY doc_id, ord) - 1 AS j
        FROM pages)
SELECT url, ts_us FROM seq WHERE j % 13 <> 5 ORDER BY url, ts_us
""",
        "sitemap_frontier": """
SELECT 'https://' || source || '.example.org/doc/'
         || lpad(CAST(doc_id + 10000000 AS VARCHAR), 8, '0') AS url,
       strftime(DATE '2023-11-14' + ((doc_id + 10000000) % 400)::int,
                '%Y-%m-%d') AS lastmod
FROM documents WHERE doc_id % 7 = 0 ORDER BY url
""",
        "charset_sniff_decode": """
SELECT doc_id,
       CASE WHEN doc_id % 5 = 0 THEN 'latin-1' ELSE 'utf-8' END AS charset,
       CASE WHEN doc_id % 5 = 0 THEN 'café ¿señor? ' || text
            ELSE '☃ búttèrfly ' || text END AS text
FROM documents ORDER BY doc_id
""",
        "multi_format_source": """
SELECT event_type, count(*)::bigint AS n,
       sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::bigint AS cents
FROM events GROUP BY event_type ORDER BY event_type
""",
        "pq_codes": _pq_codes_sql(
            M=_PQ_M, k=_PQ_K, n_iter=_PQ_ITER, subdim=_PQ_SUBDIM
        ),
        "psi_event_drift": """
WITH b AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events),
g AS (SELECT event_type,
             sum(CASE WHEN epoch_us(ts) < (SELECT mid FROM b) THEN 1 ELSE 0 END)::bigint AS f,
             sum(CASE WHEN epoch_us(ts) >= (SELECT mid FROM b) THEN 1 ELSE 0 END)::bigint AS s
      FROM events GROUP BY event_type),
t AS (SELECT sum(f)::bigint AS nf, sum(s)::bigint AS ns FROM g),
d AS (SELECT (g.f::double / t.nf::double) AS p, (g.s::double / t.ns::double) AS q
      FROM g, t WHERE g.f > 0 AND g.s > 0)
SELECT t.nf AS n_first, t.ns AS n_second,
       (SELECT count(*) FROM d)::bigint AS n_types_both,
       round((SELECT sum((p - q) * ln(p / q)) FROM d), 6) + 0.0 AS psi
FROM t
""",
        "knn_pq_adc": _knn_pq_adc_sql(
            M=_PQ_M, k=_PQ_K, n_iter=_PQ_ITER, subdim=_PQ_SUBDIM, topk=5
        ),
        "gains_curve_quality": f"""
WITH {_QC_CTES},
lab AS (SELECT q.doc_id, floor(q.p * 1e6 + 0.5)::bigint AS p6,
               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
        FROM qprob q JOIN documents d USING (doc_id)),
vc AS (SELECT p6, count(*)::bigint AS c, sum(y)::bigint AS pos
       FROM lab GROUP BY p6),
o AS (SELECT p6, sum(c) OVER (ORDER BY p6 DESC) AS cum,
             sum(pos) OVER (ORDER BY p6 DESC) AS cumpos FROM vc),
t AS (SELECT count(*)::bigint AS n, sum(y)::bigint AS npos FROM lab),
dd AS (SELECT unnest(generate_series(1, 10)) AS d),
th AS (SELECT dd.d, max(o.p6) AS thr
       FROM dd CROSS JOIN t JOIN o ON o.cum >= (t.n * dd.d + 9) // 10
       GROUP BY dd.d),
sel AS (SELECT th.d, th.thr, o.cum AS n_sel, o.cumpos AS pos_sel
        FROM th JOIN o ON o.p6 = th.thr)
SELECT d::bigint AS decile, thr::bigint AS p6_threshold,
       n_sel::bigint AS n_selected, pos_sel::bigint AS n_pos_selected,
       round(pos_sel::double / t.npos::double, 6) + 0.0 AS recall,
       round(pos_sel::double / n_sel::double, 6) + 0.0 AS precision,
       round((pos_sel::double / n_sel::double)
             / (t.npos::double / t.n::double), 6) + 0.0 AS lift
FROM sel, t ORDER BY d
""",
        "hill_tail_events": """
WITH p AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
           FROM events WHERE event_type = 'purchase'),
vc AS (SELECT cents, count(*)::bigint AS c FROM p WHERE cents > 0 GROUP BY cents),
o AS (SELECT cents, c, sum(c) OVER (ORDER BY cents DESC) AS cum FROM vc),
t AS (SELECT sum(c)::bigint AS n, ((sum(c) + 19) // 20)::bigint AS k FROM vc),
tk AS (SELECT o.cents, least(o.c, t.k - (o.cum - o.c)) AS taken
       FROM o, t WHERE o.cum - o.c < t.k),
sl AS (SELECT sum(taken * ln(cents::double)) AS sum_ln FROM tk),
x1 AS (SELECT max(cents)::bigint AS xk1 FROM o, t WHERE o.cum >= t.k + 1)
SELECT t.n AS n_purchases, t.k AS k_tail, x1.xk1 AS xk1_cents,
       round(t.k::double / (sl.sum_ln - t.k * ln(x1.xk1::double)), 6) + 0.0
         AS hill_alpha
FROM t, sl, x1
""",
        "term_burstiness": f"""
WITH tok AS ({_TOK}),
dt AS (SELECT doc_id, term, count(*)::bigint AS c FROM tok GROUP BY 1, 2),
t AS (SELECT term, sum(c)::bigint AS cf, count(*)::bigint AS df
      FROM dt GROUP BY term)
SELECT term, cf, df, round(cf::double / df::double, 6) + 0.0 AS burstiness
FROM t WHERE df >= 5
ORDER BY cf::double / df::double DESC, term LIMIT 20
""",
        "markov_next_event_accuracy": """
WITH s AS (SELECT user_id, event_type,
                  lag(event_type) OVER (
                    PARTITION BY user_id ORDER BY ts, event_type) AS prev
           FROM events),
cm AS (SELECT prev AS p, event_type AS nx, count(*)::bigint AS n
       FROM s WHERE prev IS NOT NULL GROUP BY 1, 2),
pr AS (SELECT p, nx FROM (
         SELECT p, nx,
                row_number() OVER (PARTITION BY p ORDER BY n DESC, nx ASC) AS rn
         FROM cm) WHERE rn = 1),
t AS (SELECT sum(n)::bigint AS tot, count(DISTINCT p)::bigint AS np FROM cm),
c AS (SELECT coalesce(sum(cm.n), 0)::bigint AS corr
      FROM cm JOIN pr ON cm.p = pr.p AND cm.nx = pr.nx)
SELECT t.tot AS n_transitions, t.np AS n_prev_types, c.corr AS n_correct,
       round(c.corr::double / t.tot::double, 6) + 0.0 AS accuracy
FROM t, c
""",
        "quantile_sketch_error": """
WITH lohi AS (SELECT min(n_chars)::double AS lo,
                     CASE WHEN max(n_chars) - min(n_chars) = 0 THEN 1.0
                          ELSE max(n_chars)::double - min(n_chars)::double END AS w
              FROM documents),
bins AS (SELECT least(floor((n_chars::double - lo) / w * 64)::bigint, 63) AS bin
         FROM documents, lohi),
hist AS (SELECT bin, count(*)::bigint AS cnt FROM bins GROUP BY bin),
cum AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS c FROM hist),
n AS (SELECT count(*)::bigint AS n FROM documents),
qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
tgt AS (SELECT q, greatest(1, ceil(q * n)::bigint) AS target FROM qs, n),
hit AS (SELECT t.q, t.target, min(c.bin) AS bin
        FROM tgt t JOIN cum c ON c.c >= t.target GROUP BY t.q, t.target),
fin AS (SELECT h.q, h.bin, h.target,
               coalesce((SELECT max(c2.c) FROM cum c2 WHERE c2.bin < h.bin), 0) AS prev,
               (SELECT cnt FROM hist WHERE bin = h.bin) AS cnt
        FROM hit h),
ap AS (SELECT q, lo + (bin + (target - prev)::double / greatest(cnt, 1)) * w / 64 AS v
       FROM fin, lohi),
r AS (SELECT n_chars::bigint AS v, row_number() OVER (ORDER BY n_chars) AS rn
      FROM documents),
ex AS (SELECT t.q, min(r.v)::double AS ev FROM tgt t JOIN r ON r.rn = t.target
       GROUP BY t.q)
SELECT ap.q::double AS q, ex.ev AS exact, round(ap.v, 6) + 0.0 AS approx,
       round(ap.v - ex.ev, 6) + 0.0 AS abs_err,
       round((ap.v - ex.ev) / ex.ev, 6) + 0.0 AS rel_err
FROM ap JOIN ex USING (q) ORDER BY q
""",
        "rich_club": f"""
WITH {_LINK_EDGES_CTE},
ce AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst),
deg AS (SELECT node, count(*)::bigint AS d
        FROM (SELECT a AS node FROM ce UNION ALL SELECT b FROM ce)
        GROUP BY node),
club AS (SELECT node FROM deg WHERE d > 3),
ec AS (SELECT count(*)::bigint AS e FROM ce
       WHERE a IN (SELECT node FROM club) AND b IN (SELECT node FROM club)),
m AS (SELECT count(*)::bigint AS m FROM club)
SELECT 3::bigint AS k, m.m AS n_club, ec.e AS n_club_edges,
       CASE WHEN m.m > 1
            THEN round(2.0 * ec.e / (m.m * (m.m - 1)), 6) + 0.0
            ELSE 0.0 END AS rich_club_phi
FROM m, ec
""",
        "rbo_bm25_qld": f"""
WITH {_BM25_SCORES},
ra AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
       FROM scores ORDER BY score DESC, doc_id ASC LIMIT 20),
qcoll AS (SELECT sum(doc_len)::double AS ct FROM dl),
qcf AS (SELECT term, count(*)::double AS cf FROM tok
        WHERE term IN (SELECT term FROM q) GROUP BY term),
qm AS (SELECT count(*)::bigint AS m FROM qcf),
qtf AS (SELECT doc_id, term, count(*)::double AS tf FROM tok
        WHERE term IN (SELECT term FROM q) GROUP BY 1, 2),
qsp AS (SELECT qtf.doc_id,
               sum(ln(1.0 + qtf.tf / (300.0 * (qcf.cf / qcoll.ct)))) AS sp
        FROM qtf JOIN qcf USING (term), qcoll GROUP BY qtf.doc_id),
qsc AS (SELECT qsp.doc_id,
               qsp.sp + (SELECT m FROM qm) * ln(300.0 / (dl.doc_len + 300.0))
                 AS score
        FROM qsp JOIN dl USING (doc_id)),
rb AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
       FROM qsc ORDER BY score DESC, doc_id ASC LIMIT 20),
ab AS (SELECT ra.r AS x, rb.r AS y FROM ra JOIN rb USING (doc_id)),
d AS (SELECT unnest(generate_series(1, 20)) AS i),
ov AS (SELECT d.i,
              (SELECT count(*) FROM ab WHERE ab.x <= d.i AND ab.y <= d.i) AS o
       FROM d)
SELECT 20::bigint AS depth, 0.9 AS p,
       (SELECT count(*) FROM ab)::bigint AS n_common,
       round(sum(0.1 * power(0.9, i - 1) * o / i), 6) + 0.0 AS rbo
FROM ov
""",
        "markov_entropy_rate": _markov_entropy_sql(5),
        "heaps_law_fit": f"""
WITH tok AS ({_TOK}),
ft AS (SELECT term, min(doc_id) AS fid FROM tok GROUP BY term),
mm AS (SELECT min(doc_id)::bigint AS lo, max(doc_id)::bigint AS hi FROM documents),
dd AS (SELECT unnest(generate_series(1, 10)) AS d),
cut AS (SELECT dd.d, (mm.lo + ((mm.hi - mm.lo) * dd.d) // 10)::bigint AS t
        FROM dd, mm),
pts AS (SELECT c.d, c.t,
               (SELECT count(*) FROM documents WHERE doc_id <= c.t)::bigint AS n,
               (SELECT count(*) FROM ft WHERE fid <= c.t)::bigint AS v
        FROM cut c),
l AS (SELECT d, n, v, ln(n::double) AS x, ln(v::double) AS y FROM pts),
m AS (SELECT avg(x) AS mx, avg(y) AS my FROM l),
f AS (SELECT sum((l.x - m.mx) * (l.y - m.my)) / sum((l.x - m.mx) * (l.x - m.mx))
        AS beta FROM l, m)
SELECT l.d, l.n AS n_docs, l.v AS vocab,
       round((SELECT beta FROM f), 6) + 0.0 AS heaps_beta,
       round(exp((SELECT my FROM m) - (SELECT beta FROM f) * (SELECT mx FROM m)),
             6) + 0.0 AS heaps_k
FROM l ORDER BY l.d
""",
        "revenue_lorenz": """
WITH u AS (SELECT user_id,
                  sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::bigint AS c
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
r AS (SELECT c, row_number() OVER (ORDER BY c, user_id) AS rn,
             sum(c) OVER (ORDER BY c, user_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM u),
t AS (SELECT count(*)::bigint AS n, sum(c)::bigint AS tot FROM u),
dd AS (SELECT unnest(generate_series(1, 10)) AS d)
SELECT dd.d AS decile, ((t.n * dd.d + 9) // 10)::bigint AS n_users_cut,
       r.cum::bigint AS cum_cents,
       round(r.cum::double / t.tot::double, 6) + 0.0 AS cum_share
FROM dd CROSS JOIN t JOIN r ON r.rn = (t.n * dd.d + 9) // 10
ORDER BY dd.d
""",
        "partitioned_write_roundtrip": """
SELECT 'es' AS lang, count(*)::bigint AS n_docs,
       sum(n_chars)::bigint AS sum_chars
FROM documents WHERE lang = 'es'
""",
        "minhash_estimate_error": f"""
WITH {_minhash_chain_ctes()},
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM bh x JOIN bh y ON x.bhash = y.bhash AND x.doc_id < y.doc_id),
est AS (SELECT c.id_a, c.id_b,
               sum(CASE WHEN sa.sv = sb.sv THEN 1 ELSE 0 END)::bigint AS m
        FROM cand c JOIN sigs sa ON sa.doc_id = c.id_a
                    JOIN sigs sb ON sb.doc_id = c.id_b AND sb.p = sa.p
        GROUP BY 1, 2),
shw AS (
  SELECT doc_id, t || ' ' || lead(t, 1) OVER w2 || ' ' || lead(t, 2) OVER w2 AS shingle
  FROM tok WINDOW w2 AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(t, 2) OVER w2 IS NOT NULL),
dsh AS (SELECT DISTINCT doc_id, shingle FROM shw),
ssz AS (SELECT doc_id, count(*) AS sz FROM dsh GROUP BY doc_id),
pint AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN dsh a ON a.doc_id = c.id_a
  JOIN dsh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY c.id_a, c.id_b),
ex AS (
  SELECT c.id_a, c.id_b,
         CASE WHEN coalesce(za.sz, 0) + coalesce(zb.sz, 0) - coalesce(p.i, 0) = 0
              THEN 1.0
              ELSE coalesce(p.i, 0)::double
                   / (coalesce(za.sz, 0) + coalesce(zb.sz, 0) - coalesce(p.i, 0))
         END AS j
  FROM cand c
  LEFT JOIN pint p ON p.id_a = c.id_a AND p.id_b = c.id_b
  LEFT JOIN ssz za ON za.doc_id = c.id_a
  LEFT JOIN ssz zb ON zb.doc_id = c.id_b)
SELECT e.id_a, e.id_b,
       round(e.m / 64.0, 6) + 0.0 AS est_jaccard,
       round(x.j, 6) + 0.0 AS exact_jaccard,
       round(abs(e.m / 64.0 - x.j), 6) + 0.0 AS abs_err
FROM est e JOIN ex x USING (id_a, id_b) ORDER BY id_a, id_b
""",
        "assoc_rules_sessions": """
WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type FROM events),
flag AS (
  SELECT user_id, t, event_type,
         CASE WHEN lag(t) OVER w IS NULL
              OR t - lag(t) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_type)),
sess AS (
  SELECT user_id, event_type,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY t, event_type
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flag),
st AS (SELECT DISTINCT user_id, sid, event_type FROM sess),
tot AS (SELECT count(*)::bigint AS s
        FROM (SELECT DISTINCT user_id, sid FROM sess)),
sing AS (SELECT event_type, count(*)::bigint AS n FROM st GROUP BY 1),
p AS (SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM st a JOIN st b USING (user_id, sid)
      WHERE a.event_type < b.event_type),
jc AS (SELECT type_a, type_b, count(*)::bigint AS n FROM p GROUP BY 1, 2)
SELECT jc.type_a, jc.type_b, jc.n AS n_both, sa.n AS n_a, sb.n AS n_b,
       tot.s AS n_sessions,
       round(jc.n::double / tot.s::double, 6) + 0.0 AS support,
       round(jc.n::double / sa.n::double, 6) + 0.0 AS conf_a_to_b,
       round(jc.n::double / sb.n::double, 6) + 0.0 AS conf_b_to_a,
       round(jc.n::double * tot.s::double / (sa.n::double * sb.n::double), 6)
         + 0.0 AS lift
FROM jc JOIN sing sa ON sa.event_type = jc.type_a
        JOIN sing sb ON sb.event_type = jc.type_b
        CROSS JOIN tot
ORDER BY jc.type_a, jc.type_b
""",
        "profile_orders": """
SELECT 'o_custkey' AS column_name, count(*)::bigint AS n_rows,
       count(DISTINCT o_custkey)::bigint AS n_distinct,
       (count(*) - count(o_custkey))::bigint AS n_null FROM orders
UNION ALL
SELECT 'o_orderdate', count(*)::bigint, count(DISTINCT o_orderdate)::bigint,
       (count(*) - count(o_orderdate))::bigint FROM orders
UNION ALL
SELECT 'o_orderkey', count(*)::bigint, count(DISTINCT o_orderkey)::bigint,
       (count(*) - count(o_orderkey))::bigint FROM orders
UNION ALL
SELECT 'o_orderpriority', count(*)::bigint,
       count(DISTINCT o_orderpriority)::bigint,
       (count(*) - count(o_orderpriority))::bigint FROM orders
UNION ALL
SELECT 'o_orderstatus', count(*)::bigint, count(DISTINCT o_orderstatus)::bigint,
       (count(*) - count(o_orderstatus))::bigint FROM orders
UNION ALL
SELECT 'o_totalprice', count(*)::bigint, count(DISTINCT o_totalprice)::bigint,
       (count(*) - count(o_totalprice))::bigint FROM orders
ORDER BY column_name
""",
        "label_centroid_drift": """
WITH e AS (SELECT vec_id, label, i.i AS dim, embedding[i.i]::double AS v
           FROM embeddings, (SELECT unnest(range(1, 65)) AS i) i),
cnt AS (SELECT label, (vec_id % 2)::bigint AS par, count(*)::bigint AS n
        FROM embeddings GROUP BY 1, 2),
mm AS (SELECT label, (vec_id % 2)::bigint AS par, dim, sum(v) AS sv
       FROM e GROUP BY 1, 2, 3),
mv AS (SELECT mm.label, mm.par, mm.dim, mm.sv / cnt.n AS m
       FROM mm JOIN cnt USING (label, par)),
c AS (SELECT a.label, sum(a.m * b.m) AS dot,
             sqrt(sum(a.m * a.m)) AS na, sqrt(sum(b.m * b.m)) AS nb
      FROM mv a JOIN mv b ON a.label = b.label AND a.dim = b.dim
                AND a.par = 0 AND b.par = 1
      GROUP BY a.label)
SELECT c.label::bigint AS label, ce.n AS n_even, co.n AS n_odd,
       round(c.dot / (c.na * c.nb), 6) + 0.0 AS cosine
FROM c JOIN cnt ce ON ce.label = c.label AND ce.par = 0
       JOIN cnt co ON co.label = c.label AND co.par = 1
ORDER BY label
""",
        "dup_rate_by_source": """
SELECT source, count(*)::bigint AS n_docs,
       count(DISTINCT text)::bigint AS n_unique,
       round(1.0 - count(DISTINCT text)::double / count(*)::double, 6) + 0.0
         AS dup_rate
FROM documents GROUP BY source ORDER BY source
""",
        "ngram_dup_rate": """
WITH tokl AS (SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                 x -> x <> '') AS toks FROM documents),
w AS (SELECT unnest(generate_series(1, len(toks) - 7)) AS i, toks
      FROM tokl WHERE len(toks) >= 8),
gr AS (SELECT array_to_string(toks[i:i+7], ' ') AS gram FROM w),
c AS (SELECT gram, count(*)::bigint AS n FROM gr GROUP BY gram),
s AS (SELECT (SELECT count(*) FROM gr)::bigint AS n_windows,
             (SELECT count(*) FROM c)::bigint AS n_distinct,
             (SELECT coalesce(sum(n), 0) FROM c WHERE n > 1)::bigint AS n_dup)
SELECT n_windows, n_distinct, n_dup AS n_dup_windows,
       round(n_dup::double / n_windows::double, 6) + 0.0 AS dup_rate
FROM s
""",
        "orders_seasonality": """
SELECT month(o_orderdate)::bigint AS month, count(*)::bigint AS n_orders,
       sum(round(o_totalprice * 100)::bigint)::bigint AS cents
FROM orders GROUP BY 1 ORDER BY 1
""",
        "shard_balance": f"""
WITH tok AS ({_TOK}),
mm AS (SELECT max(doc_id)::bigint AS mx FROM documents),
pd AS (SELECT doc_id,
              least(doc_id // ((mm.mx + 8) // 8), 7)::bigint AS part
       FROM documents, mm),
post AS (SELECT pd.part,
                count(*)::bigint + 1 AS w
         FROM (SELECT DISTINCT doc_id, term FROM tok) dt
         JOIN pd USING (doc_id)
         GROUP BY pd.part),
cum AS (SELECT part, w, sum(w) OVER (ORDER BY part) AS acc FROM post),
tot AS (SELECT sum(w)::bigint AS t FROM post),
q0 AS (SELECT min(part) AS q FROM cum, tot WHERE 2 * acc >= t),
sh AS (SELECT pd.doc_id,
              CASE WHEN pd.part <= q0.q THEN 0 ELSE 1 END AS shard_id
       FROM pd, q0)
SELECT shard_id::bigint AS shard_id, count(*)::bigint AS n_docs,
       min(doc_id)::bigint AS min_doc, max(doc_id)::bigint AS max_doc
FROM sh GROUP BY 1 ORDER BY 1
""",
        "dedup_method_agreement": f"""
WITH {_minhash_chain_ctes()},
mcand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM bh x JOIN bh y ON x.bhash = y.bhash AND x.doc_id < y.doc_id),
stokh AS (SELECT term, ({_FNV_TOK.format(t='term')})::ubigint AS h
          FROM (SELECT DISTINCT t AS term FROM tok)),
sbits AS (
  SELECT tok.doc_id, p.bit, p.pw,
         sum(CASE WHEN (th.h >> p.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM tok JOIN stokh th ON th.term = tok.t
  CROSS JOIN (VALUES {_pow2_values()}) p(bit, pw)
  GROUP BY tok.doc_id, p.bit, p.pw),
ssig AS (SELECT doc_id, sum(CASE WHEN s > 0 THEN pw ELSE 0::hugeint END) AS v
         FROM sbits GROUP BY doc_id),
su AS (SELECT d.doc_id, coalesce(s.v, 0)::ubigint AS uv
       FROM documents d LEFT JOIN ssig s USING (doc_id)),
scand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM su a JOIN su b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.uv, b.uv)) <= 3),
b2 AS (SELECT count(*)::bigint AS nb
       FROM (SELECT * FROM scand INTERSECT SELECT * FROM mcand)),
un AS (SELECT count(*)::bigint AS nu
       FROM (SELECT * FROM scand UNION SELECT * FROM mcand))
SELECT (SELECT count(*) FROM scand)::bigint AS n_simhash_pairs,
       (SELECT count(*) FROM mcand)::bigint AS n_minhash_pairs,
       b2.nb AS n_both,
       CASE WHEN un.nu > 0
            THEN round(b2.nb::double / un.nu::double, 6) + 0.0
            ELSE 1.0 END AS agreement_jaccard
FROM b2, un
""",
        "capture_recapture_users": """
WITH b AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events),
u AS (SELECT user_id,
             max(CASE WHEN epoch_us(ts) < (SELECT mid FROM b) THEN 1 ELSE 0 END) AS f,
             max(CASE WHEN epoch_us(ts) >= (SELECT mid FROM b) THEN 1 ELSE 0 END) AS s
      FROM events GROUP BY user_id)
SELECT sum(f)::bigint AS n_first, sum(s)::bigint AS n_second,
       sum(CASE WHEN f = 1 AND s = 1 THEN 1 ELSE 0 END)::bigint AS n_both,
       count(*)::bigint AS n_observed,
       round((sum(f) + 1)::double * (sum(s) + 1)::double
             / (sum(CASE WHEN f = 1 AND s = 1 THEN 1 ELSE 0 END) + 1)::double
             - 1.0, 6) + 0.0 AS chapman_estimate
FROM u
""",
        "negbin_overdispersion": """
WITH u AS (SELECT user_id, count(*)::bigint AS n FROM events GROUP BY user_id),
s AS (SELECT count(*)::bigint AS k, sum(n)::bigint AS s1,
             sum(n * n)::bigint AS s2 FROM u),
m AS (SELECT k, s1::double / k::double AS mean,
             s2::double / k::double
               - (s1::double / k::double) * (s1::double / k::double) AS var
      FROM s)
SELECT k AS n_users, round(mean, 6) + 0.0 AS mean_events,
       round(var, 6) + 0.0 AS var_events,
       round(var / mean, 6) + 0.0 AS vmr,
       round(CASE WHEN var > mean THEN mean * mean / (var - mean)
                  ELSE 0.0 END, 6) + 0.0 AS nb_r,
       round(CASE WHEN var > mean THEN mean / var ELSE 0.0 END, 6) + 0.0 AS nb_p
FROM m
""",
        "bm25_tiered_topk": f"""
WITH {_BM25_SCORES}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score,
       'full' AS route, 1::bigint AS full_served, 1::bigint AS pruned_served
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "index_update_search": f"""
WITH mm AS (SELECT max(doc_id)::bigint AS mx FROM documents),
mdocs AS (SELECT doc_id,
                 CASE WHEN doc_id < (mm.mx + 8) // 8 AND doc_id % 97 = 0
                      THEN text || ' spark' ELSE text END AS text
          FROM documents, mm),
{_BM25_SCORES.replace("FROM documents", "FROM mdocs").lstrip()}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "df_histogram": f"""
WITH tok AS ({_TOK}),
dfs AS (SELECT term, count(DISTINCT doc_id)::bigint AS df FROM tok GROUP BY term),
b AS (SELECT (length(bin(df)) - 1)::bigint AS bucket, df FROM dfs)
SELECT bucket, count(*)::bigint AS n_terms, sum(df)::bigint AS n_postings
FROM b GROUP BY bucket ORDER BY bucket
""",
        "prune_report": f"""
WITH tok AS ({_TOK}),
dfs AS (SELECT term, count(DISTINCT doc_id)::bigint AS df FROM tok GROUP BY term)
SELECT count(*)::bigint AS n_terms_full, count(*)::bigint AS n_terms_pruned,
       sum(df)::bigint AS postings_full,
       sum(least(df, 32))::bigint AS postings_pruned,
       round(sum(least(df, 32))::double / sum(df)::double, 6) + 0.0 AS kept_ratio
FROM dfs
""",
        "reshard_search": f"""
WITH mm AS (SELECT max(doc_id)::bigint AS mx FROM documents),
mdocs AS (SELECT doc_id,
                 CASE WHEN doc_id < (mm.mx + 8) // 8 AND doc_id % 97 = 0
                      THEN text || ' spark' ELSE text END AS text
          FROM documents, mm),
{_BM25_SCORES.replace("FROM documents", "FROM mdocs").lstrip()}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score, 4::bigint AS n_shards
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "incremental_crawl_search": f"""
WITH mm AS (SELECT max(doc_id)::bigint AS mx FROM documents),
fin AS (SELECT CASE WHEN doc_id % 50 = 0
                    THEN mm.mx + 1 + doc_id // 50
                    ELSE doc_id END AS doc_id,
               text
        FROM documents, mm),
{_BM25_SCORES.replace("FROM documents", "FROM fin").lstrip().rstrip()}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score,
       (SELECT count(*) FROM documents WHERE doc_id % 50 = 0)::bigint
         AS n_changed
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "bm25_clustered_prune": f"""
WITH remap AS (
  SELECT row_number() OVER (ORDER BY source, doc_id) - 1 AS doc_id,
         text, source
  FROM documents
),
{_BM25_SCORES.replace("FROM documents", "FROM remap").lstrip().rstrip()},
mm AS (SELECT max(doc_id)::bigint AS mx FROM remap),
pd AS (SELECT doc_id, source,
              least(doc_id // ((mm.mx + 8) // 8), 7)::bigint AS part
       FROM remap, mm),
post AS (SELECT pd.part, count(*)::bigint + 1 AS w
         FROM (SELECT DISTINCT doc_id, term FROM tok) dt
         JOIN pd USING (doc_id)
         GROUP BY pd.part),
cum AS (SELECT part, w, sum(w) OVER (ORDER BY part) AS acc FROM post),
tot AS (SELECT sum(w)::bigint AS t FROM post),
q0 AS (SELECT min(part) AS q FROM cum, tot WHERE 2 * acc >= t),
scanned AS (SELECT count(DISTINCT CASE WHEN pd.part <= q0.q THEN 0 ELSE 1 END)::bigint AS n
            FROM pd, q0 WHERE pd.source = 'src0')
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score,
       (SELECT n FROM scanned) AS n_shards_scanned
FROM scores
WHERE doc_id IN (SELECT doc_id FROM remap WHERE source = 'src0')
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "fetch_schedule": """
WITH u AS (SELECT DISTINCT
             'https://' || source || '.example.org/doc/'
               || lpad(doc_id::varchar, 8, '0') AS url,
             source || '.example.org' AS host
           FROM documents),
s AS (SELECT url, host,
             (row_number() OVER (PARTITION BY host ORDER BY url) - 1)::bigint
               AS slot
      FROM u)
SELECT url, host, slot FROM s
ORDER BY slot, host, url LIMIT 60
""",
        "cori_collection_ranking": """
WITH g AS (SELECT doc_id, text,
                  (CAST(substr(source, 4) AS INT) % 3) AS coll
           FROM documents),
tok AS (SELECT coll, doc_id,
               unnest(list_filter(regexp_split_to_array(lower(text),
                   '[^a-z0-9]+'), x -> x <> '')) AS term
        FROM g),
cw AS (SELECT coll, count(*)::double AS cw FROM tok GROUP BY coll),
avgcw AS (SELECT avg(cw) AS a FROM cw),
q AS (SELECT unnest(['join', 'merge', 'spark']) AS term),
df AS (SELECT coll, term, count(DISTINCT doc_id)::double AS df
       FROM tok WHERE term IN (SELECT term FROM q) GROUP BY 1, 2),
cft AS (SELECT term, count(*)::double AS cf FROM df WHERE df > 0
        GROUP BY term),
ct AS (SELECT cw.coll, q.term FROM cw CROSS JOIN q),
bel AS (SELECT ct.coll,
               0.4 + 0.6
                 * (coalesce(df.df, 0)
                    / (coalesce(df.df, 0) + 50.0
                       + 150.0 * cw.cw / avgcw.a))
                 * (CASE WHEN cft.cf IS NULL THEN 0.0
                         ELSE ln((3 + 0.5) / cft.cf) / ln(4.0) END) AS b
        FROM ct
        JOIN cw USING (coll)
        LEFT JOIN df ON df.coll = ct.coll AND df.term = ct.term
        LEFT JOIN cft ON cft.term = ct.term, avgcw),
s AS (SELECT coll, round(sum(b) / 3.0, 6) + 0.0 AS belief
      FROM bel GROUP BY coll)
SELECT coll::bigint AS collection, belief,
       row_number() OVER (ORDER BY belief DESC, coll ASC)::bigint AS rank
FROM s ORDER BY collection
""",
        "redirect_terminals": """
WITH m0 AS MATERIALIZED (
  SELECT doc_id AS s, doc_id // 2 AS d FROM documents
  WHERE doc_id % 3 = 0 AND doc_id > 0),
m1 AS MATERIALIZED (SELECT a.s, coalesce(b.d, a.d) AS d
                    FROM m0 a LEFT JOIN m0 b ON b.s = a.d),
m2 AS MATERIALIZED (SELECT a.s, coalesce(b.d, a.d) AS d
                    FROM m1 a LEFT JOIN m1 b ON b.s = a.d),
m3 AS MATERIALIZED (SELECT a.s, coalesce(b.d, a.d) AS d
                    FROM m2 a LEFT JOIN m2 b ON b.s = a.d),
m4 AS MATERIALIZED (SELECT a.s, coalesce(b.d, a.d) AS d
                    FROM m3 a LEFT JOIN m3 b ON b.s = a.d),
m5 AS MATERIALIZED (SELECT a.s, coalesce(b.d, a.d) AS d
                    FROM m4 a LEFT JOIN m4 b ON b.s = a.d),
m6 AS MATERIALIZED (SELECT a.s, coalesce(b.d, a.d) AS d
                    FROM m5 a LEFT JOIN m5 b ON b.s = a.d),
res AS (SELECT coalesce(m6.d, documents.doc_id) AS terminal_id
        FROM documents LEFT JOIN m6 ON m6.s = documents.doc_id)
SELECT terminal_id, count(*)::bigint AS n_docs
FROM res GROUP BY 1
ORDER BY n_docs DESC, terminal_id ASC LIMIT 20
""",
        "team_draft_interleave": f"""
WITH {_BM25_SCORES.lstrip().rstrip()},
ra AS MATERIALIZED (SELECT doc_id,
              row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
       FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10),
coll AS (SELECT sum(doc_len)::double AS ct FROM dl),
cfq AS (SELECT term, count(*)::double AS cf FROM tok
        WHERE term IN (SELECT term FROM q) GROUP BY term),
mq AS (SELECT count(*)::bigint AS m FROM cfq),
spq AS (SELECT tf.doc_id,
               sum(ln(1.0 + tf.tf / (300.0 * (cfq.cf / coll.ct)))) AS sp
        FROM tf JOIN cfq USING (term), coll
        WHERE tf.term IN (SELECT term FROM q)
        GROUP BY tf.doc_id),
qsc AS (SELECT spq.doc_id,
               spq.sp + (SELECT m FROM mq)
                 * ln(300.0 / (dl.doc_len + 300.0)) AS score
        FROM spq JOIN dl USING (doc_id)),
rb AS MATERIALIZED (SELECT doc_id,
              row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
       FROM qsc ORDER BY score DESC, doc_id ASC LIMIT 10),
{_interleave_sql(10, 7)}
""",
        "query_clarity": f"""
WITH {_BM25_SCORES.lstrip().rstrip()},
top10 AS (SELECT doc_id FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10),
ttok AS (SELECT doc_id, term FROM tok
         WHERE doc_id IN (SELECT doc_id FROM top10)),
dl2 AS (SELECT doc_id, count(*)::double AS dl FROM ttok GROUP BY doc_id),
ptf AS (SELECT t.term, sum(t.cnt / (10.0 * dl2.dl)) AS pq
        FROM (SELECT doc_id, term, count(*)::double AS cnt
              FROM ttok GROUP BY 1, 2) t
        JOIN dl2 USING (doc_id)
        GROUP BY t.term),
cf AS (SELECT term, count(*)::double AS c FROM tok GROUP BY term),
tot AS (SELECT count(*)::double AS n FROM tok)
SELECT round(sum(pq * log2(pq / (c / n))), 6) + 0.0 AS clarity,
       count(*)::bigint AS n_vocab, 10::bigint AS n_docs
FROM ptf JOIN cf USING (term), tot
""",
        "passage_best_window": f"""
WITH {_BM25_SCORES.lstrip().rstrip()},
top10 AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC)
                   AS rank
          FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10),
tokp AS (
  SELECT doc_id, unnest(toks) AS term, unnest(range(len(toks))) AS pos
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS toks
        FROM documents
        WHERE doc_id IN (SELECT doc_id FROM top10))
),
hits AS (SELECT doc_id, pos FROM tokp
         WHERE term IN ('join', 'merge', 'spark')),
wnd AS (SELECT doc_id, pos,
               count(*) OVER (PARTITION BY doc_id ORDER BY pos
                              RANGE BETWEEN CURRENT ROW AND 29 FOLLOWING)
                 AS n
        FROM hits),
best AS (SELECT doc_id, pos AS pass_start, n AS pass_hits,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY n DESC, pos ASC) AS rn
         FROM wnd)
SELECT t.rank, t.doc_id,
       b.pass_start::bigint AS pass_start, b.pass_hits::bigint AS pass_hits
FROM top10 t JOIN best b USING (doc_id)
WHERE b.rn = 1
ORDER BY t.rank
""",
        "query_string_extended": f"""
WITH {_BM25_SCORES.replace(
    "unnest(['join','merge','spark'])",
    "unnest(['batch','join','value'])",
).lstrip().rstrip()},
req AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'window'),
ban AS (SELECT doc_id FROM documents WHERE instr(text, 'spark merge') > 0)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores
WHERE doc_id IN (SELECT doc_id FROM req)
  AND doc_id NOT IN (SELECT doc_id FROM ban)
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "query_string_search": f"""
WITH {_BM25_SCORES.replace(
    "unnest(['join','merge','spark'])",
    "unnest(['batch','join','merge','spark','value'])",
).lstrip().rstrip()},
neg AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'window'),
cand AS (SELECT doc_id FROM documents
         WHERE instr(text, 'spark merge') > 0 AND source <> 'src5')
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores
WHERE doc_id IN (SELECT doc_id FROM cand)
  AND doc_id NOT IN (SELECT doc_id FROM neg)
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "nrt_add_search": f"""
WITH {_BM25_SCORES.lstrip()}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score, 2::bigint AS n_delta_segments
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "delete_search": f"""
WITH {_BM25_SCORES.lstrip().rstrip()},
mm AS (SELECT ((SELECT max(doc_id) FROM documents) + 8) // 8 AS span),
top1 AS (SELECT doc_id FROM scores ORDER BY score DESC, doc_id ASC LIMIT 1),
dead AS (
  SELECT doc_id FROM documents, mm WHERE doc_id < mm.span AND doc_id % 5 = 2
  UNION SELECT doc_id FROM top1
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score,
       (SELECT count(*) FROM dead)::bigint AS n_tombstones
FROM scores WHERE doc_id NOT IN (SELECT doc_id FROM dead)
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "delete_compact_search": f"""
WITH mm AS (SELECT ((SELECT max(doc_id) FROM documents) + 8) // 8 AS span),
sdocs AS (SELECT doc_id, text FROM documents, mm
          WHERE NOT (doc_id < mm.span AND doc_id % 5 = 2)),
{_BM25_SCORES.replace("FROM documents", "FROM sdocs").lstrip()}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score, 1::bigint AS n_compacted_parts
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "bm25_varint_topk": f"""
WITH {_BM25_SCORES}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "bm25_svbyte_topk": f"""
WITH {_BM25_SCORES}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "hll_error_audit": f"""
WITH t AS ({_hll_registers_sql()}),
s AS (SELECT count(*) AS nz, coalesce(sum(power(2.0, -rank)), 0.0) AS snz FROM t),
c AS (SELECT (4096 - nz) AS zeros, (4096 - nz) * 1.0 + snz AS ssum FROM s),
e AS (SELECT zeros, (0.7213 / (1 + 1.079 / 4096.0)) * 4096.0 * 4096.0 / ssum AS est
      FROM c),
ap AS (SELECT round(CASE WHEN est <= 2.5 * 4096 AND zeros > 0
                    THEN 4096.0 * ln(4096.0 / zeros) ELSE est END, 6) AS est
       FROM e),
ex AS (SELECT count(DISTINCT user_id)::bigint AS n FROM events)
SELECT ex.n AS n_exact, ap.est + 0.0 AS estimate,
       round(abs(ap.est - ex.n), 6) + 0.0 AS abs_err,
       round(abs(ap.est - ex.n) / ex.n, 6) + 0.0 AS rel_err
FROM ex, ap
""",
        "cms_error_audit": f"""
WITH cms AS ({_cms_heavy_hitters_sql(k=3)}),
ex AS (SELECT event_type, count(*)::bigint AS n FROM events GROUP BY 1)
SELECT cms.event_type, cms.n_est AS cms_count, ex.n AS exact_count,
       (cms.n_est - ex.n)::bigint AS overcount
FROM cms JOIN ex USING (event_type) ORDER BY cms.event_type
""",
        "bm25_exhaustive_topk": f"""
WITH {_BM25_SCORES}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "user_rolling_value_7d": """
WITH e AS (SELECT event_id, user_id, ts,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
           FROM events)
SELECT event_id, user_id,
       sum(cents) OVER (PARTITION BY user_id ORDER BY ts
                        RANGE BETWEEN INTERVAL 7 DAYS PRECEDING
                        AND CURRENT ROW)::bigint AS cents_7d
FROM e ORDER BY event_id
""",
        "bm25_filtered_exclude": f"""
WITH {_BM25_SCORES}
SELECT row_number() OVER (ORDER BY s.score DESC, s.doc_id ASC) AS rank,
       s.doc_id, round(s.score, 6) AS score
FROM scores s JOIN documents d USING (doc_id)
WHERE d.source NOT IN ('src0', 'src1')
ORDER BY s.score DESC, s.doc_id ASC LIMIT 10
""",
        "service_cache_hit": f"""
WITH {_BM25_SCORES}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score,
       1::bigint AS cache_hits, 1::bigint AS cache_misses
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "sq8_codes": """
WITH dims AS (SELECT unnest([1, 17, 33, 49]) AS dim),
e AS (SELECT vec_id, d.dim, embedding[d.dim]::double AS v
      FROM embeddings, dims d),
b AS (SELECT dim, min(v) AS lo,
             CASE WHEN max(v) - min(v) > 0 THEN max(v) - min(v)
                  ELSE 1.0 END AS w
      FROM e GROUP BY dim),
c AS (SELECT e.vec_id, e.dim,
             least(greatest(CAST(floor((e.v - b.lo) / b.w * 255) AS BIGINT), 0),
                   255) AS code
      FROM e JOIN b USING (dim))
SELECT vec_id,
       max(CASE WHEN dim = 1 THEN code END)::bigint AS code_d1,
       max(CASE WHEN dim = 17 THEN code END)::bigint AS code_d17,
       max(CASE WHEN dim = 33 THEN code END)::bigint AS code_d33,
       max(CASE WHEN dim = 49 THEN code END)::bigint AS code_d49
FROM c GROUP BY vec_id ORDER BY vec_id
""",
        "media_metadata": _media_expected_sql(),
        "audio_features": """
WITH ids0 AS (SELECT unnest(range(0, 96)) AS m),
par AS (SELECT m::bigint AS media_id,
               (CASE WHEN m < 64 THEN m ELSE m - 64 END)::bigint AS i
        FROM ids0),
ts0 AS (SELECT unnest(range(0, 2048)) AS t0),
ts AS (SELECT t0::bigint AS t FROM ts0),
sig AS (SELECT p.media_id, ts.t,
               trunc(6000 * sin(2 * pi() * ts.t * ((p.i % 7) + 1) / 256.0)
                     + ((ts.t * (p.i % 5)) % 4000))::bigint AS s
        FROM par p, ts),
w AS (SELECT media_id, (t // 256)::bigint AS win, sum(s * s)::bigint AS ss,
             count(*)::bigint AS n
      FROM sig GROUP BY 1, 2)
SELECT media_id, win AS "window",
       round(CAST(sqrt(ss::double / n::double) AS FLOAT)::double, 6) + 0.0
         AS rms
FROM w ORDER BY media_id, win
""",
        "image_features_lossless": """
WITH ids0 AS (SELECT unnest(range(0, 96)) AS m),
par AS (SELECT m::bigint AS media_id, (m % 32)::bigint AS i,
               (m >= 64) AS quant FROM ids0),
xs0 AS (SELECT unnest(range(0, 24)) AS x),
ys0 AS (SELECT unnest(range(0, 16)) AS y),
px0 AS (SELECT p.media_id, p.quant, x.x::bigint AS x, y.y::bigint AS y,
               ((x.x * 255 // 23) + p.i * 7) % 256 AS r0,
               ((y.y * 255 // 15) + p.i * 13) % 256 AS g0,
               (((x.x + y.y) * 255 // 38) + p.i * 29) % 256 AS b0
        FROM par p, xs0 x, ys0 y),
px AS (SELECT media_id, x, y,
              (CASE WHEN quant THEN (r0 // 43) * 43 ELSE r0 END)::bigint AS r,
              (CASE WHEN quant THEN (g0 // 43) * 43 ELSE g0 END)::bigint AS g,
              (CASE WHEN quant THEN (b0 // 43) * 43 ELSE b0 END)::bigint AS b
       FROM px0),
mn AS (SELECT media_id,
              sum(r)::double / 384.0 AS mr, sum(g)::double / 384.0 AS mg,
              sum(b)::double / 384.0 AS mb
       FROM px GROUP BY media_id),
sd AS (SELECT px.media_id,
              sqrt(sum((px.r - mn.mr) * (px.r - mn.mr)) / 384.0) AS sr,
              sqrt(sum((px.g - mn.mg) * (px.g - mn.mg)) / 384.0) AS sg,
              sqrt(sum((px.b - mn.mb) * (px.b - mn.mb)) / 384.0) AS sb
       FROM px JOIN mn USING (media_id) GROUP BY px.media_id),
lu AS (SELECT media_id, (y * 2) // 16 AS gy, (x * 2) // 24 AS gx,
              sum(r * 0.299 + g * 0.587 + b * 0.114)
                / count(*) AS gm
       FROM px GROUP BY 1, 2, 3),
f AS (
  SELECT media_id, 0::bigint AS dim, mr AS v FROM mn
  UNION ALL SELECT media_id, 1, mg FROM mn
  UNION ALL SELECT media_id, 2, mb FROM mn
  UNION ALL SELECT media_id, 3, sr FROM sd
  UNION ALL SELECT media_id, 4, sg FROM sd
  UNION ALL SELECT media_id, 5, sb FROM sd
  UNION ALL SELECT media_id, (6 + gy * 2 + gx)::bigint, gm FROM lu)
SELECT media_id, dim, round(CAST(v AS FLOAT)::double, 6) + 0.0 AS val
FROM f ORDER BY media_id, dim
""",
        "image_features_jpeg": _image_features_jpeg_sql(),
        "video_frames_mjpeg": _video_frames_mjpeg_sql(),
        "video_frames_lossless": """
WITH ids0 AS (SELECT unnest(range(0, 48)) AS m),
par AS (SELECT m::bigint AS media_id,
               (CASE WHEN m < 32 THEN m ELSE m - 32 END)::bigint AS i,
               (m >= 32) AS quant FROM ids0),
fr0 AS (SELECT unnest([0, 3, 6, 9]) AS f),
xs0 AS (SELECT unnest(range(0, 16)) AS x),
ys0 AS (SELECT unnest(range(0, 12)) AS y),
px0 AS (SELECT p.media_id, p.quant, fr0.f::bigint AS f,
               (x.x * 11 + fr0.f * 17 + p.i) % 256 AS r0,
               (y.y * 7 + fr0.f * 29) % 256 AS g0,
               (x.x + y.y + fr0.f + p.i) % 256 AS b0
        FROM par p, fr0, xs0 x, ys0 y),
px AS (SELECT media_id, f,
              (CASE WHEN quant THEN (r0 // 43) * 43 ELSE r0 END)::bigint AS r,
              (CASE WHEN quant THEN (g0 // 43) * 43 ELSE g0 END)::bigint AS g,
              (CASE WHEN quant THEN (b0 // 43) * 43 ELSE b0 END)::bigint AS b
       FROM px0)
SELECT media_id, f AS frame_idx, (480 * f // 12)::bigint AS ts_ms,
       sum(r)::bigint AS sum_r, sum(g)::bigint AS sum_g,
       sum(b)::bigint AS sum_b
FROM px GROUP BY media_id, f ORDER BY media_id, f
""",
        "pagerank_convergence": _pagerank_convergence_sql(5, 0.85),
        "funnel_within_1h": """
WITH e1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
e2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN e1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > e1.t1
    AND e.ts <= e1.t1 + INTERVAL 1 HOUR
  GROUP BY e.user_id),
e3 AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN e2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > e2.t2
    AND e.ts <= e2.t2 + INTERVAL 1 HOUR
  GROUP BY e.user_id),
u AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id,
       (CASE WHEN e3.user_id IS NOT NULL THEN 3
             WHEN e2.user_id IS NOT NULL THEN 2
             WHEN e1.user_id IS NOT NULL THEN 1
             ELSE 0 END)::bigint AS steps_completed
FROM u
LEFT JOIN e1 USING (user_id)
LEFT JOIN e2 USING (user_id)
LEFT JOIN e3 USING (user_id)
ORDER BY u.user_id
""",
        "top2_versions_per_source": """
SELECT source, rn::bigint AS version_rank, doc_id, version FROM (
  SELECT d.source, d.doc_id,
         concat(d.doc_id % 4, '.', d.doc_id % 10,
                CASE WHEN d.doc_id % 3 = 0 THEN '~rc1' ELSE '' END) AS version,
         row_number() OVER (
           PARTITION BY d.source
           ORDER BY d.doc_id % 4 DESC, d.doc_id % 10 DESC,
                    CASE WHEN d.doc_id % 3 = 0 THEN 0 ELSE 1 END DESC,
                    d.doc_id DESC) AS rn
  FROM documents d) WHERE rn <= 2
ORDER BY source, rn
""",
        "kaplan_meier_churn": """
WITH ul AS (SELECT user_id, min(epoch_us(ts)) AS f, max(epoch_us(ts)) AS l,
                   min(CASE WHEN event_type = 'purchase'
                            THEN epoch_us(ts) END) AS fp
            FROM events GROUP BY 1),
u AS (SELECT user_id,
             CASE WHEN fp IS NOT NULL THEN (fp - f) // 86400000000
                  ELSE (l - f) // 86400000000 END AS dur,
             CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM ul),
dt AS (SELECT dur AS t, count(*)::bigint AS d FROM u WHERE ev = 1 GROUP BY dur),
rk AS (SELECT dt.t, dt.d,
              (SELECT count(*) FROM u WHERE u.dur >= dt.t)::bigint AS n
       FROM dt)
SELECT t::bigint AS t_days, n AS n_at_risk, d AS n_events,
       CASE WHEN max(CASE WHEN d >= n THEN 1 ELSE 0 END)
                 OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) = 1
            THEN 0.0
            ELSE round(exp(sum(CASE WHEN d < n
                                    THEN ln(1.0 - d::double / n::double)
                                    ELSE 0.0 END)
                           OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)), 6)
                 + 0.0
       END AS survival
FROM rk ORDER BY t
""",
        "ab_test_conversion": """
WITH u AS (SELECT user_id,
                  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
           FROM events GROUP BY user_id),
s AS (SELECT sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::bigint AS na,
             sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)::bigint AS nb,
             sum(CASE WHEN user_id % 2 = 0 THEN c ELSE 0 END)::bigint AS ca,
             sum(CASE WHEN user_id % 2 = 1 THEN c ELSE 0 END)::bigint AS cb
      FROM u),
m AS (SELECT na, nb, ca, cb,
             ca::double / na::double AS pa, cb::double / nb::double AS pb,
             (ca + cb)::double / (na + nb)::double AS pp
      FROM s)
SELECT na AS n_a, nb AS n_b, ca AS conv_a, cb AS conv_b,
       round(pa, 6) + 0.0 AS p_a, round(pb, 6) + 0.0 AS p_b,
       CASE WHEN pp > 0 AND pp < 1
            THEN round((pa - pb) / sqrt(pp * (1.0 - pp)
                 * (1.0 / na + 1.0 / nb)), 6) + 0.0
            ELSE 0.0 END AS z_stat
FROM m
""",
        "holt_forecast_daily": f"""
WITH RECURSIVE dc AS ({_DAILY_SQL}),
o AS (SELECT n, row_number() OVER (ORDER BY day) AS i FROM dc),
h(i, l, b) AS (
  SELECT 1::bigint,
         (SELECT n::double FROM o WHERE i = 1),
         (SELECT n::double FROM o WHERE i = 2)
           - (SELECT n::double FROM o WHERE i = 1)
  UNION ALL
  SELECT h.i + 1,
         0.5 * o.n + 0.5 * (h.l + h.b),
         0.25 * ((0.5 * o.n + 0.5 * (h.l + h.b)) - h.l) + 0.75 * h.b
  FROM h JOIN o ON o.i = h.i + 1
  WHERE h.i < (SELECT max(i) FROM o)),
fin AS (SELECT l, b FROM h WHERE i = (SELECT max(i) FROM o)),
hh AS (SELECT unnest([1, 2, 3]) AS hz)
SELECT hh.hz::bigint AS horizon,
       round(fin.l + hh.hz * fin.b, 6) + 0.0 AS forecast,
       round(fin.l, 6) + 0.0 AS level, round(fin.b, 6) + 0.0 AS trend
FROM hh, fin ORDER BY horizon
""",
        "lpa_modularity": f"""
WITH {_lpa_ctes(5)},
m AS (SELECT count(*)::bigint AS m FROM ce),
deg AS (SELECT node, count(*)::bigint AS d FROM und GROUP BY node),
nl AS (SELECT l5.node, l5.lbl, deg.d FROM l5 JOIN deg USING (node)),
mc AS (SELECT a.lbl, count(*)::bigint AS mc
       FROM ce JOIN nl a ON a.node = ce.u
               JOIN nl b ON b.node = ce.v AND b.lbl = a.lbl
       GROUP BY a.lbl),
dc AS (SELECT lbl, sum(d)::bigint AS dsum FROM nl GROUP BY lbl)
SELECT (SELECT count(DISTINCT lbl) FROM l5)::bigint AS n_communities,
       (SELECT m FROM m) AS n_edges,
       round(sum(coalesce(mc.mc, 0)::double / (SELECT m FROM m)
                 - (dc.dsum::double / (2.0 * (SELECT m FROM m)))
                   * (dc.dsum::double / (2.0 * (SELECT m FROM m)))), 6) + 0.0
         AS modularity
FROM dc LEFT JOIN mc USING (lbl)
""",
        "feature_mi_quality": f"""
WITH tok AS ({_TOK}),
agg AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN term IN ('the','a','of','to','and','in','is','it')
                  THEN 1 ELSE 0 END) AS n_stop,
         sum(length(term)) AS sum_len
  FROM tok GROUP BY doc_id),
feats AS (
  SELECT d.doc_id, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y,
         coalesce(a.n_tokens, 0)::bigint AS f_ntok,
         floor(coalesce(round(a.n_stop::double / a.n_tokens, 6), 0.0)
               * 1e6 + 0.5)::bigint AS f_stop,
         floor(coalesce(round(a.sum_len::double / a.n_tokens, 6), 0.0)
               * 1e6 + 0.5)::bigint AS f_mlen
  FROM documents d LEFT JOIN agg a USING (doc_id)),
lf AS (SELECT 'n_tokens' AS feature, f_ntok AS v, y FROM feats
       UNION ALL SELECT 'stopword_ratio', f_stop, y FROM feats
       UNION ALL SELECT 'mean_token_len', f_mlen, y FROM feats),
vc AS (SELECT feature, v, count(*)::bigint AS c FROM lf GROUP BY 1, 2),
cum AS (SELECT feature, v, c, sum(c) OVER (PARTITION BY feature ORDER BY v)
          AS cm FROM vc),
nn AS (SELECT feature, sum(c)::bigint AS n FROM vc GROUP BY 1),
thr AS (SELECT c.feature, min(c.v)::bigint AS thr
        FROM cum c JOIN nn USING (feature)
        WHERE c.cm >= (nn.n + 1) // 2 GROUP BY c.feature),
cells AS (SELECT lf.feature,
                 CASE WHEN lf.v > t.thr THEN 1 ELSE 0 END AS x, lf.y,
                 count(*)::bigint AS c
          FROM lf JOIN thr t USING (feature) GROUP BY 1, 2, 3),
rs AS (SELECT feature, x, sum(c)::bigint AS r FROM cells GROUP BY 1, 2),
cs AS (SELECT feature, y, sum(c)::bigint AS s FROM cells GROUP BY 1, 2),
mi AS (SELECT cells.feature,
              sum((cells.c::double / nn.n)
                  * ln(cells.c::double * nn.n / (rs.r::double * cs.s::double)))
                AS mi
       FROM cells JOIN nn USING (feature)
            JOIN rs ON rs.feature = cells.feature AND rs.x = cells.x
            JOIN cs ON cs.feature = cells.feature AND cs.y = cells.y
       WHERE cells.c > 0 GROUP BY cells.feature)
SELECT t.feature, t.thr AS thr_micro,
       coalesce(max(CASE WHEN cells.x = 0 AND cells.y = 0 THEN cells.c END), 0)::bigint AS n00,
       coalesce(max(CASE WHEN cells.x = 0 AND cells.y = 1 THEN cells.c END), 0)::bigint AS n01,
       coalesce(max(CASE WHEN cells.x = 1 AND cells.y = 0 THEN cells.c END), 0)::bigint AS n10,
       coalesce(max(CASE WHEN cells.x = 1 AND cells.y = 1 THEN cells.c END), 0)::bigint AS n11,
       round(max(mi.mi), 6) + 0.0 AS mi
FROM thr t JOIN cells ON cells.feature = t.feature
     JOIN mi ON mi.feature = t.feature
GROUP BY t.feature, t.thr ORDER BY t.feature
""",
        "max_tf_audit": f"""
WITH tok AS ({_TOK}),
tf AS (SELECT doc_id, term, count(*)::bigint AS tf FROM tok GROUP BY 1, 2),
t AS (SELECT term, count(*)::bigint AS df, max(tf)::bigint AS max_tf
      FROM tf GROUP BY term)
SELECT term, df, max_tf FROM t
ORDER BY df DESC, term LIMIT 20
""",
        "serp_diversity_ild": f"""
WITH {_BM25_SCORES},
top AS (SELECT doc_id FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10),
terms AS (SELECT DISTINCT term FROM tok),
{_term_hash64_sql()},
occ AS (SELECT t2.doc_id, th.h FROM tok t2 JOIN th USING (term)
        WHERE t2.doc_id IN (SELECT doc_id FROM top)),
vec AS (SELECT doc_id, (h % 64)::bigint AS dim,
               sum(CASE WHEN h >= 9223372036854775808::hugeint
                        THEN -1.0 ELSE 1.0 END) AS v
        FROM occ GROUP BY 1, 2),
nrm AS (SELECT doc_id, sqrt(sum(v * v)) AS nn FROM vec GROUP BY 1),
e32 AS (SELECT vec.doc_id, dim,
               CAST(v / CASE WHEN nn = 0 THEN 1 ELSE nn END AS FLOAT)::double
                 AS val
        FROM vec JOIN nrm USING (doc_id)),
n2 AS (SELECT doc_id, sqrt(sum(val * val)) AS nn FROM e32 GROUP BY 1),
dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.val * b.val) AS dot
         FROM e32 a JOIN e32 b ON a.dim = b.dim AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM top a JOIN top b ON a.doc_id < b.doc_id)
SELECT p.doc_a, p.doc_b,
       CASE WHEN na.nn > 0 AND nb.nn > 0
            THEN round(coalesce(d.dot, 0.0) / (na.nn * nb.nn), 6) + 0.0
            ELSE 0.0 END AS cos_sim
FROM pairs p
LEFT JOIN dots d ON d.doc_a = p.doc_a AND d.doc_b = p.doc_b
JOIN n2 na ON na.doc_id = p.doc_a
JOIN n2 nb ON nb.doc_id = p.doc_b
ORDER BY p.doc_a, p.doc_b
""",
        "churn_auc_baseline": """
WITH b AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events),
u AS (SELECT user_id,
             sum(CASE WHEN epoch_us(ts) < (SELECT mid FROM b)
                      THEN 1 ELSE 0 END)::bigint AS a,
             max(CASE WHEN epoch_us(ts) >= (SELECT mid FROM b)
                      THEN 1 ELSE 0 END) AS act2
      FROM events GROUP BY user_id),
k AS (SELECT a, CASE WHEN act2 = 0 THEN 1 ELSE 0 END AS y FROM u WHERE a > 0),
r AS (SELECT y, (2 * rank() OVER (ORDER BY a)
                 + count(*) OVER (PARTITION BY a) - 1)::bigint AS r2 FROM k),
s AS (SELECT sum(CASE WHEN y = 1 THEN r2 ELSE 0 END)::hugeint AS s2,
             sum(y)::hugeint AS n1, count(*)::hugeint AS n FROM r)
SELECT n::bigint AS n_users, n1::bigint AS n_churned,
       CASE WHEN n1 > 0 AND n1 < n
            THEN round((s2 - n1 * (n1 + 1))::double
                       / (2 * n1 * (n - n1))::double, 6) + 0.0
            ELSE 0.0 END AS auc
FROM s
""",
        "min_cost_supplier": """
WITH sel_parts AS (
  SELECT p_partkey, p_brand FROM part WHERE p_type = 'LARGE' AND p_size <= 15),
sup_r AS (
  SELECT s_suppkey, s_name, s_acctbal
  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'ASIA'),
offers AS (
  SELECT l_partkey, l_suppkey,
         min(round(l_extendedprice * 100)::bigint) AS min_cents
  FROM lineitem
  JOIN sel_parts ON l_partkey = p_partkey
  JOIN sup_r ON l_suppkey = s_suppkey
  GROUP BY l_partkey, l_suppkey),
best AS (
  SELECT l_partkey, l_suppkey, min_cents,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY min_cents ASC, l_suppkey ASC) AS rn
  FROM offers)
SELECT b.l_partkey AS p_partkey, sp.p_brand, s.s_name,
       round(s.s_acctbal, 6) AS s_acctbal,
       round(b.min_cents / 100.0, 6) AS min_cost
FROM best b
JOIN sel_parts sp ON b.l_partkey = sp.p_partkey
JOIN sup_r s ON b.l_suppkey = s.s_suppkey
WHERE rn = 1 ORDER BY p_partkey
""",
        "important_parts": """
WITH sup_n AS (
  SELECT s_suppkey FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_7'),
rev AS (
  SELECT l_partkey,
         round(l_extendedprice * 100)::bigint
           * (100 - round(l_discount * 100)::bigint) AS rev1e4
  FROM lineitem JOIN sup_n ON l_suppkey = s_suppkey),
per_part AS (SELECT l_partkey, sum(rev1e4)::bigint AS v FROM rev GROUP BY l_partkey),
tot AS (SELECT sum(v)::hugeint AS t FROM per_part)
SELECT l_partkey, round(v / 10000.0, 6) AS value
FROM per_part, tot WHERE v::hugeint * 1000 > t
ORDER BY value DESC, l_partkey
""",
        "part_supplier_counts": """
SELECT p_brand, p_type, p_size::bigint AS p_size,
       count(DISTINCT l_suppkey)::bigint AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
        "sales_opportunity": """
WITH cb AS (
  SELECT c_custkey, c_nationkey, round(c_acctbal * 100)::bigint AS cents
  FROM customer),
stat AS (SELECT sum(cents)::hugeint AS s, count(*)::hugeint AS n
         FROM cb WHERE cents > 0),
rich AS (SELECT cb.* FROM cb, stat WHERE cb.cents::hugeint * stat.n > stat.s),
no_ord AS (SELECT * FROM rich
           WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                   WHERE o_orderdate >= DATE '2000-01-01'))
SELECT c_nationkey::bigint AS c_nationkey, count(*)::bigint AS numcust,
       round(sum(cents) / 100.0, 6) AS totacctbal
FROM no_ord GROUP BY c_nationkey ORDER BY c_nationkey
""",
        "regex_search_linear": f"""
SELECT doc_id::bigint AS doc_id, count(*)::bigint AS n_lines FROM (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents
) WHERE regexp_matches(line, '{REGEX}') GROUP BY doc_id ORDER BY doc_id
""",
        "feed_alerts": _feed_alerts_sql(),
        "bm25_wildcard": f"""
WITH tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl)::double / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
exp AS (SELECT term FROM df WHERE term LIKE 'spa%'
        ORDER BY df DESC, term ASC LIMIT 20),
q AS (SELECT term FROM exp UNION SELECT 'merge'),
scores AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl)) ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
  WHERE tf.term IN (SELECT term FROM q)
  GROUP BY tf.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "bm25_fuzzy": f"""
WITH tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl)::double / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
exp AS (
  SELECT term FROM (
    SELECT w.word, d.term,
           row_number() OVER (PARTITION BY w.word
                              ORDER BY d.df DESC, d.term ASC) AS rn
    FROM (VALUES ('spark'), ('merge')) w(word)
    JOIN df d ON abs(length(d.term) - length(w.word)) <= 1
             AND levenshtein(d.term, w.word) <= 1
  ) WHERE rn <= 50
),
q AS (SELECT DISTINCT term FROM exp),
scores AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl)) ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
  WHERE tf.term IN (SELECT term FROM q)
  GROUP BY tf.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "bm25_msm": f"""
WITH {_BM25_SCORES.replace("GROUP BY tf.doc_id", "GROUP BY tf.doc_id HAVING count(*) >= 2")}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "bm25_recency": f"""
WITH {_BM25_SCORES},
idm AS (SELECT max(doc_id) AS id_max FROM documents),
boosted AS (
  SELECT s.doc_id,
         s.score * power(2.0, -((idm.id_max - s.doc_id) / 86400.0 / 30.0)) AS score
  FROM scores s, idm
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM boosted ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "dedup_keep_best": f"""
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
lab AS (SELECT node, min(label) AS comp FROM reach GROUP BY node),
best AS (
  SELECT node FROM (
    SELECT l.node,
           row_number() OVER (PARTITION BY l.comp
                              ORDER BY d.n_chars DESC, l.node ASC) AS rn
    FROM lab l JOIN documents d ON d.doc_id = l.node
  ) WHERE rn = 1
)
SELECT d.doc_id FROM documents d
WHERE d.doc_id NOT IN (SELECT node FROM lab)
   OR d.doc_id IN (SELECT node FROM best)
ORDER BY doc_id
""",
        "cdc_chunk_dedup": f"""
WITH ltoks AS ({_TOKS_LIST}),
base AS (SELECT doc_id, toks FROM ltoks WHERE len(toks) > 0),
tokp AS (SELECT doc_id, generate_subscripts(toks, 1)::bigint - 1 AS i,
                unnest(toks) AS term FROM base),
terms AS (SELECT DISTINCT term FROM tokp),
{_term_hash64_sql()},
hs AS (SELECT p.doc_id, p.i, t.h FROM tokp p JOIN th t USING (term)),
bnd AS (SELECT doc_id, i, h, (h % 16 = 0) AS is_b FROM hs),
cix AS (
  SELECT doc_id, i, h,
         coalesce(sum(CASE WHEN is_b THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0)::bigint AS cidx
  FROM bnd),
coff AS (SELECT doc_id, cidx, h,
                (i - min(i) OVER (PARTITION BY doc_id, cidx))::hugeint AS off
         FROM cix),
sx0 AS (SELECT doc_id, cidx,
               (h + off + 11400714819323198485) % {_M64} AS x FROM coff),
sx1 AS (SELECT doc_id, cidx,
               ({_mulmod64("xor(x::ubigint, x::ubigint >> 30)::hugeint", "13787848793156543929::hugeint")}) AS x
        FROM sx0),
sx2 AS (SELECT doc_id, cidx,
               ({_mulmod64("xor(x::ubigint, x::ubigint >> 27)::hugeint", "10723151780598845931::hugeint")}) AS x
        FROM sx1),
mixed AS (SELECT doc_id, cidx,
                 xor(x::ubigint, x::ubigint >> 31)::hugeint AS mh FROM sx2),
chunks AS (SELECT doc_id, cidx, sum(mh) % {_M64} AS ch,
                  count(*)::bigint AS n_tok
           FROM mixed GROUP BY doc_id, cidx),
surv AS (SELECT ch, min(doc_id * 1048576 + cidx) AS fp FROM chunks GROUP BY ch),
keptc AS (SELECT c.doc_id, c.n_tok FROM chunks c JOIN surv s
          ON s.ch = c.ch AND s.fp = c.doc_id * 1048576 + c.cidx),
tot AS (SELECT doc_id, count(*)::bigint AS n_chunks FROM chunks GROUP BY doc_id),
ka AS (SELECT doc_id, count(*)::bigint AS n_kept,
              sum(n_tok)::bigint AS kept_tokens
       FROM keptc GROUP BY doc_id)
SELECT t.doc_id, t.n_chunks,
       coalesce(ka.n_kept, 0)::bigint AS n_kept,
       coalesce(ka.kept_tokens, 0)::bigint AS kept_tokens
FROM tot t LEFT JOIN ka USING (doc_id) ORDER BY t.doc_id
""",
        "cdx_prefix_lookup": """
WITH caps AS (
  SELECT 'org,example,' || source || ')/doc/' || lpad(doc_id::varchar, 8, '0') AS surt,
         (1700000000000000 + doc_id * 1000000)::bigint AS ts
  FROM documents
  UNION ALL
  SELECT 'org,example,' || source || ')/doc/' || lpad(doc_id::varchar, 8, '0'),
         (1700000000000000 + doc_id * 1000000 - 3600000000)::bigint
  FROM documents WHERE doc_id % 50 = 0
),
g AS (SELECT surt, count(*)::bigint AS n_captures,
             min(ts) AS first_ts, max(ts) AS last_ts
      FROM caps GROUP BY surt)
SELECT surt, n_captures, first_ts, last_ts FROM g
WHERE surt >= 'org,example,src1)' AND surt < 'org,example,src1*'
ORDER BY surt LIMIT 20
""",
        "wordpiece_fertility": f"""
WITH RECURSIVE
tok AS ({_TOK}),
tokl AS (SELECT d.lang, tok.term FROM tok JOIN documents d USING (doc_id)),
gr AS (
  SELECT unnest(list_transform(range(0, length(term)-1), i -> substr(term, i+1, 2))) AS g FROM tok
  UNION ALL
  SELECT unnest(list_transform(range(0, length(term)-2), i -> substr(term, i+1, 3))) FROM tok
  UNION ALL
  SELECT unnest(list_transform(range(0, length(term)-3), i -> substr(term, i+1, 4))) FROM tok
),
gc AS (SELECT g, count(*) AS n FROM gr GROUP BY g),
topg AS (SELECT g FROM (
  SELECT g, row_number() OVER (ORDER BY n DESC, g ASC) AS rn FROM gc) WHERE rn <= 300),
vocab AS MATERIALIZED (
  SELECT g FROM topg
  UNION
  SELECT unnest(['a','b','c','d','e','f','g','h','i','j','k','l','m','n','o','p','q','r','s','t','u','v','w','x','y','z','0','1','2','3','4','5','6','7','8','9']) AS g
),
v4 AS MATERIALIZED (SELECT g FROM vocab WHERE length(g) = 4),
v3 AS MATERIALIZED (SELECT g FROM vocab WHERE length(g) = 3),
v2 AS MATERIALIZED (SELECT g FROM vocab WHERE length(g) = 2),
words AS (SELECT DISTINCT term FROM tok),
seg(term, pos, pieces) AS (
  SELECT term, 0, 0 FROM words
  UNION ALL
  SELECT term,
         pos + CASE WHEN substr(term, pos+1, 4) IN (SELECT g FROM v4) THEN 4
                    WHEN substr(term, pos+1, 3) IN (SELECT g FROM v3) THEN 3
                    WHEN substr(term, pos+1, 2) IN (SELECT g FROM v2) THEN 2
                    ELSE 1 END,
         pieces + 1
  FROM seg WHERE pos < length(term)
),
wp AS MATERIALIZED (SELECT term, pieces AS n_pieces FROM seg WHERE pos >= length(term)),
fert AS (SELECT tokl.lang, count(*)::bigint AS n_words,
                sum(wp.n_pieces)::bigint AS n_pieces
         FROM tokl JOIN wp USING (term) GROUP BY tokl.lang)
SELECT lang, n_words, n_pieces,
       round(n_pieces::double / n_words, 6) + 0.0 AS fertility
FROM fert ORDER BY lang
""",
        "unigram_lm_cost": f"""
WITH
tok AS ({_TOK}),
tokl AS (SELECT d.lang, tok.term FROM tok JOIN documents d USING (doc_id)),
gr AS (
  SELECT unnest(list_transform(range(0, length(term)), i -> substr(term, i+1, 1))) AS g FROM tok
  UNION ALL
  SELECT unnest(list_transform(range(0, length(term)-1), i -> substr(term, i+1, 2))) FROM tok
  UNION ALL
  SELECT unnest(list_transform(range(0, length(term)-2), i -> substr(term, i+1, 3))) FROM tok
  UNION ALL
  SELECT unnest(list_transform(range(0, length(term)-3), i -> substr(term, i+1, 4))) FROM tok
),
gc AS MATERIALIZED (SELECT g, count(*) AS n FROM gr GROUP BY g),
topg AS (SELECT g FROM (
  SELECT g, row_number() OVER (ORDER BY n DESC, g ASC) AS rn
  FROM gc WHERE length(g) >= 2) WHERE rn <= 300),
inv AS (
  SELECT g FROM topg
  UNION
  SELECT unnest(['a','b','c','d','e','f','g','h','i','j','k','l','m','n','o','p','q','r','s','t','u','v','w','x','y','z','0','1','2','3','4','5','6','7','8','9']) AS g
),
tc AS (SELECT i.g, coalesce(gc.n, 0)::bigint AS cnt FROM inv i LEFT JOIN gc ON gc.g = i.g),
tt AS (SELECT sum(cnt) AS T FROM tc),
pieces AS MATERIALIZED (
  SELECT g, floor(1e6 * ln(tt.T::double / greatest(cnt, 1)))::bigint AS cost
  FROM tc, tt),
words AS (SELECT DISTINCT term FROM tok),
{_unigram_dp_sql(max_len=8, max_piece=4)},
fert AS (SELECT tokl.lang, count(*)::bigint AS n_words,
                sum(wc.d)::bigint AS cost
         FROM tokl JOIN wc USING (term) GROUP BY tokl.lang)
SELECT lang, n_words, cost AS total_cost_micronats,
       round(cost::double / 1e6 / n_words, 6) + 0.0 AS nats_per_word
FROM fert ORDER BY lang
""",
        "bm25_explain": f"""
WITH {_BM25_SCORES},
top AS (
  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id
  FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
)
SELECT top.rank, top.doc_id, tf.term, tf.tf::bigint AS tf,
       round(ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0), 6) AS idf,
       round(ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
             * ((tf.tf * 2.2)
                / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl))), 6)
       AS contribution
FROM top
JOIN tf ON tf.doc_id = top.doc_id AND tf.term IN (SELECT term FROM q)
JOIN df USING (term) JOIN dl ON dl.doc_id = top.doc_id, stats
ORDER BY top.rank, tf.term
""",
        "gopher_rules": r"""
WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws
           FROM documents),
fl AS (SELECT doc_id, unnest(ws) AS wd FROM w),
agg AS (SELECT doc_id, count(*)::bigint AS n_words,
               sum(length(wd))::bigint AS sum_chars,
               sum(CASE WHEN regexp_matches(wd, '[a-zA-Z]') THEN 1 ELSE 0 END)::bigint AS alpha_words,
               count(DISTINCT CASE WHEN lower(wd) IN ('the','be','to','of','and','that','have','with')
                                   THEN lower(wd) END)::bigint AS n_req
        FROM fl GROUP BY doc_id),
lin AS (SELECT doc_id,
               len(string_split(text, chr(10)))::bigint AS n_lines,
               len(list_filter(string_split(text, chr(10)),
                   l -> starts_with(trim(l, ' ' || chr(9) || chr(13) || chr(12) || chr(11)), '-')
                     OR starts_with(trim(l, ' ' || chr(9) || chr(13) || chr(12) || chr(11)), '•')))::bigint AS bullet_lines,
               len(list_filter(string_split(text, chr(10)),
                   l -> ends_with(rtrim(l, ' ' || chr(9) || chr(13) || chr(12) || chr(11)), '...')))::bigint AS ellipsis_lines,
               ((length(text) - length(replace(text, '#', '')))
                + (length(text) - length(replace(text, '...', ''))) // 3)::bigint AS n_sym
        FROM documents),
j AS (SELECT d.doc_id,
             coalesce(a.n_words, 0) AS n_words, coalesce(a.sum_chars, 0) AS sum_chars,
             coalesce(a.alpha_words, 0) AS alpha_words, coalesce(a.n_req, 0) AS n_req,
             l.n_lines, l.bullet_lines, l.ellipsis_lines, l.n_sym
      FROM documents d LEFT JOIN agg a USING (doc_id) JOIN lin l USING (doc_id))
SELECT doc_id, n_words,
       (n_words >= 50 AND n_words <= 100000) AS word_count_ok,
       (3*n_words <= sum_chars AND sum_chars <= 10*n_words AND n_words > 0) AS word_len_ok,
       (10*n_sym <= n_words) AS symbol_ok,
       (10*bullet_lines <= 9*n_lines) AS bullet_ok,
       (10*ellipsis_lines <= 3*n_lines) AS ellipsis_ok,
       (5*alpha_words >= 4*n_words AND n_words > 0) AS alpha_ok,
       (n_req >= 2) AS stop_ok,
       ((n_words >= 50 AND n_words <= 100000)
        AND (3*n_words <= sum_chars AND sum_chars <= 10*n_words AND n_words > 0)
        AND (10*n_sym <= n_words)
        AND (10*bullet_lines <= 9*n_lines)
        AND (10*ellipsis_lines <= 3*n_lines)
        AND (5*alpha_words >= 4*n_words AND n_words > 0)
        AND (n_req >= 2)) AS keep
FROM j ORDER BY doc_id
""",
        "front_coding_sizes": f"""
WITH tok AS ({_TOK}),
v AS (SELECT term, row_number() OVER (ORDER BY term) - 1 AS rn
      FROM (SELECT DISTINCT term FROM tok)),
p AS (SELECT term, rn, rn % 16 AS pos,
             lag(term) OVER (ORDER BY term) AS prev FROM v),
l AS (SELECT term, pos,
             CASE WHEN prev IS NULL THEN 0 ELSE least(
               CASE WHEN substr(term,1,8) = substr(prev,1,8) THEN 8
                    WHEN substr(term,1,7) = substr(prev,1,7) THEN 7
                    WHEN substr(term,1,6) = substr(prev,1,6) THEN 6
                    WHEN substr(term,1,5) = substr(prev,1,5) THEN 5
                    WHEN substr(term,1,4) = substr(prev,1,4) THEN 4
                    WHEN substr(term,1,3) = substr(prev,1,3) THEN 3
                    WHEN substr(term,1,2) = substr(prev,1,2) THEN 2
                    WHEN substr(term,1,1) = substr(prev,1,1) THEN 1
                    ELSE 0 END,
               length(term), length(prev)) END AS lcp
      FROM p),
agg AS (
  SELECT count(*)::bigint AS n_terms,
         ((count(*) + 15) // 16)::bigint AS n_blocks,
         sum(1 + length(term))::bigint AS bytes_raw,
         sum(CASE WHEN pos = 0 THEN 1 + length(term)
                  ELSE 2 + length(term) - lcp END)::bigint AS bytes_front
  FROM l)
SELECT n_terms, n_blocks, bytes_raw, bytes_front,
       round(1.0 - bytes_front::double / bytes_raw, 6) + 0.0 AS savings
FROM agg
""",
        "query_difficulty_pre": f"""
WITH tok AS ({_TOK}),
df AS (SELECT term, count(DISTINCT doc_id)::bigint AS df FROM tok GROUP BY term),
cf AS (SELECT term, count(*)::bigint AS cf FROM tok GROUP BY term),
nd AS (SELECT count(*)::double AS n FROM documents),
tt AS (SELECT count(*)::double AS t FROM tok),
qs AS (SELECT * FROM (VALUES
  (1, 'spark merge join'), (2, 'merge'), (3, 'spark table group'),
  (4, 'the data value'), (5, 'spark qqqqzz')) v(i, q)),
qt AS (SELECT i, q,
              unnest(list_sort(list_distinct(list_filter(
                regexp_split_to_array(lower(q), '[^a-z0-9]+'),
                x -> x <> '')))) AS term
       FROM qs),
kept AS (SELECT qt.i, qt.q, qt.term, df.df, cf.cf
         FROM qt JOIN df USING (term) JOIN cf USING (term)),
a AS (SELECT i, q, count(*)::bigint AS n_terms,
             max(ln(nd.n / df)) AS max_idf,
             sum(ln(nd.n / df)) AS sidf,
             sum(ln(tt.t / cf)) AS sictf,
             sum((1.0 + ln(cf)) * ln(1.0 + nd.n / df)) AS sscq
      FROM kept, nd, tt GROUP BY i, q),
v AS (SELECT k.i, sum(pow(ln(nd.n / k.df) - a.sidf / a.n_terms, 2)) AS ssq
      FROM kept k JOIN a USING (i), nd GROUP BY k.i)
SELECT a.q AS query, a.n_terms,
       round(a.max_idf, 6) + 0.0 AS max_idf,
       round(a.sidf / a.n_terms, 6) + 0.0 AS avg_idf,
       round(v.ssq / a.n_terms, 6) + 0.0 AS var_idf,
       round(a.sictf / a.n_terms, 6) + 0.0 AS avg_ictf,
       round(a.sscq / a.n_terms, 6) + 0.0 AS nscq
FROM a JOIN v USING (i) ORDER BY a.i
""",
        "ordered_window_search": """
WITH occ_a AS (
  SELECT doc_id, (s + (ord - 1) * 5)::bigint AS pos FROM (
    SELECT doc_id, ord,
           sum(strlen(part)) OVER (PARTITION BY doc_id ORDER BY ord) AS s,
           count(*) OVER (PARTITION BY doc_id) AS nparts
    FROM (SELECT doc_id,
                 unnest(str_split(text, 'spark')) AS part,
                 unnest(range(1, len(str_split(text, 'spark')) + 1)) AS ord
          FROM documents)) WHERE ord < nparts),
occ_b AS (
  SELECT doc_id, (s + (ord - 1) * 4)::bigint AS pos FROM (
    SELECT doc_id, ord,
           sum(strlen(part)) OVER (PARTITION BY doc_id ORDER BY ord) AS s,
           count(*) OVER (PARTITION BY doc_id) AS nparts
    FROM (SELECT doc_id,
                 unnest(str_split(text, 'join')) AS part,
                 unnest(range(1, len(str_split(text, 'join')) + 1)) AS ord
          FROM documents)) WHERE ord < nparts)
SELECT a.doc_id::bigint AS doc_id, count(*)::bigint AS n_pairs
FROM occ_a a JOIN occ_b b
  ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 40
GROUP BY a.doc_id ORDER BY doc_id
""",
        "ann_recall_audit": f"""
WITH lsh AS (SELECT vec_id FROM ({_lsh_knn_sql()})),
q AS (SELECT list_transform(embedding, x -> x::double) AS qe
      FROM embeddings WHERE vec_id = 0),
exact AS (
  SELECT vec_id FROM (
    SELECT e.vec_id,
           list_cosine_similarity(list_transform(e.embedding, x -> x::double), q.qe) AS cs
    FROM embeddings e CROSS JOIN q
    ORDER BY cs DESC, vec_id ASC LIMIT 10)),
ov AS (SELECT count(*)::bigint AS n FROM lsh JOIN exact USING (vec_id))
SELECT 10::bigint AS k, ov.n AS n_overlap,
       round(ov.n / 10.0, 6) + 0.0 AS recall_at_10
FROM ov
""",
        "ivf_recall_audit": f"""
WITH ivf AS (SELECT vec_id FROM ({_ivf_knn_hashmin_sql()})),
q AS (SELECT list_transform(embedding, x -> x::double) AS qe
      FROM embeddings WHERE vec_id = 0),
exact AS (
  SELECT vec_id FROM (
    SELECT e.vec_id,
           list_cosine_similarity(list_transform(e.embedding, x -> x::double), q.qe) AS cs
    FROM embeddings e CROSS JOIN q
    ORDER BY cs DESC, vec_id ASC LIMIT 10)),
ov AS (SELECT count(*)::bigint AS n FROM ivf JOIN exact USING (vec_id))
SELECT 10::bigint AS k, ov.n AS n_overlap,
       round(ov.n / 10.0, 6) + 0.0 AS recall_at_10
FROM ov
""",
        "search_as_you_type": f"""
WITH tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl)::double / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
exp AS (SELECT term FROM df WHERE term LIKE 'me%'
        ORDER BY df DESC, term ASC LIMIT 20),
q AS (SELECT term FROM exp UNION SELECT 'join'),
scores AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl)) ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
  WHERE tf.term IN (SELECT term FROM q)
  GROUP BY tf.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "bm25_infix_wildcard": f"""
WITH tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl)::double / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
exp AS (SELECT term FROM df WHERE term LIKE '%par%'
        ORDER BY df DESC, term ASC LIMIT 20),
q AS (SELECT term FROM exp UNION SELECT 'merge'),
scores AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl)) ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
  WHERE tf.term IN (SELECT term FROM q)
  GROUP BY tf.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "opic_importance": f"""
WITH {_LINK_EDGES_CTE},
edges2 AS MATERIALIZED (SELECT src, dst FROM edges),
nn AS MATERIALIZED (SELECT DISTINCT node FROM
  (SELECT src AS node FROM edges2 UNION ALL SELECT dst FROM edges2)),
cnt AS (SELECT count(*)::double AS n FROM nn),
od AS MATERIALIZED (SELECT src AS node, count(*)::double AS deg
                    FROM edges2 GROUP BY src),
c0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM cnt) AS c FROM nn),
m1 AS MATERIALIZED (
  SELECT e.dst AS node, sum(c0.c / od.deg) AS c
  FROM edges2 e JOIN c0 ON c0.node = e.src
  JOIN od ON od.node = e.src GROUP BY e.dst),
d1 AS (SELECT coalesce(sum(c0.c), 0.0) AS d FROM c0
         WHERE c0.node NOT IN (SELECT node FROM od)),
c1 AS MATERIALIZED (
  SELECT nn.node, coalesce(m1.c, 0.0) + (SELECT d FROM d1) / (SELECT n FROM cnt) AS c
  FROM nn LEFT JOIN m1 USING (node)),
m2 AS MATERIALIZED (
  SELECT e.dst AS node, sum(c1.c / od.deg) AS c
  FROM edges2 e JOIN c1 ON c1.node = e.src
  JOIN od ON od.node = e.src GROUP BY e.dst),
d2 AS (SELECT coalesce(sum(c1.c), 0.0) AS d FROM c1
         WHERE c1.node NOT IN (SELECT node FROM od)),
c2 AS MATERIALIZED (
  SELECT nn.node, coalesce(m2.c, 0.0) + (SELECT d FROM d2) / (SELECT n FROM cnt) AS c
  FROM nn LEFT JOIN m2 USING (node)),
m3 AS MATERIALIZED (
  SELECT e.dst AS node, sum(c2.c / od.deg) AS c
  FROM edges2 e JOIN c2 ON c2.node = e.src
  JOIN od ON od.node = e.src GROUP BY e.dst),
d3 AS (SELECT coalesce(sum(c2.c), 0.0) AS d FROM c2
         WHERE c2.node NOT IN (SELECT node FROM od)),
c3 AS MATERIALIZED (
  SELECT nn.node, coalesce(m3.c, 0.0) + (SELECT d FROM d3) / (SELECT n FROM cnt) AS c
  FROM nn LEFT JOIN m3 USING (node)),
imp AS (SELECT nn.node, (c0.c + c1.c + c2.c + c3.c) / 4.0 AS imp
        FROM nn JOIN c0 USING (node) JOIN c1 USING (node)
        JOIN c2 USING (node) JOIN c3 USING (node))
SELECT node, round(imp, 6) + 0.0 AS importance
FROM imp ORDER BY round(imp, 6) DESC, node ASC LIMIT 20
""",
        "postings_export": f"""
WITH tok AS ({_TOK})
SELECT term, doc_id, count(*)::bigint AS tf
FROM tok WHERE term IN ('join', 'merge', 'spark')
GROUP BY term, doc_id ORDER BY term, doc_id
""",
        # round 5 (VERDICT r4 #8): the PPM arm of the image pipeline —
        # fixed-layout P6 raster = the same closed-form pixel recipe the
        # lossless gate replays, without the palette-quantized arm.
        "image_features": """
WITH ids0 AS (SELECT unnest(range(0, 32)) AS m),
par AS (SELECT m::bigint AS media_id, m::bigint AS i FROM ids0),
xs0 AS (SELECT unnest(range(0, 24)) AS x),
ys0 AS (SELECT unnest(range(0, 16)) AS y),
px AS (SELECT p.media_id, x.x::bigint AS x, y.y::bigint AS y,
              (((x.x * 255 // 23) + p.i * 7) % 256)::bigint AS r,
              (((y.y * 255 // 15) + p.i * 13) % 256)::bigint AS g,
              ((((x.x + y.y) * 255 // 38) + p.i * 29) % 256)::bigint AS b
       FROM par p, xs0 x, ys0 y),
mn AS (SELECT media_id,
              sum(r)::double / 384.0 AS mr, sum(g)::double / 384.0 AS mg,
              sum(b)::double / 384.0 AS mb
       FROM px GROUP BY media_id),
sd AS (SELECT px.media_id,
              sqrt(sum((px.r - mn.mr) * (px.r - mn.mr)) / 384.0) AS sr,
              sqrt(sum((px.g - mn.mg) * (px.g - mn.mg)) / 384.0) AS sg,
              sqrt(sum((px.b - mn.mb) * (px.b - mn.mb)) / 384.0) AS sb
       FROM px JOIN mn USING (media_id) GROUP BY px.media_id),
lu AS (SELECT media_id, (y * 2) // 16 AS gy, (x * 2) // 24 AS gx,
              sum(r * 0.299 + g * 0.587 + b * 0.114)
                / count(*) AS gm
       FROM px GROUP BY 1, 2, 3),
f AS (
  SELECT media_id, 0::bigint AS dim, mr AS v FROM mn
  UNION ALL SELECT media_id, 1, mg FROM mn
  UNION ALL SELECT media_id, 2, mb FROM mn
  UNION ALL SELECT media_id, 3, sr FROM sd
  UNION ALL SELECT media_id, 4, sg FROM sd
  UNION ALL SELECT media_id, 5, sb FROM sd
  UNION ALL SELECT media_id, (6 + gy * 2 + gx)::bigint, gm FROM lu)
SELECT media_id, dim, round(CAST(v AS FLOAT)::double, 6) + 0.0 AS val
FROM f ORDER BY media_id, dim
""",
        # round 5: knn_cosine_ivf now runs the deterministic hash-min
        # quantizer (16 lists, nprobe=4, zero Lloyd iterations) so the
        # full train→assign→probe→top-k chain replays in SQL — the
        # last driver-window row goes hash-green (VERDICT r4 item 1).
        "knn_cosine_ivf": _ivf_knn_hashmin_sql(num_lists=16, nprobe=4, k=10),
        # round 5: sloppy-phrase ranking — the proximity gate's byte-
        # offset occ CTEs with an integer 1e6//gap weight per ordered
        # pair; integer division keeps engine and SQL bit-equal.
        "sloppy_phrase_rank": """
WITH occ_a AS (
  SELECT doc_id, (s + (ord - 1) * 5)::bigint AS pos FROM (
    SELECT doc_id, ord,
           sum(strlen(part)) OVER (PARTITION BY doc_id ORDER BY ord) AS s,
           count(*) OVER (PARTITION BY doc_id) AS nparts
    FROM (SELECT doc_id,
                 unnest(str_split(text, 'spark')) AS part,
                 unnest(range(1, len(str_split(text, 'spark')) + 1)) AS ord
          FROM documents)) WHERE ord < nparts),
occ_b AS (
  SELECT doc_id, (s + (ord - 1) * 4)::bigint AS pos FROM (
    SELECT doc_id, ord,
           sum(strlen(part)) OVER (PARTITION BY doc_id ORDER BY ord) AS s,
           count(*) OVER (PARTITION BY doc_id) AS nparts
    FROM (SELECT doc_id,
                 unnest(str_split(text, 'join')) AS part,
                 unnest(range(1, len(str_split(text, 'join')) + 1)) AS ord
          FROM documents)) WHERE ord < nparts),
pw AS (
  SELECT a.doc_id, sum(1000000 // greatest(b.pos - a.pos, 1))::bigint AS sloppy_w
  FROM occ_a a JOIN occ_b b
    ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 40
  GROUP BY a.doc_id)
SELECT row_number() OVER (ORDER BY sloppy_w DESC, doc_id ASC) AS rank,
       doc_id::bigint AS doc_id, sloppy_w
FROM pw ORDER BY sloppy_w DESC, doc_id ASC LIMIT 10
""",
    }
