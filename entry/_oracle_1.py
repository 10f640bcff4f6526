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
    LITERAL,
    REGEX,
    _BM25_SCORES,
    _CURATE_TOTAL,
    _DSIR_W_CTES,
    _FNV_TOK,
    _LINK_EDGES_CTE,
    _M64,
    _NB_PRED_CTES,
    _QC_CTES,
    _TOK,
    _TOKS_LIST,
    _TUNE_GRID,
    _ab_ztest_sql,
    _alerts_sql,
    _bpe_merges_sql,
    _bpe_subtoken_count_sql,
    _cms_heavy_hitters_sql,
    _connected_components_sql,
    _corr_sql,
    _focused_hits_sql,
    _fuzzy_dedup_sql,
    _grouped_hll_sql,
    _hits_sql,
    _hll_registers_sql,
    _hll_sets_sql,
    _hyperanf_sql,
    _ivf_assignment_sql,
    _ivf_knn_hashmin_sql,
    _jaccard_verified_sql,
    _kcore_sql,
    _kmeans_sql,
    _kmv_sql,
    _langid_values,
    _logreg_sql,
    _lpa_ctes,
    _lpa_sql,
    _lsh_assignment_sql,
    _lsh_knn_sql,
    _ltr_sql,
    _minhash_pairs_sql,
    _mmr_sql,
    _mulmod64,
    _near_dup_lsh_sql,
    _nqc_sql,
    _pagerank_ctes,
    _pagerank_sql,
    _pbm_sql,
    _pca_sql,
    _price_model_sql,
    _ring_sql,
    _selectivity_sql,
    _serp_ctr_sql,
    _splitmix_docs_ctes,
    _term_hash64_sql,
    _trustrank_sql,
    _tune_bm25_sql,
    _xlx,
)


def part_1() -> dict[str, str]:
    tris = sorted({LITERAL[i : i + 3] for i in range(len(LITERAL) - 2)})
    tri_conds = " AND ".join(f"contains(text, '{t}')" for t in tris)
    return {
        "bm25_topk": f"""
WITH {_BM25_SCORES}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "bm25_bmw": f"""
WITH {_BM25_SCORES}
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "bm25_top2_per_source": f"""
WITH {_BM25_SCORES},
ranked AS (
  SELECT s.doc_id, d.source, s.score,
         row_number() OVER (PARTITION BY d.source ORDER BY s.score DESC, s.doc_id ASC) AS rn,
         row_number() OVER (ORDER BY s.score DESC, s.doc_id ASC) AS grank
  FROM scores s JOIN documents d USING (doc_id)
)
SELECT doc_id, source, round(score, 6) AS score
FROM ranked WHERE rn <= 2 ORDER BY grank LIMIT 10
""",
        "term_df": f"""
SELECT term, count(DISTINCT doc_id)::bigint AS df FROM ({_TOK}) GROUP BY term ORDER BY term
""",
        "ef_posting_sizes": f"""
WITH tok AS ({_TOK}),
posting AS (SELECT term, doc_id, count(*)::bigint AS tf FROM tok GROUP BY term, doc_id),
span AS (SELECT ((max(doc_id) + 8) // 8)::bigint AS s FROM documents),
placed AS (
  SELECT term, doc_id, tf,
         (row_number() OVER (
            PARTITION BY term, least(doc_id // (SELECT s FROM span), 7)
            ORDER BY doc_id) - 1) // 128 AS blk,
         least(doc_id // (SELECT s FROM span), 7) AS part
  FROM posting
),
blocks AS (
  SELECT term, part, blk, count(*)::bigint AS n,
         (count(*) - 1)::bigint AS m,
         (max(doc_id) - min(doc_id))::bigint AS U,
         max(tf)::bigint AS max_tf
  FROM placed GROUP BY term, part, blk
),
sized AS (
  SELECT term,
         26 + 2 + (m * l + 7) // 8
         + CASE WHEN m > 0 THEN (m + (U >> l) + 7) // 8 ELSE 0 END
         + (n * length(bin(max_tf)) + 7) // 8 AS bytes
  FROM (SELECT *, CASE WHEN m = 0 THEN 0 ELSE length(bin(U // m)) - 1 END AS l
        FROM blocks)
)
SELECT term, sum(bytes)::bigint AS ef_bytes FROM sized GROUP BY term ORDER BY term
""",
        "corpus_stats": f"""
WITH tok AS ({_TOK}), dl AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id)
SELECT (SELECT count(*) FROM documents)::bigint AS n_docs,
       (SELECT coalesce(sum(n),0) FROM dl)::bigint AS total_tokens,
       round((SELECT sum(n) FROM dl)::double / (SELECT count(*) FROM documents), 6) AS avgdl
""",
        "token_count": f"""
SELECT d.doc_id, coalesce(c.n, 0)::bigint AS n_tokens
FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS n FROM ({_TOK}) GROUP BY doc_id) c
USING (doc_id) ORDER BY doc_id
""",
        "bpe_token_count": r"""
SELECT doc_id,
       length(regexp_extract_all(text,'''[a-zA-Z]+| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+'))::bigint AS n_bpe_tokens
FROM documents ORDER BY doc_id
""",
        "quality_score": f"""
WITH tok AS ({_TOK}),
agg AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN term IN ('the','a','of','to','and','in','is','it') THEN 1 ELSE 0 END) AS n_stop,
         sum(length(term)) AS sum_len
  FROM tok GROUP BY doc_id)
SELECT d.doc_id, coalesce(a.n_tokens,0)::bigint AS n_tokens,
       coalesce(a.n_stop,0)::bigint AS n_stopwords,
       coalesce(round(a.n_stop::double / a.n_tokens, 6), 0.0) AS stopword_ratio,
       coalesce(round(a.sum_len::double / a.n_tokens, 6), 0.0) AS mean_token_len
FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id
""",
        "tfidf_keywords": f"""
WITH tok AS ({_TOK}),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln((SELECT count(*) FROM documents)::double / df.df) AS score
  FROM tf JOIN df USING (term)),
ranked AS (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
  FROM scored)
SELECT doc_id, rank::bigint AS rank, term, round(score, 6) AS tfidf
FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
""",
        "bpe_word_counts": f"""
SELECT term AS word, count(*)::bigint AS n FROM ({_TOK}) GROUP BY term ORDER BY word
""",
        "bpe_merges": _bpe_merges_sql(),
        "bpe_subtoken_count": _bpe_subtoken_count_sql(),
        "related_terms_pmi": f"""
WITH toks AS ({_TOKS_LIST}),
dt AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM toks),
nn AS (SELECT count(*)::double AS n FROM documents),
qd AS (SELECT doc_id FROM dt WHERE term = 'spark'),
nq AS (SELECT count(*)::double AS c FROM qd),
df AS (SELECT term, count(*)::double AS df FROM dt GROUP BY term),
codf AS (SELECT dt.term, count(*)::double AS codf
         FROM dt JOIN qd USING (doc_id) GROUP BY dt.term)
SELECT term, codf::bigint AS pair_df,
       round(ln(((SELECT n FROM nn) * codf) / (df * (SELECT c FROM nq))), 6) AS pmi
FROM codf JOIN df USING (term)
WHERE term <> 'spark' AND codf >= 2
ORDER BY pmi DESC, term ASC LIMIT 20
""",
        "autocomplete_prefix": f"""
WITH toks AS ({_TOKS_LIST}),
dt AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM toks)
SELECT term, count(*)::bigint AS df FROM dt
WHERE starts_with(term, 'st')
GROUP BY term ORDER BY df DESC, term ASC LIMIT 10
""",
        "autocomplete_suffix": f"""
WITH toks AS ({_TOKS_LIST}),
dt AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM toks)
SELECT term, count(*)::bigint AS df FROM dt
WHERE ends_with(term, 'er')
GROUP BY term ORDER BY df DESC, term ASC LIMIT 10
""",
        "stemmed_term_df": f"""
WITH toks AS ({_TOKS_LIST}),
dt AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM toks),
st AS (SELECT doc_id,
  CASE
    WHEN len(term) >= 4 AND term LIKE '%ies' THEN
      CASE WHEN term LIKE '%aies' OR term LIKE '%eies' THEN term
           ELSE substr(term, 1, len(term) - 3) || 'y' END
    WHEN len(term) >= 3 AND term LIKE '%es' THEN
      CASE WHEN term LIKE '%aes' OR term LIKE '%ees' OR term LIKE '%oes' THEN term
           ELSE substr(term, 1, len(term) - 1) END
    WHEN len(term) >= 3 AND term LIKE '%s' THEN
      CASE WHEN term LIKE '%us' OR term LIKE '%ss' THEN term
           ELSE substr(term, 1, len(term) - 1) END
    ELSE term END AS term
  FROM dt),
sd AS (SELECT DISTINCT doc_id, term FROM st)
SELECT term, count(*)::bigint AS df FROM sd GROUP BY term ORDER BY term
""",
        "bm25_pruned_topk": f"""
WITH tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl)::double / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
pruned AS (
  SELECT doc_id, term, tf FROM (
    SELECT tf.*, row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id ASC) AS rn
    FROM tf) WHERE rn <= 32),
q AS (SELECT unnest(['join','merge','spark']) AS term),
scores AS (
  SELECT p.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * p.tf * 2.2
              / (p.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl)) ) AS score
  FROM pruned p JOIN df USING (term) JOIN dl USING (doc_id), stats
  WHERE p.term IN (SELECT term FROM q)
  GROUP BY p.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "bm25_param_sweep": _tune_bm25_sql(_TUNE_GRID, k=10),
        "more_like_this": f"""
WITH tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl)::double / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
tsel AS (
  SELECT term FROM (
    SELECT tf.term,
           tf.tf * ln((SELECT n_docs FROM stats)::double / df.df) AS s
    FROM tf JOIN df USING (term) WHERE tf.doc_id = 42)
  ORDER BY s DESC, term ASC LIMIT 5),
scores AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl)) ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
  WHERE tf.term IN (SELECT term FROM tsel)
  GROUP BY tf.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM (SELECT * FROM scores WHERE doc_id <> 42
      ORDER BY score DESC, doc_id ASC LIMIT 10)
ORDER BY score DESC, doc_id ASC
""",
        "bm25_eval_metrics": f"""
WITH {_BM25_SCORES},
ranked AS (
  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id
  FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10),
rel AS (
  SELECT doc_id FROM tok WHERE term IN ('join','merge','spark')
  GROUP BY doc_id HAVING count(DISTINCT term) = 3),
nrel AS (SELECT count(*)::bigint AS r FROM rel),
hits AS (SELECT rank FROM ranked JOIN rel USING (doc_id)),
dcg AS (SELECT coalesce(sum(1.0 / log2(rank + 1.0)), 0.0) AS v FROM hits),
idcg AS (
  SELECT coalesce(sum(1.0 / log2(i + 1.0)), 0.0) AS v
  FROM (SELECT unnest(range(1, 1 + least((SELECT r FROM nrel), 10))) AS i)),
mrr AS (
  SELECT CASE WHEN (SELECT count(*) FROM hits) = 0 THEN 0.0
              ELSE 1.0 / (SELECT min(rank)::double FROM hits) END AS v)
SELECT (SELECT r FROM nrel) AS n_relevant,
       round(CASE WHEN (SELECT v FROM idcg) > 0
                  THEN (SELECT v FROM dcg) / (SELECT v FROM idcg)
                  ELSE 0.0 END, 6) AS ndcg_at_10,
       round((SELECT v FROM mrr), 6) AS mrr
""",
        "bm25_pr_eval": f"""
WITH {_BM25_SCORES},
ranked AS (
  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id
  FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10),
rel AS (
  SELECT doc_id FROM tok WHERE term IN ('join','merge','spark')
  GROUP BY doc_id HAVING count(DISTINCT term) = 3),
nrel AS (SELECT count(*)::bigint AS r FROM rel),
hits AS (SELECT rank FROM ranked JOIN rel USING (doc_id)),
ap AS (
  SELECT coalesce(sum(cnt_le::double / rank), 0.0) AS s
  FROM (SELECT rank, row_number() OVER (ORDER BY rank) AS cnt_le FROM hits))
SELECT (SELECT r FROM nrel) AS n_relevant,
       round((SELECT count(*) FROM hits)::double / 10, 6) AS precision_at_10,
       round(CASE WHEN (SELECT r FROM nrel) = 0 THEN 0.0
                  ELSE (SELECT count(*) FROM hits)::double / (SELECT r FROM nrel) END, 6) AS recall_at_10,
       round(CASE WHEN (SELECT r FROM nrel) = 0 THEN 0.0
                  ELSE (SELECT s FROM ap) / least((SELECT r FROM nrel), 10) END, 6) AS avg_precision
""",
        "redde_collection_ranking": """
WITH samp AS (
  SELECT doc_id, text, (CAST(substr(source, 4) AS BIGINT) % 3) AS coll
  FROM documents WHERE doc_id % 5 = 0),
tok AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text),
        '[^a-z0-9]+'), x -> x <> '')) AS term FROM samp),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM samp) AS n_docs,
         (SELECT sum(doc_len) FROM dl)::double / (SELECT count(*) FROM samp) AS avgdl),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
scores AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl)) ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
  WHERE tf.term IN ('join','merge','spark')
  GROUP BY tf.doc_id),
hits AS (
  SELECT s.doc_id, p.coll FROM scores s JOIN samp p USING (doc_id)
  ORDER BY s.score DESC, s.doc_id ASC LIMIT 20),
fullc AS (SELECT (CAST(substr(source, 4) AS BIGINT) % 3) AS coll,
                 count(*)::bigint AS n FROM documents GROUP BY 1),
sampc AS (SELECT coll, count(*)::bigint AS n FROM samp GROUP BY 1),
votes AS (SELECT coll, count(*)::bigint AS v FROM hits GROUP BY 1),
est AS (
  SELECT f.coll, round(coalesce(v.v, 0) * f.n::double / s.n, 6) + 0.0 AS est_rel
  FROM fullc f JOIN sampc s USING (coll) LEFT JOIN votes v USING (coll))
SELECT coll AS collection, est_rel,
       row_number() OVER (ORDER BY est_rel DESC, coll ASC)::bigint AS rank
FROM est ORDER BY collection
""",
        "pbm_click_model": _pbm_sql(n_sessions=200, seed=7, iters=5),
        "dsir_weights": f"""
WITH {_DSIR_W_CTES}
SELECT d.doc_id, coalesce(a.n_bigrams, 0)::bigint AS n_bigrams,
       coalesce(round(a.s, 6), 0.0) AS log_weight
FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id
""",
        "dsir_select": f"""
WITH {_DSIR_W_CTES},
w AS (SELECT d.doc_id, coalesce(round(a.s, 6), 0.0) AS lw
      FROM documents d LEFT JOIN agg a USING (doc_id)),
cut AS (SELECT quantile_disc(lw, 0.75) AS c FROM w)
SELECT doc_id FROM w WHERE lw >= (SELECT c FROM cut) ORDER BY doc_id
""",
        "pagerank_prior": _pagerank_sql(k=5, d=0.85),
        "link_edges": f"""
WITH {_LINK_EDGES_CTE}
SELECT src, dst, anchor FROM edges ORDER BY src, dst, anchor
""",
        "anchor_terms_topk": f"""
WITH {_LINK_EDGES_CTE},
at AS (SELECT dst AS doc_id, unnest(string_split(anchor, ' ')) AS term FROM edges),
ct AS (SELECT doc_id, term, count(*)::bigint AS anchor_tf FROM at GROUP BY doc_id, term)
SELECT doc_id, term, anchor_tf FROM ct
ORDER BY anchor_tf DESC, doc_id, term LIMIT 100
""",
        "link_pagerank": _pagerank_sql(k=5, d=0.85, edges_cte=_LINK_EDGES_CTE),
        "personalized_pagerank": _pagerank_sql(
            k=5,
            d=0.85,
            edges_cte=_LINK_EDGES_CTE,
            seeds_cte="""seeds AS (
  SELECT DISTINCT src AS node FROM edges ORDER BY src LIMIT 3)""",
        ),
        "host_rank_mass": f"""
WITH {_pagerank_ctes(5, 0.85, _LINK_EDGES_CTE)},
hm AS (
  SELECT d.source || '.example.org' AS host,
         coalesce(round(round(r.r, 6) * 1000000.0), 0.0)::bigint AS m
  FROM documents d LEFT JOIN r5 r ON d.doc_id = r.node)
SELECT host, count(*)::bigint AS n_docs, sum(m)::bigint AS rank_mass_e6
FROM hm GROUP BY host ORDER BY host
""",
        "link_hits": _hits_sql(k=5, edges_cte=_LINK_EDGES_CTE),
        "cocitation_topk": f"""
WITH {_LINK_EDGES_CTE},
em AS MATERIALIZED (SELECT src, dst FROM edges),
cc AS (SELECT e1.dst AS id_a, e2.dst AS id_b, count(*)::bigint AS n_shared
       FROM em e1 JOIN em e2 ON e1.src = e2.src AND e1.dst < e2.dst
       GROUP BY 1, 2)
SELECT id_a, id_b, n_shared FROM cc
ORDER BY n_shared DESC, id_a, id_b LIMIT 100
""",
        "coupling_topk": f"""
WITH {_LINK_EDGES_CTE},
em AS MATERIALIZED (SELECT src, dst FROM edges),
cc AS (SELECT e1.src AS id_a, e2.src AS id_b, count(*)::bigint AS n_shared
       FROM em e1 JOIN em e2 ON e1.dst = e2.dst AND e1.src < e2.src
       GROUP BY 1, 2)
SELECT id_a, id_b, n_shared FROM cc
ORDER BY n_shared DESC, id_a, id_b LIMIT 100
""",
        "link_degree_stats": f"""
WITH {_LINK_EDGES_CTE},
outd AS (SELECT src AS node, count(*)::bigint AS c FROM edges GROUP BY src),
ind AS (SELECT dst AS node, count(*)::bigint AS c FROM edges GROUP BY dst)
SELECT d.doc_id::bigint AS doc_id,
       coalesce(o.c, 0)::bigint AS out_links,
       coalesce(i.c, 0)::bigint AS in_links
FROM documents d
LEFT JOIN outd o ON o.node = d.doc_id
LEFT JOIN ind i ON i.node = d.doc_id
ORDER BY doc_id
""",
        "link_triangles": f"""
WITH {_LINK_EDGES_CTE},
ce AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ce e1
  JOIN ce e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN ce e3 ON e3.a = e1.b AND e3.b = e2.b),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri)
SELECT node, count(*)::bigint AS n_triangles
FROM corners GROUP BY node ORDER BY node
""",
        "link_communities": _lpa_sql(k=5, edges_cte=_LINK_EDGES_CTE),
        "coupling_jaccard_topk": f"""
WITH {_LINK_EDGES_CTE},
em AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges),
outd AS (SELECT src, count(*)::bigint AS d FROM em GROUP BY src),
cc AS (SELECT e1.src AS id_a, e2.src AS id_b, count(*)::bigint AS s
       FROM em e1 JOIN em e2 ON e1.dst = e2.dst AND e1.src < e2.src
       GROUP BY 1, 2)
SELECT id_a, id_b, s AS n_shared,
       round(s::double / (da.d + db.d - s), 6) AS jaccard
FROM cc
JOIN outd da ON da.src = cc.id_a
JOIN outd db ON db.src = cc.id_b
ORDER BY s::double / (da.d + db.d - s) DESC, id_a, id_b LIMIT 20
""",
        "host_link_graph": f"""
WITH {_LINK_EDGES_CTE}
SELECT ds.source || '.example.org' AS src_host,
       dd.source || '.example.org' AS dst_host,
       count(*)::bigint AS n_links
FROM edges e
JOIN documents ds ON ds.doc_id = e.src
JOIN documents dd ON dd.doc_id = e.dst
GROUP BY 1, 2 ORDER BY 1, 2
""",
        "link_reachability": f"""
WITH {_LINK_EDGES_CTE},
seeds AS (SELECT DISTINCT src AS node FROM edges ORDER BY src LIMIT 3),
c0 AS MATERIALIZED (SELECT node, 0::bigint AS hops FROM seeds),
n1 AS MATERIALIZED (
  SELECT DISTINCT e.dst AS node FROM edges e JOIN c0 ON c0.node = e.src
  WHERE e.dst NOT IN (SELECT node FROM c0)),
c1 AS MATERIALIZED (
  SELECT node, hops FROM c0 UNION ALL SELECT node, 1::bigint FROM n1),
n2 AS MATERIALIZED (
  SELECT DISTINCT e.dst AS node FROM edges e JOIN n1 ON n1.node = e.src
  WHERE e.dst NOT IN (SELECT node FROM c1)),
c2 AS MATERIALIZED (
  SELECT node, hops FROM c1 UNION ALL SELECT node, 2::bigint FROM n2),
n3 AS MATERIALIZED (
  SELECT DISTINCT e.dst AS node FROM edges e JOIN n2 ON n2.node = e.src
  WHERE e.dst NOT IN (SELECT node FROM c2)),
c3 AS MATERIALIZED (
  SELECT node, hops FROM c2 UNION ALL SELECT node, 3::bigint FROM n3)
SELECT node, hops FROM c3 ORDER BY node
""",
        "link_clustering": f"""
WITH {_LINK_EDGES_CTE},
ce AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst),
deg AS (
  SELECT node, count(*)::bigint AS d
  FROM (SELECT a AS node FROM ce UNION ALL SELECT b FROM ce) GROUP BY node),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ce e1
  JOIN ce e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN ce e3 ON e3.a = e1.b AND e3.b = e2.b),
tcnt AS (
  SELECT node, count(*)::bigint AS t FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri) GROUP BY node)
SELECT deg.node, deg.d AS degree, coalesce(tcnt.t, 0)::bigint AS n_triangles,
       CASE WHEN deg.d >= 2
            THEN round((2.0 * coalesce(tcnt.t, 0)) / (deg.d * (deg.d - 1)), 6)
            ELSE 0.0 END AS clustering
FROM deg LEFT JOIN tcnt USING (node) ORDER BY deg.node
""",
        "search_corrected": f"""
WITH {_BM25_SCORES},
qw AS (SELECT unnest(['join', 'merje', 'spork']) AS w),
inv AS (SELECT w FROM qw WHERE EXISTS (SELECT 1 FROM df WHERE df.term = qw.w)),
miss AS (SELECT w FROM qw WHERE w NOT IN (SELECT w FROM inv)),
corr AS (
  SELECT term FROM (
    SELECT m.w, df.term,
           row_number() OVER (
             PARTITION BY m.w ORDER BY df.df DESC, df.term ASC) AS rn
    FROM miss m JOIN df ON levenshtein(m.w, df.term) <= 1) WHERE rn = 1),
q2 AS (SELECT w AS term FROM inv UNION SELECT term FROM corr),
scores2 AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl)) ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
  WHERE tf.term IN (SELECT term FROM q2)
  GROUP BY tf.doc_id)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores2 ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "search_prf": f"""
WITH {_BM25_SCORES},
r AS (SELECT doc_id FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10),
rtf AS (
  SELECT t.term, count(*)::bigint AS tf
  FROM tok t JOIN r USING (doc_id)
  WHERE t.term NOT IN (SELECT term FROM q)
  GROUP BY t.term),
expn AS (
  SELECT term FROM (
    SELECT rtf.term,
           row_number() OVER (
             ORDER BY round(rtf.tf * ln((SELECT n_docs FROM stats)::double
                                        / df.df), 6) DESC,
                      rtf.term ASC) AS rn
    FROM rtf JOIN df USING (term)) WHERE rn <= 3),
q2 AS (SELECT term FROM q UNION SELECT term FROM expn),
scores2 AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl)) ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
  WHERE tf.term IN (SELECT term FROM q2)
  GROUP BY tf.doc_id)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores2 ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "search_rrf": f"""
WITH {_pagerank_ctes(5, 0.85, _LINK_EDGES_CTE)},{_BM25_SCORES},
atok AS (SELECT dst AS doc_id, unnest(string_split(anchor, ' ')) AS term FROM edges),
adl AS (SELECT doc_id, count(*) AS doc_len FROM atok GROUP BY doc_id),
astats AS (
  SELECT (SELECT count(*) FROM adl) AS n_docs,
         (SELECT sum(doc_len) FROM adl)::double / (SELECT count(*) FROM adl) AS avgdl),
atf AS (SELECT doc_id, term, count(*) AS tf FROM atok GROUP BY doc_id, term),
adf AS (SELECT term, count(DISTINCT doc_id) AS df FROM atok GROUP BY term),
ascores AS (
  SELECT atf.doc_id,
         sum( ln((astats.n_docs - adf.df + 0.5)/(adf.df + 0.5) + 1.0)
              * atf.tf * 2.2
              / (atf.tf + 1.2 * (0.25 + 0.75 * adl.doc_len / astats.avgdl)) ) AS ascore
  FROM atf JOIN adf USING (term) JOIN adl USING (doc_id), astats
  WHERE atf.term IN (SELECT term FROM q)
  GROUP BY atf.doc_id),
br AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
       FROM scores ORDER BY score DESC, doc_id ASC LIMIT 20),
ar AS (SELECT doc_id, row_number() OVER (ORDER BY ascore DESC, doc_id ASC) AS rnk
       FROM ascores ORDER BY ascore DESC, doc_id ASC LIMIT 20),
prr AS (SELECT node AS doc_id,
               row_number() OVER (ORDER BY round(r, 6) DESC, node ASC) AS rnk
        FROM r5 ORDER BY round(r, 6) DESC, node ASC LIMIT 20),
fused AS (
  SELECT coalesce(br.doc_id, ar.doc_id, prr.doc_id) AS doc_id,
         coalesce(1.0 / (60 + br.rnk), 0.0)
           + coalesce(1.0 / (60 + ar.rnk), 0.0)
           + coalesce(1.0 / (60 + prr.rnk), 0.0) AS rrf
  FROM br
  FULL OUTER JOIN ar ON ar.doc_id = br.doc_id
  FULL OUTER JOIN prr ON prr.doc_id = coalesce(br.doc_id, ar.doc_id))
SELECT row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS rank,
       doc_id, round(rrf, 6) AS rrf_score
FROM fused ORDER BY rrf DESC, doc_id ASC LIMIT 10
""",
        "bm25_anchor_topk": f"""
WITH {_LINK_EDGES_CTE},{_BM25_SCORES},
atok AS (SELECT dst AS doc_id, unnest(string_split(anchor, ' ')) AS term FROM edges),
adl AS (SELECT doc_id, count(*) AS doc_len FROM atok GROUP BY doc_id),
astats AS (
  SELECT (SELECT count(*) FROM adl) AS n_docs,
         (SELECT sum(doc_len) FROM adl)::double / (SELECT count(*) FROM adl) AS avgdl),
atf AS (SELECT doc_id, term, count(*) AS tf FROM atok GROUP BY doc_id, term),
adf AS (SELECT term, count(DISTINCT doc_id) AS df FROM atok GROUP BY term),
ascores AS (
  SELECT atf.doc_id,
         sum( ln((astats.n_docs - adf.df + 0.5)/(adf.df + 0.5) + 1.0)
              * atf.tf * 2.2
              / (atf.tf + 1.2 * (0.25 + 0.75 * adl.doc_len / astats.avgdl)) ) AS ascore
  FROM atf JOIN adf USING (term) JOIN adl USING (doc_id), astats
  WHERE atf.term IN (SELECT term FROM q)
  GROUP BY atf.doc_id),
comb AS (
  SELECT coalesce(b.doc_id, a.doc_id) AS doc_id,
         coalesce(b.score, 0.0) + 0.5 * coalesce(a.ascore, 0.0) AS score
  FROM scores b FULL OUTER JOIN ascores a ON b.doc_id = a.doc_id)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM comb ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "bm25_pagerank_prior": f"""
WITH {_pagerank_ctes(5, 0.85, _LINK_EDGES_CTE)},{_BM25_SCORES},
pri AS (SELECT node AS doc_id,
               1.0 + (SELECT count(*) FROM nodes) * round(r, 6) AS prior
        FROM r5),
boosted AS (
  SELECT s.doc_id, s.score * coalesce(p.prior, 1.0) AS score
  FROM scores s LEFT JOIN pri p USING (doc_id))
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM boosted ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "search_facets": f"""
WITH tok AS ({_TOK}),
cand AS (SELECT DISTINCT doc_id FROM tok
         WHERE term IN (SELECT unnest(['join','merge','spark'])))
SELECT d.source AS facet, count(*)::bigint AS n_docs
FROM cand JOIN documents d USING (doc_id)
GROUP BY d.source ORDER BY n_docs DESC, facet LIMIT 10
""",
        "spell_suggest": f"""
WITH tok AS ({_TOK}),
v AS (SELECT term, count(DISTINCT doc_id)::bigint AS df FROM tok GROUP BY term),
w AS (SELECT unnest(['merje','spork']) AS word)
SELECT word, term, df FROM (
  SELECT w.word, v.term, v.df,
         row_number() OVER (PARTITION BY w.word ORDER BY v.df DESC, v.term) AS rn
  FROM w JOIN v ON levenshtein(w.word, v.term) <= 1)
WHERE rn <= 5 ORDER BY word, df DESC, term
""",
        "crawl_delta_stats": """
WITH oldp AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' legacy' ELSE text END AS content
  FROM documents WHERE doc_id % 11 <> 3),
newp AS (SELECT doc_id, text AS content FROM documents WHERE doc_id % 13 <> 5),
j AS (SELECT CASE WHEN o.doc_id IS NULL THEN 'added'
                  WHEN n.doc_id IS NULL THEN 'removed'
                  WHEN o.content <> n.content THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM oldp o FULL OUTER JOIN newp n ON o.doc_id = n.doc_id)
SELECT status, count(*)::bigint AS n_urls FROM j GROUP BY status ORDER BY status
""",
        "dedup_exact": """
SELECT min(doc_id)::bigint AS doc_id FROM documents GROUP BY text ORDER BY doc_id
""",
        "curate_web_corpus": f"""
WITH ln AS (
  SELECT doc_id, source,
         unnest(str_split(text, chr(10))) AS line,
         unnest(range(len(str_split(text, chr(10))))) AS ord
  FROM documents),
freq AS (
  SELECT source, line FROM ln GROUP BY source, line
  HAVING count(DISTINCT doc_id) >= 3),
kept1 AS (
  SELECT l.doc_id, l.line, l.ord
  FROM ln l LEFT JOIN freq f ON l.source = f.source AND l.line = f.line
  WHERE f.line IS NULL),
ren AS (
  SELECT doc_id, line,
         row_number() OVER (PARTITION BY doc_id ORDER BY ord) - 1 AS ord2
  FROM kept1),
ren_all AS (
  SELECT * FROM ren
  UNION ALL
  SELECT doc_id, '' AS line, 0 AS ord2 FROM documents
  WHERE doc_id NOT IN (SELECT doc_id FROM kept1)),
win AS (SELECT line, min(doc_id * 1048576 + ord2) AS r FROM ren_all GROUP BY line),
kept2 AS (
  SELECT n.doc_id, n.line, n.ord2 FROM ren_all n JOIN win w ON n.line = w.line
  WHERE n.doc_id * 1048576 + n.ord2 = w.r),
final AS (
  SELECT d.doc_id, coalesce(t.text, '') AS text
  FROM documents d LEFT JOIN (
    SELECT doc_id, string_agg(line, chr(10) ORDER BY ord2) AS text
    FROM kept2 GROUP BY doc_id) t USING (doc_id)),
tok AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> ''))::bigint AS n_tokens,
         text
  FROM final),
longdocs AS (SELECT * FROM tok WHERE n_tokens >= 10)
SELECT doc_id::bigint AS doc_id, n_tokens
FROM (SELECT *, min(doc_id) OVER (PARTITION BY text) AS keeper FROM longdocs)
WHERE doc_id = keeper ORDER BY doc_id
""",
        "remove_boilerplate": """
WITH ln AS (
  SELECT doc_id, source,
         unnest(str_split(text, chr(10))) AS line,
         unnest(range(len(str_split(text, chr(10))))) AS ord
  FROM documents),
freq AS (
  SELECT source, line FROM ln GROUP BY source, line
  HAVING count(DISTINCT doc_id) >= 3)
SELECT l.doc_id::bigint AS doc_id,
       coalesce(string_agg(CASE WHEN f.line IS NULL THEN l.line END,
                           chr(10) ORDER BY l.ord), '') AS text,
       count(f.line)::bigint AS n_removed
FROM ln l LEFT JOIN freq f ON l.source = f.source AND l.line = f.line
GROUP BY l.doc_id ORDER BY l.doc_id
""",
        "paragraph_dedup": """
WITH ln AS (
  SELECT doc_id,
         unnest(str_split(text, chr(10))) AS line,
         unnest(range(len(str_split(text, chr(10))))) AS ord
  FROM documents),
win AS (SELECT line, min(doc_id * 1048576 + ord) AS r FROM ln GROUP BY line)
SELECT l.doc_id::bigint AS doc_id,
       coalesce(string_agg(CASE WHEN l.doc_id * 1048576 + l.ord = w.r
                                THEN l.line END, chr(10) ORDER BY l.ord), '') AS text,
       count(CASE WHEN l.doc_id * 1048576 + l.ord <> w.r THEN 1 END)::bigint AS n_dropped
FROM ln l JOIN win w ON l.line = w.line
GROUP BY l.doc_id ORDER BY l.doc_id
""",
        "latest_event_per_user": """
SELECT user_id::bigint AS user_id, event_id::bigint AS event_id FROM (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1 ORDER BY user_id
""",
        "latest_version_per_source": """
SELECT source, doc_id, version FROM (
  SELECT d.source, d.doc_id,
         concat(d.doc_id % 4, '.', d.doc_id % 10,
                CASE WHEN d.doc_id % 3 = 0 THEN '~rc1' ELSE '' END) AS version,
         row_number() OVER (
           PARTITION BY d.source
           ORDER BY d.doc_id % 4 DESC, d.doc_id % 10 DESC,
                    CASE WHEN d.doc_id % 3 = 0 THEN 0 ELSE 1 END DESC,
                    d.doc_id DESC) AS rn
  FROM documents d) WHERE rn = 1 ORDER BY source
""",
        "tumbling_window_agg": """
SELECT user_id::bigint AS user_id,
       ((epoch_us(ts) // 3600000000) * 3600000000)::bigint AS window_start,
       count(*)::bigint AS n_events,
       round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
        "hopping_window_agg": """
SELECT user_id::bigint AS user_id, ws::bigint AS window_start,
       count(*)::bigint AS n_events, round(sum(value), 6) AS sum_value
FROM (
  SELECT user_id, value,
         unnest(generate_series(
            greatest((epoch_us(ts) // 1800000000) * 1800000000 - 1800000000, 0),
            (epoch_us(ts) // 1800000000) * 1800000000,
            1800000000)) AS ws
  FROM events)
GROUP BY 1, 2 ORDER BY 1, 2
""",
        "session_window_agg": """
WITH e AS (SELECT user_id, epoch_us(ts) AS t, value FROM events),
flag AS (
  SELECT user_id, t, value,
         CASE WHEN lag(t) OVER w IS NULL
              OR t - lag(t) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
sess AS (
  SELECT user_id, t, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY t
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flag)
SELECT user_id::bigint AS user_id, min(t)::bigint AS session_start,
       count(*)::bigint AS n_events, round(sum(value), 6) AS sum_value
FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start
""",
        "bm25_filtered": f"""
WITH {_BM25_SCORES}
SELECT row_number() OVER (ORDER BY s.score DESC, s.doc_id ASC) AS rank,
       s.doc_id, round(s.score, 6) AS score
FROM scores s JOIN documents d USING (doc_id)
WHERE d.source = 'src3'
ORDER BY s.score DESC, s.doc_id ASC LIMIT 10
""",
        "bm25_prior": f"""
WITH {_BM25_SCORES}
SELECT row_number() OVER (ORDER BY p.pscore DESC, p.doc_id ASC) AS rank,
       p.doc_id, round(p.pscore, 6) AS score
FROM (SELECT doc_id, score * (1.0 + (doc_id % 5) / 10.0) AS pscore FROM scores) p
ORDER BY p.pscore DESC, p.doc_id ASC LIMIT 10
""",
        "grep_literal": f"""
SELECT doc_id,
       ((length(text) - length(replace(text, '{LITERAL}', ''))) / {len(LITERAL)})::bigint AS n_matches
FROM documents WHERE contains(text, '{LITERAL}') ORDER BY doc_id
""",
        "trigram_candidates": f"""
SELECT doc_id::bigint AS doc_id FROM documents WHERE {tri_conds} ORDER BY doc_id
""",
        "positional_match_count": f"""
SELECT doc_id,
       ((length(text) - length(replace(text, '{LITERAL}', ''))) / {len(LITERAL)})::bigint AS n_matches
FROM documents WHERE contains(text, '{LITERAL}') ORDER BY doc_id
""",
        "proximity_search": """
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
FROM occ_a a JOIN occ_b b ON a.doc_id = b.doc_id AND abs(a.pos - b.pos) <= 40
GROUP BY a.doc_id ORDER BY doc_id
""",
        "regex_search": f"""
SELECT doc_id::bigint AS doc_id, count(*)::bigint AS n_lines FROM (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents
) WHERE regexp_matches(line, '{REGEX}') GROUP BY doc_id ORDER BY doc_id
""",
        "filter_ignored": """
SELECT doc_id, lang FROM documents
WHERE length(text) >= 50 AND length(text) <= 100000 AND lang NOT IN ('de')
ORDER BY doc_id
""",
        "lang_stats": """
SELECT lang, count(*)::bigint AS n_docs, round(avg(n_chars), 6) AS avg_chars
FROM documents GROUP BY lang ORDER BY lang
""",
        "lsh_bucket_assignment": _lsh_assignment_sql(),
        "ivf_list_assignment": _ivf_assignment_sql(8),
        "knn_cosine_lsh": _lsh_knn_sql(),
        "knn_cosine_ivf_hashmin": _ivf_knn_hashmin_sql(),
        "embedding_near_dup_lsh": _near_dup_lsh_sql(),
        "embedding_near_dup": """
WITH n AS (
  SELECT vec_id, list_transform(embedding, x -> x::double) AS e FROM embeddings
)
SELECT a.vec_id::bigint AS id_a, b.vec_id::bigint AS id_b,
       round(list_cosine_similarity(a.e, b.e), 6) AS cos_sim
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.e, b.e) >= 0.42
ORDER BY id_a, id_b
""",
        "langid": f"""
WITH tok AS ({_TOK}),
hits AS (
  SELECT t.doc_id, l.lang, count(*) AS score
  FROM tok t JOIN (VALUES {_langid_values()}) l(lang, word) ON t.term = l.word
  GROUP BY t.doc_id, l.lang),
best AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
  FROM hits)
SELECT d.doc_id,
       coalesce(CASE WHEN b.score > 0 THEN b.lang END, 'unknown') AS pred_lang,
       coalesce(b.score, 0)::bigint AS lang_score
FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
ORDER BY doc_id
""",
        "doc_fingerprints": f"""
WITH fp AS (
  SELECT doc_id,
         list_reduce(
           list_prepend(14695981039346656037::hugeint,
             list_transform(toks, t -> {_FNV_TOK.format(t='t')})),
           (h, th) -> (h * 1099511628211 + th) % {_M64}
         ) AS v
  FROM ({_TOKS_LIST})
)
SELECT doc_id,
       (CASE WHEN v >= 9223372036854775808 THEN v - {_M64} ELSE v END)::bigint
         AS fingerprint
FROM fp ORDER BY doc_id
""",
        "minhash_pairs": _minhash_pairs_sql(),
        "jaccard_verified_pairs": _jaccard_verified_sql(),
        "fuzzy_dedup_keep": _fuzzy_dedup_sql(),
        "connected_components": _connected_components_sql(),
        "dup_cluster_sizes": _connected_components_sql(
            tail="""SELECT sz AS cluster_size, count(*)::bigint AS n_clusters
FROM (SELECT component, count(*)::bigint AS sz FROM labels GROUP BY component)
GROUP BY sz ORDER BY sz"""
        ),
        "distinctive_terms_by_lang": f"""
WITH tok AS ({_TOK}),
tc AS MATERIALIZED (
  SELECT d.lang, t.term, count(*)::bigint AS c
  FROM tok t JOIN documents d USING (doc_id) GROUP BY 1, 2),
vocab AS (SELECT DISTINCT term FROM tok),
langs AS (SELECT DISTINCT lang FROM documents),
ctot AS (SELECT lang, sum(c)::double AS tot FROM tc GROUP BY lang),
ag AS (SELECT term, sum(c)::bigint AS call FROM tc GROUP BY term),
tota AS (SELECT sum(c)::double AS t FROM tc),
v AS (SELECT count(*)::double AS v FROM vocab),
s AS (
  SELECT l.lang, vb.term,
         ln((coalesce(tc.c, 0) + 1.0) / (ct.tot + (SELECT v FROM v)))
           - ln((ag.call + 1.0) / ((SELECT t FROM tota) + (SELECT v FROM v))) AS sc
  FROM langs l CROSS JOIN vocab vb
  LEFT JOIN tc ON tc.lang = l.lang AND tc.term = vb.term
  JOIN ctot ct ON ct.lang = l.lang
  JOIN ag ON ag.term = vb.term)
SELECT lang AS label, term, round(sc, 6) AS keyness
FROM (
  SELECT lang, term, sc,
         row_number() OVER (
           PARTITION BY lang ORDER BY round(sc, 6) DESC, term ASC) AS rn
  FROM s) WHERE rn <= 5
ORDER BY label, keyness DESC, term
""",
        "pricing_summary": """
WITH f AS (
  SELECT l_returnflag, l_linestatus,
         round(l_quantity * 100)::bigint AS q,
         round(l_extendedprice * 100)::bigint AS p,
         round(l_discount * 100)::bigint AS d,
         round(l_tax * 100)::bigint AS t
  FROM lineitem WHERE l_shipdate <= DATE '1998-09-02')
SELECT l_returnflag, l_linestatus,
       sum(q)::double / 100.0 AS sum_qty,
       sum(p)::double / 100.0 AS sum_base_price,
       sum(p * (100 - d))::double / 10000.0 AS sum_disc_price,
       sum(p * (100 - d) * (100 + t))::double / 1000000.0 AS sum_charge,
       round(sum(q)::double / (100.0 * count(*)), 6) AS avg_qty,
       round(sum(p)::double / (100.0 * count(*)), 6) AS avg_price,
       round(sum(d)::double / (100.0 * count(*)), 6) AS avg_disc,
       count(*)::bigint AS count_order
FROM f GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
        "order_totals_by_nation": """
SELECT n_name, count(*)::bigint AS n_orders,
       sum(round(o_totalprice * 100)::bigint)::double / 100.0 AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
""",
        "customer_returns": """
WITH j AS (
  SELECT o_custkey,
         round(l_extendedprice * 100)::bigint
           * (100 - round(l_discount * 100)::bigint) AS rev1e4
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1996-04-01'),
pc AS (SELECT o_custkey, sum(rev1e4) AS r FROM j GROUP BY o_custkey)
SELECT c.c_custkey, c.c_name, pc.r::double / 10000.0 AS revenue,
       c.c_acctbal, n.n_name
FROM pc
JOIN customer c ON c.c_custkey = pc.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
ORDER BY pc.r DESC, c.c_custkey ASC LIMIT 20
""",
        "promo_revenue": """
WITH j AS (
  SELECT p.p_type,
         round(l_extendedprice * 100)::bigint
           * (100 - round(l_discount * 100)::bigint) AS rev1e4
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-02-01'),
s AS (
  SELECT sum(CASE WHEN p_type = 'PROMO' THEN rev1e4 ELSE 0 END)::bigint AS pr,
         sum(rev1e4)::bigint AS tot
  FROM j)
SELECT pr AS promo_rev1e4, tot AS total_rev1e4,
       round(CASE WHEN tot > 0 THEN (100.0 * pr) / tot ELSE 0.0 END, 6)
         AS promo_pct
FROM s
""",
        "large_orders": """
WITH q AS (
  SELECT l_orderkey, sum(round(l_quantity * 100)::bigint) AS q1e2
  FROM lineitem GROUP BY l_orderkey HAVING q1e2 > 10000)
SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_totalprice,
       q.q1e2::double / 100.0 AS total_qty
FROM orders o JOIN q ON q.l_orderkey = o.o_orderkey
ORDER BY round(o.o_totalprice * 100)::bigint DESC, o.o_orderkey ASC LIMIT 20
""",
        "local_supplier_volume": """
WITH j AS (
  SELECT n_name,
         round(l_extendedprice * 100)::bigint
           * (100 - round(l_discount * 100)::bigint) AS rev1e4
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r_name = 'ASIA' AND s.s_nationkey = c.c_nationkey
    AND o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01')
SELECT n_name, sum(rev1e4)::double / 10000.0 AS revenue
FROM j GROUP BY n_name ORDER BY revenue DESC, n_name
""",
        "shipping_priority": """
WITH j AS (
  SELECT l_orderkey, o_orderdate, o_orderpriority,
         round(l_extendedprice * 100)::bigint
           * (100 - round(l_discount * 100)::bigint) AS rev1e4
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1995-03-15'
    AND l_shipdate > TIMESTAMP '1995-03-15')
SELECT l_orderkey, sum(rev1e4)::double / 10000.0 AS revenue,
       o_orderdate, o_orderpriority
FROM j GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
""",
        "forecast_revenue": """
WITH f AS (
  SELECT round(l_extendedprice * 100)::bigint
           * round(l_discount * 100)::bigint AS d1e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
    AND round(l_discount * 100) BETWEEN 5 AND 7
    AND round(l_quantity * 100) < 2400)
SELECT coalesce(sum(d1e4), 0)::bigint AS disc_rev1e4,
       round(coalesce(sum(d1e4), 0) / 10000.0, 6) AS revenue
FROM f
""",
        "order_priority_counts": """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-04-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
        "customer_order_histogram": """
WITH pc AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey)
SELECT c_count, count(*) AS custdist
FROM pc GROUP BY c_count ORDER BY custdist DESC, c_count DESC
""",
        "top_supplier": """
WITH r AS (
  SELECT l_suppkey,
         sum(round(l_extendedprice * 100)::bigint
               * (100 - round(l_discount * 100)::bigint)) AS rev1e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, round(r.rev1e4 / 10000.0, 6) AS total_revenue
FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.rev1e4 = (SELECT max(rev1e4) FROM r)
ORDER BY s.s_suppkey
""",
        "small_quantity_revenue": """
WITH pp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'),
li AS (
  SELECT l_partkey,
         round(l_quantity * 100)::bigint AS q1e2,
         round(l_extendedprice * 100)::bigint AS p1e2
  FROM lineitem JOIN pp ON pp.p_partkey = lineitem.l_partkey),
st AS (SELECT l_partkey, sum(q1e2) AS sq, count(*) AS cnt FROM li GROUP BY 1)
SELECT coalesce(sum(p1e2), 0)::bigint AS sum_p1e2,
       round(coalesce(sum(p1e2), 0) / 700.0, 6) AS avg_yearly
FROM li JOIN st USING (l_partkey)
WHERE 5 * q1e2 * cnt < sq
""",
        "disjunctive_revenue": """
WITH j AS (
  SELECT round(l_extendedprice * 100)::bigint
           * (100 - round(l_discount * 100)::bigint) AS rev1e4
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         AND round(l_quantity * 100) BETWEEN 100 AND 1100)
     OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
         AND round(l_quantity * 100) BETWEEN 1000 AND 2000)
     OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
         AND round(l_quantity * 100) BETWEEN 2000 AND 3000))
SELECT coalesce(sum(rev1e4), 0)::bigint AS rev1e4,
       round(coalesce(sum(rev1e4), 0) / 10000.0, 6) AS revenue
FROM j
""",
        "host_cap_sample": """
WITH rk AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents)
SELECT doc_id, source, n_chars FROM rk WHERE rn <= 3 ORDER BY doc_id
""",
        "volume_shipping": """
WITH j AS (
  SELECT CASE WHEN s.s_nationkey < 12 THEN 'WEST' ELSE 'EAST' END AS supp_bloc,
         EXTRACT(year FROM l_shipdate)::bigint AS l_year,
         round(l_extendedprice * 100)::bigint
           * (100 - round(l_discount * 100)::bigint) AS rev1e4
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
    AND ((s.s_nationkey < 12) <> (c.c_nationkey < 12)))
SELECT supp_bloc, l_year, round(sum(rev1e4) / 10000.0, 6) AS revenue
FROM j GROUP BY 1, 2 ORDER BY 1, 2
""",
        "market_share": """
WITH j AS (
  SELECT EXTRACT(year FROM o_orderdate)::bigint AS o_year,
         round(l_extendedprice * 100)::bigint
           * (100 - round(l_discount * 100)::bigint) AS rev1e4,
         CASE WHEN ns.n_name = 'NATION_1' THEN 1 ELSE 0 END AS is_nat
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation nc ON c.c_nationkey = nc.n_nationkey
  JOIN region r ON nc.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation ns ON s.s_nationkey = ns.n_nationkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'),
a AS (
  SELECT o_year, sum(is_nat * rev1e4)::bigint AS nat_rev1e4,
         sum(rev1e4)::bigint AS total_rev1e4
  FROM j GROUP BY o_year)
SELECT o_year, nat_rev1e4, total_rev1e4,
       CASE WHEN total_rev1e4 > 0
            THEN round(nat_rev1e4 / total_rev1e4::double, 6) ELSE 0.0 END
         AS mkt_share
FROM a ORDER BY o_year
""",
        "daily_distinct_users": """
SELECT CAST(ts AS DATE) AS day, count(DISTINCT user_id)::bigint AS n_users
FROM events GROUP BY 1 ORDER BY 1
""",
        "nb_prf_metrics": f"""
WITH {{NB}}
conf AS (
  SELECT d.lang AS t, p.lang AS pr, count(*)::bigint AS n
  FROM (SELECT doc_id, lang FROM pred WHERE rn = 1) p
  JOIN documents d USING (doc_id) GROUP BY 1, 2),
klass AS (SELECT DISTINCT lang FROM documents),
st AS (
  SELECT c.lang,
         coalesce((SELECT sum(n) FROM conf WHERE t = c.lang AND pr = c.lang), 0)
           ::bigint AS tp,
         coalesce((SELECT sum(n) FROM conf WHERE t = c.lang), 0)::bigint AS n_true,
         coalesce((SELECT sum(n) FROM conf WHERE pr = c.lang), 0)::bigint AS n_pred
  FROM klass c),
pr_ AS (
  SELECT lang, tp, n_true, n_pred,
         CASE WHEN n_pred > 0 THEN tp / n_pred::double ELSE 0.0 END AS p,
         CASE WHEN n_true > 0 THEN tp / n_true::double ELSE 0.0 END AS r
  FROM st)
SELECT lang, tp, n_true, n_pred,
       round(p, 6) AS prec, round(r, 6) AS rec,
       round(CASE WHEN p + r > 0 THEN 2.0 * p * r / (p + r) ELSE 0.0 END, 6) AS f1
FROM pr_ ORDER BY lang
""".replace("{NB}", _NB_PRED_CTES + ","),
        "kmv_distinct_users": _kmv_sql(k=8),
        "degree_assortativity": f"""
WITH {_LINK_EDGES_CTE},
ce AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       FROM edges WHERE src <> dst),
und AS (SELECT u AS a, v AS b FROM ce UNION ALL SELECT v, u FROM ce),
dg AS (SELECT a AS node, count(*)::bigint AS d FROM und GROUP BY a),
xy AS (SELECT da.d AS x, db.d AS y
       FROM und JOIN dg da ON und.a = da.node JOIN dg db ON und.b = db.node),
m AS (SELECT count(*)::bigint AS n, sum(x)::bigint AS sx, sum(y)::bigint AS sy,
             sum(x * y)::bigint AS sxy, sum(x * x)::bigint AS sxx,
             sum(y * y)::bigint AS syy
      FROM xy)
SELECT n AS n_edges,
       CASE WHEN ((n::double * sxx::double) - (sx::double * sx::double)) > 0
             AND ((n::double * syy::double) - (sy::double * sy::double)) > 0
            THEN round(((n::double * sxy::double) - (sx::double * sy::double))
                   / (sqrt((n::double * sxx::double) - (sx::double * sx::double))
                      * sqrt((n::double * syy::double) - (sy::double * sy::double))), 6)
            ELSE 0.0 END AS assortativity
FROM m
""",
        "link_kcore": _kcore_sql(k=4, rounds=4),
        "mmr_diversified": _mmr_sql(n_cand=20, k_sel=5),
        "intra_host_link_ratio": f"""
WITH {_LINK_EDGES_CTE},
m AS (
  SELECT ds.source AS src_host,
         CASE WHEN ds.source = dd.source THEN 1 ELSE 0 END AS intra
  FROM edges e
  JOIN documents ds ON ds.doc_id = e.src
  JOIN documents dd ON dd.doc_id = e.dst)
SELECT src_host, count(*)::bigint AS n_links, sum(intra)::bigint AS n_intra,
       round(sum(intra) / count(*)::double, 6) AS intra_ratio
FROM m GROUP BY src_host ORDER BY src_host
""",
        "type_token_ratio": f"""
SELECT doc_id, count(*)::bigint AS n_tokens,
       count(DISTINCT term)::bigint AS n_types,
       round(count(DISTINCT term) / count(*)::double, 6) AS ttr
FROM ({_TOK}) GROUP BY doc_id ORDER BY doc_id
""",
        "event_burstiness": """
WITH c AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*)::bigint AS n
  FROM events GROUP BY 1, 2),
m AS (
  SELECT event_type, count(*)::bigint AS n_days, sum(n)::bigint AS sx,
         sum(n * n)::bigint AS sxx
  FROM c GROUP BY event_type)
SELECT event_type, n_days, sx AS sum_n,
       round((sxx::double / n_days - (sx::double / n_days) * (sx::double / n_days))
               / (sx::double / n_days), 6) AS vmr
FROM m ORDER BY event_type
""",
        "weekly_active_users": """
WITH p AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM p),
w AS (SELECT d.day, p.user_id
      FROM days d JOIN p ON p.day BETWEEN d.day - 6 AND d.day),
wau AS (SELECT day, count(DISTINCT user_id)::bigint AS wau FROM w GROUP BY day),
dau AS (SELECT day, count(DISTINCT user_id)::bigint AS dau FROM p GROUP BY day)
SELECT day, dau, wau, round(dau / wau::double, 6) AS stickiness
FROM dau JOIN wau USING (day) ORDER BY day
""",
        "product_profit_by_nation": """
WITH j AS (
  SELECT n.n_name AS nation,
         EXTRACT(year FROM l_shipdate)::bigint AS o_year,
         round(l_extendedprice * 100)::bigint
           * (100 - round(l_discount * 100)::bigint) AS rev1e4
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey)
SELECT nation, o_year, round(sum(rev1e4) / 10000.0, 6) AS sum_profit
FROM j GROUP BY 1, 2 ORDER BY nation, o_year DESC
""",
        "zipf_slope": f"""
WITH tok AS ({_TOK}),
tc AS (SELECT term, count(*)::bigint AS c FROM tok GROUP BY term),
rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, term) AS r FROM tc),
top AS (SELECT ln(r::double) AS x, ln(c::double) AS y FROM rk WHERE r <= 500),
s AS (SELECT count(*)::bigint AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx FROM top),
fit AS (SELECT n, (sxy - sx * sy / n) / (sxx - sx * sx / n) AS slope, sx, sy FROM s)
SELECT n AS n_terms, round(slope, 6) AS slope,
       round((sy - slope * sx) / n, 6) AS intercept
FROM fit
""",
        "anova_length_by_lang": """
WITH g AS (
  SELECT lang, count(*)::bigint AS n, sum(n_chars)::bigint AS s,
         sum(n_chars * n_chars)::bigint AS ss
  FROM documents GROUP BY lang),
t AS (SELECT count(*)::bigint AS k, sum(n)::bigint AS big_n,
             sum(s)::double AS big_s, sum(ss)::double AS big_ss,
             sum(ss::double - s::double * s / n) AS ssw
      FROM g),
f AS (SELECT k, big_n, big_ss - big_s * big_s / big_n AS sst, ssw FROM t)
SELECT k AS k_groups, big_n AS n_rows,
       round(((sst - ssw) / (k - 1)) / (ssw / (big_n - k)), 6) AS f_stat,
       round((sst - ssw) / sst, 6) AS eta_sq
FROM f
""",
        "event_trigrams": """
WITH s AS (
  SELECT user_id, event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
g AS (SELECT e1, e2, e3, count(*)::bigint AS cnt
      FROM s WHERE e3 IS NOT NULL GROUP BY 1, 2, 3)
SELECT e1, e2, e3, cnt FROM g
ORDER BY cnt DESC, e1, e2, e3 LIMIT 20
""",
        "winnow_fingerprints": f"""
WITH tl AS ({_TOKS_LIST}),
lb AS (SELECT doc_id, toks, len(toks) AS n FROM tl WHERE len(toks) >= 3),
tp AS (SELECT doc_id, unnest(range(1, n + 1)) AS i, toks FROM lb),
-- NB: toks[i] must be materialized BEFORE the FNV macro — its lambda
-- variable is also named i and would shadow the position column
tt AS (SELECT doc_id, i, toks[i] AS tok FROM tp),
th AS (SELECT doc_id, i, {_FNV_TOK.format(t='tok')} AS h FROM tt),
g1 AS (SELECT doc_id, i,
         (14695981039346656037::hugeint * 1099511628211 % {_M64} + h) % {_M64} AS s1,
         lead(h, 1) OVER win AS h2, lead(h, 2) OVER win AS h3
       FROM th WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
g AS (SELECT doc_id, i,
        ((s1 * 1099511628211 % {_M64} + h2) % {_M64}
           * 1099511628211 % {_M64} + h3) % {_M64} AS gh
      FROM g1 WHERE h3 IS NOT NULL),
wm AS (SELECT doc_id,
         min(gh) OVER fr AS fp, count(*) OVER fr AS cw
       FROM g
       WINDOW fr AS (PARTITION BY doc_id ORDER BY i
                     ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)),
sel AS (SELECT DISTINCT doc_id, fp FROM wm WHERE cw = 4),
per AS (SELECT doc_id, count(*)::bigint AS n_fp,
               bit_xor((CASE WHEN fp >= 9223372036854775808 THEN fp - {_M64}
                             ELSE fp END)::bigint) AS fp_xor
        FROM sel GROUP BY doc_id)
SELECT d.doc_id::bigint AS doc_id,
       coalesce(p.n_fp, 0)::bigint AS n_fp,
       coalesce(p.fp_xor, 0)::bigint AS fp_xor
FROM documents d LEFT JOIN per p USING (doc_id)
ORDER BY doc_id
""",
        "adamic_adar_topk": f"""
WITH {_LINK_EDGES_CTE},
ed AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges),
deg AS (SELECT src, count(*)::bigint AS d FROM ed GROUP BY src),
aa AS (SELECT e1.dst AS id_a, e2.dst AS id_b,
              sum(1.0 / ln(deg.d::double)) AS score
       FROM ed e1 JOIN ed e2 ON e1.src = e2.src AND e1.dst < e2.dst
       JOIN deg ON deg.src = e1.src
       GROUP BY 1, 2)
SELECT id_a, id_b, round(score, 6) AS aa_score FROM aa
ORDER BY round(score, 6) DESC, id_a, id_b LIMIT 20
""",
        "tfidf_cosine_topk": f"""
WITH tok AS ({_TOK}),
tf AS (SELECT doc_id, term, count(*)::bigint AS tf FROM tok GROUP BY 1, 2),
wd AS (SELECT doc_id, term, 1.0 + ln(tf::double) AS w FROM tf),
nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS norm_d FROM wd GROUP BY doc_id),
nd AS (SELECT count(*)::double AS n FROM documents),
q AS (SELECT unnest(['join', 'merge', 'spark']) AS term),
df AS (SELECT term, count(DISTINCT doc_id)::double AS df
       FROM tok WHERE term IN (SELECT term FROM q) GROUP BY term),
qw AS (SELECT term, ln((SELECT n FROM nd) / df) AS w FROM df),
qn AS (SELECT sqrt(sum(w * w)) AS norm_q FROM qw),
s AS (SELECT wd.doc_id, sum(wd.w * qw.w) AS num
      FROM wd JOIN qw USING (term) GROUP BY wd.doc_id),
sc AS (SELECT s.doc_id,
              round(num / (nrm.norm_d * (SELECT norm_q FROM qn)), 6) AS score
       FROM s JOIN nrm ON nrm.doc_id = s.doc_id WHERE num > 0)
SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 10
""",
        "qljm_topk": f"""
WITH tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
coll AS (SELECT sum(doc_len)::double AS ct FROM dl),
q AS (SELECT unnest(['join', 'merge', 'spark']) AS term),
cf AS (SELECT term, count(*)::double AS cf FROM tok
       WHERE term IN (SELECT term FROM q) GROUP BY term),
konst AS (SELECT sum(ln(0.3 * (cf.cf / coll.ct))) AS c0 FROM cf, coll),
tf AS (SELECT doc_id, term, count(*)::double AS tf FROM tok
       WHERE term IN (SELECT term FROM q) GROUP BY 1, 2),
sp AS (SELECT tf.doc_id,
              sum(ln(1.0 + (1.0 - 0.3) * tf.tf
                     / (0.3 * (cf.cf / coll.ct) * dl.doc_len))) AS sp
       FROM tf JOIN cf USING (term) JOIN dl USING (doc_id), coll
       GROUP BY tf.doc_id),
scores AS (SELECT doc_id, sp + (SELECT c0 FROM konst) AS score FROM sp)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "recrawl_priority": """
WITH pu0 AS (SELECT doc_id, xor(doc_id::ubigint, 12::ubigint)::hugeint AS x0 FROM documents),
pu1 AS (SELECT doc_id, ((((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) % 4294967296) + ((((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) // 4294967296)   + ((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) // 4294967296) * ((13787848793156543929::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS x1 FROM pu0),
pu2 AS (SELECT doc_id, ((((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) % 4294967296) + ((((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) // 4294967296)   + ((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) // 4294967296) * ((10723151780598845931::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS x2 FROM pu1),
pu AS (SELECT doc_id, 5 + (xor(x2::ubigint, x2::ubigint >> 31)::hugeint % 90)::bigint AS p FROM pu2),
vis AS (SELECT doc_id, unnest(range(1, 9)) AS i FROM documents),
v0 AS (SELECT doc_id, i, xor((doc_id * 16 + i)::ubigint, 11::ubigint)::hugeint AS x0 FROM vis),
v1 AS (SELECT doc_id, i, ((((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) % 4294967296) + ((((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) // 4294967296)   + ((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) // 4294967296) * ((13787848793156543929::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS x1 FROM v0),
v2 AS (SELECT doc_id, i, ((((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) % 4294967296) + ((((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) // 4294967296)   + ((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) // 4294967296) * ((10723151780598845931::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS x2 FROM v1),
vh AS (SELECT doc_id, i, xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM v2),
agg AS (SELECT v.doc_id,
               sum(CASE WHEN (v.h % 100) < p.p THEN 1 ELSE 0 END)::bigint AS x
        FROM vh v JOIN pu p USING (doc_id) GROUP BY v.doc_id)
SELECT row_number() OVER (ORDER BY x DESC, doc_id ASC)::bigint AS rank,
       doc_id, x AS n_changes,
       round(-ln((8 - x + 0.5) / (8 + 0.5)), 6) + 0.0 AS lambda_hat
FROM agg ORDER BY x DESC, doc_id ASC LIMIT 50
""",
        "template_ngrams": """
WITH injected AS (
  SELECT doc_id, source,
         'tplheader ' || source || ' nav home about contact privacy end ' || text AS text
  FROM documents),
toks AS (SELECT doc_id, source,
                list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                            x -> x <> '') AS ts
         FROM injected),
tpos AS (SELECT doc_id, source, unnest(ts) AS term,
                unnest(range(1, len(ts) + 1)) AS pos
         FROM toks),
g AS (SELECT a.doc_id, a.source,
             a.term || ' ' || b.term || ' ' || c.term || ' ' || d.term || ' ' || e.term AS gram
      FROM tpos a
      JOIN tpos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      JOIN tpos c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
      JOIN tpos d ON a.doc_id = d.doc_id AND d.pos = a.pos + 3
      JOIN tpos e ON a.doc_id = e.doc_id AND e.pos = a.pos + 4),
dg AS (SELECT DISTINCT source, gram, doc_id FROM g),
cnt AS (SELECT source, gram, count(*)::bigint AS n_docs FROM dg GROUP BY source, gram),
tot AS (SELECT source, count(*)::bigint AS t FROM documents GROUP BY source)
SELECT c.source, c.gram, c.n_docs,
       round(c.n_docs::double / t.t, 6) + 0.0 AS frac
FROM cnt c JOIN tot t USING (source)
WHERE c.n_docs * 5 >= 3 * t.t
ORDER BY source, gram
""",
        "bm25f_topk": f"""
WITH {_LINK_EDGES_CTE},
tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
st AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
              (SELECT sum(doc_len) FROM dl)::double
                / (SELECT count(*) FROM documents) AS avgdl),
q AS (SELECT unnest(['join', 'merge', 'spark']) AS term),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
       WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
btfn AS (SELECT tf.doc_id, tf.term,
                tf.tf / (1.0 + 0.75 * (dl.doc_len / st.avgdl - 1.0)) AS tfn
         FROM tf JOIN dl USING (doc_id), st),
atok AS (SELECT dst AS doc_id, unnest(string_split(anchor, ' ')) AS term FROM edges),
adl AS (SELECT doc_id, count(*) AS doc_len FROM atok GROUP BY doc_id),
astats AS (SELECT (SELECT sum(doc_len) FROM adl)::double
                    / (SELECT count(*) FROM adl) AS avgdl),
atf AS (SELECT doc_id, term, count(*) AS tf FROM atok
        WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term),
atfn AS (SELECT atf.doc_id, atf.term,
                atf.tf / (1.0 + 0.75 * (adl.doc_len / astats.avgdl - 1.0)) AS tfn
         FROM atf JOIN adl USING (doc_id), astats),
comb AS (SELECT coalesce(b.doc_id, a.doc_id) AS doc_id,
                coalesce(b.term, a.term) AS term,
                coalesce(b.tfn, 0.0) + 2.0 * coalesce(a.tfn, 0.0) AS c
         FROM btfn b FULL OUTER JOIN atfn a
           ON b.doc_id = a.doc_id AND b.term = a.term),
ts AS (SELECT c.doc_id,
              ln(((SELECT n_docs FROM st) - coalesce(df.df, 0) + 0.5)
                 / (coalesce(df.df, 0) + 0.5) + 1.0)
              * c.c * 2.2 / (c.c + 1.2) AS s
       FROM comb c LEFT JOIN df ON c.term = df.term),
scores AS (SELECT doc_id, sum(s) AS score FROM ts GROUP BY doc_id)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "cascade_click_model": f"""
WITH {_BM25_SCORES},
ranked AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id
  FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10),
imp AS (
  SELECT s, pos,
         (SELECT doc_id FROM ranked r WHERE r.rank = pos) AS doc_id
  FROM (SELECT unnest(range(400)) AS s), (SELECT unnest(range(1, 11)) AS pos)),
c0 AS (SELECT *, xor((s*16+pos)::ubigint, 10::ubigint)::hugeint AS a0,
               xor(doc_id::ubigint, 11::ubigint)::hugeint AS d0 FROM imp),
c1 AS (SELECT *, ((((xor(a0::ubigint, a0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) % 4294967296) + ((((xor(a0::ubigint, a0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) // 4294967296)   + ((xor(a0::ubigint, a0::ubigint >> 30)::hugeint) // 4294967296) * ((13787848793156543929::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS a1,
               ((((xor(d0::ubigint, d0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) % 4294967296) + ((((xor(d0::ubigint, d0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) // 4294967296)   + ((xor(d0::ubigint, d0::ubigint >> 30)::hugeint) // 4294967296) * ((13787848793156543929::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS d1 FROM c0),
c2 AS (SELECT *, ((((xor(a1::ubigint, a1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) % 4294967296) + ((((xor(a1::ubigint, a1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) // 4294967296)   + ((xor(a1::ubigint, a1::ubigint >> 27)::hugeint) // 4294967296) * ((10723151780598845931::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS a2,
               ((((xor(d1::ubigint, d1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) % 4294967296) + ((((xor(d1::ubigint, d1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) // 4294967296)   + ((xor(d1::ubigint, d1::ubigint >> 27)::hugeint) // 4294967296) * ((10723151780598845931::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS d2 FROM c1),
att AS MATERIALIZED (
  SELECT s, pos, doc_id,
         CASE WHEN (xor(a2::ubigint, a2::ubigint >> 31)::hugeint % 16)
                   < (3 + (xor(d2::ubigint, d2::ubigint >> 31)::hugeint % 10))
              THEN 1 ELSE 0 END AS att
  FROM c2),
firstp AS (SELECT s, coalesce(min(pos) FILTER (WHERE att = 1), 11) AS fp
           FROM att GROUP BY s),
clog AS (
  SELECT a.doc_id,
         CASE WHEN a.pos <= least(f.fp, 10) THEN 1 ELSE 0 END AS examined,
         CASE WHEN a.att = 1 AND a.pos = f.fp THEN 1 ELSE 0 END AS click
  FROM att a JOIN firstp f USING (s)),
agg AS (SELECT doc_id, sum(click)::bigint AS n_clicks,
               sum(examined)::bigint AS n_examined
        FROM clog GROUP BY doc_id)
SELECT doc_id, n_clicks, n_examined,
       CASE WHEN n_examined > 0
            THEN round(n_clicks::double / n_examined, 6) + 0.0
            ELSE 0.0 END AS a_hat
FROM agg ORDER BY doc_id
""",
        "pairwise_ltr": _ltr_sql(n_iter=8, lr=0.1),
        "tfidf_cosine_index": f"""
WITH tok AS ({_TOK}),
st AS (SELECT (SELECT count(*) FROM documents)::double AS n),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
idf AS (SELECT term, ln((SELECT n FROM st) / df) AS idf FROM df),
tfv AS (SELECT doc_id, term, count(*)::double AS tf FROM tok GROUP BY doc_id, term),
norms AS (SELECT t.doc_id,
                 round(sqrt(sum((t.tf * i.idf) * (t.tf * i.idf))), 6) + 0.0 AS norm
          FROM tfv t JOIN idf i USING (term) GROUP BY t.doc_id),
q AS (SELECT unnest(['join', 'merge', 'spark']) AS term),
qn AS (SELECT sqrt(sum(idf * idf)) AS v FROM idf
       WHERE term IN (SELECT term FROM q)),
sp AS (SELECT t.doc_id, sum(t.tf * i.idf * i.idf) AS s
       FROM tfv t JOIN idf i USING (term)
       WHERE t.term IN (SELECT term FROM q) GROUP BY t.doc_id),
scores AS (SELECT sp.doc_id, sp.s / ((SELECT v FROM qn) * n.norm) AS score
           FROM sp JOIN norms n USING (doc_id) WHERE n.norm > 0)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) + 0.0 AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "query_selectivity": _selectivity_sql(),
        "dust_rules": r"""
WITH raws AS (
  SELECT 'http://' || source || '.site/p' || doc_id AS url, text FROM documents
  UNION ALL
  SELECT 'http://' || source || '.site/p' || doc_id || '?sid=a' || (doc_id % 13), text
  FROM documents
  UNION ALL
  SELECT 'http://' || source || '.site/p' || doc_id || '?ref=r' || (doc_id % 3), text
  FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT 'http://' || source || '.site/list?page=' || (doc_id % 4),
         'listing ' || source || ' ' || doc_id
  FROM documents),
keys AS (SELECT unnest(['page', 'ref', 'sid']) AS pkey),
stripped AS (
  SELECT k.pkey, r.url AS raw, r.text,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           r.url, '(?:([?&])' || k.pkey || '=[^&]*)', '\1'),
           '[?&]+$', ''), '\?&', '?'), '&&', '&') AS bucket
  FROM raws r, keys k),
rows2 AS (
  SELECT pkey, bucket, raw, text FROM stripped WHERE bucket <> raw
  UNION ALL
  SELECT k.pkey, r.url, r.url, r.text FROM raws r, keys k),
per AS (SELECT pkey, bucket, count(DISTINCT raw) AS nraw,
               count(DISTINCT text) AS nh
        FROM rows2 GROUP BY pkey, bucket),
agg AS (SELECT pkey,
               sum(CASE WHEN nraw >= 2 AND nh = 1 THEN 1 ELSE 0 END)::bigint AS support,
               sum(CASE WHEN nraw >= 2 AND nh > 1 THEN 1 ELSE 0 END)::bigint AS violations
        FROM per GROUP BY pkey)
SELECT pkey AS param_key, support, violations,
       (support >= 2 AND violations = 0) AS valid
FROM agg ORDER BY param_key
""",
        "crawl_budget": """
WITH pu0 AS (SELECT doc_id, source, xor(doc_id::ubigint, 12::ubigint)::hugeint AS x0 FROM documents),
pu1 AS (SELECT doc_id, source, ((((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) % 4294967296) + ((((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) // 4294967296)   + ((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) // 4294967296) * ((13787848793156543929::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS x1 FROM pu0),
pu2 AS (SELECT doc_id, source, ((((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) % 4294967296) + ((((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) // 4294967296)   + ((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) // 4294967296) * ((10723151780598845931::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS x2 FROM pu1),
pu AS (SELECT doc_id, source, 5 + (xor(x2::ubigint, x2::ubigint >> 31)::hugeint % 90)::bigint AS p FROM pu2),
vis AS (SELECT doc_id, unnest(range(1, 9)) AS i FROM documents),
v0 AS (SELECT doc_id, i, xor((doc_id * 16 + i)::ubigint, 11::ubigint)::hugeint AS x0 FROM vis),
v1 AS (SELECT doc_id, i, ((((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) % 4294967296) + ((((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) // 4294967296)   + ((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) // 4294967296) * ((13787848793156543929::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS x1 FROM v0),
v2 AS (SELECT doc_id, i, ((((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) % 4294967296) + ((((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) // 4294967296)   + ((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) // 4294967296) * ((10723151780598845931::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS x2 FROM v1),
vh AS (SELECT doc_id, i, xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM v2),
perdoc AS (SELECT p.source, p.doc_id,
                  sum(CASE WHEN (v.h % 100) < p.p THEN 1 ELSE 0 END)::bigint AS x
           FROM vh v JOIN pu p USING (doc_id) GROUP BY p.source, p.doc_id),
mass AS (SELECT source, sum(x)::bigint AS m FROM perdoc GROUP BY source),
tot AS (SELECT sum(m)::bigint AS t FROM mass),
ap AS (SELECT source, m,
              (1000 * m) // (SELECT t FROM tot) AS base,
              (1000 * m) % (SELECT t FROM tot) AS rem
       FROM mass),
lft AS (SELECT 1000 - sum(base)::bigint AS l FROM ap),
rk AS (SELECT source, m, base, rem,
              row_number() OVER (ORDER BY rem DESC, source ASC) AS r
       FROM ap)
SELECT source, m AS change_mass,
       (base + CASE WHEN r <= (SELECT l FROM lft) THEN 1 ELSE 0 END)::bigint AS alloc
FROM rk ORDER BY source
""",
        "serp_ctr_curve": _serp_ctr_sql(n_sessions=200, seed=7),
        "nqc_difficulty": _nqc_sql(k=50),
        "static_cache_hit_curve": """
WITH req AS (SELECT unnest(range(20000)) AS i),
a0 AS (SELECT i, xor(i::ubigint, 21::ubigint)::hugeint AS x0,
             xor(i::ubigint, 22::ubigint)::hugeint AS y0 FROM req),
a1 AS (SELECT i, ((((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) % 4294967296) + ((((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) // 4294967296)   + ((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) // 4294967296) * ((13787848793156543929::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS x1,
             ((((xor(y0::ubigint, y0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) % 4294967296) + ((((xor(y0::ubigint, y0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) // 4294967296)   + ((xor(y0::ubigint, y0::ubigint >> 30)::hugeint) // 4294967296) * ((13787848793156543929::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS y1 FROM a0),
a2 AS (SELECT i, ((((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) % 4294967296) + ((((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) // 4294967296)   + ((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) // 4294967296) * ((10723151780598845931::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS x2,
             ((((xor(y1::ubigint, y1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) % 4294967296) + ((((xor(y1::ubigint, y1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) // 4294967296)   + ((xor(y1::ubigint, y1::ubigint >> 27)::hugeint) // 4294967296) * ((10723151780598845931::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS y2 FROM a1),
draws AS (SELECT i, least(xor(x2::ubigint, x2::ubigint >> 31)::hugeint % 200,
                          xor(y2::ubigint, y2::ubigint >> 31)::hugeint % 200)::bigint AS qid
          FROM a2),
freq AS (SELECT qid, count(*)::bigint AS f FROM draws GROUP BY qid),
ranked AS (SELECT qid, f, row_number() OVER (ORDER BY f DESC, qid ASC) AS r
           FROM freq ORDER BY f DESC, qid ASC LIMIT 20)
SELECT r AS rank, qid AS query_id, f AS freq,
       round(sum(f) OVER (ORDER BY r ROWS UNBOUNDED PRECEDING)::double
             / 20000, 6) + 0.0 AS cum_hit_rate
FROM ranked ORDER BY rank
""",
        "rbp_err_eval": f"""
WITH {_BM25_SCORES},
ranked AS (
  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id
  FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10),
rel AS (
  SELECT doc_id FROM tok WHERE term IN ('join','merge','spark')
  GROUP BY doc_id HAVING count(DISTINCT term) = 3),
lab AS (
  SELECT r.rank,
         CASE WHEN r.doc_id IN (SELECT doc_id FROM rel) THEN 1.0 ELSE 0.0 END AS g
  FROM ranked r),
labc AS (
  SELECT rank, g,
         coalesce(sum(g) OVER (ORDER BY rank
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS before
  FROM lab),
nrel AS (SELECT count(*)::bigint AS r FROM rel)
SELECT (SELECT r FROM nrel) AS n_relevant,
       round((1.0 - 0.8) * (SELECT sum(g * power(0.8, rank - 1.0)) FROM lab), 6) + 0.0 AS rbp_08,
       round((SELECT sum(g * (0.5 / rank) * power(0.5, before)) FROM labc), 6) + 0.0 AS err
""",
        "hyperanf_neighborhood": _hyperanf_sql(rounds=3),
        "kleinberg_bursts": """
WITH RECURSIVE
raw AS (SELECT (epoch_us(ts) // 86400000000)::bigint AS day,
               sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::bigint AS r0,
               count(*)::bigint AS n
        FROM events GROUP BY 1),
dd AS (SELECT row_number() OVER (ORDER BY day) AS i, day,
              CASE WHEN day % 7 = 3 THEN least(n, r0 * 3) ELSE r0 END AS r, n
       FROM raw),
st AS (SELECT sum(r)::bigint AS R, sum(n)::bigint AS N, count(*)::bigint AS T FROM dd),
params AS (SELECT R::double / N AS p0,
                  least(2.0 * (R::double / N), 0.9999) AS p1,
                  1.0 * ln(T) AS g
           FROM st),
dp(i, c0, c1, s0, s1) AS (
  SELECT 1::bigint,
         -(d.r * ln(p.p0) + (d.n - d.r) * ln(1 - p.p0)),
         p.g + (-(d.r * ln(p.p1) + (d.n - d.r) * ln(1 - p.p1))),
         '0', '1'
  FROM dd d, params p WHERE d.i = 1
  UNION ALL
  SELECT d.i,
         (-(d.r * ln(p.p0) + (d.n - d.r) * ln(1 - p.p0)))
           + CASE WHEN dp.c0 <= dp.c1 THEN dp.c0 ELSE dp.c1 END,
         (-(d.r * ln(p.p1) + (d.n - d.r) * ln(1 - p.p1)))
           + CASE WHEN dp.c0 + p.g <= dp.c1 THEN dp.c0 + p.g ELSE dp.c1 END,
         (CASE WHEN dp.c0 <= dp.c1 THEN dp.s0 ELSE dp.s1 END) || '0',
         (CASE WHEN dp.c0 + p.g <= dp.c1 THEN dp.s0 ELSE dp.s1 END) || '1'
  FROM dp JOIN dd d ON d.i = dp.i + 1, params p
),
fin AS (SELECT CASE WHEN c0 <= c1 THEN s0 ELSE s1 END AS seq
        FROM dp WHERE i = (SELECT T FROM st))
SELECT d.day, d.r, d.n, CAST(substr(f.seq, d.i::int, 1) AS BIGINT) AS state
FROM dd d, fin f ORDER BY d.day
""",
        "trustrank_spam_mass": _trustrank_sql(),
        "consistent_hash_ring": _ring_sql(),
        "bm25plus_topk": f"""
WITH tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl)::double / (SELECT count(*) FROM documents) AS avgdl),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
scores AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * (tf.tf * 2.2
                 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl))
                 + 1.0) ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
  WHERE tf.term IN ('join', 'merge', 'spark')
  GROUP BY tf.doc_id)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) + 0.0 AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "prospective_alerts": _alerts_sql(),
        "related_queries": """
WITH req AS (SELECT unnest(range(20000)) AS i),
a0 AS (SELECT i, xor(i::ubigint, 21::ubigint)::hugeint AS x0,
             xor(i::ubigint, 22::ubigint)::hugeint AS y0 FROM req),
a1 AS (SELECT i, ((((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) % 4294967296) + ((((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) // 4294967296)   + ((xor(x0::ubigint, x0::ubigint >> 30)::hugeint) // 4294967296) * ((13787848793156543929::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS x1,
             ((((xor(y0::ubigint, y0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) % 4294967296) + ((((xor(y0::ubigint, y0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) // 4294967296)   + ((xor(y0::ubigint, y0::ubigint >> 30)::hugeint) // 4294967296) * ((13787848793156543929::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS y1 FROM a0),
a2 AS (SELECT i, ((((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) % 4294967296) + ((((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) // 4294967296)   + ((xor(x1::ubigint, x1::ubigint >> 27)::hugeint) // 4294967296) * ((10723151780598845931::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS x2,
             ((((xor(y1::ubigint, y1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) % 4294967296) + ((((xor(y1::ubigint, y1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) // 4294967296)   + ((xor(y1::ubigint, y1::ubigint >> 27)::hugeint) // 4294967296) * ((10723151780598845931::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS y2 FROM a1),
draws AS (SELECT (i // 10)::bigint AS session,
                 least(xor(x2::ubigint, x2::ubigint >> 31)::hugeint % 200,
                       xor(y2::ubigint, y2::ubigint >> 31)::hugeint % 200)::bigint AS qid
          FROM a2),
cnt AS (SELECT session, qid, count(*)::bigint AS c FROM draws GROUP BY session, qid),
pairs AS (
  SELECT a.qid AS query_a, b.qid AS query_b, sum(a.c * b.c)::bigint AS n_sessions
  FROM cnt a JOIN cnt b ON a.session = b.session AND a.qid < b.qid
  GROUP BY a.qid, b.qid)
SELECT row_number() OVER (ORDER BY n_sessions DESC, query_a ASC, query_b ASC) AS rank,
       query_a, query_b, n_sessions
FROM pairs ORDER BY n_sessions DESC, query_a ASC, query_b ASC LIMIT 20
""",
        "winnowing_fingerprints": f"""
WITH docs5 AS (SELECT doc_id, text, length(text) AS L FROM documents),
pos AS (SELECT doc_id, unnest(range(1, greatest(L - 3, 1))) AS i, text
        FROM docs5 WHERE L >= 5),
grams AS (SELECT doc_id, i, substr(text, i, 5) AS term FROM pos),
terms AS (SELECT DISTINCT term FROM grams),
{_term_hash64_sql()},
gh AS MATERIALIZED (SELECT g.doc_id, g.i, t.h FROM grams g JOIN th t USING (term)),
win AS (
  SELECT doc_id, i AS s,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
         count(*) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS span
  FROM gh),
sel AS (
  SELECT w.doc_id, max(g.i) AS p
  FROM win w JOIN gh g
    ON g.doc_id = w.doc_id AND g.i BETWEEN w.s AND w.s + 3 AND g.h = w.wmin
  WHERE w.span = 4
  GROUP BY w.doc_id, w.s),
fp AS (SELECT DISTINCT doc_id, p FROM sel),
cnt AS (SELECT doc_id, count(*)::bigint AS n FROM fp GROUP BY doc_id)
SELECT d.doc_id, coalesce(c.n, 0)::bigint AS n_fingerprints
FROM documents d LEFT JOIN cnt c USING (doc_id) ORDER BY d.doc_id
""",
        "combmnz_fusion": f"""
WITH {_BM25_SCORES},
coll AS (SELECT sum(doc_len)::double AS ct FROM dl),
cf AS (SELECT term, count(*)::double AS cf FROM tok
       WHERE term IN (SELECT term FROM q) GROUP BY term),
m AS (SELECT count(*)::bigint AS m FROM cf),
qsp AS (SELECT tf.doc_id,
               sum(ln(1.0 + tf.tf / (300.0 * (cf.cf / coll.ct)))) AS sp
        FROM tf JOIN cf USING (term), coll
        WHERE tf.term IN (SELECT term FROM q) GROUP BY tf.doc_id),
qld AS (SELECT qsp.doc_id,
               qsp.sp + (SELECT m FROM m) * ln(300.0 / (dl.doc_len + 300.0)) AS score
        FROM qsp JOIN dl USING (doc_id)),
jmk AS (SELECT sum(ln(0.3 * (cf.cf / coll.ct))) AS c0 FROM cf, coll),
jmsp AS (SELECT tf.doc_id,
                sum(ln(1.0 + (1.0 - 0.3) * tf.tf
                       / (0.3 * (cf.cf / coll.ct) * dl.doc_len))) AS sp
         FROM tf JOIN cf USING (term) JOIN dl USING (doc_id), coll
         WHERE tf.term IN (SELECT term FROM q) GROUP BY tf.doc_id),
jm AS (SELECT doc_id, sp + (SELECT c0 FROM jmk) AS score FROM jmsp),
t1 AS (SELECT doc_id, score FROM scores ORDER BY score DESC, doc_id ASC LIMIT 20),
t2 AS (SELECT doc_id, score FROM qld ORDER BY score DESC, doc_id ASC LIMIT 20),
t3 AS (SELECT doc_id, score FROM jm ORDER BY score DESC, doc_id ASC LIMIT 20),
n1 AS (SELECT doc_id, CASE WHEN (SELECT max(score) FROM t1) = (SELECT min(score) FROM t1)
                           THEN 1.0
                           ELSE (score - (SELECT min(score) FROM t1))
                                / ((SELECT max(score) FROM t1) - (SELECT min(score) FROM t1)) END AS ns
       FROM t1),
n2 AS (SELECT doc_id, CASE WHEN (SELECT max(score) FROM t2) = (SELECT min(score) FROM t2)
                           THEN 1.0
                           ELSE (score - (SELECT min(score) FROM t2))
                                / ((SELECT max(score) FROM t2) - (SELECT min(score) FROM t2)) END AS ns
       FROM t2),
n3 AS (SELECT doc_id, CASE WHEN (SELECT max(score) FROM t3) = (SELECT min(score) FROM t3)
                           THEN 1.0
                           ELSE (score - (SELECT min(score) FROM t3))
                                / ((SELECT max(score) FROM t3) - (SELECT min(score) FROM t3)) END AS ns
       FROM t3),
allid AS (SELECT DISTINCT doc_id FROM (
  SELECT doc_id FROM t1 UNION ALL SELECT doc_id FROM t2 UNION ALL SELECT doc_id FROM t3)),
fused AS (
  SELECT a.doc_id,
         round((coalesce(n1.ns, 0.0) + coalesce(n2.ns, 0.0) + coalesce(n3.ns, 0.0))
               * ((CASE WHEN n1.doc_id IS NULL THEN 0 ELSE 1 END)
                  + (CASE WHEN n2.doc_id IS NULL THEN 0 ELSE 1 END)
                  + (CASE WHEN n3.doc_id IS NULL THEN 0 ELSE 1 END)), 6) + 0.0 AS mnz
  FROM allid a
  LEFT JOIN n1 USING (doc_id) LEFT JOIN n2 USING (doc_id) LEFT JOIN n3 USING (doc_id))
SELECT row_number() OVER (ORDER BY mnz DESC, doc_id ASC) AS rank,
       doc_id, mnz AS mnz_score
FROM fused ORDER BY mnz DESC, doc_id ASC LIMIT 10
""",
        "bm25_proximity": f"""
WITH {_BM25_SCORES},
cands AS (SELECT doc_id, score FROM scores
          ORDER BY score DESC, doc_id ASC LIMIT 50),
occ AS (
  SELECT c.doc_id, 'join' AS term, ii AS p
  FROM cands c JOIN documents d USING (doc_id),
       unnest(range(1, greatest(length(d.text) - 2, 1))) AS u(ii)
  WHERE substr(d.text, ii::int, 4) = 'join'
  UNION ALL
  SELECT c.doc_id, 'merge', ii
  FROM cands c JOIN documents d USING (doc_id),
       unnest(range(1, greatest(length(d.text) - 3, 1))) AS u(ii)
  WHERE substr(d.text, ii::int, 5) = 'merge'
  UNION ALL
  SELECT c.doc_id, 'spark', ii
  FROM cands c JOIN documents d USING (doc_id),
       unnest(range(1, greatest(length(d.text) - 3, 1))) AS u(ii)
  WHERE substr(d.text, ii::int, 5) = 'spark'),
mind AS (
  SELECT a.doc_id, min(abs(a.p - b.p))::bigint AS d
  FROM occ a JOIN occ b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.doc_id),
fused AS (
  SELECT c.doc_id,
         round(c.score + CASE WHEN m.d IS NULL THEN 0.0
               ELSE ln(1 + 1.0 / (1 + m.d)) END, 6) + 0.0 AS score
  FROM cands c LEFT JOIN mind m USING (doc_id))
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, score
FROM fused ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "rm3_expansion": f"""
WITH tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
coll AS (SELECT sum(doc_len)::double AS ct FROM dl),
q AS (SELECT unnest(['join', 'merge', 'spark']) AS term),
cf AS (SELECT term, count(*)::double AS cf FROM tok
       WHERE term IN (SELECT term FROM q) GROUP BY term),
m AS (SELECT count(*)::bigint AS m FROM cf),
tf AS (SELECT doc_id, term, count(*)::double AS tf FROM tok
       WHERE term IN (SELECT term FROM q) GROUP BY 1, 2),
sp AS (SELECT tf.doc_id,
              sum(ln(1.0 + tf.tf / (300.0 * (cf.cf / coll.ct)))) AS sp
       FROM tf JOIN cf USING (term), coll GROUP BY tf.doc_id),
qscores AS (SELECT sp.doc_id,
                   sp.sp + (SELECT m FROM m) * ln(300.0 / (dl.doc_len + 300.0)) AS score
            FROM sp JOIN dl USING (doc_id)),
top10 AS MATERIALIZED (SELECT doc_id, score FROM qscores
                       ORDER BY score DESC, doc_id ASC LIMIT 10),
mx AS (SELECT max(score) AS v FROM top10),
sm AS (SELECT sum(exp(score - (SELECT v FROM mx))) AS z FROM top10),
wts AS (SELECT doc_id, exp(score - (SELECT v FROM mx)) / (SELECT z FROM sm) AS w
        FROM top10),
atf AS (SELECT doc_id, term, count(*)::double AS tf FROM tok
        WHERE doc_id IN (SELECT doc_id FROM top10) GROUP BY doc_id, term),
rm1 AS (SELECT a.term, sum(w.w * (a.tf / dl.doc_len)) AS p
        FROM atf a JOIN wts w USING (doc_id) JOIN dl USING (doc_id)
        GROUP BY a.term),
rm3 AS (SELECT term,
               round(0.5 * p + 0.5 * (CASE WHEN term IN ('join','merge','spark')
                     THEN 1.0 / 3 ELSE 0.0 END), 6) + 0.0 AS weight
        FROM rm1)
SELECT row_number() OVER (ORDER BY weight DESC, term ASC) AS rank, term, weight
FROM rm3 ORDER BY weight DESC, term ASC LIMIT 10
""",
        "chunk_dedup": f"""
WITH toksl AS ({_TOKS_LIST}),
pre AS (SELECT doc_id, array_to_string(toks[1:16], ' ') AS p FROM toksl),
inj AS (SELECT d.doc_id, pre.p || ' ' || d.text AS text
        FROM documents d JOIN pre ON pre.doc_id = d.doc_id - (d.doc_id % 4)),
t2 AS (SELECT doc_id,
              list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                          x -> x <> '') AS toks
       FROM inj),
ch AS (SELECT doc_id, toks, len(toks) AS n,
              unnest(range(0, 1 + greatest(len(toks) - 16 + 15, 0) // 16)) AS chunk_id
       FROM t2 WHERE len(toks) > 0),
sel AS (SELECT doc_id, chunk_id, chunk_id * 16 AS st,
               least(chunk_id * 16 + 16, n) AS en, toks FROM ch),
dd AS (SELECT doc_id, chunk_id, (en - st)::bigint AS ntok,
              array_to_string(toks[st + 1 : en], ' ') AS ctext FROM sel),
rn AS (SELECT *, row_number() OVER (PARTITION BY ctext
                                    ORDER BY doc_id, chunk_id) AS rn FROM dd),
kept AS (SELECT doc_id, count(*)::bigint AS nk, sum(ntok)::bigint AS ktok
         FROM rn WHERE rn = 1 GROUP BY doc_id),
tot AS (SELECT doc_id, count(*)::bigint AS nc FROM dd GROUP BY doc_id)
SELECT d.doc_id, coalesce(t.nc, 0)::bigint AS n_chunks,
       coalesce(k.nk, 0)::bigint AS n_kept,
       coalesce(k.ktok, 0)::bigint AS kept_tokens
FROM documents d LEFT JOIN tot t USING (doc_id) LEFT JOIN kept k USING (doc_id)
ORDER BY d.doc_id
""",
        "mi_feature_selection": f"""
WITH tok AS ({_TOK}),
pres AS (SELECT DISTINCT doc_id, term FROM tok),
lab AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
st AS (SELECT count(*)::double AS N,
              sum(y)::double AS Nc FROM lab),
cnt AS (SELECT p.term, sum(l.y)::double AS n11, sum(1 - l.y)::double AS n10
        FROM pres p JOIN lab l USING (doc_id) GROUP BY p.term),
mi AS (
  SELECT term,
    (CASE WHEN n11 > 0 THEN (n11 / st.N) * log2((st.N * n11) / ((n11 + n10) * st.Nc)) ELSE 0.0 END)
  + (CASE WHEN n10 > 0 THEN (n10 / st.N) * log2((st.N * n10) / ((n11 + n10) * (st.N - st.Nc))) ELSE 0.0 END)
  + (CASE WHEN (st.Nc - n11) > 0 THEN ((st.Nc - n11) / st.N)
          * log2((st.N * (st.Nc - n11)) / ((st.N - (n11 + n10)) * st.Nc)) ELSE 0.0 END)
  + (CASE WHEN ((st.N - st.Nc) - n10) > 0 THEN (((st.N - st.Nc) - n10) / st.N)
          * log2((st.N * ((st.N - st.Nc) - n10)) / ((st.N - (n11 + n10)) * (st.N - st.Nc))) ELSE 0.0 END)
  AS v
  FROM cnt, st)
SELECT row_number() OVER (ORDER BY round(v, 6) DESC, term ASC) AS rank,
       term, round(v, 6) + 0.0 AS mi
FROM mi ORDER BY round(v, 6) DESC, term ASC LIMIT 15
""",
        "tput_topk": f"""
WITH {_BM25_SCORES},
coll AS (SELECT sum(doc_len)::double AS ct FROM dl),
cf AS (SELECT term, count(*)::double AS cf FROM tok
       WHERE term IN (SELECT term FROM q) GROUP BY term),
m AS (SELECT count(*)::bigint AS m FROM cf),
qsp AS (SELECT tf.doc_id,
               sum(ln(1.0 + tf.tf / (300.0 * (cf.cf / coll.ct)))) AS sp
        FROM tf JOIN cf USING (term), coll
        WHERE tf.term IN (SELECT term FROM q) GROUP BY tf.doc_id),
qld AS (SELECT qsp.doc_id,
               qsp.sp + (SELECT m FROM m) * ln(300.0 / (dl.doc_len + 300.0)) AS score
        FROM qsp JOIN dl USING (doc_id)),
jmk AS (SELECT sum(ln(0.3 * (cf.cf / coll.ct))) AS c0 FROM cf, coll),
jmsp AS (SELECT tf.doc_id,
                sum(ln(1.0 + (1.0 - 0.3) * tf.tf
                       / (0.3 * (cf.cf / coll.ct) * dl.doc_len))) AS sp
         FROM tf JOIN cf USING (term) JOIN dl USING (doc_id), coll
         WHERE tf.term IN (SELECT term FROM q) GROUP BY tf.doc_id),
jm AS (SELECT doc_id, sp + (SELECT c0 FROM jmk) AS score FROM jmsp),
t1 AS (SELECT doc_id, score FROM scores ORDER BY score DESC, doc_id ASC LIMIT 20),
t2 AS (SELECT doc_id, score FROM qld ORDER BY score DESC, doc_id ASC LIMIT 20),
t3 AS (SELECT doc_id, score FROM jm ORDER BY score DESC, doc_id ASC LIMIT 20),
n1 AS MATERIALIZED (SELECT doc_id, CASE WHEN (SELECT max(score) FROM t1) = (SELECT min(score) FROM t1)
                           THEN 1.0
                           ELSE (score - (SELECT min(score) FROM t1))
                                / ((SELECT max(score) FROM t1) - (SELECT min(score) FROM t1)) END AS ns
       FROM t1),
n2 AS MATERIALIZED (SELECT doc_id, CASE WHEN (SELECT max(score) FROM t2) = (SELECT min(score) FROM t2)
                           THEN 1.0
                           ELSE (score - (SELECT min(score) FROM t2))
                                / ((SELECT max(score) FROM t2) - (SELECT min(score) FROM t2)) END AS ns
       FROM t2),
n3 AS MATERIALIZED (SELECT doc_id, CASE WHEN (SELECT max(score) FROM t3) = (SELECT min(score) FROM t3)
                           THEN 1.0
                           ELSE (score - (SELECT min(score) FROM t3))
                                / ((SELECT max(score) FROM t3) - (SELECT min(score) FROM t3)) END AS ns
       FROM t3),
p1t1 AS (SELECT doc_id, ns FROM n1 ORDER BY ns DESC, doc_id ASC LIMIT 5),
p1t2 AS (SELECT doc_id, ns FROM n2 ORDER BY ns DESC, doc_id ASC LIMIT 5),
p1t3 AS (SELECT doc_id, ns FROM n3 ORDER BY ns DESC, doc_id ASC LIMIT 5),
seen1 AS (SELECT DISTINCT doc_id FROM
          (SELECT doc_id FROM p1t1 UNION ALL SELECT doc_id FROM p1t2
           UNION ALL SELECT doc_id FROM p1t3)),
p1 AS (SELECT s.doc_id,
         coalesce((SELECT ns FROM p1t1 WHERE doc_id = s.doc_id), 0.0)
       + coalesce((SELECT ns FROM p1t2 WHERE doc_id = s.doc_id), 0.0)
       + coalesce((SELECT ns FROM p1t3 WHERE doc_id = s.doc_id), 0.0) AS v
       FROM seen1 s),
tau1 AS (SELECT min(v) AS v FROM (SELECT v FROM p1 ORDER BY v DESC LIMIT 5)),
tt AS (SELECT (SELECT v FROM tau1) / 3 AS t),
s1 AS (SELECT doc_id, ns FROM n1 WHERE ns >= (SELECT t FROM tt)),
s2 AS (SELECT doc_id, ns FROM n2 WHERE ns >= (SELECT t FROM tt)),
s3 AS (SELECT doc_id, ns FROM n3 WHERE ns >= (SELECT t FROM tt)),
nsent AS (SELECT (SELECT count(*) FROM s1) + (SELECT count(*) FROM s2)
                 + (SELECT count(*) FROM s3) AS n),
docs2 AS (SELECT DISTINCT doc_id FROM
          (SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2
           UNION ALL SELECT doc_id FROM s3)),
p2 AS (SELECT d.doc_id,
              coalesce(s1.ns, 0.0) + coalesce(s2.ns, 0.0) + coalesce(s3.ns, 0.0) AS v,
              ((CASE WHEN s1.doc_id IS NULL THEN 1 ELSE 0 END)
               + (CASE WHEN s2.doc_id IS NULL THEN 1 ELSE 0 END)
               + (CASE WHEN s3.doc_id IS NULL THEN 1 ELSE 0 END)) AS miss
       FROM docs2 d LEFT JOIN s1 USING (doc_id) LEFT JOIN s2 USING (doc_id)
            LEFT JOIN s3 USING (doc_id)),
tau2 AS (SELECT min(v) AS v FROM (SELECT v FROM p2 ORDER BY v DESC LIMIT 5)),
cand AS (SELECT doc_id FROM p2
         WHERE v + (SELECT t FROM tt) * miss >= (SELECT v FROM tau2)),
ex AS (SELECT c.doc_id,
              coalesce(n1.ns, 0.0) + coalesce(n2.ns, 0.0) + coalesce(n3.ns, 0.0) AS v
       FROM cand c LEFT JOIN n1 USING (doc_id) LEFT JOIN n2 USING (doc_id)
            LEFT JOIN n3 USING (doc_id))
SELECT row_number() OVER (ORDER BY round(v, 6) DESC, doc_id ASC) AS rank,
       doc_id, round(v, 6) + 0.0 AS sum_score,
       (SELECT n FROM nsent)::bigint AS phase2_rows,
       (SELECT count(*) FROM cand)::bigint AS n_candidates
FROM ex ORDER BY round(v, 6) DESC, doc_id ASC LIMIT 5
""",
        "impact_quantized_topk": f"""
WITH tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl)::double / (SELECT count(*) FROM documents) AS avgdl),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
ts AS (SELECT tf.doc_id, tf.term,
              ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl)) AS s
       FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
       WHERE tf.term IN ('join', 'merge', 'spark')),
mx AS (SELECT term, max(s) AS m FROM ts GROUP BY term),
imp AS (SELECT ts.doc_id,
               (1 + floor(254 * ts.s / mx.m))::bigint AS i
        FROM ts JOIN mx USING (term)),
agg AS (SELECT doc_id, sum(i)::bigint AS impact FROM imp GROUP BY doc_id)
SELECT row_number() OVER (ORDER BY impact DESC, doc_id ASC) AS rank,
       doc_id, impact
FROM agg ORDER BY impact DESC, doc_id ASC LIMIT 10
""",
        "partition_bloom_pruning": f"""
WITH span AS (SELECT ((max(doc_id) + 8) // 8)::bigint AS s FROM documents),
inj AS (SELECT doc_id,
               'pmark' || least(doc_id // (SELECT s FROM span), 7) || ' ' || text AS text
        FROM documents),
tok AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text),
               '[^a-z0-9]+'), x -> x <> '')) AS term FROM inj),
pterms AS (SELECT DISTINCT least(doc_id // (SELECT s FROM span), 7)::bigint AS part, term
           FROM tok),
probes AS (SELECT unnest(['join', 'nosuchterm12345', 'pmark0', 'pmark3', 'pmark7', 'spark']) AS term),
terms AS (SELECT DISTINCT term FROM
          (SELECT term FROM pterms UNION ALL SELECT term FROM probes)),
{_term_hash64_sql()},
y0 AS (SELECT term, h, (h + 11400714819323198485) % 18446744073709551616 AS v FROM th),
y1 AS (SELECT term, h, ((((xor(v::ubigint, v::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) % 4294967296) + ((((xor(v::ubigint, v::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) // 4294967296)   + ((xor(v::ubigint, v::ubigint >> 30)::hugeint) // 4294967296) * ((13787848793156543929::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS v FROM y0),
y2 AS (SELECT term, h, ((((xor(v::ubigint, v::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) % 4294967296) + ((((xor(v::ubigint, v::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) // 4294967296)   + ((xor(v::ubigint, v::ubigint >> 27)::hugeint) // 4294967296) * ((10723151780598845931::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS v FROM y1),
hh AS (SELECT term, h AS h1,
              (xor(v::ubigint, v::ubigint >> 31)::hugeint // 2) * 2 + 1 AS h2
       FROM y2),
pos AS MATERIALIZED (
  SELECT term, ((h1 + ((i * h2) % 18446744073709551616)) % 18446744073709551616) % 4096 AS p
  FROM hh, (SELECT unnest(range(7)) AS i)),
partbits AS MATERIALIZED (
  SELECT DISTINCT pt.part, pos.p FROM pterms pt JOIN pos USING (term)),
parts AS (SELECT unnest(range(8)) AS part)
SELECT pr.term, parts.part::bigint AS partition,
       CASE WHEN NOT EXISTS (
         SELECT 1 FROM pos q WHERE q.term = pr.term AND NOT EXISTS (
           SELECT 1 FROM partbits pb WHERE pb.part = parts.part AND pb.p = q.p))
       THEN 1 ELSE 0 END AS bloom_hit,
       CASE WHEN EXISTS (SELECT 1 FROM pterms x
                         WHERE x.part = parts.part AND x.term = pr.term)
       THEN 1 ELSE 0 END AS actual
FROM probes pr, parts
ORDER BY pr.term, parts.part
""",
        "lang_rank_profile": """
WITH low AS (SELECT doc_id, lang, lower(text) AS t FROM documents),
g AS (SELECT doc_id, lang, substr(t, i::int, 3) AS gram
      FROM low, unnest(range(1, greatest(length(t) - 1, 1))) u(i)),
lc AS (SELECT lang, gram, count(*)::bigint AS c FROM g GROUP BY lang, gram),
lp AS (SELECT lang, gram, r FROM (
         SELECT lang, gram,
                row_number() OVER (PARTITION BY lang ORDER BY c DESC, gram ASC) AS r
         FROM lc) WHERE r <= 50),
dc AS (SELECT doc_id, gram, count(*)::bigint AS c FROM g GROUP BY doc_id, gram),
dp AS (SELECT doc_id, gram, r FROM (
         SELECT doc_id, gram,
                row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram ASC) AS r
         FROM dc) WHERE r <= 20),
langs AS (SELECT DISTINCT lang FROM documents),
dist AS (
  SELECT d.doc_id, l.lang,
         sum(CASE WHEN lp.r IS NULL THEN 50 ELSE abs(d.r - lp.r) END)::bigint AS dist
  FROM dp d CROSS JOIN langs l
  LEFT JOIN lp ON lp.lang = l.lang AND lp.gram = d.gram
  GROUP BY d.doc_id, l.lang),
pred AS (SELECT doc_id, lang AS pred_lang, dist,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY dist ASC, lang ASC) AS rn
         FROM dist)
SELECT p.doc_id, p.pred_lang, d.lang AS actual_lang, p.dist
FROM pred p JOIN documents d USING (doc_id)
WHERE p.rn = 1 AND p.doc_id < 50 ORDER BY p.doc_id
""",
        "borda_fusion": f"""
WITH {_BM25_SCORES},
coll AS (SELECT sum(doc_len)::double AS ct FROM dl),
cf AS (SELECT term, count(*)::double AS cf FROM tok
       WHERE term IN (SELECT term FROM q) GROUP BY term),
m AS (SELECT count(*)::bigint AS m FROM cf),
qsp AS (SELECT tf.doc_id,
               sum(ln(1.0 + tf.tf / (300.0 * (cf.cf / coll.ct)))) AS sp
        FROM tf JOIN cf USING (term), coll
        WHERE tf.term IN (SELECT term FROM q) GROUP BY tf.doc_id),
qld AS (SELECT qsp.doc_id,
               qsp.sp + (SELECT m FROM m) * ln(300.0 / (dl.doc_len + 300.0)) AS score
        FROM qsp JOIN dl USING (doc_id)),
jmk AS (SELECT sum(ln(0.3 * (cf.cf / coll.ct))) AS c0 FROM cf, coll),
jmsp AS (SELECT tf.doc_id,
                sum(ln(1.0 + (1.0 - 0.3) * tf.tf
                       / (0.3 * (cf.cf / coll.ct) * dl.doc_len))) AS sp
         FROM tf JOIN cf USING (term) JOIN dl USING (doc_id), coll
         WHERE tf.term IN (SELECT term FROM q) GROUP BY tf.doc_id),
jm AS (SELECT doc_id, sp + (SELECT c0 FROM jmk) AS score FROM jmsp),
r1 AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
       FROM scores ORDER BY score DESC, doc_id ASC LIMIT 20),
r2 AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
       FROM qld ORDER BY score DESC, doc_id ASC LIMIT 20),
r3 AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
       FROM jm ORDER BY score DESC, doc_id ASC LIMIT 20),
pts AS (
  SELECT doc_id, sum(21 - r)::bigint AS p FROM (
    SELECT doc_id, r FROM r1 UNION ALL SELECT doc_id, r FROM r2
    UNION ALL SELECT doc_id, r FROM r3)
  GROUP BY doc_id)
SELECT row_number() OVER (ORDER BY p DESC, doc_id ASC) AS rank,
       doc_id, p AS borda_points
FROM pts ORDER BY p DESC, doc_id ASC LIMIT 10
""",
        "focused_hits": _focused_hits_sql(),
        "serp_diversity": f"""
WITH {_BM25_SCORES},
top20 AS (SELECT doc_id FROM scores ORDER BY score DESC, doc_id ASC LIMIT 20),
cnt AS (SELECT d.source, count(*)::bigint AS c
        FROM top20 JOIN documents d USING (doc_id) GROUP BY d.source),
n AS (SELECT sum(c)::double AS n FROM cnt),
agg AS (
  SELECT sum((c / (SELECT n FROM n)) * (c / (SELECT n FROM n))) AS simpson,
         sum(-(c / (SELECT n FROM n)) * log2(c / (SELECT n FROM n))) AS shannon,
         count(*)::bigint AS ns
  FROM cnt)
SELECT (SELECT n FROM n)::bigint AS n_results, ns AS n_sources,
       round(simpson, 6) + 0.0 AS simpson,
       round(1.0 / simpson, 6) + 0.0 AS effective_sources,
       round(shannon, 6) + 0.0 AS shannon_bits
FROM agg
""",
        "ab_ztest_clicks": _ab_ztest_sql(),
        "serp_abandonment": f"""
WITH {_BM25_SCORES},
ranked AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, doc_id
  FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10),
imp AS (
  SELECT s, pos,
         (SELECT doc_id FROM ranked r WHERE r.rank = pos) AS doc_id
  FROM (SELECT unnest(range(400)) AS s), (SELECT unnest(range(1, 11)) AS pos)),
c0 AS (SELECT *, xor((s*16+pos)::ubigint, 10::ubigint)::hugeint AS a0,
               xor(doc_id::ubigint, 11::ubigint)::hugeint AS d0 FROM imp),
c1 AS (SELECT *, ((((xor(a0::ubigint, a0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) % 4294967296) + ((((xor(a0::ubigint, a0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) // 4294967296)   + ((xor(a0::ubigint, a0::ubigint >> 30)::hugeint) // 4294967296) * ((13787848793156543929::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS a1,
               ((((xor(d0::ubigint, d0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) % 4294967296) + ((((xor(d0::ubigint, d0::ubigint >> 30)::hugeint) % 4294967296) * ((13787848793156543929::hugeint) // 4294967296)   + ((xor(d0::ubigint, d0::ubigint >> 30)::hugeint) // 4294967296) * ((13787848793156543929::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS d1 FROM c0),
c2 AS (SELECT *, ((((xor(a1::ubigint, a1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) % 4294967296) + ((((xor(a1::ubigint, a1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) // 4294967296)   + ((xor(a1::ubigint, a1::ubigint >> 27)::hugeint) // 4294967296) * ((10723151780598845931::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS a2,
               ((((xor(d1::ubigint, d1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) % 4294967296) + ((((xor(d1::ubigint, d1::ubigint >> 27)::hugeint) % 4294967296) * ((10723151780598845931::hugeint) // 4294967296)   + ((xor(d1::ubigint, d1::ubigint >> 27)::hugeint) // 4294967296) * ((10723151780598845931::hugeint) % 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS d2 FROM c1),
att AS MATERIALIZED (
  SELECT s, pos,
         CASE WHEN (xor(a2::ubigint, a2::ubigint >> 31)::hugeint % 16)
                   < (3 + (xor(d2::ubigint, d2::ubigint >> 31)::hugeint % 10))
              THEN 1 ELSE 0 END AS att
  FROM c2),
firstp AS (SELECT s, min(pos) FILTER (WHERE att = 1) AS fp FROM att GROUP BY s),
agg AS (
  SELECT count(*)::bigint AS n,
         count(fp)::bigint AS clicked,
         sum(CASE WHEN fp <= 1 THEN 1 ELSE 0 END)::bigint AS s1,
         sum(CASE WHEN fp <= 3 THEN 1 ELSE 0 END)::bigint AS s3,
         sum(CASE WHEN fp <= 5 THEN 1 ELSE 0 END)::bigint AS s5,
         coalesce(sum(fp), 0)::bigint AS fsum
  FROM firstp)
SELECT n AS n_sessions, clicked, (n - clicked)::bigint AS abandoned,
       round((n - clicked)::double / n, 6) + 0.0 AS abandonment_rate,
       round(s1::double / n, 6) + 0.0 AS success_at_1,
       round(s3::double / n, 6) + 0.0 AS success_at_3,
       round(s5::double / n, 6) + 0.0 AS success_at_5,
       CASE WHEN clicked > 0
            THEN round(fsum::double / clicked, 6) + 0.0 ELSE 0.0 END
         AS mean_first_click_rank
FROM agg
""",
        "qld_dirichlet_topk": f"""
WITH tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
coll AS (SELECT sum(doc_len)::double AS ct FROM dl),
q AS (SELECT unnest(['join', 'merge', 'spark']) AS term),
cf AS (SELECT term, count(*)::double AS cf FROM tok
       WHERE term IN (SELECT term FROM q) GROUP BY term),
m AS (SELECT count(*)::bigint AS m FROM cf),
tf AS (SELECT doc_id, term, count(*)::double AS tf FROM tok
       WHERE term IN (SELECT term FROM q) GROUP BY 1, 2),
sp AS (SELECT tf.doc_id,
              sum(ln(1.0 + tf.tf / (300.0 * (cf.cf / coll.ct)))) AS sp
       FROM tf JOIN cf USING (term), coll GROUP BY tf.doc_id),
scores AS (SELECT sp.doc_id,
                  sp.sp + (SELECT m FROM m) * ln(300.0 / (dl.doc_len + 300.0)) AS score
           FROM sp JOIN dl USING (doc_id))
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "dfr_pl2_topk": f"""
WITH tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
st AS (SELECT (SELECT count(*) FROM documents)::double AS n,
              (SELECT sum(doc_len) FROM dl)::double
                / (SELECT count(*) FROM documents) AS avgdl),
q AS (SELECT unnest(['join', 'merge', 'spark']) AS term),
cf AS (SELECT term, count(*)::double AS cf FROM tok
       WHERE term IN (SELECT term FROM q) GROUP BY term),
tf AS (SELECT doc_id, term, count(*)::double AS tf FROM tok
       WHERE term IN (SELECT term FROM q) GROUP BY 1, 2),
tn AS (SELECT tf.doc_id, tf.term,
              tf.tf * log2(1.0 + 1.0 * st.avgdl / dl.doc_len) AS tfn
       FROM tf JOIN dl USING (doc_id), st),
scores AS (SELECT tn.doc_id,
              sum((tn.tfn * log2(tn.tfn / (cf.cf / st.n))
                   + (cf.cf / st.n - tn.tfn) * log2(exp(1))
                   + 0.5 * log2(2.0 * pi() * tn.tfn)) / (tn.tfn + 1.0)) AS score
           FROM tn JOIN cf USING (term), st GROUP BY tn.doc_id)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "collocations_llr": f"""
WITH tokl AS ({_TOKS_LIST}),
tp AS (SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS pos
       FROM tokl),
bg AS (SELECT t AS t1, lead(t, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
       FROM tp QUALIFY t2 IS NOT NULL),
bc AS (SELECT t1, t2, count(*)::bigint AS a FROM bg GROUP BY 1, 2),
c1 AS (SELECT t1, sum(a)::bigint AS c1 FROM bc GROUP BY t1),
c2 AS (SELECT t2, sum(a)::bigint AS c2 FROM bc GROUP BY t2),
nn AS (SELECT sum(a)::double AS n FROM bc),
cell AS (SELECT bc.t1, bc.t2, bc.a::bigint AS cnt,
                bc.a::double AS a, (c1.c1 - bc.a)::double AS b,
                (c2.c2 - bc.a)::double AS c,
                (nn.n - c1.c1 - c2.c2 + bc.a)::double AS d, nn.n AS n
         FROM bc JOIN c1 USING (t1) JOIN c2 USING (t2), nn WHERE bc.a >= 5),
g AS (SELECT t1, t2, cnt,
             round(2.0 * ({_xlx('a')} + {_xlx('b')} + {_xlx('c')} + {_xlx('d')}
                          - {_xlx('a + b')} - {_xlx('c + d')}
                          - {_xlx('a + c')} - {_xlx('b + d')} + {_xlx('n')}), 6) AS g2
      FROM cell)
SELECT t1, t2, cnt, g2 FROM g ORDER BY g2 DESC, t1, t2 LIMIT 20
""",
        "containment_pairs": """
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
SELECT id_a, id_b, round(c::double / least(sa.sz, sb.sz), 6) AS containment
FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE c::double / least(sa.sz, sb.sz) >= 0.6
ORDER BY id_a, id_b
""",
        "lang_kl_matrix": f"""
WITH lt AS (SELECT d.lang, t.term FROM ({_TOK}) t JOIN documents d USING (doc_id)),
vocab AS (SELECT DISTINCT term FROM lt),
v AS (SELECT count(*)::double AS v FROM vocab),
cnt AS (SELECT lang, term, count(*)::bigint AS c FROM lt GROUP BY 1, 2),
nl AS (SELECT lang, count(*)::bigint AS n FROM lt GROUP BY lang),
langs AS (SELECT DISTINCT lang FROM documents),
nall AS (SELECT langs.lang, coalesce(nl.n, 0)::double AS n
         FROM langs LEFT JOIN nl USING (lang)),
grid AS (SELECT a.lang AS la, b.lang AS lb
         FROM langs a CROSS JOIN langs b WHERE a.lang <> b.lang),
cell AS (SELECT g.la, g.lb,
                (coalesce(ca.c, 0) + 1)::double / (na.n + v.v) AS pa,
                (coalesce(cb.c, 0) + 1)::double / (nb.n + v.v) AS pb
         FROM grid g CROSS JOIN vocab vb CROSS JOIN v
         LEFT JOIN cnt ca ON ca.lang = g.la AND ca.term = vb.term
         LEFT JOIN cnt cb ON cb.lang = g.lb AND cb.term = vb.term
         JOIN nall na ON na.lang = g.la JOIN nall nb ON nb.lang = g.lb)
SELECT la AS lang_a, lb AS lang_b, round(sum(pa * ln(pa / pb)), 6) AS kl
FROM cell GROUP BY 1, 2 ORDER BY lang_a, lang_b
""",
        "burrows_delta": f"""
WITH tok AS ({_TOK}),
tc AS (SELECT term, count(*)::bigint AS c FROM tok GROUP BY term),
top AS (SELECT term FROM tc ORDER BY c DESC, term LIMIT 50),
ls AS (SELECT t.term, d.source FROM ({_TOK}) t JOIN documents d USING (doc_id)),
ns AS (SELECT source, count(*)::bigint AS n FROM ls GROUP BY source),
stc AS (SELECT source, term, count(*)::bigint AS c FROM ls
        WHERE term IN (SELECT term FROM top) GROUP BY 1, 2),
grid AS (SELECT ns.source, top.term, coalesce(stc.c, 0)::double / ns.n AS f
         FROM ns CROSS JOIN top
         LEFT JOIN stc ON stc.source = ns.source AND stc.term = top.term),
mz AS (SELECT term, avg(f) AS mu, stddev_pop(f) AS sd FROM grid GROUP BY term),
z AS (SELECT g.source, g.term, (g.f - mz.mu) / mz.sd AS z
      FROM grid g JOIN mz USING (term) WHERE mz.sd > 0),
d AS (SELECT a.source AS source_a, b.source AS source_b,
             round(avg(abs(a.z - b.z)), 6) AS delta
      FROM z a JOIN z b ON a.term = b.term AND a.source < b.source
      GROUP BY 1, 2)
SELECT source_a, source_b, delta FROM d ORDER BY source_a, source_b
""",
        "length_percentile": """
SELECT doc_id, n_chars,
       round(cume_dist() OVER (ORDER BY n_chars), 6) AS pctl
FROM documents ORDER BY doc_id
""",
        "trimmed_mean_length": """
WITH r AS (
  SELECT lang, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars, doc_id)::bigint AS rn,
         count(*) OVER (PARTITION BY lang)::bigint AS n
  FROM documents)
SELECT lang, max(n) AS n_docs, (max(n) // 10)::bigint AS n_trimmed_each,
       round(sum(CASE WHEN rn > n // 10 AND rn <= n - n // 10
                      THEN n_chars ELSE 0 END)::double
               / (max(n) - 2 * (max(n) // 10))::double, 6) AS trimmed_mean
FROM r GROUP BY lang ORDER BY lang
""",
        "gini_hosts": """
WITH c AS (SELECT source, count(*)::bigint AS x FROM documents GROUP BY source),
r AS (SELECT x,
             row_number() OVER (ORDER BY x ASC, source ASC)::bigint AS i,
             count(*) OVER ()::bigint AS n,
             sum(x) OVER ()::bigint AS sx
      FROM c)
SELECT max(n)::bigint AS n_hosts, max(sx)::bigint AS n_docs,
       round((2 * sum(i * x) - (max(n) + 1) * max(sx))::double
               / (max(n) * max(sx))::double, 6) AS gini
FROM r
""",
        "community_top_terms": f"""
WITH {_lpa_ctes(5, _LINK_EDGES_CTE)},
tok AS ({_TOK}),
tt AS (
  SELECT l5.lbl AS community, tok.term, count(*)::bigint AS n
  FROM tok JOIN l5 ON l5.node = tok.doc_id GROUP BY 1, 2),
rk AS (
  SELECT community, term, n,
         row_number() OVER (PARTITION BY community
                            ORDER BY n DESC, term ASC) AS rn
  FROM tt)
SELECT community, term, n FROM rk WHERE rn <= 3
ORDER BY community, n DESC, term
""",
        "ewma_daily_events": """
WITH c AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*)::bigint AS n
  FROM events GROUP BY 1, 2),
r AS (
  SELECT event_type, day, n,
         (row_number() OVER (PARTITION BY event_type ORDER BY day))::bigint - 1
           AS rk
  FROM c),
nm AS (
  SELECT a.event_type, a.day, a.n, a.rk,
         sum(b.n * (1::bigint << b.rk::int))::bigint AS num
  FROM r a JOIN r b ON a.event_type = b.event_type AND b.rk <= a.rk
  GROUP BY 1, 2, 3, 4)
SELECT event_type, day, n,
       round(num::double / ((1::bigint << (rk + 1)::int) - 1)::double, 6) AS ewma
FROM nm ORDER BY event_type, day
""",
        "event_interarrival": """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events),
a AS (
  SELECT user_id, count(gap)::bigint AS n_gaps, sum(gap)::bigint AS sum_gap_us,
         max(gap)::bigint AS max_gap_us
  FROM g WHERE gap IS NOT NULL GROUP BY user_id)
SELECT user_id, n_gaps, sum_gap_us, max_gap_us,
       round(sum_gap_us::double / n_gaps::double / 1000000.0, 6) AS avg_gap_s
FROM a ORDER BY user_id
""",
        "daily_event_anomaly": """
WITH c AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*)::bigint AS n
  FROM events GROUP BY 1, 2),
s AS (SELECT event_type, avg(n) AS m, stddev_pop(n) AS sd
      FROM c GROUP BY event_type)
SELECT c.event_type, c.day, c.n,
       round(CASE WHEN s.sd > 0 THEN (c.n - s.m) / s.sd ELSE 0.0 END, 6) AS z,
       (abs(round(CASE WHEN s.sd > 0 THEN (c.n - s.m) / s.sd ELSE 0.0 END, 6))
          > 2.0)::bigint AS is_anomaly
FROM c JOIN s USING (event_type) ORDER BY c.event_type, c.day
""",
        "price_model_ols": _price_model_sql(),
        "langid_model_gd": _logreg_sql(n_iter=5, lr=1e-3),
        "lineitem_corr_matrix": _corr_sql(),
        "kmeans_centroids": _kmeans_sql(k=4, n_iter=3, dim=64),
        "pca_top_component": _pca_sql(n_iter=10, dim=64),
        "distinct_users": """
SELECT count(DISTINCT user_id)::bigint AS n_distinct FROM events
""",
        "hll_registers": _hll_registers_sql(),
        "customers_without_orders": """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
ORDER BY c_custkey
""",
        "top_events_per_user": """
SELECT user_id::bigint AS user_id, event_id::bigint AS event_id, value FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
  FROM events) WHERE rn <= 3
ORDER BY user_id, value DESC, event_id
""",
        "value_quantiles_hist": """
WITH lohi AS (SELECT min(value)::double AS lo, max(value)::double AS hi,
                     CASE WHEN max(value)-min(value) = 0 THEN 1.0 ELSE max(value)::double - min(value)::double END AS w
              FROM events WHERE value IS NOT NULL),
bins AS (SELECT least(floor((value::double - lo) / w * 4096)::bigint, 4095) AS bin
         FROM events, lohi WHERE value IS NOT NULL),
hist AS (SELECT bin, count(*)::bigint AS cnt FROM bins GROUP BY bin),
cum AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS c FROM hist),
n AS (SELECT count(*)::bigint AS n FROM bins),
qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
tgt AS (SELECT q, greatest(1, ceil(q * n)::bigint) AS target FROM qs, n),
hit AS (SELECT t.q, t.target, min(c.bin) AS bin
        FROM tgt t JOIN cum c ON c.c >= t.target GROUP BY t.q, t.target),
fin AS (SELECT h.q, h.bin, h.target,
               coalesce((SELECT max(c2.c) FROM cum c2 WHERE c2.bin < h.bin), 0) AS prev,
               (SELECT cnt FROM hist WHERE bin = h.bin) AS cnt
        FROM hit h)
SELECT q::double AS q, lo + (bin + (target - prev)::double / greatest(cnt, 1)) * w / 4096 AS value
FROM fin, lohi ORDER BY q
""",
        "source_length_stats": """
SELECT source, count(*)::bigint AS n_rows, sum(n_chars)::bigint AS sum_n_chars,
       min(n_chars)::bigint AS min_n_chars, max(n_chars)::bigint AS max_n_chars
FROM documents GROUP BY source ORDER BY source
""",
        "windowed_top_users": """
WITH agg AS (
  SELECT ((epoch_us(ts) // 3600000000) * 3600000000)::bigint AS window_start,
         user_id::bigint AS user_id, sum(value) AS sv
  FROM events GROUP BY 1, 2),
rk AS (
  SELECT window_start, user_id, sv,
         row_number() OVER (PARTITION BY window_start ORDER BY sv DESC, user_id) AS rn
  FROM agg)
SELECT window_start, user_id, round(sv, 6) AS sum_value
FROM rk WHERE rn <= 2 ORDER BY window_start, sv DESC, user_id
""",
        "quality_classifier": f"""
WITH {_QC_CTES}
SELECT doc_id, p AS quality_prob, (p >= 0.5) AS keep
FROM qprob ORDER BY doc_id
""",
        "nb_lang_classifier": f"""
WITH {_NB_PRED_CTES}
SELECT doc_id, lang AS pred_label, round(score, 6) AS best_score
FROM pred WHERE rn = 1
ORDER BY doc_id
""",
        "nb_confusion": f"""
WITH {_NB_PRED_CTES}
SELECT d.lang AS true_label, p.lang AS pred_label, count(*)::bigint AS n_docs
FROM (SELECT doc_id, lang FROM pred WHERE rn = 1) p
JOIN documents d USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2
""",
        "readability_scores": f"""
WITH tok AS ({_TOK}),
syl AS (
  SELECT doc_id,
         sum(greatest(len(regexp_extract_all(term, '[aeiou]+')), 1))::bigint AS n_syl,
         count(*)::bigint AS n_words
  FROM tok GROUP BY doc_id),
sent AS (
  SELECT doc_id,
         greatest(coalesce(len(regexp_extract_all(text, '[.!?]+')), 0), 1)::bigint AS n_sent
  FROM documents)
SELECT d.doc_id,
       coalesce(s.n_words, 0)::bigint AS n_words,
       sent.n_sent AS n_sentences,
       coalesce(s.n_syl, 0)::bigint AS n_syllables,
       CASE WHEN coalesce(s.n_words, 0) > 0
            THEN round(206.835 - 1.015 * (s.n_words::double / sent.n_sent)
                       - 84.6 * (s.n_syl::double / s.n_words), 6)
            ELSE 0.0 END AS flesch
FROM documents d
LEFT JOIN syl s USING (doc_id)
JOIN sent USING (doc_id)
ORDER BY doc_id
""",
        "token_entropy": f"""
WITH tok AS ({_TOK}),
tf AS (SELECT doc_id, term, count(*)::bigint AS c FROM tok GROUP BY doc_id, term),
n AS (SELECT doc_id, count(*)::bigint AS nt FROM tok GROUP BY doc_id),
h AS (
  SELECT tf.doc_id,
         sum(-(tf.c::double / n.nt) * ln(tf.c::double / n.nt)) AS ent
  FROM tf JOIN n USING (doc_id) GROUP BY tf.doc_id)
SELECT d.doc_id,
       coalesce(n.nt, 0)::bigint AS n_tokens,
       coalesce(round(h.ent, 6), 0.0) AS entropy
FROM documents d LEFT JOIN n USING (doc_id) LEFT JOIN h USING (doc_id)
ORDER BY d.doc_id
""",
        "funnel_steps": """
WITH e1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
e2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN e1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > e1.t1 GROUP BY e.user_id),
e3 AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN e2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > e2.t2 GROUP BY e.user_id),
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
        "next_word_suggest": f"""
WITH ltoks AS ({_TOKS_LIST}),
pairs AS (
  SELECT unnest(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i+1])) AS bg
  FROM ltoks WHERE len(toks) > 1),
cnt AS (
  SELECT string_split(bg, ' ')[2] AS next_word, count(*)::bigint AS n
  FROM pairs WHERE bg LIKE 'scan %' GROUP BY 1)
SELECT next_word, n FROM cnt ORDER BY n DESC, next_word ASC LIMIT 5
""",
        "event_transitions": """
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_type) AS prev
  FROM events)
SELECT prev AS prev_type, event_type AS next_type, count(*)::bigint AS n
FROM s WHERE prev IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
""",
        "retention_cohorts": """
WITH wk AS (
  SELECT user_id, (epoch_us(ts) // 604800000000)::bigint AS w FROM events),
coh AS (SELECT user_id, min(w) AS c FROM wk GROUP BY user_id),
uw AS (SELECT DISTINCT user_id, w FROM wk)
SELECT coh.c AS cohort_week, (uw.w - coh.c)::bigint AS week_offset,
       count(*)::bigint AS n_users
FROM uw JOIN coh USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
""",
        "pack_greedy": """
WITH RECURSIVE tc AS (
  SELECT doc_id, (doc_id % 16)::bigint AS bucket,
         len(list_filter(regexp_split_to_array(lower(text),'[^a-z0-9]+'), x -> x <> ''))::bigint AS n_tokens,
         row_number() OVER (PARTITION BY doc_id % 16 ORDER BY doc_id) AS rn
  FROM documents),
walk AS (
  SELECT bucket, rn, doc_id, n_tokens, 0::bigint AS seq_id, n_tokens AS acc
  FROM tc WHERE rn = 1
  UNION ALL
  SELECT t.bucket, t.rn, t.doc_id, t.n_tokens,
         CASE WHEN w.acc > 0 AND w.acc + t.n_tokens > 256 THEN w.seq_id + 1 ELSE w.seq_id END,
         CASE WHEN w.acc > 0 AND w.acc + t.n_tokens > 256 THEN t.n_tokens ELSE w.acc + t.n_tokens END
  FROM tc t JOIN walk w ON t.bucket = w.bucket AND t.rn = w.rn + 1)
SELECT doc_id, bucket, n_tokens, seq_id FROM walk ORDER BY doc_id
""",
        "decontaminate": f"""
WITH toks AS ({_TOKS_LIST}),
ng AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS ngram
  FROM toks WHERE len(toks) >= 3),
bench AS (SELECT DISTINCT ngram FROM ng WHERE doc_id % 97 = 0),
cnt AS (SELECT ng.doc_id, count(DISTINCT ng.ngram) AS n
        FROM ng JOIN bench USING (ngram) GROUP BY ng.doc_id)
SELECT d.doc_id, coalesce(c.n, 0)::bigint AS n_contaminated,
       coalesce(c.n, 0) > 0 AS contaminated
FROM documents d LEFT JOIN cnt c USING (doc_id) ORDER BY d.doc_id
""",
        "pii_scrub": r"""
WITH injected AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 7 = 0
           THEN ' contact user' || doc_id || '@example.com or +1 (20'
                || (doc_id % 10) || ') 555-01' || lpad((doc_id % 89)::varchar, 2, '0')
           ELSE '' END AS text
  FROM documents),
e AS (
  SELECT doc_id,
         length(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::bigint AS n_emails,
         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS text
  FROM injected),
p AS (
  SELECT doc_id, n_emails,
         length(regexp_extract_all(text, '\+?[0-9][0-9 ()-]{6,}[0-9]'))::bigint AS n_phones,
         regexp_replace(text, '\+?[0-9][0-9 ()-]{6,}[0-9]', '<PHONE>', 'g') AS text
  FROM e)
SELECT doc_id, text, n_emails, n_phones FROM p ORDER BY doc_id
""",
        "repetition_stats": f"""
WITH tok AS ({_TOK}),
tf AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY 1, 2),
agg AS (SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct, max(c) AS max_c
        FROM tf GROUP BY 1)
SELECT d.doc_id,
       coalesce(a.n_tokens, 0)::bigint AS n_tokens,
       coalesce(a.n_distinct, 0)::bigint AS n_distinct_tokens,
       coalesce(round(1.0 - a.n_distinct::double / a.n_tokens, 6), 0.0) AS dup_token_frac,
       coalesce(round(a.max_c::double / a.n_tokens, 6), 0.0) AS top_token_frac
FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id
""",
        "approx_distinct_users": f"""
WITH t AS ({_hll_registers_sql()}),
s AS (SELECT count(*) AS nz, coalesce(sum(power(2.0, -rank)), 0.0) AS snz FROM t),
c AS (SELECT (4096 - nz) AS zeros, (4096 - nz) * 1.0 + snz AS ssum FROM s),
e AS (SELECT zeros, (0.7213 / (1 + 1.079 / 4096.0)) * 4096.0 * 4096.0 / ssum AS est FROM c)
SELECT round(CASE WHEN est <= 2.5 * 4096 AND zeros > 0
             THEN 4096.0 * ln(4096.0 / zeros) ELSE est END, 6) AS approx_distinct
FROM e
""",
        "hash_embed_vectors": f"""
WITH tok AS ({_TOK}),
terms AS (SELECT DISTINCT term FROM tok),
{_term_hash64_sql()},
occ AS (SELECT doc_id, h FROM tok JOIN th USING (term)),
vec AS (SELECT doc_id, (h % 64)::bigint AS dim,
               sum(CASE WHEN h >= 9223372036854775808::hugeint THEN -1.0 ELSE 1.0 END) AS v
        FROM occ GROUP BY 1, 2),
nrm AS (SELECT doc_id, sqrt(sum(v * v)) AS nn FROM vec GROUP BY 1),
emb AS (SELECT vec.doc_id, dim,
               round(CAST(v / CASE WHEN nn = 0 THEN 1 ELSE nn END AS FLOAT)::double, 6) AS val
        FROM vec JOIN nrm USING (doc_id))
SELECT doc_id, dim, val FROM emb WHERE val <> 0.0 ORDER BY doc_id, dim
""",
        "cms_heavy_hitters": _cms_heavy_hitters_sql(k=3),
        "curate_corpus": f"""
WITH tok AS ({_TOK}),
tf AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY 1, 2),
rep AS (SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct FROM tf GROUP BY 1),
s1 AS (
  SELECT d.doc_id, d.text, d.lang, rep.n_tokens
  FROM documents d JOIN rep USING (doc_id)
  WHERE rep.n_tokens >= 15
    AND round(1.0 - rep.n_distinct::double / rep.n_tokens, 6) <= 0.6),
s2 AS (
  SELECT * FROM s1
  WHERE doc_id IN (SELECT min(doc_id) FROM s1 GROUP BY text)),
toksl AS ({_TOKS_LIST}),
ng AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS ngram
  FROM toksl WHERE len(toks) >= 3),
bench AS (SELECT DISTINCT ngram FROM ng WHERE doc_id % 97 = 0),
dirty AS (SELECT DISTINCT ng.doc_id FROM ng JOIN bench USING (ngram)),
s3 AS (SELECT * FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM dirty)),
cnt AS (SELECT lang, count(*) AS c FROM s3 GROUP BY lang),
w(lang, wnum) AS (SELECT * FROM (VALUES ('de', 2), ('en', 3), ('es', 2), ('fr', 1), ('zh', 1))),
thr AS (SELECT cnt.lang,
               least(18446744073709551616::hugeint * {_CURATE_TOTAL} * w.wnum
                       // (9 * cnt.c),
                     18446744073709551615::hugeint) AS t
        FROM cnt JOIN w USING (lang)),
h0 AS (SELECT s3.*, xor(doc_id::ubigint, 11::ubigint)::hugeint AS x0 FROM s3),
h1 AS (SELECT *, ({_mulmod64("xor(x0::ubigint, x0::ubigint >> 30)::hugeint", str(0xBF58476D1CE4E5B9) + "::hugeint")}) AS x1 FROM h0),
h2 AS (SELECT *, ({_mulmod64("xor(x1::ubigint, x1::ubigint >> 27)::hugeint", str(0x94D049BB133111EB) + "::hugeint")}) AS x2 FROM h1),
hf AS (SELECT *, xor(x2::ubigint, x2::ubigint >> 31)::hugeint AS h FROM h2)
SELECT hf.doc_id, hf.lang, hf.n_tokens::bigint AS n_tokens
FROM hf JOIN thr USING (lang)
WHERE hf.h < thr.t ORDER BY hf.doc_id
""",
        "interval_join_views": """
WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
l AS (SELECT * FROM e WHERE event_type = 'purchase'),
r AS (SELECT * FROM e WHERE event_type = 'view')
SELECT l.event_id::bigint AS event_id, l.user_id::bigint AS user_id,
       l.ts_us::bigint AS ts_us,
       r.event_id::bigint AS event_id_right, r.ts_us::bigint AS ts_us_right
FROM l JOIN r ON l.user_id = r.user_id
              AND r.ts_us BETWEEN l.ts_us - 1800000000 AND l.ts_us
ORDER BY l.event_id, r.event_id
""",
        "chunk_documents": f"""
WITH toksl AS ({_TOKS_LIST}),
ch AS (
  SELECT doc_id, toks, len(toks) AS n,
         unnest(range(0, 1 + greatest(len(toks) - 16 + 7, 0) // 8)) AS chunk_id
  FROM toksl WHERE len(toks) > 0),
sel AS (SELECT doc_id, chunk_id, chunk_id * 8 AS st,
               least(chunk_id * 8 + 16, n) AS en, toks FROM ch)
SELECT doc_id, chunk_id::bigint AS chunk_id, st::bigint AS start_token,
       (en - st)::bigint AS n_chunk_tokens,
       array_to_string(toks[st + 1 : en], ' ') AS chunk_text
FROM sel ORDER BY doc_id, chunk_id
""",
        "zscore_by_lang": """
WITH s AS (SELECT lang, avg(n_chars) AS m, stddev_pop(n_chars) AS sd
           FROM documents GROUP BY lang)
SELECT d.doc_id, d.lang, d.n_chars,
       round(CASE WHEN s.sd > 0 THEN (d.n_chars - s.m) / s.sd ELSE 0.0 END, 6) AS z
FROM documents d JOIN s USING (lang) ORDER BY d.doc_id
""",
        "text_knn_hash_embed": f"""
WITH tok AS ({_TOK}),
terms AS (SELECT DISTINCT term FROM tok),
{_term_hash64_sql()},
occ AS (SELECT doc_id, h FROM tok JOIN th USING (term)),
vec AS (SELECT doc_id, (h % 64)::bigint AS dim,
               sum(CASE WHEN h >= 9223372036854775808::hugeint THEN -1.0 ELSE 1.0 END) AS v
        FROM occ GROUP BY 1, 2),
nrm AS (SELECT doc_id, sqrt(sum(v * v)) AS nn FROM vec GROUP BY 1),
emb32 AS (SELECT vec.doc_id, dim,
                 CAST(v / CASE WHEN nn = 0 THEN 1 ELSE nn END AS FLOAT)::double AS val
          FROM vec JOIN nrm USING (doc_id)),
q AS (SELECT * FROM emb32 WHERE doc_id IN (0, 1, 2)),
qn AS (SELECT doc_id AS qid, sqrt(sum(val * val)) AS qnorm FROM q GROUP BY 1),
dn AS (SELECT doc_id, sqrt(sum(val * val)) AS dnorm FROM emb32 GROUP BY 1),
dots AS (SELECT q.doc_id AS qid, e.doc_id AS did, sum(q.val * e.val) AS dot
         FROM q JOIN emb32 e ON q.dim = e.dim GROUP BY 1, 2),
cos AS (SELECT qid, did, dot / (qnorm * dnorm) AS c
        FROM dots JOIN qn USING (qid) JOIN dn ON did = dn.doc_id
        WHERE qnorm > 0 AND dnorm > 0),
rk AS (SELECT qid, did, c,
              row_number() OVER (PARTITION BY qid ORDER BY c DESC, did ASC) AS rn
       FROM cos)
SELECT qid::int AS query_id, rn::int AS rank, did::bigint AS doc_id,
       round(c, 6) AS cos_sim
FROM rk WHERE rn <= 5 ORDER BY query_id, rank
""",
        "phrase_bm25": f"""
WITH tok AS ({_TOK}),
dl AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(doc_len) FROM dl)::double / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
q AS (SELECT unnest(['join','batch','value']) AS term),
scores AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5)/(df.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / stats.avgdl)) ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
  WHERE tf.term IN (SELECT term FROM q)
    AND tf.doc_id IN (SELECT doc_id FROM documents WHERE contains(text, '{LITERAL}'))
  GROUP BY tf.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id, round(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "distinct_users_by_type": _grouped_hll_sql(p=8),
        "hll_set_algebra": _hll_sets_sql(p=8, key_a="view", key_b="click"),
        "bm25_snippets": f"""
WITH {_BM25_SCORES},
topk AS (
  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, round(score, 6) AS score
  FROM scores ORDER BY score DESC, doc_id ASC LIMIT 10),
pos AS (
  SELECT t.rank, t.doc_id, t.score, d.text,
         least(
           CASE WHEN instr(d.text, 'spark') > 0 THEN instr(d.text, 'spark') ELSE 2147483647 END,
           CASE WHEN instr(d.text, 'merge') > 0 THEN instr(d.text, 'merge') ELSE 2147483647 END,
           CASE WHEN instr(d.text, 'join') > 0 THEN instr(d.text, 'join') ELSE 2147483647 END
         ) AS p
  FROM topk t JOIN documents d USING (doc_id))
SELECT rank, doc_id, score,
       CASE WHEN p = 2147483647 THEN ''
            ELSE substr(text, greatest(p - 20, 1), 50) END AS snippet
FROM pos ORDER BY rank
""",
        "running_totals": """
WITH e AS (SELECT event_id, user_id, value, epoch_us(ts) AS ts_us FROM events)
SELECT user_id::bigint AS user_id, event_id::bigint AS event_id,
       row_number() OVER w::bigint AS row_number,
       round(percent_rank() OVER w, 6) AS percent_rank,
       ntile(4) OVER w::bigint AS ntile4,
       round(sum(value) OVER w, 6) AS running_sum,
       lag(value) OVER w AS lag_value
FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY user_id, row_number
""",
        "events_pivot": """
SELECT user_id::bigint AS user_id,
       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::bigint AS n_click,
       sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::bigint AS n_view,
       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::bigint AS n_purchase
FROM events GROUP BY user_id ORDER BY user_id
""",
        "text_near_dup_semantic": f"""
WITH tok AS ({_TOK}),
terms AS (SELECT DISTINCT term FROM tok),
{_term_hash64_sql()},
occ AS (SELECT doc_id, h FROM tok JOIN th USING (term)),
vec AS (SELECT doc_id, (h % 64)::bigint AS dim,
               sum(CASE WHEN h >= 9223372036854775808::hugeint THEN -1.0 ELSE 1.0 END) AS v
        FROM occ GROUP BY 1, 2),
nrm AS (SELECT doc_id, sqrt(sum(v * v)) AS nn FROM vec GROUP BY 1),
emb32 AS (SELECT vec.doc_id, dim,
                 CAST(v / CASE WHEN nn = 0 THEN 1 ELSE nn END AS FLOAT)::double AS val
          FROM vec JOIN nrm USING (doc_id)),
dn AS (SELECT doc_id, sqrt(sum(val * val)) AS dnorm FROM emb32 GROUP BY 1),
dots AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.val * b.val) AS dot
         FROM emb32 a JOIN emb32 b ON a.dim = b.dim AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
cos AS (SELECT id_a, id_b, dot / (x.dnorm * y.dnorm) AS c
        FROM dots JOIN dn x ON id_a = x.doc_id JOIN dn y ON id_b = y.doc_id)
SELECT id_a, id_b, round(c, 6) AS cos_sim FROM cos
WHERE c >= 0.9 ORDER BY id_a, id_b
""",
        "lang_quantiles_hist": """
WITH lohi AS (SELECT lang, min(n_chars)::double AS lo, max(n_chars)::double AS hi,
                     CASE WHEN max(n_chars) - min(n_chars) = 0 THEN 1.0
                          ELSE max(n_chars)::double - min(n_chars)::double END AS w
              FROM documents GROUP BY lang),
bins AS (SELECT d.lang,
                least(floor((d.n_chars::double - lo) / w * 1024)::bigint, 1023) AS bin
         FROM documents d JOIN lohi USING (lang)),
hist AS (SELECT lang, bin, count(*)::bigint AS cnt FROM bins GROUP BY 1, 2),
cum AS (SELECT lang, bin, cnt, sum(cnt) OVER (PARTITION BY lang ORDER BY bin) AS c FROM hist),
n AS (SELECT lang, count(*)::bigint AS n FROM bins GROUP BY lang),
qs AS (SELECT unnest([0.5, 0.9]) AS q),
tgt AS (SELECT lang, q, greatest(1, ceil(q * n)::bigint) AS target FROM n, qs),
hit AS (SELECT t.lang, t.q, t.target, min(c.bin) AS bin
        FROM tgt t JOIN cum c ON c.lang = t.lang AND c.c >= t.target
        GROUP BY 1, 2, 3),
fin AS (SELECT h.lang, h.q, h.bin, h.target,
               coalesce((SELECT max(c2.c) FROM cum c2
                         WHERE c2.lang = h.lang AND c2.bin < h.bin), 0) AS prev,
               (SELECT cnt FROM hist WHERE lang = h.lang AND bin = h.bin) AS cnt
        FROM hit h)
SELECT f.lang, q::double AS q,
       lo + (bin + (target - prev)::double / greatest(cnt, 1)) * w / 1024 AS value
FROM fin f JOIN lohi USING (lang) ORDER BY f.lang, q
""",
        "training_shuffle_rank": f"""
WITH {_splitmix_docs_ctes(7)}
SELECT doc_id::bigint AS doc_id,
       (row_number() OVER (ORDER BY h, doc_id) - 1)::bigint AS shuffle_rank
FROM hf ORDER BY doc_id
""",
    }
