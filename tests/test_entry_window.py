"""Pin the driver's 50-query correctness window and registry hygiene.

The driver's correctness harness checks only the FIRST 50 entries of
``queries()`` (insertion order), and a plain dict literal silently
drops duplicate keys (last binding wins) — both hazards were actually
hit during round 3 (CLAUDE.md).  This test makes either mutation a
hard failure:

* ``list(queries())[:50]`` must equal the frozen gate list recorded in
  ``CORRECTNESS_r03.json`` (every SURVEY §2-mapped operator + the
  flagship LLM-pipeline compositions).
* AST-parse the *defining source* of ``queries()`` / ``oracle_sql()``
  (via ``inspect.getsource``, so the check survives moving the dicts
  into a package) and assert no duplicate string keys anywhere in the
  returned dict literals.
* ``oracle_sql()`` keys ⊆ ``queries()`` keys — an oracle with no
  matching query is dead weight; a typo'd key silently un-gates.
"""

import ast
import inspect

import pytest

import __ray_entry__ as E

# Frozen driver window — the exact 50 keys CORRECTNESS_r03 gated on.
# Changing this list is a deliberate act (re-freeze only when the
# round's driver output confirms the new window), never a side effect.
DRIVER_WINDOW = [
    "bm25_topk", "bm25_top2_per_source", "bm25_filtered", "bm25_prior",
    "bm25_page2", "bm25_snippets", "bm25_multi", "phrase_bm25",
    "grep_literal", "trigram_candidates", "positional_match_count",
    "proximity_search", "regex_search", "filter_ignored", "term_df",
    "corpus_stats", "lang_stats", "latest_version_per_source",
    "latest_event_per_user", "bm25_anchor_topk", "bm25_pagerank_prior",
    "link_pagerank", "personalized_pagerank", "host_rank_mass",
    "link_hits", "cocitation_topk", "coupling_topk", "curate_corpus",
    "curate_web_corpus", "fuzzy_dedup_keep", "dedup_exact",
    "minhash_pairs", "jaccard_verified_pairs", "connected_components",
    "cross_snapshot_dedup", "simhash_signatures", "simhash_pairs",
    "ngram_jaccard_pairs", "duplicate_tile_spans",
    "text_near_dup_semantic", "remove_boilerplate", "paragraph_dedup",
    "knn_cosine", "knn_cosine_lsh", "knn_cosine_ivf",
    "lsh_bucket_assignment", "ivf_list_assignment",
    "embedding_near_dup", "embedding_near_dup_lsh",
    "hash_embed_vectors",
]


def _dict_string_keys(fn):
    """All string keys of every dict literal in fn's source, in order.

    Includes dict literals merged via ** / update so a refactor that
    builds the registry from parts still gets duplicate detection.
    """
    src = inspect.getsource(fn)
    tree = ast.parse(__import__("textwrap").dedent(src))
    keys = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Dict):
            for k in node.keys:
                if isinstance(k, ast.Constant) and isinstance(k.value, str):
                    keys.append(k.value)
    return keys


def test_driver_window_first_50_frozen():
    keys = list(E.queries())
    assert len(DRIVER_WINDOW) == 50
    assert keys[:50] == DRIVER_WINDOW, (
        "the driver's 50-query window moved: first mismatch at index "
        + str(next(i for i, (a, b) in enumerate(zip(keys, DRIVER_WINDOW)) if a != b))
    )
    assert keys[49] == "hash_embed_vectors"


def test_queries_keys_unique_at_ast_level():
    keys = _dict_string_keys(E.queries)
    dups = sorted({k for k in keys if keys.count(k) > 1})
    assert not dups, f"duplicate queries() keys (last wins, first silently dead): {dups}"
    # AST keys must cover the runtime registry: if queries() ever builds
    # its dict dynamically (comprehension over names), this guard stops
    # protecting and must be redesigned rather than silently passing.
    runtime = set(E.queries())
    assert runtime <= set(keys), sorted(runtime - set(keys))[:5]


def test_oracle_keys_unique_and_subset():
    # oracle_sql() merges per-module part dicts (entry/oracle.py) —
    # walk each part's dict literal for duplicates, then check the
    # merge saw no cross-part overlap (oracle_sql raises on overlap,
    # so a clean call already proves it) and key coverage.
    okeys = []
    for part in E.ORACLE_PARTS:
        pk = _dict_string_keys(part)
        dups = sorted({k for k in pk if pk.count(k) > 1})
        assert not dups, f"duplicate keys in {part.__name__}: {dups}"
        okeys.extend(pk)
    o = E.oracle_sql()
    assert set(o) <= set(okeys), sorted(set(o) - set(okeys))[:5]
    q = set(E.queries())
    assert set(o) <= q, f"oracles without a matching query: {sorted(set(o) - q)}"


def test_registry_sizes_do_not_shrink():
    # Ratchet: operators are added, never silently lost.
    q = E.queries()
    o = E.oracle_sql()
    assert len(q) >= 365, len(q)
    assert len(o) >= 362, len(o)
