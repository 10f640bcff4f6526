"""S-stemmer: rule/exception coverage, dictionary-level stemming in the
text pass, stemmed df conflation, and an e2e stemmed-field index search
(plural query hits singular docs and vice versa)."""

import pyarrow as pa
import ray.data

from dcs_ray.functions.stem import s_stem_array, stem_text, stemmed_term_df


def test_s_stem_rules_and_exceptions():
    cases = {
        # rule 1: ies -> y (len >= 4)
        "queries": "query", "flies": "fly", "ies": "ie",
        # rule 1 exceptions terminate (no fall-through to rule 2/3)
        "aies": "aies", "eies": "eies",
        # rule 2: es -> e, exceptions aes/ees/oes terminate
        "makes": "make", "axes": "axe",
        "goes": "goes", "trees": "trees", "aes": "aes",
        # rule 3: s -> '', exceptions us/ss
        "runs": "run", "bus": "bus", "less": "less", "class": "class",
        # too short / no suffix ('es' itself is len 2 < 3: unchanged)
        "is": "is", "es": "es", "a": "a", "merge": "merge",
    }
    w = pa.array(list(cases))
    got = s_stem_array(w).to_pylist()
    assert got == list(cases.values())


def test_stem_text_and_df_conflation():
    texts = ["Queries and query run!", "runs RUNS run", ""]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(3), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ).repartition(2)
    stemmed = pa.concat_tables(
        pa.table(b) for b in stem_text(ds).iter_batches(batch_format="pyarrow")
    ).sort_by("doc_id")
    assert stemmed["text"].to_pylist() == [
        "query and query run", "run run run", ""
    ]
    out = stemmed_term_df(ds)
    rows = dict(zip(out["term"].to_pylist(), out["df"].to_pylist()))
    # 'queries'+'query' conflate inside doc 0 -> df 1; 'run(s)' df 2
    assert rows["query"] == 1 and rows["run"] == 2 and "queries" not in rows
    # output sorted by term
    assert out["term"].to_pylist() == sorted(out["term"].to_pylist())


def test_stemmed_field_search_e2e(tmp_path):
    """Build an index over the stemmed text; a stemmed query term
    matches docs that contained only the plural (and vice versa)."""
    from dcs_ray.index import IndexConfig, build_index
    from dcs_ray.search import search_bm25

    texts = [
        "databases store tables",       # plural-only doc
        "a database stores one table",  # singular doc
        "unrelated words here",
    ]
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(3), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )
    idx = str(tmp_path / "stemidx")
    build_index(
        stem_text(docs), idx,
        IndexConfig(num_partitions=2, num_shards=1, mode="words",
                    id_col="doc_id", dedup_latest=False),
    )
    # query analyzed through the SAME stemmer: 'databases' -> 'database'
    q = " ".join(s_stem_array(pa.array(["databases", "tables"])).to_pylist())
    hits = search_bm25(idx, [q], k=10)
    got = sorted(hits["doc_id"].to_pylist())
    assert got == [0, 1]  # both plural and singular docs match
