"""Salted groupby-term shuffle build (A1 literal shape) must produce the
same posting lists as the default per-partition build."""

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data

from dcs_ray.codec import decode_postings
from dcs_ray.index import IndexConfig
from dcs_ray.index.term_shuffle import build_postings_term_shuffle
from dcs_ray.tokenize import tokenize_batch_words_grouped

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def shuffled():
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    conf = IndexConfig(num_partitions=4, num_shards=1, mode="words", id_col="doc_id",
                       dedup_latest=False)
    # low threshold so salting actually engages on this tiny corpus
    return build_postings_term_shuffle(docs, conf, hot_df_threshold=50, salt_factor=4)


def reference_postings():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = t["doc_id"].to_numpy().astype(np.uint64)
    order = np.argsort(ids)
    t = t.take(order)
    uniq, offs, p_doc, p_tf, _ = tokenize_batch_words_grouped(
        t["text"], ids[order]
    )
    out = {}
    terms = uniq.to_pylist()
    for i, term in enumerate(terms):
        lo, hi = offs[i], offs[i + 1]
        out[term] = (p_doc[lo:hi], p_tf[lo:hi])
    return out


def test_term_shuffle_matches_direct(shuffled):
    want = reference_postings()
    got_terms = shuffled["term"].to_pylist()
    assert sorted(got_terms) == sorted(want)
    for i, term in enumerate(got_terms):
        d, tf = decode_postings(shuffled["blob"][i].as_py())
        wd, wtf = want[term]
        np.testing.assert_array_equal(d, wd, err_msg=term)
        np.testing.assert_array_equal(tf, wtf, err_msg=term)
        assert shuffled["df"][i].as_py() == len(wd)


def test_hot_terms_were_salted(shuffled):
    # at threshold 50 on 500 docs, stop-words like "the" must have df > 50,
    # proving the salted path ran through the two-level merge
    df = dict(zip(shuffled["term"].to_pylist(), shuffled["df"].to_pylist()))
    assert df.get("the", 0) > 50
