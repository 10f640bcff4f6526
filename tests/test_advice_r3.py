"""Round-3 ADVICE items: error paths that used to fail silently."""

import numpy as np
import pyarrow as pa
import pytest


def test_prior_col_rejects_incompatible_method(tmp_path):
    from dcs_ray.search import search_bm25

    for m in ("bm25plus", "bmw"):
        with pytest.raises(ValueError, match="prior_col"):
            search_bm25(str(tmp_path), ["x"], method=m, prior_col="prior")


def test_dust_strip_param_rejects_regex_metachars():
    from dcs_ray.functions.dust import _strip_param

    urls = pa.array(["http://h/p?aXb=1&id=2"])
    with pytest.raises(ValueError, match="dust param key"):
        _strip_param(urls, "a.b")
    with pytest.raises(ValueError, match="dust param key"):
        _strip_param(urls, "id+")
    # valid keys untouched
    out = _strip_param(urls, "id").to_pylist()
    assert out == ["http://h/p?aXb=1"]


def test_ring_positions_vnode_cap():
    from dcs_ray.functions.ring import ring_positions

    with pytest.raises(ValueError, match="vnodes"):
        ring_positions([0, 1], vnodes=1025)
    pos, ns = ring_positions([0, 1], vnodes=1024)
    assert len(np.unique(pos)) == len(pos)  # no cross-node aliasing


def test_prospective_rejects_empty_query():
    from dcs_ray.functions.prospective import compile_queries

    with pytest.raises(ValueError, match="at least one term"):
        compile_queries([["a", "b"], []])
