"""Property fuzz of the user-query parser: any string parses without
crashing, the plan's pieces cover the input's word tokens, and
reassembling a canonical query re-parses to the same plan."""

from hypothesis import given, settings
from hypothesis import strategies as st

from dcs_ray.queryplan import parse_user_query

KEYS = ("terms", "phrases", "neg_phrases", "req_terms", "neg_terms",
        "includes", "negates")


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=120))
def test_parse_never_crashes_and_shape_stable(q):
    p = parse_user_query(q)
    assert set(p) == set(KEYS)
    for k in ("terms", "phrases", "neg_phrases", "req_terms", "neg_terms"):
        assert isinstance(p[k], list)
        assert all(isinstance(x, str) and x for x in p[k])
    for k in ("includes", "negates"):
        assert isinstance(p[k], dict)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.from_regex(r"[a-z]{1,8}", fullmatch=True), max_size=4),
    st.lists(st.from_regex(r"[a-z]{1,6}( [a-z]{1,6})?", fullmatch=True), max_size=2),
    st.lists(st.from_regex(r"[a-z]{1,8}", fullmatch=True), max_size=3),
)
def test_canonical_roundtrip(terms, phrases, negs):
    q = " ".join(
        terms
        + [f'"{p}"' for p in phrases]
        + [f"-{t}" for t in negs]
    )
    p = parse_user_query(q)
    assert p["terms"] == terms
    assert p["phrases"] == phrases
    assert p["neg_terms"] == negs
