"""Worst-case-linear regex engine (Pike VM) — differential vs ``re``,
pathological-pattern completion, and RegexGrepper integration with
zero bailed-out docs (the round-3 VERDICT done-criterion)."""

import random
import re
import time

import pyarrow as pa
import pytest

from dcs_ray.nfa import Unsupported, compile_nfa


def spans(p, s, f=0):
    return [(m.start(), m.end()) for m in re.compile(p, f).finditer(s)]


CASES = [
    (r"abc", "xxabcxxabc"), (r"a+", "aaabaaa"), (r"a+?", "aaab"),
    (r"(a|b)+c", "ababc xac bc"), (r"[a-f]{2,3}", "abcdefg"),
    (r"^foo", "foo\nbar\nfoo"), (r"foo$", "a foo\nfoo"),
    (r"\bword\b", "word sword words word"), (r"\d+\.\d+", "pi=3.14 e=2.718"),
    (r"colou?r", "color colour colr"), (r".*", "ab\ncd"), (r"", "abc"),
    (r"(ab)*", "ababab xx"), (r"x|", "xy"), (r"[^a-z]+", "ab12CD!x"),
    (r"\w+@\w+", "mail me a@b or c@d"), (r"a{3}", "aaaa"),
    (r"(?i)HeLLo", "hello HELLO hullo"), (r"ab|abc", "abcabc"),
    (r"(a+)(b+)", "aabbb ab"), (r"\s+", "a  b\t\nc"),
    (r"foo(?:bar)?", "foo foobar"), (r"^$", ""), (r"a.c", "abc a\nc axc"),
    (r"(a|aa)+b", "aaab"), (r"x*y*z*", "xyzzy"), (r"(a*)*b", "aab"),
    (r"(x?)*y", "xxy"), (r"a*", "ba"), (r".*?", "abc"),
]


@pytest.mark.parametrize("pat,s", CASES)
def test_differential_vs_re(pat, s):
    assert list(compile_nfa(pat).finditer(s)) == spans(pat, s)


@pytest.mark.parametrize(
    "pat,s,flags",
    [(r"^b", "a\nb", re.M), (r"a$", "a\nb a", re.M), (r"a.b", "a\nb", re.S),
     (r"\d+", "x\u00b2 5\u0660", 0), (r"\d+", "5\u0660", re.ASCII),
     (r"\w+", "a\u00e9b", re.ASCII), (r"\bfoo\b", "\u00e9foo foo", re.ASCII)],
)
def test_flags(pat, s, flags):
    assert list(compile_nfa(pat, flags).finditer(s)) == spans(pat, s, flags)


def test_pathological_patterns_linear():
    # the canonical exponential-backtracking killers complete instantly
    t0 = time.monotonic()
    assert list(compile_nfa(r"(a+)+$").finditer("a" * 5000 + "b")) == []
    assert list(compile_nfa(r"(a|a)+$").finditer("a" * 2000 + "b")) == []
    got = list(compile_nfa(r"(a*)*$").finditer("a" * 2000 + "b"))
    assert got == [(2001, 2001)]
    assert time.monotonic() - t0 < 5.0


def test_unsupported_constructs_raise():
    for p in (r"(a)\1", r"(?=x)a", r"(?<!y)b", r"a{1,999}", r"(?>ab)",
              r"(.??)*c", r"(|a)*b"):
        with pytest.raises(Unsupported):
            compile_nfa(p)


def test_fuzz_differential():
    random.seed(1234)
    atoms = ["a", "b", "c", "ab", "x", ".", "[ab]", "[^ab]", r"\d", r"\w",
             r"\s", "[a-c]"]

    def rp(d=0):
        r = random.random()
        if d > 3 or r < 0.4:
            return random.choice(atoms)
        if r < 0.55:
            return rp(d + 1) + rp(d + 1)
        if r < 0.7:
            return "(?:" + rp(d + 1) + "|" + rp(d + 1) + ")"
        if r < 0.8:
            return "(" + rp(d + 1) + ")" + random.choice(
                ["*", "+", "?", "{1,3}", "{2}"])
        if r < 0.9:
            return rp(d + 1) + random.choice(["*", "+", "?", "*?", "+?", "??"])
        return random.choice(["^", ""]) + rp(d + 1) + random.choice(["$", ""])

    alpha = "abcx 1\n_\u00b2\u0660\u00e9"  # incl. isdigit-not-Nd ², Nd ٠, é
    compared = 0
    for _ in range(1500):
        p = rp()
        try:
            rx = re.compile(p)
        except re.error:
            continue
        try:
            prog = compile_nfa(p)
        except Unsupported:
            continue
        s = "".join(random.choice(alpha) for _ in range(random.randint(0, 40)))
        assert list(prog.finditer(s)) == [
            (m.start(), m.end()) for m in rx.finditer(s)
        ], (p, s)
        compared += 1
    assert compared > 800  # the generator mostly yields supported patterns


def test_grepper_pathological_zero_bailouts():
    """A hostile pattern over real doc batches completes with ZERO
    sentinel (line=-1) rows — the budget bail-out is gone for every
    NFA-expressible pattern."""
    from dcs_ray.grep import RegexGrepper

    texts = ["x\n" + "a" * 4000 + "b\ny", "a" * 3000 + "b", "aaab\naaa"]
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    g = RegexGrepper(r"(a+)+$", match_timeout=0.05)
    t0 = time.monotonic()
    out = g(batch)
    assert time.monotonic() - t0 < 30
    assert (out["line"].to_pylist().count(-1)) == 0
    # doc 2 line 2 "aaa" matches (a+)+$ ; docs 0/1 have no EOL-anchored run
    assert set(zip(out["doc_id"].to_pylist(), out["line"].to_pylist())) == {(2, 2)}


def test_grepper_nfa_engine_matches_re_engine():
    from dcs_ray.grep import RegexGrepper

    texts = [
        "import spark\nspark merge join\nx = 1\n",
        "no matches here\n",
        "sparkspark\nSPARK\nspark",
    ]
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    for pat in (r"spark", r"spa\w+", r"^spark", r"spark$"):
        a = RegexGrepper(pat)(batch)
        b = RegexGrepper(pat, engine="nfa")(batch)
        assert a.equals(b), pat
