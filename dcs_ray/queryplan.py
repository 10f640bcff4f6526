"""Regexp → trigram query compiler (F6) and query keyword rewrite (F4).

Computes, for a regular expression, an AND/OR tree over trigrams such
that every document matching the regex contains a satisfying trigram
set — the candidate-generation planner of dcs
(``internal/index/regexp.go:22-35,333-380,420-712``), which itself
follows Russ Cox's public trigram-index construction
("Regular Expression Matching with a Trigram Index", swtch.com, and the
google/codesearch index/regexp.go design): per subexpression track
(emptyable, exact-set, prefix-set, suffix-set, match-query) with set
size caps and boolean simplification.

Pure driver-side Python — planning happens once per query, evaluation
fans out to shards (``search.search_literal`` / ``eval_query``).
"""

from __future__ import annotations

import re as _re
import sre_parse
from dataclasses import dataclass, field

# ops
ALL = "ALL"  # matches any document (no filtering possible)
NONE = "NONE"  # matches nothing
AND = "AND"
OR = "OR"

MAX_SET = 20  # cap on exact/prefix/suffix set sizes (codesearch's maxSet)
MAX_STR = 6  # cap on tracked string length


@dataclass
class Query:
    op: str
    trigram: frozenset[str] = frozenset()
    sub: tuple["Query", ...] = ()

    def __repr__(self) -> str:
        if self.op in (ALL, NONE):
            return self.op
        parts = [repr(s) for s in self.sub] + sorted(self.trigram)
        joiner = " " if self.op == AND else "|"
        return "(" + joiner.join(parts) + ")"


Q_ALL = Query(ALL)
Q_NONE = Query(NONE)


def _trigram_and(q: Query, trigrams: frozenset[str]) -> Query:
    if not trigrams:
        return q
    return q_and(q, Query(AND, trigram=trigrams))


def q_and(a: Query, b: Query) -> Query:
    if a.op == NONE or b.op == NONE:
        return Q_NONE
    if a.op == ALL:
        return b
    if b.op == ALL:
        return a
    if a.op == AND and b.op == AND:
        return Query(AND, a.trigram | b.trigram, a.sub + b.sub)
    if a.op == AND and not b.sub and b.op == OR and len(b.trigram) == 1:
        return Query(AND, a.trigram | b.trigram, a.sub)
    if a.op == AND:
        return Query(AND, a.trigram, a.sub + (b,))
    if b.op == AND:
        return Query(AND, b.trigram, b.sub + (a,))
    return Query(AND, frozenset(), (a, b))


def q_or(a: Query, b: Query) -> Query:
    if a.op == ALL or b.op == ALL:
        return Q_ALL
    if a.op == NONE:
        return b
    if b.op == NONE:
        return a
    if a.op == OR and b.op == OR:
        return Query(OR, a.trigram | b.trigram, a.sub + b.sub)
    if a.op == OR:
        return Query(OR, a.trigram, a.sub + (b,))
    if b.op == OR:
        return Query(OR, b.trigram, b.sub + (a,))
    return Query(OR, frozenset(), (a, b))


def _trigrams_of(s: str) -> frozenset[str] | None:
    """AND of the trigrams of one string; None if string shorter than 3."""
    if len(s) < 3:
        return None
    return frozenset(s[i : i + 3] for i in range(len(s) - 2))


def _match_of_set(strs: set[str]) -> Query:
    """OR over strings of (AND over each string's trigrams)."""
    q = Q_NONE
    for s in strs:
        t = _trigrams_of(s)
        if t is None:
            return Q_ALL  # a too-short alternative can't be filtered
        q = q_or(q, Query(AND, t))
    return q


@dataclass
class _Info:
    emptyable: bool
    exact: set[str] | None  # None = unknown/unbounded
    prefix: set[str] = field(default_factory=lambda: {""})
    suffix: set[str] = field(default_factory=lambda: {""})
    match: Query = field(default_factory=lambda: Q_ALL)


def _cross(a: set[str], b: set[str]) -> set[str]:
    return {x + y for x in a for y in b}


def _clamp(strs: set[str], keep_prefix: bool) -> tuple[set[str], bool]:
    """Cap set size / string length; returns (clamped, was_clamped).

    Over-large sets are reduced by TRUNCATING string length until the
    set collapses under the cap (codesearch's ``simplifySet``), never by
    dropping members: shorter prefixes/suffixes constrain candidates
    less (conservative — a superset of matches survives), while dropping
    an OR-alternative would silently exclude the documents that only it
    covers."""

    def cut(ss: set[str], n: int) -> set[str]:
        return {(s[:n] if keep_prefix else s[-n:]) for s in ss}

    clamped = False
    out = strs
    if any(len(s) > MAX_STR for s in out):
        out = cut(out, MAX_STR)
        clamped = True
    n = MAX_STR
    while len(out) > MAX_SET and n > 1:
        n -= 1
        out = cut(out, n)
        clamped = True
    if len(out) > MAX_SET:
        out = {""}
        clamped = True
    return out, clamped


def _literal(ch: str) -> _Info:
    return _Info(emptyable=False, exact={ch})


def _empty() -> _Info:
    return _Info(emptyable=True, exact={""})


def _any_char() -> _Info:
    return _Info(emptyable=False, exact=None, match=Q_ALL)


def _concat(a: _Info, b: _Info) -> _Info:
    match = q_and(a.match, b.match)
    if a.exact is not None and b.exact is not None:
        exact = _cross(a.exact, b.exact)
        if len(exact) <= MAX_SET and all(len(s) <= MAX_STR * 2 for s in exact):
            return _Info(emptyable=a.emptyable and b.emptyable, exact=exact, match=match)
    # fold cross-boundary trigrams: suffix(a) × prefix(b)
    sa = a.exact if a.exact is not None else a.suffix
    pb = b.exact if b.exact is not None else b.prefix
    cross = _cross(sa, pb)
    cross, _ = _clamp(cross, True)
    cross_q = _match_of_set({s for s in cross if len(s) >= 3})
    if cross_q.op != NONE and cross_q.op != ALL:
        match = q_and(match, cross_q)

    if a.exact is not None:
        prefix = _cross(a.exact, b.prefix)
    else:
        prefix = a.prefix | b.prefix if a.emptyable else a.prefix
    if b.exact is not None:
        suffix = _cross(a.suffix, b.exact)
    else:
        suffix = b.suffix | a.suffix if b.emptyable else b.suffix
    prefix, _ = _clamp(prefix, True)
    suffix, _ = _clamp(suffix, False)
    return _Info(
        emptyable=a.emptyable and b.emptyable,
        exact=None,
        prefix=prefix,
        suffix=suffix,
        match=match,
    )


def _alternate(a: _Info, b: _Info) -> _Info:
    exact = None
    if a.exact is not None and b.exact is not None:
        u = a.exact | b.exact
        if len(u) <= MAX_SET:
            exact = u
    prefix, _ = _clamp((a.exact or a.prefix) | (b.exact or b.prefix), True)
    suffix, _ = _clamp((a.exact or a.suffix) | (b.exact or b.suffix), False)
    return _Info(
        emptyable=a.emptyable or b.emptyable,
        exact=exact,
        prefix=prefix,
        suffix=suffix,
        match=q_or(a.match, b.match),
    )


def _star(a: _Info) -> _Info:
    return _Info(emptyable=True, exact=None, prefix={""}, suffix={""}, match=Q_ALL)


def _plus(a: _Info) -> _Info:
    return _Info(
        emptyable=a.emptyable,
        exact=None,
        prefix=a.exact or a.prefix,
        suffix=a.exact or a.suffix,
        match=a.match,
    )


def _quest(a: _Info) -> _Info:
    return _alternate(a, _empty())


def _finalize(info: _Info) -> Query:
    match = info.match
    if info.exact is not None:
        match = q_and(match, _match_of_set(info.exact))
    return match


_MAX_CLASS = 10  # char classes larger than this → treated as any-char


def _fold_chars(chars: list[str]) -> list[str]:
    """Case-fold a char list (IGNORECASE): every char contributes both
    cases, order-preserving, deduped."""
    out: list[str] = []
    for c in chars:
        for v in (c.lower(), c.upper()):
            if v not in out:
                out.append(v)
    return out


def _info_of_node(node, fold: bool = False) -> _Info:
    op, av = node
    name = str(op).lower()
    if name == "literal":
        c = chr(av)
        if fold and c.lower() != c.upper():
            return _alternate(_literal(c.lower()), _literal(c.upper()))
        return _literal(c)
    if name == "not_literal":
        return _any_char()
    if name == "any":
        return _any_char()
    if name == "in":
        chars = []
        ok = True
        for kind, val in av:
            kname = str(kind).lower()
            if kname == "literal":
                chars.append(chr(val))
            elif kname == "range":
                lo, hi = val
                if hi - lo + 1 > _MAX_CLASS:
                    ok = False
                    break
                chars.extend(chr(c) for c in range(lo, hi + 1))
            else:
                ok = False
                break
        if fold and ok:
            chars = _fold_chars(chars)
        if not ok or not chars or len(chars) > _MAX_CLASS:
            return _any_char()
        info = _literal(chars[0])
        for c in chars[1:]:
            info = _alternate(info, _literal(c))
        return info
    if name == "branch":
        infos = [_info_of_seq(alt, fold) for alt in av[1]]
        out = infos[0]
        for i in infos[1:]:
            out = _alternate(out, i)
        return out
    if name == "subpattern":
        import re as _re

        _group, _add, _del = av[0], av[1], av[2]
        inner_fold = (fold or bool(_add & _re.IGNORECASE)) and not bool(
            _del & _re.IGNORECASE
        )
        return _info_of_seq(av[3], inner_fold)
    if name == "max_repeat" or name == "min_repeat":
        lo, hi, seq = av
        inner = _info_of_seq(seq, fold)
        if lo == 0 and (hi is sre_parse.MAXREPEAT or hi == 0):
            return _star(inner)
        if lo == 0:
            return _quest(inner) if hi == 1 else _star(inner)
        if lo >= 1 and hi is sre_parse.MAXREPEAT:
            return _plus(inner)
        # bounded {m,n}: concat m copies, rest optional — approximate with m copies
        out = inner
        for _ in range(lo - 1):
            out = _concat(out, inner)
        if hi != lo:
            out = _concat(out, _star(inner))
        return out
    if name in ("at", "assert", "assert_not", "category"):
        return _empty()
    return _any_char()


def _info_of_seq(seq, fold: bool = False) -> _Info:
    info = _empty()
    for node in seq:
        info = _concat(info, _info_of_node(node, fold))
    return info


def regexp_query(pattern: str) -> Query:
    """Trigram query for a regex: every matching document satisfies it
    (``internal/index/regexp.go:22-35`` RegexpQuery)."""
    import re as _re

    try:
        parsed = sre_parse.parse(pattern)
    except Exception:
        return Q_ALL
    # global (?i): literals must candidate-match BOTH cases — dcs folds
    # case in its RE2 parse (regexp.go FoldCase); missing this makes the
    # trigram restriction drop upper-case matches entirely
    fold = bool(parsed.state.flags & _re.IGNORECASE)
    info = _info_of_seq(parsed, fold)
    if info.emptyable:
        return Q_ALL
    return _finalize(info)


def eval_query(q: Query, lookup) -> "object":
    """Evaluate a trigram Query against a shard.

    ``lookup(trigram_str) -> sorted np.uint64 docid array``. Returns the
    candidate docid array, or the string "all" when unfilterable.
    AND = sorted intersection (J1), OR = sorted union (J2),
    ``internal/index/query.go:118-227``."""
    import numpy as np

    if q.op == ALL:
        return "all"
    if q.op == NONE:
        return np.empty(0, np.uint64)
    parts = []
    for t in sorted(q.trigram):
        parts.append(lookup(t))
    for s in q.sub:
        r = eval_query(s, lookup)
        parts.append(r)
    if q.op == AND:
        concrete = [p for p in parts if not isinstance(p, str)]
        if not concrete:
            return "all"
        out = concrete[0]
        for p in concrete[1:]:
            out = np.intersect1d(out, p, assume_unique=True)
        return out
    # OR: any "all" part makes it all
    if any(isinstance(p, str) for p in parts):
        return "all"
    out = parts[0]
    for p in parts[1:]:
        out = np.union1d(out, p)
    return out


# ---------------------------------------------------------------------------
# query keyword rewrite (F4, cmd/dcs-web/search/query-rewrite.go:15-59)
# ---------------------------------------------------------------------------

_KEYWORDS = ("filetype", "package", "pkg", "path", "file", "lang", "site", "source")


_PHRASE_RE = _re.compile(r'([+-]?)"([^"]*)"')


def parse_user_query(q: str) -> dict:
    """Parse the full dcs-web query grammar into a structured plan:
    ``terms "exact phrase" -"negated phrase" +required -negterm
    key:value -key:value`` → ``{"terms", "phrases", "neg_phrases",
    "req_terms", "neg_terms", "includes", "negates"}``.

    Quoted spans become exact-phrase constraints (dcs treats the whole
    query as one regex; phrases are its literal-string case,
    ``regexp/regexp.go`` literal planning) and ``-"..."`` excludes the
    phrase; ``+term`` requires posting membership without changing the
    scoring terms, ``-term`` negates a plain term (``query-rewrite.go``
    strips ``-key:value``; bare ``-term`` is the posting-NOT operator),
    and ``key:value`` keywords route through :func:`rewrite_query`
    (F4)."""
    phrases: list[str] = []
    neg_phrases: list[str] = []
    for sign, body in _PHRASE_RE.findall(q):
        body = body.strip()
        if body:
            (neg_phrases if sign == "-" else phrases).append(body)
    rest = _PHRASE_RE.sub(" ", q)
    rest, includes, negates = rewrite_query(rest)
    terms: list[str] = []
    neg_terms: list[str] = []
    req_terms: list[str] = []
    for tok in rest.split():
        if tok.startswith("-") and len(tok) > 1:
            neg_terms.append(tok[1:])
        elif tok.startswith("+") and len(tok) > 1:
            req_terms.append(tok[1:])
        elif tok not in ("-", "+"):
            terms.append(tok)
    return {
        "terms": terms,
        "phrases": phrases,
        "neg_phrases": neg_phrases,
        "req_terms": req_terms,
        "neg_terms": neg_terms,
        "includes": includes,
        "negates": negates,
    }


def rewrite_query(q: str) -> tuple[str, dict[str, list[str]], dict[str, list[str]]]:
    """Pull ``key:value`` and negated ``-key:value`` tokens off the query.

    Returns (remaining query, filters, negative filters). Mirrors dcs's
    RewriteQuery: keywords are stripped from either end of the query
    string; ``filetype:``/``lang:`` values are lowercased."""
    filters: dict[str, list[str]] = {}
    negates: dict[str, list[str]] = {}
    tokens = q.split()
    rest: list[str] = []
    for tok in tokens:
        neg = tok.startswith("-")
        body = tok[1:] if neg else tok
        m = _re.match(r"^(%s):(.+)$" % "|".join(_KEYWORDS), body)
        if m:
            key, val = m.group(1), m.group(2)
            if key in ("filetype", "lang"):
                val = val.lower()
            (negates if neg else filters).setdefault(key, []).append(val)
        else:
            rest.append(tok)
    return " ".join(rest), filters, negates
