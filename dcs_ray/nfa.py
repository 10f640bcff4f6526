"""Worst-case-linear regex engine: a priority-ordered Thompson-NFA
simulation (Pike VM) over Python's own parse tree.

The reference greps candidates with an RE2-style automaton whose match
time is guaranteed linear (``regexp/regexp.go:17`` — "NOT SAFE" refers
to the backtracking alternative — and ``regexp/match.go:421-560``).
Python's ``re`` backtracks and can go exponential on hostile patterns
(``(a+)+$``), so the grep verifier used a per-doc wall budget with a
counted bail-out.  This module removes the bail-out: patterns compile
through ``re._parser`` (so syntax/semantics stay Python's) into a small
instruction program executed by a Pike VM — every step deduplicates
states, so a scan is O(len(text) × program_size) no matter the pattern.

Semantics: leftmost-first (Perl/Python) match spans — thread priority
order reproduces greedy/lazy preference without backtracking, the same
way RE2 mimics PCRE.  ``finditer`` yields non-overlapping ``(start,
end)`` spans with Python's empty-match advance rule.

Unsupported constructs (backreferences, lookaround, conditionals, huge
counted repeats) raise :class:`Unsupported` at compile time — callers
keep the budgeted backtracker for those.
"""

from __future__ import annotations

import re
import sys

try:  # Python 3.11+
    import re._constants as _C
    import re._parser as _P
except ImportError:  # pragma: no cover - 3.10 fallback
    import sre_constants as _C
    import sre_parse as _P

MAXREPEAT = _C.MAXREPEAT
_MAX_EXPAND = 256  # counted-repeat expansion cap (program-size guard)

# instruction opcodes
CHAR, SPLIT, JMP, MATCH, EMPTY = 0, 1, 2, 3, 4


class Unsupported(ValueError):
    """Pattern uses a construct the linear engine cannot express."""


def _is_word(c: str) -> bool:
    return c.isalnum() or c == "_"


class _CharTest:
    """Single-character predicate with an ASCII fast table."""

    __slots__ = ("table", "fn")

    def __init__(self, fn):
        self.fn = fn
        self.table = [fn(chr(i)) for i in range(128)]

    def __call__(self, c: str) -> bool:
        o = ord(c)
        return self.table[o] if o < 128 else self.fn(c)


def _category_fn(cat, ascii_: bool = False):
    """Match ``re``'s category semantics exactly: \d is Unicode Nd
    (str.isdecimal — NOT isdigit, which also accepts No like ²), \w is
    alnum+underscore, \s is str.isspace; under re.ASCII each collapses
    to its ASCII subset."""
    name = str(cat)
    if ascii_:
        if name.endswith("CATEGORY_DIGIT"):
            return lambda c: "0" <= c <= "9"
        if name.endswith("CATEGORY_NOT_DIGIT"):
            return lambda c: not ("0" <= c <= "9")
        if name.endswith("CATEGORY_SPACE"):
            return lambda c: c in " \t\n\r\f\v"
        if name.endswith("CATEGORY_NOT_SPACE"):
            return lambda c: c not in " \t\n\r\f\v"
        if name.endswith("CATEGORY_WORD"):
            return lambda c: c == "_" or ("a" <= c <= "z") or ("A" <= c <= "Z") or ("0" <= c <= "9")
        if name.endswith("CATEGORY_NOT_WORD"):
            return lambda c: not (c == "_" or ("a" <= c <= "z") or ("A" <= c <= "Z") or ("0" <= c <= "9"))
        raise Unsupported(f"char category {cat!r}")
    if name.endswith("CATEGORY_DIGIT"):
        return lambda c: c.isdecimal()
    if name.endswith("CATEGORY_NOT_DIGIT"):
        return lambda c: not c.isdecimal()
    if name.endswith("CATEGORY_SPACE"):
        return lambda c: c.isspace()
    if name.endswith("CATEGORY_NOT_SPACE"):
        return lambda c: not c.isspace()
    if name.endswith("CATEGORY_WORD"):
        return _is_word
    if name.endswith("CATEGORY_NOT_WORD"):
        return lambda c: not _is_word(c)
    raise Unsupported(f"char category {cat!r}")


def _in_fn(items, ignorecase, ascii_=False):
    """Predicate for an IN node's item list (NEGATE/LITERAL/RANGE/CATEGORY)."""
    negate = False
    lits: set[str] = set()
    ranges: list[tuple[int, int]] = []
    cats = []
    for op, av in items:
        opn = str(op)
        if opn.endswith("NEGATE"):
            negate = True
        elif opn.endswith("LITERAL"):
            lits.add(chr(av))
        elif opn.endswith("RANGE"):
            ranges.append(av)
        elif opn.endswith("CATEGORY"):
            cats.append(_category_fn(av, ascii_))
        else:
            raise Unsupported(f"class item {op!r}")
    if ignorecase:
        lits |= {c.lower() for c in lits} | {c.upper() for c in lits}

    def fn(c: str) -> bool:
        hit = c in lits or any(lo <= ord(c) <= hi for lo, hi in ranges) \
            or any(f(c) for f in cats)
        if ignorecase and not hit and (c.lower() != c or c.upper() != c):
            for cc in {c.lower(), c.upper()}:
                if cc in lits or any(lo <= ord(cc) <= hi for lo, hi in ranges):
                    hit = True
                    break
        return hit != negate

    return fn


class Program:
    """Compiled instruction list + the Pike VM that runs it."""

    def __init__(self, insns, tests, flags):
        self.insns = insns
        self.tests = tests
        self.flags = flags

    # -- empty-width assertions -------------------------------------------
    def _empty_ok(self, kind: str, text: str, pos: int) -> bool:
        n = len(text)
        multiline = bool(self.flags & re.MULTILINE)
        if kind == "bol":
            return pos == 0 or (multiline and text[pos - 1] == "\n")
        if kind == "eol":
            if multiline:
                return pos == n or text[pos] == "\n"
            return pos == n or (pos == n - 1 and text[pos] == "\n")
        if kind == "bos":
            return pos == 0
        if kind == "eos":
            return pos == n
        if kind == "eos_nl":  # \Z is eos; \z absent in Python — $ handled above
            return pos == n
        if kind.endswith("_ascii"):
            def _w(c):
                return c == "_" or ("a" <= c <= "z") or ("A" <= c <= "Z") or ("0" <= c <= "9")
            kind = kind[: -len("_ascii")]
        else:
            _w = _is_word
        prev_w = pos > 0 and _w(text[pos - 1])
        next_w = pos < n and _w(text[pos])
        if kind == "boundary":
            return prev_w != next_w
        if kind == "non_boundary":
            return prev_w == next_w
        raise AssertionError(kind)

    # -- Pike VM ----------------------------------------------------------
    def _add_closure(self, lst, seen, pc, start, text, pos):
        """Epsilon closure in priority order (SPLIT.a before SPLIT.b),
        deduped by pc within the step — the dedup is what bounds a scan
        to O(n·m) and terminates epsilon cycles like ``(a*)*``.
        Iterative (explicit LIFO stack) so a 10k-alternative BRANCH
        can't hit the interpreter recursion limit."""
        stack = [pc]
        insns = self.insns
        while stack:
            pc = stack.pop()
            if pc in seen:
                continue
            seen.add(pc)
            op, a, b = insns[pc]
            if op == JMP:
                stack.append(a)
            elif op == SPLIT:
                # b pushed first so a pops (and lands in lst) first
                stack.append(b)
                stack.append(a)
            elif op == EMPTY:
                if self._empty_ok(a, text, pos):
                    stack.append(b)
            else:  # CHAR or MATCH: a runnable thread
                lst.append((pc, start))

    def search(self, text: str, pos: int = 0, must_advance: bool = False):
        """Leftmost-first match at or after ``pos`` → (start, end) | None.

        Thread-priority rules (the RE2/pike way of mimicking PCRE):
        new start threads join at the END of the list (leftmost wins);
        a MATCH kills everything lower-priority in the current list but
        higher-priority survivors keep running and may override with a
        longer (greedier) span; when no threads survive, the last
        recorded match stands.  ``must_advance`` suppresses a zero-width
        match exactly at ``pos`` (CPython's scanner rule after an empty
        match, bpo-32308).
        """
        n = len(text)
        insns = self.insns
        tests = self.tests
        best = None
        clist: list[tuple[int, int]] = []
        seen: set[int] = set()
        at = pos
        while True:
            if best is None and at <= n:
                self._add_closure(clist, seen, 0, at, text, at)
            nlist: list[tuple[int, int]] = []
            nseen: set[int] = set()
            for pc, start in clist:
                op, a, b = insns[pc]
                if op == MATCH:
                    if must_advance and start == at == pos:
                        continue  # forbidden empty match; try lower prio
                    best = (start, at)
                    break  # lower-priority threads can never win now
                if at < n and tests[a](text[at]):
                    self._add_closure(nlist, nseen, b, start, text, at + 1)
            if not nlist and (best is not None or at >= n):
                return best
            clist, seen = nlist, nseen
            at += 1

    def finditer(self, text: str):
        """Non-overlapping (start, end) spans — CPython 3.7+ scanner
        semantics: the search after an empty match starts at the same
        position but may not produce another empty match there."""
        pos = 0
        n = len(text)
        prev_empty = False
        while pos <= n:
            m = self.search(text, pos, must_advance=prev_empty)
            if m is None:
                return
            yield m
            s, e = m
            prev_empty = s == e
            pos = e



# empty-path preference rank of a parse subtree: where does "match
# nothing" sit in the body's backtracking preference order?  An
# unbounded loop body may be NOT_NULLABLE or EMPTY_LAST (the VM's
# state-dedup then reproduces the backtracker's empty-iteration-exits
# rule exactly); EMPTY_NOT_LAST bodies rank "exit" mid-preference,
# which no per-position dedup can express → Unsupported.
_NOT_NULLABLE, _EMPTY_LAST, _EMPTY_NOT_LAST = 0, 1, 2


def _node_rank(node) -> int:
    op, av = node
    opn = str(op).rsplit(".", 1)[-1]
    if opn in ("LITERAL", "NOT_LITERAL", "ANY", "IN"):
        return _NOT_NULLABLE
    if opn == "AT":
        return _EMPTY_LAST
    if opn == "SUBPATTERN":
        return _empty_rank(av[3])
    if opn == "BRANCH":
        ranks = [_empty_rank(alt) for alt in av[1]]
        if all(r == _NOT_NULLABLE for r in ranks):
            return _NOT_NULLABLE
        if (
            ranks[-1] == _EMPTY_LAST
            and all(r == _NOT_NULLABLE for r in ranks[:-1])
        ):
            return _EMPTY_LAST
        return _EMPTY_NOT_LAST
    if opn == "MAX_REPEAT":
        lo, _hi, sub = av
        r = _empty_rank(sub)
        if lo > 0:
            return r
        return _EMPTY_LAST if r in (_NOT_NULLABLE, _EMPTY_LAST) else _EMPTY_NOT_LAST
    if opn == "MIN_REPEAT":
        lo, _hi, sub = av
        if lo == 0:
            return _EMPTY_NOT_LAST
        return _NOT_NULLABLE if _empty_rank(sub) == _NOT_NULLABLE else _EMPTY_NOT_LAST
    return _EMPTY_NOT_LAST  # unknown: conservative


def _empty_rank(seq) -> int:
    ranks = [_node_rank(n) for n in seq]
    if any(r == _NOT_NULLABLE for r in ranks):
        return _NOT_NULLABLE
    if all(r == _EMPTY_LAST for r in ranks):
        return _EMPTY_LAST
    return _EMPTY_NOT_LAST


def _compile_node(node, insns, tests, flags):
    """Append instructions for one parse node; fall through to next."""
    op, av = node
    opn = str(op).rsplit(".", 1)[-1]
    ignorecase = bool(flags & re.IGNORECASE)
    if opn == "LITERAL":
        ch = chr(av)
        if ignorecase:
            fn = lambda c, ch=ch: c == ch or c.lower() == ch.lower()
        else:
            fn = lambda c, ch=ch: c == ch
        tests.append(_CharTest(fn))
        insns.append([CHAR, len(tests) - 1, None])
    elif opn == "NOT_LITERAL":
        ch = chr(av)
        if ignorecase:
            fn = lambda c, ch=ch: not (c == ch or c.lower() == ch.lower())
        else:
            fn = lambda c, ch=ch: c != ch
        tests.append(_CharTest(fn))
        insns.append([CHAR, len(tests) - 1, None])
    elif opn == "ANY":
        if flags & re.DOTALL:
            fn = lambda c: True
        else:
            fn = lambda c: c != "\n"
        tests.append(_CharTest(fn))
        insns.append([CHAR, len(tests) - 1, None])
    elif opn == "IN":
        tests.append(_CharTest(_in_fn(av, ignorecase, bool(flags & re.ASCII))))
        insns.append([CHAR, len(tests) - 1, None])
    elif opn == "AT":
        name = str(av)
        kind = {
            "AT_BEGINNING": "bol", "AT_END": "eol",
            "AT_BEGINNING_STRING": "bos", "AT_END_STRING": "eos",
        }.get(name.split(".")[-1])
        if kind is None:
            if name.endswith("AT_NON_BOUNDARY"):
                kind = "non_boundary"
            elif name.endswith("AT_BOUNDARY"):
                kind = "boundary"
            else:
                raise Unsupported(f"anchor {av!r}")
            if flags & re.ASCII:  # scoped (?a:...\b...) honored per node
                kind += "_ascii"
        insns.append([EMPTY, kind, None])
    elif opn == "SUBPATTERN":
        _gid, add_f, del_f, sub = av
        _compile_seq(sub, insns, tests, (flags | add_f) & ~del_f)
    elif opn == "ATOMIC_GROUP":
        # atomic groups CUT alternatives (``(?>a|ab)c`` fails on "abc")
        # — a Thompson simulation keeps them alive, so spans would
        # diverge; be honest and fall back to the backtracker
        raise Unsupported("atomic group")
    elif opn == "BRANCH":
        _none, alts = av
        jmps = []
        for i, alt in enumerate(alts):
            if i < len(alts) - 1:
                sp = len(insns)
                insns.append([SPLIT, None, None])
            _compile_seq(alt, insns, tests, flags)
            if i < len(alts) - 1:
                jmps.append(len(insns))
                insns.append([JMP, None, None])
                insns[sp][1] = sp + 1
                insns[sp][2] = len(insns)
        end = len(insns)
        for j in jmps:
            insns[j][1] = end
    elif opn in ("MAX_REPEAT", "MIN_REPEAT"):
        lazy = opn == "MIN_REPEAT"
        lo, hi, sub = av
        if lo > _MAX_EXPAND or (hi != MAXREPEAT and hi > _MAX_EXPAND):
            raise Unsupported(f"counted repeat {{{lo},{hi}}} too large")
        for _ in range(lo):
            _compile_seq(sub, insns, tests, flags)
        if hi == MAXREPEAT:
            if _empty_rank(sub) == _EMPTY_NOT_LAST:
                # body prefers an empty iteration over some consuming
                # one: the backtracker's empty-loop-exit rule then ranks
                # "exit" mid-preference, which state-dedup can't express
                raise Unsupported("empty-preferring loop body")
            # the loop-back targets a DUPLICATE split (sp2), not sp:
            # a body whose empty path falls through then re-enters an
            # already-seen region and dies — which is exactly the
            # backtracker's empty-iteration-terminates-the-loop rule,
            # leaving 'out' at the right priority slot
            sp = len(insns)
            insns.append([SPLIT, None, None])
            body = len(insns)
            _compile_seq(sub, insns, tests, flags)
            sp2 = len(insns)
            insns.append([SPLIT, None, None])
            out = len(insns)
            for s in (sp, sp2):
                insns[s][1], insns[s][2] = (out, body) if lazy else (body, out)
        else:
            if hi > lo and _empty_rank(sub) == _EMPTY_NOT_LAST:
                # same hazard as the unbounded case: the backtracker's
                # empty-iteration-stops-counting rule prunes
                # "copy_k empty → copy_{k+1} consumes" paths that the
                # plain expansion would rank too high (EMPTY_LAST bodies
                # are safe: their consuming alts already failed at the
                # same position before the empty path was taken)
                raise Unsupported("empty-preferring counted-repeat body")
            sps = []
            for _ in range(hi - lo):
                sp = len(insns)
                insns.append([SPLIT, None, None])
                sps.append(sp)
                _compile_seq(sub, insns, tests, flags)
            out = len(insns)
            for sp in sps:
                body = sp + 1
                insns[sp][1], insns[sp][2] = (out, body) if lazy else (body, out)
    else:
        raise Unsupported(f"construct {op!r}")


def _compile_seq(seq, insns, tests, flags):
    for node in seq:
        start = len(insns)
        _compile_node(node, insns, tests, flags)
        # CHAR fall-through target
        for i in range(start, len(insns)):
            if insns[i][0] == CHAR and insns[i][2] is None:
                insns[i][2] = i + 1
            if insns[i][0] == EMPTY and insns[i][2] is None:
                insns[i][2] = i + 1


def compile_nfa(pattern: str, flags: int = 0) -> Program:
    """Compile ``pattern`` for the Pike VM; :class:`Unsupported` if the
    pattern needs backtracking-only features."""
    try:
        parsed = _P.parse(pattern, flags)
    except re.error as e:
        raise re.error(str(e)) from e
    all_flags = flags | parsed.state.flags
    if all_flags & re.VERBOSE:
        parsed = _P.parse(pattern, all_flags)
    insns: list[list] = []
    tests: list[_CharTest] = []
    _compile_seq(parsed, insns, tests, all_flags)
    insns.append([MATCH, None, None])
    # resolve any dangling fall-throughs (defensive)
    for i, ins in enumerate(insns):
        if ins[0] in (CHAR, EMPTY) and ins[2] is None:
            ins[2] = i + 1
    prog = Program([tuple(x) for x in insns], tests, all_flags)
    return prog
