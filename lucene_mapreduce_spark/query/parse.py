"""Lucene-style query parser: `+must -not "a phrase" should terms`.

The reference hands raw query strings to Lucene's QueryParser
(XdiReportReducer.java:356); this is the same clause surface, simplified
to the grammar the engine's operators implement exactly:

- ``"quoted tokens"``  -> a MUST phrase clause (contiguous match)
- ``+token``           -> a MUST term (conjunctive candidate filter)
- ``-token``           -> a MUST_NOT term (candidates excluded)
- bare tokens          -> SHOULD terms (contribute to ranking)

Semantics (Lucene practical behavior): candidates satisfy every MUST term
and phrase and no MUST_NOT term; when there are no MUST/phrase clauses,
candidates are docs matching at least one SHOULD term. Ranking is BM25
over the SHOULD + MUST terms (corpus-global stats); candidates matching
no scoring term rank last with score 0.0 (constant-score clause).

Shared by the IndexSearcher (query/wand.py) and the DuckDB oracle builder
(operators/oracles.py) so both engines parse identically.
"""

from __future__ import annotations

import re

from lucene_mapreduce_spark.functions.tokenize import tokenize_string

_QUOTED = re.compile(r'"([^"]*)"')


def parse_query(
    query: str,
) -> tuple[list[str], list[str], list[list[str]], list[str]]:
    """(must_terms, must_not_terms, phrases, should_terms); term lists are
    sorted unique; each phrase is its token list (empty phrases dropped)."""
    phrases: list[list[str]] = []

    def _grab(m: re.Match) -> str:
        toks = tokenize_string(m.group(1))
        if toks:
            phrases.append(toks)
        return " "

    rest = _QUOTED.sub(_grab, query)
    must: set[str] = set()
    must_not: set[str] = set()
    should: set[str] = set()
    for raw in rest.split():
        if raw.startswith("+") and len(raw) > 1:
            must.update(tokenize_string(raw[1:]))
        elif raw.startswith("-") and len(raw) > 1:
            must_not.update(tokenize_string(raw[1:]))
        else:
            should.update(tokenize_string(raw))
    return sorted(must), sorted(must_not), phrases, sorted(should)


_FIELD = re.compile(r"^(\w+):(\S+)$")
_BOOST = re.compile(r"^(.*?)\^(\d+(?:\.\d+)?)$")
# numeric range clause: field:[lo TO hi], * = open end (Lucene syntax);
# matched BEFORE whitespace split because the brackets contain spaces
_RANGE = re.compile(r"([+-]?)(\w+):\[\s*(\S+)\s+TO\s+(\S+)\s*\]")
# sloppy phrase "a b"~N — matched before plain quotes strip the suffix
_SLOPPY = re.compile(r'"([^"]*)"~(\d+)')


def parse_query_ext(query: str) -> dict:
    """Extended Lucene-QueryParser surface on top of :func:`parse_query`'s
    grammar — adds the two classic per-clause decorations:

    - ``term^2.5``        -> a query-time boost on that term's BM25
                             contribution (Lucene Query#setBoost); allowed
                             on bare and ``+`` terms (a MUST_NOT boost is
                             meaningless and ignored, like Lucene).
    - ``field:value``     -> a keyword-field clause (``+lang:en`` MUST,
                             ``-source:src3`` MUST_NOT, bare = MUST —
                             Lucene TermQuery on an untokenized field);
                             values match the stored field exactly.
    - ``field:[lo TO hi]``-> a numeric range clause (Lucene
                             PointRangeQuery; inclusive, ``*`` = open
                             end); ``-`` prefix makes it MUST_NOT.
    - ``"a b"~N``         -> a sloppy phrase (QueryParser phrase slop):
                             the terms IN ORDER with at most N extra
                             tokens interleaved total (ordered SpanNear —
                             a documented simplification of Lucene's
                             transposition-counting slop). ~0 or no
                             suffix = the exact phrase.

    Returns a dict: must / must_not / should (sorted term lists), phrases
    (slop-0), sloppy_phrases ((tokens, slop) pairs), boosts (term ->
    float, default absent = 1.0), field_must / field_must_not (sorted
    (field, value) lists), range_must / range_must_not.
    """
    phrases: list[list[str]] = []
    sloppy: list[tuple[list[str], int]] = []

    def _grab_sloppy(m: re.Match) -> str:
        toks = tokenize_string(m.group(1))
        slop = int(m.group(2))
        if toks:
            (phrases if slop == 0 else sloppy).append(
                toks if slop == 0 else (toks, slop)
            )
        return " "

    rest = _SLOPPY.sub(_grab_sloppy, query)

    def _grab(m: re.Match) -> str:
        toks = tokenize_string(m.group(1))
        if toks:
            phrases.append(toks)
        return " "

    rest = _QUOTED.sub(_grab, rest)
    range_must: list[tuple[str, float | None, float | None]] = []
    range_must_not: list[tuple[str, float | None, float | None]] = []

    def _grab_range(m: re.Match) -> str:
        lo = None if m.group(3) == "*" else float(m.group(3))
        hi = None if m.group(4) == "*" else float(m.group(4))
        tgt = range_must_not if m.group(1) == "-" else range_must
        tgt.append((m.group(2).lower(), lo, hi))
        return " "

    rest = _RANGE.sub(_grab_range, rest)
    must: set[str] = set()
    must_not: set[str] = set()
    should: set[str] = set()
    boosts: dict[str, float] = {}
    field_must: set[tuple[str, str]] = set()
    field_must_not: set[tuple[str, str]] = set()
    for raw in rest.split():
        sign = ""
        if raw[:1] in "+-" and len(raw) > 1:
            sign, raw = raw[0], raw[1:]
        fm = _FIELD.match(raw)
        if fm:
            pair = (fm.group(1).lower(), fm.group(2))
            (field_must_not if sign == "-" else field_must).add(pair)
            continue
        boost = None
        bm = _BOOST.match(raw)
        if bm and bm.group(1):
            raw, boost = bm.group(1), float(bm.group(2))
        toks = tokenize_string(raw)
        if sign == "-":
            must_not.update(toks)
            continue
        (must if sign == "+" else should).update(toks)
        if boost is not None:
            for t in toks:
                boosts[t] = boosts.get(t, 1.0) * boost
    return {
        "must": sorted(must),
        "must_not": sorted(must_not),
        "phrases": phrases,
        "sloppy_phrases": sloppy,
        "should": sorted(should),
        "boosts": boosts,
        "field_must": sorted(field_must),
        "field_must_not": sorted(field_must_not),
        "range_must": sorted(range_must, key=_range_key),
        "range_must_not": sorted(range_must_not, key=_range_key),
    }


def _range_key(t: tuple) -> tuple:
    fld, lo, hi = t
    return (
        fld,
        lo if lo is not None else float("-inf"),
        hi if hi is not None else float("inf"),
    )
