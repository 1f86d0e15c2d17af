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
