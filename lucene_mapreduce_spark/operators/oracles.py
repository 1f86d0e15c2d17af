"""DuckDB oracle SQL for every queries() entry (the correctness gate).

Each SQL string runs against pre-registered views (region nation customer
supplier part orders lineitem events documents embeddings) and must produce
the same column names, schema, and (rounded) values as the Spark query of the
same key in __spark_entry__.queries().
"""

from __future__ import annotations

from lucene_mapreduce_spark.functions.tokenize import duckdb_tokens_sql
from lucene_mapreduce_spark.query.bm25 import B, K1

TOKS = duckdb_tokens_sql("text")


def bm25_topk_sql(
    query_text: str,
    k: int = 10,
    doc_where: str = "TRUE",
    k1: float = K1,
    b: float = B,
) -> str:
    """Brute-force BM25 in ANSI-ish SQL (DuckDB dialect) — the independent
    re-derivation of the scorer spec in query/bm25.py.  doc_where scopes
    the corpus (docs AND stats) — the twin of the range-scoped index path;
    k1/b expose the BM25Similarity(k1, b) tuning surface."""
    qlit = query_text.replace("'", "''")
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents WHERE {doc_where}
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents WHERE {doc_where}
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
dft AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
scored AS (
  SELECT p.doc_id,
         ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * (p.tf * {k1 + 1.0}) / (p.tf + {k1} * (1 - {b} + {b} * l.dl / s.avgdl))
           AS contrib
  FROM postings p
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
),
agg AS (
  SELECT doc_id, sum(contrib) AS score FROM scored GROUP BY 1
)
SELECT doc_id, round(score, 6) AS score, rank
FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM agg
)
WHERE rank <= {k}
"""


def mlt_sql(src: int, max_terms: int = 8, k: int = 10) -> str:
    """MoreLikeThis twin: rank the source doc's terms by tf * BM25-idf
    (ties -> term asc), take max_terms, run the BM25 spec with that term
    set, exclude the source doc from the results (stats corpus-global)."""
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
srcterms AS (
  SELECT term, tf FROM postings WHERE doc_id = {src}
),
dfc AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM postings p JOIN srcterms s USING (term) GROUP BY 1
),
qterms AS (
  SELECT term FROM (
    SELECT s.term,
           s.tf * ln(1 + (st.n_docs - d.df_t + 0.5) / (d.df_t + 0.5)) AS sc
    FROM srcterms s JOIN dfc d USING (term) CROSS JOIN stats st
  ) ORDER BY sc DESC, term ASC LIMIT {max_terms}
),
dft AS (
  SELECT d.term, d.df_t FROM dfc d JOIN qterms q USING (term)
),
scored AS (
  SELECT p.doc_id,
         ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * (p.tf * {K1 + 1.0}) / (p.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl))
           AS contrib
  FROM postings p
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
  WHERE p.doc_id <> {src}
),
agg AS (
  SELECT doc_id, sum(contrib) AS score FROM scored GROUP BY 1
)
SELECT doc_id, round(score, 6) AS score, rank
FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM agg
)
WHERE rank <= {k}
"""


def parsed_query_sql(query: str, k: int = 10) -> str:
    """QueryParser twin: the same parse (query/parse.py) rendered as SQL —
    MUST/phrase/MUST_NOT as candidate predicates, BM25 over SHOULD+MUST
    terms with corpus-global stats restricted to the candidates;
    candidates matching no scoring term keep score 0.0 (constant-score)."""
    from lucene_mapreduce_spark.query.parse import parse_query

    must, must_not, phrases, should = parse_query(query)
    scoring = sorted(set(must) | set(should))
    conds = [f"list_contains(toks, '{t}')" for t in must]
    for ph in phrases:
        adj = " AND ".join(f"toks[i+{j}] = '{w}'" for j, w in enumerate(ph))
        conds.append(f"len(list_filter(range(1, len(toks)), i -> {adj})) > 0")
    if not conds:
        ors = " OR ".join(f"list_contains(toks, '{t}')" for t in scoring)
        conds.append(f"({ors})")
    conds += [f"NOT list_contains(toks, '{t}')" for t in must_not]
    where = " AND ".join(conds)
    terms_lit = ", ".join(f"'{t}'" for t in scoring)
    return f"""
WITH docs AS (SELECT doc_id, {TOKS} AS toks FROM documents),
doclens AS (SELECT doc_id, len(toks) AS dl FROM docs),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
cand AS (SELECT doc_id FROM docs WHERE {where}),
toklist AS (SELECT doc_id, unnest(toks) AS term FROM docs),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toklist GROUP BY 1, 2
),
qterms AS (SELECT unnest([{terms_lit}]) AS term),
dft AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
scored AS (
  SELECT p.doc_id,
         ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * (p.tf * {K1 + 1.0}) / (p.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl))
           AS contrib
  FROM postings p
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
  JOIN cand c ON c.doc_id = p.doc_id
),
agg AS (SELECT doc_id, sum(contrib) AS score FROM scored GROUP BY 1),
ranked AS (
  SELECT c.doc_id, coalesce(a.score, 0.0) AS score
  FROM cand c LEFT JOIN agg a USING (doc_id)
)
SELECT doc_id, round(score, 6) AS score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM ranked
) WHERE rank <= {k}
"""


def fuzzy_sql(query_text: str, k: int = 10, max_dist: int = 1) -> str:
    """FuzzyQuery twin: expand each query token to the corpus vocabulary
    within levenshtein max_dist, then the BM25 spec over the expansion."""
    from lucene_mapreduce_spark.functions.tokenize import tokenize_string

    qlits = ", ".join(
        f"'{t}'" for t in sorted(set(tokenize_string(query_text)))
    )
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
vocab AS (SELECT DISTINCT term FROM toks),
qsrc AS (SELECT unnest([{qlits}]) AS q),
qterms AS (
  SELECT DISTINCT v.term FROM vocab v, qsrc
  WHERE levenshtein(v.term, qsrc.q) <= {max_dist}
),
dft AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
scored AS (
  SELECT p.doc_id,
         ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * (p.tf * {K1 + 1.0}) / (p.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl))
           AS contrib
  FROM postings p
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
),
agg AS (
  SELECT doc_id, sum(contrib) AS score FROM scored GROUP BY 1
)
SELECT doc_id, round(score, 6) AS score, rank
FROM (
  -- rank on the ROUNDED score: expansions carry up to 1024 terms, so two
  -- docs can collide at 6dp while the engines' unrounded last-ulp order
  -- differs (plain sum here vs canonical ascending sum in Spark) — the
  -- random_score_query rule, first seen flipping at sf1
  SELECT doc_id, score,
         row_number() OVER (ORDER BY round(score, 6) DESC, doc_id ASC)
           AS rank
  FROM agg
)
WHERE rank <= {k}
"""


def prefix_sql(prefix: str, k: int = 10) -> str:
    """PrefixQuery twin: vocabulary terms LIKE 'prefix%', BM25 over them."""
    return _expansion_bm25_sql(f"term LIKE '{prefix}%'", k)


def wildcard_sql(pattern: str, k: int = 10) -> str:
    """WildcardQuery twin: the same wildcard->anchored-regex translation the
    engine uses, replayed with DuckDB regexp_matches."""
    from lucene_mapreduce_spark.operators.fulltext import wildcard_to_regex

    rx = wildcard_to_regex(pattern).replace("'", "''")
    return _expansion_bm25_sql(f"regexp_matches(term, '{rx}')", k)


def regexp_sql(pattern: str, k: int = 10) -> str:
    """RegexpQuery twin: anchored full-match regex over the vocabulary."""
    rx = ("^" + pattern + "$").replace("'", "''")
    return _expansion_bm25_sql(f"regexp_matches(term, '{rx}')", k)


def term_range_sql(lo: str, hi: str, k: int = 10) -> str:
    """TermRangeQuery twin: lexicographic [lo, hi] over the vocabulary."""
    return _expansion_bm25_sql(f"term >= '{lo}' AND term <= '{hi}'", k)


def collapse_sql(query_text: str, k: int = 5) -> str:
    """search_collapse twin: BM25 spec, 6dp-rounded scores, best hit per
    `lang` group, groups ranked by best score. Windows order on the ROUNDED
    score + doc_id — the same deterministic key the engine collapses on."""
    qlit = query_text.replace("'", "''")
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
dft AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
scored AS (
  SELECT p.doc_id,
         ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * (p.tf * {K1 + 1.0}) / (p.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl))
           AS contrib
  FROM postings p
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
),
agg AS (
  SELECT doc_id, round(sum(contrib), 6) AS score FROM scored GROUP BY 1
),
best AS (
  SELECT d.lang, a.doc_id, a.score,
         row_number() OVER (
           PARTITION BY d.lang ORDER BY a.score DESC, a.doc_id ASC
         ) AS rn
  FROM agg a JOIN documents d USING (doc_id)
)
SELECT lang, doc_id, score, grp_rank
FROM (
  SELECT lang, doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS grp_rank
  FROM best WHERE rn = 1
)
WHERE grp_rank <= {k}
"""


def grouped_topn_sql(
    query_text: str, n: int = 2, k_groups: int = 3
) -> str:
    """search_grouped_topn twin: per-lang top-n of the 6dp-rounded BM25
    scores, groups ranked by their leading hit."""
    qlit = query_text.replace("'", "''")
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
dft AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
scored AS (
  SELECT p.doc_id,
         ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * (p.tf * {K1 + 1.0}) / (p.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl))
           AS contrib
  FROM postings p
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
),
agg AS (
  SELECT doc_id, round(sum(contrib), 6) AS score FROM scored GROUP BY 1
),
g AS (
  SELECT a.doc_id, a.score, d.lang,
         row_number() OVER (
           PARTITION BY d.lang ORDER BY a.score DESC, a.doc_id ASC
         ) AS pos
  FROM agg a JOIN documents d USING (doc_id)
),
leaders AS (
  SELECT lang, score AS lead_score, doc_id AS lead_doc FROM g WHERE pos = 1
),
tg AS (
  SELECT lang,
         row_number() OVER (ORDER BY lead_score DESC, lead_doc ASC) AS grp_rank
  FROM leaders
)
SELECT g.lang, t.grp_rank, g.pos, g.doc_id, g.score
FROM g JOIN tg t USING (lang)
WHERE g.pos <= {n} AND t.grp_rank <= {k_groups}
"""


def _boolean_match_ctes(query_text: str) -> str:
    """Shared CTEs: per-doc distinct-query-term match count vs the query's
    distinct term count (m = |qt| <=> conjunctive match)."""
    qlit = query_text.replace("'", "''")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
qt AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
nq AS (SELECT count(*) AS c FROM qt),
per_doc AS (
  SELECT doc_id, count(DISTINCT t.term) AS m
  FROM toks t JOIN qt USING (term) GROUP BY 1
)"""


def total_hits_sql(query_text: str) -> str:
    """search_total_hits twin: AND / OR hit counts of the boolean query."""
    return f"""{_boolean_match_ctes(query_text)}
SELECT (SELECT count(*) FROM per_doc, nq WHERE m = c)::BIGINT AS n_and,
       (SELECT count(*) FROM per_doc)::BIGINT AS n_or
"""


def sort_by_field_sql(query_text: str, k: int = 10) -> str:
    """search_sort_by_field twin: conjunctive hits ordered by n_chars desc,
    doc_id asc."""
    return f"""{_boolean_match_ctes(query_text)},
matched AS (SELECT doc_id FROM per_doc, nq WHERE m = c)
SELECT doc_id, n_chars, rank
FROM (
  SELECT d.doc_id, d.n_chars,
         row_number() OVER (ORDER BY d.n_chars DESC, d.doc_id ASC) AS rank
  FROM documents d JOIN matched USING (doc_id)
)
WHERE rank <= {k}
"""


def tfidf_sql(query_text: str, k: int = 10) -> str:
    """tfidf_topk twin — Lucene ClassicSimilarity: sqrt(tf) * idf^2 /
    sqrt(dl) with idf = 1 + ln(N/(df+1)); idf squared by explicit
    multiplication (pow() is not guaranteed bit-equal to x*x)."""
    qlit = query_text.replace("'", "''")
    idf = "(1 + ln(s.n_docs / (d.df_t + 1.0)))"
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
dft AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
scored AS (
  SELECT p.doc_id,
         sqrt(p.tf) * {idf} * {idf} / sqrt(l.dl::DOUBLE) AS contrib
  FROM postings p
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
),
agg AS (
  SELECT doc_id, sum(contrib) AS score FROM scored GROUP BY 1
)
SELECT doc_id, round(score, 6) AS score, rank
FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM agg
)
WHERE rank <= {k}
"""


def spell_suggest_sql(word: str, max_dist: int = 2, k: int = 5) -> str:
    """spell_suggest twin: vocabulary terms within levenshtein max_dist,
    ranked (dist asc, df desc, term asc)."""
    w = word.replace("'", "''")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
d AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY 1
),
c AS (
  SELECT term, levenshtein(term, '{w}')::INT AS dist, df FROM d
  WHERE levenshtein(term, '{w}') <= {max_dist}
)
SELECT term, dist, df, rank
FROM (
  SELECT term, dist, df,
         row_number() OVER (ORDER BY dist ASC, df DESC, term ASC) AS rank
  FROM c
)
WHERE rank <= {k}
"""


def autocomplete_sql(prefix: str, k: int = 5) -> str:
    """autocomplete twin: prefix-matched vocabulary ranked by cf desc."""
    p = prefix.replace("'", "''")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
d AS (SELECT term, count(*)::BIGINT AS cf FROM toks GROUP BY 1)
SELECT term, cf, rank
FROM (
  SELECT term, cf,
         row_number() OVER (ORDER BY cf DESC, term ASC) AS rank
  FROM d WHERE term LIKE '{p}%'
)
WHERE rank <= {k}
"""


def terms_enum_sql(k: int = 15) -> str:
    """terms_enum twin: df/cf per term recomputed from the raw corpus,
    top-k by (df desc, term asc)."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
d AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS cf
  FROM toks GROUP BY 1
)
SELECT term, df, cf, rank
FROM (
  SELECT term, df, cf,
         row_number() OVER (ORDER BY df DESC, term ASC) AS rank
  FROM d
)
WHERE rank <= {k}
"""


def ngram_counts_sql(k: int = 20) -> str:
    """ngram_counts twin: top-k bigrams by (count desc, ngram asc) with
    6dp-rounded PMI against unigram independence."""
    return f"""
WITH d AS (SELECT {TOKS} AS toks FROM documents),
bi AS (
  SELECT unnest(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i+1])) AS ngram
  FROM d
),
bic AS (SELECT ngram, count(*)::BIGINT AS c_xy FROM bi GROUP BY 1),
uni AS (SELECT unnest(toks) AS tok FROM d),
unic AS (SELECT tok, count(*)::DOUBLE AS c FROM uni GROUP BY 1),
tot AS (SELECT (SELECT sum(c) FROM unic) AS u_tot,
               (SELECT sum(c_xy)::DOUBLE FROM bic) AS t_tot)
SELECT ngram, n_occ, pmi, rank
FROM (
  SELECT b.ngram, b.c_xy AS n_occ,
         round(ln((b.c_xy / t.t_tot)
                  / ((x.c / t.u_tot) * (y.c / t.u_tot))), 6) AS pmi,
         row_number() OVER (ORDER BY b.c_xy DESC, b.ngram ASC) AS rank
  FROM bic b
  JOIN unic x ON x.tok = string_split(b.ngram, ' ')[1]
  JOIN unic y ON y.tok = string_split(b.ngram, ' ')[2]
  CROSS JOIN tot t
)
WHERE rank <= {k}
"""


def significant_terms_sql(
    query_text: str, k: int = 15, min_df: int = 3
) -> str:
    """significant_terms twin: foreground (OR hit set) vs background doc
    frequencies, lift = (df_fg/n_fg)/(df_bg/n_bg) rounded 6dp, query terms
    excluded, ranked (lift desc, term asc)."""
    from lucene_mapreduce_spark.functions.tokenize import tokenize_string

    qts = sorted(set(tokenize_string(query_text)))
    qlits = ", ".join(f"'{t}'" for t in qts)
    lift = "round((f.df_fg / nfg.n) / (b.df_bg / nbg.n), 6)"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
qt AS (SELECT unnest([{qlits}]) AS term),
hits AS (SELECT DISTINCT doc_id FROM toks JOIN qt USING (term)),
nfg AS (SELECT count(*)::DOUBLE AS n FROM hits),
nbg AS (SELECT count(*)::DOUBLE AS n FROM documents),
fg AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df_fg
  FROM toks JOIN hits USING (doc_id) GROUP BY 1
),
bg AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df_bg FROM toks GROUP BY 1
)
SELECT term, df_fg, df_bg, lift, rank
FROM (
  SELECT f.term, f.df_fg, b.df_bg, {lift} AS lift,
         row_number() OVER (ORDER BY {lift} DESC, f.term ASC) AS rank
  FROM fg f JOIN bg b USING (term)
  CROSS JOIN nfg CROSS JOIN nbg
  WHERE f.df_fg >= {min_df} AND f.term NOT IN ({qlits})
)
WHERE rank <= {k}
"""


def range_parsed_sql(k: int = 10) -> str:
    """range_parsed_query twin: `+merge n_chars:[100 TO 300] lang:en scan`
    — conjunctive term + numeric range + keyword field bound candidates;
    merge and scan score."""
    return ext_scored_sql(
        [("merge", 1.0), ("scan", 1.0)],
        f"SELECT doc_id FROM documents "
        f"WHERE list_contains({TOKS}, 'merge') "
        f"AND n_chars BETWEEN 100 AND 300 AND lang = 'en'",
        k,
    )


def ext_scored_sql(
    score_terms: list[tuple[str, float]], cand_sql: str, k: int = 10
) -> str:
    """Oracle skeleton for the extended-parser gates (boosts, field scopes,
    minimum_should_match): BM25 contributions scaled by a per-term weight,
    summed over the docs selected by `cand_sql` (which may reference the
    toks CTE); candidates matching no scoring term keep score 0.0."""
    vals = ", ".join(f"('{t}', {w!r}::DOUBLE)" for t, w in score_terms)
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
qterms(term, boost) AS (SELECT * FROM (VALUES {vals}) v(term, boost)),
dft AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
cand AS ({cand_sql}),
scored AS (
  SELECT p.doc_id,
         q.boost * ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * (p.tf * {K1 + 1.0}) / (p.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl))
           AS contrib
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  JOIN cand c USING (doc_id)
  CROSS JOIN stats s
),
agg AS (
  SELECT c.doc_id, coalesce(sum(s.contrib), 0.0) AS score
  FROM cand c LEFT JOIN scored s USING (doc_id) GROUP BY 1
)
SELECT doc_id, round(score, 6) AS score, rank
FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM agg
)
WHERE rank <= {k}
"""


def boosted_sql(k: int = 10) -> str:
    """boosted_query twin: `table^3 merge scan^0.5` — candidates are docs
    matching any scoring term; contributions carry the boosts."""
    return ext_scored_sql(
        [("merge", 1.0), ("scan", 0.5), ("table", 3.0)],
        "SELECT DISTINCT doc_id FROM toks "
        "WHERE term IN ('merge', 'scan', 'table')",
        k,
    )


def msm_sql(k: int = 10) -> str:
    """min_should_match_query twin: `merge scan window vector` with
    minimum_should_match=2 — candidates match >= 2 distinct query terms."""
    terms = "('merge', 'scan', 'window', 'vector')"
    return ext_scored_sql(
        [("merge", 1.0), ("scan", 1.0), ("vector", 1.0), ("window", 1.0)],
        f"SELECT doc_id FROM (SELECT doc_id, count(DISTINCT term) AS mm "
        f"FROM toks WHERE term IN {terms} GROUP BY 1) WHERE mm >= 2",
        k,
    )


def field_scoped_sql(k: int = 10) -> str:
    """field_scoped_query twin: `+merge lang:en -source:src3 scan` — the
    conjunctive term plus exact keyword-field predicates bound candidates;
    merge and scan score."""
    return ext_scored_sql(
        [("merge", 1.0), ("scan", 1.0)],
        f"SELECT doc_id FROM documents "
        f"WHERE list_contains({TOKS}, 'merge') "
        f"AND lang = 'en' AND NOT source = 'src3'",
        k,
    )


def _expansion_bm25_sql(term_pred: str, k: int) -> str:
    """BM25 over the vocabulary terms matching `term_pred` — the shared
    skeleton of the multi-term (dictionary-expansion) query oracles."""
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
qterms AS (
  SELECT DISTINCT term FROM toks WHERE {term_pred}
),
dft AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
scored AS (
  SELECT p.doc_id,
         ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * (p.tf * {K1 + 1.0}) / (p.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl))
           AS contrib
  FROM postings p
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
),
agg AS (
  SELECT doc_id, sum(contrib) AS score FROM scored GROUP BY 1
)
SELECT doc_id, round(score, 6) AS score, rank
FROM (
  -- rank on the ROUNDED score: expansions carry up to 1024 terms, so two
  -- docs can collide at 6dp while the engines' unrounded last-ulp order
  -- differs (plain sum here vs canonical ascending sum in Spark) — the
  -- random_score_query rule, first seen flipping at sf1
  SELECT doc_id, score,
         row_number() OVER (ORDER BY round(score, 6) DESC, doc_id ASC)
           AS rank
  FROM agg
)
WHERE rank <= {k}
"""


def snippets_sql(query_text: str, k: int = 10, width: int = 3) -> str:
    """Highlighter twin: the bm25 top-k joined with a (2*width+1)-token
    window around the first query-term hit (list_position/list_slice are
    1-based like Spark's array_position/slice)."""
    from lucene_mapreduce_spark.functions.tokenize import tokenize_string

    qts = sorted(set(tokenize_string(query_text)))
    absent = 1 << 30
    pos = ", ".join(
        f"CASE WHEN list_position(toks, '{t}') = 0 THEN {absent}"
        f" ELSE list_position(toks, '{t}') END"
        for t in qts
    )
    first = f"least({pos})" if len(qts) > 1 else pos
    return f"""
WITH topk AS ({bm25_topk_sql(query_text, k)}),
docs AS (SELECT doc_id, {TOKS} AS toks FROM documents),
snip AS (
  SELECT doc_id,
         array_to_string(list_slice(toks, s, s + {2 * width}), ' ') AS snippet
  FROM (
    SELECT doc_id, toks, greatest(1, {first} - {width}) AS s FROM docs
  )
)
SELECT t.doc_id, t.score, t.rank, s.snippet
FROM topk t JOIN snip s USING (doc_id)
"""


def synonym_sql(synonyms: tuple[str, ...], k: int = 10) -> str:
    """SynonymQuery twin: per-doc tf = sum of member tfs, df = max member
    df, one BM25 evaluation over the blend — same formula spelling as
    bm25_topk_sql so the float expressions are identical."""
    inlist = ", ".join(f"'{t}'" for t in sorted(set(synonyms)))
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks
  WHERE term IN ({inlist}) GROUP BY 1, 2
),
dfb AS (
  SELECT max(df)::DOUBLE AS df_b
  FROM (SELECT count(*) AS df FROM postings GROUP BY term)
),
blended AS (
  SELECT doc_id, sum(tf) AS tf FROM postings GROUP BY 1
),
scored AS (
  SELECT b.doc_id,
         round(ln(1 + (s.n_docs - d.df_b + 0.5) / (d.df_b + 0.5))
           * (b.tf * {K1 + 1.0})
           / (b.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl)), 6) AS score
  FROM blended b
  JOIN doclens l USING (doc_id)
  CROSS JOIN dfb d
  CROSS JOIN stats s
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def dismax_sql(
    subqueries: tuple[str, str], tie: float = 0.3, k: int = 10
) -> str:
    """DisjunctionMaxQuery twin: per-subquery BM25 doc scores (the
    bm25_topk_sql spec per term set), fused per doc as
    max + tie * (non-max sum) — with two subqueries the non-max sum is
    min when both match, 0 otherwise."""
    from lucene_mapreduce_spark.functions.tokenize import tokenize_string

    qrows = []
    allterms: set[str] = set()
    for i, q in enumerate(subqueries):
        ts = sorted(set(tokenize_string(q)))
        allterms.update(ts)
        arr = ", ".join(f"'{t}'" for t in ts)
        qrows.append(f"SELECT 'd{i}' AS query_id, unnest([{arr}]) AS term")
    inlist = ", ".join(f"'{t}'" for t in sorted(allterms))
    qcte = " UNION ALL ".join(qrows)
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks
  WHERE term IN ({inlist}) GROUP BY 1, 2
),
q AS ({qcte}),
dft AS (
  SELECT term, count(*)::DOUBLE AS df_t FROM postings GROUP BY 1
),
scored AS (
  SELECT q.query_id, p.doc_id,
         ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * (p.tf * {K1 + 1.0})
           / (p.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl)) AS contrib
  FROM postings p
  JOIN q USING (term)
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
),
agg AS (
  SELECT query_id, doc_id, sum(contrib) AS score FROM scored GROUP BY 1, 2
),
fused AS (
  SELECT doc_id,
         round(max(score) + {tie} * CASE WHEN count(*) > 1
               THEN min(score) ELSE 0.0::DOUBLE END, 6) AS score
  FROM agg GROUP BY 1
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM fused
) WHERE rank <= {k}
"""


def block_join_sql(query_text: str, width: int = 8, k: int = 10) -> str:
    """ToParentBlockJoin twin (ScoreMode.Max): the bm25 per-doc scores
    rolled up to docid-block parents — max child score + child count."""
    qlit = query_text.replace("'", "''")
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
dft AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
scored AS (
  SELECT p.doc_id,
         ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * (p.tf * {K1 + 1.0})
           / (p.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl)) AS contrib
  FROM postings p
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
),
agg AS (
  SELECT doc_id, sum(contrib) AS score FROM scored GROUP BY 1
),
parents AS (
  SELECT (doc_id // {width})::BIGINT AS parent_id,
         round(max(score), 6) AS score,
         count(*)::BIGINT AS n_children
  FROM agg GROUP BY 1
)
SELECT parent_id, score, n_children, rank FROM (
  SELECT parent_id, score, n_children,
         row_number() OVER (ORDER BY score DESC, parent_id ASC) AS rank
  FROM parents
) WHERE rank <= {k}
"""


def range_facets_sql(
    query_text: str,
    ranges: tuple[tuple[int, int], ...],
    fld: str = "n_chars",
) -> str:
    """LongRangeFacetCounts twin: [lo, hi) bucket counts of the numeric
    field over the full disjunctive hit set."""
    from lucene_mapreduce_spark.functions.tokenize import tokenize_string

    terms = sorted(set(tokenize_string(query_text)))
    hit = " OR ".join(f"list_contains(toks, '{t}')" for t in terms)
    case = " ".join(
        f"WHEN {fld} >= {lo} AND {fld} < {hi} THEN '[{lo},{hi})'"
        for lo, hi in ranges
    )
    return f"""
WITH hits AS (
  SELECT doc_id FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
  WHERE {hit}
),
b AS (
  SELECT CASE {case} END AS bucket
  FROM documents d JOIN hits USING (doc_id)
)
SELECT bucket, count(*)::BIGINT AS n_docs FROM b
WHERE bucket IS NOT NULL GROUP BY 1
"""


def rrf_sql(
    query_text: str, depth: int = 50, k: int = 10, rrf_k: int = 60
) -> str:
    """Reciprocal-rank-fusion twin: the bm25 top-`depth` and the exact
    cosine top-`depth` (vec_id=0 probe, query vec excluded — same
    convention as ann_bruteforce_topk) full-outer joined, each list
    contributing 1/(rrf_k + rank)."""
    return f"""
WITH lex AS ({bm25_topk_sql(query_text, k=depth)}),
qv AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0),
vec AS (
  SELECT vec_id AS doc_id, rank FROM (
    SELECT vec_id, row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS rank
    FROM (
      SELECT vec_id,
             round(list_dot_product(embedding::DOUBLE[], qvec)
                   / (sqrt(list_dot_product(embedding::DOUBLE[],
                                            embedding::DOUBLE[]))
                      * sqrt(list_dot_product(qvec, qvec))), 6) AS cosine
      FROM embeddings, qv WHERE vec_id <> 0
    )
  ) WHERE rank <= {depth}
),
fused AS (
  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
         round(coalesce(1.0::DOUBLE / ({rrf_k} + l.rank), 0.0::DOUBLE)
               + coalesce(1.0::DOUBLE / ({rrf_k} + v.rank), 0.0::DOUBLE),
               6) AS rrf
  FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
)
SELECT doc_id, rrf, rank FROM (
  SELECT doc_id, rrf,
         row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS rank
  FROM fused
) WHERE rank <= {k}
"""


def explain_sql(query_text: str, doc_id: int) -> str:
    """IndexSearcher.explain twin: per-term tf/df/idf/contribution for one
    (query, doc) pair — the same formula pieces as bm25_topk_sql."""
    qlit = query_text.replace("'", "''")
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
dft AS (
  SELECT p.term, count(*)::BIGINT AS df_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
)
SELECT p.term, p.tf, d.df_t,
       round(ln(1 + (s.n_docs - d.df_t::DOUBLE + 0.5)
                    / (d.df_t::DOUBLE + 0.5)), 6) AS idf,
       round(ln(1 + (s.n_docs - d.df_t::DOUBLE + 0.5)
                    / (d.df_t::DOUBLE + 0.5))
             * (p.tf::DOUBLE * {K1 + 1.0})
             / (p.tf::DOUBLE + {K1} * (1 - {B} + {B} * l.dl / s.avgdl)),
             6) AS contrib
FROM postings p
JOIN dft d USING (term)
JOIN doclens l USING (doc_id)
CROSS JOIN stats s
WHERE p.doc_id = {doc_id}
"""


def drill_sideways_sql(
    query_text: str, fld: str = "lang", val: str = "en"
) -> str:
    """DrillSideways twin: the drilled dim counts the undrilled hit set,
    the other dim counts inside the drill-down."""
    from lucene_mapreduce_spark.functions.tokenize import tokenize_string

    other = "source" if fld == "lang" else "lang"
    terms = sorted(set(tokenize_string(query_text)))
    hit = " OR ".join(f"list_contains(toks, '{t}')" for t in terms)
    return f"""
WITH hits AS (
  SELECT doc_id FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
  WHERE {hit}
)
SELECT '{fld}' AS dim, d.{fld} AS value, count(*)::BIGINT AS n_docs
FROM documents d JOIN hits USING (doc_id) GROUP BY 2
UNION ALL
SELECT '{other}' AS dim, d.{other} AS value, count(*)::BIGINT AS n_docs
FROM documents d JOIN hits USING (doc_id)
WHERE d.{fld} = '{val}' GROUP BY 2
"""


def kmv_sql(k: int) -> str:
    """KMV sketch twin: the k lexicographically-parsed-smallest md5
    52-bit prefixes of the distinct vocabulary; the one float division
    is identical IEEE both engines."""
    return f"""
WITH terms AS (
  SELECT DISTINCT unnest({TOKS}) AS term FROM documents
),
hashed AS (
  SELECT list_reduce(
           list_transform(string_split(substr(md5(term), 1, 13), ''),
                          c -> (strpos('0123456789abcdef', c) - 1)::BIGINT),
           (a, b) -> a * 16 + b) AS h
  FROM terms
),
kth AS (
  SELECT max(h)::BIGINT AS kth_hash
  FROM (SELECT h FROM hashed ORDER BY h ASC LIMIT {k})
),
n AS (SELECT count(*)::BIGINT AS n_exact FROM terms)
SELECT n.n_exact, kth.kth_hash,
       round({float((k - 1) * (1 << 52))} / kth.kth_hash::DOUBLE, 6)
         AS estimate
FROM n CROSS JOIN kth
"""


def span_first_sql(term: str, end: int) -> str:
    """SpanFirstQuery twin: the term inside the first `end` tokens
    (DuckDB lists are 1-based; the sidecar is 0-based — same span)."""
    return f"""
SELECT doc_id FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
WHERE list_contains(list_slice(toks, 1, {end}), '{term}')
ORDER BY doc_id
"""


def span_not_sql(include: str, exclude: str, dist: int) -> str:
    """SpanNotQuery twin: an `include` occurrence with no `exclude`
    within `dist` positions."""
    return f"""
SELECT doc_id FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
WHERE len(list_filter(range(1, len(toks) + 1), i ->
      toks[i] = '{include}'
  AND len(list_filter(range(greatest(1, i - {dist}),
                            least(len(toks), i + {dist}) + 1),
                      j -> toks[j] = '{exclude}')) = 0)) > 0
ORDER BY doc_id
"""


def dl_percentiles_sql(ps: tuple[float, ...]) -> str:
    """Type-7 quantile twin: DuckDB quantile_cont matches Spark's exact
    `percentile` (h = (n-1)p linear interpolation)."""
    rows = " UNION ALL ".join(
        f"SELECT {p}::DOUBLE AS p, round(quantile_cont(dl, {p}), 6)"
        f" AS dl_quantile FROM dls"
        for p in ps
    )
    return f"""
WITH dls AS (SELECT len({TOKS}) AS dl FROM documents)
{rows}
"""


def rescore_sql(
    query_text: str,
    phrase: tuple[str, str],
    weight: float,
    n: int = 50,
    k: int = 10,
) -> str:
    """QueryRescorer twin: first-pass top-n + phrase-boost second pass."""
    a, b = phrase
    return f"""
WITH base AS ({bm25_topk_sql(query_text, k=n)}),
ph AS (
  SELECT doc_id FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
  WHERE len(list_filter(range(1, len(toks)),
            i -> toks[i] = '{a}' AND toks[i+1] = '{b}')) > 0
),
combined AS (
  SELECT base.doc_id,
         round(base.score + {weight} * CASE WHEN ph.doc_id IS NULL
               THEN 0.0::DOUBLE ELSE 1.0::DOUBLE END, 6) AS score
  FROM base LEFT JOIN ph USING (doc_id)
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM combined
) WHERE rank <= {k}
"""


def function_score_sql(query_text: str, k: int = 10) -> str:
    """FunctionScoreQuery twin: BM25 per-doc score * ln(1 + n_chars)."""
    qlit = query_text.replace("'", "''")
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
dft AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
scored AS (
  SELECT p.doc_id,
         ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * (p.tf * {K1 + 1.0})
           / (p.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl)) AS contrib
  FROM postings p
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
),
agg AS (
  SELECT doc_id, sum(contrib) AS score FROM scored GROUP BY 1
),
fused AS (
  SELECT a.doc_id,
         round(a.score * ln(1.0 + d.n_chars::DOUBLE), 6) AS score
  FROM agg a JOIN documents d USING (doc_id)
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM fused
) WHERE rank <= {k}
"""


_SHINGLES = f"""
tok AS (SELECT doc_id, {TOKS} AS tokens FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2] AS shingle
  FROM (
    SELECT doc_id, tokens, unnest(range(1, len(tokens) - 1)) AS i
    FROM tok WHERE len(tokens) >= 3
  )
)"""

_EN_STOP = "('the','a','of','and','to','in','is','it')"

ORACLES: dict[str, str] = {
    # ------------------------------------------------------------- dedup
    "exact_dedup": """
SELECT md5(text) AS text_md5, min(doc_id) AS keeper_doc_id, count(*)::BIGINT AS n_copies
FROM documents GROUP BY 1
""",
    "ngram_jaccard_pairs": f"""
WITH {_SHINGLES},
shc AS (
  SELECT doc_id, shingle FROM (
    SELECT *, count(*) OVER (PARTITION BY shingle) AS bn FROM sh
  ) WHERE bn <= 100
),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM shc GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_inter
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.5
""",
    "gopher_rules": f"""
WITH d AS (SELECT doc_id, {TOKS} AS toks FROM documents),
base AS (
  SELECT doc_id, len(toks)::BIGINT AS n_tokens,
    CASE WHEN len(toks) > 0 THEN round(
      list_sum(list_transform(toks, x -> len(x)))::DOUBLE / len(toks), 6)
      ELSE 0.0 END AS mean_token_len,
    CASE WHEN len(toks) >= 3 THEN round(
      1.0 - len(list_distinct(list_transform(range(1, len(toks) - 1),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))::DOUBLE
      / (len(toks) - 2), 6)
      ELSE 0.0 END AS frac_dup_3gram,
    CASE WHEN len(toks) > 0 THEN round(
      list_max(list_transform(list_distinct(toks),
        t -> len(list_filter(toks, x -> x = t))))::DOUBLE / len(toks), 6)
      ELSE 0.0 END AS top_token_frac
  FROM d
)
SELECT doc_id, n_tokens, mean_token_len, frac_dup_3gram, top_token_frac,
       (n_tokens BETWEEN 5 AND 10000
        AND mean_token_len BETWEEN 2.0 AND 12.0
        AND frac_dup_3gram <= 0.3
        AND top_token_frac <= 0.3) AS keep
FROM base
""",
    "contamination_check": f"""
WITH {_SHINGLES},
shc AS (
  SELECT doc_id, shingle FROM (
    SELECT *, count(*) OVER (PARTITION BY shingle) AS bn FROM sh
  ) WHERE bn <= 100
),
ev AS (SELECT doc_id AS eval_doc_id, shingle FROM shc WHERE doc_id % 97 = 0),
tr AS (SELECT doc_id AS train_doc_id, shingle FROM shc WHERE doc_id % 97 <> 0)
SELECT train_doc_id, count(DISTINCT eval_doc_id)::BIGINT AS n_eval_docs,
       count(*)::BIGINT AS n_shared
FROM tr JOIN ev USING (shingle)
GROUP BY 1
""",
    "minhash_signatures": f"""
WITH {_SHINGLES}
SELECT doc_id, i::INT AS i, min(md5(i::VARCHAR || ':' || shingle)) AS sig
FROM sh, range(0, 12) t(i)
GROUP BY 1, 2
""",
    "minhash_lsh_pairs": f"""
WITH {_SHINGLES},
sigs AS (
  SELECT doc_id, i, min(md5(i::VARCHAR || ':' || shingle)) AS sig
  FROM sh, range(0, 12) t(i) GROUP BY 1, 2
),
banded AS (
  SELECT doc_id, (i // 3)::INT AS band,
         md5(string_agg(i::VARCHAR || ':' || sig, '|' ORDER BY i)) AS band_key
  FROM sigs GROUP BY doc_id, (i // 3)::INT
),
capped AS (
  SELECT doc_id, band, band_key FROM (
    SELECT *, count(*) OVER (PARTITION BY band, band_key) AS bn FROM banded
  ) WHERE bn <= 100
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM capped a JOIN capped b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
""",
    "simhash": f"""
WITH tok AS (SELECT doc_id, unnest({TOKS}) AS token FROM documents),
tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
h AS (SELECT doc_id, tf, md5('0:' || token) || md5('1:' || token) AS h FROM tf),
per_bit AS (
  SELECT doc_id, j,
         sum(tf * CASE WHEN substr(h, (j + 1)::INT, 1)
                        IN ('1','3','5','7','9','b','d','f')
                  THEN 1 ELSE -1 END)::BIGINT AS s
  FROM h, range(0, 64) t(j) GROUP BY 1, 2
)
SELECT doc_id,
       sum(CASE WHEN s > 0 AND j >= 32 THEN (1::BIGINT << (j - 32)::INT) ELSE 0 END)::BIGINT AS simhash_hi,
       sum(CASE WHEN s > 0 AND j < 32 THEN (1::BIGINT << j::INT) ELSE 0 END)::BIGINT AS simhash_lo
FROM per_bit GROUP BY 1
""",
    "simhash_near_pairs": f"""
WITH tok AS (SELECT doc_id, unnest({TOKS}) AS token FROM documents),
tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
h AS (SELECT doc_id, tf, md5('0:' || token) || md5('1:' || token) AS h FROM tf),
per_bit AS (
  SELECT doc_id, j,
         sum(tf * CASE WHEN substr(h, (j + 1)::INT, 1)
                        IN ('1','3','5','7','9','b','d','f')
                  THEN 1 ELSE -1 END)::BIGINT AS s
  FROM h, range(0, 64) t(j) GROUP BY 1, 2
),
fp AS (
  SELECT doc_id,
         sum(CASE WHEN s > 0 AND j >= 32 THEN (1::BIGINT << (j - 32)::INT) ELSE 0 END)::BIGINT AS hi,
         sum(CASE WHEN s > 0 AND j < 32 THEN (1::BIGINT << j::INT) ELSE 0 END)::BIGINT AS lo
  FROM per_bit GROUP BY 1
),
banded AS (
  SELECT doc_id, hi, lo, band,
         ((CASE WHEN band < 2 THEN lo ELSE hi END) >> ((band % 2) * 16)) & 65535 AS band_val
  FROM fp, range(0, 4) t(band)
),
capped AS (
  SELECT doc_id, hi, lo, band, band_val FROM (
    SELECT *, count(*) OVER (PARTITION BY band, band_val) AS bn FROM banded
  ) WHERE bn <= 100
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.hi AS hi_a, a.lo AS lo_a, b.hi AS hi_b, b.lo AS lo_b
  FROM capped a JOIN capped b
    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       (bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)))::INT AS hamming
FROM cand WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) <= 12
""",
    # ------------------------------------------------------------- similarity
    "ann_batch_topk": """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec
  FROM embeddings WHERE vec_id % 101 = 0
)
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
         ) AS rank
  FROM (
    SELECT q.query_id, e.vec_id,
           round(list_dot_product(e.embedding::DOUBLE[], q.qvec)
                 / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                          e.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(q.qvec, q.qvec))), 6) AS cosine
    FROM embeddings e, q WHERE e.vec_id <> q.query_id
  )
) WHERE rank <= 5
""",
    "ann_bruteforce_topk": """
WITH q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0)
SELECT vec_id, cosine, rank FROM (
  SELECT vec_id, cosine,
         row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM (
    SELECT vec_id,
           round(list_dot_product(embedding::DOUBLE[], qvec)
                 / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                    * sqrt(list_dot_product(qvec, qvec))), 6) AS cosine
    FROM embeddings, q WHERE vec_id <> 0
  )
) WHERE rank <= 10
""",
    # embedding_near_dup_pairs / ann_lsh_topk: generated below (literal
    # hyperplane sign matrices shared with operators/similarity.py)
    # ------------------------------------------------------------- multimodal
    # the media table is derived from documents doc_ids with md5 ASCII
    # payloads (multimodal.media_from_documents), so decoded stats have a
    # closed form; mean/std evaluate the SAME float expression on the SAME
    # exact integers as the Spark kernel (bit-identical)
    "media_decode_stats": """
WITH d AS (SELECT doc_id FROM documents),
img AS (
  SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 'image' ELSE 'audio' END AS kind,
         1 + (doc_id % 4) AS r, md5(doc_id::VARCHAR) AS hx
  FROM d WHERE doc_id % 3 <> 2
),
ib AS (SELECT doc_id, kind, r, ascii(substr(hx, i::INT, 1)) AS v
       FROM img, range(1, 33) t(i)),
ia AS (SELECT doc_id, kind, max(r) AS r, sum(v)::BIGINT AS s, sum(v*v)::BIGINT AS sq
       FROM ib GROUP BY 1, 2),
istats AS (
  SELECT doc_id AS media_id, kind, (32*r)::BIGINT AS n, (s*r)::BIGINT AS s,
         (sq*r)::BIGINT AS sq
  FROM ia
),
vid AS (SELECT doc_id, 2 + (doc_id % 5) AS rate FROM d WHERE doc_id % 3 = 2),
vb AS (SELECT doc_id, unnest(range(0, rate)) AS f FROM vid),
vv AS (SELECT doc_id, ascii(substr(md5((doc_id*1000+f)::VARCHAR), i::INT, 1)) AS v
       FROM vb, range(1, 33) t(i)),
vstats AS (
  SELECT doc_id AS media_id, 'video' AS kind, count(*)::BIGINT AS n,
         sum(v)::BIGINT AS s, sum(v*v)::BIGINT AS sq
  FROM vv GROUP BY 1
),
allstats AS (SELECT * FROM istats UNION ALL SELECT * FROM vstats)
SELECT media_id, kind, n AS n_bytes, s AS sum_bytes,
       round(s / n, 6) AS mean_val,
       round(sqrt(sq / n - (s / n) * (s / n)), 6) AS std_val
FROM allstats
""",
    "media_frame_stats": """
WITH vid AS (SELECT doc_id, 2 + (doc_id % 5) AS rate
             FROM documents WHERE doc_id % 3 = 2),
fr AS (SELECT doc_id, unnest(range(0, rate, 2)) AS f FROM vid),
fv AS (SELECT doc_id, f,
              ascii(substr(md5((doc_id*1000+f)::VARCHAR), i::INT, 1)) AS v
       FROM fr, range(1, 33) t(i)),
agg AS (SELECT doc_id AS media_id, f::INT AS frame_idx,
               count(*)::BIGINT AS n_bytes, sum(v)::BIGINT AS sum_bytes
        FROM fv GROUP BY 1, 2)
SELECT media_id, frame_idx, n_bytes, sum_bytes,
       round(sum_bytes / n_bytes, 6) AS mean_val
FROM agg
""",
    # ------------------------------------------------------------- textstats
    "language_id": f"""
WITH t AS (SELECT doc_id, list_distinct({TOKS}) AS toks FROM documents),
s AS (
  SELECT doc_id,
    len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it'))) AS en,
    len(list_filter(toks, x -> x IN ('el','la','de','y','en','que','es','un'))) AS es,
    len(list_filter(toks, x -> x IN ('der','die','das','und','in','zu','ist','ein'))) AS de,
    len(list_filter(toks, x -> x IN ('le','la','de','et','en','que','est','un'))) AS fr
  FROM t
)
SELECT doc_id,
  CASE WHEN greatest(en, es, de, fr) <= 0 THEN 'und'
       WHEN en = greatest(en, es, de, fr) THEN 'en'
       WHEN es = greatest(en, es, de, fr) THEN 'es'
       WHEN de = greatest(en, es, de, fr) THEN 'de'
       ELSE 'fr' END AS pred_lang
FROM s
""",
    "quality_score": f"""
WITH b AS (
  SELECT doc_id, text, {TOKS} AS toks,
         length(text) AS n_char,
         length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha
  FROM documents
),
c AS (
  SELECT doc_id, len(toks) AS n_tok, n_char, n_punct, n_alpha,
         len(list_filter(toks, t -> t IN {_EN_STOP})) AS n_stop,
         greatest(len(toks), 1) AS safe_tok, greatest(n_char, 1) AS safe_char
  FROM b
)
SELECT doc_id, n_tok::INT AS n_tokens,
  round((n_char - (n_tok - 1)) / safe_tok::DOUBLE, 6) AS mean_token_len,
  round(n_punct / safe_char::DOUBLE, 6) AS punct_ratio,
  round(n_alpha / safe_char::DOUBLE, 6) AS alpha_ratio,
  round(n_stop / safe_tok::DOUBLE, 6) AS stopword_ratio,
  round(0.4 * least(n_tok / 50.0, 1.0)
      + 0.3 * (n_alpha / safe_char::DOUBLE)
      + 0.2 * (1.0 - n_punct / safe_char::DOUBLE)
      + 0.1 * least(n_stop / safe_tok::DOUBLE * 5.0, 1.0), 6) AS quality
FROM c
""",
    "token_counts": f"""
SELECT doc_id,
       len({TOKS})::INT AS ws_tokens,
       len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9 ]'))::INT AS bpe_ish_tokens
FROM documents
""",
    "stratified_sample": """
SELECT doc_id, source, bucket FROM (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 2))::INT AS INT) AS bucket
  FROM documents
) WHERE bucket * 100 < 25 * 256
""",
    "token_length_histogram": f"""
SELECT source, (floor(len({TOKS}) / 10) * 10)::BIGINT AS len_bucket,
       count(*)::BIGINT AS n_docs
FROM documents GROUP BY 1, 2
""",
    "doc_fingerprint": """
SELECT doc_id, min(md5(substr(text, i, 8))) AS fingerprint
FROM (
  SELECT doc_id, text,
         unnest(range(1, greatest(length(text) - 7, 1) + 1, 4)) AS i
  FROM documents
)
GROUP BY doc_id
""",
    # ------------------------------------------------------------- fulltext
    "term_df": f"""
WITH toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
p AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2)
SELECT term, count(*)::BIGINT AS df_t, sum(tf)::BIGINT AS cf_t, max(tf)::BIGINT AS max_tf
FROM p GROUP BY 1
""",
    "corpus_stats": f"""
WITH dl AS (SELECT doc_id, len({TOKS}) AS dl FROM documents)
SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS total_tokens,
       round(avg(dl::DOUBLE), 6) AS avgdl
FROM dl
""",
    "boolean_and_query": f"""
SELECT doc_id FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
WHERE list_contains(toks, 'table') AND list_contains(toks, 'merge')
""",
    "boolean_or_query": f"""
SELECT doc_id FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
WHERE list_contains(toks, 'table') OR list_contains(toks, 'merge')
""",
    "boolean_and_not_query": f"""
SELECT doc_id FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
WHERE list_contains(toks, 'table') AND NOT list_contains(toks, 'merge')
""",
    # unordered proximity: some 4-token window contains both terms (window
    # starts past len-4 are truncated slices — subsets of earlier full
    # windows, so they never add matches; equivalent to the 0-based scan)
    "near_query": f"""
SELECT doc_id FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
WHERE len(list_filter(range(1, len(toks) + 1), i ->
      list_contains(list_slice(toks, i, i + 3), 'table')
  AND list_contains(list_slice(toks, i, i + 3), 'merge'))) > 0
""",
    "phrase_query": f"""
SELECT doc_id FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
WHERE len(list_filter(range(1, len(toks)),
          i -> toks[i] = 'fast' AND toks[i+1] = 'merge')) > 0
""",
    # the positional-sidecar answer paths must match the SAME semantics
    "near_query_positions": f"""
SELECT doc_id FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
WHERE len(list_filter(range(1, len(toks) + 1), i ->
      list_contains(list_slice(toks, i, i + 3), 'table')
  AND list_contains(list_slice(toks, i, i + 3), 'merge'))) > 0
""",
    "phrase_query_positions": f"""
SELECT doc_id FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
WHERE len(list_filter(range(1, len(toks)),
          i -> toks[i] = 'fast' AND toks[i+1] = 'merge')) > 0
""",
    # ordered slop-1: 'fast' then 'merge' within the next 2 positions
    "phrase_slop_query": f"""
SELECT doc_id FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
WHERE len(list_filter(range(1, len(toks) + 1), i ->
      toks[i] = 'fast'
  AND list_contains(list_slice(toks, i + 1, i + 2), 'merge'))) > 0
""",
    "phrase_match_batch": f"""
SELECT doc_id FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
WHERE len(list_filter(range(1, len(toks)),
          i -> toks[i] = 'fast' AND toks[i+1] = 'merge')) > 0
""",
    "pure_field_query": """
SELECT doc_id FROM documents WHERE lang = 'de' ORDER BY doc_id
""",
    "numeric_range_query": """
SELECT doc_id FROM documents WHERE n_chars BETWEEN 100 AND 300
ORDER BY doc_id
""",
    "field_facets": f"""
SELECT lang AS value, count(*)::BIGINT AS n_docs
FROM (SELECT doc_id, lang, {TOKS} AS toks FROM documents)
WHERE list_contains(toks, 'table') OR list_contains(toks, 'merge')
GROUP BY 1 ORDER BY 1
""",
    "boolean_match_batch": f"""
SELECT doc_id FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
WHERE list_contains(toks, 'table') AND list_contains(toks, 'merge')
""",
    "near_match_batch": f"""
SELECT doc_id FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
WHERE len(list_filter(range(1, len(toks) + 1), i ->
      list_contains(list_slice(toks, i, i + 3), 'table')
  AND list_contains(list_slice(toks, i, i + 3), 'merge'))) > 0
""",
    "doc_tf": f"""
WITH toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
p AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2)
SELECT doc_id, term, tf FROM p WHERE substr(md5(term), 1, 1) = '0'
""",
    # ------------------------------------------------------------- streaming
    # single-micro-batch run of the stateful operator == per-conv aggregate
    # (turn_idx is the 0-based per-conv rank, so max = count-1)
    "streaming_conversation_progress": """
SELECT user_id::VARCHAR AS conv_id, count(*)::BIGINT AS turns_seen,
       (count(*) - 1)::INT AS max_turn_idx, max(ts) AS last_ts
FROM events GROUP BY user_id
""",
    "streaming_windowed_counts": """
SELECT date_trunc('day', ts)::TIMESTAMP AS day, event_type AS role,
       count(*)::BIGINT AS n_turns
FROM events GROUP BY 1, 2
""",
    # context-window chunking (range is end-exclusive = sequence inclusive)
    "token_windows": f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents)
SELECT doc_id,
       ((i - 1) // 25)::INT AS win_idx,
       len(list_slice(toks, i::INT, i::INT + 49))::BIGINT AS n_tokens,
       array_to_string(list_slice(toks, i::INT, i::INT + 49), ' ')
         AS window_text
FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1, 25)) AS i FROM t)
""",
    # index integrity: manifest stats + dictionary cardinality vs raw corpus
    "index_stats": f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents)
SELECT count(*)::BIGINT AS n_docs,
       coalesce(sum(len(toks)), 0)::BIGINT AS total_tokens,
       (SELECT count(DISTINCT term)
        FROM (SELECT unnest(toks) AS term FROM t))::BIGINT AS n_terms
FROM t
""",
    # single-micro-batch run of the stateful dedup == min doc_id per hash
    "streaming_exact_dedup": """
SELECT md5(text) AS text_md5, min(doc_id)::BIGINT AS doc_id
FROM documents GROUP BY 1
""",
    # ------------------------------------------------------------- A-family
    "latest_per_key": """
SELECT user_id, event_type AS last_event_type, round(value, 6) AS last_value, ts AS last_ts
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
    "count_per_key": """
SELECT user_id, count(*)::BIGINT AS n_events FROM events GROUP BY user_id
""",
    "distinct_projection": """
SELECT DISTINCT user_id, event_type FROM events
""",
    "session_rollup": """
WITH per_type AS (
  SELECT user_id, event_type, count(*)::BIGINT AS cnt FROM events GROUP BY 1, 2
),
maps AS (
  SELECT user_id, string_agg(event_type || ':' || cnt, ',' ORDER BY event_type) AS type_counts
  FROM per_type GROUP BY 1
),
spans AS (
  SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts,
         round(sum(value), 6) AS total_value
  FROM events GROUP BY 1
)
SELECT s.user_id, s.first_ts, s.last_ts, s.total_value, m.type_counts
FROM spans s JOIN maps m USING (user_id)
""",
    "global_stats_argmax": """
WITH per_key AS (SELECT user_id, count(*)::BIGINT AS cnt FROM events GROUP BY 1)
SELECT count(*)::BIGINT AS n_keys, sum(cnt)::BIGINT AS n_records,
       (SELECT user_id FROM per_key ORDER BY cnt DESC, user_id DESC LIMIT 1) AS max_key,
       max(cnt)::BIGINT AS max_cnt
FROM per_key
""",
    "topk_per_key": """
SELECT user_id, event_id, round(value, 6) AS value, rank FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rank
  FROM events
) WHERE rank <= 5
""",
    # ------------------------------------------------------------- J-family
    "index_lookup_join": """
SELECT o_orderkey, o_custkey, c_name AS cust_name, c_nationkey AS cust_nation,
       round(o_totalprice, 6) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
""",
    "index_lookup_join_with_misses": """
SELECT event_id, e.user_id, c_name AS cust_name, c_name IS NOT NULL AS matched
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
""",
    "generation_fallback": """
WITH g AS (
  SELECT user_id, date_trunc('week', ts)::TIMESTAMP AS gen, ts, event_id, event_type
  FROM events
),
newest AS (
  SELECT user_id, gen AS hit_gen, event_type AS hit_event_type FROM (
    SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY gen DESC, ts DESC, event_id DESC) AS rn
    FROM g
  ) WHERE rn = 1
)
SELECT c.c_custkey AS user_id, n.hit_gen, n.hit_event_type,
       n.hit_gen IS NULL AS remained
FROM customer c LEFT JOIN newest n ON c.c_custkey = n.user_id
""",
    "ttl_anti_join": """
SELECT l_orderkey, count(*)::BIGINT AS n_lines,
       round(sum(l_extendedprice), 4) AS total_price
FROM lineitem
WHERE l_orderkey NOT IN (
  SELECT o_orderkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
)
GROUP BY 1
""",
    "pair_symmetrize": """
SELECT o_orderkey AS key, o_custkey AS paired, 'order2cust' AS direction FROM orders
UNION ALL
SELECT o_custkey AS key, o_orderkey AS paired, 'cust2order' AS direction FROM orders
""",
    "tagged_union_merge": """
WITH state AS (
  SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts, count(*)::BIGINT AS cnt
  FROM events WHERE ts < TIMESTAMP '2024-01-08' GROUP BY 1
),
delta AS (
  SELECT user_id, min(ts) AS d_first_ts, max(ts) AS d_last_ts, count(*)::BIGINT AS d_cnt
  FROM events WHERE ts >= TIMESTAMP '2024-01-08' GROUP BY 1
)
SELECT coalesce(s.user_id, d.user_id) AS user_id,
       least(s.first_ts, d.d_first_ts) AS first_ts,
       greatest(s.last_ts, d.d_last_ts) AS last_ts,
       (coalesce(s.cnt, 0) + coalesce(d.d_cnt, 0))::BIGINT AS cnt
FROM state s FULL OUTER JOIN delta d ON s.user_id = d.user_id
""",
    "multi_source_union": """
WITH u AS (
  SELECT o_orderkey::BIGINT AS key, 'orders' AS vendor, o_totalprice AS amount FROM orders
  UNION ALL
  SELECT l_orderkey::BIGINT AS key, 'lineitem' AS vendor, l_extendedprice AS amount FROM lineitem
)
SELECT key, vendor, round(sum(amount), 4) AS amount_sum FROM u GROUP BY 1, 2
""",
    "newest_k_generations": """
WITH g AS (SELECT DISTINCT date_trunc('week', ts)::TIMESTAMP AS gen FROM events),
newest AS (SELECT gen FROM g ORDER BY gen DESC LIMIT 3)
SELECT date_trunc('week', ts)::TIMESTAMP AS gen, count(*)::BIGINT AS n_events,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM events
WHERE date_trunc('week', ts)::TIMESTAMP IN (SELECT gen FROM newest)
GROUP BY 1
""",
    "first_wins_dedup": """
SELECT user_id, event_type, event_id AS first_event_id,
       min(ts) OVER (PARTITION BY user_id, event_type) AS first_ts
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC) AS rn
  FROM events
) WHERE rn = 1
""",
    "coalesce_defaults": """
SELECT event_id,
       coalesce(nullif(event_type, ''), 'unknown') AS etype,
       coalesce(value, 0.0) AS val,
       coalesce(nullif(props, ''), '{}') AS props_n
FROM events
""",
    # ------------------------------------------------------------- P-family
    "field_extract_filter": """
SELECT event_id, etype, val, uid FROM (
  SELECT event_id, coalesce(event_type, '\\N') AS etype,
         value AS val, user_id AS uid
  FROM events
) WHERE etype <> '\\N' AND val IS NOT NULL AND val > 0
""",
    "dictionary_filter": """
SELECT event_type, count(*)::BIGINT AS n FROM events
WHERE event_type IN ('click', 'view', 'purchase') GROUP BY 1
""",
    "url_host_md5": """
SELECT doc_id, md5(source || '.example.com') AS host_md5 FROM documents
""",
    "ts_parse_roundtrip": """
SELECT event_id,
       cast(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS epoch_s,
       strftime(date_trunc('day', ts) + INTERVAL 3 DAY, '%Y-%m-%d') AS slot_end
FROM events
""",
    # P4 — vendor control-char line parse (XdiReportScreen6Mapper.java:16-40).
    # Same deterministic line reconstitution as parity.vendor_line_parse:
    # chr(1)=^A field delimiter, chr(2)=^B strippable prefix marker.
    "vendor_line_parse": """
WITH lines AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0 THEN chr(2) || ' k' || doc_id || ' '
         ELSE ' k' || doc_id || ' ' END AS kraw,
    CASE WHEN doc_id % 7 = 0 THEN '\\N'
         WHEN doc_id % 11 = 0 THEN ''
         WHEN doc_id % 5 = 0 THEN chr(2) || 'v-' || source
         ELSE source END AS vraw
  FROM documents
), raw AS (
  SELECT CASE WHEN doc_id % 13 = 0 THEN kraw
              ELSE kraw || chr(1) || vraw || chr(1) || 'x' || doc_id END AS line
  FROM lines
), parts AS (
  SELECT str_split(line, chr(1)) AS w FROM raw
  WHERE len(str_split(line, chr(1))) > 1
), cleaned AS (
  SELECT trim(regexp_replace(w[1], '^' || chr(2), '')) AS k,
         trim(regexp_replace(w[2], '^' || chr(2), '')) AS v
  FROM parts
), valid AS (
  SELECT k, v FROM cleaned
  WHERE k <> '' AND k <> '\\N' AND v <> '' AND v <> '\\N'
)
SELECT out_key, out_val, count(*)::BIGINT AS n FROM (
  SELECT v AS out_key, k || '&screen6' AS out_val FROM valid
  UNION ALL
  SELECT k AS out_key, v || '&screen6' AS out_val FROM valid
) GROUP BY 1, 2
""",
}


# ---------------------------------------------------------------- LSH twins
# The hyperplane sign matrix is a constant (md5-derived, see
# similarity.plane_signs); both engines evaluate the SAME literal +-1
# vectors, and every dot product is an explicit left-to-right +-chain —
# bit-identical to Spark's sequential `aggregate` fold, so bucket
# membership (and therefore the row set) matches exactly.

def _dot_chain(vec_expr: str, plane_idx: int) -> str:
    from lucene_mapreduce_spark.operators.similarity import plane_signs

    return " + ".join(
        f"{vec_expr}[{j + 1}]*{s}" for j, s in enumerate(plane_signs(plane_idx))
    )


def _sig_expr(vec_expr: str, first_plane: int, n_planes: int) -> str:
    return " || ".join(
        f"(CASE WHEN ({_dot_chain(vec_expr, first_plane + p)}) > 0 "
        f"THEN '1' ELSE '0' END)"
        for p in range(n_planes)
    )


def _ann_lsh_sql() -> str:
    from lucene_mapreduce_spark.operators.similarity import (
        ANN_PLANES,
        ANN_PROBE_HAMMING,
        ANN_TABLES,
        QUERY_VEC_ID,
    )

    sig_cols = ",\n       ".join(
        f"{_sig_expr('v', t * ANN_PLANES, ANN_PLANES)} AS s{t}"
        for t in range(ANN_TABLES)
    )
    near = " OR ".join(
        f"len(list_filter(range(1, {ANN_PLANES + 1}), "
        f"i -> substr(s.s{t}, i::INT, 1) <> substr(q.s{t}, i::INT, 1))) "
        f"<= {ANN_PROBE_HAMMING}"
        for t in range(ANN_TABLES)
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sig AS (
SELECT vec_id, v,
       {sig_cols}
FROM e
),
q AS (SELECT * FROM sig WHERE vec_id = {QUERY_VEC_ID}),
cand AS (
  SELECT s.vec_id, s.v FROM sig s, q
  WHERE s.vec_id <> {QUERY_VEC_ID} AND ({near})
),
scored AS (
  SELECT c.vec_id,
         round(list_dot_product(c.v, q.v)
               / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.v, q.v))), 6)
           AS cosine
  FROM cand c, q
)
SELECT vec_id, cosine, rank FROM (
  SELECT vec_id, cosine,
         row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
"""


def _near_dup_sql() -> str:
    from lucene_mapreduce_spark.operators.similarity import (
        _NDUP_PLANE_BASE,
        NDUP_BANDS,
        NDUP_MAX_BUCKET,
        NDUP_PLANES_PER_BAND,
    )

    branches = "\n  UNION ALL\n".join(
        f"  SELECT vec_id, {b} AS band, "
        f"{_sig_expr('v', _NDUP_PLANE_BASE + b * NDUP_PLANES_PER_BAND, NDUP_PLANES_PER_BAND)}"
        f" AS band_key FROM e"
        for b in range(NDUP_BANDS)
    )
    cos = (
        "list_dot_product(ea.v, eb.v) / (sqrt(list_dot_product(ea.v, ea.v)) "
        "* sqrt(list_dot_product(eb.v, eb.v)))"
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
banded AS (
{branches}
),
capped AS (
  SELECT vec_id, band, band_key FROM (
    SELECT *, count(*) OVER (PARTITION BY band, band_key) AS bn FROM banded
  ) WHERE bn <= {NDUP_MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM capped a JOIN capped b
    ON a.band = b.band AND a.band_key = b.band_key AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, round({cos}, 6) AS cosine
FROM cand
JOIN e ea ON ea.vec_id = vec_a
JOIN e eb ON eb.vec_id = vec_b
WHERE round({cos}, 6) >= 0.35
"""


def _ann_ivf_sql() -> str:
    """IVF twin: assignment = per-vector argmax cosine over the C centroid
    vectors (row_number window = the Spark side's array-of-structs max);
    probe = the query's nprobe nearest centroids; rescore exact.  The
    zero-norm guard (-2.0) mirrors ivf._cosine_guarded."""
    from lucene_mapreduce_spark.operators.ivf import (
        N_CENTROIDS_MIN,
        N_PROBE,
        TARGET_LIST_SIZE,
    )
    from lucene_mapreduce_spark.operators.similarity import QUERY_VEC_ID

    def cos(a: str, b: str) -> str:
        return (
            f"CASE WHEN list_dot_product({a}, {a}) = 0"
            f" OR list_dot_product({b}, {b}) = 0 THEN -2.0"
            f" ELSE list_dot_product({a}, {b})"
            f" / (sqrt(list_dot_product({a}, {a}))"
            f" * sqrt(list_dot_product({b}, {b}))) END"
        )

    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (
  SELECT vec_id AS cid, v AS cv FROM e
  WHERE vec_id BETWEEN 1 AND
    (SELECT greatest({N_CENTROIDS_MIN}, count(*) // {TARGET_LIST_SIZE}) FROM e)
),
q AS (SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID}),
probe AS (
  SELECT cid FROM (
    SELECT c.cid,
           row_number() OVER (ORDER BY {cos("q.qv", "c.cv")} DESC, c.cid ASC)
             AS rn
    FROM cents c, q
  ) WHERE rn <= {N_PROBE}
),
assign AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos("e.v", "c.cv")} DESC, c.cid ASC)
             AS rn
    FROM e, cents c
  ) WHERE rn = 1
),
scored AS (
  SELECT a.vec_id, round({cos("a.v", "q.qv")}, 6) AS cosine
  FROM assign a JOIN probe p ON a.cid = p.cid, q
  WHERE a.vec_id <> {QUERY_VEC_ID}
)
SELECT vec_id, cosine, rank FROM (
  SELECT vec_id, cosine,
         row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
"""


def _ann_ivf_batch_sql(
    k: int = 5, qmod: int = 101, nprobe: int | None = None
) -> str:
    """Batch-IVF twin: per-query probe sets AND assignments computed in
    SQL (probe selection is NOT imported from the engine — the oracle
    independently derives which lists each query probes)."""
    from lucene_mapreduce_spark.operators.ivf import (
        N_CENTROIDS_MIN,
        N_PROBE,
        TARGET_LIST_SIZE,
    )

    if nprobe is None:
        nprobe = N_PROBE

    def cos(a: str, b: str) -> str:
        return (
            f"CASE WHEN list_dot_product({a}, {a}) = 0"
            f" OR list_dot_product({b}, {b}) = 0 THEN -2.0"
            f" ELSE list_dot_product({a}, {b})"
            f" / (sqrt(list_dot_product({a}, {a}))"
            f" * sqrt(list_dot_product({b}, {b}))) END"
        )

    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (
  SELECT vec_id AS cid, v AS cv FROM e
  WHERE vec_id BETWEEN 1 AND
    (SELECT greatest({N_CENTROIDS_MIN}, count(*) // {TARGET_LIST_SIZE}) FROM e)
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % {qmod} = 0),
probe AS (
  SELECT query_id, cid FROM (
    SELECT q.query_id, c.cid,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {cos("q.qv", "c.cv")} DESC, c.cid ASC)
             AS rn
    FROM cents c, q
  ) WHERE rn <= {nprobe}
),
assign AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos("e.v", "c.cv")} DESC, c.cid ASC)
             AS rn
    FROM e, cents c
  ) WHERE rn = 1
),
scored AS (
  SELECT q.query_id, a.vec_id, round({cos("a.v", "q.qv")}, 6) AS cosine
  FROM assign a
  JOIN probe p ON a.cid = p.cid
  JOIN q ON q.query_id = p.query_id
  WHERE a.vec_id <> q.query_id
)
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= {k}
"""


ORACLES["ann_lsh_topk"] = _ann_lsh_sql()
ORACLES["ann_ivf_topk"] = _ann_ivf_sql()
ORACLES["ann_ivf_batch_topk"] = _ann_ivf_batch_sql()
ORACLES["embedding_near_dup_pairs"] = _near_dup_sql()

# ------------------------------------------------------------- curation
# near-dup components: the Spark side runs iterative min-label propagation
# to a fixpoint; the oracle computes the same fixpoint as a recursive CTE
# (reach(v, l): label l is reachable from v; component = min reachable).
ORACLES["near_dup_components"] = f"""
WITH RECURSIVE pairs AS ({ORACLES["minhash_lsh_pairs"]}),
sym AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL SELECT doc_b AS u, doc_a AS v FROM pairs),
reach(v, l) AS (
  SELECT DISTINCT u AS v, u AS l FROM sym
  UNION
  SELECT s.v AS v, r.l AS l FROM sym s JOIN reach r ON r.v = s.u
)
SELECT v AS doc_id, min(l)::BIGINT AS component FROM reach GROUP BY 1
"""

# faceting over a boolean result set: language facet with quality bands
# (min/max of per-row ROUNDED quality — exact on both engines, no grouped
# float-sum nondeterminism)
ORACLES["search_facets"] = f"""
WITH hits AS ({ORACLES["boolean_or_query"]}),
lang AS ({ORACLES["language_id"]}),
q AS ({ORACLES["quality_score"]})
SELECT lang.pred_lang, count(*)::BIGINT AS n_docs,
       min(q.quality) AS min_quality, max(q.quality) AS max_quality
FROM hits JOIN lang USING (doc_id) JOIN q USING (doc_id)
GROUP BY 1
"""

ORACLES["curation_pipeline"] = f"""
WITH lang AS ({ORACLES["language_id"]}),
q AS ({ORACLES["quality_score"]}),
keepers AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
pairs AS ({ORACLES["ngram_jaccard_pairs"]}),
losers AS (SELECT DISTINCT doc_b AS doc_id FROM pairs)
SELECT d.doc_id, lang.pred_lang, q.quality,
       (k.doc_id IS NOT NULL) AS is_keeper,
       (l.doc_id IS NOT NULL) AS near_dup_loser,
       (lang.pred_lang = 'en' AND q.quality >= 0.5
        AND k.doc_id IS NOT NULL AND l.doc_id IS NULL) AS kept
FROM documents d
JOIN lang USING (doc_id)
JOIN q USING (doc_id)
LEFT JOIN keepers k ON k.doc_id = d.doc_id
LEFT JOIN losers l ON l.doc_id = d.doc_id
"""

# --------------------------------------------- substring-dup + DSIR family
# duplicate_ngram_fraction: token 5-gram positional duplication measure
# (operators/dedup.duplicate_ngram_fraction — Lee et al. 2021 shape)
ORACLES["duplicate_ngram_fraction"] = f"""
WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) - 3), i ->
           t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                || ' ' || t[i+4])) AS gram
  FROM toks WHERE len(t) >= 5
),
dup AS (
  SELECT gram FROM (
    SELECT gram, count(DISTINCT doc_id) AS gdf FROM g GROUP BY 1
  ) WHERE gdf >= 2
),
tot AS (SELECT doc_id, count(*)::BIGINT AS n_grams FROM g GROUP BY 1),
dups AS (
  SELECT doc_id, count(*)::BIGINT AS n_dup_grams
  FROM g JOIN dup USING (gram) GROUP BY 1
)
SELECT t.doc_id, t.n_grams,
       coalesce(d.n_dup_grams, 0)::BIGINT AS n_dup_grams,
       round(coalesce(d.n_dup_grams, 0) / t.n_grams::DOUBLE, 6) AS dup_fraction
FROM tot t LEFT JOIN dups d USING (doc_id)
"""

# dsir_importance_weights: hashed-bigram importance weights
# (operators/textstats.dsir_importance_weights — Xie et al. 2023 shape);
# md5-derived 256-bucket hashing shared with the Spark side
ORACLES["dsir_importance_weights"] = f"""
WITH toks AS (SELECT doc_id, lang, {TOKS} AS t FROM documents),
g AS (
  SELECT doc_id, lang, ('0x' || substr(md5(gram), 1, 2))::INT AS bucket
  FROM (
    SELECT doc_id, lang,
           unnest(list_transform(range(1, len(t)), i ->
             t[i] || ' ' || t[i+1])) AS gram
    FROM toks WHERE len(t) >= 2
  )
),
counts AS (
  SELECT bucket,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE AS t_b,
         count(*)::DOUBLE AS r_b
  FROM g GROUP BY 1
),
totals AS (SELECT sum(t_b) AS t_tot, sum(r_b) AS r_tot FROM counts),
lr AS (
  SELECT bucket,
         ln((t_b + 1) / (t_tot + 256)) - ln((r_b + 1) / (r_tot + 256)) AS lr
  FROM counts CROSS JOIN totals
),
per_bucket AS (
  SELECT doc_id, bucket, count(*)::BIGINT AS c_b FROM g GROUP BY 1, 2
)
SELECT p.doc_id, sum(p.c_b)::BIGINT AS n_grams,
       round(sum(p.c_b * l.lr), 6) AS weight
FROM per_bucket p JOIN lr l USING (bucket)
GROUP BY 1
"""

# the distributed sloppy-phrase twin must match the serving-path oracle
ORACLES["slop_match_batch"] = ORACLES["phrase_slop_query"]


# ------------------------------------------- unigram LM + semdedup family
# unigram_logprob: corpus-unigram cross-entropy (textstats.unigram_logprob
# — CCNet-style LM filtering stand-in, Wenzek et al. 2020 shape)
ORACLES["unigram_logprob"] = f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
model AS (SELECT term, count(*)::DOUBLE AS cf FROM toks GROUP BY 1),
totals AS (
  SELECT sum(cf) AS n_total, count(*)::DOUBLE AS vocab FROM model
),
lp AS (
  SELECT term, ln((cf + 1) / (n_total + vocab)) AS lp
  FROM model CROSS JOIN totals
),
per AS (SELECT doc_id, term, count(*)::BIGINT AS c_t FROM toks GROUP BY 1, 2)
SELECT p.doc_id, sum(p.c_t)::BIGINT AS n_tokens,
       round(-sum(p.c_t * l.lp) / sum(p.c_t), 6) AS cross_entropy
FROM per p JOIN lp l USING (term)
GROUP BY 1
"""


def _semdedup_sql() -> str:
    """SemDeDup twin (similarity.semdedup): assignment re-derived from the
    same 16-centroid quantizer as the IVF oracles; the per-cluster rank cap
    and the lowest-id-wins keep rule are replayed exactly."""
    from lucene_mapreduce_spark.operators.ivf import (
        N_CENTROIDS_MIN,
        TARGET_LIST_SIZE,
    )
    from lucene_mapreduce_spark.operators.similarity import (
        SEMDEDUP_MAX_CLUSTER,
        SEMDEDUP_THRESHOLD,
    )

    def cos(a: str, b: str) -> str:
        return (
            f"CASE WHEN list_dot_product({a}, {a}) = 0"
            f" OR list_dot_product({b}, {b}) = 0 THEN -2.0"
            f" ELSE list_dot_product({a}, {b})"
            f" / (sqrt(list_dot_product({a}, {a}))"
            f" * sqrt(list_dot_product({b}, {b}))) END"
        )

    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (
  SELECT vec_id AS cid, v AS cv FROM e
  WHERE vec_id BETWEEN 1 AND
    (SELECT greatest({N_CENTROIDS_MIN}, count(*) // {TARGET_LIST_SIZE}) FROM e)
),
assign AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos("e.v", "c.cv")} DESC, c.cid ASC)
             AS rn
    FROM e, cents c
  ) WHERE rn = 1
),
capped AS (
  SELECT vec_id, v, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY cid ORDER BY vec_id) AS crn
    FROM assign
  ) WHERE crn <= {SEMDEDUP_MAX_CLUSTER}
),
hits AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM capped a JOIN capped b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE round({cos("a.v", "b.v")}, 6) >= {SEMDEDUP_THRESHOLD}
),
sym AS (
  SELECT vec_a AS vec_id, vec_b AS nbr FROM hits
  UNION ALL
  SELECT vec_b, vec_a FROM hits
),
stats AS (
  SELECT vec_id, count(*)::BIGINT AS n_dups, min(nbr) AS min_nbr
  FROM sym GROUP BY 1
)
SELECT c.vec_id, c.cid AS list_id,
       coalesce(s.n_dups, 0)::BIGINT AS n_dups,
       (s.n_dups IS NULL OR s.min_nbr > c.vec_id) AS keep
FROM capped c LEFT JOIN stats s USING (vec_id)
"""


ORACLES["semdedup"] = _semdedup_sql()


def generation_sql(query_text: str, k: int = 10) -> str:
    """Point-in-time twin: BM25 over the UNMERGED gate index's generation-1
    corpus — even docs verbatim plus the stale odd copies batch 1 indexed
    ('stale shadowed ' prefix, _gate_index_unmerged's construction). The
    CTE shadows the `documents` view (DuckDB needs main. to reach it)."""
    base = bm25_topk_sql(query_text, k)
    pit_cte = """documents AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 1
              THEN 'stale shadowed ' || text ELSE text END AS text
  FROM main.documents
),
"""
    return base.replace("WITH doclens AS", "WITH " + pit_cte + "doclens AS", 1)


def to_child_sql(query_text: str, width: int = 8, k: int = 5) -> str:
    """ToChildBlockJoin twin: top-k parents by max child score, then every
    child of those parents carrying the parent's score."""
    qlit = query_text.replace("'", "''")
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
dft AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
scored AS (
  SELECT p.doc_id,
         ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * (p.tf * {K1 + 1.0})
           / (p.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl)) AS contrib
  FROM postings p
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
),
agg AS (
  SELECT doc_id, sum(contrib) AS score FROM scored GROUP BY 1
),
parents AS (
  SELECT (doc_id // {width})::BIGINT AS parent_id,
         round(max(score), 6) AS score
  FROM agg GROUP BY 1
),
top AS (
  SELECT parent_id, score FROM (
    SELECT parent_id, score,
           row_number() OVER (ORDER BY score DESC, parent_id ASC) AS rn
    FROM parents
  ) WHERE rn <= {k}
)
SELECT d.doc_id, t.parent_id, t.score,
       row_number() OVER (
         ORDER BY t.score DESC, t.parent_id ASC, d.doc_id ASC
       ) AS rank
FROM documents d
JOIN top t ON (d.doc_id // {width})::BIGINT = t.parent_id
ORDER BY rank
"""


_MD5_52 = (
    "list_reduce(list_transform(string_split(substr(md5({e}), 1, 13), ''),"
    " c -> (strpos('0123456789abcdef', c) - 1)::BIGINT),"
    " (a, b) -> a * 16 + b)"
)


def cms_sql(rows: int = 4, width: int = 8192, k: int = 10) -> str:
    """Count-min twin: identical md5-bucket rows, bucket sums, and min-over-
    rows estimates for the exact top-k heavy hitters."""
    bucket = _MD5_52.format(e="'cms' || r::VARCHAR || ':' || term") + f" % {width}"
    return f"""
WITH toks AS (
  SELECT unnest({TOKS}) AS term FROM documents
),
cf AS (
  SELECT term, count(*)::BIGINT AS cf FROM toks GROUP BY 1
),
rs AS (SELECT unnest(range(0, {rows})) AS r),
cells AS (
  SELECT rs.r, {bucket} AS bucket, cf.cf
  FROM cf CROSS JOIN rs
),
sketch AS (
  SELECT r, bucket, sum(cf)::BIGINT AS cell FROM cells GROUP BY 1, 2
),
hh AS (
  SELECT term, cf, rank FROM (
    SELECT term, cf,
           row_number() OVER (ORDER BY cf DESC, term ASC) AS rank
    FROM cf
  ) WHERE rank <= {k}
),
hh_cells AS (
  SELECT hh.term, hh.cf, hh.rank, rs.r, {bucket} AS bucket
  FROM hh CROSS JOIN rs
),
est AS (
  SELECT h.term, h.cf, h.rank, min(s.cell)::BIGINT AS cf_est
  FROM hh_cells h JOIN sketch s USING (r, bucket)
  GROUP BY 1, 2, 3
)
SELECT term, cf, cf_est, rank FROM est ORDER BY rank
"""


def lmdirichlet_sql(query_text: str, mu: float = 2000.0, k: int = 10) -> str:
    """LMDirichletSimilarity twin: identical float expression shape
    (ln(1 + tf/(mu*(cf_t/total))) + ln(mu/(dl+mu)), clamped at 0 per term),
    canonical-order-safe because DuckDB's per-group sum matches the
    sequential spec on the gate query sizes (same contract as bm25 sums)."""
    qlit = query_text.replace("'", "''")
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
tot AS (
  SELECT sum(dl)::DOUBLE AS total FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
cft AS (
  SELECT p.term, sum(p.tf)::DOUBLE AS cf_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
scored AS (
  SELECT p.doc_id, p.term,
         greatest(0.0, ln(1.0 + p.tf::DOUBLE / ({mu} * (c.cf_t / t.total)))
                       + ln({mu} / (l.dl::DOUBLE + {mu}))) AS contrib
  FROM postings p
  JOIN cft c USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN tot t
),
agg AS (
  SELECT doc_id, round(sum(contrib), 6) AS score FROM scored GROUP BY 1
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM agg
) WHERE rank <= {k}
"""


def taxonomy_sql(query_text: str) -> str:
    """Taxonomy-facet twin: GROUP BY ROLLUP(source, lang) over the OR hit
    set, NULL lattice slots as '<all>'."""
    from lucene_mapreduce_spark.functions.tokenize import tokenize_string

    terms = sorted(set(tokenize_string(query_text)))
    hit = " OR ".join(f"list_contains(toks, '{t}')" for t in terms)
    return f"""
WITH hits AS (
  SELECT doc_id FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
  WHERE {hit}
)
SELECT coalesce(source, '<all>') AS source,
       coalesce(lang, '<all>') AS lang,
       count(*)::BIGINT AS n_docs
FROM documents d JOIN hits USING (doc_id)
GROUP BY ROLLUP (source, lang)
"""


# ------------------------------------------------- round-3 session-4 batch
def constant_score_sql(term: str, lo: float, hi: float, boost: float) -> str:
    """ConstantScoreQuery twin: filter hits score exactly the boost."""
    return f"""
SELECT doc_id, {boost} AS score
FROM (SELECT doc_id, n_chars, {TOKS} AS toks FROM documents)
WHERE n_chars BETWEEN {lo} AND {hi} AND list_contains(toks, '{term}')
ORDER BY doc_id
"""


def filter_clause_sql(should: str, filt: str, k: int = 10) -> str:
    """Occur.FILTER twin: scores over the SHOULD terms with FULL corpus
    stats; the filter term constrains matches scorelessly; filter-only
    docs match at 0.0."""
    qlit = should.replace("'", "''")
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
dft AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
scored AS (
  SELECT p.doc_id,
         ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * (p.tf * {K1 + 1.0}) / (p.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl))
           AS contrib
  FROM postings p
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
),
agg AS (
  SELECT doc_id, round(sum(contrib), 6) AS score FROM scored GROUP BY 1
),
hits AS (
  SELECT DISTINCT doc_id FROM toks WHERE term = '{filt}'
),
j AS (
  SELECT h.doc_id, coalesce(a.score, 0.0) AS score
  FROM hits h LEFT JOIN agg a USING (doc_id)
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM j
) WHERE rank <= {k}
"""


def terms_set_sql(terms: list[str]) -> str:
    """TermsSetQuery / CoveringQuery twin: per-doc minimum from n_chars."""
    inlist = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return f"""
WITH toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
m AS (
  SELECT doc_id, count(DISTINCT term)::BIGINT AS n_matched
  FROM toks WHERE term IN ({inlist}) GROUP BY 1
)
SELECT d.doc_id, m.n_matched, (1 + d.n_chars % 3)::BIGINT AS required
FROM m JOIN documents d USING (doc_id)
WHERE m.n_matched >= 1 + d.n_chars % 3
ORDER BY doc_id
"""


def common_terms_sql(query_text: str, max_tf: float, k: int = 10) -> str:
    """CommonTermsQuery twin: terms with df/N > maxTermFrequency demoted
    to SHOULD; rare terms are MUST; score credits every matched term."""
    qlit = query_text.replace("'", "''")
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
dft AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
low AS (
  SELECT q.term FROM qterms q LEFT JOIN dft d USING (term) CROSS JOIN stats s
  WHERE coalesce(d.df_t, 0) / s.n_docs <= {max_tf}
),
cand AS (
  SELECT doc_id FROM postings JOIN low USING (term)
  GROUP BY doc_id
  HAVING count(DISTINCT term) = (SELECT count(*) FROM low)
),
scored AS (
  SELECT p.doc_id,
         ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * (p.tf * {K1 + 1.0}) / (p.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl))
           AS contrib
  FROM postings p
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
),
agg AS (
  SELECT doc_id, round(sum(contrib), 6) AS score FROM scored GROUP BY 1
),
sel AS (
  SELECT a.doc_id, a.score FROM agg a
  WHERE (SELECT count(*) FROM low) = 0
     OR a.doc_id IN (SELECT doc_id FROM cand)
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM sel
) WHERE rank <= {k}
"""


def span_or_near_sql(a: str, b: str, c: str, dist: int) -> str:
    """SpanNear(SpanOr(a, b), c, slop) twin: an (a|b) occurrence within
    `dist` positions of a `c` occurrence."""
    return f"""
SELECT doc_id FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
WHERE len(list_filter(range(1, len(toks) + 1), i ->
      toks[i] IN ('{a}', '{b}')
  AND len(list_filter(range(greatest(1, i - {dist}),
                            least(len(toks), i + {dist}) + 1),
                      j -> toks[j] = '{c}')) > 0)) > 0
ORDER BY doc_id
"""


def hit_stats_sql(terms: list[str]) -> str:
    """Numeric stats facet twin: per-lang stats of n_chars over the
    disjunctive hit set."""
    inlist = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return f"""
WITH toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN ({inlist}))
SELECT d.lang AS lang,
       count(*)::BIGINT AS n_docs,
       min(d.n_chars)::BIGINT AS min_chars,
       max(d.n_chars)::BIGINT AS max_chars,
       sum(d.n_chars)::BIGINT AS sum_chars,
       round(avg(d.n_chars::DOUBLE), 6) AS avg_chars
FROM hits h JOIN documents d USING (doc_id)
GROUP BY 1 ORDER BY 1
"""


ORACLES["cluster_representative"] = f"""
WITH comp AS (SELECT * FROM ({ORACLES["near_dup_components"]}) t),
dls AS (SELECT doc_id, len({TOKS}) AS dl FROM documents),
j AS (SELECT c.component, c.doc_id, d.dl FROM comp c JOIN dls d USING (doc_id)),
r AS (
  SELECT component, doc_id AS kept_doc_id, dl AS kept_dl,
         row_number() OVER (PARTITION BY component
                            ORDER BY dl DESC, doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY component) AS n_members
  FROM j
)
SELECT component, kept_doc_id, kept_dl::BIGINT AS kept_dl,
       n_members::BIGINT AS n_members
FROM r WHERE rn = 1 ORDER BY component
"""


# streaming session windows: gaps-and-islands twin (gap = 1 hour; a gap of
# exactly 1 hour starts a new session — Spark session windows are
# end-exclusive; session_end = last event + gap). Both window passes order
# by (ts, event_id): duplicate timestamps are common (sf1 has 180k per-user
# ties) and with ORDER BY ts alone the lag pass and the running-sum pass
# may sort ties differently, splitting a session into two groups with
# identical bounds — Spark's session_window is tie-order-invariant, so the
# twin must be too.
ORACLES["streaming_session_windows"] = """
WITH e AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
),
x AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) IS NULL
                OR ts - lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   >= INTERVAL 1 HOUR
              THEN 1 ELSE 0 END AS brk
  FROM e
),
y AS (
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM x
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 1 HOUR AS session_end,
       count(*)::BIGINT AS n_events
FROM y GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


def bm25f_sql(
    query_text: str,
    kw_field: str = "source",
    w_text: float = 1.0,
    w_kw: float = 2.0,
    k: int = 10,
) -> str:
    """BM25F twin: field-weighted tf (text length-normalized, keyword not),
    idf over any-field df."""
    qlit = query_text.replace("'", "''")
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
tt AS (
  SELECT p.doc_id, p.term, p.tf AS tf_text
  FROM postings p JOIN qterms q USING (term)
),
kw AS (
  SELECT doc_id, {kw_field} AS term, 1.0 AS tf_kw FROM documents
  WHERE {kw_field} IN (SELECT term FROM qterms)
),
m AS (
  SELECT coalesce(t.doc_id, w.doc_id) AS doc_id,
         coalesce(t.term, w.term) AS term,
         coalesce(t.tf_text, 0) AS tf_text,
         coalesce(w.tf_kw, 0) AS tf_kw
  FROM tt t FULL JOIN kw w ON t.doc_id = w.doc_id AND t.term = w.term
),
dfa AS (
  SELECT term, count(*)::DOUBLE AS df_any FROM m GROUP BY 1
),
mm AS (
  SELECT m.doc_id, m.term,
         {w_text} * m.tf_text
           / ((1 - {B}) + {B} * coalesce(l.dl, 0)::DOUBLE / s.avgdl)
           + {w_kw} * m.tf_kw AS tfn
  FROM m LEFT JOIN doclens l USING (doc_id) CROSS JOIN stats s
),
scored AS (
  SELECT mm.doc_id,
         ln(1 + (s.n_docs - d.df_any + 0.5) / (d.df_any + 0.5))
           * mm.tfn / ({K1} + mm.tfn) AS contrib
  FROM mm JOIN dfa d USING (term) CROSS JOIN stats s
),
agg AS (
  SELECT doc_id, round(sum(contrib), 6) AS score FROM scored GROUP BY 1
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM agg
) WHERE rank <= {k}
"""


def infix_suggest_sql(infix: str, k: int = 5) -> str:
    """infix suggester twin: contains-matched vocabulary ranked by cf."""
    p = infix.replace("'", "''")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
d AS (SELECT term, count(*)::BIGINT AS cf FROM toks GROUP BY 1)
SELECT term, cf, rank
FROM (
  SELECT term, cf,
         row_number() OVER (ORDER BY cf DESC, term ASC) AS rank
  FROM d WHERE position('{p}' IN term) > 0
)
WHERE rank <= {k}
"""


def term_vectors_sql(doc_id: int) -> str:
    """TermVectors twin: (term, tf, position) rows of one doc recomputed
    from the raw text (0-based positions, ascending)."""
    return f"""
WITH d AS (SELECT {TOKS} AS toks FROM documents WHERE doc_id = {doc_id}),
p AS (
  SELECT toks[i] AS term, (i - 1)::INT AS pos
  FROM d, unnest(range(1, len(toks) + 1)) AS t(i)
),
tf AS (SELECT term, count(*)::BIGINT AS tf FROM p GROUP BY 1)
SELECT p.term, tf.tf, p.pos
FROM p JOIN tf USING (term)
ORDER BY p.term, p.pos
"""


def percolate_sql(queries: tuple[tuple[str, str], ...]) -> str:
    """Percolator twin: conjunctive registered queries vs every doc."""
    from lucene_mapreduce_spark.functions.tokenize import tokenize_string

    reg_rows = []
    for qid, qtext in queries:
        for t in sorted(set(tokenize_string(qtext))):
            reg_rows.append(f"SELECT '{qid}' AS query_id, '{t}' AS term")
    reg = " UNION ALL ".join(reg_rows)
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest({TOKS}) AS term FROM documents
),
reg AS ({reg}),
need AS (SELECT query_id, count(*) AS n_terms FROM reg GROUP BY 1)
SELECT r.query_id, t.doc_id
FROM toks t JOIN reg r USING (term)
GROUP BY r.query_id, t.doc_id
HAVING count(DISTINCT t.term) = (
  SELECT n_terms FROM need WHERE need.query_id = r.query_id
)
ORDER BY query_id, doc_id
"""


ORACLES["events_rollup"] = """
WITH base AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         round(value, 6)::DECIMAL(18,6) AS v
  FROM events
)
SELECT coalesce(event_type, '<all>') AS event_type,
       coalesce(day::VARCHAR, '<all>') AS day,
       count(*)::BIGINT AS n_events,
       (sum(v))::DOUBLE AS sum_value
FROM base GROUP BY ROLLUP (event_type, day)
ORDER BY event_type, day
"""


_BM25_AGG = f"""
doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
dft AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
scored AS (
  SELECT p.doc_id,
         ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * (p.tf * {K1 + 1.0})
           / (p.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl)) AS contrib
  FROM postings p
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
),
agg AS (
  SELECT doc_id, sum(contrib) AS score FROM scored GROUP BY 1
)
"""


def _qterms_cte(query_text: str) -> str:
    qlit = query_text.replace("'", "''")
    return f"""qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),"""


def lmjelinekmercer_sql(query_text: str, lam: float = 0.7, k: int = 10) -> str:
    """LMJelinekMercerSimilarity twin: per-term
    ln(1 + ((1-λ)·tf/dl) / (λ·cf_t/total)), always positive."""
    qlit = query_text.replace("'", "''")
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
tot AS (
  SELECT sum(dl)::DOUBLE AS total FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
cft AS (
  SELECT p.term, sum(p.tf)::DOUBLE AS cf_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
scored AS (
  SELECT p.doc_id, p.term,
         ln(1.0 + ({1.0 - lam} * p.tf::DOUBLE / l.dl::DOUBLE)
                  / ({lam} * (c.cf_t / t.total))) AS contrib
  FROM postings p
  JOIN cft c USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN tot t
),
agg AS (
  SELECT doc_id, round(sum(contrib), 6) AS score FROM scored GROUP BY 1
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM agg
) WHERE rank <= {k}
"""


def boosting_sql(
    query_text: str, neg_term: str, negative_boost: float, k: int = 10
) -> str:
    """Boosting-query twin: BM25 score × negative_boost when the doc also
    contains the negative term."""
    return f"""
WITH {_qterms_cte(query_text)}
{_BM25_AGG},
fused AS (
  SELECT a.doc_id,
         round(a.score * CASE WHEN a.doc_id IN (
             SELECT doc_id FROM postings WHERE term = '{neg_term}')
           THEN {negative_boost} ELSE 1.0 END, 6) AS score
  FROM agg a
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM fused
) WHERE rank <= {k}
"""


def span_within_sql(a: str, b: str, dist: int, c: str) -> str:
    """SpanWithin twin: a `c` occurrence inside the [min, max] envelope
    of an (a, b) pair at most `dist` apart."""
    return f"""
SELECT doc_id FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
WHERE len(list_filter(range(1, len(toks) + 1), i ->
      toks[i] = '{a}'
  AND len(list_filter(range(1, len(toks) + 1), j ->
          toks[j] = '{b}' AND abs(i - j) <= {dist}
      AND len(list_filter(range(least(i, j), greatest(i, j) + 1),
                          p -> toks[p] = '{c}')) > 0)) > 0)) > 0
ORDER BY doc_id
"""


def top_hits_sql(query_text: str, per_bucket: int = 3) -> str:
    """top_hits-aggregation twin: best per_bucket BM25 docs per lang."""
    return f"""
WITH {_qterms_cte(query_text)}
{_BM25_AGG},
j AS (
  SELECT d.lang, a.doc_id, round(a.score, 6) AS score
  FROM agg a JOIN documents d USING (doc_id)
)
SELECT lang, doc_id, score, rank FROM (
  SELECT lang, doc_id, score,
         row_number() OVER (PARTITION BY lang
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM j
) WHERE rank <= {per_bucket}
ORDER BY lang, rank
"""


def matched_queries_sql(clauses: tuple[tuple[str, str], ...]) -> str:
    """matched_queries twin: per doc the sorted names of the named
    conjunctive clauses it satisfies."""
    from lucene_mapreduce_spark.functions.tokenize import tokenize_string

    reg_rows = []
    for name, qtext in clauses:
        for t in sorted(set(tokenize_string(qtext))):
            reg_rows.append(f"SELECT '{name}' AS name, '{t}' AS term")
    reg = " UNION ALL ".join(reg_rows)
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest({TOKS}) AS term FROM documents
),
reg AS ({reg}),
need AS (SELECT name, count(*) AS n_terms FROM reg GROUP BY 1),
per_clause AS (
  SELECT r.name, t.doc_id
  FROM toks t JOIN reg r USING (term)
  GROUP BY r.name, t.doc_id
  HAVING count(DISTINCT t.term) = (
    SELECT n_terms FROM need WHERE need.name = r.name
  )
)
SELECT doc_id, string_agg(name, ',' ORDER BY name) AS matched
FROM per_clause GROUP BY doc_id ORDER BY doc_id
"""


def random_score_sql(seed: str, k: int = 10) -> str:
    """random_score twin: md5(seed:doc_id) 52-bit prefix / 2^52."""
    return f"""
WITH hashed AS (
  SELECT doc_id,
         list_reduce(
           list_transform(
             string_split(substr(md5('{seed}:' || doc_id::VARCHAR), 1, 13), ''),
             c -> (strpos('0123456789abcdef', c) - 1)::BIGINT),
           (a, b) -> a * 16 + b) AS h
  FROM documents
)
, rounded AS (
  SELECT doc_id, round(h::DOUBLE / {float(1 << 52)!r}, 6) AS score
  FROM hashed
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM rounded
) WHERE rank <= {k}
"""


def decay_sql(
    query_text: str,
    origin: float,
    scale: float,
    ln_decay: float,
    k: int = 10,
) -> str:
    """gauss-decay function_score twin: BM25 × exp(ln_decay·(x-o)²/s²)
    on n_chars; ln_decay passed pre-folded so both engines share the
    literal."""
    return f"""
WITH {_qterms_cte(query_text)}
{_BM25_AGG},
fused AS (
  SELECT a.doc_id,
         round(a.score * exp({ln_decay!r}
               * ((d.n_chars::DOUBLE - {origin!r}) * (d.n_chars::DOUBLE - {origin!r}))
               / {scale * scale!r}), 6) AS score
  FROM agg a JOIN documents d USING (doc_id)
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM fused
) WHERE rank <= {k}
"""


def highlight_sql(query_text: str, k: int = 5, width: int = 3) -> str:
    """Multi-fragment highlighter twin: every query-term occurrence in
    the top-k docs with its (2·width+1)-token window. list_slice's
    inclusive end == Spark slice(start, 2w+1)."""
    from lucene_mapreduce_spark.functions.tokenize import tokenize_string

    qts = sorted(set(tokenize_string(query_text)))
    inlist = ", ".join(f"'{t}'" for t in qts)
    return f"""
WITH {_qterms_cte(query_text)}
{_BM25_AGG},
topk AS (
  SELECT doc_id, round(score, 6) AS score, rank FROM (
    SELECT doc_id, score,
           row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
    FROM agg
  ) WHERE rank <= {k}
),
tk AS (SELECT doc_id, {TOKS} AS tokens FROM documents),
frags AS (
  SELECT t.doc_id, t.score, t.rank, (r.i - 1)::INT AS pos,
         array_to_string(
           list_slice(d.tokens, greatest(1, r.i - {width}),
                      greatest(1, r.i - {width}) + {2 * width}), ' ') AS snippet
  FROM topk t
  JOIN tk d USING (doc_id),
  unnest(range(1, len(d.tokens) + 1)) AS r(i)
  WHERE d.tokens[r.i] IN ({inlist})
)
SELECT doc_id, score, rank, pos, snippet FROM frags ORDER BY doc_id, pos
"""


def phrase_suggest_sql(
    w1: str, w2: str, max_dist: int = 2, k: int = 5
) -> str:
    """Phrase-suggester twin: per-word levenshtein candidates from the
    corpus vocabulary, pairs ranked by adjacent-bigram count."""
    return f"""
WITH tk AS (SELECT {TOKS} AS tokens FROM documents),
big AS (
  SELECT tokens[r.i] AS t1, tokens[r.i + 1] AS t2, count(*)::BIGINT AS n
  FROM tk, unnest(range(1, len(tokens))) AS r(i)
  WHERE len(tokens) >= 2
  GROUP BY 1, 2
),
vocab AS (
  SELECT DISTINCT unnest({TOKS}) AS term FROM documents
),
c1 AS (SELECT term AS t1 FROM vocab WHERE levenshtein(term, '{w1}') <= {max_dist}),
c2 AS (SELECT term AS t2 FROM vocab WHERE levenshtein(term, '{w2}') <= {max_dist})
SELECT t1, t2, n, rank FROM (
  SELECT b.t1, b.t2, b.n,
         row_number() OVER (ORDER BY b.n DESC, b.t1 ASC, b.t2 ASC) AS rank
  FROM big b JOIN c1 USING (t1) JOIN c2 USING (t2)
) WHERE rank <= {k}
"""


def ann_recall_sql(k: int = 5) -> str:
    """recall@k of the IVF batch vs the exact brute batch, per query —
    both legs are the INDEPENDENT oracle derivations (probe selection and
    assignment recomputed in SQL, nothing imported from the engine)."""
    brute = ORACLES["ann_batch_topk"]
    ivf = _ann_ivf_batch_sql(k=k)
    return f"""
WITH brute AS (SELECT query_id, vec_id FROM ({brute})),
ivf AS (SELECT query_id, vec_id FROM ({ivf})),
hits AS (
  SELECT i.query_id, count(*)::BIGINT AS n_hits
  FROM ivf i JOIN brute b USING (query_id, vec_id)
  GROUP BY 1
),
qs AS (SELECT DISTINCT query_id FROM brute)
SELECT q.query_id,
       coalesce(h.n_hits, 0)::BIGINT AS n_hits,
       round(coalesce(h.n_hits, 0)::DOUBLE / {float(k)!r}, 6) AS recall
FROM qs q LEFT JOIN hits h USING (query_id)
ORDER BY query_id
"""


def funnel_sql(steps: tuple[str, ...]) -> str:
    """Ordered-funnel twin: per-user strictly-increasing first-occurrence
    frontier, one CTE per step."""
    ctes, prev = [], None
    for i, step in enumerate(steps):
        name = f"s{i + 1}"
        if prev is None:
            ctes.append(
                f"{name} AS (SELECT user_id, min(ts) AS t FROM events"
                f" WHERE event_type = '{step}' GROUP BY 1)"
            )
        else:
            ctes.append(
                f"{name} AS (SELECT e.user_id, min(e.ts) AS t FROM events e"
                f" JOIN {prev} USING (user_id)"
                f" WHERE e.event_type = '{step}' AND e.ts > {prev}.t GROUP BY 1)"
            )
        prev = name
    selects = " UNION ALL ".join(
        f"SELECT '{i + 1}_{step}' AS step, count(*)::BIGINT AS n_users FROM s{i + 1}"
        for i, step in enumerate(steps)
    )
    return f"WITH {', '.join(ctes)} {selects}"


ORACLES["retention_cohorts"] = """
WITH ev AS (
  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events
),
first AS (SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY 1),
cells AS (
  SELECT e.user_id, f.cohort_week,
         ((e.week - f.cohort_week) // 7)::INT AS week_offset
  FROM ev e JOIN first f USING (user_id)
)
SELECT cohort_week::VARCHAR AS cohort_week, week_offset,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM cells GROUP BY 1, 2 ORDER BY 1, 2
"""


def histogram_sql(terms: list[str], width: int) -> str:
    """Hit-set numeric histogram twin: floor(n_chars/width)*width buckets."""
    inlist = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return f"""
WITH toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN ({inlist}))
SELECT (floor(d.n_chars::DOUBLE / {width}) * {width})::BIGINT AS bucket,
       count(*)::BIGINT AS n_docs
FROM hits h JOIN documents d USING (doc_id)
GROUP BY 1 ORDER BY 1
"""


def adjacency_sql(clauses: tuple[tuple[str, str], ...]) -> str:
    """adjacency_matrix twin: per-filter and pairwise-intersection doc
    counts, ES key format 'a' / 'a&b'."""
    from lucene_mapreduce_spark.functions.tokenize import tokenize_string

    reg_rows = []
    for name, qtext in clauses:
        for t in sorted(set(tokenize_string(qtext))):
            reg_rows.append(f"SELECT '{name}' AS name, '{t}' AS term")
    reg = " UNION ALL ".join(reg_rows)
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest({TOKS}) AS term FROM documents
),
reg AS ({reg}),
need AS (SELECT name, count(*) AS n_terms FROM reg GROUP BY 1),
per_clause AS (
  SELECT r.name, t.doc_id
  FROM toks t JOIN reg r USING (term)
  GROUP BY r.name, t.doc_id
  HAVING count(DISTINCT t.term) = (
    SELECT n_terms FROM need WHERE need.name = r.name
  )
)
SELECT CASE WHEN a.name = b.name THEN a.name
            ELSE a.name || '&' || b.name END AS key,
       count(*)::BIGINT AS n_docs
FROM per_clause a JOIN per_clause b USING (doc_id)
WHERE a.name <= b.name
GROUP BY 1 ORDER BY 1
"""


def composite_sql(after: tuple[str, str], size: int) -> str:
    """composite-aggregation twin: cursor-paged (source, lang) buckets."""
    a_src, a_lang = after
    return f"""
SELECT source, lang, count(*)::BIGINT AS n_docs
FROM documents
GROUP BY 1, 2
HAVING source > '{a_src}' OR (source = '{a_src}' AND lang > '{a_lang}')
ORDER BY source, lang
LIMIT {size}
"""


def filtered_ann_sql(label: int, k: int = 10) -> str:
    """Pre-filtered kNN twin: label predicate applied before scoring."""
    return f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0)
SELECT vec_id, cosine, rank FROM (
  SELECT vec_id, cosine,
         row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM (
    SELECT vec_id,
           round(list_dot_product(embedding::DOUBLE[], qvec)
                 / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                    * sqrt(list_dot_product(qvec, qvec))), 6) AS cosine
    FROM embeddings, q WHERE vec_id <> 0 AND label = {label}
  )
) WHERE rank <= {k}
"""


def hybrid_linear_sql(
    query_text: str, k: int = 10, depth: int = 20, alpha: float = 0.5
) -> str:
    """Min-max linear hybrid twin: both legs 6dp-rounded, normalized on
    [min, max] of their own top-depth list, blended α·lex + (1-α)·vec."""
    return f"""
WITH {_qterms_cte(query_text)}
{_BM25_AGG},
lex AS (
  -- rank on the UNROUNDED score (the index path's cut), normalize the
  -- 6dp-rounded value (what the Spark leg exposes)
  SELECT doc_id, round(score, 6) AS lscore FROM (
    SELECT doc_id, score,
           row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
    FROM agg
  ) WHERE r <= {depth}
),
qv AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0),
vec AS (
  SELECT doc_id, cosine AS vscore FROM (
    SELECT vec_id AS doc_id, cosine,
           row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS r
    FROM (
      SELECT vec_id,
             round(list_dot_product(embedding::DOUBLE[], qvec)
                   / (sqrt(list_dot_product(embedding::DOUBLE[],
                                            embedding::DOUBLE[]))
                      * sqrt(list_dot_product(qvec, qvec))), 6) AS cosine
      FROM embeddings, qv WHERE vec_id <> 0
    )
  ) WHERE r <= {depth}
),
lmm AS (SELECT min(lscore) AS mn, max(lscore) AS mx FROM lex),
vmm AS (SELECT min(vscore) AS mn, max(vscore) AS mx FROM vec),
ln AS (
  SELECT doc_id, CASE WHEN m.mx = m.mn THEN 1.0
                      ELSE (lscore - m.mn) / (m.mx - m.mn) END AS nl
  FROM lex CROSS JOIN lmm m
),
vn AS (
  SELECT doc_id, CASE WHEN m.mx = m.mn THEN 1.0
                      ELSE (vscore - m.mn) / (m.mx - m.mn) END AS nv
  FROM vec CROSS JOIN vmm m
),
fused AS (
  SELECT coalesce(ln.doc_id, vn.doc_id) AS doc_id,
         round({alpha!r} * coalesce(nl, 0.0)
               + {1.0 - alpha!r} * coalesce(nv, 0.0), 6) AS score
  FROM ln FULL OUTER JOIN vn USING (doc_id)
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM fused
) WHERE rank <= {k}
"""


def domain_quality_sql(threshold: float) -> str:
    """Domain quality rollup twin: DECIMAL-exact mean of 6dp scores."""
    return f"""
WITH q AS ({ORACLES["quality_score"]}),
j AS (
  SELECT d.source, q.quality::DECIMAL(18,6) AS qd,
         CASE WHEN q.quality >= {threshold!r} THEN 1 ELSE 0 END AS keep
  FROM documents d JOIN q USING (doc_id)
)
SELECT source, count(*)::BIGINT AS n_docs,
       round(sum(qd)::DOUBLE / count(*), 6) AS mean_quality,
       round(sum(keep)::DOUBLE / count(*), 6) AS keep_rate
FROM j GROUP BY 1 ORDER BY 1
"""


ORACLES["json_props_stats"] = """
WITH base AS (
  SELECT event_type,
         CAST(json_extract(props, '$.k') AS INT) AS k
  FROM events
)
SELECT event_type,
       count(*)::BIGINT AS n_events,
       sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_malformed,
       min(k)::BIGINT AS min_k,
       max(k)::BIGINT AS max_k,
       count(DISTINCT k)::BIGINT AS distinct_k,
       round(sum(k::DECIMAL(18,6))::DOUBLE / count(k), 6) AS mean_k
FROM base GROUP BY 1 ORDER BY 1
"""


def date_histogram_sql() -> str:
    """date_histogram (min_doc_count=0) twin: gap-filled daily counts."""
    return """
WITH days AS (SELECT ts::DATE AS day FROM events),
counts AS (SELECT day, count(*)::BIGINT AS n FROM days GROUP BY 1),
cal AS (
  SELECT unnest(generate_series(min(day), max(day), INTERVAL 1 DAY))::DATE
         AS day
  FROM days
)
SELECT cal.day::VARCHAR AS day, coalesce(c.n, 0)::BIGINT AS n_events
FROM cal LEFT JOIN counts c USING (day)
ORDER BY 1
"""


def moving_avg_sql(width: int) -> str:
    """moving_fn pipeline-agg twin: trailing moving average over the
    gap-filled histogram (integer frame sums — order-free exact)."""
    return f"""
WITH days AS (SELECT ts::DATE AS day FROM events),
counts AS (SELECT day, count(*)::BIGINT AS n FROM days GROUP BY 1),
cal AS (
  SELECT unnest(generate_series(min(day), max(day), INTERVAL 1 DAY))::DATE
         AS day
  FROM days
),
hist AS (
  SELECT cal.day, coalesce(c.n, 0)::BIGINT AS n_events
  FROM cal LEFT JOIN counts c USING (day)
)
SELECT day::VARCHAR AS day, n_events,
       round(
         (sum(n_events) OVER w)::DOUBLE / (count(*) OVER w)::DOUBLE, 6
       ) AS mov_avg
FROM hist
WINDOW w AS (ORDER BY day ROWS BETWEEN {width - 1} PRECEDING AND CURRENT ROW)
ORDER BY day
"""


def bucket_selector_sql(factor: float) -> str:
    """bucket_selector twin: buckets whose mean value beats factor x the
    global mean; both means divide exact DECIMAL sums cast to double."""
    return f"""
WITH base AS (
  SELECT event_type, (ts::DATE)::VARCHAR AS day,
         round(value, 6)::DECIMAL(18,6) AS v
  FROM events
),
buckets AS (
  SELECT event_type, day, count(*)::BIGINT AS n_events, sum(v) AS sum_v
  FROM base GROUP BY 1, 2
),
total AS (SELECT sum(v)::DOUBLE / count(*)::DOUBLE AS gmean FROM base)
SELECT event_type, day, n_events, round(sum_v::DOUBLE, 6) AS sum_value
FROM buckets, total
WHERE sum_v::DOUBLE / n_events::DOUBLE > {factor!r} * gmean
ORDER BY event_type, day
"""


def weighted_avg_sql() -> str:
    """weighted_avg twin: per-lang sum(n_chars)/sum(dl) — both BIGINT."""
    return f"""
SELECT lang, count(*)::BIGINT AS n_docs,
       round(sum(n_chars)::DOUBLE / sum(len({TOKS}))::DOUBLE, 6)
         AS w_chars_per_token
FROM documents
GROUP BY lang ORDER BY lang
"""


def multi_terms_sql(terms: list[str], k: int) -> str:
    """multi_terms twin: top-k (lang, source) buckets of the OR hit set."""
    inlist = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return f"""
WITH toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
hits AS (SELECT DISTINCT doc_id FROM toks WHERE term IN ({inlist})),
buckets AS (
  SELECT d.lang, d.source, count(*)::BIGINT AS n_docs
  FROM hits JOIN documents d USING (doc_id)
  GROUP BY 1, 2
)
SELECT lang, source, n_docs, rank FROM (
  SELECT lang, source, n_docs,
         row_number() OVER (ORDER BY n_docs DESC, lang ASC, source ASC)
           AS rank
  FROM buckets
) WHERE rank <= {k}
"""


def rare_terms_sql(max_df_fraction: float, k: int) -> str:
    """rare_terms twin: corpus-recomputed df <= fraction x N, rarest first."""
    return f"""
WITH toks AS (SELECT DISTINCT doc_id, unnest({TOKS}) AS term FROM documents),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM toks GROUP BY 1),
n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents)
SELECT term, df, rank FROM (
  SELECT term, df,
         row_number() OVER (ORDER BY df ASC, term ASC) AS rank
  FROM dfs, n
  WHERE df::DOUBLE <= {max_df_fraction!r} * n_docs
) WHERE rank <= {k}
"""


def pinned_sql(query_text: str, n_pinned: int, k: int) -> str:
    """pinned-query twin: the n_pinned smallest doc_ids lead in id order,
    then the BM25 organic ranking with those ids excluded."""
    return f"""
WITH {_qterms_cte(query_text)}
{_BM25_AGG},
pin AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id ASC) AS pos
  FROM documents
  ORDER BY doc_id ASC LIMIT {n_pinned}
),
organic AS (
  SELECT a.doc_id,
         row_number() OVER (ORDER BY round(a.score, 6) DESC, a.doc_id ASC)
           + {n_pinned} AS pos
  FROM agg a
  WHERE a.doc_id NOT IN (SELECT doc_id FROM pin)
)
SELECT pos AS rank, doc_id, pinned FROM (
  SELECT pos, doc_id, 1 AS pinned FROM pin
  UNION ALL
  SELECT pos, doc_id, 0 AS pinned FROM organic WHERE pos <= {k}
)
ORDER BY rank
"""


def span_containing_sql(a: str, b: str, dist: int, c: str) -> str:
    """SpanContaining twin: per doc, the count of a-anchored (a, b)
    envelopes at most dist apart that hold a c occurrence."""
    return f"""
SELECT doc_id, n_spans FROM (
  SELECT doc_id,
         len(list_filter(range(1, len(toks) + 1), i ->
             toks[i] = '{a}'
         AND len(list_filter(range(1, len(toks) + 1), j ->
                 toks[j] = '{b}' AND abs(i - j) <= {dist}
             AND len(list_filter(range(least(i, j), greatest(i, j) + 1),
                                 p -> toks[p] = '{c}')) > 0)) > 0))::BIGINT
           AS n_spans
  FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
)
WHERE n_spans > 0
ORDER BY doc_id
"""


def _feature_fused_sql(query_text: str, boost_expr: str, k: int) -> str:
    """Shared additive feature-query twin: BM25 + boost_expr(n_chars)."""
    return f"""
WITH {_qterms_cte(query_text)}
{_BM25_AGG},
fused AS (
  SELECT a.doc_id,
         round(a.score + {boost_expr}, 6) AS score
  FROM agg a JOIN documents d USING (doc_id)
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM fused
) WHERE rank <= {k}
"""


def rank_feature_sql(
    query_text: str, pivot: float, weight: float, k: int = 10
) -> str:
    """rank_feature twin: BM25 + weight * x / (x + pivot)."""
    return _feature_fused_sql(
        query_text,
        f"{weight!r} * d.n_chars::DOUBLE / (d.n_chars::DOUBLE + {pivot!r})",
        k,
    )


def distance_feature_sql(
    query_text: str, origin: float, pivot: float, weight: float, k: int = 10
) -> str:
    """distance_feature twin: BM25 + weight * pivot/(pivot + |x-origin|)."""
    return _feature_fused_sql(
        query_text,
        f"{weight!r} * {pivot!r} / "
        f"({pivot!r} + abs(d.n_chars::DOUBLE - {origin!r}))",
        k,
    )


def terms_shard_sql(n_shards: int, shard_size: int, k: int) -> str:
    """Sharded terms-agg accounting twin: per-shard top lists, summed
    reported counts, ES doc_count_error_upper_bound."""
    return f"""
WITH src AS (SELECT doc_id % {n_shards} AS shard, source FROM documents),
per_shard AS (
  SELECT shard, source, count(*)::BIGINT AS cnt FROM src GROUP BY 1, 2
),
reported AS (
  SELECT shard, source, cnt FROM (
    SELECT shard, source, cnt,
           row_number() OVER (
             PARTITION BY shard ORDER BY cnt DESC, source ASC) AS pos
    FROM per_shard
  ) WHERE pos <= {shard_size}
),
tails AS (SELECT shard, min(cnt) AS tail FROM reported GROUP BY 1),
merged AS (
  SELECT source, sum(cnt)::BIGINT AS doc_count FROM reported GROUP BY 1
),
errs AS (
  SELECT m.source, sum(t.tail)::BIGINT AS err
  FROM merged m
  CROSS JOIN tails t
  LEFT JOIN reported r ON r.shard = t.shard AND r.source = m.source
  WHERE r.source IS NULL
  GROUP BY 1
)
SELECT source, doc_count,
       coalesce(err, 0)::BIGINT AS doc_count_error_upper_bound, rank
FROM (
  SELECT m.source, m.doc_count, e.err,
         row_number() OVER (ORDER BY m.doc_count DESC, m.source ASC) AS rank
  FROM merged m LEFT JOIN errs e USING (source)
) WHERE rank <= {k}
"""


def pii_redaction_sql(pattern: str, mask: str) -> str:
    """PII-scrub twin: global regexp count + masked-text md5 witness."""
    return f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{pattern}'))::BIGINT AS n_redacted,
       md5(regexp_replace(text, '{pattern}', '{mask}', 'g')) AS clean_md5
FROM documents
ORDER BY doc_id
"""


def source_cap_sql(cap: int) -> str:
    """Frequency-cap twin: lowest `cap` doc_ids per source."""
    return f"""
SELECT source, doc_id, rank FROM (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source ORDER BY doc_id ASC) AS rank
  FROM documents
) WHERE rank <= {cap}
ORDER BY source, rank
"""


def mixture_weights_sql() -> str:
    """Temperature-mixture twin: sqrt(token count) per source normalized
    over a DECIMAL(18,6) order-free total."""
    return f"""
WITH per_src AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         sum(len({TOKS}))::BIGINT AS n_tokens
  FROM documents GROUP BY 1
),
weighted AS (
  SELECT source, n_docs, n_tokens,
         round(sqrt(n_tokens::DOUBLE), 6)::DECIMAL(18,6) AS w
  FROM per_src
),
z AS (SELECT sum(w) AS z FROM weighted)
SELECT source, n_docs, n_tokens,
       round(w::DOUBLE / z::DOUBLE, 6) AS weight
FROM weighted, z
ORDER BY source
"""


def diversified_sampler_sql(query_text: str, max_per_key: int, k: int) -> str:
    """diversified_sampler twin: per-source cap on the 6dp BM25 hit set,
    then the global top-k."""
    return f"""
WITH {_qterms_cte(query_text)}
{_BM25_AGG},
divsrc AS (
  SELECT a.doc_id, round(a.score, 6) AS score, d.source
  FROM agg a JOIN documents d USING (doc_id)
),
kept AS (
  SELECT source, doc_id, score FROM (
    SELECT source, doc_id, score,
           row_number() OVER (
             PARTITION BY source ORDER BY score DESC, doc_id ASC) AS pos
    FROM divsrc
  ) WHERE pos <= {max_per_key}
)
SELECT source, doc_id, score, rank FROM (
  SELECT source, doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM kept
) WHERE rank <= {k}
"""


def span_multi_near_sql(prefix: str, anchor: str, dist: int) -> str:
    """SpanMulti-near twin: any prefix-matching token within dist of the
    anchor token."""
    return f"""
SELECT doc_id FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
WHERE len(list_filter(range(1, len(toks) + 1), i ->
      starts_with(toks[i], '{prefix}')
  AND len(list_filter(range(1, len(toks) + 1), j ->
          toks[j] = '{anchor}' AND abs(i - j) <= {dist})) > 0)) > 0
ORDER BY doc_id
"""


def sayt_sql(full_terms: str, prefix: str, k: int) -> str:
    """search_as_you_type twin: BM25 over the completed terms, filtered
    to docs holding any prefix-matching token."""
    return f"""
WITH {_qterms_cte(full_terms)}
{_BM25_AGG},
haspfx AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, unnest({TOKS}) AS term FROM documents)
  WHERE starts_with(term, '{prefix}')
)
SELECT doc_id, score, rank FROM (
  SELECT a.doc_id, round(a.score, 6) AS score,
         row_number() OVER (ORDER BY round(a.score, 6) DESC, a.doc_id ASC)
           AS rank
  FROM agg a JOIN haspfx USING (doc_id)
) WHERE rank <= {k}
"""


_DAILY_HIST = """
days AS (SELECT ts::DATE AS day FROM events),
counts AS (SELECT day, count(*)::BIGINT AS n FROM days GROUP BY 1),
cal AS (
  SELECT unnest(generate_series(min(day), max(day), INTERVAL 1 DAY))::DATE
         AS day
  FROM days
),
hist AS (
  SELECT cal.day, coalesce(c.n, 0)::BIGINT AS n_events
  FROM cal LEFT JOIN counts c USING (day)
)"""


def derivative_sql() -> str:
    """derivative + cumulative_sum pipeline twin over the daily histogram."""
    return f"""
WITH {_DAILY_HIST}
SELECT day::VARCHAR AS day, n_events,
       coalesce(n_events - lag(n_events) OVER (ORDER BY day), 0)::BIGINT
         AS deriv,
       (sum(n_events) OVER (ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
         AS cum_events
FROM hist
ORDER BY day
"""


def stats_bucket_sql() -> str:
    """stats_bucket pipeline twin: stats over the daily bucket series."""
    return f"""
WITH {_DAILY_HIST}
SELECT count(*)::BIGINT AS n_buckets,
       min(n_events)::BIGINT AS min_events,
       max(n_events)::BIGINT AS max_events,
       sum(n_events)::BIGINT AS sum_events,
       round(sum(n_events)::DOUBLE / count(*)::DOUBLE, 6) AS avg_events
FROM hist
"""


def date_range_sql(ranges) -> str:
    """date_range-agg twin: [from, to) buckets with open ends."""
    arms = []
    for lo, hi in ranges:
        conds = []
        if lo is not None:
            conds.append(f"day >= DATE '{lo}'")
        if hi is not None:
            conds.append(f"day < DATE '{hi}'")
        cond = " AND ".join(conds) or "TRUE"
        key = f"{lo or '*'}-{hi or '*'}"
        arms.append(
            f"SELECT '{key}' AS key, "
            f"sum(CASE WHEN {cond} THEN 1 ELSE 0 END)::BIGINT AS n_events "
            "FROM days"
        )
    body = " UNION ALL ".join(arms)
    return f"""
WITH days AS (SELECT ts::DATE AS day FROM events)
{body}
ORDER BY key
"""


def auto_date_histogram_sql(target: int) -> str:
    """auto_date_histogram twin: smallest of day/week/month keeping the
    bucket count <= target; elapsed-day bucket arithmetic."""
    return f"""
WITH days AS (SELECT ts::DATE AS day FROM events),
span AS (
  SELECT min(day) AS lo,
         CASE WHEN date_diff('day', min(day), max(day)) + 1 <= {target}
                THEN 1
              WHEN ceil((date_diff('day', min(day), max(day)) + 1) / 7.0)
                   <= {target} THEN 7
              ELSE 30 END AS ilen
  FROM days
),
bucketed AS (
  SELECT CASE WHEN s.ilen = 1 THEN 'day'
              WHEN s.ilen = 7 THEN 'week' ELSE 'month' END AS interval,
         date_diff('day', s.lo, d.day) // s.ilen AS bucket_idx,
         (s.lo + ((date_diff('day', s.lo, d.day) // s.ilen) * s.ilen)
          * INTERVAL 1 DAY)::DATE::VARCHAR AS bucket_start
  FROM days d, span s
)
SELECT interval, bucket_start, count(*)::BIGINT AS n_events
FROM bucketed
GROUP BY interval, bucket_idx, bucket_start
ORDER BY bucket_idx
"""


def scroll_slices_sql(n_slices: int) -> str:
    """Sliced-scroll twin: md5 52-bit prefix of the id mod n_slices."""
    h = _MD5_52.format(e="doc_id::VARCHAR")
    return f"""
SELECT ({h}) % {n_slices} AS slice_id,
       count(*)::BIGINT AS n_docs,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM documents
GROUP BY 1 ORDER BY 1
"""


def percentile_ranks_sql(values) -> str:
    """percentile_ranks twin: exact <=-value percentage per probe."""
    arms = " UNION ALL ".join(
        f"SELECT {float(v)!r} AS value, "
        f"round(sum(CASE WHEN n_chars <= {v} THEN 1 ELSE 0 END)::DOUBLE "
        f"* 100.0 / count(*)::DOUBLE, 6) AS pct FROM documents"
        for v in values
    )
    return f"{arms} ORDER BY value"


def string_stats_sql() -> str:
    """string_stats twin: length stats + DECIMAL-summed token entropy."""
    return f"""
WITH lens AS (
  SELECT count(*)::BIGINT AS n_docs,
         min(len(text))::BIGINT AS min_len,
         max(len(text))::BIGINT AS max_len,
         round(sum(len(text))::DOUBLE / count(*)::DOUBLE, 6) AS avg_len
  FROM documents
),
cf AS (
  SELECT term, count(*)::BIGINT AS cf
  FROM (SELECT unnest({TOKS}) AS term FROM documents) GROUP BY 1
),
tot AS (SELECT sum(cf)::DOUBLE AS total FROM cf),
ent AS (
  SELECT round(sum(h)::DOUBLE, 6) AS unigram_entropy FROM (
    SELECT round(-(cf::DOUBLE / total) * ln(cf::DOUBLE / total),
                 6)::DECIMAL(18,6) AS h
    FROM cf, tot
  )
)
SELECT n_docs, min_len, max_len, avg_len, unigram_entropy
FROM lens, ent
"""


def embedding_norm_sql() -> str:
    """Embedding-norm audit twin: 6dp per-vector L2 norms, DECIMAL mean."""
    return """
WITH norms AS (
  SELECT label,
         round(sqrt(list_dot_product(embedding::DOUBLE[],
                                     embedding::DOUBLE[])), 6) AS norm
  FROM embeddings
)
SELECT label, count(*)::BIGINT AS n_vecs,
       min(norm) AS min_norm,
       round(sum(norm::DECIMAL(18,6))::DOUBLE / count(*)::DOUBLE, 6)
         AS mean_norm,
       max(norm) AS max_norm
FROM norms
GROUP BY label ORDER BY label
"""


def serial_diff_sql(lag: int) -> str:
    """serial_diff twin: lag-N difference over the daily histogram."""
    return f"""
WITH {_DAILY_HIST}
SELECT day::VARCHAR AS day, n_events,
       coalesce(n_events - lag(n_events, {lag}) OVER (ORDER BY day),
                0)::BIGINT AS serial_diff
FROM hist
ORDER BY day
"""


def bucket_extrema_sql() -> str:
    """max_bucket/min_bucket twin: extreme bucket key+value, earliest
    tied day."""
    return f"""
WITH {_DAILY_HIST}
(SELECT 'max_bucket' AS metric, day::VARCHAR AS key, n_events AS value
 FROM hist ORDER BY n_events DESC, day ASC LIMIT 1)
UNION ALL
(SELECT 'min_bucket' AS metric, day::VARCHAR AS key, n_events AS value
 FROM hist ORDER BY n_events ASC, day ASC LIMIT 1)
ORDER BY metric
"""


def bucket_script_sql() -> str:
    """bucket_script twin: per-day purchase revenue over bucket count,
    DECIMAL-exact sums."""
    return """
WITH base AS (
  SELECT (ts::DATE)::VARCHAR AS day,
         CASE WHEN event_type = 'purchase'
              THEN round(value, 6)::DECIMAL(18,6)
              ELSE 0::DECIMAL(18,6) END AS pv
  FROM events
),
buckets AS (
  SELECT day, count(*)::BIGINT AS n_events, sum(pv) AS psum
  FROM base GROUP BY 1
)
SELECT day, n_events,
       round(psum::DOUBLE, 6) AS purchase_sum,
       round(psum::DOUBLE / n_events::DOUBLE, 6) AS purchase_per_event
FROM buckets
ORDER BY day
"""


def bucket_sort_sql(skip: int, size: int) -> str:
    """bucket_sort twin: metric-desc ordered buckets paged from/size."""
    return f"""
WITH {_DAILY_HIST}
SELECT position, day, n_events FROM (
  SELECT day::VARCHAR AS day, n_events,
         row_number() OVER (ORDER BY n_events DESC, day ASC) AS position
  FROM hist
) WHERE position > {skip} AND position <= {skip + size}
ORDER BY position
"""


def normalize_sql() -> str:
    """normalize (proportion_of_sum) twin over the daily histogram."""
    return f"""
WITH {_DAILY_HIST},
total AS (SELECT sum(n_events)::DOUBLE AS total FROM hist)
SELECT day::VARCHAR AS day, n_events,
       round(n_events::DOUBLE / total, 6) AS prop_of_sum
FROM hist, total
ORDER BY day
"""


def top_metrics_sql() -> str:
    """top_metrics twin: value at the latest (ts, event_id) per type."""
    return """
SELECT event_type, ts_str, latest_value FROM (
  SELECT event_type, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
         round(value, 6) AS latest_value,
         row_number() OVER (
           PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS pos
  FROM events
) WHERE pos = 1
ORDER BY event_type
"""


def t_test_sql(a: str, b: str) -> str:
    """Welch t-test twin: DECIMAL-exact sums, identical moment chain."""
    return f"""
WITH base AS (
  SELECT event_type,
         round(value, 6)::DECIMAL(18,6) AS v,
         round(round(value, 6) * round(value, 6), 6)::DECIMAL(28,6) AS vv
  FROM events WHERE event_type IN ('{a}', '{b}')
),
g AS (
  SELECT event_type, count(*)::BIGINT AS n, sum(v) AS sv, sum(vv) AS svv
  FROM base GROUP BY 1
),
stats AS (
  SELECT event_type, n,
         sv::DOUBLE / n::DOUBLE AS m,
         (svv::DOUBLE - n::DOUBLE * (sv::DOUBLE / n::DOUBLE)
            * (sv::DOUBLE / n::DOUBLE)) / (n::DOUBLE - 1.0) AS s2
  FROM g
)
SELECT sa.n AS n1, sb.n AS n2,
       round(sa.m, 6) AS mean_a, round(sb.m, 6) AS mean_b,
       round((sa.m - sb.m)
             / sqrt(sa.s2 / sa.n::DOUBLE + sb.s2 / sb.n::DOUBLE), 6)
         AS t_stat
FROM (SELECT * FROM stats WHERE event_type = '{a}') sa,
     (SELECT * FROM stats WHERE event_type = '{b}') sb
"""


def extended_stats_sql() -> str:
    """extended_stats twin: BIGINT moments, population variance, sigma=2
    bounds."""
    return """
WITH g AS (
  SELECT count(*)::BIGINT AS n_docs,
         min(n_chars)::BIGINT AS min_chars,
         max(n_chars)::BIGINT AS max_chars,
         sum(n_chars)::BIGINT AS sum_chars,
         sum(n_chars * n_chars)::BIGINT AS ssq
  FROM documents
)
SELECT n_docs, min_chars, max_chars, sum_chars,
       round(sum_chars::DOUBLE / n_docs::DOUBLE, 6) AS avg_chars,
       ssq AS sum_of_squares,
       round((ssq::DOUBLE - n_docs::DOUBLE
              * (sum_chars::DOUBLE / n_docs::DOUBLE)
              * (sum_chars::DOUBLE / n_docs::DOUBLE)) / n_docs::DOUBLE, 6)
         AS variance,
       round(sqrt((ssq::DOUBLE - n_docs::DOUBLE
              * (sum_chars::DOUBLE / n_docs::DOUBLE)
              * (sum_chars::DOUBLE / n_docs::DOUBLE)) / n_docs::DOUBLE), 6)
         AS std_deviation,
       round(sum_chars::DOUBLE / n_docs::DOUBLE
             + 2.0 * sqrt((ssq::DOUBLE - n_docs::DOUBLE
               * (sum_chars::DOUBLE / n_docs::DOUBLE)
               * (sum_chars::DOUBLE / n_docs::DOUBLE)) / n_docs::DOUBLE), 6)
         AS std_upper,
       round(sum_chars::DOUBLE / n_docs::DOUBLE
             - 2.0 * sqrt((ssq::DOUBLE - n_docs::DOUBLE
               * (sum_chars::DOUBLE / n_docs::DOUBLE)
               * (sum_chars::DOUBLE / n_docs::DOUBLE)) / n_docs::DOUBLE), 6)
         AS std_lower
FROM g
"""


def boxplot_sql() -> str:
    """boxplot twin: per-lang type-7 quartiles + IQR on n_chars."""
    return """
SELECT lang,
       count(*)::BIGINT AS n_docs,
       min(n_chars)::BIGINT AS min_chars,
       round(quantile_cont(n_chars, 0.25), 6) AS q1,
       round(quantile_cont(n_chars, 0.5), 6) AS q2,
       round(quantile_cont(n_chars, 0.75), 6) AS q3,
       max(n_chars)::BIGINT AS max_chars,
       round(quantile_cont(n_chars, 0.75) - quantile_cont(n_chars, 0.25), 6)
         AS iqr
FROM documents
GROUP BY lang ORDER BY lang
"""


def mad_sql() -> str:
    """median_absolute_deviation twin: exact median of |x - median|."""
    return """
WITH med AS (
  SELECT lang, quantile_cont(n_chars, 0.5) AS med
  FROM documents GROUP BY lang
),
dev AS (
  SELECT d.lang, abs(d.n_chars::DOUBLE - m.med) AS ad
  FROM documents d JOIN med m USING (lang)
)
SELECT dev.lang, round(m.med, 6) AS median_chars,
       round(quantile_cont(dev.ad, 0.5), 6) AS mad
FROM dev JOIN med m ON dev.lang = m.lang
GROUP BY dev.lang, m.med
ORDER BY dev.lang
"""


def matrix_stats_sql() -> str:
    """matrix_stats twin: BIGINT cross-moments on (n_chars, dl), sample
    covariance + Pearson correlation."""
    return f"""
WITH base AS (
  SELECT n_chars::BIGINT AS x, len({TOKS})::BIGINT AS y FROM documents
),
g AS (
  SELECT count(*)::BIGINT AS n_docs,
         sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy,
         sum(x * y)::BIGINT AS sxy
  FROM base
),
m AS (
  SELECT n_docs,
         sx::DOUBLE / n_docs::DOUBLE AS mx,
         sy::DOUBLE / n_docs::DOUBLE AS my,
         (sxx::DOUBLE - n_docs::DOUBLE * (sx::DOUBLE / n_docs::DOUBLE)
            * (sx::DOUBLE / n_docs::DOUBLE)) / (n_docs::DOUBLE - 1.0) AS vx,
         (syy::DOUBLE - n_docs::DOUBLE * (sy::DOUBLE / n_docs::DOUBLE)
            * (sy::DOUBLE / n_docs::DOUBLE)) / (n_docs::DOUBLE - 1.0) AS vy,
         (sxy::DOUBLE - n_docs::DOUBLE * (sx::DOUBLE / n_docs::DOUBLE)
            * (sy::DOUBLE / n_docs::DOUBLE)) / (n_docs::DOUBLE - 1.0) AS cov
  FROM g
)
SELECT n_docs,
       round(mx, 6) AS mean_chars, round(my, 6) AS mean_tokens,
       round(vx, 6) AS var_chars, round(vy, 6) AS var_tokens,
       round(cov, 6) AS covariance,
       round(cov / sqrt(vx * vy), 6) AS correlation
FROM m
"""


def filters_agg_sql(buckets) -> str:
    """filters-agg twin: CASE-mapped named length bands."""
    arms = []
    for name, lo, hi in buckets:
        cond = f"n_chars >= {lo}"
        if hi is not None:
            cond += f" AND n_chars < {hi}"
        arms.append(f"WHEN {cond} THEN '{name}'")
    case = "CASE " + " ".join(arms) + " ELSE 'other' END"
    return f"""
SELECT {case} AS key, count(*)::BIGINT AS n_docs,
       round(sum(n_chars)::DOUBLE / count(*)::DOUBLE, 6) AS avg_chars
FROM documents
GROUP BY 1 ORDER BY 1
"""


def has_child_sql(
    priority: str, status: str, min_children: int, k: int
) -> str:
    """has_child twin: per-parent sum of matching children's totalprice,
    min_children enforced."""
    return f"""
WITH per_parent AS (
  SELECT o_custkey AS c_custkey,
         count(*)::BIGINT AS n_children,
         round(sum(round(o_totalprice, 6)::DECIMAL(18,6))::DOUBLE, 6)
           AS score
  FROM orders
  WHERE o_orderpriority = '{priority}' AND o_orderstatus = '{status}'
  GROUP BY 1
  HAVING count(*) >= {min_children}
)
SELECT c_custkey, n_children, score, rank FROM (
  SELECT *, row_number() OVER (ORDER BY score DESC, c_custkey ASC) AS rank
  FROM per_parent
) WHERE rank <= {k}
"""


def has_parent_sql(segment: str, k: int) -> str:
    """has_parent twin: children of matching parents, parent acctbal as
    score."""
    return f"""
SELECT o_orderkey, c_custkey, parent_score, rank FROM (
  SELECT o.o_orderkey, c.c_custkey,
         round(c.c_acctbal, 6) AS parent_score,
         row_number() OVER (
           ORDER BY round(c.c_acctbal, 6) DESC, o.o_orderkey ASC) AS rank
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = '{segment}'
) WHERE rank <= {k}
"""


def children_agg_sql() -> str:
    """children-agg twin: child count + DECIMAL revenue per parent
    segment."""
    return """
SELECT c.c_mktsegment,
       count(*)::BIGINT AS n_orders,
       round(sum(round(o.o_totalprice, 6)::DECIMAL(18,6))::DOUBLE, 6)
         AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1 ORDER BY 1
"""


def scripted_metric_sql() -> str:
    """scripted_metric twin: per-type RMS from DECIMAL-exact square sums."""
    return """
SELECT event_type, count(*)::BIGINT AS n,
       round(sqrt(sum(round(round(value, 6) * round(value, 6), 6)
                      ::DECIMAL(28,6))::DOUBLE
                  / count(*)::DOUBLE), 6) AS rms_value
FROM events
GROUP BY 1 ORDER BY 1
"""


def combined_fields_sql(
    query_text: str,
    kw_field: str = "source",
    w_text: float = 1.0,
    w_kw: float = 2.0,
    k: int = 10,
) -> str:
    """combined_fields twin: merged-pseudo-field BM25 (shared length
    norm), any-field df."""
    qlit = query_text.replace("'", "''")
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs,
         {w_text} * avg(dl::DOUBLE) + {w_kw} AS avgdl_c
  FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
tt AS (
  SELECT p.doc_id, p.term, p.tf AS tf_text
  FROM postings p JOIN qterms q USING (term)
),
kw AS (
  SELECT doc_id, {kw_field} AS term, 1.0 AS tf_kw FROM documents
  WHERE {kw_field} IN (SELECT term FROM qterms)
),
m AS (
  SELECT coalesce(t.doc_id, w.doc_id) AS doc_id,
         coalesce(t.term, w.term) AS term,
         coalesce(t.tf_text, 0) AS tf_text,
         coalesce(w.tf_kw, 0) AS tf_kw
  FROM tt t FULL JOIN kw w ON t.doc_id = w.doc_id AND t.term = w.term
),
dfa AS (
  SELECT term, count(*)::DOUBLE AS df_any FROM m GROUP BY 1
),
mm AS (
  SELECT m.doc_id, m.term,
         {w_text} * m.tf_text + {w_kw} * m.tf_kw AS tfc,
         {K1} * ((1 - {B}) + {B}
           * ({w_text} * coalesce(l.dl, 0)::DOUBLE + {w_kw}) / s.avgdl_c)
           AS norm
  FROM m LEFT JOIN doclens l USING (doc_id) CROSS JOIN stats s
),
scored AS (
  SELECT mm.doc_id,
         ln(1 + (s.n_docs - d.df_any + 0.5) / (d.df_any + 0.5))
           * mm.tfc * ({K1} + 1.0) / (mm.tfc + mm.norm) AS contrib
  FROM mm JOIN dfa d USING (term) CROSS JOIN stats s
),
agg AS (
  SELECT doc_id, round(sum(contrib), 6) AS score FROM scored GROUP BY 1
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM agg
) WHERE rank <= {k}
"""


def rank_eval_sql(query_text: str, k: int, min_terms: int) -> str:
    """rank_eval twin: precision/MRR/NDCG@k of the BM25 page against
    derived graded labels."""
    return f"""
WITH {_qterms_cte(query_text)}
{_BM25_AGG},
page AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
    FROM agg
  ) WHERE rank <= {k}
),
rels AS (
  SELECT d.doc_id,
         greatest(
           (SELECT count(*) FROM qterms q
            WHERE list_contains({TOKS}, q.term)) - {min_terms - 1},
           0)::BIGINT AS rel
  FROM documents d
),
pg AS (
  SELECT p.rank, coalesce(r.rel, 0) AS rel,
         round((pow(2.0, coalesce(r.rel, 0)::DOUBLE) - 1.0)
               / log2(p.rank::DOUBLE + 1.0), 6)::DECIMAL(18,6) AS dg
  FROM page p LEFT JOIN rels r USING (doc_id)
),
pm AS (
  SELECT round(sum(dg)::DOUBLE, 6) AS dcg,
         round(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END)::DOUBLE
               / {float(k)!r}, 6) AS precision,
         round(coalesce(
           1.0 / min(CASE WHEN rel > 0 THEN rank END)::DOUBLE, 0.0), 6)
           AS mrr
  FROM pg
),
ideal AS (
  SELECT round((pow(2.0, rel::DOUBLE) - 1.0)
               / log2(irank::DOUBLE + 1.0), 6)::DECIMAL(18,6) AS idg
  FROM (
    SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id ASC) AS irank
    FROM rels WHERE rel > 0
  ) WHERE irank <= {k}
),
im AS (SELECT round(sum(idg)::DOUBLE, 6) AS idcg FROM ideal)
SELECT precision, mrr, dcg, idcg, round(dcg / idcg, 6) AS ndcg
FROM pm, im
"""


def linear_classifier_sql(k: int) -> str:
    """Hashed-linear-classifier twin: integer per-mille weights from the
    shared md5 hash."""
    h = _MD5_52.format(e="term")
    return f"""
WITH tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest({TOKS}) AS term FROM documents)
  GROUP BY 1, 2
),
per_doc AS (
  SELECT doc_id, sum(tf * (({h}) % 2001 - 1000))::BIGINT AS milli
  FROM tf GROUP BY 1
),
scored AS (
  SELECT doc_id,
         round(milli::DOUBLE / 1000.0, 6) AS score,
         CASE WHEN milli > 0 THEN 'keep' ELSE 'drop' END AS label
  FROM per_doc
)
SELECT doc_id, score, label, rank FROM (
  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def sampler_agg_sql(n_shards: int, per_shard: int) -> str:
    """sampler-agg twin: first per_shard docs per doc_id-mod shard, lang
    counts over the sample."""
    return f"""
WITH sampled AS (
  SELECT lang FROM (
    SELECT lang,
           row_number() OVER (
             PARTITION BY doc_id % {n_shards} ORDER BY doc_id ASC) AS pos
    FROM documents
  ) WHERE pos <= {per_shard}
)
SELECT lang, count(*)::BIGINT AS n_sampled
FROM sampled GROUP BY 1 ORDER BY 1
"""


def geo_distance_sql(
    clat: float, clon: float, max_km: float, k: int
) -> str:
    """geo_distance twin: md5-derived coordinates, identical haversine
    chain, rank on the 3dp-rounded distance."""
    hlat = _MD5_52.format(e="doc_id::VARCHAR || ':lat'")
    hlon = _MD5_52.format(e="doc_id::VARCHAR || ':lon'")
    return f"""
WITH base AS (
  SELECT doc_id,
         (({hlat}) % 1800001)::DOUBLE / 10000.0 - 90.0 AS lat,
         (({hlon}) % 3600001)::DOUBLE / 10000.0 - 180.0 AS lon
  FROM documents
),
hits AS (
  SELECT doc_id, round(lat, 4) AS lat, round(lon, 4) AS lon,
         round(2.0 * 6371.0 * asin(sqrt(
           sin(radians(lat - ({clat!r})) / 2.0)
             * sin(radians(lat - ({clat!r})) / 2.0)
           + cos(radians({clat!r})) * cos(radians(lat))
             * sin(radians(lon - ({clon!r})) / 2.0)
             * sin(radians(lon - ({clon!r})) / 2.0))), 3) AS dist_km
  FROM base
)
SELECT doc_id, lat, lon, dist_km, rank FROM (
  SELECT *, row_number() OVER (ORDER BY dist_km ASC, doc_id ASC) AS rank
  FROM hits WHERE dist_km <= {max_km!r}
) WHERE rank <= {k}
"""


def mget_sql(n: int) -> str:
    """mget twin: stored fields of the n smallest ids, text as md5."""
    return f"""
SELECT doc_id, lang, source, n_chars::BIGINT AS n_chars,
       md5(text) AS text_md5
FROM documents
WHERE doc_id IN (SELECT doc_id FROM documents ORDER BY doc_id LIMIT {n})
ORDER BY doc_id
"""


def intervals_sql(first: str, any_of, max_gaps: int) -> str:
    """intervals twin: ordered all_of(first, any_of(...)) with a gap
    budget over token positions."""
    alts = ", ".join(f"'{t}'" for t in sorted(any_of))
    return f"""
SELECT doc_id FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
WHERE len(list_filter(range(1, len(toks) + 1), i ->
      toks[i] = '{first}'
  AND len(list_filter(range(1, len(toks) + 1), j ->
          toks[j] IN ({alts}) AND j > i
          AND j - i - 1 <= {max_gaps})) > 0)) > 0
ORDER BY doc_id
"""


def cumulative_cardinality_sql() -> str:
    """cumulative_cardinality twin: first-day contribution + running
    sum."""
    return """
WITH firsts AS (
  SELECT user_id, min(ts::DATE) AS first_day FROM events GROUP BY 1
),
per_day AS (
  SELECT first_day AS day, count(*)::BIGINT AS new_users
  FROM firsts GROUP BY 1
),
cal AS (
  SELECT unnest(generate_series(min(ts::DATE), max(ts::DATE),
                                INTERVAL 1 DAY))::DATE AS day
  FROM events
)
SELECT day::VARCHAR AS day,
       coalesce(p.new_users, 0)::BIGINT AS new_users,
       (sum(coalesce(p.new_users, 0)) OVER (ORDER BY cal.day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
         AS cum_users
FROM cal LEFT JOIN per_day p USING (day)
ORDER BY day
"""


def moving_fn_sql(window: int) -> str:
    """moving_fn twin: trailing-window max/min/avg, current excluded."""
    frame = f"ROWS BETWEEN {window} PRECEDING AND 1 PRECEDING"
    return f"""
WITH {_DAILY_HIST}
SELECT day::VARCHAR AS day, n_events,
       coalesce(max(n_events) OVER (ORDER BY day {frame}), 0)::BIGINT
         AS mov_max,
       coalesce(min(n_events) OVER (ORDER BY day {frame}), 0)::BIGINT
         AS mov_min,
       CASE WHEN count(n_events) OVER (ORDER BY day {frame}) > 0
            THEN round((sum(n_events) OVER (ORDER BY day {frame}))::DOUBLE
                       / (count(n_events) OVER (ORDER BY day {frame}))::DOUBLE,
                       6)
            ELSE 0.0 END AS mov_avg
FROM hist
ORDER BY day
"""


_GEO_COORDS = f"""
SELECT doc_id,
       (({_MD5_52.format(e="doc_id::VARCHAR || ':lat'")}) % 1800001)::DOUBLE
         / 10000.0 - 90.0 AS lat,
       (({_MD5_52.format(e="doc_id::VARCHAR || ':lon'")}) % 3600001)::DOUBLE
         / 10000.0 - 180.0 AS lon
FROM documents
"""


def geo_bounding_box_sql(
    lat_lo: float, lat_hi: float, lon_lo: float, lon_hi: float, k: int
) -> str:
    """geo_bounding_box twin: box filter over the derived coordinates."""
    return f"""
WITH pts AS ({_GEO_COORDS})
SELECT doc_id, lat, lon, rank FROM (
  SELECT doc_id, round(lat, 4) AS lat, round(lon, 4) AS lon,
         row_number() OVER (ORDER BY doc_id ASC) AS rank
  FROM pts
  WHERE lat >= {lat_lo!r} AND lat <= {lat_hi!r}
    AND lon >= {lon_lo!r} AND lon <= {lon_hi!r}
) WHERE rank <= {k}
"""


def geotile_grid_sql(zoom: int, k: int, pi_lit: float, max_lat: float) -> str:
    """geotile_grid twin: identical Mercator tile arithmetic, shared pi
    literal."""
    n = float(1 << zoom)
    nmax = (1 << zoom) - 1
    return f"""
WITH pts AS ({_GEO_COORDS}),
keyed AS (
  SELECT '{zoom}' || '/' ||
         least({nmax}, floor((lon + 180.0) / 360.0 * {n!r}))::BIGINT::VARCHAR
         || '/' ||
         greatest(0, least({nmax}, floor(
           (1.0 - ln(tan(radians(greatest(least(lat, {max_lat!r}),
                                          -{max_lat!r})))
                     + 1.0 / cos(radians(greatest(least(lat, {max_lat!r}),
                                                  -{max_lat!r}))))
                 / {pi_lit!r}) / 2.0 * {n!r})))::BIGINT::VARCHAR AS tile
  FROM pts
),
counts AS (SELECT tile, count(*)::BIGINT AS n_docs FROM keyed GROUP BY 1)
SELECT tile, n_docs, rank FROM (
  SELECT tile, n_docs,
         row_number() OVER (ORDER BY n_docs DESC, tile ASC) AS rank
  FROM counts
) WHERE rank <= {k}
"""


def hll_cardinality_sql(p: int) -> str:
    """HLL cardinality twin: identical 12/40 bit split, BIGINT-scaled
    register fold, linear-counting branch."""
    m = 1 << p
    alpha_num = 0.7213 / (1.0 + 1.079 / m) * m * m * float(1 << 41)
    h = _MD5_52.format(e="term")
    return f"""
WITH terms AS (
  SELECT DISTINCT unnest({TOKS}) AS term FROM documents
),
hashed AS (
  SELECT ({h}) AS h FROM terms
),
regs AS (
  SELECT h >> 40 AS bucket,
         max(CASE WHEN (h & {(1 << 40) - 1}) = 0 THEN 41
                  ELSE 40 - floor(log2((h & {(1 << 40) - 1})::DOUBLE))::INT
             END) AS m_j
  FROM hashed GROUP BY 1
),
folded AS (
  SELECT count(*)::BIGINT AS used,
         sum(1::BIGINT << (41 - m_j))::BIGINT AS s_used
  FROM regs
),
exact AS (SELECT count(*)::BIGINT AS n_exact FROM terms),
est AS (
  SELECT used,
         {alpha_num!r}
           / (s_used + ({m} - used) * {1 << 41})::DOUBLE AS e_raw,
         ({m} - used)::DOUBLE AS v
  FROM folded
)
SELECT x.n_exact, e.used,
       round(CASE WHEN e.e_raw <= {2.5 * m!r} AND e.v > 0
                  THEN {float(m)!r} * ln({float(m)!r} / e.v)
                  ELSE e.e_raw END, 4) AS hll_estimate,
       round(abs(CASE WHEN e.e_raw <= {2.5 * m!r} AND e.v > 0
                      THEN {float(m)!r} * ln({float(m)!r} / e.v)
                      ELSE e.e_raw END - x.n_exact::DOUBLE)
             / x.n_exact::DOUBLE, 6) AS rel_err
FROM est e, exact x
"""


def ewma_sql(alpha: float) -> str:
    """ewma twin: identical sequential left fold per prefix of the
    bucket series."""
    a, b = float(alpha), 1.0 - float(alpha)
    return f"""
WITH {_DAILY_HIST},
packed AS (
  SELECT list(day::VARCHAR ORDER BY day) AS ds,
         list(n_events::DOUBLE ORDER BY day) AS ns,
         list(n_events ORDER BY day) AS raw
  FROM hist
)
,
idx AS (
  SELECT ds, ns, raw, unnest(range(1, len(ds) + 1)) AS i FROM packed
)
SELECT ds[i] AS day, raw[i]::BIGINT AS n_events,
       round(list_reduce(ns[1:i],
             (acc, x) -> (acc * {b!r}) + (x * {a!r})), 6) AS ewma
FROM idx
ORDER BY day
"""


def percentiles_bucket_sql(ps) -> str:
    """percentiles_bucket twin: type-7 quantiles over the bucket
    counts."""
    arms = " UNION ALL ".join(
        f"SELECT {float(p)!r} AS p, "
        f"round(quantile_cont(n_events, {p}), 6) AS bucket_value FROM hist"
        for p in ps
    )
    return f"WITH {_DAILY_HIST}\n{arms} ORDER BY p"


def change_point_sql() -> str:
    """change_point twin: max |x - mean| bucket, z-like magnitude."""
    return f"""
WITH {_DAILY_HIST},
g AS (
  SELECT count(*)::BIGINT AS n, sum(n_events)::BIGINT AS s,
         sum(n_events * n_events)::BIGINT AS ssq
  FROM hist
),
stats AS (
  SELECT s::DOUBLE / n::DOUBLE AS mean,
         sqrt((ssq::DOUBLE - n::DOUBLE * (s::DOUBLE / n::DOUBLE)
               * (s::DOUBLE / n::DOUBLE)) / n::DOUBLE) AS std
  FROM g
)
SELECT day::VARCHAR AS day, n_events,
       CASE WHEN n_events::DOUBLE > mean THEN 'spike' ELSE 'dip' END
         AS change_type,
       round(abs(n_events::DOUBLE - mean) / std, 6) AS magnitude
FROM hist, stats
ORDER BY abs(n_events::DOUBLE - mean) DESC, day ASC
LIMIT 1
"""


def rate_agg_sql() -> str:
    """rate twin: per-type events per week over the stream span."""
    return """
WITH span AS (
  SELECT (date_diff('day', min(ts::DATE), max(ts::DATE)) + 1)::BIGINT
           AS span_days
  FROM events
)
SELECT event_type, count(*)::BIGINT AS n,
       round(count(*)::DOUBLE * 7.0 / span_days::DOUBLE, 6)
         AS rate_per_week
FROM events, span
GROUP BY event_type, span_days
ORDER BY event_type
"""


def categorize_text_sql(sig_tokens: int, k: int) -> str:
    """categorize_text twin: leading-token digit-collapsed signature
    counts."""
    return f"""
WITH sigs AS (
  SELECT array_to_string(
           list_transform({TOKS}[1:{sig_tokens}],
                          t -> regexp_replace(t, '[0-9]+', '#', 'g')),
           ' ') AS category
  FROM documents
),
counts AS (SELECT category, count(*)::BIGINT AS n_docs FROM sigs GROUP BY 1)
SELECT category, n_docs, rank FROM (
  SELECT category, n_docs,
         row_number() OVER (ORDER BY n_docs DESC, category ASC) AS rank
  FROM counts
) WHERE rank <= {k}
"""


def frequent_pairs_sql(hot_k: int, k: int) -> str:
    """frequent_item_sets(size=2) twin: hot-term-pruned co-occurrence
    pairs."""
    return f"""
WITH dt AS (
  SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id, unnest({TOKS}) AS term FROM documents)
),
hot AS (
  SELECT term FROM (
    SELECT term, row_number() OVER (
             ORDER BY count(*) DESC, term ASC) AS rk
    FROM dt GROUP BY term
  ) WHERE rk <= {hot_k}
),
ht AS (SELECT dt.doc_id, dt.term FROM dt JOIN hot USING (term)),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, count(*)::BIGINT AS support
  FROM ht a JOIN ht b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2
)
SELECT term_a, term_b, support, rank FROM (
  SELECT term_a, term_b, support,
         row_number() OVER (
           ORDER BY support DESC, term_a ASC, term_b ASC) AS rank
  FROM pairs
) WHERE rank <= {k}
"""


def tfidf_keywords_sql(k: int) -> str:
    """tfidf_keywords twin: per-doc top-k tf*ln(N/df), rounded-score
    ranking."""
    return f"""
WITH tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest({TOKS}) AS term FROM documents)
  GROUP BY 1, 2
),
dft AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf::DOUBLE * ln(n.n / dft.df::DOUBLE), 6) AS tfidf
  FROM tf JOIN dft USING (term) CROSS JOIN n
)
SELECT doc_id, term, tfidf, krank FROM (
  SELECT doc_id, term, tfidf,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS krank
  FROM scored
) WHERE krank <= {k}
ORDER BY doc_id, krank
"""


def bpe_pairs_sql(k: int) -> str:
    """bpe_pair_counts twin: frequency-weighted adjacent char pairs over
    word types."""
    return f"""
WITH words AS (
  SELECT word, count(*)::BIGINT AS freq
  FROM (SELECT unnest({TOKS}) AS word FROM documents)
  GROUP BY 1
),
pairs AS (
  SELECT substr(word, i, 2) AS pair, freq
  FROM words, unnest(range(1, length(word))) AS t(i)
  WHERE length(word) >= 2
),
counts AS (SELECT pair, sum(freq)::BIGINT AS count FROM pairs GROUP BY 1)
SELECT pair, count, rank FROM (
  SELECT pair, count,
         row_number() OVER (ORDER BY count DESC, pair ASC) AS rank
  FROM counts
) WHERE rank <= {k}
"""


def geohash_grid_sql(k: int, alphabet: str) -> str:
    """geohash_grid twin: identical floor/interleave/base32 chain."""
    lon_bits = " + ".join(
        f"(((lon_idx >> {7 - j}) & 1) << {14 - 2 * j})" for j in range(8)
    )
    lat_bits = " + ".join(
        f"(((lat_idx >> {6 - j}) & 1) << {13 - 2 * j})" for j in range(7)
    )
    return f"""
WITH pts AS ({_GEO_COORDS}),
cells AS (
  SELECT least(255, floor((lon + 180.0) / 360.0 * 256.0))::BIGINT
           AS lon_idx,
         least(127, floor((lat + 90.0) / 180.0 * 128.0))::BIGINT
           AS lat_idx
  FROM pts
),
hashed AS (SELECT ({lon_bits} + {lat_bits}) AS v FROM cells),
keyed AS (
  SELECT substr('{alphabet}', ((v >> 10) & 31)::INT + 1, 1)
         || substr('{alphabet}', ((v >> 5) & 31)::INT + 1, 1)
         || substr('{alphabet}', (v & 31)::INT + 1, 1) AS geohash
  FROM hashed
),
counts AS (SELECT geohash, count(*)::BIGINT AS n_docs FROM keyed GROUP BY 1)
SELECT geohash, n_docs, rank FROM (
  SELECT geohash, n_docs,
         row_number() OVER (ORDER BY n_docs DESC, geohash ASC) AS rank
  FROM counts
) WHERE rank <= {k}
"""


def ip_range_sql(ranges) -> str:
    """ip_range twin: [from, to) uint32 buckets over the md5-derived
    IP."""
    h = _MD5_52.format(e="user_id::VARCHAR || ':ip'")
    arms = []
    for lo, hi, key in ranges:
        conds = []
        if lo is not None:
            conds.append(f"ip >= {lo}")
        if hi is not None:
            conds.append(f"ip < {hi}")
        cond = " AND ".join(conds) or "TRUE"
        arms.append(
            f"SELECT '{key}' AS key, "
            f"sum(CASE WHEN {cond} THEN 1 ELSE 0 END)::BIGINT AS n_events "
            "FROM base"
        )
    body = " UNION ALL ".join(arms)
    return f"""
WITH base AS (SELECT ({h}) % {1 << 32} AS ip FROM events)
{body}
ORDER BY key
"""


_STEM_CASE = """
CASE WHEN length(word) > 5 AND word LIKE '%ing'
       THEN substr(word, 1, length(word) - 3)
     WHEN length(word) > 4 AND word LIKE '%ed'
       THEN substr(word, 1, length(word) - 2)
     WHEN length(word) > 4 AND word LIKE '%es'
       THEN substr(word, 1, length(word) - 2)
     WHEN length(word) > 3 AND word LIKE '%s' AND word NOT LIKE '%ss'
       THEN substr(word, 1, length(word) - 1)
     ELSE word END
"""


def stemmed_terms_sql(k: int) -> str:
    """stemmed_terms twin: pinned minimal-stem CASE + cf ranking."""
    return f"""
WITH toks AS (SELECT unnest({TOKS}) AS word FROM documents),
stems AS (SELECT {_STEM_CASE} AS stem FROM toks),
counts AS (SELECT stem, count(*)::BIGINT AS cf FROM stems GROUP BY 1)
SELECT stem, cf, rank FROM (
  SELECT stem, cf, row_number() OVER (ORDER BY cf DESC, stem ASC) AS rank
  FROM counts
) WHERE rank <= {k}
"""


def moving_median_sql(window: int) -> str:
    """moving_percentiles(p50) twin: trailing-inclusive frame median."""
    frame = f"ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW"
    return f"""
WITH {_DAILY_HIST}
SELECT day::VARCHAR AS day, n_events,
       round(quantile_cont(n_events, 0.5) OVER (ORDER BY day {frame}), 6)
         AS mov_median
FROM hist
ORDER BY day
"""


def packing_stats_sql(budget: int) -> str:
    """packing twin: per-source concat-and-chunk offsets, bins, boundary
    docs."""
    return f"""
WITH base AS (
  SELECT source, doc_id, len({TOKS})::BIGINT AS dl FROM documents
),
placed AS (
  SELECT source, dl,
         (sum(dl) OVER (PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - dl) AS off
  FROM base
),
bins AS (
  SELECT source, dl,
         off // {budget} AS bin_start,
         greatest(off // {budget}, (off + dl - 1) // {budget}) AS bin_end
  FROM placed
)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(dl)::BIGINT AS total_tokens,
       ceil(sum(dl) / {float(budget)!r})::BIGINT AS n_bins,
       sum(CASE WHEN bin_end > bin_start THEN 1 ELSE 0 END)::BIGINT
         AS n_boundary_docs
FROM bins
GROUP BY source ORDER BY source
"""


def terms_lookup_sql(k: int) -> str:
    """terms-lookup twin: shared-distinct-term counts vs the smallest
    doc's token set."""
    return f"""
WITH dt AS (
  SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id, unnest({TOKS}) AS term FROM documents)
),
lookup AS (
  SELECT term FROM dt WHERE doc_id = (SELECT min(doc_id) FROM documents)
),
hits AS (
  SELECT dt.doc_id, count(*)::BIGINT AS n_shared
  FROM dt JOIN lookup USING (term)
  GROUP BY 1
)
SELECT doc_id, n_shared, rank FROM (
  SELECT doc_id, n_shared,
         row_number() OVER (ORDER BY n_shared DESC, doc_id ASC) AS rank
  FROM hits
) WHERE rank <= {k}
"""


def runtime_field_sql(query_text: str, k: int) -> str:
    """runtime-field twin: BM25 page + per-hit computed chars/token."""
    return f"""
WITH {_qterms_cte(query_text)}
{_BM25_AGG},
page AS (
  SELECT doc_id, round(score, 6) AS score, rank FROM (
    SELECT doc_id, score,
           row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
    FROM agg
  ) WHERE rank <= {k}
)
SELECT p.doc_id, p.score, p.rank,
       round(d.n_chars::DOUBLE / len({TOKS})::DOUBLE, 6)
         AS chars_per_token
FROM page p JOIN documents d USING (doc_id)
ORDER BY p.rank
"""


def geo_centroid_sql(pi_lit: float, max_lat: float) -> str:
    """geo_centroid twin: zoom-2 tiles, exact micro-degree BIGINT
    centroid sums."""
    zoom, n, nmax = 2, 4.0, 3
    return f"""
WITH pts AS ({_GEO_COORDS}),
keyed AS (
  SELECT '{zoom}' || '/' ||
         least({nmax}, floor((lon + 180.0) / 360.0 * {n!r}))::BIGINT::VARCHAR
         || '/' ||
         greatest(0, least({nmax}, floor(
           (1.0 - ln(tan(radians(greatest(least(lat, {max_lat!r}),
                                          -{max_lat!r})))
                     + 1.0 / cos(radians(greatest(least(lat, {max_lat!r}),
                                                  -{max_lat!r}))))
                 / {pi_lit!r}) / 2.0 * {n!r})))::BIGINT::VARCHAR AS tile,
         round(lat * 10000.0)::BIGINT AS lat_e4,
         round(lon * 10000.0)::BIGINT AS lon_e4
  FROM pts
)
SELECT tile, count(*)::BIGINT AS n_docs,
       round(sum(lat_e4)::DOUBLE / (count(*)::DOUBLE * 10000.0), 6)
         AS centroid_lat,
       round(sum(lon_e4)::DOUBLE / (count(*)::DOUBLE * 10000.0), 6)
         AS centroid_lon
FROM keyed
GROUP BY tile ORDER BY tile
"""


def mixture_resample_sql(base_keep: float) -> str:
    """mixture_resample twin: sqrt-temperature keep rates, md5-uniform
    decisions."""
    h = _MD5_52.format(e="doc_id::VARCHAR || ':mix'")
    return f"""
WITH toks AS (
  SELECT source, doc_id, len({TOKS})::BIGINT AS dl FROM documents
),
per_src AS (
  SELECT source, count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS tokens
  FROM toks GROUP BY 1
),
mx AS (SELECT max(tokens) AS max_tokens FROM per_src),
rates AS (
  SELECT source, n_docs,
         least(1.0, {float(base_keep)!r}
               * sqrt(max_tokens::DOUBLE / tokens::DOUBLE)) AS keep_rate
  FROM per_src, mx
),
decided AS (
  SELECT t.source, ({h})::DOUBLE / {float(1 << 52)!r} AS u
  FROM toks t
)
SELECT d.source, max(r.n_docs) AS n_docs,
       round(max(r.keep_rate), 6) AS keep_rate,
       sum(CASE WHEN d.u < r.keep_rate THEN 1 ELSE 0 END)::BIGINT AS n_kept
FROM decided d JOIN rates r USING (source)
GROUP BY d.source ORDER BY d.source
"""


def token_budget_trim_sql(budget: int) -> str:
    """token_budget_trim twin: slice + rejoin + md5 witness."""
    return f"""
SELECT doc_id,
       len({TOKS})::BIGINT AS n_tokens,
       least(len({TOKS})::BIGINT, {budget}) AS n_kept,
       md5(array_to_string({TOKS}[1:{budget}], ' ')) AS trimmed_md5
FROM documents
ORDER BY doc_id
"""


def stream_join_sql(window_min: int) -> str:
    """stream-stream join twin: the batch attribution join."""
    return f"""
SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id
 AND p.ts >= v.ts
 AND p.ts <= v.ts + INTERVAL {window_min} MINUTE
ORDER BY v.user_id, view_id, purchase_id
"""


def contexts_suggest_sql(prefix: str, ctx_lang: str, k: int) -> str:
    """context suggester twin: in-context prefix completions by cf."""
    return f"""
WITH toks AS (
  SELECT unnest({TOKS}) AS term FROM documents WHERE lang = '{ctx_lang}'
),
cands AS (
  SELECT term, count(*)::BIGINT AS cf FROM toks
  WHERE starts_with(term, '{prefix}') GROUP BY 1
)
SELECT term, cf, rank FROM (
  SELECT term, cf, row_number() OVER (ORDER BY cf DESC, term ASC) AS rank
  FROM cands
) WHERE rank <= {k}
"""


def random_sampler_sql(p: float) -> str:
    """random_sampler twin: md5-uniform sample, scaled estimates."""
    h = _MD5_52.format(e="doc_id::VARCHAR || ':rs'")
    return f"""
WITH base AS (
  SELECT lang,
         CASE WHEN ({h})::DOUBLE / {float(1 << 52)!r} < {float(p)!r}
              THEN 1 ELSE 0 END AS in_sample
  FROM documents
)
SELECT lang, sum(in_sample)::BIGINT AS n_sampled,
       round(sum(in_sample)::DOUBLE / {float(p)!r}, 6) AS est_docs,
       count(*)::BIGINT AS exact_docs
FROM base GROUP BY lang ORDER BY lang
"""


def pivot_table_sql(sources) -> str:
    """pivot twin: conditional aggregates per pinned source column."""
    cols = ",\n       ".join(
        f"sum(CASE WHEN source = '{s}' THEN 1 ELSE 0 END)::BIGINT AS {s}"
        for s in sources
    )
    inlist = ", ".join(f"'{s}'" for s in sources)
    return f"""
SELECT lang,
       {cols}
FROM documents
WHERE source IN ({inlist})
GROUP BY lang ORDER BY lang
"""


def cube_agg_sql() -> str:
    """cube twin: GROUP BY CUBE with '<all>' sentinels."""
    return """
SELECT coalesce(lang, '<all>') AS lang,
       coalesce(source, '<all>') AS source,
       count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS sum_chars
FROM documents
GROUP BY CUBE (lang, source)
ORDER BY lang, source
"""


def contamination_fraction_sql(
    shingle_k: int, eval_mod: int, threshold: float
) -> str:
    """contamination_fraction twin: shared-distinct-shingle ratio vs the
    eval shingle set."""
    return f"""
WITH sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(toks[i:i+{shingle_k - 1}], ' ') AS shingle
  FROM (SELECT doc_id, {TOKS} AS toks FROM documents),
       unnest(range(1, len(toks) - {shingle_k - 2})) AS t(i)
  WHERE len(toks) >= {shingle_k}
),
ev AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % {eval_mod} = 0
),
tr AS (SELECT * FROM sh WHERE doc_id % {eval_mod} != 0),
totals AS (
  SELECT doc_id, count(*)::BIGINT AS n_shingles FROM tr GROUP BY 1
),
shared AS (
  SELECT tr.doc_id, count(*)::BIGINT AS n_shared
  FROM tr SEMI JOIN ev USING (shingle)
  GROUP BY 1
)
SELECT t.doc_id, t.n_shingles,
       coalesce(s.n_shared, 0)::BIGINT AS n_shared,
       round(coalesce(s.n_shared, 0)::DOUBLE / t.n_shingles::DOUBLE, 6)
         AS frac
FROM totals t LEFT JOIN shared s USING (doc_id)
WHERE round(coalesce(s.n_shared, 0)::DOUBLE / t.n_shingles::DOUBLE, 6)
      >= {threshold!r}
ORDER BY t.doc_id
"""


def ip_prefix_sql(prefix_len: int) -> str:
    """ip_prefix twin: /prefix_len networks of the md5-derived uint32 IP,
    discovered buckets (GROUP BY), ES network-address keys."""
    h = _MD5_52.format(e="user_id::VARCHAR || ':ip'")
    div = float(1 << (32 - prefix_len))
    return f"""
WITH base AS (
  SELECT floor((({h}) % {1 << 32}) / {div!r})::BIGINT AS bucket FROM events
)
SELECT bucket,
       bucket::VARCHAR || '.0.0.0/{prefix_len}' AS key,
       count(*)::BIGINT AS n_events
FROM base GROUP BY 1 ORDER BY bucket
"""


def geo_line_sql(n_tracks: int, size: int) -> str:
    """geo_line twin: per-track first-`size` points in (ts, event_id)
    order, micro-degree integer "lat,lon" joined with '|'."""
    hlat = _MD5_52.format(e="event_id::VARCHAR || ':elat'")
    hlon = _MD5_52.format(e="event_id::VARCHAR || ':elon'")
    return f"""
WITH pts AS (
  SELECT user_id % {n_tracks} AS track_id, ts, event_id,
         (({hlat}) % 1800001 - 900000)::VARCHAR || ',' ||
         (({hlon}) % 3600001 - 1800000)::VARCHAR AS pt
  FROM events
),
head AS (
  SELECT * FROM pts
  QUALIFY row_number() OVER (PARTITION BY track_id ORDER BY ts, event_id)
          <= {size}
)
SELECT track_id::BIGINT AS track_id,
       count(*)::BIGINT AS n_points,
       string_agg(pt, '|' ORDER BY ts, event_id) AS line
FROM head GROUP BY 1 ORDER BY track_id
"""


def lexical_diversity_sql() -> str:
    """lexical_diversity twin: per-doc type-token ratio."""
    return f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents)
SELECT doc_id,
       len(toks)::BIGINT AS n_tokens,
       len(list_distinct(toks))::BIGINT AS n_types,
       CASE WHEN len(toks) > 0
            THEN round(len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE, 6)
            END AS ttr
FROM t ORDER BY doc_id
"""


def cumulative_sum_sql() -> str:
    """cumulative_sum twin: running total over the gap-filled histogram."""
    return f"""
WITH {_DAILY_HIST}
SELECT day::VARCHAR AS day, n_events,
       sum(n_events) OVER (ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
         AS cum_events
FROM hist ORDER BY day
"""


def bucket_correlation_sql() -> str:
    """bucket_correlation twin: Pearson r from exact integer/DECIMAL sums
    (the t_test rule), identical IEEE chain."""
    return """
WITH ev AS (
  SELECT ts::DATE AS day, round(value, 6)::DECIMAL(18,6) AS v FROM events
),
buckets AS (
  SELECT day, count(*)::BIGINT AS x, sum(v)::DECIMAL(18,6) AS y
  FROM ev GROUP BY 1
),
b AS (
  SELECT x, y, (x * x)::BIGINT AS xx,
         x::DECIMAL(12,0) * y AS xy,
         -- width > 18 forces int128 storage; (18,6)*(18,6) multiplies in
         -- int64 raw values and overflows once a day's sum tops ~3e9
         y::DECIMAL(19,6) * y::DECIMAL(19,6) AS yy
  FROM buckets
),
sums AS (
  SELECT count(*)::BIGINT AS nb, sum(x)::BIGINT AS sx, sum(y) AS sy,
         sum(xx)::BIGINT AS sxx, sum(xy) AS sxy, sum(yy) AS syy
  FROM b
)
SELECT nb AS n_buckets,
       round((nb::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / (sqrt(nb::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                * sqrt(nb::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)),
             6) AS corr
FROM sums
"""


def sparse_vector_sql(weights: dict, k: int) -> str:
    """sparse_vector twin: per-occurrence integer weights summed per doc."""
    arms = " ".join(
        f"WHEN '{t}' THEN {w}" for t, w in sorted(weights.items())
    )
    inlist = ", ".join(f"'{t}'" for t in sorted(weights))
    return f"""
WITH occ AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
w AS (
  SELECT doc_id, (CASE term {arms} ELSE 0 END)::BIGINT AS w
  FROM occ WHERE term IN ({inlist})
),
scored AS (
  SELECT doc_id, sum(w)::BIGINT AS score_milli FROM w GROUP BY 1
)
SELECT doc_id, score_milli,
       round(score_milli::DOUBLE / 1000.0, 6) AS score, rank
FROM (
  SELECT doc_id, score_milli,
         row_number() OVER (ORDER BY score_milli DESC, doc_id ASC) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def significant_text_sql(term: str, k: int, min_df: int) -> str:
    """significant_text twin: md5(text) dedup keeping min doc_id, then
    the significant_terms lift over the deduped corpus."""
    return f"""
WITH dd AS (
  SELECT doc_id, {TOKS} AS toks FROM documents
  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
),
fg AS (SELECT doc_id, toks, list_contains(toks, '{term}') AS is_fg FROM dd),
counts AS (
  SELECT count(*)::BIGINT AS n_bg,
         sum(CASE WHEN is_fg THEN 1 ELSE 0 END)::BIGINT AS n_fg
  FROM fg
),
pairs AS (
  SELECT doc_id, is_fg, unnest(list_distinct(toks)) AS term FROM fg
),
stats AS (
  SELECT term, count(*)::BIGINT AS df_bg,
         sum(CASE WHEN is_fg THEN 1 ELSE 0 END)::BIGINT AS df_fg
  FROM pairs GROUP BY 1
),
lifted AS (
  SELECT term, df_fg, df_bg,
         round((df_fg::DOUBLE / c.n_fg::DOUBLE)
               / (df_bg::DOUBLE / c.n_bg::DOUBLE), 6) AS lift
  FROM stats, counts c
  WHERE term != '{term}' AND df_fg >= {min_df}
)
SELECT term, df_fg, df_bg, lift, rank FROM (
  SELECT *, row_number() OVER (ORDER BY lift DESC, term ASC) AS rank
  FROM lifted
) WHERE rank <= {k}
"""


def exists_query_sql(values: tuple) -> str:
    """exists twin: sparse extracted keyword field, per-lang counts."""
    a, b = values
    return f"""
WITH t AS (
  SELECT lang,
         CASE WHEN list_contains({TOKS}, '{a}') THEN '{a}'
              WHEN list_contains({TOKS}, '{b}') THEN '{b}'
              END AS fld
  FROM documents
)
SELECT lang,
       sum(CASE WHEN fld IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_exists,
       sum(CASE WHEN fld IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_missing
FROM t GROUP BY 1 ORDER BY lang
"""


def dfr_sql(query_text: str, inv_ln2: float, k: int) -> str:
    """DFR(IF, L, H2 c=1) twin: identical ln-based log2 chain with the
    shared 1/ln(2) literal; ordered per-doc fold (ascending term)."""
    qlit = query_text.replace("'", "''")
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n, (sum(dl)::DOUBLE / count(*)::DOUBLE) AS avgdl
  FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
cft AS (
  SELECT p.term, sum(p.tf)::DOUBLE AS cf_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
scored AS (
  SELECT p.doc_id, p.term,
         (p.tf::DOUBLE * (ln(1.0 + s.avgdl / l.dl::DOUBLE) * {inv_ln2!r}))
         * (ln(1.0 + (s.n + 1.0) / (c.cf_t + 0.5)) * {inv_ln2!r})
         / (1.0 + p.tf::DOUBLE * (ln(1.0 + s.avgdl / l.dl::DOUBLE) * {inv_ln2!r}))
           AS contrib
  FROM postings p
  JOIN cft c USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
),
agg AS (
  SELECT doc_id,
         round(list_reduce(list_prepend(0.0, list(contrib ORDER BY term)),
                           (a, b) -> a + b), 6) AS score
  FROM scored GROUP BY 1
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM agg
) WHERE rank <= {k}
"""


def variable_width_histogram_sql(k: int, iters: int) -> str:
    """variable_width_histogram twin: pinned order-statistic init +
    `iters` Lloyd passes, ties to the lower bucket id."""
    assert iters == 2, "twin is written for the pinned 2-pass spec"
    return f"""
WITH base AS (SELECT doc_id, n_chars::BIGINT AS v FROM documents),
nn AS (SELECT count(*)::BIGINT AS n FROM base),
ranked AS (
  SELECT doc_id, v, row_number() OVER (ORDER BY v, doc_id) - 1 AS rn
  FROM base
),
c0 AS (
  SELECT i.i AS cid, r.v::DOUBLE AS c
  FROM (SELECT unnest(range({k})) AS i) i, nn, ranked r
  WHERE r.rn = ((2 * i.i + 1) * nn.n) // {2 * k}
),
a1 AS (
  SELECT doc_id, v, cid FROM (
    SELECT b.doc_id, b.v, c.cid,
           row_number() OVER (PARTITION BY b.doc_id
                              ORDER BY abs(b.v::DOUBLE - c.c), c.cid) AS rr
    FROM base b CROSS JOIN c0 c
  ) WHERE rr = 1
),
c1 AS (
  SELECT cid, sum(v)::DOUBLE / count(*)::DOUBLE AS c FROM a1 GROUP BY 1
),
a2 AS (
  SELECT doc_id, v, cid FROM (
    SELECT b.doc_id, b.v, c.cid,
           row_number() OVER (PARTITION BY b.doc_id
                              ORDER BY abs(b.v::DOUBLE - c.c), c.cid) AS rr
    FROM base b CROSS JOIN c1 c
  ) WHERE rr = 1
)
SELECT cid AS bucket, count(*)::BIGINT AS n_docs,
       min(v)::BIGINT AS v_min, max(v)::BIGINT AS v_max,
       round(sum(v)::DOUBLE / count(*)::DOUBLE, 6) AS mean
FROM a2 GROUP BY 1 ORDER BY bucket
"""


def bucket_count_ks_sql() -> str:
    """bucket_count_ks_test twin: KS D vs uniform over the calendar."""
    return f"""
WITH {_DAILY_HIST},
cum AS (
  SELECT row_number() OVER (ORDER BY day) AS idx,
         sum(n_events) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM hist
),
tot AS (
  SELECT count(*)::BIGINT AS n_days, sum(n_events)::BIGINT AS total_events
  FROM hist
)
SELECT n_days, total_events,
       round(max(abs(cum::DOUBLE / total_events::DOUBLE
                     - idx::DOUBLE / n_days::DOUBLE)), 6) AS d_stat
FROM cum, tot GROUP BY 1, 2
"""


def dfi_sql(query_text: str, inv_ln2: float, k: int) -> str:
    """DFI(ChiSquared) twin: expected = (cf+1)*dl/(total+1), zero-clamped
    chi-squared info with the shared 1/ln(2) literal; ordered per-doc fold;
    score must be > 0 to rank (Lucene non-negative-score contract)."""
    qlit = query_text.replace("'", "''")
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT sum(dl)::DOUBLE AS total FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
cft AS (
  SELECT p.term, sum(p.tf)::DOUBLE AS cf_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
scored AS (
  SELECT p.doc_id, p.term,
         CASE WHEN p.tf::DOUBLE <= (c.cf_t + 1.0) * l.dl::DOUBLE / (s.total + 1.0)
              THEN 0.0
              ELSE ln(1.0 + (p.tf::DOUBLE - (c.cf_t + 1.0) * l.dl::DOUBLE / (s.total + 1.0))
                            * (p.tf::DOUBLE - (c.cf_t + 1.0) * l.dl::DOUBLE / (s.total + 1.0))
                            / ((c.cf_t + 1.0) * l.dl::DOUBLE / (s.total + 1.0)))
                   * {inv_ln2!r}
         END AS contrib
  FROM postings p
  JOIN cft c USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
),
agg AS (
  SELECT doc_id,
         round(list_reduce(list_prepend(0.0, list(contrib ORDER BY term)),
                           (a, b) -> a + b), 6) AS score
  FROM scored GROUP BY 1
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM agg WHERE score > 0.0
) WHERE rank <= {k}
"""


def axiomatic_sql(query_text: str, s_param: float, k: int) -> str:
    """AxiomaticF2EXP twin with k pinned 0.5: idf = sqrt((N+1)/df) —
    correctly-rounded IEEE in both engines; ordered per-doc fold."""
    qlit = query_text.replace("'", "''")
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n, (sum(dl)::DOUBLE / count(*)::DOUBLE) AS avgdl
  FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
dft AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
scored AS (
  SELECT p.doc_id, p.term,
         (p.tf::DOUBLE
          / (p.tf::DOUBLE + {s_param!r} + {s_param!r} * l.dl::DOUBLE / s.avgdl))
         * sqrt((s.n + 1.0) / d.df_t) AS contrib
  FROM postings p
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
),
agg AS (
  SELECT doc_id,
         round(list_reduce(list_prepend(0.0, list(contrib ORDER BY term)),
                           (a, b) -> a + b), 6) AS score
  FROM scored GROUP BY 1
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM agg
) WHERE rank <= {k}
"""


BIGRAM_LOGPROB_SQL = f"""
WITH toklists AS (
  SELECT doc_id, {TOKS} AS toks FROM documents
),
bi AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM toklists WHERE len(toks) >= 2
),
model AS (
  SELECT bigram, count(*)::BIGINT AS c_uv FROM bi GROUP BY 1
),
uni AS (
  SELECT t.term, count(*)::BIGINT AS c_u
  FROM (SELECT unnest({TOKS}) AS term FROM documents) t GROUP BY 1
),
vocab AS (
  SELECT count(*)::BIGINT AS v FROM uni
),
logp AS (
  SELECT m.bigram,
         ln((m.c_uv + 1.0) / (u.c_u + vocab.v)) AS lp
  FROM model m
  JOIN uni u ON u.term = split_part(m.bigram, ' ', 1)
  CROSS JOIN vocab
),
per_bi AS (
  SELECT b.doc_id, b.bigram, count(*)::BIGINT AS c_b
  FROM bi b GROUP BY 1, 2
)
SELECT p.doc_id,
       sum(p.c_b)::BIGINT AS n_bigrams,
       round(-list_reduce(list_prepend(0.0, list(p.c_b * l.lp ORDER BY p.bigram)),
                          (a, b) -> a + b)
             / sum(p.c_b)::DOUBLE, 6) AS cross_entropy
FROM per_bi p JOIN logp l USING (bigram)
GROUP BY 1
"""


OLS_TOKEN_CHARS_SQL = f"""
WITH base AS (
  SELECT n_chars::BIGINT AS x, len({TOKS})::BIGINT AS y FROM documents
),
s AS (
  SELECT count(*)::BIGINT AS n,
         sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx,
         sum(y * y)::BIGINT AS syy
  FROM base
)
SELECT n,
       round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 6) AS slope,
       round((sy::DOUBLE - ((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                            / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE))
                           * sx::DOUBLE) / n::DOUBLE, 6) AS intercept,
       round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             * (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / ((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 6) AS r2
FROM s
"""


def winnowing_sql(k: int, w: int, cap: int, topn: int) -> str:
    """Winnowing twin: same k-gram md5 / w-window minima / distinct set /
    hot-fingerprint ranking, in DuckDB list expressions."""
    return f"""
WITH body AS (
  SELECT doc_id, substring(text, 1, {cap}) AS b FROM documents
  WHERE length(substring(text, 1, {cap})) >= {k + w - 1}
),
hashes AS (
  SELECT doc_id,
         list_transform(range(1, length(b) - {k - 2}),
                        i -> md5(substring(b, i, {k}))) AS h
  FROM body
),
fps AS (
  SELECT doc_id,
         unnest(list_distinct(
           list_transform(range(1, len(h) - {w - 2}),
                          j -> list_min(h[j:j + {w - 1}])))) AS fp
  FROM hashes
),
hot AS (
  SELECT fp, count(*)::BIGINT AS n_docs, min(doc_id) AS witness_doc_id
  FROM fps GROUP BY 1 HAVING count(*) >= 2
)
SELECT fp, n_docs, witness_doc_id, rank FROM (
  SELECT fp, n_docs, witness_doc_id,
         row_number() OVER (ORDER BY n_docs DESC, fp ASC) AS rank
  FROM hot
) WHERE rank <= {topn}
"""


def kmv_intersection_sql(lang_a: str, lang_b: str, k: int) -> str:
    """Theta-sketch intersection twin: per-lang KMV over distinct-token
    52-bit md5 hashes, theta = min(kth), matched-hash count under theta."""
    h = _MD5_52.format(e="term")
    return f"""
WITH terms AS (
  SELECT DISTINCT lang, unnest({TOKS}) AS term
  FROM documents WHERE lang IN ('{lang_a}', '{lang_b}')
),
hashed AS (
  SELECT lang, {h} AS h FROM terms
),
sk AS (
  SELECT lang, h FROM (
    SELECT lang, h,
           row_number() OVER (PARTITION BY lang ORDER BY h ASC) AS rn
    FROM hashed
  ) WHERE rn <= {k}
),
kths AS (SELECT lang, max(h) AS kth FROM sk GROUP BY 1),
pair AS (
  SELECT a.kth AS kth_a, b.kth AS kth_b, least(a.kth, b.kth) AS theta
  FROM (SELECT kth FROM kths WHERE lang = '{lang_a}') a,
       (SELECT kth FROM kths WHERE lang = '{lang_b}') b
),
matches AS (
  SELECT count(*)::BIGINT AS n_match
  FROM (SELECT h FROM sk WHERE lang = '{lang_a}') a
  JOIN (SELECT h FROM sk WHERE lang = '{lang_b}') b USING (h)
  CROSS JOIN pair WHERE h < pair.theta
),
exact AS (
  SELECT count(*)::BIGINT AS n_exact
  FROM (SELECT DISTINCT term FROM terms WHERE lang = '{lang_a}') a
  JOIN (SELECT DISTINCT term FROM terms WHERE lang = '{lang_b}') b
    USING (term)
)
SELECT kth_a, kth_b, theta, n_match,
       round(n_match::DOUBLE * {float(1 << 52)!r} / theta::DOUBLE, 6)
         AS est_intersection,
       n_exact
FROM pair, matches, exact
"""


def geo_distance_agg_sql(
    clat: float, clon: float, edges: list[float]
) -> str:
    """geo_distance-agg twin: identical haversine chain, ring bucketing
    on the 3dp-rounded distance, DECIMAL(18,3) exact mean sums, literal
    ring table preserved for empty rings."""
    hlat = _MD5_52.format(e="doc_id::VARCHAR || ':lat'")
    hlon = _MD5_52.format(e="doc_id::VARCHAR || ':lon'")
    rows = []
    for i, lo in enumerate(edges):
        hi = edges[i + 1] if i + 1 < len(edges) else None
        key = f"{lo:g}-{hi:g}" if hi is not None else f"{lo:g}-*"
        hi_sql = f"{hi!r}" if hi is not None else "NULL"
        rows.append(f"({i}, '{key}', {lo!r}, {hi_sql}::DOUBLE)")
    vals = ", ".join(rows)
    return f"""
WITH rings(ring, key, lo, hi) AS (VALUES {vals}),
base AS (
  SELECT doc_id,
         (({hlat}) % 1800001)::DOUBLE / 10000.0 - 90.0 AS lat,
         (({hlon}) % 3600001)::DOUBLE / 10000.0 - 180.0 AS lon
  FROM documents
),
d AS (
  SELECT round(2.0 * 6371.0 * asin(sqrt(
           sin(radians(lat - ({clat!r})) / 2.0)
             * sin(radians(lat - ({clat!r})) / 2.0)
           + cos(radians({clat!r})) * cos(radians(lat))
             * sin(radians(lon - ({clon!r})) / 2.0)
             * sin(radians(lon - ({clon!r})) / 2.0))), 3) AS dist_km
  FROM base
),
agg AS (
  SELECT r.ring, r.key, count(*)::BIGINT AS n_docs,
         sum(d.dist_km::DECIMAL(18,3)) AS dsum
  FROM d JOIN rings r
    ON d.dist_km >= r.lo AND (r.hi IS NULL OR d.dist_km < r.hi)
  GROUP BY 1, 2
)
SELECT r.ring::INT AS ring, r.key,
       coalesce(a.n_docs, 0)::BIGINT AS n_docs,
       round(a.dsum::DOUBLE / a.n_docs::DOUBLE, 6) AS mean_km
FROM rings r LEFT JOIN agg a ON r.ring = a.ring
ORDER BY r.ring
"""


def ccnet_buckets_sql(tiles: int) -> str:
    """CCNet perplexity-bucket twin: ntile over the (rounded ce, doc_id)
    order per lang, composed over the unigram_logprob oracle itself."""
    return f"""
WITH ce AS ({ORACLES["unigram_logprob"]}),
tiled AS (
  SELECT d.lang, ce.cross_entropy,
         ntile({tiles}) OVER (
           PARTITION BY d.lang
           ORDER BY ce.cross_entropy ASC, ce.doc_id ASC) AS bucket
  FROM ce JOIN documents d USING (doc_id)
)
SELECT lang, bucket::INT AS bucket, count(*)::BIGINT AS n_docs,
       round(sum(cross_entropy::DECIMAL(18,6))::DOUBLE
             / count(*)::DOUBLE, 6) AS mean_ce,
       min(cross_entropy) AS min_ce,
       max(cross_entropy) AS max_ce
FROM tiled GROUP BY 1, 2 ORDER BY lang, bucket
"""


ZIPF_FIT_SQL = f"""
WITH freq AS (
  SELECT term, count(*)::BIGINT AS cf
  FROM (SELECT unnest({TOKS}) AS term FROM documents) t GROUP BY 1
),
xy AS (
  SELECT round(ln(rank::DOUBLE), 6)::DECIMAL(18,6) AS x,
         round(ln(cf::DOUBLE), 6)::DECIMAL(18,6) AS y
  FROM (
    SELECT cf, row_number() OVER (ORDER BY cf DESC, term ASC) AS rank
    FROM freq
  )
),
s AS (
  SELECT count(*)::BIGINT AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum((x * y)::DECIMAL(28,12)) AS sxy,
         sum((x * x)::DECIMAL(28,12)) AS sxx,
         sum((y * y)::DECIMAL(28,12)) AS syy
  FROM xy
)
SELECT n,
       round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 6) AS slope,
       round((sy::DOUBLE - ((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                            / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE))
                           * sx::DOUBLE) / n::DOUBLE, 6) AS intercept,
       round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             * (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / ((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 6) AS r2
FROM s
"""


FLESCH_SQL = f"""
SELECT doc_id,
       len({TOKS})::BIGINT AS n_words,
       greatest(1, len(regexp_extract_all(lower(text), '[.!?]+')))::BIGINT
         AS n_sentences,
       len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT
         AS n_syllables,
       round(206.835
             - 1.015 * len({TOKS})::DOUBLE
               / greatest(1, len(regexp_extract_all(lower(text), '[.!?]+')))::DOUBLE
             - 84.6 * len(regexp_extract_all(lower(text), '[aeiouy]+'))::DOUBLE
               / len({TOKS})::DOUBLE, 6) AS fre
FROM documents
WHERE len({TOKS}) > 0
ORDER BY doc_id
"""


def asof_join_sql(left_type: str, right_type: str) -> str:
    """AS-OF join twin: correlated latest-at-or-before pick with the
    pinned (ts desc, event_id desc) tie rule. DuckDB's native ASOF JOIN
    leaves equal-ts ties engine-defined, so the twin ranks explicitly."""
    return f"""
WITH v AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = '{right_type}'
),
p AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = '{left_type}'
),
m AS (
  SELECT event_id, vid, vts FROM (
    SELECT p.event_id, v.event_id AS vid, v.ts AS vts,
           row_number() OVER (PARTITION BY p.event_id
                              ORDER BY v.ts DESC, v.event_id DESC) AS rn
    FROM p JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
  ) WHERE rn = 1
)
SELECT p.event_id, p.user_id,
       epoch_us(p.ts)::BIGINT AS ts_us,
       m.vid AS view_event_id,
       epoch_us(m.vts)::BIGINT AS view_ts_us,
       (epoch_us(p.ts) - epoch_us(m.vts))::BIGINT AS gap_us
FROM p LEFT JOIN m USING (event_id)
ORDER BY p.event_id
"""


DOMAIN_ENTROPY_SQL = """
WITH per AS (
  SELECT source, lang, count(*)::BIGINT AS n_sl
  FROM documents GROUP BY 1, 2
),
rolled AS (
  SELECT source, sum(n_sl)::BIGINT AS n_docs,
         count(*)::INT AS n_langs,
         list((n_sl, lang) ORDER BY lang) AS ls
  FROM per GROUP BY 1
)
SELECT source, n_docs, n_langs,
       round(-list_reduce(
         list_prepend(0.0,
           list_transform(ls, x ->
             (x[1]::DOUBLE / n_docs::DOUBLE)
             * ln(x[1]::DOUBLE / n_docs::DOUBLE))),
         (a, b) -> a + b), 6) AS entropy
FROM rolled ORDER BY source
"""


MINHASH_AUDIT_SQL = f"""
WITH {_SHINGLES},
shc AS (
  SELECT doc_id, shingle FROM (
    SELECT *, count(*) OVER (PARTITION BY shingle) AS bn FROM sh
  ) WHERE bn <= 100
),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM shc GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_inter
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b,
         round(n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE round(n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.5
),
sigs AS (
  SELECT doc_id, i, min(md5(i::VARCHAR || ':' || shingle)) AS sig
  FROM sh, range(0, 12) t(i) GROUP BY 1, 2
),
est AS (
  SELECT p.doc_a, p.doc_b, p.jaccard,
         round(sum(CASE WHEN a.sig = b.sig THEN 1 ELSE 0 END)::DOUBLE
               / 12.0, 6) AS mh_est
  FROM pairs p
  JOIN sigs a ON a.doc_id = p.doc_a
  JOIN sigs b ON b.doc_id = p.doc_b AND b.i = a.i
  GROUP BY 1, 2, 3
)
SELECT doc_a, doc_b, jaccard, mh_est,
       round(abs(mh_est - jaccard), 6) AS abs_err
FROM est ORDER BY doc_a, doc_b
"""


def streaming_topk_keys_sql(topk: int) -> str:
    """Streaming windowed top-k twin: batch per-(day, k) counts ranked
    (n desc, k asc); day as a date string (NTZ-safe both engines)."""
    return f"""
WITH buckets AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(json_extract(props, '$.k') AS INT) AS k,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
)
SELECT day, k, n, rank FROM (
  SELECT day, k, n,
         row_number() OVER (PARTITION BY day ORDER BY n DESC, k ASC) AS rank
  FROM buckets
) WHERE rank <= {topk}
ORDER BY day, rank
"""


def ks_two_sample_sql(src_a: str, src_b: str) -> str:
    """Two-sample KS twin: pooled-value running cumsums, integer-ratio
    CDF legs, one rounded max."""
    return f"""
WITH per AS (
  SELECT source, n_chars AS v, count(*)::BIGINT AS c
  FROM documents WHERE source IN ('{src_a}', '{src_b}')
  GROUP BY 1, 2
),
merged AS (
  SELECT coalesce(a.v, b.v) AS v,
         coalesce(a.c, 0)::BIGINT AS ca, coalesce(b.c, 0)::BIGINT AS cb
  FROM (SELECT v, c FROM per WHERE source = '{src_a}') a
  FULL OUTER JOIN (SELECT v, c FROM per WHERE source = '{src_b}') b
    USING (v)
),
cum AS (
  SELECT v,
         sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cum_a,
         sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cum_b
  FROM merged
),
tot AS (
  SELECT sum(ca)::BIGINT AS n_a, sum(cb)::BIGINT AS n_b FROM merged
)
SELECT n_a, n_b,
       round(max(abs(cum_a::DOUBLE / n_a::DOUBLE
                     - cum_b::DOUBLE / n_b::DOUBLE)), 6) AS d_stat
FROM cum, tot GROUP BY 1, 2
"""


def seasonal_anomaly_sql(factor: float) -> str:
    """Seasonal median/MAD anomaly twin: pinned (day - 2024-01-01) % 7
    dow, exact quantile_cont medians."""
    return f"""
WITH {_DAILY_HIST},
h AS (
  SELECT day::VARCHAR AS day,
         ((day::DATE - DATE '2024-01-01') % 7)::INT AS dow,
         n_events
  FROM hist
),
med AS (
  SELECT dow, quantile_cont(n_events, 0.5) AS med FROM h GROUP BY 1
),
j AS (SELECT h.*, med.med FROM h JOIN med USING (dow)),
mad AS (
  SELECT dow, quantile_cont(abs(n_events - med), 0.5) AS mad
  FROM j GROUP BY 1
)
SELECT j.day, j.dow, j.n_events,
       round(j.med, 6) AS med, round(mad.mad, 6) AS mad,
       (abs(j.n_events::DOUBLE - j.med) > {factor!r} * mad.mad) AS is_anomaly
FROM j JOIN mad USING (dow)
ORDER BY j.day
"""


GINI_SQL = f"""
WITH freq AS (
  SELECT term, count(*)::BIGINT AS cf
  FROM (SELECT unnest({TOKS}) AS term FROM documents) t GROUP BY 1
),
ranked AS (
  SELECT cf, row_number() OVER (ORDER BY cf ASC, term ASC) AS i FROM freq
),
s AS (
  SELECT count(*)::BIGINT AS n_terms, sum(cf)::BIGINT AS total_tokens,
         sum(i * cf)::BIGINT AS iwsum
  FROM ranked
)
SELECT n_terms, total_tokens,
       round((2.0 * iwsum::DOUBLE - (n_terms::DOUBLE + 1.0)
              * total_tokens::DOUBLE)
             / (n_terms::DOUBLE * total_tokens::DOUBLE), 6) AS gini
FROM s
"""


def burstiness_sql(min_df: int, k: int) -> str:
    """Burstiness twin: all-integer per-term sufficient statistics,
    rounded-VMR rank."""
    return f"""
WITH tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest({TOKS}) AS term FROM documents) t
  GROUP BY 1, 2
),
per AS (
  SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS s1,
         sum(tf * tf)::BIGINT AS s2
  FROM tf GROUP BY 1
),
scored AS (
  SELECT term, df, s1,
         round((df::DOUBLE * s2::DOUBLE - s1::DOUBLE * s1::DOUBLE)
               / (df::DOUBLE * s1::DOUBLE), 6) AS vmr
  FROM per WHERE df >= {min_df}
)
SELECT term, df, s1 AS total_tf, vmr, rank FROM (
  SELECT *, row_number() OVER (ORDER BY vmr DESC, term ASC) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def reservoir_sql(n: int) -> str:
    """Bottom-k priority-sample twin."""
    h = _MD5_52.format(e="doc_id::VARCHAR || ':rsv'")
    return f"""
SELECT lang, doc_id, pri, rank FROM (
  SELECT lang, doc_id, {h} AS pri,
         row_number() OVER (PARTITION BY lang
                            ORDER BY {h} ASC, doc_id ASC) AS rank
  FROM documents
) WHERE rank <= {n}
ORDER BY lang, rank
"""


HEAPS_FIT_SQL = f"""
WITH dls AS (
  SELECT doc_id, len({TOKS})::BIGINT AS dl FROM documents
),
first AS (
  SELECT doc_id, count(*)::BIGINT AS new_types FROM (
    SELECT term, min(doc_id) AS doc_id
    FROM (SELECT doc_id, unnest({TOKS}) AS term FROM documents) t
    GROUP BY 1
  ) GROUP BY 1
),
cum AS (
  SELECT d.doc_id,
         sum(d.dl) OVER (ORDER BY d.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens,
         sum(coalesce(f.new_types, 0)) OVER (ORDER BY d.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_vocab
  FROM dls d LEFT JOIN first f USING (doc_id)
),
xy AS (
  SELECT round(ln(cum_tokens::DOUBLE), 6)::DECIMAL(18,6) AS x,
         round(ln(cum_vocab::DOUBLE), 6)::DECIMAL(18,6) AS y
  FROM cum WHERE cum_tokens > 0 AND cum_vocab > 0
),
s AS (
  SELECT count(*)::BIGINT AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum((x * y)::DECIMAL(28,12)) AS sxy,
         sum((x * x)::DECIMAL(28,12)) AS sxx,
         sum((y * y)::DECIMAL(28,12)) AS syy
  FROM xy
)
SELECT n,
       round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 6) AS beta,
       round((sy::DOUBLE - ((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                            / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE))
                           * sx::DOUBLE) / n::DOUBLE, 6) AS intercept,
       round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             * (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / ((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 6) AS r2
FROM s
"""


TOKENS_PER_BYTE_SQL = f"""
SELECT source, count(*)::BIGINT AS n_docs,
       sum(len({TOKS}))::BIGINT AS n_tokens,
       sum(n_chars)::BIGINT AS n_bytes,
       round(sum(len({TOKS}))::DOUBLE / sum(n_chars)::DOUBLE, 6)
         AS tokens_per_byte,
       round(sum(n_chars)::DOUBLE / sum(len({TOKS}))::DOUBLE, 6)
         AS bytes_per_token
FROM documents GROUP BY 1 ORDER BY source
"""


TERMS_ORDER_BY_METRIC_SQL = """
WITH agg AS (
  SELECT event_type, count(*)::BIGINT AS n_events,
         sum(round(value, 6)::DECIMAL(18,6)) AS vsum
  FROM events GROUP BY 1
),
scored AS (
  SELECT event_type, n_events,
         round(vsum::DOUBLE / n_events::DOUBLE, 6) AS mean_value
  FROM agg
)
SELECT event_type, n_events, mean_value,
       row_number() OVER (ORDER BY mean_value DESC, event_type ASC) AS rank
FROM scored
ORDER BY rank
"""


DAILY_DISTINCT_USERS_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       count(*)::BIGINT AS n_events,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM events GROUP BY 1 ORDER BY day
"""


def chunk_stitch_sql(k: int) -> str:
    """Chunk-stitch twin: md5 seam keys, one equi-join."""
    return f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
base AS (
  SELECT doc_id,
         md5(array_to_string(toks[1:{k}], ' ')) AS head_key,
         md5(array_to_string(toks[len(toks) - {k - 1}:len(toks)], ' '))
           AS tail_key
  FROM t WHERE len(toks) >= {k}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.tail_key AS key
FROM base a JOIN base b
  ON a.tail_key = b.head_key AND a.doc_id <> b.doc_id
ORDER BY doc_a, doc_b
"""


TRIGRAM_LANGID_SQL = """
WITH d AS (
  SELECT doc_id, lang, lower(text) AS low FROM documents
  WHERE length(lower(text)) >= 3
),
dg AS (
  SELECT doc_id, lang, g, count(*)::BIGINT AS c FROM (
    SELECT doc_id, lang,
           unnest(list_transform(range(1, length(low) - 1),
                                 i -> substring(low, i, 3))) AS g
    FROM d
  ) GROUP BY 1, 2, 3
),
profile AS (
  SELECT g, lang AS plang, sum(c)::BIGINT AS pc FROM dg GROUP BY 1, 2
),
dnorm AS (
  SELECT doc_id, sum(c * c)::BIGINT AS ss_d FROM dg GROUP BY 1
),
pnorm AS (
  SELECT plang, sum(pc * pc)::BIGINT AS ss_p FROM profile GROUP BY 1
),
dots AS (
  SELECT dg.doc_id, dg.lang, p.plang, sum(dg.c * p.pc)::BIGINT AS dot
  FROM dg JOIN profile p USING (g) GROUP BY 1, 2, 3
),
scored AS (
  SELECT dots.doc_id, dots.lang, dots.plang,
         round(dot::DOUBLE / (sqrt(ss_d::DOUBLE) * sqrt(ss_p::DOUBLE)), 6)
           AS cos
  FROM dots JOIN dnorm USING (doc_id) JOIN pnorm USING (plang)
),
pred AS (
  SELECT doc_id, lang, plang AS predicted FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY cos DESC, plang ASC) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT lang, predicted, count(*)::BIGINT AS n_docs
FROM pred GROUP BY 1, 2 ORDER BY lang, predicted
"""


HOLT_LINEAR_SQL = f"""
WITH {_DAILY_HIST},
packed AS (
  SELECT list(day::VARCHAR ORDER BY day) AS ds,
         list(n_events ORDER BY day) AS raw,
         list([n_events::DOUBLE, 0.0] ORDER BY day) AS pairs
  FROM hist
),
idx AS (
  SELECT ds, raw, pairs, unnest(range(1, len(ds) + 1)) AS i FROM packed
),
folded AS (
  SELECT ds[i] AS day, raw[i]::BIGINT AS n_events,
         list_reduce(pairs[1:i], (acc, x) ->
           [0.5 * x[1] + 0.5 * (acc[1] + acc[2]),
            0.5 * ((0.5 * x[1] + 0.5 * (acc[1] + acc[2])) - acc[1])
              + 0.5 * acc[2]]) AS st
  FROM idx
)
SELECT day, n_events,
       round(st[1], 6) AS level, round(st[2], 6) AS trend
FROM folded ORDER BY day
"""


def ann_pq_sql(m: int, subdim: int, kcode: int, query_vec_id: int, k: int) -> str:
    """PQ/ADC twin: deterministic codebooks (vec_id 1..kcode subvectors),
    6dp-rounded sequential subspace folds, argmin ties to lowest cid,
    ascending-m ADC sum, exact-L2 audit column."""
    dim = m * subdim
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (
  SELECT vec_id::INT AS cid, v AS cv FROM e
  WHERE vec_id BETWEEN 1 AND {kcode}
),
ms AS (SELECT unnest(range({m}))::INT AS m),
tri AS (
  SELECT e.vec_id, ms.m, c.cid,
         round(list_reduce(
           list_prepend(0.0, list_transform(
             range(ms.m * {subdim} + 1, ms.m * {subdim} + {subdim} + 1),
             d -> (e.v[d] - c.cv[d]) * (e.v[d] - c.cv[d]))),
           (a, b) -> a + b), 6) AS d
  FROM e, cents c, ms
),
codes AS (
  SELECT vec_id, m, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                 ORDER BY d ASC, cid ASC) AS rn
    FROM tri
  ) WHERE rn = 1
),
qtab AS (
  SELECT m, cid, d AS qd FROM tri WHERE vec_id = {query_vec_id}
),
adc AS (
  SELECT c.vec_id,
         round(list_reduce(list_prepend(0.0, list(q.qd ORDER BY c.m)),
                           (a, b) -> a + b), 6) AS approx_dist
  FROM codes c JOIN qtab q USING (m, cid)
  GROUP BY 1
),
qv AS (SELECT v AS q FROM e WHERE vec_id = {query_vec_id}),
exact AS (
  SELECT e.vec_id,
         round(list_reduce(
           list_prepend(0.0, list_transform(range(1, {dim + 1}),
             d -> (e.v[d] - qv.q[d]) * (e.v[d] - qv.q[d]))),
           (a, b) -> a + b), 6) AS exact_dist
  FROM e, qv
)
SELECT vec_id, approx_dist, exact_dist, rank FROM (
  SELECT a.vec_id, a.approx_dist, x.exact_dist,
         row_number() OVER (ORDER BY a.approx_dist ASC, a.vec_id ASC) AS rank
  FROM adc a JOIN exact x USING (vec_id)
  WHERE a.vec_id <> {query_vec_id}
) WHERE rank <= {k}
"""


NEAR_DUP_LEAKAGE_SQL = f"""
WITH {_SHINGLES},
shc AS (
  SELECT doc_id, shingle FROM (
    SELECT *, count(*) OVER (PARTITION BY shingle) AS bn FROM sh
  ) WHERE bn <= 100
),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM shc GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_inter
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE round(n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.5
)
SELECT least(da.source, db.source) AS source_lo,
       greatest(da.source, db.source) AS source_hi,
       count(*)::BIGINT AS n_pairs
FROM pairs
JOIN documents da ON da.doc_id = doc_a
JOIN documents db ON db.doc_id = doc_b
GROUP BY 1, 2 ORDER BY source_lo, source_hi
"""


def rocchio_prf_sql(
    query_text: str, fb_k: int, exp_n: int, exp_w: float, k: int
) -> str:
    """Rocchio/RM3 twin: identical three-stage plan — rounded-score
    feedback cut, tf x ln(N/df) expansion lift, weighted ordered fold."""
    qlit = query_text.replace("'", "''")
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS})::DOUBLE AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
dfs AS (
  SELECT term, count(*)::DOUBLE AS df_t FROM postings GROUP BY 1
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
c1 AS (
  SELECT p.doc_id, p.term,
         ln(1.0 + (s.n - d.df_t + 0.5) / (d.df_t + 0.5))
         * p.tf * {K1 + 1.0!r}
         / (p.tf + {K1!r} * ({1.0 - B!r} + {B!r} * l.dl / s.avgdl)) AS contrib
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dfs d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
),
s1 AS (
  SELECT doc_id,
         round(list_reduce(list_prepend(0.0, list(contrib ORDER BY term)),
                           (a, b) -> a + b), 6) AS score
  FROM c1 GROUP BY 1
),
feedback AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
    FROM s1
  ) WHERE rn <= {fb_k}
),
fbtf AS (
  SELECT p.term,
         round(sum(p.tf) * ln(s.n / d.df_t), 6) AS lift
  FROM postings p
  JOIN feedback f USING (doc_id)
  JOIN dfs d USING (term)
  CROSS JOIN stats s
  WHERE p.term NOT IN (SELECT term FROM qterms)
  GROUP BY p.term, s.n, d.df_t
),
expansion AS (
  SELECT term, {exp_w!r} AS w FROM (
    SELECT term, row_number() OVER (ORDER BY lift DESC, term ASC) AS rn
    FROM fbtf
  ) WHERE rn <= {exp_n}
),
q2 AS (
  SELECT term, 1.0 AS w FROM qterms
  UNION ALL SELECT term, w FROM expansion
),
c2 AS (
  SELECT p.doc_id, p.term,
         q.w * ln(1.0 + (s.n - d.df_t + 0.5) / (d.df_t + 0.5))
         * p.tf * {K1 + 1.0!r}
         / (p.tf + {K1!r} * ({1.0 - B!r} + {B!r} * l.dl / s.avgdl)) AS contrib
  FROM postings p
  JOIN q2 q USING (term)
  JOIN dfs d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
),
s2 AS (
  SELECT doc_id,
         round(list_reduce(list_prepend(0.0, list(contrib ORDER BY term)),
                           (a, b) -> a + b), 6) AS score
  FROM c2 GROUP BY 1
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM s2
) WHERE rank <= {k}
"""


def bloom_membership_sql(
    m: int, k_h: int, insert_lang: str, n_probes: int
) -> str:
    """Bloom-filter twin: distinct-position relation as the bitmap,
    synthetic 'probe:i' guaranteed-negative probes."""
    h = _MD5_52.format(e="i::VARCHAR || ':' || term")
    return f"""
WITH inserted AS (
  SELECT DISTINCT unnest({TOKS}) AS term
  FROM documents WHERE lang = '{insert_lang}'
),
probes AS (
  SELECT 'probe:' || j::VARCHAR AS term FROM range({n_probes}) t(j)
),
hashes AS (SELECT unnest(range({k_h}))::INT AS i),
bits AS (
  SELECT DISTINCT ({h}) % {m} AS pos FROM inserted, hashes
),
probe_pos AS (
  SELECT term, ({h}) % {m} AS pos FROM probes, hashes
),
probe_hits AS (
  SELECT term FROM probe_pos p
  WHERE EXISTS (SELECT 1 FROM bits b WHERE b.pos = p.pos)
  GROUP BY term HAVING count(*) = {k_h}
),
counts AS (
  SELECT (SELECT count(*) FROM inserted)::BIGINT AS n_inserted,
         (SELECT count(*) FROM bits)::BIGINT AS n_bits_set,
         (SELECT count(*) FROM probes)::BIGINT AS n_probes,
         (SELECT count(*) FROM probe_hits)::BIGINT AS n_false_pos
)
SELECT {m}::INT AS m, {k_h}::INT AS k, n_inserted, n_bits_set, n_probes,
       n_false_pos,
       round(n_false_pos::DOUBLE / n_probes::DOUBLE, 6) AS fp_rate
FROM counts
"""


def split_report_sql(test_pct: int, val_pct: int) -> str:
    """Hash-split twin."""
    h = _MD5_52.format(e="doc_id::VARCHAR || ':split'")
    return f"""
WITH per AS (
  SELECT lang,
         CASE WHEN ({h}) % 100 < {test_pct} THEN 'test'
              WHEN ({h}) % 100 < {test_pct + val_pct} THEN 'val'
              ELSE 'train' END AS split,
         count(*)::BIGINT AS n_docs
  FROM documents GROUP BY 1, 2
),
tot AS (SELECT lang, sum(n_docs)::BIGINT AS n_lang FROM per GROUP BY 1)
SELECT per.lang, per.split, per.n_docs,
       round(per.n_docs::DOUBLE / tot.n_lang::DOUBLE, 6) AS frac
FROM per JOIN tot USING (lang)
ORDER BY lang, split
"""


def ib_sql(query_text: str, inv_ln2: float, k: int) -> str:
    """IB(LL, LambdaDF, H2 c=1) twin: tfn via the shared 1/ln(2) literal,
    NATURAL-log LL distribution, ordered per-doc fold (ascending term)."""
    qlit = query_text.replace("'", "''")
    tfn = f"(p.tf::DOUBLE * (ln(1.0 + s.avgdl / l.dl::DOUBLE) * {inv_ln2!r}))"
    lam = "((d.df_t + 1.0) / (s.n + 1.0))"
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n, (sum(dl)::DOUBLE / count(*)::DOUBLE) AS avgdl
  FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
dft AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
scored AS (
  SELECT p.doc_id, p.term,
         ln(1.0 + {tfn} / {lam}) AS contrib
  FROM postings p
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
),
agg AS (
  SELECT doc_id,
         round(list_reduce(list_prepend(0.0, list(contrib ORDER BY term)),
                           (a, b) -> a + b), 6) AS score
  FROM scored GROUP BY 1
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM agg
) WHERE rank <= {k}
"""


def boolean_sim_sql(query_text: str, k: int) -> str:
    """BooleanSimilarity twin: score = count of distinct matched query
    terms (pure integers)."""
    qlit = query_text.replace("'", "''")
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest({TOKS}) AS term FROM documents
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS score
  FROM toks JOIN qterms USING (term) GROUP BY 1
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM agg
) WHERE rank <= {k}
"""


def cosine_rescore_sql(query_text: str, depth: int, k: int) -> str:
    """Retrieve-then-rerank twin: BM25 top-depth on the UNROUNDED score
    (the index path's cut), candidates re-ranked by embedding cosine vs
    the fixed query vector (vec_id=0)."""
    return f"""
WITH {_qterms_cte(query_text)}
{_BM25_AGG},
cand AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
    FROM agg
  ) WHERE r <= {depth}
),
qv AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0),
rescored AS (
  SELECT c.doc_id,
         round(list_dot_product(e.embedding::DOUBLE[], qvec)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                        e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(qvec, qvec))), 6) AS cosine
  FROM cand c JOIN embeddings e ON e.vec_id = c.doc_id CROSS JOIN qv
)
SELECT doc_id, cosine, rank FROM (
  SELECT doc_id, cosine,
         row_number() OVER (ORDER BY cosine DESC, doc_id ASC) AS rank
  FROM rescored
) WHERE rank <= {k}
"""


def acf_sql(max_lag: int) -> str:
    """Daily-count autocorrelation twin: exact-integer sufficient
    statistics over the gap-filled calendar, one fixed float64 chain."""
    return f"""
WITH {_DAILY_HIST},
idx AS (
  SELECT row_number() OVER (ORDER BY day) AS i, n_events::BIGINT AS x
  FROM hist
),
g AS (
  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS s,
         sum(x * x)::BIGINT AS ss
  FROM idx
),
lags AS (SELECT unnest(range(1, {max_lag + 1}))::INT AS lag),
per AS (
  SELECT l.lag, count(*)::BIGINT AS n_pairs,
         sum(h1.x * h2.x)::BIGINT AS sxy,
         sum(h1.x)::BIGINT AS sh, sum(h2.x)::BIGINT AS st
  FROM lags l
  JOIN idx h1 ON true
  JOIN idx h2 ON h2.i = h1.i + l.lag
  GROUP BY 1
)
SELECT lag, n_pairs,
       round((sxy::DOUBLE
              - (s::DOUBLE / n::DOUBLE) * (sh + st)::DOUBLE
              + n_pairs::DOUBLE * (s::DOUBLE / n::DOUBLE)
                * (s::DOUBLE / n::DOUBLE))
             / (ss::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE), 6) AS acf
FROM per, g ORDER BY lag
"""


def sig_chi2_sql(query_text: str, min_df: int, k: int) -> str:
    """significant_terms chi_square twin: 2x2 contingency chi-squared,
    positive-association filter by integer cross-multiply."""
    from lucene_mapreduce_spark.functions.tokenize import tokenize_string

    qts = sorted(set(tokenize_string(query_text)))
    qlits = ", ".join(f"'{t}'" for t in qts)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
qt AS (SELECT unnest([{qlits}]) AS term),
hits AS (SELECT DISTINCT doc_id FROM toks JOIN qt USING (term)),
nfg AS (SELECT count(*)::BIGINT AS n FROM hits),
nbg AS (SELECT count(*)::BIGINT AS n FROM documents),
fg AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df_fg
  FROM toks JOIN hits USING (doc_id) GROUP BY 1
),
bg AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df_bg FROM toks GROUP BY 1
),
cells AS (
  SELECT f.term, f.df_fg, b.df_bg,
         f.df_fg::DOUBLE AS a,
         nfg.n::DOUBLE - f.df_fg::DOUBLE AS bb,
         b.df_bg::DOUBLE - f.df_fg::DOUBLE AS c,
         (nbg.n - nfg.n)::DOUBLE - (b.df_bg::DOUBLE - f.df_fg::DOUBLE) AS d,
         nbg.n::DOUBLE AS nall
  FROM fg f JOIN bg b USING (term), nfg, nbg
  WHERE f.term NOT IN ({qlits}) AND f.df_fg >= {min_df}
    AND f.df_fg * nbg.n > b.df_bg * nfg.n
)
SELECT term, df_fg, df_bg, chi2, rank FROM (
  SELECT term, df_fg, df_bg, chi2,
         row_number() OVER (ORDER BY chi2 DESC, term ASC) AS rank
  FROM (
    SELECT term, df_fg, df_bg,
           round(nall * (a * d - bb * c) * (a * d - bb * c)
                 / ((a + bb) * (c + d) * (a + c) * (bb + d)), 6) AS chi2
    FROM cells
  )
) WHERE rank <= {k}
"""


GEO_BOUNDS_SQL = f"""
WITH pts AS ({_GEO_COORDS})
SELECT d.lang, count(*)::BIGINT AS n_docs,
       round(max(p.lat), 6) AS top_left_lat,
       round(min(p.lon), 6) AS top_left_lon,
       round(min(p.lat), 6) AS bottom_right_lat,
       round(max(p.lon), 6) AS bottom_right_lon
FROM pts p JOIN documents d USING (doc_id)
GROUP BY 1 ORDER BY 1
"""


def containment_sql(threshold: float, max_bucket: int) -> str:
    """Directional shingle-containment twin: capped inverted-index
    self-join, both directions, filter on the ROUNDED value."""
    return f"""
WITH {_SHINGLES},
shc AS (
  SELECT doc_id, shingle FROM (
    SELECT *, count(*) OVER (PARTITION BY shingle) AS bn FROM sh
  ) WHERE bn <= {max_bucket}
),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM shc GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_inter
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
bi AS (
  SELECT doc_a, doc_b, n_inter, sa.n_sh AS n_a, sb.n_sh AS n_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
),
directed AS (
  SELECT doc_a AS doc_src, doc_b AS doc_dst,
         round(n_inter::DOUBLE / n_a, 6) AS containment FROM bi
  UNION ALL
  SELECT doc_b AS doc_src, doc_a AS doc_dst,
         round(n_inter::DOUBLE / n_b, 6) AS containment FROM bi
)
SELECT doc_src, doc_dst, containment
FROM directed WHERE containment >= {threshold!r}
"""


DUP_CLUSTER_HIST_SQL = f"""
WITH comp AS (SELECT * FROM ({ORACLES["near_dup_components"]}) t),
sizes AS (SELECT component, count(*)::BIGINT AS size FROM comp GROUP BY 1)
SELECT size, count(*)::BIGINT AS n_clusters
FROM sizes GROUP BY 1 ORDER BY 1
"""


def frequent_triples_sql(hot_k: int, k: int) -> str:
    """frequent_item_sets size=3 twin: hot-k df prune, triple self-join."""
    return f"""
WITH dt AS (
  SELECT DISTINCT doc_id, unnest({TOKS}) AS term FROM documents
),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM dt GROUP BY 1),
hot AS (
  SELECT term FROM (
    SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r
    FROM dfs
  ) WHERE r <= {hot_k}
),
ht AS (SELECT dt.doc_id, dt.term FROM dt JOIN hot USING (term)),
triples AS (
  SELECT a.term AS term_a, b.term AS term_b, c.term AS term_c,
         count(*)::BIGINT AS support
  FROM ht a
  JOIN ht b ON a.doc_id = b.doc_id AND a.term < b.term
  JOIN ht c ON b.doc_id = c.doc_id AND b.term < c.term
  GROUP BY 1, 2, 3
)
SELECT term_a, term_b, term_c, support, rank FROM (
  SELECT *, row_number() OVER (
    ORDER BY support DESC, term_a ASC, term_b ASC, term_c ASC) AS rank
  FROM triples
) WHERE rank <= {k}
"""


KL_BY_SOURCE_SQL = f"""
WITH toks AS (
  SELECT source, unnest({TOKS}) AS term FROM documents
),
per AS (
  SELECT source, term, count(*)::BIGINT AS cnt FROM toks GROUP BY 1, 2
),
tot_s AS (SELECT source, sum(cnt)::BIGINT AS tot_s FROM per GROUP BY 1),
corpus AS (SELECT term, sum(cnt)::BIGINT AS cf FROM per GROUP BY 1),
tot AS (SELECT sum(cf)::BIGINT AS tot FROM corpus),
contribs AS (
  SELECT p.source,
         round((p.cnt::DOUBLE / t.tot_s::DOUBLE)
               * ln((p.cnt::DOUBLE / t.tot_s::DOUBLE)
                    / (c.cf::DOUBLE / g.tot::DOUBLE)),
               12)::DECIMAL(28,12) AS contrib
  FROM per p
  JOIN tot_s t USING (source)
  JOIN corpus c USING (term)
  CROSS JOIN tot g
)
SELECT source, count(*)::BIGINT AS n_terms,
       round(sum(contrib)::DOUBLE, 6) AS kl_nats
FROM contribs GROUP BY 1 ORDER BY 1
"""


CENTROID_BY_LABEL_SQL = """
WITH comp AS (
  SELECT label, unnest(range(len(embedding))) AS dim, embedding
  FROM embeddings
),
vals AS (
  SELECT label, dim,
         round(embedding[dim + 1]::DOUBLE, 6)::DECIMAL(18,6) AS v
  FROM comp
),
per AS (
  SELECT label, dim, count(*)::BIGINT AS n, sum(v) AS s
  FROM vals GROUP BY 1, 2
),
m AS (SELECT label, dim, s::DOUBLE / n AS m FROM per),
g AS (
  SELECT dim, sum(s)::DOUBLE / sum(n)::DOUBLE AS g FROM per GROUP BY 1
),
folded AS (
  SELECT label,
         list_reduce(list_prepend(0.0, list(m * g ORDER BY dim)),
                     (a, b) -> a + b) AS dot,
         sqrt(list_reduce(list_prepend(0.0, list(m * m ORDER BY dim)),
                          (a, b) -> a + b)) AS norm_m,
         sqrt(list_reduce(list_prepend(0.0, list(g * g ORDER BY dim)),
                          (a, b) -> a + b)) AS norm_g
  FROM m JOIN g USING (dim) GROUP BY label
),
counts AS (SELECT label, count(*)::BIGINT AS n_vecs FROM embeddings GROUP BY 1)
SELECT c.label, c.n_vecs,
       round(f.norm_m, 6) AS centroid_norm,
       round(f.dot / (f.norm_m * f.norm_g), 6) AS cos_to_global
FROM counts c JOIN folded f USING (label)
ORDER BY c.label
"""


def most_fields_sql(query_text: str, k: int) -> str:
    """multi_match most_fields twin: independent per-field BM25, text leg
    = the shared _BM25_AGG chain, keyword leg = pure idf (single-token
    field), one full-outer add rounded 6dp."""
    from lucene_mapreduce_spark.functions.tokenize import tokenize_string

    qts = sorted(set(tokenize_string(query_text)))
    qlits = ", ".join(f"'{t}'" for t in qts)
    return f"""
WITH {_qterms_cte(query_text)}
{_BM25_AGG},
dfk AS (
  SELECT source, count(*)::DOUBLE AS dfk FROM documents GROUP BY 1
),
kleg AS (
  SELECT d.doc_id,
         ln(1.0 + (s.n_docs - k.dfk + 0.5) / (k.dfk + 0.5)) AS kscore
  FROM documents d JOIN dfk k USING (source) CROSS JOIN stats s
  WHERE d.source IN ({qlits})
),
fused AS (
  SELECT coalesce(t.doc_id, kl.doc_id) AS doc_id,
         round(coalesce(t.score, 0.0) + coalesce(kl.kscore, 0.0), 6) AS score
  FROM agg t FULL OUTER JOIN kleg kl USING (doc_id)
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM fused
) WHERE rank <= {k}
"""


ORACLES["streaming_dedup_watermark"] = """
SELECT DISTINCT user_id, event_type FROM events
"""


def weighted_reservoir_sql(k: int) -> str:
    """A-ES weighted bottom-k twin: u = (md5_52 + 1)/(2^52 + 1),
    key = round(-ln(u)/n_chars, 6), per-lang rank on (key, doc_id)."""
    h = _MD5_52.format(e="doc_id::VARCHAR || ':wrs'")
    return f"""
WITH keyed AS (
  SELECT lang, doc_id, n_chars::BIGINT AS n_chars,
         round(-ln((({h})::DOUBLE + 1.0) / 4503599627370497.0)
               / n_chars::DOUBLE, 6) AS es_key
  FROM documents
)
SELECT lang, doc_id, n_chars, es_key, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY lang ORDER BY es_key ASC, doc_id ASC) AS rank
  FROM keyed
) WHERE rank <= {k}
"""


CHAR_TRIGRAM_ENTROPY_SQL = """
WITH lowered AS (
  SELECT lang, lower(text) AS t FROM documents WHERE len(lower(text)) >= 3
),
grams AS (
  SELECT lang, substr(t, i::INT, 3) AS g
  FROM (SELECT lang, t, unnest(range(1, len(t) - 1)) AS i FROM lowered)
),
per AS (SELECT lang, g, count(*)::BIGINT AS c FROM grams GROUP BY 1, 2),
tot AS (SELECT lang, sum(c)::BIGINT AS tot FROM per GROUP BY 1),
contribs AS (
  SELECT per.lang,
         round((c::DOUBLE / tot::DOUBLE) * ln(c::DOUBLE / tot::DOUBLE),
               12)::DECIMAL(28,12) AS contrib
  FROM per JOIN tot USING (lang)
)
SELECT lang, count(*)::BIGINT AS n_trigrams,
       round(-(sum(contrib)::DOUBLE), 6) AS entropy_nats
FROM contribs GROUP BY 1 ORDER BY 1
"""


VOCAB_OVERLAP_SQL = f"""
WITH vocab AS (
  SELECT DISTINCT source, unnest({TOKS}) AS term FROM documents
),
sizes AS (SELECT source, count(*)::BIGINT AS n_terms FROM vocab GROUP BY 1),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*)::BIGINT AS n_inter
  FROM vocab a JOIN vocab b ON a.term = b.term AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_inter,
       round(n_inter::DOUBLE / (sa.n_terms + sb.n_terms - n_inter), 6)
         AS jaccard
FROM inter
JOIN sizes sa ON sa.source = src_a
JOIN sizes sb ON sb.source = src_b
ORDER BY src_a, src_b
"""


def stopword_coverage_sql(k: int) -> str:
    """Top-k token-mass coverage twin: all-integer rank + running sum."""
    return f"""
WITH freq AS (
  SELECT term, count(*)::BIGINT AS cf
  FROM (SELECT unnest({TOKS}) AS term FROM documents) t GROUP BY 1
),
tot AS (SELECT sum(cf)::BIGINT AS tot FROM freq),
head AS (
  SELECT term, cf, rank FROM (
    SELECT term, cf, row_number() OVER (ORDER BY cf DESC, term ASC) AS rank
    FROM freq
  ) WHERE rank <= {k}
)
SELECT term, cf, rank,
       (sum(cf) OVER (ORDER BY rank
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
         AS cum_cf,
       round((sum(cf) OVER (ORDER BY rank
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
             / tot::DOUBLE, 6) AS coverage
FROM head, tot ORDER BY rank
"""


_CAND_COS = """round(list_dot_product(e.embedding::DOUBLE[], qvec)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                        e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(qvec, qvec))), 6)"""


def mmr_sql(lam: float, depth: int, k: int) -> str:
    """MMR twin: cosine top-depth candidates + rounded sim matrix, greedy
    unrolled as k chained CTEs (argmax with (mmr DESC, vec_id ASC) ties);
    rank-1 score is pure relevance."""
    one_m = 1.0 - lam
    parts = [f"""
WITH qv AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0),
scoredall AS (
  SELECT e.vec_id, e.embedding, {_CAND_COS} AS rel
  FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> 0
),
cand AS (
  SELECT vec_id, embedding, rel FROM (
    SELECT *, row_number() OVER (ORDER BY rel DESC, vec_id ASC) AS r
    FROM scoredall
  ) WHERE r <= {depth}
),
sims AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
               / (sqrt(list_dot_product(a.embedding::DOUBLE[],
                                        a.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(b.embedding::DOUBLE[],
                                          b.embedding::DOUBLE[]))), 6) AS s
  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
),
s1 AS (
  SELECT 1 AS rank, vec_id, rel AS mmr FROM cand
  ORDER BY rel DESC, vec_id ASC LIMIT 1
),
sel1 AS (SELECT vec_id FROM s1)"""]
    for i in range(2, k + 1):
        parts.append(f""",
r{i} AS (
  SELECT c.vec_id, {lam!r} * c.rel - {one_m!r} * max(s.s) AS mmr
  FROM cand c JOIN sims s ON s.va = c.vec_id
    AND s.vb IN (SELECT vec_id FROM sel{i - 1})
  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
  GROUP BY c.vec_id, c.rel
),
s{i} AS (
  SELECT {i} AS rank, vec_id, mmr FROM r{i}
  ORDER BY mmr DESC, vec_id ASC LIMIT 1
),
sel{i} AS (SELECT vec_id FROM sel{i - 1} UNION ALL SELECT vec_id FROM s{i})""")
    union = " UNION ALL ".join(f"SELECT * FROM s{i}" for i in range(1, k + 1))
    parts.append(f"""
SELECT rank, vec_id, round(mmr, 6) AS mmr FROM ({union}) ORDER BY rank""")
    return "".join(parts)


ORACLES["index_posting_audit"] = f"""
WITH postings AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest({TOKS}) AS term FROM documents) t
  GROUP BY 1, 2
)
SELECT count(*)::BIGINT AS n_postings,
       sum(tf)::BIGINT AS total_tokens,
       count(DISTINCT doc_id)::BIGINT AS n_docs,
       count(DISTINCT term)::BIGINT AS n_terms,
       max(tf)::BIGINT AS max_tf
FROM postings
"""


NEAR_DUP_DEGREE_HIST_SQL = f"""
WITH edges AS ({ORACLES["minhash_lsh_pairs"]}),
nodes AS (
  SELECT doc_a AS doc_id FROM edges
  UNION ALL SELECT doc_b AS doc_id FROM edges
),
deg AS (SELECT doc_id, count(*)::BIGINT AS degree FROM nodes GROUP BY 1)
SELECT degree, count(*)::BIGINT AS n_docs
FROM deg GROUP BY 1 ORDER BY 1
"""


def session_duration_sql(gap_s: int) -> str:
    """Batch sessionization rollup twin: gaps-and-islands with total
    (us, event_id) order, exact integer micros durations."""
    gap_us = gap_s * 1_000_000
    return f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
),
x AS (
  SELECT user_id, event_id, us,
         CASE WHEN lag(us) OVER (PARTITION BY user_id
                                 ORDER BY us, event_id) IS NULL
                OR us - lag(us) OVER (PARTITION BY user_id
                                      ORDER BY us, event_id) >= {gap_us}
              THEN 1 ELSE 0 END AS brk
  FROM e
),
y AS (
  SELECT user_id, us,
         sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM x
),
sessions AS (
  SELECT user_id, sid, count(*)::BIGINT AS n_events,
         (max(us) - min(us))::BIGINT AS dur_us
  FROM y GROUP BY 1, 2
)
SELECT count(*)::BIGINT AS n_sessions,
       count(DISTINCT user_id)::BIGINT AS n_users,
       round(sum(n_events)::DOUBLE / count(*)::DOUBLE, 6) AS mean_events,
       round(sum(dur_us)::DOUBLE / count(*)::DOUBLE / 1000000.0, 6)
         AS mean_duration_s,
       round(max(dur_us)::DOUBLE / 1000000.0, 6) AS max_duration_s
FROM sessions
"""


def rbo_sql(query_text: str, weights: list[tuple[int, float]], depth: int) -> str:
    """RBO twin: BM25 ranks on the UNROUNDED score (index path's cut),
    cosine ranks, shared Python geometric-weight literals, ascending-d
    fold."""
    wrows = " UNION ALL ".join(
        f"SELECT {d} AS d, {w!r} AS w" for d, w in weights
    )
    return f"""
WITH {_qterms_cte(query_text)}
{_BM25_AGG},
lex AS (
  SELECT doc_id AS id, r AS ra FROM (
    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
    FROM agg
  ) WHERE r <= {depth}
),
qv AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0),
vec AS (
  SELECT vec_id AS id, r AS rb FROM (
    SELECT e.vec_id,
           row_number() OVER (ORDER BY {_CAND_COS} DESC, e.vec_id ASC) AS r
    FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> 0
  ) WHERE r <= {depth}
),
weights AS ({wrows}),
ov AS (
  SELECT w.d, w.w, count(*)::BIGINT AS ov
  FROM lex JOIN vec USING (id) CROSS JOIN weights w
  WHERE lex.ra <= w.d AND vec.rb <= w.d
  GROUP BY 1, 2
)
SELECT {depth} AS depth, {0.9!r} AS p,
       round(list_reduce(list_prepend(0.0,
               list(w * (ov::DOUBLE) / (d::DOUBLE) ORDER BY d)),
             (a, b) -> a + b), 6) AS rbo
FROM ov
"""


SIMHASH_HAMMING_HIST_SQL = f"""
WITH pairs AS ({ORACLES["simhash_near_pairs"]})
SELECT hamming, count(*)::BIGINT AS n_pairs
FROM pairs GROUP BY 1 ORDER BY 1
"""


def top_dup_ngrams_sql(n: int, k: int) -> str:
    """Top duplicated token n-gram twin: positional grams (list slice is
    END-INCLUSIVE in DuckDB), distinct per doc, df >= 2."""
    return f"""
WITH tok AS (SELECT doc_id, {TOKS} AS tokens FROM documents),
grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(tokens[i:i+{n - 1}], ' ') AS gram
  FROM (
    SELECT doc_id, tokens, unnest(range(1, len(tokens) - {n - 2})) AS i
    FROM tok WHERE len(tokens) >= {n}
  )
),
dfs AS (SELECT gram, count(*)::BIGINT AS df FROM grams GROUP BY 1)
SELECT gram, df, rank FROM (
  SELECT gram, df, row_number() OVER (ORDER BY df DESC, gram ASC) AS rank
  FROM dfs WHERE df >= 2
) WHERE rank <= {k}
"""


LANG_SOURCE_INDEP_SQL = """
WITH cells AS (
  SELECT source, lang, count(*)::BIGINT AS o FROM documents GROUP BY 1, 2
),
rows_m AS (SELECT source, sum(o)::BIGINT AS rt FROM cells GROUP BY 1),
cols_m AS (SELECT lang, sum(o)::BIGINT AS ct FROM cells GROUP BY 1),
nn AS (SELECT sum(o)::BIGINT AS n FROM cells),
contribs AS (
  SELECT c.source, c.lang,
         (c.o::DOUBLE - r.rt::DOUBLE * l.ct::DOUBLE / nn.n::DOUBLE)
         * (c.o::DOUBLE - r.rt::DOUBLE * l.ct::DOUBLE / nn.n::DOUBLE)
         / (r.rt::DOUBLE * l.ct::DOUBLE / nn.n::DOUBLE) AS c
  FROM cells c
  JOIN rows_m r USING (source)
  JOIN cols_m l USING (lang)
  CROSS JOIN nn
),
folded AS (
  SELECT count(*)::BIGINT AS n_cells,
         round(list_reduce(list_prepend(0.0,
                 list(c ORDER BY source, lang)), (a, b) -> a + b), 6) AS chi2
  FROM contribs
)
SELECT f.n_cells,
       ((SELECT count(*) FROM rows_m) - 1)::BIGINT
         * ((SELECT count(*) FROM cols_m) - 1)::BIGINT AS dof,
       f.chi2
FROM folded f
"""


def session_pairs_sql(gap_s: int, k: int) -> str:
    """Session market-basket twin: gaps-and-islands sessions, distinct
    event-type baskets, pair support rank."""
    gap_us = gap_s * 1_000_000
    return f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
),
x AS (
  SELECT user_id, event_id, event_type, us,
         CASE WHEN lag(us) OVER (PARTITION BY user_id
                                 ORDER BY us, event_id) IS NULL
                OR us - lag(us) OVER (PARTITION BY user_id
                                      ORDER BY us, event_id) >= {gap_us}
              THEN 1 ELSE 0 END AS brk
  FROM e
),
y AS (
  SELECT user_id, event_type,
         sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM x
),
baskets AS (SELECT DISTINCT user_id, sid, event_type FROM y),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*)::BIGINT AS support
  FROM baskets a
  JOIN baskets b ON a.user_id = b.user_id AND a.sid = b.sid
                AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, support, rank FROM (
  SELECT *, row_number() OVER (
    ORDER BY support DESC, type_a ASC, type_b ASC) AS rank
  FROM pairs
) WHERE rank <= {k}
"""


def vector_prf_sql(fb_k: int, k: int) -> str:
    """Vector-PRF twin: cosine top-fb_k feedback, DECIMAL-mean recentered
    query over {query} ∪ feedback, one corpus re-scan."""
    return f"""
WITH qv AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0),
first AS (
  SELECT e.vec_id, {_CAND_COS} AS cosine
  FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> 0
),
fb AS (
  SELECT vec_id FROM (
    SELECT vec_id, row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS r
    FROM first
  ) WHERE r <= {fb_k}
),
pool AS (SELECT vec_id FROM fb UNION ALL SELECT 0 AS vec_id),
comps AS (
  SELECT dim, round(embedding[dim + 1]::DOUBLE, 6)::DECIMAL(18,6) AS v
  FROM (
    SELECT e.embedding, unnest(range(len(e.embedding))) AS dim
    FROM embeddings e JOIN pool USING (vec_id)
  )
),
m AS (
  SELECT dim, sum(v)::DOUBLE / count(*)::BIGINT AS m
  FROM comps GROUP BY 1
),
qn AS (SELECT list(m ORDER BY dim) AS qvec FROM m),
rescored AS (
  SELECT e.vec_id, {_CAND_COS} AS cosine
  FROM embeddings e CROSS JOIN qn WHERE e.vec_id <> 0
)
SELECT vec_id, cosine, rank FROM (
  SELECT vec_id, cosine,
         row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM rescored
) WHERE rank <= {k}
"""


def value_percentiles_sql(ps: tuple[float, ...]) -> str:
    """Grouped type-7 percentiles twin over 6dp-rounded values."""
    rows = " UNION ALL ".join(
        f"SELECT event_type, {p} AS p,"
        f" round(quantile_cont(v, {p}), 6) AS value_quantile"
        f" FROM ev GROUP BY event_type" for p in ps
    )
    return f"""
WITH ev AS (SELECT event_type, round(value, 6) AS v FROM events)
{rows}
ORDER BY event_type, p
"""


def user_reach_wilson_sql(z: float) -> str:
    """Wilson interval twin: identical fixed chain, z and z^2 as shared
    Python literals."""
    z2 = z * z
    p = "(k::DOUBLE / n::DOUBLE)"
    denom = f"(1.0 + {z2!r} / n::DOUBLE)"
    center = f"({p} + {z2!r} / (2.0 * n::DOUBLE)) / {denom}"
    half = (
        f"{z!r} * sqrt({p} * (1.0 - {p}) / n::DOUBLE"
        f" + {z2!r} / (4.0 * n::DOUBLE * n::DOUBLE)) / {denom}"
    )
    return f"""
WITH per AS (
  SELECT event_type, count(DISTINCT user_id)::BIGINT AS k
  FROM events GROUP BY 1
),
tot AS (SELECT count(DISTINCT user_id)::BIGINT AS n FROM events)
SELECT event_type, k AS n_users_type, n AS n_users,
       round({p}, 6) AS p_hat,
       round({center} - {half}, 6) AS wilson_lo,
       round({center} + {half}, 6) AS wilson_hi
FROM per, tot ORDER BY event_type
"""


ORACLES["hourly_activity_profile"] = """
SELECT (epoch_us(ts) // 3600000000) % 24 AS hour,
       event_type, count(*)::BIGINT AS n_events
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


INT8_QUANT_AUDIT_SQL = """
WITH comp AS (
  SELECT vec_id, label, dim, embedding[dim + 1]::DOUBLE AS v
  FROM (
    SELECT vec_id, label, embedding,
           unnest(range(len(embedding))) AS dim
    FROM embeddings
  )
),
dimstats AS (
  SELECT dim, min(v) AS mn, max(v) AS mx FROM comp GROUP BY 1
),
errs AS (
  SELECT c.vec_id, c.label, c.dim,
         (c.v - CASE WHEN d.mx = d.mn THEN d.mn
                     ELSE d.mn + round((c.v - d.mn) / ((d.mx - d.mn) / 255.0))
                           * ((d.mx - d.mn) / 255.0) END)
         * (c.v - CASE WHEN d.mx = d.mn THEN d.mn
                       ELSE d.mn + round((c.v - d.mn) / ((d.mx - d.mn) / 255.0))
                             * ((d.mx - d.mn) / 255.0) END) AS e2
  FROM comp c JOIN dimstats d USING (dim)
),
per_vec AS (
  SELECT vec_id, label,
         round(list_reduce(list_prepend(0.0, list(e2 ORDER BY dim)),
                           (a, b) -> a + b) / 64.0, 6) AS mse
  FROM errs GROUP BY 1, 2
)
SELECT label, count(*)::BIGINT AS n_vecs,
       round(sum(mse::DECIMAL(18,6))::DOUBLE / count(*), 6) AS mean_mse,
       max(mse) AS max_mse
FROM per_vec GROUP BY 1 ORDER BY 1
"""


ORACLES["rolling_7d_distinct_users"] = """
WITH pairs AS (SELECT DISTINCT ts::DATE AS day, user_id FROM events),
cal AS (SELECT DISTINCT ts::DATE AS day FROM events),
fan AS (
  SELECT (p.day + o.off * INTERVAL 1 DAY)::DATE AS day, p.user_id
  FROM pairs p, (SELECT unnest(range(7))::INT AS off) o
)
SELECT f.day::VARCHAR AS day, count(DISTINCT f.user_id)::BIGINT AS wau
FROM fan f JOIN cal USING (day)
GROUP BY f.day ORDER BY f.day
"""


def time_to_convert_sql(step_a: str, step_b: str) -> str:
    """First-touch conversion timing twin: exact micros deltas, type-7
    median on the per-row /1e6 chain, mean from the exact sum."""
    return f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
),
fa AS (
  SELECT user_id, min(us) AS ta FROM e
  WHERE event_type = '{step_a}' GROUP BY 1
),
fb AS (
  SELECT e.user_id, min(e.us) AS tb, min(fa.ta) AS ta2
  FROM e JOIN fa USING (user_id)
  WHERE e.event_type = '{step_b}' AND e.us > fa.ta
  GROUP BY 1
),
deltas AS (
  SELECT (tb - ta2)::BIGINT AS dus, (tb - ta2) / 1000000.0 AS dt_s FROM fb
)
SELECT count(*)::BIGINT AS n_converted,
       round(quantile_cont(dt_s, 0.5), 6) AS p50_s,
       round(sum(dus)::DOUBLE / count(*)::DOUBLE / 1000000.0, 6) AS mean_s,
       round(max(dus)::DOUBLE / 1000000.0, 6) AS max_s
FROM deltas
"""


TERM_DF_HISTOGRAM_SQL = f"""
WITH dfs AS (
  SELECT term, count(*)::BIGINT AS df
  FROM (SELECT DISTINCT doc_id, unnest({TOKS}) AS term FROM documents) t
  GROUP BY 1
),
b AS (SELECT (length(bin(df)) - 1)::INT AS log2_df, df FROM dfs)
SELECT log2_df, (1::BIGINT << log2_df)::BIGINT AS df_lo,
       count(*)::BIGINT AS n_terms, sum(df)::BIGINT AS sum_df
FROM b GROUP BY 1 ORDER BY 1
"""


ORACLES["generation_diff_report"] = """
SELECT count(*)::BIGINT AS n_docs,
       sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_changed,
       sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_unchanged,
       (-2 * sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END))::BIGINT
         AS token_delta
FROM documents
"""


# ---------------------------------------------------------------------------
# Batch 37: warehouse-relational pack (operators/relational.py). Float
# aggregates follow the round-then-DECIMAL-sum rule; per-row products are
# single-expression float64 chains identical in both engines (2-dp TPC-H
# value shapes keep the 4-dp round far from representation boundaries).

ORACLES["pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity::BIGINT)::BIGINT AS sum_qty,
       round((sum(round(l_extendedprice, 2)::DECIMAL(28,2)))::DOUBLE, 4)
         AS sum_base_price,
       round((sum(round(l_extendedprice * (1 - l_discount), 4)
                  ::DECIMAL(28,4)))::DOUBLE, 4) AS sum_disc_price,
       round((sum(round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6)
                  ::DECIMAL(28,6)))::DOUBLE, 6) AS sum_charge,
       round(sum(l_quantity::BIGINT)::DOUBLE / count(*), 6) AS avg_qty,
       round((sum(round(l_extendedprice, 2)::DECIMAL(28,2)))::DOUBLE
             / count(*), 6) AS avg_price,
       round((sum(round(l_discount, 2)::DECIMAL(28,2)))::DOUBLE
             / count(*), 6) AS avg_disc,
       count(*)::BIGINT AS n_lines
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLES["order_priority_count"] = """
SELECT o_orderpriority, count(*)::BIGINT AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY)
GROUP BY 1 ORDER BY 1
"""

ORACLES["returned_item_customers"] = """
WITH rev AS (
  SELECT o_custkey,
         sum(round(l_extendedprice * (1 - l_discount), 4)::DECIMAL(28,4))
           AS revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
  GROUP BY 1
),
ranked AS (
  SELECT c_custkey, c_name, n_name,
         round(rev.revenue::DOUBLE, 4) AS revenue,
         row_number() OVER (ORDER BY rev.revenue DESC, c_custkey) AS rank
  FROM rev
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
)
SELECT * FROM ranked WHERE rank <= 20 ORDER BY rank
"""

ORACLES["local_supplier_volume"] = """
SELECT n_name,
       round((sum(round(l_extendedprice * (1 - l_discount), 4)
                  ::DECIMAL(28,4)))::DOUBLE, 4) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1 ORDER BY 2 DESC, 1
"""

ORACLES["large_volume_customers"] = """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity::BIGINT)::BIGINT AS total_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity::BIGINT) > 250
)
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_day,
       round(o_totalprice, 2) AS o_totalprice, total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey
"""

ORACLES["rfm_segments"] = """
WITH per_cust AS (
  SELECT o_custkey,
         max(o_orderdate) AS last_order,
         count(*)::BIGINT AS frequency,
         sum(round(o_totalprice, 2)::DECIMAL(28,2)) AS monetary
  FROM orders GROUP BY 1
),
ref AS (SELECT max(o_orderdate) AS d FROM orders),
coded AS (
  SELECT o_custkey,
         ntile(4) OVER (ORDER BY date_diff('day', last_order::DATE, d::DATE),
                        o_custkey) AS r_q,
         ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_q,
         ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_q
  FROM per_cust CROSS JOIN ref
)
SELECT r_q, f_q, m_q, count(*)::BIGINT AS n_customers
FROM coded GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""

ORACLES["part_affinity_lift"] = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT count(DISTINCT l_orderkey)::DOUBLE AS n_orders FROM op),
part_n AS (SELECT l_partkey, count(*)::BIGINT AS n_part FROM op GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*)::BIGINT AS n_ab
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
scored AS (
  SELECT pa, pb, n_ab, na.n_part AS n_a, nb.n_part AS n_b,
         round((n_ab::DOUBLE * n_orders)
               / (na.n_part::DOUBLE * nb.n_part::DOUBLE), 6) AS lift
  FROM pairs
  JOIN part_n na ON pairs.pa = na.l_partkey
  JOIN part_n nb ON pairs.pb = nb.l_partkey
  CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY n_ab DESC, lift DESC, pa, pb) AS rank
  FROM scored
)
SELECT pa, pb, n_ab, n_a, n_b, lift, rank FROM ranked
WHERE rank <= 20 ORDER BY rank
"""


# ---------------------------------------------------------------------------
# Batch 38

def maxsim_sql(k: int = 10) -> str:
    """Late-interaction twin: the SAME generated arithmetic expression
    (shared pinned query matrix + op tree), DuckDB 1-based subscripts."""
    from lucene_mapreduce_spark.operators.similarity import maxsim_expr

    expr = maxsim_expr(lambda j: f"embedding[{j + 1}]::DOUBLE")
    return f"""
WITH scored AS (
  SELECT vec_id, round({expr}, 6) AS maxsim FROM embeddings
)
SELECT vec_id, maxsim, rank FROM (
  SELECT *, row_number() OVER (ORDER BY maxsim DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= {k} ORDER BY rank
"""


ORACLES["levenshtein_near_dup_pairs"] = """
WITH d AS (SELECT doc_id, text, substr(text, 1, 32) AS pfx FROM documents),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.text AS ta, b.text AS tb,
         row_number() OVER (PARTITION BY a.pfx
                            ORDER BY a.doc_id, b.doc_id) AS pair_rank
  FROM d a JOIN d b ON a.pfx = b.pfx AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, levenshtein(ta, tb)::BIGINT AS edit_dist
FROM pairs
WHERE pair_rank <= 64 AND levenshtein(ta, tb) <= 16
ORDER BY doc_a, doc_b
"""

SPAN_CORRUPTION_SQL = f"""
WITH t AS (SELECT doc_id, {{toks}} AS toks FROM documents),
pos AS (SELECT doc_id, unnest(range(len(toks))) AS pos FROM t),
m AS (
  SELECT doc_id, pos,
         (({_MD5_52.format(e="'sc:' || doc_id::VARCHAR || ':' || pos::VARCHAR")})
          % 1000 < 150) AS m
  FROM pos
),
r AS (
  SELECT doc_id, m,
         (m AND NOT coalesce(
            lag(m) OVER (PARTITION BY doc_id ORDER BY pos), FALSE)
         ) AS span_start
  FROM m
)
SELECT count(*)::BIGINT AS total_tokens,
       sum(CASE WHEN m THEN 1 ELSE 0 END)::BIGINT AS masked_tokens,
       sum(CASE WHEN span_start THEN 1 ELSE 0 END)::BIGINT AS n_spans,
       round(sum(CASE WHEN m THEN 1 ELSE 0 END)::DOUBLE
             / count(*)::DOUBLE, 6) AS mask_rate,
       round(sum(CASE WHEN m THEN 1 ELSE 0 END)::DOUBLE
             / sum(CASE WHEN span_start THEN 1 ELSE 0 END)::DOUBLE, 6)
         AS avg_span_len
FROM r
"""

ORACLES["term_drift_halves"] = f"""
WITH halves AS (
  SELECT doc_id, doc_id % 2 = 0 AS is_a, {{toks}} AS toks FROM documents
),
n AS (
  SELECT sum(CASE WHEN is_a THEN 1 ELSE 0 END)::BIGINT AS n_a,
         sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END)::BIGINT AS n_b
  FROM halves
),
df AS (
  SELECT term,
         sum(CASE WHEN is_a THEN 1 ELSE 0 END)::BIGINT AS df_a,
         sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END)::BIGINT AS df_b
  FROM (SELECT DISTINCT doc_id, is_a, unnest(toks) AS term FROM halves)
  GROUP BY 1
  HAVING sum(CASE WHEN is_a THEN 1 ELSE 0 END)
       + sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) >= 20
),
scored AS (
  SELECT term, df_a, df_b,
         round(abs(ln((df_a + 1)::DOUBLE / (n_a + 1)::DOUBLE)
                 - ln((df_b + 1)::DOUBLE / (n_b + 1)::DOUBLE)), 6) AS drift
  FROM df CROSS JOIN n
)
SELECT term, df_a, df_b, drift, rank FROM (
  SELECT *, row_number() OVER (ORDER BY drift DESC, term) AS rank FROM scored
) WHERE rank <= 20 ORDER BY rank
"""

_CUSUM_FOLD = (
    "list_reduce([0.0::DOUBLE] || ns[1:i], "
    "(acc, x) -> greatest(0.0, acc + ((x - mean) / std - 0.5)))"
)

CUSUM_ALERTS_SQL = f"""
WITH {_DAILY_HIST},
packed AS (
  SELECT list(day::VARCHAR ORDER BY day) AS ds,
         list(n_events::DOUBLE ORDER BY day) AS ns,
         list(n_events ORDER BY day) AS raw
  FROM hist
),
st AS (
  SELECT ds, ns, raw, len(ns)::DOUBLE AS nd,
         list_reduce(ns, (a, x) -> a + x) AS s1,
         list_reduce(list_transform(ns, x -> x * x), (a, x) -> a + x) AS s2
  FROM packed
),
st2 AS (
  SELECT ds, ns, raw, s1 / nd AS mean,
         sqrt(s2 / nd - (s1 / nd) * (s1 / nd)) AS std
  FROM st
),
idx AS (
  SELECT ds, ns, raw, mean, std, unnest(range(1, len(ds) + 1)) AS i FROM st2
)
SELECT ds[i] AS day, raw[i]::BIGINT AS n_events,
       round({_CUSUM_FOLD}, 6) AS cusum,
       (CASE WHEN {_CUSUM_FOLD} > 4.0 THEN 1 ELSE 0 END)::INT AS alert
FROM idx ORDER BY day
"""

ORACLES["affinity_triangles"] = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
deg AS (
  SELECT node, count(*)::BIGINT AS d
  FROM (SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
  GROUP BY 1
),
w AS (SELECT sum(d * (d - 1) / 2)::BIGINT AS n_wedges,
             count(*)::BIGINT AS n_parts FROM deg),
t AS (
  SELECT count(*)::BIGINT AS n_triangles
  FROM e e1 JOIN e e2 ON e1.pb = e2.pa
            JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
),
ne AS (SELECT count(*)::BIGINT AS n_edges FROM e)
SELECT n_parts, n_edges, n_wedges, n_triangles,
       round(3.0 * n_triangles::DOUBLE / n_wedges::DOUBLE, 6)
         AS global_clustering
FROM w, ne, t
"""


# ---------------------------------------------------------------------------
# Batch 39

def geo_polygon_sql(k: int = 20) -> str:
    """Polygon-containment twin: the SAME generated ray-casting predicate
    (shared pinned vertices and op tree) over the derived coordinates."""
    from lucene_mapreduce_spark.operators.textstats import polygon_contains_expr

    pred = polygon_contains_expr("lon", "lat")
    return f"""
WITH pts AS ({_GEO_COORDS}),
hits AS (
  SELECT doc_id, round(lat, 4) AS lat, round(lon, 4) AS lon
  FROM pts WHERE {pred}
)
SELECT doc_id, lat, lon, rank FROM (
  SELECT *, row_number() OVER (ORDER BY doc_id) AS rank FROM hits
) WHERE rank <= {k} ORDER BY rank
"""


ORACLES["hard_negative_mining"] = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
q AS (
  SELECT vec_id AS query_id, label AS qlabel, v AS qv
  FROM e WHERE vec_id % 251 = 0
),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_dot_product(e.v, q.qv)
               / (sqrt(list_dot_product(e.v, e.v))
                  * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
  FROM e CROSS JOIN q
  WHERE e.label <> q.qlabel AND e.vec_id <> q.query_id
)
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= 5 ORDER BY query_id, rank
"""

ORACLES["centroid_outlier_vecs"] = """
WITH comp AS (
  SELECT label, unnest(range(len(embedding))) AS dim, embedding
  FROM embeddings
),
vals AS (
  SELECT label, dim,
         round(embedding[dim + 1]::DOUBLE, 6)::DECIMAL(18,6) AS v
  FROM comp
),
per AS (
  SELECT label, dim, count(*)::BIGINT AS n, sum(v) AS s
  FROM vals GROUP BY 1, 2
),
m AS (SELECT label, dim, s::DOUBLE / n AS m FROM per),
cent AS (SELECT label, list(m ORDER BY dim) AS cvec FROM m GROUP BY 1),
d AS (
  SELECT e.vec_id, e.label,
         round(sqrt(list_reduce(list_prepend(0.0,
           list_transform(range(len(e.embedding)),
             i -> (e.embedding[i + 1]::DOUBLE - cvec[i + 1])
                * (e.embedding[i + 1]::DOUBLE - cvec[i + 1]))),
           (a, b) -> a + b)), 6) AS dist
  FROM embeddings e JOIN cent USING (label)
)
SELECT vec_id, label, dist, rank FROM (
  SELECT *, row_number() OVER (ORDER BY dist DESC, vec_id) AS rank FROM d
) WHERE rank <= 20 ORDER BY rank
"""

OOV_RATE_SQL = """
WITH toks AS (SELECT doc_id, source, unnest({toks}) AS term FROM documents),
df AS (
  SELECT term, count(*)::BIGINT AS df
  FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY 1
),
vocab AS (
  SELECT term FROM (
    SELECT term, row_number() OVER (ORDER BY df DESC, term) AS r FROM df
  ) WHERE r <= 512
),
tot AS (SELECT source, count(*)::BIGINT AS total_tokens FROM toks GROUP BY 1),
oo AS (
  SELECT source, count(*)::BIGINT AS oov_tokens
  FROM toks WHERE term NOT IN (SELECT term FROM vocab) GROUP BY 1
)
SELECT t.source, total_tokens,
       coalesce(oov_tokens, 0)::BIGINT AS oov_tokens,
       round(coalesce(oov_tokens, 0)::DOUBLE / total_tokens::DOUBLE, 6)
         AS oov_rate
FROM tot t LEFT JOIN oo USING (source) ORDER BY source
"""

ORACLES["stickiness_ratio"] = """
WITH du AS (
  SELECT DISTINCT strftime(ts, '%Y-%m') AS month,
                  strftime(ts, '%Y-%m-%d') AS day, user_id
  FROM events
),
dau AS (SELECT month, day, count(*)::BIGINT AS dau FROM du GROUP BY 1, 2),
pm AS (
  SELECT month, sum(dau)::BIGINT AS dau_sum, count(*)::BIGINT AS n_days
  FROM dau GROUP BY 1
),
mau AS (
  SELECT month, count(*)::BIGINT AS mau
  FROM (SELECT DISTINCT month, user_id FROM du) GROUP BY 1
)
SELECT month, mau, n_days, dau_sum,
       round((dau_sum::DOUBLE / n_days::DOUBLE) / mau::DOUBLE, 6)
         AS stickiness
FROM pm JOIN mau USING (month) ORDER BY month
"""


def percolate_range_sql(queries) -> str:
    """Range-percolator twin: each stored query re-derived as a full-scan
    arm (terms containment + n_chars range) over the tokenized corpus."""
    from lucene_mapreduce_spark.functions.tokenize import tokenize_string

    arms = []
    for qid, qtext, lo, hi in queries:
        terms = sorted(set(tokenize_string(qtext)))
        conds = " AND ".join(f"list_contains(toks, '{t}')" for t in terms)
        arms.append(
            f"SELECT '{qid}' AS query_id, doc_id FROM t "
            f"WHERE n_chars >= {lo} AND n_chars < {hi} AND {conds}"
        )
    body = "\nUNION ALL\n".join(arms)
    return (
        "WITH t AS (SELECT doc_id, n_chars, {toks} AS toks FROM documents)\n"
        + body
        + "\nORDER BY query_id, doc_id"
    )


# ---------------------------------------------------------------------------
# Batch 40

def sig_terms_bg_sql(
    query_text: str, bg_lang: str, k: int = 15, min_df: int = 3
) -> str:
    """significant_terms-with-background_filter twin: the whole
    significance computation is scoped to the background slice (one
    language); foreground = hits within that slice."""
    from lucene_mapreduce_spark.functions.tokenize import tokenize_string

    qts = sorted(set(tokenize_string(query_text)))
    qlits = ", ".join(f"'{t}'" for t in qts)
    lift = "round((f.df_fg / nfg.n) / (b.df_bg / nbg.n), 6)"
    return f"""
WITH bgdocs AS (SELECT doc_id, text FROM documents WHERE lang = '{bg_lang}'),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM bgdocs
),
qt AS (SELECT unnest([{qlits}]) AS term),
hits AS (SELECT DISTINCT doc_id FROM toks JOIN qt USING (term)),
nfg AS (SELECT count(*)::DOUBLE AS n FROM hits),
nbg AS (SELECT count(*)::DOUBLE AS n FROM bgdocs),
fg AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df_fg
  FROM toks JOIN hits USING (doc_id) GROUP BY 1
),
bg AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df_bg FROM toks GROUP BY 1
)
SELECT term, df_fg, df_bg, lift, rank
FROM (
  SELECT f.term, f.df_fg, b.df_bg, {lift} AS lift,
         row_number() OVER (ORDER BY {lift} DESC, f.term ASC) AS rank
  FROM fg f JOIN bg b USING (term)
  CROSS JOIN nfg CROSS JOIN nbg
  WHERE f.df_fg >= {min_df} AND f.term NOT IN ({qlits})
)
WHERE rank <= {k}
"""


ORACLES["supplier_hhi_by_nation"] = """
WITH rev AS (
  SELECT l_suppkey,
         round(l_extendedprice * (1 - l_discount), 4)::DECIMAL(28,4) AS rev
  FROM lineitem
),
per_supp AS (
  SELECT s_nationkey, s_suppkey, sum(rev) AS srev
  FROM rev JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1, 2
),
per_nation AS (
  SELECT s_nationkey, sum(srev) AS nrev, count(*)::BIGINT AS n_suppliers
  FROM per_supp GROUP BY 1
),
hhi AS (
  SELECT p.s_nationkey, n.n_suppliers, n.nrev,
         round(sum(round((p.srev::DOUBLE / n.nrev::DOUBLE)
                       * (p.srev::DOUBLE / n.nrev::DOUBLE), 12)
                   ::DECIMAL(28,12))::DOUBLE, 6) AS hhi
  FROM per_supp p JOIN per_nation n USING (s_nationkey)
  GROUP BY 1, 2, 3
)
SELECT n_name, n_suppliers, round(nrev::DOUBLE, 4) AS revenue, hhi
FROM hhi JOIN nation ON s_nationkey = n_nationkey
ORDER BY n_name
"""


def equidepth_sql(bins: int = 8) -> str:
    ps = ", ".join(str(i / bins) for i in range(1, bins))
    return f"""
WITH edges AS (
  SELECT quantile_cont(o_totalprice, [{ps}]) AS e FROM orders
),
binned AS (
  SELECT len(list_filter(e, x -> o_totalprice > x)) AS bin, e
  FROM orders CROSS JOIN edges
)
SELECT bin::INT AS bin, count(*)::BIGINT AS n_orders,
       CASE WHEN bin > 0 THEN round(any_value(e)[bin], 6) END AS lo_edge
FROM binned GROUP BY bin ORDER BY bin
"""


def semdedup_sweep_sql(thresholds) -> str:
    # the blocking+verify base is _near_dup_sql's pair set at its default
    # 0.35 cutoff, which must be <= the sweep minimum for the counts to
    # be complete
    assert min(thresholds) >= 0.35
    vals = ", ".join(f"({float(t)!r})" for t in sorted(thresholds))
    return f"""
WITH base AS ({_near_dup_sql()}),
th(threshold) AS (VALUES {vals}),
counts AS (
  SELECT threshold, count(*)::BIGINT AS n_pairs
  FROM base JOIN th ON base.cosine >= th.threshold
  GROUP BY 1
)
SELECT th.threshold, coalesce(counts.n_pairs, 0)::BIGINT AS n_pairs
FROM th LEFT JOIN counts USING (threshold)
ORDER BY threshold
"""


# ---------------------------------------------------------------------------
# Batch 41

def rank_feature_log_sql(
    query_text: str, pivot: float, weight: float, k: int = 10
) -> str:
    """rank_feature `log` twin: BM25 + weight * ln(1 + x/pivot)."""
    return _feature_fused_sql(
        query_text,
        f"{weight!r} * ln(1 + d.n_chars::DOUBLE / {pivot!r})",
        k,
    )


def rank_feature_sigmoid_sql(
    query_text: str, pivot: float, weight: float, k: int = 10
) -> str:
    """rank_feature `sigmoid` twin at exponent 2 (plain products — pow()
    is not correctly rounded cross-engine)."""
    x2 = "(d.n_chars::DOUBLE * d.n_chars::DOUBLE)"
    return _feature_fused_sql(
        query_text,
        f"{weight!r} * {x2} / ({x2} + {pivot!r} * {pivot!r})",
        k,
    )


VOCAB_COVERAGE_SQL_TMPL = """
WITH counts AS (
  SELECT term, count(*)::BIGINT AS n
  FROM (SELECT unnest({toks}) AS term FROM documents) GROUP BY 1
),
tot AS (SELECT sum(n)::BIGINT AS total FROM counts),
ranked AS (
  SELECT sum(n) OVER (ORDER BY n DESC, term
                      ROWS UNBOUNDED PRECEDING) AS cum,
         row_number() OVER (ORDER BY n DESC, term) AS r
  FROM counts
)
{arms}
ORDER BY pct
"""


def vocab_coverage_sql(pcts) -> str:
    arms = "\nUNION ALL\n".join(
        f"(SELECT {float(p)!r} AS pct, r::BIGINT AS k_terms,"
        f" cum::BIGINT AS tokens_covered, total"
        f" FROM ranked CROSS JOIN tot"
        f" WHERE cum * 100 >= total * {int(round(p * 100))}"
        f" ORDER BY r LIMIT 1)"
        for p in pcts
    )
    return VOCAB_COVERAGE_SQL_TMPL.replace("{arms}", arms)


FRONTCODING_SQL = """
WITH terms AS (SELECT DISTINCT unnest({toks}) AS term FROM documents),
pairs AS (SELECT term, lag(term) OVER (ORDER BY term) AS prev FROM terms),
per AS (
  SELECT length(term)::BIGINT AS term_len,
         (CASE WHEN prev IS NULL THEN 0 ELSE
            len(list_filter(range(1, least(length(term), length(prev)) + 1),
                i -> substr(term, 1, i) = substr(prev, 1, i))) END)::BIGINT
           AS lcp
  FROM pairs
)
SELECT count(*)::BIGINT AS n_terms, sum(term_len)::BIGINT AS raw_bytes,
       sum(lcp)::BIGINT AS saved_bytes,
       round(sum(lcp)::DOUBLE / sum(term_len)::DOUBLE, 6) AS savings_ratio
FROM per
"""

ORACLES["peak_concurrent_sessions"] = """
WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
x AS (
  SELECT user_id, us, event_id,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w >= 3600000000 THEN 1 ELSE 0 END AS brk
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT user_id, us,
         sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM x
),
sess AS (
  SELECT user_id, sid, min(us) AS s_us, max(us) AS e_us FROM s GROUP BY 1, 2
),
b AS (
  SELECT s_us AS t, 1 AS delta FROM sess
  UNION ALL
  SELECT e_us AS t, -1 AS delta FROM sess
),
r AS (
  SELECT t, sum(delta) OVER (ORDER BY t, delta
                             ROWS UNBOUNDED PRECEDING) AS conc
  FROM b
),
p AS (SELECT max(conc)::BIGINT AS peak FROM r),
fa AS (SELECT min(t)::BIGINT AS peak_at_us FROM r, p WHERE conc = peak),
n AS (SELECT count(*)::BIGINT AS n_sessions FROM sess)
SELECT n_sessions, peak AS peak_concurrent, peak_at_us FROM n, p, fa
"""


# ---------------------------------------------------------------------------
# Batch 42

def qdp_sql(queries) -> str:
    """Query-difficulty-predictor twin: df/cf from one corpus explode,
    idf/SCQ folds in ascending term order."""
    from lucene_mapreduce_spark.functions.tokenize import tokenize_string

    reg_rows = ", ".join(
        f"('{qid}', '{t}')"
        for qid, qtext in queries
        for t in sorted(set(tokenize_string(qtext)))
    )
    union_terms = ", ".join(
        f"'{t}'"
        for t in sorted({t for _, q in queries for t in tokenize_string(q)})
    )
    return f"""
WITH toks AS (SELECT doc_id, unnest({{toks}}) AS term FROM documents),
nd AS (SELECT count(*)::DOUBLE AS n FROM documents),
reg(query_id, term) AS (VALUES {reg_rows}),
stats AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df,
         count(*)::DOUBLE AS cf
  FROM toks WHERE term IN ({union_terms}) GROUP BY 1
),
per AS (
  SELECT query_id, r.term,
         ln(1 + (nd.n - df + 0.5) / (df + 0.5)) AS idf,
         (1.0 + ln(cf)) * ln(1 + (nd.n - df + 0.5) / (df + 0.5)) AS scq_t
  FROM reg r JOIN stats USING (term) CROSS JOIN nd
)
SELECT query_id, count(*)::BIGINT AS n_terms,
       round(list_reduce([0.0::DOUBLE] || list(idf ORDER BY term),
                         (a, b) -> a + b) / count(*), 6) AS avg_idf,
       round(max(idf), 6) AS max_idf,
       round(list_reduce([0.0::DOUBLE] || list(scq_t ORDER BY term),
                         (a, b) -> a + b), 6) AS scq
FROM per GROUP BY 1 ORDER BY 1
"""


def shingle_profile_sql(ws) -> str:
    arms = "\nUNION ALL\n".join(
        f"""(SELECT {w}::INT AS w, count(*)::BIGINT AS total_shingles,
        count(DISTINCT sh)::BIGINT AS distinct_shingles,
        round(count(DISTINCT sh)::DOUBLE / count(*)::DOUBLE, 6) AS uniqueness
 FROM (SELECT unnest(list_transform(range(1, len(toks) - {w} + 2),
              i -> array_to_string(toks[i:i + {w} - 1], ' '))) AS sh
       FROM t WHERE len(toks) >= {w}))"""
        for w in ws
    )
    return (
        "WITH t AS (SELECT {toks} AS toks FROM documents)\n"
        + arms
        + "\nORDER BY w"
    )


SAX_SQL = f"""
WITH {_DAILY_HIST},
packed AS (SELECT list(n_events::DOUBLE ORDER BY day) AS ns FROM hist),
st AS (
  SELECT ns, len(ns)::DOUBLE AS nd,
         list_reduce(ns, (a, x) -> a + x) AS s1,
         list_reduce(list_transform(ns, x -> x * x), (a, x) -> a + x) AS s2
  FROM packed
),
st2 AS (
  SELECT ns, s1 / nd AS mean, sqrt(s2 / nd - (s1 / nd) * (s1 / nd)) AS std
  FROM st
),
idx AS (SELECT ns, mean, std, unnest(range(len(ns))) AS pos FROM st2),
z AS (
  SELECT (pos // 5)::BIGINT AS window_id, pos,
         (ns[pos + 1] - mean) / std AS z
  FROM idx
),
paa AS (
  SELECT window_id, count(*)::BIGINT AS n_days,
         list_reduce([0.0::DOUBLE] || list(z ORDER BY pos),
                     (a, b) -> a + b) / count(*) AS paa_raw
  FROM z GROUP BY 1
)
SELECT window_id, n_days, round(paa_raw, 6) AS paa,
       CASE WHEN paa_raw < -0.6745 THEN 'a'
            WHEN paa_raw < 0.0 THEN 'b'
            WHEN paa_raw < 0.6745 THEN 'c' ELSE 'd' END AS symbol
FROM paa ORDER BY window_id
"""

_PR_EDGES = """
op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
edges AS (SELECT pa AS src, pb AS dst FROM e
          UNION ALL SELECT pb AS src, pa AS dst FROM e),
deg AS (SELECT src, count(*)::BIGINT AS deg FROM edges GROUP BY 1),
nn AS (SELECT count(*)::DOUBLE AS n FROM deg)
"""


def _pr_iter(prev: str, cur: str) -> str:
    return f"""{cur} AS (
  SELECT dst AS src,
         (1.0 - 0.85) / (SELECT n FROM nn)
           + sum(round(0.85 * r / deg::DOUBLE, 12)::DECIMAL(28,12))::DOUBLE
           AS r
  FROM edges JOIN {prev} USING (src) JOIN deg USING (src)
  GROUP BY dst
)"""


PAGERANK_SQL = f"""
WITH {_PR_EDGES},
r0 AS (SELECT src, 1.0 / n AS r FROM deg CROSS JOIN nn),
{_pr_iter("r0", "r1")},
{_pr_iter("r1", "r2")},
{_pr_iter("r2", "r3")}
SELECT part, pagerank, rank FROM (
  SELECT src AS part, round(r, 6) AS pagerank,
         row_number() OVER (ORDER BY round(r, 6) DESC, src ASC) AS rank
  FROM r3
) WHERE rank <= 20 ORDER BY rank
"""


# ---------------------------------------------------------------------------
# Batch 43

ORACLES["event_type_user_jaccard"] = """
WITH ev AS (SELECT DISTINCT event_type, user_id FROM events),
inter AS (
  SELECT a.event_type AS ta, b.event_type AS tb, count(*)::BIGINT AS n_inter
  FROM ev a JOIN ev b ON a.user_id = b.user_id
                     AND a.event_type < b.event_type
  GROUP BY 1, 2
),
per AS (SELECT event_type, count(*)::BIGINT AS n FROM ev GROUP BY 1)
SELECT ta, tb, na.n AS n_a, nb.n AS n_b, n_inter,
       round(n_inter::DOUBLE / (na.n + nb.n - n_inter)::DOUBLE, 6) AS jaccard
FROM inter
JOIN per na ON ta = na.event_type
JOIN per nb ON tb = nb.event_type
ORDER BY ta, tb
"""

ORACLES["weekly_churn_rate"] = """
WITH ev AS (
  SELECT DISTINCT ((epoch_us(ts) // 86400000000) // 7)::BIGINT AS m, user_id
  FROM events
),
mx AS (SELECT max(m) AS mx FROM ev),
base AS (SELECT m, user_id FROM ev, mx WHERE m < mx),
act AS (SELECT m, count(*)::BIGINT AS active FROM base GROUP BY 1),
ret AS (
  SELECT b.m, count(*)::BIGINT AS retained
  FROM base b
  WHERE EXISTS (SELECT 1 FROM ev e2
                WHERE e2.m = b.m + 1 AND e2.user_id = b.user_id)
  GROUP BY 1
)
SELECT m, active, coalesce(retained, 0)::BIGINT AS retained,
       round((active - coalesce(retained, 0))::DOUBLE / active::DOUBLE, 6)
         AS churn_rate
FROM act LEFT JOIN ret USING (m) ORDER BY m
"""

ORACLES["knn_label_confusion"] = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
q AS (
  SELECT vec_id AS query_id, label AS qlabel, v AS qv
  FROM e WHERE vec_id % 97 = 0
),
scored AS (
  SELECT q.query_id, q.qlabel, e.label AS nn_label, e.vec_id,
         round(list_dot_product(e.v, q.qv)
               / (sqrt(list_dot_product(e.v, e.v))
                  * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id
),
nn AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT qlabel AS label, nn_label, count(*)::BIGINT AS n
FROM nn GROUP BY 1, 2 ORDER BY 1, 2
"""


def sig_terms_gnd_sql(query_text: str, k: int = 15, min_df: int = 3) -> str:
    """gnd-scored significant_terms twin: smaller distance = more
    significant, rank ascends on the rounded score."""
    from lucene_mapreduce_spark.functions.tokenize import tokenize_string

    qts = sorted(set(tokenize_string(query_text)))
    qlits = ", ".join(f"'{t}'" for t in qts)
    gnd = (
        "round((greatest(ln(nfg.n), ln(b.df_bg::DOUBLE)) - ln(f.df_fg::DOUBLE))"
        " / (ln(nbg.n) - least(ln(nfg.n), ln(b.df_bg::DOUBLE))), 6)"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
qt AS (SELECT unnest([{qlits}]) AS term),
hits AS (SELECT DISTINCT doc_id FROM toks JOIN qt USING (term)),
nfg AS (SELECT count(*)::DOUBLE AS n FROM hits),
nbg AS (SELECT count(*)::DOUBLE AS n FROM documents),
fg AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df_fg
  FROM toks JOIN hits USING (doc_id) GROUP BY 1
),
bg AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df_bg FROM toks GROUP BY 1
)
SELECT term, df_fg, df_bg, gnd, rank
FROM (
  SELECT f.term, f.df_fg, b.df_bg, {gnd} AS gnd,
         row_number() OVER (ORDER BY {gnd} ASC, f.term ASC) AS rank
  FROM fg f JOIN bg b USING (term)
  CROSS JOIN nfg CROSS JOIN nbg
  WHERE f.df_fg >= {min_df} AND f.term NOT IN ({qlits})
)
WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# Batch 44: warehouse pack 2 (operators/relational.py) — the remaining
# TPC-H shapes expressible over the available columns. Same determinism
# rules as batch 37: round-then-DECIMAL sums, exact 4dp revenue products.

ORACLES["shipping_priority_topk"] = """
WITH agg AS (
  SELECT o_orderkey, o_orderdate,
         sum(round(l_extendedprice * (1 - l_discount), 4)::DECIMAL(28,4))
           AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderdate < TIMESTAMP '1998-06-01'
    AND l_shipdate > TIMESTAMP '1998-06-01'
    AND o_custkey IN (SELECT c_custkey FROM customer
                      WHERE c_mktsegment = 'BUILDING')
  GROUP BY 1, 2
),
ranked AS (
  SELECT o_orderkey,
         strftime(o_orderdate, '%Y-%m-%d') AS order_day,
         round(revenue::DOUBLE, 4) AS revenue,
         row_number() OVER (ORDER BY revenue DESC, o_orderkey) AS rank
  FROM agg
)
SELECT * FROM ranked WHERE rank <= 10 ORDER BY rank
"""

ORACLES["forecast_revenue_delta"] = """
SELECT round((sum(round(l_extendedprice * l_discount, 4)::DECIMAL(28,4)))
             ::DOUBLE, 4) AS revenue_delta,
       count(*)::BIGINT AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""

ORACLES["volume_shipping_by_nation"] = """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       year(l_shipdate)::INT AS ship_year,
       round((sum(round(l_extendedprice * (1 - l_discount), 4)
                  ::DECIMAL(28,4)))::DOUBLE, 4) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ns.n_name IN ('NATION_2', 'NATION_7')
  AND nc.n_name IN ('NATION_2', 'NATION_7')
  AND ns.n_name <> nc.n_name
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""

ORACLES["market_share_by_year"] = """
WITH j AS (
  SELECT year(o_orderdate)::INT AS order_year, ns.n_name AS supp_nation,
         round(l_extendedprice * (1 - l_discount), 4)::DECIMAL(28,4) AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'STANDARD')
    AND o_custkey IN (SELECT c_custkey FROM customer
                      WHERE c_nationkey IN
                        (SELECT n_nationkey FROM nation
                         JOIN region ON n_regionkey = r_regionkey
                         WHERE r_name = 'ASIA'))
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
),
agg AS (
  SELECT order_year,
         sum(CASE WHEN supp_nation = 'NATION_2' THEN rev
                  ELSE 0::DECIMAL(28,4) END) AS nation_rev,
         sum(rev) AS total_rev
  FROM j GROUP BY 1
)
SELECT order_year,
       round(nation_rev::DOUBLE, 4) AS nation_rev,
       round(total_rev::DOUBLE, 4) AS total_rev,
       round(nation_rev::DOUBLE / total_rev::DOUBLE, 6) AS mkt_share
FROM agg ORDER BY order_year
"""

ORACLES["customer_order_histogram"] = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                   AND o_orderpriority <> '1-URGENT'
  GROUP BY 1
)
SELECT c_count, count(*)::BIGINT AS custdist
FROM per_cust GROUP BY 1
ORDER BY custdist DESC, c_count DESC
"""

ORACLES["promo_revenue_share"] = """
WITH j AS (
  SELECT p_type,
         round(l_extendedprice * (1 - l_discount), 4)::DECIMAL(28,4) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-03-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
),
agg AS (
  SELECT sum(CASE WHEN p_type = 'PROMO' THEN rev
                  ELSE 0::DECIMAL(28,4) END) AS promo_rev,
         sum(rev) AS total_rev
  FROM j
)
SELECT round(promo_rev::DOUBLE, 4) AS promo_rev,
       round(total_rev::DOUBLE, 4) AS total_rev,
       round(100.0 * promo_rev::DOUBLE / total_rev::DOUBLE, 6) AS promo_pct
FROM agg
"""

ORACLES["small_qty_order_revenue"] = """
WITH brand_li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_brand = 'Brand#11')
),
avg_qty AS (
  SELECT l_partkey AS pk,
         sum(l_quantity::BIGINT)::DOUBLE / count(*)::DOUBLE AS avg_qty
  FROM brand_li GROUP BY 1
)
SELECT round((sum(round(l_extendedprice, 2)::DECIMAL(28,2)))::DOUBLE / 7.0, 4)
         AS avg_yearly,
       count(*)::BIGINT AS n_lines
FROM brand_li JOIN avg_qty ON l_partkey = pk
WHERE l_quantity < 0.2 * avg_qty
"""

ORACLES["disjunctive_filter_revenue"] = """
SELECT round((sum(round(l_extendedprice * (1 - l_discount), 4)
              ::DECIMAL(28,4)))::DOUBLE, 4) AS revenue,
       count(*)::BIGINT AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
       AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20
       AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30
       AND p_size BETWEEN 1 AND 15)
"""

ORACLES["dormant_customer_balance"] = """
WITH segs AS (
  SELECT * FROM customer
  WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD', 'MACHINERY')
),
avg_bal AS (
  SELECT (sum(round(c_acctbal, 2)::DECIMAL(28,2)))::DOUBLE
         / count(*)::DOUBLE AS avg_bal
  FROM segs WHERE c_acctbal > 0.0
)
SELECT c_mktsegment, count(*)::BIGINT AS n_custs,
       round((sum(round(c_acctbal, 2)::DECIMAL(28,2)))::DOUBLE, 2)
         AS total_bal
FROM segs, avg_bal
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Batch 45: rank-statistics pack (operators/parity.py + relational.py).
# Statistics assemble from exact integers (2x tie-averaged ranks, pair
# counts); the closed-form float chain is written in the same op order as
# the Spark side.

ORACLES["mann_whitney_u"] = """
WITH per AS (
  SELECT event_type, value, count(*)::BIGINT AS c
  FROM events WHERE event_type IN ('purchase', 'click')
  GROUP BY 1, 2
),
pooled AS (
  SELECT value AS v,
         coalesce(sum(CASE WHEN event_type = 'purchase' THEN c END), 0)
           ::BIGINT AS ta,
         coalesce(sum(CASE WHEN event_type = 'click' THEN c END), 0)
           ::BIGINT AS tb
  FROM per GROUP BY 1
),
ranked AS (
  SELECT ta, tb, ta + tb AS t,
         2 * (sum(ta + tb) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - (ta + tb)) + (ta + tb) + 1 AS r2
  FROM pooled
),
agg AS (
  SELECT sum(ta)::BIGINT AS n_a, sum(tb)::BIGINT AS n_b,
         sum(ta * r2)::BIGINT AS ra2,
         sum(t * t * t - t)::BIGINT AS tie3
  FROM ranked
)
SELECT n_a, n_b,
       round(ra2::DOUBLE / 2.0 - n_a::DOUBLE * (n_a::DOUBLE + 1.0) / 2.0, 2)
         AS u_a,
       round(((ra2::DOUBLE / 2.0 - n_a::DOUBLE * (n_a::DOUBLE + 1.0) / 2.0)
              - n_a::DOUBLE * n_b::DOUBLE / 2.0)
             / sqrt(n_a::DOUBLE * n_b::DOUBLE / 12.0
                    * (((n_a::DOUBLE + n_b::DOUBLE) + 1.0)
                       - tie3::DOUBLE
                         / ((n_a::DOUBLE + n_b::DOUBLE)
                            * ((n_a::DOUBLE + n_b::DOUBLE) - 1.0)))), 6)
         AS z
FROM agg
"""

ORACLES["spearman_rho_daily"] = """
WITH daily AS (
  SELECT date_trunc('day', ts)::TIMESTAMP AS day,
         count(*)::BIGINT AS cnt,
         sum(round(value, 2)::DECIMAL(28,2)) AS rev
  FROM events GROUP BY 1
),
ranked AS (
  SELECT (2 * rank() OVER (ORDER BY cnt)
          + count(*) OVER (PARTITION BY cnt) - 1)::BIGINT AS rx2,
         (2 * rank() OVER (ORDER BY rev)
          + count(*) OVER (PARTITION BY rev) - 1)::BIGINT AS ry2
  FROM daily
),
agg AS (
  SELECT count(*)::BIGINT AS n,
         sum(rx2)::BIGINT AS sx, sum(ry2)::BIGINT AS sy,
         sum(rx2 * rx2)::BIGINT AS sxx, sum(ry2 * ry2)::BIGINT AS syy,
         sum(rx2 * ry2)::BIGINT AS sxy
  FROM ranked
)
SELECT n,
       round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                    * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 6)
         AS spearman_rho
FROM agg
"""

ORACLES["kendall_tau_daily"] = """
WITH daily AS (
  SELECT date_trunc('day', ts)::TIMESTAMP AS day,
         count(*)::BIGINT AS cnt,
         sum(round(value, 2)::DECIMAL(28,2)) AS rev
  FROM events GROUP BY 1
),
pairs AS (
  SELECT CASE WHEN l.cnt > r.cnt THEN 1 WHEN l.cnt < r.cnt THEN -1
              ELSE 0 END AS dx,
         CASE WHEN l.rev > r.rev THEN 1 WHEN l.rev < r.rev THEN -1
              ELSE 0 END AS dy
  FROM daily l JOIN daily r ON l.day < r.day
),
agg AS (
  SELECT count(*)::BIGINT AS n0,
         sum(CASE WHEN dx * dy = 1 THEN 1 ELSE 0 END)::BIGINT AS conc,
         sum(CASE WHEN dx * dy = -1 THEN 1 ELSE 0 END)::BIGINT AS disc,
         sum(CASE WHEN dx = 0 THEN 1 ELSE 0 END)::BIGINT AS tie_x,
         sum(CASE WHEN dy = 0 THEN 1 ELSE 0 END)::BIGINT AS tie_y
  FROM pairs
)
SELECT n0, conc, disc, tie_x, tie_y,
       round((conc::DOUBLE - disc::DOUBLE)
             / sqrt((n0::DOUBLE - tie_x::DOUBLE)
                    * (n0::DOUBLE - tie_y::DOUBLE)), 6) AS kendall_tau_b
FROM agg
"""

_BENFORD_CASE = """CASE digit
  WHEN 1 THEN 0.3010299956639812
  WHEN 2 THEN 0.17609125905568124
  WHEN 3 THEN 0.12493873660829992
  WHEN 4 THEN 0.09691001300805642
  WHEN 5 THEN 0.07918124604762482
  WHEN 6 THEN 0.06694678963061322
  WHEN 7 THEN 0.05799194697768673
  WHEN 8 THEN 0.05115252244738129
  WHEN 9 THEN 0.04575749056067514 END"""

ORACLES["benford_first_digit"] = f"""
WITH counts AS (
  SELECT substr(floor(o_totalprice)::BIGINT::VARCHAR, 1, 1)::INT AS digit,
         count(*)::BIGINT AS observed
  FROM orders WHERE o_totalprice >= 1.0
  GROUP BY 1
),
tot AS (SELECT sum(observed)::BIGINT AS n FROM counts),
cells AS (
  SELECT digit, observed,
         round(n::DOUBLE * ({_BENFORD_CASE}), 6) AS expected,
         round((observed::DOUBLE - n::DOUBLE * ({_BENFORD_CASE}))
               * (observed::DOUBLE - n::DOUBLE * ({_BENFORD_CASE}))
               / (n::DOUBLE * ({_BENFORD_CASE})), 6) AS contrib,
         round((observed::DOUBLE - n::DOUBLE * ({_BENFORD_CASE}))
               * (observed::DOUBLE - n::DOUBLE * ({_BENFORD_CASE}))
               / (n::DOUBLE * ({_BENFORD_CASE})), 12)::DECIMAL(28,12) AS c12
  FROM counts, tot
),
chi AS (SELECT round(sum(c12)::DOUBLE, 6) AS chi2 FROM cells)
SELECT digit, observed, expected, contrib, chi2
FROM cells, chi ORDER BY digit
"""

ORACLES["histogram_quantile_audit"] = """
WITH stats AS (
  SELECT min(o_totalprice) AS vmin, max(o_totalprice) AS vmax,
         count(*)::BIGINT AS n,
         quantile_cont(o_totalprice, [0.5, 0.9, 0.99]) AS exact_qs
  FROM orders
),
binned AS (
  SELECT least(floor((o_totalprice - vmin)
               / ((vmax - vmin) / 20.0))::INT, 19) AS bin,
         count(*)::BIGINT AS c
  FROM orders, stats
  GROUP BY 1
),
cum AS (
  SELECT bin, c,
         sum(c) OVER (ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
           AS cum_before,
         sum(c) OVER (ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM binned
),
qs AS (SELECT * FROM (VALUES (0, 0.5), (1, 0.9), (2, 0.99)) AS t(qi, q)),
hit AS (
  SELECT q, bin,
         vmin + bin::DOUBLE * ((vmax - vmin) / 20.0)
              + ((vmax - vmin) / 20.0)
                * (q * n::DOUBLE - cum_before::DOUBLE) / c::DOUBLE AS approx,
         exact_qs[qi + 1] AS exact
  FROM cum, qs, stats
  WHERE cum_before::DOUBLE < q * n::DOUBLE
    AND q * n::DOUBLE <= cum::DOUBLE
)
SELECT q, bin, round(approx, 6) AS approx_q, round(exact, 6) AS exact_q,
       round(abs(approx - exact), 6) AS abs_err
FROM hit ORDER BY q
"""


# ---------------------------------------------------------------------------
# Batch 46: scale-pattern pack + remaining significant_terms heuristics.

ORACLES["point_in_interval_join"] = """
WITH e AS (
  SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS us FROM events
),
x AS (
  SELECT user_id, us, event_id,
         CASE WHEN lag(us) OVER (PARTITION BY user_id
                                 ORDER BY us, event_id) IS NULL
                OR us - lag(us) OVER (PARTITION BY user_id
                                      ORDER BY us, event_id)
                   >= 3600::BIGINT * 1000000
              THEN 1 ELSE 0 END AS brk
  FROM e WHERE event_type IN ('view', 'click')
),
y AS (
  SELECT user_id, us,
         sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM x
),
intervals AS (
  SELECT user_id, min(us) AS lo, max(us) AS hi FROM y GROUP BY user_id, sid
),
pts AS (
  SELECT user_id AS p_user, event_id, us,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
  FROM e WHERE event_type = 'purchase'
),
matched AS (
  SELECT DISTINCT p.event_id
  FROM pts p JOIN intervals i
    ON p.p_user = i.user_id AND p.us >= i.lo AND p.us <= i.hi
)
SELECT day, count(*)::BIGINT AS n_purchases,
       sum(CASE WHEN m.event_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_in_session,
       round(sum(CASE WHEN m.event_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
             / count(*)::DOUBLE, 6) AS in_session_pct
FROM pts LEFT JOIN matched m USING (event_id)
GROUP BY day ORDER BY day
"""


def decayed_counts_sql() -> str:
    """Time-decayed counts twin: the per-age weight CASE ladder is built
    from the SAME Python literal table as the Spark map (shared-literal
    rule)."""
    from lucene_mapreduce_spark.operators.parity import DECAY_W

    ladder = " ".join(
        f"WHEN {age} THEN {w!r}" for age, w in DECAY_W.items()
    )
    return f"""
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS day FROM events
),
ref AS (SELECT max(day) AS ref_day FROM d),
aged AS (
  SELECT event_type,
         CASE date_diff('day', day, ref_day) {ladder} END AS w
  FROM d, ref
)
SELECT event_type, count(*)::BIGINT AS n_events,
       round(sum(round(w, 12)::DECIMAL(28,12))::DOUBLE, 6) AS decayed_count
FROM aged GROUP BY 1 ORDER BY 1
"""


ORACLES["decayed_event_counts"] = None  # built in oracle_sql() (literals)

ORACLES["int8_ann_recall"] = """
WITH comp AS (
  SELECT vec_id, dim, embedding[dim + 1]::DOUBLE AS v
  FROM (
    SELECT vec_id, embedding, unnest(range(len(embedding))) AS dim
    FROM embeddings
  )
),
dimstats AS (
  SELECT dim, min(v) AS mn, max(v) AS mx FROM comp GROUP BY 1
),
deq AS (
  SELECT c.vec_id, c.dim, c.v,
         CASE WHEN d.mx = d.mn THEN d.mn
              ELSE d.mn + round((c.v - d.mn) / ((d.mx - d.mn) / 255.0))
                    * ((d.mx - d.mn) / 255.0) END AS dq
  FROM comp c JOIN dimstats d USING (dim)
),
vecs AS (
  SELECT vec_id,
         list(v ORDER BY dim) AS fvec,
         list(dq ORDER BY dim) AS qvec
  FROM deq GROUP BY 1
),
probes AS (
  SELECT vec_id AS query_id, fvec AS pf, qvec AS pq
  FROM vecs WHERE vec_id < 8
),
scored AS (
  SELECT p.query_id, v.vec_id,
         round(list_dot_product(v.fvec, p.pf)
               / (sqrt(list_dot_product(v.fvec, v.fvec))
                  * sqrt(list_dot_product(p.pf, p.pf))), 6) AS cos_f,
         round(list_dot_product(v.qvec, p.pq)
               / (sqrt(list_dot_product(v.qvec, v.qvec))
                  * sqrt(list_dot_product(p.pq, p.pq))), 6) AS cos_q
  FROM vecs v, probes p WHERE v.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_f DESC, vec_id ASC) AS rank_f,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_q DESC, vec_id ASC) AS rank_q
  FROM scored
)
SELECT query_id,
       sum(CASE WHEN rank_f <= 10 AND rank_q <= 10 THEN 1 ELSE 0 END)
         ::BIGINT AS n_overlap,
       round(sum(CASE WHEN rank_f <= 10 AND rank_q <= 10 THEN 1 ELSE 0 END)
             ::DOUBLE / 10.0, 6) AS recall
FROM ranked GROUP BY 1 ORDER BY 1
"""


def _sig_cells_sql(query_text: str, min_df: int) -> str:
    """Shared CTE prefix for the significant_terms heuristic twins."""
    from lucene_mapreduce_spark.functions.tokenize import tokenize_string

    qts = sorted(set(tokenize_string(query_text)))
    qlits = ", ".join(f"'{t}'" for t in qts)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
qt AS (SELECT unnest([{qlits}]) AS term),
hits AS (SELECT DISTINCT doc_id FROM toks JOIN qt USING (term)),
nfg AS (SELECT count(*)::BIGINT AS n FROM hits),
nbg AS (SELECT count(*)::BIGINT AS n FROM documents),
fg AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df_fg
  FROM toks JOIN hits USING (doc_id) GROUP BY 1
),
bg AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df_bg FROM toks GROUP BY 1
),
cells AS (
  SELECT f.term, f.df_fg, b.df_bg, nfg.n AS n_fg, nbg.n AS n_bg
  FROM fg f JOIN bg b USING (term), nfg, nbg
  WHERE f.term NOT IN ({qlits}) AND f.df_fg >= {min_df}
    AND f.df_fg * nbg.n > b.df_bg * nfg.n
)"""


def sig_mi_sql(query_text: str, min_df: int, k: int, inv_ln2: float) -> str:
    """mutual_information heuristic twin: cells summed in the fixed
    (1,1),(1,0),(0,1),(0,0) order, zero cells contribute 0, log2 via the
    shared 1/ln2 literal."""

    def contrib(n, rowtot, coltot):
        return (
            f"CASE WHEN {n} > 0 THEN ({n} / nn) * ln(nn * {n}"
            f" / ({rowtot} * {coltot})) * {inv_ln2!r} ELSE 0.0 END"
        )

    a = "a"
    b = "(c1 - a)"
    c = "(r1 - a)"
    d = "((nn - c1) - (r1 - a))"
    mi = (
        contrib(a, "r1", "c1")
        + " + "
        + contrib(b, "(nn - r1)", "c1")
        + " + "
        + contrib(c, "r1", "(nn - c1)")
        + " + "
        + contrib(d, "(nn - r1)", "(nn - c1)")
    )
    return f"""{_sig_cells_sql(query_text, min_df)}
SELECT term, df_fg, df_bg, mi, rank FROM (
  SELECT term, df_fg, df_bg, mi,
         row_number() OVER (ORDER BY mi DESC, term ASC) AS rank
  FROM (
    SELECT term, df_fg, df_bg, round({mi}, 6) AS mi
    FROM (
      SELECT term, df_fg, df_bg,
             df_fg::DOUBLE AS a, df_bg::DOUBLE AS r1,
             n_fg::DOUBLE AS c1, n_bg::DOUBLE AS nn
      FROM cells
    )
  )
) WHERE rank <= {k}
"""


def sig_pct_sql(query_text: str, min_df: int, k: int) -> str:
    """percentage heuristic twin: df_fg / df_bg."""
    return f"""{_sig_cells_sql(query_text, min_df)}
SELECT term, df_fg, df_bg, pct, rank FROM (
  SELECT term, df_fg, df_bg,
         round(df_fg::DOUBLE / df_bg::DOUBLE, 6) AS pct,
         row_number() OVER (
           ORDER BY round(df_fg::DOUBLE / df_bg::DOUBLE, 6) DESC, term ASC
         ) AS rank
  FROM cells
) WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# Batch 47: warehouse pack 3 — Q2/Q9/Q11/Q12/Q15/Q16/Q20/Q21 shapes.

ORACLES["min_cost_supplier"] = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         min(round(l_extendedprice / l_quantity, 6)) AS cost
  FROM lineitem GROUP BY 1, 2
),
supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
parts AS (
  SELECT p_partkey, p_name FROM part
  WHERE p_type = 'STANDARD' AND p_size >= 40
),
j AS (
  SELECT c.*, p.p_partkey, p.p_name, s.s_name, s.s_acctbal, s.n_name,
         s.s_suppkey,
         min(c.cost) OVER (PARTITION BY p.p_partkey) AS min_cost
  FROM cost c
  JOIN parts p ON c.l_partkey = p.p_partkey
  JOIN supp s ON c.l_suppkey = s.s_suppkey
),
ranked AS (
  SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, p_name,
         round(cost, 6) AS unit_cost,
         row_number() OVER (ORDER BY s_acctbal DESC, n_name ASC, s_name ASC,
                            p_partkey ASC, s_suppkey ASC) AS rank
  FROM j WHERE cost = min_cost
)
SELECT rank, s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
FROM ranked WHERE rank <= 100 ORDER BY rank
"""

ORACLES["product_type_profit"] = """
SELECT n_name AS nation, year(o_orderdate)::INT AS order_year,
       round(sum(round(l_extendedprice * (1 - l_discount)
                       - 0.6 * p_retailprice * l_quantity, 6)
                 ::DECIMAL(28,6))::DOUBLE, 4) AS profit,
       count(*)::BIGINT AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2 ORDER BY 1 ASC, 2 DESC
"""

ORACLES["important_part_shares"] = """
WITH supp AS (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
),
per_part AS (
  SELECT l_partkey,
         sum(round(l_extendedprice * 100.0, 0)::BIGINT) AS value_cents
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM supp)
  GROUP BY 1
),
total AS (SELECT sum(value_cents) AS total_cents,
                 count(*)::BIGINT AS n_parts FROM per_part)
SELECT l_partkey AS p_partkey,
       round(value_cents::DOUBLE / 100.0, 2) AS value
FROM per_part, total
WHERE value_cents * n_parts > total_cents * 2
ORDER BY value DESC, p_partkey ASC
"""

ORACLES["late_lines_by_priority"] = """
SELECT l_returnflag,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY 1 ORDER BY 1
"""

ORACLES["top_supplier_revenue"] = """
WITH rev AS (
  SELECT l_suppkey,
         sum(round(l_extendedprice * (1 - l_discount), 4)::DECIMAL(28,4))
           AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY 1
),
best AS (
  SELECT l_suppkey, total_rev, max(total_rev) OVER () AS max_rev FROM rev
)
SELECT s_suppkey, s_name, round(total_rev::DOUBLE, 4) AS total_revenue
FROM best JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = max_rev
ORDER BY s_suppkey
"""

ORACLES["parts_supplier_count"] = """
WITH pairs AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
  WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
)
SELECT p_brand, p_type, count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM pairs JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#4' AND p_type <> 'PROMO'
GROUP BY 1, 2
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC
"""

ORACLES["promotion_part_suppliers"] = """
WITH qual AS (
  SELECT DISTINCT l_suppkey
  FROM (
    SELECT l_partkey, l_suppkey, sum(l_quantity::BIGINT) AS qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_partkey IN (SELECT p_partkey FROM part
                        WHERE p_name LIKE 'small%')
    GROUP BY 1, 2
  ) WHERE qty > 50
)
SELECT s_suppkey, s_name, n_name AS nation
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM qual)
ORDER BY s_suppkey
"""

ORACLES["waiting_orders_suppliers"] = """
WITH per_pair AS (
  SELECT o_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS supp_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2
),
flagged AS (
  SELECT *, count(*) OVER (PARTITION BY o_orderkey) AS n_supp,
         sum(supp_late) OVER (PARTITION BY o_orderkey) AS n_late_supp
  FROM per_pair
),
counts AS (
  SELECT l_suppkey, count(*)::BIGINT AS numwait
  FROM flagged
  WHERE supp_late = 1 AND n_supp > 1 AND n_late_supp = 1
  GROUP BY 1
),
ranked AS (
  SELECT s_name, numwait,
         row_number() OVER (ORDER BY numwait DESC, s_name ASC) AS rank
  FROM counts JOIN supplier ON l_suppkey = s_suppkey
)
SELECT rank, s_name, numwait FROM ranked WHERE rank <= 20 ORDER BY rank
"""


# ---------------------------------------------------------------------------
# Batch 48: JLH sig-terms, Matryoshka/radius vector audits, parent agg,
# Gopher repetition signals, percentile length trim.


def sig_jlh_sql(query_text: str, min_df: int, k: int) -> str:
    """JLH heuristic twin: (fg% - bg%) * (fg% / bg%), the identical
    float chain as the Spark expression."""
    return f"""{_sig_cells_sql(query_text, min_df)}
SELECT term, df_fg, df_bg, jlh, rank FROM (
  SELECT term, df_fg, df_bg, jlh,
         row_number() OVER (ORDER BY jlh DESC, term ASC) AS rank
  FROM (
    SELECT term, df_fg, df_bg,
           round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6) AS jlh
    FROM (
      SELECT term, df_fg, df_bg,
             df_fg::DOUBLE / n_fg::DOUBLE AS fg_pct,
             df_bg::DOUBLE / n_bg::DOUBLE AS bg_pct
      FROM cells
    )
  )
) WHERE rank <= {k}
"""


ORACLES["matryoshka_recall"] = """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS fvec,
         (embedding::DOUBLE[])[1:32] AS tvec
  FROM embeddings
),
probes AS (
  SELECT vec_id AS query_id, fvec AS pf, tvec AS pt FROM v WHERE vec_id < 8
),
scored AS (
  SELECT p.query_id, v.vec_id,
         round(list_dot_product(v.fvec, p.pf)
               / (sqrt(list_dot_product(v.fvec, v.fvec))
                  * sqrt(list_dot_product(p.pf, p.pf))), 6) AS cos_f,
         round(list_dot_product(v.tvec, p.pt)
               / (sqrt(list_dot_product(v.tvec, v.tvec))
                  * sqrt(list_dot_product(p.pt, p.pt))), 6) AS cos_t
  FROM v, probes p WHERE v.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_f DESC, vec_id ASC) AS rank_f,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_t DESC, vec_id ASC) AS rank_t
  FROM scored
)
SELECT query_id,
       sum(CASE WHEN rank_f <= 10 AND rank_t <= 10 THEN 1 ELSE 0 END)
         ::BIGINT AS n_overlap,
       round(sum(CASE WHEN rank_f <= 10 AND rank_t <= 10 THEN 1 ELSE 0 END)
             ::DOUBLE / 10.0, 6) AS recall
FROM ranked GROUP BY 1 ORDER BY 1
"""

ORACLES["ann_radius_search"] = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS fvec FROM embeddings),
probes AS (SELECT vec_id AS query_id, fvec AS pf FROM v WHERE vec_id < 8),
scored AS (
  SELECT p.query_id, v.vec_id,
         round(list_dot_product(v.fvec, p.pf)
               / (sqrt(list_dot_product(v.fvec, v.fvec))
                  * sqrt(list_dot_product(p.pf, p.pf))), 6) AS cos
  FROM v, probes p WHERE v.vec_id <> p.query_id
),
hits AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS rn
  FROM scored WHERE cos >= 0.2
)
SELECT query_id, count(*)::BIGINT AS n_neighbors, max(cos) AS max_cos,
       max(CASE WHEN rn = 1 THEN vec_id END) AS nearest_id
FROM hits GROUP BY 1 ORDER BY 1
"""

ORACLES["parent_agg"] = """
SELECT c_mktsegment, count(*)::BIGINT AS n_child_orders,
       count(DISTINCT c_custkey)::BIGINT AS n_parents
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY 1 ORDER BY 1
"""

ORACLES["repetition_signals"] = f"""
WITH d AS (
  SELECT doc_id, source, {TOKS} AS toks FROM documents
),
eligible AS (SELECT * FROM d WHERE len(toks) >= 3),
bi AS (
  SELECT doc_id, (len(toks) - 1)::BIGINT AS n_2grams, gram
  FROM eligible,
       unnest(list_transform(range(1, len(toks)),
                             i -> toks[i] || ' ' || toks[i + 1])) AS t(gram)
),
bi_top AS (
  SELECT doc_id, any_value(n_2grams) AS n_2grams, max(cnt)::BIGINT AS top2_cnt
  FROM (SELECT doc_id, n_2grams, gram, count(*) AS cnt
        FROM bi GROUP BY 1, 2, 3)
  GROUP BY 1
),
tri AS (
  SELECT doc_id, (len(toks) - 2)::BIGINT AS n_3grams, gram
  FROM eligible,
       unnest(list_transform(range(1, len(toks) - 1),
              i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
         AS t(gram)
),
tri_top AS (
  SELECT doc_id, any_value(n_3grams) AS n_3grams, max(cnt)::BIGINT AS top3_cnt
  FROM (SELECT doc_id, n_3grams, gram, count(*) AS cnt
        FROM tri GROUP BY 1, 2, 3)
  GROUP BY 1
),
j AS (
  SELECT e.source, b.n_2grams, b.top2_cnt, t.n_3grams, t.top3_cnt
  FROM eligible e
  JOIN bi_top b USING (doc_id)
  JOIN tri_top t USING (doc_id)
)
SELECT source, count(*)::BIGINT AS n_docs,
       round(sum(round(top2_cnt::DOUBLE / n_2grams::DOUBLE, 6)
                 ::DECIMAL(28,6))::DOUBLE / count(*)::DOUBLE, 6)
         AS mean_top2_frac,
       round(sum(round(top3_cnt::DOUBLE / n_3grams::DOUBLE, 6)
                 ::DECIMAL(28,6))::DOUBLE / count(*)::DOUBLE, 6)
         AS mean_top3_frac,
       sum(CASE WHEN top2_cnt * 100 > n_2grams * 20 THEN 1 ELSE 0 END)
         ::BIGINT AS n_flag_top2,
       sum(CASE WHEN top3_cnt * 100 > n_3grams * 18 THEN 1 ELSE 0 END)
         ::BIGINT AS n_flag_top3
FROM j GROUP BY 1 ORDER BY 1
"""

ORACLES["length_trim_report"] = """
WITH bands AS (
  SELECT lang, quantile_cont(n_chars::DOUBLE, 0.05) AS lo,
         quantile_cont(n_chars::DOUBLE, 0.95) AS hi
  FROM documents GROUP BY 1
)
SELECT d.lang, count(*)::BIGINT AS n_docs,
       round(any_value(lo), 6) AS p5_chars,
       round(any_value(hi), 6) AS p95_chars,
       sum(CASE WHEN d.n_chars::DOUBLE >= lo AND d.n_chars::DOUBLE <= hi
                THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       (count(*) - sum(CASE WHEN d.n_chars::DOUBLE >= lo
                            AND d.n_chars::DOUBLE <= hi
                       THEN 1 ELSE 0 END))::BIGINT AS n_trimmed
FROM documents d JOIN bands USING (lang)
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Batch 49: cross_fields, span position range, negated percolation, quality
# operating curve, tokenizer fertility, dimension covariance audit.


def cross_fields_sql(query_text: str, k: int) -> str:
    """multi_match cross_fields twin: blended df = max(df_text, df_kw)
    feeds one idf; per-term score = idf * best field saturation (keyword
    saturation collapses to 1); plain-sum agg (<=4 query terms, the
    _BM25_AGG precedent), rank on rounded score."""
    from lucene_mapreduce_spark.functions.tokenize import tokenize_string

    qts = sorted(set(tokenize_string(query_text)))
    qlits = ", ".join(f"'{t}'" for t in qts)
    return f"""
WITH {_qterms_cte(query_text)}
doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf
  FROM toks JOIN qterms USING (term) GROUP BY 1, 2
),
df_text AS (SELECT term, count(*)::BIGINT AS dft FROM postings GROUP BY 1),
df_kw AS (
  SELECT source AS term, count(*)::BIGINT AS dfk FROM documents
  WHERE source IN ({qlits}) GROUP BY 1
),
dfb AS (
  SELECT coalesce(t.term, kk.term) AS term,
         greatest(coalesce(t.dft, 0), coalesce(kk.dfk, 0))::DOUBLE AS df_b
  FROM df_text t FULL OUTER JOIN df_kw kk ON t.term = kk.term
),
tleg AS (
  SELECT p.term, p.doc_id,
         (p.tf * {K1 + 1.0})
           / (p.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl)) AS sat_text
  FROM postings p JOIN doclens l USING (doc_id) CROSS JOIN stats s
),
kleg AS (
  SELECT d.source AS term, d.doc_id, 1.0 AS kw_hit FROM documents d
  WHERE d.source IN ({qlits})
),
m AS (
  SELECT coalesce(t.term, kk.term) AS term,
         coalesce(t.doc_id, kk.doc_id) AS doc_id,
         greatest(coalesce(t.sat_text, 0.0), coalesce(kk.kw_hit, 0.0))
           AS sat_best
  FROM tleg t FULL OUTER JOIN kleg kk
    ON t.term = kk.term AND t.doc_id = kk.doc_id
),
contribs AS (
  SELECT m.doc_id,
         ln(1.0 + (s.n_docs - b.df_b + 0.5) / (b.df_b + 0.5)) * m.sat_best
           AS contrib
  FROM m JOIN dfb b USING (term) CROSS JOIN stats s
),
agg AS (
  SELECT doc_id, round(sum(contrib), 6) AS score FROM contribs GROUP BY 1
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM agg
) WHERE rank <= {k}
"""


def span_position_range_sql(term: str, lo: int, hi: int) -> str:
    """SpanPositionRangeQuery twin: 0-based token positions recomputed
    from the corpus; count of occurrences with lo <= p < hi."""
    return f"""
SELECT doc_id, n_in_range FROM (
  SELECT doc_id,
         len(list_filter(range(len(toks)),
             i -> toks[i + 1] = '{term}' AND i >= {lo} AND i < {hi}))
           ::BIGINT AS n_in_range
  FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
) WHERE n_in_range > 0 ORDER BY doc_id
"""


def percolate_not_sql(queries) -> str:
    """Negated-percolator twin: doc token sets vs a VALUES registry of
    (query, required terms, forbidden term)."""
    from lucene_mapreduce_spark.functions.tokenize import tokenize_string

    req_rows = ", ".join(
        f"('{qid}', '{t}')"
        for qid, qtext, _n in queries
        for t in sorted(set(tokenize_string(qtext)))
    )
    neg_rows = ", ".join(f"('{qid}', '{n}')" for qid, _q, n in queries)
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest({TOKS}) AS term FROM documents
),
req(query_id, term) AS (VALUES {req_rows}),
neg(query_id, term) AS (VALUES {neg_rows}),
need AS (SELECT query_id, count(*)::BIGINT AS n_terms FROM req GROUP BY 1),
hits AS (
  SELECT r.query_id, t.doc_id
  FROM toks t JOIN req r USING (term)
  GROUP BY 1, 2
  HAVING count(DISTINCT t.term) = (SELECT n_terms FROM need
                                   WHERE need.query_id = r.query_id)
),
forbidden AS (
  SELECT n.query_id, t.doc_id FROM toks t JOIN neg n USING (term)
)
SELECT h.query_id, h.doc_id FROM hits h
ANTI JOIN forbidden f ON h.query_id = f.query_id AND h.doc_id = f.doc_id
ORDER BY 1, 2
"""


def quality_threshold_sweep_sql(thresholds) -> str:
    """Quality operating-curve twin over the shared quality chain."""
    tvals = ", ".join(f"({float(t)!r})" for t in thresholds)
    return f"""
WITH q AS ({ORACLES["quality_score"]}),
thr(threshold) AS (VALUES {tvals}),
j AS (
  SELECT thr.threshold, d.source, q.quality
  FROM q JOIN documents d USING (doc_id) CROSS JOIN thr
)
SELECT threshold, source, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN quality >= threshold THEN 1 ELSE 0 END)::BIGINT
         AS n_kept,
       round(sum(CASE WHEN quality >= threshold THEN 1 ELSE 0 END)::DOUBLE
             / count(*)::DOUBLE, 6) AS keep_rate
FROM j GROUP BY 1, 2 ORDER BY 1, 2
"""


ORACLES["tokenizer_fertility_by_lang"] = f"""
WITH d AS (
  SELECT lang, len({TOKS})::BIGINT AS ws,
         len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9 ]'))::BIGINT
           AS bpe,
         n_chars
  FROM documents
)
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(ws)::BIGINT AS total_ws_words,
       sum(bpe)::BIGINT AS total_bpe_tokens,
       round(sum(bpe)::DOUBLE / sum(ws)::DOUBLE, 6) AS fertility,
       round(sum(n_chars)::DOUBLE / sum(bpe)::DOUBLE, 6) AS chars_per_token
FROM d GROUP BY 1 ORDER BY 1
"""

ORACLES["covariance_topk_dims"] = """
WITH comp AS (
  SELECT vec_id, dim, e[dim + 1] AS v
  FROM (SELECT vec_id, embedding::DOUBLE[] AS e,
               unnest(range(len(embedding))) AS dim
        FROM embeddings)
),
pairs AS (
  SELECT a.dim AS di, b.dim AS dj, a.v AS x, b.v AS y
  FROM comp a JOIN comp b ON a.vec_id = b.vec_id AND a.dim < b.dim
),
agg AS (
  SELECT di, dj, count(*)::DOUBLE AS n,
         sum(round(x, 12)::DECIMAL(38,12)) AS sx,
         sum(round(y, 12)::DECIMAL(38,12)) AS sy,
         sum(round(x * y, 12)::DECIMAL(38,12)) AS sxy
  FROM pairs GROUP BY 1, 2
),
scored AS (
  SELECT di, dj,
         round((sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n) / n, 6) AS cov,
         round(abs((sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n) / n), 6)
           AS abs_cov
  FROM agg
)
SELECT rank, di, dj, cov, abs_cov FROM (
  SELECT *, row_number() OVER (ORDER BY abs_cov DESC, di ASC, dj ASC) AS rank
  FROM scored
) WHERE rank <= 20 ORDER BY rank
"""


# --- batch 50 ----------------------------------------------------------------


def match_bool_prefix_sql(query_text: str, prefix: str, k: int = 10) -> str:
    """match_bool_prefix twin: plain-sum BM25 over the full terms + a
    constant 1.0 when the doc holds any term with the prefix (Lucene
    CONSTANT_SCORE multi-term rewrite). Uncapped expansion — the gate
    vocabulary sits far below the engine's 1024 cap, so the sets match."""
    plit = prefix.replace("'", "''")
    return f"""
WITH {_qterms_cte(query_text)}
{_BM25_AGG},
ph AS (
  SELECT DISTINCT doc_id FROM toks WHERE term LIKE '{plit}%'
),
fused AS (
  SELECT coalesce(a.doc_id, ph.doc_id) AS doc_id,
         round(coalesce(a.score, 0.0)
               + CASE WHEN ph.doc_id IS NOT NULL THEN 1.0 ELSE 0.0 END,
               6) AS score
  FROM agg a FULL OUTER JOIN ph ON a.doc_id = ph.doc_id
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM fused
) WHERE rank <= {k}
"""


def payload_score_sql(term: str, k: int = 10) -> str:
    """PayloadScoreQuery twin: integer payload 1 + (md5_52 mod 16) summed
    over the term's 0-based token positions."""
    tlit = term.replace("'", "''")
    h = _MD5_52.format(
        e=f"'pl:{tlit}:' || doc_id::VARCHAR || ':' || i::VARCHAR"
    )
    return f"""
WITH pos AS (
  SELECT doc_id, i
  FROM (SELECT doc_id, {TOKS} AS toks FROM documents),
       unnest(range(len(toks))) AS r(i)
  WHERE toks[i + 1] = '{tlit}'
),
scored AS (
  SELECT doc_id,
         sum(({h}) % 16 + 1)::BIGINT AS payload_score,
         count(*)::BIGINT AS n_positions
  FROM pos GROUP BY 1
)
SELECT doc_id, payload_score, n_positions, rank FROM (
  SELECT *, row_number() OVER (ORDER BY payload_score DESC, doc_id ASC)
         AS rank
  FROM scored
) WHERE rank <= {k}
"""


def block_join_avg_sql(query_text: str, width: int = 8, k: int = 10) -> str:
    """ToParentBlockJoin ScoreMode.Avg twin: 6dp-rounded child scores
    DECIMAL-summed, exact total divided AS DOUBLE by the child count."""
    return f"""
WITH {_qterms_cte(query_text)}
{_BM25_AGG},
parents AS (
  SELECT (doc_id // {width})::BIGINT AS parent_id,
         round(sum(round(score, 6)::DECIMAL(18,6))::DOUBLE
               / count(*)::DOUBLE, 6) AS score,
         count(*)::BIGINT AS n_children
  FROM agg GROUP BY 1
)
SELECT parent_id, score, n_children, rank FROM (
  SELECT parent_id, score, n_children,
         row_number() OVER (ORDER BY score DESC, parent_id ASC) AS rank
  FROM parents
) WHERE rank <= {k}
"""


def err_at_k_sql(query_text: str, k: int, min_terms: int) -> str:
    """ERR@k twin: rank_eval's derived graded labels, dyadic R_i, and the
    same ascending-rank cascade fold ([init] || list prepend pattern)."""
    from lucene_mapreduce_spark.functions.tokenize import tokenize_string

    gmax = len(sorted(set(tokenize_string(query_text)))) - (min_terms - 1)
    denom = float(2**gmax)
    return f"""
WITH {_qterms_cte(query_text)}
{_BM25_AGG},
page AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
    FROM agg
  ) WHERE rank <= {k}
),
rels AS (
  SELECT d.doc_id,
         greatest(
           (SELECT count(*) FROM qterms q
            WHERE list_contains({TOKS}, q.term)) - {min_terms - 1},
           0)::BIGINT AS rel
  FROM documents d
),
pg AS (
  SELECT p.rank, coalesce(r.rel, 0)::DOUBLE AS rel
  FROM page p LEFT JOIN rels r USING (doc_id)
),
lst AS (
  SELECT list((pow(2.0, rel) - 1.0) / {denom!r} ORDER BY rank) AS rs,
         sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END)::BIGINT AS n_rel
  FROM pg
)
SELECT round(list_reduce(
         [0.0] || list_transform(range(1, len(rs) + 1),
           i -> rs[i] / i::DOUBLE
                * list_reduce([1.0] || rs[1:i-1],
                              (p, r) -> p * (1.0 - r))),
         (a, b) -> a + b), 6) AS err,
       n_rel
FROM lst
"""


def global_agg_sql(term: str) -> str:
    """ES global-bucket twin: per-scope counts/sums with the query bucket
    nested inside the global one via scope-list explosion."""
    tlit = term.replace("'", "''")
    return f"""
WITH scoped AS (
  SELECT unnest(CASE WHEN list_contains({TOKS}, '{tlit}')
                THEN ['query', 'global'] ELSE ['global'] END) AS scope,
         n_chars
  FROM documents
)
SELECT scope, count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS total_chars,
       round(sum(n_chars)::DOUBLE / count(*)::DOUBLE, 6) AS avg_chars
FROM scoped GROUP BY 1 ORDER BY 1
"""


ORACLES["binary_quantization_recall"] = """
WITH vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
),
probes AS (
  SELECT vec_id AS query_id, e AS pe FROM vecs WHERE vec_id < 8
),
scored AS (
  SELECT p.query_id, v.vec_id,
         round(list_dot_product(v.e, p.pe)
               / (sqrt(list_dot_product(v.e, v.e))
                  * sqrt(list_dot_product(p.pe, p.pe))), 6) AS cos_f,
         len(list_filter(range(len(v.e)),
             i -> (v.e[i + 1] >= 0) <> (p.pe[i + 1] >= 0)))::BIGINT
           AS hamming
  FROM vecs v, probes p WHERE v.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_f DESC, vec_id ASC) AS rank_f,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY hamming ASC, vec_id ASC) AS rank_b
  FROM scored
)
SELECT query_id,
       sum(CASE WHEN rank_f <= 10 AND rank_b <= 10 THEN 1 ELSE 0 END)
         ::BIGINT AS n_overlap,
       round(sum(CASE WHEN rank_f <= 10 AND rank_b <= 10 THEN 1 ELSE 0 END)
             ::DOUBLE / 10.0, 6) AS recall
FROM ranked GROUP BY 1 ORDER BY 1
"""


# --- batch 51 ----------------------------------------------------------------


def fuzzy_transpositions_sql(query_term: str, k: int = 10) -> str:
    """Damerau/OSA-1 fuzzy twin: levenshtein <= 1 OR the client-built
    adjacent-transposition variant set, then the expansion BM25 spec."""
    from lucene_mapreduce_spark.operators.fulltext import (
        damerau1_transpositions,
    )

    qlit = query_term.replace("'", "''")
    variants = damerau1_transpositions(query_term)
    pred = f"levenshtein(term, '{qlit}') <= 1"
    if variants:
        vlits = ", ".join(f"'{v}'" for v in variants)
        pred += f" OR term IN ({vlits})"
    return _expansion_bm25_sql(pred, k)


def conversation_block_sql(width: int = 8) -> str:
    """Transcript conversation-rollup twin over the docid-block layout."""
    return f"""
SELECT (doc_id // {width})::BIGINT AS conv_id,
       count(*)::BIGINT AS n_turns,
       sum(len({TOKS}))::BIGINT AS total_tokens,
       sum(n_chars)::BIGINT AS total_chars,
       round(sum(n_chars)::DOUBLE / count(*)::DOUBLE, 6) AS avg_turn_chars
FROM documents GROUP BY 1 ORDER BY 1
"""


def ngram_novelty_sql(k: int = 5) -> str:
    """Shingle-novelty twin: first-occurrence = min doc_id per distinct
    k-token shingle; per-doc ratios 6dp-rounded then DECIMAL-averaged."""
    return f"""
WITH t AS (SELECT doc_id, source, {TOKS} AS toks FROM documents),
sh AS (
  SELECT DISTINCT doc_id, source,
         array_to_string(toks[i:i + {k - 1}], ' ') AS shingle
  FROM (SELECT doc_id, source, toks, unnest(range(1, len(toks) - {k - 2}))
          AS i
        FROM t WHERE len(toks) >= {k})
),
first AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY 1),
per_doc AS (
  SELECT s.doc_id, s.source, count(*)::BIGINT AS n_shingles,
         sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)::BIGINT
           AS n_novel
  FROM sh s JOIN first f USING (shingle) GROUP BY 1, 2
),
rd AS (
  SELECT source, n_shingles,
         round(n_novel::DOUBLE / n_shingles::DOUBLE, 6)::DECIMAL(18,6)
           AS novelty
  FROM per_doc
)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(n_shingles)::BIGINT AS total_shingles,
       round(sum(novelty)::DOUBLE / count(*)::DOUBLE, 6) AS mean_novelty
FROM rd GROUP BY 1 ORDER BY 1
"""


ORACLES["numeric_token_profile"] = f"""
WITH d AS (
  SELECT source, {TOKS} AS toks FROM documents
),
per AS (
  SELECT source, len(toks)::BIGINT AS n_toks,
         len(list_filter(toks, t -> regexp_matches(t, '^[0-9]+$')))::BIGINT
           AS n_num
  FROM d
)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(n_toks)::BIGINT AS total_tokens,
       sum(n_num)::BIGINT AS numeric_tokens,
       round(sum(n_num)::DOUBLE / sum(n_toks)::DOUBLE, 6) AS numeric_rate,
       round(sum(CASE WHEN n_num > 0 THEN 1 ELSE 0 END)::DOUBLE
             / count(*)::DOUBLE, 6) AS frac_docs_with_digit
FROM per GROUP BY 1 ORDER BY 1
"""


def pca_top_component_sql(d: int = 64) -> str:
    """Power-iteration twin: two unrolled iterations, every reduction a
    12dp-rounded DECIMAL(38,12) sum — order-free, engine-identical."""
    w0 = repr(1.0 / d**0.5)
    return f"""
WITH comp AS (
  SELECT vec_id, dim, embedding[dim + 1]::DOUBLE AS v
  FROM (SELECT vec_id, embedding, unnest(range(len(embedding))) AS dim
        FROM embeddings)
),
nn AS (SELECT count(DISTINCT vec_id)::DOUBLE AS n FROM comp),
mu AS (
  SELECT dim,
         sum(round(v, 12)::DECIMAL(38,12))::DOUBLE / (SELECT n FROM nn)
           AS mu
  FROM comp GROUP BY 1
),
cent AS (
  SELECT c.vec_id, c.dim, c.v - m.mu AS c
  FROM comp c JOIN mu m USING (dim)
),
y1 AS (
  SELECT vec_id,
         sum(round(c * {w0}, 12)::DECIMAL(38,12))::DOUBLE AS y
  FROM cent GROUP BY 1
),
s1 AS (
  SELECT dim, sum(round(y.y * c.c, 12)::DECIMAL(38,12))::DOUBLE AS s
  FROM cent c JOIN y1 y USING (vec_id) GROUP BY 1
),
nrm1 AS (
  SELECT sqrt(sum(round(s * s, 12)::DECIMAL(38,12))::DOUBLE) AS nrm FROM s1
),
w1 AS (SELECT dim, s / (SELECT nrm FROM nrm1) AS w FROM s1),
y2 AS (
  SELECT c.vec_id,
         sum(round(c.c * w.w, 12)::DECIMAL(38,12))::DOUBLE AS y
  FROM cent c JOIN w1 w USING (dim) GROUP BY 1
),
s2 AS (
  SELECT dim, sum(round(y.y * c.c, 12)::DECIMAL(38,12))::DOUBLE AS s
  FROM cent c JOIN y2 y USING (vec_id) GROUP BY 1
),
nrm2 AS (
  SELECT sqrt(sum(round(s * s, 12)::DECIMAL(38,12))::DOUBLE) AS nrm FROM s2
)
SELECT dim::INT AS dim,
       round(s / (SELECT nrm FROM nrm2), 6) AS loading,
       round((SELECT nrm FROM nrm2) / (SELECT n FROM nn), 6) AS eigenvalue
FROM s2 ORDER BY dim
"""


def ivf_balance_sql() -> str:
    """IVF list-occupancy twin: the serving path's deterministic
    assignment (argmax cosine over the vec-1..C codebook), grouped."""
    from lucene_mapreduce_spark.operators.ivf import (
        N_CENTROIDS_MIN,
        TARGET_LIST_SIZE,
    )

    def cos(a: str, b: str) -> str:
        return (
            f"CASE WHEN list_dot_product({a}, {a}) = 0"
            f" OR list_dot_product({b}, {b}) = 0 THEN -2.0"
            f" ELSE list_dot_product({a}, {b})"
            f" / (sqrt(list_dot_product({a}, {a}))"
            f" * sqrt(list_dot_product({b}, {b}))) END"
        )

    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
nc AS (
  SELECT greatest({N_CENTROIDS_MIN}, count(*) // {TARGET_LIST_SIZE})::BIGINT
           AS c,
         count(*)::BIGINT AS total
  FROM e
),
cents AS (
  SELECT vec_id AS cid, v AS cv FROM e
  WHERE vec_id BETWEEN 1 AND (SELECT c FROM nc)
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos("e.v", "c.cv")} DESC, c.cid ASC)
             AS rn
    FROM e, cents c
  ) WHERE rn = 1
)
SELECT cid AS list_id, count(*)::BIGINT AS n_vectors,
       round(count(*)::DOUBLE / (SELECT total FROM nc)::DOUBLE, 6) AS share,
       round(count(*)::DOUBLE
             / ((SELECT total FROM nc)::DOUBLE / (SELECT c FROM nc)::DOUBLE),
             6) AS imbalance
FROM assign GROUP BY 1 ORDER BY 1
"""


# --- batch 52 ----------------------------------------------------------------


def sqs_sql(query: str, k: int = 10) -> str:
    """simple_query_string twin: the client-parsed OR-groups as ANDed
    predicates (term containment / phrase adjacency), NOT terms excluded,
    BM25 over the positive terms restricted to candidates (constant-score
    phrase legs keep score 0) — the parsed_query skeleton."""
    from lucene_mapreduce_spark.operators.fulltext import (
        parse_simple_query_string,
    )

    groups, nots = parse_simple_query_string(query)
    conds = []
    scoring: set[str] = set()
    for g in groups:
        preds = []
        for kind, v in g:
            if kind == "term":
                preds.append(f"list_contains(toks, '{v}')")
                scoring.add(v)
            else:
                adj = " AND ".join(
                    f"toks[i+{j}] = '{w}'" for j, w in enumerate(v)
                )
                preds.append(
                    f"len(list_filter(range(1, len(toks)), i -> {adj})) > 0"
                )
        conds.append("(" + " OR ".join(preds) + ")")
    conds += [f"NOT list_contains(toks, '{t}')" for t in nots]
    where = " AND ".join(conds)
    terms_lit = ", ".join(f"'{t}'" for t in sorted(scoring))
    return f"""
WITH docs AS (SELECT doc_id, {TOKS} AS toks FROM documents),
doclens AS (SELECT doc_id, len(toks) AS dl FROM docs),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
cand AS (SELECT doc_id FROM docs WHERE {where}),
toklist AS (SELECT doc_id, unnest(toks) AS term FROM docs),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toklist GROUP BY 1, 2
),
qterms AS (SELECT unnest([{terms_lit}]) AS term),
dft AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
scored AS (
  SELECT p.doc_id,
         ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * (p.tf * {K1 + 1.0}) / (p.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl))
           AS contrib
  FROM postings p
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
  JOIN cand c ON c.doc_id = p.doc_id
),
agg AS (SELECT doc_id, sum(contrib) AS score FROM scored GROUP BY 1),
ranked AS (
  SELECT c.doc_id, coalesce(a.score, 0.0) AS score
  FROM cand c LEFT JOIN agg a USING (doc_id)
)
SELECT doc_id, round(score, 6) AS score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM ranked
) WHERE rank <= {k}
"""


def mlt_unlike_sql(
    src: int, unlike: int, max_terms: int = 8, k: int = 10
) -> str:
    """more_like_this `unlike` twin: the negative exemplar's vocabulary
    is vetoed from the source doc's candidate terms before the tf*idf
    top-terms cut; the rest is the mlt_sql spec."""
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
srcterms AS (
  SELECT term, tf FROM postings WHERE doc_id = {src}
    AND term NOT IN (SELECT term FROM postings WHERE doc_id = {unlike})
),
dfc AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM postings p JOIN srcterms s USING (term) GROUP BY 1
),
qterms AS (
  SELECT term FROM (
    SELECT s.term,
           s.tf * ln(1 + (st.n_docs - d.df_t + 0.5) / (d.df_t + 0.5)) AS sc
    FROM srcterms s JOIN dfc d USING (term) CROSS JOIN stats st
  ) ORDER BY sc DESC, term ASC LIMIT {max_terms}
),
dft AS (
  SELECT d.term, d.df_t FROM dfc d JOIN qterms q USING (term)
),
scored AS (
  SELECT p.doc_id,
         ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * (p.tf * {K1 + 1.0}) / (p.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl))
           AS contrib
  FROM postings p
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
  WHERE p.doc_id <> {src}
),
agg AS (
  SELECT doc_id, sum(contrib) AS score FROM scored GROUP BY 1
)
SELECT doc_id, round(score, 6) AS score, rank
FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM agg
)
WHERE rank <= {k}
"""


def bm25plus_sql(query_text: str, delta: float, k: int = 10) -> str:
    """BM25+ twin: contrib = idf * (saturation + delta); ranks on the
    ROUNDED score (composite rule, matching the engine)."""
    return f"""
WITH {_qterms_cte(query_text)}
doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
dft AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
scored AS (
  SELECT p.doc_id,
         ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * ((p.tf * {K1 + 1.0})
              / (p.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl))
              + {delta!r}) AS contrib
  FROM postings p
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
),
agg AS (
  SELECT doc_id, round(sum(contrib), 6) AS score FROM scored GROUP BY 1
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM agg
) WHERE rank <= {k}
"""


def terms_include_exclude_sql(
    include: str, exclude: tuple, k: int = 20
) -> str:
    """terms-agg include/exclude twin: doc-frequency buckets filtered
    before the ranking cut."""
    ex = ", ".join(f"'{e}'" for e in exclude)
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest({TOKS}) AS term FROM documents
),
counts AS (
  SELECT term, count(*)::BIGINT AS doc_count FROM tok
  WHERE regexp_matches(term, '{include}') AND term NOT IN ({ex})
  GROUP BY 1
)
SELECT term, doc_count, rank FROM (
  SELECT term, doc_count,
         row_number() OVER (ORDER BY doc_count DESC, term ASC) AS rank
  FROM counts
) WHERE rank <= {k}
"""


def source_overlap_sql(max_sources: int = 100) -> str:
    """Source containment-matrix twin: distinct (shingle, source),
    skew-capped, directional intersection / |shingles(a)|."""
    return f"""
WITH {_SHINGLES},
ss AS (
  SELECT DISTINCT s.shingle, d.source
  FROM sh s JOIN documents d USING (doc_id)
),
capped AS (
  SELECT shingle, source FROM (
    SELECT *, count(*) OVER (PARTITION BY shingle) AS ns FROM ss
  ) WHERE ns <= {max_sources}
),
sizes AS (
  SELECT source, count(*)::BIGINT AS n_shingles FROM capped GROUP BY 1
),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b,
         count(*)::BIGINT AS n_shared
  FROM capped a JOIN capped b
    ON a.shingle = b.shingle AND a.source <> b.source
  GROUP BY 1, 2
)
SELECT i.source_a, i.source_b, i.n_shared,
       round(i.n_shared::DOUBLE / z.n_shingles::DOUBLE, 6) AS containment
FROM inter i JOIN sizes z ON z.source = i.source_a
ORDER BY 1, 2
"""


def lsh_band_sweep_sql(
    configs: tuple, tau: float, max_bucket: int = 100
) -> str:
    """LSH band-sweep twin: per-config banded candidates (same md5 band
    keys and caps as the production path), one shared exact-jaccard
    verification over the candidate union."""
    cfg_ctes = []
    unions = []
    for bands, rows in configs:
        cfg_ctes.append(
            f"""banded_{bands} AS (
  SELECT doc_id, (i // {rows})::INT AS band,
         md5(string_agg(i::VARCHAR || ':' || sig, '|' ORDER BY i))
           AS band_key
  FROM sigs GROUP BY doc_id, (i // {rows})::INT
),
capped_{bands} AS (
  SELECT doc_id, band, band_key FROM (
    SELECT *, count(*) OVER (PARTITION BY band, band_key) AS bn
    FROM banded_{bands}
  ) WHERE bn <= {max_bucket}
),
pairs_{bands} AS (
  SELECT DISTINCT {bands} AS bands, {rows} AS rows_per_band,
         a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM capped_{bands} a JOIN capped_{bands} b
    ON a.band = b.band AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
)"""
        )
        unions.append(f"SELECT * FROM pairs_{bands}")
    cfgs = ",\n".join(cfg_ctes)
    allsel = " UNION ALL ".join(unions)
    minaggs = ",\n         ".join(
        f"min(md5('{i}:' || shingle)) AS s{i}" for i in range(12)
    )
    sigcase = " ".join(f"WHEN i = {i} THEN s{i}" for i in range(12))
    return f"""
WITH {_SHINGLES},
-- wide-then-unpivot signatures: 12 min-aggregates over ONE pass of sh
-- (the Spark side's no-explode-blowup rule) — the sh x 12 cross join
-- form materialized 12x the shingle volume and exhausted temp disk at
-- sf1
sigsw AS (
  SELECT doc_id,
         {minaggs}
  FROM sh GROUP BY 1
),
sigs AS (
  SELECT doc_id, i::INT AS i,
         (CASE {sigcase} END) AS sig
  FROM sigsw, range(0, 12) t(i)
),
{cfgs},
allc AS ({allsel}),
uni AS (SELECT DISTINCT doc_a, doc_b FROM allc),
cdocs AS (
  SELECT DISTINCT doc_a AS doc_id FROM uni
  UNION SELECT DISTINCT doc_b FROM uni
),
-- per-candidate-doc sorted shingle LISTS, intersected per pair with
-- list_intersect: the row volume stays at |pairs|, never
-- |pairs| x |shingles| (the string-join form materialized ~50x the
-- pair count at sf1 and exhausted temp disk)
shl AS (
  SELECT s.doc_id, list(DISTINCT s.shingle) AS ls,
         count(DISTINCT s.shingle)::BIGINT AS sz
  FROM sh s SEMI JOIN cdocs USING (doc_id) GROUP BY 1
),
verd AS (
  SELECT u.doc_a, u.doc_b,
         len(list_intersect(a.ls, b.ls))::DOUBLE
           / (a.sz + b.sz - len(list_intersect(a.ls, b.ls)))::DOUBLE
           >= {tau!r} AS is_true
  FROM uni u
  JOIN shl a ON a.doc_id = u.doc_a
  JOIN shl b ON b.doc_id = u.doc_b
)
SELECT c.bands, c.rows_per_band, count(*)::BIGINT AS n_candidates,
       sum(CASE WHEN v.is_true THEN 1 ELSE 0 END)::BIGINT AS n_true,
       round(sum(CASE WHEN v.is_true THEN 1 ELSE 0 END)::DOUBLE
             / count(*)::DOUBLE, 6) AS precision
FROM allc c JOIN verd v ON v.doc_a = c.doc_a AND v.doc_b = c.doc_b
GROUP BY 1, 2 ORDER BY 1
"""


# --------------------------------------------------------------- batch 53
def multi_phrase_sql(first: str, alts: tuple) -> str:
    """MultiPhraseQuery twin: position i holds `first`, i+1 any of
    `alts` — the synonym-slot phrase."""
    inlist = ", ".join(f"'{a}'" for a in alts)
    return f"""
SELECT doc_id FROM (SELECT doc_id, {TOKS} AS toks FROM documents)
WHERE len(list_filter(range(1, len(toks)), i ->
      toks[i] = '{first}' AND toks[i + 1] IN ({inlist}))) > 0
ORDER BY doc_id
"""


def fuzzy_autocomplete_sql(prefix: str, max_edits: int, k: int = 5) -> str:
    """FuzzySuggester twin: length-|input| term prefixes within
    max_edits Levenshtein edits of the input, ranked by cf."""
    p = prefix.replace("'", "''")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
d AS (SELECT term, count(*)::BIGINT AS cf FROM toks GROUP BY 1),
c AS (
  SELECT term, levenshtein(substr(term, 1, {len(prefix)}), '{p}')::INT AS dist, cf
  FROM d
)
SELECT term, dist, cf, rank
FROM (
  SELECT term, dist, cf,
         row_number() OVER (ORDER BY cf DESC, term ASC) AS rank
  FROM c WHERE dist <= {max_edits}
)
WHERE rank <= {k}
"""


def rm3_sql(query_text: str, fb_k: int, k: int) -> str:
    """RM1/RM3 expansion-term twin: rounded-score BM25 feedback cut,
    then sum_d (tf/dl)/rank_d per non-query term — 12dp DECIMAL sums."""
    qlit = query_text.replace("'", "''")
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS})::DOUBLE AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
dfs AS (
  SELECT term, count(*)::DOUBLE AS df_t FROM postings GROUP BY 1
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
c1 AS (
  SELECT p.doc_id, p.term,
         ln(1.0 + (s.n - d.df_t + 0.5) / (d.df_t + 0.5))
         * p.tf * {K1 + 1.0!r}
         / (p.tf + {K1!r} * ({1.0 - B!r} + {B!r} * l.dl / s.avgdl)) AS contrib
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dfs d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
),
s1 AS (
  SELECT doc_id,
         round(list_reduce(list_prepend(0.0, list(contrib ORDER BY term)),
                           (a, b) -> a + b), 6) AS score
  FROM c1 GROUP BY 1
),
feedback AS (
  SELECT doc_id, rn::DOUBLE AS r FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
    FROM s1
  ) WHERE rn <= {fb_k}
),
rm AS (
  SELECT p.term,
         round(sum(round((p.tf / l.dl) / f.r, 12)::DECIMAL(28,12))::DOUBLE,
               6) AS rm_score
  FROM postings p
  JOIN feedback f USING (doc_id)
  JOIN doclens l USING (doc_id)
  WHERE p.term NOT IN (SELECT term FROM qterms)
  GROUP BY 1
)
SELECT term, rm_score, rank FROM (
  SELECT term, rm_score,
         row_number() OVER (ORDER BY rm_score DESC, term ASC) AS rank
  FROM rm
) WHERE rank <= {k}
"""


def terms_partition_sql(partition: int, num_partitions: int, k: int = 15) -> str:
    """terms-agg partition paging twin: md5-52 term hash mod
    num_partitions selects the page; doc_count buckets within it."""
    h = _MD5_52.format(e="term")
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest({TOKS}) AS term FROM documents
),
counts AS (
  SELECT term, count(*)::BIGINT AS doc_count FROM tok
  WHERE ({h}) % {num_partitions} = {partition}
  GROUP BY 1
)
SELECT term, doc_count, rank FROM (
  SELECT term, doc_count,
         row_number() OVER (ORDER BY doc_count DESC, term ASC) AS rank
  FROM counts
) WHERE rank <= {k}
"""


def bigram_llr_sql(min_pair: int, k: int) -> str:
    """Dunning G² collocation twin — the identical cell expression and
    parenthesization as the Spark side (DOUBLE casts before products)."""

    def cell(kc: str, row: str, col: str) -> str:
        return (
            f"CASE WHEN {kc} > 0 THEN ({kc})::DOUBLE * "
            f"ln((({kc})::DOUBLE * n_tot::DOUBLE) / "
            f"(({row})::DOUBLE * ({col})::DOUBLE)) ELSE 0.0 END"
        )

    t11 = cell("n_ab", "ca", "cb")
    t12 = cell("ca - n_ab", "ca", "n_tot - cb")
    t21 = cell("cb - n_ab", "n_tot - ca", "cb")
    t22 = cell("n_tot - ca - cb + n_ab", "n_tot - ca", "n_tot - cb")
    return f"""
WITH t AS (
  SELECT {TOKS} AS toks FROM documents WHERE len({TOKS}) >= 2
),
pairs AS (
  SELECT unnest(list_transform(range(1, len(toks)),
                i -> struct_pack(a := toks[i], b := toks[i + 1]))) AS p
  FROM t
),
ab AS (
  SELECT p.a AS term_a, p.b AS term_b, count(*)::BIGINT AS n_ab
  FROM pairs GROUP BY 1, 2
),
ca_t AS (SELECT term_a, sum(n_ab)::BIGINT AS ca FROM ab GROUP BY 1),
cb_t AS (SELECT term_b, sum(n_ab)::BIGINT AS cb FROM ab GROUP BY 1),
tot AS (SELECT sum(n_ab)::BIGINT AS n_tot FROM ab),
scored AS (
  SELECT term_a, term_b, n_ab,
         round(2.0 * ((({t11} + {t12}) + {t21}) + {t22}), 6) AS llr
  FROM ab JOIN ca_t USING (term_a) JOIN cb_t USING (term_b) CROSS JOIN tot
  WHERE n_ab >= {min_pair}
)
SELECT term_a, term_b, n_ab, llr, rank FROM (
  SELECT term_a, term_b, n_ab, llr,
         row_number() OVER (ORDER BY llr DESC, term_a ASC, term_b ASC) AS rank
  FROM scored
) WHERE rank <= {k}
"""


# --------------------------------------------------------------- batch 54
ORACLES["event_transition_matrix"] = """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
),
x AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY us, event_id) AS to_type
  FROM e
),
pairs AS (
  SELECT from_type, to_type, count(*)::BIGINT AS n
  FROM x WHERE to_type IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT from_type, sum(n)::BIGINT AS tot FROM pairs GROUP BY 1)
SELECT p.from_type, p.to_type, p.n,
       round(p.n::DOUBLE / t.tot::DOUBLE, 6) AS prob
FROM pairs p JOIN tot t USING (from_type)
ORDER BY p.from_type, p.to_type
"""


def top_event_paths_sql(depth: int, k: int) -> str:
    """Onboarding-path twin: first `depth` event types per user joined
    '>' under total (us, event_id) order."""
    return f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
),
x AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY us, event_id) AS rn
  FROM e
),
paths AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM x WHERE rn <= {depth} GROUP BY 1
),
counts AS (
  SELECT path, count(*)::BIGINT AS n_users FROM paths GROUP BY 1
)
SELECT path, n_users, rank FROM (
  SELECT path, n_users,
         row_number() OVER (ORDER BY n_users DESC, path ASC) AS rank
  FROM counts
) WHERE rank <= {k}
"""


def session_gap_sweep_sql(gaps: tuple) -> str:
    """Sessionization sweep twin: one lag pass, thresholds cross join."""
    glist = ", ".join(str(int(g)) for g in gaps)
    return f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
),
g AS (
  SELECT us - lag(us) OVER (PARTITION BY user_id
                            ORDER BY us, event_id) AS gap_us
  FROM e
),
th AS (SELECT unnest([{glist}])::INT AS gap_s),
j AS (
  SELECT th.gap_s,
         CASE WHEN g.gap_us IS NULL
                OR g.gap_us >= th.gap_s::BIGINT * 1000000
              THEN 1 ELSE 0 END AS brk
  FROM g CROSS JOIN th
)
SELECT gap_s, sum(brk)::BIGINT AS n_sessions,
       round(count(*)::DOUBLE / sum(brk)::DOUBLE, 6) AS events_per_session
FROM j GROUP BY 1 ORDER BY 1
"""


def attribution_last_touch_sql(conversion: str) -> str:
    """Last-touch attribution twin: running last(non-conversion type
    IGNORE NULLS) per user, credited at each conversion row."""
    return f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
),
x AS (
  SELECT event_type,
         coalesce(
           last_value(CASE WHEN event_type <> '{conversion}'
                           THEN event_type END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY us, event_id
                   ROWS UNBOUNDED PRECEDING),
           '(none)') AS channel
  FROM e
),
conv AS (
  SELECT channel, count(*)::BIGINT AS n_conversions
  FROM x WHERE event_type = '{conversion}' GROUP BY 1
),
tot AS (SELECT sum(n_conversions)::BIGINT AS tot FROM conv)
SELECT channel, n_conversions,
       round(n_conversions::DOUBLE / tot::DOUBLE, 6) AS share
FROM conv CROSS JOIN tot ORDER BY channel
"""


def mann_kendall_sql(z_crit: float) -> str:
    """Mann-Kendall twin: exact BIGINT S + tie-corrected variance
    numerator, one shared IEEE z chain."""
    return f"""
WITH daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, count(*)::BIGINT AS c
  FROM events GROUP BY 1
),
s AS (
  SELECT sum(CASE WHEN b.c > a.c THEN 1
                  WHEN b.c < a.c THEN -1 ELSE 0 END)::BIGINT AS s_stat
  FROM daily a JOIN daily b ON a.day < b.day
),
nd AS (SELECT count(*)::BIGINT AS n_days FROM daily),
ties AS (
  SELECT sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tie_num
  FROM (SELECT count(*)::BIGINT AS t FROM daily GROUP BY c)
),
j AS (
  SELECT n_days, s_stat,
         (n_days * (n_days - 1) * (2 * n_days + 5) - tie_num)::BIGINT
           AS var_num18
  FROM s CROSS JOIN nd CROSS JOIN ties
),
zc AS (
  SELECT n_days, s_stat, var_num18,
         CASE WHEN s_stat > 0 THEN
                (s_stat - 1)::DOUBLE / sqrt(var_num18::DOUBLE / 18.0)
              WHEN s_stat < 0 THEN
                (s_stat + 1)::DOUBLE / sqrt(var_num18::DOUBLE / 18.0)
              ELSE 0.0 END AS zv
  FROM j
)
SELECT n_days, s_stat, var_num18, round(zv, 6) AS z,
       CASE WHEN zv > {z_crit!r} THEN 'increasing'
            WHEN zv < -{z_crit!r} THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM zc
"""


ORACLES["ari_readability"] = f"""
WITH per AS (
  SELECT source,
         round(
           4.71 * (length(replace(text, ' ', ''))::BIGINT::DOUBLE
                   / len({TOKS})::BIGINT::DOUBLE)
           + 0.5 * (len({TOKS})::BIGINT::DOUBLE
                    / greatest(1::BIGINT,
                        (length(text)
                         - length(regexp_replace(text, '[.!?]', '', 'g')))::BIGINT
                      )::DOUBLE)
           - 21.43, 12)::DECIMAL(28,12) AS ari
  FROM documents WHERE len({TOKS}) > 0
)
SELECT source, count(*)::BIGINT AS n_docs,
       round(sum(ari)::DOUBLE / count(*)::DOUBLE, 6) AS avg_ari
FROM per GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------- batch 55
def pq_distortion_sql(m: int, subdim: int, kcode: int) -> str:
    """PQ distortion twin: the ann_pq encode chain, rolled up per
    subspace (codewords used, mean/max squared error)."""
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (
  SELECT vec_id::INT AS cid, v AS cv FROM e
  WHERE vec_id BETWEEN 1 AND {kcode}
),
ms AS (SELECT unnest(range({m}))::INT AS m),
tri AS (
  SELECT e.vec_id, ms.m, c.cid,
         round(list_reduce(
           list_prepend(0.0, list_transform(
             range(ms.m * {subdim} + 1, ms.m * {subdim} + {subdim} + 1),
             d -> (e.v[d] - c.cv[d]) * (e.v[d] - c.cv[d]))),
           (a, b) -> a + b), 6) AS d
  FROM e, cents c, ms
),
assigned AS (
  SELECT m, cid, d::DECIMAL(18,6) AS d FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                 ORDER BY d ASC, cid ASC) AS rn
    FROM tri
  ) WHERE rn = 1
)
SELECT m, count(*)::BIGINT AS n_vecs,
       count(DISTINCT cid)::BIGINT AS codewords_used,
       round(sum(d)::DOUBLE / count(*)::DOUBLE, 6) AS avg_sq_err,
       round(max(d)::DOUBLE, 6) AS max_sq_err
FROM assigned GROUP BY 1 ORDER BY 1
"""


def curriculum_buckets_sql(n_buckets: int) -> str:
    """Length-curriculum twin: ntile over (dl, doc_id), DECIMAL TTR
    means."""
    return f"""
WITH per AS (
  SELECT doc_id, len({TOKS})::BIGINT AS dl,
         len(list_distinct({TOKS}))::BIGINT AS types
  FROM documents WHERE len({TOKS}) > 0
),
b AS (
  SELECT ntile({n_buckets}) OVER (ORDER BY dl ASC, doc_id ASC) AS bucket,
         dl,
         round(types::DOUBLE / dl::DOUBLE, 12)::DECIMAL(28,12) AS ttr
  FROM per
)
SELECT bucket, count(*)::BIGINT AS n_docs,
       min(dl)::BIGINT AS min_dl, max(dl)::BIGINT AS max_dl,
       sum(dl)::BIGINT AS total_tokens,
       round(sum(ttr)::DOUBLE / count(*)::DOUBLE, 6) AS avg_ttr
FROM b GROUP BY 1 ORDER BY 1
"""


def repeat_exposure_sql(budget_mult: int) -> str:
    """Repeat-exposure plan twin: sqrt-temperature weights, floor'd
    planned tokens, epochs divide."""
    return f"""
WITH per AS (
  SELECT source, sum(len({TOKS}))::BIGINT AS n_tokens
  FROM documents GROUP BY 1
),
w AS (
  SELECT source, n_tokens,
         round(sqrt(n_tokens::DOUBLE), 6)::DECIMAL(18,6) AS w
  FROM per
),
z AS (SELECT sum(w) AS z, sum(n_tokens)::BIGINT AS tot FROM w),
x AS (
  SELECT source, n_tokens,
         round(w::DOUBLE / z::DOUBLE, 6) AS weight,
         floor(round(w::DOUBLE / z::DOUBLE, 6)
               * (tot * {budget_mult})::DOUBLE)::BIGINT AS planned_tokens
  FROM w CROSS JOIN z
)
SELECT source, n_tokens, weight, planned_tokens,
       round(planned_tokens::DOUBLE / n_tokens::DOUBLE, 6) AS epochs
FROM x ORDER BY source
"""


def split_balance_sql(test_lt: int, val_lt: int) -> str:
    """Split stratification-audit twin: md5 split buckets, unrounded
    share subtraction rounded once."""
    h = _MD5_52.format(e="doc_id::VARCHAR || ':split'")
    return f"""
WITH base AS (
  SELECT lang,
         CASE WHEN ({h}) % 100 < {test_lt} THEN 'test'
              WHEN ({h}) % 100 < {val_lt} THEN 'val'
              ELSE 'train' END AS split
  FROM documents
),
per AS (
  SELECT split, lang, count(*)::BIGINT AS n_docs FROM base GROUP BY 1, 2
),
st AS (SELECT split, sum(n_docs)::BIGINT AS n_split FROM per GROUP BY 1),
lt AS (SELECT lang, sum(n_docs)::BIGINT AS n_lang FROM per GROUP BY 1),
g AS (SELECT sum(n_docs)::BIGINT AS n_all FROM per)
SELECT p.split, p.lang, p.n_docs,
       round(p.n_docs::DOUBLE / st.n_split::DOUBLE, 6) AS split_frac,
       round(lt.n_lang::DOUBLE / g.n_all::DOUBLE, 6) AS global_frac,
       round(abs(p.n_docs::DOUBLE / st.n_split::DOUBLE
                 - lt.n_lang::DOUBLE / g.n_all::DOUBLE), 6) AS abs_dev
FROM per p JOIN st USING (split) JOIN lt USING (lang) CROSS JOIN g
ORDER BY p.split, p.lang
"""


def jsd_by_source_sql(ln2: float) -> str:
    """JSD twin: in-support 12dp DECIMAL sums + closed-form ln2·(1−Q_in)
    out-of-support mass."""
    return f"""
WITH toks AS (
  SELECT source, unnest({TOKS}) AS term FROM documents
),
per AS (
  SELECT source, term, count(*)::BIGINT AS cnt FROM toks GROUP BY 1, 2
),
tot_s AS (SELECT source, sum(cnt)::BIGINT AS tot_s FROM per GROUP BY 1),
corpus AS (SELECT term, sum(cnt)::BIGINT AS cf FROM per GROUP BY 1),
tot AS (SELECT sum(cf)::BIGINT AS tot FROM corpus),
c AS (
  SELECT p.source,
         round((p.cnt::DOUBLE / ts.tot_s::DOUBLE)
               * ln((2.0 * (p.cnt::DOUBLE / ts.tot_s::DOUBLE))
                    / ((p.cnt::DOUBLE / ts.tot_s::DOUBLE)
                       + (co.cf::DOUBLE / t.tot::DOUBLE))),
               12)::DECIMAL(28,12) AS c_p,
         round((co.cf::DOUBLE / t.tot::DOUBLE)
               * ln((2.0 * (co.cf::DOUBLE / t.tot::DOUBLE))
                    / ((p.cnt::DOUBLE / ts.tot_s::DOUBLE)
                       + (co.cf::DOUBLE / t.tot::DOUBLE))),
               12)::DECIMAL(28,12) AS c_q,
         round(co.cf::DOUBLE / t.tot::DOUBLE, 12)::DECIMAL(28,12) AS q_in
  FROM per p
  JOIN tot_s ts USING (source)
  JOIN corpus co USING (term)
  CROSS JOIN tot t
),
agg AS (
  SELECT source, count(*)::BIGINT AS n_terms,
         sum(c_p)::DOUBLE AS s_p, sum(c_q)::DOUBLE AS s_q,
         sum(q_in)::DOUBLE AS qin
  FROM c GROUP BY 1
)
SELECT source, n_terms,
       round(0.5 * s_p + 0.5 * (s_q + {ln2!r} * (1.0 - qin)), 6) AS jsd_nats
FROM agg ORDER BY source
"""


COHENS_KAPPA_SQL = f"""
WITH conf AS ({TRIGRAM_LANGID_SQL}),
n AS (SELECT sum(n_docs)::BIGINT AS n FROM conf),
diag AS (
  SELECT coalesce(sum(n_docs), 0)::BIGINT AS n_agree
  FROM conf WHERE lang = predicted
),
rws AS (SELECT lang, sum(n_docs)::BIGINT AS rn FROM conf GROUP BY 1),
cls AS (SELECT predicted, sum(n_docs)::BIGINT AS cn FROM conf GROUP BY 1),
pe AS (
  SELECT sum(rn::DECIMAL(38,0) * cn::DECIMAL(38,0))::DOUBLE AS pe_num
  FROM rws JOIN cls ON rws.lang = cls.predicted
)
SELECT n, n_agree,
       round(n_agree::DOUBLE / n::DOUBLE, 6) AS po,
       round(pe_num / (n::DOUBLE * n::DOUBLE), 6) AS pe,
       round((n_agree::DOUBLE / n::DOUBLE - pe_num / (n::DOUBLE * n::DOUBLE))
             / (1.0 - pe_num / (n::DOUBLE * n::DOUBLE)), 6) AS kappa
FROM n CROSS JOIN diag CROSS JOIN pe
"""


# --------------------------------------------------------------- batch 56
CRAMERS_V_SQL = """
WITH cells AS (
  SELECT source, lang, count(*)::BIGINT AS o FROM documents GROUP BY 1, 2
),
rows_m AS (SELECT source, sum(o)::BIGINT AS rt FROM cells GROUP BY 1),
cols_m AS (SELECT lang, sum(o)::BIGINT AS ct FROM cells GROUP BY 1),
nn AS (SELECT sum(o)::BIGINT AS n FROM cells),
contribs AS (
  SELECT c.source, c.lang,
         (c.o::DOUBLE - r.rt::DOUBLE * l.ct::DOUBLE / nn.n::DOUBLE)
         * (c.o::DOUBLE - r.rt::DOUBLE * l.ct::DOUBLE / nn.n::DOUBLE)
         / (r.rt::DOUBLE * l.ct::DOUBLE / nn.n::DOUBLE) AS c
  FROM cells c
  JOIN rows_m r USING (source)
  JOIN cols_m l USING (lang)
  CROSS JOIN nn
),
folded AS (
  SELECT list_reduce(list_prepend(0.0,
           list(c ORDER BY source, lang)), (a, b) -> a + b) AS chi2_raw
  FROM contribs
),
dims AS (
  SELECT (SELECT count(*) FROM rows_m)::BIGINT AS nr,
         (SELECT count(*) FROM cols_m)::BIGINT AS nc
)
SELECT nn.n,
       round(f.chi2_raw, 6) AS chi2,
       ((d.nr - 1) * (d.nc - 1))::BIGINT AS dof,
       round(sqrt(f.chi2_raw
                  / (nn.n::DOUBLE * (least(d.nr, d.nc) - 1)::DOUBLE)), 6)
         AS cramers_v
FROM folded f CROSS JOIN nn CROSS JOIN dims d
"""


def two_proportion_z_sql(success: str, z_crit: float) -> str:
    """Two-proportion z twin: pinned dow rule, exact cell counts, one
    shared pooled-z chain."""
    return f"""
WITH tagged AS (
  SELECT CASE WHEN ((strftime(ts, '%Y-%m-%d')::DATE - DATE '2024-01-01') % 7)
                   >= 5
              THEN 'weekend' ELSE 'weekday' END AS grp,
         CASE WHEN event_type = '{success}' THEN 1 ELSE 0 END AS s
  FROM events
),
agg AS (
  SELECT grp, count(*)::BIGINT AS n, sum(s)::BIGINT AS x
  FROM tagged GROUP BY 1
),
wide AS (
  SELECT max(CASE WHEN grp = 'weekend' THEN n END) AS n1,
         max(CASE WHEN grp = 'weekend' THEN x END) AS x1,
         max(CASE WHEN grp = 'weekday' THEN n END) AS n2,
         max(CASE WHEN grp = 'weekday' THEN x END) AS x2
  FROM agg
),
zc AS (
  SELECT n1, x1, n2, x2,
         x1::DOUBLE / n1::DOUBLE AS p1,
         x2::DOUBLE / n2::DOUBLE AS p2,
         (x1::DOUBLE + x2::DOUBLE) / (n1::DOUBLE + n2::DOUBLE) AS pp
  FROM wide
)
SELECT n1::BIGINT AS n_weekend, x1::BIGINT AS x_weekend,
       n2::BIGINT AS n_weekday, x2::BIGINT AS x_weekday,
       round(p1, 6) AS p_weekend, round(p2, 6) AS p_weekday,
       round((p1 - p2) / sqrt(pp * (1.0 - pp)
             * (1.0 / n1::DOUBLE + 1.0 / n2::DOUBLE)), 6) AS z,
       abs((p1 - p2) / sqrt(pp * (1.0 - pp)
           * (1.0 / n1::DOUBLE + 1.0 / n2::DOUBLE))) > {z_crit!r}
         AS significant
FROM zc
"""


CHI2_HOURLY_SQL = """
WITH counts AS (
  SELECT (epoch_us(ts) // 3600000000) % 24 AS hour, count(*)::BIGINT AS o
  FROM events GROUP BY 1
),
hours AS (SELECT unnest(range(24))::BIGINT AS hour),
filled AS (
  SELECT h.hour, coalesce(c.o, 0)::BIGINT AS o
  FROM hours h LEFT JOIN counts c USING (hour)
),
nn AS (SELECT sum(o)::BIGINT AS n FROM filled),
contribs AS (
  SELECT hour,
         (o::DOUBLE - nn.n::DOUBLE / 24.0)
         * (o::DOUBLE - nn.n::DOUBLE / 24.0)
         / (nn.n::DOUBLE / 24.0) AS c
  FROM filled CROSS JOIN nn
)
SELECT nn.n, 24::BIGINT AS n_cells, 23::BIGINT AS dof,
       (SELECT round(list_reduce(list_prepend(0.0, list(c ORDER BY hour)),
                                 (a, b) -> a + b), 6) FROM contribs) AS chi2
FROM nn
"""


THEIL_BY_SOURCE_SQL = f"""
WITH per AS (
  SELECT source, len({TOKS})::BIGINT AS dl FROM documents
  WHERE len({TOKS}) > 0
),
stats AS (
  SELECT source, count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS tot
  FROM per GROUP BY 1
),
c AS (
  SELECT p.source,
         round((p.dl::DOUBLE / (s.tot::DOUBLE / s.n_docs::DOUBLE))
               * ln(p.dl::DOUBLE / (s.tot::DOUBLE / s.n_docs::DOUBLE)),
               12)::DECIMAL(28,12) AS c
  FROM per p JOIN stats s USING (source)
),
agg AS (SELECT source, sum(c)::DOUBLE AS s FROM c GROUP BY 1)
SELECT a.source, st.n_docs,
       round(st.tot::DOUBLE / st.n_docs::DOUBLE, 6) AS mean_dl,
       round(a.s / st.n_docs::DOUBLE, 6) AS theil_t
FROM agg a JOIN stats st USING (source)
ORDER BY a.source
"""


ORACLES["dup_cluster_source_mix"] = f"""
WITH comp AS (SELECT * FROM ({ORACLES["near_dup_components"]}) t),
per AS (
  SELECT c.component, count(*)::BIGINT AS n_members,
         count(DISTINCT d.source)::BIGINT AS n_sources
  FROM comp c JOIN documents d USING (doc_id)
  GROUP BY 1
)
SELECT n_sources, count(*)::BIGINT AS n_clusters,
       sum(n_members)::BIGINT AS n_docs
FROM per GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------- batch 57
def ann_ivf_pq_sql(
    m: int, subdim: int, kcode: int, query_vec_id: int, nprobe: int, k: int
) -> str:
    """IVF-PQ twin: ann_ivf's cosine assign/probe CTEs feeding ann_pq's
    ADC chain, restricted to the probed candidates."""
    from lucene_mapreduce_spark.operators.ivf import (
        N_CENTROIDS_MIN,
        TARGET_LIST_SIZE,
    )

    def cos(a: str, b: str) -> str:
        return (
            f"CASE WHEN list_dot_product({a}, {a}) = 0"
            f" OR list_dot_product({b}, {b}) = 0 THEN -2.0"
            f" ELSE list_dot_product({a}, {b})"
            f" / (sqrt(list_dot_product({a}, {a}))"
            f" * sqrt(list_dot_product({b}, {b}))) END"
        )

    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
ivf_cents AS (
  SELECT vec_id AS cid, v AS cv FROM e
  WHERE vec_id BETWEEN 1 AND
    (SELECT greatest({N_CENTROIDS_MIN}, count(*) // {TARGET_LIST_SIZE}) FROM e)
),
q AS (SELECT v AS qv FROM e WHERE vec_id = {query_vec_id}),
probe AS (
  SELECT cid FROM (
    SELECT c.cid,
           row_number() OVER (ORDER BY {cos("q.qv", "c.cv")} DESC, c.cid ASC)
             AS rn
    FROM ivf_cents c, q
  ) WHERE rn <= {nprobe}
),
assign AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos("e.v", "c.cv")} DESC, c.cid ASC)
             AS rn
    FROM e, ivf_cents c
  ) WHERE rn = 1
),
cand AS (
  SELECT a.vec_id, a.v FROM assign a JOIN probe p ON a.cid = p.cid
  WHERE a.vec_id <> {query_vec_id}
),
pq_cents AS (
  SELECT vec_id::INT AS cid, v AS cv FROM e
  WHERE vec_id BETWEEN 1 AND {kcode}
),
ms AS (SELECT unnest(range({m}))::INT AS m),
tri AS (
  SELECT c.vec_id, ms.m, pc.cid,
         round(list_reduce(
           list_prepend(0.0, list_transform(
             range(ms.m * {subdim} + 1, ms.m * {subdim} + {subdim} + 1),
             d -> (c.v[d] - pc.cv[d]) * (c.v[d] - pc.cv[d]))),
           (a, b) -> a + b), 6) AS d
  FROM cand c, pq_cents pc, ms
),
codes AS (
  SELECT vec_id, m, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                 ORDER BY d ASC, cid ASC) AS rn
    FROM tri
  ) WHERE rn = 1
),
qtab AS (
  SELECT ms.m, pc.cid,
         round(list_reduce(
           list_prepend(0.0, list_transform(
             range(ms.m * {subdim} + 1, ms.m * {subdim} + {subdim} + 1),
             d -> (q.qv[d] - pc.cv[d]) * (q.qv[d] - pc.cv[d]))),
           (a, b) -> a + b), 6) AS qd
  FROM q, pq_cents pc, ms
),
adc AS (
  SELECT c.vec_id,
         round(list_reduce(list_prepend(0.0, list(t.qd ORDER BY c.m)),
                           (a, b) -> a + b), 6) AS approx_dist
  FROM codes c JOIN qtab t USING (m, cid)
  GROUP BY 1
)
SELECT vec_id, approx_dist, rank FROM (
  SELECT vec_id, approx_dist,
         row_number() OVER (ORDER BY approx_dist ASC, vec_id ASC) AS rank
  FROM adc
) WHERE rank <= {k}
"""


def poisson_bootstrap_sql(b: int, cdf: tuple) -> str:
    """Poisson-bootstrap twin: md5-uniform inverted through the pinned
    Poisson(1) CDF literals, exact BIGINT weighted sums, type-7 CI."""
    h = _MD5_52.format(e="doc_id::VARCHAR || ':boot:' || b::VARCHAR")
    return f"""
WITH per AS (
  SELECT doc_id, len({TOKS})::BIGINT AS dl FROM documents
),
reps AS (SELECT unnest(range({b}))::INT AS b),
wts AS (
  SELECT per.doc_id, per.dl, reps.b,
         (CASE WHEN ({h})::DOUBLE / 4503599627370496.0 < {cdf[0]!r} THEN 0
               WHEN ({h})::DOUBLE / 4503599627370496.0 < {cdf[1]!r} THEN 1
               WHEN ({h})::DOUBLE / 4503599627370496.0 < {cdf[2]!r} THEN 2
               WHEN ({h})::DOUBLE / 4503599627370496.0 < {cdf[3]!r} THEN 3
               WHEN ({h})::DOUBLE / 4503599627370496.0 < {cdf[4]!r} THEN 4
               ELSE 5 END)::BIGINT AS w
  FROM per CROSS JOIN reps
),
means AS (
  SELECT b, round(sum(w * dl)::DOUBLE / sum(w)::DOUBLE, 6) AS m
  FROM wts GROUP BY 1
),
stats AS (
  SELECT count(*)::BIGINT AS n_docs,
         round(sum(dl)::DOUBLE / count(*)::DOUBLE, 6) AS mean_dl
  FROM per
),
ci AS (
  SELECT count(*)::BIGINT AS b_replicas,
         round(quantile_cont(m, 0.025), 6) AS ci_lo,
         round(quantile_cont(m, 0.5), 6) AS ci_mid,
         round(quantile_cont(m, 0.975), 6) AS ci_hi
  FROM means
)
SELECT * FROM stats CROSS JOIN ci
"""


DATASET_CARD_SQL = f"""
WITH groups AS (
  SELECT md5(text) AS h, count(*)::BIGINT AS gn FROM documents GROUP BY 1
),
base AS (
  SELECT d.source, d.lang, d.n_chars, len({TOKS})::BIGINT AS dl, g.gn
  FROM documents d JOIN groups g ON md5(d.text) = g.h
)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(dl)::BIGINT AS n_tokens,
       count(DISTINCT lang)::BIGINT AS n_langs,
       sum(CASE WHEN gn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_docs,
       round(sum(CASE WHEN gn > 1 THEN 1 ELSE 0 END)::DOUBLE
             / count(*)::DOUBLE, 6) AS dup_frac,
       round(sum(n_chars)::DOUBLE / count(*)::DOUBLE, 6) AS avg_chars
FROM base GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------- batch 58
def graph_explore_sql(seed: str, h1: int, h2: int) -> str:
    """Graph-explore twin: distinct term-doc pairs, two hop CTEs with
    row_number cuts — all-integer scores, term-ascending ties."""
    s = seed.replace("'", "''")
    return f"""
WITH dt AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, unnest({TOKS}) AS term FROM documents
  )
),
seed_docs AS (SELECT doc_id FROM dt WHERE term = '{s}'),
h1c AS (
  SELECT dt.term, count(*)::BIGINT AS score
  FROM dt JOIN seed_docs USING (doc_id)
  WHERE dt.term <> '{s}' GROUP BY 1
),
hop1 AS (
  SELECT term, score, rank FROM (
    SELECT term, score,
           row_number() OVER (ORDER BY score DESC, term ASC) AS rank
    FROM h1c
  ) WHERE rank <= {h1}
),
p2 AS (
  SELECT dt.doc_id, h.term AS parent FROM dt JOIN hop1 h ON dt.term = h.term
),
h2c AS (
  SELECT p2.parent, dt.term, count(*)::BIGINT AS score
  FROM p2 JOIN dt USING (doc_id)
  WHERE dt.term <> '{s}' AND dt.term NOT IN (SELECT term FROM hop1)
  GROUP BY 1, 2
),
hop2 AS (
  SELECT parent, term, score, rank FROM (
    SELECT parent, term, score,
           row_number() OVER (PARTITION BY parent
                              ORDER BY score DESC, term ASC) AS rank
    FROM h2c
  ) WHERE rank <= {h2}
)
SELECT 1 AS depth, '{s}' AS parent, term, score, rank FROM hop1
UNION ALL
SELECT 2 AS depth, parent, term, score, rank FROM hop2
ORDER BY depth, parent, rank
"""


def ltr_feature_log_sql(query_text: str, k: int) -> str:
    """LTR feature-log twin: the plain-sum BM25 oracle (safe for the
    4-term flagship query) plus exact-integer feature aggregates; rank
    on the ROUNDED score both engines."""
    return f"""
WITH {_qterms_cte(query_text)}
{_BM25_AGG},
feats AS (
  SELECT p.doc_id,
         count(*)::BIGINT AS n_matched,
         sum(p.tf)::BIGINT AS sum_tf,
         max(p.tf)::BIGINT AS max_tf,
         min(d.df_t)::BIGINT AS min_df,
         max(l.dl)::BIGINT AS dl
  FROM postings p
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  GROUP BY 1
)
SELECT doc_id, n_matched, sum_tf, max_tf, min_df, dl, bm25, rank FROM (
  SELECT f.doc_id, f.n_matched, f.sum_tf, f.max_tf, f.min_df, f.dl,
         round(a.score, 6) AS bm25,
         row_number() OVER (ORDER BY round(a.score, 6) DESC, f.doc_id ASC)
           AS rank
  FROM feats f JOIN agg a USING (doc_id)
) WHERE rank <= {k}
"""


def code_switch_sql(stopwords: dict) -> str:
    """Code-switch twin: per-language marker counts from list_filter over
    the shared tokenizer, DECIMAL(28,12) minority-fraction sums."""
    langs = list(stopwords)
    cnt_exprs = []
    for lang in langs:
        lits = ", ".join("'" + w.replace("'", "''") + "'" for w in stopwords[lang])
        cnt_exprs.append(
            f"len(list_filter(toks, t -> list_contains([{lits}], t)))::BIGINT"
            f" AS c_{lang}"
        )
    total = " + ".join(f"c_{lang}" for lang in langs)
    maxc = "greatest(" + ", ".join(f"c_{lang}" for lang in langs) + ")"
    nlang = " + ".join(
        f"(CASE WHEN c_{lang} > 0 THEN 1 ELSE 0 END)" for lang in langs
    )
    cols = ",\n         ".join(cnt_exprs)
    return f"""
WITH t AS (SELECT source, {TOKS} AS toks FROM documents),
c AS (
  SELECT source,
         {cols}
  FROM t
),
feat AS (
  SELECT source,
         (CASE WHEN ({total}) > 0 THEN 1 ELSE 0 END) AS marked,
         (CASE WHEN ({nlang}) >= 2 THEN 1 ELSE 0 END) AS switched,
         (CASE WHEN ({total}) > 0 THEN
            round((({total}) - {maxc})::DOUBLE / ({total})::DOUBLE, 12)
              ::DECIMAL(28,12)
          END) AS minority_frac
  FROM c
)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(marked)::BIGINT AS n_marked,
       sum(switched)::BIGINT AS n_switched,
       round(sum(minority_frac)::DOUBLE / sum(marked)::DOUBLE, 6)
         AS mean_minority_frac
FROM feat GROUP BY 1 ORDER BY 1
"""


def bot_burst_sql(window_s: int, threshold: int) -> str:
    """Burst-detection twin: RANGE frame over integer epoch seconds —
    simultaneous events are frame peers in both engines."""
    return f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) // 1000000 AS es FROM events
),
b AS (
  SELECT user_id,
         count(*) OVER (PARTITION BY user_id ORDER BY es
                        RANGE BETWEEN {window_s - 1} PRECEDING
                        AND CURRENT ROW) AS burst
  FROM e
)
SELECT user_id, count(*)::BIGINT AS n_events, max(burst)::BIGINT AS max_burst,
       (CASE WHEN max(burst) >= {threshold} THEN 1 ELSE 0 END)::INT AS is_bot
FROM b GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------- batch 59
ORACLES["curation_funnel_report"] = f"""
WITH cp AS ({ORACLES["curation_pipeline"]})
SELECT d.source, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN cp.pred_lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_lang,
       sum(CASE WHEN cp.pred_lang = 'en' AND cp.quality >= 0.5
            THEN 1 ELSE 0 END)::BIGINT AS n_quality,
       sum(CASE WHEN cp.pred_lang = 'en' AND cp.quality >= 0.5
            AND cp.is_keeper THEN 1 ELSE 0 END)::BIGINT AS n_dedup,
       sum(CASE WHEN cp.kept THEN 1 ELSE 0 END)::BIGINT AS n_kept
FROM cp JOIN documents d USING (doc_id)
GROUP BY 1 ORDER BY 1
"""


def window_funnel_sql(window_s: int, steps: tuple) -> str:
    """windowFunnel twin: per-user sorted step-timestamp lists, greedy
    next-event chains via nested list_filter/list_min lambdas."""
    s0, s1, s2 = steps
    return f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) // 1000000 AS es FROM events
),
per AS (
  SELECT user_id,
    list_sort(list(es) FILTER (WHERE event_type = '{s0}')) AS ts0,
    list_sort(list(es) FILTER (WHERE event_type = '{s1}')) AS ts1,
    list_sort(list(es) FILTER (WHERE event_type = '{s2}')) AS ts2
  FROM e GROUP BY 1
),
d AS (
  SELECT user_id,
    CASE
      WHEN len(list_filter(ts0, v ->
        coalesce(list_min(list_filter(ts2, x -> x >
          list_min(list_filter(ts1, c -> c > v)))) <= v + {window_s},
          false))) > 0 THEN 3
      WHEN len(list_filter(ts0, v ->
        coalesce(list_min(list_filter(ts1, c -> c > v)) <= v + {window_s},
          false))) > 0 THEN 2
      WHEN len(ts0) > 0 THEN 1
      ELSE 0 END AS depth
  FROM per
)
SELECT depth, count(*)::BIGINT AS n_users FROM d GROUP BY 1 ORDER BY 1
"""


ORACLES["ingest_pipeline_simulate"] = f"""
WITH t AS (
  SELECT doc_id,
         {duckdb_tokens_sql("regexp_replace(lower(text), '[0-9]+', '0', 'g')")}
           AS parts
  FROM documents
)
SELECT doc_id, len(parts)::BIGINT AS n_parts,
       md5(array_to_string(parts, ' ')) AS fingerprint
FROM t ORDER BY doc_id
"""


def relaxation_ladder_sql(query_text: str) -> str:
    """Relaxation-ladder twin: df drop order computed in SQL (zero-df
    query terms kept with df 0, matching the Spark side), per-step
    containment counts."""
    qlit = query_text.replace("'", "''")
    return f"""
WITH qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
matched AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, unnest({TOKS}) AS term FROM documents
  ) JOIN qterms USING (term)
),
dft AS (
  SELECT q.term, coalesce(c.df_t, 0)::BIGINT AS df_t
  FROM qterms q LEFT JOIN (
    SELECT term, count(*)::BIGINT AS df_t FROM matched GROUP BY 1
  ) c USING (term)
),
ranked AS (
  SELECT term, row_number() OVER (ORDER BY df_t DESC, term ASC) AS dr
  FROM dft
),
nq AS (SELECT count(*)::INT AS n FROM ranked),
steps AS (SELECT unnest(range((SELECT n FROM nq)))::INT AS step),
per AS (
  SELECT s.step, m.doc_id, count(*)::INT AS hit_cnt
  FROM matched m JOIN ranked r USING (term) CROSS JOIN steps s
  WHERE r.dr > s.step
  GROUP BY 1, 2
)
SELECT s.step,
       ((SELECT n FROM nq) - s.step)::INT AS n_terms,
       (SELECT string_agg(term, ',' ORDER BY term) FROM ranked
         WHERE dr > s.step) AS terms,
       (SELECT count(*) FROM per p WHERE p.step = s.step
          AND p.hit_cnt = (SELECT n FROM nq) - s.step)::BIGINT AS n_hits
FROM steps s ORDER BY 1
"""


# --------------------------------------------------------------- batch 60
ORACLES["kaplan_meier_survival"] = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) // 1000000 AS es FROM events
),
t_end AS (SELECT max(es) AS te FROM e),
signup AS (
  SELECT user_id, min(es) AS s FROM e WHERE event_type = 'signup' GROUP BY 1
),
fp AS (
  SELECT e.user_id, min(e.es) AS p
  FROM e JOIN signup g USING (user_id)
  WHERE e.event_type = 'purchase' AND e.es > g.s
  GROUP BY 1
),
obs AS (
  SELECT (CASE WHEN f.p IS NOT NULL THEN f.p - g.s
               ELSE (SELECT te FROM t_end) - g.s END) AS t,
         (CASE WHEN f.p IS NOT NULL THEN 1 ELSE 0 END) AS event
  FROM signup g LEFT JOIN fp f USING (user_id)
),
grp AS (
  SELECT t, count(*)::BIGINT AS n_here, sum(event)::BIGINT AS d
  FROM obs GROUP BY 1
),
risk AS (
  SELECT t, d,
         (sum(n_here) OVER ()
          - coalesce(sum(n_here) OVER (ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         )::BIGINT AS n_at_risk
  FROM grp
),
ev_rows AS (SELECT t, n_at_risk, d FROM risk WHERE d > 0),
km AS (
  SELECT t, n_at_risk, d,
         sum(CASE WHEN d < n_at_risk THEN
               round(ln(1.0 - d::DOUBLE / n_at_risk::DOUBLE), 12)
                 ::DECIMAL(28,12) END)
           OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS logsum,
         max(CASE WHEN d = n_at_risk THEN 1 ELSE 0 END)
           OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS hit_zero
  FROM ev_rows
)
SELECT t, n_at_risk, d,
       (CASE WHEN hit_zero = 1 THEN 0.0
             ELSE round(exp(logsum::DOUBLE), 6) END) AS survival
FROM km ORDER BY t
"""


ORACLES["cohort_ltv_curve"] = """
WITH e AS (
  SELECT user_id, epoch_us(ts) // 604800000000 AS week,
         round(value, 2)::DECIMAL(18,2) AS rev
  FROM events
),
cohort AS (
  SELECT user_id, min(week)::BIGINT AS cohort_week FROM e GROUP BY 1
),
per AS (
  SELECT c.cohort_week, (e.week - c.cohort_week)::BIGINT AS week_offset,
         e.rev
  FROM e JOIN cohort c USING (user_id)
),
users AS (
  SELECT cohort_week, count(*)::BIGINT AS n_users FROM cohort GROUP BY 1
),
rolled AS (
  SELECT cohort_week, week_offset, sum(rev) AS rev_d
  FROM per GROUP BY 1, 2
)
SELECT r.cohort_week, r.week_offset, u.n_users,
       round(r.rev_d::DOUBLE, 2) AS revenue,
       round(sum(r.rev_d) OVER (PARTITION BY r.cohort_week
             ORDER BY r.week_offset ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW)::DOUBLE, 2) AS cum_revenue
FROM rolled r JOIN users u USING (cohort_week)
ORDER BY 1, 2
"""


def mw_synonym_sql(term: str, phrase: tuple, k: int) -> str:
    """Multi-word synonym twin: phrase-tf via adjacent-position
    list_filter, SynonymQuery blend (sum tfs, max dfs), one BM25 pass."""
    tl = term.replace("'", "''")
    w0 = phrase[0].replace("'", "''")
    w1 = phrase[1].replace("'", "''")
    return f"""
WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
per AS (
  SELECT doc_id, len(t)::BIGINT AS dl,
         len(list_filter(t, x -> x = '{tl}'))::BIGINT AS tf_t,
         (CASE WHEN len(t) >= 2 THEN
            len(list_filter(range(1, len(t)), i ->
              t[i] = '{w0}' AND t[i+1] = '{w1}'))
          ELSE 0 END)::BIGINT AS tf_p
  FROM toks
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl,
         sum(CASE WHEN tf_t > 0 THEN 1 ELSE 0 END)::DOUBLE AS df_t,
         sum(CASE WHEN tf_p > 0 THEN 1 ELSE 0 END)::DOUBLE AS df_p
  FROM per
),
scored AS (
  SELECT p.doc_id,
         round(
           ln(1 + (s.n_docs - greatest(s.df_t, s.df_p) + 0.5)
                  / (greatest(s.df_t, s.df_p) + 0.5))
           * ((p.tf_t + p.tf_p)::DOUBLE * {K1 + 1.0})
           / ((p.tf_t + p.tf_p)::DOUBLE
              + {K1} * (1 - {B} + {B} * p.dl::DOUBLE / s.avgdl)), 6)
           AS score
  FROM per p CROSS JOIN stats s
  WHERE p.tf_t > 0 OR p.tf_p > 0
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored
) WHERE rank <= {k}
"""


# --------------------------------------------------------------- batch 61
ORACLES["pareto_share_curve"] = """
WITH per_user AS (
  SELECT user_id, sum(round(value, 2)::DECIMAL(18,2)) AS urev
  FROM events GROUP BY 1
),
dec AS (
  SELECT user_id, urev,
         ntile(10) OVER (ORDER BY urev DESC, user_id ASC) AS decile
  FROM per_user
),
rolled AS (
  SELECT decile, count(*)::BIGINT AS n_users, sum(urev) AS drev
  FROM dec GROUP BY 1
),
total AS (SELECT sum(drev) AS trev FROM rolled)
SELECT r.decile, r.n_users,
       round(r.drev::DOUBLE, 2) AS revenue,
       round(r.drev::DOUBLE / t.trev::DOUBLE, 6) AS share,
       round(sum(r.drev) OVER (ORDER BY r.decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE
             / t.trev::DOUBLE, 6) AS cum_share
FROM rolled r CROSS JOIN total t
ORDER BY 1
"""


ORACLES["new_vs_returning_daily"] = """
WITH pairs AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
first AS (SELECT user_id, min(day) AS first_day FROM pairs GROUP BY 1)
SELECT p.day,
       sum(CASE WHEN p.day = f.first_day THEN 1 ELSE 0 END)::BIGINT AS n_new,
       sum(CASE WHEN p.day > f.first_day THEN 1 ELSE 0 END)::BIGINT
         AS n_returning
FROM pairs p JOIN first f USING (user_id)
GROUP BY 1 ORDER BY 1
"""


def file_sizing_sql(target: int) -> str:
    """File-sizing twin: exact integer ceiling division."""
    return f"""
WITH rolled AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         sum(n_chars)::BIGINT AS total_bytes
  FROM documents GROUP BY 1
),
planned AS (
  SELECT *, ((total_bytes + {target} - 1) // {target})::BIGINT AS n_files
  FROM rolled
)
SELECT source, n_docs, total_bytes, n_files,
       ((n_docs + n_files - 1) // n_files)::BIGINT AS rows_per_file,
       ((total_bytes + n_files - 1) // n_files)::BIGINT AS bytes_per_file
FROM planned ORDER BY source
"""


def mlm_masking_sql(rate: float, mask_tok: float, rnd: float) -> str:
    """MLM masking twin: both md5-uniform draws inverted identically."""
    um = _MD5_52.format(
        e="doc_id::VARCHAR || ':mask:' || i::VARCHAR"
    )
    ua = _MD5_52.format(e="doc_id::VARCHAR || ':act:' || i::VARCHAR")
    return f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
per AS (
  SELECT doc_id, len(toks)::BIGINT AS n_tokens,
         (CASE WHEN len(toks) >= 1 THEN
            list_filter(range(1, len(toks) + 1), i ->
              ({um})::DOUBLE / 4503599627370496.0 < {rate!r})
          ELSE []::BIGINT[] END) AS masked
  FROM t
)
SELECT doc_id, n_tokens, len(masked)::BIGINT AS n_masked,
       len(list_filter(masked, i ->
         ({ua})::DOUBLE / 4503599627370496.0 < {mask_tok!r}))::BIGINT
         AS n_mask_tok,
       len(list_filter(masked, i ->
         ({ua})::DOUBLE / 4503599627370496.0 >= {mask_tok!r}
         AND ({ua})::DOUBLE / 4503599627370496.0 < {rnd!r}))::BIGINT
         AS n_random,
       (len(masked)
        - len(list_filter(masked, i ->
            ({ua})::DOUBLE / 4503599627370496.0 < {rnd!r})))::BIGINT
         AS n_keep,
       md5(coalesce(
         array_to_string(list_transform(masked, i -> i::VARCHAR), ','), ''))
         AS witness
FROM per ORDER BY doc_id
"""


def pq_rescore_sql(
    m: int, subdim: int, kcode: int, query_vec_id: int, shortlist: int, k: int
) -> str:
    """PQ-refine twin: the ADC shortlist re-ranked by its exact-L2
    audit column."""
    return f"""
WITH pq AS ({ann_pq_sql(m, subdim, kcode, query_vec_id, shortlist)})
SELECT vec_id, exact_dist, rank FROM (
  SELECT vec_id, exact_dist,
         row_number() OVER (ORDER BY exact_dist ASC, vec_id ASC) AS rank
  FROM pq
) WHERE rank <= {k}
"""


# --------------------------------------------------------------- batch 62
def holt_winters_sql(season: int) -> str:
    """Holt-Winters twin: 9-wide flat state arrays through list_reduce
    (acc type == element type), identical halving gains."""
    width = season + 2
    zeros = ", ".join(["0.0"] * (width - 1))
    # season slots 3..width rotate left; element 3 is s_{t-m}
    keep = ", ".join(f"acc[{i}]" for i in range(4, width + 1))
    lp = "(0.5 * (x[1] - acc[3]) + 0.5 * (acc[1] + acc[2]))"
    return f"""
WITH {_DAILY_HIST},
packed AS (
  SELECT list(day::VARCHAR ORDER BY day) AS ds,
         list(n_events ORDER BY day) AS raw,
         list([n_events::DOUBLE, {zeros}] ORDER BY day) AS pairs
  FROM hist
),
idx AS (
  SELECT ds, raw, pairs, unnest(range(1, len(ds) + 1)) AS i FROM packed
),
folded AS (
  SELECT ds[i] AS day, raw[i]::BIGINT AS n_events,
         list_reduce(pairs[1:i], (acc, x) ->
           [{lp},
            0.5 * ({lp} - acc[1]) + 0.5 * acc[2],
            {keep},
            0.5 * (x[1] - {lp}) + 0.5 * acc[3]]) AS st
  FROM idx
)
SELECT day, n_events,
       round(st[1], 6) AS level, round(st[2], 6) AS trend,
       round(st[{width}], 6) AS season
FROM folded ORDER BY day
"""


ORACLES["lineitem_latency_percentiles"] = """
WITH li AS (
  SELECT l.l_orderkey,
         date_diff('day', o.o_orderdate, l.l_shipdate) AS lat
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT o.o_orderpriority, count(*)::BIGINT AS n_lines,
       round(quantile_cont(li.lat, 0.5), 6) AS p50,
       round(quantile_cont(li.lat, 0.9), 6) AS p90,
       round(quantile_cont(li.lat, 0.99), 6) AS p99
FROM li JOIN orders o ON o.o_orderkey = li.l_orderkey
GROUP BY 1 ORDER BY 1
"""


def cosine_pair_histogram_sql(mult: int) -> str:
    """Pair-histogram twin: identical mod-first partner arithmetic and
    the list_dot_product cosine (== the zip_with ascending fold)."""
    def cos(a, b):
        return (
            f"CASE WHEN list_dot_product({a}, {a}) = 0"
            f" OR list_dot_product({b}, {b}) = 0 THEN -2.0"
            f" ELSE list_dot_product({a}, {b})"
            f" / (sqrt(list_dot_product({a}, {a}))"
            f" * sqrt(list_dot_product({b}, {b}))) END"
        )

    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT count(*)::BIGINT AS n FROM e),
a AS (
  SELECT e.vec_id AS a_id, e.v AS av,
         ((e.vec_id % n.n) * ({mult} % n.n)) % n.n AS b_id
  FROM e, n
),
pairs AS (
  SELECT floor(round({cos("a.av", "b.v")}, 6) * 10.0)::INT AS bin
  FROM a JOIN e b ON b.vec_id = a.b_id
  WHERE a.a_id <> a.b_id
)
SELECT bin, count(*)::BIGINT AS n_pairs FROM pairs GROUP BY 1 ORDER BY 1
"""


ORACLES["coleman_liau_index"] = f"""
WITH per AS (
  SELECT source,
         round(
           0.0588 * (100.0 * len(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                     ::DOUBLE / len({TOKS})::DOUBLE)
           - 0.296 * (100.0 * greatest(1, len(text)
               - len(regexp_replace(text, '[.!?]', '', 'g')))::DOUBLE
               / len({TOKS})::DOUBLE)
           - 15.8, 12)::DECIMAL(28,12) AS cli
  FROM documents
  WHERE len({TOKS}) > 0
)
SELECT source, count(*)::BIGINT AS n_docs,
       round(sum(cli)::DOUBLE / count(*)::DOUBLE, 6) AS avg_cli
FROM per GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------- batch 63
def textrank_sql(
    min_support: int, iters: int, d: float, k: int
) -> str:
    """TextRank twin: canonical 'min max' adjacent pairs, support-cut
    word graph, the unrolled-PageRank DECIMAL iteration CTEs."""
    edges = f"""
toksw AS (SELECT {TOKS} AS t FROM documents),
pairs AS (
  SELECT unnest(list_transform(range(1, len(t)), i ->
    CASE WHEN t[i] <= t[i+1] THEN t[i] || ' ' || t[i+1]
         ELSE t[i+1] || ' ' || t[i] END)) AS pr
  FROM toksw WHERE len(t) >= 2
),
e AS (
  SELECT split_part(pr, ' ', 1) AS wa, split_part(pr, ' ', 2) AS wb
  FROM (SELECT pr, count(*) AS n FROM pairs GROUP BY 1
        HAVING count(*) >= {min_support})
  WHERE split_part(pr, ' ', 1) <> split_part(pr, ' ', 2)
),
edges AS (SELECT wa AS src, wb AS dst FROM e
          UNION ALL SELECT wb AS src, wa AS dst FROM e),
deg AS (SELECT src, count(*)::BIGINT AS deg FROM edges GROUP BY 1),
nn AS (SELECT count(*)::DOUBLE AS n FROM deg)"""

    def it(prev: str, cur: str) -> str:
        return f"""{cur} AS (
  SELECT dst AS src,
         (1.0 - {d}) / (SELECT n FROM nn)
           + sum(round({d} * r / deg::DOUBLE, 12)::DECIMAL(28,12))::DOUBLE
           AS r
  FROM edges JOIN {prev} USING (src) JOIN deg USING (src)
  GROUP BY dst
)"""

    chain = ",\n".join(
        it(f"r{i}", f"r{i + 1}") for i in range(iters)
    )
    return f"""
WITH {edges},
r0 AS (SELECT src, 1.0 / n AS r FROM deg CROSS JOIN nn),
{chain}
SELECT term, textrank, rank FROM (
  SELECT src AS term, round(r, 6) AS textrank,
         row_number() OVER (ORDER BY round(r, 6) DESC, src ASC) AS rank
  FROM r{iters}
) WHERE rank <= {k} ORDER BY rank
"""


def attribution_position_sql(conversion: str) -> str:
    """Position-based attribution twin: identical path join, position
    windows, and U-shaped credit CASE."""
    c = conversion.replace("'", "''")
    return f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
),
conv AS (
  SELECT user_id, event_id AS cid, us AS cus FROM ev
  WHERE event_type = '{c}'
),
touch AS (
  SELECT user_id, event_id, event_type, us FROM ev
  WHERE event_type <> '{c}'
),
path AS (
  SELECT c.user_id, c.cid, t.event_type, t.us, t.event_id
  FROM conv c JOIN touch t USING (user_id)
  WHERE t.us < c.cus OR (t.us = c.cus AND t.event_id < c.cid)
),
ranked AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY user_id, cid
                            ORDER BY us, event_id) AS pos,
         count(*) OVER (PARTITION BY user_id, cid) AS n
  FROM path
),
credited AS (
  SELECT event_type AS channel,
         round(CASE WHEN n = 1 THEN 1.0
               WHEN pos = 1 OR pos = n THEN
                 (CASE WHEN n = 2 THEN 0.5 ELSE 0.4 END)
               ELSE 0.2 / (n - 2)::DOUBLE END, 12)::DECIMAL(28,12) AS cr
  FROM ranked
)
SELECT channel, count(*)::BIGINT AS n_touches,
       round(sum(cr)::DOUBLE, 6) AS credit
FROM credited GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------- batch 64
def session_entry_conversion_sql(gap_s: int, conversion: str) -> str:
    """Entry-channel conversion twin: identical gaps-and-islands with
    the total (us, event_id) order in both window passes."""
    c = conversion.replace("'", "''")
    return f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
),
b AS (
  SELECT *, (CASE WHEN lag(us) OVER w IS NULL
                  OR us - lag(us) OVER w >= {gap_s}::BIGINT * 1000000
             THEN 1 ELSE 0 END) AS brk
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS sid
  FROM b
),
se AS (
  SELECT *, first_value(event_type) OVER (
              PARTITION BY user_id, sid ORDER BY us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS entry
  FROM s
),
sess AS (
  SELECT user_id, sid, entry,
         max(CASE WHEN event_type = '{c}' THEN 1 ELSE 0 END) AS converted
  FROM se GROUP BY 1, 2, 3
)
SELECT entry, count(*)::BIGINT AS n_sessions,
       sum(converted)::BIGINT AS n_converted,
       round(sum(converted)::DOUBLE / count(*)::DOUBLE, 6)
         AS conversion_rate
FROM sess GROUP BY 1 ORDER BY 1
"""


ORACLES["grouping_sets_agg"] = """
WITH e AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day FROM events
)
SELECT coalesce(event_type, '<all>') AS event_type,
       coalesce(day::VARCHAR, '<all>') AS day,
       grouping_id(event_type, day)::INT AS gid,
       count(*)::BIGINT AS n_events
FROM e
GROUP BY GROUPING SETS ((event_type), (day), (event_type, day))
ORDER BY gid, event_type, day
"""


ORACLES["embedding_anisotropy"] = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
nrm AS (
  SELECT vec_id, v,
         sqrt(list_reduce(list_prepend(0.0,
           list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nn
  FROM e
),
unit AS (
  SELECT d AS dim,
         round(v[d + 1] / nn, 12)::DECIMAL(28,12) AS u
  FROM nrm, unnest(range(len(v))) t(d)
  WHERE nn > 0
),
sums AS (SELECT dim, sum(u) AS s FROM unit GROUP BY 1),
n AS (SELECT count(*)::DOUBLE AS n FROM nrm WHERE nn > 0),
agg AS (
  SELECT sum(round(s::DOUBLE * s::DOUBLE, 12)::DECIMAL(38,12))::DOUBLE AS sq
  FROM sums
)
SELECT n.n::BIGINT AS n_vectors,
       round((agg.sq - n.n) / (n.n * (n.n - 1.0)), 6)
         AS mean_pairwise_cosine
FROM agg CROSS JOIN n
"""


# --------------------------------------------------------------- batch 65
ORACLES["dup_method_agreement"] = f"""
WITH a AS ({ORACLES["minhash_lsh_pairs"]}),
b0 AS ({ORACLES["simhash_near_pairs"]}),
b AS (SELECT doc_a, doc_b FROM b0),
j AS (
  SELECT coalesce(a.doc_a, b.doc_a) AS doc_a,
         coalesce(a.doc_b, b.doc_b) AS doc_b,
         (a.doc_a IS NOT NULL) AS in_a, (b.doc_a IS NOT NULL) AS in_b
  FROM a FULL OUTER JOIN b USING (doc_a, doc_b)
)
SELECT sum(CASE WHEN in_a THEN 1 ELSE 0 END)::BIGINT AS n_minhash,
       sum(CASE WHEN in_b THEN 1 ELSE 0 END)::BIGINT AS n_simhash,
       sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END)::BIGINT AS n_both,
       round(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END)::DOUBLE
             / count(*)::DOUBLE, 6) AS jaccard
FROM j
"""


ORACLES["bpe_merge_gain"] = f"""
WITH words AS (
  SELECT word, count(*)::BIGINT AS freq FROM (
    SELECT unnest({TOKS}) AS word FROM documents
  ) GROUP BY 1
),
pairs AS (
  SELECT freq, unnest(list_transform(range(1, len(word)), i ->
           substr(word, i, 2))) AS pair
  FROM words WHERE len(word) >= 2
),
top AS (
  SELECT pair FROM (
    SELECT pair, sum(freq) AS c,
           row_number() OVER (ORDER BY sum(freq) DESC, pair ASC) AS rn
    FROM pairs GROUP BY 1
  ) WHERE rn = 1
),
agg AS (
  SELECT (SELECT pair FROM top) AS pair,
         sum(w.freq * ((len(w.word) - len(replace(w.word,
             (SELECT pair FROM top), ''))) // 2))::BIGINT AS n_merges,
         sum(w.freq * len(w.word))::BIGINT AS symbols_before
  FROM words w
)
SELECT pair, n_merges, symbols_before,
       (symbols_before - n_merges)::BIGINT AS symbols_after,
       round((symbols_before - n_merges)::DOUBLE
             / symbols_before::DOUBLE, 6) AS compression
FROM agg
"""


def bm25_sweep_sql(query_text: str, combos: tuple, k: int = 10) -> str:
    """Param-sweep twin: one bm25_topk_sql CTE per (k1, b) point plus
    the default page, intersection counts per combo."""
    ctes = [f"dflt AS ({bm25_topk_sql(query_text, k=k)})"]
    sels = []
    for idx, (k1, b) in enumerate(combos):
        ctes.append(
            f"c{idx} AS ({bm25_topk_sql(query_text, k=k, k1=k1, b=b)})"
        )
        sels.append(
            f"SELECT {k1}::DOUBLE AS k1, {b}::DOUBLE AS b,"
            f" (SELECT count(*) FROM c{idx} JOIN dflt USING (doc_id))"
            f"::BIGINT AS n_common"
        )
    body = ",\n".join(ctes)
    union = "\nUNION ALL\n".join(sels)
    return f"WITH {body}\n{union}\nORDER BY k1, b"


# --------------------------------------------------------------- batch 66
def item_cosine_sql(min_support: int, k: int) -> str:
    """Item-item cosine twin over distinct (order, part) pairs."""
    return f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
co AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*)::BIGINT AS n_ab
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {min_support}
),
deg AS (SELECT l_partkey, count(*)::BIGINT AS n FROM op GROUP BY 1),
scored AS (
  SELECT co.pa, co.pb, co.n_ab,
         round(co.n_ab::DOUBLE / sqrt(da.n::DOUBLE * db.n::DOUBLE), 6)
           AS cosine
  FROM co JOIN deg da ON da.l_partkey = co.pa
          JOIN deg db ON db.l_partkey = co.pb
)
SELECT pa, pb, n_ab, cosine, rank FROM (
  SELECT *, row_number() OVER (ORDER BY cosine DESC, pa ASC, pb ASC) AS rank
  FROM scored
) WHERE rank <= {k}
"""


ORACLES["embedding_dim_quartiles"] = """
WITH e AS (
  SELECT d AS dim, v[d + 1] AS x
  FROM (SELECT embedding::DOUBLE[] AS v FROM embeddings),
       unnest(range(len(v))) t(d)
)
SELECT dim::INT AS dim, count(*)::BIGINT AS n,
       round(quantile_cont(x, 0.25), 6) AS q1,
       round(quantile_cont(x, 0.5), 6) AS median,
       round(quantile_cont(x, 0.75), 6) AS q3
FROM e GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------- batch 67
def nprobe_curve_sql(nprobes: tuple, k: int) -> str:
    """Recall-curve twin: one independent IVF derivation per nprobe
    against the shared brute page."""
    brute = ORACLES["ann_batch_topk"]
    blocks = []
    for np_ in nprobes:
        ivf = _ann_ivf_batch_sql(k=k, nprobe=np_)
        blocks.append(f"""
SELECT {np_}::INT AS nprobe,
       (SELECT count(DISTINCT query_id) FROM brute)::BIGINT AS n_queries,
       (SELECT count(*) FROM (SELECT query_id, vec_id FROM ({ivf})) i
         SEMI JOIN brute b USING (query_id, vec_id))::BIGINT AS total_hits,
       round((SELECT count(*) FROM (SELECT query_id, vec_id FROM ({ivf})) i
         SEMI JOIN brute b USING (query_id, vec_id))::DOUBLE
         / ({k} * (SELECT count(DISTINCT query_id) FROM brute))::DOUBLE, 6)
         AS recall""")
    union = "\nUNION ALL\n".join(blocks)
    return f"""
WITH brute AS (SELECT query_id, vec_id FROM ({brute}))
{union}
ORDER BY nprobe
"""


def lsh_tfidf_rescore_sql(k: int) -> str:
    """Two-stage rescore twin: LSH candidates + exact tf-idf cosine with
    DECIMAL norm/dot sums."""
    return f"""
WITH cand AS ({ORACLES["minhash_lsh_pairs"]}),
toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
nd AS (SELECT count(*)::DOUBLE AS n FROM documents),
dft AS (SELECT term, count(*)::DOUBLE AS df FROM postings GROUP BY 1),
weighted AS (
  SELECT p.doc_id, p.term,
         p.tf * (1.0 + ln((SELECT n FROM nd) / (d.df + 1.0))) AS w
  FROM postings p JOIN dft d USING (term)
),
norms AS (
  SELECT doc_id,
         sqrt(sum(round(w * w, 12)::DECIMAL(28,12))::DOUBLE) AS norm
  FROM weighted GROUP BY 1
),
dots AS (
  SELECT c.doc_a, c.doc_b,
         sum(round(a.w * b.w, 12)::DECIMAL(28,12))::DOUBLE AS dot
  FROM cand c
  JOIN weighted a ON a.doc_id = c.doc_a
  JOIN weighted b ON b.doc_id = c.doc_b AND b.term = a.term
  GROUP BY 1, 2
),
scored AS (
  SELECT d.doc_a, d.doc_b,
         round(d.dot / (na.norm * nb.norm), 6) AS cosine
  FROM dots d
  JOIN norms na ON na.doc_id = d.doc_a
  JOIN norms nb ON nb.doc_id = d.doc_b
)
SELECT doc_a, doc_b, cosine, rank FROM (
  SELECT *, row_number() OVER (ORDER BY cosine DESC, doc_a ASC, doc_b ASC)
    AS rank
  FROM scored
) WHERE rank <= {k}
"""


ORACLES["streaming_sliding_counts"] = """
WITH e AS (
  SELECT event_type, (epoch_us(ts) // 3600000000) AS h FROM events
),
expanded AS (
  SELECT event_type, (h - o) * 3600000000 AS start_us
  FROM e, (SELECT unnest([0, 1]) AS o)
)
SELECT strftime(make_timestamp(start_us), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       event_type, count(*)::BIGINT AS n_events
FROM expanded GROUP BY 1, 2 ORDER BY 1, 2
"""


def rollover_plan_sql(max_docs: int) -> str:
    """Rollover-plan twin: identical prefix sum + integral division."""
    return f"""
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS day, count(*)::BIGINT AS n_docs
  FROM events GROUP BY 1
),
cum AS (
  SELECT day, n_docs,
         sum(n_docs) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)::BIGINT AS cum_docs
  FROM daily
),
sh AS (
  SELECT *, ((cum_docs - 1) // {max_docs})::BIGINT AS shard FROM cum
)
SELECT day, n_docs, cum_docs, shard,
       (CASE WHEN lag(shard) OVER (ORDER BY day) IS NULL
             OR shard <> lag(shard) OVER (ORDER BY day)
        THEN 1 ELSE 0 END)::INT AS is_rollover_day
FROM sh ORDER BY day
"""


ORACLES["nelson_aalen_hazard"] = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) // 1000000 AS es FROM events
),
t_end AS (SELECT max(es) AS te FROM e),
signup AS (
  SELECT user_id, min(es) AS s FROM e WHERE event_type = 'signup' GROUP BY 1
),
fp AS (
  SELECT e.user_id, min(e.es) AS p
  FROM e JOIN signup g USING (user_id)
  WHERE e.event_type = 'purchase' AND e.es > g.s
  GROUP BY 1
),
obs AS (
  SELECT (CASE WHEN f.p IS NOT NULL THEN f.p - g.s
               ELSE (SELECT te FROM t_end) - g.s END) AS t,
         (CASE WHEN f.p IS NOT NULL THEN 1 ELSE 0 END) AS event
  FROM signup g LEFT JOIN fp f USING (user_id)
),
grp AS (
  SELECT t, count(*)::BIGINT AS n_here, sum(event)::BIGINT AS d
  FROM obs GROUP BY 1
),
risk AS (
  SELECT t, d,
         (sum(n_here) OVER ()
          - coalesce(sum(n_here) OVER (ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         )::BIGINT AS n_at_risk
  FROM grp
),
ev_rows AS (SELECT t, n_at_risk, d FROM risk WHERE d > 0),
na AS (
  SELECT t, n_at_risk, d,
         sum(round(d::DOUBLE / n_at_risk::DOUBLE, 12)::DECIMAL(28,12))
           OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS hsum
  FROM ev_rows
)
SELECT t, n_at_risk, d,
       round(hsum::DOUBLE, 6) AS cum_hazard,
       round(exp(-(hsum::DOUBLE)), 6) AS na_survival
FROM na ORDER BY t
"""


def attribution_time_decay_sql(
    conversion: str, lam_lit: str, lookback_s: int
) -> str:
    """Time-decay attribution twin: identical integer dt seconds, the
    SAME decay-rate repr literal, 12dp DECIMAL weights/credits."""
    cv = conversion.replace("'", "''")
    lb_us = int(lookback_s) * 1000000
    return f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
),
conv AS (
  SELECT user_id, event_id AS conv_id, us AS conv_us
  FROM e WHERE event_type = '{cv}'
),
touch AS (
  SELECT user_id, event_type AS channel, us AS touch_us
  FROM e WHERE event_type <> '{cv}'
),
pairs AS (
  SELECT c.user_id, c.conv_id, t.channel,
         (c.conv_us - t.touch_us) // 1000000 AS ds
  FROM conv c JOIN touch t ON c.user_id = t.user_id
   AND t.touch_us < c.conv_us AND c.conv_us - t.touch_us <= {lb_us}
),
wtd AS (
  SELECT user_id, conv_id, channel,
         round(exp(ds::DOUBLE * -{lam_lit}), 12)::DECIMAL(28,12) AS w
  FROM pairs
),
cred AS (
  SELECT channel,
         round(w::DOUBLE / (sum(w) OVER (PARTITION BY user_id, conv_id)
               )::DOUBLE, 12)::DECIMAL(28,12) AS credit
  FROM wtd
),
chan AS (
  SELECT channel, round(sum(credit)::DOUBLE, 6) AS credit,
         count(*)::BIGINT AS n_touchpoints
  FROM cred GROUP BY 1
),
none_row AS (
  SELECT '(none)' AS channel, round(n::DOUBLE, 6) AS credit,
         n AS n_touchpoints
  FROM (SELECT count(*)::BIGINT AS n FROM conv c
        WHERE NOT EXISTS (SELECT 1 FROM pairs p
                          WHERE p.conv_id = c.conv_id))
  WHERE n > 0
)
SELECT * FROM chan UNION ALL SELECT * FROM none_row ORDER BY channel
"""


ORACLES["cuped_adjusted_metric"] = f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us,
         round(value, 2)::DECIMAL(18,2) AS rev
  FROM events
),
sp AS (SELECT (min(us) + max(us)) // 2 AS split_us FROM e),
per AS (
  SELECT user_id,
         coalesce(sum(CASE WHEN us < (SELECT split_us FROM sp)
                           THEN 1 END), 0)::BIGINT AS x,
         coalesce(sum(CASE WHEN us >= (SELECT split_us FROM sp)
                           AND event_type = 'purchase' THEN rev END),
                  0)::DECIMAL(18,2) AS y
  FROM e GROUP BY 1
),
g AS (
  SELECT (CASE WHEN {_MD5_52.format(e="user_id::VARCHAR || ':cuped'")} % 2 = 0
               THEN 'A' ELSE 'B' END) AS arm,
         count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, sum(y) AS sy,
         sum(x * x)::BIGINT AS sxx, sum(x * y) AS sxy
  FROM per GROUP BY 1
),
pooled AS (
  SELECT arm, n, sx, sy,
         (sum(n) OVER ())::DOUBLE AS pn,
         (sum(sx) OVER ())::DOUBLE AS psx,
         (sum(sy) OVER ())::DOUBLE AS psy,
         (sum(sxx) OVER ())::DOUBLE AS psxx,
         (sum(sxy) OVER ())::DOUBLE AS psxy
  FROM g
)
SELECT arm, n,
       round(sx::DOUBLE / n::DOUBLE, 6) AS mean_x,
       round(sy::DOUBLE / n::DOUBLE, 6) AS mean_y,
       round((pn * psxy - psx * psy) / (pn * psxx - psx * psx), 6) AS theta,
       round(sy::DOUBLE / n::DOUBLE
             - ((pn * psxy - psx * psy) / (pn * psxx - psx * psx))
               * (sx::DOUBLE / n::DOUBLE - psx / pn), 6) AS adjusted_mean
FROM pooled ORDER BY arm
"""


def rake_sql(k: int, maxlen: int, stopwords: list) -> str:
    """RAKE twin: identical island grouping, deg/freq integers, 12dp
    DECIMAL word scores, 6dp rounded phrase rank."""
    stoplist = ", ".join("'" + w.replace("'", "''") + "'" for w in stopwords)
    return f"""
WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
posw AS (
  SELECT doc_id, unnest(list_transform(range(1, len(t) + 1),
         i -> {{'pos': i, 'w': t[i]}})) AS s
  FROM toks
),
pw AS (SELECT doc_id, s.pos AS pos, s.w AS w FROM posw),
nonstop AS (
  SELECT doc_id, pos, w FROM pw WHERE w NOT IN ({stoplist})
),
isl AS (
  SELECT doc_id, pos, w,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM nonstop
),
phr AS (
  SELECT doc_id, grp, string_agg(w, ' ' ORDER BY pos) AS phrase,
         count(*)::BIGINT AS plen
  FROM isl GROUP BY 1, 2 HAVING count(*) <= {maxlen}
),
ws AS (
  SELECT w, round(sum(plen)::DOUBLE / count(*)::DOUBLE, 12)
              ::DECIMAL(28,12) AS wscore
  FROM (SELECT unnest(string_split(phrase, ' ')) AS w, plen FROM phr)
  GROUP BY 1
),
dphr AS (
  SELECT phrase, count(*)::BIGINT AS n_occurrences FROM phr GROUP BY 1
),
scored AS (
  SELECT d.phrase, d.n_occurrences, round(sum(s.wscore)::DOUBLE, 6) AS score
  FROM (SELECT phrase, n_occurrences,
               unnest(string_split(phrase, ' ')) AS w
        FROM dphr) d
  JOIN ws s USING (w)
  GROUP BY 1, 2
)
SELECT rank, phrase, n_occurrences, score FROM (
  SELECT *, row_number() OVER (ORDER BY score DESC, phrase) AS rank
  FROM scored
) WHERE rank <= {k} ORDER BY rank
"""


def dup_run_sql(min_run: int) -> str:
    """Dup-shingle-run twin: identical positional 3-gram shingles,
    distinct-doc dup flag, gaps-and-islands runs, integer rollup."""
    return f"""
WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
shp AS (
  SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
    i -> {{'pos': i,
           'sh': t[i] || ' ' || t[i+1] || ' ' || t[i+2]}})) AS s
  FROM toks WHERE len(t) >= 3
),
base AS (SELECT doc_id, s.pos AS pos, s.sh AS sh FROM shp),
dup AS (
  SELECT sh FROM (
    SELECT sh, count(DISTINCT doc_id) AS nd FROM base GROUP BY 1
  ) WHERE nd >= 2
),
runs AS (
  SELECT doc_id, count(*)::BIGINT AS run
  FROM (SELECT b.doc_id, b.pos,
               b.pos - row_number() OVER (PARTITION BY b.doc_id
                                          ORDER BY b.pos) AS grp
        FROM base b JOIN dup USING (sh))
  GROUP BY doc_id, grp
),
per_doc AS (SELECT doc_id, max(run)::BIGINT AS longest FROM runs GROUP BY 1),
rep AS (
  SELECT d.source, coalesce(p.longest, 0)::BIGINT AS longest
  FROM documents d LEFT JOIN per_doc p USING (doc_id)
)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN longest > 0 THEN 1 ELSE 0 END)::BIGINT AS docs_with_dup,
       max(longest)::BIGINT AS max_run,
       round(sum(longest)::DOUBLE / count(*)::DOUBLE, 6)
         AS mean_longest_run,
       sum(CASE WHEN longest >= {min_run} THEN 1 ELSE 0 END)::BIGINT
         AS docs_run_ge_min
FROM rep GROUP BY 1 ORDER BY 1
"""


def sprt_sql(l1_lit: str, l0_lit: str, bound_lit: str) -> str:
    """SPRT twin: the same repr literals, 12dp DECIMAL daily LLR terms,
    cumulative walk against +/- the Wald bound."""
    return f"""
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS day, count(*)::BIGINT AS n,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
           AS c
  FROM events GROUP BY 1
),
llr AS (
  SELECT day, n, c,
         round(c::DOUBLE * {l1_lit} + (n - c)::DOUBLE * {l0_lit}, 12)
           ::DECIMAL(28,12) AS llr_d
  FROM daily
),
cum AS (
  SELECT day, n, c, llr_d,
         sum(llr_d) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum_d
  FROM llr
)
SELECT day, n, c, round(llr_d::DOUBLE, 6) AS llr,
       round(cum_d::DOUBLE, 6) AS cum_llr,
       (CASE WHEN cum_d::DOUBLE >= {bound_lit} THEN 'accept_h1'
             WHEN cum_d::DOUBLE <= -{bound_lit} THEN 'accept_h0'
             ELSE 'continue' END) AS decision
FROM cum ORDER BY day
"""


def log_merge_sql(merge_factor: int) -> str:
    """LogDocMergePolicy twin: integer log10 via string length."""
    return f"""
WITH segs AS (
  SELECT epoch_us(ts) // 86400000000 AS day, event_type,
         count(*)::BIGINT AS n_docs
  FROM events GROUP BY 1, 2
),
lv AS (
  SELECT (length(n_docs::VARCHAR) - 1)::BIGINT AS level FROM segs
),
per AS (
  SELECT level, count(*)::BIGINT AS n_segments FROM lv GROUP BY 1
)
SELECT level, n_segments,
       (n_segments // {merge_factor})::BIGINT AS n_merges,
       (n_segments - (n_segments // {merge_factor}) * {merge_factor}
       )::BIGINT AS n_left_at_level
FROM per ORDER BY level
"""


ORACLES["scd2_user_state_intervals"] = """
WITH e AS (
  SELECT user_id, event_id, event_type AS state, epoch_us(ts) AS us
  FROM events
),
chg AS (
  SELECT user_id, event_id, state, us,
         (CASE WHEN lag(state) OVER w IS NULL
               OR state <> lag(state) OVER w THEN 1 ELSE 0 END) AS c
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
ver AS (
  SELECT user_id, state, us,
         sum(c) OVER (PARTITION BY user_id ORDER BY us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS version
  FROM chg
),
iv AS (
  SELECT user_id, version::BIGINT AS version, min(state) AS state,
         min(us) AS valid_from_us
  FROM ver GROUP BY user_id, version
)
SELECT user_id, version, state, valid_from_us,
       lead(valid_from_us) OVER w2 AS valid_to_us,
       (CASE WHEN lead(valid_from_us) OVER w2 IS NULL
             THEN 1 ELSE 0 END)::INT AS is_current
FROM iv
WINDOW w2 AS (PARTITION BY user_id ORDER BY version)
ORDER BY user_id, version
"""


def shard_allocation_sql(n_shards: int, n_nodes: int) -> str:
    """Shard-allocation twin: identical md5 routing + round-robin."""
    h = _MD5_52.format(e="doc_id::VARCHAR || ':shard'")
    return f"""
WITH per_shard AS (
  SELECT ({h}) % {n_shards} AS shard, count(*)::BIGINT AS n_docs
  FROM documents GROUP BY 1
),
legs AS (
  SELECT shard % {n_nodes} AS node, 1 AS is_primary, n_docs FROM per_shard
  UNION ALL
  SELECT (shard + 1) % {n_nodes} AS node, 0 AS is_primary, n_docs
  FROM per_shard
)
SELECT node::BIGINT AS node,
       sum(is_primary)::BIGINT AS n_primary,
       sum(1 - is_primary)::BIGINT AS n_replica,
       sum(CASE WHEN is_primary = 1 THEN n_docs END)::BIGINT
         AS docs_primary,
       sum(n_docs)::BIGINT AS docs_total
FROM legs GROUP BY 1 ORDER BY 1
"""


def sort_missing_sql(k: int) -> str:
    """Sort-missing-last twin: same md5 sparsity, NULLS LAST page."""
    h = _MD5_52.format(e="doc_id::VARCHAR || ':mv'")
    return f"""
WITH vals AS (
  SELECT doc_id,
         (CASE WHEN ({h}) % 4 <> 0 THEN n_chars::BIGINT END) AS num
  FROM documents
)
SELECT rank, doc_id, num FROM (
  SELECT doc_id, num,
         row_number() OVER (ORDER BY num ASC NULLS LAST, doc_id) AS rank
  FROM vals
) WHERE rank <= {k} ORDER BY rank
"""


def bounce_rate_sql(gap_s: int) -> str:
    """Bounce-rate twin: identical sessionization, exact-one-event flag."""
    return f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
),
b AS (
  SELECT *, (CASE WHEN lag(us) OVER w IS NULL
                  OR us - lag(us) OVER w >= {gap_s}::BIGINT * 1000000
             THEN 1 ELSE 0 END) AS brk
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS sid
  FROM b
),
se AS (
  SELECT *, first_value(event_type) OVER (
              PARTITION BY user_id, sid ORDER BY us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS entry
  FROM s
),
sess AS (
  SELECT user_id, sid, entry, count(*)::BIGINT AS n_events
  FROM se GROUP BY 1, 2, 3
)
SELECT entry, count(*)::BIGINT AS n_sessions,
       sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::BIGINT AS n_bounced,
       round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::DOUBLE
             / count(*)::DOUBLE, 6) AS bounce_rate
FROM sess GROUP BY 1 ORDER BY 1
"""


def triplet_mining_sql(qmod: int, margin: float) -> str:
    """Triplet-mining twin: same anchor pick, rounded-cosine ranks,
    hardest-valid negative below the positive similarity."""
    return f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
q AS (
  SELECT vec_id AS anchor_id, label AS qlabel, v AS qv
  FROM e WHERE vec_id % {qmod} = 0
),
scored AS (
  SELECT q.anchor_id, q.qlabel, e.vec_id, e.label,
         round(list_dot_product(e.v, q.qv)
               / (sqrt(list_dot_product(e.v, e.v))
                  * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
  FROM e CROSS JOIN q
  WHERE e.vec_id <> q.anchor_id
),
pos AS (
  SELECT anchor_id, vec_id AS pos_id, cosine AS pos_sim FROM (
    SELECT *, row_number() OVER (PARTITION BY anchor_id
               ORDER BY cosine DESC, vec_id ASC) AS r
    FROM scored WHERE label = qlabel
  ) WHERE r = 1
),
neg AS (
  SELECT anchor_id, pos_id, pos_sim, vec_id AS neg_id,
         cosine AS neg_sim FROM (
    SELECT s.*, p.pos_id, p.pos_sim,
           row_number() OVER (PARTITION BY s.anchor_id
             ORDER BY s.cosine DESC, s.vec_id ASC) AS r
    FROM scored s JOIN pos p USING (anchor_id)
    WHERE s.label <> s.qlabel AND s.cosine < p.pos_sim
  ) WHERE r = 1
)
SELECT anchor_id, pos_id, pos_sim, neg_id, neg_sim,
       round(pos_sim - neg_sim, 6) AS triplet_gap,
       (CASE WHEN pos_sim - neg_sim < {margin} THEN 1 ELSE 0 END)::INT
         AS semi_hard
FROM neg ORDER BY anchor_id
"""


def feature_hash_sql(n_buckets: int) -> str:
    """Feature-hash collision twin: identical md5 bucket, load
    histogram with the computed empty-bucket row."""
    h = _MD5_52.format(e="term")
    return f"""
WITH toks AS (SELECT {TOKS} AS t FROM documents),
vocab AS (
  SELECT term, count(*)::BIGINT AS cf
  FROM (SELECT unnest(t) AS term FROM toks) GROUP BY 1
),
per_bucket AS (
  SELECT ({h}) % {n_buckets} AS b, count(*)::BIGINT AS load,
         sum(cf)::BIGINT AS mass
  FROM vocab GROUP BY 1
),
hist AS (
  SELECT load, count(*)::BIGINT AS n_buckets, sum(mass)::BIGINT
           AS token_mass
  FROM per_bucket GROUP BY 1
),
empty AS (
  SELECT 0::BIGINT AS load,
         ({n_buckets} - count(*))::BIGINT AS n_buckets,
         0::BIGINT AS token_mass
  FROM per_bucket
)
SELECT * FROM hist
UNION ALL
SELECT * FROM empty WHERE n_buckets > 0
ORDER BY load
"""


def eql_sequence_sql(maxspan_s: int) -> str:
    """EQL sequence twin: per-head greedy chain via row_number argmins,
    span filter after the purchase pick, earliest completed match per
    user on the full lexicographic tuple."""
    return f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
),
v AS (SELECT user_id, event_id AS v_id, us AS v_us FROM ev
      WHERE event_type = 'view'),
c AS (SELECT user_id, event_id AS c_id, us AS c_us FROM ev
      WHERE event_type = 'click'),
p AS (SELECT user_id, event_id AS p_id, us AS p_us FROM ev
      WHERE event_type = 'purchase'),
vc AS (
  SELECT user_id, v_id, v_us, c_id, c_us FROM (
    SELECT v.user_id, v.v_id, v.v_us, c.c_id, c.c_us,
           row_number() OVER (PARTITION BY v.user_id, v.v_id
                              ORDER BY c.c_us, c.c_id) AS r
    FROM v JOIN c ON v.user_id = c.user_id
    WHERE c.c_us > v.v_us
  ) WHERE r = 1
),
vcp AS (
  SELECT user_id, v_id, v_us, c_id, c_us, p_id, p_us FROM (
    SELECT vc.user_id, vc.v_id, vc.v_us, vc.c_id, vc.c_us,
           p.p_id, p.p_us,
           row_number() OVER (PARTITION BY vc.user_id, vc.v_id
                              ORDER BY p.p_us, p.p_id) AS r
    FROM vc JOIN p ON vc.user_id = p.user_id
    WHERE p.p_us > vc.c_us
  ) WHERE r = 1
    AND p_us - v_us <= {maxspan_s}::BIGINT * 1000000
)
SELECT user_id, v_id, c_id, p_id, v_us,
       (p_us - v_us)::BIGINT AS span_us
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id
      ORDER BY v_us, v_id, c_id, c_us, p_id, p_us) AS rr
  FROM vcp
) WHERE rr = 1
ORDER BY user_id
"""


def window_rank_sql() -> str:
    """Rank-window twin: exact DECIMAL spend, total-ordered window,
    percent_rank/cume_dist/ntile/row_number over the full customer set
    before the top-100 cut."""
    return """
WITH spend AS (
  SELECT o_custkey,
         sum(round(o_totalprice, 2)::DECIMAL(18,2)) AS spend_d
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT o_custkey,
         round(spend_d::DOUBLE, 2) AS spend,
         round(percent_rank() OVER w, 6) AS pct_rank,
         round(cume_dist() OVER w, 6) AS cume_dist,
         ntile(10) OVER w::INT AS decile,
         row_number() OVER w::INT AS rank
  FROM spend
  WINDOW w AS (ORDER BY spend_d DESC, o_custkey ASC)
)
SELECT * FROM ranked WHERE rank <= 100 ORDER BY rank
"""


def unpivot_lang_sql(langs: list[str]) -> str:
    """Unpivot twin: pinned-list wide counts melted losslessly via
    UNION ALL (the stack() equivalent)."""
    cases = ",\n         ".join(
        f"sum(CASE WHEN lang = '{lng}' THEN 1 ELSE 0 END)::BIGINT"
        f" AS n_{lng}"
        for lng in langs
    )
    arms = "\nUNION ALL\n".join(
        f"SELECT source, '{lng}' AS lang, n_{lng} AS n_docs FROM wide"
        for lng in langs
    )
    return f"""
WITH wide AS (
  SELECT source,
         {cases}
  FROM documents GROUP BY 1
)
{arms}
ORDER BY source, lang
"""


def ab_power_sql(z_a: float, z_b: float, mde: float) -> str:
    """Power-analysis twin: identical exact integer aggregates, the
    same pinned-repr z/mde literals (::DOUBLE so DuckDB never routes
    through DECIMAL arithmetic), the same no-pow() IEEE chain."""
    mde2 = mde * mde
    return f"""
WITH ud AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY 1, 2
),
daily AS (
  SELECT count(*)::BIGINT AS user_days,
         sum(converted)::BIGINT AS conv_days,
         count(DISTINCT day)::BIGINT AS n_days
  FROM ud
),
c1 AS (
  SELECT user_days, conv_days,
         conv_days::DOUBLE / user_days::DOUBLE AS p1,
         user_days::DOUBLE / n_days::DOUBLE AS avg_daily
  FROM daily
),
c2 AS (
  SELECT *, p1 + ({mde!r}::DOUBLE) AS p2,
         (p1 + (p1 + ({mde!r}::DOUBLE))) / (2.0::DOUBLE) AS pbar
  FROM c1
),
c3 AS (
  SELECT *,
         ({z_a!r}::DOUBLE)
           * sqrt((2.0::DOUBLE) * pbar * ((1.0::DOUBLE) - pbar))
         + ({z_b!r}::DOUBLE)
           * sqrt(p1 * ((1.0::DOUBLE) - p1)
                  + p2 * ((1.0::DOUBLE) - p2)) AS root
  FROM c2
),
c4 AS (
  SELECT *, ceil(root * root / ({mde2!r}::DOUBLE))::BIGINT AS req FROM c3
)
SELECT user_days, conv_days, round(p1, 6) AS p_hat,
       req AS required_per_arm, (req * 2)::BIGINT AS required_total,
       round(avg_daily, 6) AS avg_daily_users,
       ceil((req * 2)::DOUBLE / avg_daily)::BIGINT AS days_needed
FROM c4
"""


def did_sql(split_us: int) -> str:
    """DiD twin: identical md5 arm split, pinned midpoint, exact
    DECIMAL(28,6) cell sums, the same cell-mean/DiD IEEE chain."""
    h = _MD5_52.format(e="user_id::VARCHAR || ':did'")
    return f"""
WITH cells AS (
  SELECT ({h}) % 2 AS t,
         (CASE WHEN epoch_us(ts) >= {split_us} THEN 1 ELSE 0 END) AS p,
         round(value, 6)::DECIMAL(28,6) AS v
  FROM events WHERE event_type = 'purchase'
),
agg AS (
  SELECT
    coalesce(sum(CASE WHEN t = 1 AND p = 0 THEN 1 END), 0)::BIGINT
      AS n_t_pre,
    coalesce(sum(CASE WHEN t = 1 AND p = 1 THEN 1 END), 0)::BIGINT
      AS n_t_post,
    coalesce(sum(CASE WHEN t = 0 AND p = 0 THEN 1 END), 0)::BIGINT
      AS n_c_pre,
    coalesce(sum(CASE WHEN t = 0 AND p = 1 THEN 1 END), 0)::BIGINT
      AS n_c_post,
    sum(CASE WHEN t = 1 AND p = 0 THEN v END)::DOUBLE
      / coalesce(sum(CASE WHEN t = 1 AND p = 0 THEN 1 END), 0)::DOUBLE
      AS mt_pre,
    sum(CASE WHEN t = 1 AND p = 1 THEN v END)::DOUBLE
      / coalesce(sum(CASE WHEN t = 1 AND p = 1 THEN 1 END), 0)::DOUBLE
      AS mt_post,
    sum(CASE WHEN t = 0 AND p = 0 THEN v END)::DOUBLE
      / coalesce(sum(CASE WHEN t = 0 AND p = 0 THEN 1 END), 0)::DOUBLE
      AS mc_pre,
    sum(CASE WHEN t = 0 AND p = 1 THEN v END)::DOUBLE
      / coalesce(sum(CASE WHEN t = 0 AND p = 1 THEN 1 END), 0)::DOUBLE
      AS mc_post
  FROM cells
)
SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
       round(mt_pre, 6) AS mean_t_pre,
       round(mt_post, 6) AS mean_t_post,
       round(mc_pre, 6) AS mean_c_pre,
       round(mc_post, 6) AS mean_c_post,
       round((mt_post - mt_pre) - (mc_post - mc_pre), 6) AS did
FROM agg
"""


ORACLES["anova_event_value"] = """
WITH base AS (
  SELECT event_type,
         round(value, 6)::DECIMAL(18,6) AS v,
         round(round(value, 6) * round(value, 6), 6)::DECIMAL(28,6) AS vv
  FROM events
),
g AS (
  SELECT event_type, count(*)::BIGINT AS n, sum(v) AS sv, sum(vv) AS svv
  FROM base GROUP BY 1
),
pooled AS (
  SELECT n, sv, svv,
         count(*) OVER ()::BIGINT AS k,
         sum(n) OVER ()::BIGINT AS n_tot,
         sum(sv) OVER ()::DOUBLE AS sv_tot
  FROM g
),
terms AS (
  SELECT k, n_tot,
         round(n::DOUBLE
               * ((sv::DOUBLE / n::DOUBLE)
                  - (sv_tot / n_tot::DOUBLE))
               * ((sv::DOUBLE / n::DOUBLE)
                  - (sv_tot / n_tot::DOUBLE)), 6)::DECIMAL(28,6) AS ssb_t,
         round(svv::DOUBLE
               - n::DOUBLE * (sv::DOUBLE / n::DOUBLE)
                 * (sv::DOUBLE / n::DOUBLE), 6)::DECIMAL(28,6) AS ssw_t
  FROM pooled
),
fin AS (
  SELECT k, n_tot, sum(ssb_t) AS ssb, sum(ssw_t) AS ssw
  FROM terms GROUP BY 1, 2
)
SELECT k, n_tot,
       round(ssb::DOUBLE, 6) AS ssb,
       round(ssw::DOUBLE, 6) AS ssw,
       round((ssb::DOUBLE / (k - 1)::DOUBLE)
             / (ssw::DOUBLE / (n_tot - k)::DOUBLE), 6) AS f_stat
FROM fin
"""


def kcore_sql(support: int, k: int, rounds: int) -> str:
    """k-core peel twin: identical support-pruned co-order edges,
    peel rounds unrolled as CTE chains (degree table excludes isolated
    nodes, so isolated survivors drop the following round — the same
    semantics as the Spark semi-join chain)."""
    parts = [
        f"""
li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
e0 AS (
  SELECT a.pk AS pa, b.pk AS pb
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2 HAVING count(*) >= {support}
),
n0 AS (SELECT count(DISTINCT node)::BIGINT AS n FROM
       (SELECT pa AS node FROM e0 UNION ALL SELECT pb FROM e0))"""
    ]
    rows = []
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(f"""
d{r} AS (
  SELECT node, count(*)::BIGINT AS d FROM
  (SELECT pa AS node FROM e{p} UNION ALL SELECT pb FROM e{p})
  GROUP BY 1
),
s{r} AS (SELECT node FROM d{r} WHERE d >= {k}),
e{r} AS (
  SELECT pa, pb FROM e{p}
  WHERE pa IN (SELECT node FROM s{r}) AND pb IN (SELECT node FROM s{r})
),
c{r} AS (SELECT count(*)::BIGINT AS n_surv FROM s{r}),
g{r} AS (SELECT count(*)::BIGINT AS n_edges FROM e{r})""")
        before = "(SELECT n FROM n0)" if r == 1 else f"(SELECT n_surv FROM c{p})"
        rows.append(
            f"SELECT {r}::INT AS round, "
            f"({before} - (SELECT n_surv FROM c{r}))::BIGINT AS n_removed, "
            f"(SELECT n_surv FROM c{r}) AS n_survivors, "
            f"(SELECT n_edges FROM g{r}) AS n_edges"
        )
    return (
        "WITH " + ",".join(parts) + "\n"
        + "\nUNION ALL\n".join(rows)
        + "\nORDER BY round"
    )


def lpa_sql(support: int, iters: int) -> str:
    """Label-propagation twin: identical edges, p_brand init labels,
    per-iteration neighbor-mode with the (count desc, label asc)
    row_number tie-break."""
    parts = [
        f"""
li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
e AS (
  SELECT a.pk AS pa, b.pk AS pb
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2 HAVING count(*) >= {support}
),
nodes AS (SELECT pa AS node FROM e UNION SELECT pb FROM e),
adj AS (SELECT pa AS u, pb AS v FROM e
        UNION ALL SELECT pb, pa FROM e),
l0 AS (
  SELECT n.node, p.p_brand AS lbl
  FROM nodes n JOIN part p ON p.p_partkey = n.node
)"""
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(f"""
c{i} AS (
  SELECT a.u AS node, l.lbl, count(*)::BIGINT AS cnt
  FROM adj a JOIN l{p} l ON l.node = a.v
  GROUP BY 1, 2
),
l{i} AS (
  SELECT node, lbl FROM (
    SELECT node, lbl, row_number() OVER (
      PARTITION BY node ORDER BY cnt DESC, lbl ASC) AS r
    FROM c{i}
  ) WHERE r = 1
)""")
    cols = ", ".join(
        f"l{i}.lbl AS label_{i}" for i in range(1, iters + 1)
    )
    joins = " ".join(
        f"JOIN l{i} ON l{i}.node = l0.node" for i in range(1, iters + 1)
    )
    return (
        "WITH " + ",".join(parts)
        + f"\nSELECT l0.node AS p_partkey, l0.lbl AS label_init, {cols}"
        + f"\nFROM l0 {joins}\nORDER BY p_partkey"
    )


def retention_sql(d7: int, d14: int) -> str:
    """Retention-conditions twin: same first-signup anchor and
    strictly-after purchase windows, exact integers."""
    return f"""
WITH peru AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t0
  FROM events GROUP BY 1
),
flags AS (
  SELECT e.user_id,
         max(CASE WHEN epoch_us(e.ts) > p.t0
                   AND epoch_us(e.ts) <= p.t0 + {d7}::BIGINT * 86400000000
              THEN 1 ELSE 0 END) AS h7,
         max(CASE WHEN epoch_us(e.ts) > p.t0
                   AND epoch_us(e.ts) <= p.t0 + {d14}::BIGINT * 86400000000
              THEN 1 ELSE 0 END) AS h14
  FROM events e JOIN peru p ON e.user_id = p.user_id
  WHERE e.event_type = 'purchase' AND p.t0 IS NOT NULL
  GROUP BY 1
),
j AS (
  SELECT p.user_id, p.t0, f.h7, f.h14
  FROM peru p LEFT JOIN flags f ON p.user_id = f.user_id
),
agg AS (
  SELECT count(*)::BIGINT AS n_users,
         count(t0)::BIGINT AS n_signed_up,
         coalesce(sum(CASE WHEN t0 IS NOT NULL THEN h7 END), 0)::BIGINT
           AS n_ret_7d,
         coalesce(sum(CASE WHEN t0 IS NOT NULL THEN h14 END), 0)::BIGINT
           AS n_ret_14d
  FROM j
)
SELECT n_users, n_signed_up, n_ret_7d, n_ret_14d,
       round(n_ret_7d::DOUBLE / n_signed_up::DOUBLE, 6) AS ret_7d_rate,
       round(n_ret_14d::DOUBLE / n_signed_up::DOUBLE, 6) AS ret_14d_rate
FROM agg
"""


def _zexpr_duck(bx: str, by: str) -> str:
    terms = []
    for i in range(4):
        terms.append(f"((({bx}) // {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"((({by}) // {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


def zorder_sql(n_files: int, xb: int, yb: int, pb: int) -> str:
    """Z-order layout twin: identical Morton arithmetic (pure integer
    div/mod) over data-derived bucket widths, identical ntile file
    assignment over the same total orders, same overlap test and
    bucket-pb probe ranges."""
    z = _zexpr_duck(
        f"(l_partkey * {xb}) // nx", f"(l_suppkey * {yb}) // ny"
    )
    bounds = {
        "x_range": (
            "l_partkey",
            f"(SELECT nx * {pb} // {xb} FROM mk)",
            f"(SELECT nx * {pb + 1} // {xb} - 1 FROM mk)",
        ),
        "y_range": (
            "l_suppkey",
            f"(SELECT ny * {pb} // {yb} FROM mk)",
            f"(SELECT ny * {pb + 1} // {yb} - 1 FROM mk)",
        ),
    }
    legs = []
    for lname, order in (
        ("linear", "l_partkey, l_suppkey, l_orderkey, l_linenumber"),
        ("zorder", "z, l_partkey, l_suppkey, l_orderkey, l_linenumber"),
    ):
        for pname, (col, lo, hi) in bounds.items():
            mn, mx = (
                ("min_x", "max_x")
                if col == "l_partkey"
                else ("min_y", "max_y")
            )
            hit = f"{mn} <= {hi} AND {mx} >= {lo}"
            matched = (
                f"(SELECT count(*) FROM li"
                f" WHERE {col} BETWEEN {lo} AND {hi})"
            )
            legs.append(f"""
SELECT '{lname}' AS layout, '{pname}' AS predicate,
       count(*)::BIGINT AS n_files,
       sum(CASE WHEN {hit} THEN 1 ELSE 0 END)::BIGINT AS files_read,
       (count(*) - sum(CASE WHEN {hit} THEN 1 ELSE 0 END))::BIGINT
         AS files_skipped,
       {matched}::BIGINT AS rows_matched,
       sum(CASE WHEN {hit} THEN n_rows ELSE 0 END)::BIGINT AS rows_scanned,
       round(sum(CASE WHEN {hit} THEN n_rows ELSE 0 END)::DOUBLE
             / {matched}::DOUBLE, 6) AS read_amplification
FROM (
  SELECT f, min(l_partkey) AS min_x, max(l_partkey) AS max_x,
         min(l_suppkey) AS min_y, max(l_suppkey) AS max_y,
         count(*)::BIGINT AS n_rows
  FROM (SELECT ntile({n_files}) OVER (ORDER BY {order}) AS f,
               l_partkey, l_suppkey
        FROM li)
  GROUP BY f
)""")
    return (
        "WITH mk AS (SELECT max(l_partkey) + 1 AS nx,"
        " max(l_suppkey) + 1 AS ny FROM lineitem),\n"
        f"li AS (SELECT l_partkey, l_suppkey, l_orderkey,"
        f" l_linenumber, {z} AS z FROM lineitem, mk)\n"
        + "\nUNION ALL\n".join(legs)
        + "\nORDER BY layout, predicate"
    )


def file_skipping_sql(n_files: int, lo: str, hi: str) -> str:
    """File-skipping twin: identical epoch-us bounds, ntile files,
    overlap accounting."""
    legs = []
    for lname, order in (
        ("arrival", "o_orderkey"),
        ("date_sorted", "d_us, o_orderkey"),
    ):
        legs.append(f"""
SELECT '{lname}' AS layout,
       count(*)::BIGINT AS n_files,
       sum(CASE WHEN mn <= {hi} AND mx >= {lo} THEN 1 ELSE 0 END)::BIGINT
         AS files_read,
       (count(*) - sum(CASE WHEN mn <= {hi} AND mx >= {lo}
                       THEN 1 ELSE 0 END))::BIGINT AS files_skipped,
       (SELECT count(*) FROM o
        WHERE d_us BETWEEN {lo} AND {hi})::BIGINT AS rows_matched,
       sum(CASE WHEN mn <= {hi} AND mx >= {lo} THEN n_rows ELSE 0 END)::BIGINT
         AS rows_scanned,
       round(sum(CASE WHEN mn <= {hi} AND mx >= {lo} THEN n_rows
                 ELSE 0 END)::DOUBLE
             / (SELECT count(*) FROM o
                WHERE d_us BETWEEN {lo} AND {hi})::DOUBLE, 6)
         AS read_amplification
FROM (
  SELECT f, min(d_us) AS mn, max(d_us) AS mx, count(*)::BIGINT AS n_rows
  FROM (SELECT ntile({n_files}) OVER (ORDER BY {order}) AS f, d_us FROM o)
  GROUP BY f
)""")
    return (
        "WITH o AS (SELECT o_orderkey, epoch_us(o_orderdate) AS d_us"
        " FROM orders)\n"
        + "\nUNION ALL\n".join(legs)
        + "\nORDER BY layout"
    )


ORACLES["theil_sen_weekly_trend"] = """
WITH weekly AS (
  SELECT (epoch_us(o_orderdate) // 86400000000) // 7 AS wk,
         sum(round(o_totalprice, 2)::DECIMAL(18,2))::DOUBLE AS rev
  FROM orders GROUP BY 1
),
pairs AS (
  SELECT round((b.rev - a.rev) / (b.wk - a.wk)::DOUBLE, 6) AS slope
  FROM weekly a JOIN weekly b ON a.wk < b.wk
),
sen AS (
  SELECT quantile_cont(slope, 0.5) AS sen_slope,
         count(*)::BIGINT AS n_pairs
  FROM pairs
),
resid AS (
  SELECT n_pairs, sen_slope,
         round(w.rev - s.sen_slope * w.wk::DOUBLE, 6) AS resid
  FROM weekly w CROSS JOIN sen s
)
SELECT count(*)::BIGINT AS n_weeks, n_pairs,
       round(sen_slope, 6) AS sen_slope,
       round(quantile_cont(resid, 0.5), 6) AS intercept
FROM resid GROUP BY n_pairs, sen_slope
"""


def shingle_field_sql(
    query_text: str, w_shingle: float, k: int = 10
) -> str:
    """Shingle-field BM25 twin: identical unigram + bigram legs with
    per-field statistics (bigram dl/avgdl over docs with >= 2 tokens),
    each leg a plain per-doc sum (safe: both query legs stay under the
    plain-sum ulp bound like _BM25_AGG's 4-term flagship), combined
    unrounded and ranked on the 6dp round."""
    from lucene_mapreduce_spark.functions.tokenize import tokenize_string

    qlit = query_text.replace("'", "''")
    toks = tokenize_string(query_text)
    bis = sorted({f"{a} {b}" for a, b in zip(toks, toks[1:])})
    bi_vals = ", ".join("('" + b.replace("'", "''") + "')" for b in bis)
    return f"""
WITH qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
qbi (term) AS (VALUES {bi_vals}),
doclens AS (SELECT doc_id, len({TOKS}) AS dl FROM documents),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
dft AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
s_uni AS (
  SELECT p.doc_id,
         sum(ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
             * (p.tf * {K1 + 1.0})
             / (p.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl))) AS sc
  FROM postings p
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
  GROUP BY 1
),
btoks AS (
  SELECT doc_id, t AS ts FROM (SELECT doc_id, {TOKS} AS t FROM documents)
  WHERE len(t) >= 2
),
bi_doclens AS (SELECT doc_id, len(ts) - 1 AS dl FROM btoks),
bi_stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl
  FROM bi_doclens
),
bi_postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM (
    SELECT doc_id,
           unnest(list_transform(range(2, len(ts) + 1),
                                 i -> ts[i - 1] || ' ' || ts[i])) AS term
    FROM btoks
  ) GROUP BY 1, 2
),
bi_dft AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM bi_postings p JOIN qbi q USING (term) GROUP BY 1
),
s_bi AS (
  SELECT p.doc_id,
         sum(ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
             * (p.tf * {K1 + 1.0})
             / (p.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl))) AS sc
  FROM bi_postings p
  JOIN bi_dft d USING (term)
  JOIN bi_doclens l USING (doc_id)
  CROSS JOIN bi_stats s
  GROUP BY 1
),
legs AS (
  SELECT coalesce(u.doc_id, b.doc_id) AS doc_id,
         coalesce(u.sc, 0.0) AS su, coalesce(b.sc, 0.0) AS sb
  FROM s_uni u FULL JOIN s_bi b ON u.doc_id = b.doc_id
),
scored AS (
  SELECT doc_id,
         round(su + {w_shingle!r}::DOUBLE * sb, 6) AS score,
         round(sb, 6) AS shingle_score
  FROM legs
)
SELECT doc_id, score, shingle_score,
       row_number() OVER (ORDER BY score DESC, doc_id ASC)::INT AS rank
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def index_sort_plan_sql(n_segments: int, k: int) -> str:
    """Index-sort early-termination twin: identical mod segments,
    per-segment sorted ranks, global top-k by the same total order."""
    return f"""
WITH ranked AS (
  SELECT doc_id, n_chars,
         (doc_id % {n_segments})::INT AS seg,
         row_number() OVER (
           PARTITION BY doc_id % {n_segments}
           ORDER BY n_chars DESC, doc_id ASC) AS r
  FROM documents
),
topk AS (
  SELECT doc_id, 1 AS hit FROM documents
  ORDER BY n_chars DESC, doc_id ASC LIMIT {k}
),
j AS (
  SELECT ranked.*, topk.hit
  FROM ranked LEFT JOIN topk ON ranked.doc_id = topk.doc_id
)
SELECT seg,
       count(*)::BIGINT AS n_docs,
       coalesce(sum(hit), 0)::BIGINT AS n_in_topk,
       coalesce(max(CASE WHEN hit = 1 THEN r END), 0)::BIGINT
         AS deepest_rank_needed,
       (count(*) - coalesce(max(CASE WHEN hit = 1 THEN r END), 0))::BIGINT
         AS rows_saved
FROM j GROUP BY seg ORDER BY seg
"""


def hll_union_sql(p: int) -> str:
    """HLL union twin: identical per-source registers, bucket-max merge
    for the union row, same estimator chain as hll_cardinality."""
    m = 1 << p
    alpha_num = 0.7213 / (1.0 + 1.079 / m) * m * m * float(1 << 41)
    h = _MD5_52.format(e="term")
    est = (
        f"CASE WHEN e_raw <= {2.5 * m!r} AND v > 0 "
        f"THEN {float(m)!r} * ln({float(m)!r} / v) ELSE e_raw END"
    )
    return f"""
WITH st AS (
  SELECT DISTINCT source, unnest({TOKS}) AS term FROM documents
),
hashed AS (SELECT source, ({h}) AS h FROM st),
regs AS (
  SELECT source, h >> 40 AS bucket,
         max(CASE WHEN (h & {(1 << 40) - 1}) = 0 THEN 41
                  ELSE 40 - floor(log2((h & {(1 << 40) - 1})::DOUBLE))::INT
             END) AS m_j
  FROM hashed GROUP BY 1, 2
),
union_regs AS (
  SELECT '(union)' AS source, bucket, max(m_j) AS m_j
  FROM regs GROUP BY 2
),
folded AS (
  SELECT source, count(*)::BIGINT AS used,
         sum(1::BIGINT << (41 - m_j))::BIGINT AS s_used
  FROM (SELECT * FROM regs UNION ALL SELECT * FROM union_regs)
  GROUP BY 1
),
exact AS (
  SELECT source, count(*)::BIGINT AS n_exact FROM st GROUP BY 1
  UNION ALL
  SELECT '(union)', count(DISTINCT term)::BIGINT FROM st
),
est AS (
  SELECT source, used,
         {alpha_num!r}
           / (s_used + ({m} - used) * {1 << 41})::DOUBLE AS e_raw,
         ({m} - used)::DOUBLE AS v
  FROM folded
)
SELECT e.source, x.n_exact, e.used,
       round({est}, 4) AS hll_estimate,
       round(abs(({est}) - x.n_exact::DOUBLE) / x.n_exact::DOUBLE, 6)
         AS rel_err
FROM est e JOIN exact x ON e.source = x.source
ORDER BY e.source
"""


def borda_sql(
    query_text: str,
    depth: int,
    w_lex: int,
    w_vec: int,
    k: int = 10,
) -> str:
    """Borda-fusion twin: same two retriever legs as rrf_sql, integer
    (depth + 1 - rank) points per list with integer weights."""
    return f"""
WITH lex AS ({bm25_topk_sql(query_text, k=depth)}),
qv AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0),
vec AS (
  SELECT vec_id AS doc_id, rank FROM (
    SELECT vec_id,
           row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS rank
    FROM (
      SELECT vec_id,
             round(list_dot_product(embedding::DOUBLE[], qvec)
                   / (sqrt(list_dot_product(embedding::DOUBLE[],
                                            embedding::DOUBLE[]))
                      * sqrt(list_dot_product(qvec, qvec))), 6) AS cosine
      FROM embeddings, qv WHERE vec_id <> 0
    )
  ) WHERE rank <= {depth}
),
fused AS (
  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
         ({w_lex} * coalesce({depth + 1} - l.rank, 0)
          + {w_vec} * coalesce({depth + 1} - v.rank, 0))::BIGINT AS borda
  FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
)
SELECT doc_id, borda, rank FROM (
  SELECT doc_id, borda,
         row_number() OVER (ORDER BY borda DESC, doc_id ASC) AS rank
  FROM fused
) WHERE rank <= {k}
"""


def jl_audit_sql(signs: list[list[int]], mult: int) -> str:
    """JL-audit twin: the SAME pinned sign matrix rendered as explicit
    +-v[i] chains (left-assoc + == the Spark fold with 0.0 init), 0.25
    scale, identical Knuth pairing, fold-with-init distances."""
    jl_k, jl_dim = len(signs), len(signs[0])
    proj = ",\n         ".join(
        "round(("
        + " ".join(
            ("+" if s > 0 else "-") + f" v[{i + 1}]"
            for i, s in enumerate(signs[j])
        ).lstrip("+ ")
        + (") * 0.25::DOUBLE, 12) AS y%d" % j)
        for j in range(jl_k)
    )
    d2p = " + ".join(
        f"(a.y{j} - b.y{j}) * (a.y{j} - b.y{j})" for j in range(jl_k)
    )
    return f"""
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
nrow AS (SELECT count(*)::BIGINT AS n FROM emb),
pe AS (
  SELECT vec_id, v,
         {proj}
  FROM emb
),
pa AS (
  SELECT pe.*,
         ((vec_id % n) * ({mult} % n)) % n AS b_id
  FROM pe, nrow
),
pairs AS (
  SELECT a.v AS av, b.v AS bv,
         list_reduce(
           [0.0::DOUBLE] || list_transform(
             range(1, {jl_dim + 1}),
             i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i])),
           (acc, x) -> acc + x) AS d2o,
         {d2p} AS d2p
  FROM pa a JOIN pe b ON b.vec_id = a.b_id
  WHERE a.vec_id <> a.b_id
)
SELECT floor(round(d2p / d2o, 6) * 10.0)::INT AS bin,
       count(*)::BIGINT AS n_pairs
FROM pairs WHERE d2o > 0
GROUP BY 1 ORDER BY 1
"""


def bollinger_sql(width: int, nsigma: float) -> str:
    """Bollinger twin: identical gap-filled histogram, integer frame
    sums, same mean/std/band chain; warmup rows dropped by frame
    count."""
    return f"""
WITH {_DAILY_HIST},
framed AS (
  SELECT day, n_events,
         count(*) OVER w AS n_in_frame,
         sum(n_events) OVER w::BIGINT AS s,
         sum(n_events * n_events) OVER w::BIGINT AS ss
  FROM hist
  WINDOW w AS (ORDER BY day
               ROWS BETWEEN {width - 1} PRECEDING AND CURRENT ROW)
),
calc AS (
  SELECT day, n_events,
         s::DOUBLE / {float(width)!r} AS m,
         sqrt((ss::DOUBLE - {float(width)!r}
               * (s::DOUBLE / {float(width)!r})
               * (s::DOUBLE / {float(width)!r}))
              / ({float(width)!r} - 1.0::DOUBLE)) AS std
  FROM framed WHERE n_in_frame = {width}
)
SELECT day::VARCHAR AS day, n_events,
       round(m, 6) AS mean_w,
       round(m - {nsigma!r}::DOUBLE * std, 6) AS lower_band,
       round(m + {nsigma!r}::DOUBLE * std, 6) AS upper_band,
       (CASE WHEN n_events::DOUBLE > m + {nsigma!r}::DOUBLE * std
               OR n_events::DOUBLE < m - {nsigma!r}::DOUBLE * std
        THEN 1 ELSE 0 END)::INT AS out_of_band
FROM calc ORDER BY day
"""


def eql_until_sql(maxspan_s: int) -> str:
    """EQL-until twin: per-head earliest purchase vs earliest error,
    error-first (or tie) kills the head, earliest survivor per user."""
    return f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
),
v AS (SELECT user_id, event_id AS v_id, us AS v_us FROM ev
      WHERE event_type = 'view'),
p AS (SELECT user_id, event_id AS p_id, us AS p_us FROM ev
      WHERE event_type = 'purchase'),
er AS (SELECT user_id, us AS e_us FROM ev WHERE event_type = 'error'),
vp AS (
  SELECT user_id, v_id, v_us, p_id, p_us FROM (
    SELECT v.user_id, v.v_id, v.v_us, p.p_id, p.p_us,
           row_number() OVER (PARTITION BY v.user_id, v.v_id
                              ORDER BY p.p_us, p.p_id) AS r
    FROM v JOIN p ON v.user_id = p.user_id
    WHERE p.p_us > v.v_us
  ) WHERE r = 1
),
ve AS (
  SELECT v.user_id, v.v_id, min(er.e_us) AS e1_us
  FROM v JOIN er ON v.user_id = er.user_id
  WHERE er.e_us > v.v_us
  GROUP BY 1, 2
),
valid AS (
  SELECT vp.* FROM vp LEFT JOIN ve USING (user_id, v_id)
  WHERE (ve.e1_us IS NULL OR vp.p_us < ve.e1_us)
    AND vp.p_us - vp.v_us <= {maxspan_s}::BIGINT * 1000000
)
SELECT user_id, v_id, p_id, v_us, (p_us - v_us)::BIGINT AS span_us
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY v_us, v_id, p_id, p_us) AS rr
  FROM valid
) WHERE rr = 1
ORDER BY user_id
"""


WINDOW_NAV_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS d_us,
         round(o_totalprice, 2) AS tp
  FROM orders
),
nav AS (
  SELECT o_custkey,
         row_number() OVER w AS rn,
         count(*) OVER wf::BIGINT AS n_orders,
         first_value(tp) OVER wf AS first_price,
         nth_value(tp, 2) OVER wf AS second_price,
         last_value(tp) OVER wf AS last_price,
         lead(d_us) OVER w AS next_us,
         d_us
  FROM o
  WINDOW w AS (PARTITION BY o_custkey ORDER BY d_us, o_orderkey),
         wf AS (PARTITION BY o_custkey ORDER BY d_us, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING)
)
SELECT o_custkey, n_orders, first_price, second_price, last_price,
       ((next_us - d_us) // 86400000000)::BIGINT AS first_to_second_days
FROM nav WHERE rn = 1
ORDER BY o_custkey
"""


BBIT_MINHASH_SQL = f"""
WITH {_SHINGLES},
shc AS (
  SELECT doc_id, shingle FROM (
    SELECT *, count(*) OVER (PARTITION BY shingle) AS bn FROM sh
  ) WHERE bn <= 100
),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM shc GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_inter
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b,
         round(n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE round(n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.5
),
sigs AS (
  SELECT doc_id, i,
         (strpos('0123456789abcdef',
                 substr(min(md5(i::VARCHAR || ':' || shingle)), 32, 1))
          - 1) % 2 AS bit
  FROM sh, range(0, 12) t(i) GROUP BY 1, 2
),
est AS (
  SELECT p.doc_a, p.doc_b, p.jaccard,
         sum(CASE WHEN a.bit = b.bit THEN 1 ELSE 0 END)::BIGINT AS c
  FROM pairs p
  JOIN sigs a ON a.doc_id = p.doc_a
  JOIN sigs b ON b.doc_id = p.doc_b AND b.i = a.i
  GROUP BY 1, 2, 3
)
SELECT doc_a, doc_b, jaccard, c,
       round(greatest(0.0::DOUBLE,
                      2.0::DOUBLE * c::DOUBLE / 12.0::DOUBLE
                      - 1.0::DOUBLE), 6) AS bbit_est,
       round(abs(greatest(0.0::DOUBLE,
                          2.0::DOUBLE * c::DOUBLE / 12.0::DOUBLE
                          - 1.0::DOUBLE) - jaccard), 6) AS abs_err
FROM est ORDER BY doc_a, doc_b
"""


ORACLES["embedding_drift_halves"] = """
WITH emb AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
),
nrow AS (SELECT count(*)::BIGINT AS n FROM emb),
per AS (
  SELECT label,
         (CASE WHEN vec_id * 2 < (SELECT n FROM nrow)
          THEN 1 ELSE 0 END) AS half,
         unnest(range(len(v))) AS dim,
         v[unnest(range(len(v))) + 1] AS x
  FROM emb
),
sums AS (
  SELECT label, half, dim,
         sum(round(x, 12)::DECIMAL(28,12)) AS s,
         count(*)::BIGINT AS nv
  FROM per GROUP BY 1, 2, 3
),
m AS (
  SELECT label, half, dim, s::DOUBLE / nv::DOUBLE AS m, nv FROM sums
),
j AS (
  SELECT a.label, a.dim, a.m AS ma, b.m AS mb,
         a.nv AS n_a, b.nv AS n_b
  FROM (SELECT * FROM m WHERE half = 1) a
  JOIN (SELECT * FROM m WHERE half = 0) b
    ON a.label = b.label AND a.dim = b.dim
),
terms AS (
  SELECT label, n_a, n_b,
         round(ma * mb, 12)::DECIMAL(38,12) AS dt,
         round(ma * ma, 12)::DECIMAL(38,12) AS at,
         round(mb * mb, 12)::DECIMAL(38,12) AS bt
  FROM j
),
agg AS (
  SELECT label, n_a, n_b,
         sum(dt)::DOUBLE AS dot, sum(at)::DOUBLE AS aa,
         sum(bt)::DOUBLE AS bb
  FROM terms GROUP BY 1, 2, 3
)
SELECT label, n_a, n_b,
       round(dot / (sqrt(aa) * sqrt(bb)), 6) AS centroid_cosine
FROM agg ORDER BY label
"""


ORACLES["centered_anisotropy_audit"] = """
WITH emb AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
raw_n AS (
  SELECT v,
         sqrt(list_reduce([0.0::DOUBLE] || list_transform(v, x -> x * x),
                          (a, b) -> a + b)) AS nrm
  FROM emb
),
raw_units AS (
  SELECT list_transform(v, x -> x / nrm) AS u FROM raw_n WHERE nrm > 0
),
raw_sums AS (
  SELECT dim, sum(round(x, 12)::DECIMAL(28,12)) AS s FROM (
    SELECT unnest(range(len(u))) AS dim,
           u[unnest(range(len(u))) + 1] AS x
    FROM raw_units
  ) GROUP BY 1
),
raw_sq AS (
  SELECT sum(round(s::DOUBLE * s::DOUBLE, 12)::DECIMAL(38,12))::DOUBLE
           AS sq
  FROM raw_sums
),
raw_cnt AS (SELECT count(*)::BIGINT AS n FROM raw_units),
mu AS (
  SELECT dim, (sum(round(x, 12)::DECIMAL(28,12)))::DOUBLE
              / count(*)::DOUBLE AS m
  FROM (
    SELECT unnest(range(len(v))) AS dim,
           v[unnest(range(len(v))) + 1] AS x
    FROM emb
  ) GROUP BY 1
),
mulist AS (SELECT list(m ORDER BY dim) AS mu FROM mu),
cent AS (
  SELECT list_transform(range(1, len(v) + 1),
                        i -> v[i] - mu[i]) AS c
  FROM emb, mulist
),
cent_n AS (
  SELECT c,
         sqrt(list_reduce([0.0::DOUBLE] || list_transform(c, x -> x * x),
                          (a, b) -> a + b)) AS nrm
  FROM cent
),
cent_units AS (
  SELECT list_transform(c, x -> x / nrm) AS u FROM cent_n WHERE nrm > 0
),
cent_sums AS (
  SELECT dim, sum(round(x, 12)::DECIMAL(28,12)) AS s FROM (
    SELECT unnest(range(len(u))) AS dim,
           u[unnest(range(len(u))) + 1] AS x
    FROM cent_units
  ) GROUP BY 1
),
cent_sq AS (
  SELECT sum(round(s::DOUBLE * s::DOUBLE, 12)::DECIMAL(38,12))::DOUBLE
           AS sq
  FROM cent_sums
),
cent_cnt AS (SELECT count(*)::BIGINT AS n FROM cent_units)
SELECT rc.n AS n_raw, cc.n AS n_centered,
       round((rs.sq - rc.n::DOUBLE)
             / (rc.n::DOUBLE * (rc.n::DOUBLE - 1.0)), 6)
         AS raw_mean_cosine,
       round((cs.sq - cc.n::DOUBLE)
             / (cc.n::DOUBLE * (cc.n::DOUBLE - 1.0)), 6)
         AS centered_mean_cosine
FROM raw_sq rs, raw_cnt rc, cent_sq cs, cent_cnt cc
"""


def dbscan_sql(cell: int, factor: int, n_cells: int) -> str:
    """Grid-DBSCAN twin: identical integer cells, 9-shift neighborhood
    sums, BIGINT cross-multiplied core test."""
    h_lat = _MD5_52.format(e="doc_id::VARCHAR || ':lat'")
    h_lon = _MD5_52.format(e="doc_id::VARCHAR || ':lon'")
    return f"""
WITH cells AS (
  SELECT (({h_lat}) % 1800001) // {cell} AS cx,
         (({h_lon}) % 3600001) // {cell} AS cy
  FROM documents
),
counts AS (
  SELECT cx, cy, count(*)::BIGINT AS n FROM cells GROUP BY 1, 2
),
nb AS (
  SELECT cx + dx AS tx, cy + dy AS ty, sum(n)::BIGINT AS nb_count
  FROM counts,
       (SELECT unnest([-1, 0, 1]) AS dx) sx,
       (SELECT unnest([-1, 0, 1]) AS dy) sy
  GROUP BY 1, 2
),
total AS (SELECT sum(n)::BIGINT AS n_docs FROM counts)
SELECT c.cx, c.cy, c.n, nb.nb_count,
       (CASE WHEN nb.nb_count * {n_cells} >= {factor * 9} * t.n_docs
        THEN 1 ELSE 0 END)::INT AS is_core
FROM counts c
JOIN nb ON nb.tx = c.cx AND nb.ty = c.cy
CROSS JOIN total t
ORDER BY c.cx, c.cy
"""


def ams_f2_sql(n_sketches: int) -> str:
    """AMS F2 twin: identical md5-parity signs, BIGINT sketch sums."""
    cols = []
    for i in range(n_sketches):
        h = _MD5_52.format(e=f"'{i}:' || term || ':ams'")
        cols.append(
            f"sum(CASE WHEN ({h}) % 2 = 0 THEN cf ELSE -cf END)::BIGINT"
            f" AS s{i}"
        )
    est = " + ".join(f"s{i} * s{i}" for i in range(n_sketches))
    return f"""
WITH vocab AS (
  SELECT term, count(*)::BIGINT AS cf
  FROM (SELECT unnest({TOKS}) AS term FROM documents) GROUP BY 1
),
agg AS (
  SELECT count(*)::BIGINT AS n_terms,
         sum(cf * cf)::BIGINT AS f2_exact,
         {", ".join(cols)}
  FROM vocab
)
SELECT n_terms, f2_exact,
       round(({est})::DOUBLE / {float(n_sketches)!r}, 6) AS f2_estimate,
       round(abs(({est})::DOUBLE / {float(n_sketches)!r}
                 - f2_exact::DOUBLE) / f2_exact::DOUBLE, 6) AS rel_err
FROM agg
"""


def k_anon_sql(threshold: int, bucket: int) -> str:
    """k-anonymity twin: identical quasi-identifier and class math."""
    return f"""
WITH groups AS (
  SELECT lang, source, n_chars // {bucket} AS len_b,
         count(*)::BIGINT AS k
  FROM documents GROUP BY 1, 2, 3
)
SELECT count(*)::BIGINT AS n_classes,
       min(k)::BIGINT AS k_min,
       sum(CASE WHEN k < {threshold} THEN 1 ELSE 0 END)::BIGINT
         AS classes_below_k,
       coalesce(sum(CASE WHEN k < {threshold} THEN k END), 0)::BIGINT
         AS docs_below_k,
       sum(k)::BIGINT AS n_docs
FROM groups
"""


def dp_counts_sql(epsilon: float) -> str:
    """DP-counts twin: identical md5-uniform draw and Laplace inverse
    CDF chain."""
    h = _MD5_52.format(e="lang || ':dp'")
    return f"""
WITH counts AS (
  SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY 1
),
draw AS (
  SELECT lang, n,
         ({h})::DOUBLE / {float(1 << 52)!r} - 0.5::DOUBLE AS half
  FROM counts
),
noise AS (
  SELECT lang, n,
         ({-1.0 / epsilon!r}::DOUBLE)
           * (CASE WHEN half >= 0 THEN 1.0::DOUBLE
              ELSE -1.0::DOUBLE END)
           * ln(1.0::DOUBLE - 2.0::DOUBLE * abs(half)) AS noise
  FROM draw
)
SELECT lang, n, round(noise, 6) AS noise,
       round(n::DOUBLE + noise, 6) AS noisy_n
FROM noise ORDER BY lang
"""


def harmonic_2hop_sql(support: int, k: int = 20) -> str:
    """2-hop harmonic centrality twin: identical edges, exact-distance-2
    set via anti-join on the 1-hop set."""
    return f"""
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
e AS (
  SELECT a.pk AS pa, b.pk AS pb
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2 HAVING count(*) >= {support}
),
adj AS (SELECT pa AS u, pb AS v FROM e UNION ALL SELECT pb, pa FROM e),
deg AS (SELECT u, count(*)::BIGINT AS n1 FROM adj GROUP BY 1),
twoset AS (
  SELECT DISTINCT a.u, b.v AS w
  FROM adj a JOIN adj b ON a.v = b.u
  WHERE a.u <> b.v
),
two AS (
  SELECT t.u, count(*)::BIGINT AS n2
  FROM twoset t
  LEFT JOIN adj d ON d.u = t.u AND d.v = t.w
  WHERE d.u IS NULL
  GROUP BY 1
),
cent AS (
  SELECT deg.u AS p_partkey, deg.n1,
         coalesce(two.n2, 0)::BIGINT AS n2,
         deg.n1::DOUBLE + coalesce(two.n2, 0)::DOUBLE / 2.0 AS centrality
  FROM deg LEFT JOIN two ON two.u = deg.u
)
SELECT p_partkey, n1, n2, centrality, rank FROM (
  SELECT *, row_number() OVER (
      ORDER BY centrality DESC, p_partkey ASC)::INT AS rank
  FROM cent
) WHERE rank <= {k} ORDER BY rank
"""


def dup_order_sql(window_d: int, band: int) -> str:
    """Duplicate-order twin: identical customer blocking, DECIMAL price
    band, day-gap filter."""
    return f"""
WITH o AS (
  SELECT o_custkey, o_orderkey,
         round(o_totalprice, 2)::DECIMAL(18,2) AS tp,
         epoch_us(o_orderdate) // 86400000000 AS day
  FROM orders
)
SELECT a.o_custkey,
       a.o_orderkey AS ok_a, b.o_orderkey AS ok_b,
       a.tp::DOUBLE AS price_a, b.tp::DOUBLE AS price_b,
       abs(a.tp - b.tp)::DOUBLE AS price_diff,
       abs(a.day - b.day)::BIGINT AS day_gap
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
WHERE abs(a.day - b.day) <= {window_d}
  AND abs(a.tp - b.tp) <= {band}::DECIMAL(18,2)
ORDER BY a.o_custkey, ok_a, ok_b
"""


RLE_AUDIT_SQL = """
WITH arrival AS (
  SELECT count(*)::BIGINT AS n_rows,
         sum(CASE WHEN prev IS NULL OR prev <> lang
             THEN 1 ELSE 0 END)::BIGINT AS n_runs
  FROM (
    SELECT lang, lag(lang) OVER (ORDER BY doc_id) AS prev FROM documents
  )
),
clustered AS (
  SELECT count(*)::BIGINT AS n_rows,
         sum(CASE WHEN prev IS NULL OR prev <> lang
             THEN 1 ELSE 0 END)::BIGINT AS n_runs
  FROM (
    SELECT lang, lag(lang) OVER (ORDER BY lang, doc_id) AS prev
    FROM documents
  )
)
SELECT 'arrival' AS layout, n_rows, n_runs,
       round(n_rows::DOUBLE / n_runs::DOUBLE, 6) AS avg_run_len
FROM arrival
UNION ALL
SELECT 'lang_clustered', n_rows, n_runs,
       round(n_rows::DOUBLE / n_runs::DOUBLE, 6)
FROM clustered
ORDER BY layout
"""


def dow_strength_sql(anchor_day: int) -> str:
    """Seasonality-strength twin: identical epoch-day dow, exact-ratio
    dow means, 6dp DECIMAL squared-term sums."""
    return f"""
WITH counts AS (
  SELECT epoch_us(ts) // 86400000000 AS eday, count(*)::BIGINT AS n
  FROM events GROUP BY 1
),
cal AS (
  SELECT unnest(range(min(eday), max(eday) + 1)) AS eday FROM counts
),
hist AS (
  SELECT cal.eday, coalesce(c.n, 0)::BIGINT AS y,
         ((cal.eday - {anchor_day}) % 7 + 7) % 7 AS dow
  FROM cal LEFT JOIN counts c USING (eday)
),
dm AS (
  SELECT dow, sum(y)::DOUBLE / count(*)::DOUBLE AS s
  FROM hist GROUP BY 1
),
grand AS (
  SELECT sum(y)::DOUBLE / count(*)::DOUBLE AS g,
         count(*)::BIGINT AS n_days
  FROM hist
),
terms AS (
  SELECT n_days,
         round((y::DOUBLE - g) * (y::DOUBLE - g), 6)::DECIMAL(28,6) AS tt,
         round((y::DOUBLE - s) * (y::DOUBLE - s), 6)::DECIMAL(28,6) AS rt
  FROM hist JOIN dm USING (dow) CROSS JOIN grand
),
agg AS (
  SELECT n_days, sum(tt)::DOUBLE AS ss_total, sum(rt)::DOUBLE AS ss_resid
  FROM terms GROUP BY 1
)
SELECT n_days,
       round(ss_total / n_days::DOUBLE, 6) AS var_total,
       round(ss_resid / n_days::DOUBLE, 6) AS var_resid,
       round(greatest(0.0::DOUBLE, 1.0::DOUBLE - ss_resid / ss_total), 6)
         AS seasonal_strength
FROM agg
"""


FORECAST_BACKTEST_SQL = f"""
WITH {_DAILY_HIST},
lagged AS (
  SELECT n_events AS y,
         lag(n_events, 1) OVER (ORDER BY day) AS p_naive,
         lag(n_events, 7) OVER (ORDER BY day) AS p_snaive
  FROM hist
),
legs AS (
  SELECT 'naive' AS model, y, p_naive AS p FROM lagged
  WHERE p_naive IS NOT NULL
  UNION ALL
  SELECT 'seasonal_naive', y, p_snaive FROM lagged
  WHERE p_snaive IS NOT NULL
),
err AS (
  SELECT model, abs(y - p)::BIGINT AS ae,
         (CASE WHEN y > 0
          THEN round(abs(y - p)::DOUBLE / y::DOUBLE, 12)::DECIMAL(28,12)
          END) AS ape
  FROM legs
)
SELECT model, count(*)::BIGINT AS n_points,
       round(sum(ae)::DOUBLE / count(*)::DOUBLE, 6) AS mae,
       round(sum(ape)::DOUBLE / count(ape)::DOUBLE, 6) AS mape
FROM err GROUP BY model ORDER BY model
"""


def bloom_skip_sql(
    n_files: int, n_bits: int, stride: int, n_probes: int
) -> str:
    """Bloom-skipping twin: identical md5 file placement, two-hash
    63-bit masks, bit_or fold, probe ladder."""

    def h(e: str, salt: str, mod: int) -> str:
        return f"({_MD5_52.format(e=f'{e}::VARCHAR || {chr(39)}:{salt}{chr(39)}')}) % {mod}"

    return f"""
WITH keyed AS (
  SELECT o_orderkey,
         {h('o_orderkey', 'file', n_files)} AS f,
         ((1::BIGINT << ({h('o_orderkey', 'b1', n_bits)}))
          | (1::BIGINT << ({h('o_orderkey', 'b2', n_bits)}))) AS m
  FROM orders
),
files AS (SELECT f, bit_or(m) AS fmask FROM keyed GROUP BY 1),
probes AS (
  SELECT unnest(range(0, {n_probes})) * {stride} AS probe_key
),
pk AS (
  SELECT probe_key,
         ((1::BIGINT << ({h('probe_key', 'b1', n_bits)}))
          | (1::BIGINT << ({h('probe_key', 'b2', n_bits)}))) AS kmask
  FROM probes
),
passes AS (
  SELECT probe_key,
         sum(CASE WHEN (fmask & kmask) = kmask THEN 1 ELSE 0 END)::BIGINT
           AS files_pass
  FROM pk CROSS JOIN files GROUP BY 1
),
ex AS (SELECT DISTINCT o_orderkey AS probe_key, 1 AS e FROM orders)
SELECT p.probe_key,
       coalesce(ex.e, 0)::INT AS key_exists,
       p.files_pass,
       (p.files_pass - coalesce(ex.e, 0))::BIGINT AS false_positives
FROM passes p LEFT JOIN ex ON ex.probe_key = p.probe_key
ORDER BY p.probe_key
"""


CONSTRAINT_SUITE_SQL = """
WITH pk AS (
  SELECT coalesce(sum(CASE WHEN c > 1 THEN c - 1 END), 0)::BIGINT AS v
  FROM (SELECT o_orderkey, count(*)::BIGINT AS c
        FROM orders GROUP BY 1)
),
fk1 AS (
  SELECT count(*)::BIGINT AS v FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c
                    WHERE c.c_custkey = o.o_custkey)
),
fk2 AS (
  SELECT count(*)::BIGINT AS v FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_orderkey = l.l_orderkey)
),
nonneg AS (
  SELECT sum(CASE WHEN value < 0 THEN 1 ELSE 0 END)::BIGINT AS v
  FROM events
),
nonnull AS (
  SELECT sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS v
  FROM events
),
nchars AS (
  SELECT sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)::BIGINT
           AS v
  FROM documents
)
SELECT * FROM (
  SELECT 'orders_pk_unique' AS check_name, v AS n_violations,
         (v = 0)::INT AS passed FROM pk
  UNION ALL
  SELECT 'orders_custkey_fk', v, (v = 0)::INT FROM fk1
  UNION ALL
  SELECT 'lineitem_orderkey_fk', v, (v = 0)::INT FROM fk2
  UNION ALL
  SELECT 'events_value_nonnegative', v, (v = 0)::INT FROM nonneg
  UNION ALL
  SELECT 'events_user_id_not_null', v, (v = 0)::INT FROM nonnull
  UNION ALL
  SELECT 'documents_n_chars_consistent', v, (v = 0)::INT FROM nchars
) ORDER BY check_name
"""


def data_profile_sql(cols: list[tuple[str, str]]) -> str:
    """Profile twin: identical per-(table, column) aggregates."""
    legs = []
    for tbl, col in cols:
        legs.append(f"""
SELECT '{tbl}' AS tbl, '{col}' AS col,
       count(*)::BIGINT AS n_rows,
       sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
       sum(CASE WHEN isnan({col}) THEN 1 ELSE 0 END)::BIGINT AS n_nan,
       round(min({col}), 6) AS min_v,
       round(max({col}), 6) AS max_v
FROM {tbl}""")
    return "\nUNION ALL\n".join(legs) + "\nORDER BY tbl, col"


def any_order_funnel_sql(types: tuple, window_s: int) -> str:
    """Any-order funnel twin: backward-running-min next-occurrence per
    type (the scale-safe formulation — correlated EXISTS decorrelates
    quadratically and exhausted temp disk at sf1), ordered frontier
    leg, identical rate arithmetic."""
    w_us = window_s * 1_000_000
    tlist = ", ".join(f"'{t}'" for t in types)
    nxt_cols = ",\n         ".join(
        f"min(CASE WHEN event_type = '{t}' THEN us END)"
        f" OVER (PARTITION BY user_id ORDER BY us, event_id"
        f" ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
        f" AS nxt_{i}"
        for i, t in enumerate(types)
    )
    conds = " AND ".join(
        f"nxt_{i} IS NOT NULL AND nxt_{i} <= us + {w_us}"
        for i in range(len(types))
    )
    return f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events
  WHERE event_type IN ({tlist})
),
nxt AS (
  SELECT user_id, us,
         {nxt_cols}
  FROM ev
),
anyu AS (
  SELECT DISTINCT user_id FROM nxt WHERE {conds}
),
marked AS (
  SELECT user_id, event_type, us,
         min(CASE WHEN event_type = 'click' THEN us END)
           OVER (PARTITION BY user_id ORDER BY us
                 RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS nxt_click,
         min(CASE WHEN event_type = 'purchase' THEN us END)
           OVER (PARTITION BY user_id ORDER BY us
                 RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS nxt_purchase
  FROM ev
),
ord AS (
  SELECT DISTINCT v.user_id
  FROM (SELECT user_id, us AS v_us, nxt_click AS c1 FROM marked
        WHERE event_type = 'view' AND nxt_click IS NOT NULL) v
  JOIN (SELECT DISTINCT user_id, us AS c1, nxt_purchase AS p1
        FROM marked WHERE event_type = 'click') c
    ON c.user_id = v.user_id AND c.c1 = v.c1
  WHERE c.p1 IS NOT NULL AND c.p1 - v.v_us <= {w_us}
),
tot AS (SELECT count(DISTINCT user_id)::BIGINT AS n_users FROM ev)
SELECT t.n_users,
       (SELECT count(*) FROM anyu)::BIGINT AS n_any_order,
       (SELECT count(*) FROM ord)::BIGINT AS n_ordered,
       round((SELECT count(*) FROM anyu)::DOUBLE / t.n_users::DOUBLE, 6)
         AS any_order_rate,
       round((SELECT count(*) FROM ord)::DOUBLE / t.n_users::DOUBLE, 6)
         AS ordered_rate
FROM tot t
"""


CONSTRAINT_SUITE_SQL = """
WITH pk AS (
  SELECT coalesce(sum(CASE WHEN c > 1 THEN c - 1 END), 0)::BIGINT AS v
  FROM (SELECT o_orderkey, count(*)::BIGINT AS c
        FROM orders GROUP BY 1)
),
fk1 AS (
  SELECT count(*)::BIGINT AS v FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c
                    WHERE c.c_custkey = o.o_custkey)
),
fk2 AS (
  SELECT count(*)::BIGINT AS v FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_orderkey = l.l_orderkey)
),
nonneg AS (
  SELECT sum(CASE WHEN value < 0 THEN 1 ELSE 0 END)::BIGINT AS v
  FROM events
),
nonnull AS (
  SELECT sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS v
  FROM events
),
nchars AS (
  SELECT sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)::BIGINT
           AS v
  FROM documents
)
SELECT * FROM (
  SELECT 'orders_pk_unique' AS check_name, v AS n_violations,
         (v = 0)::INT AS passed FROM pk
  UNION ALL
  SELECT 'orders_custkey_fk', v, (v = 0)::INT FROM fk1
  UNION ALL
  SELECT 'lineitem_orderkey_fk', v, (v = 0)::INT FROM fk2
  UNION ALL
  SELECT 'events_value_nonnegative', v, (v = 0)::INT FROM nonneg
  UNION ALL
  SELECT 'events_user_id_not_null', v, (v = 0)::INT FROM nonnull
  UNION ALL
  SELECT 'documents_n_chars_consistent', v, (v = 0)::INT FROM nchars
) ORDER BY check_name
"""


def data_profile_sql(cols: list[tuple[str, str]]) -> str:
    """Profile twin: identical per-(table, column) aggregates."""
    legs = []
    for tbl, col in cols:
        legs.append(f"""
SELECT '{tbl}' AS tbl, '{col}' AS col,
       count(*)::BIGINT AS n_rows,
       sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
       sum(CASE WHEN isnan({col}) THEN 1 ELSE 0 END)::BIGINT AS n_nan,
       round(min({col}), 6) AS min_v,
       round(max({col}), 6) AS max_v
FROM {tbl}""")
    return "\nUNION ALL\n".join(legs) + "\nORDER BY tbl, col"


def any_order_funnel_sql(types: tuple, window_s: int) -> str:
    """Any-order funnel twin: anchored exists-tests per type, ordered
    frontier leg, identical rate arithmetic."""
    w_us = window_s * 1_000_000
    tlist = ", ".join(f"'{t}'" for t in types)
    exists_legs = " AND ".join(
        f"""EXISTS (
      SELECT 1 FROM ev t WHERE t.user_id = a.user_id
        AND t.event_type = '{t}'
        AND t.us >= a.us AND t.us <= a.us + {w_us})"""
        for t in types
    )
    return f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
  WHERE event_type IN ({tlist})
),
anyu AS (
  SELECT DISTINCT a.user_id
  FROM ev a
  WHERE {exists_legs}
),
marked AS (
  SELECT user_id, event_type, us,
         min(CASE WHEN event_type = 'click' THEN us END)
           OVER (PARTITION BY user_id ORDER BY us
                 RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS nxt_click,
         min(CASE WHEN event_type = 'purchase' THEN us END)
           OVER (PARTITION BY user_id ORDER BY us
                 RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS nxt_purchase
  FROM ev
),
ord AS (
  SELECT DISTINCT v.user_id
  FROM (SELECT user_id, us AS v_us, nxt_click AS c1 FROM marked
        WHERE event_type = 'view' AND nxt_click IS NOT NULL) v
  JOIN (SELECT DISTINCT user_id, us AS c1, nxt_purchase AS p1
        FROM marked WHERE event_type = 'click') c
    ON c.user_id = v.user_id AND c.c1 = v.c1
  WHERE c.p1 IS NOT NULL AND c.p1 - v.v_us <= {w_us}
),
tot AS (SELECT count(DISTINCT user_id)::BIGINT AS n_users FROM ev)
SELECT t.n_users,
       (SELECT count(*) FROM anyu)::BIGINT AS n_any_order,
       (SELECT count(*) FROM ord)::BIGINT AS n_ordered,
       round((SELECT count(*) FROM anyu)::DOUBLE / t.n_users::DOUBLE, 6)
         AS any_order_rate,
       round((SELECT count(*) FROM ord)::DOUBLE / t.n_users::DOUBLE, 6)
         AS ordered_rate
FROM tot t
"""


def compound_split_sql(inputs: tuple) -> str:
    """Decompounder twin: identical split enumeration and BIGINT
    cf-product ranking."""
    vals = ", ".join("('" + s.replace("'", "''") + "')" for s in inputs)
    return f"""
WITH vocab AS (
  SELECT term, count(*)::BIGINT AS cf
  FROM (SELECT unnest({TOKS}) AS term FROM documents) GROUP BY 1
),
probes (input) AS (VALUES {vals}),
splits AS (
  SELECT input,
         substr(input, 1, i) AS lft,
         substr(input, i + 1) AS rgt
  FROM probes, unnest(range(1, length(input))) t(i)
),
valid AS (
  SELECT s.input, s.lft, s.rgt, lv.cf AS cf_left, rv.cf AS cf_right,
         (lv.cf * rv.cf)::BIGINT AS score
  FROM splits s
  JOIN vocab lv ON lv.term = s.lft
  JOIN vocab rv ON rv.term = s.rgt
)
SELECT input, lft, rgt, cf_left, cf_right, score,
       row_number() OVER (PARTITION BY input
                          ORDER BY score DESC, lft ASC)::INT AS rank
FROM valid
ORDER BY input, rank
"""


def date_math_sql(days: int) -> str:
    """Date-math range twin: max-ts anchor, identical bounds and
    witness."""
    return f"""
WITH ev AS (SELECT event_id, epoch_us(ts) AS us FROM events),
nowr AS (SELECT max(us) AS now_us FROM ev),
hits AS (
  SELECT event_id FROM ev, nowr
  WHERE us >= now_us - {days}::BIGINT * 86400000000 AND us <= now_us
)
SELECT count(*)::BIGINT AS n_hits,
       min(event_id)::BIGINT AS first_id,
       max(event_id)::BIGINT AS last_id,
       md5(coalesce(array_to_string(
             list_sort(list(event_id::VARCHAR)), ','), '')) AS witness
FROM hits
"""


SET_OPS_SQL = """
WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
e AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error'),
i1 AS (SELECT user_id FROM v INTERSECT SELECT user_id FROM p),
x1 AS (SELECT user_id FROM v EXCEPT SELECT user_id FROM p),
u1 AS (SELECT user_id FROM v UNION SELECT user_id FROM e)
SELECT * FROM (
  SELECT 'view_intersect_purchase' AS op,
         count(*)::BIGINT AS n_users,
         md5(coalesce(array_to_string(
               list_sort(list(user_id::VARCHAR)), ','), '')) AS witness
  FROM i1
  UNION ALL
  SELECT 'view_except_purchase', count(*)::BIGINT,
         md5(coalesce(array_to_string(
               list_sort(list(user_id::VARCHAR)), ','), ''))
  FROM x1
  UNION ALL
  SELECT 'view_union_error', count(*)::BIGINT,
         md5(coalesce(array_to_string(
               list_sort(list(user_id::VARCHAR)), ','), ''))
  FROM u1
) ORDER BY op
"""


def funnel_latency_sql(maxspan_s: int) -> str:
    """Funnel-latency twin: the eql_sequence chains re-derived, gap
    percentiles per step edge."""
    return f"""
WITH chains AS ({eql_sequence_sql(maxspan_s).strip()}),
ev AS (SELECT event_id AS c_id, epoch_us(ts) AS c_us FROM events),
g AS (
  SELECT (ev.c_us - chains.v_us)::DOUBLE / 1000000.0 AS g_vc,
         (chains.v_us + chains.span_us - ev.c_us)::DOUBLE / 1000000.0
           AS g_cp,
         chains.span_us::DOUBLE / 1000000.0 AS g_vp
  FROM chains JOIN ev ON ev.c_id = chains.c_id
)
SELECT * FROM (
  SELECT 'view_to_click' AS step, count(*)::BIGINT AS n_chains,
         round(quantile_cont(g_vc, 0.5), 6) AS p50_s,
         round(quantile_cont(g_vc, 0.9), 6) AS p90_s,
         round(max(g_vc), 6) AS max_s
  FROM g
  UNION ALL
  SELECT 'click_to_purchase', count(*)::BIGINT,
         round(quantile_cont(g_cp, 0.5), 6),
         round(quantile_cont(g_cp, 0.9), 6), round(max(g_cp), 6)
  FROM g
  UNION ALL
  SELECT 'view_to_purchase', count(*)::BIGINT,
         round(quantile_cont(g_vp, 0.5), 6),
         round(quantile_cont(g_vp, 0.9), 6), round(max(g_vp), 6)
  FROM g
) ORDER BY step
"""


BASKET_SIZE_SQL = """
WITH per_order AS (
  SELECT l_orderkey, count(*)::BIGINT AS n_items,
         sum(round(l_extendedprice * (1.0 - l_discount), 4)
             ::DECIMAL(28,4)) AS orev
  FROM lineitem GROUP BY 1
)
SELECT n_items, count(*)::BIGINT AS n_orders,
       round(sum(orev)::DOUBLE / count(*)::DOUBLE, 6) AS mean_revenue
FROM per_order GROUP BY 1 ORDER BY 1
"""


def slo_burn_sql(
    budget: float, short_h: int, long_h: int, threshold: float
) -> str:
    """SLO burn twin: identical hourly histogram, trailing frames,
    pinned-repr budget/threshold literals."""
    return f"""
WITH counts AS (
  SELECT epoch_us(ts) // 3600000000 AS eh,
         count(*)::BIGINT AS n,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT
           AS ne
  FROM events GROUP BY 1
),
cal AS (
  SELECT unnest(range(min(eh), max(eh) + 1)) AS eh FROM counts
),
hist AS (
  SELECT cal.eh, coalesce(c.n, 0)::BIGINT AS n,
         coalesce(c.ne, 0)::BIGINT AS ne
  FROM cal LEFT JOIN counts c USING (eh)
),
framed AS (
  SELECT eh,
         count(*) OVER wl AS frame_l,
         sum(n) OVER ws::BIGINT AS ns, sum(ne) OVER ws::BIGINT AS nes,
         sum(n) OVER wl::BIGINT AS nl, sum(ne) OVER wl::BIGINT AS nel
  FROM hist
  WINDOW ws AS (ORDER BY eh ROWS BETWEEN {short_h - 1} PRECEDING
                AND CURRENT ROW),
         wl AS (ORDER BY eh ROWS BETWEEN {long_h - 1} PRECEDING
                AND CURRENT ROW)
)
SELECT eh,
       round(nes::DOUBLE / ns::DOUBLE, 6) AS rate_short,
       round(nel::DOUBLE / nl::DOUBLE, 6) AS rate_long,
       round(nes::DOUBLE / ns::DOUBLE / ({budget!r}::DOUBLE), 6)
         AS burn_short,
       round(nel::DOUBLE / nl::DOUBLE / ({budget!r}::DOUBLE), 6)
         AS burn_long,
       (CASE WHEN nes::DOUBLE / ns::DOUBLE / ({budget!r}::DOUBLE)
                  > {threshold!r}::DOUBLE
              AND nel::DOUBLE / nl::DOUBLE / ({budget!r}::DOUBLE)
                  > {threshold!r}::DOUBLE
        THEN 1 ELSE 0 END)::INT AS page
FROM framed
WHERE frame_l = {long_h} AND ns > 0 AND nl > 0
ORDER BY eh
"""


def neyman_sql(budget: int) -> str:
    """Neyman-allocation twin: exact integer sufficient stats, 6dp
    weights, 12dp remainders, identical largest-remainder ranking."""
    return f"""
WITH g AS (
  SELECT lang, source, count(*)::BIGINT AS n_h,
         sum(n_chars)::BIGINT AS sx,
         sum(n_chars * n_chars)::BIGINT AS sxx
  FROM documents GROUP BY 1, 2
),
wh AS (
  SELECT lang, source, n_h,
         round(CASE WHEN n_h > 1 THEN
           sqrt((sxx::DOUBLE - n_h::DOUBLE
                 * (sx::DOUBLE / n_h::DOUBLE)
                 * (sx::DOUBLE / n_h::DOUBLE))
                / (n_h::DOUBLE - 1.0)) ELSE 0.0::DOUBLE END, 6) AS s_h,
         round(CASE WHEN n_h > 1 THEN n_h::DOUBLE
               * sqrt((sxx::DOUBLE - n_h::DOUBLE
                       * (sx::DOUBLE / n_h::DOUBLE)
                       * (sx::DOUBLE / n_h::DOUBLE))
                      / (n_h::DOUBLE - 1.0))
               ELSE 0.0::DOUBLE END, 6)::DECIMAL(28,6) AS w_h
  FROM g
),
tot AS (SELECT sum(w_h) AS w_tot FROM wh),
shares AS (
  SELECT lang, source, n_h, s_h,
         {float(budget)!r}::DOUBLE * w_h::DOUBLE / w_tot::DOUBLE AS raw
  FROM wh CROSS JOIN tot
),
based AS (
  SELECT lang, source, n_h, s_h,
         round(raw, 6) AS raw_share,
         floor(raw)::BIGINT AS base,
         round(raw - floor(raw), 12) AS rem
  FROM shares
),
leftover AS (
  SELECT ({budget} - sum(base))::BIGINT AS extra FROM based
),
ranked AS (
  SELECT *, row_number() OVER (
      ORDER BY rem DESC, lang ASC, source ASC) AS rr
  FROM based CROSS JOIN leftover
)
SELECT lang, source, n_h, s_h, raw_share,
       (base + (CASE WHEN rr <= extra THEN 1 ELSE 0 END))::BIGINT
         AS allocated
FROM ranked ORDER BY lang, source
"""


def dict_audit_sql(cols: list[tuple[str, str]]) -> str:
    """Dict-encoding twin: identical integer byte model; index bits as
    the bit length of (cardinality - 1)."""
    legs = []
    for tbl, col in cols:
        legs.append(f"""
SELECT '{tbl}' AS tbl, '{col}' AS col, n_rows, n_distinct,
       plain_bytes, index_bits,
       (dict_payload + (n_rows * index_bits + 7) // 8)::BIGINT
         AS dict_bytes,
       round((dict_payload + (n_rows * index_bits + 7) // 8)::DOUBLE
             / plain_bytes::DOUBLE, 6) AS compression_ratio
FROM (
  SELECT b.n_rows, b.plain_bytes, d.n_distinct, d.dict_payload,
         (CASE WHEN d.n_distinct <= 2 THEN 1
          ELSE length(bin(d.n_distinct - 1)) END)::INT AS index_bits
  FROM (SELECT count(*)::BIGINT AS n_rows,
               sum(length({col}))::BIGINT AS plain_bytes FROM {tbl}) b,
       (SELECT count(*)::BIGINT AS n_distinct,
               sum(length(v))::BIGINT AS dict_payload
        FROM (SELECT DISTINCT {col} AS v FROM {tbl})) d
)""")
    return "\nUNION ALL\n".join(legs) + "\nORDER BY tbl, col"


def join_skew_sql(keys: list[tuple[str, str]]) -> str:
    """Join-skew twin: identical per-key group stats."""
    legs = []
    for tbl, key in keys:
        legs.append(f"""
SELECT '{tbl}' AS tbl, '{key}' AS key,
       count(*)::BIGINT AS n_keys,
       sum(c)::BIGINT AS n_rows,
       max(c)::BIGINT AS max_group,
       round(quantile_cont(c, 0.5), 6) AS p50_group,
       round(quantile_cont(c, 0.99), 6) AS p99_group,
       round(max(c)::DOUBLE / sum(c)::DOUBLE, 6) AS max_key_share,
       round(max(c)::DOUBLE
             / (sum(c)::DOUBLE / count(*)::DOUBLE), 6) AS skew_factor
FROM (SELECT {key}, count(*)::BIGINT AS c FROM {tbl} GROUP BY 1)""")
    return "\nUNION ALL\n".join(legs) + "\nORDER BY tbl, key"


WELFORD_MERGE_SQL = """
WITH g AS (
  SELECT source, count(*)::BIGINT AS n,
         sum(n_chars)::BIGINT AS sx,
         sum(n_chars * n_chars)::BIGINT AS sxx
  FROM documents GROUP BY 1
),
parts AS (
  SELECT source, n,
         sx::DOUBLE / n::DOUBLE AS m,
         sxx::DOUBLE - n::DOUBLE * (sx::DOUBLE / n::DOUBLE)
           * (sx::DOUBLE / n::DOUBLE) AS m2
  FROM g
),
packed AS (
  SELECT list({'m2': m2, 'm': m, 'n': n} ORDER BY source) AS ps
  FROM parts
),
-- DuckDB evaluates struct-pack lambda fields SEQUENTIALLY, mutating the
-- accumulator as it goes (measured: a field reading a.n after 'n' was
-- written sees the NEW n). Field order m2 -> m -> n means every field
-- reads only not-yet-written accumulator slots, matching Spark's
-- snapshot semantics exactly.
merged AS (
  SELECT list_reduce(
           [{'m2': 0.0::DOUBLE, 'm': 0.0::DOUBLE, 'n': 0::BIGINT}] || ps,
           (a, p) -> {
             'm2': a.m2 + p.m2
                   + (p.m - a.m) * (p.m - a.m)
                     * a.n::DOUBLE * p.n::DOUBLE / (a.n + p.n)::DOUBLE,
             'm': (a.n::DOUBLE * a.m + p.n::DOUBLE * p.m)
                  / (a.n + p.n)::DOUBLE,
             'n': a.n + p.n
           }) AS acc
  FROM packed
),
direct AS (
  SELECT count(*)::BIGINT AS n_d,
         (sum(n_chars * n_chars)::DOUBLE
          - count(*)::DOUBLE
            * (sum(n_chars)::DOUBLE / count(*)::DOUBLE)
            * (sum(n_chars)::DOUBLE / count(*)::DOUBLE))
         / (count(*)::DOUBLE - 1.0) AS var_direct
  FROM documents
)
SELECT m.acc.n AS n,
       round(m.acc.m2 / (m.acc.n::DOUBLE - 1.0), 6) AS var_merged,
       round(d.var_direct, 6) AS var_direct,
       round(abs(m.acc.m2 / (m.acc.n::DOUBLE - 1.0) - d.var_direct), 6)
         AS abs_diff
FROM merged m, direct d
"""


def correlated_subquery_sql(k: int) -> str:
    """Correlated-subquery twin: the IDENTICAL correlated scalar
    subquery text DuckDB decorrelates its own way."""
    return f"""
WITH gate_orders_corr AS (
  SELECT o_custkey, o_orderkey,
         round(o_totalprice, 2)::DECIMAL(18,2) AS tp
  FROM orders
)
SELECT o_custkey,
       count(*)::BIGINT AS n_above,
       round(min(tp)::DOUBLE, 2) AS min_above_price
FROM gate_orders_corr o
WHERE tp > (SELECT avg(tp::DOUBLE)
            FROM gate_orders_corr i
            WHERE i.o_custkey = o.o_custkey)
GROUP BY o_custkey
ORDER BY n_above DESC, o_custkey ASC
LIMIT {k}
"""


def hurst_sql(windows: tuple) -> str:
    """Hurst twin: identical block R/S construction per pinned window,
    12dp-rounded logs, DECIMAL OLS sums."""
    legs = []
    for wsize in windows:
        legs.append(f"""
SELECT {wsize}::INT AS window_d,
       count(*)::BIGINT AS n_blocks,
       round(sum(rs)::DOUBLE / count(*)::DOUBLE, 6) AS mean_rs
FROM (
  SELECT round(r / s, 6)::DECIMAL(28,6) AS rs FROM (
    SELECT b, max(c) - min(c) AS r,
           sqrt((any_value(bss)::DOUBLE
                 - {float(wsize)!r}
                   * (any_value(bs)::DOUBLE / {float(wsize)!r})
                   * (any_value(bs)::DOUBLE / {float(wsize)!r}))
                / ({float(wsize)!r} - 1.0)) AS s
    FROM (
      SELECT b, bss, bs,
             sum(d) OVER (PARTITION BY b ORDER BY idx
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS c
      FROM (
        SELECT blk.b, blk.idx,
               blk.y::DOUBLE - sz.bs::DOUBLE / {float(wsize)!r} AS d,
               sz.bss, sz.bs
        FROM (SELECT idx // {wsize} AS b, idx, y FROM hist) blk
        JOIN (
          SELECT idx // {wsize} AS b, count(*)::BIGINT AS bn,
                 sum(y)::BIGINT AS bs, sum(y * y)::BIGINT AS bss
          FROM hist GROUP BY 1 HAVING count(*) = {wsize}
        ) sz USING (b)
      )
    ) GROUP BY b
  ) WHERE s > 0
)""")
    points = "\nUNION ALL\n".join(legs)
    return f"""
WITH counts AS (
  SELECT epoch_us(ts) // 86400000000 AS eday, count(*)::BIGINT AS n
  FROM events GROUP BY 1
),
cal AS (
  SELECT unnest(range(min(eday), max(eday) + 1)) AS eday FROM counts
),
hist AS (
  SELECT row_number() OVER (ORDER BY cal.eday) - 1 AS idx,
         coalesce(c.n, 0)::BIGINT AS y
  FROM cal LEFT JOIN counts c USING (eday)
),
pts AS (
{points}
),
logged AS (
  SELECT window_d, n_blocks, mean_rs,
         round(ln(window_d::DOUBLE), 12) AS lx,
         round(ln(mean_rs), 12) AS ly
  FROM pts
),
sums AS (
  SELECT window_d, n_blocks, mean_rs,
         count(*) OVER ()::DOUBLE AS k,
         sum(round(lx, 12)::DECIMAL(38,12)) OVER ()::DOUBLE AS sx,
         sum(round(ly, 12)::DECIMAL(38,12)) OVER ()::DOUBLE AS sy,
         sum(round(lx * lx, 12)::DECIMAL(38,12)) OVER ()::DOUBLE AS sxx,
         sum(round(lx * ly, 12)::DECIMAL(38,12)) OVER ()::DOUBLE AS sxy
  FROM logged
)
SELECT window_d, n_blocks, mean_rs,
       round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS hurst
FROM sums ORDER BY window_d
"""


def tuning_advisor_sql(
    tables: list[str],
    bcast: int,
    pbytes: int,
    slots: int,
    schemas: dict,
) -> str:
    """Tuning-advisor twin: identical typed-width byte model; `schemas`
    maps table -> list of (col, kind) with kind in
    {'string','floatarr','fixed'}."""
    legs = []
    for tbl in tables:
        width = " + ".join(
            (
                f"coalesce(length({c})::BIGINT, 0)"
                if k == "string"
                else (
                    f"coalesce(len({c})::BIGINT, 0) * 4"
                    if k == "floatarr"
                    else "8::BIGINT"
                )
            )
            for c, k in schemas[tbl]
        )
        legs.append(f"""
SELECT '{tbl}' AS tbl, n_rows, est_bytes,
       (CASE WHEN est_bytes <= {bcast} THEN 1 ELSE 0 END)::INT
         AS broadcastable,
       greatest(1, (est_bytes + {pbytes - 1}) // {pbytes})::BIGINT
         AS scan_partitions,
       ((greatest(1, (est_bytes + {pbytes - 1}) // {pbytes})
         + {slots - 1}) // {slots})::BIGINT AS task_waves
FROM (
  SELECT count(*)::BIGINT AS n_rows,
         sum({width})::BIGINT AS est_bytes
  FROM {tbl}
)""")
    return "\nUNION ALL\n".join(legs) + "\nORDER BY tbl"


REVENUE_WATERFALL_SQL = """
WITH agg AS (
  SELECT
    sum(round(l_extendedprice, 4)::DECIMAL(38,4)) AS gross,
    sum(round(l_extendedprice * l_discount, 4)::DECIMAL(38,4))
      AS discount,
    sum(round(l_extendedprice * (1.0 - l_discount), 4)::DECIMAL(38,4))
      AS net,
    sum(round(l_extendedprice * (1.0 - l_discount) * l_tax, 4)
        ::DECIMAL(38,4)) AS tax,
    sum(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax), 4)
        ::DECIMAL(38,4)) AS charge
  FROM lineitem
)
SELECT * FROM (
  SELECT '1_gross' AS component, round(gross::DOUBLE, 2) AS amount
  FROM agg
  UNION ALL SELECT '2_discount', round(discount::DOUBLE, 2) FROM agg
  UNION ALL SELECT '3_net', round(net::DOUBLE, 2) FROM agg
  UNION ALL SELECT '4_tax', round(tax::DOUBLE, 2) FROM agg
  UNION ALL SELECT '5_charge', round(charge::DOUBLE, 2) FROM agg
) ORDER BY component
"""


def markov_absorption_sql(target: str) -> str:
    """Markov-absorption twin: identical transition matrix and three
    unrolled DECIMAL-reentry iterations."""
    t = target.replace("'", "''")
    return f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events
),
tr AS (
  SELECT s, t, count(*)::BIGINT AS c FROM (
    SELECT event_type AS s,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY us, event_id) AS t
    FROM ev
  ) WHERE t IS NOT NULL GROUP BY 1, 2
),
totals AS (SELECT s, sum(c)::BIGINT AS n FROM tr GROUP BY 1),
tmat AS (
  SELECT tr.s, tr.t, tr.c::DOUBLE / totals.n::DOUBLE AS p
  FROM tr JOIN totals USING (s)
),
states AS (SELECT s FROM totals),
p1 AS (
  SELECT st.s, coalesce(m.p, 0.0::DOUBLE) AS pk
  FROM states st LEFT JOIN (
    SELECT s, p FROM tmat WHERE t = '{t}'
  ) m USING (s)
),
r2 AS (
  SELECT m.s, sum(round(m.p * p1.pk, 12)::DECIMAL(38,12))::DOUBLE
           AS reach
  FROM tmat m JOIN p1 ON p1.s = m.t
  WHERE m.t <> '{t}' GROUP BY 1
),
p2 AS (
  SELECT p1.s, p1.pk + coalesce(r2.reach, 0.0::DOUBLE) AS pk
  FROM p1 LEFT JOIN r2 USING (s)
),
r3 AS (
  SELECT m.s, sum(round(m.p * p2.pk, 12)::DECIMAL(38,12))::DOUBLE
           AS reach
  FROM tmat m JOIN p2 ON p2.s = m.t
  WHERE m.t <> '{t}' GROUP BY 1
),
p3 AS (
  SELECT p1.s, p1.pk + coalesce(r3.reach, 0.0::DOUBLE) AS pk
  FROM p1 LEFT JOIN r3 USING (s)
)
SELECT p1.s AS start_state,
       round(p1.pk, 6) AS p_1step,
       round(p2.pk, 6) AS p_2step,
       round(p3.pk, 6) AS p_3step
FROM p1 JOIN p2 ON p2.s = p1.s JOIN p3 ON p3.s = p1.s
ORDER BY start_state
"""


def packing_waste_sql(budget: int) -> str:
    """Attention-waste twin: identical placement, bin-overlap segments,
    12dp DECIMAL cross-fraction means."""
    return f"""
WITH base AS (
  SELECT source, doc_id, len({TOKS})::BIGINT AS dl FROM documents
),
placed AS (
  SELECT source, dl,
         (sum(dl) OVER (PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW)
          - dl)::BIGINT AS off
  FROM base WHERE dl > 0
),
segs AS (
  SELECT source, b,
         least(off + dl, (b + 1) * {budget})
           - greatest(off, b * {budget}) AS seg
  FROM (
    SELECT source, off, dl,
           unnest(range(off // {budget}, (off + dl - 1) // {budget} + 1))
             AS b
    FROM placed
  )
),
bins AS (
  SELECT source, b, sum(seg)::BIGINT AS binlen,
         sum(seg * seg)::BIGINT AS sumsq,
         count(*)::BIGINT AS n_segs
  FROM segs GROUP BY 1, 2
),
res AS (
  SELECT source, n_segs,
         round(1.0::DOUBLE - sumsq::DOUBLE
               / ({float(budget) * float(budget)!r}::DOUBLE), 12)
           ::DECIMAL(28,12) AS xfrac
  FROM bins WHERE binlen = {budget}
)
SELECT source, count(*)::BIGINT AS n_full_bins,
       round(sum(xfrac)::DOUBLE / count(*)::DOUBLE, 6)
         AS mean_cross_frac,
       round(sum(n_segs)::DOUBLE / count(*)::DOUBLE, 6)
         AS mean_docs_per_bin
FROM res GROUP BY 1 ORDER BY 1
"""


def pass_at_k_sql(k: int) -> str:
    """pass@k twin: identical bounded product and 12dp DECIMAL mean."""
    prod = " * ".join(
        f"((n - c - {i})::DOUBLE / (n - {i})::DOUBLE)" for i in range(k)
    )
    return f"""
WITH per AS (
  SELECT user_id, count(*)::BIGINT AS n,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
           AS c
  FROM events GROUP BY 1
),
scored AS (
  SELECT round(CASE WHEN n - c < {k} THEN 1.0::DOUBLE
               ELSE 1.0::DOUBLE - ({prod}) END, 12)::DECIMAL(28,12) AS p
  FROM per WHERE n >= {k}
)
SELECT count(*)::BIGINT AS n_tasks, {k}::INT AS k,
       round(sum(p)::DOUBLE / count(*)::DOUBLE, 6) AS mean_pass_at_k
FROM scored
"""


HAPAX_SQL = f"""
WITH toks AS (
  SELECT source, unnest({TOKS}) AS term FROM documents
),
per_src AS (
  SELECT source, term, count(*)::BIGINT AS cf FROM toks GROUP BY 1, 2
),
src_rows AS (
  SELECT source, count(*)::BIGINT AS vocab,
         sum(CASE WHEN cf = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax
  FROM per_src GROUP BY 1
),
corpus AS (
  SELECT '(corpus)' AS source, count(*)::BIGINT AS vocab,
         sum(CASE WHEN cf = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax
  FROM (SELECT term, count(*)::BIGINT AS cf FROM toks GROUP BY 1)
)
SELECT source, vocab, hapax,
       round(hapax::DOUBLE / vocab::DOUBLE, 6) AS hapax_frac
FROM (SELECT * FROM src_rows UNION ALL SELECT * FROM corpus)
ORDER BY source
"""


def cdc_sql(wgram: int, divisor: int) -> str:
    """CDC twin: identical trailing-window md5 boundary test and
    bucketed chunk-length histogram."""
    h = _MD5_52.format(e=f"substr(text, i - {wgram - 1}, {wgram})")
    return f"""
WITH bounds AS (
  SELECT doc_id, length(text)::BIGINT AS len,
         list_filter(
           list_transform(range({wgram}, length(text) + 1),
             i -> CASE WHEN ({h}) % {divisor} = 0
                  THEN i::BIGINT END),
           x -> x IS NOT NULL) AS cuts
  FROM documents WHERE length(text) >= {wgram}
),
chunks AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(cuts) + 2),
           j -> (CASE WHEN j = len(cuts) + 1 THEN len
                 ELSE cuts[j] END)
                - (CASE WHEN j = 1 THEN 0 ELSE cuts[j - 1] END)))
           AS clen
  FROM bounds
)
SELECT (clen // {divisor})::BIGINT AS bucket,
       count(*)::BIGINT AS n_chunks,
       sum(clen)::BIGINT AS total_chars
FROM chunks WHERE clen > 0
GROUP BY 1 ORDER BY 1
"""


def recsys_sql(k: int) -> str:
    """Coverage/novelty twin: identical top-k neighbor lists and
    12dp DECIMAL novelty mean."""
    return f"""
WITH li AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
),
co AS (
  SELECT a.pk AS pa, b.pk AS pb, count(*)::BIGINT AS c
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
  GROUP BY 1, 2
),
recs AS (
  SELECT pa, pb FROM (
    SELECT pa, pb,
           row_number() OVER (PARTITION BY pa
                              ORDER BY c DESC, pb ASC) AS r
    FROM co
  ) WHERE r <= {k}
),
catalog AS (SELECT count(*)::BIGINT AS n_catalog FROM part),
pop AS (SELECT pk, count(*)::BIGINT AS n_orders FROM li GROUP BY 1),
tot AS (SELECT count(*)::BIGINT AS n_total FROM li),
nov AS (
  SELECT round(-log2(pop.n_orders::DOUBLE / tot.n_total::DOUBLE), 12)
           ::DECIMAL(28,12) AS nv
  FROM recs JOIN pop ON pop.pk = recs.pb CROSS JOIN tot
)
SELECT
  (SELECT count(DISTINCT pb) FROM recs)::BIGINT AS n_recommended,
  c.n_catalog,
  round((SELECT count(DISTINCT pb) FROM recs)::DOUBLE
        / c.n_catalog::DOUBLE, 6) AS catalog_coverage,
  (SELECT count(*) FROM recs)::BIGINT AS n_lists,
  (SELECT round(sum(nv)::DOUBLE / count(*)::DOUBLE, 6) FROM nov)
    AS mean_novelty
FROM catalog c
"""


L_DIVERSITY_SQL = """
WITH classes AS (
  SELECT source, n_chars // 200 AS len_b,
         count(*)::BIGINT AS n_rows,
         count(DISTINCT lang)::BIGINT AS l_div
  FROM documents GROUP BY 1, 2
)
SELECT count(*)::BIGINT AS n_classes,
       min(l_div)::BIGINT AS l_min,
       sum(CASE WHEN l_div < 3 THEN 1 ELSE 0 END)::BIGINT
         AS classes_below_l,
       coalesce(sum(CASE WHEN l_div < 3 THEN n_rows END), 0)::BIGINT
         AS docs_below_l
FROM classes
"""


DELTA_VARINT_SQL = """
WITH li AS (
  SELECT l_partkey::BIGINT AS v, l_orderkey, l_linenumber FROM lineitem
),
raw AS (
  SELECT count(*)::BIGINT AS n_values,
         sum(CASE WHEN v <= 0 THEN 1
             ELSE (length(bin(v)) + 6) // 7 END)::BIGINT AS total_bytes
  FROM li
),
deltas AS (
  SELECT v - coalesce(lag(v) OVER (ORDER BY v, l_orderkey,
                                   l_linenumber), 0) AS d
  FROM li
),
sortd AS (
  SELECT count(*)::BIGINT AS n_values,
         sum(CASE WHEN d <= 0 THEN 1
             ELSE (length(bin(d)) + 6) // 7 END)::BIGINT AS total_bytes
  FROM deltas
)
SELECT layout, n_values, total_bytes,
       round(total_bytes::DOUBLE / n_values::DOUBLE, 6) AS bytes_per_value
FROM (
  SELECT 'raw_varint' AS layout, * FROM raw
  UNION ALL
  SELECT 'delta_sorted_varint', * FROM sortd
) ORDER BY layout
"""


def aqe_coalesce_sql(n_parts: int, target_div: int) -> str:
    """AQE-coalesce twin: identical md5 partitions; the greedy pass is
    a RECURSIVE CTE stepping the partition order (list_reduce cannot
    accumulate a list inside a struct-pack lambda in this DuckDB —
    measured: `a.out || x.out` keeps only the last element)."""
    h = _MD5_52.format(e="user_id::VARCHAR || ':aqe'")
    return f"""
WITH RECURSIVE ev AS (SELECT ({h}) % {n_parts} AS p FROM events),
counts AS (SELECT p, count(*)::BIGINT AS c FROM ev GROUP BY 1),
tgt AS (
  SELECT ((sum(c) + {target_div - 1}) // {target_div})::BIGINT AS target
  FROM counts
),
seq AS (
  SELECT p, c, row_number() OVER (ORDER BY p) AS i FROM counts
),
walk AS (
  SELECT i, p, c, 0::INT AS grp, c AS run FROM seq WHERE i = 1
  UNION ALL
  SELECT q.i, q.p, q.c,
         (CASE WHEN w.run >= t.target THEN w.grp + 1
          ELSE w.grp END)::INT,
         CASE WHEN w.run >= t.target THEN q.c ELSE w.run + q.c END
  FROM walk w JOIN seq q ON q.i = w.i + 1 CROSS JOIN tgt t
)
SELECT grp, count(*)::BIGINT AS n_partitions,
       sum(c)::BIGINT AS rows,
       min(p)::BIGINT AS first_p, max(p)::BIGINT AS last_p
FROM walk GROUP BY grp ORDER BY grp
"""


def systematic_sample_sql(k: int, offset: int) -> str:
    """Systematic-sample twin: identical row-index stride."""
    return f"""
WITH idx AS (
  SELECT n_chars::BIGINT AS x,
         row_number() OVER (ORDER BY doc_id) - 1 AS i
  FROM documents
),
samp AS (
  SELECT count(*)::BIGINT AS n_sample, sum(x)::BIGINT AS s_sample
  FROM idx WHERE i % {k} = {offset}
),
pop AS (
  SELECT count(*)::BIGINT AS n_pop, sum(x)::BIGINT AS s_pop FROM idx
)
SELECT n_sample, n_pop,
       round(s_sample::DOUBLE / n_sample::DOUBLE, 6) AS sample_mean,
       round(s_pop::DOUBLE / n_pop::DOUBLE, 6) AS pop_mean,
       round(abs(s_sample::DOUBLE / n_sample::DOUBLE
                 - s_pop::DOUBLE / n_pop::DOUBLE)
             / (s_pop::DOUBLE / n_pop::DOUBLE), 6) AS rel_err
FROM samp, pop
"""


def mom_sql(buckets: int) -> str:
    """Median-of-medians twin: identical md5 buckets, type-7 medians."""
    h = _MD5_52.format(e="doc_id::VARCHAR || ':mom'")
    return f"""
WITH docs AS (
  SELECT ({h}) % {buckets} AS b, n_chars::DOUBLE AS x FROM documents
),
per_bucket AS (
  SELECT b, round(quantile_cont(x, 0.5), 6) AS med FROM docs GROUP BY 1
),
mom AS (
  SELECT count(*)::BIGINT AS n_buckets,
         round(quantile_cont(med, 0.5), 6) AS mom
  FROM per_bucket
),
exact AS (
  SELECT round(quantile_cont(x, 0.5), 6) AS exact_median FROM docs
)
SELECT n_buckets, mom, exact_median,
       round(abs(mom - exact_median) / exact_median, 6) AS rel_err
FROM mom, exact
"""


def dense_rank_sql(k: int) -> str:
    """rank/dense_rank twin with the identical tie-heavy order."""
    return f"""
SELECT rn, doc_id, n_chars, rnk, drnk,
       (rnk - drnk)::BIGINT AS tie_gap
FROM (
  SELECT doc_id, n_chars,
         rank() OVER (ORDER BY n_chars DESC)::BIGINT AS rnk,
         dense_rank() OVER (ORDER BY n_chars DESC)::BIGINT AS drnk,
         row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents
) WHERE rn <= {k} ORDER BY rn
"""


def qdc_sql(ps: tuple) -> str:
    """Disc-vs-cont quantile twin: explicit ceil(p*n) row pick for the
    discrete leg, quantile_cont for the continuous one."""
    legs = []
    for p in ps:
        legs.append(f"""
SELECT {p!r}::DOUBLE AS p,
       round((SELECT x FROM ranked, nrow
              WHERE r = greatest(1, ceil({p!r}::DOUBLE * n::DOUBLE))), 6)
         AS q_disc,
       round((SELECT quantile_cont(x, {p!r}) FROM docs), 6) AS q_cont,
       round((SELECT quantile_cont(x, {p!r}) FROM docs), 6)
         - round((SELECT x FROM ranked, nrow
                  WHERE r = greatest(1,
                        ceil({p!r}::DOUBLE * n::DOUBLE))), 6) AS gap
""")
    return f"""
WITH docs AS (SELECT n_chars::DOUBLE AS x FROM documents),
nrow AS (SELECT count(*)::BIGINT AS n FROM docs),
ranked AS (
  SELECT x, row_number() OVER (ORDER BY x) AS r FROM docs
)
{"UNION ALL".join(legs)}
ORDER BY p
"""


T_CLOSENESS_SQL = """
WITH docs AS (
  SELECT source, n_chars // 200 AS len_b, lang FROM documents
),
gd AS (SELECT lang, count(*)::BIGINT AS gn FROM docs GROUP BY 1),
gt AS (SELECT count(*)::BIGINT AS gt FROM docs),
cls AS (
  SELECT source, len_b, lang, count(*)::BIGINT AS cn
  FROM docs GROUP BY 1, 2, 3
),
ctot AS (
  SELECT source, len_b, sum(cn)::BIGINT AS ct FROM cls GROUP BY 1, 2
),
support AS (
  SELECT ctot.source, ctot.len_b, ctot.ct, gd.lang, gd.gn, gt.gt
  FROM ctot CROSS JOIN gd CROSS JOIN gt
),
j AS (
  SELECT s.source, s.len_b,
         round(abs(coalesce(c.cn, 0)::DOUBLE / s.ct::DOUBLE
                   - s.gn::DOUBLE / s.gt::DOUBLE), 12)
           ::DECIMAL(28,12) AS term
  FROM support s
  LEFT JOIN cls c ON c.source = s.source AND c.len_b = s.len_b
                 AND c.lang = s.lang
),
per_cls AS (
  SELECT source, len_b,
         round(sum(term)::DOUBLE / 2.0, 6) AS t
  FROM j GROUP BY 1, 2
)
SELECT count(*)::BIGINT AS n_classes,
       round(max(t), 6) AS t_max,
       sum(CASE WHEN t > 0.2 THEN 1 ELSE 0 END)::BIGINT
         AS classes_above_t
FROM per_cls
"""


def selectivity_sql(preds: list) -> str:
    """Selectivity twin: identical pinned predicate pairs."""
    legs = []
    for name, pa, pb in preds:
        legs.append(f"""
SELECT '{name}' AS pred, na, nb, nab,
       round((na::DOUBLE / n::DOUBLE) * (nb::DOUBLE / n::DOUBLE), 6)
         AS sel_independent,
       round(nab::DOUBLE / n::DOUBLE, 6) AS sel_actual,
       round(CASE WHEN nab > 0 THEN greatest(
           ((na::DOUBLE / n::DOUBLE) * (nb::DOUBLE / n::DOUBLE))
             / (nab::DOUBLE / n::DOUBLE),
           (nab::DOUBLE / n::DOUBLE)
             / ((na::DOUBLE / n::DOUBLE) * (nb::DOUBLE / n::DOUBLE)))
       END, 6) AS q_error
FROM (
  SELECT count(*)::BIGINT AS n,
         sum(CASE WHEN {pa} THEN 1 ELSE 0 END)::BIGINT AS na,
         sum(CASE WHEN {pb} THEN 1 ELSE 0 END)::BIGINT AS nb,
         sum(CASE WHEN ({pa}) AND ({pb}) THEN 1 ELSE 0 END)::BIGINT
           AS nab
  FROM documents
)""")
    return "\nUNION ALL\n".join(legs) + "\nORDER BY pred"


def psi_sql(deciles: int) -> str:
    """PSI twin: reference-half type-7 decile edges computed inline,
    identical bucket cascade, floored 12dp DECIMAL terms."""
    qs = ", ".join(f"{i / deciles!r}" for i in range(1, deciles))
    return f"""
WITH ev AS (
  SELECT epoch_us(ts) AS us, value::DOUBLE AS v FROM events
),
split AS (SELECT (min(us) + max(us)) // 2 AS s FROM ev),
ref AS (SELECT v FROM ev, split WHERE us < s),
cur AS (SELECT v FROM ev, split WHERE us >= s),
edges AS (SELECT quantile_cont(v, [{qs}]) AS e FROM ref),
hr AS (
  SELECT list_sum(list_transform(e, x ->
           CASE WHEN v > x THEN 1 ELSE 0 END))::INT AS b,
         count(*)::BIGINT AS n_ref
  FROM ref, edges GROUP BY 1
),
hc AS (
  SELECT list_sum(list_transform(e, x ->
           CASE WHEN v > x THEN 1 ELSE 0 END))::INT AS b,
         count(*)::BIGINT AS n_cur
  FROM cur, edges GROUP BY 1
),
buckets AS (SELECT unnest(range(0, {deciles}))::INT AS b),
h AS (
  SELECT buckets.b, coalesce(hr.n_ref, 0)::BIGINT AS n_ref,
         coalesce(hc.n_cur, 0)::BIGINT AS n_cur
  FROM buckets LEFT JOIN hr USING (b) LEFT JOIN hc USING (b)
),
tots AS (
  SELECT sum(n_ref)::BIGINT AS tr, sum(n_cur)::BIGINT AS tc FROM h
),
terms AS (
  SELECT round(
           (greatest(n_ref::DOUBLE / tr::DOUBLE, 1e-06)
            - greatest(n_cur::DOUBLE / tc::DOUBLE, 1e-06))
           * ln(greatest(n_ref::DOUBLE / tr::DOUBLE, 1e-06)
                / greatest(n_cur::DOUBLE / tc::DOUBLE, 1e-06)), 12)
           ::DECIMAL(28,12) AS term
  FROM h, tots
)
SELECT {deciles}::INT AS n_buckets,
       round(sum(term)::DOUBLE, 6) AS psi
FROM terms
"""


QUANT_GRANULARITY_SQL = """
WITH comp AS (
  SELECT unnest(range(len(v))) AS dim,
         v[unnest(range(len(v))) + 1] AS v
  FROM (SELECT embedding::DOUBLE[] AS v FROM embeddings)
),
dimstats AS (
  SELECT dim, min(v) AS mn, max(v) AS mx FROM comp GROUP BY 1
),
gstats AS (SELECT min(v) AS mn, max(v) AS mx FROM comp),
pc AS (
  SELECT round((v - deq) * (v - deq), 12)::DECIMAL(28,12) AS e2,
         round(abs(v - deq), 12) AS ae
  FROM (
    SELECT c.v,
           CASE WHEN d.mx = d.mn THEN d.mn
                ELSE d.mn + round((c.v - d.mn)
                                  / ((d.mx - d.mn) / 255.0), 0)
                     * ((d.mx - d.mn) / 255.0) END AS deq
    FROM comp c JOIN dimstats d USING (dim)
  )
),
pt AS (
  SELECT round((v - deq) * (v - deq), 12)::DECIMAL(28,12) AS e2,
         round(abs(v - deq), 12) AS ae
  FROM (
    SELECT c.v,
           CASE WHEN g.mx = g.mn THEN g.mn
                ELSE g.mn + round((c.v - g.mn)
                                  / ((g.mx - g.mn) / 255.0), 0)
                     * ((g.mx - g.mn) / 255.0) END AS deq
    FROM comp c CROSS JOIN gstats g
  )
)
SELECT * FROM (
  SELECT 'per_channel' AS scheme, count(*)::BIGINT AS n_components,
         round(sum(e2)::DOUBLE / count(*)::DOUBLE, 12) AS mse,
         round(max(ae), 6) AS max_abs_err
  FROM pc
  UNION ALL
  SELECT 'per_tensor', count(*)::BIGINT,
         round(sum(e2)::DOUBLE / count(*)::DOUBLE, 12),
         round(max(ae), 6)
  FROM pt
) ORDER BY scheme
"""


def bloom_join_sql(bits: int, lo_us: int, hi_us: int) -> str:
    """Bloom-join twin: identical one-hash buckets and pass sets."""
    hb = _MD5_52.format(e="o_orderkey::VARCHAR || ':bj'")
    hp = _MD5_52.format(e="l_orderkey::VARCHAR || ':bj'")
    return f"""
WITH build AS (
  SELECT o_orderkey FROM orders
  WHERE epoch_us(o_orderdate) BETWEEN {lo_us} AND {hi_us}
),
bloom AS (SELECT DISTINCT ({hb}) % {bits} AS b FROM build),
probe AS (SELECT l_orderkey FROM lineitem),
passed AS (
  SELECT count(*)::BIGINT AS n_pass FROM probe
  WHERE (({hp}) % {bits}) IN (SELECT b FROM bloom)
),
matched AS (
  SELECT count(*)::BIGINT AS n_match FROM probe
  WHERE l_orderkey IN (SELECT o_orderkey FROM build)
),
np AS (SELECT count(*)::BIGINT AS n_probe FROM probe),
nb AS (SELECT count(*)::BIGINT AS n_build_keys FROM build)
SELECT nb.n_build_keys, np.n_probe, m.n_match, p.n_pass,
       (p.n_pass - m.n_match)::BIGINT AS false_passes,
       round(1.0::DOUBLE - p.n_pass::DOUBLE / np.n_probe::DOUBLE, 6)
         AS shuffle_reduction
FROM np, nb, passed p, matched m
"""


ASSORTATIVITY_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
            FROM lineitem),
e AS (
  SELECT a.pk AS pa, b.pk AS pb
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2 HAVING count(*) >= 2
),
adj AS (SELECT pa AS u, pb AS v FROM e UNION ALL SELECT pb, pa FROM e),
deg AS (SELECT u, count(*)::BIGINT AS d FROM adj GROUP BY 1),
ed AS (
  SELECT du.d AS dx, dv.d AS dy
  FROM adj
  JOIN deg du ON du.u = adj.u
  JOIN deg dv ON dv.u = adj.v
),
agg AS (
  SELECT count(*)::BIGINT AS m,
         sum(dx)::BIGINT AS sx, sum(dy)::BIGINT AS sy,
         sum(dx * dx)::BIGINT AS sxx, sum(dy * dy)::BIGINT AS syy,
         sum(dx * dy)::BIGINT AS sxy
  FROM ed
)
SELECT (m // 2)::BIGINT AS n_edges,
       round((m::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / (sqrt(m::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                * sqrt(m::DOUBLE * syy::DOUBLE
                       - sy::DOUBLE * sy::DOUBLE)), 6)
         AS assortativity
FROM agg
"""


WEIGHTED_MEDIAN_SQL = """
WITH li AS (
  SELECT l_returnflag,
         round(l_extendedprice, 2)::DECIMAL(18,2) AS price,
         l_quantity::BIGINT AS w, l_orderkey, l_linenumber
  FROM lineitem
),
tot AS (
  SELECT l_returnflag, sum(w)::BIGINT AS wtot,
         count(*)::BIGINT AS n_rows
  FROM li GROUP BY 1
),
cum AS (
  SELECT l_returnflag, price,
         (sum(w) OVER (PARTITION BY l_returnflag
                       ORDER BY price, l_orderkey, l_linenumber
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW))::BIGINT AS cw
  FROM li
),
hit AS (
  SELECT c.l_returnflag, t.wtot, t.n_rows,
         min(struct_pack(cw := c.cw, price := c.price)) AS m
  FROM cum c JOIN tot t USING (l_returnflag)
  WHERE c.cw * 2 >= t.wtot
  GROUP BY 1, 2, 3
)
SELECT l_returnflag, n_rows, wtot AS total_weight,
       round((m.price)::DOUBLE, 2) AS weighted_median
FROM hit ORDER BY l_returnflag
"""


SIMHASH_BIT_BALANCE_SQL = f"""
WITH tok AS (SELECT doc_id, unnest({TOKS}) AS token FROM documents),
tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
h AS (SELECT doc_id, tf,
             md5('0:' || token) || md5('1:' || token) AS h FROM tf),
per_bit AS (
  SELECT doc_id, j,
         sum(tf * CASE WHEN substr(h, (j + 1)::INT, 1)
                        IN ('1','3','5','7','9','b','d','f')
                  THEN 1 ELSE -1 END)::BIGINT AS s
  FROM h, range(0, 64) t(j) GROUP BY 1, 2
),
nrow AS (SELECT count(DISTINCT doc_id)::BIGINT AS n FROM per_bit),
ones AS (
  SELECT j::INT AS bit,
         sum(CASE WHEN s > 0 THEN 1 ELSE 0 END)::BIGINT AS ones
  FROM per_bit GROUP BY 1
)
SELECT bit, ones,
       round(ones::DOUBLE / n::DOUBLE, 6) AS ones_frac,
       round(abs(ones::DOUBLE / n::DOUBLE - 0.5), 6) AS bias
FROM ones, nrow ORDER BY bit
"""


def local_clustering_sql(support: int, k: int) -> str:
    """Local-clustering twin: identical triangle credit and ratio."""
    return f"""
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
            FROM lineitem),
e AS (
  SELECT a.pk AS pa, b.pk AS pb
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2 HAVING count(*) >= {support}
),
deg AS (
  SELECT node, count(*)::BIGINT AS d FROM (
    SELECT pa AS node FROM e UNION ALL SELECT pb FROM e
  ) GROUP BY 1
),
tri AS (
  SELECT e1.pa AS x, e1.pb AS y, e2.pb AS z
  FROM e e1
  JOIN e e2 ON e2.pa = e1.pb
  JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
),
corner AS (
  SELECT node, count(*)::BIGINT AS t FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  ) GROUP BY 1
),
lcc AS (
  SELECT deg.node, deg.d, coalesce(corner.t, 0)::BIGINT AS t,
         round(2.0::DOUBLE * coalesce(corner.t, 0)::DOUBLE
               / (deg.d::DOUBLE * (deg.d::DOUBLE - 1.0)), 6) AS lcc
  FROM deg LEFT JOIN corner USING (node)
  WHERE deg.d >= 2
)
SELECT node AS p_partkey, d, t, lcc, rank FROM (
  SELECT *, row_number() OVER (ORDER BY lcc DESC, node ASC)::INT AS rank
  FROM lcc
) WHERE rank <= {k} ORDER BY rank
"""


JAIN_FAIRNESS_SQL = """
WITH per AS (
  SELECT user_id, count(*)::BIGINT AS x FROM events GROUP BY 1
),
agg AS (
  SELECT count(*)::BIGINT AS n_users, sum(x)::BIGINT AS sx,
         sum(x * x)::BIGINT AS sxx
  FROM per
)
SELECT n_users, sx AS n_events,
       round(sx::DOUBLE * sx::DOUBLE
             / (n_users::DOUBLE * sxx::DOUBLE), 6) AS jain_index,
       round(1.0::DOUBLE / n_users::DOUBLE, 6) AS worst_case
FROM agg
"""


def file_overlap_sql(n_files: int) -> str:
    """Overlap-depth twin: identical ntile files and interval join."""
    legs = []
    for lname, order in (
        ("arrival", "o_orderkey"),
        ("date_sorted", "d_us, o_orderkey"),
    ):
        legs.append(f"""
SELECT '{lname}' AS layout,
       count(*)::BIGINT AS n_files,
       round(sum(depth)::DOUBLE / count(*)::DOUBLE, 6)
         AS mean_overlap_depth,
       max(depth)::BIGINT AS max_overlap_depth
FROM (
  SELECT a.f, coalesce(d.depth, 0)::BIGINT AS depth
  FROM (
    SELECT f, min(d_us) AS mn, max(d_us) AS mx
    FROM (SELECT ntile({n_files}) OVER (ORDER BY {order}) AS f, d_us
          FROM o)
    GROUP BY f
  ) a
  LEFT JOIN (
    SELECT x.f, count(*)::BIGINT AS depth
    FROM (
      SELECT f, min(d_us) AS mn, max(d_us) AS mx
      FROM (SELECT ntile({n_files}) OVER (ORDER BY {order}) AS f, d_us
            FROM o)
      GROUP BY f
    ) x
    JOIN (
      SELECT f, min(d_us) AS mn, max(d_us) AS mx
      FROM (SELECT ntile({n_files}) OVER (ORDER BY {order}) AS f, d_us
            FROM o)
      GROUP BY f
    ) y ON x.f <> y.f AND x.mn <= y.mx AND x.mx >= y.mn
    GROUP BY x.f
  ) d ON d.f = a.f
)""")
    return (
        "WITH o AS (SELECT o_orderkey, epoch_us(o_orderdate) AS d_us"
        " FROM orders)\n"
        + "\nUNION ALL\n".join(legs)
        + "\nORDER BY layout"
    )


def join_card_sql(pairs: list) -> str:
    """Join-cardinality twin: identical estimator and q-error."""
    legs = []
    for name, ta, ka, tb, kb in pairs:
        legs.append(f"""
SELECT '{name}' AS pair, na, nb, da, db, n_actual,
       round(na::DOUBLE * nb::DOUBLE
             / greatest(da, db)::DOUBLE, 6) AS n_estimated,
       round(CASE WHEN n_actual > 0 THEN greatest(
           (na::DOUBLE * nb::DOUBLE / greatest(da, db)::DOUBLE)
             / n_actual::DOUBLE,
           n_actual::DOUBLE
             / (na::DOUBLE * nb::DOUBLE / greatest(da, db)::DOUBLE))
       END, 6) AS q_error
FROM (
  SELECT
    (SELECT count(*) FROM {ta})::BIGINT AS na,
    (SELECT count(*) FROM {tb})::BIGINT AS nb,
    (SELECT count(DISTINCT {ka}) FROM {ta})::BIGINT AS da,
    (SELECT count(DISTINCT {kb}) FROM {tb})::BIGINT AS db,
    (SELECT count(*) FROM {ta} a JOIN {tb} b
       ON a.{ka} = b.{kb})::BIGINT AS n_actual
)""")
    return "\nUNION ALL\n".join(legs) + "\nORDER BY pair"


CHAR_ENTROPY_BOUND_SQL = """
WITH chars AS (
  SELECT source, unnest(string_split(text, '')) AS ch FROM documents
),
filtered AS (SELECT source, ch FROM chars WHERE length(ch) > 0),
hist AS (
  SELECT source, ch, count(*)::BIGINT AS c FROM filtered GROUP BY 1, 2
),
tot AS (SELECT source, sum(c)::BIGINT AS n FROM hist GROUP BY 1),
terms AS (
  SELECT hist.source,
         round(-(hist.c::DOUBLE / tot.n::DOUBLE)
               * ln(hist.c::DOUBLE / tot.n::DOUBLE)
               * 1.4426950408889634, 12)::DECIMAL(28,12) AS term
  FROM hist JOIN tot USING (source)
),
h AS (
  SELECT source, sum(term)::DOUBLE AS h_bits FROM terms GROUP BY 1
)
SELECT h.source, tot.n AS raw_chars,
       round(h.h_bits, 6) AS entropy_bits_per_char,
       ceil(h.h_bits * tot.n::DOUBLE / 8.0)::BIGINT AS bound_bytes,
       round(h.h_bits / 8.0, 6) AS best_ratio
FROM h JOIN tot USING (source)
ORDER BY h.source
"""


def rr_audit_sql(flip_p: float) -> str:
    """Randomized-response twin: identical md5-uniform draws and
    debiasing corrector."""
    h = _MD5_52.format(e="user_id::VARCHAR || ':rr'")
    return f"""
WITH per AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS truth
  FROM events GROUP BY 1
),
flipped AS (
  SELECT truth,
         CASE WHEN (({h}) % {1 << 20})::DOUBLE
                   / {float(1 << 20)!r} < {flip_p!r}::DOUBLE
              THEN 1 - truth ELSE truth END AS released
  FROM per
),
agg AS (
  SELECT count(*)::BIGINT AS n_users,
         sum(truth)::BIGINT AS n_true,
         sum(released)::BIGINT AS n_released
  FROM flipped
)
SELECT n_users,
       round(n_true::DOUBLE / n_users::DOUBLE, 6) AS true_rate,
       round(n_released::DOUBLE / n_users::DOUBLE, 6) AS observed_rate,
       round((n_released::DOUBLE / n_users::DOUBLE - {flip_p!r}::DOUBLE)
             / ({1.0 - 2.0 * flip_p!r}::DOUBLE), 6) AS estimated_rate
FROM agg
"""


def null_semantics_sql(null_uid: int) -> str:
    """NULL-semantics twin: identical NULLed build side and three
    formulations under ANSI three-valued logic."""
    return f"""
WITH probe AS (SELECT DISTINCT user_id FROM events),
build AS (
  SELECT DISTINCT (CASE WHEN user_id = {null_uid} THEN NULL
                   ELSE user_id END) AS uid
  FROM events WHERE event_type = 'error'
)
SELECT * FROM (
  SELECT 'not_in' AS formulation,
         (SELECT count(*) FROM probe
          WHERE user_id NOT IN (SELECT uid FROM build))::BIGINT
           AS n_rows
  UNION ALL
  SELECT 'not_exists',
         (SELECT count(*) FROM probe p
          WHERE NOT EXISTS (SELECT 1 FROM build b
                            WHERE b.uid = p.user_id))::BIGINT
  UNION ALL
  SELECT 'left_anti_join',
         (SELECT count(*) FROM probe p
          LEFT JOIN build b ON b.uid = p.user_id
          WHERE b.uid IS NULL)::BIGINT
) ORDER BY formulation
"""


def circular_hour_sql(two_pi: float) -> str:
    """Circular-concentration twin: shared 2-pi literal, 12dp DECIMAL
    component sums, sqrt-only resultant."""
    return f"""
WITH ev AS (
  SELECT event_type, epoch_us(ts) AS us FROM events
),
comps AS (
  SELECT event_type,
         round(cos((us % 86400000000)::DOUBLE / 86400000000.0
                   * {two_pi!r}::DOUBLE), 12)::DECIMAL(28,12) AS c,
         round(sin((us % 86400000000)::DOUBLE / 86400000000.0
                   * {two_pi!r}::DOUBLE), 12)::DECIMAL(28,12) AS s
  FROM ev
),
agg AS (
  SELECT event_type, count(*)::BIGINT AS n,
         sum(c)::DOUBLE AS cc, sum(s)::DOUBLE AS ss
  FROM comps GROUP BY 1
)
SELECT event_type, n,
       round(sqrt(cc * cc + ss * ss) / n::DOUBLE, 6) AS resultant_r
FROM agg ORDER BY event_type
"""


def repeat_part_sql(k: int) -> str:
    """Repeat-purchase twin: identical rollup and top-k order."""
    return f"""
WITH pc AS (
  SELECT li.l_partkey, o.o_custkey,
         count(DISTINCT li.l_orderkey)::BIGINT AS n_ord
  FROM lineitem li JOIN orders o ON li.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
per_part AS (
  SELECT l_partkey, count(*)::BIGINT AS n_customers,
         sum(CASE WHEN n_ord >= 2 THEN 1 ELSE 0 END)::BIGINT
           AS repeat_customers
  FROM pc GROUP BY 1
)
SELECT l_partkey, n_customers, repeat_customers,
       round(repeat_customers::DOUBLE / n_customers::DOUBLE, 6)
         AS repeat_rate,
       rank
FROM (
  SELECT *, row_number() OVER (
      ORDER BY repeat_customers DESC, l_partkey ASC)::INT AS rank
  FROM per_part
) WHERE rank <= {k} ORDER BY rank
"""


def good_turing_sql(max_r: int) -> str:
    """Good-Turing twin: identical gap-filled ladder and lead lookup."""
    return f"""
WITH cf AS (
  SELECT term, count(*)::BIGINT AS r
  FROM (SELECT unnest({TOKS}) AS term FROM documents) GROUP BY 1
),
nr AS (SELECT r, count(*)::BIGINT AS n_r FROM cf GROUP BY 1),
ladder AS (SELECT unnest(range(1, {max_r + 2}))::BIGINT AS r),
filled AS (
  SELECT ladder.r, coalesce(nr.n_r, 0)::BIGINT AS n_r
  FROM ladder LEFT JOIN nr USING (r)
),
led AS (
  SELECT r, n_r, lead(n_r) OVER (ORDER BY r) AS n_r1 FROM filled
)
SELECT r, n_r,
       coalesce(n_r1, 0)::BIGINT AS n_r_plus_1,
       round(CASE WHEN n_r > 0 THEN (r + 1)::DOUBLE
                  * coalesce(n_r1, 0)::DOUBLE / n_r::DOUBLE END, 6)
         AS r_star
FROM led WHERE r <= {max_r} ORDER BY r
"""


SIMPSON_DIVERSITY_SQL = f"""
WITH tf AS (
  SELECT source, term, count(*)::BIGINT AS c
  FROM (SELECT source, unnest({TOKS}) AS term FROM documents)
  GROUP BY 1, 2
),
tot AS (SELECT source, sum(c)::BIGINT AS n FROM tf GROUP BY 1),
terms AS (
  SELECT tf.source,
         round((tf.c::DOUBLE / tot.n::DOUBLE)
               * (tf.c::DOUBLE / tot.n::DOUBLE), 12)::DECIMAL(28,12)
           AS sq
  FROM tf JOIN tot USING (source)
),
lam AS (
  SELECT source, sum(sq)::DOUBLE AS lam FROM terms GROUP BY 1
)
SELECT lam.source, tot.n AS n_tokens,
       round(lam.lam, 6) AS simpson_lambda,
       round(1.0::DOUBLE / lam.lam, 6) AS effective_vocab
FROM lam JOIN tot USING (source)
ORDER BY lam.source
"""


VOCAB_EDIT1_SQL = f"""
WITH vocab AS (
  SELECT term, count(*)::BIGINT AS cf
  FROM (SELECT unnest({TOKS}) AS term FROM documents) GROUP BY 1
)
SELECT a.term AS ta, b.term AS tb,
       levenshtein(a.term, b.term)::INT AS dist,
       a.cf AS cf_a, b.cf AS cf_b
FROM vocab a JOIN vocab b ON a.term < b.term
WHERE levenshtein(a.term, b.term) <= 2
ORDER BY ta, tb
"""


POSTING_GAP_SQL = f"""
WITH post AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df,
         min(doc_id)::BIGINT AS lo, max(doc_id)::BIGINT AS hi
  FROM (SELECT doc_id, unnest({TOKS}) AS term FROM documents)
  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
),
per_term AS (
  SELECT length(df::VARCHAR)::INT AS decade,
         (hi - lo)::DOUBLE / (df - 1)::DOUBLE AS mean_gap
  FROM post
),
agg AS (
  SELECT decade, count(*)::BIGINT AS n_terms,
         round(sum(round(mean_gap, 12)::DECIMAL(28,12))::DOUBLE
               / count(*)::DOUBLE, 6) AS mean_of_mean_gaps
  FROM per_term GROUP BY 1
)
SELECT decade, n_terms, mean_of_mean_gaps,
       (CASE WHEN mean_of_mean_gaps < 1 THEN 1
        ELSE (length(bin(round(mean_of_mean_gaps, 0)::BIGINT)) + 6) // 7
        END)::INT AS varbyte_bytes_per_gap
FROM agg ORDER BY decade
"""


PRE_PURCHASE_DWELL_SQL = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events
),
lagged AS (
  SELECT event_type,
         (us - lag(us) OVER (PARTITION BY user_id
                             ORDER BY us, event_id))::DOUBLE
           / 1000000.0 AS gap_s
  FROM ev
)
SELECT count(*)::BIGINT AS n_purchases,
       sum(CASE WHEN gap_s IS NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_opening,
       round(quantile_cont(gap_s, 0.5), 6) AS p50_s,
       round(quantile_cont(gap_s, 0.9), 6) AS p90_s,
       round(max(gap_s), 6) AS max_s
FROM lagged WHERE event_type = 'purchase'
"""


PENNY_ROUNDING_SQL = """
WITH li AS (
  SELECT l_returnflag,
         round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax), 6)
           ::DECIMAL(28,6) AS c6
  FROM lineitem
),
agg AS (
  SELECT l_returnflag, count(*)::BIGINT AS n_lines,
         sum(round(c6, 2)::DECIMAL(28,2)) AS sum_of_rounded,
         round(sum(c6), 2) AS rounded_sum
  FROM li GROUP BY 1
)
SELECT l_returnflag, n_lines,
       round(sum_of_rounded::DOUBLE, 2) AS sum_of_rounded,
       round(rounded_sum::DOUBLE, 2) AS rounded_sum,
       ((sum_of_rounded - rounded_sum)::DECIMAL(28,2) * 100)::BIGINT
         AS diff_cents
FROM agg ORDER BY l_returnflag
"""


TRANSITION_ENTROPY_SQL = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events
),
trans AS (
  SELECT s, t, count(*)::BIGINT AS c FROM (
    SELECT event_type AS s,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY us, event_id) AS t
    FROM ev
  ) WHERE t IS NOT NULL GROUP BY 1, 2
),
row_tot AS (SELECT s, sum(c)::BIGINT AS ns FROM trans GROUP BY 1),
grand AS (SELECT sum(c)::BIGINT AS n FROM trans),
terms AS (
  SELECT round(-(trans.c::DOUBLE / grand.n::DOUBLE)
               * ln(trans.c::DOUBLE / row_tot.ns::DOUBLE), 12)
           ::DECIMAL(28,12) AS term
  FROM trans JOIN row_tot USING (s) CROSS JOIN grand
),
agg AS (SELECT sum(term)::DOUBLE AS h_nats FROM terms)
SELECT grand.n AS n_transitions,
       round(agg.h_nats, 6) AS entropy_nats,
       round(agg.h_nats * 1.4426950408889634, 6) AS entropy_bits,
       round(exp(agg.h_nats), 6) AS perplexity
FROM agg, grand
"""


NEXT_BASKET_SQL = """
WITH orders_w AS (
  SELECT o_orderkey AS prev_ok,
         lead(o_orderkey) OVER (PARTITION BY o_custkey
                                ORDER BY epoch_us(o_orderdate),
                                         o_orderkey) AS next_ok
  FROM orders
),
pairs AS (SELECT prev_ok, next_ok FROM orders_w WHERE next_ok IS NOT NULL),
li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
nxt AS (
  SELECT p.prev_ok, p.next_ok, li.l_partkey AS pk
  FROM pairs p JOIN li ON li.l_orderkey = p.next_ok
),
nsize AS (
  SELECT prev_ok, next_ok, count(*)::BIGINT AS n_next
  FROM nxt GROUP BY 1, 2
),
isize AS (
  SELECT n.prev_ok, n.next_ok, count(*)::BIGINT AS n_hit
  FROM nxt n
  WHERE EXISTS (SELECT 1 FROM li
                WHERE li.l_orderkey = n.prev_ok
                  AND li.l_partkey = n.pk)
  GROUP BY 1, 2
),
per_pair AS (
  SELECT round(coalesce(i.n_hit, 0)::DOUBLE / s.n_next::DOUBLE, 12)
           ::DECIMAL(28,12) AS recall
  FROM nsize s LEFT JOIN isize i USING (prev_ok, next_ok)
)
SELECT count(*)::BIGINT AS n_pairs,
       round(sum(recall)::DOUBLE / count(*)::DOUBLE, 6)
         AS mean_repeat_recall
FROM per_pair
"""


def order_aging_sql(bucket_days: int) -> str:
    """WIP-aging twin: identical as-of anchor and integer buckets."""
    return f"""
WITH o AS (
  SELECT o_orderstatus, round(o_totalprice, 2)::DECIMAL(18,2) AS tp,
         epoch_us(o_orderdate) // 86400000000 AS day
  FROM orders
),
anchor AS (SELECT max(day) AS aday FROM o)
SELECT ((anchor.aday - o.day) // {bucket_days})::BIGINT AS age_bucket,
       count(*)::BIGINT AS n_orders,
       round(sum(o.tp)::DOUBLE, 2) AS value
FROM o, anchor WHERE o.o_orderstatus = 'O'
GROUP BY 1 ORDER BY 1
"""


def stopword_plan_sql(ks: tuple) -> str:
    """Stopword-plan twin: identical df ranking and top-k cuts."""
    legs = []
    for k in ks:
        legs.append(f"""
SELECT {k}::INT AS k,
       (SELECT sum(df) FROM ranked WHERE r <= {k})::BIGINT AS dropped,
       (SELECT sum(df) FROM dft)::BIGINT AS total_postings,
       round((SELECT sum(df) FROM ranked WHERE r <= {k})::DOUBLE
             / (SELECT sum(df) FROM dft)::DOUBLE, 6) AS fraction_saved
""")
    return f"""
WITH dft AS (
  SELECT term, count(*)::BIGINT AS df
  FROM (SELECT DISTINCT doc_id, unnest({TOKS}) AS term FROM documents)
  GROUP BY 1
),
ranked AS (
  SELECT df, row_number() OVER (ORDER BY df DESC, term ASC) AS r
  FROM dft
)
{"UNION ALL".join(legs)}
ORDER BY k
"""


def winsorized_mean_sql(lo_p: float, hi_p: float) -> str:
    """Winsorized-mean twin: identical type-7 edges and clipping."""
    return f"""
WITH ev AS (SELECT value::DOUBLE AS v FROM events),
edges AS (
  SELECT quantile_cont(v, {lo_p!r}) AS lo,
         quantile_cont(v, {hi_p!r}) AS hi
  FROM ev
),
clipped AS (
  SELECT v, least(greatest(v, lo), hi) AS w, lo, hi FROM ev, edges
)
SELECT count(*)::BIGINT AS n,
       sum(CASE WHEN v < lo THEN 1 ELSE 0 END)::BIGINT AS n_clipped_low,
       sum(CASE WHEN v > hi THEN 1 ELSE 0 END)::BIGINT
         AS n_clipped_high,
       round(sum(round(v, 6)::DECIMAL(28,6))::DOUBLE
             / count(*)::DOUBLE, 6) AS raw_mean,
       round(sum(round(w, 6)::DECIMAL(28,6))::DOUBLE
             / count(*)::DOUBLE, 6) AS winsorized_mean
FROM clipped
"""


def lag1_coherence_sql(mult: int) -> str:
    """Lag-1 coherence twin: identical consecutive and Knuth pairs,
    6dp cosines re-entering DECIMAL for the means."""
    cos = (
        "round(list_dot_product(a.av, b.bv)"
        " / (sqrt(list_dot_product(a.av, a.av))"
        " * sqrt(list_dot_product(b.bv, b.bv))), 6)"
    )
    return f"""
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
nrow AS (SELECT count(*)::BIGINT AS n FROM emb),
lag AS (
  SELECT count(*)::BIGINT AS n_lag1,
         round(sum(c)::DOUBLE / count(*)::DOUBLE, 6)
           AS lag1_mean_cosine
  FROM (
    SELECT {cos}::DECIMAL(28,12) AS c
    FROM (SELECT vec_id AS a_id, v AS av, vec_id + 1 AS b_id
          FROM emb) a
    JOIN (SELECT vec_id AS b_id, v AS bv FROM emb) b USING (b_id)
  )
),
base AS (
  SELECT count(*)::BIGINT AS n_baseline,
         round(sum(c)::DOUBLE / count(*)::DOUBLE, 6)
           AS baseline_mean_cosine
  FROM (
    SELECT {cos}::DECIMAL(28,12) AS c
    FROM (SELECT vec_id AS a_id, v AS av,
                 ((vec_id % n) * ({mult} % n)) % n AS b_id
          FROM emb, nrow) a
    JOIN (SELECT vec_id AS b_id, v AS bv FROM emb) b USING (b_id)
    WHERE a.a_id <> a.b_id
  )
)
SELECT lag.n_lag1, lag.lag1_mean_cosine,
       base.n_baseline, base.baseline_mean_cosine,
       round(lag.lag1_mean_cosine - base.baseline_mean_cosine, 6)
         AS coherence_gap
FROM lag, base
"""


def dn_retention_sql(offsets: tuple) -> str:
    """Dn-retention twin: identical user-day rollup and offset
    semi-joins."""
    legs = []
    for n in offsets:
        legs.append(f"""
SELECT {n}::INT AS offset_d,
       (SELECT count(*) FROM ud
        WHERE day + {n} <= (SELECT max(day) FROM ud))::BIGINT AS n_base,
       (SELECT count(*) FROM ud a
        WHERE a.day + {n} <= (SELECT max(day) FROM ud)
          AND EXISTS (SELECT 1 FROM ud b
                      WHERE b.user_id = a.user_id
                        AND b.day = a.day + {n}))::BIGINT AS n_retained,
       round((SELECT count(*) FROM ud a
              WHERE a.day + {n} <= (SELECT max(day) FROM ud)
                AND EXISTS (SELECT 1 FROM ud b
                            WHERE b.user_id = a.user_id
                              AND b.day = a.day + {n}))::DOUBLE
             / (SELECT count(*) FROM ud
                WHERE day + {n} <= (SELECT max(day) FROM ud))::DOUBLE, 6)
         AS retention_rate
""")
    return f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
  FROM events
)
{"UNION ALL".join(legs)}
ORDER BY offset_d
"""


def business_day_sql(anchor: int) -> str:
    """Business-day twin: identical integer calendar walk."""
    rem_terms = " + ".join(
        f"(CASE WHEN {i} < (ship_d - ord_d) - ((ship_d - ord_d) // 7) * 7"
        f" AND (((ord_d - {anchor}) % 7 + 7) % 7 + {i}) % 7 < 5"
        f" THEN 1 ELSE 0 END)"
        for i in range(7)
    )
    return f"""
WITH j AS (
  SELECT o.o_orderpriority,
         epoch_us(li.l_shipdate) // 86400000000 AS ship_d,
         epoch_us(o.o_orderdate) // 86400000000 AS ord_d
  FROM lineitem li JOIN orders o ON li.l_orderkey = o.o_orderkey
  WHERE epoch_us(li.l_shipdate) // 86400000000
        >= epoch_us(o.o_orderdate) // 86400000000
),
biz AS (
  SELECT o_orderpriority,
         (((ship_d - ord_d) // 7) * 5 + ({rem_terms}))::DOUBLE
           AS biz_days
  FROM j
)
SELECT o_orderpriority, count(*)::BIGINT AS n_lines,
       round(quantile_cont(biz_days, 0.5), 6) AS p50_biz_days,
       round(quantile_cont(biz_days, 0.9), 6) AS p90_biz_days,
       max(biz_days)::BIGINT AS max_biz_days
FROM biz GROUP BY 1 ORDER BY 1
"""


def divmod_semantics_sql(shift: int) -> str:
    """Divmod-semantics twin: both engines truncate `div` toward zero
    and sign-follow `%` (measured); pmod = ((a % 7) + 7) % 7."""
    return f"""
WITH ev AS (
  SELECT DISTINCT (user_id - {shift})::BIGINT AS a FROM events
),
trip AS (
  SELECT a, (a // 7)::BIGINT AS tdiv, (a % 7)::BIGINT AS srem,
         (((a % 7) + 7) % 7)::BIGINT AS pmod7
  FROM ev
)
SELECT (CASE WHEN a < 0 THEN 'negative' ELSE 'non_negative' END)
         AS bucket,
       count(*)::BIGINT AS n,
       sum(tdiv)::BIGINT AS sum_tdiv,
       sum(srem)::BIGINT AS sum_srem,
       sum(pmod7)::BIGINT AS sum_pmod,
       md5(coalesce(array_to_string(list_sort(list(
             a::VARCHAR || ':' || tdiv::VARCHAR || ':'
             || srem::VARCHAR || ':' || pmod7::VARCHAR)), ','), ''))
         AS witness
FROM trip GROUP BY 1 ORDER BY 1
"""


def padding_waste_sql(batch: int) -> str:
    """Padding-waste twin: identical ntile batching per layout."""
    legs = []
    for lname, order in (
        ("arrival", "doc_id"),
        ("length_sorted", "dl, doc_id"),
    ):
        legs.append(f"""
SELECT '{lname}' AS layout,
       count(*)::BIGINT AS n_batches,
       sum(tok)::BIGINT AS real_tokens,
       sum(bn * mx - tok)::BIGINT AS padded_slots,
       round(sum(bn * mx - tok)::DOUBLE
             / (sum(tok) + sum(bn * mx - tok))::DOUBLE, 6)
         AS waste_frac
FROM (
  SELECT b, count(*)::BIGINT AS bn, max(dl)::BIGINT AS mx,
         sum(dl)::BIGINT AS tok
  FROM (
    SELECT ntile((SELECT (count(*) + {batch - 1}) // {batch}
                  FROM docs)::INT)
             OVER (ORDER BY {order}) AS b, dl
    FROM docs
  ) GROUP BY b
)""")
    return (
        f"WITH docs AS (SELECT doc_id, len({TOKS})::BIGINT AS dl"
        " FROM documents)\n"
        + "\nUNION ALL\n".join(legs)
        + "\nORDER BY layout"
    )


def token_bucket_sql(burst: float, rate: float) -> str:
    """Token-bucket twin as a RECURSIVE CTE walking every user's
    (us, event_id)-ordered timeline in lockstep — NOT a list_reduce
    struct fold: DuckDB's struct-pack lambda accumulator proved
    execution-shape-dependent here (the same user's fold returned
    different admit counts filtered vs unfiltered — vectorized field
    mutation), while the recursive walk is plain scalar arithmetic.
    The refill chain mirrors the Spark fold expression exactly."""
    refill = (
        f"least({burst!r}::DOUBLE,"
        f" w.tok + (q.us - w.us)::DOUBLE / 1000000.0"
        f" * {rate!r}::DOUBLE)"
    )
    return f"""
WITH RECURSIVE seq AS (
  SELECT user_id, epoch_us(ts) AS us,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS i
  FROM events
),
walk AS (
  SELECT user_id, i, us,
         ({burst!r}::DOUBLE - 1.0) AS tok,
         1::BIGINT AS ok, 0::BIGINT AS dropped
  FROM seq WHERE i = 1
  UNION ALL
  SELECT q.user_id, q.i, q.us,
         CASE WHEN {refill} >= 1.0 THEN {refill} - 1.0
              ELSE {refill} END,
         w.ok + (CASE WHEN {refill} >= 1.0 THEN 1 ELSE 0 END),
         w.dropped + (CASE WHEN {refill} >= 1.0 THEN 0 ELSE 1 END)
  FROM walk w JOIN seq q ON q.user_id = w.user_id AND q.i = w.i + 1
),
fin AS (
  SELECT user_id, max_by(ok, i) AS ok, max_by(dropped, i) AS dropped
  FROM walk GROUP BY 1
)
SELECT count(*)::BIGINT AS n_users,
       sum(ok)::BIGINT AS n_allowed,
       sum(dropped)::BIGINT AS n_dropped,
       round(sum(dropped)::DOUBLE
             / (sum(ok) + sum(dropped))::DOUBLE, 6) AS drop_rate
FROM fin
"""


SOURCE_MINHASH_SQL = f"""
WITH {_SHINGLES},
src_sh AS (
  SELECT DISTINCT d.source, sh.shingle
  FROM sh JOIN documents d USING (doc_id)
),
wide AS (
  SELECT source,
         {", ".join(f"min(md5('{i}:' || shingle)) AS s{i}" for i in range(12))},
         count(*)::BIGINT AS n_sh
  FROM src_sh GROUP BY 1
),
pairs AS (
  SELECT a.source AS sa, b.source AS sb, a.n_sh AS na, b.n_sh AS nb,
         round(({" + ".join(f"(CASE WHEN a.s{i} = b.s{i} THEN 1 ELSE 0 END)" for i in range(12))})::DOUBLE
               / 12.0, 6) AS mh_estimate
  FROM wide a JOIN wide b ON a.source < b.source
),
inter AS (
  SELECT x.source AS sa, y.source AS sb, count(*)::BIGINT AS n_inter
  FROM src_sh x JOIN src_sh y
    ON x.shingle = y.shingle AND x.source < y.source
  GROUP BY 1, 2
)
SELECT p.sa, p.sb,
       coalesce(i.n_inter, 0)::BIGINT AS n_inter,
       round(coalesce(i.n_inter, 0)::DOUBLE
             / (p.na + p.nb - coalesce(i.n_inter, 0))::DOUBLE, 6)
         AS exact_jaccard,
       p.mh_estimate
FROM pairs p LEFT JOIN inter i ON i.sa = p.sa AND i.sb = p.sb
ORDER BY p.sa, p.sb
"""


def pinball_sql(q: float) -> str:
    """Pinball-loss twin: identical daily histogram, lags, pinned q."""
    return f"""
WITH {_DAILY_HIST},
lagged AS (
  SELECT n_events AS y,
         lag(n_events, 1) OVER (ORDER BY day) AS p_naive,
         lag(n_events, 7) OVER (ORDER BY day) AS p_snaive
  FROM hist
),
legs AS (
  SELECT 'naive' AS model, (y - p_naive)::DOUBLE AS d FROM lagged
  WHERE p_naive IS NOT NULL
  UNION ALL
  SELECT 'seasonal_naive', (y - p_snaive)::DOUBLE FROM lagged
  WHERE p_snaive IS NOT NULL
),
loss AS (
  SELECT model,
         round(CASE WHEN d >= 0 THEN {q!r}::DOUBLE * d
               ELSE {1.0 - q!r}::DOUBLE * (-d) END, 12)
           ::DECIMAL(28,12) AS l
  FROM legs
)
SELECT model, count(*)::BIGINT AS n_points,
       round(sum(l)::DOUBLE / count(*)::DOUBLE, 6) AS mean_pinball_loss
FROM loss GROUP BY 1 ORDER BY 1
"""

# ---- batch 110: nonparametric test trio ------------------------------------

ORACLES["kruskal_wallis_h"] = """
WITH per AS (
  SELECT event_type, value, count(*)::BIGINT AS c FROM events GROUP BY 1, 2
),
pooled AS (
  SELECT value AS v, sum(c)::BIGINT AS t FROM per GROUP BY 1
),
ranked AS (
  SELECT v, t,
         2 * (sum(t) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t)
           + t + 1 AS r2
  FROM pooled
),
grp AS (
  SELECT event_type, sum(c)::BIGINT AS n_g, sum(c * r2)::BIGINT AS rg2
  FROM per JOIN ranked ON per.value = ranked.v
  GROUP BY 1
),
ties AS (
  SELECT sum(t * t * t - t)::BIGINT AS tie3 FROM pooled
),
agg AS (
  SELECT count(*)::BIGINT AS n_groups, sum(n_g)::BIGINT AS n,
         sum(round(rg2::DOUBLE * rg2::DOUBLE / n_g::DOUBLE, 6)
             ::DECIMAL(38,6)) AS s
  FROM grp
)
SELECT n_groups, n,
       round(3.0 * s::DOUBLE / (n::DOUBLE * (n::DOUBLE + 1.0))
             - 3.0 * (n::DOUBLE + 1.0), 6) AS h,
       round((3.0 * s::DOUBLE / (n::DOUBLE * (n::DOUBLE + 1.0))
              - 3.0 * (n::DOUBLE + 1.0))
             / (1.0 - tie3::DOUBLE
                      / (n::DOUBLE * n::DOUBLE * n::DOUBLE - n::DOUBLE)),
             6) AS h_corrected
FROM agg, ties
"""

ORACLES["mcnemar_paired_days"] = """
WITH ud AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS a,
         max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS b
  FROM events GROUP BY 1, 2
),
cells AS (
  SELECT count(*)::BIGINT AS n_pairs,
         sum(a * b)::BIGINT AS n11,
         sum(a * (1 - b))::BIGINT AS n10,
         sum((1 - a) * b)::BIGINT AS n01,
         sum((1 - a) * (1 - b))::BIGINT AS n00
  FROM ud
)
SELECT n_pairs, n11, n10, n01, n00,
       round(CASE WHEN n10 + n01 > 0
                  THEN (abs(n10 - n01)::DOUBLE - 1.0)
                       * (abs(n10 - n01)::DOUBLE - 1.0)
                       / (n10 + n01)::DOUBLE
                  ELSE 0.0 END, 6) AS chi2_cc
FROM cells
"""

ORACLES["cliffs_delta_effect"] = """
WITH per AS (
  SELECT event_type, value, count(*)::BIGINT AS c
  FROM events WHERE event_type IN ('purchase', 'click')
  GROUP BY 1, 2
),
pooled AS (
  SELECT value AS v,
         coalesce(sum(CASE WHEN event_type = 'purchase' THEN c END), 0)
           ::BIGINT AS ta,
         coalesce(sum(CASE WHEN event_type = 'click' THEN c END), 0)
           ::BIGINT AS tb
  FROM per GROUP BY 1
),
ranked AS (
  SELECT ta, tb, ta + tb AS t,
         2 * (sum(ta + tb) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - (ta + tb)) + (ta + tb) + 1 AS r2
  FROM pooled
),
agg AS (
  SELECT sum(ta)::BIGINT AS n_a, sum(tb)::BIGINT AS n_b,
         sum(ta * r2)::BIGINT AS ra2
  FROM ranked
),
d AS (
  SELECT n_a, n_b,
         round((ra2 - n_a * (n_a + 1) - n_a * n_b)::DOUBLE
               / (n_a * n_b)::DOUBLE, 6) AS delta
  FROM agg
)
SELECT n_a, n_b, delta,
       CASE WHEN abs(delta) < 0.147 THEN 'negligible'
            WHEN abs(delta) < 0.33 THEN 'small'
            WHEN abs(delta) < 0.474 THEN 'medium'
            ELSE 'large' END AS magnitude
FROM d
"""

# ---- batch 111: ratio delta-method, SRM, Yule's K ---------------------------

_ARM = "(CASE WHEN " + _MD5_52 + " % 2 = 0 THEN 'A' ELSE 'B' END)"

ORACLES["ratio_metric_delta_method"] = f"""
WITH per AS (
  SELECT user_id,
         coalesce(sum(CASE WHEN event_type = 'purchase'
                           THEN round(value, 2)::DECIMAL(18,2) END),
                  0)::DECIMAL(18,2) AS y,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1
),
g AS (
  SELECT {_ARM.format(e="user_id::VARCHAR || ':ratio'")} AS arm,
         count(*)::BIGINT AS u, sum(y) AS sy, sum(n)::BIGINT AS sn,
         sum(y * y) AS syy, sum(n * n)::BIGINT AS snn, sum(y * n) AS syn
  FROM per GROUP BY 1
),
arms AS (
  SELECT arm, u,
         round(sy::DOUBLE / sn::DOUBLE, 6) AS ratio,
         round(sqrt(((syy::DOUBLE / u::DOUBLE
                      - (sy::DOUBLE / u::DOUBLE) * (sy::DOUBLE / u::DOUBLE))
                     - 2.0 * (sy::DOUBLE / sn::DOUBLE)
                           * (syn::DOUBLE / u::DOUBLE
                              - (sy::DOUBLE / u::DOUBLE)
                                * (sn::DOUBLE / u::DOUBLE))
                     + (sy::DOUBLE / sn::DOUBLE) * (sy::DOUBLE / sn::DOUBLE)
                       * (snn::DOUBLE / u::DOUBLE
                          - (sn::DOUBLE / u::DOUBLE)
                            * (sn::DOUBLE / u::DOUBLE)))
                    / (u::DOUBLE * (sn::DOUBLE / u::DOUBLE)
                       * (sn::DOUBLE / u::DOUBLE))), 6) AS se
  FROM g
),
one AS (
  SELECT max(CASE WHEN arm = 'A' THEN u END) AS n_a,
         max(CASE WHEN arm = 'B' THEN u END) AS n_b,
         max(CASE WHEN arm = 'A' THEN ratio END) AS ratio_a,
         max(CASE WHEN arm = 'B' THEN ratio END) AS ratio_b,
         max(CASE WHEN arm = 'A' THEN se END) AS se_a,
         max(CASE WHEN arm = 'B' THEN se END) AS se_b
  FROM arms
)
SELECT n_a, n_b, ratio_a, ratio_b, se_a, se_b,
       round((ratio_a - ratio_b) / sqrt(se_a * se_a + se_b * se_b), 4) AS z
FROM one
"""

ORACLES["srm_check"] = f"""
WITH g AS (
  SELECT {_ARM.format(e="user_id::VARCHAR || ':srm'")} AS arm,
         count(*)::BIGINT AS n
  FROM (SELECT DISTINCT user_id FROM events) GROUP BY 1
),
one AS (
  SELECT max(CASE WHEN arm = 'A' THEN n END) AS n_a,
         max(CASE WHEN arm = 'B' THEN n END) AS n_b
  FROM g
)
SELECT n_a, n_b,
       round((n_a - n_b)::DOUBLE * (n_a - n_b)::DOUBLE
             / (n_a + n_b)::DOUBLE, 6) AS chi2,
       round((n_a - n_b)::DOUBLE * (n_a - n_b)::DOUBLE
             / (n_a + n_b)::DOUBLE, 6) > 3.841459 AS srm_flag
FROM one
"""

ORACLES["yules_k_by_source"] = f"""
WITH toks AS (
  SELECT source, unnest({TOKS}) AS term FROM documents
),
per_src AS (
  SELECT source, term, count(*)::BIGINT AS cf FROM toks GROUP BY 1, 2
),
src_rows AS (
  SELECT source, count(*)::BIGINT AS vocab, sum(cf)::BIGINT AS n_tokens,
         sum(cf * cf)::BIGINT AS s2
  FROM per_src GROUP BY 1
),
corpus AS (
  SELECT '(corpus)' AS source, count(*)::BIGINT AS vocab,
         sum(cf)::BIGINT AS n_tokens, sum(cf * cf)::BIGINT AS s2
  FROM (SELECT term, count(*)::BIGINT AS cf FROM toks GROUP BY 1)
)
SELECT source, n_tokens, vocab,
       round(10000.0 * (s2::DOUBLE - n_tokens::DOUBLE)
             / (n_tokens::DOUBLE * n_tokens::DOUBLE), 6) AS yules_k
FROM (SELECT * FROM src_rows UNION ALL SELECT * FROM corpus)
ORDER BY source
"""

# ---- batch 112: link prediction (CN/Jaccard/AA/RA) + truncated Katz --------

_AFFINITY_EDGES = """
li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
edges AS (
  SELECT a.p AS pa, b.p AS pb
  FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= 2
)"""

ORACLES["link_prediction_scores"] = f"""
WITH {_AFFINITY_EDGES},
deg AS (
  SELECT node, count(*)::BIGINT AS d
  FROM (SELECT pa AS node FROM edges UNION ALL SELECT pb FROM edges)
  GROUP BY 1
),
nbrs AS (
  SELECT node, nbr, d
  FROM (SELECT pa AS node, pb AS nbr FROM edges
        UNION ALL SELECT pb, pa FROM edges)
  JOIN deg USING (node) WHERE d <= 4096
),
wedges AS (
  SELECT x.nbr AS u, y.nbr AS v, x.d AS dw
  FROM nbrs x JOIN nbrs y ON x.node = y.node AND x.nbr < y.nbr
),
pairs AS (
  SELECT u, v, count(*)::BIGINT AS cn,
         sum(round(1.0 / ln(dw::DOUBLE), 12)::DECIMAL(28,12)) AS aa,
         sum(round(1.0 / dw::DOUBLE, 12)::DECIMAL(28,12)) AS ra
  FROM wedges GROUP BY 1, 2
),
cand AS (
  SELECT p.* FROM pairs p
  ANTI JOIN edges e ON p.u = e.pa AND p.v = e.pb
),
scored AS (
  SELECT u, v, cn,
         round(cn::DOUBLE / (du.d + dv.d - cn)::DOUBLE, 6) AS jaccard,
         aa, ra
  FROM cand JOIN deg du ON cand.u = du.node JOIN deg dv ON cand.v = dv.node
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY aa DESC, u, v) AS rank FROM scored
)
SELECT rank, u, v, cn, jaccard,
       round(aa::DOUBLE, 6) AS adamic_adar,
       round(ra::DOUBLE, 6) AS resource_alloc
FROM ranked WHERE rank <= 20
"""

ORACLES["katz_index_pairs"] = f"""
WITH {_AFFINITY_EDGES},
nbrs AS (
  SELECT pa AS s, pb AS t FROM edges UNION ALL SELECT pb, pa FROM edges
),
a2 AS (
  SELECT x.s AS u, y.t AS v, count(*)::BIGINT AS w2
  FROM nbrs x JOIN nbrs y ON x.t = y.s GROUP BY 1, 2
),
a3 AS (
  SELECT a2.u AS u, y.t AS v, sum(w2)::BIGINT AS w3
  FROM a2 JOIN nbrs y ON a2.v = y.s GROUP BY 1, 2
),
walks AS (
  SELECT coalesce(a2.u, a3.u) AS u, coalesce(a2.v, a3.v) AS v,
         coalesce(w2, 0)::BIGINT AS w2, coalesce(w3, 0)::BIGINT AS w3
  FROM a2 FULL JOIN a3 ON a2.u = a3.u AND a2.v = a3.v
),
cand AS (
  SELECT w.* FROM (SELECT * FROM walks WHERE u < v) w
  ANTI JOIN edges e ON w.u = e.pa AND w.v = e.pb
),
ranked AS (
  SELECT u, v, w2, w3, w2 * 2500 + w3 * 125 AS kz,
         row_number() OVER (ORDER BY w2 * 2500 + w3 * 125 DESC, u, v) AS rank
  FROM cand
)
SELECT rank, u, v, w2, w3, kz::DOUBLE / 1000000.0 AS katz
FROM ranked WHERE rank <= 20
"""

# ---- batch 113: MoR delete amplification + frame semantics gate -------------

ORACLES["merge_on_read_amplification"] = f"""
WITH d AS (
  SELECT doc_id // 64 AS file_id,
         CASE WHEN {_MD5_52.format(e="doc_id::VARCHAR || ':mordel'")} * 20
                   < 13510798882111488 THEN 1 ELSE 0 END AS del
  FROM documents
),
g AS (
  SELECT file_id, count(*)::BIGINT AS n_rows, sum(del)::BIGINT AS n_deleted
  FROM d GROUP BY 1
)
SELECT file_id, n_rows, n_deleted,
       (n_rows - n_deleted)::BIGINT AS n_live,
       round(n_deleted::DOUBLE / n_rows::DOUBLE, 6) AS delete_frac,
       round(CASE WHEN n_rows - n_deleted > 0
                  THEN n_rows::DOUBLE / (n_rows - n_deleted)::DOUBLE END,
             6) AS read_amplification,
       round(n_deleted::DOUBLE / n_rows::DOUBLE, 6) >= 0.25 AS rewrite_flag
FROM g ORDER BY file_id
"""

ORACLES["range_rows_frame_gate"] = """
WITH li AS (
  SELECT l_quantity, l_orderkey, l_linenumber,
         round(l_extendedprice, 2)::DECIMAL(18,2) AS p
  FROM lineitem
  WHERE l_shipdate >= '2000-03-01' AND l_shipdate <= '2000-03-31'
),
cum AS (
  SELECT
    sum(p) OVER (ORDER BY l_quantity, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS rows_cum,
    sum(p) OVER (ORDER BY l_quantity
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS range_cum,
    count(*) OVER (PARTITION BY l_quantity) AS n_peers
  FROM li
)
SELECT count(*)::BIGINT AS n_rows,
       sum(CASE WHEN n_peers > 1 THEN 1 ELSE 0 END)::BIGINT AS n_peer_rows,
       sum(CASE WHEN range_cum <> rows_cum THEN 1 ELSE 0 END)::BIGINT
         AS n_differing,
       max(range_cum - rows_cum)::DOUBLE AS max_gap
FROM cum
"""

# ---- batch 114: Fisher exact 2x2, BH-FDR step-up, HITS authorities --------

# exact BIGINT binomial via the same always-divisible fold as the Spark side
_BINOM_DUCK = (
    "(CASE WHEN {r} <= 0 OR {r} >= {n} THEN"
    " (CASE WHEN {r} = 0 OR {r} = {n} THEN 1 ELSE 0 END)"
    " ELSE list_reduce(list_prepend(1::BIGINT,"
    " range(1, least({r}, {n} - {r}) + 1)),"
    " (acc, i) -> acc * ({n} - least({r}, {n} - {r}) + i) // i) END)::BIGINT"
)

ORACLES["fisher_exact_2x2"] = f"""
WITH toks AS (
  SELECT source, doc_id, unnest({TOKS}) AS term FROM documents
),
per AS (
  SELECT source, count(DISTINCT term)::BIGINT AS vocab,
         count(*)::BIGINT AS n_tokens,
         count(DISTINCT doc_id)::BIGINT AS n_docs
  FROM toks GROUP BY 1
),
tot AS (
  SELECT count(*)::BIGINT AS s, sum(vocab)::BIGINT AS tv,
         sum(n_tokens)::BIGINT AS tt, sum(n_docs)::BIGINT AS td
  FROM per
),
flags AS (
  SELECT (vocab * s > tv) AS fa,
         (n_tokens * td > tt * n_docs) AS fb
  FROM per CROSS JOIN tot
),
cells AS (
  SELECT sum(CASE WHEN fa AND fb THEN 1 ELSE 0 END)::BIGINT AS n_hh,
         sum(CASE WHEN fa AND NOT fb THEN 1 ELSE 0 END)::BIGINT AS n_hl,
         sum(CASE WHEN NOT fa AND fb THEN 1 ELSE 0 END)::BIGINT AS n_lh,
         sum(CASE WHEN NOT fa AND NOT fb THEN 1 ELSE 0 END)::BIGINT AS n_ll
  FROM flags
),
m AS (
  SELECT n_hh, n_hl, n_lh, n_ll,
         n_hh + n_hl AS r1, n_lh + n_ll AS r2,
         n_hh + n_lh AS kk, n_hh + n_hl + n_lh + n_ll AS nn,
         {_BINOM_DUCK.format(n="n_hh + n_hl", r="n_hh")}
           * {_BINOM_DUCK.format(n="n_lh + n_ll", r="n_lh")} AS w_obs
  FROM cells
),
enum AS (
  SELECT m.*, unnest(range(greatest(0, kk - r2), least(r1, kk) + 1)) AS x
  FROM m
),
wts AS (
  SELECT *, {_BINOM_DUCK.format(n="r1", r="x")}
              * {_BINOM_DUCK.format(n="r2", r="(kk - x)")} AS w
  FROM enum
)
SELECT n_hh, n_hl, n_lh, n_ll, nn AS n_total,
       sum(w)::BIGINT AS w_total,
       round(sum(CASE WHEN w <= w_obs THEN w ELSE 0 END)::DOUBLE
             / sum(w)::DOUBLE, 9) AS p_two_sided,
       max(CASE WHEN n_hl * n_lh > 0
                THEN round((n_hh * n_ll)::DOUBLE / (n_hl * n_lh)::DOUBLE, 6)
           END) AS odds_ratio
FROM wts GROUP BY 1, 2, 3, 4, 5, w_obs
"""

ORACLES["bh_fdr_procedure"] = f"""
WITH src AS (SELECT DISTINCT source FROM documents),
d1 AS (
  SELECT source,
         {_MD5_52.format(e="source || ':bhfdr'")} AS u,
         ({_MD5_52.format(e="source || ':bhsig'")} * 4
            < 4503599627370496) AS planted
  FROM src
),
d2 AS (
  SELECT source, u, planted,
         CASE WHEN planted THEN 4503599627370496000
              ELSE 4503599627370496 END AS den,
         u * CASE WHEN planted THEN 1 ELSE 1000 END AS ord_key
  FROM d1
),
d3 AS (
  SELECT source, planted,
         row_number() OVER (ORDER BY ord_key, source) AS i,
         count(*) OVER () AS m,
         u::DOUBLE / den::DOUBLE AS p
  FROM d2
),
d4 AS (
  SELECT *, (0.1 * i::DOUBLE) / m::DOUBLE AS thr,
         CASE WHEN u_le THEN i END AS hit_i
  FROM (SELECT *, p <= (0.1 * i::DOUBLE) / m::DOUBLE AS u_le FROM d3)
),
d5 AS (
  SELECT *, max(hit_i) OVER () AS kstar,
         least(1.0, min((p * m::DOUBLE) / i::DOUBLE)
               OVER (ORDER BY i
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
           AS p_adj_raw
  FROM d4
)
SELECT source, round(p, 12) AS p_value, i AS rank_i,
       round(thr, 12) AS bh_threshold, round(p_adj_raw, 12) AS p_adj,
       planted, i <= coalesce(kstar, 0) AS rejected
FROM d5 ORDER BY rank_i
"""

_HITS_A_STEP = """
a{it}r AS (
  SELECT term, sum(h) AS ar FROM edges JOIN h{prev} USING (doc_id) GROUP BY 1
),
a{it} AS (
  SELECT term, round(ar::DOUBLE / (SELECT max(ar) FROM a{it}r)::DOUBLE,
                     12)::DECIMAL(28,12) AS a
  FROM a{it}r
)"""

_HITS_H_STEP = """
h{it}r AS (
  SELECT doc_id, sum(a) AS hr FROM edges JOIN a{it} USING (term) GROUP BY 1
),
h{it} AS (
  SELECT doc_id, round(hr::DOUBLE / (SELECT max(hr) FROM h{it}r)::DOUBLE,
                       12)::DECIMAL(28,12) AS h
  FROM h{it}r
)"""

ORACLES["hits_authority_3iter"] = f"""
WITH edges AS (
  SELECT DISTINCT doc_id, unnest({TOKS}) AS term FROM documents
),
h0 AS (
  SELECT DISTINCT doc_id, 1.000000000000::DECIMAL(28,12) AS h FROM edges
),{_HITS_A_STEP.format(it=1, prev=0)},{_HITS_H_STEP.format(it=1)},
{_HITS_A_STEP.format(it=2, prev=1)},{_HITS_H_STEP.format(it=2)},
{_HITS_A_STEP.format(it=3, prev=2)}
SELECT term, auth_score, rank FROM (
  SELECT term, a::DOUBLE AS auth_score,
         row_number() OVER (ORDER BY a DESC, term ASC) AS rank
  FROM a3
) WHERE rank <= 10 ORDER BY rank
"""

# ---- batch 115: Kneser-Ney bigram, Gunning fog, MATTR ----------------------

from lucene_mapreduce_spark.operators.textstats import (  # noqa: E402
    KN_SENTENCE,
    MATTR_WINDOW,
)

_KN_WORDS = KN_SENTENCE.split()
_KN_VALUES = ", ".join(
    f"({i + 1}, '{_KN_WORDS[i]}', '{_KN_WORDS[i + 1]}')"
    for i in range(len(_KN_WORDS) - 1)
)

ORACLES["kneser_ney_bigram_logprob"] = f"""
WITH toks AS (SELECT {TOKS} AS ts FROM documents),
bi AS (
  SELECT ts[i - 1] AS w1, ts[i] AS w2
  FROM (SELECT ts, unnest(range(2, len(ts) + 1)) AS i
        FROM toks WHERE len(ts) >= 2)
),
c12 AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM bi GROUP BY 1, 2),
c1 AS (
  SELECT w1, sum(c12)::BIGINT AS c1, count(*)::BIGINT AS n1p_fwd
  FROM c12 GROUP BY 1
),
n1b AS (SELECT w2, count(*)::BIGINT AS n1p_bwd FROM c12 GROUP BY 1),
tt AS (SELECT count(*)::BIGINT AS t_types FROM c12),
sent(pos, w1, w2) AS (VALUES {_KN_VALUES}),
j AS (
  SELECT pos, s.w1, s.w2,
         coalesce(c12.c12, 0)::BIGINT AS c12,
         coalesce(c1.c1, 0)::BIGINT AS c1,
         coalesce(c1.n1p_fwd, 0)::BIGINT AS n1p_fwd,
         coalesce(n1b.n1p_bwd, 0)::BIGINT AS n1p_bwd,
         t_types
  FROM sent s
  LEFT JOIN c12 ON s.w1 = c12.w1 AND s.w2 = c12.w2
  LEFT JOIN c1 ON s.w1 = c1.w1
  LEFT JOIN n1b ON s.w2 = n1b.w2
  CROSS JOIN tt
),
p AS (
  SELECT *,
         CASE WHEN c1 > 0
              THEN greatest(c12::DOUBLE - 0.75, 0.0) / c1::DOUBLE
                   + (0.75 * n1p_fwd::DOUBLE / c1::DOUBLE)
                     * (n1p_bwd::DOUBLE / t_types::DOUBLE)
              ELSE n1p_bwd::DOUBLE / t_types::DOUBLE END AS pkn
  FROM j
)
SELECT pos, w1, w2, c12, c1, n1p_fwd, n1p_bwd,
       round(pkn, 9) AS p_kn,
       CASE WHEN pkn > 0 THEN round(ln(pkn), 9) END AS lp
FROM p ORDER BY pos
"""

_FOG_CX = (
    f"len(list_filter(list_transform({TOKS},"
    " t -> len(regexp_extract_all(lower(t), '[aeiouy]+'))),"
    " n -> n >= 3))"
)

ORACLES["gunning_fog_index"] = f"""
WITH per_doc AS (
  SELECT source,
         len({TOKS})::BIGINT AS w,
         greatest(1, len(regexp_extract_all(lower(text), '[.!?]+')))::BIGINT
           AS s,
         {_FOG_CX}::BIGINT AS cx
  FROM documents WHERE len({TOKS}) > 0
),
rolled AS (
  SELECT source, sum(w)::BIGINT AS n_words, sum(s)::BIGINT AS n_sentences,
         sum(cx)::BIGINT AS n_complex
  FROM per_doc GROUP BY 1
  UNION ALL
  SELECT '(corpus)', sum(w)::BIGINT, sum(s)::BIGINT, sum(cx)::BIGINT
  FROM per_doc
)
SELECT source, n_words, n_sentences, n_complex,
       round(0.4 * (n_words::DOUBLE / n_sentences::DOUBLE
                    + (100.0 * n_complex::DOUBLE) / n_words::DOUBLE), 6)
         AS fog
FROM rolled ORDER BY source
"""

_MW = MATTR_WINDOW

ORACLES["mattr_lexical_diversity"] = f"""
WITH pos AS (
  SELECT doc_id, source, len({TOKS})::BIGINT AS dl,
         unnest({TOKS}) AS term,
         unnest(range(1, len({TOKS}) + 1)) AS j
  FROM documents WHERE len({TOKS}) >= {_MW}
),
iv AS (
  SELECT doc_id, source, dl,
         greatest({_MW}, j,
                  coalesce(lag(j) OVER (PARTITION BY doc_id, term
                                        ORDER BY j) + {_MW}, 0)) AS lo,
         least(dl, j + {_MW - 1}) AS hi
  FROM pos
),
per_doc AS (
  SELECT doc_id, source, dl,
         sum(greatest(hi - lo + 1, 0))::BIGINT AS s_distinct
  FROM iv GROUP BY 1, 2, 3
)
SELECT source, count(*)::BIGINT AS n_docs_windowed,
       round(sum(round(s_distinct::DOUBLE
                       / ((dl - {_MW} + 1) * {_MW})::DOUBLE,
                       12)::DECIMAL(28,12))::DOUBLE
             / count(*)::DOUBLE, 6) AS mattr
FROM per_doc GROUP BY 1 ORDER BY source
"""

# ---- batch 116: power-law MLE, Mantel-Haenszel OR, Brown-Forsythe ----------

ORACLES["degree_powerlaw_mle"] = """
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
e AS (
  SELECT a.p AS pa, b.p AS pb
  FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= 2
),
deg AS (
  SELECT node, count(*)::BIGINT AS d FROM (
    SELECT pa AS node FROM e UNION ALL SELECT pb FROM e
  ) GROUP BY 1
),
s AS (
  SELECT min(d)::BIGINT AS d_min, max(d)::BIGINT AS d_max,
         count(*)::BIGINT AS n_nodes
  FROM deg
),
terms AS (
  SELECT n_nodes, d_min, d_max,
         round(ln(d::DOUBLE / (d_min::DOUBLE - 0.5)),
               12)::DECIMAL(28,12) AS lt
  FROM deg CROSS JOIN s
),
g AS (
  SELECT n_nodes, d_min, d_max, sum(lt) AS sum_log
  FROM terms GROUP BY 1, 2, 3
)
SELECT n_nodes, d_min, d_max,
       round(sum_log::DOUBLE, 9) AS sum_log,
       round(1.0 + n_nodes::DOUBLE / sum_log::DOUBLE, 6) AS alpha
FROM g
"""

ORACLES["mantel_haenszel_or"] = f"""
WITH t AS (
  SELECT lang,
         list_contains({TOKS}, 'fast') AS e,
         list_contains({TOKS}, 'slow') AS o
  FROM documents
),
cells AS (
  SELECT lang,
         sum(CASE WHEN e AND o THEN 1 ELSE 0 END)::BIGINT AS n11,
         sum(CASE WHEN e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS n10,
         sum(CASE WHEN NOT e AND o THEN 1 ELSE 0 END)::BIGINT AS n01,
         sum(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS n00
  FROM t GROUP BY 1
),
per AS (
  SELECT lang AS stratum, n11, n10, n01, n00,
         CASE WHEN n10 * n01 > 0
              THEN round((n11 * n00)::DOUBLE / (n10 * n01)::DOUBLE, 6)
         END AS or_value
  FROM cells
),
pooled AS (
  SELECT '(pooled)' AS stratum,
         sum(n11)::BIGINT AS n11, sum(n10)::BIGINT AS n10,
         sum(n01)::BIGINT AS n01, sum(n00)::BIGINT AS n00,
         round(
           sum(round((n11 * n00)::DOUBLE
                     / (n11 + n10 + n01 + n00)::DOUBLE,
                     12)::DECIMAL(28,12))::DOUBLE
           / sum(round((n10 * n01)::DOUBLE
                       / (n11 + n10 + n01 + n00)::DOUBLE,
                       12)::DECIMAL(28,12))::DOUBLE, 6) AS or_value
  FROM cells
)
SELECT * FROM (SELECT * FROM per UNION ALL SELECT * FROM pooled)
ORDER BY stratum
"""

ORACLES["brown_forsythe_test"] = """
WITH ev AS (
  SELECT event_type, round(value, 6) AS v FROM events
),
med AS (
  SELECT event_type, quantile_cont(v, 0.5) AS med FROM ev GROUP BY 1
),
rows_z AS (
  SELECT ev.event_type,
         round(abs(v - med), 6)::DECIMAL(18,6) AS z,
         round(round(abs(v - med), 6) * round(abs(v - med), 6),
               6)::DECIMAL(28,6) AS zz
  FROM ev JOIN med USING (event_type)
),
g AS (
  SELECT event_type, count(*)::BIGINT AS n, sum(z) AS sz, sum(zz) AS szz
  FROM rows_z GROUP BY 1
),
pooled AS (
  SELECT n, sz, szz,
         count(*) OVER ()::BIGINT AS k,
         sum(n) OVER ()::BIGINT AS n_tot,
         sum(sz) OVER ()::DOUBLE AS sz_tot
  FROM g
),
terms AS (
  SELECT k, n_tot,
         round(n::DOUBLE
               * ((sz::DOUBLE / n::DOUBLE) - (sz_tot / n_tot::DOUBLE))
               * ((sz::DOUBLE / n::DOUBLE) - (sz_tot / n_tot::DOUBLE)),
               6)::DECIMAL(28,6) AS ssb_t,
         round(szz::DOUBLE
               - n::DOUBLE * (sz::DOUBLE / n::DOUBLE)
                 * (sz::DOUBLE / n::DOUBLE), 6)::DECIMAL(28,6) AS ssw_t
  FROM pooled
),
fin AS (
  SELECT k, n_tot, sum(ssb_t) AS ssb, sum(ssw_t) AS ssw
  FROM terms GROUP BY 1, 2
)
SELECT k, n_tot,
       (k - 1)::BIGINT AS df1, (n_tot - k)::BIGINT AS df2,
       round((ssb::DOUBLE / (k - 1)::DOUBLE)
             / (ssw::DOUBLE / (n_tot - k)::DOUBLE), 6) AS f_stat
FROM fin
"""

# ---- batch 117: Ljung-Box Q, sign-flip permutation, Theil's U2 -------------

ORACLES["ljung_box_q"] = f"""
WITH {_DAILY_HIST},
idx AS (
  SELECT row_number() OVER (ORDER BY day) AS i, n_events::BIGINT AS x
  FROM hist
),
g AS (
  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS s,
         sum(x * x)::BIGINT AS ss
  FROM idx
),
lags AS (SELECT unnest(range(1, 8))::INT AS lag),
per AS (
  SELECT l.lag, count(*)::BIGINT AS n_pairs,
         sum(h1.x * h2.x)::BIGINT AS sxy,
         sum(h1.x)::BIGINT AS sh, sum(h2.x)::BIGINT AS st
  FROM lags l
  JOIN idx h1 ON true
  JOIN idx h2 ON h2.i = h1.i + l.lag
  GROUP BY 1
),
rhos AS (
  SELECT lag, n_pairs, n,
         (sxy::DOUBLE
          - (s::DOUBLE / n::DOUBLE) * (sh + st)::DOUBLE
          + n_pairs::DOUBLE * (s::DOUBLE / n::DOUBLE)
            * (s::DOUBLE / n::DOUBLE))
         / (ss::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE) AS rho
  FROM per, g
),
terms AS (
  SELECT lag, n_pairs, n, round(rho, 6) AS rho,
         round((rho * rho) / (n::DOUBLE - lag::DOUBLE),
               12)::DECIMAL(28,12) AS t12
  FROM rhos
)
SELECT lag, n_pairs, rho,
       round((n::DOUBLE * (n::DOUBLE + 2.0))
             * sum(t12) OVER (ORDER BY lag
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW)::DOUBLE, 6) AS q_stat
FROM terms ORDER BY lag
"""

ORACLES["permutation_test_signflip"] = f"""
WITH ev AS (
  SELECT user_id, round(value, 6)::DECIMAL(18,6) AS v,
         ((ts::DATE - DATE '1970-01-01') % 2 = 0) AS even
  FROM events
),
d AS (
  SELECT user_id,
         (sum(CASE WHEN even THEN v ELSE 0 END)
          - sum(CASE WHEN NOT even THEN v ELSE 0 END))::DECIMAL(18,6) AS d
  FROM ev GROUP BY 1
),
obs AS (
  SELECT sum(d)::DECIMAL(38,6) AS t_obs, count(*)::BIGINT AS n_units FROM d
),
b AS (SELECT unnest(range(1, {128 + 1}))::INT AS b),
flips AS (
  SELECT b,
         CASE WHEN {_MD5_52.format(
             e="user_id::VARCHAR || ':' || b::VARCHAR || ':sgnflip'")} * 2
                   < 4503599627370496
              THEN d ELSE -d END AS sd
  FROM d CROSS JOIN b
),
perms AS (
  SELECT b, sum(sd)::DECIMAL(38,6) AS t_b FROM flips GROUP BY 1
),
ext AS (
  SELECT max(n_units)::BIGINT AS n_units, count(*)::BIGINT AS b_perms,
         max(t_obs::DOUBLE) AS t_obs_d,
         sum(CASE WHEN abs(t_b) >= abs(t_obs) THEN 1 ELSE 0 END)::BIGINT
           AS n_extreme
  FROM perms CROSS JOIN obs
)
SELECT n_units, b_perms, round(t_obs_d, 6) AS t_obs, n_extreme,
       round((1.0 + n_extreme::DOUBLE) / (b_perms::DOUBLE + 1.0), 6)
         AS p_value
FROM ext
"""

ORACLES["theil_u2_forecast"] = """
WITH daily AS (
  SELECT ts::DATE AS day,
         sum(round(value, 6)::DECIMAL(18,6)) AS rev
  FROM events GROUP BY 1
),
idx AS (
  SELECT day, rev::DOUBLE AS a,
         lag(rev::DOUBLE, 1) OVER (ORDER BY day) AS a1,
         lag(rev::DOUBLE, 7) OVER (ORDER BY day) AS f
  FROM daily
),
usable AS (
  SELECT * FROM idx WHERE f IS NOT NULL AND a1 <> 0.0
),
terms AS (
  SELECT round(((f - a) / a1) * ((f - a) / a1), 12)::DECIMAL(28,12)
           AS e_model,
         round(((a - a1) / a1) * ((a - a1) / a1), 12)::DECIMAL(28,12)
           AS e_naive
  FROM usable
)
SELECT (SELECT count(*)::BIGINT FROM daily) AS n_days,
       count(*)::BIGINT AS n_terms,
       round(sum(e_model)::DOUBLE, 9) AS ss_model,
       round(sum(e_naive)::DOUBLE, 9) AS ss_naive,
       round(sqrt(sum(e_model)::DOUBLE / sum(e_naive)::DOUBLE), 6) AS u2
FROM terms
"""

# ---- batch 118: hex grid, metric rank agreement, NDV sketch audit ----------

from lucene_mapreduce_spark.operators.textstats import (  # noqa: E402
    _HLL_ALPHA_NUM,
    _HLL_M,
    _NEG_THIRD,
    _SQRT3_INV,
    _TWO_THIRDS,
    HEX_SIZE_DEG,
    NDV_AUDIT_COLUMNS,
)

_HEX_BASE = f"""
base AS (
  SELECT (({_MD5_52.format(e="doc_id::VARCHAR || ':lat'")}) % 1800001)::DOUBLE
           / 10000.0 - 90.0 AS lat,
         (({_MD5_52.format(e="doc_id::VARCHAR || ':lon'")}) % 3600001)::DOUBLE
           / 10000.0 - 180.0 AS lon
  FROM documents
)"""

ORACLES["geohex_grid_agg"] = f"""
WITH {_HEX_BASE},
proj AS (
  SELECT ({_TWO_THIRDS!r} * lon) / {float(HEX_SIZE_DEG)!r} AS qf,
         (({_NEG_THIRD!r} * lon) + ({_SQRT3_INV!r} * lat))
           / {float(HEX_SIZE_DEG)!r} AS rf
  FROM base
),
fr AS (
  SELECT qf, rf, -qf - rf AS yf,
         floor(qf + 0.5)::BIGINT AS rx,
         floor(-qf - rf + 0.5)::BIGINT AS ry,
         floor(rf + 0.5)::BIGINT AS rz
  FROM proj
),
d AS (
  SELECT rx, ry, rz,
         abs(rx::DOUBLE - qf) AS dx,
         abs(ry::DOUBLE - yf) AS dy,
         abs(rz::DOUBLE - rf) AS dz
  FROM fr
),
keyed AS (
  SELECT (CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END)::VARCHAR
         || ':' ||
         (CASE WHEN NOT (dx > dy AND dx > dz) AND NOT (dy > dz)
               THEN -rx - ry ELSE rz END)::VARCHAR AS hex
  FROM d
),
counts AS (SELECT hex, count(*)::BIGINT AS n_docs FROM keyed GROUP BY 1)
SELECT hex, n_docs, rank FROM (
  SELECT *, row_number() OVER (ORDER BY n_docs DESC, hex ASC) AS rank
  FROM counts
) WHERE rank <= 10 ORDER BY rank
"""

ORACLES["metric_rank_agreement"] = """
WITH q AS (
  SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0
),
scored AS (
  SELECT vec_id,
         round(list_dot_product(embedding::DOUBLE[], qvec)
               / (sqrt(list_dot_product(embedding::DOUBLE[],
                                        embedding::DOUBLE[]))
                  * sqrt(list_dot_product(qvec, qvec))), 6) AS cosine,
         round(list_dot_product(embedding::DOUBLE[], qvec), 6) AS dot
  FROM embeddings, q WHERE vec_id <> 0
),
rct AS (
  SELECT vec_id, rc FROM (
    SELECT vec_id,
           row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS rc
    FROM scored
  ) WHERE rc <= 50
),
rdt AS (
  SELECT vec_id, rd FROM (
    SELECT vec_id,
           row_number() OVER (ORDER BY dot DESC, vec_id ASC) AS rd
    FROM scored
  ) WHERE rd <= 50
),
common AS (SELECT vec_id, rc, rd FROM rct JOIN rdt USING (vec_id)),
pairs AS (
  SELECT a.rc AS rca, a.rd AS rda, b.rc AS rcb, b.rd AS rdb
  FROM common a JOIN common b ON a.vec_id < b.vec_id
),
counts AS (
  SELECT coalesce(sum(CASE WHEN (rca - rcb) * (rda - rdb) > 0
                           THEN 1 ELSE 0 END), 0)::BIGINT AS n_concordant,
         coalesce(sum(CASE WHEN (rca - rcb) * (rda - rdb) < 0
                           THEN 1 ELSE 0 END), 0)::BIGINT AS n_discordant
  FROM pairs
),
nc AS (SELECT count(*)::BIGINT AS n_common FROM common)
SELECT 50::BIGINT AS k_depth, n_common, n_concordant, n_discordant,
       round((n_concordant - n_discordant)::DOUBLE
             / (n_common::DOUBLE * (n_common::DOUBLE - 1.0) / 2.0), 6)
         AS tau
FROM counts, nc
"""


def _ndv_leg_sql(table: str, col: str) -> str:
    key = f"{table}.{col}"
    h = _MD5_52.format(e=f"'{key}:' || v")
    mask = (1 << 40) - 1
    m = _HLL_M
    return f"""
SELECT '{key}' AS column_name, n_exact, used,
       round(est, 4) AS hll_estimate,
       round(abs(est - n_exact::DOUBLE) / n_exact::DOUBLE, 6) AS rel_err
FROM (
  WITH vals AS (SELECT DISTINCT {col}::VARCHAR AS v FROM {table}),
  hashed AS (SELECT ({h}) AS h FROM vals),
  regs AS (
    SELECT h >> 40 AS bucket,
           max(CASE WHEN (h & {mask}) = 0 THEN 41
                    ELSE 40 - floor(log2((h & {mask})::DOUBLE))::INT
               END) AS m_j
    FROM hashed GROUP BY 1
  ),
  folded AS (
    SELECT count(*)::BIGINT AS used,
           sum(1::BIGINT << (41 - m_j))::BIGINT AS s_used
    FROM regs
  ),
  exact AS (SELECT count(*)::BIGINT AS n_exact FROM vals),
  est0 AS (
    SELECT used,
           {_HLL_ALPHA_NUM!r}
             / (s_used + ({m} - used) * {1 << 41})::DOUBLE AS e_raw,
           ({m} - used)::DOUBLE AS ve
    FROM folded
  )
  SELECT n_exact, used,
         CASE WHEN e_raw <= {2.5 * m!r} AND ve > 0
              THEN {float(m)!r} * ln({float(m)!r} / ve)
              ELSE e_raw END AS est
  FROM est0, exact
) t
"""


ORACLES["ndv_sketch_error_by_column"] = (
    "SELECT * FROM ("
    + " UNION ALL ".join(
        f"({_ndv_leg_sql(t, c)})" for t, c in NDV_AUDIT_COLUMNS
    )
    + ") ORDER BY column_name"
)

# ---- batch 119: runs test, Shapley attribution, personalized PageRank -----

ORACLES["runs_test_daily"] = f"""
WITH {_DAILY_HIST},
med AS (SELECT quantile_cont(n_events, 0.5) AS med FROM hist),
signed AS (
  SELECT day, CASE WHEN n_events::DOUBLE > med THEN 1 ELSE 0 END AS sgn
  FROM hist, med WHERE n_events::DOUBLE <> med
),
runs AS (
  SELECT sgn,
         CASE WHEN lag(sgn) OVER (ORDER BY day) IS NULL
                OR lag(sgn) OVER (ORDER BY day) <> sgn
              THEN 1 ELSE 0 END AS new_run
  FROM signed
),
g AS (
  SELECT count(*)::BIGINT AS n_days_used, sum(sgn)::BIGINT AS n_above,
         (count(*) - sum(sgn))::BIGINT AS n_below,
         sum(new_run)::BIGINT AS n_runs
  FROM runs
),
mu AS (
  SELECT n_days_used, n_above, n_below, n_runs,
         (2.0 * n_above::DOUBLE * n_below::DOUBLE) / n_days_used::DOUBLE
           + 1.0 AS mu
  FROM g
)
SELECT n_days_used, n_above, n_below, n_runs,
       round(mu, 6) AS exp_runs,
       round((n_runs::DOUBLE - mu)
             / sqrt(((mu - 1.0) * (mu - 2.0))
                    / (n_days_used::DOUBLE - 1.0)), 6) AS z_stat
FROM mu
"""

from lucene_mapreduce_spark.operators.parity import (  # noqa: E402
    SHAPLEY_CHANNELS,
)

_SHAP_BIT_CASE = "CASE e.event_type " + " ".join(
    f"WHEN '{c}' THEN {b}" for c, b in SHAPLEY_CHANNELS
) + " END"
_SHAP_CHAN_VALUES = ", ".join(f"('{c}', {b})" for c, b in SHAPLEY_CHANNELS)

ORACLES["shapley_attribution"] = f"""
WITH ev AS (
  SELECT user_id, ts::DATE AS day, ts, event_type FROM events
),
first_buy AS (
  SELECT user_id, day, min(ts) AS t0
  FROM ev WHERE event_type = 'purchase' GROUP BY 1, 2
),
masks AS (
  SELECT user_id, day, sum(b)::INT AS m FROM (
    SELECT DISTINCT e.user_id, e.day, {_SHAP_BIT_CASE} AS b
    FROM ev e JOIN first_buy f
      ON e.user_id = f.user_id AND e.day = f.day AND e.ts < f.t0
    WHERE e.event_type <> 'purchase'
  ) GROUP BY 1, 2
),
conv AS (
  SELECT coalesce(m, 0) AS m, count(*)::BIGINT AS c
  FROM first_buy LEFT JOIN masks USING (user_id, day)
  GROUP BY 1
),
coal AS (SELECT unnest(range(16))::INT AS t),
v AS (
  SELECT t, coalesce(sum(c), 0)::BIGINT AS v
  FROM coal LEFT JOIN conv ON (conv.m & coal.t) = conv.m
  GROUP BY t
),
chan AS (SELECT * FROM (VALUES {_SHAP_CHAN_VALUES}) AS x(channel, b)),
terms AS (
  SELECT channel,
         (CASE ((vt.t >> 0) & 1) + ((vt.t >> 1) & 1)
               + ((vt.t >> 2) & 1) + ((vt.t >> 3) & 1)
            WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2
            ELSE 6 END)::BIGINT * (vi.v - vt.v) AS c24
  FROM chan
  JOIN v vt ON (vt.t & chan.b) = 0
  JOIN v vi ON (vt.t | chan.b) = vi.t
)
SELECT channel, sum(c24)::BIGINT AS credit24,
       round(sum(c24)::DOUBLE / 24.0, 6) AS shapley
FROM terms GROUP BY 1 ORDER BY 1
"""

from lucene_mapreduce_spark.operators.relational import (  # noqa: E402
    PPR_D,
    PPR_TOP_K,
)


def _ppr_iter(prev: str, cur: str) -> str:
    return f"""{cur} AS (
  SELECT n.src,
         (CASE WHEN n.src = (SELECT seed FROM seed)
               THEN {1.0 - PPR_D!r} ELSE 0.0 END)
           + coalesce(c.sc, 0.0) AS r
  FROM (SELECT src FROM deg) n LEFT JOIN (
    SELECT dst AS src,
           sum(round({PPR_D!r} * r / deg::DOUBLE, 12)::DECIMAL(28,12))::DOUBLE
             AS sc
    FROM edges JOIN {prev} USING (src) JOIN deg USING (src)
    GROUP BY dst
  ) c USING (src)
)"""


ORACLES["personalized_pagerank"] = f"""
WITH {_PR_EDGES},
seed AS (SELECT min(src) AS seed FROM deg),
r0 AS (
  SELECT src, CASE WHEN src = (SELECT seed FROM seed)
                   THEN 1.0 ELSE 0.0 END AS r
  FROM deg
),
{_ppr_iter("r0", "p1")},
{_ppr_iter("p1", "p2")},
{_ppr_iter("p2", "p3")}
SELECT part, ppr, rank FROM (
  SELECT src AS part, round(r, 6) AS ppr,
         row_number() OVER (ORDER BY round(r, 6) DESC, src ASC) AS rank
  FROM p3 WHERE r > 0
) WHERE rank <= {PPR_TOP_K} ORDER BY rank
"""

# ---- batch 120: Hilbert layout, corpus BLEU-2, Cochran's Q -----------------

from lucene_mapreduce_spark.operators.relational import (  # noqa: E402
    HILBERT_N,
    hilbert_step_exprs,
)


def hilbert_sql(n_files: int, xb: int, yb: int, pb: int) -> str:
    """Hilbert-vs-zorder layout twin: the same unrolled xy2d step text
    as the Spark plan (hilbert_step_exprs, `//` dialect) chained
    through one CTE per bit so no step reads its own aliases, plus the
    zorder leg's Morton arithmetic; downstream is zorder_sql's exact
    ntile/min-max skip accounting."""
    z = _zexpr_duck(
        f"(l_partkey * {xb}) // nx", f"(l_suppkey * {yb}) // ny"
    )
    keep = "l_partkey, l_suppkey, l_orderkey, l_linenumber, z"
    ctes = [
        f"""h0 AS (
  SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber,
         {z} AS z,
         (l_partkey * {xb}) // nx AS x0,
         (l_suppkey * {yb}) // ny AS y0,
         0 AS d0
  FROM lineitem, mk)"""
    ]
    step = 0
    s = HILBERT_N // 2
    while s > 0:
        d_term, nxp, nyp = hilbert_step_exprs(
            s, f"x{step}", f"y{step}", "//"
        )
        ctes.append(
            f"""h{step + 1} AS (
  SELECT {keep},
         d{step} + {d_term} AS d{step + 1},
         {nxp} AS x{step + 1},
         {nyp} AS y{step + 1}
  FROM h{step})"""
        )
        step += 1
        s //= 2
    ctes.append(f"li AS (SELECT {keep}, d{step} AS h FROM h{step})")
    bounds = {
        "x_range": (
            "l_partkey",
            f"(SELECT nx * {pb} // {xb} FROM mk)",
            f"(SELECT nx * {pb + 1} // {xb} - 1 FROM mk)",
        ),
        "y_range": (
            "l_suppkey",
            f"(SELECT ny * {pb} // {yb} FROM mk)",
            f"(SELECT ny * {pb + 1} // {yb} - 1 FROM mk)",
        ),
    }
    legs = []
    for lname, order in (
        ("hilbert", "h, l_partkey, l_suppkey, l_orderkey, l_linenumber"),
        ("zorder", "z, l_partkey, l_suppkey, l_orderkey, l_linenumber"),
    ):
        for pname, (col, lo, hi) in bounds.items():
            mn, mx = (
                ("min_x", "max_x")
                if col == "l_partkey"
                else ("min_y", "max_y")
            )
            hit = f"{mn} <= {hi} AND {mx} >= {lo}"
            matched = (
                f"(SELECT count(*) FROM li"
                f" WHERE {col} BETWEEN {lo} AND {hi})"
            )
            legs.append(f"""
SELECT '{lname}' AS layout, '{pname}' AS predicate,
       count(*)::BIGINT AS n_files,
       sum(CASE WHEN {hit} THEN 1 ELSE 0 END)::BIGINT AS files_read,
       (count(*) - sum(CASE WHEN {hit} THEN 1 ELSE 0 END))::BIGINT
         AS files_skipped,
       {matched}::BIGINT AS rows_matched,
       sum(CASE WHEN {hit} THEN n_rows ELSE 0 END)::BIGINT AS rows_scanned,
       round(sum(CASE WHEN {hit} THEN n_rows ELSE 0 END)::DOUBLE
             / {matched}::DOUBLE, 6) AS read_amplification
FROM (
  SELECT f, min(l_partkey) AS min_x, max(l_partkey) AS max_x,
         min(l_suppkey) AS min_y, max(l_suppkey) AS max_y,
         count(*)::BIGINT AS n_rows
  FROM (SELECT ntile({n_files}) OVER (ORDER BY {order}) AS f,
               l_partkey, l_suppkey
        FROM li)
  GROUP BY f
)""")
    return (
        "WITH mk AS (SELECT max(l_partkey) + 1 AS nx,"
        " max(l_suppkey) + 1 AS ny FROM lineitem),\n"
        + ",\n".join(ctes)
        + "\n"
        + "\nUNION ALL\n".join(legs)
        + "\nORDER BY layout, predicate"
    )


_BLEU_TOKS = duckdb_tokens_sql("text")

ORACLES["corpus_bleu_pairs"] = f"""
WITH docs AS (SELECT source, {_BLEU_TOKS} AS toks FROM documents),
uni AS (SELECT source, unnest(toks) AS gram FROM docs),
bi AS (
  SELECT source,
         toks[i] || ' ' || toks[i + 1] AS gram
  FROM (SELECT source, toks, unnest(range(1, len(toks)))::INT AS i
        FROM docs WHERE len(toks) >= 2)
),
c1 AS (SELECT source, gram, count(*)::BIGINT AS c FROM uni GROUP BY 1, 2),
c2 AS (SELECT source, gram, count(*)::BIGINT AS c FROM bi GROUP BY 1, 2),
t1 AS (SELECT source, sum(c)::BIGINT AS tot FROM c1 GROUP BY 1),
t2 AS (SELECT source, sum(c)::BIGINT AS tot FROM c2 GROUP BY 1),
m1 AS (
  SELECT a.source AS cand_source, b.source AS ref_source,
         sum(least(a.c, b.c))::BIGINT AS match1
  FROM c1 a JOIN c1 b ON a.gram = b.gram AND a.source <> b.source
  GROUP BY 1, 2
),
m2 AS (
  SELECT a.source AS cand_source, b.source AS ref_source,
         sum(least(a.c, b.c))::BIGINT AS match2
  FROM c2 a JOIN c2 b ON a.gram = b.gram AND a.source <> b.source
  GROUP BY 1, 2
),
j AS (
  SELECT m1.cand_source, m1.ref_source,
         tc1.tot AS n1_cand, match1,
         tc2.tot AS n2_cand, match2,
         tr.tot AS r_toks
  FROM m1
  JOIN m2 USING (cand_source, ref_source)
  JOIN t1 tc1 ON tc1.source = m1.cand_source
  JOIN t2 tc2 ON tc2.source = m1.cand_source
  JOIN t1 tr ON tr.source = m1.ref_source
  WHERE match1 > 0 AND match2 > 0
)
SELECT cand_source, ref_source, n1_cand, match1, n2_cand, match2,
       round(match1::DOUBLE / n1_cand::DOUBLE, 6) AS p1,
       round(match2::DOUBLE / n2_cand::DOUBLE, 6) AS p2,
       round(least(0.0, 1.0 - r_toks::DOUBLE / n1_cand::DOUBLE)
             + 0.5 * (round(ln(match1::DOUBLE / n1_cand::DOUBLE), 12)
                      + round(ln(match2::DOUBLE / n2_cand::DOUBLE), 12)),
             6) AS log_bleu2
FROM j ORDER BY cand_source, ref_source
"""

from lucene_mapreduce_spark.operators.parity import (  # noqa: E402
    COCHRAN_TYPES,
)

_CQ_K = len(COCHRAN_TYPES)
_CQ_FLAGS = ", ".join(
    f"max(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS x{i}"
    for i, t in enumerate(COCHRAN_TYPES)
)
_CQ_R = " + ".join(f"x{i}" for i in range(_CQ_K))
_CQ_CSUM = ", ".join(
    f"sum(x{i})::BIGINT AS c{i}" for i in range(_CQ_K)
)
_CQ_SC2 = " + ".join(
    f"c{i}::DOUBLE * c{i}::DOUBLE" for i in range(_CQ_K)
)
_CQ_OUT = ", ".join(
    f"c{i} AS c_{t}" for i, t in enumerate(COCHRAN_TYPES)
)

ORACLES["cochran_q_test"] = f"""
WITH ev AS (
  SELECT user_id, ts::DATE AS day, event_type FROM events
),
blocks AS (
  SELECT user_id, day, {_CQ_FLAGS}
  FROM ev GROUP BY 1, 2
),
g AS (
  SELECT count(*)::BIGINT AS n_blocks, {_CQ_CSUM},
         sum({_CQ_R})::BIGINT AS sr,
         sum(({_CQ_R}) * ({_CQ_R}))::BIGINT AS sr2
  FROM blocks
)
SELECT n_blocks, {_CQ_OUT}, {_CQ_K - 1}::BIGINT AS df,
       round({float(_CQ_K - 1)!r}
             * ({float(_CQ_K)!r} * ({_CQ_SC2}) - sr::DOUBLE * sr::DOUBLE)
             / ({float(_CQ_K)!r} * sr::DOUBLE - sr2::DOUBLE), 6) AS q_stat
FROM g
"""

# ---- batch 121: Cochran-Armitage trend, Durbin-Watson, Friedman ------------

ORACLES["cochran_armitage_trend"] = """
WITH ev AS (
  SELECT (epoch_us(ts) // 86400000000) // 7 AS wk,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
per AS (
  SELECT wk, count(*)::BIGINT AS n_i, sum(y)::BIGINT AS r_i
  FROM ev GROUP BY 1
),
w0 AS (SELECT min(wk) AS w0 FROM per),
g AS (
  SELECT count(*)::BIGINT AS n_weeks,
         sum(n_i)::BIGINT AS n_events,
         sum(r_i)::BIGINT AS n_purchases,
         sum((wk - w0) * n_i)::BIGINT AS stn,
         sum((wk - w0) * (wk - w0) * n_i)::BIGINT AS st2n,
         sum((wk - w0) * r_i)::BIGINT AS str
  FROM per, w0
)
SELECT n_weeks, n_events, n_purchases,
       round(n_purchases::DOUBLE / n_events::DOUBLE, 6) AS p_hat,
       round((str::DOUBLE - (n_purchases::DOUBLE / n_events::DOUBLE)
                              * stn::DOUBLE)
             / sqrt((n_purchases::DOUBLE / n_events::DOUBLE)
                    * (1.0 - n_purchases::DOUBLE / n_events::DOUBLE)
                    * (st2n::DOUBLE
                       - stn::DOUBLE * stn::DOUBLE / n_events::DOUBLE)),
             6) AS z_trend
FROM g
"""

ORACLES["durbin_watson_daily"] = f"""
WITH {_DAILY_HIST},
idx AS (
  SELECT row_number() OVER (ORDER BY day)::BIGINT AS i,
         n_events::BIGINT AS y
  FROM hist
),
g AS (
  SELECT count(*)::BIGINT AS n, sum(i)::BIGINT AS si,
         sum(i * i)::BIGINT AS sii, sum(y)::BIGINT AS sy,
         sum(i * y)::BIGINT AS siy
  FROM idx
),
fit AS (
  SELECT n, si, sii, sy, siy,
         (n::DOUBLE * siy::DOUBLE - si::DOUBLE * sy::DOUBLE)
           / (n::DOUBLE * sii::DOUBLE - si::DOUBLE * si::DOUBLE) AS b
  FROM g
),
fit2 AS (
  SELECT n, b, (sy::DOUBLE - b * si::DOUBLE) / n::DOUBLE AS a
  FROM fit
),
res AS (
  SELECT i, y::DOUBLE - (round(a, 12) + round(b, 12) * i::DOUBLE) AS e
  FROM idx, fit2
),
terms AS (
  SELECT e,
         round(e * e, 12)::DECIMAL(38,12) AS e2,
         CASE WHEN lag(e) OVER (ORDER BY i) IS NOT NULL
              THEN round((e - lag(e) OVER (ORDER BY i))
                         * (e - lag(e) OVER (ORDER BY i)), 12)::DECIMAL(38,12)
         END AS d2
  FROM res
)
SELECT (SELECT n FROM fit2)::BIGINT AS n_days,
       (SELECT round(b, 6) FROM fit2) AS slope,
       (SELECT round(a, 6) FROM fit2) AS intercept,
       round(sum(d2)::DOUBLE / sum(e2)::DOUBLE, 6) AS dw_stat
FROM terms
"""

from lucene_mapreduce_spark.operators.parity import (  # noqa: E402
    FRIEDMAN_TYPES,
)

_FR_K = len(FRIEDMAN_TYPES)
_FR_TYPES_IN = ", ".join(f"'{t}'" for t in FRIEDMAN_TYPES)
_FR_VALUES = ", ".join(f"('{t}')" for t in FRIEDMAN_TYPES)
_FR_PIV = ", ".join(
    f"max(CASE WHEN event_type = '{t}' THEN s_j END) AS s2_{t}"
    for t in FRIEDMAN_TYPES
)

ORACLES["friedman_test"] = f"""
WITH ev AS (
  SELECT user_id, event_type FROM events
  WHERE event_type IN ({_FR_TYPES_IN})
),
users AS (SELECT DISTINCT user_id FROM ev),
types AS (SELECT * FROM (VALUES {_FR_VALUES}) AS t(event_type)),
counts AS (
  SELECT user_id, event_type, count(*)::BIGINT AS v
  FROM ev GROUP BY 1, 2
),
full_grid AS (
  SELECT u.user_id, t.event_type, coalesce(c.v, 0)::BIGINT AS v
  FROM users u CROSS JOIN types t
  LEFT JOIN counts c USING (user_id, event_type)
),
ranked AS (
  SELECT user_id, event_type,
         (2 * rank() OVER (PARTITION BY user_id ORDER BY v)
          + count(*) OVER (PARTITION BY user_id, v) - 1)::BIGINT AS s
  FROM full_grid
),
col_sums AS (
  SELECT event_type, sum(s)::BIGINT AS s_j FROM ranked GROUP BY 1
),
nu AS (SELECT count(*)::BIGINT AS n_users FROM users),
num AS (
  SELECT sum((s_j - (SELECT n_users FROM nu) * {_FR_K + 1})
             * (s_j - (SELECT n_users FROM nu) * {_FR_K + 1}))::BIGINT AS num
  FROM col_sums
),
den AS (
  SELECT sum((s - {_FR_K + 1}) * (s - {_FR_K + 1}))::BIGINT AS den
  FROM ranked
),
piv AS (SELECT {_FR_PIV} FROM col_sums)
SELECT (SELECT n_users FROM nu) AS n_users, piv.*,
       {_FR_K - 1}::BIGINT AS df,
       round({float(_FR_K - 1)!r} * num::DOUBLE / den::DOUBLE, 6) AS q_stat
FROM piv, num, den
"""

# ---- batch 122: periodogram, Bartlett, block-max tightness -----------------

from lucene_mapreduce_spark.operators.parity import (  # noqa: E402
    BARTLETT_TYPES,
    PERIODOGRAM_PERIODS,
    PERIODOGRAM_TRIG,
)


def _periodogram_leg(p: int) -> str:
    cos_case = "CASE (i % {p}) {arms} END".format(
        p=p,
        arms=" ".join(
            f"WHEN {r} THEN {c!r}"
            for r, (c, s) in enumerate(PERIODOGRAM_TRIG[p])
        ),
    )
    sin_case = "CASE (i % {p}) {arms} END".format(
        p=p,
        arms=" ".join(
            f"WHEN {r} THEN {s!r}"
            for r, (c, s) in enumerate(PERIODOGRAM_TRIG[p])
        ),
    )
    return f"""
SELECT {p}::BIGINT AS period, n_days,
       round(cs, 6) AS amp_cos, round(ss, 6) AS amp_sin,
       round(cs * cs + ss * ss, 4) AS power
FROM (
  SELECT count(*)::BIGINT AS n_days,
         sum(round(y::DOUBLE * ({cos_case}), 12)::DECIMAL(38,12))::DOUBLE
           AS cs,
         sum(round(y::DOUBLE * ({sin_case}), 12)::DECIMAL(38,12))::DOUBLE
           AS ss
  FROM idx
)"""


ORACLES["weekly_periodogram_power"] = (
    f"WITH {_DAILY_HIST},\n"
    "idx AS (SELECT row_number() OVER (ORDER BY day) - 1 AS i,"
    " n_events::BIGINT AS y FROM hist)\n"
    + "\nUNION ALL\n".join(_periodogram_leg(p) for p in PERIODOGRAM_PERIODS)
    + "\nORDER BY period"
)

_BT_K = len(BARTLETT_TYPES)

ORACLES["bartlett_variance_test"] = f"""
WITH ev AS (
  SELECT event_type,
         round(value, 6)::DECIMAL(18,6) AS v,
         round(value * value, 12)::DECIMAL(38,12) AS vv
  FROM events
),
per AS (
  SELECT event_type, count(*)::BIGINT AS n_j,
         sum(v)::DOUBLE AS s, sum(vv)::DOUBLE AS ss
  FROM ev GROUP BY 1
),
terms AS (
  SELECT n_j,
         round((n_j::DOUBLE - 1.0)
               * ((ss - s * s / n_j::DOUBLE) / (n_j::DOUBLE - 1.0)),
               6)::DECIMAL(38,6) AS w_ss,
         round((n_j::DOUBLE - 1.0)
               * round(ln((ss - s * s / n_j::DOUBLE)
                          / (n_j::DOUBLE - 1.0)), 12),
               12)::DECIMAL(38,12) AS w_ln,
         round(1.0 / (n_j::DOUBLE - 1.0), 12)::DECIMAL(38,12) AS inv_df
  FROM per
),
g AS (
  SELECT count(*)::BIGINT AS k, sum(n_j)::BIGINT AS n_total,
         sum(w_ss)::DOUBLE AS sw_ss, sum(w_ln)::DOUBLE AS sw_ln,
         sum(inv_df)::DOUBLE AS s_inv
  FROM terms
)
SELECT k, n_total,
       round(sw_ss / (n_total - {_BT_K})::DOUBLE, 6) AS pooled_var,
       {_BT_K - 1}::BIGINT AS df,
       round(((n_total - {_BT_K})::DOUBLE
                * round(ln(sw_ss / (n_total - {_BT_K})::DOUBLE), 12)
              - sw_ln)
             / (1.0 + (s_inv - 1.0 / (n_total - {_BT_K})::DOUBLE)
                      / {3.0 * (_BT_K - 1)!r}),
             6) AS chi2_stat
FROM g
"""

from lucene_mapreduce_spark.operators.textstats import (  # noqa: E402
    BLOCKMAX_B,
)

ORACLES["blockmax_tightness_report"] = f"""
WITH docs AS (SELECT doc_id, {TOKS} AS toks FROM documents),
tf AS (
  SELECT term, doc_id, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM docs)
  GROUP BY 1, 2
),
blocks AS (
  SELECT term, blk, max(tf) AS block_max
  FROM (SELECT term, tf,
               (row_number() OVER (PARTITION BY term ORDER BY doc_id) - 1)
                 // {BLOCKMAX_B} AS blk
        FROM tf)
  GROUP BY 1, 2
),
stats AS (
  SELECT term, count(*)::BIGINT AS df, max(tf) AS global_max
  FROM tf GROUP BY 1
),
joined AS (
  SELECT (length(df::VARCHAR) - 1)::BIGINT AS decade, b.term,
         round(block_max::DOUBLE / global_max::DOUBLE, 6)::DECIMAL(18,6)
           AS ratio,
         CASE WHEN block_max = global_max THEN 1 ELSE 0 END AS tight
  FROM blocks b JOIN stats s ON b.term = s.term
)
SELECT decade, count(DISTINCT term)::BIGINT AS n_terms,
       count(*)::BIGINT AS n_blocks,
       sum(tight)::BIGINT AS n_tight_blocks,
       round(sum(ratio)::DOUBLE / count(*)::DOUBLE, 6) AS mean_tightness
FROM joined GROUP BY decade ORDER BY decade
"""

# ---- batch 123: Jonckheere-Terpstra, Grubbs, Mood's median ------------------

ORACLES["jonckheere_terpstra"] = """
WITH obs AS (
  SELECT o.o_orderpriority AS grp, s.v
  FROM orders o
  JOIN (SELECT l_orderkey, count(*)::BIGINT AS v
        FROM lineitem GROUP BY 1) s
    ON o.o_orderkey = s.l_orderkey
),
cnt AS (SELECT grp, v, count(*)::BIGINT AS c FROM obs GROUP BY 1, 2),
jt AS (
  SELECT sum(CASE WHEN a.v < b.v THEN 2 * a.c * b.c
                  WHEN a.v = b.v THEN a.c * b.c
                  ELSE 0 END)::BIGINT AS jt2
  FROM cnt a JOIN cnt b ON a.grp < b.grp
),
sizes AS (SELECT grp, count(*)::BIGINT AS n_g FROM obs GROUP BY 1),
g AS (
  SELECT count(*)::BIGINT AS n_groups, sum(n_g)::BIGINT AS n_total,
         sum(n_g * n_g)::BIGINT AS sn2,
         sum(n_g * n_g * (2 * n_g + 3))::BIGINT AS sn23
  FROM sizes
)
SELECT n_groups, n_total, jt2,
       round((n_total::DOUBLE * n_total::DOUBLE - sn2::DOUBLE) / 4.0, 6)
         AS e_jt,
       round((jt2::DOUBLE / 2.0
              - (n_total::DOUBLE * n_total::DOUBLE - sn2::DOUBLE) / 4.0)
             / sqrt((n_total::DOUBLE * n_total::DOUBLE
                       * (2.0 * n_total::DOUBLE + 3.0)
                     - sn23::DOUBLE) / 72.0), 6) AS z_stat
FROM jt, g
"""

from lucene_mapreduce_spark.operators.parity import (  # noqa: E402
    GRUBBS_CRIT,
)

ORACLES["grubbs_outlier_day"] = f"""
WITH {_DAILY_HIST},
g AS (
  SELECT count(*)::BIGINT AS n, sum(n_events)::BIGINT AS s,
         sum(n_events * n_events)::BIGINT AS ss
  FROM hist
),
scored AS (
  SELECT day::VARCHAR AS day, n,
         round(s::DOUBLE / n::DOUBLE, 6) AS mean_events,
         round(sqrt((ss::DOUBLE - s::DOUBLE * (s::DOUBLE / n::DOUBLE))
                    / (n::DOUBLE - 1.0)), 6) AS sd_events,
         round(abs(n_events::DOUBLE - s::DOUBLE / n::DOUBLE)
               / sqrt((ss::DOUBLE - s::DOUBLE * (s::DOUBLE / n::DOUBLE))
                      / (n::DOUBLE - 1.0)), 6) AS g_stat
  FROM hist, g
)
SELECT n AS n_days, mean_events, sd_events, day AS outlier_day, g_stat,
       (CASE WHEN g_stat > {GRUBBS_CRIT!r} THEN 1 ELSE 0 END)::INT
         AS is_outlier
FROM (
  SELECT *, row_number() OVER (ORDER BY g_stat DESC, day ASC) AS r
  FROM scored
) WHERE r = 1
"""

ORACLES["mood_median_test"] = """
WITH med AS (SELECT quantile_cont(value, 0.5) AS med FROM events),
sides AS (
  SELECT event_type,
         CASE WHEN value > med THEN 1 ELSE 0 END AS above
  FROM events, med WHERE value <> med
),
per AS (
  SELECT event_type, sum(above)::BIGINT AS n_above,
         (count(*) - sum(above))::BIGINT AS n_below
  FROM sides GROUP BY 1
),
tot AS (
  SELECT sum(n_above)::BIGINT AS ta, sum(n_below)::BIGINT AS tb FROM per
),
terms AS (
  SELECT event_type, n_above, n_below,
         round(((n_above::DOUBLE - (n_above + n_below)::DOUBLE * ta::DOUBLE
                                     / (ta + tb)::DOUBLE)
                * (n_above::DOUBLE - (n_above + n_below)::DOUBLE * ta::DOUBLE
                                       / (ta + tb)::DOUBLE))
               / ((n_above + n_below)::DOUBLE * ta::DOUBLE
                  / (ta + tb)::DOUBLE)
               + ((n_below::DOUBLE - (n_above + n_below)::DOUBLE * tb::DOUBLE
                                       / (ta + tb)::DOUBLE)
                  * (n_below::DOUBLE - (n_above + n_below)::DOUBLE
                                         * tb::DOUBLE / (ta + tb)::DOUBLE))
               / ((n_above + n_below)::DOUBLE * tb::DOUBLE
                  / (ta + tb)::DOUBLE),
               12)::DECIMAL(38,12) AS c12
  FROM per, tot
),
chi AS (
  SELECT count(*)::BIGINT AS k,
         round(sum(c12)::DOUBLE, 6) AS chi2_stat
  FROM terms
)
SELECT event_type, n_above, n_below, k, (k - 1)::BIGINT AS df, chi2_stat
FROM terms, chi ORDER BY event_type
"""

# ---- batch 124: best passage, FST stats, team-draft interleaving -----------


def best_passage_sql(query_text: str, k: int = 10, width: int = 8) -> str:
    """best_passage_highlight twin: same BM25 top-k page (nested
    bm25_topk_sql), same 12dp-DECIMAL idf weights, same window
    enumeration — DuckDB's end-INCLUSIVE list slice spans
    [i, i+width-1], Spark's length-based slice(toks, i, width) is the
    identical window."""
    qlit = query_text.replace("'", "''")
    return f"""
WITH topk AS (SELECT * FROM ({bm25_topk_sql(query_text, k)})),
docs AS (SELECT doc_id, {TOKS} AS toks FROM documents),
nd AS (SELECT count(*)::DOUBLE AS n FROM documents),
qt AS (SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term),
dfs AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df_t
  FROM (SELECT doc_id, unnest(toks) AS term FROM docs)
  WHERE term IN (SELECT term FROM qt)
  GROUP BY 1
),
weights AS (
  SELECT term,
         round(ln(1.0 + ((SELECT n FROM nd) - df_t::DOUBLE + 0.5)
                        / (df_t::DOUBLE + 0.5)), 12)::DECIMAL(28,12) AS w
  FROM dfs
),
wins AS (
  SELECT t.doc_id, t.rank, d.toks,
         unnest(range(1, greatest(1, len(d.toks) - {width - 1}) + 1))::INT
           AS i
  FROM topk t JOIN docs d USING (doc_id)
),
hit AS (
  SELECT doc_id, rank, i, w
  FROM wins, weights
  WHERE list_contains(toks[i : i + {width - 1}], term)
),
scored AS (
  SELECT doc_id, rank, i, round(sum(w)::DOUBLE, 6) AS passage_score
  FROM hit GROUP BY 1, 2, 3
),
best AS (
  SELECT doc_id, rank, i, passage_score FROM (
    SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY passage_score DESC, i ASC) AS r
    FROM scored
  ) WHERE r = 1
)
SELECT b.doc_id, b.rank, (b.i - 1)::BIGINT AS start_pos, b.passage_score,
       array_to_string(d.toks[b.i : b.i + {width - 1}], ' ') AS passage
FROM best b JOIN docs d ON b.doc_id = d.doc_id
ORDER BY b.rank, b.doc_id
"""


ORACLES["term_dict_fst_stats"] = f"""
WITH vocab AS (
  SELECT DISTINCT t AS term
  FROM (SELECT unnest({TOKS}) AS t FROM documents)
),
base AS (
  SELECT count(*)::BIGINT AS n_terms,
         sum(length(term))::BIGINT AS total_chars
  FROM vocab
),
prefixes AS (
  SELECT count(*)::BIGINT AS n_trie_nodes FROM (
    SELECT DISTINCT substr(term, 1, i) AS p
    FROM (SELECT term, unnest(range(1, length(term) + 1))::INT AS i
          FROM vocab)
  )
),
suffixes AS (
  SELECT count(*)::BIGINT AS n_suffixes FROM (
    SELECT DISTINCT substr(term, i) AS s
    FROM (SELECT term, unnest(range(1, length(term) + 1))::INT AS i
          FROM vocab)
  )
)
SELECT n_terms, total_chars, n_trie_nodes, n_suffixes,
       round(1.0 - n_trie_nodes::DOUBLE / total_chars::DOUBLE, 6)
         AS prefix_saving
FROM base, prefixes, suffixes
"""


def team_draft_sql(query_text: str, l_depth: int = 10) -> str:
    """team_draft_interleaving twin: both ranked pages nested from
    their own oracle builders and collapsed ONCE into ordered BIGINT
    lists, then the draft unrolled one CTE per position over pure list
    ops (list_filter/list_contains/list_append) — no correlated
    subqueries against the corpus-scale CTEs (trap 7: DuckDB
    decorrelates those quadratically; the first version spilled tens
    of GB at sf1).  The behind-team rule and the md5('td:<pos>') tie
    coin are the pinned Spark conventions; a team with no unpicked
    candidate concedes via coalesce but keeps the credit."""
    steps = []
    prev = "s0"
    finals = []
    for n in range(1, l_depth + 1):
        coin = _MD5_52.format(e=f"'td:{n}'")
        steps.append(f"""p{n} AS (
  SELECT picked, na, nb, al, bl,
         CASE WHEN na < nb OR (na = nb AND ({coin}) % 2 = 1)
              THEN 1 ELSE 0 END AS turn_a
  FROM {prev}
),
c{n} AS (
  SELECT *, coalesce(CASE WHEN turn_a = 1 THEN pa ELSE pb END,
                     CASE WHEN turn_a = 1 THEN pb ELSE pa END) AS pick
  FROM (
    SELECT *,
           list_filter(al, x -> NOT list_contains(picked, x))[1] AS pa,
           list_filter(bl, x -> NOT list_contains(picked, x))[1] AS pb
    FROM p{n}
  )
),
s{n} AS (
  SELECT list_append(picked, pick) AS picked,
         na + turn_a AS na, nb + 1 - turn_a AS nb, pick, turn_a, al, bl
  FROM c{n}
)""")
        finals.append(
            f"SELECT {n}::INT AS pos, pick AS doc_id,"
            f" CASE WHEN turn_a = 1 THEN 'A' ELSE 'B' END AS team FROM s{n}"
        )
        prev = f"s{n}"
    return (
        f"WITH ra AS (SELECT * FROM ({bm25_topk_sql(query_text, l_depth)})),\n"
        f"rb AS (SELECT * FROM ({tfidf_sql(query_text, l_depth)})),\n"
        "s0 AS (SELECT []::BIGINT[] AS picked, 0 AS na, 0 AS nb,\n"
        "  (SELECT list(doc_id ORDER BY rank) FROM ra) AS al,\n"
        "  (SELECT list(doc_id ORDER BY rank) FROM rb) AS bl),\n"
        + ",\n".join(steps)
        + "\n"
        + "\nUNION ALL\n".join(finals)
        + "\nORDER BY pos"
    )


# ---- batch 125: Page-Hinkley, keyness, earth mover's distance --------------

from lucene_mapreduce_spark.operators.parity import (  # noqa: E402
    EMD_TYPE_PAIRS,
    PH_DELTA,
    PH_LAMBDA,
)
from lucene_mapreduce_spark.operators.textstats import (  # noqa: E402
    KEYNESS_K,
    KEYNESS_SOURCE,
)

ORACLES["page_hinkley_drift"] = f"""
WITH {_DAILY_HIST},
mean AS (
  SELECT sum(n_events)::DOUBLE / count(*)::DOUBLE AS mu FROM hist
),
terms AS (
  SELECT day, n_events,
         round(n_events::DOUBLE - mu - {PH_DELTA!r}, 12)::DECIMAL(38,12)
           AS step
  FROM hist, mean
),
cum AS (
  SELECT day, n_events,
         sum(step) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
  FROM terms
),
run AS (
  SELECT day, n_events, m,
         min(m) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m_min
  FROM cum
)
SELECT day::VARCHAR AS day, n_events,
       round(m::DOUBLE, 6) AS m_cum,
       round((m - m_min)::DOUBLE, 6) AS ph_stat,
       (CASE WHEN (m - m_min)::DOUBLE > {PH_LAMBDA!r}
             THEN 1 ELSE 0 END)::INT AS alarm
FROM run ORDER BY day
"""

_KN_SRC = KEYNESS_SOURCE

ORACLES["keyness_loglik_terms"] = f"""
WITH toks AS (
  SELECT source, unnest({TOKS}) AS term FROM documents
),
per AS (
  SELECT term,
         sum(CASE WHEN source = '{_KN_SRC}' THEN 1 ELSE 0 END)::BIGINT AS a,
         sum(CASE WHEN source <> '{_KN_SRC}' THEN 1 ELSE 0 END)::BIGINT AS b
  FROM toks GROUP BY 1
),
tot AS (
  SELECT sum(CASE WHEN source = '{_KN_SRC}' THEN 1 ELSE 0 END)::BIGINT AS c,
         sum(CASE WHEN source <> '{_KN_SRC}' THEN 1 ELSE 0 END)::BIGINT AS d
  FROM toks
),
scored AS (
  SELECT term, a, b,
         round(2.0 * (
           (CASE WHEN a > 0
                 THEN a::DOUBLE * ln(a::DOUBLE
                   / (c::DOUBLE * (a + b)::DOUBLE / (c::DOUBLE + d::DOUBLE)))
                 ELSE 0.0 END)
           + (CASE WHEN b > 0
                   THEN b::DOUBLE * ln(b::DOUBLE
                     / (d::DOUBLE * (a + b)::DOUBLE / (c::DOUBLE + d::DOUBLE)))
                   ELSE 0.0 END)), 6) AS ll,
         (CASE WHEN a * (c + d) > c * (a + b) THEN 1 ELSE 0 END)::INT
           AS overused
  FROM per, tot
)
SELECT term, a AS n_in_source, b AS n_in_rest, ll, overused, rank
FROM (
  SELECT *, row_number() OVER (ORDER BY ll DESC, term ASC) AS rank
  FROM scored
) WHERE rank <= {KEYNESS_K} ORDER BY rank
"""

_EMD_PAIR_VALUES = ", ".join(f"('{a}', '{b}')" for a, b in EMD_TYPE_PAIRS)

ORACLES["emd_value_distributions"] = f"""
WITH ev AS (
  SELECT event_type, round(value * 100)::BIGINT AS cents FROM events
),
vals AS (
  SELECT event_type, cents, count(*)::BIGINT AS c FROM ev GROUP BY 1, 2
),
pairs AS (SELECT * FROM (VALUES {_EMD_PAIR_VALUES}) AS p(ta, tb)),
grid AS (
  SELECT ta, tb, cents,
         sum(CASE WHEN event_type = ta THEN c ELSE 0 END)::BIGINT AS ca,
         sum(CASE WHEN event_type = tb THEN c ELSE 0 END)::BIGINT AS cb
  FROM pairs JOIN vals ON event_type = ta OR event_type = tb
  GROUP BY 1, 2, 3
),
cdf AS (
  SELECT ta, tb, cents,
         sum(ca) OVER w AS fa, sum(cb) OVER w AS fb,
         sum(ca) OVER (PARTITION BY ta, tb) AS na,
         sum(cb) OVER (PARTITION BY ta, tb) AS nb,
         lead(cents) OVER w2 - cents AS gap
  FROM grid
  WINDOW w AS (PARTITION BY ta, tb ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w2 AS (PARTITION BY ta, tb ORDER BY cents)
)
SELECT ta AS type_a, tb AS type_b, na::BIGINT AS n_a, nb::BIGINT AS n_b,
       round(sum(round(abs(fa::DOUBLE / na::DOUBLE
                          - fb::DOUBLE / nb::DOUBLE)
                       * gap::DOUBLE, 12)::DECIMAL(38,12))::DOUBLE
             / 100.0, 6) AS emd
FROM cdf WHERE gap IS NOT NULL
GROUP BY 1, 2, 3, 4 ORDER BY 1, 2
"""

# ---- batch 126: conformal calibration, Brier/ECE, Cronbach's alpha ---------

from lucene_mapreduce_spark.operators.parity import (  # noqa: E402
    BRIER_BINS,
    BRIER_P_SHIFT,
    CONFORMAL_LAG,
    CRONBACH_TYPES,
)

ORACLES["conformal_interval_calibration"] = f"""
WITH {_DAILY_HIST},
lagged AS (
  SELECT row_number() OVER (ORDER BY day)::BIGINT AS i,
         n_events::BIGINT AS y,
         lag(n_events, {CONFORMAL_LAG}) OVER (ORDER BY day)::BIGINT AS yhat
  FROM hist
),
lag2 AS (SELECT * FROM lagged WHERE yhat IS NOT NULL),
nd AS (SELECT count(*)::BIGINT AS n_days FROM hist),
calib AS (
  SELECT abs(y - yhat)::BIGINT AS res, i FROM lag2
  WHERE i <= (SELECT n_days // 2 FROM nd)
),
nc AS (SELECT count(*)::BIGINT AS n_cal FROM calib),
kk AS (
  SELECT least(((n_cal + 1) * 9 + 9) // 10, n_cal) AS k, n_cal FROM nc
),
q AS (
  SELECT res AS q_hat FROM (
    SELECT res, row_number() OVER (ORDER BY res ASC, i ASC) AS r FROM calib
  ) WHERE r = (SELECT k FROM kk)
),
test AS (
  SELECT abs(y - yhat)::BIGINT AS res FROM lag2
  WHERE i > (SELECT n_days // 2 FROM nd)
)
SELECT (SELECT n_cal FROM kk) AS n_cal,
       count(*)::BIGINT AS n_test,
       (SELECT q_hat FROM q) AS q_hat,
       sum(CASE WHEN res <= (SELECT q_hat FROM q)
                THEN 1 ELSE 0 END)::BIGINT AS n_covered,
       round(sum(CASE WHEN res <= (SELECT q_hat FROM q)
                      THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE, 6)
         AS coverage
FROM test
"""

ORACLES["brier_calibration_report"] = f"""
WITH ev AS (
  SELECT event_id,
         value / (value + {BRIER_P_SHIFT!r}) AS p,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
binned AS (
  SELECT ntile({BRIER_BINS}) OVER (ORDER BY p ASC, event_id ASC) AS bin,
         round(p, 12)::DECIMAL(38,12) AS p12, y,
         round((p - y::DOUBLE) * (p - y::DOUBLE), 12)::DECIMAL(38,12)
           AS sq12
  FROM ev
),
per AS (
  SELECT bin, count(*)::BIGINT AS n,
         round(sum(p12)::DOUBLE / count(*)::DOUBLE, 6) AS mean_p,
         sum(y)::BIGINT AS n_pos,
         round(sum(y)::DOUBLE / count(*)::DOUBLE, 6) AS frac_pos,
         sum(sq12)::DOUBLE AS sq_sum,
         round(abs(sum(p12)::DOUBLE / count(*)::DOUBLE
                   - sum(y)::DOUBLE / count(*)::DOUBLE)
               * count(*)::DOUBLE, 12)::DECIMAL(38,12) AS w_gap
  FROM binned GROUP BY 1
),
consts AS (
  SELECT sum(n)::BIGINT AS n_total,
         round(sum(sq_sum) / sum(n)::DOUBLE, 6) AS brier,
         round(sum(w_gap)::DOUBLE / sum(n)::DOUBLE, 6) AS ece
  FROM per
)
SELECT bin, n, mean_p, n_pos, frac_pos,
       round(abs(mean_p - frac_pos), 6) AS abs_gap,
       n_total, brier, ece
FROM per, consts ORDER BY bin
"""

_CA_K = len(CRONBACH_TYPES)
_CA_IN = ", ".join(f"'{t}'" for t in CRONBACH_TYPES)
_CA_VALUES = ", ".join(f"('{t}')" for t in CRONBACH_TYPES)

ORACLES["cronbach_alpha_daily"] = f"""
WITH {_DAILY_HIST},
per AS (
  SELECT ts::DATE::VARCHAR AS day, event_type, count(*)::BIGINT AS c
  FROM events WHERE event_type IN ({_CA_IN})
  GROUP BY 1, 2
),
grid AS (
  SELECT h.day::VARCHAR AS day, t.event_type,
         coalesce(p.c, 0)::BIGINT AS c
  FROM hist h
  CROSS JOIN (SELECT * FROM (VALUES {_CA_VALUES}) AS v(event_type)) t
  LEFT JOIN per p ON p.day = h.day::VARCHAR
                 AND p.event_type = t.event_type
),
item_stats AS (
  SELECT event_type, count(*)::BIGINT AS n, sum(c)::BIGINT AS s,
         sum(c * c)::BIGINT AS ss
  FROM grid GROUP BY 1
),
items AS (
  SELECT sum(round((ss::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
                   / (n::DOUBLE - 1.0), 12)::DECIMAL(38,12))::DOUBLE
           AS sum_var_items,
         min(n) AS n_days
  FROM item_stats
),
daily_tot AS (SELECT day, sum(c)::BIGINT AS t FROM grid GROUP BY 1),
tot_stats AS (
  SELECT count(*)::BIGINT AS n, sum(t)::BIGINT AS s,
         sum(t * t)::BIGINT AS ss
  FROM daily_tot
),
totals AS (
  SELECT (ss::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
           / (n::DOUBLE - 1.0) AS var_total
  FROM tot_stats
)
SELECT n_days::BIGINT AS n_days, {_CA_K}::BIGINT AS k_items,
       round(sum_var_items, 6) AS sum_var_items,
       round(var_total, 6) AS var_total,
       round({float(_CA_K) / (_CA_K - 1)!r}
             * (1.0 - sum_var_items / var_total), 6) AS alpha
FROM items, totals
"""

# ---- batch 127: Fleiss kappa, information gain, shift-share ----------------

from lucene_mapreduce_spark.operators.relational import (  # noqa: E402
    SHIFT_SHARE_Y1,
    SHIFT_SHARE_Y2,
)
from lucene_mapreduce_spark.operators.textstats import (  # noqa: E402
    FLEISS_MIN_MTL,
    FLEISS_MIN_TOKS,
    FLEISS_MIN_TTR,
)

ORACLES["fleiss_kappa_quality"] = f"""
WITH docs AS (SELECT {TOKS} AS toks FROM documents),
feats AS (
  SELECT len(toks)::BIGINT AS n_t,
         len(list_distinct(toks))::BIGINT AS n_d,
         list_reduce(list_transform(toks, x -> length(x)::BIGINT),
                     (a, b) -> a + b)::BIGINT AS sum_len
  FROM docs
),
flags AS (
  SELECT CASE WHEN n_t >= {FLEISS_MIN_TOKS} THEN 1 ELSE 0 END AS r1,
         CASE WHEN n_d::DOUBLE / n_t::DOUBLE >= {FLEISS_MIN_TTR!r}
              THEN 1 ELSE 0 END AS r2,
         CASE WHEN sum_len::DOUBLE / n_t::DOUBLE >= {FLEISS_MIN_MTL!r}
              THEN 1 ELSE 0 END AS r3
  FROM feats
),
per AS (
  SELECT r1, r2, r3, (r1 + r2 + r3)::BIGINT AS kpos,
         ((r1 + r2 + r3) * (r1 + r2 + r3 - 1)
          + (3 - r1 - r2 - r3) * (2 - r1 - r2 - r3))::BIGINT AS agree6
  FROM flags
),
g AS (
  SELECT count(*)::BIGINT AS n_docs,
         sum(r1)::BIGINT AS n_pos_r1, sum(r2)::BIGINT AS n_pos_r2,
         sum(r3)::BIGINT AS n_pos_r3,
         sum(agree6)::BIGINT AS s_agree6, sum(kpos)::BIGINT AS s_pos
  FROM per
)
SELECT n_docs, n_pos_r1, n_pos_r2, n_pos_r3,
       round(s_agree6::DOUBLE / (6.0 * n_docs::DOUBLE), 6) AS p_bar,
       round((s_pos::DOUBLE / (3.0 * n_docs::DOUBLE))
               * (s_pos::DOUBLE / (3.0 * n_docs::DOUBLE))
             + (1.0 - s_pos::DOUBLE / (3.0 * n_docs::DOUBLE))
               * (1.0 - s_pos::DOUBLE / (3.0 * n_docs::DOUBLE)), 6) AS p_e,
       round((s_agree6::DOUBLE / (6.0 * n_docs::DOUBLE)
              - ((s_pos::DOUBLE / (3.0 * n_docs::DOUBLE))
                   * (s_pos::DOUBLE / (3.0 * n_docs::DOUBLE))
                 + (1.0 - s_pos::DOUBLE / (3.0 * n_docs::DOUBLE))
                   * (1.0 - s_pos::DOUBLE / (3.0 * n_docs::DOUBLE))))
             / (1.0 - ((s_pos::DOUBLE / (3.0 * n_docs::DOUBLE))
                         * (s_pos::DOUBLE / (3.0 * n_docs::DOUBLE))
                       + (1.0 - s_pos::DOUBLE / (3.0 * n_docs::DOUBLE))
                         * (1.0 - s_pos::DOUBLE / (3.0 * n_docs::DOUBLE)))),
             6) AS kappa
FROM g
"""


def _ig_leg(feat: str, expr: str) -> str:
    return f"""
SELECT '{feat}' AS feature,
       (SELECT count(DISTINCT {expr}) FROM ev)::BIGINT AS n_values,
       (SELECT round(h, 6) FROM hy) AS h_y,
       round(hc, 6) AS h_y_given_x,
       round((SELECT h FROM hy) - hc, 6) AS info_gain,
       round(((SELECT h FROM hy) - hc) / hx, 6) AS gain_ratio
FROM (
  SELECT
    (SELECT sum(round((cx::DOUBLE / (SELECT n FROM nt))
                      * -((c::DOUBLE / cx::DOUBLE)
                          * ln(c::DOUBLE / cx::DOUBLE)), 12)
                ::DECIMAL(38,12))::DOUBLE
     FROM (SELECT {expr} AS x, y, count(*)::BIGINT AS c
           FROM ev GROUP BY 1, 2) cells
     JOIN (SELECT {expr} AS x, count(*)::BIGINT AS cx
           FROM ev GROUP BY 1) xt USING (x)) AS hc,
    (SELECT sum(round(-((cx::DOUBLE / (SELECT n FROM nt))
                        * ln(cx::DOUBLE / (SELECT n FROM nt))), 12)
                ::DECIMAL(38,12))::DOUBLE
     FROM (SELECT {expr} AS x, count(*)::BIGINT AS cx
           FROM ev GROUP BY 1)) AS hx
)"""


ORACLES["information_gain_features"] = (
    """
WITH ev AS (
  SELECT ((epoch_us(ts) // 3600000000) % 24) // 6 AS hour4,
         (epoch_us(ts) // 86400000000) % 7 AS dow7,
         least(3, floor(value / 100)::BIGINT) AS val4,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
nt AS (SELECT count(*)::DOUBLE AS n FROM ev),
hy AS (
  SELECT sum(round(-((c::DOUBLE / (SELECT n FROM nt))
                     * ln(c::DOUBLE / (SELECT n FROM nt))), 12)
             ::DECIMAL(38,12))::DOUBLE AS h
  FROM (SELECT y, count(*)::BIGINT AS c FROM ev GROUP BY 1)
)
"""
    + "\nUNION ALL\n".join(
        _ig_leg(f, f) for f in ("hour4", "dow7", "val4")
    )
    + "\nORDER BY feature"
)

_SS_Y1_LO, _SS_Y1_HI = SHIFT_SHARE_Y1
_SS_Y2_LO, _SS_Y2_HI = SHIFT_SHARE_Y2

ORACLES["revenue_shift_share"] = f"""
WITH rev AS (
  SELECT c.c_nationkey, o.o_orderpriority,
         sum(CASE WHEN o.o_orderdate >= TIMESTAMP '{_SS_Y1_LO}'
                   AND o.o_orderdate < TIMESTAMP '{_SS_Y1_HI}'
                  THEN round(o.o_totalprice, 2)::DECIMAL(28,2)
                  ELSE 0 END)::DECIMAL(28,2) AS r1,
         sum(CASE WHEN o.o_orderdate >= TIMESTAMP '{_SS_Y2_LO}'
                   AND o.o_orderdate < TIMESTAMP '{_SS_Y2_HI}'
                  THEN round(o.o_totalprice, 2)::DECIMAL(28,2)
                  ELSE 0 END)::DECIMAL(28,2) AS r2
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE (o.o_orderdate >= TIMESTAMP '{_SS_Y1_LO}'
         AND o.o_orderdate < TIMESTAMP '{_SS_Y1_HI}')
     OR (o.o_orderdate >= TIMESTAMP '{_SS_Y2_LO}'
         AND o.o_orderdate < TIMESTAMP '{_SS_Y2_HI}')
  GROUP BY 1, 2
),
pr AS (
  SELECT o_orderpriority, sum(r1)::DECIMAL(28,2) AS p1,
         sum(r2)::DECIMAL(28,2) AS p2
  FROM rev GROUP BY 1
),
tot AS (
  SELECT sum(r1)::DECIMAL(28,2) AS t1, sum(r2)::DECIMAL(28,2) AS t2
  FROM rev
),
withg AS (
  SELECT rev.c_nationkey, rev.r1, rev.r2,
         CASE WHEN p1 > 0
              THEN round(rev.r1::DOUBLE
                         * ((p2::DOUBLE / p1::DOUBLE - 1.0)
                            - (t2::DOUBLE / t1::DOUBLE - 1.0)), 12)
              ELSE 0.0 END::DECIMAL(38,12) AS mix12,
         t2::DOUBLE / t1::DOUBLE - 1.0 AS g
  FROM rev JOIN pr USING (o_orderpriority), tot
),
per_nation AS (
  SELECT c_nationkey, sum(r1)::DECIMAL(28,2) AS rev1,
         sum(r2)::DECIMAL(28,2) AS rev2,
         sum(mix12)::DOUBLE AS mix, min(g) AS g
  FROM withg GROUP BY 1
)
SELECT n.n_name,
       round(rev1::DOUBLE, 2) AS rev1,
       round(rev2::DOUBLE, 2) AS rev2,
       round((rev2 - rev1)::DOUBLE, 2) AS actual_delta,
       round(rev1::DOUBLE * g, 4) AS national_term,
       round(mix, 4) AS mix_term,
       round((rev2 - rev1)::DOUBLE - rev1::DOUBLE * g - mix, 4)
         AS shift_term
FROM per_nation p JOIN nation n ON p.c_nationkey = n.n_nationkey
ORDER BY n.n_name
"""

# ---- batch 128: Burrows delta, DP exponential mechanism, skip benefit ------

from lucene_mapreduce_spark.operators.parity import (  # noqa: E402
    DP_EM_EPSILON,
    DP_EM_SENSITIVITY,
    _TWO_NEG52,
)
from lucene_mapreduce_spark.operators.textstats import (  # noqa: E402
    BURROWS_K,
    SKIP_BLOCK_B,
)

ORACLES["burrows_delta_sources"] = f"""
WITH toks AS (
  SELECT source, unnest({TOKS}) AS term FROM documents
),
topw AS (
  SELECT term FROM (
    SELECT term, row_number() OVER (ORDER BY count(*) DESC, term ASC) AS r
    FROM toks GROUP BY term
  ) WHERE r <= {BURROWS_K}
),
tot AS (SELECT source, count(*)::BIGINT AS n_toks FROM toks GROUP BY 1),
cnt AS (
  SELECT source, term, count(*)::BIGINT AS c
  FROM toks JOIN topw USING (term) GROUP BY 1, 2
),
grid AS (
  SELECT t.source, w.term,
         round(coalesce(c.c, 0)::DOUBLE * 1000.0 / t.n_toks::DOUBLE,
               12)::DECIMAL(38,12) AS r12
  FROM tot t CROSS JOIN topw w
  LEFT JOIN cnt c ON c.source = t.source AND c.term = w.term
),
stats AS (
  SELECT term, count(*)::BIGINT AS ns, sum(r12)::DOUBLE AS s,
         sum(round(r12::DOUBLE * r12::DOUBLE, 12)::DECIMAL(38,12))::DOUBLE
           AS ss
  FROM grid GROUP BY 1
),
z AS (
  SELECT g.source, g.term,
         (g.r12::DOUBLE - s / ns::DOUBLE)
           / sqrt((ss - s * (s / ns::DOUBLE)) / (ns::DOUBLE - 1.0)) AS z
  FROM grid g JOIN stats USING (term)
)
SELECT a.source AS source_a, b.source AS source_b,
       round(sum(round(abs(a.z - b.z), 12)::DECIMAL(38,12))::DOUBLE
             / {float(BURROWS_K)!r}, 6) AS delta
FROM z a JOIN z b ON a.term = b.term AND a.source < b.source
GROUP BY 1, 2 ORDER BY 1, 2
"""

_DPEM_U = (
    "((" + _MD5_52.format(e="'em:' || event_type") + ")::DOUBLE + 0.5)"
    f" * {_TWO_NEG52!r}"
)

ORACLES["dp_exponential_mechanism"] = f"""
WITH ev AS (
  SELECT event_type, count(*)::BIGINT AS n_events FROM events GROUP BY 1
),
scored AS (
  SELECT event_type, n_events, {_DPEM_U} AS u FROM ev
),
s2 AS (
  SELECT event_type, n_events, u,
         round(n_events::DOUBLE
                 * {DP_EM_EPSILON / (2.0 * DP_EM_SENSITIVITY)!r}
               + (-round(ln(-round(ln(u), 12)), 12)), 6) AS noisy_score
  FROM scored
)
SELECT event_type, n_events, round(u, 12) AS u, noisy_score,
       (CASE WHEN row_number() OVER (ORDER BY noisy_score DESC,
                                     event_type ASC) = 1
             THEN 1 ELSE 0 END)::INT AS chosen
FROM s2 ORDER BY event_type
"""


def skip_benefit_sql(query_text: str) -> str:
    from lucene_mapreduce_spark.functions.tokenize import tokenize_string

    qts = ", ".join(
        f"'{t}'" for t in sorted(set(tokenize_string(query_text)))
    )
    return f"""
WITH docs AS (SELECT doc_id, {TOKS} AS toks FROM documents),
post AS (
  SELECT DISTINCT term, doc_id
  FROM (SELECT doc_id, unnest(toks) AS term FROM docs)
  WHERE term IN ({qts})
),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM post GROUP BY 1),
blocks AS (
  SELECT term, blk, min(doc_id) AS lo, max(doc_id) AS hi
  FROM (SELECT term, doc_id,
               (row_number() OVER (PARTITION BY term ORDER BY doc_id) - 1)
                 // {SKIP_BLOCK_B} AS blk
        FROM post)
  GROUP BY 1, 2
),
touched AS (
  SELECT t_small, t_large, count(*)::BIGINT AS blocks_touched
  FROM (
    SELECT DISTINCT s.term AS t_small, b.term AS t_large, b.blk
    FROM post s JOIN blocks b
      ON s.term <> b.term AND s.doc_id BETWEEN b.lo AND b.hi
  ) GROUP BY 1, 2
),
nblk AS (
  SELECT term AS t_large, count(*)::BIGINT AS n_blocks
  FROM blocks GROUP BY 1
)
SELECT t.t_small, t.t_large, ds.df AS df_small, dl.df AS df_large,
       n.n_blocks, t.blocks_touched,
       round(1.0 - t.blocks_touched::DOUBLE * {float(SKIP_BLOCK_B)!r}
                   / dl.df::DOUBLE, 6) AS decode_saving
FROM touched t
JOIN nblk n ON n.t_large = t.t_large
JOIN dfs dl ON dl.term = t.t_large
JOIN dfs ds ON ds.term = t.t_small
WHERE ds.df <= dl.df
ORDER BY t.t_small, t.t_large
"""

# ---- batch 129: log-rank, RMST, price elasticity ---------------------------

from lucene_mapreduce_spark.operators.parity import (  # noqa: E402
    RMST_TAU_DAYS,
)

_SURV_DAY_TABLE = """
ev AS (
  SELECT user_id, event_type, epoch_us(ts) // 1000000 AS es FROM events
),
tend AS (SELECT max(es) AS t_end FROM ev),
signup AS (
  SELECT user_id, min(es) AS s FROM ev
  WHERE event_type = 'signup' GROUP BY 1
),
first_p AS (
  SELECT e.user_id, min(e.es) AS p
  FROM ev e JOIN signup g ON e.user_id = g.user_id AND e.es > g.s
  WHERE e.event_type = 'purchase'
  GROUP BY 1
),
tab AS (
  SELECT ({MD5GRP}) % 2 AS grp,
         CASE WHEN p IS NOT NULL THEN (p - s) // 86400
              ELSE ((SELECT t_end FROM tend) - s) // 86400 END AS t_days,
         CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS event
  FROM signup LEFT JOIN first_p USING (user_id)
)"""


def _surv_table_sql() -> str:
    return _SURV_DAY_TABLE.format(
        MD5GRP=_MD5_52.format(e="'lr:' || user_id::VARCHAR")
    )


ORACLES["logrank_test"] = f"""
WITH {_surv_table_sql()},
per AS (
  SELECT grp, t_days, sum(event)::BIGINT AS d, count(*)::BIGINT AS tot
  FROM tab GROUP BY 1, 2
),
grid AS (
  SELECT g.grp, dy.t_days,
         coalesce(p.d, 0)::BIGINT AS d, coalesce(p.tot, 0)::BIGINT AS tot
  FROM (SELECT DISTINCT t_days FROM per) dy
  CROSS JOIN (SELECT 0 AS grp UNION ALL SELECT 1) g
  LEFT JOIN per p ON p.grp = g.grp AND p.t_days = dy.t_days
),
risk AS (
  SELECT grp, t_days, d,
         sum(tot) OVER (PARTITION BY grp ORDER BY t_days
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT
           AS n_risk
  FROM grid
),
j AS (
  SELECT a.t_days, a.d AS d1, a.n_risk AS n1, b.d AS d0, b.n_risk AS n0
  FROM (SELECT * FROM risk WHERE grp = 1) a
  JOIN (SELECT * FROM risk WHERE grp = 0) b USING (t_days)
  WHERE a.d + b.d > 0
),
terms AS (
  SELECT d1,
         round(d1::DOUBLE - n1::DOUBLE * (d1 + d0)::DOUBLE
                            / (n1 + n0)::DOUBLE, 12)::DECIMAL(38,12)
           AS oe12,
         round(CASE WHEN (n1 + n0) > 1
               THEN (d1 + d0)::DOUBLE * (n1::DOUBLE / (n1 + n0)::DOUBLE)
                    * (1.0 - n1::DOUBLE / (n1 + n0)::DOUBLE)
                    * (((n1 + n0)::DOUBLE - (d1 + d0)::DOUBLE)
                       / ((n1 + n0)::DOUBLE - 1.0))
               ELSE 0.0 END, 12)::DECIMAL(38,12) AS v12
  FROM j
),
sizes AS (
  SELECT grp, count(*)::BIGINT AS n_users, sum(event)::BIGINT AS n_deaths
  FROM tab GROUP BY 1
),
agg AS (
  SELECT sum(oe12)::DOUBLE AS o_minus_e, sum(v12)::DOUBLE AS var_sum
  FROM terms
)
SELECT (SELECT n_users FROM sizes WHERE grp = 0) AS n_users_0,
       (SELECT n_users FROM sizes WHERE grp = 1) AS n_users_1,
       (SELECT n_deaths FROM sizes WHERE grp = 0) AS n_deaths_0,
       (SELECT n_deaths FROM sizes WHERE grp = 1) AS n_deaths_1,
       round(o_minus_e, 6) AS o_minus_e,
       round(var_sum, 6) AS var_sum,
       round(o_minus_e / sqrt(var_sum), 6) AS z_stat
FROM agg
"""

ORACLES["rmst_survival"] = f"""
WITH {_surv_table_sql()},
per AS (
  SELECT t_days, sum(event)::BIGINT AS d, count(*)::BIGINT AS tot
  FROM tab GROUP BY 1
),
risk AS (
  SELECT t_days, d,
         sum(tot) OVER (ORDER BY t_days
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT
           AS n_risk
  FROM per
),
deaths AS (SELECT * FROM risk WHERE d > 0),
surv AS (
  SELECT t_days, d, n_risk,
         sum(CASE WHEN d < n_risk
                  THEN round(ln(1.0 - d::DOUBLE / n_risk::DOUBLE), 12)
                  ELSE 0.0 END::DECIMAL(28,12))
           OVER (ORDER BY t_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lns,
         sum(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
           OVER (ORDER BY t_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS any_dead,
         lead(t_days) OVER (ORDER BY t_days) AS t_next
  FROM deaths
),
terms AS (
  SELECT round(
           (CASE WHEN any_dead > 0 THEN 0.0
                 ELSE exp(lns::DOUBLE) END)
           * greatest(least(coalesce(t_next, {RMST_TAU_DAYS})::DOUBLE,
                            {float(RMST_TAU_DAYS)!r})
                      - least(t_days::DOUBLE, {float(RMST_TAU_DAYS)!r}),
                      0.0), 12)::DECIMAL(38,12) AS a12
  FROM surv
),
head AS (
  SELECT least(min(t_days)::DOUBLE, {float(RMST_TAU_DAYS)!r}) AS head
  FROM deaths
),
sizes AS (
  SELECT count(*)::BIGINT AS n_users, sum(event)::BIGINT AS n_deaths
  FROM tab
)
SELECT {RMST_TAU_DAYS}::BIGINT AS tau_days, n_users, n_deaths,
       round((SELECT head FROM head)
             + (SELECT sum(a12)::DOUBLE FROM terms), 6) AS rmst_days
FROM sizes
"""

ORACLES["price_elasticity_ols"] = """
WITH li AS (
  SELECT round(ln(l_extendedprice / l_quantity), 12) AS x,
         round(ln(l_quantity), 12) AS y
  FROM lineitem
),
terms AS (
  SELECT x::DECIMAL(28,12) AS x12, y::DECIMAL(28,12) AS y12,
         round(x * y, 12)::DECIMAL(38,12) AS xy12,
         round(x * x, 12)::DECIMAL(38,12) AS xx12,
         round(y * y, 12)::DECIMAL(38,12) AS yy12
  FROM li
),
g AS (
  SELECT count(*)::BIGINT AS n,
         sum(x12)::DOUBLE AS sx, sum(y12)::DOUBLE AS sy,
         sum(xy12)::DOUBLE AS sxy, sum(xx12)::DOUBLE AS sxx,
         sum(yy12)::DOUBLE AS syy
  FROM terms
)
SELECT n,
       round((n::DOUBLE * sxy - sx * sy)
             / (n::DOUBLE * sxx - sx * sx), 6) AS elasticity,
       round((sy - ((n::DOUBLE * sxy - sx * sy)
                    / (n::DOUBLE * sxx - sx * sx)) * sx)
             / n::DOUBLE, 6) AS intercept,
       round(((n::DOUBLE * sxy - sx * sy) * (n::DOUBLE * sxy - sx * sy))
             / ((n::DOUBLE * sxx - sx * sx)
                * (n::DOUBLE * syy - sy * sy)), 6) AS r2
FROM g
"""

# ---- batch 130: Breslow-Day, Tukey HSD, G-test -----------------------------

from lucene_mapreduce_spark.operators.parity import (  # noqa: E402
    MH_EXPOSURE_TOKEN,
    MH_OUTCOME_TOKEN,
    TUKEY_Q_CRIT,
)

ORACLES["breslow_day_test"] = f"""
WITH t AS (
  SELECT lang,
         list_contains({TOKS}, '{MH_EXPOSURE_TOKEN}') AS e,
         list_contains({TOKS}, '{MH_OUTCOME_TOKEN}') AS o
  FROM documents
),
cells AS (
  SELECT lang,
         sum(CASE WHEN e AND o THEN 1 ELSE 0 END)::BIGINT AS a,
         sum(CASE WHEN e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS b,
         sum(CASE WHEN NOT e AND o THEN 1 ELSE 0 END)::BIGINT AS c,
         sum(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS d
  FROM t GROUP BY 1
),
pooled AS (
  SELECT sum(round((a * d)::DOUBLE / (a + b + c + d)::DOUBLE,
                   12)::DECIMAL(38,12))::DOUBLE AS s_ad,
         sum(round((b * c)::DOUBLE / (a + b + c + d)::DOUBLE,
                   12)::DECIMAL(38,12))::DOUBLE AS s_bc
  FROM cells
),
s2 AS (
  SELECT lang, a, b, c, d,
         (a + b)::DOUBLE AS r1, (a + c)::DOUBLE AS c1,
         (a + b + c + d)::DOUBLE AS nn,
         s_ad / s_bc - 1.0 AS qa,
         s_ad / s_bc AS orr
  FROM cells, pooled
),
s3 AS (
  SELECT *, -(qa * (r1 + c1) + nn) AS qb, orr * r1 * c1 AS qc
  FROM s2
),
s4 AS (
  SELECT *, sqrt(qb * qb - 4.0 * qa * qc) AS disc FROM s3
),
s5 AS (
  SELECT *, (-qb - disc) / (2.0 * qa) AS root_m,
         (-qb + disc) / (2.0 * qa) AS root_p
  FROM s4
),
s6 AS (
  SELECT *,
         CASE WHEN abs(qa) < 1e-12 THEN -qc / qb
              WHEN root_m >= 0 AND r1 - root_m >= 0 AND c1 - root_m >= 0
                   AND nn - r1 - c1 + root_m >= 0 THEN root_m
              ELSE root_p END AS a_exp
  FROM s5
),
terms AS (
  SELECT round((a::DOUBLE - a_exp) * (a::DOUBLE - a_exp)
               / (1.0 / (1.0 / a_exp + 1.0 / (r1 - a_exp)
                         + 1.0 / (c1 - a_exp)
                         + 1.0 / (nn - r1 - c1 + a_exp))),
               12)::DECIMAL(38,12) AS t12
  FROM s6
)
SELECT count(*)::BIGINT AS n_strata,
       (count(*) - 1)::BIGINT AS df,
       round(sum(t12)::DOUBLE, 6) AS bd_stat
FROM terms
"""

ORACLES["tukey_hsd_pairs"] = f"""
WITH ev AS (
  SELECT event_type,
         round(value, 6)::DECIMAL(18,6) AS v,
         round(value * value, 12)::DECIMAL(38,12) AS vv
  FROM events
),
per AS (
  SELECT event_type, count(*)::BIGINT AS n,
         sum(v)::DOUBLE AS s, sum(vv)::DOUBLE AS ss
  FROM ev GROUP BY 1
),
msw AS (
  SELECT sum(round(ss - s * (s / n::DOUBLE), 12)::DECIMAL(38,12))::DOUBLE
           / (sum(n) - count(*))::DOUBLE AS msw
  FROM per
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       a.n AS na, b.n AS nb,
       round(a.s / a.n::DOUBLE - b.s / b.n::DOUBLE, 6) AS mean_diff,
       round(abs(a.s / a.n::DOUBLE - b.s / b.n::DOUBLE)
             / sqrt((msw / 2.0)
                    * (1.0 / a.n::DOUBLE + 1.0 / b.n::DOUBLE)), 6)
         AS q_stat,
       (CASE WHEN abs(a.s / a.n::DOUBLE - b.s / b.n::DOUBLE)
                  / sqrt((msw / 2.0)
                         * (1.0 / a.n::DOUBLE + 1.0 / b.n::DOUBLE))
                  > {TUKEY_Q_CRIT!r}
             THEN 1 ELSE 0 END)::INT AS significant
FROM per a JOIN per b ON a.event_type < b.event_type, msw
ORDER BY type_a, type_b
"""

ORACLES["g_test_lang_source"] = """
WITH cells AS (
  SELECT lang, source, count(*)::BIGINT AS o
  FROM documents GROUP BY 1, 2
),
rm AS (SELECT lang, sum(o)::BIGINT AS rl FROM cells GROUP BY 1),
cm AS (SELECT source, sum(o)::BIGINT AS cs FROM cells GROUP BY 1),
tot AS (SELECT sum(o)::BIGINT AS n FROM cells),
terms AS (
  SELECT round(2.0 * o::DOUBLE
               * ln(o::DOUBLE
                    / (rl::DOUBLE * cs::DOUBLE / n::DOUBLE)),
               12)::DECIMAL(38,12) AS t12
  FROM cells JOIN rm USING (lang) JOIN cm USING (source), tot
),
dims AS (
  SELECT count(DISTINCT lang)::BIGINT AS r,
         count(DISTINCT source)::BIGINT AS c
  FROM cells
)
SELECT n, r, c, ((r - 1) * (c - 1))::BIGINT AS df,
       round(sum(t12)::DOUBLE, 6) AS g_stat
FROM terms, dims, tot
GROUP BY n, r, c
"""

# ---- batch 131: in-batch collisions, join-order cost, impact quantization --

from lucene_mapreduce_spark.operators.textstats import (  # noqa: E402
    INBATCH_SIZES,
)


def _inbatch_leg(b: int, oname: str, okey: str) -> str:
    """Manual ntile (first n%k buckets get base+1) with a
    data-dependent bucket count — DuckDB's ntile needs a constant."""
    return f"""
SELECT {b}::BIGINT AS batch_size, '{oname}' AS order_mode,
       count(DISTINCT batch)::BIGINT AS n_batches,
       sum(pairs)::BIGINT AS collision_pairs,
       round(sum(pairs)::DOUBLE / count(DISTINCT batch)::DOUBLE, 6)
         AS pairs_per_batch
FROM (
  SELECT batch, source, count(*) * (count(*) - 1) // 2 AS pairs
  FROM (
    SELECT source,
           CASE WHEN rn <= (nb + 1) * ex
                THEN (rn - 1) // (nb + 1) + 1
                ELSE ex + (rn - ex * (nb + 1) - 1) // nb + 1 END AS batch
    FROM (
      SELECT source, row_number() OVER (ORDER BY {okey}) AS rn,
             (SELECT count(*) FROM documents)
               // greatest(1, (SELECT count(*) FROM documents) // {b}) AS nb,
             (SELECT count(*) FROM documents)
               % greatest(1, (SELECT count(*) FROM documents) // {b}) AS ex
      FROM documents
    )
  )
  GROUP BY 1, 2
)"""


_INBATCH_SHUF_KEY = (
    "(" + _MD5_52.format(e="doc_id::VARCHAR") + "), doc_id"
)

ORACLES["inbatch_collision_report"] = (
    "\nUNION ALL\n".join(
        _inbatch_leg(b, oname, okey)
        for b in INBATCH_SIZES
        for oname, okey in (
            ("arrival", "doc_id"),
            ("shuffled", _INBATCH_SHUF_KEY),
        )
    )
    + "\nORDER BY batch_size, order_mode"
)

ORACLES["join_order_cost_audit"] = """
WITH nc AS (SELECT count(*)::BIGINT AS n FROM customer),
nl AS (SELECT count(*)::BIGINT AS n FROM lineitem),
co AS (
  SELECT count(*)::BIGINT AS n
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
ol AS (
  SELECT count(*)::BIGINT AS n
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
plans AS (
  SELECT 'co_then_l' AS plan, (SELECT n FROM co) AS intermediate_rows,
         (SELECT n FROM ol) AS final_rows
  UNION ALL
  SELECT 'ol_then_c', (SELECT n FROM ol), (SELECT n FROM ol)
  UNION ALL
  SELECT 'cl_cross_then_o',
         (SELECT n FROM nc) * (SELECT n FROM nl), (SELECT n FROM ol)
),
costed AS (
  SELECT plan, intermediate_rows, final_rows,
         (intermediate_rows + final_rows)::BIGINT AS cost_cout
  FROM plans
)
SELECT plan, intermediate_rows, final_rows, cost_cout,
       round(cost_cout::DOUBLE
             / (SELECT min(cost_cout) FROM costed)::DOUBLE, 6) AS blowup
FROM costed ORDER BY plan
"""

ORACLES["impact_quantization_audit"] = f"""
WITH docs AS (SELECT doc_id, {TOKS} AS toks FROM documents),
tf AS (
  SELECT term, doc_id, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM docs)
  GROUP BY 1, 2
),
q AS (
  SELECT term, tf,
         CASE WHEN tf >= 8 THEN 3 WHEN tf >= 4 THEN 2
              WHEN tf >= 2 THEN 1 ELSE 0 END AS bk,
         CASE WHEN tf >= 8 THEN 8 WHEN tf >= 4 THEN 4
              WHEN tf >= 2 THEN 2 ELSE 1 END AS ql
  FROM tf
),
per_term AS (
  SELECT term, count(*)::BIGINT AS df,
         count(DISTINCT tf)::BIGINT AS n_tf,
         count(DISTINCT bk)::BIGINT AS n_buckets,
         max(round((tf - ql)::DOUBLE / tf::DOUBLE, 6)) AS max_underest
  FROM q GROUP BY 1
)
SELECT (length(df::VARCHAR) - 1)::BIGINT AS decade,
       count(*)::BIGINT AS n_terms,
       round(sum(n_tf)::DOUBLE / count(*)::DOUBLE, 6) AS mean_distinct_tf,
       round(sum(n_buckets)::DOUBLE / count(*)::DOUBLE, 6)
         AS mean_distinct_buckets,
       round(sum(max_underest::DECIMAL(18,6))::DOUBLE
             / count(*)::DOUBLE, 6) AS mean_max_underest
FROM per_term GROUP BY 1 ORDER BY 1
"""

# ---- batch 132: Erlang-C, Theta backtest, binseg changepoint ---------------

from lucene_mapreduce_spark.operators.parity import (  # noqa: E402
    ERLANG_MAX_C,
    ERLANG_MU_PER_S,
    THETA_ALPHA,
    THETA_H_TEST,
    THETA_LN_1MA,
    erlang_c_terms,
)


def _erlang_leg(c: int) -> str:
    lows, top = erlang_c_terms("a", c)
    qexpr = f"({top}) * ({float(c)!r} / ({float(c)!r} - a))"
    sum_low = " + ".join(lows)
    return f"""
SELECT {c}::BIGINT AS servers, peak,
       round(a, 6) AS offered_load,
       round(CASE WHEN a >= {float(c)!r} THEN 1.0
                  ELSE ({qexpr}) / (({sum_low}) + ({qexpr})) END, 6)
         AS p_wait,
       (CASE WHEN a < {float(c)!r} THEN 1 ELSE 0 END)::INT AS stable
FROM base"""


ORACLES["erlang_c_staffing"] = (
    f"""
WITH hourly AS (
  SELECT epoch_us(ts) // 3600000000 AS h, count(*)::BIGINT AS n
  FROM events GROUP BY 1
),
peak AS (SELECT max(n)::BIGINT AS peak FROM hourly),
base AS (
  SELECT peak, peak::DOUBLE / 3600.0 / {ERLANG_MU_PER_S!r} AS a FROM peak
)
"""
    + "\nUNION ALL\n".join(_erlang_leg(c) for c in range(1, ERLANG_MAX_C + 1))
    + "\nORDER BY servers"
)

ORACLES["theta_forecast_backtest"] = f"""
WITH {_DAILY_HIST},
idx AS (
  SELECT row_number() OVER (ORDER BY day)::BIGINT AS i,
         n_events::BIGINT AS y
  FROM hist
),
nd AS (SELECT count(*)::BIGINT AS n_days FROM idx),
train AS (
  SELECT * FROM idx
  WHERE i <= (SELECT n_days FROM nd) - {THETA_H_TEST}
),
g AS (
  SELECT count(*)::BIGINT AS n, sum(i)::BIGINT AS si,
         sum(i * i)::BIGINT AS sii, sum(y)::BIGINT AS sy,
         sum(i * y)::BIGINT AS siy
  FROM train
),
ses AS (
  SELECT list_reduce(ys, (acc, y) -> {THETA_ALPHA!r} * y
                             + {1.0 - THETA_ALPHA!r} * acc) AS level
  FROM (SELECT list(y::DOUBLE ORDER BY i) AS ys FROM train)
),
consts AS (
  SELECT n AS n_train,
         round((n::DOUBLE * siy::DOUBLE - si::DOUBLE * sy::DOUBLE)
               / (n::DOUBLE * sii::DOUBLE - si::DOUBLE * si::DOUBLE), 12)
           AS b,
         round((SELECT level FROM ses), 12) AS level,
         round((1.0 - exp(n::DOUBLE * {THETA_LN_1MA!r}))
               / {THETA_ALPHA!r}, 12) AS damp
  FROM g
),
test AS (
  SELECT (i - (SELECT n_days FROM nd) + {THETA_H_TEST})::DOUBLE AS j,
         y::DOUBLE AS y
  FROM idx WHERE i > (SELECT n_days FROM nd) - {THETA_H_TEST}
),
terms AS (
  SELECT n_train, level, b,
         round(abs(y - (level + (b / 2.0) * ((j - 1.0) + damp))),
               12)::DECIMAL(38,12) AS e12
  FROM test, consts
)
SELECT n_train, count(*)::BIGINT AS n_test,
       round(level, 6) AS ses_level, round(b, 6) AS trend_slope,
       round(sum(e12)::DOUBLE / count(*)::DOUBLE, 6) AS mae
FROM terms GROUP BY n_train, level, b
"""

ORACLES["binseg_changepoint"] = f"""
WITH {_DAILY_HIST},
idx AS (
  SELECT day::VARCHAR AS day,
         row_number() OVER (ORDER BY day)::BIGINT AS k,
         sum(n_events) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS sk
  FROM hist
),
g AS (
  SELECT count(*)::BIGINT AS n, sum(n_events)::BIGINT AS s FROM hist
),
scored AS (
  SELECT day, k, n, s, sk,
         round(((n::DOUBLE * sk::DOUBLE - k::DOUBLE * s::DOUBLE)
                * (n::DOUBLE * sk::DOUBLE - k::DOUBLE * s::DOUBLE))
               / (n::DOUBLE * k::DOUBLE * (n::DOUBLE - k::DOUBLE)), 6)
           AS gain
  FROM idx, g WHERE k < n
)
SELECT n AS n_days, day AS split_after_day, k AS split_k, gain,
       round(sk::DOUBLE / k::DOUBLE, 6) AS mean_left,
       round((s - sk)::DOUBLE / (n - k)::DOUBLE, 6) AS mean_right
FROM (
  SELECT *, row_number() OVER (ORDER BY gain DESC, k ASC) AS r
  FROM scored
) WHERE r = 1
"""

# ---- batch 133: ILD, Poisson dispersion, DPP benefit -----------------------

from lucene_mapreduce_spark.operators.parity import (  # noqa: E402
    POISSON_CHI2_CRIT_DF29,
)
from lucene_mapreduce_spark.operators.relational import (  # noqa: E402
    DPP_N_FILES,
    DPP_PRIORITY,
    DPP_WINDOW,
)
from lucene_mapreduce_spark.operators.similarity import ILD_K  # noqa: E402

ORACLES["result_diversity_ild"] = f"""
WITH q AS (
  SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0
),
page AS (
  SELECT vec_id FROM (
    SELECT vec_id,
           row_number() OVER (
             ORDER BY round(list_dot_product(embedding::DOUBLE[], qvec)
                   / (sqrt(list_dot_product(embedding::DOUBLE[],
                                            embedding::DOUBLE[]))
                      * sqrt(list_dot_product(qvec, qvec))), 6) DESC,
             vec_id ASC) AS r
    FROM embeddings, q WHERE vec_id <> 0
  ) WHERE r <= {ILD_K}
),
vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v
  FROM embeddings JOIN page USING (vec_id)
),
pairs AS (
  SELECT round(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))), 6)::DECIMAL(18,6)
           AS c6
  FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id
)
SELECT {ILD_K}::BIGINT AS k, count(*)::BIGINT AS n_pairs,
       round(1.0 - sum(c6)::DOUBLE / count(*)::DOUBLE, 6) AS mean_ild,
       min(c6)::DOUBLE AS min_pair_cos,
       max(c6)::DOUBLE AS max_pair_cos
FROM pairs
"""

ORACLES["poisson_dispersion_test"] = f"""
WITH {_DAILY_HIST},
ev AS (SELECT ts::DATE::VARCHAR AS day, event_type FROM events),
types AS (
  SELECT DISTINCT event_type FROM ev
  UNION ALL SELECT 'all'
),
per AS (
  SELECT day, event_type, count(*)::BIGINT AS c FROM ev GROUP BY 1, 2
  UNION ALL
  SELECT day, 'all', count(*)::BIGINT FROM ev GROUP BY day
),
grid AS (
  SELECT t.event_type, coalesce(p.c, 0)::BIGINT AS c
  FROM hist h CROSS JOIN types t
  LEFT JOIN per p ON p.day = h.day::VARCHAR
                 AND p.event_type = t.event_type
),
g AS (
  SELECT event_type, count(*)::BIGINT AS n, sum(c)::BIGINT AS s,
         sum(c * c)::BIGINT AS ss
  FROM grid GROUP BY 1
)
SELECT event_type, n,
       round(s::DOUBLE / n::DOUBLE, 6) AS mean_daily,
       round((ss::DOUBLE - s::DOUBLE * (s::DOUBLE / n::DOUBLE))
             / (n::DOUBLE - 1.0), 6) AS var_daily,
       round((n::DOUBLE - 1.0)
             * ((ss::DOUBLE - s::DOUBLE * (s::DOUBLE / n::DOUBLE))
                / (n::DOUBLE - 1.0))
             / (s::DOUBLE / n::DOUBLE), 6) AS dispersion_stat,
       (CASE WHEN (n::DOUBLE - 1.0)
                  * ((ss::DOUBLE - s::DOUBLE * (s::DOUBLE / n::DOUBLE))
                     / (n::DOUBLE - 1.0))
                  / (s::DOUBLE / n::DOUBLE) > {POISSON_CHI2_CRIT_DF29!r}
             THEN 1 ELSE 0 END)::INT AS overdispersed
FROM g ORDER BY event_type
"""

ORACLES["dpp_benefit_audit"] = f"""
WITH keys AS (
  SELECT o_orderkey AS k FROM orders
  WHERE o_orderpriority = '{DPP_PRIORITY}'
    AND o_orderdate >= TIMESTAMP '{DPP_WINDOW[0]}'
    AND o_orderdate < TIMESTAMP '{DPP_WINDOW[1]}'
),
files AS (
  SELECT f, min(l_orderkey) AS lo, max(l_orderkey) AS hi,
         count(*)::BIGINT AS n_rows
  FROM (SELECT ntile({DPP_N_FILES})
                 OVER (ORDER BY l_orderkey, l_linenumber) AS f,
               l_orderkey
        FROM lineitem)
  GROUP BY f
),
hit_files AS (
  SELECT DISTINCT f FROM keys JOIN files ON k BETWEEN lo AND hi
),
hit_stats AS (
  SELECT count(*)::BIGINT AS files_read_dpp,
         sum(n_rows)::BIGINT AS rows_scanned_dpp
  FROM files JOIN hit_files USING (f)
),
totals AS (
  SELECT count(*)::BIGINT AS n_files, sum(n_rows)::BIGINT AS rows_total
  FROM files
),
matched AS (
  SELECT count(*)::BIGINT AS rows_matched
  FROM lineitem JOIN keys ON l_orderkey = k
)
SELECT n_files, files_read_dpp,
       (n_files - files_read_dpp)::BIGINT AS files_skipped,
       rows_total, rows_scanned_dpp, rows_matched,
       round(rows_scanned_dpp::DOUBLE / rows_matched::DOUBLE, 6)
         AS read_amplification
FROM totals, hit_stats, matched
"""

# ---- batch 134: filter order, Little's law, NQC/WIG ------------------------

from itertools import permutations as _perms  # noqa: E402

from lucene_mapreduce_spark.operators.relational import (  # noqa: E402
    FILTER_DISC_MIN,
    FILTER_PREDS,
    FILTER_QTY_MAX,
    FILTER_SHIP_WINDOW,
    LITTLE_WINDOW,
    LITTLE_WINDOW_DAYS,
    _day_number,
)

_FO_SUBSET = {
    "qty": "q", "disc": "d", "ship": "s",
}


def _fo_count(preds: tuple) -> str:
    if not preds:
        return "n"
    prod = " * ".join(_FO_SUBSET[p] for p in preds)
    return f"sum({prod})::BIGINT"


def _filter_order_sql() -> str:
    legs = []
    for perm in _perms(FILTER_PREDS):
        name = "_".join(perm)
        legs.append(f"""
SELECT '{name}' AS filter_order,
       ((SELECT n FROM g) + (SELECT c1 FROM g_{name})
        + (SELECT c2 FROM g_{name}))::BIGINT AS rows_inspected,
       (SELECT c3 FROM g_{name})::BIGINT AS rows_out""")
    percte = []
    for perm in _perms(FILTER_PREDS):
        name = "_".join(perm)
        percte.append(
            f"g_{name} AS (SELECT {_fo_count(perm[:1])} AS c1,"
            f" {_fo_count(perm[:2])} AS c2,"
            f" {_fo_count(perm)} AS c3 FROM flags)"
        )
    return (
        f"""
WITH flags AS (
  SELECT CASE WHEN l_quantity <= {FILTER_QTY_MAX!r} THEN 1 ELSE 0 END AS q,
         CASE WHEN l_discount >= {FILTER_DISC_MIN!r} THEN 1 ELSE 0 END AS d,
         CASE WHEN l_shipdate >= TIMESTAMP '{FILTER_SHIP_WINDOW[0]}'
               AND l_shipdate < TIMESTAMP '{FILTER_SHIP_WINDOW[1]}'
              THEN 1 ELSE 0 END AS s
  FROM lineitem
),
g AS (SELECT count(*)::BIGINT AS n FROM flags),
"""
        + ",\n".join(percte)
        + ",\ncosted AS (\n"
        + "\nUNION ALL\n".join(legs)
        + "\n)\n"
        + """
SELECT filter_order, rows_inspected, rows_out,
       round(rows_inspected::DOUBLE
             / (SELECT min(rows_inspected) FROM costed)::DOUBLE, 6)
         AS blowup
FROM costed ORDER BY filter_order
"""
    )


ORACLES["filter_order_audit"] = _filter_order_sql()

_LL_LO = _day_number(LITTLE_WINDOW[0])
_LL_HI = _day_number(LITTLE_WINDOW[1])

ORACLES["littles_law_audit"] = f"""
WITH done AS (
  SELECT l_orderkey, max(l_shipdate) AS done FROM lineitem GROUP BY 1
),
o AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS a,
         epoch_us(done) // 86400000000 AS z
  FROM orders JOIN done ON o_orderkey = l_orderkey
),
arr AS (
  SELECT count(*)::BIGINT AS n_arrivals,
         sum(z - a)::BIGINT AS sum_sojourn
  FROM o WHERE a >= {_LL_LO} AND a < {_LL_HI}
),
lw AS (
  SELECT sum(greatest(0, least(z, {_LL_HI})
                      - greatest(a, {_LL_LO})))::BIGINT AS sum_overlap
  FROM o
)
SELECT n_arrivals,
       round(n_arrivals::DOUBLE / {float(LITTLE_WINDOW_DAYS)!r}, 6)
         AS lambda_per_day,
       round(sum_sojourn::DOUBLE / n_arrivals::DOUBLE, 6) AS w_days,
       round(sum_overlap::DOUBLE / {float(LITTLE_WINDOW_DAYS)!r}, 6)
         AS l_avg,
       round((sum_overlap::DOUBLE / {float(LITTLE_WINDOW_DAYS)!r})
             / ((n_arrivals::DOUBLE / {float(LITTLE_WINDOW_DAYS)!r})
                * (sum_sojourn::DOUBLE / n_arrivals::DOUBLE)), 6)
         AS little_ratio
FROM arr, lw
"""


def nqc_wig_sql(query_text: str, k: int = 50) -> str:
    """nqc_wig_predictors twin: the bm25_topk_sql scoring CTEs, scores
    rounded 6dp, moments over the rounded page and the full matched
    set as DECIMAL sums."""
    qlit = query_text.replace("'", "''")
    from lucene_mapreduce_spark.functions.tokenize import tokenize_string

    n_q = len(set(tokenize_string(query_text)))
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
dft AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
scored AS (
  SELECT p.doc_id,
         ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * (p.tf * {K1 + 1.0}) / (p.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl))
           AS contrib
  FROM postings p
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
),
agg AS (
  SELECT doc_id, round(sum(contrib), 6) AS score FROM scored GROUP BY 1
),
topk AS (
  SELECT score FROM (
    SELECT score, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
    FROM agg
  ) WHERE r <= {k}
),
ts AS (
  SELECT count(*)::BIGINT AS k_used,
         sum(score::DECIMAL(18,6))::DOUBLE AS ts,
         sum(round(score * score, 12)::DECIMAL(38,12))::DOUBLE AS tss
  FROM topk
),
cstat AS (
  SELECT count(*)::BIGINT AS n_matched,
         sum(score::DECIMAL(18,6))::DOUBLE AS cs_sum
  FROM agg
)
SELECT k_used, n_matched,
       round(ts / k_used::DOUBLE, 6) AS mean_topk,
       round(sqrt(tss / k_used::DOUBLE
                  - (ts / k_used::DOUBLE) * (ts / k_used::DOUBLE)), 6)
         AS std_topk,
       round(cs_sum / n_matched::DOUBLE, 6) AS corpus_mean_score,
       round(sqrt(tss / k_used::DOUBLE
                  - (ts / k_used::DOUBLE) * (ts / k_used::DOUBLE))
             / (cs_sum / n_matched::DOUBLE), 6) AS nqc,
       round((ts / k_used::DOUBLE - cs_sum / n_matched::DOUBLE)
             / sqrt({float(n_q)!r}), 6) AS wig
FROM ts, cstat
"""

# ---- batch 135: rich club, circadian regularity, ratio-to-MA ---------------

from lucene_mapreduce_spark.operators.parity import _LN24  # noqa: E402
from lucene_mapreduce_spark.operators.relational import (  # noqa: E402
    RICH_CLUB_KS,
)


def _rich_club_leg(k: int) -> str:
    return f"""
SELECT {k}::BIGINT AS k,
       (SELECT count(*) FROM deg WHERE deg > {k})::BIGINT AS n_nodes,
       (SELECT count(*) FROM e
        WHERE pa IN (SELECT node FROM deg WHERE deg > {k})
          AND pb IN (SELECT node FROM deg WHERE deg > {k}))::BIGINT
         AS n_edges,
       CASE WHEN (SELECT count(*) FROM deg WHERE deg > {k}) >= 2
            THEN round(2.0 * (SELECT count(*) FROM e
                              WHERE pa IN (SELECT node FROM deg
                                           WHERE deg > {k})
                                AND pb IN (SELECT node FROM deg
                                           WHERE deg > {k}))::DOUBLE
                       / ((SELECT count(*) FROM deg WHERE deg > {k})::DOUBLE
                          * ((SELECT count(*) FROM deg
                              WHERE deg > {k})::DOUBLE - 1.0)), 6)
       END AS phi"""


ORACLES["rich_club_coefficient"] = (
    """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
deg AS (
  SELECT node, count(*)::BIGINT AS deg FROM (
    SELECT pa AS node FROM e UNION ALL SELECT pb FROM e
  ) GROUP BY 1
)
"""
    + "\nUNION ALL\n".join(_rich_club_leg(k) for k in RICH_CLUB_KS)
    + "\nORDER BY k"
)

ORACLES["user_circadian_regularity"] = f"""
WITH ev AS (
  SELECT user_id, (epoch_us(ts) // 3600000000) % 24 AS hr FROM events
),
cells AS (
  SELECT user_id, hr, count(*)::BIGINT AS c FROM ev GROUP BY 1, 2
),
tot AS (SELECT user_id, sum(c)::BIGINT AS n FROM cells GROUP BY 1),
ent AS (
  SELECT c.user_id,
         sum(round(-((c.c::DOUBLE / t.n::DOUBLE)
                     * ln(c.c::DOUBLE / t.n::DOUBLE)),
                   12)::DECIMAL(38,12))::DOUBLE AS h
  FROM cells c JOIN tot t USING (user_id)
  GROUP BY 1
),
reg AS (SELECT round(1.0 - h / {_LN24!r}, 6) AS r FROM ent)
SELECT count(*)::BIGINT AS n_users,
       round(sum(r::DECIMAL(18,6))::DOUBLE / count(*)::DOUBLE, 6)
         AS mean_regularity,
       round(quantile_cont(r, 0.25), 6) AS q1,
       round(quantile_cont(r, 0.5), 6) AS median,
       round(quantile_cont(r, 0.75), 6) AS q3
FROM reg
"""

ORACLES["ratio_to_ma_seasonal_indices"] = f"""
WITH {_DAILY_HIST},
idx AS (
  SELECT epoch_us(day::TIMESTAMP) // 86400000000 AS ed,
         n_events::BIGINT AS y
  FROM hist
),
ma AS (
  SELECT ed, y,
         count(*) OVER w AS wn,
         sum(y) OVER w AS ws
  FROM idx
  WINDOW w AS (ORDER BY ed ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
ratio AS (
  SELECT ed % 7 AS dow,
         round(y::DOUBLE / (ws::DOUBLE / 7.0), 12)::DECIMAL(38,12) AS r12
  FROM ma WHERE wn = 7
),
per AS (
  SELECT dow, count(*)::BIGINT AS n_days,
         sum(r12)::DOUBLE / count(*)::DOUBLE AS raw
  FROM ratio GROUP BY 1
),
tot AS (
  SELECT sum(round(raw, 12)::DECIMAL(38,12))::DOUBLE AS s FROM per
)
SELECT dow, n_days, round(raw, 6) AS raw_index,
       round(raw * 7.0 / s, 6) AS norm_index
FROM per, tot ORDER BY dow
"""

# ---- batch 136: distance correlation, Hill index, lateness profile ---------

from lucene_mapreduce_spark.operators.parity import (  # noqa: E402
    DCOR_TYPE_X,
    DCOR_TYPE_Y,
    HILL_K,
    LATENESS_BUCKETS,
)

ORACLES["distance_correlation_daily"] = f"""
WITH {_DAILY_HIST},
ev AS (SELECT ts::DATE::VARCHAR AS day, event_type FROM events),
xs AS (
  SELECT h.day::VARCHAR AS day, coalesce(x.c, 0)::BIGINT AS x
  FROM hist h LEFT JOIN (
    SELECT day, count(*)::BIGINT AS c FROM ev
    WHERE event_type = '{DCOR_TYPE_X}' GROUP BY 1
  ) x ON x.day = h.day::VARCHAR
),
ys AS (
  SELECT h.day::VARCHAR AS day, coalesce(y.c, 0)::BIGINT AS y
  FROM hist h LEFT JOIN (
    SELECT day, count(*)::BIGINT AS c FROM ev
    WHERE event_type = '{DCOR_TYPE_Y}' GROUP BY 1
  ) y ON y.day = h.day::VARCHAR
),
base AS (SELECT xs.day, x, y FROM xs JOIN ys USING (day)),
nn AS (SELECT count(*)::BIGINT AS n FROM base),
pairs AS (
  SELECT i.day AS di, j.day AS dj,
         abs(i.x - j.x)::BIGINT AS ax, abs(i.y - j.y)::BIGINT AS ay
  FROM base i CROSS JOIN base j
),
rws AS (
  SELECT di, sum(ax)::BIGINT AS rx, sum(ay)::BIGINT AS ry
  FROM pairs GROUP BY 1
),
cls AS (
  SELECT dj, sum(ax)::BIGINT AS cx, sum(ay)::BIGINT AS cy
  FROM pairs GROUP BY 1
),
grand AS (SELECT sum(ax)::BIGINT AS gx, sum(ay)::BIGINT AS gy FROM pairs),
cen AS (
  SELECT (p.ax::DOUBLE - r.rx::DOUBLE / (SELECT n FROM nn)::DOUBLE
            - c.cx::DOUBLE / (SELECT n FROM nn)::DOUBLE
            + g.gx::DOUBLE / ((SELECT n FROM nn)::DOUBLE
                              * (SELECT n FROM nn)::DOUBLE)) AS A,
         (p.ay::DOUBLE - r.ry::DOUBLE / (SELECT n FROM nn)::DOUBLE
            - c.cy::DOUBLE / (SELECT n FROM nn)::DOUBLE
            + g.gy::DOUBLE / ((SELECT n FROM nn)::DOUBLE
                              * (SELECT n FROM nn)::DOUBLE)) AS B
  FROM pairs p
  JOIN rws r ON r.di = p.di
  JOIN cls c ON c.dj = p.dj
  CROSS JOIN grand g
),
g2 AS (
  SELECT sum(round(A * B, 12)::DECIMAL(38,12))::DOUBLE AS sab,
         sum(round(A * A, 12)::DECIMAL(38,12))::DOUBLE AS saa,
         sum(round(B * B, 12)::DECIMAL(38,12))::DOUBLE AS sbb
  FROM cen
)
SELECT (SELECT n FROM nn) AS n_days,
       round(sab / ((SELECT n FROM nn)::DOUBLE
                    * (SELECT n FROM nn)::DOUBLE), 6) AS dcov2,
       round(saa / ((SELECT n FROM nn)::DOUBLE
                    * (SELECT n FROM nn)::DOUBLE), 6) AS dvar_x,
       round(sbb / ((SELECT n FROM nn)::DOUBLE
                    * (SELECT n FROM nn)::DOUBLE), 6) AS dvar_y,
       round(sqrt(sab / ((SELECT n FROM nn)::DOUBLE
                         * (SELECT n FROM nn)::DOUBLE))
             / sqrt(sqrt((saa / ((SELECT n FROM nn)::DOUBLE
                                 * (SELECT n FROM nn)::DOUBLE))
                         * (sbb / ((SELECT n FROM nn)::DOUBLE
                                   * (SELECT n FROM nn)::DOUBLE)))),
             6) AS dcor
FROM g2
"""

ORACLES["hill_tail_index"] = f"""
WITH top AS (
  SELECT o_totalprice, r FROM (
    SELECT o_totalprice,
           row_number() OVER (ORDER BY o_totalprice DESC,
                              o_orderkey ASC) AS r
    FROM orders
  ) WHERE r <= {HILL_K + 1}
),
xk1 AS (SELECT o_totalprice AS xk FROM top WHERE r = {HILL_K + 1}),
g AS (
  SELECT (SELECT xk FROM xk1) AS xk,
         sum(round(ln(o_totalprice / (SELECT xk FROM xk1)),
                   12)::DECIMAL(38,12))::DOUBLE AS s
  FROM top WHERE r <= {HILL_K}
)
SELECT {HILL_K}::BIGINT AS k,
       round(xk, 2) AS threshold_x,
       round(s / {float(HILL_K)!r}, 6) AS hill_gamma,
       round(1.0 / round(s / {float(HILL_K)!r}, 6), 6) AS tail_alpha
FROM g
"""

_LB_CASE = "CASE WHEN late_s = 0 THEN 'on_time' " + " ".join(
    (
        f"WHEN late_s >= {lo} AND late_s <= {hi} THEN '{name}'"
        if hi is not None
        else f"WHEN late_s >= {lo} THEN '{name}'"
    )
    for name, lo, hi in LATENESS_BUCKETS[1:]
) + " END"

ORACLES["watermark_lateness_profile"] = f"""
WITH ev AS (
  SELECT event_id, epoch_us(ts) // 1000000 AS es FROM events
),
late AS (
  SELECT (max(es) OVER (ORDER BY es // 600, (list_reduce(list_transform(string_split(substr(md5('arr:' || event_id::VARCHAR), 1, 13), ''), c -> (strpos('0123456789abcdef', c) - 1)::BIGINT), (a, b) -> a * 16 + b)), event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          - es)::BIGINT AS late_s
  FROM ev
),
stats AS (
  SELECT count(*)::BIGINT AS n_events,
         round(quantile_cont(late_s, 0.95), 6) AS p95_late_s
  FROM late
),
per AS (
  SELECT {_LB_CASE} AS bucket, count(*)::BIGINT AS n
  FROM late GROUP BY 1
)
SELECT bucket, n,
       round(n::DOUBLE / n_events::DOUBLE, 6) AS share, p95_late_s
FROM per, stats ORDER BY bucket
"""

# ---- batch 137: tail dependence, GPD POT, records test ---------------------

from lucene_mapreduce_spark.operators.parity import (  # noqa: E402
    GPD_THRESHOLD_Q,
    TAIL_DEP_Q,
)

ORACLES["tail_dependence_daily"] = f"""
WITH {_DAILY_HIST},
ev AS (SELECT ts::DATE::VARCHAR AS day, event_type FROM events),
xs AS (
  SELECT h.day::VARCHAR AS day, coalesce(x.c, 0)::BIGINT AS x
  FROM hist h LEFT JOIN (
    SELECT day, count(*)::BIGINT AS c FROM ev
    WHERE event_type = '{DCOR_TYPE_X}' GROUP BY 1
  ) x ON x.day = h.day::VARCHAR
),
ys AS (
  SELECT h.day::VARCHAR AS day, coalesce(y.c, 0)::BIGINT AS y
  FROM hist h LEFT JOIN (
    SELECT day, count(*)::BIGINT AS c FROM ev
    WHERE event_type = '{DCOR_TYPE_Y}' GROUP BY 1
  ) y ON y.day = h.day::VARCHAR
),
base AS (SELECT xs.day, x, y FROM xs JOIN ys USING (day)),
qs AS (
  SELECT quantile_cont(x, {TAIL_DEP_Q!r}) AS qx,
         quantile_cont(y, {TAIL_DEP_Q!r}) AS qy,
         quantile_cont(x, {1.0 - TAIL_DEP_Q!r}) AS px,
         quantile_cont(y, {1.0 - TAIL_DEP_Q!r}) AS py
  FROM base
),
g AS (
  SELECT count(*)::BIGINT AS n_days,
         sum(CASE WHEN x::DOUBLE > qx THEN 1 ELSE 0 END)::BIGINT AS n_up_x,
         sum(CASE WHEN x::DOUBLE > qx AND y::DOUBLE > qy
                  THEN 1 ELSE 0 END)::BIGINT AS n_up_both,
         sum(CASE WHEN x::DOUBLE <= px THEN 1 ELSE 0 END)::BIGINT AS n_lo_x,
         sum(CASE WHEN x::DOUBLE <= px AND y::DOUBLE <= py
                  THEN 1 ELSE 0 END)::BIGINT AS n_lo_both,
         min(qx) AS qx, min(qy) AS qy
  FROM base, qs
)
SELECT n_days, round(qx, 6) AS qx, round(qy, 6) AS qy,
       n_up_x, n_up_both,
       round(n_up_both::DOUBLE / n_up_x::DOUBLE, 6) AS lambda_upper,
       n_lo_x, n_lo_both,
       round(n_lo_both::DOUBLE / n_lo_x::DOUBLE, 6) AS lambda_lower
FROM g
"""

ORACLES["gpd_pot_fit"] = f"""
WITH u AS (
  SELECT quantile_cont(value, {GPD_THRESHOLD_Q!r}) AS u FROM events
),
ex AS (
  SELECT u,
         round(value - u, 6)::DECIMAL(18,6) AS e,
         round((value - u) * (value - u), 12)::DECIMAL(38,12) AS ee
  FROM events, u WHERE value > u
),
g AS (
  SELECT u, count(*)::BIGINT AS n_exceed,
         sum(e)::DOUBLE AS s, sum(ee)::DOUBLE AS ss
  FROM ex GROUP BY u
)
SELECT round(u, 6) AS threshold, n_exceed,
       round(s / n_exceed::DOUBLE, 6) AS mean_excess,
       round((ss - s * (s / n_exceed::DOUBLE))
             / (n_exceed::DOUBLE - 1.0), 6) AS var_excess,
       round((1.0 - ((s / n_exceed::DOUBLE) * (s / n_exceed::DOUBLE))
                    / ((ss - s * (s / n_exceed::DOUBLE))
                       / (n_exceed::DOUBLE - 1.0))) / 2.0, 6) AS xi,
       round((s / n_exceed::DOUBLE)
             * (1.0 + ((s / n_exceed::DOUBLE) * (s / n_exceed::DOUBLE))
                      / ((ss - s * (s / n_exceed::DOUBLE))
                         / (n_exceed::DOUBLE - 1.0))) / 2.0, 6) AS sigma
FROM g
"""

ORACLES["records_test_daily"] = f"""
WITH {_DAILY_HIST},
rec AS (
  SELECT CASE WHEN max(n_events) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 IS NULL
              OR n_events > max(n_events) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS is_rec
  FROM hist
),
nn AS (SELECT count(*)::BIGINT AS n FROM hist),
harm AS (
  SELECT sum(round(1.0 / i::DOUBLE, 12)::DECIMAL(38,12))::DOUBLE AS hn,
         sum(round(1.0 / (i::DOUBLE * i::DOUBLE),
                   12)::DECIMAL(38,12))::DOUBLE AS hn2
  FROM (SELECT unnest(range(1, (SELECT n FROM nn) + 1))::BIGINT AS i)
),
g AS (SELECT sum(is_rec)::BIGINT AS n_records FROM rec)
SELECT (SELECT n FROM nn) AS n_days, n_records,
       round(hn, 6) AS expected_records,
       round(hn - hn2, 6) AS var_records,
       round((n_records::DOUBLE - hn) / sqrt(hn - hn2), 6) AS z_stat
FROM g, harm
"""

# ---- batch 138: query segmentation, shard merge, position bytes ------------

from lucene_mapreduce_spark.operators.textstats import (  # noqa: E402
    PMI_SEG_MIN_COUNT,
    PMI_SEG_THRESHOLD,
)


def query_segmentation_sql(query_text: str) -> str:
    from lucene_mapreduce_spark.functions.tokenize import tokenize_string

    q = tokenize_string(query_text)
    pair_vals = ", ".join(
        f"({i + 1}, '{q[i]}', '{q[i + 1]}')" for i in range(len(q) - 1)
    )
    return f"""
WITH pairs AS (
  SELECT * FROM (VALUES {pair_vals}) AS p(pos, w1, w2)
),
docs AS (SELECT {TOKS} AS toks FROM documents),
uni AS (
  SELECT w, count(*)::BIGINT AS c
  FROM (SELECT unnest(toks) AS w FROM docs) GROUP BY 1
),
nu AS (SELECT sum(len(toks))::BIGINT AS nu FROM docs),
bi AS (
  SELECT w1, w2, count(*)::BIGINT AS c_ab FROM (
    SELECT toks[i] AS w1, toks[i + 1] AS w2
    FROM (SELECT toks, unnest(range(1, len(toks)))::INT AS i
          FROM docs WHERE len(toks) >= 2)
  ) GROUP BY 1, 2
),
nb AS (
  SELECT sum(greatest(len(toks) - 1, 0))::BIGINT AS nb FROM docs
),
j AS (
  SELECT p.pos, p.w1, p.w2,
         coalesce(u1.c, 0)::BIGINT AS c1, coalesce(u2.c, 0)::BIGINT AS c2,
         coalesce(b.c_ab, 0)::BIGINT AS c_ab,
         (SELECT nu FROM nu) AS nu, (SELECT nb FROM nb) AS nb
  FROM pairs p
  LEFT JOIN uni u1 ON u1.w = p.w1
  LEFT JOIN uni u2 ON u2.w = p.w2
  LEFT JOIN bi b ON b.w1 = p.w1 AND b.w2 = p.w2
)
SELECT pos, w1, w2, c1, c2, c_ab,
       CASE WHEN c_ab > 0
            THEN round(round(ln((c_ab::DOUBLE / nb::DOUBLE)
                 / ((c1::DOUBLE / nu::DOUBLE)
                    * (c2::DOUBLE / nu::DOUBLE))), 12), 6)
       END AS pmi,
       (CASE WHEN c_ab >= {PMI_SEG_MIN_COUNT}
              AND (CASE WHEN c_ab > 0
                        THEN round(ln((c_ab::DOUBLE / nb::DOUBLE)
                             / ((c1::DOUBLE / nu::DOUBLE)
                                * (c2::DOUBLE / nu::DOUBLE))), 12)
                        ELSE -999.0 END) > {PMI_SEG_THRESHOLD!r}
             THEN 1 ELSE 0 END)::INT AS segment
FROM j ORDER BY pos
"""


from lucene_mapreduce_spark.operators.fulltext import (  # noqa: E402
    SHARD_MERGE_K,
    SHARD_MERGE_LOCAL_K,
    SHARD_MERGE_N,
)


def shard_merge_sql(query_text: str) -> str:
    qlit = query_text.replace("'", "''")
    shard = "(" + _MD5_52.format(e="doc_id::VARCHAR") + f") % {SHARD_MERGE_N}"
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl, ({shard})::INT AS shard
  FROM documents
),
stats AS (
  SELECT shard, count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl
  FROM doclens GROUP BY 1
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
qpost AS (
  SELECT p.doc_id, p.term, p.tf, l.dl, l.shard
  FROM postings p JOIN qterms q USING (term)
  JOIN doclens l USING (doc_id)
),
dfl AS (
  SELECT shard, term, count(*)::DOUBLE AS df_t
  FROM qpost GROUP BY 1, 2
),
local AS (
  SELECT q.shard, q.doc_id,
         round(sum(
           ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
             * (q.tf * {K1 + 1.0})
             / (q.tf + {K1} * (1 - {B} + {B} * q.dl / s.avgdl))
         ), 6) AS local_score
  FROM qpost q
  JOIN dfl d ON d.shard = q.shard AND d.term = q.term
  JOIN stats s ON s.shard = q.shard
  GROUP BY 1, 2
),
top_local AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY shard
               ORDER BY local_score DESC, doc_id ASC) AS lr
    FROM local
  ) WHERE lr <= {SHARD_MERGE_LOCAL_K}
),
merged AS (
  SELECT * FROM (
    SELECT shard, doc_id, local_score,
           row_number() OVER (ORDER BY local_score DESC, doc_id ASC)
             AS merged_rank
    FROM top_local
  ) WHERE merged_rank <= {SHARD_MERGE_K}
),
gpage AS (
  SELECT doc_id, rank AS global_rank
  FROM ({bm25_topk_sql(query_text, SHARD_MERGE_K)})
)
SELECT m.merged_rank, m.doc_id, m.shard, m.local_score, g.global_rank
FROM merged m LEFT JOIN gpage g USING (doc_id)
ORDER BY m.merged_rank
"""


ORACLES["position_gap_bytes_estimate"] = f"""
WITH docs AS (SELECT doc_id, {TOKS} AS toks FROM documents),
occ AS (
  SELECT doc_id, toks[i] AS term, i AS pos
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1))::INT AS i
        FROM docs)
),
gaps AS (
  SELECT term, doc_id,
         (pos - coalesce(lag(pos) OVER (PARTITION BY term, doc_id
                                        ORDER BY pos), 0))::BIGINT AS gap
  FROM occ
),
per_term AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df,
         count(*)::BIGINT AS n_positions,
         sum(1 + CASE WHEN gap >= 128 THEN 1 ELSE 0 END
               + CASE WHEN gap >= 16384 THEN 1 ELSE 0 END)::BIGINT
           AS bytes_est
  FROM gaps GROUP BY 1
)
SELECT (length(df::VARCHAR) - 1)::BIGINT AS decade,
       count(*)::BIGINT AS n_terms,
       sum(n_positions)::BIGINT AS total_positions,
       sum(bytes_est)::BIGINT AS total_bytes,
       round(sum(bytes_est)::DOUBLE / sum(n_positions)::DOUBLE, 6)
         AS bytes_per_position
FROM per_term GROUP BY 1 ORDER BY 1
"""

# ---- batch 139: Greenwood CI, competing risks, salting plan ----------------

from lucene_mapreduce_spark.operators.parity import (  # noqa: E402
    _Z95,
    CR_CAUSES,
)
from lucene_mapreduce_spark.operators.relational import (  # noqa: E402
    SALT_DENOM,
    SALT_TOP_K,
)

ORACLES["km_greenwood_ci"] = f"""
WITH {_surv_table_sql()},
per AS (
  SELECT t_days, sum(event)::BIGINT AS d, count(*)::BIGINT AS tot
  FROM tab GROUP BY 1
),
risk AS (
  SELECT t_days, d,
         sum(tot) OVER (ORDER BY t_days
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT
           AS n_risk
  FROM per
),
deaths AS (SELECT * FROM risk WHERE d > 0),
surv AS (
  SELECT t_days, d, n_risk,
         sum(CASE WHEN d < n_risk
                  THEN round(ln(1.0 - d::DOUBLE / n_risk::DOUBLE), 12)
                  ELSE 0.0 END::DECIMAL(28,12))
           OVER w AS lns,
         sum(CASE WHEN d < n_risk
                  THEN round(d::DOUBLE / (n_risk::DOUBLE
                             * (n_risk::DOUBLE - d::DOUBLE)), 12)
                  ELSE 0.0 END::DECIMAL(28,12))
           OVER w AS gw,
         sum(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER w AS any_dead
  FROM deaths
  WINDOW w AS (ORDER BY t_days
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT t_days, n_risk, d,
       round(CASE WHEN any_dead > 0 THEN 0.0
                  ELSE exp(lns::DOUBLE) END, 6) AS s_km,
       round((CASE WHEN any_dead > 0 THEN 0.0
                   ELSE exp(lns::DOUBLE) END) * sqrt(gw::DOUBLE), 6)
         AS se_greenwood,
       round(greatest((CASE WHEN any_dead > 0 THEN 0.0
                            ELSE exp(lns::DOUBLE) END)
                      - {_Z95!r} * (CASE WHEN any_dead > 0 THEN 0.0
                                         ELSE exp(lns::DOUBLE) END)
                        * sqrt(gw::DOUBLE), 0.0), 6) AS ci_lo,
       round(least((CASE WHEN any_dead > 0 THEN 0.0
                         ELSE exp(lns::DOUBLE) END)
                   + {_Z95!r} * (CASE WHEN any_dead > 0 THEN 0.0
                                      ELSE exp(lns::DOUBLE) END)
                     * sqrt(gw::DOUBLE), 1.0), 6) AS ci_hi
FROM surv ORDER BY t_days
"""

_CR_D_COLS = ", ".join(
    f"sum(CASE WHEN cause = '{c}' THEN 1 ELSE 0 END)::BIGINT AS d_{c}"
    for c in CR_CAUSES
)
_CR_D_ALL = " + ".join(f"d_{c}" for c in CR_CAUSES)
_CR_CAUSES_IN = ", ".join(f"'{c}'" for c in CR_CAUSES)

ORACLES["competing_risks_cif"] = f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) // 1000000 AS es FROM events
),
tend AS (SELECT max(es) AS t_end FROM ev),
signup AS (
  SELECT user_id, min(es) AS s FROM ev
  WHERE event_type = 'signup' GROUP BY 1
),
firsts AS (
  SELECT user_id, event_type AS cause, (es - s) // 86400 AS t_days
  FROM (
    SELECT e.user_id, e.event_type, e.es, g.s,
           row_number() OVER (PARTITION BY e.user_id
                              ORDER BY e.es, e.event_type) AS r
    FROM ev e JOIN signup g ON e.user_id = g.user_id AND e.es > g.s
    WHERE e.event_type IN ({_CR_CAUSES_IN})
  ) WHERE r = 1
),
censored AS (
  SELECT NULL::VARCHAR AS cause,
         ((SELECT t_end FROM tend) - s) // 86400 AS t_days
  FROM signup
  WHERE user_id NOT IN (SELECT user_id FROM firsts)
),
tab AS (
  SELECT cause, t_days FROM firsts
  UNION ALL SELECT cause, t_days FROM censored
),
per AS (
  SELECT t_days, count(*)::BIGINT AS tot, {_CR_D_COLS}
  FROM tab GROUP BY 1
),
risk AS (
  SELECT t_days, {", ".join(f"d_{c}" for c in CR_CAUSES)},
         ({_CR_D_ALL})::BIGINT AS d,
         sum(tot) OVER (ORDER BY t_days
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT
           AS n_risk
  FROM per
),
deaths AS (SELECT * FROM risk WHERE d > 0),
base AS (
  SELECT *,
         coalesce(sum(CASE WHEN d < n_risk
                  THEN round(ln(1.0 - d::DOUBLE / n_risk::DOUBLE), 12)
                  ELSE 0.0 END::DECIMAL(28,12))
           OVER wp, 0::DECIMAL(28,12)) AS lns_prev,
         coalesce(sum(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
           OVER wp, 0) AS dead_prev
  FROM deaths
  WINDOW wp AS (ORDER BY t_days
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
inc AS (
  SELECT t_days, n_risk, {", ".join(f"d_{c}" for c in CR_CAUSES)},
         {", ".join(
             f"round((CASE WHEN dead_prev > 0 THEN 0.0"
             f" ELSE exp(lns_prev::DOUBLE) END)"
             f" * d_{c}::DOUBLE / n_risk::DOUBLE, 12)::DECIMAL(38,12)"
             f" AS i_{c}"
             for c in CR_CAUSES
         )}
  FROM base
)
SELECT t_days, n_risk, {", ".join(f"d_{c}" for c in CR_CAUSES)},
       {", ".join(
           f"round(sum(i_{c}) OVER (ORDER BY t_days"
           f" ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE,"
           f" 6) AS cif_{c}"
           for c in CR_CAUSES
       )}
FROM inc ORDER BY t_days
"""

ORACLES["salt_factor_plan"] = f"""
WITH per AS (
  SELECT l_partkey, count(*)::BIGINT AS n_rows
  FROM lineitem GROUP BY 1
),
tot AS (SELECT sum(n_rows)::BIGINT AS total FROM per),
scored AS (
  SELECT l_partkey, n_rows, total,
         (total + {SALT_DENOM} - 1) // {SALT_DENOM} AS target_rows,
         (n_rows + (total + {SALT_DENOM} - 1) // {SALT_DENOM} - 1)
           // ((total + {SALT_DENOM} - 1) // {SALT_DENOM}) AS salt_factor
  FROM per, tot
),
s2 AS (
  SELECT *,
         (n_rows + salt_factor - 1) // salt_factor AS rows_per_salt
  FROM scored
)
SELECT rank, l_partkey, n_rows, target_rows, salt_factor,
       round(n_rows::DOUBLE / total::DOUBLE, 6) AS share_before,
       round(rows_per_salt::DOUBLE / total::DOUBLE, 6) AS share_after
FROM (
  SELECT *, row_number() OVER (ORDER BY n_rows DESC, l_partkey ASC)
           AS rank
  FROM s2
) WHERE rank <= {SALT_TOP_K} ORDER BY rank
"""

# ---- batch 140: UMass coherence, PFOR vs varbyte, sampled top-k ------------

from lucene_mapreduce_spark.operators.textstats import (  # noqa: E402
    PFOR_BLOCK,
    SAMPLE_TOPK_K,
    SAMPLE_TOPK_MOD,
    UMASS_K,
    UMASS_SOURCE,
)

ORACLES["umass_topic_coherence"] = f"""
WITH docs AS (
  SELECT doc_id, source, {TOKS} AS toks FROM documents
),
topic AS (
  SELECT w, cf, row_number() OVER (ORDER BY cf DESC, w ASC) AS r
  FROM (
    SELECT w, count(*)::BIGINT AS cf
    FROM (SELECT unnest(toks) AS w FROM docs
          WHERE source = '{UMASS_SOURCE}')
    GROUP BY 1
  )
  ORDER BY cf DESC, w ASC LIMIT {UMASS_K}
),
presence AS (
  SELECT DISTINCT d.doc_id, t.w
  FROM (SELECT doc_id, unnest(list_distinct(toks)) AS w FROM docs) d
  JOIN topic t ON t.w = d.w
),
dfreq AS (
  SELECT w, count(*)::BIGINT AS d FROM presence GROUP BY 1
),
codoc AS (
  SELECT a.w AS wi, b.w AS wj, count(*)::BIGINT AS d_ij
  FROM presence a JOIN presence b
    ON a.doc_id = b.doc_id AND a.w <> b.w
  GROUP BY 1, 2
),
pairs AS (
  SELECT ti.w AS wi, tj.w AS wj,
         coalesce(c.d_ij, 0)::BIGINT AS d_ij, f.d AS dj,
         round(ln((coalesce(c.d_ij, 0)::DOUBLE + 1.0) / f.d::DOUBLE), 12)
           AS contrib
  FROM topic ti
  JOIN topic tj ON ti.r > tj.r
  LEFT JOIN codoc c ON c.wi = ti.w AND c.wj = tj.w
  JOIN dfreq f ON f.w = tj.w
),
tot AS (
  SELECT round(sum(contrib::DECIMAL(38,12))::DOUBLE, 6) AS coherence,
         count(*)::BIGINT AS n_pairs
  FROM pairs
)
SELECT wi, wj, d_ij, dj, round(contrib, 6) AS contrib, n_pairs, coherence
FROM pairs, tot ORDER BY wi, wj
"""

_PFOR_BITS = "CASE " + " ".join(
    f"WHEN mx >= {1 << b} THEN {b + 1}"
    for b in range(39, 0, -1)
) + " ELSE 1 END"

ORACLES["pfor_vs_varbyte_audit"] = f"""
WITH docs AS (SELECT doc_id, {TOKS} AS toks FROM documents),
post AS (
  SELECT DISTINCT term, doc_id
  FROM (SELECT doc_id, unnest(list_distinct(toks)) AS term FROM docs)
),
gaps AS (
  SELECT term,
         (doc_id - coalesce(lag(doc_id) OVER w2, -1))::BIGINT AS gap,
         (row_number() OVER w2 - 1) // {PFOR_BLOCK} AS blk
  FROM post
  WINDOW w2 AS (PARTITION BY term ORDER BY doc_id)
),
per_block AS (
  SELECT term, blk, count(*)::BIGINT AS cnt, max(gap) AS mx,
         sum(1 + CASE WHEN gap >= {1 << 7} THEN 1 ELSE 0 END
               + CASE WHEN gap >= {1 << 14} THEN 1 ELSE 0 END
               + CASE WHEN gap >= {1 << 21} THEN 1 ELSE 0 END)::BIGINT
           AS vb_bytes
  FROM gaps GROUP BY 1, 2
),
per_term AS (
  SELECT term, sum(cnt)::BIGINT AS df, sum(vb_bytes)::BIGINT AS vb,
         sum((cnt * ({_PFOR_BITS}) + 7) // 8 + 1)::BIGINT AS pf
  FROM per_block GROUP BY 1
)
SELECT (length(df::VARCHAR) - 1)::BIGINT AS decade,
       count(*)::BIGINT AS n_terms,
       sum(df)::BIGINT AS total_postings,
       sum(vb)::BIGINT AS varbyte_bytes,
       sum(pf)::BIGINT AS pfor_bytes,
       round(sum(pf)::DOUBLE / sum(vb)::DOUBLE, 6) AS pfor_over_varbyte
FROM per_term GROUP BY 1 ORDER BY 1
"""

_SMP_DRAW = "(" + _MD5_52.format(e="'smp:' || event_id::VARCHAR") + ")"

ORACLES["sampled_topk_fidelity"] = f"""
WITH exact AS (
  SELECT user_id, count(*)::BIGINT AS c FROM events GROUP BY 1
),
samp AS (
  SELECT user_id, count(*)::BIGINT AS sc FROM events
  WHERE {_SMP_DRAW} % {SAMPLE_TOPK_MOD} = 0
  GROUP BY 1
),
te AS (
  SELECT * FROM (
    SELECT user_id, c,
           row_number() OVER (ORDER BY c DESC, user_id ASC) AS r
    FROM exact
  ) WHERE r <= {SAMPLE_TOPK_K}
),
tsam AS (
  SELECT * FROM (
    SELECT user_id,
           row_number() OVER (ORDER BY sc DESC, user_id ASC) AS r
    FROM samp
  ) WHERE r <= {SAMPLE_TOPK_K}
),
ov AS (
  SELECT count(*)::BIGINT AS overlap_at_10
  FROM te JOIN tsam USING (user_id)
),
err AS (
  SELECT round(sum(round(abs(coalesce(s.sc, 0)::DOUBLE
                             * {float(SAMPLE_TOPK_MOD)!r} - te.c::DOUBLE)
                         / te.c::DOUBLE, 12)::DECIMAL(38,12))::DOUBLE
               / {float(SAMPLE_TOPK_K)!r}, 6) AS mean_rel_err
  FROM te LEFT JOIN samp s USING (user_id)
),
tots AS (
  SELECT (SELECT count(*) FROM events)::BIGINT AS n_total,
         (SELECT coalesce(sum(sc), 0) FROM samp)::BIGINT AS n_sample
)
SELECT n_total, n_sample, overlap_at_10, mean_rel_err
FROM tots, ov, err
"""

# ---- batch 141: gains/lift, exact AUC, energy distance ---------------------

ORACLES["cumulative_gains_deciles"] = f"""
WITH ev AS (
  SELECT event_id, value / (value + {BRIER_P_SHIFT!r}) AS p,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
binned AS (
  SELECT ntile({BRIER_BINS}) OVER (ORDER BY p DESC, event_id ASC)
           AS decile, y
  FROM ev
),
per AS (
  SELECT decile, count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos
  FROM binned GROUP BY 1
),
tot AS (
  SELECT sum(n)::BIGINT AS nt, sum(n_pos)::BIGINT AS pt FROM per
),
cum AS (
  SELECT decile, n, n_pos,
         sum(n) OVER (ORDER BY decile
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
           AS cum_n,
         sum(n_pos) OVER (ORDER BY decile
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
           AS cum_pos
  FROM per
)
SELECT decile, n, n_pos, cum_pos,
       round(cum_pos::DOUBLE / pt::DOUBLE, 6) AS gain,
       round((cum_pos::DOUBLE / pt::DOUBLE)
             / (cum_n::DOUBLE / nt::DOUBLE), 6) AS lift
FROM cum, tot ORDER BY decile
"""

ORACLES["score_auc_exact"] = f"""
WITH ev AS (
  SELECT value / (value + {BRIER_P_SHIFT!r}) AS p,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
ranked AS (
  SELECT y,
         (2 * rank() OVER (ORDER BY p)
          + count(*) OVER (PARTITION BY p) - 1)::BIGINT AS s2
  FROM ev
),
g AS (
  SELECT sum(y)::BIGINT AS n_pos,
         (count(*) - sum(y))::BIGINT AS n_neg,
         sum(CASE WHEN y = 1 THEN s2 ELSE 0 END)::BIGINT AS r2_pos
  FROM ranked
)
SELECT n_pos, n_neg, r2_pos,
       round((r2_pos::DOUBLE / 2.0
              - n_pos::DOUBLE * (n_pos::DOUBLE + 1.0) / 2.0)
             / (n_pos::DOUBLE * n_neg::DOUBLE), 6) AS auc,
       round(2.0 * ((r2_pos::DOUBLE / 2.0
                     - n_pos::DOUBLE * (n_pos::DOUBLE + 1.0) / 2.0)
                    / (n_pos::DOUBLE * n_neg::DOUBLE)) - 1.0, 6)
         AS gini_coef
FROM g
"""

ORACLES["energy_distance_values"] = f"""
WITH ev AS (
  SELECT event_type, round(value * 100)::BIGINT AS cents
  FROM events
  WHERE event_type IN ('{DCOR_TYPE_X}', '{DCOR_TYPE_Y}')
),
vals AS (
  SELECT cents,
         sum(CASE WHEN event_type = '{DCOR_TYPE_X}'
                  THEN 1 ELSE 0 END)::BIGINT AS ca,
         sum(CASE WHEN event_type = '{DCOR_TYPE_Y}'
                  THEN 1 ELSE 0 END)::BIGINT AS cb
  FROM ev GROUP BY 1
),
cdf AS (
  SELECT cents,
         sum(ca) OVER wc AS fa, sum(cb) OVER wc AS fb,
         sum(ca) OVER () AS na, sum(cb) OVER () AS nb,
         lead(cents) OVER (ORDER BY cents) - cents AS gap
  FROM vals
  WINDOW wc AS (ORDER BY cents
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
terms AS (
  SELECT na::BIGINT AS na, nb::BIGINT AS nb,
         round((fa::DOUBLE / na::DOUBLE + fb::DOUBLE / nb::DOUBLE
                - 2.0 * (fa::DOUBLE / na::DOUBLE)
                      * (fb::DOUBLE / nb::DOUBLE))
               * gap::DOUBLE, 12)::DECIMAL(38,12) AS xy,
         round(2.0 * (fa::DOUBLE / na::DOUBLE)
               * (1.0 - fa::DOUBLE / na::DOUBLE) * gap::DOUBLE,
               12)::DECIMAL(38,12) AS xx,
         round(2.0 * (fb::DOUBLE / nb::DOUBLE)
               * (1.0 - fb::DOUBLE / nb::DOUBLE) * gap::DOUBLE,
               12)::DECIMAL(38,12) AS yy
  FROM cdf WHERE gap IS NOT NULL
)
SELECT na AS n_x, nb AS n_y,
       round(sum(xy)::DOUBLE / 100.0, 6) AS e_abs_xy,
       round(sum(xx)::DOUBLE / 100.0, 6) AS e_abs_xx,
       round(sum(yy)::DOUBLE / 100.0, 6) AS e_abs_yy,
       round((2.0 * sum(xy)::DOUBLE - sum(xx)::DOUBLE - sum(yy)::DOUBLE)
             / 100.0, 6) AS energy_distance
FROM terms GROUP BY na, nb
"""

# ---- batch 142: MaxP, QI ladder, tenure hazard -----------------------------

from lucene_mapreduce_spark.operators.fulltext import (  # noqa: E402
    MAXP_K,
    MAXP_W,
)
from lucene_mapreduce_spark.operators.textstats import (  # noqa: E402
    QI_LEN_BUCKET,
)


def maxp_sql(query_text: str, k: int = MAXP_K, width: int = MAXP_W) -> str:
    qlit = query_text.replace("'", "''")
    return f"""
WITH docs AS (SELECT doc_id, {TOKS} AS toks FROM documents),
nd AS (SELECT count(*)::DOUBLE AS n FROM documents),
qt AS (SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term),
dfs AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df_t
  FROM (SELECT doc_id, unnest(toks) AS term FROM docs)
  WHERE term IN (SELECT term FROM qt)
  GROUP BY 1
),
weights AS (
  SELECT term,
         round(ln(1.0 + ((SELECT n FROM nd) - df_t::DOUBLE + 0.5)
                        / (df_t::DOUBLE + 0.5)), 12)::DECIMAL(28,12) AS w
  FROM dfs
),
cand AS (
  SELECT d.doc_id, d.toks
  FROM docs d
  JOIN (SELECT DISTINCT doc_id
        FROM (SELECT doc_id, unnest(toks) AS term FROM docs)
        WHERE term IN (SELECT term FROM qt)) m
    ON m.doc_id = d.doc_id
),
wins AS (
  SELECT doc_id, toks,
         unnest(range(1, greatest(1, len(toks) - {width - 1}) + 1))::INT
           AS i
  FROM cand
),
hit AS (
  SELECT doc_id, i, w
  FROM wins, weights
  WHERE list_contains(toks[i : i + {width - 1}], term)
),
per_win AS (
  SELECT doc_id, i, round(sum(w)::DOUBLE, 6) AS ws
  FROM hit GROUP BY 1, 2
),
per_doc AS (
  SELECT doc_id, max(ws) AS maxp_score FROM per_win GROUP BY 1
)
SELECT doc_id, maxp_score, rank FROM (
  SELECT doc_id, maxp_score,
         row_number() OVER (ORDER BY maxp_score DESC, doc_id ASC) AS rank
  FROM per_doc
) WHERE rank <= {k} ORDER BY rank
"""


ORACLES["qi_ladder_kmin"] = f"""
WITH docs AS (
  SELECT lang, source,
         (len({TOKS}) // {QI_LEN_BUCKET})::BIGINT AS len_b
  FROM documents
),
nn AS (SELECT count(*)::DOUBLE AS n FROM docs),
l1 AS (
  SELECT 'lang' AS qi_set, count(*)::BIGINT AS n_classes,
         min(c)::BIGINT AS k_min,
         round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::DOUBLE
               / (SELECT n FROM nn), 6) AS singleton_share
  FROM (SELECT count(*)::BIGINT AS c FROM docs GROUP BY lang)
),
l2 AS (
  SELECT 'lang+source', count(*)::BIGINT, min(c)::BIGINT,
         round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::DOUBLE
               / (SELECT n FROM nn), 6)
  FROM (SELECT count(*)::BIGINT AS c FROM docs GROUP BY lang, source)
),
l3 AS (
  SELECT 'lang+source+len', count(*)::BIGINT, min(c)::BIGINT,
         round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::DOUBLE
               / (SELECT n FROM nn), 6)
  FROM (SELECT count(*)::BIGINT AS c FROM docs
        GROUP BY lang, source, len_b)
)
SELECT * FROM l1 UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM l3
ORDER BY qi_set
"""

ORACLES["tenure_hazard_table"] = """
WITH ev AS (
  SELECT user_id, (epoch_us(ts) // 86400000000) // 7 AS wk FROM events
),
mx AS (SELECT max(wk) AS max_wk FROM ev),
per_user AS (
  SELECT user_id, min(wk) AS w0, max(wk) AS w1 FROM ev GROUP BY 1
),
tab AS (
  SELECT (w1 - w0)::BIGINT AS tenure_w,
         CASE WHEN w1 < (SELECT max_wk FROM mx) THEN 1 ELSE 0 END
           AS churned
  FROM per_user
),
per AS (
  SELECT tenure_w, count(*)::BIGINT AS tot,
         sum(churned)::BIGINT AS n_churned
  FROM tab GROUP BY 1
)
SELECT tenure_w,
       sum(tot) OVER (ORDER BY tenure_w
         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT
         AS n_at_risk,
       n_churned,
       round(n_churned::DOUBLE
             / sum(tot) OVER (ORDER BY tenure_w
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::DOUBLE,
             6) AS hazard
FROM per ORDER BY tenure_w
"""

# ---- batch 143: Holm, fixed-effect meta-analysis, generalized ESD ----------

from lucene_mapreduce_spark.operators.parity import (  # noqa: E402
    GESD_ROUNDS,
    HOLM_ALPHA,
)

ORACLES["holm_bonferroni_gate"] = f"""
WITH src AS (SELECT DISTINCT source FROM documents),
d1 AS (
  SELECT source,
         {_MD5_52.format(e="source || ':bhfdr'")} AS u,
         ({_MD5_52.format(e="source || ':bhsig'")} * 4
            < 4503599627370496) AS planted
  FROM src
),
d2 AS (
  SELECT source, u, planted,
         CASE WHEN planted THEN 4503599627370496000
              ELSE 4503599627370496 END AS den,
         u * CASE WHEN planted THEN 1 ELSE 1000 END AS ord_key
  FROM d1
),
d3 AS (
  SELECT source, planted,
         row_number() OVER (ORDER BY ord_key, source) AS i,
         count(*) OVER () AS m,
         u::DOUBLE / den::DOUBLE AS p
  FROM d2
),
d4 AS (
  SELECT *,
         least(max((m - i + 1)::DOUBLE * p)
                 OVER (ORDER BY i
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               1.0) AS holm_adj
  FROM d3
),
d5 AS (
  SELECT *,
         sum(CASE WHEN holm_adj > {HOLM_ALPHA!r} THEN 1 ELSE 0 END)
           OVER (ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS n_over
  FROM d4
)
SELECT source, i, (CASE WHEN planted THEN 1 ELSE 0 END)::INT AS planted,
       round(p, 9) AS p_value, round(holm_adj, 9) AS holm_adj_p,
       (CASE WHEN n_over = 0 THEN 1 ELSE 0 END)::INT AS reject
FROM d5 ORDER BY i
"""

ORACLES["meta_fixed_effect_or"] = f"""
WITH t AS (
  SELECT lang,
         list_contains({TOKS}, '{MH_EXPOSURE_TOKEN}') AS e,
         list_contains({TOKS}, '{MH_OUTCOME_TOKEN}') AS o
  FROM documents
),
cells AS (
  SELECT lang,
         sum(CASE WHEN e AND o THEN 1 ELSE 0 END)::BIGINT AS a,
         sum(CASE WHEN e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS b,
         sum(CASE WHEN NOT e AND o THEN 1 ELSE 0 END)::BIGINT AS c,
         sum(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS d
  FROM t GROUP BY 1
),
per AS (
  SELECT lang,
         round(ln((a::DOUBLE + 0.5) * (d::DOUBLE + 0.5)
                  / ((b::DOUBLE + 0.5) * (c::DOUBLE + 0.5))), 12) AS lnor,
         round(1.0 / (1.0 / (a::DOUBLE + 0.5) + 1.0 / (b::DOUBLE + 0.5)
                      + 1.0 / (c::DOUBLE + 0.5)
                      + 1.0 / (d::DOUBLE + 0.5)), 12) AS w
  FROM cells
),
sums AS (
  SELECT count(*)::BIGINT AS k,
         sum(round(w * lnor, 12)::DECIMAL(38,12))::DOUBLE AS swl,
         sum(w::DECIMAL(38,12))::DOUBLE AS sw
  FROM per
),
q AS (
  SELECT k, swl / sw AS pooled,
         sum(round(w * (lnor - swl / sw) * (lnor - swl / sw),
                   12)::DECIMAL(38,12))::DOUBLE AS q_het
  FROM per, sums GROUP BY k, swl, sw
)
SELECT k, round(pooled, 6) AS pooled_lnor,
       round(exp(pooled), 6) AS pooled_or,
       round(q_het, 6) AS q_het,
       round(greatest((q_het - (k - 1)::DOUBLE) / q_het, 0.0), 6) AS i2
FROM q
"""


def _gesd_round_sql(r: int, excl: list) -> str:
    where = (
        "WHERE h.day::VARCHAR NOT IN ("
        + ", ".join(f"(SELECT day FROM e{j})" for j in excl)
        + ")"
        if excl
        else ""
    )
    gwhere = (
        "WHERE day::VARCHAR NOT IN ("
        + ", ".join(f"(SELECT day FROM e{j})" for j in excl)
        + ")"
        if excl
        else ""
    )
    stat = (
        "round(abs(h.n_events::DOUBLE - g.s::DOUBLE / g.n::DOUBLE)"
        " / sqrt((g.ss::DOUBLE - g.s::DOUBLE * (g.s::DOUBLE / g.n::DOUBLE))"
        " / (g.n::DOUBLE - 1.0)), 6)"
    )
    return f"""g{r} AS (
  SELECT count(*)::BIGINT AS n, sum(n_events)::BIGINT AS s,
         sum(n_events * n_events)::BIGINT AS ss
  FROM hist {gwhere}
),
e{r} AS (
  SELECT day, n_events, n, r_stat FROM (
    SELECT h.day::VARCHAR AS day, h.n_events, g.n,
           {stat} AS r_stat,
           row_number() OVER (ORDER BY {stat} DESC, h.day ASC) AS rk
    FROM hist h CROSS JOIN g{r} g
    {where}
  ) WHERE rk = 1
)"""


def _gesd_sql() -> str:
    parts = []
    for r in range(1, GESD_ROUNDS + 1):
        parts.append(_gesd_round_sql(r, list(range(1, r))))
    finals = "\nUNION ALL\n".join(
        f"SELECT {r}::INT AS round, day, n_events::BIGINT AS n_events,"
        f" r_stat, n::BIGINT AS n_remaining FROM e{r}"
        for r in range(1, GESD_ROUNDS + 1)
    )
    return (
        f"WITH {_DAILY_HIST},\n"
        + ",\n".join(parts)
        + "\n"
        + finals
        + "\nORDER BY round"
    )


ORACLES["gesd_outliers_3round"] = _gesd_sql()

# ---- batch 144: Benford-2, runs up-down, MASE ------------------------------

from lucene_mapreduce_spark.operators.parity import (  # noqa: E402
    BENFORD2_P,
)

_B2_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {p!r}" for d, p in enumerate(BENFORD2_P)
) + " END"

ORACLES["benford_second_digit"] = f"""
WITH o AS (
  SELECT round(o_totalprice * 100)::BIGINT AS cents FROM orders
),
per AS (
  SELECT substr(cents::VARCHAR, 2, 1)::INT AS digit,
         count(*)::BIGINT AS observed
  FROM o WHERE length(cents::VARCHAR) >= 2
  GROUP BY 1
),
tot AS (SELECT sum(observed)::BIGINT AS n FROM per),
terms AS (
  SELECT digit, observed,
         ({_B2_CASE}) * n::DOUBLE AS e
  FROM per, tot
),
chi AS (
  SELECT round(sum(round(((observed::DOUBLE - e) * (observed::DOUBLE - e))
                         / e, 12)::DECIMAL(38,12))::DOUBLE, 6)
           AS chi2_stat
  FROM terms
)
SELECT digit, observed, round(e, 6) AS expected, chi2_stat
FROM terms, chi ORDER BY digit
"""

ORACLES["runs_updown_test"] = f"""
WITH {_DAILY_HIST},
diffs AS (
  SELECT day, dlt FROM (
    SELECT day,
           n_events - lag(n_events) OVER (ORDER BY day) AS dlt
    FROM hist
  ) WHERE dlt IS NOT NULL AND dlt <> 0
),
runs AS (
  SELECT CASE WHEN lag(s) OVER (ORDER BY day) IS NULL
               OR lag(s) OVER (ORDER BY day) <> s THEN 1 ELSE 0 END
           AS new_run
  FROM (SELECT day, CASE WHEN dlt > 0 THEN 1 ELSE 0 END AS s FROM diffs)
),
g AS (
  SELECT count(*)::BIGINT AS n_diffs, sum(new_run)::BIGINT AS n_runs
  FROM runs
)
SELECT n_diffs, n_runs,
       round((2.0 * (n_diffs + 1)::DOUBLE - 1.0) / 3.0, 6)
         AS expected_runs,
       round((n_runs::DOUBLE
              - (2.0 * (n_diffs + 1)::DOUBLE - 1.0) / 3.0)
             / sqrt((16.0 * (n_diffs + 1)::DOUBLE - 29.0) / 90.0), 6)
         AS z_stat
FROM g
"""

ORACLES["mase_backtest"] = f"""
WITH {_DAILY_HIST},
idx AS (
  SELECT row_number() OVER (ORDER BY day)::BIGINT AS i,
         n_events::BIGINT AS y,
         lag(n_events, 7) OVER (ORDER BY day)::BIGINT AS y7,
         lag(n_events, 1) OVER (ORDER BY day)::BIGINT AS y1
  FROM hist
),
nd AS (SELECT count(*)::BIGINT AS n FROM hist),
test AS (
  SELECT count(*)::BIGINT AS n_test,
         sum(abs(y - y7))::BIGINT AS sae_model
  FROM idx WHERE i > (SELECT n FROM nd) - 7 AND y7 IS NOT NULL
),
train AS (
  SELECT count(*)::BIGINT AS n_train,
         sum(abs(y - y1))::BIGINT AS sae_naive
  FROM idx WHERE i <= (SELECT n FROM nd) - 7 AND y1 IS NOT NULL
)
SELECT n_train, n_test,
       round(sae_model::DOUBLE / n_test::DOUBLE, 6) AS mae_model,
       round(sae_naive::DOUBLE / n_train::DOUBLE, 6)
         AS mae_naive_insample,
       round((sae_model::DOUBLE / n_test::DOUBLE)
             / (sae_naive::DOUBLE / n_train::DOUBLE), 6) AS mase
FROM test, train
"""

# ---- batch 145: average precision, Youden J, footrule ----------------------

ORACLES["average_precision_score"] = f"""
WITH ev AS (
  SELECT event_id, value / (value + {BRIER_P_SHIFT!r}) AS p,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
ranked AS (
  SELECT y,
         row_number() OVER (ORDER BY p DESC, event_id ASC)::BIGINT AS k,
         sum(y) OVER (ORDER BY p DESC, event_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS tp
  FROM ev
),
tot AS (
  SELECT count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos FROM ev
),
ap AS (
  SELECT sum(round(tp::DOUBLE / k::DOUBLE, 12)::DECIMAL(38,12))::DOUBLE
           AS s
  FROM ranked WHERE y = 1
)
SELECT n, n_pos,
       round(s / n_pos::DOUBLE, 6) AS average_precision,
       round(n_pos::DOUBLE / n::DOUBLE, 6) AS baseline_prevalence
FROM ap, tot
"""

ORACLES["youden_j_threshold"] = f"""
WITH ev AS (
  SELECT value / (value + {BRIER_P_SHIFT!r}) AS p,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
per AS (
  SELECT p, sum(y)::BIGINT AS pos,
         (count(*) - sum(y))::BIGINT AS neg
  FROM ev GROUP BY 1
),
tot AS (
  SELECT sum(pos)::BIGINT AS tp_all, sum(neg)::BIGINT AS fp_all FROM per
),
cum AS (
  SELECT p,
         sum(pos) OVER (ORDER BY p DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS tp,
         sum(neg) OVER (ORDER BY p DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS fp
  FROM per
),
j AS (
  SELECT p, tp, fp,
         round(tp::DOUBLE / tp_all::DOUBLE - fp::DOUBLE / fp_all::DOUBLE,
               6) AS youden_j
  FROM cum, tot
)
SELECT round(p, 6) AS threshold, tp, fp, youden_j FROM (
  SELECT *, row_number() OVER (ORDER BY youden_j DESC, p ASC) AS r
  FROM j
) WHERE r = 1
"""


def footrule_sql(query_text: str) -> str:
    return f"""
WITH a AS (SELECT doc_id, rank AS ra
           FROM ({bm25_topk_sql(query_text, 10)})),
b AS (SELECT doc_id, rank AS rb FROM ({tfidf_sql(query_text, 10)})),
g AS (
  SELECT count(*)::BIGINT AS n_common,
         sum(abs(ra - rb))::BIGINT AS footrule
  FROM a JOIN b USING (doc_id)
)
SELECT n_common, footrule,
       round(1.0 - footrule::DOUBLE / 50.0, 6) AS footrule_similarity
FROM g
"""

# ---- batch 146: burstiness, GM-AM gap, Q-Q deciles -------------------------

from lucene_mapreduce_spark.operators.parity import QQ_DECILES  # noqa: E402

ORACLES["interevent_burstiness"] = """
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS es FROM events
),
gaps AS (
  SELECT g FROM (
    SELECT (es - lag(es) OVER (PARTITION BY user_id
                               ORDER BY es, event_id))::BIGINT AS g
    FROM ev
  ) WHERE g IS NOT NULL
),
agg AS (
  SELECT count(*)::BIGINT AS n_gaps, sum(g)::BIGINT AS s,
         sum(g * g)::BIGINT AS ss
  FROM gaps
)
SELECT n_gaps,
       round(s::DOUBLE / n_gaps::DOUBLE, 6) AS mean_gap_s,
       round(sqrt((ss::DOUBLE - s::DOUBLE * (s::DOUBLE / n_gaps::DOUBLE))
                  / (n_gaps::DOUBLE - 1.0)), 6) AS sd_gap_s,
       round(sqrt((ss::DOUBLE - s::DOUBLE * (s::DOUBLE / n_gaps::DOUBLE))
                  / (n_gaps::DOUBLE - 1.0))
             / (s::DOUBLE / n_gaps::DOUBLE), 6) AS cv,
       round((sqrt((ss::DOUBLE - s::DOUBLE * (s::DOUBLE / n_gaps::DOUBLE))
                   / (n_gaps::DOUBLE - 1.0))
              / (s::DOUBLE / n_gaps::DOUBLE) - 1.0)
             / (sqrt((ss::DOUBLE - s::DOUBLE
                        * (s::DOUBLE / n_gaps::DOUBLE))
                     / (n_gaps::DOUBLE - 1.0))
                / (s::DOUBLE / n_gaps::DOUBLE) + 1.0), 6)
         AS burstiness_b
FROM agg
"""

ORACLES["gm_am_revenue_gap"] = """
WITH g AS (
  SELECT count(*)::BIGINT AS n,
         sum(round(o_totalprice, 2)::DECIMAL(28,2)) AS s2,
         sum(round(ln(o_totalprice), 12)::DECIMAL(38,12))::DOUBLE AS sln
  FROM orders
)
SELECT n,
       round(s2::DOUBLE / n::DOUBLE, 4) AS arithmetic_mean,
       round(exp(sln / n::DOUBLE), 4) AS geometric_mean,
       round(exp(sln / n::DOUBLE) / (s2::DOUBLE / n::DOUBLE), 6)
         AS gm_over_am
FROM g
"""

_QQ_ROWS = "\nUNION ALL\n".join(
    f"""SELECT {int(p * 100)}::BIGINT AS pct,
       round((SELECT quantile_cont(value, {p!r}) FROM events
              WHERE event_type = '{DCOR_TYPE_X}'), 6) AS q_click,
       round((SELECT quantile_cont(value, {p!r}) FROM events
              WHERE event_type = '{DCOR_TYPE_Y}'), 6) AS q_purchase,
       round((SELECT quantile_cont(value, {p!r}) FROM events
              WHERE event_type = '{DCOR_TYPE_Y}')
             / (SELECT quantile_cont(value, {p!r}) FROM events
                WHERE event_type = '{DCOR_TYPE_X}'), 6) AS ratio"""
    for p in QQ_DECILES
)

ORACLES["qq_decile_comparison"] = _QQ_ROWS + "\nORDER BY pct"

# ---- batch 147: error MTBF, Theil decomposition, Cohen's d -----------------

ORACLES["error_mtbf_report"] = """
WITH ev AS (
  SELECT event_id, epoch_us(ts) // 1000000 AS es FROM events
  WHERE event_type = 'error'
),
gaps AS (
  SELECT g FROM (
    SELECT (es - lag(es) OVER (ORDER BY es, event_id))::BIGINT AS g
    FROM ev
  ) WHERE g IS NOT NULL
),
span AS (
  SELECT count(*)::BIGINT AS n_errors,
         (max(es) - min(es))::DOUBLE / 86400.0 AS span_days
  FROM ev
),
g AS (
  SELECT count(*)::BIGINT AS n_gaps,
         round(sum(g)::DOUBLE / count(*)::DOUBLE, 6) AS mtbf_s,
         round(quantile_cont(g, 0.5), 6) AS median_gap_s,
         round(quantile_cont(g, 0.95), 6) AS p95_gap_s
  FROM gaps
)
SELECT n_errors, n_gaps, mtbf_s, median_gap_s, p95_gap_s,
       round(n_errors::DOUBLE / span_days, 6) AS errors_per_day
FROM g, span
"""

ORACLES["theil_decomposition_nations"] = """
WITH o AS (
  SELECT c.c_nationkey,
         round(o.o_totalprice, 2)::DECIMAL(28,2) AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
tot AS (SELECT count(*)::BIGINT AS n, sum(x) AS sx FROM o),
per_nation AS (
  SELECT c_nationkey, count(*)::BIGINT AS n_i, sum(x) AS sx_i
  FROM o GROUP BY 1
),
between_t AS (
  SELECT sum(round((sx_i::DOUBLE / sx::DOUBLE)
                   * round(ln((sx_i::DOUBLE / n_i::DOUBLE)
                              / (sx::DOUBLE / n::DOUBLE)), 12),
                   12)::DECIMAL(38,12))::DOUBLE AS t_between
  FROM per_nation, tot
),
within_t AS (
  SELECT o.c_nationkey,
         sum(round((o.x::DOUBLE / p.sx_i::DOUBLE)
                   * round(ln(o.x::DOUBLE
                              / (p.sx_i::DOUBLE / p.n_i::DOUBLE)), 12),
                   12)::DECIMAL(38,12))::DOUBLE AS t_within
  FROM o JOIN per_nation p USING (c_nationkey)
  GROUP BY 1
)
SELECT n.n_name, p.n_i,
       round(p.sx_i::DOUBLE / t.sx::DOUBLE, 6) AS revenue_share,
       round(w.t_within, 6) AS t_within,
       round(b.t_between, 6) AS t_between
FROM per_nation p
JOIN within_t w USING (c_nationkey)
JOIN nation n ON n.n_nationkey = p.c_nationkey
CROSS JOIN tot t CROSS JOIN between_t b
ORDER BY n.n_name
"""

_CD_ARM = "(" + _MD5_52.format(e="'lr:' || user_id::VARCHAR") + ") % 2"

ORACLES["cohens_d_arms"] = f"""
WITH ev AS (
  SELECT ({_CD_ARM})::INT AS arm,
         round(value, 6)::DECIMAL(18,6) AS v,
         round(value * value, 12)::DECIMAL(38,12) AS vv
  FROM events
),
per AS (
  SELECT arm, count(*)::BIGINT AS n, sum(v)::DOUBLE AS s,
         sum(vv)::DOUBLE AS ss
  FROM ev GROUP BY 1
),
piv AS (
  SELECT max(CASE WHEN arm = 0 THEN n END) AS n0,
         max(CASE WHEN arm = 0 THEN s END) AS s0,
         max(CASE WHEN arm = 0 THEN ss END) AS ss0,
         max(CASE WHEN arm = 1 THEN n END) AS n1,
         max(CASE WHEN arm = 1 THEN s END) AS s1,
         max(CASE WHEN arm = 1 THEN ss END) AS ss1
  FROM per
)
SELECT n0 AS n_arm0, n1 AS n_arm1,
       round(s0 / n0::DOUBLE, 6) AS mean_arm0,
       round(s1 / n1::DOUBLE, 6) AS mean_arm1,
       round(sqrt(((ss0 - s0 * (s0 / n0::DOUBLE))
                   + (ss1 - s1 * (s1 / n1::DOUBLE)))
                  / (n0::DOUBLE + n1::DOUBLE - 2.0)), 6) AS pooled_sd,
       round((s1 / n1::DOUBLE - s0 / n0::DOUBLE)
             / sqrt(((ss0 - s0 * (s0 / n0::DOUBLE))
                     + (ss1 - s1 * (s1 / n1::DOUBLE)))
                    / (n0::DOUBLE + n1::DOUBLE - 2.0)), 6) AS cohens_d,
       round(((s1 / n1::DOUBLE - s0 / n0::DOUBLE)
              / sqrt(((ss0 - s0 * (s0 / n0::DOUBLE))
                      + (ss1 - s1 * (s1 / n1::DOUBLE)))
                     / (n0::DOUBLE + n1::DOUBLE - 2.0)))
             * (1.0 - 3.0 / (4.0 * (n0::DOUBLE + n1::DOUBLE - 2.0)
                             - 1.0)), 6) AS hedges_g
FROM piv
"""

# ---- batch 148: negbin fit, capture-recapture, Chao1 -----------------------

from lucene_mapreduce_spark.operators.parity import (  # noqa: E402
    CR_SAMPLE_MOD,
)

ORACLES["negbin_moment_fit"] = f"""
WITH {_DAILY_HIST},
g AS (
  SELECT count(*)::BIGINT AS n, sum(n_events)::BIGINT AS s,
         sum(n_events * n_events)::BIGINT AS ss
  FROM hist
),
m AS (
  SELECT n, s::DOUBLE / n::DOUBLE AS mean,
         (ss::DOUBLE - s::DOUBLE * (s::DOUBLE / n::DOUBLE))
           / (n::DOUBLE - 1.0) AS var
  FROM g
)
SELECT n AS n_days, round(mean, 6) AS mean_daily,
       round(var, 6) AS var_daily,
       round(var / mean, 6) AS dispersion_ratio,
       CASE WHEN var > mean
            THEN round(mean * mean / (var - mean), 6) END AS nb_r,
       CASE WHEN var > mean THEN round(mean / var, 6) END AS nb_p
FROM m
"""

_CAP1 = "(" + _MD5_52.format(e="'cap1:' || user_id::VARCHAR") + ")"
_CAP2 = "(" + _MD5_52.format(e="'cap2:' || user_id::VARCHAR") + ")"

ORACLES["capture_recapture_users"] = f"""
WITH users AS (SELECT DISTINCT user_id FROM events),
g AS (
  SELECT count(*)::BIGINT AS n_true,
         sum(CASE WHEN {_CAP1} % {CR_SAMPLE_MOD} = 0
                  THEN 1 ELSE 0 END)::BIGINT AS n1,
         sum(CASE WHEN {_CAP2} % {CR_SAMPLE_MOD} = 0
                  THEN 1 ELSE 0 END)::BIGINT AS n2,
         sum(CASE WHEN {_CAP1} % {CR_SAMPLE_MOD} = 0
                   AND {_CAP2} % {CR_SAMPLE_MOD} = 0
                  THEN 1 ELSE 0 END)::BIGINT AS m
  FROM users
)
SELECT n_true, n1, n2, m,
       CASE WHEN m > 0
            THEN round(n1::DOUBLE * n2::DOUBLE / m::DOUBLE, 6) END
         AS lincoln_petersen,
       round((n1 + 1)::DOUBLE * (n2 + 1)::DOUBLE / (m + 1)::DOUBLE - 1.0,
             6) AS chapman,
       round(((n1 + 1)::DOUBLE * (n2 + 1)::DOUBLE / (m + 1)::DOUBLE - 1.0)
             / n_true::DOUBLE, 6) AS chapman_over_true
FROM g
"""

ORACLES["chao1_vocab_estimate"] = f"""
WITH freq AS (
  SELECT term, count(*)::BIGINT AS cf
  FROM (SELECT unnest({TOKS}) AS term FROM documents)
  GROUP BY 1
),
g AS (
  SELECT count(*)::BIGINT AS s_obs,
         sum(CASE WHEN cf = 1 THEN 1 ELSE 0 END)::BIGINT AS f1,
         sum(CASE WHEN cf = 2 THEN 1 ELSE 0 END)::BIGINT AS f2,
         sum(cf)::BIGINT AS n_tokens
  FROM freq
)
SELECT s_obs, f1, f2, n_tokens,
       round(s_obs::DOUBLE
             + CASE WHEN f2 > 0
                    THEN f1::DOUBLE * f1::DOUBLE / (2.0 * f2::DOUBLE)
                    ELSE f1::DOUBLE * (f1::DOUBLE - 1.0) / 2.0 END,
             6) AS chao1,
       round(1.0 - f1::DOUBLE / n_tokens::DOUBLE, 6) AS goods_coverage
FROM g
"""

# ---- batch 149: risk ratio, gamma, variance ratio --------------------------

ORACLES["risk_ratio_panel"] = f"""
WITH t AS (
  SELECT list_contains({TOKS}, '{MH_EXPOSURE_TOKEN}') AS e,
         list_contains({TOKS}, '{MH_OUTCOME_TOKEN}') AS o
  FROM documents
),
g AS (
  SELECT sum(CASE WHEN e AND o THEN 1 ELSE 0 END)::BIGINT AS a,
         sum(CASE WHEN e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS b,
         sum(CASE WHEN NOT e AND o THEN 1 ELSE 0 END)::BIGINT AS c,
         sum(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS d
  FROM t
)
SELECT a, b, c, d,
       round(a::DOUBLE / (a + b)::DOUBLE, 6) AS risk_exposed,
       round(c::DOUBLE / (c + d)::DOUBLE, 6) AS risk_unexposed,
       round((a::DOUBLE / (a + b)::DOUBLE)
             / (c::DOUBLE / (c + d)::DOUBLE), 6) AS risk_ratio,
       round(a::DOUBLE / (a + b)::DOUBLE
             - c::DOUBLE / (c + d)::DOUBLE, 6) AS risk_difference,
       round(1.0 / abs(a::DOUBLE / (a + b)::DOUBLE
                       - c::DOUBLE / (c + d)::DOUBLE), 6) AS nnt,
       round(((a + c)::DOUBLE / (a + b + c + d)::DOUBLE
              - c::DOUBLE / (c + d)::DOUBLE)
             / ((a + c)::DOUBLE / (a + b + c + d)::DOUBLE), 6) AS paf
FROM g
"""

ORACLES["goodman_kruskal_gamma"] = """
WITH obs AS (
  SELECT o.o_orderpriority AS pr, s.v
  FROM orders o
  JOIN (SELECT l_orderkey, count(*)::BIGINT AS v
        FROM lineitem GROUP BY 1) s
    ON o.o_orderkey = s.l_orderkey
),
qs AS (
  SELECT quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.5) AS q2,
         quantile_cont(v, 0.75) AS q3
  FROM obs
),
b AS (
  SELECT pr,
         (CASE WHEN v::DOUBLE > q1 THEN 1 ELSE 0 END
          + CASE WHEN v::DOUBLE > q2 THEN 1 ELSE 0 END
          + CASE WHEN v::DOUBLE > q3 THEN 1 ELSE 0 END) AS sb
  FROM obs, qs
),
cells AS (
  SELECT pr, sb, count(*)::BIGINT AS cnt FROM b GROUP BY 1, 2
),
pairs AS (
  SELECT sum(CASE WHEN x.pr < y.pr AND x.sb < y.sb
                  THEN x.cnt * y.cnt ELSE 0 END)::BIGINT AS n_concordant,
         sum(CASE WHEN x.pr < y.pr AND x.sb > y.sb
                  THEN x.cnt * y.cnt ELSE 0 END)::BIGINT AS n_discordant
  FROM cells x CROSS JOIN cells y
)
SELECT n_concordant, n_discordant,
       round((n_concordant - n_discordant)::DOUBLE
             / (n_concordant + n_discordant)::DOUBLE, 6) AS gamma
FROM pairs
"""

ORACLES["variance_ratio_test"] = f"""
WITH {_DAILY_HIST},
d AS (
  SELECT n_events - lag(n_events, 1) OVER (ORDER BY day) AS d1,
         n_events - lag(n_events, 2) OVER (ORDER BY day) AS d2
  FROM hist
),
g1 AS (
  SELECT count(*)::BIGINT AS n1, sum(d1)::BIGINT AS s1,
         sum(d1 * d1)::BIGINT AS ss1
  FROM d WHERE d1 IS NOT NULL
),
g2 AS (
  SELECT count(*)::BIGINT AS n2, sum(d2)::BIGINT AS s2,
         sum(d2 * d2)::BIGINT AS ss2
  FROM d WHERE d2 IS NOT NULL
),
vv AS (
  SELECT n1,
         (ss1::DOUBLE - s1::DOUBLE * (s1::DOUBLE / n1::DOUBLE))
           / (n1::DOUBLE - 1.0) AS v1,
         (ss2::DOUBLE - s2::DOUBLE * (s2::DOUBLE / n2::DOUBLE))
           / (n2::DOUBLE - 1.0) AS v2
  FROM g1, g2
)
SELECT n1 AS n_changes, round(v1, 6) AS var_1d, round(v2, 6) AS var_2d,
       round(v2 / (2.0 * v1), 6) AS variance_ratio,
       round((v2 / (2.0 * v1) - 1.0) * sqrt(n1::DOUBLE), 6) AS z_stat
FROM vv
"""

# ---- batch 150: VWAP/TWAP, FD bins, corrected Cramer's V -------------------

from lucene_mapreduce_spark.operators.parity import _THIRD  # noqa: E402

ORACLES["vwap_twap_monthly"] = """
WITH li AS (
  SELECT epoch_us(l_shipdate) // 86400000000 AS ed,
         strftime(l_shipdate, '%Y-%m') AS month,
         l_quantity, l_extendedprice
  FROM lineitem
),
daily AS (
  SELECT month, ed,
         round(sum(round(l_extendedprice / l_quantity,
                         6)::DECIMAL(28,6))::DOUBLE
               / count(*)::DOUBLE, 12)::DECIMAL(38,12) AS day_mean
  FROM li GROUP BY 1, 2
),
twap AS (
  SELECT month, count(*)::BIGINT AS n_days,
         round(sum(day_mean)::DOUBLE / count(*)::DOUBLE, 6) AS twap
  FROM daily GROUP BY 1
),
vwap AS (
  SELECT month, count(*)::BIGINT AS n_lines,
         round(sum(round(l_extendedprice, 2)::DECIMAL(28,2))::DOUBLE
               / sum(round(l_quantity, 2)::DECIMAL(28,2))::DOUBLE, 6)
           AS vwap
  FROM li GROUP BY 1
)
SELECT v.month, v.n_lines, t.n_days, v.vwap, t.twap,
       round(v.vwap / t.twap, 6) AS vwap_over_twap
FROM vwap v JOIN twap t USING (month)
ORDER BY v.month
"""

ORACLES["fd_binwidth_recommendation"] = f"""
WITH g AS (
  SELECT count(*)::BIGINT AS n,
         min(o_totalprice) AS lo, max(o_totalprice) AS hi,
         quantile_cont(o_totalprice, 0.25) AS q1,
         quantile_cont(o_totalprice, 0.75) AS q3
  FROM orders
)
SELECT n, round(q3 - q1, 6) AS iqr,
       round(hi - lo, 6) AS value_range,
       round(2.0 * (q3 - q1)
             / exp(round(ln(n::DOUBLE), 12) * {_THIRD!r}), 6)
         AS fd_binwidth,
       (floor((hi - lo) / (2.0 * (q3 - q1)
              / exp(round(ln(n::DOUBLE), 12) * {_THIRD!r}))) + 1)::BIGINT
         AS n_bins
FROM g
"""

ORACLES["cramers_v_bias_corrected"] = """
WITH cells AS (
  SELECT lang, source, count(*)::BIGINT AS o
  FROM documents GROUP BY 1, 2
),
rm AS (SELECT lang, sum(o)::BIGINT AS rl FROM cells GROUP BY 1),
cm AS (SELECT source, sum(o)::BIGINT AS cs FROM cells GROUP BY 1),
tot AS (
  SELECT sum(o)::BIGINT AS n,
         count(DISTINCT lang)::BIGINT AS r,
         count(DISTINCT source)::BIGINT AS c
  FROM cells
),
chi AS (
  SELECT n, r, c,
         sum(round(((o::DOUBLE - rl::DOUBLE * cs::DOUBLE / n::DOUBLE)
                    * (o::DOUBLE - rl::DOUBLE * cs::DOUBLE / n::DOUBLE))
                   / (rl::DOUBLE * cs::DOUBLE / n::DOUBLE),
                   12)::DECIMAL(38,12))::DOUBLE
         + (n::DOUBLE
            - sum(round(rl::DOUBLE * cs::DOUBLE / n::DOUBLE,
                        12)::DECIMAL(38,12))::DOUBLE) AS chi2
  FROM cells JOIN rm USING (lang) JOIN cm USING (source), tot
  GROUP BY n, r, c
)
SELECT n, r, c, round(chi2, 6) AS chi2,
       round(chi2 / n::DOUBLE, 6) AS phi2,
       round(sqrt(greatest(chi2 / n::DOUBLE
                           - (r - 1)::DOUBLE * (c - 1)::DOUBLE
                             / (n - 1)::DOUBLE, 0.0)
                  / least(r::DOUBLE - (r - 1)::DOUBLE * (r - 1)::DOUBLE
                            / (n - 1)::DOUBLE - 1.0,
                          c::DOUBLE - (c - 1)::DOUBLE * (c - 1)::DOUBLE
                            / (n - 1)::DOUBLE - 1.0)), 6)
         AS cramers_v_corrected
FROM chi
"""

# ---- batch 151: modularity, Atkinson, query clarity ------------------------

ORACLES["modularity_brand_partition"] = """
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
            FROM lineitem),
e AS (
  SELECT a.pk AS pa, b.pk AS pb
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2 HAVING count(*) >= 2
),
e2 AS (
  SELECT e.pa, e.pb, la.p_brand AS ca, lb.p_brand AS cb
  FROM e
  JOIN part la ON la.p_partkey = e.pa
  JOIN part lb ON lb.p_partkey = e.pb
),
m AS (SELECT count(*)::BIGINT AS m FROM e2),
adj AS (
  SELECT pa AS node, ca AS comm FROM e2
  UNION ALL SELECT pb, cb FROM e2
),
deg AS (
  SELECT comm, count(*)::BIGINT AS n_nodes, sum(d)::BIGINT AS deg_sum
  FROM (SELECT node, comm, count(*)::BIGINT AS d FROM adj GROUP BY 1, 2)
  GROUP BY 1
),
intra AS (
  SELECT ca AS comm, count(*)::BIGINT AS intra_edges
  FROM e2 WHERE ca = cb GROUP BY 1
)
SELECT deg.comm AS p_brand, n_nodes, deg_sum,
       coalesce(intra_edges, 0)::BIGINT AS intra_edges,
       round(coalesce(intra_edges, 0)::DOUBLE / m::DOUBLE
             - (deg_sum::DOUBLE / (2.0 * m::DOUBLE))
               * (deg_sum::DOUBLE / (2.0 * m::DOUBLE)), 6)
         AS contribution
FROM deg LEFT JOIN intra ON intra.comm = deg.comm, m
ORDER BY p_brand
"""

ORACLES["atkinson_index_segments"] = """
WITH g AS (
  SELECT c_mktsegment,
         count(*)::BIGINT AS n_orders,
         sum(round(o_totalprice, 2)::DECIMAL(28,2)) AS s1,
         sum(round(sqrt(o_totalprice), 6)::DECIMAL(28,6)) AS sh
  FROM orders JOIN customer ON c_custkey = o_custkey
  GROUP BY 1
)
SELECT c_mktsegment, n_orders,
       round(s1::DOUBLE / n_orders::DOUBLE, 6) AS mean_price,
       round((sh::DOUBLE / n_orders::DOUBLE)
             * (sh::DOUBLE / n_orders::DOUBLE), 6) AS ede_price,
       round(1.0 - (sh::DOUBLE / n_orders::DOUBLE)
                   * (sh::DOUBLE / n_orders::DOUBLE)
                   / (s1::DOUBLE / n_orders::DOUBLE), 6) AS atkinson_05
FROM g
ORDER BY c_mktsegment
"""


def clarity_sql(query_text: str, k: int = 50) -> str:
    """query_clarity_score twin: the nqc_wig_sql scoring CTEs kept
    through topk doc_ids, then the page/corpus unigram LMs from exact
    BIGINT counts and the KL fold as 12dp DECIMAL."""
    qlit = query_text.replace("'", "''")
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
dft AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
scored AS (
  SELECT p.doc_id,
         ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * (p.tf * {K1 + 1.0}) / (p.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl))
           AS contrib
  FROM postings p
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
),
agg AS (
  SELECT doc_id, round(sum(contrib), 6) AS score FROM scored GROUP BY 1
),
topk AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
    FROM agg
  ) WHERE r <= {k}
),
page AS (
  SELECT p.term, sum(p.tf)::BIGINT AS tf_r
  FROM postings p JOIN topk USING (doc_id) GROUP BY 1
),
lenr AS (
  SELECT sum(tf_r)::BIGINT AS len_r, count(*)::BIGINT AS n_terms FROM page
),
cf AS (SELECT term, sum(tf)::BIGINT AS cf FROM postings GROUP BY 1),
tot AS (SELECT sum(dl)::BIGINT AS t FROM doclens),
ku AS (SELECT count(*)::BIGINT AS k_used FROM topk),
fold AS (
  SELECT len_r, n_terms,
         sum(round((tf_r::DOUBLE / len_r::DOUBLE)
                   * ln((tf_r::DOUBLE / len_r::DOUBLE)
                        / (cf::DOUBLE / t::DOUBLE)),
                   12)::DECIMAL(38,12))::DOUBLE AS cl
  FROM page JOIN cf USING (term), lenr, tot
  GROUP BY 1, 2
)
SELECT k_used, len_r AS page_tokens, n_terms, round(cl, 6) AS clarity
FROM fold, ku
"""

# ---- batch 152: rendezvous hashing, Palma ratio, M/G/1 ---------------------

_RVH_H = _MD5_52.format(e="'rvh:' || node::VARCHAR || ':' || key::VARCHAR")

ORACLES["rendezvous_hash_balance"] = f"""
WITH k AS (SELECT o_orderkey AS key FROM orders),
p AS (
  SELECT key, node, {_RVH_H} * 16 + node AS enc
  FROM k CROSS JOIN (SELECT unnest(range(9)) AS node)
),
g AS (
  SELECT key,
         max(CASE WHEN node < 8 THEN enc END) AS e8,
         max(enc) AS e9
  FROM p GROUP BY 1
),
a AS (
  SELECT (e8 % 16)::BIGINT AS node,
         (CASE WHEN e9 % 16 = 8 THEN 1 ELSE 0 END)::BIGINT AS moved
  FROM g
),
per AS (
  SELECT node, count(*)::BIGINT AS n_keys, sum(moved)::BIGINT AS n_moved
  FROM a GROUP BY 1
),
tot AS (SELECT count(*)::BIGINT AS total FROM k)
SELECT node, n_keys,
       round(n_keys::DOUBLE / total::DOUBLE, 6) AS share,
       n_moved,
       round(n_moved::DOUBLE / n_keys::DOUBLE, 6) AS moved_frac
FROM per, tot
ORDER BY node
"""

ORACLES["palma_ratio_nations"] = """
WITH j AS (
  SELECT n_name, o_orderkey,
         round(o_totalprice, 2)::DECIMAL(28,2) AS price
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
),
r AS (
  SELECT n_name, price,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY price DESC, o_orderkey ASC) AS rd,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY price ASC, o_orderkey DESC) AS ra
  FROM j
),
cnt AS (
  SELECT n_name, count(*)::BIGINT AS n_orders,
         (count(*) - (9 * count(*)) // 10)::BIGINT AS t_cut,
         ((4 * count(*)) // 10)::BIGINT AS b_cut
  FROM j GROUP BY 1
),
agg AS (
  SELECT r.n_name, cnt.n_orders, cnt.t_cut AS top10_n,
         cnt.b_cut AS bottom40_n,
         sum(CASE WHEN rd <= t_cut THEN price END) AS ts,
         sum(CASE WHEN ra <= b_cut THEN price END) AS bs
  FROM r JOIN cnt USING (n_name)
  GROUP BY 1, 2, 3, 4
)
SELECT n_name, n_orders, top10_n, bottom40_n,
       ts::DOUBLE AS top10_revenue,
       bs::DOUBLE AS bottom40_revenue,
       round(ts::DOUBLE / bs::DOUBLE, 6) AS palma_ratio
FROM agg
ORDER BY n_name
"""

ORACLES["mg1_waiting_time"] = """
WITH g AS (
  SELECT count(*)::BIGINT AS n_events,
         (max(epoch_us(ts)) - min(epoch_us(ts)))::BIGINT AS span_us,
         sum(round(value, 2)::DECIMAL(28,2)) AS s1,
         sum(round(value * value, 4)::DECIMAL(38,4)) AS s2
  FROM events
),
d AS (
  SELECT n_events, span_us,
         n_events::DOUBLE * 1000000.0 / span_us::DOUBLE AS lam,
         s1::DOUBLE / n_events::DOUBLE / 1000.0 AS es,
         s2::DOUBLE / n_events::DOUBLE / 1000000.0 AS es2
  FROM g
),
w AS (
  SELECT *,
         lam * es AS rho,
         CASE WHEN lam * es < 1.0
              THEN lam * es2 / (2.0 * (1.0 - lam * es)) END AS wq
  FROM d
)
SELECT n_events, span_us,
       round(lam, 6) AS lambda_per_s,
       round(es, 6) AS es_s,
       round(es2, 6) AS es2_s2,
       round(rho, 6) AS rho,
       round(wq, 6) AS wq_s,
       round(wq + es, 6) AS w_s,
       round(lam * wq, 6) AS lq
FROM w
"""

# ---- batch 153: Taylor's law, two-NN intrinsic dim, JSD --------------------

ORACLES["taylor_power_law"] = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS ed FROM events
),
span AS (SELECT min(ed) AS d0, max(ed) AS d1 FROM ev),
days AS (SELECT unnest(range(d0, d1 + 1)) AS ed FROM span),
users AS (SELECT DISTINCT user_id FROM ev),
counts AS (
  SELECT user_id, ed, count(*)::BIGINT AS c FROM ev GROUP BY 1, 2
),
grid AS (
  SELECT u.user_id, d.ed, coalesce(c.c, 0)::BIGINT AS c
  FROM users u CROSS JOIN days d
  LEFT JOIN counts c ON c.user_id = u.user_id AND c.ed = d.ed
),
per AS (
  SELECT user_id, count(*)::BIGINT AS nd,
         sum(c)::BIGINT AS s1, sum(c * c)::BIGINT AS s2
  FROM grid GROUP BY 1
),
pts AS (
  SELECT round(ln(s1::DOUBLE / nd::DOUBLE), 12) AS u,
         round(ln((s2::DOUBLE - s1::DOUBLE * (s1::DOUBLE / nd::DOUBLE))
                  / (nd::DOUBLE - 1)), 12) AS w
  FROM per
  WHERE s1 > 0
    AND (s2::DOUBLE - s1::DOUBLE * (s1::DOUBLE / nd::DOUBLE))
        / (nd::DOUBLE - 1) > 0
),
s AS (
  SELECT count(*)::BIGINT AS k,
         sum(u::DECIMAL(38,12))::DOUBLE AS su,
         sum(w::DECIMAL(38,12))::DOUBLE AS sw,
         sum(round(u * w, 12)::DECIMAL(38,12))::DOUBLE AS suw,
         sum(round(u * u, 12)::DECIMAL(38,12))::DOUBLE AS suu,
         sum(round(w * w, 12)::DECIMAL(38,12))::DOUBLE AS sww
  FROM pts
)
SELECT k AS n_users_fit,
       round((k::DOUBLE * suw - su * sw) / (k::DOUBLE * suu - su * su), 6)
         AS taylor_b,
       round((sw - (k::DOUBLE * suw - su * sw)
                   / (k::DOUBLE * suu - su * su) * su) / k::DOUBLE, 6)
         AS ln_a,
       round((k::DOUBLE * suw - su * sw) * (k::DOUBLE * suw - su * sw)
             / ((k::DOUBLE * suu - su * su)
                * (k::DOUBLE * sww - sw * sw)), 6) AS r2
FROM s
"""

ORACLES["two_nn_intrinsic_dim"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
probes AS (
  SELECT vec_id AS p_id, v AS pv
  FROM (
    SELECT vec_id, v,
           row_number() OVER (
             ORDER BY md5(vec_id::VARCHAR || ':2nn') ASC, vec_id ASC
           ) AS r
    FROM e
  ) WHERE r <= 64
),
cand AS (
  SELECT p.p_id, e.vec_id,
         round(list_dot_product(e.v, e.v) + list_dot_product(p.pv, p.pv)
               - 2.0 * list_dot_product(e.v, p.pv), 9) AS d2
  FROM e CROSS JOIN probes p
  WHERE e.vec_id <> p.p_id
),
top2 AS (
  SELECT p_id, d2, r FROM (
    SELECT p_id, d2,
           row_number() OVER (PARTITION BY p_id
                              ORDER BY d2 ASC, vec_id ASC) AS r
    FROM cand WHERE d2 > 0
  ) WHERE r <= 2
),
per AS (
  SELECT p_id,
         min(CASE WHEN r = 1 THEN d2 END) AS d1,
         min(CASE WHEN r = 2 THEN d2 END) AS d2nd
  FROM top2 GROUP BY 1
),
agg AS (
  SELECT count(*)::BIGINT AS n_probes,
         sum(round(0.5 * ln(d2nd / d1), 12)::DECIMAL(38,12))::DOUBLE AS slm
  FROM per
),
tot AS (SELECT count(*)::BIGINT AS n_vectors FROM e)
SELECT n_probes, n_vectors,
       round(slm, 6) AS sum_ln_mu,
       CASE WHEN slm <> 0.0
            THEN round(n_probes::DOUBLE / slm, 6) END AS intrinsic_dim
FROM agg, tot
"""

ORACLES["jsd_source_vs_rest"] = f"""
WITH toks AS (
  SELECT source, unnest({TOKS}) AS term FROM documents
),
per AS (
  SELECT source, term, count(*)::BIGINT AS cnt FROM toks GROUP BY 1, 2
),
tot_s AS (SELECT source, sum(cnt)::BIGINT AS tot_s FROM per GROUP BY 1),
corpus AS (SELECT term, sum(cnt)::BIGINT AS cf FROM per GROUP BY 1),
tot AS (SELECT sum(cf)::BIGINT AS tot FROM corpus),
grid AS (
  SELECT s.source, s.tot_s, c.term, c.cf, coalesce(p.cnt, 0)::BIGINT AS cnt,
         t.tot
  FROM tot_s s CROSS JOIN corpus c
  LEFT JOIN per p ON p.source = s.source AND p.term = c.term
  CROSS JOIN tot t
),
contrib AS (
  SELECT source, tot_s,
         CASE WHEN cnt > 0 THEN
           round((cnt::DOUBLE / tot_s::DOUBLE)
                 * ln((cnt::DOUBLE / tot_s::DOUBLE)
                      / ((cnt::DOUBLE / tot_s::DOUBLE)
                         + (cf - cnt)::DOUBLE / (tot - tot_s)::DOUBLE)
                        * 2.0), 12)
         ELSE 0.0 END::DECIMAL(28,12) AS cp,
         CASE WHEN cf > cnt THEN
           round(((cf - cnt)::DOUBLE / (tot - tot_s)::DOUBLE)
                 * ln(((cf - cnt)::DOUBLE / (tot - tot_s)::DOUBLE)
                      / ((cnt::DOUBLE / tot_s::DOUBLE)
                         + (cf - cnt)::DOUBLE / (tot - tot_s)::DOUBLE)
                        * 2.0), 12)
         ELSE 0.0 END::DECIMAL(28,12) AS cq
  FROM grid
),
outp AS (
  SELECT source, tot_s, count(*)::BIGINT AS vocab_terms,
         (sum(cp)::DOUBLE + sum(cq)::DOUBLE) / 2.0 AS jsd_raw
  FROM contrib GROUP BY 1, 2
)
SELECT source, tot_s AS n_tokens, vocab_terms,
       round(jsd_raw, 6) AS jsd_nats,
       round(sqrt(jsd_raw), 6) AS jsd_distance
FROM outp
ORDER BY source
"""

# ---- batch 154: Croston, Wilcoxon signed-rank, Cox-Stuart ------------------

ORACLES["croston_intermittent_demand"] = """
WITH pk AS (SELECT min(l_partkey) AS pk FROM lineitem),
d AS (
  SELECT pk.pk, epoch_us(l_shipdate::TIMESTAMP) // 86400000000 AS ed,
         sum(round(l_quantity, 2)::DECIMAL(28,2)) AS qd
  FROM lineitem, pk WHERE l_partkey = pk.pk
  GROUP BY 1, 2
),
rows_ AS (
  SELECT pk, ed, qd, qd::DOUBLE AS q,
         coalesce((ed - lag(ed) OVER (PARTITION BY pk ORDER BY ed))::DOUBLE,
                  1.0) AS iv
  FROM d
),
packed AS (
  SELECT pk, count(*)::BIGINT AS n_demand_days,
         sum(qd)::DOUBLE AS total_qty,
         list([q, iv] ORDER BY ed) AS arr
  FROM rows_ GROUP BY 1
),
st AS (
  SELECT pk, n_demand_days, total_qty,
         list_reduce(arr,
           (acc, x) -> [(acc[1] + x[1]) / 2.0, (acc[2] + x[2]) / 2.0]) AS s
  FROM packed
)
SELECT pk AS part_key, n_demand_days,
       round(total_qty, 2) AS total_qty,
       round(s[1], 6) AS z_final,
       round(s[2], 6) AS p_final,
       round(s[1] / s[2], 6) AS croston_forecast,
       round(0.75 * s[1] / s[2], 6) AS sba_forecast
FROM st
"""

ORACLES["wilcoxon_signed_rank"] = """
WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
span AS (SELECT ((min(us) + max(us)) // 2)::BIGINT AS mid FROM ev),
per AS (
  SELECT user_id,
         sum(CASE WHEN us < mid THEN 1 ELSE 0 END)::BIGINT AS x,
         sum(CASE WHEN us >= mid THEN 1 ELSE 0 END)::BIGINT AS y
  FROM ev, span GROUP BY 1
),
diffs AS (SELECT y - x AS dd FROM per WHERE y - x <> 0),
grp AS (
  SELECT abs(dd)::BIGINT AS ad, count(*)::BIGINT AS c,
         sum(CASE WHEN dd > 0 THEN 1 ELSE 0 END)::BIGINT AS cpos
  FROM diffs GROUP BY 1
),
ranked AS (
  SELECT ad, c, cpos,
         (sum(c) OVER (ORDER BY ad
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          - c)::BIGINT AS a
  FROM grp
),
agg AS (
  SELECT sum(c)::BIGINT AS n,
         sum(cpos * (2 * a + c + 1))::BIGINT AS w2,
         sum(c * c * c - c)::BIGINT AS t3
  FROM ranked
)
SELECT n AS n_pairs,
       round(w2::DOUBLE / 2, 6) AS w_plus,
       t3 AS tie_term,
       round((2 * w2 - n * (n + 1))::DOUBLE
             / sqrt((2 * n * (n + 1) * (2 * n + 1) - t3)::DOUBLE / 3.0), 6)
         AS z_stat
FROM agg
"""

ORACLES["cox_stuart_trend"] = """
WITH ev AS (
  SELECT epoch_us(ts) // 86400000000 AS ed FROM events
),
days AS (
  SELECT unnest(range(d0, d1 + 1)) AS ed,
         (d1 - d0 + 1)::BIGINT AS nn
  FROM (SELECT min(ed) AS d0, max(ed) AS d1 FROM ev)
),
counts AS (SELECT ed, count(*)::BIGINT AS c FROM ev GROUP BY 1),
cal AS (
  SELECT d.ed, d.nn, coalesce(c.c, 0)::BIGINT AS c
  FROM days d LEFT JOIN counts c ON c.ed = d.ed
),
lo AS (SELECT min(ed) AS d0 FROM cal),
pairs AS (
  SELECT a.nn, a.c AS y1, b.c AS y2
  FROM cal a JOIN cal b ON a.ed + a.nn // 2 = b.ed, lo
  WHERE a.ed < lo.d0 + a.nn // 2
),
agg AS (
  SELECT any_value(nn) AS n_days,
         sum(CASE WHEN y2 > y1 THEN 1 ELSE 0 END)::BIGINT AS s_plus,
         sum(CASE WHEN y2 < y1 THEN 1 ELSE 0 END)::BIGINT AS s_minus
  FROM pairs
)
SELECT n_days, (s_plus + s_minus)::BIGINT AS n_pairs_used,
       s_plus, s_minus,
       round((2 * s_plus - (s_plus + s_minus))::DOUBLE
             / sqrt((s_plus + s_minus)::DOUBLE), 6) AS z_stat
FROM agg
"""

# ---- batch 155: p-value combination, EB shrinkage, jackknife ---------------

ORACLES["pvalue_combination_panel"] = """
WITH o AS (
  SELECT o_custkey,
         epoch_us(o_orderdate::TIMESTAMP) // 86400000000 AS ed
  FROM orders
),
cells AS (
  SELECT c_mktsegment, ed % 7 AS dow, count(*)::BIGINT AS obs
  FROM o JOIN customer ON c_custkey = o_custkey
  GROUP BY 1, 2
),
tot AS (
  SELECT c_mktsegment, sum(obs)::BIGINT AS n_s FROM cells GROUP BY 1
),
chi AS (
  SELECT c.c_mktsegment,
         sum(round((obs::DOUBLE - n_s::DOUBLE / 7.0)
                   * (obs::DOUBLE - n_s::DOUBLE / 7.0)
                   / (n_s::DOUBLE / 7.0), 12)::DECIMAL(38,12))::DOUBLE AS x
  FROM cells c JOIN tot USING (c_mktsegment)
  GROUP BY 1
),
ps AS (
  SELECT c_mktsegment,
         round(exp(-(x / 2.0))
               * (1.0 + x / 2.0 + (x / 2.0) * (x / 2.0) / 2.0), 12) AS p
  FROM chi
),
agg AS (
  SELECT count(*)::BIGINT AS k,
         sum(round(ln(p), 12)::DECIMAL(38,12))::DOUBLE AS slp,
         sum(round(tan(3.141592653589793 * (0.5 - p)),
                   12)::DECIMAL(38,12))::DOUBLE AS stan,
         sum(round(1.0 / p, 12)::DECIMAL(38,12))::DOUBLE AS sinv,
         min(p) AS minp
  FROM ps
)
SELECT k,
       round(-2.0 * slp, 6) AS fisher_x,
       round(exp(-(-2.0 * slp / 2.0))
             * (1.0 + (-2.0 * slp / 2.0)
                + (-2.0 * slp / 2.0) * (-2.0 * slp / 2.0) / 2.0
                + (-2.0 * slp / 2.0) * (-2.0 * slp / 2.0)
                  * (-2.0 * slp / 2.0) / 6.0
                + (-2.0 * slp / 2.0) * (-2.0 * slp / 2.0)
                  * (-2.0 * slp / 2.0) * (-2.0 * slp / 2.0) / 24.0), 6)
         AS fisher_p,
       round(k::DOUBLE / sinv, 6) AS hmp,
       round(stan / k::DOUBLE, 6) AS cauchy_t,
       round(0.5 - atan(stan / k::DOUBLE) / 3.141592653589793, 6)
         AS cauchy_p,
       round(least(1.0, k::DOUBLE * minp), 6) AS bonferroni_p
FROM agg
"""

ORACLES["eb_shrunk_urgent_rates"] = """
WITH per AS (
  SELECT n_name, count(*)::BIGINT AS n_orders,
         sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
             END)::BIGINT AS n_urgent
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY 1
),
rts AS (
  SELECT n_name, n_orders, n_urgent,
         round(n_urgent::DOUBLE / n_orders::DOUBLE, 12) AS r
  FROM per
),
mom AS (
  SELECT count(*)::BIGINT AS k,
         sum(r::DECIMAL(38,12))::DOUBLE AS sr,
         sum(round(r * r, 12)::DECIMAL(38,12))::DOUBLE AS srr
  FROM rts
),
prior AS (
  SELECT round((sr / k::DOUBLE)
               * ((sr / k::DOUBLE) * (1.0 - sr / k::DOUBLE)
                  / ((srr - sr * (sr / k::DOUBLE)) / (k::DOUBLE - 1))
                  - 1.0), 12) AS alpha,
         round((1.0 - sr / k::DOUBLE)
               * ((sr / k::DOUBLE) * (1.0 - sr / k::DOUBLE)
                  / ((srr - sr * (sr / k::DOUBLE)) / (k::DOUBLE - 1))
                  - 1.0), 12) AS beta
  FROM mom
)
SELECT n_name, n_orders, n_urgent,
       round(r, 6) AS raw_rate,
       round(alpha, 6) AS alpha,
       round(beta, 6) AS beta,
       round((n_urgent::DOUBLE + alpha)
             / (n_orders::DOUBLE + alpha + beta), 6) AS shrunk_rate
FROM rts, prior
ORDER BY n_name
"""

ORACLES["jackknife_ratio_se"] = """
WITH li AS (
  SELECT (epoch_us(l_shipdate::TIMESTAMP) // 86400000000) % 7 AS g,
         round(l_extendedprice, 2)::DECIMAL(28,2) AS rev,
         round(l_quantity, 2)::DECIMAL(28,2) AS qty
  FROM lineitem
),
per AS (
  SELECT g, sum(rev) AS s_g, sum(qty) AS t_g FROM li GROUP BY 1
),
tot AS (
  SELECT count(*)::BIGINT AS gn, sum(s_g) AS s, sum(t_g) AS t FROM per
),
jk AS (
  SELECT gn, s, t,
         round((s - s_g)::DOUBLE / (t - t_g)::DOUBLE, 12) AS rg
  FROM per, tot
),
agg AS (
  SELECT gn, s, t,
         sum(rg::DECIMAL(38,12))::DOUBLE AS srg,
         sum(round(rg * rg, 12)::DECIMAL(38,12))::DOUBLE AS srg2
  FROM jk GROUP BY 1, 2, 3
)
SELECT gn AS n_groups,
       round(s::DOUBLE / t::DOUBLE, 6) AS ratio,
       round(srg / gn::DOUBLE, 6) AS jk_mean,
       round(sqrt((gn::DOUBLE - 1) / gn::DOUBLE
                  * (srg2 - srg * (srg / gn::DOUBLE))), 6) AS jk_se,
       round((gn::DOUBLE - 1)
             * (srg / gn::DOUBLE - s::DOUBLE / t::DOUBLE), 6) AS jk_bias
FROM agg
"""

# ---- batch 156: fighting words, Witten-Bell, agreement panel ---------------

from lucene_mapreduce_spark.operators.textstats import (  # noqa: E402
    FIGHTING_WORDS_A0,
    FIGHTING_WORDS_K,
)
from lucene_mapreduce_spark.operators.parity import (  # noqa: E402
    _KAPPA_TH_A,
    _KAPPA_TH_B,
)

ORACLES["fighting_words_log_odds"] = f"""
WITH toks AS (
  SELECT source, unnest({TOKS}) AS term FROM documents
),
per AS (
  SELECT source, term, count(*)::BIGINT AS cnt FROM toks GROUP BY 1, 2
),
tot_s AS (SELECT source, sum(cnt)::BIGINT AS tot_s FROM per GROUP BY 1),
two AS (
  SELECT source, tot_s,
         row_number() OVER (ORDER BY tot_s DESC, source ASC) AS rk
  FROM tot_s
),
corpus AS (SELECT term, sum(cnt)::BIGINT AS cf FROM per GROUP BY 1),
tot AS (SELECT sum(cf)::BIGINT AS t FROM corpus),
g1 AS (SELECT source AS src1, tot_s AS n1 FROM two WHERE rk = 1),
g2 AS (SELECT source AS src2, tot_s AS n2 FROM two WHERE rk = 2),
base AS (
  SELECT c.term, c.cf, t.t, g1.src1, g1.n1, g2.src2, g2.n2
  FROM corpus c, tot t, g1, g2
),
grid AS (
  SELECT b.term, b.cf, b.t, b.src1, b.n1, b.src2, b.n2,
         coalesce(p1.cnt, 0)::BIGINT AS y1,
         coalesce(p2.cnt, 0)::BIGINT AS y2
  FROM base b
  LEFT JOIN per p1 ON p1.source = b.src1 AND p1.term = b.term
  LEFT JOIN per p2 ON p2.source = b.src2 AND p2.term = b.term
),
scored AS (
  SELECT term, src1, src2, y1, y2,
         round(ln((y1::DOUBLE + cf::DOUBLE * {FIGHTING_WORDS_A0!r}
                   / t::DOUBLE)
                  / (n1::DOUBLE + {FIGHTING_WORDS_A0!r} - y1::DOUBLE
                     - cf::DOUBLE * {FIGHTING_WORDS_A0!r} / t::DOUBLE))
               - ln((y2::DOUBLE + cf::DOUBLE * {FIGHTING_WORDS_A0!r}
                     / t::DOUBLE)
                    / (n2::DOUBLE + {FIGHTING_WORDS_A0!r} - y2::DOUBLE
                       - cf::DOUBLE * {FIGHTING_WORDS_A0!r} / t::DOUBLE)),
               6) AS delta,
         round((ln((y1::DOUBLE + cf::DOUBLE * {FIGHTING_WORDS_A0!r}
                    / t::DOUBLE)
                   / (n1::DOUBLE + {FIGHTING_WORDS_A0!r} - y1::DOUBLE
                      - cf::DOUBLE * {FIGHTING_WORDS_A0!r} / t::DOUBLE))
                - ln((y2::DOUBLE + cf::DOUBLE * {FIGHTING_WORDS_A0!r}
                      / t::DOUBLE)
                     / (n2::DOUBLE + {FIGHTING_WORDS_A0!r} - y2::DOUBLE
                        - cf::DOUBLE * {FIGHTING_WORDS_A0!r}
                          / t::DOUBLE)))
               / sqrt(1.0 / (y1::DOUBLE
                             + cf::DOUBLE * {FIGHTING_WORDS_A0!r}
                               / t::DOUBLE)
                      + 1.0 / (y2::DOUBLE
                               + cf::DOUBLE * {FIGHTING_WORDS_A0!r}
                                 / t::DOUBLE)), 6) AS z
  FROM grid
)
SELECT rank, term, src1, src2, y1, y2, delta, z
FROM (
  SELECT *, row_number() OVER (ORDER BY abs(z) DESC, term ASC) AS rank
  FROM scored
) WHERE rank <= {FIGHTING_WORDS_K}
ORDER BY rank
"""

ORACLES["witten_bell_perplexity"] = f"""
WITH toks AS (
  SELECT doc_id, {TOKS} AS tk FROM documents
),
pairs AS (
  SELECT tk[i - 1] AS u, tk[i] AS v
  FROM toks, unnest(range(2, len(tk) + 1)) AS r(i)
  WHERE len(tk) >= 2
),
big AS (SELECT u, v, count(*)::BIGINT AS c12 FROM pairs GROUP BY 1, 2),
ctx AS (SELECT u, count(*)::BIGINT AS tu FROM big GROUP BY 1),
uni AS (
  SELECT unnest({TOKS}) AS term FROM documents
),
unic AS (SELECT term, count(*)::BIGINT AS cf FROM uni GROUP BY 1),
tot AS (SELECT sum(cf)::BIGINT AS t FROM unic),
j AS (
  SELECT b.c12,
         round(b.c12::DOUBLE
               * ln((b.c12::DOUBLE
                     + ctx.tu::DOUBLE * cv.cf::DOUBLE / tot.t::DOUBLE)
                    / (cu.cf::DOUBLE + ctx.tu::DOUBLE)),
               12)::DECIMAL(38,12) AS contrib
  FROM big b
  JOIN ctx ON ctx.u = b.u
  JOIN unic cu ON cu.term = b.u
  JOIN unic cv ON cv.term = b.v
  CROSS JOIN tot
),
agg AS (
  SELECT sum(c12)::BIGINT AS n_bigrams,
         count(*)::BIGINT AS distinct_bigrams,
         sum(contrib)::DOUBLE AS sll
  FROM j
)
SELECT n_bigrams, distinct_bigrams,
       round(-(sll) / n_bigrams::DOUBLE, 6) AS avg_neg_ll,
       round(exp(-(sll) / n_bigrams::DOUBLE), 6) AS perplexity
FROM agg
"""

_KAP_A = _MD5_52.format(e="'ra:' || doc_id::VARCHAR")
_KAP_B = _MD5_52.format(e="'rb:' || doc_id::VARCHAR")

ORACLES["agreement_panel_kappa"] = f"""
WITH lab AS (
  SELECT CASE WHEN {_KAP_A} < {_KAPPA_TH_A} THEN n_chars % 3
              ELSE (n_chars % 3 + 1) % 3 END AS a,
         CASE WHEN {_KAP_B} < {_KAPPA_TH_B} THEN n_chars % 3
              ELSE (n_chars % 3 + 2) % 3 END AS b
  FROM documents
),
cells AS (SELECT a, b, count(*)::BIGINT AS c FROM lab GROUP BY 1, 2),
n AS (SELECT sum(c)::BIGINT AS n FROM cells),
po_n AS (SELECT sum(c)::BIGINT AS agree FROM cells WHERE a = b),
ma AS (SELECT a, sum(c)::BIGINT AS ca FROM cells GROUP BY 1),
mb AS (SELECT b, sum(c)::BIGINT AS cb FROM cells GROUP BY 1),
pe_c AS (
  SELECT sum(ca * cb)::BIGINT AS pe_num FROM ma JOIN mb ON ma.a = mb.b
),
pooled AS (
  SELECT sum(mm * mm)::BIGINT AS pe_s_num FROM (
    SELECT k, sum(m)::BIGINT AS mm FROM (
      SELECT a AS k, ca AS m FROM ma
      UNION ALL SELECT b, cb FROM mb
    ) GROUP BY 1
  )
)
SELECT n,
       round(agree::DOUBLE / n::DOUBLE, 6) AS po,
       round(pe_num::DOUBLE / (n::DOUBLE * n::DOUBLE), 6) AS pe_cohen,
       round((agree::DOUBLE / n::DOUBLE
              - pe_num::DOUBLE / (n::DOUBLE * n::DOUBLE))
             / (1.0 - pe_num::DOUBLE / (n::DOUBLE * n::DOUBLE)), 6)
         AS cohen_kappa,
       round(pe_s_num::DOUBLE / (4.0 * n::DOUBLE * n::DOUBLE), 6)
         AS pe_scott,
       round((agree::DOUBLE / n::DOUBLE
              - pe_s_num::DOUBLE / (4.0 * n::DOUBLE * n::DOUBLE))
             / (1.0 - pe_s_num::DOUBLE / (4.0 * n::DOUBLE * n::DOUBLE)), 6)
         AS scott_pi
FROM n, po_n, pe_c, pooled
"""

# ---- batch 157: Brunner-Munzel, SMOG, consistent ring ----------------------

_BM_ARM = _MD5_52.format(e="'lr:' || user_id::VARCHAR")

ORACLES["brunner_munzel_arms"] = f"""
WITH ev AS (
  SELECT ({_BM_ARM}) % 2 AS arm,
         round(value * 100, 0)::BIGINT AS cents
  FROM events
),
tab AS (
  SELECT cents, count(*)::BIGINT AS cv,
         sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS cx,
         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS cy
  FROM ev GROUP BY 1
),
r AS (
  SELECT cents, cv, cx, cy,
         2 * (sum(cv) OVER w - cv) + cv + 1 AS r2,
         2 * (sum(cx) OVER w - cx) + cx + 1 AS rx2,
         2 * (sum(cy) OVER w - cy) + cy + 1 AS ry2
  FROM tab
  WINDOW w AS (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
agg AS (
  SELECT sum(cx)::BIGINT AS nx, sum(cy)::BIGINT AS ny,
         sum(cx * (r2 - rx2))::BIGINT AS sx1,
         sum((cx * (r2 - rx2) * (r2 - rx2))::DECIMAL(38,0)) AS sx2,
         sum(cy * (r2 - ry2))::BIGINT AS sy1,
         sum((cy * (r2 - ry2) * (r2 - ry2))::DECIMAL(38,0)) AS sy2,
         sum(cx * r2)::BIGINT AS srx,
         sum(cy * r2)::BIGINT AS sry
  FROM r
),
d AS (
  SELECT nx, ny,
         (sx2::DOUBLE - sx1::DOUBLE * sx1::DOUBLE / nx::DOUBLE)
           / (4.0 * (nx::DOUBLE - 1)) AS sxv,
         (sy2::DOUBLE - sy1::DOUBLE * sy1::DOUBLE / ny::DOUBLE)
           / (4.0 * (ny::DOUBLE - 1)) AS syv,
         sry::DOUBLE / (2.0 * ny::DOUBLE) AS rybar,
         srx::DOUBLE / (2.0 * nx::DOUBLE) AS rxbar
  FROM agg
)
SELECT nx AS n_x, ny AS n_y,
       round((rybar - (ny::DOUBLE + 1) / 2) / nx::DOUBLE, 6) AS p_hat,
       round(nx::DOUBLE * ny::DOUBLE / (nx::DOUBLE + ny::DOUBLE)
             * (rybar - rxbar)
             / sqrt(nx::DOUBLE * sxv + ny::DOUBLE * syv), 6) AS w_stat
FROM d
"""

ORACLES["smog_readability"] = f"""
WITH types AS (
  SELECT term, count(*)::BIGINT AS cnt FROM (
    SELECT unnest({TOKS}) AS term FROM documents
  ) GROUP BY 1
),
syl AS (
  SELECT cnt,
         len(regexp_extract_all(term, '[aeiou]+'))::BIGINT AS sy
  FROM types
),
nd AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
agg AS (
  SELECT sum(cnt)::BIGINT AS n_words,
         sum(CASE WHEN sy >= 3 THEN cnt ELSE 0 END)::BIGINT AS n_poly
  FROM syl
)
SELECT n_docs AS n_sentences, n_words,
       n_poly AS n_polysyllables,
       round(n_poly::DOUBLE / n_words::DOUBLE, 6) AS polysyllable_rate,
       round(1.0430 * sqrt(n_poly::DOUBLE * 30.0 / n_docs::DOUBLE)
             + 3.1291, 6) AS smog_grade
FROM agg, nd
"""

_RING_KH = _MD5_52.format(e="'key:' || o_orderkey::VARCHAR")
_RING_VH = _MD5_52.format(e="'ring:' || node::VARCHAR || ':' || rep::VARCHAR")

ORACLES["consistent_ring_balance"] = f"""
WITH keys AS (
  SELECT o_orderkey AS key, {_RING_KH} AS kh FROM orders
),
ring AS (
  SELECT node, ({_RING_VH}) * 16 + node AS enc
  FROM (SELECT unnest(range(8)) AS node)
  CROSS JOIN (SELECT unnest(range(16)) AS rep)
),
wrap AS (SELECT min(enc) AS wrap_enc FROM ring),
succ AS (
  SELECT k.key, min(r.enc) AS senc
  FROM keys k JOIN ring r ON r.enc // 16 >= k.kh
  GROUP BY 1
),
assigned AS (
  SELECT (coalesce(s.senc, w.wrap_enc) % 16)::BIGINT AS node
  FROM keys k LEFT JOIN succ s ON s.key = k.key, wrap w
),
tot AS (SELECT count(*)::BIGINT AS total FROM keys)
SELECT node, 16::BIGINT AS n_vnodes, count(*)::BIGINT AS n_keys,
       round(count(*)::DOUBLE / any_value(total)::DOUBLE, 6) AS share
FROM assigned, tot
GROUP BY node
ORDER BY node
"""

# ---- batch 158: roaring plan, Western Electric, price indices --------------

ORACLES["roaring_container_plan"] = f"""
WITH postings AS (
  SELECT DISTINCT term, doc_id FROM (
    SELECT doc_id, unnest({TOKS}) AS term FROM documents
  )
),
cont AS (
  SELECT term, doc_id // 65536 AS container, count(*)::BIGINT AS cnt
  FROM postings GROUP BY 1, 2
),
sized AS (
  SELECT cnt,
         CASE WHEN cnt < 4096 THEN 1 ELSE 0 END::BIGINT AS arr,
         CASE WHEN cnt < 4096 THEN 8 + 2 * cnt ELSE 8200 END::BIGINT
           AS rbytes,
         (8 + 2 * cnt)::BIGINT AS abytes
  FROM cont
),
nt AS (SELECT count(DISTINCT term)::BIGINT AS n_terms FROM cont),
agg AS (
  SELECT count(*)::BIGINT AS n_containers,
         sum(arr)::BIGINT AS n_array_containers,
         (count(*) - sum(arr))::BIGINT AS n_bitmap_containers,
         sum(cnt)::BIGINT AS n_postings,
         sum(rbytes)::BIGINT AS bytes_roaring,
         sum(abytes)::BIGINT AS bytes_array_only
  FROM sized
)
SELECT n_terms, n_containers, n_array_containers, n_bitmap_containers,
       n_postings, bytes_roaring, bytes_array_only,
       round(bytes_roaring::DOUBLE / bytes_array_only::DOUBLE, 6)
         AS roaring_over_array
FROM agg, nt
"""

ORACLES["western_electric_rules"] = """
WITH ev AS (
  SELECT epoch_us(ts) // 86400000000 AS ed FROM events
),
days AS (
  SELECT unnest(range(d0, d1 + 1)) AS ed
  FROM (SELECT min(ed) AS d0, max(ed) AS d1 FROM ev)
),
counts AS (SELECT ed, count(*)::BIGINT AS c FROM ev GROUP BY 1),
cal AS (
  SELECT d.ed, coalesce(c.c, 0)::BIGINT AS c
  FROM days d LEFT JOIN counts c ON c.ed = d.ed
),
mom AS (
  SELECT count(*)::BIGINT AS n, sum(c)::BIGINT AS s1,
         sum(c * c)::BIGINT AS s2
  FROM cal
),
zz AS (
  SELECT ed,
         (c::DOUBLE - s1::DOUBLE / n::DOUBLE)
         / sqrt(s2::DOUBLE / n::DOUBLE
                - (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE))
           AS z
  FROM cal, mom
),
flags AS (
  SELECT row_number() OVER (ORDER BY ed) AS i,
         CASE WHEN abs(z) > 3 THEN 1 ELSE 0 END AS r1,
         CASE WHEN sum(CASE WHEN z > 2 THEN 1 ELSE 0 END) OVER w3 >= 2
                OR sum(CASE WHEN z < -2 THEN 1 ELSE 0 END) OVER w3 >= 2
              THEN 1 ELSE 0 END AS r2raw,
         CASE WHEN sum(CASE WHEN z > 1 THEN 1 ELSE 0 END) OVER w5 >= 4
                OR sum(CASE WHEN z < -1 THEN 1 ELSE 0 END) OVER w5 >= 4
              THEN 1 ELSE 0 END AS r3raw,
         CASE WHEN sum(CASE WHEN z > 0 THEN 1 ELSE 0 END) OVER w8 >= 8
                OR sum(CASE WHEN z < 0 THEN 1 ELSE 0 END) OVER w8 >= 8
              THEN 1 ELSE 0 END AS r4raw
  FROM zz
  WINDOW w3 AS (ORDER BY ed ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
         w5 AS (ORDER BY ed ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
         w8 AS (ORDER BY ed ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
)
SELECT count(*)::BIGINT AS n_days,
       sum(r1)::BIGINT AS r1_violations,
       sum(CASE WHEN i >= 3 THEN r2raw ELSE 0 END)::BIGINT AS r2_violations,
       sum(CASE WHEN i >= 5 THEN r3raw ELSE 0 END)::BIGINT AS r3_violations,
       sum(CASE WHEN i >= 8 THEN r4raw ELSE 0 END)::BIGINT AS r4_violations
FROM flags
"""

ORACLES["price_index_panel"] = """
WITH li AS (
  SELECT l_partkey, strftime(l_shipdate, '%Y-%m') AS month,
         round(l_quantity, 2)::DECIMAL(28,2) AS q,
         round(l_extendedprice, 2)::DECIMAL(28,2) AS v
  FROM lineitem
),
mm AS (SELECT min(month) AS m0, max(month) AS m1 FROM li),
per AS (
  SELECT l_partkey, month, m0, m1,
         sum(q)::DOUBLE AS qd,
         round(sum(v)::DOUBLE / sum(q)::DOUBLE, 6) AS p
  FROM li, mm
  WHERE month = m0 OR month = m1
  GROUP BY 1, 2, 3, 4
),
a AS (
  SELECT l_partkey, m0, m1, qd AS q0, p AS p0 FROM per WHERE month = m0
),
b AS (
  SELECT l_partkey, qd AS q1, p AS p1 FROM per WHERE month = m1
),
terms AS (
  SELECT m0, m1,
         round(p1 * q0, 6)::DECIMAL(38,6) AS p1q0,
         round(p0 * q0, 6)::DECIMAL(38,6) AS p0q0,
         round(p1 * q1, 6)::DECIMAL(38,6) AS p1q1,
         round(p0 * q1, 6)::DECIMAL(38,6) AS p0q1
  FROM a JOIN b USING (l_partkey)
),
agg AS (
  SELECT m0, m1, count(*)::BIGINT AS n_common_parts,
         sum(p1q0)::DOUBLE AS s10, sum(p0q0)::DOUBLE AS s00,
         sum(p1q1)::DOUBLE AS s11, sum(p0q1)::DOUBLE AS s01
  FROM terms GROUP BY 1, 2
)
SELECT m0 AS month0, m1 AS month1, n_common_parts,
       round(s10 / s00, 6) AS laspeyres,
       round(s11 / s01, 6) AS paasche,
       round(sqrt((s10 / s00) * (s11 / s01)), 6) AS fisher
FROM agg
"""

# ---- batch 159: Kendall's W, randomized response, dot-vs-cosine ------------

from lucene_mapreduce_spark.operators.parity import _RR_KEEP_TH  # noqa: E402

ORACLES["kendalls_w_concordance"] = """
WITH li AS (
  SELECT l_orderkey, strftime(l_shipdate, '%Y-%m') AS month,
         round(l_extendedprice, 2)::DECIMAL(28,2) AS rev
  FROM lineitem
),
months AS (
  SELECT month FROM (SELECT DISTINCT month FROM li ORDER BY month LIMIT 3)
),
present AS (
  SELECT li.month, n_name, sum(rev) AS rev
  FROM li
  JOIN months USING (month)
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY 1, 2
),
per AS (
  SELECT m.month, nn.n_name,
         coalesce(p.rev, 0::DECIMAL(28,2)) AS rev
  FROM months m
  CROSS JOIN (SELECT n_name FROM nation) nn
  LEFT JOIN present p ON p.month = m.month AND p.n_name = nn.n_name
),
grp AS (
  SELECT month, rev, count(*)::BIGINT AS cnt, list(n_name) AS names
  FROM per GROUP BY 1, 2
),
ranked AS (
  SELECT month, cnt,
         2 * (sum(cnt) OVER (PARTITION BY month ORDER BY rev
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) - cnt) + cnt + 1 AS r2,
         unnest(names) AS n_name
  FROM grp
),
sums AS (
  SELECT n_name, sum(r2)::BIGINT AS sr2, count(*)::BIGINT AS m
  FROM ranked GROUP BY 1
),
ties AS (
  SELECT sum(cnt * cnt * cnt - cnt)::BIGINT AS tt FROM grp
),
nn AS (
  SELECT count(*)::BIGINT AS n, any_value(m)::BIGINT AS m,
         sum(sr2)::BIGINT AS tot_sr2,
         sum(sr2 * sr2)::BIGINT AS tot_sr2sq
  FROM sums
)
SELECT n AS n_subjects, m AS m_raters, tt AS tie_term,
       round(12.0 * ((tot_sr2sq::DOUBLE
                      - tot_sr2::DOUBLE * tot_sr2::DOUBLE / n::DOUBLE) / 4)
             / (m::DOUBLE * m::DOUBLE
                * (n::DOUBLE * n::DOUBLE * n::DOUBLE - n::DOUBLE)
                - m::DOUBLE * tt::DOUBLE), 6) AS kendalls_w,
       round(m::DOUBLE * (n::DOUBLE - 1)
             * 12.0 * ((tot_sr2sq::DOUBLE
                        - tot_sr2::DOUBLE * tot_sr2::DOUBLE / n::DOUBLE)
                       / 4)
             / (m::DOUBLE * m::DOUBLE
                * (n::DOUBLE * n::DOUBLE * n::DOUBLE - n::DOUBLE)
                - m::DOUBLE * tt::DOUBLE), 6) AS friedman_chi2
FROM nn, ties
"""

_RR_D1 = _MD5_52.format(e="'rr1:' || doc_id::VARCHAR")
_RR_D2 = _MD5_52.format(e="'rr2:' || doc_id::VARCHAR")

ORACLES["randomized_response_debias"] = f"""
WITH classes AS (
  SELECT lang, (row_number() OVER (ORDER BY lang) - 1)::BIGINT AS cid
  FROM (SELECT DISTINCT lang FROM documents)
),
ll AS (SELECT count(*)::BIGINT AS ln FROM classes),
lab AS (
  SELECT d.lang, c.cid,
         CASE WHEN {_RR_D1} < {_RR_KEEP_TH} THEN c.cid
              ELSE ({_RR_D2}) % ll.ln END AS rep
  FROM documents d JOIN classes c ON c.lang = d.lang, ll
),
true_n AS (SELECT cid, count(*)::BIGINT AS true_n FROM lab GROUP BY 1),
rep_n AS (SELECT rep AS cid, count(*)::BIGINT AS reported_n
          FROM lab GROUP BY 1),
tot AS (SELECT count(*)::BIGINT AS n FROM lab)
SELECT c.lang,
       coalesce(t.true_n, 0)::BIGINT AS true_n,
       coalesce(r.reported_n, 0)::BIGINT AS reported_n,
       round(n::DOUBLE
             * (coalesce(r.reported_n, 0)::DOUBLE / n::DOUBLE
                - 0.25 / ln::DOUBLE) / 0.75, 2) AS est_n,
       round(abs(n::DOUBLE
                 * (coalesce(r.reported_n, 0)::DOUBLE / n::DOUBLE
                    - 0.25 / ln::DOUBLE) / 0.75
                 - coalesce(t.true_n, 0)::DOUBLE), 2) AS abs_err
FROM classes c
LEFT JOIN true_n t ON t.cid = c.cid
LEFT JOIN rep_n r ON r.cid = c.cid, tot, ll
ORDER BY c.lang
"""

ORACLES["dot_vs_cosine_overlap"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
probe AS (
  SELECT vec_id AS p_id, v AS pv FROM (
    SELECT vec_id, v,
           row_number() OVER (
             ORDER BY md5(vec_id::VARCHAR || ':dvc') ASC, vec_id ASC
           ) AS r
    FROM e
  ) WHERE r = 1
),
scored AS (
  SELECT e.vec_id,
         round(list_dot_product(e.v, p.pv), 6) AS dp,
         round(list_dot_product(e.v, p.pv)
               / (sqrt(list_dot_product(e.v, e.v))
                  * sqrt(list_dot_product(p.pv, p.pv))), 6) AS cos
  FROM e CROSS JOIN probe p
  WHERE e.vec_id <> p.p_id
),
top_d AS (
  SELECT vec_id, rd FROM (
    SELECT vec_id,
           row_number() OVER (ORDER BY dp DESC, vec_id ASC) AS rd
    FROM scored
  ) WHERE rd <= 10
),
top_c AS (
  SELECT vec_id, rc FROM (
    SELECT vec_id,
           row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rc
    FROM scored
  ) WHERE rc <= 10
),
inter AS (
  SELECT count(*)::BIGINT AS n_overlap,
         coalesce(sum(abs(rd - rc)), 0)::BIGINT AS footrule_common
  FROM top_d JOIN top_c USING (vec_id)
)
SELECT 10::BIGINT AS k, n_overlap,
       round(n_overlap::DOUBLE / (20.0 - n_overlap::DOUBLE), 6) AS jaccard,
       footrule_common
FROM inter
"""

# ---- batch 160: Ansari-Bradley, Bland-Altman, deletion vectors -------------

ORACLES["ansari_bradley_scale_test"] = f"""
WITH ev AS (
  SELECT ({_BM_ARM}) % 2 AS arm,
         round(value * 100, 0)::BIGINT AS cents
  FROM events
),
tab AS (
  SELECT cents, count(*)::BIGINT AS cv,
         sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS cx
  FROM ev GROUP BY 1
),
tot AS (SELECT sum(cv)::BIGINT AS nn FROM tab),
r AS (
  SELECT cv, cx, nn,
         2 * (sum(cv) OVER (ORDER BY cents
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) - cv) + cv + 1 AS r2
  FROM tab, tot
),
agg AS (
  SELECT any_value(nn) AS nn,
         sum(cx)::BIGINT AS nx,
         sum(cx * least(r2, 2 * (nn + 1) - r2))::BIGINT AS wx2,
         sum(cv * least(r2, 2 * (nn + 1) - r2))::BIGINT AS ts1,
         sum((cv * least(r2, 2 * (nn + 1) - r2)
                 * least(r2, 2 * (nn + 1) - r2))::DECIMAL(38,0)) AS ts2
  FROM r
)
SELECT nx AS n_x, (nn - nx)::BIGINT AS n_y,
       round(wx2::DOUBLE / 2, 6) AS w_stat,
       round((wx2::DOUBLE / 2 - nx::DOUBLE * (ts1::DOUBLE / nn::DOUBLE) / 2)
             / sqrt(nx::DOUBLE * (nn::DOUBLE - nx::DOUBLE)
                    / (nn::DOUBLE * (nn::DOUBLE - 1))
                    * (ts2::DOUBLE
                       - ts1::DOUBLE * (ts1::DOUBLE / nn::DOUBLE)) / 4), 6)
         AS z_stat
FROM agg
"""

ORACLES["bland_altman_order_totals"] = """
WITH li AS (
  SELECT l_orderkey AS o_orderkey,
         sum(round(l_extendedprice, 2)::DECIMAL(28,2)) AS b
  FROM lineitem GROUP BY 1
),
d AS (
  SELECT (round(o_totalprice, 2)::DECIMAL(28,2) - b)::DECIMAL(28,2) AS d
  FROM orders JOIN li USING (o_orderkey)
),
mom AS (
  SELECT count(*)::BIGINT AS n, sum(d) AS s1,
         sum((d * d)::DECIMAL(38,4)) AS s2
  FROM d
),
lims AS (
  SELECT n,
         s1::DOUBLE / n::DOUBLE AS bias,
         sqrt((s2::DOUBLE - s1::DOUBLE * (s1::DOUBLE / n::DOUBLE))
              / (n::DOUBLE - 1)) AS sd
  FROM mom
),
outside AS (
  SELECT count(*)::BIGINT AS n_outside
  FROM d, lims
  WHERE d::DOUBLE < bias - 1.96 * sd OR d::DOUBLE > bias + 1.96 * sd
)
SELECT n AS n_pairs,
       round(bias, 6) AS bias,
       round(sd, 6) AS sd_diff,
       round(bias - 1.96 * sd, 6) AS loa_lower,
       round(bias + 1.96 * sd, 6) AS loa_upper,
       n_outside,
       round(n_outside::DOUBLE / n::DOUBLE, 6) AS pct_outside
FROM lims, outside
"""

ORACLES["deletion_vector_plan"] = """
WITH o AS (
  SELECT o_orderkey // 8192 AS file_id,
         epoch_us(o_orderdate::TIMESTAMP) // 86400000000 AS ed
  FROM orders
),
cut AS (
  SELECT d0 + (d1 - d0) // 4 AS cutoff
  FROM (SELECT min(ed) AS d0, max(ed) AS d1 FROM o)
),
per AS (
  SELECT file_id, count(*)::BIGINT AS n_rows,
         sum(CASE WHEN ed < cutoff THEN 1 ELSE 0 END)::BIGINT AS n_del
  FROM o, cut GROUP BY 1
),
sized AS (
  SELECT n_rows, n_del,
         CASE WHEN n_del = 0 THEN 'clean'
              WHEN 8 + least(2 * n_del, 1024)
                   < 100 * (n_rows - n_del) THEN 'dv'
              ELSE 'rewrite' END AS action,
         CASE WHEN n_del > 0 AND 8 + least(2 * n_del, 1024)
                                 < 100 * (n_rows - n_del)
              THEN 8 + least(2 * n_del, 1024) ELSE 0 END::BIGINT AS dv_bytes,
         CASE WHEN n_del > 0 AND NOT (8 + least(2 * n_del, 1024)
                                      < 100 * (n_rows - n_del))
              THEN 100 * (n_rows - n_del) ELSE 0 END::BIGINT AS rw_bytes
  FROM per
)
SELECT count(*)::BIGINT AS n_files,
       sum(CASE WHEN action = 'clean' THEN 1 ELSE 0 END)::BIGINT
         AS files_clean,
       sum(CASE WHEN action = 'dv' THEN 1 ELSE 0 END)::BIGINT AS files_dv,
       sum(CASE WHEN action = 'rewrite' THEN 1 ELSE 0 END)::BIGINT
         AS files_rewrite,
       sum(n_del)::BIGINT AS rows_deleted,
       sum(dv_bytes)::BIGINT AS dv_bytes_total,
       sum(rw_bytes)::BIGINT AS rewrite_bytes_total
FROM sized
"""

# ---- batch 161: Quade, Gumbel block maxima, BH-FDR -------------------------

ORACLES["quade_test_months"] = """
WITH li AS (
  SELECT l_orderkey, strftime(l_shipdate, '%Y-%m') AS month,
         round(l_extendedprice, 2)::DECIMAL(28,2) AS rev
  FROM lineitem
),
months AS (
  SELECT month FROM (SELECT DISTINCT month FROM li ORDER BY month LIMIT 3)
),
present AS (
  SELECT li.month, n_name, sum(rev) AS rev
  FROM li
  JOIN months USING (month)
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY 1, 2
),
grid AS (
  SELECT m.month, nn.n_name,
         coalesce(p.rev, 0::DECIMAL(28,2)) AS rev
  FROM months m
  CROSS JOIN (SELECT n_name FROM nation) nn
  LEFT JOIN present p ON p.month = m.month AND p.n_name = nn.n_name
),
within AS (
  SELECT month, n_name,
         2 * rank() OVER (PARTITION BY n_name ORDER BY rev)
         + count(*) OVER (PARTITION BY n_name, rev) - 1 AS r2
  FROM grid
),
rng AS (
  SELECT n_name, (max(rev) - min(rev))::DECIMAL(28,2) AS range_
  FROM grid GROUP BY 1
),
rgrp AS (
  SELECT range_, count(*)::BIGINT AS c, list(n_name) AS names
  FROM rng GROUP BY 1
),
q2t AS (
  SELECT 2 * (sum(c) OVER (ORDER BY range_
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) - c) + c + 1 AS q2,
         unnest(names) AS n_name
  FROM rgrp
),
s4 AS (
  SELECT w.month, w.n_name, (q.q2 * (w.r2 - 4))::BIGINT AS s4
  FROM within w JOIN q2t q USING (n_name)
),
per_t AS (SELECT month, sum(s4)::BIGINT AS tj FROM s4 GROUP BY 1),
tots AS (
  SELECT count(DISTINCT n_name)::BIGINT AS b,
         count(DISTINCT month)::BIGINT AS k,
         sum((s4 * s4)::DECIMAL(38,0)) AS a16
  FROM s4
),
bsum AS (SELECT sum((tj * tj)::DECIMAL(38,0)) AS b16n FROM per_t)
SELECT b AS n_blocks, k AS k_treatments,
       (k - 1)::BIGINT AS df1,
       ((b - 1) * (k - 1))::BIGINT AS df2,
       round((b::DOUBLE - 1) * (b16n::DOUBLE / b::DOUBLE)
             / (a16::DOUBLE - b16n::DOUBLE / b::DOUBLE), 6) AS quade_f
FROM tots, bsum
"""

ORACLES["gumbel_block_maxima_fit"] = """
WITH ev AS (
  SELECT epoch_us(ts) // 86400000000 AS ed FROM events
),
days AS (
  SELECT unnest(range(d0, d1 + 1)) AS ed
  FROM (SELECT min(ed) AS d0, max(ed) AS d1 FROM ev)
),
counts AS (SELECT ed, count(*)::BIGINT AS c FROM ev GROUP BY 1),
cal AS (
  SELECT d.ed // 7 AS wk, coalesce(c.c, 0)::BIGINT AS c
  FROM days d LEFT JOIN counts c ON c.ed = d.ed
),
wmax AS (SELECT wk, max(c)::BIGINT AS mx FROM cal GROUP BY 1),
mom AS (
  SELECT count(*)::BIGINT AS n_blocks, sum(mx)::BIGINT AS s1,
         sum(mx * mx)::BIGINT AS s2
  FROM wmax
),
d AS (
  SELECT n_blocks,
         s1::DOUBLE / n_blocks::DOUBLE AS mean,
         sqrt((s2::DOUBLE - s1::DOUBLE * (s1::DOUBLE / n_blocks::DOUBLE))
              / (n_blocks::DOUBLE - 1)) AS sd
  FROM mom
)
SELECT n_blocks,
       round(mean, 6) AS max_mean,
       round(sd, 6) AS max_sd,
       round(sd * sqrt(6.0) / 3.141592653589793, 6) AS gumbel_beta,
       round(mean - 0.5772156649015329
                    * (sd * sqrt(6.0) / 3.141592653589793), 6)
         AS gumbel_mu,
       round(mean - 0.5772156649015329
                    * (sd * sqrt(6.0) / 3.141592653589793)
             - (sd * sqrt(6.0) / 3.141592653589793) * ln(-ln(0.9)), 6)
         AS return_level_10
FROM d
"""

ORACLES["fdr_bh_nation_uniformity"] = """
WITH o AS (
  SELECT o_custkey,
         epoch_us(o_orderdate::TIMESTAMP) // 86400000000 AS ed
  FROM orders
),
cells AS (
  SELECT n_name, ed % 7 AS dow, count(*)::BIGINT AS obs
  FROM o
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY 1, 2
),
tot AS (SELECT n_name, sum(obs)::BIGINT AS ns FROM cells GROUP BY 1),
chi AS (
  SELECT c.n_name,
         sum(round((obs::DOUBLE - ns::DOUBLE / 7.0)
                   * (obs::DOUBLE - ns::DOUBLE / 7.0)
                   / (ns::DOUBLE / 7.0), 12)::DECIMAL(38,12))::DOUBLE AS x
  FROM cells c JOIN tot USING (n_name)
  GROUP BY 1
),
ps AS (
  SELECT n_name, round(x, 6) AS chi2,
         round(exp(-(x / 2.0))
               * (1.0 + x / 2.0 + (x / 2.0) * (x / 2.0) / 2.0), 12) AS p
  FROM chi
),
cnt AS (SELECT count(*)::BIGINT AS m FROM ps),
ranked AS (
  SELECT n_name, chi2, p, m,
         row_number() OVER (ORDER BY p ASC, n_name ASC) AS rk
  FROM ps, cnt
),
adj AS (
  SELECT n_name, chi2, p,
         least(1.0,
               min(p * m::DOUBLE / rk::DOUBLE)
                 OVER (ORDER BY p DESC, n_name DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           AS bh_adj_p
  FROM ranked
)
SELECT n_name, chi2,
       round(p, 6) AS p_value,
       round(bh_adj_p, 6) AS bh_adj_p,
       CASE WHEN bh_adj_p <= 0.10 THEN 1 ELSE 0 END AS rejected
FROM adj
ORDER BY n_name
"""

# ---- batch 162: HMM forward, Simpson check, MaxScore -----------------------

ORACLES["hmm_forward_loglik"] = """
WITH ev AS (
  SELECT epoch_us(ts) // 86400000000 AS ed FROM events
),
days AS (
  SELECT unnest(range(d0, d1 + 1)) AS ed
  FROM (SELECT min(ed) AS d0, max(ed) AS d1 FROM ev)
),
counts AS (SELECT ed, count(*)::BIGINT AS c FROM ev GROUP BY 1),
cal AS (
  SELECT d.ed, coalesce(c.c, 0)::BIGINT AS c
  FROM days d LEFT JOIN counts c ON c.ed = d.ed
),
mom AS (SELECT count(*)::BIGINT AS n, sum(c)::BIGINT AS s1 FROM cal),
obs AS (
  SELECT ed, (CASE WHEN c * n > s1 THEN 1 ELSE 0 END)::DOUBLE AS o
  FROM cal, mom
),
packed AS (
  SELECT (SELECT n FROM mom) AS n,
         sum(o::BIGINT)::BIGINT AS n_high,
         [[0.5::DOUBLE, 0.5::DOUBLE, 0.0::DOUBLE]]
           || list_transform(list(o ORDER BY ed), v -> [v]) AS elems
  FROM obs
),
folded AS (
  SELECT n, n_high,
         list_reduce(elems, (acc, x) -> [
           ((acc[1] * 0.8 + acc[2] * 0.3)
            * (CASE WHEN x[1] = 1.0 THEN 0.2 ELSE 0.8 END))
           / ((acc[1] * 0.8 + acc[2] * 0.3)
              * (CASE WHEN x[1] = 1.0 THEN 0.2 ELSE 0.8 END)
              + (acc[1] * 0.2 + acc[2] * 0.7)
                * (CASE WHEN x[1] = 1.0 THEN 0.7 ELSE 0.3 END)),
           ((acc[1] * 0.2 + acc[2] * 0.7)
            * (CASE WHEN x[1] = 1.0 THEN 0.7 ELSE 0.3 END))
           / ((acc[1] * 0.8 + acc[2] * 0.3)
              * (CASE WHEN x[1] = 1.0 THEN 0.2 ELSE 0.8 END)
              + (acc[1] * 0.2 + acc[2] * 0.7)
                * (CASE WHEN x[1] = 1.0 THEN 0.7 ELSE 0.3 END)),
           acc[3] + round(ln(
             (acc[1] * 0.8 + acc[2] * 0.3)
             * (CASE WHEN x[1] = 1.0 THEN 0.2 ELSE 0.8 END)
             + (acc[1] * 0.2 + acc[2] * 0.7)
               * (CASE WHEN x[1] = 1.0 THEN 0.7 ELSE 0.3 END)), 12)
         ]) AS st
  FROM packed
)
SELECT n AS n_days, n_high,
       round(st[3], 6) AS loglik,
       round(st[1], 6) AS p_state0_final,
       round(st[2], 6) AS p_state1_final
FROM folded
"""

ORACLES["simpsons_paradox_check"] = """
WITH li AS (
  SELECT l_returnflag,
         round(l_discount, 2)::DECIMAL(18,2) AS x,
         round(l_extendedprice, 2)::DECIMAL(18,2) AS y
  FROM lineitem
),
allb AS (
  SELECT l_returnflag AS stratum, count(*)::BIGINT AS n_rows,
         sum(x) AS sx, sum(y) AS sy,
         sum((x * y)::DECIMAL(38,4)) AS sxy,
         sum((x * x)::DECIMAL(38,4)) AS sxx,
         sum((y * y)::DECIMAL(38,4)) AS syy
  FROM li GROUP BY 1
  UNION ALL
  SELECT 'ALL', count(*)::BIGINT,
         sum(x), sum(y),
         sum((x * y)::DECIMAL(38,4)),
         sum((x * x)::DECIMAL(38,4)),
         sum((y * y)::DECIMAL(38,4))
  FROM li
)
SELECT stratum, n_rows,
       round((n_rows::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / (sqrt(n_rows::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                * sqrt(n_rows::DOUBLE * syy::DOUBLE
                       - sy::DOUBLE * sy::DOUBLE)), 6) AS pearson_r,
       sign(round((n_rows::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / (sqrt(n_rows::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                * sqrt(n_rows::DOUBLE * syy::DOUBLE
                       - sy::DOUBLE * sy::DOUBLE)), 6))::INT AS sign
FROM allb
ORDER BY stratum
"""


def maxscore_sql(query_text: str, k: int = 10) -> str:
    """maxscore_term_partition twin: per-term max BM25 contribution,
    page theta from the same scored CTEs, ascending-bound prefix."""
    qlit = query_text.replace("'", "''")
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
dft AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
scored AS (
  SELECT p.doc_id, p.term,
         ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * (p.tf * {K1 + 1.0}) / (p.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl))
           AS contrib
  FROM postings p
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
),
ub AS (
  SELECT s.term, d.df_t::BIGINT AS df_t,
         round(max(s.contrib), 6) AS ub
  FROM scored s JOIN dft d USING (term)
  GROUP BY 1, 2
),
agg AS (
  SELECT doc_id, round(sum(contrib), 6) AS score FROM scored GROUP BY 1
),
theta AS (
  SELECT min(score) AS theta FROM (
    SELECT score, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
    FROM agg
  ) WHERE r <= {k}
),
cum AS (
  SELECT term, df_t, ub,
         round(sum(ub) OVER (ORDER BY ub ASC, term ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW), 6) AS cum_ub_asc
  FROM ub
)
SELECT term, df_t, ub, cum_ub_asc,
       round(theta, 6) AS theta,
       CASE WHEN cum_ub_asc > theta THEN 1 ELSE 0 END AS essential
FROM cum, theta
ORDER BY ub ASC, term ASC
"""

# ---- batch 163: Ljung-Box, isotonic calibration, terms partition -----------

ORACLES["ljung_box_test"] = """
WITH ev AS (
  SELECT epoch_us(ts) // 86400000000 AS ed FROM events
),
days AS (
  SELECT unnest(range(d0, d1 + 1)) AS ed
  FROM (SELECT min(ed) AS d0, max(ed) AS d1 FROM ev)
),
counts AS (SELECT ed, count(*)::BIGINT AS c FROM ev GROUP BY 1),
cal AS (
  SELECT d.ed, coalesce(c.c, 0)::BIGINT AS c
  FROM days d LEFT JOIN counts c ON c.ed = d.ed
),
mom AS (
  SELECT count(*)::BIGINT AS n, sum(c)::BIGINT AS s1,
         sum(c * c)::BIGINT AS s2
  FROM cal
),
lags AS (SELECT unnest(range(1, 8)) AS k),
lagged AS (
  SELECT l.k,
         sum(a.c * b.c)::BIGINT AS ak,
         sum(a.c)::BIGINT AS hk,
         sum(b.c)::BIGINT AS tk
  FROM lags l
  JOIN cal a ON TRUE
  JOIN cal b ON a.ed + l.k = b.ed
  GROUP BY 1
),
terms AS (
  SELECT k, n,
         round((ak::DOUBLE
                - (s1::DOUBLE / n::DOUBLE) * (hk::DOUBLE + tk::DOUBLE)
                + (n::DOUBLE - k::DOUBLE) * (s1::DOUBLE / n::DOUBLE)
                  * (s1::DOUBLE / n::DOUBLE))
               / (s2::DOUBLE - s1::DOUBLE * (s1::DOUBLE / n::DOUBLE)),
               12) AS rk
  FROM lagged, mom
),
agg AS (
  SELECT n,
         sum(round(rk * rk / (n::DOUBLE - k::DOUBLE),
                   12)::DECIMAL(38,12))::DOUBLE AS tsum,
         max(CASE WHEN k = 1 THEN rk END) AS r1,
         max(CASE WHEN k = 2 THEN rk END) AS r2,
         max(CASE WHEN k = 3 THEN rk END) AS r3
  FROM terms GROUP BY 1
)
SELECT n AS n_days, 7::BIGINT AS n_lags,
       round(r1, 6) AS acf_1,
       round(r2, 6) AS acf_2,
       round(r3, 6) AS acf_3,
       round(n::DOUBLE * (n::DOUBLE + 2) * tsum, 6) AS q_stat
FROM agg
"""

ORACLES["isotonic_calibration_bins"] = """
WITH ev AS (
  SELECT least(9, floor((value / (value + 50.0)) * 10))::BIGINT AS bin,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END::BIGINT AS y
  FROM events
),
per AS (
  SELECT bin, count(*)::BIGINT AS nb, sum(y)::BIGINT AS yb
  FROM ev GROUP BY 1
),
pre AS (
  SELECT bin, nb, yb,
         sum(nb) OVER w AS cn, sum(yb) OVER w AS cy
  FROM per
  WINDOW w AS (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
ranges AS (
  SELECT lo.bin AS k, hi.bin AS j,
         round((hi.cy - (lo.cy - lo.yb))::DOUBLE
               / (hi.cn - (lo.cn - lo.nb))::DOUBLE, 12) AS wmean
  FROM pre lo JOIN pre hi ON hi.bin >= lo.bin
),
inner_ AS (
  SELECT b.bin AS i, r.k, min(r.wmean) AS minmean
  FROM per b JOIN ranges r ON r.j >= b.bin AND r.k <= b.bin
  GROUP BY 1, 2
),
fit AS (SELECT i, max(minmean) AS iso FROM inner_ GROUP BY 1)
SELECT p.bin, p.nb AS n_events, p.yb AS n_positive,
       round(p.yb::DOUBLE / p.nb::DOUBLE, 6) AS observed_rate,
       round(f.iso, 6) AS isotonic_rate
FROM per p JOIN fit f ON f.i = p.bin
ORDER BY p.bin
"""


ORACLES["storey_qvalue_panel"] = """
WITH o AS (
  SELECT o_custkey,
         epoch_us(o_orderdate::TIMESTAMP) // 86400000000 AS ed
  FROM orders
),
cells AS (
  SELECT n_name, ed % 7 AS dow, count(*)::BIGINT AS obs
  FROM o
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY 1, 2
),
tot AS (SELECT n_name, sum(obs)::BIGINT AS ns FROM cells GROUP BY 1),
chi AS (
  SELECT c.n_name,
         sum(round((obs::DOUBLE - ns::DOUBLE / 7.0)
                   * (obs::DOUBLE - ns::DOUBLE / 7.0)
                   / (ns::DOUBLE / 7.0), 12)::DECIMAL(38,12))::DOUBLE AS x
  FROM cells c JOIN tot USING (n_name)
  GROUP BY 1
),
ps AS (
  SELECT n_name,
         round(exp(-(x / 2.0))
               * (1.0 + x / 2.0 + (x / 2.0) * (x / 2.0) / 2.0), 12) AS p
  FROM chi
),
stats AS (
  SELECT count(*)::BIGINT AS m,
         sum(CASE WHEN p > 0.5 THEN 1 ELSE 0 END)::BIGINT AS n_over
  FROM ps
),
pi0 AS (
  SELECT m,
         round(least(1.0, n_over::DOUBLE / (0.5 * m::DOUBLE)), 12) AS pi0
  FROM stats
),
ranked AS (
  SELECT n_name, p, m, pi0,
         row_number() OVER (ORDER BY p ASC, n_name ASC) AS rk
  FROM ps, pi0
),
adj AS (
  SELECT n_name, p, pi0,
         least(1.0,
               pi0 * min(p * m::DOUBLE / rk::DOUBLE)
                       OVER (ORDER BY p DESC, n_name DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW)) AS qv
  FROM ranked
)
SELECT n_name,
       round(p, 6) AS p_value,
       round(pi0, 6) AS pi0,
       round(qv, 6) AS q_value,
       CASE WHEN qv <= 0.05 THEN 1 ELSE 0 END AS significant
FROM adj
ORDER BY n_name
"""

# ---- batch 164: tiered merge ladder, Elias-Fano, Lin's CCC -----------------

ORACLES["tiered_merge_ladder_plan"] = """
WITH nd AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
base AS (
  SELECT n_docs, (n_docs + 999) // 1000 AS n_flush FROM nd
),
tiers AS (
  SELECT n_docs, n_flush, t.tier, power(10, t.tier)::BIGINT AS p10
  FROM base, (SELECT unnest(range(10)) AS tier) t
  WHERE power(10, t.tier)::BIGINT <= n_flush
),
rows_ AS (
  SELECT tier, (1000 * p10)::BIGINT AS segment_docs,
         ((n_flush // p10) % 10)::BIGINT AS n_segments,
         n_flush, n_docs, p10
  FROM tiers
),
wa AS (
  SELECT sum(CASE WHEN tier > 0
                  THEN (n_flush // p10) * p10 * 1000 ELSE 0 END)::BIGINT
           AS merge_docs,
         any_value(n_docs) AS nd
  FROM rows_
)
SELECT tier, segment_docs, n_segments,
       round((merge_docs + nd)::DOUBLE / nd::DOUBLE, 6) AS write_amp
FROM rows_, wa
ORDER BY tier
"""

ORACLES["elias_fano_size_audit"] = f"""
WITH postings AS (
  SELECT DISTINCT term, doc_id FROM (
    SELECT doc_id, unnest({TOKS}) AS term FROM documents
  )
),
u AS (SELECT (max(doc_id) + 1)::BIGINT AS u FROM postings),
per AS (SELECT term, count(*)::BIGINT AS n FROM postings GROUP BY 1),
ef AS (
  SELECT count(*)::BIGINT AS n_terms,
         sum(n)::BIGINT AS total_postings,
         sum((n * (length(bin(u // n)) - 1) + 2 * n + 7) // 8)::BIGINT
           AS ef_bytes
  FROM per, u
),
gaps AS (
  SELECT doc_id - coalesce(lag(doc_id) OVER (PARTITION BY term
                                             ORDER BY doc_id), -1) AS g
  FROM postings
),
vb AS (
  SELECT sum(1 + CASE WHEN g >= 128 THEN 1 ELSE 0 END
               + CASE WHEN g >= 16384 THEN 1 ELSE 0 END
               + CASE WHEN g >= 2097152 THEN 1 ELSE 0 END)::BIGINT
           AS vb_bytes
  FROM gaps
)
SELECT n_terms, total_postings, ef_bytes, vb_bytes,
       round(ef_bytes::DOUBLE / vb_bytes::DOUBLE, 6) AS ef_over_varbyte
FROM ef, vb
"""

ORACLES["lins_ccc_order_totals"] = """
WITH li AS (
  SELECT l_orderkey AS o_orderkey,
         sum(round(l_extendedprice, 2)::DECIMAL(18,2))::DECIMAL(28,2) AS y
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT round(o_totalprice, 2)::DECIMAL(18,2) AS x, y
  FROM orders JOIN li USING (o_orderkey)
),
mom AS (
  SELECT count(*)::BIGINT AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum((x * y)::DECIMAL(38,4)) AS sxy,
         sum((x * x)::DECIMAL(38,4)) AS sxx,
         sum((y * y)::DECIMAL(38,4)) AS syy
  FROM j
),
d AS (
  SELECT n,
         sx::DOUBLE / n::DOUBLE AS mx,
         sy::DOUBLE / n::DOUBLE AS my,
         sxx::DOUBLE / n::DOUBLE
           - (sx::DOUBLE / n::DOUBLE) * (sx::DOUBLE / n::DOUBLE) AS vx,
         syy::DOUBLE / n::DOUBLE
           - (sy::DOUBLE / n::DOUBLE) * (sy::DOUBLE / n::DOUBLE) AS vy,
         sxy::DOUBLE / n::DOUBLE
           - (sx::DOUBLE / n::DOUBLE) * (sy::DOUBLE / n::DOUBLE) AS cxy
  FROM mom
)
SELECT n AS n_pairs,
       round(mx - my, 6) AS mean_shift,
       round(cxy / sqrt(vx * vy), 6) AS pearson_r,
       round(2.0 * cxy / (vx + vy + (mx - my) * (mx - my)), 6) AS lins_ccc,
       round((2.0 * cxy / (vx + vy + (mx - my) * (mx - my)))
             / (cxy / sqrt(vx * vy)), 6) AS bias_correction_cb
FROM d
"""

# ---- batch 165: hash collisions, A/A calibration, robust means -------------

def _hash_audit_leg(w: int) -> str:
    hexes = w // 4
    h = _MD5_52.format(e="'hc:' || doc_id::VARCHAR")
    # truncate by using only the first w/4 hex chars
    h = h.replace("substr(md5('hc:' || doc_id::VARCHAR), 1, 13)",
                  f"substr(md5('hc:' || doc_id::VARCHAR), 1, {hexes})")
    return f"""
  SELECT {w}::BIGINT AS bits, n, buckets_used, observed_pairs,
         round(n::DOUBLE * (n::DOUBLE - 1) / {float(2 ** (w + 1))!r}, 6)
           AS expected_pairs
  FROM (
    SELECT sum(c)::BIGINT AS n, count(*)::BIGINT AS buckets_used,
           sum(c * (c - 1) // 2)::BIGINT AS observed_pairs
    FROM (
      SELECT {h} AS b, count(*)::BIGINT AS c
      FROM documents GROUP BY 1
    )
  )"""


ORACLES["hash_collision_audit"] = (
    _hash_audit_leg(24)
    + "\nUNION ALL\n"
    + _hash_audit_leg(32)
    + "\nUNION ALL\n"
    + _hash_audit_leg(40)
    + "\nORDER BY bits"
)

ORACLES["aa_test_calibration"] = f"""
WITH per_user AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS ed,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
             END)::BIGINT AS y
  FROM events GROUP BY 1, 2
),
splits AS (
  SELECT user_id, y, s.split
  FROM per_user, (SELECT unnest(range(8)) AS split) s
),
armed AS (
  SELECT split, y,
         ({_MD5_52.format(e="'aa' || split::VARCHAR || ':' || user_id::VARCHAR")}) % 2
           AS arm
  FROM splits
),
g AS (
  SELECT split,
         sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
         sum(CASE WHEN arm = 0 THEN y ELSE 0 END)::BIGINT AS y0,
         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
         sum(CASE WHEN arm = 1 THEN y ELSE 0 END)::BIGINT AS y1
  FROM armed GROUP BY 1
)
SELECT split, n0, n1,
       round(y0::DOUBLE / n0::DOUBLE, 6) AS rate0,
       round(y1::DOUBLE / n1::DOUBLE, 6) AS rate1,
       round((y0::DOUBLE / n0::DOUBLE - y1::DOUBLE / n1::DOUBLE)
             / sqrt(((y0 + y1)::DOUBLE / (n0::DOUBLE + n1::DOUBLE))
                    * (1.0 - (y0 + y1)::DOUBLE / (n0::DOUBLE + n1::DOUBLE))
                    * (1.0 / n0::DOUBLE + 1.0 / n1::DOUBLE)), 6) AS z_stat,
       CASE WHEN abs((y0::DOUBLE / n0::DOUBLE - y1::DOUBLE / n1::DOUBLE)
             / sqrt(((y0 + y1)::DOUBLE / (n0::DOUBLE + n1::DOUBLE))
                    * (1.0 - (y0 + y1)::DOUBLE / (n0::DOUBLE + n1::DOUBLE))
                    * (1.0 / n0::DOUBLE + 1.0 / n1::DOUBLE))) > 1.96
            THEN 1 ELSE 0 END AS false_positive
FROM g
ORDER BY split
"""

ORACLES["trimmed_winsorized_means"] = """
WITH ev AS (
  SELECT round(value * 100, 0)::BIGINT AS cents FROM events
),
tab AS (SELECT cents, count(*)::BIGINT AS c FROM ev GROUP BY 1),
tot AS (SELECT sum(c)::BIGINT AS n FROM tab),
pre AS (
  SELECT cents, c, n,
         (sum(c) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) - c)::BIGINT AS a,
         n // 10 AS k
  FROM tab, tot
),
agg AS (
  SELECT any_value(n) AS n, any_value(k) AS k,
         sum(cents * c)::BIGINT AS raw_sum,
         sum(cents * greatest(0, least(a + c, n - k)
                              - greatest(a, k)))::BIGINT AS trim_sum,
         max(CASE WHEN a < k + 1 AND a + c >= k + 1
                  THEN cents END)::BIGINT AS v_low,
         max(CASE WHEN a < n - k AND a + c >= n - k
                  THEN cents END)::BIGINT AS v_high
  FROM pre
)
SELECT n AS n_events, k AS k_per_side,
       round(raw_sum::DOUBLE / n::DOUBLE / 100, 6) AS raw_mean,
       round(trim_sum::DOUBLE / (n::DOUBLE - 2 * k::DOUBLE) / 100, 6)
         AS trimmed_mean,
       round((trim_sum + k * v_low + k * v_high)::DOUBLE / n::DOUBLE / 100,
             6) AS winsorized_mean,
       round(v_low::DOUBLE / 100, 2) AS clip_low,
       round(v_high::DOUBLE / 100, 2) AS clip_high
FROM agg
"""

# ---- batch 166: RM3, pivoted normalization, LFU cache ----------------------

def pivoted_norm_sql(query_text: str, k: int = 10, s: float = 0.2) -> str:
    """pivoted_norm_topk twin."""
    qlit = query_text.replace("'", "''")
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
dft AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
scored AS (
  SELECT p.doc_id,
         (1.0 + ln(1.0 + ln(p.tf)))
           / ({1.0 - s!r} + {s!r} * l.dl / st.avgdl)
           * ln((st.n_docs + 1) / d.df_t) AS contrib
  FROM postings p
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats st
),
agg AS (
  SELECT doc_id, round(sum(contrib), 6) AS score FROM scored GROUP BY 1
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM agg
) WHERE rank <= {k}
ORDER BY rank
"""


ORACLES["lfu_cache_hit_curve"] = f"""
WITH cf AS (
  SELECT term, count(*)::BIGINT AS cf FROM (
    SELECT unnest({TOKS}) AS term FROM documents
  ) GROUP BY 1
),
tot AS (SELECT sum(cf)::BIGINT AS t FROM cf),
vocab AS (SELECT count(*)::BIGINT AS v FROM cf),
ranked AS (
  SELECT row_number() OVER (ORDER BY cf DESC, term ASC) AS rk,
         sum(cf) OVER (ORDER BY cf DESC, term ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cum
  FROM cf
),
at AS (
  SELECT s.cache_size, least(s.cache_size, v.v)::BIGINT AS terms_cached,
         round(r.cum::DOUBLE / t.t::DOUBLE, 6) AS hit_rate
  FROM (SELECT unnest([8, 16, 32, 64]) AS cache_size) s
  CROSS JOIN vocab v
  JOIN ranked r ON r.rk = least(s.cache_size, v.v)
  CROSS JOIN tot t
)
SELECT cache_size, terms_cached, hit_rate,
       round(hit_rate - coalesce(lag(hit_rate)
               OVER (ORDER BY cache_size), 0.0), 6) AS marginal_gain
FROM at
ORDER BY cache_size
"""

# ---- batch 167: Bass diffusion, AUC CI, MCC/F1 -----------------------------

ORACLES["bass_diffusion_fit"] = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS ed FROM events
),
first_ AS (SELECT user_id, min(ed) AS fd FROM ev GROUP BY 1),
days AS (
  SELECT unnest(range(d0, d1 + 1)) AS ed
  FROM (SELECT min(ed) AS d0, max(ed) AS d1 FROM ev)
),
adds AS (SELECT fd AS ed, count(*)::BIGINT AS n_t FROM first_ GROUP BY 1),
cal AS (
  SELECT d.ed, coalesce(a.n_t, 0)::BIGINT AS n_t
  FROM days d LEFT JOIN adds a ON a.ed = d.ed
),
pts AS (
  SELECT n_t AS y,
         (sum(n_t) OVER (ORDER BY ed
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) - n_t)::BIGINT AS x
  FROM cal
),
s AS (
  SELECT count(*)::BIGINT AS n,
         sum(x)::BIGINT AS sx,
         sum(x * x)::BIGINT AS sx2,
         sum(x * x * x)::BIGINT AS sx3,
         sum((x * x * x * x)::DECIMAL(38,0)) AS sx4,
         sum(y)::BIGINT AS sy,
         sum(x * y)::BIGINT AS sxy,
         sum(x * x * y)::BIGINT AS sx2y
  FROM pts
),
d AS (
  SELECT n, sy,
         n::DOUBLE * (sx2::DOUBLE * sx4::DOUBLE - sx3::DOUBLE * sx3::DOUBLE)
         - sx::DOUBLE * (sx::DOUBLE * sx4::DOUBLE - sx3::DOUBLE * sx2::DOUBLE)
         + sx2::DOUBLE * (sx::DOUBLE * sx3::DOUBLE - sx2::DOUBLE * sx2::DOUBLE)
           AS det,
         sy::DOUBLE * (sx2::DOUBLE * sx4::DOUBLE - sx3::DOUBLE * sx3::DOUBLE)
         - sx::DOUBLE * (sxy::DOUBLE * sx4::DOUBLE - sx3::DOUBLE * sx2y::DOUBLE)
         + sx2::DOUBLE * (sxy::DOUBLE * sx3::DOUBLE - sx2::DOUBLE * sx2y::DOUBLE)
           AS da,
         n::DOUBLE * (sxy::DOUBLE * sx4::DOUBLE - sx3::DOUBLE * sx2y::DOUBLE)
         - sy::DOUBLE * (sx::DOUBLE * sx4::DOUBLE - sx3::DOUBLE * sx2::DOUBLE)
         + sx2::DOUBLE * (sx::DOUBLE * sx2y::DOUBLE - sxy::DOUBLE * sx2::DOUBLE)
           AS db,
         n::DOUBLE * (sx2::DOUBLE * sx2y::DOUBLE - sxy::DOUBLE * sx3::DOUBLE)
         - sx::DOUBLE * (sx::DOUBLE * sx2y::DOUBLE - sxy::DOUBLE * sx2::DOUBLE)
         + sy::DOUBLE * (sx::DOUBLE * sx3::DOUBLE - sx2::DOUBLE * sx2::DOUBLE)
           AS dc
  FROM s
),
co AS (
  SELECT n, sy,
         CASE WHEN det <> 0 THEN da / det END AS a,
         CASE WHEN det <> 0 THEN db / det END AS bb,
         CASE WHEN det <> 0 THEN dc / det END AS cc
  FROM d
),
mm AS (
  SELECT n, sy, a, bb, cc,
         CASE WHEN a IS NOT NULL AND cc <> 0
                   AND bb * bb - 4 * a * cc >= 0
              THEN (-(bb) - sqrt(bb * bb - 4 * a * cc)) / (2 * cc)
         END AS m
  FROM co
)
SELECT n AS n_days, sy AS n_adopters,
       round(a, 6) AS coef_a,
       round(bb, 6) AS coef_b,
       round(cc, 9) AS coef_c,
       round(m, 6) AS market_m,
       round(a / m, 6) AS innovation_p,
       round(-(cc) * m, 6) AS imitation_q
FROM mm
"""

ORACLES["auc_hanley_mcneil_ci"] = """
WITH ev AS (
  SELECT round(value * 100, 0)::BIGINT AS cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END::BIGINT AS y
  FROM events
),
tab AS (
  SELECT cents, count(*)::BIGINT AS cv, sum(y)::BIGINT AS cp
  FROM ev GROUP BY 1
),
r AS (
  SELECT cv, cp,
         2 * (sum(cv) OVER (ORDER BY cents
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) - cv) + cv + 1 AS r2
  FROM tab
),
agg AS (
  SELECT sum(cp)::BIGINT AS n1,
         sum(cv - cp)::BIGINT AS n0,
         sum(cp * r2)::BIGINT AS sr2
  FROM r
),
d AS (
  SELECT n1, n0,
         (sr2::DOUBLE / 2 - n1::DOUBLE * (n1::DOUBLE + 1) / 2)
           / (n0::DOUBLE * n1::DOUBLE) AS auc
  FROM agg
),
se AS (
  SELECT n1, n0, auc,
         sqrt((auc * (1 - auc)
               + (n1::DOUBLE - 1) * (auc / (2 - auc) - auc * auc)
               + (n0::DOUBLE - 1)
                 * (2 * auc * auc / (1 + auc) - auc * auc))
              / (n0::DOUBLE * n1::DOUBLE)) AS se
  FROM d
)
SELECT n1 AS n_positive, n0 AS n_negative,
       round(auc, 6) AS auc,
       round(se, 6) AS se_hanley_mcneil,
       round(auc - 1.96 * se, 6) AS ci_lower,
       round(auc + 1.96 * se, 6) AS ci_upper
FROM se
"""

ORACLES["mcc_f1_threshold_panel"] = """
WITH ev AS (
  SELECT CASE WHEN round(value * 100, 0)::BIGINT > 5000
              THEN 1 ELSE 0 END::BIGINT AS pred,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END::BIGINT AS y
  FROM events
),
agg AS (
  SELECT sum(pred * y)::BIGINT AS tp,
         sum(pred * (1 - y))::BIGINT AS fp,
         sum((1 - pred) * y)::BIGINT AS fn,
         sum((1 - pred) * (1 - y))::BIGINT AS tn
  FROM ev
)
SELECT tp, fp, fn, tn,
       round(tp::DOUBLE / (tp::DOUBLE + fp::DOUBLE), 6) AS precision,
       round(tp::DOUBLE / (tp::DOUBLE + fn::DOUBLE), 6) AS recall,
       round(2 * (tp::DOUBLE / (tp::DOUBLE + fp::DOUBLE))
               * (tp::DOUBLE / (tp::DOUBLE + fn::DOUBLE))
             / (tp::DOUBLE / (tp::DOUBLE + fp::DOUBLE)
                + tp::DOUBLE / (tp::DOUBLE + fn::DOUBLE)), 6) AS f1,
       round((tp::DOUBLE / (tp::DOUBLE + fn::DOUBLE)
              + tn::DOUBLE / (tn::DOUBLE + fp::DOUBLE)) / 2, 6)
         AS balanced_accuracy,
       round((tp::DOUBLE * tn::DOUBLE - fp::DOUBLE * fn::DOUBLE)
             / sqrt((tp::DOUBLE + fp::DOUBLE) * (tp::DOUBLE + fn::DOUBLE)
                    * (tn::DOUBLE + fp::DOUBLE)
                    * (tn::DOUBLE + fn::DOUBLE)), 6) AS mcc
FROM agg
"""

# ---- batch 168: Welch ANOVA, partial correlation, Bowley -------------------

ORACLES["welch_anova_segments"] = """
WITH g AS (
  SELECT c_mktsegment, count(*)::BIGINT AS n,
         sum(round(o_totalprice, 2)::DECIMAL(18,2)) AS s1,
         sum((round(o_totalprice, 2)::DECIMAL(18,2)
              * round(o_totalprice, 2)::DECIMAL(18,2))::DECIMAL(38,4)) AS s2
  FROM orders JOIN customer ON c_custkey = o_custkey
  GROUP BY 1
),
per AS (
  SELECT c_mktsegment, n,
         round(s1::DOUBLE / n::DOUBLE, 12) AS m,
         round(n::DOUBLE
               / ((s2::DOUBLE - s1::DOUBLE * (s1::DOUBLE / n::DOUBLE))
                  / (n::DOUBLE - 1)), 12) AS w
  FROM g
),
tot AS (
  SELECT count(*)::BIGINT AS k,
         sum(w::DECIMAL(38,12))::DOUBLE AS sw,
         sum(round(w * m, 12)::DECIMAL(38,12))::DOUBLE AS swm
  FROM per
),
agg AS (
  SELECT k, sw, swm,
         sum(round(w * (m - swm / sw) * (m - swm / sw),
                   12)::DECIMAL(38,12))::DOUBLE AS num,
         sum(round((1.0 - w / sw) * (1.0 - w / sw)
                   / (n::DOUBLE - 1), 12)::DECIMAL(38,12))::DOUBLE AS lam
  FROM per, tot
  GROUP BY 1, 2, 3
)
SELECT k AS k_groups,
       (k - 1)::BIGINT AS df1,
       round((k::DOUBLE * k::DOUBLE - 1) / (3.0 * lam), 6) AS df2,
       round((num / (k::DOUBLE - 1))
             / (1.0 + 2.0 * (k::DOUBLE - 2)
                      / (k::DOUBLE * k::DOUBLE - 1) * lam), 6) AS welch_f
FROM agg
"""

ORACLES["partial_correlation_panel"] = """
WITH li AS (
  SELECT round(l_quantity, 2)::DECIMAL(18,2) AS x,
         round(l_extendedprice, 2)::DECIMAL(18,2) AS y,
         round(l_discount, 2)::DECIMAL(18,2) AS z
  FROM lineitem
),
mom AS (
  SELECT count(*)::BIGINT AS n,
         sum(x) AS sx, sum(y) AS sy, sum(z) AS sz,
         sum((x * y)::DECIMAL(38,4)) AS sxy,
         sum((x * z)::DECIMAL(38,4)) AS sxz,
         sum((y * z)::DECIMAL(38,4)) AS syz,
         sum((x * x)::DECIMAL(38,4)) AS sxx,
         sum((y * y)::DECIMAL(38,4)) AS syy,
         sum((z * z)::DECIMAL(38,4)) AS szz
  FROM li
),
r AS (
  SELECT n,
         (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
           / (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
              * sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))
           AS rxy,
         (n::DOUBLE * sxz::DOUBLE - sx::DOUBLE * sz::DOUBLE)
           / (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
              * sqrt(n::DOUBLE * szz::DOUBLE - sz::DOUBLE * sz::DOUBLE))
           AS rxz,
         (n::DOUBLE * syz::DOUBLE - sy::DOUBLE * sz::DOUBLE)
           / (sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)
              * sqrt(n::DOUBLE * szz::DOUBLE - sz::DOUBLE * sz::DOUBLE))
           AS ryz
  FROM mom
)
SELECT n AS n_rows,
       round(rxy, 6) AS r_xy,
       round(rxz, 6) AS r_xz,
       round(ryz, 6) AS r_yz,
       round((rxy - rxz * ryz)
             / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 6)
         AS r_xy_given_z
FROM r
"""

ORACLES["bowley_skewness_panel"] = """
WITH g AS (
  SELECT event_type, count(*)::BIGINT AS n,
         quantile_cont(value, 0.10) AS p10,
         quantile_cont(value, 0.25) AS q1,
         quantile_cont(value, 0.50) AS q2,
         quantile_cont(value, 0.75) AS q3,
         quantile_cont(value, 0.90) AS p90
  FROM events GROUP BY 1
)
SELECT event_type, n,
       round(q2, 6) AS median,
       round((q3 + q1 - 2 * q2) / (q3 - q1), 6) AS bowley_skew,
       round((q3 - q1) / (q3 + q1), 6) AS quartile_dispersion,
       round((p90 + p10 - 2 * q2) / (p90 - p10), 6) AS kelly_skew
FROM g
ORDER BY event_type
"""

# ---- batch 169: ZIP fit, Lorenz asymmetry, diversity panel -----------------

ORACLES["zip_moment_fit"] = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS ed FROM events
),
days AS (
  SELECT unnest(range(d0, d1 + 1)) AS ed
  FROM (SELECT min(ed) AS d0, max(ed) AS d1 FROM ev)
),
users AS (SELECT DISTINCT user_id FROM ev),
counts AS (
  SELECT user_id, ed, count(*)::BIGINT AS c FROM ev GROUP BY 1, 2
),
grid AS (
  SELECT u.user_id, d.ed, coalesce(c.c, 0)::BIGINT AS c
  FROM users u CROSS JOIN days d
  LEFT JOIN counts c ON c.user_id = u.user_id AND c.ed = d.ed
),
mom AS (
  SELECT count(*)::BIGINT AS n,
         sum(CASE WHEN c = 0 THEN 1 ELSE 0 END)::BIGINT AS n_zero,
         sum(c)::BIGINT AS s1, sum(c * c)::BIGINT AS s2
  FROM grid
),
d AS (
  SELECT n, n_zero,
         s1::DOUBLE / n::DOUBLE AS m,
         (s2::DOUBLE - s1::DOUBLE * (s1::DOUBLE / n::DOUBLE))
           / (n::DOUBLE - 1) AS s2v
  FROM mom
),
f AS (
  SELECT n, n_zero, m, s2v,
         (s2v + m * m - m) / m AS lam
  FROM d
)
SELECT n AS n_cells, n_zero AS n_zero_cells,
       round(m, 6) AS mean,
       round(s2v, 6) AS variance,
       round(CASE WHEN lam > m THEN lam END, 6) AS zip_lambda,
       round(CASE WHEN lam > m THEN 1.0 - m / lam END, 6) AS zip_pi_zero,
       round(n_zero::DOUBLE / n::DOUBLE, 6) AS observed_zero_frac
FROM f
"""

ORACLES["lorenz_asymmetry"] = """
WITH o AS (
  SELECT round(o_totalprice, 2)::DECIMAL(18,2) AS v FROM orders
),
tab AS (SELECT v, count(*)::BIGINT AS c FROM o GROUP BY 1),
tot AS (
  SELECT sum(c)::BIGINT AS n,
         sum((v * c)::DECIMAL(38,2)) AS t
  FROM tab
),
below AS (
  SELECT sum(c)::BIGINT AS x1,
         sum((v * c)::DECIMAL(38,2))::DOUBLE AS s1,
         max(v::DOUBLE) AS v_below
  FROM tab, tot WHERE v::DOUBLE < t::DOUBLE / n::DOUBLE
),
above AS (
  SELECT min(v::DOUBLE) AS v_above
  FROM tab, tot WHERE v::DOUBLE >= t::DOUBLE / n::DOUBLE
),
d AS (
  SELECT n, t, x1, s1, v_below, v_above,
         (t::DOUBLE / n::DOUBLE - v_below) / (v_above - v_below) AS delta
  FROM below, above, tot
)
SELECT n AS n_orders,
       round(t::DOUBLE / n::DOUBLE, 6) AS mean_value,
       round((x1::DOUBLE + delta) / n::DOUBLE, 6) AS f_mu,
       round((s1 + delta * (t::DOUBLE / n::DOUBLE)) / t::DOUBLE, 6) AS l_mu,
       round((x1::DOUBLE + delta) / n::DOUBLE
             + (s1 + delta * (t::DOUBLE / n::DOUBLE)) / t::DOUBLE, 6)
         AS lorenz_asymmetry
FROM d
"""

ORACLES["ecological_diversity_panel"] = f"""
WITH per AS (
  SELECT source, term, count(*)::BIGINT AS c FROM (
    SELECT source, unnest({TOKS}) AS term FROM documents
  ) GROUP BY 1, 2
),
tot AS (SELECT source, sum(c)::BIGINT AS n FROM per GROUP BY 1),
agg AS (
  SELECT p.source, t.n,
         count(*)::BIGINT AS richness,
         sum(round(-(p.c::DOUBLE / t.n::DOUBLE)
                   * ln(p.c::DOUBLE / t.n::DOUBLE),
                   12)::DECIMAL(28,12))::DOUBLE AS shannon_h,
         sum(p.c * (p.c - 1))::BIGINT AS pairs,
         max(p.c)::BIGINT AS cmax
  FROM per p JOIN tot t USING (source)
  GROUP BY 1, 2
)
SELECT source, n AS n_tokens, richness,
       round(shannon_h, 6) AS shannon_h,
       round(1.0 - pairs::DOUBLE / (n::DOUBLE * (n::DOUBLE - 1)), 6)
         AS gini_simpson,
       round(cmax::DOUBLE / n::DOUBLE, 6) AS berger_parker,
       round(shannon_h / ln(richness::DOUBLE), 6) AS pielou_evenness
FROM agg
ORDER BY source
"""

# ---- batch 170: fan-out tail, ICC, regression to mean ----------------------

ORACLES["fanout_tail_latency"] = """
WITH ev AS (SELECT event_id, value AS lat FROM events),
ranked AS (
  SELECT lat,
         (row_number() OVER (ORDER BY md5('fo:' || event_id::VARCHAR),
                             event_id) - 1)::BIGINT AS rn
  FROM ev
),
nq AS (SELECT (count(*) // 4)::BIGINT AS n_quartets FROM ranked),
quart AS (
  SELECT rn // 4 AS q, max(lat) AS mx
  FROM ranked, nq
  WHERE rn // 4 < n_quartets
  GROUP BY 1
),
single AS (
  SELECT count(*)::BIGINT AS n_calls,
         quantile_cont(lat, 0.50) AS s50,
         quantile_cont(lat, 0.95) AS s95,
         quantile_cont(lat, 0.99) AS s99
  FROM ev
),
fan AS (
  SELECT count(*)::BIGINT AS n_fanouts,
         quantile_cont(mx, 0.50) AS f50,
         quantile_cont(mx, 0.95) AS f95,
         quantile_cont(mx, 0.99) AS f99
  FROM quart
)
SELECT n_calls, n_fanouts,
       round(s50, 6) AS single_p50,
       round(s95, 6) AS single_p95,
       round(s99, 6) AS single_p99,
       round(f50, 6) AS fanout_p50,
       round(f95, 6) AS fanout_p95,
       round(f99, 6) AS fanout_p99,
       round(f50 / s50, 6) AS p50_amplification
FROM single, fan
"""

_ICC_NOISE = _MD5_52.format(
    e="'icc' || r::VARCHAR || ':' || doc_id::VARCHAR"
)

ORACLES["icc_two_way_raters"] = f"""
WITH rat AS (
  SELECT doc_id, r,
         (n_chars % 100 + ({_ICC_NOISE}) % 21 - 10)::BIGINT AS y
  FROM documents, (SELECT unnest(range(3)) AS r)
),
tot AS (
  SELECT count(DISTINCT doc_id)::BIGINT AS n,
         3::BIGINT AS k,
         sum(y)::BIGINT AS s,
         sum(y * y)::BIGINT AS ss
  FROM rat
),
rsum AS (
  SELECT sum(sr * sr)::BIGINT AS ssr FROM (
    SELECT doc_id, sum(y)::BIGINT AS sr FROM rat GROUP BY 1
  )
),
csum AS (
  SELECT sum(sc * sc)::BIGINT AS ssc FROM (
    SELECT r, sum(y)::BIGINT AS sc FROM rat GROUP BY 1
  )
),
d AS (
  SELECT n, k,
         ss::DOUBLE - s::DOUBLE * s::DOUBLE / (n::DOUBLE * k::DOUBLE)
           AS sst,
         ssr::DOUBLE / k::DOUBLE
           - s::DOUBLE * s::DOUBLE / (n::DOUBLE * k::DOUBLE) AS ssr_,
         ssc::DOUBLE / n::DOUBLE
           - s::DOUBLE * s::DOUBLE / (n::DOUBLE * k::DOUBLE) AS ssc_
  FROM tot, rsum, csum
),
ms AS (
  SELECT n, k,
         ssr_ / (n::DOUBLE - 1) AS msr,
         ssc_ / (k::DOUBLE - 1) AS msc,
         (sst - ssr_ - ssc_) / ((n::DOUBLE - 1) * (k::DOUBLE - 1)) AS mse
  FROM d
)
SELECT n AS n_subjects, k AS k_raters,
       round(msr, 6) AS ms_rows,
       round(msc, 6) AS ms_cols,
       round(mse, 6) AS ms_error,
       round((msr - mse)
             / (msr + (k::DOUBLE - 1) * mse
                + k::DOUBLE * (msc - mse) / n::DOUBLE), 6) AS icc_2_1
FROM ms
"""

ORACLES["regression_to_mean_audit"] = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us FROM events
),
span AS (SELECT ((min(us) + max(us)) // 2)::BIGINT AS mid FROM ev),
per AS (
  SELECT user_id,
         sum(CASE WHEN us < mid THEN 1 ELSE 0 END)::BIGINT AS h1,
         sum(CASE WHEN us >= mid THEN 1 ELSE 0 END)::BIGINT AS h2
  FROM ev, span GROUP BY 1
),
pop AS (SELECT sum(h1)::BIGINT AS t1, sum(h2)::BIGINT AS t2 FROM per),
top AS (
  SELECT user_id, h1, h2,
         row_number() OVER (ORDER BY h1 DESC, user_id ASC) AS rank
  FROM per
)
SELECT rank, user_id, h1, h2,
       round(h2::DOUBLE / h1::DOUBLE, 6) AS leader_ratio,
       round(t2::DOUBLE / t1::DOUBLE, 6) AS population_ratio
FROM top, pop
WHERE rank <= 5
ORDER BY rank
"""

# ---- batch 171: Sobel mediation, Markov removal, partition evolution -------

ORACLES["sobel_mediation_test"] = """
WITH li AS (
  SELECT round(l_discount, 2)::DECIMAL(18,2) AS x,
         round(l_quantity, 2)::DECIMAL(18,2) AS m,
         round(l_extendedprice, 2)::DECIMAL(18,2) AS y
  FROM lineitem
),
mom AS (
  SELECT count(*)::BIGINT AS n,
         sum(x) AS sx, sum(m) AS sm, sum(y) AS sy,
         sum((x * m)::DECIMAL(38,4)) AS sxm,
         sum((x * y)::DECIMAL(38,4)) AS sxy,
         sum((m * y)::DECIMAL(38,4)) AS smy,
         sum((x * x)::DECIMAL(38,4)) AS sxx,
         sum((m * m)::DECIMAL(38,4)) AS smm,
         sum((y * y)::DECIMAL(38,4)) AS syy
  FROM li
),
c AS (
  SELECT n,
         sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n::DOUBLE AS cxx,
         smm::DOUBLE - sm::DOUBLE * sm::DOUBLE / n::DOUBLE AS cmm,
         syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE AS cyy,
         sxm::DOUBLE - sx::DOUBLE * sm::DOUBLE / n::DOUBLE AS cxm,
         sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n::DOUBLE AS cxy,
         smy::DOUBLE - sm::DOUBLE * sy::DOUBLE / n::DOUBLE AS cmy
  FROM mom
),
f AS (
  SELECT n, cxx, cmm, cyy, cxm, cxy, cmy,
         cxm / cxx AS a,
         (cmm - (cxm / cxx) * cxm) / (n::DOUBLE - 2) / cxx AS sa2,
         cmm * cxx - cxm * cxm AS det
  FROM c
),
g AS (
  SELECT *,
         (cmy * cxx - cxy * cxm) / det AS b,
         (cxy * cmm - cmy * cxm) / det AS bx
  FROM f
),
h AS (
  SELECT *,
         (cyy - b * cmy - bx * cxy) / (n::DOUBLE - 3) * cxx / det AS sb2
  FROM g
)
SELECT n AS n_rows,
       round(a, 6) AS path_a,
       round(b, 6) AS path_b,
       round(a * b, 6) AS indirect_ab,
       round(bx, 6) AS direct_c_prime,
       round(cxy / cxx, 6) AS total_c,
       round(a * b / sqrt(b * b * sa2 + a * a * sb2), 6) AS sobel_z
FROM h
"""


def markov_removal_sql() -> str:
    """markov_removal_attribution twin: one reach-3 CTE chain per
    channel (the pinned closed channel set), start-weighted."""

    def reach(tag: str, where: str) -> str:
        return f"""
tmat_{tag} AS (
  SELECT s, t, p FROM tmat {where}
),
p1_{tag} AS (
  SELECT st.s, coalesce(m.p, 0.0) AS pk
  FROM states st
  LEFT JOIN tmat_{tag} m ON m.s = st.s AND m.t = 'purchase'
),
p2_{tag} AS (
  SELECT st.s,
         coalesce(b.pk, 0.0) + coalesce(r.reach, 0.0) AS pk
  FROM states st
  LEFT JOIN p1_{tag} b ON b.s = st.s
  LEFT JOIN (
    SELECT m.s,
           sum(round(m.p * c.pk, 12)::DECIMAL(38,12))::DOUBLE AS reach
    FROM tmat_{tag} m JOIN p1_{tag} c ON c.s = m.t
    WHERE m.t <> 'purchase'
    GROUP BY 1
  ) r ON r.s = st.s
),
p3_{tag} AS (
  SELECT st.s,
         coalesce(b.pk, 0.0) + coalesce(r.reach, 0.0) AS pk
  FROM states st
  LEFT JOIN p1_{tag} b ON b.s = st.s
  LEFT JOIN (
    SELECT m.s,
           sum(round(m.p * c.pk, 12)::DECIMAL(38,12))::DOUBLE AS reach
    FROM tmat_{tag} m JOIN p2_{tag} c ON c.s = m.t
    WHERE m.t <> 'purchase'
    GROUP BY 1
  ) r ON r.s = st.s
),
conv_{tag} AS (
  SELECT sum(round(st.w::DOUBLE * coalesce(
               CASE WHEN st.ss = '{tag if tag != "base" else "~"}'
                    THEN 0.0 ELSE p.pk END, 0.0),
               12)::DECIMAL(38,12))::DOUBLE
         / sum(st.w)::DOUBLE AS conv
  FROM starts st LEFT JOIN p3_{tag} p ON p.s = st.ss
)"""

    legs = [reach("base", "")]
    for ch in ["click", "error", "signup", "view"]:
        legs.append(
            reach(ch, f"WHERE s <> '{ch}' AND t <> '{ch}'")
        )
    unions = "\nUNION ALL\n".join(
        f"SELECT '{ch}' AS channel, (SELECT conv FROM conv_{ch}) AS conv_without"
        for ch in ["click", "error", "signup", "view"]
    )
    return f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events
),
seq AS (
  SELECT user_id, event_type AS s,
         lead(event_type) OVER w AS t,
         row_number() OVER w AS rn
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
trans AS (
  SELECT s, t, count(*)::BIGINT AS c
  FROM seq WHERE t IS NOT NULL GROUP BY 1, 2
),
totals AS (SELECT s, sum(c)::BIGINT AS n FROM trans GROUP BY 1),
tmat AS (
  SELECT tr.s, tr.t, tr.c::DOUBLE / tt.n::DOUBLE AS p
  FROM trans tr JOIN totals tt ON tt.s = tr.s
),
states AS (SELECT s FROM totals),
starts AS (
  SELECT s AS ss, count(*)::BIGINT AS w
  FROM seq WHERE rn = 1 GROUP BY 1
),
{",".join(legs)},
legs AS (
{unions}
),
effs AS (
  SELECT l.channel, l.conv_without,
         (SELECT conv FROM conv_base) AS conv,
         1.0 - l.conv_without / (SELECT conv FROM conv_base) AS eff
  FROM legs l
),
te AS (
  SELECT sum(round(eff, 12)::DECIMAL(38,12))::DOUBLE AS te FROM effs
)
SELECT channel,
       round(conv, 6) AS baseline_conv,
       round(conv_without, 6) AS conv_without,
       round(eff, 6) AS removal_effect,
       round(eff / te, 6) AS attribution_share
FROM effs, te
ORDER BY channel
"""


ORACLES["markov_removal_attribution"] = markov_removal_sql()

ORACLES["partition_evolution_plan"] = """
WITH o AS (
  SELECT epoch_us(o_orderdate::TIMESTAMP) // 86400000000 AS ed,
         strftime(o_orderdate, '%Y-%m') AS month
  FROM orders
),
day AS (
  SELECT month, ed, count(*)::BIGINT AS rows_ FROM o GROUP BY 1, 2
),
mon AS (
  SELECT month, count(*)::BIGINT AS day_files,
         sum(rows_)::BIGINT AS rows_
  FROM day GROUP BY 1
),
agg AS (
  SELECT count(*)::BIGINT AS n_months,
         sum(day_files)::BIGINT AS day_files_total,
         sum(rows_)::BIGINT AS n_rows
  FROM mon
)
SELECT n_months,
       day_files_total AS day_grain_files,
       n_months AS month_grain_files,
       n_rows,
       round(n_rows::DOUBLE / day_files_total::DOUBLE, 6)
         AS avg_rows_per_day_file,
       round(n_rows::DOUBLE / n_months::DOUBLE, 6)
         AS avg_rows_per_month_file,
       round(day_files_total::DOUBLE / n_months::DOUBLE, 6)
         AS files_touched_month_query_day_grain,
       1.0 AS files_touched_month_query_month_grain
FROM agg
"""

# ---- batch 172: term gaps, window PMI, TSB ---------------------------------

ORACLES["term_gap_histogram"] = f"""
WITH pos AS (
  SELECT doc_id, unnest({TOKS}) AS term,
         unnest(range(0, len({TOKS}))) AS p
  FROM documents
),
a AS (SELECT doc_id, p AS pa FROM pos WHERE term = 'table'),
b AS (SELECT doc_id, p AS pb FROM pos WHERE term = 'scan'),
gaps AS (
  SELECT a.doc_id, min(abs(a.pa - b.pb))::BIGINT AS gap
  FROM a JOIN b USING (doc_id)
  GROUP BY 1
)
SELECT gap, count(*)::BIGINT AS n_docs
FROM gaps GROUP BY 1 ORDER BY gap
"""

ORACLES["window_cooccurrence_pmi"] = f"""
WITH pos AS (
  SELECT doc_id, unnest({TOKS}) AS w,
         unnest(range(0, len({TOKS}))) AS p
  FROM documents
),
pairs AS (
  SELECT least(l.w, r.w) AS a, greatest(l.w, r.w) AS b
  FROM pos l JOIN pos r
    ON l.doc_id = r.doc_id AND r.p > l.p AND r.p - l.p <= 3
),
pc AS (SELECT a, b, count(*)::BIGINT AS c FROM pairs GROUP BY 1, 2),
tot AS (SELECT sum(c)::BIGINT AS n FROM pc),
uc AS (
  SELECT w, sum(c)::BIGINT AS cw FROM (
    SELECT a AS w, c FROM pc UNION ALL SELECT b, c FROM pc
  ) GROUP BY 1
),
scored AS (
  SELECT pc.a, pc.b, pc.c,
         round(ln(pc.c::DOUBLE * t.n::DOUBLE
                  / (ua.cw::DOUBLE * ub.cw::DOUBLE)), 6) AS pmi
  FROM pc
  JOIN uc ua ON ua.w = pc.a
  JOIN uc ub ON ub.w = pc.b
  CROSS JOIN tot t
  WHERE pc.c >= 5
)
SELECT rank, a, b, c AS pair_count, pmi
FROM (
  SELECT *, row_number() OVER (ORDER BY pmi DESC, a ASC, b ASC) AS rank
  FROM scored
) WHERE rank <= 15
ORDER BY rank
"""

ORACLES["tsb_intermittent_forecast"] = """
WITH pk AS (SELECT min(l_partkey) AS pk FROM lineitem),
d AS (
  SELECT pk.pk, epoch_us(l_shipdate::TIMESTAMP) // 86400000000 AS ed,
         sum(round(l_quantity, 2)::DECIMAL(28,2)) AS qd
  FROM lineitem, pk WHERE l_partkey = pk.pk
  GROUP BY 1, 2
),
span AS (SELECT pk, min(ed) AS d0, max(ed) AS d1 FROM d GROUP BY 1),
cal AS (
  SELECT pk, unnest(range(d0, d1 + 1)) AS ed FROM span
),
grid AS (
  SELECT c.pk, c.ed,
         coalesce(d.qd::DOUBLE, 0.0) AS q,
         CASE WHEN d.qd IS NOT NULL THEN 1.0 ELSE 0.0 END AS has_
  FROM cal c LEFT JOIN d ON d.pk = c.pk AND d.ed = c.ed
),
packed AS (
  SELECT pk, count(*)::BIGINT AS n_days,
         sum(has_::BIGINT)::BIGINT AS n_demand_days,
         list([q, has_] ORDER BY ed) AS arr
  FROM grid GROUP BY 1
),
st AS (
  SELECT pk, n_days, n_demand_days,
         list_reduce(arr, (acc, x) -> [
           CASE WHEN x[2] = 1.0 THEN (acc[1] + x[1]) / 2.0
                ELSE acc[1] END,
           (acc[2] + x[2]) / 2.0
         ]) AS s
  FROM packed
)
SELECT pk AS part_key, n_days, n_demand_days,
       round(s[1], 6) AS z_final,
       round(s[2], 6) AS p_final,
       round(s[2] * s[1], 6) AS tsb_forecast
FROM st
"""

# ---- batch 173: Spiegelhalter, reciprocity, MMD ----------------------------

ORACLES["spiegelhalter_z_test"] = """
WITH ev AS (
  SELECT value / (value + 50.0) AS p,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END::BIGINT AS y
  FROM events
),
agg AS (
  SELECT count(*)::BIGINT AS n_events,
         sum(y)::BIGINT AS n_positive,
         sum(round((y::DOUBLE - p) * (1.0 - 2 * p),
                   12)::DECIMAL(38,12))::DOUBLE AS num,
         sum(round((1.0 - 2 * p) * (1.0 - 2 * p) * p * (1.0 - p),
                   12)::DECIMAL(38,12))::DOUBLE AS den
  FROM ev
)
SELECT n_events, n_positive,
       round(num, 6) AS sum_residual_term,
       round(num / sqrt(den), 6) AS spiegelhalter_z
FROM agg
"""

ORACLES["transition_reciprocity"] = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events
),
seq AS (
  SELECT event_type AS s,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY us, event_id) AS t
  FROM ev
),
tc AS (
  SELECT s, t, count(*)::BIGINT AS c
  FROM seq WHERE t IS NOT NULL AND s <> t
  GROUP BY 1, 2
),
j AS (
  SELECT a.s, a.t, a.c, coalesce(b.c, 0)::BIGINT AS cr
  FROM tc a LEFT JOIN tc b ON b.s = a.t AND b.t = a.s
)
SELECT count(*)::BIGINT AS n_directed_pairs,
       sum(c)::BIGINT AS total_edges,
       sum(least(c, cr))::BIGINT AS reciprocated,
       round(sum(least(c, cr))::DOUBLE / sum(c)::DOUBLE, 6) AS reciprocity
FROM j
"""

_MMD_H = _MD5_52.format(e="'mmd:' || vec_id::VARCHAR")

ORACLES["mmd_rbf_drift"] = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         ({_MMD_H}) % 2 AS h,
         md5('mmds:' || vec_id::VARCHAR) AS mk
  FROM embeddings
),
samp AS (
  SELECT vec_id, v, h FROM (
    SELECT vec_id, v, h,
           row_number() OVER (PARTITION BY h ORDER BY mk, vec_id) AS r
    FROM e
  ) WHERE r <= 128
),
pairs AS (
  SELECT a.h AS ha, b.h AS hb,
         round(exp(-(round(list_dot_product(a.v, a.v)
                           + list_dot_product(b.v, b.v)
                           - 2.0 * list_dot_product(a.v, b.v), 9))
                   / 8.0), 12)::DECIMAL(38,12) AS k
  FROM samp a CROSS JOIN samp b
  WHERE a.vec_id <> b.vec_id
),
agg AS (
  SELECT ha, hb, count(*)::BIGINT AS np, sum(k)::DOUBLE AS sk
  FROM pairs GROUP BY 1, 2
),
cnt AS (SELECT h, count(*)::BIGINT AS m FROM samp GROUP BY 1),
parts AS (
  SELECT
    (SELECT m FROM cnt WHERE h = 0) AS m,
    (SELECT m FROM cnt WHERE h = 1) AS n,
    (SELECT sk FROM agg WHERE ha = 0 AND hb = 0) AS sxx,
    (SELECT sk FROM agg WHERE ha = 1 AND hb = 1) AS syy,
    (SELECT sum(sk::DECIMAL(38,12))::DOUBLE FROM agg WHERE ha <> hb) AS sxy
),
d AS (
  SELECT m, n,
         sxx / (m::DOUBLE * (m::DOUBLE - 1))
         + syy / (n::DOUBLE * (n::DOUBLE - 1))
         - sxy / (m::DOUBLE * n::DOUBLE) AS mmd2
  FROM parts
)
SELECT m AS m_sample, n AS n_sample,
       round(mmd2, 6) AS mmd2,
       round(sqrt(greatest(mmd2, 0.0)), 6) AS mmd
FROM d
"""

# ---- batch 174: sequential looks, temporal leakage, negative sampling ------

from lucene_mapreduce_spark.operators.parity import (  # noqa: E402
    OBF_BOUNDS as _OBF_BOUNDS,
)

ORACLES["group_sequential_looks"] = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_type FROM events
),
span AS (SELECT min(us) AS u0, max(us) AS u1 FROM ev),
ud AS (
  SELECT user_id, us // 86400000000 AS ed,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
             END)::BIGINT AS y,
         min(us) AS first_us
  FROM ev GROUP BY 1, 2
),
looks AS (
  SELECT l.look, (u0 + ((u1 - u0) * l.look) // 3)::BIGINT AS cutoff
  FROM span, (SELECT unnest([1, 2, 3]) AS look) l
),
j AS (
  SELECT lk.look,
         sum(CASE WHEN ({_BM_ARM}) % 2 = 0 THEN 1 ELSE 0 END)::BIGINT
           AS n0,
         sum(CASE WHEN ({_BM_ARM}) % 2 = 0 THEN y ELSE 0 END)::BIGINT
           AS y0,
         sum(CASE WHEN ({_BM_ARM}) % 2 = 1 THEN 1 ELSE 0 END)::BIGINT
           AS n1,
         sum(CASE WHEN ({_BM_ARM}) % 2 = 1 THEN y ELSE 0 END)::BIGINT
           AS y1
  FROM ud CROSS JOIN looks lk
  WHERE ud.first_us <= lk.cutoff
  GROUP BY 1
),
tot AS (SELECT max(n0 + n1)::BIGINT AS ntot FROM j),
z AS (
  SELECT look, n0, n1, y0, y1, ntot,
         (y0::DOUBLE / n0::DOUBLE - y1::DOUBLE / n1::DOUBLE)
         / sqrt(((y0 + y1)::DOUBLE / (n0::DOUBLE + n1::DOUBLE))
                * (1.0 - (y0 + y1)::DOUBLE / (n0::DOUBLE + n1::DOUBLE))
                * (1.0 / n0::DOUBLE + 1.0 / n1::DOUBLE)) AS zs,
         CASE look WHEN 1 THEN {_OBF_BOUNDS[0]} WHEN 2 THEN {_OBF_BOUNDS[1]}
                   ELSE {_OBF_BOUNDS[2]} END AS bound
  FROM j, tot
)
SELECT look, (n0 + n1)::BIGINT AS n_units,
       round((n0 + n1)::DOUBLE / ntot::DOUBLE, 6) AS information_frac,
       round(zs, 6) AS z_stat,
       bound AS obf_bound,
       CASE WHEN abs(zs) > bound THEN 1 ELSE 0 END AS crossed
FROM z
ORDER BY look
"""

ORACLES["temporal_split_leakage"] = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us FROM events
),
span AS (SELECT min(us) AS u0, max(us) AS u1 FROM ev),
cut AS (
  SELECT (u0 + ((u1 - u0) * 4) // 5)::BIGINT AS cutoff FROM span
),
tagged AS (
  SELECT user_id, us > cutoff AS is_test FROM ev, cut
),
train_u AS (
  SELECT DISTINCT user_id FROM tagged WHERE NOT is_test
),
test_ev AS (SELECT user_id FROM tagged WHERE is_test),
test_u AS (SELECT DISTINCT user_id FROM test_ev),
a AS (SELECT count(*)::BIGINT AS train_users FROM train_u),
b AS (SELECT count(*)::BIGINT AS test_users FROM test_u),
c AS (
  SELECT count(*)::BIGINT AS seen_test_users
  FROM test_u JOIN train_u USING (user_id)
),
d AS (SELECT count(*)::BIGINT AS test_events FROM test_ev),
e AS (
  SELECT count(*)::BIGINT AS test_events_seen
  FROM test_ev JOIN train_u USING (user_id)
)
SELECT train_users, test_users, seen_test_users,
       round(seen_test_users::DOUBLE / test_users::DOUBLE, 6)
         AS user_leakage_frac,
       test_events, test_events_seen,
       round(test_events_seen::DOUBLE / test_events::DOUBLE, 6)
         AS event_leakage_frac
FROM a, b, c, d, e
"""

ORACLES["negative_sampling_table"] = f"""
WITH cf AS (
  SELECT term, count(*)::BIGINT AS cf FROM (
    SELECT unnest({TOKS}) AS term FROM documents
  ) GROUP BY 1
),
scored AS (
  SELECT term, cf,
         round(sqrt(cf::DOUBLE * sqrt(cf::DOUBLE)), 6) AS w
  FROM cf
),
tot AS (
  SELECT sum(w::DECIMAL(28,6))::DOUBLE AS tw, sum(cf)::BIGINT AS tc
  FROM scored
)
SELECT term, cf, w AS weight,
       round(w / tw, 6) AS sample_share,
       round(cf::DOUBLE / tc::DOUBLE, 6) AS raw_share
FROM scored, tot
ORDER BY sample_share DESC, term ASC
"""

# ---- batch 175: Qini uplift, LMG importance, covariance ellipse ------------

ORACLES["qini_uplift_deciles"] = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS ed, event_type, value
  FROM events
),
ud AS (
  SELECT user_id, ed,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
             END)::BIGINT AS y,
         max(value) AS mv
  FROM ev GROUP BY 1, 2
),
scored AS (
  SELECT ({_BM_ARM}) % 2 AS t, y,
         mv / (mv + 50.0) AS p, user_id, ed
  FROM ud
),
dec AS (
  SELECT t, y,
         ntile(10) OVER (ORDER BY p DESC, user_id ASC, ed ASC) AS decile
  FROM scored
),
per AS (
  SELECT decile,
         sum(CASE WHEN t = 1 THEN 1 ELSE 0 END)::BIGINT AS nt,
         sum(CASE WHEN t = 1 THEN y ELSE 0 END)::BIGINT AS yt,
         sum(CASE WHEN t = 0 THEN 1 ELSE 0 END)::BIGINT AS nc,
         sum(CASE WHEN t = 0 THEN y ELSE 0 END)::BIGINT AS yc
  FROM dec GROUP BY 1
),
cum AS (
  SELECT decile,
         sum(nt) OVER w AS cnt, sum(yt) OVER w AS cyt,
         sum(nc) OVER w AS cnc, sum(yc) OVER w AS cyc
  FROM per
  WINDOW w AS (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT decile,
       cnt::BIGINT AS cum_treated,
       cnc::BIGINT AS cum_control,
       cyt::BIGINT AS cum_treated_resp,
       cyc::BIGINT AS cum_control_resp,
       round(cyt::DOUBLE - cyc::DOUBLE * cnt::DOUBLE / cnc::DOUBLE, 6)
         AS qini
FROM cum
ORDER BY decile
"""

ORACLES["lmg_relative_importance"] = """
WITH li AS (
  SELECT round(l_discount, 2)::DECIMAL(18,2) AS x1,
         round(l_quantity, 2)::DECIMAL(18,2) AS x2,
         round(l_tax, 2)::DECIMAL(18,2) AS x3,
         round(l_extendedprice, 2)::DECIMAL(18,2) AS y
  FROM lineitem
),
mom AS (
  SELECT count(*)::BIGINT AS n,
         sum(x1) AS s1, sum(x2) AS s2, sum(x3) AS s3, sum(y) AS sy,
         sum((x1 * x1)::DECIMAL(38,4)) AS x1x1,
         sum((x2 * x2)::DECIMAL(38,4)) AS x2x2,
         sum((x3 * x3)::DECIMAL(38,4)) AS x3x3,
         sum((y * y)::DECIMAL(38,4)) AS yy,
         sum((x1 * x2)::DECIMAL(38,4)) AS x1x2,
         sum((x1 * x3)::DECIMAL(38,4)) AS x1x3,
         sum((x2 * x3)::DECIMAL(38,4)) AS x2x3,
         sum((x1 * y)::DECIMAL(38,4)) AS x1y,
         sum((x2 * y)::DECIMAL(38,4)) AS x2y,
         sum((x3 * y)::DECIMAL(38,4)) AS x3y
  FROM li
),
cv AS (
  SELECT n,
         x1x1::DOUBLE - s1::DOUBLE * s1::DOUBLE / n::DOUBLE AS c11,
         x2x2::DOUBLE - s2::DOUBLE * s2::DOUBLE / n::DOUBLE AS c22,
         x3x3::DOUBLE - s3::DOUBLE * s3::DOUBLE / n::DOUBLE AS c33,
         yy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE AS cyy,
         x1x2::DOUBLE - s1::DOUBLE * s2::DOUBLE / n::DOUBLE AS c12,
         x1x3::DOUBLE - s1::DOUBLE * s3::DOUBLE / n::DOUBLE AS c13,
         x2x3::DOUBLE - s2::DOUBLE * s3::DOUBLE / n::DOUBLE AS c23,
         x1y::DOUBLE - s1::DOUBLE * sy::DOUBLE / n::DOUBLE AS c1y,
         x2y::DOUBLE - s2::DOUBLE * sy::DOUBLE / n::DOUBLE AS c2y,
         x3y::DOUBLE - s3::DOUBLE * sy::DOUBLE / n::DOUBLE AS c3y
  FROM mom
),
rr AS (
  SELECT n,
         c1y / sqrt(c11 * cyy) AS r1,
         c2y / sqrt(c22 * cyy) AS r2,
         c3y / sqrt(c33 * cyy) AS r3,
         c12 / sqrt(c11 * c22) AS p12,
         c13 / sqrt(c11 * c33) AS p13,
         c23 / sqrt(c22 * c33) AS p23
  FROM cv
),
subs AS (
  SELECT n, r1, r2, r3, p12, p13, p23,
         r1 * r1 AS r2_1, r2 * r2 AS r2_2, r3 * r3 AS r2_3,
         (r1 * r1 + r2 * r2 - 2 * r1 * r2 * p12)
           / (1.0 - p12 * p12) AS r2_12,
         (r1 * r1 + r3 * r3 - 2 * r1 * r3 * p13)
           / (1.0 - p13 * p13) AS r2_13,
         (r2 * r2 + r3 * r3 - 2 * r2 * r3 * p23)
           / (1.0 - p23 * p23) AS r2_23,
         1.0 * (1.0 - p23 * p23)
           - p12 * (p12 - p23 * p13)
           + p13 * (p12 * p23 - p13) AS det
  FROM rr
),
bb AS (
  SELECT *,
         (r1 * (1.0 - p23 * p23) - p12 * (r2 - p23 * r3)
          + p13 * (r2 * p23 - r3)) / det AS b1,
         (1.0 * (r2 - p23 * r3) - r1 * (p12 - p23 * p13)
          + p13 * (p12 * r3 - p13 * r2)) / det AS b2,
         (1.0 * (p23 * r2 - r3) * -1.0 - p12 * (p12 * r3 - p13 * r2)
          + r1 * (p12 * p23 - p13)) / det AS b3
  FROM subs
),
ff AS (
  SELECT *, b1 * r1 + b2 * r2 + b3 * r3 AS r2_full FROM bb
),
lmg AS (
  SELECT n, r2_1, r2_2, r2_3, r2_full,
         (1.0 / 3) * r2_1 + (1.0 / 6) * (r2_12 - r2_2)
           + (1.0 / 6) * (r2_13 - r2_3)
           + (1.0 / 3) * (r2_full - r2_23) AS l1,
         (1.0 / 3) * r2_2 + (1.0 / 6) * (r2_12 - r2_1)
           + (1.0 / 6) * (r2_23 - r2_3)
           + (1.0 / 3) * (r2_full - r2_13) AS l2,
         (1.0 / 3) * r2_3 + (1.0 / 6) * (r2_13 - r2_1)
           + (1.0 / 6) * (r2_23 - r2_2)
           + (1.0 / 3) * (r2_full - r2_12) AS l3
  FROM ff
)
SELECT feature, n AS n_rows, r2_alone, lmg_share, r2_full
FROM (
  SELECT n, 'discount' AS feature, round(r2_1, 6) AS r2_alone,
         round(l1, 6) AS lmg_share, round(r2_full, 6) AS r2_full
  FROM lmg
  UNION ALL
  SELECT n, 'quantity', round(r2_2, 6), round(l2, 6), round(r2_full, 6)
  FROM lmg
  UNION ALL
  SELECT n, 'tax', round(r2_3, 6), round(l3, 6), round(r2_full, 6)
  FROM lmg
)
ORDER BY feature
"""

ORACLES["covariance_ellipse_2d"] = """
WITH li AS (
  SELECT round(l_quantity, 2)::DECIMAL(18,2) AS x,
         round(l_extendedprice, 2)::DECIMAL(18,2) AS y
  FROM lineitem
),
mom AS (
  SELECT count(*)::BIGINT AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum((x * x)::DECIMAL(38,4)) AS sxx,
         sum((y * y)::DECIMAL(38,4)) AS syy,
         sum((x * y)::DECIMAL(38,4)) AS sxy
  FROM li
),
cv AS (
  SELECT n,
         (sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n::DOUBLE)
           / (n::DOUBLE - 1) AS a,
         (syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE)
           / (n::DOUBLE - 1) AS c,
         (sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n::DOUBLE)
           / (n::DOUBLE - 1) AS b
  FROM mom
),
eig AS (
  SELECT n, a, c, b,
         (a + c + sqrt((a - c) * (a - c) + 4 * b * b)) / 2 AS l1,
         (a + c - sqrt((a - c) * (a - c) + 4 * b * b)) / 2 AS l2
  FROM cv
)
SELECT n AS n_rows,
       round(a, 6) AS var_x,
       round(c, 6) AS var_y,
       round(b, 6) AS cov_xy,
       round(l1, 6) AS lambda1,
       round(l2, 6) AS lambda2,
       round(atan2(2 * b, a - c) / 2, 6) AS angle_rad,
       round(sqrt(1.0 - l2 / l1), 6) AS eccentricity,
       round(l1 / (l1 + l2), 6) AS explained_share
FROM eig
"""

# ---- batch 176: stratified ATE, Sharpe/Sortino, alpha-nDCG -----------------

ORACLES["stratified_ate_quintiles"] = """
WITH li AS (
  SELECT CASE WHEN round(l_discount, 2) >= 0.05 THEN 1 ELSE 0 END AS t,
         round(l_extendedprice / l_quantity, 6) AS y,
         l_quantity, l_orderkey, l_linenumber
  FROM lineitem
),
strat AS (
  SELECT t, y,
         ntile(5) OVER (ORDER BY l_quantity ASC, l_orderkey ASC,
                        l_linenumber ASC) AS stratum
  FROM li
),
per AS (
  SELECT stratum, count(*)::BIGINT AS n,
         sum(CASE WHEN t = 1 THEN 1 ELSE 0 END)::BIGINT AS nt,
         sum(CASE WHEN t = 1
                  THEN round(y, 12)::DECIMAL(38,12) END) AS syt,
         sum(CASE WHEN t = 0 THEN 1 ELSE 0 END)::BIGINT AS nc,
         sum(CASE WHEN t = 0
                  THEN round(y, 12)::DECIMAL(38,12) END) AS syc
  FROM strat GROUP BY 1
),
tot AS (SELECT sum(n)::BIGINT AS ntot FROM per),
rows_ AS (
  SELECT stratum, n, nt, nc,
         round(syt::DOUBLE / nt::DOUBLE - syc::DOUBLE / nc::DOUBLE, 6)
           AS stratum_effect,
         round(n::DOUBLE / ntot::DOUBLE, 6) AS weight
  FROM per, tot
),
ate AS (
  SELECT sum(round(weight * stratum_effect,
                   12)::DECIMAL(38,12))::DOUBLE AS ate
  FROM rows_
)
SELECT stratum, n, nt, nc, stratum_effect, weight,
       round(ate, 6) AS stratified_ate
FROM rows_, ate
ORDER BY stratum
"""

ORACLES["sharpe_sortino_daily"] = """
WITH o AS (
  SELECT epoch_us(o_orderdate::TIMESTAMP) // 86400000000 AS ed,
         round(o_totalprice, 2)::DECIMAL(28,2) AS v
  FROM orders
),
days AS (
  SELECT unnest(range(d0, d1 + 1)) AS ed
  FROM (SELECT min(ed) AS d0, max(ed) AS d1 FROM o)
),
daily AS (SELECT ed, sum(v) AS rev FROM o GROUP BY 1),
cal AS (
  SELECT d.ed, coalesce(dl.rev, 0::DECIMAL(38,2)) AS rev
  FROM days d LEFT JOIN daily dl ON dl.ed = d.ed
),
dd AS (
  SELECT ed,
         rev - lag(rev) OVER (ORDER BY ed) AS delta,
         max(cum) OVER (ORDER BY ed
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) - cum AS drawdown
  FROM (
    SELECT ed, rev,
           sum(rev) OVER (ORDER BY ed
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum
    FROM cal
  )
),
mom AS (
  SELECT count(delta)::BIGINT AS n_changes,
         sum(delta) AS s1,
         sum((delta * delta)::DECIMAL(38,4)) AS s2,
         sum(CASE WHEN delta < 0
                  THEN (delta * delta)::DECIMAL(38,4)
                  ELSE 0::DECIMAL(38,4) END) AS sdn,
         max(drawdown)::DOUBLE AS max_drawdown
  FROM dd
),
d AS (
  SELECT n_changes, max_drawdown,
         s1::DOUBLE / n_changes::DOUBLE AS mean,
         sqrt((s2::DOUBLE - s1::DOUBLE * (s1::DOUBLE / n_changes::DOUBLE))
              / (n_changes::DOUBLE - 1)) AS sd,
         sqrt(sdn::DOUBLE / n_changes::DOUBLE) AS ddev
  FROM mom
)
SELECT n_changes,
       round(mean, 6) AS mean_delta,
       round(sd, 6) AS sd_delta,
       round(ddev, 6) AS downside_dev,
       round(mean / sd, 6) AS sharpe,
       round(mean / ddev, 6) AS sortino,
       round(max_drawdown, 2) AS max_drawdown
FROM d
"""


def alpha_ndcg_sql(query_text: str, k: int = 20) -> str:
    """alpha_ndcg_diversity twin: bm25 page + lang aspects, dyadic
    0.5^seen gains, shared 1/ln2 discounts."""
    qlit = query_text.replace("'", "''")
    return f"""
WITH doclens AS (
  SELECT doc_id, len({TOKS}) AS dl FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl::DOUBLE) AS avgdl FROM doclens
),
toks AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
qterms AS (
  SELECT DISTINCT unnest({duckdb_tokens_sql(f"'{qlit}'")}) AS term
),
dft AS (
  SELECT p.term, count(*)::DOUBLE AS df_t
  FROM postings p JOIN qterms q USING (term) GROUP BY 1
),
scored AS (
  SELECT p.doc_id,
         ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * (p.tf * {K1 + 1.0}) / (p.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl))
           AS contrib
  FROM postings p
  JOIN dft d USING (term)
  JOIN doclens l USING (doc_id)
  CROSS JOIN stats s
),
agg AS (
  SELECT doc_id, round(sum(contrib), 6) AS score FROM scored GROUP BY 1
),
page AS (
  SELECT a.doc_id, a.r AS rank, d.lang
  FROM (
    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
    FROM agg
  ) a JOIN documents d USING (doc_id)
  WHERE a.r <= {k}
),
obs AS (
  SELECT rank, lang,
         row_number() OVER (PARTITION BY lang ORDER BY rank) - 1 AS seen
  FROM page
),
dcg AS (
  SELECT count(*)::BIGINT AS k_used,
         count(DISTINCT lang)::BIGINT AS n_aspects,
         sum(round((1.0 / power(2, seen)::BIGINT::DOUBLE)
                   / (ln(rank::DOUBLE + 1) * 1.4426950408889634),
                   12)::DECIMAL(38,12))::DOUBLE AS dcg
  FROM obs
),
gains AS (
  SELECT lang,
         row_number() OVER (PARTITION BY lang ORDER BY rank) - 1 AS j
  FROM page
),
ideal AS (
  SELECT 1.0 / power(2, j)::BIGINT::DOUBLE AS g,
         row_number() OVER (
           ORDER BY 1.0 / power(2, j)::BIGINT::DOUBLE DESC,
                    lang ASC, j ASC) AS pos
  FROM gains
),
idcg AS (
  SELECT sum(round(g / (ln(pos::DOUBLE + 1) * 1.4426950408889634),
                   12)::DECIMAL(38,12))::DOUBLE AS idcg
  FROM ideal
)
SELECT k_used, n_aspects,
       round(dcg, 6) AS alpha_dcg,
       round(idcg, 6) AS ideal_dcg,
       round(dcg / idcg, 6) AS alpha_ndcg
FROM dcg, idcg
"""

# ---- batch 177: ARCH-LM, turning points, Newey-West ------------------------

ORACLES["arch_lm_test"] = """
WITH ev AS (
  SELECT epoch_us(ts) // 86400000000 AS ed FROM events
),
days AS (
  SELECT unnest(range(d0, d1 + 1)) AS ed
  FROM (SELECT min(ed) AS d0, max(ed) AS d1 FROM ev)
),
counts AS (SELECT ed, count(*)::BIGINT AS c FROM ev GROUP BY 1),
cal AS (
  SELECT d.ed, coalesce(c.c, 0)::BIGINT AS c
  FROM days d LEFT JOIN counts c ON c.ed = d.ed
),
sq AS (
  SELECT ed,
         (c - lag(c) OVER (ORDER BY ed))
         * (c - lag(c) OVER (ORDER BY ed)) AS e2
  FROM cal
),
pair AS (
  SELECT a.e2 AS y, b.e2 AS x
  FROM sq a JOIN sq b ON a.ed = b.ed + 1
  WHERE a.e2 IS NOT NULL AND b.e2 IS NOT NULL
),
mom AS (
  SELECT count(*)::BIGINT AS n,
         sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum((x * y)::DECIMAL(38,0)) AS sxy,
         sum((x * x)::DECIMAL(38,0)) AS sxx,
         sum((y * y)::DECIMAL(38,0)) AS syy
  FROM pair
),
d AS (
  SELECT n,
         (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
         * (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
         / ((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
            * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)) AS r2
  FROM mom
)
SELECT n AS n_pairs,
       round(r2, 6) AS r_squared,
       round(n::DOUBLE * r2, 6) AS arch_lm_stat,
       CASE WHEN n::DOUBLE * r2 > 3.841 THEN 1 ELSE 0 END AS reject_at_05
FROM d
"""

ORACLES["turning_point_test"] = """
WITH ev AS (
  SELECT epoch_us(ts) // 86400000000 AS ed FROM events
),
days AS (
  SELECT unnest(range(d0, d1 + 1)) AS ed
  FROM (SELECT min(ed) AS d0, max(ed) AS d1 FROM ev)
),
counts AS (SELECT ed, count(*)::BIGINT AS c FROM ev GROUP BY 1),
cal AS (
  SELECT d.ed, coalesce(c.c, 0)::BIGINT AS c
  FROM days d LEFT JOIN counts c ON c.ed = d.ed
),
tri AS (
  SELECT lag(c) OVER (ORDER BY ed) AS p, c AS m,
         lead(c) OVER (ORDER BY ed) AS q
  FROM cal
),
agg AS (
  SELECT (count(*) + 2)::BIGINT AS n_days,
         sum(CASE WHEN (m > p AND m > q) OR (m < p AND m < q)
                  THEN 1 ELSE 0 END)::BIGINT AS turning_points
  FROM tri WHERE p IS NOT NULL AND q IS NOT NULL
)
SELECT n_days, turning_points,
       round(2.0 * (n_days::DOUBLE - 2) / 3, 6) AS expected,
       round((turning_points::DOUBLE - 2.0 * (n_days::DOUBLE - 2) / 3)
             / sqrt((16.0 * n_days::DOUBLE - 29) / 90), 6) AS z_stat
FROM agg
"""

ORACLES["newey_west_se"] = """
WITH ev AS (
  SELECT epoch_us(ts) // 86400000000 AS ed FROM events
),
days AS (
  SELECT unnest(range(d0, d1 + 1)) AS ed
  FROM (SELECT min(ed) AS d0, max(ed) AS d1 FROM ev)
),
counts AS (SELECT ed, count(*)::BIGINT AS c FROM ev GROUP BY 1),
cal AS (
  SELECT d.ed, coalesce(c.c, 0)::BIGINT AS c
  FROM days d LEFT JOIN counts c ON c.ed = d.ed
),
mom AS (
  SELECT count(*)::BIGINT AS n, sum(c)::BIGINT AS s1,
         sum(c * c)::BIGINT AS s2
  FROM cal
),
lags AS (SELECT unnest(range(1, 6)) AS k),
lagged AS (
  SELECT l.k,
         sum(a.c * b.c)::BIGINT AS ak,
         sum(a.c)::BIGINT AS hk,
         sum(b.c)::BIGINT AS tk
  FROM lags l
  JOIN cal a ON TRUE
  JOIN cal b ON a.ed + l.k = b.ed
  GROUP BY 1
),
terms AS (
  SELECT n, s1, s2,
         round((1.0 - k::DOUBLE / 6.0)
               * ((ak::DOUBLE
                   - (s1::DOUBLE / n::DOUBLE)
                     * (hk::DOUBLE + tk::DOUBLE)
                   + (n::DOUBLE - k::DOUBLE)
                     * (s1::DOUBLE / n::DOUBLE)
                     * (s1::DOUBLE / n::DOUBLE)) / n::DOUBLE),
               12)::DECIMAL(38,12) AS t12
  FROM lagged, mom
),
agg AS (
  SELECT n, s1, s2, sum(t12)::DOUBLE AS wsum
  FROM terms GROUP BY 1, 2, 3
),
d AS (
  SELECT n, s1,
         (s2::DOUBLE - s1::DOUBLE * (s1::DOUBLE / n::DOUBLE))
           / n::DOUBLE AS g0,
         wsum
  FROM agg
)
SELECT n AS n_days,
       round(s1::DOUBLE / n::DOUBLE, 6) AS mean_count,
       round(g0, 6) AS gamma0,
       round(g0 + 2 * wsum, 6) AS long_run_var,
       round(sqrt(g0 / n::DOUBLE), 6) AS naive_se,
       round(sqrt((g0 + 2 * wsum) / n::DOUBLE), 6) AS newey_west_se
FROM d
"""

# ---- batch 178: NRR/GRR, label-centroid stability, triangle support --------

ORACLES["net_revenue_retention"] = """
WITH o AS (
  SELECT o_custkey, strftime(o_orderdate, '%Y-%m') AS month,
         round(o_totalprice, 2)::DECIMAL(28,2) AS v
  FROM orders
),
per AS (
  SELECT o_custkey, month, sum(v) AS rev FROM o GROUP BY 1, 2
),
months AS (SELECT DISTINCT month FROM per),
nxt AS (
  SELECT m0.month AS m0, m1.month AS m1
  FROM months m0
  JOIN months m1
    ON m1.month = strftime((m0.month || '-01')::DATE
                           + INTERVAL 1 MONTH, '%Y-%m')
),
j AS (
  SELECT n.m0, n.m1, b.o_custkey AS ck, b.rev AS rev0,
         coalesce(c.rev, 0::DECIMAL(38,2)) AS rev1
  FROM nxt n
  JOIN per b ON b.month = n.m0
  LEFT JOIN per c ON c.month = n.m1 AND c.o_custkey = b.o_custkey
),
agg AS (
  SELECT m0, m1, count(*)::BIGINT AS n_base_customers,
         sum(CASE WHEN rev1 > 0 THEN 1 ELSE 0 END)::BIGINT AS n_retained,
         sum(rev0) AS base_rev,
         sum(rev1) AS ret_rev,
         sum(least(rev0, rev1)) AS capped_rev
  FROM j GROUP BY 1, 2
)
SELECT m0 AS month_base, m1 AS month_next,
       n_base_customers, n_retained,
       round(ret_rev::DOUBLE / base_rev::DOUBLE, 6) AS nrr,
       round(capped_rev::DOUBLE / base_rev::DOUBLE, 6) AS grr
FROM agg
ORDER BY month_base
"""

_LCS_H = _MD5_52.format(e="'lcs:' || vec_id::VARCHAR")

ORACLES["label_centroid_stability"] = f"""
WITH comp AS (
  SELECT label, ({_LCS_H}) % 2 AS h,
         d.dim, round(embedding[d.dim + 1]::DOUBLE, 6)::DECIMAL(18,6) AS v
  FROM embeddings,
       (SELECT unnest(range(64)) AS dim) d
),
per AS (
  SELECT label, h, dim, count(*)::BIGINT AS n, sum(v) AS s
  FROM comp GROUP BY 1, 2, 3
),
m AS (
  SELECT label, h, dim, s::DOUBLE / n AS m FROM per
),
within AS (
  SELECT h0.label,
         sqrt(sum(round((h0.m - h1.m) * (h0.m - h1.m),
                        12)::DECIMAL(38,12))::DOUBLE) AS within_dist
  FROM (SELECT label, dim, m FROM m WHERE h = 0) h0
  JOIN (SELECT label, dim, m FROM m WHERE h = 1) h1
    USING (label, dim)
  GROUP BY 1
),
full_ AS (
  SELECT label, dim, sum(s)::DOUBLE / sum(n)::DOUBLE AS fm
  FROM per GROUP BY 1, 2
),
between_ AS (
  SELECT label,
         sum(round(dist, 12)::DECIMAL(38,12))::DOUBLE
           / count(*)::DOUBLE AS between_mean
  FROM (
    SELECT a.label, b.label AS label_b,
           sqrt(sum(round((a.fm - b.fm) * (a.fm - b.fm),
                          12)::DECIMAL(38,12))::DOUBLE) AS dist
    FROM full_ a JOIN full_ b
      ON a.dim = b.dim AND a.label <> b.label
    GROUP BY 1, 2
  )
  GROUP BY 1
),
cnt AS (
  SELECT label, count(*)::BIGINT AS n_vectors FROM embeddings GROUP BY 1
)
SELECT c.label, c.n_vectors,
       round(w.within_dist, 6) AS within_half_dist,
       round(b.between_mean, 6) AS between_label_mean,
       round(w.within_dist / b.between_mean, 6) AS stability_ratio
FROM cnt c
JOIN within w ON w.label = c.label
JOIN between_ b ON b.label = c.label
ORDER BY c.label
"""

ORACLES["edge_triangle_support"] = """
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
            FROM lineitem),
e AS (
  SELECT a.pk AS pa, b.pk AS pb
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2 HAVING count(*) >= 2
),
wedges AS (
  SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
  FROM e e1 JOIN e e2 ON e2.pa = e1.pb
),
tris AS (
  SELECT w.a, w.b, w.c
  FROM wedges w JOIN e e3 ON e3.pa = w.a AND e3.pb = w.c
),
sup AS (
  SELECT x, y, count(*)::BIGINT AS support FROM (
    SELECT a AS x, b AS y FROM tris
    UNION ALL SELECT b, c FROM tris
    UNION ALL SELECT a, c FROM tris
  ) GROUP BY 1, 2
),
alle AS (
  SELECT e.pa AS x, e.pb AS y, coalesce(s.support, 0)::BIGINT AS support
  FROM e LEFT JOIN sup s ON s.x = e.pa AND s.y = e.pb
),
hist AS (
  SELECT support, count(*)::BIGINT AS n_edges FROM alle GROUP BY 1
),
truss AS (
  SELECT sum(CASE WHEN support >= 1 THEN 1 ELSE 0 END)::BIGINT
           AS truss3_edges,
         count(*)::BIGINT AS total_edges
  FROM alle
)
SELECT support, n_edges, total_edges, truss3_edges
FROM hist, truss
ORDER BY support
"""

# ---- batch 179: design effect, Gries DP, sortedness ------------------------

ORACLES["design_effect_cluster"] = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS ed, event_type
  FROM events
),
ud AS (
  SELECT user_id, ed,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
             END)::BIGINT AS y
  FROM ev GROUP BY 1, 2
),
per AS (
  SELECT user_id, count(*)::BIGINT AS m, sum(y)::BIGINT AS sy
  FROM ud GROUP BY 1
),
tot AS (
  SELECT count(*)::BIGINT AS k, sum(m)::BIGINT AS n,
         sum(sy)::BIGINT AS s,
         sum(m * m)::BIGINT AS sm2,
         sum(round(sy::DOUBLE * sy::DOUBLE / m::DOUBLE,
                   12)::DECIMAL(38,12))::DOUBLE AS ssb_term
  FROM per
),
d AS (
  SELECT k, n,
         s::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE AS sst,
         ssb_term - s::DOUBLE * s::DOUBLE / n::DOUBLE AS ssb,
         (n::DOUBLE - sm2::DOUBLE / n::DOUBLE) / (k::DOUBLE - 1) AS m0
  FROM tot
),
ms AS (
  SELECT k, n, m0,
         ssb / (k::DOUBLE - 1) AS msb,
         (sst - ssb) / (n::DOUBLE - k::DOUBLE) AS msw
  FROM d
),
r AS (
  SELECT k, n,
         (msb - msw) / (msb + (m0 - 1) * msw) AS rho,
         n::DOUBLE / k::DOUBLE AS mbar
  FROM ms
)
SELECT k AS n_clusters, n AS n_units,
       round(mbar, 6) AS mean_cluster_size,
       round(rho, 6) AS icc_rho,
       round(1.0 + (mbar - 1) * rho, 6) AS design_effect,
       round(n::DOUBLE / (1.0 + (mbar - 1) * rho), 6) AS effective_n
FROM r
"""

ORACLES["gries_dp_dispersion"] = f"""
WITH per AS (
  SELECT term, source, count(*)::BIGINT AS c FROM (
    SELECT source, unnest({TOKS}) AS term FROM documents
  ) GROUP BY 1, 2
),
cf AS (SELECT term, sum(c)::BIGINT AS cf FROM per GROUP BY 1),
psize AS (SELECT source, sum(c)::BIGINT AS ps FROM per GROUP BY 1),
tot AS (SELECT sum(ps)::BIGINT AS t FROM psize),
top AS (
  SELECT term, cf, rk FROM (
    SELECT term, cf,
           row_number() OVER (ORDER BY cf DESC, term ASC) AS rk
    FROM cf
  ) WHERE rk <= 10
),
grid AS (
  SELECT tp.term, tp.cf, tp.rk, s.source, s.ps,
         coalesce(p.c, 0)::BIGINT AS c, t.t
  FROM top tp
  CROSS JOIN psize s
  LEFT JOIN per p ON p.term = tp.term AND p.source = s.source
  CROSS JOIN tot t
),
dp AS (
  SELECT term, cf, rk,
         sum(round(abs(c::DOUBLE / cf::DOUBLE
                       - ps::DOUBLE / t::DOUBLE),
                   12)::DECIMAL(38,12))::DOUBLE / 2 AS dp
  FROM grid GROUP BY 1, 2, 3
)
SELECT rk AS rank, term, cf, round(dp, 6) AS gries_dp
FROM dp ORDER BY rank
"""

ORACLES["column_runs_sortedness"] = """
WITH o AS (
  SELECT o_orderkey,
         epoch_us(o_orderdate::TIMESTAMP) // 86400000000 AS ed
  FROM orders
),
runs AS (
  SELECT CASE WHEN lag(ed) OVER (ORDER BY o_orderkey) IS NULL
                OR ed < lag(ed) OVER (ORDER BY o_orderkey)
              THEN 1 ELSE 0 END AS brk
  FROM o
),
agg AS (
  SELECT count(*)::BIGINT AS n_rows, sum(brk)::BIGINT AS n_runs FROM runs
)
SELECT n_rows, n_runs,
       round((n_rows::DOUBLE + 1) / 2, 6) AS expected_runs_random,
       round(1.0 - (n_runs::DOUBLE - 1) / (n_rows::DOUBLE - 1), 6)
         AS sortedness
FROM agg
"""

# ---- batch 180: TOST, DerSimonian-Laird, Menzerath-Altmann -----------------

ORACLES["tost_equivalence_test"] = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS ed, event_type
  FROM events
),
ud AS (
  SELECT user_id, ed,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
             END)::BIGINT AS y
  FROM ev GROUP BY 1, 2
),
g AS (
  SELECT sum(CASE WHEN ({_BM_ARM}) % 2 = 0 THEN 1 ELSE 0 END)::BIGINT
           AS n0,
         sum(CASE WHEN ({_BM_ARM}) % 2 = 0 THEN y ELSE 0 END)::BIGINT
           AS y0,
         sum(CASE WHEN ({_BM_ARM}) % 2 = 1 THEN 1 ELSE 0 END)::BIGINT
           AS n1,
         sum(CASE WHEN ({_BM_ARM}) % 2 = 1 THEN y ELSE 0 END)::BIGINT
           AS y1
  FROM ud
),
d AS (
  SELECT n0, n1,
         y0::DOUBLE / n0::DOUBLE - y1::DOUBLE / n1::DOUBLE AS diff,
         sqrt((y0::DOUBLE / n0::DOUBLE)
              * (1.0 - y0::DOUBLE / n0::DOUBLE) / n0::DOUBLE
              + (y1::DOUBLE / n1::DOUBLE)
                * (1.0 - y1::DOUBLE / n1::DOUBLE) / n1::DOUBLE) AS se
  FROM g
)
SELECT n0, n1,
       round(diff, 6) AS rate_diff,
       round(se, 6) AS se_unpooled,
       round((diff + 0.02) / se, 6) AS z_lower,
       round((0.02 - diff) / se, 6) AS z_upper,
       CASE WHEN (diff + 0.02) / se > 1.645
              AND (0.02 - diff) / se > 1.645
            THEN 1 ELSE 0 END AS equivalent
FROM d
"""


def dersimonian_laird_sql(exposure: str, outcome: str) -> str:
    """dersimonian_laird_re twin: the meta_fixed_effect cells with the
    DL tau2 second pass."""
    return f"""
WITH t AS (
  SELECT lang,
         list_contains({TOKS}, '{exposure}') AS e,
         list_contains({TOKS}, '{outcome}') AS o
  FROM documents
),
cells AS (
  SELECT lang,
         sum(CASE WHEN e AND o THEN 1 ELSE 0 END)::BIGINT AS a,
         sum(CASE WHEN e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS b,
         sum(CASE WHEN NOT e AND o THEN 1 ELSE 0 END)::BIGINT AS c,
         sum(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS d
  FROM t GROUP BY 1
),
per AS (
  SELECT lang,
         round(ln((a::DOUBLE + 0.5) * (d::DOUBLE + 0.5)
                  / ((b::DOUBLE + 0.5) * (c::DOUBLE + 0.5))), 12) AS lnor,
         round(1.0 / (a::DOUBLE + 0.5) + 1.0 / (b::DOUBLE + 0.5)
               + 1.0 / (c::DOUBLE + 0.5) + 1.0 / (d::DOUBLE + 0.5), 12)
           AS v,
         round(1.0 / (1.0 / (a::DOUBLE + 0.5) + 1.0 / (b::DOUBLE + 0.5)
                      + 1.0 / (c::DOUBLE + 0.5)
                      + 1.0 / (d::DOUBLE + 0.5)), 12) AS w
  FROM cells
),
sums AS (
  SELECT count(*)::BIGINT AS k,
         sum(round(w * lnor, 12)::DECIMAL(38,12))::DOUBLE AS swl,
         sum(w::DECIMAL(38,12))::DOUBLE AS sw,
         sum(round(w * w, 12)::DECIMAL(38,12))::DOUBLE AS sww
  FROM per
),
qa AS (
  SELECT k, sw, sww,
         sum(round(w * (lnor - swl / sw) * (lnor - swl / sw),
                   12)::DECIMAL(38,12))::DOUBLE AS q_het
  FROM per, sums
  GROUP BY 1, 2, 3
),
scal AS (
  SELECT k, q_het,
         round(greatest((q_het - (k::DOUBLE - 1))
                        / (sw - sww / sw), 0.0), 12) AS tau2
  FROM qa
),
re AS (
  SELECT s.k, s.q_het, s.tau2,
         sum(round(round(1.0 / (p.v + s.tau2), 12) * p.lnor,
                   12)::DECIMAL(38,12))::DOUBLE AS swsl,
         sum(round(1.0 / (p.v + s.tau2), 12)::DECIMAL(38,12))::DOUBLE
           AS sws
  FROM per p, scal s
  GROUP BY 1, 2, 3
)
SELECT k,
       round(q_het, 6) AS q_het,
       round(tau2, 6) AS tau2,
       round(swsl / sws, 6) AS re_pooled_lnor,
       round(exp(swsl / sws), 6) AS re_pooled_or,
       round(exp(swsl / sws - 1.96 / sqrt(sws)), 6) AS ci_lower_or,
       round(exp(swsl / sws + 1.96 / sqrt(sws)), 6) AS ci_upper_or
FROM re
"""


ORACLES["menzerath_altmann_fit"] = f"""
WITH per AS (
  SELECT doc_id, len({TOKS}) AS n_tok,
         list_reduce(list_transform({TOKS}, t -> length(t)::BIGINT),
                     (a, b) -> a + b) AS chars
  FROM documents
  WHERE len({TOKS}) > 0
),
pts AS (
  SELECT round(ln(n_tok::DOUBLE), 12) AS u,
         round(ln(chars::DOUBLE / n_tok::DOUBLE), 12) AS w
  FROM per
),
s AS (
  SELECT count(*)::BIGINT AS n,
         sum(u::DECIMAL(38,12))::DOUBLE AS su,
         sum(w::DECIMAL(38,12))::DOUBLE AS sw,
         sum(round(u * w, 12)::DECIMAL(38,12))::DOUBLE AS suw,
         sum(round(u * u, 12)::DECIMAL(38,12))::DOUBLE AS suu,
         sum(round(w * w, 12)::DECIMAL(38,12))::DOUBLE AS sww
  FROM pts
)
SELECT n AS n_docs,
       round((n::DOUBLE * suw - su * sw)
             / (n::DOUBLE * suu - su * su), 6) AS ma_slope_b,
       round((sw - (n::DOUBLE * suw - su * sw)
                   / (n::DOUBLE * suu - su * su) * su) / n::DOUBLE, 6)
         AS ln_a,
       round((n::DOUBLE * suw - su * sw) * (n::DOUBLE * suw - su * sw)
             / ((n::DOUBLE * suu - su * su)
                * (n::DOUBLE * sww - sw * sw)), 6) AS r2
FROM s
"""

# ---- batch 181: regression discontinuity, retention decay, ABC -------------

ORACLES["regression_discontinuity"] = """
WITH o AS (
  SELECT o_orderkey, round(o_totalprice, 2)::DOUBLE AS x FROM orders
),
li AS (
  SELECT l_orderkey AS o_orderkey, count(*)::BIGINT AS y
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT CASE WHEN x >= 250000.0 THEN 1 ELSE 0 END AS side,
         round((x - 250000.0) / 100000.0, 12) AS u,
         y::DOUBLE AS y
  FROM o JOIN li USING (o_orderkey)
  WHERE x >= 150000.0 AND x < 350000.0
),
mom AS (
  SELECT side, count(*)::BIGINT AS n,
         sum(u::DECIMAL(38,12))::DOUBLE AS su,
         sum(round(u * u, 12)::DECIMAL(38,12))::DOUBLE AS suu,
         sum(y::DECIMAL(38,2))::DOUBLE AS sy,
         sum(round(u * y, 12)::DECIMAL(38,12))::DOUBLE AS suy
  FROM j GROUP BY 1
),
per AS (
  SELECT side, n,
         round((n::DOUBLE * suy - su * sy)
               / (n::DOUBLE * suu - su * su), 6) AS slope,
         round((sy - (n::DOUBLE * suy - su * sy)
                     / (n::DOUBLE * suu - su * su) * su) / n::DOUBLE, 6)
           AS icpt
  FROM mom
)
SELECT l.n AS n_left, r.n AS n_right,
       l.slope AS slope_left, r.slope AS slope_right,
       l.icpt AS intercept_left, r.icpt AS intercept_right,
       round(r.icpt - l.icpt, 6) AS rd_effect
FROM (SELECT * FROM per WHERE side = 0) l,
     (SELECT * FROM per WHERE side = 1) r
"""

ORACLES["retention_decay_fit"] = """
WITH ev AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // 86400000000 // 7 AS wk
  FROM events
),
first_ AS (SELECT user_id, min(wk) AS w0 FROM ev GROUP BY 1),
act AS (
  SELECT e.user_id, e.wk - f.w0 AS off
  FROM ev e JOIN first_ f USING (user_id)
),
base AS (SELECT count(*)::BIGINT AS n_users FROM first_),
per AS (
  SELECT off, count(DISTINCT user_id)::BIGINT AS active
  FROM act WHERE off >= 1 GROUP BY 1
),
pts AS (
  SELECT off::DOUBLE AS u,
         round(ln(active::DOUBLE / n_users::DOUBLE), 12) AS w
  FROM per, base
),
s AS (
  SELECT count(*)::BIGINT AS k,
         sum(u::DECIMAL(38,6))::DOUBLE AS su,
         sum(w::DECIMAL(38,12))::DOUBLE AS sw,
         sum(round(u * w, 12)::DECIMAL(38,12))::DOUBLE AS suw,
         sum(round(u * u, 6)::DECIMAL(38,6))::DOUBLE AS suu
  FROM pts
),
d AS (
  SELECT k,
         CASE WHEN k::DOUBLE * suu - su * su <> 0
              THEN (k::DOUBLE * suw - su * sw)
                   / (k::DOUBLE * suu - su * su) END AS slope,
         su, sw
  FROM s
)
SELECT k AS n_week_offsets,
       round(slope, 6) AS decay_slope,
       round(exp((sw - slope * su) / k::DOUBLE), 6) AS week1_level,
       round(CASE WHEN slope < 0
                  THEN -0.6931471805599453 / slope END, 6)
         AS half_life_weeks
FROM d
"""

ORACLES["abc_classification"] = """
WITH per AS (
  SELECT l_partkey,
         sum(round(l_extendedprice, 2)::DECIMAL(28,2)) AS rev
  FROM lineitem GROUP BY 1
),
tot AS (SELECT count(*)::BIGINT AS np, sum(rev) AS t FROM per),
ranked AS (
  SELECT rev, np, t,
         sum(rev) OVER (ORDER BY rev DESC, l_partkey ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cum
  FROM per, tot
),
classed AS (
  SELECT rev, np, t,
         CASE WHEN cum::DOUBLE / t::DOUBLE <= 0.80 THEN 'A'
              WHEN cum::DOUBLE / t::DOUBLE <= 0.95 THEN 'B'
              ELSE 'C' END AS abc
  FROM ranked
)
SELECT abc, count(*)::BIGINT AS n_parts,
       round(count(*)::DOUBLE / any_value(np)::DOUBLE, 6) AS part_share,
       round(sum(rev)::DOUBLE / any_value(t)::DOUBLE, 6) AS revenue_share
FROM classed
GROUP BY 1
ORDER BY abc
"""

# ---- batch 182: h-index, mode skewness, price endings ----------------------

ORACLES["activity_h_index"] = """
WITH per AS (
  SELECT user_id, count(*)::BIGINT AS c FROM events GROUP BY 1
),
ranked AS (
  SELECT c,
         row_number() OVER (ORDER BY c DESC, user_id ASC) AS rk,
         sum(c) OVER (ORDER BY c DESC, user_id ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cum
  FROM per
)
SELECT count(*)::BIGINT AS n_users,
       sum(c)::BIGINT AS n_events,
       max(CASE WHEN c >= rk THEN rk END)::BIGINT AS h_index,
       max(CASE WHEN cum >= rk * rk THEN rk END)::BIGINT AS g_index,
       round(max(CASE WHEN c >= rk THEN rk END)::DOUBLE
             / count(*)::DOUBLE, 6) AS h_over_users
FROM ranked
"""

ORACLES["mode_skewness_panel"] = """
WITH ev AS (
  SELECT round(value * 100, 0)::BIGINT AS cents FROM events
),
tab AS (SELECT cents, count(*)::BIGINT AS c FROM ev GROUP BY 1),
mode_ AS (
  SELECT cents AS mode_cents FROM (
    SELECT cents, row_number() OVER (ORDER BY c DESC, cents ASC) AS r
    FROM tab
  ) WHERE r = 1
),
mom AS (
  SELECT count(*)::BIGINT AS n, sum(cents)::BIGINT AS s1,
         sum(cents * cents)::BIGINT AS s2,
         quantile_cont(cents, 0.5) AS med
  FROM ev
),
d AS (
  SELECT n, med, mode_cents,
         s1::DOUBLE / n::DOUBLE AS mean,
         sqrt((s2::DOUBLE - s1::DOUBLE * (s1::DOUBLE / n::DOUBLE))
              / (n::DOUBLE - 1)) AS sd
  FROM mom, mode_
)
SELECT n,
       round(mean / 100, 6) AS mean_value,
       round(med / 100, 6) AS median_value,
       round(mode_cents::DOUBLE / 100, 2) AS mode_value,
       round((mean - mode_cents::DOUBLE) / sd, 6) AS mode_skewness,
       round(3 * (mean - med) / sd, 6) AS median_skewness
FROM d
"""

ORACLES["price_ending_audit"] = """
WITH o AS (
  SELECT (round(o_totalprice * 100, 0)::BIGINT % 100)::BIGINT AS ending
  FROM orders
),
cells AS (SELECT ending, count(*)::BIGINT AS c FROM o GROUP BY 1),
tot AS (
  SELECT sum(c)::BIGINT AS n, count(*)::BIGINT AS n_endings FROM cells
),
chi AS (
  SELECT sum(round((c::DOUBLE - n::DOUBLE / 100)
                   * (c::DOUBLE - n::DOUBLE / 100)
                   / (n::DOUBLE / 100), 12)::DECIMAL(38,12))::DOUBLE
           AS chi_obs
  FROM cells, tot
)
SELECT rank, ending, c AS n_orders,
       round(c::DOUBLE / n::DOUBLE, 6) AS share,
       round(chi_obs + (100 - n_endings)::DOUBLE * n::DOUBLE / 100, 6)
         AS uniformity_chi2
FROM (
  SELECT ending, c,
         row_number() OVER (ORDER BY c DESC, ending ASC) AS rank
  FROM cells
) r, tot, chi
WHERE rank <= 5
ORDER BY rank
"""

# ---- batch 183: Weibull plot, extremal index, price dispersion -------------

ORACLES["weibull_plot_fit"] = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_id FROM events
),
gaps AS (
  SELECT g FROM (
    SELECT us - lag(us) OVER (PARTITION BY user_id
                              ORDER BY us, event_id) AS g
    FROM ev
  ) WHERE g IS NOT NULL AND g > 0
),
n AS (SELECT count(*)::BIGINT AS n FROM gaps),
ranked AS (
  SELECT g, n.n, row_number() OVER (ORDER BY g ASC) AS i
  FROM gaps, n
),
pts AS (
  SELECT n,
         round(ln(g::DOUBLE), 12) AS u,
         round(ln(-ln(1.0 - (i::DOUBLE - 0.3) / (n::DOUBLE + 0.4))),
               12) AS y
  FROM ranked
),
s AS (
  SELECT n,
         sum(u::DECIMAL(38,12))::DOUBLE AS su,
         sum(y::DECIMAL(38,12))::DOUBLE AS sy,
         sum(round(u * y, 12)::DECIMAL(38,12))::DOUBLE AS suy,
         sum(round(u * u, 12)::DECIMAL(38,12))::DOUBLE AS suu
  FROM pts GROUP BY 1
),
d AS (
  SELECT n,
         (n::DOUBLE * suy - su * sy) / (n::DOUBLE * suu - su * su) AS k,
         su, sy
  FROM s
)
SELECT n AS n_gaps,
       round(k, 6) AS weibull_shape_k,
       round(exp(-((sy - k * su) / n::DOUBLE) / k), 6)
         AS weibull_scale_us,
       CASE WHEN k < 1 THEN 1 ELSE 0 END AS bursty
FROM d
"""

from lucene_mapreduce_spark.operators.relational import (  # noqa: E402
    EXTREMAL_RUN_GAP as _EXT_GAP,
    PRICE_DISP_MIN_LINES as _PD_MIN,
)

ORACLES["extremal_index_runs"] = f"""
WITH ev AS (
  SELECT epoch_us(ts) // 86400000000 AS ed FROM events
),
days AS (
  SELECT unnest(range(d0, d1 + 1)) AS ed
  FROM (SELECT min(ed) AS d0, max(ed) AS d1 FROM ev)
),
counts AS (SELECT ed, count(*)::BIGINT AS c FROM ev GROUP BY 1),
cal AS (
  SELECT d.ed, coalesce(c.c, 0)::BIGINT AS c
  FROM days d LEFT JOIN counts c ON c.ed = d.ed
),
thr AS (SELECT quantile_cont(c, 0.9) AS u FROM cal),
exc AS (
  SELECT ed, round(u, 6) AS u FROM cal, thr WHERE c::DOUBLE > u
),
marks AS (
  SELECT ed, u,
         CASE WHEN lag(ed) OVER (ORDER BY ed) IS NULL
                OR ed - lag(ed) OVER (ORDER BY ed) > {_EXT_GAP}
              THEN 1 ELSE 0 END AS new_cluster
  FROM exc
)
SELECT any_value(u) AS threshold,
       count(*)::BIGINT AS n_exceedances,
       sum(new_cluster)::BIGINT AS n_clusters,
       round(sum(new_cluster)::DOUBLE / count(*)::DOUBLE, 6)
         AS extremal_index
FROM marks
"""

ORACLES["unit_price_dispersion_topk"] = f"""
WITH li AS (
  SELECT l_partkey,
         round(l_extendedprice / l_quantity, 6) AS up
  FROM lineitem
),
per AS (
  SELECT l_partkey, count(*)::BIGINT AS n_lines,
         sum(round(up, 12)::DECIMAL(38,12)) AS s1,
         sum(round(up * up, 12)::DECIMAL(38,12)) AS s2
  FROM li GROUP BY 1
  HAVING count(*) >= {_PD_MIN}
),
scored AS (
  SELECT l_partkey, n_lines,
         round(s1::DOUBLE / n_lines::DOUBLE, 6) AS mean_unit_price,
         round(sqrt((s2::DOUBLE
                     - s1::DOUBLE * (s1::DOUBLE / n_lines::DOUBLE))
                    / (n_lines::DOUBLE - 1))
               / (s1::DOUBLE / n_lines::DOUBLE), 6) AS cv
  FROM per
)
SELECT rank, l_partkey, n_lines, mean_unit_price, cv
FROM (
  SELECT *, row_number() OVER (ORDER BY cv DESC, l_partkey ASC) AS rank
  FROM scored
) WHERE rank <= 10
ORDER BY rank
"""

# ---- batch 184: fairness panel, exponential PPCC ---------------------------

ORACLES["fairness_metrics_panel"] = f"""
WITH ev AS (
  SELECT ({_BM_ARM}) % 2 AS g,
         CASE WHEN round(value * 100, 0)::BIGINT > 5000
              THEN 1 ELSE 0 END::BIGINT AS pred,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END::BIGINT AS y
  FROM events
),
per AS (
  SELECT g, count(*)::BIGINT AS n, sum(pred)::BIGINT AS sel,
         sum(pred * y)::BIGINT AS tp, sum(y)::BIGINT AS pos,
         sum(pred * (1 - y))::BIGINT AS fp, sum(1 - y)::BIGINT AS neg
  FROM ev GROUP BY 1
),
j AS (
  SELECT g0.n AS n0, g0.sel AS sel0, g0.tp AS tp0, g0.pos AS pos0,
         g0.fp AS fp0, g0.neg AS neg0,
         g1.n AS n1, g1.sel AS sel1, g1.tp AS tp1, g1.pos AS pos1,
         g1.fp AS fp1, g1.neg AS neg1
  FROM (SELECT * FROM per WHERE g = 0) g0,
       (SELECT * FROM per WHERE g = 1) g1
),
d AS (
  SELECT n0, n1,
         sel0::DOUBLE / n0::DOUBLE AS sr0,
         sel1::DOUBLE / n1::DOUBLE AS sr1,
         tp0::DOUBLE / pos0::DOUBLE AS tpr0,
         tp1::DOUBLE / pos1::DOUBLE AS tpr1,
         fp0::DOUBLE / neg0::DOUBLE AS fpr0,
         fp1::DOUBLE / neg1::DOUBLE AS fpr1
  FROM j
)
SELECT (n0 + n1)::BIGINT AS n_events,
       round(sr0, 6) AS selection_rate_g0,
       round(sr1, 6) AS selection_rate_g1,
       round(sr0 - sr1, 6) AS demographic_parity_diff,
       round(tpr0 - tpr1, 6) AS equal_opportunity_diff,
       round(fpr0 - fpr1, 6) AS equalized_odds_fpr_diff,
       round(least(sr0, sr1) / greatest(sr0, sr1), 6)
         AS adverse_impact_ratio,
       CASE WHEN least(sr0, sr1) / greatest(sr0, sr1) >= 0.8
            THEN 1 ELSE 0 END AS passes_four_fifths
FROM d
"""

ORACLES["ppcc_exponential_test"] = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_id FROM events
),
gaps AS (
  SELECT g FROM (
    SELECT us - lag(us) OVER (PARTITION BY user_id
                              ORDER BY us, event_id) AS g
    FROM ev
  ) WHERE g IS NOT NULL AND g > 0
),
n AS (SELECT count(*)::BIGINT AS n FROM gaps),
ranked AS (
  SELECT n.n, g::DOUBLE AS x,
         round(-ln(1.0 - ((row_number() OVER (ORDER BY g ASC))::DOUBLE
                          - 0.3) / (n.n::DOUBLE + 0.4)), 12) AS q
  FROM gaps, n
),
s AS (
  SELECT n,
         sum(x::DECIMAL(38,2))::DOUBLE AS sx,
         sum(q::DECIMAL(38,12))::DOUBLE AS sq,
         sum(round(x * q, 6)::DECIMAL(38,6))::DOUBLE AS sxq,
         sum((x * x)::DECIMAL(38,2))::DOUBLE AS sxx,
         sum(round(q * q, 12)::DECIMAL(38,12))::DOUBLE AS sqq
  FROM ranked GROUP BY 1
)
SELECT n AS n_gaps,
       round((n::DOUBLE * sxq - sx * sq)
             / (sqrt(n::DOUBLE * sxx - sx * sx)
                * sqrt(n::DOUBLE * sqq - sq * sq)), 6) AS ppcc,
       CASE WHEN (n::DOUBLE * sxq - sx * sq)
                 / (sqrt(n::DOUBLE * sxx - sx * sx)
                    * sqrt(n::DOUBLE * sqq - sq * sq)) > 0.95
            THEN 1 ELSE 0 END AS looks_exponential
FROM s
"""

# ---- batch 185: Benford arc, inter-order gaps, single-source risk ----------

ORACLES["benford_mantissa_arc_test"] = """
WITH o AS (
  SELECT o_totalprice::DOUBLE AS v FROM orders WHERE o_totalprice > 0
),
lg AS (
  SELECT round(ln(v) * 0.43429448190325176, 12) AS l FROM o
),
comp AS (
  SELECT round(cos(6.283185307179586 * (l - floor(l))),
               12)::DECIMAL(38,12) AS cx,
         round(sin(6.283185307179586 * (l - floor(l))),
               12)::DECIMAL(38,12) AS cy
  FROM lg
),
agg AS (
  SELECT count(*)::BIGINT AS n,
         sum(cx)::DOUBLE AS sx, sum(cy)::DOUBLE AS sy
  FROM comp
)
SELECT n,
       round(sx / n::DOUBLE, 6) AS mean_cos,
       round(sy / n::DOUBLE, 6) AS mean_sin,
       round(sqrt((sx / n::DOUBLE) * (sx / n::DOUBLE)
                  + (sy / n::DOUBLE) * (sy / n::DOUBLE)), 6)
         AS vector_length,
       round(exp(-(n::DOUBLE) * ((sx / n::DOUBLE) * (sx / n::DOUBLE)
                                 + (sy / n::DOUBLE) * (sy / n::DOUBLE))),
             6) AS arc_test_p
FROM agg
"""

ORACLES["interorder_gap_cv"] = """
WITH o AS (
  SELECT o_custkey,
         epoch_us(o_orderdate::TIMESTAMP) // 86400000000 AS ed,
         o_orderkey
  FROM orders
),
gaps AS (
  SELECT g FROM (
    SELECT ed - lag(ed) OVER (PARTITION BY o_custkey
                              ORDER BY ed, o_orderkey) AS g
    FROM o
  ) WHERE g IS NOT NULL
),
mom AS (
  SELECT count(*)::BIGINT AS n_gaps, sum(g)::BIGINT AS s1,
         sum(g * g)::BIGINT AS s2
  FROM gaps
),
d AS (
  SELECT n_gaps,
         s1::DOUBLE / n_gaps::DOUBLE AS mean,
         sqrt((s2::DOUBLE - s1::DOUBLE * (s1::DOUBLE / n_gaps::DOUBLE))
              / (n_gaps::DOUBLE - 1)) AS sd
  FROM mom
)
SELECT n_gaps,
       round(mean, 6) AS mean_gap_days,
       round(sd, 6) AS sd_gap_days,
       round(sd / mean, 6) AS cv,
       round((sd / mean - 1) / (sd / mean + 1), 6) AS burstiness_b
FROM d
"""

ORACLES["single_source_risk"] = """
WITH per AS (
  SELECT l_partkey, l_suppkey,
         sum(round(l_quantity, 2)::DECIMAL(28,2)) AS qs
  FROM lineitem GROUP BY 1, 2
),
tot AS (
  SELECT l_partkey,
         count(*)::BIGINT AS n_suppliers,
         sum(qs) AS qt,
         max(qs) AS qmax
  FROM per GROUP BY 1
),
rows_ AS (
  SELECT n_suppliers,
         round(qmax::DOUBLE / qt::DOUBLE, 12) AS top_share
  FROM tot
)
SELECT n_suppliers, count(*)::BIGINT AS n_parts,
       round(sum(round(top_share, 12)::DECIMAL(38,12))::DOUBLE
             / count(*)::DOUBLE, 6) AS mean_top_share
FROM rows_
GROUP BY 1
ORDER BY n_suppliers
"""
