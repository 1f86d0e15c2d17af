"""Result-set operators over a search: collapse/grouping, total-hit counts,
and sort-by-field — the Lucene collector surface (CollapsingTopDocsCollector,
TotalHitCountCollector, Sort(SortField)) on a controlled corpus."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture()
def corpus_dir(tmp_path):
    """Six docs, two langs, known n_chars; 'alpha' hits 0,1,2,4; 'beta'
    hits 0,2,5."""
    rows = [
        (0, "alpha beta gamma", "en", 100),
        (1, "alpha alpha delta", "en", 50),
        (2, "alpha beta beta", "de", 70),
        (3, "gamma delta epsilon", "de", 90),
        (4, "alpha solo", "de", 60),
        (5, "beta solo", "en", 80),
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "n_chars"]
    ).to_parquet(str(tmp_path) + "/documents.parquet")
    return str(tmp_path)


def test_collapse_one_winner_per_lang(spark, corpus_dir):
    from lucene_mapreduce_spark.operators.fulltext import search_collapse

    out = search_collapse(spark, corpus_dir, query_text="alpha", k=5).collect()
    # one row per lang, each the best-scoring hit of that lang
    assert len(out) == 2
    assert {r["lang"] for r in out} == {"en", "de"}
    assert [r["grp_rank"] for r in out] == [1, 2]
    # scores descend across group ranks
    assert out[0]["score"] >= out[1]["score"]
    # the winner of each group beats every other same-lang hit: doc 1 has
    # tf=2 for alpha and the shortest dl -> must be the 'en' winner
    en = next(r for r in out if r["lang"] == "en")
    assert en["doc_id"] == 1


def test_total_hits_and_or(spark, corpus_dir):
    from lucene_mapreduce_spark.operators.fulltext import search_total_hits

    r = search_total_hits(spark, corpus_dir, query_text="alpha beta").collect()[0]
    assert (r["n_and"], r["n_or"]) == (2, 5)  # AND: {0,2}; OR: {0,1,2,4,5}
    # a term absent from the corpus empties the conjunction, not the union
    r2 = search_total_hits(spark, corpus_dir, query_text="alpha zzz").collect()[0]
    assert (r2["n_and"], r2["n_or"]) == (0, 4)


def test_search_after_pagination(spark, tmp_path):
    """page1 + searchAfter(page1 cursor) must equal one search(k=2n) —
    including across score ties (doc_id tie-break at the page boundary)."""
    import pandas as pd

    from lucene_mapreduce_spark.index.build import build_segment
    from lucene_mapreduce_spark.query.wand import IndexSearcher

    texts = {}
    for d in range(30):
        # many ties: docs in groups of 3 share identical text
        texts[d] = f"alpha beta group{d // 3}" if d % 2 == 0 else f"alpha group{d // 3}"
    sf = str(tmp_path)
    pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())}).to_parquet(
        sf + "/documents.parquet"
    )
    ix = sf + "/ix"
    build_segment(
        spark,
        spark.createDataFrame(
            pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
        ),
        ix,
        num_partitions=4,
    )
    s = IndexSearcher(ix)
    full = s.search("alpha beta", k=20)
    for n in (3, 5, 7, 10):
        page1 = s.search("alpha beta", k=n)
        cursor = (page1[-1][1], page1[-1][0])
        page2 = s.search_after("alpha beta", cursor, k=n)
        assert page1 + page2 == full[: len(page1 + page2)], f"page_size={n}"
    # cursor at the very last hit of the whole result set -> empty page
    everything = s.search("alpha beta", k=100)
    last = everything[-1]
    assert s.search_after("alpha beta", (last[1], last[0]), k=5) == []


def test_sort_by_field_order_and_limit(spark, corpus_dir):
    from lucene_mapreduce_spark.operators.fulltext import search_sort_by_field

    out = search_sort_by_field(spark, corpus_dir, query_text="alpha", k=3).collect()
    # alpha hits {0,1,2,4}; by n_chars desc: 0(100), 2(70), 4(60) — k=3 cuts 1(50)
    assert [(r["doc_id"], r["n_chars"], r["rank"]) for r in out] == [
        (0, 100, 1),
        (2, 70, 2),
        (4, 60, 3),
    ]
