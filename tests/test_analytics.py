"""Corpus-analytics operators: bigram collocations (PMI) and
significant-terms lift on controlled corpora."""

from __future__ import annotations

import math

import pandas as pd


def _write_docs(tmp_path, texts, lang="en", source="src0"):
    sf = str(tmp_path)
    pd.DataFrame(
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": [lang] * len(texts),
            "source": [source] * len(texts),
        }
    ).to_parquet(sf + "/documents.parquet")
    return sf


def test_ngram_counts_and_pmi(spark, tmp_path):
    from lucene_mapreduce_spark.operators.textstats import ngram_counts

    sf = _write_docs(
        tmp_path,
        [
            "new york new york",   # "new york" x2, "york new" x1
            "new york city",       # "new york", "york city"
            "brand new day",
        ],
    )
    rows = {r["ngram"]: r for r in ngram_counts(spark, sf, k=50).collect()}
    assert rows["new york"]["n_occ"] == 3
    assert rows["york new"]["n_occ"] == 1
    # top rank is the most frequent bigram, ties by ngram asc
    top = min(rows.values(), key=lambda r: r["rank"])
    assert top["ngram"] == "new york"
    # PMI spot check: c_xy=3, T=7 bigrams (3+2+2), c_new=4, c_york=3,
    # U=10 tokens
    want = round(math.log((3 / 7) / ((4 / 10) * (3 / 10))), 6)
    assert abs(rows["new york"]["pmi"] - want) < 1e-9
    # single-token and empty docs contribute no bigrams (no crash)
    (tmp_path / "b").mkdir(exist_ok=True)
    sf2 = _write_docs(tmp_path / "b", ["solo", ""])
    assert ngram_counts(spark, sf2, k=10).count() == 0


def test_contamination_check_planted(spark, tmp_path):
    """A training doc containing an eval doc's exact 3-gram run is flagged;
    clean docs are not; a stop-shingle shared by everyone is capped out."""
    from lucene_mapreduce_spark.operators.dedup import contamination_check

    texts = {}
    # eval docs: ids % 7 == 0 (use eval_mod=7 for a small fixture)
    texts[0] = "secret benchmark answer alpha beta"
    texts[7] = "another held out probe gamma delta"
    # contaminated trainer: contains eval 0's 3-gram "secret benchmark answer"
    texts[1] = "prefix words secret benchmark answer suffix"
    # clean trainers
    texts[2] = "totally unrelated text about cooking pasta"
    texts[3] = "gamma delta alone is only a bigram overlap"
    sf = str(tmp_path)
    pd.DataFrame(
        {
            "doc_id": sorted(texts),
            "text": [texts[k] for k in sorted(texts)],
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
        }
    ).to_parquet(sf + "/documents.parquet")
    out = {
        r["train_doc_id"]: r
        for r in contamination_check(spark, sf, eval_mod=7).collect()
    }
    assert 1 in out and out[1]["n_eval_docs"] == 1 and out[1]["n_shared"] == 1
    assert 2 not in out and 3 not in out


def test_gopher_rules_semantics(spark, tmp_path):
    from lucene_mapreduce_spark.operators.textstats import gopher_rules

    texts = [
        "a normal document with seven distinct tokens",     # keep
        "spam spam spam spam spam spam spam spam",          # top_token_frac 1.0
        "too short",                                        # n_tokens < 5
        "one two one two one two one two one two",          # dup 3-grams
    ]
    sf = _write_docs(tmp_path, texts)
    rows = {r["doc_id"]: r for r in gopher_rules(spark, sf).collect()}
    assert rows[0]["keep"] is True
    assert rows[1]["keep"] is False and rows[1]["top_token_frac"] == 1.0
    assert rows[2]["keep"] is False and rows[2]["n_tokens"] == 2
    assert rows[3]["keep"] is False and rows[3]["frac_dup_3gram"] > 0.3
    # dup fraction spot check: 10 tokens -> 8 3-grams, 2 distinct -> 0.75
    assert rows[3]["frac_dup_3gram"] == 0.75


def test_significant_terms_lift(spark, tmp_path):
    from lucene_mapreduce_spark.operators.fulltext import significant_terms

    # 'marker' appears in ALL docs matching 'hit' but few others ->
    # top lift; 'common' is everywhere -> lift ~1 ranks below
    texts = []
    for d in range(12):
        if d < 4:
            texts.append("hit marker common alpha")
        else:
            texts.append("common beta other words")
    sf = _write_docs(tmp_path, texts)
    out = significant_terms(spark, sf, query_text="hit", k=10, min_df=2).collect()
    terms = {r["term"]: r for r in out}
    assert "hit" not in terms  # query terms excluded
    assert terms["marker"]["df_fg"] == 4 and terms["marker"]["df_bg"] == 4
    # marker lift = (4/4)/(4/12) = 3.0; common lift = (4/4)/(12/12) = 1.0
    assert terms["marker"]["lift"] == 3.0
    assert terms["common"]["lift"] == 1.0
    assert out[0]["term"] in ("alpha", "marker")  # both lift 3.0, tie by term
    assert out[0]["term"] == "alpha"


def test_duplicate_ngram_fraction(spark, tmp_path):
    from lucene_mapreduce_spark.operators.dedup import duplicate_ngram_fraction

    texts = [
        "a b c d e f",      # grams: "a b c d e", "b c d e f"
        "a b c d e zzz",    # shares "a b c d e" with doc 0
        "p q r s t u",      # all grams unique
        "x y",              # too short: no 5-grams, excluded
    ]
    sf = _write_docs(tmp_path, texts)
    rows = {r["doc_id"]: r for r in duplicate_ngram_fraction(spark, sf).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0]["n_grams"] == 2 and rows[0]["n_dup_grams"] == 1
    assert rows[0]["dup_fraction"] == 0.5
    assert rows[1]["dup_fraction"] == 0.5
    assert rows[2]["n_dup_grams"] == 0 and rows[2]["dup_fraction"] == 0.0


def test_dsir_importance_weights_direction(spark, tmp_path):
    """Docs written in the target-domain vocabulary get higher importance
    weights than off-domain docs; weights of an on-domain doc are positive
    (its hashed bigrams are overrepresented in the target slice)."""
    from lucene_mapreduce_spark.operators.textstats import dsir_importance_weights

    sf = str(tmp_path)
    texts, langs = [], []
    for i in range(20):
        texts.append("quality clean prose flows nicely here")
        langs.append("en")
    for i in range(20):
        texts.append("spam junk noise garbage filler words")
        langs.append("de")
    pd.DataFrame(
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": langs,
            "source": ["src0"] * len(texts),
        }
    ).to_parquet(sf + "/documents.parquet")
    rows = {r["doc_id"]: r for r in dsir_importance_weights(spark, sf).collect()}
    assert len(rows) == 40
    assert all(r["n_grams"] == 5 for r in rows.values())  # 6 tokens -> 5 bigrams
    w_target = rows[0]["weight"]
    w_other = rows[25]["weight"]
    assert w_target > 0 > w_other


def test_unigram_logprob_closed_form(spark, tmp_path):
    from lucene_mapreduce_spark.operators.textstats import unigram_logprob

    # corpus: a:2 b:2 c:1, total 5, vocab 3 -> Laplace lp = ln((cf+1)/8)
    sf = _write_docs(tmp_path, ["a a b", "b c"])
    rows = {r["doc_id"]: r for r in unigram_logprob(spark, sf).collect()}
    assert rows[0]["n_tokens"] == 3 and rows[1]["n_tokens"] == 2
    lp_ab = math.log(3 / 8)  # a and b both have cf=2
    lp_c = math.log(2 / 8)
    assert rows[0]["cross_entropy"] == round(-lp_ab, 6)
    assert rows[1]["cross_entropy"] == round(-(lp_ab + lp_c) / 2, 6)
    # the doc built from the rarer token is more surprising
    assert rows[1]["cross_entropy"] > rows[0]["cross_entropy"]
