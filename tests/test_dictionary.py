"""Term-dictionary sidecar: exact (term, df, cf) vs corpus truth, live
counts through merge upserts, and identical expansion results."""

from __future__ import annotations

import os
from collections import Counter

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.index.build import build_segment
from lucene_mapreduce_spark.index.manifest import load_manifest, segment_dir
from lucene_mapreduce_spark.index.merge import merge_all


def _truth(texts: dict[int, str]):
    df: Counter = Counter()
    cf: Counter = Counter()
    for t in texts.values():
        toks = tokenize_string(t)
        cf.update(toks)
        df.update(set(toks))
    return df, cf


def _read_dict(spark, ix):
    m = load_manifest(ix)
    assert m is not None and len(m.segments) == 1 and m.segments[0].has_dict
    seg = segment_dir(ix, m.segments[0].segment_id)
    rows = spark.read.parquet(os.path.join(seg, "dictionary")).collect()
    return {r["term"]: (r["df"], r["cf"]) for r in rows}


def test_dictionary_matches_corpus_truth(spark, tmp_path):
    texts = {
        0: "apple banana apple cherry",
        1: "banana cherry date",
        2: "apple apple apple",
        3: "",
    }
    corpus = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    ix = str(tmp_path / "ix")
    build_segment(spark, corpus, ix, num_partitions=4, with_dict=True)
    got = _read_dict(spark, ix)
    df, cf = _truth(texts)
    assert got == {t: (df[t], cf[t]) for t in df}


def test_dictionary_live_counts_after_upsert_merge(spark, tmp_path):
    """An upsert that rewrites a doc must be reflected: the merged
    segment's dictionary counts ONLY the live copies."""
    ix = str(tmp_path / "ix")
    g1 = {0: "apple banana", 1: "apple cherry"}
    g2 = {1: "durian durian"}  # doc 1 rewritten: loses apple/cherry
    build_segment(
        spark,
        spark.createDataFrame(list(g1.items()), "doc_id long, text string"),
        ix,
        num_partitions=4,
        with_dict=True,
    )
    build_segment(
        spark,
        spark.createDataFrame(list(g2.items()), "doc_id long, text string"),
        ix,
        with_dict=True,
    )
    merge_all(spark, ix)
    got = _read_dict(spark, ix)
    df, cf = _truth({0: g1[0], 1: g2[1]})
    assert got == {t: (df[t], cf[t]) for t in df}
    assert "cherry" not in got


def test_expansion_identical_with_and_without_dict(spark, tmp_path):
    from lucene_mapreduce_spark.operators import fulltext

    texts = {0: "merge conflict", 1: "marge episode", 2: "stream sort scan"}
    pdf = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    sf_plain, sf_dict = str(tmp_path / "a"), str(tmp_path / "b")
    for d in (sf_plain, sf_dict):
        os.makedirs(d)
        pdf.to_parquet(d + "/documents.parquet")
    # gate helper builds without dict for sf_plain; hand-build one with dict
    ixd = sf_dict + "/ix"
    build_segment(
        spark,
        spark.createDataFrame(pdf),
        ixd,
        num_partitions=4,
        store_fields=True,
        with_dict=True,
    )
    merge_all(spark, ixd)
    fulltext._GATE_INDEXES[sf_dict] = ixd  # route the gate path to it

    fz_plain = fulltext.fuzzy_query(spark, sf_plain, query_text="merge").collect()
    # suggest module rides the same dictionary: did-you-mean + completion
    sg = fulltext.spell_suggest(spark, sf_dict, word="merg", max_dist=1).collect()
    assert sg and sg[0]["term"] == "merge" and sg[0]["dist"] == 1
    ac = fulltext.autocomplete(spark, sf_dict, prefix="me").collect()
    assert [r["term"] for r in ac][:1] == ["merge"]
    # cf-desc ranking with term-asc ties, rank contiguous from 1
    assert [r["rank"] for r in ac] == list(range(1, len(ac) + 1))
    fz_dict = fulltext.fuzzy_query(spark, sf_dict, query_text="merge").collect()
    assert [tuple(r) for r in fz_plain] == [tuple(r) for r in fz_dict]
    pf_plain = fulltext.prefix_query(spark, sf_plain, prefix="s").collect()
    pf_dict = fulltext.prefix_query(spark, sf_dict, prefix="s").collect()
    assert [tuple(r) for r in pf_plain] == [tuple(r) for r in pf_dict]


def test_expansion_cap_bounds_pathological_patterns(spark, tmp_path):
    """Lucene maxClauseCount parity: `*` / `.*` / short-prefix expansions
    are bounded at max_expansions, keeping the HIGHEST-df terms (TOP_TERMS
    rewrite) — the driver never collects the vocabulary."""
    from lucene_mapreduce_spark.operators import fulltext

    # df ranking: alpha in 4 docs, beta 3, gamma 2, delta 1
    texts = {
        0: "alpha beta gamma",
        1: "alpha beta gamma",
        2: "alpha beta delta",
        3: "alpha extra",
    }
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}
    ).to_parquet(sf + "/documents.parquet")

    capped = fulltext.wildcard_query(
        spark, sf, pattern="*", max_expansions=2
    ).collect()
    ix = fulltext._GATE_INDEXES[sf]
    want = fulltext._score_expanded(spark, ix, ["alpha", "beta"], 10).collect()
    assert [tuple(r) for r in capped] == [tuple(r) for r in want]

    assert [
        tuple(r)
        for r in fulltext.regexp_query(
            spark, sf, pattern=".*", max_expansions=2
        ).collect()
    ] == [tuple(r) for r in want]

    # prefix: of {alpha (df 4), extra (df 1)} nothing shared — use '' prefix
    pref = fulltext.prefix_query(spark, sf, prefix="", max_expansions=1).collect()
    only_alpha = fulltext._score_expanded(spark, ix, ["alpha"], 10).collect()
    assert [tuple(r) for r in pref] == [tuple(r) for r in only_alpha]

    # fuzzy cap: both dist<=1 neighbours exist, cap 1 keeps the higher-df
    fz = fulltext.fuzzy_query(
        spark, sf, query_text="bet gamm", max_dist=2, max_expansions=1
    ).collect()
    # candidates: beta (df 3), gamma (df 2), delta(dist2 of bet? lev('bet','delta')=3 no)
    want_fz = fulltext._score_expanded(spark, ix, ["beta"], 10).collect()
    assert [tuple(r) for r in fz] == [tuple(r) for r in want_fz]


def _lev_ref(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


def test_lev_banded_matches_reference():
    import numpy as np

    from lucene_mapreduce_spark.query.wand import _lev_banded

    import random

    rng = random.Random(7)
    vocab = [
        "".join(rng.choice("abcde") for _ in range(rng.randint(0, 8)))
        for _ in range(200)
    ] + ["", "a", "merge", "marge"]
    terms = np.asarray(vocab, dtype=str)
    lens = np.char.str_len(terms)
    for word in ("", "m", "merge", "abcde", "edcba"):
        got = _lev_banded(terms, lens, word)
        assert [int(x) for x in got] == [_lev_ref(t, word) for t in vocab]


def test_serving_suggesters_match_spark_gate(spark, tmp_path):
    """IndexSearcher.spell_suggest/autocomplete must return exactly the
    Spark gate suggesters' rows (same ranking contract), and answer warm
    calls interactively (<100 ms) — the FST-seek role of the dictionary."""
    import time

    from lucene_mapreduce_spark.operators import fulltext
    from lucene_mapreduce_spark.query.wand import IndexSearcher

    texts = {
        0: "merge sort stream",
        1: "merge scan slow",
        2: "sort small spark",
        3: "row slow merge",
    }
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}
    ).to_parquet(sf + "/documents.parquet")

    sg = fulltext.spell_suggest(spark, sf, word="sor", max_dist=2, k=5).collect()
    ac = fulltext.autocomplete(spark, sf, prefix="s", k=5).collect()
    s = IndexSearcher(fulltext._GATE_INDEXES[sf])
    got_sg = s.spell_suggest("sor", max_dist=2, k=5)
    got_ac = s.autocomplete("s", k=5)
    assert got_sg == [(r["term"], r["dist"], r["df"]) for r in sg]
    assert got_ac == [(r["term"], r["cf"]) for r in ac]

    t0 = time.perf_counter()
    for _ in range(10):
        s.spell_suggest("sor")
        s.autocomplete("s")
    assert (time.perf_counter() - t0) / 10 < 0.1, "warm suggest not interactive"
