"""Tests: point-in-time generation search, ToChildBlockJoin, count-min
sketch heavy hitters, LMDirichlet similarity — invariants beyond the
DuckDB oracle gate."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext
from lucene_mapreduce_spark.query.bm25 import bm25_oracle_pandas


def _corpus(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_pit_read_matches_stale_generation_corpus(spark, sf_dir):
    """as_of=1 on the unmerged gate index == BM25 over batch 1's corpus
    (even docs + stale odd copies), float64-exact vs the golden scorer."""
    out = fulltext.search_at_generation(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)[["doc_id", "text"]].copy()
    odd = docs["doc_id"] % 2 == 1
    docs.loc[odd, "text"] = "stale shadowed " + docs.loc[odd, "text"]
    want = bm25_oracle_pandas(docs, fulltext.FLAGSHIP_QUERY, k=10)
    assert list(out["doc_id"]) == list(want["doc_id"])
    for got, exact in zip(out["score"], want["score"]):
        assert abs(got - round(exact, 6)) < 1e-9


def test_pit_read_differs_from_latest(spark, sf_dir):
    """The pinned commit must NOT see batch 2: scores diverge from the
    latest-wins index on the same query (stale odd docs carry two extra
    tokens, shifting dl/avgdl/df)."""
    pit = fulltext.search_at_generation(spark, sf_dir).toPandas()
    live = fulltext.bm25_index_topk_documents(spark, sf_dir).toPandas()
    assert not pit["score"].equals(live["score"])


def test_pit_manifest_filters_segments(spark, sf_dir):
    from lucene_mapreduce_spark.index.manifest import load_manifest
    from lucene_mapreduce_spark.query.segments import pit_manifest

    ix = fulltext._gate_index_unmerged(spark, sf_dir)
    m = load_manifest(ix)
    assert len(m.segments) == 2
    m1 = pit_manifest(ix, 1)
    assert len(m1.segments) == 1 and m1.segments[0].max_seq == 1
    # the on-disk manifest object is untouched (dataclasses.replace copy)
    assert len(load_manifest(ix).segments) == 2


def test_to_child_returns_whole_blocks_with_parent_score(spark, sf_dir):
    width = fulltext.BLOCK_WIDTH
    out = fulltext.to_child_block_join(spark, sf_dir, k=5).toPandas()
    docs = _corpus(sf_dir)
    # top-5 parents from the ToParentBlockJoin gate (same rollup)
    parents = fulltext.block_join_topk(spark, sf_dir, k=5).toPandas()
    want_parents = dict(zip(parents["parent_id"], parents["score"]))
    assert set(out["parent_id"]) == set(want_parents)
    by_block = docs.assign(parent_id=docs["doc_id"] // width)
    for pid, grp in out.groupby("parent_id"):
        # every child of the block, each carrying the parent's score
        assert set(grp["doc_id"]) == set(
            by_block[by_block["parent_id"] == pid]["doc_id"]
        )
        assert (grp["score"] == want_parents[pid]).all()
    # rank is dense 1..N over (score desc, parent_id, doc_id)
    srt = out.sort_values("rank")
    assert list(srt["rank"]) == list(range(1, len(out) + 1))
    assert list(srt["doc_id"]) == list(
        out.sort_values(
            ["score", "parent_id", "doc_id"], ascending=[False, True, True]
        )["doc_id"]
    )


def test_cms_never_underestimates_and_matches_exact_counts(spark, sf_dir):
    out = fulltext.cms_heavy_hitters(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    cf: dict[str, int] = {}
    for text in docs["text"]:
        for t in tokenize_string(text):
            cf[t] = cf.get(t, 0) + 1
    top = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[: fulltext.CMS_TOPK]
    assert list(out["term"]) == [t for t, _ in top]
    assert list(out["cf"]) == [c for _, c in top]
    assert (out["cf_est"] >= out["cf"]).all()
    # replay the sketch: estimate = min over rows of bucket sums
    for term, est in zip(out["term"], out["cf_est"]):
        mins = []
        for r in range(fulltext.CMS_ROWS):
            b = (
                int(hashlib.md5(f"cms{r}:{term}".encode()).hexdigest()[:13], 16)
                % fulltext.CMS_WIDTH
            )
            cell = sum(
                c for t, c in cf.items()
                if int(hashlib.md5(f"cms{r}:{t}".encode()).hexdigest()[:13], 16)
                % fulltext.CMS_WIDTH == b
            )
            mins.append(cell)
        assert est == min(mins)


def test_lmdirichlet_matches_pandas_spec(spark, sf_dir):
    """Per-term clamped Dirichlet contributions summed ascending-term,
    float64-exact at 6dp."""
    mu = fulltext.LMD_MU
    out = fulltext.lmdirichlet_topk(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    toks = docs["text"].map(tokenize_string)
    total = float(toks.map(len).sum())
    qts = sorted(set(tokenize_string(fulltext.FLAGSHIP_QUERY)))
    cf = {t: float(sum(ts.count(t) for ts in toks)) for t in qts}
    scores: dict[int, float] = {}
    for d, ts in zip(docs["doc_id"], toks):
        dl = float(len(ts))
        s = 0.0
        hit = False
        for t in qts:
            tf = float(ts.count(t))
            if tf == 0.0 or cf[t] == 0.0:
                continue
            hit = True
            c = math.log(1.0 + tf / (mu * (cf[t] / total))) + math.log(
                mu / (dl + mu)
            )
            s += max(0.0, c)
        if hit:
            scores[int(d)] = s
    want = sorted(scores.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:10]
    assert list(out["doc_id"]) == [d for d, _ in want]
    for got, (_, exact) in zip(out["score"], want):
        assert abs(got - round(exact, 6)) < 1e-9


def test_taxonomy_rollup_lattice_is_consistent(spark, sf_dir):
    out = fulltext.taxonomy_facets(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    qts = set(tokenize_string(fulltext.BOOLEAN_QUERY))
    hits = docs[docs["text"].map(lambda t: bool(qts & set(tokenize_string(t))))]
    root = out[(out["source"] == "<all>") & (out["lang"] == "<all>")]
    assert int(root["n_docs"].iloc[0]) == len(hits)
    subtot = out[(out["source"] != "<all>") & (out["lang"] == "<all>")]
    assert int(subtot["n_docs"].sum()) == len(hits)
    leaves = out[(out["source"] != "<all>") & (out["lang"] != "<all>")]
    per_src = leaves.groupby("source")["n_docs"].sum()
    for s, n in per_src.items():
        assert int(n) == int(subtot[subtot["source"] == s]["n_docs"].iloc[0])
    # leaf counts match the corpus truth
    truth = hits.groupby(["source", "lang"]).size()
    for (s, l), n in truth.items():
        got = leaves[(leaves["source"] == s) & (leaves["lang"] == l)]
        assert int(got["n_docs"].iloc[0]) == int(n)


def test_serving_pit_matches_distributed_pit(spark, sf_dir):
    """IndexSearcher(as_of=1) must rank-and-score identically to the
    distributed PIT read of the same commit."""
    from decimal import ROUND_HALF_UP, Decimal

    from lucene_mapreduce_spark.query.wand import IndexSearcher

    ix = fulltext._gate_index_unmerged(spark, sf_dir)
    hits = IndexSearcher(ix, as_of=1).search(fulltext.FLAGSHIP_QUERY, k=10)
    dist = fulltext.search_at_generation(spark, sf_dir).toPandas()
    assert [int(d) for d, _ in hits] == list(dist["doc_id"])
    for (_, s), want in zip(hits, dist["score"]):
        got = float(
            Decimal(repr(s)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )
        assert abs(got - want) < 1e-9
