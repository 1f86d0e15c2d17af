"""Tests: round-3 session-7 batch 8 (has_child / has_parent / children
agg / scripted metric / combined_fields / rank_eval / hashed linear
classifier / sampler agg / geo distance) — invariants beyond the DuckDB
oracle gate."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, parity, textstats


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _orders(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/orders.parquet")


# ------------------------------------------------------------- parent/child
def test_has_child_sums_matching_children(spark, sf_dir):
    out = parity.has_child_query(spark, sf_dir).toPandas()
    o = _orders(sf_dir)
    prio, status = parity.HAS_CHILD_PRED
    kids = o[(o["o_orderpriority"] == prio) & (o["o_orderstatus"] == status)]
    per = kids.groupby("o_custkey").agg(
        n=("o_orderkey", "size"), s=("o_totalprice", "sum")
    )
    per = per[per["n"] >= parity.HAS_CHILD_MIN]
    assert (out["n_children"] >= parity.HAS_CHILD_MIN).all()
    for _, r in out.iterrows():
        assert r["n_children"] == per.loc[r["c_custkey"], "n"]
        assert math.isclose(r["score"], per.loc[r["c_custkey"], "s"], abs_tol=1e-3)
    # top-k really is the global argmax of the per-parent sums
    assert math.isclose(out["score"].iloc[0], per["s"].max(), abs_tol=1e-3)


def test_has_parent_propagates_parent_score(spark, sf_dir):
    out = parity.has_parent_query(spark, sf_dir).toPandas()
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    seg = cust[cust["c_mktsegment"] == parity.HAS_PARENT_SEGMENT]
    seg_keys = set(seg["c_custkey"])
    assert set(out["c_custkey"]) <= seg_keys
    bal = seg.set_index("c_custkey")["c_acctbal"]
    for _, r in out.iterrows():
        assert math.isclose(
            r["parent_score"], round(bal.loc[r["c_custkey"]], 6), abs_tol=1e-9
        )
    assert (out["parent_score"].diff().dropna() <= 1e-12).all()


def test_children_agg_totals(spark, sf_dir):
    out = parity.children_agg(spark, sf_dir).toPandas()
    o = _orders(sf_dir)
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    j = o.merge(cust, left_on="o_custkey", right_on="c_custkey")
    assert out["n_orders"].sum() == len(o)
    per = j.groupby("c_mktsegment")["o_totalprice"].sum()
    for _, r in out.iterrows():
        assert math.isclose(r["revenue"], per[r["c_mktsegment"]], abs_tol=1e-2)


def test_scripted_metric_is_rms(spark, sf_dir):
    out = parity.scripted_metric_agg(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    for _, r in out.iterrows():
        v = ev.loc[ev["event_type"] == r["event_type"], "value"].round(6)
        rms = math.sqrt((v * v).round(6).sum() / len(v))
        assert math.isclose(r["rms_value"], rms, abs_tol=1e-5)


# ------------------------------------------------------------- query scoring
def test_combined_fields_differs_from_bm25f_but_same_candidates(spark, sf_dir):
    cf = fulltext.combined_fields_query(spark, sf_dir).toPandas()
    bf = fulltext.bm25f_topk(spark, sf_dir).toPandas()
    assert len(cf) == 10
    # same any-field match semantics feed both, so the keyword-only docs
    # ('src3' hits) must appear in both result pages
    assert set(cf["doc_id"]) & set(bf["doc_id"])
    # shared norm vs per-field norm: the scoring differs
    merged = cf.merge(bf, on="doc_id", suffixes=("_cf", "_bf"))
    if len(merged):
        assert not np.allclose(merged["score_cf"], merged["score_bf"])


def test_rank_eval_metric_ranges_and_idcg(spark, sf_dir):
    out = fulltext.rank_eval(spark, sf_dir).toPandas().iloc[0]
    assert 0.0 <= out["precision"] <= 1.0
    assert 0.0 <= out["mrr"] <= 1.0
    assert out["idcg"] >= out["dcg"] >= 0.0
    assert math.isclose(out["ndcg"], round(out["dcg"] / out["idcg"], 6), abs_tol=2e-6)
    # recompute labels by hand for the page the engine returned
    terms = set(tokenize_string(fulltext.FLAGSHIP_QUERY))
    docs = _docs(sf_dir)
    page = fulltext.bm25_topk_documents(spark, sf_dir, k=10).toPandas()
    rel = {
        d: max(0, len(terms & set(tokenize_string(t))) - 2)
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    prec = sum(1 for d in page["doc_id"] if rel.get(d, 0) > 0) / 10.0
    assert math.isclose(out["precision"], prec, abs_tol=1e-9)


def test_linear_classifier_integer_exactness(spark, sf_dir):
    out = textstats.linear_classifier_topk(spark, sf_dir).toPandas()
    assert len(out) == 10
    # every score is an exact multiple of 1/1000
    for s in out["score"]:
        assert math.isclose(s * 1000, round(s * 1000), abs_tol=1e-9)
    assert (out.loc[out["score"] > 0, "label"] == "keep").all()
    assert (out["score"].diff().dropna() <= 1e-12).all()


def test_sampler_agg_counts_bounded(spark, sf_dir):
    out = textstats.sampler_agg(spark, sf_dir).toPandas()
    cap = textstats.SAMPLER_SHARDS * textstats.SAMPLER_PER_SHARD
    docs = _docs(sf_dir)
    assert out["n_sampled"].sum() == min(cap, len(docs))
    # recompute the deterministic sample by hand
    d = docs[["doc_id", "lang"]].copy()
    d["shard"] = d["doc_id"] % textstats.SAMPLER_SHARDS
    keep = (
        d.sort_values("doc_id")
        .groupby("shard")
        .head(textstats.SAMPLER_PER_SHARD)
    )
    exp = keep.groupby("lang").size()
    for _, r in out.iterrows():
        assert r["n_sampled"] == exp[r["lang"]]


def test_geo_distance_haversine_and_order(spark, sf_dir):
    out = textstats.geo_distance_query(spark, sf_dir).toPandas()
    clat, clon = textstats.GEO_CENTER
    assert (out["dist_km"] <= textstats.GEO_MAX_KM).all()
    assert (out["dist_km"].diff().dropna() >= -1e-12).all()
    assert (out["lat"].abs() <= 90).all() and (out["lon"].abs() <= 180).all()
    for _, r in out.iterrows():
        dphi = math.radians(r["lat"] - clat) / 2
        dlmb = math.radians(r["lon"] - clon) / 2
        a = (
            math.sin(dphi) ** 2
            + math.cos(math.radians(clat))
            * math.cos(math.radians(r["lat"]))
            * math.sin(dlmb) ** 2
        )
        d = 2 * 6371.0 * math.asin(math.sqrt(a))
        assert math.isclose(r["dist_km"], d, abs_tol=1e-2)
