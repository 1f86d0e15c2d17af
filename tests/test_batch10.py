"""Tests: round-3 session-5 batch 4 (filtered kNN / min-max hybrid fusion /
domain quality rollup / JSON props stats) — invariants beyond the DuckDB
oracle gate."""

from __future__ import annotations

import json
import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity, similarity, textstats


def _emb(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/embeddings.parquet")


def test_filtered_ann_prefilter_semantics(spark, sf_dir):
    out = similarity.filtered_ann_topk(spark, sf_dir).toPandas()
    emb = _emb(sf_dir)
    labels = emb.set_index("vec_id")["label"]
    assert (labels.loc[out["vec_id"]] == similarity.FILTERED_ANN_LABEL).all()
    # exact recount: cosine top-10 among matching labels only
    q = np.array(emb.loc[emb["vec_id"] == 0, "embedding"].iloc[0], dtype=float)
    cand = emb[(emb["label"] == similarity.FILTERED_ANN_LABEL) & (emb["vec_id"] != 0)]
    scored = []
    for r in cand.itertuples():
        v = np.array(r.embedding, dtype=float)
        c = float(v @ q) / (math.sqrt(float(v @ v)) * math.sqrt(float(q @ q)))
        scored.append((int(r.vec_id), round(c, 6)))
    exp = sorted(scored, key=lambda t: (-t[1], t[0]))[:10]
    assert [(r.vec_id, r.cosine) for r in out.itertuples()] == exp
    # pre-filtering returns a full page of k matching vectors
    assert len(out) == 10


def test_hybrid_linear_bounds_and_union(spark, sf_dir):
    from lucene_mapreduce_spark.operators import fulltext

    out = similarity.hybrid_linear_fusion(spark, sf_dir).toPandas()
    lex = fulltext.bm25_index_topk_documents(
        spark, sf_dir, k=similarity.HYBRID_DEPTH
    ).toPandas()
    vec = similarity.ann_bruteforce_topk(
        spark, sf_dir, k=similarity.HYBRID_DEPTH
    ).toPandas()
    union = set(lex["doc_id"]) | set(vec["vec_id"])
    assert set(out["doc_id"]) <= union
    assert ((out["score"] >= 0) & (out["score"] <= 1)).all()
    # the per-list maximum normalizes to 1.0, so a doc topping BOTH lists
    # (if any) scores exactly 1.0; a doc topping one list scores >= alpha/2
    assert out["score"].iloc[0] >= 0.5 - 1e-9


def test_domain_quality_rollup_consistency(spark, sf_dir):
    out = textstats.domain_quality_rollup(spark, sf_dir).toPandas()
    q = textstats.quality_score(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "source"]]
    j = docs.merge(q[["doc_id", "quality"]], on="doc_id")
    grp = j.groupby("source")
    assert dict(zip(out["source"], out["n_docs"])) == grp.size().to_dict()
    thr = textstats.QUALITY_KEEP_THRESHOLD
    for r in out.itertuples():
        sub = grp.get_group(r.source)["quality"]
        assert abs(r.mean_quality - round(float(sub.sum()) / len(sub), 6)) <= 1e-6
        assert r.keep_rate == round(float((sub >= thr).mean()), 6)
    assert out["n_docs"].sum() == len(docs)


def test_json_props_stats_exact(spark, sf_dir):
    out = parity.json_props_stats(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev.assign(k=[json.loads(p).get("k") for p in ev["props"]])
    for r in out.itertuples():
        sub = ev[ev["event_type"] == r.event_type]["k"]
        assert r.n_events == len(sub)
        assert r.n_malformed == int(sub.isna().sum())
        assert (r.min_k, r.max_k) == (int(sub.min()), int(sub.max()))
        assert r.distinct_k == sub.nunique()
        assert abs(r.mean_k - round(float(sub.sum()) / sub.notna().sum(), 6)) <= 1e-6
