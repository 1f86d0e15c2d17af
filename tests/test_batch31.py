"""Tests: round-4 session-12 batch 31 (directional containment, dup-cluster
histogram, frequent triples, per-source KL, per-label centroids) —
independent pandas/numpy recomputes."""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import curation, dedup, similarity, textstats


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _shingle_sets(docs: pd.DataFrame, max_bucket: int = 100):
    per = {}
    for r in docs.itertuples():
        t = tokenize_string(r.text)
        if len(t) >= 3:
            per[int(r.doc_id)] = {
                " ".join(t[i : i + 3]) for i in range(len(t) - 2)
            }
    counts = {}
    for s in per.values():
        for sh in s:
            counts[sh] = counts.get(sh, 0) + 1
    hot = {sh for sh, c in counts.items() if c > max_bucket}
    return {d: s - hot for d, s in per.items()}


def test_containment_recompute(spark, sf_dir):
    out = dedup.containment_pairs(spark, sf_dir).toPandas()
    per = _shingle_sets(_docs(sf_dir))
    want = set()
    ids = sorted(per)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(per[a] & per[b])
            if not inter:
                continue
            for src, dst, n_src in [(a, b, len(per[a])), (b, a, len(per[b]))]:
                c = round(inter / n_src, 6)
                if c >= dedup.CONTAINMENT_THRESHOLD:
                    want.add((src, dst, c))
    got = {
        (int(r.doc_src), int(r.doc_dst), round(float(r.containment), 6))
        for r in out.itertuples()
    }
    assert got == want
    assert want, "gate corpus must produce containment pairs"
    # containment is directional: every emitted value bounds Jaccard above
    for src, dst, c in want:
        inter = len(per[src] & per[dst])
        j = inter / len(per[src] | per[dst])
        assert c >= j - 1e-6  # c is 6dp-rounded; j unrounded


def test_dup_cluster_histogram_consistency(spark, sf_dir):
    comp = curation.near_dup_components(spark, sf_dir).toPandas()
    out = curation.dup_cluster_size_histogram(spark, sf_dir).toPandas()
    sizes = comp.groupby("component").size().value_counts().sort_index()
    assert list(out["size"]) == list(sizes.index)
    assert list(out["n_clusters"]) == list(sizes.values)
    # histogram mass equals clustered docs
    assert (out["size"] * out["n_clusters"]).sum() == len(comp)


def test_frequent_triples_recompute(spark, sf_dir):
    out = textstats.frequent_triples_agg(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    sets = [set(tokenize_string(t)) for t in docs["text"]]
    df = {}
    for s in sets:
        for t in s:
            df[t] = df.get(t, 0) + 1
    hot = sorted(df, key=lambda t: (-df[t], t))[: textstats.FREQ_TRIPLES_HOT]
    hot_set = set(hot)
    from itertools import combinations

    support = {}
    for s in sets:
        for tri in combinations(sorted(s & hot_set), 3):
            support[tri] = support.get(tri, 0) + 1
    want = sorted(support.items(), key=lambda kv: (-kv[1], kv[0]))[
        : textstats.FREQ_TRIPLES_K
    ]
    got = [
        ((r.term_a, r.term_b, r.term_c), int(r.support))
        for r in out.itertuples()
    ]
    assert got == want


def test_kl_by_source_recompute(spark, sf_dir):
    out = textstats.kl_divergence_by_source(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    per, tot_s = {}, {}
    corpus, tot = {}, 0
    for r in docs.itertuples():
        for t in tokenize_string(r.text):
            per[(r.source, t)] = per.get((r.source, t), 0) + 1
            tot_s[r.source] = tot_s.get(r.source, 0) + 1
            corpus[t] = corpus.get(t, 0) + 1
            tot += 1
    want = {}
    for (src, t), cnt in per.items():
        p = cnt / tot_s[src]
        q = corpus[t] / tot
        want[src] = want.get(src, 0.0) + round(p * np.log(p / q), 12)
    for r in out.itertuples():
        assert abs(r.kl_nats - round(want[r.source], 6)) < 1e-9
        assert r.kl_nats >= 0 or abs(r.kl_nats) < 1e-3  # KL >= 0 up to rounding
    assert len(out) == len(tot_s)


def test_centroid_by_label_recompute(spark, sf_dir):
    out = similarity.embedding_centroid_by_label(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = np.stack([np.round(np.asarray(v, dtype=np.float64), 6) for v in emb["embedding"]])
    g = vecs.mean(axis=0)
    for r in out.itertuples():
        mask = (emb["label"] == r.label).to_numpy()
        m = vecs[mask].mean(axis=0)
        assert int(r.n_vecs) == int(mask.sum())
        assert abs(r.centroid_norm - round(float(np.linalg.norm(m)), 6)) < 1e-6
        cos = float(np.dot(m, g) / (np.linalg.norm(m) * np.linalg.norm(g)))
        assert abs(r.cos_to_global - round(cos, 6)) < 1e-6
