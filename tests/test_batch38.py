"""Tests: round-4 session-13 batch 38 (maxsim late interaction, edit-distance
near-dup verify, span-corruption plan, vocabulary drift, CUSUM, triangle
census) — independent recomputes."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import dedup, parity, relational, similarity, textstats


def _md5_52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def test_maxsim_recompute(spark, sf_dir):
    out = similarity.maxsim_late_interaction_topk(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    q = np.array(similarity.MAXSIM_Q)  # 4 x 16
    # pinned matrix really is the md5-per-mille convention
    assert q[0][0] == (_md5_52("msq:0:0") % 2001 - 1000) / 1000.0
    scores = {}
    for r in emb.itertuples():
        v = np.asarray(r.embedding, dtype=np.float64).reshape(4, 16)
        s = sum(max(float(np.dot(q[t], v[sv])) for sv in range(4)) for t in range(4))
        scores[r.vec_id] = round(s, 6)
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [int(v) for v in out["vec_id"]] == [v for v, _ in top]
    np.testing.assert_allclose(out["maxsim"], [s for _, s in top], atol=2e-6)


def _lev(a: str, b: str) -> int:
    # full DP (numpy rows) — independent of both engines' builtins
    n, m = len(a), len(b)
    prev = np.arange(m + 1, dtype=np.int64)
    bb = np.frombuffer(b.encode("utf-32-le"), np.uint32)
    for i in range(1, n + 1):
        cur = np.empty(m + 1, np.int64)
        cur[0] = i
        sub = prev[:-1] + (bb != ord(a[i - 1]))
        for j in range(1, m + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, sub[j - 1])
        prev = cur
    return int(prev[m])


def test_levenshtein_pairs_recompute(spark, sf_dir):
    out = dedup.levenshtein_near_dup_pairs(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    blocks = defaultdict(list)
    for r in docs.itertuples():
        blocks[r.text[: dedup.LEV_PREFIX_LEN]].append((r.doc_id, r.text))
    exp = []
    for _, members in blocks.items():
        members.sort()
        pairs = [
            (a[0], b[0], a[1], b[1])
            for i, a in enumerate(members)
            for b in members[i + 1 :]
        ]
        pairs.sort(key=lambda p: (p[0], p[1]))
        for da, db, ta, tb in pairs[: dedup.LEV_BLOCK_CAP]:
            d = _lev(ta, tb)
            if d <= dedup.LEV_MAX_DIST:
                exp.append((da, db, d))
    exp.sort()
    got = list(zip(out["doc_a"], out["doc_b"], out["edit_dist"]))
    assert [(int(a), int(b), int(d)) for a, b, d in got] == exp
    assert len(exp) > 0  # non-degenerate: the corpus has prefix-stable dups


def test_span_corruption_recompute(spark, sf_dir):
    out = textstats.span_corruption_stats(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    total = masked = spans = 0
    for r in docs.itertuples():
        toks = tokenize_string(r.text)
        prev = False
        for i in range(len(toks)):
            m = _md5_52(f"sc:{r.doc_id}:{i}") % 1000 < textstats.SC_MASK_PERMILLE
            total += 1
            masked += m
            spans += m and not prev
            prev = m
    assert int(out.total_tokens) == total
    assert int(out.masked_tokens) == masked
    assert int(out.n_spans) == spans
    assert abs(out.mask_rate - round(masked / total, 6)) < 1e-9
    assert abs(out.avg_span_len - round(masked / spans, 6)) < 1e-9
    # plan sanity: the coin is 15% and spans merge, so rate ~0.15, len > 1
    assert 0.10 < out.mask_rate < 0.20
    assert out.avg_span_len > 1.0


def test_term_drift_recompute(spark, sf_dir):
    import math

    out = textstats.term_drift_halves(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    n_a = int((docs["doc_id"] % 2 == 0).sum())
    n_b = len(docs) - n_a
    df_a, df_b = Counter(), Counter()
    for r in docs.itertuples():
        terms = set(tokenize_string(r.text))
        tgt = df_a if r.doc_id % 2 == 0 else df_b
        for t in terms:
            tgt[t] += 1
    rows = []
    for t in set(df_a) | set(df_b):
        a, b = df_a.get(t, 0), df_b.get(t, 0)
        if a + b >= textstats.DRIFT_MIN_DF:
            drift = round(
                abs(math.log((a + 1) / (n_a + 1)) - math.log((b + 1) / (n_b + 1))), 6
            )
            rows.append((t, a, b, drift))
    rows.sort(key=lambda r: (-r[3], r[0]))
    exp = rows[: textstats.DRIFT_TOP_K]
    got = list(zip(out["term"], out["df_a"], out["df_b"], out["drift"]))
    assert [(t, int(a), int(b), round(float(d), 6)) for t, a, b, d in got] == exp


def test_cusum_recompute(spark, sf_dir):
    out = parity.cusum_alerts(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    days = ev["ts"].dt.normalize().dt.date
    counts = days.value_counts().sort_index()
    cal = pd.date_range(counts.index.min(), counts.index.max(), freq="D").date
    ns = np.array([counts.get(d, 0) for d in cal], dtype=np.float64)
    mean = ns.sum() / len(ns)
    std = np.sqrt((ns * ns).sum() / len(ns) - mean * mean)
    s, cusums = 0.0, []
    for x in ns:
        s = max(0.0, s + ((x - mean) / std - parity.CUSUM_K))
        cusums.append(s)
    assert len(out) == len(cal)
    np.testing.assert_allclose(out["cusum"], np.round(cusums, 6), atol=1e-6)
    assert out["alert"].tolist() == [int(c > parity.CUSUM_H) for c in cusums]
    assert out["day"].tolist() == [str(d) for d in cal]


def test_affinity_triangles_recompute(spark, sf_dir):
    out = relational.affinity_triangles(spark, sf_dir).toPandas().iloc[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    op = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    pair_n = Counter()
    for _, grp in op.groupby("l_orderkey"):
        parts = sorted(grp["l_partkey"])
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                pair_n[(parts[i], parts[j])] += 1
    edges = {p for p, n in pair_n.items() if n >= relational.AFFINITY_MIN_SUPPORT}
    deg = Counter()
    adj = defaultdict(set)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
        adj[a].add(b)
    tri = sum(
        1
        for (a, b) in edges
        for c in adj[b]
        if c in adj[a]
    )
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    assert int(out.n_edges) == len(edges)
    assert int(out.n_parts) == len(deg)
    assert int(out.n_wedges) == wedges
    assert int(out.n_triangles) == tri
    if wedges:
        assert abs(out.global_clustering - round(3.0 * tri / wedges, 6)) < 1e-9
