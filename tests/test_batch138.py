"""Tests: round-4 session-17 batch 138 — query segmentation, shard
merge audit, position gap bytes."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, textstats
from lucene_mapreduce_spark.query.bm25 import B, K1, bm25_oracle_pandas


def test_query_segmentation_recompute(spark, sf_dir):
    out = textstats.query_segmentation_plan(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    uni = Counter()
    bi = Counter()
    nu = nb = 0
    for t in docs.text:
        toks = tokenize_string(t)
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
        nu += len(toks)
        nb += max(len(toks) - 1, 0)
    q = tokenize_string(fulltext.FLAGSHIP_QUERY)
    assert len(out) == len(q) - 1
    for r in out.itertuples():
        w1, w2 = q[r.pos - 1], q[r.pos]
        assert (r.w1, r.w2) == (w1, w2)
        assert (r.c1, r.c2) == (uni[w1], uni[w2])
        cab = bi[(w1, w2)]
        assert r.c_ab == cab
        if cab > 0:
            pmi = round(
                math.log(
                    (cab / nb) / ((uni[w1] / nu) * (uni[w2] / nu))
                ),
                12,
            )
            assert abs(r.pmi - round(pmi, 6)) < 1e-6
            assert r.segment == int(
                cab >= textstats.PMI_SEG_MIN_COUNT
                and pmi > textstats.PMI_SEG_THRESHOLD
            )
        else:
            assert pd.isna(r.pmi) and r.segment == 0


def test_shard_merge_recompute(spark, sf_dir):
    out = fulltext.shard_score_merge_audit(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    qts = sorted(set(tokenize_string(fulltext.FLAGSHIP_QUERY)))
    toks = {int(r.doc_id): tokenize_string(r.text) for r in docs.itertuples()}
    shard = {
        d: int(hashlib.md5(str(d).encode()).hexdigest()[:13], 16)
        % fulltext.SHARD_MERGE_N
        for d in toks
    }
    local_scores = {}
    for s in range(fulltext.SHARD_MERGE_N):
        ids = [d for d in toks if shard[d] == s]
        n = len(ids)
        avgdl = sum(len(toks[d]) for d in ids) / n
        for t in qts:
            df = sum(1 for d in ids if t in toks[d])
            if df == 0:
                continue
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            for d in ids:
                tf = toks[d].count(t)
                if tf == 0:
                    continue
                dl = len(toks[d])
                c = idf * (tf * (K1 + 1)) / (
                    tf + K1 * (1 - B + B * dl / avgdl)
                )
                local_scores[d] = local_scores.get(d, 0.0) + c
    per_shard = defaultdict(list)
    for d, sc in local_scores.items():
        per_shard[shard[d]].append((round(sc, 6), d))
    cand = []
    for s, lst in per_shard.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        cand.extend(
            (sc, d, s) for sc, d in lst[: fulltext.SHARD_MERGE_LOCAL_K]
        )
    cand.sort(key=lambda t: (-t[0], t[1]))
    merged = cand[: fulltext.SHARD_MERGE_K]
    gp = bm25_oracle_pandas(docs, fulltext.FLAGSHIP_QUERY, k=10)
    grank = dict(zip(gp.doc_id.astype(int), gp["rank"].astype(int)))
    assert len(out) == len(merged)
    for r, (sc, d, s) in zip(out.itertuples(), merged):
        assert (r.merged_rank, int(r.doc_id), r.shard) == (
            r.merged_rank, d, s,
        )
        assert abs(r.local_score - sc) < 1e-6
        if d in grank:
            assert r.global_rank == grank[d]
        else:
            assert pd.isna(r.global_rank)
    # shard-local stats must actually reorder vs global somewhere, or
    # at minimum the merged page is a permutation of plausible docs
    assert out.merged_rank.tolist() == list(range(1, len(out) + 1))


def test_position_bytes_recompute(spark, sf_dir):
    out = textstats.position_gap_bytes_estimate(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    per_term = defaultdict(lambda: [set(), 0, 0])
    for r in docs.itertuples():
        pos_by_term = defaultdict(list)
        for i, t in enumerate(tokenize_string(r.text), 1):
            pos_by_term[t].append(i)
        for t, ps in pos_by_term.items():
            acc = per_term[t]
            acc[0].add(int(r.doc_id))
            prev = 0
            for p in ps:
                gap = p - prev
                prev = p
                acc[1] += 1
                acc[2] += 1 + (gap >= 128) + (gap >= 16384)
    agg = defaultdict(lambda: [0, 0, 0])
    for t, (ds, npos, byt) in per_term.items():
        dec = len(str(len(ds))) - 1
        a = agg[dec]
        a[0] += 1
        a[1] += npos
        a[2] += byt
    assert list(out.decade) == sorted(agg)
    for r in out.itertuples():
        a = agg[r.decade]
        assert (r.n_terms, r.total_positions, r.total_bytes) == tuple(a)
        assert abs(r.bytes_per_position - a[2] / a[1]) < 1e-6
        assert r.bytes_per_position >= 1.0
