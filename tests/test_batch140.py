"""Tests: round-4 session-17 batch 140 — UMass coherence, PFOR vs
varbyte, sampled top-k fidelity."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import textstats


def test_umass_recompute(spark, sf_dir):
    out = textstats.umass_topic_coherence(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cf = Counter()
    doc_sets = {}
    for r in docs.itertuples():
        toks = tokenize_string(r.text)
        doc_sets[int(r.doc_id)] = set(toks)
        if r.source == textstats.UMASS_SOURCE:
            cf.update(toks)
    topic = [
        w
        for w, _ in sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[
            : textstats.UMASS_K
        ]
    ]
    dfreq = {
        w: sum(1 for s in doc_sets.values() if w in s) for w in topic
    }
    k = len(topic)
    pairs = {}
    total = 0.0
    for i in range(1, k):
        for j in range(i):
            wi, wj = topic[i], topic[j]
            dij = sum(
                1 for s in doc_sets.values() if wi in s and wj in s
            )
            c = round(math.log((dij + 1) / dfreq[wj]), 12)
            pairs[(wi, wj)] = (dij, dfreq[wj], c)
            total += c
    assert len(out) == len(pairs) == k * (k - 1) // 2
    for r in out.itertuples():
        dij, dj, c = pairs[(r.wi, r.wj)]
        assert (r.d_ij, r.dj) == (dij, dj)
        assert abs(r.contrib - c) < 1e-6
        assert abs(r.coherence - total) < 1e-5
        assert r.n_pairs == len(pairs)


def test_pfor_recompute(spark, sf_dir):
    out = textstats.pfor_vs_varbyte_audit(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    postings = defaultdict(list)
    for r in docs.itertuples():
        for t in set(tokenize_string(r.text)):
            postings[t].append(int(r.doc_id))
    B = textstats.PFOR_BLOCK
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for t, ds in postings.items():
        ds.sort()
        gaps = [d - p for d, p in zip(ds, [-1] + ds[:-1])]
        vb = sum(
            1 + (g >= 1 << 7) + (g >= 1 << 14) + (g >= 1 << 21)
            for g in gaps
        )
        pf = 0
        for i in range(0, len(gaps), B):
            blk = gaps[i : i + B]
            bits = max(g.bit_length() for g in blk) or 1
            pf += (len(blk) * bits + 7) // 8 + 1
        dec = len(str(len(ds))) - 1
        a = agg[dec]
        a[0] += 1
        a[1] += len(ds)
        a[2] += vb
        a[3] += pf
    assert list(out.decade) == sorted(agg)
    for r in out.itertuples():
        a = agg[r.decade]
        assert (
            r.n_terms, r.total_postings, r.varbyte_bytes, r.pfor_bytes,
        ) == tuple(a)
        assert abs(r.pfor_over_varbyte - a[3] / a[2]) < 1e-6


def test_sampled_topk_recompute(spark, sf_dir):
    out = textstats.sampled_topk_fidelity(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    exact = Counter(ev.user_id)
    keep = [
        int(hashlib.md5(f"smp:{e}".encode()).hexdigest()[:13], 16)
        % textstats.SAMPLE_TOPK_MOD
        == 0
        for e in ev.event_id
    ]
    samp = Counter(ev.user_id[keep])
    k = textstats.SAMPLE_TOPK_K
    te = [
        u
        for u, _ in sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    ]
    ts = [
        u
        for u, _ in sorted(samp.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    ]
    overlap = len(set(te) & set(ts))
    err = sum(
        sorted(
            round(
                abs(samp.get(u, 0) * textstats.SAMPLE_TOPK_MOD - exact[u])
                / exact[u],
                12,
            )
            for u in te
        )
    ) / k
    assert out.n_total == len(ev)
    assert out.n_sample == sum(keep)
    assert out.overlap_at_10 == overlap
    assert abs(out.mean_rel_err - err) < 1e-6
    # a 1/8 sample should still find most of the head
    assert out.overlap_at_10 >= 3
