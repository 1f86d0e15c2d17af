"""Tests: round-4 session-17 batch 128 — Burrows delta, DP exponential
mechanism, skip-pointer benefit."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity, textstats
from lucene_mapreduce_spark.operators.fulltext import FLAGSHIP_QUERY


def test_burrows_recompute(spark, sf_dir):
    out = textstats.burrows_delta_sources(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    per_src: dict[str, Counter] = defaultdict(Counter)
    for r in docs.itertuples():
        per_src[r.source].update(tokenize_string(r.text))
    corpus = Counter()
    for c in per_src.values():
        corpus.update(c)
    top = [
        t
        for t, _ in sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[
            : textstats.BURROWS_K
        ]
    ]
    srcs = sorted(per_src)
    rates = {
        (s, t): round(per_src[s][t] * 1000.0 / sum(per_src[s].values()), 12)
        for s in srcs
        for t in top
    }
    z = {}
    for t in top:
        vals = [rates[(s, t)] for s in srcs]
        n = len(vals)
        s1 = sum(sorted(vals))
        ss = sum(sorted(round(v * v, 12) for v in vals))
        mean = s1 / n
        std = math.sqrt((ss - s1 * mean) / (n - 1))
        for s in srcs:
            z[(s, t)] = (rates[(s, t)] - mean) / std
    assert len(out) == len(srcs) * (len(srcs) - 1) // 2
    for r in out.itertuples():
        d = sum(
            sorted(
                round(abs(z[(r.source_a, t)] - z[(r.source_b, t)]), 12)
                for t in top
            )
        ) / len(top)
        assert abs(r.delta - d) < 1e-6
        assert r.delta >= 0


def test_dp_em_recompute(spark, sf_dir):
    out = parity.dp_exponential_mechanism(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    counts = ev.event_type.value_counts().to_dict()
    scored = []
    for t, n in counts.items():
        h = int(hashlib.md5(f"em:{t}".encode()).hexdigest()[:13], 16)
        u = (h + 0.5) * (2.0 ** -52)
        g = -round(math.log(-round(math.log(u), 12)), 12)
        s = round(
            n * parity.DP_EM_EPSILON / (2.0 * parity.DP_EM_SENSITIVITY) + g, 6
        )
        scored.append((t, n, u, s))
    winner = sorted(scored, key=lambda x: (-x[3], x[0]))[0][0]
    assert sorted(out.event_type) == sorted(counts)
    for r in out.itertuples():
        exp = next(x for x in scored if x[0] == r.event_type)
        assert r.n_events == exp[1]
        assert abs(r.u - exp[2]) < 1e-12
        assert abs(r.noisy_score - exp[3]) < 1e-6
        assert r.chosen == int(r.event_type == winner)
    assert out.chosen.sum() == 1


def test_skip_benefit_recompute(spark, sf_dir):
    out = textstats.skip_pointer_benefit(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    qts = sorted(set(tokenize_string(FLAGSHIP_QUERY)))
    post = {t: [] for t in qts}
    for r in docs.itertuples():
        toks = set(tokenize_string(r.text))
        for t in qts:
            if t in toks:
                post[t].append(int(r.doc_id))
    B = textstats.SKIP_BLOCK_B
    for r in out.itertuples():
        small = post[r.t_small]
        large = sorted(post[r.t_large])
        assert (r.df_small, r.df_large) == (len(small), len(large))
        assert r.df_small <= r.df_large
        blocks = [
            (min(large[i : i + B]), max(large[i : i + B]))
            for i in range(0, len(large), B)
        ]
        assert r.n_blocks == len(blocks)
        touched = sum(
            1
            for lo, hi in blocks
            if any(lo <= d <= hi for d in small)
        )
        assert r.blocks_touched == touched
        assert abs(
            r.decode_saving - (1.0 - touched * B / len(large))
        ) < 1e-6
    # every (small, large) df-ordered pair of distinct terms appears
    n_terms = len(qts)
    assert len(out) == sum(
        1
        for a in qts
        for b in qts
        if a != b and len(post[a]) <= len(post[b])
    ) - sum(
        1
        for a in qts
        for b in qts
        if a < b and len(post[a]) == len(post[b])
    ) * 0  # df ties keep both directions
