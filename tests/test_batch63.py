"""Tests: round-4 session-14 batch 63 — TextRank keywords, position-based
attribution."""

from __future__ import annotations

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity, textstats


def test_textrank_recompute(spark, sf_dir):
    out = textstats.textrank_keywords(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    pairs: dict[tuple, int] = {}
    for text in docs.text:
        ts = tokenize_string(text)
        for a, b in zip(ts, ts[1:]):
            key = (min(a, b), max(a, b))
            pairs[key] = pairs.get(key, 0) + 1
    edges: dict[str, set] = {}
    for (a, b), n in pairs.items():
        if n >= textstats.TEXTRANK_MIN_SUPPORT and a != b:
            edges.setdefault(a, set()).add(b)
            edges.setdefault(b, set()).add(a)
    nodes = sorted(edges)
    nn = len(nodes)
    d = textstats.TEXTRANK_D
    rank = {v: 1.0 / nn for v in nodes}
    for _ in range(textstats.TEXTRANK_ITERS):
        # 12dp-rounded contributions, order-free (sum of decimals; python
        # float sum over sorted keys is exact enough vs DECIMAL at 1e-9)
        nxt = {}
        for v in nodes:
            s = sum(
                round(d * rank[u] / len(edges[u]), 12) for u in sorted(edges[v])
            )
            nxt[v] = (1.0 - d) / nn + s
        rank = nxt
    want = sorted(
        ((round(r, 6), t) for t, r in rank.items()), key=lambda x: (-x[0], x[1])
    )[: textstats.TEXTRANK_TOP_K]
    assert list(out.term) == [t for _, t in want]
    for got, (r, _t) in zip(out.textrank, want):
        assert abs(got - r) < 1e-6
    # scores are a probability-like distribution: all positive
    assert (out.textrank > 0).all()


def test_attribution_position_recompute(spark, sf_dir):
    out = parity.attribution_position_based(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["us"] = ev.ts.astype("int64")
    conv = parity.ATTR_CONVERSION
    credit: dict[str, float] = {}
    touches: dict[str, int] = {}
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        recs = list(g.itertuples())
        for c in recs:
            if c.event_type != conv:
                continue
            path = [
                t
                for t in recs
                if t.event_type != conv
                and (t.us, t.event_id) < (c.us, c.event_id)
            ]
            n = len(path)
            for pos, t in enumerate(path, start=1):
                if n == 1:
                    cr = 1.0
                elif pos in (1, n):
                    cr = 0.5 if n == 2 else 0.4
                else:
                    cr = 0.2 / (n - 2)
                credit[t.event_type] = credit.get(t.event_type, 0.0) + round(
                    cr, 12
                )
                touches[t.event_type] = touches.get(t.event_type, 0) + 1
    got = {r.channel: (r.n_touches, r.credit) for r in out.itertuples(index=False)}
    assert set(got) == set(credit)
    for ch, (nt, cr) in got.items():
        assert nt == touches[ch]
        assert abs(cr - round(credit[ch], 6)) < 1e-5
    # total credit equals the number of conversions with a non-empty path
    n_conv_with_path = sum(
        1
        for _, g in ev.groupby("user_id")
        for c in g.itertuples()
        if c.event_type == conv
        and any(
            (t.us, t.event_id) < (c.us, c.event_id)
            for t in g.itertuples()
            if t.event_type != conv
        )
    )
    assert abs(out.credit.sum() - n_conv_with_path) < 1e-3
