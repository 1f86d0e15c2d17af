"""Tests: round-4 session-17 batch 114 — Fisher exact 2x2, BH-FDR
step-up procedure, HITS authorities (3 iterations)."""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity, textstats


def _r12(x: float) -> float:
    # engines round half-up; Python round() is banker's
    return float(Decimal(repr(x)).quantize(Decimal("1e-12"), ROUND_HALF_UP))


def test_fisher_exact_recompute(spark, sf_dir):
    out = textstats.fisher_exact_2x2(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    docs["toks"] = docs.text.map(tokenize_string)
    per = pd.DataFrame(
        {
            "vocab": docs.groupby("source").toks.apply(
                lambda ls: len({t for l in ls for t in l})
            ),
            "n_tokens": docs.groupby("source").toks.apply(
                lambda ls: sum(len(l) for l in ls)
            ),
            "n_docs": docs.groupby("source").size(),
        }
    )
    s, tv = len(per), per.vocab.sum()
    tt, td = per.n_tokens.sum(), per.n_docs.sum()
    fa = per.vocab * s > tv
    fb = per.n_tokens * td > tt * per.n_docs
    a = int((fa & fb).sum())
    b = int((fa & ~fb).sum())
    c = int((~fa & fb).sum())
    d = int((~fa & ~fb).sum())
    assert (out.n_hh, out.n_hl, out.n_lh, out.n_ll) == (a, b, c, d)
    assert out.n_total == s
    r1, r2, k = a + b, c + d, a + c
    w_obs = math.comb(r1, a) * math.comb(r2, c)
    ws = [
        math.comb(r1, x) * math.comb(r2, k - x)
        for x in range(max(0, k - r2), min(r1, k) + 1)
    ]
    # Vandermonde: the enumeration must cover C(n, k) exactly
    assert out.w_total == sum(ws) == math.comb(s, k)
    p = sum(w for w in ws if w <= w_obs) / sum(ws)
    assert abs(out.p_two_sided - p) < 1e-9
    if b * c > 0:
        assert abs(out.odds_ratio - (a * d) / (b * c)) < 1e-6
    else:
        assert pd.isna(out.odds_ratio)


def _u52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def test_bh_fdr_recompute(spark, sf_dir):
    out = parity.bh_fdr_procedure(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = []
    for src in docs.source.unique():
        u = _u52(f"{src}:bhfdr")
        planted = _u52(f"{src}:bhsig") * 4 < (1 << 52)
        den = (1000 * (1 << 52)) if planted else (1 << 52)
        rows.append((src, u, planted, u / den, u * (1 if planted else 1000)))
    ref = pd.DataFrame(
        rows, columns=["source", "u", "planted", "p", "ord"]
    ).sort_values(["ord", "source"]).reset_index(drop=True)
    m = len(ref)
    ref["i"] = range(1, m + 1)
    ref["thr"] = (0.1 * ref.i) / m
    hits = ref.i[ref.p <= ref.thr]
    kstar = int(hits.max()) if len(hits) else 0
    ref["rejected"] = ref.i <= kstar
    ref["p_adj"] = [
        min(1.0, ((ref.p * m) / ref.i)[j:].min()) for j in range(m)
    ]
    assert len(out) == m
    for got, exp in zip(out.itertuples(), ref.itertuples()):
        assert (got.source, got.rank_i) == (exp.source, exp.i)
        assert got.planted == exp.planted and got.rejected == exp.rejected
        assert abs(got.p_value - _r12(exp.p)) < 1e-12
        assert abs(got.p_adj - _r12(exp.p_adj)) < 1e-12
    # the step-up must fire on the planted family and spare some nulls
    assert out.rejected.sum() >= 1
    assert (~out.rejected).sum() >= 1
    assert set(out[out.rejected].source) <= set(out[out.planted].source)
    # adjusted p is non-decreasing in rank (suffix-min property)
    assert (out.p_adj.diff().dropna() >= -1e-15).all()


def test_hits_recompute(spark, sf_dir):
    out = textstats.hits_authority_3iter(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    edges = sorted(
        {
            (r.doc_id, t)
            for r in docs.itertuples()
            for t in tokenize_string(r.text)
        }
    )
    # sums run in exact Decimal (the engines sum DECIMAL(28,12) order-free);
    # only the per-half-step normalization divides as float64, like both
    # engines' DECIMAL->DOUBLE cast + division
    zero = Decimal(0)
    hub = {d: Decimal(1) for d, _ in edges}
    auth: dict[str, Decimal] = {}
    for _ in range(textstats.HITS_ITERS):
        ar: dict[str, Decimal] = {}
        for d, t in edges:
            ar[t] = ar.get(t, zero) + hub[d]
        amax = float(max(ar.values()))
        auth = {
            t: Decimal(repr(_r12(float(v) / amax))) for t, v in ar.items()
        }
        hr: dict[int, Decimal] = {}
        for d, t in edges:
            hr[d] = hr.get(d, zero) + auth[t]
        hmax = float(max(hr.values()))
        hub = {
            d: Decimal(repr(_r12(float(v) / hmax))) for d, v in hr.items()
        }
    top = sorted(auth.items(), key=lambda kv: (-kv[1], kv[0]))[
        : textstats.HITS_TOP_K
    ]
    assert list(out.term) == [t for t, _ in top]
    for got, (_, v) in zip(out.auth_score, top):
        assert abs(got - float(v)) < 1e-9
    assert out.auth_score.iloc[0] == 1.0
    assert list(out["rank"]) == list(range(1, len(out) + 1))
