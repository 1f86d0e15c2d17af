"""Tests: round-4 session-18 batch 156 — fighting words, WB PPL, kappa."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity, textstats


def test_fighting_words_recompute(spark, sf_dir):
    out = textstats.fighting_words_log_odds(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    per = Counter()
    for r in docs.itertuples():
        for t in tokenize_string(r.text):
            per[(r.source, t)] += 1
    tot_s = Counter()
    cf = Counter()
    for (s, t), c in per.items():
        tot_s[s] += c
        cf[t] += c
    ranked = sorted(tot_s, key=lambda s: (-tot_s[s], s))
    s1, s2 = ranked[0], ranked[1]
    assert (out.src1 == s1).all() and (out.src2 == s2).all()
    T = sum(cf.values())
    A0 = textstats.FIGHTING_WORDS_A0
    rows = []
    for t, c in cf.items():
        a = c * A0 / T
        y1, y2 = per.get((s1, t), 0), per.get((s2, t), 0)
        n1, n2 = tot_s[s1], tot_s[s2]
        delta = math.log((y1 + a) / (n1 + A0 - y1 - a)) - math.log(
            (y2 + a) / (n2 + A0 - y2 - a)
        )
        z = delta / math.sqrt(1 / (y1 + a) + 1 / (y2 + a))
        rows.append((t, y1, y2, delta, round(z, 6)))
    rows.sort(key=lambda r: (-abs(r[4]), r[0]))
    for i, row in enumerate(out.itertuples()):
        t, y1, y2, delta, z = rows[i]
        assert row.term == t
        assert (row.y1, row.y2) == (y1, y2)
        assert abs(row.delta - delta) < 1e-6
        assert abs(row.z - z) < 1e-6


def test_witten_bell_recompute(spark, sf_dir):
    out = textstats.witten_bell_perplexity(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    big = Counter()
    uni = Counter()
    for txt in docs.text:
        toks = tokenize_string(txt)
        uni.update(toks)
        for u, v in zip(toks, toks[1:]):
            big[(u, v)] += 1
    T = sum(uni.values())
    tu = Counter(u for (u, v) in big)
    sll = 0.0
    for (u, v), c in big.items():
        p = (c + tu[u] * uni[v] / T) / (uni[u] + tu[u])
        sll += c * math.log(p)
    n = sum(big.values())
    assert out.n_bigrams == n
    assert out.distinct_bigrams == len(big)
    assert abs(out.avg_neg_ll - (-sll / n)) < 1e-6
    assert abs(out.perplexity - math.exp(-sll / n)) < 1e-4
    assert out.perplexity > 1


def test_agreement_recompute(spark, sf_dir):
    out = parity.agreement_panel_kappa(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")

    def draw(tag, i):
        return int(hashlib.md5(f"{tag}{i}".encode()).hexdigest()[:13], 16)

    cells = Counter()
    for r in docs.itertuples():
        t = r.n_chars % 3
        a = t if draw("ra:", r.doc_id) < parity._KAPPA_TH_A else (t + 1) % 3
        b = t if draw("rb:", r.doc_id) < parity._KAPPA_TH_B else (t + 2) % 3
        cells[(a, b)] += 1
    n = sum(cells.values())
    po = sum(c for (a, b), c in cells.items() if a == b) / n
    ma = Counter()
    mb = Counter()
    for (a, b), c in cells.items():
        ma[a] += c
        mb[b] += c
    pe_c = sum(ma[k] * mb[k] for k in set(ma) | set(mb)) / n**2
    pe_s = sum(((ma[k] + mb[k]) / (2 * n)) ** 2 for k in set(ma) | set(mb))
    assert out.n == n
    assert abs(out.po - po) < 1e-6
    assert abs(out.pe_cohen - pe_c) < 1e-6
    assert abs(out.cohen_kappa - (po - pe_c) / (1 - pe_c)) < 1e-6
    assert abs(out.pe_scott - pe_s) < 1e-6
    assert abs(out.scott_pi - (po - pe_s) / (1 - pe_s)) < 1e-6
    # the raters are built to agree far above chance
    assert out.cohen_kappa > 0.3
