"""Tests: round-4 session-17 batch 130 — Breslow-Day, Tukey HSD,
G-test of independence."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity


def test_breslow_day_recompute(spark, sf_dir):
    out = parity.breslow_day_test(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cells = {}
    for r in docs.itertuples():
        toks = set(tokenize_string(r.text))
        e = parity.MH_EXPOSURE_TOKEN in toks
        o = parity.MH_OUTCOME_TOKEN in toks
        c = cells.setdefault(r.lang, [0, 0, 0, 0])
        c[0 if (e and o) else 1 if e else 2 if o else 3] += 1
    s_ad = sum(
        sorted(round(a * d / (a + b + c + d), 12) for a, b, c, d in cells.values())
    )
    s_bc = sum(
        sorted(round(b * c / (a + b + c + d), 12) for a, b, c, d in cells.values())
    )
    orr = s_ad / s_bc
    terms = []
    for a, b, c, d in cells.values():
        r1, c1, nn = float(a + b), float(a + c), float(a + b + c + d)
        A = orr - 1.0
        B = -(A * (r1 + c1) + nn)
        C = orr * r1 * c1
        if abs(A) < 1e-12:
            ae = -C / B
        else:
            disc = math.sqrt(B * B - 4.0 * A * C)
            rm = (-B - disc) / (2.0 * A)
            rp = (-B + disc) / (2.0 * A)
            ok = (
                rm >= 0
                and r1 - rm >= 0
                and c1 - rm >= 0
                and nn - r1 - c1 + rm >= 0
            )
            ae = rm if ok else rp
        var = 1.0 / (
            1.0 / ae
            + 1.0 / (r1 - ae)
            + 1.0 / (c1 - ae)
            + 1.0 / (nn - r1 - c1 + ae)
        )
        terms.append(round((a - ae) ** 2 / var, 12))
    bd = sum(sorted(terms))
    assert out.n_strata == len(cells)
    assert out.df == len(cells) - 1
    assert abs(out.bd_stat - bd) < 1e-6
    assert out.bd_stat >= 0


def test_tukey_recompute(spark, sf_dir):
    out = parity.tukey_hsd_pairs(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    stats = {}
    ssw_terms = []
    for t, grp in ev.groupby("event_type"):
        n = len(grp)
        s = sum(sorted(round(float(v), 6) for v in grp.value))
        ss = sum(sorted(round(float(v) ** 2, 12) for v in grp.value))
        stats[t] = (n, s)
        ssw_terms.append(round(ss - s * (s / n), 12))
    msw = sum(sorted(ssw_terms)) / (len(ev) - len(stats))
    types = sorted(stats)
    k = 0
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            na, sa = stats[a]
            nb, sb = stats[b]
            diff = sa / na - sb / nb
            q = abs(diff) / math.sqrt((msw / 2) * (1 / na + 1 / nb))
            row = out[(out.type_a == a) & (out.type_b == b)].iloc[0]
            assert (row.na, row.nb) == (na, nb)
            assert abs(row.mean_diff - diff) < 1e-6
            assert abs(row.q_stat - q) < 1e-6
            assert row.significant == int(q > parity.TUKEY_Q_CRIT)
            k += 1
    assert len(out) == k == len(types) * (len(types) - 1) // 2


def test_g_test_recompute(spark, sf_dir):
    out = parity.g_test_lang_source(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cells = Counter(zip(docs.lang, docs.source))
    rm = Counter(docs.lang)
    cm = Counter(docs.source)
    n = len(docs)
    g = sum(
        sorted(
            round(2.0 * o * math.log(o / (rm[l] * cm[s] / n)), 12)
            for (l, s), o in cells.items()
        )
    )
    assert (out.n, out.r, out.c) == (n, len(rm), len(cm))
    assert out.df == (len(rm) - 1) * (len(cm) - 1)
    assert abs(out.g_stat - g) < 1e-6
    assert out.g_stat >= 0
