"""Tests: round-4 session-17 batch 122 — weekly periodogram, Bartlett
test, block-max tightness."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity, textstats


def _daily_counts(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    days = ev.ts.dt.normalize()
    cal = pd.date_range(days.min(), days.max(), freq="D")
    return days.value_counts().reindex(cal, fill_value=0).sort_index().values


def test_periodogram_recompute(spark, sf_dir):
    out = parity.weekly_periodogram_power(spark, sf_dir).toPandas()
    y = _daily_counts(sf_dir)
    assert list(out.period) == sorted(parity.PERIODOGRAM_PERIODS)
    for p in parity.PERIODOGRAM_PERIODS:
        trig = parity.PERIODOGRAM_TRIG[p]
        cs = sum(sorted(round(float(yy) * trig[i % p][0], 12)
                        for i, yy in enumerate(y)))
        ss = sum(sorted(round(float(yy) * trig[i % p][1], 12)
                        for i, yy in enumerate(y)))
        row = out[out.period == p].iloc[0]
        assert row.n_days == len(y)
        assert abs(row.amp_cos - cs) < 1e-5
        assert abs(row.amp_sin - ss) < 1e-5
        assert abs(row.power - (cs * cs + ss * ss)) < 1e-3
    # 30 days of a flat-rate Poisson stream: no strong weekly line is
    # asserted, but power must be non-negative and finite
    assert (out.power >= 0).all()


def test_bartlett_recompute(spark, sf_dir):
    out = parity.bartlett_variance_test(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    k = len(parity.BARTLETT_TYPES)
    sw_ss = sw_ln = s_inv = 0.0
    n_total = 0
    for t in parity.BARTLETT_TYPES:
        vals = ev[ev.event_type == t].value
        n = len(vals)
        s = sum(sorted(round(float(v), 6) for v in vals))
        ss = sum(sorted(round(float(v) * float(v), 12) for v in vals))
        s2 = (ss - s * s / n) / (n - 1)
        sw_ss += round((n - 1) * s2, 6)
        sw_ln += round((n - 1) * round(math.log(s2), 12), 12)
        s_inv += round(1.0 / (n - 1), 12)
        n_total += n
    ndf = n_total - k
    sp2 = sw_ss / ndf
    chi2 = (ndf * round(math.log(sp2), 12) - sw_ln) / (
        1.0 + (s_inv - 1.0 / ndf) / (3.0 * (k - 1))
    )
    assert (out.k, out.n_total, out.df) == (k, n_total, k - 1)
    assert abs(out.pooled_var - sp2) < 1e-4
    assert abs(out.chi2_stat - chi2) < 1e-4
    assert out.chi2_stat >= 0


def test_blockmax_recompute(spark, sf_dir):
    out = textstats.blockmax_tightness_report(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    tf: dict[str, dict[int, int]] = defaultdict(Counter)
    for r in docs.itertuples():
        for t in tokenize_string(r.text):
            tf[t][int(r.doc_id)] += 1
    rows = defaultdict(lambda: [set(), 0, 0, []])
    B = textstats.BLOCKMAX_B
    for term, postings in tf.items():
        df = len(postings)
        gmax = max(postings.values())
        decade = len(str(df)) - 1
        ordered = [postings[d] for d in sorted(postings)]
        for b0 in range(0, df, B):
            bmax = max(ordered[b0 : b0 + B])
            acc = rows[decade]
            acc[0].add(term)
            acc[1] += 1
            acc[2] += int(bmax == gmax)
            acc[3].append(round(bmax / gmax, 6))
    assert list(out.decade) == sorted(rows)
    for r in out.itertuples():
        exp = rows[r.decade]
        assert r.n_terms == len(exp[0])
        assert r.n_blocks == exp[1]
        assert r.n_tight_blocks == exp[2]
        assert abs(r.mean_tightness - sum(exp[3]) / len(exp[3])) < 1e-6
        # tightness is a ratio in (0, 1]
        assert 0 < r.mean_tightness <= 1
