"""Tests: round-4 session-17 batch 127 — Fleiss kappa, information
gain, shift-share decomposition."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity, relational, textstats


def test_fleiss_recompute(spark, sf_dir):
    out = textstats.fleiss_kappa_quality(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    s6 = spos = 0
    c1 = c2 = c3 = 0
    n = len(docs)
    for t in docs.text:
        toks = tokenize_string(t)
        r1 = int(len(toks) >= textstats.FLEISS_MIN_TOKS)
        r2 = int(len(set(toks)) / len(toks) >= textstats.FLEISS_MIN_TTR)
        r3 = int(
            sum(len(x) for x in toks) / len(toks) >= textstats.FLEISS_MIN_MTL
        )
        k = r1 + r2 + r3
        s6 += k * (k - 1) + (3 - k) * (2 - k)
        spos += k
        c1, c2, c3 = c1 + r1, c2 + r2, c3 + r3
    pbar = s6 / (6.0 * n)
    ppos = spos / (3.0 * n)
    pe = ppos * ppos + (1 - ppos) ** 2
    kappa = (pbar - pe) / (1 - pe)
    assert (out.n_docs, out.n_pos_r1, out.n_pos_r2, out.n_pos_r3) == (
        n, c1, c2, c3,
    )
    assert abs(out.p_bar - pbar) < 1e-6
    assert abs(out.p_e - pe) < 1e-6
    assert abs(out.kappa - kappa) < 1e-6
    # raters are non-degenerate in the fixture
    assert 0 < c1 < n and 0 < c2 < n and 0 < c3 < n


def test_information_gain_recompute(spark, sf_dir):
    out = parity.information_gain_features(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = ev.ts.values.astype("datetime64[us]").astype("int64")
    feats = {
        "hour4": ((us // 3_600_000_000) % 24) // 6,
        "dow7": (us // 86_400_000_000) % 7,
        "val4": [min(3, int(v // 100)) for v in ev.value],
    }
    y = (ev.event_type == "purchase").astype(int).values
    n = len(ev)

    def ent(counts):
        return sum(
            sorted(round(-(c / n) * math.log(c / n), 12) for c in counts)
        )

    h_y = ent(Counter(y).values())
    for feat, xs in feats.items():
        cells = Counter(zip(xs, y))
        xtab = Counter(xs)
        hc = sum(
            sorted(
                round(
                    (xtab[x] / n) * -((c / xtab[x]) * math.log(c / xtab[x])),
                    12,
                )
                for (x, _), c in cells.items()
            )
        )
        hx = ent(xtab.values())
        row = out[out.feature == feat].iloc[0]
        assert row.n_values == len(xtab)
        assert abs(row.h_y - h_y) < 1e-6
        assert abs(row.h_y_given_x - hc) < 1e-6
        assert abs(row.info_gain - (h_y - hc)) < 1e-6
        assert abs(row.gain_ratio - (h_y - hc) / hx) < 1e-6
        # conditioning never increases entropy
        assert row.info_gain >= -1e-9


def test_shift_share_recompute(spark, sf_dir):
    out = relational.revenue_shift_share(spark, sf_dir).toPandas()
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    o = orders.merge(
        cust[["c_custkey", "c_nationkey"]],
        left_on="o_custkey",
        right_on="c_custkey",
    )
    y1 = (o.o_orderdate >= relational.SHIFT_SHARE_Y1[0]) & (
        o.o_orderdate < relational.SHIFT_SHARE_Y1[1]
    )
    y2 = (o.o_orderdate >= relational.SHIFT_SHARE_Y2[0]) & (
        o.o_orderdate < relational.SHIFT_SHARE_Y2[1]
    )
    from decimal import Decimal

    def dsum(vals):
        return sum(
            (Decimal(str(round(v, 2))) for v in vals), Decimal(0)
        )

    r = {}
    for (nk, pr), grp in o.groupby(["c_nationkey", "o_orderpriority"]):
        r[(nk, pr)] = (
            dsum(grp[y1.loc[grp.index]].o_totalprice),
            dsum(grp[y2.loc[grp.index]].o_totalprice),
        )
    t1 = sum(v[0] for v in r.values())
    t2 = sum(v[1] for v in r.values())
    G = float(t2) / float(t1) - 1.0
    p1 = Counter()
    p2 = Counter()
    for (nk, pr), (a, b) in r.items():
        p1[pr] += a
        p2[pr] += b
    for row in out.itertuples():
        nk = int(
            nation[nation.n_name == row.n_name].n_nationkey.iloc[0]
        )
        rev1 = sum(v[0] for (k, pr), v in zip(r.keys(), r.values()) if k == nk)
        rev2 = sum(v[1] for (k, pr), v in zip(r.keys(), r.values()) if k == nk)
        mix = sum(
            sorted(
                round(
                    float(a)
                    * ((float(p2[pr]) / float(p1[pr]) - 1.0) - G),
                    12,
                )
                for (k, pr), (a, b) in r.items()
                if k == nk and p1[pr] > 0
            )
        )
        assert abs(row.rev1 - float(rev1)) < 1e-2
        assert abs(row.rev2 - float(rev2)) < 1e-2
        assert abs(row.actual_delta - float(rev2 - rev1)) < 1e-2
        assert abs(row.national_term - float(rev1) * G) < 1e-3
        assert abs(row.mix_term - mix) < 1e-3
        # the decomposition is exact: terms sum to the actual delta
        assert (
            abs(
                row.actual_delta
                - (row.national_term + row.mix_term + row.shift_term)
            )
            < 2e-3
        )
