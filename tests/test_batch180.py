"""Tests: round-4 session-18 batch 180 — TOST, DL meta, Menzerath."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity, textstats


def test_tost_recompute(spark, sf_dir):
    out = parity.tost_equivalence_test(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ed = ev.ts.astype("int64") // 86_400_000_000
    ud = (
        ev.assign(ed=ed)
        .groupby(["user_id", "ed"])
        .event_type.apply(lambda s: int((s == "purchase").any()))
        .reset_index(name="y")
    )
    arm = ud.user_id.map(
        lambda u: int(hashlib.md5(f"lr:{u}".encode()).hexdigest()[:13], 16)
        % 2
    )
    n0, n1 = int((arm == 0).sum()), int((arm == 1).sum())
    p0 = ud.y[arm == 0].mean()
    p1 = ud.y[arm == 1].mean()
    d = p0 - p1
    se = math.sqrt(p0 * (1 - p0) / n0 + p1 * (1 - p1) / n1)
    zl, zu = (d + parity.TOST_MARGIN) / se, (parity.TOST_MARGIN - d) / se
    assert (out.n0, out.n1) == (n0, n1)
    assert abs(out.rate_diff - d) < 1e-6
    assert abs(out.z_lower - zl) < 1e-4
    assert abs(out.z_upper - zu) < 1e-4
    assert out.equivalent == int(zl > 1.645 and zu > 1.645)


def test_dersimonian_laird_recompute(spark, sf_dir):
    out = parity.dersimonian_laird_re(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    lnors, vs = [], []
    for _, g in docs.groupby("lang"):
        a = b = c = d = 0
        for txt in g.text:
            toks = set(tokenize_string(txt))
            e = parity.MH_EXPOSURE_TOKEN in toks
            o = parity.MH_OUTCOME_TOKEN in toks
            if e and o:
                a += 1
            elif e:
                b += 1
            elif o:
                c += 1
            else:
                d += 1
        ah, bh, ch, dh = a + 0.5, b + 0.5, c + 0.5, d + 0.5
        lnors.append(math.log(ah * dh / (bh * ch)))
        vs.append(1 / ah + 1 / bh + 1 / ch + 1 / dh)
    w = [1 / v for v in vs]
    k = len(w)
    pooled = sum(wi * li for wi, li in zip(w, lnors)) / sum(w)
    q = sum(wi * (li - pooled) ** 2 for wi, li in zip(w, lnors))
    cc = sum(w) - sum(wi**2 for wi in w) / sum(w)
    tau2 = max(0.0, (q - (k - 1)) / cc)
    ws = [1 / (v + tau2) for v in vs]
    mu = sum(wi * li for wi, li in zip(ws, lnors)) / sum(ws)
    se = 1 / math.sqrt(sum(ws))
    assert out.k == k
    assert abs(out.q_het - q) < 1e-4
    assert abs(out.tau2 - tau2) < 1e-5
    assert abs(out.re_pooled_lnor - mu) < 1e-5
    assert abs(out.re_pooled_or - math.exp(mu)) < 1e-4
    assert abs(out.ci_lower_or - math.exp(mu - 1.96 * se)) < 1e-4
    assert abs(out.ci_upper_or - math.exp(mu + 1.96 * se)) < 1e-4


def test_menzerath_recompute(spark, sf_dir):
    out = textstats.menzerath_altmann_fit(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    us, ws = [], []
    for txt in docs.text:
        toks = tokenize_string(txt)
        if not toks:
            continue
        us.append(math.log(len(toks)))
        ws.append(math.log(sum(len(t) for t in toks) / len(toks)))
    b, a = np.polyfit(us, ws, 1)
    r = np.corrcoef(us, ws)[0, 1]
    assert out.n_docs == len(us)
    assert abs(out.ma_slope_b - b) < 1e-5
    assert abs(out.ln_a - a) < 1e-5
    assert abs(out.r2 - r * r) < 1e-5
