"""Tests: round-4 session-17 batch 111 — ratio-metric delta method, SRM
check, Yule's K."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity, textstats


def _arm(uid: int, salt: str) -> str:
    h = hashlib.md5(f"{uid}{salt}".encode()).hexdigest()[:13]
    return "A" if int(h, 16) % 2 == 0 else "B"


def test_ratio_metric_delta_method_recompute(spark, sf_dir):
    out = parity.ratio_metric_delta_method(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    per = ev.groupby("user_id").apply(
        lambda g: pd.Series(
            {
                "y": round(
                    g.loc[g.event_type == "purchase", "value"]
                    .round(2)
                    .sum(),
                    2,
                ),
                "n": len(g),
            }
        ),
        include_groups=False,
    )
    stats = {}
    for arm, g in per.groupby(
        [_arm(u, ":ratio") for u in per.index]
    ):
        u = len(g)
        sy, sn = g.y.sum(), g.n.sum()
        r = sy / sn
        mu_y, mu_n = sy / u, sn / u
        vy = (g.y**2).sum() / u - mu_y**2
        vn = (g.n**2).sum() / u - mu_n**2
        cyn = (g.y * g.n).sum() / u - mu_y * mu_n
        var_r = (vy - 2 * r * cyn + r * r * vn) / (u * mu_n * mu_n)
        stats[arm] = (u, r, math.sqrt(var_r))
    assert (out.n_a, out.n_b) == (stats["A"][0], stats["B"][0])
    assert abs(out.ratio_a - stats["A"][1]) < 1e-6
    assert abs(out.ratio_b - stats["B"][1]) < 1e-6
    assert abs(out.se_a - stats["A"][2]) < 1e-6
    assert abs(out.se_b - stats["B"][2]) < 1e-6
    z = (round(stats["A"][1], 6) - round(stats["B"][1], 6)) / math.sqrt(
        round(stats["A"][2], 6) ** 2 + round(stats["B"][2], 6) ** 2
    )
    assert abs(out.z - z) < 1e-3
    # A/A-style split of the same generator: no real effect expected
    assert abs(out.z) < 4.0


def test_srm_check_recompute(spark, sf_dir):
    out = parity.srm_check(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    arms = pd.Series(
        [_arm(u, ":srm") for u in ev.user_id.unique()]
    ).value_counts()
    na, nb = int(arms.get("A", 0)), int(arms.get("B", 0))
    assert (out.n_a, out.n_b) == (na, nb)
    chi2 = (na - nb) ** 2 / (na + nb)
    assert abs(out.chi2 - chi2) < 1e-6
    assert bool(out.srm_flag) == (round(chi2, 6) > 3.841459)
    # honest 50/50 hash split: must NOT flag
    assert not bool(out.srm_flag)


def test_yules_k_recompute(spark, sf_dir):
    out = textstats.yules_k_by_source(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = {r.source: r for r in out.itertuples()}
    cnt_corpus: dict[str, int] = {}
    for src, g in docs.groupby("source"):
        cnt: dict[str, int] = {}
        for t in g.text:
            for tok in tokenize_string(t):
                cnt[tok] = cnt.get(tok, 0) + 1
                cnt_corpus[tok] = cnt_corpus.get(tok, 0) + 1
        n = sum(cnt.values())
        s2 = sum(c * c for c in cnt.values())
        r = rows[src]
        assert (r.n_tokens, r.vocab) == (n, len(cnt))
        assert abs(r.yules_k - 1e4 * (s2 - n) / n**2) < 1e-5
    n = sum(cnt_corpus.values())
    s2 = sum(c * c for c in cnt_corpus.values())
    r = rows["(corpus)"]
    assert (r.n_tokens, r.vocab) == (n, len(cnt_corpus))
    assert abs(r.yules_k - 1e4 * (s2 - n) / n**2) < 1e-5
