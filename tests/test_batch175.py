"""Tests: round-4 session-18 batch 175 — Qini, LMG, covariance ellipse."""

from __future__ import annotations

import hashlib
import math
from itertools import permutations

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity


def test_qini_recompute(spark, sf_dir):
    out = parity.qini_uplift_deciles(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ed = ev.ts.astype("int64") // 86_400_000_000
    ud = (
        ev.assign(ed=ed)
        .groupby(["user_id", "ed"])
        .agg(
            y=("event_type", lambda s: int((s == "purchase").any())),
            mv=("value", "max"),
        )
        .reset_index()
    )
    ud["t"] = ud.user_id.map(
        lambda u: int(hashlib.md5(f"lr:{u}".encode()).hexdigest()[:13], 16)
        % 2
    )
    ud["p"] = ud.mv / (ud.mv + 50.0)
    ud = ud.sort_values(
        ["p", "user_id", "ed"], ascending=[False, True, True]
    ).reset_index(drop=True)
    n = len(ud)
    # ntile semantics: first (n % 10) buckets get ceil(n/10) rows
    sizes = [n // 10 + (1 if i < n % 10 else 0) for i in range(10)]
    idx = 0
    cnt = cyt = cnc = cyc = 0
    for d, sz in enumerate(sizes, start=1):
        chunk = ud.iloc[idx : idx + sz]
        idx += sz
        cnt += int((chunk.t == 1).sum())
        cyt += int(chunk.y[chunk.t == 1].sum())
        cnc += int((chunk.t == 0).sum())
        cyc += int(chunk.y[chunk.t == 0].sum())
        row = out[out.decile == d].iloc[0]
        assert (row.cum_treated, row.cum_control) == (cnt, cnc)
        assert (row.cum_treated_resp, row.cum_control_resp) == (cyt, cyc)
        assert abs(row.qini - (cyt - cyc * cnt / cnc)) < 1e-5


def test_lmg_recompute(spark, sf_dir):
    out = parity.lmg_relative_importance(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    X = np.column_stack(
        [
            li.l_discount.round(2),
            li.l_quantity.round(2),
            li.l_tax.round(2),
        ]
    )
    y = li.l_extendedprice.round(2).to_numpy()

    def r2_subset(cols):
        if not cols:
            return 0.0
        A = np.column_stack([np.ones(len(y))] + [X[:, c] for c in cols])
        beta, *_ = np.linalg.lstsq(A, y, rcond=None)
        pred = A @ beta
        return 1 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()

    lmg = {0: 0.0, 1: 0.0, 2: 0.0}
    for perm in permutations(range(3)):
        seen = []
        for c in perm:
            before = r2_subset(seen)
            seen.append(c)
            lmg[c] += (r2_subset(seen) - before) / 6
    full = r2_subset([0, 1, 2])
    names = {"discount": 0, "quantity": 1, "tax": 2}
    for row in out.itertuples():
        i = names[row.feature]
        assert abs(row.r2_alone - r2_subset([i])) < 1e-4
        assert abs(row.lmg_share - lmg[i]) < 1e-4
        assert abs(row.r2_full - full) < 1e-4
    # LMG shares decompose the full R² exactly
    assert abs(out.lmg_share.sum() - full) < 1e-4


def test_ellipse_recompute(spark, sf_dir):
    out = parity.covariance_ellipse_2d(spark, sf_dir).toPandas().iloc[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    x = li.l_quantity.round(2).to_numpy()
    y = li.l_extendedprice.round(2).to_numpy()
    cov = np.cov(x, y)
    evals = np.linalg.eigvalsh(cov)
    l1, l2 = evals[1], evals[0]
    assert out.n_rows == len(x)
    assert abs(out.var_x - cov[0, 0]) < 1e-4
    assert abs(out.cov_xy - cov[0, 1]) < 1e-4
    assert abs(out.lambda1 - l1) < 1e-3
    assert abs(out.lambda2 - l2) < 1e-3
    want_angle = math.atan2(2 * cov[0, 1], cov[0, 0] - cov[1, 1]) / 2
    assert abs(out.angle_rad - want_angle) < 1e-5
    assert abs(out.explained_share - l1 / (l1 + l2)) < 1e-5
    assert 0.5 <= out.explained_share <= 1.0
