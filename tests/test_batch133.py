"""Tests: round-4 session-17 batch 133 — result diversity, Poisson
dispersion, DPP benefit."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity, relational, similarity


def test_ild_recompute(spark, sf_dir):
    out = similarity.result_diversity_ild(spark, sf_dir).toPandas().iloc[0]
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qv = np.array(
        emb[emb.vec_id == similarity.QUERY_VEC_ID].embedding.iloc[0],
        dtype=np.float64,
    )
    scored = []
    for r in emb[emb.vec_id != similarity.QUERY_VEC_ID].itertuples():
        v = np.array(r.embedding, dtype=np.float64)
        c = float(np.dot(v, qv)) / (
            math.sqrt(float(np.dot(v, v))) * math.sqrt(float(np.dot(qv, qv)))
        )
        scored.append((round(c, 6), int(r.vec_id)))
    page = [
        vid
        for _, vid in sorted(scored, key=lambda t: (-t[0], t[1]))[
            : similarity.ILD_K
        ]
    ]
    vecs = {
        int(r.vec_id): np.array(r.embedding, dtype=np.float64)
        for r in emb[emb.vec_id.isin(page)].itertuples()
    }
    cs = []
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            va, vb = vecs[a], vecs[b]
            c = float(np.dot(va, vb)) / (
                math.sqrt(float(np.dot(va, va)))
                * math.sqrt(float(np.dot(vb, vb)))
            )
            cs.append(round(c, 6))
    assert (out.k, out.n_pairs) == (
        similarity.ILD_K,
        len(page) * (len(page) - 1) // 2,
    )
    assert abs(out.mean_ild - (1.0 - sum(cs) / len(cs))) < 1e-6
    assert abs(out.min_pair_cos - min(cs)) < 1e-6
    assert abs(out.max_pair_cos - max(cs)) < 1e-6
    assert 0 <= out.mean_ild <= 2


def test_poisson_dispersion_recompute(spark, sf_dir):
    out = parity.poisson_dispersion_test(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    days = ev.ts.dt.normalize()
    cal = pd.date_range(days.min(), days.max(), freq="D")
    types = sorted(ev.event_type.unique()) + ["all"]
    assert list(out.event_type) == sorted(types)
    for t in types:
        sub = ev if t == "all" else ev[ev.event_type == t]
        y = (
            sub.ts.dt.normalize().value_counts()
            .reindex(cal, fill_value=0)
            .sort_index()
        )
        n = len(y)
        mean = y.mean()
        var = y.var(ddof=1)
        d = (n - 1) * var / mean
        row = out[out.event_type == t].iloc[0]
        assert row.n == n
        assert abs(row.mean_daily - mean) < 1e-6
        assert abs(row.var_daily - var) < 1e-5
        assert abs(row.dispersion_stat - d) < 1e-4
        assert row.overdispersed == int(d > parity.POISSON_CHI2_CRIT_DF29)


def _ntile(n, k):
    base, extra = divmod(n, k)
    out = []
    for b in range(1, k + 1):
        out.extend([b] * (base + (1 if b <= extra else 0)))
    return out


def test_dpp_recompute(spark, sf_dir):
    out = relational.dpp_benefit_audit(spark, sf_dir).toPandas().iloc[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    keys = set(
        orders[
            (orders.o_orderpriority == relational.DPP_PRIORITY)
            & (orders.o_orderdate >= relational.DPP_WINDOW[0])
            & (orders.o_orderdate < relational.DPP_WINDOW[1])
        ].o_orderkey
    )
    srt = li.sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True)
    srt["f"] = _ntile(len(srt), relational.DPP_N_FILES)
    files = srt.groupby("f").agg(
        lo=("l_orderkey", "min"), hi=("l_orderkey", "max"),
        n_rows=("l_orderkey", "size"),
    )
    hit = files[
        files.apply(
            lambda r: any(r.lo <= k <= r.hi for k in keys), axis=1
        )
    ]
    matched = int(li.l_orderkey.isin(keys).sum())
    assert out.n_files == len(files)
    assert out.files_read_dpp == len(hit)
    assert out.files_skipped == len(files) - len(hit)
    assert out.rows_total == len(li)
    assert out.rows_scanned_dpp == int(hit.n_rows.sum())
    assert out.rows_matched == matched
    assert abs(
        out.read_amplification - int(hit.n_rows.sum()) / matched
    ) < 1e-6
    # DPP must actually skip something with a selective probe
    assert out.files_skipped > 0
