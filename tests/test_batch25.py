"""Tests: round-4 session-11 batch 25 (two-sample KS, Gini, burstiness,
seasonal anomalies, bottom-k reservoir) — independent recomputes."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity, textstats


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _events(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def _md5_52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def test_ks_two_sample_recompute(spark, sf_dir):
    out = parity.ks_two_sample(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    a = np.sort(docs[docs["source"] == parity.KS_SRC_A]["n_chars"].to_numpy())
    b = np.sort(docs[docs["source"] == parity.KS_SRC_B]["n_chars"].to_numpy())
    pooled = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, pooled, side="right") / len(a)
    fb = np.searchsorted(b, pooled, side="right") / len(b)
    want = round(float(np.abs(fa - fb).max()), 6)
    row = out.iloc[0]
    assert (int(row.n_a), int(row.n_b)) == (len(a), len(b))
    assert abs(row.d_stat - want) < 1e-9
    # scipy-free sanity: D in (0, 1]
    assert 0.0 < row.d_stat <= 1.0


def test_seasonal_anomaly_recompute(spark, sf_dir):
    out = parity.seasonal_anomaly_days(spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    days = ev["ts"].dt.date
    cal = pd.date_range(days.min(), days.max(), freq="D").date
    counts = days.value_counts().reindex(cal, fill_value=0).sort_index()
    anchor = pd.Timestamp("2024-01-01").date()
    dow = np.array([(d - anchor).days % 7 for d in counts.index])
    n = counts.to_numpy(float)
    assert len(out) == len(cal)
    for w in range(7):
        sel = n[dow == w]
        med = float(np.quantile(sel, 0.5))  # type-7 == percentile/quantile_cont
        mad = float(np.quantile(np.abs(sel - med), 0.5))
        rows = out[out["dow"] == w]
        assert (rows["med"] == round(med, 6)).all()
        assert (rows["mad"] == round(mad, 6)).all()
        want_flags = np.abs(rows["n_events"].to_numpy(float) - med) > (
            parity.ANOMALY_SIGMA * mad
        )
        assert (rows["is_anomaly"].to_numpy() == want_flags).all()


def test_gini_recompute(spark, sf_dir):
    out = textstats.gini_coefficient(spark, sf_dir).toPandas()
    from collections import Counter

    cf = Counter()
    for t in _docs(sf_dir)["text"]:
        cf.update(tokenize_string(t))
    vals = np.array(
        [c for _, c in sorted(cf.items(), key=lambda kv: (kv[1], kv[0]))],
        dtype=float,
    )
    n = len(vals)
    i = np.arange(1, n + 1, dtype=float)
    want = round((2.0 * float((i * vals).sum()) - (n + 1) * vals.sum())
                 / (n * vals.sum()), 6)
    row = out.iloc[0]
    assert int(row.n_terms) == n
    assert int(row.total_tokens) == int(vals.sum())
    assert abs(row.gini - want) < 1e-9
    assert 0.0 <= row.gini < 1.0


def test_burstiness_recompute(spark, sf_dir):
    out = textstats.term_burstiness(spark, sf_dir).toPandas()
    from collections import defaultdict

    tfs: dict[str, list[int]] = defaultdict(list)
    for t in _docs(sf_dir)["text"]:
        from collections import Counter

        for term, c in Counter(tokenize_string(t)).items():
            tfs[term].append(c)
    scored = []
    for term, lst in tfs.items():
        df = len(lst)
        if df < textstats.BURSTINESS_MIN_DF:
            continue
        s1, s2 = sum(lst), sum(v * v for v in lst)
        scored.append((term, df, s1, round((df * s2 - s1 * s1) / (df * s1), 6)))
    scored.sort(key=lambda t: (-t[3], t[0]))
    want = scored[: textstats.BURSTINESS_TOPK]
    got = list(
        zip(out["term"], out["df"].astype(int), out["total_tf"].astype(int),
            out["vmr"])
    )
    assert [g[:3] for g in got] == [w[:3] for w in want]
    assert all(abs(g[3] - w[3]) < 1e-9 for g, w in zip(got, want))


def test_reservoir_sample_recompute(spark, sf_dir):
    out = textstats.reservoir_sample_per_lang(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    n = textstats.RESERVOIR_PER_LANG
    for lang, grp in docs.groupby("lang"):
        pri = sorted(
            (_md5_52(f"{int(d)}:rsv"), int(d)) for d in grp["doc_id"]
        )[:n]
        rows = out[out["lang"] == lang].sort_values("rank")
        assert list(rows["doc_id"].astype(int)) == [d for _, d in pri]
        assert list(rows["pri"].astype(int)) == [p for p, _ in pri]
    assert (out.groupby("lang").size() == n).all()
