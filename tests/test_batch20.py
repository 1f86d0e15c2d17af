"""Tests: round-4 session-10 batch 20 (ip_prefix / geo_line / lexical
diversity / cumulative_sum / bucket_correlation / sparse_vector /
significant_text / exists) — invariants beyond the DuckDB oracle gate."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, parity, textstats


def _md5_52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def _events(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_ip_prefix_partitions_the_stream(spark, sf_dir):
    out = textstats.ip_prefix_agg(spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    assert out["n_events"].sum() == len(ev)
    assert ((out["bucket"] >= 0) & (out["bucket"] < 256)).all()
    assert (out["key"] == out["bucket"].astype(str) + ".0.0.0/8").all()
    # recompute one bucket by hand off the md5 contract
    b0 = int(out["bucket"].iloc[0])
    want = sum(
        1
        for u in ev.itertuples()
        if (_md5_52(f"{u.user_id}:ip") % (1 << 32)) >> 24 == b0
    )
    assert int(out.loc[out["bucket"] == b0, "n_events"].iloc[0]) == want


def test_geo_line_head_points_in_stream_order(spark, sf_dir):
    out = textstats.geo_line_agg(spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    assert (out["n_points"] <= textstats.GEO_LINE_SIZE).all()
    assert (out["line"].str.count(r"\|") + 1 == out["n_points"]).all()
    # recompute track 0's line by hand
    grp = ev[ev["user_id"] % textstats.GEO_LINE_TRACKS == 0].sort_values(
        ["ts", "event_id"]
    ).head(textstats.GEO_LINE_SIZE)
    pts = [
        f"{_md5_52(f'{int(e)}:elat') % 1800001 - 900000},"
        f"{_md5_52(f'{int(e)}:elon') % 3600001 - 1800000}"
        for e in grp["event_id"]
    ]
    assert out.loc[out["track_id"] == 0, "line"].iloc[0] == "|".join(pts)


def test_lexical_diversity_recompute(spark, sf_dir):
    out = textstats.lexical_diversity(spark, sf_dir).toPandas()
    docs = _docs(sf_dir).sort_values("doc_id").reset_index(drop=True)
    assert len(out) == len(docs)
    assert ((out["n_types"] <= out["n_tokens"]) | out["ttr"].isna()).all()
    row = out.iloc[0]
    toks = tokenize_string(docs["text"].iloc[0])
    assert row["n_tokens"] == len(toks)
    assert row["n_types"] == len(set(toks))
    assert abs(row["ttr"] - round(len(set(toks)) / len(toks), 6)) < 1e-9


def test_cumulative_sum_monotone_and_total(spark, sf_dir):
    out = parity.cumulative_sum_pipeline(spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    assert int(out["cum_events"].iloc[-1]) == len(ev)
    assert (out["cum_events"].diff().dropna() >= 0).all()
    assert (out["cum_events"] == out["n_events"].cumsum()).all()


def test_bucket_correlation_matches_numpy(spark, sf_dir):
    out = parity.bucket_correlation_agg(spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    day = ev["ts"].dt.date
    g = ev.assign(day=day, v=ev["value"].round(6)).groupby("day").agg(
        x=("v", "size"), y=("v", "sum")
    )
    want = np.corrcoef(g["x"].to_numpy(float), g["y"].to_numpy(float))[0, 1]
    assert int(out["n_buckets"].iloc[0]) == len(g)
    assert abs(out["corr"].iloc[0] - want) < 1e-6
    assert abs(out["corr"].iloc[0]) <= 1.0


def test_sparse_vector_scores_recompute(spark, sf_dir):
    out = fulltext.sparse_vector_topk(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    w = fulltext.SPARSE_QUERY_WEIGHTS
    scores = {}
    for r in docs.itertuples():
        s = sum(w.get(t, 0) for t in tokenize_string(r.text))
        if s > 0:
            scores[int(r.doc_id)] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[
        : fulltext.SPARSE_TOPK
    ]
    got = list(zip(out["doc_id"].astype(int), out["score_milli"].astype(int)))
    assert got == want
    assert (out["rank"] == range(1, len(out) + 1)).all()


def test_significant_text_lift_bounds(spark, sf_dir):
    out = fulltext.significant_text_agg(spark, sf_dir).toPandas()
    assert (out["df_fg"] <= out["df_bg"]).all()
    assert (out["df_fg"] >= fulltext.SIGTEXT_MIN_DF).all()
    assert (out["lift"] > 0).all()
    assert fulltext.SIGTEXT_TERM not in set(out["term"])
    # lift sorted desc with term asc tiebreak, rank sequential
    key = list(zip(-out["lift"], out["term"]))
    assert key == sorted(key)


def test_significant_text_dedups_exact_copies(spark, sf_dir, tmp_path):
    """filter_duplicate_text: planting N exact copies of one doc must not
    change the stats at all (the copies collapse to the original)."""
    docs = _docs(sf_dir)
    dup = pd.concat(
        [docs]
        + [docs.iloc[[0]].assign(doc_id=docs["doc_id"].max() + 1 + i) for i in range(3)],
        ignore_index=True,
    )
    d = tmp_path / "dup"
    d.mkdir()
    for t in ("documents",):
        dup.to_parquet(d / f"{t}.parquet", index=False)
    base = fulltext.significant_text_agg(spark, sf_dir).toPandas()
    spiked = fulltext.significant_text_agg(spark, str(d)).toPandas()
    pd.testing.assert_frame_equal(base, spiked)


def test_exists_counts_cover_corpus(spark, sf_dir):
    out = fulltext.exists_query(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    per_lang = docs.groupby("lang").size()
    for r in out.itertuples():
        assert r.n_exists + r.n_missing == per_lang[r.lang]
    a, b = fulltext.EXISTS_FIELD_VALUES
    n_exists = sum(
        1
        for t in docs["text"]
        if a in tokenize_string(t) or b in tokenize_string(t)
    )
    assert int(out["n_exists"].sum()) == n_exists


def test_bucket_count_ks_recompute(spark, sf_dir):
    out = parity.bucket_count_ks_test(spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    days = ev["ts"].dt.date
    cal = pd.date_range(days.min(), days.max(), freq="D").date
    counts = days.value_counts().reindex(cal, fill_value=0).sort_index()
    cum = counts.cumsum().to_numpy(float) / counts.sum()
    idx = np.arange(1, len(cal) + 1, dtype=float) / len(cal)
    want = round(float(np.abs(cum - idx).max()), 6)
    assert int(out["n_days"].iloc[0]) == len(cal)
    assert abs(out["d_stat"].iloc[0] - want) < 1e-9
    assert 0.0 <= out["d_stat"].iloc[0] <= 1.0


def test_variable_width_histogram_recompute(spark, sf_dir):
    out = textstats.variable_width_histogram_agg(spark, sf_dir).toPandas()
    docs = _docs(sf_dir).sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
    v = docs["n_chars"].to_numpy("int64")
    n, k = len(v), textstats.VWH_K
    cents = [(i, float(v[((2 * i + 1) * n) // (2 * k)])) for i in range(k)]

    def assign(cs):
        d = np.abs(v[None, :].astype(float) - np.array([c for _, c in cs])[:, None])
        return np.array([cs[j][0] for j in d.argmin(axis=0)])  # argmin: first (lowest cid) wins ties

    cid = assign(cents)
    cents = sorted(
        (c, v[cid == c].sum() / float((cid == c).sum()))
        for c in np.unique(cid)
    )
    cid = assign(cents)
    assert int(out["n_docs"].sum()) == n
    for b in out.itertuples():
        sel = v[cid == b.bucket]
        assert (b.n_docs, b.v_min, b.v_max) == (len(sel), sel.min(), sel.max())
        assert abs(b.mean - round(sel.sum() / float(len(sel)), 6)) < 1e-9


def test_dfr_scores_recompute(spark, sf_dir):
    out = fulltext.dfr_topk(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    import math

    toks = {int(r.doc_id): tokenize_string(r.text) for r in docs.itertuples()}
    n_docs = float(len(docs))
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    qts = sorted(set(tokenize_string(fulltext.FLAGSHIP_QUERY)))
    cf = {
        q: float(sum(t.count(q) for t in toks.values())) for q in qts
    }
    scores = {}
    for d, t in toks.items():
        s = 0.0
        for q in qts:  # ascending-term sequential accumulation
            tf = t.count(q)
            if not tf or not cf[q]:
                continue
            tfn = tf * (math.log(1.0 + avgdl / len(t)) * fulltext.DFR_INV_LN2)
            info = math.log(1.0 + (n_docs + 1.0) / (cf[q] + 0.5)) * fulltext.DFR_INV_LN2
            s += tfn * info / (1.0 + tfn)
        if s > 0.0:
            scores[d] = round(s, 6)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = list(zip(out["doc_id"].astype(int), out["score"]))
    assert [d for d, _ in got] == [d for d, _ in want]
    assert all(abs(a - b) < 1e-9 for (_, a), (_, b) in zip(got, want))
