"""Tests: round-3 session-7 batch 9 (mget / intervals / cumulative
cardinality / moving_fn / geo box / geotile grid / HLL cardinality) —
invariants beyond the DuckDB oracle gate."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, parity, textstats


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _events(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def _md5_52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def test_mget_returns_exact_stored_fields(spark, sf_dir):
    out = fulltext.mget_docstore(spark, sf_dir).toPandas()
    docs = _docs(sf_dir).sort_values("doc_id")
    exp = docs.head(fulltext.MGET_N).set_index("doc_id")
    assert list(out["doc_id"]) == list(exp.index)
    for _, r in out.iterrows():
        assert r["lang"] == exp.loc[r["doc_id"], "lang"]
        assert r["text_md5"] == hashlib.md5(
            exp.loc[r["doc_id"], "text"].encode()
        ).hexdigest()


def test_intervals_matches_bruteforce(spark, sf_dir):
    first, any_of, gaps = fulltext.INTERVALS
    out = set(fulltext.intervals_query(spark, sf_dir).toPandas()["doc_id"])
    exp = set()
    for d, t in zip(_docs(sf_dir)["doc_id"], _docs(sf_dir)["text"]):
        toks = tokenize_string(t)
        ps = [i for i, x in enumerate(toks) if x == first]
        qs = [j for j, x in enumerate(toks) if x in any_of]
        if any(q > p and q - p - 1 <= gaps for p in ps for q in qs):
            exp.add(d)
    assert out == exp
    # ordered: a doc where the alt only PRECEDES `first` must not match
    # (the unordered span family would accept it) — verified by exp above


def test_cumulative_cardinality_monotone_and_exact(spark, sf_dir):
    out = parity.cumulative_cardinality_pipeline(spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    ev = ev.assign(day=ev["ts"].dt.floor("D").dt.date)
    assert (out["cum_users"].diff().dropna() >= 0).all()
    assert out["cum_users"].iloc[-1] == ev["user_id"].nunique()
    # spot-check a middle day with a true distinct-to-date count
    mid = out.iloc[len(out) // 2]
    seen = ev.loc[ev["day"] <= pd.to_datetime(mid["day"]).date(), "user_id"]
    assert mid["cum_users"] == seen.nunique()


def test_moving_fn_trailing_window_excludes_current(spark, sf_dir):
    out = parity.moving_fn_pipeline(spark, sf_dir).toPandas()
    n = out["n_events"].tolist()
    wsize = parity.MOVING_FN_WINDOW
    for i in range(len(n)):
        frame = n[max(0, i - wsize) : i]
        assert out["mov_max"].iloc[i] == (max(frame) if frame else 0)
        assert out["mov_min"].iloc[i] == (min(frame) if frame else 0)
        exp_avg = sum(frame) / len(frame) if frame else 0.0
        assert math.isclose(out["mov_avg"].iloc[i], exp_avg, abs_tol=1e-6)


def test_geo_box_hits_are_inside_and_complete(spark, sf_dir):
    out = fulltext  # noqa: F841  (module ref kept for symmetry)
    res = textstats.geo_bounding_box_query(spark, sf_dir).toPandas()
    lat_lo, lat_hi, lon_lo, lon_hi = textstats.GEO_BOX
    assert (res["lat"].between(lat_lo, lat_hi)).all()
    assert (res["lon"].between(lon_lo, lon_hi)).all()
    # recompute coordinates by hand for the returned docs (itertuples:
    # iterrows would coerce doc_id to float and corrupt the hash input)
    for r in res.itertuples():
        lat = (_md5_52(f"{int(r.doc_id)}:lat") % 1800001) / 10000.0 - 90.0
        lon = (_md5_52(f"{int(r.doc_id)}:lon") % 3600001) / 10000.0 - 180.0
        assert math.isclose(r.lat, round(lat, 4), abs_tol=1e-9)
        assert math.isclose(r.lon, round(lon, 4), abs_tol=1e-9)


def test_geotile_counts_cover_corpus(spark, sf_dir):
    res = textstats.geotile_grid_agg(spark, sf_dir, k=10_000).toPandas()
    docs = _docs(sf_dir)
    assert res["n_docs"].sum() == len(docs)
    z = textstats.GEOTILE_ZOOM
    for t in res["tile"]:
        zz, x, y = t.split("/")
        assert int(zz) == z
        assert 0 <= int(x) < (1 << z) and 0 <= int(y) < (1 << z)


def test_hll_estimate_within_expected_error(spark, sf_dir):
    out = textstats.hll_cardinality(spark, sf_dir).toPandas().iloc[0]
    # p=12 -> ~1.6% typical error; allow generous 10% for small vocab
    assert out["n_exact"] > 0
    assert out["rel_err"] <= 0.10
    assert out["used"] <= 1 << textstats.HLL_P
    # recompute registers by hand
    toks = set()
    for t in _docs(sf_dir)["text"]:
        toks.update(tokenize_string(t))
    assert out["n_exact"] == len(toks)
    regs: dict[int, int] = {}
    for term in toks:
        h = _md5_52(term)
        b, w = h >> 40, h & ((1 << 40) - 1)
        rho = 41 if w == 0 else 40 - (w.bit_length() - 1)
        regs[b] = max(regs.get(b, 0), rho)
    assert out["used"] == len(regs)
