"""Tests: round-3 session-6 batch 5 (date histogram / pipeline aggs /
multi+rare terms / pinned / span-containing / feature queries / sharded
terms accounting / PII scrub / frequency cap / mixture weights) —
invariants beyond the DuckDB oracle gate."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, parity, textstats


def _corpus(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _events(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/events.parquet")


# ------------------------------------------------------------ date histogram
def test_date_histogram_gap_filled_calendar(spark, sf_dir):
    out = parity.date_histogram_facets(spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    days = ev["ts"].dt.floor("D")
    lo, hi = days.min(), days.max()
    # every calendar day present exactly once, in order, zeros included
    expected_days = pd.date_range(lo, hi, freq="D").strftime("%Y-%m-%d")
    assert list(out["day"]) == list(expected_days)
    counts = days.dt.strftime("%Y-%m-%d").value_counts()
    for r in out.itertuples():
        assert r.n_events == int(counts.get(r.day, 0))
    assert out["n_events"].sum() == len(ev)


def test_moving_avg_trailing_frame(spark, sf_dir):
    out = parity.moving_avg_pipeline(spark, sf_dir).toPandas()
    w = parity.MOVING_AVG_WINDOW
    n = list(out["n_events"])
    for i, r in enumerate(out.itertuples()):
        frame = n[max(0, i - w + 1) : i + 1]
        assert r.mov_avg == round(sum(frame) / len(frame), 6)


def test_bucket_selector_is_having_on_mean(spark, sf_dir):
    out = parity.bucket_selector_agg(spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    v = ev["value"].round(6)
    gmean = v.sum() / len(ev)  # float sums: compare with tolerance only
    key = list(zip(out["event_type"], out["day"]))
    assert len(set(key)) == len(key)
    by_bucket = v.groupby(
        [ev["event_type"], ev["ts"].dt.strftime("%Y-%m-%d")]
    ).agg(["sum", "count"])
    cut = parity.BUCKET_SELECTOR_FACTOR * gmean
    kept = {
        k
        for k, row in by_bucket.iterrows()
        if row["sum"] / row["count"] > cut - 1e-9
    }
    dropped = {
        k
        for k, row in by_bucket.iterrows()
        if row["sum"] / row["count"] <= cut - 1e-9
    }
    assert set(key) <= kept
    assert not (set(key) & dropped)
    # selective at this sf: some buckets survive, some don't
    assert 0 < len(out) < len(by_bucket)


def test_weighted_avg_equals_ratio_of_sums(spark, sf_dir):
    out = textstats.weighted_avg_agg(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    dl = docs["text"].map(lambda t: len(tokenize_string(t)))
    for r in out.itertuples():
        m = docs["lang"] == r.lang
        assert r.w_chars_per_token == round(
            int(docs.loc[m, "n_chars"].sum()) / int(dl[m].sum()), 6
        )
        assert r.n_docs == int(m.sum())


# ------------------------------------------------------- terms aggregations
def test_multi_terms_buckets_and_order(spark, sf_dir):
    out = fulltext.multi_terms_agg(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    qts = set(fulltext.BOOLEAN_QUERY.split())
    hits = docs[docs["text"].map(lambda t: bool(qts & set(tokenize_string(t))))]
    exp = Counter(zip(hits["lang"], hits["source"]))
    ranked = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))
    top = ranked[: fulltext.MULTI_TERMS_K]
    assert [(r.lang, r.source, r.n_docs) for r in out.itertuples()] == [
        (lang, src, n) for (lang, src), n in top
    ]
    assert list(out["rank"]) == list(range(1, len(top) + 1))


def test_rare_terms_threshold(spark, sf_dir):
    out = fulltext.rare_terms_agg(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    df = Counter()
    for t in docs["text"]:
        df.update(set(tokenize_string(t)))
    cut = fulltext.RARE_MAX_DF_FRACTION * len(docs)
    exp = sorted(
        ((d, t) for t, d in df.items() if d <= cut),
    )[: fulltext.RARE_TERMS_K]
    assert [(r.df, r.term) for r in out.itertuples()] == exp
    # the synthetic corpus plants exactly one genuinely rare token
    assert "dup" in set(out["term"])


def test_terms_shard_error_bound_semantics(spark, sf_dir):
    out = fulltext.terms_shard_approx(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    ns, ss = fulltext.TERMS_SHARD_N, fulltext.TERMS_SHARD_SIZE
    per_shard: dict[int, Counter] = {s: Counter() for s in range(ns)}
    for r in docs.itertuples():
        per_shard[r.doc_id % ns][r.source] += 1
    reported, tails = {}, {}
    for s, cnt in per_shard.items():
        top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:ss]
        reported[s] = dict(top)
        tails[s] = top[-1][1]
    merged = Counter()
    for s in reported:
        merged.update(reported[s])
    for r in out.itertuples():
        assert r.doc_count == merged[r.source]
        exp_err = sum(
            tails[s] for s in range(ns) if r.source not in reported[s]
        )
        assert r.doc_count_error_upper_bound == exp_err
    # the true count is never above reported + error bound (the ES contract)
    true = Counter(docs["source"])
    for r in out.itertuples():
        assert true[r.source] <= r.doc_count + r.doc_count_error_upper_bound
        assert r.doc_count <= true[r.source]


# ------------------------------------------------------------ pinned query
def test_pinned_leads_then_organic(spark, sf_dir):
    out = fulltext.pinned_query(spark, sf_dir).toPandas()
    n = fulltext.PINNED_N
    assert list(out["rank"]) == list(range(1, 11))
    head = out[out["rank"] <= n]
    assert (head["pinned"] == 1).all()
    docs = _corpus(sf_dir)
    assert list(head["doc_id"]) == sorted(docs["doc_id"])[:n]
    tail = out[out["rank"] > n]
    assert (tail["pinned"] == 0).all()
    # organic tail never re-serves a pinned id
    assert not set(head["doc_id"]) & set(tail["doc_id"])
    # organic tail = BM25 top-(k-n) with pinned ids excluded
    base = fulltext.bm25_topk_documents(spark, sf_dir, k=10 + n).toPandas()
    organic = [d for d in base["doc_id"] if d not in set(head["doc_id"])]
    assert list(tail["doc_id"]) == organic[: 10 - n]


# -------------------------------------------------------------- span family
def test_span_containing_counts_envelopes(spark, sf_dir):
    a, b, dist, c = fulltext.SPAN_CONTAINING
    out = fulltext.span_containing_query(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    exp = {}
    for r in docs.itertuples():
        toks = tokenize_string(r.text)
        pa = [i for i, t in enumerate(toks) if t == a]
        pb = [i for i, t in enumerate(toks) if t == b]
        pc = [i for i, t in enumerate(toks) if t == c]
        n = sum(
            1
            for i in pa
            if any(
                abs(i - j) <= dist
                and any(min(i, j) <= p <= max(i, j) for p in pc)
                for j in pb
            )
        )
        if n:
            exp[r.doc_id] = n
    assert dict(zip(out["doc_id"], out["n_spans"])) == exp
    # containing docs are a subset of the docs holding all three terms
    assert len(exp) > 0


def test_feature_queries_additive_boost(spark, sf_dir):
    """rank_feature / distance_feature = BM25 + bounded additive boost."""
    base = fulltext.bm25_topk_documents(spark, sf_dir, k=500).toPandas()
    scores = dict(zip(base["doc_id"], base["score"]))
    docs = _corpus(sf_dir).set_index("doc_id")

    rf = fulltext.rank_feature_query(spark, sf_dir).toPandas()
    pivot, weight = fulltext.RANK_FEATURE
    for r in rf.itertuples():
        x = float(docs.loc[r.doc_id, "n_chars"])
        expected = scores[r.doc_id] + weight * x / (x + pivot)
        assert abs(r.score - expected) < 2e-6
        # saturation boost is bounded by weight
        assert r.score - scores[r.doc_id] < weight

    dfq = fulltext.distance_feature_query(spark, sf_dir).toPandas()
    origin, pivot, weight = fulltext.DISTANCE_FEATURE
    for r in dfq.itertuples():
        x = float(docs.loc[r.doc_id, "n_chars"])
        expected = scores[r.doc_id] + weight * pivot / (pivot + abs(x - origin))
        assert abs(r.score - expected) < 2e-6
        assert r.score - scores[r.doc_id] <= weight + 1e-9


# --------------------------------------------------------- curation family
def test_pii_redaction_masks_every_match(spark, sf_dir):
    out = textstats.pii_redaction(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    pat = re.compile(textstats.PII_PATTERN)
    assert len(out) == len(docs)
    got = out.set_index("doc_id")
    for r in docs.itertuples():
        clean, n = pat.subn(textstats.PII_MASK.replace("\\", "\\\\"), r.text)
        assert got.loc[r.doc_id, "n_redacted"] == n
        assert (
            got.loc[r.doc_id, "clean_md5"]
            == hashlib.md5(clean.encode()).hexdigest()
        )
        assert not pat.search(clean)
    assert out["n_redacted"].sum() > 0


def test_source_frequency_cap(spark, sf_dir):
    out = textstats.source_frequency_cap(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    cap = textstats.SOURCE_CAP
    for src, grp in out.groupby("source"):
        expect = sorted(docs.loc[docs["source"] == src, "doc_id"])[:cap]
        assert list(grp.sort_values("rank")["doc_id"]) == expect
        assert list(grp.sort_values("rank")["rank"]) == list(
            range(1, len(expect) + 1)
        )
    assert set(out["source"]) == set(docs["source"])


def test_temperature_mixture_weights_sum_to_one(spark, sf_dir):
    out = textstats.temperature_mixture_weights(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    dl = docs["text"].map(lambda t: len(tokenize_string(t)))
    toks = dl.groupby(docs["source"]).sum()
    assert abs(out["weight"].sum() - 1.0) < 1e-4
    for r in out.itertuples():
        assert r.n_tokens == int(toks[r.source])
        assert abs(
            r.weight
            - math.sqrt(r.n_tokens) / sum(math.sqrt(v) for v in toks)
        ) < 1e-5
    # temperature damping: weight share < token share for the biggest source
    big = out.loc[out["n_tokens"].idxmax()]
    assert big["weight"] < big["n_tokens"] / out["n_tokens"].sum()
