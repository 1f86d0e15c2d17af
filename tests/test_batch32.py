"""Tests: round-4 session-12 batch 32 (most_fields multi-match, watermark
streaming dedup, A-ES weighted sampling, char-trigram entropy, vocab
overlap, stopword coverage) — independent recomputes."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, textstats
from lucene_mapreduce_spark.query.bm25 import B, K1


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _md5_52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def test_most_fields_recompute(spark, sf_dir):
    out = fulltext.most_fields_topk(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    toks = {int(r.doc_id): tokenize_string(r.text) for r in docs.itertuples()}
    src = {int(r.doc_id): r.source for r in docs.itertuples()}
    n = float(len(toks))
    avgdl = sum(len(t) for t in toks.values()) / n
    qts = sorted(set(tokenize_string(fulltext.BM25F_QUERY)))
    df = {q: sum(1 for t in toks.values() if q in t) for q in qts}
    dfk = docs["source"].value_counts().to_dict()
    scores = {}
    for d, t in toks.items():
        s = 0.0
        for q in qts:  # ascending, sequential (text leg)
            tf = t.count(q)
            if tf and df[q]:
                idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
                s += idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * len(t) / avgdl))
        if src[d] in qts:
            s += math.log(1.0 + (n - dfk[src[d]] + 0.5) / (dfk[src[d]] + 0.5))
        if s:
            scores[d] = round(s, 6)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = list(zip(out["doc_id"].astype(int), out["score"]))
    assert [d for d, _ in got] == [d for d, _ in want]
    assert all(abs(a - b) < 1e-6 for (_, a), (_, b) in zip(got, want))
    # the keyword-only docs must be reachable (src3 hits only that field)
    assert any(src[d] == "src3" for d, _ in scores.items())


def test_streaming_dedup_watermark_matches_batch(spark, sf_dir):
    from lucene_mapreduce_spark.streaming.incremental import (
        streaming_dedup_watermark,
    )

    out = streaming_dedup_watermark(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    want = set(map(tuple, ev[["user_id", "event_type"]].drop_duplicates().values))
    got = set(zip(out["user_id"].astype(int), out["event_type"]))
    assert got == want
    assert len(out) == len(got)  # each key emitted exactly once


def test_weighted_reservoir_recompute(spark, sf_dir):
    out = textstats.weighted_reservoir_sample(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    rows = []
    for r in docs.itertuples():
        u = (_md5_52(f"{r.doc_id}:wrs") + 1.0) / 4503599627370497.0
        rows.append((r.lang, round(-math.log(u) / r.n_chars, 6), int(r.doc_id)))
    want = {}
    for lang in sorted({r[0] for r in rows}):
        grp = sorted((k, d) for l, k, d in rows if l == lang)
        want[lang] = [d for _, d in grp[: textstats.WRS_K_PER_LANG]]
    for lang, g in out.groupby("lang"):
        assert list(g.sort_values("rank")["doc_id"].astype(int)) == want[lang]
    # weighting sanity: sampled docs skew long (es_key falls with n_chars)
    assert out["n_chars"].mean() >= docs["n_chars"].mean() * 0.8


def test_char_trigram_entropy_recompute(spark, sf_dir):
    out = textstats.char_trigram_entropy(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    for r in out.itertuples():
        counts = {}
        for t in docs[docs["lang"] == r.lang]["text"]:
            t = t.lower()
            for i in range(len(t) - 2):
                g = t[i : i + 3]
                counts[g] = counts.get(g, 0) + 1
        tot = sum(counts.values())
        h = -sum(round((c / tot) * math.log(c / tot), 12) for c in counts.values())
        assert int(r.n_trigrams) == len(counts)
        assert abs(r.entropy_nats - round(h, 6)) < 1e-9


def test_vocab_overlap_recompute(spark, sf_dir):
    out = textstats.vocab_overlap_sources(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    vocab = {}
    for r in docs.itertuples():
        vocab.setdefault(r.source, set()).update(tokenize_string(r.text))
    srcs = sorted(vocab)
    n_pairs = len(srcs) * (len(srcs) - 1) // 2
    # only intersecting pairs emit rows; synthetic vocab is shared => all
    assert len(out) == n_pairs
    for r in out.itertuples():
        inter = len(vocab[r.src_a] & vocab[r.src_b])
        union = len(vocab[r.src_a] | vocab[r.src_b])
        assert int(r.n_inter) == inter
        assert abs(r.jaccard - round(inter / union, 6)) < 1e-9


def test_stopword_coverage_recompute(spark, sf_dir):
    out = textstats.stopword_coverage(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    cf = {}
    tot = 0
    for t in docs["text"]:
        for term in tokenize_string(t):
            cf[term] = cf.get(term, 0) + 1
            tot += 1
    head = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[
        : textstats.STOPWORD_TOP_K
    ]
    cum = 0
    for r, (term, c) in zip(out.itertuples(), head):
        cum += c
        assert r.term == term and int(r.cf) == c and int(r.cum_cf) == cum
        assert abs(r.coverage - round(cum / tot, 6)) < 1e-9
    # coverage is monotone and ends below 1 for a nondegenerate vocab
    assert out["coverage"].is_monotonic_increasing
    assert out["coverage"].iloc[-1] < 1.0
