"""Tests: round-4 session-17 batch 115 — Kneser-Ney bigram LM, Gunning
fog, MATTR lexical diversity."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import textstats


def test_kneser_ney_recompute(spark, sf_dir):
    out = textstats.kneser_ney_bigram_logprob(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    c12: dict[tuple[str, str], int] = {}
    for text in docs.text:
        ts = tokenize_string(text)
        for i in range(1, len(ts)):
            c12[(ts[i - 1], ts[i])] = c12.get((ts[i - 1], ts[i]), 0) + 1
    c1: dict[str, int] = {}
    n1f: dict[str, int] = {}
    n1b: dict[str, int] = {}
    for (w1, w2), c in c12.items():
        c1[w1] = c1.get(w1, 0) + c
        n1f[w1] = n1f.get(w1, 0) + 1
        n1b[w2] = n1b.get(w2, 0) + 1
    t_types = len(c12)
    words = textstats.KN_SENTENCE.split()
    assert len(out) == len(words) - 1
    d = textstats.KN_DISCOUNT
    saw_backoff = False
    for row in out.itertuples():
        w1, w2 = words[row.pos - 1], words[row.pos]
        assert (row.w1, row.w2) == (w1, w2)
        cc = c12.get((w1, w2), 0)
        assert (row.c12, row.c1) == (cc, c1.get(w1, 0))
        pc = n1b.get(w2, 0) / t_types
        if c1.get(w1, 0) > 0:
            p = max(cc - d, 0.0) / c1[w1] + (d * n1f[w1] / c1[w1]) * pc
        else:
            p = pc
        assert abs(row.p_kn - p) < 1e-9
        assert abs(row.lp - math.log(p)) < 1e-8
        saw_backoff |= cc == 0
    # the pinned sentence must exercise the pure-backoff (c12 = 0) path
    assert saw_backoff


def test_gunning_fog_recompute(spark, sf_dir):
    out = textstats.gunning_fog_index(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    import re

    vowels = re.compile(r"[aeiouy]+")
    sents = re.compile(r"[.!?]+")
    rows = {}
    for r in docs.itertuples():
        ts = tokenize_string(r.text)
        if not ts:
            continue
        w = len(ts)
        s = max(1, len(sents.findall(r.text.lower())))
        cx = sum(1 for t in ts if len(vowels.findall(t.lower())) >= 3)
        for key in (r.source, "(corpus)"):
            acc = rows.setdefault(key, [0, 0, 0])
            acc[0] += w
            acc[1] += s
            acc[2] += cx
    assert len(out) == len(rows)
    for r in out.itertuples():
        w, s, cx = rows[r.source]
        assert (r.n_words, r.n_sentences, r.n_complex) == (w, s, cx)
        assert abs(r.fog - 0.4 * (w / s + 100.0 * cx / w)) < 1e-6
    # synthetic corpus has complex (3+ syllable-group) words
    assert out.n_complex.sum() > 0


def test_mattr_vs_naive_sliding_window(spark, sf_dir):
    """The interval-identity MATTR must equal the naive per-window
    distinct count exactly."""
    out = textstats.mattr_lexical_diversity(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    w = textstats.MATTR_WINDOW
    per_src: dict[str, list[Decimal]] = {}
    for r in docs.itertuples():
        ts = tokenize_string(r.text)
        if len(ts) < w:
            continue
        total = sum(
            len(set(ts[i : i + w])) for i in range(len(ts) - w + 1)
        )
        md = Decimal(repr(total / ((len(ts) - w + 1) * w))).quantize(
            Decimal("1e-12"), ROUND_HALF_UP
        )
        per_src.setdefault(r.source, []).append(md)
    assert len(out) == len(per_src)
    for r in out.itertuples():
        vals = per_src[r.source]
        assert r.n_docs_windowed == len(vals)
        assert abs(r.mattr - float(sum(vals)) / len(vals)) < 1e-6
        assert 0.0 < r.mattr <= 1.0
