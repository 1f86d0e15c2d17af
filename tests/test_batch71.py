"""Tests: round-4 session-15 batch 71 — RAKE keywords, duplicated-shingle
run report, SPRT daily LLR."""

from __future__ import annotations

import math

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity, textstats


def _toks(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    return {r.doc_id: tokenize_string(r.text) for r in docs.itertuples()}


def test_rake_recompute(spark, sf_dir):
    out = textstats.rake_keywords(spark, sf_dir).toPandas()
    stop = set(textstats.RAKE_STOPWORDS)
    phrases: list[list[str]] = []
    for toks in _toks(sf_dir).values():
        run: list[str] = []
        for w in toks + ["<STOP>"]:
            if w in stop or w == "<STOP>":
                if run and len(run) <= textstats.RAKE_MAX_PHRASE_LEN:
                    phrases.append(run)
                run = []
            else:
                run.append(w)
    freq: dict[str, int] = {}
    deg: dict[str, int] = {}
    for p in phrases:
        for w in p:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(p)
    occ: dict[str, int] = {}
    for p in phrases:
        occ[" ".join(p)] = occ.get(" ".join(p), 0) + 1
    score = {
        ph: sum(deg[w] / freq[w] for w in ph.split(" ")) for ph in occ
    }
    want = sorted(occ, key=lambda ph: (-round(score[ph], 6), ph))[
        : textstats.RAKE_TOP_K
    ]
    assert list(out.phrase) == want
    for r in out.itertuples():
        assert r.n_occurrences == occ[r.phrase]
        assert abs(r.score - score[r.phrase]) < 5e-6
    assert list(out["rank"]) == list(range(1, len(out) + 1))


def test_dup_shingle_run_recompute(spark, sf_dir):
    out = textstats.dup_shingle_run_report(spark, sf_dir).toPandas()
    toks = _toks(sf_dir)
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    sh_by_doc = {
        d: [" ".join(t[i : i + 3]) for i in range(len(t) - 2)]
        for d, t in toks.items()
    }
    docs_of: dict[str, set] = {}
    for d, shs in sh_by_doc.items():
        for s in set(shs):
            docs_of.setdefault(s, set()).add(d)
    longest: dict[int, int] = {}
    for d, shs in sh_by_doc.items():
        best = cur = 0
        for s in shs:
            cur = cur + 1 if len(docs_of[s]) >= 2 else 0
            best = max(best, cur)
        longest[d] = best
    per_source: dict[str, list[int]] = {}
    for r in docs.itertuples():
        per_source.setdefault(r.source, []).append(longest.get(r.doc_id, 0))
    assert len(out) == len(per_source)
    for r in out.itertuples():
        runs = per_source[r.source]
        assert r.n_docs == len(runs)
        assert r.docs_with_dup == sum(1 for x in runs if x > 0)
        assert r.max_run == max(runs)
        assert abs(r.mean_longest_run - sum(runs) / len(runs)) < 5e-7
        assert r.docs_run_ge_min == sum(
            1 for x in runs if x >= textstats.DUP_RUN_MIN
        )


def test_sprt_recompute(spark, sf_dir):
    out = parity.sprt_daily_llr(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev.ts.astype("int64") // (86400 * 10**6)
    daily = ev.groupby("day").agg(
        n=("event_id", "size"),
        c=("event_type", lambda s: int((s == "purchase").sum())),
    )
    l1, l0 = float(parity.SPRT_L1_LIT), float(parity.SPRT_L0_LIT)
    bound = float(parity.SPRT_BOUND_LIT)
    assert math.isclose(bound, math.log(19.0))
    cum = 0.0
    assert list(out.day) == list(daily.index)
    for r, (_, d) in zip(out.itertuples(), daily.iterrows()):
        llr = d.c * l1 + (d.n - d.c) * l0
        cum += llr
        assert r.n == d.n and r.c == d.c
        assert abs(r.llr - llr) < 5e-7
        assert abs(r.cum_llr - cum) < 5e-6
        want = (
            "accept_h1"
            if cum >= bound
            else "accept_h0"
            if cum <= -bound
            else "continue"
        )
        assert r.decision == want
    # with p_true ~ 0.2 midway between hypotheses the walk mostly continues:
    # the gate checks determinism of the decision column, not a verdict
    assert set(out.decision) <= {"continue", "accept_h0", "accept_h1"}
