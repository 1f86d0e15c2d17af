"""Tests: round-4 session-17 batch 124 — best-passage highlight, FST
dictionary stats, team-draft interleaving."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext


def test_best_passage_recompute(spark, sf_dir):
    out = fulltext.best_passage_highlight(spark, sf_dir).toPandas()
    topk = fulltext.bm25_topk_documents(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = {int(r.doc_id): tokenize_string(r.text) for r in docs.itertuples()}
    qts = sorted(set(tokenize_string(fulltext.FLAGSHIP_QUERY)))
    n = len(docs)
    dfs = {
        t: sum(1 for tk in toks.values() if t in tk) for t in qts
    }
    w = {
        t: round(math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5)), 12)
        for t in qts
    }
    W = fulltext.PASSAGE_W
    assert len(out) == len(topk)
    for r in out.itertuples():
        tk = toks[int(r.doc_id)]
        best = None
        for i in range(1, max(1, len(tk) - W + 1) + 1):
            window = set(tk[i - 1 : i - 1 + W])
            sc = round(sum(w[t] for t in qts if t in window), 6)
            if sc > 0 and (best is None or sc > best[1]):
                best = (i, sc)
        assert best is not None
        assert (r.start_pos, round(r.passage_score, 6)) == (
            best[0] - 1,
            best[1],
        )
        assert r.passage == " ".join(
            tk[best[0] - 1 : best[0] - 1 + W]
        )
    # ranks match the flagship page
    assert sorted(out["rank"]) == sorted(topk["rank"])


def test_fst_stats_recompute(spark, sf_dir):
    out = fulltext.term_dict_fst_stats(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    vocab = set()
    for t in docs.text:
        vocab.update(tokenize_string(t))
    prefixes = {t[:i] for t in vocab for i in range(1, len(t) + 1)}
    suffixes = {t[i:] for t in vocab for i in range(len(t))}
    total = sum(len(t) for t in vocab)
    assert out.n_terms == len(vocab)
    assert out.total_chars == total
    assert out.n_trie_nodes == len(prefixes)
    assert out.n_suffixes == len(suffixes)
    assert abs(out.prefix_saving - (1.0 - len(prefixes) / total)) < 1e-6
    # a trie never has more nodes than raw chars
    assert out.n_trie_nodes <= out.total_chars


def test_team_draft_recompute(spark, sf_dir):
    out = fulltext.team_draft_interleaving(spark, sf_dir).toPandas()
    a = list(
        fulltext.bm25_topk_documents(spark, sf_dir)
        .toPandas()
        .sort_values("rank")
        .doc_id.astype(int)
    )
    b = list(
        fulltext.tfidf_topk(spark, sf_dir)
        .toPandas()
        .sort_values("rank")
        .doc_id.astype(int)
    )
    seen: set[int] = set()
    na = nb = 0
    exp = []
    for pos in range(1, fulltext.TEAM_DRAFT_L + 1):
        coin = int(
            hashlib.md5(f"td:{pos}".encode()).hexdigest()[:13], 16
        ) % 2
        turn_a = na < nb or (na == nb and coin == 1)
        prefer, other = (a, b) if turn_a else (b, a)
        pick = next((d for d in prefer if d not in seen), None)
        if pick is None:
            pick = next((d for d in other if d not in seen), None)
        seen.add(pick)
        exp.append((pos, pick, "A" if turn_a else "B"))
        na, nb = na + turn_a, nb + (not turn_a)
    got = [(int(r.pos), int(r.doc_id), r.team) for r in out.itertuples()]
    assert got == exp
    # draft invariants: no repeats, balanced teams (within 1)
    assert len({d for _, d, _ in got}) == len(got)
    teams = Counter(t for _, _, t in got)
    assert abs(teams["A"] - teams["B"]) <= 1
    # every pick comes from one of the two pages
    assert all(d in set(a) | set(b) for _, d, _ in got)
