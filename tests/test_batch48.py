"""Tests: round-4 session-14 batch 48 — independent pandas/numpy
recomputes of the JLH sig-terms heuristic, the Matryoshka and radius
vector audits, the parent aggregation, the Gopher repetition signals,
and the percentile length trim."""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity, similarity, textstats
from lucene_mapreduce_spark.operators.fulltext import sig_terms_jlh


def _t(sf_dir, name):
    return pd.read_parquet(f"{sf_dir}/{name}.parquet")


def test_sig_terms_jlh_recompute(spark, sf_dir):
    out = sig_terms_jlh(spark, sf_dir).toPandas()
    assert list(out.columns) == ["term", "df_fg", "df_bg", "jlh", "rank"]
    docs = _t(sf_dir, "documents")
    toks = docs["text"].map(tokenize_string)
    from lucene_mapreduce_spark.operators.fulltext import BOOLEAN_QUERY

    qts = set(tokenize_string(BOOLEAN_QUERY))
    hit = toks.map(lambda ts: bool(qts & set(ts)))
    n_fg, n_bg = int(hit.sum()), len(docs)
    # verify each reported row's score from raw dfs
    df_fg = {}
    df_bg = {}
    for ts, h in zip(toks, hit):
        for t in set(ts):
            df_bg[t] = df_bg.get(t, 0) + 1
            if h:
                df_fg[t] = df_fg.get(t, 0) + 1
    for _i, row in out.iterrows():
        t = row["term"]
        assert df_fg[t] == row["df_fg"] and df_bg[t] == row["df_bg"]
        fg_pct = row["df_fg"] / n_fg
        bg_pct = row["df_bg"] / n_bg
        assert abs(row["jlh"] - round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6)) < 1e-9
        assert t not in qts and fg_pct > bg_pct
    assert (out["jlh"].values[:-1] >= out["jlh"].values[1:]).all()


def _cos_matrix(vecs, probes):
    a = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    b = probes / np.linalg.norm(probes, axis=1, keepdims=True)
    return a @ b.T


def test_matryoshka_recall_recompute(spark, sf_dir):
    out = similarity.matryoshka_recall(spark, sf_dir).toPandas()
    emb = _t(sf_dir, "embeddings").sort_values("vec_id").reset_index(drop=True)
    vecs = np.array(emb["embedding"].tolist(), dtype=np.float64)
    ids = emb["vec_id"].to_numpy()
    k = similarity.MRL_RECALL_K
    d = similarity.MRL_TRUNC_DIM
    full = _cos_matrix(vecs, vecs[:8])
    trunc = _cos_matrix(vecs[:, :d], vecs[:8, :d])
    for q in range(8):
        mask = ids != q
        rows = np.where(mask)[0]

        def topk(scores):
            s = np.round(scores[rows, q], 6)
            order = np.lexsort((ids[rows], -s))
            return set(ids[rows][order][:k])

        expect = len(topk(full) & topk(trunc)) / k
        got = float(out[out["query_id"] == q]["recall"].iloc[0])
        assert abs(got - round(expect, 6)) < 1e-9


def test_ann_radius_search_recompute(spark, sf_dir):
    out = similarity.ann_radius_search(spark, sf_dir).toPandas()
    emb = _t(sf_dir, "embeddings").sort_values("vec_id").reset_index(drop=True)
    vecs = np.array(emb["embedding"].tolist(), dtype=np.float64)
    ids = emb["vec_id"].to_numpy()
    cos = np.round(_cos_matrix(vecs, vecs[:8]), 6)
    for q in range(8):
        mask = (ids != q) & (cos[:, q] >= similarity.RADIUS_COS_MIN)
        n = int(mask.sum())
        row = out[out["query_id"] == q]
        if n == 0:
            assert len(row) == 0
            continue
        assert int(row["n_neighbors"].iloc[0]) == n
        mx = cos[mask, q].max()
        assert abs(row["max_cos"].iloc[0] - mx) < 1e-9
        best = ids[mask][np.lexsort((ids[mask], -cos[mask, q]))][0]
        assert int(row["nearest_id"].iloc[0]) == int(best)


def test_parent_agg_recompute(spark, sf_dir):
    out = parity.parent_agg(spark, sf_dir).toPandas()
    od, cu = _t(sf_dir, "orders"), _t(sf_dir, "customer")
    sel = od[od["o_orderpriority"] == parity.PARENT_AGG_PRIORITY].merge(
        cu, left_on="o_custkey", right_on="c_custkey"
    )
    exp = sel.groupby("c_mktsegment").agg(
        n_child_orders=("o_orderkey", "size"), n_parents=("c_custkey", "nunique")
    )
    got = out.set_index("c_mktsegment")
    assert len(got) == len(exp)
    for seg, row in exp.iterrows():
        assert int(got.loc[seg, "n_child_orders"]) == int(row["n_child_orders"])
        assert int(got.loc[seg, "n_parents"]) == int(row["n_parents"])


def test_repetition_signals_recompute(spark, sf_dir):
    out = textstats.repetition_signals(spark, sf_dir).toPandas()
    docs = _t(sf_dir, "documents")
    rows = []
    for _i, r in docs.iterrows():
        ts = tokenize_string(r["text"])
        if len(ts) < textstats.REP_MIN_TOKENS:
            continue
        bi = [" ".join(ts[i : i + 2]) for i in range(len(ts) - 1)]
        tri = [" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)]
        top2 = max(pd.Series(bi).value_counts())
        top3 = max(pd.Series(tri).value_counts())
        rows.append(
            {
                "source": r["source"],
                "f2": round(top2 / len(bi), 6),
                "f3": round(top3 / len(tri), 6),
                "flag2": top2 * 100 > len(bi) * textstats.REP_TOP2_FLAG_PCT,
                "flag3": top3 * 100 > len(tri) * textstats.REP_TOP3_FLAG_PCT,
            }
        )
    ref = pd.DataFrame(rows)
    got = out.set_index("source")
    for src, grp in ref.groupby("source"):
        assert int(got.loc[src, "n_docs"]) == len(grp)
        assert abs(got.loc[src, "mean_top2_frac"] - round(grp["f2"].sum() / len(grp), 6)) < 1e-6
        assert abs(got.loc[src, "mean_top3_frac"] - round(grp["f3"].sum() / len(grp), 6)) < 1e-6
        assert int(got.loc[src, "n_flag_top2"]) == int(grp["flag2"].sum())
        assert int(got.loc[src, "n_flag_top3"]) == int(grp["flag3"].sum())


def test_length_trim_report_recompute(spark, sf_dir):
    out = textstats.length_trim_report(spark, sf_dir).toPandas()
    docs = _t(sf_dir, "documents")
    got = out.set_index("lang")
    for lang, grp in docs.groupby("lang"):
        lo = np.quantile(grp["n_chars"].astype(float), textstats.TRIM_LO_Q)
        hi = np.quantile(grp["n_chars"].astype(float), textstats.TRIM_HI_Q)
        kept = int(((grp["n_chars"] >= lo) & (grp["n_chars"] <= hi)).sum())
        assert abs(got.loc[lang, "p5_chars"] - round(lo, 6)) < 1e-6
        assert abs(got.loc[lang, "p95_chars"] - round(hi, 6)) < 1e-6
        assert int(got.loc[lang, "n_kept"]) == kept
        assert int(got.loc[lang, "n_trimmed"]) == len(grp) - kept
        assert int(got.loc[lang, "n_docs"]) == len(grp)
