"""Tests: round-3 session-7 batch 13 (geo centroid / mixture resample /
token budget trim) — invariants beyond the DuckDB oracle gate."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import textstats


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_geo_centroid_inside_tile_and_weighted(spark, sf_dir):
    out = textstats.geo_centroid_agg(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    assert out["n_docs"].sum() == len(docs)
    # zoom-2 tiles: x in [0,4) of 90-degree lon bands; centroid lon must
    # lie inside its tile's lon band (lat bands are Mercator-warped, so
    # check lon only, which is linear)
    for _, r in out.iterrows():
        x = int(r["tile"].split("/")[1])
        lo, hi = -180 + 90 * x, -180 + 90 * (x + 1)
        assert lo - 1e-6 <= r["centroid_lon"] <= hi + 1e-6


def test_mixture_resample_rates_and_counts(spark, sf_dir):
    out = textstats.mixture_resample(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    toks = {
        s: sum(len(tokenize_string(t)) for t in g["text"])
        for s, g in docs.groupby("source")
    }
    mx = max(toks.values())
    for _, r in out.iterrows():
        want = min(1.0, textstats.MIXTURE_BASE_KEEP * math.sqrt(mx / toks[r["source"]]))
        assert math.isclose(r["keep_rate"], round(want, 6), abs_tol=1e-9)
        assert 0 <= r["n_kept"] <= r["n_docs"]
    # recompute one source's kept count by hand
    src = out["source"].iloc[0]
    grp = docs[docs["source"] == src]
    rate = min(1.0, textstats.MIXTURE_BASE_KEEP * math.sqrt(mx / toks[src]))
    kept = sum(
        1
        for d in grp["doc_id"]
        if int(hashlib.md5(f"{int(d)}:mix".encode()).hexdigest()[:13], 16)
        / float(1 << 52)
        < rate
    )
    assert out.loc[out["source"] == src, "n_kept"].iloc[0] == kept


def test_token_budget_trim_witnesses(spark, sf_dir):
    out = textstats.token_budget_trim(spark, sf_dir).toPandas()
    docs = _docs(sf_dir).sort_values("doc_id")
    b = textstats.TRIM_BUDGET
    assert list(out["doc_id"]) == list(docs["doc_id"])
    for (_, r), txt in zip(out.iterrows(), docs["text"]):
        toks = tokenize_string(txt)
        assert r["n_tokens"] == len(toks)
        assert r["n_kept"] == min(len(toks), b)
        want = hashlib.md5(" ".join(toks[:b]).encode()).hexdigest()
        assert r["trimmed_md5"] == want


def test_contexts_suggest_respects_context(spark, sf_dir):
    from collections import Counter

    out = textstats.contexts_suggest(spark, sf_dir).toPandas()
    prefix, ctx = textstats.CTX_SUGGEST
    docs = _docs(sf_dir)
    in_ctx = Counter(
        t
        for l, x in zip(docs["lang"], docs["text"])
        if l == ctx
        for t in tokenize_string(x)
        if t.startswith(prefix)
    )
    exp = sorted(in_ctx.items(), key=lambda kv: (-kv[1], kv[0]))[
        : textstats.CTX_SUGGEST_K
    ]
    assert list(zip(out["term"], out["cf"])) == exp


def test_random_sampler_deterministic_and_scaled(spark, sf_dir):
    out = textstats.random_sampler_agg(spark, sf_dir).toPandas()
    p = textstats.RANDOM_SAMPLER_P
    docs = _docs(sf_dir)
    assert out["exact_docs"].sum() == len(docs)
    for _, r in out.iterrows():
        assert math.isclose(r["est_docs"], r["n_sampled"] / p, abs_tol=1e-6)
        assert 0 <= r["n_sampled"] <= r["exact_docs"]
    # second run identical (the sample is a hash, not an RNG)
    again = textstats.random_sampler_agg(spark, sf_dir).toPandas()
    assert again.equals(out)


def test_pivot_table_counts(spark, sf_dir):
    out = textstats.pivot_table_agg(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    for _, r in out.iterrows():
        for s in textstats.PIVOT_SOURCES:
            want = ((docs["lang"] == r["lang"]) & (docs["source"] == s)).sum()
            assert r[s] == want


def test_cube_agg_lattice_consistency(spark, sf_dir):
    out = textstats.cube_agg(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    grand = out[(out["lang"] == "<all>") & (out["source"] == "<all>")].iloc[0]
    assert grand["n_docs"] == len(docs)
    assert grand["sum_chars"] == docs["n_chars"].sum()
    # lang subtotals sum to the grand total; leaf cells sum to subtotals
    lang_rows = out[(out["lang"] != "<all>") & (out["source"] == "<all>")]
    assert lang_rows["n_docs"].sum() == len(docs)
    leaves = out[(out["lang"] != "<all>") & (out["source"] != "<all>")]
    assert leaves["n_docs"].sum() == len(docs)
    src_rows = out[(out["lang"] == "<all>") & (out["source"] != "<all>")]
    assert src_rows["n_docs"].sum() == len(docs)


def test_contamination_fraction_ratios(spark, sf_dir):
    from lucene_mapreduce_spark.operators import dedup

    out = dedup.contamination_fraction(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)

    def shingles(txt):
        t = tokenize_string(txt)
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    ev = set()
    for d, txt in zip(docs["doc_id"], docs["text"]):
        if d % dedup.EVAL_MOD == 0:
            ev |= shingles(txt)
    for _, r in out.iterrows():
        assert r["doc_id"] % dedup.EVAL_MOD != 0
        sh = shingles(docs.set_index("doc_id").loc[r["doc_id"], "text"])
        assert r["n_shingles"] == len(sh)
        assert r["n_shared"] == len(sh & ev)
        assert r["frac"] >= dedup.CONTAM_FRACTION
