"""Tests: round-4 session-17 batch 118 — hex-grid agg, metric rank
agreement, NDV sketch-error audit."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import similarity, textstats


def _u52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def _hex_key(doc_id: int) -> str:
    lat = (_u52(f"{doc_id}:lat") % 1800001) / 10000.0 - 90.0
    lon = (_u52(f"{doc_id}:lon") % 3600001) / 10000.0 - 180.0
    s = float(textstats.HEX_SIZE_DEG)
    qf = (textstats._TWO_THIRDS * lon) / s
    rf = ((textstats._NEG_THIRD * lon) + (textstats._SQRT3_INV * lat)) / s
    yf = -qf - rf
    rx, ry, rz = (
        math.floor(qf + 0.5), math.floor(yf + 0.5), math.floor(rf + 0.5),
    )
    dx, dy, dz = abs(rx - qf), abs(ry - yf), abs(rz - rf)
    if dx > dy and dx > dz:
        rx = -ry - rz
    elif not (dy > dz):
        rz = -rx - ry
    return f"{rx}:{rz}"


def test_geohex_recompute(spark, sf_dir):
    out = textstats.geohex_grid_agg(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    counts: dict[str, int] = {}
    for d in docs.doc_id:
        k = _hex_key(int(d))
        counts[k] = counts.get(k, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(out.hex) == [h for h, _ in top]
    assert list(out.n_docs) == [c for _, c in top]
    assert list(out["rank"]) == list(range(1, len(out) + 1))
    # hex cells must tile: every doc lands in exactly one cell
    assert sum(counts.values()) == len(docs)


def test_metric_rank_agreement_recompute(spark, sf_dir):
    out = similarity.metric_rank_agreement(spark, sf_dir).toPandas().iloc[0]
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qv = np.array(
        emb[emb.vec_id == similarity.QUERY_VEC_ID].embedding.iloc[0],
        dtype=np.float64,
    )
    rest = emb[emb.vec_id != similarity.QUERY_VEC_ID]
    rows = []
    for r in rest.itertuples():
        v = np.array(r.embedding, dtype=np.float64)
        dot = float(np.dot(v, qv))
        cos = dot / (math.sqrt(float(np.dot(v, v))) * math.sqrt(float(np.dot(qv, qv))))
        rows.append((r.vec_id, round(cos, 6), round(dot, 6)))
    df = pd.DataFrame(rows, columns=["vec_id", "cos", "dot"])
    k = similarity.RANK_AGREE_DEPTH
    rc = df.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
    rc = {v: i + 1 for i, v in enumerate(rc.vec_id)}
    rd = df.sort_values(["dot", "vec_id"], ascending=[False, True]).head(k)
    rd = {v: i + 1 for i, v in enumerate(rd.vec_id)}
    common = sorted(set(rc) & set(rd))
    conc = disc = 0
    for i in range(len(common)):
        for j in range(i + 1, len(common)):
            a, b = common[i], common[j]
            s = (rc[a] - rc[b]) * (rd[a] - rd[b])
            conc += s > 0
            disc += s < 0
    n = len(common)
    assert (out.k_depth, out.n_common) == (k, n)
    assert (out.n_concordant, out.n_discordant) == (conc, disc)
    assert abs(out.tau - (conc - disc) / (n * (n - 1) / 2)) < 1e-6


def test_ndv_audit_recompute(spark, sf_dir):
    out = textstats.ndv_sketch_error_by_column(spark, sf_dir).toPandas()
    assert list(out.column_name) == sorted(
        f"{t}.{c}" for t, c in textstats.NDV_AUDIT_COLUMNS
    )
    m = textstats._HLL_M
    for t, c in textstats.NDV_AUDIT_COLUMNS:
        key = f"{t}.{c}"
        vals = {
            str(v)
            for v in pd.read_parquet(f"{sf_dir}/{t}.parquet")[c].unique()
        }
        regs: dict[int, int] = {}
        for v in vals:
            h = _u52(f"{key}:{v}")
            b, w = h >> 40, h & ((1 << 40) - 1)
            rho = 41 if w == 0 else 40 - int(math.floor(math.log2(w)))
            regs[b] = max(regs.get(b, 0), rho)
        s_int = sum(1 << (41 - r) for r in regs.values()) + (
            m - len(regs)
        ) * (1 << 41)
        e_raw = textstats._HLL_ALPHA_NUM / s_int
        ve = float(m - len(regs))
        est = (
            float(m) * math.log(float(m) / ve)
            if (e_raw <= 2.5 * m and ve > 0)
            else e_raw
        )
        row = out[out.column_name == key].iloc[0]
        assert row.n_exact == len(vals)
        assert row.used == len(regs)
        assert abs(row.hll_estimate - est) < 1e-3
        assert abs(row.rel_err - abs(est - len(vals)) / len(vals)) < 1e-6
        # HLL at p=12 should be within ~5% on these cardinalities
        assert row.rel_err < 0.05
