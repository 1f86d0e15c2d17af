"""Stream-stream join gate: watermarked unbounded-x-unbounded join must
equal the batch join, and the plan must actually be a streaming join
with state bounded by the watermark + time-range condition."""

from __future__ import annotations

import pandas as pd

from lucene_mapreduce_spark.streaming.incremental import (
    STREAM_JOIN_WINDOW_MIN,
    streaming_stream_join,
)


def test_stream_join_equals_batch_join(spark, sf_dir):
    got = streaming_stream_join(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    views = ev[ev["event_type"] == "view"]
    purch = ev[ev["event_type"] == "purchase"]
    m = views.merge(purch, on="user_id", suffixes=("_v", "_p"))
    m = m[
        (m["ts_p"] >= m["ts_v"])
        & (m["ts_p"] <= m["ts_v"] + pd.Timedelta(minutes=STREAM_JOIN_WINDOW_MIN))
    ]
    exp = (
        m[["user_id", "event_id_v", "event_id_p"]]
        .rename(columns={"event_id_v": "view_id", "event_id_p": "purchase_id"})
        .sort_values(["user_id", "view_id", "purchase_id"])
        .reset_index(drop=True)
    )
    got = got.sort_values(["user_id", "view_id", "purchase_id"]).reset_index(
        drop=True
    )
    assert got.equals(exp.astype(got.dtypes.to_dict()))
    # every purchase pairs only within the window (already enforced by
    # equality above); sanity: no duplicate pairs emitted by the stream
    assert not got.duplicated().any()
