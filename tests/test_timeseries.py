from __future__ import annotations

import datetime as dt

from cdc_spark.operators.timeseries import gap_fill_locf


def test_gap_fill_locf_fills_and_flags(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        (1, t0, 10.0, 1),
        (1, t0 + dt.timedelta(hours=3), 40.0, 2),
        # two observations in one bucket: later event_id wins
        (1, t0 + dt.timedelta(hours=3, minutes=10), 41.0, 3),
        (2, t0, 7.0, 4),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long"
    )
    got = {
        (r.user_id, r.bucket_ts): r
        for r in gap_fill_locf(
            df, ["user_id"], "ts", "value", order_col="event_id"
        ).collect()
    }
    h0 = dt.datetime(2024, 1, 1, 0)
    # user 1: grid is 4 hourly buckets; gaps carry 10.0 forward
    assert got[(1, h0)].value_filled == 10.0
    assert got[(1, h0)].is_observed == 1
    for k in (1, 2):
        r = got[(1, h0 + dt.timedelta(hours=k))]
        assert r.value_filled == 10.0 and r.is_observed == 0
    assert got[(1, h0 + dt.timedelta(hours=3))].value_filled == 41.0
    # user 2: single bucket, no gaps
    assert len([k for k in got if k[0] == 2]) == 1
