"""asof_join direction/tolerance matrix vs a brute-force reference.

The union+window implementation must reproduce pd.merge_asof
semantics exactly: backward = latest right ts <= left ts (max-tiebreak
at equal ts), forward = earliest right ts >= left ts (min-tiebreak),
nearest = the closer of the two (ties -> backward), tolerance nulls a
match farther than the delta. allow_exact_matches=False makes the
comparisons strict.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_spark.operators.asof import asof_join

_rows = st.tuples(
    st.lists(  # left: (key, ts)
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=60),
        ),
        min_size=1,
        max_size=40,
    ),
    st.lists(  # right: (key, ts) -> id assigned by index
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=60),
        ),
        min_size=0,
        max_size=40,
    ),
)


def _ref_match(
    lkey, lts, right, *, direction, exact, tolerance
):
    """Brute-force reference pick: returns right id or None."""
    def _ok_b(rts):
        return rts <= lts if exact else rts < lts

    def _ok_f(rts):
        return rts >= lts if exact else rts > lts

    back = [
        (rts, rid)
        for rid, (rkey, rts) in enumerate(right)
        if rkey == lkey and _ok_b(rts)
        and (tolerance is None or lts - rts <= tolerance)
    ]
    fwd = [
        (rts, rid)
        for rid, (rkey, rts) in enumerate(right)
        if rkey == lkey and _ok_f(rts)
        and (tolerance is None or rts - lts <= tolerance)
    ]
    # backward: max ts, then max id; forward: min ts, then min id
    b = max(back, key=lambda t: (t[0], t[1])) if back else None
    f = min(fwd, key=lambda t: (t[0], t[1])) if fwd else None
    if direction == "backward":
        return b[1] if b else None
    if direction == "forward":
        return f[1] if f else None
    if b is None:
        return f[1] if f else None
    if f is None:
        return b[1]
    db, df = lts - b[0], f[0] - lts
    return f[1] if df < db else b[1]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=_rows,
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    exact=st.booleans(),
    tolerance=st.sampled_from([None, 0, 3, 10]),
)
def test_asof_matrix_matches_reference(
    spark, data, direction, exact, tolerance
):
    lrows, rrows = data
    left = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(lrows)],
        "lid long, k long, lts long",
    )
    right = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(rrows)],
        "rid long, k long, rts long",
    )
    out = asof_join(
        left,
        right,
        on="k",
        left_ts="lts",
        right_ts="rts",
        right_payload=["rid"],
        allow_exact_matches=exact,
        direction=direction,
        tiebreak="rid",
        tolerance=tolerance,
    )
    got = {r.lid: r.rid_matched for r in out.collect()}
    assert set(got) == set(range(len(lrows))), "left rows lost"
    for i, (k, ts) in enumerate(lrows):
        want = _ref_match(
            k, ts, rrows,
            direction=direction, exact=exact, tolerance=tolerance,
        )
        assert got[i] == want, (
            f"lid={i} key={k} ts={ts} dir={direction} exact={exact} "
            f"tol={tolerance}: got {got[i]} want {want}"
        )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=_rows,
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    exact=st.booleans(),
    tolerance=st.sampled_from([None, 3]),
)
def test_asof_global_no_by_matches_reference(
    spark, data, direction, exact, tolerance
):
    """on=None (pd.merge_asof with no `by`): every left row matches
    against the whole right side — reference = keyed path with a
    constant key."""
    lrows, rrows = data
    left = spark.createDataFrame(
        [(i, ts) for i, (_, ts) in enumerate(lrows)], "lid long, lts long"
    )
    right = spark.createDataFrame(
        [(i, ts) for i, (_, ts) in enumerate(rrows)], "rid long, rts long"
    )
    out = asof_join(
        left, right, on=None, left_ts="lts", right_ts="rts",
        right_payload=["rid"], allow_exact_matches=exact,
        direction=direction, tiebreak="rid", tolerance=tolerance,
    )
    got = {r.lid: r.rid_matched for r in out.collect()}
    const_key_right = [(0, ts) for _, ts in rrows]
    for i, (_, ts) in enumerate(lrows):
        want = _ref_match(
            0, ts, const_key_right,
            direction=direction, exact=exact, tolerance=tolerance,
        )
        assert got[i] == want, (
            f"global lid={i} ts={ts} dir={direction} exact={exact} "
            f"tol={tolerance}: got {got[i]} want {want}"
        )


def test_asof_date_ordering_column(spark):
    """DateType ordering columns: nearest + tolerance measure in
    SECONDS (the docstring contract); the naive cast('double') path
    raised AnalysisException before round 9."""
    import datetime as dt

    left = spark.createDataFrame(
        [(1, dt.date(2024, 1, 10)), (1, dt.date(2024, 3, 1))],
        "k int, d date",
    )
    right = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1), 10.0), (1, dt.date(2024, 2, 28), 20.0)],
        "k int, d date, v double",
    )
    five_days = 5 * 86400.0
    out = asof_join(
        left, right, "k", "d", "d", ["v"],
        direction="nearest", tolerance=five_days,
    )
    got = {r.d: r.v_matched for r in out.collect()}
    # 1/10 is 9 days from 1/1 and 49 from 2/28 -> both out of tolerance
    assert got[dt.date(2024, 1, 10)] is None
    # 3/1 is 2 days from 2/28 -> within tolerance, nearest picks it
    assert got[dt.date(2024, 3, 1)] == 20.0


def test_asof_string_ordering_rejected_for_distance(spark):
    """Strings order fine for backward/forward but have no distance:
    nearest/tolerance must raise instead of silently casting to NULL
    (which turned 'nearest' into 'backward' and tolerance into
    null-everything)."""
    import pytest

    left = spark.createDataFrame([(1, "2024-01-10")], "k int, s string")
    right = spark.createDataFrame(
        [(1, "2024-01-01", 10.0)], "k int, s string, v double"
    )
    with pytest.raises(ValueError, match="no numeric distance"):
        asof_join(left, right, "k", "s", "s", ["v"], direction="nearest")
    with pytest.raises(ValueError, match="no numeric distance"):
        asof_join(left, right, "k", "s", "s", ["v"], tolerance=5.0)
    # sorting-only directions still accept strings
    out = asof_join(left, right, "k", "s", "s", ["v"])
    assert out.collect()[0].v_matched == 10.0
