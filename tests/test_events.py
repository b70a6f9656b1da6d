"""Event-stream operators: sessionize / as-of join / range join — boundary
semantics on a planted corpus plus DuckDB equivalence on driver testdata."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import index_ray.pipelines.events as ev

SF = "/root/testdata/sf0.001"

US = 1_000_000
MIN = 60 * US
HOUR = 3600 * US


def _write_events(tmp_path, rows):
    """rows: (event_id, ts_us, user_id, event_type, value)."""
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([float(r[4]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


def test_sessionize_gap_boundaries(ray_session, tmp_path):
    # user 1: events at 0, exactly-30min gap (same session), 30min+1us gap
    # (new session).  user 2: single event.
    d = _write_events(
        tmp_path,
        [
            (0, 0, 1, "view", 1.0),
            (1, 30 * MIN, 1, "view", 2.0),  # dt == gap: same session
            (2, 60 * MIN + 1, 1, "view", 4.0),  # dt == gap+1us: new session
            (3, 5 * HOUR, 2, "view", 8.0),
        ],
    )
    out = (
        ev.sessionize(d)
        .to_pandas()
        .sort_values(["user_id", "session_seq"])
        .reset_index(drop=True)
    )
    assert out["user_id"].tolist() == [1, 1, 2]
    assert out["session_seq"].tolist() == [1, 2, 1]
    assert out["n_events"].tolist() == [2, 1, 1]
    assert out["duration_us"].tolist() == [30 * MIN, 0, 0]
    assert out["value_cents"].tolist() == [300, 400, 800]


def test_asof_same_ts_click_and_no_match(ray_session, tmp_path):
    d = _write_events(
        tmp_path,
        [
            (0, 100, 1, "purchase", 1.0),  # no prior click -> -1
            (1, 200, 1, "click", 0.0),
            (2, 200, 1, "purchase", 1.0),  # same-ts click IS visible
            (3, 500, 1, "click", 0.0),
            (4, 500, 1, "click", 0.0),  # tie: larger event_id wins
            (5, 900, 1, "purchase", 1.0),
            (6, 50, 2, "purchase", 1.0),  # other user's clicks invisible
        ],
    )
    out = ev.asof_purchase_click(d).to_pandas().set_index("event_id")
    assert out.loc[0, "click_event_id"] == -1 and out.loc[0, "lag_us"] == -1
    assert out.loc[2, "click_event_id"] == 1 and out.loc[2, "lag_us"] == 0
    assert out.loc[5, "click_event_id"] == 4 and out.loc[5, "lag_us"] == 400
    assert out.loc[6, "click_event_id"] == -1


def test_signup_window_half_open(ray_session, tmp_path):
    w = ev.WINDOW_US
    d = _write_events(
        tmp_path,
        [
            (0, 0, 1, "signup", 1.0),
            (1, w - 1, 1, "view", 2.0),  # inside
            (2, w, 1, "view", 4.0),  # at +window: excluded (half-open)
            (3, 10, 2, "view", 8.0),  # other user: excluded
        ],
    )
    out = ev.events_in_signup_window(d).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["window_id"] == 0 and r["user_id"] == 1
    assert r["n_in_window"] == 2  # signup itself + event 1
    assert r["value_cents"] == 300


def test_rolling_window_boundaries(ray_session, tmp_path):
    # user 1: t=0, t=HOUR (inclusive window edge: both in frame), and two
    # PEER rows at t=HOUR+1us (RANGE frame includes peers; t=0 now out).
    d = _write_events(
        tmp_path,
        [
            (0, 0, 1, "view", 1.0),
            (1, HOUR, 1, "view", 2.0),
            (2, HOUR + 1, 1, "view", 4.0),
            (3, HOUR + 1, 1, "view", 8.0),
        ],
    )
    out = (
        ev.rolling_user_value(d, window_us=HOUR)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["n_in_window"].tolist() == [1, 2, 3, 3]
    assert out["value_cents"].tolist() == [100, 300, 1400, 1400]


@pytest.mark.parametrize(
    "fn,sql",
    [
        (ev.sessionize, ev.sessionize_sql_oracle()),
        (ev.asof_purchase_click, ev.asof_sql_oracle()),
        (ev.events_in_signup_window, ev.signup_window_sql_oracle()),
        (ev.rolling_user_value, ev.rolling_sql_oracle()),
        (ev.distinct_users_daily, ev.distinct_users_daily_sql_oracle()),
    ],
    ids=["sessionize", "asof", "range", "rolling", "distinct_daily"],
)
def test_events_match_duckdb(ray_session, fn, sql):
    got = fn(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = con.sql(sql).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.parametrize("name", ["running_user_total", "event_gaps"])
def test_cumulative_windows_match_duckdb(ray_session, name):
    import duckdb

    import __ray_entry__ as entrymod

    got = entrymod.queries()[name]("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM '/root/testdata/sf0.001/events.parquet'"
    )
    want = con.sql(entrymod.oracle_sql()[name]).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_session_concurrency_bucket_invariance():
    """The time-bucket width is an execution knob, never a semantics knob:
    any width gives identical counts (interval replication is exact)."""
    import pandas as pd

    from index_ray.pipelines.events import session_concurrency

    sf = "/root/testdata/sf0.001"

    def run(w):
        return (
            session_concurrency(sf, bucket_us=w)
            .to_pandas()
            .sort_values(["user_id", "session_seq"])
            .reset_index(drop=True)
        )

    base = run(3600 * 1_000_000)
    assert len(base) > 0
    # own events always counted: n_window_events >= the session's own size
    assert (base["n_window_events"] >= 1).all()
    for w in (600 * 1_000_000, 10**18):  # 10-min buckets; one giant bucket
        pd.testing.assert_frame_equal(run(w), base)
