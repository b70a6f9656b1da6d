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


def test_funnel_boundaries(ray_session, tmp_path):
    """Window semantics: click strictly AFTER the first view, at or before
    t1 + W; purchase likewise relative to t2 (the EARLIEST in-window
    click).  W = 1h."""
    W = ev.FUNNEL_WINDOW_US
    d = _write_events(
        tmp_path,
        [
            # user 1: full funnel — second view later must not matter
            (0, 0, 1, "view", 0),
            (1, 10 * MIN, 1, "click", 0),       # t2 = 10min
            (2, 10 * MIN + W, 1, "purchase", 0),  # exactly t2+W: counts
            (3, 20 * MIN, 1, "view", 0),
            # user 2: click exactly AT t1 -> NOT after -> no step 2
            (4, 0, 2, "view", 0),
            (5, 0, 2, "click", 0),
            # user 3: click exactly at t1+W counts; purchase 1us past t2+W
            # does not
            (6, 0, 3, "view", 0),
            (7, W, 3, "click", 0),
            (8, 2 * W + 1, 3, "purchase", 0),
            # user 4: purchase before ANY view: step-1 only after its view
            (9, 0, 4, "purchase", 0),
            (10, 1 * MIN, 4, "view", 0),
            # user 5: click only, never views -> no steps at all
            (11, 0, 5, "click", 0),
        ],
    )
    out = ev.funnel_conversion(d).to_pandas().set_index("step")["n_users"]
    assert out.loc[1] == 4  # users 1,2,3,4 viewed
    assert out.loc[2] == 2  # users 1,3 clicked in-window
    assert out.loc[3] == 1  # user 1 purchased in-window


def test_funnel_matches_duckdb(ray_session):
    got = ev.funnel_conversion(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = con.sql(ev.funnel_sql_oracle()).df()
    a = got.sort_values("step").reset_index(drop=True)
    b = want.sort_values("step").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # the funnel must be monotone non-increasing
    assert a["n_users"].is_monotonic_decreasing or (a["n_users"].diff().dropna() <= 0).all()


def test_cohort_retention_planted(ray_session, tmp_path):
    DAY = 86_400_000_000
    d = _write_events(
        tmp_path,
        [
            # user 1: first seen day 0, active day 0 (twice: dedup) and day 2
            (0, 0, 1, "view", 0),
            (1, 1 * MIN, 1, "click", 0),
            (2, 2 * DAY, 1, "view", 0),
            # user 2: first seen day 0, active day 0 only
            (3, 5 * HOUR, 2, "view", 0),
            # user 3: first seen day 1, active days 1 and 2
            (4, 1 * DAY, 3, "view", 0),
            (5, 2 * DAY + 1, 3, "view", 0),
        ],
    )
    out = ev.cohort_retention(d).to_pandas()
    cells = {
        (r.cohort_day, r.day_offset): r.n_users for r in out.itertuples()
    }
    assert cells == {
        (0, 0): 2,  # users 1 and 2 on their cohort day
        (0, 2): 1,  # user 1 returns on day 2
        (1, 0): 1,  # user 3 cohort day
        (1, 1): 1,  # user 3 returns next day
    }


def test_cohort_retention_matches_duckdb(ray_session):
    got = ev.cohort_retention(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = con.sql(ev.cohort_retention_sql_oracle()).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_event_transitions_planted(ray_session, tmp_path):
    # user 1: a -> b -> b -> a (transitions ab, bb, ba); user 2: c alone
    # (no transition); user 3: a -> b (another ab).  Cross-user pairs must
    # NOT count even when adjacent in time.
    d = _write_events(
        tmp_path,
        [
            (0, 0, 1, "a", 0.0),
            (1, 1 * MIN, 1, "b", 0.0),
            (2, 2 * MIN, 1, "b", 0.0),
            (3, 3 * MIN, 1, "a", 0.0),
            (4, 90 * US, 2, "c", 0.0),  # interleaved between user 1's events
            (5, 0, 3, "a", 0.0),
            (6, 1 * MIN, 3, "b", 0.0),
        ],
    )
    out = (
        ev.event_transitions(d)
        .to_pandas()
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )
    assert list(map(tuple, out.itertuples(index=False))) == [
        ("a", "b", 2),
        ("b", "a", 1),
        ("b", "b", 1),
    ]


def test_event_transitions_matches_duckdb(ray_session):
    ours = (
        ev.event_transitions(SF)
        .to_pandas()
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    theirs = (
        con.sql(ev.event_transitions_sql_oracle())
        .df()
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(ours, theirs)


def test_hopping_windows_membership(ray_session, tmp_path):
    """Each event lands in exactly window/hop overlapping windows; counts,
    cents and distinct users are exact on a planted boundary corpus."""
    # ts at exactly a hop boundary, mid-hop, and one spanning repeat users
    d = _write_events(
        tmp_path,
        [
            (0, 0, 1, "view", 1.125),          # exact .5: half-away -> 113
            (1, 15 * MIN, 1, "view", 2.0),     # exact hop boundary
            (2, 17 * MIN, 2, "view", 4.0),
            (3, 3 * HOUR, 2, "buy", 8.0),
            (4, 3 * HOUR, 2, "buy", 8.0),      # same user same window
        ],
    )
    out = ev.hopping_windows(d).to_pandas()
    # brute force: event at t belongs to starts floor(t,hop)-i*hop, i<4
    import collections

    want = collections.defaultdict(lambda: [0, 0, set()])
    rows = [(0, 1, "view", 113), (15 * MIN, 1, "view", 200),
            (17 * MIN, 2, "view", 400), (3 * HOUR, 2, "buy", 800),
            (3 * HOUR, 2, "buy", 800)]
    for t, u, ty, c in rows:
        base = t - t % (15 * MIN)
        for i in range(4):
            k = (base - i * 15 * MIN, ty)
            want[k][0] += 1
            want[k][1] += c
            want[k][2].add(u)
    got = {
        # pandas Timestamp.value is ns; planted ts keys are us
        (int(pd.Timestamp(r.window_start).value // 1000), r.event_type): (
            r.n_events,
            r.cents_sum,
            r.n_users,
        )
        for r in out.itertuples()
    }
    assert got == {k: (n, c, len(us)) for k, (n, c, us) in want.items()}


def test_hopping_windows_match_duckdb(ray_session):
    import __ray_entry__ as E

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = (
        con.sql(E.oracle_sql()["hopping_windows"])
        .df()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    got = (
        ev.hopping_windows(SF)
        .to_pandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)[want.columns.tolist()]
    )
    pd.testing.assert_frame_equal(
        got.astype({"n_events": "int64", "cents_sum": "int64", "n_users": "int64"}),
        want.astype({"n_events": "int64", "cents_sum": "int64", "n_users": "int64"}),
    )


def test_gap_fill_daily_fills_planted_hole(ray_session, tmp_path):
    """A type with no events on an interior day gets an n=0 row; the grid
    spans the GLOBAL [min,max] day range for every type."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from index_ray.pipelines.events import gap_fill_daily

    d = tmp_path / "gapf"
    d.mkdir()
    ts = pd.to_datetime(
        ["2024-03-01 10:00", "2024-03-03 11:00",  # 'a' misses 03-02
         "2024-03-02 09:00"]                        # 'b' only on 03-02
    )
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(ts, pa.timestamp("us")),
                "event_type": pa.array(["a", "a", "b"], pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    got = gap_fill_daily(str(d)).to_pandas()
    cells = {(r.event_type, r.day): r.n for r in got.itertuples()}
    assert len(got) == 6  # 2 types x 3 days
    assert cells[("a", "2024-03-02")] == 0
    assert cells[("b", "2024-03-01")] == 0 and cells[("b", "2024-03-03")] == 0
    assert cells[("a", "2024-03-01")] == 1 and cells[("b", "2024-03-02")] == 1


def test_ohlc_bars_order_sensitivity_across_batches(ray_session, tmp_path):
    """open/close must honor (ts, event_id) order even when a bar's first
    and last events land in different input batches (partial-merge path),
    including exact-ts ties broken by event_id."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from index_ray.pipelines.events import ohlc_bars

    d = tmp_path / "ohlc"
    d.mkdir()
    ts = pd.to_datetime(
        ["2024-01-01 10:05", "2024-01-01 10:05",  # tie: ids 2 < 5
         "2024-01-01 10:50", "2024-01-01 10:20"]
    )
    # two files force separate read batches -> the combine path runs
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(ts[:2], pa.timestamp("us")),
                "event_id": pa.array([5, 2], pa.int64()),
                "event_type": pa.array(["a", "a"], pa.string()),
                "value": pa.array([9.0, 1.0], pa.float64()),
            }
        ),
        str(d / "events.parquet"),
    )
    got1 = ohlc_bars(str(d)).to_pandas()
    assert got1.loc[0, "open"] == 1.0   # id 2 wins the ts tie
    assert got1.loc[0, "close"] == 9.0  # id 5 is last
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(ts, pa.timestamp("us")),
                "event_id": pa.array([5, 2, 7, 3], pa.int64()),
                "event_type": pa.array(["a"] * 4, pa.string()),
                "value": pa.array([9.0, 1.0, 4.0, 25.0], pa.float64()),
            }
        ),
        str(d / "events.parquet"),
    )
    got = ohlc_bars(str(d)).to_pandas()
    row = got.iloc[0]
    assert (row["open"], row["high"], row["low"], row["close"], row["n"]) == (
        1.0, 25.0, 1.0, 4.0, 4,
    )


def test_ewma_recursive_definition(ray_session, tmp_path):
    """Engine EWMA == the literal recursion e_i = (v_i + e_{i-1}) / 2
    seeded at the window's oldest event — users below, at, and above the
    16-event window."""
    rows = []
    eid = 0
    vals = {1: [10.0], 2: [1.0, 2.0, 3.0], 3: [float(i) for i in range(1, 25)]}
    for uid, vs in vals.items():
        for i, v in enumerate(vs):
            rows.append((eid, i * US, uid, "c", v))
            eid += 1
    sf = _write_events(tmp_path, rows)
    got = (
        ev.ewma_user_value(sf)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    for uid, vs in vals.items():
        cents = [round(v * 100) for v in vs][-16:]
        e = float(cents[0])
        for c in cents[1:]:
            e = (c + e) / 2.0
        r = got[got.user_id == uid].iloc[0]
        assert int(r.n_used) == len(cents)
        assert float(r.ewma_cents) == e  # bitwise: dyadic rational
