"""Time-ordered operators over the events stream: sessionization, as-of
join, and interval (range) join — the custom operators Ray Data's Dataset
API lacks natively, built as one hash-bucket shuffle + vectorized
within-bucket kernels.

All three need per-user time ordering, which Ray Data cannot express as a
stateless batch map: rows of one user may span input blocks.  The shape
used here (and the partitioning assumption it relies on):

- a streaming ``map_batches`` pass tags each row with
  ``bucket = hash(user_id) % B`` — the ONLY shuffle key, reused across all
  three operators so a pipeline chaining them shuffles once;
- ``groupby(bucket).map_groups`` lands every row of a user in exactly one
  group; inside, a single ``np.lexsort`` by ``(user, ts, ...)`` restores
  order and every kernel below is O(n log n) vectorized numpy — the
  per-group Python overhead is O(B), never O(users) (same bucketing
  argument as ``join.hash_join``).

At 100 TB the bucket count bounds the largest group: B should be sized so
the heaviest user-set per bucket fits a worker (B ≈ 2-4x cluster cores;
a single user hotter than a worker's memory needs time-sliced sessioning,
which these kernels support by construction — sessions/windows never span
a gap, so time-sliced re-bucketing splits only at gap boundaries).

Money is exact integer cents (DuckDB ``round()`` half-away-from-zero
semantics) so every operator hash-compares against its SQL oracle.

Reference parity note: the reference engine has no event-stream operators
(crawler+index only); these are the training-data-pipeline extensions the
engine needs at scale (windowed aggregation over arrival streams is the
same pattern the reference's chunk rotation applies to documents,
``/root/reference/index.cpp:60-76``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .join import _knuth_bucket
from .relational import _cents

_BUCKET = "__ebucket__"
SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min
WINDOW_US = 24 * 3600 * 1_000_000  # 24 h


def _tagged_events(sf_dir: str, columns: list[str], num_buckets: int) -> ray.data.Dataset:
    """Pruned events read + bucket tag (the one shuffle key)."""

    def tag(batch: pa.Table) -> pa.Table:
        b = _knuth_bucket(
            batch["user_id"].to_numpy(zero_copy_only=False), num_buckets
        )
        return batch.append_column(_BUCKET, pa.array(b))

    return ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=columns
    ).map_batches(tag, batch_format="pyarrow", batch_size=16384)


def _ts_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    return pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)


def _user_segments(u: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(new_user bool mask, per-row user-segment index) over sorted users."""
    new_user = np.empty(len(u), dtype=bool)
    new_user[0] = True
    np.not_equal(u[1:], u[:-1], out=new_user[1:])
    return new_user, np.cumsum(new_user) - 1


def _session_bounds(
    u: np.ndarray, t: np.ndarray, gap_us: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Gap-sessionization math over USER-SORTED (u, t): (starts, ends, seq)
    — session start/end row indices and the 1-based per-user session rank.
    The ONE copy of the new-session rule (> gap_us silence), shared by
    ``sessionize`` and ``session_concurrency`` so their session_seq can
    never desynchronize."""
    new_user, useg = _user_segments(u)
    dt = np.empty(len(t), dtype=np.int64)
    dt[0] = 0
    np.subtract(t[1:], t[:-1], out=dt[1:])
    new_s = new_user | (dt > gap_us)
    sid = np.cumsum(new_s) - 1
    starts = np.flatnonzero(new_s)
    ends = np.append(starts[1:], len(t)) - 1
    user_starts = np.flatnonzero(new_user)
    seq = sid[starts] - sid[user_starts][useg[starts]] + 1
    return starts, ends, seq


# ---------------------------------------------------------------- sessions


def sessionize(sf_dir: str, gap_us: int = SESSION_GAP_US) -> ray.data.Dataset:
    """Gap-based sessionization: a >gap_us silence starts a new session.

    Output: (user_id, session_seq, n_events, duration_us, value_cents) —
    session_seq numbers a user's sessions 1..k in time order.
    """

    def sessions(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return _SESSION_SCHEMA.empty_table()
        u = group["user_id"].to_numpy(zero_copy_only=False)
        t = _ts_us(group["ts"])
        e = group["event_id"].to_numpy(zero_copy_only=False)
        c = _cents(group["value"]).to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, u))
        u, t, c = u[order], t[order], c[order]
        starts, ends, seq = _session_bounds(u, t, gap_us)
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "session_seq": pa.array(seq, pa.int64()),
                "n_events": pa.array(np.diff(np.append(starts, len(t))), pa.int64()),
                "duration_us": pa.array(t[ends] - t[starts], pa.int64()),
                "value_cents": pa.array(np.add.reduceat(c, starts), pa.int64()),
            }
        )

    return (
        _tagged_events(sf_dir, ["user_id", "ts", "event_id", "value"], 64)
        .groupby(_BUCKET)
        .map_groups(sessions, batch_format="pyarrow")
    )


_SESSION_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("session_seq", pa.int64()),
        ("n_events", pa.int64()),
        ("duration_us", pa.int64()),
        ("value_cents", pa.int64()),
    ]
)


def sessionize_sql_oracle(gap_us: int = SESSION_GAP_US) -> str:
    return f"""
        WITH o AS (
          SELECT user_id, ts, event_id, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_us}
                      THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT user_id, ts, value,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
          FROM o
        )
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS duration_us,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        FROM s GROUP BY user_id, session_seq
    """


# ---------------------------------------------------------------- as-of join


def asof_purchase_click(sf_dir: str) -> ray.data.Dataset:
    """As-of join: each purchase matched to the user's most recent click at
    or before it (ties: largest event_id; click-at-same-ts is visible).

    Output: (event_id, user_id, click_event_id, lag_us) — -1 when the user
    has no prior click.  The kernel is a merged-sort sweep: both sides in
    one (user, ts, side, event_id) lexsort, a click-cumsum gives every
    purchase its predecessor in O(n) with no per-user loop.
    """

    def asof(group: pa.Table) -> pa.Table:
        m = pc.is_in(group["event_type"], pa.array(["click", "purchase"]))
        group = group.filter(m)
        if len(group) == 0:
            return _ASOF_SCHEMA.empty_table()
        u = group["user_id"].to_numpy(zero_copy_only=False)
        t = _ts_us(group["ts"])
        e = group["event_id"].to_numpy(zero_copy_only=False)
        side = pc.equal(group["event_type"], pa.scalar("purchase")).to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((e, side, t, u))
        u, t, e, side = u[order], t[order], e[order], side[order]
        is_click = ~side
        cum = np.cumsum(is_click)  # clicks at-or-before each row
        new_user, useg = _user_segments(u)
        user_starts = np.flatnonzero(new_user)
        cum_base = np.where(user_starts > 0, cum[user_starts - 1], 0)
        p = np.flatnonzero(side)
        click_e, click_t = e[is_click], t[is_click]
        if click_e.size:
            have = cum[p] - cum_base[useg[p]] > 0
            midx = np.maximum(cum[p] - 1, 0)
            matched = np.where(have, click_e[midx], -1)
            lag = np.where(have, t[p] - click_t[midx], -1)
        else:  # bucket holds purchases only (np.where evaluates both arms)
            matched = np.full(len(p), -1, dtype=np.int64)
            lag = matched
        return pa.table(
            {
                "event_id": pa.array(e[p], pa.int64()),
                "user_id": pa.array(u[p], pa.int64()),
                "click_event_id": pa.array(matched, pa.int64()),
                "lag_us": pa.array(lag, pa.int64()),
            }
        )

    return (
        _tagged_events(sf_dir, ["user_id", "ts", "event_id", "event_type"], 64)
        .groupby(_BUCKET)
        .map_groups(asof, batch_format="pyarrow")
    )


_ASOF_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("click_event_id", pa.int64()),
        ("lag_us", pa.int64()),
    ]
)


def asof_sql_oracle() -> str:
    return """
        WITH u AS (
          SELECT user_id, ts, event_id, event_type,
                 CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side
          FROM events WHERE event_type IN ('click', 'purchase')
        ), w AS (
          SELECT user_id, ts, event_id, event_type,
                 last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
                   OVER win AS prev_click,
                 last_value(CASE WHEN side = 0 THEN epoch_us(ts) END IGNORE NULLS)
                   OVER win AS prev_ts_us
          FROM u
          WINDOW win AS (PARTITION BY user_id ORDER BY ts, side, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT event_id, user_id,
               CAST(coalesce(prev_click, -1) AS BIGINT) AS click_event_id,
               CAST(coalesce(epoch_us(ts) - prev_ts_us, -1) AS BIGINT) AS lag_us
        FROM w WHERE event_type = 'purchase'
    """


# ---------------------------------------------------------------- range join


def events_in_signup_window(
    sf_dir: str, window_us: int = WINDOW_US
) -> ray.data.Dataset:
    """Interval (range) join: each signup opens a [ts, ts+window) window;
    count/sum all of that user's events inside it (the signup included).

    Output: (window_id, user_id, n_in_window, value_cents).  Kernel: one
    sort + two ``searchsorted`` calls over a composite (user-segment, ts)
    key — each window is a half-open slice of the sorted stream, so counts
    and sums come from index differences and a prefix-sum, never a
    pairwise expansion.  Falls back to a per-user sweep if the composite
    key cannot fit int64 (pathological time ranges).
    """

    def windows(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return _WINDOW_SCHEMA.empty_table()
        u = group["user_id"].to_numpy(zero_copy_only=False)
        t = _ts_us(group["ts"])
        e = group["event_id"].to_numpy(zero_copy_only=False)
        c = _cents(group["value"]).to_numpy(zero_copy_only=False)
        sig = pc.equal(group["event_type"], pa.scalar("signup")).to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((e, t, u))
        u, t, e, c, sig = u[order], t[order], e[order], c[order], sig[order]
        _, useg = _user_segments(u)
        tmin = int(t.min())
        span = int(t.max()) - tmin + window_us + 2
        pref = np.concatenate(([0], np.cumsum(c)))
        s = np.flatnonzero(sig)
        if (useg[-1] + 1) * span < 1 << 62:
            k = useg * span + (t - tmin)
            lo = np.searchsorted(k, k[s])
            hi = np.searchsorted(k, k[s] + window_us)
        else:  # composite key would overflow: per-user slices instead
            lo = np.empty(len(s), np.int64)
            hi = np.empty(len(s), np.int64)
            ustarts = np.flatnonzero(np.append(True, u[1:] != u[:-1]))
            uends = np.append(ustarts[1:], len(u))
            for a, b in zip(ustarts, uends):
                inw = (s >= a) & (s < b)
                lo[inw] = a + np.searchsorted(t[a:b], t[s[inw]])
                hi[inw] = a + np.searchsorted(t[a:b], t[s[inw]] + window_us)
        return pa.table(
            {
                "window_id": pa.array(e[s], pa.int64()),
                "user_id": pa.array(u[s], pa.int64()),
                "n_in_window": pa.array(hi - lo, pa.int64()),
                "value_cents": pa.array(pref[hi] - pref[lo], pa.int64()),
            }
        )

    return (
        _tagged_events(
            sf_dir, ["user_id", "ts", "event_id", "event_type", "value"], 64
        )
        .groupby(_BUCKET)
        .map_groups(windows, batch_format="pyarrow")
    )


_WINDOW_SCHEMA = pa.schema(
    [
        ("window_id", pa.int64()),
        ("user_id", pa.int64()),
        ("n_in_window", pa.int64()),
        ("value_cents", pa.int64()),
    ]
)


def value_percentiles(sf_dir: str) -> ray.data.Dataset:
    """Exact distributed percentiles of value_cents per event_type via a
    bounded-integer histogram combine.

    Money-in-cents has a bounded integer domain, so a per-batch
    ``(event_type, cents) -> count`` partial collapses each batch to its
    distinct values, one small ``groupby`` sums the histograms, and the
    per-type finalize reads quantiles off the cumulative histogram —
    EXACT (no t-digest error) yet the shuffle moves O(distinct values)
    rows, never O(events).  Quantile definition matches DuckDB
    ``quantile_disc``: smallest v with cum_count(v) >= ceil(q * n).
    Output: (event_type, n, p50_cents, p90_cents, p99_cents).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"event_type": batch["event_type"], "cents": _cents(batch["value"])}
        )
        g = t.group_by(["event_type", "cents"], use_threads=False).aggregate(
            [("cents", "count")]
        )
        return g.rename_columns(["event_type", "cents", "cnt"])

    def finalize(group: pa.Table) -> pa.Table:
        v = group["cents"].to_numpy(zero_copy_only=False)
        cnt = group["cnt"].to_numpy(zero_copy_only=False)
        order = np.argsort(v)
        v, cnt = v[order], cnt[order]
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        picks = [
            int(v[np.searchsorted(cum, int(np.ceil(q * n)))])
            for q in (0.5, 0.9, 0.99)
        ]
        return pa.table(
            {
                "event_type": pa.array([group["event_type"][0].as_py()]),
                "n": pa.array([n], pa.int64()),
                "p50_cents": pa.array([picks[0]], pa.int64()),
                "p90_cents": pa.array([picks[1]], pa.int64()),
                "p99_cents": pa.array([picks[2]], pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby(["event_type", "cents"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .groupby("event_type")
        .map_groups(finalize, batch_format="pyarrow")
    )


def value_percentiles_sql_oracle() -> str:
    return """
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(quantile_disc(CAST(round(value * 100) AS BIGINT), 0.5) AS BIGINT) AS p50_cents,
               CAST(quantile_disc(CAST(round(value * 100) AS BIGINT), 0.9) AS BIGINT) AS p90_cents,
               CAST(quantile_disc(CAST(round(value * 100) AS BIGINT), 0.99) AS BIGINT) AS p99_cents
        FROM events GROUP BY 1
    """


ROLLING_US = 3 * 24 * 3600 * 1_000_000  # 3 days


def rolling_user_value(sf_dir: str, window_us: int = ROLLING_US) -> ray.data.Dataset:
    """Sliding (RANGE) window aggregate: for EVERY event, the count and
    cents-sum of the same user's events in ``[ts - window_us, ts]`` —
    peers at an identical ts are included, matching SQL ``RANGE BETWEEN w
    PRECEDING AND CURRENT ROW`` frame semantics.

    Output: (event_id, user_id, n_in_window, value_cents).  Kernel: the
    same composite (user-segment, ts) key as the range join — two
    vectorized ``searchsorted`` sweeps give every row its frame as a
    half-open slice, and a prefix-sum turns slices into sums; O(n log n)
    per bucket, no per-row Python.
    """

    def rolling(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return _ROLLING_SCHEMA.empty_table()
        u = group["user_id"].to_numpy(zero_copy_only=False)
        t = _ts_us(group["ts"])
        e = group["event_id"].to_numpy(zero_copy_only=False)
        c = _cents(group["value"]).to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, u))
        u, t, e, c = u[order], t[order], e[order], c[order]
        _, useg = _user_segments(u)
        tmin = int(t.min())
        span = int(t.max()) - tmin + window_us + 2
        pref = np.concatenate(([0], np.cumsum(c)))
        if (useg[-1] + 1) * span < 1 << 62:
            k = useg * span + (t - tmin)
            lo = np.searchsorted(k, k - window_us, side="left")
            hi = np.searchsorted(k, k, side="right")
        else:  # composite key would overflow: per-user slices instead
            lo = np.empty(len(t), np.int64)
            hi = np.empty(len(t), np.int64)
            ustarts = np.flatnonzero(np.append(True, u[1:] != u[:-1]))
            uends = np.append(ustarts[1:], len(u))
            for a, b in zip(ustarts, uends):
                lo[a:b] = a + np.searchsorted(t[a:b], t[a:b] - window_us, "left")
                hi[a:b] = a + np.searchsorted(t[a:b], t[a:b], "right")
        return pa.table(
            {
                "event_id": pa.array(e, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "n_in_window": pa.array(hi - lo, pa.int64()),
                "value_cents": pa.array(pref[hi] - pref[lo], pa.int64()),
            }
        )

    return (
        _tagged_events(sf_dir, ["user_id", "ts", "event_id", "value"], 64)
        .groupby(_BUCKET)
        .map_groups(rolling, batch_format="pyarrow")
    )


_ROLLING_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("n_in_window", pa.int64()),
        ("value_cents", pa.int64()),
    ]
)


def rolling_sql_oracle(window_us: int = ROLLING_US) -> str:
    return f"""
        SELECT event_id, user_id,
               CAST(count(*) OVER win AS BIGINT) AS n_in_window,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER win AS BIGINT)
                 AS value_cents
        FROM events
        WINDOW win AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                       RANGE BETWEEN {window_us} PRECEDING AND CURRENT ROW)
    """


def distinct_users_daily(sf_dir: str) -> ray.data.Dataset:
    """EXACT grouped count-distinct: (event_type, day, n_users).

    Two-level shuffle: a per-batch ``group_by`` collapses each batch to
    its distinct (event_type, day, user_id) triples (the partial), one
    groupby dedups them globally, and a second tiny groupby counts users
    per (event_type, day).  The shuffle moves O(distinct triples), never
    O(events) — the exact counterpart of ``sketches.distinct_users_hll``
    (which moves O(registers) but answers approximately).
    """
    from ray.data.aggregate import Sum

    def triples(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "day": pc.strftime(batch["ts"], format="%Y-%m-%d"),
                "user_id": batch["user_id"],
            }
        )
        return t.group_by(
            ["event_type", "day", "user_id"], use_threads=False
        ).aggregate([])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type", "day"], use_threads=False).aggregate(
            [("user_id", "count")]
        )
        return g.rename_columns(["event_type", "day", "n_part"])

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts", "user_id"]
        )
        .map_batches(triples, batch_format="pyarrow", batch_size=16384)
        .groupby(["event_type", "day", "user_id"])
        .count()
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Sum("n_part", alias_name="n_users"))
    )


def distinct_users_daily_sql_oracle() -> str:
    return """
        SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY 1, 2
    """


def signup_window_sql_oracle(window_us: int = WINDOW_US) -> str:
    return f"""
        SELECT s.event_id AS window_id, s.user_id,
               CAST(count(*) AS BIGINT) AS n_in_window,
               CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'signup') s
        JOIN events e
          ON e.user_id = s.user_id
         AND e.ts >= s.ts
         AND epoch_us(e.ts) < epoch_us(s.ts) + {window_us}
        GROUP BY 1, 2
    """


# -------------------------------------------- cumulative / lag windows


def running_user_total(sf_dir: str) -> ray.data.Dataset:
    """Cumulative SQL window: per event, the running count and cents-sum of
    the same user's events up to AND INCLUDING it, in (ts, event_id) order
    — ``ROWS UNBOUNDED PRECEDING`` frame semantics.

    Output: (event_id, user_id, running_n, running_cents).  Same one
    user-bucket shuffle as the other event operators; inside a bucket the
    kernel is a lexsort plus one segment-reset cumulative sum.
    """

    def running(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return _RUNNING_SCHEMA.empty_table()
        u = group["user_id"].to_numpy(zero_copy_only=False)
        t = _ts_us(group["ts"])
        e = group["event_id"].to_numpy(zero_copy_only=False)
        c = _cents(group["value"]).to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, u))
        u, e, c = u[order], e[order], c[order]
        new_user, useg = _user_segments(u)
        starts = np.flatnonzero(new_user)
        idx = np.arange(len(u))
        running_n = idx - np.repeat(starts, np.diff(np.append(starts, len(u)))) + 1
        cum = np.cumsum(c)
        base = np.zeros(len(starts), dtype=np.int64)
        base[1:] = cum[starts[1:] - 1]
        running_c = cum - np.repeat(base, np.diff(np.append(starts, len(u))))
        return pa.table(
            {
                "event_id": pa.array(e, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "running_n": pa.array(running_n, pa.int64()),
                "running_cents": pa.array(running_c, pa.int64()),
            }
        )

    return (
        _tagged_events(sf_dir, ["user_id", "ts", "event_id", "value"], 64)
        .groupby(_BUCKET)
        .map_groups(running, batch_format="pyarrow")
    )


_RUNNING_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("running_n", pa.int64()),
        ("running_cents", pa.int64()),
    ]
)


def running_user_total_sql_oracle() -> str:
    return """
        SELECT event_id, user_id,
               CAST(count(*) OVER w AS BIGINT) AS running_n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
                 AS running_cents
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)
    """


def event_gaps(sf_dir: str) -> ray.data.Dataset:
    """LAG window: per event, microseconds since the same user's previous
    event (-1 for the user's first event) — (event_id, user_id, gap_us).

    The lag is one shifted subtraction over the lexsorted bucket; the
    session-gap distribution this yields is the standard input to
    activity modeling and bot filtering.
    """

    def gaps(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return _GAPS_SCHEMA.empty_table()
        u = group["user_id"].to_numpy(zero_copy_only=False)
        t = _ts_us(group["ts"])
        e = group["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, u))
        u, t, e = u[order], t[order], e[order]
        new_user, _ = _user_segments(u)
        gap = np.empty(len(t), dtype=np.int64)
        gap[0] = -1
        np.subtract(t[1:], t[:-1], out=gap[1:])
        gap[new_user] = -1
        return pa.table(
            {
                "event_id": pa.array(e, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "gap_us": pa.array(gap, pa.int64()),
            }
        )

    return (
        _tagged_events(sf_dir, ["user_id", "ts", "event_id"], 64)
        .groupby(_BUCKET)
        .map_groups(gaps, batch_format="pyarrow")
    )


_GAPS_SCHEMA = pa.schema(
    [("event_id", pa.int64()), ("user_id", pa.int64()), ("gap_us", pa.int64())]
)


def event_gaps_sql_oracle() -> str:
    return """
        SELECT event_id, user_id,
               CAST(coalesce(date_diff('microsecond',
                      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                      ts), -1) AS BIGINT) AS gap_us
        FROM events
    """


# ------------------------------------------------- interval (band) join ----

CONC_BUCKET_US = 3600 * 1_000_000  # 1 h time-domain buckets


def session_concurrency(
    sf_dir: str,
    gap_us: int = SESSION_GAP_US,
    bucket_us: int = CONC_BUCKET_US,
) -> ray.data.Dataset:
    """KEYLESS interval join: for every session, how many events — from ANY
    user — fall inside its [t_start, t_end] span (its own included).

    (user_id, session_seq, n_window_events).  The equality-free band join
    ``e.ts BETWEEN s.t_start AND s.t_end`` cannot ride the user-bucket
    shuffle the other event operators share; the distributed shape is
    time-domain bucketing with interval replication:

    - events land in exactly ONE time bucket (``ts // bucket_us``);
    - each session interval is REPLICATED to every bucket it overlaps
      (replication factor = interval span / bucket width, small for
      gap-bounded sessions);
    - per bucket, one sorted-array searchsorted counts each interval's
      events in that bucket — partials are exact because event buckets
      partition the timeline;
    - a final (user_id, session_seq) bucket shuffle sums the partials.

    Bucket width trades replication against skew: at 100 TB pick
    ``bucket_us`` so one bucket's events fit a worker (the kernel is
    O(n log n) in the bucket).  Both sides cross the object store once.
    """

    def intervals(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return _INTERVAL_SCHEMA.empty_table()
        u = group["user_id"].to_numpy(zero_copy_only=False)
        t = _ts_us(group["ts"])
        e = group["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, u))
        u, t = u[order], t[order]
        starts, ends, seq = _session_bounds(u, t, gap_us)
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "session_seq": pa.array(seq, pa.int64()),
                "t_start": pa.array(t[starts], pa.int64()),
                "t_end": pa.array(t[ends], pa.int64()),
            }
        )

    iv = (
        _tagged_events(sf_dir, ["user_id", "ts", "event_id"], 64)
        .groupby(_BUCKET)
        .map_groups(intervals, batch_format="pyarrow")
    )

    def replicate(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _SIDE_SCHEMA.empty_table()
        s = batch["t_start"].to_numpy()
        e = batch["t_end"].to_numpy()
        b0 = s // bucket_us
        nrep = (e // bucket_us - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(batch)), nrep)
        offs = np.arange(len(idx)) - np.repeat(
            np.concatenate([[0], np.cumsum(nrep)[:-1]]), nrep
        )
        return pa.table(
            {
                "tbucket": pa.array(b0[idx] + offs, pa.int64()),
                "side": pa.array(np.ones(len(idx), np.int8)),
                "ts": pa.array(np.zeros(len(idx), np.int64)),
                "user_id": pa.array(
                    batch["user_id"].to_numpy()[idx], pa.int64()
                ),
                "session_seq": pa.array(
                    batch["session_seq"].to_numpy()[idx], pa.int64()
                ),
                "t_start": pa.array(s[idx], pa.int64()),
                "t_end": pa.array(e[idx], pa.int64()),
            }
        )

    def tag_events(batch: pa.Table) -> pa.Table:
        t = _ts_us(batch["ts"])
        z = np.zeros(len(batch), np.int64)
        return pa.table(
            {
                "tbucket": pa.array(t // bucket_us, pa.int64()),
                "side": pa.array(np.zeros(len(batch), np.int8)),
                "ts": pa.array(t, pa.int64()),
                "user_id": pa.array(z, pa.int64()),
                "session_seq": pa.array(z, pa.int64()),
                "t_start": pa.array(z, pa.int64()),
                "t_end": pa.array(z, pa.int64()),
            }
        )

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts"]
    ).map_batches(tag_events, batch_format="pyarrow", batch_size=16384)
    both = ev.union(iv.map_batches(replicate, batch_format="pyarrow"))

    def count_bucket(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return _PARTIAL_SCHEMA.empty_table()
        side = group["side"].to_numpy(zero_copy_only=False)
        ts = np.sort(group["ts"].to_numpy(zero_copy_only=False)[side == 0])
        ivm = side == 1
        lo = np.searchsorted(ts, group["t_start"].to_numpy()[ivm], "left")
        hi = np.searchsorted(ts, group["t_end"].to_numpy()[ivm], "right")
        return pa.table(
            {
                "user_id": pa.array(group["user_id"].to_numpy()[ivm], pa.int64()),
                "session_seq": pa.array(
                    group["session_seq"].to_numpy()[ivm], pa.int64()
                ),
                "n_part": pa.array((hi - lo).astype(np.int64), pa.int64()),
            }
        )

    partials = both.groupby("tbucket").map_groups(
        count_bucket, batch_format="pyarrow"
    )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # 0-row blocks may arrive schema-less
            return pa.schema(
                [
                    ("user_id", pa.int64()),
                    ("session_seq", pa.int64()),
                    ("n_window_events", pa.int64()),
                ]
            ).empty_table()
        g = t.group_by(["user_id", "session_seq"]).aggregate([("n_part", "sum")])
        return g.rename_columns(["user_id", "session_seq", "n_window_events"])

    from ..util import hash_groupby

    return hash_groupby(partials, ["user_id", "session_seq"], fold)


_INTERVAL_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("session_seq", pa.int64()),
        ("t_start", pa.int64()),
        ("t_end", pa.int64()),
    ]
)

_SIDE_SCHEMA = pa.schema(
    [
        ("tbucket", pa.int64()),
        ("side", pa.int8()),
        ("ts", pa.int64()),
        ("user_id", pa.int64()),
        ("session_seq", pa.int64()),
        ("t_start", pa.int64()),
        ("t_end", pa.int64()),
    ]
)

_PARTIAL_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("session_seq", pa.int64()),
        ("n_part", pa.int64()),
    ]
)


def session_concurrency_sql_oracle(gap_us: int = SESSION_GAP_US) -> str:
    return f"""
        WITH o AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_us}
                      THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT user_id, ts,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
          FROM o
        ), iv AS (
          SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                 min(ts) AS t_start, max(ts) AS t_end
          FROM s GROUP BY user_id, session_seq
        )
        SELECT iv.user_id, iv.session_seq,
               CAST(count(*) AS BIGINT) AS n_window_events
        FROM iv JOIN events e ON e.ts >= iv.t_start AND e.ts <= iv.t_end
        GROUP BY iv.user_id, iv.session_seq
    """


# ---------------------------------------------- group-aggregate filtering ----

_OUTLIER_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("value_cents", pa.int64()),
        ("user_n", pa.int64()),
        ("user_sum_cents", pa.int64()),
    ]
)


def user_outlier_events(sf_dir: str) -> ray.data.Dataset:
    """Per-user outlier events: rows whose value exceeds 2x their user's
    mean — the filter-by-group-aggregate pattern resolved in ONE
    co-located pass: the user-bucket shuffle already puts every row of a
    user in one group, so the aggregate and the row filter run together
    (no second shuffle, no join back to the fact table).

    (event_id, user_id, value_cents, user_n, user_sum_cents), keeping
    events with value_cents * user_n > 2 * user_sum_cents — the mean
    comparison cleared of division so the predicate is integer-exact.
    """

    def outliers(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return _OUTLIER_SCHEMA.empty_table()
        u = group["user_id"].to_numpy(zero_copy_only=False)
        e = group["event_id"].to_numpy(zero_copy_only=False)
        c = _cents(group["value"]).to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="stable")
        u, e, c = u[order], e[order], c[order]
        _, useg = _user_segments(u)
        n_user = np.bincount(useg)
        sum_user = np.bincount(useg, weights=c).astype(np.int64)
        keep = c * n_user[useg] > 2 * sum_user[useg]
        return pa.table(
            {
                "event_id": pa.array(e[keep], pa.int64()),
                "user_id": pa.array(u[keep], pa.int64()),
                "value_cents": pa.array(c[keep], pa.int64()),
                "user_n": pa.array(n_user[useg][keep], pa.int64()),
                "user_sum_cents": pa.array(sum_user[useg][keep], pa.int64()),
            }
        )

    return (
        _tagged_events(sf_dir, ["user_id", "event_id", "value"], 64)
        .groupby(_BUCKET)
        .map_groups(outliers, batch_format="pyarrow")
    )


def user_outlier_events_sql_oracle() -> str:
    return """
        WITH c AS (
          SELECT event_id, user_id,
                 CAST(round(value * 100) AS BIGINT) AS value_cents
          FROM events
        ),
        u AS (
          SELECT user_id, count(*) AS user_n,
                 CAST(sum(value_cents) AS BIGINT) AS user_sum_cents
          FROM c GROUP BY user_id
        )
        SELECT c.event_id, c.user_id, c.value_cents, u.user_n, u.user_sum_cents
        FROM c JOIN u USING (user_id)
        WHERE c.value_cents * u.user_n > 2 * u.user_sum_cents
        ORDER BY c.event_id
    """


# ------------------------------------------------------------------ funnel

FUNNEL_STEPS: tuple[str, str, str] = ("view", "click", "purchase")
FUNNEL_WINDOW_US = 3_600_000_000  # 1 hour per step


def funnel_conversion(sf_dir: str) -> pa.Table:
    """Strictly-ordered earliest-event funnel over the event stream:
    step 1 = users with a 'view'; step 2 = users with a 'click' in
    ``(t1, t1 + W]`` after their FIRST view (t2 = earliest such click);
    step 3 = users with a 'purchase' in ``(t2, t2 + W]``.  Output one row
    per step: (step, n_users).

    Earliest-event semantics make the funnel deterministic and
    SQL-mirrorable (min-aggregations + windowed joins).  Shape: the one
    user-bucket shuffle every event op here shares (users are
    bucket-disjoint, so per-bucket user counts SUM exactly); inside a
    bucket the three steps are np.minimum.at scatter-mins over user
    codes — no per-user loop, no sort required.
    """
    empty = pa.table(
        {"step": pa.array([], pa.int64()), "n_users": pa.array([], pa.int64())}
    )

    def funnel(group: pa.Table) -> pa.Table:
        m = pc.is_in(group["event_type"], pa.array(list(FUNNEL_STEPS)))
        group = group.filter(m)
        if len(group) == 0:
            return empty
        u = group["user_id"].to_numpy(zero_copy_only=False)
        t = _ts_us(group["ts"])
        et = group["event_type"].to_numpy(zero_copy_only=False)
        _uu, uid = np.unique(u, return_inverse=True)
        n = len(_uu)
        inf = np.iinfo(np.int64).max
        w = FUNNEL_WINDOW_US

        t1 = np.full(n, inf, np.int64)
        sel = np.flatnonzero(et == FUNNEL_STEPS[0])
        np.minimum.at(t1, uid[sel], t[sel])

        t2 = np.full(n, inf, np.int64)
        sel = np.flatnonzero(et == FUNNEL_STEPS[1])
        base = t1[uid[sel]]
        fin = np.flatnonzero(base < inf)  # guard BEFORE base+w (overflow)
        sel, base = sel[fin], base[fin]
        good = (t[sel] > base) & (t[sel] <= base + w)
        np.minimum.at(t2, uid[sel[good]], t[sel[good]])

        done = np.zeros(n, bool)
        sel = np.flatnonzero(et == FUNNEL_STEPS[2])
        base = t2[uid[sel]]
        fin = np.flatnonzero(base < inf)
        sel, base = sel[fin], base[fin]
        good = (t[sel] > base) & (t[sel] <= base + w)
        done[uid[sel[good]]] = True

        return pa.table(
            {
                "step": pa.array([1, 2, 3], pa.int64()),
                "n_users": pa.array(
                    [
                        int((t1 < inf).sum()),
                        int((t2 < inf).sum()),
                        int(done.sum()),
                    ],
                    pa.int64(),
                ),
            }
        )

    parts = (
        _tagged_events(sf_dir, ["user_id", "ts", "event_type"], 64)
        .groupby(_BUCKET)
        .map_groups(funnel, batch_format="pyarrow")
        .to_pandas()
    )
    agg = (
        parts.groupby("step", as_index=False)["n_users"]
        .sum()
        .sort_values("step")
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "step": pa.array(agg["step"].astype("int64"), pa.int64()),
            "n_users": pa.array(agg["n_users"].astype("int64"), pa.int64()),
        }
    )


def funnel_sql_oracle() -> str:
    w = FUNNEL_WINDOW_US
    s1, s2, s3 = FUNNEL_STEPS
    return f"""
        WITH e AS (
          SELECT user_id, event_type, epoch_us(ts) AS t FROM events
        ),
        v AS (
          SELECT user_id, min(t) AS t1 FROM e
          WHERE event_type = '{s1}' GROUP BY user_id
        ),
        c AS (
          SELECT e.user_id, min(e.t) AS t2
          FROM e JOIN v USING (user_id)
          WHERE e.event_type = '{s2}' AND e.t > v.t1 AND e.t <= v.t1 + {w}
          GROUP BY e.user_id
        ),
        p AS (
          SELECT DISTINCT e.user_id
          FROM e JOIN c USING (user_id)
          WHERE e.event_type = '{s3}' AND e.t > c.t2 AND e.t <= c.t2 + {w}
        )
        SELECT CAST(1 AS BIGINT) AS step,
               CAST((SELECT count(*) FROM v) AS BIGINT) AS n_users
        UNION ALL SELECT 2, (SELECT count(*) FROM c)
        UNION ALL SELECT 3, (SELECT count(*) FROM p)
        ORDER BY step
    """


# ---------------------------------------------------------------- retention

_DAY_US = 86_400_000_000


def cohort_retention(sf_dir: str) -> pa.Table:
    """Cohort retention matrix: users cohorted by the UTC day of their
    first event; a (cohort_day, day_offset) cell counts the cohort's users
    active (any event) exactly ``offset`` days after their cohort day.
    Output rows: (cohort_day, day_offset, n_users), day as integer
    days-since-epoch (pure int arithmetic — no tz/date functions to
    disagree over).

    Same scale shape as every event op here: ONE user-bucket shuffle;
    users are bucket-disjoint so per-bucket distinct-user counts sum
    exactly.  Per bucket the whole matrix is two np.unique passes —
    (user, day) dedup, then (cohort, offset) counting — no per-user loop.
    """
    empty = pa.table(
        {
            "cohort_day": pa.array([], pa.int64()),
            "day_offset": pa.array([], pa.int64()),
            "n_users": pa.array([], pa.int64()),
        }
    )

    def retention(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return empty
        u = group["user_id"].to_numpy(zero_copy_only=False)
        day = _ts_us(group["ts"]) // _DAY_US
        _uu, uid = np.unique(u, return_inverse=True)
        first = np.full(len(_uu), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(first, uid, day)
        # distinct (user, active-day) pairs -> offsets
        key = uid * (day.max() + 1) + day
        _k, idx = np.unique(key, return_index=True)
        cohort = first[uid[idx]]
        offset = day[idx] - cohort
        # count users per (cohort, offset) — pairs are already distinct
        # per user, so a plain bincount over packed keys is the count
        pk = cohort * (offset.max() + 1) + offset
        cells, counts = np.unique(pk, return_counts=True)
        return pa.table(
            {
                "cohort_day": pa.array(cells // (offset.max() + 1), pa.int64()),
                "day_offset": pa.array(cells % (offset.max() + 1), pa.int64()),
                "n_users": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    parts = (
        _tagged_events(sf_dir, ["user_id", "ts"], 64)
        .groupby(_BUCKET)
        .map_groups(retention, batch_format="pyarrow")
        .to_pandas()
    )
    agg = (
        parts.groupby(["cohort_day", "day_offset"], as_index=False)["n_users"]
        .sum()
        .sort_values(["cohort_day", "day_offset"])
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "cohort_day": pa.array(agg["cohort_day"].astype("int64"), pa.int64()),
            "day_offset": pa.array(agg["day_offset"].astype("int64"), pa.int64()),
            "n_users": pa.array(agg["n_users"].astype("int64"), pa.int64()),
        }
    )


def cohort_retention_sql_oracle() -> str:
    return f"""
        WITH e AS (
          SELECT user_id, epoch_us(ts) // {_DAY_US} AS day FROM events
        ),
        f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id),
        a AS (SELECT DISTINCT user_id, day FROM e)
        SELECT f.cohort_day,
               a.day - f.cohort_day AS day_offset,
               CAST(count(*) AS BIGINT) AS n_users
        FROM a JOIN f USING (user_id)
        GROUP BY f.cohort_day, a.day - f.cohort_day
        ORDER BY cohort_day, day_offset
    """


# ------------------------------------------------------- transition matrix


def event_transitions(sf_dir: str) -> ray.data.Dataset:
    """Markov transition counts over per-user event streams: how often does
    event type A immediately precede event type B for the same user?

    Output: (from_type, to_type, n_transitions) — the corpus-wide first-order
    transition matrix, the standard input to user-journey / funnel-shape
    analysis and sequence-model priors.

    Shape: the one user-bucket shuffle shared by every operator in this
    module, then a per-bucket vectorized kernel (lexsort + shifted compare +
    ``np.unique`` over fused pair codes) that collapses each bucket to at
    most K^2 partial rows (K = distinct event types), then a tiny
    (from,to)-keyed hash combine.  Data crossing the second shuffle is
    O(buckets * K^2), independent of event count — scale-safe.
    """
    from ..util import hash_groupby

    def pair_counts(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return _TRANSITION_SCHEMA.empty_table()
        u = group["user_id"].to_numpy(zero_copy_only=False)
        t = _ts_us(group["ts"])
        e = group["event_id"].to_numpy(zero_copy_only=False)
        et = group["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        names = et.dictionary.to_pylist()
        order = np.lexsort((e, t, u))
        u, codes = u[order], codes[order]
        same_user = u[1:] == u[:-1]
        frm, to = codes[:-1][same_user], codes[1:][same_user]
        if len(frm) == 0:
            return _TRANSITION_SCHEMA.empty_table()
        fused, counts = np.unique(frm * len(names) + to, return_counts=True)
        fi, ti = fused // len(names), fused % len(names)
        return pa.table(
            {
                "from_type": pa.array([names[i] for i in fi], pa.string()),
                "to_type": pa.array([names[i] for i in ti], pa.string()),
                "n_transitions": pa.array(counts, pa.int64()),
            }
        )

    partials = (
        _tagged_events(sf_dir, ["user_id", "ts", "event_id", "event_type"], 64)
        .groupby(_BUCKET)
        .map_groups(pair_counts, batch_format="pyarrow")
    )

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _TRANSITION_SCHEMA.empty_table()
        df = (
            t.to_pandas()
            .groupby(["from_type", "to_type"], as_index=False)["n_transitions"]
            .sum()
        )
        return pa.Table.from_pandas(df, preserve_index=False).cast(
            _TRANSITION_SCHEMA
        )

    return hash_groupby(partials, ["from_type", "to_type"], combine)


_TRANSITION_SCHEMA = pa.schema(
    [
        ("from_type", pa.string()),
        ("to_type", pa.string()),
        ("n_transitions", pa.int64()),
    ]
)


def event_transitions_sql_oracle() -> str:
    return """
        WITH o AS (
          SELECT event_type,
                 lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events
        )
        SELECT prev AS from_type, event_type AS to_type,
               CAST(count(*) AS BIGINT) AS n_transitions
        FROM o WHERE prev IS NOT NULL
        GROUP BY prev, event_type
    """


# ------------------------------------------------------- hopping windows


HOP_US = 15 * 60 * 1_000_000  # 15 min hop
HOP_WINDOW_US = 3_600 * 1_000_000  # 1 h window

_HOP_SCHEMA = pa.schema(
    [
        ("window_start", pa.timestamp("us")),
        ("event_type", pa.string()),
        ("n_events", pa.int64()),
        ("cents_sum", pa.int64()),
        ("n_users", pa.int64()),
    ]
)


def hopping_windows(
    sf_dir: str, window_us: int = HOP_WINDOW_US, hop_us: int = HOP_US
) -> ray.data.Dataset:
    """Sliding (hopping) event-time windows: 1 h windows advancing every
    15 min — each event lands in window_us/hop_us = 4 overlapping windows.

    Output per (window_start, event_type): event count, exact cents sum
    (``windowed_events``' tumbling variant, text.py, covers the
    non-overlapping case), and EXACT distinct-user count.  Ray Data has no
    event-time window operator, so the expansion is explicit: a per-batch
    flat emission of each event's window memberships, pre-collapsed by
    (window, type, user) map-side (the combiner — the ×4 fan-out never
    crosses the shuffle unaggregated), then one task-based bucket shuffle
    keyed on window.  Distinct users survive partial aggregation because
    the (window, type, user) triple is itself the partial key.
    """
    if window_us % hop_us:
        raise ValueError("window_us must be a multiple of hop_us")
    nwin = window_us // hop_us

    def explode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.schema(
                [
                    ("w", pa.int64()),
                    ("event_type", pa.string()),
                    ("user_id", pa.int64()),
                    ("n_part", pa.int64()),
                    ("cents_part", pa.int64()),
                ]
            ).empty_table()
        t = _ts_us(batch["ts"])
        base = t - t % hop_us
        idx = np.repeat(np.arange(len(t)), nwin)
        starts = np.repeat(base, nwin) - np.tile(
            np.arange(nwin, dtype=np.int64) * hop_us, len(t)
        )
        tt = pa.table(
            {
                "w": pa.array(starts, pa.int64()),
                "event_type": batch["event_type"].take(idx),
                "user_id": batch["user_id"].take(idx),
                "cents": _cents(batch["value"]).take(idx),
            }
        )
        g = tt.group_by(
            ["w", "event_type", "user_id"], use_threads=False
        ).aggregate([("cents", "count"), ("cents", "sum")])
        return g.rename_columns(
            ["w", "event_type", "user_id", "n_part", "cents_part"]
        )

    ex = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "user_id", "value"]
    ).map_batches(explode, batch_format="pyarrow", batch_size=16384)

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _HOP_SCHEMA.empty_table()
        g = t.group_by(["w", "event_type"], use_threads=False).aggregate(
            [("n_part", "sum"), ("cents_part", "sum")]
        )
        uniq = (
            t.select(["w", "event_type", "user_id"])
            .group_by(["w", "event_type", "user_id"], use_threads=False)
            .aggregate([])
            .group_by(["w", "event_type"], use_threads=False)
            .aggregate([("user_id", "count")])
        )
        j = g.join(uniq, keys=["w", "event_type"])
        return pa.table(
            {
                "window_start": j["w"].cast(pa.timestamp("us")),
                "event_type": j["event_type"],
                "n_events": j["n_part_sum"],
                "cents_sum": j["cents_part_sum"],
                "n_users": j["user_id_count"].cast(pa.int64()),
            }
        )

    from ..util import hash_groupby

    return hash_groupby(ex, ["w"], finalize)


def hopping_windows_sql_oracle(
    window_min: int = 60, hop_min: int = 15
) -> str:
    return f"""
        WITH x AS (
          SELECT unnest(generate_series(
                   time_bucket(INTERVAL '{hop_min} minutes', ts)
                     - INTERVAL '{window_min - hop_min} minutes',
                   time_bucket(INTERVAL '{hop_min} minutes', ts),
                   INTERVAL '{hop_min} minutes')) AS window_start,
                 event_type, user_id,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events
        )
        SELECT window_start, event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(cents) AS BIGINT) AS cents_sum,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM x GROUP BY window_start, event_type
    """


def gap_fill_daily(sf_dir: str) -> pa.Table:
    """Zero-filled daily event counts per type (time-series
    densification): every (event_type, day) cell over the GLOBAL
    [min-day, max-day] span gets a row, absent days as ``n = 0`` —
    the gap-fill step every downstream time-series model (anomaly
    detection, forecasting) needs before it can difference or window.

    Distributed shape: the per-(type, day) counts reduce via streaming
    partials (one row per type x day per batch crosses the shuffle);
    the densification grid is |types| x |days| — independent of event
    volume, so materializing it where the small aggregate already lives
    is the scale-correct plan (a 100 TB stream with 10 years x 1000
    types is a 3.7 M-row grid).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "day": pc.strftime(batch["ts"], format="%Y-%m-%d"),
            }
        )
        g = t.group_by(["event_type", "day"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["event_type", "day", "n_part"])

    cnt = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby(["event_type", "day"])
        .aggregate(Sum("n_part", alias_name="n"))
        .to_pandas()
    )
    import pandas as pd

    days = pd.date_range(cnt["day"].min(), cnt["day"].max(), freq="D").strftime(
        "%Y-%m-%d"
    )
    types = sorted(cnt["event_type"].unique())
    grid = pd.MultiIndex.from_product(
        [types, days], names=["event_type", "day"]
    ).to_frame(index=False)
    out = grid.merge(cnt, on=["event_type", "day"], how="left")
    out["n"] = out["n"].fillna(0).astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False).cast(
        pa.schema(
            [("event_type", pa.string()), ("day", pa.string()), ("n", pa.int64())]
        )
    )


def gap_fill_daily_sql_oracle() -> str:
    return """
        WITH bounds AS (
          SELECT date_trunc('day', min(ts)) AS lo,
                 date_trunc('day', max(ts)) AS hi
          FROM events
        ),
        days AS (
          SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d
          FROM bounds
        ),
        types AS (SELECT DISTINCT event_type FROM events),
        cnt AS (
          SELECT event_type, date_trunc('day', ts) AS d,
                 CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2
        )
        SELECT t.event_type, strftime(dd.d, '%Y-%m-%d') AS day,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS n
        FROM days dd
        CROSS JOIN types t
        LEFT JOIN cnt c ON c.event_type = t.event_type AND c.d = dd.d
    """


def ohlc_bars(sf_dir: str) -> pa.Table:
    """Hourly OHLC bars per event type: (event_type, hour, open, high,
    low, close, n) where open/close are the values of the FIRST/LAST
    event in the bar (ts order, event_id tie-break).

    The point of this operator is the aggregate class it exercises:
    first/last are ORDER-SENSITIVE but still mergeable — a partial
    carries ``(arg-min key, its value)`` and partials combine by keeping
    the smaller key, so the whole thing is one streaming partial pass +
    one tiny groupby, never a sort of the raw stream.  open/high/low/
    close are picked (not summed) floats, so equality with the SQL
    oracle is exact.
    """

    part_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("hour", pa.string()),
            ("open_ts", pa.int64()),
            ("open_id", pa.int64()),
            ("open_v", pa.float64()),
            ("close_ts", pa.int64()),
            ("close_id", pa.int64()),
            ("close_v", pa.float64()),
            ("low", pa.float64()),
            ("high", pa.float64()),
            ("n_part", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "hour": pc.strftime(
                    pc.floor_temporal(batch["ts"], unit="hour"),
                    format="%Y-%m-%d %H:00",
                ),
                "ts_us": batch["ts"].cast(pa.int64()),
                "event_id": batch["event_id"],
                "value": batch["value"],
            }
        )
        if t.num_rows == 0:
            return part_schema.empty_table()
        # per (type, hour): argmin/argmax of (ts, event_id) via one lexsort
        et = t["event_type"].to_numpy(zero_copy_only=False)
        hr = t["hour"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        val = t["value"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, hr, et))
        et_s, hr_s = et[order], hr[order]
        new = np.concatenate(
            [[True], (et_s[1:] != et_s[:-1]) | (hr_s[1:] != hr_s[:-1])]
        )
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(order))
        first_i, last_i = order[starts], order[ends - 1]
        # group min/max of value
        grp = np.cumsum(new) - 1
        vmin = np.full(len(starts), np.inf)
        vmax = np.full(len(starts), -np.inf)
        sorted_val = val[order]
        np.minimum.at(vmin, grp, sorted_val)
        np.maximum.at(vmax, grp, sorted_val)
        return pa.table(
            {
                "event_type": pa.array(et_s[starts], pa.string()),
                "hour": pa.array(hr_s[starts], pa.string()),
                "open_ts": pa.array(ts[first_i], pa.int64()),
                "open_id": pa.array(eid[first_i], pa.int64()),
                "open_v": pa.array(val[first_i], pa.float64()),
                "close_ts": pa.array(ts[last_i], pa.int64()),
                "close_id": pa.array(eid[last_i], pa.int64()),
                "close_v": pa.array(val[last_i], pa.float64()),
                "low": pa.array(vmin, pa.float64()),
                "high": pa.array(vmax, pa.float64()),
                "n_part": pa.array((ends - starts).astype(np.int64)),
            }
        )

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("hour", pa.string()),
            ("open", pa.float64()),
            ("high", pa.float64()),
            ("low", pa.float64()),
            ("close", pa.float64()),
            ("n", pa.int64()),
        ]
    )

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        et = t["event_type"].to_numpy(zero_copy_only=False)
        hr = t["hour"].to_numpy(zero_copy_only=False)
        o_ts = t["open_ts"].to_numpy(zero_copy_only=False)
        o_id = t["open_id"].to_numpy(zero_copy_only=False)
        o_v = t["open_v"].to_numpy(zero_copy_only=False)
        c_ts = t["close_ts"].to_numpy(zero_copy_only=False)
        c_id = t["close_id"].to_numpy(zero_copy_only=False)
        c_v = t["close_v"].to_numpy(zero_copy_only=False)
        lo = t["low"].to_numpy(zero_copy_only=False)
        hi = t["high"].to_numpy(zero_copy_only=False)
        n = t["n_part"].to_numpy(zero_copy_only=False)
        # first partial by (open_ts, open_id) per group; last by max key
        order = np.lexsort((o_id, o_ts, hr, et))
        et_s, hr_s = et[order], hr[order]
        new = np.concatenate(
            [[True], (et_s[1:] != et_s[:-1]) | (hr_s[1:] != hr_s[:-1])]
        )
        starts = np.flatnonzero(new)
        grp = np.cumsum(new) - 1
        first_row = order[starts]
        # close: max (close_ts, close_id) within group — lexsort descending
        order2 = np.lexsort((-c_id, -c_ts, hr, et))
        # order2 groups match order's groups (same et/hr sort): recompute
        et2, hr2 = et[order2], hr[order2]
        new2 = np.concatenate(
            [[True], (et2[1:] != et2[:-1]) | (hr2[1:] != hr2[:-1])]
        )
        starts2 = np.flatnonzero(new2)
        last_row = order2[starts2]
        glo = np.full(len(starts), np.inf)
        ghi = np.full(len(starts), -np.inf)
        gn = np.zeros(len(starts), np.int64)
        np.minimum.at(glo, grp, lo[order])
        np.maximum.at(ghi, grp, hi[order])
        np.add.at(gn, grp, n[order])
        return pa.table(
            {
                "event_type": pa.array(et_s[starts], pa.string()),
                "hour": pa.array(hr_s[starts], pa.string()),
                "open": pa.array(o_v[first_row], pa.float64()),
                "high": pa.array(ghi, pa.float64()),
                "low": pa.array(glo, pa.float64()),
                "close": pa.array(c_v[last_row], pa.float64()),
                "n": pa.array(gn, pa.int64()),
            }
        )

    from ..util import hash_groupby

    parts = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    ).map_batches(partial, batch_format="pyarrow", batch_size=16384)
    out = hash_groupby(parts, ["event_type", "hour"], combine).to_pandas()
    out = out.sort_values(["event_type", "hour"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def ohlc_bars_sql_oracle() -> str:
    return """
        WITH x AS (
          SELECT event_type,
                 strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
                 value,
                 row_number() OVER (
                   PARTITION BY event_type, date_trunc('hour', ts)
                   ORDER BY ts, event_id) AS rn_a,
                 row_number() OVER (
                   PARTITION BY event_type, date_trunc('hour', ts)
                   ORDER BY ts DESC, event_id DESC) AS rn_d
          FROM events
        )
        SELECT event_type, hour,
               max(CASE WHEN rn_a = 1 THEN value END) AS open,
               max(value) AS high,
               min(value) AS low,
               max(CASE WHEN rn_d = 1 THEN value END) AS close,
               CAST(count(*) AS BIGINT) AS n
        FROM x GROUP BY event_type, hour
    """


# ------------------------------------------------- JSON props extraction --


def json_props_stats(sf_dir: str) -> ray.data.Dataset:
    """Semi-structured column processing: extract the integer ``k`` field
    from the JSON ``props`` string per event (vectorized
    ``pc.extract_regex`` — no per-row json.loads in the hot path; the
    contract covers flat integer fields, which is what DuckDB's
    ``json_extract`` + BIGINT cast computes on the oracle side) and
    aggregate per event_type: event count, non-null k count, sum/min/max
    of k.  All-integer outputs, partials per batch, one tiny groupby."""

    def partial(t: pa.Table) -> pa.Table:
        ext = pc.extract_regex(t["props"], r'"k":\s*(?P<k>-?\d+)')
        k = pc.struct_field(ext, "k").cast(pa.int64())
        g = pa.table(
            {
                "event_type": t["event_type"],
                "k": k,
                "one": pa.array(np.ones(len(t), np.int64)),
            }
        ).group_by(["event_type"], use_threads=False).aggregate(
            [
                ("one", "sum"),
                ("k", "count"),
                ("k", "sum"),
                ("k", "min"),
                ("k", "max"),
            ]
        )
        return g.rename_columns(
            ["event_type", "n_p", "nk_p", "sum_p", "min_p", "max_p"]
        )

    from ray.data.aggregate import Max, Min, Sum

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "props"]
        )
        .map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby("event_type")
        .aggregate(
            Sum("n_p", alias_name="n_events"),
            Sum("nk_p", alias_name="n_with_k"),
            Sum("sum_p", alias_name="k_sum"),
            Min("min_p", alias_name="k_min"),
            Max("max_p", alias_name="k_max"),
        )
    )


def json_props_sql_oracle() -> str:
    return """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS n_with_k,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
               CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
               CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
        FROM events GROUP BY event_type
    """


# ------------------------------------------------------------- EWMA ----

EWMA_WINDOW = 16  # alpha = 1/2, truncated to the last 16 events


def ewma_user_value(sf_dir: str, window: int = EWMA_WINDOW) -> ray.data.Dataset:
    """Per-user exponential moving average of ``value`` with alpha = 1/2
    over the user's last ``window`` events in (ts, event_id) order —
    e_1 = v_1, e_i = (v_i + e_{i-1}) / 2, seeded at the window's oldest
    event.

    EXACT despite being a float: with alpha = 1/2 the EWMA is the dyadic
    rational  num / 2^(n_used-1)  where  num = v_oldest + sum_i v_i *
    2^(i-2)  over cents values (num < 2^53), and dividing an int64-exact
    numerator by a power of two is lossless in IEEE double — so the
    result hash-compares bitwise against the SQL oracle instead of "close
    to".  Output: (user_id, n_used, ewma_num, ewma_cents).

    Same single user-bucket shuffle as the other event kernels; inside a
    bucket: one lexsort, per-segment rank-from-newest, coefficient table
    lookup, bincount — no per-row Python.
    """

    schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_used", pa.int64()),
            ("ewma_num", pa.int64()),
            ("ewma_cents", pa.float64()),
        ]
    )

    def ewma(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return schema.empty_table()
        u = group["user_id"].to_numpy(zero_copy_only=False)
        t = _ts_us(group["ts"])
        e = group["event_id"].to_numpy(zero_copy_only=False)
        c = _cents(group["value"]).to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, u))
        u, c = u[order], c[order]
        new_user, useg = _user_segments(u)
        starts = np.flatnonzero(new_user)
        ends = np.append(starts[1:], len(u))
        m = ends - starts
        lastn = np.minimum(m, window)
        # rank from the segment's newest row (1 = most recent)
        rn = np.repeat(ends, m) - np.arange(len(u))
        ln_row = np.repeat(lastn, m)
        coeff = np.zeros(len(u), dtype=np.int64)
        inside = rn <= ln_row
        oldest = inside & (rn == ln_row)
        mid = inside & ~oldest
        coeff[oldest] = 1
        coeff[mid] = np.int64(1) << (ln_row[mid] - rn[mid] - 1)
        num = np.bincount(useg, weights=c * coeff, minlength=len(m)).astype(
            np.int64
        )
        denom = (np.int64(1) << (lastn - 1)).astype(np.float64)
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "n_used": pa.array(lastn, pa.int64()),
                "ewma_num": pa.array(num, pa.int64()),
                "ewma_cents": pa.array(num / denom, pa.float64()),
            }
        )

    return (
        _tagged_events(sf_dir, ["user_id", "ts", "event_id", "value"], 64)
        .groupby(_BUCKET)
        .map_groups(ewma, batch_format="pyarrow")
    )


def ewma_sql_oracle(window: int = EWMA_WINDOW) -> str:
    return f"""
        WITH v AS (
          SELECT user_id,
                 CAST(round(value * 100) AS BIGINT) AS cents,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn,
                 count(*) OVER (PARTITION BY user_id) AS m
          FROM events
        ),
        w AS (
          SELECT user_id, cents, rn, least(m, {window}) AS lastn
          FROM v WHERE rn <= {window}
        ),
        n AS (
          SELECT user_id, lastn,
                 CAST(sum(cents * CASE WHEN rn = lastn THEN 1
                          ELSE CAST(power(2, lastn - rn - 1) AS BIGINT) END)
                      AS BIGINT) AS num
          FROM w GROUP BY user_id, lastn
        )
        SELECT user_id, CAST(lastn AS BIGINT) AS n_used, num AS ewma_num,
               num / power(2, lastn - 1) AS ewma_cents
        FROM n
    """


def top_sessions(sf_dir: str, k: int = 10) -> pa.Table:
    """Top-k sessions corpus-wide by session value — a composition proof:
    the :func:`sessionize` kernel streams into a per-batch local top-k
    and a driver merge of k x batches candidate rows (never the session
    table).  (rank, user_id, session_seq, n_events, value_cents); ties
    (value DESC, user ASC, seq ASC).
    """

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        v = t["value_cents"].to_numpy(zero_copy_only=False)
        u = t["user_id"].to_numpy(zero_copy_only=False)
        s = t["session_seq"].to_numpy(zero_copy_only=False)
        order = np.lexsort((s, u, -v))[:k]
        return t.take(pa.array(order))

    cand = (
        sessionize(sf_dir)
        .map_batches(local_topk, batch_format="pyarrow")
        .to_pandas()
    )
    order = np.lexsort(
        (
            cand["session_seq"].to_numpy(),
            cand["user_id"].to_numpy(),
            -cand["value_cents"].to_numpy(),
        )
    )[:k]
    top = cand.iloc[order].reset_index(drop=True)
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int64)),
            "user_id": pa.array(top["user_id"].to_numpy(), pa.int64()),
            "session_seq": pa.array(top["session_seq"].to_numpy(), pa.int64()),
            "n_events": pa.array(top["n_events"].to_numpy(), pa.int64()),
            "value_cents": pa.array(top["value_cents"].to_numpy(), pa.int64()),
        }
    )


def top_sessions_sql_oracle(k: int = 10, gap_us: int = SESSION_GAP_US) -> str:
    return f"""
        WITH o AS (
          SELECT user_id, ts, event_id, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_us}
                      THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT user_id, ts, value,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
          FROM o
        ), agg AS (
          SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                 CAST(count(*) AS BIGINT) AS n_events,
                 CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
          FROM s GROUP BY user_id, session_seq
        )
        SELECT CAST(row_number() OVER (
                 ORDER BY value_cents DESC, user_id ASC, session_seq ASC
               ) AS BIGINT) AS rank,
               user_id, session_seq, n_events, value_cents
        FROM agg
        ORDER BY rank
        LIMIT {k}
    """
