"""Property-based checks for session_entry_exit (q233) — the ENGINE and
the round-13 mark-based DuckDB ORACLE against an independent Python
replay that shares no code with either.

Why this suite exists: q233's oracle was rewritten this round (struct
min/max → entry/exit row MARKS — is_new = 1 marks the entry row,
lead(is_new)-is-1-or-absent marks the exit row) because DuckDB 1.0's
min/max over STRUCT is pathologically slow. The parity sweeps verify the
rewrite on the driver fixtures, but fixtures don't exercise every
session SHAPE. Hypothesis drives exactly the shapes that decide
correctness here:

- singleton sessions (bounce; entry == exit comes from the same row)
- gaps exactly AT the 1800 s threshold (the rule is STRICT >, so an
  exact-1800 gap continues the session) and one second past it
- timestamp ties inside a user where the event_id tiebreak alone
  decides which event is the entry/exit
- NULL user/ts/type rows (filtered before sessionization)
- a user's last session ending at the partition edge (lead is NULL →
  the coalesce(…, 1) arm of the mark)

The replay sessionizes imperatively (sort, walk, split on gap) and
aggregates with plain dicts — no window functions anywhere — so a pass
means engine, oracle, and model agree from three independent routes.
"""

import math
from collections import defaultdict

import duckdb
import pandas as pd
from hypothesis import given
from _hyp import replay_settings
from hypothesis import strategies as st

from powerdatapipeline_spark.operators import timeseries as ts
from powerdatapipeline_spark.queries import REGISTRY

ORACLE_SQL = REGISTRY["q233_session_entry_exit"][1]

GAP = 1800.0

#: timestamps that force boundary behavior: consecutive draws can tie,
#: sit exactly GAP apart (same session — strict >), or GAP+1 apart
#: (new session); plus plain in-session offsets
T_POOL = [0, 1, 2, 900, 1800, 1801, 3600, 3601, 5400, 5401, 7200, 9001]

EVENT_TYPES = ["view", "click", "buy"]


def _model(rows):
    """Brute-force replay: rows = (user, t, event_id, et), Nones allowed
    in user/t/et. Returns {(entry, exit): (n_sessions, n_bounces,
    avg_events floor6)} matching the operator's output contract."""
    per_user = defaultdict(list)
    for u, t, eid, et in rows:
        if u is None or t is None or et is None:
            continue
        per_user[u].append((t, eid, et))
    sessions = []
    for evs in per_user.values():
        evs.sort(key=lambda x: (x[0], x[1]))
        cur, prev_t = [], None
        for t, eid, et in evs:
            if prev_t is not None and t - prev_t > GAP:
                sessions.append(cur)
                cur = []
            cur.append((t, eid, et))
            prev_t = t
        if cur:
            sessions.append(cur)
    agg = defaultdict(lambda: [0, 0, 0])
    for s in sessions:
        a = agg[(s[0][2], s[-1][2])]
        a[0] += 1
        a[1] += 1 if len(s) == 1 else 0
        a[2] += len(s)
    return {k: (ns, nb, math.floor(tot / ns * 1e6 + 0.5) / 1e6)
            for k, (ns, nb, tot) in agg.items()}


@st.composite
def _events(draw):
    n = draw(st.integers(1, 40))
    rows = []
    for i in range(n):
        u = draw(st.one_of(st.none(), st.integers(0, 3)))
        # mostly pool timestamps (boundary shapes), some free integers
        t = draw(st.one_of(st.none(),
                           st.sampled_from(T_POOL),
                           st.integers(0, 10_000)))
        et = draw(st.one_of(st.none(), st.sampled_from(EVENT_TYPES)))
        rows.append((u, None if t is None else float(t), i, et))
    return rows


SLOW = replay_settings(8)
FAST = replay_settings(60)


@SLOW
@given(rows=_events())
def test_engine_matches_bruteforce(spark, rows):
    df = spark.createDataFrame(
        rows, "user_id long, ts double, event_id long, event_type string")
    got = {(r["entry_type"], r["exit_type"]):
           (r["n_sessions"], r["n_bounces"], r["avg_events"])
           for r in ts.session_entry_exit(df).collect()}
    assert got == _model(rows)


@FAST
@given(rows=_events())
def test_mark_based_oracle_matches_bruteforce(rows):
    """The registered q233 SQL VERBATIM over a random events view — the
    direct pin on the round-13 struct-min/max → mark rewrite."""
    pdf = pd.DataFrame(
        {"event_id": pd.array([r[2] for r in rows], dtype="int64"),
         "ts": pd.to_datetime([r[1] for r in rows], unit="s"),
         "user_id": pd.array([r[0] for r in rows], dtype="Int64"),
         "event_type": pd.array([r[3] for r in rows], dtype=object)})
    con = duckdb.connect()
    try:
        con.register("events", pdf)
        got = {(e, x): (ns, nb, avg) for e, x, ns, nb, avg
               in con.execute(ORACLE_SQL).fetchall()}
    finally:
        con.close()
    assert got == _model(rows)


def test_pinned_boundary_shapes(spark):
    """Deterministic spellings of the shapes hypothesis samples: the
    strict-> gap rule at exactly 1800, the tiebreak deciding entry and
    exit under a timestamp tie, and the singleton bounce."""
    rows = [
        # user 0: tie at t=0 — event_id 0 is entry ("view"), id 1 mid,
        # then an exact-1800 gap (SAME session, strict >), then +1801
        # (NEW session, a singleton bounce)
        (0, 0.0, 0, "view"), (0, 0.0, 1, "click"),
        (0, 1800.0, 2, "buy"), (0, 3601.0, 3, "click"),
        # user 1: single event — bounce, entry == exit from one row
        (1, 5.0, 4, "buy"),
        # filtered rows must not shift anything
        (None, 1.0, 5, "view"), (0, None, 6, "view"), (0, 2.0, 7, None),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts double, event_id long, event_type string")
    got = {(r["entry_type"], r["exit_type"]):
           (r["n_sessions"], r["n_bounces"], r["avg_events"])
           for r in ts.session_entry_exit(df).collect()}
    assert got == {
        ("view", "buy"): (1, 0, 3.0),     # user 0, first session
        ("click", "click"): (1, 1, 1.0),  # user 0, post-gap singleton
        ("buy", "buy"): (1, 1, 1.0),      # user 1 bounce
    }
    assert got == _model(rows)
