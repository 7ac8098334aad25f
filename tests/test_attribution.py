"""Sessionized first/last-touch attribution (operators/attribution.py).

Unit truth tables hand-compute the session split, touch picks, and
direct credit; a seeded brute-force fuzz replays the whole definition in
plain Python; the plan test pins the ONE-corpus-exchange shape (the
per-session windows and groupBy must REUSE the user partitioning — an
extra (user, __sid) exchange or a duplicated subtree is the regression
this guards against, the same class the MMR plan audit caught)."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from meds_polars_functions_spark.operators.attribution import (
    DIRECT_CHANNEL,
    assign_sessions,
    touch_attribution,
)

H = dt.datetime(2024, 1, 1, 10, 0)
GAP_US = 3600 * 1_000_000  # 1 hour

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _m(minutes):
    return H + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        # u1 session 1: view -> click -> purchase (first=view, last=click)
        (1, _m(0), 1, "view"),
        (2, _m(10), 1, "click"),
        (3, _m(20), 1, "purchase"),
        # gap of exactly GAP (60 min) from (3): SAME session (strict >)
        (4, _m(80), 1, "purchase"),  # second purchase: no extra credit
        # u1 session 2 (gap 61 min > GAP from (4)): purchase opens it
        (5, _m(141), 1, "purchase"),  # -> (direct)
        # u2 session 1: click only, no conversion -> no credit anywhere
        (6, _m(0), 2, "click"),
        # u2 session 2: signup -> purchase (first=last=signup)
        (7, _m(200), 2, "signup"),
        (8, _m(210), 2, "purchase"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.mark.slow
def test_assign_sessions_gap_boundary(spark, tiny):
    s = assign_sessions(tiny, GAP_US)
    got = {
        r["__eid"]: r["__sid"]
        for r in s.filter(F.col("user_id") == 1).collect()
    }
    # diff == gap keeps the session; diff > gap splits
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 2}
    got2 = {
        r["__eid"]: r["__sid"]
        for r in s.filter(F.col("user_id") == 2).collect()
    }
    assert got2 == {6: 1, 7: 2, 8: 2}


def test_touch_attribution_hand_computed(spark, tiny):
    out = {
        r["channel"]: (r["first_touch_conversions"], r["last_touch_conversions"])
        for r in touch_attribution(tiny, GAP_US).collect()
    }
    # converting sessions: u1s1 (first=view, last=click), u1s2 (direct),
    # u2s2 (first=last=signup)
    assert out == {
        "view": (1, 0),
        "click": (0, 1),
        DIRECT_CHANNEL: (1, 1),
        "signup": (1, 1),
    }


def test_touch_attribution_ts_tie_broken_by_event_id(spark):
    # two touches and the purchase all at ONE timestamp: session order is
    # (ts, event_id), so first=signup(id 1), last=click(id 2)
    rows = [
        (1, _m(0), 9, "signup"),
        (2, _m(0), 9, "click"),
        (3, _m(0), 9, "purchase"),
    ]
    out = {
        r["channel"]: (r["first_touch_conversions"], r["last_touch_conversions"])
        for r in touch_attribution(
            spark.createDataFrame(rows, SCHEMA), GAP_US
        ).collect()
    }
    assert out == {"signup": (1, 0), "click": (0, 1)}


def test_touch_attribution_credit_totals_partition_conversions(spark, tiny):
    rows = touch_attribution(tiny, GAP_US).collect()
    n_first = sum(r["first_touch_conversions"] for r in rows)
    n_last = sum(r["last_touch_conversions"] for r in rows)
    assert n_first == n_last == 3  # one credit each per converting session


def test_invalid_gap_raises(spark, tiny):
    with pytest.raises(ValueError):
        assign_sessions(tiny, -1)


def _brute_force(rows, gap, conversion="purchase"):
    """Plain-Python replay of the definition."""
    by_user = {}
    for eid, tu, uid, typ in rows:
        by_user.setdefault(uid, []).append((tu, eid, typ))
    credit = {}
    for evs in by_user.values():
        evs.sort()
        sessions, cur, prev_tu = [], [], None
        for tu, eid, typ in evs:
            if prev_tu is not None and tu - prev_tu > gap:
                sessions.append(cur)
                cur = []
            cur.append(typ)
            prev_tu = tu
        sessions.append(cur)
        for sess in sessions:
            if conversion not in sess:
                continue
            fp = sess.index(conversion)  # 0-based first conversion
            first = sess[0] if fp > 0 else DIRECT_CHANNEL
            last = sess[fp - 1] if fp > 0 else DIRECT_CHANNEL
            a = credit.setdefault(first, [0, 0])
            a[0] += 1
            b = credit.setdefault(last, [0, 0])
            b[1] += 1
    return {c: tuple(v) for c, v in credit.items()}


def test_touch_attribution_matches_brute_force_fuzz(spark):
    rng = random.Random(1107)
    types = ["view", "click", "purchase", "signup"]
    rows = [
        (
            eid,
            H + dt.timedelta(minutes=rng.randrange(0, 3000)),
            rng.randrange(1, 9),
            rng.choice(types),
        )
        for eid in range(400)
    ]
    gap_min = 45
    want = _brute_force(
        [
            (eid, int(ts.timestamp() * 1_000_000), uid, typ)
            for eid, ts, uid, typ in rows
        ],
        gap_min * 60 * 1_000_000,
    )
    got = {
        r["channel"]: (r["first_touch_conversions"], r["last_touch_conversions"])
        for r in touch_attribution(
            spark.createDataFrame(rows, SCHEMA), gap_min * 60 * 1_000_000
        ).collect()
    }
    assert got == want


def test_touch_attribution_plan_one_corpus_exchange(spark, tiny):
    """The 100 TB pin: ONE parquet-scale exchange on the user column
    only; the session windows and (user, __sid) groupBy REUSE it
    (HashPartitioning(user) satisfies the clustered requirement); the
    unpivot is map-side so the only other exchange is the k-row channel
    agg; no Python; the first draft's full-outer credit join duplicated
    the whole subtree (two scans, two user exchanges) — pinned out."""
    import io
    import re
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        touch_attribution(tiny, GAP_US).explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2
    user_ex = re.findall(r"hashpartitioning\(user_id#\d+L?, \d+\)", plan)
    assert len(user_ex) == 1  # corpus exchange: user only, exactly once
    assert "__sid" not in " ".join(
        re.findall(r"hashpartitioning\([^)]*\)", plan)
    )  # session windows/agg reuse the user exchange
    assert "EvalPython" not in plan
    assert "Join" not in plan  # credit totals are one groupBy, no join


def test_session_paths_hand_computed(spark, tiny):
    from meds_polars_functions_spark.operators.attribution import session_paths

    got = {
        r["path"]: r["sessions"]
        for r in session_paths(tiny, GAP_US, max_steps=5, top_k=20).collect()
    }
    # u1 s1 = view>click>purchase>purchase (the ==gap event stays in),
    # u1 s2 = purchase, u2 s1 = click, u2 s2 = signup>purchase
    assert got == {
        "view>click>purchase>purchase": 1,
        "purchase": 1,
        "click": 1,
        "signup>purchase": 1,
    }


def test_session_paths_cap_and_topk_bind(spark, tiny):
    from meds_polars_functions_spark.operators.attribution import session_paths

    capped = {
        r["path"]: r["sessions"]
        for r in session_paths(tiny, GAP_US, max_steps=2, top_k=20).collect()
    }
    # the 4-event session truncates to its first 2 steps
    assert "view>click" in capped and len(capped) == 4
    top1 = session_paths(tiny, GAP_US, max_steps=5, top_k=1).collect()
    assert len(top1) == 1
    # deterministic tie order: all counts are 1 -> lexicographically first
    assert top1[0]["path"] == "click"


def test_session_paths_matches_brute_force_fuzz(spark):
    from meds_polars_functions_spark.operators.attribution import session_paths

    rng = random.Random(2311)
    types = ["view", "click", "purchase", "signup"]
    rows = [
        (
            eid,
            H + dt.timedelta(minutes=rng.randrange(0, 3000)),
            rng.randrange(1, 9),
            rng.choice(types),
        )
        for eid in range(400)
    ]
    gap_us, max_steps = 45 * 60 * 1_000_000, 3
    by_user = {}
    for eid, ts, uid, typ in rows:
        by_user.setdefault(uid, []).append(
            (int(ts.timestamp() * 1_000_000), eid, typ)
        )
    counts = {}
    for evs in by_user.values():
        evs.sort()
        cur, prev = [], None
        sessions = []
        for tu, _eid, typ in evs:
            if prev is not None and tu - prev > gap_us:
                sessions.append(cur)
                cur = []
            cur.append(typ)
            prev = tu
        sessions.append(cur)
        for sess in sessions:
            p = ">".join(sess[:max_steps])
            counts[p] = counts.get(p, 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["path"], r["sessions"])
        for r in session_paths(
            spark.createDataFrame(rows, SCHEMA),
            gap_us,
            max_steps=max_steps,
            top_k=20,
        ).collect()
    ]
    assert got == want


def test_session_paths_plan_one_corpus_exchange(spark, tiny):
    """Same 100 TB pin as touch_attribution: ONE user-only corpus
    exchange reused by the row-number window and the bounded
    (<= max_steps structs) per-session collect; the only other exchange
    is the tiny path count; top-k plans as TakeOrderedAndProject (no
    global sort); no Python, no joins."""
    import io
    import re
    from contextlib import redirect_stdout

    from meds_polars_functions_spark.operators.attribution import session_paths

    buf = io.StringIO()
    with redirect_stdout(buf):
        session_paths(tiny, GAP_US).explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2
    assert len(re.findall(r"hashpartitioning\(user_id#\d+L?, \d+\)", plan)) == 1
    assert "__sid" not in " ".join(re.findall(r"hashpartitioning\([^)]*\)", plan))
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan
    assert "Join" not in plan


def test_session_paths_invalid_args_raise(spark, tiny):
    from meds_polars_functions_spark.operators.attribution import session_paths

    with pytest.raises(ValueError):
        session_paths(tiny, GAP_US, max_steps=0)
    with pytest.raises(ValueError):
        session_paths(tiny, GAP_US, top_k=0)


def test_non_integral_id_col_raises(spark):
    """ADVICE r12: a non-integral id column must RAISE, not silently
    cast to NULL (which would collapse the (ts, id) tiebreak and make
    timestamp-tie ordering — and thus touch picks and session paths —
    nondeterministic)."""
    rows = [("e1", dt.datetime(2024, 1, 1, 10, 0), 7, "view")]
    df = spark.createDataFrame(
        rows, "event_id string, ts timestamp, user_id long, event_type string"
    )
    with pytest.raises(TypeError, match="integral"):
        assign_sessions(df, GAP_US)
