"""Registration-grade proofs for the bitemporal as-of audit join
(operators/temporal.py bitemporal_asof_join; staged round 12 as
q_bitemporal_asof — the second round-12 staging).

Semantics under test (definitional): for a fact at business time t and
audit instant K, pick the dimension version with the greatest
(valid_from, recorded_at, ties) among {valid_from <= t,
recorded_at <= K}. Corrections recorded before K supersede their
originals; versions recorded after K are invisible even when
business-valid; facts with no visible version get nulls (left-outer).
"""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from meds_polars_functions_spark.operators.temporal import bitemporal_asof_join

DIM_SCHEMA = "k long, vf timestamp, ra timestamp, ver long, val double"
FACT_SCHEMA = "fid long, k long, t timestamp"

D = dt.datetime


def _lookup(spark, dim_rows, fact_rows, as_of):
    dim = spark.createDataFrame(dim_rows, DIM_SCHEMA)
    facts = spark.createDataFrame(fact_rows, FACT_SCHEMA)
    out = bitemporal_asof_join(
        facts, dim,
        on=["k"], fact_time="t", valid_from="vf", recorded_at="ra",
        as_of=F.lit(as_of), value_cols=["val", "ver"], dim_tie_cols=["ver"],
        suffix="",
    )
    return {r["fid"]: (r["val"], r["ver"]) for r in out.collect()}


def test_correction_overrides_and_audit_instant_binds(spark):
    """One key, one business instant, two recordings: the original
    (ver 1, val 10.0, recorded Jan 5) and a correction (ver 2, val
    99.0, recorded Jan 20). A fact at Feb 1 must see the ORIGINAL when
    audited between the recordings and the CORRECTION after both —
    i.e. the knowledge axis changes the answer over the SAME rows."""
    dim = [
        (1, D(2024, 1, 1), D(2024, 1, 5), 1, 10.0),
        (1, D(2024, 1, 1), D(2024, 1, 20), 2, 99.0),
    ]
    facts = [(100, 1, D(2024, 2, 1))]
    assert _lookup(spark, dim, facts, D(2024, 1, 10)) == {100: (10.0, 1)}
    assert _lookup(spark, dim, facts, D(2024, 6, 1)) == {100: (99.0, 2)}
    # audited BEFORE either recording: nothing is known yet
    assert _lookup(spark, dim, facts, D(2024, 1, 2)) == {100: (None, None)}


def test_late_version_invisible_and_left_outer(spark):
    """A business-valid version recorded after K must not be picked
    (the fact falls back to the previous version); a key with no
    visible version at all yields nulls, and an equal-time version
    (vf == t) IS visible (non-strict backward)."""
    dim = [
        (1, D(2024, 1, 1), D(2024, 1, 2), 1, 10.0),
        (1, D(2024, 3, 1), D(2024, 5, 15), 2, 20.0),  # recorded late
        (2, D(2024, 1, 1), D(2024, 9, 9), 3, 30.0),  # never visible at K
    ]
    facts = [
        (100, 1, D(2024, 4, 1)),  # vf 3/1 is newer but unknown at K
        (101, 2, D(2024, 4, 1)),
        (102, 1, D(2024, 1, 1)),  # vf == t: visible
    ]
    got = _lookup(spark, dim, facts, D(2024, 5, 1))
    assert got == {100: (10.0, 1), 101: (None, None), 102: (10.0, 1)}


def test_matches_brute_force_fuzz(spark):
    """Seeded fuzz: random versions (with same-instant corrections and
    duplicate valid_froms) and random facts vs a plain-Python replay of
    the definition."""
    rng = random.Random(7)
    day = dt.timedelta(days=1)
    base = D(2024, 1, 1)
    dim, facts = [], []
    ver = 0
    for k in range(12):
        for _ in range(rng.randint(1, 15)):
            vf = base + rng.randint(0, 200) * day
            ra = vf + rng.randint(0, 40) * day
            ver += 1
            dim.append((k, vf, ra, ver, float(rng.randint(1, 500))))
    for fid in range(150):
        facts.append((fid, rng.randint(0, 13), base + rng.randint(0, 220) * day))
    K = base + 150 * day
    got = _lookup(spark, dim, facts, K)

    def brute(k, t):
        cand = [d for d in dim if d[0] == k and d[1] <= t and d[2] <= K]
        if not cand:
            return (None, None)
        best = max(cand, key=lambda d: (d[1], d[2], d[3]))
        return (best[4], best[3])

    want = {fid: brute(k, t) for fid, k, t in facts}
    assert got == want


def test_invalid_knowledge_cut_is_still_left_outer_not_error(spark):
    """K before every recording: all facts survive with nulls (the
    join never turns inner)."""
    dim = [(1, D(2024, 1, 1), D(2024, 1, 2), 1, 10.0)]
    facts = [(100, 1, D(2024, 2, 1)), (101, 9, D(2024, 2, 1))]
    got = _lookup(spark, dim, facts, D(2020, 1, 1))
    assert got == {100: (None, None), 101: (None, None)}


def test_plan_one_exchange_no_join_no_python(spark):
    """The 100 TB pin: union-merge — ONE hash exchange on the key
    feeds the running-last window; NO Join node ever appears (the
    lateral/inequality formulation would be a BroadcastNestedLoop
    disaster), and no Python node."""
    import io
    import re
    from contextlib import redirect_stdout

    dim = spark.createDataFrame(
        [(1, D(2024, 1, 1), D(2024, 1, 2), 1, 10.0)], DIM_SCHEMA
    )
    facts = spark.createDataFrame([(100, 1, D(2024, 2, 1))], FACT_SCHEMA)
    out = bitemporal_asof_join(
        facts, dim, on=["k"], fact_time="t", valid_from="vf",
        recorded_at="ra", as_of=F.lit(D(2024, 5, 1)),
        value_cols=["val"], dim_tie_cols=["ver"],
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert re.search(r"hashpartitioning\(k#\d+L?, \d+\)", plan)
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_knowledge_cut_pushes_to_parquet_scan(spark, tmp_path):
    """When recorded_at is a STORED column (the audit-log layout), the
    knowledge cut must reach the dimension scan as a pushed filter —
    at 100 TB this is what makes re-auditing cheap (only files with
    pre-K recordings are read)."""
    import io
    import re
    from contextlib import redirect_stdout

    p = str(tmp_path / "dim.parquet")
    spark.createDataFrame(
        [(1, D(2024, 1, 1), D(2024, 1, 2), 1, 10.0)], DIM_SCHEMA
    ).write.parquet(p)
    dim = spark.read.parquet(p)
    facts = spark.createDataFrame([(100, 1, D(2024, 2, 1))], FACT_SCHEMA)
    out = bitemporal_asof_join(
        facts, dim, on=["k"], fact_time="t", valid_from="vf",
        recorded_at="ra", as_of=F.lit(D(2024, 5, 1)), value_cols=["val"],
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "ra" in m.group(1), f"knowledge cut not pushed: {m}"


def test_staged_query_audit_instant_binds_on_real_data(spark):
    """Falsifiability on the staged query's own data: moving K by two
    years changes the result (late-recorded versions flip visibility),
    and the sf0.001 result has real bitemporal structure — at least one
    fact resolves to a version that is NOT the newest business-valid
    one (i.e. the knowledge cut actually rewound history somewhere)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    rows = {
        r["o_orderkey"]: (r["known_ver"], r["known_total"])
        for r in entry.queries()["bitemporal_asof"](spark, sf).collect()
    }
    assert len(rows) == 1500

    from meds_polars_functions_spark.operators.temporal import (
        bitemporal_asof_join,
    )

    o = entry._t(spark, sf, "orders")
    dim = o.select(
        "o_custkey",
        F.col("o_orderdate").alias("valid_from"),
        F.expr(
            "o_orderdate + make_dt_interval(cast(o_orderkey % 30 as int), 0, 0, 0)"
        ).alias("recorded_at"),
        F.col("o_orderkey").alias("ver"),
        F.col("o_totalprice").alias("val"),
    )
    facts = o.select("o_orderkey", "o_custkey", "o_orderdate")

    def run(k_lit):
        res = bitemporal_asof_join(
            facts, dim, on=["o_custkey"], fact_time="o_orderdate",
            valid_from="valid_from", recorded_at="recorded_at",
            as_of=F.to_timestamp(F.lit(k_lit)),
            value_cols=["val", "ver"], dim_tie_cols=["ver"], suffix="",
        )
        return {
            r["o_orderkey"]: (r["ver"], r["val"]) for r in res.collect()
        }

    early = run("1999-01-01")
    # the staged query is this operator at K=1999 (ver double-cast aside)
    assert {
        k: (None if v is None else float(v))
        for k, (v, _) in early.items()
    } == {k: v for k, (v, _) in ((k, (rows[k][0], None)) for k in rows)}
    late = run("2005-01-01")  # every recording visible: pure newest-valid
    assert late != early  # K binds
    # the knowledge cut rewound at least one fact below its newest
    # business-valid version
    rewound = [k for k in early if early[k] != late[k]]
    assert rewound, "K=1999 never rewinds anything: the audit axis is vacuous"


def test_null_dim_keys_and_valid_from_are_excluded(spark):
    """ADVICE r12: the NULL contract must match the SQL equality-join +
    vf<=t semantics the oracle encodes. A null-key version must NOT
    match null-key facts (SQL equality never matches NULL), and a null
    valid_from must NOT become a universal fallback version (vf <= t is
    never true for NULL vf) — before the fix, Window.partitionBy
    grouped NULL keys together and NULL vf sorted first ascending."""
    dim = [
        (None, D(2024, 1, 1), D(2024, 1, 2), 1, 10.0),  # null key
        (1, None, D(2024, 1, 2), 2, 20.0),              # null valid_from
        (1, D(2024, 1, 1), D(2024, 1, 2), 3, 30.0),     # the only legal row
    ]
    facts = [
        (100, 1, D(2024, 2, 1)),     # must see ver 3, never ver 2
        (101, None, D(2024, 2, 1)),  # null-key fact: left-outer nulls
        (102, 9, D(2024, 2, 1)),     # unmatched key: left-outer nulls
    ]
    got = _lookup(spark, dim, facts, D(2024, 6, 1))
    assert got == {100: (30.0, 3), 101: (None, None), 102: (None, None)}


def test_reserved_and_suffix_collisions_raise(spark):
    """ADVICE r12: reserved temp columns already present in facts, a
    value column named like a payload struct field, or suffix-induced
    output-name collisions must raise ValueError up front instead of
    silently emitting duplicate/ambiguous columns."""
    dim = spark.createDataFrame(
        [(1, D(2024, 1, 1), D(2024, 1, 2), 1, 10.0)], DIM_SCHEMA
    )
    facts = spark.createDataFrame([(100, 1, D(2024, 2, 1))], FACT_SCHEMA)

    def call(f, d, **kw):
        args = dict(
            on=["k"], fact_time="t", valid_from="vf", recorded_at="ra",
            as_of=F.lit(D(2024, 6, 1)), value_cols=["val"], suffix="_dim",
        )
        args.update(kw)
        return bitemporal_asof_join(f, d, **args)

    # reserved temp name in facts
    with pytest.raises(ValueError, match="reserved temp"):
        call(facts.withColumn("__payload__", F.lit(1)), dim)
    with pytest.raises(ValueError, match="reserved temp"):
        call(facts.withColumn("__time__", F.lit(1)), dim)
    # value col named like a payload struct field
    d2 = dim.withColumnRenamed("val", "__vf__")
    with pytest.raises(ValueError, match="payload struct"):
        call(facts, d2, value_cols=["__vf__"])
    # suffix="" + a fact column sharing a value_col name
    with pytest.raises(ValueError, match="output name collision"):
        call(facts.withColumn("val", F.lit(0.0)), dim, suffix="")
    # duplicate suffixed outputs (vf requested twice via value_cols)
    with pytest.raises(ValueError, match="output name collision"):
        call(facts, dim, value_cols=["val", "vf"], suffix="")
    # the clean call still works (guards are not over-eager)
    assert call(facts, dim).count() == 1
