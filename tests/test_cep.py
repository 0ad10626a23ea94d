"""CEP (MATCH_RECOGNIZE class) over sessionized symbol strings:
hand-built sequences vs a Python `re` reference, loud validation of
non-portable regex constructs, and the one-shuffle plan shape."""

import datetime as dt
import re

import pytest
from pyspark.sql import functions as F

from go_streams_spark.functions import cep


def _ev(uid, minute, etype, eid):
    return (eid, dt.datetime(2024, 1, 1, 8) + dt.timedelta(minutes=minute),
            uid, etype)


SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"

# user 1: one session  v c v p  (funnel hit, 1 match)
# user 1: second session (2h later)  e e e  (one maximal burst run)
# user 2: single session  p v c  (no funnel: purchase precedes)
# user 3: v c p v c p in one session (2 non-overlapping funnel matches)
ROWS = (
    [_ev(1, m, t, 10 + i) for i, (m, t) in enumerate(
        [(0, "view"), (5, "click"), (7, "view"), (9, "purchase")])]
    + [_ev(1, 180 + m, "error", 20 + m) for m in range(3)]
    + [_ev(2, m, t, 30 + i) for i, (m, t) in enumerate(
        [(0, "purchase"), (3, "view"), (6, "click")])]
    + [_ev(3, m, t, 40 + i) for i, (m, t) in enumerate(
        [(0, "view"), (1, "click"), (2, "purchase"),
         (3, "view"), (4, "click"), (5, "purchase")])]
)


@pytest.fixture()
def events(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


SYM = {"view": "v", "click": "c", "purchase": "p", "error": "e"}


def test_funnel_matches_reference(events):
    got = {(r["user_id"], r["sid"]): r for r in cep.event_pattern_matches(
        events, pattern="v[^p]*c[^p]*p", symbols=SYM,
        gap_seconds=1800).collect()}
    # user 1 session 1: vcvp -> one match covering the whole string
    r = got[(1, 1)]
    assert r["seq"] == "vcvp" and r["n_matches"] == 1
    assert r["first_match"] == "vcvp"
    # user 2: pvc never matches; user 1's error session neither
    assert (2, 1) not in got and len(got) == 2
    # user 3: two non-overlapping matches (leftmost greedy sweep)
    r3 = got[(3, 1)]
    assert r3["seq"] == "vcpvcp" and r3["n_matches"] == 2
    assert r3["first_match"] == "vcp"
    # cross-check every sequence against Python's re
    for r in got.values():
        assert r["n_matches"] == len(
            re.findall("v[^p]*c[^p]*p", r["seq"]))


def test_burst_run_counts_once(events):
    got = {(r["user_id"], r["sid"]): r for r in cep.event_pattern_matches(
        events, pattern="e{2,}", symbols=SYM,
        gap_seconds=1800).collect()}
    # the eee run is ONE maximal match, in user 1's SECOND session
    assert list(got) == [(1, 2)]
    r = got[(1, 2)]
    assert r["seq"] == "eee" and r["n_matches"] == 1
    assert r["first_match"] == "eee"


def test_keep_unmatched_keeps_every_session(events):
    out = cep.event_pattern_matches(
        events, pattern="e{2,}", symbols=SYM, gap_seconds=1800,
        keep_unmatched=True)
    # sessions: u1 x2, u2 x1, u3 x1
    assert out.count() == 4
    assert out.where(F.col("n_matches") > 0).count() == 1


def test_validation_is_loud():
    with pytest.raises(ValueError, match="lookaround"):
        cep.validate_pattern("v(?=c)")
    with pytest.raises(ValueError, match="backreference"):
        cep.validate_pattern(r"(v)\1")
    with pytest.raises(ValueError, match="possessive"):
        cep.validate_pattern("ve*+c")
    with pytest.raises(ValueError, match="invalid regex"):
        cep.validate_pattern("v[")
    with pytest.raises(ValueError, match="single char"):
        cep.validate_symbols({"view": "vv"})
    with pytest.raises(ValueError, match="distinct"):
        cep.validate_symbols({"view": "v", "visit": "v"})
    with pytest.raises(ValueError, match="gap_seconds"):
        cep.sessionize(None, gap_seconds=0)


def test_plan_one_user_shuffle_no_python(events):
    """Both window passes and the session agg ride ONE user-grain
    exchange; the matching itself adds no Python stage and no join."""
    from go_streams_spark.plans import explain_str
    out = cep.event_pattern_matches(
        events, pattern="e{2,}", symbols=SYM, gap_seconds=1800)
    plan = explain_str(out, "formatted")
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan and "Join" not in plan
    # exchanges: the source createDataFrame scan aside, only
    # hashpartitioning on user_id should appear
    import re as _re
    exchanges = _re.findall(r"Exchange (\w+)\(([^,)]+)", plan)
    for kind, arg in exchanges:
        assert kind == "hashpartitioning" and "user_id" in arg, exchanges


def test_cep_stream_matches_batch(spark, tmp_path):
    """Streaming CEP parity: run the same events through cep_stream
    (multi-file bounded stream, maxFilesPerTrigger=1 so state crosses
    micro-batches) and through the batch matcher; closed sessions must
    agree exactly. A far-future sentinel event per user closes every
    real session via gap-break (the sentinel's own session stays open
    and unmatched)."""
    from go_streams_spark.streaming import file_stream_source
    from go_streams_spark.streaming.stateful import cep_stream

    sentinels = [_ev(u, 60 * 24 * 14, "noop", 900 + u) for u in (1, 2, 3)]
    d = str(tmp_path / "cepstream")
    # split rows across two files: early events then later ones +
    # sentinels (keeps per-user event-time order across batches, which
    # is the watermark contract)
    df_all = spark.createDataFrame(ROWS + sentinels, SCHEMA)
    early = df_all.where(F.col("event_id") < 30)
    late = df_all.where(F.col("event_id") >= 30)
    early.coalesce(1).write.mode("overwrite").parquet(d)
    late.coalesce(1).write.mode("append").parquet(d)

    src = file_stream_source(spark, d, fmt="parquet", schema=SCHEMA,
                             maxFilesPerTrigger="1")
    out = cep_stream(src, pattern="v[^p]*c[^p]*p", symbols=SYM,
                     gap_seconds=1800)
    q = (out.writeStream.format("memory").queryName("cep_stream_par")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["user_id"], r["sid"]): (r["seq"], r["n_matches"],
                                      r["first_match"])
           for r in spark.table("cep_stream_par").collect()}

    from go_streams_spark.functions import cep
    batch = {(r["user_id"], r["sid"]): (r["seq"], r["n_matches"],
                                        r["first_match"])
             for r in cep.event_pattern_matches(
                 df_all, pattern="v[^p]*c[^p]*p", symbols=SYM,
                 gap_seconds=1800).collect()}
    assert got == batch and len(got) == 2


def test_cep_stream_subsecond_gap_parity(spark, tmp_path):
    """Gap-breaks must compare FLOOR-SECOND deltas (the batch
    sessionize's cast(timestamp as long)), not fractional seconds:
    t=0.0 vs t=1800.9 with gap=1800 is ONE session in batch (floor
    delta exactly 1800, not >), and the stream must agree. A second
    pair 0.4 vs 1801.2 (floor delta 1801 > 1800) must break in BOTH.
    Regression: float epochs (ns/1e9) split the first pair in the
    stream only."""
    from go_streams_spark.streaming import file_stream_source
    from go_streams_spark.streaming.stateful import cep_stream

    base = dt.datetime(2024, 1, 1, 8)

    def ev(uid, sec_float, etype, eid):
        return (eid, base + dt.timedelta(seconds=sec_float), uid, etype)

    rows = [
        # user 7: v at 0.0s, c at 1800.9s, p at 1801.0s -> ONE batch
        # session (floor deltas 1800, 1), full funnel match
        ev(7, 0.0, "view", 1), ev(7, 1800.9, "click", 2),
        ev(7, 1801.0, "purchase", 3),
        # user 8: v at 0.4s then c at 1801.2s -> floor delta 1801 >
        # 1800: TWO sessions in both engines (neither matches alone)
        ev(8, 0.4, "view", 4), ev(8, 1801.2, "click", 5),
        # sentinels close every real session via gap-break
        ev(7, 10 ** 6, "noop", 901), ev(8, 10 ** 6, "noop", 902),
    ]
    df_all = spark.createDataFrame(rows, SCHEMA)
    d = str(tmp_path / "cepsub")
    df_all.where(F.col("event_id") < 5).coalesce(1) \
        .write.mode("overwrite").parquet(d)
    df_all.where(F.col("event_id") >= 5).coalesce(1) \
        .write.mode("append").parquet(d)

    src = file_stream_source(spark, d, fmt="parquet", schema=SCHEMA,
                             maxFilesPerTrigger="1")
    out = cep_stream(src, pattern="v[^p]*c[^p]*p", symbols=SYM,
                     gap_seconds=1800)
    q = (out.writeStream.format("memory").queryName("cep_sub_par")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["user_id"], r["sid"]): (r["seq"], r["n_matches"])
           for r in spark.table("cep_sub_par").collect()}

    batch = {(r["user_id"], r["sid"]): (r["seq"], r["n_matches"])
             for r in cep.event_pattern_matches(
                 df_all, pattern="v[^p]*c[^p]*p", symbols=SYM,
                 gap_seconds=1800).collect()}
    assert got == batch
    assert got == {(7, 1): ("vcp", 1)}
