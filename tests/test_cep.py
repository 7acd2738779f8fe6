"""Unit tests for the CEP skip-till-next-match operator
(events_pattern_skip_match): hand-built event sequences with known
funnel counts, per the VERDICT r5 #4 requirement — the driver gate
proves cross-engine parity; these pin the SEMANTICS (skip events,
quantifier, non-overlap, session split, token cap)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from new_data_pipeline_spark.operators import profiling

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    """rows: (user_id, minutes_offset, event_type). event_id follows
    input order, so ties on ts resolve deterministically."""
    data = [(uid, T0 + dt.timedelta(minutes=m), i, et)
            for i, (uid, m, et) in enumerate(rows)]
    return spark.createDataFrame(
        data, "user_id bigint, ts timestamp, event_id bigint, "
              "event_type string")


def _counts(spark, rows, **kw):
    out = profiling.skip_match_counts(_events(spark, rows), **kw)
    return {r["user_id"]: (r["n_matches"], r["n_sessions_matched"])
            for r in out.collect()}


def test_simple_funnel_with_skips(spark):
    # irrelevant events (error, signup) between pattern elements are
    # SKIPPED — the MATCH_RECOGNIZE skip-till-next-match semantics
    rows = [(1, 0, "view"), (1, 1, "error"), (1, 2, "click"),
            (1, 3, "signup"), (1, 4, "click"), (1, 5, "purchase")]
    assert _counts(spark, rows) == {1: (1, 1)}


def test_quantifier_requires_click(spark):
    # view,purchase without a click does NOT match (click+ quantifier)
    rows = [(1, 0, "view"), (1, 1, "purchase")]
    assert _counts(spark, rows) == {}


def test_non_overlapping_count(spark):
    # two back-to-back funnels in one session count as 2 (AFTER MATCH
    # SKIP PAST LAST ROW — non-overlapping leftmost matches)
    rows = [(1, m, et) for m, et in enumerate(
        ["view", "click", "purchase", "view", "click", "click",
         "purchase"])]
    assert _counts(spark, rows) == {1: (2, 1)}


def test_session_gap_splits_match(spark):
    # view,click then a 3-day silence then purchase: the funnel may not
    # span the SESSION_GAP bound, so no match; a complete funnel in the
    # second session still counts
    gap = 3 * 24 * 60
    rows = [(1, 0, "view"), (1, 1, "click"),
            (1, gap, "purchase"),
            (1, gap + 1, "view"), (1, gap + 2, "click"),
            (1, gap + 3, "purchase")]
    assert _counts(spark, rows) == {1: (1, 1)}


def test_sessions_matched_counts_sessions(spark):
    # one funnel in each of two sessions → n_matches=2, sessions=2
    gap = 3 * 24 * 60
    rows = [(1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),
            (1, gap, "view"), (1, gap + 1, "click"),
            (1, gap + 2, "purchase")]
    assert _counts(spark, rows) == {1: (2, 2)}


def test_per_user_isolation(spark):
    # user 2's click cannot complete user 1's funnel
    rows = [(1, 0, "view"), (2, 1, "click"), (1, 2, "purchase"),
            (2, 3, "view"), (2, 4, "click"), (2, 5, "purchase")]
    assert _counts(spark, rows) == {2: (1, 1)}


def test_token_cap_truncates_session(spark):
    # cap=3: only view,click,click enter the string — the purchase at
    # position 4 is dropped, so no match; with the default cap it's 1
    rows = [(1, 0, "view"), (1, 1, "click"), (1, 2, "click"),
            (1, 3, "purchase")]
    assert _counts(spark, rows, token_cap=3) == {}
    assert _counts(spark, rows) == {1: (1, 1)}


def test_cap_bound_is_pre_aggregation(spark):
    # the cap filter runs BEFORE collect_list: with cap=1 every session
    # contributes exactly one token, so nothing can match even for a
    # user with many funnels
    rows = [(1, m, et) for m, et in enumerate(
        ["view", "click", "purchase"] * 5)]
    assert _counts(spark, rows, token_cap=1) == {}


def test_real_table_cap_is_inactive(spark):
    # at sf0.001 the default cap must not change the result: the max
    # session is far below 512 tokens (cap comment in profiling.py)
    from new_data_pipeline_spark import catalog
    ev = catalog.load(spark, "/root/testdata/sf0.001", "events")
    capped = profiling.skip_match_counts(ev)
    uncapped = profiling.skip_match_counts(ev, token_cap=1 << 30)
    assert capped.exceptAll(uncapped).count() == 0
    assert uncapped.exceptAll(capped).count() == 0
    assert capped.count() > 0  # non-vacuous: some user matches


def test_ties_resolve_by_event_id(spark):
    # two events at the SAME timestamp order by event_id (input order):
    # view then purchase at t=1 with a click between by id — match
    rows = [(1, 0, "view"), (1, 1, "click"), (1, 1, "purchase")]
    assert _counts(spark, rows) == {1: (1, 1)}


# ---------------------------------------------------------------------
# Streaming twin: the applyInPandasWithState NFA (streaming/cep.py)
# must converge to the batch query's answer for in-order delivery.
# ---------------------------------------------------------------------

from new_data_pipeline_spark.streaming import cep  # noqa: E402


def test_dfa_transition_table():
    # the token-level DFA encodes leftmost non-overlapping
    # `view click+ purchase` (table derivation in cep.py's docstring)
    assert cep._step(0, "view") == (1, 0)
    assert cep._step(0, "click") == (0, 0)
    assert cep._step(0, "purchase") == (0, 0)
    assert cep._step(1, "view") == (1, 0)
    assert cep._step(1, "click") == (2, 0)
    assert cep._step(1, "purchase") == (0, 0)
    assert cep._step(2, "view") == (1, 0)
    assert cep._step(2, "click") == (2, 0)
    assert cep._step(2, "purchase") == (0, 1)


def _stream_counts(spark, tmp_path, rows, n_files=3, **kw):
    """Run the NFA as a REAL multi-micro-batch stream: rows split into
    time-contiguous files consumed one per trigger (in-order delivery),
    update-mode memory sink; returns the LAST update per user."""
    import time

    import os

    src = str(tmp_path / "cep_src")
    df = _events(spark, rows).orderBy("ts", "event_id")
    pdf = df.toPandas()
    n = max(1, len(pdf) // n_files)
    chunks = [pdf.iloc[i:i + n] for i in range(0, len(pdf), n)]
    os.makedirs(src, exist_ok=True)
    for i, c in enumerate(chunks):
        # coerce_timestamps: pandas/pyarrow default to TIMESTAMP(NANOS),
        # which Spark's file-stream reader rejects against the declared
        # `ts timestamp` (microsecond) schema
        c.to_parquet(os.path.join(src, f"part-{i:03d}.parquet"),
                     index=False, coerce_timestamps="us",
                     allow_truncated_timestamps=True)
        time.sleep(0.05)  # strictly increasing mtimes = arrival order
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", 1)
              .option("latestFirst", "false").parquet(src))
    out = cep.cep_skip_match_stream(stream, **kw)
    qname = f"cep_out_{abs(hash(str(rows))) % 10**8}"
    q = (out.writeStream.outputMode("update")
         .format("memory").queryName(qname).start())
    q.processAllAvailable()
    n_batches = len([p for p in q.recentProgress
                     if p["numInputRows"] > 0])
    q.stop()
    upd = spark.sql(f"SELECT * FROM {qname}").toPandas()
    # counters are monotonic non-decreasing per user, so max == the
    # converged answer regardless of the memory sink's row order
    final = upd.groupby("user_id").max()
    got = {int(u): (int(r["n_matches"]), int(r["n_sessions_matched"]))
           for u, r in final.iterrows() if r["n_matches"] > 0}
    return got, n_batches


def test_stream_nfa_matches_batch_query(spark, tmp_path):
    # real events (sf0.001), multi-batch, state carried across
    # micro-batches — final updates must equal the oracle-gated batch
    # query's (user_id, n_matches, n_sessions_matched)
    from new_data_pipeline_spark import catalog
    ev = catalog.load(spark, "/root/testdata/sf0.001", "events")
    pdf = (ev.select("user_id", "ts", "event_id", "event_type")
           .orderBy("ts", "event_id").toPandas())
    import os
    import time
    src = str(tmp_path / "real_src")
    os.makedirs(src, exist_ok=True)
    n = max(1, len(pdf) // 4)
    for i in range(0, len(pdf), n):
        pdf.iloc[i:i + n].to_parquet(
            os.path.join(src, f"part-{i // n:03d}.parquet"), index=False,
            coerce_timestamps="us", allow_truncated_timestamps=True)
        time.sleep(0.05)
    schema = "user_id bigint, ts timestamp, event_id bigint, event_type string"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (cep.cep_skip_match_stream(stream).writeStream
         .outputMode("update").format("memory")
         .queryName("cep_real_out").start())
    q.processAllAvailable()
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    q.stop()
    assert n_batches > 1, "must exercise more than one micro-batch"
    upd = spark.sql("SELECT * FROM cep_real_out").toPandas()
    final = upd.groupby("user_id").max()
    got = {int(u): (int(r["n_matches"]), int(r["n_sessions_matched"]))
           for u, r in final.iterrows() if r["n_matches"] > 0}
    want = {r["user_id"]: (r["n_matches"], r["n_sessions_matched"])
            for r in profiling.skip_match_counts(
                spark.createDataFrame(pdf)).collect()}
    assert got == want
    assert len(got) > 0


def test_stream_nfa_funnel_split_across_batches(spark, tmp_path):
    # a funnel whose view/click land in batch 1 and purchase in batch 2
    # must still match — the DFA state crosses the micro-batch boundary
    rows = [(1, 0, "view"), (1, 1, "click"), (1, 2, "purchase")]
    got, n_batches = _stream_counts(spark, tmp_path, rows, n_files=3)
    assert n_batches > 1
    assert got == {1: (1, 1)}


def test_stream_nfa_session_rollover_across_batches(spark, tmp_path):
    # batch 1 ends with a matched session; the 3-day gap to batch 2
    # rolls the session over, and a second funnel matches there
    gap = 3 * 24 * 60
    rows = [(1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),
            (1, gap, "view"), (1, gap + 1, "click"),
            (1, gap + 2, "purchase")]
    got, n_batches = _stream_counts(spark, tmp_path, rows, n_files=2)
    assert n_batches > 1
    assert got == {1: (2, 2)}


def test_stream_nfa_token_cap(spark, tmp_path):
    # the cap gates DFA input but the session clock still advances
    rows = [(1, 0, "view"), (1, 1, "click"), (1, 2, "click"),
            (1, 3, "purchase")]
    got, _ = _stream_counts(spark, tmp_path, rows, n_files=1, token_cap=3)
    assert got == {}


def test_batch_nfa_equals_regex_device(spark):
    # the registered cep_stream_funnel path: applyInPandas NFA over the
    # real events table must equal the batch regex query exactly (the
    # driver proves the same equivalence cross-engine via the shared
    # oracle)
    from new_data_pipeline_spark import catalog
    ev = catalog.load(spark, "/root/testdata/sf0.001", "events")
    nfa = cep.cep_skip_match_batch(ev)
    want = profiling.skip_match_counts(ev)
    assert nfa.exceptAll(want).count() == 0
    assert want.exceptAll(nfa).count() == 0
    assert nfa.count() > 0


def test_stream_nfa_reorder_buffer_heals_out_of_order(spark, tmp_path):
    """The watermark-delay reorder buffer (cep_skip_match_stream_reordered):
    the click is DELIVERED after the purchase (out of event-time order,
    within the 1h delay bound) — the plain NFA would scan
    view,purchase,click and count 0; the buffer must release the events
    in event-time order once the watermark passes them, healing the
    funnel. The flush rides the EventTimeTimeout path: the final
    watermark-advancing file belongs to a DIFFERENT user, so user 1's
    buffer drains on a timeout wake-up with no new input for that key."""
    import os
    import time

    files = [
        [(1, 0, "view"), (1, 2, "purchase")],   # batch 1: gap at click
        [(1, 1, "click")],                      # batch 2: late arrival
        [(99, 24 * 60, "error")],               # batch 3: advances wm
    ]
    src = str(tmp_path / "rb_src")
    os.makedirs(src, exist_ok=True)
    schema = ("user_id bigint, ts timestamp, event_id bigint, "
              "event_type string")
    eid = 0
    for i, rows in enumerate(files):
        data = []
        for uid, m, et in rows:
            data.append((uid, T0 + dt.timedelta(minutes=m), eid, et))
            eid += 1
        (spark.createDataFrame(data, schema).coalesce(1)
         .write.mode("overwrite")
         .parquet(os.path.join(src, f"f{i:03d}")))
        time.sleep(0.05)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "f*")))
    out = cep.cep_skip_match_stream_reordered(stream, delay_seconds=3600)
    q = (out.writeStream.outputMode("update")
         .format("memory").queryName("cep_rb_out").start())
    q.processAllAvailable()
    q.stop()
    upd = spark.sql("SELECT * FROM cep_rb_out").toPandas()
    final = upd.groupby("user_id").max()
    got = {int(u): (int(r["n_matches"]), int(r["n_sessions_matched"]))
           for u, r in final.iterrows() if r["n_matches"] > 0}
    assert got == {1: (1, 1)}


def test_vectorized_scan_equals_dfa():
    """The batch twin's closed-form numpy scan (VERDICT r7 #6) must
    agree with the streaming per-row DFA on arbitrary inputs: random
    multi-user histories, session gaps, and every cap regime."""
    import random

    import pandas as pd

    from new_data_pipeline_spark.streaming import cep

    rng = random.Random(20260815)
    gap_us = 100 * 1_000_000  # 100 s session gap
    for _trial in range(200):
        classes = rng.choice([cep.FUNNEL_CLASSES, cep.BRANCH_CLASSES])
        toks = list(classes)
        rows, eid = [], 0
        for u in range(rng.randint(1, 4)):
            t = 0
            for _ in range(rng.randint(0, 40)):
                t += rng.choice([1, 5, 50, 99, 101, 400])
                rows.append((u, t, eid, rng.choice(toks)))
                eid += 1
        if not rows:
            continue
        cap = rng.choice([1, 3, 5, 1000])
        pdf = pd.DataFrame(rows, columns=["user_id", "ts",
                                          "event_id", "event_type"])
        pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s")
        pdf = pdf.sort_values(["user_id", "ts", "event_id"])
        vec = cep._scan_vectorized(pdf, gap_us, cap, classes)
        got = {int(r.user_id): (int(r.n_matches), int(r.n_sessions_matched))
               for r in vec.itertuples()}
        for u, grp in pdf.groupby("user_id"):
            _, _, cur_n, done, total, _ = cep._scan(
                (None, 0, 0, 0, 0, 0), grp.sort_values(["ts", "event_id"]),
                gap_us, cap, classes)
            expect = (total + cur_n, done + (1 if cur_n > 0 else 0))
            assert got.get(int(u), (0, 0)) == expect, \
                (u, got.get(int(u)), expect, cap)


def test_branching_pattern_alternation(spark):
    """signup (view|click)+ (purchase|error): both alternation points
    must accept either token, and a mid-run restart at a new signup
    must behave like the funnel's leftmost-retry."""
    import pandas as pd

    from new_data_pipeline_spark.streaming import cep

    def run(seq):
        rows = [(1, i + 1, i, t) for i, t in enumerate(seq)]
        pdf = pd.DataFrame(rows, columns=["user_id", "ts",
                                          "event_id", "event_type"])
        pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s")
        df = spark.createDataFrame(pdf)
        out = cep.cep_skip_match_batch(
            df, classes=cep.BRANCH_CLASSES,
            relevant=cep.BRANCH_RELEVANT).collect()
        return out[0].n_matches if out else 0

    assert run(["signup", "view", "purchase"]) == 1
    assert run(["signup", "click", "error"]) == 1
    assert run(["signup", "view", "click", "view", "error"]) == 1
    assert run(["signup", "purchase"]) == 0          # mid+ needs one
    assert run(["view", "click", "purchase"]) == 0   # no signup start
    # leftmost retry: failed attempt restarts at the NEXT signup
    assert run(["signup", "view", "signup", "click", "purchase"]) == 1
    # two non-overlapping matches, mixed terminals
    assert run(["signup", "click", "purchase",
                "signup", "view", "error"]) == 2


def test_stream_nfa_branching_pattern(spark, tmp_path):
    """The STREAMING NFA with the branching class map: alternation at
    both elements, state crossing micro-batch boundaries, and a user
    whose tokens never include a start must not match."""
    rows = [(1, 0, "signup"), (1, 1, "click"), (1, 2, "error"),
            (2, 0, "signup"), (2, 1, "view"), (2, 2, "purchase"),
            (3, 0, "view"), (3, 1, "click"), (3, 2, "purchase")]
    got, n_batches = _stream_counts(spark, tmp_path, rows, n_files=3,
                                    classes=cep.BRANCH_CLASSES,
                                    relevant=cep.BRANCH_RELEVANT)
    assert n_batches > 1
    assert got == {1: (1, 1), 2: (1, 1)}  # user 3 never signs up


def test_stream_reorder_buffer_branching_pattern(spark, tmp_path):
    """The reorder buffer with the BRANCHING class map: a late view
    (delivered after the error terminal, within the delay bound) must
    be healed into event-time order, completing
    ``signup (view|click)+ (purchase|error)``."""
    import os
    import time

    files = [
        [(1, 0, "signup"), (1, 2, "error")],    # gap at the view
        [(1, 1, "view")],                       # late arrival
        [(99, 24 * 60, "click")],               # advances watermark
    ]
    src = str(tmp_path / "rb_br_src")
    os.makedirs(src, exist_ok=True)
    schema = ("user_id bigint, ts timestamp, event_id bigint, "
              "event_type string")
    eid = 0
    for i, rows in enumerate(files):
        data = []
        for uid, m, et in rows:
            data.append((uid, T0 + dt.timedelta(minutes=m), eid, et))
            eid += 1
        (spark.createDataFrame(data, schema).coalesce(1)
         .write.mode("overwrite")
         .parquet(os.path.join(src, f"f{i:03d}")))
        time.sleep(0.05)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "f*")))
    out = cep.cep_skip_match_stream_reordered(
        stream, delay_seconds=3600,
        classes=cep.BRANCH_CLASSES, relevant=cep.BRANCH_RELEVANT)
    q = (out.writeStream.outputMode("update")
         .format("memory").queryName("cep_rb_br_out").start())
    q.processAllAvailable()
    q.stop()
    upd = spark.sql("SELECT * FROM cep_rb_br_out").toPandas()
    final = upd.groupby("user_id").max()
    got = {int(u): (int(r["n_matches"]), int(r["n_sessions_matched"]))
           for u, r in final.iterrows() if r["n_matches"] > 0}
    assert got == {1: (1, 1)}
