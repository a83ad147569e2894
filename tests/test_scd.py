"""SCD2 multi-batch semantics: history chains correctly across
successive CDC batches (the oracle query covers a single batch)."""

from __future__ import annotations

import pyspark.sql.functions as F

from stream_processing_platform_spark.operators import scd


def _rows(df):
    return sorted(
        (
            (
                r["k"],
                r["v"],
                r["valid_from_ms"],
                r["valid_to_ms"],
                r["is_current"],
            )
            for r in df.collect()
        ),
        key=lambda t: (t[0], t[2], t[1] or ""),  # None-safe sort
    )


def test_scd2_two_batches_chain_history(spark):
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    t0 = scd.scd2_init(dim, ["k"], ["v"])

    # Batch 1: k=1 changes a->x at t=100; k=3 is new at t=150; k=2 no-op.
    b1 = spark.createDataFrame(
        [(1, "x", 100), (2, "b", 100), (3, "c", 150)], "k int, v string, effective_ms long"
    )
    t1 = scd.scd2_apply(t0, b1, ["k"], ["v"])
    E = scd.OPEN_END_MS
    assert _rows(t1) == [
        (1, "a", 0, 100, 0),
        (1, "x", 100, E, 1),
        (2, "b", 0, E, 1),
        (3, "c", 150, E, 1),
    ]

    # Batch 2: k=1 changes again x->y at t=200 — history must chain
    # (closed rows pass through untouched); in-batch dupes collapse to
    # the latest effective time (the t=180 value never lands).
    b2 = spark.createDataFrame(
        [(1, "ignored", 180), (1, "y", 200)], "k int, v string, effective_ms long"
    )
    t2 = scd.scd2_apply(t1, b2, ["k"], ["v"])
    assert _rows(t2) == [
        (1, "a", 0, 100, 0),
        (1, "x", 100, 200, 0),
        (1, "y", 200, E, 1),
        (2, "b", 0, E, 1),
        (3, "c", 150, E, 1),
    ]

    # As-of reads fall out of the interval columns.
    asof_150 = t2.where(
        (F.col("valid_from_ms") <= 150) & (F.col("valid_to_ms") > 150) & (F.col("k") == 1)
    )
    assert [r["v"] for r in asof_150.collect()] == ["x"]


def test_scd2_null_transitions_count_as_changes(spark):
    """NULL -> value and value -> NULL must close the open row; a plain
    != comparison would yield NULL and silently drop the close."""
    dim = spark.createDataFrame([(1, None), (2, "b")], "k int, v string")
    t0 = scd.scd2_init(dim, ["k"], ["v"])
    b = spark.createDataFrame([(1, "x", 10), (2, None, 10)], "k int, v string, effective_ms long")
    t1 = scd.scd2_apply(t0, b, ["k"], ["v"])
    E = scd.OPEN_END_MS
    assert _rows(t1) == [
        (1, None, 0, 10, 0),
        (1, "x", 10, E, 1),
        (2, "b", 0, 10, 0),
        (2, None, 10, E, 1),
    ]


def test_apply_cdc_last_writer_wins_and_tombstones(spark):
    from stream_processing_platform_spark.operators.cdc import apply_cdc

    env = spark.createDataFrame(
        [
            # key 1: insert, update -> survives with the update's payload
            (1, 10, 100, "u", 5),
            (1, 20, 101, "u", 7),
            # key 2: insert then delete -> gone
            (2, 10, 102, "u", 9),
            (2, 30, 103, "d", 0),
            # key 3: delete then REINSERT -> survives (order matters)
            (3, 10, 104, "d", 0),
            (3, 40, 105, "u", 11),
            # key 4: seq tie broken by event_id -> the higher id wins
            (4, 50, 106, "u", 1),
            (4, 50, 107, "u", 2),
        ],
        "user_id bigint, seq_ms bigint, event_id bigint, op string, cents bigint",
    )
    got = {
        r.user_id: (r.cents, r.last_seq, r.n_ops)
        for r in apply_cdc(
            env, "user_id", ["seq_ms", "event_id"], "op", "cents"
        ).collect()
    }
    assert got == {1: (7, 20, 2), 3: (11, 40, 2), 4: (2, 50, 2)}
    assert 2 not in got


def test_table_diff_hand_computed(spark):
    """added/removed/changed/unchanged each exercised; unchanged rows
    are absent from the diff."""
    from stream_processing_platform_spark.operators.cdc import table_diff

    old = spark.createDataFrame(
        [(1, 10, "x"), (2, 20, "y"), (3, 30, "z")], "k long, c long, s string"
    )
    new = spark.createDataFrame(
        [(2, 20, "y"), (3, 31, "z"), (4, 40, "w")], "k long, c long, s string"
    )
    got = {r.k: (r.change, r.old_c, r.new_c, r.old_s, r.new_s)
           for r in table_diff(old, new, ["k"], ["c", "s"]).collect()}
    assert got == {
        1: ("removed", 10, None, "x", None),
        3: ("changed", 30, 31, "z", "z"),
        4: ("added", None, 40, None, "w"),
    }  # key 2 unchanged: not emitted


def test_table_diff_null_value_transitions(spark):
    """null->value and value->null are 'changed' (null-safe compare);
    null->null is unchanged."""
    from stream_processing_platform_spark.operators.cdc import table_diff

    old = spark.createDataFrame([(1, None), (2, 5), (3, None)], "k long, c long")
    new = spark.createDataFrame([(1, 7), (2, None), (3, None)], "k long, c long")
    got = {r.k: r.change for r in table_diff(old, new, ["k"], ["c"]).collect()}
    assert got == {1: "changed", 2: "changed"}


def test_table_diff_null_keys_match_null_safely(spark):
    """A legitimately-NULL key column must join null-safely (changed,
    not added+removed) and presence detection must not key off
    null-ness."""
    from stream_processing_platform_spark.operators.cdc import table_diff

    old = spark.createDataFrame(
        [(None, 5, 10), (1, 1, 30)], "region long, id long, c long"
    )
    new = spark.createDataFrame(
        [(None, 5, 11), (1, 1, 30)], "region long, id long, c long"
    )
    rows = [(r.region, r.id, r.change, r.old_c, r.new_c)
            for r in table_diff(old, new, ["region", "id"], ["c"]).collect()]
    assert rows == [(None, 5, "changed", 10, 11)]
