"""Empty-input robustness: every operator must return an empty result of
the right schema (not throw) when its input has no rows — the situation
every partition-pruned or heavily-filtered 100 TB pipeline stage hits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_near_dup_family_on_empty(spark, empty_docs):
    from stream_processing_platform_spark.operators import dedup

    assert dedup.minhash_lsh_pairs(empty_docs, "doc_id", "text", 0.8).count() == 0
    assert dedup.simhash_pairs(empty_docs, "doc_id", "text").count() == 0
    assert dedup.ngram_jaccard_pairs(empty_docs, "doc_id", "text", 0.5).count() == 0


def test_dedup_and_sessionize_on_empty(spark, empty_docs):
    from stream_processing_platform_spark.operators import windows_batch
    from stream_processing_platform_spark.operators.dedup import dedup_keep_first

    assert dedup_keep_first(empty_docs, ["doc_id"], [F.col("text").asc()]).count() == 0
    e = spark.createDataFrame([], "k long, ts_ms long, eid long")
    out = windows_batch.sessionize(e, "ts_ms", ["k"], 1000, "eid")
    assert out.count() == 0 and "session_id" in out.columns


def test_prep_ops_on_empty(spark, empty_docs):
    from stream_processing_platform_spark.operators.dedup import (
        contamination_pairs,
        incremental_dedup,
    )

    bench = spark.createDataFrame([(1, "some benchmark text here")], "doc_id long, text string")
    assert contamination_pairs(empty_docs, bench, "doc_id", "text").count() == 0
    # empty benchmark side too
    assert contamination_pairs(bench, empty_docs, "doc_id", "text").count() == 0
    empty_keys = spark.createDataFrame([], "fp string")
    inc = spark.createDataFrame([], "doc_id long, fp string")
    assert incremental_dedup(inc, empty_keys, "fp", "doc_id").count() == 0
    # empty index: everything in the batch survives (minus in-batch dups)
    batch = spark.createDataFrame([(1, "a"), (2, "a")], "doc_id long, fp string")
    assert incremental_dedup(batch, empty_keys, "fp", "doc_id").count() == 1


def test_topk_on_empty_corpus(spark):
    from stream_processing_platform_spark.operators.ann import brute_force_topk

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    q = spark.createDataFrame([(1, [0.1, 0.2])], "vec_id long, embedding array<float>")
    assert brute_force_topk(empty, q, k=3).count() == 0


def test_round6_operators_degenerate_inputs(spark):
    """Empty / constant-column inputs through the round-6 operators:
    no NaN keys, no division crashes, empty in -> empty out."""
    import pyspark.sql.functions as F

    from stream_processing_platform_spark.operators import layout, scd
    from stream_processing_platform_spark.operators.graph import pagerank
    from stream_processing_platform_spark.operators.rollup import hierarchical_rollup
    from stream_processing_platform_spark.operators.sketches import heavy_hitters

    empty_items = spark.createDataFrame([], "item string")
    assert heavy_hitters(empty_items, "item", 100).count() == 0

    # constant column: degenerate 0/0 normalize must pin to bucket 0
    const = spark.range(4).select(F.lit(7).alias("x"))
    z = layout.zorder_value([layout.normalize_to_bits(F.col("x"), 7, 7, 8)], 8)
    assert [r[0] for r in const.select(z).collect()] == [0, 0, 0, 0]

    # empty graph
    ev = spark.createDataFrame([], "id long")
    ee = spark.createDataFrame([], "src long, dst long")
    assert pagerank(ev, ee).count() == 0

    # empty rollup pyramid
    e = spark.createDataFrame([], "ts_ms long, g string, v long")
    levels = hierarchical_rollup(e, "ts_ms", ["g"], "v", [1000, 2000])
    assert levels[1].count() == 0

    # SCD2 with an empty update batch is a no-op snapshot
    dim = spark.createDataFrame([(1, "a")], "k int, v string")
    t0 = scd.scd2_init(dim, ["k"], ["v"])
    b = spark.createDataFrame([], "k int, v string, effective_ms long")
    assert sorted(map(tuple, scd.scd2_apply(t0, b, ["k"], ["v"]).collect())) == sorted(
        map(tuple, t0.collect())
    )


def test_session_operators_degenerate_inputs(spark):
    """This session's operator families on empty / degenerate inputs:
    no crashes, empty-in → empty-out, errors only where declared."""
    from pyspark.sql import functions as F

    from stream_processing_platform_spark.operators.cdc import apply_cdc
    from stream_processing_platform_spark.operators.clustering import kmeans_assign
    from stream_processing_platform_spark.operators.fuzzy import fuzzy_self_pairs
    from stream_processing_platform_spark.operators.graph import label_propagation
    from stream_processing_platform_spark.operators.quality import expectation_report
    from stream_processing_platform_spark.operators.ranking import bm25_scores
    from stream_processing_platform_spark.operators.timeseries import gap_fill, ohlc_bars

    # empty events -> empty bars / empty grid
    ee = spark.createDataFrame(
        [], "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    )
    assert ohlc_bars(ee, "ts", "value", ["user_id"], 60_000, "event_id").count() == 0
    for m in ("locf", "linear"):
        assert gap_fill(ee, "ts", "value", "user_id", 60_000, m).count() == 0

    # empty change log -> empty current state
    ch = spark.createDataFrame([], "k bigint, s bigint, op string, v bigint")
    assert apply_cdc(ch, "k", "s", "op", "v").count() == 0

    # empty vocabulary -> no fuzzy pairs
    vv = spark.createDataFrame([], "t string")
    assert fuzzy_self_pairs(vv, "t").count() == 0

    # empty graph -> every vertex (none) labeled; isolated seeds keep labels
    gv = spark.createDataFrame([], "id bigint, seed_label int")
    ge = spark.createDataFrame([], "src bigint, dst bigint")
    assert label_propagation(gv, ge, num_iter=1).count() == 0

    # empty corpus -> BM25 returns nothing (no division by zero on avgdl)
    dd = spark.createDataFrame([], "doc_id bigint, text string")
    assert bm25_scores(dd, ["x"]).count() == 0

    # empty frame expectations: zero violations, vacuously passed
    rep = {r.rule: (r.n_violations, r.passed) for r in
           expectation_report(ee, {"v": F.col("value").isNotNull()}).collect()}
    assert rep == {"v": (0, True)}

    # kmeans_assign on empty input is empty (the Arrow UDF's zero-batch path)
    ev = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    assert kmeans_assign(ev, [[0.0, 0.0]]).count() == 0


def test_round7b_ops_on_empty(spark):
    from stream_processing_platform_spark.operators.graph import triangle_counts
    from stream_processing_platform_spark.operators.joins import near_pairs
    from stream_processing_platform_spark.operators.percentiles import (
        exact_percentiles_distributed,
    )
    from stream_processing_platform_spark.operators.rollup import (
        aggregate_state,
        merge_aggregate_state,
    )
    from stream_processing_platform_spark.operators.timeseries import ewma

    e = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, value double"
    )
    out = ewma(e, "ts", "value", "user_id", alpha=0.25, seq_col="event_id")
    assert out.count() == 0 and out.columns == ["user_id", "n", "ewma_c"]

    v = spark.createDataFrame([], "id long, k string, c long")
    assert near_pairs(v, "id", "c", 10, "k").count() == 0
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert triangle_counts(pairs).count() == 0

    st = aggregate_state(v, ["k"], "c")
    assert merge_aggregate_state([st, st], ["k"]).count() == 0

    pc = exact_percentiles_distributed(v, "c", {"med": 0.5}, ["k"])
    assert pc.count() == 0 and pc.columns == ["k", "med", "n"]


def test_avro_write_read_empty_frame(spark, tmp_path):
    from stream_processing_platform_spark.sources.avro_datasource import (
        register_avro_source,
    )

    register_avro_source(spark)
    out = str(tmp_path / "empty")
    spark.createDataFrame([], "id long, s string").coalesce(1).write.format(
        "spp_avro"
    ).mode("overwrite").save(out)
    back = spark.read.format("spp_avro").load(out)
    assert back.count() == 0 and back.columns == ["id", "s"]


def test_r11_operators_on_empty(spark, empty_docs):
    """r11 additions must return empty results of the right schema (not
    throw) on empty input — the partition-pruned-pipeline-stage case."""
    from pyspark.sql import functions as F

    from stream_processing_platform_spark.functions.html import boilerplate_blocks
    from stream_processing_platform_spark.operators.mixture import (
        temperature_mixture,
    )
    from stream_processing_platform_spark.operators.sketches import kmv_distinct
    from stream_processing_platform_spark.operators.webcur import (
        canonical_url,
        surt_key,
    )

    e = spark.createDataFrame([], "g string, v long")
    out = kmv_distinct(e, ["g"], "v", k=8)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["g", "approx_distinct", "kth_hash"]

    m = spark.createDataFrame([], "doc_id long, source string, n long, h string")
    tm = temperature_mixture(m, 1000, "n", hash_col="h")
    assert tm.count() == 0

    u = spark.createDataFrame([], "url string")
    cu = u.select(canonical_url(F.col("url")).alias("c"),
                  surt_key(F.col("url")).alias("s"))
    assert cu.count() == 0

    bp = empty_docs.select(
        boilerplate_blocks(F.coalesce(F.col("text"), F.lit("")))["content"].alias("c")
    )
    assert bp.count() == 0


def test_r12_operator_family_on_empty(spark, empty_docs):
    """Round-12 operators on zero-row inputs: right schema, no throw."""
    from stream_processing_platform_spark.functions.html import (
        boilerplate_blocks_pandas,
    )
    from stream_processing_platform_spark.operators.unicode_scripts import (
        script_mix,
    )

    bp = boilerplate_blocks_pandas(empty_docs, F.col("text"))
    assert bp.count() == 0 and set(bp.columns) >= {"content", "n_blocks", "n_kept"}
    sm = script_mix(empty_docs, "text")
    assert sm.count() == 0 and "dominant_script" in sm.columns
    # empty-string payloads (not just empty frames)
    one = spark.createDataFrame([(1, "")], "doc_id long, text string")
    assert boilerplate_blocks_pandas(one, F.col("text")).collect()[0]["n_blocks"] == 0
    # NULL payloads decay to the '' sentinels, never throw (r12 ADVICE)
    nul = spark.createDataFrame([(1, None)], "doc_id long, text string")
    row = boilerplate_blocks_pandas(nul, F.col("text")).collect()[0]
    assert (row["content"], row["n_blocks"], row["n_kept"]) == ("", 0, 0)
    assert script_mix(one, "text").collect()[0]["dominant_script"] == "none"
    # mp3 probe over an empty payload
    from stream_processing_platform_spark.multimodal.mp3probe import parse_mp3

    assert parse_mp3(b"")["n_frames"] == 0
