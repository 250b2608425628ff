"""Bloom filter contract: zero false negatives (every inserted key probes true),
bitmap size bounded by m/32 rows regardless of key count, probe preserves the
probed frame's row count and columns, and the plan shape stays broadcast-only
(the corpus side is never shuffled)."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_genre_data_pipeline_spark.functions.bloom import (
    WORD_BITS,
    bloom_probe,
    build_bloom,
)

M_BITS = 4096
K = 3


def _keys(spark, n, prefix):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("key")
    )


def test_no_false_negatives_and_size_bound(spark):
    members = _keys(spark, 500, "in-")
    bloom = build_bloom(members, "key", M_BITS, K).localCheckpoint()
    assert bloom.count() <= M_BITS // WORD_BITS
    probed = bloom_probe(members, "key", bloom, M_BITS, K)
    assert probed.filter(~F.col("bloom_hit")).count() == 0


def test_probe_preserves_rows_and_misses_fresh_keys(spark):
    members = _keys(spark, 200, "in-")
    bloom = build_bloom(members, "key", M_BITS, K).localCheckpoint()
    outsiders = _keys(spark, 300, "out-").withColumn("tag", F.lit("x"))
    probed = bloom_probe(outsiders, "key", bloom, M_BITS, K)
    assert probed.columns == ["key", "tag", "bloom_hit"]
    assert probed.count() == 300
    # 200 keys in 4096 bits -> FP rate ~ (1-e^(-3*200/4096))^3 ~ 0.25%;
    # allow a generous margin but require that misses dominate.
    assert probed.filter(F.col("bloom_hit")).count() < 30


def test_probe_plan_is_broadcast_only(spark):
    members = _keys(spark, 100, "in-")
    bloom = build_bloom(members, "key", M_BITS, K).localCheckpoint()
    plan = bloom_probe(
        _keys(spark, 100, "out-"), "key", bloom, M_BITS, K
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_build_validates_params(spark):
    import pytest

    keys = _keys(spark, 10, "k-")
    with pytest.raises(ValueError):
        build_bloom(keys, "key", m_bits=100, k=3)  # not a multiple of 32
    with pytest.raises(ValueError):
        build_bloom(keys, "key", m_bits=4096, k=0)


def test_probe_param_mismatch_raises(spark):
    """A probe with different m_bits/k than the build returns plausible but
    WRONG membership bits — the bitmap carries its build params in schema
    metadata so the mismatch fails loudly (ADVICE r2)."""
    import pytest

    members = _keys(spark, 50, "in-")
    bloom = build_bloom(members, "key", M_BITS, K).localCheckpoint()
    with pytest.raises(ValueError, match="m_bits"):
        bloom_probe(members, "key", bloom, M_BITS * 2, K)
    with pytest.raises(ValueError, match="m_bits"):
        bloom_probe(members, "key", bloom, M_BITS, K + 1)


def test_probe_params_survive_parquet_roundtrip(spark, tmp_path):
    members = _keys(spark, 50, "in-")
    path = str(tmp_path / "bloom")
    build_bloom(members, "key", M_BITS, K).write.parquet(path)
    reloaded = spark.read.parquet(path)
    import pytest

    with pytest.raises(ValueError, match="m_bits"):
        bloom_probe(members, "key", reloaded, M_BITS // 2, K)
    probed = bloom_probe(members, "key", reloaded, M_BITS, K)
    assert probed.filter(~F.col("bloom_hit")).count() == 0


def test_probe_keeps_user_columns_with_internal_like_names(spark):
    """User columns named like the old '__w' prefix must survive probe's
    internal-column cleanup (ADVICE r2: only exact generated names drop)."""
    members = _keys(spark, 20, "in-")
    bloom = build_bloom(members, "key", M_BITS, K).localCheckpoint()
    probed = bloom_probe(
        members.withColumn("__weird", F.lit(1)), "key", bloom, M_BITS, K
    )
    assert "__weird" in probed.columns


def test_probe_rejects_reserved_name_collision(spark):
    """A user column that exactly matches a generated internal name would be
    silently dropped post-join — the probe refuses up front instead."""
    import pytest

    members = _keys(spark, 20, "in-")
    bloom = build_bloom(members, "key", M_BITS, K).localCheckpoint()
    with pytest.raises(ValueError, match="collide"):
        bloom_probe(
            members.withColumn("__bloom_idx0", F.lit(1)), "key", bloom, M_BITS, K
        )
