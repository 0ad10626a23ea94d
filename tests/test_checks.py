

def test_skew_report_hand_computed(spark):
    """Hand-built skewed key distribution: 1000 rows on one hot key,
    10 rows on each of 50 cold keys -> every report field verified
    against the closed-form values."""
    from go_streams_spark.functions.checks import skew_report
    import pytest as _pytest
    rows = [("hot",)] * 1000 + [(f"k{i:02d}",) for i in range(50)
                                for _ in range(10)]
    df = spark.createDataFrame(rows, "k string")
    r = skew_report(df, ["k"], target_factor=4, top_k=5).collect()[0]
    n_rows, n_keys = 1500, 51
    mean = n_rows / n_keys
    assert r["n_rows"] == n_rows and r["n_keys"] == n_keys
    assert r["mean_rows"] == round(mean, 4)
    assert r["max_rows"] == 1000
    assert r["skew_ratio"] == round(1000 / mean, 4)
    # top5 = hot(1000) + four cold keys(10 each)
    assert r["top5_share"] == round(1040 / 1500, 4)
    assert r["top1_key"] == "hot"
    import math
    assert r["salt_buckets"] == max(1, math.ceil(1000 / (4 * mean)))
    # uniform data needs no salting
    uni = spark.createDataFrame([(f"k{i}",) for i in range(20)
                                 for _ in range(10)], "k string")
    assert skew_report(uni, ["k"]).collect()[0]["salt_buckets"] == 1
    with _pytest.raises(ValueError, match="keys"):
        skew_report(df, [])
    with _pytest.raises(ValueError, match="target_factor"):
        skew_report(df, ["k"], target_factor=0)
