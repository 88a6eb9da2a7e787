"""Count-min sketch: construction pinned nibble-for-nibble against a
scalar reference (same md5-derived hashes), the one-sided guarantee,
mergeability, and the absent-key zero."""

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from fluxgraph_spark.functions import sketches

WORDS = (
    ["the"] * 50 + ["fox"] * 20 + ["lazy"] * 9 + ["dog"] * 5
    + [f"rare{i}" for i in range(40)]
)


def _h(key, j, width):
    return int(hashlib.md5(f"{j}:{key}".encode()).hexdigest()[:15], 16) % width


def _ref_cms(words, depth, width):
    counters = Counter()
    for w, n in Counter(words).items():
        for j in range(depth):
            counters[(j, _h(w, j, width))] += n
    return counters


def _ref_est(counters, key, depth, width):
    return min(counters.get((j, _h(key, j, width)), 0) for j in range(depth))


@pytest.fixture(scope="module")
def words_df(spark):
    return spark.createDataFrame([(w,) for w in WORDS], ["word"])


def test_cms_build_matches_scalar_reference(spark, words_df):
    got = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in sketches.cms_build(words_df, "word", depth=3, width=64).collect()
    }
    assert got == dict(_ref_cms(WORDS, 3, 64))


def test_cms_estimate_one_sided_and_exact_reference(spark, words_df):
    cms = sketches.cms_build(words_df, "word", depth=3, width=64)
    keys = spark.createDataFrame(
        [(w,) for w in ["the", "fox", "lazy", "dog", "rare0", "absent"]], ["word"]
    )
    got = {
        r["key"]: r["est_n"]
        for r in sketches.cms_estimate(cms, keys, "word", depth=3, width=64).collect()
    }
    ref = _ref_cms(WORDS, 3, 64)
    true = Counter(WORDS)
    for k, est in got.items():
        assert est == _ref_est(ref, k, 3, 64)
        assert est >= true.get(k, 0)          # one-sided: never under
    assert got["absent"] >= 0
    # a wide sketch with few keys: heavy keys come back exact here
    wide = sketches.cms_build(words_df, "word", depth=4, width=1 << 14)
    got_w = {
        r["key"]: r["est_n"]
        for r in sketches.cms_estimate(cms=wide, keys=keys, key_col="word", depth=4, width=1 << 14).collect()
    }
    ref_w = _ref_cms(WORDS, 4, 1 << 14)
    assert all(got_w[k] == _ref_est(ref_w, k, 4, 1 << 14) for k in got_w)


def test_cms_merge_equals_whole(spark, words_df):
    rows = [r["word"] for r in words_df.collect()]
    a = rows[:60]
    b = rows[60:]
    df_a = spark.createDataFrame([(w,) for w in a], ["word"])
    df_b = spark.createDataFrame([(w,) for w in b], ["word"])
    whole = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in sketches.cms_build(words_df, "word", depth=3, width=32).collect()
    }
    merged = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in sketches.cms_merge(
            sketches.cms_build(df_a, "word", depth=3, width=32),
            sketches.cms_build(df_b, "word", depth=3, width=32),
        ).collect()
    }
    assert merged == whole


def test_cms_weighted_build(spark):
    df = spark.createDataFrame([("a", 5), ("a", 2), ("b", 1)], ["word", "n"])
    cms = sketches.cms_build(df, "word", depth=2, width=16, weight_col="n")
    keys = spark.createDataFrame([("a",), ("b",)], ["word"])
    got = {
        r["key"]: r["est_n"]
        for r in sketches.cms_estimate(cms, keys, "word", depth=2, width=16).collect()
    }
    assert got["a"] >= 7 and got["b"] >= 1


def test_cms_bad_shape_raises(spark, words_df):
    with pytest.raises(ValueError):
        sketches.cms_build(words_df, "word", depth=0)
    with pytest.raises(ValueError):
        sketches.cms_build(words_df, "word", width=1)
