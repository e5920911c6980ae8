"""Unit tests for the reusable column-expression library
(cdc_dedupe_spark.functions) — exercised directly on tiny DataFrames,
independent of the declared query set."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from cdc_dedupe_spark.functions import (
    char_shingles,
    cosine,
    dot,
    l2_norm,
    marker_count,
    simhash,
    token_hash,
)


def test_dot_and_norm_exact(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<double>, b array<double>")
    r = df.select(
        dot(F.col("a"), F.col("b")).alias("d"), l2_norm(F.col("a")).alias("n")
    ).first()
    assert r.d == 32.0
    assert abs(r.n - math.sqrt(14.0)) < 1e-12


def test_cosine_identity_and_orthogonal(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0], [0.0, 2.0])], "a array<double>, b array<double>, c array<double>"
    )
    r = df.select(
        cosine(F.col("a"), F.col("b")).alias("same"),
        cosine(F.col("a"), F.col("c"), round_digits=4).alias("orth"),
    ).first()
    assert r.same == 1.0 and r.orth == 0.0


def test_token_hash_deterministic_and_bounded(spark):
    df = spark.createDataFrame([("alpha",), ("beta",), ("alpha",)], "t string")
    rows = df.select(token_hash(F.col("t")).alias("h")).collect()
    assert rows[0].h == rows[2].h != rows[1].h
    assert all(0 <= r.h < (1 << 61) for r in rows)


def test_simhash_similar_texts_close_hamming(spark):
    df = spark.createDataFrame(
        [
            ("a", "the quick brown fox jumps over the lazy dog"),
            ("b", "the quick brown fox jumps over the lazy cat"),
            ("c", "completely unrelated words describing spark plans"),
        ],
        "id string, text string",
    )
    out = {r.id: r.s for r in df.select("id", simhash(F.col("text")).alias("s")).collect()}
    ham = lambda x, y: bin(x ^ y).count("1")
    assert ham(out["a"], out["b"]) < ham(out["a"], out["c"])


def test_char_shingles_small_text(spark):
    df = spark.createDataFrame([("abcdef",)], "text string")
    [r] = df.select(char_shingles(F.col("text"), n=5, prefix_len=None).alias("sh")).collect()
    assert sorted(r.sh) == ["abcde", "bcdef"]


def test_marker_count_counts_occurrences(spark):
    df = spark.createDataFrame([("x the y the z",)], "text string")
    [r] = df.select(marker_count(F.col("text"), " the ").alias("n")).collect()
    assert r.n == 2
