"""Corpus-mixture operators (extensions/mixture.py): per-domain caps,
per-language token budgets, deterministic shard shuffling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cascading_flink_spark.extensions import (
    domain_quota, shuffle_shard, token_budget_mixture,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"src{i % 4}", "en" if i % 3 else "de", 10 + i % 7)
            for i in range(200)]
    return spark.createDataFrame(
        rows, "doc_id long, source string, lang string, n_tokens long")


def test_domain_quota_caps_every_domain(spark, docs):
    out = domain_quota(docs, "source", max_docs=5)
    per = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per == {f"src{i}": 5 for i in range(4)}


def test_domain_quota_deterministic_and_seeded(spark, docs):
    a = {r.doc_id for r in domain_quota(docs, "source", 5).collect()}
    b = {r.doc_id for r in domain_quota(docs, "source", 5).collect()}
    assert a == b
    c = {r.doc_id for r in
         domain_quota(docs, "source", 5, seed="other").collect()}
    assert a != c  # a new seed is an independent sample


def test_token_budget_binds_per_language(spark, docs):
    out = token_budget_mixture(docs, {"en": 300, "de": 10_000_000})
    sums = {r["lang"]: r["s"] for r in
            out.groupBy("lang").agg(F.sum("n_tokens").alias("s")).collect()}
    assert sums["en"] <= 300
    # the next en doc in md5 order would overshoot: the budget truly binds
    n_en_total = docs.filter("lang = 'en'").count()
    n_en_kept = out.filter("lang = 'en'").count()
    assert 0 < n_en_kept < n_en_total
    # unbounded language keeps everything
    assert sums["de"] == docs.filter("lang = 'de'") \
        .agg(F.sum("n_tokens")).collect()[0][0]


def test_token_budget_drops_unlisted_languages(spark, docs):
    out = token_budget_mixture(docs, {"de": 10_000_000})
    assert out.filter("lang = 'en'").count() == 0


def test_shuffle_shard_partitions_everything_once(spark, docs):
    out = shuffle_shard(docs, num_shards=8)
    assert out.count() == 200
    stats = out.groupBy("shard").agg(
        F.count("*").alias("n"), F.max("shard_pos").alias("mx"),
        F.min("shard_pos").alias("mn")).collect()
    assert sorted(r["shard"] for r in stats) == sorted(
        {r["shard"] for r in stats})  # distinct shards
    for r in stats:
        # shard_pos is a dense 1..n ranking within the shard
        assert (r["mn"], r["mx"]) == (1, r["n"])
    assert {r["shard"] for r in stats} <= set(range(8))


def test_shuffle_shard_seed_reshuffles(spark, docs):
    a = {(r.doc_id, r.shard, r.shard_pos)
         for r in shuffle_shard(docs, 8, seed="epoch0").collect()}
    b = {(r.doc_id, r.shard, r.shard_pos)
         for r in shuffle_shard(docs, 8, seed="epoch1").collect()}
    assert a != b


def test_shuffle_shard_validates(spark, docs):
    with pytest.raises(ValueError):
        shuffle_shard(docs, 0)
