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
    a = {r.doc_id for r in
         domain_quota(docs, "source", 5, strategy="window").collect()}
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


def test_domain_quota_twoscan_equals_window(spark, docs):
    a = {r.doc_id for r in
         domain_quota(docs, "source", 5, strategy="window").collect()}
    b = {r.doc_id for r in
         domain_quota(docs, "source", 5, strategy="twoscan").collect()}
    assert a == b
    out = domain_quota(docs, "source", 5, strategy="twoscan")
    assert out.columns == docs.columns


def test_token_budget_twoscan_equals_window(spark, docs):
    budgets = {"en": 300, "de": 10_000_000}
    a = {r.doc_id for r in
         token_budget_mixture(docs, budgets, strategy="window").collect()}
    b = {r.doc_id for r in
         token_budget_mixture(docs, budgets, strategy="twoscan").collect()}
    assert a == b


def test_mixture_strategy_validates(spark, docs):
    with pytest.raises(ValueError):
        domain_quota(docs, "source", 5, strategy="nope")
    with pytest.raises(ValueError):
        token_budget_mixture(docs, {"en": 1}, strategy="nope")


def test_domain_quota_twoscan_mega_domain_bounded_sort(spark):
    """One domain with 200k rows, max_docs=100: the twoscan path must (a)
    equal the window path exactly, and (b) rank only the md5-threshold
    prefix — ~oversample*max_docs rows, not 200k — so a mega-domain never
    single-task sorts.  (b) is checked by replicating the public
    threshold formula: the surviving prefix is tiny, and those survivors
    are the only rows the twoscan window ever sees."""
    from cascading_flink_spark.extensions.mixture import _md5_frac
    mega = spark.range(200_000).selectExpr(
        "id AS doc_id", "'hot' AS source", "5 AS n_tokens")
    small = spark.range(200_000, 200_050).selectExpr(
        "id AS doc_id", "'cold' AS source", "5 AS n_tokens")
    df = mega.unionByName(small)
    a = {r.doc_id for r in
         domain_quota(df, "source", 100, strategy="window").collect()}
    b = {r.doc_id for r in
         domain_quota(df, "source", 100, strategy="twoscan").collect()}
    assert a == b
    assert len(b & set(range(200_000))) == 100      # mega capped
    assert len(b & set(range(200_000, 200_050))) == 50  # cold kept whole
    # the sort input: rows under the md5 threshold 2*100/200000 = 1e-3
    survivors = mega.filter(_md5_frac("doc_id", "quota") <= 2.0 * 100 / 200_000)
    n_surv = survivors.count()
    assert 100 <= n_surv < 2_000  # ~200 expected; never the full 200k


def test_token_budget_twoscan_mega_language(spark):
    mega = spark.range(100_000).selectExpr(
        "id AS doc_id", "'en' AS lang", "CAST(2 + id % 5 AS LONG) AS n_tokens")
    budgets = {"en": 1000}
    a = {r.doc_id for r in
         token_budget_mixture(mega, budgets, strategy="window").collect()}
    b = {r.doc_id for r in
         token_budget_mixture(mega, budgets, strategy="twoscan").collect()}
    assert a == b and 0 < len(a) < 100_000


def test_twoscan_rescue_path_exact(spark):
    """Force the undershoot rescue with a sub-1 oversample: the prefix
    catches (far) fewer than max_docs survivors, so the guard must route
    the domain through the full window path and still return the exact
    window-path answer."""
    df = spark.range(10_000).selectExpr(
        "id AS doc_id", "'hot' AS source", "'en' AS lang",
        "5 AS n_tokens")
    a = {r.doc_id for r in
         domain_quota(df, "source", 5_000, strategy="window").collect()}
    b = {r.doc_id for r in
         domain_quota(df, "source", 5_000, strategy="twoscan",
                      oversample=0.01).collect()}
    assert a == b
    c = {r.doc_id for r in
         token_budget_mixture(df, {"en": 25_000},
                              strategy="window").collect()}
    d = {r.doc_id for r in
         token_budget_mixture(df, {"en": 25_000}, strategy="twoscan",
                              oversample=0.01).collect()}
    assert c == d


def test_mixture_defaults_are_mega_key_safe(spark):
    """The DEFAULT entry points must be the mega-key-safe twoscan path
    (a crawl with one mega-domain / one dominant language is the
    EXPECTED input): signature defaults pinned, and a skewed corpus
    (one key holding >50% of rows) through the bare defaults equals the
    explicit window path exactly."""
    import inspect
    from cascading_flink_spark.extensions import temperature_mixture
    for fn in (domain_quota, token_budget_mixture, temperature_mixture):
        assert inspect.signature(fn).parameters["strategy"].default \
            == "twoscan", fn.__name__
    skew = spark.range(3_000).selectExpr(
        "id AS doc_id",
        "CASE WHEN id < 2000 THEN 'mega' ELSE 'd' || (id % 7) END AS source",
        "CASE WHEN id < 2000 THEN 'en' ELSE 'l' || (id % 3) END AS lang",
        "CAST(1 + id % 9 AS LONG) AS n_tokens")
    dq = {r.doc_id for r in domain_quota(skew, "source", 50).collect()}
    dq_w = {r.doc_id for r in
            domain_quota(skew, "source", 50, strategy="window").collect()}
    assert dq == dq_w
    tb = {r.doc_id for r in
          token_budget_mixture(skew, {"en": 500, "l1": 10_000}).collect()}
    tb_w = {r.doc_id for r in
            token_budget_mixture(skew, {"en": 500, "l1": 10_000},
                                 strategy="window").collect()}
    assert tb == tb_w
    tm = {r.doc_id for r in temperature_mixture(skew, 2_000).collect()}
    tm_w = {r.doc_id for r in
            temperature_mixture(skew, 2_000, strategy="window").collect()}
    assert tm == tm_w


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


def test_domain_quota_twoscan_keeps_hot_null_domain(spark):
    """A NULL domain (missing metadata — often the biggest slice) must
    survive the twoscan path identically to the window path, including
    when it is the over-quota hot domain."""
    from cascading_flink_spark.extensions import domain_quota
    rows = ([(i, None) for i in range(500)]          # hot NULL domain
            + [(1000 + i, "a") for i in range(3)])   # small real domain
    df = spark.createDataFrame(rows, "doc_id long, source string")
    win = {r.doc_id for r in
           domain_quota(df, "source", 10, strategy="window").collect()}
    two = {r.doc_id for r in
           domain_quota(df, "source", 10, strategy="twoscan",
                        oversample=2.0).collect()}
    assert two == win
    assert len([d for d in two if d < 1000]) == 10   # null slice capped
    assert {1000, 1001, 1002} <= two                 # small domain intact


def test_group_split_whole_group_one_side(spark, sf_dir):
    from cascading_flink_spark.extensions import group_split
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = group_split(docs, "source", test_frac=0.3)
    sides = (out.groupBy("source").agg(F.countDistinct("split").alias("k"))
             .collect())
    assert all(r["k"] == 1 for r in sides)
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "test"} and "train" in splits


def test_group_split_fraction_and_determinism(spark):
    from cascading_flink_spark.extensions import group_split
    df = spark.createDataFrame([(i, f"g{i}") for i in range(2000)],
                               "doc_id long, g string")
    out = group_split(df, "g", test_frac=0.25)
    frac = out.filter("split = 'test'").count() / 2000
    assert 0.20 < frac < 0.30, frac
    again = group_split(df.repartition(7), "g", test_frac=0.25)
    assert {(r["doc_id"], r["split"]) for r in out.collect()} == \
        {(r["doc_id"], r["split"]) for r in again.collect()}
    # a different seed is an independent split, same expected mass
    other = group_split(df, "g", test_frac=0.25, seed="fold2")
    moved = out.alias("a").join(other.alias("b"), "doc_id") \
        .filter("a.split <> b.split").count()
    assert moved > 0


def test_group_split_null_group_goes_to_train_and_validates(spark):
    from cascading_flink_spark.extensions import group_split
    import pytest as _pytest
    df = spark.createDataFrame([(1, None), (2, "g")],
                               "doc_id long, g string")
    rows = {r["doc_id"]: r["split"]
            for r in group_split(df, "g", test_frac=1.0).collect()}
    assert rows[1] == "train" and rows[2] == "test"
    with _pytest.raises(ValueError):
        group_split(df, "g", test_frac=1.5)


# ----------------------------------------------------- global_rank

def test_global_rank_equals_naive_window(spark, sf_dir):
    """The bucketed two-phase rank must equal the naive global-window
    row_number EXACTLY — including on a low-cardinality score where tie
    runs span bucket boundaries (the composite (score, id) boundary is
    what makes that safe)."""
    from pyspark.sql import Window
    from cascading_flink_spark.extensions import global_rank
    from cascading_flink_spark.extensions.text import token_count
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = docs.select("doc_id",
                    token_count(F.coalesce("text", F.lit(""))).cast("long")
                     .alias("difficulty"))
    got = {(r.doc_id, r.rank) for r in global_rank(d, "difficulty").collect()}
    w = Window.orderBy(F.col("difficulty").asc(), F.col("doc_id").asc())
    exp = {(r.doc_id, r.rank) for r in
           d.withColumn("rank", F.row_number().over(w).cast("long"))
           .collect()}
    assert got == exp and len(got) > 0


@pytest.mark.slow  # r15: heavy, round-close full gate only
def test_global_rank_partition_and_sample_independent(spark):
    """Any bucket geometry / sample size / input partitioning yields the
    SAME ranks — boundaries only route, never decide."""
    from cascading_flink_spark.extensions import global_rank
    rows = [(i, (i * 7) % 13) for i in range(200)]       # many score ties
    d = spark.createDataFrame(rows, "doc_id long, sc long")
    base = {(r.doc_id, r.rank)
            for r in global_rank(d, "sc", buckets=64).collect()}
    for kw in (dict(buckets=1), dict(buckets=5, sample_cap=17),
               dict(buckets=200)):
        got = {(r.doc_id, r.rank)
               for r in global_rank(d.repartition(7), "sc", **kw).collect()}
        assert got == base, kw


def test_global_rank_no_global_window(spark):
    """The plan must contain NO partition-less Window (the 100 TB
    justification): every Window sort key set includes the bucket."""
    from cascading_flink_spark.extensions import global_rank
    d = spark.range(100).selectExpr("id as doc_id", "id % 9 as sc")
    plan = global_rank(d, "sc", buckets=8) \
        ._jdf.queryExecution().optimizedPlan().toString()
    import re
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        # partition clause precedes the sort spec; bucket or tiny
        # bases-frame windows only
        assert "__bk" in spec, f"partition-less window: {spec}"


def test_curriculum_shards_sizes_and_order(spark):
    """Shards are contiguous in rank, sizes differ by at most one, and
    shard indices are monotone in the score."""
    from cascading_flink_spark.extensions import curriculum_shards
    rows = [(i, 1000 - i) for i in range(101)]
    d = spark.createDataFrame(rows, "doc_id long, sc long")
    out = curriculum_shards(d, 4, "sc").collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    sizes = [len(by_shard[s]) for s in sorted(by_shard)]
    assert sorted(by_shard) == [0, 1, 2, 3]
    assert max(sizes) - min(sizes) <= 1 and sum(sizes) == 101
    # rank ranges are contiguous and ordered by shard
    hi = 0
    for s in sorted(by_shard):
        ranks = sorted(r.rank for r in by_shard[s])
        assert ranks[0] == hi + 1 and ranks[-1] == hi + len(ranks)
        hi = ranks[-1]
    with pytest.raises(ValueError):
        curriculum_shards(d, 0, "sc")


def test_global_rank_decimal_and_timestamp_keys(spark):
    """Boundary literals are cast back to the SOURCE column types, so
    score/id types whose F.lit() round-trip differs (decimal, timestamp)
    still analyze and rank exactly (ADVICE r8)."""
    from pyspark.sql import Window
    from cascading_flink_spark.extensions import global_rank
    d = spark.createDataFrame(
        [(f"d{i:03d}", i % 7) for i in range(60)],
        "doc_id string, raw int"
    ).selectExpr(
        "doc_id",
        "CAST(raw AS DECIMAL(10,2)) / 3 AS sc",
        "timestamp_seconds(1700000000 + raw * 3600) AS ts")
    for col in ("sc", "ts"):
        got = {(r.doc_id, r.rank)
               for r in global_rank(d, col, buckets=8,
                                    sample_cap=11).collect()}
        w = Window.orderBy(F.col(col).asc(), F.col("doc_id").asc())
        exp = {(r.doc_id, r.rank) for r in
               d.withColumn("rank",
                            F.row_number().over(w).cast("long")).collect()}
        assert got == exp, col
