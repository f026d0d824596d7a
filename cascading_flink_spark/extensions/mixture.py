"""Corpus-mixture operators: the sampling layer of a training-data pipeline.

After dedup/quality filtering, a corpus is SHAPED: per-domain caps stop a
handful of crawl hosts from dominating, per-language token budgets hit a
target mixture, and a deterministic global shuffle fixes the training
order.  All three are one-window/one-shuffle DataFrame shapes with
deterministic md5 ordering, so any engine reproduces the exact same
sample — no RNG state, rerun-stable, resumable.

The reference has no counterpart (cascading-flink stops at the relational
layer); these follow the same composition discipline as
``extensions/skew.py``'s stratified_sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _md5_order(id_col: str, seed: str) -> "F.Column":
    """Deterministic pseudo-random order key: md5 of seed-prefixed id.
    Uniform, engine-agnostic (Spark md5() == DuckDB md5()), and a new seed
    is a fresh independent shuffle."""
    return F.md5(F.concat(F.lit(seed + "#"), F.col(id_col).cast("string")))


def domain_quota(df: DataFrame, domain_col: str, max_docs: int,
                 id_col: str = "doc_id", seed: str = "quota") -> DataFrame:
    """Keep at most ``max_docs`` rows per domain, chosen by deterministic
    md5 order (an unbiased per-domain sample, not "first files scanned").

    One shuffle on the domain key.  A mega-domain ranks its rows in one
    task's sort; at 100 TB pre-filter such domains with a cheap
    count-aggregate + per-domain md5-threshold pass (two scans, no big
    sort) — the window form here is the exact semantics and the right
    default for the heavy tail of normal domains."""
    w = Window.partitionBy(domain_col).orderBy(_md5_order(id_col, seed),
                                               F.col(id_col))
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= max_docs)
              .drop("__rn"))


def token_budget_mixture(df: DataFrame, budgets: dict[str, int],
                         lang_col: str = "lang",
                         token_col: str = "n_tokens",
                         id_col: str = "doc_id",
                         seed: str = "mixture") -> DataFrame:
    """Sample to a per-language TOKEN budget: walk each language's docs in
    deterministic md5 order and keep them while the running token total
    (including the current doc) stays within that language's budget.

    This is how a target mixture ("200 B tokens English, 50 B code, ...")
    is actually cut from a corpus: quota by tokens, not documents, so long
    docs don't let a language overshoot.  Languages absent from
    ``budgets`` are dropped.  One shuffle on the language key; the
    cumulative window is the standard prefix-sum shape (for a hot language
    at extreme scale, pre-slice by md5 range exactly as in
    :func:`domain_quota`)."""
    mapping = F.create_map(
        *[x for k, v in budgets.items() for x in (F.lit(k), F.lit(int(v)))])
    w = (Window.partitionBy(lang_col)
         .orderBy(_md5_order(id_col, seed), F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, 0))
    return (df.withColumn("__budget", mapping[F.col(lang_col)])
              .filter(F.col("__budget").isNotNull())
              .withColumn("__cum", F.sum(F.col(token_col).cast("long")).over(w))
              .filter(F.col("__cum") <= F.col("__budget"))
              .drop("__budget", "__cum"))


def shuffle_shard(df: DataFrame, num_shards: int,
                  id_col: str = "doc_id", seed: str = "epoch0") -> DataFrame:
    """Deterministic global shuffle + shard assignment for training output:
    every row gets ``(shard, shard_pos)`` — shard by the first md5 nibbles,
    position by rank of the md5 key within the shard.

    Writing ``partitionBy(shard)`` sorted by ``shard_pos`` gives a
    reproducible training order any reader can verify; a new ``seed``
    reshuffles for the next epoch with zero state.  The md5 key is uniform,
    so shards are balanced to binomial noise; each shard's rank sorts only
    1/num_shards of the data."""
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    key = _md5_order(id_col, seed)
    shard = F.pmod(F.conv(F.substring(key, 1, 8), 16, 10).cast("long"),
                   F.lit(num_shards)).cast("int")
    w = Window.partitionBy("__shard").orderBy("__key", F.col(id_col))
    return (df.withColumn("__key", key)
              .withColumn("__shard", shard)
              .withColumn("shard_pos", F.row_number().over(w))
              .withColumnRenamed("__shard", "shard")
              .drop("__key"))
