"""Skew-handling helpers: salted two-phase aggregation and salted joins.

At 100 TB, a handful of hot keys (null join keys, power-law group keys)
serialize a shuffle onto a few reducers.  AQE's skew-join split handles the
join case at runtime; these helpers handle the *aggregation* case and the
explicit-salt join case, both as pure DataFrame compositions:

* :func:`salted_agg` — phase 1 aggregates on (keys + salt) so hot keys
  spread over ``salt_buckets`` reducers; phase 2 combines the partials.
  Supported aggregate shapes decompose algebraically (count -> sum of
  partial counts, avg -> sum/count, etc.), so the result is bit-identical
  to the unsalted plan.
* :func:`salted_broadcast_left` — explicit replicated-broadcast join for a
  skewed fact against a dim too big for one broadcast but fine when split.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: aggregate spec -> (phase1 expr template, phase2 combine template)
_DECOMPOSE = {
    "count": ("count(1)", "sum({p})"),
    "sum": ("sum({arg})", "sum({p})"),
    "min": ("min({arg})", "min({p})"),
    "max": ("max({arg})", "max({p})"),
}


def salted_agg(df: DataFrame, keys: Sequence[str], aggs: dict[str, str],
               salt_buckets: int = 16) -> DataFrame:
    """Two-phase (salted) aggregation, result identical to a plain groupBy.

    ``aggs`` maps output name -> one of ``count()``, ``sum(col)``,
    ``min(col)``, ``max(col)``, ``avg(col)``.  The salt is a deterministic
    hash of the whole row modulo ``salt_buckets`` (content-derived, no RNG —
    rerun-stable).

    Note Catalyst already does map-side partial aggregation; salting
    additionally spreads the *reduce* side of a hot key, which partial agg
    alone cannot (all partials of one key still meet in one reducer).
    """
    keys = list(keys)
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                         F.lit(salt_buckets)))

    phase1, phase2 = [], []
    for name, spec in aggs.items():
        fn = spec.split("(", 1)[0].strip().lower()
        arg = spec.split("(", 1)[1].rstrip(") ")
        if fn == "avg":
            # count(ARG), not count(1): avg() skips NULL values, so the
            # decomposition must too or a null-bearing group averages low
            phase1.append(F.expr(f"sum({arg})").alias(f"__s_{name}"))
            phase1.append(F.expr(f"count({arg})").alias(f"__c_{name}"))
            phase2.append((F.sum(f"__s_{name}") / F.sum(f"__c_{name}")).alias(name))
            continue
        if fn == "count":
            # honor the argument's null-skipping: count(x) skips NULL x,
            # count() / count(*) / count(1) count rows
            carg = arg if arg not in ("", "*", "1") else "1"
            phase1.append(F.expr(f"count({carg})").alias(f"__p_{name}"))
            phase2.append(F.expr(f"sum(__p_{name})").alias(name))
            continue
        if fn not in _DECOMPOSE:
            raise ValueError(f"salted_agg cannot decompose {spec!r}")
        p1, p2 = _DECOMPOSE[fn]
        pname = f"__p_{name}"
        phase1.append(F.expr(p1.format(arg=arg)).alias(pname))
        phase2.append(F.expr(p2.format(p=pname)).alias(name))

    partial = salted.groupBy(*keys, "__salt").agg(*phase1)
    return partial.groupBy(*keys).agg(*phase2)


def salted_broadcast_left(fact: DataFrame, dim: DataFrame, on: str,
                          how: str = "inner", replicas: int = 8) -> DataFrame:
    """Skew join: replicate the dim ``replicas`` times with a replica id,
    salt the fact deterministically, join on (key, salt).  Spreads a hot
    fact key over ``replicas`` tasks; dim must tolerate replication
    (broadcast-sized x replicas)."""
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]),
                         F.lit(replicas)))
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(replicas)])))
    out = salted_fact.join(F.broadcast(replicated_dim), on=[on, "__salt"], how=how)
    return out.drop("__salt")


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict, key_cols: Sequence[str],
                      granularity: int = 10_000) -> DataFrame:
    """Deterministic per-stratum sampling (balanced-corpus curation).

    ``fractions`` maps stratum value -> keep fraction (strata absent from
    the map are dropped).  The keep decision hashes the key columns with
    md5 so any engine — and any rerun — reproduces the exact sample (the
    first 4 hex chars compare against a per-stratum cutoff — pure string
    comparison, no hex-int conversion any engine could disagree on); one
    map-only pass, no shuffle.  Spark's ``sampleBy`` uses seeded RNG per
    partition — not reproducible across engines, hence md5.
    ``granularity`` is retained for API stability (cutoffs quantize to
    1/65536)."""
    key = F.concat_ws("-", *[F.col(c).cast("string") for c in key_cols])
    prefix = F.substring(F.md5(key), 1, 4)  # uniform over 65536 hex buckets
    cond = None
    for value, frac in fractions.items():
        if frac >= 1.0:
            c = F.col(strata_col) == value
        else:
            cutoff = format(int(frac * 65536), "04x")
            c = (F.col(strata_col) == value) & (prefix < cutoff)
        cond = c if cond is None else (cond | c)
    if cond is None:
        raise ValueError("fractions is empty")
    return df.filter(cond)


def sample_k_per_group(df: DataFrame, group_col: str, k: int,
                       key_cols: Sequence[str]) -> DataFrame:
    """Deterministic exact-k sampling per group (balanced eval-set carving).

    Where :func:`stratified_sample` keeps a *fraction* per stratum, this
    keeps exactly ``min(k, group size)`` rows per group, chosen by md5
    order over ``key_cols`` — engine- and rerun-reproducible, no RNG.
    ``key_cols`` should uniquely identify rows and be non-null: md5
    ties (duplicate keys) fall back to ``row_number``'s arbitrary tie
    order, and NULL keys sort NULLS FIRST here but NULLS LAST in most
    SQL engines — neither is reproducible across engines.

    Scale shape: ``row_number`` + ``<= k`` filter compiles to Spark's
    WindowGroupLimit, which prunes to k rows per group map-side *before*
    the shuffle — a mega-group never materializes on one reducer (same
    plan shape as the FirstNBuffer top-N path, plan-asserted in tests).
    """
    from pyspark.sql import Window

    key = F.md5(F.concat_ws("-", *[F.col(c).cast("string")
                                   for c in key_cols]))
    w = Window.partitionBy(group_col).orderBy(key.asc())
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= k)
              .drop("__rn"))
