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


def _md5_frac(id_col: str, seed: str) -> "F.Column":
    """The md5 order key as a uniform fraction in [0, 1): the first 60
    bits of the digest scaled down.  Rows sorted by :func:`_md5_order`
    are sorted by this fraction (same leading bits), so a ``frac <= t``
    filter keeps an exact PREFIX of the md5 order."""
    return (F.conv(F.substring(_md5_order(id_col, seed), 1, 15), 16, 10)
            .cast("double") / float(16 ** 15))


def domain_quota(df: DataFrame, domain_col: str, max_docs: int,
                 id_col: str = "doc_id", seed: str = "quota",
                 strategy: str = "twoscan",
                 oversample: float = 2.0) -> DataFrame:
    """Keep at most ``max_docs`` rows per domain, chosen by deterministic
    md5 order (an unbiased per-domain sample, not "first files scanned").

    ``strategy="twoscan"`` (DEFAULT — a crawl with one mega-domain is the
    *expected* input for a domain quota, so the mega-key-safe path must
    be the one users get without reading docs): identical output to the
    window path.  Scan 1 counts rows per domain (partial agg).  Domains
    within quota keep every row with no sort at all; over-quota domains
    pre-filter to the rows whose md5 fraction falls below ``oversample *
    max_docs / count`` — an exact prefix of the md5 order, ~``oversample
    * max_docs`` rows — and only that bounded set is ranked.  A domain
    whose prefix undershoots ``max_docs`` survivors (Chernoff-rare at
    any real ``max_docs``) is rescued through the full window path, so
    the result is exact, not approximate.

    ``strategy="window"``: the explicit small-data variant — one shuffle
    on the domain key, one per-domain rank; cheaper when no domain is
    huge, but a mega-domain ranks all its rows in one task's sort."""
    order = [_md5_order(id_col, seed), F.col(id_col)]
    if strategy == "window":
        w = Window.partitionBy(domain_col).orderBy(*order)
        return (df.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") <= max_docs)
                  .drop("__rn"))
    if strategy != "twoscan":
        raise ValueError("strategy must be 'window' or 'twoscan'")

    # Key every grouping/join on a NULL-surrogate string: the window path
    # ranks NULL-domain rows as one ordinary group, but every equi-join
    # below would silently drop a NULL key (NULL never equals NULL), so
    # the two strategies would diverge on corpora with missing domains.
    # The \x00 prefix cannot collide with a real domain's cast.
    dk = F.when(F.col(domain_col).isNull(), F.lit("\x00<null-domain>")) \
          .otherwise(F.col(domain_col).cast("string"))
    d0 = df.withColumn("__dk", dk)
    counts = d0.groupBy("__dk").agg(F.count(F.lit(1)).alias("__n"))
    d = d0.join(counts, "__dk")
    cold = d.filter(F.col("__n") <= max_docs).drop("__n", "__dk")
    hot = d.filter(F.col("__n") > max_docs)
    thresh = F.least(F.lit(1.0),
                     F.lit(float(oversample) * max_docs) / F.col("__n"))
    surv = hot.filter(_md5_frac(id_col, seed) <= thresh)
    w = Window.partitionBy("__dk").orderBy(*order)
    ranked = surv.withColumn("__rn", F.row_number().over(w))
    # Exactness guard: every hot domain needs >= max_docs prefix survivors
    # (the prefix property makes its smallest max_docs = the domain's
    # smallest max_docs).  Undershooting domains (astronomically rare)
    # re-rank their FULL row set instead.  Derived as hot-domains MINUS
    # covered-domains so a domain whose prefix caught zero rows (absent
    # from `ranked` entirely) is still rescued.
    covered = (ranked.groupBy("__dk").agg(F.max("__rn").alias("__m"))
               .filter(F.col("__m") >= max_docs).select("__dk"))
    short = (hot.select("__dk").distinct()
             .join(covered, "__dk", "left_anti"))
    picked = (ranked.filter(F.col("__rn") <= max_docs)
              .join(F.broadcast(short), "__dk", "left_anti")
              .drop("__rn", "__n", "__dk"))
    rescue = (hot.join(F.broadcast(short), "__dk", "left_semi")
              .withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= max_docs)
              .drop("__rn", "__n", "__dk"))
    return cold.unionByName(picked).unionByName(rescue).select(*df.columns)


def _admit_token_budget(base: DataFrame, out_cols: list[str],
                        lang_col: str, token_col: str, id_col: str,
                        seed: str, strategy: str,
                        oversample: float) -> DataFrame:
    """Shared token-budget admission: ``base`` carries a non-null
    ``__budget`` column; rows are admitted in md5 order while each
    language's running token total stays within its budget.  Both the
    window path and the mega-key-safe twoscan path live here so
    :func:`token_budget_mixture` (hand budgets) and
    :func:`temperature_mixture` (data-derived budgets) share one
    implementation and one exactness argument."""
    order = [_md5_order(id_col, seed), F.col(id_col)]
    w = (Window.partitionBy(lang_col).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, 0))
    tok = F.col(token_col).cast("long")
    if strategy == "window":
        return (base.withColumn("__cum", F.sum(tok).over(w))
                    .filter(F.col("__cum") <= F.col("__budget"))
                    .select(*out_cols))
    if strategy != "twoscan":
        raise ValueError("strategy must be 'window' or 'twoscan'")

    totals = base.groupBy(lang_col).agg(F.sum(tok).alias("__tot"))
    d = base.join(totals, lang_col)
    cold = d.filter(F.col("__tot") <= F.col("__budget"))
    hot = d.filter(F.col("__tot") > F.col("__budget"))
    thresh = F.least(
        F.lit(1.0),
        F.lit(float(oversample)) * F.col("__budget") / F.col("__tot"))
    surv = hot.filter(_md5_frac(id_col, seed) <= thresh)
    cummed = surv.withColumn("__cum", F.sum(tok).over(w))
    # Exactness guard: the surviving prefix must carry MORE than budget
    # tokens (strictly — trailing zero-token rows of an exactly-full
    # prefix would belong to the admitted set but sit past the cut).
    # Derived as hot-languages MINUS covered-languages so a language
    # whose prefix caught zero rows is still rescued.
    covered = (cummed.groupBy(lang_col)
               .agg(F.max("__cum").alias("__m"),
                    F.max("__budget").alias("__b"))
               .filter(F.col("__m") > F.col("__b")).select(lang_col))
    short = (hot.select(lang_col).distinct()
             .join(covered, lang_col, "left_anti"))
    picked = (cummed.filter(F.col("__cum") <= F.col("__budget"))
              .join(F.broadcast(short), lang_col, "left_anti"))
    rescue = (hot.join(F.broadcast(short), lang_col, "left_semi")
              .withColumn("__cum", F.sum(tok).over(w))
              .filter(F.col("__cum") <= F.col("__budget")))
    return (cold.select(*out_cols)
                .unionByName(picked.select(*out_cols))
                .unionByName(rescue.select(*out_cols)))


def token_budget_mixture(df: DataFrame, budgets: dict[str, int],
                         lang_col: str = "lang",
                         token_col: str = "n_tokens",
                         id_col: str = "doc_id",
                         seed: str = "mixture",
                         strategy: str = "twoscan",
                         oversample: float = 2.0) -> DataFrame:
    """Sample to a per-language TOKEN budget: walk each language's docs in
    deterministic md5 order and keep them while the running token total
    (including the current doc) stays within that language's budget.

    This is how a target mixture ("200 B tokens English, 50 B code, ...")
    is actually cut from a corpus: quota by tokens, not documents, so long
    docs don't let a language overshoot.  Languages absent from
    ``budgets`` are dropped.

    ``strategy="twoscan"`` (DEFAULT — a language holding most of the
    corpus is the expected input of a mixture cut, so the mega-key-safe
    path must be what users get by default): identical output to the
    window path.  Scan 1 totals tokens per language; a language whose
    corpus fits its budget keeps every row with no sort, an over-budget
    language pre-filters to the md5-order PREFIX whose fraction is below
    ``oversample * budget / total_tokens`` (expected token mass
    ``oversample * budget``) and prefix-sums only that bounded set.
    Exactness: the admitted set is a prefix of the md5 order, and any
    prefix carrying strictly more than ``budget`` tokens contains the
    whole admitted set (token counts are non-negative); a language whose
    surviving prefix carries <= budget tokens (Chernoff-rare) is rescued
    through the full window path.

    ``strategy="window"``: the explicit small-data variant — one shuffle
    on the language key, the standard prefix-sum window; a hot language
    sorts in one task."""
    mapping = F.create_map(
        *[x for k, v in budgets.items() for x in (F.lit(k), F.lit(int(v)))])
    base = (df.withColumn("__budget", mapping[F.col(lang_col)])
              .filter(F.col("__budget").isNotNull()))
    return _admit_token_budget(base, list(df.columns), lang_col, token_col,
                               id_col, seed, strategy, oversample)


def upsample_mixture(df: DataFrame, budgets: dict[str, int],
                     lang_col: str = "lang",
                     token_col: str = "n_tokens",
                     id_col: str = "doc_id",
                     seed: str = "upsample",
                     strategy: str = "twoscan",
                     oversample: float = 2.0,
                     repeats_col: str = "n_repeats") -> DataFrame:
    """Per-language token budgets that may EXCEED the corpus: emit
    ``(.., n_repeats)`` where each language's docs repeat ``budget DIV
    corpus_tokens`` full epochs and the md5-ordered remainder prefix
    (the :func:`token_budget_mixture` admission rule applied to
    ``budget MOD corpus_tokens``) gets one extra — how a mixture
    actually UP-samples scarce high-quality domains (mT5/DoReMi-style
    "epochs per domain") instead of only cutting abundant ones.  A
    budget below the corpus degenerates to token_budget_mixture with
    ``n_repeats = 1``; rows with ``n_repeats = 0`` (and languages
    absent from ``budgets`` or holding zero tokens) are dropped.

    Scale shape: one partial-agg totals groupBy + an AQE-skew-
    splittable totals join, the shared twoscan/window admission on the
    remainder (mega-key-safe by default), and one plain left join of
    the data-bounded admitted-id set back (no broadcast hint — the
    curation margin-drop convention)."""
    mapping = F.create_map(
        *[x for k, v in budgets.items()
          for x in (F.lit(k), F.lit(int(v)))])
    tok = F.col(token_col).cast("long")
    base = (df.withColumn("__b0", mapping[F.col(lang_col)])
            .filter(F.col("__b0").isNotNull()))
    totals = (base.groupBy(lang_col)
              .agg(F.sum(tok).alias("__T"))
              .filter(F.col("__T") > 0))
    d = (base.join(totals, lang_col)
         .withColumn("__r", F.expr("__b0 DIV __T").cast("long"))
         .withColumn("__budget", F.expr("__b0 % __T").cast("long"))
         .localCheckpoint(eager=False))
    adm = (_admit_token_budget(d, [id_col], lang_col, token_col, id_col,
                               seed, strategy, oversample)
           .withColumn("__x", F.lit(1).cast("long")))
    return (d.join(adm, id_col, "left")
            .withColumn(repeats_col,
                        (F.col("__r")
                         + F.coalesce(F.col("__x"), F.lit(0)))
                        .cast("long"))
            .filter(F.col(repeats_col) >= 1)
            .select(*df.columns, repeats_col))


def temperature_budgets(df: DataFrame, total_budget: int,
                        lang_col: str = "lang",
                        token_col: str = "n_tokens",
                        alpha: float = 0.5) -> DataFrame:
    """Temperature-weighted per-language token budgets: the allocation
    table behind multilingual mixture sampling (XLM-R / mT5 style), where
    language ``l`` holding ``c_l`` corpus tokens gets
    ``budget_l = floor(total_budget * c_l^alpha / sum_k c_k^alpha)`` —
    ``alpha < 1`` flattens the head languages and up-samples the tail.

    Returns one row per language: ``(lang, corpus_tokens, weight,
    budget)``.

    ``alpha=0.5`` (the default) is computed in EXACT integer arithmetic:
    ``weight = isqrt(corpus_tokens)`` via a floor(sqrt)+/-1 correction
    (both engines' IEEE sqrt is correctly rounded, and the correction
    makes any half-ulp disagreement irrelevant), the weight total is an
    exact long sum, and the floor division uses the overflow-free
    identity ``(B div S)*s + ((B mod S)*s) div S`` — exact whenever
    ``(B mod S) * max(s) < 2^63``, i.e. for any corpus under ~4e18
    tokens.  Any engine reproduces it bit-for-bit, so the allocation is
    a full value-hash oracle row, unlike double ``pow`` whose last ulp
    is implementation-defined.  Other ``alpha`` values use double
    ``pow`` (pytest-only evidence; documented flake risk at exact
    floor boundaries).

    Scale shape (100 TB): one partial-agg groupBy on the language key
    (combine map-side), then arithmetic over the tiny per-language
    table.  No windows, no driver pulls.
    """
    if total_budget < 0:
        raise ValueError("total_budget must be >= 0")
    tok = F.coalesce(F.col(token_col).cast("long"), F.lit(0))
    # unlabeled (NULL-language) rows are excluded from the allocation
    # entirely — counting their mass in the weight total while the
    # admission equi-join silently drops them would skew every budget
    # (the same NULL-key trap domain_quota's twoscan path documents)
    counts = (df.filter(F.col(lang_col).isNotNull())
                .groupBy(lang_col).agg(F.sum(tok).alias("corpus_tokens")))
    if alpha == 0.5:
        c = F.col("corpus_tokens")
        r = F.floor(F.sqrt(c.cast("double"))).cast("long")
        s = (F.when((r + 1) * (r + 1) <= c, r + 1)
              .when(r * r <= c, r)
              .otherwise(r - 1))
        weighted = counts.withColumn("weight", s)
        total = weighted.agg(F.sum("weight").alias("__S"))
        return (weighted.crossJoin(F.broadcast(total))
                .withColumn(
                    "budget",
                    F.when(F.col("__S") <= 0, F.lit(0).cast("long"))
                     .otherwise(
                        F.expr(f"({total_budget} DIV __S) * weight"
                               f" + (({total_budget} % __S) * weight)"
                               " DIV __S").cast("long")))
                .drop("__S")
                .select(lang_col, "corpus_tokens", "weight", "budget"))
    weighted = counts.withColumn(
        "weight", F.pow(F.col("corpus_tokens").cast("double"),
                        F.lit(float(alpha))))
    total = weighted.agg(F.sum("weight").alias("__S"))
    return (weighted.crossJoin(F.broadcast(total))
            .withColumn("budget",
                        F.floor(F.lit(float(total_budget))
                                * F.col("weight") / F.col("__S"))
                         .cast("long"))
            .drop("__S")
            .select(lang_col, "corpus_tokens", "weight", "budget"))


def temperature_mixture(df: DataFrame, total_budget: int,
                        lang_col: str = "lang",
                        token_col: str = "n_tokens",
                        id_col: str = "doc_id",
                        seed: str = "temper",
                        alpha: float = 0.5,
                        strategy: str = "twoscan",
                        oversample: float = 2.0) -> DataFrame:
    """Cut a temperature-weighted multilingual mixture: derive each
    language's token budget with :func:`temperature_budgets`, then admit
    that language's docs in deterministic md5 order while the running
    token total stays within the budget — :func:`token_budget_mixture`'s
    admission rule with data-derived budgets instead of a hand dict
    (the two share :func:`_admit_token_budget`, so the mega-key-safe
    ``twoscan`` default and the explicit ``window`` variant behave
    identically here).

    Returns the admitted rows (original columns); NULL-language rows are
    dropped (see :func:`temperature_budgets`).  One groupBy for the
    allocation (broadcast back — the per-language table is tiny), then
    the shared admission."""
    budgets = temperature_budgets(df, total_budget, lang_col=lang_col,
                                  token_col=token_col, alpha=alpha) \
        .select(lang_col, F.col("budget").alias("__budget"))
    base = df.join(F.broadcast(budgets), lang_col)
    return _admit_token_budget(base, list(df.columns), lang_col, token_col,
                               id_col, seed, strategy, oversample)


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


def group_split(df: DataFrame, group_col: str, test_frac: float = 0.1,
                seed: str = "split", out_col: str = "split",
                hex_digits: int = 6) -> DataFrame:
    """Leakage-safe train/test split: the split key is the GROUP (domain,
    dedup cluster id, URL host), never the document — every row of a
    group lands on the same side, so near-duplicates and same-source
    documents cannot straddle the eval boundary (the dedup-test-leakage
    failure mode; pair with dedup_clusters to split by cluster).

    A group is 'test' iff the first ``hex_digits`` hex chars of
    ``md5(seed#group)`` fall below ``floor(test_frac * 16^hex_digits)``
    — the :func:`stratified_sample` hex-prefix rule: deterministic,
    engine-agnostic (plain string compare of md5 hex), rerun-stable, and
    a new seed is a fresh independent split.  Resolution is
    1/16^hex_digits (~6e-8 at the default).  NULL groups go to 'train'
    (a NULL key hashes nowhere; sending unknown provenance to test would
    contaminate evaluation silently).  Map-only — zero shuffles."""
    if not 0.0 <= test_frac <= 1.0:
        raise ValueError("test_frac must be in [0, 1]")
    cut_int = int(test_frac * 16 ** hex_digits)
    # at test_frac=1.0 the cut overflows to hex_digits+1 chars and the
    # lexicographic compare would send EVERYTHING to train; any hex
    # prefix sorts below 'g', so 'g' is the all-test sentinel
    cut = ("g" if cut_int >= 16 ** hex_digits
           else format(cut_int, f"0{hex_digits}x"))
    h = F.substring(
        F.md5(F.concat(F.lit(seed + "#"), F.col(group_col).cast("string"))),
        1, hex_digits)
    return df.withColumn(
        out_col,
        F.when(h < cut, F.lit("test")).otherwise(F.lit("train")))


def global_rank(df: DataFrame, score_col: str, id_col: str = "doc_id",
                rank_col: str = "rank", buckets: int = 64,
                sample_cap: int = 4096) -> DataFrame:
    """EXACT dense global row_number by ``(score_col, id_col)`` ascending —
    without the single-partition global Window that
    ``row_number() OVER (ORDER BY ...)`` plans naively (the thing the
    WindowExec "No Partition Defined" warning is about, and a guaranteed
    OOM at 100 TB).

    The distributed-sort ranking shape, all declarative:

    1. a deterministic md5-hash SAMPLE (``sample_cap`` rows, bounded
       driver pull — the same boundedness contract as the IVF trainers)
       yields ``buckets - 1`` composite ``(score, id)`` boundary pairs;
    2. every row buckets by counting boundaries ``<=`` its own
       ``(score, id)`` struct (lexicographic struct comparison in one
       codegen ``aggregate`` fold — ties split EXACTLY because the
       boundary includes the tiebreak column, so low-cardinality scores
       cannot hot-spot a bucket);
    3. within-bucket ``row_number`` windows run over ~1/buckets of the
       data each; bucket base offsets are a ``buckets``-row aggregate
       cumsum, broadcast back.

    ``base + within`` equals the global row_number for ANY boundary
    choice (bucketing respects the total order), so the result is
    partition- and sample-independent — the oracle is plainly
    ``row_number() OVER (ORDER BY score, id)``.  Scores must be
    non-null.

    Round 15 (guide §2.5 / CLAUDE.md pin convention): profile_jobs
    showed curriculum executing TWO serial single-task passes of
    scan + score + the interpreted ``buckets``-literal fold — the
    bucketed frame is consumed by both the window branch and the
    bucket-count branch, and the fold additionally leaked into the
    window branch's scan FILTER via the inner join's inferred
    ``isnotnull(__bk)`` (a third evaluation per row).  Fixes:
    ``_fan_out`` first (the fold is the CPU-heavy per-row stage and
    inherits the scan's split count; no-op on multi-split inputs, so
    nothing is paid at 100 TB), PIN the bucketed frame before its two
    consumers (lazy localCheckpoint — the repo-wide rule for a frame
    carrying an expensive computed column that is referenced twice;
    exchange-subtree reuse cannot help here because column pruning
    legitimately narrows the count branch), and a LEFT join for the
    base offsets (an inner join infers the isnotnull and pushes the
    fold into the scan filter; every window row's bucket has a count
    row, so left+coalesce is identical)."""
    from .dedup import _fan_out
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    s, i = F.col(score_col), F.col(id_col)
    fdf = _fan_out(df)
    sample = (fdf.select(s.alias("__s"), i.alias("__i"),
                        F.md5(i.cast("string")).alias("__hk"))
                .orderBy("__hk").limit(sample_cap)
                .select("__s", "__i").collect())
    pairs = sorted((r["__s"], r["__i"]) for r in sample)
    bnds = []
    if len(pairs) > 1 and buckets > 1:
        step = len(pairs) / buckets
        bnds = sorted({pairs[min(int(j * step), len(pairs) - 1)]
                       for j in range(1, buckets)})
    cur = F.struct(s.alias("s"), i.alias("i"))
    if bnds:
        # cast each boundary literal back to the SOURCE column type:
        # F.lit() of a collected decimal/timestamp/date round-trips to a
        # different literal type and the struct <= comparison would fail
        # at analysis time
        s_t = df.schema[score_col].dataType
        i_t = df.schema[id_col].dataType
        b_lit = F.array(*[F.struct(F.lit(a).cast(s_t).alias("s"),
                                   F.lit(b).cast(i_t).alias("i"))
                          for a, b in bnds])
        bucket = F.aggregate(
            b_lit, F.lit(0),
            lambda acc, x: acc + F.when(x <= cur, 1).otherwise(0))
    else:
        bucket = F.lit(0)
    d = (fdf.withColumn("__bk", bucket)
         .localCheckpoint(eager=False))
    w_in = Window.partitionBy("__bk").orderBy(s.asc(), i.asc())
    w_b = (Window.orderBy("__bk")
           .rowsBetween(Window.unboundedPreceding, -1))
    bases = (d.groupBy("__bk").agg(F.count(F.lit(1)).alias("__c"))
              .withColumn("__base", F.coalesce(F.sum("__c").over(w_b),
                                               F.lit(0)))
              .select("__bk", "__base"))
    # LEFT join (every window row's bucket has a count row, so it never
    # misses): an inner join would infer isnotnull(__bk) and re-evaluate
    # the boundary fold inside a pushed-down filter
    return (d.withColumn("__within", F.row_number().over(w_in))
             .join(F.broadcast(bases), ["__bk"], "left")
             .withColumn(rank_col,
                         (F.coalesce(F.col("__base"), F.lit(0))
                          + F.col("__within")).cast("long"))
             .drop("__bk", "__within", "__base"))


def grouped_rank(df: DataFrame, group_col: str, score_col: str,
                 id_col: str = "doc_id", rank_col: str = "rank",
                 buckets: int = 64, sample_cap: int = 4096) -> DataFrame:
    """EXACT per-group dense row_number by ``(score_col, id_col)``
    ascending — without ``Window.partitionBy(group_col)``, whose plan
    sorts EVERY row of a group through one task (on the expected input —
    per-language/per-domain calibration of a web corpus — the top
    language is a mega-key, the same failure
    :func:`domain_quota`/:func:`group_quantiles` convert away from).

    :func:`global_rank`'s composite range-bucket machinery with a group
    prefix:

    1. one deterministic md5 sample (``sample_cap`` rows, bounded driver
       pull) yields up to ``buckets - 1`` composite
       ``(group, score, id)`` boundary triples — hot groups get
       boundaries in proportion to their row share, which is exactly the
       split they need;
    2. every row buckets by counting boundaries ``<=`` its own triple
       (one codegen ``aggregate`` fold; the triple includes the id, so
       ties split exactly);
    3. within-(group, bucket) ``row_number`` windows — a mega-key group
       spans MANY buckets, so no single task sorts it;
    4. per-(group, bucket) base offsets are a partial-agg count + a
       per-group cumsum over that tiny aggregated frame.  Groups sort
       contiguously in the (group, score, id) total order and buckets
       are intervals of it, so at most ``buckets - 1`` cells have a
       NON-ZERO base (each boundary splits at most one group) — the
       non-zero set is parameter-bounded and broadcast back.

    ``base + within`` equals the per-group row_number for ANY boundary
    set (bucketing respects the total order), so the result is
    partition- and sample-independent; the oracle is plainly
    ``row_number() OVER (PARTITION BY group ORDER BY score, id)``.
    Group, score and id must be non-null."""
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    g, s, i = F.col(group_col), F.col(score_col), F.col(id_col)
    from .dedup import _fan_out
    fdf = _fan_out(df)
    sample = (fdf.select(g.alias("__g"), s.alias("__s"), i.alias("__i"),
                        F.md5(i.cast("string")).alias("__hk"))
                .orderBy("__hk").limit(sample_cap)
                .select("__g", "__s", "__i").collect())
    triples = sorted((r["__g"], r["__s"], r["__i"]) for r in sample)
    bnds = []
    if len(triples) > 1 and buckets > 1:
        step = len(triples) / buckets
        bnds = sorted({triples[min(int(j * step), len(triples) - 1)]
                       for j in range(1, buckets)})
    cur = F.struct(g.alias("g"), s.alias("s"), i.alias("i"))
    if bnds:
        # cast boundary literals back to the SOURCE column types (same
        # round-trip hazard global_rank documents)
        g_t = df.schema[group_col].dataType
        s_t = df.schema[score_col].dataType
        i_t = df.schema[id_col].dataType
        b_lit = F.array(*[F.struct(F.lit(a).cast(g_t).alias("g"),
                                   F.lit(b).cast(s_t).alias("s"),
                                   F.lit(c).cast(i_t).alias("i"))
                          for a, b, c in bnds])
        bucket = F.aggregate(
            b_lit, F.lit(0),
            lambda acc, x: acc + F.when(x <= cur, 1).otherwise(0))
    else:
        bucket = F.lit(0)
    # Round 15: same fan_out + pin shape as :func:`global_rank` (the
    # boundary fold is the CPU-heavy per-row stage, and the frame is
    # consumed by both the window branch and the count branch; see the
    # global_rank docstring for the full adjudication)
    d = (fdf.withColumn("__bk", bucket)
         .localCheckpoint(eager=False))
    w_b = (Window.partitionBy(group_col).orderBy("__bk")
           .rowsBetween(Window.unboundedPreceding, -1))
    bases = (d.groupBy(group_col, "__bk")
              .agg(F.count(F.lit(1)).alias("__c"))
              .withColumn("__base", F.coalesce(F.sum("__c").over(w_b),
                                               F.lit(0)))
              .filter(F.col("__base") > 0)   # <= buckets - 1 rows
              .select(group_col, "__bk", "__base"))
    w_in = (Window.partitionBy(group_col, "__bk")
            .orderBy(s.asc(), i.asc()))
    return (d.withColumn("__within", F.row_number().over(w_in))
             .join(F.broadcast(bases), [group_col, "__bk"], "left")
             .withColumn(rank_col,
                         (F.coalesce(F.col("__base"), F.lit(0))
                          + F.col("__within")).cast("long"))
             .drop("__bk", "__within", "__base"))


def weighted_sample(df: DataFrame, weight_col: str, k: int,
                    id_col: str = "doc_id",
                    group_col: str | None = None,
                    seed: str = "wsample") -> DataFrame:
    """Exact-k weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): draw ``k`` rows with inclusion probability
    proportional to their positive integer weight — the importance
    downsampler every mixture pipeline needs when quotas are softer
    than :func:`domain_quota`'s hard cuts (and the general-purpose
    sibling of ``dsir_sample``'s Gumbel draw).

    The ES key ``ln(u_i) / w_i`` (top-k by it = a without-replacement
    weighted draw) is spelled integer-exact: ``u_i`` is the repo's
    seeded md5 uniform (``(hex8(md5(seed#id)) + 0.5) / 2^32``, never 0
    or 1), ``ln(u_i)`` is rounded ONCE to 1e-6 (the DSIR ln recipe),
    and the key is ``lnu_x1e6 * 1e6 DIV w`` — one truncating division,
    so ranks replay bit-for-bit cross-engine; ties break by id.
    Weights must be POSITIVE integers (in-plan raise — a zero weight
    would divide by zero, a negative one would invert the ranking).

    With ``group_col`` the draw is stratified — an independent
    without-replacement draw of ``k`` rows PER GROUP (short groups
    return all their rows), one bounded per-group window that Spark
    plans as WindowGroupLimit (map-side prune, the
    ``sample_k_per_group`` shape).  Globally it plans as
    TakeOrderedAndProject over a map-only frame — no global sort, no
    shuffle beyond the final top-k reduction."""
    if k < 1:
        raise ValueError("k must be >= 1")
    h = F.md5(F.concat(F.lit(seed + "#"), F.col(id_col).cast("string")))
    u = ((F.conv(F.substring(h, 1, 8), 16, 10).cast("double") + 0.5)
         / F.lit(float(1 << 32)))
    d = (df.withColumn("__lnu",
                       F.round(F.log(u) * 1e6, 0).cast("long"))
         .withColumn("__w", F.col(weight_col).cast("long")))
    key = F.expr(
        "CASE WHEN __w > 0 THEN __lnu * 1000000 DIV __w "
        "ELSE CAST(raise_error('weighted_sample: weights must be "
        "positive integers') AS BIGINT) END")
    d = d.withColumn("__k", key)
    if group_col is not None:
        w = (Window.partitionBy(group_col)
             .orderBy(F.col("__k").desc(), F.col(id_col).asc()))
        return (d.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= int(k))
                .drop("__lnu", "__w", "__k", "__rn"))
    return (d.orderBy(F.col("__k").desc(), F.col(id_col).asc())
            .limit(int(k))
            .drop("__lnu", "__w", "__k"))


def quantile_normalize(df: DataFrame, score_col: str,
                       id_col: str = "doc_id",
                       group_col: str | None = None,
                       out_col: str = "q_x1e6", buckets: int = 64,
                       sample_cap: int = 4096,
                       strategy: str = "bucketed") -> DataFrame:
    """Rank-based score calibration: replace each row's raw score with
    its quantile position ``(rank - 1) * 1e6 DIV (n - 1)`` within its
    group (or globally) — the standard way to make quality signals from
    DIFFERENT classifiers/heuristics/domains comparable before blending
    or thresholding them (a fastText logit and a Gopher rule count live
    on incompatible scales; their quantiles don't).

    ``rank`` is ``row_number`` by ``(score_col, id_col)`` ascending —
    the id breaks score ties deterministically — so the output is exact
    integer arithmetic, 0 for the group minimum, 1e6 for the maximum,
    and single-row groups land at 0 (``DIV greatest(n-1, 1)``).

    Scale shape: the expected input is per-language/per-domain
    calibration of a web corpus, where the top group is a double-digit
    share of everything — a mega-key — so the grouped DEFAULT is
    :func:`grouped_rank`'s group-prefixed range-bucket ranking (no task
    ever sorts a whole group; the :func:`domain_quota` twoscan
    precedent) plus one partial-agg group-count join that AQE can
    skew-split.  ``strategy="window"`` opts into the single-shuffle
    ``Window.partitionBy(group)`` plan — cheaper ONLY when every group
    is known to fit one task.  Globally (``group_col=None``) it rides
    :func:`global_rank`'s distributed-sort ranking (never a
    partition-less window) plus one broadcast 1-row total, the
    :func:`curriculum_shards` pattern."""
    if strategy not in ("bucketed", "window"):
        raise ValueError("strategy must be 'bucketed' or 'window'")
    q_expr = F.expr(
        "(__qr - 1) * 1000000 DIV greatest(__qn - 1, 1)").cast("long")
    if group_col is not None and strategy == "bucketed":
        ranked = grouped_rank(df, group_col, score_col, id_col=id_col,
                              rank_col="__qr", buckets=buckets,
                              sample_cap=sample_cap)
        totals = (df.groupBy(group_col)
                  .agg(F.count(F.lit(1)).cast("long").alias("__qn")))
        return (ranked.join(totals, group_col)
                .withColumn(out_col, q_expr)
                .drop("__qr", "__qn"))
    if group_col is not None:
        w = (Window.partitionBy(group_col)
             .orderBy(F.col(score_col).asc(), F.col(id_col).asc()))
        wn = Window.partitionBy(group_col)
        return (df.withColumn("__qr", F.row_number().over(w).cast("long"))
                .withColumn("__qn",
                            F.count(F.lit(1)).over(wn).cast("long"))
                .withColumn(out_col, q_expr)
                .drop("__qr", "__qn"))
    ranked = global_rank(df, score_col, id_col=id_col, rank_col="__qr",
                         buckets=buckets, sample_cap=sample_cap)
    total = F.broadcast(df.agg(F.count(F.lit(1)).cast("long")
                               .alias("__qn")))
    return (ranked.crossJoin(total)
            .withColumn(out_col, q_expr)
            .drop("__qr", "__qn"))


def curriculum_shards(df: DataFrame, n_shards: int, score_col: str,
                      id_col: str = "doc_id",
                      shard_col: str = "shard") -> DataFrame:
    """Curriculum-ordering shards: rank the corpus by a difficulty score
    (easy -> hard), then cut the ranking into ``n_shards`` contiguous
    shards — shard 0 is the easiest slice, the standard length/difficulty
    curriculum for staged pre-training.  ``shard = floor((rank - 1) *
    n_shards / total)`` (sizes differ by at most 1); the same closed-form
    arithmetic is the oracle, so the whole op — distributed ranking
    included — hash-checks cross-engine.  Built on :func:`global_rank`;
    the total is a broadcast 1-row aggregate, keeping one declarative
    plan."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    ranked = global_rank(df, score_col, id_col=id_col)
    total = df.agg(F.count(F.lit(1)).cast("long").alias("__total"))
    return (ranked.crossJoin(F.broadcast(total))
            .withColumn(shard_col,
                        F.floor((F.col("rank") - 1) * n_shards
                                / F.col("__total")).cast("int"))
            .drop("__total"))
