"""DSIR — Data Selection via Importance Resampling (Xie et al., 2023,
arXiv:2302.03169): pick raw-corpus documents whose hashed-n-gram
distribution looks like a TARGET corpus, the standard public recipe for
"give me web data that reads like Wikipedia/books" pretraining mixtures.

The published estimator is a bag-of-hashed-n-grams multinomial over
``m`` buckets fit on each side; a document's importance weight is

    log w(x) = sum_f c_f(x) * (log p_target(f) - log p_raw(f))

with add-``alpha`` smoothing.  Selection takes the top-``n`` weights
(the paper resamples with Gumbel noise; the deterministic twin here
ranks by the weight itself with a doc-id tie-break, which is the
zero-temperature limit and reproducible cross-engine).

Determinism recipe (the repo's integer-scale-first convention): each
bucket's log-ratio is rounded ONCE to 1e-6 (``lr_x1e6`` as BIGINT), a
document's weight is then an exact INTEGER sum ``sum(c_f * lr_x1e6) +
n(x) * c0_x1e6`` — order-free in any engine — where the constant
``c0_x1e6`` collects the normalizer difference ``ln(R + alpha*m) -
ln(T + alpha*m)``.  The only doubles are one ``ln`` per bucket of
exact-integer inputs, the same class bigram_lm/bm25 gate under.

Scale design (100 TB raw / small target): two shingling scans produce
``<= m``-row bucket count tables (partial-agg, map-side combined); the
per-document scorer joins a BROADCAST m-row weight table onto the raw
corpus's exploded features and partial-aggregates per doc — no corpus
shuffle wider than (doc_id, bucket) rows, no windows, no driver pulls.
Top-``n`` selection is a TakeOrderedAndProject, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _feature_stream(df: DataFrame, text_col: str, id_col: str,
                    buckets: int, ngrams: int, seed: str) -> DataFrame:
    """One row per hashed n-gram occurrence: ``(id, b)``.

    Features are LOWERCASED whitespace unigrams (+ bigrams for
    ``ngrams=2``, the paper's default), bucketed by the library's
    cross-engine md5 spelling (first 8 hex digits mod ``buckets`` —
    the hash_embed convention, replayable in ANSI SQL).

    The md5-per-gram explode is the CPU-heavy stage, so the input is
    fanned out first (``_fan_out`` — a no-op on well-split reads, a
    rebalance when a single local file would serialize the stage)."""
    from .dedup import _fan_out
    from .text import _tokens
    df = _fan_out(df)
    toks = _tokens(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    grams = toks
    if ngrams >= 2:
        n = F.size(toks)
        bi = (F.when(n >= 2, F.transform(
                  F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
                  lambda i: F.concat_ws(" ", F.element_at(toks, i),
                                        F.element_at(toks, i + 1))))
              .otherwise(F.array().cast("array<string>")))
        grams = F.concat(toks, bi)
    h = F.md5(F.concat(F.lit(seed + "#"), F.col("__g")))
    b = F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"),
               F.lit(buckets))
    return (df.select(F.col(id_col).alias("id"),
                      F.explode(grams).alias("__g"))
              .select("id", b.alias("b")))


def dsir_bucket_weights(raw: DataFrame, target: DataFrame,
                        buckets: int = 4096, ngrams: int = 2,
                        alpha: int = 1, seed: str = "dsir",
                        text_col: str = "text",
                        id_col: str = "doc_id",
                        target_text_col: str | None = None,
                        target_id_col: str | None = None) -> DataFrame:
    """The ``<= buckets``-row weight table ``(b, t_f, r_f, lr_x1e6)``:
    per-bucket target/raw occurrence counts and the integer-scaled
    smoothed log-ratio ``floor((ln(t_f + alpha) - ln(r_f + alpha)) *
    1e6 + 0.5)``.  Broadcast-sized by construction; the reusable half of
    :func:`dsir_weights` (score several raw shards, or a STREAM, against
    one fitted table)."""
    _validate(buckets, ngrams, alpha)
    rc = (_feature_stream(raw, text_col, id_col, buckets, ngrams, seed)
          .groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("r_f")))
    tc = (_feature_stream(target, target_text_col or text_col,
                          target_id_col or id_col, buckets, ngrams, seed)
          .groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("t_f")))
    return _weights_from_counts(rc, tc, alpha)


def _validate(buckets: int, ngrams: int, alpha: int) -> None:
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    if ngrams not in (1, 2):
        raise ValueError("ngrams must be 1 or 2")
    if alpha < 1:
        raise ValueError("alpha must be >= 1 (integer smoothing)")


def _weights_from_counts(rc: DataFrame, tc: DataFrame,
                         alpha: int) -> DataFrame:
    a = F.lit(int(alpha)).cast("long")
    return (rc.join(tc, "b", "full_outer")
            .select(F.col("b").cast("long").alias("b"),
                    F.coalesce("t_f", F.lit(0)).cast("long").alias("t_f"),
                    F.coalesce("r_f", F.lit(0)).cast("long").alias("r_f"))
            .withColumn("lr_x1e6",
                        F.floor((F.log(F.col("t_f") + a)
                                 - F.log(F.col("r_f") + a)) * 1e6 + 0.5)
                         .cast("long")))


def _score_docs(docf: DataFrame, ids: DataFrame, weight_table: DataFrame,
                alpha: int, buckets: int, id_col: str) -> DataFrame:
    """Shared per-document scorer: ``(id_col, n_feats, logw_x1e6)`` for
    every row of ``ids`` given pinned per-doc bucket partials ``docf``
    (``(id, b, __c)``) and a fitted weight table — the single spelling
    :func:`dsir_weights` and :func:`dsir_mixture_select` both use, so
    the coalesce(lr, 0)-still-counts-toward-n_feats subtlety (the
    round-9 cross-shard regression fix) lives in exactly one place."""
    a = F.lit(int(alpha)).cast("long")
    m = F.lit(int(buckets)).cast("long")
    # the normalizer constant: one 1-row aggregate over the weight
    # table, broadcast back — keeps the whole operator one declarative
    # plan (no collect)
    c0 = (weight_table.agg(
              F.floor((F.log(F.sum("r_f") + a * m)
                       - F.log(F.sum("t_f") + a * m)) * 1e6 + 0.5)
               .cast("long").alias("__c0")))
    # LEFT join + coalesce(lr, 0): a pre-fitted table may lack buckets
    # this shard observes — those grams carry log-ratio 0 (exactly what
    # the formula yields at t_f = r_f = 0) but MUST still count toward
    # n_feats and the n*c0 normalizer term, or batch scoring would
    # diverge from dsir_score_expr / stream_dsir_gate on unseen buckets
    # (cross-shard scoring regression, pinned in pytest)
    doc = (docf
           .join(F.broadcast(weight_table.select("b", "lr_x1e6")), "b",
                 "left")
           .groupBy("id")
           .agg(F.sum(F.col("__c")
                      * F.coalesce("lr_x1e6", F.lit(0))).alias("__s"),
                F.sum("__c").alias("__n")))
    return (ids
            .join(doc.withColumnRenamed("id", id_col), id_col, "left")
            .crossJoin(F.broadcast(c0))
            .select(F.col(id_col),
                    F.coalesce("__n", F.lit(0)).cast("long")
                     .alias("n_feats"),
                    (F.coalesce("__s", F.lit(0))
                     + F.coalesce("__n", F.lit(0)) * F.col("__c0"))
                     .cast("long").alias("logw_x1e6")))


def dsir_weights(raw: DataFrame, target: DataFrame,
                 buckets: int = 4096, ngrams: int = 2, alpha: int = 1,
                 seed: str = "dsir", text_col: str = "text",
                 id_col: str = "doc_id",
                 target_text_col: str | None = None,
                 target_id_col: str | None = None,
                 weight_table: DataFrame | None = None) -> DataFrame:
    """Per-document DSIR importance weights over the raw corpus:
    ``(id_col, n_feats, logw_x1e6)`` for EVERY raw row (featureless
    documents score 0 with ``n_feats = 0``).

    ``logw_x1e6`` is the exact integer ``sum(c_f * lr_x1e6) + n_feats *
    c0_x1e6`` — see the module docstring for why that is the
    cross-engine-safe spelling of the paper's log-likelihood ratio.
    Pass a pre-fitted ``weight_table`` (:func:`dsir_bucket_weights`) to
    skip refitting when scoring many shards.

    The raw corpus is shingled ONCE: the per-doc bucket partials feed
    BOTH the raw count table and the scorer (pinned with a lazy
    localCheckpoint, the bigram_lm one-pass lesson — deriving each from
    the stream re-runs the md5 explode per branch).  The pin is
    executor-local; a real cluster run that needs fault tolerance swaps
    it for a durable checkpoint tap, the flagship's documented trade.

    Round-14 adjudication — do NOT re-try blind: three join-free
    scoring spellings (literal-weight-array map-only fold; explode +
    literal element_at + per-doc agg over raw; the same lookup-agg over
    the pinned docf partials) were each built, oracle-verified
    identical, and A/B-measured at sf0.1 (serialized alternating
    processes AND an in-process interleaved best-of-7).  All three
    measured SLOWER than this broadcast-join spelling (fold 1.5-1.9x;
    explode-over-raw 1.5-1.6x — the fit loses the docf reuse and
    re-shingles; docf-lookup hybrid flat-to-1.1x) — the ≤buckets-row
    broadcast join is cheap, codegen'd, and fit+scorer share one
    shingle pass here.  Details in OPTIMIZATION_r14.md."""
    _validate(buckets, ngrams, alpha)
    docf = (_feature_stream(raw, text_col, id_col, buckets, ngrams, seed)
            .groupBy("id", "b")
            .agg(F.count(F.lit(1)).cast("long").alias("__c"))
            .localCheckpoint(eager=False))
    if weight_table is None:
        rc = docf.groupBy("b").agg(F.sum("__c").cast("long").alias("r_f"))
        tc = (_feature_stream(target, target_text_col or text_col,
                              target_id_col or id_col, buckets, ngrams,
                              seed)
              .groupBy("b")
              .agg(F.count(F.lit(1)).cast("long").alias("t_f")))
        weight_table = _weights_from_counts(rc, tc, alpha)
    return _score_docs(docf, raw.select(F.col(id_col)), weight_table,
                       alpha, buckets, id_col)


def dsir_select(raw: DataFrame, target: DataFrame, n: int,
                buckets: int = 4096, ngrams: int = 2, alpha: int = 1,
                seed: str = "dsir", text_col: str = "text",
                id_col: str = "doc_id",
                target_text_col: str | None = None,
                target_id_col: str | None = None) -> DataFrame:
    """The ``n`` raw documents most target-like under DSIR: top-``n``
    ``logw_x1e6`` with a doc-id tie-break (deterministic zero-temperature
    selection; the paper's Gumbel resampling adds noise the gate cannot
    replay).  Plans as TakeOrderedAndProject — k rows per partition then
    k at the driver, never a global sort."""
    if n < 1:
        raise ValueError("n must be >= 1")
    w = dsir_weights(raw, target, buckets=buckets, ngrams=ngrams,
                     alpha=alpha, seed=seed, text_col=text_col,
                     id_col=id_col, target_text_col=target_text_col,
                     target_id_col=target_id_col)
    return (w.orderBy(F.col("logw_x1e6").desc(), F.col(id_col).asc())
             .limit(int(n)))


def dsir_mixture_select(raw: DataFrame, targets: dict, quotas: dict,
                        buckets: int = 4096, ngrams: int = 2,
                        alpha: int = 1, seed: str = "dsir",
                        text_col: str = "text", id_col: str = "doc_id",
                        target_text_col: str | None = None,
                        target_id_col: str | None = None) -> DataFrame:
    """DSIR with a MIXTURE of targets — the paper's practical use: fit
    one weight table per target domain and fill an EXACT per-domain
    quota from one shared raw pool.  ``targets`` maps domain name ->
    target corpus; ``quotas`` maps the same names -> how many raw docs
    that domain may claim.  Returns ``(id_col, domain, n_feats,
    logw_x1e6)`` — each selected document appears EXACTLY once.

    Collision rule (deterministic, cross-engine): domains claim docs in
    SORTED DOMAIN-NAME order; a later domain picks its top-``quota``
    among docs no earlier domain took (the greedy fill any SQL engine
    replays with top-n + NOT IN chains).  Per-domain scoring is the
    exact :func:`dsir_weights` integer recipe against that domain's
    weight table.

    Scale design: the raw corpus is shingled ONCE (the pinned per-doc
    bucket partials feed the shared raw count table and every domain's
    scorer); each domain then adds only its own small target scan, a
    broadcast ``<= buckets``-row weight join, a partial-agg per-doc sum
    and a TakeOrderedAndProject — and the anti-join against earlier
    picks is bounded by ``sum(quotas)`` rows (broadcast), never by
    data.  Domain count is a parameter (a handful), not data, so the
    Python loop here builds one declarative plan, not a driver loop
    over rows."""
    if not targets:
        raise ValueError("targets must be a non-empty dict")
    if set(targets) != set(quotas):
        raise ValueError("targets and quotas must share the same keys")
    for dom, q in quotas.items():
        if int(q) < 1:
            raise ValueError(f"quota for {dom!r} must be >= 1")
    _validate(buckets, ngrams, alpha)
    docf = (_feature_stream(raw, text_col, id_col, buckets, ngrams, seed)
            .groupBy("id", "b")
            .agg(F.count(F.lit(1)).cast("long").alias("__c"))
            .localCheckpoint(eager=False))
    rc = docf.groupBy("b").agg(F.sum("__c").cast("long").alias("r_f"))
    ids = raw.select(F.col(id_col)).localCheckpoint(eager=False)
    picks: list[DataFrame] = []
    taken: DataFrame | None = None
    for dom in sorted(targets):
        tc = (_feature_stream(targets[dom], target_text_col or text_col,
                              target_id_col or id_col, buckets, ngrams,
                              seed)
              .groupBy("b")
              .agg(F.count(F.lit(1)).cast("long").alias("t_f")))
        wt = _weights_from_counts(rc, tc, alpha)
        scored = _score_docs(docf, ids, wt, alpha, buckets, id_col)
        if taken is not None:
            scored = scored.join(F.broadcast(taken), id_col, "left_anti")
        pick = (scored
                .orderBy(F.col("logw_x1e6").desc(), F.col(id_col).asc())
                .limit(int(quotas[dom]))
                .select(F.col(id_col), F.lit(dom).alias("domain"),
                        "n_feats", "logw_x1e6")
                .localCheckpoint(eager=False))
        picks.append(pick)
        t = pick.select(F.col(id_col))
        taken = t if taken is None else taken.unionByName(t)
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out


def dsir_weight_array(weight_table: DataFrame, buckets: int,
                      alpha: int = 1) -> tuple[list[int], int]:
    """Densify a fitted weight table into ``(lr_list, c0_x1e6)`` for the
    map-only scorer (:func:`dsir_score_expr`): ``lr_list[b]`` is the
    bucket's integer log-ratio (0 for never-observed buckets — exactly
    what the formula yields at ``t_f = r_f = 0``).

    The driver pull is bounded by the FILTER size (``buckets`` longs,
    32 KiB at the 4096 default), never by data — the same contract as
    the Bloom bitmap.  ``c0`` is computed by the ENGINE (one 1-row
    aggregate), not Python math, so the scorer is bit-identical to
    :func:`dsir_weights`.  The table is pinned before the two pulls
    (round 14) so its lineage — the fit's shingling scans when called
    on a fresh :func:`dsir_bucket_weights` frame — runs ONCE, not once
    per pull."""
    a = F.lit(int(alpha)).cast("long")
    m = F.lit(int(buckets)).cast("long")
    wt = weight_table.localCheckpoint(eager=False)
    rows = wt.select("b", "lr_x1e6").collect()
    lr = [0] * int(buckets)
    for r in rows:
        lr[int(r["b"])] = int(r["lr_x1e6"])
    c0 = wt.agg(
        F.floor((F.log(F.sum("r_f") + a * m)
                 - F.log(F.sum("t_f") + a * m)) * 1e6 + 0.5)
         .cast("long").alias("c0")).first()["c0"]
    return lr, int(c0)


def dsir_score_expr(text: Column, lr: list[int], c0: int,
                    buckets: int, ngrams: int = 2,
                    seed: str = "dsir") -> Column:
    """``logw_x1e6`` as a pure-codegen Column over one text value: the
    MAP-ONLY spelling of :func:`dsir_weights` (higher-order fold over
    the doc's grams against a literal weight array) — bit-identical to
    the join path (parity pytest-pinned), with zero shuffle and zero
    state, so it runs unchanged in a STREAMING projection
    (:func:`~cascading_flink_spark.streaming.ops.stream_dsir_gate`)."""
    if len(lr) != int(buckets):
        # fail HERE with the cause, not deep inside element_at as an
        # ANSI INVALID_ARRAY_INDEX mid-stream task failure
        raise ValueError(
            f"dsir_score_expr: len(lr) == {len(lr)} but buckets == "
            f"{buckets}; pass the array from dsir_weight_array(table, "
            f"buckets) fitted with the SAME bucket count")
    from .text import _tokens
    toks = _tokens(F.lower(F.coalesce(text, F.lit(""))))
    grams = toks
    if ngrams >= 2:
        n = F.size(toks)
        bi = (F.when(n >= 2, F.transform(
                  F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
                  lambda i: F.concat_ws(" ", F.element_at(toks, i),
                                        F.element_at(toks, i + 1))))
              .otherwise(F.array().cast("array<string>")))
        grams = F.concat(toks, bi)
    lr_arr = F.lit([int(x) for x in lr])

    def bucket(g):
        h = F.md5(F.concat(F.lit(seed + "#"), g))
        return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"),
                      F.lit(buckets))

    s = F.aggregate(
        grams, F.lit(0).cast("long"),
        lambda acc, g: acc + F.element_at(lr_arr,
                                          (bucket(g) + 1).cast("int")))
    return (s + F.size(grams).cast("long") * F.lit(int(c0))).cast("long")


def dsir_sample(raw: DataFrame, target: DataFrame, n: int,
                temperature: float = 1.0,
                buckets: int = 4096, ngrams: int = 2, alpha: int = 1,
                seed: str = "dsir", text_col: str = "text",
                id_col: str = "doc_id",
                target_text_col: str | None = None,
                target_id_col: str | None = None) -> DataFrame:
    """SAMPLED DSIR selection — the paper's actual resampling step:
    draw ``n`` raw documents WITHOUT replacement with probability
    proportional to ``w(x)^(1/temperature)`` via the Gumbel-top-k trick
    (rank by ``log w(x)/temperature + G_i`` where ``G_i = -ln(-ln u_i)``
    and take the top ``n``) — :func:`dsir_select` is the
    zero-temperature limit of this.

    Determinism: the Gumbel noise is derived from md5 uniforms
    (``u_i = (hex8(md5(seed~"#g#"~id)) + 0.5) / 2^32``, never exactly 0
    or 1), so the draw is seeded and any engine replays the identical
    sample — the repo's md5-randomness convention.  The ranking key is
    a double (logw/T + G), ordered with an id tie-break; keys are
    continuous md5 draws, so rank boundaries are never within
    float-noise of each other in practice (the same accepted risk class
    as the ann family's unrounded-cosine ordering).

    Plans as TakeOrderedAndProject over the :func:`dsir_weights`
    frame — no global sort, no extra shuffle."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    w = dsir_weights(raw, target, buckets=buckets, ngrams=ngrams,
                     alpha=alpha, seed=seed, text_col=text_col,
                     id_col=id_col, target_text_col=target_text_col,
                     target_id_col=target_id_col)
    h = F.md5(F.concat(F.lit(seed + "#g#"),
                       F.col(id_col).cast("string")))
    u = ((F.conv(F.substring(h, 1, 8), 16, 10).cast("double") + 0.5)
         / F.lit(float(1 << 32)))
    gumbel = -F.log(-F.log(u))
    key = (F.col("logw_x1e6").cast("double")
           / F.lit(1e6 * float(temperature))) + gumbel
    return (w.withColumn("__k", key)
             .orderBy(F.col("__k").desc(), F.col(id_col).asc())
             .limit(int(n))
             .drop("__k"))
