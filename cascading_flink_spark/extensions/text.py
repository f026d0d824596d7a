"""Text analysis operators for training-data curation.

All native Column expressions — language ID, quality scoring, token
counting and fingerprinting run JVM-side at full codegen speed; at 100 TB
these are embarrassingly parallel map-only stages with no shuffle.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _round_half_up(col: Column, digits: int) -> Column:
    """Engine-agnostic half-up rounding: floor(x*10^d + 0.5)/10^d.

    ``F.round`` converts the double through BigDecimal (half-up on the
    shortest decimal repr) while DuckDB rounds the raw double — the two
    disagree on exact .5 boundaries (e.g. 189/40 = 4.725).  The floor form
    is identical IEEE math in every engine, so oracles can reproduce it."""
    scale = 10 ** digits
    return F.floor(col * scale + F.lit(0.5)) / scale

# Small, fixed stopword list for the language heuristic.  Counted by token
# membership (not regex) so the DuckDB oracle re-derives the identical rule
# without cross-engine regex-escaping pitfalls.
EN_MARKERS = ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"]
_TOKEN_SPLIT = r"\s+"


def _tokens(col: Column) -> Column:
    trimmed = F.trim(col)
    return F.when(trimmed == "", F.array()).otherwise(F.split(trimmed, _TOKEN_SPLIT))


def token_count(col: Column) -> Column:
    """Whitespace token count (BPE-ish refinement: see ``quality_features``'s
    ``n_subtokens`` which also splits punctuation boundaries)."""
    return F.size(_tokens(col))


def quality_features(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document quality scoring features.

    length / punctuation / digit / stopword ratios + token stats — the
    standard pre-training quality signals, all as one map-only projection.
    """
    t = F.col(text_col)
    toks = _tokens(t)
    n_tokens = F.size(toks)
    n_chars = F.length(t)
    stripped = F.regexp_replace(t, r"\s+", "")
    n_nonspace = F.length(stripped)
    # Unicode letter/digit classes, not \w: Java (and RE2) \w is
    # ASCII-only, which would score every non-Latin-script document as
    # pure punctuation and wipe whole languages at the quality gate
    n_punct = n_nonspace - F.length(
        F.regexp_replace(stripped, r"[^\p{L}\p{N}_]", ""))
    n_digits = F.length(F.regexp_replace(stripped, r"[^0-9]", ""))
    lower_toks = F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT)
    n_stop = F.size(F.filter(lower_toks, lambda tk: tk.isin(*EN_MARKERS)))
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        _round_half_up(n_nonspace / F.greatest(n_tokens, F.lit(1)), 2).alias("avg_token_len"),
        _round_half_up(n_punct / F.greatest(n_nonspace, F.lit(1)), 4).alias("punct_ratio"),
        _round_half_up(n_digits / F.greatest(n_nonspace, F.lit(1)), 4).alias("digit_ratio"),
        _round_half_up(n_stop / F.greatest(n_tokens, F.lit(1)), 4).alias("stopword_ratio"),
    )


def quality_filter(df: DataFrame, text_col: str = "text",
                   min_tokens: int = 5, max_punct_ratio: float = 0.5) -> DataFrame:
    """Keep documents passing basic quality gates (filter pushes down)."""
    t = F.col(text_col)
    toks = _tokens(t)
    stripped = F.regexp_replace(t, r"\s+", "")
    n_nonspace = F.length(stripped)
    # Unicode letter/digit classes, not \w: Java (and RE2) \w is
    # ASCII-only, which would score every non-Latin-script document as
    # pure punctuation and wipe whole languages at the quality gate
    n_punct = n_nonspace - F.length(
        F.regexp_replace(stripped, r"[^\p{L}\p{N}_]", ""))
    return df.filter(
        (F.size(toks) >= min_tokens) &
        (n_punct / F.greatest(n_nonspace, F.lit(1)) <= max_punct_ratio))


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            threshold: float = 0.05) -> DataFrame:
    """Stopword-marker language heuristic: English iff marker-per-token rate
    exceeds ``threshold``.  A deliberately simple, deterministic n-gram
    heuristic (real deployments would swap in fastText via a pandas UDF —
    the plumbing is identical)."""
    t = F.col(text_col)
    n_tokens = F.greatest(token_count(t), F.lit(1))
    lower_toks = F.split(F.lower(t), _TOKEN_SPLIT)
    hits = F.size(F.filter(lower_toks, lambda tk: tk.isin(*EN_MARKERS)))
    rate = hits / n_tokens
    return df.select(
        F.col(id_col),
        F.when(rate >= threshold, F.lit("en")).otherwise(F.lit("other")).alias("pred_lang"),
        _round_half_up(rate, 4).alias("marker_rate"),
    )


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lower-cased text.  md5 (not xxhash) so any engine reproduces it —
    the cross-system content-address for dedup joins."""
    return df.select(F.col(id_col), fingerprint_expr(F.col(text_col)).alias("fp"))


def fingerprint_expr(text: Column) -> Column:
    """The fingerprint column expression itself (md5 of whitespace-
    normalized, lower-cased text) — shared with cross-corpus dedup so
    both spell the content address identically."""
    return F.md5(F.lower(F.trim(F.regexp_replace(text, r"\s+", " "))))


# PII patterns chosen for identical behavior under Java regex (Spark) and
# RE2 (DuckDB): no lookarounds, no backreferences, \b is the ASCII word
# boundary in both.  Applied/counted in a fixed order (email, ipv4, ssn)
# so both engines see the same intermediate text.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
]


def redact_pii(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Scrub emails / IPv4 addresses / SSN-shaped ids, with per-kind counts.

    Returns ``(doc_id, clean_text, n_email, n_ipv4, n_ssn)``.  Counts are
    taken on each pattern's input text in the fixed application order, so
    the redaction and the counts tell one consistent story.  Map-only
    native ``regexp_replace``/``regexp_count`` — no shuffle, no Python, and
    the pattern dialect is the Java/RE2 common subset so any engine
    reproduces it bit-for-bit."""
    cur = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("long")
                       .alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return df.select(F.col(id_col), cur.alias("clean_text"), *counts)


def _gopher_metrics(t: Column) -> dict[str, Column]:
    """The raw Gopher rule metrics as Column expressions over text ``t``
    — one spelling shared by :func:`gopher_quality` (diagnostic
    projection) and :func:`gopher_pass_expr` (inline scan filter)."""
    toks = _tokens(t)
    n_words = F.size(toks).cast("long")
    lower_toks = F.split(F.lower(t), _TOKEN_SPLIT)
    lines = F.split(t, r"\n")
    n_lines = F.size(lines).cast("long")
    return {
        "n_words": n_words,
        "nw1": F.greatest(n_words, F.lit(1)),
        "n_nonspace": F.length(F.regexp_replace(t, r"\s+", "")).cast("long"),
        "n_sym": (F.length(F.regexp_replace(t, r"[^#]", "")).cast("long")
                  + F.regexp_count(t, F.lit(r"\.\.\.")).cast("long")),
        "n_alpha_words": F.size(
            F.filter(toks, lambda w: w.rlike(r"\p{L}"))).cast("long"),
        "n_stop": sum(
            (F.array_contains(lower_toks, m).cast("long")
             for m in EN_MARKERS),
            F.lit(0).cast("long")),
        "n_lines": n_lines,
        "nl1": F.greatest(n_lines, F.lit(1)),
        "n_bullet": F.size(
            F.filter(lines, lambda ln: F.trim(ln).rlike(r"^[-*•] ")))
            .cast("long"),
        "n_ell_lines": F.size(
            F.filter(lines, lambda ln: F.rtrim(ln).rlike(r"\.\.\.$")))
            .cast("long"),
    }


def _gopher_flags(m: dict[str, Column], min_words: int, max_words: int,
                  min_mean_word_len_x100: int, max_mean_word_len_x100: int,
                  max_symbol_ratio_x10000: int,
                  min_alpha_word_ratio_x10000: int, min_stop_hits: int,
                  max_bullet_line_ratio_x10000: int,
                  max_ellipsis_line_ratio_x10000: int) -> dict[str, Column]:
    """Per-rule pass flags from :func:`_gopher_metrics` output — every
    comparison is cross-multiplied integer arithmetic (exact)."""
    nw1, nl1 = m["nw1"], m["nl1"]
    return {
        "ok_words": ((m["n_words"] >= min_words)
                     & (m["n_words"] <= max_words)),
        # mean word length in [lo/100, hi/100]  <=>  lo*n_words <=
        # 100*chars <= hi*n_words (integer cross-multiplication, exact)
        "ok_word_len": (
            (m["n_nonspace"] * 100
             >= F.lit(int(min_mean_word_len_x100)) * nw1)
            & (m["n_nonspace"] * 100
               <= F.lit(int(max_mean_word_len_x100)) * nw1)),
        "ok_symbols": (m["n_sym"] * 10000
                       <= F.lit(int(max_symbol_ratio_x10000)) * nw1),
        "ok_alpha": (m["n_alpha_words"] * 10000
                     >= F.lit(int(min_alpha_word_ratio_x10000)) * nw1),
        "ok_stop": m["n_stop"] >= min_stop_hits,
        "ok_lines": (
            (m["n_bullet"] * 10000
             <= F.lit(int(max_bullet_line_ratio_x10000)) * nl1)
            & (m["n_ell_lines"] * 10000
               <= F.lit(int(max_ellipsis_line_ratio_x10000)) * nl1)),
    }


def gopher_pass_expr(text: Column,
                     min_words: int = 50, max_words: int = 100_000,
                     min_mean_word_len_x100: int = 300,
                     max_mean_word_len_x100: int = 1000,
                     max_symbol_ratio_x10000: int = 1000,
                     min_alpha_word_ratio_x10000: int = 8000,
                     min_stop_hits: int = 2,
                     max_bullet_line_ratio_x10000: int = 9000,
                     max_ellipsis_line_ratio_x10000: int = 3000) -> Column:
    """The Gopher rule conjunction as ONE boolean Column — the form a
    curation pipeline fuses straight into the scan filter (no projection,
    no join back on doc_id).  Spelled by the same rule expressions as
    :func:`gopher_quality`, so the two can never drift."""
    flags = _gopher_flags(
        _gopher_metrics(text), min_words, max_words,
        min_mean_word_len_x100, max_mean_word_len_x100,
        max_symbol_ratio_x10000, min_alpha_word_ratio_x10000,
        min_stop_hits, max_bullet_line_ratio_x10000,
        max_ellipsis_line_ratio_x10000)
    out = flags["ok_words"]
    for name in ("ok_word_len", "ok_symbols", "ok_alpha", "ok_stop",
                 "ok_lines"):
        out = out & flags[name]
    return out


def blocklist_hits_expr(text: Column, terms: list[str]) -> Column:
    """Blocked-token occurrence count as a Column (the inline-filter form
    of :func:`blocklist_stats` — ``blocklist_hits_expr(t, terms) == 0``
    is the keep gate), by the same exact lower-cased whitespace-token
    membership rule."""
    if not terms:
        raise ValueError("terms must be non-empty")
    lowered = sorted({str(x).lower() for x in terms})
    trimmed = F.trim(F.lower(text))
    toks = F.when(trimmed == "", F.array()) \
            .otherwise(F.split(trimmed, _TOKEN_SPLIT))
    return F.size(F.filter(toks, lambda w: w.isin(*lowered))).cast("long")


def gopher_quality(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   min_words: int = 50, max_words: int = 100_000,
                   min_mean_word_len_x100: int = 300,
                   max_mean_word_len_x100: int = 1000,
                   max_symbol_ratio_x10000: int = 1000,
                   min_alpha_word_ratio_x10000: int = 8000,
                   min_stop_hits: int = 2,
                   max_bullet_line_ratio_x10000: int = 9000,
                   max_ellipsis_line_ratio_x10000: int = 3000) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, public): the
    standard pre-training repetition-free gate set, one flag per rule
    plus the conjunction.

    Rules (thresholds are integer-scaled params; every comparison is
    cross-multiplied integer arithmetic, so no double ever reaches the
    output or the comparisons — any engine reproduces it bit-for-bit):

    * word count within ``[min_words, max_words]``
    * mean word length (non-space chars per word) within
      ``[min/max_mean_word_len_x100] / 100``
    * symbol-to-word ratio (``#`` chars + ``...`` runs, per word) at most
      ``max_symbol_ratio_x10000 / 10000``
    * fraction of words containing at least one Unicode letter at least
      ``min_alpha_word_ratio_x10000 / 10000`` (``\\p{L}``, not ASCII —
      same non-Latin-script rationale as :func:`quality_features`)
    * at least ``min_stop_hits`` DISTINCT stopword markers present
      (:data:`EN_MARKERS` — the Gopher "must contain 2 of ..." rule)
    * fraction of lines starting with a bullet (``-``/``*``/``•``)
      at most ``max_bullet_line_ratio_x10000 / 10000``, and fraction of
      lines ending in ``...`` at most
      ``max_ellipsis_line_ratio_x10000 / 10000``

    Returns ``(doc_id, n_words, mean_word_len_x100, symbol_ratio_x10000,
    alpha_word_ratio_x10000, n_stop_hits, n_lines, ok_words, ok_word_len,
    ok_symbols, ok_alpha, ok_stopwords, ok_lines, pass)`` — all longs /
    booleans.  Map-only native expressions: no shuffle, no Python; at
    100 TB this is an embarrassingly parallel projection exactly like
    :func:`quality_features`.

    The rule expressions are shared with :func:`gopher_pass_expr` (the
    inline-filter form curation pipelines fuse into the scan), so both
    spell every rule identically.
    """
    t = F.col(text_col)
    m = _gopher_metrics(t)
    flags = _gopher_flags(
        m, min_words, max_words, min_mean_word_len_x100,
        max_mean_word_len_x100, max_symbol_ratio_x10000,
        min_alpha_word_ratio_x10000, min_stop_hits,
        max_bullet_line_ratio_x10000, max_ellipsis_line_ratio_x10000)
    (n_words, nw1, n_nonspace, n_sym, n_alpha_words, n_stop, n_lines,
     nl1) = (m["n_words"], m["nw1"], m["n_nonspace"], m["n_sym"],
             m["n_alpha_words"], m["n_stop"], m["n_lines"], m["nl1"])
    ok_words, ok_word_len, ok_symbols, ok_alpha, ok_stop, ok_lines = (
        flags["ok_words"], flags["ok_word_len"], flags["ok_symbols"],
        flags["ok_alpha"], flags["ok_stop"], flags["ok_lines"])
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        # floor-scaled diagnostics (exact integer DIV below)
        (n_nonspace * 100).cast("long").alias("__mwl_num"),
        nw1.alias("__nw1"), nl1.alias("__nl1"),
        (n_sym * 10000).alias("__sym_num"),
        (n_alpha_words * 10000).alias("__alpha_num"),
        n_stop.alias("n_stop_hits"),
        n_lines.alias("n_lines"),
        ok_words.alias("ok_words"), ok_word_len.alias("ok_word_len"),
        ok_symbols.alias("ok_symbols"), ok_alpha.alias("ok_alpha"),
        ok_stop.alias("ok_stopwords"), ok_lines.alias("ok_lines"),
        (ok_words & ok_word_len & ok_symbols & ok_alpha & ok_stop
         & ok_lines).alias("pass"),
    ).select(
        id_col, "n_words",
        F.expr("__mwl_num DIV __nw1").cast("long")
            .alias("mean_word_len_x100"),
        F.expr("__sym_num DIV __nw1").cast("long")
            .alias("symbol_ratio_x10000"),
        F.expr("__alpha_num DIV __nw1").cast("long")
            .alias("alpha_word_ratio_x10000"),
        "n_stop_hits", "n_lines", "ok_words", "ok_word_len", "ok_symbols",
        "ok_alpha", "ok_stopwords", "ok_lines", "pass",
    )


def blocklist_stats(df: DataFrame, terms: list[str],
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Token-membership blocklist scan — the NSFW / spam wordlist gate of
    a crawl-curation pipeline, by exact lower-cased whitespace-token
    membership (not substring regex, so "classic" never trips a "ass"
    entry and the DuckDB oracle re-derives the identical rule with no
    regex-dialect pitfalls).

    Returns ``(doc_id, n_hits, n_terms, kept)``: total blocked-token
    occurrences, DISTINCT blocklist entries present, and
    ``kept = (n_hits == 0)`` as a long 0/1.  Map-only native
    higher-order-function expressions; no shuffle, no Python.  At 100 TB
    real blocklists are a few thousand entries — a literal array in the
    plan (or a broadcast join for very large lists); this takes the
    literal-array form.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    lowered = sorted({str(x).lower() for x in terms})
    t = F.col(text_col)
    trimmed = F.trim(F.lower(t))
    toks = F.when(trimmed == "", F.array()) \
            .otherwise(F.split(trimmed, _TOKEN_SPLIT))
    n_hits = blocklist_hits_expr(t, terms)
    n_terms = sum(
        (F.array_contains(toks, m).cast("long") for m in lowered),
        F.lit(0).cast("long"))
    return df.select(
        F.col(id_col),
        n_hits.alias("n_hits"),
        n_terms.alias("n_terms"),
        (n_hits == 0).cast("long").alias("kept"),
    )


# GPT-2-style pre-tokenizer pattern (no lookarounds, so Java regex and RE2
# agree): contractions, optional-space letter run, optional-space digit run,
# optional-space punctuation run.
BPE_ISH_PATTERN = "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s']+"


def token_budget(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document (whitespace_tokens, bpe_ish_tokens) — the 'how many
    tokens will the tokenizer see' signal used for pipeline budgeting.
    Map-only; the regex is lookaround-free so the DuckDB oracle reproduces
    it verbatim."""
    return df.select(
        F.col(id_col),
        token_count(F.col(text_col)).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower(F.col(text_col)),
                                    F.lit(BPE_ISH_PATTERN), F.lit(0)))
         .cast("long").alias("bpe_tokens"),
    )


def compression_stats(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", level: int = 6) -> DataFrame:
    """Per-document zlib compressibility — the classic cheap junk
    detector (boilerplate, generated spam and repeated templates compress
    far below prose; CCNet/RefinedWeb-family pipelines gate on it):
    ``(doc_id, n_bytes, n_compressed, ratio_x10000)`` with ``ratio_x10000
    = n_compressed * 10000 div n_bytes`` (0 for empty docs).

    Runs as one Arrow-batched ``pandas_udf`` projection (zlib is
    CPU-trivial next to the scan) — map-only, zero shuffles.  The byte
    counts are deterministic for a given zlib version/level, but not
    SQL-expressible, so the driver records the rows-only check; exactness
    is pinned against the Python model in tests."""
    @F.pandas_udf("long")
    def _clen(s: pd.Series) -> pd.Series:
        import zlib
        return s.map(lambda t: 0 if not t
                     else len(zlib.compress(t.encode("utf-8"), level)))

    n_bytes = F.length(F.encode(F.coalesce(F.col(text_col), F.lit("")),
                                "utf-8")).cast("long")
    return (df.select(F.col(id_col), n_bytes.alias("n_bytes"),
                      _clen(F.coalesce(F.col(text_col), F.lit("")))
                      .alias("n_compressed"))
              .withColumn("ratio_x10000",
                          F.when(F.col("n_bytes") == 0, F.lit(0).cast("long"))
                           .otherwise(F.expr(
                               "n_compressed * 10000 div n_bytes"))))


# ------------------------------------------------------------------
# Quality classifier: the fastText-style linear scoring stage of public
# curation pipelines (CCNet / Gopher lineage) — a trained classifier's
# coefficients applied as a map-only projection.

#: Feature names the classifier scores, in fixed order.  All are
#: integer-scaled (x100 / x10000) so the dot product is exact integer
#: arithmetic end-to-end.
CLASSIFIER_FEATURES = (
    "mean_word_len_x100",
    "punct_ratio_x10000",
    "digit_ratio_x10000",
    "stopword_ratio_x10000",
    "alpha_word_ratio_x10000",
)

#: Stand-in "pre-trained" coefficients (a real deployment loads the
#: trained logistic/fastText weights; these defaults are calibrated on the
#: synthetic corpus so the gate is discriminative rather than constant).
#: Units: score contribution per integer-scaled feature unit.
DEFAULT_FEATURE_WEIGHTS = {
    "mean_word_len_x100": -2,
    "punct_ratio_x10000": -6,
    "digit_ratio_x10000": -3,
    "stopword_ratio_x10000": 4,
    "alpha_word_ratio_x10000": 1,
}


def default_bucket_weights(n_buckets: int = 64) -> list[int]:
    """Deterministic stand-in for trained hashed-token coefficients:
    ``w[j] = ((j * 37) % 21) - 10`` (zero-mean over a full cycle).  A real
    deployment replaces this with the trained fastText bucket table; the
    plumbing (hash -> bucket -> literal-array lookup) is identical."""
    return [((j * 37) % 21) - 10 for j in range(n_buckets)]


def load_fasttext_weights(path: str, n_buckets: int = 64,
                          scale: int = 10000) -> dict:
    """Load an externally trained linear-classifier weight table in the
    public fastText ``.vec`` TEXT format (the word-vector interchange
    format: a ``<n_rows> <dim>`` header line, then ``<term> <value>``
    rows) with ``dim == 1`` — one scalar coefficient per term, which is
    exactly what a linear (fastText-supervised-style) quality classifier
    is.  Term namespaces:

    * ``__label__bias`` — the intercept;
    * ``f_<name>`` — a hand-crafted feature coefficient, ``<name>`` one
      of :data:`CLASSIFIER_FEATURES`;
    * ``b_<j>`` — hashed-token bucket ``j`` (0-based, ``< n_buckets``).

    Float file values become EXACT integers via ``int(round(v * scale))``
    (documented contract — the classifier's cross-engine bit-for-bit
    scoring requires integer weights).  Buckets absent from the file
    weigh 0.  Returns ``{"feature_weights", "bucket_weights", "bias",
    "n_buckets"}``, ready to splat into :func:`quality_classifier`::

        quality_classifier(df, **load_fasttext_weights("model.vec"))

    The table loads driver-side and rides the plan as literals (the
    broadcast pattern for model weights) — the right shape at 100 TB,
    where a per-row file read or a join against a 70-row table would be
    absurd."""
    feature_weights: dict[str, int] = {}
    bucket = [0] * n_buckets
    bias = 0
    with open(path, encoding="utf-8") as f:
        header = f.readline().split()
        if len(header) != 2:
            raise ValueError(f"{path}: expected '<n> <dim>' header")
        n_rows, dim = int(header[0]), int(header[1])
        if dim != 1:
            raise ValueError(
                f"{path}: dim={dim}; a linear classifier table has dim=1")
        seen = 0
        for line in f:
            if not line.strip():
                continue
            term, *vals = line.split()
            if len(vals) != 1:
                raise ValueError(f"{path}: row {term!r} has {len(vals)} "
                                 "values, expected 1")
            v = int(round(float(vals[0]) * scale))
            if term == "__label__bias":
                bias = v
            elif term.startswith("f_"):
                name = term[2:]
                if name not in CLASSIFIER_FEATURES:
                    raise ValueError(f"{path}: unknown feature {name!r}")
                feature_weights[name] = v
            elif term.startswith("b_"):
                j = int(term[2:])
                if not 0 <= j < n_buckets:
                    raise ValueError(f"{path}: bucket {j} out of range "
                                     f"for n_buckets={n_buckets}")
                bucket[j] = v
            else:
                raise ValueError(f"{path}: unrecognised term {term!r}")
            seen += 1
        if seen != n_rows:
            raise ValueError(f"{path}: header declares {n_rows} rows, "
                             f"found {seen}")
    return {"feature_weights": feature_weights, "bucket_weights": bucket,
            "bias": bias, "n_buckets": n_buckets}


def quality_classifier(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       feature_weights: dict[str, int] | None = None,
                       bucket_weights: list[int] | None = None,
                       bias: int = 0,
                       n_buckets: int = 64) -> DataFrame:
    """Linear quality classifier — the fastText-classifier stage of a
    curation pipeline (CCNet/Gopher lineage), as one map-only projection.

    Two signal families, combined in EXACT integer arithmetic (no double
    ever reaches a comparison or the output, so any engine reproduces it
    bit-for-bit):

    * hand-crafted quality features (:data:`CLASSIFIER_FEATURES` — the
      integer-scaled ratios of :func:`quality_features` /
      :func:`gopher_quality`), each multiplied by its coefficient;
    * a hashed bag-of-tokens score — every lower-cased token hashes to
      one of ``n_buckets`` buckets via the engine-neutral md5-prefix
      integer (``conv(substr(md5(tok),1,8),16,10) % n_buckets``), the
      bucket coefficients are a literal array in the plan (the broadcast
      weight table of a fastText model), and the per-doc score is the
      integer mean ``(sum_of_bucket_weights * 10000) div n_tokens``.

    ``score = bias + sum_f w_f * f + bag_score``; ``kept = score >= 0``.

    Returns ``(doc_id, <the 5 features>, bag_score, score, kept)`` — all
    longs.  Weight tables ride the plan as literals (equivalently a
    broadcast): at 100 TB this is an embarrassingly parallel map-only
    stage with zero shuffles, exactly like :func:`gopher_quality`.
    """
    fw = dict(DEFAULT_FEATURE_WEIGHTS)
    if feature_weights:
        unknown = set(feature_weights) - set(CLASSIFIER_FEATURES)
        if unknown:
            raise ValueError(f"unknown classifier features: {sorted(unknown)}")
        fw.update({k: int(v) for k, v in feature_weights.items()})
    bw = (default_bucket_weights(n_buckets) if bucket_weights is None
          else [int(x) for x in bucket_weights])
    if len(bw) != n_buckets:
        raise ValueError("bucket_weights length must equal n_buckets")

    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = _tokens(t)
    n_tokens = F.size(toks).cast("long")
    nw1 = F.greatest(n_tokens, F.lit(1))
    lt = F.trim(F.lower(t))
    ltoks = F.when(lt == "", F.array()).otherwise(F.split(lt, _TOKEN_SPLIT))
    stripped = F.regexp_replace(t, r"\s+", "")
    n_nonspace = F.length(stripped).cast("long")
    ns1 = F.greatest(n_nonspace, F.lit(1))
    # Unicode classes, not \w — see quality_features
    n_punct = n_nonspace - F.length(
        F.regexp_replace(stripped, r"[^\p{L}\p{N}_]", ""))
    n_digits = F.length(F.regexp_replace(stripped, r"[^0-9]", "")).cast("long")
    n_stop = F.size(F.filter(ltoks, lambda tk: tk.isin(*EN_MARKERS))) \
        .cast("long")
    n_alpha_words = F.size(
        F.filter(toks, lambda w: w.rlike(r"\p{L}"))).cast("long")

    feats = {
        "mean_word_len_x100": F.expr(f"__ns * 100 DIV __nw1"),
        "punct_ratio_x10000": F.expr("__np * 10000 DIV __ns1"),
        "digit_ratio_x10000": F.expr("__nd * 10000 DIV __ns1"),
        "stopword_ratio_x10000": F.expr("__nst * 10000 DIV __nw1"),
        "alpha_word_ratio_x10000": F.expr("__na * 10000 DIV __nw1"),
    }
    warr = F.array(*[F.lit(int(x)).cast("long") for x in bw])
    bucket1 = lambda tk: (  # noqa: E731 — 1-based literal-array index
        F.pmod(F.conv(F.substring(F.md5(tk), 1, 8), 16, 10).cast("long"),
               F.lit(n_buckets)) + 1).cast("int")
    wsum = F.aggregate(
        F.transform(ltoks, lambda tk: F.element_at(warr, bucket1(tk))),
        F.lit(0).cast("long"), lambda acc, x: acc + x)

    staged = df.select(
        F.col(id_col), n_nonspace.alias("__ns"), ns1.alias("__ns1"),
        nw1.alias("__nw1"), n_punct.cast("long").alias("__np"),
        n_digits.alias("__nd"), n_stop.alias("__nst"),
        n_alpha_words.alias("__na"), wsum.alias("__wsum"))
    staged = staged.select(
        F.col(id_col),
        *[feats[name].cast("long").alias(name)
          for name in CLASSIFIER_FEATURES],
        F.expr("__wsum * 10000 DIV __nw1").cast("long").alias("bag_score"))
    score = sum(
        (F.col(name) * F.lit(int(fw[name])) for name in CLASSIFIER_FEATURES),
        F.lit(int(bias)).cast("long")) + F.col("bag_score")
    return staged.select(
        id_col, *CLASSIFIER_FEATURES, "bag_score",
        score.cast("long").alias("score"),
        (score >= 0).cast("long").alias("kept"))


# Char-for-char folds (translate): curly quotes -> ASCII, en/em dash -> '-',
# NBSP -> space.  Multi-char folds (ellipsis) and deletions (control /
# zero-width chars) go through regexp_replace.  Explicit code points only
# (no shorthand classes) -- the Java-regex/RE2 common dialect.
_FOLD_SRC = "\u2018\u2019\u201c\u201d\u2013\u2014\u00a0"
_FOLD_DST = "''\"\"-- "
_DROP_PAT = ("[\u0000-\u0008\u000b\u000c\u000e-\u001f\u007f"
             "\u200b\u200c\u200d\ufeff]")


def clean_text_expr(text: Column) -> Column:
    """The normalization expression: drop control/zero-width chars, fold
    typographic quotes/dashes/NBSP/ellipsis to ASCII, collapse whitespace
    runs, trim."""
    t = F.regexp_replace(text, _DROP_PAT, "")
    t = F.translate(t, _FOLD_SRC, _FOLD_DST)
    t = F.regexp_replace(t, "\u2026", "...")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def clean_text(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Unicode-light text normalization -- the standard cleanup pass before
    fingerprinting/shingling (stray control chars or typographic quotes
    otherwise split exact-dup groups): ``(doc_id, clean_text, changed)``.

    Map-only native expressions (translate + 3 regexp passes), zero
    shuffles; the fold table and patterns are explicit code points in the
    engine-common dialect so the oracle replays the pipeline verbatim.

    NULL text coalesces to '' first (matching :func:`compression_stats`),
    so ``changed`` is always a real boolean — a downstream filter on
    either polarity would otherwise silently drop NULL-text rows."""
    src = F.coalesce(F.col(text_col), F.lit(""))
    cleaned = clean_text_expr(src)
    return df.select(F.col(id_col), cleaned.alias("clean_text"),
                     (cleaned != src).alias("changed"))


def c4_line_keep_expr(line: Column, min_words: int = 3) -> Column:
    """C4 line-retention rule (Raffel et al. 2020, public): keep a line iff
    it ends in terminal punctuation, carries at least ``min_words``
    whitespace words, and does not mention "javascript" (boilerplate
    cookie/JS warnings).  Pure Column expression for reuse in batch and
    streaming variants."""
    t = F.trim(line)
    return (t.rlike(r'[.!?"]$')
            & (F.size(F.split(t, _TOKEN_SPLIT)) >= min_words)
            & ~F.lower(t).contains("javascript"))


def c4_rules(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
             min_line_words: int = 3, min_sentences: int = 5) -> DataFrame:
    """C4-style page cleaning (the public Colossal Clean Crawled Corpus
    heuristics): per-line retention + page-level gates, one map-only pass.

    Line rule: keep lines ending in terminal punctuation with >=
    ``min_line_words`` words and no "javascript" mention
    (:func:`c4_line_keep_expr`).  Page gates: the kept text must carry >=
    ``min_sentences`` sentence-final marks, and the raw page must not
    contain "lorem ipsum" or a ``{`` (code/template leakage).  The
    dirty-word gate is the existing :func:`blocklist_stats` — compose it
    upstream rather than duplicating it here.

    Returns ``(doc_id, n_lines, n_kept_lines, n_sentences, has_lorem,
    has_curly, ok_sentences, pass, clean_text)`` with flags as longs so
    the oracle hash-matches.  Map-only: no shuffle at any scale; the
    line filter runs inside codegen via a higher-order array filter, so
    100 TB of pages stream through with zero state.
    """
    src = F.coalesce(F.col(text_col), F.lit(""))
    # split on \r?\n, not \n: a trailing \r is a Java-regex line
    # terminator, so rlike's $ would match before it while RE2-family
    # engines (the oracle) would not — consuming the \r at the split
    # keeps CRLF corpora engine-agnostic
    lines = F.split(src, "\r?\n")
    kept = F.filter(lines, lambda ln: c4_line_keep_expr(ln, min_line_words))
    clean = F.array_join(kept, "\n")
    n_sentences = F.length(F.regexp_replace(clean, r"[^.!?]", ""))
    has_lorem = F.lower(src).contains("lorem ipsum")
    has_curly = src.contains("{")
    ok_sent = n_sentences >= min_sentences
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        n_sentences.cast("long").alias("n_sentences"),
        has_lorem.cast("long").alias("has_lorem"),
        has_curly.cast("long").alias("has_curly"),
        ok_sent.cast("long").alias("ok_sentences"),
        (ok_sent & ~has_lorem & ~has_curly).cast("long").alias("pass"),
        clean.alias("clean_text"),
    )
