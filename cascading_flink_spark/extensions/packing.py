"""Sequence packing: assign every document its token offsets in the
concatenated corpus and the context-window chunks it spans — the
concat-then-chunk step of LLM pretraining data preparation.

Scale design (the 100 TB story): the naive formulation is a cumulative sum
over a GLOBAL window order, which Spark executes as a single-partition
window — the one-machine bottleneck that kills the job at scale.  Here the
running total is two-phase instead:

1. docs are bucketed by the first ``bucket_chars`` hex chars of ``md5(id)``
   (uniform buckets) and summed within each bucket by a bucket-partitioned
   window (full cluster parallelism, one shuffle on a uniform key);
2. the per-bucket totals are turned into running base offsets by a window
   over the tiny bucket table and broadcast-joined back.

``bucket_chars`` defaults to 4 (65536 buckets): each bucket-window task
sorts corpus/65536 rows — ~1.5 GB per task at 100 TB — while the base
offset table stays a few MB, comfortably broadcastable.  The bucket is a
PREFIX of the md5, so the global order — and therefore the result — is
identical for any bucket width.

The total order is (bucket, md5(id), id) — deterministic, engine-neutral,
and exactly reproducible by a plain global-window cumsum in any SQL engine
(which is what the DuckDB oracle does), so correctness is checked against
the simple spelling while the Spark plan keeps the scale-safe shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import _tokens, token_count


def chunk_corpus(df: DataFrame, context_len: int,
                 text_col: str = "text", id_col: str = "doc_id",
                 bucket_chars: int = 4,
                 carry_cols: list[str] | None = None) -> DataFrame:
    """Token offsets and context-window chunk span per document.

    Documents are laid end-to-end in the deterministic global order
    (md5-bucket, md5(id), id) and cut into ``context_len``-token chunks;
    each document reports where its tokens land:

    Returns ``(doc_id, *carry_cols, n_tokens, start_offset, first_chunk,
    last_chunk)``
    with ``first_chunk = start_offset div context_len`` and ``last_chunk =
    (start_offset + n_tokens - 1) div context_len``.  Zero-token documents
    are dropped (they occupy no chunk).  Token counting is the whitespace
    rule of :func:`cascading_flink_spark.extensions.text.token_count`.
    ``carry_cols`` names input columns (e.g. lang/source/split labels) to
    carry through onto the output rows — carried in the narrow projection,
    so no join-back is ever needed.
    """
    if context_len <= 0:
        raise ValueError("context_len must be positive")
    carry = list(carry_cols or [])
    # The narrow tokenized frame feeds BOTH cumsum phases (the per-bucket
    # running total and the bucket-base aggregate) — pin it so the
    # tokenization regex and the (possibly deep) upstream plan run once,
    # not once per branch.  It is the pruned projection (id, carry,
    # n_tokens, hash), a small fraction of the input width.
    # localCheckpoint(eager=False), not persist(): block lifetime is then
    # scoped to the returned frame (ContextCleaner frees on GC) instead
    # of accumulating in the cached-query registry call after call.
    d = (df.select(F.col(id_col).alias("id"), *carry,
                   token_count(F.col(text_col)).cast("long").alias("n_tokens"),
                   F.md5(F.col(id_col).cast("string")).alias("__h"))
           .filter(F.col("n_tokens") > 0)
           .withColumn("__b", F.substring("__h", 1, bucket_chars))
           .localCheckpoint(eager=False))
    # phase 1: running total WITHIN each uniform md5-prefix bucket
    w_in = (Window.partitionBy("__b").orderBy("__h", "id")
            .rowsBetween(Window.unboundedPreceding, -1))
    d = d.withColumn("__within", F.coalesce(F.sum("n_tokens").over(w_in),
                                            F.lit(0)))
    # phase 2: base offset per bucket — a 256-row window, then broadcast
    w_b = (Window.orderBy("__b")
           .rowsBetween(Window.unboundedPreceding, -1))
    base = (d.groupBy("__b").agg(F.sum("n_tokens").alias("__bt"))
             .withColumn("__base", F.coalesce(F.sum("__bt").over(w_b),
                                              F.lit(0)))
             .select("__b", "__base"))
    start = F.col("__base") + F.col("__within")
    return (d.join(F.broadcast(base), "__b")
             .select(F.col("id").alias(id_col), *carry,
                     F.col("n_tokens"),
                     start.alias("start_offset"),
                     F.floor(start / context_len).alias("first_chunk"),
                     F.floor((start + F.col("n_tokens") - 1) / context_len)
                      .alias("last_chunk")))


def overlap_chunks(df: DataFrame, context_len: int, stride: int,
                   text_col: str = "text", id_col: str = "doc_id"
                   ) -> DataFrame:
    """Per-document sliding-window token chunks — the RAG / long-context
    chunking step: chunk ``j`` covers tokens
    ``[j*stride, j*stride + context_len)`` of the document.

    Returns ``(doc_id, chunk_id, chunk_tokens, chunk_text)``; the chunk
    count is ``1`` for documents of at most ``context_len`` tokens, else
    ``1 + ceil((n - context_len) / stride)`` capped at
    ``1 + floor((n - 1) / stride)`` — the cap only bites when
    ``stride > context_len``, where the uncapped formula would emit a
    trailing chunk starting past the last token (zero tokens, empty
    text), contradicting the "final window may be shorter" contract
    (the final window is shorter, never empty).  ``stride <
    context_len`` gives overlapping context,
    ``stride == context_len`` disjoint blocks, ``stride > context_len``
    gapped sampling — all three are just parameter choices of the same
    window walk.  Zero-token documents are dropped (they chunk to
    nothing), matching :func:`chunk_corpus`.

    Scale shape: tokenize -> per-row chunk-index explode -> slice, all
    native expressions inside one narrow stage — ZERO shuffles, so the
    operator scales linearly with input splits and never concentrates a
    long document anywhere (a doc's chunks stay in its partition).
    Tokenization is the shared whitespace rule of
    :func:`cascading_flink_spark.extensions.text.token_count`."""
    if context_len <= 0:
        raise ValueError("context_len must be positive")
    if stride <= 0:
        raise ValueError("stride must be positive")
    d = (df.select(F.col(id_col), _tokens(F.col(text_col)).alias("__t"))
           .withColumn("__n", F.size("__t").cast("long"))
           .filter(F.col("__n") > 0))
    num = F.when(F.col("__n") <= context_len, F.lit(1).cast("long")) \
           .otherwise(F.least(
               F.lit(1) + F.expr(
                   f"(__n - {context_len} + {stride} - 1) div {stride}"),
               F.lit(1) + F.expr(f"(__n - 1) div {stride}")))
    chunk = F.slice(F.col("__t"),
                    (F.col("__j") * stride + 1).cast("int"), context_len)
    return (d.withColumn("__j", F.explode(F.sequence(F.lit(0).cast("long"),
                                                     num - 1)))
             .select(F.col(id_col),
                     F.col("__j").alias("chunk_id"),
                     F.size(chunk).cast("long").alias("chunk_tokens"),
                     F.array_join(chunk, " ").alias("chunk_text")))


def pack_bins(df: DataFrame, capacity: int,
              text_col: str = "text", id_col: str = "doc_id",
              bucket_chars: int = 2,
              strategy: str = "nextfit") -> DataFrame:
    """No-split sequence packing: pack documents WHOLE into
    fixed-``capacity`` token bins — a document never splits across bins
    (the SFT-style packing rule; :func:`chunk_corpus` is the splitting
    pretraining variant).  A document longer than ``capacity`` gets a
    bin of its own (documented overflow rule — truncation is a
    tokenizer-side decision, not a packer decision).

    ``strategy="nextfit"`` (default): walk the deterministic global
    order (md5-bucket, md5(id), id), close the current bin when the
    next document overflows it.  One sequential O(n) pass; this is the
    DuckDB-replayable spelling the correctness gate checks.

    ``strategy="bfd"``: best-fit decreasing — documents sorted by
    (tokens desc, md5, id), each placed into the open bin with the
    least remaining room that still fits (ties: lowest bin id), else a
    new bin.  O(n log n) via a sorted remainder list; measurably fewer
    bins / less padding than next-fit on long-tailed corpora, pinned
    against a Python model in pytest (the placement recursion carries
    per-bin state no SQL window expresses, so no oracle twin).

    Returns ``(doc_id, n_tokens, bin, offset_in_bin)``: ``bin`` is the
    global bin index, ``offset_in_bin`` the document's first-token
    position inside it.  Zero-token documents are dropped.

    Scale shape: documents hash into ``16^bucket_chars`` md5-prefix
    buckets; the inherently-sequential packing walk runs per bucket in
    ONE Arrow pass (per-bucket is how the sequence dependency
    parallelizes, and bins never span buckets by construction), then
    each bucket's local bin indices are offset by the exclusive
    running sum of bins-per-bucket — a window over at most
    ``16^bucket_chars`` aggregate rows, broadcast back.  Identical
    two-phase shape to :func:`chunk_corpus`, so the same exactness and
    scale arguments apply.  ``bucket_chars=0`` collapses to ONE bucket —
    a single sequential walk over the whole (md5, id) order (test-scale
    only; it serializes the packing into one task)."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    if strategy not in ("nextfit", "bfd"):
        raise ValueError("strategy must be 'nextfit' or 'bfd'")
    import pandas as pd

    d = (df.select(F.col(id_col).alias("id"),
                   token_count(F.col(text_col)).cast("long")
                    .alias("n_tokens"),
                   F.md5(F.col(id_col).cast("string")).alias("__h"))
           .filter(F.col("n_tokens") > 0)
           .withColumn("__b", F.substring("__h", 1, bucket_chars)))

    out_schema = ("id string, n_tokens long, __b string, "
                  "__local_bin long, offset_in_bin long")

    def nextfit(key, pdf):
        pdf = pdf.sort_values(["__h", "id"])
        bins, offs = [], []
        cur_bin, fill = 0, 0
        for n in pdf["n_tokens"]:
            if fill > 0 and fill + n > capacity:
                cur_bin += 1
                fill = 0
            bins.append(cur_bin)
            offs.append(fill)
            fill += int(n)
        return pd.DataFrame({"id": pdf["id"].astype(str),
                             "n_tokens": pdf["n_tokens"],
                             "__b": key[0],
                             "__local_bin": bins,
                             "offset_in_bin": offs})

    def bfd(key, pdf):
        from bisect import bisect_left, insort

        pdf = pdf.sort_values(["__h", "id"])
        pdf = pdf.iloc[(-pdf["n_tokens"].to_numpy()).argsort(kind="stable")]
        fills: list = []          # fill per bin, indexed by local bin id
        # open bins keyed by (remaining, bin_id), sorted — best fit is
        # the FIRST entry with remaining >= n (least room that fits;
        # ties break to the lowest bin id by the tuple order)
        open_bins: list = []
        bins, offs = [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            i = bisect_left(open_bins, (n, -1))
            if i < len(open_bins):
                rem, b = open_bins.pop(i)
                bins.append(b)
                offs.append(fills[b])
                fills[b] += n
                if rem - n > 0:
                    insort(open_bins, (rem - n, b))
            else:
                b = len(fills)
                bins.append(b)
                offs.append(0)
                fills.append(n)
                if capacity - n > 0:
                    insort(open_bins, (capacity - n, b))
        return pd.DataFrame({"id": pdf["id"].astype(str),
                             "n_tokens": pdf["n_tokens"],
                             "__b": key[0],
                             "__local_bin": bins,
                             "offset_in_bin": offs})

    walk = nextfit if strategy == "nextfit" else bfd
    # Pin the packing walk's output: BOTH the bin-count aggregate and the
    # final join read it, and without the pin the per-bucket walk and its
    # upstream scan + tokenization would execute twice (same branching
    # reason chunk_corpus pins its tokenized frame).
    packed = (d.withColumn("id", F.col("id").cast("string"))
                .groupBy("__b").applyInPandas(walk, out_schema)
                .localCheckpoint(eager=False))
    # bucket bin-count exclusive prefix sum over <= 16^bucket_chars rows
    w_b = (Window.orderBy("__b")
           .rowsBetween(Window.unboundedPreceding, -1))
    base = (packed.groupBy("__b")
            .agg((F.max("__local_bin") + 1).alias("__nb"))
            .withColumn("__base", F.coalesce(F.sum("__nb").over(w_b),
                                             F.lit(0)))
            .select("__b", "__base"))
    # the Arrow pass carried the id as a string; restore the input type
    id_type = df.schema[id_col].dataType
    return (packed.join(F.broadcast(base), "__b")
                  .select(F.col("id").cast(id_type).alias(id_col),
                          F.col("n_tokens"),
                          (F.col("__base") + F.col("__local_bin"))
                           .alias("bin"),
                          F.col("offset_in_bin")))
