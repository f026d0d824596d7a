"""Byte-pair encoding: train a merge table, encode a corpus — the real
tokenizer-budget path (`token_budget`'s regex is a static approximation;
this is the actual iterative-merge algorithm, so token counts track what a
trained BPE/GPT-style tokenizer would produce).

Scale split, same as the IVF/PQ codebook pattern (`similarity.py`):
TRAINING needs only a bounded representative sample — classic BPE is
inherently sequential (each merge depends on the counts after the last),
so it runs driver-side on a deterministic md5-ordered sample with
O(sample) memory; ENCODING is embarrassingly parallel and runs as one
Arrow-batched pass over the full corpus with the merge table broadcast in
the UDF closure.  At 100 TB: train once on the bounded sample, write the
merge table, encode every shard in parallel forever after.

Determinism: the sample is md5-ordered (rerun-stable, scan-order-free);
merge selection breaks count ties lexicographically; encoding is a pure
function of (text, merges).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# end-of-word sentinel (classic Sennrich et al. 2016 formulation: merges
# never cross word boundaries)
_EOW = "▁"


def _word_symbols(word: str) -> tuple:
    return tuple(word) + (_EOW,)


def _pair_counts(vocab: dict) -> Counter:
    pairs: Counter = Counter()
    for syms, n in vocab.items():
        for i in range(len(syms) - 1):
            pairs[(syms[i], syms[i + 1])] += n
    return pairs


def _merge_vocab(vocab: dict, pair: tuple) -> dict:
    a, b = pair
    merged = a + b
    out = {}
    for syms, n in vocab.items():
        i, new = 0, []
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                new.append(merged)
                i += 2
            else:
                new.append(syms[i])
                i += 1
        out[tuple(new)] = out.get(tuple(new), 0) + n
    return out


def bpe_train(df: DataFrame, num_merges: int = 200,
              text_col: str = "text", id_col: str = "doc_id",
              sample_cap: int = 4096, lower: bool = True) -> list[tuple[str, str]]:
    """Train a BPE merge table on a deterministic md5-ordered corpus
    sample: returns ``[(left, right), ...]`` in merge-rank order.

    The sample is a HASH sample, not ``limit()`` (a limit takes the first
    scanned file — at 100 TB a biased slice; the hash order is uniform
    and rerun-stable, the `_kmeans_centroids` lesson).  Ties in pair
    counts break lexicographically, so the table is bit-reproducible."""
    if num_merges <= 0:
        raise ValueError("num_merges must be positive")
    rows = (df.select(F.col(text_col),
                      F.md5(F.col(id_col).cast("string")).alias("__h"))
              .orderBy("__h")
              .limit(sample_cap)
              .select(text_col)
              .collect())
    words: Counter = Counter()
    for r in rows:
        t = r[0] or ""
        if lower:
            t = t.lower()
        words.update(t.split())
    vocab = {_word_symbols(w): n for w, n in words.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        # deterministic argmax: highest count, then lexicographic pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = _merge_vocab(vocab, best)
    return merges


def encode_word(word: str, ranks: dict) -> list[str]:
    """Encode one word with a merge-rank dict {(a, b): rank} — always the
    lowest-rank applicable merge first (the standard BPE inference rule)."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i: best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text", id_col: str = "doc_id",
               lower: bool = True) -> DataFrame:
    """Distributed BPE encoding: ``(doc_id, n_words, n_bpe_tokens,
    fertility_x100)`` with ``fertility_x100 = n_bpe_tokens * 100 div
    n_words`` (BPE tokens per whitespace word — THE tokenizer-budget
    signal; 0 for empty docs).

    One Arrow-batched ``mapInPandas``-free ``pandas_udf`` projection with
    the merge table in the closure and a per-batch word cache (Zipf: most
    words repeat, so each distinct word is encoded once per batch) —
    map-only, zero shuffles, scales linearly with splits."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @F.pandas_udf("array<long>")
    def counts(s: pd.Series) -> pd.Series:
        cache: dict = {}

        def enc_len(w: str) -> int:
            n = cache.get(w)
            if n is None:
                n = len(encode_word(w, ranks))
                cache[w] = n
            return n

        out = []
        for t in s:
            ws = ((t or "").lower() if lower else (t or "")).split()
            out.append([len(ws), sum(enc_len(w) for w in ws)])
        return pd.Series(out)

    out = df.select(F.col(id_col), counts(F.col(text_col)).alias("__c"))
    return (out.select(id_col,
                       F.col("__c")[0].alias("n_words"),
                       F.col("__c")[1].alias("n_bpe_tokens"))
               .withColumn("fertility_x100",
                           F.when(F.col("n_words") == 0, F.lit(0).cast("long"))
                            .otherwise(F.expr(
                                "n_bpe_tokens * 100 div n_words"))))
