"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design notes (the 100 TB story):

* **exact**: one hash-shuffle on the fingerprint — the cheapest possible
  plan; fingerprints are md5 so the shuffle key is uniformly distributed
  (no skew).
* **n-gram Jaccard**: exact pairwise similarity via shingle inverted index
  (explode -> self-join on shingle).  Quadratic in the worst case; the
  ``max_shingle_freq`` guard drops ultra-common shingles (stopword shingles
  would otherwise create a join hot-spot = skew), which is the standard
  inverted-index pruning.
* **MinHash+LSH**: the scale path — signatures are fixed-size (k hashes)
  regardless of document length; banding turns all-pairs into
  equality-joins on band keys.  Only candidate pairs sharing a band are
  compared, so the shuffle volume is O(docs × bands), not O(docs²).
* **SimHash**: 64-bit signature; near-dup = Hamming distance <= k.  Banding
  on 16-bit chunks (pigeonhole: distance<=3 pairs share at least one of 4
  chunks) again avoids all-pairs.

All operators are pure DataFrame transformations (xxhash64 for speed where
cross-engine reproducibility is not required; md5 where it is).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import fingerprint


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative of each exact-content group.

    Returns (keep_id, n_dups) per distinct content — one hash aggregation
    on the md5 fingerprint."""
    fp = fingerprint(df, text_col, id_col)
    return (fp.groupBy("fp")
              .agg(F.min(id_col).alias("keep_id"),
                   F.count(F.lit(1)).alias("n_dups"))
              .select("keep_id", "n_dups"))


def exact_dedup_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """(kept_id, dup_id) pairs for exact duplicates (dup_id removed)."""
    fp = fingerprint(df, text_col, id_col)
    w = Window.partitionBy("fp")
    return (fp.withColumn("keep_id", F.min(id_col).over(w))
              .filter(F.col(id_col) != F.col("keep_id"))
              .select(F.col("keep_id"), F.col(id_col).alias("dup_id")))


def _word_shingles(text_col: str, n: int):
    """Distinct word n-gram shingles of lower-cased text, as an array."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.array_distinct(F.filter(sh, lambda s: F.length(s) > 0))


def ngram_jaccard_pairs(df: DataFrame, n: int = 3, threshold: float = 0.5,
                        text_col: str = "text", id_col: str = "doc_id",
                        max_shingle_freq: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via shingle inverted index.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    ``max_shingle_freq`` drops shingles appearing in more than that many
    docs (hot-key/skew guard for the self-join at scale)."""
    shingled = df.select(F.col(id_col).alias("id"),
                         _word_shingles(text_col, n).alias("sh"))
    sizes = shingled.select("id", F.size("sh").alias("n_sh"))
    inv = shingled.select("id", F.explode("sh").alias("shingle"))
    if max_shingle_freq is not None:
        freq = inv.groupBy("shingle").agg(F.count(F.lit(1)).alias("f"))
        inv = (inv.join(F.broadcast(freq.filter(F.col("f") <= max_shingle_freq)),
                        "shingle", "inner")
                  .select("id", "shingle"))
    a = inv.toDF("id_a", "shingle")
    b = inv.toDF("id_b", "shingle")
    common = (a.join(b, "shingle")
               .filter(F.col("id_a") < F.col("id_b"))
               .groupBy("id_a", "id_b")
               .agg(F.count(F.lit(1)).alias("n_common")))
    sa = sizes.toDF("id_a", "n_a")
    sb = sizes.toDF("id_b", "n_b")
    return (common.join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard",
                        F.round(F.col("n_common") /
                                (F.col("n_a") + F.col("n_b") - F.col("n_common")), 4))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def minhash_lsh_pairs(df: DataFrame, n: int = 3, num_hashes: int = 32,
                      bands: int = 8, threshold: float = 0.5,
                      text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """MinHash + LSH banding candidate generation, verified by signature
    similarity.

    Signature: per seed i in [0, num_hashes), min(xxhash64(shingle, i)).
    Banding: num_hashes/bands rows per band; docs sharing any band hash
    become candidates (equality join on (band_idx, band_hash) — shuffle
    volume O(docs x bands)).  Candidates are scored by signature agreement
    (estimated Jaccard) and filtered at ``threshold``.

    Returns (id_a, id_b, est_jaccard).  Deterministic (seeded hashes), but
    engine-specific (xxhash64) — correctness gate uses the rows-only check.
    """
    rows_per_band = num_hashes // bands
    if rows_per_band * bands != num_hashes:
        raise ValueError("num_hashes must be divisible by bands")
    shingled = df.select(F.col(id_col).alias("id"),
                         _word_shingles(text_col, n).alias("sh")) \
                 .filter(F.size("sh") > 0)
    sig = shingled.select(
        "id",
        F.array(*[
            F.array_min(F.transform("sh", lambda s: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]).alias("sig"))
    banded = sig.select(
        "id", "sig",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.xxhash64(*[F.col("sig")[b * rows_per_band + r]
                                  for r in range(rows_per_band)]).alias("bh"))
            for b in range(bands)
        ])).alias("bk"))
    banded = banded.select("id", "sig", F.col("bk.band").alias("band"),
                           F.col("bk.bh").alias("bh"))
    a = banded.toDF("id_a", "sig_a", "band", "bh")
    b = banded.toDF("id_b", "sig_b", "band", "bh")
    cand = (a.join(b, ["band", "bh"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "sig_a", "sig_b")
             .dropDuplicates(["id_a", "id_b"]))
    agree = F.size(F.filter(F.zip_with("sig_a", "sig_b",
                                       lambda x, y: x == y), lambda v: v))
    return (cand.withColumn("est_jaccard", F.round(agree / F.lit(num_hashes), 4))
                .filter(F.col("est_jaccard") >= threshold)
                .select("id_a", "id_b", "est_jaccard"))


def simhash_bits(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash of the token set.

    For each bit position, sum +1/-1 over token-hash bits; bit set iff the
    sum is positive.  Pure bitwise Column algebra — no UDF."""
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    bit_votes = [
        F.aggregate(hashes, F.lit(0),
                    lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(1 << i) if i < 63
                                                             else F.lit(-9223372036854775808)) != 0,
                                                1).otherwise(-1))
        for i in range(64)
    ]
    sim = F.lit(0).cast("long")
    for i, v in enumerate(bit_votes):
        bit = F.when(v > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = sim.bitwiseOR(F.shiftleft(bit, i))
    return df.select(F.col(id_col).alias("id"), sim.alias("simhash"))


def simhash_dup_pairs(df: DataFrame, max_hamming: int = 3,
                      text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs with Hamming(simhash_a, simhash_b) <= max_hamming.

    Pigeonhole banding: split the 64-bit signature into 4 x 16-bit chunks;
    any pair within distance 3 agrees on >= 1 chunk, so candidates come from
    equality joins on (chunk_idx, chunk_value) — no all-pairs shuffle."""
    sims = simhash_bits(df, text_col, id_col)
    chunks = sims.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"),
                     F.shiftrightunsigned("simhash", c * 16)
                      .bitwiseAND(F.lit(0xFFFF)).alias("cv"))
            for c in range(4)
        ])).alias("ck"))
    chunks = chunks.select("id", "simhash", F.col("ck.chunk").alias("chunk"),
                           F.col("ck.cv").alias("cv"))
    a = chunks.toDF("id_a", "sh_a", "chunk", "cv")
    b = chunks.toDF("id_b", "sh_b", "chunk", "cv")
    cand = (a.join(b, ["chunk", "cv"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "sh_a", "sh_b")
             .dropDuplicates(["id_a", "id_b"]))
    dist = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.withColumn("hamming", dist)
                .filter(F.col("hamming") <= max_hamming)
                .select("id_a", "id_b", "hamming"))
