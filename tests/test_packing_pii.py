"""Sequence packing (chunk_corpus) and PII redaction (redact_pii)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cascading_flink_spark.extensions import chunk_corpus, redact_pii


def test_chunk_corpus_is_a_packing(spark, sf_dir):
    """Offsets must tile the corpus exactly: sorted starts are the exclusive
    running sum of token counts, and chunk spans follow from the offsets."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = chunk_corpus(docs, context_len=512).collect()
    rows = sorted(out, key=lambda r: r["start_offset"])
    expect_start = 0
    for r in rows:
        assert r["start_offset"] == expect_start
        assert r["first_chunk"] == r["start_offset"] // 512
        assert r["last_chunk"] == (r["start_offset"] + r["n_tokens"] - 1) // 512
        expect_start += r["n_tokens"]
    total = sum(r["n_tokens"] for r in rows)
    assert expect_start == total and total > 0


def test_chunk_corpus_deterministic_and_no_global_window(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {(r["doc_id"], r["start_offset"])
         for r in chunk_corpus(docs, 2048).collect()}
    b = {(r["doc_id"], r["start_offset"])
         for r in chunk_corpus(docs.repartition(7), 2048).collect()}
    assert a == b, "offsets must not depend on physical partitioning"
    # the doc-level window must be bucket-partitioned, not global: a global
    # window shows as 'Window [...]' with an empty partition spec over the
    # full input; assert the plan partitions by the bucket column
    plan = chunk_corpus(docs, 2048)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "windowspecdefinition(__b" in plan or \
        "windowspecdefinition('__b" in plan, plan[:2000]


def test_chunk_corpus_rejects_bad_context():
    with pytest.raises(ValueError):
        chunk_corpus(None, 0)


def test_redact_pii_synthetic(spark):
    df = spark.createDataFrame(
        [(1, "mail me at a.b+c@ex-ample.org or root@h.io thanks"),
         (2, "server 10.0.254.3 and 192.168.1.1 up"),
         (3, "ssn 123-45-6789 leaked"),
         (4, "clean text only"),
         (5, "mixed bob@x.co on 127.0.0.1 ssn 000-12-3456")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["n_email"] == 2 and out[1]["clean_text"] == \
        "mail me at <EMAIL> or <EMAIL> thanks"
    assert out[2]["n_ipv4"] == 2 and out[2]["clean_text"] == \
        "server <IP> and <IP> up"
    assert out[3]["n_ssn"] == 1 and out[3]["clean_text"] == "ssn <SSN> leaked"
    assert out[4]["clean_text"] == "clean text only" and \
        out[4]["n_email"] == out[4]["n_ipv4"] == out[4]["n_ssn"] == 0
    assert out[5]["clean_text"] == "mixed <EMAIL> on <IP> ssn <SSN>"


def test_redact_pii_counts_are_longs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sch = dict(redact_pii(docs).dtypes)
    assert sch["n_email"] == sch["n_ipv4"] == sch["n_ssn"] == "bigint"


def test_winnow_guarantee_shared_run(spark):
    """Winnowing's core property: any shared token run of length
    >= w + k - 1 (= 7 here) yields at least one shared fingerprint."""
    from cascading_flink_spark.extensions import winnow_fingerprints
    shared_run = "lorem ipsum dolor sit amet consectetur adipiscing"  # 7 toks
    df = spark.createDataFrame(
        [(1, f"unique one two three {shared_run} four five six seven"),
         (2, f"{shared_run} totally different tail content here now ok")],
        "doc_id long, text string")
    fp = winnow_fingerprints(df, k=4, w=4)
    a = {r["fp"] for r in fp.filter("id = 1").collect()}
    b = {r["fp"] for r in fp.filter("id = 2").collect()}
    assert a & b, "shared 7-token run must share a fingerprint"


def test_winnow_max_df_drops_boilerplate(spark):
    from cascading_flink_spark.extensions import winnow_pairs
    boiler = "this header is on every single page of the site"
    rows = [(i, f"{boiler} unique body number {i} with words {i*7} {i*13}")
            for i in range(1, 21)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # boilerplate fingerprints appear in 20 docs; max_df=5 must drop them,
    # leaving no pair above threshold
    assert winnow_pairs(df, k=4, w=4, threshold=0.5, max_df=5).count() == 0
    # with a permissive cap the boilerplate dominates and pairs appear
    assert winnow_pairs(df, k=4, w=4, threshold=0.5, max_df=50).count() > 0


def test_winnow_positions_valid(spark, sf_dir):
    from cascading_flink_spark.extensions import winnow_fingerprints
    from pyspark.sql import functions as F
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp = winnow_fingerprints(docs, k=4, w=4)
    bad = fp.filter((F.col("pos") < 0) | F.col("fp").rlike("[^0-9a-f]")).count()
    assert bad == 0 and fp.count() > 0


def test_strip_boilerplate_removes_whole_run(spark):
    from cascading_flink_spark.extensions import strip_boilerplate
    boiler = "this header is on every single page of the site"
    rows = [(i, f"{boiler} unique body number {i} with words w{i*7} w{i*13}")
            for i in range(1, 21)]
    rows.append((99, "totally clean document with no boilerplate at all here"))
    rows.append((100, ""))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in strip_boilerplate(df, k=4, max_df=10).collect()}
    # the full 9-token repeated run is gone (plus the shared lead-in words
    # whose grams are also identical in every doc)
    assert boiler not in out[1]["clean_text"]
    assert "w7" in out[1]["clean_text"] and "w13" in out[1]["clean_text"]
    assert out[1]["n_dropped"] > 0
    # untouched docs come through verbatim (normalized) with zero drops
    assert out[99]["n_dropped"] == 0
    assert out[99]["clean_text"].startswith("totally clean document")
    # empty docs survive with empty output
    assert out[100]["clean_text"] == "" and out[100]["n_tokens"] == 0


def test_strip_boilerplate_token_accounting(spark, sf_dir):
    from cascading_flink_spark.extensions import strip_boilerplate
    from pyspark.sql import functions as F
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = strip_boilerplate(docs, k=4, max_df=3)
    assert out.count() == docs.count()
    bad = out.filter((F.col("n_tokens") < 0) | (F.col("n_dropped") < 0)).count()
    assert bad == 0


def _py_chunks(text, context_len, stride):
    toks = text.strip().split()
    if not toks:
        return []
    n = len(toks)
    num = (1 if n <= context_len
           else min(1 + -(-(n - context_len) // stride),
                    1 + (n - 1) // stride))
    out = []
    for j in range(num):
        c = toks[j * stride: j * stride + context_len]
        out.append((j, len(c), " ".join(c)))
    return out


@pytest.mark.parametrize("context_len,stride", [(32, 24), (16, 16), (8, 12)])
def test_overlap_chunks_matches_python_model(spark, sf_dir, context_len, stride):
    """Overlap (stride<ctx), disjoint (stride==ctx) and gapped (stride>ctx)
    walks all match the per-document Python model."""
    from cascading_flink_spark.extensions import overlap_chunks
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60).cache()
    got = {}
    for r in overlap_chunks(docs, context_len, stride).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_tokens"], r["chunk_text"]))
    for r in docs.collect():
        expect = _py_chunks(r["text"], context_len, stride)
        have = sorted(got.get(r["doc_id"], []))
        assert have == expect, f"doc {r['doc_id']}"


def test_overlap_chunks_gapped_no_empty_chunks(spark):
    """stride > context_len (n=21, ctx=8, stride=12): the uncapped chunk
    count emitted a trailing j=2 chunk with zero tokens and empty text;
    every emitted chunk must carry at least one token."""
    from cascading_flink_spark.extensions import overlap_chunks
    df = spark.createDataFrame([(1, " ".join(f"w{k}" for k in range(21)))],
                               "doc_id long, text string")
    rows = sorted(overlap_chunks(df, 8, 12).collect(),
                  key=lambda r: r["chunk_id"])
    assert [(r["chunk_id"], r["chunk_tokens"]) for r in rows] == \
        [(0, 8), (1, 8)]
    assert all(r["chunk_tokens"] > 0 for r in rows)


def test_overlap_chunks_zero_shuffle_plan(spark, sf_dir):
    """The chunk walk is map-only: no Exchange, no Python eval in the plan."""
    from cascading_flink_spark.extensions import overlap_chunks
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = overlap_chunks(docs, 32, 24)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    assert "EvalPython" not in plan, plan[:2000]


def test_overlap_chunks_drops_empty_and_validates(spark):
    from cascading_flink_spark.extensions import overlap_chunks
    df = spark.createDataFrame([(1, "  "), (2, "a b c")], "doc_id long, text string")
    rows = overlap_chunks(df, 2, 1).collect()
    assert {r["doc_id"] for r in rows} == {2}
    assert [(r["chunk_id"], r["chunk_text"]) for r in sorted(rows, key=lambda r: r["chunk_id"])] == \
        [(0, "a b"), (1, "b c")]
    with pytest.raises(ValueError):
        overlap_chunks(df, 0, 1)
    with pytest.raises(ValueError):
        overlap_chunks(df, 2, 0)


# ------------------------------------------------------------ pack_bins

def test_pack_bins_invariants(spark, sf_dir):
    from cascading_flink_spark.extensions import pack_bins
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = pack_bins(docs, capacity=128).collect()
    assert rows
    by_bin = {}
    for r in rows:
        by_bin.setdefault(r.bin, []).append(r)
    # bins are contiguous 0..max
    assert sorted(by_bin) == list(range(len(by_bin)))
    for members in by_bin.values():
        members.sort(key=lambda r: r.offset_in_bin)
        off = 0
        for r in members:
            assert r.offset_in_bin == off  # docs are packed back-to-back
            off += r.n_tokens
        # a bin only exceeds capacity when a single oversized doc owns it
        if off > 128:
            assert len(members) == 1 and members[0].offset_in_bin == 0


def test_pack_bins_deterministic_under_partitioning(spark, sf_dir):
    from cascading_flink_spark.extensions import pack_bins
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(map(tuple, pack_bins(docs, 512).collect()))
    b = sorted(map(tuple, pack_bins(docs.repartition(17), 512).collect()))
    assert a == b


def test_pack_bins_oversized_doc_gets_own_bin(spark):
    from cascading_flink_spark.extensions import pack_bins
    docs = spark.createDataFrame(
        [(1, "w " * 50), (2, "x " * 7), (3, "y " * 6)],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in pack_bins(docs, capacity=10).collect()}
    big = rows[1]
    assert big.offset_in_bin == 0 and big.n_tokens == 50
    # nothing shares the oversized doc's bin
    assert all(r.bin != big.bin for i, r in rows.items() if i != 1)


def test_pack_bins_validates_capacity(spark):
    from cascading_flink_spark.extensions import pack_bins
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pack_bins(docs, capacity=0)


def test_pack_bins_bfd_pinned_against_python_model(spark, sf_dir):
    """strategy='bfd' has no SQL oracle (per-bin state recursion) — pin
    it against an independent Python replay of the documented rule."""
    import hashlib
    from bisect import bisect_left, insort

    from cascading_flink_spark.extensions import pack_bins
    from cascading_flink_spark.extensions.text import token_count as _tc
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cap = 256
    got = {r.doc_id: (r.n_tokens, r.bin, r.offset_in_bin)
           for r in pack_bins(docs, cap, strategy="bfd").collect()}

    toks = {r.doc_id: r.n for r in
            docs.select("doc_id", _tc(F.col("text")).alias("n")).collect()}
    per_bucket: dict = {}
    for i, n in toks.items():
        if n > 0:
            h = hashlib.md5(str(i).encode()).hexdigest()
            per_bucket.setdefault(h[:2], []).append((h, i, n))
    model, base = {}, 0
    for b in sorted(per_bucket):
        rows = sorted(per_bucket[b])                      # (md5, id) order
        rows.sort(key=lambda t: -t[2])                    # stable desc
        fills, open_bins = [], []
        for _, i, n in rows:
            j = bisect_left(open_bins, (n, -1))
            if j < len(open_bins):
                rem, k = open_bins.pop(j)
                model[i] = (n, base + k, fills[k])
                fills[k] += n
                if rem - n > 0:
                    insort(open_bins, (rem - n, k))
            else:
                k = len(fills)
                model[i] = (n, base + k, 0)
                fills.append(n)
                if cap - n > 0:
                    insort(open_bins, (cap - n, k))
        base += len(fills)
    assert got == model and got


def test_pack_bins_bfd_packs_no_worse_than_nextfit(spark, sf_dir):
    from cascading_flink_spark.extensions import pack_bins
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_nf = pack_bins(docs, 256).agg(F.max("bin")).collect()[0][0]
    n_bfd = pack_bins(docs, 256, strategy="bfd") \
        .agg(F.max("bin")).collect()[0][0]
    assert n_bfd <= n_nf


def test_pack_bins_rejects_unknown_strategy(spark):
    from cascading_flink_spark.extensions import pack_bins
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pack_bins(docs, 10, strategy="ffd")
