"""Multimodal plumbing: canonical schema lift, 1:1 decode, and the
row-exploding frame-sample stage (decode stubbed — no media libs in this
container; batch shapes/schema/projection are the real thing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cascading_flink_spark.extensions import (
    attach_binary_meta, decode_stub_features, frame_sample,
)


def _media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    return attach_binary_meta(
        docs.select("doc_id", F.col("text").cast("binary").alias("payload")),
        bytes_col="payload", id_col="doc_id", modality="video")


def test_frame_sample_explodes_rows(spark, sf_dir):
    media = _media(spark, sf_dir)
    n_media = media.count()
    frames = frame_sample(media, n_frames=4, frame_interval_ms=500)
    rows = frames.collect()
    assert len(rows) == n_media * 4
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, fr in by_media.items():
        assert sorted(r["frame_idx"] for r in fr) == [0, 1, 2, 3]
        assert sorted(r["ts_ms"] for r in fr) == [0, 500, 1000, 1500]
        assert all(len(r["feature"]) == 8 for r in fr)
        # features are per-frame (byte-window) — frames of one video differ
        assert len({tuple(r["feature"]) for r in fr}) > 1


def test_frame_sample_projects_payload_away(spark, sf_dir):
    frames = frame_sample(_media(spark, sf_dir), n_frames=2)
    assert "payload" not in frames.columns
    assert frames.schema["feature"].dataType.simpleString() == "array<float>"


def test_frame_sample_deterministic(spark, sf_dir):
    a = {(r["media_id"], r["frame_idx"], tuple(r["feature"]))
         for r in frame_sample(_media(spark, sf_dir)).collect()}
    b = {(r["media_id"], r["frame_idx"], tuple(r["feature"]))
         for r in frame_sample(_media(spark, sf_dir).repartition(5)).collect()}
    assert a == b


def test_decode_features_normalized(spark, sf_dir):
    feats = decode_stub_features(_media(spark, sf_dir)).collect()
    for r in feats:
        assert abs(sum(r["feature"]) - 1.0) < 1e-3
        assert r["n_bytes"] > 0


# ------------------------------------------------------------- real decode

def _wav_bytes(rate=8000, channels=1, n_frames=1600, sampwidth=2):
    """A real PCM WAV built with the stdlib: 200 Hz square-ish wave."""
    import io
    import struct
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        frames = b"".join(
            struct.pack("<" + "h" * channels,
                        *([12000 if (i // 20) % 2 == 0 else -12000]
                          * channels))
            for i in range(n_frames))
        w.writeframes(frames)
    return buf.getvalue()


def test_decode_media_real_wav(spark):
    """REAL audio decode via the stdlib wave module: exact duration /
    sample-rate / channel metadata and a non-trivial RMS envelope."""
    from cascading_flink_spark.extensions import decode_media
    df = spark.createDataFrame(
        [(1, _wav_bytes(rate=8000, n_frames=1600)),
         (2, _wav_bytes(rate=16000, channels=2, n_frames=8000))],
        "media_id long, payload binary")
    media = (df.selectExpr("media_id", "'audio' AS modality",
                           "'audio/wav' AS mime", "payload",
                           "map() AS meta"))
    out = {r["media_id"]: r for r in decode_media(media).collect()}
    assert out[1]["decoder"] == "wav"
    assert out[1]["duration_ms"] == 200          # 1600 / 8000 s
    assert out[1]["sample_rate"] == 8000 and out[1]["channels"] == 1
    assert out[2]["duration_ms"] == 500          # 8000 / 16000 s
    assert out[2]["sample_rate"] == 16000 and out[2]["channels"] == 2
    # RMS of a +/-12000 square wave at int16 scale ~ 12000/32768
    for mid in (1, 2):
        feats = out[mid]["feature"]
        assert len(feats) == 8
        assert all(0.3 < f < 0.45 for f in feats), feats
    assert out[1]["width"] is None               # image meta stays NULL


def test_decode_media_stub_fallback_parity(spark):
    """A payload no real decoder accepts falls back to the byte-histogram
    stub — same features as decode_stub_features, flagged 'stub'."""
    from cascading_flink_spark.extensions import decode_media
    payload = b"not media, just bytes" * 10
    media = spark.createDataFrame(
        [(7, "audio", "application/octet-stream", payload, {})],
        schema="media_id long, modality string, mime string, "
               "payload binary, meta map<string,string>")
    row = decode_media(media).collect()[0]
    assert row["decoder"] == "stub"
    assert row["duration_ms"] is None
    from cascading_flink_spark.extensions.multimodal import _stub_decode
    expect = _stub_decode(payload, 8)
    assert [round(f, 6) for f in row["feature"]] == expect


def test_decode_media_real_image_with_pil(spark):
    """Runs only where PIL is installed (skip-marked otherwise): true
    width/height from a real PNG decode."""
    import pytest
    from cascading_flink_spark.extensions.multimodal import _HAS_PIL
    if not _HAS_PIL:
        pytest.skip("PIL not installed in this environment")
    import io
    from PIL import Image
    buf = io.BytesIO()
    Image.new("RGB", (37, 21), (200, 10, 10)).save(buf, format="PNG")
    from cascading_flink_spark.extensions import decode_media
    media = spark.createDataFrame(
        [(5, "image", "image/png", buf.getvalue(), {})],
        schema="media_id long, modality string, mime string, "
               "payload binary, meta map<string,string>")
    row = decode_media(media).collect()[0]
    assert row["decoder"] == "pil"
    assert (row["width"], row["height"]) == (37, 21)
    assert abs(sum(row["feature"]) - 1.0) < 1e-3


def test_decode_wav_8bit_unsigned_silence_is_zero_energy():
    """8-bit WAV PCM is UNSIGNED (silence = 0x80): a silent clip must
    produce a ~zero RMS envelope, and a full-scale square wave ~1.0 —
    the signed-int8 misread would report 1.0 for silence."""
    import io
    import wave

    from cascading_flink_spark.extensions.multimodal import _decode_wav_real

    def wav8(samples):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(1)
            w.setframerate(8000)
            w.writeframes(bytes(samples))
        return buf.getvalue()

    meta, silent, kind = _decode_wav_real(wav8([128] * 800), dim=4)
    assert kind == "wav" and meta["sample_rate"] == 8000
    assert all(v == 0.0 for v in silent)
    _, loud, _ = _decode_wav_real(wav8([0, 255] * 400), dim=4)
    assert all(v > 0.9 for v in loud)


def test_image_dhash_known_value_and_decoder_tiers(spark):
    from cascading_flink_spark.extensions.multimodal import image_dhash

    # raw tier: 72-byte strictly-increasing raster -> every right
    # neighbour is larger -> ALL 64 bits set -> two's complement -1
    ramp = bytes(range(72))
    # raw tier: strictly-decreasing raster -> no bit set -> 0
    fall = bytes(reversed(range(72)))
    # stub tier: wrong length payload still hashes deterministically
    blob = b"not-a-raster" * 5
    media = spark.createDataFrame(
        [(1, "image", ramp), (2, "image", fall), (3, "image", blob),
         (4, "image", None)],
        "media_id long, modality string, payload binary")
    rows = {r["media_id"]: r for r in image_dhash(media).collect()}
    assert rows[1]["dhash"] == -1 and rows[1]["decoder"] == "raw"
    assert rows[2]["dhash"] == 0 and rows[2]["decoder"] == "raw"
    assert rows[3]["decoder"] == "stub"
    assert rows[4]["dhash"] == 0 and rows[4]["decoder"] == "stub"


def test_image_dups_exact_pairs_and_guards(spark):
    import pytest as _pytest

    from cascading_flink_spark.extensions.multimodal import image_dups

    base = list(range(0, 144, 2))                      # 72 cells
    near = list(base)
    near[10] += 3                                      # flips <= 2 dHash bits
    far = [255 if c % 2 else 0 for c in range(72)]     # unrelated image
    # (NOT another monotone gradient: dHash correctly sees all smooth
    # gradients as near-identical; alternation flips ~half the bits)
    media = spark.createDataFrame(
        [(1, "image", bytes(base)), (2, "image", bytes(near)),
         (3, "image", bytes(far))],
        "media_id long, modality string, payload binary")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in image_dups(media, max_hamming=4).collect()}
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] <= 2
    with _pytest.raises(ValueError):
        image_dups(media, max_hamming=8, bands=8)      # pigeonhole broken
    with _pytest.raises(ValueError):
        image_dups(media, bands=7)                     # 7 does not divide 64


def test_image_dups_plan_no_cartesian(spark, sf_dir):
    import __spark_entry__ as entry
    df = entry.queries()["image_dups"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def _wav_pcm_bytes(samples, sampwidth=1, rate=8000):
    import io
    import struct
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        if sampwidth == 1:
            w.writeframes(bytes(samples))
        else:
            w.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def test_audio_envelope_hash_tiers_and_known_values(spark):
    from cascading_flink_spark.extensions.multimodal import (
        audio_envelope_hash,
    )

    # rising staircase: every window mean < the next -> all 64 bits -> -1
    rise = bytes(min(255, i) for i in range(260))
    fall = bytes(reversed(rise))
    # 16-bit WAV of the same staircase must hash identically to the raw
    # 8-bit tier: (s + 32768) >> 8 recentres each sample to the same
    # 0..255 value when s = (v - 128) << 8
    wav16 = _wav_pcm_bytes([(min(255, i) - 128) << 8 for i in range(260)],
                       sampwidth=2)
    short = bytes(range(10))                           # < 65 samples -> 0
    media = spark.createDataFrame(
        [(1, "audio", rise), (2, "audio", fall), (3, "audio", wav16),
         (4, "audio", short), (5, "audio", None)],
        "media_id long, modality string, payload binary")
    rows = {r["media_id"]: r for r in audio_envelope_hash(media).collect()}
    assert rows[1]["ahash"] == -1 and rows[1]["decoder"] == "rawpcm"
    assert rows[2]["ahash"] == 0
    assert rows[3]["ahash"] == -1 and rows[3]["decoder"] == "wav"
    assert rows[4]["ahash"] == 0 and rows[4]["decoder"] == "rawpcm"
    assert rows[5]["ahash"] == 0 and rows[5]["decoder"] == "stub"


def test_audio_dups_exact_pairs(spark):
    from cascading_flink_spark.extensions.multimodal import audio_dups

    base = [((i * 13) % 251) for i in range(260)]
    near = list(base)
    for i in range(40, 44):                            # bump one window
        near[i] = min(255, near[i] + 25)
    far = [255 if (i // 4) % 2 else 0 for i in range(260)]
    media = spark.createDataFrame(
        [(1, "audio", bytes(base)), (2, "audio", bytes(near)),
         (3, "audio", bytes(far))],
        "media_id long, modality string, payload binary")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in audio_dups(media, max_hamming=4).collect()}
    assert set(pairs) == {(1, 2)} and pairs[(1, 2)] <= 4


def test_hamming_pairs_band_rows_identical_results(spark):
    """band_rows trades candidate pruning for key cardinality but NEVER
    changes the result (pigeonhole: <= max_hamming errors touch <=
    max_hamming sub-bands, so any band_rows <= bands - max_hamming combo
    set still contains a clean key per qualifying pair)."""
    import random

    import pytest as _pytest

    from cascading_flink_spark.extensions.multimodal import (
        hamming_pairs, image_dhash,
    )
    random.seed(2)
    rows = []
    for g in range(8):
        base = [random.randrange(256) for _ in range(72)]
        for j in range(5):
            r = list(base)
            r[random.randrange(72)] = random.randrange(256)
            rows.append((g * 10 + j, "image", bytes(r)))
    df = spark.createDataFrame(
        rows, "media_id long, modality string, payload binary")
    h = image_dhash(df)
    sets = [
        {(r["id_a"], r["id_b"], r["hamming"])
         for r in hamming_pairs(h, "dhash", max_hamming=4,
                                band_rows=br).collect()}
        for br in (1, 2, 4)]
    assert sets[0] and sets[0] == sets[1] == sets[2]
    with _pytest.raises(ValueError):
        hamming_pairs(h, "dhash", max_hamming=4, band_rows=5)


def test_video_frame_hashes_raw_tier_and_stub(spark):
    from cascading_flink_spark.extensions.multimodal import (
        video_frame_hashes,
    )
    ramp = bytes(range(72))
    fall = bytes(reversed(range(72)))
    vid = ramp + fall + ramp                            # 3 raw frames
    blob = b"not frames" * 11                           # stub tier
    media = spark.createDataFrame(
        [(1, "video", vid), (2, "video", blob), (3, "video", None)],
        "media_id long, modality string, payload binary")
    rows = video_frame_hashes(media).collect()
    by = {}
    for r in rows:
        by.setdefault(r["media_id"], {})[r["frame_idx"]] = r
    assert len(by[1]) == 3 and by[1][0]["decoder"] == "raw"
    assert by[1][0]["dhash"] == -1                      # rising frame
    assert by[1][1]["dhash"] == 0                       # falling frame
    assert by[1][2]["dhash"] == -1
    assert len(by[2]) == 4 and by[2][0]["decoder"] == "stub"
    assert len(by[3]) == 1 and by[3][0]["dhash"] == 0


def test_video_dups_frame_aligned_pairs(spark):
    from cascading_flink_spark.extensions.multimodal import video_dups
    import random
    random.seed(3)
    f0 = [random.randrange(256) for _ in range(72)]
    f1 = [random.randrange(256) for _ in range(72)]
    f2 = [random.randrange(256) for _ in range(72)]
    alt = [255 if i % 2 else 0 for i in range(72)]
    near1 = list(f1); near1[30] = (near1[30] + 60) % 256
    inv = [0 if i % 2 else 255 for i in range(72)]      # ~inverse of alt
    v1 = bytes(f0 + f1 + f2)
    v2 = bytes(f0 + near1 + f2)        # 3 close frames -> dup
    v3 = bytes(f0 + alt + alt)         # shares only frame 0 with v1/v2
    v4 = bytes(inv + inv + inv)        # nothing close to anything
    media = spark.createDataFrame(
        [(1, "video", v1), (2, "video", v2), (3, "video", v3),
         (4, "video", v4)],
        "media_id long, modality string, payload binary")
    got = {(r["id_a"], r["id_b"]): r["n_close_frames"]
           for r in video_dups(media, max_hamming=4,
                               min_frames=2).collect()}
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] == 3
    # min_frames=1 admits the single-shared-frame pairs too
    got1 = {(r["id_a"], r["id_b"]) for r in
            video_dups(media, max_hamming=4, min_frames=1).collect()}
    assert (1, 3) in got1 and (2, 3) in got1 and (3, 4) not in got1


# ----------------------------------------------------------------- resize

def test_resize_raw_nearest_neighbour_exact(spark):
    """Raw tier: 4x2 grayscale raster -> 2x2 via the floor index map
    src = (dst * in_dim) // out_dim; expected bytes computed by hand."""
    from cascading_flink_spark.extensions import resize_images
    # row-major 4 wide x 2 high: rows [10,20,30,40], [50,60,70,80]
    payload = bytes([10, 20, 30, 40, 50, 60, 70, 80])
    media = attach_binary_meta(
        spark.createDataFrame([(1, payload)], "doc_id long, payload binary"),
        bytes_col="payload", id_col="doc_id", modality="image")
    out = resize_images(media, out_width=2, out_height=2,
                        raw_width=4, raw_height=2).collect()[0]
    # cols: (0*4)//2=0, (1*4)//2=2 ; rows: (0*2)//2=0, (1*2)//2=1
    assert out["decoder"] == "raw"
    assert (out["in_width"], out["in_height"]) == (4, 2)
    assert (out["out_width"], out["out_height"]) == (2, 2)
    assert (out["n_bytes_in"], out["n_bytes_out"]) == (8, 4)
    assert bytes(out["payload"]) == bytes([10, 30, 50, 70])


def test_resize_identity_when_dims_match(spark):
    from cascading_flink_spark.extensions import resize_images
    payload = bytes(range(12))
    media = attach_binary_meta(
        spark.createDataFrame([(7, payload)], "doc_id long, payload binary"),
        bytes_col="payload", id_col="doc_id", modality="image")
    out = resize_images(media, out_width=4, out_height=3,
                        raw_width=4, raw_height=3).collect()[0]
    assert out["decoder"] == "raw"
    assert bytes(out["payload"]) == payload


def test_resize_stub_and_empty_tiers_never_raise(spark):
    """Wrong-length payloads stride-resample; NULL/empty payloads produce
    zero bytes at the target size — a corrupt 100 TB batch never kills
    the stage."""
    from cascading_flink_spark.extensions import resize_images
    media = attach_binary_meta(
        spark.createDataFrame(
            [(1, bytes([9, 9, 9])), (2, None), (3, b"")],
            "doc_id long, payload binary"),
        bytes_col="payload", id_col="doc_id", modality="image")
    rows = {r["media_id"]: r for r in
            resize_images(media, out_width=3, out_height=2,
                          raw_width=5, raw_height=5).collect()}
    assert all(r["decoder"] == "stub" for r in rows.values())
    assert bytes(rows[1]["payload"]) == bytes([9] * 6)
    assert bytes(rows[2]["payload"]) == bytes(6)
    assert bytes(rows[3]["payload"]) == bytes(6)
    assert all(r["n_bytes_out"] == 6 for r in rows.values())


def test_resize_streaming_stateless_parity(spark, tmp_path):
    """resize_images is a stateless mapInPandas projection — it runs on a
    stream unchanged; single-batch output equals the batch twin."""
    from cascading_flink_spark.extensions import resize_images
    payload = bytes(range(72))
    batch = attach_binary_meta(
        spark.createDataFrame([(1, payload), (2, payload[::-1])],
                              "doc_id long, payload binary"),
        bytes_col="payload", id_col="doc_id", modality="image")
    expected = {(r["media_id"], bytes(r["payload"]))
                for r in resize_images(batch, 3, 3,
                                       raw_width=9, raw_height=8).collect()}
    src_dir = str(tmp_path / "in")
    batch.write.parquet(src_dir)
    stream = (spark.readStream.schema(batch.schema).parquet(src_dir))
    out = resize_images(stream, 3, 3, raw_width=9, raw_height=8)
    q = (out.writeStream.format("memory").queryName("resize_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["media_id"], bytes(r["payload"]))
           for r in spark.sql("SELECT * FROM resize_stream").collect()}
    assert got == expected
