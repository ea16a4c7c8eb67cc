"""Tests for the training-data-pipeline operators (dedup, similarity,
text analysis, multimodal plumbing) over the driver testdata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_otlp_spark.operators import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# --- dedup ---

def test_exact_dedup_with_planted_dup(spark, docs):
    base = docs.limit(50)
    dup = base.filter(F.col("doc_id") == 0) \
        .withColumn("doc_id", F.lit(99999).cast("long"))
    with_dup = base.unionAll(dup)
    out = dedup.exact_dedup(with_dup, "doc_id", "text")
    assert out.count() == 50
    assert out.filter(F.col("doc_id") == 99999).count() == 0  # keeps min id


def test_minhash_lsh_finds_planted_near_dup(spark, docs):
    base = docs.limit(40)
    # plant a near-duplicate: doc 0's text with one word changed
    words_changed = F.concat(F.col("text"), F.lit(" extraword"))
    near = base.filter(F.col("doc_id") == 0).select(
        F.lit(88888).cast("long").alias("doc_id"),
        words_changed.alias("text"), "lang", "source", "n_chars")
    with_near = base.select("doc_id", "text", "lang", "source", "n_chars") \
        .unionAll(near)
    pairs = dedup.minhash_lsh_pairs(with_near, "doc_id", "text",
                                    num_hashes=64, bands=16,
                                    jaccard_threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 88888) in got
    row = pairs.filter((F.col("id_a") == 0) & (F.col("id_b") == 88888)).first()
    assert row["jaccard"] > 0.8


def test_minhash_dedup_drops_near_dup(spark, docs):
    base = docs.limit(40).select("doc_id", "text")
    near = base.filter(F.col("doc_id") == 0).select(
        F.lit(88888).cast("long").alias("doc_id"), "text")
    out = dedup.minhash_dedup(base.unionAll(near), "doc_id", "text")
    ids = {r["doc_id"] for r in out.collect()}
    assert 0 in ids and 88888 not in ids


def test_simhash_near_dup(spark, docs):
    base = docs.limit(30).select("doc_id", "text")
    near = base.filter(F.col("doc_id") == 1).select(
        F.lit(77777).cast("long").alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"))
    pairs = dedup.simhash_pairs(base.unionAll(near), "doc_id", "text",
                                max_hamming=6)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 77777) in got


def test_simhash_identical_distance_zero(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        ["doc_id", "text"])
    sigs = df.select("doc_id", dedup.simhash_bits(F.col("text")).alias("s"))
    a, b = [r["s"] for r in sigs.orderBy("doc_id").collect()]
    assert a == b


def test_embedding_near_dup_pairs(spark, emb):
    base = emb.limit(30)
    clone = base.filter(F.col("vec_id") == 0).select(
        F.lit(66666).cast("long").alias("vec_id"), "embedding",
        F.col("label"))
    pairs = dedup.embedding_near_dup_pairs(base.unionAll(clone),
                                           "vec_id", "embedding",
                                           threshold=0.99)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 66666) in got


# --- similarity ---

def test_cosine_topk_self_is_first(spark, emb):
    qvec = emb.filter(F.col("vec_id") == 3).first()["embedding"]
    top = similarity.cosine_topk(emb, "vec_id", "embedding", list(qvec), k=5)
    rows = top.collect()
    assert rows[0]["vec_id"] == 3
    assert rows[0]["cosine"] == pytest.approx(1.0, abs=1e-6)
    assert all(rows[i]["cosine"] >= rows[i + 1]["cosine"] for i in range(len(rows) - 1))


def test_ivf_search_matches_brute_force_mostly(spark, emb):
    qvec = list(emb.filter(F.col("vec_id") == 7).first()["embedding"])
    brute = [r["vec_id"] for r in
             similarity.cosine_topk(emb, "vec_id", "embedding", qvec, k=5).collect()]
    assigned, centroids = similarity.build_ivf_index(
        emb, "vec_id", "embedding", n_centroids=8, iters=1)
    approx = [r["vec_id"] for r in
              similarity.ivf_search(assigned, centroids, "vec_id", "embedding",
                                    qvec, k=5, nprobe=4).collect()]
    # self must be found; recall of the exact top-5 should be decent
    assert brute[0] == 7 and approx[0] == 7
    assert len(set(brute) & set(approx)) >= 3


# --- text ---

def test_profile_documents(spark, docs):
    prof = text.profile_documents(docs.limit(20), "doc_id", "text")
    rows = prof.collect()
    assert len(rows) == 20
    for r in rows:
        assert r["n_tokens"] > 0
        assert 0.0 <= r["quality"] <= 1.0
        assert len(r["fingerprint"]) == 16
        assert r["lang_guess"] is not None


def test_lang_id_heuristic(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog sat in the house with a friend"),
         (2, "der hund und die katze ist nicht mit der maus"),
         (3, "el gato y el perro que es de la casa")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r["lang"] for r in
           df.select("doc_id", text.lang_id(F.col("text")).alias("lang")).collect()}
    assert out == {1: "en", 2: "de", 3: "es"}


def test_fingerprint_robust_to_local_edit(spark):
    df = spark.createDataFrame(
        [(1, "a long document with many words repeated many times over and over"),
         (2, "a long document with many words repeated many times over and over!!")],
        ["doc_id", "text"])
    fps = [r["fp"] for r in df.select(
        text.rolling_fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]  # min-gram unaffected by a tail edit (usually)


def test_token_count_tokenizers(spark):
    df = spark.createDataFrame([(1, "hello world, 42 times!")], ["id", "t"])
    r = df.select(
        text.token_count(F.col("t"), "ws").alias("ws"),
        text.token_count(F.col("t"), "bpe").alias("bpe")).first()
    assert r["ws"] == 4
    assert r["bpe"] >= 6  # words + number + punctuation separated


# --- multimodal ---

def test_multimodal_features(spark):
    media = multimodal.synthetic_media(spark, n=32)
    feats = multimodal.extract_features(media, dim=8)
    rows = feats.collect()
    assert len(rows) == 32
    for r in rows:
        assert r["n_bytes"] > 0
        assert len(r["feature"]) == 8
        assert all(0.0 <= x <= 1.0 for x in r["feature"])
    # deterministic: same payload -> same digest
    again = {r["media_id"]: r["digest"] for r in
             multimodal.extract_features(media, dim=8).collect()}
    assert {r["media_id"]: r["digest"] for r in rows} == again


def test_multimodal_strict_decode_rejects_garbage(spark):
    # synthetic_media payloads are not real containers: strict header
    # decode must reject them with a descriptive error
    media = multimodal.synthetic_media(spark, n=4)
    with pytest.raises(Exception, match="unrecognized container"):
        multimodal.extract_features(media, strict_decode=True).collect()


def _full_png(raw_rows, color_type, *, filters=None, bit_depth=8,
              interlace=0, corrupt_crc=False):
    """Craft a COMPLETE valid PNG (CRCs included) from raw pixel rows,
    applying the requested per-row filter forward — the decoder must
    invert every filter type exactly."""
    import struct as st
    import zlib

    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    h = len(raw_rows)
    w = len(raw_rows[0]) // nch if h else 0
    filters = filters or [0] * h

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        if corrupt_crc:
            crc ^= 1
        return st.pack(">I", len(data)) + ctype + data + st.pack(">I", crc)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    stream = bytearray()
    prev = bytes(len(raw_rows[0])) if h else b""
    for row, ftype in zip(raw_rows, filters):
        stream.append(ftype)
        for x, v in enumerate(row):
            left = row[x - nch] if x >= nch else 0
            up = prev[x]
            ul = prev[x - nch] if x >= nch else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) // 2,
                    4: paeth(left, up, ul)}[ftype]
            stream.append((v - pred) & 0xFF)
        prev = row
    ihdr = st.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, interlace)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(stream)))
            + chunk(b"IEND", b""))


def _pcm_wav(samples_raw, *, bits=16, rate=8000, channels=1, afmt=1):
    """Craft a complete integer-PCM WAV around raw sample values."""
    import struct as st
    if bits == 8:
        data = bytes(samples_raw)
    else:
        data = st.pack(f"<{len(samples_raw)}{'h' if bits == 16 else 'i'}",
                       *samples_raw)
    byte_rate = rate * channels * bits // 8
    fmt = st.pack("<HHIIHH", afmt, channels, rate, byte_rate,
                  channels * bits // 8, bits)
    body = (b"fmt " + st.pack("<I", len(fmt)) + fmt
            + b"data" + st.pack("<I", len(data)) + data
            + (b"\x00" if len(data) & 1 else b""))
    return b"RIFF" + st.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_decode_png_pixels_all_filters_exact():
    """5x3 RGB image, one row per PNG filter type (None/Sub/Up/Average/
    Paeth): the stdlib decoder must invert each filter to the exact raw
    samples it was crafted from."""
    rows = [bytes([(r * 50 + c * 17 + ch * 7) % 256
                   for c in range(3) for ch in range(3)])
            for r in range(5)]
    payload = _full_png(rows, color_type=2, filters=[0, 1, 2, 3, 4])
    w, h, nch, px = multimodal.decode_png_pixels(payload)
    assert (w, h, nch) == (3, 5, 3)
    assert bytes(px) == b"".join(rows)

    # grayscale and RGBA round-trip too (Sub+Paeth filters)
    grows = [bytes([10, 200, 30]), bytes([250, 0, 128])]
    _, _, n1, gpx = multimodal.decode_png_pixels(
        _full_png(grows, color_type=0, filters=[1, 4]))
    assert n1 == 1 and bytes(gpx) == b"".join(grows)
    arows = [bytes(range(16)), bytes(range(100, 116))]
    _, _, n4, apx = multimodal.decode_png_pixels(
        _full_png(arows, color_type=6, filters=[2, 3]))
    assert n4 == 4 and bytes(apx) == b"".join(arows)


def test_png_mean_luma_exact():
    # uniform RGB (200, 100, 50): luma = .299*200 + .587*100 + .114*50
    rows = [bytes([200, 100, 50] * 4)] * 3
    luma = multimodal.png_mean_luma(_full_png(rows, color_type=2))
    assert abs(luma - (0.299 * 200 + 0.587 * 100 + 0.114 * 50)) < 1e-9
    # grayscale mean is the plain pixel mean
    g = multimodal.png_mean_luma(
        _full_png([bytes([0, 100]), bytes([200, 100])], color_type=0))
    assert abs(g - 100.0) < 1e-9


def test_decode_png_pixels_error_contracts():
    rows = [bytes([1, 2, 3])]
    with pytest.raises(ValueError, match="CRC"):
        multimodal.decode_png_pixels(
            _full_png(rows, color_type=0, corrupt_crc=True))
    with pytest.raises(ValueError, match="pixel stream"):
        # interlace FLAG set but the stream laid out non-interlaced:
        # the Adam7 pass walk must notice the length mismatch (happy
        # interlace/palette paths: tests/test_media_decode.py)
        multimodal.decode_png_pixels(
            _full_png(rows, color_type=0, interlace=1))
    with pytest.raises(ValueError, match="missing PLTE"):
        multimodal.decode_png_pixels(_full_png(rows, color_type=3))
    with pytest.raises(ValueError, match="not a legal combination"):
        # 16-bit palette is illegal per the PNG spec (16-bit
        # gray/RGB/alpha shapes DO decode: tests/test_media_decode.py)
        multimodal.decode_png_pixels(
            _full_png(rows, color_type=3, bit_depth=16))
    with pytest.raises(ValueError, match="not a PNG"):
        multimodal.decode_png_pixels(b"garbage")


def test_decode_wav_samples_exact_and_rms():
    import math

    # 16-bit: full-scale square wave -> known normalized values and RMS
    sq = [16384, -16384, 16384, -16384]
    rate, ch, samples = multimodal.decode_wav_samples(_pcm_wav(sq))
    assert (rate, ch) == (8000, 1)
    assert samples == [0.5, -0.5, 0.5, -0.5]
    assert abs(multimodal.wav_rms_amplitude(_pcm_wav(sq)) - 0.5) < 1e-12
    # 8-bit unsigned: 128 is silence, 255/0 near full scale
    _, _, s8 = multimodal.decode_wav_samples(
        _pcm_wav([128, 0, 255], bits=8))
    assert s8 == [0.0, -1.0, 127 / 128]
    # 32-bit signed
    _, _, s32 = multimodal.decode_wav_samples(
        _pcm_wav([2**30, -(2**30)], bits=32))
    assert s32 == [0.5, -0.5]
    # RMS of a known mixed stream
    vals = [8192, 0, -8192, 16384]
    want = math.sqrt(sum((v / 32768) ** 2 for v in vals) / 4)
    assert abs(multimodal.wav_rms_amplitude(_pcm_wav(vals)) - want) < 1e-12
    # non-PCM and exotic depths need codecs
    with pytest.raises(NotImplementedError, match="non-PCM"):
        multimodal.decode_wav_samples(_pcm_wav(sq, afmt=3))
    with pytest.raises(ValueError, match="not a WAV"):
        multimodal.decode_wav_samples(b"garbage")


def test_extract_features_decode_pixels_real_signal(spark):
    """decode_pixels=True computes REAL pixel/sample features through
    the Arrow batch path: exact mean luma for PNG, exact RMS for WAV,
    and a corrupt container (header-only JPEG with no scan data) still
    raises through the batch path. (JPEG/GIF happy paths:
    tests/test_media_decode.py — all four containers decode as of
    r10.)"""
    png = _full_png([bytes([200, 100, 50] * 2)] * 2, color_type=2)
    wav = _pcm_wav([16384, -16384, 16384, -16384])
    media = spark.createDataFrame(
        [(1, "image", "png", png, (None,) * 4),
         (2, "audio", "wav", wav, (None,) * 4)],
        multimodal.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           multimodal.extract_features(media, decode_pixels=True).collect()}
    want_luma = 0.299 * 200 + 0.587 * 100 + 0.114 * 50
    assert abs(got[1]["mean_luma"] - want_luma) < 1e-9
    assert got[1]["rms_amplitude"] is None
    assert abs(got[2]["rms_amplitude"] - 0.5) < 1e-12
    assert got[2]["mean_luma"] is None

    jpeg_media = spark.createDataFrame(
        [(3, "image", "jpeg", _jpeg_bytes(8, 8), (None,) * 4)],
        multimodal.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="missing SOS"):
        multimodal.extract_features(jpeg_media, decode_pixels=True).collect()


# --- hand-crafted container bytes: the real header-decode seam ---

def _png_bytes(w, h, bit_depth=8):
    import struct as st
    ihdr = st.pack(">IIBBBBB", w, h, bit_depth, 6, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + st.pack(">I", 13) + b"IHDR" + ihdr
            + b"\x00\x00\x00\x00")          # CRC not validated


def _jpeg_bytes(w, h, sof=0xC0):
    import struct as st
    # APP0 length 16 = 2 (length field) + 14 payload (JFIF\0, version,
    # units, density, thumbnail dims)
    app0 = b"\xff\xe0" + st.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof_payload = st.pack(">BHH", 8, h, w) + b"\x03" + b"\x01\x11\x00" * 3
    sof_seg = bytes([0xFF, sof]) + st.pack(">H", 2 + len(sof_payload)) \
        + sof_payload
    return b"\xff\xd8" + app0 + sof_seg + b"\xff\xd9"


def _gif_bytes(w, h):
    import struct as st
    return b"GIF89a" + st.pack("<HH", w, h) + b"\x00" * 6


def _wav_bytes(sample_rate=16000, channels=2, bits=16, data_size=128000):
    import struct as st
    byte_rate = sample_rate * channels * bits // 8
    fmt = st.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                  channels * bits // 8, bits)
    body = (b"fmt " + st.pack("<I", len(fmt)) + fmt
            + b"data" + st.pack("<I", data_size) + b"\x00" * 16)
    return b"RIFF" + st.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_sniff_media_header_exact_dims():
    sniff = multimodal.sniff_media_header
    assert sniff(_png_bytes(640, 360)) == {
        "format": "png", "width": 640, "height": 360, "bit_depth": 8}
    assert sniff(_jpeg_bytes(640, 480)) == {
        "format": "jpeg", "width": 640, "height": 480, "bit_depth": 8}
    # progressive JPEG (SOF2) parses identically
    assert sniff(_jpeg_bytes(31, 17, sof=0xC2))["width"] == 31
    assert sniff(_gif_bytes(320, 200)) == {
        "format": "gif", "width": 320, "height": 200}
    wav = sniff(_wav_bytes())
    assert wav == {"format": "wav", "channels": 2, "sample_rate": 16000,
                   "bit_depth": 16, "duration_ms": 2000}
    # garbage / truncation never crash, they return None
    assert sniff(b"not a media file at all") is None
    assert sniff(b"") is None
    assert sniff(_png_bytes(1, 1)[:12]) is None
    assert sniff(b"\xff\xd8\xff\xd9") is None     # JPEG without SOF
    assert sniff(b"RIFF\x00\x00\x00\x00WAVEjunk") is None


def test_decode_headers_real_bytes(spark):
    rows = [
        (1, "image", "png", _png_bytes(800, 600), (None,) * 4),
        (2, "image", "jpeg", _jpeg_bytes(1024, 768), (None,) * 4),
        (3, "image", "gif", _gif_bytes(64, 32), (None,) * 4),
        (4, "audio", "wav", _wav_bytes(sample_rate=44100, channels=1,
                                       data_size=88200 * 3), (None,) * 4),
        (5, "image", "png", b"corrupted bytes here", (None,) * 4),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           multimodal.decode_headers(media).collect()}
    assert (got[1]["width"], got[1]["height"]) == (800, 600)
    assert got[1]["sniffed_format"] == "png"
    assert (got[2]["width"], got[2]["height"]) == (1024, 768)
    assert (got[3]["width"], got[3]["height"]) == (64, 32)
    assert got[4]["sample_rate"] == 44100
    assert got[4]["channels"] == 1
    assert got[4]["duration_ms"] == 3000
    assert got[5]["header_ok"] is False and got[5]["width"] is None
    # strict mode surfaces the corrupt payload instead of nulling it
    with pytest.raises(Exception, match="media_id=5"):
        multimodal.decode_headers(media, strict=True).collect()


def test_extract_features_strict_decode_real_dims(spark):
    rows = [
        (1, "image", "png", _png_bytes(320, 240), (None,) * 4),
        (2, "audio", "wav", _wav_bytes(), (None,) * 4),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           multimodal.extract_features(media, strict_decode=True).collect()}
    assert (got[1]["width"], got[1]["height"]) == (320, 240)
    assert got[2]["sample_rate"] == 16000
    assert got[2]["duration_ms"] == 2000
    # the fake features still ride along, unchanged by the header parse
    assert len(got[1]["feature"]) == 8


def test_frame_sample_plan_prunes_payload(spark):
    media = multimodal.synthetic_media(spark, n=30)
    plan = multimodal.frame_sample_plan(media, every_ms=1000)
    rows = plan.collect()
    assert len(rows) > 0
    assert {"media_id", "frame_idx", "frame_ts_ms"} == set(plan.columns)
    # payload must not appear in the physical plan's scan schema
    explained = plan._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in explained


def test_minhash_lsh_mega_bucket_cap(spark):
    """The max_bucket_size skew guard: 200 byte-identical docs form a
    mega-bucket in every band; star candidates bound the pair count to
    O(d) while every duplicate still surfaces in a verified pair with
    the representative. Distinct docs are unaffected."""
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(200)]
    rows += [(1000 + i, f"unique text number {i} with words w{i} x{i} y{i} z{i}")
             for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.minhash_lsh_pairs(df, "doc_id", "text",
                                    num_hashes=64, bands=16,
                                    jaccard_threshold=0.9,
                                    max_bucket_size=50).collect()
    dup_pairs = [(r["id_a"], r["id_b"]) for r in pairs if r["id_b"] < 1000]
    # star shape: exactly one pair per non-representative member
    assert sorted(dup_pairs) == [(0, b) for b in range(1, 200)]
    assert all(r["jaccard"] == 1.0 for r in pairs if r["id_b"] < 1000)
    # dedup built on the capped pairs still drops every duplicate
    out = dedup.minhash_dedup(df, "doc_id", "text", num_hashes=64,
                              bands=16, jaccard_threshold=0.9,
                              max_bucket_size=50)
    ids = {r["doc_id"] for r in out.collect()}
    assert 0 in ids and not any(1 <= i < 200 for i in ids)
    assert all(1000 + i in ids for i in range(20))


def test_minhash_mega_bucket_multi_probe_star(spark):
    """star_probes=3: over-cap buckets pair every member with the THREE
    smallest-id representatives (covering rep-rep pairs), tripling
    within-mega-bucket recall at O(3d) candidate cost."""
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta")
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.minhash_lsh_pairs(df, "doc_id", "text",
                                    num_hashes=64, bands=16,
                                    jaccard_threshold=0.9,
                                    max_bucket_size=20,
                                    star_probes=3).collect()
    got = sorted((r["id_a"], r["id_b"]) for r in pairs)
    want = sorted((a, b) for a in range(3) for b in range(60) if a < b)
    assert got == want
    assert all(r["jaccard"] == 1.0 for r in pairs)


def test_embedding_mega_bucket_multi_probe_star(spark):
    """Embedding twin of the multi-probe star: k=2 representatives."""
    dup_vec = [1.0, 2.0, 3.0, 4.0]
    df = spark.createDataFrame([(i, dup_vec) for i in range(40)],
                               "vec_id long, embedding array<double>")
    pairs = dedup.embedding_near_dup_pairs(
        df, "vec_id", "embedding", threshold=0.95,
        max_bucket_size=10, star_probes=2).collect()
    got = sorted((r["id_a"], r["id_b"]) for r in pairs)
    want = sorted((a, b) for a in range(2) for b in range(40) if a < b)
    assert got == want
    assert all(r["cosine"] == 1.0 for r in pairs)


def test_embedding_mega_bucket_cap(spark):
    """embedding_near_dup_pairs' max_bucket_size skew guard, mirroring
    test_minhash_lsh_mega_bucket_cap: 200 identical embeddings agree on
    every plane sign, land in one mega-bucket per probe, and the star
    fallback bounds candidates to O(d) — exactly one verified pair per
    non-representative member, all cosines 1.0. Distinct-tail vectors
    (including one planted tail near-dup pair) produce the SAME pairs
    as the uncapped run."""
    dup_vec = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
    rows = [(i, dup_vec) for i in range(200)]
    # deterministic mixed-sign tail — far from the all-positive dup_vec
    # and from each other; 1018/1019 are a planted near-dup pair
    tail = [[float(((i * 7 + j * 13) % 17) - 8) or 1.0 for j in range(8)]
            for i in range(19)]
    rows += [(1000 + i, v) for i, v in enumerate(tail)]
    rows.append((1019, [x * 1.5 for x in tail[18]]))  # near-dup of 1018
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    capped = dedup.embedding_near_dup_pairs(
        df, "vec_id", "embedding", threshold=0.95,
        max_bucket_size=50).collect()
    dup_pairs = sorted((r["id_a"], r["id_b"]) for r in capped
                       if r["id_b"] < 1000)
    # star shape: exactly one pair per non-representative member
    assert dup_pairs == [(0, b) for b in range(1, 200)]
    assert all(r["cosine"] == 1.0 for r in capped if r["id_b"] < 1000)
    # distinct tail unaffected: capped tail pairs == uncapped tail pairs
    uncapped_tail = dedup.embedding_near_dup_pairs(
        df.filter(F.col("vec_id") >= 1000), "vec_id", "embedding",
        threshold=0.95).collect()
    capped_tail = sorted((r["id_a"], r["id_b"]) for r in capped
                         if r["id_a"] >= 1000)
    assert capped_tail == sorted((r["id_a"], r["id_b"])
                                 for r in uncapped_tail)
    assert (1018, 1019) in capped_tail  # the planted pair survives the cap


def test_cosine_topk_batched_matches_expression_variant(spark, emb):
    """The Arrow-batched numpy scan must agree with the JVM expression
    variant: same ids, same 6-dp cosines, same order."""
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    a = similarity.cosine_topk(emb.filter(F.col("vec_id") != 0),
                               "vec_id", "embedding", list(q), k=10)
    b = similarity.cosine_topk_batched(
        emb.filter(F.col("vec_id") != 0).repartition(7),
        "vec_id", "embedding", list(q), k=10)
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_cosine_topk_batched_tie_break_and_id_type(spark):
    """Cosines tied at the k-th boundary must resolve by id exactly as
    the global orderBy does, and a non-bigint id column must survive."""
    rows = [(i, [1.0, 0.0]) for i in range(20)]          # all cosine 1.0
    rows += [(100 + i, [0.0, 1.0]) for i in range(5)]    # cosine 0.0
    df = spark.createDataFrame(rows, "vid int, embedding array<double>")
    got = similarity.cosine_topk_batched(df.repartition(3), "vid",
                                         "embedding", [1.0, 0.0], k=10)
    want = similarity.cosine_topk(df, "vid", "embedding", [1.0, 0.0], k=10)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]
    assert [r["vid"] for r in got.collect()] == list(range(10))


def test_ivf_index_save_load_partition_pruning(spark, emb, tmp_path):
    """A saved IVF index must (a) return the identical search result
    after reload and (b) plan the probe as a PARTITION-pruned scan —
    at scale the win is reading nprobe/C of the files, not the math."""
    from duckdb_otlp_spark.plans import audit

    q = list(emb.filter(F.col("vec_id") == 1).first()["embedding"])
    assigned, centroids = similarity.build_ivf_index(
        emb, "vec_id", "embedding", n_centroids=8, iters=1)
    want = similarity.ivf_search(assigned, centroids, "vec_id",
                                 "embedding", q, k=5, nprobe=2).collect()

    path = str(tmp_path / "ivf")
    similarity.save_ivf_index(assigned, centroids, path)
    a2, c2 = similarity.load_ivf_index(spark, path)
    got_df = similarity.ivf_search(a2, c2, "vec_id", "embedding", q,
                                   k=5, nprobe=2)
    assert [tuple(r) for r in got_df.collect()] == [tuple(r) for r in want]

    rep = audit(got_df)
    scan = rep.scan_for("/assigned")
    assert scan is not None
    assert any("centroid_id" in f for f in scan.partition_filters), \
        scan.partition_filters


def test_resize_plan_metadata_only(spark):
    media = multimodal.synthetic_media(spark, 30)
    out = multimodal.resize_plan(media, max_side=256).collect()
    assert out, "images present"
    for r in out:
        longest = max(r["width"], r["height"])
        if longest > 256:
            assert r["needs_resize"]
            assert max(r["out_width"], r["out_height"]) == 256
            # aspect preserved within integer-rounding relative error
            want = r["width"] / r["height"]
            got_ratio = r["out_width"] / r["out_height"]
            assert abs(got_ratio - want) / want < 0.05
        else:
            assert (r["out_width"], r["out_height"]) == (r["width"], r["height"])
    # payload pruned: write media to parquet so the plan has a real
    # scan, then assert the resize plan's ReadSchema excludes payload
    import tempfile
    from duckdb_otlp_spark.plans import audit
    d = tempfile.mkdtemp(prefix="media_prune_")
    media.write.mode("overwrite").parquet(d)
    rep = audit(multimodal.resize_plan(spark.read.parquet(d)))
    scan = rep.scan_for(d)
    assert scan is not None
    assert "payload" not in scan.read_columns, scan.read_columns


def test_audio_chunk_plan_covers_duration(spark):
    media = multimodal.synthetic_media(spark, 30)
    rows = multimodal.audio_chunk_plan(media, chunk_ms=3000).collect()
    assert rows
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, chunks in by_media.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        total = sum(r["chunk_len_ms"] for r in chunks)
        assert total == chunks[0]["duration_ms"]      # full coverage, no overlap
        assert chunks[0]["chunk_start_ms"] == 0
        for r in chunks:
            assert r["n_samples"] == r["chunk_len_ms"] * r["sample_rate"] // 1000


def test_pii_scrub_planted_fixtures(spark):
    """pii_scrub/pii_counts over planted PII: every category redacts to
    its token, counts match, and clean text passes through unchanged."""
    rows = [
        (1, "reach me at alice.smith+x@sub.example.co.uk today"),
        (2, "server 192.168.001.42 rebooted, backup at 10.0.0.7"),
        (3, "ssn 123-45-6789 on file"),
        (4, "call +1 555-123-4567 or 44 020-7946-0958"),
        (5, "no pii here, just words and numbers like 12345"),
        (6, "alice@example.com met bob@example.org at 10.1.2.3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.scrub_documents(df).collect()}

    assert out[1]["pii_email"] == 1
    assert out[1]["text"] == "reach me at <EMAIL> today"
    assert out[2]["pii_ipv4"] == 2
    assert out[2]["text"] == "server <IP> rebooted, backup at <IP>"
    assert out[3]["pii_ssn"] == 1
    assert "<SSN>" in out[3]["text"] and "123-45" not in out[3]["text"]
    # counts are computed on progressively-scrubbed text, so a pure-SSN
    # row can never double-count as a phone (audit == actual redactions)
    assert out[3]["pii_phone"] == 0 and out[3]["pii_total"] == 1
    assert out[4]["pii_phone"] == 2
    assert "<PHONE>" in out[4]["text"]
    assert "555" not in out[4]["text"]
    assert out[5]["pii_total"] == 0
    assert out[5]["text"] == rows[4][1]
    assert out[6]["pii_email"] == 2 and out[6]["pii_ipv4"] == 1
    assert out[6]["text"] == "<EMAIL> met <EMAIL> at <IP>"


def test_pii_counts_equal_actual_redactions(spark):
    """pii_counts is defined as redactions-performed, not raw-text
    matches: the per-category counts must equal the number of
    replacement tokens pii_scrub actually emits, row by row — even on
    adversarial text where category patterns could overlap."""
    rows = [(i, t) for i, t in enumerate([
        "ssn 123-45-6789 plain",
        "call 1 555-123-4567 then ssn 987-65-4321",
        "a@b.co 1.2.3.4 111-22-3333 +44 020-7946-0958",
        "dense 1 234-567-8901 2 345-678-9012 x@y.io 9.9.9.9",
        "nothing personal here",
    ])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for r in text.scrub_documents(df).collect():
        for cat, tok in [("email", "<EMAIL>"), ("phone", "<PHONE>"),
                         ("ipv4", "<IP>"), ("ssn", "<SSN>")]:
            assert r[f"pii_{cat}"] == r["text"].count(tok), \
                (r["doc_id"], cat, r["text"])


def test_pii_scrub_matches_duckdb_regex(spark):
    """Cross-engine pin: the Java-evaluated patterns and DuckDB's RE2
    produce identical redactions on an adversarial mixed corpus — the
    compatibility contract PII_PATTERNS promises."""
    import duckdb

    from duckdb_otlp_spark.operators.text import PII_PATTERNS

    rows = [(i, t) for i, t in enumerate([
        "a@b.io x@y.museum no@dots",
        "1.2.3.4.5 256.1.1.1 10.0.0.255",
        "123-45-6789 123-456-789 12-34-5678",
        "+358 040-123-4567 phone: 1 555-000-1111",
        "edge@case.co 0.0.0.0 999-99-9999 +1 000-000-0000",
    ])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"]
           for r in text.scrub_documents(df).collect()}

    con = duckdb.connect()
    for i, t in rows:
        expr = "?"
        params = [t]
        for cat in ("email", "ssn", "ipv4", "phone"):
            pat, rep = PII_PATTERNS[cat]
            expr = f"regexp_replace({expr}, ?, ?, 'g')"
            params += [pat, rep]
        want = con.execute(f"SELECT {expr}", params).fetchone()[0]
        assert got[i] == want, (i, got[i], want)


def test_split_leakage_detects_planted_cross_split_dup(spark, tmp_path):
    """q_split_leakage must count a test-split document whose content
    digest also appears in train (doc_ids chosen so the md5 bucket
    assignment lands them in the right splits), and not flag unique
    eval docs. Digest is content-based (lower/trim), so a
    case/whitespace variant still leaks."""
    from duckdb_otlp_spark.queries import q_split_leakage

    # buckets: 0,1,2 -> train; 78,151 -> val; 179 -> test
    rows = [
        (0, "the shared leaked document body appears twice", "en", "web", 1),
        (1, "a train only document body", "en", "web", 1),
        (2, "another train only document body", "en", "web", 1),
        (78, "  THE SHARED LEAKED DOCUMENT BODY APPEARS TWICE ", "en", "web", 1),
        (151, "a unique validation document", "en", "web", 1),
        (179, "a unique test document", "en", "web", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.parquet(str(tmp_path / "documents.parquet"), mode="overwrite")
    got = {r["split"]: (r["n_docs"], r["n_leaked"], r["leak_rate"])
           for r in q_split_leakage(spark, str(tmp_path)).collect()}
    assert got["val"] == (2, 1, 0.5), got
    assert got["test"] == (1, 0, 0.0), got


def test_semdedup_detects_planted_copies(spark):
    """Operator-level SemDeDup (MLlib k-means + blocked within-cluster
    cosine matmul): planted exact-copy vectors are dropped, everything
    else kept, copies co-cluster with their originals, and the blocked
    matmul path (tiny block budget -> many streaming passes) returns
    the identical verdict set."""
    n = 400
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda i: ((F.pmod(F.xxhash64(
                # vec_id % 50 == 1 copies vec_id - 1 exactly
                F.col("id") - F.when(F.col("id") % 50 == 1, 1)
                .otherwise(0), i), F.lit(2001)) - 1000) / 1000.0)
            .cast("float")).alias("embedding"))
    out = dedup.semdedup(df, "vec_id", "embedding", k=8, tau=0.999)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == n
    planted = [i for i in range(n) if i % 50 == 1]
    assert planted and all(not rows[i]["is_kept"] for i in planted)
    assert all(rows[i]["is_kept"] for i in range(n) if i % 50 != 1)
    # identical vectors must land in the same k-means cluster
    for i in planted:
        assert rows[i]["cluster_id"] == rows[i - 1]["cluster_id"]
    # blocked path (256-byte budget => row-at-a-time matmul) agrees
    tiny = dedup.semdedup(df, "vec_id", "embedding", k=8, tau=0.999,
                          block_bytes=256)
    assert {(r["vec_id"], r["is_kept"]) for r in tiny.collect()} == \
        {(r["vec_id"], r["is_kept"]) for r in out.collect()}


def test_semdedup_zero_vectors_kept(spark):
    """Zero vectors normalize to similarity 0 and are all kept — the
    degenerate row must not divide by zero or mark dups."""
    df = spark.createDataFrame(
        [(0, [0.0] * 8), (1, [0.0] * 8), (2, [1.0] + [0.0] * 7)],
        "vec_id long, embedding array<float>")
    out = dedup.semdedup(df, "vec_id", "embedding", k=2, tau=0.5)
    assert all(r["is_kept"] for r in out.collect())


def test_winnowing_operator_matches_query_and_stoplist(spark):
    """The operator twin of q_winnowing_pairs returns the same pairs on
    the oracle testdata when the stop-list is off; with max_doc_freq
    set, a fingerprint shared by a planted boilerplate phrase across
    many docs is dropped BEFORE the self-join while a genuine near-dup
    pair (sharing many non-hot fingerprints) survives."""
    from duckdb_otlp_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    want = {(r["doc_a"], r["doc_b"], r["shared_fingerprints"])
            for r in QUERIES["winnowing_pairs"](spark, sf).collect()}
    got = {(r["doc_a"], r["doc_b"], r["shared_fingerprints"])
           for r in text.winnowing_pairs(docs, "doc_id", "text").collect()}
    assert got == want and want
    # the capped GROUPED-pairs path (one hash groupBy + in-array pair
    # expansion — the corpus-scale shape) returns the identical pair
    # set when the cap is high enough to drop nothing
    grouped = {(r["doc_a"], r["doc_b"], r["shared_fingerprints"])
               for r in text.winnowing_pairs(
                   docs, "doc_id", "text",
                   max_doc_freq=10**6).collect()}
    assert grouped == want

    # planted hot phrase: 30 docs share ONLY a 12-token boilerplate run
    # (>= k+w-1 = 8 shared tokens, so winnowing GUARANTEES a shared
    # fingerprint for every pair); docs 100/101 are real near-dups
    # sharing a long unique run
    phrase = ("common header words repeated across many documents "
              "by the same template engine")
    uniq = ("alpha%d beta%d gamma%d delta%d epsilon%d zeta%d eta%d "
            "theta%d iota%d kappa%d lambda%d mu%d")
    rows = [(i, f"{phrase} {uniq % ((i,) * 12)}") for i in range(30)]
    dup_body = uniq % ((900,) * 12) + " " + uniq % ((901,) * 12)
    rows += [(100, dup_body), (101, dup_body)]
    planted = spark.createDataFrame(rows, "doc_id long, text string")
    unguarded = {(r["doc_a"], r["doc_b"]) for r in text.winnowing_pairs(
        planted, "doc_id", "text", min_shared=1).collect()}
    # the hot phrase links boilerplate docs pairwise
    assert (0, 1) in unguarded and (100, 101) in unguarded
    guarded = {(r["doc_a"], r["doc_b"]) for r in text.winnowing_pairs(
        planted, "doc_id", "text", min_shared=1,
        max_doc_freq=5).collect()}
    assert guarded == {(100, 101)}


def test_semdedup_sampled_fit_still_detects_copies(spark):
    """fit_sample fits k-means on a seeded sample but assigns the full
    corpus: planted exact copies must still co-cluster with their
    originals (identical vectors always share an assignment) and be
    dropped; the bounds contract rejects nonsense fractions."""
    import pytest as _pt

    n = 300
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda i: ((F.pmod(F.xxhash64(
                F.col("id") - F.when(F.col("id") % 50 == 1, 1)
                .otherwise(0), i), F.lit(2001)) - 1000) / 1000.0)
            .cast("float")).alias("embedding"))
    out = dedup.semdedup(df, "vec_id", "embedding", k=6, tau=0.999,
                         fit_sample=0.3)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == n
    planted = [i for i in range(n) if i % 50 == 1]
    assert planted and all(not rows[i]["is_kept"] for i in planted)
    for i in planted:
        assert rows[i]["cluster_id"] == rows[i - 1]["cluster_id"]
    with _pt.raises(ValueError, match="fit_sample"):
        dedup.semdedup(df, "vec_id", "embedding", k=6, fit_sample=1.5)
