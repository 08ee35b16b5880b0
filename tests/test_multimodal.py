"""Multimodal binary-column plumbing: metadata via built-ins, decode via
Arrow-batched mapInPandas. The deterministic fake decoder is the default;
``fake=False`` decodes real payloads when Pillow is installed (tests below
run in whichever mode the environment supports)."""

import importlib.util

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from powerdatapipeline_spark.operators import multimodal as mm

_HAS_PIL = importlib.util.find_spec("PIL") is not None


def _blobs(spark):
    return spark.createDataFrame([
        Row(doc_id=1, blob=bytearray(b"payload-one")),
        Row(doc_id=2, blob=bytearray(b"payload-two-longer")),
    ])


def test_metadata_built_ins_only(spark):
    out = mm.with_media_metadata(_blobs(spark), media_type="image", fmt="png")
    r = {x.doc_id: x.meta for x in out.collect()}
    assert r[1].n_bytes == len(b"payload-one")
    assert r[1].media_type == "image" and r[1].format == "png"
    assert len(r[1].checksum) == 32  # md5 hex


@pytest.mark.skipif(_HAS_PIL, reason="Pillow installed: gate opens instead")
def test_decode_gate_raises_without_fake():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"x", fake=False)


def test_real_path_decode_with_decoder_shim(monkeypatch):
    """Exercise decode_image_full's fake=False branch WITHOUT Pillow by
    shimming _pil_open (driver-side only — a monkeypatch cannot reach
    Spark's re-importing Python workers, so the mapInPandas wiring of the
    real path is covered by the Pillow-gated test below instead)."""
    class ShimImage:
        width, height = 4, 2

        def getdata(self):
            return list(range(8))

    monkeypatch.setattr(mm, "_pil_open", lambda payload: ShimImage())
    w, h, px = mm.decode_image_full(b"abc", fake=False)
    assert (w, h) == (4, 2) and px == list(range(8))
    assert mm.decode_image(b"abc", fake=False) == list(range(8))


@pytest.mark.skipif(not _HAS_PIL, reason="Pillow not installed")
def test_real_decode_and_resize_with_pillow(spark):
    """fake=False end-to-end when the optional codec dependency exists:
    a real PNG round-trips through extract_image_features (true dims +
    grayscale mean) and resize_image (PIL NEAREST)."""
    import io

    from PIL import Image

    im = Image.new("L", (6, 3))
    im.putdata(list(range(0, 180, 10)))  # 18 px: 0,10,...,170
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame([Row(doc_id=7, blob=bytearray(png))])
    feat = mm.extract_image_features(df, fake=False).collect()[0]
    assert (feat.width, feat.height) == (6, 3)
    assert feat.mean_pixel == pytest.approx(sum(range(0, 180, 10)) / 18)
    rs = mm.resize_image(df, out_w=2, out_h=1, fake=False).collect()[0]
    assert (rs.width, rs.height) == (2, 1) and len(rs.pixels) == 2
    assert all(0 <= p <= 255 for p in rs.pixels)


def test_fake_decode_deterministic():
    a = mm.decode_image(b"same-bytes", fake=True)
    b = mm.decode_image(b"same-bytes", fake=True)
    assert a == b and len(a) == 64
    assert all(0 <= p <= 255 for p in a)


def test_extract_image_features_mapinpandas(spark):
    out = mm.extract_image_features(_blobs(spark), fake=True)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2}
    assert rows[1].width == 8 and rows[1].height == 8
    assert 0 <= rows[1].mean_pixel <= 255
    # deterministic across runs (stable fake decoder)
    again = {r.doc_id: r.mean_pixel for r in
             mm.extract_image_features(_blobs(spark), fake=True).collect()}
    assert again[1] == rows[1].mean_pixel


def test_extract_audio_features(spark):
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"x", fake=False)
    out = {r.doc_id: r for r in
           mm.extract_audio_features(_blobs(spark), fake=True).collect()}
    samples = mm.decode_audio(b"payload-one", fake=True)
    assert out[1].n_samples == len(samples) == 256
    assert out[1].peak == max(samples)
    expect_rms = (sum(x * x for x in samples) / len(samples)) ** 0.5
    assert out[1].rms == pytest.approx(expect_rms)


def test_resize_image_nearest_neighbor(spark):
    out = mm.resize_image(_blobs(spark), out_w=4, out_h=4, fake=True)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].width == 4 and rows[1].height == 4
    assert len(rows[1].pixels) == 16
    # nearest-neighbor 8x8→4x4 picks source pixel (2y, 2x) — verify against
    # the fake decoder directly
    src = mm.decode_image(b"payload-one", fake=True)
    expect = [src[(2 * y) * 8 + 2 * x] for y in range(4) for x in range(4)]
    assert list(rows[1].pixels) == expect
    # upsample path: 8x8→16x16 repeats pixels, stays deterministic
    up = {r.doc_id: r.pixels for r in
          mm.resize_image(_blobs(spark), out_w=16, out_h=16, fake=True).collect()}
    assert len(up[1]) == 256 and up[1][0] == src[0] == up[1][1]


def test_frame_sample_explodes_byte_ranges(spark):
    df = spark.createDataFrame([Row(doc_id=1, blob=bytearray(b"x" * 3000))])
    out = mm.frame_sample(df, every_n_bytes=1024)
    rows = out.collect()
    assert len(rows) == 3  # ceil(3000/1024)
    assert [r.frame_idx for r in sorted(rows, key=lambda r: r.frame_idx)] == [0, 1, 2]
    assert len(bytes(rows[0].frame)) == 1024


def test_real_wav_decode_end_to_end(spark):
    """REAL audio codec path, no optional dependency: synthesize 16-bit
    PCM WAVs with the stdlib wave writer and run them through
    extract_audio_features(fake=False) — mapInPandas decodes actual
    payloads in the Python workers."""
    import io
    import math
    import struct
    import wave

    def make_wav(samples, width=2, channels=1, rate=8000):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(width)
            w.setframerate(rate)
            fmt = {1: "B", 2: "<h", 4: "<i"}[width]
            w.writeframes(b"".join(struct.pack(fmt, s) for s in samples))
        return buf.getvalue()

    ramp = [-100, -50, 0, 50, 100, 200]
    quiet = [0, 1, -1, 0]
    df = spark.createDataFrame([
        Row(doc_id=1, blob=bytearray(make_wav(ramp))),
        Row(doc_id=2, blob=bytearray(make_wav(quiet))),
    ])
    out = {r.doc_id: r for r in
           mm.extract_audio_features(df, fake=False).collect()}
    assert out[1].n_samples == 6 and out[2].n_samples == 4
    assert out[1].peak == 200  # |loudest|, sign-independent
    assert out[2].peak == 1
    want_rms = math.sqrt(sum(x * x for x in ramp) / len(ramp))
    assert out[1].rms == pytest.approx(want_rms)


def test_wav_decode_widths_and_gate():
    """8-bit recenters to signed, 32-bit round-trips, non-WAV raises."""
    import io
    import struct
    import wave

    def wav_bytes(width, payload):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(width)
            w.setframerate(8000)
            w.writeframes(payload)
        return buf.getvalue()

    eight = mm.decode_audio(wav_bytes(1, bytes([0, 128, 255])), fake=False)
    assert eight == [-128, 0, 127]
    thirty2 = mm.decode_audio(
        wav_bytes(4, struct.pack("<i", 70000) + struct.pack("<i", -70000)),
        fake=False)
    assert thirty2 == [70000, -70000]
    # 24-bit PCM (ADVICE r6): little-endian 3-byte frames, sign-extended —
    # a valid container/width must decode, not be misreported as non-WAV
    def i24(v):
        return struct.pack("<i", v)[:3]
    twenty4 = mm.decode_audio(
        wav_bytes(3, i24(1_000_000) + i24(-1_000_000) + i24(-1) + i24(0)),
        fake=False)
    assert twenty4 == [1_000_000, -1_000_000, -1, 0]
    with pytest.raises(NotImplementedError, match="not PCM WAV"):
        mm.decode_audio(b"ID3\x03mp3-ish garbage", fake=False)


def test_image_ahash_identical_blobs_pair_at_zero(spark):
    from pyspark.sql import Row

    from powerdatapipeline_spark.operators import multimodal as mm
    docs = spark.createDataFrame([
        Row(doc_id=1, blob=bytearray(b"same payload")),
        Row(doc_id=2, blob=bytearray(b"same payload")),
        Row(doc_id=3, blob=bytearray(b"different bytes")),
    ])
    hashes = mm.image_ahash(docs, fake=True)
    rows = {r.doc_id: (r.ahash_hi, r.ahash_lo) for r in hashes.collect()}
    assert rows[1] == rows[2]
    assert all(0 <= h < (1 << 32) for pair in rows.values() for h in pair)
    pairs = mm.ahash_neardup_pairs(hashes, max_hamming=0).collect()
    assert [(p.doc_a, p.doc_b, p.hamming) for p in pairs] == [(1, 2, 0)]


def test_ahash_neardup_validates_threshold(spark):
    import pytest as _pytest
    from pyspark.sql import Row

    from powerdatapipeline_spark.operators import multimodal as mm
    hashes = spark.createDataFrame(
        [Row(doc_id=1, ahash_hi=5, ahash_lo=9)])
    with _pytest.raises(ValueError, match="max_hamming"):
        mm.ahash_neardup_pairs(hashes, max_hamming=65)


def test_ahash_neardup_bands_parameter(spark):
    """The scale knob (VERDICT r14 #1 follow-up): every supported band
    count honors the pigeonhole guarantee — a pair with hamming < bands
    shares an exact band — and bands=4 reproduces the default keying."""
    import pytest as _pytest
    from pyspark.sql import Row

    from powerdatapipeline_spark.operators import multimodal as mm
    h = 0xDEADBEEF12345678
    hashes = spark.createDataFrame([
        Row(doc_id=1, ahash_hi=h >> 32, ahash_lo=h & 0xFFFFFFFF),
        # hamming 1 from doc 1 (flip the lowest bit)
        Row(doc_id=2, ahash_hi=h >> 32, ahash_lo=(h ^ 1) & 0xFFFFFFFF),
        # far from both (bitwise complement of doc 1)
        Row(doc_id=3, ahash_hi=(~h >> 32) & 0xFFFFFFFF,
            ahash_lo=(~h) & 0xFFFFFFFF),
    ])
    for bands in (2, 4, 8, 16):
        got = [(p.doc_a, p.doc_b, p.hamming) for p in
               mm.ahash_neardup_pairs(hashes, max_hamming=8,
                                      bands=bands).collect()]
        assert got == [(1, 2, 1)], f"bands={bands}: {got}"
    with _pytest.raises(ValueError, match="bands"):
        mm.ahash_neardup_pairs(hashes, bands=3)
