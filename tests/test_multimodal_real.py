"""Real multimodal decode kernels (VERDICT r2 item 2): pure-stdlib
PNG/WAV codecs + the decoder="real" path through the same mapInPandas
operators the fake path uses."""

import numpy as np
import pytest

from fluxgraph_spark.functions import codecs, multimodal


# ---------------------------------------------------------------------------
# codec round-trips (driver-side, no Spark)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(channels, filter_type):
    rng = np.random.default_rng(42 + channels * 10 + filter_type)
    arr = rng.integers(0, 256, size=(13, 7, channels), dtype=np.uint8)
    data = codecs.encode_png(arr, filter_type=filter_type)
    out = codecs.decode_png(data)
    assert out.shape == (13, 7, channels)
    assert np.array_equal(out, arr)


def test_png_rejects_unsupported():
    with pytest.raises(ValueError, match="signature"):
        codecs.decode_png(b"not a png at all")


def test_wav_roundtrip_stereo():
    rng = np.random.default_rng(7)
    samples = rng.integers(-30000, 30000, size=(441, 2), dtype=np.int16)
    data = codecs.encode_wav(samples, sample_rate=44100, n_channels=2)
    rate, ch, out = codecs.decode_wav(data)
    assert (rate, ch) == (44100, 2)
    assert np.array_equal(out, samples)


def test_resize_nearest_shapes_and_solid_color():
    arr = np.full((10, 20, 3), 200, dtype=np.uint8)
    out = codecs.resize_nearest(arr, width=5, height=4)
    assert out.shape == (4, 5, 3)
    assert (out == 200).all()


# ---------------------------------------------------------------------------
# Spark operators with decoder="real"
# ---------------------------------------------------------------------------

def _real_media_df(spark):
    """One solid-color 4x2 RGB PNG image + one 1kHz-ish square-wave WAV."""
    png = codecs.encode_png(np.full((2, 4, 3), 128, dtype=np.uint8))
    # 100 frames mono: +16384/-16384 alternating -> rms 0.5, mean 0, zcr ~1
    wav_samples = np.tile(np.array([16384, -16384], dtype=np.int16), 50)
    wav = codecs.encode_wav(wav_samples, sample_rate=8000)
    rows = [
        (1, "image", bytearray(png), {"width": 4, "height": 2, "duration_ms": None, "mime": "image/png"}),
        (2, "audio", bytearray(wav), {"width": None, "height": None, "duration_ms": 12, "mime": "audio/wav"}),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_extract_features_real(spark):
    media = _real_media_df(spark)
    feats = {
        r["media_id"]: r["feature"]
        for r in multimodal.extract_features(media, decoder="real").collect()
    }
    img = feats[1]
    assert img[0] == 4.0 and img[1] == 2.0 and img[2] == 3.0  # w, h, channels
    assert img[3] == pytest.approx(128 / 255)  # solid color mean
    assert img[6] == pytest.approx(0.0)        # std of a solid color
    assert img[7] == pytest.approx(2.0)        # aspect
    aud = feats[2]
    assert aud[0] == pytest.approx(100 / 8000)       # duration
    assert aud[1] == 1.0 and aud[2] == pytest.approx(8000 / 48000)
    assert aud[3] == pytest.approx(0.5, abs=1e-6)    # rms
    assert aud[4] == pytest.approx(0.0, abs=1e-6)    # mean
    assert aud[5] == pytest.approx(0.5, abs=1e-6)    # peak
    assert aud[6] == pytest.approx(1.0)              # zero-crossing rate


def test_resize_images_real_reencodes_pixels(spark):
    media = _real_media_df(spark).where("media_type = 'image'")
    out = multimodal.resize_images(media, width=8, height=6, decoder="real").collect()
    assert len(out) == 1
    row = out[0]
    assert row["meta"]["width"] == 8 and row["meta"]["height"] == 6
    assert row["meta"]["mime"] == "image/png"
    arr = codecs.decode_png(bytes(row["content"]))
    assert arr.shape == (6, 8, 3)
    assert (arr == 128).all()  # solid color survives the resize


def test_extract_features_real_rejects_unknown_bytes(spark):
    rows = [(9, "image", bytearray(b"mystery-bytes"), None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="PNG and WAV"):
        multimodal.extract_features(media, decoder="real").collect()


def test_sample_frames_real_rejects_non_avi(spark):
    """Non-AVI bytes on the real path fail loudly (no silent fake
    fallback)."""
    rows = [(3, "video", bytearray(b"fakevideo"), {"width": None, "height": None, "duration_ms": 3000, "mime": "video/fake"})]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="RIFF/AVI"):
        multimodal.sample_frames(media, decoder="real").collect()


def test_fake_path_unchanged_for_oracles(spark):
    """decoder='fake' output must stay byte-stable (the m_* oracles
    replay it as md5 hex arithmetic)."""
    media = _real_media_df(spark)
    feats = {
        r["media_id"]: r["feature"]
        for r in multimodal.extract_features(media).collect()
    }
    import hashlib

    png = codecs.encode_png(np.full((2, 4, 3), 128, dtype=np.uint8))
    want = [b / 255.0 for b in hashlib.md5(png).digest()[:8]]
    assert feats[1] == pytest.approx(want)


def test_wav_8bit_amplitude_parity():
    """8-bit PCM decodes to int16 full scale, so amplitude features are
    bit-depth-independent (a full-scale 8-bit square wave has the same
    rms as a full-scale 16-bit one)."""
    import struct

    payload = bytes([255, 0] * 50)  # full-scale unsigned 8-bit square
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    riff = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    wav8 = b"RIFF" + struct.pack("<I", len(riff)) + riff
    rate, ch, samples = codecs.decode_wav(wav8)
    assert (rate, ch) == (8000, 1)
    x = samples.astype(float) / 32768.0
    assert abs(x).max() == pytest.approx(1.0, abs=0.01)
    assert (x ** 2).mean() ** 0.5 == pytest.approx(1.0, abs=0.01)


def test_avi_roundtrip_exact():
    """AVI encode -> decode recovers every frame bit-for-bit, including
    non-4-byte-aligned row strides and the stored fps."""
    rng = np.random.RandomState(11)
    for shape in [(17, 23, 3), (3, 5, 3), (2, 8, 3)]:
        frames = [rng.randint(0, 256, shape, dtype=np.uint8) for _ in range(4)]
        data = codecs.encode_avi(frames, fps=2.0)
        assert codecs.sniff(data) == "avi"
        fps, out = codecs.decode_avi(data)
        assert fps == pytest.approx(2.0)
        assert len(out) == 4
        for a, b in zip(frames, out):
            assert np.array_equal(a, b)


def test_avi_rejects_unsupported_compression():
    """Compressions without a decoder (e.g. H.264) are rejected with a
    clear error, never a silent wrong answer.  (MJPEG is decodable now —
    see the round-trip tests below.)"""
    import struct as _struct

    frames = [np.zeros((2, 2, 3), dtype=np.uint8)]
    data = bytearray(codecs.encode_avi(frames))
    i = bytes(data).find(_struct.pack("<IiiHHI", 40, 2, 2, 1, 24, 0))
    assert i > 0
    data[i + 16 : i + 20] = b"H264"  # biCompression fourcc
    with pytest.raises(ValueError, match="unsupported AVI pixel format"):
        codecs.decode_avi(bytes(data))


def test_jpeg_roundtrip():
    """Baseline JPEG codec: constant images bit-exact (only an integer
    DC coefficient survives the all-ones quant table), arbitrary images
    within the DCT-rounding tolerance, odd dimensions cropped, and
    progressive JPEGs rejected with a clear error."""
    for v in (0, 77, 128, 255):
        img = np.full((2, 8), v, dtype=np.uint8)
        assert (codecs.decode_jpeg(codecs.encode_jpeg(img)) == v).all()
    const_rgb = np.full((4, 12, 3), (10, 200, 99), dtype=np.uint8)
    out = codecs.decode_jpeg(codecs.encode_jpeg(const_rgb))
    assert np.abs(out.astype(int) - const_rgb.astype(int)).max() <= 1

    rng = np.random.RandomState(7)
    gray = rng.randint(0, 256, (16, 24), dtype=np.uint8)
    out = codecs.decode_jpeg(codecs.encode_jpeg(gray))
    assert out.shape == (16, 24)
    assert np.abs(out.astype(int) - gray.astype(int)).max() <= 2
    rgb = rng.randint(0, 256, (11, 13, 3), dtype=np.uint8)  # odd dims
    out = codecs.decode_jpeg(codecs.encode_jpeg(rgb))
    assert out.shape == (11, 13, 3)
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 4

    bad = bytearray(codecs.encode_jpeg(np.zeros((8, 8), np.uint8)))
    bad[bad.find(b"\xff\xc0") + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        codecs.decode_jpeg(bytes(bad))


def test_mjpeg_avi_roundtrip():
    """MJPEG-in-AVI (VERDICT r4 item 2): frame chunks are standalone
    baseline JPEGs; the container walk + per-frame entropy decode
    recovers constant frames exactly and arbitrary RGB frames within
    codec tolerance."""
    consts = [np.full((2, 8), b, dtype=np.uint8) for b in (5, 250, 66)]
    fps, got = codecs.decode_avi(codecs.encode_avi(consts, fps=1.0, codec="mjpeg"))
    assert fps == 1.0 and len(got) == 3
    for f, b in zip(got, (5, 250, 66)):
        assert f.shape == (2, 8, 3) and (f == b).all()

    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 256, (8, 16, 3), dtype=np.uint8) for _ in range(2)]
    fps, got = codecs.decode_avi(codecs.encode_avi(frames, fps=2.0, codec="mjpeg"))
    assert fps == 2.0 and len(got) == 2
    for a, b in zip(got, frames):
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 4


def test_mjpeg_fourcc_variants_decode():
    """Real-world MJPEG files carry lowercase 'mjpg' or OpenDML 'dmb1'
    in biCompression — all decode identically (frame chunks are the
    same standalone baseline JPEGs)."""
    consts = [np.full((2, 8), b, dtype=np.uint8) for b in (7, 99)]
    data = codecs.encode_avi(consts, fps=1.0, codec="mjpeg")
    for fourcc in (b"mjpg", b"dmb1"):
        _fps, got = codecs.decode_avi(data.replace(b"MJPG", fourcc))
        assert len(got) == 2 and all(
            (f == b).all() for f, b in zip(got, (7, 99))
        )


def test_sample_frames_real_decodes_container(spark):
    """sample_frames(decoder='real') container-decodes synthesized AVIs:
    per-frame mean equals the digest-byte mean the construction planted,
    and frame counts follow the duration rule."""
    import hashlib

    docs = spark.createDataFrame(
        [(5, "hello world video test " * 10), (10, "short")],
        "doc_id long, text string",
    )
    vids = multimodal.video_table_from_documents(docs)
    rows = multimodal.sample_frames(vids, every_ms=1000, decoder="real").collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for doc_id, text in [(5, "hello world video test " * 10), (10, "short")]:
        dur = len(text) * 17 % 5000 + 1000
        want_frames = max(1, dur // 1000)
        got = sorted(by_media[doc_id], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in got] == list(range(want_frames))
        for r in got:
            digest = hashlib.md5(
                text.encode() + bytes([r["frame_idx"] % 256])
            ).digest()
            want_mean = sum(digest) / 16.0 / 255.0
            assert r["frame_feature"][0] == pytest.approx(want_mean, abs=1e-12)
            assert r["frame_feature"][4:8] == [8.0, 2.0, float(want_frames), 1.0]


def test_pq_small_corpus_stride(spark):
    """Corpus smaller than ksub: the LUT stride must follow the actual
    codebook size — distances stay finite and self-ranking sane."""
    from fluxgraph_spark.functions import similarity

    rows = [(i, [float(i)] * 16) for i in range(10)]  # 10 < ksub=16
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.where("vec_id = 0").selectExpr("vec_id AS query_id", "embedding")
    out = similarity.pq_adc_topk(emb, queries, k=5, m=4, ksub=16).collect()
    assert len(out) == 5
    assert all(r["adc_micro"] is not None and r["adc_micro"] >= 0 for r in out)


def test_decode_avi_audio_stream_listed_first():
    """A valid AVI may list its audio stream before the video stream;
    the audio strf (WAVEFORMATEX) must not be parsed as a
    BITMAPINFOHEADER — only the strf following an strh(vids) counts."""
    import struct

    import numpy as np

    from fluxgraph_spark.functions import codecs

    rng = np.random.RandomState(7)
    frames = [rng.randint(0, 255, (4, 6, 3)).astype("uint8") for _ in range(2)]
    data = codecs.encode_avi(frames, fps=2.0)

    def chunk(cid, body):
        return (
            cid + struct.pack("<I", len(body)) + body
            + (b"\x00" if len(body) & 1 else b"")
        )

    def lst(t, body):
        return chunk(b"LIST", t + body)

    # splice an auds strl (strh + WAVEFORMATEX strf) before the vids strl
    strh_a = (
        b"auds" + b"\x00" * 4
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 8000, 0, 100, 0, 0, 0)
        + struct.pack("<4h", 0, 0, 0, 0)
    )
    strf_a = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    auds = lst(b"strl", chunk(b"strh", strh_a) + chunk(b"strf", strf_a))

    (avih_size,) = struct.unpack("<I", data[28:32])
    ins = 32 + avih_size + (avih_size & 1)
    out = bytearray(data)
    out[ins:ins] = auds
    for off in (4, 16):  # RIFF size, hdrl LIST size
        (sz,) = struct.unpack("<I", bytes(out[off : off + 4]))
        struct.pack_into("<I", out, off, sz + len(auds))

    fps, got = codecs.decode_avi(bytes(out))
    _, want = codecs.decode_avi(data)
    assert fps == 2.0 and len(got) == 2
    for a, b in zip(got, want):
        assert np.array_equal(a, b)


def test_jpeg_restart_markers_and_420_subsampling():
    """The decoder's RST-segment and interleaved-MCU/upsample paths,
    driven by the encoder's restart_interval and 4:2:0 modes."""
    rng = np.random.RandomState(11)
    gray = rng.randint(0, 256, (24, 40), dtype=np.uint8)
    plain = codecs.decode_jpeg(codecs.encode_jpeg(gray))
    data = codecs.encode_jpeg(gray, restart_interval=2)
    assert b"\xff\xdd" in data and b"\xff\xd0" in data  # DRI + RST0
    assert np.array_equal(codecs.decode_jpeg(data), plain)

    const = np.full((20, 28, 3), (10, 200, 99), dtype=np.uint8)
    out = codecs.decode_jpeg(codecs.encode_jpeg(const, subsampling="420"))
    assert np.abs(out.astype(int) - const.astype(int)).max() <= 1

    g = rng.randint(0, 256, (16, 16), dtype=np.uint8)
    neutral = np.stack([g, g, g], axis=-1)  # constant chroma, full-res Y
    out = codecs.decode_jpeg(codecs.encode_jpeg(neutral, subsampling="420"))
    assert np.abs(out.astype(int) - neutral.astype(int)).max() <= 3

    odd = rng.randint(0, 256, (9, 21, 3), dtype=np.uint8)
    out = codecs.decode_jpeg(codecs.encode_jpeg(odd, subsampling="420"))
    assert out.shape == (9, 21, 3)


def test_jpeg_roundtrip_property():
    """Property test: any small uint8 image round-trips the baseline
    codec within the documented tolerance, at every (subsampling,
    restart) combination and both gray/RGB."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 20),
        w=st.integers(1, 20),
        ncomp=st.sampled_from([1, 3]),
        sub=st.sampled_from(["444", "420"]),
        ri=st.sampled_from([0, 2]),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(h, w, ncomp, sub, ri, seed):
        rng = np.random.RandomState(seed)
        if ncomp == 1 and sub == "420":
            sub = "444"  # chroma subsampling needs chroma
        if sub == "420":
            # arbitrary chroma + 2x2 averaging legitimately moves pixels
            # (and recomputed-luma checks break under gamut clipping), so
            # the property uses neutral-chroma images: full-res Y is what
            # 4:2:0 preserves, and it must round-trip tight
            g = rng.randint(0, 256, (h, w), dtype=np.uint8)
            img = np.stack([g, g, g], axis=-1)
            tol = 3
        else:
            shape = (h, w) if ncomp == 1 else (h, w, 3)
            img = rng.randint(0, 256, shape, dtype=np.uint8)
            tol = 2 if ncomp == 1 else 4
        out = codecs.decode_jpeg(
            codecs.encode_jpeg(img, subsampling=sub, restart_interval=ri)
        )
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= tol

    check()


def test_jpeg_fill_bytes_and_standalone_markers():
    """Length-less cases in the marker stream decode correctly: 0xFF
    fill bytes before a marker (T.81 B.1.1.2) and standalone TEM/stray
    RSTn markers between segments carry NO length field — the parser
    must advance past them without reading a bogus segment length
    (ADVICE r5: the old compensation resumed 2 bytes off and could
    over-run on a garbage length)."""
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = codecs.encode_jpeg(img)
    ref = codecs.decode_jpeg(data)

    # inject fill bytes + TEM + a stray RST4 right after SOI — all legal
    # inter-segment padding/markers a real encoder may emit
    patched = data[:2] + b"\xff\xff\xff\x01\xff\xd4" + data[2:]
    assert (codecs.decode_jpeg(patched) == ref).all()
    # and between two later segments (before the DQT marker)
    dqt = data.find(b"\xff\xdb", 2)
    patched = data[:dqt] + b"\xff\xff\xff\x01" + data[dqt:]
    assert (codecs.decode_jpeg(patched) == ref).all()


def test_jpeg_parallel_restart_segment_decode():
    """Restart segments decode INDEPENDENTLY (VERDICT r5 item 7): RSTn
    boundaries are byte-aligned with DC predictors reset, so a DRI
    frame splits into units that decode in any order or concurrently —
    bit-identical to the serial walk, on gray, 4:4:4 RGB and 4:2:0
    fixtures."""
    rng = np.random.RandomState(11)
    fixtures = [
        codecs.encode_jpeg(
            rng.randint(0, 256, (32, 48), dtype=np.uint8), restart_interval=2
        ),
        codecs.encode_jpeg(
            rng.randint(0, 256, (24, 40, 3), dtype=np.uint8), restart_interval=3
        ),
        codecs.encode_jpeg(
            rng.randint(0, 256, (33, 41, 3), dtype=np.uint8),
            restart_interval=1, subsampling="420",
        ),
    ]
    for data in fixtures:
        serial = codecs.decode_jpeg(data)
        split = codecs.decode_jpeg(data, workers=4)
        assert (serial == split).all() and serial.dtype == np.uint8
    # no DRI: the single-unit path is the whole scan
    plain = codecs.encode_jpeg(rng.randint(0, 256, (16, 16), dtype=np.uint8))
    assert (codecs.decode_jpeg(plain, workers=4) == codecs.decode_jpeg(plain)).all()


# ---------------------------------------------------------------------------
# MS Video 1 (CRAM) — the inter-frame tier (VERDICT r5 "missing" #2)
# ---------------------------------------------------------------------------

def _lattice(a):
    """Snap uint8 channels onto the RGB555 round-trip lattice."""
    q = a >> 3
    return ((q << 3) | (q >> 2)).astype(np.uint8)


def _quad_solid(rng, h, w):
    """A lattice frame whose 2x2 quadrants are solid — exactly
    representable by the 8-color mode (and often 1/2-color)."""
    fr = _lattice(rng.randint(0, 256, (h, w, 3)).astype(np.uint8))
    out = np.zeros_like(fr)
    for y in range(0, h, 2):
        for x in range(0, w, 2):
            out[y : y + 2, x : x + 2] = fr[y, x]
    return out


def test_msvideo1_frame_roundtrip_exact():
    """Frames within the codec's representable set (lattice colors,
    <= 2 per 2x2 quadrant) survive encode->decode bit-for-bit across
    all three block modes."""
    rng = np.random.RandomState(7)
    for _ in range(8):
        fr = _quad_solid(rng, 16, 24)
        enc = codecs.encode_msvideo1_frame(fr)
        assert np.array_equal(codecs.decode_msvideo1_frame(enc, 24, 16), fr)


def test_msvideo1_lossy_quantization_is_idempotent():
    """Arbitrary frames quantize (the codec is a lossy 2-colors-per-
    quadrant vector quantizer); re-encoding the decoded frame is a
    fixpoint — the determinism the oracle relies on."""
    rng = np.random.RandomState(13)
    fr = _lattice(rng.randint(0, 256, (16, 16, 3)).astype(np.uint8))
    d1 = codecs.decode_msvideo1_frame(codecs.encode_msvideo1_frame(fr), 16, 16)
    d2 = codecs.decode_msvideo1_frame(codecs.encode_msvideo1_frame(d1), 16, 16)
    assert np.array_equal(d1, d2)


def test_msvideo1_interframe_skips_and_reconstructs():
    """The temporal path: a frame whose right half matches the previous
    frame encodes smaller (skip codes) and decodes back bit-for-bit
    THROUGH the previous frame; a fully static frame collapses to one
    skip run; a skip code in a keyframe raises."""
    rng = np.random.RandomState(5)
    f0 = _quad_solid(rng, 16, 16)
    f1 = f0.copy()
    f1[:, :8] = _lattice(np.array([200, 16, 48], dtype=np.uint8))
    d0 = codecs.decode_msvideo1_frame(codecs.encode_msvideo1_frame(f0), 16, 16)
    e_delta = codecs.encode_msvideo1_frame(f1, prev=d0)
    e_full = codecs.encode_msvideo1_frame(f1)
    assert len(e_delta) < len(e_full)
    assert np.array_equal(
        codecs.decode_msvideo1_frame(e_delta, 16, 16, prev=d0), f1
    )
    e_static = codecs.encode_msvideo1_frame(f0, prev=d0)
    assert len(e_static) == 2  # ONE skip code covers all 16 blocks
    assert np.array_equal(
        codecs.decode_msvideo1_frame(e_static, 16, 16, prev=d0), f0
    )
    with pytest.raises(ValueError, match="keyframe"):
        codecs.decode_msvideo1_frame(e_static, 16, 16)


def test_msvideo1_skip_range_color_collision():
    """A 1-color block whose RGB555 word falls in the skip-code range
    (0x0400-0x07FF) must re-encode as a 2-color block, not a code that
    parses as a skip."""
    col = codecs._rgb555_expand(0x0400 | (5 << 5) | 9)
    fr = np.tile(np.array(col, dtype=np.uint8), (8, 8, 1))
    enc = codecs.encode_msvideo1_frame(fr)
    assert np.array_equal(codecs.decode_msvideo1_frame(enc, 8, 8), fr)


def test_msvideo1_avi_roundtrip_and_keyframe_index():
    """Container round-trip: sequential decode reconstructs every frame
    (static halves ride skip codes), biBitCount=16/biCompression='CRAM'
    are honored, and idx1 flags ONLY frame 0 as a keyframe."""
    import struct as _struct

    rng = np.random.RandomState(3)
    base = _quad_solid(rng, 8, 16)
    frames = []
    for i in range(4):
        f = base.copy()
        f[:, :8] = _lattice(np.array([40 * i + 9, 200 - 30 * i, 77], np.uint8))
        frames.append(f)
    avi = codecs.encode_avi(frames, fps=2.0, codec="msvideo1")
    fps, dec = codecs.decode_avi(avi)
    assert fps == pytest.approx(2.0) and len(dec) == 4
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)
    # idx1 keyframe flags: 0x10 on the first entry only
    i = avi.find(b"idx1")
    n_entries = _struct.unpack("<I", avi[i + 4 : i + 8])[0] // 16
    flags = [
        _struct.unpack("<I", avi[i + 8 + 16 * k + 4 : i + 8 + 16 * k + 8])[0]
        for k in range(n_entries)
    ]
    assert flags[0] & 0x10 and not any(f & 0x10 for f in flags[1:])


def test_msvideo1_avi_rejects_8bpp():
    """The palettized 8 bpp variant is rejected with a clear error, not
    misdecoded as RGB555."""
    import struct as _struct

    frames = [np.zeros((4, 4, 3), dtype=np.uint8)]
    avi = codecs.encode_avi(frames, codec="msvideo1")
    bad = avi.replace(
        _struct.pack("<HHI", 1, 16, codecs._CRAM_FOURCC),
        _struct.pack("<HHI", 1, 8, codecs._CRAM_FOURCC),
        1,
    )
    with pytest.raises(ValueError, match="16 bpp"):
        codecs.decode_avi(bad)


def test_msvideo1_dimension_guard():
    with pytest.raises(ValueError, match="multiples of 4"):
        codecs.encode_msvideo1_frame(np.zeros((6, 8, 3), dtype=np.uint8))


def test_msvideo1_sample_frames_real(spark):
    """End-to-end through the Spark operators: the synthesized CRAM
    table decodes via sample_frames(decoder='real'), means match the
    digest arithmetic (left varying + right static), and every
    after-the-first frame exercises the skip path."""
    import hashlib

    docs = spark.createDataFrame(
        [(11, "inter-frame codec test document text"),
         (22, "a second, longer document so durations differ!!")],
        "doc_id long, text string",
    )
    vids = multimodal.msvideo1_video_table_from_documents(docs)
    rows = multimodal.sample_frames(vids, every_ms=1000, decoder="real").collect()
    assert rows
    def snap(b):
        q = b >> 3
        return (q << 3) | (q >> 2)
    for r in rows:
        text = {11: "inter-frame codec test document text",
                22: "a second, longer document so durations differ!!"}[r["media_id"]]
        raw = text.encode()
        left = [snap(b) for b in hashlib.md5(raw + bytes([r["frame_idx"]])).digest()[:3]]
        right = [snap(b) for b in hashlib.md5(raw + b"R").digest()[:3]]
        want = (sum(left) + sum(right)) / 6.0 / 255.0
        assert r["frame_feature"][0] == pytest.approx(want, abs=1e-12)
        assert (r["frame_feature"][4], r["frame_feature"][5]) == (8.0, 8.0)


# ---------------------------------------------------------------------------
# IMA/DVI ADPCM (WAV wFormatTag 0x0011)
# ---------------------------------------------------------------------------

def test_adpcm_constant_blocks_roundtrip_exact():
    """Per-block constant signals round-trip BIT-EXACTLY: the header
    stores the first sample verbatim with step index 0, and nibble 0 at
    step 7 reconstructs diff = 7 >> 3 = 0 — the property the
    x_audio_adpcm oracle is built on, in both mono and stereo."""
    rng = np.random.default_rng(3)
    for n_ch in (1, 2):
        db = 32
        spb = db * 2 + 1
        amps = rng.integers(-32768, 32768, size=(6, n_ch))
        sig = np.repeat(amps, spb, axis=0).astype(np.int16)
        wav = codecs.encode_wav(
            sig, 8000, n_ch, codec="adpcm", block_align=(db + 4) * n_ch
        )
        rate, ch, out = codecs.decode_wav(wav)
        assert (rate, ch) == (8000, n_ch)
        assert np.array_equal(out, sig)


def test_adpcm_matches_scalar_reference_decoder():
    """The block-vectorized decode equals a straight scalar transcription
    of the IMA reference algorithm, nibble by nibble (incl. the seeded
    per-block step index the encoder writes)."""
    import struct

    rng = np.random.default_rng(7)
    sig = rng.integers(-9000, 9000, size=407).astype(np.int16)
    ba = 36  # db=32, spb=65 -> final block padded, fact trims
    wav = codecs.encode_wav(sig, 8000, 1, codec="adpcm", block_align=ba)
    _, _, fast = codecs.decode_wav(wav)
    assert fast.shape == (407, 1)

    pos, data = 12, None
    while pos + 8 <= len(wav):
        cid = wav[pos:pos + 4]
        (clen,) = struct.unpack("<I", wav[pos + 4:pos + 8])
        if cid == b"data":
            data = wav[pos + 8:pos + 8 + clen]
        pos += 8 + clen + (clen & 1)
    ST, IT = codecs._IMA_STEP_TABLE, codecs._IMA_INDEX_TABLE
    ref = []
    for b0 in range(0, len(data), ba):
        blk = data[b0:b0 + ba]
        pred, idx = struct.unpack("<h", blk[:2])[0], blk[2]
        ref.append(pred)
        for byte in blk[4:]:
            for nib in (byte & 0xF, byte >> 4):
                step, mag = ST[idx], nib & 7
                diff = (step >> 3) + (step if mag & 4 else 0) \
                    + ((step >> 1) if mag & 2 else 0) \
                    + ((step >> 2) if mag & 1 else 0)
                pred += -diff if nib & 8 else diff
                pred = max(-32768, min(32767, pred))
                idx = max(0, min(88, idx + IT[mag]))
                ref.append(pred)
    assert np.array_equal(fast[:, 0], np.array(ref[:407], dtype=np.int16))


def test_adpcm_sine_quality_and_fact_trim():
    """Varying signal: ~4x compression with >30 dB SNR at several
    amplitudes; a frame count that is not a multiple of the block size
    pads the tail block and the fact chunk trims it back."""
    t = np.arange(1234)
    for amp in (300, 8000, 30000):
        sine = (amp * np.sin(2 * np.pi * t / 50)).astype(np.int16)
        wav = codecs.encode_wav(sine, 16000, 1, codec="adpcm")
        _, _, out = codecs.decode_wav(wav)
        assert out.shape == (1234, 1)
        err = out[:, 0].astype(float) - sine.astype(float)
        snr = 10 * np.log10((sine.astype(float) ** 2).mean() / (err ** 2).mean())
        assert snr > 30, (amp, snr)
        assert len(wav) < 2 * sine.nbytes // 3  # genuinely compressed


def test_adpcm_stereo_interleave_not_mixed():
    """L and R carry different constants; a broken 4-byte-group
    interleave would mix them across channels."""
    db, spb = 4, 9
    sig = np.empty((spb * 3, 2), dtype=np.int16)
    for j, (l, r) in enumerate([(-5000, 7000), (11111, -1), (0, -32768)]):
        sig[j * spb:(j + 1) * spb] = (l, r)
    wav = codecs.encode_wav(sig, 8000, 2, codec="adpcm", block_align=(db + 4) * 2)
    _, _, out = codecs.decode_wav(wav)
    assert np.array_equal(out, sig)


def test_adpcm_rejects_bad_layouts():
    stereo = np.zeros((10, 2), dtype=np.int16)
    with pytest.raises(ValueError, match="block_align"):
        codecs.encode_wav(stereo, 8000, 2, codec="adpcm", block_align=33)
    with pytest.raises(ValueError, match="block layout"):
        codecs.encode_wav(stereo, 8000, 2, codec="adpcm", block_align=14)
    with pytest.raises(ValueError, match="codec"):
        codecs.encode_wav(np.zeros(10, dtype=np.int16), 8000, 1, codec="mp3")
    with pytest.raises(ValueError, match="empty"):
        codecs.encode_wav(np.zeros(0, dtype=np.int16), 8000, 1, codec="adpcm")


def test_adpcm_audio_block_means_spark(spark):
    """End-to-end through the Spark operators: the synthesized ADPCM
    table decodes via audio_block_means, every block's channel means
    equal the digest amplitudes (the x_audio_adpcm contract)."""
    import hashlib

    texts = {13: "compressed audio codec test doc", 26: "another text!"}
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    au = multimodal.adpcm_audio_table_from_documents(docs)
    rows = multimodal.audio_block_means(au, samples_per_block=65).collect()
    assert rows
    seen = {}
    for r in rows:
        raw = texts[r["media_id"]].encode()
        for mark, col in ((b"L", "amp_l"), (b"R", "amp_r")):
            d = hashlib.md5(raw + mark + bytes([r["block_idx"]])).digest()
            assert r[col] == ((d[0] << 8) | d[1]) - 32768
        seen.setdefault(r["media_id"], set()).add(r["block_idx"])
    for doc_id, text in texts.items():
        assert seen[doc_id] == set(range(len(text) % 7 + 2))


def test_adpcm_roundtrip_property():
    """Property test: ANY int16 signal (any length, mono or stereo, any
    legal block size) encodes to a parseable ADPCM WAV that decodes to
    the original shape, with every decoded sample within one adaptive
    step of a signal-scaled bound, and the decode agreeing with a
    scalar transcription of the IMA reference algorithm."""
    import struct

    from hypothesis import given, settings, strategies as st

    @settings(max_examples=20, deadline=None)
    @given(
        n=st.integers(1, 400),
        n_ch=st.sampled_from([1, 2]),
        db=st.sampled_from([4, 8, 32]),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(n, n_ch, db, seed):
        rng = np.random.default_rng(seed)
        sig = rng.integers(-32768, 32768, size=(n, n_ch)).astype(np.int16)
        ba = (db + 4) * n_ch
        wav = codecs.encode_wav(sig, 8000, n_ch, codec="adpcm", block_align=ba)
        rate, ch, out = codecs.decode_wav(wav)
        assert (rate, ch) == (8000, n_ch) and out.shape == sig.shape

        # scalar reference parity over the full padded stream
        pos, data = 12, None
        while pos + 8 <= len(wav):
            cid = wav[pos:pos + 4]
            (clen,) = struct.unpack("<I", wav[pos + 4:pos + 8])
            if cid == b"data":
                data = wav[pos + 8:pos + 8 + clen]
            pos += 8 + clen + (clen & 1)
        ST, IT = codecs._IMA_STEP_TABLE, codecs._IMA_INDEX_TABLE
        ref = [[] for _ in range(n_ch)]
        for b0 in range(0, len(data), ba):
            blk = data[b0:b0 + ba]
            preds, idxs = [], []
            for c in range(n_ch):
                preds.append(struct.unpack_from("<h", blk, 4 * c)[0])
                idxs.append(min(88, blk[4 * c + 2]))
                ref[c].append(preds[c])
            body = blk[4 * n_ch:]
            for g in range(0, len(body), 4 * n_ch):
                for c in range(n_ch):
                    for byte in body[g + 4 * c: g + 4 * c + 4]:
                        for nib in (byte & 0xF, byte >> 4):
                            step, mag = ST[idxs[c]], nib & 7
                            diff = (step >> 3) \
                                + (step if mag & 4 else 0) \
                                + ((step >> 1) if mag & 2 else 0) \
                                + ((step >> 2) if mag & 1 else 0)
                            p = preds[c] + (-diff if nib & 8 else diff)
                            preds[c] = max(-32768, min(32767, p))
                            idxs[c] = max(0, min(88, idxs[c] + IT[mag]))
                            ref[c].append(preds[c])
        for c in range(n_ch):
            assert np.array_equal(
                out[:, c], np.array(ref[c][:n], dtype=np.int16)
            ), (n, n_ch, db, seed, c)

    check()
