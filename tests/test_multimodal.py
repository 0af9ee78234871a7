"""Multimodal plumbing tests: schemas, batch shapes, fan-out,
determinism, and the gated real-decode stub."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from xml_to_sqlite3_spark.operators import multimodal as M
from xml_to_sqlite3_spark.operators import similarity as S


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        Row(
            media_id=1,
            kind="image",
            data=b"RIFF....WEBPfake-bytes-1",
            meta=Row(width=640, height=480, sample_rate=None, duration_ms=None, format="webp"),
        ),
        Row(
            media_id=2,
            kind="image",
            data=b"RIFF....WEBPfake-bytes-2",
            meta=Row(width=800, height=600, sample_rate=None, duration_ms=None, format="webp"),
        ),
        Row(
            media_id=3,
            kind="video",
            data=b"RIFF-fake-video",
            meta=Row(width=1920, height=1080, sample_rate=None, duration_ms=3500, format="mp4"),
        ),
        Row(
            media_id=4,
            kind="audio",
            data=b"fake-audio-pcm",
            meta=Row(width=None, height=None, sample_rate=16000, duration_ms=2000, format="wav"),
        ),
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_compressed_decode_is_gated(media):
    # webp/mp4 rows have no pure-python codec; the decode raises at
    # execution time inside the UDF (without PIL: the documented
    # NotImplementedError; with PIL: these fake bytes aren't a real
    # webp, so PIL's identify error surfaces instead)
    with pytest.raises(Exception, match="PIL|pure-python codec|identify"):
        M.decode_image(media).collect()


@pytest.mark.skipif(not M._HAS_PIL, reason="PIL not installed")
def test_pil_fallback_decodes_webp(spark):
    # real webp fixture via PIL itself; the fallback routes any
    # format outside codecs.SUPPORTED_FORMATS through Image.open
    import io

    import numpy as np
    from PIL import Image

    arr = np.zeros((4, 6, 3), dtype=np.uint8)
    arr[:, :, 0] = 200  # red-ish
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="WEBP", lossless=True)
    rows = [
        Row(
            media_id=1,
            kind="image",
            data=buf.getvalue(),
            meta=Row(width=6, height=4, sample_rate=None, duration_ms=None, format="webp"),
        )
    ]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = M.decode_image(df).collect()[0]
    assert (out["width"], out["height"]) == (6, 4)
    assert out["mean_r"] == pytest.approx(200.0, abs=1.0)
    assert out["mean_g"] == pytest.approx(0.0, abs=1.0)


def _ppm(pixels):
    """Encode a nested [[(r,g,b)...]...] list to P6 bytes."""
    import numpy as np

    from xml_to_sqlite3_spark.operators.codecs import encode_ppm

    return encode_ppm(np.array(pixels, dtype="uint8"))


@pytest.fixture(scope="module")
def real_images(spark):
    import numpy as np

    from xml_to_sqlite3_spark.operators.codecs import encode_bmp, encode_png
    from xml_to_sqlite3_spark.operators.jpeg import encode_jpeg

    red_blue = [[(255, 0, 0), (0, 0, 255)], [(255, 0, 0), (0, 0, 255)]]
    checker = [[(0, 0, 0), (255, 255, 255)], [(255, 255, 255), (0, 0, 0)]]
    rows = [
        Row(
            media_id=10, kind="image", data=_ppm(red_blue),
            meta=Row(width=2, height=2, sample_rate=None, duration_ms=None, format="ppm"),
        ),
        Row(
            media_id=11, kind="image", data=_ppm(checker),
            meta=Row(width=2, height=2, sample_rate=None, duration_ms=None, format="ppm"),
        ),
        Row(
            media_id=12, kind="image",
            data=encode_bmp(np.array(red_blue, dtype="uint8")),
            meta=Row(width=2, height=2, sample_rate=None, duration_ms=None, format="bmp"),
        ),
        Row(
            media_id=13, kind="image",
            data=encode_png(np.array(red_blue, dtype="uint8")),
            meta=Row(width=2, height=2, sample_rate=None, duration_ms=None, format="png"),
        ),
        Row(
            media_id=14, kind="image",
            data=encode_jpeg(np.full((16, 16, 3), (40, 180, 90), dtype="uint8"), quality=90),
            meta=Row(width=16, height=16, sample_rate=None, duration_ms=None, format="jpeg"),
        ),
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_real_decode_pixel_means(real_images):
    out = {r["media_id"]: r.asDict() for r in M.decode_image(real_images).collect()}
    # red_blue: two red + two blue pixels -> mean_r = mean_b = 127.5
    assert out[10]["mean_r"] == pytest.approx(127.5)
    assert out[10]["mean_g"] == 0.0
    assert out[10]["mean_b"] == pytest.approx(127.5)
    assert out[10]["width"] == 2 and out[10]["height"] == 2
    # checker: every channel mean 127.5
    assert out[11]["mean_r"] == pytest.approx(127.5)
    # BMP and PNG of the same pixels decode identically to the PPM —
    # for PNG that is a REAL inflate + unfilter on compressed bytes
    for mid in (12, 13):
        assert (out[mid]["mean_r"], out[mid]["mean_g"], out[mid]["mean_b"]) == (
            out[10]["mean_r"], out[10]["mean_g"], out[10]["mean_b"],
        )
        assert out[mid]["width"] == 2 and out[mid]["height"] == 2
    # JPEG is lossy: the flat-color raster decodes through the real
    # Huffman+IDCT path to within quantization error
    assert out[14]["width"] == 16 and out[14]["height"] == 16
    assert out[14]["mean_r"] == pytest.approx(40, abs=3)
    assert out[14]["mean_g"] == pytest.approx(180, abs=3)
    assert out[14]["mean_b"] == pytest.approx(90, abs=3)


def test_real_resize_pixels(real_images):
    from xml_to_sqlite3_spark.operators.codecs import decode_pnm

    out = {
        r["media_id"]: r.asDict()
        for r in M.resize_image(real_images, 4, 4).collect()
    }
    assert all(r["meta"]["width"] == 4 and r["meta"]["height"] == 4 for r in out.values())
    arr = decode_pnm(bytes(out[10]["data"]))
    assert arr.shape == (4, 4, 3)
    # nearest-neighbor of the 2x2 red|blue image: left half red, right half blue
    assert (arr[:, :2] == (255, 0, 0)).all()
    assert (arr[:, 2:] == (0, 0, 255)).all()


def test_pixel_features_content_derived(spark, real_images):
    import numpy as np

    feats = {
        r["media_id"]: np.array(r["embedding"])
        for r in M.extract_pixel_features(real_images, dim=16).collect()
    }
    # the BMP, PNG, and PPM encode the SAME pixels -> identical
    # vectors, which hash-derived features could never produce
    assert np.allclose(feats[10], feats[12])
    assert np.allclose(feats[10], feats[13])
    # different content -> different vector
    assert not np.allclose(feats[10], feats[11])
    assert all(abs(np.linalg.norm(v) - 1.0) < 1e-6 for v in feats.values())


def test_fake_decode_deterministic(media):
    a = {r["media_id"]: (r["mean_r"], r["mean_g"], r["mean_b"]) for r in M.fake_decode_image(media).collect()}
    b = {r["media_id"]: (r["mean_r"], r["mean_g"], r["mean_b"]) for r in M.fake_decode_image(media).collect()}
    assert a == b
    assert all(0 <= v < 1 for t in a.values() for v in t)
    assert a[1] != a[2]  # different bytes -> different stats


def test_resize_plan_rewrites_meta(media):
    out = M.resize_plan(media, 224, 224).select("media_id", "meta.width", "meta.height", "meta.format").collect()
    assert all(r["width"] == 224 and r["height"] == 224 for r in out)
    fmts = {r["media_id"]: r["format"] for r in out}
    assert fmts[3] == "mp4"  # untouched fields survive


def test_frame_sampling_fanout(media):
    frames = M.sample_frames(media, every_ms=1000).collect()
    # only the video row fans out: 3500ms at 1000ms -> frames at 0,1000,2000,3000
    assert len(frames) == 4
    assert all(r["media_id"] == 3 for r in frames)
    assert [r["ts_ms"] for r in sorted(frames, key=lambda r: r["frame_index"])] == [0, 1000, 2000, 3000]
    assert len({r["frame_md5"] for r in frames}) == 4


def test_features_feed_similarity(media):
    feats = M.extract_features(media, dim=16)
    assert dict(feats.dtypes)["embedding"] == "array<float>"
    out = S.cosine_topk(
        feats.filter("media_id = 1"), feats, k=2,
        query_id="media_id", corpus_id="media_id", vec_col="embedding",
    ).collect()
    assert len(out) == 2
    assert all(r["query_id"] == 1 and r["neighbor_id"] != 1 for r in out)


@pytest.fixture(scope="module")
def real_audio(spark):
    import numpy as np

    from xml_to_sqlite3_spark.operators.codecs import encode_wav

    t = np.linspace(0, 0.5, 4000, endpoint=False)
    tone = np.sin(2 * np.pi * 440 * t)  # 440 Hz, 0.5 s at 8 kHz
    silence = np.zeros(2000)  # 0.25 s
    rows = [
        Row(
            media_id=20, kind="audio", data=encode_wav(tone, 8000),
            meta=Row(width=None, height=None, sample_rate=8000, duration_ms=500, format="wav"),
        ),
        Row(
            media_id=21, kind="audio", data=encode_wav(silence, 8000),
            meta=Row(width=None, height=None, sample_rate=8000, duration_ms=250, format="wav"),
        ),
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_real_audio_decode(real_audio):
    out = {r["media_id"]: r.asDict() for r in M.decode_audio(real_audio).collect()}
    # true waveform stats: a full-scale sine has RMS 1/sqrt(2) and a
    # 440 Hz tone crosses zero ~880 times/s
    assert out[20]["sample_rate_real"] == 8000
    assert out[20]["duration_ms_real"] == 500
    assert out[20]["n_channels"] == 1
    assert out[20]["rms"] == pytest.approx(0.707, abs=0.01)
    assert out[20]["zero_crossing_rate"] == pytest.approx(880 / 8000, rel=0.05)
    assert out[21]["rms"] == 0.0
    assert out[21]["duration_ms_real"] == 250


def test_real_audio_decode_gates_compressed(spark):
    rows = [
        Row(
            media_id=22, kind="audio", data=b"ID3fake-mp3",
            meta=Row(width=None, height=None, sample_rate=44100, duration_ms=1000, format="mp3"),
        )
    ]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    # without soundfile: the documented NotImplementedError; with it:
    # these fake bytes aren't a real mp3, so its open error surfaces
    # (same contract as the image path's PIL gate test)
    with pytest.raises(
        Exception, match="pure-python codec for audio|soundfile|[Ff]ormat"
    ):
        M.decode_audio(df).collect()


@pytest.mark.skipif(not M._HAS_SOUNDFILE, reason="soundfile not installed")
def test_soundfile_seam_decodes_ogg(spark):
    # real ogg fixture via soundfile itself; the seam routes any
    # non-RIFF format through sf.read (mirror of the webp/PIL test)
    import io

    import numpy as np
    import soundfile as sf

    rate = 8000
    t = np.arange(rate) / rate
    wave = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float64)
    buf = io.BytesIO()
    sf.write(buf, wave, rate, format="OGG", subtype="VORBIS")
    rows = [
        Row(
            media_id=31,
            kind="audio",
            data=buf.getvalue(),
            meta=Row(
                width=None,
                height=None,
                sample_rate=rate,
                duration_ms=1000,
                format="ogg",
            ),
        )
    ]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = M.decode_audio(df).collect()[0]
    assert out["sample_rate_real"] == rate
    assert abs(out["duration_ms_real"] - 1000) <= 50
    assert out["rms"] > 0.2  # a 0.5-amplitude sine decodes near 0.35


def test_audio_features_content_derived(real_audio):
    import numpy as np

    feats = {
        r["media_id"]: np.array(r["embedding"])
        for r in M.extract_audio_features(real_audio, dim=16).collect()
    }
    assert len(feats[20]) == 16
    # tone -> flat unit-norm envelope; silence -> zero vector
    assert abs(np.linalg.norm(feats[20]) - 1.0) < 1e-6
    assert np.abs(feats[21]).max() == 0.0


def test_real_audio_resample(real_audio):
    out = {
        r["media_id"]: r.asDict()
        for r in M.decode_audio(M.resample_audio(real_audio, 4000)).collect()
    }
    # half the rate, same duration, tone RMS preserved
    assert out[20]["sample_rate_real"] == 4000
    assert out[20]["duration_ms_real"] == pytest.approx(500, abs=2)
    assert out[20]["rms"] == pytest.approx(0.707, abs=0.02)
    assert out[21]["rms"] == 0.0


def test_image_dhash_and_near_dup_pairs(spark):
    """dHash is stable across lossless re-encoding and small noise;
    hamming_pairs over the signatures finds image near-dups."""
    import numpy as np

    from xml_to_sqlite3_spark.operators.codecs import encode_png, encode_ppm
    from xml_to_sqlite3_spark.operators.jpeg import encode_jpeg

    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    noisy = np.clip(
        base.astype(int) + rng.integers(-6, 7, base.shape), 0, 255
    ).astype(np.uint8)
    other = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)

    def row(mid, data, fmt):
        return Row(
            media_id=mid,
            kind="image",
            data=data,
            meta=Row(width=32, height=32, sample_rate=None, duration_ms=None, format=fmt),
        )

    rows = [
        row(1, encode_ppm(base), "ppm"),
        row(2, encode_png(base), "png"),            # same pixels, different codec
        row(3, encode_jpeg(base, quality=95), "jpeg"),  # lossy but close
        row(4, encode_ppm(noisy), "ppm"),           # mild noise
        row(5, encode_ppm(other), "ppm"),           # unrelated
    ]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)

    sigs = {r["media_id"]: r["dhash"] for r in M.image_dhash(df).collect()}
    assert sigs[1] == sigs[2]  # lossless re-encode -> identical hash

    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in M.image_near_dup_pairs(df, max_hamming=10).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 10
    assert (1, 4) in pairs and pairs[(1, 4)] <= 10
    assert (1, 5) not in pairs and (2, 5) not in pairs


def test_mjpeg_real_frame_sampling_and_near_dup(spark):
    """Video frames are REAL for the mjpeg container: sample_frames
    fingerprints the actual per-frame JPEG bytes, sample_frame_images
    emits decodable image rows, and a planted near-duplicate frame
    pair surfaces through the same image_near_dup_pairs path stills
    use."""
    import hashlib

    import numpy as np
    from pyspark.sql import Row

    from xml_to_sqlite3_spark.operators import codecs

    def blocky(seed):
        blocks = np.random.RandomState(seed).randint(0, 256, (8, 8))
        plane = np.kron(blocks, np.ones((8, 8))).astype(np.uint8)
        return np.stack([plane, plane, plane], axis=2)

    a = blocky(1)
    noisy = np.clip(
        a.astype(int) + np.random.RandomState(9).randint(-3, 4, a.shape), 0, 255
    ).astype(np.uint8)
    b = blocky(2)
    c = blocky(3)
    mj = codecs.encode_mjpeg([a, noisy, b, c], quality=95)

    rows = [
        Row(
            media_id=5,
            kind="video",
            data=bytearray(mj),
            meta=Row(
                width=64, height=64, sample_rate=None,
                duration_ms=4000, format="mjpeg",
            ),
        )
    ]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)

    fr = sorted(M.sample_frames(df, every_ms=1000).collect(), key=lambda r: r.frame_index)
    assert [r.frame_index for r in fr] == [0, 1, 2, 3]
    frames = codecs.split_mjpeg(mj)
    assert len(frames) == 4
    # the fingerprint is the md5 of the frame's OWN bytes, not a
    # container-hash stand-in
    assert [r.frame_md5 for r in fr] == [
        hashlib.md5(f).hexdigest() for f in frames
    ]

    imgs = M.sample_frame_images(df, every_ms=1000)
    # per-frame rasters decode through the ordinary image path
    dec = M.decode_image(
        imgs.selectExpr("frame_id AS media_id", "kind", "data", "meta")
    ).collect()
    assert len(dec) == 4
    assert all(r.width == 64 and r.height == 64 for r in dec)

    pairs = M.image_near_dup_pairs(imgs, max_hamming=16, id_col="frame_id").collect()
    got = {tuple(sorted((r.doc_a, r.doc_b))) for r in pairs}
    fid = lambda i: 5 * 1_000_000 + i  # noqa: E731
    assert (fid(0), fid(1)) in got, f"planted near-dup pair missing: {got}"
    for x, y in [(0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]:
        assert (fid(x), fid(y)) not in got, f"false pair ({x},{y}): {got}"


def test_audio_metadata_wav_mp3_and_unknown(spark, real_audio):
    # a synthetic mp3: ID3v2 header + 38 MPEG1 Layer-III 128kbps
    # 44.1kHz stereo frames (417 bytes each, headers only — the
    # parser never touches payload) + a trailing ID3v1-style tag
    frame = bytes([0xFF, 0xFB, 0x90, 0x00]) + bytes(413)
    mp3 = b"ID3" + bytes([4, 0, 0, 0, 0, 0, 10]) + bytes(10) + frame * 38 + b"TAGjunk"
    rows = [
        Row(
            media_id=30, kind="audio", data=mp3,
            meta=Row(width=None, height=None, sample_rate=None, duration_ms=None, format="mp3"),
        ),
        Row(
            media_id=31, kind="audio", data=b"\x00\x01garbage",
            meta=Row(width=None, height=None, sample_rate=None, duration_ms=None, format="ogg"),
        ),
    ]
    df = real_audio.unionByName(spark.createDataFrame(rows, M.MEDIA_SCHEMA))
    out = {r["media_id"]: r.asDict() for r in M.audio_metadata(df).collect()}
    # wav rows: true header/waveform metadata, no bitrate concept
    assert out[20]["sample_rate_real"] == 8000
    assert out[20]["duration_ms_real"] == 500
    assert out[20]["n_channels"] == 1
    assert out[20]["bitrate_kbps"] is None
    # mp3 row: real frame-header metadata without any decode
    assert out[30]["sample_rate_real"] == 44100
    assert out[30]["duration_ms_real"] == round(38 * 1152 / 44100 * 1000)
    assert out[30]["n_channels"] == 2
    assert out[30]["bitrate_kbps"] == 128
    # unknown format: nulls, never a batch failure
    assert out[31]["sample_rate_real"] is None and out[31]["bitrate_kbps"] is None


def test_audio_metadata_truncated_wav_nulls_not_task_abort(spark):
    # a TRUNCATED RIFF header raises struct.error (not ValueError)
    # from unpack_from — the nulls-not-batch-failure contract must
    # hold for malformed rows of a KNOWN format too (ADVICE r8)
    rows = [
        Row(
            media_id=40, kind="audio", data=b"RIFF\x24\x00\x00\x00WAVEfmt ",
            meta=Row(width=None, height=None, sample_rate=None, duration_ms=None, format="wav"),
        ),
        Row(
            media_id=41, kind="audio", data=b"",
            meta=Row(width=None, height=None, sample_rate=None, duration_ms=None, format=None),
        ),
    ]
    # a STRUCTURALLY valid wav whose fmt chunk declares sample_rate=0:
    # the failure fires AFTER the rate is known (duration divides by
    # it) — the per-row appends must stay aligned so the good row
    # beside it still reports (r9 review finding)
    import struct

    zero_rate = (
        b"RIFF" + struct.pack("<I", 36 + 4) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 0, 0, 2, 16)
        + b"data" + struct.pack("<I", 4) + b"\x00\x01\x02\x03"
    )
    good = rows[0]  # truncated wav (nulls)
    rows = [
        Row(
            media_id=42, kind="audio", data=zero_rate,
            meta=Row(width=None, height=None, sample_rate=None, duration_ms=None, format="wav"),
        ),
        good,
        rows[1],
    ]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = {r["media_id"]: r.asDict() for r in M.audio_metadata(df).collect()}
    assert len(out) == 3
    for mid in (40, 41, 42):
        assert out[mid]["sample_rate_real"] is None
        assert out[mid]["duration_ms_real"] is None
        assert out[mid]["n_channels"] is None
        assert out[mid]["bitrate_kbps"] is None
