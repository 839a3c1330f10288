"""Multimodal plumbing: binary columns through Arrow-batched mapInPandas."""

from __future__ import annotations

import pytest

from youtube_analytics_lakehouse_databricks_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, "image", mm.encode_synth_image(8, 4, seed=1), ("s3://bucket/a.img", 40, "synth")),
        (2, "image", mm.encode_synth_image(16, 16, seed=2), ("s3://bucket/b.img", 264, "synth")),
        (3, "audio", b"\x00\x01", ("s3://bucket/c.wav", 2, "wav")),
        (4, "image", None, ("s3://bucket/d.img", 0, "synth")),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA).repartition(2)


def test_extract_image_features(media_df):
    feats = {r["media_id"]: r for r in mm.extract_image_features(media_df).collect()}
    # audio and NULL-content rows excluded; schema/typing exact
    assert set(feats) == {1, 2}
    f1 = feats[1]
    assert (f1["width"], f1["height"], f1["n_pixels"]) == (8, 4, 32)
    # deterministic fake decode: recompute expected mean in plain python
    px = [(x * 31 + y * 7 + 1) % 256 for y in range(4) for x in range(8)]
    assert abs(f1["mean_intensity"] - sum(px) / len(px)) < 1e-9
    assert f1["max_intensity"] == max(px)


def test_resize_images_roundtrip(media_df, spark):
    resized = mm.resize_images(media_df, 4, 4)
    out = {r["media_id"]: bytes(r["content"]) for r in resized.collect()}
    assert set(out) == {1, 2}
    w, h, px = mm._decode_synth(out[1])
    assert (w, h) == (4, 4) and len(px) == 16
    # resized content itself decodes through the feature extractor
    df2 = spark.createDataFrame(
        [(9, "image", out[2], None)], mm.MEDIA_SCHEMA
    )
    feats = mm.extract_image_features(df2).collect()[0]
    assert (feats["width"], feats["height"]) == (4, 4)


def test_extract_audio_features(spark):
    import math

    samples = [0, 1000, -1000, 1000, -1000, 0, 500, -500]
    rows = [
        (10, "audio", mm.encode_synth_audio(8000, samples), None),
        (11, "image", mm.encode_synth_image(2, 2), None),  # excluded
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in mm.extract_audio_features(df).collect()}
    assert set(feats) == {10}
    f = feats[10]
    assert f["n_samples"] == 8
    assert abs(f["duration_s"] - 8 / 8000) < 1e-12
    assert f["peak"] == 1000
    expected_rms = math.sqrt(sum(s * s for s in samples) / len(samples))
    assert abs(f["rms"] - expected_rms) < 1e-9


def test_sample_video_frames(spark):
    video = mm.encode_synth_video(4, 2, n_frames=7, seed=3)
    rows = [
        (20, "video", video, None),
        (21, "image", mm.encode_synth_image(2, 2), None),  # excluded
        (22, "video", None, None),  # NULL content skipped
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA).repartition(2)
    frames = {r["frame_idx"]: r for r in mm.sample_video_frames(df, every_n=3).collect()}
    # every 3rd frame of 7, frame 0 always included
    assert sorted(frames) == [0, 3, 6]
    f3 = frames[3]
    assert (f3["media_id"], f3["n_frames"], f3["width"], f3["height"]) == (20, 7, 4, 2)
    px = [(x * 31 + y * 7 + 3 * 13 + 3) % 256 for y in range(2) for x in range(4)]
    assert abs(f3["mean_intensity"] - sum(px) / len(px)) < 1e-9
    # sampled frames compose with the image operators downstream
    frames_df = mm.sample_video_frames(df, every_n=3).select(
        (mm.F.col("media_id") * 100 + mm.F.col("frame_idx")).alias("media_id"),
        mm.F.lit("image").alias("media_type"),
        mm.F.col("frame_content").alias("content"),
        mm.F.lit(None).cast(mm.MEDIA_SCHEMA["meta"].dataType).alias("meta"),
    )
    feats = mm.extract_image_features(frames_df).collect()
    assert {r["media_id"] for r in feats} == {2000, 2003, 2006}
    assert all((r["width"], r["height"]) == (4, 2) for r in feats)


def test_real_png_roundtrip_and_mixed_table(spark):
    px = bytes((x * 31 + y * 7 + 1) % 256 for y in range(4) for x in range(8))
    png = mm.encode_png_gray(8, 4, px)
    w, h, out = mm.decode_real_image(png)
    assert (w, h, out) == (8, 4, px)
    # PNG and SYNTH payloads mix in one binary column; identical pixel
    # content yields identical features through either codec
    rows = [
        (30, "image", png, None),
        (31, "image", mm.encode_synth_image(8, 4, seed=1), None),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in mm.extract_image_features(df).collect()}
    assert feats[30]["mean_intensity"] == feats[31]["mean_intensity"]
    assert feats[30]["max_intensity"] == feats[31]["max_intensity"]


def test_real_png_unfilters_all_filter_types():
    """Decode scanlines forward-filtered with each PNG filter (0..4)."""
    import struct
    import zlib

    width, height = 6, 5
    px = [[(x * 13 + y * 29) % 256 for x in range(width)] for y in range(height)]

    def forward_filter(f, line, prev):
        out = []
        for i, v in enumerate(line):
            a = line[i - 1] if i else 0
            b = prev[i]
            c = prev[i - 1] if i else 0
            if f == 0:
                out.append(v & 0xFF)
            elif f == 1:
                out.append((v - a) & 0xFF)
            elif f == 2:
                out.append((v - b) & 0xFF)
            elif f == 3:
                out.append((v - ((a + b) >> 1)) & 0xFF)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out.append((v - pred) & 0xFF)
        return bytes(out)

    raw = b""
    prev = [0] * width
    for y in range(height):
        f = y % 5
        raw += bytes([f]) + forward_filter(f, px[y], prev)
        prev = px[y]

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w, h, out = mm.decode_real_image(png)
    assert (w, h) == (width, height)
    assert out == bytes(v for row in px for v in row)


def test_real_png_rgb_reduces_to_luma():
    import struct
    import zlib

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    # 2x1 RGB: pure red, pure white
    raw = b"\x00" + bytes([255, 0, 0, 255, 255, 255])
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w, h, out = mm.decode_real_image(png)
    assert (w, h) == (2, 1)
    assert out[0] == (299 * 255 + 500) // 1000  # 601 luma of red
    assert out[1] == 255


def test_real_wav_roundtrip_and_features(spark):
    import math

    samples = [0, 1000, -1000, 1000, -1000, 0, 500, -500]
    wav = mm.encode_wav(8000, samples)
    rate, pcm = mm.decode_real_audio(wav)
    assert rate == 8000 and list(pcm) == samples
    # stereo averages to mono
    stereo = mm.encode_wav(8000, [100, 300, -100, -300], channels=2)
    _, mono = mm.decode_real_audio(stereo)
    assert list(mono) == [200, -200]
    # WAV payloads flow through the audio feature extractor unchanged
    df = spark.createDataFrame([(40, "audio", wav, None)], mm.MEDIA_SCHEMA)
    f = mm.extract_audio_features(df).collect()[0]
    assert f["n_samples"] == 8 and f["peak"] == 1000
    expected_rms = math.sqrt(sum(s * s for s in samples) / len(samples))
    assert abs(f["rms"] - expected_rms) < 1e-9


def test_real_flac_decode_and_features(spark):
    """FLAC payloads now decode to real samples (rice-coded subframes),
    so the feature extractor returns true waveform stats for the most
    common lossless format — not a container-metadata stub."""
    import math

    samples = [0, 1000, -1000, 1000, -1000, 0, 500, -500] * 40
    flac = mm.encode_flac(8000, samples, block_size=64)
    rate, pcm = mm.decode_real_flac(flac)
    assert rate == 8000 and list(pcm) == samples

    df = spark.createDataFrame([(41, "audio", flac, None)], mm.MEDIA_SCHEMA)
    f = mm.extract_audio_features(df).collect()[0]
    assert f["n_samples"] == len(samples) and f["peak"] == 1000
    expected_rms = math.sqrt(sum(s * s for s in samples) / len(samples))
    assert abs(f["rms"] - expected_rms) < 1e-9
    # and the inventory pass still reads only STREAMINFO
    m = mm.audio_container_metadata(df).collect()[0]
    assert m["container"] == "flac" and m["n_samples"] == len(samples)


def test_real_y4m_video_roundtrip_and_sampling(spark):
    """Real YUV4MPEG2 payloads decode and flow through frame sampling
    exactly like SYNTH ones — same sampled indices, same luma features."""
    w, h = 4, 2
    lumas = [
        bytes((x * 31 + y * 7 + f * 13 + 3) % 256 for y in range(h) for x in range(w))
        for f in range(7)
    ]
    y4m = mm.encode_y4m(w, h, lumas)
    n, dw, dh, planes = mm.decode_real_video(y4m)
    assert (n, dw, dh) == (7, w, h)
    assert planes == b"".join(lumas)
    rows = [
        (50, "video", y4m, None),
        (51, "video", mm.encode_synth_video(w, h, n_frames=7, seed=3), None),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.sample_video_frames(df, every_n=3).collect()
    by_media: dict = {}
    for r in out:
        by_media.setdefault(r["media_id"], {})[r["frame_idx"]] = r
    assert sorted(by_media[50]) == sorted(by_media[51]) == [0, 3, 6]
    for f in (0, 3, 6):  # same pixel recipe -> identical features via either codec
        assert by_media[50][f]["mean_intensity"] == by_media[51][f]["mean_intensity"]
        assert bytes(by_media[50][f]["frame_content"]) == bytes(by_media[51][f]["frame_content"])


def test_unsupported_payloads_clearly_rejected():
    with pytest.raises(NotImplementedError):
        mm.decode_real_image(b"JFIF not a png")
    with pytest.raises(NotImplementedError):
        mm.decode_real_audio(b"OggS not riff")
    with pytest.raises(NotImplementedError):  # compressed video needs a codec lib
        mm.decode_real_video(b"\x00\x00\x00 ftyp")


def test_mp4_metadata_parse():
    """Box-walk metadata from a codec-less mp4 container fixture."""
    blob = mm.encode_minimal_mp4(640, 360, 12.5, timescale=1000)
    m = mm.parse_mp4_metadata(blob)
    assert m["major_brand"] == "isom"
    assert abs(m["duration_s"] - 12.5) < 1e-9
    assert (m["width"], m["height"], m["n_tracks"]) == (640, 360, 1)
    # decode (vs metadata) still requires a codec and still says so
    with pytest.raises(NotImplementedError):
        mm.decode_real_video(blob)
    with pytest.raises(NotImplementedError):
        mm.parse_mp4_metadata(b"\x00" * 32)


def test_sample_video_frames_degrades_on_mp4(spark):
    """A shard mixing decodable (y4m) and codec-only (mp4) video yields
    frames for the former and ONE metadata row (no frame bytes) for the
    latter — never an error."""
    y4m = mm.encode_y4m(4, 2, [bytes(range(8)), bytes(range(8, 16))])
    mp4 = mm.encode_minimal_mp4(1280, 720, 3.0)
    df = spark.createDataFrame(
        [(20, "video", y4m, None), (21, "video", mp4, None)], mm.MEDIA_SCHEMA
    )
    rows = mm.sample_video_frames(df, every_n=1).collect()
    by_id: dict = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id[20]) == 2 and all(r["frame_content"] for r in by_id[20])
    (meta,) = by_id[21]
    assert meta["frame_idx"] == -1 and meta["n_frames"] == 0
    assert (meta["width"], meta["height"]) == (1280, 720)
    assert meta["frame_content"] is None and meta["mean_intensity"] is None


def test_video_container_metadata(spark):
    """Uniform inventory row across mp4 / y4m / SYNTH / junk payloads."""
    rows = [
        (30, "video", mm.encode_minimal_mp4(320, 240, 7.25), None),
        (31, "video", mm.encode_y4m(6, 4, [bytes(24)] * 3), None),
        (32, "video", mm.encode_synth_video(5, 3, 4), None),
        (33, "video", b"\xde\xad\xbe\xef" * 8, None),
        (34, "image", mm.encode_synth_image(2, 2), None),  # excluded
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in mm.video_container_metadata(df).collect()}
    assert set(out) == {30, 31, 32, 33}
    m = out[30]
    assert m["container"] == "mp4" and m["major_brand"] == "isom"
    assert abs(m["duration_s"] - 7.25) < 1e-9 and (m["width"], m["height"]) == (320, 240)
    assert out[31]["container"] == "y4m" and out[31]["n_frames"] == 3
    assert out[32]["container"] == "synth" and (out[32]["width"], out[32]["height"]) == (5, 3)
    assert out[33]["container"] == "unknown" and out[33]["width"] is None


def test_webm_metadata_parse():
    """EBML walk on a codec-less webm fixture: doc type, duration from
    TimestampScale x Duration, dims from the video TrackEntry."""
    blob = mm.encode_minimal_webm(1920, 1080, 4.5)
    m = mm.parse_webm_metadata(blob)
    assert m["doc_type"] == "webm"
    assert abs(m["duration_s"] - 4.5) < 1e-9
    assert (m["width"], m["height"], m["n_tracks"]) == (1920, 1080, 1)
    with pytest.raises(NotImplementedError):
        mm.parse_webm_metadata(b"\x00" * 16)


def test_webm_degrades_and_inventories(spark):
    """webm joins mp4 in the graceful-degrade contract for sampling and
    the container inventory."""
    webm = mm.encode_minimal_webm(640, 480, 2.0)
    df = spark.createDataFrame([(40, "video", webm, None)], mm.MEDIA_SCHEMA)
    (meta,) = mm.sample_video_frames(df, every_n=1).collect()
    assert meta["frame_idx"] == -1 and (meta["width"], meta["height"]) == (640, 480)
    assert meta["frame_content"] is None
    (inv,) = mm.video_container_metadata(df).collect()
    assert inv["container"] == "webm" and abs(inv["duration_s"] - 2.0) < 1e-9


def test_real_bmp_roundtrip(spark):
    """24bpp BMP (bottom-up, padded rows) decodes to the same luma
    contract; mixed with PNG and SYNTH in one table."""
    px = bytes((x * 13 + y * 29) % 256 for y in range(5) for x in range(7))
    blob = mm.encode_bmp(7, 5, px)
    w, h, out = mm.decode_real_bmp(blob)
    assert (w, h) == (7, 5) and out == px  # gray BGR -> same luma back
    rows = [(50, "image", blob, None), (51, "image", mm.encode_synth_image(3, 3), None)]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in mm.extract_image_features(df).collect()}
    assert (feats[50]["width"], feats[50]["height"]) == (7, 5)
    assert abs(feats[50]["mean_intensity"] - sum(px) / len(px)) < 1e-9
    with pytest.raises(NotImplementedError):
        mm.decode_real_bmp(b"not a bmp")


def test_real_gif_roundtrip(spark):
    """GIF89a with full LZW decode (variable code width, CLEAR handling)
    round-trips through the grayscale palette."""
    px = bytes((x * 7 + y * 3) % 256 for y in range(4) for x in range(6))
    blob = mm.encode_gif_gray(6, 4, px)
    w, h, out = mm.decode_real_gif(blob)
    assert (w, h) == (6, 4) and out == px
    df = spark.createDataFrame([(60, "image", blob, None)], mm.MEDIA_SCHEMA)
    (f,) = mm.extract_image_features(df).collect()
    assert (f["width"], f["height"], f["n_pixels"]) == (6, 4, 24)
    with pytest.raises(NotImplementedError):
        mm.decode_real_gif(b"\x00" * 20)


def test_gif_lzw_kwkwk_case():
    """The LZW corner where a code references the entry being defined
    (KwKwK): decode a hand-built compressed stream that triggers it."""
    # encode "aaaa" with real LZW (min_code=2): CLEAR, a(0), then code 6
    # (=aa, defined by the decoder while reading it), END
    min_code = 2
    clear, end = 4, 5

    bits = []
    def emit(code, size):
        for i in range(size):
            bits.append((code >> i) & 1)
    emit(clear, 3); emit(0, 3); emit(6, 3); emit(end, 3)
    data = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j, bit in enumerate(bits[i:i+8]):
            b |= bit << j
        data.append(b)
    out = mm._gif_lzw_decode(bytes(data), min_code)
    assert out == b"\x00\x00\x00"  # a + aa (the KwKwK expansion)


def test_foreign_bytes_never_kill_a_shard(spark):
    """A crawl shard mixing valid and foreign payloads across all three
    modalities completes: junk image cells yield auditable null-metric
    rows, junk audio/video cells are skipped — never a task failure."""
    junk = b"\xfe\xed\xfa\xce" * 10  # wrong magic, wrong length for SYNTH
    rows = [
        (70, "image", mm.encode_synth_image(4, 4), None),
        (71, "image", junk, None),
        (72, "audio", mm.encode_synth_audio(8000, [1, -1, 2, -2]), None),
        (73, "audio", junk + b"\x01", None),  # odd payload length
        (74, "video", mm.encode_synth_video(3, 2, 2), None),
        (75, "video", junk, None),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in mm.extract_image_features(df).collect()}
    assert feats[70]["width"] == 4
    assert 71 in feats and feats[71]["width"] is None  # audited, not dropped
    audio = {r["media_id"] for r in mm.extract_audio_features(df).collect()}
    assert audio == {72}
    video = {r["media_id"] for r in mm.sample_video_frames(df, 1).collect()}
    assert video == {74}
    resized = {r["media_id"] for r in mm.resize_images(df, 2, 2).collect()}
    assert resized == {70}


def test_jpeg_metadata_degrade(spark):
    """JPEG dims parse from the SOF marker walk without a DCT decoder;
    the feature extractor emits a metadata row (dims, null intensities)."""
    blob = mm.encode_minimal_jpeg(800, 600)
    m = mm.parse_jpeg_metadata(blob)
    assert (m["width"], m["height"], m["n_components"]) == (800, 600, 1)
    assert m["progressive"] is False
    with pytest.raises(NotImplementedError):
        mm.parse_jpeg_metadata(b"\x00" * 16)
    df = spark.createDataFrame([(80, "image", blob, None)], mm.MEDIA_SCHEMA)
    (f,) = mm.extract_image_features(df).collect()
    assert (f["width"], f["height"]) == (800, 600)
    assert f["n_pixels"] is None and f["mean_intensity"] is None


def test_truncated_magic_matching_bytes_never_kill_a_shard(spark):
    """Round-5 ADVICE fix: corrupt payloads that MATCH a magic (truncated
    downloads — the most common real-crawl corruption) raise struct.error
    / ValueError / IndexError from decode internals, not the decoders'
    NotImplementedError. The per-cell handlers must absorb them all."""
    bmp_ok = mm.encode_bmp(4, 3, bytes(range(12)))
    gif_ok = mm.encode_gif_gray(3, 3, bytes(range(9)))
    rows = [
        (90, "image", mm.encode_synth_image(4, 4), None),          # valid
        (91, "image", b"BM\x01\x02", None),                        # truncated BMP header
        (92, "image", bmp_ok[:40], None),                          # BMP cut mid-header
        (93, "image", bmp_ok[:-20], None),                         # BMP pixel data truncated
        (94, "image", b"GIF89a\xff", None),                        # truncated GIF
        (95, "image", gif_ok[: len(gif_ok) // 2], None),           # GIF cut mid-blocks
        (96, "image", b"GIF89a" + b"\x99" * 30, None),             # GIF garbage block walk
        (97, "image", b"\xff\xd8\xff\xc0\x00\x05\x08\x00", None),  # JPEG truncated SOF
        (98, "image", mm.encode_png_gray(2, 2, bytes(4))[:20], None),  # PNG truncated
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in mm.extract_image_features(df).collect()}
    assert feats[90]["width"] == 4  # the valid cell still decodes
    for mid in range(91, 99):
        assert mid in feats and feats[mid]["n_pixels"] is None, mid
    resized = {r["media_id"] for r in mm.resize_images(df, 2, 2).collect()}
    assert resized == {90}


def test_malformed_containers_never_kill_a_shard(spark):
    """mp4/webm payloads with valid magics but malformed internals (e.g.
    an EBML Duration element of unexpected width) must degrade, not
    struct.error the task — in BOTH sample_video_frames and
    video_container_metadata."""
    good_webm = mm.encode_minimal_webm(640, 480, 2.0)
    # corrupt the 8-byte Duration float into a 3-byte element
    bad_webm = good_webm.replace(
        b"\x44\x89\x88", b"\x44\x89\x83"
    )[: len(good_webm) - 5]
    bad_mp4 = (b"\x00\x00\x00\x14ftypisom" + b"\x00" * 4)[:14]  # truncated box tree
    rows = [
        (85, "video", mm.encode_synth_video(2, 2, 2), None),
        (86, "video", bad_webm, None),
        (87, "video", bad_mp4, None),
        (88, "video", mm.encode_minimal_webm(320, 240, 1.0), None),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    sampled = mm.sample_video_frames(df, 1).collect()
    ids = {r["media_id"] for r in sampled}
    assert 85 in ids and 88 in ids  # valid synth + valid webm both emit
    inv = {r["media_id"]: r for r in mm.video_container_metadata(df).collect()}
    assert len(inv) == 4  # every cell audits — none killed the task
    assert inv[88]["width"] == 320
    # the corrupt containers audit as rows (metadata or unknown), never crash
    assert 86 in inv and 87 in inv


def test_bmp_hostile_header_rejected():
    """Hostile BMP headers (negative/zero dims, pixel grid beyond the
    buffer) raise the documented NotImplementedError, not numpy errors."""
    good = mm.encode_bmp(4, 4, bytes(range(16)))
    # claim a pixel grid far past the end of the buffer
    huge_h = good[:22] + (10**6).to_bytes(4, "little") + good[26:]
    for bad in (
        huge_h,
        good[:18] + (0).to_bytes(4, "little") + good[22:],  # w = 0
        good[:18] + (2**32 - 5).to_bytes(4, "little") + good[22:],  # w < 0
    ):
        with pytest.raises(NotImplementedError):
            mm.decode_real_bmp(bad)


def test_real_jpeg_decodes_pixels_in_pipeline(spark):
    """A REAL baseline JPEG now decodes to pixels (huffman + IDCT, round
    5): extract_image_features returns actual intensities, not the
    metadata degrade row — while a scanless JPEG in the same shard still
    degrades to dims-only, and both compose with resize."""
    import numpy as np

    px = bytes((x * 5 + y * 11) % 256 for y in range(24) for x in range(32))
    real = mm.encode_baseline_jpeg_gray(32, 24, px, color=True, restart_interval=4)
    rows = [
        (60, "image", real, None),
        (61, "image", mm.encode_minimal_jpeg(800, 600), None),  # no scan data
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in mm.extract_image_features(df).collect()}
    exp = np.frombuffer(px, np.uint8)
    assert feats[60]["width"] == 32 and feats[60]["n_pixels"] == 32 * 24
    assert abs(feats[60]["mean_intensity"] - float(exp.mean())) <= 1.0
    assert feats[61]["width"] == 800 and feats[61]["n_pixels"] is None
    resized = {r["media_id"]: r for r in mm.resize_images(df, 8, 6).collect()}
    assert set(resized) == {60}
    w, h, small = mm._decode_image(resized[60]["content"])
    assert (w, h) == (8, 6)


def test_flac_metadata_roundtrip():
    raw = mm.encode_minimal_flac(96000, 2, 24, 960000)
    m = mm.parse_flac_metadata(raw)
    assert (m["sample_rate"], m["channels"], m["bits_per_sample"]) == (96000, 2, 24)
    assert m["duration_s"] == 10.0
    with pytest.raises(NotImplementedError):
        mm.parse_flac_metadata(b"fLaC\x80\x00\x00")  # truncated before STREAMINFO
    with pytest.raises(NotImplementedError):
        mm.parse_flac_metadata(b"not flac at all")


def test_mp3_metadata_frame_walk():
    raw = mm.encode_minimal_mp3(77, bitrate_kbps=64, sample_rate=32000)
    m = mm.parse_mp3_metadata(raw)
    assert m["n_frames"] == 77 and m["sample_rate"] == 32000
    assert abs(m["duration_s"] - 77 * 1152 / 32000) < 1e-9
    # the ID3v2 tag is skipped via its syncsafe length
    tagged = mm.parse_mp3_metadata(mm.encode_minimal_mp3(5, id3=True))
    assert tagged["n_frames"] == 5
    # a trailing partial frame is not counted
    cut = mm.parse_mp3_metadata(raw[: len(raw) - 30])
    assert cut["n_frames"] == 76
    with pytest.raises(NotImplementedError):
        mm.parse_mp3_metadata(b"\x00" * 64)


def test_ogg_opus_metadata():
    m = mm.parse_ogg_metadata(mm.encode_minimal_ogg_opus(1, 24000, 144000))
    # opus granules tick at 48 kHz regardless of the input rate
    assert m["codec"] == "opus" and m["sample_rate"] == 24000
    assert m["duration_s"] == 3.0 and m["channels"] == 1
    with pytest.raises(NotImplementedError):
        mm.parse_ogg_metadata(b"OggS" + b"\x00" * 30)  # no id header


def test_ogg_opus_truncated_head_rejected():
    # an OpusHead body cut to 14 bytes loses part of the 4-byte sample
    # rate at [12:16]; int.from_bytes would happily parse the 2-byte
    # remnant as a bogus rate, so the parser must reject short heads
    head = b"OpusHead" + bytes([1, 2]) + (312).to_bytes(2, "little") + b"\x80\xbb"
    page = (
        b"OggS"
        + bytes([0, 0x02])
        + (0).to_bytes(8, "little")
        + (1).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + bytes([1, len(head)])
        + head
    )
    with pytest.raises(NotImplementedError):
        mm.parse_ogg_metadata(page)


def test_audio_container_metadata_inventory(spark):
    rows = [
        (1, "audio", mm.encode_wav(8000, [0, 100, -100] * 100), ("a.wav", 0, "wav")),
        (2, "audio", mm.encode_synth_audio(16000, [5, -5] * 50), ("b.synth", 0, "synth")),
        (3, "audio", mm.encode_minimal_flac(44100, 2, 16, 44100), ("c.flac", 0, "flac")),
        (4, "audio", mm.encode_minimal_mp3(10), ("d.mp3", 0, "mp3")),
        (5, "audio", mm.encode_minimal_ogg_opus(2, 48000, 48000), ("e.ogg", 0, "ogg")),
        (6, "audio", b"\xde\xad\xbe\xef\x99", ("f.bin", 0, "???")),
        (7, "audio", mm.encode_minimal_flac(44100, 1, 16, 1)[:9], ("g.flac", 0, "flac")),
        (8, "video", mm.encode_synth_video(4, 4, 2), ("h.vid", 0, "synth")),
        (9, "audio", None, ("i.null", 0, "null")),
        (10, "audio", mm.encode_wav(8000, [100, 300, -100, -300], channels=2),
         ("j.wav", 0, "wav")),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA).repartition(3)
    got = {r["media_id"]: r for r in mm.audio_container_metadata(df).collect()}
    # video and NULL rows are out of scope; everything else has one row
    assert set(got) == {1, 2, 3, 4, 5, 6, 7, 10}
    assert got[1]["container"] == "wav" and got[1]["sample_rate"] == 8000
    # stereo WAV reports the CONTAINER's channel count and frame count,
    # not decode_real_audio's post-downmix mono contract
    assert got[10]["channels"] == 2 and got[10]["n_samples"] == 2
    assert got[10]["bits_per_sample"] == 16
    assert got[2]["container"] == "synth" and got[2]["n_samples"] == 100
    assert got[3]["container"] == "flac" and got[3]["duration_s"] == 1.0
    assert got[4]["container"] == "mp3" and got[4]["duration_s"] > 0.2
    assert got[5]["container"] == "ogg" and got[5]["codec"] == "opus"
    # foreign bytes and a truncated magic-matching payload audit as
    # unknown instead of failing the shard
    assert got[6]["container"] == "unknown" and got[6]["sample_rate"] is None
    assert got[7]["container"] == "unknown"
