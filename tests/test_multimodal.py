"""Multimodal operators: REAL container-header decode (PNG IHDR /
JPEG SOFn walk / GIF logical screen — stdlib byte parsing, no codec),
the fixture-image builder round-trip, and the fake-dims fallback for
unrecognized payloads."""

import zlib

import pytest

from ukrainian_ocr_pipeline_spark.operators.multimodal import (
    FIXTURE_IMAGE_BYTES,
    build_fixture_image,
    decode_image_header,
    media_header_meta,
    synth_image_corpus,
)

# A complete, valid 1x1 red PNG serialized by hand (sig + IHDR + IDAT
# with a real zlib stream + IEND) — a known-good external-shape file,
# not one produced by our own builder.
_IDAT = zlib.compress(b"\x00\xff\x00\x00")


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (len(body).to_bytes(4, "big") + tag + body
            + (zlib.crc32(tag + body) & 0xFFFFFFFF).to_bytes(4, "big"))


ONE_PX_PNG = (b"\x89PNG\r\n\x1a\n"
              + _chunk(b"IHDR", (1).to_bytes(4, "big")
                       + (1).to_bytes(4, "big") + bytes([8, 2, 0, 0, 0]))
              + _chunk(b"IDAT", _IDAT) + _chunk(b"IEND", b""))


def test_decode_real_one_pixel_png():
    assert decode_image_header(ONE_PX_PNG) == ("png", 1, 1)


def test_decode_jpeg_walks_past_app_segments():
    # SOI + APP0 + a fat COM segment + SOF2 (progressive) — dims must
    # come from the SOFn segment, not a fixed offset
    com = b"\xff\xfe" + (2 + 30).to_bytes(2, "big") + b"x" * 30
    sof2 = (b"\xff\xc2" + (11).to_bytes(2, "big") + bytes([8])
            + (480).to_bytes(2, "big") + (640).to_bytes(2, "big")
            + bytes([1, 0x11, 0, 0]))
    blob = b"\xff\xd8" + com + sof2 + b"\xff\xd9"
    assert decode_image_header(blob) == ("jpeg", 640, 480)


def test_decode_jpeg_dht_is_not_a_frame_header():
    # 0xC4 (DHT) sits inside C0-CF but carries no dimensions; a naive
    # range check would misread Huffman table bytes as width/height
    dht = b"\xff\xc4" + (2 + 5).to_bytes(2, "big") + b"\x00" * 5
    sof0 = (b"\xff\xc0" + (11).to_bytes(2, "big") + bytes([8])
            + (7).to_bytes(2, "big") + (9).to_bytes(2, "big")
            + bytes([1, 0x11, 0, 0]))
    blob = b"\xff\xd8" + dht + sof0 + b"\xff\xd9"
    assert decode_image_header(blob) == ("jpeg", 9, 7)


def test_decode_gif_little_endian():
    blob = b"GIF87a" + (300).to_bytes(2, "little") \
        + (200).to_bytes(2, "little") + bytes([0, 0, 0]) + b"\x3b"
    assert decode_image_header(blob) == ("gif", 300, 200)


@pytest.mark.parametrize("bad", [
    b"", b"\x89PNG", b"\xff\xd8\xff", b"GIF89",
    b"\x89PNG\r\n\x1a\nXXXXJUNK" + b"\x00" * 16,   # sig but no IHDR
    b"\xff\xd8\xff\xd9",                           # SOI+EOI, no SOFn
    b"not an image at all",
])
def test_decode_rejects_non_images(bad):
    assert decode_image_header(bad) is None


def test_decode_webp_vp8l_and_lossy_bitstreams():
    """The VP8L 14-bit packed fields and the VP8 lossy start-code path
    are decoded from hand-built bitstreams (the builder only emits
    VP8X, so these pin the other two chunk layouts independently)."""
    import struct

    def riff(payload):
        return b"RIFF" + struct.pack("<I", len(payload) + 4) + b"WEBP" + payload

    # VP8L: w=259, h=77 -> minus-one fields 258 / 76 packed 14+14 bits
    wm, hm = 258, 76
    bits = wm | (hm << 14)
    vp8l_body = b"\x2f" + bits.to_bytes(4, "little")
    vp8l = riff(b"VP8L" + struct.pack("<I", len(vp8l_body)) + vp8l_body)
    assert decode_image_header(vp8l) == ("webp", 259, 77)

    # VP8 lossy: 3-byte frame tag, 9D 01 2A start code, u16le dims
    vp8_body = (b"\x00\x00\x00" + b"\x9d\x01\x2a"
                + struct.pack("<HH", 320, 240))
    vp8 = riff(b"VP8 " + struct.pack("<I", len(vp8_body)) + vp8_body)
    assert decode_image_header(vp8) == ("webp", 320, 240)

    # RIFF/WEBP with an unknown first chunk is unrecognized
    junk = riff(b"JUNK" + struct.pack("<I", 10) + b"\x00" * 10)
    assert decode_image_header(junk) is None


def test_decode_rejects_corrupt_dims():
    """Zero or int32-overflowing declared dims are corrupt headers, not
    decodable images: a 0x0 PNG would divide-by-zero aspect math and a
    4-billion-pixel-wide PNG would fail the Arrow int cast mid-job."""
    import struct
    zero_png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
                + struct.pack(">II5B", 0, 0, 8, 2, 0, 0, 0) + b"\x00" * 4)
    huge_png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
                + struct.pack(">II5B", 4_000_000_000, 5, 8, 2, 0, 0, 0)
                + b"\x00" * 4)
    zero_gif = b"GIF89a" + struct.pack("<HH", 0, 200) + bytes([0, 0, 0])
    zero_jpeg = (b"\xff\xd8\xff\xc0" + struct.pack(">HB", 11, 8)
                 + struct.pack(">HH", 0, 640) + bytes([1, 0x11, 0, 0])
                 + b"\xff\xd9")
    for blob in (zero_png, huge_png, zero_gif, zero_jpeg):
        assert decode_image_header(blob) is None, blob[:8]


def test_fake_columns_keep_byte_length_semantics(spark):
    """media_metadata's fake_* columns are byte-length arithmetic by
    contract (their SQL oracle), even for a payload that happens to
    start with an ASCII image signature — text beginning 'GIF87a' must
    NOT be header-parsed there (that's media_header_meta's job)."""
    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        media_metadata,
    )
    trap = "GIF87a and the rest is ordinary prose".encode()
    df = spark.createDataFrame([(1, trap)], "doc_id long, blob binary")
    r = media_metadata(df).collect()[0]
    n = len(trap)
    assert (r["fake_width"], r["fake_height"]) == (64 + n % 512,
                                                   64 + (n * 7) % 512)


@pytest.mark.parametrize("fmt,w,h", [
    ("png", 1, 1), ("png", 1024, 64), ("jpeg", 640, 480),
    ("jpeg", 65535, 1), ("gif", 300, 200), ("gif", 1, 65535),
    ("webp", 1, 1), ("webp", 1024, 64), ("webp", 65535, 65535),
])
def test_builder_roundtrip_and_fixed_lengths(fmt, w, h):
    blob = build_fixture_image(fmt, w, h)
    assert len(blob) == FIXTURE_IMAGE_BYTES[fmt]
    assert decode_image_header(blob) == (fmt, w, h)


def test_builder_rejects_bad_dims():
    for w, h in ((0, 5), (5, 0), (70000, 5)):
        with pytest.raises(ValueError):
            build_fixture_image("png", w, h)
    with pytest.raises(ValueError):
        build_fixture_image("bmp", 5, 5)


def test_media_header_meta_mixed_corpus(spark):
    rows = [(1, ONE_PX_PNG), (2, build_fixture_image("jpeg", 12, 34)),
            (3, b"plain text payload"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    got = {r["doc_id"]: r for r in media_header_meta(df).collect()}
    assert (got[1]["fmt"], got[1]["width"], got[1]["height"]) == ("png", 1, 1)
    assert (got[2]["fmt"], got[2]["width"], got[2]["height"]) == ("jpeg", 12, 34)
    # unrecognized payloads keep the deterministic fake dims, fmt NULL
    n = len(b"plain text payload")
    assert got[3]["fmt"] is None
    assert (got[3]["width"], got[3]["height"]) == (64 + n % 512,
                                                  64 + (n * 7) % 512)
    assert (got[4]["fmt"], got[4]["n_bytes"]) == (None, 0)


def test_synth_corpus_headers_decode_to_doc_id_arithmetic(spark):
    df = spark.createDataFrame([(i,) for i in range(30)], "doc_id long")
    got = {r["doc_id"]: r
           for r in media_header_meta(synth_image_corpus(df)).collect()}
    for i in range(30):
        fmt = ("png", "jpeg", "gif", "webp")[i % 4]
        assert got[i]["fmt"] == fmt, i
        assert got[i]["width"] == 1 + (i * 7) % 1024
        assert got[i]["height"] == 1 + (i * 13) % 1024
        assert got[i]["n_bytes"] == FIXTURE_IMAGE_BYTES[fmt]


# --------------------------------------------------------------------------
# audio/video header decode (WAV RIFF chunks, MP4 ISO-BMFF mvhd)


def test_decode_wav_walks_past_extra_chunks():
    """A LIST chunk before fmt/data (common in real recorders) must be
    skipped by the chunk walk, including the word-alignment pad byte
    after an odd-sized chunk."""
    import struct

    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        decode_av_header,
        build_fixture_wav,
    )

    plain = build_fixture_wav(16000, 2, 8000)
    assert decode_av_header(plain) == ("wav", 16000, 2, 500)

    odd_list = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad
    spliced = plain[:12] + odd_list + plain[12:]
    fixed = spliced[:4] + struct.pack(
        "<I", len(spliced) - 8) + spliced[8:]
    assert decode_av_header(fixed) == ("wav", 16000, 2, 500)


def test_decode_mp4_mvhd_v0_and_v1():
    import struct

    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        build_fixture_mp4,
        decode_av_header,
    )

    assert decode_av_header(build_fixture_mp4(1000, 90500)) == (
        "mp4", None, None, 90500)
    assert decode_av_header(build_fixture_mp4(600, 90000)) == (
        "mp4", None, None, 150000)

    # version-1 mvhd: u64 timestamps and duration
    body = (bytes([1, 0, 0, 0]) + struct.pack(">QQ", 0, 0)
            + struct.pack(">I", 48000) + struct.pack(">Q", 4_800_000)
            + bytes(80))
    mvhd = struct.pack(">I", 8 + len(body)) + b"mvhd" + body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    ftyp = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 0)
    assert decode_av_header(ftyp + moov) == ("mp4", None, None, 100000)


def test_decode_wav_uses_header_byte_rate_not_pcm_arithmetic():
    """Review regression: duration must come from nAvgBytesPerSec (the
    header's authoritative byte rate) — rate * block_align is wrong for
    compressed formats.  An ADPCM-style fmt (format tag 0x11, byte rate
    4055) must yield data*1000//4055, and a declared data size that
    overruns the blob (truncated download) must reject."""
    import struct

    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        build_fixture_wav,
        decode_av_header,
    )

    data = bytes(8110)
    fmt = struct.pack("<HHIIHH", 0x11, 1, 8000, 4055, 256, 4)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    adpcm = b"RIFF" + struct.pack("<I", len(body)) + body
    assert decode_av_header(adpcm) == ("wav", 8000, 1, 2000)

    # truncated: declared data size exceeds what the blob holds
    whole = build_fixture_wav(8000, 1, 1000)
    assert decode_av_header(whole) == ("wav", 8000, 1, 125)
    assert decode_av_header(whole[:100]) is None
    # 0xFFFFFFFF streaming placeholder
    streaming = whole.replace(struct.pack("<I", 2000),
                              struct.pack("<I", 0xFFFFFFFF))
    assert decode_av_header(streaming) is None
    # fmt chunk declaring fewer than the 16 standard bytes
    shortfmt = whole.replace(b"fmt " + struct.pack("<I", 16),
                             b"fmt " + struct.pack("<I", 4))
    assert decode_av_header(shortfmt) is None


def test_decode_av_rejects_corrupt():
    import struct

    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        build_fixture_mp4,
        build_fixture_wav,
        decode_av_header,
    )

    wav = build_fixture_wav(8000, 1, 100)
    no_fmt = wav[:12] + wav[36:]          # data chunk only
    no_fmt = no_fmt[:4] + struct.pack("<I", len(no_fmt) - 8) + no_fmt[8:]
    zero_ts = build_fixture_mp4(1, 5)
    zero_ts = zero_ts.replace(struct.pack(">II", 1, 5),
                              struct.pack(">II", 0, 5))
    for bad in (b"", b"RIFF", b"RIFF1234WAVE", no_fmt, zero_ts,
                b"not a container at all padded out to length 44!!"):
        assert decode_av_header(bad) is None, bad[:12]


def _wav_with_rate(rate: int, byte_rate: int) -> bytes:
    import struct
    data = bytes(32)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 1, 1, rate, byte_rate, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _mp4_v1(timescale: int, duration: int) -> bytes:
    import struct
    ftyp = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 0)
    mvhd_body = (bytes([1, 0, 0, 0])                 # version 1 + flags
                 + struct.pack(">QQ", 0, 0)          # creation/mod u64
                 + struct.pack(">I", timescale)
                 + struct.pack(">Q", duration)
                 + bytes(80))                        # rate..next-track
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    return ftyp + moov


def test_decode_av_rejects_schema_overflowing_fields():
    # ADVICE r4: structurally valid headers whose DECLARED fields blow
    # the output schema must parse to None, not wrap negative through
    # the int32 Arrow cast (WAV rate) or raise at Arrow conversion and
    # kill the mapInPandas job (MP4 v1 u64 duration)
    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        decode_av_header,
    )

    assert decode_av_header(_wav_with_rate(16000, 32000)) == (
        "wav", 16000, 1, 1)                        # control: sane parses
    assert decode_av_header(_wav_with_rate(3_000_000_000, 32000)) is None
    assert decode_av_header(_wav_with_rate(1 << 31, 32000)) is None

    assert decode_av_header(_mp4_v1(600, 90000)) == (
        "mp4", None, None, 150000)                 # control: v1 parses
    # duration * 1000 // 1 = 9.2e21 > int64
    assert decode_av_header(_mp4_v1(1, 1 << 63)) is None
    assert decode_av_header(_mp4_v1(1, (1 << 64) - 1)) is None


def test_decode_jpeg_standalone_markers_have_no_length():
    # VERDICT r4 wrong-#3: TEM (0x01) and RSTn (0xD0-D7) are standalone
    # markers (ITU T.81 B.1.1.3) — the walk must skip exactly 2 bytes,
    # not read payload bytes as a segment length and desync
    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        decode_image_header,
    )

    sof0 = (b"\xff\xc0" + (11).to_bytes(2, "big") + bytes([8])
            + (7).to_bytes(2, "big") + (9).to_bytes(2, "big")
            + bytes([1, 0x11, 0, 0]))
    blob = b"\xff\xd8" + b"\xff\x01" + b"\xff\xd0" + b"\xff\xd7" \
        + sof0 + b"\xff\xd9"
    assert decode_image_header(blob) == ("jpeg", 9, 7)


def test_synth_av_corpus_decodes_to_doc_id_arithmetic(spark):
    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        media_av_meta,
        synth_av_corpus,
    )

    df = spark.createDataFrame([(i,) for i in range(24)], "doc_id long")
    got = {r["doc_id"]: r
           for r in media_av_meta(synth_av_corpus(df)).collect()}
    for i in range(24):
        r = got[i]
        if i % 3 == 0:
            rate = 8000 + (i % 5) * 4000
            ch = 1 + (i // 2) % 2
            ns = 100 + i % 900
            assert (r["kind"], r["sample_rate"], r["channels"]) == (
                "wav", rate, ch)
            assert r["duration_ms"] == ns * 1000 // rate
            assert r["n_bytes"] == 44 + ns * ch * 2
        elif i % 3 == 1:
            ts = 1000 + (i % 7) * 500
            dur = 10000 + i % 90000
            assert (r["kind"], r["sample_rate"], r["channels"]) == (
                "mp4", None, None)
            assert r["duration_ms"] == dur * 1000 // ts
            assert r["n_bytes"] == 132
        else:
            rate = 16000 + (i % 4) * 8000
            ns = 50000 + i % 1000000
            assert (r["kind"], r["sample_rate"], r["channels"]) == (
                "flac", rate, 1 + i % 2)
            assert r["duration_ms"] == ns * 1000 // rate
            assert r["n_bytes"] == 42


# --------------------------------------------------------------------------
# decoder total-safety fuzz: these parsers run inside hot mapInPandas
# tasks — an uncaught exception on a hostile/corrupt blob would kill the
# whole Spark job, so the contract is parse-or-None, NEVER raise.

from hypothesis import given, settings, strategies as st

_SIGS = [b"", b"\x89PNG\r\n\x1a\n", b"GIF89a", b"GIF87a", b"\xff\xd8",
         b"RIFF", b"RIFFxxxxWEBP", b"RIFFxxxxWAVE",
         b"\x00\x00\x00\x10ftyp", b"RIFFxxxxWEBPVP8L", b"RIFFxxxxWEBPVP8X",
         b"RIFFxxxxWAVEfmt ", b"\x00\x00\x00\x08moov"]


@given(st.sampled_from(_SIGS), st.binary(max_size=120))
@settings(max_examples=300, deadline=None)
def test_decoders_never_raise_on_arbitrary_bytes(prefix, junk):
    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        decode_av_header,
        decode_image_header,
    )
    blob = prefix + junk
    for fn in (decode_image_header, decode_av_header):
        out = fn(blob)  # must return a tuple or None, never raise
        assert out is None or (isinstance(out, tuple)
                               and len(out) in (3, 4))


@given(st.binary(min_size=0, max_size=60),
       st.integers(min_value=0, max_value=59),
       st.integers(min_value=0, max_value=255))
@settings(max_examples=300, deadline=None)
def test_decoders_survive_single_byte_mutations(tail, pos, val):
    """Mutate one byte of each VALID container at a random position —
    headers with corrupted length/size fields must parse or reject,
    never raise (the truncated/oversized-segment paths)."""
    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        build_fixture_image,
        build_fixture_mp4,
        build_fixture_wav,
        decode_av_header,
        decode_image_header,
    )
    blobs = [build_fixture_image(f, 13, 7)
             for f in ("png", "jpeg", "gif", "webp")]
    blobs += [build_fixture_wav(8000, 1, 10), build_fixture_mp4(1000, 777)]
    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        build_fixture_flac,
    )
    blobs += [build_fixture_flac(44100, 2, 441000)]
    for blob in blobs:
        b = bytearray(blob + tail)
        b[pos % len(b)] = val
        decode_image_header(bytes(b))
        decode_av_header(bytes(b))


def test_decode_flac_streaminfo_bitfield():
    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        build_fixture_flac,
        decode_av_header,
    )
    blob = build_fixture_flac(44100, 2, 441000)
    assert len(blob) == 42
    assert decode_av_header(blob) == ("flac", 44100, 2, 10000)
    # 20-bit rate and 36-bit sample-count extremes round-trip
    assert decode_av_header(build_fixture_flac((1 << 20) - 1, 8,
                                               (1 << 36) - 1)) == (
        "flac", (1 << 20) - 1, 8, ((1 << 36) - 1) * 1000 // ((1 << 20) - 1))
    # zero rate / zero samples are corrupt (duration would be a lie)
    raw = bytearray(blob)
    raw[18:26] = (0).to_bytes(8, "big")
    assert decode_av_header(bytes(raw)) is None
    # a first block that is NOT STREAMINFO (type 4 = VORBIS_COMMENT)
    raw = bytearray(blob)
    raw[4] = 0x04
    assert decode_av_header(bytes(raw)) is None


# --------------------------------------------------------------------------
# round-5: REAL PNG pixel decode (stdlib zlib + RFC 2083 unfiltering)

def test_png_pixel_roundtrip_every_filter_and_layout():
    import numpy as np

    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        build_fixture_png_pixels,
        decode_png_pixels,
    )
    rng = np.random.RandomState(7)
    for ch in (1, 2, 3, 4):
        for (w, h) in ((1, 1), (2, 3), (17, 23)):
            px = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)
            for fts in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4],
                        [4, 3, 2, 1, 0]):
                got = decode_png_pixels(build_fixture_png_pixels(px, fts))
                assert got is not None, (ch, w, h, fts)
                gw, gh, gch, arr = got
                assert (gw, gh, gch) == (w, h, ch)
                assert np.array_equal(arr, px), (ch, w, h, fts)


def test_png_pixel_decode_rejects_unsupported_and_corrupt():
    import numpy as np

    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        build_fixture_png_pixels,
        decode_png_pixels,
    )
    px = np.full((4, 5, 3), 9, np.uint8)
    blob = build_fixture_png_pixels(px, [4])
    assert decode_png_pixels(blob) is not None
    for mutate in (
            lambda b: b[:25] + bytes([3]) + b[26:],    # palette ctype
            lambda b: b[:24] + bytes([16]) + b[25:],   # 16-bit depth
            lambda b: b[:28] + bytes([1]) + b[29:],    # Adam7 interlace
            lambda b: b[:40],                          # cut mid-IDAT
            # huge declared height: inflated stream length mismatches
            lambda b: b[:20] + (1 << 20).to_bytes(4, "big") + b[24:],
    ):
        assert decode_png_pixels(mutate(blob)) is None
    # header-only fixture (33 B, no IDAT) has no pixels to decode
    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        build_fixture_image,
    )
    assert decode_png_pixels(build_fixture_image("png", 5, 4)) is None


def test_png_pixel_decode_bomb_cap():
    # a tiny blob declaring a gigapixel canvas must be rejected BEFORE
    # any allocation, not inflate-and-die inside an executor
    import struct
    import zlib

    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        decode_png_pixels,
    )

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">II5B", 60000, 60000, 8, 2, 0, 0, 0)
    blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 100))
            + chunk(b"IEND", b""))
    assert decode_png_pixels(blob) is None


@given(st.binary(min_size=0, max_size=80),
       st.integers(min_value=0, max_value=200),
       st.integers(min_value=0, max_value=255))
@settings(max_examples=200, deadline=None)
def test_png_pixel_decode_never_raises(tail, pos, val):
    import numpy as np

    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        build_fixture_png_pixels,
        decode_png_pixels,
    )
    px = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    b = bytearray(build_fixture_png_pixels(px, [0, 4]) + tail)
    b[pos % len(b)] = val
    out = decode_png_pixels(bytes(b))
    assert out is None or (isinstance(out, tuple) and len(out) == 4)


def test_media_pixel_stats_matches_closed_form(spark):
    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        media_pixel_stats,
        synth_png_pixel_corpus,
    )

    df = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    got = {r["doc_id"]: r
           for r in media_pixel_stats(synth_png_pixel_corpus(df)).collect()}
    for d in range(20):
        w, h = 16 + d % 13, 16 + (d * 5) % 11
        if d % 2 == 0:
            vals = [(3 * x + 7 * y + d) % 251
                    for x in range(w) for y in range(h)]
            ch = 1
        else:
            vals = [v for x in range(w) for y in range(h)
                    for v in ((x + d) % 251, (2 * y + d) % 251,
                              (x + y + d) % 251)]
            ch = 3
        r = got[d]
        assert (r["width"], r["height"], r["channels"]) == (w, h, ch)
        assert r["px_sum"] == sum(vals)
        assert r["px_min"] == min(vals)
        assert r["px_max"] == max(vals)


def test_media_pixel_stats_null_row_for_undecodable(spark):
    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        media_pixel_stats,
    )
    df = spark.createDataFrame(
        [(1, b"not a png"), (2, None)], "doc_id long, blob binary")
    rows = {r["doc_id"]: r for r in media_pixel_stats(df).collect()}
    assert len(rows) == 2
    for d in (1, 2):
        assert rows[d]["width"] is None and rows[d]["px_sum"] is None


# --------------------------------------------------------------------------
# round-5: perceptual aHash over decoded PNG pixels

def test_ahash_bits_known_patterns():
    import numpy as np

    from ukrainian_ocr_pipeline_spark.operators.multimodal import ahash_bits

    # uniform image: no block exceeds the mean -> all zero
    assert ahash_bits(np.full((16, 16, 1), 7, np.uint8)) == "0" * 64
    # left half dark, right half bright: right 4 block-columns set
    a = np.zeros((16, 16, 1), np.uint8)
    a[:, 8:] = 200
    got = ahash_bits(a)
    assert got == ("0000" + "1111") * 8
    # top half bright: first 32 bits (4 block-rows) set
    b = np.zeros((16, 16, 3), np.uint8)
    b[:8, :] = 200
    assert ahash_bits(b) == "1" * 32 + "0" * 32


def test_ahash_non_divisible_dims_partition_all_pixels():
    import numpy as np

    from ukrainian_ocr_pipeline_spark.operators.multimodal import ahash_bits

    # 17x23: blocks get uneven pixel counts; the cross-multiplied mean
    # comparison must stay exact (a float mean could flip ties)
    rng = np.random.RandomState(3)
    a = rng.randint(0, 256, size=(23, 17, 3)).astype(np.uint8)
    got = ahash_bits(a)
    assert len(got) == 64 and set(got) <= {"0", "1"}
    # brute-force reference
    s = a.astype(np.int64).sum(axis=2)
    tsum, tpx = int(s.sum()), s.size
    ref = []
    for by in range(8):
        for bx in range(8):
            ys = [y for y in range(23) if (y * 8) // 23 == by]
            xs = [x for x in range(17) if (x * 8) // 17 == bx]
            bsum = int(s[np.ix_(ys, xs)].sum())
            ref.append("1" if bsum * tpx > tsum * len(ys) * len(xs)
                       else "0")
    assert got == "".join(ref)


def test_image_ahash_seeded_corpus_groups_duplicates(spark):
    from pyspark.sql import functions as F

    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        image_ahash,
        synth_png_pixel_corpus,
    )

    df = (spark.range(40).withColumnRenamed("id", "doc_id")
          .withColumn("seed", F.col("doc_id") % 8))
    hashed = image_ahash(synth_png_pixel_corpus(df, seed_col="seed"))
    rows = hashed.collect()
    assert len(rows) == 40 and all(r["ahash"] is not None for r in rows)
    by_seed = {}
    for r in rows:
        by_seed.setdefault(r["doc_id"] % 8, set()).add(r["ahash"])
    # identical seed -> identical image -> identical hash
    assert all(len(v) == 1 for v in by_seed.values())
    # undecodable payloads yield NULL hash
    junk = spark.createDataFrame([(1, b"nope")], "doc_id long, blob binary")
    assert image_ahash(junk).collect()[0]["ahash"] is None


# --------------------------------------------------------------------------
# round-5: REAL GIF pixel decode (pure-Python LZW + palette map)

def _gray_ramp_palette():
    import numpy as np
    return np.stack([np.arange(64) * 4, np.arange(64) * 4 + 1,
                     np.arange(64) * 4 + 2], axis=1).astype(np.uint8)


def test_gif_pixel_roundtrip_plain_and_interlaced():
    import numpy as np

    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        build_fixture_gif_pixels,
        decode_gif_pixels,
    )
    rng = np.random.RandomState(11)
    pal = _gray_ramp_palette()
    for (w, h) in ((1, 1), (5, 3), (17, 23)):
        idx = rng.randint(0, 64, size=(h, w)).astype(np.uint8)
        for interlace in (False, True):
            got = decode_gif_pixels(
                build_fixture_gif_pixels(idx, pal, interlace=interlace))
            assert got is not None, (w, h, interlace)
            gw, gh, ch, arr = got
            assert (gw, gh, ch) == (w, h, 3)
            assert np.array_equal(arr, pal[idx]), (w, h, interlace)


def test_gif_lzw_real_compression_decodes():
    # the decoder must handle REAL LZW (growing table, width bumps),
    # not just the fixture's clear-per-literal stream: build one by
    # hand for a known sequence
    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        _gif_lzw_decode,
    )

    # min_size 2: clear=4, eoi=5, width starts 3
    # stream: CLEAR, 0, 1, 6 (=prev 0,1 -> entry '1'+... the
    # just-defined-code case: 6 == next_code -> entry = prev + prev[0]
    # = b'\x01\x01'), EOI  => output 0 1 1 1
    codes = [4, 0, 1, 7, 5]
    # next_code after '0' stays 6; after '1' table[6]='01', next 7;
    # code 7 == next_code -> entry = '1'+'1'
    acc = nbits = 0
    out = bytearray()
    width = 3
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    got = _gif_lzw_decode(2, bytes(out), 4)
    assert got == b"\x00\x01\x01\x01"


def test_gif_pixel_decode_rejects_corrupt():
    import numpy as np

    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        build_fixture_gif_pixels,
        build_fixture_image,
        decode_gif_pixels,
    )
    pal = _gray_ramp_palette()
    blob = build_fixture_gif_pixels(
        np.zeros((4, 5), np.uint8), pal)
    assert decode_gif_pixels(blob) is not None
    assert decode_gif_pixels(blob[:18]) is None       # cut in GCT
    assert decode_gif_pixels(blob[:-10]) is None      # cut in LZW data
    assert decode_gif_pixels(b"GIF89a" + b"\x00" * 30) is None
    # header-only builder fixture carries no image data
    assert decode_gif_pixels(build_fixture_image("gif", 5, 4)) is None


@given(st.binary(min_size=0, max_size=80),
       st.integers(min_value=0, max_value=200),
       st.integers(min_value=0, max_value=255))
@settings(max_examples=200, deadline=None)
def test_gif_pixel_decode_never_raises(tail, pos, val):
    import numpy as np

    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        build_fixture_gif_pixels,
        decode_gif_pixels,
    )
    idx = (np.arange(20, dtype=np.uint8) % 64).reshape(4, 5)
    b = bytearray(build_fixture_gif_pixels(idx, _gray_ramp_palette())
                  + tail)
    b[pos % len(b)] = val
    out = decode_gif_pixels(bytes(b))
    assert out is None or (isinstance(out, tuple) and len(out) == 4)


def test_pixel_stats_dispatch_gif_corpus(spark):
    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        media_pixel_stats,
        synth_gif_pixel_corpus,
    )
    df = spark.createDataFrame([(i,) for i in range(16)], "doc_id long")
    got = {r["doc_id"]: r
           for r in media_pixel_stats(synth_gif_pixel_corpus(df)).collect()}
    for d in range(16):
        w, h = 12 + d % 9, 12 + (d * 3) % 7
        ids = [(x + 2 * y + d) % 64 for x in range(w) for y in range(h)]
        r = got[d]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        assert r["px_sum"] == sum(12 * i + 3 for i in ids)
        assert r["px_min"] == 4 * min(ids)
        assert r["px_max"] == 4 * max(ids) + 2


# --------------------------------------------------------------------------
# round-5: REAL WAV PCM sample decode + BMP pixel decode

def test_wav_sample_roundtrip_and_rejects():
    import numpy as np

    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        build_fixture_wav,
        build_fixture_wav_samples,
        decode_wav_samples,
    )
    s = np.array([-32768, -1, 0, 1, 32767, 123], dtype="<i2")
    blob = build_fixture_wav_samples(16000, 2, s)
    rate, ch, frames, got = decode_wav_samples(blob)
    assert (rate, ch, frames) == (16000, 2, 3)
    assert np.array_equal(got, s)
    # the zero-payload header fixture still decodes (all zeros)
    z = decode_wav_samples(build_fixture_wav(8000, 1, 10))
    assert z is not None and z[3].sum() == 0 and len(z[3]) == 10
    # non-PCM fmt tag, truncation, junk -> None
    bad = bytearray(blob)
    bad[20] = 2  # fmt tag ADPCM
    assert decode_wav_samples(bytes(bad)) is None
    assert decode_wav_samples(blob[:30]) is None
    assert decode_wav_samples(b"RIFF1234WAVE") is None


def test_media_audio_stats_matches_closed_form(spark):
    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        media_audio_stats,
        synth_wav_sample_corpus,
    )
    df = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    got = {r["doc_id"]: r for r in
           media_audio_stats(synth_wav_sample_corpus(df)).collect()}
    for d in range(12):
        ch, frames = 1 + d % 2, 80 + d % 50
        vals = [((k * 2311 + d * 17) % 65536) - 32768
                for k in range(frames * ch)]
        r = got[d]
        assert (r["sample_rate"], r["channels"], r["n_frames"]) == (
            8000 + (d % 3) * 4000, ch, frames)
        assert (r["s_sum"], r["s_min"], r["s_max"]) == (
            sum(vals), min(vals), max(vals))
    junk = spark.createDataFrame([(1, b"nope")], "doc_id long, blob binary")
    assert media_audio_stats(junk).collect()[0]["s_sum"] is None


def test_bmp_pixel_roundtrip_padding_and_orientation():
    import numpy as np

    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        build_fixture_bmp_pixels,
        decode_bmp_pixels,
        decode_pixels,
    )
    rng = np.random.RandomState(5)
    for (w, h) in ((1, 1), (9, 8), (17, 23), (3, 2)):  # odd widths pad
        px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        for td in (False, True):
            got = decode_bmp_pixels(
                build_fixture_bmp_pixels(px, top_down=td))
            assert got is not None, (w, h, td)
            gw, gh, ch, arr = got
            assert (gw, gh, ch) == (w, h, 3)
            assert np.array_equal(arr, px), (w, h, td)
    blob = build_fixture_bmp_pixels(px)
    assert decode_pixels(blob) is not None  # dispatch covers BMP
    assert decode_bmp_pixels(blob[:40]) is None
    bad = bytearray(blob)
    bad[30] = 1  # RLE8 compression
    assert decode_bmp_pixels(bytes(bad)) is None
    bad = bytearray(blob)
    bad[28] = 32  # 32-bit depth unsupported
    assert decode_bmp_pixels(bytes(bad)) is None


@given(st.binary(min_size=0, max_size=80),
       st.integers(min_value=0, max_value=200),
       st.integers(min_value=0, max_value=255))
@settings(max_examples=200, deadline=None)
def test_wav_bmp_decoders_never_raise(tail, pos, val):
    import numpy as np

    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        build_fixture_bmp_pixels,
        build_fixture_wav_samples,
        decode_bmp_pixels,
        decode_wav_samples,
    )
    wav = build_fixture_wav_samples(
        8000, 1, np.arange(12, dtype="<i2"))
    bmp = build_fixture_bmp_pixels(
        np.zeros((3, 5, 3), np.uint8))
    for blob, fn in ((wav, decode_wav_samples), (bmp, decode_bmp_pixels)):
        b = bytearray(blob + tail)
        b[pos % len(b)] = val
        out = fn(bytes(b))
        assert out is None or isinstance(out, tuple)


# --------------------------------------------------------------------------
# round-5: TIFF header decode (IFD walk, both endiannesses)

def test_tiff_header_both_endians_and_types():
    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        build_fixture_tiff,
        decode_image_header,
    )
    for be in (False, True):
        for lt in (False, True):
            blob = build_fixture_tiff(640, 480, big_endian=be,
                                      long_type=lt)
            assert len(blob) == 38
            assert decode_image_header(blob) == ("tiff", 640, 480), (be, lt)
    # LONG type permits dims beyond u16
    big = build_fixture_tiff(100000, 70000, long_type=True)
    assert decode_image_header(big) == ("tiff", 100000, 70000)


def test_tiff_header_rejects_corrupt():
    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        build_fixture_tiff,
        decode_image_header,
    )
    blob = build_fixture_tiff(5, 4)
    # truncated IFD (count promises entries past the blob)
    assert decode_image_header(blob[:12]) is None
    # zero width is a corrupt dim
    bad = bytearray(blob)
    bad[8 + 2 + 8] = 0
    bad[8 + 2 + 9] = 0
    assert decode_image_header(bytes(bad)) is None
    # RATIONAL-typed dimension tag is malformed
    bad = bytearray(blob)
    bad[8 + 2 + 2] = 5
    assert decode_image_header(bytes(bad)) is None
    # missing ImageLength tag
    only_w = blob[:8] + (1).to_bytes(2, "little") \
        + blob[10:22] + (0).to_bytes(4, "little")
    assert decode_image_header(only_w) is None


@given(st.binary(min_size=0, max_size=60),
       st.integers(min_value=0, max_value=100),
       st.integers(min_value=0, max_value=255))
@settings(max_examples=200, deadline=None)
def test_tiff_header_never_raises(tail, pos, val):
    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        build_fixture_tiff,
        decode_image_header,
    )
    b = bytearray(build_fixture_tiff(13, 7) + tail)
    b[pos % len(b)] = val
    out = decode_image_header(bytes(b))
    assert out is None or (isinstance(out, tuple) and len(out) == 3)


# --------------------------------------------------------------------------
# round-5: ICO (favicon) decode — PNG and headerless-DIB frames

def test_ico_roundtrip_both_frame_kinds_and_largest_selection():
    import numpy as np

    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        build_fixture_ico,
        decode_ico_pixels,
        decode_pixels,
    )
    rng = np.random.RandomState(3)
    for (w, h) in ((1, 1), (10, 9), (33, 21)):
        px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        for kind in ("png", "dib"):
            got = decode_ico_pixels(build_fixture_ico([(kind, px)]))
            assert got is not None, (w, h, kind)
            assert got[:3] == (w, h, 3)
            assert np.array_equal(got[3], px), (w, h, kind)
    # multi-frame: the LARGEST frame wins
    small = rng.randint(0, 256, size=(4, 4, 3)).astype(np.uint8)
    big = rng.randint(0, 256, size=(12, 12, 3)).astype(np.uint8)
    blob = build_fixture_ico([("dib", small), ("png", big)])
    got = decode_ico_pixels(blob)
    assert got[:2] == (12, 12) and np.array_equal(got[3], big)
    assert decode_pixels(blob) is not None  # dispatch covers ICO


def test_ico_rejects_corrupt():
    import numpy as np

    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        build_fixture_ico,
        decode_ico_pixels,
    )
    px = np.zeros((5, 6, 3), np.uint8)
    blob = build_fixture_ico([("dib", px)])
    assert decode_ico_pixels(blob) is not None
    assert decode_ico_pixels(b"") is None
    assert decode_ico_pixels(blob[:10]) is None       # cut in directory
    assert decode_ico_pixels(blob[:30]) is None       # frame overruns
    # odd (non-doubled) DIB height is malformed
    bad = bytearray(blob)
    off = 6 + 16
    bad[off + 8] = 11  # height 2*5 -> 11
    assert decode_ico_pixels(bytes(bad)) is None


@given(st.binary(min_size=0, max_size=60),
       st.integers(min_value=0, max_value=150),
       st.integers(min_value=0, max_value=255))
@settings(max_examples=200, deadline=None)
def test_ico_decoder_never_raises(tail, pos, val):
    import numpy as np

    from ukrainian_ocr_pipeline_spark.operators.multimodal import (
        build_fixture_ico,
        decode_ico_pixels,
    )
    px = np.arange(36, dtype=np.uint8).reshape(3, 4, 3)
    b = bytearray(build_fixture_ico([("dib", px)]) + tail)
    b[pos % len(b)] = val
    out = decode_ico_pixels(bytes(b))
    assert out is None or (isinstance(out, tuple) and len(out) == 4)
