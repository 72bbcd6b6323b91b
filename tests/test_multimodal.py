from wellmeet_data_pipeline_spark.operators.multimodal import (
    dedup_assets_exact,
    extract_features,
    frame_sample_plan,
)


def _assets(spark):
    rows = [
        (1, "image", bytearray(b"payload-a"), {"src": "s1"}),
        (2, "image", bytearray(b"payload-a"), {"src": "s2"}),  # byte-identical dup
        (3, "video", bytearray(b"payload-b"), {"src": "s3"}),
    ]
    return spark.createDataFrame(
        rows, "asset_id long, media_type string, payload binary, metadata map<string,string>"
    )


def test_extract_features_deterministic(spark):
    feats = {r["asset_id"]: r for r in extract_features(_assets(spark)).collect()}
    assert feats[1]["sha256"] == feats[2]["sha256"]
    assert feats[1]["width"] == feats[2]["width"]
    assert feats[1]["n_bytes"] == 9
    assert feats[3]["sha256"] != feats[1]["sha256"]


def test_dedup_assets_exact(spark):
    kept = {r["asset_id"] for r in dedup_assets_exact(_assets(spark)).collect()}
    assert kept == {1, 3}


def test_frame_sample_plan(spark):
    rows = frame_sample_plan(_assets(spark), every_n=1).collect()
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r["asset_id"], []).append(r["frame_idx"])
    assert all(v == sorted(v) and v[0] == 0 for v in by_asset.values())


def test_binaryfile_source_feeds_multimodal_operators(spark, tmp_path):
    """SURVEY §2.11: spark.read.format('binaryFile') over a fixture media
    directory -> MEDIA_ASSET -> feature extraction + exact binary dedup."""
    from wellmeet_data_pipeline_spark.operators.multimodal import (
        dedup_assets_exact,
        extract_features,
    )
    from wellmeet_data_pipeline_spark.sources.binary import (
        read_media_assets,
        write_media_fixtures,
    )

    media = tmp_path / "media"
    write_media_fixtures(
        str(media),
        {
            "a.jpg": b"\xff\xd8fakejpegbytes",
            "b.png": b"\x89PNGfake",
            "dup_of_a.jpg": b"\xff\xd8fakejpegbytes",  # byte-identical to a.jpg
            "clip.mp4": b"\x00\x00movbytes",
            "notes.txt": b"not media",
        },
    )

    assets = read_media_assets(spark, str(media), glob="*.{jpg,png,mp4}")
    rows = {r["metadata"]["file_name"]: r for r in assets.collect()}
    assert set(rows) == {"a.jpg", "b.png", "dup_of_a.jpg", "clip.mp4"}  # txt pruned at listing
    assert rows["a.jpg"]["media_type"] == "image"
    assert rows["clip.mp4"]["media_type"] == "video"
    assert rows["a.jpg"]["payload"] == bytearray(b"\xff\xd8fakejpegbytes")
    assert rows["a.jpg"]["metadata"]["length"] == str(len(b"\xff\xd8fakejpegbytes"))
    # asset_id deterministic across reads (xxhash64 of path)
    again = {r["metadata"]["file_name"]: r["asset_id"] for r in read_media_assets(spark, str(media), glob="*.{jpg,png,mp4}").collect()}
    assert {n: r["asset_id"] for n, r in rows.items()} == again

    feats = {r["asset_id"]: r for r in extract_features(assets).collect()}
    assert len(feats) == 4
    a_id, dup_id = rows["a.jpg"]["asset_id"], rows["dup_of_a.jpg"]["asset_id"]
    assert feats[a_id]["sha256"] == feats[dup_id]["sha256"]

    survivors = {r["metadata"]["file_name"] for r in dedup_assets_exact(assets).collect()}
    assert len(survivors) == 3  # one of the two identical jpgs dropped
    assert "b.png" in survivors and "clip.mp4" in survivors


def _png(w, h):
    import struct, zlib

    ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    )


def _gif(w, h):
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def _bmp(w, h):
    import struct

    return (
        b"BM" + b"\x00" * 12 + struct.pack("<I", 40) + struct.pack("<ii", w, -h) + b"\x00" * 8
    )


def _jpeg(w, h):
    import struct

    # SOI + APP0 (JFIF) + a comment segment + SOF0 + EOI: the parser must
    # walk past variable-length segments to reach the frame header
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    com = b"\xff\xfe" + struct.pack(">H", 9) + b"comment"
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 3)
    return b"\xff\xd8" + app0 + com + sof + b"\xff\xd9"


def test_parse_image_header_real_formats():
    from wellmeet_data_pipeline_spark.operators.multimodal import parse_image_header

    assert parse_image_header(_png(640, 480)) == ("png", 640, 480)
    assert parse_image_header(_gif(320, 200)) == ("gif", 320, 200)
    assert parse_image_header(_bmp(1024, 768)) == ("bmp", 1024, 768)
    assert parse_image_header(_jpeg(800, 600)) == ("jpeg", 800, 600)
    assert parse_image_header(b"") is None
    assert parse_image_header(b"\x89PNG\r\n\x1a") is None  # truncated signature
    assert parse_image_header(b"\xff\xd8\x00\x00garbage") is None  # desynced jpeg
    assert parse_image_header(b"not an image at all") is None


def test_extract_features_header_path_returns_real_dimensions(spark):
    from wellmeet_data_pipeline_spark.operators.multimodal import extract_features

    rows = [
        (1, "image", bytearray(_png(12, 34))),
        (2, "image", bytearray(_jpeg(56, 78))),
        (3, "blob", bytearray(b"opaque payload")),
    ]
    assets = spark.createDataFrame(rows, "asset_id long, media_type string, payload binary")
    feats = {
        r["asset_id"]: r
        for r in extract_features(assets, prefer_headers=True).collect()
    }
    assert (feats[1]["width"], feats[1]["height"]) == (12, 34)
    assert (feats[2]["width"], feats[2]["height"]) == (56, 78)
    # unrecognized payloads keep flowing through the deterministic fake
    assert feats[3]["width"] > 0 and feats[3]["height"] > 0
    assert feats[3]["n_bytes"] == len(b"opaque payload")


def test_resize_images_aspect_fit_and_determinism(spark):
    from wellmeet_data_pipeline_spark.operators.multimodal import resize_images

    rows = [
        (1, "image", bytearray(_png(640, 480))),   # landscape 4:3
        (2, "image", bytearray(_png(100, 400))),   # tall
        (3, "blob", bytearray(b"opaque")),         # fake-dims path
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, media_type string, payload binary"
    )
    out = resize_images(assets, target_w=224, target_h=224)
    got = {r["asset_id"]: r for r in out.collect()}
    # aspect-fit: 640x480 -> 224x168 (scale 0.35); 100x400 -> 56x224
    assert (got[1]["src_width"], got[1]["src_height"]) == (640, 480)
    assert (got[1]["width"], got[1]["height"]) == (224, 168)
    assert (got[2]["width"], got[2]["height"]) == (56, 224)
    # fake path yields stable dims within the target box
    assert 1 <= got[3]["width"] <= 224 and 1 <= got[3]["height"] <= 224
    # payload stand-in is binary, deterministic across re-evaluation
    again = {r["asset_id"]: bytes(r["payload"]) for r in out.collect()}
    assert all(bytes(got[i]["payload"]) == again[i] for i in got)
    assert len(again[1]) == 32


def test_phash_math_is_real_dct():
    import numpy as np

    from wellmeet_data_pipeline_spark.operators.multimodal import (
        _dct8_matrix,
        phash64,
    )

    # the DCT basis is orthonormal (M M^T = I) — the transform is the
    # genuine JPEG/pHash DCT-II, not a stand-in
    M = _dct8_matrix()
    assert np.allclose(M @ M.T, np.eye(8), atol=1e-12)
    # a constant image has zero AC energy -> hash 0; adding low-frequency
    # structure flips bits deterministically
    # uniform brightness shift moves ONLY the (dropped) DC coefficient:
    # the hash is brightness-invariant on any tie-free grid (constant
    # images are the known pathological case — their AC terms are pure
    # fp noise around 0, as in reference pHash implementations)
    rng = np.random.default_rng(2)
    g = rng.uniform(0, 255, (8, 8))
    assert phash64(g) == phash64(g + 50.0) != 0


def test_phash_near_dup_planted_pairs(spark):
    import numpy as np

    from wellmeet_data_pipeline_spark.operators.multimodal import (
        phash_near_dup,
    )

    rng = np.random.default_rng(5)
    base = {
        10: rng.uniform(0, 255, (8, 8)),
        20: rng.uniform(0, 255, (8, 8)),
        30: rng.uniform(0, 255, (8, 8)),
    }
    # payload byte value selects the grid; +1 variants get a tiny
    # perturbation of the SAME grid (a near-dup a real decoder would see)
    grids = {}
    for aid, g in base.items():
        grids[aid] = g
        grids[aid + 1] = g + rng.normal(0, 0.4, (8, 8))

    def decode(payload: bytes):
        return grids[payload[0]]

    rows = [(aid, bytes([aid])) for aid in grids]
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    got = {
        (r["id_a"], r["id_b"]) for r in phash_near_dup(
            assets, max_hamming=12, decode_fn=decode
        ).collect()
    }
    assert {(10, 11), (20, 21), (30, 31)} <= got
    # unrelated random grids must NOT pair up
    assert all(b - a == 1 for a, b in got)


def test_phash_near_dup_exact_duplicates_distance_zero(spark):
    from wellmeet_data_pipeline_spark.operators.multimodal import (
        phash_near_dup,
    )

    assets = spark.createDataFrame(
        [(1, b"same-bytes"), (2, b"same-bytes"), (3, b"other")],
        "asset_id long, payload binary",
    )
    got = phash_near_dup(assets, max_hamming=0).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in got] == [(1, 2, 0)]


def _wav_bytes(sr=16000, ch=2, bits=16, n_samples=16000, extra_chunk=True):
    """Minimal real RIFF/WAVE: fmt + optional odd-sized LIST chunk (pads
    to word alignment) + data."""
    block = ch * bits // 8
    fmt = (
        (1).to_bytes(2, "little") + ch.to_bytes(2, "little")
        + sr.to_bytes(4, "little") + (sr * block).to_bytes(4, "little")
        + block.to_bytes(2, "little") + bits.to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    if extra_chunk:
        meta = b"INFOx"  # odd length -> exercises the pad byte
        chunks += b"LIST" + len(meta).to_bytes(4, "little") + meta + b"\x00"
    data = bytes(n_samples * block)
    chunks += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def _flac_bytes(sr=44100, ch=1, bits=24, total=44100 * 3):
    """Minimal real fLaC STREAMINFO block."""
    packed = (sr << 44) | ((ch - 1) << 41) | ((bits - 1) << 36) | total
    si = (
        (4096).to_bytes(2, "big") + (4096).to_bytes(2, "big")
        + (0).to_bytes(3, "big") + (0).to_bytes(3, "big")
        + packed.to_bytes(8, "big") + bytes(16)  # md5 placeholder
    )
    return b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si


def test_parse_audio_header_real_formats():
    from wellmeet_data_pipeline_spark.operators.multimodal import parse_audio_header

    assert parse_audio_header(_wav_bytes()) == ("wav", 16000, 2, 16, 16000)
    # odd-size chunk alignment: parser must still find 'data' after the pad
    assert parse_audio_header(_wav_bytes(extra_chunk=True))[4] == 16000
    assert parse_audio_header(_flac_bytes()) == ("flac", 44100, 1, 24, 132300)
    assert parse_audio_header(b"") is None
    assert parse_audio_header(b"RIFF\x00\x00\x00\x00AVI LIST") is None
    assert parse_audio_header(_wav_bytes()[:20]) is None  # truncated
    # data chunk DECLARES 16000 samples but the payload was cut mid-data:
    # n_samples must report the bytes present, not the claimed size
    cut = _wav_bytes(extra_chunk=False)
    short = cut[: len(cut) - 8000 * 4]  # drop half the sample bytes
    assert parse_audio_header(short) == ("wav", 16000, 2, 16, 8000)


def test_extract_audio_features_batch(spark):
    from wellmeet_data_pipeline_spark.operators.multimodal import (
        extract_audio_features,
    )

    rows = [
        (1, "audio", bytearray(_wav_bytes(sr=8000, ch=1, bits=8, n_samples=4000))),
        (2, "audio", bytearray(_flac_bytes())),
        (3, "audio", bytearray(b"not audio at all")),
        (4, "audio", None),
    ]
    df = spark.createDataFrame(rows, "asset_id long, media_type string, payload binary")
    got = {r["asset_id"]: r.asDict() for r in extract_audio_features(df).collect()}
    assert got[1]["format"] == "wav" and got[1]["duration_ms"] == 500
    assert got[1]["sample_rate"] == 8000 and got[1]["n_channels"] == 1
    assert got[2]["format"] == "flac" and got[2]["duration_ms"] == 3000
    # errors-as-data: unrecognized/null payloads keep their row, null fields
    assert got[3]["format"] is None and got[3]["n_bytes"] == 16
    assert got[4]["format"] is None and got[4]["n_bytes"] == 0
    assert all(len(r["sha256"]) == 64 for r in got.values())


def _box(typ: bytes, payload: bytes) -> bytes:
    return (8 + len(payload)).to_bytes(4, "big") + typ + payload


def _mp4_bytes(brand=b"isom", ts=1000, dur=90_000, w=640, h=360, mvhd_ver=0,
               tkhd_ver=0, audio_track=True, largesize_moov=False):
    """Minimal real ISO-BMFF file: ftyp + moov(mvhd + trak(tkhd) [+ audio
    trak]) + mdat.  Spec layouts, zero-padded where fields are unparsed."""
    ftyp = _box(b"ftyp", brand + (0).to_bytes(4, "big") + b"isomiso2")
    if mvhd_ver == 0:
        body = bytes([0]) + bytes(3) + bytes(8) + ts.to_bytes(4, "big") \
            + dur.to_bytes(4, "big") + bytes(80)
    else:
        body = bytes([1]) + bytes(3) + bytes(16) + ts.to_bytes(4, "big") \
            + dur.to_bytes(8, "big") + bytes(80)
    mvhd = _box(b"mvhd", body)

    def tkhd(wv, hv, ver):
        if ver == 0:
            tb = bytes([0]) + bytes(3) + bytes(8) + bytes(4) + bytes(4) \
                + bytes(4) + bytes(8) + bytes(8) + bytes(36)
        else:
            tb = bytes([1]) + bytes(3) + bytes(16) + bytes(4) + bytes(4) \
                + bytes(8) + bytes(8) + bytes(8) + bytes(36)
        tb += (wv << 16).to_bytes(4, "big") + (hv << 16).to_bytes(4, "big")
        return _box(b"trak", _box(b"tkhd", tb))

    traks = tkhd(w, h, tkhd_ver)
    if audio_track:
        traks += tkhd(0, 0, 0)  # audio tracks carry 0x0 and must not win
    moov_body = mvhd + traks
    if largesize_moov:
        moov = (1).to_bytes(4, "big") + b"moov" \
            + (16 + len(moov_body)).to_bytes(8, "big") + moov_body
    else:
        moov = _box(b"moov", moov_body)
    return ftyp + moov + _box(b"mdat", bytes(32))


def test_parse_video_header_mp4_mov():
    from wellmeet_data_pipeline_spark.operators.multimodal import parse_video_header

    # 90s at timescale 1000 -> 90_000 ms; v0 and v1 box layouts agree
    assert parse_video_header(_mp4_bytes()) == ("mp4", 1000, 90_000, 640, 360)
    assert parse_video_header(
        _mp4_bytes(mvhd_ver=1, tkhd_ver=1, ts=600, dur=1234)
    ) == ("mp4", 600, 1234 * 1000 // 600, 640, 360)
    assert parse_video_header(_mp4_bytes(brand=b"qt  "))[0] == "mov"
    # 64-bit largesize moov walks identically
    assert parse_video_header(_mp4_bytes(largesize_moov=True)) == (
        "mp4", 1000, 90_000, 640, 360)
    # unknown duration (all-ones sentinel) -> None duration, fields intact
    full = parse_video_header(_mp4_bytes(dur=(1 << 32) - 1))
    assert full == ("mp4", 1000, None, 640, 360)


def test_parse_video_header_errors_as_data():
    from wellmeet_data_pipeline_spark.operators.multimodal import parse_video_header

    assert parse_video_header(b"") is None
    assert parse_video_header(b"\x00\x00\x00\x08free") is None  # no ftyp
    assert parse_video_header(_wav_bytes()) is None  # wrong container
    # moov claims more bytes than present -> walk refuses the box -> None
    cut = _mp4_bytes()
    assert parse_video_header(cut[: len(cut) - 60]) is None
    # zero timescale is meaningless -> None
    assert parse_video_header(_mp4_bytes(ts=0)) is None


def test_extract_video_features_batch(spark):
    from wellmeet_data_pipeline_spark.operators.multimodal import extract_video_features

    rows = [
        (1, "video", bytearray(_mp4_bytes())),
        (2, "video", bytearray(b"not a video")),
        (3, "video", None),
    ]
    df = spark.createDataFrame(rows, "asset_id long, media_type string, payload binary")
    got = {r["asset_id"]: r.asDict() for r in extract_video_features(df).collect()}
    assert got[1]["format"] == "mp4" and got[1]["duration_ms"] == 90_000
    assert got[1]["width"] == 640 and got[1]["height"] == 360
    assert got[2]["format"] is None and got[2]["width"] is None
    assert got[3]["n_bytes"] == 0 and got[3]["format"] is None


def test_parse_video_header_empty_tkhd_and_overflow_duration():
    """Review catches: an empty tkhd body at payload end must not read
    past the box (IndexError previously); a corrupt huge v1 duration
    must report None rather than overflow the int64 duration_ms."""
    from wellmeet_data_pipeline_spark.operators.multimodal import parse_video_header

    ftyp = _box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isomiso2")
    mvhd = _box(b"mvhd", bytes([0]) + bytes(3) + bytes(8)
                + (1000).to_bytes(4, "big") + (5000).to_bytes(4, "big") + bytes(80))
    empty_tkhd = _box(b"trak", _box(b"tkhd", b""))
    payload = ftyp + _box(b"moov", mvhd + empty_tkhd)
    assert parse_video_header(payload) == ("mp4", 1000, 5000, None, None)

    huge = _mp4_bytes(mvhd_ver=1, ts=1, dur=(1 << 63) + 7)
    got = parse_video_header(huge)
    assert got[0] == "mp4" and got[2] is None  # duration unknown, no overflow


# ---------------------------------------------------------------------------
# Real stdlib PNG pixel decode (r9 verdict item 4)
# ---------------------------------------------------------------------------

def _encode_png(px, ctype=2, filters=None, palette=None):
    """Minimal test-side PNG encoder: 8-bit, non-interlaced, one IDAT.
    `px` is (h, w, channels) uint8; `filters` assigns a PNG filter type
    per row so the decoder's reconstruction of ALL FIVE filters is
    exercised, not just filter 0."""
    import struct
    import zlib

    import numpy as np

    h, w, ch = px.shape

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    raw = bytearray()
    bpp = ch
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        f = (filters or [0] * h)[y]
        cur = px[y].reshape(-1).astype(np.int32)
        if f == 0:
            enc = cur.copy()
        else:
            enc = np.zeros_like(cur)
            for x in range(w * ch):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                if f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) >> 1
                else:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (int(cur[x]) - pred) & 0xFF
        raw.append(f)
        raw += enc.astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    return out + chunk(b"IEND", b"")


def test_decode_png_recovers_exact_pixels_across_all_filters():
    import numpy as np

    from wellmeet_data_pipeline_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(10, 16, 3), dtype=np.uint8)
    payload = _encode_png(px, ctype=2, filters=[0, 1, 2, 3, 4, 4, 3, 2, 1, 0])
    luma = decode_png(payload)
    rgb = px.astype(np.float64)
    want = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    assert luma.shape == (10, 16)
    assert np.allclose(luma, want)


def test_decode_png_grayscale_and_palette_and_rgba():
    import numpy as np

    from wellmeet_data_pipeline_spark.operators.multimodal import decode_png

    g = np.arange(48, dtype=np.uint8).reshape(6, 8, 1)
    assert np.array_equal(decode_png(_encode_png(g, ctype=0)), g[:, :, 0])

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1, 2, 0]] * 4, dtype=np.uint8)[:, :, None]
    luma = decode_png(_encode_png(idx, ctype=3, palette=pal))
    assert round(luma[0, 0], 3) == round(0.299 * 255, 3)  # red
    assert round(luma[0, 1], 3) == round(0.587 * 255, 3)  # green

    rgba = np.zeros((4, 4, 4), dtype=np.uint8)
    rgba[:, :, 1] = 200  # green, alpha 0
    assert np.allclose(decode_png(_encode_png(rgba, ctype=6)), 0.587 * 200)


def test_decode_png_rejects_unsupported_variants():
    import struct
    import zlib

    import numpy as np
    import pytest

    from wellmeet_data_pipeline_spark.operators.multimodal import decode_png

    px = np.zeros((2, 2, 3), dtype=np.uint8)
    good = _encode_png(px)
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JUNK" + good)
    # bit depth 16
    bad = bytearray(good)
    bad[24] = 16
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(bad))
    # interlaced
    bad = bytearray(good)
    bad[28] = 1
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(bytes(bad))
    # truncated pixel payload
    with pytest.raises(ValueError):
        decode_png(good[:40])


def test_phash_on_real_png_pixels_near_and_far(spark):
    """pHash over REAL decoded PNG pixels: a uniform brightness shift
    (the canonical pHash invariance — DCT AC terms ignore constant
    offsets) hashes identically; an unrelated image is far — the
    multimodal seam is now closed end-to-end for PNG."""
    import numpy as np

    from wellmeet_data_pipeline_spark.operators.multimodal import (
        phash_assets,
        png_gray8x8,
    )

    yy, xx = np.mgrid[0:32, 0:32]
    base = (
        100
        + 60 * np.sin(yy * 0.6) * np.cos(xx * 0.4)
        + 40 * np.sin((xx + 2 * yy) * 0.23)
    ).astype(np.uint8)
    img_a = np.stack([base, base // 2, base // 3], axis=2)
    img_b = np.clip(img_a.astype(np.int32) + 6, 0, 255).astype(np.uint8)
    rng = np.random.default_rng(3)
    img_c = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)

    rows = [
        (1, "image/png", bytearray(_encode_png(img_a, filters=[4] * 32))),
        (2, "image/png", bytearray(_encode_png(img_b, filters=[2] * 32))),
        (3, "image/png", bytearray(_encode_png(img_c))),
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, media_type string, payload binary"
    )
    got = {r["asset_id"]: r["phash"] for r in phash_assets(assets, png_gray8x8).collect()}
    d_ab = bin(got[1] ^ got[2]).count("1")
    d_ac = bin(got[1] ^ got[3]).count("1")
    assert d_ab <= 6  # brightness-shifted twin: near-identical hash
    assert d_ac >= 16  # unrelated image: far


# ---------------------------------------------------------------------------
# Baseline-JPEG decode (r10 verdict item 8): the test-side encoder below
# emits real baseline JPEG (DCT + quant + canonical Huffman + stuffing +
# optional restart intervals / 4:2:0 interleave) so decode_jpeg_gray is
# exercised against the actual bitstream format, not a fixture file.
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # stuffing
                self.acc = 0
                self.n = 0

    def align(self):
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s

    def marker(self, m):
        self.align()
        self.out += bytes([0xFF, m])


def _huff_from_symbols(symbols):
    """Canonical all-equal-length Huffman table over the distinct symbol
    set: (bits[16], huffval, {sym: (code, len)})."""
    syms = sorted(set(symbols))
    n = len(syms)
    ln = 2
    while (1 << ln) - 1 < n:
        ln += 1
    bits = [0] * 16
    bits[ln - 1] = n
    enc = {s: (i, ln) for i, s in enumerate(syms)}
    return bits, syms, enc


def _jpeg_blocks(plane, q):
    """Quantized zigzag blocks of an 8x8-padded gray plane, raster MCU
    order (single component)."""
    import numpy as np

    from wellmeet_data_pipeline_spark.operators.multimodal import (
        _ZIGZAG,
        _dct8_matrix,
    )

    M = _dct8_matrix()
    h, w = plane.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.zeros((ph, pw))
    padded[:h, :w] = plane
    padded[h:, :w] = plane[h - 1 : h, :]
    padded[:, w:] = padded[:, w - 1 : w]
    blocks = []
    for y in range(0, ph, 8):
        for x in range(0, pw, 8):
            coef = M @ (padded[y : y + 8, x : x + 8] - 128.0) @ M.T
            flat = coef.reshape(-1)
            blocks.append(
                [int(round(flat[_ZIGZAG[k]] / q[k])) for k in range(64)]
            )
    return blocks


def _block_symbols(zz, pred):
    """(dc_sym, dc_bits), [(ac_sym, ac_bits)...], new_pred for one block."""
    diff = zz[0] - pred

    def mag(v):
        t = 0
        a = abs(v)
        while a:
            t += 1
            a >>= 1
        return t, (v if v >= 0 else v + (1 << t) - 1)

    t, code = mag(diff)
    dc = (t, code)
    acs = []
    run = 0
    last = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            acs.append((0xF0, (0, 0)))
            run -= 16
        s, c = mag(zz[k])
        acs.append(((run << 4) | s, (s, c)))
        run = 0
    if last < 63:
        acs.append((0x00, (0, 0)))
    return dc, acs, zz[0]


def _encode_jpeg_gray(px, q=None, dri=0):
    """Minimal REAL baseline-JPEG encoder, grayscale 4:4:4: the decoder's
    fixture source.  `q` is a 64-entry zigzag quant table (default all
    ones: quantization loss is just coefficient rounding)."""
    import struct

    q = list(q) if q is not None else [1] * 64
    plane = px.astype(float)
    h, w = plane.shape
    blocks = _jpeg_blocks(plane, q)

    dc_syms, ac_syms = [], []
    pred = 0
    per_block = []
    for bi, zz in enumerate(blocks):
        if dri and bi and bi % dri == 0:
            pred = 0  # restart resets DC prediction
        dc, acs, pred = _block_symbols(zz, pred)
        per_block.append((dc, acs))
        dc_syms.append(dc[0])
        ac_syms += [a[0] for a in acs]
    dbits, dvals, denc = _huff_from_symbols(dc_syms)
    abits, avals, aenc = _huff_from_symbols(ac_syms)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(q)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    out += (
        b"\xff\xc4"
        + struct.pack(">H", 3 + 16 + len(dvals))
        + b"\x00"
        + bytes(dbits)
        + bytes(dvals)
    )
    out += (
        b"\xff\xc4"
        + struct.pack(">H", 3 + 16 + len(avals))
        + b"\x10"
        + bytes(abits)
        + bytes(avals)
    )
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + b"\x01\x00\x00\x3f\x00"

    bw = _BitWriter()
    rst = 0
    for bi, (dc_, acs) in enumerate(per_block):
        if dri and bi and bi % dri == 0:
            bw.marker(0xD0 + rst % 8)
            rst += 1
        t, code = dc_
        c, ln = denc[t]
        bw.write(c, ln)
        if t:
            bw.write(code, t)
        for sym, (s, cc) in acs:
            c, ln = aenc[sym]
            bw.write(c, ln)
            if s:
                bw.write(cc, s)
    bw.align()
    out += bw.out + b"\xff\xd9"
    return bytes(out)


def test_decode_jpeg_roundtrip_gray():
    """Irregular dims (edge MCUs cropped), q=1: reconstruction error is
    pure DCT rounding, bounded by a couple of gray levels."""
    import numpy as np

    from wellmeet_data_pipeline_spark.operators.multimodal import decode_jpeg_gray

    yy, xx = np.mgrid[0:17, 0:24]
    px = (96 + 80 * np.sin(yy * 0.5) * np.cos(xx * 0.3)).astype(np.uint8)
    got = decode_jpeg_gray(_encode_jpeg_gray(px))
    assert got.shape == (17, 24)
    assert float(np.abs(got - px).max()) < 3.0


def test_decode_jpeg_quant_restart_exactness():
    """With a non-trivial quant table + restart intervals, the decoder
    must reproduce EXACTLY the dequantized-coefficient reconstruction the
    test recomputes in numpy — pins Huffman, RST handling, dequant, and
    IDCT bit-for-bit (up to clipping)."""
    import numpy as np

    from wellmeet_data_pipeline_spark.operators.multimodal import (
        _ZIGZAG,
        _dct8_matrix,
        decode_jpeg_gray,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(16, 32)).astype(np.uint8)
    q = [(3 + (k * 5) % 17) for k in range(64)]
    payload = _encode_jpeg_gray(px, q=q, dri=2)
    got = decode_jpeg_gray(payload)

    M = _dct8_matrix()
    want = np.zeros((16, 32))
    blocks = _jpeg_blocks(px.astype(float), q)
    bi = 0
    for y in range(0, 16, 8):
        for x in range(0, 32, 8):
            coef = np.zeros(64)
            for k in range(64):
                coef[_ZIGZAG[k]] = blocks[bi][k] * q[k]
            want[y : y + 8, x : x + 8] = M.T @ coef.reshape(8, 8) @ M + 128.0
            bi += 1
    assert float(np.abs(got - np.clip(want, 0, 255)).max()) < 1e-9


def test_decode_jpeg_rejects_progressive():
    import numpy as np
    import pytest as _pytest

    from wellmeet_data_pipeline_spark.operators.multimodal import decode_jpeg_gray

    px = np.full((8, 8), 128, dtype=np.uint8)
    payload = bytearray(_encode_jpeg_gray(px))
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with _pytest.raises(ValueError, match="baseline"):
        decode_jpeg_gray(bytes(payload))


def test_phash_on_real_jpeg_pixels_near_and_far(spark):
    """The PNG pHash seam test, second format: brightness-shifted twin
    hashes near, unrelated image far — over REAL decoded JPEG pixels."""
    import numpy as np

    from wellmeet_data_pipeline_spark.operators.multimodal import (
        jpeg_gray8x8,
        phash_assets,
    )

    yy, xx = np.mgrid[0:32, 0:32]
    base = (
        100
        + 60 * np.sin(yy * 0.6) * np.cos(xx * 0.4)
        + 40 * np.sin((xx + 2 * yy) * 0.23)
    ).astype(np.uint8)
    shifted = np.clip(base.astype(np.int32) + 6, 0, 255).astype(np.uint8)
    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)

    rows = [
        (1, "image/jpeg", bytearray(_encode_jpeg_gray(base))),
        (2, "image/jpeg", bytearray(_encode_jpeg_gray(shifted, dri=3))),
        (3, "image/jpeg", bytearray(_encode_jpeg_gray(noise))),
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, media_type string, payload binary"
    )
    got = {
        r["asset_id"]: r["phash"]
        for r in phash_assets(assets, jpeg_gray8x8).collect()
    }
    d_ab = bin(got[1] ^ got[2]).count("1")
    d_ac = bin(got[1] ^ got[3]).count("1")
    assert d_ab <= 6
    assert d_ac >= 16


def _encode_jpeg_420(y, cb, cr):
    """3-component 4:2:0 interleaved baseline encoder (Y 2x2-sampled) —
    exercises the decoder's chroma bitstream-sync path.  One shared
    DC/AC Huffman table pair over all components; q=1 everywhere."""
    import struct

    import numpy as np

    q = [1] * 64
    yb = _jpeg_blocks(y.astype(float), q)
    cbb = _jpeg_blocks(cb.astype(float), q)
    crb = _jpeg_blocks(cr.astype(float), q)
    h, w = y.shape
    mcux, mcuy = w // 16, h // 16
    ybw = w // 8  # Y block-grid width

    order = []  # (component key, block) in scan order
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(2):
                for bx in range(2):
                    order.append(("y", yb[(2 * my + by) * ybw + (2 * mx + bx)]))
            order.append(("cb", cbb[my * mcux + mx]))
            order.append(("cr", crb[my * mcux + mx]))

    dc_syms, ac_syms, per = [], [], []
    pred = {"y": 0, "cb": 0, "cr": 0}
    for key, zz in order:
        dc, acs, pred[key] = _block_symbols(zz, pred[key])
        per.append((dc, acs))
        dc_syms.append(dc[0])
        ac_syms += [a[0] for a in acs]
    dbits, dvals, denc = _huff_from_symbols(dc_syms)
    abits, avals, aenc = _huff_from_symbols(ac_syms)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(q)
    out += (
        b"\xff\xc0"
        + struct.pack(">HBHHB", 17, 8, h, w, 3)
        + b"\x01\x22\x00\x02\x11\x00\x03\x11\x00"
    )
    out += (
        b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(dvals)) + b"\x00"
        + bytes(dbits) + bytes(dvals)
    )
    out += (
        b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(avals)) + b"\x10"
        + bytes(abits) + bytes(avals)
    )
    out += (
        b"\xff\xda"
        + struct.pack(">HB", 12, 3)
        + b"\x01\x00\x02\x00\x03\x00\x00\x3f\x00"
    )
    bw = _BitWriter()
    for dc_, acs in per:
        t, code = dc_
        c, ln = denc[t]
        bw.write(c, ln)
        if t:
            bw.write(code, t)
        for sym, (s, cc) in acs:
            c, ln = aenc[sym]
            bw.write(c, ln)
            if s:
                bw.write(cc, s)
    bw.align()
    out += bw.out + b"\xff\xd9"
    return bytes(out)


def test_decode_jpeg_420_chroma_sync():
    """Interleaved 4:2:0: the decoder must entropy-decode Cb/Cr blocks to
    stay in sync while reconstructing only luma — a sync bug corrupts
    every MCU after the first."""
    import numpy as np

    from wellmeet_data_pipeline_spark.operators.multimodal import decode_jpeg_gray

    yy, xx = np.mgrid[0:32, 0:48]
    y = (80 + 70 * np.sin(yy * 0.37 + 1) * np.cos(xx * 0.51)).astype(np.uint8)
    cb = np.full((16, 24), 100, dtype=np.uint8)
    cr = (128 + 40 * np.sin(np.arange(16 * 24).reshape(16, 24) * 0.7)).astype(
        np.uint8
    )
    got = decode_jpeg_gray(_encode_jpeg_420(y, cb, cr))
    assert got.shape == (32, 48)
    assert float(np.abs(got - y).max()) < 3.0
