"""Multimodal plumbing tests: byte features recomputed in pure Python,
and the decode stub's contract."""

from __future__ import annotations

import pytest

from mapreduce_project_spark.operators.multimodal import (
    attach_payload,
    byte_features,
    decode_media,
)
from mapreduce_project_spark.sources import load_table
from tests.conftest import SF_DIR


def test_byte_features_match_python(spark):
    docs = load_table(spark, SF_DIR, "documents")
    feats = {r["doc_id"]: r for r in byte_features(attach_payload(docs)).collect()}
    sample = docs.select("doc_id", "text").limit(50).collect()
    assert len(feats) == docs.count()
    for row in sample:
        b = row["text"].encode("utf-8")
        got = feats[row["doc_id"]]
        assert got["n_bytes"] == len(b)
        assert got["byte_sum"] == sum(b)
        assert got["mean_byte"] == sum(b) / len(b)
        assert got["n_frames"] == (len(b) + 255) // 256


def test_frame_sample_matches_python(spark):
    from mapreduce_project_spark.operators.multimodal import frame_sample

    docs = load_table(spark, SF_DIR, "documents").limit(20)
    got: dict[tuple, bytes] = {
        (r["doc_id"], r["frame_idx"]): bytes(r["frame"])
        for r in frame_sample(attach_payload(docs), frame_size=256, every=4).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        b = row["text"].encode("utf-8")
        n_frames = (len(b) + 255) // 256
        expect_idx = list(range(0, n_frames, 4))
        mine = [k for k in got if k[0] == row["doc_id"]]
        assert sorted(k[1] for k in mine) == expect_idx
        for fi in expect_idx:
            assert got[(row["doc_id"], fi)] == b[fi * 256 : (fi + 1) * 256]


def test_decode_stub_and_guard_branches_raise_cleanly(spark):
    # no codec stubs remain — but every guard must still be a clean
    # error: a header-only JPEG (no scan) → ValueError, progressive
    # SOF2 → NotImplementedError, truncated PNG chain → ValueError,
    # 16-bit PNG → NotImplementedError, palette without PLTE →
    # ValueError
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    from mapreduce_project_spark.operators.jpeg import jpeg_decode
    from mapreduce_project_spark.operators.multimodal import _decode_png

    df = spark.createDataFrame(
        [(1, bytearray(_jpeg(4, 4)))], "doc_id long, payload binary"
    )
    with pytest.raises(
        (PythonException, Py4JJavaError),
        match="NotImplementedError|ValueError|subsampled|without a scan",
    ):
        # header-only fixture: declares 0x00 sampling and has no scan —
        # either guard firing is a clean, typed error
        decode_media(df).collect()
    progressive = _jpeg(4, 4).replace(b"\xff\xc0", b"\xff\xc2")
    with pytest.raises(NotImplementedError, match="non-baseline"):
        jpeg_decode(progressive)
    with pytest.raises(ValueError, match="missing IHDR/IDAT"):
        _decode_png(_png(4, 4))  # header-only fixture: no IDAT
    import struct
    import zlib

    def ihdr_png(depth, ctype, interlace):
        body = struct.pack(">IIBBBBB", 2, 2, depth, ctype, 0, 0, interlace)
        def chunk(t, b):
            return struct.pack(">I", len(b)) + t + b + struct.pack(
                ">I", zlib.crc32(t + b)
            )
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", body)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 32))
            + chunk(b"IEND", b"")
        )

    with pytest.raises(NotImplementedError, match="PNG"):
        _decode_png(ihdr_png(16, 2, 0))
    with pytest.raises(ValueError, match="PLTE"):
        _decode_png(ihdr_png(8, 3, 0))  # palette type but no PLTE chunk


def test_png_adam7_and_palette_roundtrip():
    # the remaining 8-bit spec surface: Adam7 interlacing (all 7
    # passes, independently filtered sub-images) and palette color
    # (PLTE lookup), both property-swept and composable
    import numpy as np

    from mapreduce_project_spark.operators.multimodal import (
        _decode_png,
        png_encode,
    )

    rng = np.random.RandomState(20260815)
    for ch in (1, 3, 4):
        for w, h in [(1, 1), (7, 13), (16, 16), (9, 2), (3, 31)]:
            raster = rng.randint(0, 256, size=h * w * ch, dtype=np.uint8).tobytes()
            for ft in (0, 1, 2, 3, 4, None):
                got = _decode_png(png_encode(raster, w, h, ch, ft, interlace=True))
                assert got == (w, h, ch, raster), ("adam7", w, h, ch, ft)
    for w, h in [(4, 4), (16, 8), (13, 7)]:
        small = rng.randint(0, 5, size=(h * w, 1)).repeat(3, axis=1) * 40
        raster = small.astype(np.uint8).tobytes()
        for il in (False, True):
            got = _decode_png(
                png_encode(raster, w, h, 3, None, interlace=il, palette=True)
            )
            assert got == (w, h, 3, raster), ("palette", w, h, il)
    import pytest as _pytest

    big = np.arange(300, dtype=np.uint16)
    r = np.stack([big % 256, big // 256, big * 0], axis=1).astype(np.uint8).tobytes()
    with _pytest.raises(ValueError, match="<=256 colors"):
        png_encode(r, 300, 1, 3, palette=True)


def test_png_encode_decode_property_roundtrip():
    # VERDICT r4 task 2: property test over random rasters × every
    # filter type × every supported color type — encode (real deflate,
    # real CRCs) then decode must reproduce the raster byte-for-byte
    import numpy as np

    from mapreduce_project_spark.operators.multimodal import (
        _decode_png,
        png_encode,
    )

    rng = np.random.RandomState(20260814)
    shapes = [(1, 1), (16, 4), (7, 13), (48, 2), (3, 31)]
    for ch in (1, 3, 4):
        for w, h in shapes:
            raster = rng.randint(0, 256, size=h * w * ch, dtype=np.uint8).tobytes()
            for ft in (0, 1, 2, 3, 4, None, lambda y: (y * 7 + 3) % 5):
                got = _decode_png(png_encode(raster, w, h, ch, ft))
                assert got == (w, h, ch, raster), (w, h, ch, ft)
    # adversarial rasters: constant, ramp (cumsum stress), alternating
    for ch, w, h in [(3, 16, 8), (4, 5, 5), (1, 64, 3)]:
        for raster in (
            bytes(h * w * ch),
            bytes(range(256))[: h * w * ch]
            if h * w * ch <= 256
            else (np.arange(h * w * ch, dtype=np.uint64) % 256)
            .astype(np.uint8)
            .tobytes(),
            (b"\x00\xff" * (h * w * ch))[: h * w * ch],
        ):
            got = _decode_png(png_encode(raster, w, h, ch))
            assert got == (w, h, ch, raster)


def test_decode_media_png_through_spark(spark):
    # the Spark path end-to-end: a real filtered+deflated RGBA PNG
    # through decode_media keeps dims/channels/n_values and the raster
    import numpy as np

    from mapreduce_project_spark.operators.multimodal import png_encode

    rng = np.random.RandomState(5)
    raster = rng.randint(0, 256, size=6 * 4 * 4, dtype=np.uint8).tobytes()
    df = spark.createDataFrame(
        [(1, bytearray(png_encode(raster, 6, 4, 4)))], "doc_id long, payload binary"
    )
    r = decode_media(df).collect()[0]
    assert (r["format"], r["width"], r["height"], r["channels"]) == ("png", 6, 4, 4)
    assert r["bits_per_value"] == 8 and r["n_values"] == 96
    assert bytes(r["data"]) == raster


def _encode_ppm(w, h, rgb: bytes) -> bytes:
    return b"P6\n# synthetic fixture\n%d %d\n255\n" % (w, h) + rgb


def _encode_bmp(w, h, rgb: bytes, top_down: bool = False) -> bytes:
    # uncompressed 24-bit: BGR pixels, rows padded to 4 bytes,
    # bottom-up unless height is negative
    stride = (w * 3 + 3) // 4 * 4
    rows = []
    for r in range(h):
        row = bytearray()
        for c in range(w):
            i = (r * w + c) * 3
            row += bytes([rgb[i + 2], rgb[i + 1], rgb[i]])  # RGB → BGR
        row += b"\x00" * (stride - w * 3)
        rows.append(bytes(row))
    body = b"".join(rows if top_down else rows[::-1])
    hdr_h = h if top_down is False else -h
    info = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + hdr_h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + b"\x00" * 16
    )
    off = 14 + len(info)
    return (
        b"BM" + (off + len(body)).to_bytes(4, "little") + b"\x00" * 4
        + off.to_bytes(4, "little") + info + body
    )


def _encode_wav_pcm(channels, rate, bits, samples: bytes) -> bytes:
    # chunk-chain stress: a LIST chunk with an ODD size (word-aligned
    # with a pad byte) sits BEFORE fmt, so the decoder must walk chunks
    fmt = (
        b"fmt " + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little") + rate.to_bytes(4, "little")
        + (rate * channels * bits // 8).to_bytes(4, "little")
        + (channels * bits // 8).to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    lst = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"  # odd + pad
    data = b"data" + len(samples).to_bytes(4, "little") + samples
    body = b"WAVE" + lst + fmt + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_decode_media_roundtrip_uncompressed(spark):
    # planted encode→decode roundtrip: PPM (comment-bearing header),
    # BMP bottom-up (padded BGR rows) AND top-down (negative height),
    # and 16-bit PCM WAV with a pre-fmt LIST chunk — every decoded
    # canonical byte string must equal the pixels/samples that were
    # encoded
    rgb = bytes(range(5 * 3 * 3))  # 5×3 RGB image, distinct byte per cell
    pcm = b"".join(v.to_bytes(2, "little", signed=True) for v in [-3, 7, -32768, 32767, 0, 12345])
    payloads = {
        1: _encode_ppm(5, 3, rgb),
        2: _encode_bmp(5, 3, rgb, top_down=False),
        3: _encode_bmp(5, 3, rgb, top_down=True),
        4: _encode_wav_pcm(2, 44100, 16, pcm),
    }
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in payloads.items()], "doc_id long, payload binary"
    )
    got = {r["doc_id"]: r for r in decode_media(df).collect()}
    assert len(got) == 4
    for i, fmt in [(1, "ppm"), (2, "bmp"), (3, "bmp")]:
        r = got[i]
        assert (r["format"], r["width"], r["height"], r["channels"]) == (fmt, 5, 3, 3)
        assert r["n_values"] == 45 and bytes(r["data"]) == rgb
    r = got[4]
    assert (r["format"], r["channels"], r["sample_rate_hz"]) == ("wav", 2, 44100)
    assert r["bits_per_value"] == 16 and r["n_values"] == 6
    assert bytes(r["data"]) == pcm


def _png(w, h):
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + b"\x08\x02\x00\x00\x00"
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big") + b"IHDR" + ihdr + b"\x00\x00\x00\x00"
    )


def _jpeg(w, h):
    # SOI + APP0 segment + SOF0 frame header
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x03" + b"\x00" * 9
    )
    return b"\xff\xd8" + app0 + sof0


def _wav(channels, rate):
    fmt = (
        b"fmt " + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little") + rate.to_bytes(4, "little") + b"\x00" * 8
    )
    return b"RIFF" + (36).to_bytes(4, "little") + b"WAVE" + fmt


def test_media_header_probe_parses_real_headers(spark):
    from mapreduce_project_spark.operators.multimodal import media_header_probe

    rows = [
        (1, _png(640, 480)),
        (2, _jpeg(1920, 1080)),
        (3, _wav(2, 44100)),
        (4, b"not a media file"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r.asDict() for r in media_header_probe(df).collect()}
    assert got[1]["format"] == "png" and (got[1]["width"], got[1]["height"]) == (640, 480)
    assert got[2]["format"] == "jpeg" and (got[2]["width"], got[2]["height"]) == (1920, 1080)
    assert got[3]["format"] == "wav" and (got[3]["channels"], got[3]["sample_rate_hz"]) == (2, 44100)
    assert got[4]["format"] == "unknown" and got[4]["width"] is None


def test_png_dims_jvm_twin_matches_probe(spark):
    from mapreduce_project_spark.operators.multimodal import (
        media_header_probe,
        png_dims,
    )

    rows = [(i, _png(64 * i, 32 * i)) for i in range(1, 6)] + [(99, b"junk12345")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    jvm = {
        r["doc_id"]: (r["png_width"], r["png_height"])
        for r in png_dims(df).collect()
    }
    py = {
        r["doc_id"]: (r["width"], r["height"])
        for r in media_header_probe(df).collect()
    }
    assert jvm[99] == (None, None)
    for i in range(1, 6):
        assert jvm[i] == (64 * i, 32 * i) == py[i]
    # the JVM path is zero-shuffle codegen: no Exchange in the plan
    plan = png_dims(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_patchify_patch_bytes_consistent(spark):
    # every emitted patch tensor is exactly patch*patch bytes, its
    # non-pad count matches the coordinate math, and its bytes sum to
    # byte_sum (pads contribute 0) — ties the binary column to the
    # oracle-checked statistics
    from mapreduce_project_spark.operators.multimodal import attach_payload, patchify

    docs = load_table(spark, SF_DIR, "documents").limit(50)
    rows = patchify(attach_payload(docs)).collect()
    assert rows
    for r in rows:
        blob = bytes(r["patch"])
        assert len(blob) == 256
        assert sum(blob) == r["byte_sum"]
        assert 0 <= r["n_real"] <= 256
        # pads are zeros: count of nonzero bytes <= n_real
        assert sum(1 for b in blob if b) <= r["n_real"]


def test_jpeg_codec_property_envelope():
    # JPEG is lossy, so the pin is an ERROR ENVELOPE, not equality:
    # decode(encode(x)) within a quality-dependent bound across sizes
    # (incl. non-multiples of 8), channels and content shapes; decode
    # and encode are bit-deterministic
    import numpy as np

    from mapreduce_project_spark.operators.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.RandomState(20260814)
    cases = []
    for w, h in [(8, 8), (32, 24), (17, 9), (7, 5), (64, 16)]:
        xs, ys = np.linspace(0, 255, w), np.linspace(0, 255, h)
        grad = np.clip(np.add.outer(ys, xs) / 2, 0, 255).astype(np.uint8)
        smooth = np.stack([grad, 255 - grad, np.roll(grad, 3, axis=1)], axis=-1)
        noise = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        cases += [(w, h, 3, smooth, 14), (w, h, 3, noise, 40)]
        cases.append((w, h, 1, grad[..., None], 8))
    for w, h, ch, img, bound in cases:
        raw = img[..., :ch].tobytes()
        enc = jpeg_encode(raw, w, h, ch, quality=95)
        W, H, C, data = jpeg_decode(enc)
        assert (W, H, C) == (w, h, ch)
        got = np.frombuffer(data, dtype=np.uint8).reshape(h, w, ch).astype(int)
        err = np.abs(got - img[..., :ch].astype(int))
        assert err.max() <= bound, (w, h, ch, err.max(), bound)
        # determinism, both directions
        assert jpeg_encode(raw, w, h, ch, quality=95) == enc
        assert jpeg_decode(enc)[3] == data
    # lower quality compresses harder but still decodes in-range
    raw = cases[0][3].tobytes()
    small = jpeg_encode(raw, 8, 8, 3, quality=25)
    assert len(small) < len(jpeg_encode(raw, 8, 8, 3, quality=95))
    jpeg_decode(small)


def test_jpeg_through_spark_and_header_probe_interop(spark):
    # decode_media takes the real JPEG path end-to-end, and the
    # INDEPENDENT header parser (media_header_probe's SOF walk) reads
    # the encoder's markers — a second implementation agreeing on the
    # container structure
    import numpy as np

    from mapreduce_project_spark.operators.jpeg import jpeg_encode
    from mapreduce_project_spark.operators.multimodal import media_header_probe

    xs = np.linspace(0, 255, 24)
    grad = np.clip(np.add.outer(np.linspace(0, 255, 16), xs) / 2, 0, 255).astype(
        np.uint8
    )
    rgb = np.stack([grad, grad[::-1], 255 - grad], axis=-1)
    payload = jpeg_encode(rgb.tobytes(), 24, 16, 3, quality=92)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    r = decode_media(df).collect()[0]
    assert (r["format"], r["width"], r["height"], r["channels"]) == ("jpeg", 24, 16, 3)
    assert r["n_values"] == 24 * 16 * 3 and len(bytes(r["data"])) == r["n_values"]
    p = media_header_probe(df).collect()[0]
    assert (p["format"], p["width"], p["height"]) == ("jpeg", 24, 16)


def test_jpeg_malformed_and_foreign_stream_robustness():
    # round-5 ADVICE hardening: a corpus scan hitting a truncated or
    # oddly-marked JPEG must die with the documented ValueError, never
    # IndexError, and spec-legal standalone markers (TEM, stray RSTn
    # before SOS) must not desync the segment walk.
    import numpy as np
    import pytest

    from mapreduce_project_spark.operators.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.RandomState(7)
    raw = rng.randint(0, 256, size=16 * 16 * 3, dtype=np.uint8).tobytes()
    enc = jpeg_encode(raw, 16, 16, 3, quality=90)
    baseline = jpeg_decode(enc)

    # 1) truncated entropy data -> ValueError, not IndexError
    sos = enc.find(b"\xff\xda")
    assert sos > 0
    truncated = enc[: sos + 20]  # cut mid-entropy, well before EOI
    with pytest.raises(ValueError, match="truncated JPEG"):
        jpeg_decode(truncated)

    # 2) standalone TEM (0xFF01) after SOI: length-less marker the
    #    walk must skip, not treat as a sized segment
    tem = enc[:2] + b"\xff\x01" + enc[2:]
    assert jpeg_decode(tem) == baseline

    # 3) stray RSTn before SOS: also length-less, also skipped
    rst = enc[:2] + b"\xff\xd3" + enc[2:]
    assert jpeg_decode(rst) == baseline

    # 4) RST marker inside entropy data while DRI=0 -> hard error
    #    (previously fed silent zero bits)
    body_at = sos + 2 + int.from_bytes(enc[sos + 2 : sos + 4], "big")
    poisoned = enc[:body_at] + b"\xff\xd4" + enc[body_at:]
    with pytest.raises(ValueError, match="DRI=0"):
        jpeg_decode(poisoned)

    # 5) truncated segment header (cut inside a marker's length field)
    dqt = enc.find(b"\xff\xdb")
    with pytest.raises(ValueError, match="truncated JPEG segment header"):
        jpeg_decode(enc[: dqt + 3])


def test_jpeg_chroma_subsampling_roundtrip_envelopes():
    # round-6 (VERDICT r5 task 4): 4:2:0 / 4:2:2 decode per T.81 A.2.3
    # (interleaved hi x vi blocks per MCU, replication upsampling) and
    # the matching block-mean-downsampling encode. Envelope physics:
    # luma is NOT subsampled so it stays near the 4:4:4 accuracy even
    # on noise; chroma of noise is unrecoverable by design (the 2x2
    # mean is a lowpass), so the noise pin is luma + mean, not max.
    import numpy as np
    import pytest

    from mapreduce_project_spark.operators.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.RandomState(3)
    for w, h in [(16, 16), (24, 16), (17, 13), (8, 8), (33, 9)]:
        yy, xx = np.mgrid[0:h, 0:w]
        smooth = np.stack(
            [xx * 255 / max(w - 1, 1), yy * 255 / max(h - 1, 1),
             (xx + yy) * 128 / max(w + h - 2, 1)], axis=-1
        ).astype(np.uint8)
        noise = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        for sub in ["422", "420"]:
            for img, kind in [(smooth, "smooth"), (noise, "noise")]:
                enc = jpeg_encode(img.tobytes(), w, h, 3, quality=95,
                                  subsampling=sub)
                W, H, C, data = jpeg_decode(enc)
                assert (W, H, C) == (w, h, 3)
                # bit determinism, both directions
                assert jpeg_encode(img.tobytes(), w, h, 3, quality=95,
                                   subsampling=sub) == enc
                assert jpeg_decode(enc)[3] == data
                got = np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
                err = np.abs(got.astype(int) - img.astype(int))
                if kind == "smooth":
                    assert err.max() <= 35  # measured <= 26
                else:
                    assert err.mean() <= 60  # measured <= 46
                    ly = (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1]
                          + 0.114 * img[:, :, 2])
                    lg = (0.299 * got[:, :, 0].astype(float)
                          + 0.587 * got[:, :, 1].astype(float)
                          + 0.114 * got[:, :, 2].astype(float))
                    assert np.abs(ly - lg).max() <= 25  # measured <= 17.2

    # subsampled streams are SMALLER on compressible content
    big = rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
    assert len(jpeg_encode(big.tobytes(), 32, 32, 3, subsampling="420")) < len(
        jpeg_encode(big.tobytes(), 32, 32, 3, subsampling="444")
    )
    # grayscale ignores the subsampling parameter entirely
    g = rng.randint(0, 256, size=(8, 8, 1), dtype=np.uint8)
    assert jpeg_encode(g.tobytes(), 8, 8, 1, subsampling="420") == jpeg_encode(
        g.tobytes(), 8, 8, 1
    )
    # factors > 2 still rejected cleanly
    enc = jpeg_encode(noise.tobytes(), 33, 9, 3, quality=95)
    bad = enc.replace(bytes([1, 0x11, 0]), bytes([1, 0x41, 0]))
    with pytest.raises(NotImplementedError, match="sampling factors"):
        jpeg_decode(bad)
    with pytest.raises(ValueError, match="subsampling"):
        jpeg_encode(noise.tobytes(), 33, 9, 3, subsampling="411")


def test_logmel_planted_tone_lands_in_predicted_band(spark):
    # A pure 3 kHz tone at 8 kHz must put its energy in the mel band
    # whose triangle covers 3 kHz — computed INDEPENDENTLY here from
    # the HTK mel formula — and the whole pipeline must match a
    # from-scratch numpy DFT reference per cell.
    import numpy as np

    from mapreduce_project_spark.operators.multimodal import (
        _mel_filterbank,
        logmel_features,
    )

    sr, n_fft, hop, n_mels = 8000, 256, 128, 16
    t = np.arange(sr)  # 1 second
    tone = (0.5 * np.sin(2 * np.pi * 3000.0 * t / sr) * 32767).astype("<i2")
    quiet = (np.zeros(sr)).astype("<i2")
    df = spark.createDataFrame(
        [(1, bytearray(tone.tobytes()), sr), (2, bytearray(quiet.tobytes()), sr)],
        "id long, data binary, sample_rate_hz long",
    )
    got = {
        r["id"]: r
        for r in logmel_features(df, "id", "data", "sample_rate_hz",
                                 n_fft, hop, n_mels).collect()
    }
    # independent reference for the tone
    x = tone.astype(np.float64) / 32768.0
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    frames = np.stack([x[s:s + n_fft] * win
                       for s in range(0, len(x) - n_fft + 1, hop)])
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    fb = _mel_filterbank(n_mels, n_fft, sr)
    ref = np.log10(power @ fb.T + 1e-10)
    r = got[1]
    assert r["n_frames"] == ref.shape[0]
    feats = np.array(r["feats"]).reshape(-1, n_mels)
    assert np.allclose(feats, ref, rtol=0, atol=1e-12)
    # the tone's band: argmax of the summed spectrum == the band whose
    # mel center is nearest 3 kHz, derived straight from the formula
    centers_mel = np.linspace(0, 2595 * np.log10(1 + (sr / 2) / 700), n_mels + 2)[1:-1]
    centers_hz = 700 * (10 ** (centers_mel / 2595) - 1)
    want_band = int(np.argmin(np.abs(centers_hz - 3000.0)))
    assert int(feats.sum(axis=0).argmax()) == want_band
    # silence floors at log10(1e-10) = -10 in every cell
    qf = np.array(got[2]["feats"])
    assert np.allclose(qf, -10.0, atol=1e-9)


def _phash_reference(text: str) -> int:
    # Independent pHash replay: same documented spec (16-wide PPM
    # raster from UTF-8 bytes, grayscale, 32x32 nearest sample), but
    # the DCT is the DIRECT per-coefficient double sum, not the
    # operator's matrix product — any drift in the cosine basis,
    # normalization, median rule or bit packing shows up here.
    import math

    import numpy as np

    b = text.encode("utf-8")
    h = -(-max(len(b), 1) // 48)
    raster = b + b"\x00" * (48 * h - len(b))
    a = np.frombuffer(raster, np.uint8).astype(np.float64).reshape(h, 16, 3)
    gray = a.mean(axis=2)
    rows = (np.arange(32) * h) // 32
    cols = (np.arange(32) * 16) // 32
    small = gray[np.ix_(rows, cols)]
    blk = []
    for k in range(8):
        for el in range(8):
            ak = math.sqrt((1.0 if k == 0 else 2.0) / 32)
            al = math.sqrt((1.0 if el == 0 else 2.0) / 32)
            s = 0.0
            for x in range(32):
                for y in range(32):
                    s += (
                        small[x, y]
                        * math.cos(math.pi * (2 * x + 1) * k / 64)
                        * math.cos(math.pi * (2 * y + 1) * el / 64)
                    )
            blk.append(ak * al * s)
    q = [round(c * 10000.0) for c in blk]
    top = sorted(range(64), key=lambda j: (-q[j], j))[:32]
    val = 0
    for j in top:
        val |= 1 << j
    return val - (1 << 64) if val >= 1 << 63 else val


def test_phash_dedup_planted_perturbation(spark, tmp_path):
    import mapreduce_project_spark.queries_registry as R

    base = (
        "the quick brown fox jumps over the lazy dog while the band "
        "plays a slow waltz under paper lanterns and the crowd hums "
        "along to every familiar bar of the tune"
    )
    near = base[:80] + "x" * 10 + base[90:]  # visible local smudge
    other = "z" * 40 + "q w e r t y " * 20 + "m" * 37
    texts = {1: base, 2: near, 3: other, 4: base}
    spark.createDataFrame(
        [(i, s, "en", "plant", len(s)) for i, s in texts.items()],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    rows = R.ALL_QUERIES["multimodal_phash_dedup"](
        spark, str(tmp_path)
    ).collect()
    exact = {(r["rep_a"], r["rep_b"]): r for r in rows if r["hamming"] == 0}
    nears = {(r["rep_a"], r["rep_b"]): r for r in rows if r["hamming"] > 0}
    # docs 1+4 are byte-identical -> one exact perceptual cluster,
    # represented once (min doc id), never as member pairs
    assert set(exact) == {(1, 1)}
    assert exact[(1, 1)]["docs_a"] == 2
    # the smudged copy lands within the Hamming threshold as a
    # cluster-to-cluster near pair; the unrelated image never appears
    assert set(nears) == {(1, 2)}
    assert 1 <= nears[(1, 2)]["hamming"] <= 3
    assert nears[(1, 2)]["docs_a"] == 2 and nears[(1, 2)]["docs_b"] == 1
    assert not any(3 in k for k in list(exact) + list(nears))

    # per-bit equality of the operator's hash vs the direct-sum DCT
    # replay (independent cosine evaluation, quantization, ranking)
    ref = {i: _phash_reference(s) for i, s in texts.items()}
    from mapreduce_project_spark.operators.multimodal import (
        decode_media,
        phash64,
    )

    def enc_one(i, s):
        b = s.encode("utf-8")
        h = -(-max(len(b), 1) // 48)
        return (i, b"P6\n16 %d\n255\n" % h + b + b"\x00" * (48 * h - len(b)))

    enc = spark.createDataFrame(
        [enc_one(i, s) for i, s in texts.items()], "doc_id long, payload binary"
    )
    got = {
        r["doc_id"]: r["phash"]
        for r in phash64(decode_media(enc, "doc_id", "payload")).collect()
    }
    assert got == ref
    # every hash is balanced: exactly 32 set bits by construction
    for v in got.values():
        assert bin(v & ((1 << 64) - 1)).count("1") == 32
    assert bin((ref[1] ^ ref[2]) & ((1 << 64) - 1)).count("1") == nears[
        (1, 2)
    ]["hamming"]
