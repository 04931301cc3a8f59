"""Multimodal plumbing: Arrow-batched featurization and metadata-only
frame planning. Decode is REAL for PPM/BMP24/PNG (pure-python codecs,
known-answer tests below, incl. all five PNG scanline filters); other
formats take a documented byte-histogram / byte-cycling fallback."""

from __future__ import annotations

import pytest

from etl_process_for_fraud_transactions_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def assets(spark):
    return M.make_asset_table(spark, n=12)


def test_extract_features_shape(spark, assets):
    feats = M.extract_features(assets).collect()
    assert len(feats) == 12
    for r in feats:
        assert len(r.feature) == M.FEATURE_DIM
        assert r.n_bytes == 100 + r.asset_id
        assert abs(sum(r.feature) - 1.0) < 1e-6  # normalized histogram


def test_extract_features_deterministic(spark, assets):
    a = sorted((r.asset_id, tuple(r.feature)) for r in M.extract_features(assets).collect())
    b = sorted((r.asset_id, tuple(r.feature)) for r in M.extract_features(assets).collect())
    assert a == b


def test_frame_sample_plan_counts(spark, assets):
    plan = M.frame_sample_plan(assets, every_ms=1000).collect()
    by_asset = {}
    for r in plan:
        by_asset.setdefault(r.asset_id, []).append(r.frame_ts_ms)
    # only video assets planned (ids % 3 == 2), frames every second
    assert set(by_asset) == {2, 5, 8, 11}
    assert by_asset[2] == list(range(0, 7000, 1000))  # duration 5000+2000


def test_resize_images(spark, assets):
    from etl_process_for_fraud_transactions_spark.operators.multimodal import (
        resize_images,
    )

    out = resize_images(assets, width=8, height=4).collect()
    n_images = assets.filter("modality = 'image'").count()
    assert len(out) == n_images > 0
    for r in out:
        assert len(r.payload) == 8 * 4
        assert (r.meta.width, r.meta.height) == (8, 4)
    # deterministic: same input -> same bytes
    again = {r.asset_id: bytes(r.payload) for r in resize_images(assets, 8, 4).collect()}
    assert {r.asset_id: bytes(r.payload) for r in out} == again


# --- real codec path (pure-python PPM/BMP24) ------------------------------

def _ppm_2x2():
    # (255,0,0) (0,255,0) / (0,0,255) (255,255,255)
    rgb = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    return M.encode_ppm(2, 2, rgb), rgb


def test_decode_ppm_known_answer():
    payload, rgb = _ppm_2x2()
    assert M.decode_ppm(payload) == (2, 2, rgb)
    # comments + extra whitespace in header
    weird = b"P6\n# c\n 2\t2 # c2\n255\n" + rgb
    assert M.decode_ppm(weird) == (2, 2, rgb)
    # truncated pixel data -> not decodable
    assert M.decode_ppm(payload[:-1]) is None


def test_decode_bmp24_known_answer():
    import struct

    # 2x1: left red, right green; bottom-up, stride padded to 8
    row = bytes([0, 0, 255, 0, 255, 0, 0, 0])  # BGR BGR pad pad
    header = b"BM" + struct.pack("<IHHI", 54 + len(row), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 24, 0, len(row), 2835, 2835, 0, 0)
    payload = header + info + row
    assert M.decode_bmp24(payload) == (2, 1, bytes([255, 0, 0, 0, 255, 0]))


def _png_chunks(width, height, raw, color_type=2):
    """Hand-rolled PNG from a pre-filtered raw scanline stream — lets
    tests exercise specific filter types the encoder never emits."""
    import struct
    import zlib

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_known_answer():
    rgb = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    payload = M.encode_png(2, 2, rgb)
    assert M.decode_png(payload) == (2, 2, rgb)
    # sniffed through the generic entry point too
    assert M.decode_image(payload) == (2, 2, rgb)
    # corrupt the deflate stream -> not decodable
    assert M.decode_png(payload[:40] + b"\x00" * 8 + payload[48:]) is None


def test_png_all_scanline_filters():
    """One image per filter type: filter the known pixels by hand,
    decode, and require the original back."""
    # 2x2 RGB image, rows r0 / r1
    r0 = bytes([10, 20, 30, 40, 60, 80])
    r1 = bytes([15, 25, 35, 55, 75, 95])
    want = (2, 2, r0 + r1)

    def sub(row):  # x - x_prev_pixel
        out = bytearray(row[:3])
        for i in range(3, len(row)):
            out.append((row[i] - row[i - 3]) & 0xFF)
        return bytes(out)

    def up(row, prev):
        return bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))

    def avg(row, prev):
        out = bytearray()
        for i in range(len(row)):
            a = row[i - 3] if i >= 3 else 0
            out.append((row[i] - ((a + prev[i]) >> 1)) & 0xFF)
        return bytes(out)

    def paeth(row, prev):
        out = bytearray()
        for i in range(len(row)):
            a = row[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((row[i] - pred) & 0xFF)
        return bytes(out)

    cases = {
        0: b"\x00" + r0 + b"\x00" + r1,
        1: b"\x01" + sub(r0) + b"\x01" + sub(r1),
        2: b"\x00" + r0 + b"\x02" + up(r1, r0),
        3: b"\x00" + r0 + b"\x03" + avg(r1, r0),
        4: b"\x00" + r0 + b"\x04" + paeth(r1, r0),
    }
    for ftype, raw in cases.items():
        assert M.decode_png(_png_chunks(2, 2, raw)) == want, f"filter {ftype}"


def test_png_rgba_drops_alpha():
    # 1x2 RGBA: alpha varies, RGB must survive
    raw = b"\x00" + bytes([1, 2, 3, 255, 4, 5, 6, 0])
    assert M.decode_png(_png_chunks(2, 1, raw, color_type=6)) == (
        2,
        1,
        bytes([1, 2, 3, 4, 5, 6]),
    )


def test_png_out_of_scope_forms_rejected():
    import struct
    import zlib

    # palette (color type 3) -> None (fallback, not a wrong decode)
    raw = b"\x00\x00\x00"
    assert M.decode_png(_png_chunks(1, 1, raw, color_type=3)) is None
    # truncated chunk stream -> None
    good = M.encode_png(1, 1, b"\x01\x02\x03")
    assert M.decode_png(good[:20]) is None


def test_png_features_match_ppm_features():
    """The same pixels must featurize identically whichever real codec
    carried them."""
    rgb = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    via_png = M._decode_image_bytes(M.encode_png(2, 2, rgb))
    via_ppm = M._decode_image_bytes(M.encode_ppm(2, 2, rgb))
    assert via_png == via_ppm


def test_pixel_features_known_answer():
    payload, _ = _ppm_2x2()
    feats = M._decode_image_bytes(payload, "ppm")
    assert len(feats) == M.FEATURE_DIM
    assert feats[0] == feats[1] == feats[2] == 0.5  # mean R/G/B
    assert abs(feats[3] - 0.5) < 1e-12              # mean luma
    # luma bins: red->76->bin3, green->149->bin6, blue->29->bin1,
    # white->255->bin11; each 1/4 of pixels
    hist = feats[4:]
    assert {i for i, v in enumerate(hist) if v > 0} == {1, 3, 6, 11}
    assert all(abs(v - 0.25) < 1e-12 for v in hist if v > 0)


def test_real_resize_nearest_neighbor(spark):
    payload, _ = _ppm_2x2()
    rows = [(1, "image", "ppm", payload, (2, 2, None))]
    assets = spark.createDataFrame(rows, M.ASSET_SCHEMA)
    out = M.resize_images(assets, width=4, height=4).collect()
    assert len(out) == 1
    r = out[0]
    assert r.media_format == "ppm"
    w, h, rgb = M.decode_ppm(bytes(r.payload))
    assert (w, h) == (4, 4)
    # nearest-neighbor: each source pixel becomes a 2x2 block
    px = lambda x, y: tuple(rgb[(y * 4 + x) * 3 : (y * 4 + x) * 3 + 3])
    assert px(0, 0) == px(1, 1) == (255, 0, 0)
    assert px(2, 0) == px(3, 1) == (0, 255, 0)
    assert px(0, 2) == px(1, 3) == (0, 0, 255)
    assert px(2, 2) == px(3, 3) == (255, 255, 255)


def test_extract_features_real_decode_in_spark(spark):
    """End-to-end: PPM payloads go through mapInPandas and come back
    with PIXEL features (not byte histograms)."""
    payload, _ = _ppm_2x2()
    rows = [(1, "image", "ppm", payload, (2, 2, None)),
            (2, "audio", "raw", b"\x00\x01\x02\x03", (None, None, 40))]
    assets = spark.createDataFrame(rows, M.ASSET_SCHEMA)
    feats = {r.asset_id: list(r.feature) for r in M.extract_features(assets).collect()}
    assert feats[1][0] == 0.5 and feats[1][3] == pytest.approx(0.5)
    # the raw payload takes the byte-histogram fallback (sums to 1)
    assert sum(feats[2]) == pytest.approx(1.0)


class TestAudio:
    def _wav(self, rate=8000, channels=1, samples=None):
        import math
        import struct

        from etl_process_for_fraud_transactions_spark.operators.multimodal import (
            encode_wav,
        )

        if samples is None:
            # 0.1 s sine at 440 Hz, amplitude 0.5
            samples = [
                int(0.5 * 32767 * math.sin(2 * math.pi * 440 * t / rate))
                for t in range(rate // 10)
            ]
        pcm = struct.pack(f"<{len(samples)}h", *samples)
        return encode_wav(rate, channels, pcm), samples

    def test_wav_roundtrip(self):
        from etl_process_for_fraud_transactions_spark.operators.multimodal import (
            decode_wav,
        )

        payload, samples = self._wav()
        rate, channels, got = decode_wav(payload)
        assert (rate, channels) == (8000, 1)
        assert got == samples

    def test_decode_rejects_non_wav(self):
        from etl_process_for_fraud_transactions_spark.operators.multimodal import (
            decode_wav,
        )

        assert decode_wav(b"\x00" * 64) is None
        assert decode_wav(b"RIFF\x10\x00\x00\x00JUNK") is None

    def test_audio_features_end_to_end(self, spark):
        import math

        from etl_process_for_fraud_transactions_spark.operators.multimodal import (
            ASSET_SCHEMA,
            audio_features,
        )

        sine, samples = self._wav()
        silent, _ = self._wav(samples=[0] * 800)
        rows = [
            (1, "audio", "wav", sine, (None, None, None)),
            (2, "audio", "wav", silent, (None, None, None)),
            (3, "audio", "mp3", b"\xff\xfb junk", (None, None, None)),
            (4, "image", "png", b"ignored", (8, 8, None)),
        ]
        assets = spark.createDataFrame(rows, ASSET_SCHEMA)
        got = {r.asset_id: r for r in audio_features(assets).collect()}
        assert set(got) == {1, 2, 3}  # image row filtered out
        r1 = got[1]
        assert r1.sample_rate == 8000 and r1.channels == 1
        assert abs(r1.duration_s - 0.1) < 1e-9
        # python replay of rms/zcr — bit-exact float64 contract
        norm = [s / 32768.0 for s in samples]
        rms = (sum(s * s for s in norm) / len(norm)) ** 0.5
        assert abs(r1.rms - rms) < 1e-12
        assert 0.05 < r1.zero_crossing_rate < 0.25  # ~440 Hz at 8 kHz
        assert got[2].rms == 0.0 and got[2].peak == 0.0
        # undecodable -> honest nulls
        assert got[3].sample_rate is None and got[3].rms is None
        assert got[3].n_bytes > 0
