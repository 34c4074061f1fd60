"""Stdlib media codecs (functions/media.py) + multimodal stages: the PNG and
WAV kernels are REAL (round-trip exact), header sniffing covers JPEG/GIF,
and the stages run as actor pools over valid payloads."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
import pytest

from webcrawl_lowres_lang_ray.functions.media import (
    parse_image_header,
    png_decode,
    png_encode,
    resize_nearest,
    wav_decode,
    wav_encode,
)


class TestPng:
    def test_roundtrip_rgb(self):
        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, size=(21, 13, 3), dtype=np.uint8)
        np.testing.assert_array_equal(png_decode(png_encode(img)), img)

    def test_roundtrip_gray_and_rgba(self):
        rng = np.random.RandomState(4)
        g = rng.randint(0, 256, size=(7, 9), dtype=np.uint8)
        np.testing.assert_array_equal(png_decode(png_encode(g)), g)
        a = rng.randint(0, 256, size=(5, 6, 4), dtype=np.uint8)
        np.testing.assert_array_equal(png_decode(png_encode(a)), a)

    def test_decode_all_filter_types(self):
        """Hand-build IDAT streams using each scanline filter; the decoder
        must reconstruct the same pixels an encoder filtered away."""
        rng = np.random.RandomState(5)
        img = rng.randint(0, 256, size=(4, 5, 3), dtype=np.uint8).astype(np.int32)
        h, w, nch = img.shape
        stride = w * nch
        flat = img.reshape(h, stride)

        def filtered(ftype: int) -> bytes:
            out = b""
            for y in range(h):
                row = flat[y]
                up = flat[y - 1] if y > 0 else np.zeros(stride, np.int32)
                if ftype == 0:
                    enc = row
                elif ftype == 1:
                    left = np.concatenate([np.zeros(nch, np.int32), row[:-nch]])
                    enc = row - left
                elif ftype == 2:
                    enc = row - up
                elif ftype == 3:
                    left = np.concatenate([np.zeros(nch, np.int32), row[:-nch]])
                    enc = row - ((left + up) >> 1)
                else:  # paeth
                    left = np.concatenate([np.zeros(nch, np.int32), row[:-nch]])
                    upleft = np.concatenate([np.zeros(nch, np.int32), up[:-nch]])
                    pred = np.empty(stride, np.int32)
                    for i in range(stride):
                        p = left[i] + up[i] - upleft[i]
                        pa, pb, pc = abs(p - left[i]), abs(p - up[i]), abs(p - upleft[i])
                        pred[i] = left[i] if pa <= pb and pa <= pc else (up[i] if pb <= pc else upleft[i])
                    enc = row - pred
                out += bytes([ftype]) + (enc & 0xFF).astype(np.uint8).tobytes()
            return out

        def wrap(idat_raw: bytes) -> bytes:
            sig = b"\x89PNG\r\n\x1a\n"

            def chunk(tag, data):
                return (struct.pack(">I", len(data)) + tag + data
                        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            return sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(idat_raw)) + chunk(b"IEND", b"")

        for ftype in range(5):
            got = png_decode(wrap(filtered(ftype)))
            np.testing.assert_array_equal(got, img.astype(np.uint8), err_msg=f"filter {ftype}")

    def test_header_parse(self):
        img = np.zeros((11, 17, 3), dtype=np.uint8)
        hdr = parse_image_header(png_encode(img))
        assert hdr == {"format": "png", "width": 17, "height": 11, "channels": 3, "bit_depth": 8}

    def test_truncated_and_malformed_jpeg_return_none(self):
        # truncated SOF segment; SOS before SOF; zero-length segment — all
        # must return None, never raise (a crawled payload can be anything)
        assert parse_image_header(b"\xFF\xD8\xFF\xC0\x00\x11\x08\x00") is None
        assert parse_image_header(b"\xFF\xD8\xFF\xDA\x00\x04\x00\x00") is None
        assert parse_image_header(b"\xFF\xD8\xFF\xE0\x00\x00zz") is None
        assert parse_image_header(b"\xFF\xD8") is None

    def test_jpeg_and_gif_headers(self):
        # minimal JPEG marker stream: SOI, APP0, SOF0(8bit, 30x20, 3 comp)
        jpeg = (b"\xFF\xD8"
                + b"\xFF\xE0" + struct.pack(">H", 4) + b"JF"
                + b"\xFF\xC0" + struct.pack(">H", 11) + struct.pack(">BHHB", 8, 30, 20, 3)
                + b"\x00" * 6)
        assert parse_image_header(jpeg) == {
            "format": "jpeg", "width": 20, "height": 30, "channels": 3, "bit_depth": 8}
        gif = b"GIF89a" + struct.pack("<HH", 40, 25) + b"\x00" * 10
        assert parse_image_header(gif)["width"] == 40
        assert parse_image_header(b"\x00\x01notmedia") is None

    def test_resize_nearest(self):
        img = np.arange(36, dtype=np.uint8).reshape(6, 6)
        out = resize_nearest(img, 3, 2)
        assert out.shape == (3, 2)
        assert out[0, 0] == img[0, 0]


class TestWav:
    def test_roundtrip(self):
        t = np.arange(1600)
        s = (1000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
        dec, rate = wav_decode(wav_encode(s, 16000))
        assert rate == 16000
        np.testing.assert_array_equal(dec, s)


@pytest.mark.usefixtures("ray_session")
class TestStages:
    def test_decode_stage_real_kernels(self):
        import json

        import ray.data

        from webcrawl_lowres_lang_ray.stages.multimodal import DecodeStage, synth_media_batch

        media = synth_media_batch(60)
        out = (
            ray.data.from_pandas(media)
            .map_batches(DecodeStage, fn_constructor_kwargs={"fake": True},
                         batch_format="pandas", batch_size=16, concurrency=2)
            .to_pandas()
            .sort_values("media_id")
        )
        assert len(out) == 60
        feats = [json.loads(f) for f in out["features"]]
        pngs = [f for f, mt in zip(feats, out["media_type"]) if mt == "image/png"]
        wavs = [f for f, mt in zip(feats, out["media_type"]) if mt == "audio/wav"]
        assert all(8 <= f["width"] < 48 and "mean_luma" in f for f in pngs)
        assert all(f["sample_rate"] == 16000 and f["rms"] > 0 for f in wavs)

    def test_decode_stage_gates_video_when_not_fake(self):
        from webcrawl_lowres_lang_ray.stages.multimodal import DecodeStage, synth_media_batch

        stage = DecodeStage(fake=False)
        vid = synth_media_batch(3).iloc[[2]]
        with pytest.raises(NotImplementedError):
            stage(vid)

    def test_thumbnail_stage(self):
        import ray.data

        from webcrawl_lowres_lang_ray.stages.multimodal import ThumbnailStage, synth_media_batch

        media = synth_media_batch(30)
        out = (
            ray.data.from_pandas(media)
            .map_batches(ThumbnailStage, fn_constructor_kwargs={"max_side": 8},
                         batch_format="pandas", batch_size=8, concurrency=2)
            .to_pandas()
        )
        pngs = out.loc[out["thumb_w"] > 0]
        assert len(pngs) == 10  # every image/png row
        assert (pngs[["thumb_w", "thumb_h"]].max(axis=1) <= 8).all()
        arr = png_decode(pngs["thumb"].iloc[0])
        assert arr.shape[:2] == (pngs["thumb_h"].iloc[0], pngs["thumb_w"].iloc[0])


class TestAudioFeatures:
    def test_known_signals(self):
        """Sine wave: near-zero silence, ZCR = 2f/rate; silent clip: full
        silence; clipped square wave: clip_ratio 1."""
        import json

        import pandas as pd

        from webcrawl_lowres_lang_ray.functions.media import wav_encode
        from webcrawl_lowres_lang_ray.stages.multimodal import AudioFeatureStage

        rate = 16000
        t = np.arange(rate)  # 1 second
        sine = (20000 * np.sin(2 * np.pi * 400 * t / rate)).astype(np.int16)
        silent = np.zeros(rate, dtype=np.int16)
        square = np.where(t % 40 < 20, 32767, -32767).astype(np.int16)
        b = pd.DataFrame(
            {
                "media_id": np.array([0, 1, 2], dtype=np.int64),
                "media_type": ["audio/wav"] * 3,
                "payload": [wav_encode(s, rate) for s in (sine, silent, square)],
                "meta": [json.dumps({})] * 3,
            }
        )
        out = AudioFeatureStage()(b).set_index("media_id")
        assert out.loc[0, "silence_ratio"] == 0.0
        # 400 Hz sine: 800 sign changes/sec -> ZCR ~= 800/16000 = 0.05
        assert abs(out.loc[0, "zero_cross_rate"] - 0.05) < 0.005
        assert out.loc[0, "clip_ratio"] == 0.0
        assert out.loc[1, "silence_ratio"] == 1.0 and out.loc[1, "rms"] == 0.0
        assert out.loc[2, "clip_ratio"] == 1.0
        assert out.loc[0, "duration_ms"] == 1000

    def test_pipeline_runs_and_is_deterministic(self):
        from webcrawl_lowres_lang_ray.pipelines.crawl_queries import (
            q_multimodal_audio_features,
        )

        a = q_multimodal_audio_features("/root/testdata/sf0.001")
        b = q_multimodal_audio_features("/root/testdata/sf0.001")
        pd.testing.assert_frame_equal(a, b)
        # synth table: every third row is audio/wav
        assert len(a) > 50
        assert (a["rms"] > 0).all()


class TestImageStats:
    def test_known_images(self):
        import json

        import pandas as pd

        from webcrawl_lowres_lang_ray.functions.media import png_encode
        from webcrawl_lowres_lang_ray.stages.multimodal import ImageStatStage

        black = np.zeros((8, 10, 3), dtype=np.uint8)
        white = np.full((8, 10, 3), 255, dtype=np.uint8)
        rng = np.random.RandomState(2)
        noise = rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
        b = pd.DataFrame(
            {
                "media_id": np.array([0, 1, 2], dtype=np.int64),
                "media_type": ["image/png"] * 3,
                "payload": [png_encode(x) for x in (black, white, noise)],
                "meta": [json.dumps({})] * 3,
            }
        )
        out = ImageStatStage()(b).set_index("media_id")
        assert out.loc[0, "mean_lum"] == 0.0 and out.loc[0, "entropy_bits"] == 0.0
        assert abs(out.loc[1, "mean_lum"] - 254.999) < 1.0  # 255*(.299+.587+.114)
        assert out.loc[1, "std_lum"] == 0.0 and out.loc[1, "entropy_bits"] == 0.0
        assert out.loc[2, "entropy_bits"] > 6.0  # noise is near max entropy
        assert out.loc[0, "w"] == 10 and out.loc[0, "h"] == 8

    def test_pipeline_runs_and_is_deterministic(self):
        from webcrawl_lowres_lang_ray.pipelines.crawl_queries import (
            q_multimodal_image_stats,
        )

        a = q_multimodal_image_stats("/root/testdata/sf0.001")
        b = q_multimodal_image_stats("/root/testdata/sf0.001")
        pd.testing.assert_frame_equal(a, b)
        assert len(a) > 50


class TestPhashDedup:
    def test_dhash_invariants(self):
        import numpy as np

        from webcrawl_lowres_lang_ray.functions.media import resize_nearest
        from webcrawl_lowres_lang_ray.stages.multimodal import dhash64

        r = np.arange(24)[:, None] // 2
        c = np.arange(32)[None, :] // 3
        img = (255 * ((r + c) % 2)).astype(np.uint8)[..., None].repeat(3, 2)
        h0 = dhash64(img)
        assert dhash64(img) == h0  # deterministic
        up = resize_nearest(img, 48, 64)
        assert bin(h0 ^ dhash64(up)).count("1") <= 7  # resize-robust
        inv = 255 - img
        assert bin(h0 ^ dhash64(inv)).count("1") >= 50  # inversion flips

    def test_planted_pairs_found_no_false_positives(self):
        import __ray_entry__ as e

        out = e.queries()["multimodal_phash_dedup"]("/root/testdata/sf0.001")
        got = set(zip(out["id_a"], out["id_b"]))
        assert got == {(2000 + j, 3000 + j) for j in range(5)}
        assert (out["hamming"] <= 7).all()

    def test_deterministic(self):
        import __ray_entry__ as e

        a = e.queries()["multimodal_phash_dedup"]("/root/testdata/sf0.001")
        b = e.queries()["multimodal_phash_dedup"]("/root/testdata/sf0.001")
        assert a.equals(b)


class TestAudioDedup:
    def test_fingerprint_gain_invariant(self):
        import numpy as np

        from webcrawl_lowres_lang_ray.stages.multimodal import audio_fp64

        t = np.arange(4000)
        x = (3000 * np.sin(2 * np.pi * 440 * t / 16000)
             * np.linspace(1, 0.2, 4000)).astype(np.int16)
        a = audio_fp64(x)
        b = audio_fp64((x * 0.3).astype(np.int16))
        assert bin(a ^ b).count("1") <= 4  # re-volume is near-identical
        rev = audio_fp64(x[::-1].copy())
        assert bin(a ^ rev).count("1") >= 20  # reversal flips the envelope

    def test_planted_scaled_noisy_copies_found(self):
        import __ray_entry__ as e

        out = e.queries()["multimodal_audio_dedup"]("/root/testdata/sf0.001")
        planted = out[(out["id_b"] >= 5000) & (out["id_b"] - 5000 == out["id_a"])]
        assert sorted(planted["id_a"]) == [1, 4, 7, 10, 13]
        assert (planted["hamming"] <= 7).all()

    def test_deterministic(self):
        import __ray_entry__ as e

        a = e.queries()["multimodal_audio_dedup"]("/root/testdata/sf0.001")
        b = e.queries()["multimodal_audio_dedup"]("/root/testdata/sf0.001")
        assert a.equals(b)


class TestMediaRowsForSf:
    def test_scales_with_sf_with_floor_and_cap(self):
        from webcrawl_lowres_lang_ray.pipelines.crawl_queries import (
            media_rows_for_sf,
        )

        # the planted-pair test invariants live at the 200-row floor
        assert media_rows_for_sf("/root/testdata/sf0.001") == 200
        assert media_rows_for_sf("/root/testdata/sf0.01") == 200
        assert media_rows_for_sf("/root/testdata/sf0.1") == 2000
        assert media_rows_for_sf("/any/sf1") == 20000
        assert media_rows_for_sf("/any/sf10") == 20000  # capped
        assert media_rows_for_sf("/weird/path") == 200  # non-sf dir -> floor
