"""Real stdlib media decode (round-9): the decoder must parse honest
containers — fields from the bytes, not from metadata beside them —
and fail loudly on formats that genuinely need absent libraries."""

from __future__ import annotations

import struct

import pytest

from tabsketchfm_spark.operators import multimodal as mm


def test_wav_decode_known_samples():
    # hand-built WAV, NOT via _wav_bytes: 3 known int16 samples at 8 kHz
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<3h", -32768, 0, 32767))
    d = mm._decode_media("audio/wav", buf.getvalue())
    assert d["n_frames"] == 3
    assert d["sample_rate"] == 8000
    assert d["n_channels"] == 1
    assert d["duration_us"] == 3 * 1_000_000 // 8000
    assert list(d["vals"]) == [-32768, 0, 32767]


def test_bmp_decode_skips_row_padding():
    # width 2 -> row data 6 bytes + 2 padding bytes; decoder must NOT
    # drag the 0xAB pad bytes into the pixel stream
    w, h = 2, 2
    rowsize = 8
    hdr = struct.pack("<2sIHHI", b"BM", 54 + rowsize * h, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, rowsize * h, 2835, 2835, 0, 0
    )
    # bottom file row = image row 1 (pixels 5..10), top file row = row 0
    rows = bytes([5, 6, 7, 8, 9, 10]) + b"\xab\xab" + bytes(
        [1, 2, 3, 4, 5, 6]
    ) + b"\xab\xab"
    d = mm._decode_media("image/bmp", hdr + info + rows)
    assert (d["width"], d["height"], d["n_channels"]) == (2, 2, 3)
    assert d["n_frames"] == 4
    assert sorted(d["vals"]) == sorted([5, 6, 7, 8, 9, 10, 1, 2, 3, 4, 5, 6])
    assert 0xAB not in d["vals"]
    assert min(d["vals"]) == 1  # a padding-swallowing decoder would see 0xab/0


def test_env_blocked_formats_raise():
    with pytest.raises(NotImplementedError):
        mm._decode_media("image/jpeg", b"\xff\xd8\xff")
    with pytest.raises(ValueError):
        mm._decode_media("image/bmp", b"XX not a bmp")
    with pytest.raises(ValueError):
        mm._decode_media("image/png", b"\x89PNG")  # short/garbled sig


def test_ppm_decode_matches_bmp_pixels():
    # PPM carries the SAME md5 pixel chain as BMP with no row padding
    # and top-down order: channel-invariant stats must agree, and the
    # PPM raster equals the generation stream byte-for-byte
    for n_chars in (0, 7, 11, 29):
        text = "x" * max(n_chars, 1)
        p = mm._decode_media(
            "image/x-portable-pixmap", mm._ppm_bytes(text, n_chars)
        )
        b = mm._decode_media("image/bmp", mm._bmp_bytes(text, n_chars))
        assert (p["width"], p["height"], p["n_frames"]) == (
            b["width"],
            b["height"],
            b["n_frames"],
        )
        assert sorted(p["vals"]) == sorted(b["vals"])
        for ch in range(3):  # channel alignment too, not just the bag
            assert sorted(p["vals"][ch::3]) == sorted(b["vals"][ch::3])


def test_ppm_header_comments_and_truncation():
    raw = mm._ppm_bytes("some text", 9)
    # inject a comment line into the header — the parser must skip it
    commented = b"P6\n# a comment\n" + raw[3:]
    d = mm._decode_media("image/x-portable-pixmap", commented)
    assert d["n_frames"] == ((9 % 5) + 2) * ((9 % 3) + 2)
    with pytest.raises(ValueError, match="truncated"):
        mm._decode_media("image/x-portable-pixmap", raw[:-3])


def test_stereo_wav_decode():
    # the decoder must take channel count from the CONTAINER: 2-channel
    # frames interleave L/R int16 samples
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<6h", 1, -1, 2, -2, 3, -3))
    d = mm._decode_media("audio/wav", buf.getvalue())
    assert d["n_channels"] == 2
    assert d["n_frames"] == 3
    assert list(d["vals"]) == [1, -1, 2, -2, 3, -3]
    assert d["duration_us"] == 3 * 1_000_000 // 8000


def test_truncated_bmp_raises():
    # header declares more pixel data than the file carries: loud, not
    # silently-short stats (matches the WAV path's struct.unpack)
    full = mm._bmp_bytes("some text", 9)
    with pytest.raises(ValueError, match="truncated"):
        mm._decode_media("image/bmp", full[:-4])


def test_synth_roundtrip_matches_formulas():
    # generation formulas and parsed-container fields must agree for
    # every (n_chars % lcm) residue incl. the nonzero-padding widths
    for n_chars in range(0, 61):
        text = "t" * max(n_chars, 1)
        wav = mm._wav_bytes(text, n_chars)
        d = mm._decode_media("audio/wav", wav)
        ns = ((n_chars % 4) + 2) * 8
        assert len(wav) == 44 + ns * 2
        assert d["n_frames"] == ns and len(d["vals"]) == ns
        bmp = mm._bmp_bytes(text, n_chars)
        b = mm._decode_media("image/bmp", bmp)
        w, h = (n_chars % 5) + 2, (n_chars % 3) + 2
        assert (b["width"], b["height"]) == (w, h)
        assert len(bmp) == 54 + ((w * 3 + 3) // 4 * 4) * h
        assert len(b["vals"]) == w * h * 3


def test_audio_energy_nondivisor_frame_matches_oracle(spark, sf001):
    # frame=5 does not divide any synth sample count {16,24,32,40}:
    # the operator drops the partial trailing window and the oracle
    # must mirror that truncation (round-9 review finding)
    from tabsketchfm_spark.sources.tables import load_table
    from tests.oracle_util import assert_match, run_oracle

    media = mm.synth_real_media(load_table(spark, sf001, "documents"))
    got = mm.audio_energy_frames(media, frame=5)
    want = run_oracle(mm.audio_energy_frames_oracle_sql("documents", frame=5), sf001)
    assert_match(got, want, "audio_energy frame=5")


def test_audio_silence_flag_sees_both_values(spark, sf001):
    # the default threshold must split the frames — a constant flag
    # would let an inverted comparison pass the parity gate
    from tabsketchfm_spark.sources.tables import load_table

    media = mm.synth_real_media(load_table(spark, sf001, "documents"))
    flags = {
        r["is_silence"]
        for r in mm.audio_energy_frames(media).select("is_silence").distinct().collect()
    }
    assert flags == {True, False}


def test_png_decode_matches_bmp_pixels():
    # PNG shares the md5 pixel chain with BMP; the decode must recover
    # it EXACTLY through real DEFLATE + filter reconstruction. n_chars
    # 5..9 puts (r + n_chars) % 5 through every residue, so all five
    # filter types (None/Sub/Up/Average/Paeth) are exercised
    for n_chars in (0, 5, 6, 7, 8, 9, 29):
        text = "x" * max(n_chars, 1)
        p = mm._decode_media("image/png", mm._png_bytes(text, n_chars))
        b = mm._decode_media("image/bmp", mm._bmp_bytes(text, n_chars))
        assert (p["width"], p["height"], p["n_frames"]) == (
            b["width"], b["height"], b["n_frames"],
        )
        # BMP decode emits file-order rows (bottom-up); reorder to the
        # top-down stream for an EXACT byte-for-byte comparison
        stride = b["width"] * 3
        rows = [
            b["vals"][r * stride : (r + 1) * stride]
            for r in range(b["height"] - 1, -1, -1)
        ]
        b_topdown = [v for row in rows for v in row]
        assert list(p["vals"]) == b_topdown


def test_png_decode_recovers_generation_chain():
    # independent reference: the decoded pixel stream must equal the
    # raw md5 chain itself (no BMP in the loop) — the same equality the
    # SQL oracle asserts per-document via sum/min/max
    import hashlib

    raw = mm._png_bytes("tall-doc", 13)  # w=(13%5)+2=5, h=(13%3)+2=3
    d = mm._decode_media("image/png", raw)
    assert (d["width"], d["height"]) == (5, 3)
    ref = b"".join(
        hashlib.md5(f"tall-doc#{b}".encode()).digest()
        for b in range((5 * 3 * 3 + 15) // 16)
    )[: 5 * 3 * 3]
    assert bytes(d["vals"]) == ref


def test_png_crc_and_truncation_loud():
    raw = bytearray(mm._png_bytes("crc text", 9))
    # flip one byte inside the IDAT payload: CRC must catch it
    idat_at = raw.find(b"IDAT")
    raw[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        mm._decode_media("image/png", bytes(raw))
    full = mm._png_bytes("crc text", 9)
    with pytest.raises(ValueError, match="truncated|missing"):
        mm._decode_media("image/png", full[:-6])
    # unsupported profile: 16-bit depth IHDR
    import struct as _s
    import zlib as _z

    ihdr = _s.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = (
        mm._PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", _z.compress(b"\x00" * 26))
        + mm._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="truecolor"):
        mm._decode_media("image/png", bad)


def test_png_stats_match_oracle(spark, sf001):
    from tabsketchfm_spark.sources.tables import load_table
    from tests.oracle_util import assert_match, run_oracle

    got = mm.media_decode_png_stats(load_table(spark, sf001, "documents"))
    want = run_oracle(mm.media_decode_png_stats_oracle_sql("documents"), sf001)
    assert_match(got, want, "media_decode_png_stats")


def test_media_decode_stats_spark(spark, sf001):
    from tabsketchfm_spark.sources.tables import load_table

    docs = load_table(spark, sf001, "documents")
    out = mm.media_decode_stats(docs).collect()
    n_src = docs.where("text IS NOT NULL AND n_chars IS NOT NULL").count()
    assert len(out) == n_src
    for r in out:
        if r["media_type"] == "audio/wav":
            assert r["sample_rate"] == mm.WAV_RATE
            assert r["duration_us"] == r["n_frames"] * 125
            assert r["width"] is None
        else:
            assert r["media_type"] == "image/bmp"
            assert r["n_channels"] == 3
            assert r["n_vals"] == r["width"] * r["height"] * 3
            assert 0 <= r["val_min"] <= r["val_max"] <= 255
