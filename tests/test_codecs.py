"""Dependency-free BMP/WAV/FVID codecs behind the multimodal decode
boundary: spec-level golden bytes, padded-stride round trips, bottom-up
flip, RIFF chunk walking past extra chunks, and length-prefixed video
frame traversal."""

import struct

import pytest

from frolyk_spark.functions.codecs import (
    BMP_HEADER_SIZE, FVID_HEADER_SIZE, FVID_MAGIC, bmp_stride, decode_bmp,
    decode_fvid, decode_wav, encode_bmp, encode_fvid, encode_wav,
)


def test_bmp_golden_header_fields():
    # 2x2 image: stride = (6+3)//4*4 = 8, 2 bytes padding per row
    content = bytes(range(12))
    payload = encode_bmp(content, 2, 2)
    assert payload[:2] == b"BM"
    assert struct.unpack_from("<I", payload, 2)[0] == len(payload)
    assert struct.unpack_from("<I", payload, 10)[0] == BMP_HEADER_SIZE
    w, h, bpp, comp = struct.unpack_from("<ii", payload, 18) + struct.unpack_from(
        "<HI", payload, 28
    )
    assert (w, h, bpp, comp) == (2, 2, 24, 0)
    # bottom-up: first stored row is the LOGICAL BOTTOM row (bytes 6..11)
    assert payload[BMP_HEADER_SIZE : BMP_HEADER_SIZE + 6] == content[6:12]
    assert payload[BMP_HEADER_SIZE + 6 : BMP_HEADER_SIZE + 8] == b"\x00\x00"


@pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (3, 2), (5, 4), (4, 5), (32, 8)])
def test_bmp_roundtrip_all_stride_classes(w, h):
    """Widths 1/2/3/5 exercise every stride-padding residue (3w % 4)."""
    content = bytes((7 * i + 13) % 256 for i in range(3 * w * h))
    dw, dh, got = decode_bmp(encode_bmp(content, w, h))
    assert (dw, dh, got) == (w, h, content)
    assert bmp_stride(w) % 4 == 0 and bmp_stride(w) >= 3 * w


def test_bmp_rejects_unsupported_variants():
    payload = bytearray(encode_bmp(bytes(12), 2, 2))
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"XX" + bytes(payload[2:]))
    bad_bpp = bytearray(payload)
    struct.pack_into("<H", bad_bpp, 28, 8)
    with pytest.raises(ValueError, match="unsupported"):
        decode_bmp(bytes(bad_bpp))


def test_wav_golden_and_roundtrip():
    samples = [0, 1, -1, 32767, -32768, 12345]
    payload = encode_wav(samples, 16000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    rate, got = decode_wav(payload)
    assert rate == 16000 and got == samples


def test_wav_chunk_walk_skips_extra_chunks():
    """Real WAVs carry LIST/fact chunks before data — the decoder must
    walk chunks, not assume fixed offsets (odd-length chunk exercises
    word alignment)."""
    samples = [5, -7, 300]
    payload = encode_wav(samples, 8000)
    fmt_chunk = payload[12 : 12 + 8 + 16]
    data_chunk = payload[12 + 8 + 16 :]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded odd chunk
    body = b"WAVE" + fmt_chunk + extra + data_chunk
    rebuilt = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, got = decode_wav(rebuilt)
    assert rate == 8000 and got == samples


def test_wav_rejects_non_pcm16_mono():
    payload = bytearray(encode_wav([1, 2], 8000))
    struct.pack_into("<H", payload, 22, 2)  # 2 channels
    with pytest.raises(ValueError, match="layout"):
        decode_wav(bytes(payload))


def _frames(w, h, n):
    return [
        bytes((11 * f + 5 * i + 3) % 256 for i in range(3 * w * h)) for f in range(n)
    ]


@pytest.mark.parametrize("w,h,n", [(1, 1, 1), (3, 2, 4), (5, 4, 2), (8, 5, 6)])
def test_fvid_roundtrip(w, h, n):
    """Padded-stride widths and multi-frame walks round-trip exactly; the
    header carries the declared geometry and fps."""
    frames = _frames(w, h, n)
    payload = encode_fvid(frames, w, h, 24)
    assert payload[:4] == FVID_MAGIC
    assert struct.unpack_from("<HIIII", payload, 4) == (1, w, h, 24, n)
    dw, dh, fps, got = decode_fvid(payload)
    assert (dw, dh, fps) == (w, h, 24)
    assert got == frames


def test_fvid_rejects_bad_payloads():
    payload = encode_fvid(_frames(3, 2, 2), 3, 2, 10)
    with pytest.raises(ValueError, match="magic"):
        decode_fvid(b"AVI " + payload[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_fvid(payload[:-3])
    with pytest.raises(ValueError, match="trailing"):
        decode_fvid(payload + b"\x00")
    # frame dims disagreeing with the container header must fail: splice a
    # 2x3 BMP where a 3x2 frame is declared (same byte budget, lying header)
    other = encode_bmp(_frames(2, 3, 1)[0], 2, 3)
    spliced = payload[:FVID_HEADER_SIZE] + struct.pack("<I", len(other)) + other
    one_frame = bytearray(spliced)
    struct.pack_into("<I", one_frame, 18, 1)  # n_frames = 1
    with pytest.raises(ValueError, match="dims"):
        decode_fvid(bytes(one_frame))


def test_truncation_always_raises_valueerror():
    """ADVICE r7: truncated payloads must surface as the documented
    ValueError, never a bare struct.error — header-short BMPs, WAV chunks
    whose declared length runs past the payload, and odd-length PCM16
    data chunks."""
    from frolyk_spark.functions.codecs import decode_bmp, decode_wav, encode_wav

    bmp = encode_bmp(_frames(3, 2, 1)[0], 3, 2)
    with pytest.raises(ValueError, match="truncated BMP header"):
        decode_bmp(bmp[:30])

    wav = encode_wav([1, -2, 3, -4], 8000)
    # chop mid-data: the data chunk's declared length now exceeds payload
    with pytest.raises(ValueError, match="truncated WAV chunk"):
        decode_wav(wav[:-3])
    # declared data length made odd (PCM16 needs 2 bytes/sample): patch the
    # data chunk length down by 1 and drop the final byte so the chunk is
    # intact but odd
    idx = wav.index(b"data")
    (dlen,) = struct.unpack_from("<I", wav, idx + 4)
    patched = bytearray(wav[:-1])
    struct.pack_into("<I", patched, idx + 4, dlen - 1)
    with pytest.raises(ValueError, match="odd-length PCM16"):
        decode_wav(bytes(patched))
    # fmt chunk shorter than the 16 PCM bytes
    fidx = wav.index(b"fmt ")
    short = bytearray(wav)
    struct.pack_into("<I", short, fidx + 4, 8)
    with pytest.raises(ValueError):
        decode_wav(bytes(short))


def test_binary_asset_staging_reuse_and_coverage(spark, sf_dir):
    """E17: the staged asset dir holds exactly one .bmp per image-modality
    doc, a second call reuses it (the _SUCCESS contract — mtimes
    unchanged), and the binaryFile read covers every staged file."""
    import os

    from frolyk_spark.operators.multimodal import (
        media_binary_ingest, stage_binary_assets,
    )
    from frolyk_spark.sources.catalog import load_table

    d = stage_binary_assets(spark, sf_dir)
    files = sorted(f for f in os.listdir(d) if f.endswith(".bmp"))
    n_imgs = (
        load_table(spark, sf_dir, "documents")
        .where("doc_id % 2 = 0").count()
    )
    assert len(files) == n_imgs
    mtimes = {f: os.path.getmtime(os.path.join(d, f)) for f in files}
    assert stage_binary_assets(spark, sf_dir) == d
    assert {f: os.path.getmtime(os.path.join(d, f)) for f in files} == mtimes
    assert media_binary_ingest(spark, sf_dir).count() == n_imgs
