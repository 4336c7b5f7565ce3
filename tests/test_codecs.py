"""Dependency-free BMP/WAV codecs behind the multimodal decode boundary:
spec-level golden bytes, padded-stride round trips, bottom-up flip, and
RIFF chunk walking past extra chunks."""

import struct

import pytest

from frolyk_spark.functions.codecs import (
    BMP_HEADER_SIZE, bmp_stride, decode_bmp, decode_wav, encode_bmp, encode_wav,
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
