"""Dependency-free media codecs for the multimodal decode boundary.

Real, spec-conforming encoders/decoders for the container formats that
need no external library — uncompressed 24-bit BMP (BITMAPFILEHEADER +
BITMAPINFOHEADER, bottom-up rows, 4-byte row stride), PCM16 WAV (RIFF
container, fmt + data chunks), and FVID, a documented trivial video
container (fixed header + length-prefixed BMP frames) in the spirit of
uncompressed AVI/MJPEG: each frame is a complete, independently decodable
still image. BMP/WAV are per the public specifications (Windows BMP file
format; Microsoft/IBM RIFF WAVE). These back ``_decode_media`` for all
three modalities so the multimodal decode path runs REAL byte-level
parsing (header validation, stride arithmetic, bottom-up row flip, chunk
walking, per-frame container traversal) instead of a stub; only
*compressed* video codecs (H.264/VP9/...) keep the pyav stub — those
genuinely need the library.

Everything here is pure Python over ``bytes`` — it runs executor-side
inside Arrow batches (mapInPandas), never on the driver.
"""

from __future__ import annotations

import struct

BMP_HEADER_SIZE = 14 + 40  # BITMAPFILEHEADER + BITMAPINFOHEADER


def bmp_stride(width: int) -> int:
    """Bytes per stored BMP row: 3 bytes/pixel padded up to 4 bytes."""
    return (3 * width + 3) // 4 * 4


def encode_bmp(content: bytes, width: int, height: int) -> bytes:
    """Encode ``content`` (logical row-major top-to-bottom BGR pixel bytes,
    len == 3*width*height) as an uncompressed 24-bit BMP. Rows are stored
    BOTTOM-UP (positive biHeight) with 4-byte stride padding, per spec."""
    if len(content) != 3 * width * height:
        raise ValueError(f"content {len(content)} != 3*{width}*{height}")
    stride = bmp_stride(width)
    pad = b"\x00" * (stride - 3 * width)
    rows = []
    for r in range(height - 1, -1, -1):  # bottom-up storage
        rows.append(content[3 * width * r : 3 * width * (r + 1)] + pad)
    pixel_data = b"".join(rows)
    file_size = BMP_HEADER_SIZE + len(pixel_data)
    file_header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, BMP_HEADER_SIZE)
    info_header = struct.pack(
        "<IiiHHIIiiII",
        40,  # biSize
        width,
        height,  # positive = bottom-up
        1,  # biPlanes
        24,  # biBitCount
        0,  # BI_RGB (uncompressed)
        len(pixel_data),
        2835,  # 72 DPI in px/metre
        2835,
        0,
        0,
    )
    return file_header + info_header + pixel_data


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Parse an uncompressed 24-bit BMP; return (width, height, content)
    where content is the logical row-major top-to-bottom BGR byte stream
    (the bottom-up storage is flipped back, stride padding stripped).
    Validates magic, bpp, and compression — fails loudly on anything this
    decoder does not actually support."""
    if len(payload) < BMP_HEADER_SIZE:
        # validate BEFORE unpacking so truncation surfaces as the
        # documented ValueError, never a bare struct.error
        raise ValueError(f"truncated BMP header: {len(payload)} bytes")
    magic, _file_size, _r1, _r2, data_off = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError(f"not a BMP: magic {magic!r}")
    (bi_size, width, height, _planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bi_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant: biSize={bi_size} bpp={bpp} comp={compression}"
        )
    bottom_up = height > 0
    height = abs(height)
    stride = bmp_stride(width)
    rows = []
    for k in range(height):
        start = data_off + k * stride
        rows.append(payload[start : start + 3 * width])
    if bottom_up:
        rows.reverse()
    content = b"".join(rows)
    if len(content) != 3 * width * height:
        raise ValueError("truncated BMP pixel data")
    return width, height, content


def encode_wav(samples: list[int], sample_rate: int) -> bytes:
    """Encode signed 16-bit mono PCM samples as a RIFF WAVE file."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        1,  # mono
        sample_rate,
        sample_rate * 2,  # byte rate
        2,  # block align
        16,  # bits per sample
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


FVID_MAGIC = b"FVID"
FVID_HEADER_SIZE = 4 + 2 + 4 * 3 + 4  # magic, version, w/h/fps, n_frames


def encode_fvid(frames: list[bytes], width: int, height: int, fps: int) -> bytes:
    """Encode ``frames`` (each a logical row-major BGR content buffer of
    len 3*width*height) as an FVID container: a fixed little-endian header
    (magic ``FVID``, u16 version=1, u32 width/height/fps, u32 frame count)
    followed by one ``u32 length`` + complete BMP blob per frame."""
    header = FVID_MAGIC + struct.pack("<HIIII", 1, width, height, fps, len(frames))
    parts = [header]
    for content in frames:
        blob = encode_bmp(content, width, height)
        parts.append(struct.pack("<I", len(blob)))
        parts.append(blob)
    return b"".join(parts)


def decode_fvid(payload: bytes) -> tuple[int, int, int, list[bytes]]:
    """Parse an FVID container; return (width, height, fps, frame contents)
    with each frame decoded through the real BMP parser (so stride/origin
    handling is exercised per frame). Validates magic, version, per-frame
    dimension agreement with the container header, and exact trailing
    length — fails loudly on truncation or foreign payloads."""
    if payload[:4] != FVID_MAGIC:
        raise ValueError(f"not an FVID container: magic {payload[:4]!r}")
    version, width, height, fps, n_frames = struct.unpack_from("<HIIII", payload, 4)
    if version != 1:
        raise ValueError(f"unsupported FVID version {version}")
    pos, frames = FVID_HEADER_SIZE, []
    for k in range(n_frames):
        if pos + 4 > len(payload):
            raise ValueError(f"truncated FVID: frame {k} length missing")
        (blen,) = struct.unpack_from("<I", payload, pos)
        blob = payload[pos + 4 : pos + 4 + blen]
        if len(blob) != blen:
            raise ValueError(f"truncated FVID: frame {k} body short")
        fw, fh, content = decode_bmp(blob)
        if (fw, fh) != (width, height):
            raise ValueError(
                f"FVID frame {k} dims {fw}x{fh} != container {width}x{height}"
            )
        frames.append(content)
        pos += 4 + blen
    if pos != len(payload):
        raise ValueError(f"FVID trailing garbage: {len(payload) - pos} bytes")
    return width, height, fps, frames


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """Parse a PCM16 mono RIFF WAVE by WALKING CHUNKS (not fixed offsets —
    real WAVs carry LIST/fact chunks before data); return
    (sample_rate, samples). Fails loudly on non-PCM16-mono variants."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF WAVE")
    pos, rate, channels, bps, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            # a declared length past the payload end would otherwise
            # shorten silently via slicing and surface later as a
            # struct.error (or as silently-missing samples)
            raise ValueError(
                f"truncated WAV chunk {cid!r}: {len(body)} of {clen} bytes"
            )
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError(f"short WAV fmt chunk: {len(body)} bytes")
            fmt_tag, channels, rate, _brate, _align, bps = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if fmt_tag != 1:
                raise ValueError(f"unsupported WAV format tag {fmt_tag}")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if channels != 1 or bps != 16:
        raise ValueError(f"unsupported WAV layout: {channels}ch {bps}bit")
    if len(data) % 2:
        raise ValueError(f"odd-length PCM16 data chunk: {len(data)} bytes")
    return rate, list(struct.unpack(f"<{len(data) // 2}h", data))
