"""Real pure-python media codecs for the multimodal pipeline.

The container has no native media libraries (PIL/librosa/ffmpeg), but two
honest formats need none: WAV is a RIFF header over raw PCM, and PNG is
zlib (stdlib) over per-row filtered scanlines. Both decoders here parse the
actual bytes — header fields are read little/big-endian from the blob and
pixels/samples are fully reconstructed — so ``extract_features`` over these
mimes reports REAL decoded properties, checkable against an independent
computation (the p11 gate derives the expected values in DuckDB from the
source bytes).

Encoders are provided for test/data-synthesis symmetry: ``encode_wav`` and
``encode_png`` produce spec-conformant files that external tools can read.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "decode_wav",
    "decode_png_pixels",
    "encode_wav",
    "decode_png",
    "encode_png",
]


# ---------------------------------------------------------------- WAV ----


def encode_wav(
    pcm: bytes, sample_rate: int = 8000, n_channels: int = 1, bits: int = 8
) -> bytes:
    """Minimal canonical RIFF/WAVE: 'fmt ' (PCM) + 'data'."""
    block_align = n_channels * bits // 8
    byte_rate = sample_rate * block_align
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(pcm),
        b"WAVE",
        b"fmt ",
        16,
        1,  # PCM
        n_channels,
        sample_rate,
        byte_rate,
        block_align,
        bits,
        b"data",
        len(pcm),
    )
    return hdr + pcm


def decode_wav(raw: bytes) -> dict:
    """Parse RIFF/WAVE chunks and decode the PCM payload.

    Walks the chunk list (not fixed offsets — WAV files may carry LIST/fact
    chunks before data), reads the fmt fields, and computes sample-level
    stats from the decoded waveform: ``n_frames`` (samples per channel),
    ``duration_ms`` (integer floor), ``peak`` (max |amplitude|, with 8-bit
    unsigned PCM centered at 128 per the spec), and ``rms_e2`` (RMS ×100,
    floored — integer-exact cross-engine).
    """
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(raw):
        cid, sz = raw[pos : pos + 4], struct.unpack("<I", raw[pos + 4 : pos + 8])[0]
        body = raw[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _byte_rate, block_align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"unsupported (non-PCM) audio format {audio_format}")
    if bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    elif bits == 16:
        samples = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2").astype(np.int32)
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    n_frames = len(samples) // max(n_channels, 1)
    peak = int(np.abs(samples).max()) if len(samples) else 0
    # sum of squares accumulated as exact int64, ONE float division + sqrt:
    # both sides of a cross-engine check see identical doubles (floor-scale
    # discipline — see bench float contract)
    rms_e2 = (
        int(np.floor(np.sqrt(int((samples.astype(np.int64) ** 2).sum()) / len(samples)) * 100))
        if len(samples)
        else 0
    )
    return {
        "n_frames": n_frames,
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bits": bits,
        "duration_ms": n_frames * 1000 // sample_rate if sample_rate else 0,
        "peak": peak,
        "rms_e2": rms_e2,
    }


# ---------------------------------------------------------------- PNG ----

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def encode_png(pixels: "np.ndarray") -> bytes:
    """Encode an (H, W) gray or (H, W, 3|4) RGB(A) uint8 array as a
    non-interlaced 8-bit PNG (filter 0 rows, one IDAT)."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        color, h, w = 0, *arr.shape
        arr = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] in (3, 4):
        color = 2 if arr.shape[2] == 3 else 6
        h, w = arr.shape[:2]
    else:
        raise ValueError(f"unsupported pixel shape {arr.shape}")

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + cid
            + body
            + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    scan = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )


def _unfilter(kind: int, cur: "np.ndarray", prev: "np.ndarray", bpp: int) -> "np.ndarray":
    """Reverse one PNG scanline filter (spec §9): cur is the filtered row,
    prev the RECONSTRUCTED previous row. Sub/Average/Paeth have an
    intra-row data dependency, so they run as a per-pixel loop; rows are
    short (W·bpp) and PNG decode is the declared slow path."""
    out = cur.astype(np.int32)
    if kind == 0:  # None
        return cur
    if kind == 2:  # Up
        return ((out + prev) & 0xFF).astype(np.uint8)
    res = np.zeros_like(out)
    for i in range(len(out)):
        a = res[i - bpp] if i >= bpp else 0  # left (reconstructed)
        b = int(prev[i])  # up
        c = int(prev[i - bpp]) if i >= bpp else 0  # up-left
        if kind == 1:  # Sub
            pred = a
        elif kind == 3:  # Average
            pred = (a + b) // 2
        elif kind == 4:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        else:
            raise ValueError(f"unknown PNG filter {kind}")
        res[i] = (out[i] + pred) & 0xFF
    return res.astype(np.uint8)


def decode_png_pixels(raw: bytes) -> "tuple[dict, np.ndarray]":
    """Parse PNG chunks, inflate IDAT, reverse the scanline filters, and
    return ``(meta, pixels)`` where pixels is the reconstructed
    ``(H, W, channels)`` uint8 array and meta carries
    width/height/n_channels/color_type. One full decode — callers needing
    both stats AND pixels (resize) pay the per-pixel unfilter loop once.

    Supports the common web subset: 8-bit depth, non-interlaced,
    gray/RGB/RGBA/gray+alpha/palette-index (palette pixels are the raw
    INDICES — see meta['color_type'] == 3). Raises on anything else —
    honest failure, not a fake answer.
    """
    if raw[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos, idat, meta = len(_PNG_SIG), b"", None
    while pos + 8 <= len(raw):
        (sz,) = struct.unpack(">I", raw[pos : pos + 4])
        cid = raw[pos + 4 : pos + 8]
        body = raw[pos + 8 : pos + 8 + sz]
        if cid == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            meta = (w, h, depth, color, interlace)
        elif cid == b"IDAT":
            idat += body
        elif cid == b"IEND":
            break
        pos += 12 + sz  # len + cid + crc
    if meta is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, interlace = meta
    if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={color}, interlace={interlace})"
        )
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    data = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    if len(data) != h * (stride + 1):
        raise ValueError("IDAT size does not match dimensions")
    rows = data.reshape(h, stride + 1)
    prev = np.zeros(stride, dtype=np.uint8)
    recon = np.empty((h, stride), dtype=np.uint8)
    for y in range(h):
        prev = _unfilter(int(rows[y, 0]), rows[y, 1:], prev, ch)
        recon[y] = prev
    info = {
        "width": w,
        "height": h,
        "n_frames": 1,
        "n_channels": ch,
        "color_type": color,
    }
    return info, recon.reshape(h, w, ch)


def decode_png(raw: bytes) -> dict:
    """Stats-only PNG decode (the ``extract_features`` decoder): real
    image properties plus ``mean_e2`` = mean sample value ×100, floored.
    Full pixel reconstruction happens exactly once (decode_png_pixels)."""
    info, px = decode_png_pixels(raw)
    info = {k: v for k, v in info.items() if k != "color_type"}
    info["mean_e2"] = (
        int(np.floor(px.astype(np.float64).mean() * 100)) if px.size else 0
    )
    return info
