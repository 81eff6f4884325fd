"""Multimodal columns: images/audio/video as opaque ``binary`` + typed
metadata structs, with decode/feature steps as Arrow-batched pandas UDFs.

The Spark-side plumbing (schemas, batch shapes, partitioning) is real and
tested. Decoding is dispatched by mime via ``register_decoder``; WAV, PNG,
JPEG and MJPEG-in-AVI video ship with REAL pure-python decoders
(``codecs.py`` — RIFF chunk walk + PCM decode, zlib inflate + scanline
unfilter, baseline JFIF entropy decode + IDCT, AVI container walk), so
features for those formats are actual decoded properties. Unregistered
mimes (MP3, H.264 …) RAISE by default —
``allow_stub=True`` opts into a clearly-documented deterministic stub for
end-to-end plumbing tests; swapping in librosa/ffmpeg is one
``register_decoder`` call, not a plan change.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterable
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fugue_spark.pipeline.codecs import (
    decode_avi_stats,
    decode_jpeg,
    decode_png,
    decode_wav,
)

__all__ = [
    "MEDIA_SCHEMA",
    "as_media",
    "pack_wav",
    "pack_jpeg_tiles",
    "pack_avi_tiles",
    "video_frame_features",
    "with_media_meta",
    "extract_features",
    "register_decoder",
    "resize_images",
    "resample_audio",
    "sample_frames",
]

# the typed side-car for an opaque blob
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha1", T.StringType(), True),
    ]
)

_DECODERS: dict[str, Callable[[bytes], dict]] = {}


def register_decoder(mime_prefix: str, fn: Callable[[bytes], dict]) -> None:
    """Plug a decoder: fn(raw_bytes) -> {'width':…, 'height':…, …}.
    Longest-prefix match wins at dispatch."""
    _DECODERS[mime_prefix] = fn


def _fake_decode(raw: bytes) -> dict:
    """Deterministic stand-in for formats whose decoders need native
    libraries absent from this environment (MP3, MP4/H.264 …; WAV, PNG,
    JPEG and MJPEG-AVI are REAL — codecs.py). Derives stable
    pseudo-features from a CRC of the bytes so pipelines are exercisable
    end-to-end; only reachable via extract_features(allow_stub=True)."""
    crc = zlib.crc32(raw) & 0xFFFFFFFF
    return {
        "width": 1 + crc % 1024,
        "height": 1 + (crc >> 10) % 1024,
        "n_frames": 1 + (crc >> 20) % 64,
    }


# real decoders are the default for the formats pure python can handle
register_decoder("audio/wav", decode_wav)
register_decoder("audio/x-wav", decode_wav)
register_decoder("image/png", decode_png)
register_decoder("image/jpeg", decode_jpeg)
register_decoder("image/jpg", decode_jpeg)
register_decoder("video/x-msvideo", decode_avi_stats)
register_decoder("video/avi", decode_avi_stats)


def as_media(df: DataFrame, source_col: str, mime: str = "application/octet-stream") -> DataFrame:
    """Pack a column into (blob binary, meta struct). Text columns are
    utf-8 encoded; binary columns pass through."""
    src = F.col(source_col)
    dt = df.schema[source_col].dataType
    blob = src if isinstance(dt, T.BinaryType) else F.encode(src.cast("string"), "utf-8")
    return df.withColumn("blob", blob).withColumn(
        "meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(F.col("blob")).cast("long").alias("n_bytes"),
            F.sha1(F.col("blob")).alias("sha1"),
        ),
    )


def pack_wav(
    df: DataFrame, source_col: str, sample_rate: int = 8000
) -> DataFrame:
    """Wrap a binary/text column's bytes as a REAL 8-bit-PCM mono WAV blob,
    entirely JVM-side: the RIFF sizes are little-endian u32s assembled with
    format_string+unhex, the fixed fmt chunk is a binary literal, and the
    payload is the source bytes — spec-conformant output any audio tool can
    open. Map-only (no shuffle, no Python); at 100 TB this is a scan-speed
    re-encoding."""
    src = F.col(source_col)
    dt = df.schema[source_col].dataType
    data = src if isinstance(dt, T.BinaryType) else F.encode(src.cast("string"), "utf-8")

    def le32(c: F.Column) -> F.Column:
        # little-endian u32 as 4 hex byte pairs -> binary
        byte = lambda i: F.shiftright(c.cast("long"), 8 * i).bitwiseAND(F.lit(255)).cast("int")  # noqa: E731
        return F.unhex(
            F.format_string("%02x%02x%02x%02x", byte(0), byte(1), byte(2), byte(3))
        )

    n = F.octet_length(data).cast("long")
    mid = b"WAVE" + b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate, 1, 8
    ) + b"data"
    blob = F.concat(F.lit(b"RIFF"), le32(n + 36), F.lit(mid), le32(n), data)
    return df.withColumn("blob", blob).withColumn(
        "meta",
        F.struct(
            F.lit("audio/wav").alias("mime"),
            F.octet_length(F.col("blob")).cast("long").alias("n_bytes"),
            F.sha1(F.col("blob")).alias("sha1"),
        ),
    )


def pack_jpeg_tiles(
    df: DataFrame,
    source_col: str,
    grid: "tuple[int, int]" = (4, 4),
    id_col: str = "doc_id",
    quality: int = 100,
) -> DataFrame:
    """Render a column's bytes as a REAL baseline-JFIF grayscale image:
    byte ``i`` (cycled if the value is shorter than ``grid_w*grid_h``)
    becomes a constant 8x8 tile, so a ``grid=(4,4)`` value is a 32x32
    JPEG. Constant tiles are DC-only blocks — at ``quality=100`` (DC
    quant step 1) the decode round-trip is EXACT, which is what lets an
    independent engine verify decoded features from the source bytes
    (the p35 gate contract; same synthesis role as pack_wav for audio).

    mapInPandas (encode is numpy-vectorized per image; one Arrow batch in
    flight per core, map-only). Rows with empty source are dropped.
    Output: ``id (from id_col), blob (binary), meta (MEDIA_SCHEMA)``.
    """
    import hashlib

    import numpy as np

    from fugue_spark.pipeline.codecs import encode_jpeg

    gw, gh = int(grid[0]), int(grid[1])
    if gw <= 0 or gh <= 0:
        raise ValueError(f"grid must be positive, got {grid}")
    src = F.col(source_col)
    dt = df.schema[source_col].dataType
    data = src if isinstance(dt, T.BinaryType) else F.encode(src.cast("string"), "utf-8")
    packed = df.select(F.col(id_col).alias("id"), data.alias("__bytes__")).filter(
        F.octet_length("__bytes__") > 0
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        n_tiles = gw * gh
        for pdf in batches:
            ids, blobs, nb, sha = [], [], [], []
            for i, raw in zip(pdf["id"], pdf["__bytes__"]):
                raw = raw if isinstance(raw, bytes) else bytes(raw)
                b = np.frombuffer(raw, dtype=np.uint8)
                tiles = b[np.arange(n_tiles) % len(b)].reshape(gh, gw)
                img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
                blob = encode_jpeg(img, quality=quality)
                ids.append(i)
                blobs.append(blob)
                nb.append(len(blob))
                sha.append(hashlib.sha1(blob).hexdigest())
            yield pd.DataFrame(
                {"id": ids, "blob": blobs, "n_bytes": nb, "sha1": sha}
            )

    flat = packed.mapInPandas(
        run, "id long, blob binary, n_bytes long, sha1 string"
    )
    return flat.select(
        "id",
        "blob",
        F.struct(
            F.lit("image/jpeg").alias("mime"),
            F.col("n_bytes"),
            F.col("sha1"),
        ).alias("meta"),
    )


def pack_avi_tiles(
    df: DataFrame,
    source_col: str,
    n_frames: int = 3,
    grid: "tuple[int, int]" = (2, 2),
    id_col: str = "doc_id",
    fps: int = 4,
    quality: int = 100,
) -> DataFrame:
    """Render a column's bytes as a REAL MJPEG-in-AVI video: frame ``f``'s
    tile ``i`` is byte ``(f*grid_w*grid_h + i) mod len`` (cycled), each
    frame a constant-tile grayscale JPEG — at ``quality=100`` every frame's
    decode is EXACT (DC-only blocks), so an independent engine can verify
    per-frame decoded features from the source bytes (the p36 gate
    contract; pack_wav/pack_jpeg_tiles's video sibling).

    mapInPandas, map-only. Rows with empty source are dropped.
    Output: ``id, blob (binary), meta (MEDIA_SCHEMA, mime video/x-msvideo)``.
    """
    import hashlib

    import numpy as np

    from fugue_spark.pipeline.codecs import encode_avi_mjpeg, encode_jpeg

    gw, gh = int(grid[0]), int(grid[1])
    nf = int(n_frames)
    if gw <= 0 or gh <= 0 or nf <= 0:
        raise ValueError(f"grid and n_frames must be positive, got {grid}, {n_frames}")
    src = F.col(source_col)
    dt = df.schema[source_col].dataType
    data = src if isinstance(dt, T.BinaryType) else F.encode(src.cast("string"), "utf-8")
    packed = df.select(F.col(id_col).alias("id"), data.alias("__bytes__")).filter(
        F.octet_length("__bytes__") > 0
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        per_frame = gw * gh
        for pdf in batches:
            ids, blobs, nb, sha = [], [], [], []
            for i, raw in zip(pdf["id"], pdf["__bytes__"]):
                raw = raw if isinstance(raw, bytes) else bytes(raw)
                b = np.frombuffer(raw, dtype=np.uint8)
                frames = []
                for f in range(nf):
                    idx = (f * per_frame + np.arange(per_frame)) % len(b)
                    tiles = b[idx].reshape(gh, gw)
                    img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
                    frames.append(encode_jpeg(img, quality=quality))
                blob = encode_avi_mjpeg(frames, gw * 8, gh * 8, fps=fps)
                ids.append(i)
                blobs.append(blob)
                nb.append(len(blob))
                sha.append(hashlib.sha1(blob).hexdigest())
            yield pd.DataFrame({"id": ids, "blob": blobs, "n_bytes": nb, "sha1": sha})

    flat = packed.mapInPandas(run, "id long, blob binary, n_bytes long, sha1 string")
    return flat.select(
        "id",
        "blob",
        F.struct(
            F.lit("video/x-msvideo").alias("mime"),
            F.col("n_bytes"),
            F.col("sha1"),
        ).alias("meta"),
    )


def video_frame_features(
    df: DataFrame,
    every_n: int = 1,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """The video pipeline op: sample every ``every_n``-th frame from each
    MJPEG-in-AVI blob AND feature-extract the kept frames in the same pass
    (container walk + per-frame JPEG decode happen once; no intermediate
    frame-blob materialization). mapInPandas, map-only — decode parallelism
    is the partition count, one Arrow batch of videos in flight per core.

    Output: ``id, frame_idx, width, height, mean_e2`` (one row per kept
    frame; mean_e2 = decoded frame mean ×100, floored)."""
    from fugue_spark.pipeline.codecs import decode_avi, decode_jpeg_pixels, mean_e2

    n = int(every_n)
    if n <= 0:
        raise ValueError(f"every_n must be positive, got {every_n}")

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ws, hs, means = [], [], [], [], []
            for i, raw in zip(pdf[id_col], pdf[blob_col]):
                raw = raw if isinstance(raw, bytes) else bytes(raw)
                _meta, frames = decode_avi(raw)
                for j in range(0, len(frames), n):
                    info, px = decode_jpeg_pixels(frames[j])
                    ids.append(i)
                    idxs.append(j)
                    ws.append(info["width"])
                    hs.append(info["height"])
                    means.append(mean_e2(px))
            yield pd.DataFrame(
                {"id": ids, "frame_idx": idxs, "width": ws, "height": hs, "mean_e2": means}
            )

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        run, "id long, frame_idx long, width long, height long, mean_e2 long"
    )


def with_media_meta(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Pure-JVM metadata: byte length + sha1 (no decode)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.col(blob_col)).cast("long").alias("n_bytes"),
            F.sha1(F.col(blob_col)).alias("sha1"),
        ),
    )


_FEATURE_SCHEMA = (
    "id long, n_bytes long, width long, height long, n_frames long, "
    "sample_rate long, n_channels long, duration_ms long, peak long, "
    "rms_e2 long, mean_e2 long"
)
_FEATURE_KEYS = (
    "width",
    "height",
    "n_frames",
    "sample_rate",
    "n_channels",
    "duration_ms",
    "peak",
    "rms_e2",
    "mean_e2",
)


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    mime: str = "application/octet-stream",
    allow_stub: bool = False,
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches of blobs;
    bounded memory — one batch of media in flight per core). Dispatches to
    the registered decoder by longest mime prefix (WAV/PNG/JPEG are real
    decoders by default). An UNREGISTERED mime raises up front — a decode
    that silently produced pseudo-features would poison a pipeline;
    ``allow_stub=True`` explicitly opts into the deterministic CRC stub for
    end-to-end plumbing tests. Fields a decoder does not produce come back
    null."""
    decoder, best = None, -1
    for prefix, fn in _DECODERS.items():
        if mime.startswith(prefix) and len(prefix) > best:
            decoder, best = fn, len(prefix)
    if decoder is None:
        if not allow_stub:
            raise ValueError(
                f"no decoder registered for mime {mime!r} — register one via "
                "register_decoder(), or pass allow_stub=True to use the "
                "deterministic CRC pseudo-feature stub (plumbing tests only)"
            )
        decoder = _fake_decode

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(raw if isinstance(raw, bytes) else bytes(raw)) for raw in pdf[blob_col]]
            out = {
                "id": pdf[id_col].values,
                "n_bytes": [len(r) for r in pdf[blob_col]],
            }
            for k in _FEATURE_KEYS:
                out[k] = [f.get(k) for f in feats]
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(run, _FEATURE_SCHEMA)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """REAL image resize over PNG and JPEG blobs (format sniffed from the
    magic bytes): full decode — zlib inflate + unfilter for PNG, baseline
    entropy decode + IDCT for JPEG — then nearest-neighbor resample to
    (width, height) with pure numpy index arithmetic, re-encoded as PNG
    (lossless output regardless of input format). mapInPandas — one Arrow
    batch of images in flight per core, map-only, no shuffle; output blobs
    are spec-conformant PNGs any tool can open.

    Output: ``id_col, blob (binary), width, height, n_channels``. Unknown
    formats raise per-row ValueError from the codec — honest failure, not
    a silent skip.
    """
    import numpy as np

    from fugue_spark.pipeline.codecs import (
        decode_jpeg_pixels,
        decode_png_pixels,
        encode_png,
    )

    w_out, h_out = int(width), int(height)
    if w_out <= 0 or h_out <= 0:
        raise ValueError(f"target size must be positive, got {width}x{height}")

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, chans = [], [], []
            for i, raw in zip(pdf[id_col], pdf[blob_col]):
                raw = raw if isinstance(raw, bytes) else bytes(raw)
                # ONE full decode: meta + reconstructed pixels together
                # (the per-pixel decode loop is the cost — never run twice)
                if raw[:2] == b"\xff\xd8":
                    meta, img = decode_jpeg_pixels(raw)
                    meta = dict(meta, color_type=None)
                else:
                    meta, img = decode_png_pixels(raw)
                w_in, h_in, ch = meta["width"], meta["height"], meta["n_channels"]
                if meta["color_type"] == 3:
                    raise ValueError(
                        "palette PNG: pixels are palette indices — resizing "
                        "them as luminance would corrupt the image (expand "
                        "the palette first)"
                    )
                if ch == 2:
                    raise ValueError(
                        "gray+alpha PNG not supported by the re-encoder"
                    )
                # nearest-neighbor: source index = floor((i + 0.5) * in/out)
                ys = np.minimum(((np.arange(h_out) + 0.5) * h_in / h_out).astype(int), h_in - 1)
                xs = np.minimum(((np.arange(w_out) + 0.5) * w_in / w_out).astype(int), w_in - 1)
                out = img[ys][:, xs]
                ids.append(i)
                blobs.append(encode_png(out if ch > 1 else out[:, :, 0]))
                chans.append(ch)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "blob": blobs,
                    "width": [w_out] * len(ids),
                    "height": [h_out] * len(ids),
                    "n_channels": chans,
                }
            )

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        run, "id long, blob binary, width long, height long, n_channels long"
    )


def resample_audio(
    df: DataFrame,
    factor: int,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """REAL audio downsample over WAV blobs: decode PCM, keep every
    ``factor``-th frame (decimation — the frame-sample primitive for
    audio), re-encode at ``sample_rate / factor``. mapInPandas, map-only.

    Output: ``id_col → id, blob, n_frames, sample_rate``. The decimated
    blob is spec-conformant WAV (stdlib-``wave`` readable)."""
    import struct as _struct

    import numpy as np

    from fugue_spark.pipeline.codecs import decode_wav, encode_wav

    k = int(factor)
    if k <= 0:
        raise ValueError(f"factor must be positive, got {factor}")

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, nfr, rates = [], [], [], []
            for i, raw in zip(pdf[id_col], pdf[blob_col]):
                raw = raw if isinstance(raw, bytes) else bytes(raw)
                meta = decode_wav(raw)
                if meta["n_channels"] != 1:
                    raise ValueError(
                        f"resample_audio supports mono PCM; got "
                        f"{meta['n_channels']} channels (deinterleave first)"
                    )
                # byte-wise decimation is only sample-wise for 8-bit PCM;
                # a 16-bit stream sliced by bytes would split samples —
                # refuse honestly (decode_wav's contract)
                if meta["bits"] != 8:
                    raise ValueError(
                        f"resample_audio supports 8-bit PCM; got {meta['bits']}-bit"
                    )
                # pull the PCM back out (8-bit path: bytes ARE the samples)
                pos, data = 12, b""
                while pos + 8 <= len(raw):
                    cid = raw[pos : pos + 4]
                    (sz,) = _struct.unpack("<I", raw[pos + 4 : pos + 8])
                    if cid == b"data":
                        data = raw[pos + 8 : pos + 8 + sz]
                    pos += 8 + sz + (sz & 1)
                arr = np.frombuffer(data, dtype=np.uint8)
                dec = arr[::k].tobytes()
                rate = max(meta["sample_rate"] // k, 1)
                ids.append(i)
                blobs.append(encode_wav(dec, sample_rate=rate, n_channels=1, bits=8))
                nfr.append(len(dec))
                rates.append(rate)
            yield pd.DataFrame(
                {"id": ids, "blob": blobs, "n_frames": nfr, "sample_rate": rates}
            )

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        run, "id long, blob binary, n_frames long, sample_rate long"
    )


def sample_frames(
    df: DataFrame,
    every_n: int,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    decoder: "Callable | None" = None,
) -> DataFrame:
    """Video frame sampling: one output row per kept frame with typed
    metadata (``id, frame_idx, frame blob``). The DEFAULT decoder is REAL
    for MJPEG-in-AVI (codecs.decode_avi — RIFF/LIST walk; each kept frame
    blob is a standalone baseline JPEG that decode_jpeg/resize_images can
    consume downstream). Other containers (MP4/H.264 …) need native
    libraries and raise honestly; pass ``decoder(raw) -> list[bytes]``
    (e.g. ffmpeg-backed) to handle them."""
    n = int(every_n)
    if n <= 0:
        raise ValueError(f"every_n must be positive, got {every_n}")

    def _default_decoder(raw: bytes) -> "list[bytes]":
        from fugue_spark.pipeline.codecs import decode_avi

        if raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
            return decode_avi(raw)[1]
        raise NotImplementedError(
            "only MJPEG-in-AVI decodes natively; other containers need "
            "ffmpeg/pyav — pass decoder(raw)->list[frame_bytes]"
        )

    dec = decoder or _default_decoder

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, raw in zip(pdf[id_col], pdf[blob_col]):
                all_frames = dec(raw if isinstance(raw, bytes) else bytes(raw))
                for j in range(0, len(all_frames), n):
                    ids.append(i)
                    idxs.append(j)
                    frames.append(all_frames[j])
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame": frames})

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        run, "id long, frame_idx long, frame binary"
    )
