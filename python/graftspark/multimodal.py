"""Multimodal (binary-column) feature extraction over mapInPandas.

Treats image/audio blobs as opaque ``binary`` columns with typed
metadata, processed in Arrow batches via ``DataFrame.mapInPandas`` — the
plumbing (schema, batch iteration, partition preservation) is real and
tested. Two decoders are fully real, byte-level, stdlib-only:

- PPM (P6) images → (width, height, channels, per-channel means)
- RIFF/WAV PCM16 audio → (channels, sample_rate, n_frames, duration, rms)

PNG/JPEG and AIFF/AU decode are REAL on the JVM side (the engine uses
``javax.imageio`` / ``javax.sound.sampled`` — zero extra dependencies);
reach them from Python through :func:`graftspark.ops.decode_images` /
:func:`graftspark.ops.audio_stats`, which route per-row on magic bytes.
The pure-Python path here stays stdlib-only (PPM/WAV); other formats
enter through the ``decoder`` hook of :func:`extract_image_features` —
plug any callable
``bytes -> (width, height, channels, iterable_of_channel_means)`` (e.g.
a Pillow-based one) and the Spark-side batching is unchanged. This is
the same boundary as the Scala engine's ``graft.ops.Multimodal``
ImageCodec plug-in.
"""

import math
import struct
import sys
from typing import Callable, Iterator, Optional, Tuple

from pyspark.sql import DataFrame


def _self_contained_udfs() -> None:
    """Serialize this module's functions by value, so executors don't
    need graftspark on their PYTHONPATH (pure-stdlib decode logic rides
    inside the pickled UDF; at cluster scale this replaces a --py-files
    ship of the package for these two operators)."""
    try:
        from pyspark import cloudpickle
        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass  # older pyspark: fall back to requiring --py-files

IMAGE_META_SCHEMA = ("id long, width int, height int, channels int, "
                     "mean_r double, mean_g double, mean_b double")

AUDIO_META_SCHEMA = ("id long, channels int, sample_rate int, "
                     "n_frames long, duration_us long, rms double")

Decoded = Tuple[int, int, int, Tuple[float, float, float]]


def parse_ppm(blob: bytes) -> Decoded:
    """Byte-level P6 PPM parse: header tokens (magic, width, height,
    maxval, whitespace/comment rules) then raw RGB triples."""
    if not blob.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    pos = 2
    vals = []
    while len(vals) < 3:
        # skip whitespace and '#' comments between header tokens
        while pos < len(blob) and blob[pos:pos + 1].isspace():
            pos += 1
        if blob[pos:pos + 1] == b"#":
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos:pos + 1].isspace():
            pos += 1
        vals.append(int(blob[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = width * height
    pixels = blob[pos:pos + 3 * n]
    if len(pixels) != 3 * n:
        raise ValueError("truncated PPM payload")
    sums = [0, 0, 0]
    for c in range(3):
        sums[c] = sum(pixels[c::3])
    return width, height, 3, tuple(s / n for s in sums)


def parse_wav(blob: bytes):
    """RIFF chunk walk + PCM16 stats: (channels, sample_rate, n_frames,
    duration_us, rms)."""
    if blob[0:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(blob):
        cid = blob[pos:pos + 4]
        clen = struct.unpack_from("<I", blob, pos + 4)[0]
        body = blob[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported, got fmt={audio_format} bits={bits}")
    frame_bytes = channels * 2
    n_frames = len(data) // frame_bytes
    n_samples = n_frames * channels
    samples = struct.unpack_from(f"<{n_samples}h", data, 0)
    sq = sum(s * s for s in samples)
    rms = math.sqrt(sq / n_samples) if n_samples else 0.0
    duration_us = n_frames * 1_000_000 // sample_rate
    return channels, sample_rate, n_frames, duration_us, rms


def extract_image_features(df: DataFrame, id_col: str, blob_col: str,
                           decoder: Optional[Callable[[bytes], Decoded]]
                           = None) -> DataFrame:
    """Decode an image blob column to typed metadata via mapInPandas.

    Default decoder handles PPM/P6 (real, byte-level). For codec formats
    pass your own ``decoder(bytes) -> (w, h, channels, (mr, mg, mb))``.
    Rows whose blobs fail to decode are dropped (corrupt-input policy of
    a cleaning pipeline); decode errors other than ValueError propagate.
    """
    import pandas as pd

    _self_contained_udfs()
    decode = decoder or parse_ppm

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {"id": [], "width": [], "height": [], "channels": [],
                   "mean_r": [], "mean_g": [], "mean_b": []}
            for id_, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    w, h, ch, means = decode(bytes(blob))
                except ValueError:
                    continue
                out["id"].append(id_)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                mr, mg, mb = means
                out["mean_r"].append(mr)
                out["mean_g"].append(mg)
                out["mean_b"].append(mb)
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(
        batches, schema=IMAGE_META_SCHEMA)


def extract_audio_features(df: DataFrame, id_col: str,
                           blob_col: str) -> DataFrame:
    """RIFF/WAV PCM16 metadata + RMS via mapInPandas (real decode)."""
    import pandas as pd

    _self_contained_udfs()

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {"id": [], "channels": [], "sample_rate": [],
                   "n_frames": [], "duration_us": [], "rms": []}
            for id_, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    ch, sr, nf, dur, rms = parse_wav(bytes(blob))
                except ValueError:
                    continue
                out["id"].append(id_)
                out["channels"].append(ch)
                out["sample_rate"].append(sr)
                out["n_frames"].append(nf)
                out["duration_us"].append(dur)
                out["rms"].append(rms)
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(
        batches, schema=AUDIO_META_SCHEMA)


def resize_ppm(df: "DataFrame", id_col: str, blob_col: str,
               new_w: int, new_h: int) -> "DataFrame":
    """Decode + nearest-neighbor resize + re-encode a PPM blob column in
    the JVM (partition-local, zero shuffle): returns id, width, height,
    per-channel means, n_bytes, and the resized blob."""
    from .session import _jvm_bridge, _to_py_df
    return _to_py_df(_jvm_bridge(df).resizePpmImages(
        df._jdf, id_col, blob_col, int(new_w), int(new_h)), df)


def wav_window_rms(df: "DataFrame", id_col: str, blob_col: str,
                   window_frames: int) -> "DataFrame":
    """Windowed RMS energy of a PCM16 WAV blob column (JVM codec, one
    row per (file, window); final window partial)."""
    from .session import _jvm_bridge, _to_py_df
    return _to_py_df(_jvm_bridge(df).wavWindowRms(
        df._jdf, id_col, blob_col, int(window_frames)), df)


VIDEO_META_SCHEMA = ("id long, n_frames int, fps_milli int, "
                     "duration_us long")

VIDEO_FRAME_SCHEMA = ("id long, frame_idx int, width int, height int, "
                      "mean_r double, mean_g double, mean_b double, "
                      "frame binary")


def parse_gvid(blob: bytes):
    """GVID container walk: magic 'GVID', big-endian fps_milli and
    frame count, then length-prefixed frame payloads. Returns
    (fps_milli, [frame_bytes, ...]). Raises ValueError on bad magic /
    truncation — the corrupt-input drop policy of the extractors."""
    import struct as _struct
    if len(blob) < 12 or blob[:4] != b"GVID":
        raise ValueError("not a GVID blob")
    fps_milli, n_frames = _struct.unpack(">ii", blob[4:12])
    frames = []
    off = 12
    for _ in range(n_frames):
        if off + 4 > len(blob):
            raise ValueError("truncated GVID")
        (ln,) = _struct.unpack(">i", blob[off:off + 4])
        off += 4
        if off + ln > len(blob):
            raise ValueError("truncated GVID frame")
        frames.append(blob[off:off + ln])
        off += ln
    return fps_milli, frames


def extract_video_features(df: DataFrame, id_col: str,
                           blob_col: str) -> DataFrame:
    """Container-level video metadata via mapInPandas: frame count,
    fps, exact duration — headers only, frame payloads never decode.
    Corrupt blobs drop (ValueError policy). Default walker handles the
    self-contained GVID container; codec containers (MP4/WebM) need a
    native decoder plugged at this boundary."""
    import pandas as pd

    _self_contained_udfs()

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {"id": [], "n_frames": [], "fps_milli": [],
                   "duration_us": []}
            for id_, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    fps, frames = parse_gvid(bytes(blob))
                except ValueError:
                    continue
                out["id"].append(id_)
                out["n_frames"].append(len(frames))
                out["fps_milli"].append(fps)
                out["duration_us"].append(
                    len(frames) * 1_000_000_000 // fps)
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(
        batches, schema=VIDEO_META_SCHEMA)


def sample_video_frames(df: DataFrame, id_col: str, blob_col: str,
                        every_n: int = 1) -> DataFrame:
    """Every ``every_n``-th frame of a GVID column as its own row —
    standalone PPM blob plus dimensions and per-channel means, ready
    for the image extractors / hashes / stores. Decode is
    partition-local inside mapInPandas; only the sampled frames leave
    the executor. Corrupt videos drop whole (ValueError policy)."""
    import pandas as pd

    _self_contained_udfs()
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {"id": [], "frame_idx": [], "width": [], "height": [],
                   "mean_r": [], "mean_g": [], "mean_b": [],
                   "frame": []}
            for id_, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    # buffer the whole video's sample before emitting:
                    # drop-WHOLE semantics (a corrupt frame mid-video
                    # must not leave a partial prefix in the output) —
                    # matches the JVM videoFrameSample policy
                    rows = []
                    _, frames = parse_gvid(bytes(blob))
                    for i in range(0, len(frames), every_n):
                        w, h, _ch, (mr, mg, mb) = parse_ppm(frames[i])
                        rows.append((i, w, h, mr, mg, mb, frames[i]))
                except ValueError:
                    continue
                for i, w, h, mr, mg, mb, fr in rows:
                    out["id"].append(id_)
                    out["frame_idx"].append(i)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["mean_r"].append(mr)
                    out["mean_g"].append(mg)
                    out["mean_b"].append(mb)
                    out["frame"].append(fr)
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(
        batches, schema=VIDEO_FRAME_SCHEMA)
