"""Multimodal columns for training-data pipelines (SURVEY.md §2 extension).

Images / audio / video are carried as opaque ``binary`` columns next to a
typed metadata struct, the layout a 100 TB multimodal corpus uses: media
bytes stay columnar in Parquet, metadata stays queryable without decoding.

Decode kernels run as Arrow-batched ``mapInPandas`` — one Python worker
per partition, whole record batches per call, never per-row Python.
``decode_image_real`` decodes PNG, GIF, and JPEG geometry for REAL
(stdlib header/marker parses, no external codec needed); for other
formats the external codec
(Pillow / libsndfile / ffmpeg) is NOT installed in this environment, so
those bytes fall back to deterministic fake features derived from the
byte stream (``_fake_decode``), keeping the integration point clearly
marked. Everything Spark-side — schema, batch shape, partition flow,
column pruning — is real and tested.

At scale: ``image_features``/``audio_features`` are embarrassingly
parallel (no shuffle, no driver collect); ``frame_sample`` is pure JVM
(`sequence` + `explode`, whole-stage codegen) so a 100 TB video corpus
fans out to frame rows without a Python round-trip.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fake-decoder constants: features are pure functions of the byte stream,
# so oracles can replicate them from octet lengths
_MAX_W, _MAX_H = 624, 464
_AUDIO_BYTES_PER_SEC = 32000  # 16 kHz, 16-bit mono
FRAME_BYTES = 4096  # fake fixed-size "video frame"


_PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# PNG color type → sample channels (spec §11.2.2; palette indices are 1 channel)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png_header(data: bytes) -> tuple[int, int, int]:
    """Real PNG decode of (width, height, channels) from the IHDR chunk,
    stdlib-only (public format: PNG spec, W3C/ISO 15948 §5.6/§11.2).

    Layout: 8-byte signature, then the IHDR chunk — 4-byte big-endian
    length (always 13), 4-byte type b'IHDR', then width(4) height(4)
    bit-depth(1) color-type(1) compression(1) filter(1) interlace(1).
    """
    import struct

    if len(data) < 33 or not data.startswith(_PNG_SIGNATURE):
        raise ValueError("not a PNG byte stream")
    length, ctype = struct.unpack(">I4s", data[8:16])
    if ctype != b"IHDR" or length != 13:
        raise ValueError("malformed PNG: first chunk is not a 13-byte IHDR")
    width, height, _bit_depth, color_type = struct.unpack(">IIBB", data[16:26])
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"invalid PNG color type {color_type}")
    return width, height, _PNG_CHANNELS[color_type]


def decode_gif_header(data: bytes) -> tuple[int, int, int]:
    """Real GIF decode of (width, height, channels) from the logical
    screen descriptor (public format: GIF87a/89a spec §17-18): 6-byte
    signature, then width and height as little-endian uint16. GIF pixels
    are palette indices rendered as RGB → 3 channels."""
    import struct

    if len(data) < 10 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF byte stream")
    width, height = struct.unpack("<HH", data[6:10])
    return width, height, 3


def decode_jpeg_header(data: bytes) -> tuple[int, int, int]:
    """Real JPEG decode of (width, height, channels) by walking the
    marker segments to the first SOFn frame header (public format:
    ITU-T T.81 §B.2.2): each marker is 0xFF + code + 2-byte big-endian
    length; SOF0-15 (except DHT/JPG/DAC) carry precision(1) height(2)
    width(2) n_components(1)."""
    import struct

    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG byte stream")
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            raise ValueError("malformed JPEG: lost marker alignment")
        code = data[i + 1]
        if code in (0xD8, 0x01) or 0xD0 <= code <= 0xD7:  # standalone markers
            i += 2
            continue
        (seg_len,) = struct.unpack(">H", data[i + 2 : i + 4])
        # SOFn frame headers, excluding DHT(C4)/JPG(C8)/DAC(CC)
        if 0xC0 <= code <= 0xCF and code not in (0xC4, 0xC8, 0xCC):
            _prec, height, width, n_comp = struct.unpack(
                ">BHHB", data[i + 4 : i + 10]
            )
            return width, height, n_comp
        i += 2 + seg_len
    raise ValueError("malformed JPEG: no SOF frame header found")


def decode_image_real(data: bytes) -> tuple[int, int, int]:
    """The real-codec integration point. PNG, GIF, and JPEG geometry are
    decoded for real (stdlib header/marker parses of the public format
    specs — no external codec needed); full pixel decode of other
    formats needs Pillow etc.: install it and monkeypatch / wrap this."""
    if data[:8] == _PNG_SIGNATURE:
        return decode_png_header(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_header(data)
    if data[:2] == b"\xff\xd8":
        return decode_jpeg_header(data)
    raise NotImplementedError(
        "no real codec for this byte stream in this environment; "
        "override etl_school_spark.multimodal.media.decode_image_real"
    )


def _fake_decode(data: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for byte→(width, height, channels)."""
    n = len(data)
    return n % _MAX_W + 16, (n * 31) % _MAX_H + 16, 3


def _decode_dims(data: bytes, decoder=None) -> tuple[int, int, int]:
    """Resolve the decode seam: an explicitly injected ``decoder`` wins
    (it is captured BY VALUE in the mapInPandas closure, so it reaches
    the Python worker process — a driver-side monkeypatch of
    ``decode_image_real`` would not); otherwise the module-level
    integration point, falling back to the deterministic fake while no
    codec is installed."""
    if decoder is not None:
        return decoder(data)
    try:
        return decode_image_real(data)
    except NotImplementedError:
        return _fake_decode(data)


def attach_media(docs: DataFrame, media_type: str = "image") -> DataFrame:
    """documents → media table: opaque binary content + typed metadata.

    content = UTF-8 bytes of the text (the deterministic fake payload);
    a real pipeline would read image/audio files into the same shape.
    """
    content = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        content.alias("content"),
        F.struct(
            F.lit("fake/raw").alias("codec"),
            F.octet_length(content).cast("long").alias("byte_len"),
        ).alias("meta"),
    )


_IMG_SCHEMA = (
    "media_id long, byte_len long, width int, height int, channels int, "
    "aspect double, decode_error string"
)


def image_features(media: DataFrame, decoder=None) -> DataFrame:
    """Arrow-batched decode → per-image features. No shuffle; scales with
    partition count. Column-prunes to (media_id, content) before Python.

    ``decoder``: optional ``bytes -> (width, height, channels)`` real
    codec, shipped to workers inside the kernel closure (the supported
    injection point for Pillow etc.; see ``_decode_dims``).

    A MALFORMED blob (real-format signature, broken body: ValueError
    from a decoder) must not kill a 100 TB job — it yields a quarantine
    row: NULL dims + the error text in ``decode_error``. Callers route
    ``decode_error IS NOT NULL`` to a quarantine sink and continue."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims, errs = [], []
            for b in pdf["content"]:
                try:
                    dims.append(_decode_dims(b, decoder))
                    errs.append(None)
                except ValueError as ex:
                    dims.append((None, None, None))
                    errs.append(str(ex))
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": [len(b) for b in pdf["content"]],
                    "width": pd.array([d[0] for d in dims], dtype="Int32"),
                    "height": pd.array([d[1] for d in dims], dtype="Int32"),
                    "channels": pd.array([d[2] for d in dims], dtype="Int32"),
                }
            )
            out["aspect"] = (out["width"].astype("Float64") / out["height"].astype("Float64")).round(4)
            out["decode_error"] = errs
            yield out

    return media.select("media_id", "content").mapInPandas(kernel, _IMG_SCHEMA)


def resize_images(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize plumbing: same batch flow as a real resampler, emitting the
    target geometry + untouched bytes (fake kernel cannot resample)."""

    schema = "media_id long, width int, height int, content binary"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": target_w,
                    "height": target_h,
                    "content": pdf["content"],
                }
            )

    return media.select("media_id", "content").mapInPandas(kernel, schema)


def audio_features(media: DataFrame) -> DataFrame:
    """Waveform-level metadata from byte length alone — stays fully
    JVM-side (no Python), the fast path for fixed-rate PCM."""
    bl = F.col("meta.byte_len")
    return media.select(
        "media_id",
        bl.alias("byte_len"),
        (bl / F.lit(2)).cast("long").alias("n_samples"),
        (bl / F.lit(float(_AUDIO_BYTES_PER_SEC))).alias("duration_s"),
    )


def extract_frames(media: DataFrame, every: int = 4) -> DataFrame:
    """Materialize the sampled frames' BYTES (binary out), not just their
    offsets: mapInPandas slices each content blob into its sampled
    fixed-size frames. Binary-in/binary-out through Arrow — the shape a
    real video keyframe extractor has, with slicing standing in for the
    codec."""
    stride = FRAME_BYTES * every

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                for off in range(0, len(blob), stride):
                    ids.append(mid)
                    idxs.append(off // FRAME_BYTES)
                    frames.append(bytes(blob[off : off + FRAME_BYTES]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_bytes": frames})

    return media.select("media_id", "content").mapInPandas(
        kernel, "media_id long, frame_idx long, frame_bytes binary"
    )


def frame_sample(media: DataFrame, every: int = 4) -> DataFrame:
    """Sample every ``every``-th fixed-size frame of each "video": emit
    (media_id, frame_idx, frame_offset, frame_len) rows. Pure
    sequence+explode — whole-stage codegen, no UDF, no shuffle."""
    stride = FRAME_BYTES * every
    bl = F.col("meta.byte_len")
    offsets = F.sequence(F.lit(0).cast("long"), bl - 1, F.lit(stride).cast("long"))
    return (
        media.filter(bl > 0)
        .select("media_id", bl.alias("byte_len"), F.explode(offsets).alias("frame_offset"))
        .select(
            "media_id",
            (F.col("frame_offset") / FRAME_BYTES).cast("long").alias("frame_idx"),
            "frame_offset",
            F.least(F.lit(FRAME_BYTES).cast("long"), F.col("byte_len") - F.col("frame_offset")).alias(
                "frame_len"
            ),
        )
    )
