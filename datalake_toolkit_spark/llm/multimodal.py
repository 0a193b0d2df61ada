"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schema, partition-friendly batch shapes,
Arrow-batched ``mapInPandas`` feature extraction — is real and
tested. ``decode_media`` decodes for real where a decoder exists in
this container (stdlib ``wave`` for WAV audio; PIL for images when
installed, soft-imported) and degrades per-row (``decoded=false`` +
``decode_err``) where one doesn't (video: no ffmpeg here).
``extract_media_features`` derives deterministic md5-based features
from the bytes, which keeps the whole pipeline executable and
oracle-verifiable end-to-end; ``resize_media`` really resamples
decodable images (PIL where installed; binary PPM in pure numpy
everywhere) and degrades undecodable payloads to a deterministic
stand-in; ``sample_frames`` carries the production Arrow contract
with a deterministic stand-in splitter (no ffmpeg here).

At 100 TB: binary payloads ride in parquet alongside metadata; decode
runs as ``mapInPandas`` so each Arrow batch crosses the Python
boundary once (not per row), and ``maxRecordsPerBatch`` bounds
executor memory against large blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_TYPES = ("image", "audio", "video")

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
    ]
)


# extension -> media_type for the binaryFile ingestion source
MEDIA_EXTENSIONS: dict[str, str] = {
    "wav": "audio", "mp3": "audio", "flac": "audio", "ogg": "audio",
    "png": "image", "jpg": "image", "jpeg": "image", "gif": "image", "bmp": "image",
    "mp4": "video", "avi": "video", "mkv": "video", "webm": "video", "mov": "video",
}


def read_media_files(spark, path: str, glob: str | None = None) -> DataFrame:
    """Ingest raw media files into the multimodal table shape via
    Spark's native ``binaryFile`` source: one row per file with
    ``(doc_id, media_type, content, path, byte_len)``, where doc_id
    is the xxhash64 of the file path (stable across re-runs and
    cluster sizes) and media_type derives from the extension
    (NULL for unrecognized extensions — those rows flow through
    :func:`decode_media` as ``decoded=false`` instead of failing).

    Scale: binaryFile never splits a file (one row per blob), so this
    is the BRIDGE format — read once, then persist as a parquet
    multimodal table (payload column + metadata) where scans are
    columnar, splittable, and prunable. Millions of small files
    belong behind a manifest/compaction step, not repeated binaryFile
    scans. ``pathGlobFilter`` prunes by extension at listing time."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1))
    mt_map = F.create_map(
        *[F.lit(x) for kv in MEDIA_EXTENSIONS.items() for x in kv]
    )
    return df.select(
        F.xxhash64("path").alias("doc_id"),
        F.element_at(mt_map, ext).alias("media_type"),
        F.col("content"),
        F.col("path"),
        F.col("length").alias("byte_len"),
    )


def attach_fake_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Turn the documents table into a multimodal table: UTF-8 bytes
    of the text as the binary payload, media_type assigned
    round-robin by id. Stands in for real (path, bytes) ingestion."""
    return docs.select(
        F.col(id_col),
        F.element_at(
            F.array(*[F.lit(m) for m in MEDIA_TYPES]),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
    )


def _parse_ppm(raw: bytes):
    """Decode a binary PPM (P6, maxval 255) into an (h, w, 3) uint8
    numpy array — the zero-dependency real-image path (PIL handles the
    compressed formats where installed). Returns None when the bytes
    aren't a well-formed P6."""
    import numpy as np

    if not raw.startswith(b"P6"):
        return None
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        if i >= len(raw):
            return None
        c = raw[i : i + 1]
        if c == b"#":  # comment runs to end of line
            i = raw.find(b"\n", i)
            if i < 0:
                return None
            i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(raw) and not raw[j : j + 1].isspace():
                j += 1
            tokens.append(raw[i:j])
            i = j
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError:
        return None
    if maxval != 255 or w <= 0 or h <= 0:
        return None
    i += 1  # exactly one whitespace byte separates header from pixels
    data = raw[i : i + w * h * 3]
    if len(data) < w * h * 3:
        return None
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3).copy()


def _encode_ppm(arr) -> bytes:
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _bilinear_resize(arr, width: int, height: int):
    """Deterministic bilinear resample of an (h, w, c) uint8 array to
    (height, width, c) in pure numpy (pixel-center alignment, the
    standard align_corners=False convention)."""
    import numpy as np

    src_h, src_w = arr.shape[:2]
    x = (np.arange(width) + 0.5) * (src_w / width) - 0.5
    y = (np.arange(height) + 0.5) * (src_h / height) - 0.5
    x0 = np.clip(np.floor(x).astype(np.int64), 0, src_w - 1)
    y0 = np.clip(np.floor(y).astype(np.int64), 0, src_h - 1)
    x1 = np.clip(x0 + 1, 0, src_w - 1)
    y1 = np.clip(y0 + 1, 0, src_h - 1)
    wx = np.clip(x - x0, 0.0, 1.0)[None, :, None]
    wy = np.clip(y - y0, 0.0, 1.0)[:, None, None]
    a = arr.astype(np.float64)
    top = a[y0][:, x0] * (1.0 - wx) + a[y0][:, x1] * wx
    bot = a[y1][:, x0] * (1.0 - wx) + a[y1][:, x1] * wx
    out = top * (1.0 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("decoded", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("decode_err", T.StringType()),
    ]
)


def decode_media(media: DataFrame) -> DataFrame:
    """Real media decode, degrading per-row instead of failing the job.

    Decoders are soft-imported inside the Arrow batch function (so the
    plan builds on any executor): WAV audio decodes via the stdlib
    ``wave`` module (channels / sample rate / frame count), images via
    PIL when installed (dimensions / bands). A payload whose decoder
    is absent or whose bytes don't parse yields ``decoded=false`` with
    ``decode_err`` — at 100 TB a fraction of corrupt blobs is a
    certainty, and one bad byte string must cost one row, not a stage
    retry storm. Same mapInPandas contract as
    :func:`extract_media_features`: Python crosses the boundary once
    per Arrow batch, never per row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave as wave_mod

        try:
            from PIL import Image as pil_image  # soft dep
        except ImportError:
            pil_image = None

        def one(mtype: str, raw) -> dict:
            out = dict(
                decoded=False, width=None, height=None, n_channels=None,
                sample_rate=None, n_samples=None, decode_err=None,
            )
            try:
                if raw is None:
                    out["decode_err"] = "null_payload"
                    return out
                raw = bytes(raw)
                if mtype == "audio":
                    with wave_mod.open(io.BytesIO(raw)) as w:
                        out.update(
                            decoded=True,
                            n_channels=w.getnchannels(),
                            sample_rate=w.getframerate(),
                            n_samples=w.getnframes(),
                        )
                elif mtype == "image":
                    if pil_image is not None:
                        with pil_image.open(io.BytesIO(raw)) as im:
                            out.update(
                                decoded=True,
                                width=im.width,
                                height=im.height,
                                n_channels=len(im.getbands()),
                            )
                    else:
                        arr = _parse_ppm(raw)
                        if arr is not None:
                            out.update(
                                decoded=True,
                                width=arr.shape[1],
                                height=arr.shape[0],
                                n_channels=arr.shape[2],
                            )
                        else:
                            out["decode_err"] = "decoder_unavailable: PIL (non-PPM image)"
                else:
                    out["decode_err"] = "decoder_unavailable: ffmpeg"
            except Exception as exc:  # corrupt payload -> one bad row
                out["decode_err"] = f"{type(exc).__name__}: {exc}"[:200]
            return out

        for pdf in it:
            # id/bytes coercion stays inside the per-row guard path:
            # a NULL content or NULL id must cost one row, not the batch
            recs = [
                {
                    "doc_id": None if pd.isna(d) else int(d),
                    "media_type": m,
                    **one(m, c),
                }
                for d, m, c in zip(pdf["doc_id"], pdf["media_type"], pdf["content"])
            ]
            yield pd.DataFrame.from_records(recs, columns=[f.name for f in DECODE_SCHEMA])

    return media.mapInPandas(batches, DECODE_SCHEMA)


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary content.

    Python executes once per Arrow batch (mapInPandas), not per row;
    features are pure functions of the bytes so the DuckDB oracle can
    recompute them (md5 of the payload; fake dimensions =
    md5-prefix mod 1024 + 1)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # NULL payload -> NULL features (one row, not a task crash);
            # mirrors SQL semantics where md5(NULL)/octet_length(NULL)
            # are NULL
            digests = [
                None if b is None else hashlib.md5(b).hexdigest()
                for b in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    # per-row id guard: astype('int64') on a column
                    # containing None crashes the whole task
                    "doc_id": [
                        None if pd.isna(d) else int(d) for d in pdf["doc_id"]
                    ],
                    "media_type": pdf["media_type"],
                    "byte_len": [
                        None if b is None else len(b) for b in pdf["content"]
                    ],
                    "content_md5": digests,
                    "fake_width": [
                        None if d is None else int(d[:4], 16) % 1024 + 1
                        for d in digests
                    ],
                    "fake_height": [
                        None if d is None else int(d[4:8], 16) % 1024 + 1
                        for d in digests
                    ],
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized_bytes", T.BinaryType()),
        T.StructField("resized_md5", T.StringType()),
        T.StructField("resized_len", T.IntegerType()),
    ]
)


def resize_media(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Image resize: image rows -> (doc_id, width, height, resized
    payload, md5, length). Decodable payloads are REALLY resampled:
    PIL (soft-imported) handles compressed formats, bilinear to
    (width, height) re-encoded as PNG; binary PPM (P6) decodes and
    bilinear-resamples in pure numpy with no dependency at all. Rows
    whose bytes match no decoder degrade per-row to the deterministic
    md5-chain stand-in (payload = md5(content:WxH) hex chain tiled to
    width*height/256 bytes) exactly like :func:`decode_media`
    degrades — one bad blob costs one row's fidelity, never the stage.

    Scale: executor-local mapInPandas (no shuffle); output bytes per
    row are bounded by the target dims regardless of source size, so
    a resize stage *shrinks* the data in flight — run it before any
    shuffle of media rows, never after."""
    target_len = width * height // 256 + 1
    suffix = f":{width}x{height}".encode()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        try:
            from PIL import Image as pil_image  # soft dep, like decode_media
        except ImportError:
            pil_image = None

        def one(raw: bytes) -> bytes:
            if pil_image is not None:
                try:
                    with pil_image.open(io.BytesIO(raw)) as im:
                        resized = im.resize(
                            (width, height), pil_image.Resampling.BILINEAR
                        )
                        buf = io.BytesIO()
                        resized.save(buf, format="PNG")
                        return buf.getvalue()
                except Exception:
                    pass  # not PIL-decodable -> try PPM, then stand-in
            arr = _parse_ppm(raw)
            if arr is not None:
                return _encode_ppm(_bilinear_resize(arr, width, height))
            ch = hashlib.md5(raw + suffix).hexdigest()
            return (ch * (target_len // 32 + 1))[:target_len].encode()

        for pdf in it:
            # nothing to resize for a NULL payload: skip the row
            keep = pdf[(pdf["media_type"] == "image") & pdf["content"].notna()]
            payloads = [one(bytes(c)) for c in keep["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": [
                        None if pd.isna(d) else int(d) for d in keep["doc_id"]
                    ],
                    "width": width,
                    "height": height,
                    "resized_bytes": payloads,
                    "resized_md5": [hashlib.md5(p).hexdigest() for p in payloads],
                    "resized_len": [len(p) for p in payloads],
                }
            )

    return media.mapInPandas(batches, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled
    frame (doc_id, frame_idx, synthetic timestamp, frame payload,
    md5). The 1->N row fan-out, schema contract, and Arrow batch
    shape are the production plumbing; the decoder is the
    deterministic stand-in (frame i = the i-th of n_frames byte
    slices of the payload — a real implementation puts ffmpeg
    keyframe extraction in its place, same signature).

    Scale: mapInPandas keeps the fan-out executor-local (no shuffle);
    output size is bounded by n_frames x input partition size, and
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak
    memory per Arrow batch.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame_ts_ms": [],
                "frame_bytes": [], "frame_md5": [],
            }
            for doc_id, mtype, content in zip(
                pdf["doc_id"], pdf["media_type"], pdf["content"]
            ):
                if mtype != "video" or content is None or len(content) == 0:
                    continue
                # null-id guard matches decode_media/extract_media_features:
                # int(NaN) would kill the task, not the row
                did = None if pd.isna(doc_id) else int(doc_id)
                step = max(len(content) // n_frames, 1)
                for i in range(min(n_frames, len(content))):
                    frame = bytes(content[i * step : (i + 1) * step])
                    rows["doc_id"].append(did)
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(i * 1000)
                    rows["frame_bytes"].append(frame)
                    rows["frame_md5"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, FRAME_SCHEMA)
