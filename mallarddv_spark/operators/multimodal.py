"""Multimodal-column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs, processed by Arrow-batched Pandas UDFs.

The Spark-side architecture is fully real — schemas, partitioning, UDF
signatures, batch shapes, metadata propagation. Decoding has three tiers:

1. **header parsing (real, stdlib-only)**: PNG/JPEG/GIF/BMP dimensions and
   WAV sample-rate/channels/duration are parsed from the payload bytes with
   ``struct`` — no image library needed, ``decode_ok='ok'``;
2. **full decode (import-gated)**: when PIL / soundfile are installed the
   kernel upgrades to them automatically for formats the header sniffer
   does not know;
3. **stub (flagged)**: anything else returns ``decode_ok='stubbed'`` with
   deterministic fake dimensions — never silently pretending.

Scale notes (100 TB of media):
* payloads ≤ a few MB live inline in the table; larger objects are stored
  as URI + byte-range references (:func:`external_reference`) or chunked
  rows (:func:`chunk_payload`) — parquet/Spark cap a single binary cell at
  2 GB and huge cells wreck row-group sizing either way;
* the *metadata* columns are what queries filter on, so wide scans prune
  to metadata-only column groups (parquet column pruning);
* decode/feature-extraction runs in ``mapInPandas`` — one Python worker per
  partition, Arrow-batched, with ``maxRecordsPerBatch`` bounding memory;
* never ``collect()`` media to the driver.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # pragma: no cover - container has no PIL; exercised where installed
    import io

    from PIL import Image as _PILImage
except ImportError:
    _PILImage = None

#: canonical media-column schema: payload + typed metadata. ``payload`` is
#: NULL when the object lives externally (then ``storage_uri`` +
#: ``byte_offset``/``byte_len`` describe the range to fetch).
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("mime_type", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("byte_len", LongType(), True),
        StructField("content_md5", StringType(), True),
        StructField("storage_uri", StringType(), True),
        StructField("byte_offset", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("modality", StringType(), False),
        StructField("byte_len", LongType(), True),
        StructField("content_md5", StringType(), True),
        # image/video
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        # audio
        StructField("sample_rate", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("codec", StringType(), True),
        StructField("decode_ok", StringType(), True),  # ok|stubbed|error
    ]
)


def attach_media_metadata(
    df: DataFrame, id_col: str, payload_col: str, modality: str, mime: str | None = None
) -> DataFrame:
    """Wrap a raw binary column in the canonical media schema — metadata
    (length, content hash) computed JVM-side, payload untouched."""
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.lit(mime).alias("mime_type"),
        F.col(payload_col).alias("payload"),
        F.length(payload_col).cast("long").alias("byte_len"),
        F.md5(payload_col).alias("content_md5"),
        F.lit(None).cast("string").alias("storage_uri"),
        F.lit(None).cast("long").alias("byte_offset"),
    )


def external_reference(
    df: DataFrame,
    id_col: str,
    uri_col: str,
    modality: str,
    byte_offset_col: str | None = None,
    byte_len_col: str | None = None,
    mime: str | None = None,
) -> DataFrame:
    """Media rows whose payload lives in object storage: URI + byte-range,
    NULL inline payload. The layout for objects beyond parquet's 2 GB
    binary-cell cap (and anything big enough to wreck row-group sizing);
    fetch happens inside the decode worker, not the driver."""
    off = F.col(byte_offset_col) if byte_offset_col else F.lit(0)
    ln = F.col(byte_len_col) if byte_len_col else F.lit(None)
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.lit(mime).alias("mime_type"),
        F.lit(None).cast("binary").alias("payload"),
        ln.cast("long").alias("byte_len"),
        F.lit(None).cast("string").alias("content_md5"),
        F.col(uri_col).cast("string").alias("storage_uri"),
        off.cast("long").alias("byte_offset"),
    )


def chunk_payload(
    df: DataFrame, id_col: str, payload_col: str, chunk_bytes: int = 32 * 1024 * 1024
) -> DataFrame:
    """Split big payloads into ordered chunk rows
    (media_id, chunk_idx, n_chunks, chunk) — JVM-side ``substring`` on
    binary, no Python. Reassembly is an ``array_agg`` ordered by chunk_idx
    (or a ranged read of the chunks needed). Keeps row groups bounded when
    payloads approach the 2 GB cell cap."""
    n = F.ceil(F.length(payload_col) / F.lit(chunk_bytes)).cast("int")
    return (
        df.select(
            F.col(id_col).cast("string").alias("media_id"),
            F.col(payload_col).alias("__p"),
            F.greatest(n, F.lit(1)).alias("n_chunks"),
        )
        .select(
            "media_id",
            "n_chunks",
            F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_idx"),
            F.col("__p"),
        )
        .select(
            "media_id",
            "chunk_idx",
            "n_chunks",
            F.expr(
                f"substring(__p, chunk_idx * {chunk_bytes}L + 1, {chunk_bytes}L)"
            ).alias("chunk"),
        )
    )


def assemble_chunks(chunks: DataFrame) -> DataFrame:
    """Reassemble :func:`chunk_payload` output into (media_id, payload).
    One shuffle on media_id; ``concat`` of the ordered chunk array is
    JVM-side."""
    return (
        chunks.groupBy("media_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("chunk_idx", "chunk"))
            ).alias("ordered")
        )
        .select(
            "media_id",
            F.expr(
                "aggregate(ordered, cast(X'' as binary), (acc, c) -> concat(acc, c.chunk))"
            ).alias("payload"),
        )
    )


# ---------------------------------------------------------------------------
# decode kernels
# ---------------------------------------------------------------------------


def _png_dims(b: bytes) -> tuple[int, int] | None:
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return w, h
    return None


def _gif_dims(b: bytes) -> tuple[int, int] | None:
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return w, h
    return None


def _bmp_dims(b: bytes) -> tuple[int, int] | None:
    if len(b) >= 26 and b[:2] == b"BM":
        w, h = struct.unpack("<ii", b[18:26])
        return abs(w), abs(h)
    return None


def _jpeg_dims(b: bytes) -> tuple[int, int] | None:
    """Walk JPEG segments to the first SOF marker (C0-CF minus C4/C8/CC)."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 9 < len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", b[i + 5 : i + 9])
            return w, h
        i += 2 + seg_len
    return None


def _wav_meta(b: bytes) -> dict | None:
    """RIFF/WAVE fmt chunk: channels, sample rate; data chunk: duration."""
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i = 12
    channels = rate = bits = None
    data_len = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        clen = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= len(b):
            channels, rate = struct.unpack("<HI", b[i + 10 : i + 16])
            bits = struct.unpack("<H", b[i + 22 : i + 24])[0]
        elif cid == b"data":
            data_len = clen
        i += 8 + clen + (clen % 2)
    if channels is None or rate is None:
        return None
    dur = None
    if data_len is not None and bits and channels and rate:
        dur = int(data_len * 8_000 / (bits * channels * rate))
    return {
        "sample_rate": int(rate),
        "channels": int(channels),
        "duration_ms": dur,
        "codec": "pcm",
    }


def decode_media(payload: bytes | None, modality: str) -> dict:
    """Best-effort real decode of one payload.

    Tier 1: stdlib header parsing (PNG/JPEG/GIF/BMP dims, WAV audio meta) —
    ``decode_ok='ok'``. Tier 2: PIL when installed (full image decode,
    covers formats tier 1 does not). Tier 3: deterministic fake derived
    from the content hash, flagged ``decode_ok='stubbed'`` (this container
    ships no media libraries; video parsing — ffmpeg/PyAV — is always
    tier 3 here).
    """
    out = {
        "width": None, "height": None, "n_frames": None,
        "sample_rate": None, "channels": None, "duration_ms": None,
        "codec": None, "decode_ok": "stubbed",
    }
    b = payload or b""
    if modality == "image":
        for sniff, codec in (
            (_png_dims, "png"), (_jpeg_dims, "jpeg"),
            (_gif_dims, "gif"), (_bmp_dims, "bmp"),
        ):
            dims = sniff(b)
            if dims:
                out.update(width=dims[0], height=dims[1], n_frames=1,
                           codec=codec, decode_ok="ok")
                return out
        if _PILImage is not None:  # pragma: no cover - no PIL in container
            try:
                img = _PILImage.open(io.BytesIO(b))
                out.update(width=img.width, height=img.height, n_frames=1,
                           codec=(img.format or "").lower(), decode_ok="ok")
                return out
            except Exception:
                out["decode_ok"] = "error"
                return out
    elif modality == "audio":
        meta = _wav_meta(b)
        if meta:
            out.update(meta, decode_ok="ok")
            return out
    # tier 3: deterministic fake (content-hash derived), clearly flagged
    h = hashlib.md5(b).digest()
    if modality in ("image", "video"):
        out.update(width=64 + h[0] % 192, height=64 + h[1] % 192)
    if modality in ("video", "audio"):
        out.update(n_frames=1 + h[2] % 300)
    else:
        out["n_frames"] = 1
    return out


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow-batched).

    The partition-iterator shape is the real production pattern: the worker
    streams record batches, decodes each payload (:func:`decode_media` —
    real header parsing, PIL when present, flagged stub otherwise), emits a
    narrow feature frame."""
    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_media(p, m)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "modality", pdf["modality"].values)
            out.insert(2, "byte_len", pdf["byte_len"].values)
            out.insert(3, "content_md5", pdf["content_md5"].values)
            yield out[[f.name for f in FEATURE_SCHEMA.fields]]

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB: image resize. Real kernel: PIL ``Image.resize`` inside the same
    mapInPandas shape as :func:`extract_features`; here payloads pass
    through and the target dims are recorded (schema/plumbing exercised)."""
    return media.withColumn("target_width", F.lit(width)).withColumn(
        "target_height", F.lit(height)
    )


def sample_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """STUB: video frame sampling — records the sampling spec; the ffmpeg
    kernel slots into the mapInPandas pattern above."""
    return media.withColumn("frame_stride", F.lit(every_n))


def write_webdataset_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    media_col: str,
    meta_cols: list[str] | None = None,
    n_shards: int = 8,
    ext: str = "bin",
) -> dict:
    """Export a multimodal corpus as WebDataset-style tar shards —
    ``shard-00000.tar`` … each holding, per sample, a ``{key}.{ext}``
    member with the binary payload and a ``{key}.json`` member with the
    metadata columns (the img2dataset / WebDataset pairing convention
    multimodal training loaders stream directly).

    Layout & determinism: samples hash to shards by id (stable under
    corpus growth — the ``split_assign`` discipline), order ``key``
    ascending inside a shard, and every tar member is written with
    zeroed mtime/uid/gid — two runs over the same data produce
    byte-identical archives. Each shard is written by exactly ONE task
    (rows repartition by shard id) to a temp name and atomically
    ``os.replace``d, so a retried task overwrites cleanly. A
    ``manifest.json`` is written LAST from a read-back header scan of
    the tars (counts certify the bytes on disk, not the plan), so its
    presence marks a complete export.

    Filesystem contract: the writer runs in plain Python on executors
    (tar assembly is byte I/O, not compute) and opens ``path`` through
    POSIX — local disks, NFS, or FUSE-mounted object stores. For
    HDFS/S3-native output use the parquet/JSONL trainer shards
    (``textops.write_training_shards``); tar is specifically the
    multimodal interchange format.

    Scale shape: one hash shuffle on the shard id; payload bytes
    stream from the scan through the tar writer without driver
    involvement; the manifest pass reads tar HEADERS only.
    """
    import glob
    import json
    import os

    from mallarddv_spark.exceptions import DVConfigurationError

    if int(n_shards) < 1:
        raise DVConfigurationError(
            "write_webdataset_shards: n_shards must be >= 1"
        )
    if os.path.exists(os.path.join(path, "manifest.json")):
        raise DVConfigurationError(
            f"write_webdataset_shards: {path} already holds a completed "
            "export (manifest.json present)"
        )
    metas = list(meta_cols or [])
    os.makedirs(path, exist_ok=True)
    # A prior ABORTED export (no manifest, so the guard above passes)
    # may have left shard tars — possibly from a run with a different
    # n_shards — that a post-write glob would silently count into this
    # run's manifest. Refuse to certify over them; orphaned .tmp-* files
    # from failed task attempts were never renamed live and are safe to
    # sweep.
    stale = sorted(glob.glob(os.path.join(path, "shard-*.tar")))
    if stale:
        raise DVConfigurationError(
            "write_webdataset_shards: target holds "
            f"{len(stale)} shard tar(s) from an aborted export with no "
            f"manifest (e.g. {os.path.basename(stale[0])}); remove them "
            "or export to a fresh directory"
        )
    for orphan in glob.glob(os.path.join(path, "*.tmp-*")):
        os.remove(orphan)
    shard = F.pmod(
        F.xxhash64(F.col(id_col).cast("string")), F.lit(int(n_shards))
    ).cast("int")
    rows = df.select(
        shard.alias("__shard"),
        F.col(id_col).cast("string").alias("__key"),
        F.col(media_col).alias("__payload"),
        *[F.col(c) for c in metas],
    ).repartition(int(n_shards), "__shard").sortWithinPartitions(
        "__shard", "__key"
    )
    ext_name = str(ext)
    target = str(path)

    def _write(it):
        import io
        import tarfile

        from pyspark import TaskContext

        attempt = TaskContext.get().taskAttemptId()
        tf, cur, tmp = None, None, None

        def _close():
            nonlocal tf, tmp
            if tf is not None:
                tf.close()
                final = tmp[: tmp.rindex(".tmp-")]
                os.replace(tmp, final)
                tf, tmp = None, None

        def _add(name, data):
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tf.addfile(info, io.BytesIO(data))

        for r in it:
            if r["__shard"] != cur:
                _close()
                cur = r["__shard"]
                final = os.path.join(target, f"shard-{cur:05d}.tar")
                tmp = f"{final}.tmp-{attempt}"
                tf = tarfile.open(tmp, "w")
            payload = bytes(r["__payload"]) if r["__payload"] is not None else b""
            _add(f"{r['__key']}.{ext_name}", payload)
            meta = {c: r[c] for c in metas}
            _add(
                f"{r['__key']}.json",
                json.dumps(meta, sort_keys=True, default=str).encode("utf-8"),
            )
        _close()

    rows.foreachPartition(_write)
    # sweep .tmp-* leftovers from failed task attempts of THIS run (a
    # retried task's successful attempt already renamed its tar live)
    for orphan in glob.glob(os.path.join(path, "*.tmp-*")):
        os.remove(orphan)
    # certify by reading back tar HEADERS; manifest written last
    import tarfile as _tarfile

    shards = []
    for tar_path in sorted(glob.glob(os.path.join(path, "shard-*.tar"))):
        with _tarfile.open(tar_path, "r") as tf:
            members = tf.getmembers()
        n_bytes = os.path.getsize(tar_path)
        shards.append({
            "shard": os.path.basename(tar_path),
            "n_samples": sum(1 for m in members
                             if m.name.endswith(f".{ext_name}")),
            "n_members": len(members),
            "bytes": int(n_bytes),
        })
    manifest = {
        "format": "webdataset",
        "ext": ext_name,
        "meta_cols": metas,
        "n_shards": len(shards),
        "total_samples": int(sum(s["n_samples"] for s in shards)),
        "shards": shards,
    }
    with open(os.path.join(path, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2)
    return manifest
