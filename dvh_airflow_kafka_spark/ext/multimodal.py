"""[EXT] Multimodal binary-column operators.

Convention for media at scale: image/audio/video payloads are opaque
``binary`` columns plus typed metadata columns — parquet stores them
page-compressed, Spark moves them as byte arrays, and every operator
below treats content as bytes (never decodes media on the JVM).

Three layers:

1. **Byte-level ops (pure Column expressions, scan-fused, the 100 TB
   path)**: MIME sniffing from magic bytes, size/fingerprint stats,
   exact blob dedup. These run in whole-stage codegen directly on the
   parquet scan — no Python, no decode.
2. **Signature near-dup**: a SimHash over content byte 4-grams (the
   perceptual-hash *shape*: linear scan → 64-bit signature → pigeonhole
   banding equi-join; a real pHash would replace the gram-hash with a
   DCT over decoded pixels — same plan, different kernel).
3. **Decode plumbing (`decode_media`)**: Arrow-batched ``mapInPandas``
   with an injectable per-blob decoder. The image/audio libraries are
   NOT in this container, so the default decoder raises
   ``NotImplementedError`` — the Spark-side contract (schema, batch
   iteration, partition inheritance) is real and tested with a
   deterministic fake decoder.

The test corpus is synthesized deterministically from ``documents.text``
(``synth_blob_frame``): a real magic-byte prefix per modality + the
utf-8 text bytes, so MIME sniffing exercises actual byte matching and
every operator has a DuckDB-expressible oracle.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Real magic-byte signatures (public file-format specs).
MAGIC_BYTES: dict[str, bytes] = {
    "image/jpeg": b"\xff\xd8\xff",
    "image/png": b"\x89PNG\r\n\x1a\n",
    "audio/wav": b"RIFF",
    "application/octet-stream": b"",
}
_MODALITIES = list(MAGIC_BYTES)


def synth_blob_frame(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic synthetic media table: (id, content binary). Modality
    cycles with ``id % 4``; content = magic prefix + utf-8 text bytes."""
    mod = F.pmod(F.col(id_col), F.lit(len(_MODALITIES)))
    prefix = F.when(mod == 0, F.lit(MAGIC_BYTES["image/jpeg"]))
    for i, m in enumerate(_MODALITIES[1:], start=1):
        prefix = prefix.when(mod == i, F.lit(MAGIC_BYTES[m]))
    content = F.concat(prefix, F.col(text_col).cast("binary"))
    return docs.select(F.col(id_col), content.alias("content"))


def detect_mime(content: Column) -> Column:
    """Magic-byte MIME sniff — longest-prefix match, pure codegen.
    Kept in lockstep with the Python-side ``_sniff`` (same prefixes,
    same offset-4 ftyp rule for ISO BMFF)."""
    # MP4/ISO-BMFF is identified at offset 4 (box size varies), not by
    # prefix — lowest priority so real prefixes win
    out = F.when(
        F.substring(content, 5, 4) == F.lit(b"ftyp"), F.lit("video/mp4")
    ).otherwise(F.lit("application/octet-stream"))
    for mime, magic in sorted(
        MAGIC_BYTES.items(), key=lambda kv: len(kv[1])
    ):
        if not magic:
            continue
        out = F.when(
            F.substring(content, 1, len(magic)) == F.lit(magic), F.lit(mime)
        ).otherwise(out)
    return out


def blob_fingerprint(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """Per-blob identity row: sha-256 fingerprint (over the hex rendering,
    so engines without blob hashing can verify), byte size, sniffed MIME.
    One narrow projection fused into the scan."""
    c = F.col(content_col)
    return df.select(
        F.col(id_col),
        F.sha2(F.hex(c).cast("binary"), 256).alias("fingerprint"),
        F.length(c).cast("long").alias("size_bytes"),
        detect_mime(c).alias("mime"),
    )


def blob_mime_stats(
    df: DataFrame, content_col: str = "content"
) -> DataFrame:
    """Corpus shape by modality: count / total / mean bytes per MIME.
    One shuffle over ≤ |MIME types| groups, map-side combined."""
    c = F.col(content_col)
    return (
        df.select(detect_mime(c).alias("mime"), F.length(c).alias("sz"))
        .groupBy("mime")
        .agg(
            F.count(F.lit(1)).alias("n_blobs"),
            F.sum("sz").cast("long").alias("total_bytes"),
        )
        # exact-integer double division is correctly rounded IEEE — the
        # same bits on every engine, unlike a rounded avg() of doubles
        .withColumn(
            "avg_bytes", F.col("total_bytes").cast("double") / F.col("n_blobs")
        )
    )


def blob_exact_dedup(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """Exact duplicate blobs: hash-groupBy on the content fingerprint
    (one shuffle keyed by sha-256; map-side partial agg)."""
    return (
        blob_fingerprint(df, id_col, content_col)
        .groupBy("fingerprint")
        .agg(
            F.min(F.col(id_col)).alias("survivor_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _splitmix64(x: "np.ndarray") -> "np.ndarray":
    """Vectorized SplitMix64 finalizer (public-domain mixing constants) —
    a well-distributed 64-bit hash of each uint64 lane, wrapping mod 2^64
    like the reference C implementation."""
    import numpy as np

    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def blob_simhash_signature(gram_bytes: int = 4, max_bytes: int = 4096):
    """Scalar Arrow pandas UDF: binary content → 64-bit SimHash long.

    Per blob, entirely in numpy: ``sliding_window_view`` strides the raw
    bytes into overlapping ``gram_bytes``-grams (zero-copy views), each
    gram packs into one uint64, SplitMix64 mixes it, and the 64 bit-votes
    reduce to the signature — ~3 vectorized passes over a ≤``max_bytes``
    window, no per-gram Python. Replaces a former ``transform(sequence(…))``
    higher-order expression that fell out of codegen into ~max_bytes
    interpreted lambda evaluations per row.

    ``max_bytes`` caps the signature window (first N bytes): per-blob cost
    is O(max_bytes) regardless of blob size — the same move as sampling
    frames from a video before hashing."""
    import numpy as np

    shifts = np.arange(64, dtype=np.uint64)

    @F.pandas_udf("long")
    def sim(content: pd.Series) -> pd.Series:
        out = np.zeros(len(content), dtype=np.int64)
        for i, blob in enumerate(content):
            if blob is None:
                continue
            a = np.frombuffer(bytes(blob)[:max_bytes], dtype=np.uint8)
            if a.size == 0:
                continue
            if a.size < gram_bytes:
                w = a[None, :]  # one short gram — mirrors substring clamp
            else:
                w = np.lib.stride_tricks.sliding_window_view(a, gram_bytes)
            g = w.astype(np.uint64)
            packed = np.zeros(g.shape[0], dtype=np.uint64)
            for b in range(g.shape[1]):
                packed = (packed << np.uint64(8)) | g[:, b]
            h = _splitmix64(packed)
            # bit matrix via unpackbits (uint8 lanes — ~6× cheaper than a
            # uint64 broadcast); little bitorder makes column i == bit i.
            bits = np.unpackbits(h.view(np.uint8), bitorder="little").reshape(-1, 64)
            # signed accumulator: a uint64 vote sum would wrap negatives
            votes = 2 * bits.sum(axis=0, dtype=np.int64) - np.int64(h.size)
            sig = np.bitwise_or.reduce((votes > 0).astype(np.uint64) << shifts)
            out[i] = sig.astype(np.int64)
        return pd.Series(out)

    return sim


def blob_simhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    gram_bytes: int = 4,
    max_hamming: int = 3,
    max_bytes: int = 4096,
) -> DataFrame:
    """Perceptual-hash-style near-dup: 64-bit SimHash over sliding byte
    n-grams → pigeonhole banding equi-join (hamming ≤ d ⇒ some chunk of
    d+1 equal) → exact hamming verify. Same candidate shape as
    ``dedup.simhash_near_duplicates`` — bucketed equi-join, never
    all-pairs.

    Signatures come from one Arrow-batched pandas UDF
    (:func:`blob_simhash_signature`) — a single linear scan emitting
    (id, simhash) with NO explode and NO groupBy shuffle (the text path
    shuffles token votes; bytes don't need to: the whole vote aggregation
    is a numpy reduction inside the scan). The only shuffle left is the
    band join itself."""
    from dvh_airflow_kafka_spark.ext.dedup import simhash_band_pairs
    from dvh_airflow_kafka_spark.io import ensure_parallelism

    sim = blob_simhash_signature(gram_bytes, max_bytes)
    sigs = ensure_parallelism(df).select(
        F.col(id_col), sim(F.col(content_col)).alias("simhash")
    )
    return simhash_band_pairs(sigs, id_col, max_hamming=max_hamming)


def synth_wav_frame(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic WAV corpus: (id, content binary) where each blob is a
    REAL 16-bit PCM WAV container — sample rate cycles 8000/16000/44100
    with ``id % 3``, channels = 1 + ``id % 2``, and the frame count is the
    document's character count (so expected metadata is pure arithmetic an
    oracle can recompute without parsing bytes). Sample data is silence;
    the header/layout is spec-exact, which is what the decode kernel
    parses."""
    import struct as _struct

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    rates = [8000, 16000, 44100]

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                rid = int(rid)
                rate = rates[rid % 3]
                channels = 1 + rid % 2
                n_frames = len(text or "")
                block_align = channels * 2  # 16-bit PCM
                data_size = n_frames * block_align
                header = (
                    b"RIFF"
                    + _struct.pack("<L", 36 + data_size)
                    + b"WAVE"
                    + b"fmt "
                    + _struct.pack(
                        "<LHHLLHH",
                        16, 1, channels, rate, rate * block_align, block_align, 16,
                    )
                    + b"data"
                    + _struct.pack("<L", data_size)
                )
                rows.append({"doc_id": rid, "content": header + b"\x00" * data_size})
            yield pd.DataFrame(rows)

    return docs.mapInPandas(build, schema=out_schema)


def synth_wav_pcm_frame(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic WAV corpus WITH REAL SAMPLE DATA: mono 8 kHz 16-bit
    PCM where sample ``i`` of doc ``d`` is ``((d·131 + i·17) mod 4001) −
    2000`` and the frame count is ``64 + d mod 193`` — all arithmetic in
    the id, so a DSP kernel over the DECODED BYTES (frame energy, peak
    detection) has an oracle that recomputes expectations without ever
    touching the container.  Complements ``synth_wav_frame`` (silence;
    exercises header parsing only)."""
    import struct as _struct

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for rid in pdf[id_col]:
                rid = int(rid)
                n = 64 + rid % 193
                idx = np.arange(n, dtype=np.int64)
                samples = ((rid * 131 + idx * 17) % 4001 - 2000).astype(
                    "<i2"
                )
                data = samples.tobytes()
                header = (
                    b"RIFF"
                    + _struct.pack("<L", 36 + len(data))
                    + b"WAVE"
                    + b"fmt "
                    + _struct.pack(
                        "<LHHLLHH", 16, 1, 1, 8000, 16000, 2, 16
                    )
                    + b"data"
                    + _struct.pack("<L", len(data))
                )
                rows.append({"doc_id": rid, "content": header + data})
            yield pd.DataFrame(rows)

    return docs.mapInPandas(build, schema=out_schema)


def wav_frame_energy(
    blobs: DataFrame,
    *,
    id_col: str = "doc_id",
    content_col: str = "content",
    block: int = 64,
) -> DataFrame:
    """REAL audio DSP over binary blobs: parse each WAV container (the
    same stdlib RIFF walk as ``decode_wav_header``), reinterpret the
    ``data`` chunk as little-endian int16 PCM, and emit per-``block``-
    sample energy ``Σ s²`` as an exact int64 — the framing/VAD
    pre-filter an audio-curation pipeline runs before any model sees a
    clip (silence trimming, clipping detection, loudness bucketing).

    Arrow-batched ``mapInPandas`` with numpy vectorization inside the
    batch — the canonical shape for media kernels Spark's built-ins
    cannot express: the scan stays columnar, Python touches each blob
    once, output is a narrow typed frame.  Integer energies make the
    kernel oracle-checkable bit-for-bit.  Partition inheritance: no
    shuffle is introduced; at 100 TB this runs as a map-only pass over
    the blob store scan."""
    import struct as _struct

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("block_idx", T.IntegerType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("energy", T.LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out: dict = {"doc_id": [], "block_idx": [], "n_samples": [], "energy": []}
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                content = bytes(content)
                if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
                    raise ValueError(f"doc {rid}: not a RIFF/WAVE container")
                pos, data = 12, None
                while pos + 8 <= len(content):
                    cid = content[pos : pos + 4]
                    (csize,) = _struct.unpack("<L", content[pos + 4 : pos + 8])
                    if cid == b"data":
                        data = content[pos + 8 : pos + 8 + csize]
                    pos += 8 + csize + (csize & 1)
                if data is None:
                    raise ValueError(f"doc {rid}: missing data chunk")
                samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
                n = len(samples)
                for b0 in range(0, n, block):
                    seg = samples[b0 : b0 + block]
                    out["doc_id"].append(int(rid))
                    out["block_idx"].append(b0 // block)
                    out["n_samples"].append(len(seg))
                    out["energy"].append(int((seg * seg).sum()))
            yield pd.DataFrame(out)

    return blobs.mapInPandas(kernel, schema=out_schema)


# --------------------------------------------------------------------------
# Decode plumbing — WAV decodes for real (stdlib); image/video kernels are
# injectable (their libraries are not in this container)
# --------------------------------------------------------------------------

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def decode_wav_header(content: bytes) -> dict:
    """Real, stdlib-only WAV (RIFF) metadata decode: walk the chunk list,
    parse the ``fmt `` chunk (PCM layout: audio format, channels, sample
    rate, block align — WAVE spec, little-endian), and size the ``data``
    chunk into a frame count. Returns {sample_rate, channels, n_frames,
    duration_ms}. Raises ValueError on a malformed container."""
    import struct as _struct

    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        (csize,) = _struct.unpack("<L", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + csize]
        if cid == b"fmt " and csize >= 16:
            _, channels, sample_rate, _, block_align, _ = _struct.unpack(
                "<HHLLHH", body[:16]
            )
            fmt = (channels, sample_rate, block_align)
        elif cid == b"data":
            data_size = csize
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        raise ValueError("missing fmt/data chunk")
    channels, sample_rate, block_align = fmt
    n_frames = data_size // block_align if block_align else 0
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // sample_rate if sample_rate else 0,
    }


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# IHDR color type -> sample channels (PNG spec, table 11.1)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def synth_png_frame(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic PNG corpus: (id, content binary) where each blob is
    a REAL, fully valid PNG — signature, CRC-checked IHDR, one zlib IDAT
    of zero scanlines, IEND. Dimensions and color type are arithmetic in
    the id (width = 8 + id%16, height = 8 + (id·7)%16, color type cycles
    gray/RGB/RGBA with id%3) so the expected metadata is oracle-
    recomputable without parsing bytes."""
    import struct as _struct
    import zlib as _zlib

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    color_types = [0, 2, 6]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            _struct.pack(">L", len(body))
            + ctype
            + body
            + _struct.pack(">L", _zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for rid in pdf[id_col]:
                rid = int(rid)
                w = 8 + rid % 16
                h = 8 + (rid * 7) % 16
                ct = color_types[rid % 3]
                ihdr = _struct.pack(">LLBBBBB", w, h, 8, ct, 0, 0, 0)
                raw = (b"\x00" + b"\x00" * (w * _PNG_CHANNELS[ct])) * h
                rows.append(
                    {
                        "doc_id": rid,
                        "content": _PNG_SIG
                        + chunk(b"IHDR", ihdr)
                        + chunk(b"IDAT", _zlib.compress(raw, 6))
                        + chunk(b"IEND", b""),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select(id_col).mapInPandas(build, schema=out_schema)


def synth_png_pixels_frame(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic PNG corpus WITH REAL PIXEL DATA: 8-bit grayscale,
    width = 8 + id%16, height = 8 + (id·7)%16, pixel(r, c) =
    ``(id·31 + r·17 + c·7) mod 251`` — a fully valid container (CRC'd
    IHDR, zlib IDAT of filter-0 scanlines, IEND) whose DECODED pixels
    are arithmetic in the id, so an image kernel over the decompressed
    bytes has an oracle that recomputes expectations without touching
    the container.  Complements ``synth_png_frame`` (zero scanlines;
    exercises header parsing only)."""
    import struct as _struct
    import zlib as _zlib

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            _struct.pack(">L", len(body))
            + ctype
            + body
            + _struct.pack(">L", _zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for rid in pdf[id_col]:
                rid = int(rid)
                w = 8 + rid % 16
                h = 8 + (rid * 7) % 16
                rr, cc = np.meshgrid(
                    np.arange(h, dtype=np.int64),
                    np.arange(w, dtype=np.int64),
                    indexing="ij",
                )
                px = ((rid * 31 + rr * 17 + cc * 7) % 251).astype(np.uint8)
                raw = b"".join(
                    b"\x00" + px[r].tobytes() for r in range(h)
                )
                ihdr = _struct.pack(">LLBBBBB", w, h, 8, 0, 0, 0, 0)
                rows.append(
                    {
                        "doc_id": rid,
                        "content": _PNG_SIG
                        + chunk(b"IHDR", ihdr)
                        + chunk(b"IDAT", _zlib.compress(raw, 6))
                        + chunk(b"IEND", b""),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select(id_col).mapInPandas(build, schema=out_schema)


def png_tile_checksum(
    blobs: DataFrame,
    *,
    id_col: str = "doc_id",
    content_col: str = "content",
    tile: int = 8,
) -> DataFrame:
    """REAL image decode + tiling over binary blobs: walk the PNG chunk
    list, zlib-DECOMPRESS the IDAT stream (a real codec, stdlib), strip
    the per-scanline filter bytes (filter 0 only — raised otherwise),
    and reduce the grayscale pixel grid to per-``tile``×``tile`` sums
    and maxima as exact integers — the thumbnail-energy / blank-region
    / near-black pre-filter an image-curation pipeline runs before any
    vision model sees a frame, and the access pattern (decode → tile →
    reduce) of patch-based feature extraction.

    Arrow-batched ``mapInPandas`` with numpy tiling inside — the same
    media-kernel shape as ``wav_frame_energy``: columnar scan in, one
    Python pass per blob, narrow typed frame out, no shuffle introduced.
    Integer outputs make the whole decode path oracle-checkable
    bit-for-bit."""
    import struct as _struct
    import zlib as _zlib

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("tile_row", T.IntegerType()),
            T.StructField("tile_col", T.IntegerType()),
            T.StructField("n_px", T.IntegerType()),
            T.StructField("px_sum", T.LongType()),
            T.StructField("px_max", T.IntegerType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out: dict = {
                "doc_id": [], "tile_row": [], "tile_col": [],
                "n_px": [], "px_sum": [], "px_max": [],
            }
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                content = bytes(content)
                if content[:8] != _PNG_SIG:
                    raise ValueError(f"doc {rid}: bad PNG signature")
                pos, w, h, idat = 8, None, None, b""
                while pos + 12 <= len(content):
                    (clen,) = _struct.unpack(">L", content[pos : pos + 4])
                    ctype = content[pos + 4 : pos + 8]
                    body = content[pos + 8 : pos + 8 + clen]
                    if ctype == b"IHDR":
                        w, h, depth, color_type = _struct.unpack(
                            ">LLBB", body[:10]
                        )
                        if depth != 8 or color_type != 0:
                            raise ValueError(
                                f"doc {rid}: only 8-bit grayscale supported"
                            )
                    elif ctype == b"IDAT":
                        idat += body
                    pos += 12 + clen
                raw = _zlib.decompress(idat)
                stride = w + 1
                mat = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
                if (mat[:, 0] != 0).any():
                    raise ValueError(f"doc {rid}: non-zero scanline filter")
                px = mat[:, 1:].astype(np.int64)
                for tr in range(0, h, tile):
                    for tc in range(0, w, tile):
                        seg = px[tr : tr + tile, tc : tc + tile]
                        out["doc_id"].append(int(rid))
                        out["tile_row"].append(tr // tile)
                        out["tile_col"].append(tc // tile)
                        out["n_px"].append(int(seg.size))
                        out["px_sum"].append(int(seg.sum()))
                        out["px_max"].append(int(seg.max()))
            yield pd.DataFrame(out)

    return blobs.mapInPandas(kernel, schema=out_schema)


def decode_png_header(content: bytes) -> dict:
    """Real, stdlib-only PNG metadata decode: verify the 8-byte
    signature, walk the chunk list, parse IHDR (big-endian width/height,
    bit depth, color type — PNG spec §11.2.2) and VERIFY its CRC-32.
    Raises ValueError on a malformed container or CRC mismatch."""
    import struct as _struct
    import zlib as _zlib

    if len(content) < 8 or content[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    while pos + 12 <= len(content):
        (clen,) = _struct.unpack(">L", content[pos : pos + 4])
        ctype = content[pos + 4 : pos + 8]
        body = content[pos + 8 : pos + 8 + clen]
        (crc,) = _struct.unpack(
            ">L", content[pos + 8 + clen : pos + 12 + clen]
        )
        if ctype == b"IHDR":
            if _zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
                raise ValueError("IHDR CRC mismatch")
            w, h, depth, color_type, _, _, _ = _struct.unpack(">LLBBBBB", body)
            return {
                "width": int(w),
                "height": int(h),
                "bit_depth": int(depth),
                "channels": _PNG_CHANNELS.get(int(color_type)),
            }
        pos += 12 + clen
    raise ValueError("missing IHDR chunk")


_JPEG_SOI = b"\xff\xd8"
# SOF0 baseline, SOF1 extended sequential, SOF2 progressive, SOF3 lossless
_JPEG_SOF_MARKERS = frozenset({0xC0, 0xC1, 0xC2, 0xC3})


def synth_jpeg_frame(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic JPEG corpus: (id, content binary) where each blob
    is a minimal REAL JFIF stream — SOI, APP0 (JFIF 1.1), SOF0 frame
    header carrying the dimensions, EOI. Dimensions and component count
    are arithmetic in the id (width = 8 + id%24, height = 8 + (id·5)%24,
    grayscale/YCbCr with id%2) so the expected metadata is
    oracle-recomputable without parsing bytes."""
    import struct as _struct

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for rid in pdf[id_col]:
                rid = int(rid)
                w = 8 + rid % 24
                h = 8 + (rid * 5) % 24
                nc = (1, 3)[rid % 2]
                app0_body = (
                    b"JFIF\x00"
                    + bytes([1, 1, 0])  # version 1.1, units 0
                    + _struct.pack(">HH", 72, 72)  # aspect ratio
                    + bytes([0, 0])  # no thumbnail
                )
                app0 = b"\xff\xe0" + _struct.pack(">H", 2 + len(app0_body)) + app0_body
                comps = b"".join(bytes([i + 1, 0x11, 0]) for i in range(nc))
                sof_body = (
                    bytes([8]) + _struct.pack(">HH", h, w) + bytes([nc]) + comps
                )
                sof = b"\xff\xc0" + _struct.pack(">H", 2 + len(sof_body)) + sof_body
                rows.append(
                    {
                        "doc_id": rid,
                        "content": _JPEG_SOI + app0 + sof + b"\xff\xd9",
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select(id_col).mapInPandas(build, schema=out_schema)


def decode_jpeg_header(content: bytes) -> dict:
    """Real, stdlib-only JPEG metadata decode: verify the SOI marker and
    walk the segment list (marker, 2-byte big-endian length) to the
    first SOF frame header, extracting sample precision, height, width
    and component count (ITU-T T.81 §B.2.2). Raises ValueError on a
    malformed stream or a stream with no frame header."""
    import struct as _struct

    if len(content) < 4 or content[:2] != _JPEG_SOI:
        raise ValueError("not a JPEG: bad SOI marker")
    pos = 2
    while pos + 2 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError("JPEG marker desync at offset " + str(pos))
        # T.81 §B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes — skip them (real camera/EXIF files pad with these)
        while content[pos + 1] == 0xFF:
            pos += 1
            if pos + 2 > len(content):
                raise ValueError("truncated JPEG fill-byte run")
        marker = content[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # standalone markers
            pos += 2
            continue
        if pos + 4 > len(content):
            raise ValueError("truncated JPEG segment header")
        (seglen,) = _struct.unpack(">H", content[pos + 2 : pos + 4])
        if seglen < 2 or pos + 2 + seglen > len(content):
            raise ValueError("truncated JPEG segment body")
        if marker in _JPEG_SOF_MARKERS:
            body = content[pos + 4 : pos + 2 + seglen]
            if len(body) < 6:
                raise ValueError("short SOF segment")
            precision = body[0]
            h, w = _struct.unpack(">HH", body[1:5])
            nc = body[5]
            return {
                "width": int(w),
                "height": int(h),
                "bit_depth": int(precision),
                "channels": int(nc),
            }
        pos += 2 + seglen
    raise ValueError("missing SOF frame header")


def _mp4_box(btype: bytes, payload: bytes) -> bytes:
    import struct as _struct

    return _struct.pack(">L", 8 + len(payload)) + btype + payload


def synth_mp4_frame(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic MP4 corpus: (id, content binary) where each blob is
    a minimal REAL ISO BMFF container — ftyp, then moov holding an mvhd
    (timescale 1000, duration arithmetic in the id) and a trak/tkhd
    carrying 16.16 fixed-point dimensions. Duration and dimensions are
    arithmetic in the id so the expected metadata is oracle-recomputable
    without parsing bytes."""
    import struct as _struct

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for rid in pdf[id_col]:
                rid = int(rid)
                duration_ms = 1000 + (rid * 37) % 9000
                w = 16 * (1 + rid % 8)
                h = 16 * (1 + (rid * 3) % 8)
                ftyp = _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00")
                mvhd = _mp4_box(
                    b"mvhd",
                    b"\x00\x00\x00\x00"  # version 0 + flags
                    + _struct.pack(">LL", 0, 0)  # ctime, mtime
                    + _struct.pack(">LL", 1000, duration_ms)
                    + b"\x00" * 80,  # rate..next_track_id boilerplate
                )
                tkhd = _mp4_box(
                    b"tkhd",
                    b"\x00\x00\x00\x07"  # version 0 + enabled flags
                    + _struct.pack(">LLLLL", 0, 0, 1, 0, duration_ms)
                    + b"\x00" * 52  # reserved, layer, volume, matrix
                    + _struct.pack(">LL", w << 16, h << 16),
                )
                moov = _mp4_box(b"moov", mvhd + _mp4_box(b"trak", tkhd))
                rows.append({"doc_id": rid, "content": ftyp + moov})
            yield pd.DataFrame(rows)

    return docs.select(id_col).mapInPandas(build, schema=out_schema)


_MP4_CONTAINERS = frozenset({b"moov", b"trak", b"mdia", b"minf", b"stbl"})


def decode_mp4_header(content: bytes) -> dict:
    """Real, stdlib-only MP4/ISO-BMFF metadata decode: verify the leading
    ``ftyp`` box, walk the box tree (4-byte big-endian size + fourcc,
    honouring the §4.2 escape sizes — 1 → 64-bit largesize, 0 → box
    extends to end of buffer — and recursing into container boxes), and
    extract
    the movie duration from ``mvhd`` (duration/timescale) and track
    dimensions from ``tkhd`` (16.16 fixed point). Raises ValueError on a
    malformed container or one with no movie header."""
    import struct as _struct

    if len(content) < 8 or content[4:8] != b"ftyp":
        raise ValueError("not an MP4: missing ftyp box")
    meta: dict = {}

    def walk(buf: bytes) -> None:
        pos = 0
        while pos + 8 <= len(buf):
            (size,) = _struct.unpack(">L", buf[pos : pos + 4])
            btype = buf[pos + 4 : pos + 8]
            hdr = 8
            if size == 0:
                # §4.2: size 0 -> box extends to the end of the buffer
                size = len(buf) - pos
            elif size == 1:
                # §4.2: size 1 -> 64-bit largesize follows the fourcc
                if pos + 16 > len(buf):
                    raise ValueError("truncated MP4 largesize " + repr(btype))
                (size,) = _struct.unpack(">Q", buf[pos + 8 : pos + 16])
                hdr = 16
            if size < hdr or pos + size > len(buf):
                raise ValueError("truncated MP4 box " + repr(btype))
            body = buf[pos + hdr : pos + size]
            if btype in _MP4_CONTAINERS:
                walk(body)
            elif btype == b"mvhd":
                if len(body) < 20:
                    raise ValueError("short mvhd body")
                if body[0] != 0:
                    raise ValueError("mvhd version %d unsupported" % body[0])
                timescale, duration = _struct.unpack(">LL", body[12:20])
                if timescale == 0:
                    raise ValueError("mvhd timescale 0")
                meta["duration_ms"] = duration * 1000 // timescale
            elif btype == b"tkhd":
                if len(body) < 9:
                    raise ValueError("short tkhd body")
                if body[0] != 0:
                    raise ValueError("tkhd version %d unsupported" % body[0])
                w16, h16 = _struct.unpack(">LL", body[len(body) - 8 :])
                meta["width"] = w16 >> 16
                meta["height"] = h16 >> 16
            pos += size
        if pos != len(buf):
            raise ValueError("truncated MP4 box stream (trailing bytes)")

    walk(content)
    if "duration_ms" not in meta:
        raise ValueError("missing mvhd movie header")
    return meta


def _default_decoder(content: bytes, mime: str):
    """Default decode kernel: WAV (stdlib RIFF walk), PNG (stdlib chunk
    walk + CRC check), JPEG (stdlib marker walk to SOF) and MP4 (stdlib
    ISO-BMFF box walk to mvhd/tkhd) all parse their METADATA for real;
    frame/sample DECODE of compressed video still needs external
    libraries absent from this environment and raises — inject a
    ``decoder`` callable for that."""
    if mime == "audio/wav":
        meta = decode_wav_header(content)
        return {"n_frames": meta["n_frames"], **meta}
    if mime == "image/png":
        meta = decode_png_header(content)
        return {"n_frames": 1, **meta}
    if mime == "image/jpeg":
        meta = decode_jpeg_header(content)
        return {"n_frames": 1, **meta}
    if mime == "video/mp4":
        meta = decode_mp4_header(content)
        return meta
    raise NotImplementedError(
        "decoding mime=" + mime + " requires a media library (e.g. "
        "PyAV for video) that is not installed in this environment; inject "
        "a `decoder` callable to decode_media()"
    )


def decode_media(
    df: DataFrame,
    decoder: Optional[Callable[[bytes, str], dict]] = None,
    id_col: str = "doc_id",
    content_col: str = "content",
    batch_size_hint: int = 64,
) -> DataFrame:
    """Decode/feature-extract blobs via Arrow-batched ``mapInPandas``.

    ``decoder(content_bytes, mime) -> {width, height, n_frames, feature}``
    runs once per blob inside the executor Python worker; batches arrive
    as Arrow record batches so bytes are never row-pickled. Partitioning
    is inherited from the scan — at 100 TB this is an embarrassingly
    parallel map stage whose cost is the decode kernel, not the engine.

    The default decoder raises ``NotImplementedError`` (no media libs
    here); tests inject a deterministic fake to exercise the plumbing.
    """
    fn = decoder or _default_decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                blob = bytes(content)
                mime = _sniff(blob)
                meta = fn(blob, mime)
                rows.append(
                    {
                        "doc_id": int(rid),
                        "mime": mime,
                        "width": meta.get("width"),
                        "height": meta.get("height"),
                        "n_frames": meta.get("n_frames"),
                        "feature": meta.get("feature"),
                        "sample_rate": meta.get("sample_rate"),
                        "channels": meta.get("channels"),
                        "duration_ms": meta.get("duration_ms"),
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def _sniff(blob: bytes) -> str:
    for mime, magic in sorted(
        MAGIC_BYTES.items(), key=lambda kv: -len(kv[1])
    ):
        if magic and blob.startswith(magic):
            return mime
    # MP4/ISO-BMFF is sniffed at offset 4 (box size varies), not by prefix
    if len(blob) >= 8 and blob[4:8] == b"ftyp":
        return "video/mp4"
    return "application/octet-stream"


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def _default_resizer(content: bytes, mime: str, w: int, h: int):  # pragma: no cover
    raise NotImplementedError(
        "image resizing requires an imaging library (e.g. Pillow) not "
        "installed in this environment; inject a `resizer` callable"
    )


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    resizer: Optional[Callable[[bytes, str, int, int], bytes]] = None,
    id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """Resize image blobs to (width, height) via Arrow-batched
    ``mapInPandas`` — same plumbing contract as :func:`decode_media`:
    bytes stay in Arrow buffers, partitioning inherits from the scan, the
    kernel is injectable (stubbed here: no imaging libs in this
    container). Non-image MIMEs pass through untouched, so the operator
    composes into a mixed-modality pipeline without a pre-split."""
    fn = resizer or _default_resizer

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                blob = bytes(content)
                mime = _sniff(blob)
                if mime.startswith("image/"):
                    out = fn(blob, mime, width, height)
                    rows.append(
                        {"doc_id": int(rid), "mime": mime, "width": width,
                         "height": height, "content": out}
                    )
                else:
                    rows.append(
                        {"doc_id": int(rid), "mime": mime, "width": None,
                         "height": None, "content": blob}
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def _default_frame_splitter(content: bytes, mime: str):  # pragma: no cover
    raise NotImplementedError(
        "video frame extraction requires a codec library (e.g. PyAV) not "
        "installed in this environment; inject a `splitter` callable"
    )


def frame_sample(
    df: DataFrame,
    every_n: int = 10,
    splitter: Optional[Callable[[bytes, str], list]] = None,
    id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """Sample every ``every_n``-th frame out of video blobs — the 1→many
    explode of the multimodal layer. ``splitter(bytes, mime) ->
    [frame_bytes, ...]`` decodes the container (stubbed: no codecs here);
    the operator keeps frames ``0, n, 2n, …`` with their original index.

    Output rows fan out ×(frames/every_n) — at 100 TB the inherited
    partitioning keeps each task's fan-out local (no shuffle), and a
    downstream repartition is the caller's explicit choice when frame
    counts skew."""
    fn = splitter or _default_frame_splitter

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                blob = bytes(content)
                frames = fn(blob, _sniff(blob))
                for i in range(0, len(frames), every_n):
                    rows.append(
                        {"doc_id": int(rid), "frame_idx": i, "frame": frames[i]}
                    )
            if rows:
                yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=FRAMES_SCHEMA)


# --------------------------------------------------------------------------
# Content-defined chunking (CDC) — the storage-dedup primitive: split each
# blob at positions chosen by a Gear rolling hash of the content itself,
# so identical regions chunk identically regardless of their byte OFFSET.
# Fixed-size chunking loses all alignment after one inserted byte; CDC
# boundaries re-synchronize within one hash window (pytest-pinned).
# --------------------------------------------------------------------------

CDC_MASK_BITS = 8  # expected chunk ≈ 2^8 = 256 bytes on the fixtures
CDC_MIN_SIZE = 32
CDC_MAX_SIZE = 4096

CDC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("chunk_idx", T.IntegerType()),
        T.StructField("offset", T.IntegerType()),
        T.StructField("size", T.IntegerType()),
        T.StructField("chunk_hash", T.StringType()),
    ]
)


def _gear_table_low(mask_bits: int) -> "np.ndarray":
    """Deterministic 256-entry Gear table, reduced to the low hash bits.

    In ``h = (h << 1) + gear[b]`` carries only propagate UPWARD, so
    ``h mod 2^m`` depends on exactly the last ``m`` bytes:
    ``h mod 2^m = (Σ_{j<m} gear[b_{i-j}] << j) mod 2^m``. That windowed
    weighted sum vectorizes (m shifted adds over the whole byte array) —
    no per-byte Python loop, same boundaries as the sequential fold."""
    import numpy as np

    x = np.arange(256, dtype=np.uint64)
    g = _splitmix64(x + np.uint64(0x9E3779B97F4A7C15))
    return (g & np.uint64((1 << mask_bits) - 1)).astype(np.uint64)


def _cdc_boundaries(
    data: bytes, mask_bits: int, min_size: int, max_size: int
) -> list[int]:
    """Chunk END positions (exclusive) for one blob."""
    import numpy as np

    n = len(data)
    if n == 0:
        return []
    arr = np.frombuffer(data, dtype=np.uint8)
    gv = _gear_table_low(mask_bits)[arr]
    acc = np.zeros(n, dtype=np.uint64)
    for j in range(min(mask_bits, n)):  # blobs shorter than the window
        acc[j:] += gv[: n - j] << np.uint64(j)
    mask = np.uint64((1 << mask_bits) - 1)
    is_cut = (acc & mask) == 0
    cuts: list[int] = []
    start = 0
    # candidate walk touches only ~n/2^mask_bits positions
    for pos in np.nonzero(is_cut)[0]:
        end = int(pos) + 1
        if end - start < min_size:
            continue
        while end - start > max_size:  # enforce max with forced cuts
            start += max_size
            cuts.append(start)
        cuts.append(end)
        start = end
    while n - start > max_size:
        start += max_size
        cuts.append(start)
    if start < n:
        cuts.append(n)
    return cuts


def cdc_chunk_blobs(
    blobs: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    *,
    mask_bits: int = CDC_MASK_BITS,
    min_size: int = CDC_MIN_SIZE,
    max_size: int = CDC_MAX_SIZE,
) -> DataFrame:
    """(doc_id, chunk_idx, offset, size, chunk_hash) per content-defined
    chunk. One linear ``mapInPandas`` scan (vectorized Gear window per
    blob, sha256/16-hex per chunk); chunk rows inherit the scan's
    partitioning — the downstream distinct/dedup aggregate is the only
    exchange. At 100 TB this is exactly a dedup store's ingest shape:
    chunk locally, shuffle only (hash, size) fingerprints."""
    import hashlib

    from dvh_airflow_kafka_spark.io import ensure_parallelism

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                blob = bytes(content)
                start = 0
                for i, end in enumerate(
                    _cdc_boundaries(blob, mask_bits, min_size, max_size)
                ):
                    rows.append(
                        {
                            "doc_id": int(rid),
                            "chunk_idx": i,
                            "offset": start,
                            "size": end - start,
                            "chunk_hash": hashlib.sha256(
                                blob[start:end]
                            ).hexdigest()[:16],
                        }
                    )
                    start = end
            if rows:
                yield pd.DataFrame(rows)

    return ensure_parallelism(blobs).mapInPandas(run, schema=CDC_SCHEMA)
