"""[EXT] multimodal binary-column operators + S4 Confluent framing."""

from __future__ import annotations

import hashlib
import struct

import pytest
from pyspark.sql import functions as F

from dvh_airflow_kafka_spark.ext import multimodal as mm
from dvh_airflow_kafka_spark.io import load_table
from dvh_airflow_kafka_spark.sources.kafka import (
    confluent_frame,
    confluent_schema_id,
    strip_confluent_header,
)


@pytest.fixture(scope="module")
def blobs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(200)
    return mm.synth_blob_frame(docs)


def test_synth_blob_magic_prefixes(blobs):
    rows = blobs.limit(20).collect()
    for r in rows:
        blob = bytes(r.content)
        mime = mm._sniff(blob)
        assert mime == list(mm.MAGIC_BYTES)[r.doc_id % 4]


def test_fingerprint_matches_hashlib(blobs):
    got = {r.doc_id: (r.fingerprint, r.size_bytes) for r in mm.blob_fingerprint(blobs).collect()}
    for r in blobs.limit(30).collect():
        blob = bytes(r.content)
        expect = hashlib.sha256(blob.hex().upper().encode()).hexdigest()
        assert got[r.doc_id] == (expect, len(blob))


def test_blob_near_dup_finds_planted_duplicate(spark):
    """A blob differing by one byte from another must pair up; unrelated
    blobs must not."""
    base = b"\xff\xd8\xff" + bytes(range(256)) * 8
    near = base[:100] + b"\x00" + base[101:]
    far = b"\x89PNG\r\n\x1a\n" + b"totally different content " * 80
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, content binary"
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in mm.blob_simhash_near_duplicates(df, max_hamming=3).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_decode_media_plumbing_with_fake_decoder(blobs):
    """The mapInPandas decode contract: schema, batching, per-blob call —
    exercised with a deterministic fake (media libs absent here)."""

    def fake(blob: bytes, mime: str) -> dict:
        return {
            "width": len(blob) % 640,
            "height": len(blob) % 480,
            "n_frames": 1,
            "feature": [float(blob[0]), float(len(blob))],
        }

    out = mm.decode_media(blobs, decoder=fake)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "mime", "width", "height", "n_frames", "feature",
        "sample_rate", "channels", "duration_ms",
    ]
    rows = out.collect()
    assert len(rows) == blobs.count()
    by_id = {r.doc_id: r for r in rows}
    for r in blobs.limit(10).collect():
        blob = bytes(r.content)
        d = by_id[r.doc_id]
        assert d.width == len(blob) % 640
        assert d.feature == [float(blob[0]), float(len(blob))]
        assert d.mime == mm._sniff(blob)


def test_decode_media_default_raises_for_unknown_modalities(spark):
    """WAV/PNG/JPEG/MP4 metadata decodes for real; opaque binary must
    raise the documented NotImplementedError contract."""
    df = spark.createDataFrame(
        [(1, b"\x7fELFsome-opaque-binary-payload")],
        "doc_id long, content binary",
    )
    with pytest.raises(Exception) as ei:
        mm.decode_media(df).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_decode_media_parses_jpeg_for_real(spark):
    docs = spark.createDataFrame([(3,), (4,)], "doc_id long")
    rows = {
        r.doc_id: r
        for r in mm.decode_media(mm.synth_jpeg_frame(docs)).collect()
    }
    for rid, r in rows.items():
        assert r.mime == "image/jpeg"
        assert r.width == 8 + rid % 24
        assert r.height == 8 + (rid * 5) % 24


def test_wav_header_decode_against_stdlib_wave():
    """The RIFF walk must agree with the stdlib `wave` reader on a file
    written by the stdlib `wave` writer (an independent implementation of
    the same public spec)."""
    import io
    import wave

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(2)
    w.setsampwidth(2)
    w.setframerate(22050)
    w.writeframes(b"\x00\x00" * 2 * 441)  # 441 stereo frames
    w.close()
    meta = mm.decode_wav_header(buf.getvalue())
    assert meta == {
        "sample_rate": 22050,
        "channels": 2,
        "n_frames": 441,
        "duration_ms": 441 * 1000 // 22050,
    }


def test_wav_decode_malformed_raises():
    with pytest.raises(ValueError):
        mm.decode_wav_header(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        mm.decode_wav_header(b"RIFF\x24\x00\x00\x00WAVE")  # no fmt/data


def test_synth_wav_roundtrip(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(30)
    decoded = {
        r.doc_id: r
        for r in mm.decode_media(mm.synth_wav_frame(docs)).collect()
    }
    for d in docs.collect():
        r = decoded[d.doc_id]
        assert r.mime == "audio/wav"
        assert r.sample_rate == [8000, 16000, 44100][d.doc_id % 3]
        assert r.channels == 1 + d.doc_id % 2
        assert r.n_frames == len(d.text)
        assert r.duration_ms == len(d.text) * 1000 // r.sample_rate


# --------------------------------------------------------------------------
# S4 Confluent wire format
# --------------------------------------------------------------------------


def test_confluent_framing_matches_struct_pack(spark):
    """Frame bytes must equal struct.pack('>bL', 0, id) + payload and the
    decode must invert it (reference src/kafka_source.py:129-135)."""
    payloads = [(7, b'{"a": 1}'), (123456, "blåbær".encode()), (0, b"")]
    df = spark.createDataFrame(
        [(sid, p.decode()) for sid, p in payloads], "sid long, payload string"
    ).select(
        "sid",
        "payload",
        confluent_frame(F.col("sid"), F.col("payload")).alias("value"),
    )
    for r in df.collect():
        expect = struct.pack(">bL", 0, r.sid) + r.payload.encode()
        assert bytes(r.value) == expect
    decoded = df.select(
        "sid",
        "payload",
        confluent_schema_id(F.col("value")).alias("got_id"),
        strip_confluent_header(F.col("value")).cast("string").alias("got_payload"),
    )
    for r in decoded.collect():
        assert r.got_id == r.sid
        assert r.got_payload == r.payload


def test_resize_images_plumbing(blobs):
    def fake_resize(blob, mime, w, h):
        return blob[:4] + bytes([w, h])  # deterministic, size-bounded

    out = mm.resize_images(blobs, 8, 6, resizer=fake_resize).collect()
    by_mime = {}
    for r in out:
        by_mime.setdefault(r["mime"].split("/")[0], []).append(r)
    for r in by_mime.get("image", []):
        assert r["width"] == 8 and r["height"] == 6
        assert bytes(r["content"])[-2:] == bytes([8, 6])
    # non-images pass through untouched with NULL dims
    for r in by_mime.get("audio", []) + by_mime.get("application", []):
        assert r["width"] is None and r["height"] is None


def test_frame_sample_every_n(blobs):
    def fake_split(blob, mime):
        # pretend the blob is a 25-frame container of 4-byte frames
        return [blob[:2] + bytes([i, 0]) for i in range(25)]

    out = mm.frame_sample(blobs, every_n=10, splitter=fake_split)
    got = out.groupBy("doc_id").count().collect()
    assert got and all(r["count"] == 3 for r in got)  # frames 0, 10, 20
    idx = {r["frame_idx"] for r in out.collect()}
    assert idx == {0, 10, 20}


def test_png_roundtrip_is_stdlib_valid(spark, sf_dir):
    """The synthesized PNGs must be REAL: decodable by an independent
    walk, CRC-intact, and with IDAT inflating to the exact scanline
    byte count the IHDR implies."""
    import struct
    import zlib

    from dvh_airflow_kafka_spark.ext.multimodal import (
        _PNG_CHANNELS,
        decode_png_header,
        synth_png_frame,
    )
    from dvh_airflow_kafka_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    for r in synth_png_frame(docs).collect():
        blob = bytes(r.content)
        meta = decode_png_header(blob)
        assert meta["width"] == 8 + r.doc_id % 16
        assert meta["height"] == 8 + (r.doc_id * 7) % 16
        # independent IDAT check: inflate and size against IHDR
        pos, idat = 8, b""
        while pos + 12 <= len(blob):
            (clen,) = struct.unpack(">L", blob[pos : pos + 4])
            ctype = blob[pos + 4 : pos + 8]
            if ctype == b"IDAT":
                idat += blob[pos + 8 : pos + 8 + clen]
            pos += 12 + clen
        raw = zlib.decompress(idat)
        assert len(raw) == meta["height"] * (
            1 + meta["width"] * meta["channels"]
        )


def test_jpeg_decode_rejects_malformed():
    import pytest as _pytest

    from dvh_airflow_kafka_spark.ext.multimodal import decode_jpeg_header

    with _pytest.raises(ValueError, match="bad SOI"):
        decode_jpeg_header(b"\x89PNG\r\n\x1a\nrest")
    with _pytest.raises(ValueError, match="desync"):
        decode_jpeg_header(b"\xff\xd8\x00\x00\x00\x00")
    with _pytest.raises(ValueError, match="missing SOF"):
        decode_jpeg_header(b"\xff\xd8\xff\xd9")
    with _pytest.raises(ValueError, match="truncated"):
        decode_jpeg_header(b"\xff\xd8\xff\xc0\x00\xff")


def test_jpeg_decode_walks_past_app_segments():
    """The SOF finder must skip arbitrary APPn/COM segments (real files
    lead with EXIF/comment blocks) and parse the first SOF it meets."""
    import struct

    from dvh_airflow_kafka_spark.ext.multimodal import decode_jpeg_header

    com = b"\xff\xfe" + struct.pack(">H", 2 + 11) + b"hello world"
    sof_body = bytes([12]) + struct.pack(">HH", 480, 640) + bytes([3]) + (
        b"\x01\x11\x00\x02\x11\x00\x03\x11\x00"
    )
    sof2 = b"\xff\xc2" + struct.pack(">H", 2 + len(sof_body)) + sof_body
    blob = b"\xff\xd8" + com + sof2 + b"\xff\xd9"
    meta = decode_jpeg_header(blob)
    assert meta == {"width": 640, "height": 480, "bit_depth": 12, "channels": 3}


def test_mp4_decode_rejects_malformed():
    import pytest as _pytest

    from dvh_airflow_kafka_spark.ext.multimodal import decode_mp4_header

    with _pytest.raises(ValueError, match="missing ftyp"):
        decode_mp4_header(b"\x89PNG\r\n\x1a\nrest")
    with _pytest.raises(ValueError, match="truncated"):
        decode_mp4_header(b"\x00\x00\x00\x10ftypisom\x00\x00\x00\x20moov")
    with _pytest.raises(ValueError, match="missing mvhd"):
        decode_mp4_header(b"\x00\x00\x00\x10ftypisom\x00\x00\x02\x00")


def test_jpeg_decode_skips_fill_bytes():
    """T.81 §B.1.1.2 fill bytes (0xFF runs before a marker) are legal in
    real camera files and must not desync the walk."""
    import struct

    from dvh_airflow_kafka_spark.ext.multimodal import decode_jpeg_header

    sof_body = bytes([8]) + struct.pack(">HH", 10, 20) + bytes([1, 1, 0x11, 0])
    sof = b"\xff\xff\xff\xc0" + struct.pack(">H", 2 + len(sof_body)) + sof_body
    meta = decode_jpeg_header(b"\xff\xd8" + sof + b"\xff\xd9")
    assert (meta["width"], meta["height"]) == (20, 10)


def test_mp4_decode_short_bodies_raise_value_error():
    """Truncated mvhd/tkhd bodies must surface the documented ValueError,
    not IndexError/struct.error."""
    import struct

    import pytest as _pytest

    from dvh_airflow_kafka_spark.ext.multimodal import decode_mp4_header

    ftyp = struct.pack(">L", 16) + b"ftyp" + b"isom\x00\x00\x02\x00"
    empty_mvhd = struct.pack(">L", 8) + b"mvhd"
    with _pytest.raises(ValueError, match="short mvhd"):
        decode_mp4_header(
            ftyp + struct.pack(">L", 8 + len(empty_mvhd)) + b"moov" + empty_mvhd
        )
    short_tkhd = struct.pack(">L", 12) + b"tkhd" + b"\x00\x00\x00\x07"
    with _pytest.raises(ValueError, match="short tkhd"):
        decode_mp4_header(
            ftyp + struct.pack(">L", 8 + len(short_tkhd)) + b"moov" + short_tkhd
        )


def test_mp4_decode_handles_escape_size_forms():
    """ISO/IEC 14496-12 §4.2 escape sizes are legal in real files: size==1
    means a 64-bit largesize follows the fourcc, size==0 means the box
    extends to the end of the buffer. Both must parse, and a truncated
    largesize must raise the documented ValueError."""
    import struct

    import pytest as _pytest

    from dvh_airflow_kafka_spark.ext.multimodal import decode_mp4_header

    ftyp = struct.pack(">L", 16) + b"ftyp" + b"isom\x00\x00\x02\x00"
    mvhd_body = (
        b"\x00\x00\x00\x00"
        + struct.pack(">LL", 0, 0)
        + struct.pack(">LL", 1000, 2500)  # timescale, duration -> 2500 ms
        + b"\x00" * 80
    )
    mvhd = struct.pack(">L", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body

    # moov with size==1: 64-bit largesize (header is 16 bytes)
    large_moov = (
        struct.pack(">L", 1) + b"moov" + struct.pack(">Q", 16 + len(mvhd)) + mvhd
    )
    assert decode_mp4_header(ftyp + large_moov)["duration_ms"] == 2500

    # moov with size==0: box extends to the end of the buffer
    zero_moov = struct.pack(">L", 0) + b"moov" + mvhd
    assert decode_mp4_header(ftyp + zero_moov)["duration_ms"] == 2500

    # size==1 but the largesize field itself is cut off
    with _pytest.raises(ValueError, match="largesize"):
        decode_mp4_header(ftyp + struct.pack(">L", 1) + b"moov" + b"\x00\x00")


def test_detect_mime_agrees_with_python_sniffer(spark):
    """The codegen Column sniffer and the Python-side _sniff must stay in
    lockstep across every modality, including the offset-4 ftyp rule."""
    from dvh_airflow_kafka_spark.ext.multimodal import _sniff, detect_mime

    blobs = [
        b"\xff\xd8\xffjpegish",
        b"\x89PNG\r\n\x1a\npngish",
        b"RIFFxxxxWAVEish",
        b"\x00\x00\x00\x10ftypisom4444",
        b"\x7fELFopaque",
        b"",
    ]
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(blobs)], "i long, content binary"
    )
    got = {
        r.i: r.mime
        for r in df.select("i", detect_mime(F.col("content")).alias("mime")).collect()
    }
    for i, b in enumerate(blobs):
        assert got[i] == _sniff(b), (i, b)


def test_cdc_chunks_reassemble_and_respect_size_bounds(spark, sf_dir):
    from dvh_airflow_kafka_spark.ext.multimodal import (
        CDC_MAX_SIZE,
        CDC_MIN_SIZE,
        cdc_chunk_blobs,
        synth_blob_frame,
    )

    docs = load_table(spark, sf_dir, "documents").limit(200)
    blobs = synth_blob_frame(docs)
    sizes = {
        r["doc_id"]: r["n"]
        for r in blobs.select(
            "doc_id", F.length("content").alias("n")
        ).collect()
    }
    by_doc: dict = {}
    for r in cdc_chunk_blobs(blobs).collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(sizes)
    for did, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        pos = 0
        for r in rows:
            assert r["offset"] == pos
            assert 0 < r["size"] <= CDC_MAX_SIZE
            pos += r["size"]
        assert pos == sizes[did]
        # every chunk except the last is either a hash cut (>= min) or a
        # forced max cut
        for r in rows[:-1]:
            assert r["size"] >= CDC_MIN_SIZE or r["size"] == CDC_MAX_SIZE


def test_cdc_boundaries_resync_after_prefix_insertion():
    """THE content-defined property: prepending bytes shifts every byte
    offset, yet all chunk hashes except the first re-appear — fixed-size
    chunking would lose every one."""
    import hashlib

    from dvh_airflow_kafka_spark.ext.multimodal import _cdc_boundaries

    rng = __import__("random").Random(7)
    data = bytes(rng.randrange(256) for _ in range(20_000))
    mutated = b"\x01\x02\x03\x04\x05\x06\x07" + data

    def hashes(blob):
        out, start = [], 0
        for end in _cdc_boundaries(blob, 8, 32, 4096):
            out.append(hashlib.sha256(blob[start:end]).hexdigest()[:16])
            start = end
        return out

    h0, h1 = hashes(data), hashes(mutated)
    assert len(h0) > 10
    shared = set(h0) & set(h1)
    assert len(shared) >= len(h0) - 2, (len(h0), len(shared))


def test_cdc_chunking_is_partitioning_invariant(spark, sf_dir):
    from dvh_airflow_kafka_spark.ext.multimodal import (
        cdc_chunk_blobs,
        synth_blob_frame,
    )

    docs = load_table(spark, sf_dir, "documents").limit(100)
    key = lambda r: (r["doc_id"], r["chunk_idx"])
    a = sorted(
        map(
            tuple,
            cdc_chunk_blobs(synth_blob_frame(docs.repartition(1))).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            cdc_chunk_blobs(synth_blob_frame(docs.repartition(8))).collect(),
        )
    )
    assert a == b


def test_cdc_report_aggregate_oracled_via_materialized_chunks(
    spark, sf_dir, tmp_path
):
    """Partial-oracle pin for the rows-only ``blob_cdc_chunk_dedup``: the
    rolling-hash chunker stays Python (no SQL form), but the dedup-ratio
    REPORT over its output is SQL — materialize Spark's chunk rows to
    parquet and let DuckDB run the same distinct/total aggregates over
    the SAME chunks. Equality pins the distributed aggregation plumbing,
    not just the kernel."""
    import duckdb

    from dvh_airflow_kafka_spark.catalog import REGISTRY
    from dvh_airflow_kafka_spark.ext.multimodal import (
        cdc_chunk_blobs,
        synth_blob_frame,
    )

    docs = load_table(spark, sf_dir, "documents")
    chunks_path = str(tmp_path / "chunks")
    cdc_chunk_blobs(synth_blob_frame(docs)).write.parquet(chunks_path)

    row = REGISTRY["blob_cdc_chunk_dedup"].fn(spark, sf_dir).first()
    con = duckdb.connect()
    want = con.execute(
        f"""WITH c AS (SELECT * FROM read_parquet('{chunks_path}/*.parquet')),
        t AS (SELECT COUNT(DISTINCT doc_id) AS n_blobs, COUNT(*) AS n_chunks,
                     SUM(size) AS total_bytes FROM c),
        u AS (SELECT COUNT(*) AS n_distinct_chunks, SUM(sz) AS unique_bytes
              FROM (SELECT chunk_hash, MIN(size) AS sz FROM c GROUP BY chunk_hash))
        SELECT n_blobs, n_chunks, n_distinct_chunks, total_bytes, unique_bytes,
               round(CAST(unique_bytes AS DOUBLE) / total_bytes, 6)
        FROM t, u"""
    ).fetchone()
    con.close()
    got = (
        row["n_blobs"],
        row["n_chunks"],
        row["n_distinct_chunks"],
        row["total_bytes"],
        row["unique_bytes"],
        row["dedup_ratio"],
    )
    assert got == tuple(
        int(x) if i < 5 else float(x) for i, x in enumerate(want)
    )
