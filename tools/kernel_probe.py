#!/usr/bin/env python
"""Kernel throughput probe: replicate the documents/embeddings tables N×
on disk and push them through the Python-side kernels (PCM frame energy,
PNG tile decode, quantized gram matrix), reporting rows/s and MB/s at
each scale. The point is the SHAPE: map-only Arrow kernels should scale
~linearly in rows on a fixed-core box, and the gram matrix's shuffle
payload should stay constant while its scan grows.

Usage: PYTHONPATH=. python tools/kernel_probe.py [max_factor]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F


def main() -> int:
    from dvh_airflow_kafka_spark.ext import multimodal as xmm
    from dvh_airflow_kafka_spark.ext import similarity as xsim
    from dvh_airflow_kafka_spark.io import load_table
    from dvh_airflow_kafka_spark.session import get_spark

    max_factor = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("kernel_probe")
    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )
    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    tmp = tempfile.mkdtemp(prefix="kernel_probe_")
    results = []
    try:
        for factor in (1, max(2, max_factor // 2), max_factor):
            big_docs = docs
            big_emb = emb
            for i in range(1, factor):
                big_docs = big_docs.unionAll(
                    docs.select(
                        (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
                        "text",
                    )
                )
                big_emb = big_emb.unionAll(
                    emb.select(
                        (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
                        "embedding",
                        "label",
                    )
                )
            dpath = f"{tmp}/docs_{factor}"
            epath = f"{tmp}/emb_{factor}"
            big_docs.write.parquet(dpath)
            big_emb.write.parquet(epath)
            big_docs = spark.read.parquet(dpath)
            big_emb = spark.read.parquet(epath)
            n_docs = big_docs.count()
            n_vecs = big_emb.count()

            t0 = time.time()
            wav_bytes = (
                xmm.wav_frame_energy(xmm.synth_wav_pcm_frame(big_docs))
                .agg(F.sum("n_samples"))
                .first()[0]
                * 2
            )
            wav_s = time.time() - t0

            t0 = time.time()
            px = (
                xmm.png_tile_checksum(
                    xmm.synth_png_pixels_frame(big_docs), tile=8
                )
                .agg(F.sum("n_px"))
                .first()[0]
            )
            png_s = time.time() - t0

            t0 = time.time()
            xsim.quantized_gram_matrix(big_emb, "embedding").write.format(
                "noop"
            ).mode("overwrite").save()
            gram_s = time.time() - t0

            results.append(
                {
                    "factor": factor,
                    "n_docs": n_docs,
                    "wav_pcm_MBps": round(wav_bytes / 1e6 / wav_s, 1),
                    "png_px_Mps": round(px / 1e6 / png_s, 1),
                    "gram_vecs_per_s": round(n_vecs / gram_s),
                    "wav_s": round(wav_s, 2),
                    "png_s": round(png_s, 2),
                    "gram_s": round(gram_s, 2),
                }
            )
            print(json.dumps(results[-1]), flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()
    print(json.dumps({"kernel_probe": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
