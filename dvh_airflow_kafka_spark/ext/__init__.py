"""[EXT] operators — large-scale training-data pipeline ops.

Mandated by BASELINE.json's north star (SURVEY.md §2 [EXT] rows): the ops a
100 TB LLM-data pipeline needs on top of the reference's ETL surface —
deduplication (exact → MinHash-LSH → SimHash → n-gram Jaccard → embedding
cosine), similarity search (brute-force + LSH-bucketed ANN), text analysis
(lang-id, quality, token counting, fingerprinting), and multimodal column
plumbing.
"""

from dvh_airflow_kafka_spark.ext import (  # noqa: F401
    bloom,
    components,
    dedup,
    multimodal,
    profile,
    ranking,
    sampling,
    similarity,
    sketch,
    text,
)
