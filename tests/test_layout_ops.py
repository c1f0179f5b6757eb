"""Laws for the data-layout / forecasting / DSP operators added in
round 7c: compaction bin-packing, Z-order span audit, encoding stats,
dyadic EWMA, skew salting, PCM frame energy."""

from __future__ import annotations

from pyspark.sql import functions as F

from dvh_airflow_kafka_spark.catalog import REGISTRY
from dvh_airflow_kafka_spark.io import load_table


def _run(spark, sf_dir, name):
    return REGISTRY[name].fn(spark, sf_dir)


def test_compaction_bins_cover_and_bound(spark, sf_dir):
    rows = _run(spark, sf_dir, "small_file_compaction_plan").collect()
    docs = load_table(spark, sf_dir, "documents")
    per_src = {
        r.source: (r.n, r.bytes)
        for r in docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.octet_length("text")).alias("bytes"),
        )
        .collect()
    }
    # partition: every file lands in exactly one bin
    got = {}
    for r in rows:
        n, b = got.get(r.source, (0, 0))
        got[r.source] = (n + r.n_files, b + r.total_bytes)
    assert got == per_src
    # bins are contiguous id ranges: ordered by bin, ranges don't overlap
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, bins in by_src.items():
        bins.sort(key=lambda r: r.bin)
        assert bins[0].bin == 0
        for a, b in zip(bins, bins[1:]):
            assert a.last_file < b.first_file, src
        # every bin except possibly the last was closed at/after target
        for r in bins[:-1]:
            assert r.total_bytes >= 1, src


def test_zorder_tightens_y_span(spark, sf_dir):
    rows = _run(spark, sf_dir, "zorder_layout_audit").collect()
    z = [r for r in rows if r.layout == "zorder"]
    lin = [r for r in rows if r.layout == "linear"]
    assert z and lin
    n_total = sum(r.n_rows for r in z)
    assert n_total == sum(r.n_rows for r in lin)
    # the z-curve divides a 16-bit key space into 16 files: each file is
    # a 4096-key z-range, whose projection bounds BOTH dims within 64
    for r in z:
        assert r.x_max - r.x_min <= 63, r
        assert r.y_max - r.y_min <= 63, r
    # the linear layout bounds x tightly but leaves y near full width
    avg_lin_y = sum(r.y_max - r.y_min for r in lin) / len(lin)
    avg_z_y = sum(r.y_max - r.y_min for r in z) / len(z)
    assert avg_z_y < avg_lin_y
    for r in lin:
        assert r.x_max - r.x_min <= 15, r


def test_encoding_stats_laws(spark, sf_dir):
    rows = _run(spark, sf_dir, "column_encoding_stats").collect()
    docs = load_table(spark, sf_dir, "documents")
    per_src = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {r.source for r in rows} == set(per_src)
    for r in rows:
        assert r.n_rows == per_src[r.source]
        assert r.n_deltas == r.n_rows - 1
        assert 1 <= r.n_distinct <= r.n_runs <= r.n_rows
        assert 0 <= r.n_nonneg_deltas <= r.n_deltas
        assert r.delta_bits >= (1 if r.n_distinct > 1 else 0)


def test_dyadic_ewma_matches_recurrence(spark, sf_dir):
    rows = _run(spark, sf_dir, "events_ewma_forecast").collect()
    ev = load_table(spark, sf_dir, "events")
    hist = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "ts",
            "event_id",
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
        .collect()
    )
    by_user: dict = {}
    for r in hist:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.cents))
    for r in rows:
        seq = sorted(by_user[r.user_id])[-30:]
        s = None
        for _, _, x in seq:
            s = x if s is None else (s + x) / 2  # exact dyadic in floats
        assert r.n_taps == len(seq)
        assert r.ewma == s, r.user_id
        assert r.ewma_scaled == int(s * 2 ** (len(seq) - 1))


def test_skew_planner_slices_hit_target(spark, sf_dir):
    rows = _run(spark, sf_dir, "partition_skew_planner").collect()
    assert len(rows) <= 20
    prev = None
    for r in rows:
        # ceil division both ways
        assert r.salt_factor == -(-r.n_rows // 50)
        assert r.max_slice_rows == -(-r.n_rows // r.salt_factor)
        assert r.max_slice_rows <= 50
        # slices cover the rows
        assert r.salt_factor * r.max_slice_rows >= r.n_rows
        if prev is not None:
            assert r.n_rows <= prev
        prev = r.n_rows


def test_audio_frame_energy_decodes_real_bytes(spark, sf_dir):
    rows = _run(spark, sf_dir, "audio_frame_energy").collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    docs = load_table(spark, sf_dir, "documents").select("doc_id").collect()
    assert set(by_doc) == {r.doc_id for r in docs}
    for doc_id, blocks in by_doc.items():
        blocks.sort(key=lambda r: r.block_idx)
        n = 64 + doc_id % 193
        assert sum(r.n_samples for r in blocks) == n
        assert [r.block_idx for r in blocks] == list(range(len(blocks)))
        # all blocks full except possibly the last
        for r in blocks[:-1]:
            assert r.n_samples == 64
        # recompute one block's energy from the synth formula
        r0 = blocks[0]
        expect = sum(
            ((doc_id * 131 + i * 17) % 4001 - 2000) ** 2
            for i in range(min(64, n))
        )
        assert r0.energy == expect


def test_gram_matrix_psd_and_diag_carries_sums(spark, sf_dir):
    import numpy as np

    rows = _run(spark, sf_dir, "embedding_gram_matrix").collect()
    d = max(r.j for r in rows) + 1
    assert len(rows) == d * (d + 1) // 2
    G = np.zeros((d, d), dtype=np.int64)
    sums = np.zeros(d, dtype=np.int64)
    n = None
    for r in rows:
        G[r.i, r.j] = G[r.j, r.i] = r.gram
        if r.i == r.j:
            sums[r.i] = r.dim_sum
            assert n is None or n == r.n_vecs
            n = r.n_vecs
        else:
            assert r.dim_sum == 0 and r.n_vecs == 0
    emb = load_table(spark, sf_dir, "embeddings")
    assert n == emb.count()
    # diagonal dominates in magnitude-sense: Cauchy-Schwarz on each pair
    for _ in range(5):
        i, j = np.random.default_rng(7).integers(0, d, 2)
        assert G[i, j] ** 2 <= G[i, i] * G[j, j]
    # Gram matrices are PSD (allow tiny negative eigenvalues from the
    # float eigensolver on an exactly-singular integer matrix)
    ev = np.linalg.eigvalsh(G.astype(np.float64))
    assert ev.min() >= -1e-6 * max(1.0, ev.max())


def test_join_cardinality_estimator_consistency(spark, sf_dir):
    rows = _run(spark, sf_dir, "join_cardinality_estimator").collect()
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    assert sum(r.actual_lines for r in rows) == li.count()
    assert sum(r.n_orders for r in rows) == orders.count()
    for r in rows:
        # the uniform-fanout estimate is within floor error of n_orders*avg
        assert r.est_lines <= r.n_orders * li.count() // orders.count() + 1
        assert r.err_ppm == abs(r.actual_lines - r.est_lines) * 10**6 // r.actual_lines


def test_image_tiles_reconstruct_pixel_totals(spark, sf_dir):
    rows = _run(spark, sf_dir, "image_tile_checksum").collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, tiles in list(by_doc.items())[:50]:
        w = 8 + doc_id % 16
        h = 8 + (doc_id * 7) % 16
        assert sum(t.n_px for t in tiles) == w * h
        expect = sum(
            (doc_id * 31 + r * 17 + c * 7) % 251
            for r in range(h)
            for c in range(w)
        )
        assert sum(t.px_sum for t in tiles) == expect
        assert all(0 <= t.px_max <= 250 for t in tiles)


def test_gd_loss_decreases_and_weights_bounded(spark, sf_dir):
    rows = sorted(
        _run(spark, sf_dir, "linear_probe_gd").collect(), key=lambda r: r.iter
    )
    assert [r.iter for r in rows] == [1, 2, 3]
    # pre-update SSE is strictly decreasing across iterations
    assert rows[0].sse > rows[1].sse > rows[2].sse
    # first step moves every weight in the +direction (resid = -y < 0)
    assert all(getattr(rows[0], f"b{j}") >= 0 for j in range(4))
    # deterministic rerun
    again = sorted(
        _run(spark, sf_dir, "linear_probe_gd").collect(), key=lambda r: r.iter
    )
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_logreg_loss_decreases_and_saturation_bounds(spark, sf_dir):
    rows = sorted(
        _run(spark, sf_dir, "quality_logreg_gd").collect(),
        key=lambda r: r.iter,
    )
    assert [r.iter for r in rows] == [1, 2, 3]
    # pre-update Brier loss is strictly decreasing across iterations
    assert rows[0].brier > rows[1].brier > rows[2].brier
    # hard-sigmoid saturation: every residual is bounded by the fixed
    # point, so brier <= N * 2^40
    n = rows[0].n_pos_pred  # iter-1 margin is 0 -> p = 0.5 -> all positive
    assert rows[0].brier <= n * (1 << 40)
    # deterministic rerun (frozen fixed-point trajectory)
    again = sorted(
        _run(spark, sf_dir, "quality_logreg_gd").collect(),
        key=lambda r: r.iter,
    )
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]
