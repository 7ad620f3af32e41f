"""Non-vacuity pins for the round-13 tier (oracle equivalence is
verified by tests/test_queries_oracle.py at sf0.001 and the driver at
sf0.01): bounds, conservation laws, monotonicity, and exact-identity
checks so no entry can go green as a degenerate constant. Migrated
unchanged from the staging harness at registration."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def _registry():
    from etl_mini_spark.queries import QUERIES

    return QUERIES


PENDING = _registry()


# --- Block A: modern retrieval -----------------------------------------------


def test_int8_topk_exact_integers_and_bounds(spark):
    rows = PENDING["int8_quant_cosine_topk"](spark, SF_SMOKE).collect()
    probes = {r["probe_id"] for r in rows}
    assert len(probes) >= 5
    for r in rows:
        assert r["neighbor_id"] != r["probe_id"]
        # 64 dims x 127^2 max per-dim product
        assert abs(r["qdot"]) <= 64 * 127 * 127


def test_matryoshka_overlap_bounded(spark):
    rows = PENDING["matryoshka_overlap_audit"](spark, SF_SMOKE).collect()
    assert rows and all(1 <= r["overlap_at_10"] <= 10 for r in rows)
    assert any(r["overlap_at_10"] < 10 for r in rows)  # truncation visibly costs


def test_rrf_fusion_rank_windows(spark):
    rows = PENDING["rrf_hybrid_fusion"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1 <= r["r_lex"] <= 20 and 1 <= r["r_vec"] <= 20
        assert 2.0 / 80 <= r["rrf"] <= 2.0 / 61


def test_ndcg_bounded_and_ideal_dominates(spark):
    rows = PENDING["ndcg_graded_eval"](spark, SF_SMOKE).collect()
    assert len(rows) >= 5
    for r in rows:
        assert 0.0 <= r["ndcg"] <= 1.0
        assert 0 <= r["rel_total"] <= 30
    assert any(0.0 < r["ndcg"] < 1.0 for r in rows)


def test_ann_pq_rerank_shape(spark):
    rows = PENDING["ann_pq_rerank"](spark, SF_SMOKE).collect()
    probes = {r["probe_id"] for r in rows}
    assert len(probes) >= 5
    per = {}
    for r in rows:
        per.setdefault(r["probe_id"], []).append(r["cosine"])
    for vs in per.values():
        assert len(vs) == 5 and vs == sorted(vs, reverse=True)


# --- Block B: lakehouse semantics ---------------------------------------------


def test_manifest_pruning_conservation(spark):
    rows = {r["pred_id"]: r for r in PENDING["manifest_pruning_audit"](spark, SF_SMOKE).collect()}
    assert set(rows) == {1, 2, 3}
    for r in rows.values():
        assert r["files_pruned"] < r["files_total"]
        assert r["rows_matched"] <= r["rows_scanned"]
    assert rows[2]["files_pruned"] > 0  # the point-custkey predicate prunes


def test_delta_log_replay_compaction_conserves(spark):
    rows = {r["version"]: r for r in PENDING["delta_log_replay"](spark, SF_SMOKE).collect()}
    assert set(rows) == {0, 1, 2}
    # v1 compaction keeps totals identical while shrinking file count
    assert rows[1]["total_rows"] == rows[0]["total_rows"]
    assert rows[1]["total_cents"] == rows[0]["total_cents"]
    assert rows[1]["live_files"] < rows[0]["live_files"]
    assert rows[2]["total_rows"] < rows[1]["total_rows"]


def test_bitemporal_later_tx_knows_more(spark):
    rows = PENDING["bitemporal_snapshot_query"](spark, SF_SMOKE).collect()
    byk = {(r["vt"], r["tx_max"]): r for r in rows}
    # same valid point, wider tx knowledge => at least as many facts
    assert byk[("1996-06-15", 2)]["n_current"] >= byk[("1996-06-15", 0)]["n_current"]
    assert all(r["n_current"] > 0 for r in rows)


def test_scd6_current_consistent(spark):
    rows = PENDING["scd2_scd6_composed"](spark, SF_SMOKE).collect()
    assert rows
    by_cust = {}
    for r in rows:
        by_cust.setdefault(r["c_custkey"], []).append(r)
    multi = [v for v in by_cust.values() if len(v) > 1]
    assert multi  # composition actually produced history
    for hist in by_cust.values():
        cur = [r for r in hist if r["is_current"]]
        assert len(cur) == 1
        assert all(r["current_seg"] == cur[0]["seg"] for r in hist)


def test_snapshot_isolation_conflicts_detected(spark):
    rows = {r["attempt"]: r for r in
            PENDING["checkpoint_snapshot_isolation"](spark, SF_SMOKE).collect()}
    assert len(rows) == 10
    committed = [a for a, r in rows.items() if r["committed"]]
    aborted = [a for a, r in rows.items() if not r["committed"]]
    assert aborted and committed  # both outcomes occur
    assert all(rows[a]["rows_written"] == 0 for a in aborted)
    assert all(rows[a]["rows_written"] > 0 for a in committed)


def test_late_dim_restates_some_segment(spark):
    rows = PENDING["late_arriving_dimension"](spark, SF_SMOKE).collect()
    assert sum(r["initial_cents"] for r in rows) == sum(r["corrected_cents"] for r in rows)
    assert any(r["initial_cents"] != r["corrected_cents"] for r in rows)


# --- Block C: entity resolution -----------------------------------------------


def test_fs_weights_monotone_in_agreement(spark):
    rows = {(r["a_seg"], r["a_bal"], r["a_ph"]): r
            for r in PENDING["fellegi_sunter_weights"](spark, SF_SMOKE).collect()}
    assert rows[(1, 1, 1)]["weight"] > rows[(0, 0, 0)]["weight"]
    total_true = sum(r["n_true"] for r in rows.values())
    assert total_true > 0
    # full agreement concentrates truth
    assert rows[(1, 1, 1)]["n_true"] / max(rows[(1, 1, 1)]["n_pairs"], 1) > \
        total_true / sum(r["n_pairs"] for r in rows.values())


def test_er_quality_monotone_tradeoff(spark):
    rows = sorted(PENDING["er_threshold_quality"](spark, SF_SMOKE).collect(),
                  key=lambda r: r["threshold"])
    assert rows[0]["recall"] == 1.0  # threshold 0 predicts everything
    precs = [r["precision"] for r in rows]
    recs = [r["recall"] for r in rows]
    assert precs == sorted(precs) and recs == sorted(recs, reverse=True)
    assert precs[-1] > precs[0]


# --- Block D: finance recursions ------------------------------------------------


def test_kalman_gain_converges(spark):
    rows = PENDING["kalman_filter_1d"](spark, SF_SMOKE).collect()
    assert len(rows) >= 25
    gains = [r["gain"] for r in rows[1:]]
    assert all(0.0 < g < 1.0 for g in gains)
    # steady-state gain of (Q=0.01, R=4): variance contracts monotonically
    pvars = [r["p_var"] for r in rows[1:]]
    assert pvars == sorted(pvars, reverse=True)


def test_irr_root_bracketed(spark):
    row = PENDING["irr_bisection_npv"](spark, SF_SMOKE).collect()[0]
    assert 0.0 < row["irr"] < 1.0
    assert row["iters"] == 41


def test_amortization_clears_and_conserves(spark):
    rows = sorted(PENDING["amortization_schedule"](spark, SF_SMOKE).collect(),
                  key=lambda r: r["month"])
    assert len(rows) == 24
    assert rows[-1]["bal_after"] == 0
    for r in rows:
        assert r["interest"] + r["principal_part"] == r["payment"]
        assert r["bal_after"] == r["bal_before"] - r["principal_part"]
    # principal grows / interest falls as balance amortizes
    assert rows[0]["interest"] > rows[-1]["interest"]


def test_bond_duration_orderings(spark):
    row = PENDING["bond_duration_convexity"](spark, SF_SMOKE).collect()[0]
    assert 0 < row["modified_yr"] < row["macaulay_yr"] < 5.0
    assert row["convexity_yr2"] > 0
    assert row["price"] > 0


# --- Block E: multivariate stats -------------------------------------------------


def test_ols_recovers_scale(spark):
    row = PENDING["ols_two_predictors"](spark, SF_SMOKE).collect()[0]
    assert row["n"] > 100
    # daily revenue rises with order count: positive order coefficient
    assert row["beta_orders"] > 0


def test_mahalanobis_topk_sorted_positive(spark):
    rows = PENDING["mahalanobis_outliers_2d"](spark, SF_SMOKE).collect()
    assert len(rows) == 10
    ds = [r["maha_d2"] for r in rows]
    assert ds == sorted(ds, reverse=True) and ds[-1] > 0


def test_pca_ratio_bounds(spark):
    row = PENDING["pca_eigen_2d"](spark, SF_SMOKE).collect()[0]
    assert 0.5 <= row["explained_ratio"] <= 1.0
    assert 0.0 <= row["condition_inv"] <= 1.0


def test_gbst_gains_positive_and_ordered(spark):
    rows = sorted(PENDING["gradient_boost_stumps"](spark, SF_SMOKE).collect(),
                  key=lambda r: r["round"])
    assert [r["round"] for r in rows] == [1, 2]
    assert rows[0]["feature"] == "priority" and rows[1]["feature"] == "month"
    assert all(r["gain_usd2"] > 0 for r in rows)
    assert rows[0]["mean_left"] != rows[0]["mean_right"]


def test_isotonic_fit_is_monotone(spark):
    rows = sorted(PENDING["isotonic_regression_pav"](spark, SF_SMOKE).collect(),
                  key=lambda r: r["d"])
    fits = [r["fitted"] for r in rows]
    assert len(fits) >= 25
    assert all(a <= b + 1e-9 for a, b in zip(fits, fits[1:]))  # monotone
    assert len(set(fits)) > 1  # not a constant pool


# --- Block F: SQL-surface parity ---------------------------------------------------


def test_exclude_frames_identities(spark):
    rows = PENDING["window_exclude_frames_parity"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        if r["ex_group"] is not None and r["ex_current"] is not None:
            # ties = group + own value
            assert r["ex_ties"] == r["ex_group"] + r["v"]
            assert r["ex_current"] >= r["ex_group"]


def test_qualify_top2_above_mean(spark):
    rows = PENDING["qualify_filter_parity"](spark, SF_SMOKE).collect()
    assert rows
    per = {}
    for r in rows:
        per.setdefault(r["mth"], []).append(r)
    assert all(len(v) <= 2 for v in per.values())


def test_regex_paths_classes_nonvacuous(spark):
    row = PENDING["sessions_regex_path"](spark, SF_SMOKE).collect()[0]
    assert row["n_sessions"] > 0
    assert 0 < row["starts_view"] < row["n_sessions"]
    assert row["view_to_purchase"] <= row["starts_view"] + row["n_sessions"]
    assert row["bounces"] > 0


# --- Block G/I: sketches + streaming -------------------------------------------------


def test_cms_overestimate_only(spark):
    rows = PENDING["count_min_sketch_audit"](spark, SF_SMOKE).collect()
    assert len(rows) == 20
    assert all(r["overestimate"] >= 0 for r in rows)
    assert any(r["overestimate"] > 0 for r in rows)  # collisions real at 64 wide


def test_bloom_fpr_in_theory_band(spark):
    row = PENDING["bloom_fpr_audit"](spark, SF_SMOKE).collect()[0]
    assert row["bits_set"] <= 3 * row["n_members"]
    assert 0.0 <= row["fpr"] < 0.5
    assert row["false_positives"] <= row["n_probes"]


def test_stream_cms_overestimate_only(spark):
    rows = PENDING["stream_cms_incremental"](spark, SF_SMOKE).collect()
    assert len(rows) == 20
    assert all(r["overestimate"] >= 0 for r in rows)


def test_stream_sessionize_spans_batches(spark):
    rows = PENDING["stream_sessionize_differential"](spark, SF_SMOKE).collect()
    assert rows
    assert all(r["user_id"] >= 0 for r in rows)  # sentinel filtered
    assert all(r["session_end"] > r["session_start"] for r in rows)


def test_stream_cdc_latest_only(spark):
    rows = PENDING["stream_cdc_upsert_latest"](spark, SF_SMOKE).collect()
    assert rows
    keys = [r["c_custkey"] for r in rows]
    assert len(keys) == len(set(keys))  # upsert kept one row per key
    assert {r["last_seq"] for r in rows} <= {1, 2, 3}
    assert max(r["last_seq"] for r in rows) == 3


# --- Block H/J/K: geo, corpus, ops, graphs --------------------------------------------


def test_geohash_pairs_within_radius(spark):
    rows = PENDING["geohash_prefix_radius"](spark, SF_SMOKE).collect()
    for r in rows:
        assert 0 <= r["d2"] <= 100_000_000
        assert r["a_key"] < r["b_key"]


def test_amplified_jaccard_thresholded_exact(spark):
    rows = PENDING["corpus_amplified_jaccard"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["inter"] * 10 >= r["un"] * 8  # exact threshold held
        assert r["inter"] <= r["un"]
    # v=0 vs v=1 (3% drop) should qualify for most docs
    assert sum(1 for r in rows if (r["v1"], r["v2"]) == (0, 1)) > 100


def test_amplified_minhash_matches_exact_pairs(spark):
    """Differential promised at staging: banded MinHash-LSH over the
    amplified variants of a doc sample must recover EXACTLY the >= 0.8
    exact-Jaccard same-doc pair set (128/32 bands: miss prob < 1e-7 at
    j >= 0.8)."""
    from pyspark.sql import functions as F

    from etl_mini_spark.operators.dedup import near_dup_pairs_minhash_lsh
    from etl_mini_spark.queries import QUERIES
    from etl_mini_spark.queries._base import _t

    exact = {
        (r["doc_id"] * 10 + r["v1"], r["doc_id"] * 10 + r["v2"])
        for r in QUERIES["corpus_amplified_jaccard"](spark, SF_SMOKE).collect()
    }
    d = _t(spark, SF_SMOKE, "documents").where(F.col("doc_id") % 5 == 0)
    toks = d.select(
        "doc_id",
        F.posexplode(
            F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " ")
        ).alias("pos", "tok"),
    )
    vgrid = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("v")
    bucket = (
        F.conv(F.substring(F.md5(F.concat_ws(":", F.col("doc_id").cast("string"),
                                             F.col("v").cast("string"),
                                             F.col("pos").cast("string"),
                                             F.lit("amp"))), 1, 15), 16, 10)
        .cast("long") % 100
    )
    variants = (
        toks.select("doc_id", "tok", "pos", vgrid)
        .filter(bucket >= 3 * F.col("v"))
        .groupBy((F.col("doc_id") * 10 + F.col("v")).alias("doc_id"))
        .agg(F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                        lambda s: s.tok), " ").alias("text"))
    )
    # unigram shingles to match the token-set Jaccard of the exact entry
    got = near_dup_pairs_minhash_lsh(
        variants, "doc_id", "text", n=1, threshold=0.8
    )
    sample_exact = {(a, b) for a, b in exact if (a // 10) % 5 == 0}
    got_pairs = {
        (min(r["d1"], r["d2"]), max(r["d1"], r["d2"]))
        for r in got.collect()
        if r["d1"] // 10 == r["d2"] // 10  # same-doc pairs, like the exact set
    }
    assert got_pairs == sample_exact


def test_url_canonical_counts(spark):
    row = PENDING["url_canonicalize_dedup"](spark, SF_SMOKE).collect()[0]
    n_docs = row["n_urls"] // 4
    # variants 1-3 collapse; the rev= variant survives per doc
    assert row["n_canonical"] == 2 * n_docs
    assert row["n_dups"] == 2 * n_docs
    assert row["n_with_real_params"] == n_docs


def test_binary_header_parse_roundtrip(spark):
    rows = PENDING["binary_header_metadata"](spark, SF_SMOKE).collect()
    assert sum(r["n"] for r in rows) == 500
    for r in rows:
        assert 1 <= r["channels"] <= 4
        assert r["max_w"] < 1920 and r["max_h"] < 1080
        assert r["total_px"] > 0


def test_newsvendor_quantile_bounds(spark):
    rows = PENDING["newsvendor_quantile_policy"](spark, SF_SMOKE).collect()
    assert len(rows) >= 5
    for r in rows:
        assert r["min_demand"] <= r["order_upto_q75"] <= r["max_demand"]


def test_kcore_monotone_shrink(spark):
    rows = {r["round"]: r for r in PENDING["graph_kcore_peel"](spark, SF_SMOKE).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["nodes"] >= rows[2]["nodes"] >= rows[3]["nodes"] > 0
    assert rows[1]["edges"] >= rows[2]["edges"] >= rows[3]["edges"]


def test_link_prediction_nonedges_scored(spark):
    rows = PENDING["graph_jaccard_link_prediction"](spark, SF_SMOKE).collect()
    assert rows
    js = [r["jaccard"] for r in rows]
    assert js == sorted(js, reverse=True)
    for r in rows:
        assert 0 < r["jaccard"] <= 1.0
        assert r["inter"] <= r["un"]


# --- Block L: late additions --------------------------------------------------


def test_erlang_c_stability_monotone(spark):
    rows = sorted(PENDING["erlang_c_staffing"](spark, SF_SMOKE).collect(),
                  key=lambda r: r["n"])
    assert rows
    ws = [r["wait_prob"] for r in rows]
    assert all(0.0 <= w <= 1.0 for w in ws)
    assert ws == sorted(ws, reverse=True)  # more agents, less waiting
    assert all(r["n"] > r["offered_load"] for r in rows)  # only stable queues


def test_ares_sample_weight_biased(spark):
    from pyspark.sql import functions as F

    from etl_mini_spark.queries._base import _t

    rows = PENDING["weighted_sample_ares"](spark, SF_SMOKE).collect()
    assert len(rows) == 32
    ks = [r["k9"] for r in rows]
    assert ks == sorted(ks, reverse=True)
    pop_mean = (
        _t(spark, SF_SMOKE, "documents").where(F.col("n_chars") > 0)
        .agg(F.avg("n_chars")).collect()[0][0]
    )
    sample_mean = sum(r["wt"] for r in rows) / len(rows)
    assert sample_mean > pop_mean  # weighting biases toward long docs


def test_page_hinkley_stat_nonnegative(spark):
    rows = PENDING["page_hinkley_drift"](spark, SF_SMOKE).collect()
    assert len(rows) >= 25
    assert all(r["ph_stat"] >= 0.0 for r in rows)
    assert all(r["running_mean"] > 0.0 for r in rows)


def test_walk_forward_folds_complete(spark):
    rows = sorted(PENDING["walk_forward_validation"](spark, SF_SMOKE).collect(),
                  key=lambda r: r["fold"])
    assert [r["fold"] for r in rows] == [1, 2, 3]
    for r in rows:
        assert r["n_test"] == 5
        assert r["abs_err_cents"] >= 0
        assert abs(r["mae_usd"] - round(r["abs_err_cents"] / 5 / 100.0, 2)) < 0.02


def test_hw_multiplicative_tracks_level(spark):
    rows = PENDING["holt_winters_multiplicative"](spark, SF_SMOKE).collect()
    assert len(rows) >= 20
    assert all(r["level"] > 0 for r in rows)
    assert all(r["fitted"] > 0 for r in rows)
    assert len({r["fitted"] for r in rows}) > 10  # seasonals actually vary


# --- Block M: REAL multimodal decode ------------------------------------------


def test_multimodal_decode_real_known_dims(spark):
    rows = {r["file_name"]: r for r in PENDING["multimodal_decode_real"](spark, SF_SMOKE).collect()}
    assert len(rows) == 9
    assert (rows["imgreal_a.png"]["width"], rows["imgreal_a.png"]["height"]) == (37, 23)
    assert (rows["imgreal_d.jpg"]["width"], rows["imgreal_d.jpg"]["height"]) == (320, 200)
    # FF-padded JPEG (fill bytes before DQT/SOF0): the marker-walk skip
    assert (rows["imgreal_i.jpg"]["width"], rows["imgreal_i.jpg"]["height"]) == (77, 55)
    assert (rows["imgreal_f.gif"]["width"], rows["imgreal_f.gif"]["height"]) == (101, 67)
    assert rows["imgreal_g.wav"]["format"] == "wav" and rows["imgreal_g.wav"]["width"] is None
    assert rows["imgreal_h.blob"]["format"] is None


def test_multimodal_resize_real_covers_all_pngs(spark):
    rows = PENDING["multimodal_resize_real"](spark, SF_SMOKE).collect()
    assert {r["file_name"] for r in rows} == {"imgreal_a.png", "imgreal_b.png", "imgreal_c.png"}
    assert all(r["width"] == 8 and r["height"] == 8 for r in rows)
    assert len({r["out_md5"] for r in rows}) == 3  # distinct images -> distinct digests


def test_multimodal_features_real_conserves_pixels(spark):
    rows = PENDING["multimodal_features_real"](spark, SF_SMOKE).collect()
    per = {}
    for r in rows:
        per[r["file_name"]] = per.get(r["file_name"], 0) + r["cnt"]
    # histogram mass == pixel count of each fixture
    assert per == {"imgreal_a.png": 37 * 23, "imgreal_b.png": 64 * 48, "imgreal_c.png": 17 * 31}


def test_png_decoder_rejects_unsupported_and_parser_handles_truncation():
    import pytest as _pytest

    from etl_mini_spark.operators.multimodal import decode_png_pixels, parse_media_header

    assert parse_media_header(b"") == (None, None, None)
    assert parse_media_header(b"\xff\xd8\xff") == ("jpeg", None, None)  # truncated walk
    # magic-only PNG (the legacy img_a.bin shape): format, NULL dims
    assert parse_media_header(b"\x89PNG\r\n\x1a\x0a" + b"\x00" * 20)[1] is None
    with _pytest.raises(ValueError):
        decode_png_pixels(b"not a png at all")
    # r13-advice guards: ALL malformed-input failures surface as ValueError
    import struct as _struct
    import zlib as _zlib

    def _chunk(tag, body):
        return (_struct.pack(">I", len(body)) + tag + body
                + _struct.pack(">I", _zlib.crc32(tag + body) & 0xFFFFFFFF))

    magic = b"\x89PNG\r\n\x1a\n"
    with _pytest.raises(ValueError):  # IHDR body shorter than 13 bytes
        decode_png_pixels(magic + _chunk(b"IHDR", _struct.pack(">II", 4, 4) + b"\x08"))
    ihdr = _struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    with _pytest.raises(ValueError):  # corrupt IDAT zlib stream
        decode_png_pixels(magic + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", b"garbage!"))
    # FF fill bytes before a marker are skipped (padded-JPEG walk)
    sof0 = b"\xff\xff\xff\xc0" + _struct.pack(">H", 11) + b"\x08" + _struct.pack(">HH", 9, 7) + b"\x01\x11\x00"
    assert parse_media_header(b"\xff\xd8" + sof0) == ("jpeg", 7, 9)


def test_extract_features_real_rejects_non_divisor_bins(spark):
    import pytest as _pytest

    from pyspark.sql import functions as F

    from etl_mini_spark.operators.multimodal import extract_features_real

    df = spark.range(1).select(F.col("id").alias("media_id"), F.lit(None).cast("binary").alias("payload"))
    with _pytest.raises(ValueError, match="divisor of 256"):
        extract_features_real(df, "media_id", bins=10)
    with _pytest.raises(ValueError, match="divisor of 256"):
        extract_features_real(df, "media_id", bins=512)
