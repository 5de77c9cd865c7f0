"""Pin the driver-graded window: the first 50 registered catalog entries.

The driver grades only the first 50 REGISTRY entries; this test fails if a
new registration accidentally displaces a flagship, or if any §2 family
loses its representative inside the window.
"""

from __future__ import annotations

from esgopeta_spark.plans import GRADED_WINDOW, REGISTRY

REQUIRED_IN_WINDOW = {
    # one flagship per §2 family the verdict called out as invisible in r1/r2
    "join_asof_purchase_click",  # E3 as-of (non-equi family rep; the
    # range join rotated to parity-only in late r9 for the CCNet
    # perplexity-bucket flagship)
    "skew_salted_join",  # skew handling (the agg twin rotated to
    # parity-only in r10 for the selection-pipeline terminal step)
    "graph_put_replay",  # group B (put + lazy parents)
    "graph_fetch_path",  # group A (fetch path, D1 null-vs-absent)
    "graph_ham_stream_replay",  # F5 oracle twin
    "graph_pagerank_transactions",  # GraphX analytics
    # (r12 rotations: triangles -> parity (the demotion the r11 verdict
    # named; analytics stays graded via pagerank + LPA),
    # dedup_embedding_components -> parity (the min-label closure stays
    # graded inside dedup_semantic_kmeans), agg_histogram_quantiles ->
    # parity (E4 stays 3-deep), plain anti join -> parity (E3 stays
    # 3-deep + the incremental-snapshot capstone carries an anti stage))
    # r8 rotations: ngram_jaccard + date battery to parity-only (their
    # families keep in-window reps); the image/audio near-dup flagships
    # in — G2 dedup graded across modalities
    "dedup_image_dhash",
    # (r14 rotations, all pre-named in the r13 verdict / COVERAGE.md:
    # dedup_audio_fingerprint -> parity (G2 stays 4-deep, media keeps
    # mp3 + PDF paths + the zstd decode), graph_communities_lpa ->
    # parity (analytics stays graded via pagerank; A1 stays 3-deep),
    # select_mixture_materialize -> parity (selection stays 3-deep via
    # DSIR + NB langid + PSI), join_bloom_semi_lineitem -> parity (E3
    # stays 3+ deep via as-of + skew-salted + q3 + the snapshot
    # capstone's anti stage), text_profile_docs -> parity (G4 stays
    # ~14-deep) — for the r13 capability classes' first graded reps)
    "pivot_status_by_priority",  # E4 pivot (unpivot rotated to
    # parity-only in late r9 for the image-stats strong-oracle entry)
    "sessionize_events_islands",  # E5 gaps-and-islands
    "sim_topk_cosine_ivf",  # G3 scale tier (r4: graded, not just the exact oracle tier)
    # r9 rotations: png -> parity (image decode stays graded via
    # dedup_image_dhash's PNG path), exact cosine -> parity (IVF/PQ keep
    # G3); r11: FLAC -> parity (media stays graded via the image-stats
    # value-exact oracle + the strictly-deeper mp3 decode)
    "select_dsir_scores",  # G4 targeted data selection (milli-log2)
    # r9 late rotations: range join + unpivot to parity-only (families
    # keep in-window reps via as-of + pivot)
    # (r13 rotations: select_perplexity_buckets -> parity (selection
    # stays 3-deep via DSIR + mixture + NB langid; E5 via win_topk +
    # sessionize), multimodal_image_stats -> parity (media stays via
    # mp3 + image-dhash's PNG path + the G5-tagged font-remap),
    # dedup_substring_spans -> parity (G2 stays 5-deep incl. the
    # family-PassJoin), agg_cms_heavy_hitters -> parity (the sketch
    # family's graded rep becomes KMV overlap))
    # r5 rotation (r4 VERDICT task 1): the r4 flagship LLM/graph ops
    "dedup_semantic_kmeans",  # G2/G3 SemDeDup full pipeline, hash-exact
    # (r10 rotations: sim_topk_ip_pq -> parity (G3 stays via IVF),
    # graph_kcore_members -> parity (graph analytics stays 4-deep),
    # join_full_customer_supplier -> parity (E3 stays 5-deep),
    # skew_salted_agg -> parity (skew stays via the join twin) — making
    # room for the crawl front-end + selection/time-series depth below)
    # r6 additions (emb_label_stats / theta-band join / json battery rotated
    # out; their families keep in-window representatives)
    # r10 additions: the crawl front-end (where real pipelines start)
    # and the late-r9 families' graded representatives
    "text_html_extract",  # G4 HTML->text, encoder-twin closed-form oracle
    "web_url_canonical_dedup",  # G1/G4 URL canonicalization + dedup
    "ts_ewma_daily",  # keyed-recursion family (recursive-CTE oracle)
    # r8 rotation (r7 VERDICT task 8): Layer III (mp3) in for its Layer
    # I/II sibling — same decoder family, strictly deeper machinery (side
    # info, bit reservoir, Huffman regions, hybrid MDCT, short blocks);
    # mp2 stays parity-checked beyond the window
    "multimodal_decode_mp3_audio",  # G5 real compressed-audio round trip
    # r7 rotation (r6 VERDICT task 3): hash-exact second-batch flagships
    # in; q18 (TPC-H depth — q1/q3 + 15 parity TPC-H queries keep the
    # family), agg_median_price (percentiles stay via the histogram
    # sketch), plain semi join (Bloom twin IS a semi join) and BFS
    # (weighted superset graded) rotated to parity-only
    # (r11 rotations: cheapest-path -> parity — iterative-frontier stays
    # graded via pagerank + LPA; gap-fill/LOCF -> parity — time-series
    # stays graded via ts_ewma_daily; left join -> parity — E3 stays
    # 4-deep with richer shapes; FLAC -> parity as noted above)
    # r11 additions: the crawl loop's last ingest gap + the round's
    # capstones
    "text_pdf_extract",  # G4/G5 bounded PDF parser, encoder-twin oracle
    "web_redirect_resolve",  # G1/G4 redirect chains, visible markers
    "pipeline_crawl_to_shards",  # crawl capstone: warc -> html+pdf -> shards
    "select_nb_langid",  # trained-classifier curation (NB, milli-log2)
    # r12 additions: the r11 capability classes' first graded reps
    "web_content_encoding",  # wire-encoding unwrap (gzip/deflate/chunked)
    "web_template_lines",  # cross-page host-template boilerplate cut
    "decontaminate_minhash_fuzzy",  # fuzzy benchmark decontamination
    "pipeline_incremental_snapshot",  # nightly-update capstone
    # r13 additions: the r12 capability classes' first graded reps
    "text_pdf_font_remap",  # G4/G5 /Differences + Identity-H/ToUnicode path
    "dedup_fuzzy_family_titles",  # G2/E3 per-family PassJoin + LCP fold
    "web_xrobots_gate",  # G4/E1 header robots gate (r13-hardened parser)
    "sketch_kmv_overlap",  # E4/G1 mergeable set-algebra sketch
    # r14 additions: the r13 capability classes' first graded reps
    "web_zstd_house_decode",  # G4/G5/E1 from-scratch RFC 8878 decode, libzstd input
    "mine_bitext_margin_ivf",  # G3/G4 bitext mining, production IVF tier
    "text_unicode_fold",  # G4 NFKC-lite normalization
    "text_pdf_filters",  # G4/G5 PDF LZW/RunLength/ASCII85 stream filters
    "corpus_drift_psi",  # E4/G4 PSI snapshot-drift alarm (integer milli-log2)
}


def test_window_is_exactly_50():
    assert len(GRADED_WINDOW) == 50
    assert len(set(GRADED_WINDOW)) == 50


def test_registry_leads_with_window():
    assert list(REGISTRY)[:50] == GRADED_WINDOW


def test_required_flagships_inside_window():
    missing = REQUIRED_IN_WINDOW - set(GRADED_WINDOW)
    assert not missing, f"flagships fell out of the graded window: {missing}"


def test_window_entries_have_oracles_where_expected():
    # every window entry except explicitly-approximate ones must carry an
    # oracle so the driver records a full value-hash check
    no_oracle = [n for n in GRADED_WINDOW if REGISTRY[n].oracle is None]
    assert no_oracle == [], f"graded-window entries missing oracles: {no_oracle}"


def test_all_section2_groups_covered():
    covered = set()
    for n in GRADED_WINDOW:
        for g in REGISTRY[n].group.split(","):
            covered.add(g.strip())
    for fam in ["E1", "E2", "E3", "E4", "E5", "E6", "E7", "E8", "E9",
                "A1", "A10", "B1", "D1", "D4", "F3", "F4", "F5", "F6",
                "G1", "G2", "G3", "G4", "G5"]:
        assert any(c == fam or c.startswith(fam) for c in covered), f"{fam} not covered in graded window"
