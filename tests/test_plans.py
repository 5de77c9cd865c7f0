"""Physical-plan audits: the scale posture is a claim about PLANS, not
results — these tests pin it.  Each assertion is something that, if it
regressed, would silently cost 10-100x at 100 TB while every correctness
test stayed green: filters/projection no longer reaching the parquet
scan, a dimension join falling back to sort-merge, an LSH candidate join
degenerating into a cartesian product."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from esgopeta_spark.session import read_table


def plan_of(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_filter_and_projection_pushdown(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    q = li.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    p = plan_of(q)
    assert "PushedFilters: [" in p and "GreaterThan(l_quantity" in p, p
    # column pruning: the scan must not read the full 11-column schema
    assert "l_extendedprice" not in p.split("ReadSchema")[1].splitlines()[0]


def test_partition_filter_pushdown_on_ts(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    # ts is reconstructed from nanos (projection), but event_type is raw ->
    # its filter must still reach the scan
    q = ev.filter(F.col("event_type") == "click").select("event_id")
    p = plan_of(q)
    assert "EqualTo(event_type,click)" in p, p


def test_dimension_join_broadcasts(spark, sf_dir):
    from esgopeta_spark.plans import REGISTRY

    q3 = REGISTRY["q3_shipping_priority"].fn(spark, sf_dir)
    p = plan_of(q3)
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p


def test_lsh_candidate_join_is_equi_not_cartesian(spark, sf_dir):
    from esgopeta_spark.operators.dedup import minhash_lsh_candidates

    d = read_table(spark, sf_dir, "documents")
    p = plan_of(minhash_lsh_candidates(d))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # the self-join must key on (band, band-hash)
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p or "BroadcastHashJoin" in p


def test_range_join_is_bucketed_equi(spark, sf_dir):
    from esgopeta_spark.operators.asof import range_join

    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    supp = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", (F.col("s_acctbal") - 50).alias("_lo"), (F.col("s_acctbal") + 50).alias("_hi")
    )
    p = plan_of(range_join(cust, supp, "c_acctbal", "_lo", "_hi", 100.0))
    assert "CartesianProduct" not in p, "range join fell back to a cross product"


def test_topk_cosine_broadcasts_queries_not_corpus(spark, sf_dir):
    """r14 posture: the bounded query block is DRIVER state shipped into
    one Arrow scoring pass (the assign_cells envelope) — no join of any
    kind remains, the corpus never shuffles, and only per-partition
    top-k candidates reach the window exchange."""
    from esgopeta_spark.operators.similarity import topk_cosine

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0).select(F.col("vec_id").alias("query_id"), "embedding")
    p = plan_of(topk_cosine(emb, q, k=5, dim=64))
    assert "MapInPandas" in p, p
    assert "CartesianProduct" not in p and "Join" not in p, p
    # exactly one keyed exchange: the per-query window over the pruned
    # candidates (formatted explain prints the partitioning once, in the
    # node's detail block)
    assert p.count("hashpartitioning(query_id") == 1, p


def test_topk_cosine_lsh_is_single_arrow_pass(spark, sf_dir):
    """r14 posture (session 2): the LSH tier gets the same treatment as
    the exact/IVF tiers — query block + its per-table buckets are driver
    state, the corpus is bucketed and scored in one Arrow pass, no join
    and no posexploded bucket stream remain, and only per-partition
    top-k candidates reach the window exchange."""
    from esgopeta_spark.operators.similarity import topk_cosine_lsh

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0).select(F.col("vec_id").alias("query_id"), "embedding")
    p = plan_of(topk_cosine_lsh(emb, q, dim=64, k=5, n_planes=6, n_tables=4))
    assert "MapInPandas" in p, p
    assert "CartesianProduct" not in p and "Join" not in p, p
    assert "Generate" not in p, p  # no posexplode of per-table buckets
    assert p.count("hashpartitioning(query_id") == 1, p


def test_agg_has_partial_aggregation(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("s"))
    p = plan_of(q)
    # map-side combine: two HashAggregate NODES around the exchange
    # (formatted explain prints each node twice: tree line + detail header)
    import re

    n_aggs = len(re.findall(r"^\(\d+\) HashAggregate", p, re.M))
    assert n_aggs >= 2, p


def test_asof_join_single_shuffle_on_key(spark, sf_dir):
    from esgopeta_spark.operators.asof import asof_join

    ev = read_table(spark, sf_dir, "events")
    l = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    r = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("value").alias("cv")
    )
    p = plan_of(asof_join(l, r, "user_id", "ts", "cts", ["cts", "cv"]))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # union + window carry: exactly one exchange feeding the sort/window
    # (formatted explain prints each node twice: tree line + detail header)
    import re

    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", p, re.M))
    assert n_exchanges == 1, p


def test_q19_hull_prefilters_reach_both_scans(spark, sf_dir):
    """The disjunction spans the join, but its single-table hulls must
    still be pushed: brand IN-list on the part scan, quantity range on
    the lineitem scan."""
    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["q19_disjunctive_revenue"].fn(spark, sf_dir))
    assert "In(p_brand" in p, p
    assert "GreaterThanOrEqual(l_quantity,1" in p and "LessThanOrEqual(l_quantity,3" in p, p
    assert "BroadcastHashJoin" in p and "CartesianProduct" not in p


def test_q17_semi_prune_before_per_part_agg(spark, sf_dir):
    """The brand/size filter must reach the part scan and the lineitem
    restriction must be a broadcast semi join — the per-part average only
    runs over surviving parts."""
    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["q17_small_quantity_revenue"].fn(spark, sf_dir))
    assert "EqualTo(p_brand,Brand#13)" in p and "LessThan(p_size,10)" in p, p
    assert "LeftSemi" in p and "BroadcastHashJoin" in p, p


def test_triangles_all_joins_equi(spark, sf_dir):
    """Degree-oriented wedge enumeration must stay equi-join end to end
    (a cartesian fallback here is quadratic in the edge set)."""
    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["graph_triangles_coorder"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


def test_fetch_path_hops_stay_equi_and_broadcast(spark, sf_dir):
    """graph_fetch_path's two traversal hops + terminal value read are
    equi-joins on the (small) relation slices — they must broadcast, and
    nothing may fall back to cartesian/nested-loop."""
    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["graph_fetch_path"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    assert "BroadcastHashJoin" in p, p


def test_stream_replay_is_single_key_shuffle(spark, sf_dir):
    """graph_ham_stream_replay: one exchange on (soul, field) feeding the
    Arrow grouped-map handler; a second exchange would mean the groupBy
    key got re-derived downstream."""
    import re

    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["graph_ham_stream_replay"].fn(spark, sf_dir))
    assert "FlatMapGroupsInPandas" in p, p
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", p, re.M))
    assert n_exchanges == 1, p


def test_pagerank_contribution_agg_is_partial(spark, sf_dir):
    """Each iteration's contribution sum must keep map-side partial
    aggregation (HashAggregate appears in partial+final pairs)."""
    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["graph_pagerank_transactions"].fn(spark, sf_dir))
    assert "partial_sum" in p or "Partial" in p, p
    assert "CartesianProduct" not in p


def test_png_entry_scan_prunes_to_doc_id(spark, sf_dir):
    """The PNG round-trip entry must read ONE column (doc_id) — pulling
    text/n_chars through the Arrow boundary for a codec kernel would be
    a silent 50x IO cost on a wide documents table at scale."""
    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["multimodal_decode_png"].fn(spark, sf_dir))
    assert "MapInPandas" in p, p
    read_schema = p.split("ReadSchema")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" not in read_schema, read_schema
    assert "Exchange" not in p.split("MapInPandas")[0].split("Scan parquet")[0], p


def test_q12_join_keeps_partial_agg_no_cartesian(spark, sf_dir):
    """q12's lineitem-orders join must stay a hash/sort-merge equi-join
    with map-side partial aggregation for the priority split counts."""
    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["q12_shipmode_priority"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    assert "partial_sum" in p or "Partial" in p, p
    # the shipdate window filter must reach the lineitem scan
    assert "PushedFilters" in p and "l_shipdate" in p.split("PushedFilters")[1][:400], p


def test_semantic_dedup_pair_join_is_equi_on_cell(spark, sf_dir):
    """The SemDeDup pair stage must be scoped to the cluster cell —
    a cartesian fallback would be the O(n^2) the method exists to avoid.
    r14 posture: pairs + components + verdicts run inside ONE grouped
    Arrow kernel per cell (bounded at ~n/k rows, the same envelope the
    former cell-equi pair join relied on), so the plan must show the
    cell-keyed group exchange feeding FlatMapGroupsInPandas and no join
    of any kind.  (Plan is built on the registered entry = the graded
    surface.)"""
    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["dedup_semantic_kmeans"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p and "Join" not in p, p
    assert "FlatMapGroupsInPandas" in p, p
    assert "hashpartitioning(cell" in p, p


def test_substring_spans_shared_grams_broadcast_back(spark, sf_dir):
    """ADAPTIVE posture: at sf0.1 the shared-gram set is small, so the
    size gate broadcasts it back onto the gram stream; the gram rollup
    must keep map-side partial aggregation."""
    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["dedup_substring_spans"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p
    assert p.count("HashAggregate") >= 4, p  # partial+final for both rollups


def test_substring_spans_broadcast_gate_falls_back_to_shuffle(spark):
    """When the shared-gram set exceeds broadcast_max_rows the forced
    broadcast hint MUST NOT appear — a data-dependent unbounded relation
    force-broadcast at 100 TB OOMs the driver (broadcast hints bypass
    autoBroadcastJoinThreshold).  Forced here via broadcast_max_rows=0 on
    a synthetic corpus; values must be identical on both paths."""
    from esgopeta_spark.operators.dedup import duplicated_ngram_spans

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta common tail") for i in range(6)]
        + [(100 + i, f"unique{i} words only here nothing shared at all {i}") for i in range(4)],
        "doc_id bigint, text string",
    )
    # the hint is injected pre-optimization, so assert on the analyzed
    # logical plan: no ResolvedHint/UnresolvedHint node may survive
    gated = duplicated_ngram_spans(docs, n=3, broadcast_max_rows=0)
    logical = gated._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in logical and "UnresolvedHint" not in logical, logical
    hinted = duplicated_ngram_spans(docs, n=3)  # default gate: broadcasts
    assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()
    a = {tuple(r) for r in gated.collect()}
    b = {tuple(r) for r in hinted.collect()}
    assert a == b and len(a) > 0


def test_image_dhash_plan_posture(spark, sf_dir):
    """Image and audio near-dup must join on the banded-chunk EQUI keys
    (shared banded_hamming_pairs path) — no cartesian, no nested-loop."""
    from esgopeta_spark.plans import REGISTRY

    for entry in ("dedup_image_dhash", "dedup_audio_fingerprint",
                  "dedup_video_shared_frames", "dedup_cdc_file_pairs"):
        p = plan_of(REGISTRY[entry].fn(spark, sf_dir))
        assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
        assert "SortMergeJoin" in p or "BroadcastHashJoin" in p or "ShuffledHashJoin" in p, p


def test_portable_pairs_plan_posture(spark, sf_dir):
    """The r10 portable-hash near-dup twins must keep the production
    paths' join shape: equi self-join on (band, bh) / (chunk, value) —
    no cartesian, no nested loop."""
    from esgopeta_spark.plans import REGISTRY

    for entry in ("dedup_minhash_pairs_portable", "dedup_simhash_pairs_portable",
                  "dedup_fuzzy_titles"):
        p = plan_of(REGISTRY[entry].fn(spark, sf_dir))
        assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
        assert "SortMergeJoin" in p or "BroadcastHashJoin" in p or "ShuffledHashJoin" in p, p


def test_family_fuzzy_join_plan_posture(spark, sf_dir):
    """The r12 per-family PassJoin: the candidate join is an EQUI join
    whose key set INCLUDES the family column (the scope that keeps one
    family's boilerplate out of another's buckets); the family->lcp map
    joins broadcast; no cartesian, no nested loop."""
    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["dedup_fuzzy_family_titles"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    assert "SortMergeJoin" in p or "BroadcastHashJoin" in p or "ShuffledHashJoin" in p, p
    # the family key participates in the candidate equi join
    assert "fam" in p, p


def test_sitemap_recursion_plan_posture(spark, sf_dir):
    """The r11 recursive sitemap expansion: every store probe and the
    seen anti-join are url-EQUI joins; no cartesian, no nested loop."""
    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["pipeline_sitemap_recursion"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


def test_ivfpq_plan_posture(spark, sf_dir):
    """The r11 composed IVF-PQ tier: the ADC stage joins on the CELL
    equi key with the per-query probe/LUT side broadcast; no cartesian,
    no nested loop anywhere in the lineage."""
    from esgopeta_spark.plans import REGISTRY

    import re

    p = plan_of(REGISTRY["sim_topk_ivfpq"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p, p
    # the ONLY nested loop allowed is the deliberate queries x bounded-
    # codebook probe (the same shape the graded IVF tier carries); the
    # corpus-touching joins must all be hash-equi (formatted plans list
    # each node in the tree AND the numbered detail section — count the
    # detail form)
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", p)) <= 1, p
    assert "BroadcastHashJoin" in p, p


def test_redirect_collapse_plan_posture(spark, sf_dir):
    """The r11 redirect entries: every pointer-doubling round and the
    frontier's map application are url-EQUI joins on the canonical key
    — no cartesian, no nested loop anywhere in either lineage."""
    from esgopeta_spark.plans import REGISTRY

    for entry in ("web_redirect_resolve", "pipeline_crawl_frontier"):
        p = plan_of(REGISTRY[entry].fn(spark, sf_dir))
        assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
        assert "SortMergeJoin" in p or "BroadcastHashJoin" in p or "ShuffledHashJoin" in p, p


def test_html_extract_plan_posture(spark, sf_dir):
    """The crawl front-end entries are projection/aggregate shaped: the
    extraction is one Arrow kernel over one documents scan (no join at
    all), the URL dedup is one groupBy after the variant explode, and
    the fused pipeline adds only the split window + final rollup — no
    join node anywhere, ONE scan each.  (pipeline_crawl_frontier moved
    to the redirect-collapse audit in r11: it now carries the url-equi
    redirect map join by design.)"""
    import re

    from esgopeta_spark.plans import REGISTRY

    for entry in ("text_html_extract", "web_url_canonical_dedup",
                  "pipeline_html_to_shards", "web_link_graph",
                  "web_warc_extract", "web_warc_route",
                  "text_html_main_content", "web_robots_filter",
                  "web_crawl_schedule", "web_cdx_index",
                  "web_sitemap_extract",
                  "web_image_captions", "web_charset_route", "web_feed_extract",
                  "text_pdf_extract", "text_pdf_metadata"):
        p = plan_of(REGISTRY[entry].fn(spark, sf_dir))
        assert "Join" not in p and "CartesianProduct" not in p, (entry, p)
        # one scan node (formatted plans list each node in both the tree
        # and the numbered detail section; count the detail form)
        assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, (entry, p)


def test_lm_backoff_plan_posture(spark, sf_dir):
    """The LM familiarity scorer is 5 equi joins against the count
    tables + a 1-row totals cross join — no cartesian over data, no
    nested loop beyond the deliberate single-row broadcast."""
    from esgopeta_spark.plans import REGISTRY

    import re

    p = plan_of(REGISTRY["text_lm_familiarity_backoff"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p, p
    # the only nested-loop node allowed is the 1-row totals cross join
    # (formatted plans print each node in both tree and detail sections)
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", p)) <= 1, p


def test_span_extract_plan_posture(spark, sf_dir):
    """duplicated_span_ranges adds two join-shaped stages over the gram
    pipeline (dup-positions x shared gkeys, spans x doc word arrays): both
    must stay equi — no cartesian — and the islands merge must be a single
    window, not a self-join.  remove_duplicated_spans folds spans to one
    array per doc and must also stay cartesian-free."""
    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["dedup_span_extract"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    import re

    # running-max prev_end + span_id cumsum, counted as distinct plan nodes
    # (the formatted plan prints each node in both tree and detail sections)
    assert len(re.findall(r"\(\d+\) Window", p)) == 2, p
    p2 = plan_of(REGISTRY["dedup_span_removal"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p2 and "BroadcastNestedLoopJoin" not in p2, p2


def test_bfs_round_join_is_equi(spark, sf_dir):
    """Each BFS round = frontier(equi-join on src)edges + left-anti visited
    check; neither may degenerate into a nested-loop shape."""
    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["graph_bfs_hops_nation0"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_derived_partsupp_queries_join_posture(spark, sf_dir):
    """The derived-partsupp TPC-H five: dims broadcast, the only
    nested-loop join is the deliberate 1-row supplier-count scalar
    (broadcast build), and nothing degenerates into a cartesian."""
    from esgopeta_spark.plans import REGISTRY

    for name in (
        "q2_min_cost_supplier", "q9_product_profit", "q11_important_stock",
        "q16_supplier_cnt", "q20_excess_availability",
    ):
        p = plan_of(REGISTRY[name].fn(spark, sf_dir))
        assert "CartesianProduct" not in p, name
        # (formatted explain prints each node twice: tree line + detail header)
        assert p.count("BroadcastNestedLoopJoin Cross BuildRight") == p.count("BroadcastNestedLoopJoin") // 2, name
        assert "BroadcastHashJoin" in p, name


def test_pq_adc_broadcasts_luts_and_stays_narrow(spark, sf_dir):
    from esgopeta_spark.operators.similarity import topk_ip_pq

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0).select(F.col("vec_id").alias("query_id"), "embedding")
    p = plan_of(topk_ip_pq(emb, q, dim=64, k=5))
    # the (codes x LUT) pairing is a cross product BY DESIGN, bounded by
    # the query count — legal only with the tiny LUT side broadcast
    assert "BroadcastNestedLoopJoin" in p, p
    assert "CartesianProduct" not in p
    # the window shuffle must carry (query, nbr, score), never vectors or
    # LUT arrays: no 'lut' or 'vm' column may cross the exchange
    window_part = p.split("Window")[0].split("Exchange")[-1]
    assert "lut" not in window_part and "vm" not in window_part, p


def test_lpa_round_join_is_equi(spark, sf_dir):
    from esgopeta_spark.operators.graph_analytics import label_propagation

    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "k")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy(F.col("pa").alias("ea"), F.col("pb").alias("eb"))
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("ea", "eb")
    )
    p = plan_of(label_propagation(edges, rounds=2, src="ea", dst="eb"))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


def test_kcore_peel_stays_equi(spark, sf_dir):
    """k-core's per-round survivor filters are semi-joins on each endpoint
    — a cartesian/nested-loop fallback would be quadratic in the edge set;
    the degree count must keep map-side partial aggregation."""
    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["graph_kcore_members"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


def test_cms_probe_join_broadcasts_grid(spark, sf_dir):
    """The CMS probe is an equi-join of (key, row, bucket) probes against
    the <= depth*width-row counter grid: the grid side must broadcast (the
    only nested-loop join allowed is the single-row total used by the
    scale-free threshold)."""
    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["agg_cms_heavy_hitters"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p, p


def test_gapfill_grid_joins_equi_no_cartesian(spark, sf_dir):
    """resample_locf: the grid left-join is equi on (key, bucket) and the
    sequence/explode grid stays output-bound — no cartesian anywhere."""
    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["ts_gapfill_daily_locf"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    assert "Generate explode" in p or "Generate" in p, p


def test_bloom_prefilter_is_scan_side_no_extra_shuffle(spark, sf_dir):
    """The Bloom probe must be a pure filter expression evaluated scan-side
    (no join/shuffle introduced by the prefilter itself); the exact join
    stays a broadcast semi."""
    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["join_bloom_semi_lineitem"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    assert "LeftSemi" in p and "BroadcastHashJoin" in p, p
    assert "shiftright" in p, p  # the bitmask probe survived into the plan


def test_hits_joins_equi_no_cartesian(spark, sf_dir):
    """HITS final scaffold (the per-round gathers sit behind lineage
    cuts, like kcore's): the node<-hub<-auth joins must stay keyed —
    no cartesian/nested-loop anywhere in the observable plan."""
    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["graph_hits_transactions"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p or "BroadcastHashJoin" in p, p


def test_dsir_plan_posture(spark, sf_dir):
    """DSIR scoring: the lambda table (<=1024 rows) must broadcast into
    the per-doc bucket counts; the only nested-loop nodes allowed are the
    two 1-row totals cross joins; no cartesian over data."""
    import re

    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["select_dsir_scores"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", p)) <= 2, p
    assert "BroadcastHashJoin" in p, p


def test_entropy_bm25_plan_posture(spark, sf_dir):
    """Entropy/KL: word-keyed corpus join stays equi (no cartesian
    beyond the 1-row totals); BM25: the term filter must reach below the
    (doc,word) aggregate and the df/totals sides broadcast."""
    import re

    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["text_entropy_kl_profile"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", p)) <= 1, p
    p = plan_of(REGISTRY["text_bm25_retrieval"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert "BroadcastHashJoin" in p, p


def test_perplexity_buckets_plan_posture(spark, sf_dir):
    """CCNet bucketing: LM count joins stay equi; the only nested-loop
    node allowed is the 1-row totals cross join; the ntile runs as a
    per-language window (no global sort node feeding a single task from
    a cartesian)."""
    import re

    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["select_perplexity_buckets"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", p)) <= 1, p
    assert "BroadcastHashJoin" in p, p


def test_mixture_materialize_plan_posture(spark, sf_dir):
    """Token-budget mixture: weights and totals broadcast (the only
    nested-loop nodes are the bounded 1-row totals cross joins — the
    entropy pipeline's N, the domain-weight total, and the corpus token
    total); exactly one running-sum window; no cartesian over data."""
    import re

    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["select_mixture_materialize"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", p)) <= 4, p
    assert "BroadcastHashJoin" in p, p
    assert len(re.findall(r"\(\d+\) Window", p)) == 1, p


def test_keyed_recursion_plan_posture(spark, sf_dir):
    """EWMA/Holt: exactly ONE daily partial-agg shuffle plus ONE
    repartition-by-key (the single Arrow pass rides it), one in-partition
    sort, one scan — no per-group operator, no window, no join."""
    import re

    from esgopeta_spark.plans import REGISTRY

    for name in ("ts_ewma_daily", "ts_holt_trend_daily",
                 "ts_holt_winters_daily"):
        p = plan_of(REGISTRY[name].fn(spark, sf_dir))
        assert len(re.findall(r"\(\d+\) Exchange", p)) == 2, (name, p)
        assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, (name, p)
        assert "Join" not in p and "Window" not in p, (name, p)


def test_nb_classifier_plan_posture(spark, sf_dir):
    """NB language-ID: the model (C*B-bounded) must broadcast-hash-join
    into the per-doc bucket counts; the only nested-loop nodes allowed
    are the two bounded-side broadcasts (1-row doc total in training,
    C-row class grid in scoring); no cartesian over data."""
    import re

    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["select_nb_langid"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", p)) <= 2, p
    assert "BroadcastHashJoin" in p, p


def test_anchor_profile_plan_posture(spark, sf_dir):
    """Anchor-target profiles: the extraction kernel must run ONCE (the
    dual-consumer edge relation is localCheckpointed — both branches
    scan the same RDD), the modal-anchor window carries a
    WindowGroupLimit (rank pushdown, no full per-target sort spill),
    and the profile/modal join stays equi — no cartesian, no BNLJ."""
    import re

    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["web_anchor_profile"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    rdds = re.findall(r"MapPartitionsRDD\[\d+\]", p)
    assert len(rdds) == 2 and len(set(rdds)) == 1, rdds
    assert "WindowGroupLimit" in p, p


def test_multimodal_pairs_plan_posture(spark, sf_dir):
    """Caption/media pair capstone: ONE kernel RDD (localCheckpointed)
    feeds both join sides, and the pair join is url-equi — no
    cartesian, no BNLJ."""
    import re

    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["pipeline_multimodal_pairs"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    rdds = re.findall(r"MapPartitionsRDD\[\d+\]", p)
    assert len(rdds) == 2 and len(set(rdds)) == 1, rdds


def test_recrawl_schedule_plan_posture(spark, sf_dir):
    """Freshness recrawl scheduling: one Arrow parse kernel, then
    exactly one exchange — the host-keyed window; no join at all."""
    import re

    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["web_recrawl_schedule"].fn(spark, sf_dir))
    assert "Join" not in p and "CartesianProduct" not in p, p
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", p, re.M))
    assert n_exchanges == 1, p


def test_r12_entries_plan_posture(spark, sf_dir):
    """The r12 wave entries keep the house physical posture: the
    projection/kernel ops (rendezvous, mojibake, VAD, blur) plan no
    join at all; kmv_overlap's state join is hash-equi on the sketch
    hash (bounded <= 2k rows a side); nothing plans a cartesian or a
    data-sized nested loop."""
    from esgopeta_spark.plans import REGISTRY

    for entry in ("shard_rendezvous_stable", "text_fix_mojibake",
                  "multimodal_audio_vad", "multimodal_image_blur"):
        p = plan_of(REGISTRY[entry].fn(spark, sf_dir))
        assert "CartesianProduct" not in p, (entry, p)
        assert "Join" not in p, (entry, p)  # pure projection/kernel lineage
    p = plan_of(REGISTRY["sketch_kmv_overlap"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


def test_r13_entries_plan_posture(spark, sf_dir):
    """The r13 wave entries keep the house physical posture: the
    bitext miner's bipartite score relation is a BROADCAST of the
    benchmark-scale side (never a plain cartesian) and narrows to
    (src_id, tgt_id, cos) before any exchange — vectors stay in the
    scan stage; the PDF-filter and modern content-encoding entries are
    pure Arrow-kernel lineages with no join at all."""
    import re

    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["mine_bitext_margin"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" in p, p  # the bipartite score stage
    # no exchange ships the 64-wide vector: every shuffle below the
    # score stage carries only ids + scalars
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", p):
        assert "embedding" not in m.group(1) and "_sv" not in m.group(1), p
    for entry in ("text_pdf_filters", "web_content_encoding_modern"):
        p = plan_of(REGISTRY[entry].fn(spark, sf_dir))
        assert "CartesianProduct" not in p, (entry, p)
        assert "Join" not in p, (entry, p)


def test_bitext_ivf_plan_posture(spark, sf_dir):
    """The IVF bitext tier never plans the bipartite broadcast cross:
    candidates come from a hash-EQUI join on the coarse cell id (the
    selective-signature discipline), and no exchange ships vectors."""
    import re

    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["mine_bitext_margin_ivf"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", p):
        assert "_sv" not in m.group(1) and "_tv" not in m.group(1), p


def test_coorder_edges_plan_posture(spark, sf_dir):
    """r14 optimization: the co-purchase edge derivation shared by
    graph_triangles_coorder and graph_communities_lpa is one
    collect_set exchange + chained Generates + one pair-agg exchange —
    never the legacy distinct + order-key SELF-JOIN (3 exchanges +
    SMJ).  If a join or a third exchange reappears here, the shared
    derivation has regressed to shuffling the (order, part) relation
    an extra full pass at 100 TB."""
    import re

    from esgopeta_spark.plans.catalog_graphx import _coorder_edges

    p = plan_of(_coorder_edges(spark, sf_dir))
    assert "Join" not in p, p
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 2, p
    assert p.count("Generate") >= 2, p  # the chained pair explodes
