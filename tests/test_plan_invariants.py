"""Physical-plan regression guards: the scale properties PLANS.md documents,
pinned as assertions so an edit that silently loses filter pushdown, column
pruning, a broadcast, or top-k incremental-ification fails pytest instead of
only being visible in the regenerated report.

Uses the same `.explain("formatted")` extraction as tools/plan_report.py.
Queries here are chosen because each pins a DIFFERENT plan property; the
full per-query inventory stays in PLANS.md.
"""

import sys

import pytest

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod
from tools.plan_report import plan_facts


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    # hermetic plan facts: a cached table from ANY earlier module would
    # substitute InMemoryRelation into matching plans and destroy the
    # pruning/pushdown evidence these tests pin
    spark.catalog.clearCache()

    def run(name):
        return plan_facts(entry_mod.queries()[name](spark, sf_dir))

    return run


def test_point_lookup_pushes_filter_and_prunes_columns(q):
    facts = q("point_lookup")
    [scan] = facts["scans"]
    assert "IsNotNull" in scan["pushed"] or "EqualTo" in scan["pushed"], scan
    assert scan["read_cols"] <= 4  # orders is 9 cols wide — pruning must hold


def test_topk_is_incremental_not_full_sort(q):
    facts = q("topk_orders")
    assert facts["has_take_ordered"]
    assert facts["exchanges"] <= 1


def test_small_dims_broadcast_in_tpch_join(q):
    # q5 joins region+nation (tiny) to customer/orders/lineitem — the small
    # sides must broadcast, and nothing may degenerate to a cartesian product
    facts = q("q5_nation_revenue")
    assert "BroadcastHashJoin" in facts["joins"]
    assert "CartesianProduct" not in facts["joins"]


def test_no_cartesian_products_anywhere(q):
    """CartesianProduct is never an acceptable strategy in this repo: the
    deliberate all-pairs verification twins are broadcast nested loops over
    keyed SUBSETS, and everything else must join on keys."""
    for name in entry_mod.queries():
        facts = q(name)
        assert "CartesianProduct" not in facts["joins"], name


def test_hash_sample_is_scan_level_filter(q):
    # sampling must not shuffle: keep-decision evaluates in the scan stage
    facts = q("hash_sample_documents")
    assert facts["exchanges"] == 0
    assert not facts["has_python_udf"]


def test_codegen_queries_have_no_python_nodes(q):
    """The documented pure-codegen operators must stay JVM-side; Python is
    allowed only in the audited Arrow kernels (minhash/simhash/ANN encode)."""
    for name in (
        "gopher_quality_documents",
        "pii_redact_documents",
        "text_stats_documents",
        "normalize_values",
        "span_dedup_documents",
        "temperature_sample_documents",
        "vocab_documents",
        "q1_pricing_summary",
        "metrics_snapshot_events",
        "fuzzy_prefix_documents",
    ):
        assert not q(name)["has_python_udf"], name


def test_tail_query_shuffle_budgets(q):
    """Shuffle-count ceilings for the operators whose scale story quotes
    them (SCALING.md §2). A raised count means a regression in partitioning
    or a lost broadcast."""
    budgets = {  # ceilings = the counts PLANS.md documents today
        "dedup_exact_documents": 1,
        # tiny source agg + its min + the re-agg under the second branch of
        # the reused counts frame — all exchanges of a handful of rows
        "temperature_sample_documents": 3,
        "span_dedup_documents": 2,
        "vocab_documents": 2,
        "freshness_lag": 2,  # agg partials + single-partition final
        "pk_range_stats": 1,
        # (stream, 6h-window) agg + per-stream rollup + ordered output —
        # every exchange is over progress-summary-sized rows (r13)
        "metrics_snapshot_events": 3,
        # Ed-Join on documents: freq agg, prefix window, grid candidate
        # joins (cold + hot roles), string re-attach; no Python, all
        # joins keyed — pins the r13 restructured plan, re-based r16:
        # the census joins are shuffle_hash-pinned (each former
        # broadcast census now co-partitions BOTH sides, +9 static
        # exchanges of census-sized frames; AQE reuses them at runtime)
        # because AQE's runtime broadcast of the corpus-scale census
        # was the measured 100x driver hazard — 776.8 s → 115 s, and
        # sf0.1 got faster too (5.7 → 5.5 s). See OPTIMIZATION_r16.md.
        "fuzzy_prefix_documents": 33,
    }
    for name, ceiling in budgets.items():
        facts = q(name)
        assert facts["exchanges"] <= ceiling, (name, facts["exchanges"])


def test_kmeans_never_shuffles_corpus(q):
    """The returned assignment plan is scan → Arrow kernel: zero exchanges.
    (Iteration jobs run eagerly in kmeans_fit with the same kernel shape —
    the reduce exchanges carry k×(dim+1) doubles per partition, not data.)"""
    facts = q("kmeans_clusters_embeddings")
    assert facts["exchanges"] == 0, facts["exchanges"]


def test_interval_join_pushes_both_type_filters(q):
    facts = q("interval_join_events")
    pushed = " ".join(s["pushed"] for s in facts["scans"])
    assert "purchase" in pushed and "click" in pushed, facts["scans"]
    assert "CartesianProduct" not in facts["joins"]


def test_unigram_nll_single_postings_lineage(q):
    """The counts-by-self-join form cost 6 scans / 7 exchanges; the window
    form must stay at 2 scans and ≤4 exchanges (3 postings + 1 scalar)."""
    facts = q("unigram_nll_documents")
    assert len(facts["scans"]) <= 2, facts["scans"]
    assert facts["exchanges"] <= 4, facts["exchanges"]


def test_encode_vocab_join_is_broadcast(q):
    facts = q("encode_documents")
    assert "BroadcastHashJoin" in facts["joins"], facts["joins"]
    assert "SortMergeJoin" not in facts["joins"], facts["joins"]


def test_band_join_is_equi_join_not_nested_loop(q):
    """The whole point of the bin-bucket rewrite: the inequality join must
    plan as a hash/sort-merge EQUI-join, never BroadcastNestedLoop or a
    cartesian."""
    facts = q("band_join_acctbal")
    assert "BroadcastNestedLoopJoin" not in facts["joins"], facts["joins"]
    assert "CartesianProduct" not in facts["joins"], facts["joins"]
    assert any(
        j in facts["joins"] for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
    ), facts["joins"]


def test_shard_plan_single_order_exchange(q):
    """shard_plan = projection + ONE shuffle (the per-shard row_number
    window). A second exchange would mean the hash columns stopped being
    computed in the scan-side projection."""
    facts = q("shard_plan_documents")
    assert facts["exchanges"] <= 1, facts["exchanges"]
    assert len(facts["scans"]) == 1, facts["scans"]


def test_dsir_single_postings_lineage(q):
    """One postings lineage + term-window totals (the unigram_nll shape —
    a join-against-own-aggregate re-derived the postings 3× at 4 scans /
    8 exchanges): ceiling 3 scans (postings, slim scalars, id spine) and
    5 exchanges; scalars ride a broadcast, never a cartesian."""
    facts = q("dsir_scores_documents")
    assert len(facts["scans"]) <= 3, facts["scans"]
    assert facts["exchanges"] <= 5, facts["exchanges"]
    assert "CartesianProduct" not in facts["joins"]


def test_repetition_stats_shuffle_budget(q):
    """Array-expression metrics are scan-bound; only the top-bigram path
    shuffles: (doc,bigram) count + per-doc top-1 window + the join back.
    Ceiling 4 exchanges; the document text must never ride a shuffle (the
    exploded side carries only id+bigram)."""
    facts = q("repetition_stats_documents")
    assert facts["exchanges"] <= 4, facts["exchanges"]


def test_chunking_is_projection_only(q):
    """Chunk placement is per-document: one scan, ZERO exchanges — any
    exchange would mean the explode stopped fusing into the scan stage."""
    facts = q("chunk_documents_overlap")
    assert len(facts["scans"]) == 1 and facts["exchanges"] == 0, facts


def test_semantic_decontam_no_join_no_corpus_shuffle(q):
    """The eval matrix rides the kernel closure: no join node at all and
    the only exchange is the final presentation sort."""
    facts = q("semantic_decontam_embeddings")
    assert facts["joins"] == [], facts["joins"]
    assert len(facts["scans"]) == 1 and facts["exchanges"] <= 1, facts


def test_bigram_nll_single_postings_lineage(q):
    """One bigram-postings lineage + three term windows + slim scalar
    broadcast: 2 scans / ≤5 exchanges (postings, 3 windows, doc agg — the
    join-against-own-aggregate form would re-derive the postings)."""
    facts = q("bigram_nll_documents")
    assert len(facts["scans"]) <= 2, facts["scans"]
    assert facts["exchanges"] <= 5, facts["exchanges"]


def test_classifier_scoring_is_zero_shuffle_projection(q):
    """Fixed-weight scoring must stay a pure projection: no exchange, no
    join, no python-udf node (aggregate left-fold + CASE chain, all
    codegen)."""
    facts = q("classifier_score_documents")
    assert facts["exchanges"] == 0, facts
    assert not facts["joins"]
    assert not facts["has_python_udf"]


def test_source_quality_filter_single_shuffle(q):
    facts = q("source_quality_report")
    assert facts["exchanges"] <= 1, facts
    [scan] = facts["scans"]
    assert scan["read_cols"] <= 2  # source + text only


def test_novelty_bounded_shuffles_and_pruned_scan(q):
    """One postings lineage: gram agg + gram window + doc roll-up (+ the
    left-join back) — never more than 4 exchanges, scans pruned to the
    needed columns."""
    facts = q("novelty_scores_documents")
    assert facts["exchanges"] <= 4, facts
    for scan in facts["scans"]:
        assert scan["read_cols"] <= 2


def test_winnow_single_shuffle_no_python(q):
    """Winnowing is higher-order algebra up to one explode + distinct:
    at most the distinct's exchange, zero python-udf nodes."""
    facts = q("winnow_fingerprints_documents")
    assert facts["exchanges"] <= 1, facts
    assert not facts["has_python_udf"]


def test_daily_percentiles_pruned_single_cell_shuffle(q):
    """Nearest-rank bands: one (type, day)-keyed shuffle for the cell
    windows (+ the final order), value NULL-filter pushed, 3-col scan."""
    facts = q("daily_percentiles_events")
    assert facts["exchanges"] <= 2, facts
    [scan] = facts["scans"]
    assert "IsNotNull" in scan["pushed"], scan
    assert scan["read_cols"] <= 3
    assert not facts["has_python_udf"]


def test_equidepth_histogram_single_value_collapse(q):
    """Equi-depth: the per-value collapse is the only corpus-keyed
    shuffle; the rank window runs on the distinct-value table."""
    facts = q("equidepth_histogram_orders")
    assert facts["exchanges"] <= 3, facts
    [scan] = facts["scans"]
    assert scan["read_cols"] <= 1  # o_totalprice only — 9-col table


def test_watermark_sizing_scans_corpus_once(q):
    """The candidate grid must replay the |types|-row collapse, never the
    corpus: exactly ONE parquet scan (the localCheckpoint materialization
    absorbs the per-candidate union)."""
    facts = q("watermark_sizing_events")
    assert len(facts["scans"]) <= 1, facts["scans"]


def test_retry_dedup_single_key_window(q):
    """Echo detection is one key-hash window + the per-type collapse —
    never an interval self-join (zero joins in the plan)."""
    facts = q("retry_dedup_events")
    assert not facts["joins"], facts
    assert facts["exchanges"] <= 3, facts


def test_mmr_pool_stage_has_no_corpus_rescans(q):
    """MMR stage 2 runs on the 50-row checkpointed pool: the final plan
    contains NO parquet scans (pool + picks are materialized RDDs) and
    no full sort (greedy picks are top-1 TakeOrdered)."""
    facts = q("mmr_topk_embeddings")
    assert not facts["scans"], facts["scans"]


def test_ks_quantized_same_bounded_shape_as_exact(q):
    """Grid snapping happens in the projection BEFORE the per-value
    collapse: the quantized KS keeps the exact twin's plan shape —
    pruned scans (key + value only) and the bounded cumulative window
    on the (smaller) distinct-grid table."""
    facts = q("ks_quantized_order_totals")
    for scan in facts["scans"]:
        assert scan["read_cols"] <= 2, scan  # o_orderkey + o_totalprice of 9
    assert "CartesianProduct" not in facts["joins"]


def test_hot_key_caps_are_anti_joins(spark, sf_dir):
    """r12 kept-set inversion pin, updated for the r15 optimization
    round: frequency-cap pruning must never re-broadcast the kept
    vocabulary (corpus-scale at 100 TB — the pre-r12 forced-broadcast
    form this guard exists to keep out).

    - ngram_jaccard (shingle path) and UNGATED fuzzy cap mode: still a
      LeftAnti against the bounded HOT set.
    - GATED fuzzy cap mode (fuzzy_gated_customers): the cap rides ONE
      co-partitioned equi-join against the full-key census followed by
      the Ed-Join prune window (row_number per record over rarest
      surviving keys — the r15 composition that collapsed the gated
      entry 16.5 s → 2.5 s) — pin the window, and pin that no
      broadcast is FORCED over the census (the optimized plan may
      still contain broadcasts the planner sizes as small, so the
      guard checks for a broadcast-strategy ResolvedHint instead).
      Since r16 the census joins carry a shuffle_hash hint — the
      OPPOSITE direction (it FORBIDS the runtime broadcast whose
      driver-side HashedRelation build was measured as the 100x
      super-linear cost) — so the guard now bans only
      strategy=broadcast hints and additionally asserts the
      shuffle_hash pin is present."""
    import __spark_entry__ as entry_mod

    spark.catalog.clearCache()
    for name in ("fuzzy_match_customers", "ngram_jaccard_pairs_subset"):
        df = entry_mod.queries()[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "LeftAnti" in plan, f"{name}: cap pruning is not an anti-join"

    df = entry_mod.queries()["fuzzy_gated_customers"](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "row_number" in plan, "gated cap mode lost the Ed-Join prune window"
    assert "__f" in plan, "gated cap mode lost the census-frequency filter"
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "strategy=broadcast" not in analyzed, "forced broadcast over the census"
    assert "shuffle_hash" in analyzed, "census join lost its shuffle_hash pin"


def test_profile_hll_scans_pruned_no_cartesian(q):
    """HLL-mode profile diff: every orders scan reads only the key +
    profiled columns (4 of 9), and the register build joins stay keyed
    (no cartesian) — the shuffle bound lives in the register table's
    ≤ 2^p rows per column."""
    facts = q("profile_diff_hll_orders")
    assert facts["scans"], "expected parquet scans"
    for scan in facts["scans"]:
        assert scan["read_cols"] <= 4, scan
    # exactly two scans per side: the counts aggregation + the exploded
    # (col, key) register frame — the per-column unionByName form that
    # multiplied scans by |cols| is pinned out (r11 review fix)
    assert len(facts["scans"]) <= 4, facts["scans"]
    assert "CartesianProduct" not in facts["joins"]


def test_global_asof_plan_buckets_and_prunes(q):
    """r14 entry pin: the keyless as-of pushes the event_type filters to
    the parquet scan, carries the bucket fix-up as a BROADCAST join (the
    carry frame is <=65 rows), and stays within a bounded shuffle budget
    — no whole-input no-partition window (that plan shape is pinned
    structurally in tests/test_asof.py)."""
    facts = q("global_asof_purchase_click")
    assert any("EqualTo(event_type" in s["pushed"] for s in facts["scans"]), facts["scans"]
    assert "BroadcastHashJoin" in facts["joins"]
    assert "CartesianProduct" not in facts["joins"]
    assert facts["exchanges"] <= 6, facts["exchanges"]


def test_repetition_stats_is_zero_shuffle(q):
    """r15 rework pin: the top-bigram fold made repetition_stats a single
    scan-bound projection — NO exchange, NO window, NO join may creep
    back in (the old explode → groupBy → groupBy → join pipeline
    shuffled ~n_tokens rows per document twice for a per-document
    statistic)."""
    facts = q("repetition_stats_documents")
    assert facts["exchanges"] == 0, facts
    assert not facts["window"], facts
    assert not facts["joins"], facts
    assert not facts["has_python_udf"], facts


def test_novelty_scores_sort_free_and_bounded(q):
    """r15 rework pin: novelty's per-gram first-owner arbitration is a
    min(struct) HASH aggregate, not a window (the window needed its own
    hash(g) exchange plus a per-partition sort — the hot-gram spill
    hazard); the whole plan stays within the 3-shuffle budget the
    docstring states (plus the final per-doc join, which AQE may
    broadcast)."""
    facts = q("novelty_scores_documents")
    assert not facts["window"], facts
    assert facts["exchanges"] <= 4, facts
    assert "CartesianProduct" not in facts["joins"]


def test_fk_integrity_preaggregates_children(q):
    """r15 rework pin: every FK edge groups the child to (fk, count)
    BEFORE the parent join, so the join input is distinct keys — at
    100 TB the old shape shuffled the whole fact table once the parent
    outgrew broadcast. Pinned via scan pruning (each child scan reads
    only its FK column) and the per-edge exchange budget (7 edges ×
    [child partial agg + parent distinct + final agg] = at most 21
    single-column exchanges, never a row-level join shuffle of wide
    rows)."""
    facts = q("fk_integrity_all")
    for scan in facts["scans"]:
        assert scan["read_cols"] <= 1, scan
    assert facts["exchanges"] <= 21, facts
    assert "CartesianProduct" not in facts["joins"]
