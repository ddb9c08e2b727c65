"""Physical-plan regression tests — pin the scale-design claims.

Each query's docstring makes a concrete claim about its plan (broadcast
join, filter pushdown, thin shuffles, no global sort).  These tests assert
those claims against the executed plan string so an innocent-looking
refactor can't silently turn a broadcast into a sort-merge join or start
shipping vectors through a banded shuffle.  Plan strings are version-
sensitive; assertions stick to coarse, stable markers.
"""

from __future__ import annotations

import re

import pytest

from briefly_spark.queries import load_registry

REGISTRY = load_registry()


def plan_of(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def shuffle_exchanges(plan: str) -> list[str]:
    """Lines of shuffle (non-broadcast) exchanges."""
    return [
        l for l in plan.splitlines() if "Exchange" in l and "BroadcastExchange" not in l
    ]


def test_q03_dim_joins_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q03_revenue_by_nation")
    assert "BroadcastHashJoin" in plan
    # the dim joins must not fall back to shuffle joins
    assert "SortMergeJoin" not in plan


def test_q94_worklist_broadcasts_into_hydration_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q94_worklist_hydration")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q01_filter_pushed_to_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q01_pricing_summary")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "LessThanOrEqual(l_shipdate" in m.group(1)


def test_q01_column_pruning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q01_pricing_summary")
    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m is not None
    cols = {c.split("#")[0] for c in m.group(1).split(",") if c}
    # 7 needed columns, not the 16-column table
    assert "l_comment" not in cols and "l_orderkey" not in cols
    assert {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"} <= cols


@pytest.mark.parametrize(
    "name",
    ["q50_token_stats", "q52_quality_score", "q55_gopher_rules", "q56_pii_scrub",
     "q26_url_canonical"],
)
def test_curation_passes_are_map_only(spark, sf_dir, name):
    # one exchange allowed: catalog.spread()'s repartition of the
    # single-file scan — nothing else may shuffle
    plan = plan_of(spark, sf_dir, name)
    assert len(shuffle_exchanges(plan)) <= 1, plan


def test_q42_banded_shuffles_never_carry_vectors(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q42_lsh_ann")
    offenders = [l for l in shuffle_exchanges(plan) if re.search(r"\bv#\d+", l)]
    assert not offenders, offenders


def test_q31_banded_shuffles_never_carry_shingles(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q31_minhash_lsh_pairs")
    offenders = [l for l in shuffle_exchanges(plan) if "shingles#" in l]
    assert not offenders, offenders


def test_q93_uses_take_ordered_not_global_sort_window(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q93_two_tier_worklist")
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_q30_exact_dedup_bounded_shuffles(spark, sf_dir):
    """r13 graft: q30 now carries three legs (dedup groups, X147 cluster
    split, leakage audit).  The corpus contributes the ONE md5-groupBy
    hash-agg; every later shuffle runs on the groups/assignments frame
    (digest + ids, never text).  Pin the bounded count and that no
    exchange carries the text column."""
    plan = plan_of(spark, sf_dir, "q30_exact_dedup")
    ex = shuffle_exchanges(plan)
    assert len(ex) <= 7, plan
    offenders = [l for l in ex if re.search(r"\btext#\d+", l)]
    assert not offenders, offenders


def test_q41_related_pipeline_scans_each_input_once(spark, sf_dir):
    # the tier-0/tier-1 selection is ONE linear pass over the scored pairs
    # (operators/similarity.py): a regression to branched lineage would
    # re-run the quadratic scoring stage per branch and show up here as
    # extra FileScans of the embeddings table.
    plan = plan_of(spark, sf_dir, "q41_related_articles")
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    # queries + corpus + scores — all derived from embeddings, scanned once each
    assert len(scans) == 3, plan


@pytest.mark.parametrize(
    "name",
    ["q38_stratified_quota_sample", "q39_line_boilerplate_filter", "q66_curriculum_buckets"],
)
def test_new_curation_queries_broadcast_their_small_side(spark, sf_dir, name):
    # quota spec / boilerplate key set / percentile cutoffs are all tiny by
    # construction and must broadcast — a shuffle join here would shuffle
    # the full corpus against a handful of rows
    plan = plan_of(spark, sf_dir, name)
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_q46_tfidf_single_postings_branch(spark, sf_dir):
    # df is a window over the ONE postings frame; N is a metadata-only
    # count — a regression to groupBy-per-stat re-scans and re-explodes
    # the corpus per branch (how the first version planned: 3 scans)
    plan = plan_of(spark, sf_dir, "q46_tfidf_topterms")
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert len(scans) == 2, plan  # postings branch + count-only branch
    assert "SortMergeJoin" not in plan, plan


def test_q47_bm25_no_pair_join_and_bounded_scans(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q47_bm25_search")
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    # postings + map-only stats + the seed-query construction branch
    assert len(scans) == 3, plan
    # retrieval joins through the term equi-join only — never a doc×query
    # cartesian / nested-loop pair join
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_q45_quantized_candidate_join_carries_no_full_vectors(spark, sf_dir):
    # the int8 candidate stage must not shuffle full-precision vectors;
    # full vectors are re-attached to the thin candidate id set afterwards
    plan = plan_of(spark, sf_dir, "q45_quantized_ann")
    offenders = [
        l
        for l in shuffle_exchanges(plan)
        if re.search(r"\bv#\d+", l) and "query_id" in l and "neighbor_id" in l
    ]
    assert not offenders, offenders


# ---- r05 analytics / scale-levers pack -----------------------------------


def test_q16_all_dims_broadcast(spark, sf_dir):
    # supplier, customer, nation×2 must broadcast — the only eligible
    # shuffle join is lineitem⋈orders on the orderkey
    plan = plan_of(spark, sf_dir, "q16_volume_shipping")
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "CartesianProduct" not in plan, plan


def test_q17_big_order_set_broadcasts(spark, sf_dir):
    # the HAVING-filtered aggregate must come back to orders as a
    # broadcast, never re-shuffling the orders scan
    plan = plan_of(spark, sf_dir, "q17_large_volume_orders")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_q18_quantity_disjunction_pushed_to_fact_scan(spark, sf_dir):
    # the OR-of-conjunctions must split: the quantity residual pushes
    # into the lineitem scan, the brand/size residual prunes part
    plan = plan_of(spark, sf_dir, "q18_disjunctive_revenue")
    m = re.search(r"PushedFilters: \[[^\]]*Or\([^\]]*l_quantity[^\]]*\]", plan)
    assert m is not None, plan
    assert "BroadcastHashJoin" in plan, plan


def test_q19_single_scan_share_of_total(spark, sf_dir):
    # grand total is an agg over the per-part frame broadcast back (no
    # unpartitioned window over the part dimension); the static plan has
    # two lineage copies of the partkey aggregate, but AQE's runtime
    # stage dedup MUST collapse them — the fact is scanned and shuffled
    # once.  Assert on the executed adaptive plan, where the reuse is
    # visible as a ReusedExchange over the partkey exchange.
    from briefly_spark.queries import load_registry

    df = load_registry()["q19_revenue_concentration"].fn(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan
    assert "ReusedExchange" in plan, plan
    assert "Window" not in plan, plan


def test_det_ln_stays_staged_in_optimized_plans(spark, sf_dir):
    # the staged det_ln (numerics.det_ln_items) must SURVIVE optimization:
    # each ln leg computes its bit-length stage once, so `bin(` appears
    # once per leg in the optimized plan.  The inline expansion this
    # replaced carried ~10-30 copies per score and cost q47 3.5× wall —
    # if CollapseProject ever re-inlines the stages (alias-reuse heuristics
    # changing under a Spark upgrade, or a refactor dropping the staging),
    # this trips before the bench does.
    from briefly_spark.queries import load_registry

    reg = load_registry()
    for q, legs in (("q47_bm25_search", 2), ("q48_lm_perplexity", 2)):
        opt = reg[q].fn(spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()
        assert opt.count("bin(") <= 2 * legs, f"{q}: det_ln re-inlined ({opt.count('bin(')} copies)"
        assert len(opt) < 50_000, f"{q}: optimized plan bloated to {len(opt)} chars"


def test_q121_postings_exchange_reused_and_dims_broadcast(spark, sf_dir):
    # the (doc, term) postings shuffle feeds three consumers (term counts,
    # the total, the scoring join) — AQE must serve them from ONE exchange,
    # and the vocab-sized count frame + 1-row total must broadcast
    from briefly_spark.queries import load_registry

    df = load_registry()["q121_token_surprisal"].fn(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_q122_containment_is_postings_equi_join(spark, sf_dir):
    # containment pairs must come from the shingle-postings equi-join —
    # never a blocked cartesian or nested-loop pair enumeration
    plan = plan_of(spark, sf_dir, "q122_shingle_containment")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q28_mg_summary_cached_and_candidates_broadcast(spark, sf_dir):
    # the Misra–Gries summary frame is persisted (two consumers, one MG
    # pass) and the candidate set enters the exact pass as a broadcast
    # semi-join — never a vocabulary-wide shuffle join
    plan = plan_of(spark, sf_dir, "q28_heavy_hitters")
    assert "InMemoryTableScan" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_q97_postings_cached_bitset_broadcast(spark, sf_dir):
    # the shingle postings persist (three consumers, one shingling pass);
    # the Bloom bitset and word-lookup joins broadcast; membership
    # testing never becomes a pair join
    plan = plan_of(spark, sf_dir, "q97_bloom_decontaminate")
    assert "InMemoryTableScan" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "CartesianProduct" not in plan, plan


def test_q98_two_pruned_scans_no_sort(spark, sf_dir):
    # stats branch + layout branch; z-value assignment is map-side
    # arithmetic — no global sort may appear
    plan = plan_of(spark, sf_dir, "q98_zorder_layout")
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert len(scans) == 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert len(shuffle_exchanges(plan)) <= 2, plan


def test_q99_one_ranking_shuffle(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q99_group_sample")
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert len(scans) == 1, plan
    assert len(shuffle_exchanges(plan)) <= 2, plan


def test_q100_exists_decorrelates_to_semi_anti(spark, sf_dir):
    # the correlated EXISTS / NOT EXISTS must decorrelate into semi and
    # anti joins on the orderkey — never a per-row subquery or cartesian
    plan = plan_of(spark, sf_dir, "q100_waiting_suppliers")
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q102_prefix_sum_broadcasts_day_frame(spark, sf_dir):
    # cross-day carry must come from a broadcast of the day-dimension
    # prefix frame; concurrency never needs a global sort
    plan = plan_of(spark, sf_dir, "q102_peak_concurrency")
    assert "BroadcastHashJoin" in plan, plan
    assert not re.search(r"\bSort (\[.*\]), true,", plan), plan


def test_q103_histogram_single_corpus_shuffle(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q103_grouped_median")
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert len(scans) == 1, plan
    # spread + histogram agg + source-partitioned windows + final agg
    assert len(shuffle_exchanges(plan)) <= 4, plan


def test_q105_diff_prunes_to_key_and_text(spark, sf_dir):
    # the CDC join must read only the key + hashed column — wide rows
    # never reach the join
    plan = plan_of(spark, sf_dir, "q105_snapshot_diff")
    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m is not None
    cols = {c.split("#")[0] for c in m.group(1).split(",") if c}
    assert cols <= {"doc_id", "text"}, cols
    assert "CartesianProduct" not in plan, plan


def test_q106_weighted_topk_is_take_ordered(spark, sf_dir):
    # per-partition heaps + driver merge — a LIMIT over ORDER BY must
    # never plan as a global Sort
    plan = plan_of(spark, sf_dir, "q106_weighted_sample")
    assert "TakeOrderedAndProject" in plan, plan
    assert not re.search(r"\bSort (\[.*\]), true,", plan), plan


def test_q107_postings_persisted_stats_broadcast(spark, sf_dir):
    # the distinct doc-term frame persists (four consumers, one explode);
    # df counts and N broadcast into the pair frame
    plan = plan_of(spark, sf_dir, "q107_term_pmi")
    assert "InMemoryTableScan" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_q108_pairs_on_dimension_frame_only(spark, sf_dir):
    # sources meet through the persisted distinct (source, term) frame
    # (the plan string repeats the cached lineage under each
    # InMemoryTableScan — the corpus is scanned once at runtime); the
    # size frames broadcast back into the pair frame
    plan = plan_of(spark, sf_dir, "q108_source_similarity")
    assert "InMemoryTableScan" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_q109_merges_frame_is_local(spark, sf_dir):
    # the returned merges frame is a driver-local relation (8 rows); the
    # distributed work happened during training — nothing corpus-sized
    # survives into the result plan
    plan = plan_of(spark, sf_dir, "q109_bpe_merges")
    assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan, plan
    assert "Exchange" not in plan, plan


def test_q109_pair_counts_partial_agg(spark, sf_dir):
    # the per-round pair tally partial-aggregates map-side over the
    # symbolized word frame (one shuffle on the pair key, no sort)
    from briefly_spark.operators.bpe import pair_counts, symbolize, word_freqs
    from briefly_spark.catalog import load_table, spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    pc = pair_counts(symbolize(word_freqs(docs)))
    plan = pc._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2, plan  # partial + final
    assert "Sort " not in plan, plan


def test_q110_anti_join_and_broadcast_seg(spark, sf_dir):
    # segment stats broadcast back (decorrelated scalar subquery); NOT
    # EXISTS is a broadcast/shuffle anti join, never a per-row probe
    plan = plan_of(spark, sf_dir, "q110_balance_prospects")
    assert "LeftAnti" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q111_argmax_broadcasts_no_window(spark, sf_dir):
    # the per-nation MAX frame broadcasts; no window runs over supplier
    plan = plan_of(spark, sf_dir, "q111_nation_top_supplier")
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_q102_transitions_stats_broadcast(spark, sf_dir):
    # the 'transitions' section (q112's r15 graft host): one corpus-sized
    # shuffle (the user_id window); row totals and type count come off
    # the persisted tiny transition frame and broadcast back.  The host's
    # own 'peak' leg joins day partials via broadcast too — the merged
    # plan must stay free of sort-merge joins entirely.
    plan = plan_of(spark, sf_dir, "q102_peak_concurrency")
    assert "InMemoryTableScan" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_q113_map_only_zero_shuffles(spark, sf_dir):
    # the JL projection is map-only: literal sign matrix, no join, no
    # aggregation, no exchange of any kind
    plan = plan_of(spark, sf_dir, "q113_random_projection")
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_q114_quota_broadcast_one_ranking_shuffle(spark, sf_dir):
    # sqrt-share quotas collapse to a broadcast; the only corpus shuffle
    # is the per-source ranking window
    plan = plan_of(spark, sf_dir, "q114_temperature_mixture")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q115_edges_persisted_no_cartesian(spark, sf_dir):
    # the shared edge frame persists across rounds; candidate generation
    # stays the inverted-index equi-join (no cross product anywhere)
    plan = plan_of(spark, sf_dir, "q115_label_propagation")
    assert "InMemoryTableScan" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q116_queries_broadcast_corpus_streams(spark, sf_dir):
    # retrieval follows the q40 discipline: broadcast queries against the
    # streamed corpus (BroadcastNestedLoopJoin), with the quantized base
    # and the shortlist persisted (the selection rounds and the sims
    # self-join consume the CACHE, not the corpus — the repeated lineage
    # under each InMemoryTableScan is display only).  Selection joins
    # co-partition on query_id; sort-merge there is the scale-honest
    # choice (shortlists are NOT broadcastable at millions of queries).
    plan = plan_of(spark, sf_dir, "q116_mmr_rerank")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "InMemoryTableScan" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q117_dense_frame_persisted_totals_broadcast(spark, sf_dir):
    # the corpus collapses to the persisted (source, term) frame; the
    # smoothed dense frame persists for its three consumers; per-source
    # totals and the vocab count broadcast into the pair join
    plan = plan_of(spark, sf_dir, "q117_source_drift_kl")
    assert "InMemoryTableScan" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_q116_ranking_shuffle_carries_no_vectors(spark, sf_dir):
    # the shortlist window shuffles the thin (query_id, cid, rel_fp)
    # triple only; vectors re-attach by equi-join against the cached base
    plan = plan_of(spark, sf_dir, "q116_mmr_rerank")
    offenders = [l for l in shuffle_exchanges(plan) if re.search(r"\bqv#\d+", l)]
    assert not offenders, offenders


def test_q118_query_path_carries_codes_not_vectors(spark, sf_dir):
    # the ADC scoring joins the (id, s, code) table against a broadcast
    # distance table — full vectors only re-enter for the shortlist
    # hydration (id equi-join); no cartesian anywhere
    plan = plan_of(spark, sf_dir, "q118_pq_ann")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q119_ranks_without_corpus_sort(spark, sf_dir):
    # ranks come from dimension-sized histogram maps that broadcast back;
    # the corpus itself is never sorted (the histogram windows sort only
    # |distinct values| rows)
    plan = plan_of(spark, sf_dir, "q119_rank_fusion")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_plan_lint_window_heuristic_pins_all_tostring_shapes():
    """Pin tools/plan_lint._is_unpartitioned_window against the four
    ``Window`` toString shapes (ADVICE r06): the classifier reads the
    SECOND bracket group and calls it an ORDER spec iff it carries an
    ASC/DESC direction.  Captured-plan-shaped samples, one per shape, so a
    Spark upgrade that changes the printer breaks THIS test loudly instead
    of silently mis-classifying (the stale-allowlist check is the backstop
    for systematic failure)."""
    from tools.plan_lint import _is_unpartitioned_window

    spec = (
        "windowspecdefinition(k#0, t#3 ASC NULLS FIRST, specifiedwindowframe("
        "RangeFrame, unboundedpreceding$(), currentrow$()))"
    )
    # [exprs], [part], [order] — partitioned and ordered
    assert not _is_unpartitioned_window(
        f"   Window [sum(x#1L) {spec} AS s#9L], [k#0], [t#3 ASC NULLS FIRST]"
    )
    # [exprs], [part] — partitioned, no order (partition entries never
    # carry a direction keyword)
    assert not _is_unpartitioned_window(
        f"   Window [row_number() {spec} AS rk#9], [k#0, src#4]"
    )
    # [exprs], [order] — UNPARTITIONED but ordered (the hazardous shape
    # the lint exists for: all rows collapse to one task)
    assert _is_unpartitioned_window(
        f"   Window [sum(x#1L) {spec} AS s#9L], [t#3 ASC NULLS FIRST]"
    )
    assert _is_unpartitioned_window(
        f"   Window [lag(x#1L, 1, null) {spec} AS p#9L], [t#3 DESC NULLS LAST]"
    )
    # [exprs] only — neither partition nor order
    assert _is_unpartitioned_window(f"   Window [sum(x#1L) {spec} AS s#9L]")
    # nested brackets inside the expression group must fold (CASE WHEN /
    # array exprs print brackets) — still 3 top-level groups
    assert not _is_unpartitioned_window(
        f"   Window [first(a#2[0]) {spec} AS f#9], [k#0], [t#3 ASC NULLS FIRST]"
    )


def test_q131_dup_shuffles_carry_hashes_not_window_text(spark, sf_dir):
    """substring_coverage's scale claim: the overlapping-window TEXT never
    rides a shuffle — only the 32-char md5 keys (h) and positions do.
    The token array (t) and the hashed-window array (hs) must stay inside
    map-side projections."""
    plan = plan_of(spark, sf_dir, "q131_exact_substring_dedup")
    offenders = [
        l
        for l in shuffle_exchanges(plan)
        if re.search(r"\bhs#\d+", l) or re.search(r"\bt#\d+", l)
    ]
    assert not offenders, offenders


def test_q133_keepfirst_first_occurrence_is_partial_agg_not_window(spark, sf_dir):
    """q133's dup test must be the partial-aggregable min-groupBy on the
    shingle hash (map-side combine on corpus-hot boilerplate shingles),
    never a window over the shingle partition — the q48 hot-window
    hazard."""
    plan = plan_of(spark, sf_dir, "q133_substring_dedup_keepfirst")
    # HashAggregate on h with partial_min upstream of the exchange
    assert re.search(r"HashAggregate.*partial_min", plan), plan[:2000]
    # the only Window ops are the per-doc interval-merge ones (id-keyed)
    win_lines = [l for l in plan.splitlines() if "Window" in l and "windowspec" not in l]
    assert all("id#" in l for l in win_lines if re.search(r"partitionBy|Window \[", l)) or win_lines == [], win_lines


# ---------------------------------------------------------------------------
# r09 late additions: q140–q146 plan pins.
# ---------------------------------------------------------------------------
def test_q141_nb_model_broadcasts_into_scoring(spark, sf_dir):
    """The (classes × buckets) weight table and the priors must BROADCAST
    into the scoring join — NB scoring is a map-side expansion, never a
    shuffle keyed on the model.  q141's RETURNED frame is the eagerly
    materialized ≤ classes² confusion (a local relation — the q127
    bounded-output discipline), so the pin targets the internal LAZY
    plan the collect runs."""
    from pyspark.sql import functions as F

    from briefly_spark.catalog import load_table, spread
    from briefly_spark.operators.classifier import (
        _nb_confusion_plan,
        nb_label_features,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    feats = nb_label_features(
        docs, id_col="doc_id", text_col="text", label_col="lang", n_buckets=32
    )
    cnt_raw = feats.groupBy("lab", "j").agg(F.sum("x").alias("cx"))
    dl = docs.groupBy(F.col("lang").alias("lab")).agg(
        F.count(F.lit(1)).cast("long").alias("dl")
    )
    plan = (
        _nb_confusion_plan(spark, feats, cnt_raw, dl, n_buckets=32)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the returned registry query is the local confusion relation
    ret = plan_of(spark, sf_dir, "q141_nb_confusion")
    assert "LocalTableScan" in ret or "BroadcastHashJoin" not in ret


def test_q142_phrase_table_broadcasts_and_adjacency_is_equijoin(spark, sf_dir):
    """The query-phrase table broadcasts into leg A; the adjacency check
    must plan as an EQUI-join on (doc, pos+1, term) — a nested-loop /
    cartesian pairing would scan positions quadratically."""
    plan = plan_of(spark, sf_dir, "q142_phrase_search")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q144_triangle_joins_are_all_equijoins(spark, sf_dir):
    """Every stage of the triangle census (degree attach, orientation,
    wedge self-join, closure) must be an equi-join — the quadratic form
    lives only in the oracle's statement of semantics."""
    plan = plan_of(spark, sf_dir, "q144_dup_triangles")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q145_vocab_broadcasts_unigrams(spark, sf_dir):
    """The train-slice unigram table (vocab-sized) and the 1-row vocab
    count broadcast onto the eval bigrams; the (w1, w2) model join may
    shuffle (AQE-splittable) but never nested-loops."""
    plan = plan_of(spark, sf_dir, "q145_lm_holdout_ppl")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q146_rollup_is_one_expand_one_shuffle(spark, sf_dir):
    """ROLLUP must plan as ONE Expand (grouping sets materialized
    map-side) feeding ONE aggregation shuffle — not one pass per level."""
    plan = plan_of(spark, sf_dir, "q146_rollup_inventory")
    assert plan.count("Expand") >= 1
    assert len(shuffle_exchanges(plan)) <= 2  # expand agg (+AQE artifacts)
    assert "CartesianProduct" not in plan


def test_q140_cuts_broadcast_back(spark, sf_dir):
    """The 5-row per-language cuts frame must broadcast onto the scored
    frame; no global sort anywhere (the terciles come from the value
    histogram, not a rank)."""
    plan = plan_of(spark, sf_dir, "q140_ccnet_ppl_buckets")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
