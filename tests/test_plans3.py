"""Plan-shape pins for the third-session flagships: the physical
strategies that make these ops scale are asserted, not assumed."""

from __future__ import annotations

import re

from mit_6_5840_mapreduce_with_go_spark.operators.bloom import (
    sketch_bloom_partition_prune,
)
from mit_6_5840_mapreduce_with_go_spark.operators.evaluation import (
    eval_threshold_sweep,
)
from mit_6_5840_mapreduce_with_go_spark.operators.ivm import (
    maintenance_ivm_join_view,
)
from mit_6_5840_mapreduce_with_go_spark.operators.projection import (
    mm_jl_projection,
    pipeline_epoch_shuffle,
)
from mit_6_5840_mapreduce_with_go_spark.operators.retrieval import (
    dedup_semdedup,
    sim_bm25_topk,
)
from mit_6_5840_mapreduce_with_go_spark.plans.explain import (
    physical_plan,
    plan_tree,
    subtree_details,
)


def _n_exchanges(plan: str) -> int:
    # count shuffle exchanges only (broadcast exchanges are the point)
    return len(re.findall(r"Exchange (?:hash|range|SinglePartition)", plan))


def test_jl_projection_is_shuffle_free(spark, sf_dir):
    """The whole projection must be ONE narrow pass: no shuffle exchange
    anywhere (fan_out's round-robin repartition of the single test file
    is the only allowed exchange, and only when the scan is 1 split)."""
    plan = physical_plan(mm_jl_projection(spark, sf_dir))
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_bm25_broadcasts_everything_but_postings(spark, sf_dir):
    """idf, query terms, and the (N, avgdl) scalar broadcast; the
    UNPRUNED corpus postings never shuffle on the word key.

    Word-keyed exchanges are allowed ONLY over query-vocab-bounded
    subtrees: every ``Exchange hashpartitioning(word...`` must root a
    subtree that contains the ``doc_id < NQ`` query-side pushed filter —
    either directly (the qwords distinct) or via the broadcast semi-join
    that prunes the postings before the idf/df aggregate.  An idf derived
    from unpruned postings (the 100 TB full-vocab hazard round 4 removed)
    has no such filter in its subtree and fails this pin.
    """
    plan = physical_plan(sim_bm25_topk(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" in plan  # 1-row scalar crossJoins
    assert "SortMergeJoin" not in plan  # the pair join itself never SMJs
    tree = plan_tree(plan)
    word_exchanges = [
        i
        for i, (_nid, _d, detail) in enumerate(tree)
        if detail.startswith(f"({_nid}) Exchange")
        and "hashpartitioning(word" in detail
    ]
    assert word_exchanges, "expected the bounded qwords/idf exchanges"
    assert len(word_exchanges) <= 3  # qwords x2 (pass + prune) + idf/df
    for i in word_exchanges:
        sub = subtree_details(tree, i)
        assert any(
            "LessThan(doc_id,20)" in d or "doc_id#" in d and "< 20" in d
            for d in sub
        ), f"word-keyed exchange over UNPRUNED postings:\n{tree[i][2]}"


def test_semdedup_assignment_is_hash_agg_not_window(spark, sf_dir):
    """Centroid assignment must be the struct-max hash aggregate — a
    window formulation would show a Window + sort over scored rows."""
    plan = physical_plan(dedup_semdedup(spark, sf_dir))
    assert "Window" not in plan
    assert "HashAggregate" in plan


def test_threshold_sweep_is_single_aggregation(spark, sf_dir):
    """9 thresholds fold into ONE pass: a single shuffle for the final
    9-group aggregate and no join shuffles."""
    plan = physical_plan(eval_threshold_sweep(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert _n_exchanges(plan) <= 2  # fan_out repartition + final agg


def test_epoch_shuffle_sorts_within_shards_only(spark, sf_dir):
    """The per-shard ordering must be a partition-local sort under the
    window — never a global range sort of the table."""
    plan = physical_plan(pipeline_epoch_shuffle(spark, sf_dir))
    assert "rangepartitioning" not in plan
    assert "hashpartitioning(shard" in plan


def test_ivm_dim_join_broadcasts(spark, sf_dir):
    plan = physical_plan(maintenance_ivm_join_view(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # delta/before legs prune on the key predicate at the scan
    assert "PushedFilters" in plan or "Filter" in plan


def test_bloom_build_is_partial_aggregable(spark, sf_dir):
    """The word build must partial-aggregate map-side (HashAggregate
    pairs) and the probe join must broadcast the probe keys."""
    plan = physical_plan(sketch_bloom_partition_prune(spark, sf_dir))
    assert "HashAggregate" in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_bm25_tfidf_exchange_reuse_lever(spark, sf_dir):
    """tfidf shares its exploded-postings subtree via ReuseExchange (the
    uniform isnotnull base shape keeps the subtrees canonical — see
    sessions.py); bm25 materializes the postings ONCE via
    localCheckpoint since r13 (retrieval.py::_bm25_postings), so its
    final plan must contain NO corpus re-derivation at all.  Pins
    (reuse decisions land at execution time under AQE, so plans are
    read AFTER an action):

    - tfidf keeps a ReusedExchange in the final plan;
    - bm25's final plan has ZERO FileScan and ZERO Generate nodes (the
      one scan/explode ran at postings materialization) and reads the
      checkpointed postings via Scan ExistingRDD."""
    from mit_6_5840_mapreduce_with_go_spark.operators.sessions import (
        sim_tfidf_topk,
    )

    df = sim_tfidf_topk(spark, sf_dir)
    df.collect()
    plan = physical_plan(df)
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan, (
        "sim_tfidf_topk: no ReusedExchange in final plan — the "
        "postings subtree is being exploded and shuffled twice"
    )

    df = sim_bm25_topk(spark, sf_dir)
    df.collect()
    plan = physical_plan(df)
    assert "isFinalPlan=true" in plan
    tree = plan.split("\n\n")[0]
    assert "Scan ExistingRDD" in tree, (
        "bm25: checkpointed postings leaf missing from the final plan"
    )
    n_scan = len(re.findall(r"FileScan parquet", tree))
    n_gen = len(re.findall(r"\bGenerate\b", tree))
    assert n_scan == 0, (
        f"{n_scan} corpus scans in bm25's final plan (want 0): a "
        f"consumer stopped reading the materialized postings"
    )
    assert n_gen == 0, (
        f"{n_gen} Generate nodes in bm25's final plan (want 0): a "
        f"corpus re-explode appeared"
    )


def test_bm25_prf_postings_reuse_and_pass2_decomposition(spark, sf_dir):
    """Round-8 pin for the PRF tail (the round-7 bench's slowest query):

    1. the corpus postings are MATERIALIZED once (localCheckpoint in
       _bm25_postings, r13) and every corpus consumer (pass-1 scoring,
       feedback-df mining, expansion-pass scoring) reads the leaf: the
       EXECUTED final plan contains ZERO corpus FileScan and ZERO
       Generate explode nodes;
    2. pass-1 scores are checkpointed too (consumed by both the
       feedback top-k and the final merge), so the plan carries
       multiple Scan ExistingRDD leaves;
    3. pass 2 is DECOMPOSED: original-term contributions come from
       pass 1's scores (scored1 FULL JOIN exp_scored), so the only
       second corpus scoring pass is over the <=M-per-query expansion
       vocabulary.  The full-join merge must appear."""
    from mit_6_5840_mapreduce_with_go_spark.operators.retrieval import (
        sim_bm25_prf_expansion,
    )

    df = sim_bm25_prf_expansion(spark, sf_dir)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    final = executed.split("== Initial Plan ==")[0]
    n_scan = len(re.findall(r"FileScan parquet", final))
    n_gen = len(re.findall(r"Generate explode", final))
    n_leaf = len(re.findall(r"Scan ExistingRDD", final))
    assert n_scan == 0, (
        f"{n_scan} corpus scans in the final plan (want 0): a corpus "
        f"consumer stopped reading the materialized postings"
    )
    assert n_gen == 0, f"{n_gen} corpus explodes in the final plan (want 0)"
    assert n_leaf >= 2, (
        f"only {n_leaf} checkpointed leaves (want >=2: postings + "
        f"pass-1 scores)"
    )
    assert re.search(r"SortMergeJoin.*FullOuter|FullOuter.*SortMergeJoin",
                     final) or "FullOuter" in final, (
        "pass-2 decomposition merge (scored1 FULL JOIN exp_scored) "
        "missing from the final plan"
    )


def test_round8_queries_no_cartesian_no_python_hotpath(spark, sf_dir):
    """Round-8 non-decode queries: no CartesianProduct anywhere, and
    the frontier/PPJoin/DSIR aggregation paths stay JVM-side (Python
    appears only in Arrow-batched decode stages, never row-at-a-time)."""
    from mit_6_5840_mapreduce_with_go_spark.operators.crawl import (
        crawl_url_frontier_stats,
    )
    from mit_6_5840_mapreduce_with_go_spark.operators.curation5 import (
        curation_dsir_weights,
    )
    from mit_6_5840_mapreduce_with_go_spark.operators.dedup2 import (
        dedup_ppjoin_shingles,
    )
    from mit_6_5840_mapreduce_with_go_spark.operators.ingest_csv import (
        ingest_csv_permissive_stats,
    )
    from mit_6_5840_mapreduce_with_go_spark.plans.explain import (
        assert_no_cartesian,
        physical_plan,
    )

    for fn in (
        crawl_url_frontier_stats,
        curation_dsir_weights,
        dedup_ppjoin_shingles,
        ingest_csv_permissive_stats,
    ):
        df = fn(spark, sf_dir)
        assert_no_cartesian(df)
        plan = physical_plan(df)
        assert "BatchEvalPython" not in plan, fn.__name__
        if fn is not dedup_ppjoin_shingles:
            assert "MapInPandas" not in plan, fn.__name__
