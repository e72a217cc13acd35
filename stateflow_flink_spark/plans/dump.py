"""Regenerate PLANS.md: annotated physical plans for flagship queries.

Usage: ``python -m stateflow_flink_spark.plans.dump [sf_dir] [out_path]``
"""

from __future__ import annotations

import contextlib
import io
import sys

from pyspark.sql import SparkSession

from .registry import QUERIES, load_all_modules

NOTES = {
    "q_scan_pruned": (
        "The WHERE and the 2-column projection both reach the parquet reader: "
        "`PushedFilters` + a 2-field `ReadSchema`. At 100 TB this is the "
        "difference between scanning 2 columns and scanning 16."
    ),
    "q_join_multiway": (
        "TPC-H Q3 shape. Both joins are shuffle hash/SMJ on their equi-keys; "
        "the date/segment filters sit at the scans (pushed), and the top-10 is "
        "TakeOrderedAndProject — no global sort."
    ),
    "q_tpch_q5": (
        "6-way join: nation and region arrive via BroadcastExchange (no "
        "shuffle), the three fact-side joins shuffle on their keys; AQE is "
        "free to re-order and skew-split at runtime."
    ),
    "q_agg_groupby": (
        "Partial HashAggregate before the exchange, final after — the "
        "map-side combine halves shuffle volume. The decimal(38,0) sums are "
        "the engine's order-independent exact-aggregation discipline."
    ),
    "q_dedup_minhash": (
        "Signatures and banding are pure projections over the cached shingle "
        "frame; the only shuffles are the bucket self-join (8-byte keys) and "
        "the candidate verification joins."
    ),
    "q_sim_cosine": (
        "The probe vector is a 1-row BroadcastExchange; scoring is a single "
        "pass over the corpus inside WholeStageCodegen; top-10 via "
        "TakeOrderedAndProject."
    ),
    "q_dedup_simhash": (
        "The 60-bit md5-derived signature is a zero-shuffle projection "
        "(Arrow-batched numpy voting kernel riding the scan — the SQL-lambda "
        "fold it replaced is CodegenFallback and cost 10x, caught by the "
        "round-4 stress sweep); one exchange materializes (doc_id, sig) "
        "16-byte rows before the 20-key 3-of-6-block explode, and the "
        "candidate self-join shuffles on the ~30-bit combo bucket — the "
        "bucket space grows with the corpus instead of saturating at "
        "2^16 per band."
    ),
    "q_dedup_embedding_lsh": (
        "The scale-path twin of the exact block-GEMM near-dup query: one "
        "MapInPandas integer-matmul signature kernel (engine-exact "
        "md5-derived hyperplanes), then the verify runs PER BUCKET — each "
        "embedding crosses exactly one hashpartitioning(grp) exchange per "
        "table assignment (L x n rows) into a FlatMapGroupsInPandas that "
        "scores all intra-bucket pairs in numpy. No per-candidate-pair "
        "join: the old spelling shipped two 256-byte payloads per "
        "un-deduped candidate and spilled ~70 GB at 10x stress scale."
    ),
    "q_dedup_substring": (
        "The sliding-window hash stream is materialized once: min/max(doc) "
        "over a hashpartitioning(wh) window flags cross-document spans "
        "in-place (no join-back, no second explode), then one doc_id "
        "exchange rolls up the per-doc shared fraction."
    ),
    "q_regression_gd": (
        "Per GD iteration: 65 weights broadcast out, residual folds inside "
        "the scan stage, one hashpartitioning(dim) exchange of quantized "
        "integer gradient partial sums (partial agg before it), one 65-row "
        "update. Weights never touch the driver."
    ),
    "q_sim_ann_batch": (
        "The IVF assignment is computed once and shared by all probes; the "
        "(probe, cell) pairs and probe vectors arrive via BroadcastExchange, "
        "and the per-probe top-k windows over candidates only — one corpus "
        "pass amortized across the whole probe batch."
    ),
    "q_dedup_fuzzy": (
        "Shingles are hashed to longs once; the DF-cap window and the "
        "candidate self-join shuffle the same 8-byte key, and shingles in "
        "more than DF_CAP documents are dropped before the join — the "
        "worst bucket is bounded at DF_CAP^2 pairs regardless of corpus "
        "size."
    ),
    "q_dedup_containment": (
        "Round 7: the DF cap is a pre-aggregated groupBy(shingle).count + "
        "left-semi join, NOT a window over the exploded (doc,shingle) "
        "table — map-side combine means only DISTINCT shingles cross the "
        "wire where the window buffered every exploded row (14.1 s -> "
        "2.0 s at sf0.1; same oracle hash).  Both containment directions "
        "are scored from one unordered candidate pair."
    ),
    "q_tfidf_cosine_pairs": (
        "Sparse weighted cosine via the inverted index: term-keyed "
        "candidate self-join bounded at DF_CAP^2 per term, numerators and "
        "norms as exact DECIMAL(38,0) sums of 6-dp-quantized idf weights "
        "— the real-valued complement to the Jaccard/MinHash family on "
        "the same candidate discipline."
    ),
    "q_sim_ann_lsh": (
        "Projections AND buckets come from ONE ArrowEvalPython kernel "
        "riding the scan; the margin-ranked 40-bucket probe plan is a "
        "driver-side literal, so candidate selection is a single codegen "
        "exists() filter — no shuffle before the top-10, and at rest each "
        "table is stored partitioned by its bucket column so the probe plan "
        "prunes to <=40 partitions at the scan."
    ),
    "q_pack_sequences": (
        "The running token total is windowed per hash-bucketed packer: one "
        "hashpartitioning(packer) exchange, each packer sorting 1/P of the "
        "corpus. The global-cumsum spelling (SinglePartition window) is the "
        "scale-killer this plan is gated against."
    ),
    "q_mix_domains": (
        "The salted-hash keep decision is a pure projection fused into the "
        "scan stage; the only exchange is the final per-source aggregation "
        "(partial HashAggregate before it). Sampling 100 TB costs one pass, "
        "no shuffle of kept rows."
    ),
    "q_tpch_q1": (
        "The map-side-combine showcase: partial HashAggregate collapses each "
        "scan partition to <=6 rows before the exchange, so the shuffle moves "
        "KBs at any input size; the shipdate predicate is pushed to parquet."
    ),
    "q_decontaminate": (
        "The distinct eval-gram set (MBs at production scale) arrives via "
        "BroadcastExchange; the corpus side probes it in its scan stage with "
        "no shuffle of exploded grams — the only hashpartitioning exchange "
        "carries per-doc hit counts."
    ),
    "q_sessionize_batch": (
        "One hashpartitioning(user_id) exchange feeds lag, the running "
        "boundary-flag sum, AND the session rollup — three logical stages, "
        "one shuffle, one within-partition sort."
    ),
    "q_cluster_kmeans": (
        "Per Lloyd iteration: K*dim centroids broadcast out, the min-struct "
        "assignment partial-aggregates before its vec_id shuffle, and the "
        "centroid update shuffles exact 6dp-quantized integer sums keyed by "
        "(cent, dim). No CartesianProduct, no driver-side collect."
    ),
    "q_join_bloom": (
        "Runtime semi-join pushdown spelled out: the dim keys collapse via "
        "partial-agg bit_or into ONE map row (a fixed-size bitset), which "
        "arrives at the fact through BroadcastExchange; the membership probe "
        "is a plain codegen Filter of bitwise ANDs, so the fact is "
        "pre-filtered to the dim's selectivity BEFORE the join exchange — "
        "that exchange is the term that shrinks at 100 TB."
    ),
    "q_emb_quantize": (
        "The PQ encode pass: subspace slices are a zero-shuffle projection, "
        "the 64-row codebook a BroadcastExchange, and the argmin a packed "
        "min(d2*K + code) hash aggregate — partial before the exchange, no "
        "Window, no Sort. Distances are exact BIGINT arithmetic on "
        "floor(x*1000) quantized elements, so the codes are reproducible "
        "bit-for-bit on any engine."
    ),
    "q_scd2_track": (
        "Both window passes and the change-point filter ride ONE "
        "hashpartitioning(user_id) exchange (plan-gated); the second "
        "lead/row_number sort sees only surviving change rows."
    ),
    "q_zorder_layout": (
        "The Morton interleave is 32 shift/mask terms inside "
        "WholeStageCodegen riding the scan — layout assignment costs one "
        "projection; the distinct-file census partial-aggregates. At "
        "deploy time the z column feeds repartitionByRange + write, and "
        "the payoff is file-level min/max pruning on EVERY interleaved "
        "dimension."
    ),
    "q_dedup_paragraph": (
        "Sentences explode once and immediately reduce to md5 hashes; "
        "the dup-span groupBy partial-aggregates per partition and the "
        "join-back carries (doc_id, hash) pairs — document text never "
        "enters an exchange."
    ),
    "q_graph_pagerank": (
        "Power iteration: per round, edges join ranks on src (the edge "
        "frame is pinned once — at scale a src-partitioned table, so the "
        "join is co-located), contributions partial-sum before the "
        "groupBy(dst) exchange, and the node-count scalar broadcasts. "
        "Integer-quantized ranks keep every iteration engine-exact; "
        "top-20 via TakeOrderedAndProject."
    ),
    "q_knn_graph_mutual_ann": (
        "The 100 TB mutual-kNN spelling: centroid scoring broadcasts the "
        "ceil(sqrt(n))-row cell frame, every vector shuffles once on its "
        "cell key into a per-cell FlatMapGroupsInPandas probe-x-member "
        "GEMM (candidate volume O(n^1.5), never n²/2), a vec_id-keyed "
        "window merges the partial top-k lists, and the mutual check is "
        "a self-join of the pinned directed edge list on the reversed "
        "key — the exact twin's join, fed by pruned candidates."
    ),
    "q_eval_auc": (
        "AUC without a global row sort: the corpus collapses to the "
        "BOUNDED 6dp score histogram (partial HashAggregate before the "
        "hashpartitioning(s) exchange), the cumulative rank window runs "
        "over <=2e6 histogram rows whatever the corpus size, and one "
        "final single-row aggregate closes the Mann-Whitney identity."
    ),
    "q_cep_pattern": (
        "CEP as a window, not a state machine pass: ONE user-keyed "
        "exchange + sort feeds both the row_number and the LOCF "
        "last-non-click struct (two Window nodes, zero extra exchanges), "
        "matches fall out of a Filter — no join, no Generate, per-user "
        "cost linear in that user's events."
    ),
    "q_negative_sampling": (
        "Inverse-CDF sampling without a range join: the vocab cumulative "
        "table expands onto 1024 cumulative-axis buckets (vocab+1024 rows, "
        "BroadcastHashJoin), each draw equi-joins on its bucket and one "
        "filter picks the interval — per-draw work O(1), corpus never "
        "sorted, the draw stream never leaves its scan stage."
    ),
    "q_sketch_kmv": (
        "Bottom-k order statistics without a per-key giant sort: the "
        "distinct-pairs frame is range-bucketed by the top hash bits, a "
        "4096-row occupancy rollup finds the cutoff bucket, and the "
        "cutoff (BroadcastHashJoin) caps what reaches the per-type "
        "row_number window to ~k + one bucket's occupancy regardless of "
        "skew — the containment discipline applied to order statistics."
    ),
    "q_gini_concentration": (
        "The bounded-histogram discipline end-to-end: the corpus meets ONE "
        "user-keyed partial-aggregated count; the count-of-counts histogram "
        "(distinct activity levels, << corpus at any scale) is the only frame "
        "the ordered window ever sees, and the rank-weighted Gini sum is "
        "exact integer algebra on it. A row-level ntile/rank formulation "
        "would be a single-reducer corpus sort."
    ),
    "q_item_cf_cosine": (
        "Item-item CF without an item-pair blowup: the (user,item) aggregate "
        "is pinned and reused three ways (both self-join sides + norms); the "
        "self-join shuffles ONCE on user_id with per-user fan-out bounded by "
        "C(catalog-per-user, 2), and the norm joins broadcast catalog-sized "
        "frames onto the pair result."
    ),
    "q_quality_ensemble": (
        "Three quality filters (rule score, Gopher shape rules, hashed "
        "linear classifier) in ONE pass that is still a pure projection: "
        "a single FileScan + Project, zero exchanges/joins/windows — the "
        "token-array split is bound once and every signal folds over it "
        "JVM-side. At 100 TB this replaces three corpus scans with one."
    ),
    "q_domain_cap": (
        "Per-domain top-N without ranking the corpus: quality quantizes "
        "to 6-dp integers, a (source, score) histogram aggregates FIRST, "
        "and the only ordered window walks that histogram — a whale "
        "domain contributes its distinct score levels, not its doc "
        "count; the domain-total side arrives via BroadcastExchange."
    ),
    "q_dedup_incremental": (
        "Batch-vs-corpus candidates only: new-doc bands equi-join corpus "
        "bands on (band, bucket), so candidate volume scales with "
        "|batch| x bucket occupancy — within-batch and within-corpus "
        "pairs are structurally excluded, and at 100 TB the corpus band "
        "table is the precomputed index a crawl increment probes."
    ),
}


def main(sf_dir: str = "/root/testdata/sf0.001", out_path: str = "PLANS.md") -> None:
    load_all_modules()
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-dump")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical plans of flagship queries (sf-independent shapes)",
        "",
        "Generated with `df.explain('formatted')`; commentary notes the scale-relevant",
        "property each plan must keep. Regenerate: `python -m stateflow_flink_spark.plans.dump`.",
        "",
    ]
    for name, note in NOTES.items():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            QUERIES[name](spark, sf_dir).explain("formatted")
        tree = buf.getvalue().split("\n\n")[0]
        out += [f"## {name}", "", note, "", "```", tree, "```", ""]
    with open(out_path, "w") as f:
        f.write("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
