"""Generate PLANS.md — formatted physical plans for the engine's key
operators, annotated with the scale properties each plan must exhibit.
Evidence artifact for plan-quality review; the assertions themselves live
in tests/test_plans.py.

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from apache_cassandra_spark.queries import QUERIES
from apache_cassandra_spark.session import get_spark

AUDITED = {
    "cass_write_path": "post-compaction read off the bucketed catalog table: NO reconcile aggregate (pre_reconciled), NO Exchange hashpartitioning anywhere — the scan's HashPartitioning(key) feeds the ORDER/limit directly",
    "text_repetition": "per-doc mode via explode → HashAggregate(doc,gram) → HashAggregate(doc): all hash aggregates (partial+final), Generate per n-gram branch, no windows, no SortAggregate",
    "media_decode": "real codec decode: scan → JVM payload generation (codegen'd hex/unhex) → single ArrowEvalPython/mapInPandas map, no shuffle anywhere",
    "semantic_dedup": "SemDeDup: BroadcastNestedLoopJoin corpus×centroids (k rows broadcast), WindowGroupLimit argmax assignment, within-cluster pair join keyed on cluster id, left-anti survivor select. (dedup_groups/prepare_corpus are excluded here: the closure loop executes eagerly via localCheckpoint, so their final explain shows only the last join over checkpointed RDDs.)",
    "cass_get_slice": "point read: expect parquet PushedFilters on key, partial_max_by, no shuffle beyond the reconcile exchange",
    "cass_multiget_slice": "multiget: In(key,...) pushdown + WindowGroupLimit for the per-key count",
    "cass_lww_row_tombstones": "reconcile + shadowing: watermark joins carry NO forced hint (per-container watermark cardinality is unbounded under delete-heavy workloads) — AQE picks BroadcastHashJoin from measured size at this sf, and falls back to a shuffled join when watermarks outgrow the driver",
    "cass_range_slices_keys": "range scan: TakeOrderedAndProject top-N on candidate keys before the reconcile",
    "dedup_minhash_lsh": "LSH: single wide aggregation for signatures, equality join on band buckets",
    "sim_topk": "ANN baseline: broadcast of the query side, WindowGroupLimit for top-k",
    "media_decode_png": "PNG path: scan → codegen'd JVM PNG synthesis (stored-block deflate + crc32 exprs) → one mapInPandas decode, no shuffle",
    "text_tfidf": "tf-idf: explode → HashAggregate(doc,term) → HashAggregate(term) for df, both df and corpus-count come back as BroadcastHashJoin/BroadcastNestedLoopJoin, WindowGroupLimit top-k — only one corpus-sized Exchange (on (doc,term))",
    "corpus_sample_stratified": "stratified sample: map-only — PushedFilters/Filter over the scan, NO Exchange, no join (rate lookup is a literal CASE)",
    "corpus_sample_quota": "quota sample: WindowGroupLimit partial truncation below the single stratum Exchange",
    "corpus_sample_weighted": "A-ES weighted sample: per-row hash-draw + quantized ln(u)/w key (map-only literal arithmetic), WindowGroupLimit pre-truncation below the single stratum Exchange — shuffle moves sources x k, no join, no global sort",
    "text_collocations": "PMI collocations: corpus stream aggregates ONCE into two cached vocab-bounded count tables (unigram, adjacent-pair); pair->unigram joins on vocab keys AQE-decided (no forced broadcast — the tfidf rule), 1-row totals crossJoin, TakeOrderedAndProject top-k — no global sort, no Python",
    "cass_read_at_ts": "snapshot read: ts <= T predicate BELOW the reconcile aggregate, pushed into PushedFilters of the parquet scan",
    "dedup_lines": "line dedup: winner table is HashAggregate min(bigint) over the bit-packed (id,pos) — NO SortAggregate, no window rank; join back on the line string (AQE skew-split), ObjectHashAggregate collect_list only for per-doc reassembly",
    "dedup_spans": "suffix-array-style span dedup: window stream is one Generate (posexplode of per-row transform) — linear, no self-join; winner = HashAggregate min(bigint) over bit-packed (id,pos); cut expansion a sequence-explode; reassembly collect_list bounded per doc; no Window, no CartesianProduct",
    "text_bigram_logprob": "interpolated bigram LM: corpus token stream aggregates only on vocab-sized keys (uni + bigram HashAggregates); scored bigram table joins the unigram model on vocab keys then BROADCASTS back to the per-doc bigram stream — the corpus-scale stream never shuffles on a token key",
    "events_pagerank": "integer-exact PageRank, 3 unrolled iterations: per iteration one equality join (src==node) + one partial-combinable HashAggregate on dst (Pregel message shape); edge derivation is a per-user bounded window; no cartesian, no SortAggregate",
    "events_hits": "integer-exact HITS: half-steps execute EAGERLY (localCheckpoint lineage cuts — see SCALE.md), so the printed plan is the final join of node-count-sized checkpointed score tables; each half-step was one equality join + HashAggregate + a single-row broadcast max; max-normalize is an integer div — no float L2 norm",
    "events_communities": "synchronous label propagation: per round one equality join (neighbor label) + (node,label) HashAggregate + argmax as TWO aggregates (max weight, then min label) — no window, so celebrity-node votes stay map-side combinable",
    "media_decode_gif": "GIF path: per-row mapInPandas encode (real LZW) then one mapInPandas decode — pure map, no shuffle, payload bytes never reach the driver",
    "embedding_pq_encode": "PQ encode: codebooks are plan literals; every per-subspace argmin is a per-row array_min over codegen'd distance folds — map-only, NO join/exchange/Python; the shape that scans 10^9 vectors embarrassingly parallel",
    "sim_pq_topk": "ADC top-k: pq_encode's map-only argmin + m literal-array LUT lookups summed as integers + TakeOrderedAndProject — no window, no join, no global sort",
    "corpus_pack_sequences": "sequence packing: ONE Exchange on the md5 shard id, per-shard Sort + running-sum Window (parallelism = n_shards, no global sort); integer div for the sequence id",
    "corpus_shard_roundtrip": "sharded sink round-trip: read side is a plain partitioned-parquet scan with shard as a partition column (no per-row recompute)",
    "media_resize": "real resize: JVM payload synthesis → MapInPandas transcode (decode raster / nearest-neighbor / P6 re-encode) → MapInPandas decode — two Python crossings, no shuffle anywhere",
    "events_sessionize": "sessionization: ONE Exchange on user_id feeding lag + running-sum Window then a partial HashAggregate — per-user parallelism, no global sort",
    "corpus_stats": "per-source rollup: Generate-free token count (size(split)), partial+final HashAggregate on source",
    "corpus_sample_token_budget": "token-budget mix: literal CASE budget, one per-stratum window cumsum over the draw order, filter — no joins",
    "events_asof": "as-of join: interleave union → ONE Exchange(user) → per-key Window last(ignorenulls) → hash join back for the payload — no inequality join, no BroadcastNestedLoop",
    "events_range_join": "range join: interval slots explode (30 rows), events hash to their hour slot, BroadcastHashJoin on the slot, exact bounds as post-join filter",
    "corpus_chunk": "chunking: scan → Generate(posexplode over start sequence) → Project(slice/array_join) — all codegen, NO Exchange",
    "dedup_within_doc": "within-doc dedup: single Project with the index-lambda filter — per-row, NO Exchange, no join",
    "corpus_sample_importance": "importance resampling: ONE per-row projection (gopher features via keep_cols passthrough) + deterministic Bernoulli filter — map-only, NO join, NO Exchange",
    "media_audio_features": "audio features: JVM sawtooth WAV synthesis (per-sample transform/hex codegen) → one MapInPandas decode, no shuffle",
    "media_frame_sample": "frame sampling: JVM multi-frame container synthesis → one MapInPandas stream-walk decode with per-frame fan-out executor-side, no shuffle",
    "text_bpe_encode": "BPE encode: corpus collapses to vocab (HashAggregate(word)) FIRST, 10 nested JVM merge folds per DISTINCT word, explode → HashAggregate(token) → TakeOrderedAndProject top-k",
    "events_salted_agg": "salted agg: TWO HashAggregate phases — phase-1 Exchange on (event_type, _salt) spreads the hot key over 16 partitions, phase-2 Exchange moves |groups|×16 rows",
    "events_salted_join": "replicate-salt join: Generate explode(0..7) replicates the dim, join keys include _salt so the hot key's rows land on 8 partitions, SMJ/shuffle-hash on (key, salt)",
    "events_daily_active": "exact distinct rollup: Expand-based two-phase distinct (partial dedup on (day,user) before the day-level count) — no single hot reducer",
    "corpus_blocklist": "blocklist: blocklist frame deduped then BroadcastExchange, LEFT ANTI BroadcastHashJoin — the corpus never shuffles",
    "embedding_quantize": "int8 quantize: single Project of JVM higher-order exprs (array_max/transform/floor) — map-only, no Exchange, no Python",
    "embedding_project": "JL projection: single Project, ±1 matrix as literals, per-dim zip_with/aggregate folds — map-only, no Exchange",
    "corpus_overlap": "overlap fraction: eval shingles dedup + BroadcastExchange, probe is BroadcastHashJoin on shingle (corpus stream never shuffles on shingle); per-doc distinct + count aggregates on uniform doc id",
    "cf_join": "cross-CF co-located join: both sides are bucketed scans (Bucketed: true, SelectedBucketsCount), SMJ on (key, column) with NO Exchange — HashPartitioning(key) satisfies the join via subset co-partitioning",
    "events_interval_join": "interval join: user_id equi-join carries the shuffle (SMJ/shuffled hash), the event-time range rides as join filter — no BroadcastNestedLoop/Cartesian theta join",
    "text_quality_score": "model-based quality filter: single Project (features + integer logit) over the scan — map-only, no Exchange, no Python",
    "corpus_split": "train/val/test split: literal CASE over the md5 draw + partial/final HashAggregate on split — the assignment itself is map-only",
    "text_normalize": "normalization: one Project of regexp expressions — map-only, codegen",
    "media_decode_jpeg": "baseline JPEG path: scan → MapInPandas encode fixture → MapInPandas T.81 decode — two Python crossings, NO Exchange anywhere",
    "basket_pairs": "co-occurrence: distinct(b,i) Exchange → a-priori + size-prune semi joins → groupBy(b) sorted-array build (reuses the b partitioning) → Generate (in-array pair explode, NO pair self-join) → pair HashAggregate",
    "cluster_kmeans_exact": "quantized Lloyd final assignment: literal-folded centroid distances in one Project over the corpus — NO join, NO Exchange (the iteration aggregates ran eagerly at build time)",
    "events_sliding": "sliding windows: Expand (2 rows per event, one per overlapping window) then partial+final HashAggregate — no window function, no sort",
    "events_pivot": "pivot: single partial+final HashAggregate with pivot-first aggregates — one shuffle on day, no per-type scans",
    "text_unigram_logprob": "unigram LM: explode feeds HashAggregate vocab (CACHED — total and join side both read the InMemoryRelation, not a re-explode); scored vocab returns as BroadcastHashJoin onto the token stream; the only corpus-keyed Exchange is the per-doc aggregate",
    "corpus_mixture": "mixture rebalancing: ONE corpus scan measures per-stratum token mass (HashAggregate), total via window over the strata-count frame (no second corpus pass), rate table BroadcastHashJoin back onto the filter scan",
    "tpch_q5ish": "six-table star join: date range in the orders scan's PushedFilters, region/nation BroadcastHashJoin, fact-side joins left to AQE — no cartesian, one aggregate on n_name",
    "events_distinct_exact": "exact cardinalities: Expand-based multi-distinct — partial dedup aggregates keyed (group, value) BELOW the exchange, so the shuffle carries distinct pairs, not raw events",
    "events_distinct_hll": "HLL++ cardinalities: partial_approx_count_distinct map-side, NO Expand — constant sketch bytes per (group, col) cross the exchange; the 10^9-distinct path",
    "docs_ngram_novelty": "n-gram novelty: distinct shingle aggregate → doc-freq HashAggregate → hash join on shingle → per-doc HashAggregate — all hash-partitioned, postings are never paired (nothing quadratic in posting length)",
    "events_anomaly": "integer z-score outliers: (n,S,Q) HashAggregate partial-combines map-side (three scalars per key), stats re-join on the key is hash/broadcast (AQE), comparison is pure decimal(38,0) codegen — no window, no float",
    "cluster_inertia": "k-means quality: literal-folded final assignment (map-only — Lloyd rounds ran eagerly at build) + ONE hash aggregate on cluster id with per-row micro-quantized squared distances — k output rows",
    "tpch_q10ish": "returned-item top-20: returnflag + date filters in the scans' PushedFilters, nation broadcast, TakeOrderedAndProject (no global sort)",
    # round 7
    "corpus_interleave_joins": "large-catalog interleave: per-source rank window + per-rank in-round window + rank-keyed equi-join of the running offsets — NO driver collect, no per-row source fold; the only SinglePartition piece is the cumsum over DISTINCT ranks above a HashAggregate, never the corpus",
    "events_heavy_hitters": "exact heavy hitters: partial+final HashAggregate on (type, user) — exchange carries distinct pairs, not events — then WindowGroupLimit pre-truncates to k per group before the window shuffle",
    "events_gap_fill": "dense gap fill: per-(key,idx) HashAggregate + per-key span HashAggregate → Generate(explode(sequence)) bounded by each key's own span → co-partitioned left join — no global calendar, no SinglePartition",
    "events_triangles": "degree-ordered triangles: equi-joins end to end (degree maps, wedge join on the apex, closing-edge LeftSemi on the (v,w) pair) — out-degree bounded O(sqrt m) kills the hub wedge blowup; no cartesian, no window",
    "text_char_entropy": "char entropy: explode → HashAggregate(doc,char) → HashAggregate(doc) with per-term micro-quantized c·ln(c) — first exchange carries ≤ alphabet rows per doc; no Python, no window",
    "sim_range_search": "radius search: broadcast seed set, corpus streams through ONE scored Project + filter (BroadcastNestedLoop only against the tiny broadcast side) — map-only, no Exchange until the caller aggregates",
    "tpch_q18ish": "large-volume customers: partial_sum quantity roll-up before its single shuffle, qualifying set joins back AQE-decided, TakeOrderedAndProject top-100 — no global sort",
    # pre-built for round 8
    "dedup_incremental": "incremental-ingest dedup: reference reduces to its distinct hash set (map-side combined), batch LeftAnti-joins it on the hash with NO broadcast hint (corpus-cardinality side — AQE decides), then the in-batch min-id winner via LeftSemi — the O(batch + probe) daily-crawl shape",
    "events_quantiles": "exact per-type percentiles: single sort-based percentile aggregate per group, partial-combined — one shuffle keyed on event_type",
    "tpch_q14ish": "promo revenue share: one-month l_shipdate range in the lineitem scan's PushedFilters, part join AQE-decided, conditional decimal sums in ONE aggregate pass",
    # pre-built for round 9
    "docs_kcore": "4-core of the mutual-kNN graph: per-round HashAggregate degree count + two LeftSemi survivor joins on the same node key, lineage cut per round by localCheckpoint — no forced broadcast (survivor set starts corpus-sized, AQE broadcasts as the peel shrinks it); edge build is the fixed-universe exact-kNN baseline",
    "docs_coreness": "full coreness (PODC'11 h-index refinement, 6 bounded rounds): per round one equi-join of the symmetric edge list with the |V|-row estimate table on node id + per-node window rank (partitioned by node, no global sort) + HashAggregate h-index; estimates never broadcast by hint (corpus-sized — AQE decides); bounded replay has NO per-round actions, so the full 6-round join/window/agg chain prints as ONE linear plan over the checkpointed edge scan (unbounded converge mode checkpoints per round instead — its convergence count is an action)",
    "dedup_prefix_jaccard": "PPJoin prefix filter: candidate join touches only each doc's rarest n−ceil(t·n)+1 shingles (doc-freq-ordered window per doc id) + length filter, exact verification fan-out on survivors only — lossless, kills the Σ df² blowup of the full inverted-index join; doc-freq table joined, never broadcast by hint",
    "tpch_q12ish": "shipping-priority audit: one-year l_shipdate range in the lineitem scan's PushedFilters, orders side pruned to (key, priority) before the equi-join, conditional integer counts partial-aggregated",
    "tpch_q13ish": "customer order-count distribution: zero-preserving left join (order filter on the join side, not post-join), two partial-combined hash aggregates, sort only on the tiny final histogram",
    "events_quantiles_approx": "GK approx percentiles: partial_approx_percentile map-side — bounded mergeable sketch per group crosses the exchange instead of the exact percentile's full value set; rank-error pinned vs the exact twin",
    # pre-built for round 10
    "events_heavy_hitters_cm": "count-min heavy hitters: depth×width md5 counter grid per group (ONE combinable hash-agg, exchange bounded by 4·256 rows/group regardless of distinct items), estimate = one equi-join + min agg, WindowGroupLimit top-5 — deterministic hashes make the sketch hash-anchored, unlike HLL",
    "dedup_prefix_containment": "one-sided prefix filter for directed containment: candidates = contained side's rarest n−ceil(t·n)+1 shingles against FULL postings + |B| >= t·|A| size prune, exact verification on survivors — lossless vs the naive directed join (shared oracle)",
    "tpch_q4ish": "order-priority audit: EXISTS as ONE LeftSemi hash join on o_orderkey with the ship-lateness inequality as join residual (each order emits at most once), quarter filter in the orders scan's PushedFilters, lineitem pruned to (orderkey, shipdate), partial-combined priority counts",
    "tpch_q22ish": "lapsed high-balance customers: all-bigint cents (no float sum anywhere), threshold = 1-row global-stats BroadcastNestedLoop (the bounded cross-join class) as the exact rational test cents·n > total, LeftAnti HASH join against the date-pruned recent-orders side, tiny per-segment aggregate",
    "events_clustering_coeff": "local clustering coefficient: the degree-ordered triangle pipeline (equi-joins end to end, LeftSemi closing-edge check) + one extra map-side-combinable degree aggregate + equi-join on node id; cc as ONE bigint micro-division — no float, no window, no cartesian",
    "text_readability": "Flesch reading ease: three codegen'd regex/array counts + one float expression per row — map-only, NO Exchange, no join, no Python",
    "events_ohlc": "per-user daily OHLC: ONE partial-combinable HashAggregate — min_by/max_by ordered by the decimal(38,0)-packed (ts, event_id) key (a struct key degrades to SortAggregate — measured), exchange carries one row per (user, day) cell per upstream task; no window, no sort, no float sum",
    # pre-built awaiting window funding
    "tpch_q17ish": "decorrelated small-quantity revenue: outer brand filter pushed INTO the per-part stats pass (In(p_brand in both part scans), correlation key = part so the prune is lossless), threshold = exact bigint rational 5·qty·n < sum (no division), stats joined back as an equi join with the test as residual",
    "tpch_q19ish": "declarative disjunctive revenue: Spark derives the per-side Or(And(range)) projections of the cross-table OR and pushes them into BOTH parquet scans (plan-locked — no hand-hoisted envelopes), single equi-join with the full OR as residual, partial-combined round-4 decimal revenue",
    "tpch_q21ish": "waiting suppliers without fact self-joins: lineitem scanned ONCE, EXISTS/NOT-EXISTS collapsed to the (orderkey,suppkey)->orderkey aggregate stack (n_supp>=2 AND n_late=1), coarser group key is a prefix so an at-scale shuffled join feeds both aggs exchange-free; top-25 via TakeOrderedAndProject",
    "corpus_dsir_weights": "DSIR importance weights: both distribution passes are vocabulary-FREE map-side-combinable aggregates bounded at `buckets` rows (the cm_sketch boundary), lambda table broadcast (parameter-bounded, allowlisted, flag-gated), per-doc scoring = one (doc,bucket) combine + BroadcastHashJoin + bigint sum; only nested loops are the two 1-row totals",
    "tpch_q15ish": "top supplier by revenue (view + scalar max): Catalyst extracts the crossJoin-equality into a BroadcastHashJoin ON the aggregate value (no nested loop anywhere), date range pushed to the fact scan, revenue aggregate partial-combined, DECIMAL=DECIMAL max equality (exact), AQE-decided supplier join",
    "corpus_url_revisions": "cross-crawl URL change detection: map-only projection (canonicalization chain + 60-bit md5 fingerprint + packed order key) into one HASH-BASED aggregate on (canonical_url, domain) — every aggregate buffer numeric by construction (domain in the group key, latest-fp = max over ONE decimal(38,0) packing ord*2^60+fp60, the events_ohlc recipe), so the Expanded distinct stack never degrades to SortAggregate; no join, no broadcast, no window",
    "corpus_domain_stats": "per-domain web rollup: ONE map-only projection (URL canonicalization regexp chain + quality logit over the same scan — no self-join), single countDistinct plans as the two-level aggregate stack (partial on (domain, canonical_url) -> final on domain, exactly two hash exchanges), final orderBy ranges only the tiny aggregated output; no broadcast, no UDF, no collect",
    "corpus_page_text": "HTML -> text ingest boundary: ONE codegen map-only projection per document (strip/decode/collapse regexp chain, quote-aware per-tag href parse, anchor elements rendered in-array) — no Exchange before the presentation orderBy, no UDF, no Generate (arrays stay in-row)",
    "corpus_outlink_graph": "domain-level crawl link graph: hrefs resolved INSIDE the link array (transform before explode — materializes the target so the eTLD+1 chain never inlines into a >64KB codegen method), Generate explode, ONE shuffle on the raw (src_host, dst_host, page) triple with map-side combine, host->domain mapping AFTER the aggregate on materialized attrs, internal-edge filter anchored to the aggregate output (un-pushable OR predicate) so the regex-derived predicate stays OFF the raw link rows; two cheap domain-regroup shuffles, no joins, no broadcast",
    "corpus_sitemap": "sitemap parse: map-only in-array element extraction + per-element field parse -> ONE explode -> presentation orderBy; no join, no aggregate, no Python",
    "corpus_prepare_crawl": "the composed crawl front door: ONE map-only codegen projection for markup->text + URL keys over the scan; robots universe staged distinct-url -> Exchange -> domain with a localCheckpoint lineage cut (the 64KB-inlining and filter-pushdown-below-aggregate pitfalls, see SCALE.md r12); compliance = AQE-decided LEFT join + linear glob match + per-page WindowGroupLimit; canonical dedup = hash aggregate + AQE equi-join back; no SortAggregate, no Python, no cartesian",
    "corpus_robots": "robots compliance: KB-sized robots docs parse through per-domain windows (tiny exchanges), pages LEFT-join rules on domain (AQE-decided, rules/domain is capped at parse time), per-row LINEAR-TIME glob match (aggregate fold over literal segments — no regex, no backtracking), ONE winner window per page keyed on doc_id",
    "corpus_warc_roundtrip": "binary WARC re-ingest half: binaryFile METADATA scan (content pruned) -> repartition by path -> Arrow mapInPandas record walk (the ONLY Python in the crawl family — framing is inherently sequential per shard) -> codegen header/HTTP-split projection -> presentation orderBy; no join, no aggregate",
    "corpus_main_content": "densitometric block classifier: ONE map-only in-array projection (split -> per-block transform -> filter -> array_join) -> presentation orderBy; no Exchange before the sort, no Generate, no UDF",
    "corpus_wet_roundtrip": "WET re-ingest half of the round trip: distributed multi-char-lineSep text scan (block-parallel record split) -> ONE codegen projection (header regexp parse, payload trim, framing check) -> presentation orderBy; no UDF, no join, no aggregate",
    "corpus_domain_boilerplate": "domain-conditioned boilerplate removal: the exploded line frame is CACHED (two consumers — the boilerplate aggregate and the survivor join — would otherwise re-explode the corpus); per-(domain,line) distinct-page count dedups (dom,line,page) at its partial stage (one row per page per line crosses shuffle 1 — distinct counting, not a min-winner combine); exact integer threshold filter; LEFT join back whose hot keys are exactly the template lines (AQE skew); ordered array_sort/collect_list reassembly (ObjectHashAggregate, not SortAggregate, plan-locked); no windows, no broadcasts forced",
    "corpus_bm25_topk": "BM25 retrieval: one corpus explode -> cached (doc,term) hash aggregate (four consumers: query postings, doclen, token total, and df through the postings), distinct query terms BroadcastHashJoin first (request-bounded, allowlisted) so only query-term postings flow AND document frequency aggregates over postings — never the full vocabulary; dl join AQE-decided (corpus cardinality), 1-row totals broadcast, per-term micro-bigint expr summed exactly, WindowGroupLimit top-k; no SortAggregate, no Python",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="explain_audit")
    out = ["# PLANS — physical plans of the key operators (auto-generated)\n"]
    out.append(f"Generated by tools/explain_audit.py at {sf_dir}; assertions in tests/test_plans.py.\n")
    for name, expectation in AUDITED.items():
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # plans can embed literal control characters (e.g. the normalize
        # regexp's \x00-\x1F class) — escape them so PLANS.md stays text
        plan = "".join(
            ch if ch in "\n\t" or 32 <= ord(ch) != 127 else f"\\x{ord(ch):02X}" for ch in plan
        )
        out.append(f"\n## {name}\n\n*Expectation: {expectation}*\n\n```\n{plan}\n```\n")
    with open("PLANS.md", "w") as f:
        f.write("".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
