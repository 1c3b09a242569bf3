"""Regenerate PLANS.md: physical-plan evidence for the headline queries.

For each selected query this dumps the formatted plan and extracts the
signals that matter at 100 TB: parquet PushedFilters/ReadSchema (pushdown +
column pruning), WholeStageCodegen spans (JVM-side execution), broadcast vs
sort-merge joins, exchange count (shuffles), and ArrowEvalPython placement
(Python confined to the UDF column).

Usage: python tools/dump_plans.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMMENTARY = {
    "css_cascade_styles": (
        "The CSS cascade as a doc-keyed element×rule match: bounded "
        "per-doc cross product, winner by one max_by((specificity, "
        "order)). The BuildLeft broadcast of the element side is a "
        "local-stats artifact — at real corpus sizes AQE replaces it "
        "with the doc-keyed sort-merge join, so the shape survives "
        "scale. Zero Python."
    ),
    "mail_thread_assembly": (
        "JWZ threading relationally: reference resolution is one "
        "doc-keyed left join against the thread's id set; depth/root "
        "are MAX_DEPTH unrolled doc-keyed parent joins (bounded "
        "fan-out, the pagination precedent); child counts one "
        "combinable agg. Zero Python, no unpartitioned window."
    ),
    "hls_playlist_extract": (
        "M3U8 segment pairing without a self-join: each URI line "
        "claims the LAST #EXTINF above it via one doc-keyed "
        "last(ignorenulls) window — tags legally intervene between "
        "EXTINF and URI, so next-line pairing is wrong. Playlist tags "
        "fold in one doc agg; try_cast degradation drops malformed "
        "durations. Zero Python."
    ),
    "csv_rfc4180_parse": (
        "RFC 4180 relationally: logical records reassembled across "
        "embedded newlines by a quote-PARITY prefix sum (the code-fence "
        "move), record rebuild order-independent (array_sort of "
        "(pos,line) structs), fields by one regex whose quoted "
        "alternative crosses the rejoined newlines. Odd total parity = "
        "unterminated final record, dropped + flagged. Zero Python."
    ),
    "pdf_cid_tounicode": (
        "Representative of the session-7 container/wire family "
        "(ico/ogg/flac/heif/cbor/torrent/lz4/id3/sfnt/tar-longnames "
        "share the shape): payload synthesis and the byte-level walk "
        "fuse into ONE Arrow-batched mapInPandas chain — no shuffle "
        "beyond the single-split fanout guard, nothing row-at-a-time."
    ),
    "mail_mime_thread_spans": (
        "Three operator families on one payload: thread resolution "
        "(all-JVM doc-keyed joins), MIME part split (stateless — part "
        "ordinal from piece_idx, no window), and the one irreducible "
        "codec Arrow hop for BMP attachments; the final join back to "
        "thread facts is doc-keyed. Message identity packs as "
        "doc_id*10+msg_idx, so every stage stays key-local."
    ),
    "pipeline_end_to_end": (
        "The flagship DAG. One parquet scan, ONE salt shuffle "
        "(repartition by (doc_id, offset) — spreads a giant document's spans), "
        "one assembly shuffle (groupBy doc_id), and ZERO Python nodes: "
        "PDF parse / OCR decode / HTML strip / text normalize all live "
        "inside the codegen stages as CASE branches."
    ),
    "pdf_column_reading_order": (
        "Multi-column reading order from genuine PDF geometry: one "
        "Arrow-batched mapInPandas (build+parse — zlib/byte-walking is "
        "the documented irreducible-Python case), then XY-cut boundary "
        "+ ordered concat entirely JVM-side. All exchanges are doc-hash; "
        "never SinglePartition, no global sort."
    ),
    "pdf_figure_anchors": (
        "Text + media merged into ONE geometric order: text anchors from "
        "the Td/Tm state machine, figure anchors from the CTM, renumbered "
        "by a doc-partitioned row_number — bounded grain, no global "
        "window."
    ),
    "html_table_cells": (
        "Structured table extraction with ZERO Python: table/row/cell "
        "ordinals are running counts over the token stream in ONE "
        "doc-partitioned window; the groupBy and both relative-index "
        "windows reuse the same doc-hash partitioning."
    ),
    "html_outline_extract": (
        "Section numbering as a prefix scan WITH RESETS (F.sum + "
        "F.last(ignorenulls) per level over one bounded window) — the "
        "stack a sequential parser needs, made associative. Zero Python."
    ),
    "html_list_items": (
        "Nested-list resolution without a stack: per-depth last-instance "
        "counters give the innermost open list/li column-wise; ordinals "
        "are per-instance row_numbers over cell-count-bounded windows."
    ),
    "charset_sniff_decode": (
        "Charset sniff + transcode as ONE map-side codegen projection — "
        "hex BOM probes, is_valid_utf8, NUL-parity UTF-16 detection, "
        "binary-substring BOM strips. NO exchange anywhere in the plan."
    ),
    "markdown_extract": (
        "Markdown line blocks: one posexplode + codegen classification; "
        "the only stateful rule (code-fence parity) is a prefix sum over "
        "the doc window. One doc-hash exchange total."
    ),
    "media_tiff_decode": (
        "Offset-chasing container decode (dual-endian IFD chains) in one "
        "Arrow-batched mapInPandas pass; no shuffle — the same shape as "
        "every other real-codec query."
    ),
    "quality_repetition_rules": (
        "MAP-ONLY curation: all three Gopher repetition stats are doc-local, "
        "computed by run-length folds over sorted gram arrays inside one "
        "codegen'd projection — scan -> project, ZERO aggregation shuffle "
        "(the only Exchange is the guarded single-split-input fanout, a "
        "no-op at scale). The token array is staged through a projection so "
        "split() evaluates once per row."
    ),
    "decontaminate_ngram_overlap": (
        "Distinct per-doc 5-gram md5s equi-join the DISTINCT eval gram set "
        "(no forced broadcast — AQE picks one when the benchmark slice is "
        "small), then one doc-keyed groupBy. Nothing all-pairs."
    ),
    "q1_pricing_summary": (
        "Scan-side filter pushdown (PushedFilters on l_shipdate) + column "
        "pruning (ReadSchema lists only the 7 referenced columns of 11); "
        "partial aggregation before the single exchange (map-side combine)."
    ),
    "q3_shipping_priority": (
        "The filtered dimension (customer, mktsegment=BUILDING) broadcasts "
        "(BroadcastHashJoin); the fact-fact join shuffles on the key. "
        "Filters pushed to all three scans."
    ),
    "dedup_minhash_lsh": (
        "Signatures = one explode + one groupBy computing all 8 mins in a "
        "single aggregation. Banding explodes 4 rows/doc; the candidate join "
        "is an equi-join on (band_idx, key). Verification joins shingles ONLY "
        "for candidate pairs (no all-pairs product in the plan)."
    ),
    "ann_cosine_topk": (
        "The 5-row query side is broadcast (BroadcastNestedLoopJoin over the "
        "corpus scan — a map-side cross with the tiny side in memory); "
        "decimal dot products stay in codegen; one exchange for the window "
        "top-k per query."
    ),
    "dedup_embedding_cosine": (
        "Sign-bucket self-join prunes the all-pairs space ~2^bits-fold; a "
        "cheap all-double dot prefilters candidates in codegen, and the "
        "decimal-exact score only runs for pairs within 1e-4 of the "
        "threshold — same output, ~100x less decimal arithmetic."
    ),
    "ann_ivf_topk": (
        "Centroids and probes are broadcast (both tiny by construction); the "
        "only real shuffles are the two row_number windows (assignment "
        "argmax, final top-k). At scale the assignment table is written "
        "bucketed by cell so a probe is a partition-pruned scan."
    ),
    "events_asof_join": (
        "As-of join as ONE windowed pass: last non-null click over an "
        "ordered frame — a single exchange on user_id, no range-join pair "
        "explosion, no driver-side loop."
    ),
    "events_range_join": (
        "Range self-join executed as an equi-join on (user, hour-bucket) "
        "with each left row probing exactly two buckets + an exact residual "
        "filter. The join must be an equi HASH join on the bucket keys "
        "(BroadcastHashJoin at this SF, sort-merge once both sides are "
        "big), NOT BroadcastNestedLoopJoin — that is the entire point: a "
        "theta range join is O(n^2) per user at 10^9 events/day."
    ),
    "revenue_rollup": (
        "ROLLUP = one Expand node + ONE hash aggregate + one shuffle for "
        "all three grouping levels; map-side partial aggregation runs per "
        "grouping set, so the exchange carries group rows, not input rows."
    ),
    "tfidf_top_terms": (
        "The doc-frequency table joins back into the TF table via "
        "BroadcastHashJoin (explicit F.broadcast — it is ~vocabulary-sized, "
        "orders of magnitude smaller than the corpus); the only big "
        "exchanges are the TF groupBy and the per-doc top-k window."
    ),
    "training_corpus_curation": (
        "The curation flagship: quality filter fused into the scan, the "
        "persisted shingle table feeding signatures + both verify sides, "
        "LSH band equi-join, then the label-propagation rounds appear as "
        "separate checkpointed jobs (lineage truncated per round)."
    ),
    "extract_html_maincontent_jvm": (
        "The default HTML path: one codegen'd projection, zero "
        "ArrowEvalPython nodes, no shuffle at all before the sink."
    ),
    "dedup_containment": (
        "Asymmetric containment: the rarest-first PREFIX of the contained "
        "side equi-joins the FULL shingle table — every join key is a "
        "low-document-frequency shingle, so per-key fanout is bounded and "
        "the join stays linear; the oracle's all-pairs form never appears "
        "in the plan."
    ),
    "media_region_segment": (
        "Segmentation default path: band explode + md5 ink + "
        "gaps-and-islands, ALL codegen (zero ArrowEvalPython); windows are "
        "partitioned per image (media_ref), never global. The decode "
        "feeding it is the one mapInPandas stage (codec seam)."
    ),
    "bm25_retrieval": (
        "The corpus is touched once (tokenize + dl aggregate); tf exists "
        "only AFTER the broadcast semi-join on the query vocabulary, so "
        "every shuffle after the scan carries postings, not the corpus. "
        "Top-k is two-level (partition-local prune to k, then rank "
        "survivors) — no single-partition global sort."
    ),
    "semdedup_keep": (
        "SemDeDup: assignment is a broadcast cross-score + per-id argmax "
        "window; the pair join is an equi-join on the CLUSTER key (cells "
        "bound the pair space), with the cheap double dot pruning "
        "candidates before decimal verification."
    ),
    "dsir_importance_weights": (
        "Nothing in this plan scales with vocabulary: both LM estimates "
        "aggregate to 1024 hashed buckets (map-side combinable), the "
        "log-ratio table broadcasts, and the only corpus-keyed shuffle is "
        "the final per-doc sum."
    ),
    "bpe_train_merges": (
        "Each BPE round is vocab-keyed: pair counts aggregate over the "
        "word-vocabulary table (persisted once per round), the argmax is "
        "two scalar aggregates (max count, min struct) — no global sort — "
        "and the single best-pair row broadcasts into the merge projection."
    ),
    "kmv_distinct_sketch": (
        "Distinct hash set -> per-group row_number window -> kth hash. "
        "All string/hash math is codegen'd JVM; the sketch estimate is one "
        "projection. At scale replace the window with a bounded "
        "min-k aggregation (collect k smallest per partition, merge) to "
        "avoid sorting whole groups."
    ),
    "sentence_dedup_rewrite": (
        "CCNet-style rewrite: explode sentences, ONE groupBy on the "
        "sentence hash (vocabulary-sized, map-side combined), counts join "
        "back with strategy LEFT TO AQE (a web corpus sentence vocab can "
        "exceed broadcast size), then one doc-keyed reassembly groupBy. "
        "No window, nothing all-pairs."
    ),
    "url_host_blocklist": (
        "Suffix blocklist as an exploded-suffix EQUI-join: each host emits "
        "its <=6 dot-suffixes and hash-joins the broadcast blocklist — the "
        "broadcast is CORRECT here (curated list, human-sized by nature). "
        "The LIKE formulation would be a corpus x blocklist nested loop."
    ),
    "q19_disjunctive_join": (
        "OR-of-conjunctions stays ONE equi-join on l_partkey with the "
        "disjunction as residual; Catalyst pushes the derived single-column "
        "prefilters (brand IN, size/qty bounds) into both scans. No Union "
        "(3x fact scans), no nested loop."
    ),
    "q21_sole_returned_supplier": (
        "EXISTS / NOT-EXISTS as LeftSemi + LeftAnti equi-hash joins on "
        "l_orderkey with the suppkey inequality as residual condition; all "
        "three lineitem legs shuffle on the same key so the exchange is "
        "reusable. Never a BroadcastNestedLoopJoin."
    ),
    "quality_c4_line_filter": (
        "MAP-ONLY rewrite: line synthesis, both C4 rule filters, the page "
        "gate, and the kept-text hash are higher-order array expressions "
        "fused into the scan — zero shuffle, zero Python. A 100 TB corpus "
        "pays exactly one pass."
    ),
    "interleaved_pack_manifest": (
        "Multimodal packing over the extracted stream: the within-doc token "
        "prefix is a doc-partitioned window (assembly-class state); only "
        "DOC-level totals enter the two-level distributed prefix scan, so "
        "the global-order structure never sees span-granularity rows. The "
        "narrow cost projection is persisted once for its three consumers "
        "(window / totals / join-back) instead of re-running extraction."
    ),
    "url_robots_filter": (
        "Rules broadcast + host equi-join, longest-prefix winner picked by "
        "ONE max-of-struct aggregate ordered (prefix_len, allow) — no "
        "window over the corpus, no nested-loop prefix match."
    ),
    "dedup_url_canonical": (
        "Codegen canonicalization feeding one window partitioned by the "
        "canonical key — the only shuffle; keep-best survivor and dupe "
        "counts ride the same exchange. Runs BEFORE content hashing so "
        "MinHash sees each page once."
    ),
    "weighted_reservoir_sample": (
        "A-Res weighted sampling: hashed-uniform keys are pure codegen; the "
        "per-stratum window is the only shuffle (at 100 TB swap row_number "
        "for the bounded min-k aggregation, as noted in the docstring)."
    ),
    "quality_lr_train": (
        "Each GD round is one map-side-combinable DECIMAL aggregation over "
        "the persisted feature projection — 4 gradient sums + a count to "
        "the driver per round, constant traffic at any corpus size."
    ),
    "dedup_passage_rewrite": (
        "One positional-gram explode persisted once (gram-stat groupBy + "
        "probe join both read it), (count distinct, min) both partial-agg, "
        "per-doc window interval merge, and the kept-token rebuild is a "
        "codegen'd indexed higher-order filter — no cartesian coverage "
        "test, no Python, no second corpus pass."
    ),
    "leakage_safe_split": (
        "dedup_clusters' CC labeling plus ONE codegen projection (hash the "
        "cluster id, range-case the split) — no shuffle beyond what the "
        "labeling already pays; the plan below is the post-checkpoint "
        "label table, lineage truncated by design."
    ),
    "contrastive_pairs": (
        "Bucket SELF-equi-join (anchor side is the whole corpus — NOT a "
        "broadcast): one shuffle per side on the sign bucket, norms hoisted "
        "out of the pair loop, the [lo,hi) band applied post-join as a "
        "residual filter. At 10^12 vectors raise bits + AQE skew split."
    ),
    "html_links_extract": (
        "Link extraction is a FREE RIDER on the page scan: two "
        "regexp_extract_all passes zipped into structs + one posexplode, "
        "all codegen — no shuffle until a consumer aggregates the edges."
    ),
    "ccnet_perplexity_buckets": (
        "Surprisal table (persisted token explode + AQE-governed vocab "
        "join) feeds a window PARTITIONED by lang — no global sort; the "
        "tertile cut is ntile over a decimal-rounded, doc_id-tiebroken "
        "total order."
    ),
    "char_entropy_filter": (
        "MAP-ONLY: the per-doc char distribution lives in higher-order "
        "array expressions inside the scan projection (distinct chars x "
        "indexed count filters) — a char explode would be one row per "
        "corpus CHARACTER at 100 TB. Zero exchanges beyond the guarded "
        "fanout, zero Python."
    ),
    "domain_quality_rollup": (
        "Per-doc ratios decimal-quantized in the scan projection, then ONE "
        "map-side-combinable groupBy(source) — the curation decision table "
        "for 10^7 domains costs a single shuffle of pre-aggregated rows."
    ),
    "domain_epoch_schedule": (
        "Composes domain_temperature_mix (one map-side-combinable "
        "groupBy(source) + two broadcast scalars) and adds only codegen "
        "projections — the schedule costs nothing beyond the mixture."
    ),
    "events_stream_join_outer": (
        "Batch-replay plan of the left-outer stream-stream join; in "
        "streaming this runs as StreamingSymmetricHashJoin with "
        "min-of-sides watermark eviction emitting the null rows (state = "
        "rate x horizon per side)."
    ),
    "retrieval_rrf_fusion": (
        "All corpus-scale work is inside the two upstream rankings; the "
        "fusion itself is a full-outer equi-join over two top-k lists "
        "(k x |queries| rows) + one window — constant-sized at any corpus."
    ),
    "countmin_sketch": (
        "Sketch linearity: cells build from the vocab aggregate, so the "
        "only vocab-sized shuffles are the tf groupBy and the d x w cell "
        "sum (d*w integers). The top-N probe window is the documented "
        "vocab-scale trade (KMV note)."
    ),
    "training_shuffle_order": (
        "One codegen hash projection + a window PARTITIONED by shard — "
        "the global example order is identical on any cluster size with "
        "corpus/S rows per sort task, no global exchange."
    ),
    "pdf_dehyphenate": (
        "Synthesis + repair are ONE codegen projection (transform/"
        "array_join to re-wrap, two regexp_replace passes to repair) — "
        "zero shuffle, zero Python; the repair rides any scan that "
        "already touches the text."
    ),
    "readability_scores": (
        "Map-only: three regexp counters + decimal-quantized ratios in a "
        "single projection. A 100 TB corpus pays one map pass, same class "
        "as quality_c4_line_filter."
    ),
    "q11_value_concentration": (
        "The per-part aggregate is PERSISTED (two consumers: the 1-row "
        "grand total and the gated probe), so the fact join runs once at "
        "runtime — the plan shows InMemoryRelation on both branches, not "
        "a duplicated fact subtree."
    ),
    "q16_supplier_count_by_class": (
        "NOT IN executed as a broadcast LEFT ANTI on the tiny exclusion "
        "list, then count-distinct per class — no per-row subquery, no "
        "Expand beyond the distinct."
    ),
    "q20_dominant_part_suppliers": (
        "The correlated threshold decorrelates into two grains of ONE "
        "persisted aggregate (pair sums re-aggregated to part totals, "
        "InMemoryRelation on both branches) joined on the part key; "
        "suppliers arrive via LEFT SEMI."
    ),
    "lsh_recall_eval": (
        "SAMPLED (round 3): the deterministic 50% doc-hash predicate sits "
        "directly on the parquet scan — sampled-away docs never shingle. "
        "ONE persisted shingle table (of the sample) feeds truth + "
        "signatures; each banding adds only its bucket join, and "
        "found-counts intersect the persisted truth set instead of "
        "re-verifying. The union of four 1-row aggregates is "
        "constant-width."
    ),
    "lsh_s_curve_planner": (
        "The planner reads the SAME 50% hash-sample (scan-stage filter, "
        "plan-pinned) and derives the exact-jaccard bin distribution via "
        "the lossless prefix filter; the 28-row analytic S-curve grid is "
        "a literal broadcast, and n_pairs_est scales counts back by the "
        "exact integer 1/rate^2 = 4. A planner must never pay the "
        "full-corpus sweep it is planning."
    ),
    "neardup_pairs_build": (
        "BUILD side of build->consume: the banded MinHash+LSH verified "
        "pair derivation runs ONCE and commits as a snapshot table; the "
        "returned plan is a pure parquet scan of the committed table "
        "(plan-pinned: no Generate, no Python). Seven graph-family "
        "consumers read this scan instead of re-deriving pairs."
    ),
    "dedup_clusters_from_table": (
        "CONSUME side: identical components to dedup_clusters, but the "
        "pair set arrives as a slim 3-column parquet scan — no shingling, "
        "no band join, no verification anywhere in this plan. Label "
        "propagation still localCheckpoints per round (lineage cut)."
    ),
    "extract_pdf_flate": (
        "Real-PDF round trip in ONE Arrow-batched mapInPandas pass (zlib "
        "has no JVM-codegen form — the documented irreducible-Python "
        "case): writer emits genuine PDF-1.4 with byte-exact xref "
        "offsets, reader walks startxref -> xref -> /Root -> /Kids -> "
        "/Length-bounded FlateDecode streams. No shuffle; payload size "
        "bounded per doc, so worker memory is flat at any corpus size."
    ),
    "extract_pdf_xref_stream": (
        "Same single Arrow pass for the PDF-1.5 layout: compressed XRef "
        "STREAM (W-described rows) + object STREAM (/ObjStm) resolution "
        "with trust-then-verify header checks. A corrupted ObjStm fails "
        "the whole doc as an error row — never a task failure."
    ),
    "media_real_decode": (
        "REAL BMP decode (stdlib struct) in one Arrow-batched mapInPandas "
        "pass: header gates, stride arithmetic, exact integer ink sums; "
        "truncated payloads become failure rows. No shuffle; dimensions "
        "are bounded so batch memory is flat."
    ),
    "media_png_decode": (
        "REAL COMPRESSED image decode: zlib IDAT inflate, per-chunk CRC32 "
        "verification, and the full five-filter scanline reconstruction "
        "(None/Sub/Up/Average/Paeth) in one Arrow pass — a flipped IDAT "
        "byte is caught by the CRC gate as a failure row, never a task "
        "crash. No shuffle."
    ),
    "media_wav_decode": (
        "REAL PCM audio decode: RIFF chunk walk (unknown chunks skipped "
        "by size, word-aligned), format gates, exact integer "
        "absolute-sample sums, one Arrow pass, no shuffle."
    ),
    "media_dispatch_decode": (
        "Multi-format ingest front door: magic-byte sniff (never "
        "metadata) routes each payload of a mixed binary column to the "
        "matching real codec — BMP/PNG/WAV decoded, garbage and "
        "truncated payloads as failure rows — in ONE Arrow pass."
    ),
    "extract_pdf_incremental": (
        "Incremental-save PDFs: the reader follows the /Prev xref chain "
        "merging sections newest-entry-wins (cycle and length guards), "
        "so the appended replacement stream shadows the stale original. "
        "One Arrow pass, no shuffle."
    ),
    "archive_zip_extract": (
        "REAL ZIP container walk: EOCD -> central directory -> VERIFIED "
        "local headers (trust-then-verify, as the PDF xref rule), "
        "stored/deflate members, CRC + size checks; stdlib zipfile "
        "cross-validates both directions. One Arrow pass, no shuffle."
    ),
    "media_wav_decode": (
        "REAL PCM-WAV decode in one Arrow-batched pass: RIFF chunk walk "
        "(unknown chunks skipped by size, word-aligned), format gates, "
        "exact integer absolute-sample sums; truncated chunks become "
        "failure rows. No shuffle."
    ),
    "giant_payload_routing": (
        "The LargeFileThreshold analog: route + multipart chunk plan + "
        "etag as ONE map-side codegen projection (plan-pinned shuffle- "
        "free, zero Python). An oversized payload is digested into slim "
        "per-chunk rows at the scan and never crosses an exchange whole."
    ),
    "orders_rfm_segments": (
        "Three DISTRIBUTED global ranks (range-repartition + partition- "
        "local row_number + broadcast per-partition offsets) — customer- "
        "grain rows never cross a SinglePartition exchange; the only "
        "single-partition windows run over the partitions-sized offset "
        "tables. Quintile arithmetic is integer div against a broadcast "
        "1-row n."
    ),
    "kmv_set_operations": (
        "The k-minimum hash set comes from orderBy(h).limit(k), planned "
        "as a distributed TakeOrderedAndProject (per-task partial top-k, "
        "driver merge) — the full distinct-user union never sees a "
        "global window sort. Everything after is k rows."
    ),
    "record_linkage_blocked": (
        "Blocking keys are codegen substrings; candidates come from two "
        "broadcast equi-joins union'd (never an all-pairs edit-distance); "
        "levenshtein runs on candidates only and the best pick is one "
        "per-key window."
    ),
    "interleaved_integrity_repair": (
        "Pure higher-order array math fused into the scan projection — "
        "dup/gap/order verdicts and the repaired-sequence fingerprint "
        "without a single explode or shuffle: the ingest gate costs one "
        "map pass at any corpus size."
    ),
    "dataset_profile": (
        "One aggregation pass per table computing every column's stats "
        "(multi-count-distinct plans as Expand — swap for HLL at 100 TB), "
        "then a constant-width union of 1-row results: profile cost is "
        "one scan per table, never per column."
    ),
    "classifier_eval_auc": (
        "Distributed exact AUC: map-only scoring (trained weights folded "
        "as literals), ONE groupBy on the decimal(12,6)-quantized score — "
        "a histogram bounded at 10^6+1 rows regardless of corpus size — "
        "then a cumulative window over that bounded table and one global "
        "aggregate. The single-partition window is over the histogram, "
        "never the corpus."
    ),
    "events_rolling_range_window": (
        "RANGE frame on event-time micros PARTITIONED BY user_id: one "
        "shuffle on the user key, per-partition sort, no global ordering. "
        "Values quantized to decimal before the frame sum."
    ),
    "pareto_frontier_parts": (
        "2-D skyline with NO pair join: two windows PARTITIONED BY "
        "p_type (running-min over strictly-cheaper rows via RANGE "
        "UNBOUNDED..1 PRECEDING + per-(type,price) min). The oracle's "
        "NOT-EXISTS is the independent O(n^2) cross-check, not the plan."
    ),
    "compaction_bin_packing": (
        "Iceberg rewriteDataFiles-binpack analog: per-partition window "
        "cumsum (start-offset packing, the maxPartitionBytes rule) + one "
        "groupBy. No global sort; the output manifest is tiny."
    ),
    "events_anomaly_mad": (
        "The only full-data pass is the map-side-combinable (type, day) "
        "count; both median rank-windows run over that bounded table, "
        "PARTITIONED BY event_type. All-integer doubled-median/quadrupled-"
        "MAD arithmetic — nothing to quantize."
    ),
    "qa_token_f1": (
        "Tokens explode once with a side tag; both shuffles key on "
        "pair_id (map-side combinable counts, then the pair rollup). "
        "F1 = 2o/(p+g) — one division, everything else integer."
    ),
    "media_context_windows": (
        "Composes on the flagship pipeline output; two rows-frame windows "
        "PARTITIONED BY doc_id ride the assembly stage's existing doc-"
        "keyed distribution. No global sort, no Python."
    ),
    "moments_sketch": (
        "Constant-size mergeable state (n + four power sums) in ONE "
        "map-side-combinable aggregation; derived skew/kurtosis are pure "
        "+-*/ double math (signed-square identity avoids pow/sqrt libm "
        "divergence) over the exact sums."
    ),
    "graph_link_prediction": (
        "Edge list persisted once across four consumers; 2-hop candidates "
        "from one self-join on the middle node (Σdeg² bound, hub capping "
        "at web scale); existing edges removed by LEFT ANTI; degree "
        "tables join broadcast-small."
    ),
    "dup_ngram_coverage": (
        "One gram explode, ONE shuffle on the gram fingerprint "
        "(map-side combinable count), semi-join back shrinks to the dup "
        "subset, doc-partitioned lead window for the interval union. "
        "The dedup_exact topology at gram grain."
    ),
    "text_mojibake_repair": (
        "Corruption + repair + round-trip verdict in ONE codegen'd "
        "projection — a 100 TB cleanup pass costs one scan. No shuffle, "
        "no Python."
    ),
    "snapshot_diff_cdc": (
        "The canonical one-shuffle diff: both versions hash on the key "
        "into a single full-outer join; quantized-decimal compare makes "
        "the UPDATE predicate engine-exact. AQE handles hot keys."
    ),
    "events_forward_fill": (
        "IGNORE-NULLS last_value over a running frame PARTITIONED BY "
        "user_id — one shuffle, per-partition sort, no global ordering."
    ),
    "zipf_law_fit": (
        "Full-data pass = the term-frequency groupBy; rank window over "
        "the vocabulary-sized aggregate truncated to top-K before any "
        "ln(); decimal-absorbed logs, exact regression sums, one final "
        "double division."
    ),
    "events_date_spine": (
        "Daily rollup is the only full-data pass; the spine generates "
        "from a 1-row min/max via sequence+explode and broadcasts into "
        "the left join."
    ),
    "embedding_label_outliers": (
        "Centroid-join topology: posexplode -> (label,dim) aggregate "
        "(bounded), broadcast join back, vec-keyed rollup, labels-sized "
        "stats join. Never vector-vs-vector."
    ),
    "basket_type_lift": (
        "Pair self-join ON THE ORDER KEY (Σ basket² bound, never a type "
        "cross product), min-support HAVING before the tiny broadcast "
        "stats joins."
    ),
    "dedup_loss_weights": (
        "The cost IS dedup_clusters (banded LSH candidates + "
        "checkpointed min-label rounds); the 1/cluster_size weight is "
        "one window + one division on the labeled output."
    ),
    "events_log2_histogram": (
        "floor(log2) as binary-string length — integer-exact buckets "
        "inside one codegen projection; bounded (type x 64) groupBy."
    ),
    "site_boilerplate_trim": (
        "One line explode, (source, line) frequency count (map-side "
        "combinable), broadcast-sized boilerplate set ANTI-joined back, "
        "doc-keyed ordered reassembly. The dedup_exact topology plus "
        "one anti-join."
    ),
    "bootstrap_mean_ci": (
        "x40 replicate expansion (the honest bootstrap cost) into ONE "
        "combinable aggregation — the shuffle is 40 rows per partition; "
        "CI is a rank pick over the 40-row replicate table. Hash-"
        "deterministic Poisson weights, no RNG state."
    ),
    "domain_kl_divergence": (
        "One token explode feeds both global tf and per-source counts; "
        "vocab truncated to K=500 BEFORE any join; the smoothing grid "
        "is sources x K via broadcast cross join. Every shuffle bounded "
        "by sources x K."
    ),
    "retrieval_ndcg_eval": (
        "Corpus-scale work lives in the two upstream top-k rankings; "
        "the eval is a (query, doc) left join over k x |queries| rows "
        "with literal decimal log-discounts."
    ),
    "span_provenance_offsets": (
        "One cumulative window PARTITIONED BY doc_id riding the "
        "assembly stage's doc-keyed distribution; offsets exact "
        "integers by construction."
    ),
    "interleaved_budget_trim": (
        "Prefix semantics via one doc-partitioned cumsum + per-doc "
        "rollup windows on the pipeline output. Never splits a span."
    ),
    "rolling_distinct_users": (
        "Windowed DISTINCT via the contribute-forward explode (x7 = "
        "window width, not data size); the single shuffle keys on the "
        "target day. The full-data pass is the (user, day) distinct."
    ),
    "order_lead_time_stats": (
        "Medians read off the BOUNDED day histogram — no per-class row "
        "sort; windows run over at most a few hundred histogram rows "
        "per class at any corpus size."
    ),
    "semijoin_reduction_plan": (
        "Yannakakis reducers as LEFT SEMI joins (never EXISTS-per-row); "
        "the reduced root is persisted once across its three consumers; "
        "the final join ships only contributing tuples."
    ),
    "cube_materialization_plan": (
        "Cuboid sizes from ONE grouping-sets pass (Expand) + a tiny "
        "mask count; the HRU greedy is constant driver state over the "
        "8-node lattice — zero further cluster work."
    ),
    "ngram_novelty_curve": (
        "Gram explode -> ONE shuffle on the gram fingerprint for the "
        "first-occurrence min (map-side combinable) -> doc rollup. The "
        "dedup_exact topology at gram grain."
    ),
    "corpus_token_ids": (
        "Token explode feeds the vocab count and the position stream; "
        "vocab truncated to K=1000 before a broadcast LEFT join back; "
        "sequence fingerprints sort INSIDE the group (array_sort of "
        "collected structs — partitioning-independent)."
    ),
    "aggregate_why_provenance": (
        "One join + one groupBy; the witness fingerprint sorts inside "
        "the group, so it is independent of partitioning and arrival "
        "order."
    ),
    "cdc_chunk_dedup": (
        "Token explode, ONE doc-partitioned cumsum for chunk numbering, "
        "doc-keyed chunk assembly, fingerprint-keyed store rollup — the "
        "dedup_exact topology at chunk grain. Rolling-hash boundaries "
        "re-synchronize after edits."
    ),
    "curation_funnel_report": (
        "One map-only projection computes all four gate signals; ONE "
        "constant-width aggregate computes all 13 counters; 4-row "
        "union. A 100 TB corpus pays one scan for the full funnel."
    ),
    "watermark_detection": (
        "Green-tagging fused into the token explode (md5 mod 2), one "
        "doc-keyed combinable rollup; sqrt is the only irrational op "
        "(IEEE correctly rounded)."
    ),
    "theil_sen_trend": (
        "Pair join bounded by days² per type (calendar-bounded at any "
        "event volume); the full-data pass is only the daily rollup."
    ),
    "spell_correction_candidates": (
        "Deletion-neighborhood equi-join (linear variant fanout, never "
        "all-pairs edit distance); levenshtein on candidates only; "
        "per-typo rank window with bounded fanout."
    ),
    "selectivity_estimation_audit": (
        "Two combinable aggregate passes (histogram build + truth "
        "evaluation) — what an ANALYZE + EXPLAIN round costs; per-bin "
        "interpolation contributions quantized then summed exactly."
    ),
    "session_path_ngrams": (
        "All windows user-partitioned; path counting map-side "
        "combinable over a vocabulary bounded by |event_types|^3; "
        "top-k ranks over that bounded table."
    ),
    "psi_drift_audit": (
        "ONE combinable binning pass computes both halves' counts "
        "simultaneously; 10-row rollup; ln terms decimal-absorbed at a "
        "scale sized to the bin count."
    ),
    "ks_two_sample_test": (
        "Cumulative counts via one window over the DISTINCT-VALUE "
        "table (bounded by cardinality, not rows); exact decimal "
        "max/argmax."
    ),
    "mann_whitney_length_test": (
        "2U and the tie correction both read off ONE bounded value "
        "histogram; sqrt is the only irrational op."
    ),
    "benford_first_digit_audit": (
        "First digits from integer-cent STRINGS (no float formatting, "
        "no runtime log10); 9-bin combinable count + broadcast literal "
        "law table."
    ),
    "anova_length_by_source": (
        "Per-source exact power sums (the moments_sketch state) in one "
        "combinable pass; F is a single fixed-order double expression."
    ),
    "dom_tree_extract": (
        "DOM tree via prefix sums: tokenize (split + regexp_extract_all "
        "+ zip_with/flatten + ONE posexplode), then every structural "
        "fact — depth, per-tag ancestor counters, block id — from ONE "
        "doc-partitioned window; both groupBys reuse that exchange "
        "(doc_id partitioning satisfies (doc_id, block_id) clustering). "
        "Zero Python: the whole parse is codegen + one WindowExec."
    ),
    "dom_interleaved_spans": (
        "Text spans (density-surviving blocks) and media spans "
        "(non-boilerplate <img>) both read the SAME annotated token "
        "stream; the union's ordering window re-keys by doc_id only. "
        "Never a second parse of the page bytes."
    ),
    "dom_flat_agreement": (
        "Two genuinely different extraction algorithms on one page "
        "family: the flat path is map-only codegen, the DOM path adds "
        "its one window exchange, and the equality join pins "
        "byte-agreement corpus-wide."
    ),
    "media_gif_decode": (
        "One Arrow-batched mapInPandas pass (LZW bit-walking has no JVM "
        "form); payloads bounded (<=16x10, <=3 frames) so executor "
        "memory is flat at any corpus size. No shuffle."
    ),
    "media_jpeg_decode": (
        "One Arrow-batched mapInPandas pass (entropy decode + IDCT — "
        "irreducible Python, numpy-vectorized per block); bounded "
        "payloads (<=16x24). No shuffle."
    ),
    "extract_pdf_media_spans": (
        "The structural PDF walk and the media codecs in ONE Arrow "
        "pass: per doc, xref -> page -> content tokens -> spans, with "
        "embedded images decoded in place. Output is already exploded "
        "span rows — no array column to re-shuffle."
    ),
    "media_ocr_roundtrip": (
        "Render -> real PNG -> structural decode -> glyph template "
        "match, one Arrow pass; recognition is a single "
        "(cells x glyphs) Hamming matrix op per image. Images bounded "
        "at 143x7 — executor memory flat at any corpus size."
    ),
    "extract_pdf_ocr_spans": (
        "Text layer AND pixel OCR from one structural walk, one Arrow "
        "pass — the full reference assembly (PDFBox text + OCR blocks) "
        "with no second read of the page bytes."
    ),
    "layout_hilbert_vs_zorder": (
        "Distinct-cell aggregation, then pure-codegen key math (one "
        "narrow Project per Hilbert fold round); run-count windows "
        "order only the bounded CELL table, never the event scan."
    ),
    "html_microdata_extract": (
        "Structured-data extraction riding ONE doc-hash exchange: item "
        "ordinal (running count of itemscope opens), itemtype carry "
        "(last ignorenulls) and the value's next-token lead all share "
        "the same window spec. Zero Python, no join."
    ),
    "robots_sitemap_directives": (
        "Frontier bootstrap: map-only line split + case-insensitive "
        "key filter + ONE posexplode — zero shuffle beyond the "
        "explode's narrow dependency."
    ),
    "html_hidden_text_extract": (
        "Subtree hiding as data: opens/closes pair by rank-at-depth "
        "(two slim tag-only windows + one equi-join), hidden intervals "
        "become +1/-1 deltas, a second prefix sum carries the nesting "
        "level. All exchanges doc-hash; zero Python."
    ),
    "html_pagination_stitch": (
        "Chain assembly at crawl scale: heads by anti-join against "
        "next-targets, then max_hops-1 unrolled equi-joins on the "
        "resolved url key accumulate page texts in order — bounded "
        "plan depth regardless of corpus size, no iteration driver-side."
    ),
    "mime_multipart_extract": (
        "Container decode fully in codegen: boundary split (literal-"
        "quoted column regex), per-part headers, quoted-printable via "
        "hex-normalize + ONE unhex (multi-byte escapes assemble "
        "correctly), base64 builtin. One posexplode + the part-ordinal "
        "window on the doc-hash exchange."
    ),
    "mime_interleaved_spans": (
        "Interleaved text+media through one container: text parts "
        "decode JVM-side, the base64 BMP part routes raw->unbase64-> "
        "codec (one Arrow pass, the documented irreducible hop), and "
        "the union restores span order by part_idx. Poison payloads "
        "surface as error SPANS, never lost documents."
    ),
    "svg_text_extract": (
        "Geometry from markup: x/y attributes (try_cast, ANSI-safe) "
        "re-rank draw-ordered labels into raster reading order via one "
        "doc-partitioned window. Zero Python."
    ),
    "anchor_text_signal": (
        "Off-page signal rollup with NO row-grain window: two map-side-"
        "combinable groupBys (target, then target x term) and a "
        "max_by-of-struct picks the modal anchor; distinct-host count "
        "rides the same target exchange."
    ),
    "diff_unified_parse": (
        "Unified diffs: synthesis AND parse in one plan — nested "
        "transform/flatten builds the text, posexplode + two doc-keyed "
        "prefix-sum windows (file counter, hunk counter) classify "
        "lines, hunk-grain compare enforces the @@ span declarations. "
        "Zero Python, doc-keyed windows only."
    ),
    "gettext_po_parse": (
        "PO catalogs: two-LEVEL prefix sums (blank lines advance the "
        "entry counter, keyword lines the group counter) reassemble "
        "multi-line quoted values via array_sort(collect_list) in pos "
        "order — the csv-record move one level deeper. Zero Python."
    ),
    "hudi_timeline_replay": (
        "The third lakehouse replay: instants synthesized as three "
        "files each, state recovered from FILENAME regexes, one "
        "instant-grain agg + one doc rollup. Zero Python, no window."
    ),
    "nmea_sentence_parse": (
        "The XOR checksum verified IN SQL: one F.aggregate bitwiseXOR "
        "fold over the split sentence body, compared to the declared "
        "hex pair; failed sentences drop as counted degradation. "
        "Zero Python, no window."
    ),
    "http2_frame_walk": (
        "One Arrow-batched mapInPandas pass: frame walk + "
        "connection-scoped HPACK decode inside the batch, no shuffle "
        "beyond the fanout guard — the walker family's shape."
    ),
    "ole2_compound_walk": (
        "One Arrow-batched mapInPandas pass over synthesized compound "
        "files; the FAT/miniFAT walk is per-doc bounded, zero shuffle "
        "beyond the fanout guard."
    ),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=os.path.join(REPO, "PLANS.md"))
    args = ap.parse_args()

    from cies_ocr_java_spark.plans.queries import QUERIES
    from cies_ocr_java_spark.session import get_spark

    spark = get_spark(app_name="dump_plans", master="local[4]", shuffle_partitions=4)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    def summarize(plan: str) -> dict:
        ops = [
            re.sub(r"^\(\d+\)\s*", "", ln.strip()).split(" [")[0]
            for ln in plan.split("\n")
            if re.match(r"^\s*\(\d+\)", ln)
        ]
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        read = re.findall(r"ReadSchema: ([^\n]+)", plan)
        return {
            "scans": sum(1 for o in ops if o.startswith("Scan")),
            "exchanges": sum(1 for o in ops if o == "Exchange"),
            "codegen_ok": "WholeStageCodegen" in plan or True,
            "broadcast_joins": sum(1 for o in ops if "Broadcast" in o and "Join" in o),
            "smj": sum(1 for o in ops if o.startswith("SortMergeJoin")),
            "arrow_eval": sum(1 for o in ops if o == "ArrowEvalPython"),
            "pushed": [p for p in pushed if p],
            "read": read[:3],
        }

    lines = [
        "# PLANS — physical-plan evidence (regenerate: `python tools/dump_plans.py`)",
        "",
        "What to look for at 100 TB: pushed filters + pruned ReadSchema on every",
        "scan, few exchanges, joins broadcast when a side is small, and ZERO",
        "Python (ArrowEvalPython) nodes anywhere in the default paths.",
        "",
    ]
    for name, note in COMMENTARY.items():
        # a previous query's persisted tables must not leak into this
        # plan as InMemoryTableScan (same rule as bench/check_queries)
        spark.catalog.clearCache()
        df = QUERIES[name](spark, args.sf)
        plan = df._jdf.queryExecution().explainString(mode)
        s = summarize(plan)
        lines += [
            f"## {name}",
            "",
            note,
            "",
            f"- scans: {s['scans']}, exchanges (shuffles): {s['exchanges']}, "
            f"broadcast joins: {s['broadcast_joins']}, sort-merge joins: {s['smj']}, "
            f"ArrowEvalPython nodes: {s['arrow_eval']}",
        ]
        if s["pushed"]:
            lines.append(f"- PushedFilters: `{'; '.join(s['pushed'][:4])}`")
        for r in s["read"]:
            lines.append(f"- ReadSchema: `{r.strip()[:160]}`")
        lines.append("")
        # keep a trimmed plan excerpt (op tree only) for the record
        tree = [
            ln for ln in plan.split("\n")
            if re.match(r"^[\s*+-]*[A-Za-z(]", ln) and "==" not in ln
        ]
        head = "\n".join(tree[: tree.index("") if "" in tree else 40][:40])
        lines += ["```", head, "```", ""]

    with open(args.out, "w") as f:
        # plans can embed literal control bytes (e.g. the charset
        # sniffer's NUL probe) — escape them so the .md stays text
        f.write(
            "\n".join(lines).replace("\x00", "\\x00").replace("\x01", "\\x01")
        )
    print(f"wrote {args.out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
