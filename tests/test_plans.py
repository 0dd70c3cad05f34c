"""Physical-plan regression tests: the plans we want, not just plans
that pass.  Guards the scale properties the north rule grades on —
pushdown, broadcast joins, shuffle counts, whole-stage codegen."""

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def nodes(plan: str, name: str) -> int:
    """Count physical nodes of a type (the '(n) Name' detail headers)."""
    return len(re.findall(rf"^\(\d+\) {name}", plan, flags=re.MULTILINE))


def node_details(plan: str, name: str) -> str:
    """The concatenated detail sections ('(n) Name' through the next
    node header) for every node of a type — where formatted explain
    lists Input/Arguments columns.  Asserting on the TREE portion of
    the plan is vacuous for column checks: the tree never names
    columns."""
    secs = re.findall(rf"^\(\d+\) {name}\b.*?(?=^\(\d+\) |\Z)", plan,
                      flags=re.MULTILINE | re.DOTALL)
    assert secs, f"no {name} node in plan:\n{plan}"
    return "\n".join(secs)


@pytest.fixture(scope="module")
def pages(spark):
    from ukrainian_ocr_pipeline_spark.sources.pages import pages_from_fixtures
    return pages_from_fixtures(spark, 50)


def test_extraction_is_shuffle_free(spark, pages):
    """The whole extraction chain must be one map stage: no Exchange."""
    from ukrainian_ocr_pipeline_spark.operators.extract import extract_pages, extracted_table
    plan = plan_of(extracted_table(extract_pages(pages)))
    assert "Exchange" not in plan, plan


def test_extraction_salted_has_exactly_one_shuffle(spark, pages):
    from ukrainian_ocr_pipeline_spark.operators.extract import extract_pages, extracted_table
    plan = plan_of(extracted_table(extract_pages(pages, salt_buckets=16)))
    assert nodes(plan, "Exchange") == 1, plan


def test_extraction_uses_two_python_stages(spark, pages):
    """segment + fused enrich = exactly 2 ArrowEvalPython exchanges.
    A third would mean someone un-fused the text pass (2x Arrow IPC)."""
    from ukrainian_ocr_pipeline_spark.operators.extract import extract_pages
    plan = plan_of(extract_pages(pages))
    assert nodes(plan, "ArrowEvalPython") == 2, plan


def test_packed_mode_single_python_stage(spark, pages):
    from ukrainian_ocr_pipeline_spark.operators.extract import extract_pages
    plan = plan_of(extract_pages(pages, mode="packed"))
    assert nodes(plan, "ArrowEvalPython") == 1, plan
    assert "Exchange" not in plan, plan


def test_pages_filter_pushdown(spark, tmp_path, pages):
    """validate_pages predicates must reach the parquet scan."""
    from ukrainian_ocr_pipeline_spark.sources.pages import read_pages, validate_pages
    path = str(tmp_path / "pages_pq")
    pages.write.parquet(path)
    plan = plan_of(validate_pages(read_pages(spark, path)).select("url"))
    assert "PushedFilters: [IsNotNull(url), IsNotNull(html)" in plan, plan


def test_metrics_scan_prunes_html(spark, tmp_path, pages):
    """A metrics-only query over a written extraction output must not
    read the heavy columns (column pruning through the scan)."""
    from ukrainian_ocr_pipeline_spark.sources.pages import read_pages
    path = str(tmp_path / "pages_pq2")
    pages.write.parquet(path)
    df = read_pages(spark, path).select("url", "lang")
    plan = plan_of(df)
    assert "ReadSchema" in plan
    read_schema = [line for line in plan.splitlines() if "ReadSchema" in line][0]
    assert "html" not in read_schema, read_schema


def test_revenue_join_broadcasts_dimension(spark):
    from ukrainian_ocr_pipeline_spark.plans.registry import q_revenue_by_nation
    plan = plan_of(q_revenue_by_nation(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan, plan


def test_pricing_summary_partial_agg(spark):
    """groupBy must plan map-side partial aggregation (two HashAggregate
    levels around one Exchange)."""
    from ukrainian_ocr_pipeline_spark.plans.registry import q_pricing_summary
    plan = plan_of(q_pricing_summary(spark, "/root/testdata/sf0.001"))
    assert nodes(plan, "HashAggregate") >= 2, plan
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q_pricing_summary(spark, "/root/testdata/sf0.001").explain()
    simple = buf.getvalue()
    assert "partial_sum" in simple, simple          # map-side combine
    assert "PushedFilters: [IsNotNull(l_shipdate)" in simple  # scan pushdown


def test_minhash_is_jvm_only(spark):
    """The dedup hash path must contain NO Python evaluation."""
    from ukrainian_ocr_pipeline_spark.plans.registry import q_dedup_minhash_signatures
    plan = plan_of(q_dedup_minhash_signatures(spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_topk_broadcasts_queries(spark):
    from ukrainian_ocr_pipeline_spark.plans.registry import q_embedding_topk_bruteforce
    plan = plan_of(q_embedding_topk_bruteforce(spark, "/root/testdata/sf0.001"))
    assert "Broadcast" in plan, plan


def test_ivf_joins_are_broadcast(spark):
    """IVF: centroid cross-joins and the probe join must broadcast the
    small side — a SortMergeJoin here would shuffle the full corpus."""
    from ukrainian_ocr_pipeline_spark.plans.registry import q_embedding_topk_ivf
    plan = plan_of(q_embedding_topk_ivf(spark, "/root/testdata/sf0.001"))
    assert "Broadcast" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_ivf_probe_filter_pushdown(spark):
    """ivf_topk's probe branch re-reads _ivf_scored, which is only cheap
    because the `id IN (query_ids)` filter is pushed through the centroid
    cross join to the parquet scan — exactly one scan may read the full
    corpus unfiltered (the assignments branch)."""
    from ukrainian_ocr_pipeline_spark.plans.registry import q_embedding_topk_ivf
    plan = plan_of(q_embedding_topk_ivf(spark, "/root/testdata/sf0.001"))
    scans = re.findall(r"\(\d+\) Scan parquet[^\n]*\n(?:.+\n)*?PushedFilters: \[([^\]]*)\]",
                       plan)
    assert len(scans) >= 3, plan  # corpus + centroids x2 + probe branch
    selective = [f for f in scans if "In(vec_id" in f or "LessThan(vec_id" in f]
    # every scan except the assignments corpus scan carries a real filter
    assert len(scans) - len(selective) == 1, plan
    assert any("In(vec_id" in f for f in selective), plan  # probe pushdown


def test_headline_bench_excludes_quadratic_shapes():
    """The two deliberately-kept quadratic/reference-parity queries must
    never be promoted to the headline bench (VERDICT round 1, items 2-3)."""
    import bench
    assert "doc_containment_join" not in bench.HEADLINE
    assert "dedup_jaccard_pairs" not in bench.HEADLINE
    # and the scale-safe near-dup entry points ARE headline; the banded
    # cosine headline is the MATERIALIZED-signature path (signatures
    # computed once and reused — the 100-TB shape), with the stateless
    # twin kept correctness-gate-only since it evaluates the signature
    # subtree on both self-join sides (VERDICT r3 'Next round' #3)
    assert "dedup_near_dup_verified" in bench.HEADLINE
    assert "dedup_embedding_cosine_banded_mat" in bench.HEADLINE
    assert "dedup_embedding_cosine_banded" not in bench.HEADLINE


def test_banded_mat_signature_subtree_runs_once(spark):
    """The materialized banded near-dup must read the persisted signature
    table everywhere (4 consumers: two candidate-join sides + two exact
    -verify vector lookups) instead of re-deriving signatures per side —
    the VERDICT r2 item-5 fix.  The unmaterialized variant, kept as the
    stateless comparison twin, re-evaluates the subtree once per join
    side and must contain no cache scan."""
    from ukrainian_ocr_pipeline_spark.plans.registry import (
        q_dedup_embedding_cosine_banded, q_dedup_embedding_cosine_banded_mat)
    mat = q_dedup_embedding_cosine_banded_mat(spark, "/root/testdata/sf0.001")
    plan = mat._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") == 4, plan
    unmat = q_dedup_embedding_cosine_banded(spark, "/root/testdata/sf0.001")
    plan2 = unmat._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in plan2
    # neither variant runs Python
    assert "EvalPython" not in plan and "EvalPython" not in plan2


def test_asof_join_is_one_shuffle_no_theta(spark):
    """The as-of join must be the union-tag + window shape: exactly one
    Exchange (hash on user_id) and NO join operator at all — a range
    theta join here would be a per-user nested loop."""
    from ukrainian_ocr_pipeline_spark.plans.registry import q_event_asof_join
    plan = plan_of(q_event_asof_join(spark, "/root/testdata/sf0.001"))
    assert nodes(plan, "Exchange") == 1, plan
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    assert nodes(plan, "Window") == 1, plan


def test_split_assign_is_partial_agg_scan(spark):
    """Deterministic hash split: pure codegen scan + partial agg — no
    Python, no sample(), map-side combine before the single exchange."""
    from ukrainian_ocr_pipeline_spark.plans.registry import q_corpus_split_assign
    plan = plan_of(q_corpus_split_assign(spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan, plan
    assert nodes(plan, "HashAggregate") >= 2, plan
    assert nodes(plan, "Exchange") == 1, plan


def test_textstats_gates_are_scan_speed(spark):
    """quality_filter and subword_token_counts claim scan-speed: their
    plans must be a single map stage — no Exchange, no Python."""
    from ukrainian_ocr_pipeline_spark.plans.registry import (
        q_doc_quality_filter, q_doc_subword_tokens)
    for q in (q_doc_quality_filter, q_doc_subword_tokens):
        plan = plan_of(q(spark, "/root/testdata/sf0.001"))
        assert "Exchange" not in plan, plan
        assert "EvalPython" not in plan, plan


def test_contamination_broadcasts_benchmark_grams(spark):
    """Decontamination must broadcast the (small) benchmark gram set —
    a SortMergeJoin on the shingle would shuffle every corpus gram."""
    from ukrainian_ocr_pipeline_spark.plans.registry import q_contamination_check
    plan = plan_of(q_contamination_check(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan, plan
    assert "EvalPython" not in plan, plan


def test_repetition_signals_is_shuffle_free(spark):
    """Per-doc repetition stats derive from each row's own text: the
    plan must be a narrow scan->project (sorted-run-length HOF fold),
    never explode+groupBy — at 10^12 rows those two shuffles would
    dwarf the whole job."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["doc_repetition_signals"](
        spark, "/root/testdata/sf0.001"))
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_url_canonical_scan_prunes_to_two_columns(spark):
    """URL dedup needs no text bytes: the scan must read only
    (doc_id, source)."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["url_canonical_dedup"](
        spark, "/root/testdata/sf0.001"))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "doc_id", "source"}, plan
    assert "EvalPython" not in plan, plan


def test_pii_redaction_is_narrow_codegen(spark):
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["pii_redaction"](
        spark, "/root/testdata/sf0.001"))
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_line_dedup_is_jvm_only_no_cartesian(spark):
    """C4 line dedup: explode + digest census + removal join +
    reassembly must stay in codegen — no Python workers, no nested-loop
    join, and the scan reads only (doc_id, text)."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["doc_line_dedup"](
        spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan
    for s in schemas:  # EVERY scan (census + removal sides) stays pruned
        assert set(c.split(":")[0] for c in s.split(",")) == {
            "doc_id", "text"}, plan


def test_host_cap_sample_windows_are_salted_then_host(spark):
    """The two-stage top-K: stage-1 window must partition by
    (host, salt) — a single window partitioned by host alone is the
    megahost-serializing shape the operator exists to avoid."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["host_cap_sample"](
        spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan, plan
    # both windows present, and the salted one partitions by _salt
    assert nodes(plan, r"Window\b(?!GroupLimit)") == 2, plan
    assert "_salt" in plan, plan
    # Spark pushes the rank<=cap limit below each window exchange
    # (partial WindowGroupLimit) — the top-K never shuffles more than
    # cap rows per group; losing this doubles the exchange payload
    assert nodes(plan, "WindowGroupLimit") >= 2, plan


def test_quantized_topk_broadcasts_and_stays_jvm(spark):
    """Quantized ANN keeps the brute-force plan shape: query side
    broadcast (no shuffle of the corpus), no SortMergeJoin, no
    Python."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["embedding_topk_quantized"](
        spark, "/root/testdata/sf0.001"))
    assert "Broadcast" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_vocab_topv_is_take_ordered_not_global_window(spark):
    """The vocabulary top-V cut must compile to TakeOrderedAndProject
    (distributed per-partition top-V) — a global ROW_NUMBER window here
    serializes the whole distinct-word table through one task, which is
    billions of rows at web scale."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["doc_vocab_oov"](
        spark, "/root/testdata/sf0.001"))
    assert "TakeOrderedAndProject" in plan, plan
    assert nodes(plan, r"Window\b(?!GroupLimit)") == 0, plan


def test_simhash_hamming_is_banded_equijoin_no_python(spark):
    """SimHash near-dup candidates must come from the (band, band_val)
    equi-join — a nested-loop/cartesian here is the all-pairs scan the
    pigeonhole banding exists to avoid — and the whole chain (signature,
    banding, bit_count verify) stays in codegen."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["dedup_simhash_hamming"](
        spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan
    for s in schemas:
        assert set(c.split(":")[0] for c in s.split(",")) == {
            "doc_id", "text"}, plan


def test_temperature_sample_broadcasts_rates_no_shuffle_of_docs(spark):
    """The per-doc keep decision must be a broadcast join of the tiny
    per-language rate table against the corpus — a SortMergeJoin here
    shuffles the whole corpus on `lang` (5 skewed keys at web scale)."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["lang_temperature_sample"](
        spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_classifier_score_is_pure_projection_no_shuffle(spark):
    """Hashing-trick classifier: no Python workers, no join (weights
    derived in-expression), and NO shuffle at all — the weight fold
    runs over the in-row token array, so scoring is strictly
    scan-speed.  An Exchange here means someone reintroduced the
    explode+groupBy shape (which also silently drops zero-token
    docs)."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["doc_classifier_score"](
        spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan, plan
    assert nodes(plan, "Exchange") == 0, plan


def test_sequence_pack_is_single_grouped_python_stage(spark):
    """Packing is ONE grouped linear scan: exactly one
    FlatMapGroupsInPandas over one shuffle on the group key; the token
    counting upstream must stay JVM-side (no ArrowEvalPython)."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["doc_sequence_pack"](
        spark, "/root/testdata/sf0.001"))
    assert nodes(plan, "FlatMapGroupsInPandas") == 1, plan
    assert nodes(plan, "ArrowEvalPython") == 0, plan
    assert nodes(plan, "Exchange") == 1, plan


def test_bpe_merge_candidates_is_vocab_then_pairs_takeordered(spark):
    """BPE pair mining must count pairs over the distinct-pretoken vocab
    (two partial-agg exchanges), cut top-k via TakeOrderedAndProject
    (not a global window/sort), stay JVM-only, and prune the scan to
    the text column."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["bpe_merge_candidates"](
        spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert nodes(plan, r"Window\b(?!GroupLimit)") == 0, plan
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas and all(
        set(c.split(":")[0] for c in s.split(",")) == {"text"}
        for s in schemas), plan


def test_kmeans_assignment_is_projection_no_corpus_shuffle(spark):
    """Lloyd k-means: assignment must be a broadcast-codebook projection
    (BroadcastNestedLoopJoin against a ONE-ROW folded codebook — never a
    SortMergeJoin of the corpus) and the only exchanges are the tiny
    (centroid, pos) partial-agg updates: 8 for 3 iterations (2 per
    intermediate codebook rebuild, 1 final, 3 one-row codebook folds).
    A 9th exchange means someone re-introduced a corpus shuffle."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["embedding_kmeans"](
        spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert nodes(plan, "Exchange") == 8, plan


def test_semantic_dedup_pairs_via_cluster_equijoin(spark):
    """SemDeDup's pairwise stage must be fenced inside clusters: an
    equi-join on centroid_id (SortMergeJoin/ShuffledHashJoin are both
    fine — the corpus self-join is legitimately shuffled on the cluster
    key), never a cartesian/nested-loop over the corpus, and no
    Python."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["semantic_dedup"](
        spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # the assignment subtree is localCheckpoint-materialized, so the
    # self-join reads the checkpointed table on both sides — NO nested
    # loops survive into this plan (the codebook folds live behind the
    # checkpoint boundary); one reappearing means k-means runs twice
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert nodes(plan, "Scan ExistingRDD") >= 1, plan


def test_hll_sketch_is_jvm_partial_agg(spark):
    """The HLL register build must stay JVM-side (md5/string codegen, no
    Python) and aggregate with partial aggs: the register table shuffles
    at most (groups x 256) combined rows, never raw input rows.  Plan
    shape: HashAggregate pairs around each Exchange."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["hll_distinct_parts"](
        spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # partial+final agg: more HashAggregates than Exchanges feeding them
    assert nodes(plan, "HashAggregate") >= 2 * 2, plan


def test_cm_probe_join_is_broadcast(spark):
    """The count-min probe joins candidate words against the sketch —
    the sketch side is depth x width = 1024 cells max, so it MUST be a
    broadcast join (a sort-merge here would shuffle the full word
    stream against a 1 KB table)."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["heavy_hitter_terms"](
        spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan, plan
    assert nodes(plan, "BroadcastHashJoin") >= 1, plan
    assert "SortMergeJoin" not in plan, plan
    # top-k is a TakeOrderedAndProject cut, not a global sort
    assert "TakeOrderedAndProject" in plan, plan


def test_chunk_windows_is_shuffle_free_narrow(spark):
    """Context-window chunking is per-row HOF work: the plan must have
    NO Exchange and NO Python — it chunks at scan speed."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["doc_chunk_windows"](
        spark, "/root/testdata/sf0.001"))
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert nodes(plan, "Generate") == 1, plan  # exactly the starts explode


def test_inverted_index_is_two_partial_aggs_no_python(spark):
    """The index build is tokenize -> (term,doc) tf -> term rollup: two
    partial-agg shuffles, no Python, no join."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["inverted_text_index"](
        spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan, plan
    assert nodes(plan, "Exchange") == 2, plan
    assert "Join" not in plan, plan


def test_pmi_pairs_narrow_generation_broadcast_margins(spark):
    """PMI pair generation must be per-row HOF zips — NEVER a positions
    self-join (the SQL twin's shape); unigram margins and the two scalar
    totals rejoin by broadcast; top-k is a TakeOrderedAndProject."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["term_pmi_pairs"](
        spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert nodes(plan, "BroadcastHashJoin") >= 2, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_bloom_probe_is_broadcast_semi_no_frontier_shuffle(spark):
    """The bit table (<= m rows) must broadcast into a semi-join — the
    frontier side is never sort-merge shuffled against the seen-list;
    no Python anywhere."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["bloom_seen_urls"](
        spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan, plan
    assert nodes(plan, "BroadcastHashJoin") >= 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_event_pairs_bucketed_is_composite_key_equijoin(spark):
    """The bucketed interval join must join on (user, bucket) — a real
    equi-join with the range predicate as a post-join filter on a
    bounded candidate set — with exactly one explode (delta 0/1) and
    no nested-loop anywhere."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["event_pairs_60s_bucketed"](
        spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert nodes(plan, "Generate") == 1, plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) \
        or ("BroadcastHashJoin" in plan), plan


def test_mixture_weights_single_scan(spark):
    """The mixture table's normalizer must come from a window over the
    already-aggregated domain rows — ONE corpus scan, not a second pass
    for a broadcast scalar; no Python anywhere."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["corpus_mixture_weights"](
        spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan, plan
    assert nodes(plan, "Scan parquet") == 1, plan


def test_dsir_two_scans_broadcast_probe(spark):
    """DSIR: raw+target distributions from ONE aggregation over the
    (doc, bucket) table (no semi-join second pass), bucket table
    broadcast into the probe join; exactly the build+probe pair of
    corpus scans, no Python."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["dsir_importance_weights"](
        spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan, plan
    assert nodes(plan, "Scan parquet") == 2, plan
    assert nodes(plan, "BroadcastHashJoin") >= 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_bm25_filter_before_shuffle_broadcast_stats(spark):
    """The query-term isin filter must run before the first exchange
    (shuffled volume ~ posting lists, not corpus); df and corpus stats
    rejoin by broadcast; the k cut is TakeOrderedAndProject; no Python."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    df = registry.QUERIES["bm25_search"](spark, "/root/testdata/sf0.001")
    plan = plan_of(df)
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan  # no corpus-sized dl join
    assert "TakeOrderedAndProject" in plan, plan
    assert nodes(plan, "BroadcastHashJoin") >= 1, plan
    assert nodes(plan, "BroadcastNestedLoopJoin") <= 1, plan  # 1-row stats
    # POSITIONAL pin of the docstring's claim: the has-a-query-term
    # Filter must sit DIRECTLY on the parquet scan (its child line), i.e.
    # before any Exchange — a regression that filters after the explode
    # would shuffle one row per corpus token and still pass the above
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"Filter \(size\(filter\(.* IN \(.*\n.*FileScan parquet",
                     simple), simple


def test_dup_passages_one_generate_no_python(spark):
    """Gram generation is ONE in-row posexplode (no join to build
    grams); candidate detection and the hit join key on the gram hash;
    nothing Python, nothing cartesian."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["dup_passage_ranges"](
        spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert nodes(plan, "Generate") == 2, plan  # grams built twice (agg+hits)


def test_bigram_domain_lm_no_python_no_cartesian(spark):
    """Domain-LM scoring: reference counts partial-agg, scoring via
    left equi-joins (no SortMergeJoin required — but no cartesian, no
    Python, and the one-row stats side stays a broadcast)."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["doc_bigram_domain_logprob"](
        spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert nodes(plan, "BroadcastNestedLoopJoin") <= 1, plan  # 1-row stats


def test_shard_manifest_is_one_bounded_exchange_jvm_only(spark):
    """Shard manifest: hashing + token counts are pure codegen (no
    Python workers); the only corpus-wide exchange is the partial-agg
    groupBy on shard_id (bounded cardinality); the share window runs
    post-collapse."""
    from ukrainian_ocr_pipeline_spark.operators import packing
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(packing.shard_manifest(docs, n_shards=16))
    assert "EvalPython" not in plan, plan
    assert nodes(plan, "HashAggregate") >= 2, plan  # partial + final
    # exchanges: hashpartitioning(shard_id) partial agg, the all-shards
    # frame join, and one singlepartition for the n_shards-row window —
    # none keyed on the doc key
    assert plan.count("Exchange") <= 6, plan
    assert not any("doc_id" in l for l in plan.splitlines()
                   if "hashpartitioning" in l), plan


def test_compaction_plan_windows_by_partition_not_global(spark):
    """Compaction planning must window per table partition, never
    globally: the cumulative sum's Sort/Window keys start with `part`
    (a single-partition global window would serialize the manifest)."""
    from ukrainian_ocr_pipeline_spark.operators import packing
    files = spark.createDataFrame(
        [("a", 1, 10)], "part string, file_id long, bytes long")
    plan = plan_of(packing.compaction_plan(files, target_bytes=100))
    assert "EvalPython" not in plan, plan
    # the cumulative-sum window's partition spec must be the table
    # partition column (a global window would print an empty spec and
    # hash on nothing)
    assert re.search(r"windowspecdefinition\(part#", plan), plan
    assert re.search(r"hashpartitioning\(part#", plan), plan


def test_outlink_edges_single_exchange_no_python(spark):
    """Link-graph construction: regexp extraction + explode are narrow
    codegen; the ONLY exchange is the (src_host, dst_host) partial agg."""
    from ukrainian_ocr_pipeline_spark.operators import webnorm
    pages = spark.createDataFrame(
        [("http://a.example/", '<a href="http://b.example/">x</a>')],
        ["url", "html"])
    plan = plan_of(webnorm.outlink_host_edges(pages))
    assert "EvalPython" not in plan, plan
    assert nodes(plan, "Exchange") == 1, plan
    assert "hashpartitioning(src_host" in plan, plan
    assert nodes(plan, "HashAggregate") == 2, plan  # partial + final


def test_html_metadata_is_narrow_scan_speed(spark):
    """Metadata extraction is per-row regexp: the plan must be a
    narrow scan->project — zero exchanges, zero Python — because at
    10^12 pages this runs inline during every corpus scan."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["doc_html_metadata"](
        spark, "/root/testdata/sf0.001"))
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_anchor_terms_single_exchange_no_python(spark):
    """Anchor-text aggregation: bounded explode at scan speed, then
    exactly ONE corpus-wide exchange (the partial-agg groupBy on
    (dst_host, term)) — and the zipped extraction must stay JVM-side."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["anchor_text_terms"](
        spark, "/root/testdata/sf0.001"))
    assert nodes(plan, "Exchange") == 1, plan
    assert "EvalPython" not in plan, plan
    assert nodes(plan, "HashAggregate") == 2, plan  # partial + final


def test_cdx_index_is_narrow_scan_speed(spark):
    """CDX generation is per-row string algebra: zero exchanges, zero
    Python — at 10^12 captures this runs inline during the page scan;
    sorting/bucketing by (surt, ts14) is the writer's separate choice."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["cdx_index"](
        spark, "/root/testdata/sf0.001"))
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_revisit_marks_single_uniform_exchange(spark):
    """Revisit dedup shuffles ONCE, keyed on the md5 digest (uniform by
    construction — no skew at any corpus size), and the payload bytes
    never shuffle: the pre-window select prunes to (url, ts, digest)."""
    from ukrainian_ocr_pipeline_spark.sources import warc
    pages = spark.createDataFrame(
        [("https://a.example/", "2024-01-01T00:00:00Z", "x")],
        ["url", "ts", "html"])
    plan = plan_of(warc.revisit_marks(pages, ts_col="ts"))
    assert nodes(plan, "Exchange") == 1, plan
    assert "hashpartitioning(digest" in plan, plan
    assert "EvalPython" not in plan, plan
    # the payload column must be pruned BEFORE the shuffle: the
    # Exchange node's own Input list (detail section, not the tree —
    # the tree never names columns) must not carry html
    assert "html" not in node_details(plan, "Exchange"), plan


def test_wet_export_one_arrow_stage_no_shuffle(spark):
    """WET record assembly is the one deliberate Python stage (byte
    framing), Arrow-batched, over a three-column scan with no shuffle."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["wet_export"](
        spark, "/root/testdata/sf0.001"))
    assert nodes(plan, "ArrowEvalPython") == 1, plan
    assert "Exchange" not in plan, plan


def test_wat_export_pure_codegen_no_shuffle(spark):
    """The WAT sidecar (unlike WET's deliberate bytes UDF) is pure
    built-ins: zero Python, zero exchanges — a free pass during any
    page scan regardless of corpus size."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["wat_export"](
        spark, "/root/testdata/sf0.001"))
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_token_shards_two_level_prefix_sum_no_global_window(spark):
    """training_token_shards: the corpus-side cumulative sum must window
    per md5 bucket (parallel), with the bucket-offset side joined via
    broadcast — a single-partition window over doc rows would funnel
    the corpus through one task."""
    from ukrainian_ocr_pipeline_spark.operators import packing
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(packing.training_token_shards(docs, budget=4096))
    assert "EvalPython" not in plan, plan
    # corpus-side window partitions on the bucket prefix
    assert re.search(r"windowspecdefinition\(_bucket#", plan), plan
    assert re.search(r"hashpartitioning\(_bucket#", plan), plan
    assert nodes(plan, "BroadcastHashJoin") == 1, plan
    # exactly one SinglePartition exchange is allowed: the 256-row
    # bucket-offset rollup (post-aggregation), never the doc rows
    assert plan.count("Exchange SinglePartition") <= 1, plan


def test_zipf_slope_windows_vocabulary_not_corpus(spark):
    """term_zipf_slope: one partial-agg shuffle on (lang, term); the
    rank window and regression run over the collapsed count table."""
    from ukrainian_ocr_pipeline_spark.operators import textstats
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(textstats.term_zipf_slope(docs))
    assert "EvalPython" not in plan, plan
    assert nodes(plan, "HashAggregate") >= 2, plan  # partial + final
    assert re.search(r"windowspecdefinition\(lang#", plan), plan
    assert "Exchange SinglePartition" not in plan, plan


def test_source_gate_single_bounded_rollup(spark):
    """source_quality_gate: the verdict is evaluated INLINE over ONE
    corpus scan (no self-join on doc_id shipping per-doc verdicts);
    the only wide op is the partial-agg rollup keyed on source."""
    from ukrainian_ocr_pipeline_spark.operators import textstats
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(textstats.source_quality_gate(docs))
    assert "EvalPython" not in plan, plan
    assert re.search(r"hashpartitioning\(source#", plan), plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "Join" not in plan, plan
    assert nodes(plan, "Scan parquet") == 1, plan


def test_logreg_apply_broadcast_weights_no_python(spark):
    """logreg_apply: scoring is JVM-only; the weight table reaches the
    term join as a broadcast (never a shuffle keyed on feature); the
    only nested-loop is the one-row bias crossJoin, itself broadcast."""
    from ukrainian_ocr_pipeline_spark.operators import textstats
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wts = spark.createDataFrame(
        [(-1, -0.25), (0, 0.01), (1, -0.02)], "feature int, weight_r double")
    plan = plan_of(textstats.logreg_apply(docs, wts))
    assert "EvalPython" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # no shuffle keyed on the feature column: the weight side broadcasts
    assert not re.search(r"hashpartitioning\(feature#", plan), plan
    # scoring runs over the checkpointed feature table: the corpus was
    # read and tokenized exactly once, at feature-build time
    assert nodes(plan, "Scan parquet") == 0, plan


def test_logreg_train_loop_never_rescans_corpus(spark):
    """logreg_train: the GD iterations run over the checkpointed
    feature table — the final plan contains NO parquet scan (corpus
    reads happened exactly once, at feature-build checkpoint time) and
    no Python."""
    from ukrainian_ocr_pipeline_spark.operators import textstats
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(textstats.logreg_train(docs, n_iter=2))
    assert "EvalPython" not in plan, plan
    assert nodes(plan, "Scan parquet") == 0, plan


def test_unigram_seed_candidates_is_jvm_topk(spark):
    """Unigram seeding must stay JVM-only (java pretokenizer, substr
    explodes) with a bounded top-k — TakeOrdered, never a global sort
    of the full substring table."""
    from ukrainian_ocr_pipeline_spark.plans.registry import (
        q_unigram_seed_candidates,
    )
    plan = plan_of(q_unigram_seed_candidates(spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    # map-side combine on the substring counts before the exchange
    assert "partial_sum" in plan or "partial_count" in plan, plan


def test_hash_embeddings_jvm_doc_keyed(spark):
    """Feature-hashing embeddings must be pure JVM (md5 kernel, HOF
    assembly), join-free, with map-side combine on the doc-keyed
    aggregations — the whole vocabulary never becomes a shuffle key."""
    from ukrainian_ocr_pipeline_spark.plans.registry import (
        q_doc_hash_embeddings,
    )
    plan = plan_of(q_doc_hash_embeddings(spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan, plan
    assert "Join" not in plan, plan
    assert "partial_sum" in plan or "partial_count" in plan, plan


def test_hist_quantiles_two_scans_broadcast_minmax(spark):
    """The quantile sketch must read the table exactly twice (min/max
    probe + bin pass), broadcast the 1-row min/max (never shuffle the
    values against it), and stay JVM-only; the only window runs over
    the bins-x-groups table, never the raw values."""
    from ukrainian_ocr_pipeline_spark.plans.registry import (
        q_orders_price_quantile_sketch,
    )
    plan = plan_of(q_orders_price_quantile_sketch(
        spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan, plan
    assert nodes(plan, "Scan parquet") == 2, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "partial_count" in plan, plan


def test_hash_embeddings_tokenless_docs_get_zero_vectors(spark):
    """NULL and whitespace-only text must yield the ZERO vector, not a
    silently missing row — downstream ANN joins may never lose docs."""
    from ukrainian_ocr_pipeline_spark.operators.similarity import (
        hashed_text_embeddings,
    )
    docs = spark.createDataFrame(
        [(1, "real words here"), (2, None), (3, "   ")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            hashed_text_embeddings(docs, dim=8).collect()}
    assert set(rows) == {1, 2, 3}
    for d in (2, 3):
        assert rows[d]["vec"] == [0] * 8
        assert rows[d]["vec_norm"] == [0.0] * 8
    assert any(v != 0 for v in rows[1]["vec"])


def test_winnow_fingerprints_is_shuffle_free_scan_speed(spark):
    """Winnowing selection is entirely in-row (staged HOF projections);
    the fingerprint table must emerge with NO exchange and no Python."""
    from ukrainian_ocr_pipeline_spark.plans.registry import (
        q_doc_winnow_fingerprints,
    )
    plan = plan_of(q_doc_winnow_fingerprints(spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan, plan
    assert nodes(plan, "Exchange") == 0, plan


def test_winnow_dup_candidates_equi_join_no_bnlj(spark):
    """Candidate generation must be an equi-join on the fingerprint
    value with the df cap applied before the self-join — never a
    nested-loop or cartesian shape."""
    from ukrainian_ocr_pipeline_spark.plans.registry import (
        q_winnow_dup_candidates,
    )
    plan = plan_of(q_winnow_dup_candidates(spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_hybrid_rrf_semantic_channel_is_take_ordered(spark):
    """Both RRF channels must end in bounded TakeOrderedAndProject cuts
    BEFORE any rank window runs: a global row_number() over the whole
    scored-cosine table is a single-partition sort of the corpus.  The
    only Window nodes allowed are over the already-cut <=k_each lists
    (tiny), and the plan must contain the two top-k cuts."""
    from ukrainian_ocr_pipeline_spark.plans import registry
    plan = plan_of(registry.QUERIES["hybrid_search_rrf"](
        spark, "/root/testdata/sf0.001"))
    # one TakeOrdered per channel plus the final fused top-k
    assert nodes(plan, "TakeOrderedAndProject") >= 2, plan
    # every Window must sit ABOVE a TakeOrdered (bounded input): assert
    # no Window consumes an un-cut Exchange of the scored table by
    # checking the plan has no rangepartitioning exchange feeding a sort
    # for the window (TakeOrdered needs no Sort+Exchange pair)
    assert "rangepartitioning" not in plan.lower(), plan
