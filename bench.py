"""Benchmark harness.

Measures (1) headline query wall times at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], (2) extraction
pipeline throughput (docs/sec) on the deterministic fixture corpus, and
(3) the N->4N scaling curve by re-running the identical extraction job
at taskset-pinned local[1]/[2]/[4]/[8] in interleaved subprocess rounds
(headline pair 1->4; the sandbox stand-in for the north rule's
two-cluster-size criterion — methodology in BENCH.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "extraction": {...}, "scaling": {...}}

Usage:
  python bench.py                 # full run (queries + extraction + scaling)
  python bench.py --probe N_CPUS N_DOCS [REPEATS]  # internal: one probe
  python bench.py --no-scaling    # skip the subprocess scaling probes
  python bench.py --scaling-only  # skip queries/extraction, probe only
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
EXTRACT_DOCS = int(os.environ.get("BENCH_EXTRACT_DOCS", "20000"))
# 10x corpus leg: does the headline extraction plan hold shape at a scale
# step? (/root/testdata tops out at sf0.1, so the step is generated.)
EXTRACT_DOCS_LARGE = int(os.environ.get("BENCH_EXTRACT_DOCS_LARGE",
                                        str(10 * EXTRACT_DOCS)))
PROBE_DOCS = int(os.environ.get("BENCH_PROBE_DOCS", "24000"))
# the 8->32 pair gets a 4x corpus: at 24k docs a 32-thread run is
# scheduler/startup-bound and the pair would understate true scaling.
# Same input at BOTH widths of a pair is what the north rule requires;
# different pairs may size their input to their throughput.
WIDE_DOCS = int(os.environ.get("BENCH_PROBE_DOCS_WIDE", str(4 * PROBE_DOCS)))
ROUNDS = int(os.environ.get("BENCH_PROBE_ROUNDS", "3"))

# headline queries: the scale-relevant subset (quadratic self-joins like
# doc_containment_join are correctness-gate-only, excluded here by design;
# dedup_simhash_hamming is plan-correct — banded equi-join, no all-pairs —
# but the synthetic fixture corpus draws from ~31 words, so nearly every
# same-template pair is a TRUE hamming<=3 dup and the OUTPUT is ~1.5M rows
# at sf0.1: its wall time measures the fixture's pathological dup rate,
# not the operator, so it stays in the correctness gate only)
HEADLINE = [
    "pricing_summary", "revenue_by_nation", "top_parts",
    "latest_order_per_customer", "user_sessionization",
    "session_window_rollup", "hourly_event_rollup",
    "event_context_window", "event_asof_join", "event_pairs_60s_bucketed",
    "corpus_split_assign",
    "doc_zscore_by_lang",
    "doc_quality_scores", "doc_language_id", "doc_fingerprints",
    "doc_subword_tokens", "doc_quality_filter", "corpus_curation",
    "dedup_exact", "dedup_minhash_signatures", "dedup_simhash",
    "dedup_lsh_candidates", "contamination_check", "dedup_embedding_cosine",
    # materialized-signature banded cosine is the headline (the 100-TB
    # shape: signature table computed once, reused across bands); the
    # stateless twin evaluates the signature subtree on BOTH self-join
    # sides, so it stays in the correctness gate only (VERDICT r3 #3)
    "dedup_embedding_cosine_banded_mat",
    "dedup_near_dup_verified", "dedup_cluster_assign",
    "dedup_incremental", "cross_doc_shingle_dup",
    "doc_winnow_fingerprints", "winnow_dup_candidates", "graph_pagerank",
    "doc_unigram_logprob", "doc_bigram_domain_logprob", "doc_vocab_oov",
    "doc_badword_filter",
    "url_canonical_dedup", "pii_redaction", "doc_repetition_signals",
    "doc_line_dedup", "host_cap_sample",
    "lang_temperature_sample", "doc_classifier_score", "doc_sequence_pack",
    "corpus_mixture_weights", "dsir_importance_weights",
    "bpe_merge_candidates", "unigram_seed_candidates",
    "doc_hash_embeddings", "hash_embedding_topk",
    "embedding_kmeans", "semantic_dedup",
    "hll_distinct_parts", "heavy_hitter_terms",
    "orders_price_quantile_sketch", "doc_chunk_windows",
    "inverted_text_index", "term_pmi_pairs", "bm25_search",
    "hybrid_search_rrf",
    "bloom_seen_urls", "dedup_cluster_assign_star", "dup_passage_ranges",
    "dup_passage_excise", "dedup_cluster_best_keeper",
    "url_host_blocklist", "host_diversity_stats",
    "corpus_shard_manifest", "compaction_plan", "orders_zorder_layout",
    "host_link_graph",
    "host_pagerank", "corpus_snapshot_drift", "canonical_link_dedup",
    "doc_html_metadata", "title_dup_groups", "anchor_text_terms",
    "host_boilerplate_lines", "url_redirect_resolve",
    "frontier_url_resolve", "ccnet_perplexity_tiers",
    "crawl_budget_allocation", "sitemap_recrawl_candidates",
    "url_quality_gate", "url_template_census",
    "embedding_topk_bruteforce", "embedding_topk_quantized",
    "embedding_topk_lsh", "embedding_topk_ivf",
    "multimodal_media_meta",
    "wet_export", "cdx_index", "warc_revisit_dedup",
    "cdx_shard_boundaries", "wat_export",
    "training_token_shards", "term_zipf_slope",
    "source_quality_gate", "event_burst_detection",
    "quality_classifier_train", "quality_classifier_auc",
    "embedding_pca", "tokenizer_fertility", "curriculum_stages",
    "lang_unigram_entropy", "bitext_margin_pairs", "doc_bigram_logprob",
    "source_concentration", "length_drift_psi",
    "split_leakage_check", "packing_efficiency",
    "multimodal_header_decode", "doc_rowwise_simhash",
    "multimodal_av_metadata",
]


def _materialize(df):
    df.write.format("noop").mode("overwrite").save()


def _pages_parquet(spark, n_docs: int) -> str:
    """Materialize the fixture corpus to parquet once (untimed) — the
    measured job then reads a real table, exactly the north-rule shape,
    with enough files that any parallelism level has uniform tasks.

    The cache path is keyed on a digest of fixtures.py, so editing the
    generator invalidates the cached corpus instead of silently
    benchmarking stale data."""
    import hashlib
    import tempfile
    import ukrainian_ocr_pipeline_spark.fixtures as fx
    from ukrainian_ocr_pipeline_spark.sources.pages import pages_from_fixtures
    with open(fx.__file__, "rb") as fh:
        fp = hashlib.sha256(fh.read()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"bench_pages_{n_docs}_{fp}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (pages_from_fixtures(spark, n_docs, partitions=64)
         .repartition(128).write.mode("overwrite").parquet(path))
    return path


def run_extraction(spark, n_docs: int) -> float:
    """Full extraction pipeline over a pre-written pages table; returns
    wall seconds for the materialized job (noop sink: compute, no IO)."""
    from ukrainian_ocr_pipeline_spark.operators.extract import extract_pages, extracted_table
    from ukrainian_ocr_pipeline_spark.sources.pages import read_pages
    pages = read_pages(spark, _pages_parquet(spark, n_docs))
    enriched = extract_pages(pages, mode="arrow")  # the job default (config.extraction.mode)
    t0 = time.perf_counter()
    _materialize(extracted_table(enriched))
    return time.perf_counter() - t0


def probe(n_cpus: int, n_docs: int, repeats: int = 5) -> None:
    """Subprocess entry: run the extraction job at local[n_cpus], print
    one JSON line with best-of-N throughput (min wall over repeats —
    robust against transient host noise and JIT warm-up)."""
    from ukrainian_ocr_pipeline_spark.sources.session import get_spark
    spark = get_spark(app=f"scale-probe-{n_cpus}", master=f"local[{n_cpus}]")
    run_extraction(spark, n_docs)  # warm up JIT/Python workers + write input
    walls = [run_extraction(spark, n_docs) for _ in range(repeats)]
    wall = min(walls)
    print(json.dumps({"cpus": n_cpus, "docs": n_docs, "wall_s": wall,
                      "walls": [round(w, 2) for w in walls],
                      "docs_per_sec": n_docs / wall}))
    spark.stop()


def _run_probe(n: int, n_docs: int, repeats: int) -> dict:
    cmd = [sys.executable, os.path.abspath(__file__), "--probe", str(n),
           str(n_docs), str(repeats)]
    if os.path.exists("/usr/bin/taskset"):
        # pin to exactly n cores so "local[n]" means an n-core node, not n
        # tasks free-riding on 32 cores via pipelined Python workers
        cmd = ["taskset", "-c", f"0-{n - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"scaling probe local[{n}] failed (rc={out.returncode}); "
            f"stderr tail:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    from ukrainian_ocr_pipeline_spark.plans.registry import QUERIES
    from ukrainian_ocr_pipeline_spark.sources.session import get_spark

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result: dict = {"sf": float(sf) if sf.replace(".", "").isdigit() else sf}

    scaling_only = "--scaling-only" in sys.argv
    # scaling-only needs no driver session — probes are subprocesses
    spark = None if scaling_only else get_spark(app="bench", master=f"local[{CPUS}]")

    # -- headline queries ---------------------------------------------------
    if spark is not None:
        # one-time Python-worker pool warm-up (untimed): long-lived
        # executors reuse spawned pyspark daemon workers, so per-query
        # timings must not attribute the one-off fork cost to whichever
        # query happens to cross the Arrow boundary first (the per-query
        # warm pass below runs count(), which PRUNES projected UDF
        # columns and therefore never forks the workers itself)
        (spark.range(CPUS * 4).repartition(CPUS)
         .mapInPandas(lambda it: it, "id long")
         .write.format("noop").mode("overwrite").save())
    qtimes: dict[str, float] = {}
    for name in HEADLINE if not scaling_only else []:
        fn = QUERIES[name]
        fn(spark, SF_DIR).count()  # warm (plan + file listing)
        # drop table caches the warm run materialized (the _mat variant
        # persists its signature table) — otherwise the timed run reads
        # the warm run's cache and excludes that compute entirely, which
        # would structurally rig any cached-vs-uncached comparison.
        # FileIndex/listing caches live elsewhere and stay warm.
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        _materialize(fn(spark, SF_DIR))
        qtimes[name] = round(time.perf_counter() - t0, 3)

    # -- extraction throughput (warm-up run, then best of 4 — the shared
    # VM's noisy neighbors can triple any single wall; see BENCH.md) -------
    extraction = {}
    extraction_large = {}
    curation = {}
    index_build = {}
    if not scaling_only:
        run_extraction(spark, EXTRACT_DOCS)
        wall = min(run_extraction(spark, EXTRACT_DOCS) for _ in range(4))
        extraction = {"docs": EXTRACT_DOCS, "wall_s": round(wall, 2),
                      "docs_per_sec": round(EXTRACT_DOCS / wall, 1)}
        if EXTRACT_DOCS_LARGE > EXTRACT_DOCS:
            # scale-step evidence: same plan, 10x rows (best-of-2 after a
            # warm run; corpus write itself is untimed and cached)
            run_extraction(spark, EXTRACT_DOCS_LARGE)
            wall_l = min(run_extraction(spark, EXTRACT_DOCS_LARGE)
                         for _ in range(2))
            extraction_large = {
                "docs": EXTRACT_DOCS_LARGE, "wall_s": round(wall_l, 2),
                "docs_per_sec": round(EXTRACT_DOCS_LARGE / wall_l, 1),
                "vs_small_throughput": round(
                    (EXTRACT_DOCS_LARGE / wall_l) / (EXTRACT_DOCS / wall), 3),
            }
        # -- composed curation pipeline end-to-end (jobs/curate.py: quality
        # gate -> exact dedup -> near-dup clusters -> split, including the
        # catalog commits) over the sf documents table ---------------------
        import contextlib
        import io
        import shutil
        import tempfile
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "jobs"))
        import curate as curate_job
        docs_path = f"{SF_DIR}/documents.parquet"
        n_docs = spark.read.parquet(docs_path).count()
        walls = []
        for i in range(2):  # warm + timed (fresh warehouse each run)
            wh = tempfile.mkdtemp(prefix="bench_curate_")
            t0 = time.perf_counter()
            # swallow the job's own stats line — bench.py's contract is
            # ONE JSON line on stdout
            with contextlib.redirect_stdout(io.StringIO()):
                curate_job.main(["--docs", docs_path, "--warehouse", wh,
                                 "--snapshot-id", f"bench-{i}"])
            walls.append(time.perf_counter() - t0)
            shutil.rmtree(wh, ignore_errors=True)
        # both runs do identical full work against fresh warehouses, so
        # best-of attenuates this VM's noise spikes like every other probe
        wall_c = min(walls)
        curation = {"docs": n_docs, "wall_s": round(wall_c, 2),
                    "docs_per_sec": round(n_docs / wall_c, 1)}
        # -- ANN index build end-to-end (jobs/index.py: signatures + IVF
        # assignments + int8 table, incl. catalog commits) -----------------
        import index as index_job
        emb_path = f"{SF_DIR}/embeddings.parquet"
        n_vecs = spark.read.parquet(emb_path).count()
        walls_i = []
        for i in range(2):
            wh = tempfile.mkdtemp(prefix="bench_index_")
            t0 = time.perf_counter()
            with contextlib.redirect_stdout(io.StringIO()):
                index_job.main(["--embeddings", emb_path, "--warehouse", wh,
                                "--snapshot-id", f"bench-{i}"])
            walls_i.append(time.perf_counter() - t0)
            shutil.rmtree(wh, ignore_errors=True)
        wall_i = min(walls_i)
        index_build = {"vectors": n_vecs, "wall_s": round(wall_i, 2),
                       "vectors_per_sec": round(n_vecs / wall_i, 1)}
        spark.stop()
        time.sleep(3)  # let executors/python workers exit before probing

    # -- scaling probes (N vs 4N) -------------------------------------------
    scaling = {}
    if "--no-scaling" not in sys.argv:
        # Pinned curve over 1/2/4/8 cores; headline N->4N pair is 1->4.
        # This sandbox VM has noisy-neighbor interference (identical pinned
        # probes swing +-20% across minutes), so widths are probed in
        # INTERLEAVED rounds and aggregated best-of: every width samples the
        # same noise window, and the minimum wall per width is the
        # least-disturbed estimate.  Beyond ~8 pinned cores the single box
        # additionally saturates on the COMBINED JVM+Python memory traffic
        # (parquet decompress + Arrow IPC + spec) — multi-node clusters
        # don't share that: each executor node brings its own bandwidth.
        # The raw-Python control (bench_out/control_probe.py, identical spec
        # work, no Spark) is reported alongside in BENCH.md.
        # three N->4N pairs: 1->4 and 2->8 on PROBE_DOCS, 8->32 on the
        # 4x WIDE_DOCS corpus (whole-box pair — expect the documented
        # JVM+Python bandwidth ceiling there)
        widths = (1, 4, 2, 8)
        wide = (8, 32)
        best: dict[int, float] = {}
        best_wide: dict[int, float] = {}
        all_walls: dict[int, list] = {n: [] for n in widths}
        wide_walls: dict[int, list] = {n: [] for n in wide}
        for _round in range(ROUNDS):
            for n in widths:
                p = _run_probe(n, PROBE_DOCS, repeats=2)
                all_walls[n] += p["walls"]
                t = p["docs_per_sec"]
                if t > best.get(n, 0.0):
                    best[n] = t
                time.sleep(2)
            for n in wide:
                p = _run_probe(n, WIDE_DOCS, repeats=2)
                wide_walls[n] += p["walls"]
                t = p["docs_per_sec"]
                if t > best_wide.get(n, 0.0):
                    best_wide[n] = t
                time.sleep(2)
        scaling = {
            "probe_docs": PROBE_DOCS,
            "wide_probe_docs": WIDE_DOCS,
            "method": f"interleaved x{ROUNDS} rounds, best-of per width",
            "docs_per_sec_by_cores": {str(n): round(best[n], 1) for n in sorted(best)},
            "walls_by_cores": {str(n): all_walls[n] for n in sorted(all_walls)},
            "wide_docs_per_sec_by_cores": {str(n): round(best_wide[n], 1)
                                           for n in sorted(best_wide)},
            "wide_walls_by_cores": {str(n): wide_walls[n] for n in sorted(wide_walls)},
            "n_cores": 1, "n4_cores": 4,
            "localN_docs_per_sec": round(best[1], 1),
            "local4N_docs_per_sec": round(best[4], 1),
            "speedup_n_to_4n": round(best[4] / best[1], 3),
            "efficiency": round((best[4] / best[1]) / 4.0, 3),
            "efficiency_2_to_8": round((best[8] / best[2]) / 4.0, 3),
            "efficiency_8_to_32": round((best_wide[32] / best_wide[8]) / 4.0, 3),
        }

    result.update({
        "metric": ("scaling_efficiency_n_to_4n" if scaling_only
                   else "headline_queries_total_wall"),
        "value": (scaling.get("efficiency") if scaling_only
                  else round(sum(qtimes.values()), 3)),
        "unit": "ratio" if scaling_only else "sec",
        "queries": qtimes,
        "extraction": extraction,
        "extraction_large": extraction_large,
        "curation": curation,
        "index_build": index_build,
        "scaling": scaling,
    })
    print(json.dumps(result))


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--probe":
        probe(int(sys.argv[2]), int(sys.argv[3]),
              repeats=int(sys.argv[4]) if len(sys.argv) > 4 else 5)
    else:
        main()
