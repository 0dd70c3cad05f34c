"""spark-submit entry point for the corpus-curation job.

    spark-submit --py-files engine.zip jobs/curate.py \
        --docs /path/to/documents.parquet --warehouse /path/to/warehouse \
        --snapshot-id cur-001 [--no-neardup] [--min-words 5]

The training-data production pipeline as ONE deployable job: optional
UT1-style domain blocklist gate (--host-blocklist FILE: one domain per
line; a doc drops as 'host_blocklist' when its source host equals or
sits under a listed domain — bounded suffix explode + broadcast
equi-join, the metadata-only gate that runs before any text is read;
NULL-source docs pass) -> quality
gate (Gopher/C4-style, deterministic first-fail reason) -> optional
model-based gate (--classifier-gate: fastText-style hashing-trick
classifier, exact integer margins) -> optional C4 blocklist gate
(--badwords FILE: whole-token match against an in-plan literal list;
malformed entries rejected at startup) -> exact dedup (content-digest
keeper) -> near-dup dedup (MinHash -> LSH -> exact Jaccard verify ->
connected-component clusters; or --neardup-algo winnow to pair on
shared winnowing fingerprints, catching partial-overlap/containment
that whole-set Jaccard under-scores) -> optional DSIR domain selection
(--dsir-select N: keep the N survivors most like the
--dsir-target-lang domain by hashed-ngram importance weight, the
Xie et al. 2023 recipe as a deterministic top-N) -> optional CCNet LM
gate (--lm-gate-lang L --lm-gate-min-logprob X: interpolated bigram LM
trained on the surviving L-lang slice; survivors scoring below X drop
as 'lm_gate'; no-signal docs with < 2 tokens are kept) -> optional
per-host cap (--host-cap N:
at most N surviving docs per source host, salted two-stage
deterministic sample) -> optional temperature-based language
rebalancing (--temperature-alpha A: deterministic md5-bucket
downsampling of head languages over the FINAL survivor distribution)
-> optional C4-style cross-document line dedup (--line-dedup:
boilerplate lines occurring in >= --line-dedup-min-docs surviving docs
are stripped and the cleaned text written) -> optional ExactSubstr-style
passage excision (--passage-dedup: duplicated >=5-word passages removed
from every doc except the min-doc_id owner; runs AFTER line dedup
because docs that lose words are rejoined word-level — whitespace
canonicalized, case preserved; untouched docs stay verbatim) ->
optional PII redaction
(--pii-redact: emails/IPs -> placeholders in the final text) ->
deterministic train/val/test split —
committed atomically through the snapshot catalog, so re-running the
same --snapshot-id is an idempotent no-op and a crashed run resumes
from nothing-committed.  Stage order is deliberate: the host cap and
line-dedup census run AFTER document dedup (duplicates must not consume
cap slots or inflate the boilerplate count — the C4 ordering), and PII
redaction rewrites the FINAL text last.

Output tables (all under the catalog, all per-snapshot):
  curation_decisions  one row PER INPUT DOC: status
                      ('kept' | 'host_blocklist' |
                      'quality:<reason>' | 'classifier' |
                      'badwords' |
                      'dup_exact' | 'dup_near' | 'dsir' | 'lm_gate' |
                      'host_cap' |
                      'lang_sample'), the keeper doc for
                      dups, and the split for kept docs — the audit
                      trail / drop list.
  curated             the surviving documents with their split column —
                      what a training run actually reads.

Scale shape: every stage is the already-verified operator (see
operators/textstats.quality_filter, operators/dedup.*) — codegen
predicates at scan speed, digest-narrowed shuffles, bucketed candidate
joins; the decisions table is assembled from doc_id-keyed status slices
(never a wide row), and the heavy text column is only carried into the
near-dup stage's candidate verification.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="corpus curation job")
    p.add_argument("--docs", required=True, help="documents parquet path")
    p.add_argument("--warehouse", required=True, help="output catalog root")
    p.add_argument("--snapshot-id", required=True)
    p.add_argument("--min-words", type=int, default=5,
                   help="quality gate: minimum word count")
    p.add_argument("--no-neardup", action="store_true",
                   help="skip the near-dup stage (exact dedup only)")
    p.add_argument("--cluster-algo", choices=["star", "label"],
                   default="star",
                   help="near-dup connected-components algorithm: 'star' "
                        "(large-star/small-star contraction, O(log n) "
                        "rounds on any graph — the scale default) or "
                        "'label' (min-label propagation, diameter-bound "
                        "rounds; identical output)")
    p.add_argument("--neardup-threshold", type=float, default=None,
                   help="exact-Jaccard verify threshold for near-dups "
                        "(minhash family only; default 0.5)")
    p.add_argument("--neardup-algo", choices=["minhash", "winnow"],
                   default="minhash",
                   help="near-dup pair family: 'minhash' (MinHash -> LSH "
                        "-> exact Jaccard at --neardup-threshold — "
                        "whole-document set similarity, the default) or "
                        "'winnow' (winnowing-fingerprint pairs sharing "
                        ">= --winnow-min-shared window minima — catches "
                        "PARTIAL overlap and containment that whole-set "
                        "Jaccard scores below threshold). CAVEAT: a "
                        "fingerprint shared by more than --winnow-max-df "
                        "docs is dropped as corpus furniture, so a "
                        "duplicate FAMILY larger than that cap pairs "
                        "sparsely under winnow — raise the cap for "
                        "template-spam corpora, or rely on exact dedup "
                        "(which runs first) / the minhash family for "
                        "whole-doc mass duplication")
    p.add_argument("--winnow-min-shared", type=int, default=None,
                   help="winnow family: minimum shared fingerprints for "
                        "a candidate pair (default 2)")
    p.add_argument("--winnow-max-df", type=int, default=None,
                   help="winnow family: fingerprints shared by more docs "
                        "than this are dropped as furniture before the "
                        "pair join (default 50 — bounds per-key fanout, "
                        "see --neardup-algo caveat)")
    p.add_argument("--cluster-max-iter", type=int, default=None,
                   help="override the clustering round cap (label "
                        "propagation needs graph-DIAMETER rounds — a "
                        "long boilerplate-template chain can exceed the "
                        "default 12 and abort; star's O(log n) default "
                        "40 rarely needs this)")
    p.add_argument("--line-dedup", action="store_true",
                   help="strip cross-document boilerplate lines from the"
                        " curated text (C4-style line dedup)")
    p.add_argument("--line-dedup-min-docs", type=int, default=3,
                   help="a line is boilerplate when it occurs in at least"
                        " this many surviving documents")
    p.add_argument("--passage-dedup", action="store_true",
                   help="excise duplicated >=5-word passages from every"
                        " surviving doc except each passage's min-doc_id"
                        " owner (ExactSubstr-style keep-one-copy);"
                        " untouched docs pass through verbatim, docs"
                        " that lose words get whitespace-canonicalized"
                        " (case preserved)")
    p.add_argument("--passage-min-docs", type=int, default=2,
                   help="a 5-gram is duplicated when it occurs in at"
                        " least this many distinct surviving docs"
                        " (default 2)")
    p.add_argument("--host-cap", type=int, default=0,
                   help="keep at most N surviving documents per source"
                        " host (0 = no cap); deterministic hash-order"
                        " sample via the salted two-stage top-K")
    p.add_argument("--pii-redact", action="store_true",
                   help="replace emails/IPs in the curated text with"
                        " <EMAIL>/<IP> placeholders")
    p.add_argument("--classifier-gate", action="store_true",
                   help="model-based quality gate (fastText-style"
                        " hashing-trick classifier) after the heuristic"
                        " gate")
    p.add_argument("--temperature-alpha", type=float, default=0.0,
                   help="rebalance languages among the final survivors"
                        " by p^alpha temperature sampling (0 = off;"
                        " 1.0 keeps everything)")
    p.add_argument("--dsir-select", type=int, default=0,
                   help="keep only the N dedup survivors most like the"
                        " target domain by DSIR importance weight"
                        " (0 = off); deterministic top-N by"
                        " (log_weight desc, doc_id)")
    p.add_argument("--dsir-target-lang", default=None,
                   help="target domain for --dsir-select (required with"
                        " it): documents of this language define the"
                        " target hashed-ngram distribution")
    p.add_argument("--badwords", default=None,
                   help="C4-style blocklist file (one whitespace-free"
                        " term per line, '#' comments allowed): any doc"
                        " containing a listed whole token drops as"
                        " 'badwords'; empty/phrase entries rejected at"
                        " startup")
    p.add_argument("--host-blocklist", default=None,
                   help="UT1-style domain blocklist file (one domain"
                        " per line, '#' comments allowed): any doc"
                        " whose source host equals or sits under a"
                        " listed domain drops as 'host_blocklist';"
                        " malformed entries rejected at startup")
    p.add_argument("--source-gate", action="store_true",
                   help="drop WHOLE sources whose doc-level quality"
                        " keep-rate is below --source-gate-min-keep"
                        " (RefinedWeb-style domain-level gate; runs"
                        " before the per-doc quality gate; NULL-source"
                        " docs pass, same rule as the host cap)")
    p.add_argument("--source-gate-min-keep", type=float, default=0.5,
                   help="minimum fraction of a source's docs that must"
                        " pass the doc quality gate for the source to"
                        " survive --source-gate (default 0.5)")
    p.add_argument("--lm-gate-lang", default=None,
                   help="CCNet-style LM gate: train an interpolated"
                        " bigram LM on the surviving docs of this lang"
                        " and drop survivors scoring below"
                        " --lm-gate-min-logprob (off when unset)")
    p.add_argument("--lm-gate-min-logprob", type=float, default=None,
                   help="mean token log-prob floor for --lm-gate-lang"
                        " (required with it; scores are negative, e.g."
                        " -8.0)")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    import os

    if args.cluster_max_iter is not None and args.cluster_max_iter < 1:
        p.error("--cluster-max-iter must be >= 1")
    # family/knob coherence at parse time (the --lm-gate-* convention:
    # a silently ignored knob is a wrong-output footgun)
    if args.neardup_algo == "winnow":
        if args.neardup_threshold is not None:
            p.error("--neardup-threshold applies to the minhash family "
                    "only; with --neardup-algo winnow use "
                    "--winnow-min-shared / --winnow-max-df")
    else:
        if args.winnow_min_shared is not None or args.winnow_max_df is not None:
            p.error("--winnow-min-shared/--winnow-max-df apply to "
                    "--neardup-algo winnow only")
    if args.winnow_min_shared is not None and args.winnow_min_shared < 1:
        p.error("--winnow-min-shared must be >= 1")
    if args.winnow_max_df is not None and args.winnow_max_df < 2:
        p.error("--winnow-max-df must be >= 2 (a fingerprint needs two "
                "docs to form a pair)")
    if args.neardup_threshold is None:
        args.neardup_threshold = 0.5
    if args.winnow_min_shared is None:
        args.winnow_min_shared = 2
    if args.winnow_max_df is None:
        args.winnow_max_df = 50
    if args.line_dedup_min_docs < 2:
        # at 1 every non-blank line "occurs in >= 1 document" and the
        # census would strip ALL text — reject the footgun at parse time
        p.error("--line-dedup-min-docs must be >= 2")
    if args.passage_min_docs < 2:
        # at 1 every 5-gram "occurs in >= 1 document" and the excision
        # would strip every word from every doc but the global gram
        # owners — same footgun class as line-dedup-min-docs; reject
        p.error("--passage-min-docs must be >= 2")
    if args.temperature_alpha < 0 or args.temperature_alpha > 1:
        # alpha > 1 inverts the rebalancing (upsamples head languages
        # by DROPPING tail docs) — outside this job's remit; reject
        p.error("--temperature-alpha must be in [0, 1] (0 disables)")
    if args.dsir_select < 0:
        # negative N would read as "drop everything" through the top-N
        # cut — same footgun class as a negative host cap; reject
        p.error("--dsir-select must be >= 0 (0 disables the stage)")
    if args.dsir_select and not args.dsir_target_lang:
        # no sane universal default exists (a wrong one is caught only
        # after the full dedup pipeline has run) — make the target an
        # explicit decision
        p.error("--dsir-select requires --dsir-target-lang")
    if (args.lm_gate_lang is None) != (args.lm_gate_min_logprob is None):
        # a lang without a floor silently gates nothing; a floor
        # without a lang has no reference model — both are config bugs
        p.error("--lm-gate-lang and --lm-gate-min-logprob go together")
    if args.lm_gate_min_logprob is not None \
            and args.lm_gate_min_logprob >= 0:
        # mean token log-prob is strictly negative (p < 1 always), so a
        # non-negative floor drops EVERY scored survivor and idempotency
        # pins the gutted corpus to this snapshot-id — the same footgun
        # class as a negative host cap; reject at parse time
        p.error("--lm-gate-min-logprob must be negative (log-probs are)")
    if not (0 <= args.source_gate_min_keep <= 1):
        # a rate above 1 drops EVERY source and idempotency pins the
        # empty corpus to this snapshot-id — same footgun class as a
        # negative host cap; reject at parse time
        p.error("--source-gate-min-keep must be in [0, 1]")
    if args.host_cap < 0:
        # a negative cap keeps nothing: every survivor would be dropped
        # as host_cap and the empty snapshot committed (idempotency then
        # makes it unfixable under the same id) — reject at parse time
        p.error("--host-cap must be >= 0 (0 disables the cap)")

    from ukrainian_ocr_pipeline_spark.sources.pages import is_checkable_local_path
    if is_checkable_local_path(args.docs) and not os.path.exists(args.docs):
        # fail with a one-line message instead of a Java stack trace;
        # URIs (hdfs://, s3a://) and globs are left for Spark to resolve
        p.error(f"--docs path does not exist: {args.docs}")

    from pyspark.sql import SparkSession, functions as F

    from ukrainian_ocr_pipeline_spark.operators import dedup, textstats, webnorm
    from ukrainian_ocr_pipeline_spark.operators.dedup import content_digest
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    from ukrainian_ocr_pipeline_spark.sources.session import get_spark

    badwords = None
    if args.badwords:
        if not os.path.exists(args.badwords):
            p.error(f"--badwords path does not exist: {args.badwords}")
        with open(args.badwords, encoding="utf-8") as fh:
            raw = [ln.strip() for ln in fh
                   if ln.strip() and not ln.lstrip().startswith("#")]
        try:
            badwords = textstats._validated_badwords(raw)
        except ValueError as e:
            # bad entries must fail BEFORE any expensive work or commit
            p.error(f"--badwords: {e}")

    host_blocklist = None
    if args.host_blocklist:
        if not os.path.exists(args.host_blocklist):
            p.error(f"--host-blocklist path does not exist:"
                    f" {args.host_blocklist}")
        with open(args.host_blocklist, encoding="utf-8") as fh:
            raw = [ln.strip() for ln in fh
                   if ln.strip() and not ln.lstrip().startswith("#")]
        try:
            host_blocklist = webnorm.validated_blocklist(raw)
        except ValueError as e:
            # same fail-before-work contract as --badwords
            p.error(f"--host-blocklist: {e}")

    existing = SparkSession.getActiveSession()
    spark = existing or get_spark(app=f"curate-{args.snapshot_id}",
                                  master=args.master)
    cat = SnapshotCatalog(args.warehouse)
    docs = spark.read.parquet(args.docs)

    def require_lang_survivors(surv, lang, flag, error_key):
        # a typo'd/empty reference lang would silently degrade the
        # stage (DSIR: rank-by-rarity; LM gate: all-NULL scores) and
        # idempotency would pin the wrong corpus to this snapshot-id —
        # fail loudly before anything commits
        if surv.where(F.col("lang") == lang).limit(1).count() == 0:
            raise SystemExit(json.dumps(
                {"error": error_key,
                 "detail": f"no surviving documents have lang={lang!r};"
                           f" check {flag}"}, sort_keys=True))

    def build_decisions():
        # domain blocklist gate FIRST: metadata-only (host column, no
        # text bytes), so blocked docs never reach any content stage.
        # NULL-source docs have no host and pass through (same rule as
        # the host cap — an unattributed doc must not be mass-dropped)
        if host_blocklist:
            pages = (docs.where(F.col("source").isNotNull())
                     .select("doc_id", F.col("source").alias("host")))
            bl_df = spark.createDataFrame(
                [(e,) for e in host_blocklist], "entry string")
            # gate form: semi-join of the suffix explode against the
            # broadcast list — no full-corpus groupBy; the only
            # exchange is the distinct over the (tiny) matched set.
            # blocked_ids is consumed twice (dropped rows + anti-join)
            # but each pass is a two-column metadata-only scan.
            blocked_ids = webnorm.host_blocklist_blocked_ids(
                pages, bl_df)
            dropped_hb = blocked_ids.select(
                "doc_id", F.lit("host_blocklist").alias("status"),
                F.lit(None).cast("long").alias("keeper_doc_id"))
            docs_gated = docs.join(blocked_ids, "doc_id", "left_anti")
        else:
            dropped_hb = docs.limit(0).select(
                "doc_id", F.lit("").alias("status"),
                F.lit(None).cast("long").alias("keeper_doc_id"))
            docs_gated = docs

        # domain-level quality gate: per-source keep-rates over the
        # blocklist survivors (one scan, rollup bounded by domain
        # cardinality), whole failing sources dropped BEFORE the
        # per-doc gate — a majority-garbage domain takes its
        # individually-passable pages down with it.  NULL-source docs
        # pass through (join keys never match NULL), same rule as the
        # blocklist and the host cap.
        if args.source_gate:
            # same --min-words as the per-doc gate below (the rolled-up
            # keep-rates must describe the gate actually applied);
            # round, not int: int(0.7 * 1e6) truncates float error to
            # 699999 and shifts the boundary by one micro
            gate = textstats.source_quality_gate(
                docs_gated,
                min_keep_micro=round(
                    args.source_gate_min_keep * 1_000_000),
                min_words=args.min_words)
            bad_sources = (gate.where(~F.col("keep_source"))
                           .select("source"))
            dropped_sg = (docs_gated
                          .join(F.broadcast(bad_sources), "source",
                                "semi")
                          .select("doc_id",
                                  F.lit("source_gate").alias("status"),
                                  F.lit(None).cast("long")
                                  .alias("keeper_doc_id")))
            docs_gated = docs_gated.join(
                F.broadcast(bad_sources), "source", "left_anti")
        else:
            dropped_sg = dropped_hb.limit(0)

        # quality gate: codegen predicates, no shuffle
        qf = textstats.quality_filter(docs_gated,
                                      min_words=args.min_words)
        dropped_q = (qf.where(~F.col("keep"))
                     .select("doc_id",
                             F.concat(F.lit("quality:"),
                                      F.col("drop_reason")).alias("status"),
                             F.lit(None).cast("long").alias("keeper_doc_id")))
        kept_q = qf.where(F.col("keep")).select("doc_id")

        # model-based gate among heuristic survivors: a pure scan-speed
        # projection (no shuffle), exact integer margin so the drop set
        # is shuffle-order-reproducible; TOTAL over its input — every
        # doc is scored, zero-token docs get the model prior and pass
        if args.classifier_gate:
            cls = textstats.hashed_classifier_score(
                docs.join(kept_q, "doc_id"))
            dropped_c = (cls.where(~F.col("keep"))
                         .select("doc_id",
                                 F.lit("classifier").alias("status"),
                                 F.lit(None).cast("long")
                                 .alias("keeper_doc_id")))
            kept_q = kept_q.join(dropped_c.select("doc_id"), "doc_id",
                                 "left_anti")
        else:
            dropped_c = kept_q.limit(0).select(
                "doc_id", F.lit("").alias("status"),
                F.lit(None).cast("long").alias("keeper_doc_id"))

        # C4 blocklist gate among the survivors so far: the list folds
        # into the plan as an array literal, the count is one in-row
        # HOF — runs with the other scan-speed gates, before any
        # dedup shuffle touches blocked docs
        if badwords:
            bw = textstats.badword_filter(docs.join(kept_q, "doc_id"),
                                          badwords)
            dropped_b = (bw.where(~F.col("keep"))
                         .select("doc_id",
                                 F.lit("badwords").alias("status"),
                                 F.lit(None).cast("long")
                                 .alias("keeper_doc_id")))
            kept_q = kept_q.join(dropped_b.select("doc_id"), "doc_id",
                                 "left_anti")
        else:
            dropped_b = dropped_c.limit(0)

        # exact dedup among quality survivors: one digest shuffle
        hashed = (docs.join(kept_q, "doc_id")
                  .select("doc_id", content_digest("text").alias("content_hash")))
        keepers = (hashed.groupBy("content_hash")
                   .agg(F.min("doc_id").alias("keeper_doc_id")))
        exact_status = hashed.join(keepers, "content_hash")
        dropped_x = (exact_status
                     .where(F.col("doc_id") != F.col("keeper_doc_id"))
                     .select("doc_id", F.lit("dup_exact").alias("status"),
                             "keeper_doc_id"))
        surv_ids = (exact_status
                    .where(F.col("doc_id") == F.col("keeper_doc_id"))
                    .select("doc_id"))

        # near-dup dedup among exact survivors: banded candidates only
        if args.no_neardup:
            dropped_n = dropped_x.limit(0)
        else:
            surv_docs = docs.join(surv_ids, "doc_id")
            # star contraction converges in O(log n) shuffle rounds on
            # ANY pair graph (label propagation needs diameter rounds —
            # a chain of boilerplate-templated near-dup pages could need
            # thousands); identical clustering, pinned by tests
            assign = (dedup.cluster_assign_star
                      if args.cluster_algo == "star"
                      else dedup.cluster_assign)
            kw = ({} if args.cluster_max_iter is None
                  else {"max_iter": args.cluster_max_iter})
            if args.neardup_algo == "winnow":
                pairs = (dedup.winnow_dup_candidates(
                    surv_docs, min_shared=args.winnow_min_shared,
                    max_df=args.winnow_max_df)
                    .select(F.col("a").alias("doc_a"),
                            F.col("b").alias("doc_b")))
            else:
                pairs = dedup.verified_near_dups(
                    surv_docs, threshold=args.neardup_threshold)
            clusters = assign(pairs, **kw)
            dropped_n = (clusters.where(~F.col("is_keeper"))
                         .select("doc_id", F.lit("dup_near").alias("status"),
                                 F.col("cluster_id").alias("keeper_doc_id")))
        final_ids = surv_ids.join(dropped_n.select("doc_id"), "doc_id",
                                  "left_anti")

        # DSIR domain selection among the dedup survivors (select AFTER
        # dedup so duplicates never consume selection budget — the same
        # ordering argument as the host cap): keep the N docs most like
        # the target domain by importance weight, deterministic top-N
        # via TakeOrderedAndProject (bounded heap per partition — the
        # registry's established top-k shape, never a global window).
        # Docs with no tokens have no weight row and are never selected
        # — a no-signal document cannot "look like" the target.
        if args.dsir_select:
            surv = docs.join(final_ids, "doc_id")
            require_lang_survivors(surv, args.dsir_target_lang,
                                   "--dsir-target-lang",
                                   "dsir_target_lang_empty")
            wts = textstats.dsir_importance_weights(
                surv, target_lang=args.dsir_target_lang)
            chosen = (wts.orderBy(F.desc("log_weight_r"), "doc_id")
                      .limit(args.dsir_select).select("doc_id"))
            dropped_d = (final_ids.join(chosen, "doc_id", "left_anti")
                         .select("doc_id", F.lit("dsir").alias("status"),
                                 F.lit(None).cast("long")
                                 .alias("keeper_doc_id")))
            final_ids = chosen
        else:
            dropped_d = dropped_x.limit(0)

        # CCNet LM gate among the dedup survivors (after dedup so the
        # reference model is not skewed by duplicated text; before the
        # host cap so gated docs never consume sample slots): train the
        # interpolated bigram LM on the surviving target-lang slice and
        # drop docs whose mean token log-prob falls below the floor.
        # Docs with < 2 tokens have no transitions to score -> no
        # signal -> KEPT (a drop gate must not fire without evidence)
        if args.lm_gate_lang is not None:
            surv = docs.join(final_ids, "doc_id")
            require_lang_survivors(surv, args.lm_gate_lang,
                                   "--lm-gate-lang",
                                   "lm_gate_lang_empty")
            lm = textstats.bigram_domain_logprob(
                surv, target_lang=args.lm_gate_lang)
            dropped_l = (lm.where(F.col("mean_logprob_r")
                                  < args.lm_gate_min_logprob)
                         .select("doc_id", F.lit("lm_gate").alias("status"),
                                 F.lit(None).cast("long")
                                 .alias("keeper_doc_id")))
            final_ids = final_ids.join(dropped_l.select("doc_id"),
                                       "doc_id", "left_anti")
        else:
            dropped_l = dropped_x.limit(0)

        # per-host cap among the dedup survivors (cap AFTER dedup so
        # dropped duplicates never consume a host's sample slots).
        # NULL-source docs are NOT a host: they pass through uncapped
        # rather than being collapsed into one all-NULLs pseudo-host
        # (Window.partitionBy groups NULL keys together — capping them
        # would silently mass-drop every unattributed document past N)
        if args.host_cap:
            surv = docs.join(final_ids, "doc_id")
            in_cap = (webnorm.host_cap_sample(
                surv.where(F.col("source").isNotNull()),
                host_col="source", cap=args.host_cap).select("doc_id")
                .unionByName(surv.where(F.col("source").isNull())
                             .select("doc_id")))
            dropped_h = (final_ids.join(in_cap, "doc_id", "left_anti")
                         .select("doc_id",
                                 F.lit("host_cap").alias("status"),
                                 F.lit(None).cast("long")
                                 .alias("keeper_doc_id")))
            final_ids = in_cap
        else:
            dropped_h = dropped_x.limit(0)

        # language rebalancing LAST (after all dedup/cap stages): the
        # temperature rates must reflect the distribution a training
        # run would actually read, not the pre-dedup histogram where
        # duplicate-heavy languages look artificially large
        if args.temperature_alpha:
            surv = docs.join(final_ids, "doc_id")
            samp = textstats.temperature_sample(
                surv, alpha=args.temperature_alpha)
            dropped_t = (samp.where(~F.col("kept"))
                         .select("doc_id",
                                 F.lit("lang_sample").alias("status"),
                                 F.lit(None).cast("long")
                                 .alias("keeper_doc_id")))
            final_ids = final_ids.join(dropped_t.select("doc_id"),
                                       "doc_id", "left_anti")
        else:
            dropped_t = dropped_h.limit(0)

        # deterministic split: pure function of doc_id (no RNG state);
        # the ONE definition shared with the registry's split query
        split = dedup.train_val_test_split(F.col("doc_id"))
        kept = final_ids.select(
            "doc_id", F.lit("kept").alias("status"),
            F.lit(None).cast("long").alias("keeper_doc_id"))
        return (dropped_hb
                .unionByName(dropped_sg)
                .unionByName(dropped_q)
                .unionByName(dropped_c).unionByName(dropped_b)
                .unionByName(dropped_x)
                .unionByName(dropped_n).unionByName(dropped_d)
                .unionByName(dropped_l)
                .unionByName(dropped_h).unionByName(dropped_t)
                .withColumn("split", F.lit(None).cast("string"))
                .unionByName(kept.withColumn("split", split)))

    # short-circuit BEFORE building the plan: build_decisions() runs the
    # near-dup stage eagerly (cluster_assign checkpoints per round), so
    # the is_committed check inside write_snapshot would fire only after
    # the expensive work already re-executed
    if not cat.is_committed("curation_decisions", args.snapshot_id):
        cat.write_snapshot(build_decisions(), "curation_decisions",
                           args.snapshot_id)
    decisions = cat.read_snapshot(spark, "curation_decisions",
                                  args.snapshot_id)
    # curated = input docs filtered by the COMMITTED decisions — the
    # expensive dedup plan is not re-executed for the second table
    curated = (docs.join(decisions.where(F.col("status") == "kept")
                         .select("doc_id", "split"), "doc_id"))
    if args.line_dedup:
        # census over the SURVIVORS only (dedup first, C4 ordering);
        # n_chars re-derived from the cleaned text so the column keeps
        # meaning what it says
        cleaned = dedup.line_dedup(curated.select("doc_id", "text"),
                                   min_docs=args.line_dedup_min_docs)
        curated = (curated.drop("text", "n_chars")
                   .join(cleaned.select(
                       "doc_id", F.col("clean_text").alias("text"),
                       F.col("n_removed").alias("n_boilerplate_lines")),
                       "doc_id")
                   .withColumn("n_chars", F.length("text").cast("long")))
    if args.passage_dedup:
        # after line dedup (excised docs are rejoined word-level, which
        # erases their line structure), before PII (<EMAIL>/<IP>
        # placeholders must never be counted as shared passages)
        excised = dedup.dup_passage_excise(
            curated.select("doc_id", "text"),
            min_docs=args.passage_min_docs)
        curated = (curated.drop("text", "n_chars")
                   .join(excised.select(
                       "doc_id", F.col("clean_text").alias("text"),
                       F.col("n_removed_words")
                       .alias("n_passage_words_removed")),
                       "doc_id")
                   .withColumn("n_chars", F.length("text").cast("long")))
    if args.pii_redact:
        # last text rewrite (after line + passage dedup): redact the
        # FINAL corpus, count with the same order-aware rule the report
        # query uses
        curated = (curated
                   .withColumn("n_pii", webnorm.pii_count("text"))
                   .withColumn("text", webnorm.redact_text("text"))
                   .withColumn("n_chars", F.length("text").cast("long")))
    cat.write_snapshot(curated, "curated", args.snapshot_id)

    counts = {r["status"]: r["n"] for r in
              (decisions.groupBy("status").agg(F.count("*").alias("n"))
               .collect())}
    splits = {r["split"]: r["n"] for r in
              (decisions.where(F.col("split").isNotNull())
               .groupBy("split").agg(F.count("*").alias("n")).collect())}
    stats = {
        "docs_in": sum(counts.values()),
        "dropped_quality": sum(v for k, v in counts.items()
                               if k.startswith("quality:")),
        "dropped_exact_dup": counts.get("dup_exact", 0),
        "dropped_near_dup": counts.get("dup_near", 0),
        "dropped_host_cap": counts.get("host_cap", 0),
        "dropped_classifier": counts.get("classifier", 0),
        "dropped_dsir": counts.get("dsir", 0),
        "dropped_lm": counts.get("lm_gate", 0),
        "dropped_badwords": counts.get("badwords", 0),
        "dropped_host_blocklist": counts.get("host_blocklist", 0),
        "dropped_source_gate": counts.get("source_gate", 0),
        "dropped_lang_sample": counts.get("lang_sample", 0),
        "docs_out": counts.get("kept", 0),
        "splits": splits,
    }
    if args.line_dedup or args.passage_dedup or args.pii_redact:
        cur = cat.read_snapshot(spark, "curated", args.snapshot_id)
    if args.line_dedup:
        # the COMMITTED table may predate the flag (snapshot first
        # written without --line-dedup, then idempotently re-run with
        # it): report what was actually committed instead of crashing
        # on the absent column
        if "n_boilerplate_lines" in cur.columns:
            stats["boilerplate_lines_removed"] = int(
                cur.agg(F.sum("n_boilerplate_lines")).collect()[0][0] or 0)
        else:
            stats["boilerplate_lines_removed"] = None
    if args.passage_dedup:
        # same committed-table-predates-flag tolerance as line dedup
        if "n_passage_words_removed" in cur.columns:
            stats["passage_words_removed"] = int(
                cur.agg(F.sum("n_passage_words_removed"))
                .collect()[0][0] or 0)
        else:
            stats["passage_words_removed"] = None
    if args.pii_redact:
        if "n_pii" in cur.columns:
            stats["pii_replacements"] = int(
                cur.agg(F.sum("n_pii")).collect()[0][0] or 0)
        else:
            stats["pii_replacements"] = None
    print(json.dumps(stats, sort_keys=True))
    if existing is None:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
