"""End-to-end smoke of the curation job entry (jobs/curate.py): every
input doc gets exactly one decision, the stage partition is consistent
with the standalone operators, and re-runs are idempotent."""

import json
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))

SF_DIR = "/root/testdata/sf0.001"


def test_curate_job_end_to_end(spark, tmp_path, capsys):
    import curate as job

    wh = str(tmp_path / "wh")
    docs_path = f"{SF_DIR}/documents.parquet"
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "c1"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    from ukrainian_ocr_pipeline_spark.operators import dedup, textstats
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    cat = SnapshotCatalog(wh)
    assert cat.is_committed("curation_decisions", "c1")
    assert cat.is_committed("curated", "c1")

    docs = spark.read.parquet(docs_path)
    dec = cat.read_snapshot(spark, "curation_decisions", "c1")
    cur = cat.read_snapshot(spark, "curated", "c1")

    # exactly one decision per input doc; the stats line adds up
    n_docs = docs.count()
    assert dec.count() == n_docs == stats["docs_in"]
    assert dec.select("doc_id").distinct().count() == n_docs
    assert (stats["docs_out"] + stats["dropped_quality"]
            + stats["dropped_exact_dup"] + stats["dropped_near_dup"]) == n_docs

    # curated == the kept decisions, split only on kept rows
    kept = dec.where(F.col("status") == "kept")
    assert cur.count() == kept.count() == stats["docs_out"]
    assert kept.where(F.col("split").isNull()).count() == 0
    assert dec.where((F.col("status") != "kept")
                     & F.col("split").isNotNull()).count() == 0
    assert sum(stats["splits"].values()) == stats["docs_out"]

    # quality drops match the standalone operator verbatim
    want_q = {f"quality:{r['drop_reason']}"
              for r in textstats.quality_filter(docs)
              .where(~F.col("keep")).select("drop_reason").distinct().collect()}
    got_q = {r["status"] for r in dec.where(F.col("status")
             .startswith("quality:")).select("status").distinct().collect()}
    assert got_q == want_q
    assert (dec.where(F.col("status").startswith("quality:")).count()
            == textstats.quality_filter(docs).where(~F.col("keep")).count())

    # every exact-dup keeper shares the dropped doc's content digest and
    # has a smaller id (min-keeper rule)
    digests = docs.select("doc_id", dedup.content_digest("text").alias("h"))
    bad = (dec.where(F.col("status") == "dup_exact")
           .join(digests, "doc_id")
           .join(digests.select(F.col("doc_id").alias("keeper_doc_id"),
                                F.col("h").alias("kh")), "keeper_doc_id")
           .where((F.col("h") != F.col("kh"))
                  | (F.col("keeper_doc_id") >= F.col("doc_id"))))
    assert bad.count() == 0

    # near-dup drops match the standalone operators verbatim: re-derive
    # the cluster assignment over the exact-dedup survivors (the docs
    # that reached the near-dup stage = kept + dup_near) and compare
    # membership AND keeper ids
    surv = docs.join(dec.where(F.col("status").isin("kept", "dup_near"))
                     .select("doc_id"), "doc_id")
    want_clusters = dedup.cluster_assign(dedup.verified_near_dups(surv))
    want_drops = {(r["doc_id"], r["cluster_id"]) for r in
                  want_clusters.where(~F.col("is_keeper")).collect()}
    got_drops = {(r["doc_id"], r["keeper_doc_id"]) for r in
                 dec.where(F.col("status") == "dup_near").collect()}
    assert got_drops == want_drops and len(got_drops) == stats["dropped_near_dup"]

    # re-run with the same snapshot-id: no new snapshot, identical stats
    rc2 = job.main(["--docs", docs_path, "--warehouse", wh,
                    "--snapshot-id", "c1"])
    assert rc2 == 0
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2 == stats
    assert len(cat.snapshots("curation_decisions")) == 1
    assert len(cat.snapshots("curated")) == 1


def test_curate_no_neardup_flag(spark, tmp_path, capsys):
    import curate as job

    wh = str(tmp_path / "wh")
    rc = job.main(["--docs", f"{SF_DIR}/documents.parquet",
                   "--warehouse", wh, "--snapshot-id", "c2", "--no-neardup"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["dropped_near_dup"] == 0
    assert (stats["docs_out"] + stats["dropped_quality"]
            + stats["dropped_exact_dup"]) == stats["docs_in"]


def test_curate_job_line_dedup_stage(spark, tmp_path, capsys):
    """--line-dedup strips cross-doc boilerplate from the curated text,
    matches the standalone operator verbatim, and respects the C4
    ordering (census over dedup SURVIVORS: a banner carried only by
    dropped duplicate docs must not reach the threshold)."""
    import curate as job

    from ukrainian_ocr_pipeline_spark.operators import dedup
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog

    banner = "Subscribe to our newsletter"
    body = ("unique sentence with plenty of distinct words to pass the "
            "quality gate number")
    rows = []
    for i in range(12):  # banner in 12 survivors -> boilerplate
        rows.append((i, f"{banner}\n{body} {i} alpha beta gamma delta",
                     "uk", "s0", 100))
    for i in range(100, 104):  # exact dups of ONE doc, each carrying a
        rows.append((i,        # banner that only this clone family has
                     f"only dup family carries this line\n{body} clones",
                     "uk", "s1", 100))
    docs_path = str(tmp_path / "docs.parquet")
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
     .write.parquet(docs_path))

    wh = str(tmp_path / "wh")
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "ld1", "--line-dedup",
                   "--no-neardup"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    cat = SnapshotCatalog(wh)
    cur = cat.read_snapshot(spark, "curated", "ld1")
    got = {r["doc_id"]: r for r in cur.collect()}

    # the 12-doc banner is boilerplate: stripped from every survivor
    assert stats["boilerplate_lines_removed"] == 12
    for i in range(12):
        assert got[i]["text"].startswith(body)
        assert banner not in got[i]["text"]
        assert got[i]["n_boilerplate_lines"] == 1
        assert got[i]["n_chars"] == len(got[i]["text"])
    # the clone family collapsed to ONE survivor before the census, so
    # its banner occurs once — kept
    clone_survivors = [i for i in range(100, 104) if i in got]
    assert len(clone_survivors) == 1
    assert "only dup family carries this line" in got[clone_survivors[0]]["text"]

    # survivors' cleaned text matches the standalone operator run on the
    # same survivor set
    surv = spark.createDataFrame(
        [(i, t) for i, t, *_ in rows if i in got], "doc_id long, text string")
    want = {r["doc_id"]: r["clean_text"]
            for r in dedup.line_dedup(surv).collect()}
    assert {i: r["text"] for i, r in got.items()} == want


def test_curate_job_host_cap_and_pii(spark, tmp_path, capsys):
    """--host-cap keeps at most N dedup SURVIVORS per source (exactly the
    standalone host_cap_sample selection), --pii-redact rewrites the
    final text with the shared redaction rule, and the stats line stays
    additive (docs_out + all dropped_* == docs_in)."""
    import curate as job

    from ukrainian_ocr_pipeline_spark.operators import webnorm
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog

    body = ("a perfectly reasonable sentence with enough distinct words "
            "to clear the quality gate today")
    rows = []
    for i in range(30):            # 30 docs on one big host
        rows.append((i, f"{body} alpha {i} mail user{i}@ex.example.org",
                     "uk", "bighost", 100))
    for i in range(100, 103):      # 3 docs on a small host
        rows.append((i, f"{body} beta {i} from 10.1.2.{i - 100}",
                     "uk", "smallhost", 100))
    docs_path = str(tmp_path / "docs.parquet")
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
     .write.parquet(docs_path))

    wh = str(tmp_path / "wh")
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "hc1", "--no-neardup",
                   "--host-cap", "5", "--pii-redact"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert (stats["docs_out"] + stats["dropped_quality"]
            + stats["dropped_exact_dup"] + stats["dropped_near_dup"]
            + stats["dropped_host_cap"]) == stats["docs_in"] == 33
    assert stats["dropped_host_cap"] == 25       # bighost 30->5, small 3->3
    # every kept doc carried exactly one email or one ip
    assert stats["pii_replacements"] == stats["docs_out"] == 8

    cat = SnapshotCatalog(wh)
    cur = cat.read_snapshot(spark, "curated", "hc1")
    got = {r["doc_id"]: r for r in cur.collect()}
    assert sum(1 for r in got.values() if r["source"] == "bighost") == 5
    assert sum(1 for r in got.values() if r["source"] == "smallhost") == 3
    for r in got.values():
        assert "@" not in r["text"] and "10.1.2." not in r["text"]
        assert ("<EMAIL>" in r["text"]) or ("<IP>" in r["text"])
        assert r["n_pii"] == 1 and r["n_chars"] == len(r["text"])

    # the capped set is exactly the standalone operator's selection
    surv = spark.createDataFrame(
        [(i, s) for i, _, _, s, _ in rows], "doc_id long, source string")
    want = {r["doc_id"] for r in webnorm.host_cap_sample(
        surv, host_col="source", cap=5).collect()}
    dec = cat.read_snapshot(spark, "curation_decisions", "hc1")
    kept_ids = {r["doc_id"] for r in
                dec.where(F.col("status") == "kept").collect()}
    assert kept_ids == (want & kept_ids) and len(kept_ids) == 8
    capped = {r["doc_id"] for r in
              dec.where(F.col("status") == "host_cap").collect()}
    assert capped == set(range(30)) - want


def test_curate_job_host_cap_null_source_passthrough(spark, tmp_path,
                                                     capsys):
    """NULL-source docs are not a host: the cap must pass them through
    instead of collapsing them into one all-NULLs pseudo-host (Spark
    windows group NULL keys together).  And a negative --host-cap is
    rejected at parse time — it would drop the whole corpus into an
    unfixable committed snapshot."""
    import pytest

    import curate as job

    body = ("a perfectly reasonable sentence with enough distinct words "
            "to clear the quality gate today")
    rows = ([(i, f"{body} gamma {i}", "uk", "onehost", 100)
             for i in range(10)]
            + [(100 + i, f"{body} delta {i}", "uk", None, 100)
               for i in range(10)])
    docs_path = str(tmp_path / "docs.parquet")
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
     .write.parquet(docs_path))

    wh = str(tmp_path / "wh")
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "n1", "--no-neardup",
                   "--host-cap", "3"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # onehost capped 10 -> 3; all 10 NULL-source docs kept
    assert stats["dropped_host_cap"] == 7 and stats["docs_out"] == 13

    with pytest.raises(SystemExit):
        job.main(["--docs", docs_path, "--warehouse", wh,
                  "--snapshot-id", "n2", "--host-cap", "-1"])


def test_curate_job_classifier_and_temperature_stages(spark, tmp_path,
                                                      capsys):
    """--classifier-gate drops exactly the standalone operator's
    keep=False set among heuristic-quality survivors; --temperature-alpha
    drops exactly the standalone sampler's kept=False set over the FINAL
    survivor distribution (not the raw input histogram); stats add up."""
    import curate as job

    from ukrainian_ocr_pipeline_spark.operators import textstats

    wh = str(tmp_path / "wh")
    docs_path = f"{SF_DIR}/documents.parquet"
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "c7", "--classifier-gate",
                   "--temperature-alpha", "0.5"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["dropped_classifier"] > 0
    assert stats["dropped_lang_sample"] > 0
    assert (stats["docs_out"] + stats["dropped_quality"]
            + stats["dropped_classifier"] + stats["dropped_exact_dup"]
            + stats["dropped_near_dup"]
            + stats["dropped_lang_sample"]) == stats["docs_in"]

    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    dec = SnapshotCatalog(wh).read_snapshot(
        spark, "curation_decisions", "c7")
    docs = spark.read.parquet(docs_path)

    # classifier drops = operator keep=False among heuristic survivors
    qual_surv = (dec.where(~F.col("status").startswith("quality:"))
                 .select("doc_id"))
    cls = textstats.hashed_classifier_score(docs.join(qual_surv, "doc_id"))
    want_c = {r["doc_id"] for r in cls.where(~F.col("keep"))
              .select("doc_id").collect()}
    got_c = {r["doc_id"] for r in dec.where(F.col("status") == "classifier")
             .select("doc_id").collect()}
    assert got_c == want_c

    # temperature drops = standalone sampler over (kept + lang_sample)
    final_pool = (dec.where(F.col("status").isin("kept", "lang_sample"))
                  .select("doc_id"))
    samp = textstats.temperature_sample(docs.join(final_pool, "doc_id"),
                                        alpha=0.5)
    want_t = {r["doc_id"] for r in samp.where(~F.col("kept"))
              .select("doc_id").collect()}
    got_t = {r["doc_id"] for r in dec.where(F.col("status") == "lang_sample")
             .select("doc_id").collect()}
    assert got_t == want_t


def test_curate_temperature_alpha_one_is_noop_and_bounds_rejected(
        spark, tmp_path, capsys):
    import pytest

    import curate as job

    wh = str(tmp_path / "wh")
    rc = job.main(["--docs", f"{SF_DIR}/documents.parquet",
                   "--warehouse", wh, "--snapshot-id", "c8",
                   "--temperature-alpha", "1.0"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["dropped_lang_sample"] == 0

    for bad in ("-0.1", "1.5"):
        with pytest.raises(SystemExit):
            job.main(["--docs", f"{SF_DIR}/documents.parquet",
                      "--warehouse", wh, "--snapshot-id", "c9",
                      "--temperature-alpha", bad])


def test_curate_job_dsir_selection_stage(spark, tmp_path, capsys):
    """--dsir-select N keeps exactly the standalone operator's top-N by
    (log_weight desc, doc_id) among dedup survivors; the rest of the
    survivors are status='dsir'; stats add up; negative N rejected."""
    import pytest

    import curate as job

    from ukrainian_ocr_pipeline_spark.operators import textstats

    wh = str(tmp_path / "wh")
    docs_path = f"{SF_DIR}/documents.parquet"
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "c9", "--dsir-select", "100",
                   "--dsir-target-lang", "fr"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["docs_out"] == 100
    assert stats["dropped_dsir"] > 0
    assert (stats["docs_out"] + stats["dropped_quality"]
            + stats["dropped_exact_dup"] + stats["dropped_near_dup"]
            + stats["dropped_dsir"]) == stats["docs_in"]

    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    dec = SnapshotCatalog(wh).read_snapshot(
        spark, "curation_decisions", "c9")
    docs = spark.read.parquet(docs_path)

    # kept set = standalone DSIR top-100 over the dedup-survivor pool
    pool = (dec.where(F.col("status").isin("kept", "dsir"))
            .select("doc_id"))
    wts = textstats.dsir_importance_weights(docs.join(pool, "doc_id"),
                                            target_lang="fr")
    want = {r["doc_id"] for r in
            wts.orderBy(F.desc("log_weight_r"), "doc_id").limit(100)
            .select("doc_id").collect()}
    got = {r["doc_id"] for r in dec.where(F.col("status") == "kept")
           .select("doc_id").collect()}
    assert got == want

    with pytest.raises(SystemExit):
        job.main(["--docs", docs_path, "--warehouse", wh,
                  "--snapshot-id", "c9b", "--dsir-select", "-1",
                  "--dsir-target-lang", "fr"])
    with pytest.raises(SystemExit):  # target lang required with the stage
        job.main(["--docs", docs_path, "--warehouse", wh,
                  "--snapshot-id", "c9c", "--dsir-select", "10"])


def test_curate_dsir_typod_target_lang_fails_loudly(spark, tmp_path,
                                                    capsys):
    """A --dsir-target-lang with zero surviving docs must abort before
    anything commits (typo guard), not silently rank by token rarity."""
    import pytest

    import curate as job

    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog

    wh = str(tmp_path / "wh")
    with pytest.raises(SystemExit, match="dsir_target_lang_empty"):
        job.main(["--docs", f"{SF_DIR}/documents.parquet",
                  "--warehouse", wh, "--snapshot-id", "c10",
                  "--dsir-select", "50", "--dsir-target-lang", "ukr"])
    assert not SnapshotCatalog(wh).is_committed("curation_decisions", "c10")


def test_curate_cluster_algo_star_and_label_identical(spark, tmp_path,
                                                      capsys):
    """--cluster-algo star (default) and label must produce identical
    decisions — same drop set, same keeper assignment per dropped doc
    (both algorithms label clusters with the component-minimum)."""
    import curate as job

    docs_path = f"{SF_DIR}/documents.parquet"
    out = {}
    for algo in ("star", "label"):
        wh = str(tmp_path / f"wh_{algo}")
        rc = job.main(["--docs", docs_path, "--warehouse", wh,
                       "--snapshot-id", "ca1", "--cluster-algo", algo])
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
        dec = (SnapshotCatalog(wh).read_snapshot(
            spark, "curation_decisions", "ca1")
            .select("doc_id", "status", "keeper_doc_id"))
        out[algo] = (stats["dropped_near_dup"],
                     sorted(map(tuple, dec.collect())))
    assert out["star"][0] > 0  # the stage actually exercised
    assert out["star"] == out["label"]


def test_curate_job_passage_dedup_stage(spark, tmp_path, capsys):
    """--passage-dedup excises the shared passage from every survivor
    except the min-doc_id owner, matches the standalone operator
    verbatim, and the guard rejects --passage-min-docs < 2."""
    import curate as job

    from ukrainian_ocr_pipeline_spark.operators import dedup
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog

    passage = "shared passage words one two three four"
    rows = []
    for i in range(3):  # passage in 3 docs; doc 0 owns it; tails are
        rows.append((i,  # fully per-doc so ONLY the passage is shared
                     f"{passage} tail{i} the body{i} text{i} alpha{i} "
                     f"beta{i} gamma{i} delta{i} epsilon{i}",
                     "uk", "s0", 120))
    rows.append((10, "a completely different document with plenty of "
                     "distinct vocabulary to pass the quality gate",
                 "uk", "s1", 90))
    docs_path = str(tmp_path / "docs.parquet")
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
     .write.parquet(docs_path))

    wh = str(tmp_path / "wh")
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "pd1", "--passage-dedup",
                   "--no-neardup"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    got = {r["doc_id"]: r for r in SnapshotCatalog(wh).read_snapshot(
        spark, "curated", "pd1").collect()}
    # owner keeps the passage; docs 1 and 2 lose its 7 words each
    assert got[0]["text"].startswith(passage)
    assert got[0]["n_passage_words_removed"] == 0
    for i in (1, 2):
        assert passage not in got[i]["text"]
        assert got[i]["n_passage_words_removed"] == 7
        assert got[i]["n_chars"] == len(got[i]["text"])
    assert got[10]["n_passage_words_removed"] == 0
    assert stats["passage_words_removed"] == 14

    # matches the standalone operator on the survivor set
    surv = spark.createDataFrame(
        [(i, t) for i, t, *_ in rows], "doc_id long, text string")
    want = {r["doc_id"]: r["clean_text"]
            for r in dedup.dup_passage_excise(surv).collect()}
    assert {i: r["text"] for i, r in got.items()} == want

    import pytest
    with pytest.raises(SystemExit):
        job.main(["--docs", docs_path, "--warehouse", wh,
                  "--snapshot-id", "pd2", "--passage-dedup",
                  "--passage-min-docs", "1"])


def test_curate_job_lm_gate_stage(spark, tmp_path, capsys):
    """--lm-gate-lang/--lm-gate-min-logprob drops exactly the dedup
    survivors scoring below the floor under the survivor-trained bigram
    LM; flags must come together; an empty reference lang aborts before
    commit."""
    import pytest

    import curate as job

    from ukrainian_ocr_pipeline_spark.operators import textstats
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog

    docs_path = f"{SF_DIR}/documents.parquet"
    wh = str(tmp_path / "wh")
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "lm1", "--lm-gate-lang", "en",
                   "--lm-gate-min-logprob", "-3.47"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["dropped_lm"] > 0
    assert (stats["docs_out"] + stats["dropped_quality"]
            + stats["dropped_exact_dup"] + stats["dropped_near_dup"]
            + stats["dropped_lm"]) == stats["docs_in"]

    # parity with the standalone operator over the pre-gate survivors
    dec = SnapshotCatalog(wh).read_snapshot(spark, "curation_decisions",
                                            "lm1")
    gated = {r["doc_id"] for r in
             dec.where(F.col("status") == "lm_gate").collect()}
    pre_gate = dec.where(F.col("status").isin("kept", "lm_gate")) \
        .select("doc_id")
    surv = spark.read.parquet(docs_path).join(pre_gate, "doc_id")
    lm = textstats.bigram_domain_logprob(surv, target_lang="en")
    want = {r["doc_id"] for r in
            lm.where(F.col("mean_logprob_r") < -3.47).collect()}
    assert gated == want

    # flags must come together
    with pytest.raises(SystemExit):
        job.main(["--docs", docs_path, "--warehouse", wh,
                  "--snapshot-id", "lm2", "--lm-gate-lang", "en"])
    # a reference lang with no survivors aborts loudly before commit
    with pytest.raises(SystemExit, match="lm_gate_lang_empty"):
        job.main(["--docs", docs_path, "--warehouse", str(tmp_path / "w2"),
                  "--snapshot-id", "lm3", "--lm-gate-lang", "xx",
                  "--lm-gate-min-logprob", "-3.47"])


def test_curate_lm_gate_keeps_no_signal_docs_and_rejects_bad_floor(
        spark, tmp_path, capsys):
    """A doc with < 2 tokens has no transitions to score and must be
    KEPT (a drop gate needs evidence); a non-negative floor is rejected
    at parse time (it would gut the corpus)."""
    import pytest

    import curate as job

    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog

    rows = [(i, "the quick brown fox jumps over a lazy dog number "
                f"tail{i}", "en", "s0", 60) for i in range(6)]
    # non-latin single token: passes the quality gate at --min-words 1
    # (the English stopword rule applies only to latin-majority docs)
    # but has no bigram transitions -> no LM signal
    rows.append((900, "你好", "zh", "s1", 2))
    docs_path = str(tmp_path / "docs.parquet")
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long").write.parquet(docs_path))

    wh = str(tmp_path / "wh")
    # an absurdly high (still negative) floor: every SCORED doc drops,
    # the no-signal doc must survive
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "lmns", "--min-words", "1",
                   "--no-neardup", "--lm-gate-lang", "en",
                   "--lm-gate-min-logprob", "-0.000001"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    dec = {r["doc_id"]: r["status"] for r in SnapshotCatalog(wh)
           .read_snapshot(spark, "curation_decisions", "lmns").collect()}
    assert dec[900] == "kept"
    assert stats["dropped_lm"] == 6  # every scored survivor dropped
    assert stats["docs_out"] == 1

    with pytest.raises(SystemExit):
        job.main(["--docs", docs_path, "--warehouse", wh,
                  "--snapshot-id", "lmbad", "--lm-gate-lang", "en",
                  "--lm-gate-min-logprob", "0.5"])


def test_curate_job_badwords_stage(spark, tmp_path, capsys):
    """--badwords drops exactly the survivors containing a listed whole
    token (parity with the standalone operator); comments and blank
    lines in the file are ignored; malformed entries fail at startup."""
    import pytest

    import curate as job

    from ukrainian_ocr_pipeline_spark.operators import textstats
    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog

    docs_path = f"{SF_DIR}/documents.parquet"
    bw_file = tmp_path / "bw.txt"
    bw_file.write_text("# crafted blocklist\n\nslow\nVECTOR\n")
    wh = str(tmp_path / "wh")
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "bw1", "--no-neardup",
                   "--badwords", str(bw_file)])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["dropped_badwords"] > 0
    assert (stats["docs_out"] + stats["dropped_quality"]
            + stats["dropped_exact_dup"]
            + stats["dropped_badwords"]) == stats["docs_in"]

    dec = SnapshotCatalog(wh).read_snapshot(spark, "curation_decisions",
                                            "bw1")
    got = {r["doc_id"] for r in
           dec.where(F.col("status") == "badwords").collect()}
    pre = dec.where(F.col("status").isin("kept", "badwords",
                                         "dup_exact")).select("doc_id")
    want = {r["doc_id"] for r in textstats.badword_filter(
        spark.read.parquet(docs_path).join(
            dec.where(F.col("status").isin("kept", "badwords"))
            .select("doc_id").unionByName(
                dec.where(F.col("status") == "dup_exact")
                .select("doc_id")), "doc_id"),
        ["slow", "vector"]).where(~F.col("keep")).collect()}
    # the gate ran BEFORE exact dedup, so blocked dup docs also show as
    # badwords — compare against the operator over all quality survivors
    assert got == want

    with pytest.raises(SystemExit):  # phrase entry rejected at startup
        bad = tmp_path / "bad.txt"
        bad.write_text("two words\n")
        job.main(["--docs", docs_path, "--warehouse", wh,
                  "--snapshot-id", "bw2", "--badwords", str(bad)])


def test_curate_job_host_blocklist_stage(spark, tmp_path, capsys):
    """--host-blocklist drops exactly the docs whose source host is
    listed, BEFORE any content stage (blocked docs never appear under
    any other status); malformed entries fail at startup."""
    import pytest

    import curate as job

    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog

    docs_path = f"{SF_DIR}/documents.parquet"
    bl_file = tmp_path / "hosts.txt"
    bl_file.write_text("# crafted domain blocklist\n\nsrc3\nSRC7\n")
    wh = str(tmp_path / "wh")
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "hb1", "--no-neardup",
                   "--host-blocklist", str(bl_file)])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["dropped_host_blocklist"] > 0
    assert (stats["docs_out"] + stats["dropped_quality"]
            + stats["dropped_exact_dup"]
            + stats["dropped_host_blocklist"]) == stats["docs_in"]

    dec = SnapshotCatalog(wh).read_snapshot(spark, "curation_decisions",
                                            "hb1")
    got = {r["doc_id"] for r in
           dec.where(F.col("status") == "host_blocklist").collect()}
    want = {r["doc_id"] for r in
            spark.read.parquet(docs_path)
            .where(F.col("source").isin("src3", "src7")).collect()}
    assert got == want
    # gate runs first: no blocked doc carries any other status
    assert dec.where(F.col("doc_id").isin(list(got))
                     & (F.col("status") != "host_blocklist")).count() == 0

    with pytest.raises(SystemExit):  # whitespace entry rejected at startup
        bad = tmp_path / "badhosts.txt"
        bad.write_text("two words\n")
        job.main(["--docs", docs_path, "--warehouse", wh,
                  "--snapshot-id", "hb2", "--no-neardup",
                  "--host-blocklist", str(bad)])


def test_curate_job_source_gate_stage(spark, tmp_path, capsys):
    """--source-gate drops WHOLE majority-bad sources (including their
    individually-passable docs), leaves majority-good sources and
    NULL-source docs alone, and a rate outside [0, 1] is rejected at
    parse time."""
    import pytest

    import curate as job

    body = ("a perfectly reasonable sentence with enough distinct words "
            "to clear the quality gate today")
    rows = (
        # badhost: 7 of 9 fail too_short -> keep-rate 2/9 < 0.5, the 2
        # good docs must drop WITH their source
        [(i, "tiny", "uk", "badhost", 4) for i in range(7)]
        + [(10 + i, f"{body} alpha {i}", "uk", "badhost", 100)
           for i in range(2)]
        # goodhost: all pass -> survives intact
        + [(20 + i, f"{body} beta {i}", "uk", "goodhost", 100)
           for i in range(5)]
        # NULL source: not a domain, passes the gate regardless
        + [(30, f"{body} gamma", "uk", None, 100),
           (31, "small", "uk", None, 5)])
    docs_path = str(tmp_path / "docs.parquet")
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
     .write.parquet(docs_path))

    wh = str(tmp_path / "wh")
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "sg1", "--no-neardup",
                   "--source-gate"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # all 9 badhost docs drop as source_gate (the 2 good ones included);
    # the NULL-source 'small' doc still drops at the per-doc gate
    assert stats["dropped_source_gate"] == 9
    assert stats["dropped_quality"] == 1
    assert stats["docs_out"] == 6

    from pyspark.sql import functions as F

    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    dec = SnapshotCatalog(wh).read_snapshot(
        spark, "curation_decisions", "sg1")
    gated = {r["doc_id"] for r in
             dec.where(F.col("status") == "source_gate").collect()}
    assert gated == set(range(7)) | {10, 11}

    with pytest.raises(SystemExit):
        job.main(["--docs", docs_path, "--warehouse", wh,
                  "--snapshot-id", "sg2", "--source-gate",
                  "--source-gate-min-keep", "1.5"])

    # --min-words must flow into the SOURCE gate too: at 50 every
    # goodhost doc (~16 words) fails, so the whole source drops as
    # source_gate instead of surviving on the default-threshold
    # keep-rate — the rolled-up gate must describe the gate actually
    # applied
    rc = job.main(["--docs", docs_path, "--warehouse", wh,
                   "--snapshot-id", "sg3", "--no-neardup",
                   "--source-gate", "--min-words", "50"])
    assert rc == 0
    stats3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats3["dropped_source_gate"] == 14  # badhost 9 + goodhost 5
    assert stats3["dropped_quality"] == 2       # the NULL-source pair
    assert stats3["docs_out"] == 0


def test_curate_job_winnow_neardup_algo(spark, tmp_path, capsys):
    """--neardup-algo winnow: partial-overlap docs (a long shared
    passage inside otherwise-different documents) dedup under the
    winnow family but survive the whole-set-Jaccard default; the
    cluster keeper rule is unchanged; the flag is validated."""
    import curate as job

    import pytest

    shared = ("the quick brown fox jumps over the lazy dog near the "
              "quiet river bank every single morning without fail")
    filler_a = " ".join(f"alpha{i}" for i in range(80))
    filler_b = " ".join(f"beta{i}" for i in range(80))
    rows = [(1, f"{filler_a} {shared}", "en", "s1", 1),
            (2, f"{shared} {filler_b}", "en", "s1", 1),
            (3, " ".join(f"gamma{i}" for i in range(90)), "en", "s1", 1)]
    docs_path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars int").write.parquet(docs_path)

    # default minhash family: whole-set Jaccard of docs 1/2 is far
    # below 0.5 -> nothing drops as near-dup
    wh1 = str(tmp_path / "wh1")
    rc = job.main(["--docs", docs_path, "--warehouse", wh1,
                   "--snapshot-id", "m1"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["dropped_near_dup"] == 0

    # winnow family: the 19-word shared passage guarantees shared
    # fingerprints -> doc 2 collapses onto keeper doc 1
    wh2 = str(tmp_path / "wh2")
    rc = job.main(["--docs", docs_path, "--warehouse", wh2,
                   "--snapshot-id", "w1", "--neardup-algo", "winnow"])
    assert rc == 0
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2["dropped_near_dup"] == 1

    from ukrainian_ocr_pipeline_spark.sources.catalog import SnapshotCatalog
    dec = SnapshotCatalog(wh2).read_snapshot(
        spark, "curation_decisions", "w1")
    dropped = dec.where(F.col("status") == "dup_near").collect()
    assert [(r["doc_id"], r["keeper_doc_id"]) for r in dropped] == [(2, 1)]

    with pytest.raises(SystemExit):
        job.main(["--docs", docs_path, "--warehouse", wh2,
                  "--snapshot-id", "w2", "--neardup-algo", "winnow",
                  "--winnow-min-shared", "0"])


def test_curate_winnow_flag_coherence_and_family_cap(spark, tmp_path,
                                                     capsys):
    """Incoherent family/knob combos are rejected at parse time, and a
    duplicate family larger than --winnow-max-df pairs again once the
    cap is raised (the documented furniture-cap caveat)."""
    import curate as job

    import pytest

    # the template needs real stopwords or the QUALITY gate (which
    # runs first) drops the whole family as few_stopwords before the
    # near-dup stage ever sees it
    shared = ("we all go to the old market in the town and it is the "
              "best place of all because the people there are kind and "
              "the bread is warm in the morning light")
    rows = [(i, f"{shared} unique{i} tail{i} extra{i}", "en", "s1", 1)
            for i in range(60)]
    docs_path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars int").write.parquet(docs_path)

    for bad in (["--neardup-algo", "winnow", "--neardup-threshold", "0.9"],
                ["--winnow-min-shared", "5"],
                ["--winnow-max-df", "10"],
                ["--neardup-algo", "winnow", "--winnow-max-df", "1"]):
        with pytest.raises(SystemExit):
            job.main(["--docs", docs_path, "--warehouse",
                      str(tmp_path / "whx"), "--snapshot-id", "x"] + bad)

    # 60-doc family, default cap 50: every shared fingerprint is
    # "furniture", family survives near-dup almost untouched
    wh1 = str(tmp_path / "wh1")
    rc = job.main(["--docs", docs_path, "--warehouse", wh1,
                   "--snapshot-id", "c1", "--neardup-algo", "winnow"])
    assert rc == 0
    s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s1["dropped_near_dup"] < 10

    # raised cap: the whole family collapses onto one keeper
    wh2 = str(tmp_path / "wh2")
    rc = job.main(["--docs", docs_path, "--warehouse", wh2,
                   "--snapshot-id", "c2", "--neardup-algo", "winnow",
                   "--winnow-max-df", "100"])
    assert rc == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["dropped_near_dup"] == 59
