"""Behavioral invariants for the round-3 curation additions: greedy
sequence packing, temperature sampling, hashed classifier scoring, and
SimHash Hamming banding.  (Value-exactness vs DuckDB is covered by the
oracle mirror; these pin the SEMANTIC guarantees the oracle twin alone
would not explain.)"""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
BUDGET = 128


@pytest.fixture(scope="module")
def packed(spark):
    from ukrainian_ocr_pipeline_spark.operators import packing
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return (packing.sequence_pack(docs, budget=BUDGET)
            .toPandas().sort_values(["lang", "doc_id"]).reset_index(drop=True))


def test_pack_sequences_fit_budget_unless_single_oversized_doc(packed):
    """A sequence over budget must contain exactly one content-bearing
    doc (zero-token docs are weightless and may share any sequence)."""
    for (_, seq), g in packed.groupby(["lang", "seq_id"]):
        assert (g["n_tokens"].sum() <= BUDGET
                or (g["n_tokens"] > 0).sum() == 1), (seq, g)


def test_pack_offsets_are_running_fill(packed):
    for _, g in packed.groupby(["lang", "seq_id"]):
        g = g.sort_values("doc_id")
        assert g["seq_offset"].iloc[0] == 0
        assert (g["seq_offset"] == g["n_tokens"].cumsum().shift(
            1, fill_value=0)).all(), g


def test_pack_is_greedy_no_premature_splits(packed):
    """A new sequence may open only because the doc did not fit (or the
    previous fill was an oversized doc already past budget)."""
    for _, g in packed.groupby("lang"):
        g = g.sort_values("doc_id").reset_index(drop=True)
        for i in range(1, len(g)):
            if g["seq_id"][i] != g["seq_id"][i - 1]:
                prev_fill = g["seq_offset"][i - 1] + g["n_tokens"][i - 1]
                assert prev_fill > 0 and prev_fill + g["n_tokens"][i] > BUDGET


def test_pack_seq_ids_dense_and_docs_complete(packed, spark):
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(packed) == n_docs
    for _, g in packed.groupby("lang"):
        seqs = sorted(g["seq_id"].unique())
        assert seqs == list(range(len(seqs)))


def test_pack_zero_token_and_oversized_docs(spark):
    """The fixture corpus has no empty-text or over-budget docs, so pin
    the edge semantics synthetically: NULL/empty docs are weightless
    (fill stays 0, so a following oversized doc shares their sequence),
    an oversized doc closes any non-empty sequence before it and the
    next doc opens a fresh one after it."""
    from ukrainian_ocr_pipeline_spark.operators import packing
    big = " ".join(["w"] * 200)          # > BUDGET tokens
    docs = spark.createDataFrame(
        [(1, None, "uk"), (2, "", "uk"), (3, big, "uk"),
         (4, "a b c", "uk"), (5, big, "uk"), (6, "d e", "uk")],
        "doc_id long, text string, lang string")
    out = (packing.sequence_pack(docs, budget=BUDGET)
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_tokens"].tolist() == [0, 0, 200, 3, 200, 2]
    # docs 1,2 weightless at fill 0 -> oversized doc 3 joins seq 0;
    # doc 4 can't fit after 200 -> seq 1; oversized doc 5 -> seq 2;
    # doc 6 can't fit after 200 -> seq 3
    assert out["seq_id"].tolist() == [0, 0, 0, 1, 2, 3]
    assert out["seq_offset"].tolist() == [0, 0, 0, 0, 0, 0]


@pytest.fixture(scope="module")
def sampled(spark):
    from ukrainian_ocr_pipeline_spark.operators import textstats
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return textstats.temperature_sample(docs, alpha=0.6).toPandas()


def test_temperature_rarest_lang_kept_entirely(sampled, spark):
    counts = (spark.read.parquet(f"{SF}/documents.parquet")
              .groupBy("lang").count().toPandas())
    rarest = counts.sort_values(["count", "lang"]).iloc[0]["lang"]
    g = sampled[sampled["lang"] == rarest]
    assert (g["rate_millionths"] == 1000000).all()
    assert g["kept"].all()


def test_temperature_rates_monotone_in_lang_size(sampled, spark):
    counts = (spark.read.parquet(f"{SF}/documents.parquet")
              .groupBy("lang").count().toPandas().set_index("lang")["count"])
    rates = sampled.groupby("lang")["rate_millionths"].first()
    merged = pd.DataFrame({"n": counts, "rate": rates}).sort_values("n")
    assert (merged["rate"].diff().dropna() <= 0).all(), merged


def test_temperature_alpha_one_keeps_everything(spark):
    from ukrainian_ocr_pipeline_spark.operators import textstats
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = textstats.temperature_sample(docs, alpha=1.0).toPandas()
    assert (out["rate_millionths"] == 1000000).all()
    assert out["kept"].all()


def test_classifier_keep_is_exact_sign_of_margin(spark):
    from ukrainian_ocr_pipeline_spark.operators import textstats
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = textstats.hashed_classifier_score(docs).toPandas()
    assert (out["keep"] == (out["wsum_milli"] >= 0)).all()
    assert ((out["score_r"] > 0) & (out["score_r"] < 1)).all()
    assert (out["keep"] == (out["score_r"] >= 0.5)).all()


def test_simhash_hamming_rejects_lossy_band_config():
    from ukrainian_ocr_pipeline_spark.operators import dedup
    with pytest.raises(AssertionError):
        dedup.simhash_hamming_pairs(None, max_hamming=4, n_bands=4)


def test_classifier_is_total_empty_docs_get_prior(spark):
    """Zero-token docs (empty/whitespace/NULL text) must still be
    scored: margin 0, score 0.5, keep=true — absent rows would let them
    bypass the curate job's classifier gate unexamined."""
    from ukrainian_ocr_pipeline_spark.operators import textstats
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "real words here")],
        "doc_id long, text string")
    out = (textstats.hashed_classifier_score(docs)
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 4
    empty = out[out.doc_id != 4]
    assert (empty["n_tokens"] == 0).all()
    assert (empty["wsum_milli"] == 0).all()
    assert (empty["score_r"] == 0.5).all()
    assert empty["keep"].all()


def test_shard_manifest_covers_corpus_and_shares_sum(spark):
    """Every doc lands in exactly one shard; totals reconcile with the
    corpus; token shares are the micro-fixed integer division of each
    shard's tokens (so they sum to <= 1e6 with bounded truncation)."""
    from pyspark.sql import functions as F
    from ukrainian_ocr_pipeline_spark.operators import dedup, packing
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    man = packing.shard_manifest(docs, n_shards=16).toPandas()
    assert man["n_docs"].sum() == docs.count()
    # TOTAL over the shard space: all 16 ids present exactly once, an
    # empty shard would report zeros rather than vanish
    assert sorted(man["shard_id"]) == list(range(16))
    want_tok = (docs.select(
        F.sum(F.greatest(F.size(dedup.word_array("text")), F.lit(0)))
        .alias("t")).collect()[0]["t"])
    assert man["n_tokens"].sum() == want_tok
    total = man["n_tokens"].sum()
    for _, r in man.iterrows():
        assert r["token_share_micro"] == r["n_tokens"] * 1_000_000 // total
    # truncation-only deficit: shares undershoot 1e6 by < n_shards
    assert 1_000_000 - len(man) < man["token_share_micro"].sum() <= 1_000_000


def test_shard_assign_is_deterministic_and_spread(spark):
    """Same key -> same shard on every call; the md5 spread puts at
    least half the shards in play even on the 500-doc fixture."""
    from pyspark.sql import functions as F
    from ukrainian_ocr_pipeline_spark.operators import packing
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = packing.shard_manifest(docs, n_shards=16).toPandas()
    b = packing.shard_manifest(docs, n_shards=16).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values("shard_id").reset_index(drop=True),
        b.sort_values("shard_id").reset_index(drop=True))
    # md5 spread on the 500-doc fixture: at least half the shards carry
    # docs (degenerate hashing would pile into a few)
    assert (a["n_docs"] > 0).sum() >= 8
    # degenerate parameters fail loudly, not with NULL shard ids
    with pytest.raises(ValueError):
        packing.shard_assign(docs["doc_id"], n_shards=0)
    with pytest.raises(ValueError):
        packing.compaction_plan(docs, target_bytes=0)


def test_compaction_plan_bins_are_contiguous_and_sized(spark):
    """Bins within a partition are contiguous id ranges, bin ids are the
    running-offset division, every file is planned exactly once, and no
    bin except an oversized-file bin STARTS past one target of fill."""
    from ukrainian_ocr_pipeline_spark.operators import packing
    target = 100
    files = spark.createDataFrame(
        [("a", 1, 40), ("a", 2, 40), ("a", 3, 40),   # 40+40 | 40
         ("a", 4, 250),                              # oversized
         ("a", 5, 10),
         ("b", 1, 100), ("b", 2, 1),                 # exact fit | 1
         ("c", 1, None)],                            # NULL size -> 0
        "part string, file_id long, bytes long")
    plan = (packing.compaction_plan(files, target_bytes=target)
            .toPandas().sort_values(["part", "bin_id"])
            .reset_index(drop=True))
    got = {(r["part"], r["bin_id"]): (r["n_files"], r["bin_bytes"],
                                      r["first_file"], r["last_file"])
           for _, r in plan.iterrows()}
    # part a offsets: 0,40,80,120,370 -> bins 0,0,0,1,3
    assert got[("a", 0)] == (3, 120, 1, 3)
    assert got[("a", 1)] == (1, 250, 4, 4)
    assert got[("a", 3)] == (1, 10, 5, 5)
    # part b offsets: 0,100 -> bins 0,1 (exact fit closes the bin)
    assert got[("b", 0)] == (1, 100, 1, 1)
    assert got[("b", 1)] == (1, 1, 2, 2)
    assert got[("c", 0)] == (1, 0, 1, 1)
    assert plan["n_files"].sum() == 8
    # contiguity: within a part, ranges never interleave
    for part, g in plan.groupby("part"):
        g = g.sort_values("bin_id")
        assert (g["first_file"].values[1:]
                > g["last_file"].values[:-1]).all()


def test_compaction_plan_randomized_matches_python_model(spark):
    """Randomized file manifests (NULL/zero/oversized sizes, uneven
    partitions) vs a pure-Python reference of the offset-binning rule:
    the plan must be row-exact — every file planned once, bin id =
    floor(preceding-bytes / target) in file_id order per partition."""
    import random

    from ukrainian_ocr_pipeline_spark.operators import packing

    rng = random.Random(20260819)
    target = 100
    rows = []
    for p in range(8):
        part = f"p{p}"
        n = rng.randint(0, 12)
        fid = 0
        for _ in range(n):
            fid += rng.randint(1, 3)  # gaps: ids need not be dense
            size = rng.choice([None, 0, rng.randint(1, 60),
                               rng.randint(90, 110), rng.randint(150, 400)])
            rows.append((part, fid, size))
    got = {(r["part"], r["bin_id"]):
           (r["n_files"], r["bin_bytes"], r["first_file"], r["last_file"])
           for r in packing.compaction_plan(
               spark.createDataFrame(
                   rows, "part string, file_id long, bytes long"),
               target_bytes=target).collect()}
    want = {}
    by_part = {}
    for part, fid, size in rows:
        by_part.setdefault(part, []).append((fid, size or 0))
    for part, files in by_part.items():
        off = 0
        for fid, size in sorted(files):
            b = off // target
            n, tot, lo, hi = want.get((part, b), (0, 0, fid, fid))
            want[(part, b)] = (n + 1, tot + size, min(lo, fid), max(hi, fid))
            off += size
    assert got == want


def test_shard_manifest_randomized_matches_python_model(spark):
    """Random corpora (NULL/empty/whitespace texts, random shard counts)
    vs a pure-Python md5 model: shard assignment, totals, byte counts,
    and the micro-fixed share must be cell-exact, with every shard id
    present."""
    import hashlib
    import random

    from ukrainian_ocr_pipeline_spark.operators import packing

    rng = random.Random(20260819)
    words = ["alpha", "beta", "gamma", "delta"]
    for trial in range(3):
        n_shards = rng.choice([4, 16, 25])
        rows = []
        for d in range(rng.randint(5, 40)):
            text = rng.choice(
                [None, "", "   ",
                 " ".join(rng.choice(words)
                          for _ in range(rng.randint(1, 9)))])
            rows.append((d, text))
        got = {r["shard_id"]: (r["n_docs"], r["n_tokens"], r["n_bytes"],
                               r["token_share_micro"])
               for r in packing.shard_manifest(
                   spark.createDataFrame(rows, "doc_id long, text string"),
                   n_shards=n_shards).collect()}
        model = {s: [0, 0, 0] for s in range(n_shards)}
        for d, text in rows:
            h = int(hashlib.md5(f"shard:{d}".encode()).hexdigest()[:8], 16)
            s = h % n_shards
            model[s][0] += 1
            model[s][1] += len(text.split()) if text else 0
            model[s][2] += len(text.encode()) if text else 0
        total = sum(v[1] for v in model.values())
        want = {s: (v[0], v[1], v[2],
                    (v[1] * 1_000_000 // total) if total else 0)
                for s, v in model.items()}
        assert got == want, (trial, n_shards)


def test_training_token_shards_matches_pure_python_model(spark):
    """training_token_shards == the naive model: md5 shuffle order,
    running token offsets, shard = start // budget — exercised over
    randomized corpora with NULL/empty/oversized docs."""
    import hashlib
    import random

    from ukrainian_ocr_pipeline_spark.operators import packing

    rng = random.Random(77)
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    for trial in range(4):
        budget = rng.choice([8, 32, 4096])
        rows = []
        for d in range(rng.randint(5, 60)):
            text = rng.choice(
                [None, "", "   ",
                 " ".join(rng.choice(words)
                          for _ in range(rng.randint(1, 50)))])
            rows.append((d, text))
        # a NULL key must be KEPT (folded to the '' shuffle position),
        # never dropped by the bucket join
        rows.append((None, "null keyed doc text"))
        got = {r["doc_id"]: (r["shuffle_key"], r["n_tokens"], r["shard_id"])
               for r in packing.training_token_shards(
                   spark.createDataFrame(rows, "doc_id long, text string"),
                   budget=budget).collect()}
        # md5 keys are unique here (one NULL row, distinct int keys),
        # so sorting by key alone pins the order
        keyed = sorted(
            ((hashlib.md5(
                f"shuffle:{'' if d is None else d}".encode()).hexdigest(),
              d, len(text.split()) if text else 0)
             for d, text in rows),
            key=lambda t: t[0])
        want, start = {}, 0
        for key, d, n in keyed:
            want[d] = (key, n, start // budget)
            start += n
        assert got == want, (trial, budget)
        # contiguity: shard ids are non-decreasing along shuffle order
        # and start at 0
        ids = [want[d][2] for _, d, _ in keyed]
        assert ids == sorted(ids) and (not ids or ids[0] == 0), trial


def test_curriculum_stages_equal_population_and_ordered(spark):
    """Stage cuts follow the largest-prefix rule over the distinct-score
    distribution: stage populations differ by at most the largest tie
    group, stage score ranges are disjoint and ascending, and budgets
    sum to the corpus totals."""
    from pyspark.sql import functions as F
    from ukrainian_ocr_pipeline_spark.operators import packing
    rows = [(i, round(0.1 * (i % 40), 6), 10 + i % 7) for i in range(400)]
    scored = spark.createDataFrame(
        rows, "doc_id long, score double, n_tokens long")
    out = (packing.curriculum_stages(scored, "score", n_stages=4)
           .orderBy("stage").toPandas())
    assert list(out["stage"]) == [0, 1, 2, 3]
    # 400 docs / 40 distinct scores, 10 docs per score -> exact quarters
    assert list(out["n_docs"]) == [100, 100, 100, 100]
    assert out["n_tokens"].sum() == sum(r[2] for r in rows)
    # disjoint ascending ranges: each stage's min exceeds the prior max
    for i in range(1, 4):
        assert out["min_score"][i] > out["max_score"][i - 1]


def test_curriculum_ties_share_stage_and_nulls_dropped(spark):
    """All docs with one score land in one stage even when the tie group
    straddles a cut (largest-prefix rule), and NULL scores never reach
    any stage."""
    from ukrainian_ocr_pipeline_spark.operators import packing
    # 6 docs at score 1.0, 2 at 2.0, plus a NULL: a 4-way split of 8
    # non-null docs cuts at 2/4/6, all inside the 1.0 tie group
    rows = ([(i, 1.0, 1) for i in range(6)]
            + [(10 + i, 2.0, 1) for i in range(2)]
            + [(99, None, 1)])
    scored = spark.createDataFrame(
        rows, "doc_id long, score double, n_tokens long")
    out = (packing.curriculum_stages(scored, "score", n_stages=4)
           .orderBy("stage").toPandas())
    assert out["n_docs"].sum() == 8  # the NULL row is gone
    # score 1.0 (cum_before 0 -> stage 0), score 2.0 (cum_before 6 ->
    # 6*4 div 8 = 3): ties stay together, the cut lands between groups
    assert [(r.stage, r.n_docs) for r in out.itertuples()] == [(0, 6), (3, 2)]


def test_pack_null_lang_group_matches_oracle(spark):
    """The DuckDB twin's recursive walk must not lose a NULL-lang
    group: a bare t.lang = w.lang join never recurses past that
    group's first row (NULL never equals NULL), silently dropping the
    rest — the IS NOT DISTINCT FROM join keeps parity with Spark's
    groupBy, which packs a NULL group like any other."""
    import duckdb

    from ukrainian_ocr_pipeline_spark.operators import packing
    from ukrainian_ocr_pipeline_spark.plans.registry import SQL_SEQUENCE_PACK

    rows = [(1, None, "a b c"), (2, None, "d e"), (3, None, "f"),
            (4, "en", "g h"), (5, "en", "i")]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = sorted(map(tuple, packing.sequence_pack(docs, budget=4).collect()))

    con = duckdb.connect()
    con.register("documents_df", pd.DataFrame(
        rows, columns=["doc_id", "lang", "text"]))
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_df")
    want = sorted(map(tuple, con.execute(
        SQL_SEQUENCE_PACK.replace("128", "4")).fetchall()))
    assert got == want
    # every NULL-lang doc present on both sides
    assert sum(1 for r in got if r[1] is None) == 3


class TestZOrder:
    def test_interleave_bit_exact(self, spark):
        """zkey must be the exact Morton interleave of the quantized
        coordinates (za bit b at position 2b+1, zb at 2b)."""
        from ukrainian_ocr_pipeline_spark.operators.packing import zorder_keys
        rows = [(i, float(i), float((i * 7) % 256)) for i in range(256)]
        df = spark.createDataFrame(rows, "id long, a double, b double")
        got = zorder_keys(df, "a", "b", bits=8).collect()
        for r in got:
            want = 0
            for bit in range(8):
                want |= ((r["za"] >> bit) & 1) << (2 * bit + 1)
                want |= ((r["zb"] >> bit) & 1) << (2 * bit)
            assert r["zkey"] == want

    def test_zorder_bounds_both_dims_where_sort_does_not(self, spark):
        """The layout property itself: on a uniform 2-D grid, Z-order
        file ranges bound BOTH dimensions (max span well under the full
        range), while a single-column sort leaves the secondary
        dimension at full range in every file."""
        from pyspark.sql import functions as F
        from ukrainian_ocr_pipeline_spark.operators.packing import (
            zorder_keys,
            zorder_layout_stats,
        )
        rows = [(x * 64 + y, float(x), float(y))
                for x in range(64) for y in range(64)]
        df = spark.createDataFrame(rows, "id long, a double, b double")
        stats = zorder_layout_stats(df, "a", "b", bits=8,
                                    n_files=16).collect()
        assert sum(r["n_rows"] for r in stats) == 64 * 64
        worst = max(max(r["a_max"] - r["a_min"],
                        r["b_max"] - r["b_min"]) for r in stats)
        assert worst <= 128, worst          # both dims bounded
        # the single-column-sort counterfactual: files = ranges of a
        keyed = zorder_keys(df, "a", "b", bits=8)
        by_a = (keyed.groupBy(F.floor(F.col("za") / 16).alias("f"))
                .agg((F.max("zb") - F.min("zb")).alias("bspan")).collect())
        assert min(r["bspan"] for r in by_a) > 128   # secondary dim unbounded

    def test_null_dims_yield_null_key(self, spark):
        from ukrainian_ocr_pipeline_spark.operators.packing import zorder_keys
        df = spark.createDataFrame(
            [(1, 1.0, 2.0), (2, None, 2.0), (3, 1.0, None)],
            "id long, a double, b double")
        got = {r["id"]: r["zkey"] for r in
               zorder_keys(df, "a", "b").collect()}
        assert got[1] is not None and got[2] is None and got[3] is None


def test_zorder_bits_validated(spark):
    import pytest
    from ukrainian_ocr_pipeline_spark.operators.packing import zorder_keys
    df = spark.createDataFrame([(1, 1.0, 2.0)], "id long, a double, b double")
    for bad in (0, -1, 32):
        with pytest.raises(ValueError):
            zorder_keys(df, "a", "b", bits=bad)


def test_zorder_layout_n_files_validated(spark):
    import pytest
    from ukrainian_ocr_pipeline_spark.operators.packing import (
        zorder_layout_stats,
    )
    df = spark.createDataFrame([(1, 1.0, 2.0)], "id long, a double, b double")
    # out-of-range counts fail at plan-build time (span at bits=8 is
    # 65536, so 100k planned files exceeds the key space)
    for bad in (100_000, 0):
        with pytest.raises(ValueError):
            zorder_layout_stats(df, "a", "b", bits=8, n_files=bad)
    # n_files above int32 passes the span bound at bits=31 but would
    # wrap the int-cast file_id — must be rejected too
    with pytest.raises(ValueError):
        zorder_layout_stats(df, "a", "b", bits=31, n_files=1 << 32)


def test_zorder_layout_non_divisor_n_files(spark):
    """Non-divisor n_files are supported again (r4 ADVICE): exact
    integer `div` where the multiply fits BIGINT, clamped double math
    at extreme bits — every file_id stays in [0, n_files) and every
    row is counted exactly once on both paths."""
    from ukrainian_ocr_pipeline_spark.operators.packing import (
        zorder_layout_stats,
    )
    df = spark.createDataFrame(
        [(i, float(i), float(100 - i)) for i in range(100)],
        "id long, a double, b double")
    for bits, n_files in ((8, 10), (8, 7), (31, 10)):
        stats = zorder_layout_stats(df, "a", "b",
                                    bits=bits, n_files=n_files).collect()
        assert stats, (bits, n_files)
        assert sum(r["n_rows"] for r in stats) == 100
        for r in stats:
            assert 0 <= r["file_id"] < n_files, (bits, n_files, r)


def test_zorder_layout_no_bigint_wrap_at_high_bits(spark):
    """bits=31 drives zkey to ~2^62; the multiply form floor(zkey *
    n_files / span) wraps BIGINT and yields negative file_ids.  The
    divide-first form must keep every file_id in [0, n_files)."""
    from ukrainian_ocr_pipeline_spark.operators.packing import (
        zorder_layout_stats,
    )
    df = spark.createDataFrame(
        [(i, float(i), float(100 - i)) for i in range(100)],
        "id long, a double, b double")
    stats = zorder_layout_stats(df, "a", "b", bits=31, n_files=16).collect()
    assert stats, "expected at least one planned file"
    for r in stats:
        assert 0 <= r["file_id"] < 16, r
