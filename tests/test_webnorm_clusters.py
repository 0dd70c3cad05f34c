"""Unit tests for the round-3 web-hygiene operators: URL
canonicalization, PII redaction, repetition signals, and near-dup
cluster assignment (connected components)."""

from pyspark.sql import Row, functions as F

from ukrainian_ocr_pipeline_spark.operators import dedup, textstats, webnorm


# ---------------------------------------------------------------- URLs

URL_CASES = [
    # (raw, canonical)
    ("HTTPS://WWW.News.Example.ORG/a/b/?utm_source=x&ref=t#frag",
     "https://news.example.org/a/b?ref=t"),
    ("http://example.com/path?b=2&a=1",          # params sorted
     "http://example.com/path?a=1&b=2"),
    ("https://example.com/?utm_a=1&utm_b=2",     # all params stripped
     "https://example.com"),
    ("https://example.com",                      # no path at all
     "https://example.com"),
    ("https://wwwx.example.com/p",               # wwwx is NOT a www prefix
     "https://wwwx.example.com/p"),
    ("https://example.com/p#only-fragment",
     "https://example.com/p"),
    # SPA-style fragment route: the '?' lives INSIDE the fragment and
    # must be dropped with it, never resurrected as query params
    ("https://example.com/p#/search?q=x&utm_source=t",
     "https://example.com/p"),
    ("https://example.com/p?a=1#/route?b=2",
     "https://example.com/p?a=1"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([Row(url=r) for r, _ in URL_CASES])
    got = [r[0] for r in
           df.select(webnorm.canonical_url("url")).collect()]
    assert got == [c for _, c in URL_CASES]


def test_url_dedup_groups_collapses_variants(spark):
    rows = [
        Row(doc_id=1, url="https://a.com/x?utm_s=1"),
        Row(doc_id=2, url="HTTPS://A.com/x/"),
        Row(doc_id=3, url="https://www.a.com/x#f"),
        Row(doc_id=4, url="https://b.com/y"),
    ]
    out = {r["canonical_url"]: r for r in
           webnorm.url_dedup_groups(spark.createDataFrame(rows)).collect()}
    assert out["https://a.com/x"]["n_variants"] == 3
    assert out["https://a.com/x"]["n_distinct_raw"] == 3
    assert out["https://a.com/x"]["keeper_doc_id"] == 1
    assert out["https://b.com/y"]["n_variants"] == 1


# ---------------------------------------------------------------- PII

def test_pii_redact_counts_and_tail(spark):
    rows = [
        Row(doc_id=1, text="mail me at a.b+c@x-y.example.com or 10.0.0.1 now"),
        Row(doc_id=2, text="no pii here"),
        Row(doc_id=3, text="two 1.2.3.4 addrs 255.255.255.255"),
        Row(doc_id=4, text="a@b.co"),  # shorter than the 48-char tail
    ]
    out = {r["doc_id"]: r for r in
           webnorm.pii_redact(spark.createDataFrame(rows)).collect()}
    assert (out[1]["n_emails"], out[1]["n_ips"]) == (1, 1)
    assert (out[2]["n_emails"], out[2]["n_ips"]) == (0, 0)
    assert out[3]["n_ips"] == 2
    # redaction really replaced the text
    assert out[1]["redacted_tail"].endswith("<EMAIL> or <IP> now")
    # tail clamp on strings shorter than 48 chars returns the whole string
    assert out[4]["redacted_tail"] == "<EMAIL>"
    assert out[4]["redacted_len"] == len("<EMAIL>")


def test_pii_redact_ip_consumed_by_email_not_double_counted(spark):
    """An IPv4-shaped substring inside an email local part is scrubbed
    by the email rule; n_ips must reflect the post-email text (what the
    IP rule actually replaced), not the raw text."""
    rows = [Row(doc_id=1, text="contact 1.2.3.4b@x.com please")]
    r = webnorm.pii_redact(spark.createDataFrame(rows)).collect()[0]
    assert r["n_emails"] == 1
    assert r["n_ips"] == 0
    assert r["redacted_tail"] == "contact <EMAIL> please"


# ------------------------------------------------------- repetition

def test_repetition_signals_crafted(spark):
    rows = [
        Row(doc_id=1, text="spam spam spam spam eggs"),   # repetitive
        Row(doc_id=2, text="one two three four five"),    # diverse
        Row(doc_id=3, text="solo"),                       # no bigrams
    ]
    out = {r["doc_id"]: r for r in
           textstats.repetition_signals(spark.createDataFrame(rows)).collect()}
    r1 = out[1]
    assert (r1["n_tokens"], r1["n_types"]) == (5, 2)
    assert r1["top_word_frac"] == 0.8
    # "spam spam" occurs 3x of 4 bigrams; only it is duplicated
    assert r1["top_bigram_frac"] == 0.75
    assert r1["dup_bigram_frac"] == 0.75
    assert r1["flag_repetitive"]
    r2 = out[2]
    # all-unique bigrams: top fraction is the degenerate 1/(n-1) but the
    # duplicate-bigram mass (the flag input) is exactly 0
    assert r2["type_token_r"] == 1.0
    assert r2["top_bigram_frac"] == 0.25
    assert r2["dup_bigram_frac"] == 0.0
    assert not r2["flag_repetitive"]
    r3 = out[3]
    assert r3["n_tokens"] == 1 and r3["top_bigram_frac"] == 0.0


# ---------------------------------------------------- cluster assign

def _pairs(spark, edges):
    return spark.createDataFrame(
        [Row(doc_a=a, doc_b=b) for a, b in edges])


def test_cluster_assign_components(spark):
    # chain 1-2-3-4 (diameter 3), triangle 10-11-12, pair 20-21
    out = dedup.cluster_assign(_pairs(spark, [
        (1, 2), (2, 3), (3, 4),
        (10, 11), (11, 12), (10, 12),
        (20, 21),
    ]))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert {d: r["cluster_id"] for d, r in rows.items()} == {
        1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    assert rows[4]["cluster_size"] == 4
    assert rows[12]["cluster_size"] == 3
    assert [d for d, r in sorted(rows.items()) if r["is_keeper"]] == [1, 10, 20]


def test_cluster_assign_long_chain_converges(spark):
    # a 9-vertex chain needs 8 propagation rounds — exercises the loop
    out = dedup.cluster_assign(_pairs(spark, [(i, i + 1) for i in range(9)]))
    assert set(r["cluster_id"] for r in out.collect()) == {0}
    assert out.count() == 10


def test_cluster_assign_raises_without_convergence(spark):
    import pytest
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.cluster_assign(_pairs(spark, [(i, i + 1) for i in range(9)]),
                             max_iter=2)


def test_cluster_assign_star_components(spark):
    # same graph as the label-propagation test: output must be identical
    out = dedup.cluster_assign_star(_pairs(spark, [
        (1, 2), (2, 3), (3, 4),
        (10, 11), (11, 12), (10, 12),
        (20, 21),
    ]))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert {d: r["cluster_id"] for d, r in rows.items()} == {
        1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    assert rows[4]["cluster_size"] == 4
    assert rows[12]["cluster_size"] == 3
    assert [d for d, r in sorted(rows.items()) if r["is_keeper"]] == [1, 10, 20]


def test_cluster_assign_star_chain_logarithmic(spark):
    # a 33-vertex chain: label propagation needs 32 rounds; star
    # contraction must finish within ~log2(n) round pairs — the whole
    # point of the variant.  8 rounds is the generous ceiling.
    out = dedup.cluster_assign_star(
        _pairs(spark, [(i, i + 1) for i in range(32)]), max_iter=8)
    rows = out.collect()
    assert set(r["cluster_id"] for r in rows) == {0}
    assert len(rows) == 33
    assert sum(r["is_keeper"] for r in rows) == 1


def test_cluster_assign_star_matches_label_propagation(spark):
    # deterministic scrambled graph (multi-component, shared edges in
    # both orientations, a self-loop): both algorithms must agree
    edges = [(7, 3), (3, 9), (9, 7), (14, 2), (2, 25), (40, 41),
             (41, 40), (5, 5), (5, 6), (30, 31), (31, 32), (32, 33),
             (33, 30), (99, 1)]
    a = dedup.cluster_assign(_pairs(spark, edges))
    b = dedup.cluster_assign_star(_pairs(spark, edges))
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb


def test_cluster_assign_star_self_loop_only_vertex_kept(spark):
    # contract parity with cluster_assign: a vertex whose ONLY pair is
    # a self-loop still gets its singleton-keeper row
    for fn in (dedup.cluster_assign, dedup.cluster_assign_star):
        rows = sorted(map(tuple, fn(_pairs(spark, [(7, 7), (1, 2)]))
                          .collect()))
        assert rows == [(1, 1, 2, True), (2, 1, 2, False),
                        (7, 7, 1, True)], fn.__name__


def test_cluster_assign_star_raises_without_convergence(spark):
    import pytest
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.cluster_assign_star(
            _pairs(spark, [(i, i + 1) for i in range(32)]), max_iter=1)


# ------------------------------------------------- incremental dedup

def test_incremental_dedup_statuses(spark):
    """All three statuses pinned on synthetic rows (the corpus has no
    exact duplicates below sf0.1, so branch semantics must be proven
    here, not just via the oracle twin)."""
    existing = spark.createDataFrame([
        Row(doc_id=1, text="alpha beta"),
        Row(doc_id=2, text="gamma delta"),
    ])
    incoming = spark.createDataFrame([
        Row(doc_id=10, text="ALPHA   beta "),   # canon-equal to doc 1
        Row(doc_id=11, text="epsilon zeta"),    # genuinely new
        Row(doc_id=12, text="epsilon  zeta"),   # batch dup of 11
        Row(doc_id=13, text="eta theta"),       # new, unique
    ])
    out = {r["doc_id"]: r["status"] for r in
           dedup.incremental_dedup(existing, incoming).collect()}
    assert out == {10: "dup_of_existing", 11: "new",
                   12: "dup_within_batch", 13: "new"}


def test_incremental_dedup_null_text_hashes_as_empty(spark):
    """NULL text is content-identical to empty text by definition: the
    pinned semantics are one shared digest (never NULL propagation,
    which would drop rows from the oracle's hash join)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("text", StringType())])
    existing = spark.createDataFrame([(1, "alpha")], schema)
    incoming = spark.createDataFrame(
        [(10, None), (11, ""), (12, None), (13, "beta")], schema)
    out = {r["doc_id"]: r["status"] for r in
           dedup.incremental_dedup(existing, incoming).collect()}
    # 10 is the batch keeper of the empty-content group; 11 and 12 are
    # its batch dups; nothing joins to existing
    assert out == {10: "new", 11: "dup_within_batch",
                   12: "dup_within_batch", 13: "new"}


def test_cross_doc_shingle_stats_crafted(spark):
    docs = spark.createDataFrame([
        Row(doc_id=1, text="a b c d e f"),      # shares "a b c d e" with 2
        Row(doc_id=2, text="a b c d e x"),
        Row(doc_id=3, text="p q r s t u"),      # fully unique
    ])
    out = {r["doc_id"]: r for r in
           dedup.cross_doc_shingle_stats(docs, k=5).collect()}
    # 6 words -> 2 distinct 5-shingles each
    assert out[1]["n_shingles"] == 2 and out[1]["n_shared"] == 1
    assert out[1]["shared_frac"] == 0.5
    assert out[3]["n_shared"] == 0 and out[3]["shared_frac"] == 0.0


def test_line_dedup_crafted(spark):
    """Boilerplate census, ordered reassembly, blank-line and NULL-text
    handling, and the all-lines-removed document — none of which the
    sf corpus (single-line docs, no NULLs) can exercise."""
    boiler = "All rights reserved"
    docs = spark.createDataFrame([
        Row(doc_id=1, text=f"unique one\n\n{boiler}"),     # blank kept
        Row(doc_id=2, text=f"{boiler}\nunique two"),
        Row(doc_id=3, text=f"  {boiler}  "),               # trimmed match;
        Row(doc_id=4, text=None),                          # -> all removed
        Row(doc_id=5, text="unique five"),
    ])
    out = {r["doc_id"]: r for r in dedup.line_dedup(docs).collect()}
    assert len(out) == 5                       # every doc keeps its row
    # the boilerplate line appears in 3 distinct docs -> removed from all
    assert out[1]["clean_text"] == "unique one\n"   # blank line survives
    assert (out[1]["n_lines"], out[1]["n_removed"]) == (3, 1)
    assert out[2]["clean_text"] == "unique two"
    assert out[3]["clean_text"] == ""          # all content removed
    assert (out[3]["n_lines"], out[3]["n_removed"]) == (1, 1)
    assert out[4]["clean_text"] == ""          # NULL text == empty text
    assert (out[4]["n_lines"], out[4]["n_removed"]) == (1, 0)
    assert out[5]["clean_text"] == "unique five"


def test_line_dedup_threshold_boundary(spark):
    """min_docs is a >= cutoff on DISTINCT documents: a line repeated
    three times inside ONE doc stays; the same line across three docs
    goes."""
    docs = spark.createDataFrame([
        Row(doc_id=1, text="x\nx\nx\nkeep me"),
        Row(doc_id=2, text="y"), Row(doc_id=3, text="y"),
        Row(doc_id=4, text="y"),
    ])
    out = {r["doc_id"]: r for r in dedup.line_dedup(docs).collect()}
    assert out[1]["n_removed"] == 0 and out[1]["clean_text"].count("x") == 3
    assert all(out[i]["clean_text"] == "" and out[i]["n_removed"] == 1
               for i in (2, 3, 4))


def test_host_cap_sample_two_stage_equals_naive_window(spark):
    """The salted two-stage top-K must select EXACTLY the rows the
    naive one-window form selects — on a skewed input where one host
    far exceeds salt_buckets * cap (stage-1 pruning genuinely fires)
    and another sits below the cap (no pruning at all)."""
    from pyspark.sql import Window

    rows = ([Row(doc_id=i, host="mega.example.org") for i in range(500)]
            + [Row(doc_id=1000 + i, host="tiny.example.org")
               for i in range(3)])
    pages = spark.createDataFrame(rows)
    got = {(r["host"], r["doc_id"], r["sample_rank"]) for r in
           webnorm.host_cap_sample(pages, cap=4, salt_buckets=4).collect()}

    h = F.conv(F.substring(F.md5(F.concat(
        F.lit("hostcap:"), F.col("doc_id").cast("string")).cast("binary")),
        1, 8), 16, 10).cast("bigint")
    w = Window.partitionBy("host").orderBy(h, "doc_id")
    want = {(r["host"], r["doc_id"], r["sample_rank"]) for r in
            pages.withColumn("sample_rank", F.row_number().over(w))
                 .where(F.col("sample_rank") <= 4).collect()}
    assert got == want
    # tiny host keeps all 3 rows; mega host exactly cap rows
    assert sum(1 for t in got if t[0] == "tiny.example.org") == 3
    assert sum(1 for t in got if t[0] == "mega.example.org") == 4


# ------------------------------------------- duplicated passages

def test_duplicated_passages_crafted(spark):
    """Overlapping dup grams merge into one maximal range per doc; a
    doc with no cross-doc gram yields nothing; within-doc-only repeats
    are NOT flagged (distinct-doc threshold)."""
    docs = spark.createDataFrame([
        Row(doc_id=0, text="a b c d e f g x"),
        Row(doc_id=1, text="z a b c d e f g"),
        Row(doc_id=2, text="q r s t u v"),
        # within-doc repeat only: gram appears twice in doc 3, nowhere else
        Row(doc_id=3, text="p1 p2 p3 p4 p5 w p1 p2 p3 p4 p5"),
        Row(doc_id=4, text=None),
    ])
    rows = sorted(map(tuple, dedup.duplicated_passages(docs).collect()))
    assert rows == [(0, 0, 6, 7),   # starts {0,1,2} merge -> words 0..6
                    (1, 1, 7, 7)]   # starts {1,2,3} merge -> words 1..7


def test_duplicated_passages_disjoint_ranges(spark):
    """Two shared passages separated by uncovered words stay two
    ranges; adjacent-but-distinct covered runs merge."""
    docs = spark.createDataFrame([
        Row(doc_id=0, text="a b c d e gap1 gap2 m n o p q"),
        Row(doc_id=1, text="a b c d e xx yy m n o p q"),
    ])
    rows = sorted(map(tuple, dedup.duplicated_passages(docs).collect()))
    assert rows == [(0, 0, 4, 5), (0, 7, 11, 5),
                    (1, 0, 4, 5), (1, 7, 11, 5)]


def test_duplicated_passages_min_docs_threshold(spark):
    docs = spark.createDataFrame([
        Row(doc_id=i, text="common one two three four tail%d" % i)
        for i in range(3)
    ])
    # the shared 5-gram sits in 3 docs: min_docs=3 keeps it, 4 drops it
    assert dedup.duplicated_passages(docs, min_docs=3).count() == 3
    assert dedup.duplicated_passages(docs, min_docs=4).count() == 0


def test_dup_passage_excise_owner_keeps_copy(spark):
    """The min-doc_id owner keeps the passage; every other doc loses
    exactly the covered words; untouched docs pass through canonical."""
    docs = spark.createDataFrame([
        Row(doc_id=0, text="a b c d e tail0"),
        Row(doc_id=1, text="head1  A B c d E  tail1"),  # canon-equal gram
        Row(doc_id=2, text="solo words only here now"),
        Row(doc_id=3, text=None),
    ])
    rows = {r["doc_id"]: r for r in dedup.dup_passage_excise(docs).collect()}
    assert (rows[0]["n_removed_words"], rows[0]["clean_text"]) == \
        (0, "a b c d e tail0")
    assert (rows[1]["n_removed_words"], rows[1]["clean_text"]) == \
        (5, "head1 tail1")
    assert (rows[2]["n_removed_words"], rows[2]["clean_text"]) == \
        (0, "solo words only here now")
    assert (rows[3]["n_removed_words"], rows[3]["clean_text"]) == (0, "")


def test_dup_passage_excise_full_removal_and_counts(spark):
    """A non-owner doc that is ONE shared passage end-to-end empties;
    n_removed_words counts distinct covered positions, not gram hits."""
    docs = spark.createDataFrame([
        Row(doc_id=0, text="w1 w2 w3 w4 w5 w6"),
        Row(doc_id=1, text="w1 w2 w3 w4 w5 w6"),
    ])
    rows = {r["doc_id"]: r for r in dedup.dup_passage_excise(docs).collect()}
    assert (rows[0]["n_removed_words"], rows[0]["clean_text"]) == \
        (0, "w1 w2 w3 w4 w5 w6")
    assert (rows[1]["n_removed_words"], rows[1]["clean_text"]) == (6, "")


def test_dup_passage_excise_mixed_ownership(spark):
    """Two passages with different owners: each doc keeps what it owns
    and loses what it doesn't."""
    docs = spark.createDataFrame([
        # doc 0 owns p-gram (both contain it; 0 is min); doc 1 owns
        # nothing it shares with 2... construct: p shared 0&2, q shared 1&2
        Row(doc_id=0, text="p1 p2 p3 p4 p5"),
        Row(doc_id=1, text="q1 q2 q3 q4 q5"),
        Row(doc_id=2, text="p1 p2 p3 p4 p5 mid q1 q2 q3 q4 q5"),
    ])
    rows = {r["doc_id"]: r for r in dedup.dup_passage_excise(docs).collect()}
    assert rows[0]["clean_text"] == "p1 p2 p3 p4 p5"   # owner of p
    assert rows[1]["clean_text"] == "q1 q2 q3 q4 q5"   # owner of q
    assert (rows[2]["n_removed_words"], rows[2]["clean_text"]) == (10, "mid")


def test_dup_passage_excise_overlap_chain_passage_survives(spark):
    """Overlapping dup grams with DIFFERENT owners must not cascade a
    passage out of the corpus: a position is excised only when every
    covering dup gram is foreign, so each owner keeps its passage."""
    docs = spark.createDataFrame([
        Row(doc_id=0, text="x a b c d e"),
        Row(doc_id=1, text="a b c d e f"),
        Row(doc_id=2, text="b c d e f g"),
    ])
    rows = {r["doc_id"]: r for r in dedup.dup_passage_excise(docs).collect()}
    assert (rows[0]["n_removed_words"], rows[0]["clean_text"]) == \
        (0, "x a b c d e")
    # doc 1 owns 'b c d e f': it loses only position 0 ('a', covered
    # solely by doc 0's gram) and its owned passage survives contiguous
    assert (rows[1]["n_removed_words"], rows[1]["clean_text"]) == \
        (1, "b c d e f")
    assert (rows[2]["n_removed_words"], rows[2]["clean_text"]) == (5, "g")


def test_dup_passage_excise_preserves_case_and_untouched_text(spark):
    """Matching is case-insensitive but rewriting must keep source
    casing, and untouched docs pass through VERBATIM (newlines and
    original spacing intact)."""
    docs = spark.createDataFrame([
        Row(doc_id=0, text="Shared Words One Two Three tail0 the body0"),
        Row(doc_id=1, text="shared words ONE two THREE tail1 the body1"),
        Row(doc_id=2, text="Untouched Doc\nWith Newlines  and   Spacing"),
    ])
    rows = {r["doc_id"]: r for r in dedup.dup_passage_excise(docs).collect()}
    # doc 0 owns the gram: verbatim pass-through, original casing
    assert rows[0]["clean_text"] == \
        "Shared Words One Two Three tail0 the body0"
    # doc 1 is excised; the surviving words keep THEIR original case
    assert (rows[1]["n_removed_words"], rows[1]["clean_text"]) == \
        (5, "tail1 the body1")
    # untouched doc: byte-identical, newlines and double spaces intact
    assert rows[2]["clean_text"] == \
        "Untouched Doc\nWith Newlines  and   Spacing"


def test_dup_passage_excise_randomized_invariants(spark):
    """Randomized micro-corpora (tiny vocab -> heavy gram collisions,
    isolated per corpus by token prefixes so ONE Spark run covers all):
    the invariants that must hold under ANY input —
      (1) every cross-doc duplicated 5-gram survives contiguously in at
          least one document's clean_text (the keep-one-copy guarantee
          whose violation a review round actually caught),
      (2) n_removed_words == token count lost between original and
          clean_text,
      (3) a doc owning every gram that covers it passes through
          verbatim."""
    import random

    rng = random.Random(20260818)
    corpora = {}
    rows = []
    doc_id = 0
    for k in range(12):
        vocab = [f"c{k}w{i}" for i in range(rng.randint(3, 6))]
        docs = []
        for _ in range(rng.randint(2, 5)):
            n = rng.randint(0, 14)
            docs.append((doc_id,
                         " ".join(rng.choice(vocab) for _ in range(n))))
            doc_id += 1
        corpora[k] = docs
        rows.extend(docs)
    out = {r["doc_id"]: r for r in dedup.dup_passage_excise(
        spark.createDataFrame(rows, "doc_id long, text string")).collect()}

    K = 5
    for k, docs in corpora.items():
        toks = {d: t.split() if t else [] for d, t in docs}
        grams = {}
        for d, ws in toks.items():
            for i in range(len(ws) - K + 1):
                grams.setdefault(tuple(ws[i:i + K]), set()).add(d)
        dup_grams = {g: ds for g, ds in grams.items() if len(ds) >= 2}
        clean_toks = {d: out[d]["clean_text"].split() if out[d]["clean_text"]
                      else [] for d, _ in docs}
        for d, ws in toks.items():
            # (2) removal accounting
            assert out[d]["n_removed_words"] == len(ws) - len(clean_toks[d])
            # (3) untouched docs verbatim
            if out[d]["n_removed_words"] == 0:
                assert out[d]["clean_text"] == dict(docs)[d]
        for g in dup_grams:
            # (1) the passage survives contiguously somewhere
            joined = " ".join(g)
            assert any(joined in " ".join(clean_toks[d])
                       for d in dup_grams[g]), (k, g)


def test_cluster_assign_star_randomized_equivalence(spark):
    """Random multigraphs (self-loops, duplicate and reversed edges,
    skewed components): star contraction and label propagation must
    emit identical (doc_id, cluster_id, cluster_size, is_keeper) rows,
    and the clustering must equal a pure-Python union-find."""
    import random

    rng = random.Random(73)
    for trial in range(4):
        n = rng.randint(6, 18)
        edges = [(rng.randrange(n), rng.randrange(n))
                 for _ in range(rng.randint(n // 2, 2 * n))]
        a = sorted(map(tuple,
                       dedup.cluster_assign(_pairs(spark, edges),
                                            max_iter=40).collect()))
        b = sorted(map(tuple,
                       dedup.cluster_assign_star(
                           _pairs(spark, edges)).collect()))
        assert a == b, (trial, edges)

        # pure-Python union-find oracle
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edges:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        want = {}
        for x in parent:
            want.setdefault(find(x), set()).add(x)
        got = {}
        for doc, cid, size, keeper in b:
            got.setdefault(cid, set()).add(doc)
            assert keeper == (doc == cid)
            assert size == len(want[find(doc)])
        assert got == {min(m): m for m in want.values()}, (trial, edges)


def test_cluster_keepers_by_quality(spark):
    """The keeper moves to the longest-text member (ties -> min
    doc_id); cluster names/sizes stay the component minimum; exactly
    one keeper per cluster."""
    clusters = dedup.cluster_assign_star(_pairs(spark, [(1, 2), (2, 3),
                                                        (10, 11)]))
    docs = spark.createDataFrame(
        [(1, "short"), (2, "the longest text in cluster one"),
         (3, "mid length"), (10, "same"), (11, "sama")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            dedup.cluster_keepers_by_quality(clusters, docs).collect()}
    assert [d for d, r in sorted(rows.items()) if r["is_keeper"]] == [2, 10]
    assert rows[2]["cluster_id"] == 1 and rows[2]["cluster_size"] == 3
    assert rows[10]["is_keeper"] and not rows[11]["is_keeper"]  # tie->min
    assert rows[1]["n_chars"] == 5


# ------------------------------------------------- host blocklist gate

def test_host_suffixes_shapes(spark):
    rows = [Row(doc_id=1, host="a.b.c"), Row(doc_id=2, host="solo"),
            Row(doc_id=3, host="cdn.ads.example")]
    got = {r["doc_id"]: r["s"] for r in
           spark.createDataFrame(rows)
           .select("doc_id", webnorm.host_suffixes("host").alias("s"))
           .collect()}
    assert got[1] == ["a.b.c", "b.c", "c"]
    assert got[2] == ["solo"]
    assert got[3] == ["cdn.ads.example", "ads.example", "example"]


def test_validated_blocklist_folds_and_rejects():
    import pytest
    assert webnorm.validated_blocklist(["Ads.Example", "ads.example",
                                        "x.y"]) == ["ads.example", "x.y"]
    for bad in [[], ["two words"], [".leading.dot"], ["trailing.dot."],
                ["inner..empty"], [""], ["http://x.com"], ["x.com/path"],
                # no port / query / fragment / creds: these can never
                # equal a host suffix, so accepting them would make the
                # entry silently block nothing
                ["x.com:443"], ["x.com?utm=1"], ["x.com#frag"],
                ["user@x.com"]]:
        with pytest.raises(ValueError):
            webnorm.validated_blocklist(bad)


def test_host_blocklist_filter_semantics(spark):
    pages = spark.createDataFrame(
        [(1, "shop.ads.example"),       # parent-domain block
         (2, "ads.example"),            # exact block
         (3, "notads.example"),         # 'ads.example' is NOT a suffix
         (4, "safe.example.net"),       # miss
         (5, "a.b.tracker.io"),         # deep parent block
         (6, "Shop.Ads.Example"),       # mixed case must still match
         (7, "ads.example:8443"),       # port must not defeat the match
         (8, "ads.example.")],          # trailing dot (FQDN form)
        ["doc_id", "host"])
    bl = spark.createDataFrame([("ads.example",), ("tracker.io",)],
                               ["entry"])
    got = {r["doc_id"]: (r["blocked"], r["matched_suffix"]) for r in
           webnorm.host_blocklist_filter(pages, bl).collect()}
    assert got == {1: (True, "ads.example"), 2: (True, "ads.example"),
                   3: (False, None), 4: (False, None),
                   5: (True, "tracker.io"),
                   6: (True, "ads.example"), 7: (True, "ads.example"),
                   8: (True, "ads.example")}
    # every input page comes back exactly once (explode_outer keeps
    # pages whose suffix set matches nothing)
    assert len(got) == 8
    # the gate form agrees with the filter form on the blocked set and
    # carries no full-corpus groupBy (it only distincts matched rows)
    gate = {r["doc_id"] for r in
            webnorm.host_blocklist_blocked_ids(pages, bl).collect()}
    assert gate == {k for k, (b, _) in got.items() if b}


def test_host_diversity_stats_values(spark):
    import math
    pages = spark.createDataFrame(
        [("en", "h1"), ("en", "h1"), ("en", "h2"), ("de", "h3")],
        ["lang", "host"])
    got = {r["lang"]: r.asDict() for r in
           webnorm.host_diversity_stats(pages).collect()}
    assert got["de"] == {"lang": "de", "n_docs": 1, "n_hosts": 1,
                         "top_host_share_micro": 1000000,
                         "host_entropy_micro": 0}
    want_ent = (math.floor(-(2 / 3) * math.log(2 / 3) * 1e6)
                + math.floor(-(1 / 3) * math.log(1 / 3) * 1e6))
    assert got["en"] == {"lang": "en", "n_docs": 3, "n_hosts": 2,
                         "top_host_share_micro": 666666,
                         "host_entropy_micro": want_ent}


def test_outlink_host_edges_semantics(spark):
    """href extraction: both quote styles + uppercase HREF matched;
    relative and non-http links dropped; hosts canonicalized on both
    ends (www/case fold); repeated pairs aggregate; self-edges via
    absolute URLs kept."""
    pages = spark.createDataFrame(
        [("http://www.A.example/p1",
          '<a href="https://B.example/x">1</a> '
          '<A HREF=\'http://www.b.example/y\'>2</A> '
          '<a href="/rel">3</a> <a href="ftp://c.example/z">4</a>'),
         ("https://b.example/p2",
          '<a href="http://b.example/self">5</a> unquoted href=nope'),
         ("https://empty.example/p3", "no links at all"),
         # schemeless / NULL source urls canonicalize to ''/NULL and
         # must not inject a phantom node into the graph
         ("page.html", '<a href="https://b.example/x">bad-src</a>'),
         (None, '<a href="https://b.example/x">null-src</a>')],
        ["url", "html"])
    got = {(r["src_host"], r["dst_host"]): r["n_links"] for r in
           webnorm.outlink_host_edges(pages).collect()}
    # a.example -> b.example twice (quote styles + www/case variants
    # collapse to one canonical pair)
    assert got == {("a.example", "b.example"): 2,
                   ("b.example", "b.example"): 1}


def test_host_pagerank_hub_ranks_top_and_mass_conserved(spark):
    """The composed crawl-rank query: every fixture page links to
    hub.example (some twice), so it must out-rank every per-source CDN
    host; total rank mass stays 1 (the operator's conservation
    invariant survives the composition and the host->id mapping)."""
    from ukrainian_ocr_pipeline_spark.plans.registry import q_host_pagerank
    rows = q_host_pagerank(spark, "/root/testdata/sf0.001").collect()
    ranks = {r["host"]: r["pr_rank_r"] for r in rows}
    assert len(ranks) == len(rows)  # the 32-bit host ids collide on
    # nothing at fixture scale (distinct host -> distinct row)
    top = max(ranks, key=ranks.get)
    assert top == "hub.example"
    assert abs(sum(ranks.values()) - 1.0) < 1e-4


def test_canonical_link_dedup_semantics(spark):
    """Declared-canonical dedup: both attribute orders collapse onto
    the declared target; relative and missing declarations fall back
    to the canonicalized fetch URL; n_declared counts only real
    absolute declarations."""
    pages = spark.createDataFrame(
        [(1, "https://a.com/article?utm_s=1",
          '<link rel="canonical" href="https://a.com/canonical">'),
         (2, "https://www.A.com/amp/article",
          "<LINK HREF='https://a.com/canonical' REL='canonical'>"),
         (3, "https://a.com/other",
          '<link rel="canonical" href="/relative/target">'),  # fallback
         (4, "https://a.com/plain", "<html>no link</html>"),  # fallback
         (5, "https://a.com/canonical", "<html>no link</html>")],
        ["doc_id", "url", "html"])
    got = {r["canonical_url"]: (r["n_variants"], r["n_declared"],
                                r["keeper_doc_id"]) for r in
           webnorm.canonical_link_dedup(pages).collect()}
    # docs 1+2 declare the target, doc 5 IS the target by fetch URL —
    # all three collapse; only 2 of the 3 variants declared it
    assert got["https://a.com/canonical"] == (3, 2, 1)
    assert got["https://a.com/other"] == (1, 0, 3)
    assert got["https://a.com/plain"] == (1, 0, 4)
    assert len(got) == 3


def test_html_metadata_semantics(spark):
    """og:title beats <title>; both attribute orders work for every
    meta pattern; titles are whitespace-normalized; noindex detected in
    both orders; markup-opening titles yield '' (scan-speed convention)."""
    pages = spark.createDataFrame(
        [(1, "https://WWW.A.com/x",
          '<head><title>Site | Page</title>'
          '<meta property="og:title" content="Real  Title"></head>'),
         (2, "https://a.com/y",
          "<META CONTENT='Reversed Title' PROPERTY='og:title'>"),
         (3, "https://a.com/z",
          "<title>\n  Wrapped\n   Title </title>"
          '<meta name="description" content=" A   desc ">'),
         (4, "https://a.com/n",
          '<title>Hidden</title>'
          "<meta name='robots' content='noindex, nofollow'>"),
         (5, "https://a.com/n2",
          '<title>Hidden2</title>'
          '<META CONTENT="NOINDEX" NAME="robots">'),
         (6, "https://a.com/bare", "<html><body>no metadata</body></html>"),
         (7, "https://a.com/nested", "<title><b>Bold</b></title>")],
        ["doc_id", "url", "html"])
    got = {r["doc_id"]: r for r in
           webnorm.html_metadata(pages).collect()}
    assert got[1]["title"] == "Real Title" and got[1]["has_og_title"]
    assert got[1]["host"] == "a.com"
    assert got[2]["title"] == "Reversed Title" and got[2]["has_og_title"]
    assert got[3]["title"] == "Wrapped Title" and not got[3]["has_og_title"]
    assert got[3]["description"] == "A desc"
    assert got[4]["noindex"] and got[5]["noindex"]
    assert not got[1]["noindex"] and not got[3]["noindex"]
    assert got[6]["title"] == "" and got[6]["description"] == ""
    assert got[7]["title"] == ""  # nested markup: no parser at scan speed


def test_title_dup_groups_gate_and_exclusions(spark):
    """Same (host, title) pairs group; noindex and empty-title pages
    are excluded BEFORE grouping; singleton groups are dropped."""
    mk = lambda i, host, title, extra="": (
        i, f"https://{host}/p{i}",
        f"<title>{title}</title>{extra}")
    pages = spark.createDataFrame(
        [mk(1, "a.com", "Story One"),
         mk(2, "WWW.A.com", "Story  One"),          # ws + host variants
         mk(3, "a.com", "Story One",
            "<meta name='robots' content='noindex'>"),  # excluded
         mk(4, "b.com", "Story One"),               # other host: no group
         mk(5, "a.com", "Unique"),                  # singleton: dropped
         (6, "https://a.com/e", "<html>no title</html>"),
         (7, "https://a.com/e2", "<html>no title</html>")],
        ["doc_id", "url", "html"])
    got = webnorm.title_dup_groups(pages).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["host"], r["title"], r["n_docs"], r["keeper_doc_id"]) == \
        ("a.com", "Story One", 2, 1)


def test_anchor_text_terms_semantics(spark):
    """Anchor text tokenized with the corpus token definition
    (lowercase, whitespace); relative/ftp anchors dropped; empty-text
    and nested-markup anchors contribute nothing; destination hosts
    canonicalized (case/www collapse)."""
    pages = spark.createDataFrame(
        [(1, '<a href="https://Docs.Example/a">Getting  Started</a> '
             '<A HREF=\'http://WWW.docs.example/b\'>getting STARTED</A> '
             '<a href="/rel">local nav</a> '
             '<a href="https://other.example/c"></a> '
             '<a href="https://other.example/d"><b>bold</b></a> '
             '<a href="ftp://files.example/f">file</a>')],
        ["doc_id", "html"])
    got = {(r["dst_host"], r["term"]): r["n_anchors"] for r in
           webnorm.anchor_text_terms(pages).collect()}
    assert got == {("docs.example", "getting"): 2,
                   ("docs.example", "started"): 2}


def test_ccnet_tiers_ntile_and_tiebreak(spark):
    # 7 scorable docs in lang xx tiered against an en-trained reference
    # LM (the CCNet shape: the scored lang is NOT the training slice, so
    # OOV gibberish really hits the smoothed floor): NTILE(3) fronts the
    # remainder -> 3 head / 2 middle / 2 tail; equal scores break ties
    # by doc_id; the 1-token doc is unscorable and dropped
    rows = [(100, "en", "the cat sat on the mat"),
            (101, "en", "the cat sat on the mat")]
    rows += [(i, "xx", "the cat sat on the mat") for i in range(6)]
    rows.append((6, "xx", "zq xv qj pf wk bn"))
    rows.append((7, "xx", "word"))
    docs = spark.createDataFrame(rows,
                                 "doc_id long, lang string, text string")
    out = textstats.ccnet_perplexity_tiers(docs, target_lang="en")
    got = {r.doc_id: r.tier for r in out.collect() if r.lang == "xx"}
    assert 7 not in got
    assert got == {0: "head", 1: "head", 2: "head",
                   3: "middle", 4: "middle", 5: "tail", 6: "tail"}


def test_ccnet_tiers_are_per_language(spark):
    # each language is tiered independently: a lang whose best doc
    # would be another lang's tail still gets its own head
    rows = [(1, "en", "the cat sat on the mat again and again"),
            (2, "en", "the dog sat on the mat"),
            (3, "en", "zq xv qj pf wk"),
            (10, "fr", "zz yy xx ww vv uu"),
            (11, "fr", "qq pp oo nn"),
            (12, "fr", "mm ll kk jj")]
    docs = spark.createDataFrame(rows,
                                 "doc_id long, lang string, text string")
    out = textstats.ccnet_perplexity_tiers(docs, target_lang="en")
    by_lang = {}
    for r in out.collect():
        by_lang.setdefault(r.lang, set()).add(r.tier)
    assert by_lang["en"] == {"head", "middle", "tail"}
    assert by_lang["fr"] == {"head", "middle", "tail"}


def test_url_quality_features_gates_and_first_fail(spark):
    rows = [
        (1, "https://ok.example/a/b?x=1"),                  # keep
        (2, "https://ok.example/1/2/3/4/5/6/7"),            # depth 7
        (3, "https://ok.example/p123456789"),               # 9-digit run
        (4, "https://ok.example/a?a=1&b=2&c=3&d=4&e=5"),    # 5 params
        (5, "https://a-b-c-d-spam.example/x"),              # 4 hyphens
        # depth AND digit run violated: first-fail reports path_depth
        (6, "https://ok.example/1/2/3/4/5/6/123456789x/p"),
        # '?' inside an SPA fragment route is NOT query params
        (7, "https://ok.example/app#/search?a=1&b=2&c=3&d=4&e=5"),
        # junk frontier entries must fail the gate, not zero through it
        (8, "//a-b-c-d-spam.example/1/2/3/4/5/6/7?a=1&b=2&c=3&d=4&e=5"),
        (9, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r.doc_id: (r.keep, r.drop_reason, r.path_depth,
                      r.longest_digit_run, r.n_params, r.host_hyphens,
                      r.digit_ratio_r)
           for r in webnorm.url_quality_features(df).collect()}
    assert got[1][:6] == (True, "", 2, 0, 1, 0)
    assert got[2][:2] == (False, "path_depth")
    assert got[3][:2] == (False, "digit_run")
    assert got[4][:2] == (False, "n_params")
    assert got[5][:2] == (False, "host_hyphens")
    assert got[6][:2] == (False, "path_depth")
    assert got[7][:2] == (True, "")
    assert got[7][4] == 0                       # no real query params
    assert got[8][:2] == (False, "invalid")
    assert got[9][:2] == (False, "invalid")
    # continuous signal: digits / path chars
    assert got[3][6] == round(9 / len("/p123456789"), 6)


def test_url_template_census_traps(spark):
    rows = ([(f"https://t.example/cal/2024/{i}",) for i in range(10)]
            + [(f"https://t.example/page?id={i}",) for i in range(10)]
            + [("https://t.example/article/alpha",)] * 3
            + [("https://t.example/article/beta",)] * 3)
    df = spark.createDataFrame(rows, "url string")
    got = {(r.host, r.template): (r.n_urls, r.n_distinct_nodigit, r.is_trap)
           for r in webnorm.url_template_census(
               df, trap_min_urls=5,
               trap_max_distinct_ratio=0.34).collect()}
    # calendar trap: 10 distinct URLs, one digit-stripped form
    assert got[("t.example", "/cal/N/N")] == (10, 1, True)
    # id-churn trap: query varies, path template constant
    assert got[("t.example", "/page")] == (10, 1, True)
    # letter-keyed articles: repeated fetches of ONE url each -> small,
    # never trap
    assert got[("t.example", "/article/alpha")] == (1, 1, False)
    assert got[("t.example", "/article/beta")] == (1, 1, False)


def test_url_template_census_fragments_not_a_trap(spark):
    # 8 fragment anchors of ONE fetchable page: n_urls must be 1 (the
    # defragged URL), never a trap
    rows = [(f"https://h.example/guide#sec-{c}",) for c in "abcdefgh"]
    df = spark.createDataFrame(rows, "url string")
    got = webnorm.url_template_census(
        df, trap_min_urls=5, trap_max_distinct_ratio=0.34).collect()
    assert [(r.n_urls, r.is_trap) for r in got] == [(1, False)]


# ---------------------------------------------------------------- SURT

SURT_CASES = [
    # (raw, surt) — the public webarchive-commons/pywb convention
    ("https://www.Example.com/A/b?b=2&a=1", "com,example)/a/b?a=1&b=2"),
    ("HTTPS://WWW.News.Example.ORG:443/A/", "org,example,news)/a"),
    ("http://example.com:80/x", "com,example)/x"),
    ("http://example.com:8080/x", "com,example:8080)/x"),
    ("https://example.com/p?utm_source=x", "com,example)/p"),
    ("https://sub.host.example.com/p#frag?x=1", "com,example,host,sub)/p"),
    ("https://example.com", "com,example)"),
    # wwwx is not a www prefix; query case folds with the key
    ("https://wwwx.example.com/p?K=V", "com,example,wwwx)/p?k=v"),
]


def test_surt_key_cases(spark):
    df = spark.createDataFrame([Row(url=r) for r, _ in SURT_CASES])
    got = [r[0] for r in df.select(webnorm.surt_key("url")).collect()]
    assert got == [c for _, c in SURT_CASES]


def test_surt_key_sorts_one_domain_contiguously(spark):
    # the point of SURT: every capture of one registrable domain sorts
    # into one contiguous range, regardless of subdomain/scheme noise
    rows = [("https://a.example.com/1",), ("http://www.example.com/2",),
            ("https://zz.other.net/3",), ("https://example.com/4",)]
    df = spark.createDataFrame(rows, "url string")
    keys = sorted(r[0] for r in df.select(webnorm.surt_key("url")).collect())
    dom = [k for k in keys if k.startswith("com,example")]
    lo, hi = keys.index(dom[0]), keys.index(dom[-1])
    assert hi - lo + 1 == len(dom) == 3
