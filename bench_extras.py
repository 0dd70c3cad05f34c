"""Deeper bench legs, run one-shot and committed as bench_out artifacts
(kept out of bench.py so the per-round driver bench stays bounded):

1. --modes  staged-vs-packed extraction throughput at two pinned widths
            (8 and 32 cores).  Staged pays two Python exchanges
            (segment + fused enrich) but exposes the per-block table;
            packed is one exchange.  This quantifies the documented
            mode tradeoff (operators/extract.py docstring).
2. --skew   megahost skew demonstration (SURVEY §7.4 risk 3): a normal
            fixture corpus plus ~100 multi-MB pages all on
            megahost.example, written host-SORTED (the hot host's rows
            adjacent — the worst-case crawl-dump / sort-ordered-table
            layout) and extracted unsalted vs salted (salt_buckets=64).
            Unsalted, the mega rows sit in two unsplittable straggler
            tasks (parquet cannot split inside a row group, and file
            granularity follows COMPRESSED size — repeated boilerplate
            compresses ~20x, so the scheduler can't even see the skew);
            the salted url-hash repartition spreads the same rows across
            every core.  An explicit shuffle is the only fix — that is
            the north rule's "explicit skew handling".

Both legs use the same pinned-subprocess protocol as bench.py
(taskset + best-of over interleaved rounds; see BENCH.md for why on
this shared-tenancy VM).

Usage:  python bench_extras.py [--modes] [--skew]   (default: both)
Writes: bench_out/modes_r3.json, bench_out/skew_r3.json
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
OUT_DIR = os.path.join(REPO, "bench_out")
MODE_DOCS = int(os.environ.get("BENCH_MODE_DOCS", "24000"))
SKEW_DOCS = int(os.environ.get("BENCH_SKEW_DOCS", "8000"))
SKEW_MEGA = int(os.environ.get("BENCH_SKEW_MEGA", "100"))
ROUNDS = int(os.environ.get("BENCH_EXTRAS_ROUNDS", "2"))

# keep scan granularity small so BOTH skew probes get the same input
# parallelism — the salted/unsalted difference is then purely the
# straggler spread, not a task-count artifact.  (The mega row group
# stays one task regardless: parquet can't split inside a row group.)
_SKEW_CONF = {"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)}


def _fixture_digest() -> str:
    """Covers BOTH generators feeding the skew corpus: fixtures.py (the
    normal rows) and this file (the _mega_rows recipe) — editing either
    invalidates the cached corpus instead of silently benchmarking
    stale data."""
    import ukrainian_ocr_pipeline_spark.fixtures as fx
    h = hashlib.sha256()
    for path in (fx.__file__, os.path.abspath(__file__)):
        with open(path, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()[:8]


def _mega_rows(n_mega: int):
    """~100 multi-MB pages, all on megahost.example: the fixture
    megapage recipe with the repeated-paragraph body scaled to ~2 MB
    (the stock fixture megapage is ~0.4 MB — too small to dominate a
    task).  Bench-only rows; never part of the golden corpus."""
    import datetime
    from ukrainian_ocr_pipeline_spark.fixtures import (
        EPOCH, LANGS, _nav_block, _paragraph, _rng_for)
    for i in range(n_mega):
        url = f"https://megahost.example/mega/{i:06d}.html"
        rng = _rng_for(url, 42)
        lang = LANGS[i % len(LANGS)]
        paras = "".join(_paragraph(rng, lang, with_entity=(j % 7 == 0))
                        for j in range(12))
        body = paras * max(1, (2_000_000 // max(len(paras), 1)))
        html = (f'<html><head><meta charset="utf-8"></head><body>'
                f"{_nav_block(rng)}<main>{body}</main></body></html>"
                ).encode("utf-8")
        yield {"url": url, "warc_ts": EPOCH + datetime.timedelta(seconds=i),
               "html": html, "text": None, "lang": lang}


def _sorted_skew_corpus(spark, n_docs: int, n_mega: int) -> str:
    """Normal fixture corpus + n_mega multi-MB megahost pages, written
    host-sorted: orderBy(url) range-partitions the write, so the hot
    host's rows land contiguously in ~2 files — the layout a sorted
    crawl dump or an Iceberg sort-ordered table would hand us."""
    import pandas as pd
    from ukrainian_ocr_pipeline_spark.sources.pages import (
        PAGES_SCHEMA, pages_from_fixtures)
    path = os.path.join(tempfile.gettempdir(),
                        f"bench_skew_{n_docs}_{n_mega}_{_fixture_digest()}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        mega = pd.DataFrame(list(_mega_rows(n_mega)))
        mega["warc_ts"] = (pd.to_datetime(mega["warc_ts"], utc=True)
                           .dt.tz_localize(None))
        mega_df = spark.createDataFrame(mega, PAGES_SCHEMA)
        (pages_from_fixtures(spark, n_docs, partitions=64)
         .unionByName(mega_df)
         .orderBy("url")
         .write.mode("overwrite")
         # 50-row file chunks: the sorted mega run splits into ~2 files
         # (~50 x 2 MB each) — still unsplittable-in-practice stragglers,
         # but bounded so the unsalted probe finishes in minutes
         .option("maxRecordsPerFile", 50)
         .parquet(path))
    return path


def probe_mode(mode: str, n_cpus: int, n_docs: int, repeats: int) -> None:
    from ukrainian_ocr_pipeline_spark.operators.extract import (
        extract_pages, extracted_table)
    from ukrainian_ocr_pipeline_spark.sources.pages import read_pages
    from ukrainian_ocr_pipeline_spark.sources.session import get_spark
    import bench

    spark = get_spark(app=f"mode-{mode}-{n_cpus}", master=f"local[{n_cpus}]")
    path = bench._pages_parquet(spark, n_docs)

    def run() -> float:
        t0 = time.perf_counter()
        bench._materialize(extracted_table(
            extract_pages(read_pages(spark, path), mode=mode)))
        return time.perf_counter() - t0

    run()  # warm
    walls = [run() for _ in range(repeats)]
    print(json.dumps({"mode": mode, "cpus": n_cpus, "docs": n_docs,
                      "walls": [round(w, 2) for w in walls],
                      "docs_per_sec": round(n_docs / min(walls), 1)}))
    spark.stop()


def probe_skew(salted: bool, n_cpus: int, n_docs: int, repeats: int) -> None:
    from ukrainian_ocr_pipeline_spark.operators.extract import (
        extract_pages, extracted_table)
    from ukrainian_ocr_pipeline_spark.sources.pages import read_pages
    from ukrainian_ocr_pipeline_spark.sources.session import get_spark
    import bench

    spark = get_spark(app=f"skew-{'salt' if salted else 'plain'}-{n_cpus}",
                      master=f"local[{n_cpus}]", extra=_SKEW_CONF)
    path = _sorted_skew_corpus(spark, n_docs, SKEW_MEGA)

    def run() -> float:
        t0 = time.perf_counter()
        bench._materialize(extracted_table(extract_pages(
            read_pages(spark, path), mode="packed",
            salt_buckets=64 if salted else None)))
        return time.perf_counter() - t0

    run()  # warm
    walls = [run() for _ in range(repeats)]
    print(json.dumps({"salted": salted, "cpus": n_cpus, "docs": n_docs,
                      "walls": [round(w, 2) for w in walls],
                      "best_wall_s": round(min(walls), 2)}))
    spark.stop()


def _subprocess(args: list[str], n_cpus: int) -> dict:
    cmd = [sys.executable, os.path.abspath(__file__)] + args
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{n_cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(f"probe {args} failed (rc={out.returncode}); "
                           f"stderr tail:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def _skew_layout_stats() -> dict:
    """Input-layout imbalance of the sorted corpus: html bytes per scan
    partition (the WHY of the unsalted straggler)."""
    from pyspark.sql import functions as F
    from ukrainian_ocr_pipeline_spark.sources.pages import read_pages
    from ukrainian_ocr_pipeline_spark.sources.session import get_spark
    spark = get_spark(app="skew-layout", master="local[8]", extra=_SKEW_CONF)
    path = _sorted_skew_corpus(spark, SKEW_DOCS, SKEW_MEGA)
    rows = (read_pages(spark, path)
            .select(F.spark_partition_id().alias("pid"),
                    F.length("html").alias("b"))
            .groupBy("pid").agg(F.sum("b").alias("bytes"),
                                F.count("*").alias("rows"))
            .collect())
    sizes = sorted(int(r["bytes"]) for r in rows)
    stats = {
        "n_scan_partitions": len(sizes),
        "max_partition_mb": round(sizes[-1] / 1e6, 1),
        "median_partition_mb": round(sizes[len(sizes) // 2] / 1e6, 1),
        "imbalance_max_over_median": round(
            sizes[-1] / max(sizes[len(sizes) // 2], 1), 1),
    }
    spark.stop()
    time.sleep(2)
    return stats


def run_modes() -> dict:
    best: dict[tuple, float] = {}
    walls: dict[str, list] = {}
    combos = [("staged", 8), ("packed", 8), ("staged", 32), ("packed", 32)]
    for _ in range(ROUNDS):
        for mode, width in combos:
            p = _subprocess(["--probe-mode", mode, str(width),
                             str(MODE_DOCS), "2"], width)
            key = f"{mode}@{width}"
            walls.setdefault(key, []).extend(p["walls"])
            best[(mode, width)] = max(best.get((mode, width), 0.0),
                                      p["docs_per_sec"])
            time.sleep(2)
    result = {
        "docs": MODE_DOCS,
        "method": f"interleaved x{ROUNDS} rounds, best-of per combo, "
                  "taskset-pinned",
        "docs_per_sec": {f"{m}@{w}": round(best[(m, w)], 1)
                         for m, w in combos},
        "walls": walls,
        "packed_over_staged": {
            str(w): round(best[("packed", w)] / best[("staged", w)], 3)
            for w in (8, 32)},
    }
    return result


def run_skew() -> dict:
    best: dict[bool, float] = {}
    walls: dict[str, list] = {}
    for _ in range(ROUNDS):
        for salted in (False, True):
            p = _subprocess(["--probe-skew", str(int(salted)), "8",
                             str(SKEW_DOCS), "1"], 8)
            key = "salted" if salted else "unsalted"
            walls.setdefault(key, []).extend(p["walls"])
            w = min(p["walls"])
            best[salted] = min(best.get(salted, 1e9), w)
            time.sleep(2)
    return {
        "docs": SKEW_DOCS, "cpus": 8,
        "method": f"interleaved x{ROUNDS} rounds, best-of, taskset-pinned; "
                  "host-sorted layout, maxPartitionBytes=4MB both probes",
        "layout": _skew_layout_stats(),
        "unsalted_wall_s": round(best[False], 2),
        "salted_wall_s": round(best[True], 2),
        "salted_speedup": round(best[False] / best[True], 2),
        "walls": walls,
    }


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    what = [a for a in sys.argv[1:] if a in ("--modes", "--skew")] or \
        ["--modes", "--skew"]
    if "--modes" in what:
        m = run_modes()
        with open(os.path.join(OUT_DIR, "modes_r3.json"), "w") as f:
            json.dump(m, f, indent=1)
        print(json.dumps({"modes": m}))
    if "--skew" in what:
        s = run_skew()
        with open(os.path.join(OUT_DIR, "skew_r3.json"), "w") as f:
            json.dump(s, f, indent=1)
        print(json.dumps({"skew": s}))


if __name__ == "__main__":
    if len(sys.argv) >= 5 and sys.argv[1] == "--probe-mode":
        probe_mode(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
                   repeats=int(sys.argv[5]) if len(sys.argv) > 5 else 2)
    elif len(sys.argv) >= 5 and sys.argv[1] == "--probe-skew":
        probe_skew(bool(int(sys.argv[2])), int(sys.argv[3]),
                   int(sys.argv[4]),
                   repeats=int(sys.argv[5]) if len(sys.argv) > 5 else 2)
    else:
        main()
