"""Host-ceiling control: the extraction spec with NO Spark.

Runs spec.extract_page over the same fixture corpus with a plain
multiprocessing.Pool, pinned to N cores with taskset:

    taskset -c 0-1 python bench_out/control_probe.py 2 96000
    taskset -c 0-7 python bench_out/control_probe.py 8 96000

Whatever scaling this shows is the HOST's ceiling for this workload
(memory bandwidth / turbo under load) — no JVM, no Arrow, no scheduler.
The Spark probes (bench.py --probe) are graded against it in BENCH.md.
"""

import json
import multiprocessing as mp
import sys
import time

sys.path.insert(0, "/root/repo")


_MATCHER = None


def _work(args):
    # same work as the Spark packed UDF: extract + NER + lexicon matching
    global _MATCHER
    from ukrainian_ocr_pipeline_spark.spec import LexiconMatcher, default_lexicon
    from ukrainian_ocr_pipeline_spark.spec.pipeline import extract_page
    if _MATCHER is None:
        _MATCHER = LexiconMatcher(default_lexicon(), 0.8)
    url, html = args
    r = extract_page(url, html, _MATCHER)
    return len(r.extracted_text)


def main():
    ncpu, ndocs = int(sys.argv[1]), int(sys.argv[2])
    from ukrainian_ocr_pipeline_spark.fixtures import build_pages_pandas
    df = build_pages_pandas(ndocs)
    rows = list(zip(df["url"], df["html"]))
    del df
    with mp.Pool(ncpu) as pool:
        # warm-up (imports + allocator state in each worker)
        for _ in pool.imap_unordered(_work, rows[:2000], chunksize=100):
            pass
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in pool.imap_unordered(_work, rows, chunksize=200):
                pass
            walls.append(time.perf_counter() - t0)
    wall = min(walls)
    print(json.dumps({"cpus": ncpu, "docs": ndocs, "wall_s": round(wall, 2),
                      "walls": [round(w, 2) for w in walls],
                      "docs_per_sec": round(ndocs / wall, 1)}))


if __name__ == "__main__":
    main()
