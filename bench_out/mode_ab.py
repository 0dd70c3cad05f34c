"""One-off A/B probe: packed (pandas UDF) vs arrow (mapInArrow) extraction.

Usage: python bench_out/mode_ab.py MODE NCPUS NDOCS REPEATS
Prints one JSON line. Pin externally with taskset.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    mode, ncpus, ndocs, repeats = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
    from ukrainian_ocr_pipeline_spark.sources.session import get_spark
    from ukrainian_ocr_pipeline_spark.operators.extract import extract_pages, extracted_table
    from ukrainian_ocr_pipeline_spark.sources.pages import read_pages
    import bench
    spark = get_spark(app=f"ab-{mode}-{ncpus}", master=f"local[{ncpus}]")
    path = bench._pages_parquet(spark, ndocs)

    def run():
        pages = read_pages(spark, path)
        enriched = extract_pages(pages, mode=mode)
        t0 = time.perf_counter()
        bench._materialize(extracted_table(enriched))
        return time.perf_counter() - t0

    run()  # warm
    walls = [run() for _ in range(repeats)]
    print(json.dumps({"mode": mode, "cpus": ncpus, "docs": ndocs,
                      "walls": [round(w, 2) for w in walls],
                      "best_docs_per_sec": round(ndocs / min(walls), 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
