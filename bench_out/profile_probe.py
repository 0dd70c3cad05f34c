import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ukrainian_ocr_pipeline_spark.operators.extract import extract_pages
from ukrainian_ocr_pipeline_spark.sources.pages import pages_from_fixtures
from ukrainian_ocr_pipeline_spark.sources.session import get_spark
from ukrainian_ocr_pipeline_spark.functions.udfs import segment_pages_udf

ncpu = int(sys.argv[1])
ndocs = int(sys.argv[2])
spark = get_spark(app="prof", master=f"local[{ncpu}]")

def noop(df):
    df.write.format("noop").mode("overwrite").save()

def timed(label, df):
    t0 = time.perf_counter()
    noop(df)
    print(json.dumps({"cpus": ncpu, "stage": label, "wall_s": round(time.perf_counter() - t0, 2)}))

pages = pages_from_fixtures(spark, ndocs)
# warm-up tiny
noop(extract_pages(pages_from_fixtures(spark, 200)))

timed("gen_only", pages)
timed("gen+segment", pages.withColumn("seg", segment_pages_udf(F.col("html"))).select("url", F.size("seg.blocks").alias("n")))
timed("gen+segment+render", extract_pages(pages, with_matches=False, with_regions=False).select("url", F.length("extracted_text").alias("n")).drop("spans"))
seg = pages.withColumn("seg", segment_pages_udf(F.col("html")))
kept = "filter(seg.blocks, b -> b.is_content)"
rendered = seg.withColumn("extracted_text", F.expr(f"concat_ws('\\n', transform({kept}, b -> b.text))")).select("url", "extracted_text")
from ukrainian_ocr_pipeline_spark.functions.udfs import make_match_udf, ner_udf
from ukrainian_ocr_pipeline_spark.spec import default_lexicon
timed("gen+seg+render+ner_only", rendered.withColumn("spans", ner_udf(F.col("extracted_text"), F.expr("cast(array() as array<struct<block_id:int,n_chars:int>>)"))).select("url", F.size("spans").alias("n")))
mu = make_match_udf(default_lexicon())
timed("gen+seg+render+match_only", rendered.withColumn("m", mu(F.col("extracted_text"))).select("url", F.size("m").alias("n")))
timed("full", extract_pages(pages))
spark.stop()
