import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(REPO, "golden")
T2_ROWS = 500


@pytest.fixture(scope="session")
def spark():
    from ukrainian_ocr_pipeline_spark.sources.session import get_spark
    s = get_spark(app="tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def t2_rows():
    from ukrainian_ocr_pipeline_spark.fixtures import gen_pages
    return list(gen_pages(T2_ROWS))


@pytest.fixture(scope="session")
def oracle_golden(t2_rows):
    from ukrainian_ocr_pipeline_spark.oracle import run_oracle
    return run_oracle(t2_rows)
