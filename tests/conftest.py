import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from blackedge_ocr_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = build_session(master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()
