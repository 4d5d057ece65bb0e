from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    import tempfile
    wh = tempfile.mkdtemp(prefix="spark-wh-")
    s = get_spark("tests", cpus=8, shuffle_partitions=8,
                  extra_conf={"spark.driver.memory": "8g",
                              "spark.sql.warehouse.dir": wh})
    yield s
    s.stop()
