from __future__ import annotations

import pytest

from edu_data_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="edu-data-pipeline-tests", master="local[4]",
                      shuffle_partitions=4)
    yield spark
