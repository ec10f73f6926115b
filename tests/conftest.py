import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from prose_spark.session import get_spark

    s = get_spark(app_name="pytest", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_df(spark):
    from prose_spark.sources.pages import build_pages_df

    return build_pages_df(spark, 120).cache()
