import pytest


@pytest.fixture(scope="session")
def spark():
    from ukeeper_readability_spark.jobs.extract_job import get_spark

    s = get_spark(app_name="pytest", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
