import pytest


@pytest.fixture(scope="session")
def spark():
    from readabilityimproved_spark.plans.session import build_session

    spark = build_session(
        app_name="tests", master="local[4]", shuffle_partitions=8
    )
    yield spark
    spark.stop()
