import pytest

from db_factfinder_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="db_factfinder_spark-tests", cpus=4)
    yield s
