import pytest

from mallarddv_spark.session import get_spark


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    s = get_spark(
        app_name="mallarddv_spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        warehouse_dir=str(wh),
    )
    yield s
