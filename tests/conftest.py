import pytest

from linkgraph.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="linkgraph-tests", cores=4, shuffle_partitions=4)
    yield s
