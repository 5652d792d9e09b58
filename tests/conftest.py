import pytest


@pytest.fixture(scope='session')
def spark():
    from buzzard_spark.session import get_session
    s = get_session(master='local[8]', shuffle_partitions=8)
    yield s
    s.stop()
