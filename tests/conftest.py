import shutil
import tempfile

import pytest

from ore_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ore-etl-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture()
def tmpdir_path():
    d = tempfile.mkdtemp(prefix="ore_etl_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
