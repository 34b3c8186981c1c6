import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from tiledb_py_spark.session import get_spark

    s = get_spark(cpus="8")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def uri(tmp_path):
    return str(tmp_path / "arr")
