import os
import shutil
import tempfile

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from meilibridge_spark.session import build_session

    s = build_session("meilibridge-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture()
def tmp_index_dir():
    d = tempfile.mkdtemp(prefix="mbidx_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
