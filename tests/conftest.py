import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ref_oracle import load_reference  # noqa: E402


@pytest.fixture(scope="session")
def ref():
    r = load_reference()
    if r is None:
        pytest.skip("reference oracle unavailable")
    return r


@pytest.fixture()
def rng():
    # Function-scoped: every test sees the same seeded stream, so test
    # data does not depend on execution order or selection.
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def spark():
    from rhealpixdggs_spark.session import get_spark

    s = get_spark(app_name="tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
