import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent / "src"))

import pytest


@pytest.fixture(scope="session")
def spark():
    from cdc.session import get_spark

    s = get_spark("cdc-tests", cores=8, shuffle_partitions=8)
    yield s
