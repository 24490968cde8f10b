import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from sparketl.session import get_spark

    spark = get_spark("sparketl-tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield spark


@pytest.fixture()
def tmp_table_root(tmp_path):
    return str(tmp_path / "tbl")
