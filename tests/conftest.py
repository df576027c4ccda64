import os
import shutil
import tempfile

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("cdc-engine-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture()
def tmpdir_path():
    d = tempfile.mkdtemp(prefix="cdc-test-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def assert_df_equal(a, b, key_cols):
    """Order-insensitive DataFrame equality on shared columns."""
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols, f"columns differ: {sorted(b.columns)} vs {cols}"
    ra = [tuple(r) for r in a.select(*cols).collect()]
    rb = [tuple(r) for r in b.select(*cols).collect()]
    assert sorted(ra, key=str) == sorted(rb, key=str), (
        f"rows differ: {len(ra)} vs {len(rb)};"
        f" only_a={set(map(str, ra)) - set(map(str, rb))}"
        f" only_b={set(map(str, rb)) - set(map(str, ra))}"
    )
