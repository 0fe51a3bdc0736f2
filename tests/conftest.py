import pytest

from dask_geomodeling_spark.config import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
