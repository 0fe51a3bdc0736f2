"""dask_geomodeling_spark — a PySpark-native engine with the query and
data-processing capabilities of nens/dask-geomodeling.

Blocks compose into views exactly like the reference; evaluation compiles
to Spark DataFrame logical plans (Catalyst optimizes, Tungsten executes)
instead of dask graphs.  See SURVEY.md for the architecture and the
operator-by-operator mapping.
"""

from dask_geomodeling_spark import config  # noqa
from dask_geomodeling_spark.core import (Block, DummyBlock, compute,  # noqa
                                         construct, construct_multiple)
from dask_geomodeling_spark import geometry  # noqa
from dask_geomodeling_spark import raster  # noqa
from dask_geomodeling_spark import pipeline  # noqa

__version__ = "0.1.0"
