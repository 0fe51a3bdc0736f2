from dask_geomodeling_spark.core.blocks import *  # noqa
