from dask_geomodeling_spark.raster.base import RasterBlock  # noqa
from dask_geomodeling_spark.raster.elemwise import *  # noqa
from dask_geomodeling_spark.raster.combine import *  # noqa
from dask_geomodeling_spark.raster.spatial import *  # noqa
from dask_geomodeling_spark.raster.temporal import *  # noqa
from dask_geomodeling_spark.raster.misc import *  # noqa
from dask_geomodeling_spark.raster.sources import *  # noqa
from dask_geomodeling_spark.raster.netcdf import NetCDFRasterSource  # noqa
from dask_geomodeling_spark.raster.aaigrid import AAIGridRasterSource  # noqa
from dask_geomodeling_spark.raster.parallelize import *  # noqa
from dask_geomodeling_spark.raster import reduction  # noqa
from dask_geomodeling_spark.raster.sinks import RasterFileSink  # noqa
from dask_geomodeling_spark.raster.warp import Warp  # noqa
from dask_geomodeling_spark.raster.components import RasterComponents  # noqa
from dask_geomodeling_spark.raster.contour import Contour  # noqa
from dask_geomodeling_spark.raster.hydrology import (  # noqa
    FlowAccumulation, FlowDirection, FlowLength, StreamOrder,
    Watershed)
