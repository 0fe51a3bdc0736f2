"""Reference view-config compatibility.

dask-geomodeling serializes views as ``{name: ["dask_geomodeling.<mod>.
<Class>", *args]}`` JSON graphs (reference core/graphs.py:192).  This
module lets those graphs construct AGAINST THIS PACKAGE unmodified:

- import paths under ``dask_geomodeling.`` rewrite to the mirrored
  ``dask_geomodeling_spark.`` module (the module layout intentionally
  matches: geometry.field_operations, raster.misc, …), with
  ``core.graphs`` → ``core.blocks``;
- classes whose constructor contract differs (the GDAL-facing sources)
  get explicit adapter classes here, translating the reference
  argument order/units onto the Spark-native blocks.

``Block.from_import_path`` consults :func:`resolve_import_path`, so
``construct``/``from_json`` on a reference graph just works — the
mechanical-port promise of SURVEY §1b.
"""

from __future__ import annotations

import datetime
import importlib

__all__ = ["resolve_import_path", "GeometryFileSource",
           "GeometryWKTSource", "MemorySource", "RasterFileSource"]

_REF_PKG = "dask_geomodeling"
_OUR_PKG = "dask_geomodeling_spark"

#: reference classes whose signatures need adapting (everything else
#: resolves by module rewrite because names and argument orders match)
_ALIASES = {
    "geometry.sources.GeometryFileSource": "compat.GeometryFileSource",
    "geometry.GeometryFileSource": "compat.GeometryFileSource",
    "geometry.sources.GeometryWKTSource": "compat.GeometryWKTSource",
    "geometry.GeometryWKTSource": "compat.GeometryWKTSource",
    "raster.sources.MemorySource": "compat.MemorySource",
    "raster.MemorySource": "compat.MemorySource",
    "raster.sources.RasterFileSource": "compat.RasterFileSource",
    "raster.RasterFileSource": "compat.RasterFileSource",
    "raster.sources.TemporalSum": "raster.temporal.TemporalSum",
}


def resolve_import_path(path):
    """Map a reference import path to a class of this package, or
    return None when ``path`` is not a reference path."""
    if not path.startswith(_REF_PKG + "."):
        return None
    tail = path[len(_REF_PKG) + 1:]
    target = _ALIASES.get(tail)
    if target is None:
        if tail.startswith("core.graphs."):
            tail = "core.blocks." + tail[len("core.graphs."):]
        target = tail
    module, _, name = (_OUR_PKG + "." + target).rpartition(".")
    try:
        return getattr(importlib.import_module(module), name)
    except (ImportError, AttributeError) as exc:
        # a dask_geomodeling.* path with no mirrored class would
        # otherwise escape as a raw ModuleNotFoundError from importlib
        raise NotImplementedError(
            "reference path {!r} has no equivalent in {} "
            "(tried {}.{}): {}".format(path, _OUR_PKG, module, name, exc)
        ) from exc


def _ms_to_datetime(value, default=None):
    if value is None:
        return default
    if isinstance(value, datetime.datetime):
        return value
    return datetime.datetime(1970, 1, 1) + datetime.timedelta(
        milliseconds=int(value))


def _ms_to_timedelta(value):
    if value is None or isinstance(value, datetime.timedelta):
        return value
    return datetime.timedelta(milliseconds=int(value))


def GeometryFileSource(url, layer=None, id_field=None):
    """Reference signature (geometry/sources.py:38): ``(url, layer,
    id_field)``.  ``layer`` selects an OGR sub-layer — meaningless for
    columnar files, accepted and ignored.  Format comes from the url
    extension (parquet default; .geojson/.json read as GeoJSON
    FeatureCollections with the property schema INFERRED from the
    VARIANT — the fiona-parity sniffing path)."""
    from dask_geomodeling_spark.geometry.sources import (
        FileGeometrySource, ParquetGeometrySource)
    low = url.lower()
    if low.endswith(".geojson"):
        # reference reads GeoJSON through fiona with inferred
        # properties; schema_of_variant_agg over a bounded feature
        # sample replaces the fiona sniff (sources.py
        # infer_geojson_schema)
        return FileGeometrySource(url, "geojson",
                                  id_field=id_field or "id")
    if low.endswith(".json"):
        # a .json file may be a GeoJSON FeatureCollection OR plain
        # JSON-lines; sniff the head like fiona's driver detection
        # (driver-side, bounded read) instead of force-routing to the
        # GeoJSON error path (round-5 review nit)
        try:
            with open(url, "rb") as fh:
                head = fh.read(4096).decode("utf-8", "replace")
        except OSError:
            # non-local URL (s3://, hdfs://, https://): builtin open()
            # cannot sniff — keep the pre-sniff routing (GeoJSON
            # FeatureCollection, the dominant remote-.json case) rather
            # than silently falling through to JSON-lines (round-7
            # advice)
            return FileGeometrySource(url, "geojson",
                                      id_field=id_field or "id")
        if "FeatureCollection" in head:
            return FileGeometrySource(url, "geojson",
                                      id_field=id_field or "id")
        return FileGeometrySource(url, "json",
                                  id_field=id_field or "id",
                                  schema="infer")
    if low.endswith(".shp"):
        # pure-spec struct codec — no GDAL (geometry/shapefile.py);
        # attribute schema infers from the .dbf header, the fiona
        # parity path
        from dask_geomodeling_spark.geometry.shapefile import (
            ShapefileGeometrySource)
        return ShapefileGeometrySource(url, id_field=id_field or "fid")
    if low.endswith(".gpkg"):
        # stdlib sqlite3 + the engine's WKB codec — no GDAL
        # (geometry/geopackage.py); layer picks the catalog table
        from dask_geomodeling_spark.geometry.geopackage import (
            GeoPackageGeometrySource)
        return GeoPackageGeometrySource(url, layer=layer,
                                        id_field=id_field or "fid")
    if low.endswith(".kml"):
        # Spark's native XML source + HOF coordinate parsing — no GDAL
        from dask_geomodeling_spark.geometry.xmlformats import (
            KMLGeometrySource)
        return KMLGeometrySource(url, id_field=id_field or "name")
    if low.endswith(".gml"):
        from dask_geomodeling_spark.geometry.xmlformats import (
            GMLGeometrySource)
        return GMLGeometrySource(url, feature_tag=layer,
                                 id_field=id_field or "fid")
    if low.endswith(".fgb"):
        # pure-spec FlatBuffers walk — no GDAL (geometry/flatgeobuf.py)
        from dask_geomodeling_spark.geometry.flatgeobuf import (
            FlatGeobufGeometrySource)
        return FlatGeobufGeometrySource(url, id_field=id_field or "fid")
    return ParquetGeometrySource(url, id_field=id_field or "id")


def GeometryWKTSource(wkt, projection="EPSG:4326"):
    """Reference signature (geometry/sources.py:173): ``(wkt,
    projection)`` — note the projection sits SECOND, where the Spark
    source keeps an ``id`` argument."""
    from dask_geomodeling_spark.geometry.sources import (
        LiteralGeometrySource)
    return LiteralGeometrySource(wkt, projection=projection)


def MemorySource(data, no_data_value=None, projection="EPSG:4326",
                 pixel_size=1.0, pixel_origin=(0.0, 0.0),
                 time_first=0, time_delta=None, metadata=None):
    """Reference signature (raster/sources.py:157): ``(data,
    no_data_value, projection, pixel_size, pixel_origin, time_first,
    time_delta, metadata)`` with epoch-millisecond ints for the time
    axis.  The cell-table model addresses cells by index, so
    pixel_size/pixel_origin/metadata are accepted for graph
    compatibility; time units convert."""
    from dask_geomodeling_spark.raster.sources import (
        MemorySource as _MemorySource)
    return _MemorySource(
        data, no_data_value=no_data_value,
        time_first=_ms_to_datetime(time_first,
                                   datetime.datetime(1970, 1, 1)),
        time_delta=_ms_to_timedelta(time_delta),
        projection=projection)


def RasterFileSource(url, time_first=0, time_delta=300000):
    """Reference signature (raster/sources.py): ``(url, time_first,
    time_delta)`` in epoch/interval milliseconds.  ``.tif``/``.tiff``
    routes to the pure-python GeoTIFF reader, ``.nc``/``.cdf`` to the
    classic-NetCDF reader, ``.asc``/``.agr`` to the AAIGrid reader (its CF time axis wins over the synthetic
    one when present — GDAL behaves the same way); anything else is
    read as a cell-table parquet dataset."""
    from dask_geomodeling_spark.raster.netcdf import NetCDFRasterSource
    from dask_geomodeling_spark.raster.sources import (
        GeoTIFFRasterSource, RasterParquetSource)
    first = _ms_to_datetime(time_first, datetime.datetime(1970, 1, 1))
    delta = _ms_to_timedelta(time_delta)
    if url.lower().endswith((".tif", ".tiff", ".geotiff")):
        return GeoTIFFRasterSource(url, time_first=first,
                                   time_delta=delta)
    if url.lower().endswith((".nc", ".cdf", ".nc3")):
        return NetCDFRasterSource(url, time_first=first,
                                  time_delta=delta)
    if url.lower().endswith((".asc", ".agr")):
        from dask_geomodeling_spark.raster.aaigrid import (
            AAIGridRasterSource)
        return AAIGridRasterSource(url, time_first=first,
                                   time_delta=delta)
    return RasterParquetSource(url)
