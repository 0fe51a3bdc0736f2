"""Arc/Info ASCII Grid (AAIGrid, ``.asc``) raster source.

One more container from the reference's GDAL ingest surface
(reference raster/sources.py:396, ``gdal.Open`` at :68 — the verdict's
named non-TIFF list: NetCDF/HDF/JP2/AAIGrid/VRT).  AAIGrid is a plain
text format: a 5/6-line header (``ncols nrows xllcorner|xllcenter
yllcorner|yllcenter cellsize [nodata_value]``) followed by
``nrows × ncols`` whitespace-separated values, row-major from the TOP
row — entirely stdlib-parseable.

Spark shape matches the other file sources: ``binaryFile`` lists and
reads one task per file, an Arrow-batched ``mapInPandas`` parses, and
every value becomes a cell row ``(time, y, x, value)`` with the
header's nodata as NULL and ``wx``/``wy`` the cell-center world
coordinates.  Multiple files become time bands by sorted path (the
GeoTIFF convention)."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from dask_geomodeling_spark.raster.base import (EPOCH, RasterBlock,
                                                apply_raster_request)
from dask_geomodeling_spark.utils import dt_to_ms

__all__ = ["AAIGridRasterSource", "parse_aaigrid", "write_aaigrid"]


def parse_aaigrid(text):
    """AAIGrid text → ``(ncols, nrows, values, nodata, (x0, dx, y0,
    dy))`` with ``values`` row-major from the top row and the
    geotransform in the GeoTIFF source's convention (``x0``/``y0`` =
    TOP-LEFT corner, ``dx``/``dy`` positive cell sizes; cell center
    (r, c) = ``(x0 + (c+.5)dx, y0 − (r+.5)dy)``).  Header keys are
    case-insensitive; ``xllcenter``/``yllcenter`` shift by half a
    cell per the spec; ``nodata_value`` is optional."""
    tokens = text.split()
    head = {}
    i = 0
    while i + 1 < len(tokens):
        key = tokens[i].lower()
        if key in ("ncols", "nrows", "xllcorner", "yllcorner",
                   "xllcenter", "yllcenter", "cellsize",
                   "nodata_value"):
            head[key] = tokens[i + 1]
            i += 2
        else:
            break
    for req in ("ncols", "nrows", "cellsize"):
        if req not in head:
            raise ValueError(
                "not an AAIGrid: missing header key {}".format(req))
    ncols, nrows = int(head["ncols"]), int(head["nrows"])
    cs = float(head["cellsize"])
    if "xllcorner" in head:
        xll = float(head["xllcorner"])
    elif "xllcenter" in head:
        xll = float(head["xllcenter"]) - cs / 2.0
    else:
        raise ValueError("not an AAIGrid: missing xllcorner/xllcenter")
    if "yllcorner" in head:
        yll = float(head["yllcorner"])
    elif "yllcenter" in head:
        yll = float(head["yllcenter"]) - cs / 2.0
    else:
        raise ValueError("not an AAIGrid: missing yllcorner/yllcenter")
    nodata = (float(head["nodata_value"])
              if "nodata_value" in head else None)
    vals = tokens[i:]
    if len(vals) != ncols * nrows:
        raise ValueError(
            "AAIGrid data holds {} values, header promises {}x{}"
            .format(len(vals), nrows, ncols))
    values = [float(v) for v in vals]
    # top-left origin: the first data row is the TOP row
    geotransform = (xll, cs, yll + nrows * cs, cs)
    return ncols, nrows, values, nodata, geotransform


def write_aaigrid(path, ncols, nrows, values, xllcorner=0.0,
                  yllcorner=0.0, cellsize=1.0, nodata=None,
                  center=False):
    """AAIGrid fixture/export writer — the inverse of
    ``parse_aaigrid`` (values row-major from the top row;
    ``center=True`` writes the ``xllcenter``/``yllcenter`` header
    flavor)."""
    if len(values) != ncols * nrows:
        raise ValueError("values must hold ncols*nrows floats")
    lines = ["ncols {}".format(ncols), "nrows {}".format(nrows)]
    if center:
        lines.append("xllcenter {!r}".format(xllcorner + cellsize / 2))
        lines.append("yllcenter {!r}".format(yllcorner + cellsize / 2))
    else:
        lines.append("xllcorner {!r}".format(float(xllcorner)))
        lines.append("yllcorner {!r}".format(float(yllcorner)))
    lines.append("cellsize {!r}".format(float(cellsize)))
    if nodata is not None:
        lines.append("NODATA_value {!r}".format(float(nodata)))
    for r in range(nrows):
        lines.append(" ".join(
            repr(v) for v in values[r * ncols:(r + 1) * ncols]))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


class AAIGridRasterSource(RasterBlock):
    """Cell table from Arc/Info ASCII grids (``.asc`` — reference:
    RasterFileSource via gdal.Open).  Each file's values become cells
    with the header nodata as NULL; multiple files are time bands by
    sorted path (``time_first`` + ``time_delta`` × index), the
    GeoTIFF source's convention."""

    def __init__(self, url, time_first=EPOCH, time_delta=None):
        super().__init__(url, time_first, time_delta)

    def _build(self, ctx):
        from pyspark.sql import types as T
        url, time_first, time_delta = self.args
        files = (ctx.spark.read.format("binaryFile").load(url)
                 .select("path", "content"))
        schema = T.StructType([
            T.StructField("path", T.StringType()),
            T.StructField("y", T.LongType()),
            T.StructField("x", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("wx", T.DoubleType()),
            T.StructField("wy", T.DoubleType()),
        ])

        def parse(batches):
            import pandas as pd
            for pdf in batches:
                for path, content in zip(pdf["path"], pdf["content"]):
                    w, h, vals, nodata, gt = parse_aaigrid(
                        bytes(content).decode("ascii"))
                    ys = [k // w for k in range(w * h)]
                    xs = [k % w for k in range(w * h)]
                    x0, dx, y0, dy = gt
                    wxs = [x0 + (c + 0.5) * dx for c in xs]
                    wys = [y0 - (r + 0.5) * dy for r in ys]
                    if nodata is not None:
                        vals = [None if v == nodata else v
                                for v in vals]
                    yield pd.DataFrame(
                        {"path": path, "y": ys, "x": xs,
                         "value": vals, "wx": wxs, "wy": wys})

        cells = files.mapInPandas(parse, schema=schema)
        if time_delta is not None:
            # band index by sorted path: a tiny per-FILE dimension via
            # the windowless distributed rank (one row per file)
            from dask_geomodeling_spark.functions.ranking import (
                global_row_number)
            idx, _ = global_row_number(
                files.select("path").distinct(), ["path"], out="_rn")
            idx = idx.withColumn("_band", F.col("_rn") - 1).drop("_rn")
            cells = cells.join(F.broadcast(idx), ["path"])
            t = F.timestamp_micros(
                F.lit(dt_to_ms(time_first) * 1000)
                + F.col("_band")
                * F.lit(int(time_delta.total_seconds() * 1000000)))
        else:
            t = F.timestamp_micros(F.lit(dt_to_ms(time_first) * 1000))
        out = cells.select(t.alias("time"), "y", "x", "value",
                           "wx", "wy")
        return apply_raster_request(out, ctx.request)
