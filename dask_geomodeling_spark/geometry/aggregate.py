"""Zonal statistics (reference: geometry/aggregate.py).

``AggregateRaster`` (reference :255) computes a raster statistic inside
each feature geometry.  The reference rasterizes features per dask tile
(bucketize, aggregate.py:75) and runs ``scipy.ndimage`` labeled stats; the
Spark-first plan is a **range join** of the cell table against the feature
boxes (broadcast when the feature side is small — the usual case) followed
by one grouped aggregation per feature.  No rasterization step, no tiles:
the shuffle key is the feature id.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_geomodeling_spark.functions import (parse_percentile_statistic,
                                              statistic_expr)
from dask_geomodeling_spark.geometry.base import BaseSingle, GeometryBlock
from dask_geomodeling_spark.raster.base import RasterBlock

__all__ = ["AggregateRaster", "AggregateRasterAboveThreshold"]


class AggregateRaster(BaseSingle):
    """Per-feature raster statistic (reference: geometry/aggregate.py:255).

    Args:
      source: GeometryBlock with box (or point) geometry columns.
      raster: RasterBlock to aggregate.
      statistic: sum | count | min | max | mean | median | p<q>
        (reference STATISTICS, aggregate.py:310).
      column_name: output column (default "agg").

    ``pixel_size`` (int > 1) RESAMPLES before aggregating, like the
    reference's request-grid rasterization (aggregate.py:255+): cells
    coarsen to ``pixel_size``-sized blocks by DECIMAL block-mean (one
    extra keyed aggregation, exact and order-independent), and features
    match every block their box touches.  ``projection``/``max_pixels``/
    ``auto_pixel_size`` are accepted for API parity (the cell table has
    no CRS-dependent resampling).
    """

    def __init__(self, source, raster, statistic="sum",
                 projection=None, pixel_size=None, max_pixels=None,
                 column_name="agg", auto_pixel_size=False):
        if not isinstance(source, GeometryBlock):
            raise TypeError("'{}' object is not allowed".format(type(source)))
        if not isinstance(raster, RasterBlock):
            raise TypeError("'{}' object is not allowed".format(type(raster)))
        # list-of-statistics extension: every statistic shares the ONE
        # range join + grouped aggregation (each extra statistic would
        # otherwise re-join and re-scan the whole cell table); the
        # reference API's single string stays valid.
        stats = ([s.lower() for s in statistic]
                 if isinstance(statistic, (list, tuple))
                 else [statistic.lower()])
        names = (list(column_name)
                 if isinstance(column_name, (list, tuple))
                 else [column_name])
        if len(stats) != len(names):
            raise ValueError("statistic and column_name lengths differ")
        for s in stats:
            if (s not in ("sum", "count", "min", "max", "mean", "median",
                          "std", "var", "majority")
                    and parse_percentile_statistic(s) is None):
                raise ValueError("Unknown statistic '{}'".format(s))
        if isinstance(statistic, (list, tuple)):
            statistic, column_name = stats, names
        else:
            statistic, column_name = stats[0], names[0]
        super().__init__(source, raster, statistic, projection, pixel_size,
                         max_pixels, column_name, auto_pixel_size)

    @property
    def raster(self):
        return self.args[1]

    @property
    def statistic(self):
        return self.args[2]

    @property
    def column_name(self):
        return self.args[6]

    @property
    def _stat_pairs(self):
        stat, name = self.args[2], self.args[6]
        if isinstance(stat, (list, tuple)):
            return list(zip(stat, name))
        return [(stat, name)]

    @property
    def columns(self):
        return set(self.source.columns) | {n for _, n in self._stat_pairs}

    def _cells(self, ctx):
        cells = self.raster._build(ctx).filter(F.col("value").isNotNull())
        p = self.args[4]
        if p is not None and int(p) > 1:
            p = int(p)
            # block-mean downsample: coarse cell (Y, X) covers original
            # [Y*p, Y*p+p) x [X*p, X*p+p); DECIMAL mean is exact.  The
            # coarse cell is re-addressed by its block ORIGIN so the
            # feature boxes (original units) join with a touch test.
            cells = (cells.groupBy(
                "time",
                (F.floor(F.col("y") / p) * p).alias("y"),
                (F.floor(F.col("x") / p) * p).alias("x"))
                .agg((F.sum(F.col("value").cast("decimal(28,6)"))
                      .cast("double") / F.count(F.lit(1)))
                     .alias("value"))
                .withColumn("_span", F.lit(p - 1)))
        else:
            cells = cells.withColumn("_span", F.lit(0))
        return cells

    def _joined(self, ctx):
        """(features, joined, idx): the shared bbox range join +
        exact-mask candidate frame every statistic variant consumes —
        one join regardless of how many outputs derive from it."""
        idx = self.source.index_column
        features = self.source._build(ctx)
        cells = self._cells(ctx)
        cols = set(features.columns)
        if {"xmin", "ymin", "xmax", "ymax"} <= cols:
            keep = [c for c in ("vertices", "rings") if c in cols]
            boxes = features.select(idx, "xmin", "ymin", "xmax", "ymax",
                                    *keep)
            cond = ((cells["x"] + cells["_span"] >= boxes["xmin"])
                    & (cells["x"] <= boxes["xmax"])
                    & (cells["y"] + cells["_span"] >= boxes["ymin"])
                    & (cells["y"] <= boxes["ymax"]))
            if keep:
                # exact polygon mask (reference masks by actual geometry,
                # aggregate.py:75): bbox range-join prunes candidates,
                # the ray-cast keeps cells whose point lies in the
                # geometry — the full ring set (holes/multipolygon)
                # wins over the single exterior ring
                from dask_geomodeling_spark.geometry.geom_operations \
                    import point_in_polygon_expr, point_in_rings_expr
                if "rings" in cols:
                    mask = F.when(boxes["rings"].isNotNull(),
                                  point_in_rings_expr("x", "y"))
                    if "vertices" in cols:
                        mask = mask.when(boxes["vertices"].isNotNull(),
                                         point_in_polygon_expr("x", "y"))
                    cond = cond & mask.otherwise(F.lit(True))
                else:
                    cond = cond & (boxes["vertices"].isNull()
                                   | point_in_polygon_expr("x", "y"))
        elif {"x", "y"} <= cols:
            boxes = features.select(idx, F.floor("x").alias("_fx"),
                                    F.floor("y").alias("_fy"))
            cond = (cells["x"] == boxes["_fx"]) & (cells["y"] == boxes["_fy"])
        else:
            raise ValueError("AggregateRaster requires geometry columns")
        # feature side is the small side: broadcast it under the range join
        return features, cells.join(F.broadcast(boxes), cond, "inner"), idx

    def _build(self, ctx):
        features, joined, idx = self._joined(ctx)
        plain = [(s, n) for s, n in self._stat_pairs if s != "majority"]
        major = [n for s, n in self._stat_pairs if s == "majority"]
        stats = None
        if plain:
            stats = (joined.groupBy(idx)
                     .agg(*[statistic_expr(s).alias(n)
                            for s, n in plain]))
        if major:
            # zonal MAJORITY (deterministic mode): per-(zone, value)
            # counts, then the (max count, min value) member via one
            # native struct-min — ties break toward the SMALLEST
            # value, engine-exact (no unordered mode() reliance)
            mode = (joined.groupBy(idx, F.col("value"))
                    .agg(F.count(F.lit(1)).alias("_cnt"))
                    .groupBy(idx)
                    .agg(F.min(F.struct(
                        (-F.col("_cnt")).alias("nc"),
                        F.col("value").alias("v")))["v"]
                        .alias(major[0])))
            for extra in major[1:]:
                mode = mode.withColumn(extra, F.col(major[0]))
            stats = mode if stats is None else stats.join(mode, idx,
                                                          "outer")
        return features.join(stats, idx, "left")


class AggregateRasterAboveThreshold(AggregateRaster):
    """Per-feature statistic over cells above a per-feature threshold
    column (reference: geometry/aggregate.py:590)."""

    def __init__(self, source, raster, statistic="sum",
                 projection=None, pixel_size=None, max_pixels=None,
                 column_name="agg", auto_pixel_size=False,
                 threshold_name=None):
        if not isinstance(threshold_name, str):
            raise TypeError(
                "'{}' object is not allowed".format(type(threshold_name)))
        super().__init__(source, raster, statistic, projection, pixel_size,
                         max_pixels, column_name, auto_pixel_size)
        self.args = self.args + (threshold_name,)

    @property
    def threshold_name(self):
        return self.args[8]

    def _build(self, ctx):
        idx = self.source.index_column
        features = self.source._build(ctx)
        cells = self._cells(ctx)
        boxes = features.select(idx, "xmin", "ymin", "xmax", "ymax",
                                F.col(self.threshold_name).alias("_thr"))
        cond = ((cells["x"] + cells["_span"] >= boxes["xmin"])
                & (cells["x"] <= boxes["xmax"])
                & (cells["y"] + cells["_span"] >= boxes["ymin"])
                & (cells["y"] <= boxes["ymax"])
                & (cells["value"] >= boxes["_thr"]))
        joined = cells.join(F.broadcast(boxes), cond, "inner")
        stats = (joined.groupBy(boxes[idx])
                 .agg(*[statistic_expr(s).alias(n)
                        for s, n in self._stat_pairs]))
        return features.join(stats, idx, "left")


class AggregateRasterHistogram(AggregateRaster):
    """Zonal HISTOGRAM (the ArcGIS ZonalHistogram / rasterstats
    categorical-counts analogue; extends the reference's single-value
    statistics, aggregate.py:255): one output row per (feature,
    value-or-bin) with the cell count — the full distribution instead
    of one scalar.

    Same shared bbox range join + exact polygon mask as
    AggregateRaster (ONE join), then one grouped count keyed on
    (feature, bin).  ``bin_size=None`` counts DISTINCT CELL VALUES
    (categorical rasters); a float ``bin_size`` floors values into
    ``bin_size``-wide bins keyed by their lower edge (continuous
    rasters — bounded output regardless of value cardinality).

    Output: ``<index>``, ``bin`` (value or bin lower edge, double),
    ``count`` (bigint).  Features intersecting no cells emit nothing
    (join with the feature frame downstream for zero rows).
    """

    def __init__(self, source, raster, statistic="count",
                 projection=None, pixel_size=None, max_pixels=None,
                 column_name="agg", auto_pixel_size=False,
                 bin_size=None):
        # the first 8 params mirror AggregateRaster's arg layout so
        # graph serialization round-trips through cls(*args);
        # ``statistic``/``column_name`` are layout placeholders here.
        # Pass ``bin_size`` BY KEYWORD.
        if bin_size is not None and not float(bin_size) > 0:
            raise ValueError("bin_size must be > 0")
        super().__init__(source, raster, "count", projection,
                         pixel_size, max_pixels, "agg",
                         auto_pixel_size)
        # appended AFTER the parent contract args so every inherited
        # self.args[i] index keeps meaning (token not yet computed)
        self.args = self.args + (
            None if bin_size is None else float(bin_size),)

    @property
    def columns(self):
        return {self.source.index_column, "bin", "count"}

    def _build(self, ctx):
        _, joined, idx = self._joined(ctx)
        b = self.args[-1]
        binned = (F.col("value").cast("double") if b is None
                  else F.floor(F.col("value") / b) * b)
        return (joined.groupBy(idx, binned.alias("bin"))
                .agg(F.count(F.lit(1)).cast("bigint").alias("count")))
