"""Feature-plane base blocks (reference: geometry/base.py).

A GeometryBlock is a lazy **Spark DataFrame of features**: arbitrary
property columns plus optional geometry carried as typed columns (point
``x``/``y`` doubles, axis-aligned box ``xmin/ymin/xmax/ymax``, or a ``wkt``
string for parity).  A SeriesBlock is the block equivalent of a single
column — in Spark terms, a lazily composed ``Column`` expression over its
root GeometryBlock, so chains of field operations compile to a single
projection (no shuffle, whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_geomodeling_spark.core.blocks import Block, BuildContext

__all__ = ["GeometryBlock", "SeriesBlock", "GetSeriesBlock",
           "SetSeriesBlock", "BaseSingle", "BaseSingleSeries"]

GEOMETRY_COLUMNS = ("x", "y", "xmin", "ymin", "xmax", "ymax", "wkt",
                    "vertices", "rings")


def _parse_filters(filters):
    """Django-ORM-style filters → list of Spark Column predicates
    (reference: geometry/sources.py GeometryFileSource.process applies
    ``id=598``-style filters)."""
    out = []
    ops = {
        "eq": lambda c, v: c == v,
        "ne": lambda c, v: c != v,
        "gt": lambda c, v: c > v,
        "gte": lambda c, v: c >= v,
        "lt": lambda c, v: c < v,
        "lte": lambda c, v: c <= v,
        "in": lambda c, v: c.isin(list(v)),
        "isnull": lambda c, v: c.isNull() if v else c.isNotNull(),
        "contains": lambda c, v: c.contains(v),
        "startswith": lambda c, v: c.startswith(v),
        "endswith": lambda c, v: c.endswith(v),
    }
    for key, value in (filters or {}).items():
        field, _, op = key.partition("__")
        if not op:
            op = "eq"
        if op not in ops:
            raise ValueError("Unsupported filter operator '{}'".format(op))
        out.append(ops[op](F.col(field), value))
    return out


def apply_feature_request(df, request, time_column=None):
    """Translate the reference's pull-based geometry request
    (geometry/base.py:10 docstring: mode/geometry/filters/limit/start/stop)
    into relational predicates on the feature frame.  Filters land in the
    WHERE clause so Catalyst pushes them into the parquet scan.

    A filter references the source that OWNS the column (the reference
    applies filters per-source, pre-merge — sources.py:18); in a
    multi-source view each source applies its own columns' predicates
    and ignores the rest."""
    cols = set(df.columns)
    for key, pred in zip((request.get("filters") or {}),
                         _parse_filters(request.get("filters"))):
        field = key.partition("__")[0]
        if field in cols:
            df = df.filter(pred)

    start, stop = request.get("start"), request.get("stop")
    if time_column and (start or stop):
        # UTC-instant bounds rendered in the COLUMN's own type, so
        # the predicate stays pushdown-able and session-timezone
        # independent (r14 review: a timestamp literal against a
        # DATE/STRING column moves a session-tz cast onto the column
        # side — wrong boundaries AND no PushedFilters).  DATE
        # columns compare in date space with exact ceil/floor;
        # STRING columns compare lexicographically against the
        # zero-padded ISO rendering (the documented string-time
        # contract); timestamps get the raw-micros literal.
        import datetime as _dt

        from pyspark.sql import types as T

        from dask_geomodeling_spark.utils import request_instant_us
        DAY_US = 86400000000
        dtype = df.schema[time_column].dataType
        c = F.col(time_column)

        def bound(v, is_start):
            us = request_instant_us(v)
            if isinstance(dtype, T.DateType):
                days, rem = divmod(us, DAY_US)
                if is_start and rem:
                    days += 1   # midnight(d) < bound → first day OUT
                return F.lit(_dt.date(1970, 1, 1)
                             + _dt.timedelta(days=days))
            return F.timestamp_micros(F.lit(us))

        if isinstance(dtype, T.StringType):
            # documented string-time contract (docs/api-geometry.md
            # and the time_column docstrings): zero-padded UTC ISO
            # text 'YYYY-MM-DD[ HH:MM:SS[.ffffff]]'.  Common wild
            # variants normalize before the exact compare (r15
            # advice: the bare lexicographic compare silently
            # misfiltered them): 'T' separators become spaces, a
            # trailing 'Z' drops, bare dates read as midnight, and
            # short fractions zero-pad to 6 digits (longer fractions
            # truncate — the bounds are microsecond instants).  The
            # normalization is not pushdown-able, so a DATE-floor/
            # ceil predicate on the UNTOUCHED column does the
            # scan-level pruning (dates are unaffected by every
            # variant above).
            # BOTH sides normalize to the fixed 26-char
            # 'YYYY-MM-DD HH:MM:SS.ffffff' form — comparing a padded
            # value against an unpadded bound (or vice versa) breaks
            # equality at the bound for explicit zero fractions
            # ('…00.000000' vs '…00' — r15 review)
            norm = F.translate(c, "TZ", " ")   # T→' ', Z deleted
            norm = F.when(F.length(norm) == 10,
                          F.concat(norm, F.lit(" 00:00:00"))
                          ).otherwise(norm)
            norm = F.when(norm.contains("."),
                          F.rpad(norm, 26, "0")
                          ).otherwise(F.concat(norm,
                                               F.lit(".000000")))
            _day0 = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)

            def str_bound(us):
                iso = _day0 + _dt.timedelta(microseconds=us)
                s = iso.strftime("%Y-%m-%d %H:%M:%S")
                s += ".{:06d}".format(iso.microsecond)
                return s, iso

            if start:
                s, iso = str_bound(request_instant_us(start))
                df = df.filter((c >= iso.strftime("%Y-%m-%d"))
                               & (norm >= F.lit(s)))
            if stop:
                s, iso = str_bound(request_instant_us(stop))
                nxt = (iso + _dt.timedelta(days=1)).strftime("%Y-%m-%d")
                df = df.filter((c < nxt) & (norm <= F.lit(s)))
        else:
            if start:
                df = df.filter(c >= bound(start, True))
            if stop:
                df = df.filter(c <= bound(stop, False))

    geometry = request.get("geometry")  # (xmin, ymin, xmax, ymax) bbox
    if isinstance(geometry, str):
        # WKT request geometry (POINT / box / general POLYGON): the
        # SCAN-level predicate is always the bbox (pushes to parquet);
        # an exact polygon clip is the Intersection block's job
        # (set_operations._clip_to_polygon)
        from dask_geomodeling_spark.geometry.sources import (
            parse_point_or_box_wkt)
        f = parse_point_or_box_wkt(geometry)
        geometry = ((f["x"], f["y"], f["x"], f["y"]) if "x" in f
                    else (f["xmin"], f["ymin"], f["xmax"], f["ymax"]))
    if geometry is not None:
        x1, y1, x2, y2 = geometry
        cols = set(df.columns)
        mode = request.get("mode", "intersects")
        # bbox columns take precedence: a mixed-geometry frame (e.g. a
        # GeoJSON read) carries x/y only for Points but a bbox for every
        # feature (degenerate for Points), so the bbox predicate is the
        # one that covers all rows
        if {"xmin", "ymin", "xmax", "ymax"} <= cols:
            pass  # handled below
        elif {"x", "y"} <= cols:
            df = df.filter((F.col("x") >= x1) & (F.col("x") <= x2)
                           & (F.col("y") >= y1) & (F.col("y") <= y2))
        if {"xmin", "ymin", "xmax", "ymax"} <= cols:
            if mode == "centroid":
                cx = (F.col("xmin") + F.col("xmax")) / 2
                cy = (F.col("ymin") + F.col("ymax")) / 2
                if "vertices" in cols or "rings" in cols:
                    # exact area-weighted centroid when polygon rings
                    # are present (bbox midpoint for box rows); the
                    # full ring set (holes/multipolygon) wins over the
                    # single exterior ring
                    from dask_geomodeling_spark.geometry \
                        .geom_operations import (centroid_expr,
                                                 rings_centroid_expr)
                    if "rings" in cols:
                        mx, my = rings_centroid_expr()
                        multi = F.col("rings").isNotNull()
                        cx = F.when(multi, mx).otherwise(cx)
                        cy = F.when(multi, my).otherwise(cy)
                    if "vertices" in cols:
                        rx, ry = centroid_expr()
                        ring = F.col("vertices").isNotNull()
                        if "rings" in cols:
                            ring = ring & F.col("rings").isNull()
                        cx = F.when(ring, rx).otherwise(cx)
                        cy = F.when(ring, ry).otherwise(cy)
                df = df.filter((cx >= x1) & (cx <= x2)
                               & (cy >= y1) & (cy <= y2))
            else:
                df = df.filter((F.col("xmin") <= x2) & (F.col("xmax") >= x1)
                               & (F.col("ymin") <= y2) & (F.col("ymax") >= y1))

    min_size = request.get("min_size")
    if min_size and {"xmin", "ymin", "xmax", "ymax"} <= set(df.columns):
        df = df.filter(((F.col("xmax") - F.col("xmin")) >= min_size)
                       | ((F.col("ymax") - F.col("ymin")) >= min_size))

    if request.get("limit"):
        # deterministic head: the reference returns the first N rows by
        # index (geometry/base.py:33+).  An ordered limit compiles to
        # TakeOrderedAndProject (per-partition top-N + driver merge — no
        # full sort/shuffle), so determinism is free at scale.
        order = (time_column if time_column in df.columns
                 else "id" if "id" in df.columns else df.columns[0])
        df = df.orderBy(order).limit(int(request["limit"]))
    return df


class GeometryBlock(Block):
    """Base feature-plane block (reference: geometry/base.py:10).

    Subclasses expose ``columns`` (set of expected column names) and an
    ``index_column`` used for cross-lineage alignment (the Spark analogue
    of the reference's pandas index).
    """

    @property
    def columns(self):
        raise NotImplementedError

    @property
    def index_column(self):
        # first source block's index by default
        for arg in self.args:
            if isinstance(arg, GeometryBlock):
                return arg.index_column
        return "id"

    def __getitem__(self, name):
        return GetSeriesBlock(self, name)

    def __setitem__(self, *args, **kwargs):
        raise NotImplementedError("Please use block.set to set a column.")

    def set(self, *args):
        return SetSeriesBlock(self, *args)

    @property
    def projection(self):
        """Native CRS of this block's geometry columns — inherited from
        the first geometry source (sources default to EPSG:4326)."""
        for arg in self.args:
            if isinstance(arg, GeometryBlock):
                return arg.projection
        return "EPSG:4326"

    def get_data(self, spark=None, **request):
        """Reference response contract (geometry/base.py:33): a dict with
        ``features`` (here: a lazy Spark DataFrame) and ``projection``;
        ``mode="extent"`` returns the bbox of matching features.

        A ``projection`` in the request that differs from the block's
        native CRS reprojects the RESULT geometry columns to it with
        the closed-form transforms (reference: every geometry request
        carries a projection and sources deliver data in it —
        geometry/base.py:33+).  Unsupported CRS pairs raise, like the
        reference does without a matching PROJ definition."""
        df = self.plan(spark, **request)
        projection = request.get("projection", self.projection)
        if request.get("mode") == "extent":
            cols = set(df.columns)
            if {"x", "y"} <= cols:
                row = df.agg(F.min("x"), F.min("y"),
                             F.max("x"), F.max("y")).first()
            elif {"xmin", "ymin", "xmax", "ymax"} <= cols:
                row = df.agg(F.min("xmin"), F.min("ymin"),
                             F.max("xmax"), F.max("ymax")).first()
            else:
                row = (None, None, None, None)
            extent = tuple(row)
            if projection != self.projection:
                from dask_geomodeling_spark.geometry.proj import (
                    transform_extent)
                extent = transform_extent(extent, self.projection,
                                          projection)
            return {"extent": extent, "projection": projection}
        if projection != self.projection:
            from dask_geomodeling_spark.geometry.proj import (
                apply_reproject)
            df = apply_reproject(df, self.projection, projection,
                                 strict=False)
        return {"features": df, "projection": projection}

    def to_file(self, *args, **kwargs):
        from dask_geomodeling_spark.geometry.sinks import to_file
        return to_file(self, *args, **kwargs)


class SeriesBlock(Block):
    """One column of a GeometryBlock (reference: geometry/base.py:99).

    Compiles to a Spark ``Column`` over the root frame: ``_root()`` names
    the GeometryBlock the series is anchored to, ``_column(df)`` produces
    the expression against that frame.  Same-root operations therefore fuse
    into one projection — the hot path stays inside whole-stage codegen.
    """

    def _root(self):
        for arg in self.args:
            if isinstance(arg, SeriesBlock):
                return arg._root()
            if isinstance(arg, GeometryBlock):
                return arg
        raise NotImplementedError

    def _column(self, df):
        raise NotImplementedError

    # operator sugar mirroring the reference's SeriesBlock.__add__ etc.
    def __add__(self, other):
        from dask_geomodeling_spark.geometry.field_operations import Add
        return Add(self, other)

    def __sub__(self, other):
        from dask_geomodeling_spark.geometry.field_operations import Subtract
        return Subtract(self, other)

    def __mul__(self, other):
        from dask_geomodeling_spark.geometry.field_operations import Multiply
        return Multiply(self, other)

    def __truediv__(self, other):
        from dask_geomodeling_spark.geometry.field_operations import Divide
        return Divide(self, other)

    def __neg__(self):
        from dask_geomodeling_spark.geometry.field_operations import Multiply
        return Multiply(self, -1)

    def __floordiv__(self, other):
        from dask_geomodeling_spark.geometry.field_operations import (
            FloorDivide)
        return FloorDivide(self, other)

    def __mod__(self, other):
        from dask_geomodeling_spark.geometry.field_operations import Modulo
        return Modulo(self, other)

    def __pow__(self, other):
        from dask_geomodeling_spark.geometry.field_operations import Power
        return Power(self, other)

    # comparisons build blocks, exactly like the reference
    # (geometry/base.py:151-180) — so `series == 3` is a view, not a bool.
    # __hash__ must be restored explicitly: defining __eq__ would
    # otherwise clear it, and blocks rely on identity hashing.
    def __eq__(self, other):
        from dask_geomodeling_spark.geometry.field_operations import Equal
        return Equal(self, other)

    def __ne__(self, other):
        from dask_geomodeling_spark.geometry.field_operations import NotEqual
        return NotEqual(self, other)

    def __gt__(self, other):
        from dask_geomodeling_spark.geometry.field_operations import Greater
        return Greater(self, other)

    def __ge__(self, other):
        from dask_geomodeling_spark.geometry.field_operations import (
            GreaterEqual)
        return GreaterEqual(self, other)

    def __lt__(self, other):
        from dask_geomodeling_spark.geometry.field_operations import Less
        return Less(self, other)

    def __le__(self, other):
        from dask_geomodeling_spark.geometry.field_operations import LessEqual
        return LessEqual(self, other)

    def __invert__(self):
        from dask_geomodeling_spark.geometry.field_operations import Invert
        return Invert(self)

    def __and__(self, other):
        from dask_geomodeling_spark.geometry.field_operations import And
        return And(self, other)

    def __or__(self, other):
        from dask_geomodeling_spark.geometry.field_operations import Or
        return Or(self, other)

    def __xor__(self, other):
        from dask_geomodeling_spark.geometry.field_operations import Xor
        return Xor(self, other)

    __hash__ = object.__hash__

    def _build(self, ctx: BuildContext):
        """A series materializes as (index, value) over its root frame."""
        root = self._root()
        df = root._build(ctx)
        return df.select(F.col(root.index_column),
                         self._column(df).alias("value"))


def series_column(obj, df):
    """Column for a SeriesBlock or literal constant."""
    if isinstance(obj, SeriesBlock):
        return obj._column(df)
    return F.lit(obj)


class GetSeriesBlock(SeriesBlock):
    """Select a column (reference: geometry/base.py:202)."""

    def __init__(self, source, name):
        if not isinstance(source, GeometryBlock):
            raise TypeError("'{}' object is not allowed".format(type(source)))
        if not isinstance(name, str):
            raise TypeError("'{}' object is not allowed".format(type(name)))
        if source.columns and name not in source.columns:
            raise KeyError("Column '{}' is not available".format(name))
        super().__init__(source, name)

    def _root(self):
        return self.args[0]

    def _column(self, df):
        return F.col(self.args[1])


class SetSeriesBlock(GeometryBlock):
    """Attach computed series as columns (reference: geometry/base.py:240).

    ``SetSeriesBlock(source, "a", series_a, "b", series_b, ...)``.
    Series anchored on the same root fuse into one projection; series from
    a different lineage are aligned with a join on the index column
    (broadcast when the other side is small — Catalyst/AQE decides).
    """

    def __init__(self, source, *args):
        if not isinstance(source, GeometryBlock):
            raise TypeError("'{}' object is not allowed".format(type(source)))
        if len(args) % 2 != 0:
            raise ValueError("Please provide a value for each column")
        for name in args[::2]:
            if not isinstance(name, str):
                raise TypeError("Column names must be strings")
        super().__init__(source, *args)

    @property
    def source(self):
        return self.args[0]

    @property
    def columns(self):
        return set(self.source.columns) | set(self.args[1::2])

    def _build(self, ctx):
        source = self.source
        df = source._build(ctx)
        for name, value in zip(self.args[1::2], self.args[2::2]):
            if isinstance(value, SeriesBlock):
                root = value._root()
                if root.token == source.token or root is source:
                    df = df.withColumn(name, value._column(df))
                else:
                    idx = root.index_column
                    other = root._build(ctx)
                    other = other.select(
                        F.col(idx),
                        value._column(other).alias(name))
                    df = df.join(other, on=idx, how="left")
            else:
                df = df.withColumn(name, F.lit(value))
        return df


class BaseSingle(GeometryBlock):
    """Single-source passthrough base (reference: geometry/base.py:303)."""

    def __init__(self, source, *args):
        if not isinstance(source, GeometryBlock):
            raise TypeError("'{}' object is not allowed".format(type(source)))
        super().__init__(source, *args)

    @property
    def source(self):
        return self.args[0]

    @property
    def columns(self):
        return self.source.columns


class BaseSingleSeries(SeriesBlock):
    """Single-series base (reference: geometry/base.py:320)."""

    def __init__(self, source, *args):
        if not isinstance(source, SeriesBlock):
            raise TypeError("'{}' object is not allowed".format(type(source)))
        super().__init__(source, *args)

    @property
    def source(self):
        return self.args[0]

    def _root(self):
        return self.source._root()
