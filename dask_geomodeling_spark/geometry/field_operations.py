"""Field operations on SeriesBlocks (reference:
geometry/field_operations.py).

Every operation here compiles to a pure Catalyst ``Column`` expression over
the root frame — chains of field operations fuse into a single projection
inside whole-stage codegen: no UDF, no shuffle, no driver involvement.
NULL is the 'no data' marker; comparisons follow SQL three-valued logic
(the reference follows pandas, where comparison to NaN yields False — a
documented, deliberate deviation so that Spark and any ANSI-SQL oracle
agree bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dask_geomodeling_spark.geometry.base import (BaseSingleSeries,
                                                  GeometryBlock, SeriesBlock,
                                                  series_column)

__all__ = [
    "Classify", "ClassifyFromColumns",
    "Add", "Subtract", "Multiply", "Divide", "FloorDivide", "Power",
    "Modulo", "Equal", "NotEqual", "Greater", "GreaterEqual", "Less",
    "LessEqual", "And", "Or", "Xor", "Invert", "Where", "Mask", "Round",
    "Interp", "Choose",
]


def classify_column(col, bins, labels, right=True):
    """Shared CASE-expression builder for Classify (feature plane,
    reference geometry/field_operations.py:48) and raster Classify
    (reference raster/misc.py:331).  ``pd.cut`` semantics:

    - len(labels) == len(bins)+1: open bounds — values outside the bin
      edges map to the first/last label.
    - len(labels) == len(bins)-1: closed bounds — values outside map to
      no-data (NULL).
    """
    numeric = all(isinstance(lbl, (int, float)) and not isinstance(lbl, bool)
                  for lbl in labels)

    def lit(lbl):
        return F.lit(float(lbl)) if numeric else F.lit(lbl)

    open_bounds = len(labels) == len(bins) + 1
    null = F.lit(None).cast(T.DoubleType() if numeric else T.StringType())
    expr = F.when(col.isNull(), null)
    if open_bounds:
        edge_labels = labels
        inner_bins = bins
    else:
        # closed bounds: below bins[0] or above bins[-1] -> no data
        if right:
            expr = expr.when(col <= F.lit(float(bins[0])), null)
        else:
            expr = expr.when(col < F.lit(float(bins[0])), null)
        edge_labels = list(labels) + [None]
        inner_bins = bins[1:]
    for b, lbl in zip(inner_bins, edge_labels):
        cond = (col <= F.lit(float(b))) if right else (col < F.lit(float(b)))
        expr = expr.when(cond, lit(lbl) if lbl is not None else null)
    last = edge_labels[len(inner_bins)] if len(edge_labels) > len(inner_bins) \
        else None
    return expr.otherwise(lit(last) if last is not None else null)


class Classify(BaseSingleSeries):
    """Classify a value column into bins (reference:
    geometry/field_operations.py:48)."""

    def __init__(self, source, bins, labels, right=True):
        if not isinstance(bins, list):
            raise TypeError("'{}' object is not allowed".format(type(bins)))
        if not isinstance(labels, list):
            raise TypeError("'{}' object is not allowed".format(type(labels)))
        if not isinstance(right, bool):
            raise TypeError("'{}' object is not allowed".format(type(right)))
        if any(b2 < b1 for b1, b2 in zip(bins, bins[1:])):
            raise ValueError("'bins' must increase monotonically.")
        if len(labels) not in (len(bins) - 1, len(bins) + 1):
            raise ValueError("Expected {} or {} labels, got {}".format(
                len(bins) - 1, len(bins) + 1, len(labels)))
        if len(set(labels)) != len(labels):
            raise ValueError("Labels should be unique")
        super().__init__(source, bins, labels, right)

    @property
    def bins(self):
        return self.args[1]

    @property
    def labels(self):
        return self.args[2]

    @property
    def right(self):
        return self.args[3]

    def _column(self, df):
        return classify_column(self.source._column(df), self.bins,
                               self.labels, self.right)


class ClassifyFromColumns(SeriesBlock):
    """Classify with per-row bin edges taken from other columns
    (reference: geometry/field_operations.py:142).  The bin index is
    ``sum(value > bin_i)`` — a fused sum of conditionals, still pure
    codegen."""

    def __init__(self, source, value_column, bin_columns, labels, right=True):
        if not isinstance(source, GeometryBlock):
            raise TypeError("'{}' object is not allowed".format(type(source)))
        if not isinstance(value_column, str):
            raise TypeError(
                "'{}' object is not allowed".format(type(value_column)))
        if not isinstance(bin_columns, list):
            raise TypeError(
                "'{}' object is not allowed".format(type(bin_columns)))
        if not isinstance(labels, list):
            raise TypeError("'{}' object is not allowed".format(type(labels)))
        if source.columns:
            missing = (set(bin_columns) | {value_column}) - source.columns
            if missing:
                raise KeyError("Columns '{}' are not present".format(missing))
        if len(labels) not in (len(bin_columns) - 1, len(bin_columns) + 1):
            raise ValueError("Expected {} or {} labels, got {}".format(
                len(bin_columns) - 1, len(bin_columns) + 1, len(labels)))
        if len(set(labels)) != len(labels):
            raise ValueError("Labels should be unique")
        super().__init__(source, value_column, bin_columns, labels, right)

    def _root(self):
        return self.args[0]

    def _column(self, df):
        _, value_column, bin_columns, labels, right = self.args
        v = F.col(value_column)
        numeric = all(isinstance(l, (int, float)) and not isinstance(l, bool)
                      for l in labels)

        def lit(lbl):
            return F.lit(float(lbl)) if numeric else F.lit(lbl)

        idx = F.lit(0)
        for b in bin_columns:
            cond = (v > F.col(b)) if right else (v >= F.col(b))
            idx = idx + F.when(cond, 1).otherwise(0)
        if len(labels) == len(bin_columns) - 1:
            idx = idx - 1
        null = F.lit(None).cast(
            T.DoubleType() if numeric else T.StringType())
        expr = F.when(v.isNull(), null)
        for i, lbl in enumerate(labels):
            expr = expr.when(idx == i, lit(lbl))
        return expr.otherwise(null)


class BaseFieldOperation(BaseSingleSeries):
    """Base for binary series/constant operations (reference:
    geometry/field_operations.py:255)."""

    def __init__(self, source, other):
        # superset of the reference: string constants are allowed so
        # comparisons against categorical columns work
        if not isinstance(other, (SeriesBlock, int, float, bool, str)):
            raise TypeError("'{}' object is not allowed".format(type(other)))
        super().__init__(source, other)

    @property
    def other(self):
        return self.args[1]

    def _op(self, a, b):
        raise NotImplementedError

    def _column(self, df):
        return self._op(self.source._column(df),
                        series_column(self.other, df))


class Add(BaseFieldOperation):
    """reference: geometry/field_operations.py:272"""
    def _op(self, a, b):
        return a + b


class Subtract(BaseFieldOperation):
    """reference: geometry/field_operations.py:287"""
    def _op(self, a, b):
        return a - b


class Multiply(BaseFieldOperation):
    """reference: geometry/field_operations.py:305"""
    def _op(self, a, b):
        return a * b


class Divide(BaseFieldOperation):
    """reference: geometry/field_operations.py:321"""
    def _op(self, a, b):
        return a / b


class FloorDivide(BaseFieldOperation):
    """reference: geometry/field_operations.py:339 — ``np.floor_divide`` on
    float series returns float, so cast the BIGINT result of ``floor`` back
    to double to preserve the reference dtype."""
    def _op(self, a, b):
        return F.floor(a / b).cast("double")


class Power(BaseFieldOperation):
    """reference: geometry/field_operations.py:358"""
    def __init__(self, source, other):
        if not isinstance(other, (SeriesBlock, int, float)):
            raise TypeError("'{}' object is not allowed".format(type(other)))
        super().__init__(source, other)

    def _op(self, a, b):
        return F.pow(a, b)


class Modulo(BaseFieldOperation):
    """reference: geometry/field_operations.py:380 — python semantics
    (result has the sign of the divisor), i.e. ``pmod`` for positive
    divisors."""
    def _op(self, a, b):
        return a - F.floor(a / b) * b


class Equal(BaseFieldOperation):
    """reference: geometry/field_operations.py:400"""
    def _op(self, a, b):
        return a == b


class NotEqual(BaseFieldOperation):
    """reference: geometry/field_operations.py:418"""
    def _op(self, a, b):
        return a != b


class Greater(BaseFieldOperation):
    """reference: geometry/field_operations.py:436"""
    def _op(self, a, b):
        return a > b


class GreaterEqual(BaseFieldOperation):
    """reference: geometry/field_operations.py:452"""
    def _op(self, a, b):
        return a >= b


class Less(BaseFieldOperation):
    """reference: geometry/field_operations.py:468"""
    def _op(self, a, b):
        return a < b


class LessEqual(BaseFieldOperation):
    """reference: geometry/field_operations.py:484"""
    def _op(self, a, b):
        return a <= b


class BaseLogicOperation(BaseFieldOperation):
    """reference: geometry/field_operations.py:500 — both operands must be
    boolean series."""

    def __init__(self, source, other):
        if not isinstance(other, SeriesBlock):
            raise TypeError("'{}' object is not allowed".format(type(other)))
        super().__init__(source, other)


class And(BaseLogicOperation):
    """reference: geometry/field_operations.py:509"""
    def _op(self, a, b):
        return a & b


class Or(BaseLogicOperation):
    """reference: geometry/field_operations.py:527"""
    def _op(self, a, b):
        return a | b


class Xor(BaseLogicOperation):
    """reference: geometry/field_operations.py:545"""
    def _op(self, a, b):
        return a != b


class Invert(BaseSingleSeries):
    """Swap True/False (reference: geometry/field_operations.py:563)."""

    def _column(self, df):
        return ~self.source._column(df)


def _condition(cond, df):
    """Reference cond semantics (field_operations.py:577): non-boolean
    conditionals interpret data-present as True, missing as False."""
    col = cond._column(df)
    # determine boolean-ness from the resolved expression when possible
    try:
        dtype = df.select(col.alias("_c")).schema[0].dataType
    except Exception:
        dtype = None
    if isinstance(dtype, T.BooleanType):
        return F.coalesce(col, F.lit(False))
    return col.isNotNull()


class Where(BaseSingleSeries):
    """Replace values where cond is False (reference:
    geometry/field_operations.py:577)."""

    def __init__(self, source, cond, other):
        if not isinstance(cond, SeriesBlock):
            raise TypeError("'{}' object is not allowed".format(type(cond)))
        super().__init__(source, cond, other)

    @property
    def cond(self):
        return self.args[1]

    @property
    def other(self):
        return self.args[2]

    def _column(self, df):
        return F.when(_condition(self.cond, df),
                      self.source._column(df)) \
                .otherwise(series_column(self.other, df))


class Mask(BaseSingleSeries):
    """Replace values where cond is True (reference:
    geometry/field_operations.py:622)."""

    def __init__(self, source, cond, other):
        if not isinstance(cond, SeriesBlock):
            raise TypeError("'{}' object is not allowed".format(type(cond)))
        super().__init__(source, cond, other)

    @property
    def cond(self):
        return self.args[1]

    @property
    def other(self):
        return self.args[2]

    def _column(self, df):
        return F.when(_condition(self.cond, df),
                      series_column(self.other, df)) \
                .otherwise(self.source._column(df))


class Round(BaseSingleSeries):
    """reference: geometry/field_operations.py:667 (np.around =
    half-to-even; Spark ``bround`` matches)."""

    def __init__(self, source, decimals=0):
        if not isinstance(decimals, int):
            raise TypeError(
                "'{}' object is not allowed".format(type(decimals)))
        super().__init__(source, decimals)

    def _column(self, df):
        return F.bround(self.source._column(df), self.args[1])


class Interp(BaseSingleSeries):
    """Piecewise-linear interpolation (reference:
    geometry/field_operations.py:690, np.interp semantics) as a fused CASE
    expression — exact at the knots, pure codegen."""

    def __init__(self, source, xp, fp, left=None, right=None):
        xp = [float(x) for x in xp]
        fp = [float(x) for x in fp]
        if left is not None:
            left = float(left)
        if right is not None:
            right = float(right)
        if any(b < a for a, b in zip(xp, xp[1:])):
            raise ValueError("xp must be monotonically increasing")
        super().__init__(source, xp, fp, left, right)

    def _column(self, df):
        _, xp, fp, left, right = self.args
        x = self.source._column(df).cast("double")
        left = fp[0] if left is None else left
        right = fp[-1] if right is None else right
        expr = F.when(x.isNull(), F.lit(None).cast("double"))
        expr = expr.when(x < F.lit(xp[0]), F.lit(left))
        for (x0, x1), (y0, y1) in zip(zip(xp, xp[1:]), zip(fp, fp[1:])):
            if x1 == x0:
                continue
            frac = (x - F.lit(x0)) / F.lit(x1 - x0)
            expr = expr.when(x <= F.lit(x1), F.lit(y0) + frac * F.lit(y1 - y0))
        return expr.otherwise(F.lit(right))


class Choose(BaseSingleSeries):
    """Pick per-row from n series by integer index (reference:
    geometry/field_operations.py:726).  Out-of-bounds -> NULL."""

    def __init__(self, source, *choices):
        if not len(choices) >= 2:
            raise ValueError("The number of choices must be greater than one.")
        if not all(isinstance(c, SeriesBlock) for c in choices):
            raise TypeError("All choices must be SeriesBlock objects")
        super().__init__(source, *choices)

    @property
    def choices(self):
        return self.args[1:]

    def _column(self, df):
        idx = self.source._column(df).cast("int")
        arr = F.array(*[c._column(df) for c in self.choices])
        n = len(self.choices)
        return F.when((idx >= 0) & (idx < n), F.element_at(arr, idx + 1))
