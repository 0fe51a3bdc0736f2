"""Elementwise raster operations (reference: raster/elemwise.py).

Scalar operands compile to pure column projections — zero shuffle, full
whole-stage codegen.  Raster⋈raster operands align with a single equi-join
on (time, y, x) (full outer: the combined extent, NULL propagation = the
reference's no-data propagation).  NULL is no-data, so SQL null semantics
implement the reference's no-data rules natively.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_geomodeling_spark.raster.base import BaseSingle, RasterBlock, align

__all__ = ["Add", "Subtract", "Multiply", "Divide", "Power",
           "Equal", "NotEqual", "Greater", "GreaterEqual", "Less",
           "LessEqual", "Invert", "IsData", "IsNoData", "And", "Or", "Xor",
           "FillNoData", "Exp", "Log", "Log10"]


def _scalar_chain(block):
    """Decompose ``block`` into ``(leaf, fn)`` where ``fn`` maps the leaf's
    ``value`` Column to this block's value, IF the block is a chain of
    per-cell column transforms (scalar elementwise / exp / log / invert)
    over a single raster.  Returns None for anything that changes the cell
    set (joins, filters, temporal ops) — those must keep their own plan.

    Two chains over the SAME leaf (by token) need no alignment join: the
    cell coordinates are identical by construction, so the combined op is
    one projection over one scan — no shuffle at any scale."""
    if isinstance(block, BaseElementwise):
        a, b = block.args[0], block.args[1]
        ra, rb = isinstance(a, RasterBlock), isinstance(b, RasterBlock)
        if ra and rb:
            return None
        sub = _scalar_chain(a if ra else b)
        if sub is None:
            return None
        leaf, fn = sub
        if ra:
            return leaf, lambda c, _b=block, _f=fn, _s=b: \
                _b._op(_f(c), F.lit(_s))
        return leaf, lambda c, _b=block, _f=fn, _s=a: \
            _b._op(F.lit(_s), _f(c))
    if isinstance(block, BaseLogExp):
        sub = _scalar_chain(block.store)
        if sub is None:
            return None
        leaf, fn = sub
        return leaf, lambda c, _b=block, _f=fn: _b._op(_f(c))
    if isinstance(block, Invert):
        sub = _scalar_chain(block.store)
        if sub is None:
            return None
        leaf, fn = sub
        return leaf, lambda c, _f=fn: ~_f(c).cast("boolean")
    if isinstance(block, RasterBlock):
        return block, lambda c: c
    return None


class BaseElementwise(RasterBlock):
    """Base for elementwise combinations (reference: raster/elemwise.py:37)."""

    def __init__(self, *args):
        if not any(isinstance(a, RasterBlock) for a in args):
            raise TypeError("At least one argument must be a RasterBlock")
        super().__init__(*args)

    def _op(self, a, b):
        raise NotImplementedError

    def _fused(self, ctx, cast=None):
        """Single-scan plan when both raster operands are scalar chains
        over one leaf; None when alignment genuinely needs a join."""
        a, b = self.args[0], self.args[1]
        ca, cb = _scalar_chain(a), _scalar_chain(b)
        if ca is None or cb is None or ca[0].token != cb[0].token:
            return None
        df = ca[0]._build(ctx)
        va, vb = ca[1](F.col("value")), cb[1](F.col("value"))
        if cast:
            va, vb = va.cast(cast), vb.cast(cast)
        return df.select("time", "y", "x",
                         self._op(va, vb).alias("value"))

    def _build(self, ctx):
        a, b = self.args[0], self.args[1]
        if isinstance(a, RasterBlock) and isinstance(b, RasterBlock):
            fused = self._fused(ctx)
            if fused is not None:
                return fused
            joined = align([a._build(ctx), b._build(ctx)], how="full")
            value = self._op(F.col("v0"), F.col("v1"))
            return joined.select("time", "y", "x", value.alias("value"))
        if isinstance(a, RasterBlock):
            df = a._build(ctx)
            value = self._op(F.col("value"), F.lit(b))
        else:
            df = b._build(ctx)
            value = self._op(F.lit(a), F.col("value"))
        return df.select("time", "y", "x", value.alias("value"))


class BaseMath(BaseElementwise):
    """reference: raster/elemwise.py:194 — numeric operands only."""

    def __init__(self, a, b):
        for x in (a, b):
            if not isinstance(x, (RasterBlock, int, float)):
                raise TypeError("'{}' object is not allowed".format(type(x)))
        super().__init__(a, b)


class Add(BaseMath):
    """reference: raster/elemwise.py:302"""
    def _op(self, a, b):
        return a + b


class Subtract(BaseMath):
    """reference: raster/elemwise.py:321"""
    def _op(self, a, b):
        return a - b


class Multiply(BaseMath):
    """reference: raster/elemwise.py:340"""
    def _op(self, a, b):
        return a * b


class Divide(BaseMath):
    """reference: raster/elemwise.py:359"""
    def _op(self, a, b):
        return a / b


class Power(BaseMath):
    """reference: raster/elemwise.py:383"""
    def _op(self, a, b):
        return F.pow(a, b)


class BaseComparison(BaseMath):
    """reference: raster/elemwise.py:204 — output is boolean (no-data where
    either side is no-data)."""


class Equal(BaseComparison):
    """reference: raster/elemwise.py:409"""
    def _op(self, a, b):
        return a == b


class NotEqual(BaseComparison):
    """reference: raster/elemwise.py:432"""
    def _op(self, a, b):
        return a != b


class Greater(BaseComparison):
    """reference: raster/elemwise.py:455"""
    def _op(self, a, b):
        return a > b


class GreaterEqual(BaseComparison):
    """reference: raster/elemwise.py:479"""
    def _op(self, a, b):
        return a >= b


class Less(BaseComparison):
    """reference: raster/elemwise.py:503"""
    def _op(self, a, b):
        return a < b


class LessEqual(BaseComparison):
    """reference: raster/elemwise.py:527"""
    def _op(self, a, b):
        return a <= b


class Invert(BaseSingle):
    """Swap True/False (reference: raster/elemwise.py:551)."""

    def _build(self, ctx):
        df = self.store._build(ctx)
        return df.select("time", "y", "x",
                         (~F.col("value").cast("boolean")).alias("value"))


class IsData(BaseSingle):
    """True where raster has data (reference: raster/elemwise.py:582).
    In the cell-table model absent rows are no-data; IsData of the stored
    cells is True wherever a non-NULL value exists."""

    def _build(self, ctx):
        df = self.store._build(ctx)
        return df.select("time", "y", "x",
                         F.col("value").isNotNull().alias("value"))


class IsNoData(BaseSingle):
    """True where raster has no data (reference: raster/elemwise.py:618)."""

    def _build(self, ctx):
        df = self.store._build(ctx)
        return df.select("time", "y", "x",
                         F.col("value").isNull().alias("value"))


class BaseLogic(BaseElementwise):
    """reference: raster/elemwise.py:212 — boolean rasters."""

    def __init__(self, a, b):
        for x in (a, b):
            if not isinstance(x, (RasterBlock, bool)):
                raise TypeError("'{}' object is not allowed".format(type(x)))
        super().__init__(a, b)

    def _build(self, ctx):
        a, b = self.args[0], self.args[1]
        if isinstance(a, RasterBlock) and isinstance(b, RasterBlock):
            fused = self._fused(ctx, cast="boolean")
            if fused is not None:
                return fused
            joined = align([a._build(ctx), b._build(ctx)], how="full")
            value = self._op(F.col("v0").cast("boolean"),
                             F.col("v1").cast("boolean"))
            return joined.select("time", "y", "x", value.alias("value"))
        return super()._build(ctx)


class And(BaseLogic):
    """reference: raster/elemwise.py:641"""
    def _op(self, a, b):
        return a & b


class Or(BaseLogic):
    """reference: raster/elemwise.py:660"""
    def _op(self, a, b):
        return a | b


class Xor(BaseLogic):
    """reference: raster/elemwise.py:679"""
    def _op(self, a, b):
        return a != b


class FillNoData(RasterBlock):
    """Combine rasters, filling no-data from later sources (reference:
    raster/elemwise.py:700 — "the values of the next store are used where
    the current values are missing").

    Implementation: union all cell tables with a priority tag, keep the
    first non-NULL value per (time, y, x) — ONE shuffle regardless of the
    number of inputs (a join chain would be n-1 shuffles)."""

    def __init__(self, *args):
        if not args:
            raise TypeError("FillNoData requires at least one source")
        for a in args:
            if not isinstance(a, RasterBlock):
                raise TypeError("'{}' object is not allowed".format(type(a)))
        super().__init__(*args)

    def _build(self, ctx):
        parts = []
        for prio, block in enumerate(self.args):
            parts.append(block._build(ctx)
                         .select("time", "y", "x", "value",
                                 F.lit(prio).alias("_prio")))
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        return (union.filter(F.col("value").isNotNull())
                .groupBy("time", "y", "x")
                .agg(F.expr("min_by(value, _prio)").alias("value")))


class BaseLogExp(BaseSingle):
    """reference: raster/elemwise.py:760"""

    def _op(self, v):
        raise NotImplementedError

    def _build(self, ctx):
        df = self.store._build(ctx)
        return df.select("time", "y", "x",
                         self._op(F.col("value")).alias("value"))


class Exp(BaseLogExp):
    """reference: raster/elemwise.py:784"""
    def _op(self, v):
        return F.exp(v)


class Log(BaseLogExp):
    """reference: raster/elemwise.py:801 (log of non-positive -> NULL,
    the SQL analogue of numpy's nan)."""
    def _op(self, v):
        return F.when(v > 0, F.log(v))


class Log10(BaseLogExp):
    """reference: raster/elemwise.py:818"""
    def _op(self, v):
        return F.when(v > 0, F.log10(v))
