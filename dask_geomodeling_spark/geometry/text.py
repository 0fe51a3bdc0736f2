"""Text parsing blocks (reference: geometry/text.py).

``ParseTextColumn`` extracts ``key=value`` pairs from a free-text column
into new columns.  The Spark expression is a per-key ``regexp_extract`` —
vectorized JVM-side, no UDF.  The reference autocasts each value per-row
to float/bool/None (pandas object dtype); Spark columns are single-typed,
so values are extracted as strings and an optional ``types`` mapping
(``{column: "double"|"boolean"|...}``) applies a ``try_cast`` per column.
Also includes JSON parsing (``ParseJsonColumn``) — the natural Spark-first
variant for the events table's ``props`` column.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_geomodeling_spark.geometry.base import BaseSingle, GeometryBlock

__all__ = ["ParseTextColumn", "ParseJsonColumn", "autocast_value"]


def autocast_value(value):
    """Cast string to string, float, bool or None
    (reference: geometry/text.py:18)."""
    if value is None:
        return None
    value_lcase = value.lower()
    if value_lcase == "null":
        return None
    if value_lcase == "false":
        return False
    if value_lcase == "true":
        return True
    try:
        return float(value)
    except ValueError:
        return value


class ParseTextColumn(BaseSingle):
    """Parse a text column into value columns (reference:
    geometry/text.py:35).

    Args:
      source: GeometryBlock.
      source_column: the text column holding ``key=value`` pairs.
      key_mapping: ``{key_name: new_column_name}``.
      types: optional ``{new_column_name: spark_type}`` try_cast mapping.
    """

    def __init__(self, source, source_column, key_mapping, types=None):
        if not isinstance(source, GeometryBlock):
            raise TypeError("'{}' object is not allowed.".format(type(source)))
        if not isinstance(source_column, str):
            raise TypeError(
                "'{}' object is not allowed.".format(type(source_column)))
        if source.columns and source_column not in source.columns:
            raise KeyError(
                "Column '{}' is not available.".format(source_column))
        if not isinstance(key_mapping, dict):
            raise TypeError(
                "'{}' object is not allowed.".format(type(key_mapping)))
        super().__init__(source, source_column, key_mapping, types or {})

    @property
    def source_column(self):
        return self.args[1]

    @property
    def key_mapping(self):
        return self.args[2]

    @property
    def columns(self):
        return set(self.source.columns) | set(self.key_mapping.values())

    def _build(self, ctx):
        import re

        df = self.source._build(ctx)
        src = F.col(self.source_column)
        types = self.args[3]
        for key, name in self.key_mapping.items():
            pattern = r"(?:^|[,;\s])" + re.escape(key) + r"\s*=\s*([^,;\s]*)"
            raw = F.regexp_extract(src, pattern, 1)
            col = F.when(raw == "", None).otherwise(raw)
            if name in types:
                col = col.try_cast(types[name])
            df = df.withColumn(name, col)
        return df


class ParseJsonColumn(BaseSingle):
    """Parse a JSON-text column into typed columns via ``from_json`` —
    Spark-first sibling of ParseTextColumn for JSON payloads (e.g. the
    events table's ``props``).

    Args:
      source: GeometryBlock.
      source_column: column with JSON text.
      field_mapping: ``{json_field: new_column_name}``.
      schema: DDL string of the JSON payload, e.g. ``"k bigint"``.
    """

    def __init__(self, source, source_column, field_mapping, schema):
        if not isinstance(source, GeometryBlock):
            raise TypeError("'{}' object is not allowed.".format(type(source)))
        super().__init__(source, source_column, field_mapping, schema)

    @property
    def columns(self):
        return set(self.args[0].columns) | set(self.args[2].values())

    def _build(self, ctx):
        df = self.args[0]._build(ctx)
        parsed = F.from_json(F.col(self.args[1]), self.args[3])
        for field, name in self.args[2].items():
            df = df.withColumn(name, parsed[field])
        return df
