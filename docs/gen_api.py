"""Generate per-operator API reference pages (docs/api-<plane>.md)
from the package's docstrings — the blocks.rst-style reference the
usage guides (geometry.md / raster.md / pipeline.md) deliberately
don't duplicate.

Run from the repo root:

    PYTHONPATH=. python docs/gen_api.py

Deterministic output (alphabetical within module, module order fixed)
so regeneration diffs are reviewable.
"""

import importlib
import inspect
import os
import textwrap

PLANES = {
    "core": ["dask_geomodeling_spark.core.blocks",
             "dask_geomodeling_spark.core.graphs"],
    "geometry": [
        "dask_geomodeling_spark.geometry.base",
        "dask_geomodeling_spark.geometry.sources",
        "dask_geomodeling_spark.geometry.sinks",
        "dask_geomodeling_spark.geometry.field_operations",
        "dask_geomodeling_spark.geometry.geom_operations",
        "dask_geomodeling_spark.geometry.constructive",
        "dask_geomodeling_spark.geometry.set_operations",
        "dask_geomodeling_spark.geometry.dissolve",
        "dask_geomodeling_spark.geometry.merge",
        "dask_geomodeling_spark.geometry.overlay",
        "dask_geomodeling_spark.geometry.spatial_join",
        "dask_geomodeling_spark.geometry.aggregate",
        "dask_geomodeling_spark.geometry.parallelize",
        "dask_geomodeling_spark.geometry.text",
        "dask_geomodeling_spark.geometry.proj",
        "dask_geomodeling_spark.geometry.wkb",
        "dask_geomodeling_spark.geometry.geohash",
        "dask_geomodeling_spark.geometry.shapefile",
        "dask_geomodeling_spark.geometry.geopackage",
        "dask_geomodeling_spark.geometry.flatgeobuf",
        "dask_geomodeling_spark.geometry.xmlformats",
    ],
    "raster": [
        "dask_geomodeling_spark.raster.base",
        "dask_geomodeling_spark.raster.sources",
        "dask_geomodeling_spark.raster.netcdf",
        "dask_geomodeling_spark.raster.aaigrid",
        "dask_geomodeling_spark.raster.sinks",
        "dask_geomodeling_spark.raster.elemwise",
        "dask_geomodeling_spark.raster.combine",
        "dask_geomodeling_spark.raster.misc",
        "dask_geomodeling_spark.raster.spatial",
        "dask_geomodeling_spark.raster.temporal",
        "dask_geomodeling_spark.raster.reduction",
        "dask_geomodeling_spark.raster.warp",
        "dask_geomodeling_spark.raster.components",
        "dask_geomodeling_spark.raster.hydrology",
        "dask_geomodeling_spark.raster.contour",
        "dask_geomodeling_spark.raster.polygonize",
        "dask_geomodeling_spark.raster.parallelize",
    ],
    "pipeline": [
        "dask_geomodeling_spark.pipeline.dedup",
        "dask_geomodeling_spark.pipeline.similarity",
        "dask_geomodeling_spark.pipeline.text",
        "dask_geomodeling_spark.pipeline.lm",
        "dask_geomodeling_spark.pipeline.curate",
        "dask_geomodeling_spark.pipeline.filter",
        "dask_geomodeling_spark.pipeline.sample",
        "dask_geomodeling_spark.pipeline.dsir",
        "dask_geomodeling_spark.pipeline.decompose",
        "dask_geomodeling_spark.pipeline.multimodal",
        "dask_geomodeling_spark.pipeline.warc",
    ],
    "streaming": [
        "dask_geomodeling_spark.streaming.events",
        "dask_geomodeling_spark.streaming.stateful",
    ],
    "functions": [
        "dask_geomodeling_spark.functions",
        "dask_geomodeling_spark.functions.ranking",
        "dask_geomodeling_spark.functions.skew",
        "dask_geomodeling_spark.functions.measurements",
    ],
    "misc": [
        "dask_geomodeling_spark.config",
        "dask_geomodeling_spark.utils",
        "dask_geomodeling_spark.compat",
    ],
}


def iter_public(mod):
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith("_")]
    for n in sorted(names):
        obj = getattr(mod, n, None)
        if obj is None:
            continue
        defined_in = getattr(obj, "__module__", None)
        if defined_in != mod.__name__:
            continue
        if inspect.isclass(obj) or inspect.isfunction(obj):
            yield n, obj


def signature_of(obj):
    try:
        if inspect.isclass(obj):
            return str(inspect.signature(obj.__init__)).replace(
                "(self, ", "(").replace("(self)", "()")
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"


def emit(plane, modules, out_dir):
    lines = ["# API reference — {}".format(plane), ""]
    lines.append("*Generated from docstrings by `docs/gen_api.py` — "
                 "do not edit by hand.*")
    lines.append("")
    for modname in modules:
        try:
            mod = importlib.import_module(modname)
        except Exception as exc:       # pragma: no cover
            lines += ["## `{}` (import failed: {})".format(modname, exc),
                      ""]
            continue
        entries = list(iter_public(mod))
        if not entries:
            continue
        lines.append("## `{}`".format(modname))
        lines.append("")
        mdoc = inspect.getdoc(mod)
        if mdoc:
            lines.append(mdoc.split("\n\n")[0])
            lines.append("")
        for name, obj in entries:
            kind = "class" if inspect.isclass(obj) else "function"
            lines.append("### {} `{}{}`".format(
                kind, name, signature_of(obj)))
            lines.append("")
            doc = inspect.getdoc(obj)
            if doc:
                lines.append(textwrap.dedent(doc))
            else:
                lines.append("*(no docstring)*")
            lines.append("")
    path = os.path.join(out_dir, "api-{}.md".format(plane))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path, sum(1 for ln in lines if ln.startswith("### "))


def main():
    out_dir = os.path.dirname(os.path.abspath(__file__))
    total = 0
    for plane, modules in PLANES.items():
        path, n = emit(plane, modules, out_dir)
        total += n
        print("wrote {} ({} entries)".format(path, n))
    print("total entries:", total)


if __name__ == "__main__":
    main()
