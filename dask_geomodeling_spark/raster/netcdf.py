"""NetCDF classic (CDF-1 / CDF-2) raster source.

The reference's ``RasterFileSource`` ingests any GDAL-readable raster
container (reference raster/sources.py:396, ``gdal.Open`` at :68);
after GeoTIFF, NetCDF classic with a CF ``(time, y, x)`` variable is
the most common wild format (climate/weather stacks).  No GDAL/netCDF4
in this container, so the classic on-disk format is parsed directly —
it is a small struct walk (header = dimensions + attributes +
variables, big-endian data at recorded offsets), fully specified by
the public NetCDF classic format spec.

Spark-first ingestion mirrors ``GeoTIFFRasterSource``: one
``binaryFile`` task per file, an Arrow-batched ``mapInPandas`` runs
the pure-python parse, and each array element becomes a cell row
``(time, y, x, value)`` with ``_FillValue``/``missing_value`` as NULL
and CF ``scale_factor``/``add_offset`` unpacking applied.  The CF
``units: <interval> since <epoch>`` time axis stamps real UTC
timestamps; 1-D coordinate variables for the spatial dims surface as
``wx``/``wy`` world coordinates.  NetCDF-4 (HDF5-backed) remains a
documented boundary — the classic magic check refuses it loudly.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from dask_geomodeling_spark.raster.base import (EPOCH, RasterBlock,
                                                apply_raster_request)

__all__ = ["NetCDFRasterSource", "parse_netcdf", "write_netcdf"]

_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C
#: nc_type -> (struct fmt, byte size)
_NC_TYPES = {1: ("b", 1), 2: ("s", 1), 3: ("h", 2), 4: ("i", 4),
             5: ("f", 4), 6: ("d", 8)}
_STREAMING = 0xFFFFFFFF


def _pad4(n):
    return (n + 3) & ~3


class _Reader:
    def __init__(self, content):
        self.b = content
        self.pos = 0

    def u32(self):
        import struct
        (v,) = struct.unpack_from(">I", self.b, self.pos)
        self.pos += 4
        return v

    def i64(self):
        import struct
        (v,) = struct.unpack_from(">Q", self.b, self.pos)
        self.pos += 8
        return v

    def name(self):
        n = self.u32()
        s = self.b[self.pos:self.pos + n].decode("utf-8")
        self.pos += _pad4(n)
        return s

    def values(self, nc_type, nelems):
        import struct
        fmt, size = _NC_TYPES[nc_type]
        raw = self.b[self.pos:self.pos + nelems * size]
        self.pos += _pad4(nelems * size)
        if nc_type == 2:   # NC_CHAR -> text
            return raw.split(b"\0")[0].decode("utf-8", "replace")
        return list(struct.unpack(">" + str(nelems) + fmt, raw))


def _att_list(r):
    tag = r.u32()
    n = r.u32()
    if tag == 0 and n == 0:      # ABSENT
        return {}
    if tag != _NC_ATTRIBUTE:
        raise ValueError("corrupt NetCDF: bad att_list tag "
                         "{}".format(tag))
    out = {}
    for _ in range(n):
        nm = r.name()
        t = r.u32()
        ne = r.u32()
        out[nm] = r.values(t, ne)
    return out


def parse_netcdf(content):
    """Parse a classic NetCDF byte string → ``(dims, atts, variables,
    numrecs)`` where ``dims`` is the ordered list of ``(name, size)``
    (size 0 = the record dimension), ``atts`` the global attributes,
    and ``variables`` maps name → dict with ``dims`` (dim indices),
    ``atts``, ``nc_type``, ``vsize``, ``begin`` and a ``read(content,
    numrecs, recsize)`` data accessor.  Raises ValueError on a
    non-classic magic (NetCDF-4/HDF5 files start with ``\\x89HDF``) —
    the documented boundary."""
    import struct

    if content[:3] != b"CDF":
        if content[:4] == b"\x89HDF":
            raise ValueError(
                "NetCDF-4 (HDF5-backed) is not supported — the "
                "classic reader handles CDF-1/CDF-2; re-export with "
                "'nccopy -k classic' or NETCDF3_64BIT")
        raise ValueError("not a classic NetCDF file")
    version = content[3]
    if version not in (1, 2):
        raise ValueError(
            "unsupported NetCDF version byte {} (classic=1, "
            "64-bit-offset=2)".format(version))
    r = _Reader(content)
    r.pos = 4
    numrecs = r.u32()
    # dim_list
    tag, n = r.u32(), r.u32()
    dims = []
    if tag == _NC_DIMENSION:
        for _ in range(n):
            nm = r.name()
            dims.append((nm, r.u32()))
    elif not (tag == 0 and n == 0):
        raise ValueError("corrupt NetCDF: bad dim_list tag")
    gatts = _att_list(r)
    tag, n = r.u32(), r.u32()
    variables = {}
    order = []
    if tag == _NC_VARIABLE:
        for _ in range(n):
            nm = r.name()
            ndims = r.u32()
            dimids = [r.u32() for _ in range(ndims)]
            vatts = _att_list(r)
            nc_type = r.u32()
            if nc_type not in _NC_TYPES:
                raise ValueError(
                    "unsupported nc_type {} for variable {}".format(
                        nc_type, nm))
            vsize = r.u32()
            begin = r.i64() if version == 2 else r.u32()
            variables[nm] = {"dims": dimids, "atts": vatts,
                             "nc_type": nc_type, "vsize": vsize,
                             "begin": begin}
            order.append(nm)
    elif not (tag == 0 and n == 0):
        raise ValueError("corrupt NetCDF: bad var_list tag")

    # record geometry: slabs of all record variables interleave per
    # record in declaration order; the spec's special case drops the
    # 4-byte padding when there is exactly ONE record variable of a
    # sub-4-byte type
    recvars = [nm for nm in order
               if any(dims[d][1] == 0 for d in variables[nm]["dims"])]
    if len(recvars) == 1:
        v = variables[recvars[0]]
        fmt, size = _NC_TYPES[v["nc_type"]]
        per = 1
        for d in v["dims"]:
            if dims[d][1]:
                per *= dims[d][1]
        recsize = per * size
    else:
        recsize = sum(variables[nm]["vsize"] for nm in recvars)
    if numrecs == _STREAMING and recvars:
        first = min(variables[nm]["begin"] for nm in recvars)
        numrecs = (len(content) - first) // recsize if recsize else 0

    def make_read(nm):
        v = variables[nm]
        fmt, size = _NC_TYPES[v["nc_type"]]
        fixed = [dims[d][1] for d in v["dims"] if dims[d][1]]
        per = 1
        for s in fixed:
            per *= s
        is_rec = any(dims[d][1] == 0 for d in v["dims"])

        def read():
            if v["nc_type"] == 2:
                raise ValueError("char variable {} holds no raster "
                                 "data".format(nm))
            if not is_rec:
                return list(struct.unpack_from(
                    ">" + str(per) + fmt, content, v["begin"]))
            out = []
            for k in range(numrecs):
                out.extend(struct.unpack_from(
                    ">" + str(per) + fmt, content,
                    v["begin"] + k * recsize))
            return out

        return read

    for nm in order:
        variables[nm]["read"] = make_read(nm)
        variables[nm]["shape"] = [
            dims[d][1] if dims[d][1] else numrecs
            for d in variables[nm]["dims"]]
    return dims, gatts, variables, numrecs


_CF_MULT = {"second": 1.0, "seconds": 1.0, "sec": 1.0, "secs": 1.0,
            "s": 1.0, "minute": 60.0, "minutes": 60.0, "min": 60.0,
            "mins": 60.0, "hour": 3600.0, "hours": 3600.0,
            "h": 3600.0, "hr": 3600.0, "hrs": 3600.0,
            "day": 86400.0, "days": 86400.0, "d": 86400.0}


def cf_time_to_us(values, units):
    """CF time axis → UTC epoch microseconds: ``units`` is
    ``'<interval> since <epoch>'`` with interval second/minute/hour/
    day (calendar months/years are NOT fixed intervals and refuse
    loudly, as the CF spec itself advises against them)."""
    import re
    from datetime import timezone

    m = re.match(r"^\s*(\w+)\s+since\s+(.+?)\s*$", str(units))
    if not m:
        raise ValueError(
            "unsupported CF time units {!r} (want '<interval> since "
            "<instant>')".format(units))
    interval, instant = m.group(1).lower(), m.group(2)
    if interval not in _CF_MULT:
        raise ValueError(
            "unsupported CF time interval {!r} (supported: seconds/"
            "minutes/hours/days; calendar months/years are not fixed "
            "intervals)".format(interval))
    instant = instant.replace("T", " ").replace("Z", "").strip()
    # udunits allows a trailing numeric UTC offset on the reference
    # instant ('seconds since 1992-10-8 15:15:42.5 -6:00' is the CF
    # document's own example) — parse and subtract it (r15 review)
    off_us = 0
    m_off = re.search(
        r"\s([+-])(\d{1,2})(?::?(\d{2}))?$", instant)
    if m_off:
        sign = -1 if m_off.group(1) == "-" else 1
        off_us = sign * (int(m_off.group(2)) * 3600
                         + int(m_off.group(3) or 0) * 60) * 1000000
        instant = instant[:m_off.start()].strip()
    # (strptime is lenient about unpadded fields, so the wild
    # '1992-10-8' shape parses as-is)
    for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S",
                "%Y-%m-%d %H:%M", "%Y-%m-%d"):
        try:
            epoch = datetime.strptime(instant, fmt)
            break
        except ValueError:
            continue
    else:
        raise ValueError(
            "unsupported CF reference instant {!r}".format(instant))
    epoch = epoch.replace(tzinfo=timezone.utc)
    base_us = int(epoch.timestamp() * 1000000) - off_us
    mult = _CF_MULT[interval]
    return [base_us + int(round(float(v) * mult * 1000000))
            for v in values]


def _pick_grid_variable(dim_names, variables, variable):
    """The CF grid variable to decode: explicit name, or the
    non-coordinate numeric variable with the most dimensions (ties:
    declaration order) — shared by the decoder and the band-count
    header walk so both always pick the SAME variable."""
    if variable is None:
        best = None
        for nm, v in variables.items():
            if nm in dim_names or v["nc_type"] == 2:
                continue
            nd = len(v["dims"])
            if nd >= 2 and (best is None
                            or nd > len(variables[best]["dims"])):
                best = nm
        if best is None:
            raise ValueError("no 2-D+ data variable found")
        return best
    if variable not in variables:
        raise ValueError("variable {!r} not in file (has: {})".format(
            variable, sorted(variables)))
    return variable


def decode_netcdf_grid(content, variable=None):
    """Decode ONE CF grid variable of a classic NetCDF byte string →
    ``(times_us, height, width, bands, xs, ys)`` where ``bands`` is
    one row-major list of UNPACKED python floats (fill → None) per
    time step, ``times_us`` the per-band UTC epoch microseconds (None
    when the file has no time axis) and ``xs``/``ys`` the coordinate
    variable values (None when absent).

    ``variable`` picks the data variable by name; default = the
    non-coordinate numeric variable with the most dimensions (ties:
    declaration order).  The variable's trailing two dims are (y, x)
    — the CF order — and an optional leading dim is time."""
    dims, _, variables, numrecs = parse_netcdf(content)
    dim_names = [d[0] for d in dims]
    variable = _pick_grid_variable(dim_names, variables, variable)
    v = variables[variable]
    if len(v["dims"]) not in (2, 3):
        raise ValueError(
            "variable {!r} must be (y, x) or (time, y, x); has {} "
            "dims".format(variable, len(v["dims"])))
    shape = v["shape"]
    h, w = shape[-2], shape[-1]
    nt = shape[0] if len(shape) == 3 else 1
    raw = v["read"]()

    atts = v["atts"]

    def att1(name, default=None):
        a = atts.get(name)
        return a[0] if isinstance(a, list) and a else (a or default)

    fill = att1("_FillValue", att1("missing_value"))
    scale = att1("scale_factor")
    offset = att1("add_offset")
    fill_nan = fill is not None and fill != fill   # NaN _FillValue
    vals = []
    for x in raw:
        if fill is not None and (x == fill
                                 or (fill_nan and x != x)):
            vals.append(None)
        elif scale is not None or offset is not None:
            vals.append(float(x) * float(scale if scale is not None
                                         else 1.0)
                        + float(offset or 0.0))
        else:
            vals.append(float(x))
    bands = [vals[k * h * w:(k + 1) * h * w] for k in range(nt)]

    def coord(dimid):
        nm = dim_names[dimid]
        cv = variables.get(nm)
        if cv and cv["dims"] == [dimid] and cv["nc_type"] != 2:
            return cv
        return None

    times_us = None
    if len(v["dims"]) == 3:
        tv = coord(v["dims"][0])
        units = tv and tv["atts"].get("units")
        if tv is not None and units:
            times_us = cf_time_to_us(tv["read"](), units)
    ycv = coord(v["dims"][-2])
    xcv = coord(v["dims"][-1])
    xs = [float(x) for x in xcv["read"]()] if xcv else None
    ys = [float(y) for y in ycv["read"]()] if ycv else None
    return times_us, h, w, bands, xs, ys


def netcdf_band_meta(f, variable=None):
    """``(n_bands, has_time_axis)`` of a classic NetCDF from a
    SEEKABLE file object, reading only the header (progressively
    doubled reads — the header precedes all data by construction), so
    the multi-file fallback band index costs O(header) per file, not
    a second full byte pass (the GeoTIFF page-count convention)."""
    import struct

    size = 1 << 16
    while True:
        f.seek(0)
        blob = f.read(size)
        try:
            if len(blob) >= 8 and blob[:3] == b"CDF" and int.from_bytes(
                    blob[4:8], "big") == _STREAMING:
                # STREAMING numrecs derives from the FILE length —
                # needs the whole byte string (rare)
                f.seek(0)
                blob = f.read()
            dims, _, variables, numrecs = parse_netcdf(blob)
            break
        except (ValueError, IndexError, struct.error):
            if len(blob) < size:
                raise
            size <<= 3
    dim_names = [d[0] for d in dims]
    nm = _pick_grid_variable(dim_names, variables, variable)
    v = variables[nm]
    n_bands = v["shape"][0] if len(v["dims"]) == 3 else 1
    has_axis = False
    if len(v["dims"]) == 3:
        tnm = dim_names[v["dims"][0]]
        tv = variables.get(tnm)
        has_axis = bool(tv and tv["dims"] == [v["dims"][0]]
                        and tv["nc_type"] != 2
                        and tv["atts"].get("units"))
    return n_bands, has_axis


def write_netcdf(path, width, height, bands, version=1,
                 record_time=True, var_name="data", nc_type=5,
                 scale=None, offset=None, fill=None,
                 time_units="hours since 1970-01-01 00:00:00",
                 time_vals=None, xs=None, ys=None):
    """Classic-NetCDF fixture writer — the inverse of
    ``decode_netcdf_grid`` for roundtrip oracles (the reference writes
    rasters through GDAL).  ``bands`` is a list of per-time row-major
    RAW value lists (pre-unpacking; ``fill`` entries stay raw);
    ``version`` 1 = CDF-1 (32-bit offsets) or 2 = CDF-2;
    ``record_time`` stores time as the record dimension (time + data
    interleave per record — the layout ncgen/GDAL emit for unlimited
    time), else as a fixed dimension; ``nc_type`` 3=short 4=int
    5=float 6=double; ``scale``/``offset``/``fill`` stamp the CF
    packing attributes; ``time_vals`` defaults to 0..n-1 in
    ``time_units``; ``xs``/``ys`` optional coordinate values
    (default: cell indices + 0.5)."""
    import struct

    nt = len(bands)
    for b in bands:
        if len(b) != width * height:
            raise ValueError("each band must hold width*height values")
    if nc_type not in (3, 4, 5, 6):
        raise ValueError("nc_type must be 3/4/5/6")
    fmt, size = _NC_TYPES[nc_type]
    if time_vals is None:
        time_vals = [float(k) for k in range(nt)]
    xs = [x + 0.5 for x in range(width)] if xs is None else list(xs)
    ys = [y + 0.5 for y in range(height)] if ys is None else list(ys)

    def name_blob(s):
        raw = s.encode()
        return (struct.pack(">I", len(raw))
                + raw.ljust(_pad4(len(raw)), b"\0"))

    def att_blob(atts):
        if not atts:
            return struct.pack(">II", 0, 0)
        out = struct.pack(">II", _NC_ATTRIBUTE, len(atts))
        for nm, (t, vals) in atts.items():
            out += name_blob(nm)
            if t == 2:
                raw = vals.encode()
                out += struct.pack(">II", 2, len(raw))
                out += raw.ljust(_pad4(len(raw)), b"\0")
            else:
                f, sz = _NC_TYPES[t]
                out += struct.pack(">II", t, len(vals))
                raw = struct.pack(">" + str(len(vals)) + f, *vals)
                out += raw.ljust(_pad4(len(raw)), b"\0")
        return out

    # dims: time (record or fixed), y, x
    dims = [("time", 0 if record_time else nt), ("y", height),
            ("x", width)]
    datts = {}
    if fill is not None:
        datts["_FillValue"] = (nc_type, [fill])
    if scale is not None:
        datts["scale_factor"] = (6, [float(scale)])
    if offset is not None:
        datts["add_offset"] = (6, [float(offset)])
    # variables: (name, dimids, atts, nc_type, per-record elem count)
    vars_ = [
        # time_units=None omits the CF units attribute — fixtures the
        # no-axis fallback (global band index) path
        ("time", [0],
         {} if time_units is None else {"units": (2, time_units)},
         6, 1),
        ("y", [1], {}, 6, height),
        ("x", [2], {}, 6, width),
        (var_name, [0, 1, 2], datts, nc_type, width * height),
    ]

    header = bytearray()
    header += b"CDF" + bytes([version])
    header += struct.pack(">I", nt if record_time else 0)
    header += struct.pack(">II", _NC_DIMENSION, len(dims))
    for nm, sz in dims:
        header += name_blob(nm) + struct.pack(">I", sz)
    header += struct.pack(">II", 0, 0)          # no global atts
    header += struct.pack(">II", _NC_VARIABLE, len(vars_))
    # first pass with dummy begins to learn the header size
    off_fmt = ">Q" if version == 2 else ">I"

    def var_blob(nm, dimids, atts, t, vsize, begin):
        out = name_blob(nm)
        out += struct.pack(">I", len(dimids))
        for d in dimids:
            out += struct.pack(">I", d)
        out += att_blob(atts)
        out += struct.pack(">I", t)
        out += struct.pack(">I", vsize)
        out += struct.pack(off_fmt, begin)
        return out

    def layout(begins):
        out = bytearray(header)
        for (nm, dimids, atts, t, per), begin in zip(vars_, begins):
            f, sz = _NC_TYPES[t]
            # vsize: per-RECORD slab for record vars, the full array
            # for fixed vars — both padded to 4 (format spec)
            n_el = per * (nt if (0 in dimids
                                 and not record_time) else 1)
            out += var_blob(nm, dimids, atts, t, _pad4(n_el * sz),
                            begin)
        return out

    hdr_len = len(layout([0] * len(vars_)))
    # data section: fixed vars first (y, x [+ time, data when
    # fixed-time]), then the record section (time, data interleaved)
    begins = {}
    pos = hdr_len
    fixed_order = []
    for nm, dimids, atts, t, per in vars_:
        if record_time and 0 in dimids:
            continue
        f, sz = _NC_TYPES[t]
        n_el = per * (1 if 0 not in dimids else nt)
        begins[nm] = pos
        fixed_order.append(nm)
        pos += _pad4(n_el * sz)
    rec_begin = pos
    if record_time:
        recsize = sum(_pad4(per * _NC_TYPES[t][1])
                      for nm, dimids, atts, t, per in vars_
                      if 0 in dimids)
        roff = rec_begin
        for nm, dimids, atts, t, per in vars_:
            if 0 in dimids:
                begins[nm] = roff
                roff += _pad4(per * _NC_TYPES[t][1])

    out = layout([begins[v[0]] for v in vars_])

    def pack_vals(t, vals):
        f, sz = _NC_TYPES[t]
        raw = struct.pack(">" + str(len(vals)) + f, *vals)
        return raw.ljust(_pad4(len(raw)), b"\0")

    data = {"time": time_vals, "y": ys, "x": xs}
    for nm in fixed_order:
        spec = next(v for v in vars_ if v[0] == nm)
        vals = (sum(bands, []) if nm == var_name else data[nm])
        out += pack_vals(spec[3], vals)
    if record_time:
        for k in range(nt):
            out += pack_vals(6, [time_vals[k]])
            out += pack_vals(nc_type, bands[k])
    with open(path, "wb") as f:
        f.write(out)


class NetCDFRasterSource(RasterBlock):
    """Cell table from classic NetCDF (CDF-1/CDF-2) files — the CF
    ``(time, y, x)`` layout climate/weather stacks ship in (reference:
    RasterFileSource via gdal.Open, raster/sources.py:396,68).

    Same Spark shape as ``GeoTIFFRasterSource``: ``binaryFile`` lists
    and reads one task per file, Arrow-batched ``mapInPandas`` runs
    the pure-python classic-format parse, every element becomes a cell
    row with ``_FillValue``/``missing_value`` as NULL (NaN fills
    handled) and CF ``scale_factor``/``add_offset`` unpacking
    applied.  Band times come from the file's own CF time axis
    (``units: <interval> since <instant>``, optional numeric UTC
    offset honored); files without one fall back to ``time_first`` +
    ``time_delta`` × a GLOBAL band index over (path, band) sorted —
    the GeoTIFF/AAIGrid multi-file convention, built from a
    header-only seek pass.  1-D coordinate variables surface as
    ``wx``/``wy``.  NetCDF-4/HDF5 refuses with a clear re-export
    hint (documented boundary)."""

    def __init__(self, url, variable=None, time_first=EPOCH,
                 time_delta=None):
        super().__init__(url, variable, time_first, time_delta)

    def _build(self, ctx):
        from pyspark.sql import types as T
        url, variable, time_first, time_delta = self.args
        from dask_geomodeling_spark.utils import dt_to_ms
        t0_us = dt_to_ms(time_first) * 1000
        delta_us = (int(time_delta.total_seconds() * 1000000)
                    if time_delta is not None else 0)
        files = (ctx.spark.read.format("binaryFile").load(url)
                 .select("path", "content"))
        schema = T.StructType([
            T.StructField("path", T.StringType()),
            T.StructField("band", T.LongType()),
            T.StructField("time", T.TimestampType()),
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
                    times_us, h, w, bands, xs, ys = decode_netcdf_grid(
                        bytes(content), variable)
                    yy = [i // w for i in range(w * h)]
                    xx = [i % w for i in range(w * h)]
                    wxs = ([xs[c] for c in xx] if xs
                           else [None] * (w * h))
                    wys = ([ys[r] for r in yy] if ys
                           else [None] * (w * h))
                    for k, band in enumerate(bands):
                        t = (pd.Timestamp(times_us[k], unit="us",
                                          tz="UTC")
                             if times_us is not None else pd.NaT)
                        yield pd.DataFrame(
                            {"path": path, "band": k, "time": t,
                             "y": yy, "x": xx, "value": band,
                             "wx": wxs, "wy": wys})

        cells = files.mapInPandas(parse, schema=schema)
        # files WITHOUT a CF time axis fall back to time_first +
        # time_delta × a GLOBAL band index over (path, band) sorted —
        # a per-file index would collide timestamps across files (r15
        # review; the GeoTIFF/AAIGrid convention).  The index builds
        # from a header-only seek pass (netcdf_band_meta) when the
        # scheme allows partial reads, else from the content.
        from urllib.parse import urlparse

        from dask_geomodeling_spark.functions.ranking import (
            global_row_number)
        from dask_geomodeling_spark.raster.sources import (
            _SEEKABLE_SCHEMES, _open_seekable)

        def count_bands_seek(batches):
            import pandas as pd
            for pdf in batches:
                out_p, out_b = [], []
                for path in pdf["path"]:
                    fobj = _open_seekable(path)
                    try:
                        n, has_axis = netcdf_band_meta(fobj, variable)
                    finally:
                        fobj.close()
                    if not has_axis:
                        out_p += [path] * n
                        out_b += list(range(n))
                yield pd.DataFrame({"path": out_p, "band": out_b})

        def count_bands_content(batches):
            import io

            import pandas as pd
            for pdf in batches:
                out_p, out_b = [], []
                for path, content in zip(pdf["path"],
                                         pdf["content"]):
                    n, has_axis = netcdf_band_meta(
                        io.BytesIO(bytes(content)), variable)
                    if not has_axis:
                        out_p += [path] * n
                        out_b += list(range(n))
                yield pd.DataFrame({"path": out_p, "band": out_b})

        if urlparse(str(url)).scheme in _SEEKABLE_SCHEMES:
            dim = files.select("path").mapInPandas(
                count_bands_seek, schema="path string, band long")
        else:
            dim = files.mapInPandas(
                count_bands_content, schema="path string, band long")
        idx, _ = global_row_number(dim, ["path", "band"], out="_rn")
        idx = idx.withColumn("_gband", F.col("_rn") - 1).drop("_rn")
        cells = cells.join(F.broadcast(idx), ["path", "band"], "left")
        t = F.coalesce(
            F.col("time"),
            F.timestamp_micros(F.lit(t0_us)
                               + F.col("_gband")
                               * F.lit(delta_us)))
        out = cells.select(t.alias("time"), "y", "x", "value",
                           "wx", "wy")
        return apply_raster_request(out, ctx.request)
