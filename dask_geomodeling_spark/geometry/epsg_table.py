"""Bundled public EPSG parameter table (round 15, r14 verdict #3).

The reference resolves ANY CRS through GDAL/pyproj's EPSG database
(reference utils.py:397 ``get_sr`` via ``osr.GetUserInputAsWKT``);
this environment has neither, so the high-traffic projected codes a
migrating user actually hits — US state-plane NAD83 zones, the
European/ANZ national grids, UTM-on-datum variants — ship here as
proj4-style parameter strings (all public knowledge, straight off the
EPSG registry entries) and auto-register on first use through
``proj_ext.register_crs_from_proj4``.  Codes outside the table keep a
clear error that now names the nearest bundled options
(``proj.validate_crs_pair``).

Accuracy class: identical to the runtime-registration path — the
closed-form Snyder projections are mm-to-cm-exact; datum shifts are
the grid-file-free Helmert class (~0.5–5 m, the same class as pyproj
without NTv2/OSTN grid files).  NAD83/ETRS89/GDA-class datums are
treated as WGS84-coincident (standard sub-meter approximation).
"""

EPSG_PROJ4 = {}

# ---- UTM on non-WGS84 datums (all ~WGS84-coincident modern frames) ----
# NAD83 / UTM zones 1N-23N (Alaska through Newfoundland)
for _z in range(1, 24):
    EPSG_PROJ4["EPSG:269{:02d}".format(_z)] = (
        "+proj=utm +zone={} +ellps=GRS80".format(_z))
# ETRS89 / UTM zones 28N-38N (the European standard grids)
for _z in range(28, 39):
    EPSG_PROJ4["EPSG:258{:02d}".format(_z)] = (
        "+proj=utm +zone={} +ellps=GRS80".format(_z))
# GDA94 / MGA zones 48-58 (Australia)
for _z in range(48, 59):
    EPSG_PROJ4["EPSG:283{:02d}".format(_z)] = (
        "+proj=utm +zone={} +south +ellps=GRS80".format(_z))
# GDA2020 / MGA zones 46-59
for _z in range(46, 60):
    EPSG_PROJ4["EPSG:78{:02d}".format(_z)] = (
        "+proj=utm +zone={} +south +ellps=GRS80".format(_z))
# ED50 / UTM zones 28N-38N (legacy European; mean 3-param shift)
for _z in range(28, 39):
    EPSG_PROJ4["EPSG:230{:02d}".format(_z)] = (
        "+proj=utm +zone={} +ellps=intl "
        "+towgs84=-87,-98,-121".format(_z))

# ---- European national grids -----------------------------------------
EPSG_PROJ4.update({
    # ETRS89 / Poland CS92
    "EPSG:2180": "+proj=tmerc +lat_0=0 +lon_0=19 +k=0.9993 "
                 "+x_0=500000 +y_0=-5300000 +ellps=GRS80",
    # SWEREF99 TM (Sweden)
    "EPSG:3006": "+proj=tmerc +lat_0=0 +lon_0=15 +k=0.9996 "
                 "+x_0=500000 +y_0=0 +ellps=GRS80",
    # ETRS89 / TM35FIN (Finland)
    "EPSG:3067": "+proj=utm +zone=35 +ellps=GRS80",
    # GGRS87 / Greek Grid
    "EPSG:2100": "+proj=tmerc +lat_0=0 +lon_0=24 +k=0.9996 "
                 "+x_0=500000 +y_0=0 +ellps=GRS80 "
                 "+towgs84=-199.87,74.79,246.62",
    # HTRS96 / Croatia TM
    "EPSG:3765": "+proj=tmerc +lat_0=0 +lon_0=16.5 +k=0.9999 "
                 "+x_0=500000 +y_0=0 +ellps=GRS80",
    # Slovenia 1996 / Slovene National Grid
    "EPSG:3794": "+proj=tmerc +lat_0=0 +lon_0=15 +k=0.9999 "
                 "+x_0=500000 +y_0=-5000000 +ellps=GRS80",
    # DHDN / 3-degree Gauss-Krueger zones 2-5 (legacy Germany)
    "EPSG:31466": "+proj=tmerc +lat_0=0 +lon_0=6 +k=1 +x_0=2500000 "
                  "+y_0=0 +ellps=bessel "
                  "+towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7",
    "EPSG:31467": "+proj=tmerc +lat_0=0 +lon_0=9 +k=1 +x_0=3500000 "
                  "+y_0=0 +ellps=bessel "
                  "+towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7",
    "EPSG:31468": "+proj=tmerc +lat_0=0 +lon_0=12 +k=1 +x_0=4500000 "
                  "+y_0=0 +ellps=bessel "
                  "+towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7",
    "EPSG:31469": "+proj=tmerc +lat_0=0 +lon_0=15 +k=1 +x_0=5500000 "
                  "+y_0=0 +ellps=bessel "
                  "+towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7",
    # MGI / Austria Lambert
    "EPSG:31287": "+proj=lcc +lat_0=47.5 +lon_0=13.33333333333333 "
                  "+lat_1=49 +lat_2=46 +x_0=400000 +y_0=400000 "
                  "+ellps=bessel +towgs84=577.326,90.129,463.919,"
                  "5.137,1.474,5.297,2.4232",
    # Belge 1972 / Belgian Lambert 72
    "EPSG:31370": "+proj=lcc +lat_0=90 +lon_0=4.367486666666666 "
                  "+lat_1=51.16666723333333 +lat_2=49.8333339 "
                  "+x_0=150000.013 +y_0=5400088.438 +ellps=intl "
                  "+towgs84=-106.869,52.2978,-103.724,0.3366,-0.457,"
                  "1.8422,-1.2747",
    # CH1903 / LV03 (legacy Swiss grid; LV95 minus the 2.6M/1.2M)
    "EPSG:21781": "+proj=somerc +lat_0=46.95240555555556 "
                  "+lon_0=7.439583333333333 +k_0=1 +x_0=600000 "
                  "+y_0=200000 +ellps=bessel "
                  "+towgs84=674.374,15.056,405.346",
    # IRENET95 / Irish Transverse Mercator
    "EPSG:2157": "+proj=tmerc +lat_0=53.5 +lon_0=-8 +k=0.99982 "
                 "+x_0=600000 +y_0=750000 +ellps=GRS80",
    # TM75 / Irish Grid (modified Airy)
    "EPSG:29903": "+proj=tmerc +lat_0=53.5 +lon_0=-8 +k=1.000035 "
                  "+x_0=200000 +y_0=250000 +ellps=mod_airy "
                  "+towgs84=482.5,-130.6,564.557,-1.042,-0.214,"
                  "-0.631,8.15",
    # ETRS89 / UTM zone 32N with zone-prefixed easting (Germany AAA)
    "EPSG:4647": "+proj=tmerc +lat_0=0 +lon_0=9 +k=0.9996 "
                 "+x_0=32500000 +y_0=0 +ellps=GRS80",
    # RGF93 / CC42..CC50 conic conformal zones (France)
})
for _z in range(42, 51):
    EPSG_PROJ4["EPSG:39{:02d}".format(_z)] = (
        "+proj=lcc +lat_0={z} +lon_0=3 +lat_1={lo} +lat_2={hi} "
        "+x_0=1700000 +y_0={y0} +ellps=GRS80".format(
            z=_z, lo=_z - 0.75, hi=_z + 0.75,
            y0=(_z - 41) * 1000000 + 200000))

# ---- Americas / Pacific ----------------------------------------------
EPSG_PROJ4.update({
    # NZGD2000 / New Zealand Transverse Mercator 2000
    "EPSG:2193": "+proj=tmerc +lat_0=0 +lon_0=173 +k=0.9996 "
                 "+x_0=1600000 +y_0=10000000 +ellps=GRS80",
    # GDA94 / Australian Albers
    "EPSG:3577": "+proj=aea +lat_0=0 +lon_0=132 +lat_1=-18 "
                 "+lat_2=-36 +x_0=0 +y_0=0 +ellps=GRS80",
    # NAD83(2011) / Conus Albers (the 5070 successor)
    "EPSG:6350": "+proj=aea +lat_0=23 +lon_0=-96 +lat_1=29.5 "
                 "+lat_2=45.5 +x_0=0 +y_0=0 +ellps=GRS80",
    # NAD83 / Statistics Canada Lambert
    "EPSG:3347": "+proj=lcc +lat_0=63.390675 "
                 "+lon_0=-91.86666666666666 +lat_1=49 +lat_2=77 "
                 "+x_0=6200000 +y_0=3000000 +ellps=GRS80",
    # NAD83 / California Albers
    "EPSG:3310": "+proj=aea +lat_0=0 +lon_0=-120 +lat_1=34 "
                 "+lat_2=40.5 +x_0=0 +y_0=-4000000 +ellps=GRS80",
    # Korea 2000 / Central Belt 2010
    "EPSG:5186": "+proj=tmerc +lat_0=38 +lon_0=127 +k=1 "
                 "+x_0=200000 +y_0=600000 +ellps=GRS80",
    # WGS84 / Arctic + Antarctic Polar Stereographic (science grids)
    "EPSG:3995": "+proj=stere +lat_0=90 +lat_ts=71 +lon_0=0 "
                 "+ellps=WGS84",
    "EPSG:3031": "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 "
                 "+ellps=WGS84",
})

# ---- US State Plane NAD83 (the canonical migration wall) -------------
EPSG_PROJ4.update({
    # California zone 1 (ftUS)
    "EPSG:2225": "+proj=lcc +lat_0=39.33333333333334 +lon_0=-122 "
                 "+lat_1=41.66666666666666 +lat_2=40 "
                 "+x_0=2000000.0001016 +y_0=500000.0001016002 "
                 "+ellps=GRS80 +units=us-ft",
    # California zone 5 (ftUS; Los Angeles)
    "EPSG:2229": "+proj=lcc +lat_0=33.5 +lon_0=-118 "
                 "+lat_1=35.46666666666667 +lat_2=34.03333333333333 "
                 "+x_0=2000000.0001016 +y_0=500000.0001016002 "
                 "+ellps=GRS80 +units=us-ft",
    # New York Long Island (ftUS; NYC)
    "EPSG:2263": "+proj=lcc +lat_0=40.16666666666666 +lon_0=-74 "
                 "+lat_1=41.03333333333333 +lat_2=40.66666666666666 "
                 "+x_0=300000.0000000001 +y_0=0 "
                 "+ellps=GRS80 +units=us-ft",
    # Texas Central (ftUS; Austin)
    "EPSG:2277": "+proj=lcc +lat_0=29.66666666666667 "
                 "+lon_0=-100.3333333333333 "
                 "+lat_1=31.88333333333333 +lat_2=30.11666666666667 "
                 "+x_0=700000.0000000001 +y_0=3000000.000000001 "
                 "+ellps=GRS80 +units=us-ft",
    # Washington North (ftUS; Seattle)
    "EPSG:2285": "+proj=lcc +lat_0=47 +lon_0=-120.8333333333333 "
                 "+lat_1=48.73333333333333 +lat_2=47.5 "
                 "+x_0=500000.0001016001 +y_0=0 "
                 "+ellps=GRS80 +units=us-ft",
    # Florida East (ftUS; Miami — a TM state-plane zone)
    "EPSG:2236": "+proj=tmerc +lat_0=24.33333333333333 +lon_0=-81 "
                 "+k=0.9999411764705882 +x_0=200000.0001016002 "
                 "+y_0=0 +ellps=GRS80 +units=us-ft",
    # Maryland (meters)
    "EPSG:26985": "+proj=lcc +lat_0=37.66666666666666 +lon_0=-77 "
                  "+lat_1=39.45 +lat_2=38.3 +x_0=400000 +y_0=0 "
                  "+ellps=GRS80",
    # Tennessee (meters)
    "EPSG:32136": "+proj=lcc +lat_0=34.33333333333334 +lon_0=-86 "
                  "+lat_1=36.41666666666666 +lat_2=35.25 "
                  "+x_0=600000 +y_0=0 +ellps=GRS80",
    # Arizona Central (meters; x_0 = 700,000 intl ft)
    "EPSG:26949": "+proj=tmerc +lat_0=31 +lon_0=-111.9166666666667 "
                  "+k=0.9999 +x_0=213360 +y_0=0 +ellps=GRS80",
})
