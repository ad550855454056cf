"""J7: output spatial reference — UTM zone 12N (EPSG:26912) <-> WGS84 lon/lat.

The reference accepts any Esri WKID for the output coordinates
(``spatialReference`` default 26912, reference geocode.py:25,115,127,204;
UI at `AGRC Geocode Tools.pyt:99-106`) and the remote API does the
projection server-side. Our locators store x/y in 26912 natively; this
module implements the transverse-Mercator forward/inverse from scratch
(standard Snyder 1987 series on the GRS80 ellipsoid — public textbook
formulas; no pyproj in this environment).

Everything is emitted as ONE SQL expression string built from functions
common to Spark SQL and DuckDB (sin/cos/tan/atan/sqrt/radians/degrees and
arithmetic), evaluated via ``F.expr`` on the Spark side and verbatim by the
DuckDB oracle — so both engines compute the *identical* formula. Outputs are
rounded to 6 decimal degrees (~0.1 m) / 0.001 m so sub-ulp libm differences
between the JVM and DuckDB cannot flip the value hash.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# GRS80 ellipsoid + UTM constants (EPSG:26912 = NAD83 / UTM zone 12N)
_A = 6378137.0
_F = 1.0 / 298.257222101
_E2 = _F * (2.0 - _F)
_EP2 = _E2 / (1.0 - _E2)
_K0 = 0.9996
_E0 = 500000.0  # false easting
_LON0_DEG = -111.0  # zone 12 central meridian
_E1 = (1.0 - math.sqrt(1.0 - _E2)) / (1.0 + math.sqrt(1.0 - _E2))
# meridional-arc series coefficient: a*(1 - e2/4 - 3e4/64 - 5e6/256)
_M0 = _A * (1.0 - _E2 / 4.0 - 3.0 * _E2**2 / 64.0 - 5.0 * _E2**3 / 256.0)

WGS84_DECIMALS = 6  # ~0.11 m at Utah latitudes
UTM_DECIMALS = 3  # 1 mm


def _lit(v: float) -> str:
    return repr(float(v))


def utm_to_wgs84_sql(x: str = "x", y: str = "y") -> dict[str, str]:
    """SQL expressions {lon, lat} (degrees, rounded) from 26912 easting/northing.

    Snyder (1987) eq. 8-17..8-25: footpoint latitude from the inverse
    meridional arc, then the D-power series.
    """
    mu = f"(({y}) / {_lit(_K0 * _M0)})"
    phi1 = (
        f"({mu} + {_lit(3 * _E1 / 2 - 27 * _E1**3 / 32)} * sin(2*{mu})"
        f" + {_lit(21 * _E1**2 / 16 - 55 * _E1**4 / 32)} * sin(4*{mu})"
        f" + {_lit(151 * _E1**3 / 96)} * sin(6*{mu})"
        f" + {_lit(1097 * _E1**4 / 512)} * sin(8*{mu}))"
    )
    s1 = f"sin({phi1})"
    c1 = f"cos({phi1})"
    t1 = f"(({s1}/{c1}) * ({s1}/{c1}))"
    cc1 = f"({_lit(_EP2)} * {c1} * {c1})"
    w = f"sqrt(1.0 - {_lit(_E2)} * {s1} * {s1})"
    n1 = f"({_lit(_A)} / {w})"
    r1 = f"({_lit(_A * (1.0 - _E2))} / ({w}*{w}*{w}))"
    d = f"((({x}) - {_lit(_E0)}) / ({n1} * {_lit(_K0)}))"
    d2 = f"({d}*{d})"
    lat_rad = (
        f"({phi1} - ({n1} * ({s1}/{c1}) / {r1}) * ({d2}/2.0"
        f" - (5.0 + 3.0*{t1} + 10.0*{cc1} - 4.0*{cc1}*{cc1} - {_lit(9 * _EP2)})"
        f" * {d2}*{d2}/24.0"
        f" + (61.0 + 90.0*{t1} + 298.0*{cc1} + 45.0*{t1}*{t1}"
        f" - {_lit(252 * _EP2)} - 3.0*{cc1}*{cc1}) * {d2}*{d2}*{d2}/720.0))"
    )
    lon_rad = (
        f"(radians({_lit(_LON0_DEG)}) + ({d} - (1.0 + 2.0*{t1} + {cc1})"
        f" * {d}*{d2}/6.0 + (5.0 - 2.0*{cc1} + 28.0*{t1} - 3.0*{cc1}*{cc1}"
        f" + {_lit(8 * _EP2)} + 24.0*{t1}*{t1}) * {d}*{d2}*{d2}/120.0) / {c1})"
    )
    return {
        "lon": f"round(degrees({lon_rad}), {WGS84_DECIMALS})",
        "lat": f"round(degrees({lat_rad}), {WGS84_DECIMALS})",
    }


def wgs84_to_utm_sql(lon: str = "lon", lat: str = "lat") -> dict[str, str]:
    """SQL expressions {x, y} (26912 meters, rounded) from lon/lat degrees.

    Snyder (1987) eq. 8-9..8-15 (forward transverse Mercator).
    """
    phi = f"radians({lat})"
    s = f"sin({phi})"
    c = f"cos({phi})"
    t = f"(({s}/{c}) * ({s}/{c}))"
    cc = f"({_lit(_EP2)} * {c} * {c})"
    n = f"({_lit(_A)} / sqrt(1.0 - {_lit(_E2)} * {s} * {s}))"
    a_ = f"((radians({lon}) - radians({_lit(_LON0_DEG)})) * {c})"
    a2 = f"({a_}*{a_})"
    m = (
        f"({_lit(_M0)} * {phi}"
        f" - {_lit(_A * (3 * _E2 / 8 + 3 * _E2**2 / 32 + 45 * _E2**3 / 1024))} * sin(2*{phi})"
        f" + {_lit(_A * (15 * _E2**2 / 256 + 45 * _E2**3 / 1024))} * sin(4*{phi})"
        f" - {_lit(_A * (35 * _E2**3 / 3072))} * sin(6*{phi}))"
    )
    x = (
        f"({_lit(_K0)} * {n} * ({a_} + (1.0 - {t} + {cc}) * {a_}*{a2}/6.0"
        f" + (5.0 - 18.0*{t} + {t}*{t} + 72.0*{cc} - {_lit(58 * _EP2)})"
        f" * {a_}*{a2}*{a2}/120.0) + {_lit(_E0)})"
    )
    y = (
        f"({_lit(_K0)} * ({m} + {n} * ({s}/{c}) * ({a2}/2.0"
        f" + (5.0 - {t} + 9.0*{cc} + 4.0*{cc}*{cc}) * {a2}*{a2}/24.0"
        f" + (61.0 - 58.0*{t} + {t}*{t} + 600.0*{cc} - {_lit(330 * _EP2)})"
        f" * {a2}*{a2}*{a2}/720.0)))"
    )
    return {
        "x": f"round({x}, {UTM_DECIMALS})",
        "y": f"round({y}, {UTM_DECIMALS})",
    }


def utm_to_wgs84_cols(x: str = "x", y: str = "y") -> dict[str, Column]:
    return {k: F.expr(v) for k, v in utm_to_wgs84_sql(x, y).items()}


def wgs84_to_utm_cols(lon: str = "lon", lat: str = "lat") -> dict[str, Column]:
    return {k: F.expr(v) for k, v in wgs84_to_utm_sql(lon, lat).items()}


def reproject_result(result: DataFrame, wkid: int = 4326) -> DataFrame:
    """Re-express a geocode result's x/y in `wkid` (26912 passthrough or 4326).

    Failure rows keep the reference's literal x=0/y=0 sentinel
    (geocode.py:182) — only success rows are projected.
    """
    if wkid == 26912:
        return result
    if wkid != 4326:
        raise ValueError(f"unsupported wkid {wkid}; 26912 and 4326 available")
    ll = utm_to_wgs84_cols("x", "y")
    ok = F.col("message").isNull()
    return result.withColumns(
        {
            "x": F.when(ok, ll["lon"]).otherwise(F.lit(0.0)),
            "y": F.when(ok, ll["lat"]).otherwise(F.lit(0.0)),
        }
    )


def reproject_oracle_sql(inner_sql: str, wkid: int = 4326) -> str:
    """DuckDB form of reproject_result over `inner_sql` (a geocode result)."""
    if wkid == 26912:
        return inner_sql
    ll = utm_to_wgs84_sql("x", "y")
    return f"""
        SELECT primary_key, input_street, input_zone,
               CASE WHEN message IS NULL THEN {ll['lon']} ELSE 0.0 END AS x,
               CASE WHEN message IS NULL THEN {ll['lat']} ELSE 0.0 END AS y,
               score, locator, matchAddress, standardizedAddress, addressGrid,
               message
        FROM ({inner_sql})"""
