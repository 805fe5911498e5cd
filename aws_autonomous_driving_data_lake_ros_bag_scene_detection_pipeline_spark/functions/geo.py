"""Geodesy expressions — WGS-84 → local metric frames (r13, VERDICT
r12 item 4).

The reference records ``/vehicle/gps/fix`` (``sensor_msgs/NavSatFix``,
``/root/reference/README.md:96``) but its pipeline leaves lat/lon as
opaque doubles; every drive-log query that says "within X meters of"
needs the fix in the same METRIC frame the rest of the engine works in
(:func:`..operators.sensors.transform_points` /
:func:`..operators.sensors.project_points` operate on meters). These
are pure Catalyst column expressions — whole-stage codegen, no UDF, no
Python per row — implementing the standard public WGS-84 ellipsoid
math (a = 6378137 m, 1/f = 298.257223563):

- :func:`ecef_from_wgs84` — geodetic (lat°, lon°, alt m) → Earth-
  centered Earth-fixed XYZ via the prime-vertical radius
  ``N = a/√(1−e²sin²φ)``.
- :func:`enu_from_wgs84` — geodetic → local East/North/Up meters at a
  fixed origin (ECEF delta rotated by the origin's tangent-plane
  basis). The origin trig is evaluated ONCE driver-side and embedded
  as literals, so per-row cost is the point's own trig only.

``sensor_msgs/NavSatFix`` ships as a definition constant
(:data:`NAVSATFIX_DEFINITION`) for ``extract_topics`` callers.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["WGS84_A", "WGS84_F", "NAVSATFIX_DEFINITION",
           "ecef_from_wgs84", "enu_from_wgs84"]

WGS84_A = 6378137.0                    # semi-major axis, meters
WGS84_F = 1.0 / 298.257223563          # flattening
_E2 = WGS84_F * (2.0 - WGS84_F)        # first eccentricity squared

NAVSATFIX_DEFINITION = """\
std_msgs/Header header
sensor_msgs/NavSatStatus status
float64 latitude
float64 longitude
float64 altitude
float64[9] position_covariance
uint8 position_covariance_type
================================================================================
MSG: std_msgs/Header
uint32 seq
time stamp
string frame_id
================================================================================
MSG: sensor_msgs/NavSatStatus
int8 STATUS_NO_FIX=-1
int8 STATUS_FIX=0
int8 STATUS_SBAS_FIX=1
int8 STATUS_GBAS_FIX=2
int8 status
uint16 SERVICE_GPS=1
uint16 SERVICE_GLONASS=2
uint16 SERVICE_COMPASS=4
uint16 SERVICE_GALILEO=8
uint16 service
"""


def _ecef_cols(lat: Column, lon: Column,
               alt: Column) -> tuple[Column, Column, Column]:
    phi, lam = F.radians(lat), F.radians(lon)
    sp, cp = F.sin(phi), F.cos(phi)
    sl, cl = F.sin(lam), F.cos(lam)
    n = F.lit(WGS84_A) / F.sqrt(F.lit(1.0) - F.lit(_E2) * sp * sp)
    x = (n + alt) * cp * cl
    y = (n + alt) * cp * sl
    z = (n * F.lit(1.0 - _E2) + alt) * sp
    return x, y, z


def ecef_from_wgs84(df: DataFrame,
                    lat_col: str = "latitude",
                    lon_col: str = "longitude",
                    alt_col: str = "altitude",
                    out_cols: tuple[str, str, str]
                    = ("ecef_x", "ecef_y", "ecef_z")) -> DataFrame:
    """Geodetic degrees + ellipsoidal altitude → ECEF meters, pure
    Catalyst. Null lat/lon/alt propagate to null outputs."""
    for c in (lat_col, lon_col, alt_col):
        if c not in df.columns:
            raise ValueError(f"ecef_from_wgs84: no column {c!r}")
    x, y, z = _ecef_cols(F.col(lat_col), F.col(lon_col),
                         F.col(alt_col))
    return (df.withColumn(out_cols[0], x)
            .withColumn(out_cols[1], y)
            .withColumn(out_cols[2], z))


def enu_from_wgs84(df: DataFrame,
                   origin: tuple[float, float, float],
                   lat_col: str = "latitude",
                   lon_col: str = "longitude",
                   alt_col: str = "altitude",
                   out_cols: tuple[str, str, str]
                   = ("east", "north", "up")) -> DataFrame:
    """Geodetic degrees → local East/North/Up meters at ``origin``
    (``(lat°, lon°, alt m)``) — WGS-84 → ECEF → tangent-plane
    rotation, all as Catalyst expressions. This is the frame bridge
    for ``/vehicle/gps/fix``: once the fix is in meters it joins the
    pose/point frame (``asof_join`` it onto lidar rows, range-query
    it with plain arithmetic). Pick the origin per drive (e.g. the
    first fix of the bag); the tangent-plane approximation is cm-
    accurate for tens of km around it, which is exactly the drive-log
    regime."""
    for c in (lat_col, lon_col, alt_col):
        if c not in df.columns:
            raise ValueError(f"enu_from_wgs84: no column {c!r}")
    lat0, lon0, alt0 = (float(v) for v in origin)
    if not (-90.0 <= lat0 <= 90.0) or not (-180.0 <= lon0 <= 360.0):
        raise ValueError(f"enu_from_wgs84: origin lat/lon out of "
                         f"range: {origin}")
    phi0, lam0 = math.radians(lat0), math.radians(lon0)
    s0, c0 = math.sin(phi0), math.cos(phi0)
    sl0, cl0 = math.sin(lam0), math.cos(lam0)
    n0 = WGS84_A / math.sqrt(1.0 - _E2 * s0 * s0)
    x0 = (n0 + alt0) * c0 * cl0
    y0 = (n0 + alt0) * c0 * sl0
    z0 = (n0 * (1.0 - _E2) + alt0) * s0
    x, y, z = _ecef_cols(F.col(lat_col), F.col(lon_col),
                         F.col(alt_col))
    dx, dy, dz = x - F.lit(x0), y - F.lit(y0), z - F.lit(z0)
    east = F.lit(-sl0) * dx + F.lit(cl0) * dy
    north = (F.lit(-s0 * cl0) * dx + F.lit(-s0 * sl0) * dy
             + F.lit(c0) * dz)
    up = (F.lit(c0 * cl0) * dx + F.lit(c0 * sl0) * dy
          + F.lit(s0) * dz)
    return (df.withColumn(out_cols[0], east)
            .withColumn(out_cols[1], north)
            .withColumn(out_cols[2], up))
