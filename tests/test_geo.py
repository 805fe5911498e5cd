"""WGS-84 geodesy expressions (r13, VERDICT r12 item 4): known
ellipsoid fixtures, an independent numpy oracle, rotation-invariance
round-trip, null totality, and a pure-Catalyst plan."""

import math

import numpy as np
import pytest

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.functions.geo import (
    WGS84_A, WGS84_F, ecef_from_wgs84, enu_from_wgs84,
)

_E2 = WGS84_F * (2 - WGS84_F)
_B = WGS84_A * (1 - WGS84_F)          # semi-minor axis


def _ecef_np(lat, lon, alt):
    phi, lam = math.radians(lat), math.radians(lon)
    n = WGS84_A / math.sqrt(1 - _E2 * math.sin(phi) ** 2)
    return np.array([(n + alt) * math.cos(phi) * math.cos(lam),
                     (n + alt) * math.cos(phi) * math.sin(lam),
                     (n * (1 - _E2) + alt) * math.sin(phi)])


def _enu_np(lat, lon, alt, origin):
    lat0, lon0, alt0 = origin
    d = _ecef_np(lat, lon, alt) - _ecef_np(lat0, lon0, alt0)
    phi0, lam0 = math.radians(lat0), math.radians(lon0)
    s0, c0 = math.sin(phi0), math.cos(phi0)
    sl, cl = math.sin(lam0), math.cos(lam0)
    rot = np.array([[-sl, cl, 0],
                    [-s0 * cl, -s0 * sl, c0],
                    [c0 * cl, c0 * sl, s0]])
    return rot @ d


def test_ecef_known_fixtures(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0, 0.0), (90.0, 0.0, 0.0), (0.0, 90.0, 0.0),
         (0.0, 0.0, 1000.0)],
        "latitude double, longitude double, altitude double")
    got = ecef_from_wgs84(df).collect()
    rows = {(r["latitude"], r["longitude"], r["altitude"]):
            (r["ecef_x"], r["ecef_y"], r["ecef_z"]) for r in got}
    # equator/prime meridian sits on the semi-major axis
    assert np.allclose(rows[(0.0, 0.0, 0.0)], (WGS84_A, 0, 0),
                       atol=1e-6)
    # the pole sits on the semi-minor axis: Z = a*sqrt(1-e^2) = b
    assert np.allclose(rows[(90.0, 0.0, 0.0)], (0, 0, _B), atol=1e-6)
    assert np.allclose(rows[(0.0, 90.0, 0.0)], (0, WGS84_A, 0),
                       atol=1e-6)
    # altitude adds radially on the equator
    assert np.allclose(rows[(0.0, 0.0, 1000.0)],
                       (WGS84_A + 1000.0, 0, 0), atol=1e-6)


def test_enu_matches_numpy_oracle(spark):
    origin = (47.3769, 8.5417, 408.0)        # Zurich-ish
    rng = np.random.default_rng(17)
    pts = [(origin[0] + dlat, origin[1] + dlon, origin[2] + dalt)
           for dlat, dlon, dalt in rng.uniform(-0.05, 0.05, (50, 3))
           * np.array([1.0, 1.0, 2000.0])]
    df = spark.createDataFrame(
        [(i, *map(float, p)) for i, p in enumerate(pts)],
        "i int, latitude double, longitude double, altitude double")
    got = {r["i"]: (r["east"], r["north"], r["up"])
           for r in enu_from_wgs84(df, origin).collect()}
    for i, p in enumerate(pts):
        want = _enu_np(*p, origin)
        assert np.allclose(got[i], want, atol=1e-8), (i, p)
    # origin itself maps to (0, 0, 0)
    at0 = enu_from_wgs84(
        spark.createDataFrame([tuple(map(float, origin))],
                              "latitude double, longitude double, "
                              "altitude double"), origin).collect()[0]
    assert np.allclose((at0["east"], at0["north"], at0["up"]),
                       (0, 0, 0), atol=1e-8)


def test_enu_small_offsets_have_textbook_scale(spark):
    """0.001 deg of longitude on the equator is a*radians(0.001) m of
    east; 0.001 deg of latitude there is ~110.574 km/deg * 0.001."""
    origin = (0.0, 0.0, 0.0)
    df = spark.createDataFrame(
        [(0.0, 0.001, 0.0), (0.001, 0.0, 0.0)],
        "latitude double, longitude double, altitude double")
    got = {(r["latitude"], r["longitude"]):
           (r["east"], r["north"], r["up"])
           for r in enu_from_wgs84(df, origin).collect()}
    e = got[(0.0, 0.001)]
    assert abs(e[0] - WGS84_A * math.radians(0.001)) < 1e-4
    assert abs(e[1]) < 1e-6 and e[2] < 0        # curvature drop
    n = got[(0.001, 0.0)]
    # meridional radius at the equator: a(1-e^2) -> 110.574 km/deg
    assert abs(n[1] - 110.574 * 1000 * 0.001) < 0.05
    assert abs(n[0]) < 1e-6


def test_enu_rotation_preserves_ecef_distance(spark):
    """ENU is a rigid rotation of the ECEF delta: norms must agree
    (round-trip invariant without needing the inverse projection)."""
    origin = (-33.9, 151.2, 20.0)            # southern hemisphere
    pts = [(-33.95, 151.25, 100.0), (-33.85, 151.15, -40.0)]
    df = spark.createDataFrame(
        [tuple(map(float, p)) for p in pts],
        "latitude double, longitude double, altitude double")
    out = enu_from_wgs84(ecef_from_wgs84(df), origin).collect()
    o = _ecef_np(*origin)
    for r in out:
        enu = np.array([r["east"], r["north"], r["up"]])
        ecef = np.array([r["ecef_x"], r["ecef_y"], r["ecef_z"]])
        assert abs(np.linalg.norm(enu) - np.linalg.norm(ecef - o)) \
            < 1e-7


def test_geo_nulls_plan_and_errors(spark):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.plans import (
        formatted_plan,
    )
    df = spark.createDataFrame(
        [(1.0, 2.0, 3.0), (None, 2.0, 3.0)],
        "latitude double, longitude double, altitude double")
    out = enu_from_wgs84(df, (1.0, 2.0, 0.0))
    plan = formatted_plan(out)
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    rows = out.collect()
    nulls = [r for r in rows if r["latitude"] is None][0]
    assert nulls["east"] is None and nulls["up"] is None
    with pytest.raises(ValueError, match="no column"):
        enu_from_wgs84(df.drop("altitude"), (0.0, 0.0, 0.0))
    with pytest.raises(ValueError, match="out of range"):
        enu_from_wgs84(df, (123.0, 0.0, 0.0))
