"""Scene detection: object-in-lane geometry + change-point scene intervals.

Re-expresses the reference's second EMR job (detect_scenes.py) Spark-first:

- The reference leaves Catalyst for per-row Python three times
  (``df.rdd.map`` at detect_scenes.py:115-117 and 185-190, a scalar UDF at
  192-193). Here every step is a Catalyst expression: the geometric
  object-in-lane test is nested higher-order array functions
  (``transform``/``filter``/``aggregate``), people counting is
  ``size(filter(...))``, and the state machine is ``when/otherwise`` +
  window lag/lead — so the whole job stays inside whole-stage codegen and
  survives a 100 TB scan without a Python worker round trip.

- Inputs are *typed* columns (``array<struct<...>>``), not the reference's
  double-nested JSON strings (detect_scenes.py:96). ``from_json`` adapters
  are provided for reference-shaped data.

Semantics parity (documented against detect_scenes.py):

- nearest lane point per lane: Euclidean argmin over the lane's
  ``image_points`` with a strict 1000.0 cutoff (detect_scenes.py:19-28:
  ``min_dist = 1000`` and ``d < min_dist``). No point within 1000 → that
  lane contributes no nearest point.
- corner-in-lane: bbox corner x between the nearest points' x of lanes
  (i, i+1), first matching pair wins, label ``between_{i}_and_{i+1}``
  (detect_scenes.py:51-64; y is deliberately ignored — the reference's
  own TODO at :59).
- object-in-lane: any of the 4 bbox corners in a lane; emits
  ``corners_in_lane`` count and distinct pair labels in corner order
  (detect_scenes.py:67-90).
- rows where either input column is null → ``objects_in_lane`` null
  (detect_scenes.py:93-112).
- The reference crashes (KeyError) when a lane has no points; here an
  empty/point-free lane simply never matches — identical results on all
  inputs the reference can process.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.sessionize import change_point_intervals

DETECTIONS_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("x", T.DoubleType()),
    T.StructField("y", T.DoubleType()),
    T.StructField("width", T.DoubleType()),
    T.StructField("height", T.DoubleType()),
    T.StructField("Class", T.StringType()),
]))

LANES_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("image_points", T.ArrayType(T.StructType([
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
    ]))),
]))

MAX_NEAREST_DIST = 1000.0


def _nearest_xs(lanes: Column, cx: Column, cy: Column) -> Column:
    """x of the nearest image point per lane (null when the lane has no
    point within MAX_NEAREST_DIST) — detect_scenes.py:19-44 as one
    ``transform`` + running-argmin ``aggregate``."""
    init = F.lit(None).cast("struct<d:double,px:double>")

    def per_lane(lane):
        def step(acc, p):
            d = F.sqrt((p["x"] - cx) * (p["x"] - cx) + (p["y"] - cy) * (p["y"] - cy))
            better = d < F.coalesce(acc["d"], F.lit(MAX_NEAREST_DIST))
            return F.when(better, F.struct(d.alias("d"), p["x"].alias("px"))).otherwise(acc)

        return F.aggregate(lane["image_points"], init, step)["px"]

    return F.transform(lanes, per_lane)


def _corner_label(nearest: Column, cx: Column) -> Column:
    """First adjacent-lane pair whose nearest-point xs bracket ``cx``;
    null when none — detect_scenes.py:47-64."""
    n = F.size(nearest)
    idx = F.sequence(F.lit(0), n - 2)

    def brackets(i):
        a = F.element_at(nearest, (i + 1).cast("int"))
        b = F.element_at(nearest, (i + 2).cast("int"))
        return (a.isNotNull() & b.isNotNull()
                & (((cx >= a) & (cx <= b)) | ((cx <= a) & (cx >= b))))

    hits = F.filter(idx, brackets)
    first = F.element_at(hits, 1)
    return F.when(
        (n >= 2) & (F.size(hits) > 0),
        F.concat(F.lit("between_"), first.cast("string"),
                 F.lit("_and_"), (first + 1).cast("string")))


def objects_in_lane(detections: Column | str, lanes: Column | str) -> Column:
    """``array<struct<x,y,width,height,Class,corners_in_lane,lanes>>`` of
    the detections with ≥1 bbox corner inside a lane — the reference's
    ``obj_in_lane_detection`` (detect_scenes.py:93-112) without leaving
    Catalyst. Null if either input is null."""
    dets = F.col(detections) if isinstance(detections, str) else detections
    lns = F.col(lanes) if isinstance(lanes, str) else lanes

    def per_object(o):
        x_min, x_max = o["x"] - o["width"] / 2, o["x"] + o["width"] / 2
        y_min, y_max = o["y"] - o["height"] / 2, o["y"] + o["height"] / 2
        corner_labels = F.array(*[
            _corner_label(_nearest_xs(lns, cx, cy), cx)
            for cx, cy in ((x_min, y_min), (x_max, y_min),
                           (x_min, y_max), (x_max, y_max))
        ])
        in_lane = F.filter(corner_labels, lambda v: v.isNotNull())
        return F.struct(
            o["x"].alias("x"), o["y"].alias("y"),
            o["width"].alias("width"), o["height"].alias("height"),
            o["Class"].alias("Class"),
            F.size(in_lane).alias("corners_in_lane"),
            F.array_distinct(in_lane).alias("lanes"),
        )

    enriched = F.transform(dets, per_object)
    kept = F.filter(enriched, lambda s: s["corners_in_lane"] > 0)
    return F.when(dets.isNotNull() & lns.isNotNull(), kept)


def objects_in_lane_by_key(df: DataFrame, detections_col: str,
                           lanes_col: str, keys: list[str],
                           out_col: str = "objects_in_lane") -> DataFrame:
    """:func:`objects_in_lane` as a relational plan (explode → join →
    aggregate) instead of nested array expressions.

    Same semantics, different physical strategy: higher-order array
    functions are CodegenFallback in Spark — evaluated row-at-a-time by
    the interpreter — and the nested argmin-per-lane-per-corner tree
    costs ~3.6 ms/row, which cannot survive a 100 TB scan. This
    formulation joins lane points to exploded *detections* (not corners:
    all four corner↔point distances are evaluated in one whole-stage-
    codegen projection per joined row, 4× fewer join rows than a corner
    explode), takes the per-(detection, lane) argmin for each corner as
    four ``min(struct(d, pi, px))`` hash aggregates, finds the first
    adjacent-lane pair bracketing each corner with a window ``lead``
    over the lane index (replacing a lanes×lanes self-join), and
    rebuilds the per-row array with ``collect_list`` + position sort.
    Every heavy operator is codegen'd; the only higher-order calls left
    run on ≤4-element arrays.

    All shuffles share the ``keys`` prefix (join on keys → aggregate on
    (keys, det, lane) → window + aggregate on (keys, det) → aggregate on
    keys), so AQE coalesces them into co-partitioned exchanges; the
    dets × lane-points row multiplication is the inherent work of the
    geometry, spread across the cluster instead of nested inside one
    interpreted expression. Detection attributes ride through the
    aggregates as ``first()``s, so nothing joins back to the exploded
    detections.

    ``keys`` must uniquely identify rows of ``df`` (the reference keys
    scenes by bag + timestamp: detect_scenes.py:197-201); otherwise
    detections of distinct rows would merge.

    Returns ``df``'s columns plus ``out_col``; row order is not
    preserved (it is never meaningful to the downstream window, which
    re-sorts by time). Null detections/lanes → null, exactly like
    :func:`objects_in_lane` (detect_scenes.py:93-112).
    """
    dets = F.col(detections_col)
    lns = F.col(lanes_col)
    valid = dets.isNotNull() & lns.isNotNull()
    base = df.withColumn("_valid", valid)
    vb = base.where(F.col("_valid")).select(*keys, dets.alias("_dets"),
                                            lns.alias("_lanes"))

    # detections, exploded with their position (order restored at the
    # end); corner xs/ys precomputed — corner i's coordinates are
    # (_cx{i}, _cy{i}) in the fixed reference order (detect_scenes.py:
    # 68-79: (x_min,y_min), (x_max,y_min), (x_min,y_max), (x_max,y_max))
    o = F.col("_o")
    x_min, x_max = o["x"] - o["width"] / 2, o["x"] + o["width"] / 2
    y_min, y_max = o["y"] - o["height"] / 2, o["y"] + o["height"] / 2
    corner_xy = [(x_min, y_min), (x_max, y_min), (x_min, y_max), (x_max, y_max)]
    d = (vb.select(*keys, F.posexplode("_dets").alias("_di", "_o"))
         .select(*keys, "_di",
                 o["x"].alias("_x"), o["y"].alias("_y"),
                 o["width"].alias("_w"), o["height"].alias("_h"),
                 o["Class"].alias("_cls"),
                 *[c.alias(f"_c{a}{i}")
                   for i, (cx, cy) in enumerate(corner_xy)
                   for a, c in (("x", cx), ("y", cy))]))

    # lane points, exploded; point-free lanes survive with a null point
    lane_pts = (vb.select(*keys, F.posexplode("_lanes").alias("_li", "_lane"))
                .select(*keys, "_li",
                        F.posexplode_outer("_lane.image_points").alias("_pi", "_p"))
                .select(*keys, "_li",
                        F.col("_pi"),
                        F.col("_p.x").alias("_px"), F.col("_p.y").alias("_py")))

    # nearest point per (detection, lane) for all 4 corners at once:
    # argmin with the reference's strict 1000.0 cutoff
    # (detect_scenes.py:19-28); min(struct) tie-breaks on point index =
    # first-point-wins, like the reference's strict '<'
    def corner_np(i):
        dx = F.col("_px") - F.col(f"_cx{i}")
        dy = F.col("_py") - F.col(f"_cy{i}")
        dist = F.sqrt(dx * dx + dy * dy)
        return F.min(F.when(dist < MAX_NEAREST_DIST,
                            F.struct(dist.alias("d"),
                                     F.col("_pi").alias("pi"),
                                     F.col("_px").alias("px")))).alias(f"_np{i}")

    passthru = ["_x", "_y", "_w", "_h", "_cls",
                "_cx0", "_cx1", "_cx2", "_cx3"]
    near = (d.join(lane_pts, list(keys))
            .groupBy(*keys, "_di", "_li")
            .agg(*[F.first(c).alias(c) for c in passthru],
                 *[corner_np(i) for i in range(4)]))

    # first adjacent-lane pair whose nearest xs bracket each corner
    # (detect_scenes.py:47-64: x-only, first pair wins) — the "next
    # lane" comes from a window lead, not a self-join
    w = Window.partitionBy(*keys, "_di").orderBy("_li")
    withnext = near.select(
        *keys, "_di", "_li", *passthru,
        *[F.col(f"_np{i}")["px"].alias(f"_pxa{i}") for i in range(4)],
        *[F.lead(F.col(f"_np{i}")["px"]).over(w).alias(f"_pxb{i}")
          for i in range(4)])

    def corner_hit(i):
        pxa, pxb = F.col(f"_pxa{i}"), F.col(f"_pxb{i}")
        cx = F.col(f"_cx{i}")
        brackets = (pxa.isNotNull() & pxb.isNotNull()
                    & (((cx >= pxa) & (cx <= pxb))
                       | ((cx <= pxa) & (cx >= pxb))))
        return F.min(F.when(brackets, F.col("_li"))).alias(f"_hit{i}")

    def label(i):
        h = F.col(f"_hit{i}")
        return F.when(h.isNotNull(),
                      F.concat(F.lit("between_"), h.cast("string"),
                               F.lit("_and_"), (h + 1).cast("string")))

    # per detection: labels in corner order (≤4-element arrays — the
    # only higher-order calls left, negligible at this size); the
    # window's (keys, _di) partitioning is exactly this groupBy's key,
    # so no extra exchange separates them
    per_det = (withnext.groupBy(*keys, "_di")
               .agg(*[F.first(c).alias(c) for c in passthru[:5]],
                    *[corner_hit(i) for i in range(4)])
               .withColumn("_in_lane",
                           F.filter(F.array(*[label(i) for i in range(4)]),
                                    lambda v: v.isNotNull()))
               .where(F.size("_in_lane") > 0))

    enriched = per_det.select(*keys, "_di", F.struct(
        F.col("_x").alias("x"), F.col("_y").alias("y"),
        F.col("_w").alias("width"), F.col("_h").alias("height"),
        F.col("_cls").alias("Class"),
        F.size("_in_lane").alias("corners_in_lane"),
        F.array_distinct("_in_lane").alias("lanes")).alias("_s"))
    per_row = (enriched.groupBy(*keys)
               .agg(F.transform(
                   F.sort_array(F.collect_list(F.struct("_di", "_s"))),
                   lambda s: s["_s"]).alias("_oil")))

    empty = F.array().cast(
        "array<struct<x:double,y:double,width:double,height:double,"
        "Class:string,corners_in_lane:int,lanes:array<string>>>")
    return (base.join(per_row, list(keys), "left")
            .select(*df.columns,
                    F.when(F.col("_valid"),
                           F.coalesce(F.col("_oil"), empty)).alias(out_col)))


def detect_scenes(df: DataFrame, detections_col: str, lanes_col: str,
                  keep_cols: list[str] | None = None) -> DataFrame:
    """Scene-detection projection (detect_scenes.py:115-117 ``detect_scenes``):
    input wide synchronized frame → (keep_cols…, objects_in_lane)."""
    keep = keep_cols or [c for c in df.columns
                         if c not in (detections_col, lanes_col)]
    return df.select(
        *keep, objects_in_lane(detections_col, lanes_col).alias("objects_in_lane"))


def people_in_scene(objects_col: Column | str = "objects_in_lane",
                    cls: str = "person") -> Column:
    """Count of objects of ``cls`` in lane — detect_scenes.py:174-182's
    row-wise Python loop as ``size(filter(...))``; null stays null."""
    c = F.col(objects_col) if isinstance(objects_col, str) else objects_col
    return F.when(
        c.isNotNull(),
        F.size(F.filter(c, lambda o: o["Class"] == cls)).cast("long"))


def summarize_person_scenes(df: DataFrame, keys: list[str],
                            time_col: str = "Time",
                            objects_col: str = "objects_in_lane",
                            topics_analyzed: str = "") -> DataFrame:
    """Scene intervals where ≥1 person is in lane — the reference's
    ``summarize_person_scenes`` (detect_scenes.py:185-222) as window
    lag/lead + ``when/otherwise``.

    Parity notes: rows with null ``objects_in_lane`` are excluded from
    the state stream exactly like the reference's
    ``num_people_in_scene is not null and ..._lag1 is not null`` filter
    (detect_scenes.py:203); a scene open at end-of-bag keeps
    ``end_time`` null. ``scene_id = <bag>_PersonInLane_<start_time>``
    (detect_scenes.py:218), ``scene_length = end_time - start_time``."""
    counted = (df
               .withColumn("num_people_in_scene", people_in_scene(objects_col))
               .where(F.col("num_people_in_scene").isNotNull()))

    intervals = change_point_intervals(
        counted, keys, time_col,
        state=F.col("num_people_in_scene") > 0,
        extra_cols=["num_people_in_scene"])

    return (intervals
            .withColumnRenamed("num_people_in_scene", "num_people_in_scene_start")
            .withColumn("scene_id",
                        F.concat(F.col(keys[0]), F.lit("_PersonInLane_"),
                                 F.col("start_time").cast("string")))
            .withColumnRenamed("interval_length", "scene_length")
            .withColumn("topics_analyzed", F.lit(topics_analyzed)))


def normalize_pseudo_json(col: Column | str) -> Column:
    """Python-repr / YAML-ish pseudo-JSON → parseable JSON.

    The reference's extractor stores complex ROS fields as the
    *Python repr* of ``parse_yaml_val``'s output (main.py:51-58,
    110-113): single-quoted keys/strings, ``None``/``True``/``False``
    literals — bagpy's CSV cells are YAML-ish, not JSON. This is the
    shape a user replaying reference-produced parquet actually hits,
    so the adapter must accept it. Pure ``regexp_replace`` chain
    (stays in codegen); identity on already-clean JSON that contains
    no single quotes. Word-boundary guards keep ``None``/``True``/
    ``False`` inside longer identifiers (or quoted strings followed by
    word chars) untouched.

    KNOWN LIMITATION (textual, not structural, rewriting): every single
    quote is replaced, so a string VALUE containing an apostrophe
    (``Class "driver's door"``) becomes invalid JSON, and a quoted
    literal value ``'None'``/``'True'``/``'False'`` is rewritten to the
    bare JSON literal. Reference payloads (numeric bbox/lane structs)
    never hit either case; for mixed corpora use
    :func:`parse_reference_json`, which tries STRICT ``from_json``
    first and only falls back to this normalization when strict parsing
    nulls out — clean JSON is never touched."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, "'", '"')
    c = F.regexp_replace(c, r"\bNone\b", "null")
    c = F.regexp_replace(c, r"\bTrue\b", "true")
    return F.regexp_replace(c, r"\bFalse\b", "false")


def parse_reference_json(df: DataFrame, detections_json: str,
                         lanes_json: str, tolerant: bool = True) -> DataFrame:
    """Adapter for reference-shaped inputs: the double-nested JSON payload
    columns of ``synchronized_topics`` (detect_scenes.py:96 does
    ``json.loads(json.loads(...))``) → typed arrays. ``from_json`` twice:
    once to unwrap the payload string, once to parse the nested value.

    ``tolerant`` (default) parses the inner value STRICTLY first and
    falls back to :func:`normalize_pseudo_json` only where strict
    parsing yields null, because the reference's ``*_clean`` cells are
    single-quoted Python reprs (main.py:51-58), not JSON. The
    strict-first order means already-clean JSON — including values with
    apostrophes or quoted 'None' strings, which the normalizer would
    corrupt — is never rewritten; both parses are codegen expressions
    on the same row, no extra pass."""
    det_payload = F.from_json(
        F.col(detections_json),
        T.StructType([T.StructField("detections_bboxes_clean", T.StringType())]))
    lane_payload = F.from_json(
        F.col(lanes_json),
        T.StructType([T.StructField("lanes_clean", T.StringType())]))
    det_val = det_payload["detections_bboxes_clean"]
    lane_val = lane_payload["lanes_clean"]

    def parse(val, schema):
        strict = F.from_json(val, schema)
        if not tolerant:
            return strict
        return F.coalesce(strict,
                          F.from_json(normalize_pseudo_json(val), schema))

    return (df
            .withColumn("_detections", parse(det_val, DETECTIONS_SCHEMA))
            .withColumn("_lanes", parse(lane_val, LANES_SCHEMA)))
