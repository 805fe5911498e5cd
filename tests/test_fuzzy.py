"""Edit-distance join operators (operators/fuzzy.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import (
    edit_distance_pairs, fuzzy_join,
)
from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.plans.inspect import (
    formatted_plan,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(strings: dict[int, str], k: int) -> set[tuple[int, int, int]]:
    ids = sorted(strings)
    out = set()
    for i, x in enumerate(ids):
        for y in ids[i + 1:]:
            d = _lev(strings[x], strings[y])
            if d <= k:
                out.add((x, y, d))
    return out


def _mutants() -> dict[int, str]:
    """Words + deterministic mutations (substitute / delete / insert /
    unrelated), mixing long, short, and empty strings."""
    words = ["chartreuse metallic", "midnight chiffon", "linen almond",
             "powder drab rosy", "aquamarine", "on", "ox", "", "a",
             "burnished sky blue", "burnishes sky blue",   # sub, d=1
             "burnished sky blu",                          # del, d=1
             "xburnished sky blue",                        # ins, d=1
             "midnight chiffox",                           # sub, d=1
             "linen almondine",                            # d=3
             "ab", "ba", "abcd", "abdc"]
    return dict(enumerate(words))


@pytest.mark.parametrize("k,q", [(1, 2), (2, 2), (2, 3), (3, 1)])
def test_edit_distance_pairs_matches_brute_force(spark, k, q):
    strings = _mutants()
    df = spark.createDataFrame(list(strings.items()), "id long, s string")
    got = {(r.id_a, r.id_b, r.distance) for r in
           edit_distance_pairs(df, "s", "id", max_dist=k, q=q).collect()}
    assert got == _brute(strings, k)


def test_edit_distance_pairs_random_corpus_exact(spark):
    """Adversarial small-alphabet corpus: lots of near-misses, shared
    prefixes, and length-boundary cases — blocking must lose nothing."""
    import random
    rng = random.Random(7)
    strings = {i: "".join(rng.choice("ab")
                          for _ in range(rng.randrange(0, 9)))
               for i in range(120)}
    df = spark.createDataFrame(list(strings.items()), "id long, s string")
    got = {(r.id_a, r.id_b, r.distance) for r in
           edit_distance_pairs(df, "s", "id", max_dist=2).collect()}
    assert got == _brute(strings, 2)


def test_edit_distance_pairs_no_nested_loop(spark):
    """The candidate plan is hash/sort-merge equi-joins only — never a
    BroadcastNestedLoopJoin or CartesianProduct."""
    df = spark.createDataFrame(list(_mutants().items()), "id long, s string")
    plan = formatted_plan(edit_distance_pairs(df, "s", "id", max_dist=2))
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_fuzzy_join_inner_and_left(spark):
    left = spark.createDataFrame(
        [(1, "chartreuse"), (2, "midnight"), (3, "nothing alike")],
        "lid long, name string")
    right = spark.createDataFrame(
        [(10, "chartreuze"), (11, "midnght"), (12, "chartreuse"),
         (13, "zzzzzz")],
        "rid long, label string")
    inner = fuzzy_join(left, right, "name", "label", "lid", "rid",
                       max_dist=2)
    got = {(r.lid, r.rid, r.distance) for r in inner.collect()}
    assert got == {(1, 10, 1), (1, 12, 0), (2, 11, 1)}
    lft = fuzzy_join(left, right, "name", "label", "lid", "rid",
                     max_dist=2, how="left")
    rows = {(r.lid, r.rid) for r in lft.collect()}
    assert (3, None) in rows and len(rows) == 4
    with pytest.raises(ValueError):
        fuzzy_join(left, right, "name", "label", "lid", "rid", how="outer")


def test_edit_distance_pairs_validates_params(spark):
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    with pytest.raises(ValueError):
        edit_distance_pairs(df, "s", "id", max_dist=0)
    with pytest.raises(ValueError):
        edit_distance_pairs(df, "s", "id", q=0)
