"""Attribute-fetch phase: priority cascade + tag merge + inner-join drops —
a python oracle encodes the reference's exact 'write'-phase semantics."""

import pandas as pd
from pyspark.sql import functions as F

from pgsql2osm_spark.operators import attributes as AT

ATTR_SCHEMA = (
    "kind string, id long, col_tags map<string,string>, tags map<string,string>"
)


def _sources(spark):
    # polygon-priority source has ids 1,2 (N), 10 (W); line has 2,3 (N);
    # middle has 3,4 (N), 10,11 (W), 20 (R)
    poly = spark.createDataFrame(
        [
            ("N", 1, {"src": "poly", "height": "5"}, {"name": "one"}),
            ("N", 2, {"src": "poly"}, {"name": "two-poly"}),
            ("W", 10, {"src": "poly"}, {"highway": "yes"}),
        ],
        ATTR_SCHEMA,
    )
    line = spark.createDataFrame(
        [
            ("N", 2, {"src": "line"}, {"name": "two-line"}),
            ("N", 3, {"src": "line", "bad": None}, {"name": "three"}),
        ],
        ATTR_SCHEMA,
    )
    mid = spark.createDataFrame(
        [
            ("N", 3, {"src": "mid"}, {"name": "three-mid"}),
            ("N", 4, {"src": "mid"}, None),
            ("W", 11, {"src": "mid"}, {"name": "w11"}),
            ("R", 20, {"admin": "colonly"}, {"type": "multipolygon"}),
        ],
        ATTR_SCHEMA,
    )
    return [(poly, 0), (line, 1), (mid, 2)]


def _ids(spark):
    return {
        "N": spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 5)], "id long"),
        "W": spark.createDataFrame([(10,), (11,)], "id long"),
        "R": spark.createDataFrame([(20,)], "id long"),
    }


def test_cascade_merge_and_drop(spark):
    out = {
        (r["kind"], r["id"]): r["tags"]
        for r in AT.fetch_attributes(_ids(spark), _sources(spark)).collect()
    }
    # first-wins: node 2 from poly, node 3 from line
    assert out[("N", 2)] == {"src": "poly", "name": "two-poly"}
    assert out[("N", 3)] == {"src": "line", "name": "three"}  # NULL 'bad' elided
    # right-bias: middle tags override column tags on clash? no clash here,
    # but col+tags merge present
    assert out[("N", 1)] == {"src": "poly", "height": "5", "name": "one"}
    assert out[("N", 4)] == {"src": "mid"}  # NULL tag map handled
    # inner-join drop: id 5 has no attribute row anywhere (J10)
    assert ("N", 5) not in out
    assert out[("W", 10)] == {"src": "poly", "highway": "yes"}
    assert out[("R", 20)] == {"admin": "colonly", "type": "multipolygon"}


def test_strict_parity_drops_relation_column_tags(spark):
    out = {
        (r["kind"], r["id"]): r["tags"]
        for r in AT.fetch_attributes(
            _ids(spark), _sources(spark), strict_reference_parity=True
        ).collect()
    }
    assert out[("R", 20)] == {"type": "multipolygon"}  # column tag gone
    assert out[("N", 1)] == {"src": "poly", "height": "5", "name": "one"}  # unchanged


def test_export_rows_coordinates_inner_join(spark):
    coords = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2, 3], "lon": [1.0, 2.0, 3.0], "lat": [1.0, 2.0, 3.0]})
    )
    rows = AT.export_rows(_ids(spark), _sources(spark), coordinates=coords).collect()
    by_key = {(r["kind"], r["id"]): r for r in rows}
    # node 4 has attributes but NO coordinate row -> dropped (flat-nodes skip)
    assert ("N", 4) not in by_key
    assert by_key[("N", 1)]["lon"] == 1.0
    # ways/rels carry null coordinates but survive
    assert ("W", 10) in by_key and by_key[("W", 10)]["lon"] is None
