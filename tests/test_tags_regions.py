"""Tag-merge parity quirks (SURVEY.md §5.5) + iso region lookup (S8)."""

from pyspark.sql import functions as F

from pgsql2osm_spark.functions import tags as TG
from pgsql2osm_spark.sources import regions as RG


def _df(spark):
    return spark.createDataFrame(
        [
            # (kind, col_tags, tags)
            ("N", {"name": "colname", "height": "10"}, {"name": "tagname"}),
            ("W", {"a": "1", "b": None}, {"b": "2", "c": None}),
            ("R", {"admin": "colonly"}, {"type": "multipolygon"}),
            ("N", None, {"x": "1"}),
            ("W", {"y": "2"}, None),
        ],
        "kind string, col_tags map<string,string>, tags map<string,string>",
    )


def test_right_biased_merge_and_null_elision(spark):
    out = _df(spark).select(
        "kind", TG.merge_tags(F.col("col_tags"), F.col("tags")).alias("m")
    ).collect()
    # {**col_tags, **tags} with NULL values dropped first
    assert out[0]["m"] == {"name": "tagname", "height": "10"}  # tags win on clash
    assert out[1]["m"] == {"a": "1", "b": "2"}  # col b:None elided, tags b wins, c:None elided
    assert out[3]["m"] == {"x": "1"}  # NULL left map
    assert out[4]["m"] == {"y": "2"}  # NULL right map


def test_relation_column_tag_quirk(spark):
    """Strict parity: relations drop column tags entirely (the reference's
    rel_to_xml double-iteration bug, pgsql2osm.py:473-474); nodes/ways keep
    the merge. Off by default."""
    df = _df(spark)
    strict = df.select(
        "kind",
        TG.entity_tags(F.col("kind"), F.col("col_tags"), F.col("tags"), True).alias("m"),
    ).collect()
    assert strict[2]["m"] == {"type": "multipolygon"}  # 'admin' column tag dropped
    assert strict[0]["m"] == {"name": "tagname", "height": "10"}  # node unaffected
    loose = df.select(
        TG.entity_tags(F.col("kind"), F.col("col_tags"), F.col("tags"), False).alias("m")
    ).collect()
    assert loose[2]["m"] == {"admin": "colonly", "type": "multipolygon"}


def test_regions_lookup_semantics(spark):
    dim = RG.fixture_regions_dim(spark, 30)
    # country query -> iso_country match
    hits = RG.regions_lookup(dim, "ZA").collect()
    assert all(r["name"].startswith("region") for r in hits) and len(hits) >= 1
    # subdivision query ('-' present) -> iso_subcountry exact
    sub = RG.regions_lookup(dim, "zb-02").collect()
    assert len(sub) == 1 and sub[0]["osm_id"] == -(100000 + 2)
    # negative relation-id convention preserved
    assert all(r["osm_id"] < 0 for r in hits)
    # reference input normalization (dbutils.py:12): '_' -> '-', any case
    norm = RG.regions_lookup(dim, "ZB_02").collect()
    assert [(r["name"], r["osm_id"]) for r in norm] == [
        (r["name"], r["osm_id"]) for r in sub
    ]
    # first_match replicates the reference's single first-exact-match return
    first = RG.regions_lookup(dim, "ZA", first_match=True).collect()
    assert len(first) == 1
    assert first[0]["osm_id"] == max(r["osm_id"] for r in hits)  # lowest |osm_id|


def test_load_regions_dim_csv(spark, tmp_path):
    csv = tmp_path / "regions.csv"
    csv.write_text(
        "osm_id,name,iso_country,border_type,iso_subcountry,admin_level,wikipedia\n"
        "91294,Poltava Oblast,,,UA-53,4,uk:x\n"
        "51701,Switzerland,CH,nation,,2,de:Schweiz\n"
    )
    dim = RG.load_regions_dim(spark, str(csv))
    assert set(dim.columns) == {
        "osm_id", "name", "iso_country", "border_type", "iso_subcountry",
        "admin_level", "_file_order",
    }
    hit = RG.regions_lookup(dim, "ch", first_match=True).collect()
    assert len(hit) == 1 and hit[0]["osm_id"] == 51701 and hit[0]["name"] == "Switzerland"
    sub = RG.regions_lookup(dim, "ua_53").collect()
    assert len(sub) == 1 and sub[0]["osm_id"] == 91294


def test_first_match_uses_file_order_not_osm_id(spark, tmp_path):
    """Reference parity: first exact match in regions.csv FILE order wins —
    even when a later row has a smaller |osm_id|."""
    csv = tmp_path / "dup.csv"
    csv.write_text(
        "osm_id,name,iso_country,border_type,iso_subcountry,admin_level\n"
        "99999,First,XX,nation,,2\n"
        "11,Second,XX,nation,,2\n"
    )
    dim = RG.load_regions_dim(spark, str(csv))
    hit = RG.regions_lookup(dim, "xx", first_match=True).collect()
    assert len(hit) == 1 and hit[0]["name"] == "First" and hit[0]["osm_id"] == 99999
