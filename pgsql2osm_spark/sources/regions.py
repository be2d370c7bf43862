"""ISO-code -> region lookup dimension (reference: regions.csv, SURVEY.md S8).

The reference ships a 3,395-row CSV mapping iso codes to OSM relation ids and
resolves --iso arguments by substring-then-exact match over two iso columns
(/root/reference/pgsql2osm/dbutils.py:11-27). Here the dimension is a small
broadcast DataFrame; lookups are Column predicates. The fixture dimension is
generated (no external data), same shape: (osm_id, name, iso_country,
border_type, iso_subcountry, admin_level).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REGIONS_SCHEMA = (
    "osm_id long, name string, iso_country string, border_type string, "
    "iso_subcountry string, admin_level int"
)


def fixture_regions_dim(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic stand-in for regions.csv (fixture iso codes ZZ-xx)."""
    rows = []
    for r in range(1, n + 1):
        country = f"Z{chr(65 + (r - 1) % 26)}"
        rows.append(
            (
                -(100000 + r),  # relation boundaries are negative ids in the
                # reference's polygon table (settings.py:120-126)
                f"region{r}",
                country.lower(),
                "country" if r % 5 else "subdivision",
                f"{country}-{r:02d}".lower(),
                2 if r % 5 else 4,
            )
        )
    return spark.createDataFrame(rows, REGIONS_SCHEMA)


def regions_lookup(dim: DataFrame, iso: str) -> DataFrame:
    """Reference semantics (dbutils.py:11-27): case-insensitive; when the
    query contains '-' match iso_subcountry exactly, else iso_country;
    returns (name, osm_id) candidates."""
    iso = iso.lower()
    col = "iso_subcountry" if "-" in iso else "iso_country"
    return dim.where(F.lower(F.col(col)) == iso).select("name", "osm_id")
