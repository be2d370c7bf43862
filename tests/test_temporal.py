"""As-of and range joins vs DuckDB oracles (ASOF JOIN is native in DuckDB)."""

import duckdb
import numpy as np
import pandas as pd

from pgsql2osm_spark.operators import temporal as TP


def _frames():
    rng = np.random.default_rng(17)
    build = pd.DataFrame(
        {
            "user_id": rng.integers(0, 20, 300),
            "tsec": np.sort(rng.integers(0, 100000, 300)),
            "price": rng.integers(1, 1000, 300).astype("int64"),
        }
    )
    probe = pd.DataFrame(
        {
            "pid": np.arange(150),
            "user_id": rng.integers(0, 22, 150),  # some users have no builds
            "tsec": rng.integers(-50, 100050, 150),
        }
    )
    return build, probe


def test_asof_join_matches_duckdb(spark):
    build, probe = _frames()
    got = TP.asof_join(
        spark.createDataFrame(probe),
        spark.createDataFrame(build),
        key="user_id",
        time_col="tsec",
        build_cols=["price"],
        probe_id="pid",
    ).toPandas()
    con = duckdb.connect()
    con.register("build", build)
    con.register("probe", probe)
    exp = con.sql(
        """
        SELECT p.pid, b.tsec AS asof_ts, b.price
        FROM probe p ASOF LEFT JOIN build b
          ON p.user_id = b.user_id AND p.tsec >= b.tsec
        """
    ).df()
    g = {
        r.pid: (None if pd.isna(r.asof_ts) else r.asof_ts, None if pd.isna(r.price) else r.price)
        for r in got.itertuples()
    }
    e = {
        r.pid: (None if pd.isna(r.asof_ts) else r.asof_ts, None if pd.isna(r.price) else r.price)
        for r in exp.itertuples()
    }
    assert len(g) == len(probe)
    for pid in e:
        assert g[pid] == e[pid], f"pid {pid}: {g[pid]} != {e[pid]}"


def test_asof_equal_timestamp_visible(spark):
    """A build row at exactly the probe time is matched (<= semantics)."""
    build = pd.DataFrame({"user_id": [1], "tsec": [100], "price": [7]})
    probe = pd.DataFrame({"pid": [0], "user_id": [1], "tsec": [100]})
    got = TP.asof_join(
        spark.createDataFrame(probe), spark.createDataFrame(build),
        key="user_id", time_col="tsec", build_cols=["price"], probe_id="pid",
    ).collect()
    assert got[0]["price"] == 7 and got[0]["asof_ts"] == 100


def test_range_join_matches_bruteforce(spark):
    rng = np.random.default_rng(23)
    lo = rng.uniform(0, 900, 80)
    intervals = pd.DataFrame(
        {"iv_id": np.arange(80), "lo": lo, "hi": lo + rng.uniform(1, 80, 80)}
    )
    probe = pd.DataFrame({"pid": np.arange(500), "value": rng.uniform(-10, 1010, 500)})
    got = TP.range_join(
        spark.createDataFrame(probe), spark.createDataFrame(intervals),
        value_col="value", step=25.0,
    ).toPandas()
    g = {(r.pid, r.iv_id) for r in got.itertuples()}
    e = {
        (int(p), int(i))
        for p in range(500)
        for i in range(80)
        if intervals["lo"][i] <= probe["value"][p] <= intervals["hi"][i]
    }
    assert g == e and len(e) > 100


def test_asof_null_build_column_not_stitched(spark):
    """Per-row semantics: the LATEST build row's values are returned even if
    some are NULL — never a Franken-row stitched from older rows."""
    build = pd.DataFrame(
        {"user_id": [1, 1], "tsec": [1, 2], "a": [5.0, np.nan], "b": ["x", "y"]}
    )
    probe = pd.DataFrame({"pid": [0], "user_id": [1], "tsec": [3]})
    got = TP.asof_join(
        spark.createDataFrame(probe), spark.createDataFrame(build),
        key="user_id", time_col="tsec", build_cols=["a", "b"], probe_id="pid",
    ).collect()[0]
    assert got["asof_ts"] == 2 and got["b"] == "y"
    assert got["a"] is None  # NOT 5.0 from the older row


def test_asof_string_probe_id(spark):
    """probe_id keeps its own dtype (strings work)."""
    build = pd.DataFrame({"user_id": [1], "tsec": [1], "price": [9]})
    probe = pd.DataFrame({"pid": ["img0001"], "user_id": [1], "tsec": [5]})
    got = TP.asof_join(
        spark.createDataFrame(probe), spark.createDataFrame(build),
        key="user_id", time_col="tsec", build_cols=["price"], probe_id="pid",
    ).collect()[0]
    assert got["pid"] == "img0001" and got["price"] == 9
