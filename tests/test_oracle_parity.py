"""Mirror of the driver's DuckDB-oracle gate (SURVEY §5.2): every
registry query's Spark result must match its oracle SQL on row count,
column names, and values (floats to 1e-9 rel).

SF policy (r6 verdict stretch #9): at 151 registered queries and a hard
50-slot driver window, driver evidence for out-of-window entries ages
~3 rounds per rotation — so the OUT-OF-WINDOW queries run here at the
DRIVER'S sf (sf0.01), making local evidence match driver conditions
exactly while slots rotate; in-window queries stay at sf0.001 (the
driver re-checks them at sf0.01 every round anyway). Set
SPARK_GRAFT_PARITY_FAST=1 to force sf0.001 everywhere during quick
development iterations."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from etl_visualization_of_cryptocurrency_trading_data_spark.catalog import TABLES
from etl_visualization_of_cryptocurrency_trading_data_spark.plans.registry import ORACLES, QUERIES

from conftest import SF_SMOKE

SF_DRIVER = "/root/testdata/sf0.01"
_FAST = os.environ.get("SPARK_GRAFT_PARITY_FAST") == "1"
_WINDOW = frozenset(list(QUERIES)[:50])


def _sf_for(name: str) -> str:
    if _FAST or name in _WINDOW or not os.path.isdir(SF_DRIVER):
        return SF_SMOKE
    return SF_DRIVER


def _make_duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def duck():
    con = _make_duck(SF_SMOKE)
    yield con
    con.close()


@pytest.fixture(scope="module")
def duck_driver_sf():
    con = _make_duck(SF_DRIVER if os.path.isdir(SF_DRIVER) else SF_SMOKE)
    yield con
    con.close()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            s = pd.to_datetime(pdf[c])
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            pdf[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_object_dtype(pdf[c]):
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns), na_position="last").reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), f"{name}: columns differ"
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(duck_pdf)}"
    )
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            av = a[c].astype(float).to_numpy()
            bv = b[c].astype(float).to_numpy()
            assert np.isnan(av).sum() == np.isnan(bv).sum(), f"{name}.{c}: null counts differ"
            ok = np.isclose(av, bv, rtol=1e-9, atol=1e-12, equal_nan=True)
            assert ok.all(), (
                f"{name}.{c}: {(~ok).sum()} values differ; first: "
                f"{av[~ok][:3]} vs {bv[~ok][:3]}"
            )
        else:
            assert a[c].equals(b[c]), f"{name}.{c}: values differ\n{a[c]}\n{b[c]}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, duck_driver_sf, name):
    sf_dir = _sf_for(name)
    con = duck if sf_dir == SF_SMOKE else duck_driver_sf
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        # rows-only contract (non-SQL-expressible op): must run and be stable
        assert len(sdf) >= 0
        return
    odf = con.sql(ORACLES[name]).df()
    assert_frames_match(sdf, odf, name)


def test_teaching_form_matches_oracle_after_demotion(spark, duck, duck_driver_sf):
    """Demotion safety net (r8 verdict item #5 / NOTES_r08 §7): the ten
    labeled teaching forms keep their VERBATIM oracle parity check here
    the moment they are demoted out of the registry (flip
    registry.DEMOTE_TEACHING_FORMS at the written trigger). While they
    are still registered this is a no-op — test_query_matches_oracle
    already covers them at the driver's sf — so arming the twin costs
    nothing today. Set SPARK_GRAFT_FORCE_TEACHING_PARITY=1 to exercise
    this path pre-demotion (used once to prove the twin passes)."""
    from etl_visualization_of_cryptocurrency_trading_data_spark.plans import registry

    force = os.environ.get("SPARK_GRAFT_FORCE_TEACHING_PARITY") == "1"
    pending = [
        n for n in sorted(registry.TEACHING)
        if force or n not in registry.QUERIES
    ]
    if not pending:
        pytest.skip("teaching forms still registered — covered by the main gate")
    for name in pending:
        fn, sql = registry.TEACHING[name]
        sf_dir = SF_DRIVER if os.path.isdir(SF_DRIVER) else SF_SMOKE
        con = duck_driver_sf if sf_dir != SF_SMOKE else duck
        assert_frames_match(fn(spark, sf_dir).toPandas(), con.sql(sql).df(), name)


# r10 verdict item #6: the demoted teaching pairs are no longer in the
# driver window, so test_teaching_form_matches_oracle_after_demotion is
# their ONLY evidence. This fixture pins sha256(fn source + oracle SQL)
# per pair — any edit to a teaching form's function or oracle fails here
# until the fixture is updated IN THE SAME COMMIT, which forces the
# editor to re-run the parity twin consciously rather than silently
# rotting un-driver-checked surface. Regenerate with:
#   python -c "import hashlib, inspect;
#     from etl_visualization_of_cryptocurrency_trading_data_spark.plans import registry;
#     [print(n, hashlib.sha256((inspect.getsource(f) + chr(0) + s).encode()).hexdigest()[:16])
#      for n, (f, s) in sorted(registry.TEACHING.items())]"
TEACHING_FINGERPRINTS = {
    "coin_pagerank": "d46ee475a635d9ca",
    "dup_clusters": "1c1cfcd856bd89ba",
    "embedding_dup_pairs": "4b8c0c775019e717",
    # updated r11: the plans/oracles split moved the builder one package
    # level deeper, so its function-local import gained a dot
    # (from ..functions -> from ...functions); semantics unchanged and
    # test_teaching_form_matches_oracle_after_demotion re-verified.
    "incremental_dedup": "9ae8f1b8ca829750",
    "kmeans_centroids": "cf058653ee40c1df",
    "knn_brute": "a8f73cb0e1a73a10",
    "knn_ivf": "5f904c00d87790bd",
    "knn_lsh": "b99d85a0e978db81",
    "semantic_dedup": "6ec195dcd386a746",
    "simhash_pairs": "fc3005d8d3dce568",
}


def test_teaching_form_drift_tripwire():
    """The demoted (query fn, oracle SQL) pairs must not drift without
    the editor acknowledging it here (r10 verdict item #6): hash each
    pair's function source + SQL and compare against the pinned
    fingerprint fixture above."""
    import hashlib
    import inspect

    from etl_visualization_of_cryptocurrency_trading_data_spark.plans import registry

    got = {
        name: hashlib.sha256(
            (inspect.getsource(fn) + "\x00" + sql).encode()
        ).hexdigest()[:16]
        for name, (fn, sql) in registry.TEACHING.items()
    }
    drifted = {
        n: (TEACHING_FINGERPRINTS.get(n), h)
        for n, h in got.items()
        if TEACHING_FINGERPRINTS.get(n) != h
    }
    assert not drifted, (
        "teaching form(s) changed without updating the fingerprint "
        f"fixture (expected, got): {drifted} — re-run "
        "test_teaching_form_matches_oracle_after_demotion (or force it "
        "with SPARK_GRAFT_FORCE_TEACHING_PARITY=1) and update "
        "TEACHING_FINGERPRINTS in the same commit"
    )
    assert set(got) == set(TEACHING_FINGERPRINTS)


def test_registry_snapshot_is_byte_identical():
    """r10 verdict item #2 guard: the plans/registry.py ->
    plans/oracles/ package split must be a PURE refactor. The fixture
    (tests/fixtures/registry_snapshot.json, generated by
    scripts/snapshot_registry.py) tracks the LIVE rendered registry
    surface; it was initially generated from the pre-refactor
    single-file registry at commit eb932cc (history: that arm proved
    the split byte-identical) and is regenerated in the same commit as
    any legitimate registry change, so the guard pins the CURRENT
    surface against accidental rendering drift. It pins the
    post-demotion QUERIES key order + builder names, the ORACLES key
    order + sha256 of every rendered SQL string, and the TEACHING
    pairs. Any rendering change
    — reordered keys, a re-rendered f-string fragment, a renamed
    builder — fails here. Legitimate registry changes (new/changed
    queries in later rounds) regenerate the fixture in the same
    commit via scripts/snapshot_registry.py."""
    import hashlib
    import json
    import pathlib

    from etl_visualization_of_cryptocurrency_trading_data_spark.plans import registry

    snap = json.loads(
        (pathlib.Path(__file__).parent / "fixtures" / "registry_snapshot.json")
        .read_text()
    )
    sha = lambda s: hashlib.sha256(s.encode()).hexdigest()  # noqa: E731
    assert list(registry.QUERIES) == snap["queries_order"]
    assert {k: f.__name__ for k, f in registry.QUERIES.items()} == snap[
        "builder_names"
    ]
    assert list(registry.ORACLES) == snap["oracles_order"]
    mismatched = [
        k
        for k, v in registry.ORACLES.items()
        if sha(v) != snap["oracle_sha256"][k]
    ]
    assert not mismatched, f"oracle SQL re-rendered differently: {mismatched}"
    assert {
        k: [fn.__name__, sha(sql)] for k, (fn, sql) in registry.TEACHING.items()
    } == snap["teaching"]


def test_all_queries_run_on_empty_tables(spark, tmp_path):
    """Robustness pin: every registered query plans and executes on
    EMPTY fixture tables (same schemas) without raising — no hidden
    .first()/div-by-zero/eager-collect assumptions about non-empty
    input. Empty input is what a new partition / fresh deployment
    serves first."""
    import os

    from etl_visualization_of_cryptocurrency_trading_data_spark.catalog import (
        TABLES,
        load_table,
    )
    from etl_visualization_of_cryptocurrency_trading_data_spark.plans.registry import (
        QUERIES,
    )

    empty = str(tmp_path / "sf_empty")
    os.makedirs(empty)
    for t in TABLES:
        load_table(spark, SF_SMOKE, t).limit(0).write.parquet(
            f"{empty}/{t}.parquet"
        )
    failures = {}
    for name, q in QUERIES.items():
        try:
            q(spark, empty).count()
        except Exception as e:  # noqa: BLE001
            failures[name] = f"{type(e).__name__}: {e}"[:200]
    assert not failures, f"queries broken on empty input: {failures}"
