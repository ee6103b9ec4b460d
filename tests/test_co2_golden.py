"""Golden-value tests of the CO2 pipeline against the reference CSV
(invariants re-derived in SURVEY.md section 5.2; float tol 1e-4).

The reference itself has no tests; these pin its observable semantics:
row counts through the cleaning matrix, the reduced/increased split
(with the submission-variant fix for the num_increased bug at
reference project-co2.py:211), conditional sums, and the six
analytical query answers.
"""

import pytest

from big_data_co2_emission_analysis_spark.co2 import pipeline as P

TOL = 1e-4


@pytest.fixture(scope="module")
def clean(spark):
    return P.load_clean(spark)


def test_cleaning_row_counts(spark, clean):
    raw = P.read_co2_csv(spark, P.REFERENCE_CSV)
    assert raw.count() == 264
    assert clean.count() == 244


def test_reduced_increased_split(clean):
    n_red, n_inc = P.reduced_increased_counts(clean)
    assert (n_red, n_inc) == (87, 157)


def test_conditional_sums(clean):
    s_red, s_inc, s_tot = P.conditional_sums(clean)
    assert s_red == pytest.approx(-148.5387, abs=TOL)
    assert s_inc == pytest.approx(126.4713, abs=TOL)
    assert s_tot == pytest.approx(-22.0674, abs=TOL)


def test_top3_emitters_2014(clean):
    rows = P.top_emitters(clean, "2014").collect()
    assert [r[0] for r in rows] == ["Qatar", "Trinidad and Tobago", "Kuwait"]
    assert rows[0][1] == pytest.approx(43.86, abs=0.01)


def test_top3_emitters_2004(clean):
    rows = P.top_emitters(clean, "2004").collect()
    assert [r[0] for r in rows] == ["Qatar", "Kuwait", "United Arab Emirates"]
    assert rows[0][1] == pytest.approx(57.01, abs=0.01)


def test_top3_reducers(clean):
    rows = P.top_reducers(clean).collect()
    assert [r[0] for r in rows] == ["Aruba", "Qatar", "Luxembourg"]
    assert rows[0]["change"] == pytest.approx(-18.1072, abs=TOL)


def test_top3_increasers(clean):
    rows = P.top_increasers(clean).collect()
    assert [r[0] for r in rows] == ["Brunei Darussalam", "Trinidad and Tobago", "New Caledonia"]
    assert rows[0]["change"] == pytest.approx(8.3236, abs=TOL)


def test_selected_countries(clean):
    rows = P.selected_countries(clean).collect()
    assert len(rows) == 5
    assert {r["Country Name"] for r in rows} == set(P.COMPARISON_COUNTRIES)
    # China increased, Germany/US/France/Sweden reduced (reference figure 3)
    by_name = {r["Country Name"]: r["isReduced"] for r in rows}
    assert by_name["China"] is False
    assert by_name["Sweden"] is True


def test_full_pipeline_ml_invariants(spark):
    res = P.run_pipeline(spark)
    assert res.n_raw == 264 and res.n_clean == 244
    # seeded k-means: assert invariants, not exact assignments (SURVEY 5.3)
    assert len(res.centroids) == 5
    assert all(all(abs(x) < 100 for x in c) for c in res.centroids)
    assert res.silhouette > 0.3
    assigned = res.assigned
    assert assigned.count() == 244
    n_clusters = assigned.select("cluster").distinct().count()
    assert 1 < n_clusters <= 5
    ranges = {r["cluster"]: (r["min_change"], r["max_change"]) for r in res.cluster_ranges.collect()}
    assert all(lo <= hi for lo, hi in ranges.values())


def test_raw_csv_preamble_variant(spark):
    """The unedited WDI export (metadata rows + blank lines) parses to
    the same 264 rows through the text->from_csv path."""
    raw = P.read_co2_csv(spark, "/root/reference/co2-dataset.csv", edited=False)
    assert raw.count() == 264
    cleaned = P.derive(P.preprocess(raw))
    assert cleaned.count() == 244


def test_world_join_semantics(spark, clean):
    """Reference project-co2.py:137-147: patched-dim left join.  Every
    world row survives; CO2 aggregates (ARB, WLD, ...) drop out; the
    four patched codes behave exactly as the reference's pandas join:
    FRA/NOR match World Bank data, RKS stays unmatched (World Bank
    codes Kosovo XKX), Somaliland's SOM patch makes it inherit
    Somalia's row -- and N. Cyprus stays '-99' (unpatched upstream
    bug, faithfully reproduced)."""
    joined = P.world_join(clean).cache()
    rows = {(r["iso_a3"], r["name"]): r for r in joined.collect()}
    assert len(rows) == 177  # dim-preserving: all world rows, no aggregates

    assert rows[("FRA", "France")]["change"] is not None  # patched -> matched
    assert rows[("NOR", "Norway")]["change"] is not None
    assert rows[("SOM", "Somaliland")]["change"] == rows[("SOM", "Somalia")]["change"]
    assert rows[("RKS", "Kosovo")]["change"] is None  # World Bank uses XKX
    assert rows[("-99", "N. Cyprus")]["change"] is None  # unpatched, as in ref

    n_unmatched = joined.filter("change IS NULL").count()
    assert 0 < n_unmatched < 177  # grey countries exist, match majority too
    assert joined.filter("change IS NOT NULL").count() + n_unmatched == 177
