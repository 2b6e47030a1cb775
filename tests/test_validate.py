"""C3 validate+reassign and C7 address enrichment (reference
resolver.py:2334-2651, 784-841): planted bad members get evicted and find
their true cluster; planted singletons get rescued; street-less rows
inherit the cluster street only when city/state/zip agree."""

from pyspark.sql import functions as F

from gpu_entity_resolver_spark.operators.validate import (
    cluster_profiles,
    enrich_addresses,
    validate_reassign,
)

MEMBERS = [
    # cluster 100: acme manufacturing, 3 good members
    (1, 100, "acme manufacturing", "12 main st springfield il 62701", "il"),
    (2, 100, "acme manufacturing", "12 main st springfield il 62701", "il"),
    (3, 100, "acme manufacturing inc", "12 main st springfield il 62701", "il"),
    # planted BAD member of 100: belongs with the zebras
    (4, 100, "zebra holdings", "9 oak ave peoria il 61601", "il"),
    # cluster 200: zebra holdings, 2 good members
    (5, 200, "zebra holdings", "9 oak ave peoria il 61601", "il"),
    (6, 200, "zebra holdings", "9 oak ave peoria il 61601", "il"),
    # singleton near-miss of acme (typo) at the same address -> rescue
    (7, 7, "acme manufacturng", "12 main st springfield il 62701", "il"),
    # genuinely distinct singleton -> must stay a singleton
    (8, 8, "unrelated quarry co", "1 far rd denver co 80201", "co"),
]
SCHEMA = (
    "doc_id long, cluster long, normalized_text string, "
    "addr_normalized_key string, addr_state string"
)


def test_validate_reassign_planted(spark):
    members = spark.createDataFrame(MEMBERS, SCHEMA)
    out = validate_reassign(members)
    got = {r.doc_id: r for r in out.collect()}
    # good members kept in place
    for d in (1, 2, 3):
        assert got[d].cluster == 100 and got[d].membership_status == "kept"
    for d in (5, 6):
        assert got[d].cluster == 200 and got[d].membership_status == "kept"
    # the planted bad member leaves 100 and joins the zebra cluster
    assert got[4].cluster == 200 and got[4].membership_status == "reassigned"
    # the typo singleton is rescued into acme's cluster
    assert got[7].cluster == 100 and got[7].membership_status == "rescued"
    assert got[7].reassign_score > 0.8
    # the distinct singleton is untouched
    assert got[8].cluster == 8 and got[8].membership_status == "kept"


def test_evicted_without_home_becomes_singleton(spark):
    rows = [
        (1, 100, "acme manufacturing", "12 main st", "il"),
        (2, 100, "acme manufacturing", "12 main st", "il"),
        (3, 100, "totally different name", "99 other rd", "tx"),
    ]
    out = validate_reassign(spark.createDataFrame(rows, SCHEMA))
    got = {r.doc_id: r for r in out.collect()}
    assert got[3].membership_status == "evicted"
    # fresh minted cluster id, collision-free against every doc-id-derived
    # label (cluster labels are min member doc_ids, so reusing the raw
    # doc_id could equal the very cluster the doc was evicted from)
    assert got[3].cluster not in {r.doc_id for r in out.collect()}
    assert got[3].cluster not in {100}


def test_evicted_min_id_member_leaves_its_cluster(spark):
    # doc 1 is the MIN-id member of cluster 1 (min-member labeling): when
    # evicted with no home, its minted cluster must NOT equal cluster 1.
    rows = [
        (1, 1, "totally different name", "99 other rd", "tx"),
        (2, 1, "acme manufacturing", "12 main st", "il"),
        (3, 1, "acme manufacturing", "12 main st", "il"),
    ]
    out = validate_reassign(spark.createDataFrame(rows, SCHEMA))
    got = {r.doc_id: r for r in out.collect()}
    assert got[1].membership_status == "evicted"
    assert got[1].cluster != 1  # would silently stay in its old cluster
    assert got[2].cluster == 1 and got[3].cluster == 1


def test_cluster_profiles_shape(spark):
    members = spark.createDataFrame(MEMBERS, SCHEMA)
    prof = cluster_profiles(members).collect()
    by_c = {r.cluster: r for r in prof}
    assert set(by_c) == {100, 200}  # singletons get no profile
    assert by_c[100].profile_name.startswith("acme manufacturing")
    assert by_c[100].profile_addr_key == "12 main st springfield il 62701"
    assert by_c[100].size == 4


ENRICH_ROWS = [
    (1, 10, "12", "main st", "springfield", "il", "62701", "12 main st springfield il 62701", 1.0),
    (2, 10, "12", "main st", "springfield", "il", "62701", "12 main st springfield il 62701", 1.0),
    # street-less row, same city/state/zip -> must inherit "12 main st"
    (3, 10, "", "", "springfield", "il", "62701", "springfield il 62701", 0.6),
    # street-less row, DIFFERENT zip -> must NOT be enriched
    (4, 10, "", "", "springfield", "il", "99999", "springfield il 99999", 0.6),
]
ENRICH_SCHEMA = (
    "doc_id long, cluster long, addr_street_number string, "
    "addr_street_name string, addr_city string, addr_state string, "
    "addr_zip string, addr_normalized_key string, addr_score double"
)


def test_enrich_addresses(spark):
    out = enrich_addresses(spark.createDataFrame(ENRICH_ROWS, ENRICH_SCHEMA))
    got = {r.doc_id: r for r in out.collect()}
    assert got[3].address_was_enriched
    assert got[3].addr_street_name == "main st"
    assert got[3].addr_street_number == "12"
    assert got[3].addr_normalized_key == "12 main st springfield il 62701"
    assert not got[4].address_was_enriched
    assert got[4].addr_street_name == ""
    assert not got[1].address_was_enriched
