"""Incremental MinHash/LSH ingest (minhash_against_reference) vs the
exact bucket model: a new document is flagged iff it shares at least one
band bucket with the historical reference — computed independently here
from the shared banding itself — and the returned band rows compose into
the next cycle's reference (the ingest loop)."""

from pyspark.sql import functions as F

from apache_cassandra_spark.analytics.dedup import (
    _minhash_band_rows,
    minhash_against_reference,
)

PARAMS = dict(n=3, num_perm=16, bands=4)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


REF_ROWS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "completely different content about distributed query engines"),
]
BATCH_ROWS = [
    # near-dup of ref doc 1 (one word changed)
    (10, "the quick brown fox jumps over the lazy cat near the river bank"),
    # exact dup of ref doc 2
    (11, "completely different content about distributed query engines"),
    # novel
    (12, "unrelated novel text with entirely fresh vocabulary tokens here"),
]


def _ref_bands(spark, rows):
    return (
        _minhash_band_rows(_mk(spark, rows), "text", "doc_id", **PARAMS)
        .groupBy("band", "bucket")
        .agg(F.min("id").alias("rep_id"))
    )


def test_probe_matches_bucket_cohabitation_model(spark):
    ref = _ref_bands(spark, REF_ROWS)
    batch = _mk(spark, BATCH_ROWS)
    cands, new_bands = minhash_against_reference(batch, ref, **PARAMS)
    got = {(r["doc_id"], r["rep_id"]) for r in cands.collect()}

    # independent expectation straight from the shared banding
    rb = {(r["band"], r["bucket"]): r["rep_id"] for r in ref.collect()}
    nb = _minhash_band_rows(batch, "text", "doc_id", **PARAMS).collect()
    want = {
        (r["id"], rb[(r["band"], r["bucket"])])
        for r in nb
        if (r["band"], r["bucket"]) in rb  # content decides — no id-identity filter
    }
    assert got == want
    # the exact dup MUST collide (all bands agree); the novel doc must not
    assert any(d == 11 for d, _ in got)
    assert all(d != 12 for d, _ in got)
    # new_bands: one min-id representative per occupied bucket
    counts = new_bands.groupBy("band", "bucket").count().collect()
    assert all(r["count"] == 1 for r in counts)


def test_ingest_cycle_flags_cross_batch_near_dups(spark):
    """Feed cycle-1's band rows back as cycle-2's reference: a cycle-2
    near-dup of a cycle-1 doc is flagged against the cycle-1 rep."""
    b1 = _mk(spark, [(100, "alpha beta gamma delta epsilon zeta eta theta iota kappa")])
    empty_ref = _mk(spark, []).select(
        F.lit(0).alias("band"), F.lit("").alias("bucket"), F.lit(0).alias("rep_id")
    ).where(F.lit(False))
    c1, bands1 = minhash_against_reference(b1, empty_ref, **PARAMS)
    assert c1.count() == 0  # empty history: nothing to collide with

    b2 = _mk(spark, [(200, "alpha beta gamma delta epsilon zeta eta theta iota kappa")])
    c2, _ = minhash_against_reference(b2, bands1, **PARAMS)
    got = {(r["doc_id"], r["rep_id"]) for r in c2.collect()}
    assert got == {(200, 100)}


def test_id_reuse_across_crawls_still_flags(spark):
    """Per-batch doc numbering: a new doc whose id COLLIDES with the
    historical rep's id must still be flagged — content decides, like
    dedup_against_reference (round-8 review)."""
    ref = _ref_bands(spark, [(100, "alpha beta gamma delta epsilon zeta eta theta")])
    batch = _mk(spark, [(100, "alpha beta gamma delta epsilon zeta eta theta")])
    cands, _ = minhash_against_reference(batch, ref, **PARAMS)
    got = {(r["doc_id"], r["rep_id"]) for r in cands.collect()}
    assert got == {(100, 100)}


def test_reference_stays_one_row_per_bucket_across_cycles(spark):
    """Append-each-cycle must NOT grow occupied buckets: a second batch
    with identical content contributes zero new band rows, and a
    reference polluted with duplicate bucket rows is re-minned before
    the probe (round-8 review)."""
    b1 = _mk(spark, [(1, "alpha beta gamma delta epsilon zeta eta theta")])
    empty = _mk(spark, []).select(
        F.lit(0).alias("band"), F.lit("").alias("bucket"), F.lit(0).alias("rep_id")
    ).where(F.lit(False))
    _, bands1 = minhash_against_reference(b1, empty, **PARAMS)
    b2 = _mk(spark, [(2, "alpha beta gamma delta epsilon zeta eta theta")])
    cands2, bands2 = minhash_against_reference(b2, bands1, **PARAMS)
    assert bands2.count() == 0  # every bucket already occupied
    # polluted reference (duplicate bucket rows, larger rep first)
    polluted = bands1.select("band", "bucket", (F.col("rep_id") + 7).alias("rep_id")).union(bands1)
    cands3, _ = minhash_against_reference(b2, polluted, **PARAMS)
    got = {(r["doc_id"], r["rep_id"]) for r in cands3.collect()}
    assert got == {(2, 1)}  # re-minned: ONE candidate row, min rep wins


def test_exclude_self_pairs_makes_replay_idempotent(spark):
    """Pipelines with globally unique ids that may replay a batch after
    its band rows landed: exclude_self_pairs=True suppresses the
    self-collision so the replayed batch is not flagged against itself
    (round-8 review); default False reports it (content decides)."""
    doc = [(7, "alpha beta gamma delta epsilon zeta eta theta")]
    ref = _ref_bands(spark, doc)  # the batch's OWN bands already landed
    batch = _mk(spark, doc)
    default_c, _ = minhash_against_reference(batch, ref, **PARAMS)
    assert {(r["doc_id"], r["rep_id"]) for r in default_c.collect()} == {(7, 7)}
    idempotent_c, _ = minhash_against_reference(
        batch, ref, exclude_self_pairs=True, **PARAMS
    )
    assert idempotent_c.count() == 0
