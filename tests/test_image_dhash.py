"""Image dHash near-dup tier: real-PNG fixture construction
(digest-block images), the dHash extractor vs a scalar reference, and
the lossless 8-band hamming pair search."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from fluxgraph_spark.functions import codecs, dedup, multimodal

DOCS = [
    (0, "alpha beta gamma"),
    (19, "delta epsilon"),
    (38, "alpha beta gamma"),   # exact text dup of doc 0 -> same image
    (57, "zeta eta theta iota"),
]


def _blocks(text):
    out = np.zeros((8, 9), dtype=np.uint8)
    for r in range(8):
        d = hashlib.md5(f"{text}:{r}".encode()).digest()
        out[r, :] = np.frombuffer(d[:9], dtype=np.uint8)
    return out


def _ref_dhash(blocks):
    h = 0
    for r in range(8):
        for c in range(8):
            if blocks[r, c] > blocks[r, c + 1]:
                h |= 1 << (r * 8 + c)
    return h - (1 << 64) if h >= (1 << 63) else h


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_png_fixture_roundtrips_digest_blocks(spark, docs_df):
    rows = multimodal.png_table_from_documents(docs_df, every=19).collect()
    assert {r["media_id"] for r in rows} == {0, 19, 38, 57}
    for r in rows:
        arr = codecs.decode_png(bytes(r["content"]))
        assert arr.shape == (16, 18, 1)
        text = dict(DOCS)[r["media_id"]]
        want = np.repeat(np.repeat(_blocks(text), 2, 0), 2, 1)
        assert (arr[:, :, 0] == want).all()


def test_image_dhash_matches_scalar_reference(spark, docs_df):
    media = multimodal.png_table_from_documents(docs_df, every=19)
    got = {
        r["media_id"]: r["dhash"]
        for r in multimodal.image_dhash(media, decoder="real").collect()
    }
    for mid, text in DOCS:
        assert got[mid] == _ref_dhash(_blocks(text)), mid
    assert got[0] == got[38]  # identical text -> identical image -> identical hash


def test_dhash_near_dups_equals_bruteforce(spark):
    """Band candidates + verify must find EXACTLY the brute-force pairs
    at max_hamming <= 7 (pigeonhole completeness) — fixture includes an
    identical pair, a 3-bit flip, an 8-bit flip (excluded), and noise."""
    base = _ref_dhash(_blocks("seed text"))

    def flip(h, bits):
        for b in bits:
            h ^= 1 << b
        return h - (1 << 64) if h >= (1 << 63) else (h + (1 << 64) if h < -(1 << 63) else h)

    rows = [
        (1, base),
        (2, base),                           # hamming 0
        (3, flip(base, [0, 17, 33])),        # hamming 3
        (4, flip(base, list(range(0, 64, 8)))),   # hamming 8: one flip per band
        (5, _ref_dhash(_blocks("other"))),
    ]
    df = spark.createDataFrame(rows, ["media_id", "dhash"])
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.dhash_near_dups(df, max_hamming=7).collect()
    }
    want = {}
    for i, (ia, ha) in enumerate(rows):
        for ib, hb in rows[i + 1 :]:
            ham = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
            if ham <= 7:
                want[(ia, ib)] = ham
    assert got == want
    assert got[(1, 2)] == 0 and got[(1, 3)] == 3
    assert (1, 4) not in got  # 8 bits: beyond the guarantee AND the threshold


def test_dhash_near_dups_bad_threshold(spark):
    df = spark.createDataFrame([(1, 0)], ["media_id", "dhash"])
    with pytest.raises(ValueError, match="max_hamming"):
        dedup.dhash_near_dups(df, max_hamming=8)


def test_image_dhash_fake_and_too_small(spark, docs_df):
    media = multimodal.media_table_from_documents(docs_df)
    fake = multimodal.image_dhash(media, decoder="fake").collect()
    assert len(fake) == len(DOCS)
    # deterministic: second run identical
    fake2 = multimodal.image_dhash(media, decoder="fake").collect()
    assert sorted(map(tuple, fake)) == sorted(map(tuple, fake2))
    tiny = multimodal.png_table_from_documents(docs_df, every=19)
    with pytest.raises(Exception, match="smaller than"):
        multimodal.image_dhash(tiny, hash_w=20, hash_h=3, decoder="real").collect()


def test_deep_chain_components_convergence_assert(spark):
    """VERDICT r6 item 1: a CHAIN-shaped near-dup cluster deeper than the
    fixed min-label round count silently under-merges — and a fixed-round
    oracle replaying the same rounds stays green while the survivor
    decision is wrong.  ``assert_converged=True`` must turn that silent
    under-merge into a raise; an oversized round count must fully merge.

    The chain: dhash_i = (1 << i) - 1, so hamming(d_i, d_j) = |i - j| and
    max_hamming=1 pairs form a pure 12-image path (pair-graph diameter
    11) — today's 4 rounds cannot propagate label 0 to the far end."""
    from fluxgraph_spark.operators import analytics as AN

    n = 12
    rows = [(i, (1 << i) - 1) for i in range(n)]
    hashes = spark.createDataFrame(rows, ["media_id", "dhash"])
    pairs = dedup.dhash_near_dups(hashes, max_hamming=1)
    got = sorted((r["id_a"], r["id_b"]) for r in pairs.collect())
    assert got == [(i, i + 1) for i in range(n - 1)]  # a pure path
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))

    # the pre-fix behavior: 4 fixed rounds under-merge the chain (>1 label)
    undermerged = AN.connected_components(edges, max_iters=4, early_stop=False)
    labels = {r["id"]: r["component"] for r in undermerged.collect()}
    assert len(set(labels.values())) > 1

    # the fix: the same call with assert_converged raises instead
    with pytest.raises(ValueError, match="did not converge"):
        AN.connected_components(
            edges, max_iters=4, early_stop=False, assert_converged=True
        )

    # oversized fixed rounds: converges, assert passes, one component
    comp = AN.connected_components(
        edges, max_iters=n + 2, early_stop=False, assert_converged=True
    )
    labels = {r["id"]: r["component"] for r in comp.collect()}
    assert set(labels.values()) == {0} and len(labels) == n

    # parameter contract: the probe needs fixed-round mode and >= 2 rounds
    with pytest.raises(ValueError, match="assert_converged"):
        AN.connected_components(edges, max_iters=4, assert_converged=True)
    with pytest.raises(ValueError, match="assert_converged"):
        AN.connected_components(
            edges, max_iters=1, early_stop=False, assert_converged=True
        )
