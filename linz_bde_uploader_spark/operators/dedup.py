"""Deduplication operators for large-scale training-data pipelines.

Four families, all pure DataFrame ops (no Python UDFs), each designed
for the 100 TB path:

- exact:     one shuffle on content hash (map-side partial agg).
- minhash:   shingle explode -> per-(doc,perm) min -> band buckets ->
             bucket self-join. The self-join key is (band, band_hash),
             so only真 candidate pairs shuffle — never the corpus
             cross-product. Skewed buckets (boilerplate docs) are
             handled by AQE skew-join splitting.
- simhash:   bit-vote aggregation, one shuffle on (doc, bit) then one
             on doc; hamming-near pairs via banded prefix buckets.
- jaccard:   exact n-gram overlap via shingle inverted index
             (explode + self-join on shingle + count ratio). Quadratic
             in bucket size — the exact verifier behind minhash-LSH,
             not the first pass, at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions.hashing import (
    MINHASH_PRIME, hash32, minhash_perm,
)
from linz_bde_uploader_spark.functions.text import word_shingles


def exact_duplicates(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: one row per distinct content with
    the canonical (minimum) id and the copy count."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("canonical_id"), F.count("*").alias("n_copies"))
    )


def _shingle_hashes(docs: DataFrame, text_col: str, id_col: str,
                    shingle_words: int) -> DataFrame:
    """(id, h) pairs: distinct 32-bit shingle hashes per document."""
    return (
        docs.select(F.col(id_col).alias("id"),
                    F.explode(word_shingles(F.col(text_col), shingle_words)).alias("shingle"))
        .select("id", hash32(F.col("shingle")).alias("h"))
        .distinct()
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_perm: int = 16,
                       shingle_words: int = 3) -> DataFrame:
    """MinHash signature matrix: (id, perm, minhash).

    Pipeline: shingle -> 32-bit hash -> explode perm index ->
    universal hash (a*h+b) mod P -> min per (doc, perm). The explode
    multiplies rows by num_perm BEFORE the shuffle, but partial
    aggregation (map-side min) collapses them again, so shuffle volume
    is O(docs * num_perm), not O(shingles * num_perm).
    """
    sh = _shingle_hashes(docs, text_col, id_col, shingle_words)
    perms = F.explode(F.sequence(F.lit(0), F.lit(num_perm - 1))).alias("perm")
    return (
        sh.select("id", "h", perms)
        .select("id", "perm", minhash_perm(F.col("h"), F.col("perm")).alias("ph"))
        .groupBy("id", "perm")
        .agg(F.min("ph").alias("minhash"))
    )


def lsh_candidate_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", num_perm: int = 16,
                        bands: int = 4, shingle_words: int = 3) -> DataFrame:
    """MinHash-LSH near-dup candidates: (id_a, id_b) with id_a < id_b.

    Signatures are banded (num_perm/bands rows per band); docs sharing
    any band hash become candidates. The join is on (band, band_hash) —
    tiny buckets, so the pair blow-up is bounded by real similarity,
    not corpus size.
    """
    rows_per_band = num_perm // bands
    sig = minhash_signatures(docs, text_col, id_col, num_perm, shingle_words)
    band_hashes = (
        sig.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy("id", "band")
        .agg(F.md5(F.concat_ws(",", F.sort_array(
            F.collect_list(F.concat_ws(":", F.col("perm"), F.col("minhash")))
        ))).alias("band_hash"))
    )
    a = band_hashes.alias("a")
    b = band_hashes.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_hash") == F.col("b.band_hash"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 32, shingle_words: int = 1) -> DataFrame:
    """SimHash fingerprint per document: (id, simhash).

    Classic bit-vote construction: each distinct token/shingle hash
    votes +1/-1 on every bit; bit j of the fingerprint is 1 iff the
    vote sum is >= 0. Two shuffles: (id, bit) vote agg, then id
    reassembly — both with map-side partial aggregation.
    """
    sh = _shingle_hashes(docs, text_col, id_col, shingle_words)
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    votes = (
        sh.select("id", "h", bit)
        .select("id", "bit",
                F.when(F.expr("(h >> bit) & 1") == 1,
                       F.lit(1)).otherwise(F.lit(-1)).alias("vote"))
        .groupBy("id", "bit")
        .agg(F.sum("vote").alias("votes"))
    )
    return (
        votes.select("id", "bit", (F.col("votes") >= 0).cast("long").alias("b"))
        .groupBy("id")
        .agg(F.sum(F.col("b") * F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
             .cast("bigint").alias("simhash"))
    )


def simhash_near_pairs(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", bits: int = 32,
                       bands: int = 4, max_hamming: int = 3) -> DataFrame:
    """Hamming-near SimHash pairs via banded buckets: split the
    fingerprint into ``bands`` segments; any pair within
    ``max_hamming < bands`` distance must agree on >=1 full segment
    (pigeonhole), so bucket-join on segments then verify exactly with
    bit_count(xor)."""
    seg_bits = bits // bands
    sh = simhash(docs, text_col, id_col, bits)
    segs = sh.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("seg"),
                     F.shiftright(F.col("simhash"), i * seg_bits)
                     .bitwiseAND(F.lit((1 << seg_bits) - 1)).alias("segval"))
            for i in range(bands)
        ])).alias("s"),
    ).select("id", "simhash", "s.seg", "s.segval")
    a, b = segs.alias("a"), segs.alias("b")
    pairs = (
        a.join(b, (F.col("a.seg") == F.col("b.seg"))
               & (F.col("a.segval") == F.col("b.segval"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"))
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def jaccard_pairs(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", shingle_words: int = 3,
                  threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs >= threshold:
    (id_a, id_b, jaccard). Inverted-index self-join on shingle hash;
    |A∩B| from the join, |A∪B| = |A|+|B|-|A∩B|."""
    sh = _shingle_hashes(docs, text_col, id_col, shingle_words)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, F.col("id_a") == F.col("sa.id"))
        .join(sb, F.col("id_b") == F.col("sb.id"))
        .select(
            "id_a", "id_b",
            (F.col("n_inter").cast("double")
             / (F.col("sa.n") + F.col("sb.n") - F.col("n_inter")).cast("double")
             ).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
