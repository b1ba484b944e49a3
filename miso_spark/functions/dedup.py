"""Deduplication family: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine.

Scale design (100 TB):
- exact: one hash-groupBy shuffle on a 16-byte digest — minimal.
- ngram-jaccard: inverted-index join on shingles (never a cross join);
  shingles are hashed to longs before the shuffle so the exchange
  carries (long, id) pairs only.
- minhash-LSH: per-row signature via built-in xxhash64 (no UDF), then
  a groupBy per band on a banded signature hash; candidate pairs are
  verified with exact Jaccard. Shuffle volume = rows × bands longs.
- simhash: 64-bit signature from word hashes via transform/aggregate
  (JVM lambda functions), bucketed by 16-bit chunks for candidates.
- embedding: blocked cosine join (same LSH/label block), zip_with dot
  products — no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from miso_spark.functions.text import normalize


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles of the normalized text (distinct)."""
    w = F.split(normalize(text), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(w) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)))
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by md5 of normalized text.

    Returns (content_hash, canonical_id, dup_count); canonical = min id.
    """
    return (
        df.select(F.md5(normalize(F.col(text_col))).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Candidate pairs by shared shingles, scored with exact Jaccard.

    Inverted-index join: explode shingles (hashed to long), join on the
    shingle hash, count common shingles per pair, then
    |A∩B| / (|A| + |B| − |A∩B|).
    """
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(F.col(text_col), n)).alias("sh")
    ).select("id", F.xxhash64("sh").alias("shh"))
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.shh") == F.col("b.shh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signature(text: Column, num_hashes: int = 16, shingle_n: int = 3) -> Column:
    """MinHash signature as array<long>, k independent hash families via
    seed-salted xxhash64 — built-ins only, no UDF."""
    sh = shingles(text, shingle_n)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda seed: F.array_min(
            F.transform(sh, lambda s: F.xxhash64(F.concat(s, F.lit("#"), seed.cast("string"))))
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs.

    Band signatures bucket candidates (rows sharing any band collide);
    candidates are verified with exact n-gram Jaccard. Returns
    (id_a, id_b, jaccard >= threshold).
    """
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("_text"),
        minhash_signature(F.col(text_col), num_hashes, shingle_n).alias("sig"),
    )
    banded = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))

    cand = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )

    sh = df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), shingle_n).alias("shset")
    )
    return (
        cand.join(sh.withColumnsRenamed({"id": "id_a", "shset": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "shset": "sh_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(text_sql: str) -> Column:
    """64-bit SimHash of the word multiset, as bigint.

    Each word's xxhash64 votes ±1 per bit position; the sign of each
    accumulated position becomes the output bit. Implemented as one SQL
    higher-order expression (transform/aggregate/zip_with execute as
    JVM lambda functions; the Python Column API can't express
    shiftleft/shiftright with non-literal shift amounts).

    ``text_sql`` is a SQL expression for the text column.
    """
    norm = (
        f"split(lower(trim(regexp_replace({text_sql}, '\\\\s+', ' '))), ' ')"
    )
    return F.expr(
        f"""
        aggregate(
          zip_with(
            aggregate(
              transform({norm}, w -> xxhash64(w)),
              array_repeat(0, 64),
              (acc, h) -> zip_with(
                acc,
                transform(sequence(0, 63),
                          j -> IF((shiftright(h, j) & 1) = 1, 1, -1)),
                (a, b) -> a + b)
            ),
            sequence(0, 63),
            (v, j) -> IF(v > 0, shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT))
          ),
          CAST(0 AS BIGINT),
          (acc, x) -> acc | x
        )
        """
    )


def simhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup candidates: docs sharing any 16-bit simhash chunk
    (pigeonhole: hamming ≤ 3 guarantees one of 4 chunks equal), scored
    by exact hamming distance."""
    sig = df.select(F.col(id_col).alias("id"), simhash(text_col).alias("sim"))
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftrightunsigned(F.col("sim"), c * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("val"),
            )
            for c in range(4)
        ]
    )
    chunked = sig.select("id", "sim", F.explode(chunk_structs).alias("ck")).select(
        "id", "sim", F.col("ck.chunk").alias("chunk"), F.col("ck.val").alias("val")
    )
    pairs = (
        chunked.alias("x")
        .join(
            chunked.alias("y"),
            (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.val") == F.col("y.val"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.sim").alias("sim_a"),
            F.col("y.sim").alias("sim_b"),
        )
        .distinct()
    )
    return (
        pairs.withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_dedup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = "label",
    threshold: float = 0.99,
) -> DataFrame:
    """Near-dup pairs by embedding cosine within a blocking key.

    The block join keeps this from being a cross join; at 100 TB the
    block key would be an LSH bucket (see similarity.lsh_buckets).
    """
    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("v")]
    if block_col:
        cols.append(F.col(block_col).alias("blk"))
    e = df.select(*cols)
    join_cond = F.col("x.id") < F.col("y.id")
    if block_col:
        join_cond = join_cond & (F.col("x.blk") == F.col("y.blk"))
    pairs = e.alias("x").join(e.alias("y"), join_cond)
    dot = F.aggregate(
        F.zip_with(F.col("x.v"), F.col("y.v"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )
    norm = lambda side: F.sqrt(
        F.aggregate(F.col(side), F.lit(0.0), lambda acc, z: acc + z * z)
    )
    return (
        pairs.withColumn("cosine", F.round(dot / (norm("x.v") * norm("y.v")), 4))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"), "cosine")
    )
