"""Blocked fuzzy self-join — approximate string matching / entity
resolution ("which of these names are the same thing, misspelled"), the
classic record-linkage primitive (extension operator; the reference has
no string-similarity surface).

The quadratic trap and its bound: naive all-pairs Levenshtein is O(N²)
and dead at any scale. Blocking makes the cost
Σ_blocks occupancy² — the SAME occupancy discipline as the LSH dedup
family (llm/dedup.py): candidates are generated only within a block
(caller-chosen key: a token, a phonetic code, a prefix), then verified
with the exact distance. A good block key holds occupancy ~constant as
the corpus grows, making total verify work linear; a bad one is visible
as one hot block (AQE skew-join splits it, but the fix is the key).

Distance is the built-in ``levenshtein`` (unit-cost insert/delete/
substitute — identical definition JVM-side and in DuckDB, so pairs are
engine-exact with no float anywhere).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    name_col: str,
    block: Column,
    max_distance: int = 2,
) -> DataFrame:
    """→ (name_a, name_b, block_key, distance): distinct name pairs that
    share a block and are within ``max_distance`` edits, ``name_a <
    name_b`` canonicalized so each pair appears once. Names are
    DISTINCT'd per block before pairing — duplicate rows must not
    multiply the verify work (the linker's E4 dedup lesson)."""
    names = (
        df.select(F.col(name_col).alias("name"), block.alias("block_key"))
        .distinct()
    )
    a, b = names.alias("a"), names.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block_key") == F.col("b.block_key"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.col("a.block_key").alias("block_key"),
            F.levenshtein(F.col("a.name"), F.col("b.name")).alias("distance"),
        )
        .filter(F.col("distance") <= max_distance)
    )


def part_name_fuzzy_pairs_sql(max_distance: int = 2) -> str:
    """DuckDB twin of the gated query: block = the part name's noun
    (second token), same canonicalization, same unit-cost levenshtein."""
    return f"""
WITH p AS (
  SELECT DISTINCT p_name AS name, string_split(p_name, ' ')[2] AS block_key
  FROM part
)
SELECT a.name AS name_a, b.name AS name_b, a.block_key,
       CAST(levenshtein(a.name, b.name) AS INT) AS distance
FROM p a JOIN p b ON a.block_key = b.block_key AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= {max_distance}
"""
