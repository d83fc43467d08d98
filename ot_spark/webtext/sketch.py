"""HyperLogLog distinct-count sketch (Flajolet-Fuchs-Gandouet-Meunier
2007, public) over Column algebra — approximate distinct URLs per host.

"How many distinct URLs does each host have?" is THE crawl-frontier
metric, and at 10^12 documents an exact ``count(distinct url)`` per host
is a full-width shuffle of every URL string.  The HLL register form
replaces it with a MAP-SIDE-COMBINABLE aggregate: per (key, bucket) keep
``max(rho)`` — 2^b small integers per key (b=4 -> 16 registers), partial
max on the map side, register merge = element-wise max.  The exchange
carries hosts x 16 tiny ints instead of every URL; sketches for
different crawl snapshots union by the same max-merge, so the operator
is also incremental (re-crawl updates never re-read history).

DETERMINISM / ORACLE DESIGN: the hash is md5 (identical hex output in
Spark and DuckDB for the same UTF-8 string); bucket = first hex digit,
rho = leading-zero count of the next 8 hex digits (32-bit prefix) + 1.
Every step is generated ONCE here as an ANSI-SQL fragment valid in both
engines (instr/substr/CASE integer compares — no log2, no floats, no
engine-specific bit ops), so the gate compares registers bit-for-bit.
The float estimation step (``hll_estimate``) sits OUTSIDE the oracle and
is pinned by an error-bound pytest instead (sigma ~ 1.04/sqrt(m)).

Reference analog: osm-transform's ElementCounter/MinMaxIdCollector
family (stats.rs) — single-pass corpus statistics; this is the
approximate-distinct member of that family at web scale.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX = "0123456789abcdef"
#: rho is computed over this many bits of the md5 (8 hex digits).
HASH_BITS = 32


def bucket_sql(hex_col: str) -> str:
    """Bucket index (0..15) = value of the first hex digit.  Valid in
    Spark SQL and DuckDB verbatim."""
    return f"(instr('{HEX}', substr({hex_col}, 1, 1)) - 1)"


def hashval_sql(hex_col: str) -> str:
    """32-bit integer value of hex digits 2..9, digit-wise — both engines
    lack a portable hex->int cast, so the fragment does the positional
    sum itself (BIGINT terms: 15 * 16^7 overflows INT32 under Spark
    ANSI arithmetic)."""
    terms = [
        f"CAST(instr('{HEX}', substr({hex_col}, {2 + i}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    ]
    return "(" + " + ".join(terms) + ")"


def rho_sql(v_col: str, width: int = HASH_BITS) -> str:
    """Position of the first set bit (leading zeros + 1) of ``v_col``
    within ``width`` bits, as a pure integer CASE chain — no log2, so no
    cross-engine float rounding risk.  v = 0 -> width + 1 (the HLL
    convention for an all-zero suffix)."""
    whens = "".join(
        f" WHEN {v_col} >= {2 ** (width - r)} THEN {r}"
        for r in range(1, width + 1)
    )
    return f"(CASE{whens} ELSE {width + 1} END)"


def with_hll_register(
    df: DataFrame, item_col: str, bucket_out: str = "bucket",
    rho_out: str = "rho",
) -> DataFrame:
    """Append (bucket, rho) for the md5 of ``item_col``.  The hex digest
    and the 32-bit prefix are materialized as bound columns in separate
    selects — the rho CASE references the prefix 32 times, and Catalyst
    re-evaluates inlined lambda/expr per reference otherwise."""
    d = df.withColumn("__hll_h", F.expr(f"md5({item_col})"))
    d = d.withColumn("__hll_v", F.expr(hashval_sql("__hll_h"))).withColumn(
        bucket_out, F.expr(bucket_sql("__hll_h"))
    )
    return d.withColumn(rho_out, F.expr(rho_sql("__hll_v"))).drop(
        "__hll_h", "__hll_v"
    )


def hll_registers(
    df: DataFrame, keys: list[str], item_col: str
) -> DataFrame:
    """Per-key HLL registers: (keys..., bucket, max_rho).  One exchange on
    (keys, bucket) with map-side partial max — the whole point vs exact
    count(distinct)."""
    regs = with_hll_register(df, item_col)
    return regs.groupBy(*keys, "bucket").agg(
        F.max("rho").cast("int").alias("max_rho")
    )


def hll_oracle_sql(
    source_sql: str, key_sql: str, item_sql: str, key_name: str = "host"
) -> str:
    """DuckDB replay of hll_registers built from the SAME fragment
    generators the Spark plan uses — the two engines can never drift."""
    return f"""
WITH __raw AS (SELECT {key_sql} AS {key_name}, {item_sql} AS __item FROM {source_sql}),
__h AS (SELECT {key_name}, md5(__item) AS h FROM __raw),
__v AS (SELECT {key_name}, {bucket_sql('h')} AS bucket, {hashval_sql('h')} AS v FROM __h),
__r AS (SELECT {key_name}, bucket, {rho_sql('v')} AS rho FROM __v)
SELECT {key_name}, bucket, CAST(max(rho) AS INT) AS max_rho
FROM __r GROUP BY {key_name}, bucket
"""


def hll_estimate(
    registers: DataFrame, keys: list[str], b: int = 4
) -> DataFrame:
    """Bias-corrected HLL estimate per key from the register rows
    (absent buckets = zero registers).  Small-range correction uses
    linear counting when the raw estimate <= 2.5m and zero registers
    exist, per the published algorithm.  Float by nature — pinned by an
    error-bound pytest, not the SQL oracle."""
    m = 2 ** b
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m)
    )
    g = registers.groupBy(*keys).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("__s"),
        F.count(F.lit(1)).alias("__nb"),
    )
    zeros = (F.lit(m) - F.col("__nb")).cast("double")
    denom = F.col("__s") + zeros  # absent buckets contribute 2^-0 = 1
    raw = F.lit(alpha * m * m) / denom
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return g.select(*keys, est.alias("hll_estimate"))


def hll_error_bound(b: int = 4, sigmas: float = 3.0) -> float:
    """Published standard error 1.04/sqrt(m), scaled."""
    return sigmas * 1.04 / math.sqrt(2 ** b)
