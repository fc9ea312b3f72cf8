"""Tier-B batch 3: regexp functions, string distance, padding/casing,
trig, and bitwise scalar families."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.harness import load_table


def q_regexp_funcs(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.regexp_extract("p_type", r"([A-Z]+)", 1).alias("first_word"),
            F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
            F.regexp_count("p_name", F.lit("[aeiou]")).cast("bigint")
            .alias("n_vowels"),
            (F.col("p_brand").rlike("Brand#[0-9]+")).alias("brand_matches"),
        )
    )


def q_string_distance(spark, sf_dir):
    """Edit distance between brand and type per part — classic dedup metric."""
    return (
        load_table(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.levenshtein("p_brand", "p_type").cast("bigint").alias("lev"),
            F.levenshtein(F.substring("p_name", 1, 10),
                          F.substring("p_type", 1, 10)).cast("bigint")
            .alias("lev_pfx"),
        )
    )


def q_pad_case_funcs(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "nation")
        .select(
            "n_nationkey",
            F.lpad("n_name", 20, ".").alias("lpadded"),
            F.rpad("n_name", 20, ".").alias("rpadded"),
            F.initcap(F.lower("n_name")).alias("title_case"),
            F.reverse("n_name").alias("reversed_name"),
            F.repeat(F.substring("n_name", 1, 2), 3).alias("repeated"),
        )
    )


def q_trig_funcs(spark, sf_dir):
    """Trig/exponential family; rounded to absorb libm last-ulp differences."""
    return (
        load_table(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.round(F.sin(F.col("p_retailprice") / 1000.0), 6).alias("sin_v"),
            F.round(F.cos(F.col("p_retailprice") / 1000.0), 6).alias("cos_v"),
            F.round(F.atan2(F.col("p_retailprice"), F.lit(100.0)), 6)
            .alias("atan2_v"),
            F.round(F.degrees(F.atan(F.col("p_size").cast("double"))), 6)
            .alias("deg_atan"),
            F.round(F.exp(F.col("p_size") / 25.0), 6).alias("exp_v"),
        )
    )


def q_bitwise_funcs(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.col("o_orderkey").bitwiseAND(F.lit(255)).alias("low_byte"),
            F.col("o_orderkey").bitwiseOR(F.lit(4096)).alias("with_flag"),
            F.col("o_orderkey").bitwiseXOR(F.col("o_custkey")).alias("xored"),
            F.shiftleft(F.col("o_custkey"), 4).alias("shifted_l"),
            F.shiftright(F.col("o_orderkey"), 2).alias("shifted_r"),
            F.bit_count(F.col("o_orderkey")).cast("bigint").alias("popcount"),
        )
    )


QUERIES = {
    "regexp_funcs": q_regexp_funcs,
    "string_distance": q_string_distance,
    "pad_case_funcs": q_pad_case_funcs,
    "trig_funcs": q_trig_funcs,
    "bitwise_funcs": q_bitwise_funcs,
}

ORACLES = {
    "regexp_funcs": """
        SELECT p_partkey,
               regexp_extract(p_type, '([A-Z]+)', 1) AS first_word,
               regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
               CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT)
                   AS n_vowels,
               regexp_matches(p_brand, 'Brand#[0-9]+') AS brand_matches
        FROM part
    """,
    "string_distance": """
        SELECT p_partkey,
               CAST(levenshtein(p_brand, p_type) AS BIGINT) AS lev,
               CAST(levenshtein(substring(p_name, 1, 10),
                                substring(p_type, 1, 10)) AS BIGINT) AS lev_pfx
        FROM part
    """,
    "pad_case_funcs": """
        SELECT n_nationkey,
               lpad(n_name, 20, '.') AS lpadded,
               rpad(n_name, 20, '.') AS rpadded,
               list_aggregate(list_transform(string_split(lower(n_name), ' '),
                   w -> upper(w[1]) || w[2:]), 'string_agg', ' ') AS title_case,
               reverse(n_name) AS reversed_name,
               repeat(substring(n_name, 1, 2), 3) AS repeated
        FROM nation
    """,
    "trig_funcs": """
        SELECT p_partkey,
               round(sin(p_retailprice / 1000.0), 6) AS sin_v,
               round(cos(p_retailprice / 1000.0), 6) AS cos_v,
               round(atan2(p_retailprice, 100.0), 6) AS atan2_v,
               round(degrees(atan(CAST(p_size AS DOUBLE))), 6) AS deg_atan,
               round(exp(p_size / 25.0), 6) AS exp_v
        FROM part
    """,
    "bitwise_funcs": """
        SELECT o_orderkey,
               o_orderkey & 255 AS low_byte,
               o_orderkey | 4096 AS with_flag,
               xor(o_orderkey, o_custkey) AS xored,
               o_custkey << 4 AS shifted_l,
               o_orderkey >> 2 AS shifted_r,
               CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
        FROM orders
    """,
}
