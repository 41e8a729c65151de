"""Sparkify ETL star-schema tables as declared queries — the reference
pipeline's outputs (etl.py:65-169, bugs B1-B7 fixed) surfaced in the
driver manifest. Inputs are the committed JSON fixtures (FIXTURES.md §A),
which live outside the oracle's parquet views -> rows-only checks; exact
golden-value semantics are asserted in tests/test_etl_sparkify.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.etl import sparkify
from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.sources.json_source import (
    read_log_data,
    read_song_data,
)


def _log_nextsong(spark: SparkSession) -> DataFrame:
    return read_log_data(spark).filter(F.col("page") == "NextSong")


@register(
    "q_sparkify_songs",
    doc="songs dim (etl.py:65-74 intent): declared-schema JSON scan -> "
    "project -> deterministic dedup on the natural song_id (B1/B2).",
    tags=("2A", "etl"),
)
def q_sparkify_songs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sparkify.build_songs(read_song_data(spark))


@register(
    "q_sparkify_users",
    doc="users dim (etl.py:112-116): rename-project + latest-by-ts dedup "
    "(B7 fixed — a free->paid flipper resolves to paid).",
    tags=("2A", "etl"),
)
def q_sparkify_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sparkify.build_users(_log_nextsong(spark))


@register(
    "q_sparkify_time",
    doc="time dim (etl.py:124-135): epoch-ms -> timestamp + six date "
    "parts + dedup on ts.",
    tags=("2A", "etl"),
)
def q_sparkify_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sparkify.build_time(_log_nextsong(spark))


@register(
    "q_sparkify_songplays",
    doc="songplays fact (etl.py:144-169): the reference's 3-key composite "
    "join (song=title AND length=duration AND artist=artist_name, exact "
    "float equality preserved) through the SQL entry point with "
    "surrogate ids.",
    tags=("2A", "etl"),
)
def q_sparkify_songplays(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sparkify.build_songplays(
        spark, _log_nextsong(spark), F.broadcast(read_song_data(spark))
    )
