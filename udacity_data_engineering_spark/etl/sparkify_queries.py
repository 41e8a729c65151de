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
    FIXTURES,
    LOG_COLS_DUCK,
    SONG_COLS_DUCK,
    read_log_data,
    read_song_data,
)

#: Shared oracle CTE: the NextSong log scan. ignore_errors drops the one
#: malformed fixture line that Spark's PERMISSIVE scan keeps as a
#: corrupt-record row — identical survivors once page='NextSong' filters.
_LOG_CTE = f"""
    log AS (SELECT * FROM read_json('{FIXTURES}/log_data/*/*/*.json',
                columns={LOG_COLS_DUCK}, ignore_errors=true)
            WHERE page = 'NextSong')
"""


def _log_nextsong(spark: SparkSession) -> DataFrame:
    return read_log_data(spark).filter(F.col("page") == "NextSong")


@register(
    "q_sparkify_songs",
    oracle=f"""
        SELECT song_id, title, artist_id, year, duration FROM (
            SELECT song_id, title, artist_id, year, duration,
                   row_number() OVER (PARTITION BY song_id
                       ORDER BY title, artist_id, year, duration) AS rn
            FROM read_json('{FIXTURES}/song_data/*/*/*/*.json',
                           columns={SONG_COLS_DUCK})
        ) WHERE rn = 1
    """,
    doc="songs dim (etl.py:65-74 intent): declared-schema JSON scan -> "
    "project -> deterministic dedup on the natural song_id (B1/B2). "
    "Value-hash proven against the same dedup in DuckDB.",
    tags=("2A", "etl"),
)
def q_sparkify_songs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sparkify.build_songs(read_song_data(spark))


@register(
    "q_sparkify_artists",
    oracle=f"""
        SELECT artist_id, artist_name, artist_location,
               artist_latitude, artist_longitude FROM (
            SELECT artist_id, artist_name, artist_location,
                   artist_latitude, artist_longitude,
                   row_number() OVER (PARTITION BY artist_id
                       ORDER BY artist_name NULLS FIRST,
                                artist_location NULLS FIRST,
                                artist_latitude NULLS FIRST,
                                artist_longitude NULLS FIRST) AS rn
            FROM read_json('{FIXTURES}/song_data/*/*/*/*.json',
                           columns={SONG_COLS_DUCK})
        ) WHERE rn = 1
    """,
    doc="artists dim (etl.py:78-82 intent): declared-schema JSON scan -> "
    "project -> deterministic dedup on the natural artist_id (B1/B2), "
    "the last of the reference's five tables to get a hash proof "
    "(VERDICT r11 'What's missing' #1). NULLS FIRST aligns DuckDB's "
    "default NULLS LAST with Spark's ascending null ordering — "
    "artist_latitude/longitude are nullable in the fixtures.",
    tags=("2A", "etl"),
)
def q_sparkify_artists(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sparkify.build_artists(read_song_data(spark))


@register(
    "q_sparkify_users",
    oracle=f"""
        WITH {_LOG_CTE}
        SELECT user_id, first_name, last_name, gender, level FROM (
            SELECT userId AS user_id, firstName AS first_name,
                   lastName AS last_name, gender, level,
                   row_number() OVER (PARTITION BY userId
                       ORDER BY ts DESC, level, gender) AS rn
            FROM log WHERE userId <> ''
        ) WHERE rn = 1
    """,
    doc="users dim (etl.py:112-116): rename-project + latest-by-ts dedup "
    "(B7 fixed — a free->paid flipper resolves to paid). Value-hash "
    "proven against the same latest-wins dedup in DuckDB.",
    tags=("2A", "etl"),
)
def q_sparkify_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sparkify.build_users(_log_nextsong(spark))


@register(
    "q_sparkify_time",
    oracle=f"""
        WITH {_LOG_CTE}, t AS (SELECT DISTINCT ts FROM log)
        SELECT ts, make_timestamp(ts * 1000) AS start_time,
               CAST(hour(make_timestamp(ts*1000)) AS INT) AS hour,
               CAST(day(make_timestamp(ts*1000)) AS INT) AS day,
               CAST(weekofyear(make_timestamp(ts*1000)) AS INT) AS week,
               CAST(month(make_timestamp(ts*1000)) AS INT) AS month,
               CAST(year(make_timestamp(ts*1000)) AS INT) AS year,
               CAST(dayofweek(make_timestamp(ts*1000)) + 1 AS INT) AS weekday
        FROM t
    """,
    doc="time dim (etl.py:124-135): epoch-ms -> timestamp + six date "
    "parts + dedup on ts. Value-hash proven in DuckDB (dayofweek+1 "
    "aligns DuckDB's Sunday=0 with Spark's Sunday=1).",
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


@register(
    "q_sparkify_songplays_nat",
    oracle=f"""
        WITH {_LOG_CTE}
        SELECT make_timestamp(ld.ts * 1000) AS start_time,
               CAST(year(make_timestamp(ld.ts * 1000)) AS INT)  AS year,
               CAST(month(make_timestamp(ld.ts * 1000)) AS INT) AS month,
               ld.userId    AS user_id,
               ld.level,
               sd.song_id,
               sd.artist_id,
               ld.sessionId AS session_id,
               ld.location,
               ld.userAgent AS user_agent
        FROM log ld
        JOIN read_json('{FIXTURES}/song_data/*/*/*/*.json',
                       columns={SONG_COLS_DUCK}) sd
          ON ld.song = sd.title
         AND ld.length = sd.duration
         AND ld.artist = sd.artist_name
    """,
    doc="songplays fact, natural columns only (etl.py:144-169 minus the "
    "partition-dependent surrogate id): the 3-key composite join with "
    "exact float equality (length=duration) value-hash proven against "
    "the identical join in DuckDB — the hard proof of the reference's "
    "flagship join that the surrogate id keeps rows-only.",
    tags=("2A", "etl"),
)
def q_sparkify_songplays_nat(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sparkify.build_songplays(
        spark, _log_nextsong(spark), F.broadcast(read_song_data(spark))
    ).drop("songplay_id")
