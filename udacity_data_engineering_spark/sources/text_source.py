"""Line-oriented text source — ``spark.read.text`` plus a declarative
parse, the pattern for ingesting logs / raw corpus dumps that aren't in
a structured format yet.

The parse stays entirely in codegen (split + element_at + casts); the
delimiter is the ASCII unit separator so arbitrary free-text columns
(comments) can't collide. At 100 TB, text ingest is scan-bound — the
value of this shape is that nothing downstream of the scan is Python
and malformed lines degrade to nulls (PERMISSIVE posture) instead of
failing the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table
from udacity_data_engineering_spark.sources.parquet_source import scratch_dir

SEP = "\x1f"  # ASCII unit separator — cannot appear in the text columns


#: Hive-TextFormat-style null sentinel. concat_ws silently SKIPS null
#: arguments, which would shift every later field one position left —
#: a row with a null middle column would otherwise parse its neighbors
#: into the wrong fields (and under ANSI, element_at past the shortened
#: array throws). Encoding nulls explicitly keeps field positions fixed.
#: Format contract (same kind as SEP above): a string field whose
#: literal value is the two characters backslash-N cannot round-trip —
#: it reads back as NULL, exactly as in Hive's TextFormat. Data that
#: may legitimately contain it belongs in parquet/ORC, not a
#: delimited-text sink.
NULL_SENTINEL = "\\N"


def write_lines(df: DataFrame, path: str) -> None:
    """Serialize every row to one delimited line (all columns cast to
    string, nulls as the \\N sentinel) and write via the text sink."""
    line = F.concat_ws(
        SEP,
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(NULL_SENTINEL))
            for c in df.columns
        ],
    )
    df.select(line.alias("value")).write.mode("overwrite").text(path)


def read_lines_parsed(spark: SparkSession, path: str, schema) -> DataFrame:
    """Read lines and parse back to the declared schema: split on the
    delimiter, positional element_at, sentinel-to-null, cast per field —
    all codegen'd."""
    parts = F.split(F.col("value"), SEP)
    return spark.read.text(path).select(
        *[
            F.nullif(F.element_at(parts, i + 1), F.lit(NULL_SENTINEL))
            .cast(f.dataType)
            .alias(f.name)
            for i, f in enumerate(schema.fields)
        ]
    )


@register(
    "q_textfile_parse",
    oracle="SELECT * FROM nation",
    doc="Text-file ingest: rows serialized to unit-separator-delimited "
    "lines (nulls as the Hive-style \\N sentinel — concat_ws alone "
    "SKIPS nulls and would shift later fields), re-read with "
    "spark.read.text and parsed back to the declared schema by "
    "codegen'd split/element_at/nullif/cast — the raw-log ingest shape "
    "with zero Python after the scan. Round-trip fidelity makes the "
    "table itself the oracle.",
    tags=("sources",),
)
def q_textfile_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = scratch_dir("textfile_parse")
    nat = table(spark, sf_dir, "nation")
    write_lines(nat, out)
    return read_lines_parsed(spark, out, nat.schema)
