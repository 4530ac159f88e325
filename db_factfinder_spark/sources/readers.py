"""Source readers + census sentinel scrubbing.

The reference ingests from the Census REST API (download.py:51-141);
this engine's canonical source is Parquet — the production path is an
ingest job that lands API responses as wide Parquet partitioned by
``geotype``, after which everything is `spark.read.parquet` with
predicate pushdown and column pruning.  Dimension CSVs keep all-string
schemas (geoids must keep leading zeros — 2010_to_2020.py:19-23).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from db_factfinder_spark.catalog import Variable
from db_factfinder_spark.functions.stats import OUTLIER_SENTINELS

CONTROLLED = [-555555555.0, 555555555.0]

LOOKUP_GEO_SCHEMA = T.StructType(
    [
        T.StructField(c, T.StringType())
        for c in [
            "geoid",
            "nta2020",
            "ntaname",
            "cdta2020",
            "cdtaname",
            "borocode",
            "boroname",
            "fp_100",
            "fp_500",
            "park_access",
        ]
    ]
)

RATIO_SCHEMA = T.StructType(
    [
        T.StructField("boroct2010", T.StringType()),
        T.StructField("boroct2020", T.StringType()),
        T.StructField("ratio", T.StringType()),
    ]
)


def read_wide(spark: SparkSession, path: str) -> DataFrame:
    """Wide source scan.  Parquet → pushdown + pruning for free."""
    return spark.read.parquet(path)


def normalize_event_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize the event timestamp column to plain TIMESTAMP whatever
    physical type the writer used:

    - BIGINT epoch (TIMESTAMP(NANOS) parquet surfaced via
      ``nanosAsLong``, or a plain INT64 the writer stored without a
      timestamp logical type): the unit is detected per row by
      magnitude — |v| ≥ 1e17 → nanos, ≥ 1e14 → micros, ≥ 1e11 →
      millis, else seconds.  The bands are unambiguous for any instant
      between 1973 and 5138; a mixed-unit column is even handled
      row-by-row.  Nanos integer-divide to µs — `/ 1000` in double
      would round the epoch-nanos long (> 2^53) to a multiple of
      256 ns before dividing, occasionally landing one microsecond off.
    - TIMESTAMP_NTZ (µs parquet without tz annotation): cast to ltz
      TIMESTAMP.  The cast interprets the naive wall clock in the
      *session* time zone, and only a fixed-offset zone guarantees the
      wall clock survives the cast-in/format-out round trip (a DST
      zone has ambiguous and skipped local times), so the UTC pin that
      ``session.get_spark`` sets is asserted here, where the
      correctness actually depends on it.
    - TIMESTAMP: already canonical.
    """
    dt = df.schema[ts_col].dataType.typeName()
    if dt in ("long", "bigint"):
        v = F.col(ts_col)
        av = F.abs(v)
        micros = (
            F.when(av >= F.lit(int(1e17)), F.expr(f"{ts_col} div 1000"))
            .when(av >= F.lit(int(1e14)), v)
            .when(av >= F.lit(int(1e11)), v * 1000)
            .otherwise(v * 1_000_000)
        )
        return df.withColumn(ts_col, F.timestamp_micros(micros))
    if dt == "timestamp_ntz":
        import re

        tz = df.sparkSession.conf.get("spark.sql.session.timeZone") or ""
        fixed = tz in {"UTC", "GMT", "Etc/UTC", "Etc/GMT", "Z"} or re.fullmatch(
            r"[+-]\d{2}:\d{2}", tz
        )
        if not fixed:
            raise ValueError(
                "normalize_event_ts: casting TIMESTAMP_NTZ requires a "
                "fixed-offset session time zone (got "
                f"{tz!r}); set spark.sql.session.timeZone=UTC "
                "(session.get_spark does) so naive wall clocks survive "
                "the cast"
            )
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def read_events(spark: SparkSession, path: str) -> DataFrame:
    """Event-stream scan, robust to the writer's timestamp encoding.
    TIMESTAMP(NANOS) parquet is rejected by Spark's reader unless
    ``spark.sql.legacy.parquet.nanosAsLong`` is set (session-wide; no
    per-read option), so set it before the scan — a µs-encoded file is
    unaffected by the flag."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_ts(spark.read.parquet(path))


def read_lookup_geo(spark: SparkSession, path: str) -> DataFrame:
    """Block-grain geography crosswalk, all-string (dtype=str parity)."""
    return spark.read.csv(path, header=True, schema=LOOKUP_GEO_SCHEMA)


def packaged_ratio_path() -> str:
    """The packaged real apportionment weights (byte-identical copy of
    reference data/lookup_geo/2010_to_2020/ratio.csv — 2,416 splits,
    2,167 2010 tracts → 2,327 2020 tracts)."""
    from pathlib import Path

    return str(
        Path(__file__).parent.parent
        / "data" / "lookup_geo" / "2010_to_2020" / "ratio.csv"
    )


def packaged_profile_mapping_path() -> str:
    """The packaged community-profiles variable mapping (byte-identical
    copy of reference pipelines/acs_community_profiles_variable_mapping
    .json — 75 mappings over CDTA/borough/city/flood-zone geotypes)."""
    from pathlib import Path

    return str(
        Path(__file__).parent.parent
        / "data" / "pipelines"
        / "acs_community_profiles_variable_mapping.json"
    )


def read_ratio(spark: SparkSession, path: str | None = None) -> DataFrame:
    """2010→2020 tract apportionment weights, all-string on read.

    Columns are matched BY HEADER NAME like the reference's
    ``pd.read_csv(dtype=str)`` (2010_to_2020.py:37-50) — the real file
    orders them (boroct2020, boroct2010, ratio), so a positional schema
    would silently swap the crosswalk direction.  Defaults to the
    packaged real weights."""
    if path is None:
        path = packaged_ratio_path()
    df = spark.read.csv(path, header=True, inferSchema=False)
    return df.select("boroct2010", "boroct2020", "ratio")


def scrub_wide(df: DataFrame, v: Variable, geotype: str) -> DataFrame:
    """Census sentinel scrub for the e/m download path, in reference
    order (download.py:123-140):

    per variable: cast to double; E==0 → M:=0; E sentinel → M:=NULL;
    at city/borough grain M==±555555555 (controlled) → 0; finally every
    remaining sentinel anywhere → NULL.
    """
    updates: dict[str, F.Column] = {}
    e_m_pairs = [
        (f"{cv}E", f"{cv}M") for cv in v.census_variable if cv[0] != "P"
    ]
    decennial_cols = [cv for cv in v.census_variable if cv[0] == "P"]

    for e_col, m_col in e_m_pairs:
        e = F.col(e_col).cast("double")
        m = F.col(m_col).cast("double")
        m = F.when(e == 0, F.lit(0.0)).otherwise(m)
        m = F.when(e.isin(OUTLIER_SENTINELS), F.lit(None).cast("double")).otherwise(m)
        if geotype in ("city", "borough"):
            m = F.when(m.isin(CONTROLLED), F.lit(0.0)).otherwise(m)
        updates[e_col] = e
        updates[m_col] = m
    for c in decennial_cols:
        updates[c] = F.col(c).cast("double")

    df = df.withColumns(updates)

    # global sentinel → NULL on every measure column (download.py:140)
    final = {
        name: F.when(
            F.col(name).isin(OUTLIER_SENTINELS), F.lit(None).cast("double")
        ).otherwise(F.col(name))
        for name in updates
    }
    return df.withColumns(final)


def scrub_wide_profile(df: DataFrame, v: Variable, geotype: str) -> DataFrame:
    """Sentinel scrub for the profile-only e/m/p/z path — note the
    *different* rule order vs the e/m path (download.py:74-87): sentinel
    E → M:=NULL first, then E==0 → M:=0, then controlled-value handling
    on both M and PM at city/borough, then global sentinel → NULL."""
    cv = v.census_variable[0]
    cols = [f"{cv}E", f"{cv}M", f"{cv}PE", f"{cv}PM"]
    casts = {c: F.col(c).cast("double") for c in cols if c in df.columns}
    df = df.withColumns(casts)

    e, m, pm = F.col(f"{cv}E"), F.col(f"{cv}M"), F.col(f"{cv}PM")
    m_new = F.when(e.isin(OUTLIER_SENTINELS), F.lit(None).cast("double")).otherwise(m)
    m_new = F.when(e == 0, F.lit(0.0)).otherwise(m_new)
    updates = {f"{cv}M": m_new}
    if geotype in ("city", "borough"):
        updates[f"{cv}M"] = F.when(m_new.isin(CONTROLLED), F.lit(0.0)).otherwise(m_new)
        updates[f"{cv}PM"] = F.when(pm.isin(CONTROLLED), F.lit(0.0)).otherwise(pm)
    df = df.withColumns(updates)

    final = {
        c: F.when(
            F.col(c).isin(OUTLIER_SENTINELS), F.lit(None).cast("double")
        ).otherwise(F.col(c))
        for c in cols
        if c in df.columns
    }
    return df.withColumns(final)


def write_csv(df: DataFrame, path: str) -> None:
    """CSV sink (reference pipelines/acs.py:60-63).

    Deliberately writes the frame's own partitioning.  A REBALANCE
    hint before the write (guide §6 "coalesce on write") was tried in
    r11 and REVERTED on a negative same-session A/B: the
    AQE-coalescible exchange packed the 31 MB production artifact from
    ~100 part files into 16, but the added output-sized shuffle cost
    more than the task-commit overhead it saved (production grid
    55.3/54.3 s with the hint vs 46.3/57.2 s without at sf0.1 —
    OPTIMIZATION_r11.md).  A deployment whose object store punishes
    small files can still rebalance at the call site."""
    df.write.mode("overwrite").option("header", True).csv(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Parquet sink partitioned for downstream partition pruning — the
    production layout is ``geotype=/pff_variable=`` so per-(variable,
    geotype) reads touch one directory."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append", **options) -> None:
    """Postgres sink (reference pipelines/create_acs.sql + CI \\COPY step).
    Requires a JDBC driver jar on the classpath — out of correctness
    scope here, kept for API completeness."""
    df.write.mode(mode).format("jdbc").option("url", url).option(
        "dbtable", table
    ).options(**options).save()


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (Spark's built-in ORC writer — the other columnar
    interchange format warehouses commonly mandate).  Snappy
    compression, same layout contract as ``write_parquet``."""
    df.write.mode("overwrite").option("compression", "snappy").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — predicate pushdown and column pruning work exactly
    as for parquet (``spark.sql.orc.filterPushdown`` defaults true)."""
    return spark.read.orc(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines sink (one object per line, gzip) — the text
    interchange format crawl/annotation pipelines exchange.  Dates and
    timestamps serialize ISO-8601; NULL fields are omitted per JSON
    convention (round-trip readers must tolerate missing keys)."""
    df.write.mode("overwrite").option("compression", "gzip").json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """JSON-lines scan.  Pass an explicit DDL ``schema`` in
    production — schema inference costs a full extra pass over the
    data at 100 TB and types drift with sampling; inference is for
    exploration only."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)
