"""Iceberg source adapter: session-conf assembly + metadata-table readers.

Mirrors the reference's catalog layer (S1/S2/S11: catalog.py:99-189 — config
resolution with client S3 overrides, table load, recursive namespace walk) on
top of the Apache Iceberg Spark runtime's public surface: the
``spark.sql.catalog.*`` session confs, ``SHOW NAMESPACES`` / ``SHOW TABLES``,
and the ``.snapshots/.manifests/.files/.partitions/.entries`` metadata tables
(S3-S7).

No Iceberg runtime jar ships in this container, so everything here is gated:
``has_iceberg_runtime`` probes for the catalog class, conf assembly is a pure
function (tested jar-free), and the readers raise a clear error when the
runtime is absent. The kernels in ``operators/`` never import this module —
they consume metadata-shaped DataFrames from ANY source (fixtures today,
these readers on a real deployment), which is the architecture SURVEY §7.0
mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SPARK_CATALOG_IMPL = "org.apache.iceberg.spark.SparkCatalog"
EXTENSIONS = "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"

#: Metadata tables the reference inspects (SURVEY §1.4 mapping).
METADATA_TABLES = (
    "snapshots",
    "manifests",
    "all_manifests",
    "files",
    "data_files",
    "delete_files",
    "all_data_files",
    "partitions",
    "entries",
    "history",
    "refs",
)


#: Environment overrides (reference S11, catalog.py:26-33): each var maps to
#: one catalog property key; a set var wins over the explicit/file value
#: (catalog.py:92-96 overlays env LAST, even onto CLI flags).
ENV_VAR_MAP: dict[str, str] = {
    "ICEBERG_META_CATALOG_URI": "uri",
    "ICEBERG_META_WAREHOUSE": "warehouse",
    "ICEBERG_META_S3_ENDPOINT": "s3.endpoint",
    "ICEBERG_META_S3_ACCESS_KEY": "s3.access-key-id",
    "ICEBERG_META_S3_SECRET_KEY": "s3.secret-access-key",
    "ICEBERG_META_S3_REGION": "s3.region",
}


def resolve_placeholders(value: str, env: dict | None = None) -> str:
    """Expand ``${VAR}`` tokens from the environment (reference F9/S11,
    catalog.py:60-71); unset variables raise, same as the reference."""
    import os
    import re

    environ = os.environ if env is None else env

    def sub(m: "re.Match[str]") -> str:
        var = m.group(1)
        if environ.get(var) is None:
            raise ValueError(f"Environment variable ${{{var}}} referenced in config but not set")
        return environ[var]

    return re.sub(r"\$\{(\w+)\}", sub, value)


def resolve_catalog_props(
    *,
    file_props: dict | None = None,
    env: dict | None = None,
    **explicit: str | None,
) -> dict[str, str]:
    """S11 three-level property resolution, pure function.

    Priority (reference catalog.py:99-142, as implemented — env overlays
    LAST): ``ICEBERG_META_*`` env vars > explicit kwargs (the CLI analog) >
    config-file props. File values get ``${VAR}`` expansion and
    string-coercion (YAML bools lowercase), reference catalog.py:73-88.
    Explicit keys use property-name kwargs: ``uri=``, ``warehouse=``, plus
    any dotted key via ``file_props``.
    """
    import os

    environ = os.environ if env is None else env
    props: dict[str, str] = {}
    for k, v in (file_props or {}).items():
        if isinstance(v, bool):
            props[k] = str(v).lower()
        elif isinstance(v, str):
            props[k] = resolve_placeholders(v, environ)
        else:
            props[k] = str(v)
    for k, v in explicit.items():
        if v is not None:
            props[k] = v
    for env_key, prop_key in ENV_VAR_MAP.items():
        if environ.get(env_key):
            props[prop_key] = environ[env_key]
    return props


def iceberg_session_conf(
    catalog: str,
    *,
    catalog_type: str = "rest",
    uri: str | None = None,
    warehouse: str | None = None,
    s3_endpoint: str | None = None,
    s3_access_key: str | None = None,
    s3_secret_key: str | None = None,
    extra: dict[str, str] | None = None,
    file_props: dict | None = None,
    env: dict | None = None,
) -> dict[str, str]:
    """Assemble the session confs for one Iceberg catalog (reference S2/S11:
    CatalogConfig resolution + client-side S3 endpoint override,
    catalog.py:99-161). Pure function — apply with
    ``SparkSession.builder.config(map=...)`` or validate in tests.

    ``file_props``/``env`` opt into the reference's full three-level
    resolution (config file with ``${VAR}`` expansion, then explicit kwargs,
    then ``ICEBERG_META_*`` env overrides winning last); without them the
    explicit kwargs pass through unchanged. ``env=None`` reads the real
    environment; pass ``env={}`` for hermetic assembly.
    """
    props = resolve_catalog_props(
        file_props=file_props,
        env=env,
        uri=uri,
        warehouse=warehouse,
        **{
            # Client-side S3 overrides (the reference overlays these onto
            # table IO to dodge unreachable server-returned endpoints,
            # catalog.py:155-160).
            "s3.endpoint": s3_endpoint,
            "s3.access-key-id": s3_access_key,
            "s3.secret-access-key": s3_secret_key,
        },
    )
    base = f"spark.sql.catalog.{catalog}"
    conf: dict[str, str] = {
        "spark.sql.extensions": EXTENSIONS,
        base: SPARK_CATALOG_IMPL,
        f"{base}.type": catalog_type,
    }
    for k, v in props.items():
        conf[f"{base}.{k}"] = v
    for k, v in (extra or {}).items():
        conf[f"{base}.{k}"] = v
    return conf


def has_iceberg_runtime(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime jar is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName(SPARK_CATALOG_IMPL)  # noqa: SLF001
        return True
    except Exception:
        return False


def _require_runtime(spark: SparkSession) -> None:
    if not has_iceberg_runtime(spark):
        raise RuntimeError(
            "Iceberg Spark runtime not on the classpath; add "
            "org.apache.iceberg:iceberg-spark-runtime to spark.jars.packages "
            "(kernels still run on fixture/parquet sources without it)"
        )


def metadata_table(
    spark: SparkSession, table: str, kind: str, snapshot_id: int | None = None
) -> DataFrame:
    """S3-S7: one Iceberg metadata table, optionally time-travelled.

    ``VERSION AS OF`` mirrors the reference's per-snapshot inspection
    (formatters.py:263-281 ``inspect.files(snapshot_id=...)``).
    """
    if kind not in METADATA_TABLES:
        raise ValueError(f"unknown metadata table {kind!r}; one of {METADATA_TABLES}")
    _require_runtime(spark)
    if snapshot_id is None:
        return spark.table(f"{table}.{kind}")
    return spark.sql(f"SELECT * FROM {table}.{kind} VERSION AS OF {snapshot_id}")


def list_all_tables(spark: SparkSession, catalog: str) -> DataFrame:
    """S1: recursive namespace walk -> DataFrame(namespace, table_name).

    The reference recurses ``list_namespaces`` (catalog.py:164-189); Spark's
    equivalent is ``SHOW NAMESPACES [IN parent]`` + ``SHOW TABLES IN ns``,
    unioned into one small driver-assembled DataFrame (namespace counts are
    tiny — this is catalog metadata, not data).
    """
    _require_runtime(spark)
    out: DataFrame | None = None
    stack = [row[0] for row in spark.sql(f"SHOW NAMESPACES IN {catalog}").collect()]
    seen: list[str] = []
    while stack:
        ns = stack.pop()
        seen.append(ns)
        try:
            children = [r[0] for r in spark.sql(f"SHOW NAMESPACES IN {catalog}.{ns}").collect()]
            stack.extend(f"{ns}.{c}" for c in children)
        except Exception:
            pass  # flat catalogs reject nested SHOW NAMESPACES
        tables = spark.sql(f"SHOW TABLES IN {catalog}.{ns}").select(
            F.lit(ns).alias("namespace"), F.col("tableName").alias("table_name")
        )
        out = tables if out is None else out.unionByName(tables)
    if out is None:
        return spark.createDataFrame([], "namespace string, table_name string")
    return out


# ---------------------------------------------------------------------------
# Normalizers: native metadata tables -> the kernel input shapes. These are
# the only Iceberg-specific mappings; every kernel downstream is source-
# agnostic (fixtures.py produces the same shapes from parquet).
# ---------------------------------------------------------------------------

def files_frame(spark: SparkSession, table: str, snapshot_id: int | None = None) -> DataFrame:
    """``.files`` -> (snapshot_id, file_path, file_format, part_key,
    record_count, file_size_in_bytes) — input shape of A1/A3/A4/J1."""
    f = metadata_table(spark, table, "files", snapshot_id)
    return f.select(
        F.lit(snapshot_id).cast("long").alias("snapshot_id"),
        F.col("file_path"),
        F.col("file_format"),
        F.to_json(F.col("partition")).alias("part_key"),
        F.col("record_count"),
        F.col("file_size_in_bytes"),
    )


def normalize_file_ranges(files: DataFrame, column: str) -> DataFrame:
    """``.files`` + ``readable_metrics`` -> (file_path, lo, hi): the per-file
    value range of ``column`` for the overlap kernels (J3/W6).

    The reference decodes raw Avro-encoded bound bytes per type
    (formatters.py:581-591); Iceberg >= 1.2 already exposes the decoded
    values as ``readable_metrics.<col>.lower_bound/upper_bound``, so the
    normalization is a pure projection — no UDF, no decode. Split from
    :func:`file_ranges_frame` so the mapping is unit-testable without the
    runtime jar (any DataFrame with the same nested struct works).
    """
    m = F.col(f"readable_metrics.{column}")
    return files.select(
        F.col("file_path"),
        m.getField("lower_bound").cast("long").alias("lo"),
        m.getField("upper_bound").cast("long").alias("hi"),
    )


def file_ranges_frame(
    spark: SparkSession, table: str, column: str, snapshot_id: int | None = None
) -> DataFrame:
    """J3 input from a live table: ``readable_metrics`` bounds of one column."""
    return normalize_file_ranges(metadata_table(spark, table, "files", snapshot_id), column)


def _type_str(t) -> str:
    """Iceberg schema-JSON type -> compact display string (nested types
    recurse; mirrors the reference's type rendering, tui/widgets.py:269-297)."""
    if isinstance(t, str):
        return t
    kind = t.get("type")
    if kind == "struct":
        inner = ", ".join(f"{f['name']}: {_type_str(f['type'])}" for f in t.get("fields", []))
        return f"struct<{inner}>"
    if kind == "list":
        return f"list<{_type_str(t['element'])}>"
    if kind == "map":
        return f"map<{_type_str(t['key'])}, {_type_str(t['value'])}>"
    return str(kind)


def schema_fields_from_metadata(
    spark: SparkSession, metadata: dict, table_name: str
) -> DataFrame:
    """Table-metadata JSON -> (table_name, schema_id, field_id, name, type,
    required): the J2/J6 input shape, every schema version.

    The reference walks ``metadata.schemas`` the same way to build its
    schema-history panel (tui/widgets.py:269-297). Accepts both the v2
    ``schemas`` list and the v1 single-``schema`` form. The JSON itself is
    tiny catalog metadata — parse driver-side, hand Spark the rows.
    """
    schemas = metadata.get("schemas")
    if not schemas and "schema" in metadata:
        schemas = [metadata["schema"]]
    rows = [
        (
            table_name,
            int(sch.get("schema-id", 0)),
            int(fld["id"]),
            fld["name"],
            _type_str(fld["type"]),
            bool(fld.get("required", False)),
        )
        for sch in (schemas or [])
        for fld in sch.get("fields", [])
    ]
    schema = "table_name string, schema_id int, field_id int, name string, type string, required boolean"
    return spark.createDataFrame(rows, schema)


def load_table_metadata(spark: SparkSession, metadata_location: str) -> dict:
    """Read one table-metadata JSON: driver-side for local paths (KBs —
    no Spark job), through Spark's configured filesystem for remote
    schemes (works for s3://... once the catalog FS confs are set)."""
    import json

    from iceberg_meta_spark.sources.iceberg_native import _read_small_text

    return json.loads(_read_small_text(spark, metadata_location))


def column_stats_frame(spark: SparkSession, table: str) -> DataFrame:
    """``.files`` stats maps -> pre-flattened (file_path, field_id,
    value_count, null_count, column_size) — input shape of A5/A6.

    ``F.explode`` of the native ``map<int,long>`` columns; joining three
    exploded maps back on (file_path, key) stays key-local (no skew: field
    ids are uniform). Bounds decoding (A7) needs ``readable_metrics`` — per
    SURVEY §2.10 the one justified UDF fallback when absent.
    """
    f = metadata_table(spark, table, "files")
    vc = f.select("file_path", F.explode("value_counts").alias("field_id", "value_count"))
    nc = f.select("file_path", F.explode("null_value_counts").alias("field_id", "null_count"))
    cs = f.select("file_path", F.explode("column_sizes").alias("field_id", "column_size"))
    return vc.join(nc, ["file_path", "field_id"], "full_outer").join(
        cs, ["file_path", "field_id"], "full_outer"
    )


def snapshots_frame(spark: SparkSession, table: str) -> DataFrame:
    """``.snapshots`` -> (snapshot_id, parent_id, committed_us, operation,
    added_records, deleted_records, total_data_files, total_records,
    total_files_size) — input shape of S3/S8/A11/A12.

    Summary-map extraction via ``element_at`` IS the reference's
    metadata-only fast path (formatters.py:1313-1362): overview queries
    read only this table, never ``.files``.
    """
    s = metadata_table(spark, table, "snapshots")

    def prop(name: str):
        return F.element_at(F.col("summary"), name).cast("long")

    return s.select(
        F.col("snapshot_id"),
        F.col("parent_id"),
        (F.unix_micros(F.col("committed_at"))).alias("committed_us"),
        F.col("operation"),
        prop("added-records").alias("added_records"),
        prop("deleted-records").alias("deleted_records"),
        prop("total-data-files").alias("total_data_files"),
        prop("total-records").alias("total_records"),
        prop("total-files-size").alias("total_files_size"),
    )


def manifests_frame(spark: SparkSession, table: str) -> DataFrame:
    """``.manifests`` -> input shape of A2/S4 (content 0=data, 1=deletes)."""
    m = metadata_table(spark, table, "manifests")
    return m.select(
        F.col("path").alias("manifest_path"),
        F.col("length").alias("manifest_length"),
        F.col("partition_spec_id"),
        F.col("content"),
        F.col("added_data_files_count").alias("added_files_count"),
        F.col("existing_data_files_count").alias("existing_files_count"),
        F.col("deleted_data_files_count").alias("deleted_files_count"),
    )


# ---------------------------------------------------------------------------
# Doctor: config / environment / connectivity diagnostics (reference
# `iceberg-meta doctor`, cli.py:453-570). Pure function over (file_props,
# env, optional session) -> check rows; the api.doctor wrapper lifts the
# rows into a DataFrame. Statuses mirror the reference's ✓/!/✗ plus a
# "skip" for gated probes the environment cannot run.
# ---------------------------------------------------------------------------

_SENSITIVE = ("secret", "password", "token", "key")


def _mask(var: str, value: str) -> str:
    """Reference cli.py:524-525: sensitive values display first-4 + ***."""
    if any(s in var.lower() for s in _SENSITIVE):
        return value[:4] + "***"
    return value


def doctor_checks(
    *,
    catalog: str = "local",
    catalog_type: str = "rest",
    file_props: dict | None = None,
    env: dict | None = None,
    spark: SparkSession | None = None,
) -> list[tuple[str, str, str, str]]:
    """Run the doctor checklist -> [(section, check, status, detail)].

    Sections mirror the reference command (cli.py:453-570): config file,
    environment variables (both ``${VAR}`` placeholders referenced by the
    config and the ``ICEBERG_META_*`` override set), catalog-conf
    resolution, and connectivity. Connectivity here is the Spark analog:
    is the Iceberg runtime jar on the classpath, and does ``SHOW
    NAMESPACES`` answer — each gated and reported as ``skip`` when the
    prerequisite is absent rather than failing the whole report.

    Pure function: pass ``env={}``/``file_props=None`` for hermetic tests;
    ``spark=None`` skips the live probes.
    """
    import os
    import re

    environ = os.environ if env is None else env
    checks: list[tuple[str, str, str, str]] = []

    # -- config file (reference cli.py:482-499) --
    if file_props is None:
        checks.append(("config", "config_file", "warn", "no config passed — explicit kwargs only"))
    elif not file_props:
        checks.append(("config", "config_file", "warn", "config present but empty"))
    else:
        checks.append(("config", "config_file", "ok", f"{len(file_props)} propertie(s) configured"))

    # -- ${VAR} placeholders the config references (cli.py:511-529) --
    referenced: set[str] = set()
    for v in (file_props or {}).values():
        if isinstance(v, str):
            referenced.update(re.findall(r"\$\{(\w+)\}", v))
    if not referenced:
        checks.append(("env", "placeholders", "ok", "no ${VAR} placeholders used in config"))
    for var in sorted(referenced):
        val = environ.get(var)
        if val:
            checks.append(("env", f"${{{var}}}", "ok", _mask(var, val)))
        else:
            checks.append(("env", f"${{{var}}}", "fail", "referenced in config but not set"))

    # -- ICEBERG_META_* override set (S11 overlay, catalog.py:26-33) --
    for env_key, prop_key in ENV_VAR_MAP.items():
        if environ.get(env_key):
            checks.append(("env", env_key, "ok", f"overrides '{prop_key}' = {_mask(env_key, environ[env_key])}"))

    # -- catalog-conf resolution (cli.py:536-540) --
    try:
        conf = iceberg_session_conf(
            catalog, catalog_type=catalog_type, file_props=file_props, env=environ
        )
        checks.append(("catalog", "resolve", "ok", f"conf resolved for catalog '{catalog}' ({len(conf)} keys)"))
        base = f"spark.sql.catalog.{catalog}"
        if catalog_type == "rest" and f"{base}.uri" not in conf:
            checks.append(("catalog", "uri", "fail", "rest catalog has no uri"))
        if f"{base}.warehouse" not in conf:
            checks.append(("catalog", "warehouse", "warn", "no warehouse configured"))
    except ValueError as exc:
        checks.append(("catalog", "resolve", "fail", str(exc)))
        conf = None

    # -- connectivity (cli.py:541-551; Spark analog: jar + SHOW NAMESPACES) --
    if spark is None:
        checks.append(("connect", "runtime_jar", "skip", "no SparkSession passed"))
    elif not has_iceberg_runtime(spark):
        checks.append(
            ("connect", "runtime_jar", "warn",
             "Iceberg Spark runtime not on the classpath (needed for "
             "REST/Hive/Glue catalogs); add "
             "org.apache.iceberg:iceberg-spark-runtime to spark.jars.packages. "
             "Filesystem tables still work via the jar-free native reader "
             "(api.NativeTableSource)")
        )
    else:
        checks.append(("connect", "runtime_jar", "ok", "Iceberg runtime on classpath"))
        if conf is not None:
            try:
                tables = list_all_tables(spark, catalog)
                n_ns = tables.select("namespace").distinct().count()
                n_tbl = tables.count()
                checks.append(("connect", "catalog", "ok", f"connected — {n_ns} namespace(s), {n_tbl} table(s)"))
            except Exception as exc:  # noqa: BLE001 — the report IS the handler
                checks.append(("connect", "catalog", "fail", f"connection failed: {exc}"))
    return checks


def doctor_summary(checks: list[tuple[str, str, str, str]]) -> str:
    """One-line verdict (reference cli.py:556-570)."""
    fails = sum(1 for _, _, s, _ in checks if s == "fail")
    warns = sum(1 for _, _, s, _ in checks if s == "warn")
    total = len(checks)
    if fails:
        return f"{fails} problem(s) found out of {total} checks"
    if warns:
        return f"all clear with {warns} warning(s)"
    return "everything looks good"
