"""Privacy auditing: PII scrubbing, k-anonymity, l-diversity, and the
composite privacy report.

Split from the former monolithic queries/extensions.py (round 7); the
registration order of the full extension family is pinned by
queries/extensions.py::_CANONICAL_ORDER.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_meta_spark.registry import register
from iceberg_meta_spark.sources.parquet import load_table


from iceberg_meta_spark.pipeline import corpus  # noqa: E402

@register(
    "pii_scrub",
    oracle="""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
                 AS n_emails,
               CAST(len(regexp_extract_all(text,
                 '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS BIGINT)
                 AS n_ips,
               CAST(len(regexp_extract_all(text,
                 '\\+[0-9][0-9 -]{7,}[0-9]')) AS BIGINT) AS n_phones,
               CAST(len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                 + len(regexp_extract_all(text,
                 '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b'))
                 + len(regexp_extract_all(text,
                 '\\+[0-9][0-9 -]{7,}[0-9]')) AS BIGINT) AS n_redactions,
               md5(regexp_replace(regexp_replace(regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g'),
                 '\\+[0-9][0-9 -]{7,}[0-9]', '<PHONE>', 'g')) AS redacted_md5
        FROM documents
    """,
    doc="PII detection + redaction: email/IPv4/intl-phone counts and the "
    "md5 of the redacted text; regex subset with identical Java-regex/RE2 "
    "semantics; pure map-side, zero shuffle",
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.pii_scrub(load_table(spark, sf_dir, "documents"))

@register(
    "k_anonymity_audit",
    oracle="""
        WITH qi AS (SELECT c_nationkey, c_mktsegment,
                           CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
                           CAST(count(*) AS BIGINT) AS class_size
                    FROM customer
                    GROUP BY 1, 2, 3),
        tot AS (SELECT CAST(sum(class_size) AS BIGINT) AS n_rows FROM qi),
        ks AS (SELECT CAST(unnest([2, 3, 5, 10]) AS BIGINT) AS k)
        SELECT k.k,
               CAST(coalesce(sum(CASE WHEN qi.class_size < k.k THEN 1 END), 0) AS BIGINT)
                 AS n_violating_classes,
               CAST(coalesce(sum(CASE WHEN qi.class_size < k.k THEN qi.class_size END), 0) AS BIGINT)
                 AS n_rows_at_risk,
               CAST(coalesce(sum(CASE WHEN qi.class_size < k.k THEN qi.class_size END), 0)
                    * 1000 // max(t.n_rows) AS BIGINT) AS risk_permille
        FROM ks k CROSS JOIN qi, tot t
        GROUP BY k.k ORDER BY k.k
    """,
    doc="k-anonymity privacy audit over the quasi-identifier tuple "
    "(nation, market segment, account-balance band): for each re-"
    "identification threshold k in {2,3,5,10}, the number of QI "
    "equivalence classes smaller than k and the rows they expose "
    "(integer permille of the table) - the release-gate metric for "
    "sharing a derived dataset. ONE groupBy collapses the table to QI "
    "classes (map-side combine; class count is bounded by the QI "
    "domain, tiny vs rows); the k-threshold sweep and the 1-row total "
    "then ride broadcast joins over that class table, so adding "
    "thresholds costs nothing at 100 TB",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    qi = (
        load_table(spark, sf_dir, "customer")
        .groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_band"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("class_size"))
    )
    tot = qi.agg(F.sum("class_size").cast("long").alias("n_rows"))
    from iceberg_meta_spark.sources.localrel import local_frame

    ks = local_frame(qi.sparkSession, [(2,), (3,), (5,), (10,)], "k bigint")
    sweep = (
        qi.crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(tot))
        .groupBy("k")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("class_size") < F.col("k"), 1)), F.lit(0)
            )
            .cast("long")
            .alias("n_violating_classes"),
            F.coalesce(
                F.sum(F.when(F.col("class_size") < F.col("k"), F.col("class_size"))),
                F.lit(0),
            )
            .cast("long")
            .alias("n_rows_at_risk"),
            F.max("n_rows").alias("n_rows"),
        )
        .select(
            "k",
            "n_violating_classes",
            "n_rows_at_risk",
            F.expr("n_rows_at_risk * 1000 DIV n_rows").alias("risk_permille"),
        )
        .orderBy("k")
    )
    return sweep

@register(
    "l_diversity_audit",
    oracle="""
        WITH qi AS (SELECT c_nationkey,
                           CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
                           CAST(count(*) AS BIGINT) AS class_size,
                           CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive
                    FROM customer GROUP BY 1, 2),
        tot AS (SELECT CAST(sum(class_size) AS BIGINT) AS n_rows FROM qi),
        ls AS (SELECT CAST(unnest([2, 3, 5]) AS BIGINT) AS l)
        SELECT ls.l,
               CAST(coalesce(sum(CASE WHEN qi.n_sensitive < ls.l THEN 1 END), 0) AS BIGINT)
                 AS n_violating_classes,
               CAST(coalesce(sum(CASE WHEN qi.n_sensitive < ls.l THEN qi.class_size END), 0) AS BIGINT)
                 AS n_rows_at_risk,
               CAST(coalesce(sum(CASE WHEN qi.n_sensitive < ls.l THEN qi.class_size END), 0)
                    * 1000 // max(t.n_rows) AS BIGINT) AS risk_permille
        FROM ls CROSS JOIN qi, tot t
        GROUP BY ls.l ORDER BY ls.l
    """,
    doc="l-diversity privacy audit, the homogeneity-attack companion of "
    "k_anonymity_audit (Machanavajjhala et al. 2007): a QI class "
    "(nation, balance band) whose rows all share one sensitive value "
    "(market segment) leaks it even when k-anonymous. Per l in {2,3,5}: "
    "classes with < l distinct sensitive values and the rows they "
    "expose in permille. Same scale shape: ONE groupBy to QI classes "
    "with count_distinct, threshold sweep broadcast over the class table",
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    qi = (
        load_table(spark, sf_dir, "customer")
        .groupBy(
            "c_nationkey",
            F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_band"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("class_size"),
            F.count_distinct("c_mktsegment").cast("long").alias("n_sensitive"),
        )
    )
    tot = qi.agg(F.sum("class_size").cast("long").alias("n_rows"))
    from iceberg_meta_spark.sources.localrel import local_frame

    ls = local_frame(qi.sparkSession, [(2,), (3,), (5,)], "l bigint")
    return (
        qi.crossJoin(F.broadcast(ls))
        .crossJoin(F.broadcast(tot))
        .groupBy("l")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("n_sensitive") < F.col("l"), 1)), F.lit(0)
            )
            .cast("long")
            .alias("n_violating_classes"),
            F.coalesce(
                F.sum(
                    F.when(F.col("n_sensitive") < F.col("l"), F.col("class_size"))
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_rows_at_risk"),
            F.max("n_rows").alias("n_rows"),
        )
        .select(
            "l",
            "n_violating_classes",
            "n_rows_at_risk",
            F.expr("n_rows_at_risk * 1000 DIV n_rows").alias("risk_permille"),
        )
        .orderBy("l")
    )

@register(
    "privacy_report",
    oracle="""
        WITH qi AS (SELECT c_nationkey, c_mktsegment,
                           CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
                           CAST(count(*) AS BIGINT) AS class_size
                    FROM customer GROUP BY 1, 2, 3),
        tot AS (SELECT CAST(sum(class_size) AS BIGINT) AS n_rows FROM qi),
        ldiv AS (SELECT c_nationkey, bal_band,
                        CAST(sum(class_size) AS BIGINT) AS class_size,
                        CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive
                 FROM qi GROUP BY 1, 2),
        ks AS (SELECT CAST(unnest([2, 3, 5, 10]) AS BIGINT) AS thr),
        ls AS (SELECT CAST(unnest([2, 3, 5]) AS BIGINT) AS thr),
        ka AS (SELECT 'k_anonymity' AS audit, k.thr,
                      CAST(coalesce(sum(CASE WHEN qi.class_size < k.thr THEN 1 END), 0) AS BIGINT)
                        AS n_violating_classes,
                      CAST(coalesce(sum(CASE WHEN qi.class_size < k.thr THEN qi.class_size END), 0) AS BIGINT)
                        AS n_rows_at_risk,
                      CAST(coalesce(sum(CASE WHEN qi.class_size < k.thr THEN qi.class_size END), 0)
                           * 1000 // max(t.n_rows) AS BIGINT) AS risk_permille
               FROM ks k CROSS JOIN qi, tot t GROUP BY k.thr),
        ld AS (SELECT 'l_diversity' AS audit, l.thr,
                      CAST(coalesce(sum(CASE WHEN d.n_sensitive < l.thr THEN 1 END), 0) AS BIGINT),
                      CAST(coalesce(sum(CASE WHEN d.n_sensitive < l.thr THEN d.class_size END), 0) AS BIGINT),
                      CAST(coalesce(sum(CASE WHEN d.n_sensitive < l.thr THEN d.class_size END), 0)
                           * 1000 // max(t.n_rows) AS BIGINT)
               FROM ls l CROSS JOIN ldiv d, tot t GROUP BY l.thr)
        SELECT * FROM ka UNION ALL SELECT * FROM ld
        ORDER BY audit, thr
    """,
    doc="Composite privacy release gate: the k-anonymity and l-diversity "
    "sweeps in one long-format result, derived from ONE scan of the "
    "table — a single groupBy to the fine QI classes (nation, segment, "
    "band) feeds the k-anonymity sweep directly and re-aggregates to "
    "the coarse (nation, band) grain for l-diversity (distinct-segment "
    "counts), with both threshold sweeps and the 1-row total riding "
    "broadcasts over the bounded class tables",
)
def privacy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    qi = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_band"),
    ).agg(F.count(F.lit(1)).cast("long").alias("class_size"))
    tot = qi.agg(F.sum("class_size").cast("long").alias("n_rows"))
    ldiv = qi.groupBy("c_nationkey", "bal_band").agg(
        F.sum("class_size").cast("long").alias("class_size"),
        F.count_distinct("c_mktsegment").cast("long").alias("n_sensitive"),
    )

    def sweep(classes: DataFrame, size_col: str, metric_col: str, audit: str, thresholds: list[int]) -> DataFrame:
        from iceberg_meta_spark.sources.localrel import local_frame

        ts = local_frame(classes.sparkSession, [(t,) for t in thresholds], "thr bigint")
        return (
            classes.crossJoin(F.broadcast(ts))
            .crossJoin(F.broadcast(tot))
            .groupBy("thr")
            .agg(
                F.coalesce(F.sum(F.when(F.col(metric_col) < F.col("thr"), 1)), F.lit(0))
                .cast("long")
                .alias("n_violating_classes"),
                F.coalesce(
                    F.sum(F.when(F.col(metric_col) < F.col("thr"), F.col(size_col))),
                    F.lit(0),
                )
                .cast("long")
                .alias("n_rows_at_risk"),
                F.max("n_rows").alias("n_rows"),
            )
            .select(
                F.lit(audit).alias("audit"),
                "thr",
                "n_violating_classes",
                "n_rows_at_risk",
                F.expr("n_rows_at_risk * 1000 DIV n_rows").alias("risk_permille"),
            )
        )

    ka = sweep(qi, "class_size", "class_size", "k_anonymity", [2, 3, 5, 10])
    ld = sweep(ldiv, "class_size", "n_sensitive", "l_diversity", [2, 3, 5])
    return ka.unionByName(ld).orderBy("audit", "thr")
