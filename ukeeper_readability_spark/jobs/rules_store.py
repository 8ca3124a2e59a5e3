"""Rules dimension-table maintenance (reference datastore/rules.go CRUD).

MongoDB upsert-by-domain becomes a MERGE: in production
  MERGE INTO rules t USING updates s ON t.domain = s.domain
  WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
on Iceberg; here the same semantics composed from DataFrame ops. Matches the
reference's quirks: one rule per domain (rules.go:68), an update preserves the
existing id (rules.go:79-85), Disable is a soft delete (rules.go:90-93,
CLAUDE.md never-hard-delete convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def save_rules(rules: DataFrame, updates: DataFrame) -> DataFrame:
    """Upsert by domain; existing id wins over the update's id (rules.go:67-87)."""
    existing_ids = rules.select("domain", F.col("id").alias("_existing_id"))
    upd = (
        updates.join(existing_ids, "domain", "left")
        .withColumn("id", F.coalesce(F.col("_existing_id"), F.col("id")))
        .drop("_existing_id")
        .select(*updates.columns)
    )
    kept = rules.join(updates.select("domain"), "domain", "left_anti").select(*updates.columns)
    return kept.unionByName(upd)


def disable_rule(rules: DataFrame, rule_id: str) -> DataFrame:
    """Soft delete: enabled=false by id (rules.go:90-93)."""
    return rules.withColumn(
        "enabled",
        F.when(F.col("id") == F.lit(rule_id), F.lit(False)).otherwise(F.col("enabled")),
    )


def all_rules(rules: DataFrame) -> DataFrame:
    """RulesDAO.All: full scan, enabled and disabled (rules.go:96-108)."""
    return rules


def get_by_id(rules: DataFrame, rule_id: str) -> DataFrame:
    """RulesDAO.GetByID point lookup (rules.go:60-64)."""
    return rules.filter(F.col("id") == F.lit(rule_id))
