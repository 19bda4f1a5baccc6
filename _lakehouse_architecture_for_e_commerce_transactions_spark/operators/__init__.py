from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.validation import (
    ValidationResult,
    enforce_schema,
    validate,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.joins import (
    fk_check,
    fk_orphans,
    fk_valid,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.dedup import (
    dedup_deterministic,
    dedup_exact,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.merge import (
    merge_upsert,
)

__all__ = [
    "ValidationResult",
    "enforce_schema",
    "validate",
    "fk_check",
    "fk_orphans",
    "fk_valid",
    "dedup_deterministic",
    "dedup_exact",
    "merge_upsert",
]
