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
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.scd import (
    as_of,
    scd2_apply,
    scd2_init,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.asof import (
    asof_join,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.rangejoin import (
    range_join,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.sampling import (
    deterministic_sample,
    train_test_split,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.sessions import (
    session_stats,
    sessionize,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_fast,
    ivf_topk,
    srp_lsh_topk,
    srp_near_dup_pairs,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.skew import (
    salted_agg,
    salted_join,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.textdedup import (
    exact_dedup,
    minhash_dedup_verified,
    minhash_lsh_pairs,
    minhash_lsh_pairs_fast,
    ngram_jaccard_pairs,
    simhash_signatures,
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
    "as_of",
    "scd2_apply",
    "scd2_init",
    "asof_join",
    "connected_components",
    "dedup_clusters",
    "range_join",
    "deterministic_sample",
    "train_test_split",
    "session_stats",
    "sessionize",
    "cosine_topk",
    "cosine_topk_fast",
    "ivf_topk",
    "srp_lsh_topk",
    "srp_near_dup_pairs",
    "salted_agg",
    "salted_join",
    "exact_dedup",
    "minhash_dedup_verified",
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_fast",
    "ngram_jaccard_pairs",
    "simhash_signatures",
]
