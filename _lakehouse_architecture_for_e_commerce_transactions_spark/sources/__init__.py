from _lakehouse_architecture_for_e_commerce_transactions_spark.sources.csv import read_csv
from _lakehouse_architecture_for_e_commerce_transactions_spark.sources.layout import (
    z_value,
    zorder_write,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.sources.rejects import (
    write_rejects,
)

__all__ = ["read_csv", "write_rejects", "z_value", "zorder_write"]
