from mallarddv_spark.plans.model import (
    TableColumn,
    TransitionRecord,
    group_records,
)
from mallarddv_spark.plans.types import spark_type_for

__all__ = ["TableColumn", "TransitionRecord", "group_records", "spark_type_for"]
