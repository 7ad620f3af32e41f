from etl_mini_spark.functions.time_fns import (  # noqa: F401
    derive_time_parts,
    iso_to_parts_cols,
    normalize_iso_col,
)
from etl_mini_spark.functions.sanitize import sanitize_scalar, with_json_length_flag  # noqa: F401
from etl_mini_spark.functions.registry import FunctionRegistry, apply_additional_fields  # noqa: F401
