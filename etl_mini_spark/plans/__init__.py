from etl_mini_spark.plans.pipeline import (  # noqa: F401
    PipelineSpec,
    SinkSpec,
    SourceSpec,
    run_pipeline,
)
from etl_mini_spark.plans.checkpoint import CheckpointTable  # noqa: F401
