from pipe_s_spark.plans.runner import (
    PipelineSpecError,
    build_pipeline,
    register_processor,
    run_pipeline,
)

__all__ = ["PipelineSpecError", "build_pipeline", "register_processor", "run_pipeline"]
