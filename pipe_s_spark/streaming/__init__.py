from pipe_s_spark.streaming.merge_apply import (
    MergeApplyTarget,
    run_merge_apply_stream,
    stream_changelog_json,
)

__all__ = ["MergeApplyTarget", "run_merge_apply_stream", "stream_changelog_json"]
