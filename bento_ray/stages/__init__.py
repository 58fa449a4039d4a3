from bento_ray.stages.core import (
    archive,
    bounds_check,
    filter_rows,
    mapping,
    mutation,
    select_parts,
    split_batches,
    unarchive,
)
from bento_ray.stages.compose import (
    branch,
    catch_errors,
    group_by_table,
    group_by_value_table,
    switch,
    switch_table,
    try_stage,
    workflow,
)
from bento_ray.stages.dedupe import dedupe_exact, dedupe_pane
from bento_ray.stages.join import broadcast_join, broadcast_join_versioned, shuffle_join
from bento_ray.stages.window import (
    assign_session_windows,
    assign_sliding,
    assign_tumbling,
    windowed_aggregate,
)

__all__ = [
    "mapping",
    "mutation",
    "filter_rows",
    "archive",
    "unarchive",
    "split_batches",
    "select_parts",
    "bounds_check",
    "switch",
    "switch_table",
    "group_by_table",
    "group_by_value_table",
    "workflow",
    "branch",
    "try_stage",
    "catch_errors",
    "dedupe_exact",
    "dedupe_pane",
    "broadcast_join",
    "broadcast_join_versioned",
    "shuffle_join",
    "assign_tumbling",
    "assign_sliding",
    "assign_session_windows",
    "windowed_aggregate",
]
