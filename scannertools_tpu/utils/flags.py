"""Execution-context flags shared between the executor and op kernels."""

import contextvars

# True while the executor traces/runs device segments over a multi-chip
# mesh. Ops consult this at trace time to pick GSPMD-partitionable
# formulations (e.g. histogram's one-hot reduce instead of its pallas
# kernel, which would need an explicit shard_map wrapper to partition).
sharded_mode = contextvars.ContextVar("sharded_mode", default=False)
