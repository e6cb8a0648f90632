"""Execution-context flags shared between the executor and op kernels."""

import contextvars

# True while the executor traces/runs device segments over a multi-chip
# mesh. Ops consult this at trace time to pick partitionable formulations
# (e.g. histogram wraps its pallas kernel in shard_map over current_mesh).
sharded_mode = contextvars.ContextVar("sharded_mode", default=False)

# The active data mesh during sharded execution (set alongside
# sharded_mode by the executor; axis name "data" shards the frame axis).
current_mesh = contextvars.ContextVar("current_mesh", default=None)
