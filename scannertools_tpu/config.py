"""Run-time configuration: PerfParams, CacheMode, DeviceType, database config.

Reference parity: scannerpy's ``PerfParams.estimate()/manual(...)`` knobs
(reference scannertools/tests/test_all.py:45,231) and ``CacheMode`` /
``DeviceType`` enums used throughout the reference op modules.

TPU-native reinterpretation: ``work_packet_size`` becomes the frame-chunk size
traced into one XLA program invocation; ``io_packet_size`` becomes the host
decode/prefetch granularity; ``pipeline_instances_per_node`` becomes the data
-parallel shard count over the chip mesh.
"""

from __future__ import annotations

import dataclasses
import enum
import os
from typing import Optional


class DeviceType(enum.Enum):
    """Kept for API parity with the reference (per-op ``device=`` kwarg).

    In the TPU-native design there is no per-op CPU/GPU placement: device ops
    run on the default JAX backend (TPU when present), host ops on the host.
    ``CPU`` forces a device op onto the JAX CPU backend (used by parity tests,
    mirroring the reference's DeviceTestBench, tests/test_all.py:141-147).
    """

    CPU = "cpu"
    GPU = "tpu"   # legacy alias: reference pipelines passing GPU get the accelerator
    TPU = "tpu"


class CacheMode(enum.Enum):
    """Job-level caching semantics (reference old/prelude.py:241-262).

    ``Resume`` extends the reference's table-granularity cache with
    chunk-granularity recovery: committed outputs are skipped like
    ``Ignore``, and an *interrupted* job continues from its completed
    chunk shards instead of recomputing the stream (SURVEY §5's
    per-(video, frame-range) manifest design). Requires named-stream
    sinks and a graph without stateful/whole-stream ops; otherwise it
    degrades to full recomputation of uncommitted jobs."""

    Error = "error"        # committed output exists -> raise
    Ignore = "ignore"      # committed output exists -> skip job
    Overwrite = "overwrite"  # recompute and overwrite
    Resume = "resume"      # skip committed; continue interrupted jobs


@dataclasses.dataclass(frozen=True)
class PerfParams:
    """Chunking/prefetch knobs.

    work_packet_size: frames per jitted program invocation (static shape).
    io_packet_size:   frames per host decode request (>= work_packet_size).
    pipeline_instances_per_node: data-parallel lanes over the device mesh.
    prefetch_depth:   number of chunks decoded ahead of device execution.
    """

    work_packet_size: int = 64
    io_packet_size: int = 256
    pipeline_instances_per_node: int = 1
    prefetch_depth: int = 2

    @classmethod
    def estimate(cls, **overrides) -> "PerfParams":
        """Pick sane defaults (the reference's auto-estimator analog)."""
        return cls(**overrides)

    @classmethod
    def manual(
        cls,
        work_packet_size: int = 64,
        io_packet_size: int = 256,
        pipeline_instances_per_node: int = 1,
        prefetch_depth: int = 2,
        **_ignored,
    ) -> "PerfParams":
        io_packet_size = max(io_packet_size, work_packet_size)
        return cls(
            work_packet_size=work_packet_size,
            io_packet_size=io_packet_size,
            pipeline_instances_per_node=pipeline_instances_per_node,
            prefetch_depth=prefetch_depth,
        )


@dataclasses.dataclass
class Config:
    """Client configuration (reference: engine TOML config; infra/tests.py:17-33).

    db_path: root directory for named-stream storage.
    """

    db_path: str = dataclasses.field(
        default_factory=lambda: os.environ.get(
            "SCANNERTOOLS_TPU_DB", os.path.expanduser("~/.scannertools_tpu/db")
        )
    )
    n_decode_workers: int = 2
    resources_path: Optional[str] = None  # model-weight cache dir

    def resources_dir(self) -> str:
        path = self.resources_path or os.path.join(
            os.path.dirname(self.db_path), "resources"
        )
        os.makedirs(path, exist_ok=True)
        return path
