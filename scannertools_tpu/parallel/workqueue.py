"""Elastic multi-host job distribution via storage-backed claims.

Reference parity: the Scanner master assigns work packets to workers over
gRPC and reassigns on worker loss (SURVEY §2j). The TPU-native equivalent
keeps the reference's actual data plane — shared storage — as the *only*
coordination medium: each job (video/stream index) is claimed by atomically
creating ``<db>/_claims/<run_key>/job_<i>.claim`` (O_CREAT|O_EXCL, the
portable atomic primitive on posix and on most network filesystems'
create-exclusive). Hosts race for unclaimed jobs, so a slow or dead host
simply stops claiming and the others absorb its share — unlike the static
``host_job_slice`` partition, stragglers don't strand work. The running
executor refreshes its claim's mtime per chunk (``heartbeat``), so
``reclaim_stale`` reaps on heartbeat age — only claims whose holder died
mid-job, never long-but-alive jobs — and skips jobs whose sinks already
committed. Sinks stay idempotent (unique-per-writer temp file + atomic
rename, storage/packed_format.py), so double execution after a reap is safe.

Select per run with ``PerfParams`` untouched — pass
``job_distribution="claims"`` to ``sc.run`` (default "static").
"""

from __future__ import annotations

import hashlib
import os
import socket
import time
from typing import Iterator, Optional


class WorkClaims:
    def __init__(self, db_path: str, run_key: str):
        safe = hashlib.sha256(run_key.encode()).hexdigest()[:16]
        self._dir = os.path.join(db_path, "_claims", safe)
        os.makedirs(self._dir, exist_ok=True)
        self._me = f"{socket.gethostname()}:{os.getpid()}"

    def _path(self, job: int) -> str:
        return os.path.join(self._dir, f"job_{job}.claim")

    def try_claim(self, job: int) -> bool:
        """Atomically claim a job; False if another host holds it."""
        try:
            fd = os.open(self._path(job), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            f.write(f"{self._me} {time.time()}\n")
        return True

    def iter_jobs(self, n_jobs: int) -> Iterator[int]:
        """Yield every job this host wins. Starting offset is spread by
        pid so concurrent hosts don't stampede the same prefix."""
        start = (os.getpid() * 2654435761) % max(n_jobs, 1)
        for k in range(n_jobs):
            job = (start + k) % n_jobs
            if self.try_claim(job):
                yield job

    def release(self, job: int) -> None:
        try:
            os.unlink(self._path(job))
        except OSError:
            pass

    def clear(self) -> None:
        """Drop every claim in this run's namespace (Overwrite semantics —
        a fresh run must be able to re-claim committed jobs)."""
        try:
            for fn in os.listdir(self._dir):
                try:
                    os.unlink(os.path.join(self._dir, fn))
                except OSError:
                    pass
        except OSError:
            pass

    def heartbeat(self, job: int) -> None:
        """Refresh the claim's liveness stamp (mtime). The running executor
        calls this per chunk, so reclaim_stale reaps on *heartbeat* age —
        a long-but-alive job is never reaped, only a dead holder's."""
        try:
            os.utime(self._path(job))
        except OSError:
            pass

    def reclaim_stale(self, older_than_sec: float,
                      is_committed=None) -> int:
        """Remove claims whose last heartbeat (file mtime) is older than the
        timeout (call before a retry pass). Claims whose job already
        committed — ``is_committed(job) is True`` — are left alone: the job
        is done, re-running it would race a new writer against final data.
        Returns the number reaped."""
        now = time.time()
        reaped = 0
        for fn in os.listdir(self._dir):
            p = os.path.join(self._dir, fn)
            try:
                if now - os.stat(p).st_mtime <= older_than_sec:
                    continue
                if is_committed is not None and fn.startswith("job_"):
                    job = int(fn[4:].split(".")[0])
                    if is_committed(job):
                        continue
                os.unlink(p)
                reaped += 1
            except (OSError, ValueError, IndexError):
                continue
        return reaped
