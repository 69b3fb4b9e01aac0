"""Multi-process (multi-host) runtime: jax.distributed init + process info.

The reference is strictly single-process, single-device
(geo-aware/train.py:16-18, geo-aware/models.py:6), so this subsystem is
green-field TPU design per SURVEY.md §5: a multi-host pod runs one Python
process per host, every process calls :func:`initialize` before touching
jax, each process's loader reads a DISJOINT shard of every global batch
(``process_index``/``process_count`` threaded through the loaders in
``icek_tpu/data``), and the per-process shards are assembled into global
sharded arrays with ``jax.make_array_from_process_local_data``
(``parallel/mesh.py::global_batch``).

Process topology is taken from, in order:
  1. explicit arguments,
  2. the ``ICEK_COORDINATOR`` / ``ICEK_NUM_PROCESSES`` / ``ICEK_PROCESS_ID``
     environment variables,
  3. jax's own cluster auto-detection (Cloud TPU pods, Slurm, Open MPI),
     which requires no configuration at all on TPU.

Single-process runs (the test/dev default) skip initialization entirely —
calling :func:`maybe_initialize` is always safe.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax

_INITIALIZED = False


@dataclasses.dataclass(frozen=True)
class ProcessInfo:
    index: int
    count: int

    @property
    def is_primary(self) -> bool:
        return self.index == 0


def maybe_initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    force: bool = False,
) -> ProcessInfo:
    """Initialize the jax distributed system when a multi-process topology
    is configured; no-op otherwise.  Idempotent.  Returns the live process
    topology either way (so callers can shard loaders unconditionally).

    ``force=True`` (the apps' ``--distributed`` flag) initializes even with
    no explicit topology, letting jax's own cluster auto-detection (Cloud
    TPU pods, Slurm, Open MPI) fill it in — and raises if detection finds
    nothing, because a user who asked for distributed must never silently
    get N independent single-process replicas clobbering each other."""
    global _INITIALIZED
    coordinator_address = coordinator_address or os.environ.get("ICEK_COORDINATOR")
    env_np = os.environ.get("ICEK_NUM_PROCESSES")
    env_pid = os.environ.get("ICEK_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)

    want_multiprocess = force or coordinator_address is not None or (
        num_processes is not None and num_processes > 1
    )
    if want_multiprocess and not _INITIALIZED:
        # On CPU backends cross-process collectives need an explicit
        # transport (TPU pods ride ICI natively); gloo-over-TCP ships with
        # jaxlib.  Must be set before the backend is created.
        platforms = str(
            getattr(jax.config, "jax_platforms", None)
            or os.environ.get("JAX_PLATFORMS", "")
        )
        if "cpu" in platforms:
            try:
                jax.config.update("jax_cpu_collectives_implementation", "gloo")
            except Exception:  # older jaxlib without gloo: single-host only
                pass
        explicit = coordinator_address is not None or num_processes is not None
        try:
            # must run before any other jax API call creates the backend
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except Exception as exc:
            if explicit:
                raise
            # force=True with nothing to auto-detect: fail loudly instead
            # of quietly degrading to an unsharded single-process run
            raise RuntimeError(
                "--distributed was requested but no multi-process topology "
                "was found: set ICEK_COORDINATOR/ICEK_NUM_PROCESSES/"
                "ICEK_PROCESS_ID (or run under a launcher jax can "
                "auto-detect: Cloud TPU pod, Slurm, Open MPI). "
                f"jax.distributed.initialize() said: {exc}"
            ) from exc
        _INITIALIZED = True
    return process_info()


def process_info() -> ProcessInfo:
    return ProcessInfo(jax.process_index(), jax.process_count())


def local_batch_size(global_batch_size: int, count: Optional[int] = None) -> int:
    """Rows of each global batch this process loads.  The global batch size
    must divide evenly — a ragged final process would desynchronize the
    SPMD step."""
    count = jax.process_count() if count is None else count
    if global_batch_size % count:
        raise ValueError(
            f"global batch size {global_batch_size} is not divisible by "
            f"process count {count}"
        )
    return global_batch_size // count
