"""Mesh construction: (data, model) over ICI; multi-host runs extend the
same axes over DCN via jax.distributed (one process per host, no ray —
SURVEY.md §5 distributed notes)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(tp: Optional[int] = None, dp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp is None:
        tp = n // dp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("data", "model"))


def make_train_mesh(pp: int = 1, tp: Optional[int] = None, dp: int = 1,
                    devices: Optional[Sequence] = None) -> Mesh:
    """(data, pipe, model) mesh for pipelined training
    (parallel/pipeline.py). The pipe axis is placed between data and
    model so TP stays on the innermost (fastest ICI) dimension."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp is None:
        tp = n // (dp * pp)
    assert dp * pp * tp == n, \
        f"dp({dp}) * pp({pp}) * tp({tp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, pp, tp)
    return Mesh(arr, ("data", "pipe", "model"))


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host bring-up (jax.distributed.initialize). Call once per host
    before creating the mesh; replaces the reference's ray/NCCL worker
    launch (`readme.md:32-56`)."""
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
