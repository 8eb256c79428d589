"""Multiprocess sample preparation (spawn-based).

Design constraints this solves (found in review):
  * ``spawn`` start method — never forks a process that has initialized
    the JAX/TPU runtime (fork after backend init can deadlock);
  * the dataset is shipped to each worker ONCE via the pool initializer
    (a global in the worker), not pickled per task;
  * tasks are plain ``(epoch, idx)`` tuples; each call reseeds the
    dataset's stochastic components per (base_seed, epoch, idx) so
    results are deterministic for any worker count.
"""

from __future__ import annotations

import multiprocessing as mp
import os

_WORKER_DATASET = None

# Env vars that make a child process try to claim an accelerator at
# interpreter start (e.g. this image's sitecustomize TPU registration).
# Data workers are CPU-only; scrub these so workers never touch the chip.
_ACCELERATOR_ENV = ("PALLAS_AXON_POOL_IPS", "TPU_WORKER_HOSTNAMES")


def _scrub_accelerator_env():
    """Remove accelerator-claiming env vars; returns the restore map.

    The scrub must stay in effect for the POOL'S LIFETIME (not just
    construction): mp.Pool respawns crashed workers later, and a respawn
    under the original env would claim the TPU at interpreter start."""
    saved = {}
    for k in _ACCELERATOR_ENV:
        if k in os.environ:
            saved[k] = os.environ.pop(k)
    saved["__JAX_PLATFORMS__"] = os.environ.get("JAX_PLATFORMS")
    os.environ["JAX_PLATFORMS"] = "cpu"
    return saved


def _restore_env(saved):
    prev = saved.pop("__JAX_PLATFORMS__", None)
    os.environ.update(saved)
    if prev is None:
        os.environ.pop("JAX_PLATFORMS", None)
    else:
        os.environ["JAX_PLATFORMS"] = prev


def _init_worker(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _fetch(task):
    epoch, idx = task
    ds = _WORKER_DATASET
    ds.set_epoch(epoch)
    return ds[idx]


class SamplePool:
    """Process pool mapping dataset indices → prepared samples."""

    def __init__(self, dataset, num_workers: int):
        ctx = mp.get_context("spawn")
        self._saved_env = _scrub_accelerator_env()
        self._pool = ctx.Pool(
            num_workers, initializer=_init_worker, initargs=(dataset,)
        )

    def imap(self, epoch: int, indices):
        return self._pool.imap(
            _fetch, [(epoch, int(i)) for i in indices], chunksize=1
        )

    def close(self):
        self._pool.terminate()
        self._pool.join()
        if self._saved_env is not None:
            _restore_env(self._saved_env)
            self._saved_env = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
