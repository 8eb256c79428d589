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

import contextlib
import multiprocessing as mp
import os

_WORKER_DATASET = None

# Env vars that make a child process try to claim an accelerator at
# interpreter start (e.g. this image's sitecustomize TPU registration).
# Data workers are CPU-only; scrub these so workers never touch the chip.
_ACCELERATOR_ENV = ("PALLAS_AXON_POOL_IPS", "TPU_WORKER_HOSTNAMES")


@contextlib.contextmanager
def _cpu_only_child_env():
    saved = {}
    for k in _ACCELERATOR_ENV:
        if k in os.environ:
            saved[k] = os.environ.pop(k)
    prev_platforms = os.environ.get("JAX_PLATFORMS")
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        yield
    finally:
        os.environ.update(saved)
        if prev_platforms is None:
            os.environ.pop("JAX_PLATFORMS", None)
        else:
            os.environ["JAX_PLATFORMS"] = prev_platforms


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
        with _cpu_only_child_env():
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

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
