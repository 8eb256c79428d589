"""Input-pipeline prefetching: overlap host prep + H2D transfer with
device compute.

The reference's only concurrency is paddle DataLoader workers (SURVEY
§2.3); here a background thread runs the (numpy) batch pipeline and
eagerly ``device_put``s ahead of the training loop, so the accelerator
never waits on augmentation/voxelization/target assignment or the
host→device copy.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

import jax


def prefetch_to_device(
    iterable: Iterable,
    size: int = 2,
    transform: Callable | None = None,
    sharding=None,
) -> Iterator:
    """Iterate ``iterable`` on a background thread, optionally apply
    ``transform`` (host-side), then ``device_put`` (with ``sharding``
    when given) ``size`` batches ahead.

    ``sharding`` may be a callable ``item -> Sharding`` for streams
    whose items need different placements (e.g. the trainer's mix of
    K-stacked scan batches and single leftover batches). Non-array
    leaves (tags such as ``("scan", batch)``) pass through untouched.
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()

    def put_tree(item, sh):
        def put(x):
            if isinstance(x, (str, bytes)) or x is None:
                return x
            return jax.device_put(x, sh) if sh is not None else (
                jax.device_put(x)
            )

        return jax.tree_util.tree_map(put, item)

    def producer():
        try:
            for item in iterable:
                if transform is not None:
                    item = transform(item)
                sh = (
                    sharding(item)
                    if callable(sharding)
                    and not isinstance(sharding, jax.sharding.Sharding)
                    else sharding
                )
                q.put(put_tree(item, sh))
        except BaseException as e:  # propagate into the consumer
            q.put(e)
            return
        q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
