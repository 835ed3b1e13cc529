"""Host-to-device transfer prefetch for streaming training loops.

A streaming loop that calls ``trainer.step(host_batch)`` serializes the
host-to-device copy with the step dispatch: the accelerator idles during
every transfer. ``jax.device_put`` is asynchronous, so placing the NEXT
batch while the CURRENT step executes hides the copy entirely — the
classic double-buffer. On a directly-attached TPU the copy is a small
fraction of a ~ms step; through a network-tunneled device (the dev
environment's relay) it can exceed the step by orders of magnitude,
which is how the round-3 paper run spent 98% of its streamed wall-clock
on transfers.

The reference's tf.data pipeline gets the same effect from
``prefetch_to_device`` at the end of its input pipeline
(/root/reference/nif/data/tfr_dataset.py builds a plain ``tf.data``
iterator; Keras' ``fit`` inserts the device prefetch); this module is the
explicit JAX equivalent for the library's custom streaming loops.
"""
from __future__ import annotations

import collections
import itertools

import numpy as np

from ..parallel.mesh import put_batch_tuple

__all__ = ["prefetch_to_device"]


def prefetch_to_device(iterator, size: int = 2, mesh=None):
    """Yield items from ``iterator`` with numpy-array elements already
    transferred to device, keeping up to ``size`` items in flight.

    Items must be tuples (as yielded by ``ShardedDataset.iter_batches`` /
    ``GroupedDataset.iter_batches``). Elements that are numpy arrays are
    placed with the trainers' own batch-staging rule — sharded over the
    mesh batch axes when ``mesh`` is given, plain device arrays otherwise
    — so a downstream ``trainer.step`` call finds them already resident
    and skips its own transfer. Non-array elements (epoch counters,
    ``None`` weights) pass through untouched.

    ``size=2`` is the double-buffer: one batch being consumed, one in
    flight. Larger sizes only help when transfer time fluctuates.
    """
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    it = iter(iterator)
    q: collections.deque = collections.deque()

    def place(item):
        arrays = tuple(
            a if isinstance(a, np.ndarray) else None for a in item
        )
        placed = put_batch_tuple(arrays, mesh)
        return tuple(
            p if a is not None else orig
            for p, a, orig in zip(placed, arrays, item)
        )

    def fill(n):
        for item in itertools.islice(it, n):
            q.append(place(item))

    fill(size)
    while q:
        out = q.popleft()
        fill(1)
        yield out
