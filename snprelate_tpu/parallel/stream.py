"""Host-side prefetch pipeline: the analog of the reference's
double-buffered background reader (CGenoReadBySNP, dGenGWAS.cpp:1283-1397).

A background thread runs the native codec (decode + subset + repack) and
host->device transfer for the NEXT chunk while the device computes on the
current one. ctypes codec calls and jax transfers release the GIL, so a
single prefetch thread overlaps both with dispatch.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetch(it: Iterable[T], depth: int = 2) -> Iterator[T]:
    """Iterate `it` on a background thread, keeping up to `depth` items
    ready. Exceptions propagate to the consumer."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    err: list[BaseException] = []

    def worker():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:  # noqa: BLE001
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item


def device_chunks(ws, chunk: int, n_pad: int, depth: int = 2,
                  start_chunk: int = 0):
    """Prefetched device-resident packed chunks for the pairwise engines.
    ``start_chunk`` skips already-processed chunks on checkpoint resume."""
    import jax

    def gen():
        for _start, packed in ws.packed_chunks(chunk, pad_bytes=n_pad // 4,
                                               start_chunk=start_chunk):
            yield jax.device_put(packed)

    return prefetch(gen(), depth=depth)
