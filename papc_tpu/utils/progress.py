"""Terminal progress bar (reference ``libs/tools/progress_bar.py``)."""

from __future__ import annotations

import sys
import time


def progress_bar_iter(iterable, total=None, width: int = 40, out=sys.stdout):
    """Wrap an iterable with an in-place progress bar."""
    if total is None:
        try:
            total = len(iterable)
        except TypeError:
            total = None
    start = time.time()
    for i, item in enumerate(iterable):
        yield item
        done = i + 1
        elapsed = time.time() - start
        if total:
            frac = done / total
            fill = int(width * frac)
            bar = "#" * fill + "-" * (width - fill)
            rate = done / max(elapsed, 1e-9)
            eta = (total - done) / max(rate, 1e-9)
            out.write(
                f"\r[{bar}] {done}/{total} "
                f"{rate:.1f} it/s eta {eta:.0f}s"
            )
        else:
            out.write(f"\r{done} it, {elapsed:.0f}s")
        out.flush()
    out.write("\n")


list_bar = progress_bar_iter
