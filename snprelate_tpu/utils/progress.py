"""Progress reporting (analog of CdProgression / CProgress,
dGenGWAS.cpp:1111-1215, 1543-1640): percent + ETA lines on stdout when
verbose, fed by the chunk streamers."""

from __future__ import annotations

import sys
import time


class Progress:
    def __init__(self, total: int, verbose: bool = True, label: str = "",
                 min_interval: float = 5.0):
        self.total = max(int(total), 1)
        self.count = 0
        self.verbose = verbose
        self.label = label
        self.min_interval = min_interval
        self.start = time.time()
        self._last = self.start
        self._last_pct = -1

    def forward(self, k: int = 1):
        self.count += k
        if not self.verbose:
            return
        now = time.time()
        pct = int(100 * self.count / self.total)
        if pct >= 100 or (now - self._last >= self.min_interval
                          and pct > self._last_pct):
            elapsed = now - self.start
            rate = self.count / elapsed if elapsed > 0 else 0
            eta = (self.total - self.count) / rate if rate > 0 else 0
            sys.stdout.write(
                f"{self.label}{pct}%, {time.strftime('%H:%M:%S')}, "
                f"ETA {eta:.0f}s\n")
            sys.stdout.flush()
            self._last = now
            self._last_pct = pct

    def done(self):
        if self.verbose:
            sys.stdout.write(
                f"{self.label}100%, elapsed {time.time()-self.start:.1f}s\n")
            sys.stdout.flush()
