"""Metrics logging: stdout lines + CSV files.

Replaces the reference's Visdom plots (/root/reference/utils/visualize.py)
with a dependency-free CSV logger (one file per plot group) that accepts the
same (x, y, key, line_name) call shape, so entry points read like the
reference while producing artifacts any dashboard can ingest.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, directory: Optional[str] = None, enable: bool = True):
        self.dir = directory
        self.enable = enable and directory is not None
        self._files = {}
        if self.enable:
            os.makedirs(directory, exist_ok=True)

    def line_plot(self, x, y, key: str, line_name: str):
        if not self.enable:
            return
        fname = key.replace(" ", "_").replace("/", "_") + ".csv"
        path = os.path.join(self.dir, fname)
        new = not os.path.exists(path)
        f = self._files.get(path)
        if f is None:
            f = open(path, "a", newline="")
            self._files[path] = f
        w = csv.writer(f)
        if new:
            w.writerow(["time", "x", "line", "y"])
        w.writerow([f"{time.time():.1f}", x, line_name, float(y)])
        f.flush()

    def add_text(self, text: str):
        if not self.enable:
            return
        with open(os.path.join(self.dir, "notes.txt"), "a") as f:
            f.write(text + "\n")

    def close(self):
        for f in self._files.values():
            f.close()
        self._files = {}
