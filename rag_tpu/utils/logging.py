"""Structured metric logging.

The reference logs through TensorBoard SummaryWriter + bare prints
(src/run.py:91, rag.py:135-143). Here: a JSONL event stream (machine
readable, no torch dependency) with the same scalar namespaces, plus
optional stdout echo. TensorBoard users can convert the JSONL offline.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricWriter:
    def __init__(self, log_dir: Optional[str] = None, echo: bool = False):
        self.echo = echo
        self.fh = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self.fh = open(os.path.join(log_dir, "events.jsonl"), "a")

    def scalars(self, tag: str, values: Dict[str, float], step: int = 0):
        rec = {"ts": time.time(), "tag": tag, "step": step,
               "values": {k: float(v) for k, v in values.items()}}
        if self.fh:
            self.fh.write(json.dumps(rec) + "\n")
            self.fh.flush()
        if self.echo:
            print(f"{tag}[{step}]: {rec['values']}")

    def text(self, tag: str, value: str, step: int = 0):
        rec = {"ts": time.time(), "tag": tag, "step": step, "text": value}
        if self.fh:
            self.fh.write(json.dumps(rec) + "\n")
            self.fh.flush()
        if self.echo:
            print(f"{tag}[{step}]: {value}")

    def close(self):
        if self.fh:
            self.fh.close()
            self.fh = None
