"""Host-side JSONL metrics logging (SURVEY.md §5 metrics/observability:
lightweight metrics dicts returned from jitted steps, logged line-per-step
on the host)."""

from __future__ import annotations

import json
import os
import time
from typing import Any, Mapping


class JSONLLogger:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self._f = open(path, "a", buffering=1)

    def log(self, metrics: Mapping[str, Any], **extra):
        rec = {"time": time.time(), **metrics, **extra}
        self._f.write(json.dumps(rec, default=float) + "\n")

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
