"""Host-side JSONL metrics logging (SURVEY.md §5 metrics/observability:
lightweight metrics dicts returned from jitted steps, logged line-per-step
on the host)."""

from __future__ import annotations

import json
import os
import time
from typing import Any, Mapping


def _jsonable(x):
    """Serializer fallback: scalars via float, arrays via tolist — a
    multi-element array under plain default=float raised 'only size-1
    arrays can be converted' from INSIDE the logging call, aborting the
    training loop it was observing."""
    if hasattr(x, "tolist"):
        return x.tolist()
    return float(x)


class JSONLLogger:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self._f = open(path, "a", buffering=1)

    def log(self, metrics: Mapping[str, Any], **extra):
        rec = {"time": time.time(), **metrics, **extra}
        self._f.write(json.dumps(rec, default=_jsonable) + "\n")

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
