"""Structured per-frame metrics stream (JSONL) + verbosity-levelled log.

Semantic reference: the reference's per-frame console chatter and
`Tracking::PrintTimeStats` aggregate dump (`tracking.cpp:252`) and the
`basics::Config`-driven verbosity; production serving wants a machine-
readable stream instead — one JSON object per frame, appendable to a
rotating file, cheap enough to leave on (host-side only; never syncs the
device).
"""

from __future__ import annotations

import json
import sys
import time
from typing import IO, Optional


class MetricsStream:
    """Append-only JSONL metrics writer.

    Usage:
        ms = MetricsStream(open("run.jsonl", "w"), verbosity=1)
        ms.frame(frame_id=7, state="OK", n_inliers=123, ...)
        ms.event("loop_closed", kf=41, cand=9)
    verbosity: 0 = events only, 1 = + per-frame records, 2 = + echo to
    stderr (debug).
    """

    def __init__(self, sink: Optional[IO] = None, verbosity: int = 1):
        self.sink = sink
        self.verbosity = verbosity
        self._t0 = time.time()

    def _emit(self, obj: dict) -> None:
        obj["t_wall"] = round(time.time() - self._t0, 4)
        line = json.dumps(obj, separators=(",", ":"))
        if self.sink is not None:
            self.sink.write(line + "\n")
        if self.verbosity >= 2:
            print(line, file=sys.stderr)

    def frame(self, **fields) -> None:
        if self.verbosity >= 1:
            self._emit({"kind": "frame", **fields})

    def event(self, name: str, **fields) -> None:
        self._emit({"kind": "event", "event": name, **fields})

    def close(self) -> None:
        if self.sink is not None:
            self.sink.flush()
