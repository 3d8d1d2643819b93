"""Append-only results ledger (the reference's results.jsonl protocol,
main_pq.py:163-165, 405-407: every run appends scores + full config)."""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict


def append_result(path: str | Path, record: Dict[str, Any]) -> None:
    rec = {"ts": time.time(), **record}
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    with p.open("a") as f:
        f.write(json.dumps(rec, default=str) + "\n")


def read_results(path: str | Path):
    p = Path(path)
    if not p.exists():
        return []
    return [json.loads(line) for line in p.read_text().splitlines() if line.strip()]
