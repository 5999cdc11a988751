"""The exactly-once commit protocol shared by every streaming
maintainer (rollups, index segments): an atomic single-file marker plus
a checkpoint-identity uuid. One implementation — a future hardening
(e.g. fsync before replace) must not have to find its copies.

- ``stream_id`` drops a uuid next to the Structured Streaming
  checkpoint on first run; maintainers record it in their marker so a
  lost/replaced checkpoint (whose batch ids restart at 0 and would
  silently skip or double-fold) is DETECTED and raises.
- ``commit_marker`` is one ``os.replace`` — the only mutation readers
  ever see; a crash before it leaves the committed state untouched.
"""

from __future__ import annotations

import json
import os
import uuid


def stream_id(checkpoint_dir: str, filename: str) -> str:
    os.makedirs(checkpoint_dir, exist_ok=True)
    p = os.path.join(checkpoint_dir, filename)
    if not os.path.exists(p):
        with open(p, "w") as f:
            f.write(uuid.uuid4().hex)
    with open(p) as f:
        return f.read().strip()


def load_marker(state_dir: str) -> dict | None:
    p = os.path.join(state_dir, "LATEST.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def commit_marker(state_dir: str, state: dict) -> None:
    tmp = os.path.join(state_dir, "LATEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, os.path.join(state_dir, "LATEST.json"))
