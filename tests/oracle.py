"""Sequential dict-replay oracle for the CDC engine.

Replays collected change events strictly in (commit_seq, event_seq) order
in a plain Python dict — the trivially-correct semantics the distributed
engine must reproduce regardless of epoch boundaries, parallelism,
replays, or arrival order (BASELINE.json.north_star's "reference final
table state").
"""

from __future__ import annotations

import hashlib
import json


def replay(rows: list[dict]) -> dict[tuple[str, str], dict]:
    """rows: dicts with repo, path, op, commit, commit_seq, event_seq,
    payload_json. Returns {(repo, path): {"commit", payload fields...}}."""
    state: dict[tuple[str, str], dict] = {}
    for r in sorted(rows, key=lambda r: (r["commit_seq"], r["event_seq"])):
        key = (r["repo"], r["path"])
        if r["op"] == "D":
            state.pop(key, None)
        else:
            payload = json.loads(r["payload_json"]) if r["payload_json"] else {}
            state[key] = {"commit": r["commit"], **payload}
    return state


def sha256(s: str | None) -> str | None:
    if s is None:
        return None
    return hashlib.sha256(s.encode()).hexdigest()


def normalize_payload(d: dict, renames: dict[str, str]) -> dict:
    """Map old payload names to current table column names (lang->language)."""
    return {renames.get(k, k): v for k, v in d.items()}
