"""Epoch checkpoint markers — exactly-once replay for the apply loop.

The reference's only state is a @Stateful LOCAL map holding the rule-zip
name + lastModified (reference: ExecuteRuleEngine.java:108,315-322) — a
config epoch, not a data checkpoint. The target needs real exactly-once:
a marker file per applied epoch, written atomically AFTER the snapshot
commit. Crash windows:

  * crash before snapshot commit   -> replay re-runs the merge (no state yet)
  * crash after commit, before marker -> replay re-runs the merge; the
    LWW-vs-state rule in IceliteTable.merge makes it byte-identical
  * marker present -> epoch skipped entirely

So replay from ANY point reconverges to the identical table state
(BASELINE.json.north_star).
"""

from __future__ import annotations

from typing import Any

from . import fsio


class CheckpointLog:
    def __init__(self, path: str):
        self.path = path
        fsio.makedirs(path)

    def _marker(self, epoch: int | str) -> str:
        return fsio.join(self.path, f"epoch_{epoch}.json")

    def is_committed(self, epoch: int | str) -> bool:
        return fsio.exists(self._marker(epoch))

    def commit(self, epoch: int | str, info: dict[str, Any]) -> None:
        """``epoch`` may be an int (batch changelog epoch) or a namespaced
        string key (e.g. 'stream_3') — string keys never collide with the
        batch epoch namespace and are invisible to ``pending()``."""
        fsio.write_json_atomic(self._marker(epoch), {"epoch": epoch, **info})

    def committed_epochs(self) -> list[int]:
        """Batch (integer) epochs only — namespaced string markers are a
        separate keyspace and do not affect batch pending-epoch discovery."""
        out = []
        for fn in fsio.listdir(self.path):
            if fn.startswith("epoch_") and fn.endswith(".json"):
                key = fn[len("epoch_") : -len(".json")]
                if key.lstrip("-").isdigit():
                    out.append(int(key))
        return sorted(out)

    def info(self, epoch: int | str) -> dict:
        return fsio.read_json(self._marker(epoch))

    def pending(self, all_epochs: list[int]) -> list[int]:
        done = set(self.committed_epochs())
        return [e for e in sorted(all_epochs) if e not in done]
