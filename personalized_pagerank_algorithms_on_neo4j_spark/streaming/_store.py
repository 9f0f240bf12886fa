"""Crash recovery for swap-replaced store directories.

`anomaly_stream.compact_store` and `topk_stream.migrate_legacy_store`
replace a store with a rebuilt copy via two directory renames:

    os.rename(store, store + "_precompact")   # (1)
    os.rename(tmp, store)                     # (2)

A crash between (1) and (2) leaves NO directory at the store path — a
stream restarted against it would silently recreate the store from a
single epoch, dropping all historical totals. `recover_store` closes that
window: every write/read/compact entry point calls it first, and if the
store is missing but a backup from an interrupted swap exists, the backup
is renamed back into place (and any half-trusted replacement discarded —
the backup is always the conservative choice: identical data, just
uncompacted/unmigrated, so the interrupted operation can simply be rerun).
"""

from __future__ import annotations

import os
import shutil

# (backup suffix, in-progress replacement suffix) per swap operation
_SWAP_SUFFIXES = [
    ("_precompact", "_compacting"),
    ("_premigrate", "_migrating"),
]


def recover_store(store_path: str) -> str | None:
    """Restore `store_path` from an interrupted-swap backup if it is missing.

    Returns the backup suffix that was restored, or None if the store was
    present (or there was nothing to restore — a genuinely fresh store).
    """
    if os.path.exists(store_path):
        return None
    base = store_path.rstrip("/")
    for bak_suffix, tmp_suffix in _SWAP_SUFFIXES:
        bak = base + bak_suffix
        if os.path.exists(bak):
            shutil.rmtree(base + tmp_suffix, ignore_errors=True)
            os.rename(bak, store_path)
            return bak_suffix
    return None
