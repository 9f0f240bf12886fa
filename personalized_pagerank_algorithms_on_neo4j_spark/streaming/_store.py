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


def compact_epochs(spark, store_path: str, schema: str, fold) -> int:
    """Fold every epoch partition EXCEPT the newest into one merged
    ``epoch=-1`` partition — the shared compaction routine behind the
    anomaly / temporal / HLL stores (one home for the crash-safe
    build-aside + swap protocol; the per-store difference is only the
    fold aggregate).

    ``fold`` maps the all-but-newest frame (epoch column included) to the
    merged frame WITHOUT an epoch column; the helper stamps ``epoch=-1``
    (the sentinel can never collide with a replayed epoch id; the newest
    epoch stays verbatim because only IT can replay after a restart).
    Run while the stream is stopped.  Returns the number of epoch
    partitions folded away (0 = nothing to do).

    Crash-safety: the compacted store is built at a sibling path and
    swapped in with two directory renames.  A crash between the renames
    leaves only the ``_precompact`` backup — every store entry point calls
    `recover_store` first, which restores it, so no state is ever lost
    and a double-counting mix can never form.  (On an object store,
    substitute the renames with the store's atomic move.)"""
    from pyspark.sql import functions as F

    recover_store(store_path)
    df = spark.read.schema(schema).parquet(store_path)
    epochs = [r["epoch"] for r in df.select("epoch").distinct().collect()]
    if len(epochs) <= 2:  # nothing worth folding
        return 0
    newest = max(epochs)
    merged = fold(df.where(F.col("epoch") != newest)).withColumn(
        "epoch", F.lit(-1).cast("long")
    )
    base = store_path.rstrip("/")
    tmp = base + "_compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        merged.unionByName(df.where(F.col("epoch") == newest))
        .write.mode("overwrite")
        .partitionBy("epoch")
        .parquet(tmp)
    )
    bak = base + "_precompact"
    shutil.rmtree(bak, ignore_errors=True)
    os.rename(store_path, bak)
    os.rename(tmp, store_path)
    shutil.rmtree(bak)
    return len(epochs) - 1
