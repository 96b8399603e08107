"""Table IO behind a thin seam: Iceberg when the runtime jars are present,
plain parquet directories otherwise (the sandbox has no Iceberg jars; the
north_rule targets Iceberg catalogs, so all writes go through here).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def write_table(df: DataFrame, path: str, mode: str = "append", partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def is_table_identifier(spark: SparkSession, path: str) -> bool:
    """True when `path` names an existing catalog table (Iceberg deploy
    path) rather than a filesystem directory. Slash-less strings that the
    catalog does not know stay filesystem paths — a not-yet-created
    relative parquet dir must bootstrap via the parquet branch, not
    MERGE INTO a nonexistent table."""
    if "/" in path or not iceberg_available(spark):
        return False
    try:
        return spark.catalog.tableExists(path)
    except Exception:
        return False


def _recover_swap(path: str) -> None:
    """Roll the parquet-emulation directory swap forward after a crash.

    merge_expectations swaps via `path -> path.old` then `path.staging ->
    path`; a crash between the two renames leaves no live directory. The
    staging dir was fully written before the first rename began, so
    recovery completes the swap (roll FORWARD to the merged snapshot);
    with no staging dir, the backup rolls back. No-op in every healthy
    state (live dir present, or nothing present)."""
    if os.path.exists(path):
        return
    import shutil

    staging, backup = f"{path}.staging", f"{path}.old"
    if os.path.exists(staging):
        os.replace(staging, path)
        if os.path.exists(backup):
            shutil.rmtree(backup)
    elif os.path.exists(backup):
        os.replace(backup, path)


def read_table(spark: SparkSession, path: str) -> DataFrame | None:
    if is_table_identifier(spark, path):
        return spark.read.table(path)
    _recover_swap(path)
    if not os.path.exists(path):
        return None
    try:
        # the swap (or a recovery) replaces part files under the same path;
        # drop any cached listing so this read sees the current snapshot
        spark.catalog.refreshByPath(path)
        return spark.read.parquet(path)
    except Exception:
        return None


def merge_expectations(
    spark: SparkSession,
    path: str,
    write_back: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("doc_id", "algo"),
    catalog: bool | None = None,
) -> int:
    """Upsert create-semantics fingerprint rows into the expectation table —
    the engine's analog of the reference writing the hash sidecar in place
    (/root/reference/src/modules/integrity.zig:172-180).

    `catalog` disambiguates the target explicitly: True → `path` is an
    Iceberg catalog identifier (MERGE INTO when the table exists,
    writeTo().create() to bootstrap); False → always a filesystem path.
    The default None auto-detects conservatively: MERGE INTO only when the
    catalog already knows the table; a nonexistent target is NEVER
    bootstrap-created through the catalog on a guess — a relative
    filesystem path that happens to contain a dot ('expectations.parquet')
    must stay a parquet dir. Callers bootstrapping a new catalog table pass
    catalog=True.

    Catalog path → MERGE INTO (one atomic snapshot commit; the real
    10^12-doc deployment path). Otherwise: parquet emulation via read-union-overwrite with a
    staged directory swap — merged rows land in '<path>.staging', then
    `path -> path.old` / `path.staging -> path` (each rename atomic on
    POSIX). A reader never sees a partial snapshot, but between the two
    renames the live path briefly does not exist and a crash there strands
    the table — read_table/_recover_swap roll the swap forward from the
    fully-written staging dir on the next touch, so the window costs a
    retry, never the table. That window (plus non-serializable concurrent
    merges) is the documented emulation gap vs an Iceberg commit. Upsert by
    key_cols, so a crash-replay re-merge is idempotent. Returns the number
    of rows merged in.
    """
    n = write_back.count()
    if n == 0:
        return 0
    if catalog is True and not iceberg_available(spark):
        raise ValueError(
            f"catalog=True for {path!r} but no Iceberg runtime is on the classpath"
        )
    use_catalog = catalog if catalog is not None else is_table_identifier(spark, path)
    if use_catalog and is_table_identifier(spark, path):
        write_back.createOrReplaceTempView("_write_back_src")
        on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
        spark.sql(
            f"MERGE INTO {path} t USING _write_back_src s ON {on} "
            "WHEN MATCHED THEN UPDATE SET t.expected_hash = s.expected_hash "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        return n
    if use_catalog:
        # explicit catalog=True and the table does not exist yet:
        # bootstrap it as an Iceberg table
        write_back.writeTo(path).create()
        return n
    _recover_swap(path)
    existing = read_table(spark, path)
    if existing is None:
        write_table(write_back, path, mode="overwrite")
        return n
    keep = existing.join(
        write_back.select(*key_cols).dropDuplicates(list(key_cols)),
        list(key_cols),
        "left_anti",
    )
    merged = keep.unionByName(write_back.select(*existing.columns))
    staging = f"{path}.staging"
    write_table(merged, staging, mode="overwrite")
    backup = f"{path}.old"
    import shutil

    if os.path.exists(backup):
        shutil.rmtree(backup)
    os.replace(path, backup)
    os.replace(staging, path)
    shutil.rmtree(backup)
    # drop the session's cached file listing for the path — any LATER read
    # must see the new snapshot, not the pre-swap part files (plans built
    # BEFORE the merge are the caller's responsibility to re-read; the
    # runner merges only after its last read of the old snapshot)
    spark.catalog.refreshByPath(path)
    return n
