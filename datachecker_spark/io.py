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


def read_table(spark: SparkSession, path: str) -> DataFrame | None:
    if not os.path.exists(path):
        return None
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def merge_expectations(
    spark: SparkSession,
    path: str,
    write_back: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("doc_id", "algo"),
) -> int:
    """Upsert create-semantics fingerprint rows into the expectation table —
    the engine's analog of the reference writing the hash sidecar in place
    (/root/reference/src/modules/integrity.zig:172-180).

    Iceberg runtime present and `path` is a catalog table identifier →
    MERGE INTO (one atomic snapshot commit; the real 10^12-doc deployment
    path). Otherwise: parquet emulation via read-union-overwrite with a
    staged directory swap — merged rows land in '<path>.staging', which is
    then renamed over the live directory (os.replace is atomic per entry on
    POSIX; the brief window where a concurrent reader can see the old
    snapshot but never a partial one is the documented emulation gap vs an
    Iceberg commit). Upsert by key_cols, so a crash-replay re-merge is
    idempotent. Returns the number of rows merged in.
    """
    n = write_back.count()
    if n == 0:
        return 0
    looks_like_table = "/" not in path and not os.path.exists(path)
    if iceberg_available(spark) and looks_like_table:
        write_back.createOrReplaceTempView("_write_back_src")
        on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
        spark.sql(
            f"MERGE INTO {path} t USING _write_back_src s ON {on} "
            "WHEN MATCHED THEN UPDATE SET t.expected_hash = s.expected_hash "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        return n
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
