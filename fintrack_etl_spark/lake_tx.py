"""Atomic multi-version parquet tables — a minimal commit log.

Semantics modeled on the PUBLIC Delta/Iceberg commit protocols: all
data for version N is fully written into its own immutable directory
``v{N:08d}/`` BEFORE one atomic pointer swap (``os.replace`` of the
``_latest`` manifest file) makes it visible. Consequences:

- a reader resolves the manifest once, then reads only that version's
  directory — it can never observe a half-written table state;
- a crash anywhere before the swap leaves the previous version intact
  (the orphaned directory is invisible and gets clobbered/vacuumed);
- streaming replay is exactly-once: the manifest records the last
  applied ``batch_id`` at the SAME commit point as the data, closing
  the two-statement commit-gap the catalog-table sinks document
  (``streaming/pipelines.py``);
- MERGE never reads the directory it writes (vN in, vN+1 out), so the
  self-overwrite ``localCheckpoint`` pin is unnecessary here.

Commit-point atomicity relies on atomic rename, which POSIX local
filesystems and HDFS (``FileContext.rename(OVERWRITE)``) provide; on
S3-like stores use a real table format — this module is the honest
fallback for environments without the Iceberg/Delta jars. Reference
semantics covered: MERGE (``datatrack_spark_utils.py:306-362``),
row-level DELETE + append (``forms_main.py:395-423``), snapshot expiry
(``datatrack_spark_utils.py:756-768``).

Scale notes: the manifest is one tiny JSON file — no listing, no
eventual consistency on the read path; version directories are normal
parquet tables, so partitioned/bucketed layouts, predicate pushdown
and AQE all apply unchanged. Expiry cost is proportional to files
deleted, never to table size.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_latest"


def _manifest_path(root: str) -> str:
    return os.path.join(root, MANIFEST)


def _version_dir(root: str, version: int) -> str:
    return os.path.join(root, f"v{version:08d}")


def read_manifest(root: str) -> dict | None:
    """The committed state, or None if no commit ever succeeded."""
    try:
        with open(_manifest_path(root), encoding="utf-8") as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def table_exists(root: str) -> bool:
    return read_manifest(root) is not None


def current_version(root: str) -> int:
    m = read_manifest(root)
    return m["version"] if m else 0


def last_batch_id(root: str) -> int:
    """Last streaming batch folded into the table (-1 = none)."""
    m = read_manifest(root)
    b = m.get("batch_id") if m else None
    return -1 if b is None else int(b)


def read_table(spark: SparkSession, root: str, version: int | None = None) -> DataFrame:
    """Read the current committed version — or, with ``version``, TIME
    TRAVEL to any still-retained snapshot (immutable version dirs make
    every un-vacuumed state readable forever, the same contract as
    Delta's ``versionAsOf``/Iceberg's snapshot reads)."""
    m = read_manifest(root)
    if m is None:
        raise FileNotFoundError(f"no committed version at {root}")
    if version is None:
        version = m["version"]
    elif version > m["version"]:
        raise ValueError(f"version {version} not committed (current {m['version']})")
    elif not os.path.isdir(_version_dir(root, version)):
        raise FileNotFoundError(
            f"version {version} was vacuumed (expire_versions); retained max is {m['version']}"
        )
    return spark.read.parquet(_version_dir(root, version))


def table_changes(
    spark: SparkSession,
    root: str,
    from_version: int,
    to_version: int | None = None,
    keys: list[str] | None = None,
) -> DataFrame:
    """Change-data-feed between two retained snapshots (the public
    Delta CDF idea over the commit log): every output row carries
    ``_change_type``.

    Whole-row mode (``keys=None``): rows only in ``to`` are ``insert``,
    rows only in ``from`` are ``delete`` (a modified row appears as a
    delete + insert pair). Keyed mode: a key present on both sides
    whose row changed becomes ``update_postimage`` (one row, the new
    image); key-only-in-``to`` is ``insert``; key-only-in-``from`` is
    ``delete`` (the old image).

    Plan shape: two scans + one shuffle each side (the except/join is
    on the full row hash / the keys); at 100 TB you run this per
    ingest window, not per query — it is the replication feed, not a
    hot-path operator."""
    old = read_table(spark, root, from_version)
    new = read_table(spark, root, to_version)
    cols = new.columns
    if keys is None:
        ins = new.exceptAll(old).select(*cols, F.lit("insert").alias("_change_type"))
        dels = old.exceptAll(new).select(*cols, F.lit("delete").alias("_change_type"))
        return ins.unionByName(dels)
    non_keys = [c for c in cols if c not in keys]
    o = old.select(*cols)
    # presence markers: NULL-safe — a key that exists with all-NULL data
    # columns must still read as present on its side
    new_m = new.select(*keys).withColumn("__in_new", F.lit(True))
    old_m = o.select(*keys).withColumn("__in_old", F.lit(True))
    both = (
        new.alias("n")
        .join(old_m, keys, "left")
        .join(old.alias("o"), keys, "left")
        .filter(F.col("__in_old").isNotNull())
    )
    changed = both.filter(
        ~F.struct(*[F.col(f"n.{c}") for c in non_keys]).eqNullSafe(
            F.struct(*[F.col(f"o.{c}") for c in non_keys])
        )
    ).select(*[F.col(f"n.{c}") for c in cols], F.lit("update_postimage").alias("_change_type"))
    inserts = (
        new.join(old_m, keys, "left_anti")
        .select(*cols, F.lit("insert").alias("_change_type"))
    )
    deletes = (
        o.join(new_m, keys, "left_anti")
        .select(*cols, F.lit("delete").alias("_change_type"))
    )
    return inserts.unionByName(changed).unionByName(deletes)


def commit_table(df: DataFrame, root: str, batch_id: int | None = None) -> int:
    """Write ``df`` as the next version and atomically publish it.

    The parquet write happens entirely inside the (invisible) new
    version directory; the single ``os.replace`` of the manifest is
    the commit point. A crashed earlier attempt may have left a
    partial directory for the same version — it was never visible, and
    ``mode("overwrite")`` clobbers it before this attempt publishes.
    """
    os.makedirs(root, exist_ok=True)
    n = current_version(root) + 1
    df.write.mode("overwrite").parquet(_version_dir(root, n))
    tmp = os.path.join(root, f".{MANIFEST}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"version": n, "batch_id": batch_id}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _manifest_path(root))  # THE commit point
    return n


def compact_table(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = 128 << 20,
    cluster_by: list[str] | None = None,
    batch_id: int | None = None,
) -> tuple[int, int, int]:
    """Small-file compaction — the Delta ``OPTIMIZE`` / Iceberg
    ``rewrite_data_files`` maintenance op over the commit log: rewrite
    the current version's data into ``ceil(bytes / target)`` files and
    publish it as a new (value-identical) version. Readers of the old
    version are undisturbed (immutable dirs); expiry reclaims it later.

    Streaming sinks and per-batch merges leave a file per micro-batch
    per partition; at 100 TB the resulting footer/open overhead — not
    the bytes — dominates scan cost, which is why every real table
    format ships this op (reference gap: its Iceberg conf sets
    ``write.target-file-size-bytes`` but nothing ever rewrites).

    ``cluster_by=None`` → ``coalesce`` (pure file merge, NO shuffle —
    each output task concatenates input splits). With ``cluster_by`` →
    ``repartitionByRange + sortWithinPartitions`` (one range shuffle)
    so compaction doubles as sort-clustering and the parquet footer
    min/max become selective on those columns (file skipping, same
    contract as ``operators/layout.py``).

    Size probing walks the local version dir (`os.walk`); on a real
    DFS swap in the Hadoop FileSystem ``getContentSummary`` — the
    planning logic is unchanged. Returns
    ``(new_version, n_files_before, n_files_after)``."""
    m = read_manifest(root)
    if m is None:
        raise FileNotFoundError(f"no committed version at {root}")
    vdir = _version_dir(root, m["version"])
    data_files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(vdir)
        for f in fs
        if f.endswith(".parquet")
    ]
    total_bytes = sum(os.path.getsize(f) for f in data_files)
    n_out = max(1, -(-total_bytes // max(1, target_file_bytes)))
    df = spark.read.parquet(vdir)
    if cluster_by:
        df = df.repartitionByRange(n_out, *cluster_by).sortWithinPartitions(*cluster_by)
    else:
        df = df.coalesce(n_out)
    n = commit_table(df, root, batch_id if batch_id is not None else m.get("batch_id"))
    n_after = sum(
        1
        for dp, _, fs in os.walk(_version_dir(root, n))
        for f in fs
        if f.endswith(".parquet")
    )
    return n, len(data_files), n_after


def expire_versions(root: str, retain_last: int = 1) -> list[int]:
    """Vacuum old snapshots (D5,
    ``datatrack_spark_utils.py:756-768``): delete committed version
    directories older than the newest ``retain_last``; the current
    version always survives. Uncommitted (future-numbered) directories
    are left alone — a concurrent commit may be writing one.

    Returns the versions removed."""
    if retain_last < 1:
        raise ValueError("retain_last must be >= 1")
    cur = current_version(root)
    removed = []
    for name in sorted(os.listdir(root)):
        if name.startswith("v") and name[1:].isdigit():
            ver = int(name[1:])
            if ver <= cur - retain_last:
                shutil.rmtree(os.path.join(root, name))
                removed.append(ver)
    return removed


# ---------------------------------------------------------------------------
# Versioned faces of the mutable-table operators
# ---------------------------------------------------------------------------


def merge_latest_wins_versioned(
    spark: SparkSession,
    root: str,
    source: DataFrame,
    keys: list[str],
    order_col: str,
    tie_breakers: list[str] | None = None,
    batch_id: int | None = None,
    evolve: bool = False,
) -> int:
    """J3 MERGE with a real commit point: read vN, merge, publish vN+1.
    First commit seeds the table with the deduped source. With
    ``evolve=True`` a source carrying new columns widens the committed
    schema (NULL backfill on historical rows — the reference's
    ``evoluir_schema`` + merge flow, ``datatrack_spark_utils.py:
    221-302,306-362``); without it, schema drift raises at the union
    rather than silently dropping columns."""
    from .operators.upsert import merge_latest_wins, merge_latest_wins_evolving
    from .operators.windows import dedup_latest

    if table_exists(root):
        op = merge_latest_wins_evolving if evolve else merge_latest_wins
        merged = op(read_table(spark, root), source, keys, order_col, tie_breakers)
    else:
        merged = dedup_latest(source, keys, order_col, tie_breakers)
    return commit_table(merged, root, batch_id)


def replace_by_source_key_versioned(
    spark: SparkSession,
    root: str,
    source: DataFrame,
    lineage_key: str = "landing_object_key",
    batch_id: int | None = None,
) -> int:
    """D2 per-file reload with a real commit point — re-running the
    same input converges to identical committed state."""
    from .operators.upsert import replace_by_source_key

    if table_exists(root):
        out = replace_by_source_key(read_table(spark, root), source, lineage_key)
    else:
        out = source
    return commit_table(out, root, batch_id)


def upsert_sink_stream_versioned(
    stream: DataFrame,
    checkpoint_dir: str,
    root: str,
    keys: list[str],
    order_col: str,
    tie_breakers: list[str] | None = None,
):
    """Streaming latest-wins sink with exactly-once COMMITS: the
    manifest's batch_id and the data publish at the same atomic
    rename, so a batch replayed after any crash is either (a) fully
    committed already — detected and skipped — or (b) never visible —
    re-merged from the same deterministic inputs. No commit-point gap.

    Returns the started query; callers ``awaitTermination()``."""
    from .operators.windows import dedup_latest

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= last_batch_id(root):
            return  # already committed — checkpoint replay
        if batch_df.isEmpty():
            return
        incoming = dedup_latest(batch_df, keys, order_col, tie_breakers)
        merge_latest_wins_versioned(
            batch_df.sparkSession, root, incoming, keys, order_col, tie_breakers, batch_id
        )

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def continuous_aggregate_stream_versioned(
    stream: DataFrame,
    checkpoint_dir: str,
    root: str,
    keys: list[str],
    value_col: str,
):
    """Continuous aggregate with exactly-once COMMITS. The sum-merge is
    not idempotent, so this is where the atomic (data, batch_id) commit
    matters most: the catalog-table variant documents a double-count
    window between its state and meta writes — here that window does
    not exist. Checkpoint-reset detection mirrors
    ``streaming.continuous_aggregate_stream``.

    Returns the started query; callers ``awaitTermination()``."""
    from .operators.incremental import merge_aggregate_state, partial_aggregate

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        last = last_batch_id(root)
        if batch_id == last:
            return  # committed already — checkpoint replay
        if batch_id < last:
            raise RuntimeError(
                f"continuous_aggregate_stream_versioned({root}): batch_id "
                f"{batch_id} < committed {last} — checkpoint was reset while "
                "the table survived; refusing to skip or double-count."
            )
        spark = batch_df.sparkSession
        delta = partial_aggregate(batch_df, keys, value_col)
        state = (
            merge_aggregate_state(read_table(spark, root), delta, keys)
            if table_exists(root)
            else delta
        )
        commit_table(state, root, batch_id)

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


class CommitConflictError(RuntimeError):
    """Another writer published a version between this transaction's
    snapshot read and its commit attempt."""


def commit_table_cas(
    df: DataFrame,
    root: str,
    expected_version: int,
    batch_id: int | None = None,
    lock_timeout_s: float = 30.0,
) -> int:
    """Optimistic-concurrency commit: publish ``df`` as the next
    version ONLY if the table still points at ``expected_version``
    (the version this transaction read its inputs from). Two writers
    that raced from the same snapshot cannot both win — the loser gets
    :class:`CommitConflictError` and must re-derive from the new
    current version and retry (the standard Iceberg/Delta OCC loop).

    Mechanics: the parquet write goes to a UNIQUE staging directory —
    never the deterministic ``v{n}`` path, which a slow losing writer
    would otherwise clobber AFTER the winner published it. Under the
    ``O_CREAT|O_EXCL`` lock (atomic on POSIX/HDFS; a conditional PUT /
    DynamoDB mutex on S3-class stores, as the commit-point note at the
    top of this module says) the current version is re-read, the next
    version number assigned, the staging dir renamed into place, and
    the manifest swapped — so the loser's data never touches a
    published path. A lock older than ``lock_timeout_s`` is presumed
    abandoned by a crashed writer and broken — versions are immutable
    and the manifest swap is atomic, so breaking a stale lock can
    duplicate no data; the worst case is two writers racing the SAME
    stale lock, which collapses back to the plain last-replace-wins
    window the timeout makes arbitrarily unlikely.
    """
    os.makedirs(root, exist_ok=True)
    cur = current_version(root)
    if cur != expected_version:
        raise CommitConflictError(
            f"{root}: expected version {expected_version}, found {cur}"
        )
    staging = os.path.join(root, f".stage-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    return _publish_staged(root, staging, expected_version, batch_id, lock_timeout_s)


def _publish_staged(
    root: str,
    staging: str,
    expected_version: int,
    batch_id: int | None = None,
    lock_timeout_s: float = 30.0,
) -> int:
    """The pure-filesystem critical section of :func:`commit_table_cas`
    — lock acquisition with stale-lock break, version re-check, atomic
    staging→version rename, and the manifest swap commit point. Split
    out so multi-process contention tests can hammer the REAL
    machinery (tests/test_lake_tx.py) without one Spark session per
    writer; the staged directory's contents are opaque here."""
    import time

    lock = os.path.join(root, "_commit.lock")
    deadline = time.time() + lock_timeout_s
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            try:
                age = time.time() - os.path.getmtime(lock)
            except FileNotFoundError:
                continue  # holder just released; retry immediately
            if age > lock_timeout_s:
                try:
                    os.unlink(lock)  # break a crashed writer's lock
                except FileNotFoundError:
                    pass
                continue
            if time.time() > deadline:
                shutil.rmtree(staging, ignore_errors=True)
                raise TimeoutError(f"commit lock busy at {root}")
            time.sleep(0.05)
    try:
        if current_version(root) != expected_version:
            raise CommitConflictError(
                f"{root}: version advanced past {expected_version} during commit"
            )
        n = expected_version + 1
        vdir = _version_dir(root, n)
        # a crashed earlier attempt may have left a partial dir for this
        # never-published version; it was never visible
        shutil.rmtree(vdir, ignore_errors=True)
        os.replace(staging, vdir)
        tmp = os.path.join(root, f".{MANIFEST}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"version": n, "batch_id": batch_id}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, _manifest_path(root))  # THE commit point
    finally:
        os.close(fd)
        try:
            os.unlink(lock)
        except FileNotFoundError:
            pass
        shutil.rmtree(staging, ignore_errors=True)  # no-op after rename
    return n


def delete_rows(
    spark: SparkSession,
    root: str,
    predicate,
    batch_id: int | None = None,
) -> tuple[int, int]:
    """Row-level DELETE through the commit log — the
    right-to-be-forgotten path (``forms_main.py:408-413``'s DELETE
    WHERE, versioned): write a new version WITHOUT the matching rows
    and atomically publish it. Readers never see a half-deleted table;
    the change-data-feed (``table_changes``) reports exactly the
    removed rows as deletes, which is the audit artifact an erasure
    request needs.

    ``predicate`` is a Column (or SQL string) selecting rows to REMOVE.
    Returns ``(new_version, n_deleted)``. NOTE: prior versions still
    contain the rows until ``expire_versions`` vacuums them — complete
    erasure = delete_rows + expire_versions(retain_last=1), exactly
    like Delta/Iceberg VACUUM semantics.
    """
    cur = read_table(spark, root)
    cond = F.expr(predicate) if isinstance(predicate, str) else predicate
    doomed = cur.filter(cond)
    n = doomed.count()
    kept = cur.filter(~cond | cond.isNull())
    v = commit_table(kept, root, batch_id=batch_id)
    return v, n


def cdc_sink_stream_versioned(
    stream: DataFrame,
    checkpoint_dir: str,
    root: str,
    keys: list[str],
    seq_col: str,
    op_col: str,
    delete_op: str = "D",
):
    """Streaming CDC sink with exactly-once COMMITS — the atomic
    variant of ``streaming.cdc_sink_stream``: the same seq-aware
    tombstone fold, but each micro-batch publishes through the commit
    log's manifest swap with the batch_id recorded AT the commit
    point. A batch replayed after any crash is either fully committed
    (batch_id watermark detects and skips it) or never visible
    (re-folded from identical inputs) — no two-statement window at
    all. State rows carry ``__seq``/``__deleted`` exactly like the
    managed-table sink; read current rows by filtering ``__deleted``
    on ``read_table``.

    Returns the started query; callers ``awaitTermination()``."""
    from pyspark.sql import Window

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= last_batch_id(root):
            return  # already committed — checkpoint replay
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        tagged = (
            batch_df.withColumn("__deleted", F.col(op_col) == F.lit(delete_op))
            .withColumn("__seq", F.col(seq_col))
            .drop(op_col, seq_col)
        )
        if table_exists(root):
            unioned = read_table(spark, root).unionByName(tagged)
        else:
            unioned = tagged
        w = Window.partitionBy(*keys).orderBy(F.desc("__seq"))
        folded = (
            unioned.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        commit_table(folded, root, batch_id=batch_id)

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Manifest-level file skipping (Iceberg manifest-pruning emulated)
# ---------------------------------------------------------------------------

_STATS_FILE = "_file_stats.json"


def write_file_stats(
    spark: SparkSession, root: str, columns: list[str], version: int | None = None
) -> int:
    """Record per-data-file min/max for ``columns`` into a
    ``_file_stats.json`` sidecar inside the version directory — the
    engine's emulation of Iceberg's per-file column bounds in manifest
    entries (ref production path writes Iceberg v2 whose readers prune
    on exactly these). ONE Spark pass over the version's files,
    grouped by ``input_file_name`` (map-side combined: #files × #cols
    rows cross the wire). Returns the number of files profiled.

    Works best after ``compact_table(cluster_by=...)`` — range-
    clustered files have tight disjoint bounds, so pruning is sharp;
    on unclustered data every file may overlap every predicate and
    skipping degrades to reading everything (correct, just not
    faster) — identical to Iceberg's behavior."""
    m = read_manifest(root)
    if m is None:
        raise FileNotFoundError(f"no committed version at {root}")
    v = m["version"] if version is None else version
    vdir = _version_dir(root, v)
    df = spark.read.parquet(vdir)
    aggs = []
    for c in columns:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    rows = (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
        .collect()
    )
    stats = {
        r["file"].replace("file://", ""): {
            c: [r[f"min_{c}"], r[f"max_{c}"]] for c in columns
        }
        for r in rows
    }
    tmp = os.path.join(vdir, f".{_STATS_FILE}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"columns": columns, "files": stats}, f, default=str)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(vdir, _STATS_FILE))
    return len(stats)


def read_table_pruned(
    spark: SparkSession,
    root: str,
    column: str,
    lo,
    hi,
    version: int | None = None,
) -> DataFrame:
    """Read a committed version touching ONLY the data files whose
    recorded [min, max] for ``column`` overlaps [lo, hi] — manifest
    pruning from the ``write_file_stats`` sidecar, with the residual
    ``BETWEEN`` filter applied on top (bounds admit false positives,
    never false negatives; a file with NULL bounds — all-null column —
    is kept). Falls back to a full scan + filter when no sidecar
    exists, so the call is always correct. At 100 TB this is the
    difference between listing 50 files and scanning a partition's
    thousand."""
    m = read_manifest(root)
    if m is None:
        raise FileNotFoundError(f"no committed version at {root}")
    v = m["version"] if version is None else version
    vdir = _version_dir(root, v)
    spath = os.path.join(vdir, _STATS_FILE)
    pred = F.col(column).between(lo, hi)
    if not os.path.exists(spath):
        return spark.read.parquet(vdir).filter(pred)
    with open(spath, encoding="utf-8") as f:
        sidecar = json.load(f)
    if column not in sidecar["columns"]:
        return spark.read.parquet(vdir).filter(pred)
    keep = []
    for path, bounds in sidecar["files"].items():
        mn, mx = bounds[column]
        if mn is None or mx is None or not (mx < lo or mn > hi):
            keep.append(path)
    if not keep:
        return spark.read.parquet(vdir).filter(pred).limit(0)
    return spark.read.parquet(*keep).filter(pred)
