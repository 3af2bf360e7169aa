"""Session-scoped memo plumbing shared by the engine's artifact caches
(`similarity._TRAIN_CACHE`, `dedup_text._SHINGLE_CACHE`,
`queries._FUZZY_PAIRS_CACHE`, `queries_reports._LANC_CACHE`).

Two hazards these helpers close (ADVICE r6):

* **Stale reads after in-session overwrite** — the cache keys carry the
  canonicalized plan + input file LIST, but a fixture path overwritten
  in-session keeps the same list. `file_signature` folds each file's
  (mtime_ns, size) into the key so a rewrite is a different key.
* **Block leak on FIFO eviction** — evicted values hold
  `localCheckpoint`-backed DataFrames whose blocks stay in the block
  manager forever. `evicting_put` unpersists the evicted entry's
  checkpointed RDDs (best-effort, non-blocking).

Plan-keyed cache TRAP (pinned in tests): `canonicalized()` omits BOTH
parquet paths and LocalRelation data, so the key MUST include
`df.inputFiles()` and never memoize when it is empty.
"""

from __future__ import annotations

import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame


def file_signature(files) -> tuple:
    """(path, mtime_ns, size) per input file — local paths only; a
    non-local URI contributes just its name (still disambiguates
    scale factors, the original purpose of the file list)."""
    sig = []
    for f in sorted(files):
        p = f
        if f.startswith("file:"):
            p = unquote(urlparse(f).path)
        try:
            st = os.stat(p)
            sig.append((f, st.st_mtime_ns, st.st_size))
        except OSError:
            sig.append((f, None, None))
    return tuple(sig)


def df_memo_key(df: DataFrame, extra: tuple) -> tuple | None:
    """Identity = applicationId + canonicalized analyzed plan (expr-ids
    normalized, literals kept) + input-file signature + caller params.
    Returns None (never memoize) for plans with no input files."""
    try:
        files = df.inputFiles()
        if not files:
            return None
        plan = str(df._jdf.queryExecution().analyzed().canonicalized())  # noqa: SLF001
        app = df.sparkSession.sparkContext.applicationId
    except Exception:  # noqa: BLE001 — memo is best-effort
        return None
    return (app, plan, file_signature(files), extra)


def unpersist_checkpointed(value) -> None:
    """Free the block-manager storage behind a (tuple of)
    localCheckpoint-backed DataFrame(s). A checkpointed Dataset's
    analyzed plan is a LogicalRDD over the persisted RDD — unpersist
    that RDD directly (non-blocking); anything else is a no-op."""
    items = value if isinstance(value, (tuple, list)) else (value,)
    for item in items:
        if not isinstance(item, DataFrame):
            continue
        try:
            plan = item._jdf.queryExecution().analyzed()  # noqa: SLF001
            if plan.getClass().getSimpleName() == "LogicalRDD":
                plan.rdd().unpersist(False)
        except Exception:  # noqa: BLE001 — cleanup is best-effort
            pass


def evicting_put(cache: dict, max_size: int, key, value) -> None:
    """FIFO insert; the evicted entry's checkpointed blocks are freed.

    OWNERSHIP CONTRACT: cached DataFrames belong to the cache. A
    caller must consume the returned handle promptly (build its plan,
    run its action) — holding one across ``max_size`` subsequent
    inserts is unsupported, because eviction unpersists the
    localCheckpoint blocks and a truncated-lineage RDD cannot
    recompute (the alternative — never unpersisting — is the
    unbounded block leak ADVICE r6 flagged). Every in-repo consumer
    uses its cache hit within the same query build."""
    if key is None:
        return
    if key in cache:
        # re-insert: free the displaced value (unless identical) and
        # do NOT evict an unrelated entry — the dict is not growing
        old = cache.pop(key)
        if old is not value:
            unpersist_checkpointed(old)
    while cache and len(cache) >= max_size:
        old = cache.pop(next(iter(cache)))  # oldest insert (dicts are ordered)
        unpersist_checkpointed(old)
    cache[key] = value
