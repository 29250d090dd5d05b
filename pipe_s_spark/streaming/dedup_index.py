"""CONTINUOUS dedup-index maintenance: a document stream keeps a
persisted MinHash-LSH band index up to date and emits candidate pairs
for every arriving batch against everything indexed before it — the
operational form of `queries_dedup.q_dedup_incremental` (there the
"arriving batch" is simulated; here it actually arrives).

Per micro-batch, inside one ``foreachBatch``:

1. shingle -> MinHash signature -> band rows for the batch documents
   (functions.dedup — identical family constants to the batch queries,
   so the streaming index is interchangeable with a batch-built one);
2. equi-join the batch bands against the EXISTING index (band_id,
   band_sig) plus the batch itself -> new candidate pairs, appended to
   ``pairs_path``;
3. append the batch bands to the index.

Exactly-once on replay: both the index and the pairs table are
partitioned by ``batch_id`` and written with dynamic partition
OVERWRITE, and the index side of the join admits STRICTLY EARLIER
epochs only (batch ids are monotone) — a replayed epoch therefore
sees exactly the index it saw the first time and rewrites its own
partitions to identical content, even if later epochs already landed
(the layout-level idempotence the merge_apply sink gets from its
epoch fence; proven by tests/test_dedup_index_stream.py's
out-of-order replay test).

At 100 TB: per-ingest cost is O(batch x matching bands), never
O(corpus); the index is the persisted narrow band table (doc_id,
band_id, band_sig — bytes per doc, not the doc), and the band
equi-join is the same bounded-fan-out shape the batch LSH queries cap.
"""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipe_s_spark.functions.dedup import (
    LSH_BAND_CAP,
    lsh_bands,
    minhash_signature,
    shingles,
)

#: DEFAULT-ON compaction cadence for every continuous-index sink
#: (dedup index, IVF/IVFADC index, quarantine ledger). A long-running
#: stream otherwise accumulates one parquet partition per micro-batch:
#: O(#batches) directory listing on every strictly-earlier join plus
#: the classic small-files problem — the same class of silent
#: operational decay as an uncapped LSH band, so the guard must not
#: depend on the caller remembering it (the band_cap precedent). 64 =
#: folds cost amortize to <2% of epochs while partition count stays
#: bounded at ~2x the cadence; pass ``compact_every=None`` to opt OUT
#: (e.g. for forensic per-epoch retention), any int to retune.
DEFAULT_COMPACT_EVERY = 64


def _has_batch_partitions(path: str) -> bool:
    """True when ``path`` holds at least one ``batch_id=`` partition —
    the ONLY condition under which 'no existing index' is a valid read
    outcome. Any other read failure (transient FS error, corrupt file)
    must propagate so the micro-batch retries instead of silently
    emitting a pairs partition missing all cross-epoch pairs."""
    try:
        entries = os.listdir(path)
    except FileNotFoundError:
        return False
    return any(e.startswith("batch_id=") for e in entries)


def run_dedup_index_stream(
    doc_stream: DataFrame,
    index_path: str,
    pairs_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    band_cap: int | None = LSH_BAND_CAP,
    compact_every: int | None = DEFAULT_COMPACT_EVERY,
    await_seconds: int | None = None,
):
    """Start (and optionally await) the index maintainer on
    ``doc_stream``. The index holds (doc_id, band_id, band_sig,
    batch_id); pairs hold (d1, d2, batch_id) with d1 < d2.

    ``compact_every``: fold committed per-batch partitions of BOTH
    tables every N epochs (compact_index_partitions) so a long-running
    stream keeps O(1) partitions instead of O(#batches). DEFAULT-ON at
    DEFAULT_COMPACT_EVERY (None opts out). Safe inside
    foreachBatch: when epoch N is executing, every epoch < N is
    committed (epochs are sequential), so watermark = N satisfies the
    compactor's contract and epoch N's own partition is never touched.

    ``band_cap`` bounds the per-(band_id, band_sig) group size of the
    ARRIVING batch before the join (functions.dedup.cap_group_size —
    the same guard the batch LSH queries run): at corpus scale a
    boilerplate band key would otherwise fan a single batch out
    quadratically. DEFAULT-ON at LSH_BAND_CAP — the continuous index is
    the component most likely to meet a pathological hot band (a
    boilerplate band_sig shared by millions of docs), so the scale
    guard must not depend on the caller remembering it. Capping the
    batch side only keeps the incremental result a superset-per-batch
    of what a capped batch recompute yields; pass None to opt OUT and
    match an uncapped recompute exactly."""
    os.makedirs(index_path, exist_ok=True)
    os.makedirs(pairs_path, exist_ok=True)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        apply_index_batch(
            batch_df,
            batch_id,
            index_path,
            pairs_path,
            id_col=id_col,
            text_col=text_col,
            k=k,
            num_hashes=num_hashes,
            bands=bands,
            band_cap=band_cap,
        )
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            # watermark = this epoch id: epochs run sequentially, so
            # every epoch < batch_id is checkpoint-committed and can
            # never replay again; this epoch's own partition is > the
            # fold target and stays untouched
            spark = batch_df.sparkSession
            compact_index_partitions(spark, index_path, watermark=batch_id)
            compact_index_partitions(spark, pairs_path, watermark=batch_id)

    q = (
        doc_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if await_seconds is not None:
        q.awaitTermination(await_seconds)
    return q


#: wall-clock of the most recent epoch's phases (seconds) — parity
#: with streaming.ivf_index.LAST_EPOCH_PROFILE (r12 verdict #7): the
#: next fixed-cost attack on this sink should be measured, not
#: guessed. pairs/index = each fenced write's own duration (they
#: overlap; pairs also pays the band build + join through the shared
#: persisted batch), wall = whole epoch. Single-threaded test/bench
#: telemetry — concurrent apply_index_batch callers would interleave
#: writes to it, like CC_TELEMETRY.
LAST_EPOCH_PROFILE: dict = {}


def apply_index_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    pairs_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    band_cap: int | None = LSH_BAND_CAP,
) -> None:
    """One epoch of index maintenance — the foreachBatch body, exposed
    so replay/recovery paths are directly testable: calling this twice
    with the same (batch, batch_id) rewrites the same partitions to
    identical content (exactly what a post-crash Structured Streaming
    replay does)."""
    import time as _time

    _prof: dict = {}
    _t_epoch = _time.perf_counter()
    # band_sig compatibility contract: k/num_hashes/bands determine
    # whether two epochs' band rows are comparable at all; band_cap is
    # deliberately OUTSIDE the contract (it bounds which rows enter,
    # not what a row means — retunable between restarts)
    check_index_contract(
        index_path, {"kind": "minhash_lsh", "k": k, "num_hashes": num_hashes, "bands": bands}
    )
    spark = batch_df.sparkSession
    sh = shingles(batch_df.select(id_col, text_col), id_col, text_col, k=k)
    sig = minhash_signature(sh, id_col, num_hashes=num_hashes)
    new_bands = lsh_bands(sig, id_col, num_hashes=num_hashes, bands=bands)
    if band_cap is not None:
        from pipe_s_spark.functions.dedup import cap_group_size

        new_bands = cap_group_size(new_bands, ["band_id", "band_sig"], band_cap)
    # eager local checkpoint, not persist(): the two concurrent fenced
    # writes below otherwise race block-level cache locks while
    # materializing the bands AND re-plan the full shingle->minhash->
    # band lineage per job; a truncated LogicalRDD plan measured
    # ~10-15% whole-epoch on the IVF index's identical pattern (see
    # streaming.ivf_index apply_ivf_batch r13 note). Blocks are freed
    # explicitly in the finally (_free_local_checkpoint).
    new_bands = new_bands.localCheckpoint(eager=True)
    try:
        if _has_batch_partitions(index_path):
            # STRICTLY EARLIER epochs only: batch ids are monotone, so
            # a replayed epoch must see exactly the index it saw the
            # first time — filtering only its own id would let a zombie
            # replay of epoch N join against epoch N+1's bands and
            # write pairs epoch N+1's partition already owns. Read
            # errors here propagate (the epoch retries) — only a
            # genuinely absent index means "no earlier epochs".
            existing = spark.read.parquet(index_path).filter(
                F.col("batch_id") < batch_id
            )
        else:
            existing = None
        a = new_bands.alias("a")
        sides = [new_bands.alias("b")]
        if existing is not None:
            sides.append(existing.select(id_col, "band_id", "band_sig").alias("b"))
        pair_parts = []
        for side in sides:
            pair_parts.append(
                a.join(
                    side,
                    (F.col("a.band_id") == F.col("b.band_id"))
                    & (F.col("a.band_sig") == F.col("b.band_sig"))
                    & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
                ).select(
                    F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("d1"),
                    F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("d2"),
                )
            )
        pairs = pair_parts[0]
        for p in pair_parts[1:]:
            pairs = pairs.unionByName(p)

        # the two fenced writes run CONCURRENTLY (the ivf_index r12
        # pattern): the bands write only scans the persisted batch and
        # hides its job+commit fixed cost under the pair join; Spark's
        # block-level cache locking materializes each persisted
        # partition exactly once across the racing jobs, and replay is
        # order-free (a crashed epoch re-runs whole and every write
        # replaces its own batch_id partition). InheritableThread so
        # job-group/description local properties propagate.
        from pyspark import InheritableThread

        def _fenced(df: DataFrame, path: str) -> None:
            (
                df.withColumn("batch_id", F.lit(batch_id).cast("long"))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(path)
            )

        errs: list[BaseException] = []

        def _write(df: DataFrame, path: str) -> None:
            _t = _time.perf_counter()
            try:
                _fenced(df, path)
            except BaseException as e:  # noqa: BLE001 — re-raised below
                errs.append(e)
            finally:
                _prof["pairs" if path == pairs_path else "index"] = (
                    _time.perf_counter() - _t
                )

        threads = [
            InheritableThread(target=_write, args=(pairs.distinct(), pairs_path)),
            InheritableThread(target=_write, args=(new_bands, index_path)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errs:
            _raise_all(errs)
    finally:
        _free_local_checkpoint(new_bands)
        _prof["wall"] = _time.perf_counter() - _t_epoch
        LAST_EPOCH_PROFILE.clear()
        LAST_EPOCH_PROFILE.update(_prof)


def check_index_contract(path: str, meta: dict) -> None:
    """Enforce an index directory's immutable compatibility contract.
    The strictly-earlier join only means anything if every epoch wrote
    rows under the SAME family parameters — a stream restarted with
    different MinHash banding (or an IVF index reopened with different
    centroids) joins incompatible signatures and silently emits wrong
    pairs, the same corruption class the merge target's ._layout file
    guards. First writer records ``meta`` in ``<path>/._contract``
    (dot-prefixed: invisible to partition discovery), atomically;
    every later open verifies and refuses a mismatch loudly.
    Pre-existing indexes without the file adopt the opening caller's
    parameters, recorded going forward."""
    import json as _json

    os.makedirs(path, exist_ok=True)
    p = os.path.join(path, "._contract")

    def _read() -> dict | None:
        try:
            with open(p) as f:
                return _json.load(f)
        except FileNotFoundError:
            return None

    disk = _read()
    if disk is None:
        # first-writer path: serialize concurrent first-openers under
        # an flock (r13 advice: the fixed tmp name with no lock let two
        # first-openers interleave writes to the same tmp and rename a
        # torn/foreign contract into place — unlike the merge target's
        # layout check, which already runs under its swap lock). The
        # tmp name is unique per writer, and the contract is re-read
        # under the lock so a lost race verifies rather than assumes.
        import fcntl
        import uuid

        with open(os.path.join(path, "._contract.lock"), "a+") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                disk = _read()
                if disk is None:
                    tmp = f"{p}.{uuid.uuid4().hex}.tmp"
                    with open(tmp, "w") as f:
                        _json.dump(meta, f)
                    os.rename(tmp, p)
                    disk = meta
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)
    if disk != meta:
        raise ValueError(
            f"index at {path} was built under contract {disk}; this caller "
            f"supplied {meta}. Epochs written under different parameters "
            "join incompatible signatures/cells and silently corrupt "
            "results — reopen with the original parameters or build a "
            "new index path."
        )


def _free_local_checkpoint(df: DataFrame) -> None:
    """Release a local checkpoint's storage blocks NOW instead of at
    the next driver GC. ``Dataset.unpersist`` only uncaches
    cache-manager entries, and a local checkpoint's blocks ARE its
    data (truncated lineage) — left to the ContextCleaner, a
    long-running stream would carry a few epochs of dead batches in
    the block manager between GC cycles. Best-effort by design: on
    any reflection mismatch the cleaner still reclaims the blocks
    once the DataFrame is garbage-collected."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        plan.rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — GC/ContextCleaner fallback
        pass


def _raise_all(errs: list[BaseException]) -> None:
    """Re-raise concurrent epoch-action failures without dropping any
    (r12 advice: raising errs[0] alone silently discarded the other
    thread's exception, complicating partially-failed-epoch diagnosis).
    One failure re-raises as itself; several raise an ExceptionGroup
    carrying every traceback. On Python 3.10 (supported floor:
    pyproject requires-python >=3.10) the BaseExceptionGroup builtin
    does not exist, so the first failure is raised with the others'
    full tracebacks attached as ``__notes__`` — degraded formatting,
    but no exception is silently dropped (r13 advice: the bare builtin
    reference raised NameError on 3.10, masking the real failures)."""
    if len(errs) == 1:
        raise errs[0]
    if sys.version_info >= (3, 11):
        raise BaseExceptionGroup(
            f"{len(errs)} concurrent epoch actions failed", errs
        )
    import traceback

    first = errs[0]
    first.__notes__ = getattr(first, "__notes__", []) + [
        f"+{len(errs) - 1} other concurrent epoch failure(s):\n"
        + "\n".join(
            "".join(traceback.format_exception(type(e), e, e.__traceback__))
            for e in errs[1:]
        )
    ]
    raise first


def _list_batch_ids(path: str) -> list[int]:
    try:
        entries = os.listdir(path)
    except FileNotFoundError:
        return []
    return sorted(
        int(e.split("=", 1)[1]) for e in entries if e.startswith("batch_id=")
    )


def _resume_swap(path: str, stage: str, trash: str, intent_bids: list[int], target: int) -> None:
    """Finish (or re-finish) the swap recorded by the intent file —
    every step is an atomic rename guarded by an existence check, so
    executing this any number of times from any crash point converges
    to the folded layout with no row duplicated or lost."""
    os.makedirs(trash, exist_ok=True)
    for b in intent_bids + [target]:
        live = os.path.join(path, f"batch_id={b}")
        parked = os.path.join(trash, f"batch_id={b}")
        staged_t = os.path.join(stage, f"batch_id={target}")
        if b == target and not os.path.isdir(staged_t):
            # staged target already renamed in: live IS the folded copy
            continue
        if os.path.isdir(live) and not os.path.isdir(parked):
            os.rename(live, parked)
    staged_t = os.path.join(stage, f"batch_id={target}")
    live_t = os.path.join(path, f"batch_id={target}")
    if os.path.isdir(staged_t) and not os.path.isdir(live_t):
        os.rename(staged_t, live_t)


def _compact_recover(path: str, stage: str, trash: str, intent: str, marker: str) -> None:
    """Converge a crashed prior compaction before starting a new one.

    - committed marker present: the fold finished — purge leftovers.
    - intent present (no marker): the stage is complete (the intent is
      written only after a successful stage write), so RESUME the swap
      via ``_resume_swap`` (idempotent renames), then mark committed
      and clean up. No reliance on row dedup — safe for append-ledger
      tables whose rows legitimately repeat.
    - stage without intent: nothing was moved yet — drop the stage,
      restore anything a stray trash dir holds.
    """
    if os.path.exists(marker):
        shutil.rmtree(trash, ignore_errors=True)
        shutil.rmtree(stage, ignore_errors=True)
        if os.path.exists(intent):
            os.remove(intent)
        os.remove(marker)
        return
    if os.path.exists(intent):
        import json as _json

        with open(intent) as f:
            meta = _json.load(f)
        _resume_swap(path, stage, trash, meta["old"], meta["target"])
        shutil.rmtree(trash, ignore_errors=True)
        shutil.rmtree(stage, ignore_errors=True)
        os.remove(intent)
        return
    for side in (stage, trash):
        if not os.path.isdir(side):
            continue
        for e in os.listdir(side):
            if e.startswith("batch_id=") and not os.path.exists(
                os.path.join(path, e)
            ):
                os.rename(os.path.join(side, e), os.path.join(path, e))
        shutil.rmtree(side, ignore_errors=True)


def compact_index_partitions(
    spark, path: str, watermark: int, dedupe: bool = True
) -> int:
    """Fold every ``batch_id < watermark`` partition of a
    batch_id-partitioned table into the single partition ``batch_id =
    watermark - 1`` — the small-files / O(#batches)-partition-listing
    fix for long-running streams. Works for the LSH index and pairs
    tables AND (with ``dedupe=False``) for append-ledger sinks whose
    rows may legitimately repeat (the quarantine gate's good/bad/
    metrics tables): set ``dedupe`` only when rows are unique by
    content within the folded range, which also lets the fold shrink
    crash-leftover duplicates.

    Why this cannot break the strictly-earlier replay property:
    Structured Streaming only ever replays the LAST uncommitted epoch,
    so every epoch the stream can still replay has ``batch_id >=
    watermark`` when ``watermark`` <= the committed epoch watermark
    (caller's contract — from inside foreachBatch, the current epoch
    id qualifies). A replay of epoch N >= watermark filters
    ``batch_id < N``; the folded rows carry ``batch_id = watermark - 1
    < watermark <= N``, so the replayed epoch sees EXACTLY the row set
    it saw pre-compaction, and its own dynamic overwrite touches only
    partition N, which compaction never rewrites.

    Crash-safety is an intent-log protocol (two markers, all moves
    atomic renames): stage write -> INTENT file (bids + target) ->
    swap -> COMMITTED file -> cleanup. A crash before the intent
    leaves the original layout (recovery drops the stage); a crash
    after it is resumed by idempotent existence-checked renames
    (``_resume_swap``) — exactly-once folding with no dependence on
    downstream ``.distinct()``. Returns the number of partitions
    folded away."""
    import fcntl
    import json as _json

    stage = f"{path}.compact-stage"
    trash = f"{path}.compact-trash"
    intent = f"{path}.compact-intent"
    marker = f"{path}.compact-committed"
    os.makedirs(path, exist_ok=True)
    lock_path = os.path.join(path, ".compact.lock")
    with open(lock_path, "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        try:
            _compact_recover(path, stage, trash, intent, marker)
            ids = _list_batch_ids(path)
            old = [b for b in ids if b < watermark - 1]
            if not old:
                return 0
            target = watermark - 1
            folded = spark.read.parquet(path).filter(
                F.col("batch_id") < watermark
            ).drop("batch_id")
            if dedupe:
                folded = folded.distinct()
            folded = folded.withColumn(
                "batch_id", F.lit(target).cast("long")
            )
            shutil.rmtree(stage, ignore_errors=True)
            folded.write.mode("overwrite").partitionBy("batch_id").parquet(stage)
            staged = os.path.join(stage, f"batch_id={target}")
            if not os.path.isdir(staged):
                os.makedirs(staged)  # all-empty fold: keep an empty partition
            tmp = intent + ".tmp"
            with open(tmp, "w") as f:
                _json.dump({"old": old, "target": target}, f)
            os.rename(tmp, intent)  # swap is now mandatory-and-resumable
            _resume_swap(path, stage, trash, old, target)
            with open(marker, "w") as f:
                f.write(str(watermark))  # committed
            shutil.rmtree(trash, ignore_errors=True)
            shutil.rmtree(stage, ignore_errors=True)
            os.remove(intent)
            os.remove(marker)
            return len(old)
        finally:
            fcntl.flock(lk, fcntl.LOCK_UN)
