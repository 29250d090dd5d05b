"""Streaming CDC apply: changelog stream -> compacted upsert into a
target table, resumable from checkpoints.

This is the Spark restatement of the reference's whole runtime
(/root/reference/pkg/task/task.go + pkg/pipeline/simple/disruptor.go +
pkg/output/mysql/batch/*):

- source offsets + restart         -> Structured Streaming checkpoint
  (binloginput.go SetState/GetState)   (offset log, automatic)
- ring-buffer micro-batching,      -> micro-batch trigger
  flush every 3000 rows / 100 ms       (trigger availableNow/processingTime)
- per-PK hash routing for ordered  -> compaction collapses order inside
  apply (batchoutput.go:164-190)      the batch; cross-batch order from
                                      sequential epochs
- changelog compaction + multi-row -> operators.compaction.compact_changelog
  upsert (batchmessage.go)            + merge_apply inside foreachBatch
- at-least-once + idempotent SQL   -> exactly-once *effects*: epoch
  (utils/mysql.go:197-218)            replays re-run merge_apply, which
                                      is idempotent (upsert semantics)

The target here is a parquet directory swapped atomically per epoch
(no Delta in this environment); on a cluster the same foreachBatch body
targets Delta MERGE or JDBC upsert unchanged.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from pipe_s_spark.operators.compaction import compact_changelog, merge_apply


def _trace(target_path: str, msg: str) -> None:
    """Append a debug trace line when PIPE_S_TRACE is set (commit-protocol
    forensics; no-op in production)."""
    import threading
    import time as _t

    if not os.environ.get("PIPE_S_TRACE"):
        return
    line = f"{_t.monotonic():.3f} pid={os.getpid()} tid={threading.get_ident()} {msg}\n"
    with open(os.environ["PIPE_S_TRACE"], "a") as f:
        f.write(line)

#: Flat changelog schema for JSON file streams (model.changelog_from_events
#: shape). Heterogeneous streams would carry JSON payloads instead.
FLAT_CHANGELOG_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("db", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("pk", T.LongType()),
        T.StructField("k", T.IntegerType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)


def stream_changelog_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType = FLAT_CHANGELOG_SCHEMA,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source change stream (the self-contained stand-in for a
    Kafka/Debezium topic; swap format('kafka') + from_json in prod)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


class MergeApplyTarget:
    """Key-hash-bucketed parquet upsert target: the Delta-MERGE-shaped
    alternative when no transactional table format is available.

    Layout: ``<path>/bucket=K/`` with ``K = pmod(hash(key_cols), N)``.
    Per epoch only buckets containing touched keys are read, merged and
    swapped — untouched bucket directories are not rewritten (at 100 TB
    a micro-batch touches a small key set, so the rewrite is
    O(touched-buckets), not O(table)). On a cluster the same foreachBatch
    body targets Delta MERGE or JDBC upsert unchanged.

    One logical stream (checkpoint) owns a target: epoch ids must be
    monotonic across restarts, which Structured Streaming guarantees
    per checkpoint — the epoch fence relies on it.

    Commit protocol (the poor man's transaction log):

    - the expensive merge WRITE goes to a ``.stage-<epoch>`` sibling,
      outside any lock;
    - [fence check -> bucket swap -> fence write] runs under a file
      lock (flock), so a zombie writer — e.g. a foreachBatch callback
      orphaned by a killed query thread — re-reads the fence atomically
      with the swap and aborts instead of clobbering state a newer
      incarnation already advanced past (the role a transactional
      format's writer-epoch check plays);
    - replaced bucket dirs move to ``.trash-<epoch>`` and the fence is
      written only after ALL buckets swapped. ``_recover`` (also under
      the lock) therefore has one rule: a trash dir with epoch > fence
      is a half-finished swap — roll every bucket in it back; epoch <=
      fence means committed — purge it. Replayed epochs (<= fence) are
      skipped outright: idempotence by fencing, matching the
      reference's idempotent-SQL story (utils/mysql.go:197-218).

    Known limit without a transactional format: a reader holding a
    lazy plan over files that a concurrent swap trashes can fail and
    needs a retry; Delta/Iceberg versioned files are the real fix on a
    cluster (the foreachBatch body is sink-agnostic for that swap).

    Ordering: with ``lww=False`` (default) epochs are applied blindly
    (batch-last-state wins), which requires the source to deliver
    per-key-ordered data across epochs — true for binlog segments and
    for Kafka with key-hash partitioning (the reference's own
    assumption, batchoutput.go:164-190). With ``lww=True`` the target
    stores the last applied sequence number and a tombstone flag per
    key and merges by highest-seq-wins, making application
    ORDER-INDEPENDENT: a micro-batch of older events replayed or
    delivered late can never clobber newer state, and deletes are
    remembered so a late pre-delete update cannot resurrect the row
    (tombstones are retained; production would TTL-compact them the
    way Kafka compacted topics / Cassandra do).
    """

    #: internal LWW columns stored alongside payloads
    _SEQ = "__seq"
    _TOMB = "__tomb"

    def __init__(
        self,
        path: str,
        key_cols: Sequence[str] = ("table_name", "pk"),
        payload_cols: Sequence[str] = ("k", "value"),
        seq_col: str = "seq",
        op_col: str = "op",
        num_buckets: int = 16,
        lww: bool = False,
    ):
        self.path = path
        self.key_cols = list(key_cols)
        self.payload_cols = list(payload_cols)
        self.seq_col = seq_col
        self.op_col = op_col
        self.num_buckets = num_buckets
        self.lww = lww
        #: column-name -> DataType for the empty-target schema; seeded
        #: from FLAT_CHANGELOG_SCHEMA and widened with the incoming
        #: batch's actual types on every apply, so CUSTOM / COMPOSITE
        #: key and payload columns (the reference allows any PK <= 5
        #: cols, batchoutput.go:23) resolve before the first merge
        self._col_types: dict[str, T.DataType] = {
            f.name: f.dataType for f in FLAT_CHANGELOG_SCHEMA.fields
        }

    def _bucket(self, df: DataFrame):
        from pyspark.sql import functions as F

        return F.pmod(F.hash(*[F.col(c) for c in self.key_cols]), F.lit(self.num_buckets))

    def _bucket_dir(self, k: int) -> str:
        return os.path.join(self.path, f"bucket={k}")

    def _layout_path(self) -> str:
        return os.path.join(self.path, "._layout")

    def _check_layout_locked(self) -> None:
        """Enforce the target's immutable layout contract (caller holds
        the lock). Bucket routing is ``pmod(hash(key_cols), num_buckets)``
        — if a later incarnation opens the same directory with a
        different bucket count, key order, or LWW mode, every merge
        reads the WRONG subset of buckets: a key that hashed to bucket
        3 under N=16 lands in bucket 7 under N=32 while its old row
        survives untouched in 3 — silent duplicates, the exact failure
        class the epoch fence exists to kill. The first writer records
        the layout in ``._layout`` (dot-prefixed: invisible to Spark's
        partition discovery, like the fence); every later open
        verifies it and refuses a mismatch loudly. Pre-r13 targets
        without the file adopt the opening instance's layout (the
        status quo behavior, now recorded going forward)."""
        import json as _json

        meta = {
            "num_buckets": self.num_buckets,
            "key_cols": self.key_cols,
            "lww": self.lww,
        }
        p = self._layout_path()
        try:
            with open(p) as f:
                disk = _json.load(f)
        except FileNotFoundError:
            tmp = p + ".tmp"
            with open(tmp, "w") as f:
                _json.dump(meta, f)
            os.rename(tmp, p)
            return
        if disk != meta:
            raise ValueError(
                f"merge target {self.path} was created with layout {disk}; "
                f"this instance was configured with {meta}. Bucket routing "
                "is derived from (key_cols, num_buckets) and stored rows "
                "from lww — changing any of them on an existing target "
                "silently duplicates or hides rows. Open the target with "
                "its original layout, or write to a new path."
            )

    def _fence_path(self) -> str:
        return os.path.join(self.path, "._last_epoch")

    def _read_fence(self) -> int:
        try:
            with open(self._fence_path()) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return -1

    def _write_fence(self, epoch_id: int) -> None:
        tmp = self._fence_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(epoch_id))
        os.rename(tmp, self._fence_path())

    def _lock(self):
        """flock-based mutex serializing swap/recover across threads
        AND processes sharing the target directory."""
        import fcntl
        from contextlib import contextmanager

        @contextmanager
        def held():
            os.makedirs(self.path, exist_ok=True)
            with open(os.path.join(self.path, "._lock"), "w") as f:
                fcntl.flock(f, fcntl.LOCK_EX)
                try:
                    yield
                finally:
                    fcntl.flock(f, fcntl.LOCK_UN)

        return held()

    def _recover_locked(self) -> None:
        """Roll half-finished swaps back (caller holds the lock). The
        fence is written only after a complete swap, so epoch > fence
        in a trash dir == crash mid-swap -> restore every bucket from
        trash; epoch <= fence == committed -> purge leftovers. A
        half-finished offline rebucket (``rebucket_target``) is
        resolved first — its journal decides roll-back vs roll-forward
        — because it can change ``._layout``, which every layout check
        after this call must see."""
        if not os.path.isdir(self.path):
            return
        _recover_rebucket_locked(self.path)
        fence = self._read_fence()
        for entry in os.listdir(self.path):
            if not entry.startswith(".trash-"):
                continue
            trash = os.path.join(self.path, entry)
            try:
                epoch = int(entry.split("-", 1)[1])
            except ValueError:
                continue
            if epoch > fence:
                for b in os.listdir(trash):  # "bucket=K"
                    live = os.path.join(self.path, b)
                    if os.path.isdir(live):
                        shutil.rmtree(live)
                    os.rename(os.path.join(trash, b), live)
            shutil.rmtree(trash, ignore_errors=True)

    def read_current(
        self,
        spark: SparkSession,
        buckets: Sequence[int] | None = None,
        internal: bool = False,
    ) -> DataFrame:
        """Current target state. ``internal=True`` (LWW mode only)
        exposes the stored seq/tombstone columns and tombstone rows —
        the merge's view; the public view hides both."""
        from pyspark.sql import functions as F

        with self._lock():
            # recover BEFORE the layout check: a crashed rebucket's
            # roll-forward rewrites ._layout, and the check must see
            # the post-recovery truth (an instance configured with the
            # pre-rebucket bucket count must refuse, not read)
            self._recover_locked()
            self._check_layout_locked()
        cols = self.key_cols + self.payload_cols
        if self.lww and internal:
            cols = cols + [self._SEQ, self._TOMB]
        import glob as _glob

        has_data = os.path.isdir(self.path) and bool(
            _glob.glob(os.path.join(self.path, "bucket=*", "*.parquet"))
        )
        if not has_data:
            # the LWW-internal seq/tomb columns are target-managed, not
            # batch columns — they get fixed types below, never lookup
            user_cols = [c for c in cols if c not in (self._SEQ, self._TOMB)]
            missing = [c for c in user_cols if c not in self._col_types]
            if missing:
                raise ValueError(
                    f"no type known for column(s) {missing}: pass the first "
                    "batch through apply_batch (which records its schema) or "
                    "use columns from the canonical changelog schema"
                )
            fields = [T.StructField(c, self._col_types[c]) for c in user_cols]
            if self.lww and internal:
                fields += [
                    T.StructField(self._SEQ, T.LongType()),
                    T.StructField(self._TOMB, T.BooleanType()),
                ]
            return spark.createDataFrame([], T.StructType(fields))
        df = spark.read.option("basePath", self.path).parquet(self.path)
        if buckets is not None:
            # partition pruning: only the touched bucket dirs are scanned
            df = df.filter(F.col("bucket").isin(list(buckets)))
        if self.lww and not internal:
            df = df.filter(~F.col(self._TOMB))
        return df.select(*cols)

    def _merge_lww(self, base: DataFrame, compacted: DataFrame) -> DataFrame:
        """Highest-seq-wins merge: union stored state with the incoming
        net effects and keep, per key, the row with the larger seq
        (ties -> incoming, i.e. an exact replay is idempotent). One
        shuffle on the key, same as the blind merge."""
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        keys = self.key_cols
        pays = self.payload_cols
        inc = compacted.select(
            *keys,
            *pays,
            F.col("last_seq").alias(self._SEQ),
            (F.col("net_op") == "delete").alias(self._TOMB),
            F.lit(1).alias("__pri"),
        )
        cur = base.select(*keys, *pays, self._SEQ, self._TOMB, F.lit(0).alias("__pri"))
        w = Window.partitionBy(*keys).orderBy(F.desc(self._SEQ), F.desc("__pri"))
        return (
            cur.unionByName(inc)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__pri")
        )

    #: wall-clock of the most recent apply_batch's phases (seconds) —
    #: the same attribution telemetry the index epochs carry
    #: (LAST_EPOCH_PROFILE). Keys: compact (compaction materialize +
    #: touched-bucket collect), write (merge compute + staged parquet),
    #: swap (fence/rename commit), wall. Class-level by design: one
    #: logical stream owns a target, and the scaling harness reads it
    #: right after each apply.
    LAST_APPLY_PROFILE: dict = {}

    def apply_batch(self, batch: DataFrame, epoch_id: int) -> bool:
        # Epoch fence (zombie-writer protection): the fence records the
        # last fully-applied epoch. A replayed epoch (crash after swap,
        # before the stream commit) is a no-op — idempotence by skip —
        # and a zombie writer from a dead query (e.g. a stop() that
        # killed the JVM thread mid-callback) cannot clobber state a
        # newer incarnation has already advanced past. Same role as a
        # transactional table format's writer-epoch check.
        # Returns True when the epoch was applied (or was empty), False
        # when the fence skipped/aborted it — batch callers (runner
        # 'merge' output) surface the skip to the user instead of
        # silently no-opping on re-run with fresh input.
        with self._lock():
            self._recover_locked()  # may roll a crashed rebucket forward
            self._check_layout_locked()
        if epoch_id <= self._read_fence():
            _trace(self.path, f"epoch={epoch_id} SKIP fence={self._read_fence()}")
            return False
        import time as _time

        _prof: dict = {}
        _t_epoch = _time.perf_counter()
        spark = batch.sparkSession
        for f in batch.schema.fields:
            self._col_types[f.name] = f.dataType
        if "net_op" in batch.columns and self.op_col not in batch.columns:
            # already compacted upstream (a pipeline 'compact' stage or
            # a caller reusing one compaction across sinks): net-effect
            # of a net effect is itself, so apply as-is instead of
            # failing on the missing raw op/seq columns
            compacted = batch.cache()
        else:
            compacted = compact_changelog(
                batch,
                key_cols=self.key_cols,
                seq_col=self.seq_col,
                op_col=self.op_col,
                payload_cols=self.payload_cols,
            ).cache()
        try:
            # touched buckets: bounded driver-side metadata (<= num_buckets)
            touched = sorted(
                r["b"] for r in compacted.select(self._bucket(compacted).alias("b")).distinct().collect()
            )
            _prof["compact"] = _time.perf_counter() - _t_epoch
            if not touched:
                return True
            if os.environ.get("PIPE_S_TRACE"):
                rows = batch.count()
                agg = batch.agg(
                    {"seq": "min"}
                ).collect()[0][0] if "seq" in batch.columns else None
                _trace(
                    self.path,
                    f"epoch={epoch_id} START rows={rows} min_seq={agg} touched={touched}",
                )
            if self.lww:
                merged = self._merge_lww(
                    self.read_current(spark, buckets=touched, internal=True), compacted
                )
            else:
                merged = merge_apply(
                    self.read_current(spark, buckets=touched),
                    compacted,
                    self.key_cols,
                    self.payload_cols,
                )
            merged = merged.withColumn("bucket", self._bucket(merged))
            # stage dir is unique PER ATTEMPT, not per epoch: a zombie
            # writer and a live replay of the same epoch would otherwise
            # overwrite one stage dir concurrently and the lock winner
            # could swap in the mixed/partial result (observed as lost
            # rows in the kill-restart integrity test)
            import uuid

            stage = f"{self.path}.stage-{epoch_id}-{uuid.uuid4().hex[:8]}"
            # data-proportional reduce parallelism for the merge's own
            # shuffles (anti-join / LWW window): a bulk batch (backfill,
            # initial load) must not run its merge over core-count
            # reducers (r12 verdict #3 — the compact shuffle is already
            # sized inside compact_changelog; this covers the join).
            # Sized from THIS batch's estimated bytes, so streaming
            # micro-batches never engage it and the conf is restored
            # the moment the write returns.
            from pipe_s_spark.sizing import (
                bulk_partitions,
                scoped_initial_partitions,
                session_shuffle_partitions,
            )

            _t_write = _time.perf_counter()
            n_bulk = bulk_partitions(batch)
            if n_bulk is not None and n_bulk > session_shuffle_partitions(spark):
                # bulk staged write: align tasks with output partitions
                # BEFORE the dynamic-partition writer. Without this,
                # every write task holds rows of up to num_buckets
                # partition values and the writer opens num_buckets
                # parquet writers per task (n x num_buckets small
                # files, column buffers for each open writer, a local
                # sort per task) — an interleaved x10 A/B measured the
                # direct form 8-16s vs 2-3.2s salted, 2274 vs 130
                # files (r13 verdict #4: this term, not the merge
                # compute, was the write phase's growth). The salt is
                # xxhash64-based so it is independent of the
                # murmur3-derived bucket (hash(keys) % s would be a
                # function of hash(keys) % N whenever s divides N —
                # collapsing the fan-out to one task per bucket).
                from pyspark.sql import functions as F

                s = max(1, n_bulk // self.num_buckets)
                staged_df = (
                    merged.withColumn(
                        "__salt",
                        F.pmod(
                            F.xxhash64(*[F.col(c) for c in self.key_cols]), F.lit(s)
                        ),
                    )
                    .repartition(n_bulk, F.col("bucket"), F.col("__salt"))
                    .drop("__salt")
                )
                with scoped_initial_partitions(spark, n_bulk):
                    staged_df.write.mode("overwrite").partitionBy("bucket").parquet(
                        stage
                    )
            else:
                merged.write.mode("overwrite").partitionBy("bucket").parquet(stage)
            _prof["write"] = _time.perf_counter() - _t_write
            _t_swap = _time.perf_counter()
            with self._lock():
                if epoch_id <= self._read_fence():
                    # a newer incarnation advanced while we computed
                    # (or a concurrent replay of this epoch won): abort
                    _trace(self.path, f"epoch={epoch_id} ABORT fence={self._read_fence()}")
                    shutil.rmtree(stage, ignore_errors=True)
                    return False
                self._recover_locked()
                # a concurrent offline rebucket may have committed while
                # this epoch computed: its new ._layout makes this
                # writer's bucket numbering wrong — refuse loudly here,
                # atomically with the swap, instead of renaming staged
                # old-numbered buckets into a new-numbered table
                self._check_layout_locked()
                trash = os.path.join(self.path, f".trash-{epoch_id}")
                os.makedirs(trash, exist_ok=True)
                for k in touched:
                    staged = os.path.join(stage, f"bucket={k}")
                    if not os.path.isdir(staged):
                        os.makedirs(staged)  # bucket fully deleted -> empty
                    live = self._bucket_dir(k)
                    if os.path.isdir(live):
                        os.rename(live, os.path.join(trash, f"bucket={k}"))
                    os.rename(staged, live)
                self._write_fence(epoch_id)  # commit point
                _trace(self.path, f"epoch={epoch_id} COMMIT")
                shutil.rmtree(trash, ignore_errors=True)
            shutil.rmtree(stage, ignore_errors=True)
            _prof["swap"] = _time.perf_counter() - _t_swap
            _prof["wall"] = _time.perf_counter() - _t_epoch
            _prof["touched_buckets"] = len(touched)
            self.LAST_APPLY_PROFILE.clear()
            self.LAST_APPLY_PROFILE.update(_prof)
            return True
        finally:
            compacted.unpersist()


def _rebucket_journal_path(path: str) -> str:
    return os.path.join(path, "._rebucket")


def _write_json_atomic(p: str, obj: dict) -> None:
    import json as _json
    import uuid as _uuid

    tmp = f"{p}.{_uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        _json.dump(obj, f)
    os.rename(tmp, p)


def _recover_rebucket_locked(path: str) -> None:
    """Resolve a crashed ``rebucket_target`` (caller holds the target
    lock). The journal's phase decides the direction, and both
    directions are idempotent under re-crash:

    - ``moving-old`` — old buckets were being moved to the journal's
      trash dir; nothing new entered the table yet. ROLL BACK: restore
      every trashed bucket whose name is not live (a re-crash mid-
      restore leaves it live, so the skip makes re-runs idempotent),
      drop the stage, keep the old ``._layout``. The rebucket simply
      never happened.
    - ``moving-new`` — every old bucket is in trash (the phase marker
      is written only after that completes), so any live ``bucket=*``
      is NEW. ROLL FORWARD from the complete stage: move the staged
      buckets still in the stage dir in (already-moved ones are live —
      skip), rewrite ``._layout`` from the journal (idempotent), then
      clear the journal and both scratch dirs. The stage was fully
      written and fsync-renamed before the journal ever said
      moving-old, so roll-forward never fabricates data."""
    import json as _json

    import glob as _glob

    jp = _rebucket_journal_path(path)
    try:
        with open(jp) as f:
            j = _json.load(f)
    except FileNotFoundError:
        # no journal = no rebucket in flight; any rebucket scratch
        # (in-table trash, sibling stage) is a post-commit/rollback
        # leftover from a kill inside the cleanup step — purge it
        for d in _glob.glob(os.path.join(path, ".rebucket-trash-*")) + _glob.glob(
            f"{path}.rebucket-stage-*"
        ):
            shutil.rmtree(d, ignore_errors=True)
        return
    stage, trash = j["stage_dir"], j["trash"]
    if j["phase"] == "moving-old":
        if os.path.isdir(trash):
            for b in os.listdir(trash):
                live = os.path.join(path, b)
                if not os.path.isdir(live):
                    os.rename(os.path.join(trash, b), live)
    else:  # moving-new
        if os.path.isdir(stage):
            for b in os.listdir(stage):
                if not b.startswith("bucket="):
                    continue
                live = os.path.join(path, b)
                if not os.path.isdir(live):
                    os.rename(os.path.join(stage, b), live)
        _write_json_atomic(os.path.join(path, "._layout"), j["layout"])
    shutil.rmtree(trash, ignore_errors=True)
    shutil.rmtree(stage, ignore_errors=True)
    os.remove(jp)


def rebucket_target(
    spark: SparkSession,
    path: str,
    new_num_buckets: int,
    _fault_injection=None,
) -> None:
    """Offline rebucket/migration for an existing merge target (r13
    verdict #5): ``._layout`` correctly freezes ``num_buckets`` forever
    — bucket routing is ``pmod(hash(key_cols), N)``, so changing N on
    live data silently duplicates/hides rows — but that left a target
    created with too few buckets unable to EVER rebalance. This tool
    rewrites the whole table under ``new_num_buckets`` atomically,
    under the same flock every writer's swap takes, with a journaled
    two-phase commit that ``_recover_locked`` resolves after a kill at
    any point (see ``_recover_rebucket_locked``):

    1. read everything (internal LWW columns verbatim), stage the
       re-bucketed copy to a sibling dir — data-proportionally sized,
       all before any mutation;
    2. journal ``moving-old`` -> move old buckets to an in-table trash
       (kill here rolls BACK: old layout, old data, nothing lost);
    3. journal ``moving-new`` -> move staged buckets in, rewrite
       ``._layout`` (kill here rolls FORWARD from the complete stage);
    4. clear journal + scratch.

    Concurrent writers are safe, not coordinated: the tool holds the
    lock for the whole rewrite (offline by design — at 100 TB run it
    in a maintenance window), and a writer that was mid-compute when
    the rebucket committed re-checks ``._layout`` inside its swap lock
    and refuses loudly. The epoch fence is untouched — the stream
    resumes at the same epoch numbering. ``_fault_injection(point)``
    is a test hook used by the kill-mid-rebucket integrity tests.
    """
    import json as _json
    import uuid as _uuid

    from pyspark.sql import functions as F

    layout_p = os.path.join(path, "._layout")
    try:
        with open(layout_p) as f:
            disk = _json.load(f)
    except FileNotFoundError:
        raise ValueError(
            f"{path} has no ._layout — not an initialized merge target "
            "(rebucket rewrites an existing table; create new targets "
            "with the right num_buckets instead)"
        ) from None
    if int(new_num_buckets) < 1:
        raise ValueError(f"new_num_buckets must be >= 1, got {new_num_buckets}")
    tgt = MergeApplyTarget(
        path,
        key_cols=disk["key_cols"],
        num_buckets=disk["num_buckets"],
        lww=disk["lww"],
    )
    inject = _fault_injection or (lambda point: None)
    with tgt._lock():
        tgt._recover_locked()
        with open(layout_p) as f:
            disk = _json.load(f)  # recovery may have rolled a layout forward
        if disk["num_buckets"] == int(new_num_buckets):
            return
        live_buckets = [
            e for e in os.listdir(path) if e.startswith("bucket=")
        ] if os.path.isdir(path) else []
        suffix = _uuid.uuid4().hex[:8]
        stage = f"{path}.rebucket-stage-{suffix}"
        # 1. full rewrite to the stage, before any mutation: the source
        # files are still the live table, so a kill during this write
        # leaves only an orphan sibling dir (harmless; re-run cleans a
        # fresh one). Reduce parallelism is data-proportional — a
        # 100 TB rebucket must not funnel through core-count reducers.
        if live_buckets:
            from pipe_s_spark.sizing import (
                bulk_partitions,
                scoped_initial_partitions,
                session_shuffle_partitions,
            )

            df = (
                spark.read.option("basePath", path)
                .parquet(*[os.path.join(path, b) for b in live_buckets])
                .drop("bucket")
            )
            df = df.withColumn(
                "bucket",
                F.pmod(
                    F.hash(*[F.col(c) for c in disk["key_cols"]]),
                    F.lit(int(new_num_buckets)),
                ),
            )
            n_bulk = bulk_partitions(df)
            if n_bulk is not None and n_bulk > session_shuffle_partitions(spark):
                # task/partition alignment before the dynamic-partition
                # writer, same rationale as apply_batch's bulk write
                s = max(1, n_bulk // int(new_num_buckets))
                df = (
                    df.withColumn(
                        "__salt",
                        F.pmod(
                            F.xxhash64(*[F.col(c) for c in disk["key_cols"]]),
                            F.lit(s),
                        ),
                    )
                    .repartition(n_bulk, F.col("bucket"), F.col("__salt"))
                    .drop("__salt")
                )
                with scoped_initial_partitions(spark, n_bulk):
                    df.write.mode("overwrite").partitionBy("bucket").parquet(stage)
            else:
                df.write.mode("overwrite").partitionBy("bucket").parquet(stage)
        else:
            os.makedirs(stage, exist_ok=True)
        trash = os.path.join(path, f".rebucket-trash-{suffix}")
        os.makedirs(trash, exist_ok=True)
        new_layout = dict(disk, num_buckets=int(new_num_buckets))
        journal = {
            "phase": "moving-old",
            "stage_dir": stage,
            "trash": trash,
            "layout": new_layout,
        }
        _write_json_atomic(_rebucket_journal_path(path), journal)
        inject("journal-moving-old")
        # 2. old buckets out of the table (kill anywhere here: rollback)
        for i, b in enumerate(live_buckets):
            os.rename(os.path.join(path, b), os.path.join(trash, b))
            if i == 0:
                inject("mid-moving-old")
        _write_json_atomic(
            _rebucket_journal_path(path), dict(journal, phase="moving-new")
        )
        inject("journal-moving-new")
        # 3. staged buckets in + layout (kill anywhere here: roll forward)
        moved = 0
        for b in sorted(os.listdir(stage)):
            if not b.startswith("bucket="):
                continue
            os.rename(os.path.join(stage, b), os.path.join(path, b))
            moved += 1
            if moved == 1:
                inject("mid-moving-new")
        _write_json_atomic(layout_p, new_layout)
        inject("after-layout")
        # 4. commit: journal gone = rebucket fully applied
        os.remove(_rebucket_journal_path(path))
        shutil.rmtree(trash, ignore_errors=True)
        shutil.rmtree(stage, ignore_errors=True)


def run_merge_apply_stream(
    changes: DataFrame,
    target: MergeApplyTarget,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start the apply query. With ``available_now`` the query drains
    the backlog and stops (bounded job, like the reference's scan mode,
    scaninput.go done-flag); otherwise it runs continuously."""
    writer = (
        changes.writeStream.foreachBatch(target.apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
