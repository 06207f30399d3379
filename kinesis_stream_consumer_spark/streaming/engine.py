"""The stream-consumer engine — reference §3's 3-phase lifecycle on Spark.

    Phase 1 initiateBatch:  ingest (S3–S7, I1–I3, P1) → sequence (Q1–Q5)
                            → load state (T1) → revive (T2)
    Phase 2 processBatch:   processOne per chain via applyInPandas (X1, X3,
                            D1 idempotent skip) → processAll master/slave
                            (X2) → finalise-merge pass (X4 max-attempts →
                            Discarded, T3 Unusable → Abandoned)
    Phase 3 finaliseBatch:  DRQ (D2) + DMQ (D3) appends → save state (T4)
                            → commit or raise-for-replay (F1)

Reference trace: kinesis-consumer.js:197-206 → core 3 phases, names
asserted at test/kinesis-consumer.test.js:369-382.

Scale shape: the only Python in the hot path is (a) the per-chain ordered
task loop — grouped, Arrow-batched, executor-side, exactly as parallel as
the number of chains (per-key mode ⇒ thousands of small groups), and
(b) one mapInPandas finalise-merge pass. Everything else — parse, identify,
sequence windows, joins, DLQ projection, state upsert — is JVM-side
codegen. No driver-side per-message loops anywhere.

Replay contract (F1): `process_batch` raising `BatchReplayError` after the
state save is the Lambda-failure analogue — under `foreachBatch` Spark
retries the micro-batch, the saved state makes the retry idempotent
(completed tasks revive as Completed and are skipped, attempts preserved —
test/kinesis-consumer.test.js:746-845).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesis_stream_consumer_spark.config import EngineConfig, StreamType
from kinesis_stream_consumer_spark.streaming import tasks as tk
from kinesis_stream_consumer_spark.streaming.dlq import append_to_queue
from kinesis_stream_consumer_spark.streaming.ingest import ingest
from kinesis_stream_consumer_spark.streaming.state import STATE_SCHEMA, StateStore
from kinesis_stream_consumer_spark.streaming.tasks import TaskDef

_PASSTHROUGH = [
    ("identity", T.StringType()),
    ("event_id", T.StringType()),
    ("shard_id", T.StringType()),
    ("event_seq_no", T.StringType()),
    ("event_sub_seq_no", T.LongType()),
    ("partition_key", T.StringType()),
    ("explicit_hash_key", T.StringType()),
    ("record_json", T.StringType()),
    ("data_str", T.StringType()),
    ("id", T.StringType()),
    ("key", T.StringType()),
    ("seqNo", T.StringType()),
    ("msg_md5", T.StringType()),
    ("rec_md5", T.StringType()),
    ("data_md5", T.StringType()),
    ("chain_key", T.StringType()),
    ("seq_index", T.IntegerType()),
]

_EXEC_BASE_FIELDS = [T.StructField(n, t) for n, t in _PASSTHROUGH] + [
    T.StructField("tasks_json", T.StringType())
]

# _one_fully_finalised is computed INSIDE the exec pandas fn (the executor
# already holds the parsed task tree) — the processAll scoping flag costs
# zero extra work there, whereas deriving it afterwards would mean a
# row-wise Python UDF re-parsing tasks_json (a BatchEvalPython node, the
# exact thing the plan-hygiene gate bans in query plans).
_EXEC_SCHEMA = T.StructType(
    _EXEC_BASE_FIELDS + [T.StructField("_one_fully_finalised", T.BooleanType())]
)

_FINAL_SCHEMA = T.StructType(
    _EXEC_BASE_FIELDS
    + [
        T.StructField("fully_finalised", T.BooleanType()),
        T.StructField("rejectedish", T.BooleanType()),
        T.StructField("incomplete", T.BooleanType()),
        T.StructField("reason_rejected", T.StringType()),
    ]
)

_PASS_COLS = [n for n, _ in _PASSTHROUGH]


class BatchReplayError(RuntimeError):
    """F1: incomplete messages remain — fail the batch so the source replays
    it; state was saved first, so the replay resumes instead of redoing."""

    def __init__(self, result: "BatchResult"):
        super().__init__(
            f"batch incomplete: {result.incomplete} of {result.messages} "
            "messages must be replayed"
        )
        self.result = result


@dataclass
class BatchResult:
    batch_id: int
    records: int
    messages: int
    unusable: int
    fully_finalised: int
    rejected_to_dmq: int
    discarded_to_drq: int
    incomplete: int
    # exec-stage width this batch ran at: min(session shuffle width,
    # ~rows/500) — the scale-soak test pins that a big batch reaches full
    # cluster width (the "sizing is a no-op at scale" claim, engine.py
    # phase-2 sizing comment)
    exec_partitions: int = 0


class Engine:
    """Engine(config).attach(stream) — reference C1 handler generation
    (kinesis-consumer.js:112-178) re-expressed as an engine factory."""

    def __init__(
        self,
        spark: SparkSession,
        config: EngineConfig,
        state_path: str,
        drq_path: str,
        dmq_path: str,
        process_one_defs: Sequence[TaskDef] = (),
        process_all_defs: Sequence[TaskDef] = (),
        resubmit_path: Optional[str] = None,
        compact_every_n_batches: Optional[int] = None,
        compact_retention_batches: int = 100,
    ):
        from kinesis_stream_consumer_spark.session import ensure_package_on_workers

        ensure_package_on_workers(spark)
        self.spark = spark
        self.config = config
        self.state = StateStore(spark, state_path)
        self.drq_path = drq_path
        self.dmq_path = dmq_path
        self.one_defs = list(process_one_defs)
        self.all_defs = list(process_all_defs)
        self.resubmit_path = resubmit_path
        # Opt-in state-table maintenance: every N successful batches, reap
        # fully-finalised rows older than the retention window (see
        # StateStore.compact — incomplete rows survive at any age). The
        # reference gets this for free from Kinesis/DynamoDB retention;
        # a parquet state table needs the explicit reaper.
        self.compact_every_n_batches = compact_every_n_batches
        self.compact_retention_batches = compact_retention_batches
        # Saved-state reuse: after a successful DEFAULT save, the written
        # (consumer, shard) partitions on disk are byte-equivalent to the
        # `states` frame just computed (dynamic partition overwrite replaces
        # whole partitions), so the next batch's T1 load can serve from it
        # instead of re-reading parquet — valid only while the requested
        # shard set is covered and nothing else rewrites those partitions
        # (custom save seams and compaction invalidate it). The frame is
        # lazy over already-checkpointed inputs, so caching costs no job.
        self._saved_state_cache: Optional[Tuple[frozenset, DataFrame]] = None
        # Pre-planned revive slice (r8, from the overlap_plan sub-mark:
        # the stats job always finishes BEFORE the speculative phase-2
        # build — overlap_stats_wait measured 0.000 every steady batch —
        # so every ms of Catalyst analysis inside the build is pure
        # critical-path driver time while the cluster idles). The revive
        # join needs only (shardOrEventID, identity, msg_md5, tasks_json)
        # of live message/rejected rows, but embedding cache[1] put the
        # WHOLE states union tree (t4 select forests, sketch branches)
        # through per-batch re-analysis. Instead, at cache-set time the
        # slim projection is wrapped in a lazy localCheckpoint: planning
        # happens ONCE per batch at set time, and the next batch's build
        # analyzes a single LogicalRDD leaf. Computation still runs
        # inside the next batch's first action over already-checkpointed
        # inputs — no extra job, and no parquet read the save could
        # overwrite.
        self._revive_slice_cache: Optional[DataFrame] = None
        # Stats/plan overlap (see process_batch): the previous batch's
        # message-count seeds the next batch's exec task sizing so the
        # whole phase-2 plan can be built while the stats job runs; the
        # single-thread pool carries the stats collect during the overlap.
        self._last_n_records: Optional[int] = None
        self._plan_pool = None
        # Deferred discard sinks (config.deferred_discard_sinks): single
        # worker so appends to one queue path keep batch order; futures
        # are drained at the next process_batch (failures surface there)
        # or via drain_discard_sinks().
        self._deferred_sink_pool = None
        self._pending_sink_futures: list = []
        # Per-engine ingest Column-forest cache (see ingest()'s col_cache):
        # batch 2+ replays the cached projection levels instead of paying
        # ~0.2 s of py4j expression construction per micro-batch.
        self._ingest_col_cache: dict = {}
        # Per-batch driver overhead: Column trees are stateless and config-
        # determined, so build them ONCE — re-constructing them every
        # micro-batch is pure py4j round-trip cost (~0.2-0.3 s/batch
        # measured r6 at 5k rows). chain/sort columns are additionally
        # MATERIALIZED into the phase-1 checkpoint so the big sort-key
        # encode forest never appears in the per-batch exec plan Catalyst
        # has to re-optimize (see sequencing.chain_columns).
        from kinesis_stream_consumer_spark.streaming.sequencing import (
            chain_columns,
        )

        self._shard_or_event_col = (
            F.concat(F.lit("E|"), F.col("event_id"))
            if config.batch_keyed_on_event_id
            else F.concat(F.lit("S|"), F.col("shard_id"))
        )
        identity_col = F.coalesce(
            F.nullif(F.col("id"), F.lit("")),
            F.concat_ws(
                "|",
                F.col("event_id"),
                F.col("data_md5"),
                F.coalesce(F.col("event_sub_seq_no").cast("string"), F.lit("")),
            ),
        )
        # identity (I1-I3 resolution output) and shardOrEventID are pure
        # row functions of phase-1 columns — materialize them in the same
        # checkpoint so the exec plan consumes them as data.
        self._phase1_cols = [c.alias(n) for n, c in chain_columns(config)] + [
            identity_col.alias("identity"),
            self._shard_or_event_col.alias("shardOrEventID"),
        ]
        # T4 state-row and D2/D3 envelope Column lists are config-static
        # too (only the per-batch batch_id literal varies — spliced in at
        # use). Same rationale as _phase1_cols: constructing these ~50
        # columns per micro-batch is pure py4j round-trip cost.
        from kinesis_stream_consumer_spark.streaming.dlq import (
            dead_message_envelope_cols,
            dead_record_envelope_cols,
        )

        cfg = config
        self._t4_tag = "K" if cfg.stream_type == StreamType.kinesis else "D"
        state_key_col = F.concat(
            F.lit("E|" if cfg.batch_keyed_on_event_id else "S|"),
            F.col("event_id" if cfg.batch_keyed_on_event_id else "shard_id"),
        )
        _passthrough = [
            "identity",
            "id",
            "key",
            "seqNo",
            "event_id",
            "event_seq_no",
            "event_sub_seq_no",
            "msg_md5",
            "rec_md5",
            "data_md5",
        ]
        nul_long = F.lit(None).cast("long")
        self._t4_msg_head = [
            F.lit(cfg.stream_consumer_id).alias("streamConsumerId"),
            state_key_col.alias("shardOrEventID"),
            F.when(F.col("rejectedish"), "rejected")
            .otherwise("message")
            .alias("kind"),
            *_passthrough,
            F.col("tasks_json").alias("tasks_json"),
            F.col("reason_rejected").alias("reason"),
        ]
        self._t4_unusable_head = [
            F.lit(cfg.stream_consumer_id).alias("streamConsumerId"),
            F.concat(F.lit("S|"), F.col("shard_id")).alias("shardOrEventID"),
            F.lit("unusable").alias("kind"),
            F.concat_ws("|", F.col("event_id"), F.col("data_md5")).alias(
                "identity"
            ),
            *_passthrough[1:],
            F.lit(None).cast("string").alias("tasks_json"),
            F.col("reason_unusable").alias("reason"),
        ]
        self._t4_tail = [
            nul_long.alias("sketch_bucket"),
            nul_long.alias("sketch_r"),
        ]
        self._dmq_cols = dead_message_envelope_cols(
            cfg.stream_consumer_id, self._t4_tag
        )
        self._drq_cols = dead_record_envelope_cols(
            cfg.stream_consumer_id, self._t4_tag
        )

    # --- phase 2a: processOne via per-chain ordered applyInPandas ----------

    def _make_message_executor(self, deadline_epoch: Optional[float]):
        """(prior_json, data_str, blocked[, raw]) → (tasks_json,
        one_incomplete, fully_finalised), or with ``raw`` the parsed task
        tree itself — the fused exec+finalise path finalises in place
        instead of re-parsing the serialized tree in a second Python
        stage. The shared X1/X5/D1 per-message execution core, closed
        over picklable state only."""
        one_defs, all_defs = self.one_defs, self.all_defs
        one_names = [d.name for d in one_defs]

        def execute_message(prior_json, data_str, blocked, raw=False):
            import time as _time

            tasks = tk.init_tasks(prior_json, one_defs, all_defs)
            # X5 timeout race: past the deadline, unfinished tasks become
            # TimedOut (attempts reset at finalise), state still saved,
            # batch fails ⇒ replay (test/kinesis-consumer.test.js:2884-3030)
            timed_out = (
                deadline_epoch is not None and _time.time() >= deadline_epoch
            )
            if timed_out:
                for d in one_defs:
                    st = tasks[d.name]
                    statuses = [st["status"]] + [
                        s["status"] for s in st.get("subtasks", {}).values()
                    ]
                    if not all(s in tk.FINALISED for s in statuses):
                        st["status"] = tk.TIMED_OUT
            elif not blocked:
                try:
                    message = json.loads(data_str)
                except Exception:
                    message = {}
                for d in one_defs:
                    tk.execute_one_task(tasks[d.name], d, message)
            one_part = {n: tasks[n] for n in one_names if n in tasks}
            if raw:
                return (tasks, tk.is_incomplete(one_part))
            return (
                tk.dumps(tasks),
                tk.is_incomplete(one_part),
                tk.is_fully_finalised(tasks),
            )

        return execute_message

    def _exec_fn(
        self,
        deadline_epoch: Optional[float] = None,
        fused_finalise: bool = False,
    ) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
        """Ordered per-chain execution as a STREAMING mapInPandas over
        partitions hash-partitioned by chain_key and sorted by
        (chain_key, *sequencing.chain_order_columns()) — seq_index does
        NOT exist on the input; this fn assigns it as a per-chain running
        counter while walking the sorted chain (r7: the per-batch
        sequencing window is gone). Unlike groupBy().applyInPandas — which
        materializes each chain as one pandas DataFrame — this processes
        Arrow batches incrementally, so a giant chain (per-shard mode, the
        reference's own serialization hazard) streams through bounded
        memory instead of OOMing. Chain-blocking state is a per-chain
        boolean carried across batch boundaries.

        ``fused_finalise``: with no processAll defs nothing between
        execution and the finalise-merge needs whole-batch scope, so the
        finalise rules run here on the still-parsed task tree and the
        batch crosses Arrow ONCE (emitting _FINAL_SCHEMA) instead of
        serializing, re-parsing, and re-crossing in a second Python
        stage."""
        execute_message = self._make_message_executor(deadline_epoch)
        max_attempts = self.config.max_number_of_attempts

        def run_sorted_partition(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            blocked: Dict[str, bool] = {}
            last_identity: Dict[str, str] = {}
            # seq_index: per-chain running position in the sorted chain —
            # exactly the row_number the r6 sequencing window assigned
            # (duplicate deliveries are numbered before being dropped,
            # matching window numbering over all rows). Carried across
            # Arrow batches like `blocked`; chains never span partitions
            # (the exec shuffle hash-partitions on chain_key).
            seq_no: Dict[str, int] = {}
            for pdf in batches:
                out_seq: List[int] = []
                out_tasks: List[str] = []
                out_ff: List[bool] = []
                out_rej: List[bool] = []
                out_inc: List[bool] = []
                out_reason: List[Optional[str]] = []
                keep: List[bool] = []
                # zip over plain lists, not iterrows — per-row Series
                # construction dominates at 10^5+ messages per partition
                for chain, ident, prior_json, data_str in zip(
                    pdf["chain_key"].tolist(),
                    pdf["identity"].tolist(),
                    pdf["prior_tasks_json"].tolist(),
                    pdf["data_str"].tolist(),
                ):
                    nxt = seq_no.get(chain, 0) + 1
                    seq_no[chain] = nxt
                    out_seq.append(nxt)
                    # D1 within-batch dedup: duplicate deliveries share an
                    # identity and sort adjacently in their chain (same sort
                    # key) — process the first, drop the rest. Zero extra
                    # shuffle (reference: dropDuplicates on ids/md5s).
                    if last_identity.get(chain) == ident:
                        keep.append(False)
                        out_tasks.append("")
                        out_ff.append(False)
                        out_rej.append(False)
                        out_inc.append(False)
                        out_reason.append(None)
                        continue
                    last_identity[chain] = ident
                    keep.append(True)
                    if fused_finalise:
                        tasks, one_incomplete = execute_message(
                            prior_json, data_str, blocked.get(chain, False),
                            raw=True,
                        )
                        # blocking is decided on the PRE-finalise state,
                        # exactly like the two-stage path (a message whose
                        # tasks the rules then discard still blocked its
                        # chain successors this batch)
                        if one_incomplete:
                            blocked[chain] = True
                        tk.apply_finalise_rules(tasks, max_attempts)
                        out_reason.append(
                            next(
                                (
                                    node.get("reason")
                                    for st in tasks.values()
                                    for node in [
                                        st,
                                        *st.get("subtasks", {}).values(),
                                    ]
                                    if node["status"]
                                    in tk.FULLY_FINALISED_TERMINAL
                                ),
                                None,
                            )
                        )
                        out_tasks.append(tk.dumps(tasks))
                        out_ff.append(tk.is_fully_finalised(tasks))
                        out_rej.append(tk.is_rejectedish(tasks))
                        out_inc.append(tk.is_incomplete(tasks))
                        continue
                    tasks_json, one_incomplete, fully_fin = execute_message(
                        prior_json, data_str, blocked.get(chain, False)
                    )
                    # X1 chain blocking: an incomplete message blocks its
                    # chain successors (implied by Q3/Q4 +
                    # firstMessagesToProcess, test/kinesis-consumer.test.js:505)
                    if one_incomplete:
                        blocked[chain] = True
                    out_tasks.append(tasks_json)
                    out_ff.append(fully_fin)
                out = pdf[[c for c in _PASS_COLS if c != "seq_index"]].copy()
                out["seq_index"] = pd.array(out_seq, dtype="int32")
                out["tasks_json"] = out_tasks
                if fused_finalise:
                    out["fully_finalised"] = out_ff
                    out["rejectedish"] = out_rej
                    out["incomplete"] = out_inc
                    out["reason_rejected"] = out_reason
                else:
                    out["_one_fully_finalised"] = out_ff
                out = out[pd.Series(keep, index=out.index)]
                yield out

        return run_sorted_partition

    def _exec_map_fn(
        self,
        deadline_epoch: Optional[float] = None,
        fused_finalise: bool = False,
    ) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
        """Q5 unsequenced fast path: every message is its own chain, so no
        ordering and no blocking — mapInPandas over the scan partitions,
        ZERO shuffle (the per-chain path would shuffle on chain_key just to
        build 1-row groups). ``fused_finalise`` as in _exec_fn."""
        execute_message = self._make_message_executor(deadline_epoch)
        max_attempts = self.config.max_number_of_attempts

        def run_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = pdf[_PASS_COLS].copy()
                if fused_finalise:
                    out_tasks, out_ff, out_rej, out_inc, out_reason = (
                        [], [], [], [], []
                    )
                    for prior_json, data_str in zip(
                        pdf["prior_tasks_json"].tolist(),
                        pdf["data_str"].tolist(),
                    ):
                        tasks, _ = execute_message(
                            prior_json, data_str, False, raw=True
                        )
                        tk.apply_finalise_rules(tasks, max_attempts)
                        out_reason.append(
                            next(
                                (
                                    node.get("reason")
                                    for st in tasks.values()
                                    for node in [
                                        st,
                                        *st.get("subtasks", {}).values(),
                                    ]
                                    if node["status"]
                                    in tk.FULLY_FINALISED_TERMINAL
                                ),
                                None,
                            )
                        )
                        out_tasks.append(tk.dumps(tasks))
                        out_ff.append(tk.is_fully_finalised(tasks))
                        out_rej.append(tk.is_rejectedish(tasks))
                        out_inc.append(tk.is_incomplete(tasks))
                    out["tasks_json"] = out_tasks
                    out["fully_finalised"] = out_ff
                    out["rejectedish"] = out_rej
                    out["incomplete"] = out_inc
                    out["reason_rejected"] = out_reason
                    yield out
                    continue
                results = [
                    execute_message(prior_json, data_str, False)
                    for prior_json, data_str in zip(
                        pdf["prior_tasks_json"].tolist(), pdf["data_str"].tolist()
                    )
                ]
                out["tasks_json"] = [r[0] for r in results]
                out["_one_fully_finalised"] = [r[2] for r in results]
                yield out

        return run_rows

    # --- phase 2b/2c: processAll master + finalise-merge -------------------

    def _run_process_all(
        self, executed: DataFrame, n_incomplete_scope: int
    ) -> List[Tuple[str, str, Optional[str], Optional[str], Dict[str, Tuple[str, str]]]]:
        """Execute each processAll master task once over the batch (X2).
        Returns per def: (name, status, error, reason, per-message overrides).
        The master fans its state out to per-message slave tasks in the
        finalise-merge pass (README.md:183-224)."""
        results = []
        if n_incomplete_scope == 0:
            return results
        scope = executed.where(~F.col("_one_fully_finalised"))
        for d in self.all_defs:
            try:
                overrides = d.execute(scope, self) or {}
                results.append((d.name, tk.COMPLETED, None, None, dict(overrides)))
            except tk.TaskRejectedError as e:
                results.append((d.name, tk.REJECTED, None, e.reason, {}))
            except Exception as e:  # noqa: BLE001
                results.append(
                    (d.name, tk.FAILED, f"{type(e).__name__}: {e}", None, {})
                )
        return results

    def _finalise_fn(
        self,
        all_results: List[
            Tuple[str, str, Optional[str], Optional[str], Dict[str, Tuple[str, str]]]
        ],
    ) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
        max_attempts = self.config.max_number_of_attempts

        def merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out_tasks, out_ff, out_rej, out_inc, out_reason = [], [], [], [], []
                for tasks_json, ident in zip(
                    pdf["tasks_json"].tolist(), pdf["identity"].tolist()
                ):
                    tasks = json.loads(tasks_json)
                    # X2 scope: incompleteMessages = not fully finalised
                    # before processAll fan-out (replayed fully-done
                    # messages are skipped — D1)
                    msg_in_scope = not tk.is_fully_finalised(tasks)
                    for name, status, error, reason, overrides in all_results:
                        slave = tasks.get(name)
                        if slave is None or not msg_in_scope:
                            continue  # only incompleteMessages are in scope (X2)
                        statuses = [slave["status"]] + [
                            s["status"] for s in slave.get("subtasks", {}).values()
                        ]
                        if all(s in tk.FINALISED for s in statuses):
                            continue  # idempotent resume (D1)
                        slave["attempts"] += 1
                        ov = overrides.get(ident)
                        if ov is not None:
                            slave["status"], slave["reason"] = ov[0], ov[1]
                        else:
                            slave["status"] = status
                            slave["error"] = error
                            slave["reason"] = reason
                    tk.apply_finalise_rules(tasks, max_attempts)
                    out_reason.append(
                        next(
                            (
                                node.get("reason")
                                for st in tasks.values()
                                for node in [st, *st.get("subtasks", {}).values()]
                                if node["status"] in tk.FULLY_FINALISED_TERMINAL
                            ),
                            None,
                        )
                    )
                    out_tasks.append(tk.dumps(tasks))
                    out_ff.append(tk.is_fully_finalised(tasks))
                    out_rej.append(tk.is_rejectedish(tasks))
                    out_inc.append(tk.is_incomplete(tasks))
                out = pdf[_PASS_COLS].copy()
                out["tasks_json"] = out_tasks
                out["fully_finalised"] = out_ff
                out["rejectedish"] = out_rej
                out["incomplete"] = out_inc
                out["reason_rejected"] = out_reason
                yield out

        return merge

    def _additive_sketch_rows(
        self,
        delta: DataFrame,
        prior_all: Optional[DataFrame],
        batch_id: int,
        kind_cum: str,
        kind_delta: str,
        id_prefix: str,
    ) -> DataFrame:
        """Replay-safe maintenance of an ADDITIVE register sketch in the
        state table (shared by the CMS and quantile twins). ``delta`` is
        this batch's registers as (g, idx, cnt).

        Addition is linear but not idempotent, so replay safety comes
        from per-batch delta rows: when the prior slice already carries a
        delta with THIS batch_id (the F1 replay path re-runs a failed
        micro-batch under the same id, and its state save committed
        before the failure), that stale delta is subtracted before the
        fresh one is folded in — new_cum = prior_cum − stale_delta +
        delta. One union + keyed sum, register-bounded rows per shard end
        to end. Re-delivery under a NEW batch_id overcounts by exactly
        that batch's contribution — the honest additive-counter bound,
        pinned in tests (the distinct sketch is HLL max-merge for exactly
        this reason)."""
        cfg = self.config
        # eager checkpoint of the delta FIRST: it feeds both the merge
        # below and the save rows, and without the checkpoint the
        # row-scaled counting pass would run twice per micro-batch
        delta = delta.localCheckpoint(eager=True)
        if prior_all is None:
            # first batch of a fresh store: delta IS the cumulative frame
            cum = delta
        else:
            merged = (
                delta.unionByName(
                    prior_all.where(F.col("kind") == kind_cum).select(
                        F.col("shardOrEventID").alias("g"),
                        F.col("sketch_bucket").alias("idx"),
                        F.col("sketch_r").alias("cnt"),
                    )
                ).unionByName(
                    prior_all.where(
                        (F.col("kind") == kind_delta)
                        & (F.col("batch_id") == batch_id)
                    ).select(
                        F.col("shardOrEventID").alias("g"),
                        F.col("sketch_bucket").alias("idx"),
                        (-F.col("sketch_r")).alias("cnt"),
                    )
                )
            )
            # eager checkpoint: the merge reads the parquet partitions
            # the save below replaces (same hazard as the HLL merge);
            # register-sized frame, tiny job
            cum = (
                merged.groupBy("g", "idx")
                .agg(F.sum("cnt").alias("cnt"))
                .where(F.col("cnt") > 0)
                .localCheckpoint(eager=True)
            )

        def rows(frame: DataFrame, kind: str) -> DataFrame:
            nul = F.lit(None).cast("string")
            return frame.select(
                F.lit(cfg.stream_consumer_id).alias("streamConsumerId"),
                F.col("g").alias("shardOrEventID"),
                F.lit(kind).alias("kind"),
                F.concat(F.lit(id_prefix), F.col("idx")).alias("identity"),
                nul.alias("id"),
                nul.alias("key"),
                nul.alias("seqNo"),
                nul.alias("event_id"),
                nul.alias("event_seq_no"),
                F.lit(None).cast("long").alias("event_sub_seq_no"),
                nul.alias("msg_md5"),
                nul.alias("rec_md5"),
                nul.alias("data_md5"),
                nul.alias("tasks_json"),
                nul.alias("reason"),
                F.lit(batch_id).cast("long").alias("batch_id"),
                F.col("idx").cast("long").alias("sketch_bucket"),
                F.col("cnt").cast("long").alias("sketch_r"),
            )

        return rows(cum, kind_cum).unionByName(rows(delta, kind_delta))

    # --- the 3-phase batch lifecycle ---------------------------------------

    def _submit_deferred_sink(self, job: Callable[[], None]) -> None:
        """Launch a default discard-sink append on the background worker
        (config.deferred_discard_sinks). ONE worker on purpose: appends to
        the same queue path stay in batch order."""
        if self._deferred_sink_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._deferred_sink_pool = ThreadPoolExecutor(
                1, thread_name_prefix="ksc-deferred-sink"
            )
        self._pending_sink_futures.append(
            self._deferred_sink_pool.submit(job)
        )

    def drain_discard_sinks(self) -> None:
        """Join any deferred DRQ/DMQ appends and re-raise the first
        failure. Called automatically at the start of every
        process_batch; call explicitly after the LAST batch (or before
        stopping the session) when deferred_discard_sinks is on."""
        pending, self._pending_sink_futures = self._pending_sink_futures, []
        for f in pending:
            f.result()

    def process_batch(
        self,
        records: DataFrame,
        batch_id: int = 0,
        remaining_time_ms: Optional[float] = None,
    ) -> BatchResult:
        """Run the 3-phase lifecycle on one batch of records.

        ``remaining_time_ms`` is the X5 analogue of Lambda's
        getRemainingTimeInMillis: the processing phase gets
        ``timeout_at_percentage_of_remaining_time`` × that budget; past the
        deadline, unfinished tasks become TimedOut (attempts reset), state
        is still saved, and the batch fails for replay.

        SPARK_GRAFT_ENGINE_TIMING=1 prints per-section wall times to
        stderr — the profiling surface for micro-batch fixed costs.
        """
        import os as _os
        import sys as _sys
        import time as _time

        _timing = _os.environ.get("SPARK_GRAFT_ENGINE_TIMING") == "1"
        _marks: list[tuple[str, float]] = []
        _last = _time.perf_counter()

        def _mark(label: str) -> None:
            # always collected (a handful of perf_counter calls per batch);
            # exposed as self.last_section_times for the scale-soak test,
            # printed to stderr only under SPARK_GRAFT_ENGINE_TIMING=1
            nonlocal _last
            now = _time.perf_counter()
            _marks.append((label, now - _last))
            _last = now

        cfg = self.config
        # Deferred-sink barrier: appends launched by the PREVIOUS batch
        # must land (and their failures surface) before this batch does
        # any work — by now they have had the whole inter-batch gap to
        # finish, so this join is ~free in steady state.
        self.drain_discard_sinks()
        deadline = (
            _time.time()
            + cfg.timeout_at_percentage_of_remaining_time * remaining_time_ms / 1000.0
            if remaining_time_ms is not None
            else None
        )
        # ---- Phase 1: initiate -------------------------------------------
        # A micro-batch from a 1-file trigger arrives as ONE partition, and
        # ingest (base64 + JSON parse + 3×md5) is CPU-bound and narrow — it
        # would fuse onto that single task. Fan the raw records out first;
        # the records are small (the shuffle moves the undecoded strings
        # once) and a source that already delivers wide input skips this.
        # fan=8 beats defaultParallelism here (A/B r5: steady ingest 0.36 s
        # at 8 tasks vs 0.46 s at 32 on 5k-row micro-batches — per-task
        # scheduling beats the extra width at this size; a big batch from a
        # checkpointed source already arrives wide and skips this branch).
        width = int(self.spark.conf.get("spark.sql.shuffle.partitions", "200"))
        fan = min(8, width)
        if records.rdd.getNumPartitions() < fan:
            records = records.repartition(fan)
        _mark("fan_probe")
        ing = ingest(records, cfg, col_cache=self._ingest_col_cache)
        # Materialize the UNSPLIT ingest output ONCE, before anything
        # branches off it: the usable/unusable split, the shard-key collect
        # below, the sequencing shuffle, and the DRQ path would each
        # otherwise recompute the whole decode→identify pipeline — and
        # filtering the lazy split plans lets PushDownPredicate inline the
        # unbase64/JSON-parse work into each side's filter a second time.
        # Splitting AFTER the checkpoint reads reason_unusable as
        # materialized data. msg_json is dropped first — it is an
        # ingest-surface column (custom-format resolution); the engine only
        # needs the digests downstream, and dropping it keeps a full
        # message copy out of the checkpoint and the chain shuffle.
        # eager=False: the stats aggregate right below is the first action
        # and computes every partition, so Spark materializes the
        # checkpoint inside that same job (doCheckpoint runs before the
        # action returns) — ingest-materialize + batch-stats cost ONE job
        # instead of two (~0.2-0.3 s/micro-batch of fixed cost, more on
        # cold batches). The checkpoint is still complete before anything
        # downstream (exec, sinks, state save) touches the frame.
        # chain_key/sort_key materialize HERE (inside the checkpoint): the
        # sort-key encode forest is the most expensive expression in the
        # lifecycle and this keeps it out of the per-batch exec plan —
        # Catalyst replans that tree every micro-batch, and the encode work
        # itself fuses onto the already-CPU-bound decode stage.
        _mark("ingest_plan")
        tagged = (
            ing.tagged.drop("msg_json", "parsed_ok")
            .select("*", *self._phase1_cols)
            .localCheckpoint(eager=False)
        )
        _mark("phase1_ckpt_call")
        msgs = tagged.where(F.col("reason_unusable").isNull()).drop(
            "reason_unusable"
        )
        unusable = tagged.where(F.col("reason_unusable").isNotNull())

        # ONE stats job for batch-key resolution (I4) + batch counters — a
        # slim scan of the checkpointed batch, not a recompute of ingest.
        # Per shard key it returns (record deliveries, unusable rows), so
        # the shard set for the partition-pruned state load, n_records and
        # n_unusable all come from this single aggregate instead of three
        # separate jobs (records.count / distinct-collect /
        # unusable.count) — micro-batch fixed cost, measured ~0.4 s/batch.
        # Delivery counting: every record lands in tagged as either rows
        # with event_sub_seq_no NULL (non-KPL, failed-deagg, unusable) or
        # an exploded run starting at sub-seq 0 (KPL, kpl.py:174), so
        # "NULL or 0" counts each delivery exactly once — duplicate
        # deliveries stay distinct (the reference counts Records entries,
        # not unique records; dedup happens at execution, D1).
        stats_key = F.when(
            F.col("reason_unusable").isNotNull(),
            F.concat(F.lit("S|"), F.col("shard_id")),
        ).otherwise(F.col("shardOrEventID"))
        is_delivery_head = (
            F.col("event_sub_seq_no").isNull() | (F.col("event_sub_seq_no") == 0)
        )
        stats_df = tagged.groupBy(stats_key.alias("shardOrEventID")).agg(
            F.sum(F.when(is_delivery_head, 1).otherwise(0)).alias("n_rec"),
            F.sum(
                F.when(F.col("reason_unusable").isNotNull(), 1).otherwise(0)
            ).alias("n_unus"),
        )

        # Q3/Q4 sequencing WITHOUT a whole-batch window: ordering is
        # established in-partition at the exec shuffle below (repartition
        # on chain_key + sortWithinPartitions on the same comparator keys
        # the sequencing window orders by), and seq_index materializes
        # INSIDE the exec stage — a per-chain running counter on the same
        # pass that executes the chain. The sequence_messages window the
        # engine used through r6 cost a second full exchange on chain_key
        # per micro-batch plus a Window node Catalyst replanned every
        # batch, to compute prev/next/is_first links the engine never
        # reads. (sequence_messages itself remains the query-surface
        # operator — stream-parity queries and fixture tests pin it.)
        # sort_key rides only as far as the in-partition sort (dropped
        # before the Arrow transfer); the exec exchange carrying it is
        # strictly cheaper than the extra window exchange it replaces.
        if cfg.sequencing_required:
            seqd = msgs
        else:
            # Q5: every message is its own chain of one
            seqd = msgs.select(
                "*", F.lit(1).alias("seq_index")
            ).drop("sort_key")
        # ---- Phase 2: process --------------------------------------------
        # With no processAll defs, execution and finalise-merge fuse into
        # ONE Python stage emitting _FINAL_SCHEMA (see _exec_fn) — a small
        # micro-batch crosses Arrow once, not twice.
        fused = not self.all_defs
        exec_schema = _FINAL_SCHEMA if fused else _EXEC_SCHEMA

        def _build_phase2(prior: DataFrame, n_rec_est: int):
            """T2 revive + the exec plan (incl. the Catalyst planning the
            lazy checkpoint forces) for a given prior-state revive slice
            and a task-sizing row estimate. Driver-side plan construction
            PLUS the AQE stage materialization the lazy checkpoint's
            toRdd triggers (the revive-slice broadcast and the exec
            shuffle's map side — see the p2_ckpt_plan note below): the
            overlap path below runs it WHILE the cluster executes the
            stats job, so those stages pipeline ahead of the fused save.

            Mismatched-prior-state tolerance: prior state only revives
            when its content digest matches the current message — same id
            but different content means the state is stale and the message
            executes fresh (reference "COMPLETELY MISMATCHED PRIOR state"
            ⇒ attempts restart at 1, test/kinesis-consumer.test.js:
            847-945). A prior row with no recorded digest (custom stores)
            still revives.
            """
            revived = seqd.join(
                F.broadcast(
                    prior.select(
                        F.col("identity").alias("_pid"),
                        F.col("msg_md5").alias("_pmd5"),
                        F.col("tasks_json").alias("prior_tasks_json"),
                    )
                ),
                (F.col("identity") == F.col("_pid"))
                & (
                    F.col("_pmd5").isNull()
                    | (F.col("_pmd5") == F.col("msg_md5"))
                ),
                "left",
            ).drop("_pid", "_pmd5")
            # F3 hook: preProcessBatch (kinesis-processing.js:292-298).
            # Column contract (changed r7 with the window removal):
            # `revived` carries the phase-1 message columns + chain_key +
            # sort_key + prior_tasks_json — NO seq_index/prev/next/
            # is_first (those were window products the engine no longer
            # computes; seq_index is assigned inside the exec stage). A
            # hook that projects must PRESERVE sort_key/event_seq_no/
            # event_sub_seq_no — the exec stage's within-chain sort orders
            # by them.
            if cfg.pre_process_batch is not None:
                maybe = cfg.pre_process_batch(revived, self)
                if maybe is not None:
                    revived = maybe
            _mark("p2_revive_build")
            # Size the chain shuffle to the batch: 32 near-empty
            # partitions × two Python stages is pure scheduling overhead
            # at micro-batch sizes; a big batch still fans out to the
            # session's full shuffle width (so this is a no-op at cluster
            # scale). The exec stage is the batch's dominant CPU
            # (task-tree parse + user fns + finalise per message,
            # ~0.3-0.5 ms/row), so ~500 rows/task keeps the stage wide
            # while each task's ~150-250 ms of row work still dwarfs its
            # warm-worker Arrow/scheduling cost. A/B-measured r5 (VERDICT
            # r4 #7 asked): batch/defaultParallelism sizing (32 ×
            # ~156-row tasks for a 5k batch) ran the steady-state exec at
            # 1.17 s vs 0.80 s for 11 × 500-row tasks — per-task
            # Python/Arrow overhead beats the extra width below ~500
            # rows/task, so the floor stays.
            n_parts = max(4, min(width, (n_rec_est // 500) + 1))
            if cfg.sequencing_required:
                # co-locate each chain, order within partition by THE
                # shared comparator (sequencing.chain_order_columns — the
                # same list the sequencing window orders by, one
                # definition so the two can't drift), stream batches; the
                # exec fn assigns seq_index as it walks the sorted chain
                from kinesis_stream_consumer_spark.streaming.sequencing import (
                    chain_order_columns,
                )

                executed = (
                    revived.repartition(n_parts, "chain_key")
                    .sortWithinPartitions("chain_key", *chain_order_columns())
                    .drop("sort_key")
                    .mapInPandas(
                        self._exec_fn(deadline, fused_finalise=fused),
                        schema=exec_schema,
                    )
                )
            else:
                # Q5: no ordering ⇒ map straight over the scan; D1
                # within-batch dedup needs one shuffle here (no chain sort
                # to make duplicate identities adjacent)
                executed = revived.dropDuplicates(["identity"]).mapInPandas(
                    self._exec_map_fn(deadline, fused_finalise=fused),
                    schema=exec_schema,
                )
            # _one_fully_finalised (processAll scoping, X2) is emitted by
            # the exec fn itself — the executor already holds the parsed
            # task tree, so the flag is free and phase 2b's plan stays
            # UDF-less (no BatchEvalPython; the engine obeys the same
            # plan-hygiene bar as the query registry).
            # localCheckpoint severs lineage: the state save below
            # overwrites the parquet this plan's revive-join reads, so any
            # later recomputation would replay tasks against their own
            # freshly-saved state (double attempts). Checkpointing freezes
            # the finalised batch first (and nothing downstream reads
            # `executed` directly). eager=False: the first phase-3 action
            # (the fused save+counters job, or the legacy counters
            # aggregate) computes every partition, so the checkpoint
            # materializes inside that job — before the dynamic-overwrite
            # commit replaces any prior-state file the revive join reads.
            _mark("p2_exec_build")
            # p2_ckpt_plan is NOT driver waste (r9 measurement closing the
            # r7 exec_finalise_plan item): Catalyst itself is ~40 ms here
            # (QueryPlanningTracker phases); the rest of the mark is AQE
            # stage materialization inside toRdd — 2-3 REAL jobs (the
            # revive-slice broadcast and the exec shuffle's map side,
            # racing the stats job for the phase-1 first touch, which is
            # safe: ingest is deterministic and side-effect-free; user
            # task fns only run in the final stage, which is NOT
            # materialized here). The batch is pipelined: by the time the
            # fused save+counters action runs, only the exec reduce side
            # and the write remain.
            finalised = (
                executed.localCheckpoint(eager=False) if fused else None
            )
            _mark("p2_ckpt_plan")
            return executed, finalised, n_parts

        # Stats/plan OVERLAP: with the default load seam, a warm
        # saved-state cache and a prior batch's size on record, the entire
        # phase-2 plan — revive join, exec plan, and the Catalyst planning
        # forced by the lazy checkpoint (~0.3-0.4 s/batch of pure driver
        # work) — is built WHILE the cluster runs the stats job, instead
        # of serially after it. The build is optimistic against the cached
        # prior slice (unfiltered by shard: the revive join matches on
        # identity, so rows from uninvolved shards never match), and task
        # sizing seeds from the last batch's count (steady micro-batches
        # are same-sized; a mis-estimate only re-sizes tasks, never
        # changes results). If the batch turns out to touch shards OUTSIDE
        # the cache's coverage, the optimistic plan is discarded and the
        # legacy path rebuilds from the partition-pruned disk load —
        # correctness never rides the estimate. Restricted to the fused
        # path: the processAll variant runs an aggregate action during
        # plan construction, which must not race the stats job for the
        # phase-1 checkpoint materialization.
        cache = self._saved_state_cache
        overlap = None
        empty_prior = None
        _mark("phase1_plan")
        warm_overlap = cache is not None and self._last_n_records is not None
        # Cold-start overlap: a brand-new state dir means the prior slice
        # is provably empty for EVERY shard, so the optimistic plan is
        # valid regardless of which shards the batch turns out to touch.
        # Task sizing falls back to full session width (scale-safe; a
        # micro-batch pays slightly wider-than-ideal tasks exactly once).
        cold_overlap = (
            not warm_overlap and cache is None and self.state.is_empty()
        )
        # pre_process_batch gates the overlap OFF: _build_phase2 invokes the
        # hook, and the speculative build may be discarded and rebuilt (shards
        # outside cache coverage) — a side-effecting hook would fire twice per
        # batch where the reference calls preProcessBatch exactly once
        # (kinesis-processing.js:292-298). With the hook set, phase 2 builds
        # exactly once on the kept plan.
        if (
            fused
            and cfg.load_batch_state is None
            and cfg.pre_process_batch is None
            and (warm_overlap or cold_overlap)
        ):
            if self._plan_pool is None:
                from concurrent.futures import ThreadPoolExecutor

                self._plan_pool = ThreadPoolExecutor(1)
            stats_fut = self._plan_pool.submit(stats_df.collect)
            if warm_overlap:
                # pre-planned slim slice when available (set with the
                # cache): already kind-filtered and projected, and a
                # checkpoint LEAF — the build below re-analyzes four
                # columns instead of the whole prior states union tree
                prior_src = (
                    self._revive_slice_cache
                    if self._revive_slice_cache is not None
                    else cache[1].where(
                        F.col("kind").isin("message", "rejected")
                    )
                )
                est = self._last_n_records
            else:
                empty_prior = self.spark.createDataFrame([], STATE_SCHEMA)
                prior_src = empty_prior.where(
                    F.col("kind").isin("message", "rejected")
                )
                est = width * 500
            overlap = _build_phase2(prior_src, est)
            # split attribution (VERDICT r7 #1 spirit): overlap_plan is the
            # driver-side Catalyst/py4j build; overlap_stats_wait is how
            # long the stats job kept running AFTER the build finished —
            # only the LONGER of the two is critical path, and which one
            # dominates decides where optimization effort goes.
            _mark("overlap_plan")
            stat_rows = stats_fut.result()
            _mark("overlap_stats_wait")
        else:
            _mark("overlap_plan")
            stat_rows = stats_df.collect()
            _mark("overlap_stats_wait")
        shards = {r["shardOrEventID"] for r in stat_rows}
        n_records = int(sum(r["n_rec"] for r in stat_rows))
        n_unusable = int(sum(r["n_unus"] for r in stat_rows))
        self._last_n_records = n_records
        _mark("ingest_checkpoint_and_stats")
        _mark("seq_plan")

        # T1 load + T2 revive: broadcast the (small) prior-state slice into
        # the messages — one partition-pruned scan per batch, like the
        # reference's single DynamoDB get. loadBatchState is pluggable
        # (reference persisting.loadBatchStateFromDynamoDB default,
        # kinesis-processing.js:291): a custom fn returns the prior slice
        # (already filtered to live message/rejected states).
        prior_all = None
        if (
            overlap is not None
            and shards
            and (empty_prior is not None or shards <= cache[0])
        ):
            # the optimistic plan's prior slice covers this batch: keep it
            # (an empty-state build covers ANY shard set by construction)
            executed, finalised, n_parts = overlap
            prior_all = (
                empty_prior
                if empty_prior is not None
                else cache[1].where(
                    F.col("shardOrEventID").isin(list(shards))
                )
            )
            _mark("revive_plan")
            _mark("exec_udf_plan")
        else:
            if cfg.load_batch_state is not None:
                prior = cfg.load_batch_state(self, shards or None)
            else:
                if cache is not None and shards and shards <= cache[0]:
                    prior_all = cache[1].where(
                        F.col("shardOrEventID").isin(list(shards))
                    )
                else:
                    prior_all = self.state.load(
                        cfg.stream_consumer_id, shards or None
                    )
                prior = prior_all.where(
                    F.col("kind").isin("message", "rejected")
                )
            _mark("revive_plan")
            executed, finalised, n_parts = _build_phase2(prior, n_records)
            _mark("exec_udf_plan")
        if not fused:
            # processAll needs the materialized post-processOne batch as its
            # scope (incompleteMessages, X2) — one extra checkpoint + agg
            executed = executed.localCheckpoint(eager=False)
            n_incomplete_scope = (
                executed.agg(
                    F.sum(F.when(~F.col("_one_fully_finalised"), 1).otherwise(0))
                ).first()[0]
                or 0
            )
            all_results = self._run_process_all(executed, n_incomplete_scope)
            executed = executed.drop("_one_fully_finalised")
            finalised = executed.mapInPandas(
                self._finalise_fn(all_results), schema=_FINAL_SCHEMA
            ).localCheckpoint(eager=False)
        _mark("exec_finalise_plan")

        # ---- Phase 3: finalise -------------------------------------------
        # F3 hook: preFinaliseBatch
        if cfg.pre_finalise_batch is not None:
            cfg.pre_finalise_batch(finalised, self)
        tag = self._t4_tag
        # The three finalise sinks (DRQ, DMQ, state save) write to disjoint
        # paths from frames that are all checkpointed — independent Spark
        # jobs, so the DEFAULT sinks run concurrently from worker threads
        # (driver-side job submission is thread-safe) instead of paying
        # three serial write latencies per micro-batch. Custom seams run
        # serially: user hooks are not assumed thread-safe.
        sink_jobs: List[Callable[[], None]] = []
        if n_unusable:
            # D2 seam: discardUnusableRecord (default DRQ append,
            # kinesis-processing.js:296 discardUnusableRecordToDRQ)
            if cfg.discard_unusable_record is not None:
                cfg.discard_unusable_record(unusable, self)
            else:
                drq_env = unusable.select(*self._drq_cols)
                _drq_job = lambda: append_to_queue(  # noqa: E731
                    drq_env, self.drq_path, n_rows=n_unusable
                )
                if cfg.deferred_discard_sinks:
                    # reads only the phase-1 checkpoint the stats job
                    # already materialized — safe to run any time, even
                    # concurrently with the save
                    self._submit_deferred_sink(_drq_job)
                else:
                    sink_jobs.append(_drq_job)
        # Finalise counters. When the DEFAULT state save is about to run
        # (the common path: default T4 seam + a non-empty batch), the
        # counters ride that very write job as observed metrics
        # (CollectMetrics via Observation) instead of a separate aggregate
        # job — the save's action materializes the lazy exec checkpoint
        # AND reports the counts, so exec stage + counters + state write
        # cost ONE job per micro-batch. Overwrite-under-read stays safe:
        # dynamic-overwrite commit (delete + swap of the replaced
        # partitions) only runs after every task — including the ones
        # computing the checkpoint through the revive join's prior-state
        # scan — has finished. With a custom save seam or an empty batch,
        # the legacy separate counters aggregate runs first, sinks after.
        obs: Optional[Observation] = None
        if cfg.save_batch_state is None and (n_records or n_unusable):
            obs = Observation()
            finalised = finalised.observe(
                obs,
                F.count(F.lit(1)).alias("n_messages"),
                F.sum(F.when(F.col("rejectedish"), 1).otherwise(0)).alias(
                    "n_rejected"
                ),
                F.sum(F.when(F.col("fully_finalised"), 1).otherwise(0)).alias(
                    "n_ff"
                ),
                F.sum(F.when(F.col("incomplete"), 1).otherwise(0)).alias(
                    "n_inc"
                ),
            )
        rejected = finalised.where(F.col("rejectedish"))

        def _default_dmq() -> None:
            # D3 default sink: DMQ append (kinesis-processing.js:297
            # discardRejectedMessageToDMQ). n_rejected sizes the write
            # (late-bound: assigned on both counter paths before any call).
            append_to_queue(
                rejected.select(*self._dmq_cols),
                self.dmq_path,
                n_rows=n_rejected,
            )

        if obs is None:
            counts = finalised.agg(
                F.count(F.lit(1)),
                F.sum(F.when(F.col("rejectedish"), 1).otherwise(0)),
                F.sum(F.when(F.col("fully_finalised"), 1).otherwise(0)),
                F.sum(F.when(F.col("incomplete"), 1).otherwise(0)),
            ).first()
            n_messages = counts[0]
            n_rejected = counts[1] or 0
            n_fully_finalised = counts[2] or 0
            n_incomplete = counts[3] or 0
        _mark("exec_finalise_and_counters")
        if obs is None and n_rejected:
            # D3 seam: discardRejectedMessage (kinesis-processing.js:297).
            # Custom seams run serially (not assumed thread-safe); the
            # default append joins the concurrent sink pool below.
            if cfg.discard_rejected_message is not None:
                cfg.discard_rejected_message(rejected, self)
            elif cfg.deferred_discard_sinks:
                # the counters aggregate above materialized the finalised
                # checkpoint, so the deferred append reads settled data
                self._submit_deferred_sink(_default_dmq)
            else:
                sink_jobs.append(_default_dmq)

        # T4 save — message + rejected + unusable states, one parquet
        # upsert. Column lists are precomputed in __init__ (config-static);
        # only the batch_id literal is per-batch.
        batch_id_col = F.lit(batch_id).cast("long").alias("batch_id")
        msg_states = finalised.select(
            *self._t4_msg_head, batch_id_col, *self._t4_tail
        )
        unusable_states = unusable.select(
            *self._t4_unusable_head, batch_id_col, *self._t4_tail
        )
        default_saved = False
        if obs is not None or n_messages or n_unusable:
            # T4 seam: saveBatchState (default parquet MERGE upsert,
            # kinesis-processing.js:295 saveBatchStateToDynamoDB)
            states = msg_states.unionByName(unusable_states)
            if (
                cfg.track_distinct_sketch
                and cfg.save_batch_state is None
                # default LOAD seam required too: a custom load leaves
                # prior_all None, the max-merge would skip, and the
                # partition-replacing save would drop accumulated registers
                and cfg.load_batch_state is None
            ):
                # Per-shard HLL distinct-MESSAGE sketch: this batch's
                # registers over the checkpointed identities, max-merged
                # with the prior registers for the touched shards (the
                # save below REPLACES those partitions, so the merge must
                # happen pre-save). Register max-merge is idempotent —
                # replaying a failed batch re-merges the same maxima, so
                # the sketch stays exact-composable under at-least-once
                # delivery, unlike any additive counter.
                from kinesis_stream_consumer_spark.operators.sketches import (
                    hll_registers,
                )

                batch_regs = hll_registers(
                    msgs.select("shardOrEventID", "identity"),
                    "shardOrEventID",
                    F.col("identity"),
                )
                if prior_all is not None:
                    prior_regs = prior_all.where(
                        F.col("kind") == "sketch"
                    ).select(
                        F.col("shardOrEventID").alias("g"),
                        F.col("sketch_bucket").alias("bucket"),
                        F.col("sketch_r").alias("r"),
                    )
                    # eager checkpoint: the merge reads the very parquet
                    # partitions the save below replaces (the same hazard
                    # the finalised checkpoint exists for); the frame is
                    # register-sized (m × shards rows), so this is a tiny
                    # job, not a data pass.
                    batch_regs = (
                        batch_regs.unionByName(prior_regs)
                        .groupBy("g", "bucket")
                        .agg(F.max("r").alias("r"))
                        .localCheckpoint(eager=True)
                    )
                nul = F.lit(None).cast("string")
                sketch_states = batch_regs.select(
                    F.lit(cfg.stream_consumer_id).alias("streamConsumerId"),
                    F.col("g").alias("shardOrEventID"),
                    F.lit("sketch").alias("kind"),
                    F.concat(F.lit("HLL|"), F.col("bucket")).alias("identity"),
                    nul.alias("id"),
                    nul.alias("key"),
                    nul.alias("seqNo"),
                    nul.alias("event_id"),
                    nul.alias("event_seq_no"),
                    F.lit(None).cast("long").alias("event_sub_seq_no"),
                    nul.alias("msg_md5"),
                    nul.alias("rec_md5"),
                    nul.alias("data_md5"),
                    nul.alias("tasks_json"),
                    nul.alias("reason"),
                    F.lit(batch_id).cast("long").alias("batch_id"),
                    F.col("bucket").cast("long").alias("sketch_bucket"),
                    F.col("r").cast("long").alias("sketch_r"),
                )
                states = states.unionByName(sketch_states)
            # Additive sketches count PROCESSED messages — the delta
            # sources from the checkpointed post-exec `finalised` frame,
            # which the D1 within-batch dedup has already filtered, so a
            # record delivered twice INSIDE one batch counts once (the
            # HLL sketch is identity-keyed and immune either way; only
            # cross-batch re-delivery under a NEW batch_id overcounts —
            # the pinned additive bound). Both additive sketches require
            # the DEFAULT load seam too (not just the default save): a
            # custom load_batch_state leaves prior_all None, and merging
            # nothing before a save that REPLACES the shard partitions
            # would silently destroy the accumulated counters.
            sketch_shard = F.concat(
                F.lit("E|" if cfg.batch_keyed_on_event_id else "S|"),
                F.col(
                    "event_id" if cfg.batch_keyed_on_event_id else "shard_id"
                ),
            )
            default_seams = (
                cfg.save_batch_state is None and cfg.load_batch_state is None
            )
            if cfg.track_frequency_sketch and default_seams:
                # Per-shard Count-Min KEY-frequency sketch: cumulative
                # counters (kind='cms') plus THIS batch's delta
                # (kind='cms_delta', keyed by batch_id) — see
                # _additive_sketch_rows for the replay contract.
                from kinesis_stream_consumer_spark.operators.sketches import (
                    cms_counters,
                )

                states = states.unionByName(
                    self._additive_sketch_rows(
                        cms_counters(
                            # non-keyed configs canonicalise key to NULL for
                            # every message — hashing NULL would save one
                            # meaningless NULL-bucket register per batch that
                            # merges additively forever (mirror the qsketch
                            # isNotNull guard)
                            finalised.select(
                                sketch_shard.alias("shardOrEventID"), "key"
                            ).where(F.col("key").isNotNull()),
                            "shardOrEventID",
                            F.col("key"),
                        ),
                        prior_all,
                        batch_id,
                        "cms",
                        "cms_delta",
                        "CMS|",
                    )
                )
            if cfg.track_quantile_sketch and default_seams:
                # Per-shard log-linear QUANTILE sketch over the numeric
                # tail of the event sequence number (the per-shard
                # seqNo-spread / hot-range signal): same additive-register
                # replay contract as the CMS twin, ≤63·K+1 registers per
                # shard regardless of volume.
                from kinesis_stream_consumer_spark.operators.sketches import (
                    qsketch_buckets,
                )

                qs_src = finalised.select(
                    sketch_shard.alias("shardOrEventID"),
                    F.expr(
                        "CAST(substring(event_seq_no,"
                        " greatest(length(event_seq_no) - 14, 1), 15)"
                        " AS BIGINT)"
                    ).alias("v"),
                ).where(F.col("v").isNotNull())
                states = states.unionByName(
                    self._additive_sketch_rows(
                        qsketch_buckets(
                            qs_src, "shardOrEventID", F.col("v")
                        ).select("g", F.col("qid").alias("idx"), "cnt"),
                        prior_all,
                        batch_id,
                        "qsk",
                        "qsk_delta",
                        "QSK|",
                    )
                )
            if cfg.track_sample_sketch and default_seams:
                # Per-shard uniform message sample (kind='rsv'): the n+1
                # smallest md5-priority identities — the engine-native
                # reservoir sketch (operators/sketches reservoir_*, w=1).
                # Union prior register + this batch's keys, re-take the
                # n+1 smallest: a MIN-merge like the HLL registers —
                # idempotent, so replayed batches leave the sample
                # EXACTLY the single-pass sample (no delta bookkeeping).
                from kinesis_stream_consumer_spark.operators.dedup import (
                    md5_u56_le,
                )
                from kinesis_stream_consumer_spark.operators.sketches import (
                    reservoir_merge,
                )

                n_rsv = cfg.sample_sketch_n
                batch_keys = finalised.select(
                    sketch_shard.alias("g"),
                    F.col("identity").alias("id"),
                    F.lit(1).cast("long").alias("w"),
                    # uniform draw: pri = u div 1 = the 56-bit md5 integer
                    md5_u56_le(F.col("identity")).alias("pri"),
                )
                if prior_all is not None:
                    prior_rsv = prior_all.where(
                        F.col("kind") == "rsv"
                    ).select(
                        F.col("shardOrEventID").alias("g"),
                        F.expr("substring(identity, 5)").alias("id"),
                        F.lit(1).cast("long").alias("w"),
                        F.col("sketch_r").alias("pri"),
                    )
                    batch_keys = batch_keys.unionByName(prior_rsv)
                regs = reservoir_merge(batch_keys, n_rsv)
                if prior_all is not None:
                    # same overwrite-under-read guard as the HLL merge:
                    # the save below replaces the partitions the prior
                    # register was read from; the frame is <= n+1 rows
                    # per shard, so this is a tiny job
                    regs = regs.localCheckpoint(eager=True)
                rnul = F.lit(None).cast("string")
                rsv_states = regs.select(
                    F.lit(cfg.stream_consumer_id).alias("streamConsumerId"),
                    F.col("g").alias("shardOrEventID"),
                    F.lit("rsv").alias("kind"),
                    F.concat(F.lit("RSV|"), F.col("id")).alias("identity"),
                    rnul.alias("id"),
                    rnul.alias("key"),
                    rnul.alias("seqNo"),
                    rnul.alias("event_id"),
                    rnul.alias("event_seq_no"),
                    F.lit(None).cast("long").alias("event_sub_seq_no"),
                    rnul.alias("msg_md5"),
                    rnul.alias("rec_md5"),
                    rnul.alias("data_md5"),
                    rnul.alias("tasks_json"),
                    rnul.alias("reason"),
                    F.lit(batch_id).cast("long").alias("batch_id"),
                    F.col("rank").cast("long").alias("sketch_bucket"),
                    F.col("pri").cast("long").alias("sketch_r"),
                )
                states = states.unionByName(rsv_states)
            if cfg.save_batch_state is not None:
                cfg.save_batch_state(states, self)
                self._saved_state_cache = None  # unknown destination
                self._revive_slice_cache = None
            else:
                sink_jobs.append(
                    lambda: self.state.save(
                        states, n_partitions=max(1, min(len(shards), width))
                    )
                )
                default_saved = True
        _mark("t4_plan_build")
        # (r7 A/B: scoping AQE OFF around the save — its shuffles are all
        # explicitly sized, so AQE only adds sub-job cadence — measured as
        # pure noise across interleaved trials; keeping session AQE
        # untouched.)
        if len(sink_jobs) == 1:
            sink_jobs[0]()
        elif sink_jobs:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(len(sink_jobs)) as pool:
                for fut in [pool.submit(j) for j in sink_jobs]:
                    fut.result()  # propagate the first failure
        _mark("t4_save_write")
        if default_saved:
            # the written partitions now equal `states` exactly — serve the
            # next batch's T1 load from it (lazy over checkpointed inputs)
            self._saved_state_cache = (frozenset(shards), states)
            # pre-plan the next batch's revive slice HERE (see __init__):
            # the lazy localCheckpoint runs Catalyst once over the slim
            # 4-column projection and hands the next overlap build a
            # checkpoint leaf. No job runs — computation happens inside
            # the next batch's first action over checkpointed inputs.
            self._revive_slice_cache = (
                states.where(F.col("kind").isin("message", "rejected"))
                .select("shardOrEventID", "identity", "msg_md5", "tasks_json")
                .localCheckpoint(eager=False)
            )
        _mark("revive_slice_plan")
        if obs is not None:
            # The save (or a sketch merge before it) executed the observed
            # plan; the listener delivers the metrics moments after the
            # action returns. DMQ runs after the counters on this path —
            # its job reads the now-materialized checkpoint, so the only
            # serialization cost is the (small) envelope write itself.
            row = obs.get
            n_messages = int(row["n_messages"] or 0)
            n_rejected = int(row["n_rejected"] or 0)
            n_fully_finalised = int(row["n_ff"] or 0)
            n_incomplete = int(row["n_inc"] or 0)
            if default_saved and not (n_messages or n_unusable):
                # zero rows were written: the cache would claim these
                # shards hold nothing while disk still has their old rows
                self._saved_state_cache = None
                self._revive_slice_cache = None
        _mark("obs_counters")
        if obs is not None and n_rejected:
            if cfg.discard_rejected_message is not None:
                cfg.discard_rejected_message(rejected, self)
            elif cfg.deferred_discard_sinks:
                # the save's action materialized the finalised checkpoint;
                # the append itself comes off the batch critical path and
                # joins at the next batch (or drain_discard_sinks)
                self._submit_deferred_sink(_default_dmq)
            else:
                _default_dmq()
        _mark("dlq_and_state_save")

        if _timing:
            total = sum(d for _, d in _marks)
            _sys.stderr.write(
                "ENGINE_TIMING batch=%s total=%.3f %s\n"
                % (batch_id, total,
                   " ".join(f"{k}={d:.3f}" for k, d in _marks))
            )
        result = BatchResult(
            batch_id=batch_id,
            records=n_records,
            messages=n_messages,
            unusable=n_unusable,
            fully_finalised=n_fully_finalised,
            rejected_to_dmq=n_rejected,
            discarded_to_drq=n_unusable,
            incomplete=n_incomplete,
            exec_partitions=n_parts,
        )
        self.last_section_times = dict(_marks)
        # F3 hook: postFinaliseBatch
        if cfg.post_finalise_batch is not None:
            cfg.post_finalise_batch(result, self)
        if (
            self.compact_every_n_batches
            and not n_incomplete
            and batch_id > 0
            and batch_id % self.compact_every_n_batches == 0
        ):
            self.state.compact(batch_id - self.compact_retention_batches)
            self._saved_state_cache = None  # disk rewritten under the cache
            self._revive_slice_cache = None
        if n_incomplete:
            # F2: in unsequenced mode with a resubmit sink configured,
            # incomplete messages are resubmitted to the source instead of
            # failing the whole batch (test titles
            # kinesis-consumer.unseq.test.js:1521,1867,2911,3063) — ordering
            # doesn't matter there, so replaying only stragglers is safe.
            if (
                not cfg.sequencing_required
                and self.resubmit_path is not None
            ):
                from kinesis_stream_consumer_spark.sources.records import (
                    KINESIS_RECORD_SCHEMA,
                )

                incomplete_records = (
                    finalised.where(F.col("incomplete"))
                    .select(
                        F.from_json("record_json", KINESIS_RECORD_SCHEMA).alias("r")
                    )
                    .select("r.*")
                )
                incomplete_records.write.mode("append").json(self.resubmit_path)
                return result
            raise BatchReplayError(result)  # F1: fail ⇒ source replays batch
        return result

    # --- S1: streaming attachment ------------------------------------------

    def attach(
        self,
        record_stream: DataFrame,
        checkpoint_dir: str,
        swallow_replay_errors: bool = False,
    ):
        """writeStream.foreachBatch(process_batch): each micro-batch plays
        one reference "stream event"; raising inside foreachBatch makes
        Spark retry the micro-batch = the Kinesis replay contract (F1)."""

        def run(df: DataFrame, bid: int):
            try:
                self.process_batch(df, bid)
            except BatchReplayError:
                if not swallow_replay_errors:
                    raise

        return (
            record_stream.writeStream.foreachBatch(run)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
        )
