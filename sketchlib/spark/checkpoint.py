"""Per-partition sketch checkpointing with lineage + metrics, and resume.

North rule: "checkpoint partial sketches per partition with lineage +
metrics rows to Iceberg so a killed run resumes without recomputing
finished partitions".

Design:
- Work is split into ``n_parts`` *logical* partitions by a deterministic
  content hash (``pmod(xxhash64(id_col), n_parts)``) — stable across runs
  and across physical partitioning, unlike ``spark_partition_id``.
- Each logical partition's partial digests (one per key) are appended to the
  checkpoint table with lineage (run_id, part_id, input fingerprint) and
  metrics (rows ingested, wall ms) — one writer task per logical partition
  via ``repartition(n_parts, part_id)`` + ``foreachPartition``-free
  mapInPandas append (idempotent: re-running a finished partition overwrites
  the same rows).
- Resume = LEFT ANTI JOIN of pending part_ids against completed ones
  (broadcast: the checkpoint side is tiny) → only unfinished partitions are
  recomputed.
- Finalize = lossless union of all checkpointed partials per key + one
  deterministic compress ⇒ the final digest is byte-identical whether the
  run was interrupted 0 or N times (order-independent merge).

Storage: an Iceberg table when a catalog is configured (``iceberg_table``),
else a parquet directory with one file per (run, attempt, partition) —
same schema, append-only, hermetic for tests (SURVEY.md §7.3.7).
"""

from __future__ import annotations

import os
import time
import uuid
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from sketchlib.tdigest.core import MergingDigest

CHECKPOINT_SCHEMA = (
    "run_id string, part_id int, key string, digest binary, "
    "rows long, wall_ms double, input_snapshot string, lineage string"
)


class TDigestCheckpointer:
    """Checkpointer for any sketch kind; named for its default.

    ``sketch='tdigest'`` (default) ingests the value column as float64 and
    finalizes via lossless digest union + compress.  Sibling kinds
    ('hll'/'cms'/'bloom'/'kll'/'kmv', see ``sketch_ops.SKETCHES``) ingest
    via the same JVM-side xxhash64 projection as the batch path and
    finalize via their own merge; for the order-insensitive kinds the
    byte-identical-resume guarantee holds exactly as for digests."""

    def __init__(
        self,
        spark: SparkSession,
        ckpt_path: str,
        keys: list[str],
        value_col: str,
        id_col: str,
        n_parts: int = 64,
        delta: float = 0.01,
        discrete: bool = False,
        run_id: str | None = None,
        sketch: str = "tdigest",
        params: dict | None = None,
        table_format: str = "parquet",
    ) -> None:
        self.spark = spark
        self.ckpt_path = ckpt_path
        self.keys = keys
        self.value_col = value_col
        self.id_col = id_col
        self.n_parts = n_parts
        self.delta = delta
        self.discrete = discrete
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.sketch = sketch
        self.params = dict(params or {})
        # checkpoint table format: any Spark batch source with append
        # support works (parquet default; orc exercised in tests) — the
        # state is plain (part_id, key, digest, metrics) rows, which is
        # also why the Iceberg mapping is a one-line writeTo().append()
        # when a catalog exists (tools/probe_iceberg.py)
        if table_format not in ("parquet", "orc"):
            raise ValueError(f"unsupported checkpoint format {table_format!r}")
        self.table_format = table_format
        if sketch != "tdigest":
            from sketchlib.spark.sketch_ops import SKETCHES

            if sketch not in SKETCHES:
                raise ValueError(f"unknown sketch kind {sketch!r}")

    # -- helpers ---------------------------------------------------------------

    def _with_part_id(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "_part_id", F.pmod(F.xxhash64(self.id_col), F.lit(self.n_parts)).cast("int")
        )

    def _lineage(self) -> str:
        if self.sketch == "tdigest":
            return (f"tdigest(delta={self.delta},discrete={self.discrete})"
                    f"<-{self.value_col} by {','.join(self.keys)}")
        # canonical params rendering: the same logical config must produce
        # the same lineage string regardless of dict insertion order or
        # integral-float spelling (p=14 vs p=14.0), or a legitimate resume
        # would be refused
        import json

        def _canon_v(v):
            if isinstance(v, float) and not isinstance(v, bool) and v.is_integer():
                return int(v)
            return v

        canon = json.dumps(
            {k: _canon_v(v) for k, v in self.params.items()},
            sort_keys=True, separators=(",", ":"),
        )
        return f"{self.sketch}({canon})<-{self.value_col} by {','.join(self.keys)}"

    def _lineage_legacy(self) -> str:
        """The pre-canonicalization spelling (params dict repr) — accepted
        on read so checkpoints written before the format change stay
        resumable; new rows are always written in canonical form."""
        if self.sketch == "tdigest":
            return self._lineage()
        return f"{self.sketch}({self.params})<-{self.value_col} by {','.join(self.keys)}"

    def completed_parts(self) -> DataFrame:
        """Distinct part_ids already checkpointed (any run attempt counts:
        partials are deterministic per partition).  Refuses to resume a
        checkpoint whose recorded lineage (sketch kind/params/value/keys)
        differs from this configuration — mixing incompatible partials
        would either crash late (merge param mismatch) or finalize silently
        wrong."""
        spark = self.spark
        try:
            done = spark.read.format(self.table_format).load(self.ckpt_path)
        except Exception as e:
            # ONLY a missing path means "fresh run".  Any other read error
            # (e.g. resuming a parquet checkpoint with table_format="orc")
            # must be a hard stop: silently returning the empty set would
            # restart from scratch and append mixed-format files into the
            # same directory.
            msg = str(e)
            if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
                return spark.createDataFrame([], "part_id int")
            raise ValueError(
                f"checkpoint at {self.ckpt_path} exists but is unreadable as "
                f"{self.table_format!r} — wrong table_format for an existing "
                f"checkpoint? ({msg.splitlines()[0]})"
            ) from e
        lineages = [r["lineage"] for r in done.select("lineage").distinct().collect()]
        ok = {self._lineage(), self._lineage_legacy()}
        if lineages and not set(lineages) <= ok:
            raise ValueError(
                f"checkpoint at {self.ckpt_path} was written with lineage "
                f"{lineages} but this run is {self._lineage()!r}; use a fresh "
                "--checkpoint path (or matching parameters) to resume"
            )
        return done.select("part_id").distinct()

    # -- run -------------------------------------------------------------------

    def run(self, df: DataFrame, fail_after_parts: int | None = None) -> int:
        """Process pending partitions, appending one checkpoint row per
        (partition, key).  ``fail_after_parts`` injects a crash after that
        many partitions complete (for resume tests).  Returns #partitions
        processed."""
        from sketchlib.spark.shipping import ensure_on_workers

        ensure_on_workers(self.spark)
        hashed = False
        if self.sketch != "tdigest":
            from sketchlib.spark.sketch_ops import _HASHED

            hashed = self.sketch in _HASHED
        # project the value into an internal column: keeps the plan valid
        # when value_col == id_col (or a key), carries the hash for the
        # hashed kinds, and casts to double for the numeric kinds exactly
        # like the batch path (sketch_ops.sketch_partials / tdigest_partials)
        val = (F.xxhash64(self.value_col) if hashed
               else F.col(self.value_col).cast("double")).alias("_v")
        tagged = self._with_part_id(df.select(self.id_col, *self.keys, val))
        done = self.completed_parts()
        pending = tagged.join(
            F.broadcast(done.withColumnRenamed("part_id", "_part_id")),
            "_part_id",
            "left_anti",
        )
        pending_ids = [r["_part_id"] for r in pending.select("_part_id").distinct().collect()]
        if fail_after_parts is not None:
            pending_ids = sorted(pending_ids)[:fail_after_parts]
            pending = pending.where(F.col("_part_id").isin(pending_ids))
        if not pending_ids:
            return 0

        keys, value_col, delta, discrete = (
            self.keys, self.value_col, self.delta, self.discrete,
        )
        run_id, ckpt_path, input_snapshot = (
            self.run_id, self.ckpt_path, self._input_snapshot(df),
        )
        sketch, params = self.sketch, self.params
        lineage = self._lineage()

        def build(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import numpy as np

            if sketch == "tdigest":
                make = lambda: MergingDigest(delta=delta, discrete=discrete)  # noqa: E731
            else:
                from sketchlib.spark.sketch_ops import SKETCHES

                cls = SKETCHES[sketch]
                make = lambda: cls(**params)  # noqa: E731

            t0 = time.time()
            aggs: dict[tuple, object] = {}
            rows_per_part: dict[int, int] = {}
            for pdf in batches:
                if hashed:
                    vals = pdf["_v"].to_numpy(dtype="int64").view(np.uint64)
                else:
                    vals = pdf["_v"].to_numpy(dtype="float64", na_value=np.nan)
                for gk, idx in pdf.groupby(["_part_id"] + keys, sort=False).indices.items():
                    gk = gk if isinstance(gk, tuple) else (gk,)
                    agg = aggs.get(gk)
                    if agg is None:
                        agg = aggs[gk] = make()
                    if hashed:
                        agg.update_hashed(vals[idx])
                    else:
                        agg.update_batch(vals[idx])
                    rows_per_part[gk[0]] = rows_per_part.get(gk[0], 0) + len(idx)
            if not aggs:
                return
            wall = (time.time() - t0) * 1000.0
            out = pd.DataFrame(
                {
                    "run_id": run_id,
                    "part_id": [gk[0] for gk in aggs],
                    "key": ["|".join(str(x) for x in gk[1:]) for gk in aggs],
                    "digest": [a.serialize() for a in aggs.values()],
                    "rows": [rows_per_part[gk[0]] for gk in aggs],
                    "wall_ms": wall,
                    "input_snapshot": input_snapshot,
                    "lineage": lineage,
                }
            )
            yield out

        ckpt_rows = (
            pending.repartition(len(pending_ids), "_part_id")
            .mapInPandas(build, schema=CHECKPOINT_SCHEMA)
        )
        ckpt_rows.write.mode("append").format(self.table_format).save(ckpt_path)
        return len(pending_ids)

    def _input_snapshot(self, df: DataFrame) -> str:
        files = df.inputFiles()
        return f"files={len(files)}"

    # -- finalize ---------------------------------------------------------------

    def finalize(self) -> DataFrame:
        """Merge all checkpointed partials into one sketch per key —
        order-independent, so interrupted and clean runs agree byte-for-byte
        (exactly, for the order-insensitive kinds)."""
        ckpt = self.spark.read.format(self.table_format).load(self.ckpt_path)
        # deduplicate retried partitions (same part_id written twice): partials
        # are deterministic per (part_id, key), keep one
        partials = ckpt.dropDuplicates(["part_id", "key"]).select("key", "digest")
        if self.sketch == "tdigest":
            from sketchlib.spark.tdigest_ops import tdigest_merge

            return tdigest_merge(partials, ["key"], self.delta, self.discrete,
                                 compress=True)
        from sketchlib.spark.sketch_ops import sketch_merge

        return sketch_merge(
            partials.withColumnRenamed("digest", "sketch"), ["key"],
            self.sketch, self.params,
        ).withColumnRenamed("sketch", "digest")
