"""User-facing engine facade — the single import a reference user
switches to:

    from lambda_hive_spark.api import Engine

    eng = Engine(sf_dir="/root/testdata/sf0.01")   # or Engine(spark=...)
    eng.table("orders")                  # DataFrame over a fixture table
    eng.sql("SELECT count(*) FROM lineitem")       # SQL frontend
    eng.run("agg_hash")                  # any registered operator by name
    eng.ops()                            # the full operator inventory
    eng.stream_events(landing_dir)       # unbounded events source
    eng.dag()                            # workflow-DAG builder
    eng.lake(path)                       # ACID lake table handle
    #   .create(df, key, partition_by=[...], generated={...})
    #   .append(df) .merge_upsert(updates) .replace_where(pred, df)
    #   .read(version=N) .read(ref="prod") .partitions()
    #   .create_ref/.set_ref/.drop_ref/.refs()  (tags + branches)
    #   .clone_to(target) .compact() .vacuum() .history()
    eng.lake_sql({"t": path})            # SQL DML/time-travel surface
    #   .sql("MERGE INTO t USING ...") .sql("UPDATE t SET ...")
    #   .sql("SELECT ... FROM t VERSION AS OF 3")

Everything is a thin delegation to the modules that own the logic —
the facade adds discoverability, not behavior.

Reference file:line: N/A — empty reference dir (SURVEY.md §0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lambda_hive_spark import io
from lambda_hive_spark.orchestrator import Dag
from lambda_hive_spark.registry import Op, all_ops
from lambda_hive_spark.session import get_spark, tune_runtime


class Engine:
    """A session + a fixture directory + the operator registry."""

    def __init__(self, sf_dir: str, spark: SparkSession | None = None) -> None:
        self.sf_dir = sf_dir
        self.spark = tune_runtime(spark) if spark is not None else get_spark()
        self._views_registered = False

    # -- data access ---------------------------------------------------
    def table(self, name: str) -> DataFrame:
        return io.table(self.spark, self.sf_dir, name)

    def sql(self, query: str) -> DataFrame:
        """SQL over the ten fixture tables (views registered lazily)."""
        if not self._views_registered:
            io.register_views(self.spark, self.sf_dir)
            self._views_registered = True
        return self.spark.sql(query)

    # -- operators -----------------------------------------------------
    def ops(self) -> dict[str, Op]:
        return all_ops()

    def run(self, op_name: str) -> DataFrame:
        ops = all_ops()
        if op_name not in ops:
            raise KeyError(
                f"unknown op {op_name!r}; known ops: {', '.join(sorted(ops))}"
            )
        return ops[op_name].fn(self.spark, self.sf_dir)

    def oracle(self, op_name: str) -> str | None:
        """The DuckDB-dialect twin of an op (None for rows-only ops)."""
        return all_ops()[op_name].oracle

    def explain(self, op_name: str, allow_side_effects: bool = False) -> str:
        """The executed physical plan of an op — the review artifact
        for every would-this-scale question.

        Ops tagged ``side_effect`` (sinks, bucketed-table builders,
        compaction, orchestrators, streaming runs) *execute writes* to
        produce their result, so explaining them is not read-only;
        refuse unless the caller opts in with ``allow_side_effects``."""
        if "side_effect" in all_ops()[op_name].tags and not allow_side_effects:
            raise ValueError(
                f"op {op_name!r} writes tables/files when run; "
                "explain(op, allow_side_effects=True) to accept that"
            )
        df = self.run(op_name)
        return df._jdf.queryExecution().executedPlan().toString()

    def cache_table(self, name: str) -> DataFrame:
        """Register + cache a fixture table (InMemoryTableScan on
        subsequent reads — for dims reused across many queries)."""
        io.table(self.spark, self.sf_dir, name).createOrReplaceTempView(name)
        self.spark.catalog.cacheTable(name)
        return self.spark.table(name)

    # -- streaming / orchestration ------------------------------------
    def stream_events(self, landing_dir: str | None = None, **kwargs) -> DataFrame:
        from lambda_hive_spark.streaming import core

        return core.events_stream(
            self.spark, landing_dir or core.landing_dir(self.sf_dir), **kwargs
        )

    def dag(self) -> Dag:
        return Dag()

    # -- lakehouse table layer ----------------------------------------
    def catalog(self, root: str):
        """Name catalog over lake tables with atomic multi-table
        pointer-swap transactions (catalog.py): create_table/drop/
        rename, snapshot-consistent reads across tables, and
        Transaction (stage per-table commits, publish all pointers in
        one catalog commit — first committer wins per table)."""
        from lambda_hive_spark.catalog import Catalog

        return Catalog(root)

    def lake(self, path: str) -> "LakeTable":
        """Handle to an ACID lake table at `path` (lakehouse.py):
        versioned commits, snapshot reads / time travel, stats-pruned
        MERGE, compaction, vacuum."""
        return LakeTable(self.spark, path)

    def lake_sql(
        self,
        tables: dict[str, str] | None = None,
        catalog_root: str | None = None,
    ):
        """SQL statement surface over lake tables (lake_sql.py):
        MERGE INTO / UPDATE / DELETE FROM / SELECT … VERSION AS OF
        <n | 'ref'> / RESTORE TABLE / DESCRIBE HISTORY / VACUUM /
        OPTIMIZE, each compiled onto the lakehouse verb that owns the
        semantics. Name resolution: the `tables` dict, then (if given)
        a Catalog root."""
        from lambda_hive_spark.lake_sql import LakeSQL

        return LakeSQL(self.spark, tables, catalog_root)


class LakeTable:
    """Bound (session, path) facade over lambda_hive_spark.lakehouse —
    same thin-delegation contract as Engine itself."""

    def __init__(self, spark: SparkSession, path: str) -> None:
        from lambda_hive_spark import lakehouse

        self._lh = lakehouse
        self.spark = spark
        self.path = path

    def create(
        self,
        df: DataFrame,
        key: str,
        *,
        constraints: dict | None = None,
        partition_by: list | None = None,
        generated: dict | None = None,
    ) -> int:
        return self._lh.create(
            self.spark,
            self.path,
            df,
            key,
            constraints=constraints,
            partition_by=partition_by,
            generated=generated,
        )

    def clone_to(self, target: str) -> int:
        """Zero-copy shallow clone of this table's head at `target`."""
        return self._lh.clone(self.spark, self.path, target)

    def append(self, df: DataFrame, *, merge_schema: bool = False) -> int:
        return self._lh.append(self.spark, self.path, df, merge_schema=merge_schema)

    def append_idempotent(self, df: DataFrame, *, writer_id: str, batch_id: int) -> int:
        """Exactly-once append keyed by (writer_id, batch_id) — the
        foreachBatch sink primitive; redelivered batches are no-ops."""
        return self._lh.append_idempotent(
            self.spark, self.path, df, writer_id=writer_id, batch_id=batch_id
        )

    def read(self, version: int | None = None, *, ref: str | None = None) -> DataFrame:
        return self._lh.read(self.spark, self.path, version, ref=ref)

    # -- named refs (tags immutable, branches re-pointable) -----------
    def create_ref(self, name: str, version: int | None = None, *, kind: str = "tag") -> dict:
        """Tag/branch `name` at `version` (default head); read(ref=name)
        resolves it, vacuum never reaps its target until drop_ref."""
        return self._lh.create_ref(self.path, name, version, kind=kind)

    def set_ref(self, name: str, version: int) -> dict:
        """Atomically re-point a branch (the promote step); tags refuse."""
        return self._lh.set_ref(self.path, name, version)

    def drop_ref(self, name: str) -> None:
        return self._lh.drop_ref(self.path, name)

    def refs(self) -> dict:
        return self._lh.list_refs(self.path)

    def scan(
        self,
        *,
        key_min=None,
        key_max=None,
        predicates: dict | None = None,
        point: dict | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """Snapshot scan with manifest-stats file skipping (key range,
        any stats-tracked column box, or bloom-indexed point lookup)."""
        return self._lh.scan(
            self.spark,
            self.path,
            key_min=key_min,
            key_max=key_max,
            predicates=predicates,
            point=point,
            version=version,
        )

    def scan_where(self, predicate: str, *, version: int | None = None) -> DataFrame:
        """Predicate scan with automatic sargable-bounds file pruning."""
        return self._lh.scan_where(self.spark, self.path, predicate, version=version)

    def bloom_index(self, col: str, *, bits_per_row: int = 10, k: int = 7) -> int:
        """Build a per-file bloom point-lookup index on `col`."""
        return self._lh.bloom_index(
            self.spark, self.path, col, bits_per_row=bits_per_row, k=k
        )

    def delete_where(
        self,
        predicate: str,
        *,
        prune: dict | str | None = "auto",
        track_changes: bool = False,
        deletion_vectors: bool = False,
    ) -> int:
        """DELETE; pruning bounds compile from the predicate by
        default (prune="auto"). ``deletion_vectors=True`` switches
        from copy-on-write to merge-on-read (positions recorded in a
        log sidecar, zero data files rewritten — the trickle-delete
        path; compact()/optimize() materializes later)."""
        return self._lh.delete_where(
            self.spark,
            self.path,
            predicate,
            prune=prune,
            track_changes=track_changes,
            deletion_vectors=deletion_vectors,
        )

    def restore(self, version: int) -> int:
        """Rewind the table to snapshot `version` as a new commit."""
        return self._lh.restore(self.spark, self.path, version)

    def add_constraint(self, name: str, expr: str) -> int:
        return self._lh.add_constraint(self.spark, self.path, name, expr)

    def drop_constraint(self, name: str) -> int:
        return self._lh.drop_constraint(self.path, name)

    def read_incremental(self, since_version: int, to_version: int | None = None) -> DataFrame:
        """Rows in files added after `since_version` (up to `to_version`/head)."""
        return self._lh.read_incremental(self.spark, self.path, since_version, to_version)

    def merge_upsert(
        self,
        updates: DataFrame,
        *,
        track_changes: bool = False,
        merge_schema: bool = False,
    ) -> int:
        return self._lh.merge_upsert(
            self.spark,
            self.path,
            updates,
            track_changes=track_changes,
            merge_schema=merge_schema,
        )

    def read_changes(self, version: int) -> DataFrame:
        """Row-level change feed of one commit (`_change_type` tagged)."""
        return self._lh.read_changes(self.spark, self.path, version)

    def replace_where(
        self, predicate: str, df: DataFrame, *, track_changes: bool = False
    ) -> int:
        """Dynamic partition overwrite: atomically swap the partitions
        the predicate selects for `df` (the idempotent-backfill verb)."""
        return self._lh.replace_where(
            self.spark, self.path, predicate, df, track_changes=track_changes
        )

    def partitions(self, version: int | None = None) -> list[dict]:
        """Partition listing with file/row counts (manifest-only)."""
        return self._lh.partitions(self.path, version)

    def repartition_table(self, partition_by: list | None) -> int:
        """Evolve the partition spec (or None to un-partition) as a
        rewrite commit."""
        return self._lh.repartition_table(self.spark, self.path, partition_by)

    def compact(self, num_files: int = 1) -> int:
        return self._lh.compact(self.spark, self.path, num_files)

    def zorder_cluster(self, cols: list, num_files: int = 8) -> int:
        """Rewrite the snapshot clustered by the Z-value of `cols` so
        multi-column predicates prune files (Delta OPTIMIZE ZORDER)."""
        return self._lh.zorder_cluster(self.spark, self.path, cols, num_files)

    def vacuum(self, keep_last: int = 1) -> list[str]:
        return self._lh.vacuum(self.path, keep_last)

    def version(self) -> int:
        return self._lh.current_version(self.path)

    def history(self) -> list[dict]:
        """Commit metadata for every retained version, oldest first:
        the engine's history() (action, parent, operation metrics)
        enriched with each snapshot's file/row totals."""
        out = []
        for h in self._lh.history(self.path):
            m = self._lh.read_manifest(self.path, h["version"])
            out.append(
                {
                    **h,
                    "n_files": len(m["files"]),
                    "n_rows": sum(f["rows"] for f in m["files"]),
                }
            )
        return out
