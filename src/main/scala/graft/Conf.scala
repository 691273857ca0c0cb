package graft

import org.apache.spark.storage.StorageLevel

/** Engine-wide tuning knobs read from the environment. */
object Conf {

  /** Storage level for the engine's internal persists: the per-event TBM
    * table, the cached event-weights tables, and the affine scan's sorted
    * layout. MEMORY_AND_DISK by default (local iteration); set
    * `SPARK_GRAFT_STORAGE=DISK_ONLY` when the cached tables approach
    * executor memory (TB-scale inputs) so the persists never compete with
    * shuffle/aggregation working memory — SYM_SCALING.json records the
    * 256-symbol fixture run certifying the chain under that setting.
    */
  val storageLevel: StorageLevel =
    StorageLevel.fromString(
      sys.env.getOrElse("SPARK_GRAFT_STORAGE", "MEMORY_AND_DISK"))

  /** Reliable-checkpoint directory for iterative jobs (connected
    * components). Unset (local iteration): `localCheckpoint` — fastest,
    * but blocks live on executors, so a lost executor kills the job. Set
    * to a fault-tolerant path (HDFS/object store) on a real cluster: each
    * round's labels are written through [[org.apache.spark.sql.Dataset#checkpoint]]
    * and survive executor loss — the difference between a 100 TB dedup
    * run restarting a round and restarting from zero.
    * A `def` reading the `spark.graft.checkpoint.dir` system property
    * first so specs can toggle the mode in-process.
    */
  def checkpointDir: Option[String] =
    sys.props.get("spark.graft.checkpoint.dir")
      .orElse(sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR"))
}
