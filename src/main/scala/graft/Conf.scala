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
}
