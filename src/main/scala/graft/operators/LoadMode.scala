package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Deserialization residency knob — the reference's `enable_mmap` /
  * `enable_mmap_pop` pair (`include/knowhere/config.h:604-605,684-694`;
  * MAP_POPULATE wiring `src/index/sparse/sparse_index_node.cc:308-313`):
  * a loaded index either sits fully resident, is served lazily from its
  * file pages, or is mmapped with pages prefaulted.
  *
  * Spark rendering over the loaded parquet frames:
  *  - [[LoadMode.Resident]] (`enable_mmap=false`): persist
  *    MEMORY_AND_DISK and materialize eagerly — the fully-populated
  *    in-memory index.
  *  - [[LoadMode.Mapped]] (`enable_mmap=true`): no persist — every read
  *    pages columns in from parquet on demand, the lazy-mmap analog (and
  *    the long-standing default of every loader).
  *  - [[LoadMode.MappedPopulated]] (`enable_mmap_pop=true`): persist
  *    DISK_ONLY and materialize eagerly — pages prefaulted into Spark's
  *    local block store (decoded, locality-pinned) without claiming
  *    executor memory, the MAP_POPULATE analog.
  */
sealed trait LoadMode
object LoadMode {
  case object Resident extends LoadMode
  case object Mapped extends LoadMode
  case object MappedPopulated extends LoadMode

  /** Apply the residency policy to a loaded frame. */
  def apply(df: DataFrame, mode: LoadMode): DataFrame = mode match {
    case Mapped => df
    case Resident =>
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      p.count()
      p
    case MappedPopulated =>
      val p = df.persist(StorageLevel.DISK_ONLY)
      p.count()
      p
  }
}
