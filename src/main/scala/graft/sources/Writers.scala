package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Output-layout utilities for engine results at scale.
  *
  * [[writeSortedClustered]] is the scalable replacement for the
  * reference's single sorted output file (`src/MapReduceMaster.java:
  * 449-478`): range-repartition on the sort key then sort within
  * partitions, so part files cover disjoint, globally ordered key ranges.
  * Consequences at 100 TB: no single-task sink bottleneck, and parquet
  * min/max footer stats per file line up with the key, so downstream
  * point/range reads prune whole files (verified in WritersSpec by
  * checking the ranges really are disjoint).
  */
object Writers {

  def writeSortedClustered(df: DataFrame, sortCols: Seq[String],
                           path: String, numPartitions: Int = 0): Unit = {
    val keyCols = sortCols.map(col)
    val ranged =
      if (numPartitions > 0) df.repartitionByRange(numPartitions, keyCols: _*)
      else df.repartitionByRange(keyCols: _*)
    ranged.sortWithinPartitions(keyCols: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
