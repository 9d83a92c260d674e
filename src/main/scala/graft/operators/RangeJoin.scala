package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join: pair left rows with right rows whose ordering value
  * falls within ±band of the left's, on an equi-key.
  *
  * The naive plan (`l.key = r.key AND abs(l.ord - r.ord) <= band`) is an
  * equi-join on key followed by a per-key cross-product filter — quadratic in
  * the hottest key. This implementation buckets the ordering dimension at
  * `band` width and replicates the RIGHT side into each bucket it can serve
  * (3 buckets per row: its own ± one), so the join is a pure equi-join on
  * (key, bucket) and each left row meets only right rows from a bounded
  * neighborhood. Replication factor is constant (3), independent of data
  * size; the exact band predicate filters the candidates.
  */
object RangeJoin {

  /** @param left      probe side, columns (key, ord, ...) — all preserved
    * @param right     build side
    * @param key       equi-join key (same name both sides)
    * @param ord       numeric/date-day ordering column name (same both sides)
    * @param band      half-width: keep pairs with |l.ord - r.ord| <= band
    * @param rightCols right columns to carry (emitted as `r_<name>`)
    */
  def bandJoin(left: DataFrame, right: DataFrame, key: String, ord: String,
               band: Long, rightCols: Seq[String]): DataFrame = {
    def bucket(c: Column): Column = floor(c / band)
    val l = left.withColumn("__b", bucket(col(ord)))
    val r = right
      .select((key +: ord +: rightCols).map(col): _*)
      .toDF((Seq(key, s"__r_$ord") ++ rightCols.map("__r_" + _)): _*)
      .withColumn("__b", explode(array(
        bucket(col(s"__r_$ord")) - 1, bucket(col(s"__r_$ord")), bucket(col(s"__r_$ord")) + 1)))
    l.join(r, Seq(key, "__b"))
      .filter(abs(col(ord) - col(s"__r_$ord")) <= band)
      .drop("__b")
      .withColumnRenamed(s"__r_$ord", s"r_$ord")
      .withColumns(rightCols.map(c => s"r_$c" -> col(s"__r_$c")).toMap)
      .drop(rightCols.map("__r_" + _): _*)
  }
}
