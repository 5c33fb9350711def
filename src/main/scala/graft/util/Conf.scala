package graft.util

import org.apache.spark.sql.SparkSession

/** Typed reads of `graft.*` tuning knobs from the session conf. A
  * malformed value fails with the conf key and the offending text in the
  * message instead of an uncontextualized NumberFormatException from a
  * bare `.toLong` deep inside an operator.
  */
object Conf {

  def long(spark: SparkSession, key: String, default: Long): Long =
    spark.conf.getOption(key).map { v =>
      try v.trim.toLong
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"conf $key must be a long, got '$v'")
      }
    }.getOrElse(default)
}
