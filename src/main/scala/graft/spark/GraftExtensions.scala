package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `spark.sql.extensions` entry point — the spark-submit path for making the
  * engine's column functions available in SQL without any driver code (the
  * Spark-native analog of importing the reference's pybind module,
  * `/root/reference/src/pybind.h:6-84`):
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.spark.GraftExtensions ...
  * }}}
  *
  * Injects every builder from [[functions.sqlBuilders]] into the session's
  * function registry at session build time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    functions.sqlBuilders.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
}
