package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Library entry point for `spark.sql.extensions`: registers every graft
  * SQL function (native Catalyst expressions, no UDF serialization) on
  * session construction, so a cluster deploy gets them with
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * Per-session [[graft.functions.ExprColumns.register]] remains for
  * ad-hoc/notebook use; both paths share one builder table so the SQL
  * and Column surfaces can never drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.ExprColumns.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.GraftExtensions", name), builder))
    }
}
