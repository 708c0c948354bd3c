package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{ArrayIntersectSize, JavaStringHash}

/** SparkSessionExtensions entry point: installs graft's engine functions
  * into every session built with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), so SQL users get them without
  * per-session registration — the packaged-library form of the
  * extension mechanism.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("java_hash"),
      new ExpressionInfo(
        classOf[JavaStringHash].getName,
        null,
        "java_hash",
        "java_hash(str) - Java String.hashCode of `str` (reference-compatible signature keys).",
        ""),
      exprs => JavaStringHash(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("intersect_size"),
      new ExpressionInfo(
        classOf[ArrayIntersectSize].getName,
        null,
        "intersect_size",
        "intersect_size(a, b) - distinct-element intersection count of two string arrays (similarity-join verify kernel).",
        ""),
      exprs => ArrayIntersectSize(exprs.head, exprs(1))))
    ()
  }
}
