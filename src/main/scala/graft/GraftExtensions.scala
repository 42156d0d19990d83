package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{NfcNormalize, RewriteSelfDot, VectorDot}

/** Spark extension entry point: makes graft's native expressions
  * available to pure SQL. Production wiring:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * after which `SELECT vec_dot(a.embedding, b.embedding) …` plans the
  * codegen'd [[graft.functions.VectorDot]] directly — no UDF boundary.
  * (`SparkSessionExtensions.injectFunction` is the public, supported
  * surface for this; see also `GraftFunctions.register` for attaching
  * to an already-built session.) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          s"vec_dot requires exactly 2 arguments, got ${children.length}")
        VectorDot(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      NfcNormalize.build _))
    ext.injectOptimizerRule(_ => RewriteSelfDot)
    // Whole-operator extension (§7.3 rung c): the bounded-heap top-k
    // physical operator. Runtime attachment: graft.plans.TopK.install.
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
