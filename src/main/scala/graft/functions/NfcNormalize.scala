package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression (ta25).
  *
  * Every LLM ingest pipeline canonicalizes unicode before hashing or
  * deduplicating — the same text arrives both composed (é = U+00E9) and
  * decomposed (e + U+0301), and without NFC the exact-dedup content keys
  * (dd01), fingerprints (ta04) and gram hashes silently treat them as
  * different documents. Spark ships no normalizer function, which makes
  * this the §7.3 escalation ladder's case (b): a scalar capability the
  * built-in surface lacks, expressed as a `UnaryExpression` with
  * `doGenCode` so it stays inside whole-stage codegen (a Scala UDF here
  * would box every row and fence the stage).
  *
  * Fast path: `Normalizer.isNormalized` (the NFC quick-check) returns
  * the INPUT UTF8String untouched for already-normalized text — the
  * overwhelmingly common case on a real corpus — so the per-row cost is
  * a scan, not an allocation. Reference semantics: java.text.Normalizer
  * (ICU-equivalent for NFC); DuckDB's `nfc_normalize` is the oracle twin.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nfc_normalize requires string, got $t")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted eval and generated code (bit-identical). */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-API entry point. */
  def nfc(c: Column): Column =
    CatalystBridge.column(NfcNormalize(CatalystBridge.expression(c)))

  /** Builder shared by both SQL registration paths: validates arity at
    * analysis time (zero args would otherwise surface as a raw
    * NoSuchElementException, and extra args would be silently dropped). */
  private[graft] def build(
      children: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : NfcNormalize = {
    require(children.length == 1,
      s"nfc_normalize requires exactly 1 argument, got ${children.length}")
    NfcNormalize(children.head)
  }

  /** Make `nfc_normalize` callable from SQL text on an existing session
    * (session-build-time wiring: [[graft.GraftExtensions]]). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    CatalystBridge.registerFunction(spark, "nfc_normalize", build)
}
