package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-cleaning hot path.
  *
  * Unicode NFC normalization has no Spark builtin; a Scala UDF would
  * break whole-stage codegen for every row of a 100 TB text scan. This
  * expression stays inside codegen (SURVEY.md §7.4 preference order:
  * custom `Expression` before UDF) and matches DuckDB's `nfc_normalize`
  * (both implement Unicode NFC), so cleaned output is oracle-checkable
  * bit-exact.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(s: Any): Any = {
    val t = s.asInstanceOf[UTF8String].toString
    // already-normalized fast path: the overwhelmingly common case on
    // real corpora — a containment check, no allocation
    if (java.text.Normalizer.isNormalized(t, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName the local: with a non-nullable input nullSafeCodeGen
      // inlines this unscoped; a second NFC instance in one generated
      // function would redefine `t` → Janino error → interpreter fallback.
      val t = ctx.freshName("t")
      s"""
      |String $t = $c.toString();
      |${ev.value} = java.text.Normalizer.isNormalized($t, java.text.Normalizer.Form.NFC)
      |  ? $c
      |  : org.apache.spark.unsafe.types.UTF8String.fromString(
      |      java.text.Normalizer.normalize($t, java.text.Normalizer.Form.NFC));
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
