package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode NFC normalization for text pipelines (dedup/fingerprint
 * pre-step: "café" composed and "café" decomposed must hash identically
 * or every downstream exact-dedup silently misses them). Spark has no
 * built-in normalizer, and a Scala UDF would pay the encoder bridge on
 * every row of a 100 TB corpus — this is a native codegen Expression
 * (the [[CanonicalizeUrl]] pattern).
 *
 * Fast path: web text is overwhelmingly ASCII, and ASCII is NFC-invariant
 * — a pure-ASCII byte scan (no decode) returns the INPUT UTF8String
 * object untouched, zero allocation. Only rows with a non-ASCII byte pay
 * the UTF-16 round trip through `java.text.Normalizer` (ICU-equivalent
 * for NFC; both implement UAX #15, and DuckDB's `nfc_normalize` replays
 * it exactly for the cross-engine oracle).
 */
object TextNormKernel {

  def isAscii(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < b.length) {
      if (b(i) < 0) return false
      i += 1
    }
    true
  }

  def nfc(u: UTF8String): UTF8String = {
    if (u == null) return null
    if (isAscii(u.getBytes)) u
    else {
      val s = u.toString
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
      else UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
  }
}

/** Native Catalyst expression for [[TextNormKernel.nfc]]: whole-stage
  * codegen, null-safe via UnaryExpression's default null short-circuit,
  * deterministic; never null for non-null input so `defineCodeGen`'s
  * child-derived nullability is correct. */
case class NormalizeNfc(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    TextNormKernel.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormKernel.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
  override def prettyName: String = "normalize_nfc"
}

/** Column-level entry point. */
object TextNormExprs {
  def normalizeNfc(c: Column): Column =
    ColumnBridge.column(NormalizeNfc(ColumnBridge.expression(c)))
}
