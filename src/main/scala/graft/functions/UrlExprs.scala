package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Byte-level kernels for the two hottest per-row functions in the engine
 * (P5/P8): at frontier scale the Scala-UDF bridge's UTF8String → String →
 * UTF8String round trip (UTF-16 decode + re-encode + 3-4 allocations per
 * row) dominates the narrow stages, and most discovered URLs are already
 * canonical. These kernels work directly on the UTF-8 bytes: when a URL is
 * provably canonical they return the input object (canonicalize) or a
 * small byte-slice (host) with zero decoding; otherwise they fall back to
 * the reference-semantics implementations in [[UrlCanon]], so output is
 * identical to the UDF path by construction (fast path fires only when
 * UrlCanon.canonicalize would return its input unchanged).
 */
object UrlCanonKernel {

  /** True only when the bytes are provably in canonical form, i.e. a
   *  strict subset of [[UrlCanon.isCanonicalFast]] (plus: pure printable
   *  ASCII, so trim() is the identity): lowercase http/https scheme,
   *  non-empty [a-z0-9.-] authority (no userinfo/port possible), a path,
   *  no '%'/'#'/'?', no dot segments, no whitespace/control/non-ASCII. */
  def isCanonicalBytes(b: Array[Byte]): Boolean = {
    val n = b.length
    val authStart =
      if (n > 7 && b(0) == 'h' && b(1) == 't' && b(2) == 't' && b(3) == 'p') {
        if (b(4) == ':' && b(5) == '/' && b(6) == '/') 7
        else if (n > 8 && b(4) == 's' && b(5) == ':' && b(6) == '/' && b(7) == '/') 8
        else return false
      } else return false
    var pathStart = -1
    var j = authStart
    while (j < n && pathStart < 0) {
      val c = b(j)
      if (c == '/') pathStart = j
      else if (!((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '.' || c == '-'))
        return false
      else j += 1
    }
    if (pathStart <= authStart) return false
    j = pathStart
    while (j < n) {
      val c = b(j)
      if (c <= 0x20 || c < 0 || c == 0x7f) return false // ws/control/non-ASCII
      if (c == '%' || c == '#' || c == '?') return false
      if (c == '.' && b(j - 1) == '/') return false // "/." or "/.."
      j += 1
    }
    true
  }

  /** RFC 3986 canonical form (≡ [[UrlCanon.canonicalize]]); zero-copy when
   *  the input is already canonical. */
  def canonicalize(u: UTF8String): UTF8String = {
    if (u == null) return null
    val b = u.getBytes
    if (isCanonicalBytes(b)) u
    else UTF8String.fromString(UrlCanon.canonicalize(u.toString))
  }

  /** Politeness host key (≡ [[UrlCanon.host]]); a byte-slice on the fast
   *  path (canonical authority has no userinfo/port and is lowercase). */
  def host(u: UTF8String): UTF8String = {
    if (u == null) return null
    val b = u.getBytes
    if (isCanonicalBytes(b)) {
      val authStart = if (b(4) == 's') 8 else 7
      var pathStart = authStart
      while (b(pathStart) != '/') pathStart += 1
      UTF8String.fromBytes(b, authStart, pathStart - authStart)
    } else {
      val h = UrlCanon.host(u.toString)
      if (h == null) null else UTF8String.fromString(h)
    }
  }
}

/** Native Catalyst expression for [[UrlCanonKernel.canonicalize]]: stays
  * inside whole-stage codegen with no Scala-UDF encoder bridge. Null-safe
  * (UnaryExpression's default eval short-circuits null children) and
  * deterministic. */
// (no ExpectsInputTypes: AbstractDataType is private[sql] in Spark 4; both
// expressions are constructed only by UrlExprs over string columns)
case class CanonicalizeUrl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    UrlCanonKernel.canonicalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlCanonKernel.canonicalize($c)")
  override protected def withNewChildInternal(newChild: Expression): CanonicalizeUrl =
    copy(child = newChild)
  override def prettyName: String = "canonicalize_url"
}

/** Native Catalyst expression for [[UrlCanonKernel.host]].
  *
  * `nullable` is unconditionally true: the kernel returns null for
  * NON-null inputs that have no authority (relative URLs, bare words),
  * so inheriting UnaryExpression's `child.nullable` would, over a
  * non-nullable child column, codegen `isNull = false` and let a null
  * UTF8String leak into downstream hash/join code. */
case class UrlHost(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    UrlCanonKernel.host(input.asInstanceOf[UTF8String])
  // not defineCodeGen: the kernel can return null for a non-null child, so
  // the generated code must derive isNull from the RESULT, not the child
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.UrlCanonKernel.host($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  override protected def withNewChildInternal(newChild: Expression): UrlHost =
    copy(child = newChild)
  override def prettyName: String = "url_host"
}

/** Column-level entry points for the native expressions. */
object UrlExprs {
  def canonicalizeUrl(c: Column): Column =
    ColumnBridge.column(CanonicalizeUrl(ColumnBridge.expression(c)))
  def urlHost(c: Column): Column =
    ColumnBridge.column(UrlHost(ColumnBridge.expression(c)))
}
