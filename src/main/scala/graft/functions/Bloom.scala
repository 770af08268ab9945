package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bloom-filter membership as a broadcast bitmask probe.
  *
  * The scale story: a decontamination / seen-set check against an
  * eval-probe gram set is naturally a join of the corpus gram table
  * against the probe gram table — a SHUFFLE of the corpus side. A
  * Bloom mask compresses the probe set to m bits that ship to every
  * task as plan metadata (an `addReferenceObj` constant — a 2^20-bit
  * mask is 128 KiB), turning the membership check into k bit probes
  * per gram with NO shuffle and no join state. False positives only —
  * a hit means "maybe contaminated, escalate to the exact check"
  * (q_decontaminate's shingle join); a miss is definitive. That
  * one-sided error is exactly what a triage stage wants: the exact
  * join then runs over the flagged sliver, not the whole corpus.
  *
  * Positions use Kirsch-Mitzenmacher double hashing — pos_i =
  * (h1 + i·h2) mod m, i < k — over the two independent 48-bit md5
  * slices [[Hashing.stableHash48]] provides from ONE md5 evaluation.
  * All integer math, bit-identical in DuckDB, so membership DECISIONS
  * (not just counts) hash-gate cross-engine.
  */
object Bloom {
  /** All k probe positions set? h1/h2 are non-negative 48-bit values,
    * so `h1 + i·h2` stays exact far below 2^63 and plain `% m` is the
    * canonical position both engines compute.
    */
  def contains(bits: Array[Long], h1: Long, h2: Long, k: Int, m: Int): Boolean = {
    var i = 0
    while (i < k) {
      val p = ((h1 + i * h2) % m).toInt
      if ((bits(p >> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Fold bit positions into an m-bit mask (m/64 longs). */
  def maskOf(positions: Iterator[Long], m: Int): Array[Long] = {
    val bits = new Array[Long]((m + 63) >> 6)
    positions.foreach { pl =>
      val p = pl.toInt
      bits(p >> 6) |= 1L << (p & 63)
    }
    bits
  }
}

/** `bloom_contains(h1, h2)` over a plan-constant mask: k bit probes
  * per row inside whole-stage codegen, no join.
  */
case class BloomContainsExpr(left: Expression, right: Expression,
                             bits: Array[Long], k: Int, m: Int) extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, LongType)
  require(k > 0 && m > 0 && m % 64 == 0, s"bad bloom geometry k=$k m=$m (m must be a multiple of 64)")
  require(bits.length == m / 64, s"mask length ${bits.length} != m/64 = ${m / 64}")
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def nullSafeEval(h1: Any, h2: Any): Any =
    Bloom.contains(bits, h1.asInstanceOf[Long], h2.asInstanceOf[Long], k, m)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, (h1, h2) =>
      s"${ev.value} = graft.functions.Bloom.contains($ref, $h1, $h2, $k, $m);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomContainsExpr =
    copy(left = l, right = r)
  override def prettyName: String = "bloom_contains"
}

object BloomCol {
  def contains(h1: Column, h2: Column, bits: Array[Long], k: Int, m: Int): Column =
    GraftExpr.toColumn(BloomContainsExpr(GraftExpr.toExpr(h1), GraftExpr.toExpr(h2), bits, k, m))
}
