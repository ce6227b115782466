package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared modular-hash constants. All arithmetic stays strictly below 2^63
  * so it is exact (and overflow-free) in BOTH Spark (ANSI mode) and the
  * DuckDB oracle: max intermediate = (P-1)^2 + (P-1) ≈ 4.6e18 < 2^63.
  */
object HashConstants {
  /** Mersenne prime 2^31 - 1. */
  val P: Long = 2147483647L
  /** Universal-hash coefficients for permutation j (Knuth multiplier). */
  def coeffA(j: Int): Long = ((j + 1L) * 2654435761L) % (P - 1) + 1
  def coeffB(j: Int): Long = ((j + 1L) * 2654435497L) % P
}

/** 128-perm MinHash signature over a row's distinct-shingle key array —
  * the signature step of the mandated near-dup tier (BASELINE.json
  * north_rule; no reference analogue, SURVEY.md §2.10).
  *
  * A custom Catalyst expression (with doGenCode, so projections stay inside
  * whole-stage codegen) rather than a Scala UDF: per-row work is
  * numPerms × |shingles| multiply-mods, and doing it in one pass over the
  * shingle array beats a posexplode + groupBy(min) formulation by removing
  * the shuffle of |shingles| × numPerms rows entirely — the shuffle-free
  * design the 100 TB target requires.
  */
case class MinHashSignature(child: Expression, numPerms: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashSignature.compute(input.asInstanceOf[ArrayData].toLongArray(), numPerms))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.MinHashSignature.compute($c.toLongArray(), $numPerms));
         |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  import HashConstants._

  /** One pass over the shingle keys updating all perm minima. */
  def compute(xs: Array[Long], numPerms: Int): Array[Long] = {
    val a = Array.tabulate(numPerms)(coeffA)
    val b = Array.tabulate(numPerms)(coeffB)
    val sig = Array.fill(numPerms)(P)
    var i = 0
    while (i < xs.length) {
      val x = xs(i) % P
      var j = 0
      while (j < numPerms) {
        val h = (a(j) * x + b(j)) % P
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }
}

/** SimHash over whitespace-separated tokens — the second recall net of the
  * near-dup tier (north_rule "SimHash-64"; 60 effective bits here so every
  * intermediate fits signed-64 in both engines). Token hash is a fixed
  * 8-char polynomial (base 131, codepoints mod 256) so the DuckDB oracle can
  * reproduce it in plain SQL; bit b of the output is the majority vote of
  * bit b over all token hashes (ties → 0), standard SimHash semantics.
  */
case class SimHash(child: Expression, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def nullSafeEval(input: Any): Any =
    SimHash.compute(input.asInstanceOf[UTF8String].toString, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash.compute($c.toString(), $bits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash {
  val PadChar: Char = '_'
  val TokenLen: Int = 8
  val Base: Long = 131L

  /** Polynomial hash of the first 8 chars (padded with '_'), codepoints
    * mod 256 — mirrors the oracle's SQL formula exactly. */
  def tokenHash(tok: String): Long = {
    var h = 0L
    var pow = 1L
    var i = 0
    while (i < TokenLen) {
      val cp = if (i < tok.length) tok.codePointAt(tok.offsetByCodePoints(0, i)) else PadChar.toInt
      h += (cp % 256) * pow
      pow *= Base
      i += 1
    }
    h
  }

  def compute(text: String, bits: Int): Long = {
    val votes = new Array[Int](bits)
    // split on single spaces, dropping empty tokens (parity with
    // string_split(content, ' ') ... WHERE tok <> '' in the oracle)
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) {
          val h = tokenHash(text.substring(start, i))
          var b = 0
          while (b < bits) {
            if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Random-hyperplane LSH signatures over a quantized embedding vector:
  * returns array<long> of `tables` sign-bit signatures (`bits` bits each).
  * Hyperplane components are pseudo-random integers in [-1000, 1000] derived
  * from a multiplicative hash of (table, bit, dim) — deterministic across
  * engines and partitionings. Computed map-side in one pass (a custom
  * codegen'd expression; an expression-tree formulation would be
  * tables × bits × dim Catalyst nodes). */
case class LshSignatures(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_signatures"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(LshSignatures.compute(
      input.asInstanceOf[ArrayData].toLongArray(), tables, bits))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.LshSignatures.compute($c.toLongArray(), $tables, $bits));
         |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshSignatures {
  /** Hyperplane component for (table, bit, dim index): int in [-1000, 1000]. */
  def planeComponent(table: Int, bit: Int, d: Int, dim: Int, bits: Int): Long = {
    val off = (table.toLong * bits + bit) * dim + d + 1
    (off * 2654435761L) % 2001L - 1000L
  }

  def compute(qv: Array[Long], tables: Int, bits: Int): Array[Long] = {
    val dim = qv.length
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var h = 0
      while (h < bits) {
        var dot = 0L
        var d = 0
        while (d < dim) {
          dot += qv(d) * planeComponent(t, h, d, dim, bits)
          d += 1
        }
        if (dot >= 0) sig |= (1L << h)
        h += 1
      }
      out(t) = sig
      t += 1
    }
    out
  }
}

/** Column-side constructors. Registered through the session FunctionRegistry
  * so `expr("...")` and SQL can reach them too. */
object NearDupFunctions {
  import org.apache.spark.sql.graftshim.ExprShim

  def minhashSignature(shingles: Column, numPerms: Int): Column =
    ExprShim.column(MinHashSignature(ExprShim.expression(shingles), numPerms))

  def simhash(content: Column, bits: Int): Column =
    ExprShim.column(SimHash(ExprShim.expression(content), bits))

  def lshSignatures(quantized: Column, tables: Int, bits: Int): Column =
    ExprShim.column(LshSignatures(ExprShim.expression(quantized), tables, bits))
}
