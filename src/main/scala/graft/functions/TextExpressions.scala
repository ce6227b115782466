package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass marker-word counting for the text-analysis tier.
  *
  * The composed built-in form — one `size(filter(split(text), t = w))` per
  * marker word — re-splits and re-scans the token array once per word
  * (5 profiles × 5 markers + 7 stopwords ≈ 32 full-string passes per row).
  * These expressions walk the string's tokens ONCE, looking each token up
  * in a precomputed hash map, with identical semantics to the HOF form
  * (split on single space, empty tokens dropped, exact token equality) —
  * the DuckDB oracle's `list_filter(string_split(...))` twin is unchanged.
  */
object TextTokens {
  /** Visit each non-empty single-space-separated token. */
  @inline def foreachToken(text: String)(f: String => Unit): Unit = {
    val n = text.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) f(text.substring(start, i))
        start = i + 1
      }
      i += 1
    }
  }
}

/** Count of tokens contained in a fixed word set (the stopword counter). */
case class WordSetCount(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "word_set_count"

  @transient private lazy val wordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    words.foreach(s.add)
    s
  }

  def computeRow(s: UTF8String): Long =
    WordSetCount.compute(s.toString, wordSet)

  override def nullSafeEval(input: Any): Any =
    computeRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordSetCount", this,
      classOf[WordSetCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordSetCount {
  def compute(text: String, words: java.util.HashSet[String]): Long = {
    var count = 0L
    TextTokens.foreachToken(text)(t => if (words.contains(t)) count += 1)
    count
  }
}

/** Language-ID by marker-word profiles, in one pass: per-profile score =
  * total occurrences of that profile's marker words; result = the earliest
  * profile with the maximum score (profiles are language-sorted, so ties
  * break lexicographically — identical to the strict-greater struct fold
  * this replaces, and to the oracle's ORDER BY score DESC, lang ASC). */
case class LangId(child: Expression, profiles: Seq[(String, Seq[String])])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  // word -> indices of profiles containing it (a word may appear in several)
  @transient private lazy val lookup: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    profiles.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }
  @transient private lazy val langs: Array[UTF8String] =
    profiles.map(p => UTF8String.fromString(p._1)).toArray

  def computeRow(s: UTF8String): UTF8String = {
    val counts = new Array[Long](profiles.length)
    TextTokens.foreachToken(s.toString) { t =>
      val idx = lookup.get(t)
      if (idx != null) {
        var i = 0
        while (i < idx.length) { counts(idx(i)) += 1; i += 1 }
      }
    }
    var best = 0
    var i = 1
    while (i < counts.length) {
      if (counts(i) > counts(best)) best = i
      i += 1
    }
    langs(best)
  }

  override def nullSafeEval(input: Any): Any =
    computeRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langId", this, classOf[LangId].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  import org.apache.spark.sql.graftshim.ExprShim

  def wordSetCount(text: Column, words: Seq[String]): Column =
    ExprShim.column(WordSetCount(ExprShim.expression(text), words))

  def langId(text: Column, profiles: Seq[(String, Seq[String])]): Column =
    ExprShim.column(LangId(ExprShim.expression(text), profiles))
}
