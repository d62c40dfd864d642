package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, FloatType, LongType}

/** Shared scalar kernel for the hyperplane-LSH expressions: per-plane dot
  * products in ascending index order (double accumulation — bit-identical to
  * the `zip_with`/`aggregate` HOF formulation it replaces), sign-bit bucket
  * packing, and confidence-ordered multi-probe (flip the least-confident
  * bits, i.e. smallest |dot| — Lv et al., VLDB 2007 "Multi-Probe LSH").
  * Static so generated code can call it directly. */
object LshKernel {
  /** Canonical deterministic hyperplane generator (seeded Gaussian) — the
    * single source of truth shared by the Column API (`AnnOps.hyperplanes`
    * delegates here) and the SQL builders, so `hyperplane_bits(v, dim,
    * bits, seed)` in SQL buckets identically to the Scala path. */
  def hyperplanes(dim: Int, bits: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** dots(b) = <vec, planes(b)> over the common prefix. */
  def dots(vec: ArrayData, planes: Array[Array[Double]]): Array[Double] = {
    val out = new Array[Double](planes.length)
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      val n = math.min(vec.numElements(), p.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += vec.getFloat(i).toDouble * p(i); i += 1 }
      out(b) = dot
      b += 1
    }
    out
  }

  def bits(vec: ArrayData, planes: Array[Array[Double]]): Long = {
    val d = dots(vec, planes)
    var bits = 0L
    var b = 0
    while (b < d.length) { if (d(b) > 0) bits |= (1L << b); b += 1 }
    bits
  }

  /** Base bucket first, then `nProbes-1` single-bit flips in ascending |dot|
    * order (ties by bit index) — the buckets the query most plausibly
    * belongs to if a near-boundary sign bit went the other way. */
  def probes(vec: ArrayData, planes: Array[Array[Double]], nProbes: Int): ArrayData = {
    val d = dots(vec, planes)
    var base = 0L
    var b = 0
    while (b < d.length) { if (d(b) > 0) base |= (1L << b); b += 1 }
    val n = math.min(nProbes, d.length + 1)
    val order = Array.range(0, d.length)
      .sortBy(i => (math.abs(d(i)), i))
    val out = new Array[Long](math.max(n, 1))
    out(0) = base
    var j = 1
    while (j < out.length) { out(j) = base ^ (1L << order(j - 1)); j += 1 }
    new GenericArrayData(out)
  }
}

/** Native codegen'd sign-bit LSH bucket key: bit b of the result is set iff
  * dot(vec, planes(b)) > 0. Replaces the per-plane `aggregate(zip_with(...))`
  * higher-order functions that round 2 measured as the q16/q22 hot-path
  * constant (bits×tables interpreted lambda dot products per corpus row);
  * this expression runs the same loops inside whole-stage codegen.
  * Semantics pinned bit-identical to the HOF formulation in OpsSpec. */
@ExpressionDescription(
  usage = "_FUNC_(vec) - packed sign-bit hyperplane LSH bucket of a float array.")
case class HyperplaneBits(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bits"

  override protected def nullSafeEval(v: Any): Any =
    LshKernel.bits(v.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, x => {
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val p = ctx.freshName("p")
      val acc = ctx.freshName("acc")
      s"""
         |long $acc = 0L;
         |for (int $b = 0; $b < $planesRef.length; $b++) {
         |  double[] $p = $planesRef[$b];
         |  int $n = java.lang.Math.min($x.numElements(), $p.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ((double) $x.getFloat($i)) * $p[$i];
         |  }
         |  if ($dot > 0) $acc |= (1L << $b);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBits =
    copy(child = newChild)
}

object HyperplaneBits {
  def apply(vec: Column, planes: Array[Array[Double]]): Column =
    ExpressionUtils.column(HyperplaneBits(ExpressionUtils.expression(vec), planes))

  /** SQL builder: `hyperplane_bits(vec, dim, bits[, seed])`. The plane
    * parameters must be literals (the planes are materialized at plan time,
    * exactly like the Column API's literal plane array). */
  private[graft] def sqlBuilder(children: Seq[Expression]): Expression = {
    require(children.size == 3 || children.size == 4,
      s"hyperplane_bits(vec, dim, bits[, seed]) takes 3-4 args, got ${children.size}")
    val dim = LshSql.intLit(children(1), "dim")
    val bits = LshSql.intLit(children(2), "bits")
    val seed = if (children.size > 3) LshSql.intLit(children(3), "seed").toLong else 42L
    HyperplaneBits(children(0), LshKernel.hyperplanes(dim, bits, seed))
  }
}

/** Literal extraction shared by the LSH SQL builders. */
private[graft] object LshSql {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.types.IntegerType
  def intLit(e: Expression, name: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got: $other")
  }
}

/** Confidence-ordered multi-probe bucket list (base bucket + `nProbes-1`
  * least-confident single-bit flips). Query-side only — the corpus keeps one
  * bucket per table — so the probe fan-out replicates the tiny broadcast
  * side. Codegen delegates the sort-by-|dot| to the static kernel (a handful
  * of rows per query; the corpus-side `HyperplaneBits` is the hot loop). */
@ExpressionDescription(
  usage = "_FUNC_(vec) - multi-probe LSH bucket candidates of a float array.")
case class HyperplaneProbes(child: Expression, planes: Array[Array[Double]],
    nProbes: Int)
    extends UnaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_probes"

  override protected def nullSafeEval(v: Any): Any =
    LshKernel.probes(v.asInstanceOf[ArrayData], planes, nProbes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, x =>
      s"""
         |${ev.value} = org.apache.spark.sql.graft.LshKernel.probes(
         |  $x, $planesRef, $nProbes);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneProbes =
    copy(child = newChild)
}

object HyperplaneProbes {
  def apply(vec: Column, planes: Array[Array[Double]], nProbes: Int): Column =
    ExpressionUtils.column(
      HyperplaneProbes(ExpressionUtils.expression(vec), planes, nProbes))

  /** SQL builder: `hyperplane_probes(vec, dim, bits, nprobes[, seed])`. */
  private[graft] def sqlBuilder(children: Seq[Expression]): Expression = {
    require(children.size == 4 || children.size == 5,
      s"hyperplane_probes(vec, dim, bits, nprobes[, seed]) takes 4-5 args, got ${children.size}")
    val dim = LshSql.intLit(children(1), "dim")
    val bits = LshSql.intLit(children(2), "bits")
    val nProbes = LshSql.intLit(children(3), "nprobes")
    val seed = if (children.size > 4) LshSql.intLit(children(4), "seed").toLong else 42L
    HyperplaneProbes(children(0), LshKernel.hyperplanes(dim, bits, seed), nProbes)
  }
}
