package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd vector kernels. The higher-order-function versions in [[Vec]]
  * are CodegenFallback (interpreted lambda per element) — far too slow for
  * the O(corpus × queries) hot loop of exact KNN (SURVEY §4.2 anticipated
  * this: "optional codegen Expression ... if profiling demands"; profiling
  * did). These generate a tight primitive loop inside whole-stage codegen.
  *
  * Numerical contract: identical left-to-right summation over the same
  * doubles as the HOF versions — for integer-valued inputs every partial sum
  * is exact, so results are bitwise equal to the DuckDB oracle's integer
  * sums.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

case class VecNorm2(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getDouble(i); acc += v * v; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): VecNorm2 = copy(child = c)
}

/** PQ asymmetric-distance (ADC) kernel: codes ARRAY<INT> (one code per
  * subspace) × a flattened lookup table ARRAY<DOUBLE> of mSub·ksub partials
  * → Σ_m lut[m·ksub + codes[m]]. Replaces per-row decode-then-dot (O(dim)
  * work + an array allocation per pair) with mSub table reads — the
  * classic PQ scoring trick (Jégou et al. 2011 §5.2). ksub is derived per
  * row from the two lengths, so ragged codebooks work via padded tables.
  */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val ksub = if (m == 0) 0 else lut.numElements() / m
    var acc = 0.0
    var i = 0
    while (i < m) { acc += lut.getDouble(i * ksub + codes.getInt(i)); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val m = ctx.freshName("m")
      val ksub = ctx.freshName("ksub"); val acc = ctx.freshName("acc")
      s"""
         |int $m = $a.numElements();
         |int $ksub = ($m == 0) ? 0 : $b.numElements() / $m;
         |double $acc = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  $acc += $b.getDouble($i * $ksub + $a.getInt($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
}

/** IVF assignment kernel: the centroid id nearest to the row's vector under
  * the metric, as ONE fused per-row loop (cells × dim) in generated code —
  * no corpus × centroids join, no aggregation, map-only. `ids`/`cents` are
  * the collected centroid table (tiny by construction), `norms` the
  * precomputed per-centroid Σc². Tie-break: cells are scanned in ascending
  * id order with strict improvement, so the LOWEST id wins ties — the same
  * rule as max_by(struct(s, -id)) / min_by(struct(s, id)).
  *
  * metricCode: 0=COSINE (max dot/(√nd²·√nc²)), 1=L2 (min √(nd²−2·dot+nc²),
  * exact integer identity), 2=IP (max dot) — score arithmetic bit-identical
  * to [[Vec.score]] for integer-valued vectors.
  */
case class NearestCentroid(child: Expression, ids: Array[Int],
    cents: Array[Array[Double]], norms: Array[Double], metricCode: Int)
  extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def checkInputDataTypes() = org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  private def score(dot: Double, nd2: Double, c: Int): Double = metricCode match {
    case 0 => dot / (math.sqrt(nd2) * math.sqrt(norms(c)))
    case 1 => math.sqrt(nd2 - 2.0 * dot + norms(c))
    case _ => dot
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var nd2 = 0.0
    var i = 0
    while (i < n) { val v = x.getDouble(i); nd2 += v * v; i += 1 }
    var bestIdx = 0
    var bestS = Double.NaN
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val d = math.min(n, cent.length)
      var dot = 0.0
      var j = 0
      while (j < d) { dot += x.getDouble(j) * cent(j); j += 1 }
      val s = score(dot, nd2, c)
      val better =
        if (c == 0) true
        else if (metricCode == 1) s < bestS
        else s > bestS
      if (better) { bestIdx = c; bestS = s }
      c += 1
    }
    ids(bestIdx)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
      val normsRef = ctx.addReferenceObj("norms", norms, "double[]")
      val idsRef = ctx.addReferenceObj("ids", ids, "int[]")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val nd2 = ctx.freshName("nd2"); val v = ctx.freshName("v")
      val c = ctx.freshName("c"); val j = ctx.freshName("j")
      val d = ctx.freshName("d"); val dot = ctx.freshName("dot")
      val cent = ctx.freshName("cent"); val s = ctx.freshName("s")
      val bestIdx = ctx.freshName("bestIdx"); val bestS = ctx.freshName("bestS")
      val scoreExpr = metricCode match {
        case 0 => s"$dot / (java.lang.Math.sqrt($nd2) * java.lang.Math.sqrt($normsRef[$c]))"
        case 1 => s"java.lang.Math.sqrt($nd2 - 2.0 * $dot + $normsRef[$c])"
        case _ => dot
      }
      val cmp = if (metricCode == 1) s"$s < $bestS" else s"$s > $bestS"
      s"""
         |int $n = $a.numElements();
         |double $nd2 = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i);
         |  $nd2 += $v * $v;
         |}
         |int $bestIdx = 0;
         |double $bestS = Double.NaN;
         |for (int $c = 0; $c < $centsRef.length; $c++) {
         |  double[] $cent = $centsRef[$c];
         |  int $d = java.lang.Math.min($n, $cent.length);
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $d; $j++) {
         |    $dot += $a.getDouble($j) * $cent[$j];
         |  }
         |  double $s = $scoreExpr;
         |  if ($c == 0 || ($cmp)) { $bestIdx = $c; $bestS = $s; }
         |}
         |${ev.value} = $idsRef[$bestIdx];
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): NearestCentroid =
    copy(child = c)
}

/** Deterministic synthetic vector kernel — the codegen twin of the
  * `transform(sequence(0, dim-1), i => ((key*131 + i*313 + 7) % 97 - 48))`
  * HOF in [[graft.core.Tables.synthVec]]. The HOF is CodegenFallback: one
  * interpreted lambda eval (boxed longs, a fresh NamedLambdaVariable bind)
  * PER ELEMENT, ~dim·|corpus| of them under every orders-corpus scan
  * (b1/b2/b5 class). This emits one tight primitive loop into the stage.
  * All arithmetic is 64-bit integer (Java `%` == Spark `%` == pmod-free
  * Remainder), so values are bit-identical to the HOF and to the oracle.
  */
case class SynthVec(child: Expression, dim: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes() = org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(a: Any): Any = {
    val key = a.asInstanceOf[Long]
    val arr = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      arr(i) = ((key * 131L + i * 313L + 7L) % 97L - 48L).toDouble
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val arr = ctx.freshName("arr")
      s"""
         |double[] $arr = new double[$dim];
         |for (int $i = 0; $i < $dim; $i++) {
         |  $arr[$i] = (double) (($a * 131L + $i * 313L + 7L) % 97L - 48L);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SynthVec =
    copy(child = c)
}

object VecExprs {
  /** Column API over the codegen kernels. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def norm2(a: Column): Column =
    ColumnBridge.column(VecNorm2(ColumnBridge.expression(a)))
  def pqAdc(codes: Column, lut: Column): Column =
    ColumnBridge.column(PqAdc(ColumnBridge.expression(codes),
      ColumnBridge.expression(lut)))
  def synthVec(key: Column, dim: Int): Column =
    ColumnBridge.column(SynthVec(ColumnBridge.expression(key.cast("long")), dim))

  /** Nearest-centroid assignment over a collected centroid table. Centroids
    * are scanned in ascending id order (ties → lowest id, as
    * max_by(struct(s, -id))). Norms are computed here with the same
    * left-to-right summation as the oracle.
    */
  def nearestCentroid(dv: Column, centroids: Seq[(Int, Array[Double])],
      metric: String): Column = {
    val sorted = centroids.sortBy(_._1)
    val code = metric match {
      case "COSINE" => 0
      case "L2"     => 1
      case "IP"     => 2
      case m => throw new IllegalArgumentException(s"metric $m (want COSINE|L2|IP)")
    }
    val cents = sorted.map(_._2).toArray
    val norms = cents.map { c =>
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += c(i) * c(i); i += 1 }
      acc
    }
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(dv),
      sorted.map(_._1).toArray, cents, norms, code))
  }
}
