package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native nearest-centroid assignment: for a vector column and a
  * FIXED centroid set (driver-side, bounded by construction), return
  * `struct(sim, cell)` of the best centroid — semantically identical
  * to the HOF spelling the quantizers use,
  *
  * {{{
  * array_max(transform(array(<(cell, seed) literals>), s =>
  *   struct(portableRound(cosine(cv, s.seed), 6) AS sim,
  *          s.cell AS cell)))
  * }}}
  *
  * including every edge: a length-mismatched / null-element /
  * zero-norm pair scores NULL, NULL sims lose to any real sim, rounded
  * ties break to the LARGEST cell id (struct ordering), and an all-
  * NULL row assigns to the largest cell with a NULL sim. A NULL vector
  * column behaves like the HOF too (every sim NULL → largest cell).
  *
  * Why not the HOF? `transform`/`array_max` evaluate interpreted —
  * per-element lambda dispatch and a struct allocation per centroid
  * per row, which at 500 k vectors × √n centroids is ~350 M boxed
  * evaluations for one quantizer pass. This expression runs the whole
  * argmax as one fused primitive loop inside whole-stage codegen
  * (centroids ride `ctx.references` as flat primitive arrays; the
  * row's norm and null-scan are hoisted out of the centroid loop), so
  * the pass is FLOP-bound instead of dispatch-bound. Accumulation
  * order matches [[CosineSimilarityExpr]] (left-to-right per pair),
  * and the row norm is accumulated in the same element order the
  * per-pair loop would use, so results are bit-identical.
  *
  * Centroids are sorted by cell id at construction; the scan then
  * replaces on `sim >= best`, which IS the max-struct tiebreak
  * (later index = larger cell). Construction is limited to
  * integral cell ids and float/double seed vectors — the quantizer
  * call sites gate on those and keep the HOF/join forms as fallback.
  */
case class ArgmaxCosineExpr(child: Expression,
                            cellsIn: IndexedSeq[Long],
                            seedsIn: IndexedSeq[IndexedSeq[Double]],
                            seedNullIn: IndexedSeq[Boolean],
                            cellType: DataType)
    extends UnaryExpression {

  require(cellsIn.length == seedsIn.length &&
    cellsIn.length == seedNullIn.length,
    "cells, seeds and null flags must align")
  require(cellType == LongType || cellType == IntegerType,
    s"cell ids must be integral, got ${cellType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("sim", DoubleType, nullable = true),
    StructField("cell", cellType, nullable = false)))

  // the struct itself is only null for an EMPTY centroid set (the
  // HOF's array_max over an empty array) — a null input vector still
  // assigns (all sims null → largest cell)
  override def nullable: Boolean = cellsIn.isEmpty

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argmax_cosine expects an array<float|double> vector, got " +
        other.catalogString)
  }

  private def childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // ---- construction-time preprocessing (sorted by cell id; flat
  // primitive arrays for the codegen references) ----
  @transient private lazy val order: Array[Int] =
    cellsIn.indices.sortBy(cellsIn).toArray
  @transient lazy val cells: Array[Long] = order.map(cellsIn)
  @transient private lazy val lens: Array[Int] =
    order.map(i => seedsIn(i).length)
  @transient private lazy val offs: Array[Int] =
    lens.scanLeft(0)(_ + _).init
  @transient private lazy val flat: Array[Double] =
    order.iterator.flatMap(i => seedsIn(i)).toArray
  @transient private lazy val seedHasNull: Array[Boolean] =
    order.map(seedNullIn)
  @transient private lazy val seedNormSq: Array[Double] = {
    val out = new Array[Double](order.length)
    var k = 0
    while (k < order.length) {
      var s = 0.0; var j = 0
      while (j < lens(k)) { val v = flat(offs(k) + j); s += v * v; j += 1 }
      out(k) = s; k += 1
    }
    out
  }

  private def cellBox(k: Int): Any =
    if (cellType == LongType) java.lang.Long.valueOf(cells(k))
    else java.lang.Integer.valueOf(cells(k).toInt)

  /** The fused scan, shared by eval and (via the generated twin
    * below) codegen: returns (bestIdx, sim, simIsNull).
    */
  private def scan(a: ArrayData): (Int, Double, Boolean) = {
    val n = if (a == null) -1 else a.numElements()
    val isF = childIsFloat
    // row-level: null-scan + norm in element order
    var rowBad = n < 0
    var rowNorm = 0.0
    var i = 0
    while (!rowBad && i < n) {
      if (a.isNullAt(i)) rowBad = true
      else {
        val x = if (isF) a.getFloat(i).toDouble else a.getDouble(i)
        rowNorm += x * x
      }
      i += 1
    }
    var bestIdx = -1; var bestSim = 0.0; var bestNull = true
    var k = 0
    while (k < cells.length) {
      var simNull = rowBad || seedHasNull(k) || n != lens(k) ||
        rowNorm == 0.0 || seedNormSq(k) == 0.0
      var sim = 0.0
      if (!simNull) {
        var dot = 0.0; var j = 0
        val o = offs(k)
        while (j < n) {
          val x = if (isF) a.getFloat(j).toDouble else a.getDouble(j)
          dot += x * flat(o + j)
          j += 1
        }
        val raw = dot / (math.sqrt(rowNorm) * math.sqrt(seedNormSq(k)))
        sim =
          if (raw >= 0) math.floor(raw * 1e6 + 0.5).toLong.toDouble / 1e6
          else -(math.floor(-raw * 1e6 + 0.5).toLong.toDouble / 1e6)
      }
      // ascending-cell scan: >= replaces on rounded ties, which is
      // exactly max(struct(sim, cell))'s larger-cell tiebreak; any
      // real sim beats null, equal-null keeps the later (larger) cell
      val take =
        if (bestIdx < 0) true
        else if (simNull && bestNull) true
        else if (simNull) false
        else if (bestNull) true
        else sim >= bestSim
      if (take) { bestIdx = k; bestSim = sim; bestNull = simNull }
      k += 1
    }
    (bestIdx, bestSim, bestNull)
  }

  override def eval(input: InternalRow): Any = {
    if (cells.isEmpty) return null
    val a = child.eval(input).asInstanceOf[ArrayData]
    val (idx, sim, simNull) = scan(a)
    new GenericInternalRow(Array[Any](
      if (simNull) null else java.lang.Double.valueOf(sim), cellBox(idx)))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    if (cells.isEmpty) {
      val childGen = child.genCode(ctx)
      return ev.copy(
        code = code"""${childGen.code}
           |boolean ${ev.isNull} = true;
           |InternalRow ${ev.value} = null;""".stripMargin,
        isNull = ev.isNull)
    }
    val flatRef = ctx.addReferenceObj("amcFlat", flat, "double[]")
    val offsRef = ctx.addReferenceObj("amcOffs", offs, "int[]")
    val lensRef = ctx.addReferenceObj("amcLens", lens, "int[]")
    val nullsRef = ctx.addReferenceObj("amcNulls", seedHasNull, "boolean[]")
    val normsRef = ctx.addReferenceObj("amcNorms", seedNormSq, "double[]")
    val cellsRef = ctx.addReferenceObj("amcCells", cells, "long[]")
    val childGen = child.genCode(ctx)
    val a = ctx.freshName("vec")
    val n = ctx.freshName("n"); val rowBad = ctx.freshName("rowBad")
    val rowNorm = ctx.freshName("rowNorm")
    val i = ctx.freshName("i"); val k = ctx.freshName("k")
    val j = ctx.freshName("j"); val o = ctx.freshName("o")
    val dot = ctx.freshName("dot"); val raw = ctx.freshName("raw")
    val sim = ctx.freshName("sim"); val simNull = ctx.freshName("simNull")
    val bestIdx = ctx.freshName("bestIdx")
    val bestSim = ctx.freshName("bestSim")
    val bestNull = ctx.freshName("bestNull")
    val take = ctx.freshName("take")
    val x = ctx.freshName("x")
    val getElem = (arr: String, ix: String) =>
      if (childIsFloat) s"(double) $arr.getFloat($ix)"
      else s"$arr.getDouble($ix)"
    val cellJava =
      if (cellType == LongType) s"java.lang.Long.valueOf($cellsRef[$bestIdx])"
      else s"java.lang.Integer.valueOf((int) $cellsRef[$bestIdx])"
    val rowClass = classOf[GenericInternalRow].getName
    ev.copy(code = code"""
       |${childGen.code}
       |ArrayData $a = ${childGen.isNull} ? null : ${childGen.value};
       |int $n = $a == null ? -1 : $a.numElements();
       |boolean $rowBad = $n < 0;
       |double $rowNorm = 0.0;
       |for (int $i = 0; !$rowBad && $i < $n; $i++) {
       |  if ($a.isNullAt($i)) { $rowBad = true; } else {
       |    double $x = ${getElem(a, i)};
       |    $rowNorm += $x * $x;
       |  }
       |}
       |int $bestIdx = -1; double $bestSim = 0.0; boolean $bestNull = true;
       |for (int $k = 0; $k < $cellsRef.length; $k++) {
       |  boolean $simNull = $rowBad || $nullsRef[$k] || $n != $lensRef[$k] ||
       |    $rowNorm == 0.0 || $normsRef[$k] == 0.0;
       |  double $sim = 0.0;
       |  if (!$simNull) {
       |    double $dot = 0.0;
       |    int $o = $offsRef[$k];
       |    for (int $j = 0; $j < $n; $j++) {
       |      $dot += ${getElem(a, j)} * $flatRef[$o + $j];
       |    }
       |    double $raw = $dot /
       |      (java.lang.Math.sqrt($rowNorm) * java.lang.Math.sqrt($normsRef[$k]));
       |    $sim = $raw >= 0
       |      ? ((double)(long) java.lang.Math.floor($raw * 1.0E6 + 0.5)) / 1.0E6
       |      : -(((double)(long) java.lang.Math.floor(-$raw * 1.0E6 + 0.5)) / 1.0E6);
       |  }
       |  boolean $take;
       |  if ($bestIdx < 0) { $take = true; }
       |  else if ($simNull && $bestNull) { $take = true; }
       |  else if ($simNull) { $take = false; }
       |  else if ($bestNull) { $take = true; }
       |  else { $take = $sim >= $bestSim; }
       |  if ($take) { $bestIdx = $k; $bestSim = $sim; $bestNull = $simNull; }
       |}
       |InternalRow ${ev.value} = new $rowClass(new Object[] {
       |  $bestNull ? null : (Object) java.lang.Double.valueOf($bestSim),
       |  (Object) $cellJava });
     """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "argmax_cosine"
}

object ArgmaxCosineExpr {

  /** Column-API entry point over collected `(cell, seed)` rows (the
    * quantizer's seed frame). Returns None when the rows fall outside
    * the fast path's contract (non-integral cells, non-float/double
    * seeds) — the caller keeps its portable spelling as fallback.
    */
  def forSeeds(vec: Column,
               rows: Array[org.apache.spark.sql.Row],
               cellDt: DataType, seedDt: DataType): Option[Column] = {
    val elemOk = seedDt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (!elemOk || !(cellDt == LongType || cellDt == IntegerType) ||
        rows.exists(r => r.isNullAt(0)))
      return None
    val cells = rows.map { r =>
      r.get(0) match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
        case other => return None
      }
    }.toIndexedSeq
    val isF = seedDt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val seeds = new Array[IndexedSeq[Double]](rows.length)
    val nulls = new Array[Boolean](rows.length)
    var i = 0
    while (i < rows.length) {
      if (rows(i).isNullAt(1)) { seeds(i) = IndexedSeq.empty; nulls(i) = true }
      else {
        val s = rows(i).getSeq[Any](1)
        if (s.contains(null)) { seeds(i) = IndexedSeq.empty; nulls(i) = true }
        else seeds(i) = s.map {
          case f: java.lang.Float => f.floatValue().toDouble
          case d: java.lang.Double => d.doubleValue()
          case other => return None
        }.toIndexedSeq
      }
      i += 1
    }
    Some(org.apache.spark.sql.graft.ColumnBridge.column(ArgmaxCosineExpr(
      org.apache.spark.sql.graft.ColumnBridge.expression(vec),
      cells, seeds.toIndexedSeq, nulls.toIndexedSeq, cellDt)))
  }
}
