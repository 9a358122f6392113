package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Codegen-friendly product-quantization kernels.
  *
  * Inlining PQ's M × Ks centroid comparisons as a Catalyst expression tree
  * (an `array` of M `array`s of Ks `struct`s) generates a projection
  * method janino refuses to compile (method > 64 KB), so the whole stage
  * silently falls back to interpreted eval — the worst of both worlds.
  * These expressions keep the stage inside whole-stage codegen by holding
  * the trained codebook as a flat primitive reference object and emitting
  * a single virtual call whose body is the tight hand-written loop.
  *
  * Argmin note: the assignment order is (squared-L2 dist, cid), and
  * dist = snrm + cnrm − 2·dot with snrm constant per row — so comparing
  * cnrm − 2·dot is the identical total order and the row norm is never
  * computed. Strict `<` keeps the lowest cid on ties, matching the
  * oracle's `ORDER BY dist, cid` row_number tiebreak exactly (all exact
  * BIGINT arithmetic).
  */
final class PqCodebookData(
    val subDim: Int,
    val subOff: Array[Int],  // prefix offsets into entries: sub s owns [subOff(s), subOff(s+1))
    val cids: Array[Int],    // cid label of each entry, ascending within a sub
    val flat: Array[Long],   // component k of entry e at (e*subDim + k)
    val cnrm: Array[Long])   // squared norm of entry e
  extends Serializable {

  /** Number of subspaces. A cid can lose all points mid-training and drop
    * out of the update, so subs own variable-length entry ranges. */
  val m: Int = subOff.length - 1
  require(cids.length == subOff(m) && cnrm.length == cids.length &&
    flat.length == cids.length * subDim)

  /** cid minimizing (dist, cid) for the sub-vector at `svOff` in `v`. */
  def nearestCid(v: ArrayData, svOff: Int, sub: Int): Int = {
    var best = Long.MaxValue
    var bestCid = -1
    var e = subOff(sub)
    val end = subOff(sub + 1)
    while (e < end) {
      val base = e * subDim
      var dot = 0L
      var k = 0
      while (k < subDim) {
        dot += v.getLong(svOff + k) * flat(base + k)
        k += 1
      }
      // dist = snrm + cnrm − 2·dot; snrm is constant per row, so this is
      // the same (dist, cid) order. Entries ascend by cid within a sub and
      // strict < keeps the first minimum — the lowest cid wins ties.
      val score = cnrm(e) - 2L * dot
      if (score < best) { best = score; bestCid = cids(e) }
      e += 1
    }
    bestCid
  }

  /** The `nProbe` cids nearest to the sub-vector at `svOff`, ordered by
    * (dist, cid) ascending — the IVF probe list. Insertion sort over a
    * bounded buffer: strict `<` comparisons mean an equal-score entry
    * never displaces an earlier (lower-cid) one, so the order is the
    * exact lexicographic (dist, cid) the oracle's row_number replays. */
  def probeCids(v: ArrayData, svOff: Int, sub: Int, nProbe: Int): ArrayData = {
    val start = subOff(sub)
    val end = subOff(sub + 1)
    val n = math.min(nProbe, end - start)
    val bestScore = new Array[Long](n)
    val bestCid = new Array[Int](n)
    var filled = 0
    var e = start
    while (e < end) {
      val base = e * subDim
      var dot = 0L
      var k = 0
      while (k < subDim) {
        dot += v.getLong(svOff + k) * flat(base + k)
        k += 1
      }
      val score = cnrm(e) - 2L * dot
      if (filled < n) {
        var pos = filled
        while (pos > 0 && score < bestScore(pos - 1)) {
          bestScore(pos) = bestScore(pos - 1); bestCid(pos) = bestCid(pos - 1); pos -= 1
        }
        bestScore(pos) = score; bestCid(pos) = cids(e); filled += 1
      } else if (score < bestScore(n - 1)) {
        var pos = n - 1
        while (pos > 0 && score < bestScore(pos - 1)) {
          bestScore(pos) = bestScore(pos - 1); bestCid(pos) = bestCid(pos - 1); pos -= 1
        }
        bestScore(pos) = score; bestCid(pos) = cids(e)
      }
      e += 1
    }
    new GenericArrayData(bestCid)
  }

  /** All M codes of a full vector, one argmin per subspace. */
  def encode(v: ArrayData): ArrayData = {
    val codes = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      codes(sub) = nearestCid(v, sub * subDim, sub)
      sub += 1
    }
    new GenericArrayData(codes)
  }

  /** ADC lookup table of a query vector: lut[sub][cid] = q_sub · c_sub,cid.
    * Rows are indexed by cid LABEL (vacant cids hold 0 — never referenced,
    * since no corpus vector encodes to a vacant cid). */
  def lut(qv: ArrayData): ArrayData = {
    val ks = if (cids.isEmpty) 0 else cids.max + 1
    val rows = new Array[ArrayData](m)
    var sub = 0
    while (sub < m) {
      val row = new Array[Long](ks)
      var e = subOff(sub)
      val end = subOff(sub + 1)
      while (e < end) {
        val base = e * subDim
        var dot = 0L
        var k = 0
        while (k < subDim) {
          dot += qv.getLong(sub * subDim + k) * flat(base + k)
          k += 1
        }
        row(cids(e)) = dot
        e += 1
      }
      rows(sub) = new GenericArrayData(row)
      sub += 1
    }
    new GenericArrayData(rows)
  }
}

private[functions] trait PqLongArrayInput { self: Expression =>
  protected def vectorChild: Expression
  def checkVector(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    vectorChild.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint>, got ${other.simpleString}")
    }
}

/** `pq_nearest_cid(sub_id, sv)` over the exploded training frame. */
case class PqNearestCid(left: Expression, right: Expression, cb: PqCodebookData)
  extends BinaryExpression with PqLongArrayInput {

  override def nullIntolerant: Boolean = true
  override protected def vectorChild: Expression = right
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType != IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires int sub_id, got ${left.dataType.simpleString}")
    else checkVector()
  override def dataType: DataType = IntegerType
  override def prettyName: String = "pq_nearest_cid"

  override protected def nullSafeEval(sub: Any, sv: Any): Any =
    cb.nearestCid(sv.asInstanceOf[ArrayData], 0, sub.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqcb", cb, classOf[PqCodebookData].getName)
    nullSafeCodeGen(ctx, ev, (sub, sv) => s"${ev.value} = $ref.nearestCid($sv, 0, $sub);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqNearestCid =
    copy(left = newLeft, right = newRight)
}

/** `pq_encode(v)` → the M-code array of a full corpus vector. */
case class PqEncode(child: Expression, cb: PqCodebookData)
  extends UnaryExpression with PqLongArrayInput {

  override def nullIntolerant: Boolean = true
  override protected def vectorChild: Expression = child
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkVector()
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(v: Any): Any =
    cb.encode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqcb", cb, classOf[PqCodebookData].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.encode($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `ivf_probe_cids(v)` → the nProbe nearest centroid ids, (dist, cid)
  * ascending. The IVF coarse quantizer is the m = 1, subDim = dim special
  * case of the codebook, so it shares [[PqCodebookData]]: the inlined
  * K × dim literal-struct expression this replaces cost a fresh janino
  * compile in every consumer plan. */
case class PqProbeCids(child: Expression, cb: PqCodebookData, nProbe: Int)
  extends UnaryExpression with PqLongArrayInput {

  override def nullIntolerant: Boolean = true
  override protected def vectorChild: Expression = child
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkVector()
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_probe_cids"

  override protected def nullSafeEval(v: Any): Any =
    cb.probeCids(v.asInstanceOf[ArrayData], 0, 0, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqcb", cb, classOf[PqCodebookData].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.probeCids($v, 0, 0, $nProbe);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqProbeCids =
    copy(child = newChild)
}

/** `pq_lut(qv)` → the query's M × Ks table of exact sub-dot-products. */
case class PqLut(child: Expression, cb: PqCodebookData)
  extends UnaryExpression with PqLongArrayInput {

  override def nullIntolerant: Boolean = true
  override protected def vectorChild: Expression = child
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkVector()
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_lut"

  override protected def nullSafeEval(qv: Any): Any =
    cb.lut(qv.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqcb", cb, classOf[PqCodebookData].getName)
    nullSafeCodeGen(ctx, ev, qv => s"${ev.value} = $ref.lut($qv);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

object PqKernels {
  def nearestCid(subId: Column, sv: Column, cb: PqCodebookData): Column =
    GraftBridge.column(
      PqNearestCid(GraftBridge.expression(subId), GraftBridge.expression(sv), cb))
  def encode(v: Column, cb: PqCodebookData): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(v), cb))
  def lut(qv: Column, cb: PqCodebookData): Column =
    GraftBridge.column(PqLut(GraftBridge.expression(qv), cb))
  def probeCids(v: Column, cb: PqCodebookData, nProbe: Int): Column =
    GraftBridge.column(PqProbeCids(GraftBridge.expression(v), cb, nProbe))
}
