package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup sketches.
  *
  * Why native and not HOF compositions: Spark's higher-order functions
  * (transform/aggregate/zip_with) are interpreted (no whole-stage
  * codegen), and CollapseProject inlines a referenced column expression
  * into every lambda reference — a k-seed minhash over shingles written
  * as nested HOFs re-evaluates the shingle array O(k·bands) times per
  * row. These expressions make one pass over the input array with
  * primitive arrays, generate a single static call in codegen, and keep
  * the projection inside WholeStageCodegen. Map-side, zero shuffle.
  */
object HashSketches {
  private final val HashSeed = 42L

  /** One pass over `shingles`: k min-hashes (h_i = xxh64(i, xxh64(s)))
    * folded into `bands` bucket keys (xxh64 over each band's r mins).
    */
  def minHashBands(shingles: ArrayData, k: Int, bands: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var e = 0
    while (e < n) {
      val s = shingles.getUTF8String(e)
      if (s != null) {
        val base = XXH64.hashUTF8String(s, HashSeed)
        var i = 0
        while (i < k) {
          val h = XXH64.hashLong(i, base)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      e += 1
    }
    val r = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = HashSeed + b
      var j = b * r
      while (j < (b + 1) * r) {
        acc = XXH64.hashLong(mins(j), acc)
        j += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct word n-gram shingles in one pass (insertion order), no
    * per-gram Column machinery. Tokens joined with a single space —
    * same output as the HOF slice/concat_ws composition.
    */
  def shingles(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val last = math.max(m - n, 0)
    var i = 0
    while (i <= last && m > 0) {
      val end = math.min(i + n, m)
      var j = i
      val parts = new Array[UTF8String]((end - i) * 2 - 1)
      var p = 0
      while (j < end) {
        if (j > i) { parts(p) = Space; p += 1 }
        val t = tokens.getUTF8String(j)
        parts(p) = if (t == null) UTF8String.EMPTY_UTF8 else t
        p += 1
        j += 1
      }
      seen.add(UTF8String.concat(parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray[AnyRef](new Array[AnyRef](seen.size)))
  }
  private val Space = UTF8String.fromString(" ")

  /** Polynomial rolling hash over the string's characters:
    * h = (h*base + codepoint) mod m — one pass, matches the DuckDB
    * list_reduce oracle exactly for BMP text.
    */
  def rollingHash(s: UTF8String, base: Long, mod: Long): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * base + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }

  /** The per-token hash the SimHash votes ride on — exposed so dynamic
    * oracles can ship the (token → hash) vocabulary as data and DuckDB
    * can re-derive the per-bit majority independently. */
  def tokenHash(t: UTF8String): Long = XXH64.hashUTF8String(t, HashSeed)

  /** One pass 64-bit SimHash over the token array: per-bit ±1 votes of
    * each token's xxh64, packed sign bits.
    */
  def simHash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var e = 0
    while (e < n) {
      val t = tokens.getUTF8String(e)
      if (t != null) {
        val h = XXH64.hashUTF8String(t, HashSeed)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      e += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}

/** `array<string>` shingles → `array<long>` of `bands` LSH bucket keys
  * from a k-seed minhash signature.
  */
case class MinHashBandsExpr(child: Expression, k: Int, bands: Int)
    extends UnaryExpression {
  require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    require(child.dataType == ArrayType(StringType, true) ||
            child.dataType == ArrayType(StringType, false),
      s"expected array<string>, got ${child.dataType}")
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }
  override def nullSafeEval(v: Any): Any =
    HashSketches.minHashBands(v.asInstanceOf[ArrayData], k, bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashSketches.minHashBands($c, $k, $bands)")
  override protected def withNewChildInternal(newChild: Expression): MinHashBandsExpr =
    copy(child = newChild)
}

/** `array<string>` tokens → 64-bit SimHash long. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HashSketches.simHash64(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashSketches.simHash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** `array<string>` tokens → `array<string>` distinct n-gram shingles. */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashSketches.shingles(v.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashSketches.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

/** `string` → polynomial rolling-hash long. */
case class RollingHashExpr(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HashSketches.rollingHash(v.asInstanceOf[UTF8String], base, mod)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashSketches.rollingHash($c, ${base}L, ${mod}L)")
  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}

/** `array<float|double>` vector → the `nprobe` nearest centroid ids by
  * cosine, as `array<int>`. One pass over a centroid matrix carried as
  * a reference object — the IVF coarse quantizer without interpreted
  * per-centroid HOF cosines.
  */
case class NearestCellsExpr(child: Expression, centroids: Seq[Seq[Double]],
                            nprobe: Int) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  @transient private lazy val matrix: Array[Array[Double]] =
    NearestCellsExpr.normalized(centroids.map(_.toArray).toArray)

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any =
    NearestCellsExpr.nearest(v.asInstanceOf[ArrayData], matrix, nprobe, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidMatrix", matrix, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NearestCellsExpr.nearest($c, $ref, $nprobe, $elemIsFloat)")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCellsExpr =
    copy(child = newChild)
}

object NearestCellsExpr {
  def normalized(m: Array[Array[Double]]): Array[Array[Double]] =
    m.map { row =>
      var s = 0.0
      var i = 0
      while (i < row.length) { s += row(i) * row(i); i += 1 }
      val n = math.sqrt(s)
      if (n == 0) row else row.map(_ / n)
    }

  /** nprobe nearest (by cosine) centroid indices, best first; ties by
    * lower index.
    */
  def nearest(vec: ArrayData, centroids: Array[Array[Double]],
              nprobe: Int, isFloat: Boolean): ArrayData = {
    val dim = vec.numElements()
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val sims = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val row = centroids(c)
      var s = 0.0
      val n = math.min(dim, row.length)
      var j = 0
      while (j < n) { s += v(j) * row(j); j += 1 }
      sims(c) = s // query norm is constant per row — rank-invariant
      c += 1
    }
    val k = math.min(nprobe, centroids.length)
    val picked = new Array[Int](k)
    val used = new Array[Boolean](centroids.length)
    var p = 0
    while (p < k) {
      var best = -1
      var bestSim = Double.NegativeInfinity
      var idx = 0
      while (idx < centroids.length) {
        if (!used(idx) && sims(idx) > bestSim) { best = idx; bestSim = sims(idx) }
        idx += 1
      }
      used(best) = true
      picked(p) = best
      p += 1
    }
    new GenericArrayData(picked)
  }
}

/** `array<float|double>` × `array<float|double>` → cosine similarity,
  * dot and both norms fused into one primitive-array pass. The exact
  * fp op order of the HOF formulation it replaces
  * (`dot / (sqrt(dot(a,a)) * sqrt(dot(b,b)))`, sequential
  * accumulation) is preserved, so scores are bit-identical.
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimExpr.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineSimExpr.cosine($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpr {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def cosine(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val nDot = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < nDot) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      i += 1
    }
    var na = 0.0
    i = 0
    while (i < a.numElements()) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      na += x * x
      i += 1
    }
    var nb = 0.0
    i = 0
    while (i < b.numElements()) {
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** `array<float|double>` vector → `array<long>` of `tables` LSH bucket
  * signatures (`bits` sign-bits of hyperplane dots per table). The
  * hyperplane matrix rides along as a reference object; per row this
  * is one (tables·bits × dim) mat-vec in a static call instead of
  * O(tables·bits) interpreted HOF dot products.
  */
case class LshBucketsExpr(child: Expression, hyperplanes: Seq[Seq[Double]],
                          tables: Int, bits: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val matrix: Array[Array[Double]] =
    hyperplanes.map(_.toArray).toArray

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any =
    LshBucketsExpr.buckets(v.asInstanceOf[ArrayData], matrix, tables, bits,
      elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneMatrix", matrix, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshBucketsExpr.buckets($c, $ref, $tables, $bits, $elemIsFloat)")
  }
  override protected def withNewChildInternal(newChild: Expression): LshBucketsExpr =
    copy(child = newChild)
}

object LshBucketsExpr {
  def apply(c: Column, hyperplanes: Seq[Seq[Double]], tables: Int,
            bits: Int): Column =
    ColumnBridge.column(LshBucketsExpr(ColumnBridge.expression(c),
      hyperplanes, tables, bits))

  def buckets(vec: ArrayData, hp: Array[Array[Double]], tables: Int,
              bits: Int, isFloat: Boolean): ArrayData = {
    val dim = vec.numElements()
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var acc = 0L
      var b = 0
      while (b < bits) {
        val row = hp(t * bits + b)
        val n = math.min(dim, row.length)
        var s = 0.0
        var j = 0
        while (j < n) { s += v(j) * row(j); j += 1 }
        if (s > 0) acc += (1L << b)
        b += 1
      }
      out(t) = acc
      t += 1
    }
    new GenericArrayData(out)
  }
}

object MinHashBandsExpr {
  def apply(c: Column, k: Int, bands: Int): Column =
    ColumnBridge.column(MinHashBandsExpr(ColumnBridge.expression(c), k, bands))
}

object NearestCells {
  def apply(c: Column, centroids: Seq[Seq[Double]], nprobe: Int): Column =
    ColumnBridge.column(NearestCellsExpr(ColumnBridge.expression(c), centroids, nprobe))
}

object ShinglesExpr {
  def apply(c: Column, n: Int): Column =
    ColumnBridge.column(ShinglesExpr(ColumnBridge.expression(c), n))
}

object RollingHashExpr {
  def apply(c: Column, base: Long, mod: Long): Column =
    ColumnBridge.column(RollingHashExpr(ColumnBridge.expression(c), base, mod))
}

object SimHash64Expr {
  def apply(c: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(c)))
}
