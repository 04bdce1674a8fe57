package graft.tsdb

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Compressor, ErrorBound}

/** The decode generators must participate in whole-stage codegen (no
  * CodegenFallback generator breaking the stage at the Generate boundary)
  * and their partial-aggregate kernel must follow Spark's float aggregate
  * semantics — NaN sorts greatest, so MAX is NaN as soon as one value is
  * and MIN ignores NaN unless every value is — never emitting the ±Inf
  * init sentinels.
  */
class GridCodegenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def newEngine(): Engine =
    new Engine(spark, Files.createTempDirectory("graft_cg").toString)

  test("decode generators are codegen-capable") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val lit = Literal(1)
    val gp = GridPoints(lit, lit, lit, lit, lit, lit, lit, lit)
    assert(gp.supportCodegen, "GridPoints must not be CodegenFallback")
    val bp = BucketPartials(1000L, None, None, true, lit, lit, lit, lit,
      lit, lit, lit, lit)
    assert(bp.supportCodegen, "BucketPartials must not be CodegenFallback")
  }

  test("grid and bucket-partial generators run inside whole-stage codegen") {
    val engine = newEngine()
    engine.sql("CREATE TIME SERIES TABLE cg(ts TIMESTAMP, v FIELD, tag TAG)")
    import spark.implicits._
    val df = (0 until 600).map { i =>
      (1706745600000000L + i * 60000000L, i.toFloat % 37, s"t${i % 3}")
    }.toDF("ts", "v", "tag")
    engine.write("cg", df)

    // Reconstruction: Generate(gridpoints) must carry a codegen stage id.
    val pts = engine.sql("SELECT ts, v FROM cg")
    pts.collect()
    val ptsPlan = pts.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Generate""".r.findFirstIn(ptsPlan).isDefined,
      s"gridpoints Generate must be inside WholeStageCodegen:\n$ptsPlan")

    // Bucketed downsample: Generate(bucketpartials) likewise.
    val buck = engine.sql(
      "SELECT date_trunc('HOUR', ts) AS bucket, MIN(v) AS mn, MAX(v) AS mx " +
        "FROM cg GROUP BY bucket")
    buck.collect()
    val buckPlan = buck.queryExecution.executedPlan.toString
    assert(buckPlan.contains("bucketpartials"),
      s"bucketed aggregate must use the partials generator:\n$buckPlan")
    assert("""\*\(\d+\) Generate""".r.findFirstIn(buckPlan).isDefined,
      s"bucketpartials Generate must be inside WholeStageCodegen:\n$buckPlan")
  }

  test("bucket partials track NaN like Spark min/max, never emit sentinels") {
    // Lossless-compress a series whose middle hour is all-NaN and whose
    // first hour mixes NaN with real values; real segments, real decode.
    val hourUs = 3600000000L
    val ts = Array.tabulate(180)(i => i * 60000000L) // 3 hours of minutes
    val vs = Array.tabulate(180) { i =>
      if (i >= 60 && i < 120) Float.NaN       // hour 1: all NaN
      else if (i % 7 == 0) Float.NaN          // hours 0/2: mixed NaN
      else (i % 23).toFloat - 11f
    }
    val segments = Compressor.compressUnivariate(ts, vs, ErrorBound.Lossless)

    // Merge per-segment partials per bucket the way the rewrite's
    // HashAggregate does: sum counts, Spark-semantics min/max.
    case class Acc(var cnt: Long, var mn: Float, var mx: Float)
    val merged = scala.collection.mutable.LongMap.empty[Acc]
    segments.foreach { s =>
      val arr = DecodeKernels.bucketPartialsArray(hourUs, Long.MinValue,
        Long.MaxValue, false, s.modelTypeId, s.startTime, s.endTime,
        s.timestamps, s.minValue, s.maxValue, s.values, s.residuals)
      (0 until arr.numElements()).foreach { i =>
        val r = arr.getStruct(i, 8)
        val (b, cnt) = (r.getLong(0), r.getLong(1))
        val (mn, mx) = (r.getFloat(4), r.getFloat(5))
        assert(!mn.isInfinite && !mx.isInfinite,
          s"partial for bucket $b leaked an infinite sentinel: ($mn, $mx)")
        val acc = merged.getOrElseUpdate(b, Acc(0L, Float.NaN, Float.NaN))
        acc.cnt += cnt
        // Spark float ordering: NaN greatest.
        acc.mn = if (acc.mn.isNaN) mn
          else if (mn.isNaN) acc.mn else math.min(acc.mn, mn)
        acc.mx = if (acc.mx.isNaN || mx.isNaN) Float.NaN
          else math.max(acc.mx, mx)
      }
    }

    // Expected per-hour extremes under Spark semantics, from the raw data.
    (0 until 3).foreach { h =>
      val bucket = h * hourUs
      val hourVals = (0 until 180)
        .filter(i => ts(i) >= bucket && ts(i) < bucket + hourUs).map(vs)
      val acc = merged(bucket)
      assert(acc.cnt == hourVals.length.toLong)
      val nonNan = hourVals.filterNot(_.isNaN)
      val expMin = if (nonNan.isEmpty) Float.NaN else nonNan.min
      val expMax = if (hourVals.exists(_.isNaN)) Float.NaN else nonNan.max
      def eq(a: Float, b: Float) = (a.isNaN && b.isNaN) || a == b
      assert(eq(acc.mn, expMin), s"hour $h min: got ${acc.mn}, want $expMin")
      assert(eq(acc.mx, expMax), s"hour $h max: got ${acc.mx}, want $expMax")
    }
  }
}
