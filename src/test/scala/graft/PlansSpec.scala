package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.{ParseTsHeader, TsColumns, TsPeek}
import graft.ts.{TsCodec, TsPipeline}

/** The Catalyst parse route (P1 expression + P3 fast-path rule) must
  * agree with the typed codec, and the optimizer rule must eliminate the
  * struct build on single-field access. */
class PlansSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def withExtSession(f: SparkSession => Unit): Unit = {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try f(spark)
    finally {
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }

  private def rawBytes(spark: SparkSession) = {
    import spark.implicits._
    spark.sparkContext
      .binaryRecords(TsPipeline.DefaultCapture, TsCodec.PacketSize)
      .zipWithIndex()
      .map { case (b, i) => (i, b) }
      .toDF("seq", "bytes")
  }

  test("parse_ts fields == typed codec on every capture packet") {
    withExtSession { spark =>
      val viaExpr = rawBytes(spark)
        .select(col("seq"), TsColumns.parse_ts(col("bytes")).as("h"))
        .select(col("seq"), col("h.pid"), col("h.pusi"), col("h.cc"),
          col("h.has_af"), col("h.has_payload"), col("h.scrambling"),
          col("h.tei"), col("h.priority"), col("h.sync_ok"))
        .collect()
        .map(r => (r.getLong(0), (r.getInt(1), r.getBoolean(2),
          r.getInt(3), r.getBoolean(4), r.getBoolean(5), r.getInt(6),
          r.getBoolean(7), r.getBoolean(8), r.getBoolean(9))))
        .toMap
      val viaCodec = TsPipeline.packets(spark).collect()
        .map(p => (p.seq, (p.pid, p.pusi, p.cc, p.hasAf, p.hasPayload,
          p.scrambling, p.tei, p.priority, true)))
        .toMap
      assert(viaExpr.size == 15029)
      assert(viaCodec.forall { case (seq, t) => viaExpr(seq) == t })
    }
  }

  test("field access is rewritten to TsPeek (no struct build) and SQL works") {
    withExtSession { spark =>
      val df = rawBytes(spark)
        .select(TsColumns.parse_ts(col("bytes")).getField("pid").as("pid"))
      val optimized = df.queryExecution.optimizedPlan
      val exprs = optimized.expressions.flatMap(_.collect {
        case p: ParseTsHeader => p
        case t: TsPeek => t
      })
      assert(exprs.exists(_.isInstanceOf[TsPeek]),
        s"rule did not fire:\n$optimized")
      assert(!exprs.exists(_.isInstanceOf[ParseTsHeader]),
        s"struct build survived:\n$optimized")
      // histogram via the peek route matches the typed pipeline (F2)
      val viaPeek = df.groupBy("pid").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val viaTyped = TsPipeline.pidStats(TsPipeline.packets(spark))
        .select("pid", "n_packets").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(viaPeek.filter(_._2 > 0) == viaTyped)
      // and the SQL registration path parses too
      rawBytes(spark).createOrReplaceTempView("raw_ts")
      val viaSql = spark
        .sql("SELECT parse_ts(bytes).pid AS pid FROM raw_ts " +
          "WHERE parse_ts(bytes).sync_ok GROUP BY 1 ORDER BY 1")
        .collect().map(_.getInt(0)).toSet
      assert(viaSql == viaTyped.keySet)
    }
  }

  test("ForwardFillExec: custom strategy plans a one-pass fill that " +
    "equals the window path, with exchange+sort and no WindowExec") {
    withExtSession { spark =>
      import org.apache.spark.sql.expressions.Window
      import graft.plans.{ForwardFill, ForwardFillExec}
      val events = Tables.events(spark, "/root/testdata/sf0.001")
        .withColumn("sparse",
          when(col("event_type") === "click", col("value")))
      val filled = ForwardFill(events,
        Seq("user_id"), "event_id", "sparse", "carried")
      // 1. semantics: equals last(ignoreNulls) over the ordered window
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val viaWindow = events
        .withColumn("carried", last(col("sparse"), ignoreNulls = true).over(w))
      assert(filled.exceptAll(viaWindow).count() == 0 &&
        viaWindow.exceptAll(filled).count() == 0)
      // 2. leading rows before the first non-null stay null
      val firstClick = events.filter(col("sparse").isNotNull)
        .groupBy("user_id").agg(min("event_id").as("first_ev"))
      val badLeading = filled.join(firstClick, Seq("user_id"))
        .filter(col("event_id") < col("first_ev") &&
          col("carried").isNotNull)
      assert(badLeading.count() == 0)
      // 3. plan shape: our exec node, fed by exchange + sort, no Window
      filled.count()
      val plan = filled.queryExecution.executedPlan.toString
      assert(plan.contains("ForwardFill"), plan.take(800))
      assert(plan.contains("Exchange hashpartitioning"), plan.take(800))
      assert(plan.contains("Sort ["), plan.take(800))
      assert(!plan.contains("Window"), plan.take(800))
      // 4. the physical node really is ours (not a fallback plan) —
      // descend through the AQE wrappers, which are leaves to a plain
      // traversal
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def flat(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => flat(a.executedPlan)
        case q: QueryStageExec => flat(q.plan)
        case o => o +: o.children.flatMap(flat)
      }
      assert(flat(filled.queryExecution.executedPlan)
        .exists(_.isInstanceOf[ForwardFillExec]))
    }
  }
}
