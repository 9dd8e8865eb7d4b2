package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.StatFunctions.dotProduct

/** Dev harness for the r17 q254 leave-alone audit (VERDICT r16 item 7):
  * is the PQ family's fixture-scale wall time really Catalyst planning
  * + codegen of the typedLit centroid trees, and would a broadcast
  * relation join beat it?
  *
  * Times, in one warm JVM with Bench's session config:
  *   1. q254 end-to-end (construction vs noop execution), reps;
  *   2. the ENCODE stage alone, the pre-r17 literal-tree shape vs the
  *      production broadcast-join [[graft.ops.Pq.encode]] (same 6-dp
  *      rounded distance off the same codegen'd sequential dot product,
  *      same (d, cid) tie-break, cc precomputed on the driver exactly
  *      like the literal path), split into plan-construction time and
  *      execution time;
  *   3. an equality check (except() both ways) proving the variant
  *      computes the identical codes table.
  *
  * The numbers land in OPTIMIZATION_r17.md; nothing here runs in the
  * bench or the gates.
  */
object PqExperiment {

  /** The PRE-r17 literal-tree encode (assignCodes' projection shape),
    * kept here verbatim so the A/B against the production broadcast-join
    * [[graft.ops.Pq.encode]] stays reproducible: per subspace, the m*k
    * centroids ride the expression as typedLit arrays and the argmin is
    * sort_array(array(struct(d, cid)))(0). */
  private def encodeLiteral(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, cents: DataFrame): DataFrame = {
    val subDim = dim / m
    val cmap: Map[(Int, Int), Array[Double]] = cents.collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getInt(2), r.getDouble(3))))
      .groupBy(_._1)
      .map { case (key, rs) =>
        val arr = new Array[Double](rs.length)
        rs.foreach { case (_, (pos, v)) => arr(pos) = v }
        key -> arr
      }
    val xd = col(vecCol).cast("array<double>")
    val perSub = (0 until m).map { s =>
      val sv = slice(xd, s * subDim + 1, subDim)
      val xx = dotProduct(sv, sv)
      val scored = cmap.collect { case ((`s`, cid), c) =>
        val cc = c.map(v => v * v).sum
        struct(
          round(xx - lit(2.0) * dotProduct(sv, typedLit(c.toSeq)) + lit(cc),
            6).as("d"),
          lit(cid).as("cid"))
      }.toSeq
      struct(lit(s).as("s"),
        sort_array(array(scored: _*)).getItem(0).getField("cid").as("code"))
    }
    corpus.where(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), explode(array(perSub: _*)).as("__pq_sc"))
      .select(col("id"), col("__pq_sc.s").as("s"), col("__pq_sc.code").as("code"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9
    // warmup: scan + shuffle + codegen
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .groupBy((col("vec_id") % 7).as("g")).count()
      .write.format("noop").mode("overwrite").save()

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val (dim, m, k) = (64, 4, 8)

    // ---- 1. q254 end-to-end, construction vs execution ----------------
    (1 to reps).foreach { r =>
      graft.ops.SessionCache.clearAll()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries("q254_pq_adc_recall")(spark, sfDir)
      val tBuild = secs(t0)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+optimization+planning
      val tPlan = secs(t1)
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val tExec = secs(t2)
      System.err.println(f"[pqexp] q254 rep$r: construct(+Lloyd jobs)=" +
        f"$tBuild%.2fs finalPlan=$tPlan%.2fs exec=$tExec%.2fs")
    }

    // ---- 2. encode stage A/B: literal trees vs broadcast join ---------
    graft.ops.SessionCache.clearAll()
    val cents = graft.ops.Pq.trainCodebooks(
      e, "vec_id", "embedding", dim, m, k, rounds = 1)
      .localCheckpoint(true)
    Seq(
      ("literal", () => encodeLiteral(
        e, "vec_id", "embedding", dim, m, cents)),
      ("join", () => graft.ops.Pq.encode(
        e, "vec_id", "embedding", dim, m, cents))
    ).foreach { case (tag, mk) =>
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val df = mk()
        df.queryExecution.executedPlan
        val tPlan = secs(t0)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        System.err.println(f"[pqexp] encode-$tag rep$r: " +
          f"construct+plan=$tPlan%.2fs exec=${secs(t1)}%.2fs")
      }
    }

    // ---- 3. equality: the join variant must be bit-identical ----------
    val lit0 = encodeLiteral(e, "vec_id", "embedding", dim, m, cents)
    val join0 = graft.ops.Pq.encode(e, "vec_id", "embedding", dim, m, cents)
    val d1 = lit0.except(join0).count()
    val d2 = join0.except(lit0).count()
    System.err.println(s"[pqexp] equality: literal\\join=$d1 join\\literal=$d2" +
      (if (d1 == 0 && d2 == 0) " IDENTICAL" else " MISMATCH"))
    spark.stop()
  }
}
