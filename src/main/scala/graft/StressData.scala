package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic ~10× scale-up of the sf0.1 fixture, for the round-7
  * empirical scaling run (NOTES_r7): tile the FACT tables (lineitem,
  * orders, events, documents, embeddings) `reps` times with
  * key/time shifts, keep the dimensions (region/nation/customer/
  * supplier/part) unchanged — "more facts, same dims", which is what a
  * real 10× looks like. Everything is a pure function of (replica,
  * row), so two runs produce byte-identical tables.
  *
  * Shapes chosen so per-family work scales HONESTLY (~linearly) rather
  * than by construction:
  *   - lineitem/orders: orderkey-shifted replicas (dims keep joining —
  *     cust/supp/part keys are untouched);
  *   - events: same user population, ts shifted by a replica stride →
  *     every user's history is 10× longer (sessionize/retention/rolling
  *     windows see real growth, not just more users);
  *   - documents: replica r>0 deterministically SHUFFLES each doc's
  *     words (sort by md5(word, doc, r)) — vocabulary/language/token
  *     stats stay realistic but n-gram shingle sets diverge, so the
  *     near-dup family does 10× honest work instead of discovering
  *     10-sized artificial clusters (a tag-prefix replica would be
  *     ~0.95 Jaccard to its original and quadratically inflate the
  *     verified-pair count);
  *   - embeddings: small deterministic per-(replica, dim) perturbation,
  *     same norm scale → ANN/k-means/kNN cost scales with n.
  *
  * Usage: runMain graft.StressData <srcSfDir> <outDir> [reps=10]
  */
object StressData {

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1")
    val reps = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit = {
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
      System.err.println(s"[stress] wrote $t")
    }
    val rep = spark.range(0, reps).toDF("__r")

    // dims: copy through unchanged
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(t => write(read(t), t))

    // lineitem/orders: shift the order spine per replica; other keys
    // (part/supp/cust) keep their ranges so dim joins stay dense
    val okSpan = 10000000L
    write(read("orders").crossJoin(rep)
      .withColumn("o_orderkey", col("o_orderkey") + col("__r") * okSpan)
      .drop("__r"), "orders")
    write(read("lineitem").crossJoin(rep)
      .withColumn("l_orderkey", col("l_orderkey") + col("__r") * okSpan)
      .drop("__r"), "lineitem")

    // events: same users, replica-shifted ids and a time stride of
    // (span + 1 day) so each user's history really is `reps`× longer
    val ev = read("events")
    val evIsLong = ev.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType
    // span in MICROS whatever the physical type (nanos-long vs
    // timestamp[_ntz]); epoch math stays in the query so the driver
    // never touches a timestamp object
    val tsUs =
      if (evIsLong) col("ts") / 1000L
      else unix_micros(col("ts").cast("timestamp"))
    val mm = ev.agg(min(tsUs).cast("long"), max(tsUs).cast("long")).head()
    val strideUs: Long = mm.getLong(1) - mm.getLong(0) + 86400000000L
    val evShift =
      if (evIsLong)
        ev.crossJoin(rep)
          .withColumn("ts", col("ts") + col("__r") * strideUs * 1000L)
      else
        ev.crossJoin(rep).withColumn("ts",
          timestamp_micros(unix_micros(col("ts").cast("timestamp")) +
            col("__r") * strideUs))
    write(evShift
      .withColumn("event_id", col("event_id") + col("__r") * 100000000L)
      .drop("__r"), "events")

    // documents: replica 0 verbatim; replicas > 0 word-shuffled
    val doc = read("documents")
    // per-OCCURRENCE sort keys (position included): a per-word key
    // sorts repeated words into adjacent runs, giving every shuffled
    // doc "w w w" shingles and degenerate LSH buckets (found the hard
    // way: a 4860-doc bucket in the first 10x run)
    val shuffled = concat_ws(" ",
      transform(
        sort_array(transform(split(col("text"), " "), (w, i) =>
          struct(md5(concat_ws("#", w, i.cast("string"),
            col("doc_id"), col("__r"))).as("h"), w.as("w")))),
        s => s.getField("w")))
    write(doc.crossJoin(rep)
      .withColumn("text",
        when(col("__r") === 0, col("text")).otherwise(shuffled))
      .withColumn("doc_id", col("doc_id") + col("__r") * 10000000L)
      .withColumn("n_chars", length(col("text")))
      .drop("__r"), "documents")

    // embeddings: deterministic small per-(replica, dim) nudge
    val emb = read("embeddings")
    write(emb.crossJoin(rep)
      .withColumn("embedding",
        transform(col("embedding"), (v, j) =>
          (v + (pmod(col("__r") * 31 + j * 7, lit(17)) - lit(8))
            .cast("float") * lit(0.01f)).cast("float")))
      .withColumn("vec_id", col("vec_id") + col("__r") * 10000000L)
      .drop("__r"), "embeddings")

    spark.stop()
  }
}
