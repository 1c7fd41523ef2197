package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftSession

/** Dev probe: materialize an N× scale replica of a fixture dir for the
  * sf1 scale runs (VERDICT round-2 item 8 — catch super-linear blowups
  * the sf0.1 bench can't see). PERFORMANCE data only — correctness stays
  * pinned to the driver-generated fixtures.
  *
  * Replication is key-remapped and, where the workload is similarity-
  * shaped, vocabulary-disjoint, so the WORKLOAD scales linearly like real
  * growth would (more independent data) instead of quadratically (N
  * clones of every row turning each near-dup cluster into N× pairs —
  * which no engine survives and no real corpus exhibits):
  *
  *  - orders/lineitem: keys shifted per copy; value columns unchanged →
  *    group count×N for key-grouped aggs, group size×N for status groups.
  *  - documents: doc_id shifted, source tagged per copy (pair universes
  *    stay copy-local), every word suffixed per copy — a vocabulary
  *    bijection, so intra-copy shingle/minhash/simhash structure is
  *    IDENTICAL to the original while cross-copy Jaccard is 0.
  *  - embeddings: vec_id shifted; copies beyond the first get fresh
  *    hash-derived pseudo-random unit-range components (near-orthogonal
  *    in expectation) so ANN/near-dup candidate structure grows linearly.
  *
  * Usage: runMain graft.tools.MakeScale <srcDir> <destDir> <copies>
  */
object MakeScale {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dest = args(1)
    val copies = args(2).toInt
    val keyOffset = 1000000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-makescale"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(name: String)(remap: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val out = (0 until copies).map(i => remap(base, i)).reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$dest/$name.parquet")
      println(s"[makescale] $name x$copies -> $dest")
    }

    replicate("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * keyOffset))
        .withColumn("o_custkey", col("o_custkey") + lit(i * keyOffset))
    }
    replicate("lineitem") { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * keyOffset))
        .withColumn("l_partkey", col("l_partkey") + lit(i * keyOffset))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * keyOffset))
    }
    // dimensions: keys shifted in lockstep with the fact-side foreign
    // keys so joins stay closed per copy; nation/region are fixed-size
    // catalogs (25/5 rows) and pass through unscaled, which is also how
    // real growth behaves — facts grow, geo catalogs don't
    replicate("customer") { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * keyOffset))
    }
    replicate("supplier") { (df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(i * keyOffset))
    }
    replicate("part") { (df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(i * keyOffset))
    }
    Seq("nation", "region").foreach { name =>
      spark.read.parquet(s"$src/$name.parquet")
        .write.mode("overwrite").parquet(s"$dest/$name.parquet")
      println(s"[makescale] $name copied verbatim -> $dest")
    }
    // events: ids/users shifted per copy, rowtimes unchanged — the
    // per-user event-time structure (sessions, windows, patterns) stays
    // identical per copy while user count and window sizes grow ×N
    replicate("events") { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * keyOffset))
        .withColumn("user_id", col("user_id") + lit(i * keyOffset))
    }
    replicate("documents") { (df, i) =>
      val d = df.withColumn("doc_id", col("doc_id") + lit(i * keyOffset))
        .withColumn("source", concat(col("source"), lit(s"_$i")))
      if (i == 0) d
      else d.withColumn("text", regexp_replace(col("text"), "(\\S+)", "$1" + i))
    }
    replicate("embeddings") { (df, i) =>
      val d = df.withColumn("vec_id", col("vec_id") + lit(i * keyOffset))
      if (i == 0) d
      else d.withColumn("embedding",
        expr(s"transform(embedding, (x, j) -> CAST(CAST(xxhash64(vec_id, $i, j) % 1000001 AS DOUBLE) / 1000000.0 AS FLOAT))"))
    }
    spark.stop()
  }
}
