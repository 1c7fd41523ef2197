package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.{Dedup, Similarity}

/** Dev probe: measure recall/precision of the six golden-only ANN/sketch
  * kernels (q31/q32/q34/q42/q56/q102) against exact oracles on planted
  * near-dup pairs at the DECLARED query parameters — used once to set the
  * floors asserted in AnnRecallSpec (floors go well under the measured
  * deterministic values).
  */
object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(8, "graft-probe-recall")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- vector side: planted twin corpus (same rule as q119) ----
    val corpus = graft.queries.Vector.plantedCorpus(spark, d).cache()
    val nBase = corpus.filter($"vec_id" < 1000000L).count()
    println(s"[probe] corpus=${corpus.count()} base=$nBase")

    // exact twin cosines
    val twinCos = corpus.filter($"vec_id" < 1000000L).as("a")
      .join(corpus.filter($"vec_id" >= 1000000L).as("b"),
        col("a.vec_id") + 1000000L === col("b.vec_id"))
      .select(col("a.vec_id").as("id"),
        (graft.functions.DotProduct(col("a.v"), col("b.v")) /
          (sqrt(graft.functions.DotProduct(col("a.v"), col("a.v"))) *
           sqrt(graft.functions.DotProduct(col("b.v"), col("b.v"))))).as("cos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    println(f"[probe] twin cosine min=${twinCos.values.min}%.4f " +
      f"mean=${twinCos.values.sum / twinCos.size}%.4f max=${twinCos.values.max}%.4f")

    def recallOf(name: String, df: org.apache.spark.sql.DataFrame): Double = {
      // fraction of base vectors whose planted twin appears in their top-k
      val byQuery = df.select(col("a_id"), col("neighbor_id")).collect()
        .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
      val hits = (0L until nBase).count(i =>
        twinCos.contains(i) && byQuery.getOrElse(i, Set.empty).contains(i + 1000000L))
      val r = hits.toDouble / twinCos.size
      println(f"[probe] $name twin-recall@k = $r%.4f")
      r
    }

    recallOf("q42 annTopK(k=3, nPlanes=8)",
      Similarity.annTopK(corpus, "vec_id", "v", k = 3, nPlanes = 8))
    recallOf("q56 ivfTopK(k=3, nCells=0auto, nProbe=4)",
      Similarity.ivfTopK(corpus, "vec_id", "v", k = 3, nCells = 0, nProbe = 4))
    recallOf("q102 ivfTopK2(k=3, 16/8/4/8)",
      Similarity.ivfTopK2(corpus, "vec_id", "v", k = 3,
        nCoarse = 16, nFinePerCell = 8, nProbeCoarse = 4, nProbeFine = 8))

    // q42 precision@1 vs exact global top-1 on the planted corpus
    val exactTop1 = Similarity.bruteForceTopK(corpus, "vec_id", "v", 1)
      .collect().map(r => r.getAs[Long]("a_id") -> r.getAs[Long]("neighbor_id")).toMap
    val annTop1 = Similarity.annTopK(corpus, "vec_id", "v", k = 3, nPlanes = 8)
      .filter($"rn" === 1)
      .collect().map(r => r.getAs[Long]("a_id") -> r.getAs[Long]("neighbor_id")).toMap
    val p1 = annTop1.count { case (a, nb) => exactTop1.get(a).contains(nb) }.toDouble / annTop1.size
    println(f"[probe] q42 precision@1 (ann top-1 == exact top-1 | answered) = $p1%.4f n=${annTop1.size}")

    // q34 declared params: 16-plane bucket collision of planted twins vs random pairs
    val buckets = corpus
      .select($"vec_id", graft.functions.VectorFunctions.lshBucket($"v", 16, 64).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val twinColl = twinCos.keys.count(i => buckets(i) == buckets(i + 1000000L)).toDouble / twinCos.size
    val rnd = new scala.util.Random(7)
    val ids = buckets.keys.toArray.sorted
    val randColl = (1 to 20000).count { _ =>
      val a = ids(rnd.nextInt(ids.length)); val b = ids(rnd.nextInt(ids.length))
      a != b && math.abs(a - b) != 1000000L && buckets(a) == buckets(b)
    }.toDouble / 20000
    println(f"[probe] q34 bucket collision: twins=$twinColl%.4f random=$randColl%.5f")

    // ---- text side: planted twin documents ----
    val docs = Tables.documents(spark, d).select($"doc_id", $"text")
    val twinsHi = docs.select(($"doc_id" + 1000000L).as("doc_id"),
      concat($"text", lit(" zyxappend")).as("text"))  // J ≈ (n-2)/(n-1)
    val planted = docs.unionByName(twinsHi).cache()

    // exact 3-shingle Jaccard per planted pair (the q30 oracle kernel)
    val sh = graft.functions.TextFunctions
      .explodedWordShingles(planted, Seq("doc_id"), "text", 3)
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    def jac(a: Set[String], b: Set[String]): Double =
      if (a.isEmpty && b.isEmpty) 1.0 else (a & b).size.toDouble / (a | b).size
    val exactJ = sh.keys.filter(_ < 1000000L).filter(i => sh.contains(i + 1000000L))
      .map(i => i -> jac(sh(i), sh(i + 1000000L))).toMap
    println(f"[probe] planted doc Jaccard min=${exactJ.values.min}%.3f mean=${exactJ.values.sum / exactJ.size}%.3f")

    // q31 declared params: candidates from 64 hashes / 16 bands
    val cands = Dedup.minHashCandidates(planted, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall31 = exactJ.keys.count(i => cands.contains((i, i + 1000000L))).toDouble / exactJ.size
    println(f"[probe] q31 minhash candidate twin-recall = $recall31%.4f (candidates=${cands.size})")

    // q31 estimate accuracy: signature agreement ≈ exact Jaccard
    val sigs = Dedup.minHashSignatures(planted, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val errs = exactJ.map { case (i, j) =>
      val (sa, sb) = (sigs(i), sigs(i + 1000000L))
      val est = sa.zip(sb).count(p => p._1 == p._2).toDouble / sa.size
      math.abs(est - j)
    }
    println(f"[probe] q31 |minhash est − exact J|: mean=${errs.sum / errs.size}%.4f max=${errs.max}%.4f")

    // q32: simhash hamming separation, twins vs random pairs
    val sims = Dedup.simHash(planted, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val twinHam = exactJ.keys.map(i => ham(sims(i), sims(i + 1000000L)))
    val docIds = sims.keys.filter(_ < 1000000L).toArray.sorted
    val rndHam = (1 to 20000).map { _ =>
      val a = docIds(rnd.nextInt(docIds.length)); val b = docIds(rnd.nextInt(docIds.length))
      ham(sims(a), sims(b))
    }.filter(_ > 0)
    println(f"[probe] q32 hamming: twins mean=${twinHam.sum.toDouble / twinHam.size}%.2f " +
      f"max=${twinHam.max} random mean=${rndHam.sum.toDouble / rndHam.size}%.2f")
    spark.stop()
  }
}
