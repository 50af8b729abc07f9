package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Scratch micro-bench — not part of the driver contract. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    // warmup
    docs.count()
    time("simhash_perrow")(Dedup.simhash(docs, "doc_id", "text").count())
    time("simhash_grouped")(Dedup.simhashGrouped(docs, "doc_id", "text").count())
    time("simhash_perrow2")(Dedup.simhash(docs, "doc_id", "text").count())
    time("simhash_grouped2")(Dedup.simhashGrouped(docs, "doc_id", "text").count())
    // candidate volume at sf0.1
    val sk = Dedup.simhash(docs, "doc_id", "text").select(col("doc_id"), col("simhash"))
    val banded = sk.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(bi =>
        shiftright(col("simhash"), bi * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band", "band_bits")))
    val bb = banded.groupBy(col("band"), col("band_bits")).count()
    bb.orderBy(col("count").desc).show(10)
    println("candidate pair rows = " + banded.alias("a").join(banded.alias("b"),
      expr("a.band = b.band AND a.band_bits = b.band_bits AND a.doc_id < b.doc_id")).count())
    time("q28_full")(Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 16).count())
    time("q28_full2")(Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 16).count())
    time("q28_sorted")(Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 16)
      .orderBy(col("id_a"), col("id_b")).count())
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    emb.count()
    time("q31_lsh")(graft.ops.Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", dim = 64, k = 10, nPlanes = 4).count())
    time("q31_lsh2")(graft.ops.Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", dim = 64, k = 10, nPlanes = 4).count())
    // agreement check
    val a = Dedup.simhash(docs, "doc_id", "text").withColumnRenamed("simhash", "s1")
    val b = Dedup.simhashGrouped(docs, "doc_id", "text").withColumnRenamed("simhash", "s2")
    val diff = a.join(b, "doc_id").filter(col("s1") =!= col("s2")).count()
    println(s"disagreements: $diff")
    spark.stop()
  }
}
