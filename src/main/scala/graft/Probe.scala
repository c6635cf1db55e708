package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: bucket-size distribution + candidate volume of the
  * MinHash cascade on a scaled corpus. */
object Probe {
  def main(args: Array[String]): Unit = {
    val copies = sys.env.getOrElse("SCALE_COPIES", "20").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.Dedup

    val n = 32
    val docs = ScaleCorpus.build(spark, sfDir, copies, n).localCheckpoint(true)

    val sets = Dedup.shingleSets(docs, "text", "doc_id", 5).localCheckpoint(true)
    val sig = Dedup.minhashSignatures(sets, "doc_id", 8).localCheckpoint(true)

    val bandStructs = (0 until 4).map { b =>
      val bv = concat(col(s"h${b * 2}"), col(s"h${b * 2 + 1}"))
      struct(lit(b).as("band"), bv.as("bv"))
    }
    val bands = sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("x"))
      .select(col("doc_id"), col("x.band").as("band"), col("x.bv").as("bv"))
      .localCheckpoint(true)

    val sizes = bands.groupBy("band", "bv").agg(count(lit(1)).as("sz")).localCheckpoint(true)
    System.err.println("[probe] bucket size distribution (top 10):")
    sizes.orderBy(desc("sz")).limit(10).collect()
      .foreach(r => System.err.println(s"[probe]   band=${r.get(0)} sz=${r.get(2)}"))
    val stats = sizes.agg(
      count(lit(1)).as("buckets"),
      sum(col("sz") * col("sz")).as("sum_sq")).first()
    System.err.println(s"[probe] buckets=${stats.get(0)} sum_sq(pair work)=${stats.get(1)}")
    val capped = sizes.filter(col("sz") <= 50)
      .agg(sum(col("sz") * col("sz"))).first()
    System.err.println(s"[probe] pair work with cap 50: ${capped.get(0)}")
    spark.stop()
  }
}
