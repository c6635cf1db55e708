import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object PrProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t[A](tag: String)(b: => A): A = { val t0 = System.nanoTime(); val r = b; println(f"[prof] $tag ${(System.nanoTime()-t0)/1e9}%.2fs"); r }
    def gramsOld(textCol: String, n: Int) =
      array_distinct(expr(
        s"CASE WHEN size(split($textCol, ' ')) >= $n THEN " +
          s"transform(sequence(1, size(split($textCol, ' ')) - ${n - 1}), " +
          s"i -> concat_ws(' ', slice(split($textCol, ' '), i, $n))) " +
          "ELSE array() END"))
    def gramsNew(textCol: String, n: Int) =
      array_distinct(expr(
        s"element_at(transform(array(split($textCol, ' ')), toks -> " +
          s"CASE WHEN size(toks) >= $n THEN " +
          s"transform(sequence(1, size(toks) - ${n - 1}), i -> concat_ws(' ', slice(toks, i, $n))) " +
          s"ELSE CAST(array() AS ARRAY<STRING>) END), 1)"))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    val train = docs.filter(col("doc_id") >= 50)
    for (rep <- 1 to 2) {
      t("grams-old")(
        train.select(col("doc_id"), size(gramsOld("text", 3)).as("n")).agg(sum("n")).collect())
      t("grams-new")(
        train.select(col("doc_id"), size(gramsNew("text", 3)).as("n")).agg(sum("n")).collect())
      // equality check
      val diff = train.select(gramsOld("text", 3).as("a"), gramsNew("text", 3).as("b"))
        .filter(col("a") =!= col("b")).count()
      println(s"[prof] mismatch rows $diff")
    }
    spark.stop()
  }
}
