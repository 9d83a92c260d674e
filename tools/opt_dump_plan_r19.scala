// Dump .explain("formatted") for queries named in OPT_QS to plans/r19/<q>_<OPT_SUFFIX>.txt
import org.apache.spark.sql.execution.ExplainMode
val sf = sys.env.getOrElse("OPT_SF", "/root/testdata/sf0.1")
val suffix = sys.env.getOrElse("OPT_SUFFIX", "before")
val outDir = java.nio.file.Paths.get(sys.env.getOrElse("OPT_PLANDIR", "plans/r19"))
java.nio.file.Files.createDirectories(outDir)
val qs = sys.env.getOrElse("OPT_QS", "").split(",").map(_.trim).filter(_.nonEmpty)
for (q <- qs) {
  val fn = graft.SparkEntry.queries(q)
  val df = fn(spark, sf)
  val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  java.nio.file.Files.write(outDir.resolve(s"${q}_$suffix.txt"),
    txt.getBytes("UTF-8"))
  println(s"PLAN_DUMPED $q -> ${outDir.resolve(s"${q}_$suffix.txt")}")
}
sys.exit(0)
