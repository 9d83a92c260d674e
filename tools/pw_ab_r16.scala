import org.apache.spark.sql.functions._
val df = spark.range(0, 2000000).select((col("id")%1000).as("u"), (col("id")/1000).cast("long").as("v"), lit(1L).as("w"))
val non = df.repartitionByRange(8, col("v")).localCheckpoint(true)
def writeB(in: org.apache.spark.sql.DataFrame, tbl: String, path: String): Long = { val t0=System.nanoTime; in.write.format("parquet").bucketBy(8, "u").sortBy("u","v").option("path", path).saveAsTable(tbl); (System.nanoTime-t0)/1000000 }
spark.conf.set("spark.sql.optimizer.plannedWrite.enabled", true)
val tOn = writeB(non, "t_pw_on", "/tmp/pw_on")
spark.conf.set("spark.sql.optimizer.plannedWrite.enabled", false)
val tOff = writeB(non, "t_pw_off", "/tmp/pw_off")
spark.conf.set("spark.sql.optimizer.plannedWrite.enabled", true)
val tPre = writeB(non.repartition(8, col("u")), "t_pw_pre", "/tmp/pw_pre")
def filesPerBucket(p: String) = { val re = "_(\\d{5})\\.".r; val fs = new java.io.File(p).listFiles.map(_.getName).filter(_.startsWith("part-")); fs.flatMap(n => re.findFirstMatchIn(n).map(_.group(1).toInt)).groupBy(identity).view.mapValues(_.length).toMap.toSeq.sorted }
println("ZI ON(ms=" + tOn + "): " + filesPerBucket("/tmp/pw_on"))
println("ZI OFF(ms=" + tOff + "): " + filesPerBucket("/tmp/pw_off"))
println("ZI PRE(ms=" + tPre + "): " + filesPerBucket("/tmp/pw_pre"))
sys.exit(0)
