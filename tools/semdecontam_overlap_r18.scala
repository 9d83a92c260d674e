// Round-18 q246 measurement: overlap between the SEMANTIC decontam cut
// (q246 — benchmark vectors probe the q238 cell space, cosine >= tau) and
// the N-GRAM decontam cut (q222 — benchmark 8-gram span cut) at sf0.1.
// Feeds DEDUP_QUALITY.md §semantic-decontam.
//
//   /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC --conf spark.sql.shuffle.partitions=32 \
//     --driver-memory 24g \
//     --jars target/scala-2.13/airflowetlfinancemarketspark_2.13-0.1.0.jar \
//     -I tools/semdecontam_overlap_r18.scala
//
// NOTE: statements are single-line — the REPL cuts at any complete expression.
import org.apache.spark.sql.functions._
import graft.operators.{Similarity, TextOps}
import graft.sources.Tables

val dir = "/root/testdata/sf0.1"
spark.sparkContext.setLogLevel("WARN")

// semantic cut: flagged corpus vec_ids
val sem = Similarity.semanticDecontam(spark, dir).select("vec_id").collect().map(_.getLong(0)).toSet

// n-gram cut: corpus docs q222 actually removed tokens from
val ngram = TextOps.benchmarkDecontam(spark, dir).filter(col("n_removed") > 0).select("doc_id").collect().map(_.getLong(0)).toSet

val nCorpus = Tables.documents(spark, dir).filter(col("source") =!= "src0").count()
// only docs with an aligned embedding can be semantically flagged
val nEmb = Tables.embeddings(spark, dir).count()
// the n-gram cut restricted to that aligned id range — the comparable set
val ngramAligned = ngram.filter(_ < nEmb)

val both = sem.intersect(ngramAligned)
println(f"corpus_docs=$nCorpus aligned_embeddings=$nEmb")
println(f"ngram_cut=${ngram.size} ngram_cut_aligned=${ngramAligned.size} semantic_cut=${sem.size} both=${both.size}")
println(f"semantic_only=${(sem diff ngramAligned).size} ngram_only=${(ngramAligned diff sem).size}")
if (sem.nonEmpty) println(f"ngram_coverage_of_semantic=${both.size.toDouble / sem.size}%.3f")
if (ngramAligned.nonEmpty) println(f"semantic_coverage_of_ngram=${both.size.toDouble / ngramAligned.size}%.3f")
sys.exit(0)
