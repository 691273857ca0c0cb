package graft

import graft.sources.StateStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Exactly-once replay + compaction lifecycle for per-batch append state
  * (the live corpus pipeline's store/seen tables) and the
  * replay-idempotent stored-LSH-index publish.
  */
class StateStoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def delta(b: Int, n: Int): DataFrame =
    (0 until n).map(i => (b * 1000L + i, s"doc_${b}_$i")).toDF("doc_id", "h")

  private def fingerprint(df: DataFrame): (Long, java.math.BigDecimal) = {
    // decimal(38,0) sum: xxhash64 longs overflow an ANSI bigint sum
    val r = df.agg(count(lit(1)),
      sum(xxhash64(col("doc_id"), col("h")).cast("decimal(38,0)"))).head()
    (r.getLong(0), r.getDecimal(1))
  }

  test("publishBatch replay rewrites its own partition — no double-append") {
    val root = Files.createTempDirectory("state").toString
    StateStore.publishBatch(delta(-1, 0), root, -1) // day-0 empty
    StateStore.publishBatch(delta(0, 5), root, 0)
    StateStore.publishBatch(delta(1, 7), root, 1)
    val before = fingerprint(StateStore.read(spark, root))
    assert(before._1 == 12)
    // checkpoint-replayed batch 1: same content, same partition
    StateStore.publishBatch(delta(1, 7), root, 1)
    assert(fingerprint(StateStore.read(spark, root)) == before,
      "replayed publish must not change state content")
  }

  test("compact folds committed partitions into one generation; content exact; replay still safe") {
    val root = Files.createTempDirectory("state").toString
    StateStore.publishBatch(delta(-1, 3), root, -1)
    (0 to 3).foreach(b => StateStore.publishBatch(delta(b, 4 + b), root, b))
    val before = fingerprint(StateStore.read(spark, root))
    def dirNames = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted.toSeq
    assert(dirNames.length == 5)
    // inside foreachBatch(3): batches ≤ 2 are checkpoint-committed
    val (folded, fb, fa) = StateStore.compact(spark, root, uptoBatch = 2)
    assert(folded == 4 && fb >= 4 && fa <= fb)
    assert(dirNames == Seq("batch=-2", "batch=3"),
      s"expected one generation + the open batch, got $dirNames")
    assert(fingerprint(StateStore.read(spark, root)) == before,
      "fold must preserve state content exactly")
    // batch 3 was NOT folded (uncommitted): its replay still lands on its
    // own partition and cannot double-count against the generation
    StateStore.publishBatch(delta(3, 7), root, 3)
    assert(fingerprint(StateStore.read(spark, root)) == before)
    // a later fold takes the NEXT generation id (-3), never colliding
    StateStore.publishBatch(delta(4, 2), root, 4)
    StateStore.compact(spark, root, uptoBatch = 3)
    assert(dirNames == Seq("batch=-3", "batch=4"))
    val after2 = fingerprint(StateStore.read(spark, root))
    assert(after2._1 == before._1 + 2)
  }

  test("fold crash recovery: journaled flip completes; wip drafts and orphan tmps are swept pre-commit") {
    val root = Files.createTempDirectory("state").toString
    StateStore.publishBatch(delta(0, 5), root, 0)
    StateStore.publishBatch(delta(1, 5), root, 1)
    val truth = fingerprint(StateStore.read(spark, root))
    val rootF = new java.io.File(root)
    // hand-build a crashed fold: tmp holds the folded copy, journal is
    // live, partitions not yet deleted (= crash right after the journal
    // rename)
    val tmp = new java.io.File(rootF, "_state_tmp_c0ffee")
    spark.read.parquet(root).drop("batch").repartition(1)
      .write.parquet(tmp.getAbsolutePath)
    val target = new java.io.File(rootF, "batch=-2")
    val folds = rootF.listFiles().filter(_.getName.startsWith("batch="))
      .map(_.getAbsolutePath).sorted
    Files.writeString(
      new java.io.File(rootF, "_graft_state_journal_c0ffee.txt").toPath,
      (Seq(target.getAbsolutePath, tmp.getAbsolutePath) ++ folds)
        .mkString("\n"))
    // plus a truncated wip draft and an orphan tmp from older runs
    Files.writeString(
      new java.io.File(rootF, "_graft_state_wip_dead.txt").toPath, "trunc")
    new java.io.File(rootF, "_state_tmp_orphan").mkdirs()
    assert(fingerprint(StateStore.read(spark, root)) == truth,
      "read-side recovery must complete the fold and stay exact")
    val names = rootF.listFiles().map(_.getName).toSet
    assert(names.contains("batch=-2"))
    assert(!names.exists(_.startsWith("_state_tmp_")) &&
      !names.exists(_.startsWith("_graft_state_")),
      s"leftovers: $names")
    // idempotent on a clean dir
    StateStore.recover(spark, root)
    assert(fingerprint(StateStore.read(spark, root)) == truth)
  }

  test("appendLshIndexIdempotent: a replayed batch publish leaves the index byte-identical") {
    import graft.dedup.Dedup
    val dir = Files.createTempDirectory("lshidem").toString
    val name = "statespec_lsh_idem"
    def docs(lo: Int, hi: Int): DataFrame =
      (lo until hi).map { i =>
        (i.toLong, (0 until 12).map(j => s"w${(i * 7 + j * 3) % 40}"))
      }.toDF("doc_id", "toks")
    Dedup.writeLshIndex(docs(0, 20), "doc_id", "toks",
      shingleN = 3, k = 16, bands = 4, name, dir + "/idx", buckets = 4)
    def fp(): (Long, java.math.BigDecimal) = {
      spark.catalog.refreshTable(name)
      // schema is (base_id, bucket) — the bucket string embeds the band
      val r = spark.table(name).agg(count(lit(1)),
        sum(xxhash64(col("base_id"), col("bucket"))
          .cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1))
    }
    val base = fp()
    Dedup.appendLshIndexIdempotent(docs(20, 30), "doc_id", "toks",
      shingleN = 3, k = 16, bands = 4, name, dir + "/idx", batchId = 1,
      buckets = 4)
    val once = fp()
    assert(once._1 == base._1 + 10 * 4, "batch bands missing from the index")
    // crash-replay: the same batch publishes again — content must not move
    Dedup.appendLshIndexIdempotent(docs(20, 30), "doc_id", "toks",
      shingleN = 3, k = 16, bands = 4, name, dir + "/idx", batchId = 1,
      buckets = 4)
    assert(fp() == once, "replayed publish duplicated band rows")
    // ...including after a PARTIAL prior publish (half the files moved in,
    // then a crash): fabricate it by deleting one b1_ file, then replay
    val idxDir = new java.io.File(dir + "/idx")
    val b1 = idxDir.listFiles().filter(_.getName.startsWith("b1_"))
    assert(b1.nonEmpty)
    b1.head.delete()
    assert(fp() != once) // index is now visibly partial
    Dedup.appendLshIndexIdempotent(docs(20, 30), "doc_id", "toks",
      shingleN = 3, k = 16, bands = 4, name, dir + "/idx", batchId = 1,
      buckets = 4)
    assert(fp() == once, "replay after a partial publish must restore exactly-once")
    // the published files still read as ONE bucketed table: a bucket-keyed
    // aggregation over the index plans with zero Exchange
    val agg = spark.table(name).groupBy("bucket")
      .agg(count(lit(1)).as("n"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucket distribution lost after file moves:\n$plan")
    spark.sql(s"DROP TABLE IF EXISTS $name")
  }
}
