package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.catalog.{CollectionCatalog, CommitCoordinator, StoreIO}

/** One side of the MULTI-PROCESS commit race (LeaseCoordinatorSpec
  * spawns two of these as real JVMs): upserts `perWriter` rows into a
  * shared collection through the lease-file coordinator, retrying on
  * the loud loser path, with the store forced through the Hadoop
  * backend — so mutual exclusion can only come from the leases, never
  * from the local filesystem's own O_EXCL. Exit 0 = all rows committed.
  *
  * args: <storeRoot> <writerTag> <perWriter> */
object LeaseRaceWriter {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: LeaseRaceWriter <storeRoot> <tag> <perWriter>")
    val Array(root, tag, perWriterS) = args
    val perWriter = perWriterS.toInt
    val spark = GraftSession.builder("local[4]", 4)
      .appName(s"lease-race-$tag").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set(StoreIO.ForceKey, "hadoop")
    conf.set(CommitCoordinator.ConfKey, s"lease:$root/.locks")
    import spark.implicits._
    val c = new CollectionCatalog(spark, root, numBuckets = 4)
      .getOrCreateCollection("c")
    var retries = 0
    (0 until perWriter).foreach { i =>
      var done = false
      var attempts = 0
      while (!done) {
        try {
          c.upsert(Seq((s"$tag$i", s"doc $tag$i")).toDF("id", "document")
            .withColumn("embedding", typedLit(Seq(i.toFloat, 1.0f))))
          done = true
        } catch {
          case _: java.util.ConcurrentModificationException =>
            retries += 1; attempts += 1
            require(attempts < 200, s"retry storm in writer $tag — no progress")
            Thread.sleep(10L)
        }
      }
    }
    // the spec greps this line: committed-row receipt + observed races
    println(s"LEASE_WRITER_DONE tag=$tag rows=$perWriter retries=$retries")
    spark.stop()
    sys.exit(0)
  }
}
