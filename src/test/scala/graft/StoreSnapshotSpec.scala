package graft

import org.apache.spark.sql.functions._
import graft.operators.Stats
import graft.streaming.StreamOps

/** AS-OF (snapshot) reads over the gen=/batch= store protocol — the
  * reproducible-training-data contract: a snapshot is either
  * bit-identical to the view a reader would have resolved when the
  * sequence head was `asOf`, or a NAMED refusal once the vacuum has
  * destroyed that history. The floor is derived from the protocol's
  * one-cycle vacuum grace (no manifest), so every claim here is a
  * machine check of the compaction protocol's retention invariants —
  * including the crashed-fold window — plus the compliance rule that
  * time travel never resurrects a taken-down id.
  */
class StoreSnapshotSpec extends SparkSuite {
  import spark.implicits._

  // batches carry exactly the compaction shape (id, sig): gen and
  // batch dirs must agree on schema, since a multi-dir parquet read
  // resolves its schema from one file (mergeSchema is off)
  private def writeBatch(store: String, b: Long): Unit =
    Seq((b, s"s$b")).toDF("id", "sig")
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$store/batch=$b")

  private def ids(df: Option[org.apache.spark.sql.DataFrame]): Seq[Long] =
    df.map(_.select("id").as[Long].collect().toSeq.sorted)
      .getOrElse(Seq.empty)

  private val shape = Seq("id" -> "bigint", "sig" -> "string")

  test("snapshot resolution tracks the protocol: exact prefixes on an " +
      "unfolded store, exact across the first fold (first-fold grace " +
      "keeps all history), floor appears at the second fold, and a " +
      "below-floor read is a named refusal citing the floor") {
    val store = s"/tmp/graft-snap-${System.nanoTime()}/store"
    (0L to 3L).foreach(writeBatch(store, _))
    // unfolded: every prefix answerable, floor = all-history
    assert(Stats.snapshotFloor(spark, store) == Long.MinValue)
    assert(ids(Stats.openCommittedStoreAsOf(spark, store, 1L, shape,
      "spec")) == Seq(0L, 1L))
    assert(ids(Stats.openCommittedStoreAsOf(spark, store, 3L, shape,
      "spec")) == Seq(0L, 1L, 2L, 3L))
    // asOf below the first batch: empty snapshot, not an error
    assert(Stats.openCommittedStoreAsOf(spark, store, -1L, shape,
      "spec").isEmpty)
    // first fold (gen=3): nothing vacuumed yet — old prefixes still
    // exact from the original batch dirs, the head reads the fold
    assert(StreamOps.compactNearDupStore(spark, store, 1).contains(3L))
    assert(Stats.snapshotFloor(spark, store) == Long.MinValue)
    assert(ids(Stats.openCommittedStoreAsOf(spark, store, 1L, shape,
      "spec")) == Seq(0L, 1L))
    assert(ids(Stats.openCommittedStoreAsOf(spark, store, 3L, shape,
      "spec")) == Seq(0L, 1L, 2L, 3L))
    // append past the fold; snapshot at 4 = gen 3 + batch 4 (and the
    // snapshot EXCLUDES committed batch 5 — an as-of read is a prefix,
    // not "whatever is newest")
    writeBatch(store, 4L)
    writeBatch(store, 5L)
    assert(ids(Stats.openCommittedStoreAsOf(spark, store, 4L, shape,
      "spec")) == Seq(0L, 1L, 2L, 3L, 4L))
    // second fold (gen=5): its vacuum destroys history <= 3 — the
    // floor surfaces, below-floor reads refuse BY NAME with the floor
    assert(StreamOps.compactNearDupStore(spark, store, 1).contains(5L))
    assert(Stats.snapshotFloor(spark, store) == 3L)
    val e = intercept[Stats.SnapshotUnavailableException] {
      Stats.committedViewDirsAsOf(spark, store, 1L)
    }
    assert(e.getMessage.contains("as of 1") &&
      e.getMessage.contains("below token 3"), e.getMessage)
    // at and above the floor: still exact (gen 3 survives one cycle)
    assert(ids(Stats.openCommittedStoreAsOf(spark, store, 3L, shape,
      "spec")) == Seq(0L, 1L, 2L, 3L))
    assert(ids(Stats.openCommittedStoreAsOf(spark, store, 4L, shape,
      "spec")) == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("a fold crashed before its vacuum only LOWERS the floor (the " +
      "extra old generation is the exact horizon) and never serves a " +
      "partial snapshot; the re-run completes the cycle") {
    val store = s"/tmp/graft-snapcrash-${System.nanoTime()}/store"
    (0L to 2L).foreach(writeBatch(store, _))
    assert(StreamOps.compactNearDupStore(spark, store, 1).contains(2L))
    writeBatch(store, 3L)
    assert(StreamOps.compactNearDupStore(spark, store, 1).contains(3L))
    // steady state: gens {2,3}, floor 2
    assert(Stats.snapshotFloor(spark, store) == 2L)
    writeBatch(store, 4L)
    // crash the third fold between its gen=4 commit and its vacuum
    Stats.compactionTestHook = (_, _) =>
      throw new RuntimeException("injected crash before vacuum")
    try {
      intercept[RuntimeException] {
        StreamOps.compactNearDupStore(spark, store, 1)
      }: Unit
    } finally Stats.compactionTestHook = (_, _) => ()
    // three generations coexist; min is the true horizon — gen 2 and
    // everything above it survived (the crashed cycle never vacuumed)
    assert(Stats.snapshotFloor(spark, store) == 2L)
    assert(ids(Stats.openCommittedStoreAsOf(spark, store, 3L, shape,
      "spec")) == Seq(0L, 1L, 2L, 3L))
    val e = intercept[Stats.SnapshotUnavailableException] {
      Stats.committedViewDirsAsOf(spark, store, 1L)
    }
    assert(e.getMessage.contains("below token 2"), e.getMessage)
    // recovery: the next append + fold completes a full cycle; the
    // floor advances monotonically, old snapshots refuse by name
    writeBatch(store, 5L)
    assert(StreamOps.compactNearDupStore(spark, store, 1).contains(5L))
    assert(Stats.snapshotFloor(spark, store) == 4L)
    assert(ids(Stats.openCommittedStoreAsOf(spark, store, 4L, shape,
      "spec")) == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("compliance: a snapshot that predates a takedown still excludes " +
      "the taken-down id (current deleted set applies retroactively), " +
      "and a drifted historical store fails the schema guard at open") {
    val store = s"/tmp/graft-snapcomp-${System.nanoTime()}/store"
    (0L to 2L).foreach(writeBatch(store, _))
    // takedown of id=1 lands at batch 3 — AFTER snapshot token 2
    StreamOps.deleteFromNearDupStore(spark, store,
      Seq(1L).toDF("id"), batchId = 3L)
    // the raw snapshot at 2 contains id 1 (the data dirs predate the
    // tombstone)…
    assert(ids(Stats.openCommittedStoreAsOf(spark, store, 2L, shape,
      "spec")) == Seq(0L, 1L, 2L))
    // …but the compliant readout drops it: retraction is retroactive
    // across snapshots
    val snap = StreamOps.nearDupStoreViewAsOf(spark, store, 2L)
    assert(snap.get.select("id").as[Long].collect().toSeq.sorted ==
      Seq(0L, 2L))
    // and an empty snapshot stays None
    assert(StreamOps.nearDupStoreViewAsOf(spark, store, -1L).isEmpty)
    // FOLDING the takedown applies + clears the tombstones and raises
    // the RETRACTION floor to the fold token: the pre-takedown corpus
    // refuses by name even though its raw dirs survive one more
    // vacuum cycle (right-to-be-forgotten bounds time travel)
    assert(Stats.retractionFloor(spark, store) == Long.MinValue)
    assert(StreamOps.compactNearDupStore(spark, store, 1).contains(2L))
    assert(Stats.retractionFloor(spark, store) == 2L)
    val rf = intercept[Stats.SnapshotUnavailableException] {
      StreamOps.nearDupStoreViewAsOf(spark, store, 1L)
    }
    assert(rf.getMessage.contains("takedown was folded at token 2"),
      rf.getMessage)
    // at the fold and above: survivors only, no resurrection
    assert(StreamOps.nearDupStoreViewAsOf(spark, store, 2L).get
      .select("id").as[Long].collect().toSeq.sorted == Seq(0L, 2L))
    // a tombstone-free LATER fold must not advance the retraction
    // floor: the cleared set leaves a committed empty generation
    // (Some, zero rows), which is not a takedown
    writeBatch(store, 5L)
    assert(StreamOps.compactNearDupStore(spark, store, 1).contains(5L))
    assert(Stats.retractionFloor(spark, store) == 2L)
    // schema guard: a drifted historical store (the column was
    // renamed before the batches this snapshot resolves) fails at
    // open with the named error citing the snapshot
    val drifted = s"/tmp/graft-snapdrift-${System.nanoTime()}/store"
    Seq((9L, "x")).toDF("doc", "sig").coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$drifted/batch=0")
    val e = intercept[Stats.StoreSchemaException] {
      Stats.openCommittedStoreAsOf(spark, drifted, 0L, shape, "spec")
    }
    assert(e.getMessage.contains("snapshot") &&
      e.getMessage.contains("as of 0"), e.getMessage)
  }

  test("maintainStores retention pin: a debt fold that would destroy " +
      "a pinned snapshot is skipped_retention (history untouched); " +
      "raising the pin to the newest generation lets the fold run; a " +
      "tombstone backlog folds THROUGH the pin and the retraction " +
      "floor then refuses the pinned read by name") {
    val store = s"/tmp/graft-snappin-${System.nanoTime()}/store"
    def fam = Seq(store ->
      (() => StreamOps.compactNearDupStore(spark, store, 1)))
    (0L to 2L).foreach(writeBatch(store, _))
    assert(StreamOps.compactNearDupStore(spark, store, 1).contains(2L))
    writeBatch(store, 3L)
    writeBatch(store, 4L)
    // pin below the newest gen: the debt fold would vacuum the dirs
    // snapshot 1 needs — skipped, with the named reason, nothing
    // touched (snapshot 1 still reads, floor unchanged)
    val out = Stats.maintainStores(spark, fam,
      Stats.MaintenancePolicy(minDebt = 2, retainSnapshotsFrom = 1L))
    assert(out.head.action == "skipped_retention" &&
      out.head.detail.contains("below gen=2"), out.head.toString)
    assert(ids(Stats.openCommittedStoreAsOf(spark, store, 1L, shape,
      "spec")) == Seq(0L, 1L))
    assert(Stats.snapshotFloor(spark, store) == Long.MinValue)
    // pin at the newest gen: the fold destroys nothing pinned — runs
    val out2 = Stats.maintainStores(spark, fam,
      Stats.MaintenancePolicy(minDebt = 2, retainSnapshotsFrom = 2L))
    assert(out2.head.action == "compacted" &&
      out2.head.newGen.contains(4L), out2.head.toString)
    // compliance overrides the pin: a takedown backlog folds anyway,
    // and the pinned snapshot then refuses by the RETRACTION floor
    writeBatch(store, 5L)
    StreamOps.deleteFromNearDupStore(spark, store,
      Seq(0L).toDF("id"), batchId = 6L)
    val out3 = Stats.maintainStores(spark, fam,
      Stats.MaintenancePolicy(minDebt = 99, minTombstones = 1,
        retainSnapshotsFrom = 1L))
    assert(out3.head.action == "compacted" &&
      out3.head.newGen.contains(5L), out3.head.toString)
    assert(Stats.retractionFloor(spark, store) == 5L)
    val e = intercept[Stats.SnapshotUnavailableException] {
      StreamOps.nearDupStoreViewAsOf(spark, store, 4L)
    }
    assert(e.getMessage.contains("takedown was folded at token 5"),
      e.getMessage)
  }

  test("keyedDiff over two compliant snapshots: the only churn " +
      "between tokens is the later batch's arrivals, and a taken-down " +
      "id appears on NEITHER side of the diff") {
    val store = s"/tmp/graft-snapdiff-${System.nanoTime()}/store"
    (0L to 3L).foreach(writeBatch(store, _))
    StreamOps.deleteFromNearDupStore(spark, store,
      Seq(3L).toDF("id"), batchId = 4L)
    val diff = Stats.keyedDiff(
        StreamOps.nearDupStoreViewAsOf(spark, store, 1L).get,
        StreamOps.nearDupStoreViewAsOf(spark, store, 3L).get,
        Seq("id"))
      .select("id", "status").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    // batch 2 arrived between the snapshots; batch 3's id is taken
    // down, so it is neither 'added' (compliant views drop it) nor
    // 'removed' (it never appears on the old side either)
    assert(diff == Seq(2L -> "added"), diff.toString)
  }
}
