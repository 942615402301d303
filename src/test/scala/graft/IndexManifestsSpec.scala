package graft

import java.nio.file.Files

import graft.extra.IndexManifests

/** Direct unit arms on the shared index-manifest layer (the commit
  * protocol under AnnIndex/Bm25Index/SubstrIndex) — the higher-level
  * specs exercise it through the indexes; these pin the layer's own
  * contracts: version listing/time travel, restore guards, retention
  * math, and the txn-ledger token parsing.
  */
class IndexManifestsSpec extends SparkSpec {

  private def tmp(): String = {
    val d = Files.createTempDirectory("graft_manifests_")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def touch(dir: String, rel: String): Unit = {
    val f = new java.io.File(s"$dir/$rel")
    f.getParentFile.mkdirs()
    Files.write(f.toPath, "x".getBytes("UTF-8")): Unit
  }

  test("versions/at: ascending listing, exact entry round-trip, and a " +
      "clear error for an uncommitted version") {
    val dir = tmp()
    assert(IndexManifests.versions(spark, dir).isEmpty)
    IndexManifests.commit(spark, dir, 1L, Map("f" -> Seq("f/seg-1")))
    IndexManifests.commit(spark, dir, 2L,
      Map("f" -> Seq("f/seg-1", "f/seg-2"), "g" -> Seq("g/seg-2")))
    assert(IndexManifests.versions(spark, dir) == Seq(1L, 2L))
    assert(IndexManifests.at(spark, dir, 1L) ==
      Map("f" -> Seq("f/seg-1")))
    assert(IndexManifests.at(spark, dir, 2L)("g") == Seq("g/seg-2"))
    val e = intercept[IllegalArgumentException] {
      IndexManifests.at(spark, dir, 9L)
    }
    assert(e.getMessage.contains("v9") && e.getMessage.contains("1,2"))
  }

  test("restore: re-commits the target's entries as a new head, " +
      "refuses when a referenced segment was vacuumed, and ignores " +
      "pseudo-frames in the existence guard") {
    val dir = tmp()
    touch(dir, "f/seg-1/part-0")
    touch(dir, "f/seg-2/part-0")
    IndexManifests.commit(spark, dir, 1L,
      Map("f" -> Seq("f/seg-1"), "_txn" -> Seq("s:0")))
    IndexManifests.commit(spark, dir, 2L, Map("f" -> Seq("f/seg-2")))
    val v = IndexManifests.restore(spark, dir, 1L)
    assert(v == 3L)
    // the pseudo-frame rode along verbatim; no physical _txn required
    assert(IndexManifests.at(spark, dir, 3L) ==
      Map("f" -> Seq("f/seg-1"), "_txn" -> Seq("s:0")))
    // vacuum to the head (v3 references f/seg-1) — v2's segment dies
    IndexManifests.vacuum(spark, dir, Seq("f"))
    assert(!new java.io.File(s"$dir/f/seg-2").exists())
    assert(new java.io.File(s"$dir/f/seg-1").exists())
    val e = intercept[IllegalStateException] {
      IndexManifests.restore(spark, dir, 2L)
    }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("vacuum retention math: keepVersions larger than history is a " +
      "no-op; 2 keeps the union of the last two manifests") {
    val dir = tmp()
    touch(dir, "f/seg-1/p"); touch(dir, "f/seg-2/p"); touch(dir, "f/seg-3/p")
    IndexManifests.commit(spark, dir, 1L, Map("f" -> Seq("f/seg-1")))
    IndexManifests.commit(spark, dir, 2L, Map("f" -> Seq("f/seg-2")))
    IndexManifests.commit(spark, dir, 3L, Map("f" -> Seq("f/seg-3")))
    IndexManifests.vacuum(spark, dir, Seq("f"), keepVersions = 10)
    assert(Seq(1, 2, 3).forall(i =>
      new java.io.File(s"$dir/f/seg-$i").exists()))
    IndexManifests.vacuum(spark, dir, Seq("f"), keepVersions = 2)
    assert(!new java.io.File(s"$dir/f/seg-1").exists())
    assert(new java.io.File(s"$dir/f/seg-2").exists())
    assert(new java.io.File(s"$dir/f/seg-3").exists())
    intercept[IllegalArgumentException] {
      IndexManifests.vacuum(spark, dir, Seq("f"), keepVersions = 0)
    }
  }

  test("txn ledger parsing: colons inside the streamId resolve (the " +
      "LAST colon splits), a reset checkpoint (batchId below the " +
      "ledger) throws instead of silently skipping, and withTxn " +
      "replaces only its own stream's token") {
    val e0 = Map.empty[String, Seq[String]]
    val e1 = IndexManifests.withTxn(e0, "a:b:c", 5L)
    assert(IndexManifests.txnApplied(e1, "a:b:c", 5L)) // exact replay
    // a batchId STRICTLY below the ledger can only be a checkpoint
    // reset reusing its old path — skipping would silently drop every
    // batch until the counter caught up (ADVICE r14): loud failure
    val ex = intercept[IllegalStateException] {
      IndexManifests.txnApplied(e1, "a:b:c", 3L)
    }
    assert(ex.getMessage.contains("checkpoint"))
    assert(!IndexManifests.txnApplied(e1, "a:b:c", 6L))
    assert(!IndexManifests.txnApplied(e1, "a:b", 5L))  // exact stream
    val e2 = IndexManifests.withTxn(e1, "other", 1L)
    val e3 = IndexManifests.withTxn(e2, "a:b:c", 7L)
    // one token per stream — the ledger is O(#streams)
    assert(e3(IndexManifests.TxnFrame).sorted ==
      Seq("a:b:c:7", "other:1"))
    assert(IndexManifests.txnApplied(e3, "other", 1L))
  }

  test("commit CAS at the layer level: a version collision throws " +
      "ConcurrentModificationException and the committed bytes survive") {
    val dir = tmp()
    IndexManifests.commit(spark, dir, 1L, Map("f" -> Seq("f/a")))
    intercept[java.util.ConcurrentModificationException] {
      IndexManifests.commit(spark, dir, 1L, Map("f" -> Seq("f/CLOBBER")))
    }
    assert(IndexManifests.at(spark, dir, 1L) == Map("f" -> Seq("f/a")))
  }
}
