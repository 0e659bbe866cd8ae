package graft.sources

import org.apache.spark.sql.functions._

/** Vacuum-safety PROPERTY test over the whole sidecar surface: run
  * seeded random op sequences — append, MOR delete, rewrite-deletes,
  * COW compact, small-file compact, bloom index, ANN index, shallow
  * clone, vacuum — and after every vacuum (and at sequence end) assert
  * the one invariant every per-feature test asserts locally:
  *
  *   NO RETAINED MANIFEST EVER REFERENCES A VACUUMED PATH.
  *
  * Concretely, for every retained version of every table: every data
  * dir it lists exists on disk, every sidecar path its metadata values
  * name (bloom filters, ANN model + codes, MOR delete masks) exists on
  * disk, and the snapshot actually reads (the delete-mask anti-join
  * resolves its sidecars). Plus the clone ownership rule: a CLONE-side
  * vacuum never deletes a byte under the source root (foreign absolute
  * entries are dropped from manifests, never physically deleted).
  * A final model check pins the live row set of every sequence — the
  * random walk can't silently corrupt data either.
  *
  * Lives in package graft.sources to reach the private[sources]
  * manifest readers the invariant is phrased over. Seeds are fixed —
  * any failure reproduces exactly. */
class VacuumSafetySpec extends graft.SparkSpec {

  private val Dim = 4

  private def mkRows(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => (i, i % 7,
      Array.tabulate(Dim)(d => (i * 31 + d * 17 % 13).toFloat)))
      .toDF("id", "qty", "emb")
  }

  /** The invariant: every retained version's data dirs and sidecar
    * paths resolve on disk, and the snapshot reads. `fullReadAll`
    * additionally counts EVERY retained version (used at sequence end;
    * the per-vacuum check counts latest only to keep 100 sequences
    * affordable — path existence is the vacuum property itself). */
  private def assertIntegrity(root: String, fullReadAll: Boolean): Unit = {
    def resolves(p: String): Boolean = {
      val path = if (new java.io.File(p).isAbsolute)
        java.nio.file.Paths.get(p)
      else java.nio.file.Paths.get(root, p)
      java.nio.file.Files.exists(path)
    }
    val vs = LakeTable.versions(spark, root)
    assert(vs.nonEmpty, s"no retained versions at $root")
    // checkpoint hygiene: every on-disk checkpoint names a RETAINED
    // version (vacuum collects superseded ones with their manifests)
    val vDir = java.nio.file.Paths.get(root, "_versions")
    if (java.nio.file.Files.isDirectory(vDir)) {
      import scala.jdk.CollectionConverters._
      val st = java.nio.file.Files.list(vDir)
      val cps = try st.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("v") && n.endsWith(".checkpoint"))
        .map(n => n.substring(1, n.length - ".checkpoint".length).toInt)
        .toSeq finally st.close()
      cps.foreach(c => assert(vs.contains(c),
        s"superseded checkpoint v$c survives at $root (retained: $vs)"))
    }
    vs.foreach { v =>
      LakeTable.dataDirsAt(spark, root, v).foreach { d =>
        assert(resolves(d), s"v$v at $root references vacuumed dir $d")
      }
      LakeTable.manifestMetaAt(spark, root, v).foreach {
        case ("deletes", list) => list.split(",").foreach { r =>
          assert(resolves(r), s"v$v at $root references vacuumed mask $r")
        }
        case ("dv", list) => list.split(",").foreach { r =>
          assert(resolves(r), s"v$v at $root references vacuumed dv mask $r")
        }
        case (k, p) if k.startsWith("bloom:") || k.startsWith("annmodel:") ||
            k.startsWith("anncodes:") || k.startsWith("hllsk:") ||
            k.startsWith("kllsk:") =>
          assert(resolves(p), s"v$v at $root references vacuumed sidecar " +
            s"$k -> $p")
        case _ =>
      }
      if (fullReadAll) LakeTable.read(spark, root, Some(v)).count()
    }
    if (!fullReadAll) LakeTable.read(spark, root).count()
  }

  private def snapshotFiles(root: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    val w = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
    try w.iterator().asScala.map(_.toString).toSet finally w.close()
  }

  test("DvBinarySidecar round-trips paths, ops and positions exactly " +
    "(50 seeds, incl. empty masks, huge positions, non-ASCII paths)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dvbin")
    try {
      val fs = new org.apache.hadoop.fs.Path(dir.toString)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      for (seed <- 1 to 50) {
        val rnd = new scala.util.Random(seed)
        val entries = (0 until rnd.nextInt(6)).map { i =>
          val path = s"/tmp/å-${seed}_$i/data/π-part-$i.parquet"
          val op = if (rnd.nextBoolean()) "U" else "D"
          val n = rnd.nextInt(200)
          val positions = Iterator
            .continually(math.abs(rnd.nextLong()) % (1L << 40))
            .take(n).toArray.distinct.sorted
          (path, op, positions)
        }
        val p = new org.apache.hadoop.fs.Path(dir.toString, s"m$seed.bin")
        DvBinarySidecar.write(fs, p, entries)
        val back = DvBinarySidecar.read(fs, p).map {
          case (path, op, mask) =>
            val c = new DvMaskCodec.Cursor(mask)
            val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
            while (c.hasNext) buf += c.next()
            assert(DvMaskCodec.count(mask) == buf.size)
            (path, op, buf.toArray)
        }
        assert(back.size == entries.size, s"seed $seed")
        back.zip(entries).foreach { case ((bp, bo, bm), (ep, eo, em)) =>
          assert(bp == ep && bo == eo && bm.sameElements(em),
            s"seed $seed: $ep diverged")
        }
      }
    } finally graft.util.Tmp.deleteRecursively(dir)
  }

  test("random op sequences never leave a manifest referencing a " +
    "vacuumed path (100 seeds)") {
    for (seed <- 1 to 100) {
      val rnd = new scala.util.Random(seed)
      val src = java.nio.file.Files
        .createTempDirectory(s"graft_vacprop_${seed}_src").toString
      val cloneRoot = java.nio.file.Files
        .createTempDirectory(s"graft_vacprop_${seed}_cl").toString
      java.nio.file.Files.delete(java.nio.file.Paths.get(cloneRoot))
      try {
        var nextId = 8L
        var live = (0L until 8L).toSet
        var hasMor = false
        var cloned = false
        LakeTable.create(spark, src, mkRows(live.toSeq.sorted))
        val nOps = 5 + rnd.nextInt(4)
        for (_ <- 1 to nOps) rnd.nextInt(11) match {
          case 0 => // append fresh ids
            val k = 1 + rnd.nextInt(4)
            val ids = (nextId until nextId + k)
            nextId += k
            LakeTable.append(spark, src, mkRows(ids))
            live ++= ids
          case 1 => // MOR equality delete (ids are unique — exact model)
            val m = 2 + rnd.nextInt(3); val r = rnd.nextInt(m)
            val doomed = live.filter(_ % m == r)
            if (doomed.nonEmpty && doomed.size < live.size) {
              LakeTable.deleteWhereMor(spark, src,
                col("id") % m === r, "id")
              live --= doomed
              hasMor = true
            }
          case 2 => if (hasMor) {
              LakeTable.rewriteDeletes(spark, src); hasMor = false
            }
          case 3 => // full COW compact materializes masks, drops index
            LakeTable.compact(spark, src, targetPartitions = 1)
            hasMor = false
          case 4 => if (!hasMor) // small-file compact (MOR-free contract)
            LakeTable.compactSmall(spark, src, minBytes = Long.MaxValue)
          case 5 => rnd.nextInt(3) match {
            case 0 => LakeTable.indexBloom(spark, src, Seq("id"))
            case 1 => LakeHllIndex.indexHll(spark, src, Seq("id"))
            case _ => LakeKllIndex.indexKll(spark, src, Seq("id"))
          }
          case 6 => if (live.size >= 8) // kmeans needs n >= kCodes
            LakeAnnIndex.indexIvfPq(spark, src, "id", "emb",
              nCentroids = 2, m = 2, kCodes = 4)
          case 7 => // vacuum the source — but never once a clone holds
            // foreign references into it (the documented Delta caveat:
            // source-side vacuum is the clone owner's risk to schedule)
            if (!cloned) {
              LakeTable.vacuum(spark, src, keepVersions = 1 + rnd.nextInt(3))
              assertIntegrity(src, fullReadAll = false)
            }
          case 9 => // positional MOR update (dv sidecar, ids unchanged)
            val m = 2 + rnd.nextInt(3); val r = rnd.nextInt(m)
            if (live.exists(_ % m == r)) {
              LakeTable.updateWhereMor(spark, src, col("id") % m === r,
                Map("qty" -> (col("qty") + 100L)))
              hasMor = true
            }
          case 10 => // positional MOR delete (dv sidecar; exact model —
            // ids are unique and later appends always use fresh ids)
            val m = 2 + rnd.nextInt(3); val r = rnd.nextInt(m)
            val doomed = live.filter(_ % m == r)
            if (doomed.nonEmpty && doomed.size < live.size) {
              LakeTable.deleteWhereDv(spark, src, col("id") % m === r)
              live --= doomed
              hasMor = true
            }
          case 8 => // clone once, then clone-side vacuum must not touch
            // a single source byte
            if (!cloned) {
              LakeTable.shallowClone(spark, src, cloneRoot)
              cloned = true
            } else {
              val before = snapshotFiles(src)
              LakeTable.vacuum(spark, cloneRoot, keepVersions = 1)
              assert(snapshotFiles(src) == before,
                s"clone-side vacuum deleted source bytes (seed $seed)")
              assertIntegrity(cloneRoot, fullReadAll = false)
            }
        }
        assertIntegrity(src, fullReadAll = true)
        if (cloned) assertIntegrity(cloneRoot, fullReadAll = true)
        // model check: the live row set survived the walk exactly
        import spark.implicits._
        val got = LakeTable.read(spark, src)
          .select(col("id")).as[Long].collect().toSet
        assert(got == live, s"seed $seed: live set diverged " +
          s"(missing ${live -- got}, extra ${got -- live})")
      } finally {
        import scala.jdk.CollectionConverters._
        Seq(src, cloneRoot).foreach { r =>
          val p = java.nio.file.Paths.get(r)
          if (java.nio.file.Files.exists(p)) {
            val w = java.nio.file.Files.walk(p)
            try w.iterator().asScala.toSeq.reverse
              .foreach(q => java.nio.file.Files.deleteIfExists(q))
            finally w.close()
          }
        }
      }
    }
  }
}
